package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench summary-line contract: the harness keeps only the
  * LAST ~2000 chars of stdout, so the line must stay parseable JSON
  * under the window no matter how many queries fail (round 9 lost all
  * 86 good timings to 28 verbose error strings overflowing the tail).
  */
class BenchRenderSpec extends AnyFunSuite {

  private val fullSurface: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.234)

  private def parse(line: String) =
    org.json4s.jackson.JsonMethods.parse(line)

  test("clean run: line fits the tail window and parses") {
    val line = Bench.renderLine(fullSurface, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val json = parse(line)
    val org.json4s.JObject(fields) = (json \ "queries"): @unchecked
    assert(fields.size == fullSurface.size)
  }

  test("r9 failure shape: 28 long-message errors cannot crowd out timings") {
    val errors = fullSurface.take(28).map { case (k, _) =>
      k -> "ExtendedAnalysisException"
    }.toList
    val line = Bench.renderLine(fullSurface, errors, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val json = parse(line)
    val org.json4s.JObject(qs) = (json \ "queries"): @unchecked
    assert(qs.size == fullSurface.size, "every timing must survive errors")
  }

  test("worst case: every query errors, line still fits and parses") {
    val errors = fullSurface.map { case (k, _) =>
      k -> ("SomeVeryLongExceptionClassName" * 4)
    }.toList
    val line = Bench.renderLine(fullSurface, errors, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val json = parse(line)
    val org.json4s.JObject(qs) = (json \ "queries"): @unchecked
    assert(qs.size == fullSurface.size)
  }

  test("error tokens are escaped: quotes/backslashes cannot break the JSON") {
    val errors = List("q01_pricing_summary" -> "He said \"boom\\\" end")
    val line = Bench.renderLine(fullSurface.take(3), errors, "/tmp/x")
    parse(line) // must not throw
  }
}
