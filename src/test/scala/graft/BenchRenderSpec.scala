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

  test("runaway surface: line fits even when timings cannot (counts-only fallback)") {
    // 5000 queries can never fit as per-query timings; the final
    // degradation step must drop them and still emit parseable JSON
    // with the total and a count.
    val huge = (1 to 5000).map(i => f"zz$i%04d_filler" -> 1.234)
    val line = Bench.renderLine(huge, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val json = parse(line)
    val org.json4s.JInt(n) = (json \ "queries" \ "_count"): @unchecked
    assert(n == 5000)
    val org.json4s.JDouble(total) = (json \ "value"): @unchecked
    assert(math.abs(total - 5000 * 1.234) < 1.0)
  }

  test("outlier detection: >3x family median AND >1s, errored excluded") {
    val results = Seq(
      "q01_a" -> 0.2, "q02_b" -> 0.3, "q03_c" -> 0.25,
      "q04_d" -> 16.1, // the round-10 contention artifact shape
      "q05_e" -> 0.9,  // 3x median but under the absolute floor
      "dedup01_x" -> 0.2, "dedup02_y" -> 2.5, "dedup03_z" -> 0.3,
      // over threshold (family median 0.3) but errored -> excluded
      "etl01_a" -> 5.0, "etl02_b" -> 0.2, "etl03_c" -> 0.3
    )
    val out = Bench.outliers(results, errored = Set("etl01_a"))
    assert(out.toSet == Set("q04_d", "dedup02_y"))
  }

  test("outlier detection: clean sweep flags nothing cheap") {
    val results = (1 to 40).map(i => f"q$i%02d_x" -> 0.3)
    assert(Bench.outliers(results, Set.empty).isEmpty)
  }

  test("outlier detection: errored times do not inflate the family median") {
    val results = Seq(
      "sim01_a" -> 0.4, "sim02_b" -> 0.5, "sim03_c" -> 0.45,
      "sim04_d" -> 16.0,                    // genuine contention artifact
      "sim05_e" -> 20.0, "sim06_f" -> 21.0) // slow FAILURES
    // Were the failures' times in the median (~16 s), 3x would be 48 s
    // and the artifact would ship undetected — the round-10 scenario.
    assert(Bench.outliers(results,
      errored = Set("sim05_e", "sim06_f")).toSet == Set("sim04_d"))
    // An all-errored family has no median: nothing flagged, no crash.
    assert(Bench.outliers(Seq("mm01_a" -> 9.0, "mm02_b" -> 9.5),
      errored = Set("mm01_a", "mm02_b")).isEmpty)
  }

  test("family split: etl by decade, others by letter prefix") {
    assert(Bench.family("etl01_select") == "etl0")
    assert(Bench.family("etl19_merge") == "etl1")
    assert(Bench.family("etl27_retention") == "etl2")
    assert(Bench.family("q04_order_priority") == "q")
    assert(Bench.family("dedup03_minhash_lsh") == "dedup")
  }
}
