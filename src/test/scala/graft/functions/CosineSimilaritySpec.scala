package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.cosineSim
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  private def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    val df = spark.range(1).select(
      cosineSim(
        lit(a.toArray).cast("array<double>"),
        lit(b.toArray).cast("array<double>")).as("c"))
    df.collect().headOption.map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
  }

  test("parallel vectors have similarity 1") {
    assert(math.abs(cos(Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0)).get - 1.0) < 1e-12)
  }

  test("orthogonal vectors have similarity 0") {
    assert(math.abs(cos(Seq(1.0, 0.0), Seq(0.0, 1.0)).get) < 1e-12)
  }

  test("opposite vectors have similarity -1") {
    assert(math.abs(cos(Seq(1.0, 1.0), Seq(-1.0, -1.0)).get + 1.0) < 1e-12)
  }

  test("zero-norm input yields 0.0, not NaN") {
    assert(cos(Seq(0.0, 0.0), Seq(1.0, 2.0)).get == 0.0)
  }

  test("matches an independently computed value") {
    val a = Seq(0.5, -1.25, 3.0, 0.75)
    val b = Seq(2.0, 0.5, -0.25, 1.5)
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val expected = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(math.abs(cos(a, b).get - expected) < 1e-12)
  }

  test("null input propagates null") {
    val df = spark.range(1).select(
      cosineSim(lit(null).cast("array<double>"),
        lit(Array(1.0, 2.0)).cast("array<double>")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("registered as a SQL function via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("interpreted eval matches codegen result") {
    // Force the interpreted path through a fresh expression eval.
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 2.0, 1.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaPlan = spark.sql(
      "SELECT cosine_sim(array(1.0d,2.0d,3.0d), array(3.0d,2.0d,1.0d))")
      .collect().head.getDouble(0)
    assert(math.abs(interpreted - viaPlan) < 1e-15)
  }
}
