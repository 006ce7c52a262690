package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.l2Distance
import org.apache.spark.sql.functions._

class L2DistanceSpec extends SparkSpec {

  private def dist(a: Seq[Double], b: Seq[Double]): Double =
    spark.range(1).select(
      l2Distance(
        lit(a.toArray).cast("array<double>"),
        lit(b.toArray).cast("array<double>")).as("d"))
      .collect().head.getDouble(0)

  test("3-4-5 triangle") {
    assert(math.abs(dist(Seq(0.0, 0.0), Seq(3.0, 4.0)) - 5.0) < 1e-12)
  }

  test("identical vectors have distance 0") {
    assert(dist(Seq(1.5, -2.5, 3.0), Seq(1.5, -2.5, 3.0)) == 0.0)
  }

  test("matches an independently computed value") {
    val a = Seq(0.5, -1.25, 3.0)
    val b = Seq(2.0, 0.5, -0.25)
    val expected = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(math.abs(dist(a, b) - expected) < 1e-12)
  }

  test("registered as a SQL function via GraftExtensions") {
    val r = spark.sql(
      "SELECT l2_distance(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d")
      .collect().head
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-12)
  }

  test("null input propagates null") {
    val df = spark.range(1).select(
      l2Distance(lit(null).cast("array<double>"),
        lit(Array(1.0)).cast("array<double>")).as("d"))
    assert(df.collect().head.isNullAt(0))
  }
}
