package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions.saltedJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ScaleToolsSpec extends SparkSpec {

  test("q30 sketches stay within error bounds of their exact twins") {
    val rows = Relational.q30ApproxStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxD = r.getLong(r.fieldIndex("approx_customers")).toDouble
      val exactD = r.getLong(r.fieldIndex("exact_customers")).toDouble
      assert(math.abs(approxD - exactD) / exactD <= 0.05,
        s"HLL++ distinct off by >5%: $approxD vs $exactD")
      val approxM = r.getDouble(r.fieldIndex("approx_median"))
      val exactM = r.getDouble(r.fieldIndex("exact_median"))
      assert(math.abs(approxM - exactM) / exactM <= 0.05,
        s"quantile sketch off by >5%: $approxM vs $exactM")
    }
  }

  test("saltedJoin returns exactly the plain equi-join result") {
    val fact = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = saltedJoin(fact, dim, key = "o_custkey",
        discriminator = "o_orderkey", salt = 8)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
