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

  test("etl21 compaction collapses the file count and preserves content") {
    import org.apache.spark.sql.functions._
    val out = Etl.etl21Compaction(spark, sf).collect().map(_.toSeq).toSeq
    val direct = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), round(col("value"), 2).as("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(out == direct, "compacted aggregate must equal the source aggregate")
    // The oracle can only see content; the file-count collapse — the
    // point of the operator — is pinned here.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl21_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    def parts(p: String): Int =
      new java.io.File(p).listFiles().count(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(s"$base/fragmented") == 64, "staging must fragment into 64 files")
    assert(parts(s"$base/compacted") <= 2,
      "compaction must collapse to ceil(bytes/target) files")
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
