package graft.plans

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  test("TopKPerKey equals window row_number + filter on orders") {
    val orders = Tables.orders(spark, sf)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaCustom = TopKPerKey(orders,
        keyCols = Seq("o_custkey"),
        orderCols = Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3)
      .select("o_custkey", "rk", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaCustom == viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("TopKPerKey plans the custom physical operator, not a window sort") {
    val df = TopKPerKey(Tables.orders(spark, sf),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected custom exec in:\n$plan")
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }

  test("TopKPerKey handles k larger than any group (emits everything ranked)") {
    val df = TopKPerKey(Tables.region(spark, sf),
      Seq("r_regionkey"), Seq(("r_name", false)), 100)
    val n = Tables.region(spark, sf).count()
    assert(df.count() == n)
    assert(df.collect().forall(_.getInt(df.columns.indexOf("rk")) == 1))
  }

  test("TopKPerKey rejects unknown columns and non-positive k") {
    intercept[IllegalArgumentException] {
      TopKPerKey(Tables.region(spark, sf), Seq("nope"), Seq(("r_name", false)), 1)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey(Tables.region(spark, sf), Seq("r_regionkey"), Seq(("r_name", false)), 0)
    }
  }
}
