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

  test("optimizer rule rewrites row_number window + rank filter to TopKPerKey") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"row_number+filter must rewrite to the custom operator:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), "the window sort must be gone")
  }

  test("optimizer rule leaves rank()/gap semantics untouched (q07 shape)") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sf)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "rank() must stay a window (tie gaps)")
    assert(!plan.contains("TopKPerKey"))
  }

  test("rewritten plan produces identical rows to the un-rewritten window") {
    // Results must be invisible to the user: same rows either way.
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val viaRule = Tables.events(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("user_id", "rk", "event_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // Bypass the rule with rank(): event_id is unique within a user,
    // so rank ≡ row_number here while the rule (correctly) leaves
    // rank()'s gap semantics to a real window. (Round 21: the old
    // bypass — an extra conjunct in the filter — now rewrites too.)
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select("user_id", "rk", "event_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaRule == viaWindow)
  }

  test("optimizer rule peels the rank bound out of a conjunction (etl16 shape)") {
    // round 21: `rn === 1 && op =!= "D"` previously kept the whole
    // window sort because the filter was not ONLY the rank bound; the
    // rule now takes the tightest rank-bound conjunct for the top-k
    // and leaves the rest in a residual filter above it — identical
    // rows, no sort.
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val df = Tables.events(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2 && col("event_type") =!= "error")
      .select("user_id", "rk", "event_id")
    val plan = { df.collect(); df.queryExecution.executedPlan.toString }
    assert(plan.contains("TopKPerKey"),
      s"compound filter must still rewrite:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), "the window sort must be gone")
    // Row identity vs the pure window form (rank() bypass as above).
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2 && col("event_type") =!= "error")
      .select("user_id", "rk", "event_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == viaWindow)
    assert(got.nonEmpty)
  }

  test("TopKPerKey handles k larger than any group (emits everything ranked)") {
    val df = TopKPerKey(Tables.region(spark, sf),
      Seq("r_regionkey"), Seq(("r_name", false)), 100)
    val n = Tables.region(spark, sf).count()
    assert(df.count() == n)
    assert(df.collect().forall(_.getInt(df.columns.indexOf("rk")) == 1))
  }

  test("TopKPerKey equals sort-and-take on randomized data (ties included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200 + trial * 137
      // Small value domain forces heavy ties — the ordering's tiebreaker
      // (id) must keep results deterministic.
      val data = (0 until n).map(i =>
        (rnd.nextInt(7).toLong, i.toLong, rnd.nextInt(5).toDouble))
      val df = data.toDF("k", "id", "score")
      val expected = data.groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(4).zipWithIndex
          .map { case (r, i) => (r._1, i + 1, r._2) }
      }.toSet
      val got = TopKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 4)
        .select("k", "rk", "id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial (n=$n)")
    }
  }

  test("TopKPerKey plans a map-side partial stage below the shuffle") {
    val df = TopKPerKey(Tables.orders(spark, sf),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Final above the exchange, partial below it: the shuffle must move
    // only the partial stage's pruned rows, never the full scored stream.
    val iFinal = plan.indexOf("TopKPerKey ")
    val iExchange = plan.indexOf("Exchange")
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial >= 0,
      s"expected final/Exchange/partial in:\n$plan")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"partial must sit below the shuffle, final above it:\n$plan")
  }

  test("partial-stage key-cap overflow keeps results exact (pass-through superset)") {
    import spark.implicits._
    val prev = spark.conf.getOption(GraftStrategy.MaxPartialRowsKey)
    // Cap = 4 rows at k=2 -> 2 heap keys per partition; the other ~48
    // keys stream through unfiltered and only the FINAL stage prunes.
    spark.conf.set(GraftStrategy.MaxPartialRowsKey, "4")
    try {
      val rnd = new scala.util.Random(7)
      val data = (0 until 2000).map(i =>
        (rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(9).toDouble))
      val df = data.toDF("k", "id", "score").repartition(5)
      val expected = data.groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case (r, i) => (r._1, i + 1, r._2) }
      }.toSet
      val got = TopKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 2)
        .select("k", "rk", "id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(GraftStrategy.MaxPartialRowsKey, v)
        case None => spark.conf.unset(GraftStrategy.MaxPartialRowsKey)
      }
    }
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
