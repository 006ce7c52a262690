package graft.sources

import scala.concurrent.duration._
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkSpec
import graft.operators.Etl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSinkSpec extends SparkSpec {

  private def snapshot(df: DataFrame): Seq[(Long, Long, String, Option[Double])] =
    df.select("key", "last_seq", "last_op", "current_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(t => (t._1, t._2)).toSeq

  private def freshTable(tag: String): (String, String) = {
    val table = s"g_mergesink_spec_$tag"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mergesink_spec_$tag"
    MergeSink.reset(spark, table, base)
    (table, base)
  }

  import spark.implicits._

  private def ops(rows: (Long, Long, String, Double)*): DataFrame =
    rows.toSeq.toDF("key", "seq", "op", "value")

  test("replaying a batch is a no-op (restart idempotence)") {
    val (table, base) = freshTable("replay")
    val batch = ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0), (1L, 12L, "U", 3.0))
    MergeSink.merge(spark, table, base, batch)
    val once = snapshot(spark.table(table))
    MergeSink.merge(spark, table, base, batch)
    assert(snapshot(spark.table(table)) == once)
  }

  test("older ops cannot overwrite newer state (high-water-mark)") {
    val (table, base) = freshTable("hwm")
    MergeSink.merge(spark, table, base, ops((1L, 20L, "U", 9.0)))
    MergeSink.merge(spark, table, base, ops((1L, 10L, "I", 1.0)))
    assert(snapshot(spark.table(table)) == Seq((1L, 20L, "U", Some(9.0))))
  }

  test("an EQUAL-sequence change cannot overwrite stored state") {
    val (table, base) = freshTable("eqseq")
    MergeSink.merge(spark, table, base, ops((1L, 10L, "U", 9.0)))
    // Same sequence, different op/value — the stored row must win
    // ("at-or-below the stored sequence loses"), even though 'D' sorts
    // before 'U' alphabetically.
    MergeSink.merge(spark, table, base, ops((1L, 10L, "D", 0.0)))
    assert(snapshot(spark.table(table)) == Seq((1L, 10L, "U", Some(9.0))))
  }

  test("a restarted driver recovers state from the latest committed snapshot") {
    val (table, base) = freshTable("restart")
    MergeSink.merge(spark, table, base, ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0)))
    val committed = snapshot(spark.table(table))
    // Simulate a driver restart with a non-persistent catalog: the
    // table entry is gone but the snapshot directories survive.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    MergeSink.merge(spark, table, base, ops((2L, 20L, "U", 5.0)))
    assert(snapshot(spark.table(table)) ==
      Seq((1L, 10L, "I", Some(1.0)), (2L, 20L, "U", Some(5.0))),
      s"recovery must resume from $committed, not start empty")
  }

  test("delete tombstones survive and block resurrection by older ops") {
    val (table, base) = freshTable("tomb")
    MergeSink.merge(spark, table, base, ops((1L, 20L, "D", 0.0)))
    // A late-arriving OLDER insert must not bring the key back.
    MergeSink.merge(spark, table, base, ops((1L, 15L, "I", 5.0)))
    assert(MergeSink.state(spark, table).count() == 0)
    // ...but a genuinely newer insert does.
    MergeSink.merge(spark, table, base, ops((1L, 25L, "I", 7.0)))
    assert(snapshot(MergeSink.state(spark, table)) == Seq((1L, 25L, "I", Some(7.0))))
  }

  test("merge order across batches does not change the final state") {
    val log = Etl.cdcLog(spark, sf)
    val b1 = log.filter(col("seq") % 2 === 0)
    val b2 = log.filter(col("seq") % 2 =!= 0)
    val (t12, base12) = freshTable("order12")
    MergeSink.merge(spark, t12, base12, b1)
    MergeSink.merge(spark, t12, base12, b2)
    val (t21, base21) = freshTable("order21")
    MergeSink.merge(spark, t21, base21, b2)
    MergeSink.merge(spark, t21, base21, b1)
    assert(snapshot(spark.table(t12)) == snapshot(spark.table(t21)))
  }

  test("concurrent appliers serialize per table and lose no batch") {
    val log = Etl.cdcLog(spark, sf)
    val batches = (0 until 4).map(i => log.filter(col("seq") % 4 === i))
    val (table, base) = freshTable("conc")
    val applies = batches.map(b => Future(MergeSink.merge(spark, table, base, b)))
    Await.result(Future.sequence(applies), 5.minutes)
    // One-shot reduction over the full log (etl16 semantics, with
    // tombstones retained) must match whatever interleaving won.
    val (oneShot, baseOne) = freshTable("oneshot")
    MergeSink.merge(spark, oneShot, baseOne, log)
    assert(snapshot(spark.table(table)) == snapshot(spark.table(oneShot)))
  }

  test("etl19 equals the one-shot CDC reduction (etl16)") {
    val viaSink = Etl.etl19MergeSink(spark, sf)
      .collect().map(_.toSeq).toSeq
    val oneShot = Etl.etl16CdcApply(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaSink == oneShot)
  }
}
