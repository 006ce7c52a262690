package graft.operators

import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch twins of the streaming surface (SURVEY.md §2 stream01/02).
  * The same event-time semantics run incrementally in
  * [[graft.streaming.GraftStreams]]; these batch forms are the
  * oracle-checkable definitions.
  */
object Sessions {

  /** stream01 (batch twin): tumbling 1-hour event-time window agg. */
  def stream01TumblingAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("window_start", "event_type")

  /** stream04 (batch twin): purchase → click attribution — the SAME
    * interval-join definition the streaming form runs
    * ([[graft.streaming.GraftStreams.attribution]]; `withWatermark` is
    * a no-op under batch execution), applied to the events table split
    * by type. Batch plans it as a user-keyed join with the time band as
    * a residual predicate — one shuffle on user_id per side, no
    * windows. This is the oracle-checkable definition the streaming
    * spec's equivalence test anchors to.
    */
  def stream04Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    graft.streaming.GraftStreams.attribution(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"))
      .orderBy("purchase_id", "click_id")
  }

  /** stream02 (batch twin): sessionization — 30-min-gap session windows
    * per user. One shuffle on user_id; both windows share the same
    * partitioning so Catalyst plans a single exchange.
    */
  def stream02Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    events(spark, dir)
      .withColumn("prev_s",
        lag(unix_timestamp(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_s").isNull ||
          unix_timestamp(col("ts")) - col("prev_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id")
  }
}
