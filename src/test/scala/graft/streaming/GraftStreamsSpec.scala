package graft.streaming

import graft.SparkSpec
import graft.operators.Sessions
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming twins vs their oracle-checked batch definitions: the same
  * event data pushed through MemoryStream must produce the same results
  * the batch operators compute.
  */
class GraftStreamsSpec extends SparkSpec {

  test("streaming tumbling window agg equals batch stream01 twin") {
    import spark.implicits._
    val batchRows = Sessions.stream01TumblingAgg(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val input = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()

    val stream = MemoryStream[(Timestamp, String, Double)](spark)
    val q = GraftStreams.tumblingAgg(
      stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(input.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("tumbling_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batchRows)
  }

  test("streaming sessionize (flatMapGroupsWithState) equals batch stream02 twin") {
    import spark.implicits._
    val batch = Sessions.stream02Sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val input = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      .as[GraftStreams.SessionEvent].collect()

    val stream = MemoryStream[GraftStreams.SessionEvent](spark)
    val q = GraftStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(input.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("session_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming exact dedup equals batch dedup01 keeper assignment") {
    import spark.implicits._
    val batch = graft.operators.Dedup.dedup01Exact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // fingerprint -> keeper

    val arrivals = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"))
      .as[GraftStreams.DocArrival].collect().sortBy(_.doc_id)

    // Split into two micro-batches to exercise cross-batch state.
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.DocArrival](spark)
    val q = GraftStreams.streamingExactDedup(stream.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("dedup_out").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // Every verdict's keeper must match the batch keeper for that
    // fingerprint (stream delivered in doc_id order).
    streamed.foreach { case (fp, keeper) =>
      assert(batch(fp) == keeper, s"fingerprint $fp")
    }
    assert(streamed.length == arrivals.length)
  }

  test("sessionize keeps numbering across micro-batches (stateful resume)") {
    import spark.implicits._
    // Two events 31 min apart split into separate micro-batches: the
    // second batch must continue from persisted state (session 2), not
    // restart at 1.
    val stream = MemoryStream[GraftStreams.SessionEvent](spark)
    val q = GraftStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("session_resume")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(GraftStreams.SessionEvent(7L, 1L, 1000L))
      q.processAllAvailable()
      stream.addData(GraftStreams.SessionEvent(7L, 2L, 1000L + 1860L))
      stream.addData(GraftStreams.SessionEvent(7L, 3L, 1000L + 1870L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("session_resume").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }
}
