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
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[GraftStreams.SessionEvent].collect()

    val stream = MemoryStream[GraftStreams.SessionEvent](spark)
    val q = GraftStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(input.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("session_out").collect()
    // Assignment rows equal the batch twin exactly; close rows are the
    // streaming-only extra signal (checked in the TTL spec below).
    val streamed = rows.filter(!_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    // Every close names a session some assignment row actually opened.
    val sessions = rows.filter(!_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.filter(_.getBoolean(3)).foreach { r =>
      assert(sessions.contains((r.getLong(0), r.getLong(2))),
        s"close for unknown session: $r")
    }
  }

  test("file-watch source: tumbling agg over a directory equals batch") {
    val watchDir = java.nio.file.Files.createTempDirectory("graft_watch").toString
    // Simulate the reference's arriving-files directory: 3 parquet parts.
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3)
      .write.mode("overwrite").parquet(watchDir)
    val batchRows = Sessions.stream01TumblingAgg(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val q = GraftStreams.tumblingAgg(
        GraftStreams.eventFileStream(spark, watchDir, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("file_tumbling_out")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("file_tumbling_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batchRows)
  }

  test("stream06: streaming quarantine equals the batch twin over one landing dir") {
    // etl20 materializes the corrupted landing directory; the stream
    // must split the same lines into the same per-batch summary —
    // including the aggregated valid VALUES, so a parse-path bug on the
    // value column cannot slip through a counts-only comparison.
    val batchSummary = graft.operators.Etl.etl20CorruptQuarantine(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val landing = s"${graft.operators.Etl.etl20Root(sf)}/landing"

    val parsed = GraftStreams.parseQuarantine(
      GraftStreams.landingLineStream(spark, landing))
    val summary = parsed.groupBy("batch")
      .agg(
        sum(when(col("corrupt").isNull, 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("corrupt").isNotNull, 1L).otherwise(0L)).as("n_rejected"),
        round(sum(when(col("corrupt").isNull, col("v"))), 2).as("valid_value"))
    val q = summary.writeStream.format("memory").queryName("quarantine_out")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("quarantine_out").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batchSummary)

    // Quarantine leg: every reject carries its raw line + source file.
    val q2 = parsed.filter(col("corrupt").isNotNull)
      .select("batch", "src_file", "line")
      .writeStream.format("memory").queryName("quarantine_rejects")
      .outputMode(OutputMode.Append).start()
    try q2.processAllAvailable() finally q2.stop()
    val rejects = spark.table("quarantine_rejects").collect()
    assert(rejects.nonEmpty)
    assert(rejects.forall(r => r.getString(1).contains("batch=") &&
      r.getString(2).contains("CORRUPT@@")))
  }

  test("stream-stream interval join (attribution) equals the batch join") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("event_type"))
    // The oracled batch twin (stream04_attribution) IS the anchor: the
    // streamed output must equal the entry the DuckDB oracle checks.
    val batch = Sessions.stream04Attribution(spark, sf)
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "test data should contain attributable purchases")

    val rows = ev.as[(Long, Long, Timestamp, Double, String)].collect()
    val pStream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val cStream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = GraftStreams.attribution(
        pStream.toDF().toDF("event_id", "user_id", "ts", "value"),
        cStream.toDF().toDF("event_id", "user_id", "ts", "value"))
      .writeStream.format("memory").queryName("attribution_out")
      .outputMode(OutputMode.Append).start()
    try {
      pStream.addData(rows.filter(_._5 == "purchase").map(r => (r._1, r._2, r._3, r._4)).toIndexedSeq)
      cStream.addData(rows.filter(_._5 == "click").map(r => (r._1, r._2, r._3, r._4)).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("attribution_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("left-outer attribution emits unattributed purchases after watermark closure") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val pStream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val cStream = MemoryStream[(Long, Long, Timestamp, Double)](spark)
    val q = GraftStreams.attributionLeftOuter(
        pStream.toDF().toDF("event_id", "user_id", "ts", "value"),
        cStream.toDF().toDF("event_id", "user_id", "ts", "value"))
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: click 100s before the purchase (attributable);
      // user 2: purchase with no click at all.
      cStream.addData((10L, 1L, ts(900), 0.0))
      pStream.addData((20L, 1L, ts(1000), 5.0), (21L, 2L, ts(1000), 7.0))
      q.processAllAvailable()
      // Watermarks only move with new data: push both streams far past
      // the interval so the engine can close user 2's window.
      val far = ts(1000 + 12 * 3600)
      cStream.addData((98L, 99L, far, 0.0))
      pStream.addData((99L, 99L, far, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("attr_outer_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows.contains((20L, 10L)), s"user 1 purchase must attribute, got $rows")
    assert(rows.contains((21L, -1L)),
      s"user 2 purchase must emit with null click after closure, got $rows")
  }

  test("streaming exact dedup equals batch dedup01 keeper assignment") {
    import spark.implicits._
    val batch = graft.operators.Dedup.dedup01Exact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // fingerprint -> keeper

    val arrivals = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("ts"))
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

  test("streaming span dedup flags exactly the spans an earlier doc carries") {
    import spark.implicits._
    val spans = graft.operators.Dedup
      .spanHashRows(Tables.documents(spark, sf))
      .select(col("doc_id"), col("h").as("span_hash"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("ts"))
      .as[GraftStreams.SpanArrival].collect().sortBy(s => (s.doc_id, s.span_hash))
    assert(spans.nonEmpty)

    val (b1, b2) = spans.splitAt(spans.length / 2)
    val stream = MemoryStream[GraftStreams.SpanArrival](spark)
    val q = GraftStreams.streamingSpanDedup(stream.toDS())
      .writeStream.format("memory").queryName("span_dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("span_dedup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(streamed.length == spans.length)

    // Driver recompute under doc_id-ordered arrival: an occurrence is a
    // duplicate iff a STRICTLY SMALLER doc_id carries the same span.
    val firstDoc = spans.groupBy(_.span_hash).view.mapValues(_.map(_.doc_id).min).toMap
    streamed.foreach { case (doc, h, first, dup) =>
      assert(first == firstDoc(h), s"span $h first_doc")
      assert(dup == (doc != firstDoc(h)), s"span $h in doc $doc")
    }

    // Agreement with batch dedup08: the spans that ever get flagged are
    // exactly the cross-doc duplicated spans (df > 1).
    val batchDup = spans.groupBy(_.span_hash).view
      .mapValues(_.map(_.doc_id).distinct.size).filter(_._2 > 1).keySet
    val flagged = streamed.filter(_._4).map(_._2).toSet
    assert(flagged == batchDup)
  }

  test("streaming CDC apply converges to the batch etl16 final state") {
    import spark.implicits._
    val batch = graft.operators.Etl.etl16CdcApply(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getDouble(3))))
      .toMap

    val log = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2))
      .collect()
      .map { r =>
        val op = r.getString(2) match {
          case "error" => "D"
          case "click" => "U"
          case _       => "I"
        }
        GraftStreams.CdcOp(r.getLong(0), r.getLong(1), op, r.getDouble(3))
      }
      .sortBy(_.seq)
    val (b1, b2) = log.splitAt(log.length / 2)

    val stream = MemoryStream[GraftStreams.CdcOp](spark)
    val q = GraftStreams.streamingCdcApply(stream.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      // Replay a slice of batch 1 inside batch 2: stale seqs must be
      // ignored (at-least-once delivery -> exactly-once apply).
      stream.addData((b1.takeRight(20) ++ b2).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // Last emitted state per key, surviving keys only.
    val streamed = spark.table("cdc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getBoolean(4)))
      .groupBy(_._1).map { case (k, states) => k -> states.maxBy(_._2) }
    val live = streamed.collect { case (k, (_, seq, op, v, deleted)) if !deleted =>
      k -> ((seq, op, v))
    }
    assert(live == batch)
  }

  test("stream05 under RocksDB state: CDC high-water marks round-trip the deployment provider") {
    // stream13 pins the engine session store, stream14 the FrameState
    // family, stream19/23 the pack cursor; this leg covers the LAST
    // flatMapGroupsWithState shape without a deployment-provider pin —
    // stream05's CDC high-water-mark state (a (seq, op, value) per key
    // that must survive the provider across micro-batches, or a replayed
    // stale op re-applies and the materialized view diverges). Its
    // NoTimeout posture makes the provider pin MORE load-bearing, not
    // less: the state lives for the query's whole lifetime.
    import spark.implicits._
    val providerCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    assume(
      try { Class.forName(providerCls); true }
      catch { case _: ClassNotFoundException => false },
      s"SKIPPING LOUDLY: $providerCls not on this Spark classpath")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, providerCls)
      val batch = graft.operators.Etl.etl16CdcApply(spark, sf).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getDouble(3))))
        .toMap
      val log = Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2))
        .collect()
        .map { r =>
          val op = r.getString(2) match {
            case "error" => "D"
            case "click" => "U"
            case _       => "I"
          }
          GraftStreams.CdcOp(r.getLong(0), r.getLong(1), op, r.getDouble(3))
        }
        .sortBy(_.seq)
      val (b1, b2) = log.splitAt(log.length / 2)
      val qn = s"cdc_rocks_${System.nanoTime()}"
      val stream = MemoryStream[GraftStreams.CdcOp](spark)
      val q = GraftStreams.streamingCdcApply(stream.toDS())
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        stream.addData(b1.toIndexedSeq)
        q.processAllAvailable()
        // The replayed slice crosses the micro-batch line: ignoring it
        // requires the batch-1 high-water marks to come back OUT of
        // RocksDB intact.
        stream.addData((b1.takeRight(20) ++ b2).toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getBoolean(4)))
        .groupBy(_._1).map { case (k, states) => k -> states.maxBy(_._2) }
      val live = streamed.collect { case (k, (_, seq, op, v, deleted)) if !deleted =>
        k -> ((seq, op, v))
      }
      assert(live == batch,
        "CDC state under RocksDB diverges from the batch etl16 final state")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup keeper is stable when a smaller doc_id arrives late") {
    import spark.implicits._
    val stream = MemoryStream[GraftStreams.DocArrival](spark)
    val q = GraftStreams.streamingExactDedup(stream.toDS())
      .writeStream.format("memory").queryName("dedup_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(GraftStreams.DocArrival(5L, "fp", new Timestamp(1000000L)))
      q.processAllAvailable()
      stream.addData(GraftStreams.DocArrival(3L, "fp", new Timestamp(1000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("dedup_late_out").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // First-seen semantics: doc 5 was committed as keeper in batch 1;
    // the late-arriving smaller doc 3 must NOT become its own keeper
    // (that would contradict the already-emitted verdict for doc 5).
    assert(verdicts == Map(5L -> 5L, 3L -> 5L))
  }

  test("stream03 native form: dropDuplicatesWithinWatermark admits exactly the keepers") {
    // The engine-native dedup (q37/stream13's "native form" pattern):
    // within the watermark horizon the built-in operator must admit
    // exactly the batch keepers stream03's explicit state machine
    // commits — fed keepers-first, the two forms coincide (the native
    // form keeps an arbitrary first arrival per key, so the explicit
    // machine remains the shipped gate where min-id keeper semantics
    // matter; this leg pins that the ENGINE's state store solves the
    // same problem under the same horizon contract).
    import spark.implicits._
    // The driver corpora carry near-dups but no EXACT dups, so the
    // fixture injects them: ids 1..20 are the keepers (distinct
    // fingerprints, fed first), ids 21..50 re-arrive on those
    // fingerprints across the batch line.
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val b1 = (1 to 20).map(i => GraftStreams.DocArrival(i.toLong, s"fp$i", ts))
    val b2 = (21 to 50).map(i =>
      GraftStreams.DocArrival(i.toLong, s"fp${i % 20 + 1}", ts))
    def run(pipe: org.apache.spark.sql.Dataset[GraftStreams.DocArrival]
        => org.apache.spark.sql.DataFrame, qn: String): Set[Long] = {
      val stream = MemoryStream[GraftStreams.DocArrival](spark)
      val q = pipe(stream.toDS())
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        stream.addData(b1)
        q.processAllAvailable()
        stream.addData(b2)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(qn).collect().map(_.getAs[Long]("doc_id")).toSet
    }
    val native = run(
      _.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("fingerprint").toDF(),
      s"nat03_${System.nanoTime()}")
    val explicit = run(
      d => GraftStreams.streamingExactDedup(d).toDF()
        .filter(col("doc_id") === col("keeper_id")),
      s"exp03_${System.nanoTime()}")
    assert(native == (1L to 20L).toSet,
      s"the native form must admit exactly the keepers: $native")
    assert(native == explicit,
      "native and explicit forms must admit the same set")
  }

  test("stream03 TTL: idle fingerprint state is evicted, re-arrival starts fresh") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val stream = MemoryStream[GraftStreams.DocArrival](spark)
    // 60 s retention, zero lateness allowance: the watermark tracks max
    // event time exactly, so eviction timing is fully deterministic.
    val q = GraftStreams.streamingExactDedup(
        stream.toDS(), watermarkDelay = "0 seconds", retentionMs = 60000L)
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode(OutputMode.Append).start()
    try {
      // b1: fp committed with keeper 5; TTL set to t=1000s + 60s.
      stream.addData(GraftStreams.DocArrival(5L, "fp", ts(1000)))
      q.processAllAvailable()
      // b2: advance the watermark far past fp's timeout (1060s).
      // (Each later batch's ts is strictly above the current watermark —
      // rows at ts <= watermark are dropped as late.)
      stream.addData(GraftStreams.DocArrival(90L, "adv", ts(2000)))
      q.processAllAvailable()
      // b3: the first batch AFTER the watermark passes the timeout fires
      // the eviction (state for fp removed; nothing emitted for it).
      stream.addData(GraftStreams.DocArrival(91L, "adv2", ts(2100)))
      q.processAllAvailable()
      // b4: fp re-arrives AFTER eviction → fresh keeper (doc 7), not
      // the pre-eviction keeper 5.
      stream.addData(GraftStreams.DocArrival(7L, "fp", ts(2200)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("dedup_ttl_out").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(verdicts == Map(5L -> 5L, 90L -> 90L, 91L -> 91L, 7L -> 7L),
      s"evicted fingerprint must restart with a fresh keeper, got $verdicts")
  }

  test("stream03 TTL: sightings within the horizon refresh state (no eviction)") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val stream = MemoryStream[GraftStreams.DocArrival](spark)
    val q = GraftStreams.streamingExactDedup(
        stream.toDS(), watermarkDelay = "0 seconds", retentionMs = 60000L)
      .writeStream.format("memory").queryName("dedup_ttl_keep_out")
      .outputMode(OutputMode.Append).start()
    try {
      // Each sighting lands within 60 s of the previous one, so the
      // refreshed TTL always stays ahead of the advancing watermark:
      // total elapsed event time (100 s) exceeds the retention, but the
      // keeper must survive because the key was never idle that long.
      stream.addData(GraftStreams.DocArrival(5L, "fp", ts(1000)))
      q.processAllAvailable()
      stream.addData(GraftStreams.DocArrival(6L, "fp", ts(1050)))
      q.processAllAvailable()
      stream.addData(GraftStreams.DocArrival(7L, "fp", ts(1100)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("dedup_ttl_keep_out").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(verdicts == Map(5L -> 5L, 6L -> 5L, 7L -> 5L),
      s"active fingerprint must keep its keeper across the horizon, got $verdicts")
  }

  test("stream07 TTL: idle span state is evicted, recurring spans survive") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val stream = MemoryStream[GraftStreams.SpanArrival](spark)
    val q = GraftStreams.streamingSpanDedup(
        stream.toDS(), watermarkDelay = "0 seconds", retentionMs = 60000L)
      .writeStream.format("memory").queryName("span_ttl_out")
      .outputMode(OutputMode.Append).start()
    try {
      // Span 11 goes idle past the retention; span 22 keeps recurring
      // within it (the boilerplate case) and must keep its first owner.
      stream.addData(GraftStreams.SpanArrival(1L, 11L, ts(1000)),
        GraftStreams.SpanArrival(1L, 22L, ts(1000)))
      q.processAllAvailable()
      stream.addData(GraftStreams.SpanArrival(2L, 22L, ts(1050)))
      q.processAllAvailable()
      stream.addData(GraftStreams.SpanArrival(3L, 22L, ts(2000)))
      q.processAllAvailable()
      // This batch processes against the 2000s watermark: span 11's
      // 1060s timeout fires (state removed), span 22's refreshed 2060s
      // timeout has not — the eviction must fire in a batch where the
      // key carries NO data, because in-batch data beats the timeout.
      stream.addData(GraftStreams.SpanArrival(5L, 99L, ts(2100)))
      q.processAllAvailable()
      // Span 11's re-arrival after eviction is a fresh first owner.
      stream.addData(GraftStreams.SpanArrival(4L, 11L, ts(2200)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("span_ttl_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(rows((1L, 11L)) == ((1L, false)))
    assert(rows((5L, 99L)) == ((5L, false)))
    assert(rows((4L, 11L)) == ((4L, false)),
      s"evicted span must restart with a fresh owner, got ${rows((4L, 11L))}")
    // Span 22's 2000s sighting rides the batch that ADVANCES the
    // watermark to 2000s: it processes against the old 1050s watermark
    // and refreshes the TTL to 2060s before any eviction could fire, so
    // the recurring span keeps its owner (data beats timeout in-batch).
    assert(rows((2L, 22L)) == ((1L, true)))
    assert(rows((3L, 22L)) == ((1L, true)),
      s"recurring span must keep its first owner, got ${rows((3L, 22L))}")
  }

  test("sessionize recovers keyed state from checkpoint across query restarts") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val stream = MemoryStream[GraftStreams.SessionEvent](spark)
    def start() = GraftStreams.sessionize(stream.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[GraftStreams.SessionOut], _: Long) =>
          batch.collect().filter(!_.closed)
            .foreach(a => results.add(a.event_id -> a.session_id))
      }
      .start()

    val q1 = start()
    try {
      stream.addData(GraftStreams.SessionEvent(9L, 1L, new Timestamp(1000L * 1000)))
      q1.processAllAvailable()
    } finally q1.stop()

    // Restart from the same checkpoint: the 31-min-later event must get
    // session 2 — only possible if q2 recovered q1's state (a fresh
    // query would assign session 1).
    val q2 = start()
    try {
      stream.addData(GraftStreams.SessionEvent(9L, 2L, new Timestamp((1000L + 1860L) * 1000)))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = results.toArray(Array.empty[(Long, Long)]).toMap
    assert(got(2L) == 2L,
      s"restarted query must continue from checkpointed state, got $got")
  }

  test("stream09: streaming ingest dedup equals batch dedup11, idempotent replay") {
    import graft.operators.Dedup
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream09_${System.nanoTime()}"
    val arrivals = Tables.documents(spark, sf)
      .filter(col("doc_id") % Dedup.IngestMod === Dedup.IngestRem)
      .select("doc_id", "text")
      .as[GraftStreams.IngestArrival].collect()
    assert(arrivals.length >= 2)
    // Two micro-batches: verdicts must be invariant under re-batching.
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.IngestArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landIngestBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("doc_id", "decision", "keeper_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val batch = Dedup.dedup11IncrementalIngest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(landed() == batch,
      "streamed verdicts diverge from the batch operator")
    // Replay micro-batch 0 (restart recovery): the partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landIngestBatch(
      first.toSeq.toDF("doc_id", "text"), sf, outDir, 0L)
    assert(landed() == batch, "replay must be a no-op")
  }

  test("stream16: streamed fuzzy-linkage gate equals batch etl28, admit leg, replay") {
    import graft.operators.Etl
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream16_${System.nanoTime()}"
    // Arrivals = the corpus' own distinct names (id = first part key)
    // plus one clean name whose noun exists nowhere in the vocabulary,
    // so all three verdicts are exercised.
    val corpusArrivals = Tables.part(spark, sf)
      .groupBy("p_name").agg(min("p_partkey").as("arrival_id"))
      .select(col("arrival_id"), col("p_name"))
      .as[GraftStreams.PartArrival].collect().sortBy(_.arrival_id)
    assert(corpusArrivals.length >= 4)
    val clean = GraftStreams.PartArrival(-1L, "zzz contraption")
    val arrivals = clean +: corpusArrivals
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.PartArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landFuzzyLinkBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("arrival_id", "p_name", "verdict", "match_name", "dist")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.get(4)).map(_.toString.toInt)))
      .toSet
    val got = landed()
    // Re-batching invariance: the two-micro-batch landing equals the
    // shared decision core run once over ALL arrivals.
    val oneShot = Etl.etl28IngestCandidates(spark, sf,
        arrivals.toSeq.toDF("arrival_id", "p_name"))
      .select("arrival_id", "p_name", "verdict", "match_name", "dist")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.get(4)).map(_.toString.toInt)))
      .toSet
    assert(got == oneShot, "re-batching changed the verdict set")
    // The clean arrival admits with null match columns.
    assert(got.filter(_._1 == -1L) ==
      Set((-1L, "zzz contraption", "admit", None, None)))
    // Every corpus name matches itself exactly, exactly once.
    val exacts = got.filter(_._3 == "exact")
    assert(exacts.size == corpusArrivals.length)
    exacts.foreach { case (_, name, _, m, d) =>
      assert(m.contains(name) && d.contains(0))
    }
    // The near queue, oriented arrival < match, IS batch etl28's pair
    // list (same rule, same vocabulary — the gate can't drift).
    val nearPairs = got.collect {
      case (_, a, "near", Some(m), Some(d)) if a < m => (a, m, d)
    }
    val batchPairs = Etl.etl28FuzzyLink(spark, sf).collect()
      .map(r => (r.getString(r.fieldIndex("name_a")),
        r.getString(r.fieldIndex("name_b")),
        r.getInt(r.fieldIndex("dist")))).toSet
    assert(nearPairs == batchPairs,
      "streamed near candidates diverge from batch etl28")
    // Replay micro-batch 0 (restart recovery): partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landFuzzyLinkBatch(
      first.toSeq.toDF("arrival_id", "p_name"), sf, outDir, 0L)
    assert(landed() == got, "replay must be a no-op")
  }

  test("stream15: streamed decontamination equals batch cur16, idempotent replay") {
    import graft.operators.{Curation, Dedup}
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream15_${System.nanoTime()}"
    // Arrivals = the corpus' own training split, so the gate's verdicts
    // must equal batch cur16's spans exactly.
    val arrivals = Tables.documents(spark, sf)
      .filter(col("source") =!= "src0")
      .select("doc_id", "text")
      .as[GraftStreams.IngestArrival].collect()
    assert(arrivals.length >= 2)
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.IngestArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landDecontamBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("doc_id", "span_id", "start_pos", "end_pos", "n_windows")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = Curation.cur16SubstringContamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch.nonEmpty, "fixture must carry cross-split contamination")
    assert(landed() == batch,
      "streamed contamination spans diverge from batch cur16")
    // Replay micro-batch 0 (restart recovery): partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landDecontamBatch(
      first.toSeq.toDF("doc_id", "text"), sf, outDir, 0L)
    assert(landed() == batch, "replay must be a no-op")
    // And the gate really is index-probing, not corpus-rescanning: a
    // clean arrival (no held-out overlap) lands zero spans.
    GraftStreams.landDecontamBatch(
      Seq((999999L, "zz1 zz2 zz3")).toDF("doc_id", "text"), sf, outDir, 7L)
    assert(spark.read.parquet(s"$outDir/batch_id=7").count() == 0)
    // Relies on Dedup.heldOutWindowHashes staying pinned across calls.
    assert(Dedup.heldOutWindowHashes(spark, sf).count() > 0)
  }

  test("stream10: streamed CMS partials merge to the batch sketch, idempotent replay") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream10_${System.nanoTime()}"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text")
      .as[GraftStreams.IngestArrival].collect()
    assert(docs.length >= 2)
    val (first, second) = docs.splitAt(docs.length / 2)
    val stream = MemoryStream[GraftStreams.IngestArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landCmsBatch(b.toDF(), outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def merged() = GraftStreams.mergedCms(spark, outDir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // The merge law: partial sketches summed cell-wise equal the batch
    // build over the same documents in one frame — text15's sketch
    // builder, so the streamed structure is the audited one.
    val expected = TextAnalysis.cmsPartial(
        Tables.documents(spark, sf).select("text")).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(expected.nonEmpty)
    assert(merged() == expected,
      "merged micro-batch partials diverge from the one-frame sketch")
    // Replay micro-batch 0 (restart recovery): the partition overwrite
    // lands identical cells instead of double-counting them.
    GraftStreams.landCmsBatch(first.toSeq.toDF("doc_id", "text"), outDir, 0L)
    assert(merged() == expected, "replay must be a no-op")
  }

  test("stream11: streamed IVF appends equal batch assignment, prune by cell, replay no-op") {
    import graft.operators.Similarity
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream11_${System.nanoTime()}"
    val arrivals = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .as[GraftStreams.EmbeddingArrival].collect()
    assert(arrivals.length >= 2)
    // Two micro-batches: assignment is per-row, so the landed cells
    // must be invariant under re-batching.
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.EmbeddingArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landIvfBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landedCells() = GraftStreams.streamedIvfAppends(spark, outDir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchAssigned = Similarity.ivfAssignArrivals(spark, sf,
        Tables.embeddings(spark, sf).select("vec_id", "embedding"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(landedCells() == batchAssigned,
      "streamed cell assignment diverges from the shared batch rule")
    // The streamed side of the live index prunes at the file level: a
    // probe-cell filter must reach the scan as a partition filter over
    // the cell= directories, never a full read + row filter.
    val someCell = batchAssigned.values.head
    val pruned = GraftStreams.streamedIvfAppends(spark, outDir)
      .filter(col("cell") === someCell)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"cell filter must prune partitions at the scan:\n${plan.take(1500)}")
    assert(pruned.select("vec_id").collect().map(_.getLong(0)).toSet ==
      batchAssigned.collect { case (id, c) if c == someCell => id }.toSet)
    // Replay micro-batch 0 (restart recovery): the partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landIvfBatch(
      spark.createDataFrame(first.toSeq), sf, outDir, 0L)
    assert(landedCells() == batchAssigned, "replay must be a no-op")
  }

  test("stream24: streamed graph inserts equal the batch rule, re-batching invariant, replay no-op") {
    import graft.operators.Similarity
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream24_${System.nanoTime()}"
    // Arrivals: a float-native slice of the embeddings table (ids 100+,
    // clear of the query/entry ids), stream11's arrival shape — the
    // batch truth runs the SAME shared core on the same floats, so the
    // equality tests the streaming plumbing + landing, and the
    // two-batch split tests sim21's batch-insert contract (every
    // arrival links against the PRE-BATCH graph, never its batch-mates
    // — so re-batching cannot move an edge).
    val arrivals = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 100 && col("vec_id") < 130)
      .select("vec_id", "embedding")
      .as[GraftStreams.EmbeddingArrival].collect()
    assert(arrivals.length >= 10)
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.EmbeddingArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landGraphInsertBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("vec_id", "rk", "nb_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val batchEdges = Similarity.graphInsertArrivalEdges(spark, sf,
        spark.createDataFrame(arrivals.toSeq))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(landed() == batchEdges,
      "streamed insert edges diverge from the shared batch insert rule")
    // Every arrival got exactly the insert degree of forward edges.
    assert(landed().keySet.map(_._1) == arrivals.map(_.vec_id).toSet)
    arrivals.foreach { a =>
      assert(landed().keySet.count(_._1 == a.vec_id) ==
        Similarity.GraphInsertDegree, s"arrival ${a.vec_id} edge count")
    }
    // Replay micro-batch 0 (restart recovery): per-partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landGraphInsertBatch(
      spark.createDataFrame(first.toSeq), sf, outDir, 0L)
    assert(landed() == batchEdges, "replay must be a no-op")
  }

  test("stream28: fed tombstone set — per-version equality to batch sim23; mid-stream publish re-routes only new batches; replay re-decides") {
    import graft.operators.{Dedup, Similarity}
    import graft.sources.CodebookStore
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream28_${System.nanoTime()}"
    val store = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream28_store_${System.nanoTime()}"
    // A search before ANY published set fails loudly — resolving a
    // missing ledger to "no deletes" would silently serve erased ids.
    intercept[IllegalStateException](GraftStreams.landTombstonedSearchBatch(
      Seq(0L).toDF("q_id"), sf, store, outDir, 99L))
    // v1 IS the salted rule's set, published as a fed artifact — the
    // per-version equality below is then EXACT against batch sim23
    // itself, not a restatement.
    val salted = Dedup.vectors(spark, sf).select("vec_id")
      .filter(Similarity.tombstoneFlag(col("vec_id")))
    assert(CodebookStore.publishFrame(spark, store, salted) == 1L)
    val stream = MemoryStream[Long](spark)
    val q = stream.toDF().toDF("q_id").writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landTombstonedSearchBatch(b.toDF(), sf, store, outDir, id)
      }
      .start()
    def batchRows(id: Long): Map[(Long, Int), (Long, Long)] =
      spark.read.parquet(s"$outDir/batch_id=$id")
        .select("q_id", "rk", "vec_id", "tombstone_version").collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    try {
      stream.addData(Seq(0L, 1L, 2L))
      q.processAllAvailable()
      val b0 = batchRows(0L)
      assert(b0.nonEmpty && b0.values.forall(_._2 == 1L),
        "batch 0 must be decided (and stamped) under v1")
      val sim23 = Similarity.sim23GraphDelete(spark, sf).collect()
        .filter(r => Set(0L, 1L, 2L)(r.getLong(0)))
        .map(r => (r.getLong(0), r.getInt(r.fieldIndex("rk"))) ->
          r.getAs[Long]("vec_id")).toMap
      assert(b0.map { case (k, (v, _)) => k -> v } == sim23,
        "v1 results must equal batch sim23 exactly (same set, fed)")
      // MID-STREAM PUBLISH: a new recall names an id batch 0 returned
      // (live under v1 by construction — results never contain
      // tombstones), so the flip is observable, not coincidental.
      val victim = b0((0L, 1))._1
      assert(CodebookStore.publishFrame(spark, store,
        salted.union(Seq(victim).toDF("vec_id"))) == 2L)
      stream.addData(Seq(0L, 3L))
      q.processAllAvailable()
      val b1 = batchRows(1L)
      assert(b1.values.forall(_._2 == 2L),
        "batch 1 must resolve the newly committed version")
      assert(!b1.values.exists(_._1 == victim),
        "the fed delete must stop appearing immediately in new batches")
      // Independent ground truth for v2: sim23's route-through law as
      // a predicate (navigate the same pool, drop at the cut only).
      val expectV2 = Similarity.sim19TopPer(
          Similarity.sim19VisitedPool(spark, sf)
            .filter(col("q_id").isin(0L, 3L))
            .filter(!Similarity.tombstoneFlag(col("vec_id")))
            .filter(col("vec_id") =!= victim),
          Similarity.TopK)
        .select("q_id", "rk", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(b1.map { case (k, (v, _)) => k -> v } == expectV2)
      // Already-landed batches are untouched by the publish: batch 0
      // still serves its v1 decision (auditable against the retained
      // v1 artifact), victim included.
      val b0After = batchRows(0L)
      assert(b0After == b0, "a publish must not rewrite landed batches")
      assert(b0After.values.exists(_._1 == victim))
      // Replay-as-re-decision (stream17's contract): re-landing batch
      // 0 TODAY re-decides under the CURRENT version — the victim is
      // gone and every row is stamped v2.
      GraftStreams.landTombstonedSearchBatch(
        Seq(0L, 1L, 2L).toDF("q_id"), sf, store, outDir, 0L)
      val replayed = batchRows(0L)
      assert(replayed.values.forall(_._2 == 2L))
      assert(!replayed.values.exists(_._1 == victim))
    } finally q.stop()
    CodebookStore.reset(spark, store)
  }

  test("stream29: composed-mask read — per-version-pair equality to batch cur29; mid-stream publish re-routes only new batches; replay re-decides") {
    import graft.operators.Curation
    import graft.sources.CodebookStore
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream29_${System.nanoTime()}"
    val tdStore = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream29_td_${System.nanoTime()}"
    val spStore = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream29_sp_${System.nanoTime()}"
    // A read before EITHER ledger has a committed version fails loudly
    // — resolving a missing ledger to "no masks" would serve recalled
    // content. Both missing-arm orders checked (td absent; td present
    // but sp absent).
    intercept[IllegalStateException](GraftStreams.landComposedMaskReadBatch(
      Seq(("src0", 0L)).toDF("source", "seq"), sf, tdStore, spStore, outDir, 99L))
    val (td, sp) = Curation.cur31MaskFamilies(spark, sf)
    assert(CodebookStore.publishFrame(spark, tdStore, td) == 1L)
    intercept[IllegalStateException](GraftStreams.landComposedMaskReadBatch(
      Seq(("src0", 0L)).toDF("source", "seq"), sf, tdStore, spStore, outDir, 99L))
    // v1 pair IS cur25+cur28's rows, fed — the per-pair equality below
    // is then EXACT against batch cur29 itself, not a restatement.
    assert(CodebookStore.publishFrame(spark, spStore, sp) == 1L)
    val cur29 = Curation.cur29ComposedMasks(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("seq")) ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("content_hash")))).toMap
    assert(cur29.nonEmpty)
    val allReqs = cur29.keys.toSeq.sorted
    val (reqA, reqB) = allReqs.splitAt(allReqs.length / 2)
    val offStream = ("src0", 999999L)
    val stream = MemoryStream[GraftStreams.ReadRequestArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landComposedMaskReadBatch(
            b.toDF(), sf, tdStore, spStore, outDir, id)
      }
      .start()
    def batchRows(id: Long): Map[(String, Long), (Long, Long, Long, Long)] =
      spark.read.parquet(s"$outDir/batch_id=$id")
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq")) ->
          ((r.getAs[Long]("n_toks"), r.getAs[Long]("content_hash"),
            r.getAs[Long]("takedown_version"), r.getAs[Long]("span_version"))))
        .toMap
    try {
      stream.addData(
        (reqA :+ offStream).map((GraftStreams.ReadRequestArrival.apply _).tupled))
      q.processAllAvailable()
      val b0 = batchRows(0L)
      assert(b0.keySet == reqA.toSet,
        "batch 0 must serve exactly its on-stream requests (the re-tiled-away " +
          "request serves nothing — the correct verdict, not an error)")
      assert(b0.forall { case (k, (n, h, vt, vs)) =>
        (n, h) == cur29(k) && vt == 1L && vs == 1L },
        "v1-pair slices must equal batch cur29 hash-for-hash, stamped (1,1)")
      // MID-STREAM PUBLISH: the span family's masks are retired (an
      // empty v2 — cur31's post-repack flip on ONE ledger), so new
      // batches read under takedown masks ONLY; the flip is observable
      // because the td-only re-tile genuinely differs from the
      // composed one at this sf (asserted, not assumed).
      assert(CodebookStore.publishFrame(spark, spStore, sp.limit(0)) == 2L)
      val tdOnly = Curation.maskedRetiledRead(spark, sf,
          Curation.cur31MaskFamilies(spark, sf)._1, "cur27")
        .collect()
        .map(r => (r.getString(0), r.getAs[Long]("seq")) ->
          ((r.getAs[Long]("n_toks"), r.getAs[Long]("content_hash")))).toMap
      assert(tdOnly.exists { case (k, v) => cur29.get(k) != Some(v) },
        "span retirement must change the read — flip arm vacuous at this sf")
      stream.addData(reqB.map((GraftStreams.ReadRequestArrival.apply _).tupled))
      q.processAllAvailable()
      val b1 = batchRows(1L)
      assert(b1.keySet == reqB.toSet.intersect(tdOnly.keySet))
      assert(b1.forall { case (k, (n, h, vt, vs)) =>
        (n, h) == tdOnly(k) && vt == 1L && vs == 2L },
        "batch 1 must read under the newly committed pair (1,2)")
      // Already-landed batches are untouched by the publish.
      assert(batchRows(0L) == b0, "a publish must not rewrite landed batches")
      // Replay-as-re-decision: re-landing batch 0 TODAY re-decides
      // under the CURRENT pair — same requests, td-only content,
      // stamped (1,2).
      GraftStreams.landComposedMaskReadBatch(
        (reqA :+ offStream).toDF("source", "seq"), sf, tdStore, spStore,
        outDir, 0L)
      val replayed = batchRows(0L)
      assert(replayed.keySet == reqA.toSet.intersect(tdOnly.keySet))
      assert(replayed.forall { case (k, (n, h, vt, vs)) =>
        (n, h) == tdOnly(k) && vt == 1L && vs == 2L })
    } finally q.stop()
    CodebookStore.reset(spark, tdStore)
    CodebookStore.reset(spark, spStore)
  }

  test("stream25: streamed takedown masks equal batch cur25, off-manifest ids mask nothing, replay no-op") {
    import graft.operators.Curation
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream25_${System.nanoTime()}"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // The recall feed: exactly cur25's takedown set (so the streamed
    // union must equal the batch emit row-for-row), split mid-stream,
    // PLUS one id that is NOT in the train manifest — a recall for an
    // unpacked doc masks nothing (the clean arm, not an error).
    val recalled = Curation.cur18TrainManifest(spark, sf).collect()
      .map(_.getAs[Long]("doc_id"))
      .filter(id => md5hex("takedown:" + id).take(2) < Curation.TakedownHexThr)
    assert(recalled.length >= 2)
    val offManifest = 999999L
    val (first, second) = recalled.splitAt(recalled.length / 2)
    val stream = MemoryStream[GraftStreams.RecallArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landTakedownMaskBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.map(GraftStreams.RecallArrival).toSeq)
      q.processAllAvailable()
      stream.addData(
        (second.map(GraftStreams.RecallArrival) :+
          GraftStreams.RecallArrival(offManifest)).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("source", "seq", "shard", "doc_id", "mask_start", "mask_end",
        "masked_toks")
      .collect().map(_.toSeq.toVector).toSet
    val batchRows = Curation.cur25TombstoneMask(spark, sf)
      .collect().map(_.toSeq.toVector).toSet
    assert(landed() == batchRows,
      "streamed mask rows diverge from the shared batch clipping rule")
    assert(!landed().exists(_(3) == offManifest),
      "an off-manifest recall must mask nothing")
    // Replay micro-batch 0 (restart recovery): per-partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landTakedownMaskBatch(
      spark.createDataFrame(first.map(GraftStreams.RecallArrival).toSeq),
      sf, outDir, 0L)
    assert(landed() == batchRows, "replay must be a no-op")
  }

  test("stream27: streamed span redactions equal batch cur28; junk findings mask nothing; replay no-op") {
    import graft.operators.Curation
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream27_${System.nanoTime()}"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // The findings feed: exactly cur28's redaction set with its
    // deterministic spans (so the streamed union must equal the batch
    // emit row-for-row), split mid-stream, PLUS the junk a real feed
    // carries — an off-manifest id, a DEGENERATE span (lo >= hi), and
    // an entirely out-of-range span. All three must mask nothing.
    val spanned = Curation.cur18TrainManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("post_toks")))
      .filter { case (id, _) =>
        md5hex("redact:" + id).take(2) < Curation.RedactHexThr }
      .map { case (id, post) =>
        val lo = post / 4
        GraftStreams.SpanFindingArrival(id, lo, math.max(lo + 1, post / 2)) }
    assert(spanned.length >= 2)
    val inManifest = spanned.head.doc_id
    val junk = Seq(
      GraftStreams.SpanFindingArrival(999999L, 0L, 5L), // off-manifest
      GraftStreams.SpanFindingArrival(inManifest, 7L, 7L), // degenerate
      GraftStreams.SpanFindingArrival(inManifest, 1000000L, 1000005L)) // out of range
    val (first, second) = spanned.splitAt(spanned.length / 2)
    val stream = MemoryStream[GraftStreams.SpanFindingArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landSpanRedactionBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData((second ++ junk).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("source", "seq", "shard", "doc_id", "mask_start", "mask_end",
        "masked_toks")
      .collect().map(_.toSeq.toVector).toSet
    val batchRows = Curation.cur28SpanRedaction(spark, sf)
      .collect().map(_.toSeq.toVector).toSet
    assert(landed() == batchRows,
      "streamed span masks diverge from the shared batch span/clipping rule")
    assert(!landed().exists(_(3) == 999999L),
      "an off-manifest finding must mask nothing")
    // The junk spans on the in-manifest doc contributed nothing beyond
    // its batch rows (already implied by set equality — asserted
    // directly so a future masked_toks<=0 explosion names itself).
    assert(landed().forall(_(6).asInstanceOf[Long] > 0L),
      "every landed mask row must carry a positive masked_toks")
    // Replay micro-batch 0 (restart recovery): per-partition overwrite
    // lands identical rows instead of duplicating them.
    GraftStreams.landSpanRedactionBatch(
      spark.createDataFrame(first.toSeq), sf, outDir, 0L)
    assert(landed() == batchRows, "replay must be a no-op")
  }

  test("composed loader read over the LANDED stream25 + stream27 mask dirs equals batch cur29 (the deployed state, from the files)") {
    import graft.operators.Curation
    import spark.implicits._
    // The deployment state cur29 models is literally what the two
    // feeds LAND: stream25's whole-doc mask rows and stream27's span
    // mask rows under their batch_id=N dirs. The per-feed specs pin
    // each feed == its batch twin; this arm closes the transitivity
    // loop from the landed FILES — union the dirs, run the one
    // masked-read pass, and the result must equal cur29 row-for-row.
    val tmp = System.getProperty("java.io.tmpdir")
    val out25 = s"$tmp/graft_comp25_${System.nanoTime()}"
    val out27 = s"$tmp/graft_comp27_${System.nanoTime()}"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val man = Curation.cur18TrainManifest(spark, sf).collect()
    val recalls = man.map(_.getAs[Long]("doc_id"))
      .filter(id => md5hex("takedown:" + id).take(2) < Curation.TakedownHexThr)
      .map(GraftStreams.RecallArrival)
    val findings = man
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("post_toks")))
      .filter { case (id, _) =>
        md5hex("redact:" + id).take(2) < Curation.RedactHexThr }
      .map { case (id, post) =>
        val lo = post / 4
        GraftStreams.SpanFindingArrival(id, lo, math.max(lo + 1, post / 2)) }
    // Land each feed as two micro-batches (the landing seams are plain
    // functions — the MemoryStream plumbing is pinned by each feed's
    // own spec).
    val (r1, r2) = recalls.splitAt(recalls.length / 2)
    val (f1, f2) = findings.splitAt(findings.length / 2)
    GraftStreams.landTakedownMaskBatch(spark.createDataFrame(r1.toSeq), sf, out25, 0L)
    GraftStreams.landTakedownMaskBatch(spark.createDataFrame(r2.toSeq), sf, out25, 1L)
    GraftStreams.landSpanRedactionBatch(spark.createDataFrame(f1.toSeq), sf, out27, 0L)
    GraftStreams.landSpanRedactionBatch(spark.createDataFrame(f2.toSeq), sf, out27, 1L)
    val maskCols = Seq("source", "seq", "shard", "doc_id", "mask_start",
      "mask_end", "masked_toks")
    val landedMasks = spark.read.parquet(out25).select(maskCols.head, maskCols.tail: _*)
      .unionByName(spark.read.parquet(out27).select(maskCols.head, maskCols.tail: _*))
    val viaLanded = Curation.maskedRetiledRead(spark, sf, landedMasks, "cur29")
      .collect().map(_.toSeq.toVector).toSet
    val batch = Curation.cur29ComposedMasks(spark, sf)
      .select("source", "seq", "n_toks", "content_hash")
      .collect().map(_.toSeq.toVector).toSet
    assert(viaLanded == batch,
      "the loader read over the LANDED mask dirs diverges from batch cur29")
  }

  test("stream26: streamed erasure feed == one-shot batch scrub; survivors byte-identical; replay no-op") {
    import graft.operators.Etl
    import graft.sources.MergeSink
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def buildTable(tag: String): (String, String) = {
      val table = s"g_stream26_$tag"
      val base = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_stream26_${tag}_${System.nanoTime()}"
      MergeSink.reset(spark, table, base)
      val log = Etl.cdcLog(spark, sf)
      (0 until 3).foreach { i =>
        MergeSink.merge(spark, table, base,
          log.filter(col("seq") % 3 === i), retainLast = 3)
      }
      (table, base)
    }
    def raw(base: String, v: Long) =
      MergeSink.snapshotRows(spark, base, v)
        .collect().map(_.toSeq.toVector).toSet
    val erase = Etl.cdcLog(spark, sf).select("key").distinct()
      .filter(Etl.etl29EraseFlag(col("key")))
      .collect().map(_.getLong(0)).sorted
    assert(erase.length >= 2)
    val (k1, k2) = erase.splitAt(erase.length / 2)
    // Streamed: the erase set split MID-STREAM over table A — each
    // micro-batch scrubs all retained history through the one seam.
    val (tA, bA) = buildTable("a")
    val versions = MergeSink.versions(spark, bA)
    val pre = versions.map(v => v -> raw(bA, v)).toMap
    val stream = MemoryStream[GraftStreams.ErasureArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          GraftStreams.landErasureBatch(b.toDF(), tA, bA)
      }
      .start()
    try {
      stream.addData(k1.map(GraftStreams.ErasureArrival).toSeq)
      q.processAllAvailable()
      stream.addData(k2.map(GraftStreams.ErasureArrival).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // One-shot batch scrub over table B (re-batching invariance: two
    // micro-batches must equal scrub(K1 ∪ K2) — set removal composes).
    val (tB, bB) = buildTable("b")
    MergeSink.scrubVersions(spark, tB, bB, erase.toSeq.toDF("key"))
    assert(MergeSink.versions(spark, bA) == versions,
      "the feed must keep the version set intact")
    versions.foreach { v =>
      val a = raw(bA, v)
      assert(a == raw(bB, v), s"v$v: streamed != one-shot batch scrub")
      // Survivors byte-identical, erased keys gone (tombstones too).
      assert(a == pre(v).filterNot(r =>
        erase.contains(r(0).asInstanceOf[Long])), s"v$v content")
    }
    // Replay micro-batch 0 (restart recovery): removing already-absent
    // keys is a no-op.
    GraftStreams.landErasureBatch(
      spark.createDataFrame(k1.map(GraftStreams.ErasureArrival).toSeq), tA, bA)
    versions.foreach(v => assert(raw(bA, v) == raw(bB, v), "replay must be a no-op"))
    // An EMPTY micro-batch (the feed's usual state) must not rewrite
    // history at all — the snapshot FILES stay untouched, not just
    // their content (a rewrite would churn file names).
    def fileNames(v: Long): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$bA/v$v")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).map(_.getPath.getName).toSet
    }
    val before = versions.map(v => v -> fileNames(v)).toMap
    GraftStreams.landErasureBatch(
      spark.createDataFrame(Seq.empty[GraftStreams.ErasureArrival]), tA, bA)
    versions.foreach(v => assert(fileNames(v) == before(v),
      s"v$v: an empty micro-batch must not touch the snapshot files"))
  }

  test("stream19: streamed packing equals batch positions; the cursor carries across batches") {
    import graft.operators.Curation
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
    val expected = Curation.sequencePackPositions(docs, Curation.CtxChars)
      .select("source", "doc_id", "seq_first", "seq_last")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // Feed in the packing order (the shard writer's contract), split
    // MID-STREAM so most sources' cursors must carry across the batch
    // line for the spans to line up.
    val ordered = docs
      .withColumn("hk", substring(md5(col("doc_id").cast("string")), 1, 8))
      .orderBy("hk", "doc_id")
      .select("source", "doc_id", "n_chars").collect()
      .zipWithIndex.map { case (r, i) =>
        GraftStreams.PackArrival(r.getString(0), r.getLong(1), r.getLong(2),
          new Timestamp((i + 1) * 1000L))
      }
    val (first, second) = ordered.splitAt(ordered.length / 2)
    val qn = s"s19_${System.nanoTime()}"
    val stream = MemoryStream[GraftStreams.PackArrival](spark)
    val q = GraftStreams.streamingSequencePack(stream.toDS(), Curation.CtxChars)
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(qn).collect()
    val got = rows
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, "streamed spans diverge from the batch positions")
    rows.foreach(r => assert(r.getBoolean(4) == (r.getLong(3) > r.getLong(2))))
    // The split genuinely crossed open cursors: at least one source has
    // docs on both sides of the batch line.
    val firstSrcs = first.map(_.source).toSet
    assert(second.exists(a => firstSrcs(a.source)),
      "fixture must carry a cursor across the batch boundary")
  }

  test("stream23: manifest emit through the transactional file sink equals the batch manifest") {
    import graft.operators.Curation
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
    val sps = Curation.Cur20SeqsPerShard
    val expected = Curation.sequencePackPositions(docs, Curation.CtxChars)
      .select(col("source"), col("doc_id"), col("n_chars").as("n_units"),
        col("seq_first"), col("seq_last"),
        ((col("cum_end") - col("n_chars")) % Curation.CtxChars).as("off_first"),
        floor(col("seq_first") / sps).as("shard"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val ordered = docs
      .withColumn("hk", substring(md5(col("doc_id").cast("string")), 1, 8))
      .orderBy("hk", "doc_id")
      .select("source", "doc_id", "n_chars").collect()
      .zipWithIndex.map { case (r, i) =>
        GraftStreams.PackArrival(r.getString(0), r.getLong(1), r.getLong(2),
          new Timestamp((i + 1) * 1000L))
      }
    val (first, second) = ordered.splitAt(ordered.length / 2)
    val base = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream23_${System.nanoTime()}"
    val stream = MemoryStream[GraftStreams.PackArrival](spark)
    // The REAL emit path: the transactional parquet file sink, shard
    // layout and all — not a memory sink stand-in.
    val q = GraftStreams.streamingManifestPack(stream.toDS(), Curation.CtxChars)
      .writeStream.format("parquet")
      .partitionBy("source", "shard")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // The commit log is the exactly-once contract: readers resolve
    // files through _spark_metadata, so an uncommitted or replayed
    // batch can never double-land rows.
    assert(new java.io.File(s"$base/out/_spark_metadata").exists(),
      "file sink must write its transactional commit log")
    val outDirs = new java.io.File(s"$base/out").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("source="))
    assert(outDirs.nonEmpty &&
      outDirs.forall(_.listFiles().exists(_.getName.startsWith("shard="))),
      "emitted layout must be hive-partitioned by (source, shard)")
    val got = spark.read.parquet(s"$base/out")
      .select(col("source"), col("doc_id"), col("n_units"),
        col("seq_first"), col("seq_last"), col("off_first"),
        col("shard").cast("long").as("shard"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == got.toMap.size, "no doc may land twice")
    assert(got.toMap == expected,
      "emitted manifest diverges from the batch packing positions")
    // The split genuinely crossed open cursors.
    val firstSrcs = first.map(_.source).toSet
    assert(second.exists(a => firstSrcs(a.source)),
      "fixture must carry a cursor across the batch boundary")
  }

  test("stream23 equals cur20's funnel manifest row-for-row (post-scrub units, shard math)") {
    import graft.operators.Curation
    import spark.implicits._
    // The REAL deliverable parity: cur18's train split streamed doc by
    // doc (post-both-scrubs token counts, cur18's ctx and shard width)
    // must reproduce the batch manifest exactly — spans, offsets, and
    // shard assignment, across a mid-stream batch split.
    val man = Curation.cur18TrainManifest(spark, sf).collect()
    assert(man.length >= 4)
    val expected = man.map(r => (r.getString(1), r.getLong(0)) ->
      (r.getAs[Long]("post_toks"), r.getAs[Long]("seq_first"),
        r.getAs[Long]("seq_last"), r.getAs[Long]("off_first"),
        r.getAs[Long]("shard"))).toMap
    def hk(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    val ordered = man.map(r => (r.getString(1), r.getLong(0),
        r.getAs[Long]("post_toks")))
      .sortBy(t => (t._1, hk(t._2), t._2))
      .zipWithIndex.map { case ((src, id, units), i) =>
        GraftStreams.PackArrival(src, id, units, new Timestamp((i + 1) * 1000L))
      }
    val (first, second) = ordered.splitAt(ordered.length / 2)
    val qn = s"s23p_${System.nanoTime()}"
    val stream = MemoryStream[GraftStreams.PackArrival](spark)
    val q = GraftStreams.streamingManifestPack(
        stream.toDS(), Curation.Cur18CtxTokens)
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(qn).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expected,
      "streamed funnel manifest diverges from cur20's batch manifest")
  }

  test("stream19/23 under RocksDB state: the pack cursor round-trips the deployment provider") {
    // stream13 pins the engine session store and stream14 the
    // FrameState family under RocksDB; this leg covers the pack-cursor
    // family (stream19/stream23 share packGroupFn — a Long cursor per
    // source that must survive the provider across micro-batches, or
    // every span after the batch line shifts).
    import graft.operators.Curation
    import spark.implicits._
    val providerCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    assume(
      try { Class.forName(providerCls); true }
      catch { case _: ClassNotFoundException => false },
      s"SKIPPING LOUDLY: $providerCls not on this Spark classpath")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, providerCls)
      val docs = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
      val expected = Curation.sequencePackPositions(docs, Curation.CtxChars)
        .select("source", "doc_id", "seq_first", "seq_last")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val ordered = docs
        .withColumn("hk", substring(md5(col("doc_id").cast("string")), 1, 8))
        .orderBy("hk", "doc_id")
        .select("source", "doc_id", "n_chars").collect()
        .zipWithIndex.map { case (r, i) =>
          GraftStreams.PackArrival(r.getString(0), r.getLong(1), r.getLong(2),
            new Timestamp((i + 1) * 1000L))
        }
      val (first, second) = ordered.splitAt(ordered.length / 2)
      val qn = s"pack_rocks_${System.nanoTime()}"
      val stream = MemoryStream[GraftStreams.PackArrival](spark)
      val q = GraftStreams.streamingManifestPack(stream.toDS(), Curation.CtxChars)
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        stream.addData(first.toSeq)
        q.processAllAvailable()
        stream.addData(second.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      assert(got == expected,
        "pack spans under RocksDB diverge from the batch positions")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream18: composed ingest funnel equals its legs, precedence holds, idempotent") {
    import graft.operators.{Curation, Dedup}
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream18_${System.nanoTime()}"
    // Arrivals = dedup11's arrival slice (the shared corpus-index
    // convention), so every leg has an independent batch truth.
    val arrivals = Tables.documents(spark, sf)
      .filter(col("doc_id") % Dedup.IngestMod === Dedup.IngestRem)
      .select("doc_id", "text")
      .as[GraftStreams.IngestArrival].collect()
    assert(arrivals.length >= 2)
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.IngestArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landFunnelBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("doc_id", "verdict", "keeper_id", "n_toks", "n_boiler",
        "boiler_toks", "n_spans", "toks_removed", "post_toks")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    val got = landed()
    // Re-batching invariance: the one-shot decision over all arrivals.
    val allDf = arrivals.toSeq.toDF("doc_id", "text")
    val oneShot = Curation.ingestFunnelVerdicts(spark, sf, allDf)
      .select("doc_id", "verdict", "keeper_id", "n_toks", "n_boiler",
        "boiler_toks", "n_spans", "toks_removed", "post_toks")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    assert(got == oneShot, "re-batching changed the verdict set")
    // Leg + precedence pins against independently computed truths.
    val dedupLeg = Dedup.ingestDecisions(spark, sf, allDf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def quality(text: String): Boolean = {
      val toks = text.split(" ", -1)
      val stop = Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
      text.length >= 100 && toks.length >= 20 &&
        toks.count(stop) / math.max(toks.length, 1).toDouble >= 0.02
    }
    val textOf = arrivals.map(a => a.doc_id -> a.text).toMap
    got.foreach { case (doc, (verdict, keeper, nToks, nBoiler, brm, nSpans,
        rm, post)) =>
      assert(post == nToks - brm - rm,
        s"doc $doc: post must subtract BOTH scrub families exactly once")
      assert(brm == nBoiler * Dedup.ParagraphTokens.toLong,
        s"doc $doc: template chunks remove whole chunks")
      if (!quality(textOf(doc)))
        assert(verdict == "drop_quality", s"doc $doc: quality rejects first")
      else dedupLeg(doc) match {
        case ("exact", k) =>
          assert(verdict == "dup_exact" && keeper == k, s"doc $doc")
        case ("near", k) =>
          assert(verdict == "dup_near" && keeper == k, s"doc $doc")
        case _ =>
          assert(verdict == (if (post == 0L) "drop_scrubbed" else "admit"),
            s"doc $doc: $verdict with brm=$brm rm=$rm of $nToks")
      }
      // The composition catch: an arriving HELD-OUT document that
      // reaches the scrub stage is fully self-contaminated and must
      // never be admitted into training. (Guarded to template-free
      // arrivals: a boiler chunk leaves sub-window fragments that are
      // below cur16's detection granularity BY CONTRACT — the window
      // defines the minimum span that counts on both the batch and
      // streaming sides.)
      if (srcOf(doc) == "src0" && quality(textOf(doc)) &&
          dedupLeg(doc)._1 == "admit" && brm == 0L &&
          nToks >= Dedup.SubstringWindow)
        assert(verdict == "drop_scrubbed",
          s"eval doc $doc leaked through the funnel as $verdict")
    }
    // Every verdict class a funnel exists for should occur on this
    // fixture — otherwise the composition is untested.
    val classes = got.values.map(_._1).toSet
    assert(classes.contains("admit") && classes.contains("drop_quality"),
      s"fixture too weak: only $classes")
    // Replay micro-batch 0: partition overwrite lands identical rows.
    GraftStreams.landFunnelBatch(
      first.toSeq.toDF("doc_id", "text"), sf, outDir, 0L)
    assert(landed() == got, "replay must be a no-op")
  }

  test("stream17: mid-stream codebook swap re-routes NEW appends, old batches keep v1") {
    import graft.operators.Similarity
    import graft.sources.CodebookStore
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream17_${System.nanoTime()}"
    val base = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream17_store_${System.nanoTime()}"
    // Two hand codebooks with an ANALYTIC cell flip: v1's centroids are
    // the ±x axis, v2's the ±y axis — a +y arrival lands in a
    // different cell under each, so a stale (or torn) codebook read is
    // observable, not coincidentally equal.
    def axis(d: Int, sign: Double) =
      Array.tabulate(4)(i => if (i == d) sign else 0.0)
    val cbV1 = Array(0L -> axis(0, 1.0), 1L -> axis(0, -1.0))
    val cbV2 = Array(0L -> axis(1, 1.0), 1L -> axis(1, -1.0))
    val v1 = CodebookStore.publish(spark, base, cbV1)
    // Arrivals near +x and −y: under v1 (x axis) they land cells 0/1;
    // under v2 (y axis) cells 1/1... each batch carries both.
    def arrivals(idBase: Long) = Seq(
      GraftStreams.EmbeddingArrival(idBase, Array(1.0f, 0.1f, 0f, 0f)),
      GraftStreams.EmbeddingArrival(idBase + 1, Array(0.1f, -1.0f, 0f, 0f)))
    val stream = MemoryStream[GraftStreams.EmbeddingArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landVersionedIvfBatch(b.toDF(), base, outDir, id)
      }
      .start()
    try {
      stream.addData(arrivals(100L))
      q.processAllAvailable()
      // THE SWAP: a re-train commits v2 while the stream runs.
      assert(CodebookStore.publish(spark, base, cbV2) == v1 + 1)
      stream.addData(arrivals(200L))
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.option("basePath", outDir).parquet(outDir)
      .select(col("vec_id"), col("cell").cast("long"), col("codebook_version"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = landed()
    // Batch 0 was assigned under v1, batch 1 under v2 — and the cells
    // match the shared batch rule under the RESPECTIVE codebook.
    def expect(idBase: Long, cb: Array[(Long, Array[Double])]) =
      Similarity.ivfAssignArrivalsWith(
          arrivals(idBase).toDS().toDF(), cb)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e1 = expect(100L, cbV1)
    val e2 = expect(200L, cbV2)
    assert(got == (e1.map { case (k, c) => k -> (c, 1L) } ++
      e2.map { case (k, c) => k -> (c, 2L) }))
    // The flip is real: the same vectors land different cells per
    // version (the analytic geometry above guarantees a difference).
    assert(e1(100L) != e2(200L) || e1(101L) != e2(201L),
      "fixture must make the swap observable")
    // Already-landed batches are untouched by the swap, and replaying
    // batch 0 TODAY re-lands it under the CURRENT version (v2) — the
    // recompaction semantics: a replay is a re-decision, the retained
    // v1 keeps the original decision auditable.
    GraftStreams.landVersionedIvfBatch(
      arrivals(100L).toDS().toDF(), base, outDir, 0L)
    val replayed = landed()
    assert(replayed(100L)._2 == 2L && replayed(200L)._2 == 2L)
    assert(replayed(100L)._1 == expect(100L, cbV2)(100L))
    // v1 stays readable for the audit (time travel).
    assert(CodebookStore.codebookAt(spark, base, 1L)
      .zip(cbV1).forall { case ((ci, cv), (di, dv)) =>
        ci == di && cv.sameElements(dv) })
    CodebookStore.reset(spark, base)
  }

  test("stream12: streamed image ingest gate equals bit-math replay, idempotent") {
    import graft.operators.{Multimodal, MultimodalStub}
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream12_${System.nanoTime()}"
    // Arrival ids are disjoint from the corpus (0 until 256); the
    // decoded hash is the id's low byte, so expected decisions are
    // pure bit math: hamming ≤ 1 to some corpus id → dup with the
    // SMALLEST matching corpus id as keeper.
    val arrivalIds = Seq(1000L, 1001L, 1255L, 1300L, 2047L)
    val arrivals = arrivalIds.map(id =>
      GraftStreams.ImageArrival(id, MultimodalStub.barcodePng(id)))
    val (first, second) = arrivals.splitAt(2)
    val stream = MemoryStream[GraftStreams.ImageArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landImageBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("img_id", "decision", "keeper_id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val expected = arrivalIds.map { id =>
      val h = id % 256
      val keepers = (0L until Multimodal.Mm05Images.toLong).filter(k =>
        java.lang.Long.bitCount(h ^ (k % 256)) <= Multimodal.Mm06MaxHamming)
      id -> (if (keepers.nonEmpty) ("dup", keepers.min) else ("admit", -1L))
    }.toMap
    assert(landed() == expected,
      "streamed image verdicts diverge from the bit-math replay")
    // With a full 0..255 corpus every low byte is within hamming 1 of
    // something; the gate must still be exercising real decisions (all
    // dup here, keepers distinct) — and replay must be a no-op.
    GraftStreams.landImageBatch(
      first.toDF(), sf, outDir, 0L)
    assert(landed() == expected, "replay must be a no-op")
  }

  test("stream21: streamed boilerplate scrub equals batch text20, replay") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream21_${System.nanoTime()}"
    // Arrivals: every doc batch text20 scrubs, plus clean ones that
    // must pass silently (no row landed).
    val batch = TextAnalysis.text20BoilerplateScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    assert(batch.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cleanIds = texts.keySet.diff(batch.keySet).toSeq.sorted.take(3)
    val arrivals = (batch.keySet.toSeq.sorted ++ cleanIds)
      .map(id => GraftStreams.IngestArrival(id, texts(id)))
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.IngestArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landBoilerplateBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first)
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("doc_id", "n_chunks", "n_boiler", "tokens_before",
        "tokens_after", "text_clean").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    assert(landed() == batch,
      "streamed scrub diverges from batch text20 (clean docs must land nothing)")
    // Replay micro-batch 0: the partition overwrite is a no-op.
    GraftStreams.landBoilerplateBatch(
      first.map(a => (a.doc_id, a.text)).toDF("doc_id", "text"), sf, outDir, 0L)
    assert(landed() == batch, "replay must be a no-op")
  }

  test("stream21 versioned index: mid-stream publish re-routes NEW batches; per-version leg equality") {
    import graft.operators.{Dedup, TextAnalysis}
    import graft.sources.CodebookStore
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream21v_${System.nanoTime()}"
    val store = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream21v_store_${System.nanoTime()}"
    // Two ANALYTIC template chunks (stream17's provable-flip
    // discipline): every arrival carries X at chunk 0 and Y at chunk
    // 1, so which chunk the scrub drops is a pure function of the
    // index version the batch resolved — a stale (or torn) index read
    // is observable, not coincidentally equal.
    def chunk(p: String) = (1 to 10).map(i => s"$p$i")
    val (tx, ty) = (chunk("x"), chunk("y"))
    def idxOf(toks: Seq[String]) = Dedup.spanHashRows(
      Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")).select("h")
    def arrivals(ids: Range) = ids.map(i => GraftStreams.IngestArrival(
      i.toLong, (tx ++ ty ++ Seq(s"tail$i")).mkString(" ")))
    val v1 = CodebookStore.publishFrame(spark, store, idxOf(tx))
    val (first, second) = (arrivals(1 to 3), arrivals(4 to 6))
    val stream = MemoryStream[GraftStreams.IngestArrival](spark)
    var published = false
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landBoilerplateVersionedBatch(b.toDF(), store, outDir, id)
      }
      .start()
    val v2 = try {
      stream.addData(first)
      q.processAllAvailable()
      // MID-STREAM publish: the store flip must re-route only batches
      // that resolve AFTER the _SUCCESS marker lands.
      val v = CodebookStore.publishFrame(spark, store, idxOf(ty))
      published = true
      stream.addData(second)
      q.processAllAvailable()
      v
    } finally q.stop()
    assert(published && v1 == 1L && v2 == 2L)
    def landed() = spark.read.parquet(outDir)
      .select("doc_id", "index_version", "n_boiler", "text_clean").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3))))
      .toMap
    val got = landed()
    // Per-version leg equality: each batch's rows ARE the batch scrub
    // core against that version's index — X dropped under v1, Y under
    // v2, the sub-chunk tail always kept.
    def leg(as: Seq[GraftStreams.IngestArrival],
        idx: org.apache.spark.sql.DataFrame, v: Long) =
      TextAnalysis.boilerplateScrub(
          as.map(a => (a.doc_id, a.text)).toDF("doc_id", "text"), idx)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((v, r.getAs[Int]("n_boiler"), r.getAs[String]("text_clean"))))
        .toMap
    assert(got == leg(first, idxOf(tx), v1) ++ leg(second, idxOf(ty), v2),
      s"per-version legs diverged: $got")
    first.foreach { a =>
      assert(got(a.doc_id)._3.startsWith("y1 "),
        "v1 batches must have dropped X (kept Y + tail)")
    }
    second.foreach { a =>
      assert(got(a.doc_id)._3.startsWith("x1 "),
        "post-publish batches must have dropped Y (kept X + tail)")
    }
    // Replay-as-re-decision (stream17's contract): replaying batch 0
    // NOW re-resolves the CURRENT version — its rows flip to v2's
    // verdicts, stamped with the version that actually decided them.
    GraftStreams.landBoilerplateVersionedBatch(
      first.map(a => (a.doc_id, a.text)).toDF("doc_id", "text"),
      store, outDir, 0L)
    assert(landed() == leg(first ++ second, idxOf(ty), v2),
      "replay must re-decide under the current committed version")
  }

  test("stream22: streamed audio windows equal batch mm11, re-batching-invariant, replay") {
    import graft.operators.Multimodal
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream22_${System.nanoTime()}"
    // Arrivals: the REAL staged WAV corpus (mm10's landing dir), so the
    // equality below covers encode → bytes-on-stream → windowed decode
    // → features against the oracled batch operator.
    val arrivals = Multimodal.mm10Files(spark, sf).collect()
      .map(r => GraftStreams.AudioArrival(r.getLong(0),
        r.getAs[Array[Byte]]("media")))
      .sortBy(_.clip_id)
    assert(arrivals.length == Multimodal.Mm10Clips)
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.AudioArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landAudioBatch(b.toDF(), outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("clip_id", "window_idx", "n_samples", "rms", "checksum",
        "zero_crossings").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    val got = landed()
    val batch = Multimodal.mm11AudioWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == batch,
      "streamed windowed decode diverges from the oracled batch mm11")
    // Replay micro-batch 0: partition overwrite lands identical rows.
    GraftStreams.landAudioBatch(
      first.toSeq.toDF("clip_id", "media"), outDir, 0L)
    assert(landed() == batch, "replay must be a no-op")
  }

  test("stream20: cross-modal gate composes stream09/stream12 legs exactly, replay") {
    import graft.operators.{Dedup, MultimodalStub}
    import spark.implicits._
    val outDir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream20_${System.nanoTime()}"
    val corpusArrivals = Tables.documents(spark, sf)
      .filter(col("doc_id") % Dedup.IngestMod === Dedup.IngestRem)
      .select("doc_id", "text").collect()
      .map(r => GraftStreams.PageArrival(r.getLong(0), r.getString(1),
        MultimodalStub.barcodePng(r.getLong(0))))
    assert(corpusArrivals.length >= 2)
    // One page whose text matches nothing, so the image leg alone
    // fires. With the full 0..255 staged image corpus every decoded
    // hash is within hamming ≤ 1 of some corpus image, so image-admit
    // (and with it the dup_text / admit arms) is unreachable by
    // construction here — the verdict algebra is pinned per-row
    // against the legs instead of per-arm.
    val unique = GraftStreams.PageArrival(99991L,
      "zzyzx qwrk vlmp unique gibberish page", MultimodalStub.barcodePng(99991L))
    val arrivals = unique +: corpusArrivals
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val stream = MemoryStream[GraftStreams.PageArrival](spark)
    val q = stream.toDF().writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          GraftStreams.landCrossmodalBatch(b.toDF(), sf, outDir, id)
      }
      .start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def landed() = spark.read.parquet(outDir)
      .select("doc_id", "text_decision", "text_keeper", "jaccard",
        "image_decision", "image_keeper", "verdict").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getDouble(3), r.getString(4), r.getLong(5), r.getString(6))))
      .toMap
    val got = landed()
    assert(got.keySet == arrivals.map(_.doc_id).toSet)
    // Leg equality: the composed gate IS the two cores run separately.
    val pages = arrivals.toSeq.toDS().toDF()
    val txt = Dedup.ingestDecisions(spark, sf,
        pages.select(col("doc_id"), col("text"))).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val img = GraftStreams.imageIngestDecisions(
        pages.select(col("doc_id").as("img_id"), col("media")), sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    got.foreach { case (id, (td, tk, j, idec, ik, v)) =>
      assert((td, tk, j) == txt(id), s"text leg diverges for $id")
      assert((idec, ik) == img(id), s"image leg diverges for $id")
      val expV =
        if (td != "admit" && idec == "dup") "dup_both"
        else if (td != "admit") "dup_text"
        else if (idec == "dup") "dup_image" else "admit"
      assert(v == expV, s"verdict algebra broken for $id: $v vs $expV")
    }
    // The unique page is image-evidence-only; both modalities fire on
    // at least one corpus arrival iff its text leg fires (the algebra
    // check above already pinned every realized arm).
    assert(got(99991L)._6 == "dup_image")
    // dup_text and admit are data-unreachable here (every decoded hash
    // is within hamming ≤ 1 of the full 0..255 corpus), so ALL four
    // arms are pinned on the extracted algebra over literal decisions.
    val arms = Seq(("exact", "dup"), ("near", "admit"),
      ("admit", "dup"), ("admit", "admit"))
      .toDF("td", "id")
      .select(GraftStreams.crossmodalGateVerdict(col("td"), col("id")))
      .collect().map(_.getString(0)).toSeq
    assert(arms == Seq("dup_both", "dup_text", "dup_image", "admit"))
    // Replay micro-batch 0: the partition overwrite is a no-op.
    GraftStreams.landCrossmodalBatch(first.toSeq.toDS().toDF(), sf, outDir, 0L)
    assert(landed() == got, "replay must be a no-op")
  }

  test("stream08: foreachBatch MERGE sink lands upserts, idempotent under replay") {
    import spark.implicits._
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val url = s"jdbc:derby:${System.getProperty("java.io.tmpdir")}" +
      s"/graft_derby/stream08_${System.nanoTime()};create=true"
    val master = "g_stream_master"
    def readMaster(): Map[Long, (Long, Double)] = spark.read.format("jdbc")
      .option("url", url).option("dbtable", master).option("driver", driver)
      .load().collect()
      .map(r => r.getLong(r.fieldIndex("user_id")) ->
        (r.getLong(r.fieldIndex("n")), r.getDouble(r.fieldIndex("total"))))
      .toMap
    val stream = MemoryStream[(Long, Double)](spark)
    val agg = stream.toDF().toDF("user_id", "value")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
    val q = agg.writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        GraftStreams.upsertBatchToJdbc(batch.toDF(), url, driver, master, "user_id")
      }
      .start()
    try {
      stream.addData(Seq((1L, 10.0), (2L, 5.0), (1L, 2.5)))
      q.processAllAvailable()
      assert(readMaster() == Map(1L -> (2L, 12.5), 2L -> (1L, 5.0)))
      // Replay: re-delivering a batch of CURRENT-state rows must be a
      // no-op (the idempotence contract of the merge-keyed sink).
      val replay = Seq((1L, 2L, 12.5), (2L, 1L, 5.0))
        .toDF("user_id", "n", "total")
      GraftStreams.upsertBatchToJdbc(replay, url, driver, master, "user_id")
      assert(readMaster() == Map(1L -> (2L, 12.5), 2L -> (1L, 5.0)))
      // Incremental: the next micro-batch updates touched keys and
      // inserts new ones; untouched keys keep their rows.
      stream.addData(Seq((2L, 1.0), (3L, 7.0)))
      q.processAllAvailable()
      assert(readMaster() ==
        Map(1L -> (2L, 12.5), 2L -> (2L, 6.0), 3L -> (1L, 7.0)))
      // SUPPRESSION GATE on the streaming seam (etl31's convention):
      // erase key 2 (engine-side DELETE + the `${master}_suppress`
      // ledger), then replay a batch carrying it — the erased key must
      // NOT resurrect, while the batch's other rows merge normally.
      Seq(2L).toDF("user_id").write.mode("overwrite")
        .format("jdbc").option("url", url).option("driver", driver)
        .option("dbtable", s"${master}_suppress").save()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"""DELETE FROM $master WHERE "user_id" IN
              (SELECT "user_id" FROM ${master}_suppress)""")
        finally st.close()
      } finally conn.close()
      val late = Seq((2L, 9L, 99.0), (4L, 1L, 4.0)).toDF("user_id", "n", "total")
      GraftStreams.upsertBatchToJdbc(late, url, driver, master, "user_id")
      assert(readMaster() ==
        Map(1L -> (2L, 12.5), 3L -> (1L, 7.0), 4L -> (1L, 4.0)),
        "an erased key resurrected through the streamed merge, or the " +
          "gate dropped a legitimate row")
      // NEAR-MISS NAMING arm (round-18 directive #4): the seam probes
      // exactly ONE shared name — a ledger landed under a drifted
      // spelling must NOT gate (the silent privacy hole the shared
      // suppressTableFor definition exists to make impossible on the
      // writer side; this pins the probe side). The independent
      // literal here also pins the convention string itself.
      assert(graft.sources.JdbcErasure.suppressTableFor(master) ==
        s"${master}_suppress")
      Seq(5L).toDF("user_id").write.mode("overwrite")
        .format("jdbc").option("url", url).option("driver", driver)
        .option("dbtable", s"${master}_suppress_typo").save()
      val nearMiss = Seq((5L, 1L, 5.5)).toDF("user_id", "n", "total")
      GraftStreams.upsertBatchToJdbc(nearMiss, url, driver, master, "user_id")
      assert(readMaster().get(5L).contains((1L, 5.5)),
        "a mis-named ledger must not gate — only the canonical " +
          "suppressTableFor name is load-bearing")
    } finally q.stop()
  }

  test("sessionize keeps numbering across micro-batches (stateful resume)") {
    import spark.implicits._
    // Two events 31 min apart split into separate micro-batches: the
    // second batch must continue from persisted state (session 2), not
    // restart at 1 — and the beyond-gap arrival proves session 1
    // closed, so its close row rides along (next-event evidence).
    val stream = MemoryStream[GraftStreams.SessionEvent](spark)
    val q = GraftStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("session_resume")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, sec: Long) =
      GraftStreams.SessionEvent(7L, id, new Timestamp(sec * 1000))
    try {
      stream.addData(ev(1L, 1000L))
      q.processAllAvailable()
      stream.addData(ev(2L, 1000L + 1860L))
      stream.addData(ev(3L, 1000L + 1870L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("session_resume").collect()
    val got = rows.filter(!_.getBoolean(3))
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
    val closes = rows.filter(_.getBoolean(3)).map(r => r.getLong(2)).toSeq
    assert(closes == Seq(1L),
      s"the beyond-gap event must emit session 1's close, got $closes")
  }

  test("stream13: streaming session_window emits exactly q37's closed sessions") {
    import spark.implicits._
    val batch = graft.operators.Relational.q37SessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val input = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect()
    val maxTs = input.map(_._2.getTime).max
    // The final watermark after all data: max event time - delay.
    val wm = maxTs - 2L * 3600 * 1000

    val stream = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = GraftStreams.sessionWindowAgg(
        stream.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("session_window_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(input.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("session_window_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // Soundness: everything emitted is a batch session, verbatim.
    val batchSet = batch.toSet
    assert(streamed.subsetOf(batchSet),
      s"streaming emitted a session batch never computed: ${streamed -- batchSet}")
    // Completeness on the closed prefix: every batch session the final
    // watermark provably closed must have been emitted.
    val closed = batchSet.filter(_._3.getTime < wm)
    assert(closed.subsetOf(streamed),
      s"closed sessions never emitted: ${(closed -- streamed).take(3)}")
    assert(streamed.nonEmpty && closed.nonEmpty,
      "fixture must actually close sessions under the watermark")
  }

  test("stream13: a session split across micro-batches merges in the state store") {
    import spark.implicits._
    // The incremental property the one-batch equivalence test cannot
    // see: events of ONE session arriving in SEPARATE micro-batches
    // must merge in the engine's session state store and emit as a
    // single row once the watermark closes the session.
    val stream = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = GraftStreams.sessionWindowAgg(
        stream.toDF().toDF("user_id", "ts", "value"),
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("session_merge_out")
      .outputMode(OutputMode.Append).start()
    def ev(user: Long, sec: Long, v: Double) =
      (user, new Timestamp(sec * 1000), v)
    try {
      stream.addData(ev(9L, 0L, 1.0))
      q.processAllAvailable()
      stream.addData(ev(9L, 1000L, 2.0)) // separate batch, within gap
      q.processAllAvailable()
      stream.addData(ev(8L, 50000L, 0.0)) // drives the watermark past the close
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("session_merge_out").collect()
      .filter(_.getLong(0) == 9L)
      .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((0L, (1000L + 1800) * 1000, 2L, 3.0)),
      s"cross-batch session must merge and emit ONCE, got ${rows.toSeq}")
  }

  test("stream13 under RocksDB state: batch equality holds on the deployment provider") {
    import spark.implicits._
    // The default HDFS-backed state store keeps open sessions on the
    // JVM heap — at 100x open-session cardinality it is the first
    // thing to fall over, so the deployment posture (SURVEY §5) is the
    // RocksDB provider (native memory + local SST files, ships with
    // Spark 4). This leg re-runs the full-corpus equivalence AND the
    // cross-micro-batch merge under that provider: the session-window
    // semantics must not depend on which state store holds the state.
    val providerCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val available =
      try { Class.forName(providerCls); true }
      catch { case _: ClassNotFoundException => false }
    assume(available,
      s"SKIPPING LOUDLY: $providerCls not on this Spark classpath — " +
        "the RocksDB deployment-posture leg cannot run here")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, providerCls)
      // Leg 1: full-corpus closed-prefix equality with batch q37.
      val batchSet = graft.operators.Relational.q37SessionWindow(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      val input = Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("value"))
        .as[(Long, Timestamp, Double)].collect()
      val wm = input.map(_._2.getTime).max - 2L * 3600 * 1000
      val stream = MemoryStream[(Long, Timestamp, Double)](spark)
      val q = GraftStreams.sessionWindowAgg(
          stream.toDF().toDF("user_id", "ts", "value"))
        .writeStream.format("memory").queryName("session_window_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        stream.addData(input.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("session_window_rocks").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed.subsetOf(batchSet),
        s"RocksDB leg emitted a non-batch session: ${streamed -- batchSet}")
      val closed = batchSet.filter(_._3.getTime < wm)
      assert(closed.subsetOf(streamed),
        s"RocksDB leg dropped closed sessions: ${(closed -- streamed).take(3)}")
      assert(closed.nonEmpty)
      // Leg 2: the cross-micro-batch merge really exercises RocksDB
      // state across batches (one session, two batches, one emission).
      val stream2 = MemoryStream[(Long, Timestamp, Double)](spark)
      val q2 = GraftStreams.sessionWindowAgg(
          stream2.toDF().toDF("user_id", "ts", "value"),
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName("session_merge_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        stream2.addData((9L, new Timestamp(0L), 1.0))
        q2.processAllAvailable()
        stream2.addData((9L, new Timestamp(1000L * 1000), 2.0))
        q2.processAllAvailable()
        stream2.addData((8L, new Timestamp(50000L * 1000), 0.0))
        q2.processAllAvailable()
      } finally q2.stop()
      val merged = spark.table("session_merge_rocks").collect()
        .filter(_.getLong(0) == 9L)
        .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getLong(3), r.getDouble(4)))
      assert(merged.toSeq == Seq((0L, (1000L + 1800) * 1000, 2L, 3.0)),
        s"cross-batch merge under RocksDB, got ${merged.toSeq}")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream14: streaming keyframes equal batch mm08 over the staged frames, re-batching-invariant") {
    import graft.operators.Multimodal
    import spark.implicits._
    val expected = Multimodal.mm08VideoKeyframes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // The REAL staged PNG corpus, as arrivals in frame order (ts =
    // epoch + frame_idx seconds — the extractor-feed contract).
    val frames = Multimodal.mm08FrameFiles(spark, sf).collect()
      .map { r =>
        val id = r.getLong(0)
        // ts strictly above the initial watermark (0): an event AT the
        // watermark is filtered from the stateful function's input.
        GraftStreams.FrameArrival(id / 1000L, id % 1000L,
          r.getAs[Array[Byte]]("media"),
          new Timestamp((3600L + id % 1000L) * 1000L))
      }
      .sortBy(f => (f.frame_idx, f.video_id))
    def run(batches: Seq[Seq[GraftStreams.FrameArrival]], name: String): Set[(Long, Long, Long)] = {
      val stream = MemoryStream[GraftStreams.FrameArrival](spark)
      val q = GraftStreams.streamingKeyframes(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // Three micro-batches split mid-video: every scene-cut comparison
    // at the split boundary must come out of the state store.
    val threeBatches = run(Seq(
      frames.filter(_.frame_idx < 10).toSeq,
      frames.filter(f => f.frame_idx >= 10 && f.frame_idx < 21).toSeq,
      frames.filter(_.frame_idx >= 21).toSeq), "keyframes_3b")
    assert(threeBatches == expected,
      s"streamed keyframes != batch mm08: extra=${(threeBatches -- expected).take(3)} " +
        s"missing=${(expected -- threeBatches).take(3)}")
    // Re-batching invariance: one batch lands the identical set.
    assert(run(Seq(frames.toSeq), "keyframes_1b") == expected)
  }

  test("stream14 under RocksDB state: keyframes still equal batch mm08") {
    // stream13's RocksDB pin covers the engine session store; this leg
    // covers the EXPLICIT flatMapGroupsWithState state family
    // (stream02/03/07/14 share the shape) on the same deployment
    // provider — per-video FrameState must round-trip RocksDB across
    // micro-batches without changing a verdict.
    import graft.operators.Multimodal
    import spark.implicits._
    val providerCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    assume(
      try { Class.forName(providerCls); true }
      catch { case _: ClassNotFoundException => false },
      s"SKIPPING LOUDLY: $providerCls not on this Spark classpath")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, providerCls)
      val expected = Multimodal.mm08VideoKeyframes(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val frames = Multimodal.mm08FrameFiles(spark, sf).collect()
        .map { r =>
          val id = r.getLong(0)
          GraftStreams.FrameArrival(id / 1000L, id % 1000L,
            r.getAs[Array[Byte]]("media"),
            new Timestamp((3600L + id % 1000L) * 1000L))
        }
        .sortBy(f => (f.frame_idx, f.video_id))
      val stream = MemoryStream[GraftStreams.FrameArrival](spark)
      val q = GraftStreams.streamingKeyframes(stream.toDS())
        .writeStream.format("memory").queryName("keyframes_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        Seq(frames.filter(_.frame_idx < 11).toSeq,
          frames.filter(f => f.frame_idx >= 11 && f.frame_idx < 23).toSeq,
          frames.filter(_.frame_idx >= 23).toSeq)
          .foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table("keyframes_rocks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"RocksDB keyframes diverge from batch mm08: " +
          s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream14 TTL: idle video evicts and restarts fresh; frontier drops late frames") {
    import graft.operators.MultimodalStub
    import spark.implicits._
    def arrival(v: Long, f: Long, hash: Long, sec: Long) =
      GraftStreams.FrameArrival(v, f, MultimodalStub.barcodePng(hash),
        new Timestamp(sec * 1000))
    val stream = MemoryStream[GraftStreams.FrameArrival](spark)
    val q = GraftStreams.streamingKeyframes(stream.toDS(),
        watermarkDelay = "0 seconds", retentionMs = 10000L)
      .writeStream.format("memory").queryName("keyframes_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // Video 5 frame 0: first frame emits -1, state armed to +10 s.
      // (ts strictly above the initial watermark 0, or it is filtered.)
      stream.addData(arrival(5L, 0L, 0xAAL, 10L))
      q.processAllAvailable()
      // An unrelated video drives the watermark far past the TTL:
      // video 5's state must evict.
      stream.addData(arrival(6L, 0L, 0x01L, 100L))
      q.processAllAvailable()
      // Video 5 frame 1 with the IDENTICAL fingerprint: with live
      // state it would be suppressed (hamming 0); after eviction it is
      // a fresh first frame -> the -1 row proves the eviction.
      stream.addData(arrival(5L, 1L, 0xAAL, 200L))
      q.processAllAvailable()
      // Behind-the-frontier frame (idx 0 again, different hash): must
      // be dropped, not compared.
      stream.addData(arrival(5L, 0L, 0x55L, 201L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("keyframes_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 0L, -1L), (6L, 0L, -1L), (5L, 1L, -1L)),
      s"TTL/frontier contract violated: $got")
  }

  test("q37/stream13 merge law: boundary-inclusive merge at exactly the 30-min gap") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new Timestamp(base + sec * 1000)
    // user 1: 29:59 gap -> ONE session; user 2: EXACTLY 30:00 -> the
    // engine still merges (boundary-INCLUSIVE — measured here, and the
    // reason the oracle's break rule is strictly ts > prev + gap, the
    // same convention as stream02's batch twin); user 3: 30:01 -> TWO.
    // This is the boundary the sf0.01 corpus never exercises, so only
    // this pin keeps the oracle honest at it.
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(1799), 1.0),
      (2L, ts(0), 1.0), (2L, ts(1800), 1.0),
      (3L, ts(0), 1.0), (3L, ts(1801), 1.0)).toDF("user_id", "ts", "value")
    val got = GraftStreams.sessionWindowAgg(events).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, base, base + (1799L + 1800) * 1000, 2L),
      (2L, base, base + (1800L + 1800) * 1000, 2L),
      (3L, base, base + 1800L * 1000, 1L),
      (3L, base + 1801L * 1000, base + (1801L + 1800) * 1000, 1L)),
      s"merge law violated: $got")
  }

  test("sessionize TTL: close fires on gap expiry, numbering survives the horizon, then evicts") {
    import spark.implicits._
    // Tight retention (10 s of event time past the close) so one spec
    // exercises the full two-stage lifecycle: open -> gap-expiry CLOSE
    // (watermark-driven, no next event needed) -> numbering tombstone
    // within the horizon -> eviction and session-1 restart past it.
    val stream = MemoryStream[GraftStreams.SessionEvent](spark)
    val q = GraftStreams.sessionize(stream.toDS(),
        watermarkDelay = "0 seconds", retentionMs = 10000L)
      .writeStream.format("memory").queryName("session_ttl")
      .outputMode(OutputMode.Append).start()
    def ev(user: Long, id: Long, sec: Long) =
      GraftStreams.SessionEvent(user, id, new Timestamp(sec * 1000))
    def rows() = spark.table("session_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    try {
      stream.addData(ev(9L, 1L, 1000L))
      q.processAllAvailable()
      // Another user's event drives the watermark past 1000+1800:
      // user 9's OPEN state times out -> the close is emitted without
      // any further user-9 event.
      stream.addData(ev(8L, 2L, 5000L))
      q.processAllAvailable()
      assert(rows().contains((9L, -1L, 1L, true)),
        s"gap expiry must emit the close, got ${rows().toSeq}")
      // Within the retention horizon (close tombstone alive): a
      // returning user 9 continues the numbering at session 2.
      stream.addData(ev(9L, 3L, 5100L))
      q.processAllAvailable()
      assert(rows().contains((9L, 3L, 2L, false)),
        s"numbering must continue within the horizon, got ${rows().toSeq}")
      // Drive the watermark past session 2's gap: its close fires and
      // leaves the numbering tombstone, whose retention TTL re-arms
      // floored at the CURRENT watermark (20000s) + 10s...
      stream.addData(ev(8L, 4L, 20000L))
      q.processAllAvailable()
      assert(rows().contains((9L, -1L, 2L, true)))
      // ...so one more watermark advance past 20010s evicts it...
      stream.addData(ev(8L, 6L, 25000L))
      q.processAllAvailable()
      // ...and a user idle past the horizon restarts at session 1 — the
      // bounded-state contract (stream03's fresh-keeper re-admission).
      stream.addData(ev(9L, 7L, 30000L))
      q.processAllAvailable()
      assert(rows().contains((9L, 7L, 1L, false)),
        s"evicted user must restart at session 1, got ${rows().toSeq}")
    } finally q.stop()
  }
}
