package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}

/** Structured Streaming surface (SURVEY.md §2 stream01/stream02).
  *
  * The reference's file-watch polling loop (reference:
  * case_2/Normal.py:283-327) re-expressed as incremental event-time
  * pipelines: `readStream` file sources feed the same transforms,
  * watermarks bound state, and sessionization is explicit keyed state in
  * `flatMapGroupsWithState` instead of a driver-side bookkeeping dict.
  *
  * Each pipeline is a pure DataFrame→DataFrame function, so it runs
  * identically over a `readStream` source in production and a
  * `MemoryStream` in the specs; the batch twins in
  * [[graft.operators.Sessions]] are the oracle-checked definitions of
  * the same semantics.
  */
object GraftStreams {

  /** Schema of the `events` stream (file sources must declare schemas —
    * inference would race the writer and cost an extra listing pass).
    */
  val EventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")

  /** File-watch source — the reference's polling loop
    * (reference: case_2/Normal.py:283-327) as a declarative stream:
    * Spark tracks processed files in the checkpoint (the reference
    * keeps a driver-side dict), `maxFilesPerTrigger` is the
    * batch-completion pacing, and late/duplicate files are handled by
    * the engine instead of hand-rolled bookkeeping.
    */
  def eventFileStream(
      spark: org.apache.spark.sql.SparkSession,
      watchDir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(watchDir)

  /** stream01 (incremental): tumbling 1-hour event-time window counts +
    * sums per event type. The watermark bounds window state at scale —
    * late data beyond 2 hours is dropped instead of growing state
    * forever (the reference's polling loop has no such bound: its
    * processed-file dict grows monotonically).
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** One event on the sessionization stream. `ts` is the event time
    * (drives the watermark that closes sessions and bounds state);
    * session math runs on floor-epoch seconds of it — `ts.getTime/1000`,
    * the same truncation as the batch twin's `unix_timestamp`.
    */
  case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

  /** Keyed session state: where the last-seen event left off, plus
    * whether that session is still open (an open session's gap-expiry
    * timeout emits the CLOSE; a closed session's state lingers only to
    * keep the per-user session numbering until the retention horizon
    * evicts it).
    */
  case class SessionState(lastTsSec: Long, lastSessionId: Long, open: Boolean)

  /** One sessionization verdict: per-event session ASSIGNMENT rows
    * (`closed = false`) and per-session CLOSE rows (`closed = true`,
    * `event_id = -1`) — the close fires when the 30-min gap provably
    * expired: either the watermark passed last-event-time + gap (the
    * event-time timeout) or a later event arrived beyond the gap
    * (next-event evidence), whichever happens first. Exactly one close
    * per session id is emitted within the retention horizon.
    */
  case class SessionOut(
      user_id: Long, event_id: Long, session_id: Long, closed: Boolean)

  val SessionGapSec = 1800L

  /** Watermark delay for the sessionize stream: how far out of
    * event-time order events may arrive before session closes become
    * definitive (a close never fires while an in-gap event could still
    * legally arrive).
    */
  val SessionWatermarkDelay = "2 hours"

  /** Per-user incremental session assignment + close detection. Events
    * within a micro-batch group arrive unordered — sort by event_id
    * (the batch twin's ordering key) before walking; state carries
    * (lastTs, lastSessionId, open) across batches so session ids keep
    * counting monotonically per user within the retention horizon.
    *
    * Timeout protocol (the stream03 sighting-refreshed shape, two
    * stages): every sighting re-arms the timeout to last event time +
    * gap. When it fires on an OPEN session, the gap has provably
    * expired — no in-watermark event can extend it — so the session's
    * CLOSE is emitted and the state flips to a closed NUMBERING
    * tombstone whose timeout re-arms to + `retentionMs`; when that
    * second timeout fires the entry is evicted. State is therefore
    * O(users active in the retention horizon) — 100 TB-bounded — and a
    * user idle past the horizon restarts at session 1 (the documented
    * horizon contract, same as stream03's fresh-keeper re-admission).
    */
  private[graft] def assignSessions(retentionMs: Long)(
      key: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      if (st.open) {
        // Gap expired under the watermark: the close is definitive.
        // Keep (lastTs, lastSessionId) as a closed tombstone so a
        // returning user within the horizon continues the numbering.
        state.update(SessionState(st.lastTsSec, st.lastSessionId, open = false))
        state.setTimeoutTimestamp(
          math.max(st.lastTsSec * 1000L, state.getCurrentWatermarkMs()) +
            retentionMs)
        Iterator.single(SessionOut(key, -1L, st.lastSessionId, closed = true))
      } else {
        // Retention horizon passed: forget the numbering tombstone.
        state.remove()
        Iterator.empty
      }
    } else {
      val sorted = events.toSeq.sortBy(_.event_id)
      var st = state.getOption.getOrElse(
        SessionState(Long.MinValue, 0L, open = false))
      val out = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val tsSec = e.ts.getTime / 1000L
        val isNew = st.lastTsSec == Long.MinValue ||
          tsSec - st.lastTsSec > SessionGapSec
        // Next-event evidence: a beyond-gap arrival proves the previous
        // session closed before the watermark could — emit its close
        // now so every session gets exactly one, whichever signal wins.
        if (isNew && st.open)
          out += SessionOut(key, -1L, st.lastSessionId, closed = true)
        val sid = if (isNew) st.lastSessionId + 1 else st.lastSessionId
        st = SessionState(tsSec, sid, open = true)
        out += SessionOut(key, e.event_id, sid, closed = false)
      }
      state.update(st)
      // Sighting-refreshed gap timeout, floored at the watermark (a
      // timeout must sit strictly in the watermark's future even for
      // events near the lateness edge — stream03's contract).
      val maxTsMs = sorted.iterator.map(_.ts.getTime).max
      state.setTimeoutTimestamp(
        math.max(maxTsMs, state.getCurrentWatermarkMs()) +
          SessionGapSec * 1000L)
      out.result().iterator
    }
  }

  /** stream02 (incremental): 30-min-gap sessionization via
    * flatMapGroupsWithState — keyed state per user, shuffled once on
    * user_id, no driver involvement, state BOUNDED by an event-time TTL
    * (the round-11 directive: the last NoTimeout site is gone). The
    * assignment rows (`closed = false`) match
    * [[graft.operators.Sessions.stream02Sessionize]] batch-for-batch
    * when events arrive in event order; the close rows are the
    * streaming-only signal a batch pass cannot give incrementally —
    * "this session is over" the moment event time proves it.
    */
  def sessionize(
      events: Dataset[SessionEvent],
      watermarkDelay: String = SessionWatermarkDelay,
      retentionMs: Long = DedupRetentionMs): Dataset[SessionOut] = {
    implicit val stateEnc: Encoder[SessionState] = ExpressionEncoder()
    implicit val outEnc: Encoder[SessionOut] = ExpressionEncoder()
    implicit val longEnc: Encoder[Long] = ExpressionEncoder()
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        assignSessions(retentionMs))
  }

  /** stream13 (incremental): native streaming SESSION-WINDOW
    * aggregation — [[graft.operators.Relational.q37SessionWindow]]'s
    * IDENTICAL query shape under `readStream`, which is the point of
    * q37's first-class formulation: the engine keeps open sessions in
    * its session state store, merges per-key windows while events
    * arrive within the gap (boundary-inclusive — the merge-law spec's
    * pin) as events arrive, and EMITS a session exactly once, when
    * the watermark proves no in-gap event can still extend it. State
    * is O(open sessions) — bounded by the watermark, evicted on
    * emission — vs stream02's explicit flatMapGroupsWithState
    * formulation which trades this built-in lifecycle for per-event
    * assignment output. Spec-equated to q37 on the closed prefix.
    */
  def sessionWindowAgg(
      events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    // LITERALLY q37's aggregation body (one shared definition — the
    // spec-pinned batch/stream equivalence holds by construction),
    // with the watermark applied to the raw events ahead of it.
    graft.operators.Relational.sessionWindowCore(
      events.withWatermark("ts", watermarkDelay))

  /** stream04 (incremental): stream-stream interval join — purchase →
    * click attribution within a 1-hour lookback. Both sides carry
    * watermarks, and the join condition bounds the click's event time
    * relative to the purchase's, so each side's buffered state is
    * dropped once the watermark passes the interval (bounded state — the
    * requirement for an unbounded stream-stream join). Inner join:
    * unattributed purchases are intentionally excluded (the left-outer
    * variant emits them when the watermark closes the interval).
    */
  def attribution(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_value"))
  }

  /** Left-outer variant of [[attribution]]: unattributed purchases ARE
    * emitted — but only once the watermark passes the end of their
    * lookback interval (the engine can't know "no click will come"
    * until event time has provably moved past the window). Same bounded
    * state; the outer rows carry a null click_id.
    */
  def attributionLeftOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "leftOuter")
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_value"))
  }

  /** One change-log record on the CDC stream (op ∈ I/U/D, seq strictly
    * orders ops per key).
    */
  case class CdcOp(key: Long, seq: Long, op: String, value: Double)

  /** Current state of one key after applying the log so far; emitted on
    * every change. `deleted` rows signal downstream to drop the key.
    */
  case class CdcState(key: Long, last_seq: Long, last_op: String,
      current_value: Double, deleted: Boolean)

  /** stream05 (incremental): CDC change-log apply — the streaming twin
    * of [[graft.operators.Etl.etl16CdcApply]]. Keyed state holds the
    * latest (seq, op, value) per key (O(keys), the minimum any
    * materialized view must hold); each micro-batch applies its ops in
    * seq order and emits the key's new current state. Late/duplicate
    * ops with seq ≤ the applied high-water mark are ignored
    * (exactly-once apply under at-least-once delivery). The final
    * emitted state per key equals the batch operator's final table
    * (spec-pinned).
    */
  def streamingCdcApply(ops: Dataset[CdcOp]): Dataset[CdcState] = {
    implicit val stateEnc: Encoder[CdcState] = ExpressionEncoder()
    implicit val longEnc: Encoder[Long] = ExpressionEncoder()
    ops
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[CdcOp], state: GroupState[CdcState]) =>
          val sorted = batch.toSeq.sortBy(_.seq)
          var st = state.getOption.getOrElse(
            CdcState(key, Long.MinValue, "", 0.0, deleted = true))
          var changed = false
          sorted.foreach { o =>
            if (o.seq > st.last_seq) {
              st = CdcState(key, o.seq, o.op, o.value, deleted = o.op == "D")
              changed = true
            }
          }
          if (changed) { state.update(st); Iterator.single(st) }
          else Iterator.empty
      }
  }

  /** stream06 (incremental): corrupt-record quarantine — the streaming
    * twin of [[graft.operators.Etl.etl20CorruptQuarantine]], i.e. the
    * reference's per-file error bookkeeping (case_2/Normal.py:283-327)
    * made incremental. Raw lines stream out of a landing directory
    * (file tracking in the checkpoint, like [[eventFileStream]]); each
    * micro-batch parses with the SHARED
    * [[graft.sources.Quarantine.parseLines]] contract (PERMISSIVE
    * `from_csv` — a bad record yields nulls + the raw line in `corrupt`
    * instead of killing the query), so batch and stream can never
    * diverge on parse semantics. Downstream, one filter splits valid
    * rows from the quarantine leg (which carries raw line + source file
    * lineage) — both are plain DataFrames, so the valid leg feeds any
    * streaming aggregate and the quarantine leg any append sink.
    * Equality with the batch twin's summary over the same landing dir
    * is spec-pinned.
    */
  def parseQuarantine(lines: DataFrame): DataFrame =
    graft.sources.Quarantine.parseLines(lines)

  /** Raw-line stream over a (possibly hive-partitioned) landing dir:
    * recursive lookup + `_metadata.file_path` lineage; the batch
    * partition is recovered from the path, so the same function serves
    * flat and partitioned layouts.
    */
  def landingLineStream(
      spark: org.apache.spark.sql.SparkSession,
      landingDir: String): DataFrame =
    spark.readStream
      .option("recursiveFileLookup", "true")
      .text(landingDir)
      .select(col("value").as("line"),
        col("_metadata.file_path").as("src_file"),
        regexp_extract(col("_metadata.file_path"), "batch=(\\d+)", 1)
          .cast("int").as("batch"))

  /** One document on the dedup stream (fingerprint precomputed upstream,
    * e.g. by [[graft.operators.TextAnalysis.text04Fingerprint]]'s
    * normalized-md5 column logic). `ts` is the arrival's event time —
    * it drives the watermark that bounds dedup state (see
    * [[streamingExactDedup]]'s retention contract).
    */
  case class DocArrival(doc_id: Long, fingerprint: String, ts: java.sql.Timestamp)

  /** Default dedup-state retention: a fingerprint/span unseen for this
    * much EVENT time is evicted. 30 days of event time is the window a
    * crawl-ingest dedup gate typically honors; at 100 TB the state store
    * then holds only the fingerprints the last 30 days of data carried,
    * not every fingerprint ever seen.
    */
  val DedupRetentionMs: Long = 30L * 24 * 3600 * 1000

  /** Default watermark delay for the dedup streams: how far out of
    * event-time order arrivals may be before they are dropped as late.
    */
  val DedupWatermarkDelay = "2 hours"

  /** Streaming dedup verdict: `keeper_id` is the FIRST doc seen with
    * this fingerprint (min doc_id within the first micro-batch that
    * carried it, which makes the choice deterministic under unordered
    * within-batch delivery); a row is a duplicate iff
    * doc_id != keeper_id.
    */
  case class DedupVerdict(doc_id: Long, fingerprint: String, keeper_id: Long)

  /** stream03 (incremental): exact dedup over an unbounded document
    * stream — the streaming twin of
    * [[graft.operators.Dedup.dedup01Exact]]. Keyed state per
    * fingerprint holds only the keeper id (O(distinct fingerprints)
    * state, the minimum any exact dedup must hold) — and that state is
    * BOUNDED by an event-time TTL: every sighting refreshes the key's
    * timeout to (max event time seen, floored at the watermark) +
    * `retentionMs`; once the watermark passes it the entry is evicted.
    *
    * Retention contract (the `dropDuplicatesWithinWatermark` shape):
    * dedup is EXACT within the retention horizon — any two arrivals of
    * one fingerprint within `retentionMs` of event time agree on the
    * keeper; a fingerprint unseen for longer is forgotten, so a later
    * re-arrival is admitted as its own fresh keeper. That bounds state
    * at O(fingerprints active in the horizon) instead of every
    * fingerprint ever seen — the difference between a state store that
    * plateaus and one that grows forever at 100 TB/month ingest.
    *
    * TRUE first-seen semantics within the horizon: once a keeper is
    * committed it is never lowered, so verdicts for one fingerprint are
    * mutually consistent across micro-batches (an append-mode sink can
    * never retract the earlier ones). When arrivals are doc_id-ordered
    * this coincides with batch dedup01's global-min keeper; under
    * out-of-order arrival it stays prefix-consistent instead of
    * silently diverging.
    */
  def streamingExactDedup(
      docs: Dataset[DocArrival],
      watermarkDelay: String = DedupWatermarkDelay,
      retentionMs: Long = DedupRetentionMs): Dataset[DedupVerdict] = {
    implicit val stateEnc: Encoder[Long] = ExpressionEncoder()
    implicit val outEnc: Encoder[DedupVerdict] = ExpressionEncoder()
    implicit val strEnc: Encoder[String] = ExpressionEncoder()
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fp: String, arrivals: Iterator[DocArrival], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // Watermark passed the key's last sighting + retention:
            // forget the keeper. A later re-arrival starts fresh.
            state.remove()
            Iterator.empty
          } else {
            val sorted = arrivals.toSeq.sortBy(_.doc_id)
            val keeper = state.getOption.getOrElse(sorted.head.doc_id)
            state.update(keeper)
            // Refresh the TTL on every sighting; the floor at the
            // current watermark keeps the timeout legal (it must be
            // strictly in the watermark's future) even for arrivals
            // near the lateness edge.
            val maxTs = sorted.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs()) + retentionMs)
            sorted.iterator.map(d => DedupVerdict(d.doc_id, fp, keeper))
          }
      }
  }

  /** A span occurrence entering the streaming span dedup: `span_hash`
    * is the 64-bit hash of one non-overlapping
    * [[graft.operators.Dedup.ParagraphTokens]]-token span, produced by
    * the SAME chunking contract as batch dedup08
    * ([[graft.operators.Dedup.spanHashRows]]).
    */
  case class SpanArrival(doc_id: Long, span_hash: Long, ts: java.sql.Timestamp)

  /** Streaming span verdict: `first_doc` is the first document seen
    * carrying this span; an occurrence is a duplicate iff it arrives in
    * a DIFFERENT document (within-doc repeats of a span are not
    * cross-doc duplication — the same contract as dedup08's
    * distinct-document span frequency).
    */
  case class SpanVerdict(
      doc_id: Long, span_hash: Long, first_doc: Long, is_duplicate: Boolean)

  /** stream07 (incremental): span-granularity dedup over an unbounded
    * document stream — the streaming twin of
    * [[graft.operators.Dedup.dedup08Paragraph]], i.e. the ingest-time
    * formulation: flag (or drop) boilerplate spans the corpus has
    * already absorbed, without waiting for a batch pass. Keyed state per
    * span hash holds only the first-seen doc id, BOUNDED by the same
    * event-time TTL as [[streamingExactDedup]]: every sighting
    * refreshes the span's timeout to last-seen event time +
    * `retentionMs`, and the watermark evicts idle entries — O(spans
    * active in the retention horizon) state, not every span ever seen;
    * at 100 TB the state store shards it across executors like any
    * streaming aggregate and the TTL keeps each shard's footprint flat.
    *
    * Retention contract: span dedup is exact within the horizon; a span
    * idle longer than `retentionMs` of event time is forgotten, so its
    * next occurrence is treated as a fresh first owner (boilerplate
    * that genuinely recurs keeps refreshing its own entry and is never
    * evicted).
    *
    * TRUE first-seen semantics within the horizon (stream03's
    * contract): the first committed owner of a span is never retracted,
    * so verdicts are prefix-consistent across micro-batches; under
    * doc_id-ordered arrival the flagged set coincides exactly with
    * "span seen in an earlier document" (spec-pinned against a batch
    * recompute).
    */
  def streamingSpanDedup(
      spans: Dataset[SpanArrival],
      watermarkDelay: String = DedupWatermarkDelay,
      retentionMs: Long = DedupRetentionMs): Dataset[SpanVerdict] = {
    implicit val stateEnc: Encoder[Long] = ExpressionEncoder()
    implicit val outEnc: Encoder[SpanVerdict] = ExpressionEncoder()
    spans
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.span_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (h: Long, arrivals: Iterator[SpanArrival], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = arrivals.toSeq.sortBy(_.doc_id)
            val first = state.getOption.getOrElse(sorted.head.doc_id)
            state.update(first)
            val maxTs = sorted.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs()) + retentionMs)
            sorted.iterator.map(s =>
              SpanVerdict(s.doc_id, h, first, s.doc_id != first))
          }
      }
  }

  /** stream08: streaming MERGE sink — the streaming→warehouse landing
    * pattern. An Update-mode aggregation re-emits a key's CURRENT row
    * whenever it changes; this sink makes each micro-batch land as an
    * UPSERT in the external JDBC database: the batch stages through a
    * parallel partitioned JDBC write, then ONE set-based MERGE keyed on
    * `keyCol` applies it (matched → update, new → insert) inside the
    * engine. Because the merge applies CURRENT-state rows keyed by
    * `keyCol`, re-delivering a batch (micro-batch retry, restart replay)
    * overwrites a key with the same values instead of duplicating it —
    * the idempotence contract a streaming sink needs and a plain
    * `append`-to-table JDBC sink cannot give; the spec pins both the
    * batch-equivalence and the replay no-op.
    *
    * Division of labor matches etl25: Spark moves data in parallel, the
    * database executes one set-based statement per micro-batch —
    * never a row-at-a-time driver loop.
    */
  /** A catalog record entering the streaming fuzzy-linkage gate
    * (stream16): raw (arrival_id, p_name) — block key, length band and
    * edit distances are computed inside the decision, as they would be
    * for genuinely new data.
    */
  case class PartArrival(arrival_id: Long, p_name: String)

  /** stream16: streaming fuzzy-linkage gate — etl28's check on the
    * ingest cadence, which is how MDM linkage actually deploys: the
    * master vocabulary is nearly static (refreshed when the batch
    * linkage pipeline re-runs), the feed of new listings never stops.
    * Each micro-batch of arriving records is decided exact/near/admit
    * against the PINNED vocabulary through
    * [[graft.operators.Etl.etl28IngestCandidates]] (the shared
    * decision core — the gate can never drift from the batch
    * operator's rule), and each arrival's candidate queue lands under
    * its own `batch_id=N` partition.
    *
    * stream09's contracts verbatim: per-arrival-independent decisions
    * ⇒ re-batching-invariant (spec-pinned); per-partition overwrite ⇒
    * idempotent replay; ZERO streaming state — the vocabulary IS the
    * state.
    */
  def landFuzzyLinkBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Etl.etl28IngestCandidates(batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** A document entering the streaming ingest-dedup gate (stream09):
    * raw (doc_id, text) — fingerprint, shingles and MinHash signature
    * are computed inside the decision, as they would be for genuinely
    * new data.
    */
  case class IngestArrival(doc_id: Long, text: String)

  /** One arriving embedding on the stream11 index-maintenance stream. */
  case class EmbeddingArrival(vec_id: Long, embedding: Array[Float])

  /** stream09: streaming ingest dedup — the streaming form of
    * [[graft.operators.Dedup.dedup11IncrementalIngest]]: each
    * micro-batch of arriving documents is decided (exact / near /
    * admit + keeper) against the STATIC corpus index at `dir` via the
    * shared decision core. Because every decision depends only on the
    * arrival's own text and the corpus index, the verdict set is
    * invariant under re-batching — any micro-batch partitioning of the
    * arrival stream lands exactly the batch operator's output
    * (spec-pinned).
    *
    * Exactly-once landing without a transactional sink: each batch
    * overwrites its own `batch_id=N` partition, so a replayed
    * micro-batch (restart recovery) rewrites identical rows instead of
    * appending duplicates — the idempotence contract, per-partition
    * overwrite instead of stream08's in-database MERGE. Streaming
    * state is ZERO: the corpus index is the state, shared by all
    * executors and refreshed by the batch dedup pipeline, which is how
    * an ingest gate actually deploys (the index updates on the batch
    * cadence, arrivals gate on the streaming cadence).
    */
  def landIngestBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Dedup.ingestDecisions(batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** stream15: streaming ingest-time DECONTAMINATION gate — cur16's
    * ExactSubstr check on the ingest cadence: each micro-batch of
    * arriving documents is probed against the PRE-BUILT held-out
    * window-hash index (pinned once per session/dir, refreshed when
    * the benchmark set changes — which is how decontamination actually
    * deploys: the eval set is nearly static, the crawl never stops),
    * and each arrival's maximal contaminated spans land under its own
    * `batch_id=N` partition. stream09's contracts verbatim: decisions
    * are per-arrival independent ⇒ re-batching-invariant and equal to
    * batch cur16 on the same docs (spec-pinned); per-partition
    * overwrite ⇒ idempotent replay; ZERO streaming state — the
    * held-out index IS the state.
    */
  def landDecontamBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Dedup.ingestContaminationSpans(batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** stream18: streaming CORPUS-BUILD funnel gate — cur18's composed
    * funnel on the ingest cadence, which is how a training-data build
    * actually admits a crawl: every arriving document gets ONE verdict
    * through the composed stages (quality gate → exact/near dedup vs
    * the corpus index → BOILERPLATE scrub vs the corpus template index
    * → decontamination scrub vs the held-out index, run over the
    * arrival's POST-BOILER text — cur18's round-15 stage order, so
    * junction spans flag at the gate exactly as in the batch build —
    * [[graft.operators.Curation.ingestFunnelVerdicts]], which composes
    * the SAME pinned-index decision cores stream09, stream21 and
    * stream15 run separately, so the gate can never drift from any of
    * them), and each batch's verdicts land under `batch_id=N`.
    * stream09's contracts verbatim: per-arrival-independent ⇒
    * re-batching-invariant; per-partition overwrite ⇒ idempotent
    * replay; ZERO streaming state — the four indexes are the state.
    */
  def landFunnelBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Curation.ingestFunnelVerdicts(
        batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** stream25's arrival shape: a takedown/recall request, one doc id
    * per row (the external feed — opt-outs, copyright claims, PII
    * findings — every training-data pipeline receives continuously).
    */
  case class RecallArrival(doc_id: Long)

  /** stream25: streaming TAKEDOWN MASK — cur25's tombstone-mask emit
    * on the recall-feed cadence, which is how takedowns actually
    * deploy: the packed corpus is nearly static between repacks, the
    * recall feed never stops, and a request must take effect at the
    * next loader read — NOT at the next full repack. Each micro-batch
    * of arriving doc_ids joins (broadcast, recall-list-sized) against
    * the PINNED train manifest and its mask rows land under
    * `batch_id=N` ([[graft.operators.Curation.takedownMaskArrivals]] —
    * the ONE span-clipping rule shared with batch cur25, so the gate
    * cannot clip differently than the batch emit; a recalled id
    * outside the manifest masks nothing, which is the correct verdict).
    * stream09's contracts verbatim: per-arrival independent ⇒
    * re-batching-invariant and equal to batch cur25 on the same ids
    * (spec-pinned); per-partition overwrite ⇒ idempotent replay; ZERO
    * streaming state — the manifest is the state, refreshed on the
    * repack cadence.
    */
  def landTakedownMaskBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Curation.takedownMaskArrivals(
        batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** stream27's arrival shape: a span-level finding — a PII span, one
    * infringing quotation — naming PART of a document by its
    * post-scrub token range [span_lo, span_hi). Findings feeds are
    * messy by nature: ids outside the train manifest and degenerate or
    * out-of-range spans all arrive, and all must mask nothing rather
    * than error.
    */
  case class SpanFindingArrival(doc_id: Long, span_lo: Long, span_hi: Long)

  /** stream27: streaming SPAN REDACTION — cur28's sub-document mask
    * emit on the findings-feed cadence, completing the takedown ×
    * streaming matrix (stream25 feeds WHOLE-DOC recalls through the
    * shared clipping core; span-level findings arrive on exactly the
    * same external cadence and must take effect at the next loader
    * read, not the next repack). Each micro-batch of arriving findings
    * joins (broadcast, feed-sized) against the PINNED train manifest
    * and its mask rows land under `batch_id=N`
    * ([[graft.operators.Curation.spanRedactionArrivals]] — the ONE
    * span→range derivation and the ONE clipping core shared with batch
    * cur28, so the gate cannot place or clip a span differently than
    * the batch emit; cur27 proves the loader algebra holds for
    * arbitrary spans, so these rows compose with stream25's whole-doc
    * masks in the same loader pass). stream09's contracts verbatim:
    * per-arrival independent ⇒ re-batching-invariant and equal to
    * batch cur28 on the same findings (spec-pinned); per-partition
    * overwrite ⇒ idempotent replay; ZERO streaming state — the
    * manifest is the state, refreshed on the repack cadence.
    */
  def landSpanRedactionBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Curation.spanRedactionArrivals(
        batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** stream26's arrival shape: an erasure request, one master-table
    * key per row (GDPR/right-to-be-forgotten against the versioned
    * merge sink).
    */
  case class ErasureArrival(key: Long)

  /** stream26: streaming ERASURE FEED — etl29's snapshot scrub on the
    * request cadence, which is how erasure actually deploys: requests
    * arrive continuously under a compliance deadline, and each must
    * take effect across ALL retained history at the next scrub cycle,
    * not at some quarterly rewrite. Each micro-batch of arriving keys
    * scrubs EVERY retained committed snapshot in place through the one
    * erasure seam ([[graft.sources.MergeSink.scrubVersions]] — the
    * feed cannot scrub differently than batch etl29). A different
    * CONTRACT FAMILY than the stateless gates: this stream MUTATES
    * durable history, so its invariants are SET ALGEBRA, not
    * per-arrival independence — scrub(K1) then scrub(K2) equals
    * scrub(K1 ∪ K2) (set removal composes), so the outcome is
    * re-batching-invariant and equal to the one-shot batch scrub on
    * the same keys (spec-pinned across a mid-stream split); removing
    * an already-absent key is a no-op, so a replayed micro-batch after
    * restart recovery is idempotent (spec-pinned); ZERO streaming
    * state — the snapshot store IS the state, which is the point.
    * Cost per micro-batch is etl29's: one streamed state copy per
    * retained version — a deployment batches the feed on the scrub
    * cadence (hourly/daily), exactly what micro-batching models.
    */
  def landErasureBatch(
      batch: DataFrame, table: String, basePath: String): Unit = {
    // An EMPTY micro-batch must not pay a full history rewrite —
    // erasure feeds idle most of the time, and set-removal of ∅ is
    // the identity. One limit-1 probe of the arrival batch gates a
    // per-version streamed state copy (spec-pinned: the snapshot
    // FILES are untouched, not just their content).
    if (!batch.isEmpty) {
      graft.sources.MergeSink.scrubVersions(
        batch.sparkSession, table, basePath, batch.select("key"))
      ()
    }
  }

  /** stream24: streaming GRAPH-ANN INSERT — sim21's insert rule on the
    * ingest cadence, closing the ANN maintenance matrix (stream11 lands
    * arrivals in IVF cells; this lands them in the navigable graph):
    * each micro-batch of arriving embeddings ([[EmbeddingArrival]] —
    * stream11's shape) runs ONE beam search over the PINNED deployed
    * graph ([[graft.operators.Similarity.graphInsertArrivalEdges]] —
    * sim21's shared decision core) and its forward edges land under
    * `batch_id=N`; the back-edge transpose is derived at read time
    * (it is a projection, not state). stream09's contracts verbatim:
    * every arrival links against the PRE-BATCH graph and never against
    * its batch-mates (sim21's batch-insert semantics), so verdicts are
    * per-arrival independent ⇒ re-batching-invariant and equal to
    * batch sim21 on the same arrivals (spec-pinned); per-partition
    * overwrite ⇒ idempotent replay; ZERO streaming state — the graph
    * index IS the state, rebuilt on sim07's batch cadence with the
    * streamed edges carrying reachability in between (sim18's
    * retrain-vs-append division of labor, on the graph axis).
    */
  def landGraphInsertBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Similarity.graphInsertArrivalEdges(
        batch.sparkSession, dir, batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** stream28: GRAPH-ANN TOMBSTONE FEED — the delete set as a FED,
    * versioned artifact instead of sim23's salted in-query rule,
    * closing the last cell of the ANN × streaming matrix (stream24
    * inserts, stream11 appends, stream17 swaps the codebook; deletes
    * arrive on exactly stream25/stream26's external recall cadence).
    * The tombstone set is PUBLISHED through
    * [[graft.sources.CodebookStore.publishFrame]] (stream17/stream21's
    * artifact pattern — claim/_SUCCESS, atomic flip, retained prior
    * versions), and each search micro-batch resolves the latest
    * COMMITTED version at batch time: arriving queries run sim23's
    * route-through search — the tombstone set cannot change where the
    * beam goes, only what is returned, so the search navigates sim19's
    * pinned pool UNCHANGED and the fed set drops candidates only at
    * the final cut — and land their top-k under `batch_id=N`, stamped
    * with the tombstone version that decided them.
    *
    * Contracts, stream17's verbatim: a mid-stream publish re-routes
    * only NEW batches (the `_SUCCESS` marker is the flip; a batch can
    * never read a half-written set, and already-landed batches stay
    * reproducible from their stamped retained version); `batch_id=N`
    * overwrite makes replay idempotent, and a replay RE-DECIDES under
    * the current version (the version column says which law produced
    * every row); per-row decisions ⇒ re-batching-invariant given the
    * same resolved version; ZERO streaming state — the store is the
    * state. Per version the results equal batch sim23 with that
    * version's set (spec-pinned: v1 = the salted rule's set makes the
    * equality exact against sim23GraphDelete itself).
    *
    * Scale: the fed set is recall-sized (an erasure/opt-out ledger) —
    * broadcast anti-join at the cut; the pool stays the one pinned
    * session artifact; the store artifact is O(deletes), kilobytes.
    */
  def landTombstonedSearchBatch(batch: DataFrame, dir: String,
      storePath: String, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = graft.sources.CodebookStore.latest(spark, storePath).getOrElse(
      throw new IllegalStateException(
        s"no committed tombstone set under $storePath — publish one " +
          "(empty is valid: no deletes yet) before streaming searches"))
    tombstonedSearchResults(spark, dir, batch, storePath, v)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** Decision core, separable so the spec replays it per version: the
    * arriving q_ids' slice of sim19's pinned visited pool, the fed
    * version's tombstones dropped at the final cut ONLY (sim23's
    * route-through), the bounded top-k window, the version stamp.
    */
  private[graft] def tombstonedSearchResults(spark: SparkSession,
      dir: String, batch: DataFrame, storePath: String,
      version: Long): DataFrame = {
    import graft.operators.Similarity
    val ts = graft.sources.CodebookStore.frameAt(spark, storePath, version)
      .select(col("vec_id").cast("long").as("vec_id"))
    val pool = Similarity.sim19VisitedPool(spark, dir)
      .join(broadcast(batch.select(col("q_id").cast("long").as("q_id"))),
        Seq("q_id"), "left_semi")
      .join(broadcast(ts), Seq("vec_id"), "left_anti")
    Similarity.sim19TopPer(pool, Similarity.TopK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
      .withColumn("tombstone_version", lit(version))
  }

  /** stream29's arrival shape: a loader READ REQUEST naming a
    * post-mask (source, seq) slice of the packed corpus — the serving
    * cadence's unit of work (a trainer fetching its next sequences).
    */
  case class ReadRequestArrival(source: String, seq: Long)

  /** stream29: streaming COMPOSED-MASK READ — cur29's composed loader
    * read on the SERVING cadence, the read-side cell of the takedown ×
    * streaming matrix (round-19 directive #2): stream25/stream27 feed
    * both mask families continuously and cur29 proves the composed
    * read from the bytes, but the loader that SERVES training
    * sequences runs per request batch, and each batch must read under
    * the masks committed AT THAT MOMENT — not at the last repack.
    * Each micro-batch resolves BOTH mask ledgers' latest COMMITTED
    * versions at batch time (stream28's resolve-at-batch-time pattern
    * — the `_SUCCESS` marker is the flip, a batch can never read a
    * half-written ledger), runs the ONE masked-read pass
    * ([[graft.operators.Curation.maskedRetiledRead]] — cur29's core
    * verbatim, so the gate cannot compose, clip, or re-tile
    * differently than the batch read), serves the arriving
    * (source, seq) requests from the re-tiled stream, and lands them
    * under `batch_id=N` stamped with the deciding version PAIR.
    *
    * Contracts, stream28's verbatim: a mid-stream publish re-routes
    * only NEW batches (landed batches stay reproducible from their
    * stamped retained versions); `batch_id=N` overwrite makes replay
    * idempotent, and a replay RE-DECIDES under the current pair (the
    * version columns say which composed law produced every row); ZERO
    * streaming state — the two ledgers are the state. Per version
    * pair the served rows equal batch cur29 with those versions'
    * masks (spec-pinned: the fed v1 pair IS cur25+cur28's rows, so
    * the equality is exact against cur29ComposedMasks itself). A
    * request for a sequence the masks re-tiled away serves nothing —
    * the correct verdict, not an error. A read before EITHER ledger
    * has a committed version fails LOUDLY (resolving a missing ledger
    * to "no masks" would serve recalled content).
    *
    * Scale: ledger artifacts are recall+findings-sized (broadcast
    * into the one masked-read pass); requests are batch-sized and
    * broadcast at the final semi-join; the read pass itself is
    * cur29's already-priced shape, amortized across the batch's
    * requests (a deployment caches the re-tiled read per version
    * pair — the stamp is exactly the cache key this operator derives).
    */
  def landComposedMaskReadBatch(batch: DataFrame, dir: String,
      tdStore: String, spStore: String, outDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    def resolve(p: String, fam: String): Long =
      graft.sources.CodebookStore.latest(spark, p).getOrElse(
        throw new IllegalStateException(
          s"no committed $fam mask ledger under $p — publish one " +
            "(empty is valid: no masks yet) before streaming reads"))
    val vTd = resolve(tdStore, "takedown")
    val vSp = resolve(spStore, "span")
    composedMaskReadResults(spark, dir, batch, tdStore, vTd, spStore, vSp)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** Decision core, separable so the spec replays it per version pair:
    * both resolved ledger frames union into ONE skip list, the one
    * masked-read pass over the ORIGINAL emitted shards drops every
    * covered offset and re-tiles the survivor stream, the arriving
    * requests take their slices, the version pair stamps every row.
    */
  private[graft] def composedMaskReadResults(spark: SparkSession,
      dir: String, batch: DataFrame, tdStore: String, vTd: Long,
      spStore: String, vSp: Long): DataFrame = {
    import graft.sources.CodebookStore
    val maskCols = Seq("source", "seq", "mask_start", "mask_end")
    val masks = CodebookStore.frameAt(spark, tdStore, vTd)
      .selectExpr(maskCols: _*)
      .unionByName(CodebookStore.frameAt(spark, spStore, vSp)
        .selectExpr(maskCols: _*))
    graft.operators.Curation.maskedRetiledRead(spark, dir, masks, "stream29")
      .join(broadcast(batch.select(col("source"),
          col("seq").cast("long").as("seq"))),
        Seq("source", "seq"), "left_semi")
      .withColumn("takedown_version", lit(vTd))
      .withColumn("span_version", lit(vSp))
  }

  /** One document arriving on the stream19 packing stream: its size in
    * the packing unit (chars for cur09's batch twin; POST-SCRUB tokens
    * when composed behind stream18's funnel gate) plus event time for
    * the state TTL.
    */
  case class PackArrival(
      source: String, doc_id: Long, n_units: Long, ts: java.sql.Timestamp)

  /** Streaming packing verdict — the per-document row of
    * [[graft.operators.Curation.sequencePackPositions]]: the first and
    * last sequence index the doc occupies in its source's concatenated
    * stream, and whether a sequence boundary cuts it.
    */
  case class PackOut(source: String, doc_id: Long,
      seq_first: Long, seq_last: Long, split_doc: Boolean)

  /** The FULL per-doc packing row — cur20's manifest columns computed
    * from the running cursor (stream23's emit shape; stream19 projects
    * the span verdict from the same fold).
    */
  case class ManifestOut(source: String, doc_id: Long, n_units: Long,
      seq_first: Long, seq_last: Long, off_first: Long, shard: Long)

  /** ONE definition of the streaming cursor fold shared by
    * stream19/stream23: the group's arrivals re-sorted by the packing
    * key, each doc's manifest row computed from the carried cursor,
    * the cursor advanced and the TTL refreshed.
    */
  private def packGroupFn(unit: Long, seqsPerShard: Long, retentionMs: Long)(
      src: String, arrivals: Iterator[PackArrival],
      state: GroupState[Long]): Iterator[ManifestOut] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // ONE digest per group call (round-15 review): MessageDigest.digest
      // resets the instance, so re-using it across the group's arrivals
      // is safe — per-doc getInstance was the only per-row object churn
      // in the streaming path.
      val md = java.security.MessageDigest.getInstance("MD5")
      def hk(id: Long): String =
        md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
      val sorted = arrivals.toSeq.sortBy(a => (hk(a.doc_id), a.doc_id))
      var cum = state.getOption.getOrElse(0L)
      val out = sorted.map { a =>
        val first = cum / unit
        val off = cum % unit
        cum += a.n_units
        val last = (cum - 1) / unit
        ManifestOut(src, a.doc_id, a.n_units, first, last, off,
          first / seqsPerShard)
      }
      state.update(cum)
      val maxTs = sorted.iterator.map(_.ts.getTime).max
      state.setTimeoutTimestamp(
        math.max(maxTs, state.getCurrentWatermarkMs()) + retentionMs)
      out.iterator
    }

  /** stream19: streaming SEQUENCE PACKING — cur09's concat-and-chunk on
    * the ingest cadence: as documents arrive, each is assigned its
    * sequence span from the source's RUNNING CURSOR (where the
    * concatenated stream currently ends), so training shards fill
    * incrementally instead of waiting for a batch re-pack. The genuine
    * cross-batch state is ONE Long per source (the cursor) — O(sources)
    * at any corpus size, stream14's posture — held under stream03's
    * sighting-refreshed event-time TTL (a source idle past the horizon
    * starts a fresh shard stream at cursor 0, the documented horizon
    * contract).
    *
    * Ordering contract (stream14's shape): a source's documents feed in
    * the packing order (cur09's engine-portable md5 key — the order the
    * build's shard writer emits); within a micro-batch the group
    * re-sorts by that key, because the groupBy shuffle does not
    * preserve arrival order. Under that contract the emitted spans
    * equal batch [[graft.operators.Curation.sequencePackPositions]]
    * row-for-row, across any micro-batch split (the cursor carries the
    * boundary math over batch lines) — spec-pinned.
    */
  def streamingSequencePack(
      docs: Dataset[PackArrival],
      unit: Long,
      watermarkDelay: String = DedupWatermarkDelay,
      retentionMs: Long = DedupRetentionMs): Dataset[PackOut] = {
    implicit val outEnc: Encoder[PackOut] = ExpressionEncoder()
    streamingManifestPack(docs, unit, watermarkDelay = watermarkDelay,
        retentionMs = retentionMs)
      .map(m => PackOut(m.source, m.doc_id, m.seq_first, m.seq_last,
        m.seq_last > m.seq_first))
  }

  /** stream23: streaming MANIFEST EMIT — cur20's deliverable on the
    * ingest cadence. The same cursor fold as stream19 emits the FULL
    * manifest row (tokens, span, start offset, shard), which the spec
    * pipes through Spark's TRANSACTIONAL parquet file sink
    * (`writeStream.format("parquet").partitionBy("source", "shard")`):
    * the sink's `_spark_metadata` commit log is what makes the emitted
    * shard files exactly-once under micro-batch replay — readers see
    * only committed files, so a restarted batch can never double-land
    * rows (the file-sink complement of the `batch_id=N` overwrite
    * contract the foreachBatch gates use). Shards fill incrementally
    * as sources stream; row-for-row equality with the batch manifest
    * spans is spec-pinned across a mid-stream batch split.
    */
  def streamingManifestPack(
      docs: Dataset[PackArrival],
      unit: Long,
      seqsPerShard: Long = graft.operators.Curation.Cur20SeqsPerShard,
      watermarkDelay: String = DedupWatermarkDelay,
      retentionMs: Long = DedupRetentionMs): Dataset[ManifestOut] = {
    implicit val stateEnc: Encoder[Long] = ExpressionEncoder()
    implicit val outEnc: Encoder[ManifestOut] = ExpressionEncoder()
    implicit val strEnc: Encoder[String] = ExpressionEncoder()
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        packGroupFn(unit, seqsPerShard, retentionMs))
  }

  /** stream10: streaming count-min-sketch maintenance — the mergeable-
    * sketch shape a 100 TB streaming ingest actually runs. Each
    * micro-batch of arriving documents contributes a PARTIAL sketch
    * ([[graft.operators.TextAnalysis.cmsPartial]] — ≤ Depth×Width
    * cells whatever the batch size), landed under its own
    * `batch_id=N` partition (stream09's idempotent-replay contract: a
    * restarted batch overwrites identical cells instead of
    * double-counting). The LIVE sketch at any moment is the cell-wise
    * SUM of all landed partials — addition commutes and associates, so
    * the merged sketch is invariant under re-batching and equals the
    * batch build over the same documents (spec-pinned against text15's
    * sketch, value for value). Streaming state is ZERO: the landed
    * partials are the state, and the merge is one ≤ batches×Depth×Width
    * row aggregation however much text has streamed through.
    */
  def landCmsBatch(batch: DataFrame, outDir: String, batchId: Long): Unit =
    graft.operators.TextAnalysis.cmsPartial(batch)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** The live merged sketch over every partial landed so far. */
  def mergedCms(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy("row_i", "bkt")
      .agg(sum("cnt").as("cnt"))

  /** stream11: streaming IVF index maintenance — the steady-state half
    * of the ANN story. sim03/sim06 BUILD the index in batch (train the
    * codebook, lay the corpus out by cell); this pipeline MAINTAINS it:
    * each micro-batch of arriving embeddings is assigned to the trained
    * codebook's cells via the one shared assignment rule
    * ([[graft.operators.Similarity.ivfAssignArrivals]] — the same
    * literal-argmax scan stage, so appends can never drift from the
    * layout) and landed `partitionBy(cell)` under its own
    * `batch_id=N` directory. The live index is then the batch layout
    * plus every landed append, and a query's probe-cell filter prunes
    * BOTH at the file level (bucket pruning on the batch side,
    * partition pruning on `cell=` directories on the streamed side).
    *
    * stream09's contracts carry over verbatim: idempotent replay (a
    * restarted batch overwrites its own partition with identical rows),
    * re-batching invariance (assignment is per-row), and ZERO streaming
    * state — the codebook is the state, refreshed on the batch
    * re-training cadence, which is how a production ANN index actually
    * operates (appends between rebuilds, periodic re-train + compact).
    */
  def landIvfBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.Similarity
      .ivfAssignArrivals(batch.sparkSession, dir, batch)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/batch_id=$batchId")

  /** stream17: VERSIONED-codebook IVF landing — stream11's index
    * maintenance made re-train-aware: instead of the session-pinned
    * trained codebook, each micro-batch resolves the codebook from the
    * [[graft.sources.CodebookStore]]'s latest COMMITTED version at
    * batch time and stamps its landed rows with that version. This is
    * how sim18's swap reaches the ingest path: appends landed before
    * the re-train carry v1's cells, appends after it carry v2's — the
    * swap re-routes NEW arrivals atomically (the store's `_SUCCESS`
    * marker is the flip; a batch can never read a half-written
    * codebook) without touching already-landed batches, whose v1 cell
    * assignments remain reproducible from the retained version
    * (etl23's time-travel contract). A compaction pass re-assigning
    * old batches under v2 is then ordinary batch work (sim18's
    * assignment), not a streaming concern.
    *
    * stream09's contracts verbatim: per-row decisions ⇒ re-batching-
    * invariant (given the same resolved version); `batch_id=N`
    * overwrite ⇒ idempotent replay; ZERO streaming state — the STORE
    * is the state, and the version column makes every landed row
    * auditable against exactly the codebook that placed it.
    */
  def landVersionedIvfBatch(
      batch: DataFrame, basePath: String, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = graft.sources.CodebookStore.latest(spark, basePath).getOrElse(
      throw new IllegalStateException(
        s"no committed codebook under $basePath — publish one before streaming appends"))
    val cb = graft.sources.CodebookStore.codebookAt(spark, basePath, v)
    graft.operators.Similarity.ivfAssignArrivalsWith(batch, cb)
      .withColumn("codebook_version", lit(v))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/batch_id=$batchId")
  }

  /** The streamed side of the live index: every append landed so far,
    * cell-pruned via partition pruning when filtered on `cell`. The
    * partition columns come back from directory names as integers;
    * `cell` is cast to the batch side's long so the two index halves
    * union with one schema (the cast sits above the scan and does not
    * defeat partition pruning).
    */
  def streamedIvfAppends(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)
      .withColumn("cell", col("cell").cast("long"))

  /** One arriving encoded image on the stream12 ingest stream. */
  case class ImageArrival(img_id: Long, media: Array[Byte])

  /** stream12: streaming IMAGE ingest dedup — dedup12's gate decision
    * at mm06's granularity: each micro-batch of arriving encoded
    * images is decoded on executors (the real ImageIO path), reduced
    * to its perceptual fingerprint, and decided against the corpus'
    * fingerprint frame through the same delta-neighborhood equi-join
    * mm06 uses within-corpus — `dup` (with the smallest matching
    * corpus keeper) for arrivals within hamming ≤ 1 of any corpus
    * image, `admit` otherwise.
    *
    * The contracts are stream09's, verbatim: decisions depend only on
    * the arrival's own bytes and the corpus frame, so verdicts are
    * invariant under re-batching; each batch overwrites its own
    * `batch_id=N` partition (idempotent replay); streaming state is
    * ZERO — the corpus fingerprint frame IS the state (16 bytes/image,
    * pinned once per session, refreshed on the batch cadence). This is
    * the media-lake steady state: the heavy decode runs once per
    * arrival on executors, and the corpus side is never re-decoded.
    */
  def landImageBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    imageIngestDecisions(batch, dir)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Decision core, separable so the spec can replay it in batch. */
  private[graft] def imageIngestDecisions(
      batch: DataFrame, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val spark = batch.sparkSession
    val corpus = Multimodal.corpusImageHashes(spark, dir)
      .select(col("img_id").as("kid"), col("phash").as("kh"))
    val arrivals = Multimodal.perceptualHashes(batch)
    val dups = Multimodal.neighborhoodProbes(arrivals, "phash")
      .join(corpus, col("key") === col("kh"))
      .groupBy("img_id").agg(min("kid").as("keeper"))
    arrivals.select("img_id")
      .join(dups, Seq("img_id"), "left")
      .select(col("img_id"),
        when(col("keeper").isNotNull, "dup").otherwise("admit").as("decision"),
        coalesce(col("keeper"), lit(-1L)).as("keeper_id"))
  }

  /** stream21: streaming BOILERPLATE scrub — text20's template-mass
    * removal on the ingest cadence, which is how a crawl pipeline
    * actually deploys it: the boilerplate index (spans in ≥
    * BoilerplateMinDocs distinct corpus documents) is nearly static
    * and refreshes on the batch cadence, while every arriving document
    * is scrubbed against it before admission. stream15's posture
    * verbatim: per-arrival independent ⇒ re-batching-invariant;
    * `batch_id=N` overwrite ⇒ idempotent replay; ZERO streaming
    * state — the pinned boilerplate hash set IS the state. The
    * decision + rewrite core is
    * [[graft.operators.TextAnalysis.boilerplateScrub]] — literally the
    * batch operator's, so the gate cannot chunk or scrub differently
    * than text20 (spec-pinned equality on the same docs).
    */
  def landBoilerplateBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    graft.operators.TextAnalysis.boilerplateScrub(batch,
        graft.operators.TextAnalysis.boilerplateHashes(batch.sparkSession, dir))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Publish `dir`'s current boilerplate hash index as the next
    * committed store version — the corpus-refresh half of the
    * versioned stream21 deployment, run on the batch cadence (the
    * crawl's template mass drifts; the index must follow without
    * stopping the stream). The artifact is tiny by the nd≥3 threshold
    * (88 hashes at the measured second decade), so snapshot-per-
    * version costs nothing.
    */
  def publishBoilerplateIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      store: String): Long =
    graft.sources.CodebookStore.publishFrame(spark, store,
      graft.operators.TextAnalysis.boilerplateHashes(spark, dir))

  /** stream21's VERSIONED landing path — the index-refresh story the
    * pinned form above lacks (round-15 directive): each micro-batch
    * resolves the boilerplate index from the store's latest COMMITTED
    * version at batch time (stream17's pattern on text20's artifact —
    * the parquet `_SUCCESS` is the flip, so a batch can never scrub
    * against a torn index) and stamps landed rows with it. A
    * mid-stream publish re-routes NEW batches atomically; batches
    * landed before the publish keep their version's verdicts
    * (auditable via the stamp), and a replay re-decides under the
    * CURRENT version — stream17's replay-as-re-decision contract. The
    * scrub core is still literally [[graft.operators.TextAnalysis
    * .boilerplateScrub]]: versioning changes WHICH index is read,
    * never how it is applied.
    */
  def landBoilerplateVersionedBatch(
      batch: DataFrame, store: String, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = graft.sources.CodebookStore.latest(spark, store).getOrElse(
      throw new NoSuchElementException(
        s"no committed boilerplate index under $store — publish one " +
          "before starting the gate"))
    graft.operators.TextAnalysis.boilerplateScrub(batch,
        graft.sources.CodebookStore.frameAt(spark, store, v).select(col("h")))
      .withColumn("index_version", lit(v))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** One arriving encoded AUDIO clip on the stream22 ingest stream. */
  case class AudioArrival(clip_id: Long, media: Array[Byte])

  /** stream22: streaming AUDIO ingest — mm10/mm11's streaming twin,
    * closing the modality × streaming matrix (images: stream12, video:
    * stream14, audio: here): each micro-batch of arriving encoded
    * clips is decoded on executors through the SAME windowed seam as
    * batch mm11 ([[graft.operators.Multimodal.audioWindowMeta]] — the
    * gate cannot decode or featurize differently than the batch
    * operator), and the per-window signal profile lands under
    * `batch_id=N`. stream09's contracts verbatim: per-arrival
    * independent (a clip's windows depend only on its own bytes) ⇒
    * re-batching-invariant; per-partition overwrite ⇒ idempotent
    * replay; ZERO streaming state — unlike stream14's video extractor
    * there is no cross-batch frame to compare against, because a clip
    * arrives WHOLE and its windows tile it deterministically.
    * Undecodable media throws (the decodeImage posture) — the etl20
    * quarantine pattern composes in front when a crawl feed is dirty.
    */
  def landAudioBatch(
      batch: DataFrame, outDir: String, batchId: Long): Unit =
    graft.operators.Multimodal.audioWindowMeta(batch,
        graft.operators.Multimodal.Mm10WindowSamples)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** One arriving PAGE (document text + its encoded image) on the
    * stream20 cross-modal ingest stream.
    */
  case class PageArrival(doc_id: Long, text: String, media: Array[Byte])

  /** stream20: streaming CROSS-MODAL ingest dedup — dedup14's verdict
    * algebra at the gate: each arriving page is decided against BOTH
    * corpus indexes at once (text exact/near via stream09's core,
    * image perceptual via stream12's core), because a mirror admits
    * through whichever modality the per-modality gates don't watch.
    * Output carries both legs' evidence (decision + keeper each) plus
    * the composed verdict dup_both/dup_text/dup_image/admit.
    *
    * Composition, not reimplementation (stream18's discipline): the
    * legs ARE [[graft.operators.Dedup.ingestDecisions]] and
    * [[imageIngestDecisions]] — the gate has no decision logic of its
    * own, so it cannot drift from stream09/stream12 (spec-pinned leg
    * equality). Contracts are stream09's verbatim: per-arrival
    * independent ⇒ re-batching-invariant; `batch_id=N` overwrite ⇒
    * idempotent replay; ZERO streaming state — the two pinned corpus
    * indexes are the state, refreshed on the batch cadence.
    */
  def landCrossmodalBatch(
      batch: DataFrame, dir: String, outDir: String, batchId: Long): Unit =
    crossmodalIngestDecisions(batch, dir)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Decision core, separable so the spec can pin leg equality. */
  private[graft] def crossmodalIngestDecisions(
      batch: DataFrame, dir: String): DataFrame = {
    val spark = batch.sparkSession
    val txt = graft.operators.Dedup.ingestDecisions(
        spark, dir, batch.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("decision").as("text_decision"),
        col("keeper_id").as("text_keeper"), col("jaccard"))
    val img = imageIngestDecisions(
        batch.select(col("doc_id").as("img_id"), col("media")), dir)
      .select(col("img_id").as("doc_id"),
        col("decision").as("image_decision"),
        col("keeper_id").as("image_keeper"))
    txt.join(img, Seq("doc_id"))
      .select(col("doc_id"), col("text_decision"), col("text_keeper"),
        col("jaccard"), col("image_decision"), col("image_keeper"),
        crossmodalGateVerdict(col("text_decision"), col("image_decision"))
          .as("verdict"))
  }

  /** stream20's verdict algebra over the two legs' decisions —
    * extracted so the spec can pin ALL four arms directly: with the
    * full 0..255 staged image corpus every decoded hash is within
    * hamming ≤ 1 of some corpus image, so the image leg never admits
    * and the dup_text / admit arms are data-unreachable (dedup14's
    * 'both'-arm situation exactly).
    */
  private[graft] def crossmodalGateVerdict(
      textDecision: Column, imageDecision: Column): Column =
    when(textDecision =!= "admit" && imageDecision === "dup", "dup_both")
      .when(textDecision =!= "admit", "dup_text")
      .when(imageDecision === "dup", "dup_image")
      .otherwise("admit")

  /** One encoded frame arriving on the stream14 keyframe stream. `ts`
    * is the arrival's event time (drives the watermark + the per-video
    * state TTL); `frame_idx` orders frames within their video.
    */
  case class FrameArrival(
      video_id: Long, frame_idx: Long, media: Array[Byte], ts: java.sql.Timestamp)

  /** A decoded+fingerprinted frame (the executor-side ImageIO pass). */
  case class HashedFrame(
      video_id: Long, frame_idx: Long, phash: Long, ts: java.sql.Timestamp)

  /** Per-video keyframe state: where the last processed frame left off. */
  case class FrameState(lastIdx: Long, lastHash: Long)

  /** Streaming keyframe verdict — mm08's output shape: `hamming_prev`
    * is −1 for the first frame of a video within the retention horizon,
    * else the fingerprint distance to the predecessor (emitted only
    * when it exceeds the perceptual-noise band).
    */
  case class KeyframeOut(video_id: Long, frame_idx: Long, hamming_prev: Long)

  /** stream14 (incremental): streaming VIDEO KEYFRAME extraction — the
    * streaming twin of [[graft.operators.Multimodal.mm08VideoKeyframes]]
    * and the one multimodal batch operator that genuinely needs
    * cross-batch state: the "did this frame change scenes?" decision
    * compares against the video's LAST frame, which usually arrived in
    * an earlier micro-batch. Arriving encoded frames are decoded +
    * fingerprinted on executors per micro-batch (the mm05/mm06 batched
    * ImageIO path — [[MultimodalStub.decodeImage]] + `aHash64`), then
    * `flatMapGroupsWithState` keyed by video holds each video's last
    * (frame_idx, phash) under stream03's sighting-refreshed event-time
    * TTL: state is O(videos active in the retention horizon) — 16
    * bytes per video however long the streams run — and a video idle
    * past the horizon restarts with a fresh `-1` first-frame row (the
    * documented horizon contract).
    *
    * Ordering contract: frames within a video arrive in frame order
    * (the natural contract of a frame extractor feeding a stream) —
    * but the groupBy shuffle does NOT preserve that order into the
    * group iterator, so within a micro-batch the group re-sorts by
    * frame_idx; a frame at or behind the video's processed frontier is
    * DROPPED (a duplicate delivery or an out-of-contract late frame —
    * the watermark governs how late a batch may be, the frontier
    * governs order within the video). Under that contract the emitted
    * keyframe set equals batch mm08 over the same frames, invariant
    * under re-batching — spec-pinned over the REAL staged mm08 PNG
    * corpus.
    *
    * Memory contract: the O(videos) figure is the cross-batch STATE;
    * the within-batch sort additionally materializes each video's
    * arrivals for ONE micro-batch — but of [[HashedFrame]]s (~24
    * bytes: the decode already reduced the media), never the encoded
    * frames, so a hot video costs 24 B × its frames-per-trigger, a
    * knob the trigger interval / maxFilesPerTrigger bounds directly.
    * The sort itself is the price of exactness under shuffled
    * within-batch order: only (lastIdx, lastHash) is carried once
    * input is ordered, and skipping the sort would mis-pair neighbors
    * whenever one trigger carries two frames of one video.
    */
  def streamingKeyframes(
      frames: Dataset[FrameArrival],
      watermarkDelay: String = DedupWatermarkDelay,
      retentionMs: Long = DedupRetentionMs): Dataset[KeyframeOut] = {
    import graft.operators.{Multimodal, MultimodalStub}
    implicit val hashedEnc: Encoder[HashedFrame] = ExpressionEncoder()
    implicit val stateEnc: Encoder[FrameState] = ExpressionEncoder()
    implicit val outEnc: Encoder[KeyframeOut] = ExpressionEncoder()
    implicit val longEnc: Encoder[Long] = ExpressionEncoder()
    val hashed = frames.mapPartitions { it =>
      // Batched decode — the multimodal executor contract (no per-row
      // codec setup, no driver involvement).
      it.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { f =>
          val (w, h, rgb) = MultimodalStub.decodeImage(f.media)
          HashedFrame(f.video_id, f.frame_idx,
            MultimodalStub.aHash64(w, h, rgb), f.ts)
        }
      }
    }
    hashed
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.video_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (video: Long, arrivals: Iterator[HashedFrame], state: GroupState[FrameState]) =>
          if (state.hasTimedOut) {
            // Watermark passed last sighting + retention: forget the
            // video. Its next frame starts a fresh sequence.
            state.remove()
            Iterator.empty
          } else {
            val sorted = arrivals.toSeq.sortBy(_.frame_idx)
            var st = state.getOption
            val out = Seq.newBuilder[KeyframeOut]
            sorted.foreach { f =>
              st match {
                case None =>
                  out += KeyframeOut(video, f.frame_idx, -1L)
                  st = Some(FrameState(f.frame_idx, f.phash))
                case Some(s) if f.frame_idx > s.lastIdx =>
                  val d = java.lang.Long.bitCount(f.phash ^ s.lastHash).toLong
                  if (d > Multimodal.Mm06MaxHamming)
                    out += KeyframeOut(video, f.frame_idx, d)
                  st = Some(FrameState(f.frame_idx, f.phash))
                case _ => // at/behind the frontier: duplicate or
                  // out-of-contract late frame — dropped.
              }
            }
            st.foreach(state.update)
            val maxTs = sorted.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs()) + retentionMs)
            out.result().iterator
          }
      }
  }

  def upsertBatchToJdbc(batch: DataFrame, url: String,
      driver: String, master: String, keyCol: String): Unit = {
    val staging = s"${master}_staging"
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    batch.write.mode("overwrite").jdbc(url, staging, props)
    val cols = batch.columns.toSeq
    val q = cols.map(c => s""""$c"""")
    val setList = cols.filterNot(_ == keyCol)
      .map(c => s""""$c" = s."$c"""").mkString(", ")
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // First batch bootstraps the master as an empty copy of the
      // staging shape (CREATE via the same JDBC metadata Spark wrote).
      def tableExists(name: String): Boolean = {
        val meta = conn.getMetaData.getTables(null, null,
          name.toUpperCase, null)
        try meta.next() finally meta.close()
      }
      val exists = tableExists(master)
      // SUPPRESSION GATE (etl31's convention, on the streaming seam —
      // round-17 directive #1's feed half): if an erasure ledger
      // exists beside the master (the ONE shared naming seam,
      // JdbcErasure.suppressTableFor — round-18 directive #4: a
      // spelling drift between the writer and this probe would
      // silently un-gate the stream), suppressed keys are DELETED from
      // the staged batch in the SAME transaction as the merge — a
      // replayed or late micro-batch can never resurrect an erased
      // key, and there is no window where the merge sees ungated
      // staging. With no ledger the gate is one metadata probe.
      val suppress = graft.sources.JdbcErasure.suppressTableFor(master)
      val gated = tableExists(suppress)
      val st = conn.createStatement()
      try {
        if (!exists)
          st.executeUpdate(
            s"CREATE TABLE $master AS SELECT * FROM $staging WITH NO DATA")
        if (gated) conn.setAutoCommit(false)
        try {
          if (gated)
            st.executeUpdate(s"""DELETE FROM $staging WHERE "$keyCol" IN
                (SELECT "$keyCol" FROM $suppress)""")
          // A key-only batch (distinct-keys stream) has nothing to
          // update — the merge degrades to insert-only instead of
          // emitting a syntactically empty SET list.
          val matchedArm =
            if (setList.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setList\n" else ""
          st.executeUpdate(
            s"""MERGE INTO $master m USING $staging s
                ON m."$keyCol" = s."$keyCol"
                $matchedArm
                WHEN NOT MATCHED THEN INSERT (${q.mkString(", ")})
                  VALUES (${q.map(c => s"s.$c").mkString(", ")})""")
          if (gated) { conn.commit(); conn.setAutoCommit(true) }
        } catch {
          // Roll back and restore autoCommit BEFORE close: Derby
          // throws 25001 on close-with-active-transaction, which would
          // mask the original failure (round-18 ADVICE).
          case e: Throwable =>
            if (gated) {
              try { conn.rollback(); conn.setAutoCommit(true) }
              catch { case _: java.sql.SQLException => () }
            }
            throw e
        }
      } finally st.close()
    } finally conn.close()
  }
}
