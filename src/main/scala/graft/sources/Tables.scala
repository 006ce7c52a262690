package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Typed loaders for the engine's table surface.
  *
  * The reference's `extract()` is a directory listing of input files
  * (reference: case_1/NormalETL.py:8-10); here extraction is a parquet
  * scan, so predicate pushdown / column pruning reach the file reader
  * and a directory of part-files parallelizes for free.
  */
object Tables {

  /** Plan-level memo of the base-table loaders, keyed by (session, dir,
    * name). `spark.read.parquet` pays a directory listing plus a
    * parquet-footer schema inference on EVERY call (~60 ms locally;
    * minutes against an object store at 100 TB — guide §6's "repeated
    * listings" cost), and the bench re-constructs each query per timed
    * iteration, so the same immutable input was re-listed thousands of
    * times per run. The memo shares the resolved DataFrame — the
    * LOGICAL PLAN only: no `.persist`, no data caching, every action
    * still scans parquet — so plans, fingerprints, and results are
    * byte-identical. Safe because the base testdata inputs are
    * immutable for a session's lifetime; the registry drops with
    * [[graft.GraftCache.release]] like every other session-scoped
    * artifact. Operator-written tmpdir artifacts do NOT route through
    * this (they are rewritten mid-session by design).
    */
  /** NOT cleared on [[graft.GraftCache.release]] (round-20): the memo
    * pins no data — correctness against in-place rewrites rides the
    * freshness token in the key, not the clear — and the bench
    * releases at every family boundary, so a release-hook clear
    * re-paid ~16 rounds of listings per pass for nothing. Entries of
    * STOPPED sessions are swept on the miss path (round-21, the
    * round-20 ADVICE leak: a cached DataFrame strongly references its
    * SparkSession, so a long-lived JVM creating many sessions — the
    * ~25-suite test JVM, notebook/server use — otherwise accumulates
    * one plan tree per (stopped session, table, rewrite) forever);
    * rewritten-file tombstones of LIVE sessions still linger, bounded
    * by tables × rewrites per live session.
    */
  /** Memoizing holder (GraftCache's Pinned pattern, round-20 ADVICE):
    * computeIfAbsent only ALLOCATES this — the ~60 ms listing + footer
    * inference runs under the holder's own lazy-val monitor, never
    * inside the ConcurrentHashMap bin lock, so first-touch of tables
    * hashing to one bin doesn't serialize and a reentrant table() call
    * during resolution cannot hit the map's no-recursive-update rule.
    */
  private final class Resolved(val spark: SparkSession, path: String) {
    lazy val df: DataFrame = spark.read.parquet(path)
  }

  private val planMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Resolved]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // Freshness token: ONE stat of the table path (mtime + length) —
    // microseconds against the ~60 ms listing + footer-inference a
    // cache miss pays — so a source REGENERATED IN PLACE (the
    // ScaleToolsSpec etl22 contract: same path, new bytes) misses the
    // memo and is re-resolved. A single-file table (every base table
    // today) changes (mtime, len) on any rewrite. A DIRECTORY-shaped
    // table folds in a hash of its leaf-file (name, mtime, len)
    // listing (round-21, the round-20 ADVICE gap: dir mtime only
    // changes on add/remove, so a same-name same-length part-file
    // rewrite was invisible to the top-level token; the listing is
    // paid only by tables that ARE directories, and only once per
    // call against the ~60 ms resolution it saves). On stores whose
    // directory status is synthesized (object stores), the leaf hash
    // IS the token — the top-level stat alone would be inert there.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val token =
      if (!st.isDirectory) s"${st.getModificationTime}:${st.getLen}"
      else {
        val leaves = fs.listStatus(p).map { s =>
          s"${s.getPath.getName}:${s.getModificationTime}:${s.getLen}"
        }.sorted.mkString("|")
        s"d${leaves.hashCode}:${leaves.length}"
      }
    val key = s"${graft.GraftCache.sessionTag(spark)}:$path:$token"
    val hit = planMemo.get(key)
    if (hit != null) hit.df
    else {
      // Miss path: sweep entries whose session has STOPPED (the
      // eviction the memo otherwise lacks). Holder.df is a resolved
      // plan whose session field is final — sparkContext.isStopped is
      // the observable retire signal. The sweep walks a map bounded by
      // live-session tables × rewrites, far cheaper than the
      // resolution this miss is about to pay.
      val it = planMemo.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getValue.spark.sparkContext.isStopped) it.remove()
      }
      planMemo.computeIfAbsent(key, _ => new Resolved(spark, path)).df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is schema-adaptive: the testdata generator has shipped it
    * both as parquet TIMESTAMP(NANOS) (reads as a nanos `LongType` under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set once in
    * [[graft.GraftSession]]) and as `timestamp[us]` with no timezone
    * (reads as `TIMESTAMP_NTZ`). Both flavors normalize here to one
    * canonical `TimestampType` (µs, session-TZ=UTC) so every downstream
    * operator, encoder ([[Event]]'s `java.sql.Timestamp`), and oracle's
    * epoch math sees identical instants. Nanos→µs uses integer `div`
    * (a double division would lose precision above 2^53 ns).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        require(
          s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "events.parquet read ts as LongType without nanosAsLong=true: " +
            "build the session via graft.GraftSession")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Session TZ is pinned to UTC (GraftSession), so this cast maps the
        // wall-clock value to the same µs instant the nanos path produced.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected int64-nanos, " +
            "timestamp[us] (NTZ), or timestamp[us, tz]")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // ---- typed surface ----------------------------------------------------
  // Dataset[T] views for the tables whose rows flow through typed logic
  // (streaming state functions, mapPartitions featurizers). Encoders are
  // resolved once here; operators on the hot relational path stay
  // DataFrame (Catalyst sees through columns, not lambdas).

  /** `events` row (ts as µs timestamp after the nanos conversion). */
  case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** `documents` row. */
  case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  /** `embeddings` row. */
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def eventsDs(s: SparkSession, d: String): Dataset[Event] = {
    implicit val enc: Encoder[Event] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    events(s, d).as[Event]
  }

  def documentsDs(s: SparkSession, d: String): Dataset[Document] = {
    implicit val enc: Encoder[Document] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    documents(s, d).as[Document]
  }

  def embeddingsDs(s: SparkSession, d: String): Dataset[Embedding] = {
    implicit val enc: Encoder[Embedding] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    embeddings(s, d).as[Embedding]
  }
}
