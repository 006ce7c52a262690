package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MERGE-INTO semantics against a mutable catalog table — the load step
  * of the reference pipeline (a temp table + `MERGE INTO master_table`
  * against an external RDBMS; reference case_2/Normal.py:265-275)
  * re-expressed for a Spark catalog:
  *
  *  - matched by key and the change is STRICTLY newer (higher sequence)
  *    → update; at an EQUAL sequence the stored row wins, so a change
  *    at-or-below the stored sequence can never overwrite state;
  *  - not matched → insert;
  *  - delete ops are kept as TOMBSTONES so a late-arriving older
  *    insert/update cannot resurrect a deleted key (read the state
  *    through [[state]], which filters them);
  *  - REPLAYING a batch is therefore a no-op — the restart/idempotence
  *    contract the reference implements with its completed-batch
  *    bookkeeping (case_2/Normal.py:283-327).
  *
  * Physical protocol: parquet snapshots are immutable, so a merge never
  * edits files in place. The merged state is fully materialized into a
  * NEW versioned directory while readers of the current version are
  * untouched; the catalog flip (drop + re-create the external table at
  * the new location) is the commit point. Version numbers come from the
  * snapshot directories ON DISK (never a JVM counter), and recovery
  * reads the latest _SUCCESS-committed snapshot when the catalog entry
  * is gone — so a restarted driver resumes exactly where the last
  * commit left off instead of silently starting empty or overwriting
  * the live snapshot. All filesystem access goes through the path's
  * Hadoop FileSystem, so the protocol holds on object stores and HDFS,
  * not only file:/. All-but-the-last-two versions are pruned
  * best-effort after each commit. Writers are serialized per table
  * within this JVM; multi-driver coordination is a transactional table
  * format's job (Delta/Iceberg) — this sink is the built-in-catalog
  * analog.
  *
  * Sequence protocol: sequences are assumed UNIQUE per key (an LSN, as
  * in any change feed). Under that protocol latest-sequence-wins makes
  * batch application order irrelevant to the final state. An equal-seq
  * row is either a replay of the stored row (the intended case — a
  * no-op) or a protocol violation; violations resolve stored-row-first,
  * deterministically, but cross-batch commutativity is not defined for
  * them.
  */
object MergeSink {

  private val locks = new ConcurrentHashMap[String, Object]()

  /** State schema: one row per key, including delete tombstones. */
  val schema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("last_seq", LongType),
    StructField("last_op", StringType),
    StructField("current_value", DoubleType)))

  private def lockFor(table: String): Object =
    locks.computeIfAbsent(table, _ => new Object)

  private def fsFor(spark: SparkSession, basePath: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(basePath)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Snapshot version numbers present under basePath, ascending —
    * resolved through the path's Hadoop FileSystem so the sink works on
    * any supported store (file:/, hdfs://, s3a://…), not just the local
    * disk. Committed = carries the parquet writer's _SUCCESS marker; a
    * crashed half-write never qualifies for recovery but still blocks
    * its number from reuse.
    */
  private def versionsOnDisk(spark: SparkSession, basePath: String,
      committedOnly: Boolean): Seq[Long] = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
      .filter { case (_, p) =>
        !committedOnly ||
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      .map(_._1).sorted
  }

  /** The current committed state: the catalog table if present, else
    * (driver restart with a non-persistent catalog) the latest
    * committed snapshot on disk.
    */
  private def currentState(spark: SparkSession, table: String,
      basePath: String): Option[DataFrame] =
    if (spark.catalog.tableExists(table)) Some(spark.table(table))
    else versionsOnDisk(spark, basePath, committedOnly = true).lastOption
      .map(v => spark.read.schema(schema).parquet(s"$basePath/v$v"))

  /** Apply one change batch `(key, seq, op, value)` to `table`
    * (external parquet under `basePath`), creating it if absent.
    * `retainLast` is the post-commit retention: the newest `retainLast`
    * snapshot versions survive, older ones are pruned best-effort
    * (the default 2 keeps current + predecessor so etl23's audit diff
    * always has both sides; pass more to hold a deeper time-travel
    * window, then expire it explicitly with [[expireVersions]]).
    */
  def merge(spark: SparkSession, table: String, basePath: String,
      changes: DataFrame, retainLast: Int = 2): Unit = lockFor(table).synchronized {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    val asOps = changes.select(
      col("key").cast("long"), col("seq").cast("long"),
      col("op").cast("string"), col("value").cast("double"))
      .withColumn("is_current", lit(false))
    val unioned = currentState(spark, table, basePath) match {
      case Some(cur) => cur.select(
          col("key"), col("last_seq").as("seq"),
          col("last_op").as("op"), col("current_value").as("value"))
        .withColumn("is_current", lit(true))
        .unionByName(asOps)
      case None => asOps
    }
    // Highest sequence wins; at an equal sequence the STORED row ranks
    // first (the documented at-or-below-loses contract — a replayed
    // batch is a no-op even when an op differs at the same seq).
    // Equal-seq conflicts WITHIN one batch resolve deterministically by
    // (op, value) so replays stay byte-stable.
    val w = Window.partitionBy("key")
      .orderBy(col("seq").desc, col("is_current").desc, col("op"), col("value"))
    val newState = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("seq").as("last_seq"),
        col("op").as("last_op"), col("value").as("current_value"))

    val v = versionsOnDisk(spark, basePath, committedOnly = false)
      .lastOption.getOrElse(0L) + 1L
    val newPath = s"$basePath/v$v"
    // Materialize BEFORE touching the catalog: the write streams out of
    // the current snapshot; only then does the catalog flip commit.
    newState.write.mode("overwrite").parquet(newPath)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$newPath'")
    pruneOldVersions(spark, basePath,
      keep = ((v - retainLast + 1) to v).toSet)
  }

  /** VACUUM: expire all but the newest `keepLast` committed snapshot
    * versions — the maintenance sibling of compaction (etl21) for the
    * time-travel surface: snapshots cost a full state copy each, so a
    * real lake expires them on a retention schedule instead of keeping
    * every version forever.
    *
    * Contract: `keepLast >= 1` (the CURRENT version can never be
    * expired — refusing loudly beats silently deleting the live
    * table); only versions STRICTLY OLDER than the oldest retained
    * committed version are deleted, so an in-flight uncommitted write
    * (always newer) is never touched. Returns the expired version
    * numbers. Reads of retained versions via [[stateAt]] are untouched
    * (immutable snapshots); reads of expired versions fail loudly.
    */
  def expireVersions(spark: SparkSession, basePath: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1,
      s"keepLast must be >= 1 (the current version cannot be expired), got $keepLast")
    val committed = versionsOnDisk(spark, basePath, committedOnly = true)
    val retained = committed.takeRight(keepLast)
    if (retained.isEmpty) Seq.empty
    else {
      val floor = retained.head
      val all = versionsOnDisk(spark, basePath, committedOnly = false)
      val expired = all.filter(_ < floor)
      val (fs, base) = fsFor(spark, basePath)
      expired.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(base, s"v$v"), true)
      }
      expired
    }
  }

  /** The visible table state: tombstones filtered out. */
  def state(spark: SparkSession, table: String): DataFrame =
    spark.table(table).filter(col("last_op") =!= "D")

  /** Committed snapshot versions on disk, ascending — the TIME-TRAVEL
    * surface: retention keeps the last two, so audits can always diff
    * the current state against its predecessor.
    */
  def versions(spark: SparkSession, basePath: String): Seq[Long] =
    versionsOnDisk(spark, basePath, committedOnly = true)

  /** The visible state AS OF a committed snapshot version (tombstones
    * filtered, same contract as [[state]]) — snapshots are immutable,
    * so this read is stable while newer merges commit. An expired or
    * never-committed version fails LOUDLY with the retained set in the
    * message — time travel past the retention horizon must be an
    * error, never an empty frame.
    */
  def stateAt(spark: SparkSession, basePath: String, version: Long): DataFrame = {
    // Fast path: ONE existence probe of the requested snapshot's
    // commit marker (object-store listings are paid round-trips and
    // callers typically just enumerated versions()); the full listing
    // runs only on the error path, to name the retained set.
    val (fs, base) = fsFor(spark, basePath)
    val committedMarker =
      new org.apache.hadoop.fs.Path(base, s"v$version/_SUCCESS")
    if (!fs.exists(committedMarker)) {
      val committed = versionsOnDisk(spark, basePath, committedOnly = true)
      throw new NoSuchElementException(
        s"snapshot v$version is not committed under $basePath " +
          s"(expired or never written); retained versions: " +
          s"${committed.mkString("[", ", ", "]")}")
    }
    spark.read.schema(schema).parquet(s"$basePath/v$version")
      .filter(col("last_op") =!= "D")
  }

  /** Drop the table and all snapshot versions — a clean slate for a
    * deterministic end-to-end replay.
    */
  def reset(spark: SparkSession, table: String, basePath: String): Unit =
    lockFor(table).synchronized {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      pruneOldVersions(spark, basePath, keep = Set.empty)
    }

  private def pruneOldVersions(spark: SparkSession, basePath: String,
      keep: Set[Long]): Unit =
    try {
      val (fs, base) = fsFor(spark, basePath)
      if (fs.exists(base)) {
        fs.listStatus(base)
          .filter(s => s.getPath.getName.startsWith("v") &&
            s.getPath.getName.drop(1).toLongOption.exists(n => !keep(n)))
          .foreach(s => fs.delete(s.getPath, true))
      }
    } catch { case _: Throwable => () } // best-effort retention
}
