package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** MERGE-INTO semantics against a mutable catalog table — the load step
  * of the reference pipeline (a temp table + `MERGE INTO master_table`
  * against an external RDBMS; reference case_2/Normal.py:265-275)
  * re-expressed for a Spark catalog:
  *
  *  - matched by key and the change is NEWER (higher sequence) → update;
  *  - not matched → insert;
  *  - delete ops are kept as TOMBSTONES so a late-arriving older
  *    insert/update cannot resurrect a deleted key (read the state
  *    through [[state]], which filters them);
  *  - a change at-or-below the stored sequence loses the
  *    latest-row-wins window, so REPLAYING a batch is a no-op — the
  *    restart/idempotence contract the reference implements with its
  *    completed-batch bookkeeping (case_2/Normal.py:283-327).
  *
  * Physical protocol: parquet snapshots are immutable, so a merge never
  * edits files in place. The merged state is fully materialized into a
  * NEW versioned directory while readers of the current version are
  * untouched; the catalog flip (drop + re-create the external table at
  * the new location) is the commit point. All-but-the-last-two versions
  * are pruned best-effort afterwards. Writers are serialized per table
  * within this JVM; multi-driver coordination is a transactional table
  * format's job (Delta/Iceberg) — this sink is the built-in-catalog
  * analog, and merge order does not matter for the final state because
  * latest-sequence-wins is commutative over batches.
  */
object MergeSink {

  private val locks = new ConcurrentHashMap[String, Object]()
  private val versions = new ConcurrentHashMap[String, AtomicLong]()

  /** State schema: one row per key, including delete tombstones. */
  val schema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("last_seq", LongType),
    StructField("last_op", StringType),
    StructField("current_value", DoubleType)))

  private def lockFor(table: String): Object =
    locks.computeIfAbsent(table, _ => new Object)

  /** Apply one change batch `(key, seq, op, value)` to `table`
    * (external parquet under `basePath`), creating it if absent.
    */
  def merge(spark: SparkSession, table: String, basePath: String,
      changes: DataFrame): Unit = lockFor(table).synchronized {
    val asOps = changes.select(
      col("key").cast("long"), col("seq").cast("long"),
      col("op").cast("string"), col("value").cast("double"))
    val unioned =
      if (spark.catalog.tableExists(table))
        spark.table(table).select(
          col("key"), col("last_seq").as("seq"),
          col("last_op").as("op"), col("current_value").as("value"))
          .unionByName(asOps)
      else asOps
    // Latest op per key wins; on a replayed batch the stored row and the
    // replayed row are identical, so either winning is the same no-op.
    val w = Window.partitionBy("key").orderBy(col("seq").desc, col("op"))
    val newState = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("seq").as("last_seq"),
        col("op").as("last_op"), col("value").as("current_value"))

    val v = versions.computeIfAbsent(table, _ => new AtomicLong(0L))
      .incrementAndGet()
    val newPath = s"$basePath/v$v"
    // Materialize BEFORE touching the catalog: the write streams out of
    // the current snapshot; only then does the catalog flip commit.
    newState.write.mode("overwrite").parquet(newPath)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$newPath'")
    pruneOldVersions(basePath, keep = Set(v, v - 1))
  }

  /** The visible table state: tombstones filtered out. */
  def state(spark: SparkSession, table: String): DataFrame =
    spark.table(table).filter(col("last_op") =!= "D")

  /** Drop the table and all snapshot versions — a clean slate for a
    * deterministic end-to-end replay.
    */
  def reset(spark: SparkSession, table: String, basePath: String): Unit =
    lockFor(table).synchronized {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      versions.remove(table)
      pruneOldVersions(basePath, keep = Set.empty)
    }

  private def pruneOldVersions(basePath: String, keep: Set[Long]): Unit =
    try {
      val dir = new java.io.File(basePath)
      val stale = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("v") &&
          f.getName.drop(1).toLongOption.exists(n => !keep(n)))
      stale.foreach(deleteRecursively)
    } catch { case _: Throwable => () } // best-effort retention
  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
