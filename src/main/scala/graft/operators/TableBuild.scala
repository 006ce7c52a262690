package graft.operators

import org.apache.spark.sql.SparkSession

/** Build-once guard for derived table layouts (etl13's bucketed join
  * tables, sim06's bucketed IVF cells).
  *
  * CONCURRENCY CONTRACT (applies to every operator that writes a fixed
  * path derived only from `dir` — etl09–etl13, etl17, sim06): the
  * check-then-create here is serialized by a JVM-wide lock, so
  * concurrent calls within one JVM are safe; they are NOT safe for
  * concurrent submission from SEPARATE JVMs sharing a tmpdir, and a
  * cached table serves stale data if `dir`'s contents are rewritten in
  * place (ConcurrencySpec deliberately excludes these operators).
  * etl17 additionally overwrites its path on EVERY call (it
  * demonstrates the write+read round-trip), so it must never run
  * concurrently with itself even in one JVM.
  */
private[operators] object TableBuild {

  // Per-table guards: builds of DIFFERENT tables (etl13 vs sim06) run
  // in parallel; only same-table check-then-create is serialized —
  // holding one JVM-wide monitor across a multi-second saveAsTable
  // would chain unrelated operators' first calls.
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `write` iff `table` does not exist yet, serialized per table. */
  def ensure(spark: SparkSession, table: String)(write: => Unit): Unit =
    locks.computeIfAbsent(table, _ => new Object).synchronized {
      if (!spark.catalog.tableExists(table)) write
    }

  /** Path-based twin of [[ensure]] for layouts that live outside the
    * catalog: run `write` iff `path` lacks a committed `_SUCCESS`
    * marker (so a crashed half-write is rebuilt, never trusted),
    * serialized per path. Resolved through the path's Hadoop
    * FileSystem, same as MergeSink's snapshot protocol.
    */
  def ensurePath(spark: org.apache.spark.sql.SparkSession, path: String)(
      write: => Unit): Unit =
    locks.computeIfAbsent(path, _ => new Object).synchronized {
      val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) write
    }
}
