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
    * marker (so a crashed half-write is rebuilt, never trusted) OR its
    * recorded `stamp` differs from the caller's, serialized per path.
    * The `_SUCCESS` guard persists across JVM runs (the layouts live in
    * java.io.tmpdir), so without the stamp a regenerated SOURCE would
    * silently serve a stale derived layout; callers pass a source
    * fingerprint ([[dirFingerprint]]) and the layout rebuilds whenever
    * it changes. Resolved through the path's Hadoop FileSystem, same as
    * MergeSink's snapshot protocol.
    */
  def ensurePath(spark: org.apache.spark.sql.SparkSession, path: String,
      stamp: String = "")(write: => Unit): Unit =
    locks.computeIfAbsent(path, _ => new Object).synchronized {
      val conf = spark.sparkContext.hadoopConfiguration
      val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = marker.getFileSystem(conf)
      val stampFile = new org.apache.hadoop.fs.Path(path, "_GRAFT_STAMP")
      def recordedStamp: String =
        if (!fs.exists(stampFile)) ""
        else {
          val in = fs.open(stampFile)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }
      if (!fs.exists(marker) || (stamp.nonEmpty && recordedStamp != stamp)) {
        write
        if (stamp.nonEmpty) {
          val out = fs.create(stampFile, true)
          try out.write(stamp.getBytes("UTF-8")) finally out.close()
        }
      }
    }

  /** Metadata-only fingerprint of a source path: md5 over each file's
    * (name, length, mtime). Changes whenever the source data is
    * regenerated in place — no Spark job, one FileSystem listing.
    */
  def dirFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(p)) Array("absent")
      else if (fs.getFileStatus(p).isFile) {
        val s = fs.getFileStatus(p)
        Array(s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      } else
        fs.listStatus(p).map(s =>
          s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}").sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
