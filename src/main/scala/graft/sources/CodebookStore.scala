package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSIONED codebook artifact — the ANN index's answer to MergeSink's
  * snapshot protocol: a trained coarse-quantizer codebook is published
  * as an immutable `v<N>` parquet snapshot, and the COMMIT POINT is the
  * parquet writer's `_SUCCESS` marker, so a reader resolving "the
  * deployed codebook" either sees the complete old version or the
  * complete new one — never a half-written centroid table. This is the
  * flip sim18's re-train executes: stream11-style append maintenance
  * runs against version N while training produces N+1; the swap is one
  * atomic marker, and the RETAINED prior version keeps every pre-swap
  * probe result reproducible (etl23's time-travel contract, applied to
  * the model artifact instead of the table state).
  *
  * Concurrency is MergeSink's OCC pattern: the right to write version
  * N is won by atomically creating the claim marker `vN.claim`
  * (create-fails-if-exists; on `file:` the kernel's O_EXCL create —
  * Hadoop LocalFileSystem's overwrite=false is a TOCTOU exists+create,
  * the race MergeSinkSpec measurably hit). A publisher that loses the
  * claim simply retries at the next number: unlike a MERGE, a codebook
  * publish carries its full payload (nothing is read-modify-written),
  * so the serializability gate degenerates to version-number
  * uniqueness — two concurrent trainers both commit, at distinct
  * versions, and the later number wins the `latest()` resolution.
  * Claim markers are never pruned (MergeSink's lineage-fork argument).
  *
  * At 100 TB scale the codebook is O(K×dims) — kilobytes — so
  * snapshot-per-version costs nothing; what the protocol buys is the
  * reader contract under continuous ingest: micro-batches resolve
  * `latest()` per batch and can never observe a torn model.
  */
object CodebookStore {

  private def fsFor(spark: SparkSession, basePath: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(basePath)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed (carrying `_SUCCESS`) snapshot versions, ascending. */
  def versions(spark: SparkSession, basePath: String): Seq[Long] = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      .map(_._1).sorted
  }

  /** The deployed (newest committed) version, if any. */
  def latest(spark: SparkSession, basePath: String): Option[Long] =
    versions(spark, basePath).lastOption

  /** All version numbers ever used (committed, in-flight, or claimed) —
    * the floor for the next claim.
    */
  private def usedNumbers(spark: SparkSession, basePath: String): Seq[Long] = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.startsWith("v")) n.drop(1).toLongOption
      else if (s.isFile && n.matches("v\\d+\\.claim"))
        n.stripPrefix("v").stripSuffix(".claim").toLongOption
      else None
    }
  }

  /** MergeSink's atomic claim, verbatim semantics: exactly one
    * concurrent publisher wins `v`; a transient IO failure reads as
    * "didn't win" and the caller retries at a later number.
    */
  private def tryClaim(spark: SparkSession, basePath: String, v: Long): Boolean = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) fs.mkdirs(base)
    val claim = new org.apache.hadoop.fs.Path(base, s"v$v.claim")
    if (Option(fs.getUri.getScheme).forall(_ == "file"))
      try new java.io.File(
        org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
          fs.makeQualified(claim)).toString).createNewFile()
      catch { case _: java.io.IOException => false }
    else
      try { fs.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Publish a codebook as the next version: claim a number, fully
    * materialize the snapshot (the parquet `_SUCCESS` is the commit),
    * return the committed version. Lock-free across JVMs — losers of a
    * claim race retry at the next number; readers resolving [[latest]]
    * flip from the old committed version to the new one atomically at
    * the marker.
    */
  def publish(spark: SparkSession, basePath: String,
      centroids: Array[(Long, Array[Double])]): Long = {
    import scala.jdk.CollectionConverters._
    val rows = centroids.map { case (cid, cv) =>
      org.apache.spark.sql.Row(cid, cv.toSeq)
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    publishFrame(spark, basePath, spark.createDataFrame(rows.asJava, schema))
  }

  /** The claim/_SUCCESS protocol over an ARBITRARY tiny artifact
    * frame — the versioning was never codebook-specific: any
    * pinned-index artifact a streaming gate resolves per batch (the
    * boilerplate hash index stream21 scrubs against, a held-out
    * window-hash set, a fingerprint corpus summary) gets the same
    * atomic-flip reader contract by publishing through here. The
    * payload must be a build ARTIFACT (small, fully materialized per
    * version), not a data table — MergeSink owns incremental state.
    */
  def publishFrame(spark: SparkSession, basePath: String,
      df: DataFrame): Long = {
    var committed = -1L
    while (committed < 0) {
      val next = (usedNumbers(spark, basePath) :+ 0L).max + 1
      if (tryClaim(spark, basePath, next)) {
        df.coalesce(1).write.mode("overwrite").parquet(s"$basePath/v$next")
        committed = next
      }
      // else: lost the race — re-list and take the next number.
    }
    committed
  }

  /** Publish SEVERAL artifact frames as consecutive versions with the
    * snapshot WRITES overlapped (round-21, guide §2.6): all version
    * numbers are claimed first — sequentially, under [[publishFrame]]'s
    * lost-claim retry, so cross-JVM uniqueness is untouched — and the
    * tiny coalesce(1) snapshots then write from a small driver pool,
    * so one lifecycle's N publishes pay ~one write's wall instead of N
    * serialized commit rounds. CAVEAT, and why this is a separate
    * entry point instead of the default: commit ORDER across the batch
    * is not monotone — a later version's `_SUCCESS` can land before an
    * earlier one's — so a concurrent reader resolving [[latest]]
    * mid-batch could briefly see v(N+2) while v(N+1) is uncommitted.
    * Use ONLY from lifecycles that own the store while publishing
    * (cur31's reset→publish×3→audit replay, the motivating user);
    * continuous-ingest publishers keep [[publishFrame]].
    * Returns the committed version numbers in frame order.
    */
  def publishFrames(spark: SparkSession, basePath: String,
      dfs: Seq[DataFrame]): Seq[Long] = {
    val claimed = dfs.map { _ =>
      var v = -1L
      while (v < 0) {
        val next = (usedNumbers(spark, basePath) :+ 0L).max + 1
        if (tryClaim(spark, basePath, next)) v = next
      }
      v
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(dfs.size, 4)))
    try {
      dfs.zip(claimed).map { case (df, v) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            df.coalesce(1).write.mode("overwrite").parquet(s"$basePath/v$v")
            ()
          }
        })
      }.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
        }
      }
    } finally pool.shutdown()
    claimed
  }

  /** The artifact frame AS OF a committed version — [[codebookAt]]'s
    * loud-failure contract for [[publishFrame]] payloads.
    */
  def frameAt(spark: SparkSession, basePath: String,
      version: Long): DataFrame = {
    val (fs, base) = fsFor(spark, basePath)
    val marker = new org.apache.hadoop.fs.Path(base, s"v$version/_SUCCESS")
    if (!fs.exists(marker))
      throw new NoSuchElementException(
        s"artifact v$version is not committed under $basePath; " +
          s"retained versions: ${versions(spark, basePath).mkString("[", ", ", "]")}")
    spark.read.parquet(s"$basePath/v$version")
  }

  /** The codebook AS OF a committed version, as the driver-side array
    * every assignment site consumes ([[graft.operators.Similarity]]'s
    * literal-argmax contract). An uncommitted or expired version fails
    * LOUDLY with the retained set — resolving a torn or vanished model
    * to an empty codebook would silently mis-assign the corpus.
    */
  def codebookAt(spark: SparkSession, basePath: String,
      version: Long): Array[(Long, Array[Double])] =
    frameAt(spark, basePath, version)
      .select(col("cid"), col("cv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  /** Retention for the artifact store — MergeSink.expireVersions'
    * contract applied to published artifacts: keep the newest
    * `keepLast` COMMITTED versions, delete every snapshot dir strictly
    * older than the oldest retained one, return the expired numbers.
    * The current version can never be expired (`keepLast >= 1`,
    * refused loudly); claim markers are never pruned (the lineage-fork
    * argument in MergeSink.pruneOldVersions). Reads of retained
    * versions are untouched; reads of expired versions fail loudly in
    * [[frameAt]]/[[codebookAt]].
    *
    * Motivating user (round-18 directive #5): a table's cumulative
    * SUPPRESSION ledger publishes one full version per erasure scrub
    * forever, but its content is cumulative — every older version is a
    * strict subset of the newest, so expired versions are redundant to
    * the ingest gate by construction, and this floor is how the ledger
    * stops growing one artifact per scrub without ever weakening the
    * gate.
    */
  def expireVersions(spark: SparkSession, basePath: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1,
      s"keepLast must be >= 1 (the current version cannot be expired), got $keepLast")
    val committed = versions(spark, basePath)
    val retained = committed.takeRight(keepLast)
    if (retained.isEmpty) Seq.empty
    else {
      val floor = retained.head
      val (fs, base) = fsFor(spark, basePath)
      val expired = fs.listStatus(base).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
        .flatMap(s => s.getPath.getName.drop(1).toLongOption)
        .filter(_ < floor).sorted
      expired.foreach { v =>
        // Loud-failure discipline (matching the scrub-swap rename
        // checks): a silently failed delete would report the version
        // expired while the store still lists and serves it — the
        // caller's bookkeeping and the store must never disagree.
        if (!fs.delete(new org.apache.hadoop.fs.Path(base, s"v$v"), true))
          throw new IllegalStateException(
            s"failed to delete expired artifact version v$v under " +
              s"$basePath — the store still serves it; resolve the " +
              "store error and re-run the expiry")
      }
      expired
    }
  }

  /** Drop every version and claim marker — a clean slate for a
    * deterministic replay (MergeSink.reset's contract).
    */
  def reset(spark: SparkSession, basePath: String): Unit = {
    val (fs, base) = fsFor(spark, basePath)
    if (fs.exists(base)) fs.delete(base, true)
  }
}
