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
  * best-effort after each commit.
  *
  * Multi-writer safety (round-11 directive): same-table writers within
  * one JVM serialize on a lock, and writers in SEPARATE sessions/JVMs
  * serialize through OPTIMISTIC CONCURRENCY on the shared basePath —
  * a commit of version N is valid only against a read of committed
  * version N−1, and the right to write N is won by atomically creating
  * the claim marker `vN.claim` (`FileSystem.create` with
  * overwrite=false — create-fails-if-exists). A writer that loses the
  * claim, or that observes a claimed-but-uncommitted version in
  * flight, WAITS while the blocking claim is fresh (a healthy peer's
  * snapshot write just takes time), re-reads the now-newer committed
  * state, and retries the whole merge; once the blocking claim is
  * older than [[StaleClaimMs]] with no commit it FAILS LOUDLY (a
  * stale claim means a crashed or wedged peer — guessing would risk
  * the exact lost-version anomaly the protocol exists to prevent).
  * Either way a committed version is never overwritten and never
  * skips a predecessor's changes.
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

  /** How long a claimed-but-uncommitted version may block writers
    * before it is treated as WEDGED (crashed peer) and the merge fails
    * loudly. Freshness is the newest mtime among the blocker's markers
    * (claim file AND its partial snapshot dir — so deleting only one
    * of them cannot strand waiters in an un-ageable limbo): while the
    * blocker is younger than this, conflicting writers WAIT and
    * re-read (a healthy peer's snapshot write simply takes time —
    * seconds here, minutes at 100 TB; raise accordingly); once it is
    * older with no commit, waiting longer cannot help and writing
    * around it could lose a version, so the failure is immediate and
    * names everything to remove. Caveat for multi-HOST deployments:
    * the age compares this driver's clock against the store's mtime —
    * skew between them shifts the horizon, so keep it generously above
    * the worst clock skew + snapshot write time (a store-side
    * coordination primitive replaces this heuristic where one exists).
    */
  val StaleClaimMs: Long = 60000L

  /** Poll interval while waiting on a fresh in-flight claim. */
  private val ClaimPollMs = 200L

  /** Atomically claim the right to write version `v`: create-fails-if-
    * exists on the claim marker. Exactly one concurrent writer wins.
    *
    * On `file:` the claim goes through `File.createNewFile` — the
    * kernel's O_EXCL create. Hadoop's `LocalFileSystem.create(path,
    * overwrite = false)` is an exists() check followed by a create,
    * and the OCC race spec measurably hit that TOCTOU window (two
    * threads both "won" v1 and corrupted each other's `_temporary`
    * staging). On HDFS-like stores `create(overwrite = false)` is the
    * namenode's atomic exclusive create and is used as-is; an
    * eventually-consistent object store needs a real coordination
    * layer (DynamoDB-style lock / catalog CAS) plugged in here — the
    * seam is this one function.
    */
  private def tryClaim(spark: SparkSession, basePath: String, v: Long): Boolean = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) fs.mkdirs(base)
    val claim = new org.apache.hadoop.fs.Path(base, s"v$v.claim")
    if (Option(fs.getUri.getScheme).forall(_ == "file"))
      // Same lost-claim semantics as the HDFS branch: a transient IO
      // failure (deleted base dir racing a reset, EACCES) reads as
      // "didn't win", and the caller's wait/stale machinery decides.
      try new java.io.File(
        org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
          fs.makeQualified(claim)).toString).createNewFile()
      catch { case _: java.io.IOException => false }
    else
      try { fs.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** The latest-seq-wins reduction of stored state + one change batch. */
  private def mergedState(
      cur: Option[DataFrame], changes: DataFrame): DataFrame = {
    val asOps = changes.select(
      col("key").cast("long"), col("seq").cast("long"),
      col("op").cast("string"), col("value").cast("double"))
      .withColumn("is_current", lit(false))
    val unioned = cur match {
      case Some(c) => c.select(
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
    unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("seq").as("last_seq"),
        col("op").as("last_op"), col("value").as("current_value"))
  }

  /** Apply one change batch `(key, seq, op, value)` to `table`
    * (external parquet under `basePath`), creating it if absent.
    * `retainLast` is the post-commit retention: the newest `retainLast`
    * snapshot versions survive, older ones are pruned best-effort
    * (the default 2 keeps current + predecessor so etl23's audit diff
    * always has both sides; pass more to hold a deeper time-travel
    * window, then expire it explicitly with [[expireVersions]]).
    *
    * Commit protocol: optimistic concurrency (see the object doc). The
    * merged snapshot is computed against committed version B, version
    * B+1 is claimed atomically, the snapshot is fully materialized, and
    * the catalog flip is the local-session commit point (the on-disk
    * `_SUCCESS` is the cross-session one). A lost claim or an
    * in-flight gap waits-fresh / re-reads / retries; a stale blocking
    * claim throws.
    */
  /** Every set the commit loop needs from ONE base-dir listing
    * (committed versions, all snapshot-dir versions, claimed versions)
    * — the loop polls while blocked, and on object stores each listing
    * is a paid round-trip, so it lists once per iteration instead of
    * three times. Committed still costs one `_SUCCESS` probe per
    * version dir (the marker lives inside the dir).
    */
  private def listState(spark: SparkSession, basePath: String)
      : (Seq[Long], Seq[Long], Seq[Long]) = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) (Seq.empty, Seq.empty, Seq.empty)
    else {
      val entries = fs.listStatus(base).toSeq
      val dirs = entries
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
        .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
      val claims = entries
        .filter(s => s.isFile && s.getPath.getName.matches("v\\d+\\.claim"))
        .flatMap(_.getPath.getName.stripPrefix("v").stripSuffix(".claim").toLongOption)
      val committed = dirs.filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }.map(_._1)
      (committed.sorted, dirs.map(_._1).sorted, claims.sorted)
    }
  }

  def merge(spark: SparkSession, table: String, basePath: String,
      changes: DataFrame, retainLast: Int = 2): Unit = lockFor(table).synchronized {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    var committed = false
    while (!committed) {
      val (committedVs, dirVs, claimVs) = listState(spark, basePath)
      val next = ((dirVs ++ claimVs) :+ 0L).max + 1
      val base = committedVs.lastOption.getOrElse(0L)
      // Serializability gate: the version we'd write must DIRECTLY
      // succeed the committed state we read. A gap means another
      // writer's claim/write is in flight and its data is not yet
      // readable — wait for its commit, never write around it.
      if (next == base + 1) {
        val cur = committedVs.lastOption
          .map(v => spark.read.schema(schema).parquet(s"$basePath/v$v"))
          .orElse(
            if (spark.catalog.tableExists(table)) Some(spark.table(table))
            else None)
        if (tryClaim(spark, basePath, next)) {
          val newPath = s"$basePath/v$next"
          // Materialize BEFORE touching the catalog: the write streams
          // out of the current snapshot; _SUCCESS is the cross-session
          // commit, the catalog flip the local one.
          mergedState(cur, changes).write.mode("overwrite").parquet(newPath)
          spark.sql(s"DROP TABLE IF EXISTS $table")
          spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$newPath'")
          pruneOldVersions(spark, basePath,
            keepFloor = next - retainLast + 1)
          committed = true
        }
        // else: lost the claim race — the winner's claim shows up as a
        // gap on the next iteration and is waited on below.
      }
      if (!committed) {
        // Blocked by the OLDEST claimed-but-uncommitted version
        // (serialization reaches it first). Wait while the blocker is
        // FRESH — a healthy peer's snapshot write just takes time —
        // and fail loudly once it is STALE: no commit past
        // [[StaleClaimMs]] is a crashed/wedged peer, and writing
        // around it could lose a version. Freshness is the NEWEST
        // mtime across the blocker's claim file and partial snapshot
        // dir, so a half-done operator cleanup (claim deleted, partial
        // dir left — or vice versa) still ages out and reaches this
        // loud failure instead of stranding every writer in an
        // un-ageable poll loop. Progress is monotone: every wait ends
        // in the blocker's commit (the gate re-reads it), its markers
        // vanishing (immediate retry), or this loud failure.
        val blocker = base + 1
        val (fs, _) = fsFor(spark, basePath)
        val stamps = Seq(
          new org.apache.hadoop.fs.Path(basePath, s"v$blocker.claim"),
          new org.apache.hadoop.fs.Path(basePath, s"v$blocker")).flatMap { p =>
          try Some(fs.getFileStatus(p).getModificationTime)
          catch { case _: java.io.IOException => None }
        }
        if (stamps.nonEmpty) {
          val age = System.currentTimeMillis() - stamps.max
          if (age > StaleClaimMs)
            throw new IllegalStateException(
              s"merge into $basePath blocked: version v$blocker is claimed " +
                s"but not committed for ${age / 1000}s (> ${StaleClaimMs / 1000}s) " +
                "— a crashed or wedged writer. Resolve (delete its " +
                s"v$blocker.claim AND any partial v$blocker directory) " +
                "before retrying; committing around it could lose a version.")
          Thread.sleep(ClaimPollMs)
        } else {
          // Both markers vanished between the listing and the mtime
          // probe — usually the blocker just committed and the retry
          // will see it. But if the race repeats, each iteration costs
          // a full base-dir listing plus per-version _SUCCESS probes
          // (a hot spin on object stores), so poll-sleep here too: a
          // resolved blocker pays one ClaimPollMs, an adversarial race
          // stays bounded to one listing per poll interval.
          Thread.sleep(ClaimPollMs)
        }
      }
    }
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

  /** GDPR ERASURE across the time-travel surface (round-16 directive
    * #2): physically remove a key set from EVERY retained committed
    * snapshot, IN PLACE. The takedown story (cur24–27) reaches the
    * packed corpus, but retained snapshots still SERVE removed data at
    * older versions by design — immutability is the time-travel
    * guarantee, and it is exactly what a real erasure request must
    * break, deliberately and narrowly. The contract:
    *
    *  - version NUMBERS, the retained set, commit markers, and claim
    *    tombstones are untouched — `stateAt(v)` after the scrub equals
    *    `stateAt(v)` before MINUS the keys, for every retained v, and
    *    non-erased rows stay byte-identical (this is a CONTENT scrub
    *    of history, not a new version: appending "v4 without the keys"
    *    would leave v1..v3 serving the data the request erases);
    *  - ALL rows of an erased key go, tombstones included — a delete
    *    tombstone still carries the key, and the key itself is the
    *    personal datum;
    *  - consequence of full erasure, documented not hidden: the
    *    tombstone's resurrection guard goes with it, so a LATE change
    *    for an erased key would re-insert — a deployment keeps the
    *    erase list as an ingest-side filter (dedup12's gate shape),
    *    which is the standard GDPR posture (suppression list, not
    *    tombstone, because the tombstone is itself personal data).
    *
    * Physical protocol: per version, the survivors stream into
    * `vN.scrub` (a full parquet write with its own `_SUCCESS`), then
    * delete-old + rename — the snapshot is never half-rewritten in
    * place, and a crash between the two steps leaves either the old
    * intact dir or the complete scrubbed copy beside it (the `.scrub`
    * name parses as no version, so recovery ignores it and a re-run
    * converges). Same-JVM writers serialize on the table lock;
    * CROSS-PROCESS writers must be quiesced for the swap window (the
    * rename is not atomic against a concurrent reader's file listing
    * on an object store) — the coordination seam is the same one
    * tryClaim documents. The erase-key frame is request-sized →
    * broadcast anti-join per snapshot; each rewrite streams one
    * key-compact state copy, the price of erasing history.
    *
    * Returns the scrubbed (retained, committed) version numbers.
    */
  def scrubVersions(spark: SparkSession, table: String, basePath: String,
      keys: DataFrame): Seq[Long] = lockFor(table).synchronized {
    val (fs, base) = fsFor(spark, basePath)
    val committed = versionsOnDisk(spark, basePath, committedOnly = true)
    val k = broadcast(keys.select(col("key").cast("long").as("key")))
    committed.foreach { v =>
      val vPath = new org.apache.hadoop.fs.Path(base, s"v$v")
      val tmp = new org.apache.hadoop.fs.Path(base, s"v$v.scrub")
      spark.read.schema(schema).parquet(vPath.toString)
        .join(k, Seq("key"), "left_anti")
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.delete(vPath, true) || !fs.rename(tmp, vPath))
        throw new IllegalStateException(
          s"erasure scrub of $vPath failed at the swap — the scrubbed " +
            s"copy (if complete) is at $tmp; re-run to converge")
    }
    // The catalog table points at the latest version DIR (unchanged
    // path, new files) — drop any cached file listing.
    if (spark.catalog.tableExists(table)) spark.sql(s"REFRESH TABLE $table")
    committed
  }

  /** RAW snapshot rows of a committed version — tombstones INCLUDED
    * (unlike [[stateAt]]): the erasure audit must see every row that
    * carries a key, because the key itself is the personal datum.
    * Same loud-failure contract as [[stateAt]].
    */
  def snapshotRows(spark: SparkSession, basePath: String,
      version: Long): DataFrame = {
    val (fs, base) = fsFor(spark, basePath)
    val committedMarker =
      new org.apache.hadoop.fs.Path(base, s"v$version/_SUCCESS")
    if (!fs.exists(committedMarker)) {
      val committed = versionsOnDisk(spark, basePath, committedOnly = true)
      throw new NoSuchElementException(
        s"snapshot v$version is not committed under $basePath; " +
          s"retained versions: ${committed.mkString("[", ", ", "]")}")
    }
    spark.read.schema(schema).parquet(s"$basePath/v$version")
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

  /** Drop the table and all snapshot versions (and claim markers) — a
    * clean slate for a deterministic end-to-end replay. The ONLY path
    * that removes claim markers.
    */
  def reset(spark: SparkSession, table: String, basePath: String): Unit =
    lockFor(table).synchronized {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      pruneOldVersions(spark, basePath, keepFloor = Long.MaxValue,
        includeClaims = true)
    }

  /** Best-effort retention: delete snapshot dirs for versions STRICTLY
    * BELOW `keepFloor`. Floor-based on purpose — a concurrent writer
    * may already have claimed/written a version NEWER than this
    * writer's commit, and a keep-set prune would delete that in-flight
    * work; nothing above the floor is ever touched. Claim markers are
    * NEVER pruned by retention (`includeClaims` only for [[reset]]'s
    * full wipe): a claim is the DURABLE record that its version number
    * was used, and deleting it would let a writer that stalled before
    * claiming re-claim a pruned number and fork the lineage — the
    * zero-byte tombstones are the cost of the uniqueness guarantee
    * (the same reason real table formats keep their version log
    * forever).
    */
  private def pruneOldVersions(spark: SparkSession, basePath: String,
      keepFloor: Long, includeClaims: Boolean = false): Unit =
    try {
      val (fs, base) = fsFor(spark, basePath)
      if (fs.exists(base)) {
        fs.listStatus(base)
          .filter { s =>
            val n = s.getPath.getName
            val v =
              if (s.isDirectory && n.startsWith("v")) n.drop(1).toLongOption
              else if (includeClaims && s.isFile && n.matches("v\\d+\\.claim"))
                n.stripPrefix("v").stripSuffix(".claim").toLongOption
              else None
            v.exists(_ < keepFloor)
          }
          .foreach(s => fs.delete(s.getPath, true))
      }
    } catch { case _: Throwable => () } // best-effort retention
}
