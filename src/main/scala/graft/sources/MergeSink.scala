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
          // SUPPRESSION GATE (round-17 directive #1): drop change rows
          // whose key is on the published suppression list BEFORE they
          // can touch state, so a late or replayed batch can never
          // resurrect a scrubVersions-erased key (full erasure removes
          // even the delete tombstone — the key itself is the personal
          // datum — so the tombstone's resurrection guard is gone by
          // design and THIS gate is what replaces it). Resolved after
          // the claim is won, so a merge serialized behind a fenced
          // scrub reads the list that scrub just published. The list
          // is request-sized (an erasure ledger, not a data table) —
          // broadcast anti-join; with no list ever published the gate
          // is one existence probe.
          val gated = suppressionKeys(spark, basePath) match {
            case Some(s) => changes.join(broadcast(s),
              changes("key").cast("long") === s("key"), "left_anti")
            case None => changes
          }
          // Materialize BEFORE touching the catalog: the write streams
          // out of the current snapshot; _SUCCESS is the cross-session
          // commit, the catalog flip the local one.
          mergedState(cur, gated).write.mode("overwrite").parquet(newPath)
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
        awaitBlockerOrFailStale(spark, basePath, base + 1, "merge")
      }
    }
  }

  /** One wait step against the claimed-but-uncommitted `blocker`
    * version: sleep [[ClaimPollMs]] while the blocker is fresh, throw
    * once it is stale — factored from the merge loop so the scrub's
    * fence acquisition waits and fails by the identical rule.
    * Freshness is the NEWEST mtime across the blocker's claim file and
    * partial snapshot dir, so a half-done operator cleanup (claim
    * deleted, partial dir left — or vice versa) still ages out and
    * reaches the loud failure instead of stranding every writer in an
    * un-ageable poll loop. When BOTH markers vanished between the
    * caller's listing and the mtime probe the blocker usually just
    * committed — poll-sleep anyway so an adversarial vanish/reappear
    * race stays bounded to one listing per poll interval.
    */
  private def awaitBlockerOrFailStale(spark: SparkSession, basePath: String,
      blocker: Long, who: String): Unit = {
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
          s"$who into $basePath blocked: version v$blocker is claimed " +
            s"but not committed for ${age / 1000}s (> ${StaleClaimMs / 1000}s) " +
            "— a crashed or wedged writer. Resolve (delete its " +
            s"v$blocker.claim AND any partial v$blocker directory) " +
            "before retrying; committing around it could lose a version.")
    }
    Thread.sleep(ClaimPollMs)
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
    *  - full erasure removes even the delete tombstone (the key itself
    *    is the personal datum), so the tombstone's resurrection guard
    *    goes with it — the scrub therefore PUBLISHES the erase set to
    *    the table's cumulative SUPPRESSION LIST (a versioned artifact
    *    under `basePath/suppress`, CodebookStore's claim/_SUCCESS
    *    protocol) and every subsequent [[merge]] drops suppressed keys
    *    at ingest, so a late or replayed batch can never re-insert an
    *    erased key (round-17 directive #1 — the standard GDPR posture:
    *    suppression list, not tombstone, because the tombstone is
    *    itself personal data). The list is published BEFORE the first
    *    snapshot rewrite, so even a scrub that crashes mid-history
    *    already gates new ingest.
    *
    * Physical protocol: per version, the survivors stream into
    * `vN.scrub` (a full parquet write with its own `_SUCCESS`), then a
    * three-step swap that keeps a COMPLETE copy on disk at every
    * instant — rename `vN`→`vN.old`, rename `vN.scrub`→`vN`, delete
    * `vN.old` (the `.scrub`/`.old` names parse as no version, so
    * readers of the version list never see a half state). Every crash
    * point converges on re-run via [[recoverScrubOrphans]]: an orphan
    * `vN.scrub` beside an intact `vN` is discarded (that run re-scrubs
    * from the original); a committed `vN.scrub` with `vN` missing is
    * PROMOTED to `vN` (the privacy-safe direction — it is the complete
    * scrubbed copy); a leftover `vN.old` beside an intact `vN` is
    * deleted (the swap had completed). The old delete-then-rename
    * protocol could strand a version forever (crash after delete,
    * before rename — round-17 ADVICE); this one cannot.
    *
    * Cross-process coordination (round-17 directive #3): the scrub is
    * OCC-FENCED, not quiesce-required — it claims the next version
    * number exactly as a merge would (waiting on fresh in-flight
    * claims, failing loudly on stale ones), holds that claim across
    * every swap so no peer can commit a NEW version mid-scrub (the
    * serializability gate blocks them on the fence), and releases the
    * claim ON SUCCESS ONLY. Releasing then is safe precisely because
    * the fence never writes its version dir — the number was never
    * used for data, so no lineage can fork on its reuse. A scrub that
    * CRASHES or THROWS holding the fence leaves a claim that ages to
    * the same loud stale-writer failure a crashed merge does — kept
    * deliberately, because a mid-swap throw can leave the latest
    * version dir momentarily absent and an unfenced peer merge would
    * rebuild around it, losing a committed version; the documented
    * resolve (delete the claim, re-run) converges through the orphan
    * recovery.
    * Concurrent READERS of a version being swapped can still observe
    * the rename window on stores without atomic rename — snapshot
    * reads retry/fail loudly there; writers are fully fenced.
    *
    * The erase-key frame is request-sized → broadcast anti-join per
    * snapshot; each rewrite streams one key-compact state copy, the
    * price of erasing history.
    *
    * Returns the scrubbed (retained, committed) version numbers.
    */
  def scrubVersions(spark: SparkSession, table: String, basePath: String,
      keys: DataFrame): Seq[Long] = lockFor(table).synchronized {
    val (fs, base) = fsFor(spark, basePath)
    val eraseKeys = keys.select(col("key").cast("long").as("key")).distinct()
    // Recover BEFORE the fence as well as under it: a crash that left a
    // version dir missing (promoted-or-restorable orphans) also leaves
    // that version's claim outstanding, and the fence's serializability
    // gate would wait on it forever (then fail stale) — the orphan
    // itself is what un-wedges the gate. Unfenced recovery can race a
    // peer scrub's in-flight swap only in the instants its version dir
    // is absent; either racer then fails LOUDLY at its rename and the
    // re-run converges — never a silent half state.
    recoverScrubOrphans(spark, basePath)
    // Acquire the fence: claim the next version number under the same
    // serializability gate a merge uses, so the swap window can never
    // overlap a peer's commit.
    var fence = -1L
    while (fence < 0) {
      val (committedVs, dirVs, claimVs) = listState(spark, basePath)
      val next = ((dirVs ++ claimVs) :+ 0L).max + 1
      val baseV = committedVs.lastOption.getOrElse(0L)
      if (next == baseV + 1 && tryClaim(spark, basePath, next)) fence = next
      else awaitBlockerOrFailStale(spark, basePath, baseV + 1, "scrub")
    }
    locally {
      recoverScrubOrphans(spark, basePath)
      // Publish the cumulative suppression list FIRST: if the scrub
      // crashes mid-history, ingest is already gated while the re-run
      // converges the snapshots.
      val supDir = suppressDir(basePath)
      val cumulative = suppressionKeys(spark, basePath) match {
        case Some(prior) => prior.unionByName(eraseKeys).distinct()
        case None => eraseKeys
      }
      CodebookStore.publishFrame(spark, supDir, cumulative)
      val committed = versionsOnDisk(spark, basePath, committedOnly = true)
      val k = broadcast(eraseKeys)
      // Per-version rewrites are INDEPENDENT (each reads its own
      // immutable snapshot dir and swaps its own names; the fence —
      // not ordering between versions — is what excludes peer writers),
      // so they run concurrently from a small driver pool (guide §2.6):
      // the one-task write jobs of versions v2/v3 back-fill the
      // executors idling through v1's commit protocol, turning the
      // scrub's wall from Σ(per-version write+swap) into ~max(one
      // version) + pool overhead. Round-21 (the etl29/30 merge family
      // is commit-protocol-bound; this is its only parallelizable leg).
      // Failure semantics unchanged: any leg's swap failure (or torn
      // write) propagates as the same loud exception, every completed
      // or half-done leg converges on re-run via recoverScrubOrphans —
      // the crash-point analysis is per version, so concurrency adds no
      // new crash states.
      val scrubPool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(committed.size, 4)))
      try {
        committed.map { v =>
          scrubPool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = {
              val vPath = new org.apache.hadoop.fs.Path(base, s"v$v")
              val tmp = new org.apache.hadoop.fs.Path(base, s"v$v.scrub")
              val old = new org.apache.hadoop.fs.Path(base, s"v$v.old")
              spark.read.schema(schema).parquet(vPath.toString)
                .join(k, Seq("key"), "left_anti")
                .write.mode("overwrite").parquet(tmp.toString)
              // Three-step swap: a complete copy of the version exists
              // under a recoverable name at every instant (vN, then
              // vN.old+vN.scrub, then vN) — recoverScrubOrphans
              // converges every crash point.
              if (!fs.rename(vPath, old) || !fs.rename(tmp, vPath))
                throw new IllegalStateException(
                  s"erasure scrub of $vPath failed at the swap — a complete " +
                    s"copy remains at $old or $tmp; re-run to converge " +
                    "(recovery promotes or discards the orphans)")
              fs.delete(old, true)
              ()
            }
          })
        }.foreach { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
          }
        }
      } finally scrubPool.shutdown()
      // The catalog table points at the latest version DIR (unchanged
      // path, new files) — drop any cached file listing.
      if (spark.catalog.tableExists(table)) spark.sql(s"REFRESH TABLE $table")
      // Release the fence ON SUCCESS ONLY. Never reached a snapshot
      // write at vFence, so reuse of the number cannot fork lineage.
      // On an exception the claim is deliberately KEPT: a throw
      // mid-swap can leave the latest version dir absent (complete
      // copies survive under vN.old/vN.scrub), and releasing the fence
      // there would let a peer merge pass the serializability gate,
      // claim vFence, and rebuild state from v(N-1) WITHOUT batch N —
      // after which orphan recovery deletes the only complete copy:
      // silent permanent loss of a committed version (round-18
      // ADVICE). Holding the claim makes peers block and age to the
      // loud stale-claim failure, whose documented resolve (delete the
      // claim, re-run) converges through recoverScrubOrphans.
      // Loud-failure discipline (round-19 ADVICE): a silently failed
      // delete would leave a stale claim that blocks every later
      // writer until StaleClaimMs and then reads as a crashed scrub.
      val fenceClaim = new org.apache.hadoop.fs.Path(base, s"v$fence.claim")
      if (!fs.delete(fenceClaim, false) && fs.exists(fenceClaim))
        throw new IllegalStateException(
          s"scrub completed but failed to release its fence claim " +
            s"$fenceClaim — later writers would block and misdiagnose " +
            "a crashed scrub; delete the claim manually")
      committed
    }
  }

  /** Converge any crash state a prior scrub's swap left behind — run
    * on scrub entry, under the fence. Per orphan:
    *  - `vN.scrub` with `vN` INTACT → the crash hit before the first
    *    rename; the orphan may be stale (an older erase set), so it is
    *    discarded and this run re-scrubs from the original;
    *  - `vN` MISSING with a COMMITTED (`_SUCCESS`) `vN.scrub` → the
    *    crash hit between the renames; the scrubbed copy is promoted
    *    to `vN` (privacy-safe: it is complete and already erased), and
    *    any `vN.old` beside it is deleted;
    *  - `vN` MISSING with only `vN.old` (no committed scrub) → the
    *    scrub write itself was torn; the original is restored so the
    *    version is never lost, and this run re-scrubs it;
    *  - `vN.old` beside an INTACT `vN` → the crash hit after the
    *    second rename; the swap had completed, the old copy (still
    *    carrying erased keys) is deleted.
    */
  private def recoverScrubOrphans(spark: SparkSession, basePath: String): Unit = {
    val (fs, base) = fsFor(spark, basePath)
    if (!fs.exists(base)) return
    val names = fs.listStatus(base).filter(_.isDirectory)
      .map(_.getPath.getName).toSet
    val orphanVs = names.collect {
      case n if n.startsWith("v") && (n.endsWith(".scrub") || n.endsWith(".old")) =>
        n.drop(1).takeWhile(_.isDigit).toLongOption
    }.flatten
    orphanVs.foreach { v =>
      val vPath = new org.apache.hadoop.fs.Path(base, s"v$v")
      val tmp = new org.apache.hadoop.fs.Path(base, s"v$v.scrub")
      val old = new org.apache.hadoop.fs.Path(base, s"v$v.old")
      val scrubCommitted =
        fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
      if (!fs.exists(vPath)) {
        // Loud-failure discipline (round-18 ADVICE): a silent failed
        // promote/restore would leave the version missing, and the
        // caller's committedOnly listing would then simply SKIP it —
        // success reported with a version absent. Same contract as the
        // swap path's rename check.
        if (scrubCommitted) {
          if (!fs.rename(tmp, vPath)) throw new IllegalStateException(
            s"scrub recovery failed to promote $tmp to $vPath — the " +
              "complete scrubbed copy remains; resolve the store error " +
              "and re-run")
          fs.delete(old, true)
        } else if (fs.exists(old)) {
          if (!fs.rename(old, vPath)) throw new IllegalStateException(
            s"scrub recovery failed to restore $old to $vPath — the " +
              "complete original remains; resolve the store error and " +
              "re-run")
          fs.delete(tmp, true)
        }
      } else {
        fs.delete(tmp, true); fs.delete(old, true)
      }
    }
  }

  /** The table's cumulative suppression-list store (versioned artifact
    * dir under basePath — the name parses as no snapshot version, so
    * the version listing never sees it).
    */
  private def suppressDir(basePath: String): String = s"$basePath/suppress"

  /** Retention for the suppression ledger (round-18 directive #5):
    * keep the newest `keepLast` committed ledger versions, expire the
    * rest, return the expired numbers. Safe by construction — each
    * scrub publishes the CUMULATIVE erase set (prior ∪ new,
    * [[scrubVersions]]), so every older version is a strict subset of
    * the newest and the ingest gate (which resolves only the latest
    * committed version via [[suppressionKeys]]) is IDENTICAL after
    * expiry. The current version is inexpirable (`keepLast >= 1`,
    * refused loudly); expired reads fail loudly in
    * CodebookStore.frameAt.
    */
  def expireSuppressionVersions(spark: SparkSession, basePath: String,
      keepLast: Int): Seq[Long] =
    CodebookStore.expireVersions(spark, suppressDir(basePath), keepLast)

  /** The current (newest committed) cumulative suppression list, if
    * any erasure has ever been executed against this table — one
    * `key: long` column. Exposed so audits can measure the gate.
    */
  def suppressionKeys(spark: SparkSession, basePath: String): Option[DataFrame] =
    CodebookStore.latest(spark, suppressDir(basePath)).map { v =>
      CodebookStore.frameAt(spark, suppressDir(basePath), v)
        .select(col("key").cast("long").as("key"))
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

  /** Drop the table and all snapshot versions (and claim markers, and
    * the suppression-list store, and any scrub-swap orphans) — a clean
    * slate for a deterministic end-to-end replay. The ONLY path that
    * removes claim markers.
    */
  def reset(spark: SparkSession, table: String, basePath: String): Unit =
    lockFor(table).synchronized {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      pruneOldVersions(spark, basePath, keepFloor = Long.MaxValue,
        includeClaims = true)
      val (fs, base) = fsFor(spark, basePath)
      if (fs.exists(base)) {
        fs.delete(new org.apache.hadoop.fs.Path(base, "suppress"), true)
        fs.listStatus(base)
          .filter { s =>
            val n = s.getPath.getName
            s.isDirectory && n.startsWith("v") &&
              (n.endsWith(".scrub") || n.endsWith(".old"))
          }
          .foreach(s => fs.delete(s.getPath, true))
      }
      ()
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
