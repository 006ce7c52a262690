package graft.sources

import scala.concurrent.duration._
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkSpec
import graft.operators.Etl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSinkSpec extends SparkSpec {

  private def snapshot(df: DataFrame): Seq[(Long, Long, String, Option[Double])] =
    df.select("key", "last_seq", "last_op", "current_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(t => (t._1, t._2)).toSeq

  private def freshTable(tag: String): (String, String) = {
    val table = s"g_mergesink_spec_$tag"
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mergesink_spec_$tag"
    MergeSink.reset(spark, table, base)
    (table, base)
  }

  import spark.implicits._

  private def ops(rows: (Long, Long, String, Double)*): DataFrame =
    rows.toSeq.toDF("key", "seq", "op", "value")

  test("replaying a batch is a no-op (restart idempotence)") {
    val (table, base) = freshTable("replay")
    val batch = ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0), (1L, 12L, "U", 3.0))
    MergeSink.merge(spark, table, base, batch)
    val once = snapshot(spark.table(table))
    MergeSink.merge(spark, table, base, batch)
    assert(snapshot(spark.table(table)) == once)
  }

  test("older ops cannot overwrite newer state (high-water-mark)") {
    val (table, base) = freshTable("hwm")
    MergeSink.merge(spark, table, base, ops((1L, 20L, "U", 9.0)))
    MergeSink.merge(spark, table, base, ops((1L, 10L, "I", 1.0)))
    assert(snapshot(spark.table(table)) == Seq((1L, 20L, "U", Some(9.0))))
  }

  test("an EQUAL-sequence change cannot overwrite stored state") {
    val (table, base) = freshTable("eqseq")
    MergeSink.merge(spark, table, base, ops((1L, 10L, "U", 9.0)))
    // Same sequence, different op/value — the stored row must win
    // ("at-or-below the stored sequence loses"), even though 'D' sorts
    // before 'U' alphabetically.
    MergeSink.merge(spark, table, base, ops((1L, 10L, "D", 0.0)))
    assert(snapshot(spark.table(table)) == Seq((1L, 10L, "U", Some(9.0))))
  }

  test("a restarted driver recovers state from the latest committed snapshot") {
    val (table, base) = freshTable("restart")
    MergeSink.merge(spark, table, base, ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0)))
    val committed = snapshot(spark.table(table))
    // Simulate a driver restart with a non-persistent catalog: the
    // table entry is gone but the snapshot directories survive.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    MergeSink.merge(spark, table, base, ops((2L, 20L, "U", 5.0)))
    assert(snapshot(spark.table(table)) ==
      Seq((1L, 10L, "I", Some(1.0)), (2L, 20L, "U", Some(5.0))),
      s"recovery must resume from $committed, not start empty")
  }

  test("delete tombstones survive and block resurrection by older ops") {
    val (table, base) = freshTable("tomb")
    MergeSink.merge(spark, table, base, ops((1L, 20L, "D", 0.0)))
    // A late-arriving OLDER insert must not bring the key back.
    MergeSink.merge(spark, table, base, ops((1L, 15L, "I", 5.0)))
    assert(MergeSink.state(spark, table).count() == 0)
    // ...but a genuinely newer insert does.
    MergeSink.merge(spark, table, base, ops((1L, 25L, "I", 7.0)))
    assert(snapshot(MergeSink.state(spark, table)) == Seq((1L, 25L, "I", Some(7.0))))
  }

  test("merge order across batches does not change the final state") {
    val log = Etl.cdcLog(spark, sf)
    val b1 = log.filter(col("seq") % 2 === 0)
    val b2 = log.filter(col("seq") % 2 =!= 0)
    val (t12, base12) = freshTable("order12")
    MergeSink.merge(spark, t12, base12, b1)
    MergeSink.merge(spark, t12, base12, b2)
    val (t21, base21) = freshTable("order21")
    MergeSink.merge(spark, t21, base21, b2)
    MergeSink.merge(spark, t21, base21, b1)
    assert(snapshot(spark.table(t12)) == snapshot(spark.table(t21)))
  }

  test("concurrent appliers serialize per table and lose no batch") {
    val log = Etl.cdcLog(spark, sf)
    val batches = (0 until 4).map(i => log.filter(col("seq") % 4 === i))
    val (table, base) = freshTable("conc")
    val applies = batches.map(b => Future(MergeSink.merge(spark, table, base, b)))
    Await.result(Future.sequence(applies), 5.minutes)
    // One-shot reduction over the full log (etl16 semantics, with
    // tombstones retained) must match whatever interleaving won.
    val (oneShot, baseOne) = freshTable("oneshot")
    MergeSink.merge(spark, oneShot, baseOne, log)
    assert(snapshot(spark.table(table)) == snapshot(spark.table(oneShot)))
  }

  test("two SESSIONS (separate catalogs) racing one basePath lose no version (OCC)") {
    // Two table names = two catalog entries = two JVM lock keys, so the
    // JVM-local lock CANNOT serialize them — simulating two Spark
    // sessions; only the on-disk claim protocol stands between the
    // racers and a lost version. Four disjoint-key batches race from
    // the two "sessions"; every batch must survive into the final
    // state, and every intermediate version must contain its
    // predecessor's keys (the lost-update anomaly is a version that
    // skips one).
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mergesink_spec_occ"
    val tA = "g_mergesink_spec_occ_a"
    val tB = "g_mergesink_spec_occ_b"
    MergeSink.reset(spark, tA, base)
    MergeSink.reset(spark, tB, base)
    val merges = (0 until 4).map { i =>
      val t = if (i % 2 == 0) tA else tB
      Future(MergeSink.merge(spark, t, base,
        ops((i.toLong, (10 + i).toLong, "I", i.toDouble)), retainLast = 8))
    }
    Await.result(Future.sequence(merges), 5.minutes)
    val vs = MergeSink.versions(spark, base)
    assert(vs == Seq(1L, 2L, 3L, 4L),
      s"4 racing merges must commit 4 gap-free versions, got $vs")
    val keySets = vs.map(v =>
      snapshot(MergeSink.stateAt(spark, base, v)).map(_._1).toSet)
    keySets.sliding(2).foreach { case Seq(prev, next) =>
      assert(prev.subsetOf(next),
        s"version skipped a predecessor's keys: $prev not in $next")
    }
    assert(keySets.last == Set(0L, 1L, 2L, 3L),
      s"a racing batch was lost: ${keySets.last}")
  }

  test("a claimed-but-never-committed version fails merges loudly, never writes around") {
    val (table, base) = freshTable("staleclaim")
    MergeSink.merge(spark, table, base, ops((1L, 1L, "I", 1.0)))
    // Simulate a crashed peer: claim v2, never commit it, and age the
    // claim past the staleness horizon (a FRESH claim would make the
    // merge wait for the "in-flight" peer — the correct behavior —
    // so the spec ages the marker instead of sleeping 60s).
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(base, "v2.claim"), false).close()
    assert(new java.io.File(s"$base/v2.claim")
      .setLastModified(System.currentTimeMillis() - MergeSink.StaleClaimMs - 60000L))
    val e = intercept[IllegalStateException](
      MergeSink.merge(spark, table, base, ops((2L, 2L, "I", 2.0))))
    assert(e.getMessage.contains("claimed but not committed"))
    // The loud failure wrote NOTHING: committed state untouched, no v3
    // "around" the wedged claim.
    assert(MergeSink.versions(spark, base) == Seq(1L))
    // Operator resolution (delete the stale claim) unblocks the merge.
    fs.delete(new org.apache.hadoop.fs.Path(base, "v2.claim"), false)
    MergeSink.merge(spark, table, base, ops((2L, 2L, "I", 2.0)))
    assert(snapshot(spark.table(table)) ==
      Seq((1L, 1L, "I", Some(1.0)), (2L, 2L, "I", Some(2.0))))
  }

  test("retention never prunes claim markers; version numbers are never reused") {
    val (table, base) = freshTable("claimdur")
    (1 to 3).foreach(i => MergeSink.merge(spark, table, base,
      ops((i.toLong, i.toLong, "I", i.toDouble)), retainLast = 1))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // retainLast=1 pruned the v1/v2 snapshot dirs — but every claim
    // tombstone survives: it is the durable record that its number was
    // used, so a writer that stalled before claiming can never re-claim
    // a pruned number and fork the lineage.
    (1 to 3).foreach { v =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(base, s"v$v.claim")),
        s"claim v$v must survive retention")
    }
    assert(MergeSink.versions(spark, base) == Seq(3L))
    MergeSink.merge(spark, table, base, ops((9L, 9L, "I", 9.0)), retainLast = 1)
    assert(MergeSink.versions(spark, base) == Seq(4L),
      "the next commit must take a FRESH number, never a pruned one")
  }

  test("a half-cleaned wedged writer (partial dir, no claim) still ages out loudly") {
    val (table, base) = freshTable("halfclean")
    MergeSink.merge(spark, table, base, ops((1L, 1L, "I", 1.0)))
    // A crashed peer's partial v2 snapshot whose claim was already
    // removed: without dir-mtime aging this state would strand every
    // writer in an un-ageable poll loop (the review's finding).
    val dir = new java.io.File(s"$base/v2")
    assert(dir.mkdirs())
    assert(dir.setLastModified(
      System.currentTimeMillis() - MergeSink.StaleClaimMs - 60000L))
    val e = intercept[IllegalStateException](
      MergeSink.merge(spark, table, base, ops((2L, 2L, "I", 2.0))))
    assert(e.getMessage.contains("partial v2 directory"),
      s"failure must name the partial dir too: ${e.getMessage}")
    // Full cleanup unblocks; the number is reused safely because the
    // partial dir (the only marker) is gone.
    assert(dir.delete())
    MergeSink.merge(spark, table, base, ops((2L, 2L, "I", 2.0)))
    assert(MergeSink.versions(spark, base).last == 2L)
    assert(snapshot(spark.table(table)) ==
      Seq((1L, 1L, "I", Some(1.0)), (2L, 2L, "I", Some(2.0))))
  }

  test("etl19 equals the one-shot CDC reduction (etl16)") {
    val viaSink = Etl.etl19MergeSink(spark, sf)
      .collect().map(_.toSeq).toSeq
    val oneShot = Etl.etl16CdcApply(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaSink == oneShot)
  }

  test("expireVersions keeps the newest snapshots intact, expired reads fail loudly") {
    val (table, base) = freshTable("vacuum")
    MergeSink.merge(spark, table, base, ops((1L, 1L, "I", 1.0)), retainLast = 3)
    MergeSink.merge(spark, table, base, ops((2L, 2L, "I", 2.0)), retainLast = 3)
    MergeSink.merge(spark, table, base, ops((1L, 3L, "U", 9.0)), retainLast = 3)
    assert(MergeSink.versions(spark, base) == Seq(1L, 2L, 3L))
    val v2Before = snapshot(MergeSink.stateAt(spark, base, 2L))

    val expired = MergeSink.expireVersions(spark, base, keepLast = 2)
    assert(expired == Seq(1L))
    assert(MergeSink.versions(spark, base) == Seq(2L, 3L))
    // Retained snapshots are immutable: the VACUUM must not have
    // rewritten the survivors.
    assert(snapshot(MergeSink.stateAt(spark, base, 2L)) == v2Before)
    assert(snapshot(MergeSink.stateAt(spark, base, 3L)) ==
      Seq((1L, 3L, "U", Some(9.0)), (2L, 2L, "I", Some(2.0))))
    // Time travel past the horizon is a loud error, never empty data.
    val e = intercept[NoSuchElementException](
      MergeSink.stateAt(spark, base, 1L))
    assert(e.getMessage.contains("v1") && e.getMessage.contains("[2, 3]"))
  }

  test("the current version can never be expired; VACUUM is idempotent") {
    val (table, base) = freshTable("vacuum_cur")
    MergeSink.merge(spark, table, base, ops((1L, 1L, "I", 1.0)), retainLast = 2)
    MergeSink.merge(spark, table, base, ops((2L, 2L, "I", 2.0)), retainLast = 2)
    intercept[IllegalArgumentException](
      MergeSink.expireVersions(spark, base, keepLast = 0))
    // keepLast = 1 retains exactly the current version; the live table
    // keeps reading through the catalog.
    assert(MergeSink.expireVersions(spark, base, keepLast = 1) == Seq(1L))
    assert(MergeSink.versions(spark, base) == Seq(2L))
    assert(snapshot(MergeSink.state(spark, table)) ==
      Seq((1L, 1L, "I", Some(1.0)), (2L, 2L, "I", Some(2.0))))
    // Re-running the VACUUM expires nothing further.
    assert(MergeSink.expireVersions(spark, base, keepLast = 1).isEmpty)
    // Invalid merge retention refuses too.
    intercept[IllegalArgumentException](
      MergeSink.merge(spark, table, base, ops((3L, 3L, "I", 3.0)), retainLast = 0))
  }

  test("snapshot scrub: erased keys vanish from every retained version; survivors byte-identical") {
    val (table, base) = freshTable("scrub")
    // Three merges under retainLast=3 → v1..v3 all retained. Key 2
    // carries a DELETE tombstone from v2 on (the tombstone-removal
    // law: a tombstone still carries the key); key 3 stays live.
    MergeSink.merge(spark, table, base,
      ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0), (3L, 12L, "I", 3.0)),
      retainLast = 3)
    MergeSink.merge(spark, table, base,
      ops((1L, 20L, "U", 1.5), (4L, 21L, "I", 4.0), (2L, 22L, "D", 0.0)),
      retainLast = 3)
    MergeSink.merge(spark, table, base,
      ops((5L, 30L, "I", 5.0), (3L, 31L, "U", 3.5)), retainLast = 3)
    val vs = MergeSink.versions(spark, base)
    assert(vs == Seq(1L, 2L, 3L))
    val preVisible = vs.map(v =>
      v -> snapshot(MergeSink.stateAt(spark, base, v))).toMap
    val preRaw = vs.map(v =>
      v -> snapshot(MergeSink.snapshotRows(spark, base, v))).toMap
    val erase = Set(2L, 3L)
    val scrubbed = MergeSink.scrubVersions(spark, table, base,
      erase.toSeq.toDF("key"))
    assert(scrubbed == vs, "every retained committed version is scrubbed")
    // Version NUMBERS and commit markers unchanged — the time-travel
    // surface keeps its shape, only its content loses the keys.
    assert(MergeSink.versions(spark, base) == vs)
    vs.foreach { v =>
      // stateAt(v) after == stateAt(v) before MINUS the keys, with
      // non-erased rows byte-identical (the directive's replayed-read
      // law), and the RAW rows (tombstones included) carry no erased
      // key anywhere in history.
      assert(snapshot(MergeSink.stateAt(spark, base, v)) ==
        preVisible(v).filterNot(r => erase(r._1)), s"v$v visible state")
      assert(snapshot(MergeSink.snapshotRows(spark, base, v)) ==
        preRaw(v).filterNot(r => erase(r._1)), s"v$v raw rows")
    }
    // Key 2's tombstone really existed pre-scrub (the arm is not
    // vacuous) and is gone post-scrub.
    assert(preRaw(3L).exists(r => r._1 == 2L && r._3 == "D"))
    // The CURRENT catalog read reflects the scrub (file-listing cache
    // dropped), and the OCC protocol continues: a post-scrub merge
    // commits v4 and retention behaves normally.
    assert(!snapshot(MergeSink.state(spark, table)).exists(r => erase(r._1)))
    MergeSink.merge(spark, table, base, ops((6L, 40L, "I", 6.0)),
      retainLast = 3)
    assert(MergeSink.versions(spark, base) == Seq(2L, 3L, 4L))
    assert(snapshot(MergeSink.state(spark, table))
      .exists(r => r._1 == 6L), "post-scrub merge lands")
  }

  private def hadoopFs(base: String) = {
    val p = new org.apache.hadoop.fs.Path(base)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("suppression gate: a late batch can never resurrect an erased key — and the threat is real without it") {
    val (table, base) = freshTable("suppress")
    MergeSink.merge(spark, table, base,
      ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0), (3L, 12L, "D", 0.0)))
    // Contrast arm FIRST (no scrub yet → no suppression list): a late
    // higher-seq update resurrects the TOMBSTONED key 3 — tombstones
    // only guard OLDER arrivals, which is exactly why erasure needs a
    // different guard.
    MergeSink.merge(spark, table, base, ops((3L, 20L, "U", 3.5)))
    assert(snapshot(MergeSink.state(spark, table)).exists(_._1 == 3L),
      "without suppression the late update must land (the threat is real)")
    // Erase keys 2 and 3 across history; the scrub publishes them to
    // the suppression list.
    MergeSink.scrubVersions(spark, table, base, ops((2L, 0L, "X", 0.0))
      .select("key").union(ops((3L, 0L, "X", 0.0)).select("key")))
    assert(MergeSink.suppressionKeys(spark, base).map(snapshotKeys)
      .contains(Set(2L, 3L)))
    // The resurrection attempt: a REPLAYED/late batch re-sends every
    // key far above the high-water mark. Suppressed keys must be
    // dropped at ingest; the legitimate key-1 update must land.
    MergeSink.merge(spark, table, base,
      ops((1L, 100L, "U", 1.5), (2L, 101L, "U", 2.5), (3L, 102L, "I", 3.9)))
    val fin = snapshot(MergeSink.state(spark, table))
    assert(!fin.exists(r => r._1 == 2L || r._1 == 3L),
      s"erased keys resurrected: $fin")
    assert(fin.contains((1L, 100L, "U", Some(1.5))),
      "the gate must be narrow — non-suppressed late rows merge normally")
    // Set algebra: a second scrub ACCUMULATES (K1 ∪ K2), it does not
    // replace the list.
    MergeSink.scrubVersions(spark, table, base, ops((1L, 0L, "X", 0.0)).select("key"))
    assert(MergeSink.suppressionKeys(spark, base).map(snapshotKeys)
      .contains(Set(1L, 2L, 3L)))
    MergeSink.merge(spark, table, base, ops((1L, 200L, "U", 9.9)))
    assert(snapshot(MergeSink.state(spark, table)).isEmpty,
      "all three keys suppressed — the cumulative list gates them all")
  }

  private def snapshotKeys(df: DataFrame): Set[Long] =
    df.select("key").collect().map(_.getLong(0)).toSet

  test("suppression-ledger retention: old versions expire, the gate is identical, expired reads fail loudly") {
    val (table, base) = freshTable("supretain")
    MergeSink.merge(spark, table, base,
      ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0), (3L, 12L, "I", 3.0)))
    // Two scrubs → two ledger versions, each CUMULATIVE (v2 ⊇ v1), so
    // v1 is strictly redundant to the gate by construction.
    MergeSink.scrubVersions(spark, table, base, ops((2L, 0L, "X", 0.0)).select("key"))
    MergeSink.scrubVersions(spark, table, base, ops((3L, 0L, "X", 0.0)).select("key"))
    val supDir = s"$base/suppress"
    assert(CodebookStore.versions(spark, supDir) == Seq(1L, 2L))
    // Retention floor (round-18 directive #5): keep the newest only.
    assert(MergeSink.expireSuppressionVersions(spark, base, keepLast = 1)
      == Seq(1L))
    assert(CodebookStore.versions(spark, supDir) == Seq(2L))
    // GATE IDENTICAL after expiry — the late replay still cannot
    // resurrect EITHER scrub's keys (v2 carries the cumulative set).
    MergeSink.merge(spark, table, base,
      ops((1L, 100L, "U", 1.5), (2L, 101L, "U", 2.5), (3L, 102L, "U", 3.5)))
    val fin = snapshot(MergeSink.state(spark, table))
    assert(!fin.exists(r => r._1 == 2L || r._1 == 3L),
      s"expiry weakened the gate: $fin")
    assert(fin.contains((1L, 100L, "U", Some(1.5))))
    // Expired reads fail loudly; the current version is inexpirable.
    val ex = intercept[NoSuchElementException](
      CodebookStore.frameAt(spark, supDir, 1L))
    assert(ex.getMessage.contains("v1"))
    intercept[IllegalArgumentException](
      MergeSink.expireSuppressionVersions(spark, base, keepLast = 0))
    // Idempotent: nothing left below the floor.
    assert(MergeSink.expireSuppressionVersions(spark, base, keepLast = 1).isEmpty)
  }

  test("a scrub that throws holding the fence KEEPS its claim — peers age to the loud stale failure, never commit around a swap window") {
    val (table, base) = freshTable("fencehold")
    MergeSink.merge(spark, table, base, ops((1L, 10L, "I", 1.0)))
    // Inject a failure INSIDE the fenced block: the erase-key frame
    // evaluates during the ledger publish (the first fenced action)
    // and throws. The round-18 ADVICE scenario this pins: if the fence
    // were released here (the old `finally`), a mid-swap crash state
    // with the latest version dir absent would let a peer merge pass
    // the serializability gate, rebuild v_N from v_{N-1} without batch
    // N, and the next orphan recovery would then delete the only
    // complete copy — silent loss of a committed version.
    val boom = udf((k: Long) =>
      if (k >= 0) throw new RuntimeException("injected scrub failure")
      else k)
    intercept[Exception](MergeSink.scrubVersions(spark, table, base,
      ops((1L, 0L, "X", 0.0)).select(boom(col("key")).as("key"))))
    val (fs, _) = hadoopFs(base)
    val fenceClaim = new org.apache.hadoop.fs.Path(base, "v2.claim")
    assert(fs.exists(fenceClaim),
      "the fence claim must survive a throw inside the fenced block")
    // A peer merge BLOCKS behind the held fence and, once the claim is
    // stale, fails loudly naming it — it must never commit v2.
    fs.setTimes(fenceClaim,
      System.currentTimeMillis() - MergeSink.StaleClaimMs - 5000, -1)
    val ex = intercept[IllegalStateException](
      MergeSink.merge(spark, table, base, ops((5L, 30L, "I", 5.0))))
    assert(ex.getMessage.contains("v2"))
    assert(MergeSink.versions(spark, base) == Seq(1L),
      "no peer may commit around a crashed scrub's fence")
    // The documented resolve: delete the claim, re-run — everything
    // converges and normal service resumes.
    fs.delete(fenceClaim, false)
    val scrubbed = MergeSink.scrubVersions(spark, table, base,
      ops((1L, 0L, "X", 0.0)).select("key"))
    assert(scrubbed == Seq(1L))
    MergeSink.merge(spark, table, base, ops((5L, 30L, "I", 5.0)))
    // The re-run scrub released its fence on success, so the number is
    // reusable (it never held data) and the merge commits v2.
    assert(MergeSink.versions(spark, base).last == 2L)
    assert(snapshot(MergeSink.state(spark, table))
      .contains((5L, 30L, "I", Some(5.0))))
  }

  test("scrub swap crash states all converge on re-run (no version is ever lost)") {
    val (table, base) = freshTable("scrubcrash")
    MergeSink.merge(spark, table, base,
      ops((1L, 10L, "I", 1.0), (2L, 11L, "I", 2.0)), retainLast = 3)
    MergeSink.merge(spark, table, base, ops((3L, 20L, "I", 3.0)), retainLast = 3)
    val erase = ops((2L, 0L, "X", 0.0)).select("key")
    val (fs, _) = hadoopFs(base)
    def p(n: String) = new org.apache.hadoop.fs.Path(base, n)
    // Crash state (b), the round-17 ADVICE hole: the old protocol's
    // delete succeeded, the rename didn't — only a COMMITTED v1.scrub
    // remains (manufacture: scrub-write v1's survivors to v1.scrub,
    // then move v1 away wholesale as the "deleted" original).
    spark.read.schema(MergeSink.schema).parquet(s"$base/v1")
      .join(erase, Seq("key"), "left_anti")
      .write.mode("overwrite").parquet(s"$base/v1.scrub")
    assert(fs.rename(p("v1"), p("v1.old")), "manufacture old-dir")
    // v1 is now missing entirely from the committed listing.
    assert(MergeSink.versions(spark, base) == Seq(2L))
    // Re-running the scrub must FIRST recover v1 (promote the
    // committed scrubbed copy), then scrub everything — the version
    // set is unchanged and stateAt(1) works again.
    val scrubbed = MergeSink.scrubVersions(spark, table, base, erase)
    assert(scrubbed == Seq(1L, 2L))
    assert(MergeSink.versions(spark, base) == Seq(1L, 2L))
    assert(snapshot(MergeSink.stateAt(spark, base, 1L)) ==
      Seq((1L, 10L, "I", Some(1.0))), "v1 recovered, erased key gone")
    assert(!fs.exists(p("v1.old")) && !fs.exists(p("v1.scrub")),
      "orphans cleaned")
    // Crash state (a): a leftover .scrub beside an INTACT version is
    // discarded and re-derived; crash state (c): a leftover .old
    // beside an intact version is deleted. Junk dirs exercise both
    // paths — recovery must remove them without touching v2.
    fs.mkdirs(p("v2.scrub"))
    fs.mkdirs(p("v2.old"))
    val again = MergeSink.scrubVersions(spark, table, base, erase)
    assert(again == Seq(1L, 2L))
    assert(!fs.exists(p("v2.scrub")) && !fs.exists(p("v2.old")))
    assert(snapshot(MergeSink.stateAt(spark, base, 2L)) ==
      Seq((1L, 10L, "I", Some(1.0)), (3L, 20L, "I", Some(3.0))))
    // Torn-scrub state: version dir missing, NO committed scrub, only
    // the .old copy — the original must be restored, never lost.
    assert(fs.rename(p("v2"), p("v2.old")))
    fs.mkdirs(p("v2.scrub")) // uncommitted (no _SUCCESS)
    MergeSink.scrubVersions(spark, table, base, erase)
    assert(snapshot(MergeSink.stateAt(spark, base, 2L)) ==
      Seq((1L, 10L, "I", Some(1.0)), (3L, 20L, "I", Some(3.0))),
      "torn scrub restores the original")
  }

  test("the scrub is OCC-fenced: it waits on a fresh in-flight claim, fails loudly on a stale one, and releases its fence") {
    val (table, base) = freshTable("scrubfence")
    MergeSink.merge(spark, table, base, ops((1L, 10L, "I", 1.0)))
    val (fs, _) = hadoopFs(base)
    def claim(v: Long) = new org.apache.hadoop.fs.Path(base, s"v$v.claim")
    // A FRESH foreign claim on the next version (an in-flight peer
    // merge): the scrub must WAIT, not run through the swap window.
    fs.create(claim(2L), false).close()
    val fut = Future(MergeSink.scrubVersions(spark, table, base,
      ops((1L, 0L, "X", 0.0)).select("key")))
    Thread.sleep(1500)
    assert(!fut.isCompleted, "scrub must block behind a fresh in-flight claim")
    fs.delete(claim(2L), false) // peer resolves
    val scrubbed = Await.result(fut, 60.seconds)
    assert(scrubbed == Seq(1L))
    // The fence claim is RELEASED: the next merge commits v2 normally
    // (no stale-claim failure, no skipped number).
    MergeSink.merge(spark, table, base, ops((5L, 30L, "I", 5.0)))
    assert(MergeSink.versions(spark, base).last == 2L)
    // A STALE foreign claim fails the scrub loudly (crashed peer).
    val (table2, base2) = freshTable("scrubfence2")
    MergeSink.merge(spark, table2, base2, ops((1L, 10L, "I", 1.0)))
    val (fs2, _) = hadoopFs(base2)
    val c2 = new org.apache.hadoop.fs.Path(base2, "v2.claim")
    fs2.create(c2, false).close()
    fs2.setTimes(c2, System.currentTimeMillis() - MergeSink.StaleClaimMs - 5000, -1)
    val ex = intercept[IllegalStateException](
      MergeSink.scrubVersions(spark, table2, base2,
        ops((1L, 0L, "X", 0.0)).select("key")))
    assert(ex.getMessage.contains("scrub") && ex.getMessage.contains("v2"))
  }

  test("etl30: the gated late merge audit — zero resurrection, legitimate updates land") {
    val rows = Etl.etl30SuppressionGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(rows.forall(_._4 == 0L), s"resurrected keys in $rows")
    // v4 (post-late-merge) must hold MORE visible keys than the
    // scrubbed v3 (the non-suppressed late updates landed, including
    // formerly tombstoned keys) — the gate is narrow, not a freeze.
    assert(rows(3)._2 >= rows(2)._2)
    assert(rows(3)._2 > 0)
  }

  test("etl27 retention audit equals the per-version reductions") {
    val rows = Etl.etl27Retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // Driver replay: retained v2 = batches 1-2 (seq % 3 < 2), v3 = full
    // log; latest-seq-wins, tombstones excluded, exactly one expired.
    val log = Etl.cdcLog(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def reduce(pred: Long => Boolean) = {
      val live = log.filter(t => pred(t._2)).groupBy(_._1)
        .map { case (_, ts) => ts.maxBy(_._2) }
        .filter(_._3 != "D")
      (live.size.toLong, live.map(_._2).sum)
    }
    val (n2, s2) = reduce(_ % 3 < 2)
    val (n3, s3) = reduce(_ => true)
    assert(rows == Seq((2L, n2, s2, 1), (3L, n3, s3, 1)))
  }
}
