package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench summary-line contract: the harness keeps only the
  * LAST ~2000 chars of stdout, so the line must stay parseable JSON
  * under the window no matter how many queries fail (round 9 lost all
  * 86 good timings to 28 verbose error strings overflowing the tail).
  */
class BenchRenderSpec extends AnyFunSuite {

  private val fullSurface: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.234)

  private def parse(line: String) =
    org.json4s.jackson.JsonMethods.parse(line)

  /** The line's per-query timings and its in-band dropped count —
    * every entry must be one or the other (the accounting law of the
    * top-value degradation step). Since round 21 the dropped count is
    * the TOP-LEVEL "sub" key, a sibling of "queries" — never a key
    * inside the map (the driver's PERF comparator reads every queries
    * key as a query, so the old in-map "_sub" marker graded as a
    * phantom regressed query).
    */
  private def queriesAndSub(line: String): (Map[String, Double], Long) = {
    val org.json4s.JObject(fields) = (parse(line) \ "queries"): @unchecked
    assert(!fields.exists(_._1 == "_sub"),
      "the dropped-count marker must never ride inside the queries map")
    val sub = (parse(line) \ "sub") match {
      case org.json4s.JInt(n) => n.toLong
      case _ => 0L
    }
    val timings = fields.collect {
      case (k, org.json4s.JDouble(d)) if !k.startsWith("_") => k -> d
      case (k, org.json4s.JInt(i)) if !k.startsWith("_") => k -> i.toDouble
    }.toMap
    (timings, sub)
  }

  /** Fits + parses + full accounting + the top-value law: whatever is
    * dropped is never more expensive than anything kept.
    */
  private def assertHealthyLine(
      line: String, surface: Seq[(String, Double)]): Unit = {
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val (timings, sub) = queriesAndSub(line)
    assert(timings.size + sub == surface.size,
      s"accounting: ${timings.size} timings + $sub dropped != ${surface.size}")
    val byShort = surface.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    val dropped = byShort.filterNot { case (s, _) => timings.contains(s) }
    if (dropped.nonEmpty && timings.nonEmpty)
      assert(dropped.map(_._2).max <= byShort
          .filter { case (s, _) => timings.contains(s) }.map(_._2).min,
        "a dropped entry must never out-cost a kept one")
  }

  test("clean run: line fits the tail window and parses") {
    val line = Bench.renderLine(fullSurface, Nil, "/root/testdata/sf0.1")
    assertHealthyLine(line, fullSurface)
    // The uniform mid-range surface is the hardest shape (nothing is
    // cheap to drop); even there the record keeps the total and an
    // in-band account of every query.
    val (timings, sub) = queriesAndSub(line)
    assert(timings.nonEmpty || sub == fullSurface.size)
  }

  test("r9 failure shape: 28 long-message errors cannot crowd out timings") {
    val errors = fullSurface.take(28).map { case (k, _) =>
      k -> "ExtendedAnalysisException"
    }.toList
    val line = Bench.renderLine(fullSurface, errors, "/root/testdata/sf0.1")
    assertHealthyLine(line, fullSurface)
    val org.json4s.JInt(errCount) = (parse(line) \ "errors" \ "_count"): @unchecked
    assert(errCount == 28, "errors degrade to a count, never crowd timings")
  }

  test("worst case: every query errors, line still fits and parses") {
    val errors = fullSurface.map { case (k, _) =>
      k -> ("SomeVeryLongExceptionClassName" * 4)
    }.toList
    val line = Bench.renderLine(fullSurface, errors, "/root/testdata/sf0.1")
    assertHealthyLine(line, fullSurface)
  }

  test("top-value step: the expensive tail survives at any surface size") {
    // 300 queries with distinct costs: the kept set must be exactly
    // the top-n by value for the largest n that fits — the entries
    // the suspect gate and the round's grading actually read.
    val surface = (1 to 300).map(i => f"zz$i%03d_filler" -> i * 0.1)
    val line = Bench.renderLine(surface, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val (timings, sub) = queriesAndSub(line)
    assert(timings.size + sub == 300L)
    assert(timings.nonEmpty, "the expensive tail must survive")
    val keptIdx = timings.keys.map(_.drop(2).toInt).toSet
    assert(keptIdx == (300 - timings.size + 1 to 300).toSet,
      "kept set must be exactly the top-n by value")
  }

  test("error tokens are escaped: quotes/backslashes cannot break the JSON") {
    val errors = List("q01_pricing_summary" -> "He said \"boom\\\" end")
    val line = Bench.renderLine(fullSurface.take(3), errors, "/tmp/x")
    parse(line) // must not throw
  }

  test("runaway surface: line fits even when timings cannot (bounded account)") {
    // 5000 queries can never fit as per-query timings; the top-value
    // step keeps whatever expensive slice fits and accounts for the
    // rest in-band — the total and the accounting survive regardless
    // of surface size.
    val huge = (1 to 5000).map(i => f"zz$i%04d_filler" -> 1.234)
    val line = Bench.renderLine(huge, Nil, "/root/testdata/sf0.1")
    assertHealthyLine(line, huge)
    val org.json4s.JDouble(total) = (parse(line) \ "value"): @unchecked
    assert(math.abs(total - 5000 * 1.234) < 1.0)
  }

  test("outlier detection: >3x family median AND >1s, errored excluded") {
    val results = Seq(
      "q01_a" -> 0.2, "q02_b" -> 0.3, "q03_c" -> 0.25,
      "q04_d" -> 16.1, // the round-10 contention artifact shape
      "q05_e" -> 0.9,  // 3x median but under the absolute floor
      "dedup01_x" -> 0.2, "dedup02_y" -> 2.5, "dedup03_z" -> 0.3,
      // over threshold (family median 0.3) but errored -> excluded
      "etl01_a" -> 5.0, "etl02_b" -> 0.2, "etl03_c" -> 0.3
    )
    val out = Bench.outliers(results, errored = Set("etl01_a"))
    assert(out.toSet == Set("q04_d", "dedup02_y"))
  }

  test("outlier detection: clean sweep flags nothing cheap") {
    val results = (1 to 40).map(i => f"q$i%02d_x" -> 0.3)
    assert(Bench.outliers(results, Set.empty).isEmpty)
  }

  test("outlier detection: errored times do not inflate the family median") {
    val results = Seq(
      "sim01_a" -> 0.4, "sim02_b" -> 0.5, "sim03_c" -> 0.45,
      "sim04_d" -> 16.0,                    // genuine contention artifact
      "sim05_e" -> 20.0, "sim06_f" -> 21.0) // slow FAILURES
    // Were the failures' times in the median (~16 s), 3x would be 48 s
    // and the artifact would ship undetected — the round-10 scenario.
    assert(Bench.outliers(results,
      errored = Set("sim05_e", "sim06_f")).toSet == Set("sim04_d"))
    // An all-errored family has no median: nothing flagged, no crash.
    assert(Bench.outliers(Seq("mm01_a" -> 9.0, "mm02_b" -> 9.5),
      errored = Set("mm01_a", "mm02_b")).isEmpty)
  }

  test("family split: etl by decade, others by letter prefix") {
    assert(Bench.family("etl01_select") == "etl0")
    assert(Bench.family("etl19_merge") == "etl1")
    assert(Bench.family("etl27_retention") == "etl2")
    assert(Bench.family("q04_order_priority") == "q")
    assert(Bench.family("dedup03_minhash_lsh") == "dedup")
  }

  // --- prior-record comparison (round-11 directive items 1 and 7) ---

  private val wrapperRecord =
    """{"n": 11, "rc": 0, "sf": 0.1,
       "tail": "noise\n{\"metric\":\"total\",\"value\":10.0,\"unit\":\"sec\",\"queries\":{\"q01\":0.22,\"dedup11\":1.10,\"etl25\":1.17},\"errors\":{},\"sf\":\"/root/testdata/sf0.1\"}"}"""

  test("parsePriorTimes: reads escaped per-query times from a driver wrapper") {
    val got = Bench.parsePriorTimes(wrapperRecord, "/root/testdata/sf0.1")
    assert(got == Map("q01" -> 0.22, "dedup11" -> 1.10, "etl25" -> 1.17))
  }

  test("parsePriorTimes: a record at a different sf contributes nothing") {
    assert(Bench.parsePriorTimes(wrapperRecord, "/root/testdata/sf0.01").isEmpty)
  }

  test("parsePriorTimes: degraded counts-only records contribute nothing") {
    val degraded =
      """{"tail": "{\"metric\":\"total\",\"value\":9.0,\"unit\":\"sec\",\"queries\":{\"_count\":133},\"errors\":{\"_count\":0},\"sf\":\"/root/testdata/sf0.1\"}"}"""
    assert(Bench.parsePriorTimes(degraded, "/root/testdata/sf0.1").isEmpty)
  }

  test("outliersVsPrior: prior record judges known queries; family median only new ones") {
    val prior = Map("q01" -> 0.3, "q02" -> 2.0)
    val results = Seq(
      "q01_known" -> 1.2,  // >2x its own prior 0.3 -> flagged
      "q02_known" -> 1.0,  // heavy query, under 2x its prior 2.0 -> NOT flagged
      // new queries (no prior): family median (sorted times 0.4/1.0/1.2/5.0
      // -> 1.2) governs at its own 3x; 5.0 > 3x median and > floor -> flagged
      "q03_new" -> 5.0,
      "q04_new" -> 0.4)
    val out = Bench.outliersVsPrior(results, Set.empty, prior)
    assert(out.toSet == Set("q01_known", "q03_new"))
  }

  test("outliersVsPrior: the uniform-slowdown shape r11 shipped IS caught") {
    // Everything ~1.8x its prior: the within-run family median moves with
    // the run and flags nothing; the prior record flags the >2x entries.
    val prior = Map("a01" -> 1.0, "a02" -> 1.1, "a03" -> 1.0, "a04" -> 1.2)
    val results = Seq("a01_x" -> 1.8, "a02_x" -> 2.0, "a03_x" -> 4.6, "a04_x" -> 2.1)
    assert(Bench.outliers(results, Set.empty).isEmpty,
      "family-median pass must demonstrate the blind spot")
    assert(Bench.outliersVsPrior(results, Set.empty, prior) == Seq("a03_x"))
  }

  test("outliersVsPrior: the 2x band rounds 9-12 shipped unflagged IS now caught") {
    // r12 shipped dedup04 at 2.11 s against a 0.56 s clean floor (3.8x)
    // but also a band of 2-3x entries that the 3x trigger let through;
    // with the clean-seeded floor the threshold is 2x (round-12
    // directive item 4a), so that band is flagged — while a reading
    // under 2x its honest floor still is not.
    val prior = Map("d04" -> 0.56, "d05" -> 0.72)
    val results = Seq("d04_x" -> 1.45, "d05_x" -> 1.30)
    assert(Bench.outliersVsPrior(results, Set.empty, prior) == Seq("d04_x"),
      "1.45 > 2x0.56 flagged; 1.30 < 2x0.72 not")
  }

  test("outliersVsPrior: sub-second floors gate at 0.3s absolute (round-13 directive)") {
    // With clean per-query floors seeded, a 0.12 s query reading 0.6 s
    // is exactly as diagnostic as a 1 s one — the old 1 s absolute gate
    // let it ship. Below RetryFloorSec the 2x band is scheduler noise
    // and must NOT churn; queries with NO floor keep the 1 s
    // family-median gate (their medians are same-load measurements).
    val prior = Map("a" -> 0.12, "b" -> 0.10, "c" -> 0.12)
    val results = Seq("a_x" -> 0.6, "b_x" -> 0.25, "c_x" -> 0.2,
      "new_x" -> 0.8)
    assert(Bench.outliersVsPrior(results, Set.empty, prior) == Seq("a_x"),
      "0.6 > 2x0.12 and > 0.3 flagged; 0.25/0.2 below the absolute gate; " +
        "0.8 has no floor and sits under the family-median 1 s gate")
    assert(Bench.suspects(results, Set.empty, prior) == Seq("a"),
      "the suspect verdict uses the same floor-relative gate")
  }

  test("suspects: post-retry times still >2x prior are named, errored excluded") {
    val prior = Map("q01" -> 0.3, "q02" -> 0.4)
    val results = Seq("q01_a" -> 1.2, "q02_b" -> 3.0)
    assert(Bench.suspects(results, Set("q02_b"), prior) == Seq("q01"))
    assert(Bench.suspects(results, Set.empty, prior).toSet == Set("q01", "q02"))
  }

  test("suspect field: rendered into the line, capped, and survives degradation") {
    val suspect = (1 to 40).map(i => f"zz$i%02d")
    val line = Bench.renderLine(fullSurface, Nil, "/root/testdata/sf0.1", suspect)
    assert(line.length <= Bench.MaxLineChars, s"len=${line.length}")
    val json = parse(line)
    val org.json4s.JArray(ids) = (json \ "suspect"): @unchecked
    assert(ids.size == 17, "16 ids + one overflow token")
    assert(ids.last == org.json4s.JString("+24"))
    // The guaranteed-fit fallback still carries the (bounded) list.
    val huge = (1 to 5000).map(i => f"zz$i%04d_filler" -> 1.234)
    val fallback = Bench.renderLine(huge, Nil, "/root/testdata/sf0.1", suspect)
    assert(fallback.length <= Bench.MaxLineChars)
    val org.json4s.JArray(ids2) = (parse(fallback) \ "suspect"): @unchecked
    assert(ids2.size == 17)
  }

  test("shortIds are unique across the query surface") {
    // The summary line, the prior-record floor, and the suspect list
    // all key per-query data on shortId (the prefix before the first
    // underscore). Two queries sharing one shortId would silently
    // collapse into a single ambiguous record entry — exactly what a
    // first draft of round-13's mm09_feature_real did by reusing
    // mm03's number.
    val ids = SparkEntry.queries.keys.toSeq
    val dup = ids.groupBy(i => i.takeWhile(_ != '_'))
      .collect { case (s, ks) if ks.size > 1 => s -> ks.sorted }
    assert(dup.isEmpty, s"colliding shortIds: $dup")
  }

  test("the full current surface keeps per-query timings in the line") {
    // 140+ queries overflow even the 2-dp step. Probe several value
    // shapes (≥1 s, the dominant sub-second band, and the sub-0.1
    // "0"-collapse edge): the sub-0.1 shape still fits IN FULL; the
    // 3-char shapes crossed the full-1-dp horizon when the surface
    // passed ~157 queries, so the top-value step may shed a handful of
    // the cheapest entries — bounded, in-band, never the record (the
    // judge grades per-query ratios off this line; counts-only would
    // blind the round's perf record, which is exactly what a
    // 141-query run shipped before these steps existed).
    // The shed allowance tracks the surface: each query past the
    // ~157-query full-1-dp horizon costs roughly one shed entry at the
    // widest (4-char) value shape, so a fixed constant would fail on
    // every future growth while a proportional bound still catches a
    // degradation-logic regression (which sheds half the surface, not
    // the horizon overflow).
    val shedAllowance = math.max(8, SparkEntry.queries.size - 156)
    for (v <- Seq(1.234, 0.456, 0.047)) {
      val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> v)
      val line = Bench.renderLine(results, Nil, "/root/testdata/sf0.1")
      assertHealthyLine(line, results)
      val (timings, _) = queriesAndSub(line)
      assert(timings.size >= results.size - shedAllowance,
        s"v=$v: at most the horizon overflow may shed (got ${timings.size} of ${results.size})")
    }
    val tiny = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 0.047)
    val (full, sub) = queriesAndSub(
      Bench.renderLine(tiny, Nil, "/root/testdata/sf0.1"))
    assert(sub == 0 && full.size == tiny.size,
      "the 1-char value shape must keep the whole surface")
  }

  test("contended full surface: a long suspect list costs the cheapest entries, not the record") {
    // Round 14's clean run measured the 1-dp step at 1865 chars on 148
    // queries — a 7-id suspect list pushed past the old 1900 budget and
    // silently degraded the OFFICIAL record to counts-only. The
    // top-value step must keep every gate-relevant timing (≥
    // SubEntryFloorSec — nothing below it can be suspect) alive under
    // a full 16-id suspect list, and the dropped count must be
    // visible in-band.
    val suspect = (1 to 16).map(i => f"zzsuspect$i%02d")
    val keys = SparkEntry.queries.keys.toSeq.sorted
    val results = keys.zipWithIndex.map { case (k, i) =>
      k -> (if (i % 2 == 0) 1.234 else 0.2)
    }
    val line = Bench.renderLine(results, Nil, "/root/testdata/sf0.1", suspect)
    assertHealthyLine(line, results)
    val (timings, sub) = queriesAndSub(line)
    val gateRelevant = results.filter(_._2 >= Bench.SubEntryFloorSec)
      .map(_._1.takeWhile(_ != '_')).toSet
    assert(gateRelevant.subsetOf(timings.keySet),
      "every gate-relevant timing must survive the suspect list")
    assert(timings.size + sub == results.size, "dropped count in-band")
  }

  test("parseFingerprints: reads the clean record's fingerprint column, sf-guarded") {
    val rec = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q01":0.5,"cur18":0.9},""" +
      """"fingerprints":{"q01":"ab12cd34ef56","cur18":"0123456789ab"},""" +
      """"errors":{},"suspect":[],"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseFingerprints(rec, "/root/testdata/sf0.1") ==
      Map("q01" -> "ab12cd34ef56", "cur18" -> "0123456789ab"))
    // Wrong sf contributes nothing (a dev record must never ratchet the
    // official floors).
    assert(Bench.parseFingerprints(rec, "/root/testdata/sf0.01").isEmpty)
    // A pre-fingerprint record contributes nothing.
    assert(Bench.parseFingerprints(
      """{"metric":"total","queries":{"q01":0.5},"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1").isEmpty)
  }

  test("floor ratchet: a changed fingerprint drops the floor; unknown fingerprints keep it") {
    val prior = Map("q01" -> 0.5, "cur18" -> 0.9, "sim19" -> 1.8, "etl10" -> 0.7)
    val clean = Map("q01" -> "aaaa", "cur18" -> "bbbb", "sim19" -> "cccc")
    val current = Map("q01" -> "aaaa", "cur18" -> "CHANGED", "etl10" -> "eeee")
    val (kept, reseeded) = Bench.ratchetPrior(prior, clean, current)
    // cur18: both sides known, differ -> floor dropped, named.
    assert(reseeded == Seq("cur18"))
    assert(!kept.contains("cur18"))
    // q01: both sides known, equal -> floor kept.
    assert(kept("q01") == 0.5)
    // sim19: no CURRENT fingerprint (errored before capture) -> kept.
    assert(kept("sim19") == 1.8)
    // etl10: no CLEAN fingerprint (pre-fingerprint file) -> kept. The
    // conservative arm: the ratchet can only fire on recorded evidence,
    // so fingerprint drift can soften the gate only query-by-query and
    // only when the plan REALLY changed.
    assert(kept("etl10") == 0.7)
    // Empty maps ratchet nothing (round-1-of-the-feature posture).
    assert(Bench.ratchetPrior(prior, Map.empty, current)._1 == prior)
    assert(Bench.ratchetPrior(prior, clean, Map.empty)._1 == prior)
  }

  test("recordRatio: names uniform inflation per-query retries cannot catch") {
    // 30 queries, every one at 1.4x its floor — zero are suspect (the
    // per-query gate fires at 2x), but the RECORD is damaged: exactly
    // the rounds-14/15 failure shape the extra-pass loop exists for.
    val prior = (1 to 30).map(i => f"zz$i%02d" -> 1.0).toMap
    val uniform = (1 to 30).map(i => f"zz$i%02d_q" -> 1.4)
    assert(Bench.outliersVsPrior(uniform, Set.empty, prior).isEmpty,
      "uniform 1.4x must not trip the per-query gate (by design)")
    val r = Bench.recordRatio(uniform, Set.empty, prior)
    assert(r.exists(v => math.abs(v - 1.4) < 1e-9))
    assert(r.get > Bench.RecordDamagedRatio, "1.4x record must read damaged")
    // A healthy record sits under the threshold.
    val healthy = (1 to 30).map(i => f"zz$i%02d_q" -> 1.1)
    assert(Bench.recordRatio(healthy, Set.empty, prior)
      .exists(_ <= Bench.RecordDamagedRatio))
    // Errored queries are excluded; thin floor coverage yields None.
    assert(Bench.recordRatio(uniform, uniform.map(_._1).toSet, prior).isEmpty)
    assert(Bench.recordRatio(uniform.take(5), Set.empty, prior).isEmpty,
      "under RecordCoverMin floor-covered queries the ratio is not meaningful")
  }

  test("only-filtered runs self-identify in-band at every degradation step") {
    // Round-16 ADVICE: a SPARK_GRAFT_BENCH_ONLY run's line was
    // indistinguishable from a full official record — a leftover env
    // var would ship a partial record reading as a degraded full one.
    val line = Bench.renderLine(fullSurface.take(3), Nil,
      "/root/testdata/sf0.1", only = true)
    assert((parse(line) \ "only") == org.json4s.JBool(true))
    // The guaranteed-fit fallback keeps the marker too (it rides the
    // shared line builder, below every degradation step).
    val huge = (1 to 5000).map(i => f"zz$i%04d_filler" -> 1.234)
    val fb = Bench.renderLine(huge, Nil, "/root/testdata/sf0.1", only = true)
    assert(fb.length <= Bench.MaxLineChars)
    assert((parse(fb) \ "only") == org.json4s.JBool(true))
    // And a full run carries NO marker (absence is the full-record
    // signal; an always-present only:false would be noise).
    val full = Bench.renderLine(fullSurface.take(3), Nil, "/root/testdata/sf0.1")
    assert((parse(full) \ "only") == org.json4s.JNothing)
  }

  test("parseMergedThrough: per-sf map form; legacy int only at the file's own sf") {
    val mapForm = """{"metric":"total","value":1.0,"unit":"sec","queries":{},
      "merged_through":{"/root/testdata/sf0.1":16,"/root/testdata/sf0.01":12},
      "sf":"/root/testdata/sf0.01"}"""
    assert(Bench.parseMergedThrough(mapForm, "/root/testdata/sf0.1")
      .contains(16), "map form: each sf reads its OWN watermark")
    assert(Bench.parseMergedThrough(mapForm, "/root/testdata/sf0.01")
      .contains(12))
    assert(Bench.parseMergedThrough(mapForm, "/tmp/other").isEmpty)
    val legacy = """{"metric":"total","merged_through":14,"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseMergedThrough(legacy, "/root/testdata/sf0.1")
      .contains(14))
    assert(Bench.parseMergedThrough(legacy, "/root/testdata/sf0.01").isEmpty,
      "legacy single-int form is honored only at the file's own sf")
    assert(Bench.parseMergedThrough("""{"metric":"total"}""", "/x").isEmpty)
  }

  test("mergePrior: post-watermark officials min-merge even for fingerprinted keys") {
    // Round-16 ADVICE: the clean-authority rule discarded an official
    // record landing AFTER the last clean regeneration even when it
    // measured the same plan lower — the defense softened for up to a
    // round per key. Post-watermark officials (passed separately) may
    // tighten a fingerprinted floor; pre-watermark history still never
    // resurrects a reseeded one.
    val official = Map("cur18" -> 0.9, "q01" -> 0.3)
    val clean = Map("cur18" -> 2.5, "q01" -> 0.4)
    val fps = Map("cur18" -> "fp")
    assert(Bench.mergePrior(official, clean, fps,
        officialNewer = Map("cur18" -> 2.0))("cur18") == 2.0,
      "a newer official measuring the same plan lower must tighten the floor")
    assert(Bench.mergePrior(official, clean, fps,
        officialNewer = Map("cur18" -> 3.0))("cur18") == 2.5,
      "a newer but slower official never loosens it")
    assert(Bench.mergePrior(official, clean, fps)("cur18") == 2.5,
      "no post-watermark slice → clean authority as before")
  }

  test("mergePrior: the fingerprinted clean floor is the authority (a reseed survives official history)") {
    // The reseed-reversion hole (round-16 review): officials carry no
    // fingerprints, so after a legitimate plan change their pre-change
    // times must NOT min-merge back under the reseeded clean floor.
    val official = Map("cur18" -> 0.9, "q01" -> 0.3, "old" -> 0.5)
    val clean = Map("cur18" -> 2.5, "q01" -> 0.4)
    val fps = Map("cur18" -> "fp-of-the-grown-plan")
    val m = Bench.mergePrior(official, clean, fps)
    assert(m("cur18") == 2.5,
      "a pre-change official 0.9s must not resurrect under the reseeded floor")
    assert(m("q01") == 0.3, "unfingerprinted keys keep the defensive min")
    assert(m("old") == 0.5, "official-only keys survive")
    assert(Bench.mergePrior(Map.empty, Map("a" -> 1.0), Map.empty) ==
      Map("a" -> 1.0))
    assert(Bench.mergePrior(Map("a" -> 1.0), Map.empty, Map.empty) ==
      Map("a" -> 1.0))
  }

  test("priorRecord: min-merges the real repo records (contamination defense)") {
    // Runs in the repo root where BENCH_r*.json live; if none parse at
    // this sf the map is empty and the family fallback governs — both
    // outcomes are legal, but when records ARE present the min must be
    // <= every round's individual reading.
    val rec = Bench.priorRecord("/root/testdata/sf0.1")
    if (rec.nonEmpty) {
      val r11 = Bench.parsePriorTimes(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_r11.json")), "UTF-8"),
        "/root/testdata/sf0.1")
      r11.foreach { case (k, v) =>
        assert(rec(k) <= v, s"min-merge must not exceed r11's $k=$v")
      }
    }
  }
}
