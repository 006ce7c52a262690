package graft.operators

import graft.SparkSpec

class CurationTextSpec extends SparkSpec {

  test("cur16 flags exact contaminated span boundaries on a hand-built corpus") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val k = Dedup.SubstringWindow // 15
    def toks(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val cBlock = toks("c", 20)
    val docs = Seq(
      (100L, "src0", cBlock), // held-out/benchmark side
      // P1 embedded at token offset 5: windows 5..10 match the held-out
      // doc's windows 0..5 -> ONE maximal span [5, 24].
      (1L, "src1", toks("a", 5) + " " + cBlock + " " + toks("b", 5)),
      (2L, "src1", toks("d", 30)), // clean
      // Train-train verbatim duplication (3 == 4) is dedup10's business,
      // NOT contamination: neither may flag.
      (3L, "src1", toks("e", 20)),
      (4L, "src2", toks("e", 20)),
      // Two contaminated windows 30 tokens apart -> two separate spans.
      (5L, "src1", toks("c", 15) + " " + toks("x", 15) + " " + toks("c", 15)),
      // Exactly-adjacent contaminated windows (gap == k) -> ONE span.
      (6L, "src1", toks("c", 15) + " " + toks("c", 15)))
      .toDF("doc_id", "source", "text")
    val got = Dedup.substringContamination(docs, col("source") === "src0")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    val expected = Set(
      (1L, 1L, 5, 24, 6L),
      (5L, 1L, 0, k - 1, 1L), (5L, 2L, 30, 30 + k - 1, 1L),
      (6L, 1L, 0, 2 * k - 1, 2L))
    assert(got == expected, s"got $got")
    // The contrast that makes cur16 its own operator: dedup10 over the
    // SAME corpus DOES flag the train-train pair (3, 4).
    val within = Dedup.substringSpans(docs).collect().map(_.getLong(0)).toSet
    assert(within.contains(3L) && within.contains(4L),
      "within-corpus span dedup must still see the train-train repeat")
  }

  test("cur17 scrub removes exactly the contaminated spans, order preserved") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val k = Dedup.SubstringWindow
    def toks(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val cBlock = toks("c", 20)
    // The cur16 fixture: known spans -> known rewrites.
    val docs = Seq(
      (100L, "src0", cBlock),
      (1L, "src1", toks("a", 5) + " " + cBlock + " " + toks("b", 5)),
      (2L, "src1", toks("d", 30)),
      (5L, "src1", toks("c", 15) + " " + toks("x", 15) + " " + toks("c", 15)),
      (6L, "src1", toks("c", 15) + " " + toks("c", 15)))
      .toDF("doc_id", "source", "text")
    val got = Curation.scrubSpans(docs,
        Dedup.substringContamination(docs, col("source") === "src0"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got == Map(
      // [5, 24] removed from 30 tokens: the a/b flanks survive in order.
      1L -> (1L, 30L, 20L, toks("a", 5) + " " + toks("b", 5)),
      // Two spans [0,14] and [30,44]: only the middle x-block survives.
      5L -> (2L, 45L, 30L, toks("x", 15)),
      // One merged span covering everything: the clean text is empty.
      6L -> (1L, 30L, 30L, "")),
      s"got $got")
    // Unaffected docs (2) and the held-out side (100) never appear.
    assert(!got.contains(2L) && !got.contains(100L))
  }

  test("cur16 equals a driver-side ExactSubstr replay over the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val k = Dedup.SubstringWindow
    def windows(text: String): Seq[(Int, String)] = {
      val t = text.split(" ", -1)
      if (t.length < k) Seq.empty
      else (0 to t.length - k).map(i => i -> t.slice(i, i + k).mkString(" "))
    }
    val held = docs.filter(_._2 == "src0").flatMap(d => windows(d._3)).map(_._2).toSet
    val expected = docs.filter(_._2 != "src0").flatMap { case (id, _, text) =>
      val flagged = windows(text).collect { case (p, w) if held(w) => p }
      // Island merge: consecutive flagged starts within k tokens.
      val spans = flagged.foldLeft(List.empty[(Int, Int, Long)]) {
        case (acc, p) if acc.nonEmpty && p - acc.head._2 <= k =>
          (acc.head._1, p, acc.head._3 + 1) :: acc.tail
        case (acc, p) => (p, p, 1L) :: acc
      }.reverse
      spans.zipWithIndex.map { case ((s, e, n), i) =>
        (id, (i + 1).toLong, s, e + k - 1, n)
      }
    }.toSet
    val got = Curation.cur16SubstringContamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    assert(got == expected,
      s"got ${got.size} spans, expected ${expected.size}")
    // Live check: the replay itself must have found some contamination
    // at this sf or the test proves nothing.
    assert(expected.nonEmpty, "corpus must carry cross-split overlap")
  }

  test("cur05 mix weights: shares sum to 1, uniform target inverts shares") {
    val rows = Curation.cur05MixWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("actual_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
    val k = rows.length.toDouble
    rows.foreach { r =>
      val share = r.getAs[Double]("actual_share")
      val weight = r.getAs[Double]("weight")
      assert(weight > 0.0)
      // weight = (1/k) / share up to the independent 4-dp/6-dp rounding.
      assert(math.abs(weight - (1.0 / k) / share) < 0.01,
        s"source ${r.getString(0)}")
    }
  }

  test("cur07 stratified sample: deterministic, bounded, near-target") {
    val rows = Curation.cur07StratifiedSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val s = r.getAs[Long]("n_sampled")
      val rate = r.getAs[Double]("sample_rate")
      val thr = r.getAs[String]("thr")
      assert(s >= 0 && s <= n)
      assert(thr.length == 4 || thr == "10000", s"thr shape: $thr")
      if (rate >= 1.0) assert(s == n, s"rate-1 stratum must keep all docs: $r")
      else {
        // Hash selection concentrates around rate·n: loose 5σ bound
        // (σ ≤ √n/2 for a Bernoulli sum) plus quantization slack.
        val exp = rate * n
        assert(math.abs(s - exp) <= 5 * (math.sqrt(n.toDouble) / 2) + 1,
          s"stratum ${r.getString(0)}: sampled $s, expected ≈$exp of $n")
      }
    }
    // Determinism: the same docs are selected on a re-run.
    val again = Curation.cur07StratifiedSample(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("cur09 sequence packing matches a local replay on a known corpus") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // Includes: a doc exactly CtxChars long, a doc larger than one
    // sequence (must count as split), tiny docs, and a second source.
    val docs = Seq(
      (1L, "s1", 1500L), (2L, "s1", 1000L), (3L, "s1", 600L),
      (4L, "s1", 2048L), (5L, "s2", 100L), (6L, "s2", 5000L))
      .toDF("doc_id", "source", "n_chars")
    val got = Curation.sequencePackStats(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // Independent replay: JDK md5, Scala sort + cumsum.
    def hk(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val k = Curation.CtxChars
    val expected = Seq(
      (1L, "s1", 1500L), (2L, "s1", 1000L), (3L, "s1", 600L),
      (4L, "s1", 2048L), (5L, "s2", 100L), (6L, "s2", 5000L))
      .groupBy(_._2).map { case (src, ds) =>
        var cum = 0L; var split = 0L
        ds.sortBy(d => (hk(d._1), d._1)).foreach { d =>
          val first = cum / k; cum += d._3
          if ((cum - 1) / k > first) split += 1
        }
        val nSeq = (cum + k - 1) / k
        src -> (ds.size.toLong, cum, nSeq, split,
          BigDecimal(ds.size.toDouble / nSeq)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("cur10 keeps exactly the top ceil(0.3 n) scores per source") {
    import org.apache.spark.sql.functions._
    val rows = Curation.cur10QualitySelect(spark, sf).collect()
    assert(rows.nonEmpty)
    // Independent cutoff: text02's scores (same formula by construction)
    // joined back to sources, ranked locally.
    val scored = TextAnalysis.text02QualityScore(spark, sf)
      .select("doc_id", "quality_score")
      .join(graft.sources.Tables.documents(spark, sf).select("doc_id", "source"),
        Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    rows.foreach { r =>
      val src = r.getString(0)
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("n_kept")
      assert(kept == (n * Curation.QualityKeepNum + Curation.QualityKeepDen - 1)
          / Curation.QualityKeepDen,
        s"$src: kept $kept of $n")
      val srcScores = scored.filter(_._3 == src)
        .sortBy { case (id, q, _) => (-q, id) }
      assert(n == srcScores.length.toLong)
      val keptScores = srcScores.take(kept.toInt).map(_._2)
      assert(r.getAs[Double]("min_kept_score") == keptScores.min,
        s"$src: cutoff must be the kept set's min score")
    }
  }

  test("cur11 split: partitions the corpus, ~90/5/5, stable under growth") {
    import org.apache.spark.sql.functions._
    val rows = Curation.cur11TrainSplit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == total, "splits must partition the corpus")
    val bySplit = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val trainFrac = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.85 && trainFrac < 0.95,
      s"train fraction $trainFrac far from 0.9")
    // Membership stability: assignment depends only on doc_id, so a doc
    // keeps its split when computed over any subset of the corpus.
    val hk = substring(md5(col("doc_id").cast("string")), 1, 4)
    val splitCol = when(hk < "e666", "train")
      .when(hk < "f333", "val").otherwise("test")
    val full = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), splitCol.as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val subset = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), splitCol.as("s")).collect()
    subset.foreach(r =>
      assert(full(r.getLong(0)) == r.getString(1), s"doc ${r.getLong(0)} migrated"))
  }

  test("cur12 cluster sample: strata partition the corpus, rates level the mix") {
    val rows = Curation.cur12ClusterSample(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = Dedup.vectors(spark, sf).count()
    assert(rows.map(_._2).sum == total, "cells must partition the corpus")
    val target = total.toDouble / Similarity.NumCentroids
    rows.foreach { case (cell, nVecs, nSampled, rate) =>
      assert(nSampled <= nVecs, s"cell $cell oversampled")
      if (rate >= 1.0)
        assert(nSampled == nVecs,
          s"cell $cell at/below the uniform target must keep everything")
      else
        // md5 prefixes are ~uniform: the kept count tracks the rate
        // within binomial noise (4 sigma).
        assert(math.abs(nSampled - rate * nVecs) <=
          4 * math.sqrt(nVecs * rate * (1 - rate)) + 1,
          s"cell $cell kept $nSampled of $nVecs at rate $rate")
    }
    // The point of the op: no sampled stratum exceeds the uniform
    // target by more than hash noise.
    rows.filter(_._4 < 1.0).foreach { case (cell, _, nSampled, _) =>
      assert(nSampled <= target * 1.5 + 4,
        s"cell $cell still over-represented after leveling: $nSampled vs $target")
    }
  }

  test("cur08 budget assembly: exact maximal prefix per source") {
    val got = Curation.cur08BudgetAssembly(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.nonEmpty)
    val budget = Curation.SourceCharBudget
    // Driver-side greedy recompute over the same md5 ordering.
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hk(id: Long): String = {
      val d = md.digest(id.toString.getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    docs.groupBy(_._2).foreach { case (source, rows) =>
      val ordered = rows.sortBy { case (id, _, _) => (hk(id), id) }
      var cum = 0L; var kept = 0L; var chars = 0L
      ordered.foreach { case (_, _, n) =>
        cum += n
        if (cum <= budget) { kept += 1; chars += n }
      }
      // The operator keeps rows while the RUNNING sum fits — docs after
      // the first overflow are excluded even if they would individually
      // fit (strict prefix semantics, replayable on any engine).
      val (gKept, gChars, gUtil) = got(source)
      assert(gKept == kept && gChars == chars, s"source $source prefix")
      assert(gChars <= budget, s"source $source must not exceed the budget")
      assert(math.abs(gUtil - chars.toDouble / budget) < 1e-3)
    }
    assert(got.keySet == docs.map(_._2).toSet,
      "every source must appear (the budget binds but never empties a source)")
  }

  test("cur06 funnel counts are monotone and stage-consistent per source") {
    import org.apache.spark.sql.functions._
    val rows = Curation.cur06CurationPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(nIn, nQ, nEx, nNd, nFin) = (1 to 5).map(r.getLong(_))
      assert(nIn >= nQ && nQ >= nEx && nEx >= nNd && nNd >= nFin,
        s"funnel must only shrink: $r")
      assert(r.getLong(6) >= 0L)
    }
    // Stage-1/2 totals must agree with the standalone operators.
    val nQualityTotal = rows.map(_.getLong(2)).sum
    val cur04Kept = Curation.cur04QualityFilter(spark, sf)
      .filter(col("source") =!= "src0")
      .agg(sum("n_kept")).collect().head.getLong(0)
    assert(nQualityTotal == cur04Kept,
      "stage-1 totals must match cur04 on the training split")
  }

  /** Local replay of cur18's post-funnel stages (scrub → keep-all or
    * thresholded sample → salted split → pack) for a hand corpus — the
    * cur09 local-replay discipline applied to the COMPOSED build.
    */
  private def cur18Replay(
      docs: Seq[(Long, String, Long)], // (doc_id, source, n_toks)
      removed: Map[Long, Long],
      ctx: Long): Map[String, (Long, Long, Long, Long, Long, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val post = docs.map { case (id, src, n) =>
      (id, src, n - removed.getOrElse(id, 0L))
    }
    val clean = post.filter(_._3 > 0)
    val bySrc = clean.groupBy(_._2)
    val tot = clean.size.toLong
    val kSrc = bySrc.size.toLong
    val sampled = clean.filter { case (id, src, _) =>
      val thr = math.min(65536L, 65536L * tot / (kSrc * bySrc(src).size))
      thr >= 65536L || md5hex(id.toString).take(4) < f"$thr%04x"
    }
    def split(id: Long): String = {
      val h = md5hex(s"cur18:$id").take(4)
      if (h < "e666") "train" else if (h < "f333") "val" else "test"
    }
    sampled.groupBy(_._2).map { case (src, ds) =>
      val train = ds.filter(d => split(d._1) == "train")
        .sortBy(d => (md5hex(d._1.toString).take(8), d._1))
      var cum = 0L
      var splits = 0L
      train.foreach { d =>
        val first = cum / ctx
        cum += d._3
        if ((cum - 1) / ctx > first) splits += 1
      }
      src -> (ds.size.toLong,
        train.size.toLong,
        ds.count(d => split(d._1) == "val").toLong,
        train.map(_._3).sum,
        if (train.isEmpty) 0L else (cum + ctx - 1) / ctx,
        splits)
    }
  }

  test("cur18 post-funnel stages match a local replay; packing sees POST-scrub counts") {
    import spark.implicits._
    val ctx = Curation.Cur18CtxTokens
    // 12 docs in one source (single source → sample rate 1, every stage
    // decision downstream of the scrub is exercised): each doc raw
    // ctx tokens, a span removes 1 token from every doc, and one doc
    // is fully scrubbed (must drop out of every later stage).
    val docs = (1L to 12L).map(id => (id, "sA", ctx))
    val surv = docs.toDF("doc_id", "source", "n_toks")
    val spans = ((1L to 11L).map(id => (id, 0L, 0, 0, 1L)) :+
      (12L, 0L, 0, (ctx - 1).toInt, 1L))
      .toDF("doc_id", "span_id", "start_pos", "end_pos", "n_windows")
    val noBoiler = Seq.empty[(Long, Long)].toDF("doc_id", "brm")
    val out = Curation.buildFromSurvivors(surv, noBoiler, spans).collect()
    assert(out.length == 1)
    val r = out.head
    val removed = ((1L to 11L).map(_ -> 1L) :+ (12L -> ctx)).toMap
    val rep = cur18Replay(docs, removed, ctx)("sA")
    assert(r.getAs[Long]("n_contam") == 12L)
    assert(r.getAs[Long]("toks_removed") == 11L + ctx)
    assert(r.getAs[Long]("n_clean") == 11L, "the fully-scrubbed doc must drop")
    assert((r.getAs[Long]("n_sampled"), r.getAs[Long]("n_train"),
      r.getAs[Long]("n_val"), r.getAs[Long]("train_toks"),
      r.getAs[Long]("n_sequences"), r.getAs[Long]("n_split_docs")) == rep)
    // The interplay law the composition exists to test: packing sizes
    // by post-scrub counts. Raw counts would tile exactly (ctx tokens
    // per doc → zero split docs, one sequence per doc); post-scrub
    // (ctx−1) docs straddle boundaries and pack into FEWER sequences.
    val noSpans = Seq.empty[(Long, Long, Int, Int, Long)]
      .toDF("doc_id", "span_id", "start_pos", "end_pos", "n_windows")
    // Raw leg over docs 1–11 only (doc 12 exists only because the scrub
    // empties it — it must not skew the with/without comparison).
    val raw = Curation.buildFromSurvivors(
      surv.filter(org.apache.spark.sql.functions.col("doc_id") =!= 12L),
      noBoiler, noSpans).collect().head
    assert(raw.getAs[Long]("n_split_docs") == 0L &&
      raw.getAs[Long]("n_sequences") == raw.getAs[Long]("n_train"))
    assert(r.getAs[Long]("train_toks") ==
      raw.getAs[Long]("train_toks") - r.getAs[Long]("n_train"),
      "train token mass must be the POST-scrub sum")
    if (r.getAs[Long]("n_train") > 1)
      assert(r.getAs[Long]("n_split_docs") > 0L,
        "(ctx−1)-token docs must straddle boundaries — raw-count packing would hide this")
  }

  test("cur18 boiler×contamination interplay: junction spans flag, no token double-subtracted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, size, split}
    // ParagraphTokens=10, SubstringWindow=15, BoilerplateMinDocs=3.
    val B = (1 to 10).map(i => s"b$i")          // the template chunk
    def toks(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i")
    val E = toks("e", 1, 20)                     // held-out content
    val G = toks("g", 1, 20)
    val docs = Seq(
      // A: held-out text SPLIT by a template chunk — 10 held tokens on
      // each side. No raw 15-window of A is contiguous held text, so
      // contamination exists ONLY at the post-scrub junction.
      1L -> ("srcA", (E.take(10) ++ B ++ E.drop(10)).mkString(" ")),
      // C, D: template carriers (bring the chunk to nd ≥ 3), clean.
      2L -> ("srcA", (B ++ toks("c", 1, 20)).mkString(" ")),
      3L -> ("srcA", (B ++ toks("d", 1, 20)).mkString(" ")),
      // F: template + text whose held-out twin H2 ALSO contains the
      // template tail — a raw-coordinate union would subtract the
      // overlapping template tokens TWICE (25-token raw contamination
      // span + 10 boiler tokens = 35 > the doc's 30).
      4L -> ("srcA", (B ++ G).mkString(" ")),
      // E5: neither template nor contamination (the raw-window leg).
      5L -> ("srcA", toks("u", 1, 20).mkString(" ")),
      100L -> ("src0", E.mkString(" ")),
      101L -> ("src0", (B.drop(5) ++ G).mkString(" ")))
      .map { case (id, (src, text)) => (id, src, text) }
      .toDF("doc_id", "source", "text")
    val rawW = Dedup.strideWindowRows(docs, carry = Seq("source"))
    val held = rawW.filter(col("source") === "src0").select("h").distinct()
    val boilerIdx = Dedup.spanHashRows(docs).groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= TextAnalysis.BoilerplateMinDocs).select("h")
    val scrub = TextAnalysis.boilerplateScrub(
      docs.filter(col("source") =!= "src0").select("doc_id", "text"),
      boilerIdx)
    assert(scrub.collect().map(r => r.getAs[Long]("doc_id")).toSet ==
      Set(1L, 2L, 3L, 4L), "exactly the template carriers are affected")
    // The junction law: A has ZERO raw contaminated windows …
    assert(rawW.filter(col("doc_id") === 1L)
      .join(held, Seq("h"), "left_semi").count() == 0L,
      "fixture broken: A must be invisible to a raw-coordinate check")
    // … yet post-scrub its reunited held text flags end to end.
    val spans = Curation.postBoilerFlaggedSpans(rawW, scrub, held)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("start_pos"), r.getAs[Int]("end_pos")))
    assert(spans.toSet == Set(1L -> (0, 19), 4L -> (0, 19)),
      s"junction + overlap spans must flag in post-boiler coordinates: ${spans.toSeq}")
    // No double subtraction: both scrubs together remove EXACTLY the
    // doc — post_toks lands on 0, never negative (the raw-union
    // failure mode), and the audit counts both families separately.
    val surv = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val boilerRm = scrub.select(col("doc_id"),
      (col("tokens_before") - col("tokens_after")).cast("long").as("brm"))
    val out = Curation.buildFromSurvivors(surv, boilerRm,
      spans.map { case (id, (s, e)) => (id, 0L, s, e, 1L) }.toSeq
        .toDF("doc_id", "span_id", "start_pos", "end_pos", "n_windows"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_boiler") == 4L)
    assert(r.getAs[Long]("boiler_toks") == 40L)
    assert(r.getAs[Long]("n_contam") == 2L)
    assert(r.getAs[Long]("toks_removed") == 40L,
      "contamination must count POST-boiler tokens only (20 per doc), " +
        "never re-count the removed template")
    assert(r.getAs[Long]("n_clean") == 3L,
      "A and F scrub to zero and drop; C, D, E5 survive")
  }

  test("cur19 leak report: transposed axis agrees with cur16; top offender exact") {
    import org.apache.spark.sql.functions.col
    val rows = Curation.cur19LeakReport(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(rows.nonEmpty)
    // Every held doc reports; coverage is a fraction; evidence columns
    // are jointly present or jointly absent. nw == 0 is legal: a held
    // doc under the window width cannot window (sf0.01's doc 480 IS
    // such a doc — the round-15 review found it silently omitted from
    // the report; it must appear with a zeros row).
    rows.foreach { case (id, (nw, leaked, nTrain, topId, topSh)) =>
      assert(nw >= 0 && leaked <= nw, s"held $id: coverage bound")
      assert((leaked > 0) == (nTrain > 0) && (nTrain > 0) == (topId >= 0) &&
        (topId >= 0) == (topSh > 0), s"held $id: evidence must be coherent")
    }
    // Every held-out DOC is a row — windowable or not.
    val nHeld = graft.sources.Tables.documents(spark, sf)
      .filter(col("source") === "src0").count()
    assert(rows.size.toLong == nHeld,
      s"report must cover all $nHeld held docs, got ${rows.size}")
    // Transpose-consistency: cur16 flags ≥1 contaminated train span
    // IFF ≥1 held doc reports a leak (the two reports read the SAME
    // window frame from opposite axes).
    val cur16Docs = Curation.cur16SubstringContamination(spark, sf)
      .select("doc_id").distinct().count()
    assert((cur16Docs > 0) == rows.values.exists(_._2 > 0),
      "the two contamination axes must agree on whether leaks exist")
    // The fixture corpus genuinely exercises both arms.
    assert(rows.values.exists(_._2 > 0) && rows.values.exists(_._2 == 0),
      "fixture must contain leaked AND clean benchmark docs")
    // Hand corpus: held H leaks into T1 (1 window) and T2 (6 windows —
    // the offender); held H2 is clean.
    import spark.implicits._
    def toks(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i")
    val hand = Seq(
      (100L, "src0", toks("c", 1, 20).mkString(" ")),
      (101L, "src0", toks("z", 1, 20).mkString(" ")),
      (1L, "srcA", (toks("a", 1, 5) ++ toks("c", 1, 15)).mkString(" ")),
      (2L, "srcA", toks("c", 1, 20).mkString(" ")),
      (3L, "srcA", toks("u", 1, 30).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val w = graft.operators.Dedup.strideWindowRows(hand, carry = Seq("source"))
    val held = w.filter(col("source") === "src0")
      .select(col("doc_id").as("held_id"), col("pos"), col("h"))
    val trainH = w.filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), col("h")).distinct()
    val pairs = held.join(trainH, Seq("h"))
      .select("held_id", "pos", "train_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // Doc 1 contains c1..c15 = H's window at pos 0 only; doc 2 is H
    // verbatim = all 6 windows; H2 shares nothing.
    assert(pairs.count(p => p._1 == 100L && p._3 == 1L) == 1)
    assert(pairs.count(p => p._1 == 100L && p._3 == 2L) == 6)
    assert(!pairs.exists(_._1 == 101L))
  }

  test("cur18 funnel stage counts equal cur06's (one shared definition)") {
    val c18 = Curation.cur18CorpusBuild(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getLong(_))).toMap
    val c06 = Curation.cur06CurationPipeline(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getLong(_))).toMap
    assert(c18.keySet == c06.keySet)
    c18.foreach { case (src, counts) =>
      assert(counts == c06(src),
        s"funnel stages must agree with cur06 for $src: $counts vs ${c06(src)}")
    }
    // And the build must end monotone: every stage only shrinks.
    Curation.cur18CorpusBuild(spark, sf).collect().foreach { r =>
      val chain = Seq("n_input", "n_quality", "n_exact", "n_neardup",
        "n_clean", "n_sampled").map(r.getAs[Long](_))
      assert(chain.sliding(2).forall(p => p(0) >= p(1)),
        s"stages must only shrink: $r")
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") +
        r.getAs[Long]("n_test") == r.getAs[Long]("n_sampled"))
    }
  }

  test("cur20 emitted shards tile the train split; coverage and straddle laws hold") {
    val audit = Curation.cur20SequenceSink(spark, sf).collect()
    val report = Curation.cur18CorpusBuild(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_train"),
        r.getAs[Long]("train_toks"), r.getAs[Long]("n_sequences"))).toMap
    assert(audit.nonEmpty)
    val bySrc = audit.groupBy(_.getString(0))
    // Every source with train docs emits shards, and only those.
    assert(bySrc.keySet == report.filter(_._2._1 > 0).keySet)
    bySrc.foreach { case (src, rows) =>
      val (nTrain, trainToks, nSeq) = report(src)
      // The shards tile the train split exactly — no doc lost or
      // double-emitted by the partitioned write.
      assert(rows.map(_.getAs[Long]("n_docs")).sum == nTrain, src)
      assert(rows.map(_.getAs[Long]("shard_toks")).sum == trainToks, src)
      // The emitted spans cover exactly sequences 0..n_sequences-1.
      assert(rows.map(_.getAs[Long]("seq_lo")).min == 0L, src)
      assert(rows.map(_.getAs[Long]("seq_hi")).max == nSeq - 1, src)
      // Shard ids are the floor grouping of the covered range.
      rows.foreach { r =>
        val shard = r.getAs[Long]("shard")
        assert(r.getAs[Long]("seq_lo") / Curation.Cur20SeqsPerShard == shard,
          s"$src shard $shard")
      }
    }
    // Straddle law, independently from the manifest: a doc straddles
    // iff its sequence span crosses a shard boundary.
    val man = Curation.cur18TrainManifest(spark, sf).collect()
    val sps = Curation.Cur20SeqsPerShard
    val expStraddle = man.groupBy(r => (r.getString(1), r.getAs[Long]("shard")))
      .map { case (k, rs) => k -> rs.count(r =>
        r.getAs[Long]("seq_last") / sps > r.getAs[Long]("seq_first") / sps).toLong }
    audit.foreach { r =>
      val k = (r.getString(0), r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_straddle") == expStraddle.getOrElse(k, 0L), k)
    }
  }

  test("cur20 emit layout: hive partitions on disk; offsets reconstruct the concatenation") {
    Curation.cur20SequenceSink(spark, sf).collect()
    val out = new java.io.File(Curation.cur20OutDir(spark, sf))
    val srcDirs = out.listFiles().filter(d =>
      d.isDirectory && d.getName.startsWith("source="))
    assert(srcDirs.nonEmpty, s"no source= partitions under $out")
    srcDirs.foreach { d =>
      assert(d.listFiles().exists(f =>
        f.isDirectory && f.getName.startsWith("shard=")),
        s"no shard= partitions under ${d.getName}")
    }
    // The loader contract: doc i starts at seq_first*ctx + off_first in
    // its source's token stream; sorted by start, consecutive docs abut
    // exactly (the manifest IS the concatenation, no gaps or overlaps),
    // and seq_last re-derives from start + post_toks.
    val ctx = Curation.Cur18CtxTokens
    Curation.cur18TrainManifest(spark, sf).collect()
      .groupBy(_.getString(1)).foreach { case (src, rows) =>
        val spans = rows.map { r =>
          val start = r.getAs[Long]("seq_first") * ctx + r.getAs[Long]("off_first")
          val end = start + r.getAs[Long]("post_toks") - 1
          assert(r.getAs[Long]("seq_last") == end / ctx, s"$src seq_last")
          (start, end)
        }.sortBy(_._1)
        assert(spans.head._1 == 0L, s"$src must start at offset 0")
        spans.sliding(2).foreach {
          case Array((_, e1), (s2, _)) =>
            assert(s2 == e1 + 1, s"$src gap/overlap at $s2")
          case _ =>
        }
      }
  }

  test("cur23 payload: manifest and payload agree doc-for-doc; JVM replay of the reassembly") {
    val ctx = Curation.Cur18CtxTokens
    val sps = Curation.Cur20SeqsPerShard
    val pay = Curation.cur18TrainPayload(spark, sf).collect()
    assert(pay.nonEmpty)
    // Doc-for-doc law (the directive's pin): the emitted token array is
    // EXACTLY post_toks long for every manifest doc — the payload and
    // the packing coordinates cannot disagree.
    pay.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("toks").size.toLong ==
        r.getAs[Long]("post_toks"),
        s"doc ${r.getLong(0)}: payload length != post_toks")
    }
    // Independent ground truth: reassemble every sequence in plain
    // Scala from the payload rows (concatenate per source at cum_start
    // offsets, cut every ctx tokens), hash with the md5-60-bit
    // contract, and demand the audit's per-shard rows exactly.
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .take(15), 16)
    val expected = pay.groupBy(_.getString(1)).flatMap { case (src, rows) =>
      val stream = rows
        .map(r => (r.getAs[Long]("seq_first") * ctx + r.getAs[Long]("off_first"),
          r.getAs[scala.collection.Seq[String]]("toks")))
        .sortBy(_._1).flatMap(_._2)
      val seqTexts = stream.grouped(ctx.toInt).map(_.mkString(" ")).zipWithIndex
      val perShard = seqTexts.toSeq.groupBy(_._2 / sps.toInt).map {
        case (shard, seqs) =>
          (src, shard.toLong) ->
            ((seqs.size.toLong, seqs.map(s => s._1.split(" ").length.toLong).sum,
              seqs.map(s => h60(s._1)).sum))
      }
      perShard
    }
    val audit = Curation.cur23PayloadShards(spark, sf).collect()
    val gotSeq = audit.map(r => (r.getString(0), r.getAs[Long]("shard")) ->
      ((r.getAs[Long]("n_seqs"), r.getAs[Long]("seq_toks"),
        r.getAs[Long]("seq_hash_sum")))).toMap
    assert(gotSeq == expected,
      "audit reassembly diverges from the JVM ground-truth reassembly")
    // Filed-doc side: per emitted shard, docs and payload tokens.
    val expDocs = pay.groupBy(r => (r.getString(1), r.getAs[Long]("shard")))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_.getAs[Long]("post_toks")).sum)) }
    audit.foreach { r =>
      val k = (r.getString(0), r.getAs[Long]("shard"))
      val (nd, pt) = expDocs.getOrElse(k, (0L, 0L))
      assert(r.getAs[Long]("n_docs") == nd && r.getAs[Long]("payload_toks") == pt,
        s"$k filed-doc audit")
    }
    // Conservation: per source, every payload token lands in exactly
    // one sequence slice.
    audit.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("seq_toks")).sum ==
        rows.map(_.getAs[Long]("payload_toks")).sum, s"$src conservation")
    }
  }

  test("cur24 takedown: prefix-stability and shift laws; JVM ground-truth replay of the audit") {
    val ctx = Curation.Cur18CtxTokens
    val sps = Curation.Cur20SeqsPerShard
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    case class D(id: Long, toks: Long, seqF: Long, off: Long, rm: Boolean)
    val bySrc = Curation.cur18TrainManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("post_toks"), r.getAs[Long]("seq_first"),
        r.getAs[Long]("off_first")))
      .groupBy(_._2).map { case (src, rows) =>
        // The packing order: (md5-8 of doc_id, doc_id) per source.
        src -> rows.sortBy(r => (md5hex(r._1.toString).take(8), r._1))
          .map(r => D(r._1, r._3, r._4, r._5,
            md5hex("takedown:" + r._1).take(2) < Curation.TakedownHexThr))
      }
    val got = Curation.cur24Takedown(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val survivors = ds.filterNot(_.rm)
      // JVM replay of the AFTER positions: re-pack the survivors in
      // the same order.
      var cum = 0L
      val after = survivors.map { d =>
        val start = cum; cum += d.toks
        d.id -> ((start / ctx, start % ctx))
      }.toMap
      val (stable, moved) =
        survivors.partition(d => after(d.id) == ((d.seqF, d.off)))
      // PREFIX-STABILITY LAW: a survivor is stable iff it packs BEFORE
      // the source's first removed doc (removal shifts every later
      // cum_start by a positive mass, so (seq, off) cannot survive).
      val firstRm = ds.indexWhere(_.rm)
      if (firstRm >= 0)
        assert(stable.map(_.id).toSet == ds.take(firstRm).map(_.id).toSet,
          s"$src: stable set must be exactly the pre-removal prefix")
      else assert(moved.isEmpty, s"$src: no removal, nothing may move")
      val r = got(src)
      val toksBefore = ds.map(_.toks).sum
      val toksRm = ds.filter(_.rm).map(_.toks).sum
      assert(r.getAs[Long]("n_before") == ds.size.toLong)
      assert(r.getAs[Long]("n_removed") == ds.count(_.rm).toLong)
      assert(r.getAs[Long]("toks_removed") == toksRm)
      assert(r.getAs[Long]("n_stable") == stable.size.toLong, s"$src stable")
      assert(r.getAs[Long]("n_moved") == moved.size.toLong, s"$src moved")
      assert(r.getAs[Long]("seqs_before") == (toksBefore + ctx - 1) / ctx)
      assert(r.getAs[Long]("seqs_after") ==
        (toksBefore - toksRm + ctx - 1) / ctx)
      if (firstRm >= 0) {
        val fd = ds.filter(_.rm).map(_.seqF).min
        assert(r.getAs[Long]("first_dirty_seq") == fd)
        // The rewrite bill is the shard SUFFIX from the first dirty one.
        assert(r.getAs[Long]("shards_dirty") ==
          ((toksBefore + ctx - 1) / ctx - 1) / sps - fd / sps + 1)
      } else {
        assert(r.getAs[Long]("first_dirty_seq") == -1L)
        assert(r.getAs[Long]("shards_dirty") == 0L)
      }
    }
    // Both arms are REAL at this sf — a clean source (zeros row) and a
    // recalled one — so the spec never passes vacuously.
    assert(got.values.exists(_.getAs[Long]("n_removed") == 0L))
    assert(got.values.exists(_.getAs[Long]("n_removed") > 0L))
  }

  test("cur25 tombstone mask: tiles each removed doc exactly; conserves cur24's removal mass") {
    val ctx = Curation.Cur18CtxTokens
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Curation.cur25TombstoneMask(spark, sf).collect()
    assert(rows.nonEmpty)
    // Every mask span sits inside its sequence, inclusive-end, with
    // the per-row mass law and the shard derivation.
    rows.foreach { r =>
      val (s0, e0) = (r.getAs[Long]("mask_start"), r.getAs[Long]("mask_end"))
      assert(s0 >= 0 && e0 < ctx && s0 <= e0, s"span [$s0,$e0] out of sequence")
      assert(r.getAs[Long]("masked_toks") == e0 - s0 + 1)
      assert(r.getAs[Long]("shard") ==
        r.getAs[Long]("seq") / Curation.Cur20SeqsPerShard)
    }
    // TILING: per removed doc, the mask rows abut gaplessly in global
    // stream coordinates and cover exactly [cum_start, cum_end).
    val recalled = Curation.cur18TrainManifest(spark, sf).collect()
      .filter(r => md5hex("takedown:" + r.getAs[Long]("doc_id")).take(2)
        < Curation.TakedownHexThr)
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("seq_first") * ctx + r.getAs[Long]("off_first"),
          r.getAs[Long]("post_toks"))))
      .toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == recalled.keySet,
      "every recalled doc (and only those) must carry mask rows")
    byDoc.foreach { case (id, rs) =>
      val spans = rs.map(r =>
        (r.getAs[Long]("seq") * ctx + r.getAs[Long]("mask_start"),
          r.getAs[Long]("seq") * ctx + r.getAs[Long]("mask_end")))
        .sortBy(_._1)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 == e1 + 1, s"doc $id gap")
        case _ => ()
      }
      val (cumStart, toks) = recalled(id)
      assert(spans.head._1 == cumStart && spans.last._2 == cumStart + toks - 1,
        s"doc $id mask must tile its exact token range")
    }
    // CONSERVATION: the two takedown executions remove the same mass —
    // per source, Σ masked_toks == cur24's toks_removed.
    val t24 = Curation.cur24Takedown(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("toks_removed"))
      .toMap
    val masked = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("masked_toks")).sum).toMap
    t24.foreach { case (src, tr) =>
      assert(masked.getOrElse(src, 0L) == tr, s"$src conservation vs cur24")
    }
  }

  test("cur26 repack: clean-prefix shards byte-identical, removed docs gone, mass conserved") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sps = Curation.Cur20SeqsPerShard
    type ShardRow = (Long, Long, Long, Long, Long)
    def audit(df: org.apache.spark.sql.DataFrame): Map[(String, Long), ShardRow] =
      df.collect().map(r => (r.getString(0), r.getAs[Long]("shard")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("payload_toks"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("seq_toks"),
          r.getAs[Long]("seq_hash_sum")))).toMap
    val before = audit(Curation.cur23PayloadShards(spark, sf))
    val after = audit(Curation.cur26RepackExecute(spark, sf))
    val t24 = Curation.cur24Takedown(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("first_dirty_seq"), r.getAs[Long]("toks_removed"))))
      .toMap
    // PREFIX IDENTITY — the law that makes a repack affordable: every
    // shard strictly before the source's first dirty sequence's shard
    // carries IDENTICAL filed docs, sequence counts, token counts, and
    // content hash sums (clean sources: every shard). An executor
    // rewrites only the dirty suffix cur24 priced.
    t24.foreach { case (src, (fd, _)) =>
      val cleanBound = if (fd < 0) Long.MaxValue else fd / sps
      before.keys.filter(k => k._1 == src && k._2 < cleanBound).foreach { k =>
        assert(after.get(k).contains(before(k)),
          s"clean-prefix shard $k must be byte-identical post-repack")
      }
      // And the dirty shard itself genuinely changed where a removal
      // exists (the identity above is not vacuous).
      if (fd >= 0) {
        val dirty = (src, fd / sps)
        assert(before.get(dirty) != after.get(dirty),
          s"the first dirty shard $dirty must differ post-repack")
      }
    }
    // Removed docs appear in NO emitted file.
    val emitted = spark.read.parquet(Curation.cur26OutDir(spark, sf))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(emitted.nonEmpty)
    emitted.foreach { id =>
      assert(md5hex("takedown:" + id).take(2) >= Curation.TakedownHexThr,
        s"removed doc $id survived the repack")
    }
    // CONSERVATION: per source the payload mass drops by exactly
    // cur24's toks_removed; the shard range never grows.
    t24.foreach { case (src, (_, removed)) =>
      val b = before.collect { case ((s, _), r) if s == src => r._2 }.sum
      val a = after.collect { case ((s, _), r) if s == src => r._2 }.sum
      assert(a == b - removed, s"$src payload mass")
      val bMax = before.keys.collect { case (s, sh) if s == src => sh }.max
      val aMax = after.keys.collect { case (s, sh) if s == src => sh }
        .maxOption.getOrElse(-1L)
      assert(aMax <= bMax, s"$src shard range must not grow")
    }
  }

  test("cur28 span redaction: mask rows tile exactly the sub-doc span; straddle arm real") {
    val ctx = Curation.Cur18CtxTokens
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Curation.cur28SpanRedaction(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s0, e0) = (r.getAs[Long]("mask_start"), r.getAs[Long]("mask_end"))
      assert(s0 >= 0 && e0 < ctx && s0 <= e0, s"span [$s0,$e0] out of sequence")
      assert(r.getAs[Long]("masked_toks") == e0 - s0 + 1)
      assert(r.getAs[Long]("shard") ==
        r.getAs[Long]("seq") / Curation.Cur20SeqsPerShard)
    }
    // TILING: per recalled doc the rows abut gaplessly in global stream
    // coordinates and cover EXACTLY the deterministic sub-doc span
    // [cum_start + T/4, cum_start + max(T/4 + 1, T/2)) — never the
    // whole doc for any T ≥ 3 (the sub-document point of the operator).
    val recalled = Curation.cur18TrainManifest(spark, sf).collect()
      .filter(r => md5hex("redact:" + r.getAs[Long]("doc_id")).take(2)
        < Curation.RedactHexThr)
      .map { r =>
        val cum = r.getAs[Long]("seq_first") * ctx + r.getAs[Long]("off_first")
        val t = r.getAs[Long]("post_toks")
        r.getAs[Long]("doc_id") ->
          ((cum + t / 4, cum + math.max(t / 4 + 1, t / 2), t))
      }.toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == recalled.keySet,
      "every span-recalled doc (and only those) must carry mask rows")
    byDoc.foreach { case (id, rs) =>
      val spans = rs.map(r =>
        (r.getAs[Long]("seq") * ctx + r.getAs[Long]("mask_start"),
          r.getAs[Long]("seq") * ctx + r.getAs[Long]("mask_end")))
        .sortBy(_._1)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 == e1 + 1, s"doc $id gap")
        case _ => ()
      }
      val (lo, hi, t) = recalled(id)
      assert(spans.head._1 == lo && spans.last._2 == hi - 1,
        s"doc $id mask must tile its exact sub-doc span")
      if (t >= 3)
        assert(hi - lo < t, s"doc $id span must be strictly sub-doc")
    }
    // The boundary-straddling arm is REAL at this sf: at least one
    // span crosses a sequence boundary (two rows for one doc).
    assert(byDoc.values.exists(_.length > 1),
      "no span straddles a sequence boundary at this sf — vacuous arm")
  }

  test("cur27 mask-read == repack-read token-for-token; boundary-straddling recall is real") {
    val ctx = Curation.Cur18CtxTokens
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Curation.cur27MaskEquivalence(spark, sf).collect()
    assert(rows.nonEmpty)
    // THE LAW: every post-takedown sequence reads identically through
    // the two execution paths — same token count, same order-preserving
    // content hash, verdict true on every row (no leg may produce a
    // sequence the other lacks: the full-outer join would surface it as
    // a zero-hash row with is_match false).
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_match"), s"mismatch at $r")
      assert(r.getAs[Long]("masked_toks") == r.getAs[Long]("repack_toks"))
      assert(r.getAs[Long]("masked_hash") == r.getAs[Long]("repack_hash"))
      assert(r.getAs[Long]("masked_toks") > 0, s"empty sequence at $r")
    }
    // Coordinates: per source the sequences are exactly 0..seqs_after-1
    // (cur24's count — the repack's tiling), and the survivor mass is
    // conserved: Σ seq tokens == toks_before − toks_removed.
    val t24 = Curation.cur24Takedown(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("seqs_after"),
          r.getAs[Long]("n_before"), r.getAs[Long]("toks_removed"))))
      .toMap
    val man = Curation.cur18TrainManifest(spark, sf).collect()
    val toksBefore = man.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("post_toks")).sum).toMap
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.keySet == t24.keySet)
    bySrc.foreach { case (src, rs) =>
      val (seqsAfter, _, removed) = t24(src)
      assert(rs.map(_.getAs[Long]("seq")).sorted.toSeq ==
        (0L until seqsAfter), s"$src sequence tiling")
      assert(rs.map(_.getAs[Long]("masked_toks")).sum ==
        toksBefore(src) - removed, s"$src survivor mass")
    }
    // The INTERESTING arms are real at this sf, not vacuous: at least
    // one recalled doc straddles a sequence boundary (the mask spans
    // two sequences and the re-tile must rejoin the halves), and at
    // least one mask covers only PART of its sequence (survivor tokens
    // and masked tokens share a sequence).
    val recalled = man.filter(r =>
      md5hex("takedown:" + r.getAs[Long]("doc_id")).take(2)
        < Curation.TakedownHexThr)
    assert(recalled.exists(r =>
        r.getAs[Long]("seq_first") < r.getAs[Long]("seq_last")),
      "no recalled doc straddles a sequence boundary at this sf — " +
        "the boundary arm would be vacuous")
    val masks = Curation.cur25TombstoneMask(spark, sf).collect()
    assert(masks.exists(r => r.getAs[Long]("mask_start") > 0 ||
        r.getAs[Long]("mask_end") < ctx - 1),
      "no partial-sequence mask at this sf")
  }

  test("cur29 composed masks: conservation of doubly-scrubbed mass; span masks really fire; tiling gapless") {
    val ctx = Curation.Cur18CtxTokens
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Curation.cur29ComposedMasks(spark, sf).collect()
    assert(rows.nonEmpty)
    // Sequences tile 0..n-1 per source (the re-tile law, composed).
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val seqs = rs.map(_.getAs[Long]("seq")).sorted.toSeq
      assert(seqs == (0L until seqs.length).toSeq, s"$src tiling gap")
    }
    // CONSERVATION: per source, Σ n_toks equals the manifest's
    // doubly-scrubbed mass — non-takedown docs' post_toks minus the
    // clamped span of redact-flagged survivors. A composition that
    // double-counts an overlap, misses a span, or leaks a takedown
    // token moves the per-source total.
    val man = Curation.cur18TrainManifest(spark, sf).collect()
    def flag(salt: String, id: Long, thr: String) =
      md5hex(salt + id).take(2) < thr
    val expected = man
      .filter(r => !flag("takedown:", r.getAs[Long]("doc_id"),
        Curation.TakedownHexThr))
      .groupBy(_.getAs[String]("source"))
      .map { case (src, docs) =>
        src -> docs.map { r =>
          val t = r.getAs[Long]("post_toks")
          val spanLen =
            if (flag("redact:", r.getAs[Long]("doc_id"), Curation.RedactHexThr))
              math.min(math.max(t / 4 + 1, t / 2), t) - t / 4
            else 0L
          t - spanLen
        }.sum
      }
    val got = rows.groupBy(_.getString(0))
      .map { case (src, rs) => src -> rs.map(_.getAs[Long]("n_toks")).sum }
    assert(got == expected, "doubly-scrubbed token mass not conserved")
    // The span family REALLY fires at this sf (otherwise cur29 is a
    // vacuous re-run of cur27's leg A): at least one surviving doc is
    // redact-flagged, and the composed total is strictly below the
    // takedown-only masked total. (The takedown∧redact OVERLAP case
    // may not occur at this sf — it is property-proved for arbitrary
    // packings in GraftProps' composed-mask law.)
    assert(man.exists(r => !flag("takedown:", r.getAs[Long]("doc_id"),
        Curation.TakedownHexThr) &&
      flag("redact:", r.getAs[Long]("doc_id"), Curation.RedactHexThr)),
      "no surviving redact doc at this sf — span arm vacuous")
    val cur27Total = Curation.cur27MaskEquivalence(spark, sf).collect()
      .map(_.getAs[Long]("masked_toks")).sum
    assert(got.values.sum < cur27Total,
      "composed masks must remove strictly more than takedown alone")
  }

  test("cur30 composed repack: retired read == cur29 composed read; clean-prefix shards byte-identical; both families' bytes gone") {
    import org.apache.spark.sql.functions._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sps = Curation.Cur20SeqsPerShard
    // THE MASKS-RETIRED LAW (the operator's whole point): a loader of
    // the re-emitted shards with an EMPTY skip list reads, hash for
    // hash per (source, seq), exactly what cur29's composed masked
    // read over the ORIGINAL shards + full skip list reads — so after
    // the emit, BOTH accumulated mask families can be dropped. This is
    // cur27's mask↔repack law carried to the composed deployment
    // state, and it is deliberately measured from the FILES on both
    // sides (the emitted cur30 shards; cur23's emitted originals under
    // cur29's masks).
    val retired = Curation.reassembledSequences(
        Curation.payloadShardEmit(spark, Curation.cur30Payload(spark, sf),
          Curation.cur30OutDir(spark, sf), "cur30", sf))
      .select(col("source"), col("seq"),
        size(col("stoks")).cast("long").as("n_toks"),
        graft.functions.GraftFunctions.tokenHash64(
          array_join(col("stoks"), " ")).as("content_hash"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val composed = Curation.cur29ComposedMasks(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("seq")) ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("content_hash")))).toMap
    assert(retired == composed,
      "post-repack loader read must equal cur29's composed masked read")
    // PREFIX IDENTITY, composed: every shard strictly before a
    // source's first dirty sequence — now the min over BOTH families'
    // mask rows — is byte-identical to the original emit (identical
    // docs, tokens, sequence hash sums), and the first dirty shard
    // itself genuinely changed (non-vacuous).
    type ShardRow = (Long, Long, Long, Long, Long)
    def audit(df: org.apache.spark.sql.DataFrame): Map[(String, Long), ShardRow] =
      df.collect().map(r => (r.getString(0), r.getAs[Long]("shard")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("payload_toks"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("seq_toks"),
          r.getAs[Long]("seq_hash_sum")))).toMap
    val before = audit(Curation.cur23PayloadShards(spark, sf))
    val after = audit(Curation.cur30ComposedRepack(spark, sf))
    val firstDirty = (Curation.cur25TombstoneMask(spark, sf).collect() ++
        Curation.cur28SpanRedaction(spark, sf).collect())
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("seq")).min).toMap
    before.keys.foreach { case k @ (src, sh) =>
      val bound = firstDirty.get(src).map(_ / sps).getOrElse(Long.MaxValue)
      if (sh < bound)
        assert(after.get(k).contains(before(k)),
          s"clean-prefix shard $k must be byte-identical post-retire")
    }
    assert(firstDirty.nonEmpty)
    firstDirty.foreach { case (src, fd) =>
      val dirty = (src, fd / sps)
      assert(before.get(dirty) != after.get(dirty),
        s"the first composed-dirty shard $dirty must differ post-retire")
    }
    // BYTES GONE, both families: no takedown doc survives in any
    // emitted file, and every emitted redact-flagged doc's stored
    // token count is its manifest count MINUS its clamped span — the
    // redaction physically left the array, not just the skip list.
    val manToks = Curation.cur18TrainManifest(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("post_toks")).toMap
    val emitted = spark.read.parquet(Curation.cur30OutDir(spark, sf))
      .select(col("doc_id"), col("post_toks")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(emitted.nonEmpty)
    var redactSeen = 0
    emitted.foreach { case (id, stored) =>
      assert(md5hex("takedown:" + id).take(2) >= Curation.TakedownHexThr,
        s"takedown doc $id survived the composed retire")
      val t = manToks(id)
      if (md5hex("redact:" + id).take(2) < Curation.RedactHexThr) {
        redactSeen += 1
        val spanLen = math.min(math.max(t / 4 + 1, t / 2), t) - t / 4
        assert(stored == t - spanLen,
          s"redact doc $id must store its span-sliced array ($stored vs $t-$spanLen)")
      } else assert(stored == t, s"untouched doc $id changed size")
    }
    assert(redactSeen > 0, "no redact-flagged survivor at this sf — span arm vacuous")
  }

  test("cur31 mask vacuum: lifecycle audit; loud read-after-expiry; retention algebra; double-mask hazard") {
    import org.apache.spark.sql.functions._
    import graft.sources.CodebookStore
    val rows = Curation.cur31MaskVacuum(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    val byV = rows.map(r => r.getAs[Long]("version") -> r).toMap
    // The audit counts are the REAL mask frames' (one derivation with
    // cur25/cur28 — the ledger the vacuum retires is the composed skip
    // list cur29's read pays).
    val tdRows = Curation.cur25TombstoneMask(spark, sf).collect()
    val spRows = Curation.cur28SpanRedaction(spark, sf).collect()
    assert(tdRows.nonEmpty && spRows.nonEmpty, "a mask family is vacuous at this sf")
    def mt(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("masked_toks")).sum
    assert(byV(1L).getAs[Long]("n_rows") == tdRows.length)
    assert(byV(1L).getAs[Long]("takedown_rows") == tdRows.length)
    assert(byV(1L).getAs[Long]("span_rows") == 0L)
    assert(byV(1L).getAs[Long]("masked_toks") == mt(tdRows))
    assert(byV(2L).getAs[Long]("n_rows") == tdRows.length + spRows.length)
    assert(byV(2L).getAs[Long]("span_rows") == spRows.length)
    assert(byV(2L).getAs[Long]("masked_toks") == mt(tdRows) + mt(spRows))
    assert(byV(3L).getAs[Long]("n_rows") == 0L, "v3 must be the EMPTY post-repack ledger")
    assert(rows.map(r => r.getAs[Long]("version") -> r.getAs[Boolean]("retained")).toMap
      == Map(1L -> false, 2L -> false, 3L -> true))
    assert(rows.forall(_.getAs[Long]("n_expired") == 2L))
    // Loud read-after-expiry (etl27's discipline): a loader can never
    // silently resolve a retired skip list; the surviving current
    // version is the empty ledger — the post-repack read state.
    val base = Curation.cur31LedgerDir(sf)
    intercept[NoSuchElementException](CodebookStore.frameAt(spark, base, 1L))
    intercept[NoSuchElementException](CodebookStore.frameAt(spark, base, 2L))
    assert(CodebookStore.frameAt(spark, base, 3L).count() == 0L)
    assert(CodebookStore.latest(spark, base).contains(3L))
    // Retention algebra: retire(K1); retire(K2) lands the same retained
    // set as one-shot retire(K2), and the replay is a no-op — on a
    // scratch replay of the same 3-version lifecycle.
    val scratch = base + "_algebra"
    val (td, sp) = Curation.cur31MaskFamilies(spark, sf)
    CodebookStore.reset(spark, scratch)
    CodebookStore.publishFrame(spark, scratch, td)
    CodebookStore.publishFrame(spark, scratch, td.unionByName(sp))
    CodebookStore.publishFrame(spark, scratch, td.limit(0))
    assert(CodebookStore.expireVersions(spark, scratch, keepLast = 2) == Seq(1L))
    assert(CodebookStore.expireVersions(spark, scratch, keepLast = 1) == Seq(2L))
    assert(CodebookStore.versions(spark, scratch) == Seq(3L),
      "stepwise retirement must converge to the one-shot retained set")
    assert(CodebookStore.expireVersions(spark, scratch, keepLast = 1).isEmpty)
    CodebookStore.reset(spark, scratch)
    // THE DOUBLE-MASK HAZARD (the vacuum's motivating law): a loader
    // that keeps applying the RETIRED composed ledger to cur30's
    // repacked shards masks offsets that now hold VALID survivor
    // tokens — it reads strictly less than the pinned post-repack
    // read (cur30's masks-retired law: repacked + empty skip list ==
    // cur29's composed read), so the stale read can never equal it.
    val repacked = Curation.reassembledSequences(
      Curation.payloadShardEmit(spark, Curation.cur30Payload(spark, sf),
        Curation.cur30OutDir(spark, sf), "cur30", sf))
    val staleMk = td.unionByName(sp)
      .groupBy("source", "seq")
      .agg(collect_list(struct(col("mask_start"), col("mask_end"))).as("mk"))
    val staleSurvivors = repacked
      .join(broadcast(staleMk), Seq("source", "seq"), "left")
      .select(when(col("mk").isNull, size(col("stoks"))).otherwise(
        size(filter(sequence(lit(0), size(col("stoks")) - 1), p =>
          !exists(col("mk"), m =>
            p >= m.getField("mask_start") && p <= m.getField("mask_end")))))
        .cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val pinned = Curation.cur29ComposedMasks(spark, sf)
      .agg(sum("n_toks")).collect()(0).getLong(0)
    val repackedTotal = repacked
      .agg(sum(size(col("stoks")).cast("long"))).collect()(0).getLong(0)
    assert(repackedTotal == pinned,
      "masks-retired law: repacked + empty skip list must carry cur29's token mass")
    assert(staleSurvivors < pinned,
      s"stale composed ledger over the repacked shards must drop valid survivor " +
        s"tokens ($staleSurvivors vs $pinned) — the hazard the vacuum removes")
  }

  test("cur21 histogram cut: local replay; kept set is a prefix-subset of cur08's exact cut") {
    val rows = Curation.cur21HistogramBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getString(0) ->
      (r.getInt(1), r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val budget = Curation.SourceCharBudget
    val bySrc = docs.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    bySrc.foreach { case (src, ds) =>
      def bucket(id: Long) = Integer.parseInt(md5hex(id.toString).take(2), 16)
      // Replay the whole protocol locally: histogram, cumulative cut,
      // bucket-granular selection.
      val hist = ds.groupBy(d => bucket(d._1))
        .map { case (b, rows) => b -> rows.map(_._3).sum }
      var cum = 0L; var cut = -1
      hist.keys.toSeq.sorted.foreach { b =>
        cum += hist(b); if (cum <= budget) cut = b
      }
      val kept = ds.filter(d => bucket(d._1) <= cut)
      assert(got(src)._1 == cut, s"$src bucket_cut")
      assert(got(src)._2 == kept.length, s"$src n_kept")
      assert(got(src)._3 == kept.map(_._3).sum, s"$src chars_kept")
      assert(kept.map(_._3).sum <= budget, s"$src budget respected")
      // The trade priced: the approx kept set is a subset of cur08's
      // exact greedy prefix (same hash order, bucket-truncated), so
      // approx utilization can only undershoot the exact one.
      val ordered = ds.sortBy(d => (md5hex(d._1.toString).take(8), d._1))(
        Ordering.Tuple2(Ordering.String, Ordering.Long))
      var c2 = 0L
      val exactIds = ordered.takeWhile { d =>
        c2 += d._3; c2 <= budget
      }.map(_._1).toSet
      assert(kept.map(_._1).toSet.subsetOf(exactIds), s"$src approx ⊄ exact")
    }
  }

  test("cur22 histogram select: cut replayed from the score grid; kept set inside cur10's keep") {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.functions.{col, round}
    val rows = Curation.cur22HistogramSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("target"),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getAs[Long]("n_kept"))).toMap
    // Rebuild the per-doc score grid through the SAME shared
    // expressions the operator (and cur10) select on.
    val scored = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        round(TextAnalysis.qualityScore(GraftFunctions.tokens(col("text"))) * 10000)
          .cast("long").as("qi"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = scored.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val (nDocs, target, cutScore, nKept) = got(src)
      assert(nDocs == ds.length, s"$src n_docs")
      assert(target == (ds.length * Curation.QualityKeepNum +
          Curation.QualityKeepDen - 1) / Curation.QualityKeepDen,
        s"$src target")
      // Replay the descending-histogram cut locally.
      val hist = ds.groupBy(_._3).map { case (qi, rs) => qi -> rs.length.toLong }
      var cum = 0L; var cut = Option.empty[Long]
      hist.keys.toSeq.sorted(Ordering[Long].reverse).foreach { qi =>
        cum += hist(qi); if (cum <= target) cut = Some(qi)
      }
      assert(cutScore.map(c => math.round(c * 10000)) == cut, s"$src cut")
      val kept = cut.toSeq.flatMap(c => ds.filter(_._3 >= c))
      assert(nKept == kept.length, s"$src n_kept")
      assert(nKept <= target, s"$src kept within target")
      // Subset of cur10's exact keep: kept docs all rank <= target in
      // the (score desc, doc_id) order cur10 cuts on.
      val exactKeep = ds.sortBy(d => (-d._3, d._1))(
        Ordering.Tuple2(Ordering.Long, Ordering.Long))
        .take(target.toInt).map(_._1).toSet
      assert(kept.map(_._1).toSet.subsetOf(exactKeep), s"$src approx ⊄ exact")
      // Maximality: the next bucket below the cut would overflow.
      cut.foreach { c =>
        val below = hist.keys.filter(_ < c)
        if (below.nonEmpty) {
          val kc = kept.length + hist(below.max)
          assert(kc > target, s"$src cut not maximal")
        }
      }
    }
  }

  test("keep target is exact integer arithmetic, pinned at fraction boundaries") {
    // round-15 ADVICE: ceil(n * 0.3) agreed with ceil(3n/10) only
    // because the 0.3 double under-approximates — the integer form
    // makes boundary counts (n a multiple of the denominator, where a
    // double product could round across the integer) exact by
    // construction on both engine and oracle sides.
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val ns = Seq(1L, 9L, 10L, 20L, 30L, 100L, 1000000007L)
    val got = ns.toDF("n")
      .select(col("n"), Curation.keepTarget(col("n")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val exact = (n * Curation.QualityKeepNum + Curation.QualityKeepDen - 1) /
        Curation.QualityKeepDen
      assert(got(n) == exact, s"n=$n")
    }
    // The boundary rows specifically: 3n/10 integer ⇒ target is EXACTLY it.
    assert(got(10L) == 3L && got(20L) == 6L && got(30L) == 9L && got(100L) == 30L)
  }

  test("cur19 short-doc arm: a held doc under the window width still reports a zeros row") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val k = Dedup.SubstringWindow
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (100L, "src0", toks("c", k - 5)), // under the window width: 0 windows
      (101L, "src0", toks("d", k)),     // exactly k: 1 window, fully leaked
      (1L, "src1", toks("d", k)))       // the offender
      .toDF("doc_id", "source", "text")
    val w = Dedup.strideWindowRows(docs, carry = Seq("source"))
    val rows = Curation.leakReport(w,
      docs.filter(col("source") === "src0")
        .select(col("doc_id").as("held_id")),
      col("source") === "src0")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // The short doc cannot leak what it cannot window — and the report
    // says so with a zeros row instead of omitting the doc.
    assert(rows(100L) == ((0L, 0L, 0L, -1L, 0L)), s"short doc: ${rows.get(100L)}")
    assert(rows(101L) == ((1L, 1L, 1L, 1L, 1L)), s"leaked doc: ${rows.get(101L)}")
  }

  test("cur21/cur22 degenerate arms: nothing fits -> keep nothing, flagged in-band") {
    // Both arms are data-unreachable on the test corpus (per-bucket
    // mass far under the budget; scores near-unique), so hand corpora
    // pin them — the dedup14 discipline for unreachable branches.
    val spark2 = spark
    import spark2.implicits._
    // cur21: srcA's every doc is bigger than the whole budget — even
    // the first bucket overflows; srcB fits entirely.
    val big = Seq(
      (1L, "srcA", 5000L), (2L, "srcA", 6000L),
      (3L, "srcB", 10L), (4L, "srcB", 20L))
      .toDF("doc_id", "source", "n_chars")
    val b = Curation.histogramBudget(big, Curation.SourceCharBudget)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"))).toMap
    assert(b("srcA") == ((-1, 0L, 0L)), s"srcA must keep nothing: ${b("srcA")}")
    assert(b("srcB")._2 == 2L && b("srcB")._3 == 30L)
    // cur22: srcC's docs all share ONE score bucket bigger than the
    // target (ceil(0.3*4)=2 < 4) -> null cut, keep nothing; srcD's
    // scores are distinct and select normally.
    val scored = Seq(
      (1L, "srcC", 9000L), (2L, "srcC", 9000L),
      (3L, "srcC", 9000L), (4L, "srcC", 9000L),
      (5L, "srcD", 9500L), (6L, "srcD", 9400L),
      (7L, "srcD", 9300L), (8L, "srcD", 9200L))
      .toDF("doc_id", "source", "qi")
    val s = Curation.histogramSelect(scored)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(3)), r.getAs[Long]("n_kept"))).toMap
    assert(s("srcC") == ((None, 0L)), s"srcC must keep nothing: ${s("srcC")}")
    // srcD: target = ceil(4·0.3) = 2, so the cut walks 9500 (cum 1)
    // then 9400 (cum 2) and stops — keep the top two.
    assert(s("srcD") == ((Some(0.94), 2L)), s"srcD top-2: ${s("srcD")}")
  }

  test("text10 repetition signals are fractions; dups agree doc-to-doc") {
    val rows = TextAnalysis.text10Repetition(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      for (i <- 1 to 4) {
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"doc ${r.getLong(0)} col $i: $v")
      }
      // A doc's most frequent word accounts for at least as much mass as
      // its most frequent bigram count can (bigrams repeat no more often
      // than their constituent words).
      assert(r.getDouble(1) > 0.0)
    }
    // Hand-recompute the word-level signals for a sample of docs from
    // the raw text and compare (the bigram path is pinned the same way
    // by the DuckDB oracle at sf0.01).
    val byDoc = rows.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(25)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      val counts = text.split(" ", -1).groupBy(identity).map(_._2.length)
      val t = counts.sum.toDouble
      val expTop = BigDecimal(counts.max / t)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expDup = BigDecimal(1.0 - counts.size / t)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(byDoc(id)._1 - expTop) < 1e-9, s"doc $id top_word_frac")
      assert(math.abs(byDoc(id)._2 - expDup) < 1e-9, s"doc $id dup_word_frac")
    }
  }

  // The engine-portable 60-bit token hash (GraftFunctions.tokenHash64's
  // contract) replayed on the driver.
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("cur13 importance weights match an exact BigInt replay of DSIR scoring") {
    val b = Curation.ImportanceBuckets
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tokBkt = docs.map { case (id, src, text) =>
      (id, src, text.split(" ", -1).map(t => hash60(t) % b))
    }
    val ct = Array.fill(b)(0L); val cr = Array.fill(b)(0L)
    tokBkt.foreach { case (_, src, bks) =>
      val tgt = if (src == "src0") ct else cr
      bks.foreach(k => tgt(k.toInt) += 1)
    }
    val (tt, tr) = (ct.sum, cr.sum)
    val ws = (0 until b).map { k =>
      (BigInt(Curation.ImportanceScale) * BigInt(ct(k) + 1) * BigInt(tr + b) /
        (BigInt(cr(k) + 1) * BigInt(tt + b))).toLong
    }
    val scored = tokBkt.filter(_._2 != "src0").map { case (id, src, bks) =>
      val s = bks.map(k => ws(k.toInt)).sum
      (id, src, bks.length.toLong, s / bks.length)
    }
    val expected = scored.groupBy(_._2).values.flatMap { perSrc =>
      val keep = (perSrc.length + 4) / 5
      perSrc.sortBy { case (id, _, _, avg) => (-avg, id) }.take(keep)
    }.toSeq.sortBy(_._1)
      .map { case (id, src, n, avg) =>
        (id, src, n, avg / Curation.ImportanceScale.toDouble)
      }
    val got = Curation.cur13ImportanceWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(expected.nonEmpty, "the cut should select some docs")
    assert(got == expected)
    // The 20% cut must actually reject docs in every source.
    val rawDocs = docs.count(_._2 != "src0")
    assert(got.length < rawDocs, "the cut should also reject some docs")
  }

  test("cur15 classifier matches an exact BigInt replay of the whole training trajectory") {
    val b = Curation.ImportanceBuckets
    val S = BigInt(Curation.Cur15Scale)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // Features: hashed-unigram bucket counts + the bias bucket.
    val feats = docs.map { case (id, src, text) =>
      val counts = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      text.split(" ", -1).foreach(t => counts(hash60(t) % b) += 1)
      counts(Curation.Cur15Bias) += 1
      (id, src, counts.toMap,
        if (src == "src0") BigInt(1) else BigInt(0))
    }
    val n = BigInt(docs.length)
    def sigma(m: BigInt): BigInt =
      (S * (S + m.abs + m)) / (BigInt(2) * (S + m.abs))
    var w = Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
    for (_ <- 1 to Curation.Cur15Iters) {
      val ps = feats.map { case (_, _, f, y) =>
        (f, y, sigma(f.iterator.map { case (k, x) => w(k) * x }.sum))
      }
      val g = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      ps.foreach { case (f, y, p) =>
        f.foreach { case (k, x) => g(k) += (p - y * S) * x }
      }
      // BigInt / truncates toward zero — the semantics all three
      // arithmetics (this replay, IntegralDivide, DuckDB //) share.
      val div = BigInt(Curation.Cur15Rate) * n
      w = g.foldLeft(w) { case (acc, (k, gv)) =>
        acc.updated(k, acc(k) - gv / div)
      }
    }
    val scored = feats.filter(_._4 == 0).map { case (id, src, f, _) =>
      (id, src, sigma(f.iterator.map { case (k, x) => w(k) * x }.sum))
    }
    val thr = scored.map(_._3).sum / BigInt(scored.length)
    def intRatio(num: BigInt, den: BigInt, dp: Int): Double =
      ((BigInt(2) * BigInt(10).pow(dp) * num + den) / (BigInt(2) * den)).toDouble /
        math.pow(10, dp)
    val expected = scored.groupBy(_._2).toSeq.map { case (src, rows) =>
      val nk = rows.count(_._3 > thr)
      (src, rows.length.toLong, nk.toLong,
        intRatio(BigInt(nk), BigInt(rows.length), 4),
        intRatio(rows.map(_._3).sum, BigInt(rows.length) * S, 6))
    }.sortBy(_._1)
    val got = Curation.cur15QualityClassifier(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // The trained model must actually DISCRIMINATE: keep rates differ
    // across sources, and the pool-mean cut keeps a strict subset.
    assert(got.map(_._4).distinct.size > 1,
      "all sources kept at the same rate - the classifier learned nothing")
    val (kept, total) = (got.map(_._3).sum, got.map(_._2).sum)
    assert(kept > 0 && kept < total)
  }

  test("text15 CMS estimates match a driver sketch replay and never undercount") {
    val (d, w) = (TextAnalysis.CmsDepth, TextAnalysis.CmsWidth)
    val words = graft.sources.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
    val counts = words.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def bucket(i: Int, t: String): Long = hash60(s"$i:$t") % w
    val sketch = new scala.collection.mutable.HashMap[(Int, Long), Long]
      .withDefaultValue(0L)
    counts.foreach { case (t, c) =>
      (0 until d).foreach(i => sketch((i, bucket(i, t))) += c)
    }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val expected = top.map { case (t, c) =>
      val est = (0 until d).map(i => sketch((i, bucket(i, t)))).min
      (t, c, est, est - c, true)
    }
    val got = TextAnalysis.text15CmsTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
    got.foreach { case (t, exact, est, over, neverUnder) =>
      assert(neverUnder && est >= exact && over == est - exact, s"token $t")
    }
    // The narrow sketch must actually collide somewhere, or the audit
    // is vacuous.
    assert(got.exists(_._4 > 0), "expected at least one CMS overcount")
  }

  test("cur14 epoch schedule equals a driver-side greedy replay, budget holds") {
    import org.apache.spark.sql.functions._
    val masses = graft.sources.Tables.documents(spark, sf)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = masses.values.sum * Curation.EpochBudgetMult
    // Greedy replay: rank (source, epoch) by halved utility, admit the
    // prefix whose running cost fits the budget.
    val cand = for {
      (s, t) <- masses.toSeq
      e <- 1 to Curation.MaxEpochs
      u = t >> (e - 1) if u > 0
    } yield (s, e, u, t)
    var cum = 0L
    val expected = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    cand.sortBy { case (s, e, u, _) => (-u, s, e) }.foreach {
      case (s, _, _, t) =>
        cum += t
        if (cum <= budget) {
          val (n, used) = expected(s); expected(s) = (n + 1, used + t)
        }
    }
    val got = Curation.cur14EpochSchedule(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == masses.keySet, "every source must appear")
    got.foreach { case (s, (t, epochs, used)) =>
      assert(t == masses(s), s"source $s token mass")
      assert((epochs, used) == expected(s), s"source $s allocation")
      assert(used == epochs * t, s"source $s cost law")
      assert(epochs <= Curation.MaxEpochs)
    }
    // The budget binds: total fits, and the regime is data-constrained
    // (something repeats) without being degenerate (not everything
    // maxes out).
    val totalUsed = got.values.map(_._3).sum
    assert(totalUsed <= budget, "allocation must fit the budget")
    assert(got.values.exists(_._2 > 1), "budget 2x must force repeats")
  }
}
