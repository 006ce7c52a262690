package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("dedup03 (MinHash+LSH) finds exactly the dedup02 (exact) pair set") {
    val exact = Dedup.dedup02NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.dedup03MinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact, "LSH-verified pairs must equal the exact pair set at t=0.8")
    assert(exact.nonEmpty, "test data should contain at least one near-dup pair")
  }

  test("dedup11 incremental ingest matches a driver-side no-LSH replay") {
    val got = Dedup.dedup11IncrementalIngest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (arr, corp) = docs.partition(_._1 % Dedup.IngestMod == Dedup.IngestRem)
    assert(got.map(_._1).sorted.toSeq == arr.map(_._1).sorted.toSeq,
      "exactly one decision per arriving doc")
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ")
    def shingles(t: String) = {
      val toks = t.split(" ")
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty[String]
    }
    val corpNorm = corp.map { case (id, t) => (id, norm(t)) }
    val corpSh = corp.map { case (id, t) => (id, shingles(t)) }
    // Replay with NO LSH: exact fingerprint, then exhaustive Jaccard —
    // a Spark-side LSH recall miss shows up as a decision mismatch.
    val expected = arr.sortBy(_._1).map { case (id, t) =>
      corpNorm.filter(_._2 == norm(t)).map(_._1).sorted.headOption match {
        case Some(k) => (id, "exact", k, 1.0)
        case None =>
          val s = shingles(t)
          val nears = corpSh.flatMap { case (kid, ks) =>
            val inter = (s & ks).size.toLong
            val uni = s.size.toLong + ks.size - inter
            if (uni > 0 && inter.toDouble / uni >= Dedup.JaccardThreshold)
              Some((kid, inter, uni, inter.toDouble / uni))
            else None
          }
          if (nears.isEmpty) (id, "admit", -1L, 0.0)
          else {
            val (kid, inter, uni, _) =
              nears.minBy { case (k2, _, _, j) => (-j, k2) }
            (id, "near", kid, ((2 * 10000 * inter + uni) / (2 * uni)) / 10000.0)
          }
      }
    }
    assert(got.sortBy(_._1).toSeq == expected.toSeq,
      "incremental decisions diverge from the exhaustive replay")
    assert(got.exists(_._2 == "near"), "split must exercise the near leg")
    assert(got.exists(_._2 == "admit"), "split must exercise the admit leg")
  }

  test("dedup04 is blocking-invariant: narrow and wide configs emit the same pairs") {
    val narrow = Dedup.dedup04Simhash(spark, sf, Dedup.SimhashBlocking(4, 1))
      .collect().map(_.toSeq).toSeq
    val wide = Dedup.dedup04Simhash(spark, sf, Dedup.SimhashBlocking(8, 5))
      .collect().map(_.toSeq).toSeq
    val auto = Dedup.dedup04Simhash(spark, sf).collect().map(_.toSeq).toSeq
    assert(narrow == auto, "corpus below the cutover must pick (4,1)")
    assert(wide == narrow, "the recall guarantee holds at every admissible config")
    // The wide key is the point: strictly fewer accidental candidates.
    val cNarrow = Dedup.simhashCandidateCount(spark, sf, Dedup.SimhashBlocking(4, 1))
    val cWide = Dedup.simhashCandidateCount(spark, sf, Dedup.SimhashBlocking(8, 5))
    info(s"candidate pairs: narrow(4,1)=$cNarrow wide(8,5)=$cWide")
    assert(cWide <= cNarrow)
    // Configs that break the hamming-3 recall guarantee are rejected.
    intercept[IllegalArgumentException](Dedup.SimhashBlocking(4, 2))
    intercept[IllegalArgumentException](Dedup.SimhashBlocking(5, 1))
  }

  test("dedup10 recovers exact maximal shared-substring spans at any alignment") {
    import spark.implicits._
    val k = Dedup.SubstringWindow // 15
    // 20 shared tokens at DIFFERENT offsets in two docs (position 5 in
    // A, position 0 in B) — exactly what dedup08's fixed chunking
    // mis-bounds and stride-1 windows must bound precisely.
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")
    val a = (0 until 5).map(i => s"a$i").mkString(" ") + " " + shared +
      " " + (0 until 10).map(i => s"az$i").mkString(" ")
    val b = shared + " " + (0 until 12).map(i => s"bz$i").mkString(" ")
    val c = (0 until 40).map(i => s"c$i").mkString(" ")
    val got = Dedup.substringSpans(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))
    // Shared region spans 20 tokens: windows fit at 20-k+1 = 6 starts;
    // A's region is tokens 5..24, B's 0..19. One maximal span each,
    // none in C.
    assert(got.toSeq == Seq(
      (1L, 1L, 5, 5 + 20 - 1, 6L),
      (2L, 1L, 0, 20 - 1, 6L)))
    // Island merge: a doc REPEATING the shared text twice with a gap
    // > k gets two separate spans.
    val d = shared + " " + (0 until k + 5).map(i => s"gap$i").mkString(" ") +
      " " + shared
    val got2 = Dedup.substringSpans(
        Seq((1L, d), (2L, shared)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val dSpans = got2.filter(_._1 == 1L)
    assert(dSpans.length == 2, s"expected two islands, got ${dSpans.toSeq}")
    assert(dSpans(0) == (1L, 1L, 0, 19))
    assert(dSpans(1)._3 == 20 + k + 5 && dSpans(1)._4 == 20 + k + 5 + 19)
  }

  test("dedup02's scale fence trips on an oversized corpus") {
    // The real fence is 1M docs; trip it with the fence lowered below
    // the test corpus instead of building a million-doc corpus.
    val e = intercept[IllegalArgumentException](
      Dedup.dedup02NgramJaccard(spark, sf, maxDocs = 10L).collect())
    assert(e.getMessage.contains("dedup03"),
      "the fence message must point at the scale path")
    // And the default fence admits oracle-scale corpora.
    assert(Dedup.dedup02NgramJaccard(spark, sf).collect().nonEmpty)
  }

  test("simhash: identical token arrays hash identically (hamming 0)") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words appear in this sentence here"))
      .toDF("id", "text")
      .select(col("id"), simhash64(tokens(col("text"))).as("sh"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == rows(2L))
    assert(java.lang.Long.bitCount(rows(1L) ^ rows(3L)) > 3,
      "unrelated docs should differ in more than 3 bits")
  }

  test("simhash: near-identical docs land within small hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
      .toDF("id", "text")
      .select(col("id"), simhash64(tokens(col("text"))).as("sh"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(rows(1L) ^ rows(2L)) <= 16,
      "one-token edit should flip few simhash bits")
  }

  test("dedup06 union-find path equals distributed label-propagation path") {
    val pairs = Dedup.dedup03MinhashLsh(spark, sf).select(col("da"), col("db"))
    val viaUf = Dedup.unionFindClusters(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = Dedup.propagateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf == viaProp)
    assert(viaUf.nonEmpty)
    // Cluster ids are min-reachable doc ids: every id must map to a
    // label <= itself, and every label must itself be a member doc.
    viaUf.foreach { case (id, lbl) => assert(lbl <= id) }
    assert(viaUf.values.toSet.subsetOf(viaUf.keySet))
  }

  test("dedup07 (winnow containment) detects every dedup02 near-dup pair") {
    val jaccardPairs = Dedup.dedup02NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnowPairs = Dedup.dedup07WinnowOverlap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Recall 1.0 on the word-shingle near-dup set: true near-dups share
    // doc-specific fingerprints, so the stop-fingerprint df cap never
    // drops them. dedup07 may additionally flag character-level
    // near-dups the word-shingle metric scores lower.
    assert(jaccardPairs.subsetOf(winnowPairs),
      s"missed: ${jaccardPairs -- winnowPairs}")
    assert(jaccardPairs.nonEmpty)
  }

  test("propagateClusters converges on a chain graph (diameter = rounds)") {
    import spark.implicits._
    // Path 0-1-2-...-7: worst case for min-label propagation (the min
    // label travels one hop per round), all nodes end in cluster 0.
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("da", "db")
    val got = Dedup.propagateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 7L).map(_ -> 0L).toMap)
  }

  test("propagateClusters chain wall stays flat per round (lineage truncation)") {
    // Round-21 regression pin: the old persist-per-round form carried
    // ~3^r logical-plan growth across rounds (each round references the
    // previous frame three times), measured at 0.5→27 s per round on
    // THIS 8-round chain — ~110 s for 8 trivial rounds, ~20 min under
    // the round-20 driver's loaded machine. With the per-round eager
    // localCheckpoint the whole chain converges in a few seconds; the
    // generous bound below fails long before the exponential shape
    // comes back (which reads ≥60 s here) without flaking under load.
    import spark.implicits._
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("da", "db")
    val t0 = System.nanoTime()
    val got = Dedup.propagateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wall = (System.nanoTime() - t0) / 1e9
    assert(got == (0L to 7L).map(_ -> 0L).toMap)
    assert(wall < 30.0,
      f"8-round chain took $wall%.1f s — the exponential-lineage shape is back")
  }

  test("propagateClusters fails loudly instead of returning un-converged ids") {
    import spark.implicits._
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("da", "db")
    val e = intercept[IllegalStateException] {
      Dedup.propagateClusters(chain, maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("simhashDocs (codegen agg) equals simhash64 (column HOF) per document") {
    val viaAgg = Dedup.simhashDocs(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaHof = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), simhash64(tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaHof)
  }

  test("dedup04 output pairs all satisfy hamming <= 3 and da < db") {
    val rows = Dedup.dedup04Simhash(spark, sf).collect()
    assert(rows.forall(r => r.getInt(2) <= 3))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup04 candidate generation is exhaustive for hamming <= 3 (pigeonhole)") {
    // All-pairs ground truth on the sf0.001 corpus vs the chunk-join path.
    val sim = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), simhash64(tokens(col("text"))).as("sh"))
    val exact = sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        hamming64(col("a.sh"), col("b.sh")).cast("int").as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bucketed = Dedup.dedup04Simhash(spark, sf)
      .select(col("da"), col("db"), col("hamming").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bucketed == exact)
  }

  test("dedup08 paragraph dedup computes exact span df over a known corpus") {
    import spark.implicits._
    def span(w: String) = (1 to Dedup.ParagraphTokens).map(i => s"$w$i").mkString(" ")
    val (a, b, c, d) = (span("a"), span("b"), span("c"), span("d"))
    // doc1 = A B, doc2 = A C, doc3 = D, doc4 = B + a sub-span tail that
    // must be DROPPED (non-overlapping chunking ignores a trailing
    // partial span, same as the oracle's floor(len/k)).
    // doc5 is SHORTER than one span — must yield zero span rows, not an
    // illegal sequence(0,-1,1) crash.
    val docs = Seq(
      (1L, s"$a $b"), (2L, s"$a $c"), (3L, d),
      (4L, s"$b tail1 tail2 tail3"), (5L, "tiny doc")).toDF("doc_id", "text")
    val got = Dedup.paragraphDupStats(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc1: A dups with doc2, B dups with doc4 -> 2/2. doc2: only A
    // dups -> 1/2. doc3: unique -> absent. doc4: B dups -> 1/1.
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (4L, 1L, 1L, 1.0)),
      s"got ${got.toSeq}")
  }

  test("dedup09 semdedup equals a local union-find over dedup05's pairs") {
    val pairs = Dedup.dedup05EmbeddingCosine(spark, sf)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf corpus must contain semantic near-dups")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.dedup09Semdedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, root) =>
      assert(got(id)._1 == root, s"cluster of $id")
      assert(got(id)._2 == (if (id == root) 1 else 0), s"keeper flag of $id")
    }
    // Exactly one keeper per component.
    val perCluster = got.groupBy(_._2._1).view.mapValues(_.count(_._2._2 == 1))
    assert(perCluster.values.forall(_ == 1))
  }

  test("dedup12 bloom gate changes nothing and prunes the verify join") {
    // Analytic contract: no false negatives + exact verification ⇒ the
    // gated decisions are IDENTICAL to the ungated fingerprint join's.
    val gated = Dedup.bloomIngestDecisions(spark, sf, gated = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val ungated = Dedup.bloomIngestDecisions(spark, sf, gated = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(gated == ungated, "the Bloom gate must be a pure pre-filter")
    assert(gated.exists(_._2 == "admit"), "split must exercise the admit leg")

    // The gate's value: pass-through ≈ dup_rate + fpp, never everything.
    val arrivals = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % Dedup.IngestMod === Dedup.IngestRem)
      .select(col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
    val total = arrivals.count()
    val survivors = arrivals.filter(Dedup.bloomGate(spark, sf)).count()
    val dups = gated.count(_._2 == "dup").toLong
    info(s"bloom gate: $survivors of $total arrivals survive ($dups true dups)")
    assert(survivors >= dups, "a gate below the dup count dropped a true dup")
    assert(survivors <= dups + math.max(5L, (total * 5 * Dedup.BloomFpp).toLong),
      "gate pass-through far above dup_rate + fpp: sketch mis-sized")
  }

  test("dedup12 dup leg on a fixture with known cross-split duplicates") {
    // The live corpus carries no exact duplicates across the ingest
    // split (testdata drift made that true in round 10), so the dup leg
    // is pinned on a synthetic fixture instead: arrivals 3 and 19
    // (doc_id ≡ 3 mod 16) duplicate corpus docs 1 and 2; arrival 35 is
    // novel. Fixture-based, so no future testdata regeneration can
    // silently stop exercising this path.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup12-fix").toString
    Seq(
      (1L, "shared text alpha", "en", "web", 17L),
      (2L, "shared text beta", "en", "web", 16L),
      (5L, "corpus only gamma", "en", "web", 17L),
      (3L, "shared  TEXT   alpha", "en", "web", 20L), // ws/case-normalized dup of 1
      (19L, "shared text beta", "en", "web", 16L),    // exact dup of 2
      (35L, "novel arrival delta", "en", "web", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    for (g <- Seq(true, false)) {
      val d = Dedup.bloomIngestDecisions(spark, dir, gated = g)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(d == Map(
        3L -> ("dup", 1L), 19L -> ("dup", 2L), 35L -> ("admit", -1L)),
        s"gated=$g")
    }
  }

  test("dedup08 per-doc fractions are consistent on the sf corpus") {
    val rows = Dedup.dedup08Paragraph(spark, sf).collect()
    assert(rows.nonEmpty, "sf corpus contains cross-doc duplicate spans")
    assert(rows.forall(r => r.getLong(2) > 0 && r.getLong(2) <= r.getLong(1)))
    assert(rows.forall { r =>
      math.abs(r.getDouble(3) -
        BigDecimal(r.getLong(2).toDouble / r.getLong(1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9
    })
  }

  test("dedup13 sweep: monotone cost curve, nested configs, dedup03 denominator") {
    val rows = Dedup.dedup13LshSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Dedup.LshSweepConfigs.sortBy(_._2).map(c => (c._1, c._2)))
    // Nested configs: tightening rows can only SHRINK the candidate
    // set (a (b, 2r) candidate agrees on a whole 2r band, hence on
    // both its r sub-bands) — and verified pairs shrink with it.
    rows.sliding(2).foreach { case Array(loose, tight) =>
      assert(loose._3 >= tight._3,
        s"candidates must be monotone in rows: $loose vs $tight")
      assert(loose._4 >= tight._4)
    }
    // The loosest config is a genuine superset (cost), the tight end a
    // genuine collapse — the curve the knob exists to show.
    assert(rows.head._3 > rows.last._3,
      "the sweep must show a real cost collapse across configs")
    rows.foreach { case (_, _, cand, ver, t, rec) =>
      assert(ver <= cand && ver <= t)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - math.round(10000.0 * ver / math.max(t, 1)) / 10000.0) < 1e-9 ||
        rec == math.floor(10000.0 * ver / math.max(t, 1) + 0.5) / 10000.0)
    }
    // Denominator = the production pipeline's verified near-dup count.
    val nTrue = Dedup.dedup03MinhashLsh(spark, sf).count()
    assert(rows.forall(_._5 == nTrue))
  }

  test("dedup14: cross-modal verdict is exactly the two legs' pair algebra") {
    val out = Dedup.dedup14Crossmodal(spark, sf).collect()
    assert(out.nonEmpty)
    // Image leg == mm06 verbatim (pairs and hamming evidence).
    val img = Multimodal.mm06PhashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val outImg = out.filter(_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(5))).toSet
    assert(outImg == img, "image-flagged pairs must be mm06's set")
    // Text leg == dedup03 restricted to image-bearing pages.
    val pages = out.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val txt = Dedup.dedup03MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        a < Multimodal.Mm05Images && b < Multimodal.Mm05Images }
      .toSet
    val outTxt = out.filter(_.getBoolean(2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outTxt == txt, "text-flagged pairs must be dedup03's page set")
    // Verdict algebra: flags and verdict cannot disagree, every pair
    // carries at least one modality's evidence, and evidence columns
    // are null exactly when the modality didn't fire.
    out.foreach { r =>
      val (t, i, v) = (r.getBoolean(2), r.getBoolean(3), r.getString(6))
      assert(t || i)
      assert(v == (if (t && i) "both" else if (t) "text_only" else "image_only"))
      assert(r.isNullAt(4) == !t, s"jaccard null iff no text evidence: $r")
      assert(r.isNullAt(5) == !i, s"hamming null iff no image evidence: $r")
    }
    assert(pages.forall(_ < Multimodal.Mm05Images))
    // The staged corpus realizes only image_only/text_only (text and
    // image dups are injected independently) — the 'both' arm must be
    // proven on the extracted algebra, not assumed.
    import spark.implicits._
    val arms = Seq[(Option[Double], Option[Int])](
      (Some(0.9), Some(1)), (Some(0.9), None), (None, Some(0)))
      .toDF("jaccard", "hamming")
      .select(Dedup.crossmodalVerdict(col("jaccard"), col("hamming")))
      .collect().map(_.getString(0)).toSeq
    assert(arms == Seq("both", "text_only", "image_only"))
  }
}
