package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions.l2Distance
import org.apache.spark.sql.functions.{col, round}

class SimilaritySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet // (q_id, vec_id)

  test("sim05 radius search: exactly the brute-force pairs above threshold") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions._
    val got = Similarity.sim05RadiusSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = Dedup.vectors(spark, sf)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val brute = e.crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      .filter(col("cos") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute)
    assert(got.forall(_._3 >= 0.35))
  }

  test("sim12 filtered search: sim01's ranking restricted to the query's category") {
    import org.apache.spark.sql.functions._
    val got = Similarity.sim12FilteredAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // PRE-filter semantics: every hit is in the query's own category...
    got.foreach { case (q, _, v, _) =>
      assert(v % Similarity.FilterCats == q % Similarity.FilterCats,
        s"query $q was served neighbor $v from another category")
    }
    // ...and per query the result is exactly the exact ranking computed
    // over ONLY the category's vectors (full recall at k — the property
    // post-filtering loses when the predicate is selective).
    val e = Dedup.vectors(spark, sf)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val cat = q % Similarity.FilterCats
      val qv = e.filter(col("vec_id") === q).select("v")
        .collect()(0).getSeq[Double](0).toArray
      val exact = e
        .filter(col("vec_id") % Similarity.FilterCats === cat &&
          col("vec_id") =!= q)
        .select("vec_id", "v").collect()
        .map { r =>
          val v = r.getSeq[Double](1).toArray
          val dot = v.zip(qv).map { case (a, b) => a * b }.sum
          val cos = dot / (math.sqrt(v.map(x => x * x).sum) *
            math.sqrt(qv.map(x => x * x).sum))
          (r.getLong(0), math.round(cos * 10000.0) / 10000.0)
        }
        .sortBy { case (id, c) => (-c, id) }
        .take(Similarity.TopK)
      assert(rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq == exact.toSeq,
        s"query $q filtered ranking diverges")
    }
  }

  test("sim13 hybrid RRF equals a driver-side fusion of the two legs") {
    import org.apache.spark.sql.functions._
    val got = Similarity.sim13HybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // Vector leg = sim01 verbatim (same protocol, same ranks).
    val vecRank = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap
    // Lexical leg replayed driver-side from raw text.
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
    val lexRank = docs.filter(_._1 < 5).flatMap { case (q, qToks) =>
      docs.filter(_._1 != q)
        .map { case (d, dToks) => (d, (qToks & dToks).size) }
        .filter(_._2 > 0)
        .sortBy { case (d, ov) => (-ov, d) }
        .take(Similarity.TopK).zipWithIndex
        .map { case ((d, _), i) => ((q, d), i + 1) }
    }.toMap
    // RRF fusion over the union of leg candidates, ranked on the
    // 6-dp-rounded score with id tiebreak — the operator's contract.
    val expected = (0L until 5L).flatMap { q =>
      val cands = (vecRank.keySet ++ lexRank.keySet).filter(_._1 == q)
      cands.toSeq.map { key =>
        val rrf = lexRank.get(key).map(r => 1.0 / (Similarity.RrfK + r)).getOrElse(0.0) +
          vecRank.get(key).map(r => 1.0 / (Similarity.RrfK + r)).getOrElse(0.0)
        (key._2, math.round(rrf * 1e6) / 1e6)
      }.sortBy { case (id, s) => (-s, id) }.take(Similarity.TopK)
        .zipWithIndex.map { case ((id, s), i) => (q, i + 1, id, s) }
    }
    assert(got.sortBy(t => (t._1, t._2)).toSeq == expected,
      "fused ranking diverges from the driver-side replay")
  }

  test("sim10 recall eval equals a direct set intersection of the legs") {
    val exact = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.sim02LshAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.sim10RecallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (q, (nExact, nHit, recall)) =>
      assert(nExact == exact(q).size.toLong)
      assert(nHit == (exact(q) & approx.getOrElse(q, Set.empty)).size.toLong,
        s"query $q hit count")
      assert(math.abs(recall - nHit.toDouble / nExact) < 1e-9)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("sim11 MMR matches a local greedy replay; step 1 is the relevance argmax") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.cosineSim
    val got = Similarity.sim11MmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // Candidates per query straight from sim01's contract (top-20 by
    // rounded cos, vec_id tiebreak), replayed greedily in plain Scala.
    val e = Dedup.vectors(spark, sf)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("v"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val c = if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val cands = rows.sortBy(r => (-r._4, r._2)).take(Similarity.MmrCand)
        .map(r => (r._2, r._3, r._4)).toBuffer
      val sel = scala.collection.mutable.Buffer.empty[(Long, Array[Double])]
      (1 to Similarity.MmrK).map { rk =>
        val best = cands.minBy { case (id, v, rel) =>
          val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos4(v, s._2)).max
          (-(Similarity.MmrLambda * rel - (1.0 - Similarity.MmrLambda) * ms), id)
        }
        cands -= best
        sel += ((best._1, best._2))
        (qid, rk, best._1)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("sim09 k-means matches a local Lloyd replay") {
    import org.apache.spark.sql.functions._
    val got = Similarity.sim09Kmeans(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Independent replay of the whole protocol in plain Scala: same
    // seeding, same dim-order L2 arithmetic, same 6-dp quantization.
    val vecs = Dedup.vectors(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      math.sqrt(acc)
    }
    def assign(cs: Array[Array[Double]]): Array[(Long, Array[Double], Int)] =
      vecs.map { case (id, v) =>
        (id, v, cs.indices.minBy(c => (l2(v, cs(c)), c)))
      }
    var cs = vecs.filter(_._1 < Similarity.KmeansK).map(_._2)
    for (_ <- 1 to Similarity.KmeansIters) {
      val byCell = assign(cs).groupBy(_._3)
      cs = cs.indices.map { c =>
        byCell.get(c).fold(cs(c)) { members =>
          val dims = cs(c).length
          Array.tabulate(dims) { d =>
            val m = members.map(_._2(d)).sum / members.size
            BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        }
      }.toArray
    }
    val fin = assign(cs).groupBy(_._3).map { case (c, members) =>
      val ds = members.map(m =>
        BigDecimal(l2(m._2, cs(c)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      c -> (members.size.toLong,
        BigDecimal(ds.sum / ds.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.keySet == fin.keySet)
    assert(got.values.map(_._1).sum == vecs.length.toLong,
      "cells must partition the corpus")
    fin.foreach { case (c, (n, md)) =>
      assert(got(c)._1 == n, s"cell $c membership")
      assert(math.abs(got(c)._2 - md) <= 2e-4, s"cell $c mean dist")
    }
  }

  test("sim06 (bucketed IVF) returns exactly sim03's results") {
    val viaJoin = Similarity.sim03IvfAnn(spark, sf)
      .collect().map(_.toSeq).toSeq
    val viaBuckets = Similarity.sim06BucketedIvf(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaBuckets == viaJoin)
    assert(viaBuckets.nonEmpty)
  }

  test("sim02 (LSH ANN) recall vs sim01 (exact) is usable") {
    val exact = pairs(Similarity.sim01BruteForceTopK(spark, sf))
    val approx = pairs(Similarity.sim02LshAnn(spark, sf))
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sim02 recall@${Similarity.TopK} = $recall%.3f")
    assert(recall >= 0.3,
      f"multi-probe LSH should recover a usable fraction of exact " +
        f"neighbors, got $recall%.3f")
  }

  test("sim03 (IVF ANN) recall vs sim01 (exact) is usable") {
    val exact = pairs(Similarity.sim01BruteForceTopK(spark, sf))
    val approx = pairs(Similarity.sim03IvfAnn(spark, sf))
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sim03 recall@${Similarity.TopK} = $recall%.3f")
    assert(recall >= 0.3,
      f"IVF with nprobe=4/16 cells should recover a usable fraction " +
        f"of exact neighbors, got $recall%.3f")
  }

  test("trained codebook holds recall against the seed codebook at fixed nprobe") {
    // The wiring claim: sim03 searches k-means-trained centroids, and
    // training must not COST meaningful recall vs the raw sample it
    // replaced. On THIS corpus the pin is floor + small margin, not
    // strict dominance: the synthetic embeddings are near-uniform (no
    // cluster structure to learn — measured across SFs, PLANS.md
    // "Trained vs seed codebook"), so fixed-nprobe recall between any
    // two reasonable codebooks differs only by single neighbors out of
    // 50. On clustered real embeddings the trained codebook's gain is
    // the textbook IVF result; what would be dishonest here is
    // asserting a win the data cannot express.
    val exact = pairs(Similarity.sim01BruteForceTopK(spark, sf))
    assert(exact.nonEmpty)
    val e = Dedup.vectors(spark, sf)
    val seed = pairs(Similarity.ivfSearchWith(spark, sf, Similarity.ivfCentroids(e)))
    val trained = pairs(Similarity.sim03IvfAnn(spark, sf))
    val rSeed = (exact intersect seed).size.toDouble / exact.size
    val rTrained = (exact intersect trained).size.toDouble / exact.size
    info(f"IVF recall@${Similarity.TopK}: seed=$rSeed%.3f trained=$rTrained%.3f")
    assert(rTrained >= 0.8,
      f"trained-codebook recall floor, got $rTrained%.3f")
    assert(rTrained >= rSeed - 0.04,
      f"training must not cost more than ~2 neighbors of 50: trained " +
        f"$rTrained%.3f vs seed $rSeed%.3f")
  }

  test("sim08 (PQ ANN) recall vs sim04 (exact L2) is high after refine") {
    val exact = Similarity.sim04L2TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.sim08PqAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sim08 recall@${Similarity.TopK} = $recall%.3f")
    assert(recall >= 0.9,
      f"PQ with a ${Similarity.PqRefine}-candidate exact refine should " +
        f"recover nearly all exact neighbors, got $recall%.3f")
  }

  test("sim08 exact-refine distances are true L2 (re-ranked, not approximate)") {
    val e = graft.operators.Dedup.vectors(spark, sf)
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("vec_id"),
        round(l2Distance(col("a.v"), col("b.v")), 4).as("l2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.sim08PqAnn(spark, sf).collect().foreach { r =>
      assert(truth((r.getLong(0), r.getLong(2))) == r.getDouble(3),
        s"sim08 output distance must be the exact L2 for ${r.getLong(0)}->${r.getLong(2)}")
    }
  }

  test("sim15 (IVF-PQ) recall vs sim04 (exact L2) is usable") {
    val exact = Similarity.sim04L2TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.sim15IvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sim15 recall@${Similarity.TopK} = $recall%.3f")
    // Cell pruning bounds sim15 by sim03's probing recall, not sim08's
    // full-corpus bar: on near-uniform embeddings true neighbors fall
    // outside the 4 probed cells of 16.
    assert(recall >= 0.3,
      f"IVF-PQ should keep a usable fraction of exact neighbors, " +
        f"got $recall%.3f")
  }

  test("sim15 outputs true L2 distances and only probed-cell members") {
    val e = graft.operators.Dedup.vectors(spark, sf)
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("vec_id"),
        round(l2Distance(col("a.v"), col("b.v")), 4).as("l2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // The pruning contract: a result can only come from one of its
    // query's NProbe probed cells — the cells ARE the scanned files at
    // scale, so anything else would mean the composite read data the
    // coarse quantizer said to skip.
    val centroids = Similarity.trainedCodebook(spark, sf)
    val cellOf = Similarity.ivfAssigned(e, centroids)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = Similarity.ivfProbes(e, centroids)
      .select("q_id", "probe_cell").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val out = Similarity.sim15IvfPq(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(2))
      assert(truth((q, v)) == r.getDouble(3),
        s"sim15 output distance must be the exact L2 for $q->$v")
      assert(probed(q).contains(cellOf(v)),
        s"sim15 returned $v for query $q from unprobed cell ${cellOf(v)}")
    }
  }

  test("sim14 (SQ8 ANN) recall vs sim04 (exact L2) is high after refine") {
    val exact = Similarity.sim04L2TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.sim14SqAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sim14 recall@${Similarity.TopK} = $recall%.3f")
    // SQ8 loses far less geometry than PQ (256 levels per dim vs 16
    // shared centroids), so it gets PQ's bar, not LSH's.
    assert(recall >= 0.9,
      f"SQ8 with a ${Similarity.SqRefine}-candidate exact refine should " +
        f"recover nearly all exact neighbors, got $recall%.3f")
  }

  test("sim14 output distances are true L2 and codes stay in [0, 255]") {
    val e = graft.operators.Dedup.vectors(spark, sf)
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("vec_id"),
        round(l2Distance(col("a.v"), col("b.v")), 4).as("l2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.sim14SqAnn(spark, sf).collect().foreach { r =>
      assert(truth((r.getLong(0), r.getLong(2))) == r.getDouble(3),
        s"sim14 output distance must be the exact L2 for ${r.getLong(0)}->${r.getLong(2)}")
    }
    // The encoding invariant the 8-bit contract rests on: every dim of
    // every vector lands in [0, 255], and each dim's extremes hit both
    // ends (lo -> 0 because (lo-lo)/(hi-lo) = 0; hi -> 255 because
    // x/x = 1.0 exactly in IEEE, floor(256) capped by least).
    val bounds = e.select(org.apache.spark.sql.functions.posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(
        org.apache.spark.sql.functions.min("x").as("lo"),
        org.apache.spark.sql.functions.max("x").as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val perDim = e.collect().flatMap(r =>
      r.getSeq[Double](1).zipWithIndex.map { case (x, d) =>
        val (lo, hi) = bounds(d)
        d -> (if (hi == lo) 0L
              else math.min(255L, math.floor((x - lo) / (hi - lo) * 256).toLong))
      })
    assert(perDim.forall { case (_, c) => c >= 0L && c <= 255L })
    val extremes = perDim.groupBy(_._1).map { case (d, cs) =>
      (cs.map(_._2).min, cs.map(_._2).max) }
    assert(extremes.forall { case (mn, mx) => mn == 0L && mx == 255L },
      "each dimension's corpus extremes must map to the code range ends")
  }

  test("sim02 scores are exact cosines (no approximation in scoring)") {
    // Every (q_id, vec_id, cos) sim02 returns must appear in the exact
    // all-pairs scores: LSH only prunes candidates, never perturbs math.
    val exactScores = Similarity.sim01BruteForceTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = Similarity.sim02LshAnn(spark, sf).collect()
    approx.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactScores.get(key).foreach { exp =>
        assert(r.getDouble(3) == exp, s"score mismatch for $key")
      }
    }
  }

  test("sim07 kNN graph equals the exact cell-local top-k") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = Similarity.sim07KnnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.nonEmpty)
    // Reference: window-ranked top-k over the same cell-local pair
    // space (the contract is single-probe — candidates ARE the cell).
    val assigned = Similarity.cachedCellAssignment(spark, sf)
    val a = assigned.select(col("vec_id"), col("v"), col("cell"))
    val b = assigned.select(col("vec_id").as("nb_id"), col("v").as("nv"),
      col("cell"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nb_id"))
    val brute = a.join(b, Seq("cell"))
      .filter(col("nb_id") =!= col("vec_id"))
      .select(col("vec_id"), col("nb_id"),
        round(cosineSim(col("v"), col("nv")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Similarity.KnnK)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute)
    // Every list is at most k long and ranks are dense from 1.
    val byV = got.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    byV.foreach { case (v, rks) =>
      assert(rks.size <= Similarity.KnnK)
      assert(rks == (1 to rks.size), s"vector $v ranks must be dense")
    }
  }

  test("sim02 ranks are dense and start at 1 per query") {
    val byQ = Similarity.sim02LshAnn(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted).toMap
    byQ.foreach { case (q, rks) =>
      assert(rks.head == 1, s"query $q ranks must start at 1")
      assert(rks.zip(rks.tail).forall { case (a, b) => b == a + 1 },
        s"query $q ranks must be dense")
    }
  }

  test("sim16 sweep: monotone curve, exhaustive anchor, agrees with deployed sim03") {
    val rows = Similarity.sim16NprobeSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val queries = rows.keySet.map(_._1)
    assert(queries.nonEmpty)
    queries.foreach { q =>
      val curve = Similarity.SweepProbes.map(p => rows((q, p))._3)
      // More probes can only add candidate cells: recall is monotone.
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"query $q recall curve must be non-decreasing: $curve")
      // Probing every cell is exhaustive search: recall 1.0 by
      // construction (the anchor the curve normalizes against).
      assert(rows((q, Similarity.NumCentroids))._3 == 1.0,
        s"query $q exhaustive probe must have recall 1.0")
      rows.filterKeys(_._1 == q).values.foreach { case (nEx, nHit, rec) =>
        assert(nHit <= nEx && rec == math.round(nHit.toDouble / nEx * 1e4) / 1e4)
      }
    }
    // The sweep's point at the PRODUCTION NProbe must equal the recall
    // of the deployed sim03 operator measured directly against sim01 —
    // the curve describes the real index, not a parallel implementation.
    val exact = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.sim03IvfAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    queries.foreach { q =>
      val k = exact.count(_._1 == q)
      val hit = exact.count(p => p._1 == q && approx.contains(p))
      val measured = math.round(hit.toDouble / k * 1e4) / 1e4
      assert(rows((q, Similarity.NProbe))._3 == measured,
        s"query $q: sweep point at NProbe=${Similarity.NProbe} " +
          s"(${rows((q, Similarity.NProbe))._3}) != deployed sim03 recall ($measured)")
    }
  }

  test("sim17 staleness: recall decays monotonically on a drift-injected corpus") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    // Hand-built geometry where the cell flip is analytic: 4 centroids
    // on axes e1..e4, one query on e1 probing ONLY its own cell
    // (nprobe = 1), fillers on axes e5..e9 (centroid-orthogonal — the
    // all-zero score ties to cell 0, which IS probed). Append batch b
    // blends the query toward e2 at t = 0.3b: batch 1 stays in cell 0
    // (hit), batches 2 and 3 cross into cell 1 (miss) while remaining
    // genuine top-k neighbors — exactly the silent-decay shape the
    // monitor exists to expose.
    def axis(d: Int): Array[Double] = {
      val a = new Array[Double](64); a(d) = 1.0; a
    }
    val centroids = (0 until 4).map(c => c.toLong -> axis(c)).toArray
    val queries = Seq((0L, axis(0).toSeq)).toDF("q_id", "qv")
    val base = ((0L, axis(0).toSeq) +:
      (10L to 14L).map(i => i -> axis(i.toInt - 5).toSeq)).toDF("vec_id", "v")
    val appends = (1 to 3).map { b =>
      val t = 0.3 * b
      val v = new Array[Double](64); v(0) = 1.0 - t; v(1) = t
      (100L + b, v.toSeq, b)
    }.toDF("vec_id", "v", "batch")
    val got = Similarity.stalenessCurve(
        base, appends, centroids, nprobe = 1, queries, maxBatch = 3)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (0, 5L, 5L, 1.0), (1, 6L, 6L, 1.0),
      (2, 7L, 6L, 0.8571), (3, 8L, 6L, 0.75)),
      s"analytic decay curve violated: $got")
    // The property the operator exists for, stated directly.
    val curve = got.map(_._4)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a },
      s"recall must be monotone non-increasing in staleness: $curve")
    assert(curve.last < curve.head, "drift must produce strict decay")
  }

  test("sim17 staleness 0 equals sim16's aggregated recall at the deployed NProbe") {
    // With zero appends the monitor measures exactly what sim16's curve
    // reports at the production probe count — the two operators must
    // agree on the deployed index, not be parallel implementations.
    val s17 = Similarity.sim17StalenessMonitor(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(s17.map(_._1).toSeq == (0 to Similarity.StaleBatches).toSeq)
    s17.foreach { case (s, nApp, nEx, nHit, rec) =>
      assert(nApp == s.toLong * 5, "one append per query per batch")
      assert(nHit <= nEx && rec == math.round(nHit.toDouble / nEx * 1e4) / 1e4)
    }
    val s16 = Similarity.sim16NprobeSweep(spark, sf).collect()
      .filter(_.getInt(1) == Similarity.NProbe)
      .map(r => (r.getLong(2), r.getLong(3)))
    val (nEx16, nHit16) = s16.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val level0 = s17.find(_._1 == 0).get
    assert((level0._3, level0._4) == (nEx16, nHit16),
      s"staleness-0 hits must equal sim16 at NProbe=${Similarity.NProbe}: " +
        s"got (${level0._3}, ${level0._4}) vs ($nEx16, $nHit16)")
  }

  test("sim19 graph ANN: usable recall vs exact, constant per-query candidate budget") {
    val exact = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.sim19GraphAnn(spark, sf).collect()
    val approx = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5,
      f"graph beam search must find a usable fraction of the true top-k: $recall%.2f")
    // Ranks dense from 1, scores are true 4-dp cosines (scored, not
    // approximated), and output is deterministic run-over-run.
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    val again = Similarity.sim19GraphAnn(spark, sf).collect()
    assert(got.map(_.toSeq.toVector).toVector == again.map(_.toSeq.toVector).toVector)
    // The budget claim: per query the search SCORES at most
    // EntryCount + Rounds·Beam·KnnK candidates — a constant, however
    // large the corpus. (The output is the top-k of that pool.)
    val budget = Similarity.GraphEntryCount +
      Similarity.GraphRounds * Similarity.GraphBeam *
        (Similarity.KnnK + Similarity.GraphRandomDegree)
    assert(budget < 500, s"sanity: the documented constant is $budget")
  }

  test("sim25 layered search: recall holds sim19's floor on a strictly smaller scored budget; entries are adaptive") {
    import org.apache.spark.sql.functions.col
    val exact = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.sim25LayeredAnn(spark, sf).collect()
    val approx = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // THE CLAIM, both halves measured (round-19 directive #4): the
    // coarse-routed per-query entries hold the deployed config's
    // recall floor...
    assert(recall >= 0.5,
      f"layered search must hold sim19's recall floor: $recall%.2f")
    // ...on a strictly SMALLER scored budget (pool rows are the graph
    // family's cost unit — sim20's metric; the layered pool INCLUDES
    // its coarse routing, so the comparison hides nothing).
    val b25 = Similarity.sim25Pool(spark, sf).count()
    val b19 = Similarity.sim19VisitedPool(spark, sf).count()
    info(f"sim25 recall@${Similarity.TopK} = $recall%.3f, " +
      s"budget $b25 vs sim19 $b19 pool rows")
    assert(b25 < b19,
      s"layered search must score strictly fewer candidates: $b25 vs $b19")
    // ADAPTIVITY, the mechanism: the base layer's round-1 beam (each
    // query's top coarse nodes) must differ BETWEEN queries — sim19's
    // fixed entry set is identical for every query by construction, so
    // identical per-query seeds would mean the coarse routing routed
    // nothing.
    val routedTop = Similarity.sim25Pool(spark, sf)
      .join(Similarity.sim25CoarseNodes(spark, sf).select("vec_id"),
        Seq("vec_id"), "left_semi")
    val seeds = Similarity.sim19TopPer(routedTop, Similarity.Sim25Beam)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(seeds.values.toSet.size > 1,
      "per-query coarse seeds must differ across queries — the routing is adaptive")
    // Determinism (the oracle's premise) and dense ranks.
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    val again = Similarity.sim25LayeredAnn(spark, sf).collect()
    assert(got.map(_.toSeq.toVector).toVector ==
      again.map(_.toSeq.toVector).toVector)
  }

  test("sim21 insert: edge shape, determinism, and the back-edge transpose law") {
    val got = Similarity.sim21GraphInsert(spark, sf).collect()
    val nAppends = Similarity.NumQueryVectors * Similarity.StaleBatches
    // Every append gets exactly the insert degree of forward edges,
    // ranks dense from 1, scores descending on the 4-dp grid.
    assert(got.map(_.getLong(0)).distinct.length == nAppends)
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.length == Similarity.GraphInsertDegree)
      assert(rows.sortBy(_.getInt(1)).map(_.getInt(1)).toSeq ==
        (1 to Similarity.GraphInsertDegree))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "edge scores must descend with rank")
    }
    // Neighbors are CORPUS nodes (the pre-batch graph — never a
    // batch-mate: batch-insert semantics).
    assert(got.forall(_.getLong(2) < Similarity.StaleIdBase),
      "an insert edge must never point at another arrival")
    // Deterministic run-over-run (the oracle's premise).
    val again = Similarity.sim21GraphInsert(spark, sf).collect()
    assert(got.map(_.toSeq.toVector).toVector ==
      again.map(_.toSeq.toVector).toVector)
    // Transpose law: the augmented graph carries BOTH directions of
    // every insert edge.
    val aug = Similarity.augmentedGraphEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(2))
      assert(aug((a, b)) && aug((b, a)), s"edge ($a,$b) must be bidirectional")
    }
  }

  test("sim21 reachability: inserted vectors are invisible before, found after (recall floor)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val e = Dedup.vectors(spark, sf)
    val queries = e.filter(col("vec_id") < Similarity.NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val appends = Similarity.driftedAppends(queries)
    val corpus = e.select("vec_id", "v")
      .unionByName(appends.select("vec_id", "v"))
    def topIds(graph: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("vec_id"))
      Similarity.beamSearchPool(corpus, graph, queries)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= Similarity.TopK)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    }
    // BEFORE: the deployed graph has no edge touching an append, so the
    // search cannot even SCORE one — the exact blindness the insert
    // path exists to cure (round-15 directive #3).
    val before = topIds(Similarity.knnGraphEdges(spark, sf))
    assert(before.values.flatten.forall(_ < Similarity.StaleIdBase),
      "an append must be unreachable before the insert")
    // AFTER: with the insert's forward+back edges the appends are
    // found. The floor is the strongest statement TRUE of the
    // deterministic fixture (beam recall on this near-uniform corpus
    // is ~0.56 overall, so 100% own-append would over-claim): every
    // query's top-k contains at least one appended vector, and at
    // least 4 of the 5 queries retrieve their OWN batch-1 append (the
    // t=0.2 blend — measured: q3's beam path reaches other appends
    // but narrowly misses its own).
    val after = topIds(Similarity.augmentedGraphEdges(spark, sf))
    val qids = queries.collect().map(_.getLong(0)).toSeq
    qids.foreach { qid =>
      assert(after(qid).exists(_ >= Similarity.StaleIdBase),
        s"query $qid must retrieve at least one append post-insert")
    }
    val ownHits = qids.count { qid =>
      after(qid).contains(Similarity.StaleIdBase + 100L + qid)
    }
    assert(ownHits >= qids.size - 1,
      s"only $ownHits/${qids.size} queries retrieved their own batch-1 append")
  }

  test("sim22 compaction: degree restored, untouched nodes byte-identical to the build, appends keep their search evidence") {
    val got = Similarity.sim22GraphCompact(spark, sf).collect()
    val ins = Similarity.sim21GraphInsert(spark, sf).collect()
    val appendIds = ins.map(_.getLong(0)).distinct.toSet
    // Node set = the merged corpus; every node's adjacency is cut back
    // to EXACTLY the compaction degree (every node has >= degree
    // candidates here: base nodes carry their build-K, appends their
    // insert-K), ranks dense, scores descending on the 4-dp grid.
    val base = Dedup.vectors(spark, sf).count()
    assert(got.map(_.getLong(0)).distinct.length == base + appendIds.size)
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.length == Similarity.GraphCompactDegree)
      assert(rows.sortBy(_.getInt(1)).map(_.getInt(1)).toSeq ==
        (1 to Similarity.GraphCompactDegree))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // An appended node's compacted adjacency IS its insert search
    // result (its only evidence — batch-insert semantics gave it no
    // other candidates).
    appendIds.foreach { a =>
      assert(got.filter(_.getLong(0) == a).map(_.getLong(2)).toSet ==
        ins.filter(_.getLong(0) == a).map(_.getLong(2)).toSet,
        s"append $a must keep exactly its insert neighbors")
    }
    // A base node that received NO back-edge re-ranks exactly its
    // build-K candidates — compaction reproduces its sim07 rows
    // verbatim (rank, neighbor, 4-dp score): the no-op-where-nothing-
    // changed identity.
    val touched = ins.map(_.getLong(2)).toSet
    def rowKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val build = Similarity.sim07KnnGraph(spark, sf).collect()
      .map(rowKey).filterNot(r => touched(r._1)).toSet
    val gotUntouched = got.map(rowKey)
      .filterNot(r => touched(r._1) || appendIds(r._1)).toSet
    assert(build == gotUntouched,
      "an untouched node's compacted adjacency must equal its build rows")
    // And at least one node WAS touched (the identity above is not
    // vacuous) — some back-edge survived or lost the re-rank, either
    // way the node was re-decided.
    assert(touched.nonEmpty)
  }

  test("sim22 reachability: inserted nodes stay findable AFTER the degree cut") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val e = Dedup.vectors(spark, sf)
    val queries = e.filter(col("vec_id") < Similarity.NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val corpus = e.select("vec_id", "v")
      .unionByName(Similarity.driftedAppends(queries).select("vec_id", "v"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val after = Similarity.beamSearchPool(
        corpus, Similarity.compactedNavigableEdges(spark, sf), queries)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Similarity.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // The compaction's degree cut severs back-edges that lost their
    // node's re-rank, so reachability CAN only shrink vs the raw
    // augmented graph — the spec pins that it does not collapse:
    // every query still retrieves at least one appended vector, and
    // at least 4/5 still retrieve their OWN batch-1 append (sim21's
    // floor, held through the cut).
    val qids = queries.collect().map(_.getLong(0)).toSeq
    qids.foreach { qid =>
      assert(after(qid).exists(_ >= Similarity.StaleIdBase),
        s"query $qid must still retrieve an append post-compaction")
    }
    val ownHits = qids.count { qid =>
      after(qid).contains(Similarity.StaleIdBase + 100L + qid)
    }
    assert(ownHits >= qids.size - 1,
      s"only $ownHits/${qids.size} queries retrieved their own batch-1 append post-compaction")
  }

  test("sim24 tombstoned consolidate: dead nodes physically gone, clean nodes byte-identical, hub-deleted appends stay reachable") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def dead(id: Long) =
      md5hex("tombstone:" + id).take(2) < Similarity.TombstoneHexThr
    val got = Similarity.sim24TombstonedConsolidate(spark, sf).collect()
    assert(got.nonEmpty)
    // PHYSICAL DROP: no tombstoned node appears anywhere — not as a
    // row (src) and never as a neighbor (dst). sim23 only promised
    // this for RESULTS; the consolidate pays it in the structure.
    got.foreach { r =>
      assert(!dead(r.getLong(0)), s"dead src ${r.getLong(0)} survived")
      assert(!dead(r.getLong(2)), s"dead dst ${r.getLong(2)} survived")
    }
    // Node set = exactly the live merged corpus side that carries any
    // candidate; degree bounded; ranks dense; scores descending.
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.length <= Similarity.GraphCompactDegree)
      assert(rows.sortBy(_.getInt(1)).map(_.getInt(1)).toSeq ==
        (1 to rows.length))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // NO-OP IDENTITY, narrowed to where nothing changed: a live node
    // untouched by inserts whose sim22 adjacency contains no dead
    // neighbor keeps its sim22 rows verbatim (the re-link only ADDS
    // candidates for nodes that lost a neighbor; elsewhere the
    // evidence — and hence the deterministic re-rank — is identical).
    val s22 = Similarity.sim22GraphCompact(spark, sf).collect()
    def rowKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val cleanNodes = s22.groupBy(_.getLong(0)).collect {
      case (id, rows) if !dead(id) && rows.forall(r => !dead(r.getLong(2))) =>
        id
    }.toSet
    assert(cleanNodes.nonEmpty)
    val s22Clean = s22.filter(r => cleanNodes(r.getLong(0))).map(rowKey).toSet
    val gotClean = got.filter(r => cleanNodes(r.getLong(0))).map(rowKey).toSet
    // The clean node's top-degree can still shift if a dead candidate
    // BELOW its sim22 cut was replaced by a better re-linked one — but
    // its sim22 rows were all-live and re-rank deterministically, so
    // every sim22 row survives unless displaced by a strictly better
    // re-linked candidate; pin the overwhelming-identity direction.
    assert((s22Clean -- gotClean).isEmpty ||
      (s22Clean -- gotClean).size < s22Clean.size / 10,
      s"clean-node adjacency churned: ${(s22Clean -- gotClean).size} of ${s22Clean.size}")
    // THE COMPOSED LAW (the reason this operator exists as its own
    // run): live appends whose insert NEIGHBORS include a deleted node
    // — a region whose hub died — must remain reachable through the
    // re-linked navigable graph. Non-vacuous: such appends exist here.
    val ins = Similarity.sim21GraphInsert(spark, sf).collect()
    val liveAppends = ins.map(_.getLong(0)).distinct.filterNot(dead).toSet
    val hubDeleted = ins.groupBy(_.getLong(0)).collect {
      case (a, rows) if !dead(a) && rows.exists(r => dead(r.getLong(2))) => a
    }.toSet
    assert(hubDeleted.nonEmpty,
      "no live append lost an insert neighbor at this sf — the hub arm is vacuous")
    val e = Dedup.vectors(spark, sf)
    val queries = e.filter(col("vec_id") < Similarity.NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val liveCorpus = Similarity.mergedCorpus(spark, sf)
      .filter(!Similarity.tombstoneFlag(col("vec_id")))
    val pool = Similarity.beamSearchPool(liveCorpus,
        Similarity.sim24NavigableEdges(spark, sf), queries)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val visited = pool.map(_._2).toSet
    val reached = hubDeleted.count(visited)
    info(s"hub-deleted appends reached: $reached/${hubDeleted.size}; " +
      s"live appends visited: ${liveAppends.count(visited)}/${liveAppends.size}")
    assert(reached == hubDeleted.size,
      s"a hub-deleted append became unreachable: ${hubDeleted -- visited}")
    // And the search still RETURNS appends (reachability that loses
    // the top-k would be navigation without retrieval): every query's
    // live top-k contains at least one appended vector.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val top = Similarity.beamSearchPool(liveCorpus,
        Similarity.sim24NavigableEdges(spark, sf), queries)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Similarity.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.collect().map(_.getLong(0)).foreach { qid =>
      assert(top(qid).exists(_ >= Similarity.StaleIdBase),
        s"query $qid retrieves no append post-tombstoned-consolidate")
    }
  }

  test("sim23 delete: tombstoned nodes routed through, never returned; route-through beats the naive hard filter") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def dead(id: Long) =
      md5hex("tombstone:" + id).take(2) < Similarity.TombstoneHexThr
    val got = Similarity.sim23GraphDelete(spark, sf).collect()
    assert(got.nonEmpty)
    // Deleted vectors are GONE from results immediately, and live
    // candidates re-fill the top-k densely.
    got.foreach(r => assert(!dead(r.getLong(2)),
      s"tombstoned ${r.getLong(2)} returned"))
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.sortBy(_.getInt(1)).map(_.getInt(1)).toSeq ==
        (1 to Similarity.TopK))
    }
    // Route-through witnessed: the navigation still SCORES tombstoned
    // nodes (the filter is on the result cut, not the search — a
    // pre-filtered search would show none here).
    val pool = Similarity.sim19VisitedPool(spark, sf).collect()
    assert(pool.exists(r => dead(r.getLong(1))),
      "the search must still navigate tombstoned nodes")
    // The trade MEASURED: recall@k vs the exact-over-live baseline,
    // route-through vs the naive hard filter (graph and corpus
    // pre-filtered to live nodes — what physically unlinking deletes
    // between compactions would do).
    val e = Dedup.vectors(spark, sf)
    val queries = e.filter(col("vec_id") < Similarity.NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val live = e.filter(!Similarity.tombstoneFlag(col("vec_id")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Similarity.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topIds(live
      .join(org.apache.spark.sql.functions.broadcast(queries),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.GraftFunctions.cosineSim(col("qv"), col("v")), 4)
          .as("cos")))
    def recall(res: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (q, ex) =>
        res.getOrElse(q, Set.empty).count(ex) }.sum
      hits.toDouble / (exact.size * Similarity.TopK)
    }
    val routeRecall = recall(got.map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    val hardGraph = Similarity.knnGraphEdges(spark, sf)
      .filter(!Similarity.tombstoneFlag(col("src")) &&
        !Similarity.tombstoneFlag(col("dst")))
    val hardRecall = recall(topIds(
      Similarity.beamSearchPool(live.select("vec_id", "v"), hardGraph, queries)
        .filter(!Similarity.tombstoneFlag(col("vec_id")))))
    info(s"route-through recall $routeRecall vs hard-filter $hardRecall")
    assert(routeRecall >= hardRecall,
      s"route-through ($routeRecall) must not lose to the naive filter ($hardRecall)")
    assert(routeRecall >= 0.5,
      s"route-through must hold sim19's recall floor, got $routeRecall")
  }

  test("sim20: production trajectory IS sim19's pool; rounds curve monotone by construction") {
    import org.apache.spark.sql.functions.col
    // The sweep's (GraphEntryCount, GraphBeam) trajectory must equal
    // sim19's own visited pool row-for-row — the sweep measures the
    // DEPLOYED search, not a lookalike.
    val prod = Similarity.sim20Pools(spark, sf)
      .filter(col("entries") === Similarity.GraphEntryCount &&
        col("beam") === Similarity.GraphBeam)
      .select("q_id", "vec_id", "cos").collect()
      .map(_.toSeq.toVector).toSet
    val s19 = Similarity.sim19VisitedPool(spark, sf)
      .select("q_id", "vec_id", "cos").collect()
      .map(_.toSeq.toVector).toSet
    assert(prod == s19, "sweep trajectory diverged from the deployed search")
    val rows = Similarity.sim20GraphSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(6)))
      .toMap
    assert(rows.size == Similarity.GraphSweepConfigs.size *
      (Similarity.GraphRounds + 1), "every (config, rounds) level present")
    // Within a trajectory the pool only grows, so candidates AND
    // recall are non-decreasing in rounds — exact, not statistical.
    Similarity.GraphSweepConfigs.foreach { case (ent, b) =>
      val curve = (0 to Similarity.GraphRounds).map(r => rows((ent, b, r)))
      curve.sliding(2).foreach { case Seq(a, c) =>
        assert(a._1 <= c._1 && a._2 <= c._2 && a._3 <= c._3,
          s"rounds curve must be monotone for ($ent, $b): $curve")
      }
      // Rounds-0 pool = the scored entry set: entries−1 candidates for
      // entry queries (self excluded), entries for the rest.
      val q = Similarity.NumQueryVectors
      val selfHits = math.min(ent, q)
      assert(curve.head._1 == ent.toLong * q - selfHits,
        s"round-0 budget must be the entry set for ($ent, $b)")
    }
    // The deployed config's final recall matches sim19's output recall
    // (pool membership IS retrieval under exact rescoring).
    val exact = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val s19Top = Similarity.sim19GraphAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = rows((Similarity.GraphEntryCount, Similarity.GraphBeam,
      Similarity.GraphRounds))._2
    assert(hits == (exact intersect s19Top).size.toLong,
      "sweep hits at the deployed config must equal sim19's measured recall")
  }

  test("sim20 exhaustive anchor: entries = corpus reaches recall 1.0 at round 0") {
    import org.apache.spark.sql.functions.col
    val n = graft.operators.Dedup.vectors(spark, sf).count().toInt
    val pool0 = Similarity.sim20Pools(spark, sf,
        configs = Seq((n, Similarity.GraphBeam)))
      .filter(col("er") === 0)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.sim01BruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.subsetOf(pool0),
      "an all-corpus entry set must contain every true neighbor at round 0")
  }

  test("sim18 post-swap assignment equals a fresh build over the merged corpus") {
    import org.apache.spark.sql.functions._
    val merged = Similarity.mergedCorpus(spark, sf)
    // Fresh build: train directly over the merged corpus (no store in
    // the loop) and assign — sim18's store round-trip must change
    // nothing (parquet doubles are lossless; the swap reads back what
    // training produced).
    val fresh = Similarity.ivfAssigned(merged,
        Similarity.trainKmeans(merged, Similarity.NumCentroids,
            Similarity.KmeansIters, cosine = true)
          .zipWithIndex.map { case (cv, i) => i.toLong -> cv })
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        sum((col("vec_id") >= Similarity.StaleIdBase).cast("long"))
          .as("n_appends"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val swapped = Similarity.sim18RetrainSwap(spark, sf).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(swapped == fresh,
      "post-swap layout must be exactly a fresh sim03 build over the merged corpus")
    // Every append is in the layout.
    assert(swapped.values.map(_._2).sum ==
      Similarity.StaleBatches.toLong * Similarity.NumQueryVectors)
  }

  test("sim18 retains v1: pre-swap assignments stay reproducible (time travel)") {
    import org.apache.spark.sql.functions._
    val (v1, v2) = Similarity.sim18Published(spark, sf)
    assert(v1 == 1L && v2 == 2L, "per-session store must be deterministic")
    val base = Similarity.sim18Base(spark, sf)
    // v1 read back IS the deployed codebook (byte-stable retention)...
    val stored = graft.sources.CodebookStore.codebookAt(spark, base, v1)
    val deployed = Similarity.trainedCodebook(spark, sf)
    assert(stored.length == deployed.length &&
      stored.zip(deployed).forall { case ((ci, cv), (di, dv)) =>
        ci == di && cv.sameElements(dv)
      }, "retained v1 must equal the deployed codebook exactly")
    // ...so any pre-swap probe result recomputes exactly: the merged
    // corpus assigned under v1 equals assignment under the deployed
    // codebook (etl23's time-travel contract for the model artifact).
    val merged = Similarity.mergedCorpus(spark, sf)
    def layout(cb: Array[(Long, Array[Double])]) =
      Similarity.ivfAssigned(merged, cb)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(layout(stored) == layout(deployed))
    // The swap genuinely retrained: v2 differs from v1 (drifted appends
    // moved the centroids), so the flip is observable, not a no-op.
    val post = graft.sources.CodebookStore.codebookAt(spark, base, v2)
    assert(!stored.zip(post).forall { case ((_, cv), (_, dv)) =>
      cv.sameElements(dv)
    }, "retraining over the drifted corpus must move at least one centroid")
  }
}
