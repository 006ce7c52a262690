package graft.props

import graft.functions.{CosineSimilarity, L2Distance, MinHashAgg, MinHashSignature, ShingleHashes, SimHashAgg, WinnowFingerprints}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite for the native Catalyst pieces — the math
  * must hold for arbitrary inputs, not just the fixtures the example
  * specs use. Expressions are evaluated through their interpreted path
  * (`eval`), which the CosineSimilaritySpec separately pins equal to
  * the codegen path.
  */
object GraftProps extends Properties("graft") {

  private val dimGen = Gen.choose(1, 64)
  private def vecGen(dim: Int): Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.choose(-10.0, 10.0))

  private def arrLit(a: Array[Double]) =
    Literal.create(a, ArrayType(DoubleType))

  property("cosine_sim matches a reference implementation") =
    Prop.forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) {
      case (a, b) =>
        val got = CosineSimilarity(arrLit(a), arrLit(b)).eval(null)
          .asInstanceOf[Double]
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        val expected = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
        math.abs(got - expected) <= 1e-9
    }

  property("cosine_sim is symmetric and bounded to [-1, 1]") =
    Prop.forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) {
      case (a, b) =>
        val ab = CosineSimilarity(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
        val ba = CosineSimilarity(arrLit(b), arrLit(a)).eval(null).asInstanceOf[Double]
        ab == ba && ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12
    }

  property("l2_distance matches a reference implementation and the metric axioms") =
    Prop.forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) {
      case (a, b) =>
        val got = L2Distance(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
        val expected = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        val self = L2Distance(arrLit(a), arrLit(a)).eval(null).asInstanceOf[Double]
        math.abs(got - expected) <= 1e-9 && got >= 0.0 && self == 0.0
    }

  private val hashesGen = Gen.nonEmptyListOf(Gen.long)

  /** SimHashAgg must be order- and partitioning-invariant: any split of
    * the input into partial buffers merged in any order gives the same
    * hash as one sequential pass — this is exactly what map-side
    * partial aggregation assumes.
    */
  property("simhash_agg is partition- and order-invariant") =
    Prop.forAll(hashesGen, Gen.choose(1, 5)) { (hashes, nSplits) =>
      val agg = SimHashAgg(BoundReference(0, LongType, nullable = false))
      def run(groups: Seq[Seq[Long]]): Long = {
        val bufs = groups.map { g =>
          g.foldLeft(agg.createAggregationBuffer()) { (buf, h) =>
            agg.update(buf, InternalRow(h))
          }
        }
        agg.eval(bufs.reduce(agg.merge)).asInstanceOf[Long]
      }
      val single = run(Seq(hashes))
      val splits = hashes.grouped(
        math.max(1, hashes.size / nSplits)).toSeq
      val shuffled = run(scala.util.Random.shuffle(splits))
      single == shuffled
    }

  // ---- native text expressions vs pure-Scala references ----

  /** Random "documents": words over a tiny alphabet (to force repeats)
    * joined by 1–2 spaces (empty tokens exercised), occasional unicode.
    */
  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "déjà", "x", "yy", "数据")
  private val textGen: Gen[String] = for {
    words <- Gen.listOf(wordGen)
    seps <- Gen.listOfN(math.max(words.size - 1, 0), Gen.oneOf(" ", "  "))
  } yield words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString

  private def strLit(s: String) = Literal.create(s, StringType)

  private def refShingles(text: String, n: Int): Set[Seq[String]] =
    text.split(" ", -1).toSeq.sliding(n).filter(_.size == n).toSet

  property("shingle_hashes bijects with the token-tuple shingle set") =
    Prop.forAll(textGen, textGen, Gen.choose(2, 4)) { (a, b, n) =>
      def hashes(t: String): Set[Long] =
        ShingleHashes(strLit(t), n).eval(null)
          .asInstanceOf[ArrayData].toLongArray().toSet
      val (ha, hb) = (hashes(a), hashes(b))
      val (ra, rb) = (refShingles(a, n), refShingles(b, n))
      ha.size == ra.size && hb.size == rb.size &&
        (ha intersect hb).size == (ra intersect rb).size
    }

  /** Pure-Scala winnowing mirror: md5-derived gram hashes, window min,
    * distinct — the contract the DuckDB oracle replays.
    */
  private def refWinnow(text: String, k: Int, w: Int): Set[Long] = {
    val ng = text.length - k + 1
    if (ng < w) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until ng).map { i =>
      md.reset()
      val d = md.digest(text.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    (0 to ng - w).map(j => hs.slice(j, j + w).min).toSet
  }

  property("winnow_fingerprints equals the md5 window-min reference") =
    Prop.forAll(textGen, Gen.choose(2, 8), Gen.choose(2, 4)) { (t, k, w) =>
      val got = WinnowFingerprints(strLit(t), k, w).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSet
      got == refWinnow(t, k, w)
    }

  property("minhash_signature equals MinHashAgg over the same hashes") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.choose(1, 32)) { (hs, n) =>
      val viaExpr = MinHashSignature(
        Literal.create(hs.toArray, ArrayType(LongType)), n)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val agg = MinHashAgg(BoundReference(0, LongType, nullable = false), n)
      val buf = hs.foldLeft(agg.createAggregationBuffer()) { (b, h) =>
        agg.update(b, InternalRow(h))
      }
      val viaAgg = agg.eval(buf).asInstanceOf[ArrayData].toLongArray().toSeq
      viaExpr == viaAgg
    }

  property("minhash signatures are monotone under set union") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (a, b) =>
      def sig(xs: Seq[Long]): Seq[Long] =
        MinHashSignature(Literal.create(xs.toArray, ArrayType(LongType)), 16)
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      sig(a ++ b).zip(sig(a)).forall { case (u, x) => u <= x }
    }

  /** dedup04's pigeonhole recall guarantee, as pure bit math: for ANY
    * 64-bit pair within hamming ≤ 3, at least one block-combination
    * key matches under every admissible SimhashBlocking — so candidate
    * generation can never drop a qualifying pair, regardless of which
    * config the measured corpus size picks.
    */
  private def comboKeys(
      sh: Long, blocks: Int, keyBlocks: Int,
      bits: Int = 64): Set[(Seq[Int], Seq[Long])] = {
    val width = bits / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    def block(i: Int): Long = (sh >>> (i * width)) & mask
    // Each key carries its COMBO IDENTITY (which block indices formed
    // it), mirroring dedup04's real (chunk_idx, chunk) equi-join key:
    // two signatures only meet in the join when the SAME combination
    // yields the same packed value. Without the identity, a value
    // collision across DIFFERENT combos would count as a shared key
    // here yet never match in the actual join — the property would be
    // weaker than the guarantee it pins.
    (0 until blocks).combinations(keyBlocks)
      .map(bs => (bs.toSeq, bs.map(block).toSeq)).toSet
  }

  private val hamming3PairGen: Gen[(Long, Long)] = for {
    a <- Gen.long
    nFlips <- Gen.choose(0, 3)
    bits <- Gen.pick(nFlips, 0 until 64)
  } yield (a, bits.foldLeft(a)((x, b) => x ^ (1L << b)))

  property("simhash blocking: every hamming<=3 pair shares a key at (4,1) and (8,5)") =
    Prop.forAll(hamming3PairGen) { case (a, b) =>
      Seq((4, 1), (8, 5)).forall { case (blocks, keyBlocks) =>
        (comboKeys(a, blocks, keyBlocks) intersect
          comboKeys(b, blocks, keyBlocks)).nonEmpty
      }
    }

  property("simhash blocking: hamming>3 pairs exist that share no key (the filter is load-bearing)") =
    // Not a per-sample law (distant pairs CAN collide — that is the
    // birthday term); assert the blocking is not vacuously permissive:
    // flipping one bit in every block kills all (8,5) keys.
    Prop.forAll(Gen.long) { a =>
      val b = (0 until 8).foldLeft(a)((x, blk) => x ^ (1L << (blk * 8)))
      (comboKeys(a, 8, 5) intersect comboKeys(b, 8, 5)).isEmpty
    }

  /** mm07's radius-4 settings of the SAME generalized guarantee: the
    * 8-bit barcode config (8 single-bit blocks, 4-combination keys)
    * and the documented 64-bit photo-hash config (8×8-bit blocks).
    */
  private def hamming4PairGen(bits: Int): Gen[(Long, Long)] = for {
    a <- if (bits == 64) Gen.long else Gen.choose(0L, (1L << bits) - 1)
    nFlips <- Gen.choose(0, 4)
    flipped <- Gen.pick(nFlips, 0 until bits)
  } yield (a, flipped.foldLeft(a)((x, b) => x ^ (1L << b)))

  property("phash blocking: every hamming<=4 pair shares a key at (8,4) on 8-bit hashes") =
    Prop.forAll(hamming4PairGen(8)) { case (a, b) =>
      (comboKeys(a, 8, 4, bits = 8) intersect
        comboKeys(b, 8, 4, bits = 8)).nonEmpty
    }

  property("phash blocking: every hamming<=4 pair shares a key at (8,4) on 64-bit hashes") =
    Prop.forAll(hamming4PairGen(64)) { case (a, b) =>
      (comboKeys(a, 8, 4) intersect comboKeys(b, 8, 4)).nonEmpty
    }

  property("phash blocking: hamming>4 pairs exist that share no key at (8,4)") =
    Prop.forAll(Gen.choose(0L, 255L)) { a =>
      // One flip in 5 of the 8 single-bit blocks kills every
      // 4-combination key on the 8-bit config.
      val b = (0 until 5).foldLeft(a)((x, blk) => x ^ (1L << blk))
      (comboKeys(a, 8, 4, bits = 8) intersect
        comboKeys(b, 8, 4, bits = 8)).isEmpty
    }

  // ---- The takedown algebra (cur24/cur25/cur27's laws), proved for
  // ARBITRARY packings instead of the tested corpora: the cur27 oracle
  // EXPECTS mask-read == repack-read on every row, so the law itself
  // must hold universally — ctx 1, docs spanning many sequences,
  // adjacent recalls, a recall at a source's head/tail, an
  // all-recalled source. Docs are (length, recalled) pairs packed as a
  // running concatenation of GLOBALLY DISTINCT tokens (distinctness
  // makes any order/content slip visible); spans derive from the SAME
  // integer clipping formulas recalledMaskRows ships.

  private val packingGen: Gen[(Int, List[(Int, Boolean)])] = for {
    ctx <- Gen.choose(1, 16)
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n,
      Gen.zip(Gen.choose(1, 40), Gen.oneOf(true, false)))
  } yield (ctx, docs)

  property("mask-read == repack-read for every packing and recall set (cur27's law)") =
    Prop.forAll(packingGen) { case (ctx, docs) =>
      // The packed stream: doc d contributes tokens tagged (d, i).
      val stream = docs.zipWithIndex.flatMap { case ((len, _), d) =>
        (0 until len).map(i => (d, i))
      }
      def tile(s: List[(Int, Int)]): List[List[(Int, Int)]] =
        s.grouped(ctx).toList
      val seqs = tile(stream)
      // Mask spans via the shipping clipping arithmetic: per recalled
      // doc, per covered sequence, [lo - seq*ctx, hi - 1 - seq*ctx].
      val cumStarts = docs.map(_._1).scanLeft(0)(_ + _)
      val masksBySeq = docs.zipWithIndex.collect {
        case ((len, true), d) =>
          val cum = cumStarts(d)
          val seqFirst = cum / ctx
          val seqLast = (cum + len - 1) / ctx
          (seqFirst to seqLast).map { s =>
            val lo = math.max(cum, s * ctx)
            val hi = math.min(cum + len, (s + 1) * ctx)
            (s, lo - s * ctx, hi - 1 - s * ctx)
          }
      }.flatten.groupBy(_._1)
      // Leg A: drop the masked in-sequence offsets, concat, re-tile.
      val maskedStream = seqs.zipWithIndex.flatMap { case (toks, s) =>
        val spans = masksBySeq.getOrElse(s, Seq.empty)
        toks.zipWithIndex.collect {
          case (t, p) if !spans.exists(m => p >= m._2 && p <= m._3) => t
        }
      }
      // Leg B: pack the survivors only (order preserved), tile.
      val survivorStream = docs.zipWithIndex.flatMap {
        case ((len, false), d) => (0 until len).map(i => (d, i))
        case _ => Nil
      }
      tile(maskedStream) == tile(survivorStream)
    }

  // ---- The COMPOSED mask algebra (cur29's law): whole-doc takedown
  // masks and span-level redaction masks applied in ONE pass over the
  // original tiling must equal the doubly-repacked stream (takedown
  // docs removed entirely, surviving docs minus their CLAMPED spans,
  // survivors re-tiled). Spans are arbitrary — negative, inverted,
  // out-of-range, overlapping a takedown — exercising exactly the
  // clamp + empty-range guard docSpanMaskRows/clippedMaskRows ship.

  private val composedGen: Gen[(Int, List[(Int, Boolean, Option[(Int, Int)])])] =
    for {
      ctx <- Gen.choose(1, 16)
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 40)
        td <- Gen.oneOf(true, false)
        span <- Gen.option(
          Gen.zip(Gen.choose(-5, 45), Gen.choose(-5, 45)))
      } yield (len, td, span))
    } yield (ctx, docs)

  property("composed whole-doc + span masks == doubly-repacked stream (cur29's law)") =
    Prop.forAll(composedGen) { case (ctx, docs) =>
      val cumStarts = docs.map(_._1).scanLeft(0)(_ + _)
      // The shipping clipping arithmetic, empty-range guard included.
      def clip(cumLo: Int, cumHi: Int): Seq[(Int, Int, Int)] =
        if (cumLo >= cumHi) Nil
        else (cumLo / ctx to (cumHi - 1) / ctx).map { s =>
          val lo = math.max(cumLo, s * ctx)
          val hi = math.min(cumHi, (s + 1) * ctx)
          (s, lo - s * ctx, hi - 1 - s * ctx)
        }
      val masks = docs.zipWithIndex.flatMap { case ((len, td, span), d) =>
        val cum = cumStarts(d)
        val whole = if (td) clip(cum, cum + len) else Nil
        // docSpanMaskRows' clamp to [0, len) before clipping.
        val spanRows = span.toSeq.flatMap { case (a, b) =>
          clip(cum + math.max(a, 0), cum + math.min(b, len))
        }
        whole ++ spanRows
      }.groupBy(_._1)
      val stream = docs.zipWithIndex.flatMap { case ((len, _, _), d) =>
        (0 until len).map(i => (d, i))
      }
      def tile(s: List[(Int, Int)]): List[List[(Int, Int)]] =
        s.grouped(ctx).toList
      // One composed pass over the ORIGINAL tiling: a position is
      // dropped if ANY mask row of either family covers it.
      val maskedStream = tile(stream).zipWithIndex.flatMap { case (toks, s) =>
        val spans = masks.getOrElse(s, Seq.empty)
        toks.zipWithIndex.collect {
          case (t, p) if !spans.exists(m => p >= m._2 && p <= m._3) => t
        }
      }
      // The doubly-scrubbed survivor stream, packed directly.
      val survivorStream = docs.zipWithIndex.flatMap {
        case ((len, false, span), d) =>
          val (lo, hi) = span
            .map { case (a, b) => (math.max(a, 0), math.min(b, len)) }
            .getOrElse((0, 0))
          (0 until len).collect {
            case i if !(lo < hi && i >= lo && i < hi) => (d, i)
          }
        case _ => Nil
      }
      tile(maskedStream) == tile(survivorStream)
    }

  property("prefix stability: a survivor keeps its position iff it packs before the first recall (cur24's law)") =
    Prop.forAll(packingGen) { case (ctx, docs) =>
      val cumBefore = docs.map(_._1).scanLeft(0)(_ + _)
      val survivors = docs.zipWithIndex.filterNot(_._1._2)
      val cumAfter = survivors.map(_._1._1).scanLeft(0)(_ + _)
      val firstRm = docs.indexWhere(_._2)
      survivors.zipWithIndex.forall { case (((_, _), d), k) =>
        val before = (cumBefore(d) / ctx, cumBefore(d) % ctx)
        val after = (cumAfter(k) / ctx, cumAfter(k) % ctx)
        val stable = before == after
        if (firstRm < 0 || d < firstRm) stable
        // After the first recall every survivor's cum_start shifted by
        // a POSITIVE mass, so (seq, off) cannot survive.
        else !stable
      }
    }


  // ---- etl32's Morton (Z-order) mask ladder ----------------------------

  /** JVM replica of Etl.zSpread16's mask ladder (the spec separately
    * pins the emitted z_key column equal to this arithmetic row for
    * row, so properties proven here carry to the shipped layout).
    */
  private def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    (v | (v << 1)) & 0x55555555L
  }
  private def morton(x: Long, y: Long): Long = spread16(x) | (spread16(y) << 1)
  private val dim16 = Gen.choose(0L, 65535L)

  property("morton spread is exactly bit i -> bit 2i (ladder = definition)") =
    Prop.forAll(dim16) { x =>
      val direct = (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).sum
      spread16(x) == direct
    }

  property("morton interleave is injective (the layout loses no key pair)") =
    Prop.forAll(dim16, dim16, dim16, dim16) { (x1, y1, x2, y2) =>
      (morton(x1, y1) == morton(x2, y2)) == (x1 == x2 && y1 == y2)
    }

  property("morton is monotone per axis (range scans stay range scans)") =
    // With the other dimension FIXED, increasing one dimension strictly
    // increases the z-value — so a single-axis range predicate maps to
    // a union of z-ranges, never a scattered set (what makes min/max
    // file bands prunable on either axis).
    Prop.forAll(dim16, dim16, dim16) { (x1, x2, y) =>
      (x1 == x2) || ((x1 < x2) == (morton(x1, y) < morton(x2, y))) &&
        ((x1 < x2) == (morton(y, x1) < morton(y, x2)))
    }

  property("morton shared high bits = shared 2-D quadrant (locality law)") =
    // Two points agreeing on their top k bits in BOTH dimensions agree
    // on the top 2k bits of z — nearby rectangles land in nearby
    // z-ranges, which is the whole file-locality argument.
    Prop.forAll(dim16, dim16, dim16, dim16, Gen.choose(1, 15)) {
      (x1, y1, x2, y2, k) =>
        val drop = 16 - k
        ((x1 >> drop) != (x2 >> drop)) || ((y1 >> drop) != (y2 >> drop)) ||
          (morton(x1, y1) >> (2 * drop)) == (morton(x2, y2) >> (2 * drop))
    }
}
