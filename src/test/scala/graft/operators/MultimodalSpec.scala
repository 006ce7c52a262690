package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("fakeResize samples the full grid and handles edge sizes") {
    // Uniform bytes: every sample reads the same value, so the
    // checksum is exactly samples * value and the mean is value/255.
    val uniform = Array.fill(1000)(0x41.toByte) // 'A' = 65
    val (sum, mean) = MultimodalStub.fakeResize(uniform)
    val samples = MultimodalStub.OutW * MultimodalStub.OutH
    assert(sum == samples.toLong * 65)
    assert(math.abs(mean - 65.0 / 255.0) < 1e-4)
    // Media smaller than the grid: positions repeat, never out of range.
    val tiny = Array[Byte](1, 2)
    val (tinySum, _) = MultimodalStub.fakeResize(tiny)
    assert(tinySum >= samples.toLong * 1 && tinySum <= samples.toLong * 2)
    assert(MultimodalStub.fakeResize(Array.emptyByteArray) == (0L, 0.0))
  }

  test("resizeImage really downsamples: dims, constant-color law, determinism") {
    // A constant-color source survives ANY interpolation exactly, so
    // the real kernel has one exact law an assertion can hold it to.
    val c = 137
    val const = png(64, 48)((_, _) => (c, c, c))
    val (w, h, out) = MultimodalStub.resizeImage(
      const, MultimodalStub.OutW, MultimodalStub.OutH)
    assert((w, h) == (64, 48))
    assert(out.length == MultimodalStub.OutW * MultimodalStub.OutH * 3)
    assert(out.forall(b => (b & 0xFF) == c),
      "bilinear rescale of a constant image must stay constant")
    // A gradient downsample: deterministic run-to-run, values bounded
    // by the source range (bilinear is a convex combination).
    val grad = png(64, 48)((x, y) => (x * 3, y * 5, (x + y) * 2))
    val (_, _, g1) = MultimodalStub.resizeImage(grad, 16, 9)
    val (_, _, g2) = MultimodalStub.resizeImage(grad, 16, 9)
    assert(g1.toSeq == g2.toSeq, "kernel must be deterministic")
    assert(g1.length == 16 * 9 * 3)
    (0 until 16 * 9).foreach { i =>
      assert((g1(i * 3) & 0xFF) <= 63 * 3, s"R out of source range at $i")
    }
    intercept[IllegalArgumentException] {
      MultimodalStub.resizeImage("junk".getBytes("UTF-8"), 4, 4)
    }
  }

  test("resizeMeta drives the real Graphics2D kernel through the batched executor path") {
    // Constant-color images, more than one batch: each row's checksum
    // is exactly out_pixels * 3 * c — the constant-color law end to
    // end through encode -> mapPartitions -> decode -> rescale.
    val n = MultimodalStub.BatchSize + 5
    val rows = (0L until n.toLong).map { id =>
      val c = (id % 251).toInt
      (id, png(40, 30)((_, _) => (c, c, c)))
    }
    import spark.implicits._
    val media = rows.toDF("img_id", "media").repartition(3)
    val got = Multimodal.resizeMeta(media).collect()
    assert(got.length == n)
    val outPx = MultimodalStub.OutW * MultimodalStub.OutH
    got.foreach { r =>
      val c = (r.getLong(0) % 251).toInt
      assert((r.getInt(1), r.getInt(2)) == (40, 30), "source dims")
      assert((r.getInt(3), r.getInt(4)) ==
        (MultimodalStub.OutW, MultimodalStub.OutH), "target dims")
      assert(r.getInt(5) == outPx * 3, "resized byte count")
      assert(r.getLong(6) == outPx.toLong * 3 * c,
        s"img ${r.getLong(0)}: constant-color checksum law")
      assert(r.getDouble(7) ==
        math.round(outPx.toLong * 3 * c / 255.0 / (outPx * 3) * 10000.0) / 10000.0)
    }
  }

  test("mm04ResizeReal runs the real kernel over the staged mm05 PNG landing dir") {
    val got = Multimodal.mm04ResizeReal(spark, sf).collect()
    assert(got.length == Multimodal.Mm05Images)
    got.foreach { r =>
      val c = (r.getLong(0) % 249).toInt
      assert((r.getInt(1), r.getInt(2)) == (4, 2), "test cards are 4x2")
      assert((r.getInt(3), r.getInt(4)) ==
        (MultimodalStub.OutW, MultimodalStub.OutH))
      // Bilinear output is a convex combination of source pixels, so
      // every resized byte sits inside the test card's channel range
      // [c, c+6] and so does the mean intensity.
      val outPx = MultimodalStub.OutW * MultimodalStub.OutH
      assert(r.getLong(6) >= outPx.toLong * 3 * c &&
        r.getLong(6) <= outPx.toLong * 3 * (c + 6),
        s"img ${r.getLong(0)}: checksum outside source range")
    }
    // Deterministic across runs (same staged files, same kernel).
    val again = Multimodal.mm04ResizeReal(spark, sf).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("fakeFeatures is deterministic and has the declared shape") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val f1 = MultimodalStub.fakeFeatures(bytes)
    val f2 = MultimodalStub.fakeFeatures(bytes)
    assert(f1.length == MultimodalStub.FeatureDim)
    assert(f1.toSeq == f2.toSeq)
    assert(MultimodalStub.fakeFeatures(Array.emptyByteArray).toSeq ==
      Seq.fill(MultimodalStub.FeatureDim)(0.0))
  }

  /** Encode a w×h image as real PNG bytes, pixel (x,y) colored by `f`. */
  private def png(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "JDK must carry a PNG writer")
    out.toByteArray
  }

  test("decodeImage round-trips generated PNGs exactly (dims + every pixel)") {
    val bytes = png(5, 3)((x, y) => (x * 40, y * 80, (x + y) * 10))
    val (w, h, rgb) = MultimodalStub.decodeImage(bytes)
    assert((w, h) == (5, 3))
    assert(rgb.length == 5 * 3 * 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val i = (y * 5 + x) * 3
      assert((rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF) ==
        (x * 40, y * 80, (x + y) * 10), s"pixel ($x,$y)")
    }
    // PNG is lossless, so a palette of exact byte values survives; and
    // corrupt media must throw, not fabricate pixels.
    intercept[IllegalArgumentException] {
      MultimodalStub.decodeImage("not an image".getBytes("UTF-8"))
    }
  }

  test("decodeMeta drives real PNG decode through the batched executor path") {
    // More images than one mapPartitions batch, with per-image solid
    // colors, so each row's means pin which image it decoded.
    val n = MultimodalStub.BatchSize + 7
    val rows = (0L until n.toLong).map { id =>
      val c = (id % 251).toInt
      (id, png(4, 2)((_, _) => (c, (c + 3) % 256, (c + 5) % 256)))
    }
    import spark.implicits._
    val media = rows.toDF("img_id", "media").repartition(3)
    val got = Multimodal.decodeMeta(media).collect()
    assert(got.length == n)
    got.foreach { r =>
      val c = (r.getLong(0) % 251).toInt
      assert((r.getInt(1), r.getInt(2)) == (4, 2), s"img ${r.getLong(0)} dims")
      assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ==
        (c.toDouble, ((c + 3) % 256).toDouble, ((c + 5) % 256).toDouble),
        s"img ${r.getLong(0)} means")
    }
  }

  test("mm05 ingests real PNG files and decodes to the predicted statistics") {
    val got = Multimodal.mm05BinaryIngest(spark, sf).collect()
    assert(got.length == Multimodal.Mm05Images)
    got.foreach { r =>
      val c = (r.getLong(0) % 249).toDouble
      assert((r.getInt(1), r.getInt(2)) == (4, 2))
      assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ==
        (c + 2, c + 3, c + 4), s"img ${r.getLong(0)}")
    }
    // Build-once: a second call reuses the staged landing dir (no
    // rewrite) and returns identical rows.
    val again = Multimodal.mm05BinaryIngest(spark, sf).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mm03 emits one feature row per document, stable across runs") {
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val r1 = Multimodal.mm03FeatureStub(spark, sf).collect()
    val r2 = Multimodal.mm03FeatureStub(spark, sf).collect()
    assert(r1.length == docs)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("mm03 features agree with a driver-side recomputation") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Multimodal.mm03FeatureStub(spark, sf).collect()
    out.take(50).foreach { r =>
      val expected = MultimodalStub.fakeFeatures(texts(r.getLong(0)).getBytes("UTF-8"))
      val got = (0 until MultimodalStub.FeatureDim).map(i => r.getDouble(2 + i))
      assert(got == expected.toSeq, s"doc ${r.getLong(0)}")
    }
  }

  test("realFeatures computes exact per-channel statistics over a decoded raster") {
    // A 4x2 test card at c = 126 puts red values {126,127,127,128,128,
    // 129,129,130}: the means are exact integers, the bright count
    // (red >= 128) is 5, and the red histogram straddles buckets 1/2
    // (64..127 vs 128..191) at 3/5 — every boundary in the kernel is
    // live.
    val c = 126
    val bytes = png(4, 2)((x, y) => (c + x + y, c + 1 + x + y, c + 2 + x + y))
    val (w, h, rgb) = MultimodalStub.decodeImage(bytes)
    val f = MultimodalStub.realFeatures(w, h, rgb)
    assert(f.length == MultimodalStub.FeatureDim)
    assert((f(0), f(1), f(2)) == ((c + 2).toDouble, (c + 3).toDouble, (c + 4).toDouble))
    assert(f(3) == 5.0, "bright pixels: the five reds >= 128")
    assert((f(4), f(5), f(6), f(7)) == (0.0, 3.0, 5.0, 0.0),
      "red histogram must straddle the 128 bucket boundary")
    assert(f(4) + f(5) + f(6) + f(7) == (w * h).toDouble,
      "histogram buckets must partition the pixels")
    // Solid color: everything lands in one bucket, means are the color.
    val solid = MultimodalStub.realFeatures(4, 2,
      Array.fill(4 * 2 * 3)(200.toByte))
    assert((solid(0), solid(3), solid(7)) == (200.0, 8.0, 8.0))
  }

  test("mm09FeatureReal earns the analytic feature law over the staged PNGs") {
    val got = Multimodal.mm09FeatureReal(spark, sf).collect()
    assert(got.length == Multimodal.Mm05Images)
    val sVals = Seq(0, 1, 1, 2, 2, 3, 3, 4) // x+y multiset of the 4x2 card
    got.foreach { r =>
      val c = (r.getLong(0) % 249).toInt
      assert(r.getInt(1) == 8, "test cards are 4x2 = 8 pixels")
      val f = (0 until MultimodalStub.FeatureDim).map(i => r.getDouble(2 + i))
      assert((f(0), f(1), f(2)) ==
        ((c + 2).toDouble, (c + 3).toDouble, (c + 4).toDouble),
        s"img ${r.getLong(0)} channel means")
      assert(f(3) == sVals.count(s => c + s >= 128).toDouble,
        s"img ${r.getLong(0)} bright count")
      (0 until 4).foreach { b =>
        assert(f(4 + b) == sVals.count(s => (c + s) / 64 == b).toDouble,
          s"img ${r.getLong(0)} histogram bucket $b")
      }
    }
    // Deterministic across runs (same staged files, same kernel).
    val again = Multimodal.mm09FeatureReal(spark, sf).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mm06 perceptual hashes recover the barcode bits through real decode") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 128L, 170L, 255L, 300L)
    val media = ids.map(id => (id, MultimodalStub.barcodePng(id)))
      .toDF("img_id", "media")
    val got = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == id % 256,
        s"decoded hash of $id must equal its low byte, got ${got(id)}")
    }
  }

  test("aHash64 is well-defined for images past 64 pixels (no bit aliasing)") {
    // Pre-fix, bit j used 1L << j for EVERY pixel: a 16x16 image
    // aliased pixels 64.. onto bits 0..63 and an all-white image could
    // land anywhere. Now >64-pixel images hash an 8x8 NN downsample:
    // all-white -> all 64 bits, all-black -> none, and a half-split
    // image maps to exactly the grid cells that sample white pixels.
    def hashOf(bytes: Array[Byte]): Long = {
      val (w, h, rgb) = MultimodalStub.decodeImage(bytes)
      MultimodalStub.aHash64(w, h, rgb)
    }
    assert(hashOf(png(16, 16)((_, _) => (255, 255, 255))) == -1L)
    assert(hashOf(png(16, 16)((_, _) => (0, 0, 0))) == 0L)
    // Left half white: grid cells gx<4 sample x = gx*16/8 < 8 (white).
    val half = hashOf(png(16, 16)((x, _) => if (x < 8) (255, 0, 0) else (0, 0, 0)))
    val expected = (for (gy <- 0 until 8; gx <- 0 until 4)
      yield 1L << (gy * 8 + gx)).reduce(_ | _)
    assert(half == expected)
    // Size invariance of the downsampled regime: same pattern at 2x
    // resolution lands on the same fingerprint.
    assert(hashOf(png(32, 32)((x, _) => if (x < 16) (255, 0, 0) else (0, 0, 0))) == half)
    // <=64-pixel regime unchanged: the barcode law survives the split.
    assert(hashOf(MultimodalStub.barcodePng(170L)) == 170L)
  }

  test("mm06 near-dup pairs equal the driver-side bit-math replay") {
    val got = Multimodal.mm06PhashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ids = (0L until Multimodal.Mm05Images.toLong)
    val expected = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount((a % 256) ^ (b % 256))
      if d <= Multimodal.Mm06MaxHamming
    } yield (a, b, d)).toSet
    assert(got == expected,
      s"pair sets differ: got ${got.size}, expected ${expected.size}")
    // Non-degenerate: the radius admits real pairs but nothing close to
    // the all-pairs space.
    assert(expected.nonEmpty &&
      expected.size < ids.size.toLong * (ids.size - 1) / 4)
  }

  test("mm07 radius-4 pairs equal the exhaustive driver-side replay") {
    val got = Multimodal.mm07PhashBlocked(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ids = (0L until Multimodal.Mm05Images.toLong)
    val expected = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount((a % 256) ^ (b % 256))
      if d <= Multimodal.Mm07MaxHamming
    } yield (a, b, d)).toSet
    assert(got == expected,
      s"pair sets differ: got ${got.size}, expected ${expected.size}")
    // The wider radius must admit strictly more than mm06's band, and
    // strictly less than the all-pairs space (the filter is live).
    val all = ids.size.toLong * (ids.size - 1) / 2
    assert(expected.exists(_._3 > Multimodal.Mm06MaxHamming))
    assert(expected.size < all)
  }

  test("mm07 blocking at the 64-bit photo-hash config is exhaustive at radius <= 4") {
    import spark.implicits._
    import graft.operators.Dedup.SimhashBlocking
    // Synthetic 64-bit fingerprints (the aHash64 downsampled regime):
    // random bases plus planted neighbors at hamming 1..5 — the 5s
    // must fall OUTSIDE the radius, the 1..4s inside.
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => (i.toLong, rnd.nextLong()))
    val planted = base.take(20).zipWithIndex.map { case ((id, h), j) =>
      val flips = (j % 5) + 1
      val bits = rnd.shuffle((0 until 64).toList).take(flips)
      (1000L + id, bits.foldLeft(h)((x, b) => x ^ (1L << b)))
    }
    val all = base ++ planted
    val cfg = SimhashBlocking(8, 4, bits = 64, radius = 4)
    val got = Multimodal.phashBlockedPairs(all.toDF("img_id", "phash"), cfg)
      .filter(org.apache.spark.sql.functions.col("hamming") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d)).toSet
    assert(got == expected, "64-bit blocked pairs diverge from exhaustive")
    // The plants make both boundaries live: radius-4 pairs found,
    // radius-5 pairs present in the data yet excluded.
    assert(expected.exists(_._3 == 4))
    assert(all.combinations(2).exists { case Seq((_, x), (_, y)) =>
      java.lang.Long.bitCount(x ^ y) == 5
    })
  }

  test("mm08 frame hashes recover the scene law through real decode") {
    val got = Multimodal.perceptualHashes(Multimodal.mm08FrameFiles(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == Multimodal.Mm08Videos * Multimodal.Mm08Frames)
    got.foreach { case (id, h) =>
      val (v, f) = (id / 1000, id % 1000)
      assert(h == Multimodal.mm08FrameHash(v, f),
        s"video $v frame $f decoded hash $h != law")
    }
  }

  test("mm08 keyframes equal a driver-side replay; jitter never fires") {
    val got = Multimodal.mm08VideoKeyframes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = (0L until Multimodal.Mm08Videos.toLong).flatMap { v =>
      (0L until Multimodal.Mm08Frames.toLong).flatMap { f =>
        if (f == 0) Some((v, f, -1L))
        else {
          val d = java.lang.Long.bitCount(
            Multimodal.mm08FrameHash(v, f) ^ Multimodal.mm08FrameHash(v, f - 1)).toLong
          if (d > Multimodal.Mm06MaxHamming) Some((v, f, d)) else None
        }
      }
    }
    assert(got == expected)
    // The temporal semantics the operator exists for: within-scene
    // jitter (hamming-1 wobble) is ALWAYS suppressed — keyframes only
    // ever fire at video starts or scene boundaries.
    got.foreach { case (v, f, _) =>
      assert(f % Multimodal.Mm08SceneLen == 0,
        s"keyframe fired mid-scene at video $v frame $f")
    }
    // And real cuts are found: every video has more than one keyframe
    // (the scene law changes the base every Mm08SceneLen frames).
    val perVideo = got.groupBy(_._1).view.mapValues(_.size)
    assert(perVideo.values.forall(_ >= 2),
      s"scene cuts missed: $perVideo")
  }

  test("decodeWav round-trips the test tone SAMPLE-EXACTLY (every value, every position)") {
    // PCM is lossless and the writer emits a real RIFF container: the
    // decode must recover the exact alternating ±A sequence — this pin
    // is what licenses mm10's analytic oracle.
    Seq(0L, 3L, 119L, 255L).foreach { id =>
      val (n, a) = (Multimodal.mm10Samples(id), Multimodal.mm10Amp(id))
      val (rate, s) = MultimodalStub.decodeWav(
        MultimodalStub.testToneWav(n, a, Multimodal.Mm10Rate))
      assert(rate == Multimodal.Mm10Rate)
      assert(s.length == n, s"clip $id: frame count")
      (0 until n).foreach { t =>
        val want = if (t % 2 == 0) a else -a
        assert(s(t) == want, s"clip $id sample $t: ${s(t)} != $want")
      }
    }
    // Non-audio bytes must refuse loudly (the decodeImage posture).
    intercept[IllegalArgumentException](
      MultimodalStub.decodeWav(Array[Byte](1, 2, 3, 4)))
  }

  test("mm10 ingests real WAV files and decodes to the tone-law features") {
    val rows = Multimodal.mm10AudioIngest(spark, sf).collect()
    assert(rows.length == Multimodal.Mm10Clips)
    rows.foreach { r =>
      val id = r.getAs[Long]("clip_id")
      val (n, a) = (Multimodal.mm10Samples(id).toLong, Multimodal.mm10Amp(id).toLong)
      assert(r.getAs[Int]("sample_rate") == Multimodal.Mm10Rate)
      assert(r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Long]("duration_ms") == n * 1000L / Multimodal.Mm10Rate)
      assert(r.getAs[Long]("peak") == a)
      assert(r.getAs[Double]("rms") == a.toDouble,
        s"clip $id: square-wave RMS must be exactly the amplitude")
      assert(r.getAs[Long]("checksum") == -a * n / 2,
        s"clip $id: position-weighted checksum must telescope to -A*N/2")
      assert(r.getAs[Long]("zero_crossings") == n - 1)
    }
    // Deterministic run-over-run (staged once, decode is pure).
    val again = Multimodal.mm10AudioIngest(spark, sf).collect()
    assert(rows.map(_.toSeq.toVector).toVector == again.map(_.toSeq.toVector).toVector)
  }

  test("decodeWavWindowed tiles the stream exactly; bounded windows on a long clip") {
    // Reassembly law: the concatenated windows must be BIT-IDENTICAL
    // to the whole-clip decode — the windowed path may never drop,
    // pad, or re-order a frame across a window boundary.
    Seq(0L, 3L, 119L).foreach { id =>
      val bytes = MultimodalStub.testToneWav(
        Multimodal.mm10Samples(id), Multimodal.mm10Amp(id), Multimodal.Mm10Rate)
      val (_, whole) = MultimodalStub.decodeWav(bytes)
      val (rate, wins) = MultimodalStub.decodeWavWindowed(
        bytes, Multimodal.Mm10WindowSamples)
      assert(rate == Multimodal.Mm10Rate)
      val ws = wins.toVector
      assert(ws.init.forall(_.length == Multimodal.Mm10WindowSamples),
        "every non-final window is exactly the window size")
      assert(ws.last.length <= Multimodal.Mm10WindowSamples &&
        ws.last.length > 0, "the final window is the unpadded remainder")
      assert(ws.flatten == whole.toVector, s"clip $id: reassembly must be bit-exact")
    }
    // Long-form posture: a clip far past the window size streams
    // through without the whole-clip materialization (the iterator
    // only ever holds one window's samples).
    val longN = 200000 // 25 s at 8 kHz — ~781 windows
    val (_, wins) = MultimodalStub.decodeWavWindowed(
      MultimodalStub.testToneWav(longN, 100, Multimodal.Mm10Rate), 256)
    var count = 0
    var samples = 0L
    wins.foreach { w => count += 1; samples += w.length }
    assert(samples == longN.toLong && count == (longN + 255) / 256)
    // Same loud-refusal posture as the whole-clip path (shared gate).
    intercept[IllegalArgumentException](
      MultimodalStub.decodeWavWindowed(Array[Byte](1, 2, 3, 4), 256))
  }

  test("mm11 zero-sample clip stays visible: one sentinel zero-window row") {
    // mm10's whole-clip row reports such a clip with n_samples=0; the
    // windowed view must not silently drop it (it would otherwise
    // produce no windows at all — the one arm where 'zero rows' and
    // 'never rot the corpus' collide).
    val spark2 = spark
    import spark2.implicits._
    val empty = MultimodalStub.testToneWav(0, 100, Multimodal.Mm10Rate)
    val rows = Multimodal.audioWindowMeta(
      Seq((7L, empty)).toDF("clip_id", "media"), 256).collect()
    assert(rows.length == 1, s"expected one sentinel row, got ${rows.length}")
    val r = rows.head
    assert(r.getLong(0) == 7L && r.getInt(1) == 0 && r.getLong(2) == 0L &&
      r.getDouble(3) == 0.0 && r.getLong(4) == 0L && r.getLong(5) == 0L,
      s"sentinel must be all zeros: $r")
  }

  test("mm11 windowed profile obeys the per-window tone law end-to-end") {
    val rows = Multimodal.mm11AudioWindows(spark, sf).collect()
    val byClip = rows.groupBy(_.getAs[Long]("clip_id"))
    assert(byClip.size == Multimodal.Mm10Clips)
    val w = Multimodal.Mm10WindowSamples
    byClip.foreach { case (id, ws) =>
      val (n, a) = (Multimodal.mm10Samples(id), Multimodal.mm10Amp(id).toLong)
      assert(ws.length == (n + w - 1) / w, s"clip $id: window count")
      ws.sortBy(_.getAs[Int]("window_idx")).zipWithIndex.foreach { case (r, i) =>
        val L = math.min(n - i * w, w).toLong
        assert(r.getAs[Long]("n_samples") == L)
        assert(r.getAs[Double]("rms") == a.toDouble)
        assert(r.getAs[Long]("checksum") == -a * L / 2,
          s"clip $id window $i: the telescope is position-exact")
        assert(r.getAs[Long]("zero_crossings") == L - 1)
      }
      // The windows' checksums SUM to the whole-clip checksum — the
      // tiling proof at the feature level (global positions, no
      // double-counted or skipped sample anywhere).
      assert(ws.map(_.getAs[Long]("checksum")).sum == -a * n / 2)
    }
  }

  test("dftMagnitudes obeys the analytic single-component laws (DC, Nyquist, impulse, Parseval)") {
    def close(a: Double, b: Double, tol: Double = 1e-6) = math.abs(a - b) <= tol
    val n = 64
    // Constant A: all mass at DC (A·n), every other bin cancels.
    val const = MultimodalStub.dftMagnitudes(Array.fill(n)(500))
    assert(const.length == n / 2 + 1)
    assert(close(const(0), 500.0 * n))
    assert(const.zipWithIndex.drop(1).forall { case (m, _) => close(m, 0.0) })
    // Alternating ±A (the corpus tone): single spike at the Nyquist
    // bin of A·n — the law mm12's oracle replays per window.
    val alt = MultimodalStub.dftMagnitudes(
      Array.tabulate(n)(t => if (t % 2 == 0) 700 else -700))
    assert(close(alt(n / 2), 700.0 * n))
    assert(alt.zipWithIndex.filter(_._2 != n / 2)
      .forall { case (m, _) => close(m, 0.0) })
    // Unit impulse at t=0: a FLAT spectrum (every bin = A).
    val imp = MultimodalStub.dftMagnitudes(
      Array.tabulate(n)(t => if (t == 0) 900 else 0))
    assert(imp.forall(close(_, 900.0)))
    // Parseval over a deterministic pseudo-random vector: the
    // one-sided spectrum's folded energy equals n·Σs² — the kernel
    // conserves signal mass, not just the tone's special cases.
    val rnd = Array.tabulate(n)(t =>
      (((t.toLong * 1103515245L + 12345L) % 2001L) - 1000L).toInt)
    val mags = MultimodalStub.dftMagnitudes(rnd)
    val folded = mags(0) * mags(0) + mags(n / 2) * mags(n / 2) +
      2.0 * (1 until n / 2).map(k => mags(k) * mags(k)).sum
    val mass = n.toDouble * rnd.map(v => v.toDouble * v).sum
    assert(math.abs(folded - mass) <= 1e-9 * mass, s"Parseval: $folded vs $mass")
    assert(MultimodalStub.dftMagnitudes(Array.empty[Int]).isEmpty)
  }

  test("mm12 spectral windows obey the frequency-domain tone law; window peaks sum to the clip spike") {
    val rows = Multimodal.mm12AudioSpectral(spark, sf).collect()
    val byClip = rows.groupBy(_.getAs[Long]("clip_id"))
    assert(byClip.size == Multimodal.Mm10Clips)
    val w = Multimodal.Mm10WindowSamples
    byClip.foreach { case (id, ws) =>
      val (n, a) = (Multimodal.mm10Samples(id), Multimodal.mm10Amp(id).toLong)
      assert(ws.length == (n + w - 1) / w, s"clip $id: window count")
      ws.sortBy(_.getAs[Int]("window_idx")).zipWithIndex.foreach { case (r, i) =>
        val L = math.min(n - i * w, w).toLong
        assert(r.getAs[Long]("n_samples") == L)
        assert(r.getAs[Int]("peak_bin") == L / 2,
          s"clip $id window $i: the spike must sit at the Nyquist bin")
        assert(r.getAs[Double]("peak_mag") == (a * L).toDouble,
          s"clip $id window $i: |X(L/2)| must be exactly A*L")
        assert(r.getAs[Double]("dc_mag") == 0.0)
        assert(r.getAs[Double]("sideband_mag") == 0.0,
          s"clip $id window $i: a pure tone may leak NO sideband mass")
      }
      // WINDOW-TILING LAW: per-window spikes sum to A·n — the
      // whole-clip spike — because |X_w(L/2)| = A·L tiles the clip's
      // sample count exactly (mm11's checksum-tiling proof carried to
      // the frequency domain).
      assert(ws.map(_.getAs[Double]("peak_mag")).sum == (a * n).toDouble,
        s"clip $id: window spikes must tile the clip spike")
    }
    // The whole-clip side of the tiling law through the SAME kernel:
    // the clip-length DFT of the tone concentrates A·n at bin n/2.
    Seq(0L, 3L, 119L).foreach { id =>
      val (n, a) = (Multimodal.mm10Samples(id), Multimodal.mm10Amp(id).toLong)
      val (_, whole) = MultimodalStub.decodeWav(MultimodalStub.testToneWav(
        n, a.toInt, Multimodal.Mm10Rate))
      val mags = MultimodalStub.dftMagnitudes(whole)
      assert(math.round(mags(n / 2) * 10000.0) / 10000.0 == (a * n).toDouble,
        s"clip $id: whole-clip spike")
    }
  }

  test("mm12 zero-sample clip stays visible: one sentinel spectral row") {
    val spark2 = spark
    import spark2.implicits._
    val empty = MultimodalStub.testToneWav(0, 100, Multimodal.Mm10Rate)
    val rows = Multimodal.audioSpectralMeta(
      Seq((7L, empty)).toDF("clip_id", "media"), 256).collect()
    assert(rows.length == 1, s"expected one sentinel row, got ${rows.length}")
    val r = rows.head
    assert(r.getLong(0) == 7L && r.getInt(1) == 0 && r.getLong(2) == 0L &&
      r.getInt(3) == -1 && r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0 &&
      r.getDouble(6) == 0.0, s"sentinel must be empty-spectrum: $r")
  }

  test("mm07 output is blocking-invariant across admissible configs") {
    import graft.operators.Dedup.SimhashBlocking
    val bits = MultimodalStub.BarcodeBits
    // Every admissible keyBlocks for (blocks=8, radius=4) — the recall
    // guarantee covers the radius at each, so the RESULT (candidates
    // filtered to the radius) must be identical; only the candidate-set
    // size may differ.
    def pairsAt(kb: Int): Set[(Long, Long, Int)] =
      Multimodal.phashBlockedPairs(
          Multimodal.corpusImageHashes(spark, sf),
          SimhashBlocking(bits, kb, bits = bits, radius = Multimodal.Mm07MaxHamming))
        .filter(org.apache.spark.sql.functions.col("hamming") <=
          Multimodal.Mm07MaxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val reference = pairsAt(4)
    (1 to 3).foreach { kb =>
      assert(pairsAt(kb) == reference, s"keyBlocks=$kb diverges")
    }
    // Inadmissible configs must refuse loudly: keyBlocks past
    // blocks - radius would silently lose recall.
    intercept[IllegalArgumentException](
      SimhashBlocking(bits, 5, bits = bits, radius = Multimodal.Mm07MaxHamming))
    intercept[IllegalArgumentException](
      SimhashBlocking(3, 1, bits = bits, radius = Multimodal.Mm07MaxHamming))
  }
}
