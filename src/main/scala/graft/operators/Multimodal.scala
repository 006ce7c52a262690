package graft.operators

import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal plumbing mm01–mm04 (SURVEY.md §2): image/audio/video as
  * opaque BINARY columns with typed metadata. Image decode is REAL —
  * [[MultimodalStub.decodeImage]] runs the JDK's `javax.imageio` (no
  * external jar), driven end-to-end over generated PNGs in
  * MultimodalSpec via [[decodeMeta]]. The ORACLED `queries` entries
  * keep the deterministic fake kernels, because the DuckDB oracle can
  * replay those in SQL while the driver tables carry no encoded media;
  * the Spark-side plumbing (schema, binary handling, batched
  * mapPartitions, partitioning) is identical for both kernels.
  */
object Multimodal {

  /** mm01: binary column + typed metadata extraction. Media bytes are
    * simulated as the UTF-8 encoding of the document text (deterministic
    * in both engines); the metadata derivation is pure column math so it
    * runs codegen'd against real media bytes unchanged.
    */
  def mm01BinaryMeta(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("media", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("media")).as("n_bytes"),
        (octet_length(col("media")) % 640).as("fake_width"),
        (octet_length(col("media")) % 480).as("fake_height"),
        lit(3).as("channels"))
      .orderBy("doc_id")

  /** mm02: frame/window sampling over media duration — the distributed
    * explode pattern for video frame extraction (one output row per
    * sampled frame, computed on executors, never on the driver).
    */
  def mm02FrameSample(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("duration_s", col("n_chars") % 120)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("duration_s"), lit(10L))).as("frame_ts"))
      .orderBy("doc_id", "frame_ts")

  private val featureSchema = StructType(
    StructField("doc_id", LongType) +:
      StructField("n_bytes", IntegerType) +:
      (0 until MultimodalStub.FeatureDim).map(i =>
        StructField(s"f$i", DoubleType)))

  /** mm03: batched feature extraction over binary media via
    * mapPartitions — the plumbing a real (GPU/codec) featurizer needs:
    * partition-local batching, no driver involvement, stable schema.
    * The featurizer itself is [[MultimodalStub.fakeFeatures]]; the
    * feature vector is emitted as flat scalar columns (f0..f7) so the
    * result is sortable/hashable by any downstream comparator.
    */
  def mm03FeatureStub(spark: SparkSession, dir: String): DataFrame = {
    val withMedia = documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    withMedia.mapPartitions { rows =>
      // Real featurizers (image decode, mel spectrogram, …) want batches;
      // grouped() preserves that shape without materializing the partition.
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val feats = MultimodalStub.fakeFeatures(bytes)
          Row.fromSeq(r.getAs[Long]("doc_id") +: bytes.length +: feats.toSeq)
        }
      }
    }(enc).orderBy("doc_id")
  }
  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("checksum", LongType),
    StructField("mean_intensity", DoubleType)))

  /** mm04: batched resize/downsample plumbing — the nearest-neighbor
    * sampling shape of an image resize kernel (pick OutW×OutH source
    * positions, reduce), batched through mapPartitions exactly like
    * mm03. The kernel is [[MultimodalStub.fakeResize]] (deterministic,
    * SQL-replayable); a real codec swaps in behind the same schema and
    * batch shape.
    */
  def mm04ResizeStub(spark: SparkSession, dir: String): DataFrame = {
    val withMedia = documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      // Empty media has nothing to sample; dropped on BOTH sides (the
      // oracle's WHERE n_bytes > 0) so engine and oracle agree even on
      // corpora with empty documents.
      .filter(octet_length(col("media")) > 0)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizeSchema)
    withMedia.mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (checksum, mean) = MultimodalStub.fakeResize(bytes)
          Row(r.getAs[Long]("doc_id"), bytes.length,
            MultimodalStub.OutW, MultimodalStub.OutH, checksum, mean)
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Number of synthetic images mm05 stages — constant across scale
    * factors (doc_id < 256 exists at every SF), so the landing dir is
    * the same shape everywhere and the oracle needs no size parameter.
    */
  val Mm05Images = 256

  /** mm05: binary-file INGESTION + real decode, end-to-end — the leg
    * mm01–mm04 stub out. A landing directory of REAL PNG files (one
    * per doc_id < [[Mm05Images]], pixel pattern a pure function of the
    * id — [[MultimodalStub.testCardPng]]) is staged once per source
    * fingerprint (TableBuild.ensurePath, the etl17/etl22 build-once
    * discipline; the ENCODE runs distributed via foreachPartition),
    * then read back through Spark's `binaryFile` source and decoded on
    * executors by the real ImageIO path ([[decodeMeta]]).
    *
    * Because the test-card pattern keeps every channel value strictly
    * below 256, the per-channel means are EXACT integer functions of
    * the id (mean_r = id%249+2, +3, +4) — so the DuckDB oracle checks
    * the ENTIRE pipeline (encode → files → binaryFile scan → decode →
    * aggregate) with plain arithmetic on the documents table. At scale
    * this is the media-lake shape: opaque files land, a partitioned
    * binary scan + executor-side codec turns them into typed columns;
    * files per task is bounded by maxPartitionBytes like any source.
    */
  def mm05BinaryIngest(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(mm05Files(spark, dir))

  /** The mm05 landing directory as a (img_id, media) frame: real PNG
    * files staged once per source fingerprint, read back through the
    * `binaryFile` source. Shared by mm05's decode leg and the REAL
    * mm04 resize leg ([[mm04ResizeReal]]).
    */
  private[graft] def mm05Files(spark: SparkSession, dir: String): DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_mm05_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    TableBuild.ensurePath(spark, root,
        TableBuild.dirFingerprint(spark, s"$dir/documents.parquet")) {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      documents(spark, dir)
        .select(col("doc_id")).filter(col("doc_id") < Mm05Images)
        .foreachPartition { (rows: Iterator[Row]) =>
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(conf.value)
          rows.foreach { r =>
            val id = r.getLong(0)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(root, s"img_$id.png"), true)
            try out.write(MultimodalStub.testCardPng(id)) finally out.close()
          }
        }
      // Manual landing dirs carry no writer _SUCCESS; commit one so
      // ensurePath's marker contract (trust only committed layouts)
      // holds for this path too.
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(root)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("img_id"),
        col("content").as("media"))
  }

  /** mm04's REAL sibling (round-11 directive): the same resize plumbing
    * with the last fake kernel swapped for an actual JDK-only
    * `Graphics2D` bilinear rescale ([[MultimodalStub.resizeImage]] —
    * decode, draw into an OutW×OutH raster, re-extract pixels), driven
    * end-to-end over the staged mm05 PNG landing dir exactly like the
    * decode leg. Not a `queries` entry: real interpolated pixels have
    * no SQL-replayable law (the oracled mm04 keeps the deterministic
    * index-math twin); MultimodalSpec pins output dims, byte counts,
    * the constant-image exactness law, and determinism instead.
    */
  def mm04ResizeReal(spark: SparkSession, dir: String): DataFrame =
    resizeMeta(mm05Files(spark, dir))

  /** mm03's REAL sibling (round-12 directive: the last fake kernel) —
    * the same batched-mapPartitions featurizer plumbing with the kernel
    * swapped for [[MultimodalStub.realFeatures]]: per-channel statistics
    * (means, bright-pixel count, red histogram) over the ImageIO-decoded
    * raster, driven end-to-end over the staged mm05 PNG landing dir.
    * Unlike mm04's real leg this one IS a `queries` entry: the
    * test-card pixel law (channel value = id%249 + offset + x + y, all
    * < 256) makes every emitted feature an exact integer function of
    * the id, so the DuckDB oracle replays the whole encode → land →
    * binaryFile scan → decode → featurize chain with pure arithmetic on
    * the documents table. The fake-kernel mm03 entry stays for the
    * driver tables that carry no media; a GPU featurizer swaps in
    * behind the identical schema/batch shape.
    */
  def mm09FeatureReal(spark: SparkSession, dir: String): DataFrame =
    featureMeta(mm05Files(spark, dir))

  /** mm06's hamming radius for perceptual near-duplicate pairs. */
  val Mm06MaxHamming = 1

  /** mm06: IMAGE NEAR-DUP DETECTION via perceptual hash — the
    * multimodal member of the dedup family: land real encoded images,
    * decode on executors, reduce each to a tiny binarized fingerprint,
    * and pair images within hamming ≤ [[Mm06MaxHamming]] through an
    * equi-join — never an image×image comparison.
    *
    * Candidates use DELTA-NEIGHBORHOOD indexing (complementing
    * dedup04's pigeonhole blocking): each image's hash explodes into
    * itself plus all single-bit flips (hashBits+1 keys, a constant),
    * and an equi-join of that key set against raw hashes finds exactly
    * the hamming ≤ 1 pairs — corpus cost is linear × (bits+1), and at
    * 100 TB the join is the same shuffle shape as every dedup entry.
    *
    * The oracle closes the REAL-decode loop mm01–mm04 can't: the
    * staged PNGs are "barcodes" (pixel j is white iff bit j of the id
    * is set — [[MultimodalStub.barcodePng]]), so the decoded-then-
    * binarized hash equals `id % 256` analytically, and DuckDB replays
    * the ENTIRE pipeline (encode → files → binaryFile scan → ImageIO
    * decode → threshold hash → neighborhood join) with integer bit
    * math on the documents table. A wrong pixel anywhere breaks the
    * hash equality — the decode path is load-bearing, not decorative.
    */
  def mm06PhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val hashes = corpusImageHashes(spark, dir)
    neighborhoodProbes(hashes.select(col("img_id").as("img_a"),
        col("phash").as("ha")), "ha")
      .join(hashes.select(col("img_id").as("img_b"), col("phash").as("hb")),
        col("key") === col("hb") && col("img_a") < col("img_b"))
      .select(col("img_a"), col("img_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= Mm06MaxHamming)
      .orderBy("img_a", "img_b")
  }

  /** mm07's hamming radius: the wider near-dup band (recompressed /
    * lightly edited images), past what delta-neighborhood indexing can
    * reach (radius 2 on 64 bits already needs ~2k flips per image;
    * radius 4 would need ~679k).
    */
  val Mm07MaxHamming = 4

  /** Pigeonhole blocking for mm07 over the staged corpus' 8-bit
    * barcode hashes: 8 single-bit blocks, every 4-combination as a key
    * (C(8,4) = 70 keys/image) — keyBlocks = blocks − radius, so any
    * pair within hamming ≤ 4 shares at least one full key. On REAL
    * photo corpora the hash is 64-bit ([[MultimodalStub.aHash64]]'s
    * 8×8 grid) and the setting is `SimhashBlocking(8, 4)` — 70 keys of
    * 32 bits, the same candidate equi-join shape with a 2³² birthday
    * denominator.
    */
  val Mm07Blocking: Dedup.SimhashBlocking =
    Dedup.SimhashBlocking(MultimodalStub.BarcodeBits, 4,
      bits = MultimodalStub.BarcodeBits, radius = Mm07MaxHamming)

  /** mm07: image near-dup at hamming ≤ [[Mm07MaxHamming]] — mm06's
    * wider-band sibling. The delta-neighborhood trick that makes mm06
    * exact-and-linear at radius 1 explodes combinatorially with the
    * radius, so mm07 reuses dedup04's pigeonhole machinery
    * ([[Dedup.SimhashBlocking]], generalized over hash width and
    * radius): the fingerprint splits into blocks and every
    * (blocks − radius)-combination of them becomes an equi-join key —
    * a pair within the radius differs in at most `radius` blocks, so
    * at least one enumerated combination survives intact on both
    * sides. Candidates stay an equi-join (C(blocks, keyBlocks) key
    * rows per image, a constant), the exact hamming filter runs on the
    * candidates only, and recall is 100% by the pigeonhole argument —
    * the same guarantee dedup04 carries, now over decoded image
    * fingerprints.
    *
    * The oracle replays the full encode → land → binaryFile scan →
    * ImageIO decode → threshold → blocked join loop in DuckDB bit math
    * via the barcode law (hash == id % 256), exhaustively over all
    * pairs — so a recall miss in the blocking (not just a hash error)
    * breaks the match.
    */
  def mm07PhashBlocked(spark: SparkSession, dir: String): DataFrame =
    phashBlockedPairs(corpusImageHashes(spark, dir), Mm07Blocking)
      .filter(col("hamming") <= Mm07MaxHamming)
      .orderBy("img_a", "img_b")

  /** mm08's frame grid: videos × frames staged as one PNG per frame.
    * Constant across scale factors (like [[Mm05Images]]); the scene
    * law constants are SHARED with the generated oracle in
    * [[graft.SparkEntry]] (the etl27 discipline).
    */
  val Mm08Videos = 16
  val Mm08Frames = 32
  /** Frames per scene; scene s of video v carries base fingerprint
    * `(v·Mm08VideoStep + s·Mm08SceneStep) mod 256`.
    */
  val Mm08SceneLen = 8
  val Mm08VideoStep = 37L
  val Mm08SceneStep = 11L
  /** Within-scene positions whose frame jitters ONE bit off the scene
    * base (compression noise / motion — the hamming-1 neighborhood a
    * keyframe detector must NOT fire on).
    */
  val Mm08Jitter: Set[Long] = Set(3L, 6L)

  /** The analytic fingerprint law of frame (v, f) — what the decoded
    * hash must equal (the barcode law), replayed by oracle and spec.
    */
  private[graft] def mm08FrameHash(v: Long, f: Long): Long = {
    val base = (v * Mm08VideoStep + (f / Mm08SceneLen) * Mm08SceneStep) % 256
    if (Mm08Jitter.contains(f % Mm08SceneLen)) base ^ (1L << (f % Mm08SceneLen))
    else base
  }

  /** mm08: VIDEO KEYFRAME extraction via temporal perceptual-hash
    * deltas — the video member of the dedup/curation family: a frame
    * stream is massively redundant (a 2-hour video is ~200k frames of
    * mostly-identical content), so multimodal training pipelines keep
    * only frames that DIFFER from their predecessor beyond the
    * perceptual-noise band. Real leg end-to-end: one encoded PNG per
    * (video, frame) staged once ([[mm08FrameFiles]]), read through
    * `binaryFile`, decoded + fingerprinted on executors (the
    * mm05/mm06 ImageIO path), then ONE per-video window pass
    * (`lag(phash)` over frame order) flags frames at hamming >
    * [[Mm06MaxHamming]] from their predecessor — scene cuts survive,
    * within-scene jitter is suppressed. Per-video windows scale: the
    * partition key IS the video, so a 100 TB frame lake sorts frames
    * only within each video, never globally, and the decode runs once
    * per frame on executors.
    *
    * The oracle replays the ENTIRE pipeline analytically: the staged
    * frames are barcodes of [[mm08FrameHash]]'s scene law, so DuckDB
    * regenerates the law on a pure `range()` grid and re-runs the
    * lag/hamming reduction in bit math — a wrong pixel, hash, frame
    * ordering, or threshold anywhere breaks the row set.
    */
  def mm08VideoKeyframes(spark: SparkSession, dir: String): DataFrame = {
    val hashed = perceptualHashes(mm08FrameFiles(spark, dir))
      .select((col("img_id") / 1000L).cast("long").as("video_id"),
        (col("img_id") % 1000L).as("frame_idx"), col("phash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("video_id").orderBy("frame_idx")
    hashed
      .withColumn("prev", lag("phash", 1).over(w))
      .withColumn("hamming_prev",
        when(col("prev").isNull, lit(-1L))
          .otherwise(bit_count(col("phash").bitwiseXOR(col("prev"))).cast("long")))
      .filter(col("prev").isNull || col("hamming_prev") > Mm06MaxHamming)
      .select("video_id", "frame_idx", "hamming_prev")
      .orderBy("video_id", "frame_idx")
  }

  /** The staged mm08 frame landing dir as (img_id = video·1000 + frame,
    * media) — barcode PNGs of the scene law, one file per frame, built
    * once (content is a pure function of the grid, so the stamp is the
    * law version, not a source fingerprint).
    */
  private[graft] def mm08FrameFiles(spark: SparkSession, dir: String): DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_mm08_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // The stamp folds EVERY scene-law constant (the GrowthProbe
    // SynthGenVersion lesson: a constant missing from the stamp means
    // editing it silently re-measures files staged under the OLD law),
    // and the rebuild clears the dir first — a shrunk grid must not
    // leave old-law PNGs behind for the glob to sweep up.
    TableBuild.ensurePath(spark, root,
        s"mm08:v1:$Mm08Videos:$Mm08Frames:$Mm08SceneLen:$Mm08VideoStep:" +
          s"$Mm08SceneStep:${Mm08Jitter.toSeq.sorted.mkString(",")}") {
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val rootFs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (rootFs.exists(rootPath)) rootFs.delete(rootPath, true)
      rootFs.mkdirs(rootPath)
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.range(Mm08Videos.toLong * Mm08Frames)
        .foreachPartition { (rows: Iterator[java.lang.Long]) =>
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(conf.value)
          rows.foreach { boxed =>
            val i = boxed.longValue()
            val (v, f) = (i / Mm08Frames, i % Mm08Frames)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(root, s"v${v}_f$f.png"), true)
            try out.write(MultimodalStub.barcodePng(mm08FrameHash(v, f)))
            finally out.close()
          }
        }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(root)
      .select(
        (regexp_extract(col("path"), "v(\\d+)_f(\\d+)\\.png$", 1).cast("long") * 1000L +
          regexp_extract(col("path"), "v(\\d+)_f(\\d+)\\.png$", 2).cast("long"))
          .as("img_id"),
        col("content").as("media"))
  }

  /** Distinct candidate pairs (img_a < img_b, hamming) under `cfg` —
    * [[Dedup.pigeonholeCandidatePairs]] (the ONE pigeonhole candidate
    * join, shared with dedup04) over the image fingerprint frame.
    */
  private[graft] def phashBlockedPairs(
      hashes: DataFrame, cfg: Dedup.SimhashBlocking): DataFrame =
    Dedup.pigeonholeCandidatePairs(
      hashes, "img_id", "phash", cfg, "img_a", "img_b")

  /** The corpus image-fingerprint frame behind mm06 and the stream12
    * ingest gate: the staged PNG landing dir (built once per source
    * fingerprint) read back through `binaryFile` and hashed with the
    * REAL executor-side decode. Pinned via [[graft.GraftCache]] — the
    * frame is 16 bytes/image and both within-batch dedup and every
    * streaming micro-batch probe it, so the decode pass runs once per
    * (session, dir).
    */
  private[graft] def corpusImageHashes(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"mm06.hashes:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_mm06_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      TableBuild.ensurePath(spark, root,
          TableBuild.dirFingerprint(spark, s"$dir/documents.parquet")) {
        val conf = new org.apache.spark.util.SerializableConfiguration(
          spark.sparkContext.hadoopConfiguration)
        documents(spark, dir)
          .select(col("doc_id")).filter(col("doc_id") < Mm05Images)
          .foreachPartition { (rows: Iterator[Row]) =>
            val fs = new org.apache.hadoop.fs.Path(root)
              .getFileSystem(conf.value)
            rows.foreach { r =>
              val id = r.getLong(0)
              val out = fs.create(
                new org.apache.hadoop.fs.Path(root, s"img_$id.png"), true)
              try out.write(MultimodalStub.barcodePng(id)) finally out.close()
            }
          }
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
      }
      val files = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load(root)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
            .cast("long").as("img_id"),
          col("content").as("media"))
      perceptualHashes(files)
    }

  /** Number of synthetic audio clips mm10 stages — constant across
    * scale factors (doc_id < 256 exists at every SF, the mm05 contract).
    */
  val Mm10Clips = 256
  /** mm10's PCM format: mono 16-bit at this sample rate. */
  val Mm10Rate = 8000
  /** Test-tone law (shared with the generated oracle — the etl27
    * discipline): clip `id` holds [[mm10Samples]] samples alternating
    * +A, −A with A = [[mm10Amp]] — a full-swing square wave at the
    * Nyquist rate. Every decoded feature is then an EXACT integer
    * function of the id: peak = RMS = A (equal counts of ±A), the
    * position-weighted checksum Σ s_t·(t+1) telescopes to −A·N/2
    * (consecutive pairs cancel to −A), and every adjacent pair flips
    * sign (N−1 zero crossings) — so the DuckDB oracle checks the
    * ENTIRE encode → land → binaryFile scan → javax.sound decode →
    * per-sample featurize chain with plain arithmetic on `documents`.
    */
  val Mm10BaseSamples = 800
  val Mm10SampleStep = 160
  val Mm10SampleMod = 7
  val Mm10AmpStep = 250
  val Mm10AmpMod = 120
  private[graft] def mm10Samples(id: Long): Int =
    Mm10BaseSamples + (id % Mm10SampleMod).toInt * Mm10SampleStep
  private[graft] def mm10Amp(id: Long): Int =
    ((id % Mm10AmpMod).toInt + 1) * Mm10AmpStep

  /** mm10: binary-file AUDIO ingestion + real decode, end-to-end — the
    * third modality (mm05 closed images, mm08 video): a landing
    * directory of REAL WAV files (one per doc_id < [[Mm10Clips]],
    * samples a pure function of the id — [[MultimodalStub.testToneWav]])
    * is staged once per source fingerprint (the mm05 discipline; the
    * ENCODE runs distributed via foreachPartition), read back through
    * `binaryFile`, and decoded on executors by the real
    * `javax.sound.sampled` path ([[audioMeta]] — in-JDK, no external
    * jar: the ImageIO precedent exactly). Output per clip: the typed
    * metadata + signal features an audio curation pipeline gates on
    * (duration, peak, RMS, zero-crossing count) plus a
    * position-weighted checksum that proves SAMPLE-EXACT decode (a
    * wrong byte order, dropped frame, or sign error anywhere moves it).
    *
    * At scale this is the audio-lake shape: opaque files land, a
    * partitioned binary scan + executor-side codec turns them into
    * typed columns; a real featurizer (mel spectrogram, embedding
    * model) swaps in behind the same schema, batch shape, and
    * partitioning.
    */
  def mm10AudioIngest(spark: SparkSession, dir: String): DataFrame =
    audioMeta(mm10Files(spark, dir))

  /** The mm10 landing directory as a (clip_id, media) frame: real WAV
    * files staged once per source fingerprint, read back through the
    * `binaryFile` source (mm05Files' shape for audio).
    */
  private[graft] def mm10Files(spark: SparkSession, dir: String): DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_mm10_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    TableBuild.ensurePath(spark, root,
        TableBuild.dirFingerprint(spark, s"$dir/documents.parquet")) {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      documents(spark, dir)
        .select(col("doc_id")).filter(col("doc_id") < Mm10Clips)
        .foreachPartition { (rows: Iterator[Row]) =>
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(conf.value)
          rows.foreach { r =>
            val id = r.getLong(0)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(root, s"clip_$id.wav"), true)
            try out.write(MultimodalStub.testToneWav(
              mm10Samples(id), mm10Amp(id), Mm10Rate)) finally out.close()
          }
        }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav").load(root)
      .select(
        regexp_extract(col("path"), "clip_(\\d+)\\.wav$", 1)
          .cast("long").as("clip_id"),
        col("content").as("media"))
  }

  private val audioMetaSchema = StructType(Seq(
    StructField("clip_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("peak", LongType),
    StructField("rms", DoubleType),
    StructField("checksum", LongType),
    StructField("zero_crossings", LongType)))

  /** REAL audio-decode leg: rows of (clip_id, media) holding ENCODED
    * WAV bytes flow through the same batched mapPartitions path as the
    * image kernels, decoded by [[MultimodalStub.decodeWav]] (the JDK's
    * `javax.sound.sampled` — runs on executors as-is) and reduced to
    * per-clip signal features. All integer except the 4-dp RMS (whose
    * sum-of-squares intermediate is exact in Long). Same seam contract
    * as [[decodeMeta]]: a DSP/embedding featurizer swaps in behind an
    * unchanged schema, batch shape, and partitioning.
    */
  def audioMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioMetaSchema)
    media.select(col("clip_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val (rate, s) = MultimodalStub.decodeWav(r.getAs[Array[Byte]]("media"))
          val n = s.length
          var peak = 0L
          var sumSq = 0L
          var checksum = 0L
          var zc = 0L
          var t = 0
          while (t < n) {
            val v = s(t).toLong
            if (math.abs(v) > peak) peak = math.abs(v)
            sumSq += v * v
            checksum += v * (t + 1)
            if (t > 0 && (v ^ s(t - 1).toLong) < 0 && v != 0 && s(t - 1) != 0)
              zc += 1
            t += 1
          }
          val rms =
            if (n == 0) 0.0
            else math.round(math.sqrt(sumSq.toDouble / n) * 10000.0) / 10000.0
          Row(r.getAs[Long]("clip_id"), rate, n.toLong,
            n.toLong * 1000L / rate, peak, rms, checksum, zc)
        }
      }
    }(enc).orderBy("clip_id")
  }

  /** Samples per analysis window for mm11 — 32 ms at [[Mm10Rate]], the
    * frame grain a VAD / segmentation / diarization pass works at. The
    * staged clips span 800–1,760 samples, so every clip yields several
    * full windows plus a genuine remainder window at most sizes (the
    * boundary math is exercised, not decorative).
    */
  val Mm10WindowSamples = 256

  /** mm11: frame-WINDOWED audio decode + per-window signal profile —
    * the long-form answer to mm10's whole-clip decode (round-15
    * directive): mm10's `decodeWav` materializes every sample of a
    * clip before featurizing (fine for test tones; an hour of 16 kHz
    * mono is ~115 MB per clip — the shape an audio lake actually
    * holds), while this path streams [[Mm10WindowSamples]]-sample
    * windows off the codec ([[MultimodalStub.decodeWavWindowed]] —
    * decode memory bounded at window size however long the clip runs)
    * and emits the per-window profile a segmentation/VAD pipeline
    * gates on: sample count, RMS, position-weighted checksum (global
    * positions — proving the windows tile the stream exactly), and
    * within-window zero crossings.
    *
    * Same seam contract as [[audioMeta]]: batched mapPartitions over
    * binary rows, explicit schema, executor-side decode — a mel/
    * embedding featurizer swaps in per window behind an unchanged
    * shape. (The `binaryFile` source still hands each file's bytes as
    * one column value — the demo-source surface; at lake scale the
    * same windowed decoder consumes a streamed/chunked source behind
    * this identical seam, which is exactly what windowing buys.)
    *
    * The tone law oracles every window EXACTLY: within any window of
    * the ±A Nyquist square wave, RMS = A (every |sample| = A); window
    * starts are even global positions and window lengths even, so the
    * position-weighted checksum telescopes to −A·L/2 per window; signs
    * alternate every sample, so zero crossings = L−1. The DuckDB twin
    * is pure arithmetic over `documents` + a window generate.
    */
  def mm11AudioWindows(spark: SparkSession, dir: String): DataFrame =
    audioWindowMeta(mm10Files(spark, dir), Mm10WindowSamples)

  private val audioWindowSchema = StructType(Seq(
    StructField("clip_id", LongType),
    StructField("window_idx", IntegerType),
    StructField("n_samples", LongType),
    StructField("rms", DoubleType),
    StructField("checksum", LongType),
    StructField("zero_crossings", LongType)))

  /** Per-window featurize over any (clip_id, media) frame — separable
    * so the spec can drive synthetic long clips through the windowed
    * seam directly.
    */
  private[graft] def audioWindowMeta(
      media: DataFrame, windowSamples: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioWindowSchema)
    media.select(col("clip_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getAs[Long]("clip_id")
          val (_, wins) = MultimodalStub.decodeWavWindowed(
            r.getAs[Array[Byte]]("media"), windowSamples)
          // A decodable clip with ZERO samples has no windows — emit a
          // sentinel zero-row so the clip stays visible in the corpus
          // (mm10's whole-clip row reports n_samples=0 for the same
          // clip; a windowed view that silently dropped it would let
          // empty media rot out of the audit). Undecodable media still
          // throws — etl20's quarantine composes in front.
          val winsOr =
            if (wins.hasNext) wins else Iterator(Array.empty[Int])
          winsOr.zipWithIndex.map { case (s, wi) =>
            val base = wi.toLong * windowSamples
            val n = s.length
            var sumSq = 0L
            var checksum = 0L
            var zc = 0L
            var t = 0
            while (t < n) {
              val v = s(t).toLong
              sumSq += v * v
              checksum += v * (base + t + 1)
              if (t > 0 && (v ^ s(t - 1).toLong) < 0 && v != 0 && s(t - 1) != 0)
                zc += 1
              t += 1
            }
            val rms =
              if (n == 0) 0.0
              else math.round(math.sqrt(sumSq.toDouble / n) * 10000.0) / 10000.0
            Row(id, wi, n.toLong, rms, checksum, zc)
          }
        }
      }
    }(enc).orderBy("clip_id", "window_idx")
  }

  /** mm12: windowed SPECTRAL audio featurizer — the frequency-domain
    * completion of the audio story (round-19 directive #3): mm10/mm11
    * ship REAL decode but only amplitude-domain features (RMS,
    * crossings, checksum), while every serious audio pipeline (VAD,
    * language-ID, mel-spectrogram features for an audio encoder) works
    * from per-window SPECTRA. Behind mm11's exact seam
    * ([[MultimodalStub.decodeWavWindowed]] — bounded decode, never the
    * whole clip) each window runs a REAL one-sided DFT
    * ([[MultimodalStub.dftMagnitudes]]) and emits the spectral profile
    * a gating pass reads: the dominant bin and its magnitude, the DC
    * magnitude, and the loudest non-peak bin (the spectral-purity
    * signal).
    *
    * The Nyquist square-wave tone law makes every value ANALYTIC, so
    * this entry is ORACLED like mm09, not spec-only: a window of
    * length L (even by construction) of the ±A alternating wave is
    * A·(−1)^t = A·e^{iπt}, whose L-point DFT is a single spike —
    * |X(L/2)| = A·L, every other bin EXACTLY zero (the geometric sum
    * cancels), and DC = 0 (equal ± counts). So peak_bin = L/2,
    * peak_mag = A·L, dc_mag = 0, sideband_mag = 0, each an integer
    * function of the id — a mis-tiled window, an off-by-one in the
    * twiddle, or a dropped sample moves the spike or leaks sideband
    * mass. The window-tiling law (Σ per-window peak_mag = A·N = the
    * whole-clip spike) is spec-pinned through the same kernel.
    */
  def mm12AudioSpectral(spark: SparkSession, dir: String): DataFrame =
    audioSpectralMeta(mm10Files(spark, dir), Mm10WindowSamples)

  private val audioSpectralSchema = StructType(Seq(
    StructField("clip_id", LongType),
    StructField("window_idx", IntegerType),
    StructField("n_samples", LongType),
    StructField("peak_bin", IntegerType),
    StructField("peak_mag", DoubleType),
    StructField("dc_mag", DoubleType),
    StructField("sideband_mag", DoubleType)))

  /** Per-window spectral profile over any (clip_id, media) frame —
    * [[audioWindowMeta]]'s seam contract verbatim (batched
    * mapPartitions, explicit schema, executor-side decode + DFT;
    * zero-sample clips emit the sentinel zero-row with peak_bin = −1).
    * Magnitudes round to the 4-dp grid (mm11's rms discipline) so the
    * analytic tone values compare exactly across engines.
    */
  private[graft] def audioSpectralMeta(
      media: DataFrame, windowSamples: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioSpectralSchema)
    media.select(col("clip_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getAs[Long]("clip_id")
          val (_, wins) = MultimodalStub.decodeWavWindowed(
            r.getAs[Array[Byte]]("media"), windowSamples)
          val winsOr =
            if (wins.hasNext) wins else Iterator(Array.empty[Int])
          winsOr.zipWithIndex.map { case (s, wi) =>
            val mags = MultimodalStub.dftMagnitudes(s)
            def r4(x: Double) = math.round(x * 10000.0) / 10000.0
            if (mags.isEmpty) Row(id, wi, 0L, -1, 0.0, 0.0, 0.0)
            else {
              var pk = 0
              var i = 1
              while (i < mags.length) {
                if (mags(i) > mags(pk)) pk = i
                i += 1
              }
              var side = 0.0
              i = 0
              while (i < mags.length) {
                if (i != pk && mags(i) > side) side = mags(i)
                i += 1
              }
              Row(id, wi, s.length.toLong, pk, r4(mags(pk)),
                r4(mags(0)), r4(side))
            }
          }
        }
      }
    }(enc).orderBy("clip_id", "window_idx")
  }

  /** Delta-neighborhood candidate keys over a hash column: each row
    * explodes into its hash plus all single-bit flips (bits+1 keys, a
    * constant), so an equi-join of `key` against raw hashes finds
    * EXACTLY the hamming ≤ 1 pairs — linear in the corpus, no verify
    * miss. Shared by mm06's within-corpus dedup and stream12's
    * arrival-vs-corpus gate.
    */
  private[graft] def neighborhoodProbes(
      hashed: DataFrame, hashCol: String): DataFrame = {
    val flips = (0 until MultimodalStub.BarcodeBits)
      .map(b => col(hashCol).bitwiseXOR(lit(1L << b)))
    hashed.withColumn("key", explode(array((col(hashCol) +: flips): _*)))
  }

  private val phashSchema = StructType(Seq(
    StructField("img_id", LongType),
    StructField("phash", LongType)))

  /** Decode + binarize to a 64-bit fingerprint
    * ([[MultimodalStub.aHash64]]), over the same batched mapPartitions
    * path as [[decodeMeta]]. Runs the REAL ImageIO decode on executors.
    */
  private[graft] def perceptualHashes(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(phashSchema)
    media.select(col("img_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, rgb) = MultimodalStub.decodeImage(r.getAs[Array[Byte]]("media"))
          Row(r.getAs[Long]("img_id"), MultimodalStub.aHash64(w, h, rgb))
        }
      }
    }(enc)
  }

  private val resizeMetaSchema = StructType(Seq(
    StructField("img_id", LongType),
    StructField("in_w", IntegerType),
    StructField("in_h", IntegerType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("n_bytes_out", IntegerType),
    StructField("checksum", LongType),
    StructField("mean_intensity", DoubleType)))

  /** REAL resize leg of the mm04 plumbing: rows of (img_id, media)
    * holding ENCODED images flow through the same batched mapPartitions
    * path as the fake kernel, but the kernel is
    * [[MultimodalStub.resizeImage]] — headless `java.awt` Graphics2D
    * bilinear rescaling to OutW×OutH on executors — and the emitted
    * checksum/mean are computed over the RESIZED pixels. Same seam
    * contract as [[decodeMeta]]: a GPU/codec resize swaps in behind an
    * unchanged schema, batch shape, and partitioning.
    */
  def resizeMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizeMetaSchema)
    media.select(col("img_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val (inW, inH, out) = MultimodalStub.resizeImage(
            r.getAs[Array[Byte]]("media"), MultimodalStub.OutW, MultimodalStub.OutH)
          var sum = 0L
          var i = 0
          while (i < out.length) { sum += out(i) & 0xFF; i += 1 }
          Row(r.getAs[Long]("img_id"), inW, inH,
            MultimodalStub.OutW, MultimodalStub.OutH, out.length, sum,
            math.round(sum / 255.0 / out.length * 10000.0) / 10000.0)
        }
      }
    }(enc).orderBy("img_id")
  }

  private val featureMetaSchema = StructType(
    StructField("img_id", LongType) +:
      StructField("n_px", IntegerType) +:
      (0 until MultimodalStub.FeatureDim).map(i =>
        StructField(s"f$i", DoubleType)))

  /** REAL featurizer leg of the mm03 plumbing: rows of (img_id, media)
    * holding ENCODED images flow through the same batched mapPartitions
    * path as the fake kernel, but the kernel decodes with ImageIO and
    * emits [[MultimodalStub.realFeatures]]'s per-channel statistics.
    * Same seam contract as [[decodeMeta]]/[[resizeMeta]]: an embedding
    * model swaps in behind an unchanged schema, batch shape, and
    * partitioning.
    */
  def featureMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureMetaSchema)
    media.select(col("img_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, rgb) = MultimodalStub.decodeImage(r.getAs[Array[Byte]]("media"))
          Row.fromSeq(r.getAs[Long]("img_id") +: (w * h) +:
            MultimodalStub.realFeatures(w, h, rgb).toSeq)
        }
      }
    }(enc).orderBy("img_id")
  }

  private val decodeMetaSchema = StructType(Seq(
    StructField("img_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** REAL decode leg of the mm03/mm04 plumbing: rows of (img_id LONG,
    * media BINARY) holding ENCODED images (PNG in the specs) flow
    * through the same batched mapPartitions path as the fake kernels,
    * but the kernel is [[MultimodalStub.decodeImage]] — actual
    * `javax.imageio` decoding on executors — emitting typed dimensions
    * and per-channel means. This is the shape a production featurizer
    * keeps: swap the body for a GPU embedding model and nothing about
    * the schema, batching, or partitioning moves. Not a `queries` entry
    * (the driver tables carry no encoded media; the oracled entries
    * stay the SQL-replayable fakes) — MultimodalSpec drives it
    * end-to-end over PNGs generated by ImageIO itself.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodeMetaSchema)
    media.select(col("img_id"), col("media")).mapPartitions { rows =>
      rows.grouped(MultimodalStub.BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, rgb) = MultimodalStub.decodeImage(r.getAs[Array[Byte]]("media"))
          val sums = new Array[Long](3)
          var i = 0
          while (i < rgb.length) {
            sums(i % 3) += rgb(i) & 0xFF
            i += 1
          }
          val n = (w * h).toDouble
          def mean(c: Int): Double = math.round(sums(c) / n * 10000.0) / 10000.0
          Row(r.getAs[Long]("img_id"), w, h, mean(0), mean(1), mean(2))
        }
      }
    }(enc).orderBy("img_id")
  }
}

/** Decode kernels — the seam where heavier codecs plug in. decodeImage
  * is REAL (JDK ImageIO); the fake kernels remain as the
  * SQL-replayable twins the DuckDB oracle can check.
  */
object MultimodalStub {
  val BatchSize = 64
  val FeatureDim = 8
  val OutW = 16
  val OutH = 9

  /** Deterministic 4×2 PNG "test card" for `id`: with c = id mod 249,
    * pixel (x,y) carries (c+x+y, c+1+x+y, c+2+x+y) — every channel
    * value stays < 256 (no wrap), so each channel mean is EXACTLY
    * c + {2,3,4} (mean offset x̄+ȳ = 2) and an oracle can predict the
    * decoded statistics with integer arithmetic. PNG is lossless; the
    * bytes round-trip bit-exactly through [[decodeImage]].
    */
  def testCardPng(id: Long): Array[Byte] = {
    val c = (id % 249).toInt
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y,
        ((c + x + y) << 16) | ((c + 1 + x + y) << 8) | (c + 2 + x + y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Pixels (and hash bits) in an mm06 barcode image: a 4×2 grid, one
    * bit per pixel — the low byte of the id.
    */
  val BarcodeBits = 8

  /** Deterministic 4×2 "barcode" PNG for `id`: pixel j (row-major,
    * j = y·4+x) is WHITE iff bit j of the id is set, else black. The
    * binarized perceptual hash of the DECODED image is therefore
    * exactly `id % 256` — an integer law an SQL oracle can replay —
    * while the Spark side must earn it through the real PNG encode →
    * file → binaryFile scan → ImageIO decode → threshold chain.
    */
  def barcodePng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val v = if (((id >> (y * 4 + x)) & 1L) == 1L) 255 else 0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic WAV test tone: `n` mono 16-bit PCM samples at
    * `rate` Hz alternating +amp, −amp (a full-swing square wave at the
    * Nyquist rate), containerized by the JDK's `javax.sound.sampled`
    * writer — so the bytes carry a REAL RIFF/WAVE header the decode
    * path must actually parse, not a hand-rolled shortcut. PCM is
    * lossless: the samples round-trip bit-exactly through [[decodeWav]]
    * (spec-pinned), which is what lets mm10's oracle predict every
    * decoded feature analytically.
    */
  def testToneWav(n: Int, amp: Int, rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = if (t % 2 == 0) amp else -amp
      pcm(2 * t) = (s & 0xFF).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    finally ais.close()
    out.toByteArray
  }

  /** Decode encoded WAV bytes to (sample rate, 16-bit signed samples)
    * via the JDK's `javax.sound.sampled` — in-JDK like ImageIO, so it
    * runs on executors as-is. Scope: mono 16-bit little-endian signed
    * PCM (the format every speech-corpus WAV carries); anything else
    * throws rather than silently mis-decoding — the decodeImage
    * posture: corrupt or unsupported media must surface (quarantine or
    * fail), never rot the corpus as fake samples.
    */
  /** Open + format-gate the audio stream (mono 16-bit LE signed PCM) —
    * ONE definition of the decode scope shared by the whole-clip and
    * windowed paths, so the two can never accept different formats.
    */
  private def openPcmMono16(
      bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"undecodable media (${bytes.length} bytes): no registered AudioFileReader claims it", e)
      }
    val fmt = ais.getFormat
    try require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian,
      s"unsupported WAV format (want mono 16-bit LE signed PCM): $fmt")
    catch { case t: Throwable => ais.close(); throw t }
    ais
  }

  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    val ais = openPcmMono16(bytes)
    try {
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = (raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xFF)
        i += 1
      }
      (math.round(ais.getFormat.getSampleRate), out)
    } finally ais.close()
  }

  /** Frame-WINDOWED decode: stream `windowSamples`-sample windows off
    * the audio stream WITHOUT materializing the clip — [[decodeWav]]'s
    * `readAllBytes` is the whole-clip ceiling (an hour of 16 kHz mono
    * is ~115 MB of samples per clip; a contact-center or podcast lake
    * holds many such), and this path bounds the decode working set at
    * `windowSamples`×2 bytes however long the clip runs: each `next()`
    * drains exactly one window's bytes from the codec stream. Same
    * format scope and loud-failure posture as [[decodeWav]] (shared
    * [[openPcmMono16]] gate). The final window is the remainder —
    * shorter, never padded (padding would fake signal mass into the
    * last window's features).
    */
  def decodeWavWindowed(bytes: Array[Byte],
      windowSamples: Int): (Int, Iterator[Array[Int]]) = {
    require(windowSamples > 0, s"windowSamples must be positive: $windowSamples")
    val ais = openPcmMono16(bytes)
    val rate = math.round(ais.getFormat.getSampleRate)
    val it = new Iterator[Array[Int]] {
      private val buf = new Array[Byte](windowSamples * 2)
      private var pending: Array[Int] = null
      private var eof = false
      private def fill(): Unit = {
        if (pending != null || eof) return
        var off = 0
        var n = 0
        while (off < buf.length &&
            { n = ais.read(buf, off, buf.length - off); n >= 0 })
          off += n
        if (n < 0) { eof = true; ais.close() }
        if (off > 0) {
          require(off % 2 == 0,
            s"torn 16-bit frame at stream end ($off bytes in window)")
          val m = off / 2
          val w = new Array[Int](m)
          var i = 0
          while (i < m) {
            w(i) = (buf(2 * i + 1).toInt << 8) | (buf(2 * i) & 0xFF)
            i += 1
          }
          pending = w
        }
      }
      def hasNext: Boolean = { fill(); pending != null }
      def next(): Array[Int] = {
        fill()
        if (pending == null) throw new NoSuchElementException("audio stream drained")
        val w = pending; pending = null; w
      }
    }
    (rate, it)
  }

  /** One-sided DFT magnitude spectrum of a real PCM window: |X(k)| for
    * bins k = 0..⌊n/2⌋ (real input — the upper half mirrors), direct
    * O(n²/2) summation. REAL spectral math on executors (the kernel a
    * mel/VAD featurizer starts from), sized for the windowed seam: the
    * window bound is what makes direct DFT affordable (256-sample
    * windows are ~33k multiply-adds each, independent of clip length —
    * the same argument that bounds [[decodeWavWindowed]]'s memory); a
    * production build swaps an FFT behind this exact signature. An
    * empty window has an empty spectrum (the caller's zero-row
    * sentinel arm, mm11's contract).
    */
  def dftMagnitudes(s: Array[Int]): Array[Double] = {
    val n = s.length
    if (n == 0) return Array.empty
    val out = new Array[Double](n / 2 + 1)
    var k = 0
    while (k < out.length) {
      val w = -2.0 * math.Pi * k / n
      var re = 0.0
      var im = 0.0
      var t = 0
      while (t < n) {
        val ang = w * t
        re += s(t) * math.cos(ang)
        im += s(t) * math.sin(ang)
        t += 1
      }
      out(k) = math.sqrt(re * re + im * im)
      k += 1
    }
    out
  }

  /** Decode encoded image bytes (PNG/JPEG/BMP/GIF — whatever the JDK's
    * `javax.imageio` registry handles; PNG is the format the specs
    * exercise end-to-end) to (width, height, row-major RGB pixels,
    * 3 bytes per pixel). No external jar: ImageIO ships with the JDK,
    * so this runs on executors as-is. Undecodable bytes throw
    * IllegalArgumentException — the caller decides whether to
    * quarantine (the etl20 pattern) or fail; silently emitting fake
    * pixels for corrupt media is how a 100 TB corpus rots.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable media (${bytes.length} bytes): no registered ImageReader claims it")
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    // getRGB converts any source color model (palette, gray, ARGB) to
    // default sRGB ints; one bulk call per image, then unpack — no
    // per-pixel JNI round-trips.
    val packed = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < packed.length) {
      val p = packed(i)
      rgb(i * 3) = ((p >> 16) & 0xFF).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xFF).toByte
      rgb(i * 3 + 2) = (p & 0xFF).toByte
      i += 1
    }
    (w, h, rgb)
  }

  /** 64-bit binarized perceptual fingerprint, well-defined for ANY
    * image size. Images of ≤ 64 pixels hash pixel-per-bit (row-major
    * bit j set iff red(j) ≥ 128) — preserving the barcode law
    * `hash == id % 2^pixels` the mm06/mm07 oracles replay in SQL.
    * Larger images hash a nearest-neighbor 8×8 downsample (the classic
    * aHash grid), so a real photo lands on a meaningful 64-bit
    * fingerprint instead of the pre-fix behavior where `1L << j`
    * silently wrapped mod 64 past pixel 63 and aliased unrelated
    * pixels onto the same bit — a hazard on stream12's public ingest
    * gate, which accepts arbitrary decodable media.
    */
  def aHash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
    var hash = 0L
    if (w.toLong * h <= 64) {
      var j = 0
      val n = w * h
      while (j < n) {
        if ((rgb(j * 3) & 0xFF) >= 128) hash |= 1L << j
        j += 1
      }
    } else {
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          // Nearest-neighbor source pixel for grid cell (gx, gy); long
          // math so w*h up to Int.MaxValue pixels cannot overflow.
          val px = (gx.toLong * w / 8).toInt
          val py = (gy.toLong * h / 8).toInt
          if ((rgb((py.toLong * w + px).toInt * 3) & 0xFF) >= 128)
            hash |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
    }
    hash
  }

  /** REAL resize kernel (round-11 directive: decode went real in
    * mm05–07, this closes the last fake kernel): decode the encoded
    * bytes and rescale to outW×outH with headless `java.awt`
    * Graphics2D bilinear interpolation — JDK-only, no external jar, so
    * it runs on executors as-is. Returns (source width, source height,
    * row-major RGB of the RESIZED image, 3 bytes/pixel). Deterministic
    * for a given JDK (the spec pins run-to-run stability and the
    * interpolation-free laws: exact constant-color preservation and
    * exact dims); undecodable bytes throw, like [[decodeImage]].
    */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): (Int, Int, Array[Byte]) = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (src == null)
      throw new IllegalArgumentException(
        s"undecodable media (${bytes.length} bytes): no registered ImageReader claims it")
    val dst = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.setRenderingHint(java.awt.RenderingHints.KEY_RENDERING,
        java.awt.RenderingHints.VALUE_RENDER_QUALITY)
      g.drawImage(src, 0, 0, outW, outH, null)
    } finally g.dispose()
    val packed = dst.getRGB(0, 0, outW, outH, null, 0, outW)
    val rgb = new Array[Byte](outW * outH * 3)
    var i = 0
    while (i < packed.length) {
      val p = packed(i)
      rgb(i * 3) = ((p >> 16) & 0xFF).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xFF).toByte
      rgb(i * 3 + 2) = (p & 0xFF).toByte
      i += 1
    }
    (src.getWidth, src.getHeight, rgb)
  }

  /** REAL featurizer kernel (round-12 directive: the LAST fake kernel —
    * mm04's resize went real in round 12, decode in round 9): per-channel
    * statistics over the ImageIO-DECODED raster, exactly the
    * [[FeatureDim]]-wide vector shape the fake emits. Features:
    * f0–f2 = channel means (R, G, B, 4 dp), f3 = bright-pixel count
    * (red ≥ 128), f4–f7 = red histogram in four 64-wide buckets. Counts
    * are exact integers-as-doubles and the means of integer pixel sums,
    * so for the staged test-card PNGs every feature is an exact integer
    * function of the image id — which is what lets the real kernel be
    * ORACLED, not just spec'd. JDK-only; runs on executors as-is.
    */
  def realFeatures(w: Int, h: Int, rgb: Array[Byte]): Array[Double] = {
    val n = w * h
    val sums = new Array[Long](3)
    var bright = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xFF
      sums(0) += r
      sums(1) += rgb(i * 3 + 1) & 0xFF
      sums(2) += rgb(i * 3 + 2) & 0xFF
      if (r >= 128) bright += 1
      hist(r >> 6) += 1
      i += 1
    }
    def mean(c: Int): Double = math.round(sums(c).toDouble / n * 10000.0) / 10000.0
    Array(mean(0), mean(1), mean(2), bright.toDouble,
      hist(0).toDouble, hist(1).toDouble, hist(2).toDouble, hist(3).toDouble)
  }

  /** Deterministic fake "resize": nearest-neighbor-sample OutW×OutH
    * byte positions (p_j = ⌊j·n/(OutW·OutH)⌋ — the index math of a real
    * NN resize), return (checksum = Σ sampled bytes, mean intensity =
    * checksum/255/samples rounded 4dp — a pure function of the checksum
    * so both engines compute it identically). Empty media → (0, 0.0).
    */
  def fakeResize(bytes: Array[Byte]): (Long, Double) = {
    val samples = OutW * OutH
    val n = bytes.length
    if (n == 0) return (0L, 0.0)
    var sum = 0L
    var j = 0
    while (j < samples) {
      sum += bytes((j.toLong * n / samples).toInt) & 0xFF
      j += 1
    }
    (sum, math.round(sum / 255.0 / samples * 10000.0) / 10000.0)
  }

  /** Deterministic fake FeatureDim-dim feature vector from media bytes
    * (stands in for an embedding model / DSP transform; same shape and
    * scale).
    */
  def fakeFeatures(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0
      i += 1
    }
    out.map(x => math.round(x * 10000.0) / 10000.0)
  }
}
