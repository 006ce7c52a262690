package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off measurement main behind PLANS.md's candidate-growth tables:
  * generates a deterministic ~10× "sf1-equivalent" synthetic
  * documents + embeddings set (50k docs / 20k vectors — one decade past
  * the driver's sf0.1) and measures the candidate/stream sizes of the
  * sub-quadratic dedup/sim claims at BOTH scales, so the 100 TB
  * extrapolations rest on two measured decades instead of one.
  *
  * The synthetic generator mirrors the driver testdata's measured
  * shape (31-word vocabulary, ~30–80 tokens/doc, 20 sources, 5 langs,
  * ~4% injected near-duplicates + a thin exact-dup tail; 64-dim
  * unit-norm near-uniform embeddings, 10 labels) rather than its exact
  * bytes — growth measurement needs distributional similarity, not
  * replay. Counts come from the OPERATORS' own candidate machinery
  * (lshCandidates, simhashCandidateCount, cellJoinStats, ivfProbes) so
  * the probe can never measure a different join than production runs.
  *
  * Usage: `runMain graft.operators.GrowthProbe [baseDir] [synthDir]`
  * (defaults /root/testdata/sf0.1 and /tmp/graft_sf1_synth). Output:
  * one `growth [tag] measure=value` line per measurement.
  */
object GrowthProbe {

  val SynthDocs = 50000
  val SynthVecs = 20000

  /** Third-decade tier (sf10-synth — two decades past the driver's
    * sf0.1): measured via [[measureLinear]] only, because the
    * deliberately-quadratic reference shapes (dedup04 narrow, dedup05's
    * adversarial cell join) would cost ~100× the second decade for a
    * shape already measured twice; the LINEAR claims are the 100 TB
    * path, and three decades of measurement is what they rest on.
    */
  val Synth10Docs = 500000
  val Synth10Vecs = 100000

  /** Version token of the synthetic GENERATOR itself, folded into the
    * build-once stamp (round-11 ADVICE): the staged decade must be
    * invalidated when the generator's code changes, not only when the
    * base corpus does — otherwise editing synthText/synthVec and
    * re-running the probe silently measures a set built by the OLD
    * generator. Bump on any change to synthText/synthVec/synthPhash,
    * SynthDocs/SynthVecs, Langs, or the dup-injection constants.
    * v2: synthText re-draws a substitution that landed on the original
    * token (the zero-edit "near-dup" fix). v3: the re-draw guards
    * against the BASE token of the position, not the current one —
    * with two edits the second draw could restore the first edit's
    * position and produce a net zero-edit copy after all.
    */
  val SynthGenVersion = 3

  private[graft] case class SynthDoc(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  private[graft] case class SynthVec(
      vec_id: Long, embedding: Array[Float], label: Int)

  private def rngFor(id: Long, salt: Long) =
    new scala.util.Random(id * 2654435761L + salt)

  private[graft] def docTokens(id: Long, vocab: Array[String]): Array[String] = {
    val rnd = rngFor(id, 42L)
    Array.fill(30 + rnd.nextInt(50))(vocab(rnd.nextInt(vocab.length)))
  }

  /** Deterministic text for doc `id`: most docs are fresh draws; ids
    * ending 96–99 per hundred are near-copies of one of their block's
    * first four docs with 1–2 token substitutions (the near-dup mass
    * dedup03/04 exist to find); every 625th doc is an exact copy.
    */
  private[graft] def synthText(id: Long, vocab: Array[String]): String = {
    if (id >= 625 && id % 625 == 624) synthText(id - 624, vocab)
    else if (id % 100 >= 96 && id >= 100) {
      val base = id - (id % 100) + (id % 4)
      val baseToks = docTokens(base, vocab)
      val toks = baseToks.clone()
      val rnd = rngFor(id, 7L)
      (0 until (1 + (id % 2)).toInt).foreach { _ =>
        val pos = rnd.nextInt(toks.length)
        // Re-draw while the replacement equals the BASE token of the
        // position (round-11 ADVICE + review refinement: guarding only
        // against the CURRENT token let a second edit on the same
        // position restore the original and make a net zero-edit
        // copy); every touched position therefore differs from the
        // base, so the text can never equal it. Bounded so a
        // pathological vocab cannot loop forever.
        var repl = vocab(rnd.nextInt(vocab.length))
        var tries = 0
        while (repl == baseToks(pos) && tries < 16) {
          repl = vocab(rnd.nextInt(vocab.length))
          tries += 1
        }
        toks(pos) = repl
      }
      toks.mkString(" ")
    } else docTokens(id, vocab).mkString(" ")
  }

  private[graft] def synthVec(id: Long): Array[Float] = {
    val rnd = rngFor(id, 1337L)
    val v = Array.fill(64)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  private val Langs = Array("en", "de", "fr", "es", "it")

  /** Deterministic 64-bit "photo hash" for image id — the synthetic
    * fingerprint behind mm07's photo-scale growth row: most ids draw a
    * uniform 64-bit hash (aHash64's range on real photos); the same
    * near-dup tail as [[synthText]] (ids 96–99 per hundred) flips 1–4
    * bits of a block-base hash (inside mm07's radius — the mass the
    * blocking exists to find), and every 625th id is an exact copy.
    */
  private[graft] def synthPhash(id: Long): Long = {
    if (id >= 625 && id % 625 == 624) synthPhash(id - 624)
    else if (id % 100 >= 96 && id >= 100) {
      val base = synthPhash(id - (id % 100) + (id % 4))
      val rnd = rngFor(id, 99L)
      // 1–4 DISTINCT bit positions: xor of a repeated position would
      // cancel and could land back on the exact base hash.
      val nBits = 1 + rnd.nextInt(4)
      val positions = scala.collection.mutable.LinkedHashSet.empty[Int]
      while (positions.size < nBits) positions += rnd.nextInt(64)
      positions.foldLeft(base)((h, b) => h ^ (1L << b))
    } else rngFor(id, 77L).nextLong()
  }

  /** mm07's 64-bit photo-hash blocking config: 8 blocks of 8 bits,
    * every 4-combination a key — C(8,4) = 70 keys/image, recall-exact
    * at hamming ≤ 4 by the pigeonhole argument.
    */
  private[graft] val PhotoBlocking = Dedup.SimhashBlocking(8, 4, bits = 64, radius = 4)

  /** Build the synthetic set once per BASE-CORPUS fingerprint
    * (TableBuild.ensurePath — the mm05/etl22 build-once discipline):
    * the synthetic vocabulary derives from the base corpus, so a
    * regenerated base must invalidate the staged decade or the probe
    * would silently measure the new sf0.1 column against an old
    * synthetic one. Generation is distributed: each executor derives
    * its rows from the id alone.
    */
  def buildSynth(spark: SparkSession, baseDir: String, synthDir: String,
      nDocs: Long = SynthDocs.toLong, nVecs: Long = SynthVecs.toLong): Unit = {
    import spark.implicits._
    TableBuild.ensurePath(spark, synthDir,
        s"${TableBuild.dirFingerprint(spark, s"$baseDir/documents.parquet")}:gen$SynthGenVersion:$nDocs:$nVecs") {
      val vocab = Tables.documents(spark, baseDir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct()
        .collect().map(_.getString(0)).sorted
      val vocabB = spark.sparkContext.broadcast(vocab)
      spark.range(nDocs).as[Long]
        .map { id =>
          val text = synthText(id, vocabB.value)
          SynthDoc(id, text, Langs((id % 5).toInt), s"src${id % 20}",
            text.length.toLong)
        }
        .write.mode("overwrite").parquet(s"$synthDir/documents.parquet")
      spark.range(nVecs).as[Long]
        .map(id => SynthVec(id, synthVec(id), (id % 10).toInt))
        .write.mode("overwrite").parquet(s"$synthDir/embeddings.parquet")
      // The root dir is committed manually (the table writers mark only
      // their own sub-dirs), so ensurePath's marker contract holds.
      val fs = new org.apache.hadoop.fs.Path(synthDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(synthDir, "_SUCCESS"), true)
        .close()
    }
  }

  def measure(spark: SparkSession, tag: String, dir: String,
      baseDir: String): Unit = {
    def p(k: String, v: Long): Unit = println(s"growth [$tag] $k=$v")
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    p("docs", nDocs)
    p("pair_space", nDocs * (nDocs - 1) / 2)
    p("dedup03_lsh_candidates",
      Dedup.lshCandidates(
        Dedup.minhashSignatures(Dedup.shingleArrays(spark, dir))).count())
    p("dedup04_narrow_4_1",
      Dedup.simhashCandidateCount(spark, dir, Dedup.SimhashBlocking(4, 1)))
    p("dedup04_wide_8_5",
      Dedup.simhashCandidateCount(spark, dir, Dedup.SimhashBlocking(8, 5)))
    val spans = Dedup.spanHashRows(docs)
    p("dedup08_spans", spans.count())
    p("dedup08_crossdoc_dup_spans", spans.groupBy("h")
      .agg(countDistinct("doc_id").as("df")).filter(col("df") > 1).count())
    import graft.functions.GraftFunctions.tokens
    p("dedup10_window_rows", docs
      .select(greatest(lit(0),
        size(tokens(col("text"))) - lit(Dedup.SubstringWindow - 1)).as("w"))
      .agg(sum("w")).head.getLong(0))
    p("dedup10_spans_reported", Dedup.dedup10SubstringSpans(spark, dir).count())
    cur16Counts(p, docs, tag)
    etl28Counts(spark, p, dir, baseDir)
    text20Counts(p, docs)

    // mm07 photo-scale blocking (round-11 directive item 6): one
    // synthetic 64-bit photo hash per document id (near-dup tail inside
    // the radius, exact-copy tail — synthText's shape), candidates
    // counted through the SAME pigeonhole join mm07/dedup04 run in
    // production, at the (8,4) 64-bit config real photo corpora use.
    {
      import spark.implicits._
      val hashes = spark.range(nDocs).as[Long]
        .map(id => (id, synthPhash(id))).toDF("img_id", "phash")
      p("mm07_blocked_candidates",
        Dedup.pigeonholeCandidatePairs(
          hashes, "img_id", "phash", PhotoBlocking, "img_a", "img_b").count())
    }

    val nVecs = Tables.embeddings(spark, dir).count()
    p("vectors", nVecs)
    p("vector_pair_space", nVecs * (nVecs - 1) / 2)
    val (admissible, sizes) = Dedup.cellJoinStats(spark, dir)
    p("dedup05_cell_candidates", admissible.map { case (ci, cj) =>
      if (ci == cj) sizes(ci) * (sizes(ci) - 1) / 2 else sizes(ci) * sizes(cj)
    }.sum)
    p("sim07_intracell_pairs", sizes.values.map(s => s * (s - 1) / 2).sum)
    val e = Dedup.vectors(spark, dir)
    val cb = Similarity.trainedCodebook(spark, dir)
    p("sim15_probed_members",
      Similarity.ivfAssigned(e, cb)
        .join(broadcast(Similarity.ivfProbes(e, cb)),
          col("cell") === col("probe_cell"))
        .filter(col("vec_id") =!= col("q_id")).count())
    // sim19's two growth numbers, through the operator's own machinery:
    // the navigable edge frame (local kNN + long-range — linear in the
    // corpus at fixed degree) and the TOTAL candidates the fixed query
    // set actually scores (the visited pool = the search's whole read
    // set — the constant-budget claim made measurable). Second decade
    // only: the graph build rides sim07's fixed-K intra-cell pair
    // space, the shape measureLinear documents as knob-priced.
    p("sim19_graph_edges", Similarity.knnGraphEdges(spark, dir).count())
    p("sim19_scored_candidates",
      Similarity.sim19VisitedPool(spark, dir).count())
    // sim25's two growth numbers (round-20 operator), through its own
    // machinery: the coarse layer's edge frame (linear at fixed degree
    // in the LAYER's size = corpus/8) and the layered search's whole
    // scored pool (coarse routing + base rounds — the smaller-budget
    // claim, constant at any corpus size by sim19's argument, must
    // stay BELOW sim19's pool at every decade).
    p("sim25_coarse_edges",
      Similarity.sim25CoarseEdges(
        Similarity.sim25CoarseNodes(spark, dir)).count())
    p("sim25_scored_candidates",
      Similarity.sim25Pool(spark, dir).count())
    // sim20's whole read set — the SUM of all four trajectories'
    // visited pools, counted through the sweep's own one-loop search:
    // constant at any corpus size by sim19's argument, per config.
    p("sim20_sweep_pool", Similarity.sim20Pools(spark, dir).count())
    // sim21's whole insert read set: the ONE beam search the entire
    // append batch costs (15 arrivals through beamSearchPool — the
    // operator's own machinery). Constant at any corpus size by the
    // same per-query budget argument: that is what makes graph-ANN
    // maintenance streamable (stream24) — insert cost never grows with
    // the index it maintains.
    p("sim21_insert_pool", {
      val queries = e.filter(col("vec_id") < Similarity.NumQueryVectors)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      Similarity.beamSearchPool(
        e.select("vec_id", "v"), Similarity.knnGraphEdges(spark, dir),
        Similarity.driftedAppends(queries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))).count()
    })
    // sim22's whole candidate evidence: the union of three
    // already-built edge frames (build kNN + insert forward +
    // back-edges), through the operator's own machinery — LINEAR in
    // corpus + inserts at fixed degree (compaction never opens a pair
    // space; the bound it RESTORES is exactly this frame's per-node
    // degree).
    p("sim22_candidate_edges",
      Similarity.sim22CandidateEdges(spark, dir).count())
    // sim24's whole candidate evidence: sim22's frame after the
    // DiskANN re-link (live→live kept, live→dead routed through the
    // dead node's live out-edges) — the one extra edge⋈edge equi-join
    // must keep the frame linear at fixed degree (the re-link adds at
    // most degree² rows per dead node, a constant).
    p("sim24_candidate_edges",
      Similarity.sim24CandidateEdges(spark, dir).count())
    // The emit/takedown family (round-16 directive #6): the new
    // heaviest queries are linear by construction — measure it anyway,
    // through the operators' own machinery: manifest mass, shard
    // count, boundary straddles, the bytes ACTUALLY emitted by the
    // payload sink and the repack, and the takedown suffix bill.
    locally {
      import graft.functions.GraftFunctions.intDiv
      val man = Curation.cur18TrainManifest(spark, dir)
      p("cur23_manifest_docs", man.count())
      p("cur23_shards", man.select("source", "shard").distinct().count())
      p("cur23_straddle_docs", man.filter(
        intDiv(col("seq_last"), lit(Curation.Cur20SeqsPerShard)) >
          intDiv(col("seq_first"), lit(Curation.Cur20SeqsPerShard))).count())
      def dirBytes(path: String): Long = GrowthProbe.dirBytes(spark, path)
      Curation.cur23PayloadShards(spark, dir).count()
      p("cur23_emitted_bytes", dirBytes(Curation.cur23OutDir(spark, dir)))
      Curation.cur26RepackExecute(spark, dir).count()
      p("cur26_emitted_bytes", dirBytes(Curation.cur26OutDir(spark, dir)))
      // cur30's doubly-repacked emit (round-19 directive #8): bytes
      // from the files plus the re-tiled sequence count from the
      // operator's own audit — the composed retire must stay linear in
      // SURVIVING mass (cur26's shape minus the span slices).
      p("cur30_repacked_seqs", Curation.cur30ComposedRepack(spark, dir)
        .agg(coalesce(sum("n_seqs"), lit(0L))).head.getLong(0))
      p("cur30_emitted_bytes", dirBytes(Curation.cur30OutDir(spark, dir)))
      // cur31's retained ledger AFTER the vacuum: the whole point is
      // that it is CONSTANT (one empty current version) however many
      // mask rows accumulated — the pre-vacuum mass is cur25+cur28's
      // rows, measured above.
      Curation.cur31MaskVacuum(spark, dir).count()
      p("cur31_retained_ledger_bytes",
        dirBytes(Curation.cur31LedgerDir(dir)))
      p("cur24_dirty_shards", Curation.cur24Takedown(spark, dir)
        // sum over an empty frame is NULL (a fixture where no doc
        // trips the takedown flag must probe as 0, not NPE).
        .agg(coalesce(sum("shards_dirty"), lit(0L))).head.getLong(0))
      p("cur25_mask_rows", Curation.cur25TombstoneMask(spark, dir).count())
      // cur27's whole output — one row per post-takedown sequence,
      // through the operator itself (both emit legs + the masked
      // re-tile run for real at this decade).
      p("cur27_equivalence_rows",
        Curation.cur27MaskEquivalence(spark, dir).count())
      p("cur28_span_mask_rows",
        Curation.cur28SpanRedaction(spark, dir).count())
      // cur29's whole output — one row per post-composed-mask
      // sequence, through the operator itself (the emit leg + the
      // doubly-masked re-tile run for real at this decade).
      p("cur29_composed_rows",
        Curation.cur29ComposedMasks(spark, dir).count())
    }
    // dedup13's signature attach moved to the measured broadcast/
    // shuffle dispatch this round; the superset pair column (the
    // operator's one large intermediate) flows through the SAME
    // sweepSuperset join either way — counted here so the PLANS table
    // is measured through the shipping code path, not remembered.
    p("dedup13_superset_pairs", Dedup.sweepSuperset(spark, dir).count())
    etl32Counts(spark, p, tag, nDocs)
  }

  /** etl32's growth counts (round-19 directive #8): the Z-order
    * two-axis pruning claim at the synthetic decades, through the
    * operator's OWN key arithmetic ([[Etl.zOrderKey]] — the Morton
    * mask ladder with min/max scaling) and the same
    * repartitionByRange + sortWithinPartitions write at the same
    * [[Etl.ZOrderFiles]] knob. The synthetic decades carry no orders
    * table, so `nRows` orders-shaped rows derive (day, custkey)
    * deterministically from the id (etl28's synthetic-column
    * discipline): day uniform over the corpus' 2,557-day span, custkey
    * uniform over nRows/10 customers. Measured: the files a
    * 1/16-selectivity predicate on EACH axis touches (distinct
    * file_name of matching rows — the min/max locality the clustered
    * write buys) and the rows it reads; the claim is that BOTH axes
    * prune to a file SUBSET (~√files, never all 16) at every decade
    * while rows read track selectivity linearly.
    */
  private[graft] def etl32Counts(spark: SparkSession,
      p: (String, Long) => Unit, tag: String, nRows: Long): Unit = {
    import graft.functions.GraftFunctions.tokenHash64
    val days = 2557L
    val ncust = math.max(nRows / 10, 16L)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_growth_etl32_" +
      s"${tag.replaceAll("[^a-zA-Z0-9]", "_")}_$nRows"
    // zv folds the key-arithmetic version (round-20 review: without it
    // a changed zOrderKey would silently serve the stale synthetic
    // layout across JVM runs — the exact hazard etl32's own stamp
    // guards against).
    TableBuild.ensurePath(spark, out,
        s"gen$SynthGenVersion:$nRows:zf=${Etl.ZOrderFiles}:" +
          s"zv=${Etl.ZKeyArithVersion}") {
      spark.range(nRows)
        .select(col("id").as("o_id"),
          pmod(tokenHash64(concat(lit("zd:"), col("id").cast("string"))),
            lit(days)).as("z_days"),
          pmod(tokenHash64(concat(lit("zc:"), col("id").cast("string"))),
            lit(ncust)).as("o_custkey"))
        .withColumn("z_key", Etl.zOrderKey(col("z_days"), 0L, days - 1,
          col("o_custkey"), 0L, ncust - 1))
        .repartitionByRange(Etl.ZOrderFiles, col("z_key"))
        .sortWithinPartitions(col("z_key"))
        .write.mode("overwrite").parquet(out)
    }
    val read = spark.read.parquet(out)
    def filesOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    p("etl32_rows", nRows)
    p("etl32_files_total", filesOf(read))
    p("etl32_files_date_16th", filesOf(read.filter(col("z_days") < days / 16)))
    p("etl32_rows_date_16th", read.filter(col("z_days") < days / 16).count())
    p("etl32_files_cust_16th",
      filesOf(read.filter(col("o_custkey") < ncust / 16)))
    p("etl32_rows_cust_16th",
      read.filter(col("o_custkey") < ncust / 16).count())
  }

  private[graft] def dirBytes(spark: SparkSession, path: String): Long = {
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p0)) 0L
    else {
      val it = fs.listFiles(p0, true)
      var total = 0L
      while (it.hasNext) total += it.next().getLen
      total
    }
  }

  /** The LINEAR-claim subset of [[measure]], for the third decade —
    * the same operator-machinery counts, minus the shapes the first
    * two decades already measured as deliberately quadratic (dedup04
    * narrow/wide at fixed config, dedup05's adversarial near-uniform
    * cell join, sim07's fixed-K intra-cell pairs), which would cost
    * ~100× the second decade to re-confirm a shape the knob — not the
    * join — is documented to fix.
    */
  def measureLinear(spark: SparkSession, tag: String, dir: String,
      baseDir: String): Unit = {
    def p(k: String, v: Long): Unit = println(s"growth [$tag] $k=$v")
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    p("docs", nDocs)
    p("dedup03_lsh_candidates",
      Dedup.lshCandidates(
        Dedup.minhashSignatures(Dedup.shingleArrays(spark, dir))).count())
    val spans = Dedup.spanHashRows(docs)
    p("dedup08_spans", spans.count())
    p("dedup08_crossdoc_dup_spans", spans.groupBy("h")
      .agg(countDistinct("doc_id").as("df")).filter(col("df") > 1).count())
    import graft.functions.GraftFunctions.tokens
    p("dedup10_window_rows", docs
      .select(greatest(lit(0),
        size(tokens(col("text"))) - lit(Dedup.SubstringWindow - 1)).as("w"))
      .agg(sum("w")).head.getLong(0))
    p("dedup10_spans_reported", Dedup.dedup10SubstringSpans(spark, dir).count())
    cur16Counts(p, docs, tag)
    etl28Counts(spark, p, dir, baseDir)
    text20Counts(p, docs)
    locally {
      import spark.implicits._
      val hashes = spark.range(nDocs).as[Long]
        .map(id => (id, synthPhash(id))).toDF("img_id", "phash")
      p("mm07_blocked_candidates",
        Dedup.pigeonholeCandidatePairs(
          hashes, "img_id", "phash", PhotoBlocking, "img_a", "img_b").count())
    }
    val nVecs = Tables.embeddings(spark, dir).count()
    p("vectors", nVecs)
    val e = Dedup.vectors(spark, dir)
    val cb = Similarity.trainedCodebook(spark, dir)
    p("sim15_probed_members",
      Similarity.ivfAssigned(e, cb)
        .join(broadcast(Similarity.ivfProbes(e, cb)),
          col("cell") === col("probe_cell"))
        .filter(col("vec_id") =!= col("q_id")).count())
    // The emit family's THIRD decade (round-19 directive #8): the
    // composed-repack emit and both mask families' row counts run for
    // real at this scale through the operators' own machinery — the
    // retire must stay linear in SURVIVING mass, the masks
    // recall/findings-sized, and the post-vacuum ledger CONSTANT.
    p("cur25_mask_rows", Curation.cur25TombstoneMask(spark, dir).count())
    p("cur28_span_mask_rows", Curation.cur28SpanRedaction(spark, dir).count())
    p("cur30_repacked_seqs", Curation.cur30ComposedRepack(spark, dir)
      .agg(coalesce(sum("n_seqs"), lit(0L))).head.getLong(0))
    p("cur30_emitted_bytes", dirBytes(spark, Curation.cur30OutDir(spark, dir)))
    Curation.cur31MaskVacuum(spark, dir).count()
    p("cur31_retained_ledger_bytes", dirBytes(spark, Curation.cur31LedgerDir(dir)))
    // sim19/sim25 stay second-decade-only: their graph build rides
    // sim07's fixed-K intra-cell pair space — the deliberately-
    // quadratic shape this tier excludes (the knob, not the join,
    // scales it).
    etl32Counts(spark, p, tag, nDocs)
  }

  /** cur16's growth counts, via the operator's own machinery
    * ([[Dedup.strideWindowRows]] + the semi-join/island merge inside
    * [[Dedup.substringContamination]]): the held-out (src0) distinct
    * window-hash set is the semi-join BUILD side (the 100 TB claim:
    * the benchmark split is the small side — here 1/20 of the corpus
    * by source), and the reported spans track the injected cross-split
    * dup mass, not the corpus. The window frame is PINNED through the
    * operator's own cacheKey path (round-13 ADVICE: without it the
    * stride tokenize+hash pass ran twice per probe, unlike the pinned
    * production shape being measured) — the span probe builds the pin,
    * the held-out count's identical derivation reads it back through
    * the CacheManager's plan match, and the key is released after.
    */
  /** text20's two growth numbers, through the operator's own chunk
    * grammar and threshold: the boilerplate hash-set size (the pinned
    * ingest index — bounded by template mass, never the corpus) and
    * the affected-doc count (the scrub's broadcast mark frame).
    */
  private[graft] def text20Counts(
      p: (String, Long) => Unit, docs: DataFrame): Unit = {
    val chunks = Dedup.spanHashRows(docs)
    val boiler = chunks.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= TextAnalysis.BoilerplateMinDocs)
      .select(col("h"))
    p("text20_boiler_hashes", boiler.count())
    p("text20_affected_docs", chunks.join(boiler, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct().count())
  }

  private def cur16Counts(p: (String, Long) => Unit, docs: DataFrame,
      tag: String): Unit = {
    val key = s"growth.cur16:$tag"
    p("cur16_spans_reported",
      Dedup.substringContamination(docs, col("source") === "src0",
        Some(key)).count())
    p("cur16_heldout_hashes",
      Dedup.strideWindowRows(docs, carry = Seq("source"))
        .filter(col("source") === "src0").select("h").distinct().count())
    graft.GraftCache.releaseKey(key)
  }

  /** Deterministic part-name for catalog row `id` — the synthetic law
    * behind etl28's growth decades (round-13 directive: the
    * Heaps-sublinear "names ≪ rows" claim and the largest-block
    * exposure were asserted from 64 names at sf0.1). The name INDEX
    * grows as ⌊√id⌋ — Heaps' law with β = 0.5, the canonical
    * vocabulary-growth exponent — so 50k rows carry ~224 names and
    * 500k carry ~707 (names ≪ rows at every decade, like a real
    * catalog). Each index renders as 2 modifiers + a head noun drawn
    * from a 16-noun pool (the blocking key — blocks grow as V/16);
    * indices ending in 9 are 1-edit variants of their predecessor
    * (append one char to a modifier: same block, inside the distance
    * band — the near-dup mass the levenshtein kernel exists to find).
    */
  private[graft] def synthPartName(id: Long, vocab: Array[String]): String = {
    val nameIdx = math.sqrt(id.toDouble).toLong
    if (nameIdx % 10 == 9) {
      val toks = basePartToks(nameIdx - 1, vocab)
      toks(0) = toks(0) + "x"
      toks.mkString(" ")
    } else basePartToks(nameIdx, vocab).mkString(" ")
  }

  private def basePartToks(nameIdx: Long, vocab: Array[String]): Array[String] = {
    val rnd = rngFor(nameIdx, 55L)
    val nouns = math.min(16, vocab.length)
    Array(vocab(rnd.nextInt(vocab.length)), vocab(rnd.nextInt(vocab.length)),
      vocab(rnd.nextInt(nouns)))
  }

  /** etl28's growth counts, through the operator's OWN machinery
    * ([[Etl.nameVocabulary]] for the key-domain collapse,
    * [[Etl.fuzzyBlockedLinks]] for the blocked pair space): vocabulary
    * size, the largest block (the quadratic exposure — per-block work
    * is |block|²), the band-surviving candidate count (what the
    * levenshtein kernel actually runs on), and the emitted links. At
    * the real sf dir the vocabulary is the part table's; synthetic
    * decades derive one part name per document id from [[synthPartName]]'s
    * Heaps law over the base corpus vocabulary.
    */
  private def etl28Counts(spark: SparkSession, p: (String, Long) => Unit,
      dir: String, baseDir: String): Unit = {
    import spark.implicits._
    val hasPart = {
      val path = new org.apache.hadoop.fs.Path(s"$dir/part.parquet")
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    }
    val names =
      if (hasPart) Etl.etl28Names(spark, dir)
      else {
        val vocab = Tables.documents(spark, baseDir)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "").distinct()
          .collect().map(_.getString(0)).sorted
        val vocabB = spark.sparkContext.broadcast(vocab)
        val nRows = Tables.documents(spark, dir).count()
        Etl.nameVocabulary(
          spark.range(nRows).as[Long]
            .map(id => synthPartName(id, vocabB.value)).toDF("p_name"))
      }
    val pinned = names.persist()
    try {
      p("etl28_vocab", pinned.count())
      p("etl28_max_block", pinned.groupBy("blk")
        .agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0))
      p("etl28_band_pairs",
        Etl.fuzzyBlockedLinks(pinned, bandOnly = true).count())
      p("etl28_links", Etl.fuzzyBlockedLinks(pinned).count())
    } finally pinned.unpersist(blocking = false)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val synthDir = args.lift(1).getOrElse("/tmp/graft_sf1_synth")
    // `deep` appends the THIRD decade (sf10-synth, linear claims only).
    val deep = args.contains("deep")
    val spark = graft.GraftSession.build(
      graft.GraftSession.cpusFromEnv, "graft-growth")
    try {
      buildSynth(spark, baseDir, synthDir)
      measure(spark, "sf0.1", baseDir, baseDir)
      measure(spark, "sf1-synth", synthDir, baseDir)
      if (deep) {
        val deepDir = s"${synthDir}10"
        buildSynth(spark, baseDir, deepDir, Synth10Docs.toLong, Synth10Vecs.toLong)
        // The per-(session, dir) caches keep sf1-synth frames pinned;
        // release so the third decade starts from a clean registry.
        graft.GraftCache.release()
        measureLinear(spark, "sf10-synth", deepDir, baseDir)
      }
    } finally {
      graft.GraftCache.release()
      spark.stop()
    }
  }
}
