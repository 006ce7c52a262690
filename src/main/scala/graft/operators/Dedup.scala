package graft.operators

import graft.functions.GraftFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deduplication surface dedup01–dedup06 over `documents` /
  * `embeddings` (SURVEY.md §2). The scale story: exact dedup is a hash
  * aggregate; near-dup avoids the O(n²) pair space via LSH banding
  * (MinHash for Jaccard, chunk-pigeonhole for SimHash) so candidate
  * generation is an equi-join; exact verification touches only the
  * candidates.
  */
object Dedup {

  val ShingleSize = 3
  val JaccardThreshold = 0.8
  val NumHashes = 128
  val Bands = 32 // 32 bands × 4 rows: P(miss | j=0.8) = (1-0.8⁴)³² ≈ 5e-8

  /** Distinct word-shingle HASH SETS per document:
    * (doc_id, source, hs array<long>) — built by the native
    * [[graft.functions.ShingleHashes]] expression (tokenize + hash +
    * dedup in one per-document pass); no shingle STRING is ever
    * materialized. Set operations on the hashes equal set operations on
    * the shingles modulo 64-bit collisions (birthday bound ~D²/2⁶⁵ —
    * at 100 TB a handful of collisions perturb an `inter` count by ±1
    * against sizes in the hundreds, never a Jaccard threshold).
    *
    * Cached in ARRAY form (one row per document — far cheaper to
    * persist than the exploded row form) via [[graft.GraftCache]]:
    * every consumer across dedup02/03/06 and cur03 branches from ONE
    * shared persisted copy per (session, dir), released by
    * `GraftCache.release()`. Per-doc set SIZE is `size(hs)` (no
    * counting shuffle) and MinHash signatures come from the scalar
    * [[graft.functions.MinHashSignature]] expression (no aggregation
    * shuffle); only the candidate equi-joins explode to rows, and that
    * explode is narrow work over the cached arrays.
    */
  private[operators] def shingleArrays(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"dedup.shingleArrays:$dir:${graft.GraftCache.sessionTag(spark)}") {
      documents(spark, dir)
        .select(col("doc_id"), col("source"),
          shingleHashes(col("text"), ShingleSize).as("hs"))
    }

  /** Exploded (doc_id, source, h) rows — derived narrowly from the
    * cached array frame, NOT persisted itself.
    */
  private[operators] def shingleRows(spark: SparkSession, dir: String): DataFrame =
    shingleArrays(spark, dir)
      .select(col("doc_id"), col("source"), explode(col("hs")).as("h"))

  /** Exact Jaccard for a pair set (expects columns da, db). Set sizes
    * are `size(hs)` off the cached array frame — no counting shuffle.
    */
  private def exactJaccard(spark: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val sizes = shingleArrays(spark, dir).select(col("doc_id"), size(col("hs")).as("c"))
    val shk = shingleRows(spark, dir).select(col("doc_id"), col("h").as("k"))
    val inter = pairs
      .join(shk.withColumnRenamed("doc_id", "da"), Seq("da"))
      .join(shk.withColumnRenamed("doc_id", "db"), Seq("db", "k"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("c", "ca"), Seq("da"))
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("c", "cb"), Seq("db"))
      .select(col("da"), col("db"), col("inter"),
        (col("ca") + col("cb") - col("inter")).as("uni"),
        (col("inter") / (col("ca") + col("cb") - col("inter"))).as("jaccard"))
  }

  /** dedup01: exact dedup via content fingerprint — a single hash
    * aggregate, the cheapest possible dedup at any scale.
    */
  def dedup01Exact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_docs"))
      .orderBy("keeper_id")

  /** Hard ceiling for [[dedup02NgramJaccard]]'s corpus size. The
    * operator's candidate space is birthday-quadratic (measured ~94×
    * growth for 10× docs — PLANS.md), so it exists ONLY as dedup03's
    * ground truth at oracle scale; the fence makes an accidental run
    * against a production corpus fail loudly instead of melting the
    * cluster. 1M docs keeps sf-scale oracles and spec corpora well
    * inside while stopping anything resembling real data.
    */
  val Dedup02MaxDocs = 1000000L

  /** dedup02: exact pairwise n-gram Jaccard ≥ t via shingle equi-join.
    * Correct but O(candidate pairs); kept as the semantic ground truth
    * for dedup03, FENCED by [[Dedup02MaxDocs]] — at 100 TB use dedup03:
    * same output, LSH-pruned pair space.
    */
  def dedup02NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    dedup02NgramJaccard(spark, dir, Dedup02MaxDocs)

  /** [[dedup02NgramJaccard]] with an explicit fence, so the spec can
    * assert the guard trips without building a million-doc corpus.
    */
  private[graft] def dedup02NgramJaccard(
      spark: SparkSession, dir: String, maxDocs: Long): DataFrame = {
    // The fence must be CHEAPER than what it fences: count the source
    // rows (parquet row-group metadata, no tokenization) — counting the
    // shingle frame would itself build and pin a corpus-wide shingle
    // set before the guard could trip.
    val nDocs = documents(spark, dir).count()
    require(nDocs <= maxDocs,
      s"dedup02 is the O(n²) ground-truth oracle, fenced at $maxDocs docs " +
        s"(measured $nDocs): run dedup03 (MinHash-LSH) instead — same " +
        "output, sub-quadratic candidate space")
    val sh = shingleRows(spark, dir)
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val sizes = shingleArrays(spark, dir).select(col("doc_id"), size(col("hs")).as("c"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("c", "ca"), Seq("da"))
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("c", "cb"), Seq("db"))
      .withColumn("jaccard", col("inter") / (col("ca") + col("cb") - col("inter")))
      .filter(col("jaccard") >= JaccardThreshold)
      // Presented via intRatio: inter/union is an exact integer ratio
      // (the half-grid rounding class — see GraftFunctions.intRatio).
      .select(col("da"), col("db"),
        intRatio(col("inter"), col("ca") + col("cb") - col("inter"), 4)
          .as("jaccard"))
      .orderBy("da", "db")
  }

  /** MinHash signatures: one row per doc, ARRAY<BIGINT> of NumHashes
    * min-hashes — ZERO shuffles. The per-doc shingle-hash array is
    * already materialized ([[shingleArrays]]), so the whole signature is
    * the scalar [[graft.functions.MinHashSignature]] expression
    * (splitmix64 re-mixes in a tight JVM loop) evaluated in the scan
    * stage. Earlier formulations — 128 separate `min(xxhash64(seed,h0))`
    * aggregate columns, then one [[graft.functions.MinHashAgg]] — each
    * paid a full groupBy shuffle of the exploded shingle rows. Recall
    * is unchanged: the dedup03 spec pins output equality with the exact
    * pair set.
    */
  def minhashSignatures(arrays: DataFrame): DataFrame =
    arrays
      // Shingle-less docs (< n tokens) get the empty all-MaxValue
      // signature, which would collide in EVERY band — m such docs
      // would inject m²/2 meaningless LSH candidates. The aggregate
      // formulation dropped them implicitly (no rows → no group); the
      // scalar expression must drop them explicitly.
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), minhashSignature(col("hs"), NumHashes).as("sig"))

  /** LSH candidate pairs: docs sharing any band bucket. The pair space
    * collapses from O(n²) to an equi-join on (band, bucket-hash).
    */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val banded = sig.select(col("doc_id"),
        posexplode(lshBands(col("sig"), Bands, NumHashes / Bands)).as(Seq("band", "bucket")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** dedup03: MinHash + LSH near-dup detection with exact verification
    * of candidates. Output is identical to dedup02 (recall ≈ 1-5e-8 at
    * t=0.8) but the shingle join only ever sees LSH candidates.
    */
  def dedup03MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // The verified pair set is tiny (near-dup pairs only) and feeds
    // downstream consumers (dedup06's clustering): persist it — through
    // the registry, so repeated dedup03/dedup06 calls share one pinned
    // copy and the session can release it.
    val verified = graft.GraftCache.getOrPersist(
      s"dedup.verified:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val cands = lshCandidates(minhashSignatures(shingleArrays(spark, dir)))
      exactJaccard(spark, dir, cands)
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("da"), col("db"),
          intRatio(col("inter"), col("uni"), 4).as("jaccard"))
    }
    verified.orderBy("da", "db")
  }

  /** dedup13's sweep grid: every (bands, rowsPerBand) factorization of
    * [[SweepHashes]] permutations from rows=1 (loosest — a pair is a
    * candidate if ANY single min-hash agrees) to rows=8 (tightest —
    * P(candidate | j=0.8) per band = 0.8⁸ ≈ 0.17, so at 4 bands the
    * miss rate is a measurable ~50%: the curve bends where the theory
    * says it must).
    */
  val SweepHashes = 32
  val LshSweepConfigs: Seq[(Int, Int)] = Seq((32, 1), (16, 2), (8, 4), (4, 8))

  /** Engine-portable sweep signatures — (doc_id, h0..h31), each h_j the
    * MIN over the doc's 3-gram shingle STRINGS of the 60-bit md5
    * permutation hash `md5("j:" ++ shingle)` (the tokenHash64
    * contract). Deliberately NOT dedup03's xxhash64 signatures: the
    * sweep's whole point is that the candidate curve itself replays in
    * the oracle, which needs every hash to be portable. Pinned per
    * (session, dir): the superset join and the per-pair flag
    * projection both read it.
    *
    * Shape: explode shingles, then 32 map-side-combined `min`
    * aggregates — every expression (concat/md5/conv) is a codegen'd
    * builtin. The per-doc-array formulation (`array_min(transform(...))`
    * × 32 permutations) computed the same mins but each lambda was
    * INTERPRETED per array element: ~4× slower on the cold build at
    * sf0.1 (32M md5 evaluations either way; codegen is the difference).
    * `min` is duplicate-insensitive, so the old `array_distinct` is
    * dropped rather than re-expressed; shingle-less docs (< n tokens)
    * vanish at the explode, exactly as the old size>0 filter dropped
    * them.
    */
  private def sweepSignatures(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"dedup.sweepSig:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val t = tokens(col("text"))
      val shs = when(size(t) >= ShingleSize,
          transform(sequence(lit(0), (size(t) - ShingleSize).cast("int")),
            i => concat_ws(" ", slice(t, i + 1, lit(ShingleSize)))))
        .otherwise(array().cast("array<string>"))
      val aggs = (0 until SweepHashes).map(j =>
        min(tokenHash64(concat(lit(s"$j:"), col("s")))).as(s"h$j"))
      documents(spark, dir)
        .select(col("doc_id"), explode(shs).as("s"))
        .groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
    }

  /** dedup13: LSH band/row TUNING SWEEP — sim16's knob-curve idea
    * applied to the dedup family's own knob: MinHash-LSH's
    * (bands, rows-per-band) trade-off. More rows per band = fewer,
    * higher-precision candidates but real recall loss at the match
    * threshold; every LSH deployment picks its point on that S-curve,
    * and this operator MEASURES the whole curve in one pass —
    * candidate cost, verified true pairs, and recall against the exact
    * near-dup set, per config.
    *
    * One-pass trick (the nested-config identity): with contiguous band
    * layouts over one permutation set, a (b, r) candidate shares all r
    * hashes of some band, hence shares at least one single hash — so
    * every config's candidate set is a SUBSET of the loosest (rows=1)
    * config's. The sweep therefore runs ONE candidate equi-join (at
    * rows=1), attaches both signatures to the surviving pairs, and
    * derives every config's membership as pure boolean algebra over
    * the 32 hash-agreement bits — no per-config join, no re-scan.
    *
    * Verification is a broadcast membership probe against the
    * production pipeline's verified near-dup set (dedup03's
    * GraftCache-pinned frame — spec-pinned equal to the exhaustive
    * exact set at LSH's 1-5e-8 miss rate), NOT a fresh exact-Jaccard
    * pass over the superset: the rows=1 superset is the sweep's one
    * large intermediate (288k pairs at sf0.1 from 5k docs), and a
    * pair×shingle intersection join over it was measured at ~4× the
    * cost of the entire rest of the operator. The oracle keeps the
    * EXHAUSTIVE exact set as its truth side, so the engine/oracle
    * match is itself a proof that the production set and the exact
    * set agree on the corpus.
    *
    * At 100 TB the superset join is the loosest config's LSH join —
    * still the banded equi-join shape, never a pair space — and a real
    * tuning run points the sweep at a corpus SAMPLE (cur01's
    * deterministic hash sample composes directly). Recall's
    * denominator is the same dedup03 verified set.
    *
    * The signature frame is the ONE corpus-sized frame here (264 B/doc:
    * 32 longs + id), so whether it may ride a broadcast is a MEASURED
    * decision (dedup06's dispatch discipline), never a standing hint:
    * at ≤ [[SweepSigBroadcastMaxDocs]] docs both legs broadcast (~50 MB
    * ceiling — the sf0.1/sample-deployment path); above it the legs
    * attach through an explicit SHUFFLED hash join on da/db — the
    * superset pair frame and the signatures co-partition on the doc
    * key, executors build per-partition maps of corpus/partitions
    * signature rows, and nothing corpus-sized is ever collected to one
    * place. Round 14 shipped unconditional `broadcast(sigA/sigB)` —
    * the one broadcast in the tree whose payload grew with the corpus,
    * exactly the ceiling this operator's sample-deployment paragraph
    * promises away (round-14 VERDICT item 3).
    */
  /** The loosest (rows=1) config's candidate superset — extracted so
    * growth measurement counts THROUGH the operator's own join (the
    * GrowthProbe discipline), never a parallel implementation.
    */
  private[graft] def sweepSuperset(spark: SparkSession, dir: String): DataFrame = {
    val sigs = sweepSignatures(spark, dir)
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until SweepHashes).map(j => col(s"h$j")): _*))
        .as(Seq("perm", "h")))
    banded.as("a").join(banded.as("b"),
        col("a.perm") === col("b.perm") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** Document-count bound under which the sweep's signature legs may
    * broadcast: 264 B/doc ⇒ ~50 MB at 200k docs, a sane executor
    * budget. Above it [[dedup13Curve]] switches both attachments to
    * the explicit shuffled hash join on da/db.
    */
  val SweepSigBroadcastMaxDocs = 200000L

  /** dedup13's two dispatch/denominator scalars (signature count, true-
    * pair count), memoized per (dir, session) — round 21: both counts
    * run over GraftCache-pinned frames keyed the same way, so the memo
    * can never outlive the frames it counted (one release clears both),
    * and each dedup13 call stops paying two scheduling round-trips for
    * numbers that are session-constants (the sim09/bpe driver-scalar
    * cache pattern).
    */
  private val dedup13Scalars =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  graft.GraftCache.onRelease(() => dedup13Scalars.clear())

  def dedup13LshSweep(spark: SparkSession, dir: String): DataFrame = {
    // Measured dispatch (dedup06's discipline): count the pinned
    // signature frame — O(1) against the cache — and only broadcast
    // under the documented bound. The counts are eager build-time
    // scalars, like every other measured-dispatch operator here.
    val (nSigs, nTrue) = dedup13Scalars.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => (sweepSignatures(spark, dir).count(),
        dedup03MinhashLsh(spark, dir).count()))
    dedup13Curve(spark, dir,
      broadcastSigs = nSigs <= SweepSigBroadcastMaxDocs, nTrue = Some(nTrue))
  }

  /** The sweep's curve with the signature-attachment strategy explicit
    * — separable so the plan audit can pin BOTH arms' physical shape
    * (broadcast under the bound, shuffled hash join on da/db above it)
    * without staging a 200k-doc corpus.
    */
  private[graft] def dedup13Curve(spark: SparkSession, dir: String,
      broadcastSigs: Boolean, nTrue: Option[Long] = None): DataFrame = {
    val sigs = sweepSignatures(spark, dir)
    val superCands = sweepSuperset(spark, dir)
    val sigA = sigs.select(col("doc_id").as("da") +:
      (0 until SweepHashes).map(j => col(s"h$j").as(s"a$j")): _*)
    val sigB = sigs.select(col("doc_id").as("db") +:
      (0 until SweepHashes).map(j => col(s"h$j").as(s"b$j")): _*)
    // Above the bound: SHUFFLE_HASH, not stats-driven — the optimizer
    // must never re-promote a corpus-sized leg to a broadcast, and a
    // sort of either side buys nothing (the probe is an equi-lookup).
    def leg(df: DataFrame) =
      if (broadcastSigs) broadcast(df) else df.hint("shuffle_hash")
    val flags = superCands
      .join(leg(sigA), Seq("da"))
      .join(leg(sigB), Seq("db"))
      .select(col("da") +: col("db") +: LshSweepConfigs.map { case (b, r) =>
        (0 until b).map { band =>
          (0 until r).map(k =>
            col(s"a${band * r + k}") === col(s"b${band * r + k}"))
            .reduce(_ && _)
        }.reduce(_ || _).as(s"cand_$r")
      }: _*)
    val verified = dedup03MinhashLsh(spark, dir)
      .select(col("da"), col("db"), lit(true).as("is_true"))
    val perPair = flags
      .join(broadcast(verified), Seq("da", "db"), "left")
      .withColumn("is_true", coalesce(col("is_true"), lit(false)))
    // Denominator: the production near-dup set's size — one scalar
    // (the codebook-scalar contract), taken from the caller's
    // session memo when supplied.
    val nTrueV = nTrue.getOrElse(dedup03MinhashLsh(spark, dir).count())
    perPair
      .select(explode(array(LshSweepConfigs.map { case (b, r) =>
        struct(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col(s"cand_$r").as("cand"), col("is_true").as("ist"))
      }: _*)).as("c"))
      .select(col("c.*"))
      .groupBy("bands", "rows_per_band")
      .agg(sum(col("cand").cast("long")).as("n_candidates"),
        sum((col("cand") && col("ist")).cast("long")).as("n_verified"))
      .withColumn("n_true", lit(nTrueV))
      .withColumn("recall",
        intRatio(col("n_verified"), greatest(col("n_true"), lit(1L)), 4))
      .orderBy("rows_per_band")
  }

  /** Per-document 64-bit SimHash as a DataFrame: tokens are exploded and
    * the per-bit majority vote runs inside ONE native aggregate
    * ([[graft.functions.SimHashAgg]], a TypedImperativeAggregate with a
    * 64-counter vote buffer — partial votes combine map-side before the
    * doc_id shuffle). Semantically identical to
    * [[graft.functions.GraftFunctions.simhash64]] (the column form, used
    * for small/spec-scale data) but ~an order of magnitude faster at
    * corpus scale: higher-order-function lambdas are interpreted per
    * array element and get no partial aggregation.
    */
  /** Per-document 64-bit SimHash frame, pinned through
    * [[graft.GraftCache]]: the pigeonhole candidate join reads it as
    * BOTH self-join legs, so without the pin the md5 token-hash +
    * bit-vote aggregate would execute twice per dedup04 call (measured
    * ~2× the operator's cost at sf0.1).
    */
  def simhashDocs(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"dedup.simhash:$dir:${graft.GraftCache.sessionTag(spark)}") {
      documents(spark, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .groupBy("doc_id")
        .agg(simhashAgg(tokenHash64(col("t"))).as("sh"))
    }

  /** dedup04's near-dup radius: pairs within hamming ≤ 3 of each other
    * on the 64-bit SimHash (the web-crawl setting of Manku, Jarvelin &
    * Sarma 2007, "Detecting near-duplicates for web crawling").
    */
  val SimhashMaxHamming = 3

  /** Pigeonhole blocking config for dedup04's candidate join: the
    * 64-bit SimHash splits into `blocks` equal pieces and the join key
    * is every `keyBlocks`-combination of them. A pair within hamming ≤
    * blocks − keyBlocks differs in at most blocks − keyBlocks pieces,
    * so at least keyBlocks pieces survive intact TOGETHER in at least
    * one enumerated combination — candidate generation stays an
    * equi-join at every setting, and widening the key (more keyBlocks)
    * tightens the random-collision rate from 2^-width to
    * 2^-(width·keyBlocks) at the cost of C(blocks, keyBlocks) key rows
    * per doc. (4, 1) is the classic 4×16-bit chunk scheme; (8, 5) is
    * the corpus-scale setting (56 keys of 40 bits — the birthday term
    * drops from n²/2¹⁶ to n²·56/2⁴⁰, ~10⁵× fewer accidental
    * candidates).
    *
    * The scheme is generic over fingerprint width and radius: `bits`
    * is the hash width (64 for SimHash — the default; 8 for mm07's
    * barcode perceptual hashes) and `radius` the hamming distance the
    * recall guarantee must cover (keyBlocks ≤ blocks − radius). The
    * same machinery therefore serves dedup04 (64-bit, radius 3) and
    * mm07's image near-dup (radius 4) without duplication.
    */
  final case class SimhashBlocking(
      blocks: Int, keyBlocks: Int,
      bits: Int = 64, radius: Int = SimhashMaxHamming) {
    require(bits >= 1 && bits <= 64, s"bits must be in 1..64, got $bits")
    require(blocks > 0 && bits % blocks == 0,
      s"blocks must divide $bits, got $blocks")
    require(keyBlocks >= 1 && keyBlocks <= blocks - radius,
      s"recall guarantee needs keyBlocks ≤ blocks - $radius " +
        s"(hamming ≤ ${blocks - keyBlocks} shares a full key), " +
        s"got ($blocks, $keyBlocks)")
    val width: Int = bits / blocks
    val combos: Seq[Seq[Int]] =
      (0 until blocks).combinations(keyBlocks).map(_.toSeq).toSeq
  }

  /** Corpus-size threshold for switching dedup04 to wide blocking.
    * Originally set to 200k docs from the uniform birthday term
    * (n²·4/2¹⁶); the second measured decade (PLANS.md's sf1-synth
    * probe) showed the narrow (4, 1) config already paying 21.4M
    * candidates at 50k docs on a correlated-vocabulary corpus — 104×
    * the wide config's 205k at the same scale — because real corpora
    * concentrate simhashes far above the uniform estimate. The cutover
    * now sits at 20k docs; the pigeonhole recall guarantee makes the
    * switch result-identical (blocking-invariance spec).
    */
  val SimhashNarrowMaxDocs = 20000L

  /** Blocking choice from a MEASURED corpus size — the knob PLANS.md's
    * candidate-growth table prescribes turning as the corpus grows.
    */
  def simhashBlocking(nDocs: Long): SimhashBlocking =
    if (nDocs <= SimhashNarrowMaxDocs) SimhashBlocking(4, 1)
    else SimhashBlocking(8, 5)

  /** One row per (combo, key): each combination's block values packed
    * little-endian into one long. For (4, 1) this is byte-for-byte the
    * classic 16-bit chunk explode.
    */
  private[operators] def pigeonholeKeys(
      sh: Column, cfg: SimhashBlocking): Column = {
    val mask = if (cfg.width == 64) -1L else (1L << cfg.width) - 1L
    array(cfg.combos.map { bs =>
      bs.zipWithIndex.map { case (b, j) =>
        shiftleft(
          shiftrightunsigned(sh, b * cfg.width).bitwiseAND(lit(mask)),
          j * cfg.width)
      }.reduce((x, y) => x.bitwiseOR(y))
    }: _*)
  }

  /** THE pigeonhole candidate join, generic over the fingerprint frame:
    * posexplode the block-combination keys, equi-join on (combo, key),
    * emit each `idA < idB` pair once with its exact hamming distance.
    * One definition serves dedup04 (64-bit doc simhashes) and mm07
    * (image perceptual hashes) — a skew/salting treatment added here
    * reaches both, instead of drifting between two hand-kept copies.
    */
  private[graft] def pigeonholeCandidatePairs(
      hashed: DataFrame, idCol: String, hashCol: String,
      cfg: SimhashBlocking, outA: String, outB: String): DataFrame = {
    val keyed = hashed.select(col(idCol), col(hashCol),
      posexplode(pigeonholeKeys(col(hashCol), cfg)).as(Seq("chunk_idx", "chunk")))
    keyed.as("a").join(keyed.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as(outA), col(s"b.$idCol").as(outB),
        hamming64(col(s"a.$hashCol"), col(s"b.$hashCol")).as("hamming"))
      .distinct()
  }

  /** Distinct candidate pairs (da, db, hamming) under `cfg` — shared by
    * dedup04 (filters to the radius) and the candidate-count
    * measurement the spec and PLANS.md pin growth with.
    */
  private def simhashCandidates(
      spark: SparkSession, dir: String, cfg: SimhashBlocking): DataFrame =
    pigeonholeCandidatePairs(
      simhashDocs(spark, dir), "doc_id", "sh", cfg, "da", "db")

  /** Candidate-set size under `cfg` (pre-radius-filter) — the number
    * the blocking exists to keep sub-quadratic.
    */
  private[graft] def simhashCandidateCount(
      spark: SparkSession, dir: String, cfg: SimhashBlocking): Long =
    simhashCandidates(spark, dir, cfg).count()

  /** dedup04: SimHash near-dup pairs (hamming ≤ [[SimhashMaxHamming]]).
    * Candidates via pigeonhole block-combination keys
    * ([[SimhashBlocking]]) — always an equi-join, never all-pairs — with
    * the blocking picked from the measured corpus size
    * ([[simhashBlocking]]); output is blocking-invariant (the guarantee
    * covers the radius at every admissible config; spec-pinned).
    */
  def dedup04Simhash(spark: SparkSession, dir: String): DataFrame =
    dedup04Simhash(spark, dir,
      simhashBlocking(documents(spark, dir).count()))

  /** [[dedup04Simhash]] at an explicit blocking config. */
  private[graft] def dedup04Simhash(
      spark: SparkSession, dir: String, cfg: SimhashBlocking): DataFrame =
    simhashCandidates(spark, dir, cfg)
      .filter(col("hamming") <= SimhashMaxHamming)
      .orderBy("da", "db")

  /** Edge count below which the whole pair graph is handled by one
    * executor partition. 50M edges ≈ 800 MB of (long, long) — trivially
    * within executor memory; the verified near-dup pair set of even a
    * 100 TB corpus rarely approaches this because LSH + exact
    * verification already shrank it to true duplicates only.
    */
  val UnionFindMaxEdges = 50000000L

  /** dedup06: duplicate-cluster assignment — connected components over
    * the verified near-dup pair graph (dedup03's output), cluster id =
    * min doc_id reachable.
    *
    * Hybrid execution, chosen by measured edge count:
    *  - Small graph (the normal case): path-compressed union-find
    *    inside ONE `mapPartitions` task — executor-side, no driver
    *    collect, one narrow job.
    *  - Huge graph: distributed min-label propagation — each round one
    *    join + min-aggregate; the driver only sees a scalar convergence
    *    count. Rounds = component diameter (dup clusters are
    *    quasi-cliques, so a handful).
    */
  def dedup06Cluster(spark: SparkSession, dir: String): DataFrame = {
    // No persist of its own: the projection reads dedup03's registered
    // verified-pair cache, so both consumers (the count and the
    // clustering scan) are cache hits already.
    clusterPairs(spark, s"dedup06:$dir",
      dedup03MinhashLsh(spark, dir).select(col("da"), col("db")))
  }

  /** Hybrid connected-components dispatch shared by dedup06 (token
    * near-dup graph) and dedup09 (semantic near-dup graph): measured
    * edge count picks single-partition union-find vs distributed
    * min-label propagation.
    *
    * The input is consumed twice (the dispatch count, then the chosen
    * clustering pass), so it is pinned here — dedup06 happens to feed an
    * already-registered frame (dedup03's verified-pair cache), but
    * dedup09 feeds dedup05's raw pair plan, whose salted cell join +
    * exact cosine filter would otherwise execute twice. The pin is
    * keyed by the CALLER's identity (`graphKey`, e.g. "dedup09:<dir>")
    * through getOrPersist: repeated calls for the same graph share ONE
    * pinned copy instead of accumulating one per call (the unbounded-
    * growth failure the registry exists to prevent), while distinct
    * graphs never collide on a key.
    */
  private[operators] def clusterPairs(spark: SparkSession, graphKey: String,
      pairs: DataFrame): DataFrame = {
    val pinned = graft.GraftCache.getOrPersist(
      s"dedup.clusterPairs:$graphKey:${graft.GraftCache.sessionTag(spark)}")(
      pairs)
    val nEdges = pinned.count()
    if (nEdges <= UnionFindMaxEdges) unionFindClusters(spark, pinned)
    else propagateClusters(pinned)
  }

  /** Single-partition path-compressed union-find (small pair graphs).
    * Union by min root ⇒ every component's root is its min doc_id.
    */
  private[operators] def unionFindClusters(spark: SparkSession, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    pairs.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (a, b) =>
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      parent.keys.toArray.map(k => (k, find(k))).iterator
    }.toDF("doc_id", "cluster_id").orderBy("doc_id")
  }

  /** Hard round cap for [[propagateClusters]]. Rounds track component
    * diameter and duplicate clusters are quasi-cliques (diameter ≲ 3),
    * so hitting this cap means the input is not a near-dup pair graph —
    * fail loudly rather than return un-converged (wrong) cluster ids.
    */
  val PropagateMaxRounds = 50

  /** Distributed min-label propagation (huge pair graphs).
    *
    * Lineage: each round's plan references the previous round's frame
    * THREE times (the neighbor join, the self side of the step, and
    * the old-label column), so carrying lazy lineage across rounds
    * grows the LOGICAL plan ~3^r — and Catalyst re-analyzes,
    * re-canonicalizes (for cache matching), and re-optimizes that
    * whole tree on every round's count even when the data itself is
    * cached. Round 21 measured the old persist-with-checkpoint-every-
    * 10 form on the 8-round chain spec: per-round count wall 0.5 →
    * 2.3 → 8.5 → 26.9 s (~3× per round, 110 s for 8 trivial rounds —
    * and ~20 minutes under the round-20 driver's loaded machine, which
    * is what killed its `sbt test` budget). Every round therefore
    * truncates the plan with an EAGER localCheckpoint — the
    * materialization cost is the same one the per-round convergence
    * count already paid under persist, but downstream rounds see a
    * flat LogicalRDD instead of the exponential tree. Fault-tolerance
    * trade unchanged from the old every-10-rounds form (and from the
    * sim family's per-round checkpoints): localCheckpoint blocks are
    * not recoverable — an executor loss mid-propagation fails the job
    * and the caller re-runs; a long-lived deployment swaps in
    * checkpoint() against the cluster FS here. Old blocks are freed by
    * the context cleaner as each round's RDD goes unreachable.
    */
  private[operators] def propagateClusters(
      pairs: DataFrame,
      maxRounds: Int = PropagateMaxRounds): DataFrame = {
    val edges = pairs.union(pairs.select(col("db"), col("da")))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // Every node's new label: min over its own and its neighbours'.
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nlabel"))
      val next = labels.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          col("label").as("old"))
        .localCheckpoint(eager = true)
      changed = next.filter(col("label") < col("old")).count()
      labels = next.select("id", "label")
      round += 1
    }
    edges.unpersist(blocking = false)
    if (changed > 0)
      throw new IllegalStateException(
        s"propagateClusters did not converge after $maxRounds rounds " +
          s"($changed labels still changing): input is not a near-dup pair " +
          "graph (diameter should be ≲ 3)")
    labels
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** dedup07: near-dup detection via winnowing fingerprint overlap —
    * the MOSS scheme end-to-end. Each doc's fingerprint SET comes from
    * the native one-pass [[graft.functions.WinnowFingerprints]]
    * expression; candidate pairs share fingerprints (equi-join, never
    * all-pairs) and are scored by containment
    * (shared / min(|A|, |B|)). Character-level and position-robust, so
    * it catches reordered/trimmed near-dups that word-shingle Jaccard
    * scores lower — a complementary detector to dedup02/03 built from
    * the same sub-quadratic shape.
    */
  /** Fingerprints appearing in more than this many documents are
    * boilerplate (common substrings), carry no near-dup signal, and are
    * exactly the hot keys that would make the pair join quadratic: a
    * fingerprint shared by m docs contributes m² candidate rows, and
    * the df distribution is heavy-tailed (measured max df 3379 at
    * sf0.1, Σdf² ≈ 190M pair rows → 50 s; capped at 10 the join is
    * linear in |fingerprints| → ~2 s). MOSS applies the same
    * stop-fingerprint rule. True near-dup pairs share doc-SPECIFIC
    * fingerprints, so detection is unaffected (spec pins the word-
    * shingle near-dup pair set as a subset of dedup07's output).
    */
  val WinnowMaxDf = 10

  def dedup07WinnowOverlap(spark: SparkSession, dir: String): DataFrame = {
    val Containment = 0.8
    // Shares text09's cached per-doc fingerprint arrays; every branch
    // below (df filter, both join sides, sizes) explodes the cached
    // arrays instead of re-running the corpus-wide md5 pass.
    val arr = TextAnalysis.winnowArrays(spark, dir)
    val fAll = arr.select(col("doc_id"), explode(col("fps")).as("fp"))
    val rare = fAll.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowMaxDf)
      .select("fp")
    val f = fAll.join(rare, Seq("fp"))
    val sz = f.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = f.as("a").join(f.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sz.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), Seq("da"))
      .join(sz.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), Seq("db"))
      .withColumn("containment",
        intRatio(col("shared"), least(col("na"), col("nb")), 4))
      .filter(col("containment") >= Containment)
      .select(col("da"), col("db"), col("shared"), col("containment"))
      .orderBy("da", "db")
  }

  /** Embedding vectors as ARRAY<DOUBLE> (stable cross-engine math). */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), asDoubleArray(col("embedding")).as("v"))

  /** dedup05: embedding-cosine near-dup pairs ≥ t, EXACT, via an
    * angular metric cell join instead of the former all-pairs
    * nested-loop self-join.
    *
    * Why not hyperplane LSH for candidates: measured on the testdata,
    * every qualifying pair sits barely above the threshold
    * (cos 0.45–0.51 ≈ 62–63°, where one random hyperplane separates a
    * pair with p ≈ 0.35) — no affordable (planes, probes) setting
    * reaches recall 1.0, and this operator's contract (and its DuckDB
    * oracle) is EXACT. The exact-but-sub-quadratic shape is metric
    * blocking on the sphere, where angle θ(a,b) = acos(cos_sim) obeys
    * the triangle inequality:
    *
    *  1. Assign every vector to its nearest pivot cell (the IVF
    *     codebook from [[Similarity.ivfCentroids]] — per-row argmax
    *     against literal pivots, zero shuffle) plus its angle to that
    *     pivot (free: the argmax struct carries the winning cosine).
    *  2. A |codebook|-row aggregate gives each cell's angular radius;
    *     the driver then keeps only cell PAIRS that can possibly
    *     contain a qualifying pair: θ(p_i,p_j) − rad_i − rad_j ≤ θ_t.
    *     On clustered real embeddings this discards almost the whole
    *     cell-pair grid; on adversarially uniform data it degrades
    *     gracefully to all cell pairs — still an equi-join, never a
    *     nested loop (plan-spec'd).
    *  3. Candidates flow through a broadcast of the admissible pair
    *     list plus ONE salted shuffle of the corpus by cell; every
    *     candidate pair pays exactly one codegen'd 64-dim cosine.
    *     (A per-pair reverse-triangle prune on pivot angles was
    *     measured here and REMOVED: carrying a 16-double angle array
    *     through the shuffle and evaluating a 16-term bound per pair
    *     cost more than the cosines it could skip.)
    *
    * At deploy scale the codebook should grow with the corpus (cells
    * bound the shuffle key cardinality and the per-cell pair work);
    * swap trained centroids in via the same literal-array contract.
    */
  /** dedup05's cosine threshold for a near-duplicate pair. */
  val CosineDupThreshold = 0.45

  /** The metric-blocking stats behind dedup05's cell join: per-cell
    * sizes and the ADMISSIBLE cell pairs — (ci ≤ cj) whose pivot angle
    * minus both angular radii can still reach the threshold angle.
    * Factored out so the growth probe measures candidate counts with
    * the SAME admissibility rule the join executes (a probe with its
    * own rule could report a pair space the operator never builds).
    */
  private[graft] def cellJoinStats(spark: SparkSession, dir: String)
      : (Seq[(Long, Long)], Map[Long, Long]) = {
    val thetaT = math.acos(CosineDupThreshold)
    val cents = Similarity.ivfCentroids(vectors(spark, dir))
    val assigned = Similarity.cachedCellAssignment(spark, dir)
    // Tiny per-cell stats → driver: angular radius + size of each cell.
    val stats: Map[Long, (Double, Long)] = assigned.groupBy("cell")
      .agg(max(col("radang")).as("rad"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // Driver-side twin of CosineSimilarity.nullSafeEval (including its
    // zero-norm → cos 0 guard: a degenerate all-zero pivot must yield
    // angle π/2, not NaN — a NaN would silently veto every admissibility
    // test for that cell and drop qualifying pairs from an EXACT op).
    def pivotAngle(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val c = if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      math.acos(math.max(-1.0, math.min(1.0, c)))
    }
    val present = cents.filter(c => stats.contains(c._1))
    val admissible = for {
      (ci, vi) <- present.toSeq
      (cj, vj) <- present.toSeq
      if ci <= cj
      if pivotAngle(vi, vj) - stats(ci)._1 - stats(cj)._1 <= thetaT
    } yield (ci, cj)
    (admissible, stats.map { case (c, (_, n)) => c -> n })
  }

  def dedup05EmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val T = CosineDupThreshold

    // Per-row: nearest-pivot cell AND the angle to that pivot — the
    // shared IVF assignment (one definition with sim03/sim06), one
    // codegen'd scan pass against the literal codebook, zero shuffles.
    // Persisted through the registry (shared with sim07's kNN graph):
    // the radius aggregate and BOTH join legs read it, so without the
    // pin the scan + 16-cosine argmax would execute three times.
    val assigned = Similarity.cachedCellAssignment(spark, dir)
    val admissible = cellJoinStats(spark, dir)._1

    import spark.implicits._
    val pairs = broadcast(admissible.toDF("ca", "cb"))
    // The cell key has only |codebook| distinct values — an unsalted
    // equi-join would put each cell's whole pair space on ONE reducer.
    // Salting the probe side on a high-cardinality discriminator and
    // exploding the build side ×Salt spreads every cell over Salt
    // reducers (the dedicated skew treatment SURVEY §5 promises for
    // known-small key domains; AQE's skew splitting can't help because
    // the skew is structural, not statistical).
    val Salt = 16
    val a = assigned.select(col("vec_id").as("ida"), col("v").as("va"),
      col("cell").as("cell_a"))
      .withColumn("salt", pmod(xxhash64(col("ida")), lit(Salt)).cast("int"))
    val b = assigned.select(col("vec_id").as("idb"), col("v").as("vb"),
      col("cell").as("cell_b"))
      .withColumn("salt",
        explode(sequence(lit(0), lit(Salt - 1), lit(1)).cast("array<int>")))
      // Hash join over the salted key beats sort-merge here: the join
      // key is low-cardinality (cell × salt), so the SMJ sort buys
      // nothing, and the build side is bounded by corpus/|cells| rows
      // per partition (measured ~25% faster at sf0.1).
      .hint("shuffle_hash")
    a.join(pairs, col("cell_a") === col("ca"))
      .join(b, col("cell_b") === col("cb") && a("salt") === b("salt") &&
        (col("cell_a") < col("cell_b") || col("ida") < col("idb")))
      .select(least(col("ida"), col("idb")).as("ida"),
        greatest(col("ida"), col("idb")).as("idb"),
        cosineSim(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= T)
      .select(col("ida"), col("idb"), round(col("cos"), 4).as("cos"))
      .orderBy("ida", "idb")
  }

  /** dedup09: SemDeDup-style SEMANTIC dedup — the embedding-space
    * composition every large pre-training build runs (SemDeDup,
    * Abbas et al. 2023): connected components over the exact
    * cosine-near-dup graph (dedup05's verified pairs), one keeper
    * elected per component (min vec_id — swap a quality argmax in via
    * the same election), everything else marked droppable. Documents
    * with no near neighbor never enter the graph and are implicit
    * keepers — the output lists only the non-trivial components,
    * so its size tracks true duplication, not the corpus.
    *
    * Scale shape: candidate generation is dedup05's metric cell join
    * (never corpus×corpus — plan-spec'd there); the component pass is
    * [[clusterPairs]]' measured-size dispatch, and the keeper election
    * is a per-row comparison against the component's min-id label —
    * no extra shuffle past the clustering itself.
    */
  def dedup09Semdedup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedup05EmbeddingCosine(spark, dir)
      .select(col("ida").as("da"), col("idb").as("db"))
    clusterPairs(spark, s"dedup09:$dir", pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).cast("int").as("is_keeper"))
      .orderBy("vec_id")
  }

  /** Non-overlapping span width (tokens) for paragraph-granularity
    * dedup. 10 tokens ≈ the boilerplate span a RefinedWeb-style line
    * dedup targets; the corpus has no structural paragraph breaks, so
    * fixed token spans are the honest chunking (the granularity is a
    * knob, not a property of the algorithm).
    */
  val ParagraphTokens = 10

  /** dedup08: paragraph-granularity EXACT dedup — the sub-document
    * sibling of dedup01 (reference per-row dedup, case_2/Normal.py:265-
    * 275, pushed below document grain). Whole-document dedup misses the
    * dominant failure mode of a crawled corpus: distinct pages sharing
    * boilerplate spans (headers, navigation, license blocks). Chunk each
    * document into non-overlapping [[ParagraphTokens]]-token spans,
    * count per span hash how many DISTINCT documents contain it, and
    * report each document's duplicated-span fraction — the signal a
    * curation pass thresholds on (and the exact spans a span-removal
    * rewrite would drop).
    *
    * Scale shape: the chunking is a per-row `transform` in the scan
    * stage (no explode until the aggregate needs rows); the document-
    * frequency table is one partially-aggregated groupBy on the 8-byte
    * `xxhash64` of the span (strings never shuffle — same argument as
    * [[shingleArrays]]'s hash-set semantics: a 64-bit collision at
    * corpus scale perturbs one df count, never a fraction past a
    * threshold); the flag-back is a hash-keyed shuffle join (the span
    * vocabulary of a 100 TB corpus exceeds any broadcast budget, the
    * same posture as text11's frequency join); the per-doc rollup is
    * the final narrow aggregate. Three shuffles total, all on compact
    * keys, each partial-aggregated map-side.
    */
  def dedup08Paragraph(spark: SparkSession, dir: String): DataFrame =
    paragraphDupStats(documents(spark, dir), Some(
      s"dedup.spanHashes:$dir:${graft.GraftCache.sessionTag(spark)}"))

  /** Core of dedup08 over any (doc_id, text) frame — separable so the
    * spec can drive a corpus with known span structure.
    */
  /** (doc_id, idx, h) rows: one 64-bit hash per non-overlapping
    * [[ParagraphTokens]]-token span, with its 0-based chunk index — the
    * shared chunking contract of batch dedup08, the streaming span
    * dedup (stream07), and text20's boilerplate scrub (which keys its
    * rewrite on `idx`, so the scrub cannot chunk differently than the
    * detector by construction).
    */
  private[graft] def spanHashRows(docs: DataFrame): DataFrame = {
    val k = ParagraphTokens
    val t = col("t")
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      // Docs shorter than one span yield sequence(0,-1,1), which Spark
      // rejects — guard to an empty array (mirrors shinglesFromTokens).
      .select(col("doc_id"), posexplode(
        when(size(t) >= k,
          transform(sequence(lit(0), (size(t) / k).cast("int") - 1, lit(1)),
            i => xxhash64(concat_ws(" ", slice(t, i * k + 1, lit(k))))))
          .otherwise(array().cast("array<bigint>"))).as(Seq("idx", "h")))
  }

  /** Window width (tokens) for dedup10's exact substring spans. The
    * published setting for this technique is 50 tokens on web-crawl
    * documents (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — the suffix-array ExactSubstr dedup);
    * this corpus' documents are an order of magnitude shorter, so the
    * window scales down with them. A window is the MINIMUM span that
    * counts as duplication; merged spans grow past it.
    */
  val SubstringWindow = 15

  /** dedup10: exact substring-SPAN dedup — for every document, the
    * maximal token ranges whose text also appears verbatim in another
    * document. This is the span-REPORTING sibling of dedup08: fixed
    * non-overlapping chunks catch block-aligned boilerplate but miss
    * (and mis-bound) arbitrary-offset repeats; stride-1 windows merged
    * into maximal spans recover the exact ranges a span-removal rewrite
    * would drop, at any alignment (the Spark re-expression of the
    * suffix-array ExactSubstr result — reference scope: per-row dedup,
    * case_2/Normal.py:265-275, pushed below row grain).
    *
    * Scale shape: the window stream is one row per token (linear — the
    * stride-1 overlap costs ×[[ParagraphTokens]] rows vs dedup08, not
    * quadratic anything); windows shuffle as 8-byte hashes for the
    * document-frequency aggregate (strings never shuffle — the
    * [[shingleArrays]] collision argument); the flag-back is a
    * hash-keyed shuffle join; span merging is ONE doc_id window pass
    * (lag + running sum — island detection, no self-join). A 64-bit
    * collision can only ADD a spurious window to a span, never drop
    * one, and at df-aggregate granularity the effect is the same ±1
    * perturbation as dedup08 tolerates.
    */
  def dedup10SubstringSpans(spark: SparkSession, dir: String): DataFrame =
    substringSpans(documents(spark, dir), Some(
      s"dedup.windowHashes:$dir:${graft.GraftCache.sessionTag(spark)}"))

  /** Arrival-batch split for dedup11: doc_id ≡ [[IngestRem]] (mod
    * [[IngestMod]]) plays the newly-arriving batch; everything else is
    * the already-indexed corpus. Deterministic and SF-independent, so
    * the DuckDB oracle replays the same split.
    */
  val IngestMod = 16
  val IngestRem = 3

  /** dedup11: INCREMENTAL ingest dedup — the decision a pipeline makes
    * per NEWLY-ARRIVING document against an already-indexed corpus,
    * which is the shape dedup actually runs at steady state (dedup01/03
    * are the full-corpus batch form; re-running them per arrival batch
    * would rescan the corpus pair space every time). Per arrival:
    * `exact` (normalized-content fingerprint matches a corpus doc —
    * dedup01's fingerprint as a cross-split equi-join, cheapest check
    * first), else `near` (MinHash-LSH candidates against the corpus,
    * exact-verified Jaccard ≥ [[JaccardThreshold]]; keeper = the
    * highest-Jaccard corpus doc, id-ascending tiebreak), else `admit`.
    *
    * At 100 TB the corpus side of both equi-joins is a PRE-BUILT
    * persisted index (the fingerprint set and the banded signature
    * layout, written once, bucketed by join key) and only the arrival
    * batch is hashed/signed per run — each ingest touches
    * O(batch × collisions), never the corpus pair space. LSH recall is
    * the dedup03 setting (128 hashes, 32×4 bands: P(miss | j=0.8) ≈
    * 5e-8); the spec's driver-side replay recomputes the decisions
    * from raw text with NO LSH, so a recall regression fails the spec.
    */
  def dedup11IncrementalIngest(spark: SparkSession, dir: String): DataFrame = {
    val isArrival = col("doc_id") % IngestMod === IngestRem
    ingestDecisions(spark, dir,
        documents(spark, dir).filter(isArrival).select("doc_id", "text"))
      .orderBy("doc_id")
  }

  /** Decision core of dedup11 over ANY (doc_id, text) arrivals frame —
    * separable so stream09 can apply the SAME decisions per micro-batch
    * (decisions are per-arrival independent: each needs only the
    * arrival's own text and the corpus index, so any batching of the
    * arrival stream yields identical verdicts). Arrival fingerprints,
    * shingles and signatures are computed from the frame's own text
    * (the arrival side of a real ingest is new data, not corpus rows);
    * the corpus side always comes from `dir`'s cached index frames,
    * minus the arrival split.
    */
  private[graft] def ingestDecisions(
      spark: SparkSession, dir: String, arrivals: DataFrame): DataFrame = {
    val isArrival = col("doc_id") % IngestMod === IngestRem
    val normFp = md5(lower(regexp_replace(col("text"), "\\s+", " ")))

    // Exact leg: dedup01's normalized fingerprint, min corpus keeper.
    val exact = arrivals.select(col("doc_id"), normFp.as("fp"))
      .join(documents(spark, dir).filter(!isArrival)
          .select(col("doc_id").as("kid"), normFp.as("fp")),
        Seq("fp"))
      .groupBy("doc_id").agg(min("kid").as("exact_keeper"))

    // Near leg: banded-signature equi-join (arrival × corpus only — no
    // corpus² term), exact verification of candidates, bounded-heap
    // top-1 keeper per arrival.
    def banded(sig: DataFrame) = sig.select(col("doc_id"),
      posexplode(lshBands(col("sig"), Bands, NumHashes / Bands))
        .as(Seq("band", "bucket")))
    val arrSh = arrivals.select(col("doc_id"),
      shingleHashes(col("text"), ShingleSize).as("hs"))
    val arrBanded = banded(arrSh.filter(size(col("hs")) > 0)
      .select(col("doc_id"), minhashSignature(col("hs"), NumHashes).as("sig")))
    val corpBanded = banded(minhashSignatures(shingleArrays(spark, dir))
      .filter(!isArrival))
    val cands = arrBanded.as("a")
      .join(corpBanded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val inter = cands
      .join(arrSh.select(col("doc_id").as("da"), explode(col("hs")).as("k")),
        Seq("da"))
      .join(shingleRows(spark, dir)
          .select(col("doc_id").as("db"), col("h").as("k")),
        Seq("db", "k"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    val verified = inter
      .join(arrSh.select(col("doc_id").as("da"), size(col("hs")).as("ca")),
        Seq("da"))
      .join(shingleArrays(spark, dir)
          .select(col("doc_id").as("db"), size(col("hs")).as("cb")),
        Seq("db"))
      .select(col("da"), col("db"), col("inter"),
        (col("ca") + col("cb") - col("inter")).as("uni"),
        (col("inter") / (col("ca") + col("cb") - col("inter"))).as("jaccard"))
    val near = graft.plans.TopKPerKey(
        verified.filter(col("jaccard") >= JaccardThreshold),
        keyCols = Seq("da"),
        orderCols = Seq(("jaccard", true), ("db", false)),
        k = 1)
      .select(col("da").as("doc_id"), col("db").as("near_keeper"),
        intRatio(col("inter"), col("uni"), 4).as("near_j"))

    arrivals.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_keeper").isNotNull, "exact")
          .when(col("near_keeper").isNotNull, "near")
          .otherwise("admit").as("decision"),
        coalesce(col("exact_keeper"), col("near_keeper"), lit(-1L))
          .as("keeper_id"),
        when(col("exact_keeper").isNotNull, lit(1.0))
          .when(col("near_keeper").isNotNull, col("near_j"))
          .otherwise(lit(0.0)).as("jaccard"))
  }

  /** Core of dedup10 over any (doc_id, text) frame — separable so the
    * spec can drive documents with known shared substrings.
    */
  private[graft] def substringSpans(
      docs: DataFrame, cacheKey: Option[String] = None): DataFrame = {
    val chunked = strideWindowRows(docs)
    // Both the df build and the flag-back join consume the window rows;
    // pinning them (20 bytes/row) saves the second corpus-wide
    // tokenize + k-token hash pass — the dedup08 discipline.
    val windows = cacheKey.fold(chunked)(key =>
      graft.GraftCache.getOrPersist(key)(chunked))
    val df = windows.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select("h")
    val flagged = windows.join(df, Seq("h")).select("doc_id", "pos")
    mergeWindowIslands(flagged)
  }

  /** Stride-1 [[SubstringWindow]]-token window hashes: ONE row per
    * token position of every document — (doc_id, carried cols…, pos,
    * h). The shared derivation behind dedup10's within-corpus span
    * dedup and cur16's cross-split decontamination (one definition, so
    * the window grammar can never drift between them). Docs shorter
    * than one window yield no rows (the spanHashRows guard).
    */
  private[graft] def strideWindowRows(
      docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val k = SubstringWindow
    val t = col("t")
    docs
      .select(col("doc_id") +: carry.map(col) :+ tokens(col("text")).as("t"): _*)
      .select(col("doc_id") +: carry.map(col) :+ posexplode(
        when(size(t) >= k,
          transform(sequence(lit(0), (size(t) - k).cast("int"), lit(1)),
            i => xxhash64(concat_ws(" ", slice(t, i + 1, lit(k))))))
          .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "h")): _*)
  }

  /** Island merge of flagged (doc_id, pos) window starts into MAXIMAL
    * spans: two windows belong to one span iff their starts are within
    * [[SubstringWindow]] tokens (overlap OR exact adjacency); a running
    * sum of the "new island" flag numbers the spans per document. ONE
    * per-doc window pass (lag + cumsum — no self-join), shared by
    * dedup10 and cur16.
    */
  private[graft] def mergeWindowIslands(flagged: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = SubstringWindow
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged
      .withColumn("is_new",
        when(lag("pos", 1).over(byDoc).isNull
          .or(col("pos") - lag("pos", 1).over(byDoc) > k), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum("is_new").over(run))
      .groupBy("doc_id", "span_id")
      .agg(min("pos").as("start_pos"),
        (max("pos") + lit(k - 1)).as("end_pos"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_id"), col("start_pos"),
        col("end_pos"), col("n_windows"))
      .orderBy("doc_id", "span_id")
  }

  /** Core of cur16 over any (doc_id, `splitCol`, text) frame: maximal
    * token spans of each NON-held-out document whose text appears
    * verbatim (at any alignment) in the HELD-OUT split — Lee et al.
    * 2022's ExactSubstr check run ACROSS the train/eval boundary
    * instead of within the corpus. Exactly dedup10's machinery
    * ([[strideWindowRows]] + [[mergeWindowIslands]]) with the
    * document-frequency aggregate replaced by a membership semi-join
    * against the held-out side's distinct window hashes: train-train
    * duplication is dedup10's business, NOT contamination — only a
    * window the held-out set also contains flags here.
    *
    * Scale shape (all dedup10's): one row per token position, windows
    * shuffle as 8-byte hashes, the held-out hash set is a hash-keyed
    * semi-join build side (at 100 TB the held-out/benchmark corpus is
    * the small side by construction — eval sets are curated, not
    * crawled), and span merging is ONE per-doc window pass. A 64-bit
    * collision can only ADD a spurious window to a span (same ±1
    * tolerance as dedup08/10).
    */
  private[graft] def substringContamination(
      docs: DataFrame, heldOut: Column,
      cacheKey: Option[String] = None): DataFrame = {
    val chunked = strideWindowRows(docs, carry = Seq("source"))
    // Held-out probe and train side both consume the window rows — pin
    // them once (the dedup10 discipline; separate key because this
    // frame carries the split column).
    val windows = cacheKey.fold(chunked)(key =>
      graft.GraftCache.getOrPersist(key)(chunked))
    val held = windows.filter(heldOut).select("h").distinct()
    val flagged = windows.filter(!heldOut)
      .join(held, Seq("h"), "left_semi")
      .select("doc_id", "pos")
    mergeWindowIslands(flagged)
  }

  /** The corpus' RAW stride-1 window frame (source carried), under
    * cur16's cache key — the SAME pinned frame
    * [[graft.operators.Curation.cur16SubstringContamination]] builds
    * through [[substringContamination]]'s cacheKey (identical builder
    * expression + identical key, so whichever runs first materializes
    * it and the other reads it). cur18's post-boilerplate window
    * rebuild reads it for every UNAFFECTED doc: a doc with no template
    * chunk has byte-identical text after the scrub, so its raw windows
    * ARE its post-scrub windows.
    */
  private[graft] def cur16WindowRows(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"cur16.windowHashes:$dir:${graft.GraftCache.sessionTag(spark)}") {
      strideWindowRows(documents(spark, dir), carry = Seq("source"))
    }

  /** The held-out split's DISTINCT window-hash set for `dir` — cur16's
    * semi-join build side as a standing PROBE INDEX, pinned per
    * (session, dir) so the streaming decontamination gate (stream15)
    * probes it per micro-batch without re-tokenizing the held-out
    * corpus each time. 8 bytes per distinct held window at rest; the
    * benchmark split is the small side by construction (eval sets are
    * curated, not crawled), and at 100 TB this index is written once
    * and bucketed by hash like the dedup11/12 corpus indexes.
    */
  private[graft] def heldOutWindowHashes(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"cur16.held:$dir:${graft.GraftCache.sessionTag(spark)}") {
      strideWindowRows(
        documents(spark, dir).filter(col("source") === "src0"))
        .select("h").distinct()
    }

  /** Contamination spans of an ARRIVING (doc_id, text) frame against
    * `dir`'s held-out index — stream15's per-micro-batch decision
    * core (cur16's semantics at ingest time). Per-arrival independent:
    * each document's spans need only its own text and the index, so
    * verdicts are invariant under re-batching, and identical to batch
    * cur16 when the arrivals are the corpus' own training split
    * (spec-pinned).
    */
  private[graft] def ingestContaminationSpans(
      spark: SparkSession, dir: String, arrivals: DataFrame): DataFrame =
    mergeWindowIslands(
      strideWindowRows(arrivals)
        .join(heldOutWindowHashes(spark, dir), Seq("h"), "left_semi")
        .select("doc_id", "pos"))

  private[operators] def paragraphDupStats(
      docs: DataFrame, cacheKey: Option[String] = None): DataFrame = {
    val chunked = spanHashRows(docs)
    // Both the df build and the flag-back join consume the chunk rows;
    // pinning them (16 bytes/row — far smaller than the text they
    // derive from) saves the second full-corpus scan + re-tokenization.
    val chunkRows = cacheKey.fold(chunked)(key =>
      graft.GraftCache.getOrPersist(key)(chunked))
    val df = chunkRows.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunkRows.join(df, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum((col("nd") > 1).cast("long")).as("dup_chunks"))
      .filter(col("dup_chunks") > 0)
      .withColumn("dup_frac", intRatio(col("dup_chunks"), col("n_chunks"), 4))
      .orderBy("doc_id")
  }

  /** Target false-positive rate for the dedup12 corpus Bloom filter.
    * 1% keeps the sketch ~9.6 bits/key, 50× smaller than shipping the
    * key set itself — the standard operating point for an ingest gate.
    * Sizing holds only as far as the sketch fits the driver + literal
    * broadcast (the builder raises Spark's bloom conf caps to the
    * measured corpus count, so the size is data-driven, not the 8 MB
    * default ceiling): ~10⁸–10⁹ keys (hundreds of MB – ~1 GB) is the
    * practical ceiling for this in-plan literal; beyond that, shard the
    * sketch per corpus partition or move the gate into the scan.
    */
  val BloomFpp = 0.01

  /** Driver-held corpus fingerprint Bloom filters, one per (dir,
    * session) — the trainedCodebooks pattern: the sketch is O(corpus
    * bits), never O(corpus rows), so holding and re-broadcasting it is
    * the codebook-scalar contract, and building it costs ONE corpus
    * aggregation that is amortized across every batch the session
    * gates.
    *
    * ASSUMES the corpus partition at `dir` is immutable within a
    * session segment: a sketch built before new docs are indexed would
    * miss them (false negatives relative to the refreshed corpus — the
    * one failure mode the no-false-negative argument can't cover). A
    * steady-state ingest that admits docs INTO the corpus must
    * invalidate between segments: the map is wired into
    * [[graft.GraftCache.release]] (cleared with the frame registry, so
    * Bench family boundaries and Verify shutdown drop it), and
    * re-keying on sessionTag bounds growth across sessions.
    */
  private val corpusBlooms =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  graft.GraftCache.onRelease(() => corpusBlooms.clear())

  /** Serializes the bloom-cap conf raise in [[bloomGate]] so the
    * check-then-set is atomic across concurrent sketch builders.
    */
  private val bloomConfLock = new Object

  /** dedup01/11's normalized-content fingerprint as a reusable column. */
  private def normFp: Column =
    md5(lower(regexp_replace(col("text"), "\\s+", " ")))

  /** dedup12: BLOOM-GATED ingest dedup — dedup11's exact leg with the
    * arrival×corpus fingerprint join fronted by a Bloom-filter
    * membership gate. At steady state the corpus index is the 100 TB
    * side: joining every arrival batch against it shuffles the batch
    * AND probes a corpus-sized hash relation, yet in a healthy pipeline
    * almost all arrivals are novel. The gate inverts that economics:
    * the corpus is summarized ONCE into a Bloom sketch (built by
    * Spark's native `BloomFilterAggregate` — the same machinery the
    * engine's runtime row-level filtering injects, map-side partial
    * sketches OR-merged in one aggregation), and each batch is filtered
    * by the codegen'd `BloomFilterMightContain` predicate in its scan
    * stage, so only the ~dup_rate + fpp fraction that MIGHT match ever
    * reaches the verification join.
    *
    * Correctness is analytic, not probabilistic: a Bloom filter has NO
    * false negatives, so every true duplicate survives the gate, and
    * the verification equi-join on the exact md5 fingerprint then
    * eliminates every false positive — the gated output is therefore
    * IDENTICAL to the ungated join's (spec-pinned), which is why the
    * DuckDB oracle can replay the plain join. The reference's per-batch
    * "already in master?" probe (case_2/Normal.py:53-79) is this
    * decision at desktop scale; the sketch is what makes it answerable
    * without touching the master table per batch.
    *
    * Sizing is measured, not guessed (the dedup04/etl21 discipline):
    * bits come from `BloomFilter.optimalNumOfBits(n, 1%)` with n the
    * counted corpus size. The sketch value is the fingerprint's
    * xxhash64 (the filter stores 64-bit keys); equality of md5
    * fingerprints implies equality of their xxhash64, so the
    * no-false-negative guarantee survives the re-hash.
    */
  def dedup12BloomIngest(spark: SparkSession, dir: String): DataFrame =
    bloomIngestDecisions(spark, dir, gated = true)

  /** Decision core, separable so the spec can pin gated == ungated. */
  private[graft] def bloomIngestDecisions(
      spark: SparkSession, dir: String, gated: Boolean): DataFrame = {
    val arrivals = documents(spark, dir)
      .filter(col("doc_id") % IngestMod === IngestRem)
      .select(col("doc_id"), normFp.as("fp"))
    val candidates = if (gated) arrivals.filter(bloomGate(spark, dir)) else arrivals
    val dups = candidates
      .join(corpusFingerprints(spark, dir), Seq("fp"))
      .groupBy("doc_id").agg(min("kid").as("keeper"))
    arrivals.select("doc_id")
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("keeper").isNotNull, "dup").otherwise("admit").as("decision"),
        coalesce(col("keeper"), lit(-1L)).as("keeper_id"))
      .orderBy("doc_id")
  }

  /** dedup14: CROSS-MODAL page near-dup — one verdict per page pair
    * combining BOTH modality signals, which is how a multimodal corpus
    * actually dedups: a crawl page survives text paraphrase detection
    * but carries the same hero image (scraped mirrors), or keeps the
    * image but rewrites the caption — either signal alone admits the
    * dup. Output is the UNION of the two evidence sets with per-pair
    * flags: (dup_text, dup_image), the surviving evidence columns
    * (jaccard from the text leg, hamming from the image leg, null on
    * the side that didn't fire), and the composed verdict
    * both/text_only/image_only.
    *
    * Composition, not reimplementation (stream18's discipline): the
    * text leg IS dedup03's GraftCache-pinned verified set and the
    * image leg IS mm06's delta-neighborhood pair set — the cross-modal
    * view cannot drift from the per-modality operators because it has
    * no decision logic of its own, only the full-outer pair algebra.
    * The text leg is restricted to image-bearing pages via broadcast
    * semi-joins against the image corpus' id frame (NOT a literal id
    * cap — at 100 TB the image-bearing page set is whatever the media
    * lake holds, and the semi-join is the same tiny-broadcast shape).
    *
    * Scale: both legs are already-audited near-linear pipelines whose
    * OUTPUTS (verified near-dup pairs) are tiny by definition; the
    * composition is a full-outer equi-join on (da, db) between two
    * evidence frames — never a corpus-sized shuffle. The oracle
    * replays both legs exhaustively (the dedup02 shingle grammar for
    * text, the staged-barcode bit law for images) and the full-outer
    * algebra in one query.
    */
  def dedup14Crossmodal(spark: SparkSession, dir: String): DataFrame = {
    // The image-bearing page set is read off the DECODED image corpus
    // (mm06's pinned hash frame), not a doc_id predicate — at 100 TB
    // the media lake defines which pages carry images.
    val pageIds = Multimodal.corpusImageHashes(spark, dir)
      .select(col("img_id").as("doc_id"))
    val textPairs = dedup03MinhashLsh(spark, dir)
      .join(broadcast(pageIds.select(col("doc_id").as("da"))), Seq("da"),
        "left_semi")
      .join(broadcast(pageIds.select(col("doc_id").as("db"))), Seq("db"),
        "left_semi")
      .select(col("da"), col("db"), col("jaccard"))
    val imgPairs = Multimodal.mm06PhashDedup(spark, dir)
      .select(col("img_a").as("da"), col("img_b").as("db"), col("hamming"))
    textPairs.join(imgPairs, Seq("da", "db"), "full_outer")
      .select(col("da"), col("db"),
        col("jaccard").isNotNull.as("dup_text"),
        col("hamming").isNotNull.as("dup_image"),
        col("jaccard"), col("hamming"),
        crossmodalVerdict(col("jaccard"), col("hamming")).as("verdict"))
      .orderBy("da", "db")
  }

  /** dedup14's verdict algebra over the two evidence columns —
    * extracted so the spec can pin ALL arms directly: the staged
    * corpus realizes only image_only/text_only (its text dups and
    * image dups are injected independently, so no pair carries both),
    * and an arm the data never reaches must still be proven, not
    * assumed. The full-outer join guarantees at least one side
    * non-null, so there is deliberately no fourth arm.
    */
  private[graft] def crossmodalVerdict(
      jaccard: Column, hamming: Column): Column =
    when(jaccard.isNotNull && hamming.isNotNull, "both")
      .when(jaccard.isNotNull, "text_only")
      .otherwise("image_only")

  private def corpusFingerprints(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .filter(col("doc_id") % IngestMod =!= IngestRem)
      .select(col("doc_id").as("kid"), normFp.as("fp"))

  /** The might-contain predicate over a frame's `fp` column, backed by
    * the (dir, session)-cached corpus sketch. Exposed to the spec for
    * measuring the gate's pass-through rate directly.
    */
  private[graft] def bloomGate(spark: SparkSession, dir: String): Column = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bytes = corpusBlooms.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => {
        val corpus = corpusFingerprints(spark, dir)
        val n = math.max(corpus.count(), 1L)
        val bits = org.apache.spark.util.sketch.BloomFilter
          .optimalNumOfBits(n, BloomFpp)
        // BloomFilterAggregate silently clamps BOTH its n and numBits
        // args via Math.min against these session confs (defaults: 4M
        // items / 2^26 bits = 8 MB). Past ~7M corpus keys a clamped
        // sketch saturates and the fpp blows far past BloomFpp — the
        // gate stays CORRECT (still a superset) but loses its economics.
        // Raise the caps to the measured size before building, so the
        // sketch is sized by the data, never by a default ceiling.
        //
        // SESSION-GLOBAL SIDE EFFECT: these are session confs, so the
        // raise is visible to every other query in the session (e.g. a
        // concurrent query relying on Spark's own runtime bloom-join
        // injection will also be allowed a bigger sketch). The raise is
        // monotone-only — never lowered back — so the worst case for
        // bystanders is a larger, MORE accurate sketch, never a clamp.
        // The raise itself runs under a lock: a plain check-then-set
        // lets two concurrent builders (different dirs, different
        // corpus sizes) interleave so the smaller need lands last and
        // clamps the larger builder's sketch right back — exactly the
        // saturation this code exists to prevent.
        bloomConfLock.synchronized {
          Seq(
            "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> n,
            "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bits
          ).foreach { case (k, need) =>
            if (spark.conf.getOption(k).forall(_.toLong < need))
              spark.conf.set(k, need.toString)
          }
        }
        corpus
          .select(GraftShim.column(new BloomFilterAggregate(
              GraftShim.expression(xxhash64(col("fp"))),
              GraftShim.expression(lit(n)),
              GraftShim.expression(lit(bits)))
            .toAggregateExpression()).as("bf"))
          .head.getAs[Array[Byte]](0)
      })
    GraftShim.column(new BloomFilterMightContain(
      GraftShim.expression(lit(bytes)),
      GraftShim.expression(xxhash64(col("fp")))))
  }
}
