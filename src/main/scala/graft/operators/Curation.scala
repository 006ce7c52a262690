package graft.operators

import graft.functions.GraftFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-curation surface cur01–cur04 (SURVEY.md §2): the dataset-level
  * operations an LLM-training-data pipeline runs after per-document
  * scoring — deterministic sampling, composition stats, cross-corpus
  * contamination checks, and threshold filtering. All declarative; the
  * only shuffles are the explicit corpus-level aggregations.
  */
object Curation {

  /** cur01: deterministic hash sampling — an engine-portable 1/16
    * sample keyed on md5(doc_id), so the same doc is selected on every
    * engine, every run, at every scale (reservoir/random sampling can't
    * be oracle-checked and isn't reproducible across engines).
    */
  def cur01HashSample(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** cur02: corpus composition — document/char counts and corpus share
    * per (source, lang). The share is a windowed ratio over the grand
    * total: two-phase agg then a single-row broadcast-style window (the
    * window partition is the whole aggregate output, which is tiny —
    * #sources × #langs — regardless of corpus size).
    */
  def cur02CorpusStats(spark: SparkSession, dir: String): DataFrame = {
    val agg = documents(spark, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_total"))
    agg
      .withColumn("char_share",
        intRatio(col("n_chars_total"),
          sum("n_chars_total").over(Window.partitionBy()), 6))
      .orderBy("source", "lang")
  }

  /** cur03: cross-corpus contamination — shingle overlap between a
    * candidate training corpus and a held-out/benchmark corpus (here:
    * source partitions of `documents`). Same LSH-free equi-join shape
    * as dedup02 but ACROSS corpora: the join key is the shingle, the
    * pair space is only cross-source, and the output is per-candidate
    * contamination evidence (max overlap against any benchmark doc).
    */
  def cur03Contamination(spark: SparkSession, dir: String): DataFrame = {
    // Shares Dedup's cached (doc_id, source, h) shingle frame — same
    // 3-gram shingling, and joining/counting on the 64-bit shingle hash
    // instead of the string shrinks the cross-source shuffle.
    val docs = Dedup.shingleRows(spark, dir)
    val train = docs.filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), col("h").as("s"))
    val bench = docs.filter(col("source") === "src0")
      .select(col("doc_id").as("bench_id"), col("h").as("s"))
    // Per-doc shingle-set size straight off the cached array frame —
    // no counting shuffle.
    val trainSizes = Dedup.shingleArrays(spark, dir)
      .filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), size(col("hs")).as("n_shingles"))
    train.join(bench, Seq("s"))
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .join(trainSizes, Seq("train_id"))
      .groupBy("train_id")
      .agg(max(intRatio(col("overlap"), col("n_shingles"), 4))
        .as("max_contamination"))
      .filter(col("max_contamination") >= 0.5)
      .orderBy("train_id")
  }

  /** cur16: SUBSTRING-level train/eval decontamination — the ExactSubstr
    * check (Lee et al. 2022, arXiv:2107.06499) every frontier pipeline
    * runs before eval: cur03's 8-gram shingle overlap scores
    * set-similarity, but verbatim benchmark text at an ARBITRARY
    * alignment inside a longer training document can sit below any
    * shingle-overlap threshold while still leaking the eval set.
    * dedup10 already builds exactly the machinery this needs (stride-1
    * window hashes, flag-back, island merge); here the corpus side
    * crosses against the HELD-OUT split (cur03's convention: source
    * `src0` is the benchmark/eval corpus) instead of against itself,
    * and the output is each training document's MAXIMAL contaminated
    * spans — the exact token ranges a span-removal rewrite would drop.
    *
    * Plan shape: hash-keyed equi-joins only (plan-audited) — the
    * held-out window-hash set is a semi-join build side, never an
    * all-pairs or threshold scan. See
    * [[graft.operators.Dedup.substringContamination]] for the scale
    * argument.
    */
  def cur16SubstringContamination(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringContamination(
      documents(spark, dir), col("source") === "src0",
      Some(s"cur16.windowHashes:$dir:${graft.GraftCache.sessionTag(spark)}"))

  /** cur17: contamination SCRUB — EXECUTE cur16's decision: remove the
    * contaminated token spans from each affected training document and
    * emit the cleaned text plus the audit a pipeline logs (tokens
    * before / removed / span count). cur16 reports "the exact ranges a
    * span-removal rewrite would drop"; this is that rewrite — the step
    * that actually protects the eval set while keeping the rest of an
    * otherwise-good document (dropping whole documents for one leaked
    * paragraph wastes the other 95% of the tokens).
    *
    * Spark shape: the span frame is TINY (contaminated docs only), so
    * it aggregates per doc and joins back as a BROADCAST (cur06's
    * evidence-mark posture — never a corpus-sized doc_id shuffle join,
    * plan-audited); the rewrite itself is pure codegen higher-order
    * functions over the token array (positions not covered by any span
    * survive, order preserved) — one corpus scan, zero extra shuffles.
    * Spans are maximal and disjoint by cur16's island-merge
    * construction, so `Σ(end−start+1)` IS the removed-token count.
    */
  def cur17ContaminationScrub(spark: SparkSession, dir: String): DataFrame =
    scrubSpans(documents(spark, dir),
      Dedup.substringContamination(
        documents(spark, dir), col("source") === "src0",
        Some(s"cur16.windowHashes:$dir:${graft.GraftCache.sessionTag(spark)}")))

  /** The rewrite itself over any (doc_id, text) frame + span frame —
    * separable so the spec can drive hand-built corpora with known
    * clean-text expectations.
    */
  private[graft] def scrubSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val perDoc = spans.groupBy("doc_id").agg(
      collect_list(struct(col("start_pos"), col("end_pos"))).as("spans"),
      count(lit(1)).as("n_spans"),
      sum(col("end_pos") - col("start_pos") + 1).as("n_removed"))
    val t = tokens(col("text"))
    docs
      .join(broadcast(perDoc), Seq("doc_id"))
      .select(
        col("doc_id"), col("n_spans"),
        size(t).cast("long").as("n_tokens"), col("n_removed"),
        concat_ws(" ", transform(
          filter(sequence(lit(0), size(t) - 1), p =>
            !exists(col("spans"), s =>
              p >= s.getField("start_pos") && p <= s.getField("end_pos"))),
          p => element_at(t, p + 1))).as("clean_text"))
      .orderBy("doc_id")
  }

  /** cur04: threshold filtering — the C4-style keep/drop decision from
    * per-document quality signals, reported as per-source keep rates.
    * Single pass: the flag is computed inline, no second scan for the
    * drop set.
    */
  /** cur05: corpus mixing weights — the per-source sampling weight that
    * rebalances the corpus toward a target mix (here: uniform across
    * sources; swap the target vector at deploy). weight =
    * target_share / actual_share, so sampling each source's documents
    * with probability ∝ weight yields the target mix in expectation —
    * the knob every multi-source pre-training data pipeline tunes.
    * One aggregate over the corpus; the share/weight math is a window
    * over the tiny per-source output.
    */
  def cur05MixWeights(spark: SparkSession, dir: String): DataFrame = {
    val agg = documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_total"))
    val w = Window.partitionBy()
    agg
      .withColumn("actual_share",
        intRatio(col("n_docs"), sum("n_docs").over(w), 6))
      .withColumn("weight",
        intRatio(sum("n_docs").over(w),
          count(lit(1)).over(w) * col("n_docs"), 4))
      .orderBy("source")
  }

  def cur04QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stopRatio = TextAnalysis.stopRatio(toks, langProfiles("en"))
    documents(spark, dir)
      .withColumn("keep",
        (col("n_chars") >= 100) && (size(toks) >= 20) && (stopRatio >= 0.02))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        intRatio(sum(col("keep").cast("long")), count(lit(1)), 4)
          .as("keep_rate"))
      .orderBy("source")
  }

  /** cur07: stratified downsampling to a uniform source mix — the
    * EXECUTION of cur05's mix weights: each stratum (source) keeps a
    * deterministic hash slice of its documents sized so every source
    * contributes ~equally (rate = min(1, target_share / actual_share)
    * with a uniform target). Selection is engine-portable: a doc is
    * kept iff the first 4 hex chars of md5(doc_id) sort below the
    * rate quantized to 16⁴ buckets — hex-string comparison is monotone
    * in the hash value, so the predicate needs no integer parsing and
    * replays exactly in any engine. Deterministic sampling is what
    * makes a 100 TB curation step auditable and re-runnable: the same
    * doc is kept on every engine, every run, at every scale (and a
    * re-run after adding data keeps all previously kept docs whose
    * stratum rate didn't shrink).
    *
    * Plan: one tiny per-source aggregate, thresholds broadcast back,
    * per-row predicate, per-source re-aggregate — the corpus is
    * scanned twice but never shuffled.
    */
  def cur07StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy()
    val rates = documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      // The quantized threshold is derived in PURE INTEGER math:
      // thr_raw = (65536·total) div (k·n), clamped at 65536 (= rate 1,
      // which quantizes to 0x10000 — 5 chars, above every 4-char
      // prefix; the thr_raw >= 65536 disjunct below keeps the contract
      // explicit rather than leaning on string-length ordering).
      // floor(rate·65536) of the DOUBLE ratio computes the same value
      // only while no double rounding crosses an integer — the exact
      // hazard class the intRatio sweep removed from presentations,
      // here removed from the keep PREDICATE itself.
      .withColumn("thr_raw",
        least(lit(65536L), intDiv(lit(65536L) * sum("n_docs").over(w),
          count(lit(1)).over(w) * col("n_docs"))))
      .withColumn("thr", format_string("%04x", col("thr_raw").cast("int")))
      // The PRESENTED rate is the exact rational total/(k·n) via
      // intRatio (half-grid-safe).
      .withColumn("sample_rate",
        when(col("thr_raw") >= 65536L, lit(1.0)).otherwise(
          intRatio(sum("n_docs").over(w),
            count(lit(1)).over(w) * col("n_docs"), 6)))
      .select("source", "thr_raw", "thr", "sample_rate")
    documents(spark, dir)
      .join(broadcast(rates), Seq("source"))
      .withColumn("keep",
        col("thr_raw") >= 65536L ||
          substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_sampled"),
        first(col("sample_rate")).as("sample_rate"),
        first(col("thr")).as("thr"))
      .orderBy("source")
  }

  /** Per-source character budget for cur08 — binds at roughly half of
    * every source's mass in the test corpus, so the greedy prefix is a
    * real cut everywhere (a budget nothing reaches would test nothing).
    */
  val SourceCharBudget = 4000L

  /** cur08: EXACT budgeted assembly — cut each source's corpus down to a
    * fixed character budget, the final step of building a training mix
    * ("these weights, this total token count"). cur07 executes a RATE
    * (keep x% of a stratum); this executes a QUOTA: docs are taken in
    * deterministic md5 order (the same engine-portable, re-runnable
    * ordering as cur01/cur07) until the source's running character sum
    * would exceed the budget.
    *
    * Shape: ONE source-partitioned window cumsum (docs sort within
    * their source by an 8-hex-char key), then a tiny per-source rollup.
    * At 100 TB the per-source sort is the honest cost of EXACT-prefix
    * semantics; when approximate budgets suffice, the sort drops away:
    * bucket the hash key (256 prefixes), pick the largest bucket prefix
    * whose cumulative chars fit (a driver-side scalar decision off a
    * tiny histogram — the cur07 rate-threshold trick), and accept a
    * one-bucket overshoot bound. Same protocol, no sort; the window
    * form here IS the oracle for that refinement.
    */
  def cur08BudgetAssembly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        substring(md5(col("doc_id").cast("string")), 1, 8).as("hk"))
      .withColumn("cum", sum("n_chars").over(w))
      .filter(col("cum") <= SourceCharBudget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").as("chars_kept"),
        intRatio(sum("n_chars"), lit(SourceCharBudget), 4)
          .as("utilization"))
      .orderBy("source")
  }

  /** cur21: SORT-FREE budgeted assembly — the refinement cur08's own
    * doc paragraph prices: when approximate budgets suffice, the
    * per-source window sort drops away. Docs bucket by the first two
    * hex chars of the SAME md5 key cur08 orders by (256 buckets — a
    * coarse prefix of the exact order), the per-(source, bucket) char
    * histogram is ONE partial-aggregated groupBy (the only corpus-wide
    * op), the cut is the largest bucket prefix whose cumulative chars
    * fit the budget (a window over the ≤256-row histogram — dim-sized,
    * etl03's contract, never the corpus), and selection is a
    * broadcast-joined per-row predicate. Sources where not even the
    * first bucket fits report `bucket_cut = -1` and keep nothing.
    *
    * The trade, exactly priced: the kept set is a PREFIX of cur08's
    * exact kept set truncated at a bucket boundary (same hash, coarser
    * granularity), so `chars_kept(cur21) ≤ chars_kept(cur08) ≤ budget`
    * with undershoot bounded by one bucket's mass — ~1/256 of a
    * source under the uniform hash. Spec-pinned against cur08
    * side-by-side; the exact window form IS this operator's oracle of
    * record for the protocol. At 100 TB: histogram rows = sources ×
    * 256 regardless of corpus size; no corpus sort anywhere.
    */
  def cur21HistogramBudget(spark: SparkSession, dir: String): DataFrame =
    histogramBudget(documents(spark, dir), SourceCharBudget)

  /** Core of cur21 over any (doc_id, source, n_chars) frame —
    * separable so the spec can drive the degenerate arm (a source
    * whose FIRST bucket alone exceeds the budget keeps nothing,
    * `bucket_cut = -1`), which the test corpus never reaches (its
    * per-bucket mass is far under the budget).
    */
  private[graft] def histogramBudget(
      docsIn: DataFrame, budget: Long): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), col("source"), col("n_chars"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int").as("bucket"))
    val wb = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = docs.groupBy("source", "bucket")
      .agg(sum("n_chars").as("bchars"))
      .withColumn("cum", sum("bchars").over(wb))
      .filter(col("cum") <= budget)
      .groupBy("source")
      .agg(max("bucket").as("bucket_cut"))
    val keep = col("bucket") <= col("bc")
    docs.join(broadcast(cuts), Seq("source"), "left")
      .withColumn("bc", coalesce(col("bucket_cut"), lit(-1)))
      .groupBy("source")
      .agg(first("bc").as("bucket_cut"),
        sum(keep.cast("long")).as("n_kept"),
        coalesce(sum(when(keep, col("n_chars"))), lit(0L)).as("chars_kept"),
        intRatio(coalesce(sum(when(keep, col("n_chars"))), lit(0L)),
          lit(budget), 4).as("utilization"))
      .orderBy("source")
  }

  /** Context window for cur09's packing, in characters — the proxy the
    * synthetic corpus supports; a deployment swaps in a token count
    * (text08's BPE counter) without changing the protocol.
    */
  val CtxChars = 2048L

  /** cur09: SEQUENCE PACKING — the step that turns a curated corpus
    * into fixed-length training sequences: documents are concatenated
    * in a deterministic order and the stream is cut every [[CtxChars]]
    * characters (GPT-style concat-and-chunk packing; a document
    * straddling a cut is split across two sequences). Reported per
    * source: how many sequences the corpus packs into, how many
    * documents get split by a boundary, and the packing density —
    * the numbers that size a training run.
    *
    * Order is the engine-portable md5 key of cur01/cur07/cur08, so the
    * packing is reproducible run-over-run and auditable. Packing is
    * WITHIN source (the window partitions by source): a single global
    * concatenation order would serialize the whole corpus through one
    * partition, whereas per-source streams pack independently and in
    * parallel — and training-mix assembly wants per-source shard
    * streams anyway. At 100 TB each source's window cumsum is a range
    * sort over that source only — the honest cost of exact boundary
    * placement, same posture as cur08's exact budget prefix.
    */
  def cur09SequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePackStats(documents(spark, dir))

  /** Core of cur09 over any (doc_id, source, n_chars) frame — separable
    * so the spec can replay a known corpus locally.
    */
  private[graft] def sequencePackStats(docs: DataFrame): DataFrame = {
    val k = lit(CtxChars)
    sequencePackPositions(docs, CtxChars)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        floor((max("cum_end") + (CtxChars - 1)) / k).as("n_sequences"),
        sum((col("seq_last") > col("seq_first")).cast("long")).as("n_split_docs"),
        intRatio(count(lit(1)),
          floor((max("cum_end") + (CtxChars - 1)) / k), 4).as("docs_per_seq"))
      .orderBy("source")
  }

  /** Per-document packing positions over any (doc_id, source, n_chars)
    * frame: the source's window cumsum in the engine-portable md5
    * order, each doc's first/last sequence index and the cut flag —
    * the per-doc frame cur09's rollup aggregates, and the batch truth
    * stream19's cursor state must reproduce (one definition of the
    * boundary math). `unit` is the chunk size (cur09 packs by chars;
    * the streaming twin packs post-scrub token counts — same formula).
    */
  private[graft] def sequencePackPositions(
      docs: DataFrame, unit: Long): DataFrame = {
    val k = lit(unit)
    val w = Window.partitionBy("source")
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        substring(md5(col("doc_id").cast("string")), 1, 8).as("hk"))
      .withColumn("cum_end", sum("n_chars").over(w))
      // A doc occupies sequences floor(start/k) .. floor((end-1)/k) of
      // its source's concatenated stream; it is split iff those differ.
      .withColumn("seq_first", floor((col("cum_end") - col("n_chars")) / k))
      .withColumn("seq_last", floor((col("cum_end") - 1) / k))
  }

  /** Keep fraction for cur10/cur22's per-source quality selection, as
    * an EXACT RATIONAL (3/10). The keep target is derived in pure
    * integer arithmetic — ceil(Num·n / Den) = (Num·n + Den−1) div Den,
    * the intRatio discipline — on BOTH the engine and oracle sides
    * (round-15 ADVICE: `ceil(n · 0.3)` agreed with the oracle only
    * because the 0.3 double literal under-approximates 3/10 and both
    * engines share IEEE semantics; integer-boundary counts must not
    * depend on an FP rounding direction).
    */
  val QualityKeepNum = 3L
  val QualityKeepDen = 10L

  /** ceil([[QualityKeepNum]]·n / [[QualityKeepDen]]) in Long math —
    * the ONE definition of the per-source keep target for cur10 and
    * cur22 (and the SQL interpolation below mirrors it digit-for-digit
    * in `//` arithmetic).
    */
  private[graft] def keepTarget(n: org.apache.spark.sql.Column) =
    intDiv(n * QualityKeepNum + (QualityKeepDen - 1), lit(QualityKeepDen))

  /** The target as a DuckDB expression over a count expression string —
    * interpolated into the cur10/cur22 oracles (etl27's shared-constant
    * discipline, so a fraction change cannot drift the two sides).
    */
  private[graft] def keepTargetSql(n: String): String =
    s"(($n) * $QualityKeepNum + ${QualityKeepDen - 1}) // $QualityKeepDen"

  /** cur10: PERCENTILE quality selection — keep each source's top 30%
    * by quality score (FineWeb-style "take the best slice of every
    * source" curation, vs cur04's absolute thresholds, which keep
    * whatever fraction happens to clear them). The score is text02's
    * quality_score (rounded to 4 dp BEFORE ranking, with doc_id as the
    * tiebreak, so the cut is engine-stable); the per-source cutoff is
    * exact: rank ≤ ceil(keep_frac × n).
    *
    * Scale: the per-source rank is a window sort over each source —
    * exact-percentile semantics cost a sort, the same posture as
    * cur08's exact prefix. The sort-free refinement at 100 TB is an
    * `approx_percentile(q, 1-frac)` threshold broadcast back as a
    * per-row predicate (cur07's rate-threshold trick); this exact form
    * is that refinement's oracle.
    */
  def cur10QualitySelect(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    // The cut selects on EXACTLY text02's score — one shared definition.
    val score = TextAnalysis.qualityScore(toks)
    val wRank = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    val wSrc = Window.partitionBy("source")
    documents(spark, dir)
      .select(col("doc_id"), col("source"), score.as("q"))
      .withColumn("keep", row_number().over(wRank) <=
        keepTarget(count(lit(1)).over(wSrc)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        // q values are 4-dp decimals: min re-presents one of them
        // (grid point, engine-stable); the MEAN is a fresh rational —
        // micro-sum + integer half-up division (the text11 protocol).
        round(min(when(col("keep"), col("q"))), 4).as("min_kept_score"),
        sum(when(col("keep"), round(col("q") * 10000).cast("long")))
          .as("qm"),
        sum(col("keep").cast("long")).as("nk"))
      .withColumn("avg_kept_score", intRatio(col("qm"), col("nk"), 0) / 10000.0)
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("min_kept_score"), col("avg_kept_score"))
      .orderBy("source")
  }

  /** cur22: SORT-FREE percentile selection — the refinement cur10's
    * doc paragraph prices, landed with cur21's discipline: the
    * per-source rank window (a corpus sort) drops away. Scores live
    * on text02's 4-dp grid already, so the quantized score IS the
    * histogram bucket: one partial-aggregated (source, qi) count, the
    * cut as a window over the ≤10⁴-row-per-source histogram (the
    * HIGHEST score bucket prefix whose cumulative count fits
    * ceil(keep_frac·n) — dim-sized, never the corpus), selection a
    * broadcast-joined per-row predicate. Sources whose top bucket
    * alone exceeds the target keep nothing (`cut_score` null).
    *
    * The trade, exactly priced: every kept doc scores strictly ABOVE
    * every dropped cur10 doc, so the kept set is a subset of cur10's
    * exact keep (rank ≤ target implies bucket-cumulative ≤ target)
    * with undershoot bounded by one score-bucket's doc mass —
    * spec-pinned side-by-side with cur10, whose exact window form is
    * the oracle of record for the protocol. At 100 TB the histogram
    * is sources × ≤10⁴ rows at any corpus size.
    */
  def cur22HistogramSelect(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    // EXACTLY text02/cur10's score, on its own 4-dp integer grid.
    val score = TextAnalysis.qualityScore(toks)
    histogramSelect(documents(spark, dir)
      .select(col("doc_id"), col("source"),
        round(score * 10000).cast("long").as("qi")))
  }

  /** Core of cur22 over any (doc_id, source, qi) frame — separable so
    * the spec can drive the degenerate arm (a source whose TOP score
    * bucket alone exceeds the target keeps nothing, `cut_score` null),
    * which the test corpus never reaches (its scores are near-unique).
    */
  private[graft] def histogramSelect(scored: DataFrame): DataFrame = {
    val wh = Window.partitionBy("source").orderBy(col("qi").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wsrc = Window.partitionBy("source")
    val cuts = scored.groupBy("source", "qi")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wh))
      .withColumn("n", sum("c").over(wsrc))
      .filter(col("cum") <= keepTarget(col("n")))
      .groupBy("source")
      .agg(min("qi").as("cut_qi"))
    val keep = col("qi") >= coalesce(col("cut_qi"), lit(10001L))
    scored.join(broadcast(cuts), Seq("source"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        keepTarget(count(lit(1))).as("target"),
        (first(col("cut_qi")) / 10000.0).as("cut_score"),
        sum(keep.cast("long")).as("n_kept"),
        intRatio(sum(keep.cast("long")), count(lit(1)), 4).as("kept_frac"))
      .orderBy("source")
  }

  /** cur11: deterministic TRAIN/VAL/TEST split — the assignment every
    * dataset build ships with its data: each document lands in a split
    * by its md5 hash bucket (first 4 hex chars, 90/5/5 by hex range),
    * so membership is engine-portable, reproducible at any scale, and
    * STABLE under corpus growth (a doc never migrates when new data
    * arrives — the property random split assignment cannot give, and
    * the reason eval contamination audits can trust the test set).
    * Stratification needs no machinery: the hash is uniform within
    * every source, so each stratum splits ~90/5/5 automatically — the
    * per-(source, split) report makes that auditable.
    *
    * One scan, per-row predicate, one tiny aggregate — the corpus is
    * never shuffled (cur01/cur07's posture).
    */
  def cur11TrainSplit(spark: SparkSession, dir: String): DataFrame = {
    // 90/5/5 by hex prefix: [0000, e666) train, [e666, f333) val,
    // [f333, ffff] test — monotone string compare, no integer parsing.
    val hk = substring(md5(col("doc_id").cast("string")), 1, 4)
    documents(spark, dir)
      .withColumn("split",
        when(hk < "e666", "train").when(hk < "f333", "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_total"))
      .orderBy("source", "split")
  }

  /** cur12: CLUSTER-BALANCED sampling — deterministic downsampling to a
    * uniform SEMANTIC mix, where the strata are the k-means cells of
    * the trained codebook ([[Similarity.trainedCodebook]] — the same
    * centroids the sim03/06/08 indexes search). cur07 balances the mix
    * over a metadata column (source); this balances it over learned
    * embedding-space structure: over-represented topics downsample,
    * rare topics survive intact — the diversity pass a pre-training
    * build runs after semantic dedup (dedup09 drops copies; this
    * levels what remains).
    *
    * Selection protocol = cur07's engine-portable contract verbatim:
    * per-cell rate = min(1, uniform-target / cell-share), quantized to
    * 16⁴ buckets, a vector kept iff its md5 hex prefix sorts below the
    * threshold — deterministic, auditable, re-runnable on any engine.
    * Plan: zero-shuffle literal-codebook cell assignment, one tiny
    * per-cell aggregate, rates broadcast back, per-row predicate,
    * per-cell rollup — the corpus never shuffles.
    */
  def cur12ClusterSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy()
    val assigned = Similarity.ivfAssigned(
        Dedup.vectors(spark, dir), Similarity.trainedCodebook(spark, dir))
      .select(col("vec_id"), col("cell").cast("int").as("cell"))
    val rates = assigned.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
      // Integer threshold derivation — cur07's protocol (see there for
      // why floor(double·65536) is not engine-portable).
      .withColumn("thr_raw",
        least(lit(65536L), intDiv(lit(65536L) * sum("n_vecs").over(w),
          count(lit(1)).over(w) * col("n_vecs"))))
      .withColumn("thr", format_string("%04x", col("thr_raw").cast("int")))
      // Presented rate via intRatio — cur07's half-grid-safe protocol.
      .withColumn("sample_rate",
        when(col("thr_raw") >= 65536L, lit(1.0)).otherwise(
          intRatio(sum("n_vecs").over(w),
            count(lit(1)).over(w) * col("n_vecs"), 6)))
      .select("cell", "thr_raw", "thr", "sample_rate")
    assigned.join(broadcast(rates), Seq("cell"))
      .withColumn("keep",
        col("thr_raw") >= 65536L ||
          substring(md5(col("vec_id").cast("string")), 1, 4) < col("thr"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("keep").cast("long")).as("n_sampled"),
        first(col("sample_rate")).as("sample_rate"),
        first(col("thr")).as("thr"))
      .orderBy("cell")
  }

  /** cur06: the END-TO-END curation pipeline — the composed flow every
    * pre-training data build runs, staged exactly as production
    * pipelines stage it (cheapest filter first, most expensive last):
    *
    *  1. split off the held-out benchmark corpus (`src0`);
    *  2. quality gate (cur04's C4-style predicate);
    *  3. exact dedup among survivors (dedup01's normalized fingerprint,
    *     min-id keeper);
    *  4. near-dup drop: the LSH-verified Jaccard≥0.8 pairs (dedup03 —
    *     candidates only ever flow through the banded equi-join) drop
    *     the larger doc of any pair whose BOTH endpoints survived
    *     stage 3. Pair-endpoint membership is evaluated against the
    *     stage-3 set, so the policy is deterministic and
    *     order-independent (no transitive chaining);
    *  5. contamination mask: cur03's shingle-overlap evidence against
    *     the benchmark corpus removes leaked docs.
    *
    * Execution shape at corpus scale: ONE corpus shuffle total — the
    * fingerprint window that elects exact-dup keepers, whose thin
    * marked projection is persisted through [[graft.GraftCache]] so its
    * three consumers share one materialization. Every other stage is a
    * per-row predicate or a BROADCAST mark: the near-dup pair list and
    * the contamination set are tiny (true-duplicate evidence only), so
    * endpoint-membership checks stream the thin id projection against
    * the broadcast pair list instead of shuffling the corpus by doc_id.
    * The heavy inputs (shingle frame, verified pair set) also come from
    * the registry, shared with dedup02/03/06 and cur03 in the session.
    */
  /** The funnel's quality + exact-dedup stage frame, shared by cur06
    * and cur18 (ONE definition, one GraftCache pin — the two composed
    * pipelines can never disagree on stages 1–3). Exact-dup keeper
    * election runs inline: within each normalized content fingerprint
    * (dedup01's contract), rank quality survivors first, then by
    * doc_id — row 1 is the min-id quality keeper iff it is itself a
    * quality survivor. One window shuffle on fp; no groupBy +
    * corpus-sized semi-join back. Persisted THIN (text and fp
    * dropped): the id projections for the pair-membership checks and
    * the final marked aggregates all branch from this one frame —
    * without the pin, each branch would re-scan, re-tokenize and
    * re-run the fp window (2–3 corpus shuffles where the design
    * promises one). Carries n_toks for cur18's post-scrub packing.
    */
  private[graft] def cur06Flagged(spark: SparkSession, dir: String): DataFrame = {
    val toksC = tokens(col("text"))
    val stopRatio = TextAnalysis.stopRatio(toksC, langProfiles("en"))
    val wFp = Window.partitionBy("fp")
      .orderBy(col("q_keep").desc, col("doc_id"))
    graft.GraftCache.getOrPersist(
      s"cur06.flagged:$dir:${graft.GraftCache.sessionTag(spark)}") {
      documents(spark, dir)
        .filter(col("source") =!= "src0")
        .withColumn("q_keep",
          (col("n_chars") >= 100) && (size(toksC) >= 20) && (stopRatio >= 0.02))
        .withColumn("fp", md5(lower(regexp_replace(col("text"), "\\s+", " "))))
        .withColumn("is_keeper",
          col("q_keep") && row_number().over(wFp) === 1)
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(toksC).cast("long").as("n_toks"),
          col("q_keep"), col("is_keeper"))
    }
  }

  /** The funnel's near-dup drop set (stage 4), shared by cur06/cur18:
    * the LSH-verified Jaccard≥0.8 pairs (dedup03 — candidates only ever
    * flow through the banded equi-join) drop the larger doc of any pair
    * whose BOTH endpoints survived the exact-dedup stage. The pair list
    * is small: stream the thin id set against it (broadcast) twice to
    * demand both endpoints be stage-3 members, never shuffling ids by
    * doc_id. Endpoint membership is evaluated against the stage-3 set,
    * so the policy is deterministic and order-independent (no
    * transitive chaining).
    */
  private def nearDupDrops(spark: SparkSession, dir: String,
      flagged: DataFrame): DataFrame = {
    val s2ids = flagged.filter(col("is_keeper")).select("doc_id")
    val ndPairs = Dedup.dedup03MinhashLsh(spark, dir).select("da", "db")
    val pairsDaIn = s2ids
      .join(broadcast(ndPairs), col("doc_id") === col("da"))
      .select("da", "db")
    s2ids
      .join(broadcast(pairsDaIn), col("doc_id") === col("db"))
      .select(col("db").as("doc_id")).distinct()
  }

  def cur06CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val flagged = cur06Flagged(spark, dir)
    val dropNd = nearDupDrops(spark, dir, flagged)
    val contaminated = cur03Contamination(spark, dir)
      .select(col("train_id").as("doc_id"))
    val marked = flagged
      .join(broadcast(dropNd.withColumn("nd_drop", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(contaminated.withColumn("contam", lit(true))), Seq("doc_id"), "left")
      .select(col("source"), col("n_chars"), col("q_keep"),
        col("is_keeper"),
        coalesce(col("nd_drop"), lit(false)).as("nd_drop"),
        coalesce(col("contam"), lit(false)).as("contam"))
    val inS2 = col("is_keeper")
    val inS3 = inS2 && !col("nd_drop")
    val inS4 = inS3 && !col("contam")
    marked.groupBy("source")
      .agg(
        count(lit(1)).as("n_input"),
        sum(col("q_keep").cast("long")).as("n_quality"),
        sum(inS2.cast("long")).as("n_exact"),
        sum(inS3.cast("long")).as("n_neardup"),
        sum(inS4.cast("long")).as("n_final"),
        coalesce(sum(when(inS4, col("n_chars"))), lit(0L)).cast("long")
          .as("chars_final"))
      .orderBy("source")
  }

  /** Feature-hash buckets for cur13's importance model. Coarse on
    * purpose: collisions are the METHOD (DSIR's hashed n-gram trick —
    * the model is a fixed-size table however large the vocabulary), and
    * at 256 buckets the test corpus exercises real collision behavior.
    */
  val ImportanceBuckets = 256

  /** Scale of cur13's fixed-point likelihood ratios (6 implied
    * decimals — the same presentation grid as intRatio at dp=6).
    */
  val ImportanceScale = 1000000L

  /** cur13: DATA-SELECTION importance weights (DSIR-style — Xie et al.
    * 2023's "Data Selection for Language Models via Importance
    * Resampling", arXiv:2302.03169): score every raw document by how
    * much more likely its tokens are under a TARGET distribution (the
    * high-quality/benchmark-like subset — here source `src0`, cur03's
    * held-out set) than under the RAW pool, using hashed unigram
    * bucket frequencies as the feature model. Each source's top 20% by
    * average per-token likelihood ratio — the docs that most "look
    * like the target" — are selected: the importance-resampling step
    * that picks pretraining data matching a trusted distribution. The
    * cut is a corpus QUANTILE, not a fixed ratio threshold: scores
    * concentrate tightly around 1.0 (measured: a 1.0 gate kept 0 of
    * 475 raw docs at sf0.01 and 186 of 4,750 at sf0.1 — a cliff), so
    * a relative cut is what makes the selection size predictable at
    * any scale, the same reasoning as cur10's FineWeb percentile cut.
    *
    * Engine-exact by construction: every per-token ratio is an
    * integer-divided fixed-point value (add-one smoothed, DECIMAL(38,0)
    * intermediates so 100 TB token counts cannot wrap), and a
    * document's score is a SUM OF LONGS — associative, so partial
    * aggregation order can never flip a bit, unlike a sum of float
    * log-probs. The DuckDB oracle replays the arithmetic verbatim on
    * HUGEINT.
    *
    * Plan shape: one token scan builds the 256-bucket frequency table
    * (map-side partial counts, the shuffle carries |buckets| rows);
    * the scored scan equi-joins tokens to the broadcast bucket table
    * and sums per doc. At 100 TB both scans stream; the model — like
    * every codebook in this repo — is O(buckets) however large the
    * corpus, and would be persisted once and reused across selection
    * runs.
    */
  /** The (doc_id, source, bkt) hashed-unigram stream shared by cur13's
    * DSIR frequency model and cur15's classifier features — one hashing
    * convention ([[ImportanceBuckets]] buckets of tokenHash64), one
    * definition.
    */
  private def hashedTokenBuckets(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("source"),
        pmod(tokenHash64(col("t")), lit(ImportanceBuckets.toLong)).as("bkt"))

  def cur13ImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val b = ImportanceBuckets
    val th = hashedTokenBuckets(spark, dir)
    val isTarget = col("source") === "src0"
    val stats = th.groupBy("bkt").agg(
      sum(isTarget.cast("long")).as("ct"),
      sum((!isTarget).cast("long")).as("cr"))
    val w = Window.partitionBy()
    // ratio_scaled = ⌊scale·(ct+1)·(Tr+B) / ((cr+1)·(Tt+B))⌋ — add-one
    // smoothing over B buckets; numerator/denominator in DECIMAL(38,0)
    // (1e6·count·count reaches ~1e30 at 100 TB — far past Long).
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val weights = stats
      .withColumn("tt", sum("ct").over(w))
      .withColumn("tr", sum("cr").over(w))
      .select(col("bkt"),
        intDivBig(
          dec(lit(ImportanceScale)) * dec(col("ct") + 1) * dec(col("tr") + b),
          dec(col("cr") + 1) * dec(col("tt") + b)).as("ws"))
    // Per-SOURCE rank window (cur10's shape): partitioned by source so
    // no global single-partition sort exists; at 100 TB the exact
    // per-source top-20% becomes an approx-quantile threshold plus a
    // per-row predicate, the refinement cur10 documents.
    val wSrc = Window.partitionBy("source")
      .orderBy(col("avg_scaled").desc, col("doc_id"))
    val nSrc = Window.partitionBy("source")
    th.filter(!isTarget)
      .join(broadcast(weights), Seq("bkt"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_toks"), sum("ws").as("s"))
      .withColumn("avg_scaled", intDiv(col("s"), col("n_toks")))
      .withColumn("rk", row_number().over(wSrc))
      .withColumn("n_src", count(lit(1)).over(nSrc))
      .filter(col("rk") <= intDiv(col("n_src") + 4, lit(5)))
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("avg_scaled") / ImportanceScale.toDouble).as("avg_ratio"))
      .orderBy("doc_id")
  }

  /** cur14 parameters: the training budget is [[EpochBudgetMult]]× the
    * corpus' total tokens (so repeats are REQUIRED — the data-
    * constrained regime), per-source repeats cap at [[MaxEpochs]], and
    * the e-th epoch of a source is worth its token mass halved (e−1)
    * times — an integer-shift stand-in for the diminishing value of
    * repeated data (Muennighoff et al. 2023, arXiv:2305.16264, find
    * ~4 epochs nearly free and rapid decay after; halving is the
    * deterministic caricature both engines replay bit-for-bit).
    */
  val MaxEpochs = 8
  val EpochBudgetMult = 2L

  /** cur14: EPOCH / REPEAT SCHEDULING under a token budget — the
    * data-constrained allocation step (Muennighoff et al. 2023): when
    * the budget exceeds the unique corpus, which sources get repeated,
    * and how many times? Greedy marginal-utility water-filling: every
    * (source, epoch) candidate is valued at `src_tokens >> (epoch−1)`,
    * candidates are ranked by value (ties: source, epoch — so a
    * source's epochs stay in order), and the budget admits the ranked
    * prefix whose running token cost fits. High-value small sources
    * repeat many times; a huge low-value source may not even finish
    * epoch 2 — exactly the mixture a budgeted pre-training run makes.
    *
    * Scale shape: ONE corpus scan builds the per-source token masses
    * (map-side partial sums over `size(split())` — no explode); all
    * downstream logic runs on the #sources×[[MaxEpochs]] candidate
    * grid, which is O(#sources) — the cur02 contract — so the
    * unpartitioned rank/cumsum windows sort dozens of rows, never
    * corpus rows. Integer shifts and sums throughout: no float enters
    * the decision, so partial-agg order can never flip an allocation.
    */
  /** cur15 protocol constants — shared with the generated oracle in
    * [[graft.SparkEntry]] (the text17/etl27 discipline): training
    * iteration count, fixed-point scale (6 implied decimals, the
    * intRatio grid), the learning-rate divisor (one gradient step =
    * `gradient // (Cur15Rate × n_docs)` — ≈ mean per-doc gradient over
    * Cur15Rate), and the reserved bias feature bucket.
    */
  val Cur15Iters = 8
  val Cur15Scale = 1000000L
  val Cur15Rate = 16L
  val Cur15Bias = -1L

  /** cur15's feature frame: per-doc hashed-unigram bucket COUNTS
    * (cur13's 256-bucket tokenHash64 convention — collisions are the
    * method, the model stays O(buckets) at any vocabulary) plus one
    * bias row per document, labeled y = 1 for the target corpus
    * (`src0`, cur03/cur13's held-out set). Persisted via GraftCache:
    * every training round aggregates it twice.
    */
  private def cur15Features(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"cur15.feat:$dir:${graft.GraftCache.sessionTag(spark)}") {
      hashedTokenBuckets(spark, dir)
        .groupBy("doc_id", "source", "bkt")
        .agg(count(lit(1)).as("x"))
        .unionByName(documents(spark, dir)
          .select(col("doc_id"), col("source"),
            lit(Cur15Bias).as("bkt"), lit(1L).as("x")))
        .withColumn("y", (col("source") === "src0").cast("long"))
    }

  /** The ALGEBRAIC sigmoid in fixed point: for a margin `m` in scale S,
    * σ(m/S)·S ≈ (S·(S + |m| + m)) div (2·(S + |m|)) — the rational
    * "fast sigmoid" x/(1+|x|) link, range (0, S), σ(0) = S/2. Chosen
    * over exp() deliberately: the numerator is non-negative by
    * construction, so the whole link is one non-negative integer
    * division that BOTH engines evaluate bit-identically at any
    * magnitude — a transcendental sigmoid would hang engine equality
    * on last-ulp exp() agreement across libm implementations, the
    * float-protocol hazard this repo's fixed-point training protocols
    * (sim09, text17, cur13) exist to avoid. Gradient descent under
    * this link trains the same discriminative shape (it is logistic
    * regression with a longer-tailed rational CDF).
    */
  private def sigmoidFx(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // DECIMAL(38,0) BEFORE any multiply: S·(S + |m| + m) in Long wraps
    // silently once |m| passes ~4.6e12 — margins a strongly separable
    // 100 TB corpus can genuinely reach — while the DuckDB twin's
    // HUGEINT stays exact (the divergence the bit-identical claim
    // forbids).
    val md = m.cast("decimal(38,0)")
    val s = lit(Cur15Scale).cast("decimal(38,0)")
    intDivBig(s * (s + abs(md) + md),
      lit(2L).cast("decimal(38,0)") * (s + abs(md)))
  }

  /** The weight table as a broadcastable frame with DECIMAL(38,0)
    * weights — Long would truncate a weight past 9.2e18 and, more
    * practically, force the margin dot product through Long multiplies
    * (see [[sigmoidFx]]'s overflow note).
    */
  private def weightFrame(spark: SparkSession, w: Map[Long, BigInt]): DataFrame = {
    import spark.implicits._
    w.toSeq.map { case (b, wg) => (b, wg.toString) }.toDF("bkt", "wgt_s")
      .select(col("bkt"), col("wgt_s").cast("decimal(38,0)").as("wgt"))
  }

  /** Trained classifier weights, one table per (dir, session) — the
    * text17 trainedMerges pattern: the Cur15Iters-round loop runs once
    * however many consumers ask; eviction on GraftCache.release().
    * Returns (n_docs, bkt → weight in scale-S fixed point as BigInt —
    * BigInt so the 100 TB gradient sums the aggregation carries in
    * DECIMAL(38,0) never wrap on the driver either).
    */
  private val cur15Cache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Map[Long, BigInt])]()
  graft.GraftCache.onRelease(() => cur15Cache.clear())

  private[graft] def trainedCur15(spark: SparkSession, dir: String)
      : (Long, Map[Long, BigInt]) =
    cur15Cache.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => {
        val feat = cur15Features(spark, dir)
        val n = documents(spark, dir).count()
        var w = Map.empty[Long, BigInt]
        for (_ <- 1 to Cur15Iters) {
          val wdf = weightFrame(spark, w)
          // Per-doc margin against the broadcast weight table (absent
          // bucket = weight 0), then the fixed-point link. All decimal:
          // x·w products and their sum can carry corpus-scale counts
          // times grown weights without a Long wrap anywhere.
          val zero = lit(0L).cast("decimal(38,0)")
          val p = feat.join(broadcast(wdf), Seq("bkt"), "left")
            .groupBy("doc_id")
            .agg(max("y").as("y"),
              sum(col("x") * coalesce(col("wgt"), zero)).as("m"))
            .withColumn("p", sigmoidFx(col("m")))
          // Batch gradient per bucket: Σ_docs (p − y·S)·x — a sum of
          // integer products (associative, order-free), DECIMAL(38,0)
          // operands BEFORE the multiply so corpus-scale products
          // cannot wrap. O(buckets) rows to the driver — the
          // sim09/text17 scalar contract.
          val grads = feat.join(p.select("doc_id", "p"), Seq("doc_id"))
            .groupBy("bkt")
            .agg(sum((col("p") - col("y") * Cur15Scale).cast("decimal(38,0)")
              * col("x")).as("g"))
            .collect()
          val div = BigInt(Cur15Rate) * BigInt(n)
          w = grads.foldLeft(w) { (acc, r) =>
            val bkt = r.getLong(0)
            val g = BigInt(r.getDecimal(1).toBigInteger)
            // BigInt / truncates toward zero — the same semantics as
            // Spark's IntegralDivide and DuckDB's //, so all three
            // arithmetics agree on negative gradients.
            acc.updated(bkt, acc.getOrElse(bkt, BigInt(0)) - g / div)
          }
        }
        (n, w)
      })

  /** cur15: TRAINED QUALITY CLASSIFIER — the discriminative sibling of
    * cur13's DSIR ratio (the fastText-style classifier FineWeb/CCNet
    * pipelines ship): logistic regression over hashed bag-of-words
    * features, trained IN-ENGINE by [[Cur15Iters]] rounds of batch
    * gradient descent against the target-vs-raw label, then scored
    * corpus-wide. Every round is ONE pass over the persisted feature
    * frame (margin aggregate + gradient aggregate) with an O(buckets)
    * collect — the model, like every codebook in this repo, is
    * O(buckets) however large the corpus, and at 100 TB would be
    * persisted once and reused across selection runs.
    *
    * Engine-exact by construction (the cur13 posture, extended to
    * TRAINING): margins are integer dot products, the sigmoid link is
    * algebraic fixed point ([[sigmoidFx]]), gradients are sums of
    * integer products in DECIMAL(38,0), and each weight update is one
    * truncating integer division — no float enters the trajectory, so
    * the DuckDB oracle replays all [[Cur15Iters]] rounds value-for-
    * value through a generated CTE chain (a wrong gradient in round r
    * cascades into every later round and breaks the hash).
    *
    * Output: the raw (non-target) pool scored with the final weights;
    * keep = score strictly above the pool's MEAN score — a corpus
    * statistic computed as one exact integer division (a scalar, so
    * the keep predicate is a broadcast threshold: cur07's shape, no
    * global sort at any scale) — reported as per-source keep rates
    * with the pool-mean-normalized average score.
    */
  def cur15QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val (_, w) = trainedCur15(spark, dir)
    // Pinned via GraftCache (round-20 optimization): the scored frame
    // is consumed TWICE — once for the pool-mean scalar, once for the
    // final per-source rollup — and was recomputed (join + per-doc
    // aggregate over the whole feature frame) for each. The pin is the
    // repo's standard shared-intermediate pattern; the frame is thin
    // (doc_id, source, p) and deterministic per (dir, session) since
    // the trained weights are.
    val scored = graft.GraftCache.getOrPersist(
      s"cur15.scored:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val wdf = weightFrame(spark, w)
      cur15Features(spark, dir)
        .filter(col("y") === 0)
        .join(broadcast(wdf), Seq("bkt"), "left")
        .groupBy("doc_id", "source")
        .agg(sum(col("x") * coalesce(col("wgt"), lit(0L).cast("decimal(38,0)")))
          .as("m"))
        .withColumn("p", sigmoidFx(col("m")))
        .select("doc_id", "source", "p")
    }
    // Pool-mean threshold: one exact integer scalar (sum_p div n) —
    // the codebook-scalar contract, broadcast back as a literal.
    val t = scored.agg(
      sum(col("p")).cast("decimal(38,0)").as("sp"), count(lit(1)).as("n")).head
    val thr = (BigInt(t.getDecimal(0).toBigInteger) / BigInt(t.getLong(1))).toLong
    scored.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("p") > thr).cast("long")).as("n_kept"),
        intRatio(sum((col("p") > thr).cast("long")), count(lit(1)), 4)
          .as("keep_rate"),
        intRatio(sum(col("p")), count(lit(1)) * Cur15Scale, 6).as("avg_score"))
      .orderBy("source")
  }

  /** cur19: contamination LEAK REPORT by BENCHMARK doc — the reverse
    * axis of cur16: cur16/17 answer "which TRAINING docs carry eval
    * text, and what do we scrub"; the eval-set OWNER asks the
    * transposed question — "which of MY benchmark documents leaked
    * into the corpus, how much of each is compromised, and who is the
    * worst offender?" — the audit behind every "benchmark X is n%
    * contaminated in corpus Y" report (Lee et al. 2022 §6's analysis
    * axis). Per held-out document: its total window count, the number
    * of its OWN window positions found verbatim anywhere in training
    * (the coverage numerator — n_leaked/n_windows IS the doc's
    * compromised fraction), the count of distinct offending training
    * docs, and the top offender (most shared distinct windows,
    * min-id tiebreak). Clean benchmark docs report zeros — absence of
    * evidence is part of the audit.
    *
    * Composition: BOTH sides read the ONE pinned cur16 window frame
    * (zero new tokenize — the grammar literally cannot drift from the
    * scrub's); the cross-split join is hash-keyed (8-byte windows,
    * never strings — dedup08's posture) and its output is
    * contamination-sized (leaked pairs only), so the per-held
    * aggregates and the top-offender window run on a tiny frame. At
    * 100 TB the held side is the small curated side by construction
    * and the train window stream is the same scan cur16 already pays.
    */
  def cur19LeakReport(spark: SparkSession, dir: String): DataFrame =
    leakReport(Dedup.cur16WindowRows(spark, dir),
      documents(spark, dir).filter(col("source") === "src0")
        .select(col("doc_id").as("held_id")),
      col("source") === "src0",
      Some(s"cur19.pairs:$dir:${graft.GraftCache.sessionTag(spark)}"))

  /** Core of cur19 over explicit frames — separable so the spec can
    * drive the short-doc arm (a held doc under the window width has
    * zero windows and must still report a zeros row), which the test
    * corpus never reaches. `pairsKey` pins the leaked-pair frame: it
    * feeds BOTH the per-held aggregate and the top-offender rollup in
    * one plan, and without the pin the held×train probe join executes
    * once per consumer (plan-verified — two BroadcastHashJoin subtrees
    * over the window cache). The frame is contamination-sized, so the
    * pin is tiny at rest. `heldPred` is the ONE definition of "held"
    * for BOTH sides of the window frame (round-15 ADVICE: a hardwired
    * `source === 'src0'` next to an explicit heldDocs parameter was two
    * definitions of held in one core — a caller whose held frame is not
    * labeled src0 would silently get an all-zeros, looks-clean report);
    * the caller states the partition once, and a mislabeled split now
    * shows up as held windows on the wrong side instead of vanishing.
    */
  private[graft] def leakReport(
      w: DataFrame, heldDocs: DataFrame,
      heldPred: org.apache.spark.sql.Column,
      pairsKey: Option[String] = None): DataFrame = {
    val held = w.filter(heldPred)
      .select(col("doc_id").as("held_id"), col("pos"), col("h"))
    val trainH = w.filter(!heldPred)
      .select(col("doc_id").as("train_id"), col("h")).distinct()
    val pairsRaw = held.join(trainH, Seq("h"))
    val pairs = pairsKey.fold(pairsRaw)(k =>
      graft.GraftCache.getOrPersist(k)(pairsRaw))
    val per = pairs.groupBy("held_id").agg(
      countDistinct(col("pos")).as("n_leaked"),
      countDistinct(col("train_id")).as("n_train_docs"))
    val wTop = Window.partitionBy("held_id")
      .orderBy(col("shared").desc, col("train_id"))
    val top = pairs.groupBy("held_id", "train_id")
      .agg(countDistinct(col("h")).as("shared"))
      .withColumn("rk", row_number().over(wTop)).filter(col("rk") === 1)
      .select(col("held_id"), col("train_id").as("top_train_id"),
        col("shared").as("top_shared"))
    // Base = the held-out DOC list, not the window rows: a benchmark
    // doc shorter than the window width has ZERO windows and would
    // otherwise vanish from the report — but "absence of evidence is
    // part of the audit" means every held doc gets a row (n_windows
    // 0, zeros across — it cannot leak what it cannot window, and the
    // report says so in-band instead of omitting the doc).
    heldDocs
      .join(broadcast(held.groupBy("held_id")
        .agg(count(lit(1)).as("nw"))), Seq("held_id"), "left")
      .join(broadcast(per), Seq("held_id"), "left")
      .join(broadcast(top), Seq("held_id"), "left")
      .select(col("held_id"),
        coalesce(col("nw"), lit(0L)).as("n_windows"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("top_train_id"), lit(-1L)).as("top_train_id"),
        coalesce(col("top_shared"), lit(0L)).as("top_shared"))
      .orderBy("held_id")
  }

  /** cur18's decontamination window stream: cur16's grammar run over
    * the POST-BOILERPLATE corpus (the round-15 composition — template
    * mass must come out BEFORE decontamination, so the held-out probe
    * sees the text as it will be packed). The position-remapping
    * surgery this demands is paid only where text actually changed:
    * the boilerplate scrub rewrites ONLY the affected docs (tiny by
    * the nd ≥ [[TextAnalysis.BoilerplateMinDocs]] threshold), so the
    * "extra corpus tokenize" collapses to reusing the pinned RAW
    * window frame for every unaffected doc — byte-identical text ⇒
    * identical windows — and rebuilding windows over the affected
    * docs' cleaned text alone. JUNCTION windows (token runs that
    * become adjacent when a template chunk drops out) exist only in
    * the rebuilt leg, which is the point: a held-out span that
    * materializes at a chunk junction is real contamination of the
    * packed corpus, invisible to any raw-coordinate check.
    *
    * No token can be double-subtracted BY CONSTRUCTION: the
    * boilerplate family removes raw tokens, the contamination family
    * removes POST-boiler tokens — the two live in sequential
    * coordinate systems and are disjoint (a template token no longer
    * exists when the held-out probe runs), so
    * `post = n_toks − boiler_rm − contam_rm` is exact with no
    * interval merge — stronger than merging raw-coordinate span
    * families, which can only deduplicate overlaps it can see and
    * still misses junction spans entirely. Spec-pinned on a corpus
    * whose held-out text overlaps its template mass.
    */
  /** The corpus boilerplate-scrub frame restricted to non-held docs —
    * the ONE definition of "the funnel's scrub evidence" that
    * [[funnelInputs]], [[cur18TrainPayload]] and the pinned span frame
    * below all read. Derived here rather than passed in (round-16
    * review): the span pin is keyed by (session, dir) only, so a
    * scrub PARAMETER would be exactly the explicit-argument-shadowed-
    * by-a-pin trap the leakReport fix removed — a caller passing a
    * different frame would silently receive whichever was built first.
    */
  private[graft] def funnelScrubFrame(
      spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusBoilerplateScrub(spark, dir)
      .filter(col("source") =!= "src0")

  private def postBoilerSpans(spark: SparkSession, dir: String): DataFrame =
    // Pinned per (session, dir): the frame is contamination-sized
    // (tiny at rest) but its derivation pays the affected-doc window
    // rebuild + held probe — and cur18's report, cur20/cur23's emits
    // each re-derive it otherwise (round 16: cur23's payload leg made
    // it a third consumer). The scrub side is [[funnelScrubFrame]] BY
    // DEFINITION — no parameter, so the pin cannot shadow a caller's
    // differing frame; the spec's hand-corpus arm drives
    // [[postBoilerFlaggedSpans]] directly.
    graft.GraftCache.getOrPersist(
      s"cur18.pbSpans:$dir:${graft.GraftCache.sessionTag(spark)}") {
      postBoilerFlaggedSpans(
        Dedup.cur16WindowRows(spark, dir), funnelScrubFrame(spark, dir),
        Dedup.heldOutWindowHashes(spark, dir))
    }

  /** The span core over explicit frames — separable so the spec can
    * drive hand corpora: `rawWindows` = the corpus' raw window rows
    * (doc_id, source, pos, h), `scrub` = the boilerplate-AFFECTED
    * non-held docs with their cleaned text, `held` = the held-out
    * window-hash index.
    */
  private[graft] def postBoilerFlaggedSpans(
      rawWindows: DataFrame, scrub: DataFrame,
      held: DataFrame): DataFrame = {
    val affectedIds = scrub.select("doc_id")
    val unaff = rawWindows.filter(col("source") =!= "src0")
      .join(broadcast(affectedIds), Seq("doc_id"), "left_anti")
      .select("doc_id", "pos", "h")
    val affW = Dedup.strideWindowRows(
        scrub.select(col("doc_id"), col("text_clean").as("text")))
      .select("doc_id", "pos", "h")
    Dedup.mergeWindowIslands(
      unaff.unionByName(affW)
        .join(held.select("h"), Seq("h"), "left_semi")
        .select("doc_id", "pos"))
  }

  /** Context window for cur18's packing stage, in POST-SCRUB tokens.
    * Smaller than cur09's char proxy on purpose: the test corpus packs
    * several documents per sequence at every SF, so the boundary math
    * (split-doc detection, ceil sequence count) is genuinely exercised.
    */
  val Cur18CtxTokens = 128L

  /** cur18: the END-TO-END pretraining-data BUILD — the full funnel a
    * training-data team actually ships, composed from the audited
    * stages and run as ONE flow (the LLM-side twin of the reference's
    * composed pipeline, case_2/Normal.py:100-275, which chains
    * coercion → master upsert → enrichment → merge the same way):
    *
    *  1. quality gate (cur04's C4-style predicate) and exact dedup
    *     (dedup01's fingerprint, min-id quality keeper) — the shared
    *     [[cur06Flagged]] frame, ONE definition with cur06;
    *  2. near-dup drop (dedup03's LSH-verified pairs, both-endpoints
    *     policy) — the shared [[nearDupDrops]] set;
    *  3. BOILERPLATE scrub (text20): template spans (in ≥3 distinct
    *     corpus docs) are removed from every affected doc — the
    *     CCNet/RefinedWeb stage a real build runs BEFORE
    *     decontamination, because template mass inflates every
    *     downstream count and can mask (or fragment) a leaked span.
    *     The shared [[TextAnalysis.corpusBoilerplateScrub]] frame —
    *     ONE definition with the text20 entry;
    *  4. decontamination SCRUB (cur16/cur17) over the POST-BOILER
    *     text: each survivor's contaminated token spans vs the
    *     held-out split are REMOVED (not the document — dropping a doc
    *     for one leaked paragraph wastes the rest). The window hashes
    *     are REBUILT over the scrubbed text ([[postBoilerSpans]] — the
    *     position-remapping surgery), so junction spans flag and no
    *     token can be double-subtracted; every downstream stage sees
    *     POST-BOTH-SCRUBS token counts. Documents scrubbed to zero
    *     tokens drop out;
    *  5. stratified mix (cur07's engine-portable rate protocol), rates
    *     derived from the CLEAN survivor distribution — the funnel
    *     skews the per-source mix, so sampling after the scrub is what
    *     restores the target composition;
    *  6. train/val/test split (cur11's hex ranges) over a SALTED hash:
    *     stage 5 keeps exactly the docs whose md5 prefix sorts below a
    *     threshold, so splitting on the same hash would put every
    *     sampled doc in `train` whenever a rate < 90% binds — the
    *     composition hazard a standalone cur11 never sees. Each
    *     decision hashes its own key domain;
    *  7. sequence packing (cur09's concat-and-chunk) of the TRAIN
    *     split, cut every [[Cur18CtxTokens]] POST-BOTH-SCRUBS tokens —
    *     the stage-interplay contract (packing must size sequences by
    *     what survives BOTH scrubs, not by raw lengths) is what
    *     running the funnel end-to-end tests.
    *
    * Output: per-source audit counts for EVERY stage (the numbers a
    * data-build report ships) plus the train split's packing stats.
    *
    * Plan shape (cur06's posture, extended): stages 1–2 read the one
    * persisted thin frame (its fp window is the only corpus shuffle);
    * the boilerplate frame is tiny (affected docs only) and its
    * removed-token audit joins back BROADCAST; the contamination span
    * frame reuses cur16's pinned window frame for unaffected docs and
    * rebuilds only the affected docs' windows, aggregates per doc
    * (contaminated docs only — tiny) and joins back BROADCAST;
    * sampling thresholds broadcast (cur07's contract); the split is a
    * per-row predicate; packing sorts only the train split within each
    * source (cur09's honest exact-boundary cost). Plan-audited: no
    * corpus-sized shuffle joins, broadcast evidence marks throughout.
    */
  def cur18CorpusBuild(spark: SparkSession, dir: String): DataFrame = {
    val (marked, boilerRm, spans) = funnelInputs(spark, dir)
    val base = marked.groupBy("source").agg(
      count(lit(1)).as("n_input"),
      sum(col("q_keep").cast("long")).as("n_quality"),
      sum(col("is_keeper").cast("long")).as("n_exact"),
      sum(col("surv").cast("long")).as("n_neardup"))
    val stages = buildFromSurvivors(
      marked.filter(col("surv")).select("doc_id", "source", "n_toks"),
      boilerRm, spans)
    base.join(stages, Seq("source"), "left")
      .select(
        col("source") +: Seq("n_input", "n_quality", "n_exact", "n_neardup")
          .map(col) ++:
          Seq("n_boiler", "boiler_toks", "n_contam", "toks_removed",
            "n_clean", "n_sampled", "n_train", "n_val", "n_test",
            "train_toks", "n_sequences", "n_split_docs")
            .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy("source")
  }

  /** The funnel's shared per-doc inputs, ONE assembly for
    * cur18/cur20: `marked` = [[cur06Flagged]] with the near-dup drop
    * verdict (`surv` = survived stages 1–2), `boilerRm` = per
    * boilerplate-affected doc the template tokens removed (raw
    * coordinates), `spans` = contamination spans in POST-BOILER
    * coordinates ([[postBoilerSpans]]).
    */
  private[graft] def funnelInputs(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val flagged = cur06Flagged(spark, dir)
    val dropNd = nearDupDrops(spark, dir, flagged)
    val marked = flagged
      .join(broadcast(dropNd.withColumn("nd_drop", lit(true))), Seq("doc_id"), "left")
      .withColumn("surv",
        col("is_keeper") && !coalesce(col("nd_drop"), lit(false)))
    val boilerRm = funnelScrubFrame(spark, dir).select(col("doc_id"),
      (col("tokens_before") - col("tokens_after")).cast("long").as("brm"))
    val spans = postBoilerSpans(spark, dir)
    (marked, boilerRm, spans)
  }

  /** Stages 3–4 per doc: both scrub subtractions joined back BROADCAST
    * onto the survivor frame. Spans are maximal and disjoint by cur16's
    * island-merge construction, so Σ(end−start+1) IS the removed-token
    * count (cur17's contract) — counted in post-boiler tokens, which
    * the boilerplate stage by definition left in place.
    */
  private[graft] def funnelScrubbed(
      surv: DataFrame, boilerRm: DataFrame, spans: DataFrame): DataFrame = {
    val perDoc = spans.groupBy("doc_id")
      .agg(sum(col("end_pos") - col("start_pos") + 1).as("rm"))
    surv
      .join(broadcast(boilerRm), Seq("doc_id"), "left")
      .join(broadcast(perDoc), Seq("doc_id"), "left")
      .withColumn("brm", coalesce(col("brm"), lit(0L)))
      .withColumn("rm", coalesce(col("rm"), lit(0L)))
      .withColumn("post_toks", col("n_toks") - col("brm") - col("rm"))
  }

  /** Stages 5–6 per doc over the scrubbed frame: clean filter, cur07's
    * integer-threshold stratified sample, cur11's hex split over a
    * SALTED key — the sampler keeps exactly the docs whose UNSALTED
    * md5 prefix sorts below thr, so splitting on the same hash would
    * starve val/test whenever a rate < 90% binds. Independent
    * decisions hash independent keys.
    */
  private[graft] def funnelSplit(scrubbed: DataFrame): DataFrame = {
    val clean = scrubbed.filter(col("post_toks") > 0)
    val w = Window.partitionBy()
    val rates = clean.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("thr_raw",
        least(lit(65536L), intDiv(lit(65536L) * sum("n_docs").over(w),
          count(lit(1)).over(w) * col("n_docs"))))
      .withColumn("thr", format_string("%04x", col("thr_raw").cast("int")))
      .select("source", "thr_raw", "thr")
    val sampled = clean.join(broadcast(rates), Seq("source"))
      .filter(col("thr_raw") >= 65536L ||
        substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
    val hkSplit =
      substring(md5(concat(lit("cur18:"), col("doc_id").cast("string"))), 1, 4)
    sampled.withColumn("split",
      when(hkSplit < "e666", "train").when(hkSplit < "f333", "val")
        .otherwise("test"))
  }

  /** Stages 3–7 of cur18 over any survivor frame (doc_id, source,
    * n_toks) + the two scrub frames — separable so the spec can drive
    * hand-built corpora and pin the stage-interplay laws (packing sees
    * post-BOTH-scrubs counts; the salted split is
    * threshold-independent) directly. Composed from the per-doc stage
    * functions ([[funnelScrubbed]] → [[funnelSplit]] →
    * [[sequencePackPositions]]) that cur20's emit leg shares — the
    * report and the emitted corpus cannot disagree.
    */
  private[graft] def buildFromSurvivors(
      surv: DataFrame, boilerRm: DataFrame, spans: DataFrame): DataFrame = {
    val scrubbed = funnelScrubbed(surv, boilerRm, spans)
    val scrubAgg = scrubbed.groupBy("source").agg(
      sum((col("brm") > 0).cast("long")).as("n_boiler"),
      sum("brm").as("boiler_toks"),
      sum((col("rm") > 0).cast("long")).as("n_contam"),
      sum("rm").as("toks_removed"),
      sum((col("post_toks") > 0).cast("long")).as("n_clean"))
    val split = funnelSplit(scrubbed)
    val sampAgg = split.groupBy("source").agg(
      count(lit(1)).as("n_sampled"),
      sum((col("split") === "train").cast("long")).as("n_train"),
      sum((col("split") === "val").cast("long")).as("n_val"),
      sum((col("split") === "test").cast("long")).as("n_test"))
    // cur09's concat-and-chunk over the train split, cut by POST-SCRUB
    // token count — the packing stage must size sequences by what the
    // scrub left, not by raw document lengths. ONE boundary-math
    // definition: the same [[sequencePackPositions]] cur09 aggregates
    // and stream19's cursor replays.
    val k = lit(Cur18CtxTokens)
    val packed = sequencePackPositions(
        split.filter(col("split") === "train")
          .select(col("doc_id"), col("source"),
            col("post_toks").as("n_chars")),
        Cur18CtxTokens)
      .groupBy("source")
      .agg(
        sum("n_chars").as("train_toks"),
        floor((max("cum_end") + (Cur18CtxTokens - 1)) / k).as("n_sequences"),
        sum((col("seq_last") > col("seq_first")).cast("long"))
          .as("n_split_docs"))
    scrubAgg
      .join(sampAgg, Seq("source"), "left")
      .join(packed, Seq("source"), "left")
  }

  /** Sequences per emitted shard partition for cur20. Small on
    * purpose: the sf0.01 corpus then emits 2–3 shards per source, so
    * the shard math (floor grouping, boundary straddle) is genuinely
    * exercised at every SF. A production build sizes this so a shard
    * is one trainer-friendly file (e.g. 8k sequences ≈ 1M tokens at
    * ctx 128).
    */
  val Cur20SeqsPerShard = 4L

  /** cur18's TRAIN-split packing MANIFEST, one row per document: the
    * doc's post-both-scrubs token count, its sequence span
    * (`seq_first`..`seq_last`), its start offset within `seq_first`,
    * and the shard (`seq_first / [[Cur20SeqsPerShard]]`) it is
    * emitted under. This is the late-materialization deliverable of a
    * packing stage: a loader reconstructs any sequence exactly by
    * gathering the manifest rows whose span covers it and slicing each
    * doc's token stream at the recorded offsets — without ever
    * re-running the funnel. Composed from the SAME per-doc stage
    * functions cur18's report aggregates ([[funnelInputs]] →
    * [[funnelScrubbed]] → [[funnelSplit]] →
    * [[sequencePackPositions]]), so the report and the emitted corpus
    * cannot disagree.
    */
  private[graft] def cur18TrainManifest(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"cur18.manifest:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val (marked, boilerRm, spans) = funnelInputs(spark, dir)
      val split = funnelSplit(funnelScrubbed(
        marked.filter(col("surv")).select("doc_id", "source", "n_toks"),
        boilerRm, spans))
      sequencePackPositions(
          split.filter(col("split") === "train")
            .select(col("doc_id"), col("source"),
              col("post_toks").as("n_chars")),
          Cur18CtxTokens)
        .select(col("doc_id"), col("source"),
          col("n_chars").as("post_toks"),
          col("seq_first"), col("seq_last"),
          ((col("cum_end") - col("n_chars")) % Cur18CtxTokens).as("off_first"),
          intDiv(col("seq_first"), lit(Cur20SeqsPerShard)).as("shard"))
    }

  /** cur20: the corpus-build EMIT leg — cur18 reports the funnel;
    * cur20 makes it produce its deliverable. The train manifest
    * ([[cur18TrainManifest]]) is WRITTEN hive-partitioned by
    * `(source, shard)` (etl10's layout: a trainer reading shard s of
    * one source prunes to that directory; the straddling tail of a
    * doc that started in an earlier shard is found via that shard's
    * flagged straddle rows — bounded by ⌈max_doc/ctx⌉ shards back),
    * then READ BACK and audited per (source, shard): docs, tokens,
    * covered sequence range, straddle count. The audit is computed
    * FROM THE EMITTED FILES, so the oracle match proves the
    * write→read round-trip lossless (etl10/etl21's discipline), and
    * the straddle flag is re-derived from emitted columns — the
    * manifest carries enough for the loader contract.
    *
    * Scale: the write is a partitioned append of a train-split-sized
    * thin frame (7 small columns — the corpus text never moves); the
    * packing window is cur09's per-source sort, already priced in
    * cur18. Same self-overwrite caveat as etl24: one output dir per
    * (tmpdir, dir, pid, session), so cur20 must not race itself within
    * a session — cross-process races are excluded by the pid+session
    * path component.
    */
  /** cur20's emit directory for a corpus dir. The readable sanitized
    * name carries an md5 suffix of the FULL path: sanitization alone
    * collides dirs differing only in non-alphanumerics ("sf0.1" vs
    * "sf0_1"), and cur20's read-back audit must never audit another
    * corpus's files. Shared with the specs so the layout assertions
    * look where the operator wrote.
    */
  /** Emit dirs registered for JVM-exit cleanup: the (pid, session)
    * path component that makes cross-process overwrite/read-back races
    * impossible also means every JVM writes a FRESH tree — without the
    * hook each sbt/bench invocation would leave one manifest + payload
    * copy in the tmpdir forever (cur23's payload is the largest
    * artifact the repo emits). Registered once per distinct dir;
    * best-effort (a killed -9 JVM still leaks, as any tmp writer does).
    */
  private val emitDirsToClean =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val emitCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      emitDirsToClean.forEach { d =>
        try {
          def del(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(del))
            f.delete(); ()
          }
          del(new java.io.File(d))
        } catch { case _: Throwable => () }
      }
    }))
  private[graft] def registerEmitDirCleanup(path: String): Unit = {
    emitCleanupHook
    emitDirsToClean.add(path); ()
  }

  private[graft] def cur20OutDir(spark: SparkSession, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    // (pid, sessionTag) in the path (round-15 ADVICE): the overwrite →
    // read-back round-trip must never interleave with another JVM
    // benching the same corpus on a shared host (the sessionTag counter
    // is JVM-local, so the pid carries the cross-process separation);
    // within one session the dir stays stable, so repeated bench calls
    // overwrite in place instead of accreting emit dirs — and the
    // JVM-exit hook removes the tree, so invocations don't accrete
    // either (round-16 review).
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_cur20_" +
      s"${dir.replaceAll("[^a-zA-Z0-9]", "_")}_${h}_" +
      s"p${ProcessHandle.current().pid()}_${graft.GraftCache.sessionTag(spark)}"
    registerEmitDirCleanup(path)
    path
  }

  def cur20SequenceSink(spark: SparkSession, dir: String): DataFrame = {
    val out = cur20OutDir(spark, dir)
    val clustered = cur18TrainManifest(spark, dir)
      // Cluster rows by the hive partition key BEFORE the write, with
      // an EXPLICIT task count: clustering means each hive partition
      // is written by exactly one task (one file per partition — the
      // layout a 100 TB emit needs; without it every task opens a
      // file in every directory it holds rows for, tasks × partitions
      // tiny files), and the explicit count keeps AQE from coalescing
      // the tiny manifest shuffle to ONE task that would then write
      // all ~sources×shards files sequentially (measured 9.7 s → 4.4 s
      // at sf0.1's ~400 partitions; the pinned manifest takes the
      // warm total to ~2.5 s).
      .repartition(
        spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("source"), col("shard"))
    // The manifest WRITE leg's plan rides the bench fingerprint (the
    // returned frame is the read-back audit — see payloadShardEmit).
    graft.PlanFingerprint.noteWriteLeg("cur20", clustered)
    // Build-once per (emit dir, manifest plan, source data) — the
    // round-18 payloadShardEmit discipline applied to the manifest
    // emit it was factored from (round 19: cur20 was the last emit
    // operator still rewriting identical bytes every call — the dirs
    // are pid+session-tagged and the manifest deterministic, so
    // within one session the same frame re-emitted to the same dir is
    // the identical bytes; repeated bench passes pay the write once
    // and measure warm audit cost, the same contract as cur23/26/27).
    // The audit still reads the emitted FILES — what it proves is
    // unchanged.
    val stamp = graft.PlanFingerprint.of(clustered) +
      s":ctx=$Cur18CtxTokens:sps=$Cur20SeqsPerShard:" +
      TableBuild.dirFingerprint(spark, s"$dir/documents.parquet")
    TableBuild.ensurePath(spark, out, stamp) {
      clustered.write.mode("overwrite")
        .partitionBy("source", "shard").parquet(out)
    }
    val s = lit(Cur20SeqsPerShard)
    spark.read.parquet(out)
      .groupBy(col("source"), col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("post_toks").as("shard_toks"),
        min("seq_first").as("seq_lo"),
        max("seq_last").as("seq_hi"),
        sum((intDiv(col("seq_last"), s) > intDiv(col("seq_first"), s))
          .cast("long")).as("n_straddle"))
      .orderBy("source", "shard")
  }

  /** The TRAIN split's post-both-scrubs token payload, one row per
    * manifest doc: (manifest columns, toks) where `toks` is the doc's
    * token array after the boilerplate scrub (affected docs read the
    * pinned text20 clean text; unaffected docs keep their raw tokens —
    * byte-identical text) with cur16's contaminated span positions
    * removed (cur17's HOF rewrite, here keeping the ARRAY — the funnel
    * stages' own frames, so `size(toks) = post_toks` doc-for-doc by
    * construction, spec-pinned). The doc_id equi-join of the manifest
    * against the corpus text is the one unavoidable corpus join of a
    * payload emit (both sides hash-partition on doc_id); the scrub and
    * span evidence stay broadcast (affected/contaminated docs only).
    */
  private[graft] def cur18TrainPayload(
      spark: SparkSession, dir: String): DataFrame = {
    val man = cur18TrainManifest(spark, dir)
    val scrub = funnelScrubFrame(spark, dir)
    val perDocSpans = postBoilerSpans(spark, dir)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("start_pos"), col("end_pos"))).as("sp"))
    val pbt = tokens(coalesce(col("text_clean"), col("text")))
    man
      .join(documents(spark, dir).select(col("doc_id"), col("text")),
        Seq("doc_id"))
      .join(broadcast(scrub.select(col("doc_id"), col("text_clean"))),
        Seq("doc_id"), "left")
      .join(broadcast(perDocSpans), Seq("doc_id"), "left")
      .withColumn("toks",
        when(col("sp").isNull, pbt).otherwise(
          transform(
            filter(sequence(lit(0), size(pbt) - 1), p =>
              !exists(col("sp"), s =>
                p >= s.getField("start_pos") && p <= s.getField("end_pos"))),
            p => element_at(pbt, p + 1))))
      .select(col("doc_id"), col("source"), col("post_toks"),
        col("seq_first"), col("seq_last"), col("off_first"),
        col("shard"), col("toks"))
  }

  /** cur23's emit directory — cur20's layout contract (pid + session
    * tagged, md5-suffixed corpus key).
    */
  private[graft] def cur23OutDir(spark: SparkSession, dir: String): String = {
    val path = cur20OutDir(spark, dir).replace("graft_cur20_", "graft_cur23_")
    registerEmitDirCleanup(path)
    path
  }

  /** cur23: PAYLOAD SHARD emit — the deliverable cur20's manifest
    * defers (SURVEY's named round-15 deferral): loader-readable
    * training shards with the actual post-scrub token payload joined
    * in, not just the packing coordinates. Each (source, shard) hive
    * partition holds its filed docs' manifest rows PLUS their token
    * arrays ([[cur18TrainPayload]]); a loader materializes sequence s
    * of a source by gathering the covering rows and slicing at
    * `cum_start = seq_first·ctx + off_first` — and the AUDIT below
    * performs exactly that reconstruction FROM THE EMITTED FILES, so
    * the oracle match proves the emitted bytes reassemble into the
    * funnel's exact sequence stream (content, intra-sequence order,
    * and tiling — not just counts):
    *
    *  - per filed shard: docs and payload tokens measured from the
    *    emitted ARRAYS (`size(toks)`, never the manifest counts);
    *  - per sequence (grouped to ITS shard, `seq div seqsPerShard` —
    *    a straddling doc's tail slices count toward the shard the
    *    sequence lives in, which may hold no filed docs at all, hence
    *    the full-outer fuse): the slice reassembly in cum_start order,
    *    hashed with the engine-portable [[tokenHash64]] contract and
    *    summed per shard. Σ(per-shard hash sums) is bounded by
    *    seqsPerShard·2⁶⁰ per row — inside BIGINT while
    *    [[Cur20SeqsPerShard]] ≤ 8 (it is 4).
    *
    * Scale: the write clusters by the hive key with cur20's explicit
    * task count; the payload join is doc_id-co-partitionable; the
    * sequence reassembly shuffles each token exactly once on the
    * (source, seq) key (sequence-sized groups — the trainer-side read
    * pattern, which is the point of emitting this layout).
    */
  def cur23PayloadShards(spark: SparkSession, dir: String): DataFrame =
    payloadShardAudit(spark, cur18TrainPayload(spark, dir),
      cur23OutDir(spark, dir), "cur23", dir)

  /** The payload emit + content-proving read-back audit over an
    * EXPLICIT payload frame (doc_id, source, post_toks, seq_first,
    * seq_last, off_first, shard, toks) — cur23's whole write → scan →
    * slice → reassemble → hash chain, separated (round 16) so cur26's
    * post-takedown repack emits and audits through the SAME machinery
    * (the re-emitted corpus cannot be audited differently than the
    * original).
    */
  private[graft] def payloadShardAudit(
      spark: SparkSession, payload: DataFrame, out: String,
      legTag: String, srcDir: String): DataFrame = {
    val sps = lit(Cur20SeqsPerShard)
    val rb = payloadShardEmit(spark, payload, out, legTag, srcDir)
    val docsPerShard = rb.groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("payload_toks"))
    val seqs = pinnedReassembled(spark, rb, out)
      .select(col("source"), col("seq"),
        array_join(col("stoks"), " ").as("stext"))
    val seqsPerShard = seqs
      .groupBy(col("source"), intDiv(col("seq"), sps).as("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(size(split(col("stext"), " ")).cast("long")).as("seq_toks"),
        sum(tokenHash64(col("stext"))).as("seq_hash_sum"))
    docsPerShard.join(seqsPerShard, Seq("source", "shard"), "full_outer")
      .select(col("source"), col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("payload_toks"), lit(0L)).as("payload_toks"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
        coalesce(col("seq_toks"), lit(0L)).as("seq_toks"),
        coalesce(col("seq_hash_sum"), lit(0L)).as("seq_hash_sum"))
      .orderBy("source", "shard")
  }

  /** The payload WRITE leg + raw read-back: cluster by the hive key
    * (cur20's explicit task count), write partitioned, read the files
    * back with `cum_start` restored. Factored (round 17) so cur27's
    * masked read consumes exactly the frame a loader would scan. The
    * written frame's plan is noted as `legTag`'s WRITE-LEG fingerprint
    * ([[graft.PlanFingerprint.noteWriteLeg]] — round-16 "what's wrong"
    * #2: these operators RETURN their read-back audit, so the bench's
    * fingerprint was blind to an emit-leg-only change, which kept its
    * old floor and read suspect until the next clean regeneration).
    */
  private[graft] def payloadShardEmit(
      spark: SparkSession, payload: DataFrame, out: String,
      legTag: String, srcDir: String): DataFrame = {
    val ctx = lit(Cur18CtxTokens)
    val clustered = payload
      .repartition(
        spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("source"), col("shard"))
    graft.PlanFingerprint.noteWriteLeg(legTag, clustered)
    // Build-once per (emit dir, payload plan) — round-17 verdict's
    // optional lever, the etl17/etl22/mm05 ensure discipline applied
    // to the emit family: the dirs are pid+session-tagged and the
    // payload frames deterministic, so within one session the same
    // frame re-emitted to the same dir is the identical bytes. cur23,
    // cur27's leg A and cur29 share ONE original emit; cur26 and
    // cur27's leg B share the repacked one; repeated bench passes pay
    // the write once and measure warm audit cost thereafter (the same
    // contract every ensure-once operator benches under). The stamp is
    // the payload's structural plan signature + the layout constants —
    // distinct frames never share a dir (the dir name is derived from
    // the operator), and a literal-only retune cannot alias because a
    // constant cannot change within one JVM. The audit still reads the
    // emitted FILES — what it proves is unchanged.
    // The SOURCE DATA fingerprint (etl22's ensurePath discipline) is
    // folded in as defense in depth (round-18 ADVICE): a fixture dir
    // regenerated in place within a session now rebuilds the emit
    // instead of serving stale bytes behind an unchanged plan
    // signature.
    val stamp = graft.PlanFingerprint.of(clustered) +
      s":ctx=$Cur18CtxTokens:sps=$Cur20SeqsPerShard:" +
      TableBuild.dirFingerprint(spark, s"$srcDir/documents.parquet")
    TableBuild.ensurePath(spark, out, stamp) {
      clustered.write.mode("overwrite")
        .partitionBy("source", "shard").parquet(out)
    }
    spark.read.parquet(out)
      .select(col("doc_id"), col("source"),
        col("shard").cast("long").as("shard"),
        col("seq_first"), col("seq_last"), col("off_first"), col("toks"))
      .withColumn("cum_start", col("seq_first") * ctx + col("off_first"))
  }

  /** The reassembled sequence stream of one EMITTED payload dir,
    * pinned per (emit dir, session) — round 21, cur15's shared-
    * intermediate discipline (guide §5: cache only what is reused and
    * expensive to recompute): cur23's audit, cur27's leg A, and
    * cur29's composed read all reassemble the SAME cur23-emitted
    * files (cur26's audit and cur27's leg B likewise share the
    * repacked dir), and each call re-paid the explode + (source, seq)
    * shuffle + slice-sort of the whole token stream. The pin is
    * session-scoped and released at the bench's family boundaries —
    * the same staleness contract as every (dir, session) pin: an
    * emit dir rewritten in place mid-session requires
    * GraftCache.release().
    */
  private[graft] def pinnedReassembled(
      spark: SparkSession, rb: DataFrame, out: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"cur.reassembled:$out:${graft.GraftCache.sessionTag(spark)}") {
      reassembledSequences(rb)
    }

  /** Sequence reassembly over an emitted-payload read-back frame
    * (source, cum_start, toks, seq_first, seq_last): one row per
    * (source, seq) with the sequence's token ARRAY rebuilt by cutting
    * each covering doc's payload at the recorded offsets and joining
    * the slices in cum_start order — cur23's loader grammar, factored
    * (round 17) so cur27's masked read and re-tile run the EXACT
    * slices a trainer-side loader would cut, never a re-derivation.
    */
  private[graft] def reassembledSequences(rb: DataFrame): DataFrame = {
    val ctx = lit(Cur18CtxTokens)
    val slices = rb
      .select(col("source"), col("cum_start"), col("toks"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .withColumn("lo", greatest(col("cum_start"), col("seq") * ctx))
      .withColumn("hi",
        least(col("cum_start") + size(col("toks")), (col("seq") + 1) * ctx))
      .select(col("source"), col("seq"), col("cum_start"),
        slice(col("toks"), (col("lo") - col("cum_start") + 1).cast("int"),
          (col("hi") - col("lo")).cast("int")).as("part"))
    slices.groupBy("source", "seq")
      .agg(collect_list(struct(col("cum_start"), col("part"))).as("parts"))
      .select(col("source"), col("seq"),
        flatten(transform(array_sort(col("parts")),
          p => p.getField("part"))).as("stoks"))
  }

  /** Takedown selection threshold (first two hex chars of a SALTED
    * md5 — ~16/256 ≈ 6% of the train split). The salt makes the
    * takedown set independent of every other hash decision in the
    * funnel (sampling, split, packing order), the way a real recall
    * list is: arbitrary with respect to the layout it hits.
    */
  val TakedownHexThr = "10"

  /** The takedown predicate over a manifest frame's doc_id —
    * deterministic and engine-portable (cur01's md5-prefix protocol),
    * standing in for the external recall list (opt-out requests,
    * copyright claims, PII findings) a production pipeline receives.
    */
  private[graft] def takedownFlag =
    substring(md5(concat(lit("takedown:"), col("doc_id").cast("string"))),
      1, 2) < TakedownHexThr

  /** cur24: TAKEDOWN — execute a removal list against the PACKED
    * corpus and price what it costs. Opt-out/copyright/PII recalls
    * arrive after the shards are built, so "delete these documents"
    * is an operation against cur20/cur23's emitted layout, not
    * against the raw corpus — and because cur09's packing is a
    * per-source running concatenation, removing one document shifts
    * every doc packed AFTER it in its source's md5 order and leaves
    * every doc BEFORE it byte-identical (the prefix-stability law
    * this operator measures, spec-pinned). Output per source: the
    * removal mass (docs, tokens), the stable/moved survivor split,
    * sequence counts before/after, the first dirty sequence, and the
    * shard rewrite bill (every shard from the first dirty one to the
    * source's last — the suffix a full repack must rewrite). This is
    * the audit that decides between the two execution strategies: a
    * low shards_dirty bill executes as a repack (this operator's
    * "after" positions ARE the new manifest); a high one argues for
    * cur25's mask-style tombstoning instead.
    *
    * Spark shape: the BEFORE positions are the pinned
    * [[cur18TrainManifest]] (no re-derivation); the AFTER positions
    * re-run the same [[sequencePackPositions]] window over the
    * survivors (one per-source window over the thin manifest frame —
    * cur20's already-priced cost); the before↔after join is
    * doc_id-equi on two manifest-sized frames; everything else is one
    * per-source rollup in pure integer arithmetic. The corpus text
    * never moves — a takedown DECISION is manifest-sized even when
    * its execution rewrites shards.
    */
  /** cur25: TOMBSTONE MASK — the other way to execute cur24's recall
    * list, and the one production pipelines usually take first: leave
    * the emitted shards byte-identical and publish a MASK side file
    * the loader applies (skip these token offsets of these
    * sequences). cur24 prices the repack (the shard-suffix rewrite
    * bill); this emits the zero-rewrite alternative — the trade is
    * masked tokens still occupying shard bytes until the next full
    * repack compacts them away. One row per (removed doc × covered
    * sequence): the in-sequence token span [mask_start, mask_end]
    * (inclusive — cur16's span convention) the loader must skip,
    * derived purely from the doc's manifest coordinates (cum_start =
    * seq_first·ctx + off_first clipped to each covered sequence's
    * boundaries).
    *
    * Spark shape: the recalled manifest rows are recall-list-sized;
    * each explodes into its ≤⌈post_toks/ctx⌉+1 covered sequences —
    * NO join, NO window, no corpus access at all: a tombstone mask is
    * the cheapest possible takedown execution, which is exactly its
    * argument. Conservation vs cur24 is spec-pinned: the mask rows
    * tile each removed doc's token range exactly, so Σ masked_toks
    * per source = cur24's toks_removed — the two executions remove
    * the same mass.
    */
  def cur25TombstoneMask(spark: SparkSession, dir: String): DataFrame =
    recalledMaskRows(cur18TrainManifest(spark, dir).filter(takedownFlag))
      .orderBy("source", "seq", "mask_start", "doc_id")

  /** The mask-row derivation over an already-RECALLED manifest slice —
    * the ONE span-clipping definition cur25 and stream25's feed gate
    * share (the streamed twin cannot clip differently than the batch
    * emit). Input must carry the manifest coordinates (source, doc_id,
    * post_toks, seq_first, seq_last, off_first).
    */
  private[graft] def recalledMaskRows(recalled: DataFrame): DataFrame = {
    val ctx = lit(Cur18CtxTokens)
    val cumStart = col("seq_first") * ctx + col("off_first")
    clippedMaskRows(recalled.select(col("source"), col("doc_id"),
      cumStart.as("lo_g"), (cumStart + col("post_toks")).as("hi_g")))
  }

  /** The ONE span-clipping core under every mask emit: an arbitrary
    * GLOBAL token range [lo_g, hi_g) exploded into its covered
    * sequences with the span clipped to each sequence's boundary —
    * factored (round 17) from [[recalledMaskRows]] (which masks a
    * recalled doc's WHOLE range) so cur28's span-level redaction masks
    * a sub-doc range through the identical arithmetic. Input must
    * carry (source, doc_id, lo_g, hi_g); an EMPTY range (lo_g >= hi_g)
    * is a no-op by construction — enforced here, not assumed (round-17
    * ADVICE): Spark's `sequence(start, stop)` DESCENDS when start >
    * stop, so an unguarded empty range whose lo_g sits on a ctx
    * boundary would silently explode into sign-flipped mask rows and
    * corrupt the loader's skip list.
    */
  private[graft] def clippedMaskRows(ranges: DataFrame): DataFrame = {
    val ctx = lit(Cur18CtxTokens)
    val lo = greatest(col("lo_g"), col("seq") * ctx)
    val hi = least(col("hi_g"), (col("seq") + 1) * ctx)
    ranges
      .filter(col("lo_g") < col("hi_g"))
      .select(col("source"), col("doc_id"), col("lo_g"), col("hi_g"),
        explode(sequence(intDiv(col("lo_g"), ctx),
          intDiv(col("hi_g") - 1, ctx))).as("seq"))
      .select(col("source"), col("seq"),
        intDiv(col("seq"), lit(Cur20SeqsPerShard)).as("shard"),
        col("doc_id"),
        (lo - col("seq") * ctx).as("mask_start"),
        (hi - 1 - col("seq") * ctx).as("mask_end"),
        (hi - lo).as("masked_toks"))
  }

  /** cur28's span-recall selection (salted md5-prefix rule, ~24/256 ≈
    * 9% of train docs) and the deterministic in-doc span: tokens
    * [post_toks/4, max(post_toks/4 + 1, post_toks/2)) — the
    * engine-portable stand-in for a span-level finding (a PII span, a
    * quoted copyrighted passage) that names PART of a packed document
    * rather than all of it. Integer arithmetic throughout; nonempty
    * for every post_toks ≥ 1.
    */
  val RedactHexThr = "18"

  private[graft] def redactFlag =
    substring(md5(concat(lit("redact:"), col("doc_id").cast("string"))),
      1, 2) < RedactHexThr

  /** The deterministic in-doc redaction span [lo, hi) in post-scrub
    * token positions, over a frame carrying `post_toks` — ONE
    * derivation for every site that places it (cur28's mask emit,
    * cur29's composed read, cur30's byte retire, cur31's ledger;
    * round-20 review: four copy-pastes of this arithmetic were one
    * missed retune away from diverging the vacuumed ledger from the
    * mask family it retires).
    */
  private[graft] def redactSpanLo = intDiv(col("post_toks"), lit(4L))
  private[graft] def redactSpanHi =
    greatest(redactSpanLo + 1, intDiv(col("post_toks"), lit(2L)))

  /** cur28: SPAN-LEVEL POST-PACK REDACTION — the takedown grammar at
    * sub-document granularity: a span-level finding (PII inside an
    * otherwise-fine document, one infringing quotation) must stop
    * being served from the packed shards without removing the whole
    * document — exactly cur25's zero-rewrite mask execution with the
    * masked range being PART of the doc's packed token range instead
    * of all of it. One row per (recalled doc × covered sequence): the
    * in-sequence token span the loader must skip, derived purely from
    * manifest coordinates through the ONE clipping core
    * ([[clippedMaskRows]] — cur25, stream25 and cur28 cannot clip
    * differently). Same execution economics as cur25: recall-sized,
    * NO join, NO window, no corpus access — and the re-tile/loader
    * algebra cur27 proves holds for ARBITRARY [mask_start, mask_end]
    * spans, so span masks compose with whole-doc masks in the same
    * loader pass.
    */
  def cur28SpanRedaction(spark: SparkSession, dir: String): DataFrame =
    docSpanMaskRows(
        cur18TrainManifest(spark, dir).filter(redactFlag)
          .withColumn("span_lo", redactSpanLo)
          .withColumn("span_hi", redactSpanHi))
      .orderBy("source", "seq", "mask_start", "doc_id")

  /** Mask rows for IN-DOC token spans over manifest-coordinate rows —
    * the ONE span→global-range derivation cur28 and stream27's feed
    * share (the streamed twin cannot place a span differently than the
    * batch emit). Input carries the manifest coordinates plus the
    * finding's span [span_lo, span_hi) in POST-SCRUB token positions;
    * the span is clamped to the doc's packed range [0, post_toks), and
    * a span that clamps empty (degenerate, inverted, or entirely
    * out of range — external findings feeds produce all three) masks
    * nothing, which is the correct verdict, not an error
    * ([[clippedMaskRows]]'s empty-range guard enforces it).
    */
  private[graft] def docSpanMaskRows(spanned: DataFrame): DataFrame = {
    val ctx = lit(Cur18CtxTokens)
    val cumStart = col("seq_first") * ctx + col("off_first")
    val lo = greatest(col("span_lo"), lit(0L))
    val hi = least(col("span_hi"), col("post_toks"))
    clippedMaskRows(spanned.select(col("source"), col("doc_id"),
      (cumStart + lo).as("lo_g"), (cumStart + hi).as("hi_g")))
  }

  /** stream27's per-micro-batch core: arriving span-level findings
    * (doc_id + token span) mask through the shared clipping grammar
    * those of them that name PACKED train docs — cur28 on stream25's
    * seam. An id outside the train manifest (a val/test doc, an id the
    * funnel dropped, junk) masks nothing; a degenerate span masks
    * nothing. The broadcast is the ARRIVAL batch (findings-feed-sized);
    * the manifest is the pinned session frame.
    */
  private[graft] def spanRedactionArrivals(
      spark: SparkSession, dir: String, batch: DataFrame): DataFrame =
    docSpanMaskRows(
      cur18TrainManifest(spark, dir)
        .join(broadcast(batch.select(col("doc_id"),
          col("span_lo").cast("long"), col("span_hi").cast("long"))),
          Seq("doc_id")))

  /** stream25's per-micro-batch core: arriving recall requests carry
    * doc_ids; the mask rows for those of them that are PACKED train
    * docs emit through the shared clipping rule. A recalled id outside
    * the train manifest (a val/test doc, an id the funnel dropped, or
    * junk) masks nothing — there is nothing in the shards to skip,
    * which is the correct verdict, not an error. The broadcast is the
    * ARRIVAL batch (recall-list-sized); the manifest is the pinned
    * session frame.
    */
  private[graft] def takedownMaskArrivals(
      spark: SparkSession, dir: String, batch: DataFrame): DataFrame =
    recalledMaskRows(
      cur18TrainManifest(spark, dir)
        .join(broadcast(batch.select(col("doc_id"))), Seq("doc_id"),
          "left_semi"))

  /** The POST-TAKEDOWN train manifest: the survivors re-packed by the
    * same [[sequencePackPositions]] window (cur24's "after" positions,
    * carried to the full manifest row shape) — what cur26 emits and
    * what a post-repack loader slices from.
    */
  private[graft] def cur24AfterManifest(
      spark: SparkSession, dir: String): DataFrame = {
    val ctx = Cur18CtxTokens
    sequencePackPositions(
        cur18TrainManifest(spark, dir).filter(!takedownFlag)
          .select(col("doc_id"), col("source"),
            col("post_toks").as("n_chars")),
        ctx)
      .select(col("doc_id"), col("source"),
        col("n_chars").as("post_toks"),
        col("seq_first"), col("seq_last"),
        ((col("cum_end") - col("n_chars")) % ctx).as("off_first"),
        intDiv(col("seq_first"), lit(Cur20SeqsPerShard)).as("shard"))
  }

  /** cur26's emit directory — cur20's layout contract. */
  private[graft] def cur26OutDir(spark: SparkSession, dir: String): String = {
    val path = cur20OutDir(spark, dir).replace("graft_cur20_", "graft_cur26_")
    registerEmitDirCleanup(path)
    path
  }

  /** cur26: REPACK EXECUTE — carry out cur24's repack decision end to
    * end: the post-takedown payload shards are EMITTED (the survivors'
    * unchanged token arrays joined doc_id-equi onto their
    * [[cur24AfterManifest]] coordinates, written through cur23's
    * sink) and audited FROM THE EMITTED FILES by the same reassembly
    * chain — so the oracle match proves the repacked corpus's content
    * and tiling, and the spec pins the law that makes a repack
    * affordable at 100 TB: every shard BEFORE the source's first dirty
    * sequence is BYTE-IDENTICAL to the original emit (cur24's
    * prefix-stability law made PHYSICAL — identical docs, identical
    * sequence hash sums), so an executor only rewrites the dirty
    * suffix cur24 priced; removed docs appear in NO emitted file, and
    * per source the payload mass drops by exactly cur24's
    * toks_removed. This closes the round-16 known-next-step: cur24
    * decides and prices, cur25 masks in the meantime, cur26 executes
    * the rewrite.
    *
    * Spark shape: the token payload is [[cur18TrainPayload]]'s frame
    * (ONE definition of "the post-both-scrubs tokens" with cur23 — the
    * repack cannot re-derive text); the only new work is cur24's
    * already-priced survivor window + one doc_id-equi join; emit and
    * audit are [[payloadShardAudit]] verbatim.
    */
  def cur26RepackExecute(spark: SparkSession, dir: String): DataFrame =
    payloadShardAudit(spark, cur26Payload(spark, dir),
      cur26OutDir(spark, dir), "cur26", dir)

  /** cur27: MASK ↔ REPACK CONTENT EQUIVALENCE — the law that makes
    * "mask now, repack later" semantically safe (round-16 missing #1):
    * cur25's conservation check proves the two takedown executions
    * remove the same token MASS; this operator proves they expose the
    * same token STREAM. A loader that applies cur25's mask rows to
    * cur23's ORIGINAL emitted shards (skip the masked in-sequence
    * offsets while reassembling, then read the survivor stream) must
    * see, token for token, exactly what a loader of cur26's REPACKED
    * shards reads — same survivor tokens, different sequence
    * coordinates. Holds because cur09's per-source packing order is
    * stable under deletion (survivors keep their relative md5 order),
    * so dropping the recalled docs' tokens from the original stream IS
    * the repacked stream; this operator carries the proof to the
    * emitted bytes instead of leaving it an argument.
    *
    * Both legs run FROM THE EMITTED FILES through the ONE loader
    * grammar ([[payloadShardEmit]] → [[reassembledSequences]]):
    *  - leg A emits the original corpus (cur23's frame+layout),
    *    reassembles its sequences, drops the offsets cur25's mask rows
    *    name ([[recalledMaskRows]] — the shared clipping rule, never a
    *    re-derivation), re-tiles the per-source survivor stream at ctx
    *    boundaries (global offsets from ONE window over the thin
    *    per-sequence frame, then the same slice grammar);
    *  - leg B emits the repacked corpus (cur26's frame+layout) and
    *    reassembles its sequences directly.
    * Output: one row per post-takedown (source, seq) with both legs'
    * order-preserving content hash and token count, and the equality
    * verdict — the oracle replays the repacked stream once and expects
    * BOTH hashes equal to it, so any divergence between mask
    * semantics and repack semantics breaks the row hash.
    *
    * Scale: everything rides the already-priced emit legs; the only
    * new work is one per-source window over SEQUENCES (manifest-sized,
    * thin — n_seqs rows, not tokens) and one (source, seq) equi-join
    * of two sequence-hash frames. The mask side never touches the
    * corpus text beyond the emitted arrays it would read anyway.
    * Same-session concurrency caveat (cur20's contract, widened): the
    * legs overwrite cur23's and cur26's emit dirs with the identical
    * frames, so cur27 must not race cur23/cur26 (or itself) within a
    * session — cross-process separation stays pid+session-tagged.
    */
  def cur27MaskEquivalence(spark: SparkSession, dir: String): DataFrame = {
    // Leg A: the ORIGINAL emit, masked during reassembly.
    val maskedRead = maskedRetiledRead(spark, dir,
        recalledMaskRows(cur18TrainManifest(spark, dir).filter(takedownFlag)),
        "cur27")
      .select(col("source"), col("seq"),
        col("n_toks").as("masked_toks"),
        col("content_hash").as("masked_hash"))
    // Leg B: the REPACKED emit, reassembled directly (the shared
    // (emit dir, session) pin — cur26's audit reads the same stream).
    val cur26Out = cur26OutDir(spark, dir)
    val repackRead = pinnedReassembled(spark,
        payloadShardEmit(spark, cur26Payload(spark, dir),
          cur26Out, "cur27", dir), cur26Out)
      .select(col("source"), col("seq"),
        size(col("stoks")).cast("long").as("repack_toks"),
        tokenHash64(array_join(col("stoks"), " ")).as("repack_hash"))
    maskedRead.join(repackRead, Seq("source", "seq"), "full_outer")
      .select(col("source"), col("seq"),
        (col("masked_hash") <=> col("repack_hash")).as("is_match"),
        coalesce(col("masked_toks"), lit(0L)).as("masked_toks"),
        coalesce(col("repack_toks"), lit(0L)).as("repack_toks"),
        coalesce(col("masked_hash"), lit(0L)).as("masked_hash"),
        coalesce(col("repack_hash"), lit(0L)).as("repack_hash"))
      .orderBy("source", "seq")
  }

  /** The MASKED LOADER READ over the ORIGINAL emit — cur27's leg A,
    * factored (round 18) so cur29 runs BOTH mask families through the
    * identical pass: emit the original corpus (cur23's frame+layout,
    * write-leg noted under `legTag`), reassemble its sequences through
    * the one loader grammar, drop the offsets `maskRows` names, re-tile
    * the per-source survivor stream at ctx boundaries (global offsets
    * from ONE window over the thin per-sequence frame, then the same
    * slice grammar). Returns one row per post-mask (source, seq) with
    * the sequence's token count and order-preserving content hash.
    */
  private[graft] def maskedRetiledRead(spark: SparkSession, dir: String,
      maskRows: DataFrame, legTag: String): DataFrame = {
    val ctx = lit(Cur18CtxTokens)
    val cur23Out = cur23OutDir(spark, dir)
    val orig = payloadShardEmit(spark, cur18TrainPayload(spark, dir),
      cur23Out, legTag, dir)
    val masks = maskRows
      .groupBy("source", "seq")
      .agg(collect_list(struct(col("mask_start"), col("mask_end"))).as("mk"))
    val maskedSeqs = pinnedReassembled(spark, orig, cur23Out)
      // Mask rows are recall/findings-list-sized (cur25's whole
      // argument) — broadcast; a sequence with no mask row keeps its
      // tokens; overlapping spans (a span finding inside a recalled
      // doc) compose — a position is dropped if ANY span covers it.
      .join(broadcast(masks), Seq("source", "seq"), "left")
      .select(col("source"), col("seq"),
        when(col("mk").isNull, col("stoks")).otherwise(
          transform(
            filter(sequence(lit(0), size(col("stoks")) - 1), p =>
              !exists(col("mk"), m =>
                p >= m.getField("mask_start") && p <= m.getField("mask_end"))),
            p => element_at(col("stoks"), p + 1))).as("stoks"))
    // Re-tile the survivor stream: cumulative survivor counts give each
    // kept run its new global offset; the shared slice grammar cuts the
    // runs at the new ctx boundaries (a fully-masked sequence carries
    // no tokens and is dropped AFTER the cumsum — it shifts nothing).
    val wSrc = Window.partitionBy("source").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val retiled = maskedSeqs
      .withColumn("cum_end", sum(size(col("stoks")).cast("long")).over(wSrc))
      .filter(size(col("stoks")) > 0)
      .select(col("source"),
        (col("cum_end") - size(col("stoks"))).as("cum_start"),
        col("stoks").as("toks"),
        intDiv(col("cum_end") - size(col("stoks")), ctx).as("seq_first"),
        intDiv(col("cum_end") - 1, ctx).as("seq_last"))
    reassembledSequences(retiled)
      .select(col("source"), col("seq"),
        size(col("stoks")).cast("long").as("n_toks"),
        tokenHash64(array_join(col("stoks"), " ")).as("content_hash"))
  }

  /** cur29: COMPOSED LOADER READ — whole-doc takedown masks (cur25)
    * and span-level redaction masks (cur28) applied to the ORIGINAL
    * emitted shards in ONE pass, which is the loader's actual
    * deployment state once both mask families have fired between
    * repacks (round-17 directive #5). cur27 proves whole-doc mask ==
    * repack from the bytes; GraftProps proves the re-tile algebra for
    * ARBITRARY span packings; this operator carries the COMPOSITION to
    * the emitted bytes: both families' mask rows union into one skip
    * list, the one masked-read pass ([[maskedRetiledRead]] — cur27's
    * leg A verbatim) drops every covered offset and re-tiles the
    * survivor stream, and the output hash per post-mask (source, seq)
    * must equal the oracle's replay of the DOUBLY-repacked stream
    * (takedown docs removed entirely, surviving redact docs minus
    * their spans, concatenated in the unchanged packing order and
    * tiled at ctx). A loader that mis-composes the families — applies
    * them in two passes with re-tiling between, double-counts an
    * overlap, or shifts a span — breaks the row hash.
    *
    * Scale: one emit leg (cur23's — cur27 pays two), masks stay
    * recall+findings-sized and broadcast, the re-tile stays ONE thin
    * per-source window over sequences. Same-session concurrency caveat
    * as cur27: overwrites cur23's emit dir with the identical frame —
    * must not race cur23/cur26/cur27 within a session.
    */
  def cur29ComposedMasks(spark: SparkSession, dir: String): DataFrame = {
    val (td, sp) = cur31MaskFamilies(spark, dir)
    maskedRetiledRead(spark, dir, td.unionByName(sp), "cur29")
      .orderBy("source", "seq")
  }

  /** cur26's post-takedown payload frame (the survivors' unchanged
    * token arrays on their re-packed coordinates) — separated so cur27
    * emits leg B through the same frame cur26 writes.
    */
  private[graft] def cur26Payload(spark: SparkSession, dir: String): DataFrame =
    cur24AfterManifest(spark, dir)
      .join(cur18TrainPayload(spark, dir).select(col("doc_id"), col("toks")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("post_toks"),
        col("seq_first"), col("seq_last"), col("off_first"),
        col("shard"), col("toks"))

  /** cur30's emit directory — cur20's layout contract. */
  private[graft] def cur30OutDir(spark: SparkSession, dir: String): String = {
    val path = cur20OutDir(spark, dir).replace("graft_cur20_", "graft_cur30_")
    registerEmitDirCleanup(path)
    path
  }

  /** The DOUBLY-repacked payload frame: whole-doc takedowns (cur25's
    * family) removed entirely, surviving redact-flagged docs (cur28's
    * family) minus their span — two 1-based slices around the clamped
    * [span_lo, span_hi) range, the redaction carried to the ARRAY —
    * and the survivors re-packed by the ONE packing window
    * ([[sequencePackPositions]]) in the unchanged per-source md5
    * order. A doc a redaction empties (post_toks 1–3 can lose their
    * only kept token) contributes nothing to the stream and is
    * dropped BEFORE the window — a zero-length doc shifts no cumsum,
    * so survivor positions are identical either way, and the packing
    * grammar never sees the degenerate seq_last < seq_first a
    * zero-length doc on a ctx boundary would produce.
    */
  private[graft] def cur30Payload(spark: SparkSession, dir: String): DataFrame = {
    val ctx = Cur18CtxTokens
    // The clamp is docSpanMaskRows' verbatim (the mask emit and the
    // byte retire cannot place a span differently).
    val lo = greatest(redactSpanLo, lit(0L))
    val hi = least(redactSpanHi, col("post_toks"))
    val scrubbed = cur18TrainPayload(spark, dir)
      .filter(!takedownFlag)
      .withColumn("toks",
        when(redactFlag,
          concat(slice(col("toks"), lit(1), lo.cast("int")),
            slice(col("toks"), (hi + 1).cast("int"),
              (col("post_toks") - hi).cast("int"))))
          .otherwise(col("toks")))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_chars"), col("toks"))
      .filter(col("n_chars") > 0)
    sequencePackPositions(
        scrubbed.select(col("doc_id"), col("source"), col("n_chars")), ctx)
      .select(col("doc_id"), col("source"),
        col("n_chars").as("post_toks"),
        col("seq_first"), col("seq_last"),
        ((col("cum_end") - col("n_chars")) % ctx).as("off_first"),
        intDiv(col("seq_first"), lit(Cur20SeqsPerShard)).as("shard"))
      .join(scrubbed.select(col("doc_id"), col("toks")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("post_toks"),
        col("seq_first"), col("seq_last"), col("off_first"),
        col("shard"), col("toks"))
  }

  /** cur30: COMPOSED REPACK EXECUTE — retire BOTH mask families into
    * bytes (round-18 directive #1, the takedown lifecycle's last
    * read-only law carried to the files). Between repacks, whole-doc
    * takedown masks (cur25/stream25) and span redaction masks
    * (cur28/stream27) accumulate on the ORIGINAL shards and every
    * loader pass pays the composed skip list (cur29's read); this
    * operator is the COMPACTION step that retires that mask debt: the
    * doubly-repacked corpus — takedown docs removed entirely,
    * surviving redact docs minus their spans, survivors re-packed in
    * the unchanged order ([[cur30Payload]]) — is EMITTED through
    * cur23's sink and audited FROM THE EMITTED FILES by the same
    * reassembly chain ([[payloadShardAudit]] verbatim — the re-emitted
    * corpus cannot be audited differently than the original). The
    * closing law is spec-pinned: the post-repack loader read equals
    * cur29's composed masked read hash-for-hash per (source, seq) —
    * after the emit, the masks are RETIRED (an empty skip list over
    * the new shards reads what the full skip list read over the old),
    * so the accumulated mask artifacts can be dropped, exactly as
    * cur26 retires cur25's whole-doc masks alone. cur26's
    * prefix-stability economics carry over: every shard before a
    * source's first dirty sequence (now min over BOTH families) is
    * byte-identical to the original emit, also spec-pinned.
    *
    * Scale: the only work beyond cur26's already-priced shape is the
    * per-survivor span slice (a map-side array op on redact-flagged
    * docs only); masks never touch this path at all — the redaction is
    * re-derived from the SAME finding coordinates the masks encode, so
    * the two executions can only agree if the mask emit, the composed
    * read, and this byte retire all place every span identically —
    * which is what the oracle hash proves per shard and the spec per
    * sequence.
    */
  def cur30ComposedRepack(spark: SparkSession, dir: String): DataFrame =
    payloadShardAudit(spark, cur30Payload(spark, dir),
      cur30OutDir(spark, dir), "cur30", dir)

  /** cur31's versioned mask-ledger directory (etl27's
    * deterministic-replay contract: reset + full lifecycle per call;
    * fixed per-dir path, so cur31 must not race ITSELF across
    * sessions — etl27's documented caveat).
    */
  private[graft] def cur31LedgerDir(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cur31_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** The two accumulated mask families as (whole-doc, span) frames —
    * ONE derivation for cur29's composed read, cur31's ledger, and
    * stream29's spec (the shared clipping grammar): the ledger the
    * vacuum retires is definitionally the composed skip list cur29's
    * loader read pays. Untagged (cur29's skip-list plan must not
    * change shape); the vacuum adds its per-family audit tag itself.
    */
  private[graft] def cur31MaskFamilies(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val man = cur18TrainManifest(spark, dir)
    val td = recalledMaskRows(man.filter(takedownFlag))
    val sp = docSpanMaskRows(man.filter(redactFlag)
        .withColumn("span_lo", redactSpanLo)
        .withColumn("span_hi", redactSpanHi))
    (td, sp)
  }

  /** cur31: MASK-LEDGER RETIREMENT (vacuum) — drop the accumulated
    * mask artifacts once the composed repack has retired them into
    * bytes (round-19 directive #1; the batch-completion bookkeeping
    * cleanup of the reference's pipeline — case_2/Normal.py:283-327 —
    * carried to the takedown ledger). Between repacks the two mask
    * families (cur25/stream25 whole-doc, cur28/stream27 span)
    * accumulate as versioned ledger artifacts and every loader pass
    * applies the latest composed version; after cur30's repack the
    * masks-retired law holds (empty skip list over the NEW shards
    * reads what the full list read over the old — spec-pinned from the
    * bytes in cur30), so the retired versions are not merely dead
    * weight: a loader that KEEPS applying a retired mask to the
    * repacked shards masks the WRONG offsets and silently drops valid
    * survivor tokens (the double-mask hazard, spec-pinned). The vacuum
    * therefore replays the ledger lifecycle and retires it through the
    * versioned-artifact retention contract:
    *  - v1: the whole-doc takedown rows (the family that fires first),
    *  - v2: the composed ledger (both families — the accumulated state
    *    cur29's read pays, published on stream25/27's feed cadence),
    *  - v3: the post-repack EMPTY ledger (the flip cur30 justifies:
    *    no mask applies to the re-emitted shards),
    * then [[graft.sources.CodebookStore.expireVersions]] with
    * keepLast = 1 drops v1/v2 — reads of retired versions fail LOUDLY
    * (etl27's read-after-expiry discipline; a loader can never
    * silently resolve a stale skip list), the current version can
    * never be expired (keepLast >= 1 refused), and the vacuum is
    * IDEMPOTENT (the immediate replay expiring nothing is enforced
    * here, not assumed — the retention algebra's no-op law).
    *
    * Returns the lifecycle audit, one row per published version
    * (content counted BEFORE the vacuum — afterwards the retired
    * versions are unreadable by contract): mask-row and per-family
    * counts, masked token mass, whether the version survives, and the
    * vacuum's expiry count. Scale: ledger artifacts are
    * recall+findings-sized frames (never corpus data — the
    * publishFrame artifact contract), the audit is three tiny
    * aggregates, and the vacuum itself is O(retired versions) file
    * deletes — a 100 TB deployment runs exactly this on the repack
    * cadence.
    */
  def cur31MaskVacuum(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.CodebookStore
    val base = cur31LedgerDir(dir)
    CodebookStore.reset(spark, base) // deterministic end-to-end replay
    val (td0, sp0) = cur31MaskFamilies(spark, dir)
    val td = td0.withColumn("family", lit("takedown"))
    val sp = sp0.withColumn("family", lit("span"))
    val composed = td.unionByName(sp)
    // The three lifecycle publishes overlap their snapshot writes
    // (round-21, guide §2.6 — publishFrames' batched claim+write): the
    // replay owns the store between reset and audit, so the batch
    // API's only caveat (non-monotone commit order mid-batch) cannot
    // be observed; versions, contents, and the audit are identical.
    CodebookStore.publishFrames(spark, base,
      Seq(td, composed, composed.filter(lit(false))))
    // ONE audit job over all committed versions (a per-version
    // agg+collect loop paid 3 scheduling round-trips for 3 tiny
    // frames); a version with zero rows still audits (the left frame
    // is the version list, never the rows).
    val byVersion = CodebookStore.versions(spark, base).map { v =>
      CodebookStore.frameAt(spark, base, v).withColumn("version", lit(v))
    }.reduce(_ unionByName _)
      .groupBy("version")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("family") === "takedown", 1L)
          .otherwise(0L)), lit(0L)).as("tn"),
        coalesce(sum(when(col("family") === "span", 1L)
          .otherwise(0L)), lit(0L)).as("sn"),
        coalesce(sum("masked_toks"), lit(0L)).as("mt"))
      .collect()
      .map(r => r.getAs[Long]("version") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("tn"), r.getAs[Long]("sn"),
          r.getAs[Long]("mt")))).toMap
    val audits = CodebookStore.versions(spark, base).map { v =>
      val (n, tn, sn, mt) = byVersion.getOrElse(v, (0L, 0L, 0L, 0L))
      (v, n, tn, sn, mt)
    }
    val expired = CodebookStore.expireVersions(spark, base, keepLast = 1)
    val replay = CodebookStore.expireVersions(spark, base, keepLast = 1)
    require(replay.isEmpty,
      s"mask vacuum must be idempotent — the replay expired $replay")
    val retained = CodebookStore.versions(spark, base).toSet
    import spark.implicits._
    audits.map { case (v, n, tn, sn, mt) =>
      (v, n, tn, sn, mt, retained(v), expired.size.toLong)
    }.toDF("version", "n_rows", "takedown_rows", "span_rows",
        "masked_toks", "retained", "n_expired")
      .orderBy("version")
  }

  def cur24Takedown(spark: SparkSession, dir: String): DataFrame = {
    val ctx = Cur18CtxTokens
    val before = cur18TrainManifest(spark, dir)
      .withColumn("takedown", takedownFlag)
    val after = sequencePackPositions(
        before.filter(!col("takedown"))
          .select(col("doc_id"), col("source"),
            col("post_toks").as("n_chars")),
        ctx)
      .select(col("doc_id"), col("seq_first").as("new_seq_first"),
        ((col("cum_end") - col("n_chars")) % ctx).as("new_off_first"))
    val moved = !col("takedown") &&
      (col("new_seq_first") =!= col("seq_first") ||
        col("new_off_first") =!= col("off_first"))
    val stable = !col("takedown") &&
      col("new_seq_first") === col("seq_first") &&
      col("new_off_first") === col("off_first")
    before.join(after, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_before"),
        sum(col("takedown").cast("long")).as("n_removed"),
        sum(when(col("takedown"), col("post_toks")).otherwise(0L))
          .as("toks_removed"),
        sum(stable.cast("long")).as("n_stable"),
        sum(moved.cast("long")).as("n_moved"),
        sum("post_toks").as("toks_before"),
        min(when(col("takedown"), col("seq_first"))).as("fd"))
      .select(col("source"), col("n_before"), col("n_removed"),
        col("toks_removed"), col("n_stable"), col("n_moved"),
        intDiv(col("toks_before") + (ctx - 1), lit(ctx)).as("seqs_before"),
        intDiv(col("toks_before") - col("toks_removed") + (ctx - 1),
          lit(ctx)).as("seqs_after"),
        // -1 = nothing recalled in this source (cur19's in-band zeros
        // discipline: a clean source is a row, not an absence).
        coalesce(col("fd"), lit(-1L)).as("first_dirty_seq"),
        when(col("fd").isNull, lit(0L)).otherwise(
          intDiv(intDiv(col("toks_before") + (ctx - 1), lit(ctx)) - 1,
            lit(Cur20SeqsPerShard)) -
            intDiv(col("fd"), lit(Cur20SeqsPerShard)) + 1)
          .as("shards_dirty"))
      .orderBy("source")
  }

  /** stream18's decision core — cur18's funnel on the INGEST cadence,
    * composed from the pinned-index decision cores the streaming
    * gates already run separately: the quality predicate (cur04's
    * C4-style gate, a pure function of the arrival's own text),
    * exact/near dedup against the corpus index
    * ([[Dedup.ingestDecisions]] — dedup11/stream09's core), the
    * boilerplate scrub against the corpus template index
    * ([[TextAnalysis.boilerplateScrub]] — text20/stream21's core,
    * round 15's leg), and decontamination spans against the held-out
    * window-hash index ([[Dedup.ingestContaminationSpans]] —
    * cur16/stream15's core) run over the arrival's POST-BOILER text —
    * cur18's stage order, so junction spans flag at the gate exactly
    * as in the batch build. One verdict per arrival with cur18's
    * stage precedence (cheapest rejection first): `drop_quality` →
    * `dup_exact` → `dup_near` → `drop_scrubbed` (the two scrubs
    * removed every token) → `admit`, plus the scrub audit (boiler
    * chunk/token counts, span count, removed and surviving token
    * counts) an admitted document carries into packing.
    *
    * The precedence is also the EVALUATION order, not only the
    * verdict order (round-14 ADVICE): the dedup, boilerplate, and
    * contamination legs are computed ONLY for arrivals that pass the
    * quality gate — a drop_quality arrival costs one predicate, never
    * an index probe. Per-arrival independent by construction — every
    * leg depends only on the arrival's own text and a pinned index —
    * so verdicts are invariant under re-batching (spec-pinned), and
    * streaming state is ZERO: the indexes ARE the state, refreshed on
    * the batch cadence.
    */
  private[graft] def ingestFunnelVerdicts(
      spark: SparkSession, dir: String, arrivals: DataFrame): DataFrame = {
    val toksC = tokens(col("text"))
    val stopRatio = TextAnalysis.stopRatio(toksC, langProfiles("en"))
    val base = arrivals.select(col("doc_id"), col("text"),
      size(toksC).cast("long").as("n_toks"),
      ((length(col("text")) >= 100) && (size(toksC) >= 20) &&
        (stopRatio >= 0.02)).as("q_keep"))
    // Short-circuit: only quality survivors reach the paid legs.
    val qual = base.filter(col("q_keep")).select("doc_id", "text")
    val dedup = Dedup.ingestDecisions(spark, dir, qual)
      .select(col("doc_id"), col("decision"), col("keeper_id"))
    val scrub = TextAnalysis.boilerplateScrub(
        qual, TextAnalysis.boilerplateHashes(spark, dir))
      .select(col("doc_id"), col("n_boiler"),
        (col("tokens_before") - col("tokens_after")).cast("long")
          .as("boiler_toks"),
        col("text_clean"))
    // The held-out probe runs over the text the boiler scrub LEFT —
    // unaffected arrivals keep their raw text (byte-identical).
    val postText = qual
      .join(broadcast(scrub.select(col("doc_id"), col("text_clean"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), col("text")).as("text"))
    val rm = Dedup.ingestContaminationSpans(spark, dir, postText)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("end_pos") - col("start_pos") + 1).as("toks_removed"))
    base
      .join(dedup, Seq("doc_id"), "left")
      .join(broadcast(scrub.drop("text_clean")), Seq("doc_id"), "left")
      .join(broadcast(rm), Seq("doc_id"), "left")
      .withColumn("n_boiler",
        coalesce(col("n_boiler"), lit(0)).cast("long"))
      .withColumn("boiler_toks", coalesce(col("boiler_toks"), lit(0L)))
      .withColumn("toks_removed", coalesce(col("toks_removed"), lit(0L)))
      .select(col("doc_id"),
        when(!col("q_keep"), lit("drop_quality"))
          .when(col("decision") === "exact", lit("dup_exact"))
          .when(col("decision") === "near", lit("dup_near"))
          .when(col("n_toks") === col("boiler_toks") + col("toks_removed"),
            lit("drop_scrubbed"))
          .otherwise(lit("admit")).as("verdict"),
        coalesce(col("keeper_id"), lit(-1L)).as("keeper_id"),
        col("n_toks"),
        col("n_boiler"),
        col("boiler_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        col("toks_removed"),
        (col("n_toks") - col("boiler_toks") - col("toks_removed"))
          .as("post_toks"))
  }

  def cur14EpochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val src = documents(spark, dir)
      .groupBy("source")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("src_tokens"))
    val budget = (sum("src_tokens").over(Window.partitionBy()) *
      EpochBudgetMult).as("budget")
    val cand = src
      .select(col("source"), col("src_tokens"), budget)
      .select(col("source"), col("src_tokens"), col("budget"),
        explode(sequence(lit(1), lit(MaxEpochs))).as("epoch"))
      .withColumn("utility", expr("shiftright(src_tokens, epoch - 1)"))
      .filter(col("utility") > 0)
    val wGreedy = Window
      .orderBy(col("utility").desc, col("source"), col("epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val taken = cand
      .withColumn("cum", sum("src_tokens").over(wGreedy))
      .filter(col("cum") <= col("budget"))
    src.join(taken.groupBy("source")
        .agg(count(lit(1)).as("epochs"), sum("src_tokens").as("tokens_used")),
        Seq("source"), "left")
      .select(col("source"), col("src_tokens"),
        coalesce(col("epochs"), lit(0L)).as("epochs"),
        coalesce(col("tokens_used"), lit(0L)).as("tokens_used"))
      .orderBy("source")
  }
}
