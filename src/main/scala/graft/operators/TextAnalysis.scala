package graft.operators

import graft.functions.GraftFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text-analysis surface text01–text09 over `documents` (SURVEY.md §2):
  * the per-document statistics an LLM-training-data pipeline computes at
  * corpus scale. Everything is built from codegen'd string/array
  * functions — per-document work, embarrassingly parallel, no shuffles
  * except the explicit corpus-level aggregations.
  */
object TextAnalysis {

  // Shared with cur10's quality selection — ONE list, so the score
  // formula can never drift between the two operators.
  private[operators] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Count of `toks` found in `words` — the integer numerator behind
    * the shared ratio builders.
    */
  private[operators] def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Fraction of `toks` found in `words` — the shared ratio builder
    * behind cur04's gate and cur06's pipeline stage (COMPARISONS, where
    * identical double arithmetic is engine-stable; presentations go
    * through intRatio instead).
    */
  private[operators] def stopRatio(toks: Column, words: Seq[String]): Column =
    stopHits(toks, words) / greatest(size(toks), lit(1)).cast("double")

  /** The composite quality score (length saturation × non-stopword
    * mass) at 4 dp. ONE definition, consumed by text02's scoring and
    * cur10's percentile cut: a tweak here moves both — the "FineWeb
    * cut" can never silently de-synchronize from the score it cuts on.
    * As an exact rational min(n,50)·(n−k) / (50·n) it is presented via
    * intRatio (integer half-up division — the text11 fix), never
    * round().
    */
  private[operators] def qualityScore(toks: Column): Column = {
    val nSafe = greatest(size(toks), lit(1))
    intRatio(least(size(toks), lit(50)) * (nSafe - stopHits(toks, stopwords)),
      lit(50) * nSafe, 4)
  }

  /** text01: tokenization + token/char counts. */
  def text01TokenizeCount(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        length(col("text")).as("n_chars_text"),
        // intRatio: exact integer ratios must not go through round()
        // (engine-divergent exactly ON the half grid — the text11 fix).
        intRatio(length(regexp_replace(col("text"), " ", "")),
          greatest(size(toks), lit(1)), 4).as("avg_token_len"))
      .orderBy("doc_id")
  }

  /** text02: quality scoring — stopword ratio, short-token ratio, and a
    * composite score. Mirrors the length/stopword heuristics used for
    * pre-training corpus filtering.
    */
  def text02QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nSafe = greatest(size(toks), lit(1))
    documents(spark, dir)
      .select(
        col("doc_id"),
        intRatio(stopHits(toks, stopwords), nSafe, 4).as("stop_ratio"),
        intRatio(size(filter(toks, t => length(t) <= 2)), nSafe, 4)
          .as("short_ratio"),
        qualityScore(toks).as("quality_score"))
      .orderBy("doc_id")
  }

  /** text03: language ID via stopword-profile scoring. Value-checked
    * against a DuckDB replay of the scorer; accuracy additionally
    * asserted in the spec on hand-built samples.
    */
  def text03LangId(spark: SparkSession, dir: String): DataFrame = {
    val lid = langId(col("text"))
    documents(spark, dir)
      .select(
        col("doc_id"),
        lid.getField("lang").as("pred_lang"),
        intRatio(lid.getField("hits"), lid.getField("total"), 4)
          .as("lang_score"))
      .orderBy("doc_id")
  }

  /** text04: document fingerprint — md5 of whitespace-normalized,
    * lowercased text (the exact-dedup key).
    */
  def text04Fingerprint(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"))
      .orderBy("doc_id")

  /** text05: corpus-level term frequency, top 20. Two-phase aggregate:
    * partial counts map-side, one shuffle on the word, then top-k as
    * TakeOrderedAndProject (no global sort).
    */
  def text05WordFreq(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** text06: PII-style redaction — digit runs replaced by a placeholder,
    * count of redactions kept for audit. Pure codegen regex per document
    * (embarrassingly parallel); the md5 keeps the oracle compare cheap
    * without shipping full redacted text around.
    */
  def text06PiiRedact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"))).as("n_numbers"),
        md5(regexp_replace(col("text"), "[0-9]+", "<NUM>")).as("redacted_md5"))
      .orderBy("doc_id")

  /** text08: BPE-style pretokenization counts — the GPT-2-family
    * pretokenizer shape (contractions / letter runs / digit runs /
    * punctuation runs, space-prefixed) restricted to a regex subset
    * that parses identically under Java regex and RE2, so the count is
    * engine-portable. This is the token statistic an LLM-data pipeline
    * budgets with; whitespace counts (text01) undercount code/punct-
    * heavy text.
    */
  def text08BpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val BpePattern = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"
    val toks = regexp_extract_all(col("text"), lit(BpePattern), lit(0))
    documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_bpe_tokens"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).as("n_word_tokens"),
        size(filter(toks, t => t.rlike("^ ?[0-9]+$"))).as("n_num_tokens"),
        intRatio(length(col("text")), greatest(size(toks), lit(1)), 4)
          .as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** text09: winnowing document fingerprints (the MOSS scheme): hash
    * every K-char-gram, then keep the minimum hash of each sliding
    * window of W grams — a position-robust fingerprint set that
    * guarantees any shared substring of length ≥ K+W-1 yields a shared
    * fingerprint. The k-gram hash is md5-derived (engine-portable —
    * DuckDB replays it verbatim).
    *
    * Winnowing is per-document work, so the whole selection runs inside
    * the native [[graft.functions.WinnowFingerprints]] expression: one
    * pass per document in the scan stage. The declarative twin (explode
    * every gram position → window min → distinct) computes the same set
    * but materializes one row per corpus CHARACTER and shuffles twice —
    * measured 4–6× slower at sf0.1; it survives as the spec oracle in
    * TextAnalysisSpec.
    */
  val WinnowK = 8
  val WinnowW = 4

  /** Per-document winnowed fingerprint SETS (doc_id, fps array<long>),
    * persisted through [[graft.GraftCache]]: text09 and dedup07 both
    * branch from one cached copy per (session, dir) — one row per doc,
    * cheap to pin, and the corpus-wide md5 pass runs once instead of
    * once per consumer.
    */
  private[operators] def winnowArrays(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"winnow.arrays:$dir:${graft.GraftCache.sessionTag(spark)}") {
      documents(spark, dir)
        .select(col("doc_id"),
          winnowFingerprints(col("text"), WinnowK, WinnowW).as("fps"))
    }

  def text09WinnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowArrays(spark, dir)
      .select(col("doc_id"), explode(col("fps")).as("fingerprint"))
      .orderBy("doc_id", "fingerprint")

  /** text10: repetition signals — the Gopher-style within-document
    * repetition measures (Rae et al. 2021, "Scaling Language Models:
    * ... Gopher", §A.1.1) used to drop degenerate/boilerplate docs:
    * top/duplicate word fraction and top/duplicate bigram fraction.
    * Shape: explode grams → per-(doc, gram) count → per-doc aggregate —
    * two shuffles, both with map-side partial aggregation; the bigram
    * stats left-join the word stats on doc_id (docs with <2 tokens have
    * no bigrams → fractions 0).
    */
  def text10Repetition(spark: SparkSession, dir: String): DataFrame = {
    def gramStats(grams: DataFrame, prefix: String): DataFrame =
      grams.groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(
          intRatio(max("n"), sum("n"), 4).as(s"top_${prefix}_frac"),
          intRatio(sum("n") - count(lit(1)), sum("n"), 4)
            .as(s"dup_${prefix}_frac"))
    val docs = documents(spark, dir)
    val words = docs.select(col("doc_id"), explode(tokens(col("text"))).as("g"))
    val toks = col("toks")
    val bigrams = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(when(size(toks) > 1,
        transform(sequence(lit(0), size(toks) - 2, lit(1)),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("g"))
    gramStats(words, "word")
      .join(gramStats(bigrams, "bigram"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("top_word_frac"), col("dup_word_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_bigram_frac"), lit(0.0)).as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  /** text07: corpus top-k bigram frequency — like text05 but over
    * 2-gram shingles (all occurrences, not per-doc distinct), the
    * n-gram statistics a tokenizer-training / contamination-check
    * pipeline computes. Two-phase agg after the explode; top-k is
    * TakeOrderedAndProject.
    */
  /** text11: corpus-conditional token surprisal — an LM-free novelty /
    * quality signal: the mean of −log₂ p(token | corpus unigram model)
    * over each document's tokens. Low = boilerplate built from the
    * corpus' most common words; high = rare-vocabulary documents —
    * the cheap first-pass proxy pipelines use before any model-based
    * perplexity filter.
    *
    * Two corpus passes by construction: the unigram table build (one
    * partial-aggregated groupBy) and the score join. The token join is
    * the honest 100 TB formulation — a real corpus' vocab (with noise
    * tokens) can exceed any broadcast budget, so frequencies flow
    * through a shuffle join keyed on the token. Per-token surprisal is
    * quantized to 1e-4 bits as an INTEGER, so the per-doc sum is exact
    * integer math — independent of summation order on both engines; a
    * raw double sum would be order-dependent and hash-unstable under
    * the oracle compare.
    */
  def text11Surprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    val freq = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").as("total"))
    toks.join(freq, Seq("t"))
      // 1-row broadcast of the corpus token count (same shape as
      // etl03's max-id frame): a scalar, never a shuffle.
      .crossJoin(broadcast(total))
      .withColumn("micro",
        round(-log2(col("cnt") / col("total")) * 10000).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("micro").as("m"))
      // Half-up rounding of the micro-mean in PURE INTEGER math:
      // round(M/N) = (2M + N) div (2N). The rational mean M/(N·10⁴)
      // CAN land exactly on the 4-dp half grid (measured: 5 of 500
      // docs at sf0.001), where JVM shortest-repr rounding and
      // DuckDB's binary rounding diverge — integer div cannot.
      .withColumn("avg_surprisal",
        expr("(2*m + n_tokens) div (2*n_tokens)") / 10000.0)
      .select(col("doc_id"), col("n_tokens"), col("avg_surprisal"))
      .orderBy("doc_id")
  }

  /** text12: WITHIN-document lexical diversity — per-doc unigram
    * Shannon entropy and type-token ratio. The complement of text11
    * (which scores a document against the CORPUS model): low entropy /
    * low TTR flags template and keyword-stuffed pages regardless of how
    * rare their vocabulary is globally — the Gopher-style repetition
    * family's information-theoretic summary.
    *
    * Shape: one (doc_id, token) partial-aggregated count, one per-doc
    * rollup — two compact-key shuffles, no joins at all (the per-doc
    * distribution needs no corpus table). Entropy uses the identity
    * H = log₂ n − (Σ c·log₂ c)/n with each TYPE's c·log₂ c quantized
    * to a 1e-4 integer, so the cross-type sum is exact integer math —
    * order-independent on both engines (text11's hash-stability trick).
    */
  def text12Entropy(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .withColumn("micro", round(col("c") * log2(col("c")) * 10000).cast("long"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("n_types"), sum("micro").as("m"))
      // log₂ n is quantized to the same 1e-4 integer grid as the type
      // terms, then the 4-dp presentation is integer half-up division
      // (text11's protocol): H·10⁴ ≈ lmicro − M/n, rounded as
      // (2·n·lmicro + n − 2M) div (2n). Without this, a power-of-two
      // n makes the entropy an exact rational that can sit ON the 4-dp
      // half grid (ttr = types/n can too, e.g. 1/32) — the
      // engine-divergent rounding text11 measurably hit.
      .withColumn("lmicro", round(log2(col("n")) * 10000).cast("long"))
      .withColumn("entropy",
        expr("(2*n*lmicro + n - 2*m) div (2*n)") / 10000.0)
      .withColumn("ttr", expr("(2*10000*n_types + n) div (2*n)") / 10000.0)
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_types"),
        col("entropy"), col("ttr"))
      .orderBy("doc_id")

  /** text14: GOPHER-RULES quality gate — the Rae et al. 2021 filter
    * family, completing the named-filter set alongside C4 (cur04) and
    * FineWeb-style percentile selection (cur10). Word-level rules only
    * (the corpus has no line structure): token count in [15, 5000],
    * mean word length in [3, 10], ≥ 80% of words contain an alphabetic
    * character, and at least 2 hits from the stopword list (the
    * "contains common English words" rule). Each rule is reported as
    * its measured value plus the composite pass flag, so threshold
    * tuning reads the same output. Pure per-row column logic in one
    * scan — embarrassingly parallel, no shuffle but the presentation
    * sort.
    */
  def text14GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val alphaHits = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val meanLen = sumLen.cast("double") / greatest(nTok, lit(1))
    val alphaFrac = alphaHits.cast("double") / greatest(nTok, lit(1))
    val nStopHits = stopHits(toks, stopwords)
    documents(spark, dir)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        intRatio(sumLen, greatest(nTok, lit(1)), 4).as("mean_word_len"),
        intRatio(alphaHits, greatest(nTok, lit(1)), 4).as("alpha_frac"),
        nStopHits.as("stop_hits"),
        (nTok.between(15, 5000) &&
          meanLen.between(3.0, 10.0) &&
          alphaFrac >= 0.8 &&
          nStopHits >= 2).cast("int").as("passes"))
      .orderBy("doc_id")
  }

  /** text13: bigram-LM surprisal — the CCNet-style step past text11's
    * unigram model: mean −log₂ p(token | previous token) under the
    * corpus' own bigram model, where p(t|p) = c(p,t) / c(p,·) over the
    * pair table. Boilerplate assembled from the corpus' common
    * CONTINUATIONS scores low even when its unigrams are unremarkable;
    * a rare-transition document scores high — the cheapest
    * model-conditional quality signal before real LM perplexity.
    *
    * Scale shape: the pair stream carries 8-byte xxhash64 keys (one for
    * the bigram, one for the preceding-token marginal) — bigram STRINGS
    * never shuffle, the same posture as dedup08's span hashes (a 64-bit
    * collision at corpus scale perturbs one count, never a ranking).
    * Both count tables partial-aggregate map-side; the frequency joins
    * are hash-keyed shuffle joins (a real corpus' bigram vocabulary
    * exceeds any broadcast budget — text11's argument); per-pair
    * surprisal is quantized to 1e-4-bit integers so the per-doc mean is
    * exact integer math, order-independent on both engines.
    */
  def text13BigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisalStats(documents(spark, dir))

  /** Core of text13 over any (doc_id, text) frame — separable so the
    * spec can replay a known corpus locally.
    */
  private[graft] def bigramSurprisalStats(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    val n = size(toks) - 1
    val pairs = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(when(n > 0,
        transform(sequence(lit(0), n - 1, lit(1)),
          i => struct(element_at(toks, i + 1).as("p"),
            element_at(toks, i + 2).as("t"))))
        .otherwise(array().cast("array<struct<p:string,t:string>>"))).as("bg"))
      .select(col("doc_id"),
        xxhash64(col("bg.p")).as("hp"),
        xxhash64(col("bg.p"), col("bg.t")).as("hbg"))
    val bigramCnt = pairs.groupBy("hbg").agg(count(lit(1)).as("cbg"))
    val prevCnt = pairs.groupBy("hp").agg(count(lit(1)).as("cp"))
    pairs.join(bigramCnt, Seq("hbg")).join(prevCnt, Seq("hp"))
      .withColumn("micro",
        round(-log2(col("cbg") / col("cp")) * 10000).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("micro").as("m"))
      // Integer half-up micro-mean — text11's half-grid-proof protocol.
      .withColumn("avg_bigram_surprisal",
        expr("(2*m + n_bigrams) div (2*n_bigrams)") / 10000.0)
      .select(col("doc_id"), col("n_bigrams"), col("avg_bigram_surprisal"))
      .orderBy("doc_id")
  }

  def text07Bigrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    val n = size(toks) - 1
    documents(spark, dir)
      .select(tokens(col("text")).as("toks"))
      .select(explode(when(n > 0,
        transform(sequence(lit(0), n - 1, lit(1)),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** Count-min sketch geometry for text15. Narrow on purpose: the
    * synthetic corpus draws from a ~31-word vocabulary (measured — at
    * every SF), so at 16 buckets per row every bucket holds ~2 words
    * and the sketch overcounts for real; the overestimates the spec
    * and oracle pin are non-trivial instead of vacuously zero. A real
    * deployment widens W with the vocabulary (the estimate error is
    * ≤ corpus mass / W per row); the protocol is W-independent.
    */
  val CmsDepth = 4
  val CmsWidth = 16

  /** Row-`i` bucket of a token under the engine-portable salted md5
    * contract — ONE definition shared by the batch sketch build, the
    * audit probes, and the streaming partial build (stream10), so the
    * hash can never drift between them.
    */
  private[graft] def cmsBucket(i: Int, t: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$i:"), t)), 1, 15), 16, 10)
      .cast("long"), lit(CmsWidth.toLong))

  /** CMS cells from a per-word count frame (`word`, `c`): each word's
    * count lands in its [[CmsDepth]] buckets. Addition commutes, so
    * sketches built from ANY partition of the corpus merge by summing
    * cells — the property stream10 exercises micro-batch by
    * micro-batch.
    */
  private[graft] def cmsFromCounts(counts: DataFrame): DataFrame =
    counts
      .select(col("c"),
        posexplode(array((0 until CmsDepth).map(i =>
          cmsBucket(i, col("word"))): _*)).as(Seq("row_i", "bkt")))
      .groupBy("row_i", "bkt")
      .agg(sum("c").as("cnt"))

  /** The CMS contribution of one document frame (any frame with a
    * `text` column — a micro-batch, a partition, the whole corpus):
    * (row_i, bkt, cnt) cells, ≤ Depth×Width rows however many
    * documents went in. stream10 lands one of these per micro-batch;
    * the corpus sketch is their cell-wise sum.
    */
  def cmsPartial(docs: DataFrame): DataFrame =
    cmsFromCounts(docs
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("c")))

  /** text15: COUNT-MIN-SKETCH heavy hitters, audited against the exact
    * counts — the fixed-memory frequency structure a 100 TB vocabulary
    * pass actually ships (Cormode & Muthukrishnan 2005). The sketch is
    * [[CmsDepth]]×[[CmsWidth]] integer counters whatever the corpus
    * size: each row hashes every token into [[CmsWidth]] buckets with
    * an independent salted hash, estimate(t) = min over rows of the
    * bucket count — never an underestimate, and over by at most the
    * collision mass per row. The output audits the sketch value-for-
    * value: the exact top-20 tokens (text05's protocol) with their CMS
    * estimates, the overestimate delta, and the guarantee bit
    * `est >= exact` — in-band and analytically certain, the q30
    * pattern for pinning sketch semantics through a value-exact oracle.
    *
    * Plan shape: ONE exploded token scan builds the per-word count
    * aggregate (map-side partial sums); the sketch is derived from
    * that |vocab|-row frame by bucketing each word's count — an exact
    * algebraic regrouping of the stream build (addition commutes), at
    * a fraction of the hashing (Depth md5s per WORD, not per token
    * instance; measured, the instance-stream build cost 2.1 s at sf0.1
    * against ~0.3 s for the rest of the query). At 100 TB the sketch
    * IS the deliverable and the same map-side-combine shape feeds
    * (row, bucket) cells straight off the stream — what changes is
    * only whether the per-word frame is materialized; the exact twin
    * here exists to prove the estimates, at a scale where the ground
    * truth is still computable. Hashes are the engine-portable md5
    * contract (the SimHash family's rule), so DuckDB replays build →
    * estimate → audit bit-for-bit.
    */
  def text15CmsTopk(spark: SparkSession, dir: String): DataFrame = {
    // Pinned: the |vocab|-row aggregate feeds both the sketch build and
    // the top-20 — without the pin each branch would rescan the corpus.
    val counts = graft.GraftCache.getOrPersist(
      s"text15.counts:$dir:${graft.GraftCache.sessionTag(spark)}") {
      documents(spark, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("exact_cnt"))
    }
    val sketch = cmsFromCounts(counts.select(col("word"),
      col("exact_cnt").as("c")))
    val top = counts
      .orderBy(col("exact_cnt").desc, col("word"))
      .limit(20)
    val probes = top
      .select(col("word"), col("exact_cnt"),
        posexplode(array((0 until CmsDepth).map(i =>
          cmsBucket(i, col("word"))): _*)).as(Seq("row_i", "bkt")))
    probes.join(broadcast(sketch), Seq("row_i", "bkt"))
      .groupBy("word", "exact_cnt")
      .agg(min("cnt").as("cms_est"))
      .select(col("word"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"),
        (col("cms_est") >= col("exact_cnt")).as("never_under"))
      .orderBy(col("exact_cnt").desc, col("word"))
  }

  /** Minimum bigram support for text16. PMI is unstable below a
    * handful of occurrences (a 1-count pair of two 1-count words gets
    * the corpus-max score — Church & Hanks 1990's caveat), so mining
    * floors the support; the floor also bounds what reaches the
    * ranking sort to the heavy tail of the pair table.
    */
  val PmiMinSupport = 5L

  /** text16: PMI collocation mining — the corpus' top word PAIRS by
    * pointwise mutual information, log₂(c(p,t)·N / (c(p)·c(t))): how
    * much more often the pair co-occurs than its words' frequencies
    * predict. The classic collocation extractor (Church & Hanks 1990)
    * and the complement of text07's raw-count ranking, which surfaces
    * pairs of common words; PMI surfaces pairs that are GLUED —
    * named-entity fragments, idioms, templated boilerplate — exactly
    * the multi-word units a tokenizer/vocab audit wants ranked first.
    *
    * Scale shape: one corpus scan feeds the unigram aggregate, one the
    * pair aggregate (both partial-aggregate map-side before their
    * compact-key shuffles); the support floor cuts the pair table to
    * its heavy tail BEFORE the two frequency joins (hash-keyed — a real
    * corpus' vocabulary exceeds any broadcast budget, text11's
    * argument); the bigram total is a 1-row broadcast scalar. The
    * ranking sorts only the floored survivors through a TakeOrdered
    * top-20. PMI itself is quantized to a 1e-4 integer on BOTH engines
    * (the text11/13 protocol) so the ranking key is a long, not a raw
    * double.
    */
  def text16PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    val n = size(toks) - 1
    val words = documents(spark, dir)
      .select(explode(tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    val pairs = documents(spark, dir)
      .select(tokens(col("text")).as("toks"))
      .select(explode(when(n > 0,
        transform(sequence(lit(0), n - 1, lit(1)),
          i => struct(element_at(toks, i + 1).as("p"),
            element_at(toks, i + 2).as("t"))))
        .otherwise(array().cast("array<struct<p:string,t:string>>"))).as("bg"))
      .select(col("bg.p").as("p"), col("bg.t").as("t"))
    val total = pairs.agg(count(lit(1)).as("nn"))
    pairs.groupBy("p", "t").agg(count(lit(1)).as("cbg"))
      .filter(col("cbg") >= PmiMinSupport)
      .join(words.select(col("t").as("p"), col("c").as("cp")), Seq("p"))
      .join(words.select(col("t"), col("c").as("ct")), Seq("t"))
      // 1-row broadcast of the corpus pair count (text11's scalar
      // pattern: a crossJoin of a broadcast singleton, never a shuffle).
      .crossJoin(broadcast(total))
      // All factors go to DOUBLE before multiplying: counts at 100 TB
      // (~1e13) would overflow a Long product on both engines, while
      // the IEEE double product/quotient is correctly rounded and
      // identically parenthesized in the oracle.
      .withColumn("micro",
        round(log2(col("cbg").cast("double") * col("nn") /
          (col("cp").cast("double") * col("ct"))) * 10000).cast("long"))
      .select(concat_ws(" ", col("p"), col("t")).as("bigram"),
        col("cbg").as("n"), (col("micro") / 10000.0).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(20)
  }

  /** Merge rounds text17 trains — small like sim09's Lloyd rounds, so
    * the oracle's generated CTE chain stays readable while every round
    * is still value-checked.
    */
  val BpeMerges = 12

  /** text17: BPE merge TRAINING (Sennrich, Haddow & Birch 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") —
    * the trainer next to text08's GPT-2-shape pretokenizer: learn the
    * merge table itself, the vocab artifact an LLM pipeline ships to
    * its tokenizer. Each round counts adjacent symbol pairs over the
    * current segmentation (weighted by word frequency, every adjacent
    * occurrence — Sennrich's `get_stats`), merges the most frequent
    * pair corpus-wide (ties broken lexicographically), and re-segments.
    * Output: one row per merge — (rank, lhs, rhs, merged, cnt).
    *
    * Scale shape — the reason BPE training is feasible at 100 TB: the
    * corpus is scanned ONCE into a word-frequency table (vocab-sized,
    * sublinear in the corpus by Heaps' law) and all training rounds
    * iterate over that table, exactly as the reference algorithm
    * trains on word counts. Per round: one vocab-sized pair aggregate
    * (map-side partial, compact string keys), a top-1 collect (the
    * sim09 codebook-scalar contract — O(1) rows to the driver, never
    * the vocab), and a codegen'd literal `replace` re-segmentation.
    * Words are restricted to `^[a-z]+$` so the `(sym)` wrapping that
    * makes left-to-right non-overlapping `replace` equal greedy BPE
    * merging is unambiguous (parens can never appear inside a symbol).
    *
    * The DuckDB oracle replays every round value-for-value through a
    * generated CTE chain ([[graft.SparkEntry]]'s bpeCteSql — the
    * kmeansCteSql pattern): same pair counting, same tie-break, same
    * non-overlapping replace, so a divergence in ANY round's chosen
    * pair breaks all later rounds and the hash.
    */
  def text17BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir).toDF("rank", "lhs", "rhs", "merged", "cnt")
      .orderBy("rank")
  }

  /** The corpus' `^[a-z]+$` word-frequency table with the initial
    * (sym)-wrapped character segmentation — the vocab-sized frame all
    * BPE rounds (and text18's encode) iterate over.
    */
  private def bpeWords(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"text17.words:$dir:${graft.GraftCache.sessionTag(spark)}") {
      documents(spark, dir)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w").rlike("^[a-z]+$"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .select(col("w"), col("freq"),
          regexp_replace(col("w"), "(.)", "($1)").as("seg"))
    }

  /** Trained merge tables, one per (dir, session) — text17 renders the
    * table, text18 applies it; the 12-round training loop runs ONCE per
    * session however many consumers ask (the corpusBlooms pattern:
    * computeIfAbsent + eviction on GraftCache.release()).
    */
  private val bpeMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, String, String, String, Long)]]()
  graft.GraftCache.onRelease(() => bpeMergeCache.clear())

  private[graft] def trainedMerges(spark: SparkSession, dir: String)
      : Seq[(Int, String, String, String, Long)] =
    bpeMergeCache.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => {
        var cur = bpeWords(spark, dir)
        val merges = Seq.newBuilder[(Int, String, String, String, Long)]
        for (r <- 1 to BpeMerges) {
          val syms = regexp_extract_all(col("seg"), lit("\\(([^)]*)\\)"), lit(1))
          val n = size(col("s")) - 1
          val top = cur
            .select(col("freq"), syms.as("s"))
            .select(col("freq"), explode(when(n > 0,
              transform(sequence(lit(0), n - 1, lit(1)),
                i => struct(element_at(col("s"), i + 1).as("a"),
                  element_at(col("s"), i + 2).as("b"))))
              .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
            .groupBy(col("p.a").as("a"), col("p.b").as("b"))
            .agg(sum("freq").as("cnt"))
            .orderBy(col("cnt").desc, col("a"), col("b"))
            .limit(1)
            .collect()
          require(top.nonEmpty, s"BPE round $r: no pairs left to merge")
          val (a, b, cnt) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r, a, b, a + b, cnt))
          cur = cur.select(col("w"), col("freq"),
            replace(col("seg"), lit(s"($a)($b)"), lit(s"($a$b)")).as("seg"))
        }
        merges.result()
      })

  /** text18: ENCODE the corpus with the trained tokenizer — text17
    * learns the merge table, this applies it, which is the pair every
    * real pipeline ships (train once, tokenize everything; the
    * resulting token counts are what sequence packing (cur09) and
    * token budgeting (cur08/cur14) meter against). Per document:
    * number of `^[a-z]+$` word occurrences and their total subword
    * count under the learned vocabulary.
    *
    * Scale shape: the merge table applies to the VOCAB (one chained
    * codegen'd `replace` pass per merge over vocab-sized rows — the
    * standard trick: tokenize distinct words once, not every
    * occurrence), and the corpus token stream then joins the tiny
    * encoded vocab (broadcast) to aggregate per doc. Training cost is
    * shared with text17 through the per-session merge cache.
    */
  /** text19: TF-IDF KEYWORD extraction — each document's top-5 terms
    * by tf·idf, the per-document "aboutness" summary search indexing,
    * tagging, and topic-drift monitoring pipelines keep alongside the
    * quality scores. idf = log₂((N+1)/(df+1)) (add-one damped), with
    * each TERM's idf quantized to a 1e-4 integer (the text11/text12
    * protocol — the per-term quantization makes tf·idf an integer
    * product, so ranking and presentation are exact integer math and
    * engine order can never flip a rank; ties break on the term).
    *
    * Shape: one (doc, term) partial-aggregated count, a vocab-sized df
    * rollup joined back on the term hash-key, a 1-row broadcast of N,
    * and the per-doc top-5 through [[graft.plans.TopKPerKey]] — the
    * custom bounded-heap operator (q26's), so no per-doc window SORT
    * exists at any corpus size: the heap keeps 5 rows per doc through
    * one partial+final pass, the same plan q26 audits.
    */
  def text19TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val tf = documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("t"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_micro",
        round(log2((col("n_docs") + 1).cast("double") / (col("df") + 1)) * 10000)
          .cast("long"))
      .select(col("doc_id"), col("t").as("term"), col("tf"), col("df"),
        (col("tf") * col("idf_micro")).as("score_micro"))
    graft.plans.TopKPerKey(
        scored,
        keyCols = Seq("doc_id"),
        orderCols = Seq(("score_micro", true), ("term", false)),
        k = 5)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        (col("score_micro") / 10000.0).as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  def text18BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMerges(spark, dir)
    val seg = merges.foldLeft(col("seg")) { case (c, (_, a, b, m, _)) =>
      replace(c, lit(s"($a)($b)"), lit(s"($m)"))
    }
    // Subword count = number of '(' in the final segmentation (each
    // symbol contributes exactly one) — pure length arithmetic, so the
    // oracle computes it identically.
    val encoded = bpeWords(spark, dir)
      .select(col("w"), seg.as("seg"))
      .select(col("w"),
        (length(col("seg")) - length(replace(col("seg"), lit("("), lit(""))))
          .as("n_sub"))
    documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .join(broadcast(encoded), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Distinct-document threshold above which a span is BOILERPLATE
    * (text20): nd ≥ 3 separates template mass (headers, footers, nav —
    * the thing every crawl pipeline strips) from pairwise near-dup
    * structure (nd = 2 spans belong to dedup08/dedup03's pair space,
    * which dedup — not boilerplate removal — owns). Measured on the
    * driver corpus: nd ≥ 3 spans exist at every sf (9 / 7 / 45 hashes
    * at sf0.001/0.01/0.1), so the threshold is exercised, while nd = 2
    * would misclassify ~1,000 near-dup spans at sf0.1 as template.
    */
  val BoilerplateMinDocs = 3

  /** text20: BOILERPLATE removal — the CCNet/RefinedWeb-style scrub
    * every crawl pipeline runs before training: spans repeated across
    * ≥ [[BoilerplateMinDocs]] DISTINCT documents are template mass
    * (headers, footers, navigation), and affected documents are
    * REWRITTEN with those spans dropped. The detection sibling of
    * dedup08 (which reports per-doc duplication stats) with cur17's
    * rewrite discipline (span-granularity scrub, document kept).
    *
    * Composition, not reimplementation: the chunk grammar IS
    * dedup08's [[Dedup.spanHashRows]] (one non-overlapping
    * ParagraphTokens-token span per chunk index, shared GraftCache
    * pin), and the rewrite keys on the chunk INDEX carried by that
    * frame — the scrub cannot chunk differently than the detector.
    * Scale shape: the span frame is linear (one row per K tokens), the
    * frequency aggregate shuffles 8-byte hashes with map-side combine,
    * flagged marks aggregate to a tiny affected-docs frame that joins
    * back BROADCAST (cur17's evidence-mark posture), and the rewrite
    * is codegen HOFs over the token array in the scan stage — no
    * corpus doc_id shuffle anywhere.
    *
    * The oracle replays chunking, frequency, and the rewrite on chunk
    * STRINGS (the hash↔string bijection premise dedup08's oracle
    * already rests on) and rebuilds the cleaned text from kept chunks
    * plus the sub-chunk tail, value-equal to the engine's token-level
    * filter.
    */
  def text20BoilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    corpusBoilerplateScrub(spark, dir)
      .select("doc_id", "n_chunks", "n_boiler", "tokens_before",
        "tokens_after", "text_clean")
      .orderBy("doc_id")

  /** The corpus' boilerplate-AFFECTED docs + their rewrites (source
    * carried), pinned per (dir, session) — ONE definition of "the
    * corpus, boilerplate-scrubbed" shared by the text20 entry and
    * cur18's funnel (which consumes it twice: the removed-token audit
    * and the post-scrub window rebuild), so the composed build cannot
    * scrub differently than the standalone operator. Tiny at rest:
    * only docs with ≥1 template chunk appear.
    */
  private[graft] def corpusBoilerplateScrub(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"text20.scrub:$dir:${graft.GraftCache.sessionTag(spark)}") {
      boilerplateScrub(documents(spark, dir), boilerplateHashes(spark, dir),
        chunks = Some(corpusChunkRows(spark, dir)), carry = Seq("source"))
    }

  /** The corpus chunk frame under dedup08's shared GraftCache pin —
    * one definition of "the corpus, chunked" for dedup08, text20, and
    * the boilerplate hash build.
    */
  private def corpusChunkRows(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"dedup.spanHashes:$dir:${graft.GraftCache.sessionTag(spark)}") {
      Dedup.spanHashRows(documents(spark, dir))
    }

  /** The corpus' boilerplate span-hash set — spans in ≥
    * [[BoilerplateMinDocs]] distinct documents, pinned per (dir,
    * session). Tiny by the threshold (45 hashes at sf0.1); shared by
    * batch text20 and the stream21 ingest gate, so the two cannot
    * disagree on what counts as template mass.
    */
  private[graft] def boilerplateHashes(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"text20.boiler:$dir:${graft.GraftCache.sessionTag(spark)}") {
      corpusChunkRows(spark, dir).groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= BoilerplateMinDocs)
        .select(col("h"))
    }

  /** Scrub core over ANY (doc_id, text) frame against a given
    * boilerplate hash set — separable so stream21 runs the IDENTICAL
    * decision + rewrite per micro-batch (the stream15 posture) and the
    * spec can drive fixture corpora. `chunks` lets the batch caller
    * hand in the PINNED corpus chunk frame instead of re-chunking.
    */
  private[graft] def boilerplateScrub(
      docs: DataFrame, boiler: DataFrame,
      chunks: Option[DataFrame] = None,
      carry: Seq[String] = Nil): DataFrame = {
    val k = Dedup.ParagraphTokens
    val marks = chunks.getOrElse(Dedup.spanHashRows(docs))
      .join(broadcast(boiler.select(col("h"))), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_set(col("idx")).as("drop_idx"))
    val t = tokens(col("text"))
    val kept = filter(t, (tok, i) =>
      (i >= (size(t) / k).cast("int") * k) ||
        !array_contains(col("drop_idx"), (i / k).cast("int")))
    docs
      .join(broadcast(marks), Seq("doc_id"))
      .select(col("doc_id") +: carry.map(col) ++: Seq(
        (size(t) / k).cast("int").as("n_chunks"),
        size(col("drop_idx")).as("n_boiler"),
        size(t).as("tokens_before"),
        size(kept).as("tokens_after"),
        concat_ws(" ", kept).as("text_clean")): _*)
  }

  /** text21 protocol constants — interpolated into the generated
    * DuckDB oracle (etl27's shared-constant discipline, so a retune
    * cannot drift the two sides). Seed = every single character that
    * occurs in the word table (guarantees every word segmentable) plus
    * the top [[UnigramSeedMulti]] substrings of length
    * 2..[[UnigramMaxPiece]] by corpus-weighted occurrence count (ties
    * to the lexicographically smaller piece). [[UnigramIters]] hard-EM
    * rounds re-estimate the piece distribution.
    */
  val UnigramSeedMulti = 48
  val UnigramIters = 3
  val UnigramMaxPiece = 4

  /** Sentinel cost for a substring OUTSIDE the vocabulary (a Viterbi
    * path can never afford it; single-char coverage guarantees a
    * finite path always exists). Far below Long overflow when summed
    * across a word: max word length × HUGE ≪ 2⁶³.
    */
  val UnigramHugeCost = 1000000000000000L

  /** The trained unigram model per (dir, session) — text21 renders it;
    * the [[UnigramIters]]-round EM runs ONCE per session (the
    * bpeMergeCache pattern).
    */
  private val unigramModelCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, Long)]]()
  graft.GraftCache.onRelease(() => unigramModelCache.clear())

  /** The piece-cost table for one EM round: add-one-smoothed negative
    * log-probability in 1e-4 integer micros —
    * round(−log2((cnt+1)/(total+|V|))·10⁴). Computed through the
    * ENGINE's log2/round (one vocab-sized local frame), never JVM
    * math: text11 proved Spark's log2+round agree with DuckDB's
    * digit-for-digit under this quantization; StrictMath would not.
    */
  private def unigramCosts(spark: SparkSession,
      counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    import spark.implicits._
    val total = counts.map(_._2).sum
    val v = counts.size.toLong
    counts.toDF("piece", "cnt")
      .select(col("piece"),
        round(-log2((col("cnt") + 1) / lit((total + v).toDouble)) * 10000)
          .cast("long").as("cost"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  /** Best split point for position `j` of the word under `costMap`:
    * the (cumulative cost, start index) pair minimizing
    * dp[i] + cost(w[i..j)), scanning candidate starts ASCENDING with a
    * strict `<` so ties keep the SMALLEST i (the longest piece) — the
    * same verdict DuckDB's struct list_sort on (cost, i) produces.
    */
  private def unigramBest(costMap: Column, dp: Column,
      j: Column): Column =
    aggregate(
      sequence(greatest(j - UnigramMaxPiece, lit(0)), j - 1),
      struct(lit(UnigramHugeCost).as("c"), lit(-1).as("i")),
      (b, i) => {
        val cand = element_at(dp, i + 1) +
          coalesce(element_at(costMap, col("w").substr(i + 1, j - i)),
            lit(UnigramHugeCost))
        when(cand < b.getField("c"),
          struct(cand.as("c"), i.cast("int").as("i"))).otherwise(b)
      })

  /** The trained unigram model: final-round piece counts, vocab-sized.
    *
    * Hard-EM (Viterbi) over the word-frequency table: the E-step
    * segments every DISTINCT word by dynamic programming under the
    * current piece costs — both the forward DP and the backtrack run
    * as higher-order-function projections (aggregate over positions
    * with the vocab-sized cost table as a literal map), so the whole
    * E-step is ONE codegen'd map-side pass over the vocab-sized word
    * frame: no join, no shuffle, no unrolled plan. The M-step is one
    * vocab-sized aggregate (piece occurrences weighted by word
    * frequency) collected at O(|V|) rows — the sim09 codebook-scalar
    * contract — and the re-quantized cost table feeds the next round.
    */
  private[graft] def unigramModel(spark: SparkSession, dir: String)
      : Seq[(String, Long)] =
    unigramModelCache.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => {
        import spark.implicits._
        val words = bpeWords(spark, dir).select("w", "freq")
        // Seed: all substrings of length 1..UnigramMaxPiece, corpus-
        // weighted (every start position of every word occurrence).
        val allSubs = flatten(transform(sequence(lit(1), length(col("w"))),
          s => transform(
            sequence(lit(1), least(lit(UnigramMaxPiece),
              length(col("w")) - s + 1)),
            l => col("w").substr(s, l))))
        val subs = words.select(col("freq"), explode(allSubs).as("piece"))
          .groupBy("piece").agg(sum("freq").as("cnt"))
        val seed = subs.filter(length(col("piece")) === 1)
          .unionByName(subs.filter(length(col("piece")) > 1)
            .orderBy(col("cnt").desc, col("piece")).limit(UnigramSeedMulti))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
          .sortBy(_._1)
        val vocab = seed.map(_._1)
        var counts = seed
        for (_ <- 1 to UnigramIters) {
          val costMap = typedlit(unigramCosts(spark, counts).toMap)
          val got = words.withColumn("dp", unigramDpCol(costMap))
            .select(col("freq"), explode(unigramPiecesCol(costMap)).as("piece"))
            .groupBy("piece").agg(sum("freq").as("cnt"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          counts = vocab.map(p => p -> got.getOrElse(p, 0L))
        }
        counts
      })

  /** Forward Viterbi DP over the `w` column: dp[j] = min cost of
    * segmenting w[0..j) under `costMap` — the ONE DP definition the
    * training E-steps (text21) and the corpus encode (text22) share.
    */
  private def unigramDpCol(costMap: Column): Column =
    aggregate(
      sequence(lit(1), length(col("w"))),
      array(lit(0L)),
      (acc, j) => concat(acc,
        array(unigramBest(costMap, acc, j).getField("c"))))

  /** The Viterbi-best piece sequence for `w` (requires the `dp` column
    * from [[unigramDpCol]]): walk pos from len to 0 collecting the
    * chosen pieces — length(w) fold steps always suffice (every step
    * consumes at least one character or is a no-op at pos 0).
    */
  private def unigramPiecesCol(costMap: Column): Column =
    aggregate(
      sequence(lit(1), length(col("w"))),
      struct(length(col("w")).as("pos"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val i = unigramBest(costMap, col("dp"), pos).getField("i")
        when(pos <= 0, st).otherwise(
          struct(i.as("pos"),
            concat(st.getField("ps"),
              array(col("w").substr(i + 1, pos - i))).as("ps")))
      }).getField("ps")

  /** text21: UNIGRAM-LM tokenizer TRAINING (Kudo 2018, "Subword
    * Regularization", arXiv:1804.10959 — the SentencePiece unigram
    * model) — the second trained tokenizer family next to text17's
    * BPE: where BPE greedily composes the vocabulary bottom-up one
    * merge at a time, the unigram model starts from a LARGE seed
    * vocabulary and lets EM re-estimate each piece's probability under
    * the best segmentations, the shape production tokenizers ship
    * (fixed vocab here — SentencePiece's periodic pruning is the
    * vocabulary-SIZE schedule on top of exactly this re-estimation
    * core; pieces EM abandons land at count 0 with a finite smoothed
    * cost, visibly dead in the output).
    *
    * Determinism protocol: costs are add-one-smoothed negative log2
    * probabilities quantized to 1e-4 integer micros (text11's proven
    * cross-engine protocol), the Viterbi tie-break is
    * smallest-start-index (longest piece), and the DuckDB oracle
    * replays ALL [[UnigramIters]] rounds value-for-value through a
    * generated recursive-CTE chain (the kmeansCteSql/bpeCteSql
    * pattern): the same seed cut, the same DP recurrence, the same
    * backtrack, the same quantized costs — a divergence in any
    * round's segmentation of any word moves a count and breaks the
    * hash.
    *
    * Scale shape (text17's Heaps argument): the corpus is scanned
    * once into the word-frequency table; every EM round is one
    * map-side HOF projection over that vocab-sized frame plus one
    * vocab-sized aggregate; driver state is O(|V|) — the codebook
    * contract. Output: one row per vocab piece with its final count
    * and re-quantized cost, ranked by (count desc, piece).
    */
  def text21UnigramTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fin = unigramModel(spark, dir)
    val total = fin.map(_._2).sum
    val v = fin.size.toLong
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("piece"))
    fin.toDF("piece", "cnt")
      .withColumn("cost_micro",
        round(-log2((col("cnt") + 1) / lit((total + v).toDouble)) * 10000)
          .cast("long"))
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("piece"), col("cnt"), col("cost_micro"))
      .orderBy("rank")
  }

  /** text22: ENCODE the corpus with the trained unigram model — the
    * train/apply pair for the second tokenizer family (text17→text18
    * is BPE's; this is text21's), which is what a pipeline ships:
    * train once, tokenize everything, meter packing (cur09) and
    * budgets (cur08/cur14) in the resulting token counts. Each word
    * segments by the SAME Viterbi DP the trainer ran
    * ([[unigramDpCol]]/[[unigramPiecesCol]] — one definition), under
    * the SHIPPED model: the final-round counts re-quantized, exactly
    * text21's output `cost_micro` column (a loader pairing text21's
    * table with this encode sees consistent numbers by construction).
    * Per document: word occurrences, total piece count, and the total
    * Viterbi path cost in micros — the cost sum pins the chosen PATHS,
    * not just their lengths, so the oracle catches a tie broken
    * differently even when the piece COUNT happens to match.
    *
    * Scale shape (text18's): the model applies to the VOCAB (one HOF
    * projection over distinct words — tokenize each word once, not
    * every occurrence), and the corpus stream joins the tiny encoded
    * vocab broadcast to aggregate per doc. Training cost is shared
    * with text21 through the per-session model cache.
    */
  def text22UnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val costMap = typedlit(
      unigramCosts(spark, unigramModel(spark, dir)).toMap)
    val encoded = bpeWords(spark, dir)
      .select(col("w"))
      .withColumn("dp", unigramDpCol(costMap))
      .select(col("w"),
        size(unigramPiecesCol(costMap)).cast("long").as("n_pieces"),
        element_at(col("dp"), length(col("w")) + 1).as("w_cost"))
    documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .join(broadcast(encoded), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_unigram_tokens"),
        sum("w_cost").as("cost_micro_sum"))
      .orderBy("doc_id")
  }
}
