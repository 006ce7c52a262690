package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the operators.
  *
  * Everything here composes codegen'd built-in functions (or the native
  * [[CosineSimilarity]] expression) — no Scala UDFs, so each builder
  * stays inside WholeStageCodegen and Catalyst can push/prune around it.
  */
object GraftFunctions {

  /** Cosine similarity of two ARRAY<DOUBLE> columns (native expression). */
  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(
      CosineSimilarity(GraftShim.expression(a), GraftShim.expression(b)))

  /** Euclidean distance of two ARRAY<DOUBLE> columns (native expression). */
  def l2Distance(a: Column, b: Column): Column =
    GraftShim.column(
      L2Distance(GraftShim.expression(a), GraftShim.expression(b)))

  /** Distinct hashed word n-gram shingles of a STRING column as
    * ARRAY<BIGINT> (native expression — tokenize, hash, combine, dedup
    * in one per-document pass).
    */
  def shingleHashes(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(text), n))

  /** Half-up rounding of the EXACT rational num/den to `dp` decimals in
    * PURE INTEGER math — round(a/b) = (2a + b) div (2b) for a, b ≥ 0 —
    * presented as the scaled double (a dp-decimal, exactly convertible
    * on every engine). `round(num/den, dp)` of an integer ratio is NOT
    * engine-portable: the rational can land exactly ON the half-way
    * grid, where JVM shortest-repr rounding and binary rounding diverge
    * (text11 measurably hit this at sf0.001 — 5 docs in 500). Integer
    * division cannot diverge, at any magnitude (no double round-trip).
    */
  def intRatio(num: Column, den: Column, dp: Int): Column = {
    val s = math.pow(10, dp).toLong
    // The scaled numerator 2·10^dp·num is computed in DECIMAL(38,0),
    // not Long: at dp=6 a Long numerator silently wraps once num
    // exceeds ~4.6e12 (cur02's numerator is total corpus CHARS — a
    // magnitude a 100 TB corpus actually reaches), and with ANSI off
    // the wrap is invisible until the oracle (whose sum() is HUGEINT)
    // diverges. Decimal keeps 38 digits through the multiply; the
    // remaining bound is the QUOTIENT (IntegralDivide returns LONG):
    // the RATIO must stay under ~9.2e18/10^dp — every presented
    // mean/share/rate is human-scale, so only the numerator grows
    // with the corpus and the contract holds at any data size.
    val n = num.cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    GraftShim.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      GraftShim.expression(lit(2L * s).cast("decimal(38,0)") * n + d),
      GraftShim.expression(lit(2L).cast("decimal(38,0)") * d))) / s.toDouble
  }

  /** Integer division num div den in pure Long arithmetic
    * (IntegralDivide — the DuckDB twin is `//`). For deriving
    * selection thresholds and other exact integer quantities where
    * `floor(double_ratio * scale)` could land a double-rounding away
    * from the true value and silently diverge between engines.
    */
  def intDiv(num: Column, den: Column): Column =
    GraftShim.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      GraftShim.expression(num.cast("long")),
      GraftShim.expression(den.cast("long"))))

  /** [[intDiv]] with DECIMAL(38,0) operands for numerators/denominators
    * built from products of corpus-scale counts (Long would wrap; see
    * [[intRatio]]'s overflow note). The QUOTIENT still lands in Long —
    * callers divide a scaled ratio back to human scale, same contract
    * as intRatio.
    */
  def intDivBig(num: Column, den: Column): Column =
    GraftShim.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      GraftShim.expression(num.cast("decimal(38,0)")),
      GraftShim.expression(den.cast("decimal(38,0)"))))

  /** Winnowing (MOSS) fingerprint set of a STRING column as
    * ARRAY<BIGINT> (native expression — one per-document pass, no
    * explode/window shuffle).
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftShim.column(WinnowFingerprints(GraftShim.expression(text), k, w))

  /** Product-quantization reconstruction of an ARRAY<DOUBLE> vector
    * against a driver-known codebook (native expression — per-subspace
    * nearest-codeword selection and copy in one scan-stage pass).
    */
  /** Greedy MMR diversified selection over a per-query candidate array
    * (native expression — the whole greedy loop is one scan-stage call).
    */
  def mmrSelect(cands: Column, k: Int, lambda: Double): Column =
    GraftShim.column(MmrSelect(GraftShim.expression(cands), k, lambda))

  def pqReconstruct(v: Column, codebook: Array[Array[Double]], m: Int): Column =
    GraftShim.column(PQReconstruct(GraftShim.expression(v), codebook, m))

  /** SimHash aggregate over a BIGINT token-hash column (native
    * TypedImperativeAggregate — 64-counter vote buffer, map-side
    * partial aggregation).
    */
  def simhashAgg(tokenHash: Column): Column =
    GraftShim.column(
      SimHashAgg(GraftShim.expression(tokenHash)).toAggregateExpression())

  /** MinHash signature aggregate over a BIGINT shingle-hash column
    * (native TypedImperativeAggregate — all components derived in one
    * JVM loop per row, map-side partial min-merge). Use when shingle
    * hashes arrive as a ROW STREAM (e.g. incremental pipelines); for a
    * materialized per-doc array use [[minhashSignature]].
    */
  def minhashAgg(shingleHash: Column, numHashes: Int): Column =
    GraftShim.column(
      MinHashAgg(GraftShim.expression(shingleHash), numHashes)
        .toAggregateExpression())

  /** MinHash signature of an ARRAY<BIGINT> shingle-hash column (native
    * scalar expression — zero shuffles; byte-identical to
    * [[minhashAgg]] over the exploded array).
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    GraftShim.column(
      MinHashSignature(GraftShim.expression(shingleHashes), numHashes))

  /** Cast ARRAY<FLOAT> → ARRAY<DOUBLE> (stable math across engines). */
  def asDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles from an already-tokenized column.
    * `array_distinct` keeps set semantics for Jaccard. Taking the token
    * ARRAY (not the raw text) matters for throughput: expressions inside
    * a Generate/transform get no common-subexpression elimination, so a
    * text-typed version would re-split the string for every element_at —
    * 3n evaluations of split() per document instead of one projection.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    // sequence(0, count-1) faults when count <= 0, so short docs get
    // an explicit empty set.
    when(count > 0,
      array_distinct(
        transform(sequence(lit(0), count - 1, lit(1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles of a text column (convenience form —
    * project [[tokens]] into a column first on hot paths, see
    * [[shinglesFromTokens]]).
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** LSH band keys from a minhash signature array: one 64-bit hash per
    * band of `rowsPerBand` signature components.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1))): _*)
    }: _*)

  /** Engine-portable 60-bit token hash: the first 15 hex chars of
    * md5(token) read base-16. 60 bits keep the value inside a signed
    * BIGINT in every engine (DuckDB replays it as
    * `('0x' || substr(md5(t),1,15))::BIGINT`), which is what lets the
    * SimHash family be oracle-checked value-for-value instead of
    * rows-only — the reason this is used over the (cheaper, but
    * Spark-only) xxhash64.
    */
  def tokenHash64(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash from a token array: majority vote per bit over
    * [[tokenHash64]] of each token. Pure higher-order-function
    * composition — runs distributed, one pass over tokens per document.
    */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => tokenHash64(t))
    (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Salted equi-join for skewed keys: the fact side gets a
    * deterministic salt derived from a high-cardinality discriminator
    * column, the (small) dim side is exploded `salt`× so every
    * (key, salt) bucket finds its match. A hot key's rows then spread
    * over `salt` reducers instead of one. Use when a specific key set
    * is known-skewed and AQE's runtime skew splitting isn't enough
    * (e.g. the skew is in a broadcast-ineligible mid-size dim).
    */
  def saltedJoin(
      fact: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame,
      key: String,
      discriminator: String,
      salt: Int): org.apache.spark.sql.DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(discriminator)), lit(salt)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1), lit(1)).cast("array<int>")))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Stopword profiles per language for the n-gram/stopword language-ID
    * heuristic (public-knowledge closed-class words).
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他", "这", "中"))

  /** (bestLang, score) struct: stopword-hit ratio per language profile. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val totalSafe = greatest(size(toks), lit(1))
    val total = totalSafe.cast("double")
    // hits rides along as a THIRD struct field: the lexicographic
    // argmax still compares (score, lang) first — lang values are
    // distinct, so hits never decides — and the caller gets the exact
    // integer numerator for half-grid-safe presentation (intRatio).
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))
      struct(
        (hits / total).as("score"),
        lit(lang).as("lang"),
        hits.as("hits"))
    }
    val best = array_max(array(scored: _*))
    struct(best.getField("lang").as("lang"),
      best.getField("score").as("score"),
      best.getField("hits").as("hits"),
      totalSafe.as("total"))
  }
}
