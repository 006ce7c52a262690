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
        round(col("n_chars_total") / sum("n_chars_total").over(Window.partitionBy()), 6))
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
      .agg(max(round(col("overlap") / col("n_shingles"), 4)).as("max_contamination"))
      .filter(col("max_contamination") >= 0.5)
      .orderBy("train_id")
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
        round(col("n_docs") / sum("n_docs").over(w), 6))
      .withColumn("weight",
        round((lit(1.0) / count(lit(1)).over(w)) /
          (col("n_docs") / sum("n_docs").over(w)), 4))
      .orderBy("source")
  }

  def cur04QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val stopRatio = size(filter(toks,
      t => t.isin(langProfiles("en").map(w => w: Any): _*))) / nTok
    documents(spark, dir)
      .withColumn("keep",
        (col("n_chars") >= 100) && (size(toks) >= 20) && (stopRatio >= 0.02))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        round(avg(col("keep").cast("double")), 4).as("keep_rate"))
      .orderBy("source")
  }
}
