package graft

import java.nio.file.{Files, Paths}

/** Dev utility: dump `explain("formatted")` for representative plans to
  * PLANS.md — the human-readable companion to PlanAuditSpec's asserted
  * contracts. Usage: `sbt "runMain graft.PlanDump /root/testdata/sf0.001"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build(4, "graft-plandump")
    val picks = Seq(
      "q02_filter_project" -> "pushdown + pruning reach the parquet scan",
      "q05_nation_volume" -> "star join: all small dims broadcast",
      "q26_topk_custom" -> "custom TopKPerKey operator (no window sort)",
      "etl05_incremental_merge" ->
        "row_number+filter auto-rewritten to TopKPerKey by the optimizer rule",
      "q25_range_join" -> "banded non-equi join as BroadcastNestedLoopJoin",
      "etl13_bucketed_join" -> "bucketed tables join without shuffling the key",
      "dedup03_minhash_lsh" -> "LSH candidates: equi-joins only, no cartesian",
      "dedup05_embedding_cosine" ->
        "exact cosine join: cell-blocked equi-join, no corpus nested loop",
      "sim02_lsh_ann" -> "bucket-local ANN search",
      "sim03_ivf_ann" -> "IVF: literal-codebook argmax assignment, no corpus shuffle",
      "sim06_bucketed_ivf" -> "probe-cell filter prunes buckets at file level",
      "sim08_pq_ann" ->
        "PQ: scan-stage reconstruction; map-side partial top-k prunes the shuffle",
      "dedup08_paragraph" ->
        "span dedup: compact hash keys, partial aggregation, no string shuffle",
      "sim09_kmeans" ->
        "k-means: literal-centroid argmin in the scan stage, no assignment join",
      "cur09_sequence_pack" ->
        "sequence packing: per-source window cumsum, never one global stream",
      "etl22_clustered_layout" ->
        "range-clustered layout: date filter pushed to the sorted parquet scan",
      "sim11_mmr_diversify" ->
        "MMR: native greedy selection; collect_list reuses the top-k partitioning")

    // Measured once (2026-08-12, spark-shell probe over the driver
    // testdata) and recorded here so regeneration keeps the evidence:
    // candidate-pair counts for the dedup family across scale factors —
    // the empirical check behind the LSH/pigeonhole scale claims.
    val candidateGrowth =
    """## Measured candidate-set growth (dedup family)
      |
      || sf | docs | total pair space | dedup02 shingle-join | dedup03 MinHash-LSH | dedup04 pigeonhole | vectors | dedup05 cell join |
      ||---|---|---|---|---|---|---|---|
      || 0.001 | 500 | 124,750 | 12,025 | 28 | 2,459 | 500 | 124,750 |
      || 0.01 | 500 | 124,750 | 11,533 | 25 | 2,343 | 500 | 124,750 |
      || 0.1 | 5,000 | 12,497,500 | 1,130,536 | 256 | 232,162 | 2,000 | 1,999,000 |
      |
      |Reading (10x docs, 0.001 -> 0.1): the raw pair space grows 100x.
      |dedup03's LSH candidates grow 28 -> 256 (~9x) — NEAR-LINEAR in the
      |corpus, which is the property that makes MinHash+LSH the 100 TB
      |path. dedup02's shingle join (the exact baseline kept for ground
      |truth) grows ~94x — quadratic, as expected; it exists to verify
      |dedup03, not to run at scale. dedup04's chunk-pigeonhole candidates
      |are birthday-driven (~n^2 * chunks / 2^16): a tiny constant at
      |these sizes but quadratic in shape — at a larger corpus, widen the
      |chunks (k chunks of 64/k bits tightens the collision rate) to keep
      |the candidate fraction flat; the recall guarantee (hamming <= k-1
      |shares a chunk) moves with it. dedup05's cell join degrades to the
      |full pair space on this SYNTHETIC near-uniform corpus (no cell
      |pair is excludable — the adversarial worst case for metric
      |blocking, documented in Dedup.scala); on clustered real embeddings
      |the admissible cell-pair grid collapses and candidates track
      |within-cluster mass instead.
      |
      |dedup08 (span dedup) has NO pair space at all — it is a pure
      |hash aggregate over span keys. Measured span-table growth
      |(sf 0.01 -> 0.1, 10x docs): 2,497 -> 24,816 total spans and
      |108 -> 1,112 cross-doc duplicated spans — both exactly linear in
      |the corpus, the defining property that makes span-granularity
      |dedup runnable where pairwise similarity is not. sim08 (PQ)
      |likewise adds no joins: the approx scoring stream is
      ||queries| x |corpus| rows pruned map-side by the partial top-k
      |to <= partitions x queries x 160 rows before its only shuffle.
      |
      |text13 (bigram LM) is join-shaped but hash-keyed: measured
      |(sf 0.01 -> 0.1, 10x docs) the pair OCCURRENCE stream grows
      |26,665 -> 265,704 (linear — it is the token stream) while the
      |bigram VOCABULARY grows only 916 -> 931; the two count tables the
      |occurrences join against are vocabulary-sized, so the shuffled
      |aggregate state is tiny and the occurrence stream itself shuffles
      |once on 8-byte hashes. dedup09 (SemDeDup) inherits dedup05's
      |candidate posture; its component stage consumed 28 -> 264 nodes
      |(14 -> 121 clusters) at the same 10x step — the union-find input
      |tracks true duplication, not the corpus, which is what keeps the
      |measured-size dispatch on the single-partition path in practice.
      |""".stripMargin
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative operators\n\n")
    sb.append(s"Generated by `graft.PlanDump` at $sfDir. ")
    sb.append("PlanAuditSpec asserts the load-bearing properties of these plans ")
    sb.append("(pushdown, broadcasts, no CartesianProduct, codegen) in CI.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $why\n\n```\n")
      // The operator tree (before the per-node detail dump) is the part
      // a reviewer reads; keep the full detail for the first 80 lines.
      sb.append(formatted.linesIterator.take(80).mkString("\n"))
      sb.append("\n```\n")
    }
    sb.append("\n").append(candidateGrowth)
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
