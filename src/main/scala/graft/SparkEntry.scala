package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key has a DuckDB oracle twin in `oracleSql` unless the
  * op is not SQL-expressible (those are covered by ScalaTest specs).
  * Column aliases, rounding, and ORDER BY are kept identical on both
  * sides so the driver's hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05NationVolume(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Relational.q01PricingSummary _,
    "q02_filter_project" -> Relational.q02FilterProject _,
    "q03_top_revenue" -> Relational.q03TopRevenue _,
    "q04_order_priority" -> Relational.q04OrderPriority _,
    "q05_nation_volume" -> Relational.q05NationVolume _,
    "q06_revenue_filter" -> Relational.q06RevenueFilter _,
    "q07_window_rank" -> Relational.q07WindowRank _,
    "q08_distinct_agg" -> Relational.q08DistinctAgg _,
    "q09_sort_limit" -> Relational.q09SortLimit _,
    "q10_semi_join" -> Relational.q10SemiJoin _,
    "q11_anti_join" -> Relational.q11AntiJoin _,
    "q12_union_all" -> Relational.q12UnionAll _,
    "q13_case_agg" -> Relational.q13CaseAgg _,
    "q14_date_parts" -> Relational.q14DateParts _,
    "q15_string_funcs" -> Relational.q15StringFuncs _,
    "q16_null_safe" -> Relational.q16NullSafe _,
    "q17_avg_join" -> Relational.q17AvgJoin _,
    "q18_group_having" -> Relational.q18GroupHaving _,
    "q19_rollup" -> Relational.q19Rollup _,
    "q20_pivot_events" -> Relational.q20PivotEvents _,
    "q21_percentiles" -> Relational.q21Percentiles _,
    "q22_set_ops" -> Relational.q22SetOps _,
    "q23_json_extract" -> Relational.q23JsonExtract _,
    "q24_asof_join" -> Relational.q24AsofJoin _,
    "q25_range_join" -> Relational.q25RangeJoin _,
    "q26_topk_custom" -> Relational.q26TopkCustom _,
    "q27_cumulative" -> Relational.q27Cumulative _,
    "q28_cube" -> Relational.q28Cube _,
    "q29_lag_delta" -> Relational.q29LagDelta _,
    "q30_approx_stats" -> Relational.q30ApproxStats _,
    "q31_window_suite" -> Relational.q31WindowSuite _,
    "q32_grouping_sets" -> Relational.q32GroupingSets _,
    "q33_correlated_subquery" -> Relational.q33CorrelatedSubquery _,
    "q34_recursive_cte" -> Relational.q34RecursiveCte _,
    "q35_lateral_topn" -> Relational.q35LateralTopn _,
    "q36_range_frame" -> Relational.q36RangeFrame _,
    "q37_session_window" -> Relational.q37SessionWindow _,
    "etl01_select_rename_cast" -> Etl.etl01SelectRenameCast _,
    "etl02_datetime_normalize" -> Etl.etl02DatetimeNormalize _,
    "etl03_master_upsert" -> Etl.etl03MasterUpsert _,
    "etl04_dim_enrich" -> Etl.etl04DimEnrich _,
    "etl05_incremental_merge" -> Etl.etl05IncrementalMerge _,
    "etl06_validity_split" -> Etl.etl06ValiditySplit _,
    "etl07_multi_file_ingest" -> Etl.etl07MultiFileIngest _,
    "etl08_scd2" -> Etl.etl08Scd2 _,
    "etl09_csv_roundtrip" -> Etl.etl09CsvRoundtrip _,
    "etl10_partitioned_sink" -> Etl.etl10PartitionedSink _,
    "etl11_json_roundtrip" -> Etl.etl11JsonRoundtrip _,
    "etl12_orc_roundtrip" -> Etl.etl12OrcRoundtrip _,
    "etl13_bucketed_join" -> Etl.etl13BucketedJoin _,
    "etl14_reconcile" -> Etl.etl14Reconcile _,
    "etl15_expectations" -> Etl.etl15Expectations _,
    "etl16_cdc_apply" -> Etl.etl16CdcApply _,
    "etl17_schema_evolution" -> Etl.etl17SchemaEvolution _,
    "etl18_xml_roundtrip" -> Etl.etl18XmlRoundtrip _,
    "etl19_merge_sink" -> Etl.etl19MergeSink _,
    "etl20_corrupt_quarantine" -> Etl.etl20CorruptQuarantine _,
    "etl21_compaction" -> Etl.etl21Compaction _,
    "etl22_clustered_layout" -> Etl.etl22ClusteredLayout _,
    "etl32_zorder_layout" -> Etl.etl32ZorderLayout _,
    "etl23_snapshot_diff" -> Etl.etl23SnapshotDiff _,
    "etl24_jdbc_roundtrip" -> Etl.etl24JdbcRoundtrip _,
    "etl25_jdbc_merge" -> Etl.etl25JdbcMerge _,
    "etl26_backfill" -> Etl.etl26Backfill _,
    "etl27_retention" -> Etl.etl27Retention _,
    "etl28_fuzzy_link" -> Etl.etl28FuzzyLink _,
    "etl29_snapshot_scrub" -> Etl.etl29SnapshotScrub _,
    "etl30_suppression_gate" -> Etl.etl30SuppressionGate _,
    "etl31_jdbc_erasure" -> Etl.etl31JdbcErasure _,
    "text01_tokenize_count" -> TextAnalysis.text01TokenizeCount _,
    "text02_quality_score" -> TextAnalysis.text02QualityScore _,
    "text03_langid" -> TextAnalysis.text03LangId _,
    "text04_fingerprint" -> TextAnalysis.text04Fingerprint _,
    "text05_word_freq" -> TextAnalysis.text05WordFreq _,
    "text06_pii_redact" -> TextAnalysis.text06PiiRedact _,
    "text07_bigrams" -> TextAnalysis.text07Bigrams _,
    "text08_bpe_tokens" -> TextAnalysis.text08BpeTokens _,
    "text09_winnow_fingerprint" -> TextAnalysis.text09WinnowFingerprint _,
    "text10_repetition" -> TextAnalysis.text10Repetition _,
    "text11_surprisal" -> TextAnalysis.text11Surprisal _,
    "text12_entropy" -> TextAnalysis.text12Entropy _,
    "text13_bigram_surprisal" -> TextAnalysis.text13BigramSurprisal _,
    "text14_gopher_rules" -> TextAnalysis.text14GopherRules _,
    "text15_cms_topk" -> TextAnalysis.text15CmsTopk _,
    "text16_pmi_collocations" -> TextAnalysis.text16PmiCollocations _,
    "text17_bpe_train" -> TextAnalysis.text17BpeTrain _,
    "text21_unigram_train" -> TextAnalysis.text21UnigramTrain _,
    "text22_unigram_encode" -> TextAnalysis.text22UnigramEncode _,
    "text18_bpe_encode" -> TextAnalysis.text18BpeEncode _,
    "text19_tfidf_keywords" -> TextAnalysis.text19TfidfKeywords _,
    "text20_boilerplate_scrub" -> TextAnalysis.text20BoilerplateScrub _,
    "dedup01_exact" -> Dedup.dedup01Exact _,
    "dedup02_ngram_jaccard" -> Dedup.dedup02NgramJaccard _,
    "dedup03_minhash_lsh" -> Dedup.dedup03MinhashLsh _,
    "dedup04_simhash" -> Dedup.dedup04Simhash _,
    "dedup05_embedding_cosine" -> Dedup.dedup05EmbeddingCosine _,
    "dedup06_cluster" -> Dedup.dedup06Cluster _,
    "dedup07_winnow_overlap" -> Dedup.dedup07WinnowOverlap _,
    "dedup08_paragraph" -> Dedup.dedup08Paragraph _,
    "dedup09_semdedup" -> Dedup.dedup09Semdedup _,
    "dedup10_substring" -> Dedup.dedup10SubstringSpans _,
    "dedup11_incremental" -> Dedup.dedup11IncrementalIngest _,
    "dedup12_bloom_ingest" -> Dedup.dedup12BloomIngest _,
    "dedup13_lsh_sweep" -> Dedup.dedup13LshSweep _,
    "dedup14_crossmodal" -> Dedup.dedup14Crossmodal _,
    "sim01_bruteforce_topk" -> Similarity.sim01BruteForceTopK _,
    "sim02_lsh_ann" -> Similarity.sim02LshAnn _,
    "sim03_ivf_ann" -> Similarity.sim03IvfAnn _,
    "sim04_l2_topk" -> Similarity.sim04L2TopK _,
    "sim05_radius_search" -> Similarity.sim05RadiusSearch _,
    "sim06_bucketed_ivf" -> Similarity.sim06BucketedIvf _,
    "sim07_knn_graph" -> Similarity.sim07KnnGraph _,
    "sim08_pq_ann" -> Similarity.sim08PqAnn _,
    "sim09_kmeans" -> Similarity.sim09Kmeans _,
    "sim10_recall_eval" -> Similarity.sim10RecallEval _,
    "sim11_mmr_diversify" -> Similarity.sim11MmrDiversify _,
    "sim12_filtered_ann" -> Similarity.sim12FilteredAnn _,
    "sim13_hybrid_rrf" -> Similarity.sim13HybridRrf _,
    "sim14_sq_ann" -> Similarity.sim14SqAnn _,
    "sim15_ivfpq" -> Similarity.sim15IvfPq _,
    "sim16_nprobe_sweep" -> Similarity.sim16NprobeSweep _,
    "sim17_staleness_monitor" -> Similarity.sim17StalenessMonitor _,
    "sim18_retrain_swap" -> Similarity.sim18RetrainSwap _,
    "sim19_graph_ann" -> Similarity.sim19GraphAnn _,
    "sim20_graph_sweep" -> Similarity.sim20GraphSweep _,
    "sim21_graph_insert" -> Similarity.sim21GraphInsert _,
    "sim22_graph_compact" -> Similarity.sim22GraphCompact _,
    "sim23_graph_delete" -> Similarity.sim23GraphDelete _,
    "sim24_tombstoned_consolidate" -> Similarity.sim24TombstonedConsolidate _,
    "sim25_layered_ann" -> Similarity.sim25LayeredAnn _,
    "cur01_hash_sample" -> Curation.cur01HashSample _,
    "cur02_corpus_stats" -> Curation.cur02CorpusStats _,
    "cur03_contamination" -> Curation.cur03Contamination _,
    "cur04_quality_filter" -> Curation.cur04QualityFilter _,
    "cur05_mix_weights" -> Curation.cur05MixWeights _,
    "cur06_curation_pipeline" -> Curation.cur06CurationPipeline _,
    "cur07_stratified_sample" -> Curation.cur07StratifiedSample _,
    "cur08_budget_assembly" -> Curation.cur08BudgetAssembly _,
    "cur09_sequence_pack" -> Curation.cur09SequencePack _,
    "cur10_quality_select" -> Curation.cur10QualitySelect _,
    "cur11_train_split" -> Curation.cur11TrainSplit _,
    "cur12_cluster_sample" -> Curation.cur12ClusterSample _,
    "cur13_importance" -> Curation.cur13ImportanceWeights _,
    "cur14_epoch_schedule" -> Curation.cur14EpochSchedule _,
    "cur15_quality_classifier" -> Curation.cur15QualityClassifier _,
    "cur16_substring_contamination" -> Curation.cur16SubstringContamination _,
    "cur17_contamination_scrub" -> Curation.cur17ContaminationScrub _,
    "cur18_corpus_build" -> Curation.cur18CorpusBuild _,
    "cur19_leak_report" -> Curation.cur19LeakReport _,
    "cur20_sequence_sink" -> Curation.cur20SequenceSink _,
    "cur23_payload_shards" -> Curation.cur23PayloadShards _,
    "cur24_takedown" -> Curation.cur24Takedown _,
    "cur25_tombstone_mask" -> Curation.cur25TombstoneMask _,
    "cur26_repack_execute" -> Curation.cur26RepackExecute _,
    "cur27_mask_equivalence" -> Curation.cur27MaskEquivalence _,
    "cur28_span_redaction" -> Curation.cur28SpanRedaction _,
    "cur29_composed_masks" -> Curation.cur29ComposedMasks _,
    "cur30_composed_repack" -> Curation.cur30ComposedRepack _,
    "cur31_mask_vacuum" -> Curation.cur31MaskVacuum _,
    "cur21_histogram_budget" -> Curation.cur21HistogramBudget _,
    "cur22_histogram_select" -> Curation.cur22HistogramSelect _,
    "mm01_binary_meta" -> Multimodal.mm01BinaryMeta _,
    "mm02_frame_sample" -> Multimodal.mm02FrameSample _,
    "mm03_feature_stub" -> Multimodal.mm03FeatureStub _,
    "mm09_feature_real" -> Multimodal.mm09FeatureReal _,
    "mm04_resize_stub" -> Multimodal.mm04ResizeStub _,
    "mm05_binary_ingest" -> Multimodal.mm05BinaryIngest _,
    "mm06_phash_dedup" -> Multimodal.mm06PhashDedup _,
    "mm07_phash_blocked" -> Multimodal.mm07PhashBlocked _,
    "mm08_video_keyframes" -> Multimodal.mm08VideoKeyframes _,
    "mm10_audio_ingest" -> Multimodal.mm10AudioIngest _,
    "mm11_audio_windows" -> Multimodal.mm11AudioWindows _,
    "mm12_audio_spectral" -> Multimodal.mm12AudioSpectral _,
    "stream01_tumbling_agg" -> Sessions.stream01TumblingAgg _,
    "stream02_sessionize" -> Sessions.stream02Sessionize _,
    "stream04_attribution" -> Sessions.stream04Attribution _)

  /** sim01's exact brute-force top-k — also the `ex` leg of sim10's
    * recall evaluation, so both stay one definition.
    */
  private val Sim01OracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
       s AS (SELECT q_id, vec_id, round(list_cosine_similarity(qv, v), 4) AS cos
             FROM q, e WHERE vec_id <> q_id),
       r AS (SELECT q_id, vec_id, cos, row_number() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
       SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM r
       WHERE rk <= 10 ORDER BY q_id, rk"""

  /** CTE chain replaying [[graft.operators.Curation.trainedCur15]] in
    * DuckDB — the kmeansCteSql/bpeCteSql pattern for batch gradient
    * descent: `feat` is the hashed-bucket count frame (+ bias rows),
    * `w0` the zero weight table, and each round r computes per-doc
    * margins against w(r−1), the algebraic fixed-point sigmoid, the
    * per-bucket integer gradient, and the truncating-division weight
    * update into `w<r>`. Every intermediate is integer — and the
    * margins/weights ride HUGEINT through the WHOLE chain (round-12
    * ADVICE: the Spark side deliberately carries DECIMAL(38,0)/BigInt,
    * so a BIGINT leg here would error-or-diverge at magnitudes the
    * Spark comments defend against; both twins now share the no-wrap
    * posture, narrowing only at presentation), every CTE MATERIALIZED
    * (each round references the previous weights twice — the bpe
    * lesson: default inlining recomputes the chain exponentially).
    * Generated, not hand-written, so the unroll depth and all
    * constants always match the Cur15* values the operator trains
    * with.
    */
  private def cur15CteSql(iters: Int): String = {
    import graft.operators.Curation.{Cur15Bias, Cur15Rate, Cur15Scale}
    val s = Cur15Scale
    val init =
      s"""th15 AS MATERIALIZED (SELECT doc_id, source,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % ${Curation.ImportanceBuckets} AS bkt
           FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
                 FROM documents)),
         feat AS MATERIALIZED (
           SELECT doc_id, source, bkt, CAST(count(*) AS BIGINT) AS x,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
           FROM th15 GROUP BY doc_id, source, bkt
           UNION ALL
           SELECT doc_id, source, CAST($Cur15Bias AS BIGINT), CAST(1 AS BIGINT),
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END
           FROM documents),
         nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
         w0 AS MATERIALIZED (SELECT DISTINCT bkt, CAST(0 AS HUGEINT) AS wgt FROM feat)"""
    val rounds = (1 to iters).map { r =>
      s"""m$r AS MATERIALIZED (SELECT f.doc_id, max(f.y) AS y,
             CAST(sum(f.x * w.wgt) AS HUGEINT) AS m
           FROM feat f JOIN w${r - 1} w USING (bkt) GROUP BY f.doc_id),
         p$r AS MATERIALIZED (SELECT doc_id, y,
             CAST(($s::HUGEINT * ($s + abs(m) + m)) // (2::HUGEINT * ($s + abs(m))) AS BIGINT) AS p
           FROM m$r),
         g$r AS MATERIALIZED (SELECT f.bkt,
             sum((p.p - p.y * $s)::HUGEINT * f.x) AS g
           FROM feat f JOIN p$r p USING (doc_id) GROUP BY f.bkt),
         w$r AS MATERIALIZED (SELECT w.bkt,
             CAST(w.wgt - (g.g // ($Cur15Rate::HUGEINT * nn.n)) AS HUGEINT) AS wgt
           FROM w${r - 1} w JOIN g$r g USING (bkt), nn)"""
    }
    (init +: rounds).mkString(",\n         ")
  }

  /** cur15's full oracle: the training chain, the raw pool scored with
    * the final weights, the exact pool-mean threshold, and the
    * per-source report — all integer until the intRatio presentations.
    */
  private val Cur15OracleSql: String = {
    import graft.operators.Curation.{Cur15Iters, Cur15Scale}
    val s = Cur15Scale
    s"""WITH ${cur15CteSql(Cur15Iters)},
         sm AS MATERIALIZED (SELECT f.doc_id, f.source,
             CAST(sum(f.x * w.wgt) AS HUGEINT) AS m
           FROM feat f JOIN w$Cur15Iters w USING (bkt)
           WHERE f.source <> 'src0' GROUP BY f.doc_id, f.source),
         scored AS MATERIALIZED (SELECT doc_id, source,
             CAST(($s::HUGEINT * ($s + abs(m) + m)) // (2::HUGEINT * ($s + abs(m))) AS BIGINT) AS p
           FROM sm),
         thr AS (SELECT CAST(sum(p)::HUGEINT // count(*) AS BIGINT) AS thr
                 FROM scored)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN p > thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((2*10000*sum(CASE WHEN p > thr THEN 1 ELSE 0 END) + count(*))
                // (2*count(*)) AS BIGINT) / 10000.0 AS keep_rate,
           CAST((2::HUGEINT*$s*sum(p) + count(*)::HUGEINT*$s)
                // (2::HUGEINT*count(*)*$s) AS BIGINT) / $s.0 AS avg_score
         FROM scored, thr GROUP BY source ORDER BY source"""
  }

  /** mm08's oracle, generated from the SHARED scene-law constants in
    * [[graft.operators.Multimodal]] (the etl27 discipline): the staged
    * frames are barcodes of the analytic law, so DuckDB regenerates the
    * fingerprints on a pure range() grid and re-runs the per-video
    * lag/hamming keyframe reduction in bit math — the Spark side must
    * earn the same rows through the real PNG encode → land →
    * binaryFile scan → ImageIO decode → threshold → window chain.
    */
  private val Mm08OracleSql: String = {
    import graft.operators.Multimodal.{Mm06MaxHamming, Mm08Frames, Mm08Jitter,
      Mm08SceneLen, Mm08SceneStep, Mm08VideoStep, Mm08Videos}
    val jitterIn = Mm08Jitter.toSeq.sorted.mkString("(", ", ", ")")
    s"""WITH grid AS (SELECT CAST(t.v AS BIGINT) AS video_id,
             CAST(t2.f AS BIGINT) AS frame_idx
           FROM unnest(range(0, $Mm08Videos)) AS t(v),
                unnest(range(0, $Mm08Frames)) AS t2(f)),
         h AS (SELECT video_id, frame_idx,
             CAST(CASE WHEN frame_idx % $Mm08SceneLen IN $jitterIn
               THEN xor((video_id * $Mm08VideoStep +
                          (frame_idx // $Mm08SceneLen) * $Mm08SceneStep) % 256,
                        1 << (frame_idx % $Mm08SceneLen))
               ELSE (video_id * $Mm08VideoStep +
                      (frame_idx // $Mm08SceneLen) * $Mm08SceneStep) % 256
             END AS BIGINT) AS ph
           FROM grid),
         l AS (SELECT video_id, frame_idx, ph,
             lag(ph) OVER (PARTITION BY video_id ORDER BY frame_idx) AS prev
           FROM h)
         SELECT video_id, frame_idx,
           CASE WHEN prev IS NULL THEN CAST(-1 AS BIGINT)
                ELSE CAST(bit_count(xor(ph, prev)) AS BIGINT)
           END AS hamming_prev
         FROM l
         WHERE prev IS NULL OR bit_count(xor(ph, prev)) > $Mm06MaxHamming
         ORDER BY video_id, frame_idx"""
  }

  /** mm10's oracle, generated from the SHARED test-tone law constants
    * in [[graft.operators.Multimodal]] (the etl27 discipline): the
    * staged clips are Nyquist square waves of the law, so every
    * decoded feature is an exact integer function of the id — peak =
    * RMS = A, checksum telescopes to −A·N/2, zero crossings = N−1 —
    * and DuckDB checks the whole encode → land → binaryFile scan →
    * javax.sound decode → featurize chain with plain arithmetic on the
    * documents table. A wrong byte order, dropped frame, or sign error
    * anywhere moves the checksum.
    */
  private val Mm10OracleSql: String = {
    import graft.operators.Multimodal.{Mm10AmpMod, Mm10AmpStep,
      Mm10BaseSamples, Mm10Clips, Mm10Rate, Mm10SampleMod, Mm10SampleStep}
    val n = s"($Mm10BaseSamples + (doc_id % $Mm10SampleMod) * $Mm10SampleStep)"
    val a = s"((doc_id % $Mm10AmpMod + 1) * $Mm10AmpStep)"
    s"""SELECT doc_id AS clip_id, CAST($Mm10Rate AS INTEGER) AS sample_rate,
         CAST($n AS BIGINT) AS n_samples,
         CAST(($n * 1000) // $Mm10Rate AS BIGINT) AS duration_ms,
         CAST($a AS BIGINT) AS peak,
         CAST($a AS DOUBLE) AS rms,
         CAST((-($a) * $n) // 2 AS BIGINT) AS checksum,
         CAST($n - 1 AS BIGINT) AS zero_crossings
       FROM documents WHERE doc_id < $Mm10Clips ORDER BY clip_id"""
  }

  /** Generated DuckDB replay of mm11's windowed audio profile — the
    * tone law per WINDOW: window starts are even global positions and
    * every window length is even (clip lengths are even by
    * construction), so within a window of length L the ±A square wave
    * gives RMS = A exactly, checksum = −A·L/2 (the per-pair telescope,
    * independent of where the window starts), and L−1 within-window
    * sign flips. The Spark side decodes REAL RIFF bytes in bounded
    * windows off the codec stream; a dropped frame, mis-tiled window,
    * or off-by-one at any boundary moves a checksum.
    */
  private val Mm11OracleSql: String = {
    import graft.operators.Multimodal.{Mm10AmpMod, Mm10AmpStep,
      Mm10BaseSamples, Mm10Clips, Mm10SampleMod, Mm10SampleStep,
      Mm10WindowSamples}
    val w = Mm10WindowSamples
    // greatest(⌈n/w⌉, 1): a decodable ZERO-sample clip emits the Spark
    // side's sentinel zero-row (round-15 ADVICE — range over an empty
    // count would generate no row and break the gate on the first
    // zero-length clip in a corpus); its nw=0 arm zeroes rms and the
    // crossings (there is no sample to cross), matching the sentinel.
    s"""WITH d11 AS (SELECT doc_id AS clip_id,
           ($Mm10BaseSamples + (doc_id % $Mm10SampleMod) * $Mm10SampleStep) AS n,
           ((doc_id % $Mm10AmpMod + 1) * $Mm10AmpStep) AS amp
         FROM documents WHERE doc_id < $Mm10Clips),
       w11 AS (SELECT clip_id, CAST(t.i AS INTEGER) AS window_idx,
           CAST(least(n - t.i * $w, $w) AS BIGINT) AS nw, amp
         FROM d11, unnest(range(0, greatest((n + ${w - 1}) // $w, 1))) AS t(i))
       SELECT clip_id, window_idx,
         nw AS n_samples,
         CAST(CASE WHEN nw = 0 THEN 0 ELSE amp END AS DOUBLE) AS rms,
         CAST((-amp * nw) // 2 AS BIGINT) AS checksum,
         CAST(greatest(nw - 1, 0) AS BIGINT) AS zero_crossings
       FROM w11 ORDER BY clip_id, window_idx"""
  }

  /** Generated DuckDB replay of mm12's windowed spectra — the tone law
    * in the frequency domain: a window of even length L of the ±A
    * Nyquist square wave is A·e^{iπt}, whose L-point DFT is a single
    * spike at bin L/2 with |X| = A·L and EXACT zero everywhere else
    * (the geometric sum cancels), DC included. The Spark side runs a
    * REAL DFT over REAL decoded RIFF bytes; a mis-tiled window, a
    * twiddle off-by-one, or a dropped sample moves the spike bin or
    * leaks sideband mass. Window generation is Mm11OracleSql's
    * verbatim (same clips, same tiling, same zero-clip sentinel arm —
    * peak_bin −1, zero magnitudes).
    */
  private val Mm12OracleSql: String = {
    import graft.operators.Multimodal.{Mm10AmpMod, Mm10AmpStep,
      Mm10BaseSamples, Mm10Clips, Mm10SampleMod, Mm10SampleStep,
      Mm10WindowSamples}
    val w = Mm10WindowSamples
    s"""WITH d12 AS (SELECT doc_id AS clip_id,
           ($Mm10BaseSamples + (doc_id % $Mm10SampleMod) * $Mm10SampleStep) AS n,
           ((doc_id % $Mm10AmpMod + 1) * $Mm10AmpStep) AS amp
         FROM documents WHERE doc_id < $Mm10Clips),
       w12 AS (SELECT clip_id, CAST(t.i AS INTEGER) AS window_idx,
           CAST(least(n - t.i * $w, $w) AS BIGINT) AS nw, amp
         FROM d12, unnest(range(0, greatest((n + ${w - 1}) // $w, 1))) AS t(i))
       SELECT clip_id, window_idx,
         nw AS n_samples,
         CAST(CASE WHEN nw = 0 THEN -1 ELSE nw // 2 END AS INTEGER) AS peak_bin,
         CAST(amp * nw AS DOUBLE) AS peak_mag,
         CAST(0 AS DOUBLE) AS dc_mag,
         CAST(0 AS DOUBLE) AS sideband_mag
       FROM w12 ORDER BY clip_id, window_idx"""
  }

  /** Generated DuckDB replay of etl27's retention audit, derived from
    * [[graft.operators.Etl]]'s shared Etl27* constants (round-11 ADVICE:
    * the version list, batch predicates, and expiry count were silently
    * hard-coded against the operator's literals — now one definition
    * drives both sides, the text17/BpeMerges discipline). Each RETAINED
    * snapshot replays as a latest-seq-wins reduction over the batches it
    * had absorbed (version v = batches 0..v-1, i.e. `seq % Batches < v`);
    * expired versions must NOT appear — a retention bug that keeps or
    * deletes the wrong version changes the row set. Integer last_seq
    * sums keep the audit float-free.
    */
  private val Etl27OracleSql: String = {
    import graft.operators.Etl.{Etl27Batches, Etl27KeepLast, Etl27RetainLast}
    require(Etl27Batches <= Etl27RetainLast,
      "oracle derivation assumes every version is still on disk at VACUUM time")
    val retained = (Etl27Batches - Etl27KeepLast + 1) to Etl27Batches
    val nExpired = Etl27Batches - Etl27KeepLast
    val states = retained.map { v =>
      s"""s$v AS (SELECT key, seq FROM (
             SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
             FROM log WHERE seq % $Etl27Batches < $v) WHERE rn = 1 AND op <> 'D')"""
    }.mkString(",\n         ")
    val arms = retained.map { v =>
      s"""SELECT CAST($v AS BIGINT) AS version, count(*) AS n_keys,
           CAST(sum(seq) AS BIGINT) AS sum_seq, $nExpired AS n_expired FROM s$v"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH log AS (SELECT user_id AS key, event_id AS seq,
             CASE WHEN event_type = 'error' THEN 'D'
                  WHEN event_type = 'click' THEN 'U' ELSE 'I' END AS op
           FROM events),
         $states
         $arms
         ORDER BY version"""
  }

  /** Generated DuckDB replay of etl29's erasure audit, derived from
    * the shared Etl29* constants: each retained version replays as the
    * latest-seq-wins reduction over its absorbed batches (etl27's
    * identity) with the salted erase predicate applied — visible
    * survivor count and integer seq sum are computed over the
    * NON-erased rows (what the post-scrub snapshot holds) and
    * `n_erased` over ALL rows of an erased key, tombstones included (a
    * scrub that left a tombstone, missed a version, or touched a
    * survivor moves a count).
    */
  private val Etl29OracleSql: String = {
    import graft.operators.Etl.{Etl29Batches, Etl29EraseHexThr}
    val states = (1 to Etl29Batches).map { v =>
      s"""e$v AS (SELECT key, seq, op,
             substr(md5('erase:' || CAST(key AS VARCHAR)), 1, 2) < '$Etl29EraseHexThr' AS erased
           FROM (SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
             FROM log WHERE seq % $Etl29Batches < $v) WHERE rn = 1)"""
    }.mkString(",\n         ")
    val arms = (1 to Etl29Batches).map { v =>
      s"""SELECT CAST($v AS BIGINT) AS version,
           CAST(sum(CASE WHEN op <> 'D' AND NOT erased THEN 1 ELSE 0 END) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN op <> 'D' AND NOT erased THEN seq ELSE 0 END) AS BIGINT) AS sum_seq,
           CAST(sum(CASE WHEN erased THEN 1 ELSE 0 END) AS BIGINT) AS n_erased
         FROM e$v"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH log AS (SELECT user_id AS key, event_id AS seq,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'click' THEN 'U' ELSE 'I' END AS op
         FROM events),
         $states
         $arms
         ORDER BY version"""
  }

  /** Generated DuckDB replay of etl30's suppression-gate audit,
    * derived from the shared Etl29* constants: versions 1..Batches
    * replay as etl29's post-scrub states (latest-seq-wins over the
    * absorbed batches, erased keys removed); the post-late-merge
    * version replays the GATED late batch — every NON-erased key
    * updated at seq = max(event_id) + 1 + key (the late rows win
    * latest-seq-wins by construction, tombstoned keys included:
    * tombstones only guard OLDER arrivals), every ERASED key absent.
    * `n_resurrected` is pinned to ZERO on every row — a gate that
    * leaks even one suppressed key at any version moves it.
    */
  private val Etl30OracleSql: String = {
    import graft.operators.Etl.{Etl29Batches, Etl29EraseHexThr}
    val erased =
      s"substr(md5('erase:' || CAST(key AS VARCHAR)), 1, 2) < '$Etl29EraseHexThr'"
    val states = (1 to Etl29Batches).map { v =>
      s"""g$v AS (SELECT key, seq, op FROM (
             SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
             FROM log WHERE seq % $Etl29Batches < $v)
           WHERE rn = 1 AND NOT ($erased))"""
    }.mkString(",\n         ")
    val arms = (1 to Etl29Batches).map { v =>
      s"""SELECT CAST($v AS BIGINT) AS version,
           CAST(sum(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN op <> 'D' THEN seq ELSE 0 END) AS BIGINT) AS sum_seq,
           CAST(0 AS BIGINT) AS n_resurrected
         FROM g$v"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH log AS (SELECT user_id AS key, event_id AS seq,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'click' THEN 'U' ELSE 'I' END AS op
         FROM events),
         mx AS (SELECT max(seq) AS maxseq FROM log),
         lk AS (SELECT DISTINCT key FROM log WHERE NOT ($erased)),
         $states
         $arms
         UNION ALL
         SELECT CAST(${Etl29Batches + 1} AS BIGINT) AS version,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(mx.maxseq + 1 + lk.key) AS BIGINT) AS sum_seq,
           CAST(0 AS BIGINT) AS n_resurrected
         FROM lk, mx
         ORDER BY version"""
  }

  /** Generated DuckDB replay of etl31's JDBC erasure: etl25's merge
    * algebra (staged +100 updates win, master remainder survives),
    * then the erase-listed keys (the shared Etl29EraseHexThr salted
    * predicate) deleted and the GATED replay a no-op — so the final
    * per-segment counts/sums carry only non-erased keys, and n_erased
    * is exactly the erased share of the MERGED state. A DELETE that
    * missed a key, a gate that leaked one into the replayed MERGE, or
    * a replay that double-applied the update moves a count or the
    * 2-dp sum.
    */
  private val Etl31OracleSql: String = {
    import graft.operators.Etl.Etl29EraseHexThr
    s"""WITH m0 AS (SELECT c_custkey, c_acctbal, c_mktsegment
             FROM customer WHERE c_custkey % 3 <> 0),
         u AS (SELECT c_custkey, c_acctbal + 100 AS c_acctbal, c_mktsegment
             FROM customer WHERE c_custkey % 2 = 0),
         merged AS (
           SELECT * FROM u
           UNION ALL
           SELECT * FROM m0
           WHERE c_custkey NOT IN (SELECT c_custkey FROM u)),
         mf AS (SELECT *,
             substr(md5('erase:' || CAST(c_custkey AS VARCHAR)), 1, 2)
               < '$Etl29EraseHexThr' AS er
           FROM merged)
         SELECT c_mktsegment,
           CAST(sum(CASE WHEN NOT er THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers,
           round(CAST(sum(CASE WHEN NOT er THEN c_acctbal ELSE 0 END)
             AS DOUBLE), 2) AS total_acctbal,
           CAST(sum(CASE WHEN er THEN 1 ELSE 0 END) AS BIGINT) AS n_erased
         FROM mf GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  }

  /** Generated DuckDB replay of sim11's greedy MMR: top-MmrCand
    * candidates, then MmrK unrolled argmax steps. The λ and (1−λ)
    * coefficients are emitted from the SAME doubles the expression
    * computes with (Double.toString round-trips, so `1.0 - 0.7` —
    * which is NOT the literal 0.3 — parses back to the identical
    * double in DuckDB); candidate-candidate sims round to 4 dp before
    * the running max, exactly as MmrSelect does.
    */
  private val Sim11OracleSql: String = {
    import graft.operators.Similarity.{MmrCand, MmrK, MmrLambda}
    val lam = MmrLambda.toString
    val oneMinus = (1.0 - MmrLambda).toString
    val steps = (1 to MmrK).map { t =>
      val prev = s"c${t - 1}"
      val pick = s"""p$t AS (SELECT q_id, vec_id AS sel_id, v AS sel_v,
           $lam*rel - $oneMinus*ms AS score FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY $lam*rel - $oneMinus*ms DESC, vec_id) AS srk
             FROM $prev) WHERE srk = 1)"""
      // Step 1's ms (c0.ms = 0.0, no selection yet) must not leak into
      // the running max — c1 takes the first REAL sim outright, so a
      // negative max survives (the unfloored classic formula).
      val msExpr =
        if (t == 1) "round(list_cosine_similarity(c.v, p.sel_v), 4)"
        else "greatest(c.ms, round(list_cosine_similarity(c.v, p.sel_v), 4))"
      val carry =
        if (t < MmrK) s""",
         c$t AS (SELECT c.q_id, c.vec_id, c.v, c.rel,
             $msExpr AS ms
           FROM $prev c JOIN p$t p
             ON c.q_id = p.q_id AND c.vec_id <> p.sel_id)"""
        else ""
      pick + carry
    }.mkString(",\n         ")
    val union = (1 to MmrK)
      .map(t => s"SELECT q_id, $t AS rk, sel_id, score FROM p$t")
      .mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
       sc AS (SELECT q_id, e.vec_id, e.v,
           round(list_cosine_similarity(qv, e.v), 4) AS rel
         FROM q, e WHERE e.vec_id <> q_id),
       c0 AS (SELECT q_id, vec_id, v, rel, 0.0 AS ms FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY rel DESC, vec_id) AS crk FROM sc)
         WHERE crk <= $MmrCand),
       $steps
       SELECT q_id, CAST(rk AS INTEGER) AS rk, sel_id AS vec_id,
         round(score, 6) AS mmr_score
       FROM ($union) ORDER BY q_id, rk"""
  }

  /** CTE chain replaying [[graft.operators.Similarity.trainKmeans]]
    * (k centroids, `iters` Lloyd rounds) in DuckDB — expects an `e`
    * CTE (vec_id, v DOUBLE[]) in scope and leaves the trained centroids
    * in `kc<iters>` (cid, cv). Each round: best-centroid assignment
    * against the previous centroids (L2 argmin, or max-cosine when
    * `cosine` — the spherical variant the IVF codebook trains with;
    * ties to the lowest cid either way), per-dim means QUANTIZED to
    * 6 dp (the step that makes both engines feed bit-identical
    * centroids forward), emptied cells keep their previous centroid.
    * Generated, not hand-written, so the unroll depth always matches
    * KmeansIters.
    */
  private def kmeansCteSql(k: Int, iters: Int, cosine: Boolean = false): String = {
    val best =
      if (cosine) "list_cosine_similarity(e.v, c.cv) DESC"
      else "list_distance(e.v, c.cv)"
    val init =
      s"kc0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $k)"
    val rounds = (1 to iters).map { i =>
      s"""ka$i AS (SELECT vec_id, v, cell FROM (
           SELECT e.vec_id, e.v, c.cid AS cell, row_number() OVER (
               PARTITION BY e.vec_id ORDER BY $best, c.cid) AS rk
           FROM e, kc${i - 1} c) WHERE rk = 1),
       km$i AS (SELECT cell, CAST(t.i AS INT) AS dim,
             round(avg(v[CAST(t.i AS INT)]), 6) AS m
           FROM ka$i, unnest(range(1, 65)) AS t(i) GROUP BY 1, 2),
       kl$i AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv FROM km$i GROUP BY cell),
       kc$i AS (SELECT p.cid, coalesce(n.cv, p.cv) AS cv
                FROM kc${i - 1} p LEFT JOIN kl$i n ON p.cid = n.cid)"""
    }
    (init +: rounds).mkString(",\n       ")
  }

  /** CTE chain replaying [[graft.operators.TextAnalysis.text17BpeTrain]]
    * in DuckDB — the kmeansCteSql pattern for BPE: `w` is the
    * word-frequency table ('^[a-z]+$' words of the lowercased corpus),
    * `s0` the initial (sym)-wrapped character segmentation, and each
    * round r computes adjacent-pair counts over s(r-1) (every adjacent
    * occurrence, weighted by word frequency — Sennrich's get_stats),
    * picks the top pair on (cnt DESC, a, b) into `m<r>`, and
    * re-segments into `s<r>` with a left-to-right non-overlapping
    * `replace` (equal to greedy BPE merging because symbols cannot
    * contain parens). Generated, not hand-written, so the unroll depth
    * always matches BpeMerges.
    *
    * Every CTE is MATERIALIZED: each round references the previous
    * segmentation twice (pair counts + re-segmentation), so DuckDB's
    * default CTE inlining would recompute the chain 2^rounds times —
    * measured 451 s plain vs 0.3 s materialized at 12 rounds on sf0.01.
    */
  private def bpeCteSql(merges: Int): String = {
    val init =
      """w AS MATERIALIZED (SELECT t AS w, count(*) AS freq FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
           WHERE regexp_matches(t, '^[a-z]+$') GROUP BY t),
         s0 AS MATERIALIZED (SELECT w, freq, regexp_replace(w, '(.)', '(\1)', 'g') AS seg FROM w)"""
    val rounds = (1 to merges).map { r =>
      s"""p$r AS MATERIALIZED (SELECT l[CAST(i AS INT)] AS a, l[CAST(i AS INT)+1] AS b,
               CAST(sum(freq) AS BIGINT) AS cnt
             FROM (SELECT freq, regexp_extract_all(seg, '\\(([^)]*)\\)', 1) AS l
                   FROM s${r - 1}),
                  unnest(range(1, len(l))) AS t(i)
             GROUP BY 1, 2),
         m$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         s$r AS MATERIALIZED (SELECT w, freq,
               replace(seg, '(' || a || ')(' || b || ')', '(' || a || b || ')') AS seg
             FROM s${r - 1}, m$r)"""
    }
    (init +: rounds).mkString(",\n         ")
  }

  /** CTE chain replaying [[graft.operators.TextAnalysis.text21UnigramTrain]]
    * in DuckDB — the bpeCteSql pattern for the unigram-LM trainer:
    * `w` is text17's word-frequency table, `cnt0` the seed vocabulary
    * (every single character + the top-K multi-char substrings by
    * weighted occurrence count), and each EM round r quantizes the
    * add-one-smoothed piece costs (`cost<r>`, text11's 1e-4 micro
    * protocol), runs the Viterbi forward DP as a RECURSIVE CTE over
    * word positions (`dp<r>` — list_min over the ≤MaxPiece candidate
    * splits, out-of-vocab splits at the HUGE sentinel), backtracks the
    * chosen pieces with the same argmin tie-break (struct list_sort on
    * (cost, start) — smallest start = longest piece, matching the
    * Spark side's ascending strict-< scan), and re-counts (`cnt<r>`).
    * All constants interpolate from the operator (etl27's discipline).
    * Every CTE is MATERIALIZED (bpeCteSql's inlining lesson).
    */
  private def unigramCteSql: String = {
    import graft.operators.TextAnalysis._
    val huge = UnigramHugeCost
    val mp = UnigramMaxPiece
    def argmin(rel: String, posExpr: String) =
      s"""(list_sort(list_transform(range(greatest($rel.$posExpr - $mp, 0), $rel.$posExpr),
             i -> {'c': $rel.dp[CAST(i + 1 AS BIGINT)] +
                     coalesce(cm.m[substr($rel.w, CAST(i + 1 AS BIGINT),
                       CAST($rel.$posExpr - i AS BIGINT))][1], $huge),
                   'i': i}))[1]).i"""
    // The cost-quantize / map / DP / backtrack CTE quartet for one
    // Viterbi pass under the counts in `prevCnt` — shared by every EM
    // round (tag = round number) and by text22's final encode pass
    // (tag = "f", under the SHIPPED final counts): one SQL definition
    // of the segmentation, as unigramDpCol/unigramPiecesCol is one
    // Scala definition.
    def dpPass(tag: String, prevCnt: String) =
      s"""cost$tag AS MATERIALIZED (
           SELECT piece, CAST(round(-log2((cnt + 1) / (t.total + t.v)) * 10000) AS BIGINT) AS cost
           FROM $prevCnt, (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             count(*) AS v FROM $prevCnt) t),
         cmap$tag AS MATERIALIZED (
           SELECT map(list(piece ORDER BY piece), list(cost ORDER BY piece)) AS m FROM cost$tag),
         dp$tag AS MATERIALIZED (
           WITH RECURSIVE rec(w, freq, j, dp) AS (
             SELECT w, freq, 0, [CAST(0 AS BIGINT)] FROM w
             UNION ALL
             SELECT rec.w, rec.freq, rec.j + 1,
               list_append(rec.dp, list_min(list_transform(
                 range(greatest(rec.j + 1 - $mp, 0), rec.j + 1),
                 i -> rec.dp[CAST(i + 1 AS BIGINT)] +
                      coalesce(cm.m[substr(rec.w, CAST(i + 1 AS BIGINT),
                        CAST(rec.j + 1 - i AS BIGINT))][1], $huge))))
             FROM rec, cmap$tag cm WHERE rec.j < length(rec.w))
           SELECT w, freq, dp FROM rec WHERE j = length(w)),
         bt$tag AS MATERIALIZED (
           WITH RECURSIVE walk(w, freq, dp, pos, ps) AS (
             SELECT w, freq, dp, CAST(length(w) AS INT), CAST([] AS VARCHAR[]) FROM dp$tag
             UNION ALL
             SELECT walk.w, walk.freq, walk.dp,
               CAST(${argmin("walk", "pos")} AS INT),
               list_append(walk.ps, substr(walk.w,
                 CAST(${argmin("walk", "pos")} + 1 AS BIGINT),
                 CAST(walk.pos - ${argmin("walk", "pos")} AS BIGINT)))
             FROM walk, cmap$tag cm WHERE walk.pos > 0)
           SELECT w, freq, dp, ps FROM walk WHERE pos = 0)"""
    val init =
      s"""w AS MATERIALIZED (SELECT t AS w, count(*) AS freq FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
           WHERE regexp_matches(t, '^[a-z]+$$') GROUP BY t),
         u21subs AS MATERIALIZED (SELECT substr(w, CAST(t.s AS BIGINT), CAST(u.l AS BIGINT)) AS piece,
             CAST(sum(freq) AS BIGINT) AS cnt
           FROM w, unnest(range(1, length(w) + 1)) AS t(s),
                unnest(range(1, ${mp + 1})) AS u(l)
           WHERE t.s + u.l <= length(w) + 1 GROUP BY 1),
         cnt0 AS MATERIALIZED (
           SELECT piece, cnt FROM u21subs WHERE length(piece) = 1
           UNION ALL
           SELECT piece, cnt FROM (SELECT piece, cnt FROM u21subs
             WHERE length(piece) > 1
             ORDER BY cnt DESC, piece LIMIT $UnigramSeedMulti))"""
    val rounds = (1 to UnigramIters).map { r =>
      s"""${dpPass(r.toString, s"cnt${r - 1}")},
         cnt$r AS MATERIALIZED (
           SELECT v.piece, CAST(coalesce(sum(o.freq), 0) AS BIGINT) AS cnt
           FROM (SELECT piece FROM cnt0) v
           LEFT JOIN (SELECT unnest(ps) AS piece, freq FROM bt$r) o USING (piece)
           GROUP BY v.piece)"""
    }
    // text22's encode pass: one more Viterbi quartet under the SHIPPED
    // model (the final-round counts — costf is definitionally
    // text21's output cost_micro).
    val encodePass = dpPass("f", s"cnt$UnigramIters")
    ((init +: rounds) :+ encodePass).mkString(",\n         ")
  }

  private val Text21OracleSql: String = {
    val last = graft.operators.TextAnalysis.UnigramIters
    s"""WITH RECURSIVE $unigramCteSql,
         u21fin AS (SELECT c.piece, c.cnt,
             CAST(round(-log2((c.cnt + 1) / (t.total + t.v)) * 10000) AS BIGINT) AS cost_micro
           FROM cnt$last c, (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             count(*) AS v FROM cnt$last) t)
         SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank,
                piece, cnt, cost_micro
         FROM u21fin ORDER BY rank"""
  }

  /** Generated DuckDB replay of text22's unigram encode: the full
    * training chain (text21's), then the encode pass's Viterbi
    * quartet under the SHIPPED final counts (dpf/btf — the same
    * generated dpPass as every EM round), each word's piece count and
    * total path cost, joined to the corpus word stream per document.
    * The cost sum pins the chosen PATHS, not just their lengths.
    */
  private val Text22OracleSql: String =
    s"""WITH RECURSIVE $unigramCteSql,
         encf AS (SELECT w, CAST(len(ps) AS BIGINT) AS n_pieces,
             dp[CAST(length(w) + 1 AS BIGINT)] AS w_cost
           FROM btf),
         t22 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                 FROM documents)
         SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_unigram_tokens,
           CAST(sum(w_cost) AS BIGINT) AS cost_micro_sum
         FROM t22 JOIN encf USING (w)
         WHERE regexp_matches(t22.w, '^[a-z]+$$')
         GROUP BY doc_id ORDER BY doc_id"""

  /** Shared DuckDB replay of the IVF search protocol (sim03 and sim06
    * emit identical rows — spec-pinned — so both map to this SQL):
    * codebook = the k-means-TRAINED centroids (the [[kmeansCteSql]]
    * chain, k=16, seeded from vec_id < 16); each vector joins its
    * nearest-centroid cell (ties to the smallest cid); each query
    * (vec_id < 5) probes its 4 nearest cells; candidates are exactly
    * the probed cells' members, rescored with the true cosine.
    */
  private val SimIvfOracleSql: String = {
    val iters = graft.operators.Similarity.KmeansIters
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       ${kmeansCteSql(16, iters, cosine = true)},
       c AS (SELECT cid, cv FROM kc$iters),
       assign AS (SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cid AS cell, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS crk
           FROM e, c)
         WHERE crk = 1),
       q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
       probes AS (SELECT q_id, cell FROM (
           SELECT q.q_id, c.cid AS cell, row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS crk
           FROM q, c)
         WHERE crk <= 4),
       s AS (SELECT p.q_id, a.vec_id,
               round(list_cosine_similarity(q.qv, e.v), 4) AS cos
             FROM probes p
             JOIN q ON q.q_id = p.q_id
             JOIN assign a ON a.cell = p.cell
             JOIN e ON e.vec_id = a.vec_id
             WHERE a.vec_id <> p.q_id),
       r AS (SELECT q_id, vec_id, cos, row_number() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
       SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM r
       WHERE rk <= 10 ORDER BY q_id, rk"""
  }

  /** Generated DuckDB replay of sim16's NProbe sweep: trained codebook
    * (the same kmeansCteSql chain as sim03), exact cosine top-k (the
    * sim01 protocol), each vector's cell, each query's rank over ALL
    * cells, then recall@p = fraction of the exact top-k whose cell
    * ranks ≤ p — the candidate-recall identity the operator's scaladoc
    * derives (exact rescoring ⇒ retrieved recall == candidate recall).
    */
  private val Sim16OracleSql: String = {
    val iters = graft.operators.Similarity.KmeansIters
    val sweep = graft.operators.Similarity.SweepProbes.mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       ${kmeansCteSql(16, iters, cosine = true)},
       c AS (SELECT cid, cv FROM kc$iters),
       assign AS (SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cid AS cell, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS crk
           FROM e, c)
         WHERE crk = 1),
       q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
       s AS (SELECT q_id, vec_id, round(list_cosine_similarity(qv, v), 4) AS cos
             FROM q, e WHERE vec_id <> q_id),
       ex AS (SELECT q_id, vec_id FROM (
           SELECT q_id, vec_id, row_number() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
         WHERE rk <= 10),
       pr AS (SELECT q_id, cell, CAST(crk AS INTEGER) AS probe_rank FROM (
           SELECT q.q_id, c.cid AS cell, row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS crk
           FROM q, c)),
       h AS (SELECT ex.q_id, pr.probe_rank
             FROM ex JOIN assign a ON a.vec_id = ex.vec_id
             JOIN pr ON pr.q_id = ex.q_id AND pr.cell = a.cell),
       sweep AS (SELECT unnest([$sweep]) AS nprobe)
       SELECT q_id, CAST(nprobe AS INTEGER) AS nprobe,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN probe_rank <= nprobe THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         round(CAST(sum(CASE WHEN probe_rank <= nprobe THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*), 4) AS recall_at_k
       FROM h, sweep GROUP BY q_id, nprobe ORDER BY q_id, nprobe"""
  }

  /** Generated DuckDB replay of sim17's staleness monitor: trained
    * codebook (the sim03 kmeansCteSql chain), the drift-synthesized
    * append batches (the reversal blend at t = b·StaleDriftStep —
    * identical IEEE ops on both engines), per-level exact top-k via the
    * level explode (a row tagged batch b exists at levels b..B),
    * literal-codebook assignment, probe ranking, and the hit
    * aggregation — all constants shared with
    * [[graft.operators.Similarity]] (the etl27 discipline).
    */
  private val Sim17OracleSql: String = {
    import graft.operators.Similarity.{Dims, KmeansIters, NProbe, NumQueryVectors,
      StaleBatches, StaleDriftStep, StaleIdBase, TopK}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       ${kmeansCteSql(16, KmeansIters, cosine = true)},
       c AS (SELECT cid, cv FROM kc$KmeansIters),
       q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueryVectors),
       ap AS (SELECT $StaleIdBase + b*100 + q_id AS vec_id,
           list_transform(range(1, ${Dims + 1}), i ->
             (1.0 - b*$StaleDriftStep)*qv[CAST(i AS INT)] +
               (b*$StaleDriftStep)*qv[CAST(${Dims + 1} - i AS INT)]) AS v,
           CAST(b AS INT) AS batch
         FROM q, unnest(range(1, ${StaleBatches + 1})) AS t(b)),
       fc AS (SELECT vec_id, v, 0 AS batch FROM e
              UNION ALL SELECT vec_id, v, batch FROM ap),
       assign AS (SELECT vec_id, v, batch, cell FROM (
           SELECT f.vec_id, f.v, f.batch, c.cid AS cell, row_number() OVER (
               PARTITION BY f.vec_id
               ORDER BY list_cosine_similarity(f.v, c.cv) DESC, c.cid) AS crk
           FROM fc f, c) WHERE crk = 1),
       s AS (SELECT q.q_id, a.vec_id, a.batch, a.cell,
               round(list_cosine_similarity(q.qv, a.v), 4) AS cos
             FROM q, assign a WHERE a.vec_id <> q.q_id),
       lv AS (SELECT q_id, vec_id, cell, cos,
                unnest(range(batch, ${StaleBatches + 1})) AS staleness
              FROM s),
       tk AS (SELECT q_id, staleness, vec_id, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id, staleness
               ORDER BY cos DESC, vec_id) AS rk
           FROM lv) WHERE rk <= $TopK),
       pr AS (SELECT q_id, cell, CAST(crk AS INT) AS probe_rank FROM (
           SELECT q.q_id, c.cid AS cell, row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS crk
           FROM q, c)),
       h AS (SELECT tk.staleness, pr.probe_rank
             FROM tk JOIN pr ON pr.q_id = tk.q_id AND pr.cell = tk.cell)
       SELECT CAST(staleness AS INT) AS staleness,
         CAST(staleness * $NumQueryVectors AS BIGINT) AS n_appended,
         count(*) AS n_exact,
         CAST(sum(CASE WHEN probe_rank <= $NProbe THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         round(CAST(sum(CASE WHEN probe_rank <= $NProbe THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*), 4) AS recall_at_k
       FROM h GROUP BY staleness ORDER BY staleness"""
  }

  /** sim07's kNN-graph CTEs (seed-pivot cell assignment → cell-local
    * self-join → per-vector ranking, leaving `e` and the ranked `r7`
    * in scope) — shared by the sim07 oracle and sim19's beam-search
    * replay, so the search can never navigate a different graph than
    * the build emits.
    */
  private val Sim07GraphCtes: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
         assign AS (SELECT vec_id, v, cell FROM (
             SELECT e.vec_id, e.v, c.cid AS cell, row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS crk
             FROM e, c)
           WHERE crk = 1),
         s7 AS (SELECT a.vec_id, b.vec_id AS nb_id,
                 round(list_cosine_similarity(a.v, b.v), 4) AS cos
               FROM assign a JOIN assign b
                 ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         r7 AS (SELECT vec_id, nb_id, cos, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk FROM s7)"""

  /** Generated DuckDB replay of sim19's beam search: the shared graph
    * CTEs, the fixed entry set scored per query, then [[GraphRounds]]
    * unrolled expansion rounds — beam = top-[[GraphBeam]] of the
    * visited pool, frontier = the beam's UNVISITED graph neighbors
    * (NOT EXISTS against the pool — the score-once contract), scored
    * and unioned — and the final top-k cut. Every beam cut ranks on
    * the 4-dp score with the vec_id tiebreak, so a divergence in any
    * round's frontier cascades into every later round and breaks the
    * hash. MATERIALIZED throughout (each round references the previous
    * pool three times — the bpe/cur15 inlining lesson).
    */
  /** The graph-navigation preamble shared by the sim19 and sim20
    * oracles: sim07's graph CTEs, the long-range-augmented edge frame
    * `g`, and the query set `q` — one definition, so the sweep can
    * never navigate a different graph than the deployed search.
    */
  private def sim19NavCtes(qBody: String): String = {
    import graft.operators.Similarity.{GraphRandomDegree, KnnK}
    s"""$Sim07GraphCtes,
         nn AS (SELECT count(*) AS n FROM e),
         g AS MATERIALIZED (
           SELECT vec_id AS src, nb_id AS dst FROM r7 WHERE rk <= $KnnK
           UNION
           SELECT e.vec_id AS src,
             ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || ':' ||
                CAST(t.j AS VARCHAR)), 1, 15))::BIGINT % nn.n AS dst
           FROM e, unnest(range(1, ${GraphRandomDegree + 1})) AS t(j), nn
           WHERE ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || ':' ||
                CAST(t.j AS VARCHAR)), 1, 15))::BIGINT % nn.n <> e.vec_id),
         q AS ($qBody)"""
  }

  private val Sim19NavCtes: String = sim19NavCtes(
    s"""SELECT vec_id AS q_id, v AS qv FROM e
               WHERE vec_id < ${graft.operators.Similarity.NumQueryVectors}""")

  /** sim19's unrolled expansion rounds at `beam` width over whatever
    * `q` the nav preamble bound — shared by the sim19 oracle (corpus
    * queries) and sim21's insert oracle (drift-blend appends as
    * queries: the insert IS one search).
    */
  private def sim19RoundsSql(beam: Int): String = {
    import graft.operators.Similarity.GraphRounds
    (1 to GraphRounds).map { r =>
      s"""b${r - 1} AS MATERIALIZED (SELECT q_id, vec_id FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS brk FROM v${r - 1})
           WHERE brk <= $beam),
         f$r AS MATERIALIZED (SELECT DISTINCT b.q_id, g.dst AS vec_id
           FROM b${r - 1} b JOIN g ON g.src = b.vec_id
           WHERE g.dst <> b.q_id
             AND NOT EXISTS (SELECT 1 FROM v${r - 1} vv
                             WHERE vv.q_id = b.q_id AND vv.vec_id = g.dst)),
         sc$r AS MATERIALIZED (SELECT f.q_id, f.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM f$r f JOIN q ON q.q_id = f.q_id JOIN e ON e.vec_id = f.vec_id),
         v$r AS MATERIALIZED (
           SELECT * FROM v${r - 1} UNION ALL SELECT * FROM sc$r)"""
    }.mkString(",\n         ")
  }

  /** One unrolled beam-search trajectory at (`ent` entries, `beam`
    * width), CTE-tagged `_c<ent>_<beam>` — sim19's round chain
    * parameterized, ending in the pool `p_c<ent>_<beam>` that tags
    * every candidate with the round it ENTERED (the rounds-axis
    * identity sim20's curve reads).
    */
  private def sim20ChainSql(ent: Int, beam: Int): String = {
    import graft.operators.Similarity.GraphRounds
    val t = s"c${ent}_$beam"
    val rounds = (1 to GraphRounds).map { r =>
      s"""b${r - 1}_$t AS MATERIALIZED (SELECT q_id, vec_id FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS brk FROM v${r - 1}_$t)
           WHERE brk <= $beam),
         f${r}_$t AS MATERIALIZED (SELECT DISTINCT b.q_id, g.dst AS vec_id
           FROM b${r - 1}_$t b JOIN g ON g.src = b.vec_id
           WHERE g.dst <> b.q_id
             AND NOT EXISTS (SELECT 1 FROM v${r - 1}_$t vv
                             WHERE vv.q_id = b.q_id AND vv.vec_id = g.dst)),
         sc${r}_$t AS MATERIALIZED (SELECT f.q_id, f.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM f${r}_$t f JOIN q ON q.q_id = f.q_id JOIN e ON e.vec_id = f.vec_id),
         v${r}_$t AS MATERIALIZED (
           SELECT * FROM v${r - 1}_$t UNION ALL SELECT * FROM sc${r}_$t)"""
    }.mkString(",\n         ")
    val poolUnion = (1 to GraphRounds)
      .map(r => s"UNION ALL SELECT q_id, vec_id, $r AS er FROM sc${r}_$t")
      .mkString("\n           ")
    s"""v0_$t AS MATERIALIZED (SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM q, e WHERE e.vec_id < $ent AND e.vec_id <> q.q_id),
         $rounds,
         p_$t AS (SELECT q_id, vec_id, 0 AS er FROM v0_$t
           $poolUnion)"""
  }

  private val Sim19OracleSql: String = {
    import graft.operators.Similarity.{GraphBeam, GraphEntryCount,
      GraphRounds, TopK}
    s"""WITH $Sim19NavCtes,
         v0 AS MATERIALIZED (SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM q, e WHERE e.vec_id < $GraphEntryCount AND e.vec_id <> q.q_id),
         ${sim19RoundsSql(GraphBeam)}
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, vec_id) AS rk FROM v$GraphRounds)
         WHERE rk <= $TopK ORDER BY q_id, rk"""
  }

  /** sim19's expansion rounds fully parameterized — CTE tag, round
    * count, beam width, and the graph/corpus CTE names — so sim25's
    * layered oracle can unroll BOTH layers (coarse routing over the
    * layer's own graph, then the base rounds over `g`/`e`) through the
    * one grammar. `v0<tag>` must exist; the chain ends in
    * `v<rounds><tag>`.
    */
  private def beamRoundsSql(tag: String, rounds: Int, beam: Int,
      graphCte: String, corpusCte: String): String =
    (1 to rounds).map { r =>
      s"""b${r - 1}$tag AS MATERIALIZED (SELECT q_id, vec_id FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS brk FROM v${r - 1}$tag)
           WHERE brk <= $beam),
         f$r$tag AS MATERIALIZED (SELECT DISTINCT b.q_id, g.dst AS vec_id
           FROM b${r - 1}$tag b JOIN $graphCte g ON g.src = b.vec_id
           WHERE g.dst <> b.q_id
             AND NOT EXISTS (SELECT 1 FROM v${r - 1}$tag vv
                             WHERE vv.q_id = b.q_id AND vv.vec_id = g.dst)),
         sc$r$tag AS MATERIALIZED (SELECT f.q_id, f.vec_id,
             round(list_cosine_similarity(q.qv, ee.v), 4) AS cos
           FROM f$r$tag f JOIN q ON q.q_id = f.q_id
             JOIN $corpusCte ee ON ee.vec_id = f.vec_id),
         v$r$tag AS MATERIALIZED (
           SELECT * FROM v${r - 1}$tag UNION ALL SELECT * FROM sc$r$tag)"""
    }.mkString(",\n         ")

  /** Generated DuckDB replay of sim25's layered search: the shared nav
    * preamble, the md5-sampled densely-ranked coarse layer `cr` with
    * its own hash-mod edges `cg`, the coarse routing unrolled at the
    * narrow beam, the base rounds seeded by the WHOLE routed pool
    * (`v0_bl` = the routing's final pool — the cross-layer score-once
    * contract stated structurally), and the final top-k cut. Every
    * constant interpolates from the operator (etl27 discipline); a
    * drift in the sample rule, the layer's edge hash, either layer's
    * beam arithmetic, or the seeding breaks the hash.
    */
  private val Sim25OracleSql: String = {
    import graft.operators.Similarity.{Sim25Beam, Sim25CoarseBeam,
      Sim25CoarseDegree, Sim25CoarseEntries, Sim25CoarseMod,
      Sim25CoarseRounds, Sim25Rounds, TopK}
    s"""WITH $Sim19NavCtes,
         cr AS MATERIALIZED (SELECT vec_id, v,
             row_number() OVER (ORDER BY vec_id) - 1 AS crank
           FROM e
           WHERE ('0x' || substr(md5('coarse:' || CAST(vec_id AS VARCHAR)),
               1, 15))::BIGINT % $Sim25CoarseMod = 0),
         cm AS (SELECT count(*) AS m FROM cr),
         cg AS MATERIALIZED (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
           FROM cr a, unnest(range(1, ${Sim25CoarseDegree + 1})) AS t(j),
             cm, cr b
           WHERE b.crank = ('0x' || substr(md5('c:' ||
               CAST(a.vec_id AS VARCHAR) || ':' ||
               CAST(t.j AS VARCHAR)), 1, 15))::BIGINT % cm.m
             AND b.vec_id <> a.vec_id),
         v0_cl AS MATERIALIZED (SELECT q.q_id, cr.vec_id,
             round(list_cosine_similarity(q.qv, cr.v), 4) AS cos
           FROM q, cr
           WHERE cr.crank < $Sim25CoarseEntries AND cr.vec_id <> q.q_id),
         ${beamRoundsSql("_cl", Sim25CoarseRounds, Sim25CoarseBeam, "cg", "cr")},
         v0_bl AS MATERIALIZED (SELECT * FROM v${Sim25CoarseRounds}_cl),
         ${beamRoundsSql("_bl", Sim25Rounds, Sim25Beam, "g", "e")}
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, vec_id) AS rk FROM v${Sim25Rounds}_bl)
         WHERE rk <= $TopK ORDER BY q_id, rk"""
  }

  /** Generated DuckDB replay of sim21's graph insert: the shared nav
    * preamble with `q` bound to the DRIFT-BLEND append batches (the
    * sim17 oracle's `ap` law — identical IEEE ops on both engines),
    * then sim19's unrolled round chain verbatim — the insert is
    * exactly one beam search — and the top-[[graft.operators.Similarity.GraphInsertDegree]]
    * cut re-labeled to the edge shape (vec_id = the inserted node,
    * nb_id = its chosen neighbor).
    */
  /** The drift-blend append batches as a beam-search query CTE body
    * (sim17's `ap` law with the sim21 id scheme) — shared by the sim21
    * insert oracle and sim22's compaction oracle, whose candidate
    * evidence IS sim21's insert chain.
    */
  private val Sim21AppendQBody: String = {
    import graft.operators.Similarity.{Dims, NumQueryVectors, StaleBatches,
      StaleDriftStep, StaleIdBase}
    s"""SELECT CAST($StaleIdBase + b*100 + qq.q_id AS BIGINT) AS q_id,
             list_transform(range(1, ${Dims + 1}), i ->
               (1.0 - b*$StaleDriftStep)*qq.qv[CAST(i AS INT)] +
                 (b*$StaleDriftStep)*qq.qv[CAST(${Dims + 1} - i AS INT)]) AS qv
           FROM (SELECT vec_id AS q_id, v AS qv FROM e
                 WHERE vec_id < $NumQueryVectors) qq,
             unnest(range(1, ${StaleBatches + 1})) AS t(b)"""
  }

  private val Sim21OracleSql: String = {
    import graft.operators.Similarity.{GraphBeam, GraphEntryCount,
      GraphInsertDegree, GraphRounds}
    val qBody = Sim21AppendQBody
    s"""WITH ${sim19NavCtes(qBody)},
         v0 AS MATERIALIZED (SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM q, e WHERE e.vec_id < $GraphEntryCount AND e.vec_id <> q.q_id),
         ${sim19RoundsSql(GraphBeam)}
         SELECT q_id AS vec_id, CAST(rk AS INTEGER) AS rk,
           vec_id AS nb_id, cos FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, vec_id) AS rk FROM v$GraphRounds)
         WHERE rk <= $GraphInsertDegree ORDER BY 1, 2"""
  }

  /** Generated DuckDB replay of sim23's tombstoned search: sim19's
    * chain VERBATIM (route-through semantics — the tombstone set
    * cannot change where the beam goes), with the salted tombstone
    * predicate applied on the final cut BEFORE the re-rank, so live
    * candidates fill the top-k densely.
    */
  private val Sim23OracleSql: String = {
    import graft.operators.Similarity.{GraphBeam, GraphEntryCount,
      GraphRounds, TombstoneHexThr, TopK}
    s"""WITH $Sim19NavCtes,
         v0 AS MATERIALIZED (SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM q, e WHERE e.vec_id < $GraphEntryCount AND e.vec_id <> q.q_id),
         ${sim19RoundsSql(GraphBeam)}
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, vec_id) AS rk FROM v$GraphRounds
           WHERE substr(md5('tombstone:' || CAST(vec_id AS VARCHAR)), 1, 2)
             >= '$TombstoneHexThr')
         WHERE rk <= $TopK ORDER BY q_id, rk"""
  }

  /** Generated DuckDB replay of sim22's graph compaction: sim21's
    * insert chain verbatim (the shared nav preamble + unrolled beam
    * rounds with the drift-blend appends as `q`, cut to the insert
    * degree — the compaction's candidate EVIDENCE is the insert's
    * output, one definition), the merged corpus (base ∪ appends), the
    * candidate edge union (sim07 build edges ∪ insert forward edges ∪
    * received back-edges), and the per-node cosine re-rank cut at the
    * compaction degree. A divergence anywhere in the insert chain
    * cascades into the candidate set and breaks the hash.
    */
  /** The consolidate oracles' shared CTE chain through the candidate
    * evidence: sim21's insert chain (nav preamble + unrolled beam
    * rounds over the drift-blend appends), the merged corpus `me`, and
    * the candidate edge union `cand` (build ∪ insert forward ∪
    * back-edges) — one definition, so sim24's tombstoned consolidate
    * can never re-rank different evidence than sim22's.
    */
  private val Sim22CandCtes: String = {
    import graft.operators.Similarity.{GraphBeam, GraphEntryCount,
      GraphInsertDegree, GraphRounds, KnnK}
    s"""${sim19NavCtes(Sim21AppendQBody)},
         v0 AS MATERIALIZED (SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(q.qv, e.v), 4) AS cos
           FROM q, e WHERE e.vec_id < $GraphEntryCount AND e.vec_id <> q.q_id),
         ${sim19RoundsSql(GraphBeam)},
         ie AS MATERIALIZED (SELECT q_id AS src, vec_id AS dst FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rk FROM v$GraphRounds)
           WHERE rk <= $GraphInsertDegree),
         me AS MATERIALIZED (SELECT vec_id, v FROM e
           UNION ALL SELECT q_id AS vec_id, qv AS v FROM q),
         cand AS (SELECT vec_id AS src, nb_id AS dst FROM r7 WHERE rk <= $KnnK
           UNION SELECT src, dst FROM ie
           UNION SELECT dst AS src, src AS dst FROM ie)"""
  }

  /** The final re-rank + degree cut over a candidate CTE — the SQL
    * twin of the Scala-side compactRerank seam.
    */
  private def compactRerankSql(candCte: String): String = {
    val deg = graft.operators.Similarity.GraphCompactDegree
    s"""sc_cr AS (SELECT c.src, c.dst,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos
           FROM $candCte c JOIN me a ON a.vec_id = c.src
             JOIN me b ON b.vec_id = c.dst)
         SELECT src AS vec_id, CAST(rk AS INTEGER) AS rk, dst AS nb_id, cos
         FROM (SELECT *, row_number() OVER (PARTITION BY src
             ORDER BY cos DESC, dst) AS rk FROM sc_cr)
         WHERE rk <= $deg ORDER BY 1, 2"""
  }

  private val Sim22OracleSql: String =
    s"""WITH $Sim22CandCtes,
         ${compactRerankSql("cand")}"""

  /** Generated DuckDB replay of sim24's tombstoned consolidate: the
    * shared evidence chain, the DiskANN re-link (live→live edges kept;
    * a live→dead edge replaced by the dead node's own live out-edges;
    * dead-src edges gone), and the shared re-rank cut. cand24's
    * predicates exclude every dead endpoint, so joining the full `me`
    * is equivalent to the Scala side's live-node fence.
    */
  private val Sim24OracleSql: String = {
    val thr = graft.operators.Similarity.TombstoneHexThr
    def tomb(c: String) =
      s"substr(md5('tombstone:' || CAST($c AS VARCHAR)), 1, 2) < '$thr'"
    s"""WITH $Sim22CandCtes,
         cand24 AS (
           SELECT src, dst FROM cand
           WHERE NOT ${tomb("src")} AND NOT ${tomb("dst")}
           UNION
           SELECT c.src, c2.dst FROM cand c JOIN cand c2 ON c2.src = c.dst
           WHERE NOT ${tomb("c.src")} AND ${tomb("c.dst")}
             AND NOT ${tomb("c2.dst")} AND c2.dst <> c.src),
         ${compactRerankSql("cand24")}"""
  }

  /** Generated DuckDB replay of sim20's knob sweep: the shared
    * navigation preamble, ONE unrolled trajectory chain per
    * (entries, beam) config ([[sim20ChainSql]] — sim19's chain
    * parameterized, every pool row tagged with its entering round),
    * the exact top-k truth side, and the curve aggregated per
    * (entries, beam, rounds) with the intRatio recall presentation.
    * Every constant interpolates from the operator (etl27 discipline).
    */
  private val Sim20OracleSql: String = {
    import graft.operators.Similarity.{GraphRounds, GraphSweepConfigs,
      NumQueryVectors, TopK}
    val nTrue = NumQueryVectors * TopK
    val chains = GraphSweepConfigs.map { case (ent, b) =>
      sim20ChainSql(ent, b)
    }.mkString(",\n         ")
    val poolUnion = GraphSweepConfigs.map { case (ent, b) =>
      s"SELECT $ent AS entries, $b AS beam, q_id, vec_id, er FROM p_c${ent}_$b"
    }.mkString("\n           UNION ALL ")
    s"""WITH $Sim19NavCtes,
         ex20 AS MATERIALIZED (SELECT q_id, vec_id FROM (
             SELECT s.q_id, s.vec_id, row_number() OVER (
                 PARTITION BY s.q_id ORDER BY s.cos DESC, s.vec_id) AS rk
             FROM (SELECT q.q_id, e.vec_id,
                 round(list_cosine_similarity(q.qv, e.v), 4) AS cos
               FROM q, e WHERE e.vec_id <> q.q_id) s)
           WHERE rk <= $TopK),
         $chains,
         pools20 AS ($poolUnion),
         lv20 AS (SELECT p.entries, p.beam, CAST(t.r AS INTEGER) AS rounds,
             (ex.vec_id IS NOT NULL) AS hit
           FROM pools20 p
           LEFT JOIN ex20 ex ON ex.q_id = p.q_id AND ex.vec_id = p.vec_id,
           unnest(range(p.er, ${GraphRounds + 1})) AS t(r))
         SELECT CAST(entries AS INTEGER) AS entries,
           CAST(beam AS INTEGER) AS beam, rounds,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST($nTrue AS BIGINT) AS n_true,
           CAST((2*10000*sum(CASE WHEN hit THEN 1 ELSE 0 END) + $nTrue)
                // (2*$nTrue) AS BIGINT) / 10000.0 AS recall
         FROM lv20
         GROUP BY entries, beam, rounds
         ORDER BY entries, beam, rounds"""
  }

  /** Generated DuckDB replay of sim18's retrain + swap: the merged
    * corpus (base embeddings ∪ sim17's drift-synthesized appends — the
    * identical blend arithmetic), the FULL k-means training chain
    * re-run over it (the same generated [[kmeansCteSql]] the sim03
    * oracle uses, here with `e` bound to the MERGED corpus — seeding
    * by vec_id < K picks the base vectors on both engines), and the
    * post-swap per-cell layout with append mass. The version is the
    * deterministic v2 of the per-session store (v1 = deployed, v2 =
    * retrained). Pinning the oracle to the fresh-training chain is
    * exactly the "post-swap assignment == a fresh sim03 build over the
    * merged corpus" contract: a stale or torn codebook read anywhere
    * breaks the cell layout.
    */
  private val Sim18OracleSql: String = {
    import graft.operators.Similarity.{Dims, KmeansIters, NumQueryVectors,
      StaleBatches, StaleDriftStep, StaleIdBase}
    s"""WITH eb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       q AS (SELECT vec_id AS q_id, v AS qv FROM eb WHERE vec_id < $NumQueryVectors),
       ap AS (SELECT $StaleIdBase + b*100 + q_id AS vec_id,
           list_transform(range(1, ${Dims + 1}), i ->
             (1.0 - b*$StaleDriftStep)*qv[CAST(i AS INT)] +
               (b*$StaleDriftStep)*qv[CAST(${Dims + 1} - i AS INT)]) AS v
         FROM q, unnest(range(1, ${StaleBatches + 1})) AS t(b)),
       e AS (SELECT vec_id, v FROM eb UNION ALL SELECT vec_id, v FROM ap),
       ${kmeansCteSql(16, KmeansIters, cosine = true)},
       c AS (SELECT cid, cv FROM kc$KmeansIters),
       assign AS (SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cid AS cell, row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS crk
           FROM e, c) WHERE crk = 1)
       SELECT CAST(2 AS BIGINT) AS codebook_version,
         CAST(cell AS BIGINT) AS cell,
         count(*) AS n_vectors,
         CAST(sum(CASE WHEN vec_id >= $StaleIdBase THEN 1 ELSE 0 END) AS BIGINT)
           AS n_appends
       FROM assign GROUP BY cell ORDER BY cell"""
  }

  /** Generated DuckDB replay of sim02's hyperplane LSH search. The ±1
    * coefficient matrix is a pure function of (plane, dim) — evaluated
    * here with the SAME XxHash64 expression the operator's driver-side
    * precompute uses, then inlined as signed adds. Both engines then
    * evaluate the identical left-associated double summation, so even
    * the dot-product SIGNS (the bucket bits) are bit-identical; the
    * rest — multi-probe bucket join, exact rescoring, top-k — is plain
    * deterministic SQL.
    */
  private val Sim02OracleSql: String = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val planes = 4; val dims = 64
    def coefPositive(p: Int, d: Int): Boolean =
      (XxHash64(Seq(Literal(p), Literal(d)), 42L).eval(null)
        .asInstanceOf[Long] & 1L) == 0L
    val dots = (0 until planes).map { p =>
      (0 until dims).map { d =>
        s"${if (coefPositive(p, d)) "+" else "-"} v[${d + 1}]"
      }.mkString(" ")
    }
    val bucketExpr = (0 until planes).map(p =>
      s"(CASE WHEN (${dots(p)}) >= 0 THEN ${1L << p} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
       q AS (SELECT vec_id AS q_id, v AS qv, bucket AS qb FROM b WHERE vec_id < 5),
       probes AS (SELECT q_id, qv,
           unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8)]) AS probe
         FROM q),
       s AS (SELECT p.q_id, b.vec_id,
               round(list_cosine_similarity(p.qv, b.v), 4) AS cos
             FROM probes p JOIN b ON b.bucket = p.probe
             WHERE b.vec_id <> p.q_id),
       r AS (SELECT q_id, vec_id, cos, row_number() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
       SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM r
       WHERE rk <= 10 ORDER BY q_id, rk"""
  }

  /** Shared window grammar of the dedup10/cur16 oracles: stride-1
    * [[graft.operators.Dedup.SubstringWindow]]-token windows over the
    * split-by-space token stream — generated from the SAME constant
    * the operators chunk with (the etl27 shared-constant discipline),
    * so a window-size change can never silently hash-mismatch. DuckDB
    * groups/joins the window STRINGS where Spark shuffles xxhash64 of
    * them — identical results modulo 64-bit collisions (the dedup08
    * set-semantics argument).
    */
  private def strideWindowSql(withSource: Boolean): String = {
    val k = graft.operators.Dedup.SubstringWindow
    val src = if (withSource) ", source" else ""
    s"""toks AS (SELECT doc_id$src, string_split(text, ' ') AS t FROM documents),
         w AS (SELECT doc_id$src, CAST(i AS INTEGER) AS pos,
             array_to_string(t[CAST(i+1 AS INT):CAST(i+$k AS INT)], ' ') AS s
           FROM toks, UNNEST(range(0, greatest(len(t) - ${k - 1}, 0))) AS u(i))"""
  }

  /** The lag/cumsum island merge every span oracle runs: flagged
    * window starts (doc_id, pos in `flaggedCte`) → a `spans` CTE of
    * maximal spans (CTE form, so dedup10/cur16 can select it verbatim
    * while cur17 builds the scrub on top of it).
    */
  private def islandCtesSql(flaggedCte: String): String = {
    val k = graft.operators.Dedup.SubstringWindow
    s"""g AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $k
                  THEN 1 ELSE 0 END AS is_new
           FROM $flaggedCte),
         gi AS (SELECT doc_id, pos, sum(is_new) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
           FROM g),
         spans AS (SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
             CAST(min(pos) AS INTEGER) AS start_pos,
             CAST(max(pos) + ${k - 1} AS INTEGER) AS end_pos,
             count(*) AS n_windows
           FROM gi GROUP BY doc_id, span_id)"""
  }

  private val SpanSelectSql: String =
    """SELECT doc_id, span_id, start_pos, end_pos, n_windows
       FROM spans ORDER BY doc_id, span_id"""

  /** cur16's window GRAMMAR CTEs (source-carrying stride windows +
    * the held-out distinct-window index) — the block cur16/cur17's
    * flagged stream and cur18's post-boilerplate flagged stream both
    * build on, so the grammar and the held index have ONE definition.
    */
  private val Cur16GrammarCtes: String =
    s"""${strideWindowSql(withSource = true)},
         held AS (SELECT DISTINCT s FROM w WHERE source = 'src0')"""

  /** cur16's flagged-window CTEs (held-out probe over the
    * source-carrying grammar) — shared by the cur16 and cur17 oracles
    * so the contamination decision cannot drift between report and
    * rewrite.
    */
  private val Cur16FlaggedCtes: String =
    s"""$Cur16GrammarCtes,
         fl AS (SELECT w.doc_id, w.pos FROM w JOIN held USING (s)
                WHERE w.source <> 'src0')"""

  /** dedup10's oracle: within-corpus window df > 1, island-merged. */
  private val Dedup10OracleSql: String =
    s"""WITH ${strideWindowSql(withSource = false)},
         df AS (SELECT s FROM w GROUP BY s HAVING count(DISTINCT doc_id) > 1),
         fl AS (SELECT w.doc_id, w.pos FROM w JOIN df USING (s)),
         ${islandCtesSql("fl")}
         $SpanSelectSql"""

  /** cur16's oracle: the SAME grammar crossed against the held-out
    * split (src0) — a train window is contaminated iff its string
    * appears anywhere in the held-out side, regardless of alignment;
    * train-train repeats must NOT flag (that is dedup10's business).
    */
  private val Cur16OracleSql: String =
    s"""WITH $Cur16FlaggedCtes,
         ${islandCtesSql("fl")}
         $SpanSelectSql"""

  /** cur17's oracle: cur16's identical flagged-window CTEs, then the
    * scrub — covered positions are the union of [pos, pos+k−1] over
    * flagged windows (exactly the island spans' extent, so
    * Σ(end−start+1) is the removed count), surviving tokens rebuild in
    * position order. Empty rebuilds (fully-covered docs) coalesce to
    * '' on both sides.
    */
  private val Cur17OracleSql: String = {
    val k = graft.operators.Dedup.SubstringWindow
    s"""WITH $Cur16FlaggedCtes,
         ${islandCtesSql("fl")},
         cov AS (SELECT DISTINCT doc_id, CAST(pos + u.i AS INT) AS cp
                 FROM fl, unnest(range(0, $k)) AS u(i)),
         tp AS (SELECT doc_id, CAST(u.i AS INT) AS p, t[CAST(u.i + 1 AS INT)] AS tok
                FROM toks, unnest(range(0, len(t))) AS u(i)
                WHERE doc_id IN (SELECT DISTINCT doc_id FROM spans)),
         kept AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
                  LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.cp = tp.p
                  WHERE cov.cp IS NULL),
         cl AS (SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS clean_text
                FROM kept GROUP BY doc_id),
         ag AS (SELECT doc_id, count(*) AS n_spans,
                  CAST(sum(end_pos - start_pos + 1) AS BIGINT) AS n_removed
                FROM spans GROUP BY doc_id),
         nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
         SELECT ag.doc_id, ag.n_spans, nt.n_tokens, ag.n_removed,
           coalesce(cl.clean_text, '') AS clean_text
         FROM ag JOIN nt USING (doc_id) LEFT JOIN cl USING (doc_id)
         ORDER BY ag.doc_id"""
  }

  /** Stages 1–4 of the curation funnel as CTEs (quality gate → exact
    * dedup keepers → near-dup drop), shared VERBATIM by the cur06 and
    * cur18 oracles so the two composed pipelines can never drift on
    * the funnel. Leaves `t` (the non-held-out input), `s1` (quality
    * survivors), `s2` (exact-dedup keepers) and `s3` (near-dup
    * survivors) in scope.
    */
  private val CurFunnelCtes: String =
    """t AS (SELECT doc_id, source, n_chars, text,
             string_split(text, ' ') AS toks
           FROM documents WHERE source <> 'src0'),
         q AS (SELECT doc_id, source, n_chars, text,
             (n_chars >= 100 AND len(toks) >= 20 AND
              CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                / greatest(len(toks), 1) >= 0.02) AS q_keep
           FROM t),
         s1 AS (SELECT doc_id, source, n_chars, text FROM q WHERE q_keep),
         k AS (SELECT min(doc_id) AS doc_id FROM s1
               GROUP BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))),
         s2 AS (SELECT s1.doc_id, s1.source, s1.n_chars FROM s1 JOIN k USING (doc_id)),
         shd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS s FROM shd),
         sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
         prs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         nd AS (SELECT da, db FROM (
                  SELECT da, db, CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) AS j
                  FROM prs JOIN sizes ca ON prs.da = ca.doc_id
                  JOIN sizes cb ON prs.db = cb.doc_id)
                WHERE j >= 0.8),
         drop3 AS (SELECT DISTINCT db AS doc_id FROM nd
                   WHERE da IN (SELECT doc_id FROM s2)
                     AND db IN (SELECT doc_id FROM s2)),
         s3 AS (SELECT * FROM s2
                WHERE doc_id NOT IN (SELECT doc_id FROM drop3))"""

  /** cur19's oracle: the SAME window grammar (shared
    * [[Cur16GrammarCtes]] block — the report cannot use a different
    * chunking than the scrub), transposed to the held-out axis: held
    * windows carry their doc + position, train windows deduplicate to
    * (train_id, s), the hash-keyed join becomes a string join, and
    * the per-held aggregates + top-offender ranking replay verbatim.
    */
  private val Cur19OracleSql: String =
    s"""WITH $Cur16GrammarCtes,
         hw AS (SELECT doc_id AS held_id, pos, s FROM w WHERE source = 'src0'),
         tw AS (SELECT DISTINCT doc_id AS train_id, s FROM w
                WHERE source <> 'src0'),
         pr AS (SELECT hw.held_id, hw.pos, hw.s, tw.train_id
                FROM hw JOIN tw USING (s)),
         per AS (SELECT held_id,
             CAST(count(DISTINCT pos) AS BIGINT) AS n_leaked,
             CAST(count(DISTINCT train_id) AS BIGINT) AS n_train_docs
           FROM pr GROUP BY held_id),
         sh AS (SELECT held_id, train_id,
             CAST(count(DISTINCT s) AS BIGINT) AS shared
           FROM pr GROUP BY held_id, train_id),
         tp AS (SELECT held_id, train_id AS top_train_id,
             shared AS top_shared
           FROM (SELECT *, row_number() OVER (PARTITION BY held_id
               ORDER BY shared DESC, train_id) AS rk FROM sh)
           WHERE rk = 1),
         tot AS (SELECT doc_id AS held_id, count(*) AS nw
           FROM w WHERE source = 'src0' GROUP BY doc_id),
         hd AS (SELECT doc_id AS held_id FROM documents WHERE source = 'src0')
         SELECT hd.held_id,
           CAST(coalesce(t.nw, 0) AS BIGINT) AS n_windows,
           coalesce(per.n_leaked, 0) AS n_leaked,
           coalesce(per.n_train_docs, 0) AS n_train_docs,
           coalesce(tp.top_train_id, -1) AS top_train_id,
           coalesce(tp.top_shared, 0) AS top_shared
         FROM hd
         LEFT JOIN tot t USING (held_id)
         LEFT JOIN per USING (held_id)
         LEFT JOIN tp USING (held_id)
         ORDER BY hd.held_id"""

  /** cur18's oracle: the shared funnel CTEs, then the text20
    * boilerplate stage replayed on chunk STRINGS (text20's oracle
    * grammar — same `ParagraphTokens`/`BoilerplateMinDocs` constants),
    * then cur16's window grammar re-run over the POST-BOILER corpus:
    * unaffected docs keep their raw windows (byte-identical text),
    * affected docs' windows are rebuilt from the scrubbed token list
    * — junction windows included — and probed against the SAME `held`
    * index with the SAME island merge (one more shared block — the
    * contamination decision cannot drift between cur16/17 and the
    * composed build), then the post-scrub stages replayed in integer
    * arithmetic: per-doc removed-token sums (boiler in raw tokens,
    * contamination in post-boiler tokens — sequential coordinates, so
    * the subtraction is disjoint by construction) joined to the
    * survivors, cur07's integer threshold protocol over the clean
    * mix, cur11's hex ranges on the SALTED split key, and cur09's
    * window cumsum packing of the train split cut every
    * Cur18CtxTokens POST-BOTH-SCRUBS tokens. Every count is integer
    * end to end.
    */
  /** The shared funnel CTE chain through the per-doc sampled+split
    * frame (`spl`) — ONE SQL definition of stages 1–6 for the cur18
    * report and cur20's emitted-manifest audit, mirroring the shared
    * `funnelInputs → funnelScrubbed → funnelSplit` Scala seam.
    */
  private lazy val Cur18SplCtes: String = {
    val bk = graft.operators.Dedup.ParagraphTokens
    val minDocs = graft.operators.TextAnalysis.BoilerplateMinDocs
    val wk = graft.operators.Dedup.SubstringWindow
    s"""$CurFunnelCtes,
         $Cur16GrammarCtes,
         ch AS (SELECT doc_id, CAST(u.i AS INTEGER) AS idx,
             array_to_string(t[CAST(u.i*$bk+1 AS BIGINT):CAST(u.i*$bk+$bk AS BIGINT)], ' ') AS s
           FROM toks, unnest(range(0, len(t)//$bk)) AS u(i)),
         bh AS (SELECT s FROM ch GROUP BY s
           HAVING count(DISTINCT doc_id) >= $minDocs),
         bfl AS (SELECT ch.doc_id, ch.idx FROM ch
           WHERE ch.s IN (SELECT s FROM bh)),
         aff AS (SELECT DISTINCT doc_id FROM bfl),
         brm AS (SELECT doc_id, CAST(count(*) * $bk AS BIGINT) AS brm
           FROM bfl GROUP BY doc_id),
         atp AS (SELECT tk.doc_id, CAST(u.i AS INTEGER) AS p,
             t[CAST(u.i+1 AS BIGINT)] AS tok
           FROM toks tk JOIN aff USING (doc_id),
             unnest(range(0, len(t))) AS u(i)
           WHERE tk.source <> 'src0'),
         akept AS (SELECT a.doc_id, a.p, a.tok FROM atp a
           LEFT JOIN bfl b ON b.doc_id = a.doc_id AND b.idx = a.p // $bk
           WHERE b.idx IS NULL),
         atoks AS (SELECT doc_id, list(tok ORDER BY p) AS t
           FROM akept GROUP BY doc_id),
         aw AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
             array_to_string(t[CAST(u.i+1 AS BIGINT):CAST(u.i+$wk AS BIGINT)], ' ') AS s
           FROM atoks, unnest(range(0, greatest(len(t) - ${wk - 1}, 0))) AS u(i)),
         tw AS (SELECT w.doc_id, w.pos, w.s FROM w
           WHERE w.source <> 'src0'
             AND w.doc_id NOT IN (SELECT doc_id FROM aff)
           UNION ALL SELECT doc_id, pos, s FROM aw),
         fl AS (SELECT tw.doc_id, tw.pos FROM tw JOIN held USING (s)),
         ${islandCtesSql("fl")},
         ntk AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_toks
                 FROM toks WHERE source <> 'src0'),
         ag AS (SELECT doc_id,
             CAST(sum(end_pos - start_pos + 1) AS BIGINT) AS rm
           FROM spans GROUP BY doc_id),
         surv AS (SELECT s3.doc_id, s3.source, ntk.n_toks,
             coalesce(brm.brm, 0) AS brm,
             coalesce(ag.rm, 0) AS rm,
             ntk.n_toks - coalesce(brm.brm, 0) - coalesce(ag.rm, 0)
               AS post_toks
           FROM s3 JOIN ntk ON ntk.doc_id = s3.doc_id
           LEFT JOIN brm ON brm.doc_id = s3.doc_id
           LEFT JOIN ag ON ag.doc_id = s3.doc_id),
         cl18 AS (SELECT * FROM surv WHERE post_toks > 0),
         cc18 AS (SELECT source, count(*) AS n_docs FROM cl18 GROUP BY source),
         rt18 AS (SELECT source, n_docs,
             CAST(sum(n_docs) OVER () AS BIGINT) AS tot,
             count(*) OVER () AS knum
           FROM cc18),
         th18 AS (SELECT source,
             CAST(least(65536, (65536 * tot) // (knum * n_docs)) AS BIGINT) AS thr_raw,
             printf('%04x', CAST(least(65536, (65536 * tot) // (knum * n_docs)) AS INT)) AS thr
           FROM rt18),
         smp AS (SELECT cl18.doc_id, cl18.source, cl18.post_toks
           FROM cl18 JOIN th18 USING (source)
           WHERE thr_raw >= 65536
             OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < thr),
         spl AS (SELECT *,
             CASE WHEN substr(md5('cur18:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
                  WHEN substr(md5('cur18:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
                  ELSE 'test' END AS split
           FROM smp)"""
  }

  private val Cur18OracleSql: String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    s"""WITH $Cur18SplCtes,
         pk AS (SELECT source, post_toks,
             sum(post_toks) OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
           FROM spl WHERE split = 'train'),
         pka AS (SELECT source, CAST(sum(post_toks) AS BIGINT) AS train_toks,
             CAST((max(cum_end) + ${ctx - 1}) // $ctx AS BIGINT) AS n_sequences,
             CAST(sum(CASE WHEN (cum_end - 1) // $ctx > (cum_end - post_toks) // $ctx
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
           FROM pk GROUP BY source),
         sc18 AS (SELECT source,
             CAST(sum(CASE WHEN brm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
             CAST(sum(brm) AS BIGINT) AS boiler_toks,
             CAST(sum(CASE WHEN rm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contam,
             CAST(sum(rm) AS BIGINT) AS toks_removed,
             CAST(sum(CASE WHEN post_toks > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
           FROM surv GROUP BY source),
         sm18 AS (SELECT source, count(*) AS n_sampled,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
           FROM spl GROUP BY source),
         bs18 AS (SELECT source, count(*) AS n_input,
             CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s1) THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s2) THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
             CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s3) THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup
           FROM t GROUP BY source)
         SELECT b.source, b.n_input, b.n_quality, b.n_exact, b.n_neardup,
           coalesce(sc.n_boiler, 0) AS n_boiler,
           coalesce(sc.boiler_toks, 0) AS boiler_toks,
           coalesce(sc.n_contam, 0) AS n_contam,
           coalesce(sc.toks_removed, 0) AS toks_removed,
           coalesce(sc.n_clean, 0) AS n_clean,
           coalesce(sm.n_sampled, 0) AS n_sampled,
           coalesce(sm.n_train, 0) AS n_train,
           coalesce(sm.n_val, 0) AS n_val,
           coalesce(sm.n_test, 0) AS n_test,
           coalesce(p.train_toks, 0) AS train_toks,
           coalesce(p.n_sequences, 0) AS n_sequences,
           coalesce(p.n_split_docs, 0) AS n_split_docs
         FROM bs18 b
         LEFT JOIN sc18 sc USING (source)
         LEFT JOIN sm18 sm USING (source)
         LEFT JOIN pka p USING (source)
         ORDER BY b.source"""
  }

  /** Generated DuckDB replay of cur20's emitted-manifest audit: the
    * SAME funnel CTEs through the sampled+split frame, then cur09's
    * window-cumsum packing positions per train doc and the
    * (source, shard) rollup. The Spark side computes this FROM THE
    * EMITTED FILES, so the match proves the partitioned
    * write→read-back round-trip lossless (etl10's discipline) on top
    * of the funnel replay.
    */
  private val Cur20OracleSql: String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    val sps = graft.operators.Curation.Cur20SeqsPerShard
    s"""WITH $Cur18SplCtes,
         pk20 AS (SELECT source, post_toks,
             sum(post_toks) OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
           FROM spl WHERE split = 'train'),
         ps20 AS (SELECT source, post_toks,
             CAST((cum_end - post_toks) // $ctx AS BIGINT) AS seq_first,
             CAST((cum_end - 1) // $ctx AS BIGINT) AS seq_last
           FROM pk20)
         SELECT source,
           CAST(seq_first // $sps AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(post_toks) AS BIGINT) AS shard_toks,
           CAST(min(seq_first) AS BIGINT) AS seq_lo,
           CAST(max(seq_last) AS BIGINT) AS seq_hi,
           CAST(sum(CASE WHEN seq_last // $sps > seq_first // $sps
               THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
         FROM ps20
         GROUP BY source, shard
         ORDER BY source, shard"""
  }

  /** Generated DuckDB replay of cur23's payload-shard audit: the shared
    * funnel CTEs through the sampled+split frame, the train packing
    * window (cur20's), the post-both-scrubs TOKEN LIST per train doc
    * (post-boiler tokens — `atoks` for affected docs, raw `toks`
    * otherwise — minus the contamination spans' positions, cur17's
    * grammar), and the same sequence reassembly the Spark side computes
    * FROM THE EMITTED FILES: slices cut at cum_start offsets, joined in
    * cum_start order per (source, seq), md5-60-bit hashed, summed per
    * shard. A payload byte lost, re-ordered, or mis-sliced anywhere in
    * the write→read-back→reassemble chain moves a hash sum.
    */
  /** The payload reassembly-audit SQL over an explicit positions CTE
    * chain ending in `pm` (doc_id, source, post_toks, cum_start,
    * seq_first, seq_last) — cur23's whole token-rebuild + slice +
    * hash grammar, parameterized (round 16) so cur26's post-takedown
    * audit replays through the SAME chain with only the positions
    * swapped (exactly mirroring the Scala-side payloadShardAudit
    * seam).
    */
  /** The CTE chain from the shared funnel through the per-sequence
    * reassembly (`sq23`: one row per (source, seq) with the
    * reassembled stext) over an explicit positions chain ending in
    * `pm` — factored (round 17) so cur27's per-sequence equivalence
    * oracle replays the SAME token-rebuild + slice grammar as the
    * shard audits (exactly mirroring the Scala-side
    * reassembledSequences seam).
    */
  private def payloadSeqCtes(positionsCtes: String): String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    s"""$Cur18SplCtes,
         $positionsCtes,
         ptoks AS (SELECT a.doc_id, a.t FROM atoks a JOIN pm USING (doc_id)
           UNION ALL
           SELECT tk.doc_id, tk.t FROM toks tk JOIN pm USING (doc_id)
           WHERE tk.doc_id NOT IN (SELECT doc_id FROM aff)),
         kept23 AS (SELECT p.doc_id, CAST(u.i AS INT) AS pos,
             p.t[CAST(u.i + 1 AS BIGINT)] AS tok
           FROM ptoks p, unnest(range(0, len(p.t))) AS u(i)
           WHERE NOT EXISTS (SELECT 1 FROM spans s
               WHERE s.doc_id = p.doc_id
                 AND u.i >= s.start_pos AND u.i <= s.end_pos)),
         ptl AS (SELECT doc_id, list(tok ORDER BY pos) AS ptoks
           FROM kept23 GROUP BY doc_id),
         sl23 AS (SELECT pm.source, CAST(t.s AS BIGINT) AS seq, pm.cum_start,
             ptl.ptoks[CAST(greatest(pm.cum_start, t.s * $ctx) - pm.cum_start + 1 AS BIGINT):
                       CAST(least(pm.cum_start + len(ptl.ptoks), (t.s + 1) * $ctx) - pm.cum_start AS BIGINT)] AS part
           FROM pm JOIN ptl USING (doc_id),
             unnest(range(pm.seq_first, pm.seq_last + 1)) AS t(s)),
         sq23 AS (SELECT source, seq,
             array_to_string(flatten(list(part ORDER BY cum_start)), ' ') AS stext
           FROM sl23 GROUP BY source, seq)"""
  }

  private def payloadAuditSql(positionsCtes: String): String = {
    val sps = graft.operators.Curation.Cur20SeqsPerShard
    s"""WITH ${payloadSeqCtes(positionsCtes)},
         dsh AS (SELECT source, CAST(seq_first // $sps AS BIGINT) AS shard,
             count(*) AS n_docs,
             CAST(sum(len(ptoks)) AS BIGINT) AS payload_toks
           FROM pm JOIN ptl USING (doc_id) GROUP BY 1, 2),
         ssh AS (SELECT source, CAST(seq // $sps AS BIGINT) AS shard,
             count(*) AS n_seqs,
             CAST(sum(len(string_split(stext, ' '))) AS BIGINT) AS seq_toks,
             CAST(sum(('0x' || substr(md5(stext), 1, 15))::BIGINT) AS BIGINT) AS seq_hash_sum
           FROM sq23 GROUP BY 1, 2)
         SELECT coalesce(d.source, s.source) AS source,
           coalesce(d.shard, s.shard) AS shard,
           coalesce(d.n_docs, 0) AS n_docs,
           coalesce(d.payload_toks, 0) AS payload_toks,
           coalesce(s.n_seqs, 0) AS n_seqs,
           coalesce(s.seq_toks, 0) AS seq_toks,
           coalesce(s.seq_hash_sum, 0) AS seq_hash_sum
         FROM dsh d FULL OUTER JOIN ssh s
           ON d.source = s.source AND d.shard = s.shard
         ORDER BY source, shard"""
  }

  /** The train split's packing-window positions CTE chain (ending in
    * `pm`), with an optional extra predicate on the packed doc set —
    * ONE SQL definition of the md5-ordered running sum for cur23
    * (every train doc) and cur26 (the post-takedown survivors), so
    * the packing-order expression can never drift between the two
    * audits (round-16 review: it was pasted twice).
    */
  private def packingPositionsCtes(extraWhere: String): String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    s"""trn AS (SELECT doc_id, source, post_toks,
             sum(post_toks) OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
           FROM spl WHERE split = 'train'$extraWhere),
         pm AS (SELECT doc_id, source, post_toks,
             CAST(cum_end - post_toks AS BIGINT) AS cum_start,
             CAST((cum_end - post_toks) // $ctx AS BIGINT) AS seq_first,
             CAST((cum_end - 1) // $ctx AS BIGINT) AS seq_last
           FROM trn)"""
  }

  private val Cur23OracleSql: String =
    payloadAuditSql(packingPositionsCtes(""))

  /** Generated DuckDB replay of cur26's repack execute: the SAME
    * reassembly-audit grammar as cur23, with the positions window
    * restricted to the POST-TAKEDOWN survivors (cur24's "after"
    * positions) — a prefix shard's hash sums must come out identical
    * to cur23's and the dirty suffix re-derived, or the hash breaks.
    */
  /** The survivor predicate of the post-takedown positions window —
    * ONE SQL definition for cur26's and cur27's oracles.
    */
  private val TakedownSurvivorWhere: String = {
    val thr = graft.operators.Curation.TakedownHexThr
    s"""
             AND substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 2)
               >= '$thr'"""
  }

  private val Cur26OracleSql: String =
    payloadAuditSql(packingPositionsCtes(TakedownSurvivorWhere))

  /** Generated DuckDB replay of cur27's mask↔repack equivalence: the
    * REPACKED per-sequence stream computed ONCE through the shared
    * token-rebuild + slice grammar over the survivor positions window
    * (cur26's chain), emitted as BOTH legs' expected hash/count with
    * `is_match = true` — the oracle states the law, so a Spark-side
    * divergence between mask semantics (leg A) and repack semantics
    * (leg B) lands as a row-hash mismatch on whichever leg broke.
    */
  private val Cur27OracleSql: String =
    s"""WITH ${payloadSeqCtes(packingPositionsCtes(TakedownSurvivorWhere))}
         SELECT source, seq, true AS is_match,
           CAST(len(string_split(stext, ' ')) AS BIGINT) AS masked_toks,
           CAST(len(string_split(stext, ' ')) AS BIGINT) AS repack_toks,
           ('0x' || substr(md5(stext), 1, 15))::BIGINT AS masked_hash,
           ('0x' || substr(md5(stext), 1, 15))::BIGINT AS repack_hash
         FROM sq23
         ORDER BY source, seq"""

  /** Generated DuckDB replay of cur24's takedown audit: the shared
    * funnel CTEs through the sampled+split frame, the BEFORE packing
    * window (cur20's, with the salted takedown flag), the AFTER window
    * re-run over the survivors only, and the per-source integer
    * rollup — removal mass, the stable/moved split (a survivor moves
    * iff its (seq_first, off_first) pair changed), ceil sequence
    * counts, first dirty sequence (−1 in-band when the source is
    * clean), and the dirty-shard suffix bill.
    */
  private val Cur24OracleSql: String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    val sps = graft.operators.Curation.Cur20SeqsPerShard
    val thr = graft.operators.Curation.TakedownHexThr
    s"""WITH $Cur18SplCtes,
         pk24 AS (SELECT doc_id, source, post_toks,
             sum(post_toks) OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
           FROM spl WHERE split = 'train'),
         bm24 AS (SELECT doc_id, source, post_toks,
             CAST((cum_end - post_toks) // $ctx AS BIGINT) AS seq_first,
             CAST((cum_end - post_toks) % $ctx AS BIGINT) AS off_first,
             (substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 2)
               < '$thr') AS takedown
           FROM pk24),
         ak24 AS (SELECT doc_id, post_toks,
             sum(post_toks) OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
           FROM bm24 WHERE NOT takedown),
         af24 AS (SELECT doc_id,
             CAST((cum_end - post_toks) // $ctx AS BIGINT) AS nsf,
             CAST((cum_end - post_toks) % $ctx AS BIGINT) AS nof
           FROM ak24)
         SELECT b.source,
           count(*) AS n_before,
           CAST(sum(CASE WHEN b.takedown THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN b.takedown THEN b.post_toks ELSE 0 END)
             AS BIGINT) AS toks_removed,
           CAST(sum(CASE WHEN NOT b.takedown AND a.nsf = b.seq_first
               AND a.nof = b.off_first THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stable,
           CAST(sum(CASE WHEN NOT b.takedown AND (a.nsf <> b.seq_first
               OR a.nof <> b.off_first) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST((sum(b.post_toks) + ${ctx - 1}) // $ctx AS BIGINT)
             AS seqs_before,
           CAST((sum(b.post_toks)
               - sum(CASE WHEN b.takedown THEN b.post_toks ELSE 0 END)
               + ${ctx - 1}) // $ctx AS BIGINT) AS seqs_after,
           CAST(coalesce(min(CASE WHEN b.takedown THEN b.seq_first END), -1)
             AS BIGINT) AS first_dirty_seq,
           CAST(CASE WHEN min(CASE WHEN b.takedown THEN b.seq_first END)
               IS NULL THEN 0
             ELSE ((sum(b.post_toks) + ${ctx - 1}) // $ctx - 1) // $sps
               - min(CASE WHEN b.takedown THEN b.seq_first END) // $sps + 1
             END AS BIGINT) AS shards_dirty
         FROM bm24 b LEFT JOIN af24 a USING (doc_id)
         GROUP BY b.source
         ORDER BY b.source"""
  }

  /** Generated DuckDB replay of cur25's tombstone mask: the shared
    * funnel CTEs, cur24's BEFORE packing window with the salted
    * takedown flag, and the removed rows exploded into their covered
    * sequences with the span clipped to each sequence's boundary —
    * pure integer arithmetic on the manifest coordinates.
    */
  /** The mask-row SQL over the shared funnel + packing window,
    * parameterized by the recall predicate and the masked GLOBAL range
    * [loG, hiG) in terms of `cum_start`/`post_toks` — ONE definition
    * of the clipping grammar for cur25 (whole-doc range) and cur28
    * (sub-doc span), mirroring the Scala clippedMaskRows seam.
    */
  private def maskRowsSql(where: String, loG: String, hiG: String): String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    val sps = graft.operators.Curation.Cur20SeqsPerShard
    s"""WITH $Cur18SplCtes,
         pkm AS (SELECT doc_id, source, post_toks,
             sum(post_toks) OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
           FROM spl WHERE split = 'train'),
         rmm AS (SELECT doc_id, source, post_toks,
             CAST(cum_end - post_toks AS BIGINT) AS cum_start
           FROM pkm WHERE $where),
         rgm AS (SELECT source, doc_id,
             CAST($loG AS BIGINT) AS lo_g, CAST($hiG AS BIGINT) AS hi_g
           FROM rmm),
         exm AS (SELECT source, CAST(t.s AS BIGINT) AS seq, doc_id,
             greatest(lo_g, t.s * $ctx) AS lo,
             least(hi_g, (t.s + 1) * $ctx) AS hi
           FROM rgm, unnest(range(lo_g // $ctx, (hi_g - 1) // $ctx + 1)) AS t(s))
         SELECT source, seq, CAST(seq // $sps AS BIGINT) AS shard, doc_id,
           CAST(lo - seq * $ctx AS BIGINT) AS mask_start,
           CAST(hi - 1 - seq * $ctx AS BIGINT) AS mask_end,
           CAST(hi - lo AS BIGINT) AS masked_toks
         FROM exm
         ORDER BY source, seq, mask_start, doc_id"""
  }

  private val Cur25OracleSql: String =
    maskRowsSql(
      s"""substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 2)
             < '${graft.operators.Curation.TakedownHexThr}'""",
      "cum_start", "cum_start + post_toks")

  /** Generated DuckDB replay of cur28's span-level redaction: the same
    * parameterized clipping grammar with the masked range being the
    * deterministic sub-doc span instead of the whole doc.
    */
  private val Cur28OracleSql: String =
    maskRowsSql(
      s"""substr(md5('redact:' || CAST(doc_id AS VARCHAR)), 1, 2)
             < '${graft.operators.Curation.RedactHexThr}'""",
      "cum_start + post_toks // 4",
      "cum_start + greatest(post_toks // 4 + 1, post_toks // 2)")

  /** Generated DuckDB replay of cur29's composed loader read: the
    * DOUBLY-repacked stream stated directly — takedown docs removed
    * entirely, surviving redact-flagged docs minus their deterministic
    * span (a 1-based list slice: kept = ptoks[1:lo] || ptoks[hi+1:]),
    * the survivors concatenated per source in the UNCHANGED packing
    * order and tiled at ctx through the same token-rebuild + slice
    * grammar as the shard audits. A Spark-side mis-composition of the
    * two mask families (double pass, overlap double-count, shifted
    * span) breaks the per-sequence hash.
    */
  /** The doubly-repacked stream's CTE chain (ending in `pm29` —
    * survivor positions with zero-length redaction-emptied docs
    * filtered, `ptl` — the span-sliced token lists, and `sq29` — the
    * re-tiled per-sequence stream), factored (round 19) so cur29's
    * per-sequence read and cur30's per-shard byte-retire audit replay
    * the IDENTICAL composition — the two oracles cannot drift.
    */
  private val Cur29SeqCtes: String = {
    val ctx = graft.operators.Curation.Cur18CtxTokens
    val rdThr = graft.operators.Curation.RedactHexThr
    s"""$Cur18SplCtes,
         tdoc AS (SELECT doc_id, source, post_toks FROM spl
           WHERE split = 'train'$TakedownSurvivorWhere),
         ptoks AS (SELECT a.doc_id, a.t FROM atoks a JOIN tdoc USING (doc_id)
           UNION ALL
           SELECT tk.doc_id, tk.t FROM toks tk JOIN tdoc USING (doc_id)
           WHERE tk.doc_id NOT IN (SELECT doc_id FROM aff)),
         kept29 AS (SELECT p.doc_id, CAST(u.i AS INT) AS pos,
             p.t[CAST(u.i + 1 AS BIGINT)] AS tok
           FROM ptoks p, unnest(range(0, len(p.t))) AS u(i)
           WHERE NOT EXISTS (SELECT 1 FROM spans s
               WHERE s.doc_id = p.doc_id
                 AND u.i >= s.start_pos AND u.i <= s.end_pos)),
         ptl0 AS (SELECT doc_id, list(tok ORDER BY pos) AS ptoks
           FROM kept29 GROUP BY doc_id),
         ptl AS (SELECT p.doc_id,
             CASE WHEN substr(md5('redact:' || CAST(p.doc_id AS VARCHAR)), 1, 2) < '$rdThr'
               THEN p.ptoks[1:CAST(t.post_toks // 4 AS BIGINT)]
                 || p.ptoks[CAST(greatest(t.post_toks // 4 + 1, t.post_toks // 2) + 1 AS BIGINT):CAST(len(p.ptoks) AS BIGINT)]
               ELSE p.ptoks END AS ptoks
           FROM ptl0 p JOIN tdoc t USING (doc_id)),
         pos29 AS (SELECT p.doc_id, t.source,
             sum(len(p.ptoks)) OVER (PARTITION BY t.source
               ORDER BY substr(md5(CAST(p.doc_id AS VARCHAR)), 1, 8), p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end,
             len(p.ptoks) AS klen
           FROM ptl p JOIN tdoc t USING (doc_id)),
         pm29 AS (SELECT doc_id, source,
             CAST(cum_end - klen AS BIGINT) AS cum_start,
             CAST((cum_end - klen) // $ctx AS BIGINT) AS seq_first,
             CAST((cum_end - 1) // $ctx AS BIGINT) AS seq_last
           FROM pos29 WHERE klen > 0),
         sl29 AS (SELECT pm.source, CAST(t.s AS BIGINT) AS seq, pm.cum_start,
             ptl.ptoks[CAST(greatest(pm.cum_start, t.s * $ctx) - pm.cum_start + 1 AS BIGINT):
                       CAST(least(pm.cum_start + len(ptl.ptoks), (t.s + 1) * $ctx) - pm.cum_start AS BIGINT)] AS part
           FROM pm29 pm JOIN ptl USING (doc_id),
             unnest(range(pm.seq_first, pm.seq_last + 1)) AS t(s)),
         sq29 AS (SELECT source, seq,
             array_to_string(flatten(list(part ORDER BY cum_start)), ' ') AS stext
           FROM sl29 GROUP BY source, seq)"""
  }

  private val Cur29OracleSql: String =
    s"""WITH $Cur29SeqCtes
         SELECT source, seq,
           CAST(len(string_split(stext, ' ')) AS BIGINT) AS n_toks,
           ('0x' || substr(md5(stext), 1, 15))::BIGINT AS content_hash
         FROM sq29
         ORDER BY source, seq"""

  /** Generated DuckDB replay of cur30's composed repack execute: the
    * SAME doubly-repacked chain as cur29 ([[Cur29SeqCtes]] — takedowns
    * removed, redaction spans sliced out, survivors re-packed in the
    * unchanged order), aggregated per (source, shard) through the SAME
    * shard-audit grammar as cur23/cur26 — doc and payload-token counts
    * from the survivor lists, sequence counts/tokens/hash sums from
    * the re-tiled stream. A retire that misses a span, keeps a
    * takedown doc's bytes, or shifts the repacked tiling moves a hash
    * sum.
    */
  private val Cur30OracleSql: String = {
    val sps = graft.operators.Curation.Cur20SeqsPerShard
    s"""WITH $Cur29SeqCtes,
         dsh AS (SELECT source, CAST(seq_first // $sps AS BIGINT) AS shard,
             count(*) AS n_docs,
             CAST(sum(len(ptoks)) AS BIGINT) AS payload_toks
           FROM pm29 JOIN ptl USING (doc_id) GROUP BY 1, 2),
         ssh AS (SELECT source, CAST(seq // $sps AS BIGINT) AS shard,
             count(*) AS n_seqs,
             CAST(sum(len(string_split(stext, ' '))) AS BIGINT) AS seq_toks,
             CAST(sum(('0x' || substr(md5(stext), 1, 15))::BIGINT) AS BIGINT) AS seq_hash_sum
           FROM sq29 GROUP BY 1, 2)
         SELECT coalesce(d.source, s.source) AS source,
           coalesce(d.shard, s.shard) AS shard,
           coalesce(d.n_docs, 0) AS n_docs,
           coalesce(d.payload_toks, 0) AS payload_toks,
           coalesce(s.n_seqs, 0) AS n_seqs,
           coalesce(s.seq_toks, 0) AS seq_toks,
           coalesce(s.seq_hash_sum, 0) AS seq_hash_sum
         FROM dsh d FULL OUTER JOIN ssh s
           ON d.source = s.source AND d.shard = s.shard
         ORDER BY source, shard"""
  }

  /** Generated DuckDB replay of cur31's mask-ledger vacuum: the
    * lifecycle audit stated directly from the two mask families'
    * shared clipping grammar — v1 counts cur25's whole-doc rows, v2
    * the composed ledger (both families), v3 the post-repack empty
    * ledger; the vacuum retires v1/v2 (n_expired = 2) and only the
    * empty current version survives. A Spark-side drift in either
    * family's row derivation, in the composed union, or in the
    * retention arithmetic lands as a count/flag mismatch.
    */
  private val Cur31OracleSql: String =
    s"""WITH tdm AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(masked_toks), 0) AS BIGINT) AS mt
           FROM ($Cur25OracleSql) td31),
         spm AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(masked_toks), 0) AS BIGINT) AS mt
           FROM ($Cur28OracleSql) sp31)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS version, tdm.n AS n_rows,
             tdm.n AS takedown_rows, CAST(0 AS BIGINT) AS span_rows,
             tdm.mt AS masked_toks, false AS retained,
             CAST(2 AS BIGINT) AS n_expired FROM tdm
           UNION ALL
           SELECT CAST(2 AS BIGINT), tdm.n + spm.n, tdm.n, spm.n,
             tdm.mt + spm.mt, false, CAST(2 AS BIGINT) FROM tdm, spm
           UNION ALL
           SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             true, CAST(2 AS BIGINT)
         ) v31 ORDER BY version"""

  /** Generated DuckDB replay of cur21's sort-free budget: the same
    * 256-bucket histogram over the md5 prefix, the bucket-prefix cut
    * as a window over the histogram (≤256 rows per source), and the
    * half-up integer utilization — budget interpolated from the
    * operator's constant (the etl27 discipline).
    */
  private val Cur21OracleSql: String = {
    val b = graft.operators.Curation.SourceCharBudget
    s"""WITH d21 AS (SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT AS INT) AS bucket
           FROM documents),
         h21 AS (SELECT source, bucket, CAST(sum(n_chars) AS BIGINT) AS bchars
           FROM d21 GROUP BY source, bucket),
         c21 AS (SELECT source, bucket,
             sum(bchars) OVER (PARTITION BY source ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM h21),
         cut21 AS (SELECT source, max(bucket) AS bucket_cut FROM c21
           WHERE cum <= $b GROUP BY source)
         SELECT d.source,
           CAST(coalesce(c.bucket_cut, -1) AS INT) AS bucket_cut,
           CAST(sum(CASE WHEN d.bucket <= coalesce(c.bucket_cut, -1)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(CASE WHEN d.bucket <= coalesce(c.bucket_cut, -1)
               THEN n_chars END), 0) AS BIGINT) AS chars_kept,
           CAST((2*10000*(coalesce(sum(CASE WHEN d.bucket <= coalesce(c.bucket_cut, -1)
               THEN n_chars END), 0)) + $b) // (2*$b) AS BIGINT) / 10000.0
             AS utilization
         FROM d21 d LEFT JOIN cut21 c ON d.source = c.source
         GROUP BY d.source, c.bucket_cut
         ORDER BY d.source"""
  }

  /** Generated DuckDB replay of cur22's sort-free percentile select:
    * text02's score on its integer 4-dp grid (the same CTE chain as
    * cur10's oracle), the descending-cumulative histogram cut as a
    * window over the histogram, and the bucket-granular selection.
    */
  private val Cur22OracleSql: String =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         c AS (SELECT doc_id, source,
             greatest(len(toks), 1) AS n,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS stop,
             len(toks) AS ntok FROM t),
         s AS (SELECT doc_id, source,
             CAST((2*10000*(least(ntok, 50) * (n - stop)) + (50 * n)) // (2*(50 * n)) AS BIGINT) AS qi
           FROM c),
         h AS (SELECT source, qi, count(*) AS cnt FROM s GROUP BY source, qi),
         ch AS (SELECT source, qi,
             sum(cnt) OVER (PARTITION BY source ORDER BY qi DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS nsrc FROM h),
         cut AS (SELECT source, min(qi) AS cut_qi FROM ch
           WHERE cum <= ${graft.operators.Curation.keepTargetSql("nsrc")}
           GROUP BY source)
         SELECT s.source, count(*) AS n_docs,
           CAST(${graft.operators.Curation.keepTargetSql("count(*)")} AS BIGINT) AS target,
           CAST(cut.cut_qi AS DOUBLE) / 10000.0 AS cut_score,
           CAST(sum(CASE WHEN s.qi >= coalesce(cut.cut_qi, 10001) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((2*10000*(sum(CASE WHEN s.qi >= coalesce(cut.cut_qi, 10001) THEN 1 ELSE 0 END))
               + count(*)) // (2*count(*)) AS BIGINT) / 10000.0 AS kept_frac
         FROM s LEFT JOIN cut ON s.source = cut.source
         GROUP BY s.source, cut.cut_qi
         ORDER BY s.source"""

  /** Generated DuckDB replay of dedup13's LSH sweep — the ENTIRE curve,
    * hashes included (the sweep's signatures are the engine-portable
    * md5 permutation mins precisely so this is possible): per-doc
    * signatures over the distinct 3-gram shingle strings, the loosest
    * config's superset candidate join, per-config membership as the
    * same boolean algebra over hash-agreement bits, exhaustive exact
    * Jaccard as ground truth, and the per-config aggregate with the
    * intRatio recall presentation. Configs and hash count are
    * interpolated from the operator's constants (the etl27 discipline).
    */
  private val Dedup13OracleSql: String = {
    import graft.operators.Dedup.{LshSweepConfigs, SweepHashes}
    def candExpr(b: Int, r: Int): String =
      (0 until b).map { band =>
        (0 until r).map { k =>
          val i = band * r + k + 1
          s"siga[$i] = sigb[$i]"
        }.mkString("(", " AND ", ")")
      }.mkString("(", " OR ", ")")
    val arms = LshSweepConfigs.map { case (b, r) =>
      s"""SELECT CAST($b AS INT) AS bands, CAST($r AS INT) AS rows_per_band,
           CAST(sum(CASE WHEN ${candExpr(b, r)} THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN ${candExpr(b, r)} AND ist THEN 1 ELSE 0 END) AS BIGINT) AS n_verified
         FROM flags13"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH w13 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh13 AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS s FROM w13),
         sl13 AS MATERIALIZED (SELECT doc_id, list(s) AS shl
                               FROM sh13 GROUP BY doc_id),
         sg13 AS MATERIALIZED (SELECT doc_id,
             list_transform(range(0, $SweepHashes), j ->
               list_min(list_transform(shl, s ->
                 ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || s), 1, 15))::BIGINT)))
               AS sig
           FROM sl13),
         bd13 AS MATERIALIZED (SELECT doc_id, CAST(t.j AS INT) AS perm,
             sig[CAST(t.j + 1 AS INT)] AS h
           FROM sg13, unnest(range(0, $SweepHashes)) AS t(j)),
         sup13 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bd13 a JOIN bd13 b
             ON a.perm = b.perm AND a.h = b.h AND a.doc_id < b.doc_id),
         sizes13 AS (SELECT doc_id, count(*) AS c FROM sh13 GROUP BY doc_id),
         inter13 AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
           FROM sh13 a JOIN sh13 b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         truth13 AS MATERIALIZED (SELECT da, db FROM inter13
           JOIN sizes13 ca ON inter13.da = ca.doc_id
           JOIN sizes13 cb ON inter13.db = cb.doc_id
           WHERE CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) >= 0.8),
         ntrue13 AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth13),
         flags13 AS MATERIALIZED (SELECT p.da, p.db,
             ga.sig AS siga, gb.sig AS sigb,
             (t.da IS NOT NULL) AS ist
           FROM sup13 p
           JOIN sg13 ga ON ga.doc_id = p.da
           JOIN sg13 gb ON gb.doc_id = p.db
           LEFT JOIN truth13 t ON t.da = p.da AND t.db = p.db)
         SELECT bands, rows_per_band, n_candidates, n_verified, n_true,
           CAST((2*10000*(n_verified) + (greatest(n_true, 1)))
                // (2*(greatest(n_true, 1))) AS BIGINT) / 10000.0 AS recall
         FROM ($arms), ntrue13
         ORDER BY rows_per_band"""
  }

  /** Generated DuckDB replay of dedup14's cross-modal page dedup: the
    * text leg is the dedup02 exhaustive shingle-Jaccard grammar
    * restricted to image-bearing pages, the image leg is mm06's
    * barcode bit law (hash == id % 2^BarcodeBits through the REAL
    * encode → land → scan → decode chain on the Spark side), and the
    * composition is the same full-outer pair algebra. Both legs'
    * constants interpolate from the operators (the etl27 discipline).
    */
  private val Dedup14OracleSql: String = {
    import graft.operators.Multimodal.{Mm05Images, Mm06MaxHamming}
    val hashMod = 1 << graft.operators.MultimodalStub.BarcodeBits
    s"""WITH w14 AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < $Mm05Images),
         sh14 AS (SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
             i -> array_to_string(toks[i:i+2], ' '))) AS s FROM w14),
         sizes14 AS (SELECT doc_id, count(*) AS c FROM sh14 GROUP BY doc_id),
         pairs14 AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                   FROM sh14 a JOIN sh14 b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         tp14 AS (SELECT da, db,
           CAST((2*10000*(inter) + (uni)) // (2*(uni)) AS BIGINT) / 10000.0 AS jaccard FROM (
           SELECT da, db, inter, (ca.c + cb.c - inter) AS uni,
             CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) AS j
           FROM pairs14 JOIN sizes14 ca ON pairs14.da = ca.doc_id
           JOIN sizes14 cb ON pairs14.db = cb.doc_id)
           WHERE j >= 0.8),
         h14 AS (SELECT doc_id AS img_id, doc_id % $hashMod AS phash
             FROM documents WHERE doc_id < $Mm05Images),
         ip14 AS (SELECT a.img_id AS da, b.img_id AS db,
             CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
           FROM h14 a JOIN h14 b ON a.img_id < b.img_id
           WHERE bit_count(xor(a.phash, b.phash)) <= $Mm06MaxHamming)
       SELECT COALESCE(t.da, i.da) AS da, COALESCE(t.db, i.db) AS db,
         (t.da IS NOT NULL) AS dup_text,
         (i.da IS NOT NULL) AS dup_image,
         t.jaccard AS jaccard, i.hamming AS hamming,
         CASE WHEN t.da IS NOT NULL AND i.da IS NOT NULL THEN 'both'
              WHEN t.da IS NOT NULL THEN 'text_only'
              ELSE 'image_only' END AS verdict
       FROM tp14 t FULL JOIN ip14 i ON t.da = i.da AND t.db = i.db
       ORDER BY da, db"""
  }

  /** Generated DuckDB replay of text20's boilerplate scrub: dedup08's
    * chunk grammar on chunk STRINGS (the hash↔string bijection premise
    * dedup08's oracle rests on), the distinct-doc frequency threshold,
    * and the rewrite rebuilt from kept chunks + the sub-chunk tail —
    * value-equal to the engine's token-level HOF filter. Constants
    * interpolate from the operators (the etl27 discipline).
    */
  private val Text20OracleSql: String = {
    val k = graft.operators.Dedup.ParagraphTokens
    val minDocs = graft.operators.TextAnalysis.BoilerplateMinDocs
    s"""WITH w20 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         ch20 AS (SELECT doc_id, CAST(t.i AS INTEGER) AS idx,
             array_to_string(toks[CAST(t.i*$k+1 AS BIGINT):CAST(t.i*$k+$k AS BIGINT)], ' ') AS s
           FROM w20, unnest(range(0, len(toks)//$k)) AS t(i)),
         bo20 AS (SELECT s FROM ch20 GROUP BY s
           HAVING count(DISTINCT doc_id) >= $minDocs),
         chf20 AS (SELECT ch20.*, (s IN (SELECT s FROM bo20)) AS boil FROM ch20),
         mk20 AS (SELECT doc_id,
             CAST(sum(CASE WHEN boil THEN 1 ELSE 0 END) AS INTEGER) AS n_boiler,
             array_to_string(list(s ORDER BY idx) FILTER (WHERE NOT boil), ' ')
               AS kept_chunks
           FROM chf20 GROUP BY doc_id
           HAVING sum(CASE WHEN boil THEN 1 ELSE 0 END) > 0)
       SELECT w.doc_id,
         CAST(len(toks)//$k AS INTEGER) AS n_chunks,
         m.n_boiler,
         CAST(len(toks) AS INTEGER) AS tokens_before,
         CAST(len(toks) - m.n_boiler*$k AS INTEGER) AS tokens_after,
         concat_ws(' ', NULLIF(m.kept_chunks, ''),
           NULLIF(array_to_string(toks[CAST((len(toks)//$k)*$k+1 AS BIGINT):], ' '), ''))
           AS text_clean
       FROM w20 w JOIN mk20 m USING (doc_id)
       ORDER BY doc_id"""
  }

  /** Generated DuckDB replay of dedup04: per-doc SimHash (majority vote
    * per bit over the engine-portable md5-derived 60-bit token hash —
    * the same contract as `GraftFunctions.tokenHash64`), then ALL-PAIRS
    * hamming ≤ 3. The oracle deliberately skips the pigeonhole
    * candidate pruning Spark uses: comparing against the exhaustive
    * pair set proves the pruning loses nothing, value-for-value.
    */
  private val Dedup04OracleSql: String = {
    val bits = 60 // 15 hex chars of md5 → signed-BIGINT-safe in every engine
    val simhashTerms = (0 until bits).map { b =>
      s"""CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0
         THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END"""
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents),
       th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
           FROM toks),
       sh AS (SELECT doc_id, $simhashTerms AS sh FROM th GROUP BY doc_id)
       SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sh, b.sh)) <= 3
       ORDER BY da, db"""
  }

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01' AND l_discount >= 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q03_top_revenue" ->
      """SELECT o_orderkey, o_orderdate,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
         JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_nation_volume" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q06_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""",
    "q07_window_rank" ->
      """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 2
         ORDER BY o_custkey, rk, o_orderkey""",
    "q08_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q09_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q12_union_all" ->
      """SELECT * FROM (
           SELECT 'order' AS src, o_orderkey AS id,
                  round(o_totalprice, 2) AS amount
           FROM orders WHERE o_totalprice > 450000
           UNION ALL
           SELECT 'event' AS src, event_id AS id, round(value, 2) AS amount
           FROM events WHERE value > 190)
         ORDER BY src, id""",
    "q13_case_agg" ->
      """SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
         CAST(sum(CASE WHEN o_orderpriority LIKE '5%' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         round(avg(CASE WHEN o_orderpriority LIKE '1%' THEN o_totalprice END), 2) AS avg_urgent_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q14_date_parts" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_year, o_quarter ORDER BY o_year, o_quarter""",
    "q15_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
         substring(p_type, 1, 5) AS type5, length(p_name) AS name_len,
         regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
         concat_ws('|', p_brand, p_type) AS brand_type
         FROM part ORDER BY p_partkey""",
    "q16_null_safe" ->
      """SELECT event_id,
         TRY_CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k,
         coalesce(nullif(value, 0.0), -1.0) AS safe_value
         FROM events ORDER BY event_id""",
    "q17_avg_join" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN (
           SELECT l_partkey, avg(l_quantity) AS avg_qty
           FROM lineitem GROUP BY l_partkey) p
         ON l.l_partkey = p.l_partkey
         WHERE l.l_quantity < p.avg_qty * 0.5""",
    "q18_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_custkey HAVING count(*) >= 12
         ORDER BY o_custkey""",
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q20_pivot_events" ->
      """SELECT date_trunc('day', ts) AS day,
         count(*) FILTER (WHERE event_type = 'click') AS click,
         count(*) FILTER (WHERE event_type = 'error') AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         count(*) FILTER (WHERE event_type = 'signup') AS signup,
         count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY day ORDER BY day""",
    "q21_percentiles" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
         round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
         round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
         round(quantile_cont(o_totalprice, 0.95), 2) AS p95
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q22_set_ops" ->
      """SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
         INTERSECT
         SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
         EXCEPT
         SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
         ORDER BY o_custkey""",
    "q23_json_extract" ->
      """SELECT event_type, count(*) AS n,
         round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q24_asof_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND c.event_id < p.event_id
         ORDER BY purchase_id""",
    "q25_range_join" ->
      """SELECT lo, count(*) AS n, round(avg(value), 4) AS avg_value
         FROM events JOIN (SELECT unnest(range(0, 200, 10)) AS lo) b
           ON value >= lo AND value < lo + 10
         GROUP BY lo ORDER BY lo""",
    "q26_topk_custom" ->
      """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 2
         ORDER BY o_custkey, rk""",
    "q27_cumulative" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
         CAST(row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
         FROM orders WHERE o_custkey < 100
         ORDER BY o_custkey, order_seq""",
    "q36_range_frame" ->
      // The identical value-defined frame: days since a fixed epoch as
      // the RANGE ordering key, 90 preceding inclusive; integer cents
      // keep the rolling sum exact in both engines.
      """WITH o AS (SELECT o_orderkey, o_custkey,
             datediff('day', DATE '1992-01-01', o_orderdate) AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_custkey < 100)
         SELECT o_orderkey, o_custkey,
           sum(cents) OVER w / 100.0 AS trailing_90d,
           count(*) OVER w AS n_in_window
         FROM o
         WINDOW w AS (PARTITION BY o_custkey ORDER BY d
           RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
    "q37_session_window" ->
      // Spark's native session_window merge law replayed as the
      // classic gaps-and-islands reduction: a session BREAKS only when
      // the gap STRICTLY exceeds 30 minutes — the engine's merge is
      // boundary-INCLUSIVE (an event at exactly prev + gap still
      // merges; measured in the spec's merge-law pin, and the same
      // convention as stream02's batch twin); session end = last
      // event + gap; per-session sums ride integer cents (q36's
      // protocol) so totals are exact in both engines.
      """WITH e AS (SELECT user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         b AS (SELECT user_id, ts, cents,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sid FROM b)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) / 100.0 AS total_value
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q28_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q29_lag_delta" ->
      """SELECT user_id, count(*) AS n_deltas,
         round(avg(delta), 4) AS avg_delta, round(max(delta), 2) AS max_delta
         FROM (SELECT user_id, value - lag(value) OVER (
                 PARTITION BY user_id ORDER BY event_id) AS delta
               FROM events)
         WHERE delta IS NOT NULL GROUP BY user_id ORDER BY user_id""",
    "q30_approx_stats" ->
      // Exact twins computed; the sketch columns are banded flags whose
      // oracle side is the literal claim 1 — a sketch drifting out of
      // band flips Spark's flag to 0 and fails the hash compare.
      // median() must interpolate (quantile_cont semantics) to match
      // Spark's percentile(…, 0.5); 4-dp rounding keeps the even-count
      // midpoint off the 2-dp half-way grid.
      """SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           round(median(o_totalprice), 4) AS exact_median,
           1 AS cust_in_band, 1 AS median_in_band
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q31_window_suite" ->
      """SELECT o_orderstatus, o_orderkey,
         CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         first_value(o_orderkey) OVER wf AS cheapest_order,
         last_value(o_orderkey) OVER wf AS priciest_order
         FROM orders WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey),
                wf AS (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderstatus, o_orderkey""",
    "q32_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price,
         CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
         CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_priority
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), ())
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""",
    "etl23_snapshot_diff" ->
      // Both snapshot states replayed as reductions over the same CDC
      // log (even sequences only = the first snapshot; full log = the
      // second), then the same full-outer classification.
      """WITH log AS (SELECT user_id AS key, event_id AS seq,
             CASE WHEN event_type = 'error' THEN 'D'
                  WHEN event_type = 'click' THEN 'U' ELSE 'I' END AS op,
             round(value, 2) AS value FROM events),
         s1 AS (SELECT key, value AS old_value FROM (
             SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
             FROM log WHERE seq % 2 = 0) WHERE rn = 1 AND op <> 'D'),
         s2 AS (SELECT key, value AS new_value FROM (
             SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
             FROM log) WHERE rn = 1 AND op <> 'D')
         SELECT coalesce(s1.key, s2.key) AS key,
           CASE WHEN s1.key IS NULL THEN 'added'
                WHEN s2.key IS NULL THEN 'removed'
                WHEN old_value <> new_value THEN 'changed'
                ELSE 'unchanged' END AS status,
           old_value, new_value
         FROM s1 FULL OUTER JOIN s2 ON s1.key = s2.key
         ORDER BY key""",
    "etl27_retention" -> Etl27OracleSql,
    "etl29_snapshot_scrub" -> Etl29OracleSql,
    "etl30_suppression_gate" -> Etl30OracleSql,
    "etl31_jdbc_erasure" -> Etl31OracleSql,
    "etl28_fuzzy_link" ->
      // Blocked fuzzy linkage over the distinct-name vocabulary; the
      // edit-distance bound (and its derived length band) comes from
      // the SAME Etl28MaxDist constant the Spark side compiles in, so
      // retuning the threshold can't silently hash-mismatch. DuckDB's
      // levenshtein and Spark's agree on classic unit-cost edit
      // distance (verified empirically incl. empty-string edges).
      s"""WITH names AS (
           SELECT p_name, string_split(p_name, ' ')[-1] AS blk,
             count(*) AS cnt
           FROM part GROUP BY 1, 2)
         SELECT a.blk AS blk, a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.cnt AS cnt_a, b.cnt AS cnt_b
         FROM names a JOIN names b
           ON a.blk = b.blk AND a.p_name < b.p_name
         WHERE abs(length(a.p_name) - length(b.p_name)) <= ${Etl.Etl28MaxDist}
           AND levenshtein(a.p_name, b.p_name) <= ${Etl.Etl28MaxDist}
         ORDER BY name_a, name_b""",
    "etl24_jdbc_roundtrip" ->
      // The JDBC write→read round-trip is lossless, so the oracle
      // aggregates the SOURCE table; a row lost or mangled through
      // Derby shifts a count or a 2-dp sum and fails the hash.
      """SELECT c_mktsegment, count(*) AS n_customers,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total_acctbal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "etl25_jdbc_merge" ->
      // Derby's MERGE replayed declaratively: staged updates win, the
      // untouched master remainder survives, both arms aggregated. The
      // +100 balance shift stays raw on both sides (identical IEEE-754
      // addition), rounded only at the 2-dp presentation sum.
      """WITH m0 AS (SELECT c_custkey, c_acctbal, c_mktsegment
             FROM customer WHERE c_custkey % 3 <> 0),
         u AS (SELECT c_custkey, c_acctbal + 100 AS c_acctbal, c_mktsegment
             FROM customer WHERE c_custkey % 2 = 0),
         merged AS (
           SELECT * FROM u
           UNION ALL
           SELECT * FROM m0
           WHERE c_custkey NOT IN (SELECT c_custkey FROM u))
         SELECT c_mktsegment, count(*) AS n_customers,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total_acctbal
         FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "etl26_backfill" ->
      // The whole pipeline (partitioned write → dynamic partition
      // overwrite of the earliest day → read-back → aggregate) checked
      // against direct arithmetic on the source: value*2 is exact in
      // IEEE doubles (power-of-two scale), sums rounded only at the
      // 2-dp presentation.
      """WITH ev AS (SELECT CAST(ts AS DATE) AS event_date, value FROM events),
         corrected AS (SELECT event_date,
             CASE WHEN event_date = (SELECT min(event_date) FROM ev)
                  THEN value * 2 ELSE value END AS value
           FROM ev)
         SELECT event_date, count(*) AS n, round(sum(value), 2) AS total_value
         FROM corrected GROUP BY 1 ORDER BY 1""",
    "q33_correlated_subquery" ->
      // Identical correlated SQL — both engines must decorrelate it to
      // the same join-shaped result.
      """SELECT c.c_custkey, c.c_name,
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders
         FROM customer c
         WHERE EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
         ORDER BY c.c_custkey""",
    "q34_recursive_cte" ->
      // The IDENTICAL recursive statement, parameterized only by table
      // name — both engines iterate the same anchor + recursive step.
      graft.operators.Relational.q34Sql("customer"),
    "q35_lateral_topn" ->
      // Identical lateral statement — both engines must decorrelate
      // the correlated LIMIT to the same per-nation top-3.
      graft.operators.Relational.q35Sql("nation", "customer"),
    "etl01_select_rename_cast" ->
      """SELECT event_id AS record_id, event_type AS activity_type,
         user_id AS user_ref, CAST(trunc(value) AS INTEGER) AS quantity_int,
         round(value, 2) AS quantity_raw
         FROM events ORDER BY record_id""",
    "etl02_datetime_normalize" ->
      """SELECT event_id,
         CAST(substring(strftime(ts, '%Y-%m-%d %H:%M:%S'), 1, 10) AS DATE) AS posting_date,
         substring(strftime(ts, '%Y-%m-%d %H:%M:%S'), 12, 8) AS posting_time,
         TRY_CAST(event_type AS TIMESTAMP) AS bad_parse,
         substring(event_type, 1, greatest(length(event_type) - 3, 0)) AS type_code
         FROM events ORDER BY event_id""",
    "etl03_master_upsert" ->
      """WITH existing AS (
           SELECT event_type, dense_rank() OVER (ORDER BY event_type) AS master_id
           FROM (SELECT DISTINCT event_type FROM events WHERE event_id < 5)),
         mx AS (SELECT coalesce(max(master_id), 0) AS max_id FROM existing),
         fresh AS (
           SELECT event_type, dense_rank() OVER (ORDER BY event_type) AS rk
           FROM (SELECT DISTINCT event_type FROM events
                 WHERE event_type NOT IN (SELECT event_type FROM existing)))
         SELECT master_id, event_type, is_new FROM (
           SELECT master_id, event_type, false AS is_new FROM existing
           UNION ALL
           SELECT mx.max_id + rk, event_type, true FROM fresh, mx)
         ORDER BY master_id""",
    "etl04_dim_enrich" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, c_name, n_name, r_name
         FROM lineitem
         LEFT JOIN orders ON l_orderkey = o_orderkey
         LEFT JOIN customer ON o_custkey = c_custkey
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY l_orderkey, l_linenumber""",
    "etl05_incremental_merge" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
         round(value, 2) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "etl06_validity_split" ->
      """SELECT event_id,
         (value BETWEEN 0.0 AND 190.0) AND props LIKE '{%' AS is_valid,
         CASE WHEN NOT (value BETWEEN 0.0 AND 190.0) THEN 'value_out_of_range'
              WHEN props NOT LIKE '{%' THEN 'malformed_props'
              ELSE 'ok' END AS reject_reason
         FROM events ORDER BY event_id""",
    "etl07_multi_file_ingest" ->
      """SELECT 'events.parquet' AS source_file, count(*) AS n_rows,
         min(event_id) AS min_id, max(event_id) AS max_id FROM events""",
    "etl08_scd2" ->
      """WITH ch AS (
           SELECT user_id, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
           FROM events),
         v AS (
           SELECT user_id, event_id AS valid_from, event_type,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_from,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS version
           FROM ch WHERE prev_type IS NULL OR event_type <> prev_type)
         SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from, coalesce(next_from - 1, 9223372036854775807) AS valid_to
         FROM v ORDER BY user_id, version""",
    "etl09_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n,
         round(sum(round(value, 2)), 2) AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "etl10_partitioned_sink" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_year ORDER BY o_year""",
    "etl11_json_roundtrip" ->
      """SELECT event_type, count(*) AS n,
         count(DISTINCT user_id) AS n_users,
         round(sum(round(value, 2)), 2) AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "etl12_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
         round(sum(round(o_totalprice, 2)), 2) AS total
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "etl13_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "etl14_reconcile" ->
      """WITH ev AS (SELECT event_id, round(value, 2) AS value FROM events),
         o AS (SELECT event_id, value AS old_value FROM ev WHERE event_id % 7 <> 0),
         n AS (SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN round(value + 1.5, 2)
                  ELSE value END AS new_value
           FROM ev WHERE event_id % 5 <> 0),
         j AS (SELECT coalesce(o.event_id, n.event_id) AS event_id,
             old_value, new_value,
             CASE WHEN old_value IS NULL THEN 'added'
                  WHEN new_value IS NULL THEN 'removed'
                  WHEN old_value <> new_value THEN 'changed'
                  ELSE 'unchanged' END AS status
           FROM o FULL OUTER JOIN n ON o.event_id = n.event_id)
         SELECT status, count(*) AS n,
           round(sum(coalesce(new_value, old_value)), 2) AS total_value
         FROM j GROUP BY status ORDER BY status""",
    "etl15_expectations" ->
      """SELECT check_name, n_violations, n_checked, n_violations = 0 AS passed FROM (
           SELECT 'event_id_unique' AS check_name,
             count(*) - count(DISTINCT event_id) AS n_violations,
             count(*) AS n_checked FROM events
           UNION ALL
           SELECT 'ts_not_null',
             CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM events
           UNION ALL
           SELECT 'value_in_range',
             CAST(sum(CASE WHEN value NOT BETWEEN 0.0 AND 200.0 THEN 1 ELSE 0 END) AS BIGINT),
             count(*) FROM events
           UNION ALL
           SELECT 'orders_custkey_fk',
             (SELECT count(*) FROM orders o WHERE NOT EXISTS
                (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM orders))
         ORDER BY check_name""",
    "etl16_cdc_apply" ->
      """WITH log AS (SELECT user_id AS key, event_id AS seq,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'click' THEN 'U'
                ELSE 'I' END AS op,
           round(value, 2) AS value FROM events),
         latest AS (SELECT key, seq, op, value,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
           FROM log)
         SELECT key, seq AS last_seq, op AS last_op, value AS current_value
         FROM latest WHERE rn = 1 AND op <> 'D' ORDER BY key""",
    "etl17_schema_evolution" ->
      // Replays the v1/v2 split + merged-schema semantics directly on
      // the source: even rows predate the channel column (null ->
      // 'pre_evolution'), odd rows carry ch_<id%3>.
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'pre_evolution'
                     ELSE 'ch_' || CAST(event_id % 3 AS VARCHAR) END AS channel,
         count(*) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
         FROM events GROUP BY 1 ORDER BY channel""",
    "etl18_xml_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
         round(sum(round(s_acctbal, 2)), 2) AS total_bal
         FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
    "etl19_merge_sink" ->
      // Incremental batches + replay through the MergeSink catalog
      // table must be invisible: the final state equals the one-shot
      // reduction of the full op log (etl16's semantics).
      """WITH log AS (SELECT user_id AS key, event_id AS seq,
           CASE WHEN event_type = 'error' THEN 'D'
                WHEN event_type = 'click' THEN 'U'
                ELSE 'I' END AS op,
           round(value, 2) AS value FROM events),
         latest AS (SELECT key, seq, op, value,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
           FROM log)
         SELECT key, seq AS last_seq, op AS last_op, value AS current_value
         FROM latest WHERE rn = 1 AND op <> 'D' ORDER BY key""",
    "etl20_corrupt_quarantine" ->
      // Replays the deterministic corruption rule (event_id % 97 == 0
      // lines are unparseable) directly on the source: the quarantine
      // read must reject exactly those and aggregate only the rest.
      """SELECT CAST(event_id % 4 AS INTEGER) AS batch,
         CAST(sum(CASE WHEN event_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
         CAST(sum(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
         round(sum(CASE WHEN event_id % 97 <> 0 THEN round(value, 2) END), 2) AS valid_value
         FROM events GROUP BY 1 ORDER BY batch""",
    "etl21_compaction" ->
      // Straight off the source table: the compacted copy must
      // aggregate identically or the rewrite lost/duplicated rows.
      """SELECT event_type, count(*) AS n,
         count(DISTINCT user_id) AS n_users,
         round(sum(round(value, 2)), 2) AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "text01_tokenize_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(length(text) AS INTEGER) AS n_chars_text,
         CAST((2*10000*(length(replace(text, ' ', ''))) + (greatest(len(string_split(text, ' ')), 1))) // (2*(greatest(len(string_split(text, ' ')), 1))) AS BIGINT) / 10000.0 AS avg_token_len
         FROM documents ORDER BY doc_id""",
    "text02_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         c AS (SELECT doc_id,
           greatest(len(toks), 1) AS n,
           len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS stop,
           len(list_filter(toks, x -> length(x) <= 2)) AS short,
           len(toks) AS ntok FROM t)
         SELECT doc_id, CAST((2*10000*(stop) + (n)) // (2*(n)) AS BIGINT) / 10000.0 AS stop_ratio,
           CAST((2*10000*(short) + (n)) // (2*(n)) AS BIGINT) / 10000.0 AS short_ratio,
           CAST((2*10000*(least(ntok, 50) * (n - stop)) + (50 * n)) // (2*(50 * n)) AS BIGINT) / 10000.0 AS quality_score
         FROM c ORDER BY doc_id""",
    "text03_langid" ->
      // The stopword-profile scorer replayed in SQL: struct comparison
      // (score, then lang) is lexicographic in both engines, so the
      // argmax tie-break is identical.
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         s AS (SELECT doc_id, toks,
           [struct_pack(score := len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','zu','den','von','mit'))) / CAST(greatest(len(toks),1) AS DOUBLE), lang := 'de', hits := CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','zu','den','von','mit'))) AS INT)),
            struct_pack(score := len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) / CAST(greatest(len(toks),1) AS DOUBLE), lang := 'en', hits := CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS INT)),
            struct_pack(score := len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','es','se','no'))) / CAST(greatest(len(toks),1) AS DOUBLE), lang := 'es', hits := CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','es','se','no'))) AS INT)),
            struct_pack(score := len(list_filter(toks, x -> x IN ('le','la','de','et','un','est','que','pour','dans','ce'))) / CAST(greatest(len(toks),1) AS DOUBLE), lang := 'fr', hits := CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','un','est','que','pour','dans','ce'))) AS INT)),
            struct_pack(score := len(list_filter(toks, x -> x IN ('的','是','了','在','和','有','我','他','这','中'))) / CAST(greatest(len(toks),1) AS DOUBLE), lang := 'zh', hits := CAST(len(list_filter(toks, x -> x IN ('的','是','了','在','和','有','我','他','这','中'))) AS INT))
           ] AS scored FROM t),
         m AS (SELECT doc_id, toks, list_sort(scored)[-1] AS best FROM s)
         SELECT doc_id, best.lang AS pred_lang,
           CAST((2*10000*(best.hits) + (greatest(len(toks), 1))) // (2*(greatest(len(toks), 1))) AS BIGINT) / 10000.0 AS lang_score
         FROM m ORDER BY doc_id""",
    "text04_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "text05_word_freq" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "text06_pii_redact" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
         md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_md5
         FROM documents ORDER BY doc_id""",
    "text07_bigrams" ->
      """SELECT bigram, count(*) AS n FROM (
           SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
             i -> toks[i] || ' ' || toks[i+1])) AS bigram
           FROM (SELECT string_split(text, ' ') AS toks FROM documents))
         GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "text08_bpe_tokens" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+')) AS INTEGER) AS n_bpe_tokens,
         CAST(len(list_filter(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+'),
           x -> regexp_matches(x, '[A-Za-z]'))) AS INTEGER) AS n_word_tokens,
         CAST(len(list_filter(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+'),
           x -> regexp_matches(x, '^ ?[0-9]+$'))) AS INTEGER) AS n_num_tokens,
         CAST((2*10000*(length(text)) + (greatest(len(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+')), 1))) // (2*(greatest(len(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+')), 1))) AS BIGINT) / 10000.0 AS chars_per_token
         FROM documents ORDER BY doc_id""",
    "text09_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, text,
           greatest(length(text) - 8 + 1, 0) AS n_grams FROM documents),
         h AS (SELECT doc_id, n_grams,
           list_transform(range(1, n_grams + 1),
             i -> ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 8))::BIGINT) AS hs
           FROM t),
         w AS (SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(n_grams - 4 + 1, 0) + 1),
             j -> list_min(hs[CAST(j AS INT):CAST(j + 3 AS INT)]))) AS fps
           FROM h)
         SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint FROM w
         ORDER BY doc_id, fingerprint""",
    "text10_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS g FROM documents),
         wc AS (SELECT doc_id, g, count(*) AS n FROM w GROUP BY 1, 2),
         ws AS (SELECT doc_id,
             CAST((2*10000*(max(n)) + (sum(n))) // (2*(sum(n))) AS BIGINT) / 10000.0 AS top_word_frac,
             CAST((2*10000*(sum(n) - count(*)) + (sum(n))) // (2*(sum(n))) AS BIGINT) / 10000.0 AS dup_word_frac
           FROM wc GROUP BY 1),
         t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> array_to_string(toks[i:i+1], ' '))) AS g FROM t),
         bc AS (SELECT doc_id, g, count(*) AS n FROM b GROUP BY 1, 2),
         bs AS (SELECT doc_id,
             CAST((2*10000*(max(n)) + (sum(n))) // (2*(sum(n))) AS BIGINT) / 10000.0 AS top_bigram_frac,
             CAST((2*10000*(sum(n) - count(*)) + (sum(n))) // (2*(sum(n))) AS BIGINT) / 10000.0 AS dup_bigram_frac
           FROM bc GROUP BY 1)
         SELECT ws.doc_id, top_word_frac, dup_word_frac,
           coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
           coalesce(dup_bigram_frac, 0.0) AS dup_bigram_frac
         FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id ORDER BY ws.doc_id""",
    "text11_surprisal" ->
      // Per-token surprisal quantized to 1e-4 bits as an integer, so
      // the per-doc mean is exact integer math in both engines (a raw
      // double sum would be summation-order-dependent); the 4-dp
      // presentation is integer half-up division ((2M+N)//(2N)) — the
      // rational mean can land exactly ON the 4-dp half grid, where
      // engine round() diverges (measured at sf0.001).
      """WITH toks AS (SELECT doc_id, t FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
           WHERE t <> ''),
         freq AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
         tot AS (SELECT sum(cnt) AS total FROM freq),
         scored AS (SELECT doc_id,
             CAST(round(-log2(cnt / total) * 10000) AS BIGINT) AS micro
           FROM toks JOIN freq USING (t) CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_tokens,
           CAST((2*sum(micro) + count(*)) // (2*count(*)) AS BIGINT) / 10000.0
             AS avg_surprisal
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    "text12_entropy" ->
      // H = log2(n) - (sum c*log2 c)/n with each type's c*log2(c) AND
      // log2(n) quantized to 1e-4 integers, then 4-dp presentation via
      // integer half-up division (text11's half-grid-proof protocol;
      // power-of-two n makes the entropy an exact rational, and
      // ttr = types/n can sit exactly on the half grid, e.g. 1/32).
      """WITH toks AS (SELECT doc_id, t FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
           WHERE t <> ''),
         cnt AS (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY 1, 2),
         m AS (SELECT doc_id, c,
             CAST(round(c * log2(c) * 10000) AS BIGINT) AS micro FROM cnt),
         agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             count(*) AS n_types, CAST(sum(micro) AS BIGINT) AS m
           FROM m GROUP BY doc_id),
         lm AS (SELECT *, CAST(round(log2(n) * 10000) AS BIGINT) AS lmicro
                FROM agg)
         SELECT doc_id, n AS n_tokens, n_types,
           CAST((2*n*lmicro + n - 2*m) // (2*n) AS BIGINT) / 10000.0 AS entropy,
           CAST((2*10000*n_types + n) // (2*n) AS BIGINT) / 10000.0 AS ttr
         FROM lm ORDER BY doc_id""",
    "dedup01_exact" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint,
         min(doc_id) AS keeper_id, count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY keeper_id""",
    "dedup02_ngram_jaccard" -> ngramJaccardSql,
    "dedup03_minhash_lsh" -> ngramJaccardSql,
    "dedup13_lsh_sweep" -> Dedup13OracleSql,
    "dedup14_crossmodal" -> Dedup14OracleSql,
    "text20_boilerplate_scrub" -> Text20OracleSql,
    "dedup06_cluster" ->
      // Connected components over the same verified pair set: min
      // reachable doc_id via a recursive min-label propagation (UNION
      // dedups states, so the recursion terminates at the fixpoint).
      """WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
             i -> array_to_string(toks[i:i+2], ' '))) AS s FROM w),
         sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         good AS (SELECT da, db FROM (
           SELECT da, db, CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) AS j
           FROM pairs JOIN sizes ca ON pairs.da = ca.doc_id
           JOIN sizes cb ON pairs.db = cb.doc_id) WHERE j >= 0.8),
         edges AS (SELECT da AS src, db AS dst FROM good
                   UNION SELECT db, da FROM good),
         nodes AS (SELECT DISTINCT src AS id FROM edges),
         cc AS (
           SELECT id, id AS label FROM nodes
           UNION
           SELECT e.src AS id, least(cc.label, e.src) AS label
           FROM cc JOIN edges e ON cc.id = e.dst)
         SELECT id AS doc_id, min(label) AS cluster_id
         FROM cc GROUP BY id ORDER BY doc_id""",
    "dedup07_winnow_overlap" ->
      """WITH t AS (SELECT doc_id, text,
           greatest(length(text) - 8 + 1, 0) AS n_grams FROM documents),
         h AS (SELECT doc_id, n_grams,
           list_transform(range(1, n_grams + 1),
             i -> ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 8))::BIGINT) AS hs
           FROM t),
         w AS (SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(n_grams - 4 + 1, 0) + 1),
             j -> list_min(hs[CAST(j AS INT):CAST(j + 3 AS INT)]))) AS fps
           FROM h),
         fa AS (SELECT doc_id, unnest(fps) AS fp FROM w),
         df AS (SELECT fp, count(*) AS c FROM fa GROUP BY 1),
         f AS (SELECT fa.doc_id, fa.fp FROM fa JOIN df USING (fp)
               WHERE df.c <= 10),
         sz AS (SELECT doc_id, count(*) AS n FROM f GROUP BY 1),
         ov AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
                FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT da, db, shared,
           CAST((2*10000*(shared) + (least(na.n, nb.n))) // (2*(least(na.n, nb.n))) AS BIGINT) / 10000.0 AS containment
         FROM ov JOIN sz na ON da = na.doc_id JOIN sz nb ON db = nb.doc_id
         WHERE CAST((2*10000*(shared) + (least(na.n, nb.n))) // (2*(least(na.n, nb.n))) AS BIGINT) / 10000.0 >= 0.8
         ORDER BY da, db""",
    "dedup08_paragraph" ->
      // Groups on the span STRING where Spark groups on xxhash64(span):
      // identical df counts modulo 64-bit collisions (the output never
      // exposes the hash), same set-semantics argument as the shingle
      // family.
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         chunks AS (
           SELECT doc_id, array_to_string(t[(i*10+1):(i*10+10)], ' ') AS chunk
           FROM toks, UNNEST(range(CAST(floor(len(t)/10) AS BIGINT))) AS u(i)),
         df AS (SELECT chunk, count(DISTINCT doc_id) AS nd
                FROM chunks GROUP BY 1),
         per_doc AS (
           SELECT c.doc_id, count(*) AS n_chunks,
             CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks
           FROM chunks c JOIN df d USING (chunk) GROUP BY 1)
         SELECT doc_id, n_chunks, dup_chunks,
           CAST((2*10000*(dup_chunks) + (n_chunks)) // (2*(n_chunks)) AS BIGINT) / 10000.0 AS dup_frac
         FROM per_doc WHERE dup_chunks > 0 ORDER BY doc_id""",
    "dedup10_substring" -> Dedup10OracleSql,
    "cur16_substring_contamination" -> Cur16OracleSql,
    "cur17_contamination_scrub" -> Cur17OracleSql,
    "cur18_corpus_build" -> Cur18OracleSql,
    "cur19_leak_report" -> Cur19OracleSql,
    "cur20_sequence_sink" -> Cur20OracleSql,
    "cur23_payload_shards" -> Cur23OracleSql,
    "cur24_takedown" -> Cur24OracleSql,
    "cur25_tombstone_mask" -> Cur25OracleSql,
    "cur26_repack_execute" -> Cur26OracleSql,
    "cur27_mask_equivalence" -> Cur27OracleSql,
    "cur28_span_redaction" -> Cur28OracleSql,
    "cur29_composed_masks" -> Cur29OracleSql,
    "cur30_composed_repack" -> Cur30OracleSql,
    "cur31_mask_vacuum" -> Cur31OracleSql,
    "cur21_histogram_budget" -> Cur21OracleSql,
    "cur22_histogram_select" -> Cur22OracleSql,
    "dedup11_incremental" ->
      // The split, the fingerprint leg, and the exact pairwise near leg
      // replayed in full (no LSH — a Spark-side recall miss would
      // surface as a decision mismatch). The near keeper ranks on the
      // raw IEEE quotient (identical two-long division on both
      // engines); presentation via the intRatio half-grid protocol.
      """WITH arr AS (SELECT doc_id, text FROM documents WHERE doc_id % 16 = 3),
         corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 16 <> 3),
         ex AS (SELECT a.doc_id, min(c.doc_id) AS k
                FROM arr a JOIN corp c
                  ON md5(lower(regexp_replace(c.text, '\s+', ' ', 'g'))) =
                     md5(lower(regexp_replace(a.text, '\s+', ' ', 'g')))
                GROUP BY 1),
         w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
             i -> array_to_string(toks[i:i+2], ' '))) AS s FROM w),
         sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                   FROM sh a JOIN sh b ON a.s = b.s
                     AND a.doc_id % 16 = 3 AND b.doc_id % 16 <> 3
                   GROUP BY 1, 2),
         v AS (SELECT da, db, inter, (ca.c + cb.c - inter) AS uni,
                 CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) AS j
               FROM pairs JOIN sizes ca ON pairs.da = ca.doc_id
               JOIN sizes cb ON pairs.db = cb.doc_id),
         near AS (SELECT da AS doc_id, db AS k, inter, uni,
                    row_number() OVER (PARTITION BY da ORDER BY j DESC, db) AS rn
                  FROM v WHERE j >= 0.8),
         n1 AS (SELECT doc_id, k,
                  CAST((2*10000*(inter) + (uni)) // (2*(uni)) AS BIGINT) / 10000.0 AS nj
                FROM near WHERE rn = 1)
         SELECT a.doc_id,
           CASE WHEN ex.k IS NOT NULL THEN 'exact'
                WHEN n1.k IS NOT NULL THEN 'near' ELSE 'admit' END AS decision,
           coalesce(ex.k, n1.k, -1) AS keeper_id,
           CASE WHEN ex.k IS NOT NULL THEN CAST(1.0 AS DOUBLE)
                WHEN n1.k IS NOT NULL THEN nj
                ELSE CAST(0.0 AS DOUBLE) END AS jaccard
         FROM arr a LEFT JOIN ex ON ex.doc_id = a.doc_id
         LEFT JOIN n1 ON n1.doc_id = a.doc_id
         ORDER BY a.doc_id""",
    "dedup12_bloom_ingest" ->
      // The Bloom gate is a pure pre-filter with no false negatives and
      // every false positive killed by the exact verification join, so
      // the oracle replays the PLAIN fingerprint join — any gate recall
      // bug on the Spark side surfaces as a decision mismatch.
      """WITH arr AS (SELECT doc_id, text FROM documents WHERE doc_id % 16 = 3),
         corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 16 <> 3),
         ex AS (SELECT a.doc_id, min(c.doc_id) AS k
                FROM arr a JOIN corp c
                  ON md5(lower(regexp_replace(c.text, '\s+', ' ', 'g'))) =
                     md5(lower(regexp_replace(a.text, '\s+', ' ', 'g')))
                GROUP BY 1)
         SELECT a.doc_id,
           CASE WHEN ex.k IS NOT NULL THEN 'dup' ELSE 'admit' END AS decision,
           coalesce(ex.k, -1) AS keeper_id
         FROM arr a LEFT JOIN ex ON ex.doc_id = a.doc_id
         ORDER BY a.doc_id""",
    "dedup05_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS ida, b.vec_id AS idb,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.45
         ORDER BY ida, idb""",
    "dedup09_semdedup" ->
      // dedup05's exact pair set, then the same recursive min-label
      // propagation as dedup06's oracle; keeper = the component's min id.
      """WITH RECURSIVE
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         good AS (SELECT a.vec_id AS da, b.vec_id AS db
                  FROM e a JOIN e b ON a.vec_id < b.vec_id
                  WHERE list_cosine_similarity(a.v, b.v) >= 0.45),
         edges AS (SELECT da AS src, db AS dst FROM good
                   UNION SELECT db, da FROM good),
         nodes AS (SELECT DISTINCT src AS id FROM edges),
         cc AS (
           SELECT id, id AS label FROM nodes
           UNION
           SELECT e2.src AS id, least(cc.label, e2.src) AS label
           FROM cc JOIN edges e2 ON cc.id = e2.dst)
         SELECT id AS vec_id, min(label) AS cluster_id,
           CAST(CASE WHEN min(label) = id THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
         FROM cc GROUP BY id ORDER BY vec_id""",
    "sim01_bruteforce_topk" -> Sim01OracleSql,
    "sim11_mmr_diversify" -> Sim11OracleSql,
    "sim12_filtered_ann" ->
      // sim01's exact protocol restricted to the query's own metadata
      // category (cat = vec_id % 4) — the filter applies BEFORE
      // ranking on both engines, so under-filled k from post-filtering
      // would break equality.
      """WITH e AS (SELECT vec_id, vec_id % 4 AS cat,
             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, cat AS q_cat, v AS qv
               FROM e WHERE vec_id < 5),
         s AS (SELECT q_id, vec_id, round(list_cosine_similarity(qv, v), 4) AS cos
               FROM q JOIN e ON e.cat = q.q_cat AND e.vec_id <> q.q_id),
         r AS (SELECT q_id, vec_id, cos, row_number() OVER (
                 PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM r
         WHERE rk <= 10 ORDER BY q_id, rk""",
    "sim13_hybrid_rrf" ->
      // Both legs replayed (lexical postings join + sim01's cosine
      // protocol), fused per (q_id, id) with absent legs contributing
      // 0. The 1.0 is CAST to DOUBLE so DuckDB's decimal-literal
      // division doesn't diverge from Spark's IEEE double division;
      // ranking uses the 6-dp-rounded score, matching the Spark side.
      """WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
         qt AS (SELECT doc_id AS q_id, tok FROM tok WHERE doc_id < 5),
         ov AS (SELECT qt.q_id, t.doc_id AS id, count(*) AS overlap
                FROM qt JOIN tok t ON t.tok = qt.tok AND t.doc_id <> qt.q_id
                GROUP BY qt.q_id, t.doc_id),
         lex AS (SELECT q_id, id, row_number() OVER (
                   PARTITION BY q_id ORDER BY overlap DESC, id) AS rk_lex
                 FROM ov QUALIFY rk_lex <= 10),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         s AS (SELECT q_id, vec_id AS id,
                 round(list_cosine_similarity(qv, v), 4) AS cos
               FROM q JOIN e ON e.vec_id <> q.q_id),
         vec AS (SELECT q_id, id, row_number() OVER (
                   PARTITION BY q_id ORDER BY cos DESC, id) AS rk_vec
                 FROM s QUALIFY rk_vec <= 10),
         f AS (SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
                 coalesce(lex.id, vec.id) AS id,
                 round(coalesce(CAST(1 AS DOUBLE) / (60 + rk_lex), 0) +
                       coalesce(CAST(1 AS DOUBLE) / (60 + rk_vec), 0), 6) AS rrf
               FROM lex FULL JOIN vec ON lex.q_id = vec.q_id AND lex.id = vec.id),
         r AS (SELECT q_id, id, rrf, row_number() OVER (
                 PARTITION BY q_id ORDER BY rrf DESC, id) AS rk FROM f)
         SELECT q_id, CAST(rk AS INTEGER) AS rk, id, rrf FROM r
         WHERE rk <= 10 ORDER BY q_id, rk""",
    "sim14_sq_ann" ->
      // Full SQ8 replay: per-dim min/max bounds, affine int8 encoding
      // (the (x-lo)/(hi-lo) division is raw IEEE of the same corpus
      // doubles — bit-identical across engines; *256 is a power-of-two
      // scale, floor/least integer-exact), INTEGER squared-delta
      // candidate ranking (no float protocol needed at all), top-160
      // refine, exact re-rank on the 4-dp L2 (sim08's refine shape).
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         b AS (SELECT d, min(v[CAST(d AS INT)]) AS lo, max(v[CAST(d AS INT)]) AS hi
               FROM e, UNNEST(range(1,65)) AS m(d) GROUP BY d),
         code AS (SELECT vec_id, d,
             CASE WHEN hi = lo THEN 0
                  ELSE least(255, CAST(floor(
                    (v[CAST(d AS INT)] - lo) / (hi - lo) * 256) AS BIGINT)) END AS c
           FROM e, b),
         qc AS (SELECT vec_id AS q_id, d, c FROM code WHERE vec_id < 5),
         approx AS (SELECT qc.q_id, cc.vec_id,
             CAST(sum((qc.c - cc.c) * (qc.c - cc.c)) AS BIGINT) AS ad
           FROM qc JOIN code cc USING (d) WHERE cc.vec_id <> qc.q_id
           GROUP BY qc.q_id, cc.vec_id),
         cand AS (SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id, row_number() OVER (
               PARTITION BY q_id ORDER BY ad, vec_id) AS rn
             FROM approx) WHERE rn <= 160),
         qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         exact AS (SELECT c.q_id, c.vec_id,
             round(sqrt(list_sum(list_transform(range(1,65),
               i -> (qs.qv[CAST(i AS INT)]-e.v[CAST(i AS INT)])
                  * (qs.qv[CAST(i AS INT)]-e.v[CAST(i AS INT)])))), 4) AS l2
           FROM cand c JOIN qs ON qs.q_id = c.q_id JOIN e ON e.vec_id = c.vec_id)
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, l2 FROM (
           SELECT q_id, vec_id, l2, row_number() OVER (
             PARTITION BY q_id ORDER BY l2, vec_id) AS rk
           FROM exact) WHERE rk <= 10
         ORDER BY q_id, rk""",
    "sim10_recall_eval" ->
      // The two index oracles composed: exact top-k LEFT JOIN approx
      // top-k per (q_id, vec_id); recall@k = matched fraction.
      s"""WITH ex AS ($Sim01OracleSql),
         ap AS ($Sim02OracleSql)
         SELECT ex.q_id, count(*) AS n_exact,
           CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
           round(CAST(count(ap.vec_id) AS DOUBLE) / count(*), 4) AS recall_at_k
         FROM ex LEFT JOIN ap
           ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
         GROUP BY ex.q_id ORDER BY ex.q_id""",
    // sim03/sim06 became fully oracle-able when cell assignment moved
    // to pure cosine argmax (no xxhash64): the IVF protocol — nearest-
    // centroid cells, 4 probe cells per query, exact rescoring of
    // probed candidates — replays verbatim in SQL. sim06 is spec-pinned
    // equal to sim03, so both share the oracle.
    "dedup04_simhash" -> Dedup04OracleSql,
    "sim02_lsh_ann" -> Sim02OracleSql,
    "sim03_ivf_ann" -> SimIvfOracleSql,
    "sim06_bucketed_ivf" -> SimIvfOracleSql,
    "sim07_knn_graph" ->
      // Single-probe IVF kNN graph replayed verbatim: same cell
      // assignment CTE as sim03/sim06's oracle, then a cell-local
      // self-join ranked per vector (the SHARED graph CTEs — one
      // definition with sim19's navigation oracle).
      s"""WITH $Sim07GraphCtes
         SELECT vec_id, CAST(rk AS INTEGER) AS rk, nb_id, cos FROM r7
         WHERE rk <= ${graft.operators.Similarity.KnnK}
         ORDER BY vec_id, rk""",
    "sim08_pq_ann" ->
      // Full PQ protocol replay INCLUDING codebook training (the same
      // k=16 k-means chain as sim03/06): per-subspace nearest codeword
      // (ties to the lowest codeword id), reconstruction, approx L2
      // quantized to 1e-6 with vec_id tiebreak, top-160 refine, exact
      // re-rank on the 4-dp distance (the same rounded key Spark ranks
      // on).
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         ${kmeansCteSql(16, graft.operators.Similarity.KmeansIters, cosine = true)},
         cb AS (SELECT cid, cv FROM kc${graft.operators.Similarity.KmeansIters}),
         sub AS (
           SELECT e.vec_id, m.m, cb.cid,
             list_sum(list_transform(range(1,9),
               i -> (e.v[CAST(m.m*8+i AS INT)] - cb.cv[CAST(m.m*8+i AS INT)])
                  * (e.v[CAST(m.m*8+i AS INT)] - cb.cv[CAST(m.m*8+i AS INT)]))) AS d2
           FROM e, UNNEST(range(8)) AS m(m), cb),
         code AS (SELECT vec_id, m, cid FROM (
             SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
             FROM sub) WHERE rn = 1),
         recon AS (SELECT c.vec_id,
             flatten(list(cb.cv[CAST(c.m*8+1 AS INT):CAST(c.m*8+8 AS INT)] ORDER BY c.m)) AS r
           FROM code c JOIN cb ON cb.cid = c.cid GROUP BY c.vec_id),
         qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         approx AS (SELECT q_id, r.vec_id,
             round(sqrt(list_sum(list_transform(range(1,65),
               i -> (qv[CAST(i AS INT)]-r.r[CAST(i AS INT)])
                  * (qv[CAST(i AS INT)]-r.r[CAST(i AS INT)])))), 6) AS ad
           FROM qs, recon r WHERE r.vec_id <> q_id),
         cand AS (SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY ad, vec_id) AS rn
             FROM approx) WHERE rn <= 160),
         exact AS (SELECT c.q_id, c.vec_id,
             round(sqrt(list_sum(list_transform(range(1,65),
               i -> (qs.qv[CAST(i AS INT)]-e.v[CAST(i AS INT)])
                  * (qs.qv[CAST(i AS INT)]-e.v[CAST(i AS INT)])))), 4) AS l2
           FROM cand c JOIN qs ON qs.q_id = c.q_id JOIN e ON e.vec_id = c.vec_id)
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, l2 FROM (
           SELECT q_id, vec_id, l2, row_number() OVER (
             PARTITION BY q_id ORDER BY l2, vec_id) AS rk
           FROM exact) WHERE rk <= 10
         ORDER BY q_id, rk""",
    "sim16_nprobe_sweep" -> Sim16OracleSql,
    "sim17_staleness_monitor" -> Sim17OracleSql,
    "sim18_retrain_swap" -> Sim18OracleSql,
    "sim19_graph_ann" -> Sim19OracleSql,
    "sim20_graph_sweep" -> Sim20OracleSql,
    "sim21_graph_insert" -> Sim21OracleSql,
    "sim22_graph_compact" -> Sim22OracleSql,
    "sim23_graph_delete" -> Sim23OracleSql,
    "sim24_tombstoned_consolidate" -> Sim24OracleSql,
    "sim25_layered_ann" -> Sim25OracleSql,
    "sim15_ivfpq" ->
      // IVF-PQ composite replay: ONE trained codebook (the sim03/06/08
      // k=16 chain) serves as coarse quantizer (cosine cell argmax +
      // 4-probe, verbatim from the sim03 oracle) AND sub-quantizer
      // (per-subspace nearest codeword + reconstruction, verbatim from
      // the sim08 oracle); the approx ranking is sim08's 1e-6-quantized
      // reconstructed L2 restricted to the probed cells' members, then
      // the same top-160 refine and 4-dp exact re-rank.
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         ${kmeansCteSql(16, graft.operators.Similarity.KmeansIters, cosine = true)},
         cb AS (SELECT cid, cv FROM kc${graft.operators.Similarity.KmeansIters}),
         assign AS (SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cid AS cell, row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS crk
             FROM e, cb c)
           WHERE crk = 1),
         qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         probes AS (SELECT q_id, cell FROM (
             SELECT q.q_id, c.cid AS cell, row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS crk
             FROM qs q, cb c)
           WHERE crk <= 4),
         sub AS (
           SELECT e.vec_id, m.m, cb.cid,
             list_sum(list_transform(range(1,9),
               i -> (e.v[CAST(m.m*8+i AS INT)] - cb.cv[CAST(m.m*8+i AS INT)])
                  * (e.v[CAST(m.m*8+i AS INT)] - cb.cv[CAST(m.m*8+i AS INT)]))) AS d2
           FROM e, UNNEST(range(8)) AS m(m), cb),
         code AS (SELECT vec_id, m, cid FROM (
             SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
             FROM sub) WHERE rn = 1),
         recon AS (SELECT c.vec_id,
             flatten(list(cb.cv[CAST(c.m*8+1 AS INT):CAST(c.m*8+8 AS INT)] ORDER BY c.m)) AS r
           FROM code c JOIN cb ON cb.cid = c.cid GROUP BY c.vec_id),
         approx AS (SELECT p.q_id, a.vec_id,
             round(sqrt(list_sum(list_transform(range(1,65),
               i -> (q.qv[CAST(i AS INT)]-r.r[CAST(i AS INT)])
                  * (q.qv[CAST(i AS INT)]-r.r[CAST(i AS INT)])))), 6) AS ad
           FROM probes p
           JOIN qs q ON q.q_id = p.q_id
           JOIN assign a ON a.cell = p.cell
           JOIN recon r ON r.vec_id = a.vec_id
           WHERE a.vec_id <> p.q_id),
         cand AS (SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY ad, vec_id) AS rn
             FROM approx) WHERE rn <= 160),
         exact AS (SELECT c.q_id, c.vec_id,
             round(sqrt(list_sum(list_transform(range(1,65),
               i -> (q.qv[CAST(i AS INT)]-e.v[CAST(i AS INT)])
                  * (q.qv[CAST(i AS INT)]-e.v[CAST(i AS INT)])))), 4) AS l2
           FROM cand c JOIN qs q ON q.q_id = c.q_id JOIN e ON e.vec_id = c.vec_id)
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, l2 FROM (
           SELECT q_id, vec_id, l2, row_number() OVER (
             PARTITION BY q_id ORDER BY l2, vec_id) AS rk
           FROM exact) WHERE rk <= 10
         ORDER BY q_id, rk""",
    "cur01_hash_sample" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
         ORDER BY doc_id""",
    "cur02_corpus_stats" ->
      """SELECT source, lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
         CAST((2*1000000*(sum(n_chars)) + ((SELECT sum(n_chars) FROM documents))) // (2*((SELECT sum(n_chars) FROM documents))) AS BIGINT) / 1000000.0 AS char_share
         FROM documents GROUP BY source, lang ORDER BY source, lang""",
    "cur03_contamination" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT DISTINCT doc_id, source,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
             i -> array_to_string(toks[i:i+2], ' '))) AS s FROM d),
         train AS (SELECT doc_id AS train_id, s FROM sh WHERE source <> 'src0'),
         bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE source = 'src0'),
         ts AS (SELECT train_id, count(*) AS n_shingles FROM train GROUP BY 1),
         ov AS (SELECT train_id, bench_id, count(*) AS overlap
                FROM train JOIN bench USING (s) GROUP BY 1, 2)
         SELECT train_id, max_contamination FROM (
           SELECT train_id,
             max(CAST((2*10000*(overlap) + (n_shingles)) // (2*(n_shingles)) AS BIGINT) / 10000.0) AS max_contamination
           FROM ov JOIN ts USING (train_id) GROUP BY 1)
         WHERE max_contamination >= 0.5 ORDER BY train_id""",
    "cur04_quality_filter" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
           string_split(text, ' ') AS toks FROM documents),
         f AS (SELECT source,
           (n_chars >= 100 AND len(toks) >= 20 AND
            CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
              / greatest(len(toks), 1) >= 0.02) AS keep
           FROM t)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((2*10000*(sum(CASE WHEN keep THEN 1 ELSE 0 END)) + (count(*))) // (2*(count(*))) AS BIGINT) / 10000.0 AS keep_rate
         FROM f GROUP BY source ORDER BY source""",
    "sim04_l2_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         s AS (SELECT q_id, vec_id, round(list_distance(qv, v), 4) AS dist
               FROM q, e WHERE vec_id <> q_id),
         r AS (SELECT q_id, vec_id, dist, row_number() OVER (
                 PARTITION BY q_id ORDER BY dist, vec_id) AS rk FROM s)
         SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, dist FROM r
         WHERE rk <= 10 ORDER BY q_id, rk""",
    "sim05_radius_search" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5)
         SELECT q_id, vec_id, round(list_cosine_similarity(qv, v), 4) AS cos
         FROM q, e WHERE vec_id <> q_id
           AND round(list_cosine_similarity(qv, v), 4) >= 0.35
         ORDER BY q_id, vec_id""",
    "cur05_mix_weights" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
           FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot, count(*) AS k FROM s)
         SELECT source, n_docs, n_chars_total,
           CAST((2*1000000*(n_docs) + (tot)) // (2*(tot)) AS BIGINT) / 1000000.0 AS actual_share,
           CAST((2*10000*(tot) + (k * n_docs)) // (2*(k * n_docs)) AS BIGINT) / 10000.0 AS weight
         FROM s, t ORDER BY source""",
    "cur06_curation_pipeline" ->
      // The full funnel replayed stage by stage: the SHARED funnel CTEs
      // (quality gate -> exact dedup keepers -> near-dup pair drop,
      // both endpoints must survive the previous stage — one definition
      // with cur18's oracle) -> contamination mask vs src0.
      s"""WITH $CurFunnelCtes,
         d2 AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         sh2 AS (SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS s FROM d2),
         train AS (SELECT doc_id AS train_id, s FROM sh2 WHERE source <> 'src0'),
         bench AS (SELECT doc_id AS bench_id, s FROM sh2 WHERE source = 'src0'),
         ts AS (SELECT train_id, count(*) AS n_shingles FROM train GROUP BY 1),
         ov AS (SELECT train_id, bench_id, count(*) AS overlap
                FROM train JOIN bench USING (s) GROUP BY 1, 2),
         contam AS (SELECT train_id AS doc_id FROM (
                      SELECT train_id,
                        max(round(CAST(overlap AS DOUBLE) / n_shingles, 4)) AS mc
                      FROM ov JOIN ts USING (train_id) GROUP BY 1)
                    WHERE mc >= 0.5),
         s4 AS (SELECT * FROM s3
                WHERE doc_id NOT IN (SELECT doc_id FROM contam))
         SELECT source,
           count(*) AS n_input,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s1) THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s2) THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s3) THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s4) THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
           CAST(coalesce(sum(CASE WHEN doc_id IN (SELECT doc_id FROM s4) THEN n_chars END), 0) AS BIGINT) AS chars_final
         FROM t GROUP BY source ORDER BY source""",
    "cur07_stratified_sample" ->
      // Threshold derived in pure integer math ((65536*tot) // (k*n),
      // clamped at 65536) — engine-portable at any magnitude, unlike
      // floor(double_rate * 65536); selection is a hex-string
      // comparison on the md5 prefix, monotone in the hash value.
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         r AS (SELECT source, n_docs,
                 CAST(sum(n_docs) OVER () AS BIGINT) AS tot,
                 count(*) OVER () AS k
               FROM c),
         t AS (SELECT source, tot, k, n_docs,
                 CAST(least(65536, (65536 * tot) // (k * n_docs)) AS BIGINT) AS thr_raw,
                 printf('%04x', CAST(least(65536, (65536 * tot) // (k * n_docs)) AS INT)) AS thr
               FROM r)
         SELECT d.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN thr_raw >= 65536
                 OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < thr
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CASE WHEN thr_raw >= 65536 THEN 1.0
                ELSE CAST((2*1000000*(tot) + (k * n_docs)) // (2*(k * n_docs)) AS BIGINT) / 1000000.0 END
             AS sample_rate, thr
         FROM documents d JOIN t ON d.source = t.source
         GROUP BY d.source, thr_raw, thr, tot, k, n_docs ORDER BY d.source""",
    "cur08_budget_assembly" ->
      // Greedy budget prefix replayed exactly: same md5-prefix ordering,
      // same window cumsum, integer char sums on both engines.
      """WITH d AS (SELECT doc_id, source, n_chars,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk FROM documents),
         c AS (SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
         SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept,
           CAST((2*10000*(sum(n_chars)) + (4000)) // (2*(4000)) AS BIGINT) / 10000.0 AS utilization
         FROM c WHERE cum <= 4000 GROUP BY source ORDER BY source""",
    "text14_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         c AS (SELECT doc_id, len(toks) AS n,
             CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sumlen,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS ah,
             CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
               / greatest(len(toks), 1) AS ml,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(toks), 1) AS af,
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS sh
           FROM t)
         SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
           CAST((2*10000*(sumlen) + (greatest(n, 1))) // (2*(greatest(n, 1))) AS BIGINT) / 10000.0 AS mean_word_len,
           CAST((2*10000*(ah) + (greatest(n, 1))) // (2*(greatest(n, 1))) AS BIGINT) / 10000.0 AS alpha_frac,
           CAST(sh AS INTEGER) AS stop_hits,
           CAST(CASE WHEN n BETWEEN 15 AND 5000 AND ml BETWEEN 3.0 AND 10.0
                AND af >= 0.8 AND sh >= 2 THEN 1 ELSE 0 END AS INTEGER) AS passes
         FROM c ORDER BY doc_id""",
    "text15_cms_topk" ->
      // Full CMS replay in exact integers: per-row salted md5 buckets
      // (the SimHash hash contract), instance counts per (row, bucket),
      // estimate = min over rows, audited against the exact top-20 with
      // the analytically-certain `never_under` bit in-band (the q30
      // sketch-oracle pattern).
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         tk AS (SELECT word FROM t WHERE word <> ''),
         inst AS (SELECT r.i,
             ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || word), 1, 15))::BIGINT
               % ${graft.operators.TextAnalysis.CmsWidth} AS bkt
           FROM tk, UNNEST(range(${graft.operators.TextAnalysis.CmsDepth})) AS r(i)),
         sketch AS (SELECT i, bkt, count(*) AS cnt FROM inst GROUP BY i, bkt),
         top AS (SELECT word, count(*) AS exact_cnt FROM tk GROUP BY word
                 ORDER BY exact_cnt DESC, word LIMIT 20),
         probes AS (SELECT top.word, top.exact_cnt, r.i,
             ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || top.word), 1, 15))::BIGINT
               % ${graft.operators.TextAnalysis.CmsWidth} AS bkt
           FROM top, UNNEST(range(${graft.operators.TextAnalysis.CmsDepth})) AS r(i)),
         est AS (SELECT word, exact_cnt, min(cnt) AS cms_est
           FROM probes JOIN sketch USING (i, bkt) GROUP BY word, exact_cnt)
         SELECT word, exact_cnt, cms_est, cms_est - exact_cnt AS overcount,
           cms_est >= exact_cnt AS never_under
         FROM est ORDER BY exact_cnt DESC, word""",
    "text16_pmi_collocations" ->
      // PMI replayed on token strings with the identical double
      // parenthesization (all counts to DOUBLE before the product —
      // Long products would wrap at corpus scale) and the 1e-4 integer
      // quantization ranking protocol of text11/13.
      s"""WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
         pr AS (SELECT
             unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i])) AS p,
             unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i+1])) AS t
           FROM d),
         w AS (SELECT t, count(*) AS c FROM
             (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
           WHERE t <> '' GROUP BY t),
         cb AS (SELECT p, t, count(*) AS cbg FROM pr GROUP BY 1, 2
                HAVING count(*) >= ${graft.operators.TextAnalysis.PmiMinSupport}),
         total AS (SELECT count(*) AS nn FROM pr),
         s AS (SELECT cb.p, cb.t, cb.cbg,
             CAST(round(log2(CAST(cb.cbg AS DOUBLE) * total.nn /
               (CAST(wp.c AS DOUBLE) * wt.c)) * 10000) AS BIGINT) AS micro
           FROM cb JOIN w wp ON wp.t = cb.p JOIN w wt ON wt.t = cb.t
           CROSS JOIN total)
         SELECT p || ' ' || t AS bigram, cbg AS n, micro / 10000.0 AS pmi
         FROM s ORDER BY pmi DESC, bigram LIMIT 20""",
    "text21_unigram_train" ->
      // All UnigramIters EM rounds replayed value-for-value: the same
      // seed cut, the same recursive-CTE Viterbi DP + backtrack per
      // round, the same quantized smoothed costs — a divergent
      // segmentation of any word in any round moves a count and
      // breaks the hash.
      Text21OracleSql,
    "text22_unigram_encode" ->
      // The trained unigram model APPLIED: the same generated training
      // chain, one more Viterbi pass under the shipped final counts,
      // per-doc word/piece/path-cost sums — a tie broken differently
      // anywhere moves a cost sum even when piece counts agree.
      Text22OracleSql,
    "text17_bpe_train" ->
      // The full BpeMerges-round Sennrich protocol replayed round-for-
      // round via the generated training chain (adjacent-pair counts
      // over the current segmentation, top pair on (cnt DESC, a, b),
      // non-overlapping replace re-segmentation) — a divergence in any
      // round's chosen pair cascades into every later round.
      s"""WITH ${bpeCteSql(graft.operators.TextAnalysis.BpeMerges)}
         SELECT CAST(rank AS INTEGER) AS rank, a AS lhs, b AS rhs,
           a || b AS merged, cnt
         FROM (${(1 to graft.operators.TextAnalysis.BpeMerges)
           .map(r => s"SELECT $r AS rank, a, b, cnt FROM m$r")
           .mkString("\n           UNION ALL ")})
         ORDER BY rank""",
    "text18_bpe_encode" ->
      // The trained tokenizer APPLIED: the same generated training
      // chain leaves the fully-merged vocab segmentation in s<N>; each
      // word's subword count is its '(' count (one per symbol), and
      // the corpus token stream joins that encoded vocab per document.
      // A divergence in ANY training round changes segment boundaries
      // corpus-wide and breaks the per-doc sums.
      s"""WITH ${bpeCteSql(graft.operators.TextAnalysis.BpeMerges)},
         enc AS (SELECT w,
             length(seg) - length(replace(seg, '(', '')) AS n_sub
           FROM s${graft.operators.TextAnalysis.BpeMerges}),
         t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
               FROM documents)
         SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
         FROM t JOIN enc USING (w)
         WHERE regexp_matches(t.w, '^[a-z]+$$')
         GROUP BY doc_id ORDER BY doc_id""",
    "text19_tfidf_keywords" ->
      // tf·idf with each TERM's idf quantized to a 1e-4 integer
      // (text11/12's protocol), so the score is an integer product and
      // the per-doc top-5 ranking can never flip on engine float
      // order; ties break on the term. Replayed as a rank window (the
      // engine side runs the bounded-heap TopKPerKey instead).
      """WITH tf AS (SELECT doc_id, t, count(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
           WHERE t <> '' GROUP BY doc_id, t),
         dfr AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         s AS (SELECT doc_id, t AS term, CAST(tf AS BIGINT) AS tf,
             CAST(df AS BIGINT) AS df,
             CAST(tf AS BIGINT) *
               CAST(round(log2(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) * 10000) AS BIGINT)
               AS score_micro
           FROM tf JOIN dfr USING (t), nd),
         r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score_micro DESC, term) AS rk FROM s)
         SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df,
           score_micro / 10000.0 AS tfidf
         FROM r WHERE rk <= 5 ORDER BY doc_id, rk""",
    "text13_bigram_surprisal" ->
      // The bigram model replayed on token STRINGS (Spark joins on the
      // 64-bit pair hashes — identical counts absent a 2^-64 collision,
      // the dedup08/cur03 argument); the surprisal sum is exact integer
      // math on both engines after the 1e-4-bit quantization.
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         pr AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i])) AS p,
             unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i+1])) AS t
           FROM d),
         cb AS (SELECT p, t, count(*) AS cbg FROM pr GROUP BY 1, 2),
         cp AS (SELECT p, count(*) AS cnp FROM pr GROUP BY 1),
         s AS (SELECT doc_id,
             CAST(round(-log2(CAST(cbg AS DOUBLE) / cnp) * 10000) AS BIGINT) AS micro
           FROM pr JOIN cb USING (p, t) JOIN cp USING (p))
         SELECT doc_id, count(*) AS n_bigrams,
           CAST((2*sum(micro) + count(*)) // (2*count(*)) AS BIGINT) / 10000.0
             AS avg_bigram_surprisal
         FROM s GROUP BY doc_id ORDER BY doc_id""",
    "cur09_sequence_pack" ->
      // Concat-and-chunk packing replayed exactly: same md5 ordering and
      // window cumsum as cur08, integer sequence arithmetic on both
      // engines (DuckDB // == Spark floor(a/b) for non-negative longs).
      """WITH d AS (SELECT doc_id, source, n_chars,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk FROM documents),
         c AS (SELECT source, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end FROM d)
         SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST((max(cum_end) + 2047) // 2048 AS BIGINT) AS n_sequences,
           CAST(sum(CASE WHEN (cum_end - 1) // 2048 > (cum_end - n_chars) // 2048
               THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
           CAST((2*10000*(count(*)) + ((max(cum_end) + 2047) // 2048)) // (2*((max(cum_end) + 2047) // 2048)) AS BIGINT) / 10000.0 AS docs_per_seq
         FROM c GROUP BY source ORDER BY source""",
    "cur10_quality_select" ->
      // text02's quality score (same stopword list, rounded to 4 dp
      // BEFORE ranking) -> per-source rank with doc_id tiebreak -> keep
      // rank <= ceil(3n/10) in `//` integer arithmetic (the shared
      // keepTargetSql interpolation — no FP threshold on either side).
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         c AS (SELECT doc_id, source,
             greatest(len(toks), 1) AS n,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS stop,
             len(toks) AS ntok FROM t),
         s AS (SELECT doc_id, source,
             CAST((2*10000*(least(ntok, 50) * (n - stop)) + (50 * n)) // (2*(50 * n)) AS BIGINT) / 10000.0 AS q
           FROM c),
         r AS (SELECT source, q,
             row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS nsrc FROM s),
         k AS (SELECT source, q,
             rk <= ${graft.operators.Curation.keepTargetSql("nsrc")} AS keep FROM r)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(min(CASE WHEN keep THEN q END), 4) AS min_kept_score,
           CAST((2*sum(CASE WHEN keep THEN CAST(round(q * 10000) AS BIGINT) END)
                 + sum(CASE WHEN keep THEN 1 ELSE 0 END))
              // (2*sum(CASE WHEN keep THEN 1 ELSE 0 END)) AS BIGINT) / 10000.0
             AS avg_kept_score
         FROM k GROUP BY source ORDER BY source""",
    "cur11_train_split" ->
      // The same monotone hex-range assignment, replayed verbatim.
      """WITH d AS (SELECT source, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT source, split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
         FROM d GROUP BY source, split ORDER BY source, split""",
    "cur12_cluster_sample" ->
      // cur07's rate/threshold protocol with the strata coming from the
      // TRAINED k-means cells — the training chain replays in SQL, then
      // the same hex-prefix selection as cur07.
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         ${kmeansCteSql(16, graft.operators.Similarity.KmeansIters, cosine = true)},
         cbk AS (SELECT cid, cv FROM kc${graft.operators.Similarity.KmeansIters}),
         assign AS (SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cid AS cell, row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS crk
             FROM e, cbk c) WHERE crk = 1),
         cc AS (SELECT cell, count(*) AS n_vecs FROM assign GROUP BY cell),
         r AS (SELECT cell, n_vecs,
                 CAST(sum(n_vecs) OVER () AS BIGINT) AS tot,
                 count(*) OVER () AS k
               FROM cc),
         t AS (SELECT cell, tot, k, n_vecs,
                 CAST(least(65536, (65536 * tot) // (k * n_vecs)) AS BIGINT) AS thr_raw,
                 printf('%04x', CAST(least(65536, (65536 * tot) // (k * n_vecs)) AS INT)) AS thr
               FROM r)
         SELECT a.cell, count(*) AS n_vecs,
           CAST(sum(CASE WHEN thr_raw >= 65536
                 OR substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < thr
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CASE WHEN thr_raw >= 65536 THEN 1.0
                ELSE CAST((2*1000000*(tot) + (k * t.n_vecs)) // (2*(k * t.n_vecs)) AS BIGINT) / 1000000.0 END
             AS sample_rate, thr
         FROM assign a JOIN t ON a.cell = t.cell
         GROUP BY a.cell, thr_raw, thr, tot, k, t.n_vecs ORDER BY a.cell""",
    "cur14_epoch_schedule" ->
      // Greedy water-filling replay: per-source token masses (text01's
      // split convention), #sources×8 candidate grid valued by integer
      // halving, ranked cumsum admits the prefix within 2× the corpus.
      s"""WITH s AS (SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
           FROM documents GROUP BY source),
         b AS (SELECT source, src_tokens,
             ${graft.operators.Curation.EpochBudgetMult} * sum(src_tokens) OVER () AS budget
           FROM s),
         cand AS (SELECT source, src_tokens, budget, epoch,
             src_tokens >> (epoch - 1) AS utility
           FROM b, (SELECT unnest(range(1, ${graft.operators.Curation.MaxEpochs + 1})) AS epoch) e
           WHERE src_tokens >> (epoch - 1) > 0),
         sel AS (SELECT *, sum(src_tokens) OVER (
               ORDER BY utility DESC, source, epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM cand),
         k AS (SELECT * FROM sel WHERE cum <= budget)
         SELECT s.source, s.src_tokens,
           CAST(count(k.epoch) AS BIGINT) AS epochs,
           CAST(coalesce(sum(k.src_tokens), 0) AS BIGINT) AS tokens_used
         FROM s LEFT JOIN k USING (source)
         GROUP BY s.source, s.src_tokens ORDER BY s.source""",
    "cur13_importance" ->
      // DSIR importance weights replayed verbatim on HUGEINT: same
      // md5-derived 60-bit token hash as the SimHash family, 256-bucket
      // add-one-smoothed target/raw frequency ratios in fixed point
      // (integer // throughout — no float protocol), per-doc sum of
      // BIGINTs, per-source top-20% cut on (avg_scaled DESC, doc_id).
      s"""WITH th AS (SELECT doc_id, source,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % ${Curation.ImportanceBuckets} AS bkt
           FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
                 FROM documents)),
         stats AS (SELECT bkt,
             sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cr
           FROM th GROUP BY bkt),
         tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM stats),
         wts AS (SELECT bkt,
             CAST((${Curation.ImportanceScale}::HUGEINT * (ct + 1) * (tr + ${Curation.ImportanceBuckets}))
                // ((cr + 1) * (tt + ${Curation.ImportanceBuckets})) AS BIGINT) AS ws
           FROM stats, tot),
         doc AS (SELECT th.doc_id, th.source, count(*) AS n_toks,
             CAST(sum(ws) AS BIGINT) AS s
           FROM th JOIN wts USING (bkt) WHERE th.source <> 'src0'
           GROUP BY th.doc_id, th.source),
         ranked AS (SELECT doc_id, source, n_toks,
             CAST(s // n_toks AS BIGINT) AS avg_scaled,
             row_number() OVER (PARTITION BY source
               ORDER BY CAST(s // n_toks AS BIGINT) DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n_src
           FROM doc)
         SELECT doc_id, source, n_toks,
           avg_scaled / ${Curation.ImportanceScale}.0 AS avg_ratio
         FROM ranked WHERE rk <= (n_src + 4) // 5
         ORDER BY doc_id""",
    "cur15_quality_classifier" ->
      // The full Cur15Iters-round batch-gradient-descent trajectory
      // replayed value-for-value (generated chain — margins, algebraic
      // fixed-point sigmoid, HUGEINT gradients, truncating-division
      // weight updates), then the raw pool scored with the FINAL
      // weights, cut at the exact integer pool-mean, reported per
      // source. A wrong gradient in any round cascades through every
      // later weight table and breaks the hash.
      Cur15OracleSql,
    "etl22_clustered_layout" ->
      // The clustered copy is lossless, so the oracle aggregates the
      // SOURCE table under the same predicate; file locality of the
      // layout is spec-asserted (an oracle can only see content).
      """SELECT CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
           count(*) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
         FROM orders
         WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
         GROUP BY 1 ORDER BY o_month""",
    "etl32_zorder_layout" ->
      // The Z-ordered copy is lossless, so the oracle aggregates the
      // SOURCE table under the same TWO-AXIS predicate; the two-axis
      // file locality and the Morton interleave arithmetic are
      // spec-asserted over the emitted files (an oracle can only see
      // content — etl22's split).
      """SELECT CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
           count(*) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
         FROM orders
         WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
           AND o_custkey BETWEEN 100 AND 800
         GROUP BY 1 ORDER BY o_month""",
    "sim09_kmeans" ->
      // The full KmeansIters-round Lloyd protocol replayed value-for-
      // value via the generated training chain (argmin assignment with
      // ties to the lowest cid, per-dim means QUANTIZED to 6 dp each
      // round), then the final assignment summary against the trained
      // centroids.
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         ${kmeansCteSql(8, graft.operators.Similarity.KmeansIters)},
         af AS (SELECT vec_id, cell, d FROM (
             SELECT e.vec_id, c.cid AS cell,
               round(list_distance(e.v, c.cv), 4) AS d,
               row_number() OVER (
                 PARTITION BY e.vec_id ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
             FROM e, kc${graft.operators.Similarity.KmeansIters} c) WHERE rk = 1)
         SELECT CAST(cell AS INT) AS cell, count(*) AS n_members,
           CAST((2*sum(CAST(round(d * 10000) AS BIGINT)) + count(*))
              // (2*count(*)) AS BIGINT) / 10000.0 AS mean_dist
         FROM af GROUP BY cell ORDER BY cell""",
    "mm01_binary_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
         CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height,
         3 AS channels FROM documents ORDER BY doc_id""",
    "mm02_frame_sample" ->
      """SELECT doc_id, unnest(range(0, (n_chars % 120) + 1, 10)) AS frame_ts
         FROM documents ORDER BY doc_id, frame_ts""",
    "mm03_feature_stub" ->
      // The deterministic fake featurizer (sum of byte/255 per dim =
      // byte_index % 8) is replayed in SQL by hex-decoding the UTF-8
      // bytes — so even the stubbed multimodal path is value-checked,
      // not just row-counted.
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
         bytes AS (SELECT doc_id, CAST(i AS INT) AS i,
             ('0x' || substr(h, CAST(2*i+1 AS INT), 2))::INT AS v
           FROM b, unnest(range(0, length(h)//2)) AS t(i)),
         f AS (SELECT doc_id, i % 8 AS dim, round(sum(v / 255.0), 4) AS fv
               FROM bytes GROUP BY 1, 2),
         n AS (SELECT doc_id, CAST(length(h)//2 AS INT) AS n_bytes FROM b)
         SELECT n.doc_id, n.n_bytes,
           coalesce(max(CASE WHEN dim = 0 THEN fv END), 0.0) AS f0,
           coalesce(max(CASE WHEN dim = 1 THEN fv END), 0.0) AS f1,
           coalesce(max(CASE WHEN dim = 2 THEN fv END), 0.0) AS f2,
           coalesce(max(CASE WHEN dim = 3 THEN fv END), 0.0) AS f3,
           coalesce(max(CASE WHEN dim = 4 THEN fv END), 0.0) AS f4,
           coalesce(max(CASE WHEN dim = 5 THEN fv END), 0.0) AS f5,
           coalesce(max(CASE WHEN dim = 6 THEN fv END), 0.0) AS f6,
           coalesce(max(CASE WHEN dim = 7 THEN fv END), 0.0) AS f7
         FROM n LEFT JOIN f ON n.doc_id = f.doc_id
         GROUP BY n.doc_id, n.n_bytes ORDER BY n.doc_id""",
    "mm09_feature_real" ->
      // The REAL featurizer (ImageIO decode -> per-channel stats) closed
      // over arithmetic: the staged test cards put channel value
      // c + offset + x + y (c = id%249, all < 256) at pixel (x,y), so
      // the 8 red values are c + s for s in the x+y multiset
      // {0,1,1,2,2,3,3,4} and every feature — channel means,
      // bright-pixel count, red histogram — is an exact integer
      // function of the id. Any corruption in encode -> land -> scan ->
      // decode -> featurize breaks equality.
      """WITH d AS (SELECT doc_id AS img_id, doc_id % 249 AS c
           FROM documents WHERE doc_id < 256),
         px AS (SELECT img_id, c, c + unnest([0,1,1,2,2,3,3,4]) AS r FROM d)
         SELECT img_id, 8 AS n_px,
           CAST(max(c) + 2 AS DOUBLE) AS f0,
           CAST(max(c) + 3 AS DOUBLE) AS f1,
           CAST(max(c) + 4 AS DOUBLE) AS f2,
           CAST(sum(CASE WHEN r >= 128 THEN 1 ELSE 0 END) AS DOUBLE) AS f3,
           CAST(sum(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS f4,
           CAST(sum(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS f5,
           CAST(sum(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS f6,
           CAST(sum(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END) AS DOUBLE) AS f7
         FROM px GROUP BY img_id ORDER BY img_id""",
    "mm04_resize_stub" ->
      // The fake resize kernel (nearest-neighbor sample a 16x9 grid of
      // byte positions, sum) replayed via the same hex-decode trick as
      // mm03; mean intensity is a pure function of the checksum so both
      // engines compute it identically.
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
         n AS (SELECT doc_id, CAST(length(h)//2 AS INT) AS n_bytes, h FROM b),
         s AS (SELECT doc_id, n_bytes,
             CAST(sum(('0x' || substr(h,
               CAST(2*((j*n_bytes)//144)+1 AS INT), 2))::INT) AS BIGINT)
               AS checksum
           FROM n, unnest(range(0, 144)) AS t(j)
           WHERE n_bytes > 0 GROUP BY 1, 2)
         SELECT doc_id, n_bytes, 16 AS out_w, 9 AS out_h, checksum,
           round(checksum / 255.0 / 144, 4) AS mean_intensity
         FROM s ORDER BY doc_id""",
    "mm06_phash_dedup" ->
      // The REAL decode loop closed over bit math: the staged barcode
      // PNGs make the decoded-then-binarized perceptual hash exactly
      // id % 256, so hamming-<=1 image pairs are the id pairs whose low
      // bytes differ in at most one bit. Any pixel error anywhere in
      // encode -> land -> scan -> decode -> threshold flips a bit and
      // breaks the pair set.
      """WITH h AS (SELECT doc_id AS img_id, doc_id % 256 AS phash
           FROM documents WHERE doc_id < 256)
         SELECT a.img_id AS img_a, b.img_id AS img_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         FROM h a JOIN h b ON a.img_id < b.img_id
         WHERE bit_count(xor(a.phash, b.phash)) <= 1
         ORDER BY img_a, img_b""",
    "mm07_phash_blocked" ->
      // mm06's loop at radius 4, against the EXHAUSTIVE pair set: the
      // oracle enumerates all image pairs and keeps hamming <= 4, so a
      // recall miss in the pigeonhole blocking (a qualifying pair whose
      // blocks never line up in any enumerated combination) breaks the
      // match, not just a decode/hash error.
      """WITH h AS (SELECT doc_id AS img_id, doc_id % 256 AS phash
           FROM documents WHERE doc_id < 256)
         SELECT a.img_id AS img_a, b.img_id AS img_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         FROM h a JOIN h b ON a.img_id < b.img_id
         WHERE bit_count(xor(a.phash, b.phash)) <= 4
         ORDER BY img_a, img_b""",
    "mm08_video_keyframes" -> Mm08OracleSql,
    "mm10_audio_ingest" -> Mm10OracleSql,
    "mm11_audio_windows" -> Mm11OracleSql,
    "mm12_audio_spectral" -> Mm12OracleSql,
    "mm05_binary_ingest" ->
      // The REAL pipeline (PNG encode -> binary files -> binaryFile
      // scan -> ImageIO decode on executors -> channel means) against
      // pure arithmetic: the test-card pattern keeps every channel
      // value < 256, so each decoded mean is exactly (id%249) + {2,3,4}
      // and the oracle needs only the documents table. Any corruption
      // anywhere in the encode/land/scan/decode chain breaks equality.
      """SELECT doc_id AS img_id, 4 AS width, 2 AS height,
           CAST((doc_id % 249) + 2 AS DOUBLE) AS mean_r,
           CAST((doc_id % 249) + 3 AS DOUBLE) AS mean_g,
           CAST((doc_id % 249) + 4 AS DOUBLE) AS mean_b
         FROM documents WHERE doc_id < 256 ORDER BY img_id""",
    "stream01_tumbling_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "stream02_sessionize" ->
      // floor(epoch(ts)) on the oracle side matches Spark's
      // unix_timestamp() truncation exactly (a bare BIGINT cast would
      // round-to-nearest and can flip a gap straddling the 1800 s
      // boundary on sub-second timestamps).
      """SELECT user_id, event_id, CAST(session_id AS BIGINT) AS session_id FROM (
           SELECT user_id, event_id,
             sum(CASE WHEN prev_s IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT) - prev_s > 1800
                 THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM (SELECT user_id, event_id, ts,
                   lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY event_id) AS prev_s
                 FROM events)) ORDER BY user_id, event_id""",
    "stream04_attribution" ->
      // The 1-hour-lookback interval join, replayed declaratively; the
      // purchase value passes through both engines unrounded (no
      // arithmetic touches it).
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id, p.value AS purchase_value
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         ORDER BY purchase_id, click_id""")

  /** dedup02 and dedup03 share one oracle: dedup03's LSH at t=0.8 has
    * recall ≈ 1-5e-8, so its verified output equals the exact pair set.
    */
  private val ngramJaccardSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
           i -> array_to_string(toks[i:i+2], ' '))) AS s FROM w),
       sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT da, db,
         CAST((2*10000*(inter) + (uni)) // (2*(uni)) AS BIGINT) / 10000.0 AS jaccard FROM (
         SELECT da, db, inter, (ca.c + cb.c - inter) AS uni,
           CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) AS j
         FROM pairs JOIN sizes ca ON pairs.da = ca.doc_id
         JOIN sizes cb ON pairs.db = cb.doc_id)
       WHERE j >= 0.8 ORDER BY da, db"""
}
