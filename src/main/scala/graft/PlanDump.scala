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
        "MMR: native greedy selection; collect_list reuses the top-k partitioning",
      "dedup10_substring" ->
        "substring spans: linear window stream, hash-keyed df, one window pass merges islands",
      "cur12_cluster_sample" ->
        "cluster-balanced sampling: zero-shuffle cell assignment, broadcast rate thresholds",
      "q34_recursive_cte" ->
        "recursive CTE: native iterated union loop, one join per hierarchy level",
      "q35_lateral_topn" ->
        "lateral correlated LIMIT decorrelated to a join + per-key ranking",
      "sim12_filtered_ann" ->
        "filtered vector search: the metadata predicate is a broadcast equi-join key",
      "sim13_hybrid_rrf" ->
        "hybrid RRF: postings equi-join lexical leg + cosine leg, tiny full-outer fuse",
      "mm05_binary_ingest" ->
        "binary-file ingestion: binaryFile scan + executor-side ImageIO decode",
      "dedup11_incremental" ->
        "incremental ingest dedup: arrival×corpus equi-joins only, no corpus² term",
      "etl26_backfill" ->
        "partition backfill: dynamic overwrite rewrites only the restated day",
      "sim14_sq_ann" ->
        "SQ8 ANN: literal-bounds int8 encode in scan stage, integer candidate ranking, bounded refine",
      "sim15_ivfpq" ->
        "IVF-PQ: probe-cell equi-join prunes the corpus, PQ codes score it, bounded exact refine",
      "cur13_importance" ->
        "DSIR importance weights: O(buckets) model broadcast back over the token stream",
      "text15_cms_topk" ->
        "CMS heavy hitters: one exploded scan, map-side partial sketch sums, broadcast audit join",
      "text16_pmi_collocations" ->
        "PMI collocations: token-keyed pair aggregate, support floor before frequency joins, 1-row total broadcast",
      "dedup12_bloom_ingest" ->
        "Bloom-gated ingest: might_contain in the batch scan stage fronts the equi verify join",
      "sim16_nprobe_sweep" ->
        "NProbe sweep: exact leg + assignment scan, curve aggregated from queries×k rows",
      "cur14_epoch_schedule" ->
        "epoch budget: one corpus scan to per-source masses, O(#sources) candidate grid windows",
      "mm06_phash_dedup" ->
        "image near-dup: binaryFile scan + executor decode, delta-neighborhood equi-join on fingerprints",
      "mm07_phash_blocked" ->
        "image near-dup radius 4: pigeonhole block-combination equi-join on fingerprints, exact hamming on candidates",
      "text17_bpe_train" ->
        "BPE training: one corpus scan to vocab-sized word counts, per-round vocab pair aggregate + O(1) top-pair collect",
      "etl27_retention" ->
        "snapshot VACUUM: expire-by-version-number file deletes only, retained snapshots never rewritten",
      "text18_bpe_encode" ->
        "BPE encode: merges applied to the vocab (chained replace, one pass), corpus stream joins the broadcast encoded vocab",
      "q36_range_frame" ->
        "RANGE frame: one window shuffle on the key, value-defined incremental frame, integer-cents rolling sum",
      "cur15_quality_classifier" ->
        "trained quality classifier: broadcast O(buckets) weight join, scalar-threshold keep cut, no global sort",
      "q37_session_window" ->
        "native session-window aggregation: one merge-on-overlap pass, no lag/cumsum window chain",
      "mm08_video_keyframes" ->
        "video keyframes: binaryFile scan + executor decode, ONE per-video lag window, no global frame sort",
      "text19_tfidf_keywords" ->
        "TF-IDF keywords: vocab-keyed df join + 1-row N broadcast, per-doc top-5 via bounded-heap TopKPerKey",
      "cur16_substring_contamination" ->
        "substring decontamination: stride-1 hash stream, held-out semi-join probe, one window pass merges islands",
      "sim17_staleness_monitor" ->
        "staleness monitor: one merged-corpus scan, level explode, bounded-heap per-(query,level) top-k, broadcast probe ranks",
      "mm09_feature_real" ->
        "real featurizer: binaryFile scan + executor decode, batched per-channel statistics kernel",
      "cur17_contamination_scrub" ->
        "contamination scrub: broadcast span marks, codegen HOF rewrite, one corpus scan",
      "etl28_fuzzy_link" ->
        "fuzzy linkage: ONE pinned fact aggregate to the name vocabulary, head-noun-blocked broadcast equi-join over the cached frame, p_name-only scan",
      "cur18_corpus_build" ->
        "end-to-end corpus build: shared pinned funnel frame, shared text20 boiler scrub, post-boiler window rebuild over AFFECTED docs only (raw window pin reused for the rest), broadcast span/threshold evidence, train-split-only packing window",
      "mm10_audio_ingest" ->
        "audio ingestion: binaryFile scan + executor-side javax.sound decode, per-clip integer feature kernel",
      "mm11_audio_windows" ->
        "windowed audio decode: bounded 256-sample windows streamed off the codec per clip (no whole-clip materialization), per-window integer profile",
      "sim18_retrain_swap" ->
        "codebook retrain+swap: store-read literal codebook, zero-join argmax assignment, one per-cell rollup shuffle",
      "sim19_graph_ann" ->
        "graph ANN: pinned edge frame, per-round broadcast beam/frontier joins, constant per-query candidate budget",
      "sim20_graph_sweep" ->
        "graph-ANN knob sweep: ALL (entries, beam) trajectories in ONE 4-round loop (config columns + one ranked beam window), rounds axis read from per-row entering round, exact leg joined broadcast",
      "sim21_graph_insert" ->
        "graph-ANN insert: ONE beam search for the whole append batch (the batch is the query set), pinned edge frame navigated, constant per-arrival candidate budget — the streamable maintenance path",
      "sim22_graph_compact" ->
        "graph compaction: candidate union of three already-built edge frames (build kNN + insert forward + back-edges — never a corpus pair scan), two vec_id-equi vector joins against the merged corpus, bounded-heap top-K restoring the build degree",
      "sim23_graph_delete" ->
        "tombstoned search: sim19's pinned visited pool (route-through — one search per session serves both operators), one codegen'd scan-stage tombstone predicate, same bounded window cut",
      "dedup13_lsh_sweep" ->
        "LSH tuning sweep: ONE superset banded equi-join, per-config membership as scan-stage boolean algebra, verification a broadcast probe of dedup03's pinned set; signature legs attach by MEASURED dispatch (broadcast under SweepSigBroadcastMaxDocs, shuffled da/db hash join above — plan-audited both arms)",
      "dedup14_crossmodal" ->
        "cross-modal dedup: full-outer algebra over two pinned evidence legs (dedup03 verified pairs broadcast-semi-joined to the image-page frame, mm06 pairs), no corpus shuffle",
      "text20_boilerplate_scrub" ->
        "boilerplate scrub: shared span-hash pin, 8-byte frequency aggregate, broadcast affected-doc marks, codegen HOF rewrite keyed on chunk index",
      "cur19_leak_report" ->
        "leak report: both sides read the ONE pinned cur16 window frame, cross-split join hash-keyed (8-byte windows), contamination-sized per-held aggregates broadcast back",
      "cur20_sequence_sink" ->
        "corpus emit: the dumped plan is the READ-BACK audit over the hive-partitioned (source, shard) manifest the operator just wrote — partition columns in the scan, tiny rollup; the manifest plan itself is cur18's audited funnel",
      "cur23_payload_shards" ->
        "payload shard emit: the dumped plan is the read-back reassembly audit over the emitted (source, shard) files — partition columns in the scan, one (source, seq) token shuffle for the slice reassembly; the payload frame itself joins manifest ⋈ text doc_id-equi with scrub/span evidence broadcast",
      "cur21_histogram_budget" ->
        "sort-free budget: ONE partial-aggregated (source, bucket) histogram, cut window over the dim-sized histogram (never the corpus), broadcast thresholds back over the scan",
      "cur24_takedown" ->
        "takedown audit: pinned train manifest + ONE survivor re-pack window per source (thin manifest frame — the corpus text never moves), doc_id-equi before/after join, per-source integer rollup",
      "cur25_tombstone_mask" ->
        "tombstone mask: recall-list-sized manifest rows exploded into covered sequences, pure integer span clipping — NO join, NO window, no corpus access (the cheapest takedown execution, which is its argument)",
      "cur26_repack_execute" ->
        "repack execute: the dumped plan is the read-back reassembly audit over the re-emitted post-takedown (source, shard) files — cur23's audit verbatim; the payload frame is the survivor re-pack window + one doc_id-equi join onto the unchanged token arrays",
      "cur22_histogram_select" ->
        "sort-free percentile select: the 4-dp score grid is the histogram bucket, descending-cumulative cut window above the aggregate, broadcast score cuts — cur10's corpus rank window gone",
      "cur27_mask_equivalence" ->
        "mask-vs-repack equivalence: both legs read EMITTED files through the one loader grammar; masks broadcast (recall-sized), re-tile offsets from ONE thin per-sequence window, final (source, seq) equi-join of two hash frames",
      "cur28_span_redaction" ->
        "span-level redaction: recall-sized manifest rows, sub-doc range through the one clipping core - NO join, NO window, no corpus access (cur25's economics at sub-document granularity)",
      "cur29_composed_masks" ->
        "composed loader read: BOTH mask families union into one broadcast skip list over ONE emit leg's reassembly; the re-tile stays one thin per-source sequence window — composing adds no plan term beyond cur27's leg A",
      "cur30_composed_repack" ->
        "composed repack execute (mask retirement): the dumped plan is the read-back reassembly audit over the re-emitted doubly-repacked files — cur23's audit verbatim; the payload frame re-derives both families map-side (takedown filter + in-array span slice on redact survivors — the mask rows never join in) over ONE survivor re-pack window + one doc_id-equi token join",
      "etl32_zorder_layout" ->
        "Z-order (multi-dim clustered) layout: the dumped plan is the two-axis-predicate aggregate over the z-clustered copy — both bounds pushed to the parquet scan; the write leg is a codegen'd Morton mask-ladder z_key (min/max-scaled dims) + repartitionByRange, built once per source fingerprint",
      "text21_unigram_train" ->
        "unigram-LM training: the rendered model frame is vocab-sized by contract (the sim09 codebook posture); each EM round's E-step is one codegen'd HOF projection over the word table (DP + backtrack as aggregate folds, costs a literal map — no join, no shuffle) and the M-step one vocab-sized aggregate",
      "text22_unigram_encode" ->
        "unigram encode: the shipped model applies to the VOCAB in one HOF projection (same DP definition as training), the corpus word stream joins the tiny encoded vocab BROADCAST, one per-doc rollup — text18's shape for the second tokenizer family",
      "sim25_layered_ann" ->
        "layered graph ANN: coarse routing over the sampled layer's own hash-mod edges (narrow beam), routed pool seeds the base loop as its round-0 pool (cross-layer score-once via the same anti-join), smaller base budget than the deployed config — one parameterized expansion loop for both layers",
      "mm12_audio_spectral" ->
        "windowed spectral audio: bounded 256-sample windows off the codec per clip, REAL one-sided DFT per window executor-side (O(n²/2) affordable exactly because of the window bound; FFT swaps in behind the signature), per-window spectral profile",
      // etl29/etl30/etl31 return EAGERLY materialized audits (their
      // returned plans are trivial LocalRelation scans by design);
      // their load-bearing join shapes — the per-version broadcast
      // anti-join scrub and the broadcast anti-join suppression gate —
      // are replayed and pinned by PlanAuditSpec instead.
      // cur31 likewise returns an eagerly materialized lifecycle audit
      // (the vacuum's work is artifact-store file operations, not a
      // query plan); its mask-frame derivations are cur25/cur28's,
      // whose plans are dumped above.
      "sim24_tombstoned_consolidate" ->
        "tombstoned consolidate: sim22's evidence frames + ONE edge-to-edge equi-join on the dead endpoint (the DiskANN re-link), live-node-fenced vector joins, bounded-heap degree cut — still never a pair space")

    // Measured 2026-08-12 (spark-shell probe) and 2026-08-13 (dedup04
    // blocking configs, trained-codebook recall) over the driver
    // testdata, recorded here so regeneration keeps the evidence:
    // candidate-pair counts and codebook recall across scale factors —
    // the empirical checks behind the LSH/pigeonhole/IVF scale claims.
    val candidateGrowth =
    """## Measured candidate-set growth (dedup family)
      |
      || sf | docs | total pair space | dedup02 shingle-join | dedup03 MinHash-LSH | dedup04 (4,1) narrow | dedup04 (8,5) wide | dedup13 rows=1 superset | vectors | dedup05 cell join |
      ||---|---|---|---|---|---|---|---|---|---|
      || 0.001 | 500 | 124,750 | 12,025 | 28 | 2,373 | 48 | 3,063 | 500 | 124,750 |
      || 0.01 | 500 | 124,750 | 11,533 | 25 | 2,061 | 54 | 2,965 | 500 | 124,750 |
      || 0.1 | 5,000 | 12,497,500 | 1,130,536 | 256 | 214,123 | 3,586 | 287,751 | 2,000 | 1,999,000 |
      |
      |Reading (10x docs, 0.001 -> 0.1): the raw pair space grows 100x.
      |dedup03's LSH candidates grow 28 -> 256 (~9x) — NEAR-LINEAR in the
      |corpus, which is the property that makes MinHash+LSH the 100 TB
      |path. dedup02's shingle join (the exact baseline kept for ground
      |truth) grows ~94x — quadratic, as expected; it exists to verify
      |dedup03, not to run at scale (and is now hard-fenced at
      |Dedup02MaxDocs). dedup04's pigeonhole candidates are
      |birthday-driven — narrow (4,1) blocking is ~n^2 * 4 / 2^16, a tiny
      |constant at these sizes but quadratic in shape. The fix is now a
      |PARAMETER, not a note: SimhashBlocking(blocks, keyBlocks) joins on
      |every keyBlocks-combination of the 64/blocks-bit pieces
      |(Manku-Jarvelin-Sarma), the recall guarantee hamming <=
      |blocks - keyBlocks moves with the config, and dedup04 picks the
      |config from the measured doc count (cutover at 20k docs since the
      |round-11 second-decade measurement below re-priced it).
      |Measured above: wide (8,5) cuts the sf0.1 candidate set 60x
      |(214,123 -> 3,586 — the residue is true near-dup structure plus
      |correlated token distributions, not birthday collisions: the
      |birthday term at 5k docs is n^2 * 56 / 2^40 < 2). At 100x docs the
      |narrow config would pay ~10^4x more accidental candidates; the
      |wide config's birthday term stays negligible until ~10^8 docs, and
      |the next widening (e.g. (16, 13), 560 keys x 52 bits) is the same
      |one-line config change. dedup05's cell join degrades to the
      |full pair space on this SYNTHETIC near-uniform corpus (no cell
      |pair is excludable — the adversarial worst case for metric
      |blocking, documented in Dedup.scala); on clustered real embeddings
      |the admissible cell-pair grid collapses and candidates track
      |within-cluster mass instead.
      |
      |dedup13 (LSH tuning sweep, round-14 column measured through the
      |operator's own sweepSuperset join): the sweep deliberately
      |materializes the LOOSEST config's (rows=1) candidate superset —
      |2,965 -> 287,751 at 10x docs, ~97x, birthday-quadratic BY
      |CONSTRUCTION (a rows=1 "band" is a single min-hash agreement, so
      |accidental collisions dominate exactly where the S-curve's loose
      |end must show cost). That is the measured price of asking for
      |the WHOLE curve, not a production path: production runs dedup03's
      |own config, the sweep's documented deployment is over a cur01
      |hash SAMPLE of the corpus, and since the round-14 rewrite the
      |superset feeds only the boolean flag projection plus a broadcast
      |membership probe of dedup03's pinned verified set — never a
      |pair-by-shingle join. Round 15 removed the last scale ceiling:
      |the corpus-sized signature legs no longer ride an unconditional
      |broadcast — the attach strategy is a measured dispatch
      |(broadcast under SweepSigBroadcastMaxDocs=200k docs / ~50 MB,
      |an explicit shuffled hash join co-partitioned on da/db above),
      |with both physical arms plan-audited.
      |
      |dedup08 (span dedup) has NO pair space at all — it is a pure
      |hash aggregate over span keys. Measured span-table growth
      |(sf 0.01 -> 0.1, 10x docs): 2,497 -> 24,816 total spans and
      |108 -> 1,112 cross-doc duplicated spans — both exactly linear in
      |the corpus, the defining property that makes span-granularity
      |dedup runnable where pairwise similarity is not. dedup10
      |(maximal substring spans) keeps the same no-pair-space shape at
      |stride 1: its window stream is one row per TOKEN (a constant
      |factor over dedup08's one per 10 tokens, still linear), the df
      |aggregate and flag-back shuffle the same 8-byte hashes, and the
      |island merge that turns flagged windows into maximal spans is a
      |single doc_id window pass — reporting exact span boundaries
      |costs one lag+cumsum over flagged rows, never a join. sim08 (PQ)
      |likewise adds no joins: the approx scoring stream is
      ||queries| x |corpus| rows pruned map-side by the partial top-k
      |to <= partitions x queries x 160 rows before its only shuffle.
      |
      |## Second measured decade (sf0.1 -> sf1-synth, 10x docs / 10x vectors, round 11)
      |
      |The tables above extrapolated the 100 TB claims from one decade
      |(sf0.01 -> sf0.1). Round 11 added a second: a deterministic
      |50k-doc / 20k-vector synthetic set mirroring the driver
      |testdata's measured shape (31-word vocabulary, ~30-80 tokens/doc,
      |20 sources, ~4% injected near-dups + a thin exact-dup tail;
      |64-dim near-uniform unit embeddings, 10 labels). Generator and
      |probe are `runMain graft.operators.GrowthProbe`; generator v3
      |(round 12) re-draws a near-dup substitution against the BASE
      |token of its position (so every injected near-dup is a REAL
      |1-2 token edit even when two edits hit one position) and
      |version-stamps the staged decade, so editing the generator
      |invalidates the stage instead of silently re-measuring old
      |bytes; v2->v3 shifted the synthetic-column counts by <0.1% and
      |changed no growth shape. The probe
      |re-measured the sf0.1 column IDENTICALLY to the tables above
      |(256 / 214,123 / 3,586 / 24,816 / 1,112 / 201,221 / 437 /
      |1,999,000 / 2,536) before measuring the new decade - the counts
      |come from the operators' own candidate machinery (lshCandidates,
      |simhashCandidateCount, cellJoinStats, ivfProbes), never a
      |parallel implementation.
      |
      || measure | sf0.1 | sf1-synth | growth at 10x data |
      ||---|---|---|---|
      || total doc pair space | 12,497,500 | 1,249,975,000 | 100x |
      || dedup03 MinHash-LSH candidates | 256 | 2,117 | 8.3x - NEAR-LINEAR for a second decade (the 100 TB path) |
      || dedup04 (4,1) narrow candidates | 214,123 | 21,417,939 | 100x - quadratic, as the birthday shape predicts |
      || dedup04 (8,5) wide candidates | 3,586 | 205,571 | 57x - correlated-vocab residue (see reading); still 104x below narrow |
      || dedup08 span rows | 24,816 | 249,653 | 10.06x - exactly linear |
      || dedup08 cross-doc dup spans | 1,112 | 7,677 | tracks injected dup mass |
      || dedup10 stride-1 window rows | 201,221 | 2,022,291 | 10.05x - exactly linear |
      || dedup10 spans reported | 437 | 5,860 | tracks true duplication |
      || cur16 held-out window hashes (semi-join build side) | 9,821 | 101,498 | 10.3x - linear at 1/20 corpus mass (round-13 row) |
      || cur16 contaminated spans reported | 24 | 733 | tracks injected cross-split dup mass (round-13 row) |
      || text20 boilerplate hash index (the pinned ingest index) | 45 | 88 | 2.0x at 10x docs - tracks TEMPLATE mass, never the corpus (round-14 row) |
      || text20 affected docs (the broadcast mark frame) | 31 | 57 | 1.8x - same bound (round-14 row) |
      || vector pair space | 1,999,000 | 199,990,000 | 100x |
      || dedup05 cell candidates | 1,999,000 | 199,990,000 | 100x - the documented adversarial bound (near-uniform embeddings leave no cell pair excludable) |
      || sim07 intra-cell pairs | 125,051 | 12,577,188 | 100.6x at FIXED K=16 |
      || sim15 probed-cell members | 2,536 | 24,950 | 9.8x - linear (NProbe/K of the corpus) |
      || mm07 (8,4)/64-bit blocked candidates | 202 | 2,082 | 10.3x - LINEAR (round-12 row): candidates are the injected near-dup mass itself; the 70-keys-per-image blocking's accidental-collision term is negligible until the per-key birthday bound (~2^16 images per 32-bit key) |
      || sim19 navigable graph edges | 15,981 | 159,982 | 10.0x on 10x vectors - linear at fixed degree (KnnK local + 3 long-range per node; round-14 row) |
      || sim19 scored candidates, whole fixed query set | 1,165 | 1,234 | CONSTANT at 10x corpus - the graph-ANN read pattern made measurable: per query the search touches <= entry + rounds*beam*degree vectors however large the corpus grows (round-14 row) |
      || sim20 whole sweep pool (all four trajectories summed) | 3,419 | 3,569 | CONSTANT at 10x corpus - the knob curve costs a fixed multiple of one search at any scale (round-15 row) |
      || dedup13 rows=1 superset (second decade, through sweepSuperset) | 287,751 | 28,937,884 | ~100.6x at 10x docs - birthday-quadratic BY CONSTRUCTION, now MEASURED a second decade: the loose end of the S-curve is the price of asking for the whole curve, and the documented deployment points the sweep at a cur01 hash sample (round-15 row) |
      || sim21 whole insert read set (15-append batch, through beamSearchPool) | 2,869 | 3,097 | CONSTANT at 10x corpus - inserting into the graph costs ONE beam search for the whole batch, so per-arrival maintenance cost never grows with the index it maintains: the property that makes graph-ANN maintenance streamable (stream24; round-16 row) |
      || sim22 compaction candidate evidence (through sim22CandidateEdges) | 10,150 | 100,150 | 10x on 10x vectors - exactly 5n + 150: LINEAR in corpus + inserts at fixed degree; compaction never opens a pair space, which is what distinguishes the consolidate step from a sim07 rebuild (round-16 row) |
      || sim24 tombstoned-consolidate evidence (through sim24CandidateEdges) | 11,141 | 111,053 | 10.0x on 10x vectors - LINEAR: the DiskANN re-link (live nodes inheriting a deleted neighbor's live out-edges) adds ~10% over sim22's frame at the ~6% tombstone rate and bounded degree - one edge-to-edge equi-join, never a pair space (round-17 row) |
      || cur23 train manifest docs (the emit's thin frame) | 3,334 | 37,850 | 11.4x at 10x docs - the train-split share of the funnel survivors, linear (round-17 row) |
      || cur23 hive partitions (source, shard) | 397 | 4,005 | 10.1x - shard count tracks packed tokens / (ctx * seqsPerShard), exactly linear (round-17 row) |
      || cur23 boundary-straddling docs | 376 | 3,918 | 10.4x - tracks doc mass, not shard count: the loader's back-read bound stays ceil(max_doc/ctx) shards at any scale (round-17 row) |
      || cur23 emitted payload bytes (measured from the files) | 1,097,829 | 11,197,228 | 10.2x - the payload emit is the corpus's one full copy, linear by construction and now measured (round-17 row; +26 bytes per dir in round 18 = the build-once _GRAFT_STAMP marker) |
      || cur26 repacked payload bytes (measured from the files) | 1,038,401 | 10,500,284 | 10.1x - the repack re-emits the survivor mass; the delta vs cur23 is exactly the removed tokens' share (round-17 row; +26-byte stamp as above) |
      || cur24 dirty-shard bill (sum of per-source suffixes) | 372 | 3,986 | 10.7x - at the fixture's deliberately-dense ~6% recall rate nearly every source dirties early, so the suffix is near-total and the bill tracks SHARD COUNT; a production recall list is orders sparser and the bill shrinks to the tail the prefix-stability law prices (round-17 row) |
      || cur25 mask rows (the zero-rewrite alternative) | 290 | 3,360 | 11.6x - recall-list-sized, never corpus-sized: the mask stays the cheap execution at any scale (round-17 row) |
      || cur27 equivalence rows (one per post-takedown sequence, through the operator itself - both emit legs + the masked re-tile run for real) | 1,478 | 15,000 | 10.1x - exactly linear in packed tokens/ctx; the masked-read leg adds no term beyond the emits it audits (round-17 row) |
      || cur28 span-redaction mask rows | 356 | 4,020 | 11.3x - recall-sized like cur25; sub-document granularity changes nothing about the economics (round-17 row) |
      || cur29 composed-mask rows (one per post-composed-mask sequence, through the operator itself - the emit leg + the doubly-masked re-tile run for real) | 1,442 | 14,632 | 10.1x - exactly linear in surviving packed tokens/ctx: composing the two mask families in one loader pass adds no term beyond the single emit it reads (round-18 row) |
      || cur30 repacked sequences (through the operator's own emitted-file audit) | 1,442 | 14,632 | 10.1x - the doubly-repacked tiling equals cur29's composed-read row count AT EVERY DECADE (the masks-retired law as a growth identity; round-20 row) |
      || cur30 doubly-repacked emitted bytes (from the files) | 1,012,842 | 10,254,842 | 10.1x - linear in SURVIVING mass: the composed retire costs cur26's shape minus the span slices (round-20 row) |
      || cur31 retained ledger bytes AFTER the vacuum | 886 | 886 | CONSTANT - one empty current version however many mask rows accumulated (pre-vacuum mass = cur25+cur28's rows above); the vacuum is what keeps the ledger from growing one artifact per recall forever (round-20 row) |
      || sim25 coarse-layer edges (through sim25CoarseEdges) | 995 | 10,139 | 10.2x on 10x vectors - linear at fixed degree in the n/8 layer (round-20 row) |
      || sim25 layered scored pool (coarse routing + base rounds) | 775 | 924 | CONSTANT at 10x corpus AND 33%/25% below sim19's 1,165/1,234 pool at the same decades - the layered entry buys back sim19's recall floor (0.58 >= 0.5, spec-measured) on a strictly smaller budget (round-20 row) |
      || etl32 files touched by a 1/16 date-axis predicate (synthetic orders decade, through zOrderKey + the same range-clustered write; 16 files) | 4 of 16 | 6 of 16 | a FILE SUBSET (~sqrt(files)) at both decades - the two-axis locality claim measured, not argued (round-20 row) |
      || etl32 files touched by a 1/16 custkey-axis predicate | 4 of 16 | 4 of 16 | same subset bound on the OTHER axis - the property a 1-D sort cannot give (etl22's contrast; round-20 row) |
      || etl32 rows read under the 1/16 date predicate | 335 of 5,000 | 3,209 of 50,000 | tracks selectivity linearly (~1/16 of the corpus) while the file subset stays ~sqrt - selectivity-proportional I/O on BOTH axes from ONE physical copy (round-20 row) |
      |
      |sim20 knob curve (round 15, measured at sf0.1 through the sweep
      |operator itself - candidates are pool rows for ALL 5 queries,
      |recall@10 vs exact; production config = entries 8, beam 12,
      |rounds 4):
      |
      || entries | beam | rounds | candidates | recall@10 |
      ||---|---|---|---|---|
      || 8 | 12 | 1 | 311 | 0.02 |
      || 8 | 12 | 2 | 665 | 0.10 |
      || 8 | 12 | 3 | 955 | 0.32 |
      || 8 | 12 | 4 | 1,165 | 0.56 |
      || 8 | 8 | 4 | 845 | 0.40 |
      || 8 | 4 | 4 | 427 | 0.14 |
      || 2 | 12 | 4 | 982 | 0.36 |
      |
      |Reading the curve: ROUNDS buy the most recall per candidate on
      |this graph (the 3->4 step adds 210 candidates for +0.24 recall);
      |halving the beam (12->8) saves 320 candidates for -0.16; beam 4
      |collapses recall to 0.14 - the beam must exceed the local-minima
      |width of the small-world graph. Fewer entries (8->2) costs
      |almost nothing in budget (982 vs 1,165) but -0.20 recall: entry
      |DIVERSITY, not entry count, is what seeds the right regions -
      |exactly HNSW's argument for a layered entry hierarchy. The
      |rounds axis is read from ONE pool per (entries, beam) trajectory
      |(a candidate counts from the round it ENTERED - exact because
      |round r is a strict prefix of round r+1); the trajectories
      |themselves genuinely diverge per beam width (beam search has no
      |cross-beam nesting), so the sweep runs all four in ONE 4-round
      |loop with config carried as columns.
      |
      |Reading: the linear claims (dedup03, dedup08, dedup10, sim15,
      |mm07's photo-scale (8,4) 64-bit blocking - and round 13's cur16
      |cross-split decontamination, whose held-out hash set is the
      |semi-join build side and grows at exactly the benchmark split's
      |1/20 corpus share) hold for a second decade. The quadratic-at-fixed-config shapes
      |did exactly what their scaling knobs predict, and the
      |measurement re-priced two of them:
      |
      |1. Narrow (4,1) blocking pays 21.4M candidates already at 50k
      |   docs - two decades before the old 200k cutover - because a
      |   real corpus' correlated token distributions concentrate
      |   simhashes far above the uniform birthday estimate (which says
      |   only ~152k here). SimhashNarrowMaxDocs now cuts over to (8,5)
      |   at 20k docs; the pigeonhole recall guarantee makes the switch
      |   result-identical (blocking-invariance spec), and sf0.1's
      |   5k-doc corpus stays on narrow. The wide config's own 57x
      |   residue is the same vocabulary concentration, not a blocking
      |   defect - the next widening ((16,13), 560 keys x 52 bits)
      |   remains a one-line change when a corpus' measured candidate
      |   rate demands it.
      |2. dedup05/sim07's per-cell pair work grew 100x on 10x vectors
      |   at fixed K=16 - the measured confirmation of the documented
      |   contract that the CODEBOOK must grow with the corpus: K ∝ n
      |   holds |cell| flat and the candidate stream linear. At 100 TB
      |   nobody runs a 16-cell index; the knob, not the join shape, is
      |   what scales.
      |
      |## Third measured decade (sf1-synth -> sf10-synth, 10x docs / 5x vectors, rounds 12-13)
      |
      |The LINEAR claims are the 100 TB path, so rounds 12-13 extended
      |them one more decade (500k docs / 100k vectors - two decades past
      |the driver's sf0.1; `runMain graft.operators.GrowthProbe ... deep`,
      |same generator v3, measureLinear counts through the operators'
      |own machinery). The deliberately-quadratic reference shapes
      |(dedup04 narrow at fixed config, dedup05's adversarial
      |near-uniform cell join, sim07 at fixed K) are NOT re-measured:
      |two decades already confirmed they do exactly what their scaling
      |knobs predict, and a third would cost ~100x the second to
      |re-confirm a shape the knob - not the join - is documented to fix.
      |
      || measure | sf1-synth | sf10-synth | growth at 10x docs / 5x vectors |
      ||---|---|---|---|
      || dedup03 MinHash-LSH candidates | 2,117 | 25,393 | 12.0x - near-linear for a THIRD decade |
      || dedup08 span rows | 249,653 | 2,499,590 | 10.01x - exactly linear |
      || dedup08 cross-doc dup spans | 7,677 | 76,980 | 10.0x - tracks injected dup mass |
      || dedup10 stride-1 window rows | 2,022,291 | 20,242,048 | 10.01x - exactly linear |
      || dedup10 spans reported | 5,860 | 58,537 | 10.0x - tracks true duplication |
      || cur16 held-out window hashes (semi-join build side) | 101,498 | 1,013,201 | 9.98x - exactly linear at 1/20 corpus mass (round-13 row) |
      || cur16 contaminated spans reported | 733 | 7,268 | 9.9x - tracks cross-split dup mass (round-13 row) |
      || text20 boilerplate hash index | 88 | 820 | 9.3x - the injected dup-cluster mass, ~2e-3 of the chunk space at BOTH decades: the pinned ingest index stays broadcast-trivial at any corpus (round-14 row) |
      || text20 affected docs (broadcast marks) | 57 | 597 | 10.5x - same bound (round-14 row) |
      || mm07 (8,4)/64-bit blocked candidates | 2,082 | 22,556 | 10.8x - linear; accidental-collision term still negligible |
      || sim15 probed-cell members | 24,950 | 125,651 | 5.04x on 5x vectors - exactly linear in the corpus |
      || etl28 name vocabulary (the key domain) | 223 | 695 | 3.1x at 10x rows - Heaps-sublinear (sqrt law; round-14 row) |
      || etl28 largest block | 20 | 61 | 3.05x - tracks V/16, the vocabulary, never the corpus |
      || etl28 band-surviving candidate pairs (the levenshtein workload) | 1,280 | 12,318 | 9.6x at 10x rows - LINEAR IN THE CORPUS (see reading) |
      || etl28 emitted links | 31 | 173 | tracks the injected near-dup name mass (~V/10 variants) |
      || cur25 whole-doc mask rows | 3,360 | 33,691 | 10.0x - recall-list-sized for a THIRD decade (round-20 row) |
      || cur28 span mask rows | 4,020 | 39,023 | 9.7x - findings-sized for a third decade (round-20 row) |
      || cur30 repacked sequences (emitted-file audit) | 14,632 | 146,092 | 9.99x - EXACTLY linear in surviving packed tokens/ctx for a third decade; still equal to the composed-read row count (the masks-retired identity holds at 500k docs; round-20 row) |
      || cur30 doubly-repacked emitted bytes | 10,254,842 | 102,512,609 | 10.0x - the composed retire stays the one full survivor copy (round-20 row) |
      || cur31 retained ledger bytes after the vacuum | 886 | 886 | CONSTANT at the third decade too (round-20 row) |
      || etl32 files per 1/16 predicate, date / custkey axis (500k synthetic orders, 16 files) | 6 / 4 | 4 / 4 | the file-subset bound holds a third decade on BOTH axes; rows read 31,179 / 31,348 of 500,000 - selectivity-linear (round-20 row) |
      |
      |Reading: every sub-quadratic claim that carries the 100 TB story
      |now rests on THREE measured decades (sf0.1 -> 50k -> 500k docs),
      |with growth ratios that stay flat decade-over-decade (dedup03:
      |8.3x then 12.0x per 10x docs; the drift is the injected near-dup
      |mass plus band-collision residue, both linear-bounded). At this
      |rate the extrapolation to 10^9+ documents is two more decades of
      |the same measured shape, not a leap of faith.
      |
      |etl28 (fuzzy linkage) reading — the round-13 directive's missing
      |decade, measured round 14 through the operator's OWN machinery
      |(Etl.nameVocabulary for the key-domain collapse,
      |Etl.fuzzyBlockedLinks for the blocked pair space). The real
      |sf0.1 part table anchors the claim (20k rows -> 64 names, max
      |block 8, 224 band pairs, 80 links); the synthetic decades use a
      |Heaps-law name generator over the corpus vocabulary (name index
      |= floor(sqrt(row id)) — beta = 0.5, the canonical
      |vocabulary-growth exponent; 16 head nouns = the blocking key;
      |every 10th name a 1-edit variant). Measured: the VOCABULARY grows
      |as the square root of the corpus (223 -> 695 at 10x rows) and
      |the largest block tracks V/16 (20 -> 61) — so the per-block
      |quadratic kernel work, ~V^2/32 band pairs, grows 9.6x at 10x
      |rows: LINEAR IN THE CORPUS. The "link the key domain, not the
      |rows" design is thereby a measured property, not an assertion —
      |the quadratic lives entirely inside a key space that Heaps' law
      |keeps at sqrt(corpus), and the blocking key re-prices it from
      |V^2 to V^2/blocks. If a real catalog's measured vocabulary ever
      |grew FASTER than ~sqrt(rows) (beta -> 1: near-unique names),
      |the re-pricing knob is a finer blocking key (head noun ->
      |noun + length band as key), the same one-line change contract
      |as dedup04's widening.
      |
      |## Measured round-8-operator growth (sf 0.01 -> 0.1, 10x docs)
      |
      || op | measure | sf0.01 | sf0.1 | shape |
      ||---|---|---|---|---|
      || dedup10 | stride-1 window hashes (rows shuffled) | 20,212 | 201,221 | 9.96x — exactly linear (one row per token position) |
      || dedup10 | cross-doc duplicated spans reported | 45 | 437 | tracks true duplication, not the corpus |
      || q34 | per-level frontier (depth 0..4) | 9 / 90 / 900 / 500 | 9 / 90 / 900 / 9,000 / 5,000 | level k holds the k+1-digit keys; the WIDEST level is ~60% of the corpus |
      |
      |dedup10's window stream is the corpus token stream — 10x docs is
      |10x rows, with no pair space anywhere (the df aggregate and
      |flag-back join shuffle 8-byte hashes). q34's frontier geometry is
      |what motivated the round-9 equi-join rewrite and then validates
      |it: the deepest frontier is corpus-sized (9,000 rows at sf0.1 —
      |at any scale the widest level holds most of the table), so a
      |recursive step that nested-loops |base| x |frontier| per level is
      |quadratic-in-practice exactly where the data is thickest, while
      |the floor-division equi-key makes each level one hash join whose
      |build side is the frontier. Measured effect of the rewrite at
      |sf0.1: q34 1.72 -> 0.69 s, and the remaining cost is Spark's
      |per-iteration recursion machinery (plan + materialize + count per
      |level), not the join.
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
      |
      |## Measured round-9-operator growth (sf 0.01 -> 0.1, ~10x docs)
      |
      || op | measure | sf0.01 | sf0.1 | shape |
      ||---|---|---|---|---|
      || dedup11 | arrival batch (docs mod 16 = 3) | 32 | 313 | 1/16 of the corpus by construction |
      || dedup11 | arrival x corpus LSH candidates | 3 | 32 | linear in the BATCH — the corpus contributes per-bucket collisions, never a pair space |
      || dedup11 | verdicts (exact / near / admit) | 0 / 3 / 29 | 2 / 27 / 284 | tracks true duplication |
      || sim13 | corpus postings rows (distinct (doc, token)) | 11,695 | 116,231 | 9.9x — linear, the token stream |
      || sim13 | broadcast query-token build side | 108 | 111 | CONSTANT (fixed probe set) |
      || sim13 | lexical overlap pairs into top-k | 2,495 | 24,995 | queries x matched docs; pruned map-side by the partial top-k before the only shuffle |
      |
      |dedup11's candidate count is the ingest-gate scale property: at a
      |fixed batch size the cost of admitting a batch is flat in corpus
      |growth except for true near-dup mass (the 3 -> 32 step here is
      |the batch growing 10x, not the corpus pressing on it), because
      |both legs are equi-joins into a pre-built index. sim13 adds no
      |new join shapes: the lexical leg is an inverted-index equi-join
      |whose probe side is constant, and the vector leg is sim01's
      |audited protocol; the RRF fuse joins two <= queries x k frames.
      |
      |Round-9 additions (same 0.01 -> 0.1 step, 4x vectors / 10x docs):
      |
      || op | measure | sf0.01 | sf0.1 | shape |
      ||---|---|---|---|---|
      || sim15 | approx-stage candidates (probed-cell members) | 641 | 2,536 | 4.0x on 4x vectors — linear; ~= NProbe/K (4/16) of sim08's full-corpus stream (2,495 -> 9,995) |
      || cur13 | importance-model rows (hash buckets) | 256 | 256 | CONSTANT at any corpus size |
      || cur13 | raw docs scored -> kept | 475 -> 95 | 4,750 -> 950 | scoring linear; the per-source 20% cut sizes the selection exactly |
      || text15 | sketch cells occupied (of Depth x Width = 64) | 55 | 55 | CONSTANT — the point of a CMS |
      || text15 | token instances feeding the sketch | 27,165 | 270,704 | linear scan; sketch state fixed |
      || text15 | top-20 words overcounted (max overcount) | 10 (2,709) | 13 (26,822) | collision mass grows with corpus mass (<= mass/W per row), cells do not |
      |
      |sim15 is the composite read-pattern claim made measurable: the
      |IVF cells cut the PQ candidate stream to the probed fraction at
      |both SFs, and the refine stays <= queries x 160 full-vector rows.
      |cur13's model and text15's sketch are the two fixed-size-state
      |shapes (broadcast model, mergeable sketch) — corpus growth moves
      |only the streamed side.
      |
      |## Trained vs seed codebook (sim03/06/08 wiring, round 8)
      |
      |sim03/sim06/sim08 now search K-MEANS-TRAINED centroids
      |(Similarity.trainedCodebook — sim09's engine-exact Lloyd protocol,
      |spherical assignment, 5 rounds, k=16) instead of the raw corpus
      |sample. Measured recall@10 vs exact sim01 at nprobe=4/16, per
      |codebook, per SF:
      |
      || sf | vectors | seed sample | L2-trained | spherical-trained |
      ||---|---|---|---|---|
      || 0.001 | 500 | 0.880 | 0.860 | 0.860 |
      || 0.01 | 500 | 0.920 | 0.840 | 0.840 |
      || 0.1 | 2,000 | 1.000 | 0.940 | 0.980 |
      |
      |Two honest readings. (1) Metric-matched training matters: the
      |spherical variant (assign by the cosine the search ranks with)
      |recovers +4 recall points over L2-trained at the largest SF, so
      |that is what the codebook trains with. (2) On THIS corpus a trained
      |codebook cannot beat a sampled one at fixed nprobe: the synthetic
      |embeddings are near-uniform — cell-size skew (max/mean) is already
      |1.18–1.38 under seed sampling and k-means leaves it essentially
      |unchanged, so there is no imbalance to fix and no cluster structure
      |to learn; the seed's slight recall edge is the extra corpus
      |fraction its bigger cells happen to scan. The spec therefore pins a
      |floor (trained >= 0.8) and a no-regression margin (within 2
      |neighbors of 50 of seed) rather than asserting a dominance the data
      |cannot express; on clustered real embeddings the trained codebook's
      |recall-at-fixed-cost gain is the standard IVF result, and the
      |wiring — trainer output IS the searched codebook, replayed
      |verbatim by every oracle — is what this round makes true.
      |
      """.stripMargin
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
