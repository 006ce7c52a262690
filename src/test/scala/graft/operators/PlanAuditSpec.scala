package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Physical-plan contracts: the scale promises SURVEY.md §5 makes are
  * asserted here against the actual executed plans, so a refactor that
  * silently drops a pushdown or inflates a broadcast join into a
  * shuffle (or worse, a cartesian product) fails the build — not the
  * 100 TB run.
  */
class PlanAuditSpec extends SparkSpec {

  /** Final (post-AQE) physical plan string. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter is pushed to the parquet scan and columns are pruned") {
    val plan = finalPlan(Relational.q02FilterProject(spark, sf))
    assert(plan.contains("PushedFilters: ["), "scan must carry pushed filters")
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate predicate must reach the scan")
    assert(!plan.contains("l_comment"),
      "unused columns must not survive into the scan (column pruning)")
  }

  test("q05: star join broadcasts every small dimension") {
    val plan = finalPlan(Relational.q05NationVolume(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4,
      s"customer/supplier/nation/region must broadcast, saw $broadcasts")
  }

  test("etl04: fact enrichment is broadcast joins, no fact shuffle per dim") {
    val plan = finalPlan(Etl.etl04DimEnrich(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3,
      s"dimension joins must broadcast, saw $broadcasts")
  }

  test("q09: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = finalPlan(Relational.q09SortLimit(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q03: top-k after aggregation is TakeOrderedAndProject") {
    val plan = finalPlan(Relational.q03TopRevenue(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q25: banded range join is a broadcast nested loop, bands built once") {
    val plan = finalPlan(Relational.q25RangeJoin(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("no operator plans a CartesianProduct") {
    // Self-joins here are either equi-joins on derived keys (LSH bands,
    // simhash chunks, shingles) or broadcast nested loops with a
    // condition — never an unconstrained cartesian shuffle product.
    val audited = Seq(
      Dedup.dedup02NgramJaccard(spark, sf),
      Dedup.dedup03MinhashLsh(spark, sf),
      Dedup.dedup04Simhash(spark, sf),
      Dedup.dedup14Crossmodal(spark, sf),
      Dedup.dedup10SubstringSpans(spark, sf),
      Similarity.sim02LshAnn(spark, sf),
      Similarity.sim03IvfAnn(spark, sf),
      Similarity.sim20GraphSweep(spark, sf),
      Curation.cur12ClusterSample(spark, sf),
      Curation.cur18CorpusBuild(spark, sf),
      Relational.q35LateralTopn(spark, sf))
    audited.foreach { df =>
      val plan = finalPlan(df)
      assert(!plan.contains("CartesianProduct"),
        s"found CartesianProduct in:\n${plan.take(2000)}")
    }
  }

  test("no query plans a BroadcastNestedLoopJoin outside the bounded-build whitelist") {
    // A BNLJ means a join with no equi-component — every probe/build
    // comparison is a nested loop, the exact shape that made round-8's
    // q34 a scale-killer (its band predicate had an equivalent
    // floor-division equi-key, so each recursion level nested-looped the
    // whole base table for nothing). Whether a join is BNLJ is decided
    // statically (equi keys either exist or they don't; AQE never turns
    // an equi-join into a nested loop), so the sweep inspects the
    // compiled plan WITHOUT executing all 114 queries.
    //
    // A BNLJ is legitimate ONLY when its build side is bounded by a
    // CONSTANT independent of corpus size — then it is the cheapest
    // plan: broadcast the constant, stream the corpus once. Every
    // whitelisted entry names its constant; anything new must justify
    // itself here or carry an equi-key.
    val boundedBuild = Set(
      "q25_range_join",       // 20-row band table
      "etl03_master_upsert",  // 1-row max(master_id) scalar
      "etl15_expectations",   // 1-row violation/total count scalars
      "text11_surprisal",     // 1-row corpus token total
      "text16_pmi_collocations", // 1-row corpus bigram total (text11's shape)
      "text19_tfidf_keywords", // 1-row corpus doc count (text11's shape)
      "sim01_bruteforce_topk", // fixed probe set (constant query count)
      "sim04_l2_topk",        // fixed probe set
      "sim05_radius_search",  // fixed probe set
      "sim08_pq_ann",         // fixed probe set
      "sim10_recall_eval",    // fixed probe set
      "sim11_mmr_diversify",  // fixed probe set
      "sim13_hybrid_rrf",     // fixed probe set (vector leg = sim01 shape)
      "sim14_sq_ann",         // fixed probe set (sim08's refine shape)
      "sim16_nprobe_sweep",   // fixed probe set (exact leg = sim01's shape)
      "sim17_staleness_monitor", // fixed probe set (sim01's scan, level-exploded)
      "sim19_graph_ann",   // fixed probe set × constant entry set (round 0)
      "sim20_graph_sweep") // sim19's round-0 shape over the entry SUPERSET
                           // (max of the configured constants) + the
                           // exact leg's fixed probe set
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (!boundedBuild(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n${plan.take(2000)}")
      }
    }
  }

  test("q32: grouping sets plan one Expand + one aggregate pass, not N scans") {
    val plan = finalPlan(Relational.q32GroupingSets(spark, sf))
    assert(plan.contains("Expand"), "grouping sets must plan through Expand")
    // A per-set rescan strategy would surface as a Union of scans
    // (AQE's toString shows the plan twice, so scan counts are not
    // directly comparable — absence of Union pins the single pass).
    assert(!plan.contains("Union"),
      "grouping sets must not union one scan per set")
  }

  test("sim05: radius search broadcasts queries; corpus is never shuffled") {
    val plan = finalPlan(Similarity.sim05RadiusSearch(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "query set must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup03: MinHash signature build plans with zero exchanges") {
    // The signature is a scalar expression over the cached per-doc
    // array — any Exchange here means the groupBy shuffle crept back.
    val sig = Dedup.minhashSignatures(Dedup.shingleArrays(spark, sf))
    val plan = finalPlan(sig)
    assert(!plan.contains("Exchange"),
      s"signature build must be shuffle-free:\n${plan.take(1500)}")
  }

  test("sim03: IVF cell assignment plans zero Exchange (per-row argmax, no window)") {
    // The old formulation joined corpus × broadcast codebook and ran a
    // row_number window partitioned by vec_id — a full corpus shuffle
    // for a per-row argmax. The literal-codebook form must stay inside
    // the scan stage.
    val e = Dedup.vectors(spark, sf)
    val assigned = Similarity.ivfAssigned(e, Similarity.ivfCentroids(e))
    val plan = finalPlan(assigned)
    assert(!plan.contains("Exchange"),
      s"cell assignment must be shuffle-free:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      s"cell assignment must not use a window:\n${plan.take(1500)}")
  }

  test("dedup05: exact cosine join plans no nested-loop over corpus×corpus") {
    val plan = finalPlan(Dedup.dedup05EmbeddingCosine(spark, sf))
    // Both candidate joins carry equi-keys (cell_a=ca, cell_b=cb), so
    // nothing in this plan may degenerate to a nested loop or product.
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"corpus×corpus nested loop in:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"candidate generation must be an equi-join:\n${plan.take(2000)}")
  }

  test("cur18: evidence joins broadcast, shared frames cached, no doc_id shuffle join") {
    // cur06's posture extended to the composed build: the span frame,
    // the near-dup drop set, and the sampling thresholds are all tiny
    // evidence — they must join as broadcasts; the only corpus-wide
    // exchanges are the shared fp window (inside the cached funnel
    // frame) and the train-split packing window. The shared GraftCache
    // frames (cur06's flagged frame, cur16's window hashes) must show
    // as InMemoryTableScans — the stages READ the pins, they don't
    // recompile private scans.
    val plan = finalPlan(Curation.cur18CorpusBuild(spark, sf))
    assert(!plan.contains("SortMergeJoin [doc_id") &&
      !plan.contains("ShuffledHashJoin [doc_id"),
      s"corpus-sized doc_id shuffle join crept into the build:\n${plan.take(2000)}")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4,
      s"span/drop/threshold evidence must broadcast, saw $broadcasts")
    assert(plan.contains("InMemoryTableScan"),
      "the shared funnel/window-hash pins must feed the stages")
  }

  test("cur20: manifest keeps the funnel posture; shard read-back prunes partitions") {
    // The manifest plan is cur18's funnel through the packing window —
    // same no-doc_id-shuffle contract, evidence broadcast.
    val plan = finalPlan(Curation.cur18TrainManifest(spark, sf))
    assert(!plan.contains("SortMergeJoin [doc_id") &&
      !plan.contains("ShuffledHashJoin [doc_id"),
      s"corpus-sized doc_id shuffle join in the manifest:\n${plan.take(2000)}")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "scrub/drop/threshold evidence must broadcast")
    // A trainer reading one (source, shard) must prune to that
    // directory — the layout's whole point at 100 TB.
    Curation.cur20SequenceSink(spark, sf).collect()
    val out = Curation.cur20OutDir(spark, sf)
    val pruned = finalPlan(spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("source") === "src1" &&
        org.apache.spark.sql.functions.col("shard") === 0))
    assert(pruned.contains("PartitionFilters: [") &&
      pruned.contains("isnotnull(source") && pruned.contains("isnotnull(shard"),
      s"shard read must hit PartitionFilters:\n${pruned.take(2000)}")
  }

  test("cur23: payload shards prune partitions on read-back; evidence stays broadcast") {
    // The payload frame's ONLY corpus-sized join is the unavoidable
    // manifest ⋈ text equi-join on doc_id; the scrub/span evidence must
    // stay broadcast (affected/contaminated docs only), or the emit
    // would pay corpus shuffles for contamination-sized frames.
    val plan = finalPlan(Curation.cur18TrainPayload(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "scrub + span evidence must broadcast onto the payload frame")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in the payload frame:\n${plan.take(2000)}")
    // A trainer reading one (source, shard) of the PAYLOAD must prune
    // to that directory, same as cur20's manifest layout.
    Curation.cur23PayloadShards(spark, sf).collect()
    val out = Curation.cur23OutDir(spark, sf)
    val pruned = finalPlan(spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("source") === "src1" &&
        org.apache.spark.sql.functions.col("shard") === 0))
    assert(pruned.contains("PartitionFilters: [") &&
      pruned.contains("isnotnull(source") && pruned.contains("isnotnull(shard"),
      s"payload shard read must hit PartitionFilters:\n${pruned.take(2000)}")
  }

  test("cur27: masks broadcast; re-tile window is per-source; no cartesian anywhere") {
    val plan = finalPlan(Curation.cur27MaskEquivalence(spark, sf))
    // The mask side is recall-list-sized and must never shuffle the
    // reassembled sequence stream to meet it.
    assert(plan.contains("BroadcastHashJoin"),
      "mask rows must broadcast onto the reassembled sequences")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in cur27:\n${plan.take(2000)}")
    // The re-tile offsets come from windows over per-SEQUENCE frames,
    // every one partitioned (by source or by the reassembly keys) —
    // a global single-partition window would be the 100 TB killer.
    assert(!plan.contains("Window [") ||
      !"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isDefined,
      "no unpartitioned window may appear in the re-tile")
  }

  test("etl29: per-version scrub is one broadcast anti-join over the snapshot scan") {
    val (plan, versions) = {
      val df = Etl.etl29SnapshotScrub(spark, sf)
      df.collect()
      // The audit frame itself is trivial; the contract to pin is the
      // SCRUB leg's join shape — replay one version's scrub plan.
      val suffix = sf.replaceAll("[^a-zA-Z0-9]", "_")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl29_$suffix"
      val vs = graft.sources.MergeSink.versions(spark, base)
      val keys = Etl.cdcLog(spark, sf).select("key").distinct()
        .filter(Etl.etl29EraseFlag(org.apache.spark.sql.functions.col("key")))
      (finalPlan(graft.sources.MergeSink.snapshotRows(spark, base, vs.last)
        .join(org.apache.spark.sql.functions.broadcast(keys), Seq("key"),
          "left_anti")), vs)
    }
    assert(versions.nonEmpty)
    assert(plan.contains("BroadcastHashJoin LeftAnti") ||
      plan.contains("BroadcastNestedLoopJoin BuildRight, LeftAnti") ||
      plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"the erase set must anti-join broadcast, never shuffle the state:\n${plan.take(1500)}")
  }

  test("cur29: composed masks broadcast; re-tile windows partitioned; no cartesian") {
    val plan = finalPlan(Curation.cur29ComposedMasks(spark, sf))
    // Both mask families union into one recall+findings-sized frame —
    // it must broadcast onto the reassembled sequences, never shuffle
    // the token stream to meet it.
    assert(plan.contains("BroadcastHashJoin"),
      "the composed mask list must broadcast onto the reassembled sequences")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in cur29:\n${plan.take(2000)}")
    assert(!plan.contains("Window [") ||
      !"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isDefined,
      "no unpartitioned window may appear in the re-tile")
  }

  test("cur30: composed retire is mask-free and equi-only; packing window partitioned") {
    val plan = finalPlan(Curation.cur30ComposedRepack(spark, sf))
    // The retire re-derives both families from the finding coordinates
    // map-side (a takedown filter + an in-array span slice) — the skip
    // list never joins in, and the only joins are doc_id/(source,
    // shard) equi-joins: no cartesian, no non-equi pair space.
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in cur30:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the composed retire must stay equi-join only")
    // The survivor re-pack window must ride the per-source partition,
    // never a global sort of the corpus.
    assert(!"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isDefined,
      "no unpartitioned window may appear in the re-pack")
  }

  test("stream29: request semi-join and composed ledger both broadcast; no cartesian") {
    import graft.sources.CodebookStore
    import spark.implicits._
    val tdStore = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_planaudit_s29td_${System.nanoTime()}"
    val spStore = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_planaudit_s29sp_${System.nanoTime()}"
    val (td, sp) = Curation.cur31MaskFamilies(spark, sf)
    CodebookStore.publishFrame(spark, tdStore, td)
    CodebookStore.publishFrame(spark, spStore, sp)
    try {
      val plan = finalPlan(graft.streaming.GraftStreams
        .composedMaskReadResults(spark, sf,
          Seq(("src0", 0L)).toDF("source", "seq"), tdStore, 1L, spStore, 1L))
      // The serving read's two small sides — the composed ledger (the
      // skip list, recall+findings-sized) and the request batch — must
      // both broadcast onto the reassembled/re-tiled stream; the
      // request cut is a semi-join; nothing may degenerate to a
      // cartesian.
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
        "ledger skip list AND request batch must broadcast")
      assert(plan.contains("LeftSemi"),
        "the request cut must plan as a semi-join")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in stream29:\n${plan.take(2000)}")
    } finally {
      CodebookStore.reset(spark, tdStore)
      CodebookStore.reset(spark, spStore)
    }
  }

  test("etl30: the suppression gate is one broadcast anti-join on the change batch") {
    import org.apache.spark.sql.functions.broadcast
    // Run the operator (it publishes the suppression list), then
    // replay the GATE's join shape: the list is request-sized and must
    // anti-join broadcast against the incoming changes — the audit
    // frame itself is eagerly materialized and trivial.
    Etl.etl30SuppressionGate(spark, sf).collect()
    val suffix = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl30_$suffix"
    val sup = graft.sources.MergeSink.suppressionKeys(spark, base)
    assert(sup.nonEmpty, "the scrub must have published a suppression list")
    val changes = Etl.cdcLog(spark, sf)
    val plan = finalPlan(changes.join(broadcast(sup.get),
      changes("key").cast("long") === sup.get("key"), "left_anti"))
    assert(plan.contains("LeftAnti") && plan.contains("Broadcast"),
      s"the suppression gate must anti-join broadcast, never shuffle " +
        s"the change batch:\n${plan.take(1500)}")
  }

  test("sim24: re-link is an equi-join of edge frames; no corpus pair space") {
    val plan = finalPlan(Similarity.sim24TombstonedConsolidate(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in sim24:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the re-link must stay an equi-join — a non-equi join here would " +
        "open the pair space the consolidate exists to avoid")
    // The degree cut must be the bounded-heap operator, not a window
    // sort over the scored candidate stream.
    assert(plan.contains("TopKPerKey"),
      s"degree cut must plan the bounded-heap operator:\n${plan.take(1500)}")
  }

  test("cur21: no corpus sort — the cut window rides the histogram; thresholds broadcast") {
    val plan = finalPlan(Curation.cur21HistogramBudget(spark, sf))
    // The whole point vs cur08: selection must NOT pay a per-source
    // corpus sort. The only Sort allowed feeds the ≤256-row histogram
    // window, which sits ABOVE the (source, bucket) aggregate — so a
    // corpus-row Window would show the scan directly under a Sort
    // with no intervening HashAggregate.
    val windowIdx = plan.indexOf("Window")
    assert(windowIdx >= 0, "the histogram cut is a window")
    assert(plan.substring(windowIdx).contains("HashAggregate"),
      s"cut window must run over the aggregated histogram, not the corpus:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      "bucket cuts must join back broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus-sized shuffle join:\n${plan.take(2000)}")
    assert(plan.contains("partial_sum"),
      "histogram must partial-aggregate map-side")
  }

  test("sim01 exact baseline is pinned once: consumers read the cached frame") {
    // sim10/sim16/sim20 all consume "the exact answer" — round 15 made
    // it ONE session artifact (Similarity.exactTopK). After sim01
    // materializes the pin, every consumer's plan must read the
    // InMemoryTableScan instead of recompiling the corpus scan + heap.
    Similarity.sim01BruteForceTopK(spark, sf).collect()
    Seq(
      "sim10" -> Similarity.sim10RecallEval(spark, sf),
      "sim16" -> Similarity.sim16NprobeSweep(spark, sf)).foreach {
      case (name, df) =>
        assert(finalPlan(df).contains("InMemoryTableScan"),
          s"$name must read the pinned exact baseline")
    }
  }

  test("cur22: no corpus rank window — the cut rides the score histogram; thresholds broadcast") {
    val plan = finalPlan(Curation.cur22HistogramSelect(spark, sf))
    // cur10 pays a per-source corpus rank sort; cur22 must not: every
    // Window sits above the (source, qi) aggregate.
    var idx = plan.indexOf("Window")
    while (idx >= 0) {
      assert(plan.substring(idx).contains("HashAggregate"),
        s"a Window ran below the histogram aggregate:\n${plan.take(2000)}")
      idx = plan.indexOf("Window", idx + 1)
    }
    assert(plan.contains("Window"), "the histogram cut is a window")
    assert(plan.contains("BroadcastHashJoin"),
      "score cuts must join back broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus-sized shuffle join:\n${plan.take(2000)}")
  }

  test("cur19: cross-split join is hash-keyed; evidence joins back broadcast") {
    // The held×train join must ride the 8-byte window hash `h` (never
    // doc_id, never strings) — the same posture as cur16's semi-join,
    // with train_id carried. The per-held evidence frames are
    // contamination-sized and join back as broadcasts.
    val plan = finalPlan(Curation.cur19LeakReport(spark, sf))
    assert(!plan.contains("SortMergeJoin [doc_id") &&
      !plan.contains("ShuffledHashJoin [doc_id") &&
      !plan.contains("SortMergeJoin [held_id") &&
      !plan.contains("ShuffledHashJoin [held_id"),
      s"cross-split join must key on h, not ids:\n${plan.take(2000)}")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "per-held evidence must join back broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sim18: post-swap assignment is pure scan-stage — zero joins in the plan") {
    // The codebook is a driver-side literal (read back from the store),
    // so assignment is the literal-argmax scan stage and the only
    // shuffle is the per-cell rollup: any Join node means the codebook
    // leaked into the plan as a frame.
    val plan = finalPlan(Similarity.sim18RetrainSwap(spark, sf))
    assert(!plan.contains("Join"),
      s"sim18 must not join — the codebook is a literal:\n${plan.take(2000)}")
  }

  test("cur06: funnel joins marks as broadcasts, never a shuffle join on doc_id") {
    // The only corpus-wide exchange the funnel is allowed is the
    // fingerprint window for keeper election; near-dup / contamination
    // marks must join as broadcasts of their (tiny) evidence sets. (A
    // hashpartitioning(doc_id) exchange DOES legitimately appear once —
    // the distinct() over the tiny near-dup drop set — so the pin is on
    // join strategy, not on exchange presence.)
    val plan = finalPlan(Curation.cur06CurationPipeline(spark, sf))
    assert(!plan.contains("SortMergeJoin [doc_id") &&
      !plan.contains("ShuffledHashJoin [doc_id"),
      s"corpus-sized doc_id shuffle join crept into the funnel:\n${plan.take(2000)}")
  }

  test("sim06: probe-cell filter prunes buckets at the file level") {
    val plan = finalPlan(Similarity.sim06BucketedIvf(spark, sf))
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, "bucketed scan must report SelectedBucketsCount")
    val (selected, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(selected < total,
      s"probe filter must skip non-probed buckets ($selected of $total)")
  }

  test("etl13: bucketed tables join without shuffling the join keys") {
    val df = Etl.etl13BucketedJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Bucket layout means the join key columns are never exchanged —
    // the join is either bucket-local sort-merge or (if AQE finds one
    // side small) broadcast; the only shuffles left belong to the
    // aggregation/sort above the join.
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"join keys must not be re-shuffled:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("sim08: approx scoring prunes map-side before the top-k shuffle") {
    val plan = finalPlan(Similarity.sim08PqAnn(spark, sf))
    // The partial stage must sit below the exchange: the shuffle then
    // carries at most partitions×queries×PqRefine rows, never the full
    // reconstruction-scored corpus stream.
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iPartial >= 0, s"expected a partial top-k stage in:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
    val iExchange = plan.lastIndexOf("Exchange", iPartial)
    assert(iExchange >= 0 && iExchange < iPartial,
      "partial stage must run below the top-k shuffle")
  }

  test("dedup08: span df flows through hash keys, never a string shuffle") {
    val plan = finalPlan(Dedup.dedup08Paragraph(spark, sf))
    // Every exchange below the rollup is keyed on the 8-byte xxhash64
    // (h) or doc_id — the span STRING must not appear in any
    // partitioning key.
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    val keyRef = "([A-Za-z_][A-Za-z0-9_]*)#\\d+".r
    exchanges.foreach { e =>
      val keys = keyRef.findAllMatchIn(
        e.substring(e.indexOf("hashpartitioning"))).map(_.group(1)).toSet
      assert(keys.subsetOf(Set("h", "doc_id")),
        s"unexpected shuffle keys $keys (expected only h/doc_id): $e")
    }
  }

  test("sim09: final assignment is scan-stage (no join, no cartesian)") {
    val plan = finalPlan(Similarity.sim09Kmeans(spark, sf))
    // Assignment is an argmin over LITERAL centroids — any Join here
    // means the corpus got expanded against the codebook again.
    assert(!plan.contains("Join"), s"assignment must not join:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("etl22: date filter is pushed to the clustered parquet scan") {
    val plan = finalPlan(Etl.etl22ClusteredLayout(spark, sf))
    // The plan's toString elides long PushedFilters lists with "…", so
    // assert on the lower bound only (the upper bound is the elided tail).
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)") &&
      plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date bounds must reach the scan:\n${plan.take(2000)}")
  }

  test("text22: the encoded vocab joins broadcast; no corpus-side shuffle join") {
    val plan = finalPlan(TextAnalysis.text22UnigramEncode(spark, sf))
    // The model applies to the VOCAB (one HOF projection over distinct
    // words); the corpus word stream must meet it by BROADCAST — a
    // shuffle join here would move the corpus to meet a ~70-row frame.
    assert(plan.contains("BroadcastHashJoin"),
      s"the encoded vocab must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no corpus shuffle join in the encode:\n${plan.take(1500)}")
  }

  test("etl32: both axis predicates are pushed to the Z-ordered parquet scan") {
    val plan = finalPlan(Etl.etl32ZorderLayout(spark, sf))
    // Pushdown on BOTH dimensions is what turns the Z-layout's file/
    // row-group min-max bands into actual pruning at scan time — AND
    // on both axes (round-19 self-review: an || here would let one
    // axis's pushdown silently regress behind the other's). The
    // IsNotNull entries lead the PushedFilters list, so they survive
    // the toString elision the bound entries may not (etl22's caveat).
    assert(plan.contains("IsNotNull(o_orderdate)") &&
      plan.contains("IsNotNull(o_custkey)"),
      s"both axes must reach the scan:\n${plan.take(2000)}")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date bounds must reach the scan:\n${plan.take(2000)}")
  }

  test("sim11: MMR adds no exchange past the top-k shuffle") {
    val plan = finalPlan(Similarity.sim11MmrDiversify(spark, sf))
    assert(plan.contains("TopKPerKeyPartial"),
      "candidate retrieval must prune map-side")
    assert(plan.contains("mmr_select"), "selection must be the native expression")
    // One q_id hash shuffle (top-k final) + the presentation range sort:
    // the collect_list aggregate must REUSE the top-k partitioning and
    // the greedy loop must add nothing. Count only the final plan —
    // the AQE toString repeats everything under "== Initial Plan ==".
    val finalSection = plan.split("== Initial Plan ==").head
    val hashEx = finalSection.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"collect_list must reuse the top-k partitioning, " +
      s"found $hashEx hash exchanges:\n${plan.take(2000)}")
  }

  test("q33: correlated subqueries decorrelate to joins (no per-row subquery)") {
    val plan = finalPlan(Relational.q33CorrelatedSubquery(spark, sf))
    assert(plan.contains("LeftSemi"),
      s"EXISTS must decorrelate to a left-semi join:\n${plan.take(2000)}")
    assert(plan.contains("LeftOuter"),
      "the correlated scalar count must decorrelate to aggregate + left outer join")
    assert(!plan.contains("Subquery"),
      "no per-row subquery execution may survive optimization")
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val plan = finalPlan(Relational.q01PricingSummary(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      "aggregate must combine map-side")
  }

  test("whole-stage codegen covers the hot scan->filter->project paths") {
    val plan = finalPlan(Relational.q02FilterProject(spark, sf))
    // Codegen'd stages print as "*(n) Operator" in the plan string.
    assert(plan.contains("*(1) Filter") || plan.contains("WholeStageCodegen"),
      "scan->filter->project must run inside whole-stage codegen")
  }

  test("dedup12: bloom gate is in the batch plan; verify join stays equi") {
    // The gate's whole point is that the codegen'd might_contain
    // predicate fronts the verification join — if it falls out of the
    // plan the batch probes the full corpus relation again.
    val gated = finalPlan(Dedup.bloomIngestDecisions(spark, sf, gated = true))
    assert(gated.contains("might_contain"),
      s"bloom gate predicate missing from the gated plan:\n${gated.take(2000)}")
    assert(!gated.contains("BroadcastNestedLoopJoin") &&
      !gated.contains("CartesianProduct"),
      "fingerprint verification must stay an equi-join")
    val ungated = finalPlan(Dedup.bloomIngestDecisions(spark, sf, gated = false))
    assert(!ungated.contains("might_contain"),
      "ungated control must not carry the gate predicate")
  }

  test("sim12: category-filtered ANN prunes map-side and joins broadcast") {
    val plan = finalPlan(Similarity.sim12FilteredAnn(spark, sf))
    assert(plan.contains("TopKPerKeyPartial"),
      "per-query top-k must prune map-side before the shuffle")
    assert(plan.contains("BroadcastHashJoin"),
      "the fixed query set must broadcast against the corpus")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sim14: SQ8 candidate ranking prunes map-side before the shuffle") {
    val plan = finalPlan(Similarity.sim14SqAnn(spark, sf))
    // Same contract as sim08: the shuffle carries at most
    // partitions×queries×refine rows of integer-scored candidates,
    // never the full corpus score stream.
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iPartial >= 0, s"expected a partial top-k stage in:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sim15: IVF-PQ refine window is rewritten to bounded-heap top-k") {
    // The exact-refine stage is written as row_number over a window;
    // the RewriteRowNumberTopK rule must replace every window sort with
    // the TopKPerKey partial/final pair — a surviving WindowExec means
    // a full per-query sort of the candidate set.
    val plan = finalPlan(Similarity.sim15IvfPq(spark, sf))
    assert(plan.contains("TopKPerKeyPartial"),
      "candidate + refine ranking must run through TopKPerKey")
    assert(!plan.contains("Window"),
      s"no WindowExec may survive the top-k rewrite:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("cur13: rank windows are partitioned per source, never global") {
    // DSIR keeps per-SOURCE quantile cuts; an unpartitioned row_number
    // would serialize the whole corpus through one task. (The only
    // unpartitioned windows in this plan are the O(256)-row bucket-model
    // totals, which carry no row_number.)
    val plan = finalPlan(Curation.cur13ImportanceWeights(spark, sf))
    plan.linesIterator.filter(_.contains("row_number()")).foreach { l =>
      assert(l.contains("windowspecdefinition(source#"),
        s"row_number window must partition by source: $l")
    }
  }

  test("q37: session windows plan MergingSessions with map-side partial aggregation") {
    val plan = finalPlan(Relational.q37SessionWindow(spark, sf))
    assert(plan.contains("MergingSessions"),
      "the native session-merge exec must carry the aggregation")
    assert(plan.contains("partial_count"),
      "per-key partial aggregation must run before the shuffle")
    assert(!plan.contains("windowspecdefinition"),
      "no window-function pass may exist — the merge exec replaces the " +
        "lag/cumsum gaps-and-islands chain")
  }

  test("mm08: frame deltas run ONE per-video window, never a global sort") {
    val plan = finalPlan(Multimodal.mm08VideoKeyframes(spark, sf))
    assert(plan.contains("windowspecdefinition(video_id"),
      "the lag window must partition by video (frames sort within " +
        "their video only)")
    assert(plan.contains("hashpartitioning(video_id"),
      "the one shuffle is the per-video co-location")
    assert(!plan.contains("CartesianProduct"))
  }

  test("text19: per-doc top-k plans the bounded-heap operator, not a window sort") {
    val plan = finalPlan(TextAnalysis.text19TfidfKeywords(spark, sf))
    assert(plan.contains("TopKPerKey"),
      "the custom bounded-heap operator must carry the per-doc top-5")
    assert(!plan.contains("Window"),
      "no window-function sort may exist — the heap replaces it")
    assert(!plan.contains("CartesianProduct"))
  }

  test("cur15: weight joins broadcast; no window sort anywhere in the plan") {
    val plan = finalPlan(Curation.cur15QualityClassifier(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the O(buckets) weight table must join as a broadcast")
    assert(!plan.contains("Window"),
      "cur15's keep cut is a scalar threshold — no rank window, no " +
        "global sort may appear at any corpus size")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sim17: per-level top-k prunes map-side; probe join broadcasts") {
    // The level explode multiplies the scored stream ×(B+1) — the
    // bounded heap must still prune each partition before the one
    // (q_id, staleness) shuffle, and the probe-rank frame (a
    // |queries|×|cells| scalar grid) must join as a broadcast, never
    // shuffle the exploded stream a second time.
    val plan = finalPlan(Similarity.sim17StalenessMonitor(spark, sf))
    assert(plan.contains("TopKPerKeyPartial"),
      "per-(query, level) top-k must prune map-side before the shuffle")
    assert(plan.contains("BroadcastHashJoin"),
      "the probe-rank grid must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("cur16: contamination probe is hash-keyed equi-joins only") {
    // The cross-split check must stay the dedup10 shape: the held-out
    // membership probe is a semi-join on the 8-byte window hash, span
    // merging a per-doc window — every exchange keyed on h/doc_id, no
    // window STRING in any partitioning, no pair-space join anywhere.
    val plan = finalPlan(Curation.cur16SubstringContamination(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"held-out probe must stay an equi-join:\n${plan.take(2000)}")
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    val keyRef = "([A-Za-z_][A-Za-z0-9_]*)#\\d+".r
    exchanges.foreach { e =>
      val keys = keyRef.findAllMatchIn(
        e.substring(e.indexOf("hashpartitioning"))).map(_.group(1)).toSet
      assert(keys.subsetOf(Set("h", "doc_id")),
        s"unexpected shuffle keys $keys (expected only h/doc_id): $e")
    }
  }

  test("cur17: span marks join as a broadcast; rewrite adds no corpus shuffle") {
    // The scrub's only corpus-wide work is the scan + codegen HOF
    // rewrite: the per-doc span frame (contaminated docs only) must
    // join back as a broadcast, never a corpus-sized doc_id shuffle
    // join (cur06's evidence-mark posture).
    val plan = finalPlan(Curation.cur17ContaminationScrub(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the span-mark join must broadcast")
    assert(!plan.contains("SortMergeJoin [doc_id") &&
      !plan.contains("ShuffledHashJoin [doc_id"),
      s"corpus-sized doc_id shuffle join crept into the scrub:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("etl28: vocabulary self-join broadcasts on the block key; ONE p_name-only fact scan") {
    // The quadratic step must run on the distinct-name vocabulary with
    // the build side broadcast (no shuffle past the ONE name aggregate)
    // and the join must carry the blk equi-key (a missing
    // equi-component would silently degrade to a nested loop over the
    // vocabulary — harmless at 64 names, a trap at a million).
    val plan = finalPlan(Etl.etl28FuzzyLink(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary join must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay a broadcast equi-join:\n${plan.take(2000)}")
    // BOTH join legs must read the PINNED vocabulary, not re-derive it
    // from parquet: an uncached self-join compiles two independent
    // fact scans (the broadcast leg's exchange never reuses the probe
    // leg's), which is the fact table scanned twice at 100 TB.
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2,
      s"both legs must read the cached vocabulary frame:\n${plan.take(2000)}")
    // Any FileScan in the printed tree sits INSIDE an InMemoryRelation
    // (the cached frame's one-time build, re-printed under each leg);
    // a FileScan directly in the join stages would be a re-derivation.
    assert(!plan.split("InMemoryRelation").head.contains("FileScan"),
      s"the join plan itself must not rescan the fact table:\n${plan.take(2000)}")
    // The single fact scan lives in the pinned frame's build plan and
    // must be pruned to p_name alone: fuzzy linkage never needs the
    // fact table's payload columns.
    val namesPlan = Etl.etl28Names(spark, sf).queryExecution.executedPlan.toString
    val scanSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(namesPlan).map(_.group(1)).toSeq
    assert(scanSchemas.nonEmpty && scanSchemas.forall(_ == "p_name:string"),
      s"part scan must be pruned to p_name, saw: $scanSchemas")
  }

  test("etl03: the global surrogate-key windows consume only the dim-sized distinct frame") {
    // etl03's dense_rank runs over Window.orderBy(event_type) — a
    // single-partition sort, accepted ONLY because its input is the
    // post-distinct dimension-value frame (dim-sized by the master-table
    // contract, matching the reference's update_master_table semantics).
    // This pin promotes that comment to a spec (round-12 directive
    // item 7): every unpartitioned window in the plan must sit above a
    // distinct aggregate on event_type, so a refactor can never silently
    // move the single-partition sort onto the raw fact/event stream.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = Etl.etl03MasterUpsert(spark, sf).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "etl03 must assign surrogates via windows")
    windows.foreach { w =>
      assert(w.partitionSpec.isEmpty,
        "the surrogate windows are globally ordered by contract")
      val distinctBelow = w.child.collect {
        case a: Aggregate if a.aggregateExpressions.forall(_.references
            .subsetOf(a.child.outputSet)) &&
          a.groupingExpressions.exists(_.references.exists(_.name == "event_type")) => a
      }
      assert(distinctBelow.nonEmpty,
        s"the global dense_rank window must consume the post-distinct " +
          s"NEW-values frame (dim-sized), not the raw events scan:\n$w")
    }
  }

  test("text16: PMI pair stream shuffles on hash keys, never on strings") {
    // Every hash exchange is keyed on the token columns p/t only — the
    // pair aggregate and the two frequency joins. The pair strings ARE
    // the deliverable (the top-20 output), so they ride exactly these
    // compact map-side-combined shuffles; nothing may shuffle on the
    // concatenated bigram or any derived wide key.
    //
    // Audit the UNCACHED plan: if text15 ran first, its pinned vocab
    // frame is plan-matched by the CacheManager into text16's unigram
    // aggregate (canonically identical subtree — a free cross-query
    // reuse), and the InMemoryTableScan's cached-plan dump would leak
    // text15's word-keyed exchange lines into this string scan.
    graft.GraftCache.release()
    val plan = finalPlan(TextAnalysis.text16PmiCollocations(spark, sf))
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    val keyRef = "([A-Za-z_][A-Za-z0-9_]*)#\\d+".r
    exchanges.foreach { e =>
      val keys = keyRef.findAllMatchIn(
        e.substring(e.indexOf("hashpartitioning"))).map(_.group(1)).toSet
      assert(keys.subsetOf(Set("p", "t")),
        s"unexpected shuffle keys $keys (expected only p/t): $e")
    }
  }

  test("dedup13: superset join keeps the (perm, h) equi-key; sig legs and verification broadcast") {
    // The sweep's only large intermediate is the rows=1 superset pair
    // frame. Its build must stay an equi-join on the (perm, h) band
    // key (losing the equi-component would degrade to a nested loop
    // over the banded signatures — harmless at 5k docs, a melt at a
    // corpus), both signature attachments and the verification probe
    // must broadcast, and verification must be the LEFT membership
    // probe against dedup03's pinned verified set — the round-14
    // rewrite that removed the superset-sized pair×shingle Jaccard
    // join (measured ~4× the rest of the operator at sf0.1).
    val plan = finalPlan(Dedup.dedup13LshSweep(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val joinLine = plan.linesIterator.find(_.contains("Join [perm"))
      .getOrElse(fail("superset join must carry the (perm, h) equi-key"))
    assert(joinLine.contains(", h#"),
      s"band key must pair perm with h: $joinLine")
    assert(plan.contains("LeftOuter"),
      "verification must be the broadcast LEFT membership probe")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      "sig legs + verification must broadcast")
  }

  test("dedup13: above the size bound the sig legs plan the shuffled da/db join, never a broadcast") {
    // The signature frame is the sweep's one corpus-sized frame, and
    // round 14 shipped it behind an unconditional broadcast hint — a
    // payload that grows with the corpus, the exact scale ceiling the
    // operator's own doc paragraph promises away. The dispatch is now
    // MEASURED (SweepSigBroadcastMaxDocs); this pins the above-bound
    // arm: both signature attachments must plan as shuffled hash joins
    // co-partitioned on da/db, with no stats-driven re-promotion of a
    // corpus-sized leg to a broadcast. The only broadcasts left are
    // the tiny verified-set probe (and whatever the banded superset's
    // own sub-plan legitimately broadcasts below the auto threshold —
    // none of which carry the 32-hash signature payload).
    val plan = finalPlan(
      Dedup.dedup13Curve(spark, sf, broadcastSigs = false))
    assert("ShuffledHashJoin \\[d[ab]".r.findAllIn(plan).size >= 2,
      s"both sig legs must attach via the shuffled da/db join:\n${plan.take(2000)}")
    // No broadcast may carry the signature payload (a0../b0.. cols).
    val bcast = plan.linesIterator.filter(_.contains("BroadcastExchange")).toSeq
    assert(!bcast.exists(l => l.contains("a0#") || l.contains("b0#")),
      s"a signature leg was re-promoted to broadcast:\n${bcast.mkString("\n")}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("text20: boilerplate marks join broadcast; rewrite adds no corpus shuffle") {
    // cur17's evidence-mark posture: the affected-docs mark frame
    // (tiny by the boilerplate threshold) joins back broadcast, and
    // the token-level rewrite is codegen HOFs in the scan stage —
    // never a corpus-sized doc_id shuffle join.
    val plan = finalPlan(TextAnalysis.text20BoilerplateScrub(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the boilerplate-marks join must broadcast")
    assert(!plan.contains("SortMergeJoin [doc_id") &&
      !plan.contains("ShuffledHashJoin [doc_id"),
      s"corpus-sized doc_id shuffle join crept into the scrub:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup14: page restriction is broadcast semi-joins; evidence composition is the full-outer pair join") {
    // The cross-modal view's own work is tiny: two broadcast LeftSemi
    // probes restricting dedup03's pairs to image-bearing pages, then
    // the full-outer algebra between two verified-evidence frames.
    // Any corpus-sized shuffle or nested loop here means a leg was
    // recomputed instead of composed.
    val plan = finalPlan(Dedup.dedup14Crossmodal(spark, sf))
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      "both page-id restrictions must be semi-joins")
    assert(plan.contains("FullOuter"),
      "evidence frames must compose via the full-outer pair join")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
