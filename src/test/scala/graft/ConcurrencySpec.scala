package graft

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** The reference's entire premise is concurrent ETL (thread pools over
  * files/chunks — reference: case_2/MultithreadETL.py:121-152). Here
  * concurrency is the scheduler's job: many queries submitted from many
  * threads against ONE session must all run and produce exactly the
  * sequential results.
  */
class ConcurrencySpec extends SparkSpec {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("82 mixed queries submitted concurrently produce sequential results") {
    // Includes dedup02/03 deliberately: they share the GraftCache
    // shingle frame, so the mix also races the registry's
    // build-once path against real consumers (dedup08 likewise races
    // its span-hash pin; dedup10 its window-hash pin; sim08/sim16 and
    // cur12 race the trained-codebook computeIfAbsent; dedup09 races
    // dedup05's cell-assignment pin AND the union-find stage; etl22
    // races TableBuild's path-based ensure; dedup11/dedup12 race the
    // corpus-index build and the Bloom-sketch computeIfAbsent + its
    // monotone conf raises; text15/text16 race the pinned vocab frame
    // and the CacheManager plan-match into text16's unigram aggregate;
    // mm06/mm07 race the corpus image-hash pin AND TableBuild's
    // staged-PNG ensure; text17/text18 race the word-frequency pin AND
    // the trained-merge computeIfAbsent while text17 drives its
    // multi-round driver loop through the racing session).
    val names = Seq(
      "q01_pricing_summary", "q05_nation_volume", "q09_sort_limit",
      "q13_case_agg", "q18_group_having", "q22_set_ops",
      "q26_topk_custom", "q29_lag_delta", "q32_grouping_sets",
      "q36_range_frame",
      "etl01_select_rename_cast", "etl05_incremental_merge",
      "etl16_cdc_apply", "etl22_clustered_layout", "etl26_backfill",
      "etl28_fuzzy_link",
      "text01_tokenize_count", "text04_fingerprint", "text10_repetition",
      "text12_entropy", "text13_bigram_surprisal", "text15_cms_topk",
      // text20 races the dedup.spanHashes pin against dedup08's build
      // of the same frame (the shared chunk-grammar cache).
      "text20_boilerplate_scrub",
      "text16_pmi_collocations", "text17_bpe_train", "text18_bpe_encode",
      "text19_tfidf_keywords",
      // text21/text22 race the unigramModelCache computeIfAbsent (a
      // multi-round driver loop through the racing session, text17's
      // shape) plus the shared bpeWords pin against text17/18's reads.
      "text21_unigram_train", "text22_unigram_encode",
      "dedup01_exact", "dedup02_ngram_jaccard", "dedup03_minhash_lsh",
      "dedup05_embedding_cosine", "dedup08_paragraph", "dedup09_semdedup",
      "dedup10_substring", "dedup11_incremental", "dedup12_bloom_ingest",
      // dedup13 races its own sweep-signature pin plus dedup03's
      // verified-pair cache (its recall denominator).
      "dedup13_lsh_sweep",
      // dedup14 races BOTH legs' pins at once: dedup03's verified set
      // and mm06's image-hash frame (plus its staged landing dir).
      "dedup14_crossmodal",
      "sim01_bruteforce_topk", "sim05_radius_search", "sim08_pq_ann",
      "sim09_kmeans", "sim12_filtered_ann", "sim14_sq_ann",
      // sim20 races sim19's graph-edge pin (sim07's build inside it)
      // while its own 4-trajectory loop checkpoints per round.
      "sim20_graph_sweep",
      // sim17 races the trained-codebook computeIfAbsent alongside
      // sim08/sim16 and drives the level-exploded TopKPerKey shape.
      "sim16_nprobe_sweep", "sim17_staleness_monitor",
      // sim18 races the trained-codebook computeIfAbsent, its own
      // sim18Published publish-once path (two k-means trainers over
      // different corpora in flight), and the CodebookStore's OCC claim.
      "sim18_retrain_swap",
      // sim19 races the graph-edge pin (which itself builds through
      // sim07's cell-assignment pin) and drives the iterative
      // beam-union plan through the racing session.
      "sim19_graph_ann",
      // sim21 races the SAME graph-edge pin from the insert axis (its
      // beam search navigates the pinned graph while sim19 reads it).
      "sim21_graph_insert",
      // sim22 races the insert-edge pin (sim21's computeIfAbsent, a
      // whole beam search inside a builder) AND the graph/cell pins
      // its sim07 candidate leg reads.
      "sim22_graph_compact",
      // sim23 races the sim19 POOL pin (a whole 4-round beam search
      // inside a builder) while sim19 itself reads the same frame.
      "sim23_graph_delete",
      "cur02_corpus_stats", "cur05_mix_weights", "cur06_curation_pipeline",
      "cur08_budget_assembly", "cur12_cluster_sample", "cur13_importance",
      // cur15 twice-invoked shape rides the mix too: it races its own
      // trainedCur15 computeIfAbsent (the multi-round driver loop runs
      // through the racing session) and the cur15Features pin.
      // cur16 races its own window-hash pin next to dedup10's separate
      // one (same derivation, different carried columns); cur17 SHARES
      // cur16's pin key, so the pair also races the registry's
      // build-once path between real consumers of one frame.
      "cur14_epoch_schedule", "cur15_quality_classifier",
      "cur16_substring_contamination", "cur17_contamination_scrub",
      // cur18 races the cur06.flagged pin (SHARED with cur06 in this
      // mix), cur16's window-hash pin (shared with cur16/cur17), and
      // dedup03's verified-pair cache — the composed build exercises
      // three registry build-once paths at once.
      "cur18_corpus_build",
      // cur19 races the cur16.windowHashes pin from the transposed axis.
      "cur19_leak_report",
      // cur20 re-runs the whole funnel pin set (cur06.flagged, cur16
      // window hashes, text20.scrub, dedup03's verified pairs) against
      // cur18's identical reads, plus a partitioned write mid-mix
      // (one instance only — cur20 must not race ITSELF, etl24's
      // documented caveat).
      "cur20_sequence_sink",
      // cur23 rides the same funnel pins plus its OWN partitioned
      // payload write mid-mix (one instance only, cur20's contract).
      "cur23_payload_shards",
      "cur21_histogram_budget", "cur22_histogram_select",
      // etl29 exercises its own MergeSink table/basePath (reset +
      // three merges + the snapshot scrub) mid-mix — one instance
      // only, etl19/etl24's documented self-race caveat. cur27 is
      // deliberately NOT in the mix: it overwrites cur23's and
      // cur26's emit dirs (its scaladoc'd same-session contract).
      "etl29_snapshot_scrub",
      // etl30 exercises its own table/basePath (reset + merges + the
      // OCC-fenced scrub + suppression publish + the gated late
      // merge) mid-mix — one instance only, same caveat family.
      // cur29 is deliberately NOT in the mix: like cur27 it
      // overwrites cur23's emit dir (its scaladoc'd contract).
      "etl30_suppression_gate",
      // sim24 rides the pinned insert-edge and kNN frames plus the
      // tombstone-filtered re-rank — read-only over the sim family's
      // shared pins.
      "sim24_tombstoned_consolidate",
      "mm01_binary_meta", "mm04_resize_stub",
      // mm09_feature_real races the mm05 staged-PNG TableBuild ensure
      // against the rest of the mm family's staging; mm08 races its own
      // TableBuild staged-frame ensure; q37 rides along as the native
      // session-window shape in the mix.
      "mm09_feature_real",
      "mm06_phash_dedup", "mm07_phash_blocked", "mm08_video_keyframes",
      // mm10 races its own staged-WAV TableBuild ensure alongside the
      // mm family's PNG staging.
      "mm10_audio_ingest",
      // mm11 races mm10's staged-WAV ensurePath while its own windowed
      // decode streams the same files.
      "mm11_audio_windows",
      "q37_session_window")
    val sequential = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).count()).toMap
    val concurrent = Await.result(
      Future.sequence(names.map(n =>
        Future(n -> SparkEntry.queries(n)(spark, sf).count()))),
      5.minutes).toMap
    assert(concurrent == sequential)
  }

  test("q33 racing itself across DIFFERENT corpora keeps each dir's rows") {
    // The per-dir temp-view suffix under test: before it, a concurrent
    // caller on another dir could swap g_q33_orders between
    // createOrReplaceTempView and spark.sql and hand back the wrong
    // corpus's rows.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val sequential = dirs.map(d =>
      d -> SparkEntry.queries("q33_correlated_subquery")(spark, d).count()).toMap
    assert(sequential.values.toSeq.distinct.size == 2,
      "the two corpora must differ for the race to be observable")
    val concurrent = Await.result(
      Future.sequence((1 to 4).flatMap(_ => dirs).map(d =>
        Future(d -> SparkEntry.queries("q33_correlated_subquery")(spark, d).count()))),
      5.minutes)
    concurrent.foreach { case (d, n) =>
      assert(n == sequential(d), s"q33 on $d returned another corpus's rows")
    }
  }

  test("Derby ops racing across DIFFERENT dirs keep each dir's database intact") {
    // etl24/etl25 document a self-race caveat (each drops + rewrites
    // its own tables), but callers on DIFFERENT corpora hit DIFFERENT
    // embedded databases (db_<dir-suffix>) and must be fully isolated —
    // this pins that one dir's drop/rewrite can never truncate or
    // contaminate the other's. One future per (op, dir): the op never
    // races ITSELF, exactly the supported contract.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val names = Seq("etl24_jdbc_roundtrip", "etl25_jdbc_merge")
    val sequential = (for (d <- dirs; n <- names) yield (n, d) ->
      SparkEntry.queries(n)(spark, d).collect().map(_.toSeq).toSeq).toMap
    names.foreach { n =>
      assert(dirs.map(d => sequential((n, d))).distinct.size == 2,
        s"$n must differ across corpora for contamination to be observable")
    }
    val concurrent = Await.result(
      Future.sequence(for (d <- dirs; n <- names) yield
        Future((n, d) -> SparkEntry.queries(n)(spark, d)
          .collect().map(_.toSeq).toSeq)),
      5.minutes)
    concurrent.foreach { case (key, rows) =>
      assert(rows == sequential(key), s"$key served another dir's database")
    }
  }

  test("etl27 VACUUM cycles racing across DIFFERENT dirs stay isolated") {
    // etl27, like etl19/etl23, rebuilds its own per-dir table+snapshot
    // root (reset + 3 merges + expire), so it never races ITSELF; two
    // callers on DIFFERENT corpora use different tables, different
    // snapshot roots, and different MergeSink locks — one dir's reset
    // or expiry must never delete the other's retained versions. One
    // future per dir, exactly the supported contract.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val sequential = dirs.map(d =>
      d -> SparkEntry.queries("etl27_retention")(spark, d)
        .collect().map(_.toSeq).toSeq).toMap
    assert(sequential.values.toSeq.distinct.size == 2,
      "the two corpora must differ for contamination to be observable")
    val concurrent = Await.result(
      Future.sequence(dirs.map(d =>
        Future(d -> SparkEntry.queries("etl27_retention")(spark, d)
          .collect().map(_.toSeq).toSeq))),
      5.minutes)
    concurrent.foreach { case (d, rows) =>
      assert(rows == sequential(d), s"etl27 on $d served another dir's snapshots")
    }
  }

  test("stream09 landings racing across dirs and batch ids stay isolated") {
    // landIngestBatch writes one batch_id=N partition per call; two
    // streams landing different corpora into different roots — and two
    // micro-batches of the SAME stream landing different partitions of
    // one root — must never mix rows. (GraftCache's per-(session, dir)
    // shingle/signature frames are the shared state under race here.)
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val base = dirs.map(d => d ->
      SparkEntry.queries("dedup11_incremental")(spark, d)
        .collect().map(_.toSeq).toSeq).toMap
    assert(base.values.toSeq.distinct.size == 2,
      "the two corpora must differ for contamination to be observable")
    val outRoot = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_stream09_race_${System.nanoTime()}"
    def arrivals(d: String) = graft.sources.Tables.documents(spark, d)
      .filter(col("doc_id") % Dedup.IngestMod === Dedup.IngestRem)
      .select("doc_id", "text")
    val landings = for ((d, i) <- dirs.zipWithIndex; b <- Seq(0L, 1L))
      yield (d, s"$outRoot/dir$i", b)
    Await.result(
      Future.sequence(landings.map { case (d, out, b) => Future {
        graft.streaming.GraftStreams.landIngestBatch(arrivals(d), d, out, b)
      }}),
      5.minutes)
    landings.foreach { case (d, out, b) =>
      val rows = spark.read.parquet(s"$out/batch_id=$b")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(rows == base(d), s"$out batch $b landed another dir's verdicts")
    }
  }

  test("stream08's merge sink racing across DIFFERENT databases stays isolated") {
    import spark.implicits._
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val urls = Seq("a", "b").map(tag =>
      s"jdbc:derby:${System.getProperty("java.io.tmpdir")}" +
        s"/graft_derby/race_${tag}_${System.nanoTime()};create=true")
    // Distinct payloads per database so cross-talk is observable.
    val batches = urls.zipWithIndex.map { case (u, i) =>
      u -> (1 to 20).map(k => (k.toLong, (k * (i + 7)).toLong))
    }
    Await.result(
      Future.sequence(batches.map { case (u, rows) =>
        Future(graft.streaming.GraftStreams.upsertBatchToJdbc(
          rows.toDF("user_id", "n"), u, driver, "g_race_master", "user_id"))
      }),
      5.minutes)
    batches.foreach { case (u, rows) =>
      val got = spark.read.format("jdbc")
        .option("url", u).option("dbtable", "g_race_master")
        .option("driver", driver).load()
        .collect()
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          r.getLong(r.fieldIndex("n")))).toSet
      assert(got == rows.toSet, s"$u lost or gained another database's rows")
    }
  }

  test("bloom cap raise stays monotone across builders on DIFFERENT dirs") {
    // bloomGate raises the session bloom caps to the measured corpus
    // size before building its sketch. The raise is check-then-set, so
    // without the lock two builders with different needs can interleave
    // such that the SMALLER need lands last and clamps the larger
    // builder's sketch (fpp blowout — the exact failure the raise
    // prevents). Pin: start both caps at 1, race dedup12 on two corpora
    // of different sizes, and the caps must end >= the LARGER need.
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val saved = Seq(itemsKey, bitsKey).map(k => k -> spark.conf.getOption(k))
    try {
      // sf0.001 vs sf0.1: documents is 500 rows at BOTH sf0.001 and
      // sf0.01, so the smaller pair would have identical needs.
      val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
      // Replicate bloomGate's sizing rule to know each builder's need.
      val needs = dirs.map { d =>
        val n = math.max(graft.sources.Tables.documents(spark, d)
          .filter(col("doc_id") % Dedup.IngestMod =!= Dedup.IngestRem)
          .count(), 1L)
        (n, org.apache.spark.util.sketch.BloomFilter
          .optimalNumOfBits(n, Dedup.BloomFpp))
      }
      assert(needs.map(_._1).distinct.size == 2,
        "corpora must differ in size for the clamp race to be observable")
      (1 to 3).foreach { _ =>
        GraftCache.release() // drop cached sketches so builders really build
        spark.conf.set(itemsKey, "1")
        spark.conf.set(bitsKey, "1")
        val rows = Await.result(
          Future.sequence(dirs.map(d =>
            Future(d -> SparkEntry.queries("dedup12_bloom_ingest")(spark, d).count()))),
          5.minutes)
        assert(rows.forall(_._2 > 0))
        assert(spark.conf.get(itemsKey).toLong >= needs.map(_._1).max,
          "a smaller builder clamped the item cap back down")
        assert(spark.conf.get(bitsKey).toLong >= needs.map(_._2).max,
          "a smaller builder clamped the bit cap back down")
      }
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      GraftCache.release() // sketches built under test-tampered caps
    }
  }

  test("the same query racing itself is consistent") {
    val runs = Await.result(
      Future.sequence((1 to 8).map(_ =>
        Future(SparkEntry.queries("q03_top_revenue")(spark, sf)
          .collect().map(_.toSeq).toSeq))),
      5.minutes)
    assert(runs.distinct.size == 1, "all racing runs must return identical rows")
  }
}
