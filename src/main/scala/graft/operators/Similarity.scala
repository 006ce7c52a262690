package graft.operators

import graft.functions.GraftFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Similarity search sim01–sim04 over `embeddings` (SURVEY.md §2).
  *
  * sim01 is the exact baseline: broadcast the (small) query set against
  * the corpus — the corpus is scanned once, never shuffled, and top-k
  * is a per-query window. sim02 is the scale path: random-hyperplane
  * LSH turns candidate generation into an equi-join on bucket
  * signatures; recall vs sim01 is asserted in the spec.
  */
object Similarity {

  val TopK = 10
  private[graft] val NumQueryVectors = 5

  /** Embedding dimensionality of the corpus — ONE definition for every
    * site that unrolls over dimensions (sim02's hyperplanes, sim14's
    * per-dim bounds, sim17/18's drift synthesis and their generated
    * oracles), so a dimensionality change breaks loudly everywhere
    * instead of silently skewing one hardcoded site (round-13 ADVICE).
    */
  val Dims = 64

  /** sim01: exact brute-force top-k cosine neighbors for each query
    * vector. Ranking is done on the 4-dp-rounded score (with the vec id
    * as tiebreaker) so ordering is stable across engines. Top-k runs
    * through the custom [[graft.plans.TopKPerKey]] operator — a bounded
    * heap per query instead of a full per-partition window sort (at
    * corpus scale the scored stream is |corpus| × |queries| rows; only
    * k per query are ever buffered).
    */
  /** THE exact top-k baseline, pinned once per (session, dir): four
    * operators consume it (sim01's own entry, sim10's recall
    * denominator, sim16's candidate-recall truth side, sim20's sweep
    * truth side) and each used to re-run the corpus scan + bounded
    * heap per call. The frame is queries×k rows — the
    * trainedCodebook discipline applied to the baseline itself: "the
    * exact answer" is ONE artifact in a session, not four
    * recomputations that merely happen to agree.
    */
  private[graft] def exactTopK(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim01.exact:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val e = Dedup.vectors(spark, dir)
      val queries = e.filter(col("vec_id") < NumQueryVectors)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val scored = e.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      graft.plans.TopKPerKey(scored,
        keyCols = Seq("q_id"),
        orderCols = Seq(("cos", true), ("vec_id", false)),
        k = TopK)
    }

  def sim01BruteForceTopK(spark: SparkSession, dir: String): DataFrame =
    exactTopK(spark, dir)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")

  /** Random-hyperplane signature: `planes` pseudo-random hyperplanes are
    * derived per (plane, dim) from xxhash64 — deterministic, no driver-side
    * randomness, no data movement. Sign pattern per plane → one int bucket.
    *
    * The ±1 coefficient matrix is a pure function of (plane, dim), so it
    * is evaluated ONCE here on the driver (same XxHash64 expression the
    * per-row formulation used — bucket values are unchanged) and inlined
    * as signed adds: `±v[d] ± v[d+1] …` stays inside whole-stage codegen,
    * where the earlier zip_with/aggregate lambda chain ran interpreted
    * per element per row with an xxhash64 call per coefficient.
    */
  def hyperplaneBucket(v: org.apache.spark.sql.Column, planes: Int, dims: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val signs = (0 until planes).map { p =>
      // plane_p · v = Σ_d coef(p,d) * v[d], coef ∈ {-1,+1} from xxhash64(p,d)
      val dot = (0 until dims).map { d =>
        val coefPositive =
          // Seed 42 = the SQL xxhash64 default, so bucket values are
          // identical to the old per-row formulation.
          (XxHash64(Seq(Literal(p), Literal(d)), 42L).eval(null).asInstanceOf[Long] & 1L) == 0L
        // try_element_at: a shorter-than-dims vector yields a null dot
        // (→ bucket contribution 0 via the otherwise branch below),
        // matching the old zip_with behavior instead of throwing
        // INVALID_ARRAY_INDEX under ANSI mode.
        val x = try_element_at(v, lit(d + 1))
        if (coefPositive) x else -x
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    signs.reduce((a, b) => a.bitwiseOR(b))
  }

  /** sim02: LSH-bucketed approximate nearest neighbors with multi-probe.
    * Vectors hash to one of 2^planes buckets; each query probes its own
    * bucket plus every bucket at hamming distance 1 (flip one plane's
    * sign — the classic multi-probe trick: the nearest misses are
    * exactly the vectors that fell on the other side of one hyperplane).
    * The corpus join is bucket-local instead of all-pairs: with p planes
    * the scan fraction is (p+1)/2^p of the corpus, so tune p to the
    * corpus size at deploy scale. Recall vs the exact sim01 is measured
    * in the spec.
    */
  def sim02LshAnn(spark: SparkSession, dir: String): DataFrame = {
    val Planes = 4
    val e = Dedup.vectors(spark, dir)
      .withColumn("bucket", hyperplaneBucket(col("v"), Planes, Dims))
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket").as("qb"))
      .withColumn("probe", explode(array(
        col("qb") +: (0 until Planes).map(p =>
          col("qb").bitwiseXOR(lit(1L << p))): _*)))
      .select("q_id", "qv", "probe") // drop qb: the corpus side owns `bucket`
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(queries), col("bucket") === col("probe"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** sim04: exact top-k EUCLIDEAN neighbors — the metric twin of sim01
    * using the native codegen [[graft.functions.L2Distance]] expression.
    * Same scale shape: corpus scanned once against broadcast queries,
    * per-query window top-k, no corpus shuffle.
    */
  def sim04L2TopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    e.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Distance(col("qv"), col("v")), 4).as("dist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("q_id", "rk", "vec_id", "dist")
      .orderBy("q_id", "rk")
  }

  /** sim05: radius (range) search — ALL neighbors within a cosine
    * threshold, not a fixed top-k: the retrieval mode RAG-style
    * filtering and near-dup audits use when the neighbor count is
    * unknown a priori. Same scale shape as sim01 — corpus scanned once
    * against the broadcast query set, no corpus shuffle — but the
    * selection is a codegen'd filter instead of a per-key heap, so the
    * operator is a single narrow pass plus the presentation sort.
    * Thresholding happens on the 4-dp-rounded score (engine-stable).
    */
  def sim05RadiusSearch(spark: SparkSession, dir: String): DataFrame = {
    val Radius = 0.35
    val e = Dedup.vectors(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    e.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      .filter(col("cos") >= Radius)
      .orderBy("q_id", "vec_id")
  }

  /** sim03: IVF-style ANN. The coarse-quantizer codebook is K-MEANS
    * TRAINED ([[trainedCodebook]] — sim09's Lloyd protocol at
    * k=[[NumCentroids]]) and partitions the corpus into cells; each
    * vector is assigned to its nearest-centroid cell ONCE (literal
    * codebook, argmax per row, no shuffle), and a query searches only
    * its `NProbe` closest cells. Corpus scan fraction ≈
    * NProbe/NumCentroids; at 100 TB the cell-assigned corpus is written
    * bucketed by cell so a query touches only those buckets. Recall vs
    * exact sim01 — and vs the untrained seed codebook — is asserted in
    * the spec.
    */
  def sim03IvfAnn(spark: SparkSession, dir: String): DataFrame =
    ivfSearchWith(spark, dir, trainedCodebook(spark, dir))

  /** IVF search against an explicit codebook — sim03 is this at the
    * trained codebook; the spec runs it at the seed codebook to pin
    * that training does not cost recall.
    */
  private[graft] def ivfSearchWith(spark: SparkSession, dir: String,
      centroids: Array[(Long, Array[Double])]): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    searchProbedCells(ivfAssigned(e, centroids), ivfProbes(e, centroids))
  }

  val NumCentroids = 16
  val NProbe = 4

  /** Deterministic corpus sample, COLLECTED TO THE DRIVER. Two jobs:
    * the SEED for k-means training ([[trainKmeans]]'s round-0
    * centroids), and the PIVOT set for dedup05/sim07's metric cell
    * blocking — pivots only partition the space there (any codebook is
    * exact; its quality moves cost, not output), and keeping the
    * pivots training-free keeps those operators' DuckDB oracles a
    * one-CTE replay. Driver-held by design — a codebook is tiny at any
    * corpus scale (same contract as sim06's probe-cell literal list),
    * and inlining it keeps cell assignment a pure per-row computation
    * in the scan stage. The earlier formulation joined the corpus
    * against the broadcast codebook (×NumCentroids row expansion) and
    * ran a row_number window partitioned by vec_id — i.e. a full
    * corpus×centroids SHUFFLE just to take a per-row argmax.
    */
  private[operators] def ivfCentroids(e: DataFrame): Array[(Long, Array[Double])] =
    e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id"), col("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  private val trainedCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Array[Double])]]()

  /** The TRAINED coarse-quantizer codebook sim03/sim06/sim08 consume:
    * [[trainKmeans]] (sim09's engine-exact Lloyd protocol) in its
    * SPHERICAL form (assignment metric = the cosine the search ranks
    * with) at k=[[NumCentroids]], [[KmeansIters]] rounds, seeded from
    * [[ivfCentroids]]'s sample. Deterministic per dir (the protocol
    * quantizes every round), so the DuckDB oracles replay training in
    * SQL and the bucketed sim06 layout is stable across JVMs. Cached
    * per (session, dir): training is a handful of corpus scans, the
    * product is K×dims driver doubles consumed as literal arrays — the
    * same contract the seed codebook had, so swapping trained centroids
    * in changed no plan shape.
    */
  private[operators] def trainedCodebook(
      spark: SparkSession, dir: String): Array[(Long, Array[Double])] =
    trainedCodebooks.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => trainKmeans(Dedup.vectors(spark, dir), NumCentroids, KmeansIters,
          cosine = true)
        .zipWithIndex.map { case (cv, i) => i.toLong -> cv })

  /** One (cscore, -cid) struct per centroid: lexicographic array_max /
    * array_sort picks the best score with ties to the smallest cid —
    * identical ordering contract to the old `orderBy(cscore.desc, cid)`
    * window. Each cosineSim is a codegen'd scalar against a
    * constant-folded literal centroid array; no join, no HOF lambda.
    */
  private[operators] def centroidScores(v: org.apache.spark.sql.Column,
      centroids: Array[(Long, Array[Double])]): org.apache.spark.sql.Column =
    array(centroids.map { case (cid, cv) =>
      struct(
        cosineSim(v, array(cv.map(lit(_)): _*)).as("cscore"),
        lit(-cid).as("negcid"))
    }: _*)

  /** Cell assignment: per-row argmax over the literal codebook — stays
    * inside the scan stage, zero Exchange (plan-spec'd). With
    * `withAngle`, also emits the angle to the winning pivot (`radang`) —
    * free, since the argmax struct already carries the winning cosine;
    * dedup05's metric cell join consumes it. ONE definition of the
    * assignment (scoring, clamping, tie-break) serves every codebook:
    * sim03/sim06 pass the trained centroids, dedup05/sim07 the seed
    * pivots — the rule can never drift between them, only the centroid
    * arrays differ.
    */
  private[operators] def ivfAssigned(e: DataFrame,
      centroids: Array[(Long, Array[Double])],
      withAngle: Boolean = false): DataFrame = {
    val best = array_max(centroidScores(col("v"), centroids))
    val base = Seq(col("vec_id"), col("v"),
      (-best.getField("negcid")).as("cell"))
    val cols =
      if (withAngle)
        base :+ acos(greatest(lit(-1.0), least(lit(1.0),
          best.getField("cscore")))).as("radang")
      else base
    e.select(cols: _*)
  }

  /** Each query's NProbe nearest cells — per-row sort of the literal
    * codebook scores, then explode; no join, no window.
    */
  private[operators] def ivfProbes(e: DataFrame,
      centroids: Array[(Long, Array[Double])]): DataFrame = {
    val top = slice(reverse(array_sort(centroidScores(col("v"), centroids))),
      1, NProbe)
    e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(top).as("pc"))
      .select(col("q_id"), col("qv"), (-col("pc.negcid")).as("probe_cell"))
  }

  /** Probe-cell equi-join + per-query top-k (shared by sim03/sim06). */
  private def searchProbedCells(assigned: DataFrame, probes: DataFrame): DataFrame = {
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), col("cell") === col("probe_cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= TopK)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** Assign an arriving `(vec_id, embedding)` frame to the TRAINED
    * codebook's cells — the streaming index-maintenance entry point
    * (stream11): a micro-batch flows through the SAME literal-argmax
    * scan stage sim03/sim06's build uses (one definition of the
    * assignment rule, so streamed appends and the batch layout can
    * never drift). Per-row, zero shuffle, codebook is O(K×dims)
    * driver scalars.
    */
  private[graft] def ivfAssignArrivals(
      spark: SparkSession, dir: String, batch: DataFrame): DataFrame =
    ivfAssigned(
      batch.select(col("vec_id"), asDoubleArray(col("embedding")).as("v")),
      trainedCodebook(spark, dir))

  /** The corpus' cell assignment (with pivot angle), persisted through
    * [[graft.GraftCache]] and shared by every consumer in the session:
    * dedup05's metric cell join and sim07's kNN graph both branch from
    * this one frame, so the scan + |codebook|-cosine argmax runs once
    * per (session, dir).
    */
  private[operators] def cachedCellAssignment(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"dedup.cells:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val e = Dedup.vectors(spark, dir)
      ivfAssigned(e, ivfCentroids(e), withAngle = true)
    }

  val KnnK = 5

  /** sim07: k-NN GRAPH — every vector's top-k neighbors, the
    * dataset-wide structure that semantic dedup (SemDeDup-style),
    * diversity sampling, and graph-based ANN index construction all
    * start from. Contract: single-probe IVF — a vector's candidates
    * are exactly the vectors sharing its cell. That makes the graph
    * deterministic (the DuckDB oracle replays assignment + ranking
    * verbatim) and keeps the pair space sub-quadratic: per-cell work
    * is |cell|², bounded by growing the codebook with the corpus.
    *
    * Scale shape: candidates flow through ONE corpus shuffle on
    * (cell, salt). The cell key has only |codebook| distinct values —
    * unsalted, each cell's whole pair space would land on one reducer
    * (structural skew, same reasoning as dedup05) — so the probe side
    * is salted on vec_id and the build side exploded ×Salt. The
    * per-vector top-k runs in the bounded-heap [[graft.plans.TopKPerKey]]
    * operator: nothing materializes a per-cell pair list beyond each
    * vector's k-row heap frontier.
    */
  /** Pinned per (dir, session) — round 21, cur15's shared-intermediate
    * discipline: the build-cadence kNN band is read by the sim07 query,
    * by [[knnGraphEdges]]'s one-time pinned build, and by
    * [[sim22CandidateEdges]] on EVERY sim22/sim24 consolidate call —
    * the salted cell join + bounded heap was recomputed per call for a
    * frame that is corpus×K thin and session-stable.
    */
  def sim07KnnGraph(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim07.knn:$dir:${graft.GraftCache.sessionTag(spark)}") {
      sim07KnnGraphBuild(spark, dir)
    }

  private def sim07KnnGraphBuild(spark: SparkSession, dir: String): DataFrame = {
    val assigned = cachedCellAssignment(spark, dir)
    val Salt = 16
    val a = assigned.select(col("vec_id"), col("v"), col("cell"))
      .withColumn("salt", pmod(xxhash64(col("vec_id")), lit(Salt)).cast("int"))
    val b = assigned.select(col("vec_id").as("nb_id"), col("v").as("nv"),
        col("cell"))
      .withColumn("salt",
        explode(sequence(lit(0), lit(Salt - 1), lit(1)).cast("array<int>")))
      // Low-cardinality (cell × salt) key: hash join beats sort-merge
      // (the sort buys nothing), same choice as dedup05's cell join.
      .hint("shuffle_hash")
    val scored = a.join(b, Seq("cell", "salt"))
      .filter(col("nb_id") =!= col("vec_id"))
      .select(col("vec_id"), col("nb_id"),
        round(cosineSim(col("v"), col("nv")), 4).as("cos"))
    graft.plans.TopKPerKey(scored,
        keyCols = Seq("vec_id"),
        orderCols = Seq(("cos", true), ("nb_id", false)),
        k = KnnK)
      .select("vec_id", "rk", "nb_id", "cos")
      .orderBy("vec_id", "rk")
  }

  /** sim06: IVF over a BUCKETED cell layout — the at-rest half of the
    * sim03 story: the cell-assigned corpus is written `bucketBy(cell)`
    * once, and a query's probe-cell filter (a literal IN list — the
    * probe cells are a handful of scalars, collected like dedup06's
    * edge count) lets Spark's bucket pruning skip every non-probed
    * bucket AT THE FILE LEVEL: the scan's SelectedBucketsCount shows
    * the query never reads the rest of the corpus (plan-spec). Same
    * results as sim03 (spec-pinned equality).
    */
  def sim06BucketedIvf(spark: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_sim06_$suffix"
    val table = s"g_emb_cells_$suffix"
    val e = Dedup.vectors(spark, dir)
    val centroids = trainedCodebook(spark, dir)
    // One-time layout build; see TableBuild for the concurrency contract.
    TableBuild.ensure(spark, table) {
      ivfAssigned(e, centroids)
        .write.mode("overwrite")
        .bucketBy(NumCentroids, "cell")
        .option("path", base).saveAsTable(table)
    }
    val probes = ivfProbes(e, centroids)
    // Tiny driver-side scalar list: the literal predicate is what makes
    // bucket pruning (and at 100 TB, partition pruning) kick in.
    val probeCells = probes.select("probe_cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val assigned = spark.table(table)
      .filter(col("cell").isin(probeCells.map(c => c: Any): _*))
    searchProbedCells(assigned, probes)
  }

  /** sim10: index-quality EVALUATION — recall@k of the LSH index
    * (sim02) against the exact baseline (sim01), per query. Every ANN
    * deployment monitors exactly this number (indexes silently lose
    * recall as the corpus drifts from the hashing/codebook
    * assumptions); making it a first-class operator means the check
    * runs in-engine, on the full query set, with no export step.
    *
    * Scale shape: both legs are existing operators; the comparison is
    * a broadcast join of two |queries|×k frames (tiny at any corpus
    * scale — the corpus-sized work lives inside the legs, already
    * audited). The same harness evaluates any approx/exact pair by
    * swapping the legs.
    */
  def sim10RecallEval(spark: SparkSession, dir: String): DataFrame = {
    val exact = sim01BruteForceTopK(spark, dir).select("q_id", "vec_id")
    val approx = sim02LshAnn(spark, dir).select("q_id", "vec_id")
      .withColumn("hit", lit(1L))
    exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum("hit"), lit(0L)).as("n_hit"),
        round(coalesce(sum("hit"), lit(0L)) / count(lit(1)).cast("double"), 4)
          .as("recall_at_k"))
      .orderBy("q_id")
  }

  val KmeansK = 8
  val KmeansIters = 5

  /** One (dist, cid) struct per centroid: lexicographic `array_min`
    * picks the smallest distance with ties to the smallest cid. Each
    * [[graft.functions.L2Distance]] is codegen'd against a
    * constant-folded literal centroid — the same zero-join, zero-shuffle
    * assignment contract as [[centroidScores]].
    */
  private def l2CentroidScores(v: org.apache.spark.sql.Column,
      centroids: Array[Array[Double]]): org.apache.spark.sql.Column =
    array(centroids.zipWithIndex.map { case (cv, cid) =>
      struct(
        l2Distance(v, array(cv.map(lit(_)): _*)).as("dist"),
        lit(cid).as("cid"))
    }: _*)

  /** Lloyd's k-means over `e` — the shared trainer behind sim09's
    * clustering summary (k=[[KmeansK]]) and the sim03/06/08 codebook
    * ([[trainedCodebook]], k=[[NumCentroids]]).
    *
    * Spark shape per iteration: (1) cell assignment is a per-row argmin
    * over the LITERAL centroid array — scan stage, zero Exchange, the
    * sim03 posture; (2) the centroid update is one posexplode +
    * `groupBy(cell, dim)` partial-aggregated mean — the only shuffle,
    * carrying K×dims aggregate rows, not the corpus; (3) the K×dims
    * means are collected to the driver (tiny at any corpus scale — the
    * same driver-scalar contract as [[ivfCentroids]]) and QUANTIZED to
    * 6 dp, which makes the protocol engine-exact: both engines feed
    * bit-identical centroids into the next iteration, so the DuckDB
    * oracles replay the full training value-for-value. `e` is pinned
    * for the duration — each iteration reads it twice (assignment is
    * consumed by the mean aggregate), and without the pin every round
    * would rescan the source.
    *
    * Deterministic seeding from the corpus itself (k-means++ at deploy
    * changes only the seed line; the iteration protocol is unchanged).
    * An emptied cell keeps its previous centroid (deterministic on both
    * engines; cannot happen with data-seeded init + L2 ties to the
    * lowest cid, but the rule is part of the protocol).
    *
    * `cosine = true` switches the assignment metric to max-cosine
    * (ties to the lowest cid) — SPHERICAL k-means, the variant whose
    * training metric matches the cosine the IVF search ranks with. The
    * update step is unchanged: cosine ignores scale, so the per-dim
    * mean IS the spherical update (normalizing it would change nothing
    * downstream). Measured (PLANS.md): metric-matched training is worth
    * +4 recall points over L2-trained at the largest SF.
    */
  private[operators] def trainKmeans(
      e: DataFrame, k: Int, iters: Int,
      cosine: Boolean = false): Array[Array[Double]] = {
    // Released in `finally` (training materializes every result it
    // needs, so nothing lazy outlives the pin — an exception must not
    // leak it). Caveat: Spark's CacheManager keys cached data by
    // canonicalized plan, so two trainers over the SAME source racing
    // each other can evict one another's pin mid-loop; the loser
    // silently rescans the source for its remaining rounds — a perf
    // blip, never a correctness issue (ConcurrencySpec races exactly
    // this pair), and each trainer runs once per (session, dir).
    val pinned = e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Double]] = pinned.filter(col("vec_id") < k)
        .select(col("vec_id"), col("v")).collect()
        .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
      for (_ <- 1 to iters) {
        val cellCol =
          if (cosine) {
            val withIds = centroids.zipWithIndex.map { case (cv, i) => i.toLong -> cv }
            (-array_max(centroidScores(col("v"), withIds)).getField("negcid"))
              .cast("int")
          } else
            array_min(l2CentroidScores(col("v"), centroids)).getField("cid")
        val assigned = pinned.select(col("v"), cellCol.as("cell"))
        val meanRows = assigned
          .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(round(avg("x"), 6).as("m"), avg("x").as("raw"))
          .collect()
        // The 6-dp quantization is engine-exact only while no mean sits
        // ON the 1e-6 half grid: avg() of doubles is summation-order-
        // dependent, so a mean EXACTLY on (or vanishingly near) the .5
        // boundary could round differently per engine and silently
        // cascade a flipped centroid dim through every codebook
        // consumer — fail LOUDLY at train time instead. Margin
        // calibration: reordering a K-cell group's sum perturbs the
        // SCALED mean by ~n·eps·|x|·1e6 ≈ 1e-10 at thousands of
        // members, ~1e-7 only past ~1e9 members per cell — so 1e-7
        // trips exactly the indistinguishable-by-construction landings
        // (e.g. a rational mean of 6-dp inputs) while clearing honest
        // near-boundary means like the corpus's measured 1.16e-6 pass.
        meanRows.foreach { r =>
          val scaled = r.getDouble(3) * 1e6
          val dist = math.abs(scaled - math.floor(scaled) - 0.5)
          if (dist <= 1e-7)
            throw new IllegalStateException(
              s"k-means mean for cell ${r.getInt(0)} dim ${r.getInt(1)} " +
                f"(${r.getDouble(3)}%.12f) sits $dist%.2e scaled units from " +
                "the 1e-6 half grid: 6-dp quantization is not engine-stable " +
                "for this corpus/seed — change k, iters, or the quantization dp")
        }
        val means = meanRows
          .groupBy(_.getInt(0))
          .map { case (cell, rows) =>
            cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
          }
        centroids = centroids.zipWithIndex.map { case (old, cid) =>
          means.getOrElse(cid, old)
        }
      }
      centroids
    } finally pinned.unpersist(blocking = false)
  }

  /** sim09: K-MEANS corpus clustering (Lloyd's algorithm,
    * [[trainKmeans]]) — the structure pass a training-data pipeline
    * runs over embeddings for topic bucketing, cluster-balanced
    * sampling, and for TRAINING the codebooks: the SAME trainer (at
    * k=[[NumCentroids]]) produces the centroids sim03/sim06/sim08
    * actually search with ([[trainedCodebook]]).
    *
    * Output: per-cell membership and mean distance to the final
    * centroids after [[KmeansIters]] update rounds — the convergence
    * summary a pipeline thresholds on.
    */
  /** sim09's trained centroids, once per (session, dir) — the
    * [[trainedCodebook]] contract applied to sim09's own k=KmeansK
    * model: training is a corpus-level build artifact (deterministic —
    * the engine-exact protocol quantizes every round), so every caller
    * in a session reads the same centroids instead of re-running the
    * 5-round trainer per invocation; at deploy the model is persisted
    * (sim18's store) rather than retrained per query.
    */
  private val sim09Models =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  // Cleared with the registry (the sim18Versions precedent): without
  // the hook, entries accumulate for the JVM lifetime and a dir whose
  // corpus is re-staged after a cache release would be served STALE
  // centroids while every pinned frame rebuilds (round-14 ADVICE).
  graft.GraftCache.onRelease(() => sim09Models.clear())

  def sim09Kmeans(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val centroids = sim09Models.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => trainKmeans(e, KmeansK, KmeansIters))
    val best = array_min(l2CentroidScores(col("v"), centroids))
    e.select(
        best.getField("cid").as("cell"),
        round(best.getField("dist"), 4).as("d"))
      // mean of 4-dp distances = an exact rational D/(10⁴·m): micro-sum
      // then integer half-up division (the text11 presentation fix).
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("d") * 10000).cast("long")).as("md"))
      .withColumn("mean_dist",
        graft.functions.GraftFunctions.intRatio(col("md"), col("n_members"), 0) / 10000.0)
      .select(col("cell"), col("n_members"), col("mean_dist"))
      .orderBy("cell")
  }

  val MmrCand = 20
  val MmrK = 5
  val MmrLambda = 0.7

  /** sim11: MMR DIVERSIFIED re-ranking — the selection step between ANN
    * retrieval and a context window: from each query's top-[[MmrCand]]
    * cosine candidates, greedily pick [[MmrK]] maximizing
    * λ·relevance − (1−λ)·max-sim-to-already-picked (classic maximal
    * marginal relevance). Near-duplicate hits crowd out of the window;
    * the result keeps relevance while covering the neighborhood.
    *
    * Scale shape: greedy MMR is sequential in k — as joins/windows that
    * would be k chained shuffles, so it runs as ONE native-expression
    * call per query row ([[graft.functions.MmrSelect]]) over the
    * collected candidate array. The array is small by construction
    * (re-ranking only ever sees the retrieved top-k), and the candidate
    * retrieval itself is sim01's audited broadcast + bounded-heap
    * shape; the collect_list aggregate reuses TopKPerKey's q_id
    * partitioning, so past retrieval the whole operator adds zero
    * exchanges. collect_list's arrival order is nondeterministic and
    * irrelevant: the expression's argmax scans with a (score, vec_id)
    * tie-break.
    */
  def sim11MmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("v"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
    graft.plans.TopKPerKey(scored,
        keyCols = Seq("q_id"),
        orderCols = Seq(("cos", true), ("vec_id", false)),
        k = MmrCand)
      .groupBy("q_id")
      .agg(collect_list(struct(col("cos"), col("vec_id"), col("v"))).as("cands"))
      .select(col("q_id"),
        explode(mmrSelect(col("cands"), MmrK, MmrLambda)).as("s"))
      .select(col("q_id"), col("s.rk").as("rk"),
        col("s.vec_id").as("vec_id"), col("s.score").as("mmr_score"))
      .orderBy("q_id", "rk")
  }

  val PqSubspaces = 8
  val PqRefine = 160

  /** sim08: product-quantization ANN — the memory-bound half of the ANN
    * design space (IVF prunes WHERE you search; PQ compresses WHAT you
    * score). Each corpus vector is encoded per-subspace against a
    * driver-known codebook by the native [[graft.functions.PQReconstruct]]
    * expression — a pure scan-stage computation, zero shuffles, the same
    * posture as sim03's literal-codebook cell argmax. Scoring reuses the
    * codegen'd L2 against the reconstruction (disjoint subspaces make
    * that identical to the classic ADC distance-table sum), the top
    * [[PqRefine]] candidates per query flow through the bounded-heap
    * [[graft.plans.TopKPerKey]] (never a full window sort), and only
    * those candidates are re-ranked against the TRUE vectors.
    *
    * At 100 TB the reconstruction is where the win lives: a real
    * deployment stores the 8-byte PQ codes (64× smaller than the raw
    * vectors) and scans codes, touching full vectors only for the
    * refine set — the code layout here (encode → approx-score → exact
    * refine join) is exactly that read pattern. The sub-quantizer
    * codewords are per-subspace slices of the K-MEANS-TRAINED codebook
    * ([[trainedCodebook]] — the same centroids the IVF family
    * searches with). Recall vs exact sim04 is spec-asserted; the
    * DuckDB oracle replays the full protocol INCLUDING training
    * (assignment ties to the lowest codeword id, approx rank quantized
    * to 1e-6 with vec_id tiebreak).
    */
  def sim08PqAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val codebook = trainedCodebook(spark, dir).map(_._2)
    val recon = e.select(col("vec_id"),
      pqReconstruct(col("v"), codebook, PqSubspaces).as("r"))
    val queries = broadcast(e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    val approx = recon.join(queries, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Distance(col("qv"), col("r")), 6).as("ad"))
    val cand = graft.plans.TopKPerKey(approx,
        keyCols = Seq("q_id"),
        orderCols = Seq(("ad", false), ("vec_id", false)),
        k = PqRefine)
      .select("q_id", "vec_id")
    // Refine: |queries|×PqRefine rows — broadcast against the corpus so
    // the full vectors are read once, never shuffled.
    val w = Window.partitionBy("q_id").orderBy(col("l2"), col("vec_id"))
    broadcast(cand).join(e, Seq("vec_id"))
      .join(queries, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Distance(col("qv"), col("v")), 4).as("l2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("q_id", "rk", "vec_id", "l2")
      .orderBy("q_id", "rk")
  }

  /** Number of metadata categories sim12 partitions the corpus into
    * (stand-in for a tenant/collection/language column — the
    * embeddings table carries no metadata, so the category is derived
    * deterministically from the id on both engines).
    */
  val FilterCats = 4

  /** sim12: METADATA-FILTERED vector search — "top-k among the vectors
    * satisfying a predicate", the query every production vector store
    * actually serves (tenant scoping, language/collection filters,
    * time-travel cuts). Naive post-filtering (ANN first, filter after)
    * silently under-fills k whenever the predicate is selective; the
    * engine contract here is PRE-filtering at full recall: the
    * predicate restricts the scored stream BEFORE ranking.
    *
    * Spark-first shape: the filter column is a JOIN KEY, not a
    * residual predicate — queries broadcast with their own category
    * and the corpus joins on `cat = q_cat` (an equi-join, so the
    * bounded-build BNLJ whitelist stays closed), then per-query
    * bounded-heap top-k ([[graft.plans.TopKPerKey]]). At 100 TB a
    * corpus laid out partitioned/bucketed BY the filter column turns
    * the same equi-key into partition pruning: each query's scan
    * touches only its category's files — the sim06 file-level story
    * with a metadata key instead of a learned cell.
    */
  /** RRF rank-discount constant (Cormack/Clarke/Buettcher's k=60 — the
    * de-facto standard across lexical/vector fusion implementations).
    */
  val RrfK = 60

  /** sim13: HYBRID retrieval — a lexical leg and a vector leg fused by
    * reciprocal-rank fusion (RRF: score(d) = Σ_legs 1/(60 + rank_leg)),
    * the retrieval shape production RAG stacks actually run (keyword
    * recall catches what the embedding misses and vice versa; RRF needs
    * no score calibration between legs because it only consumes ranks).
    *
    * Legs: (a) lexical — distinct-token overlap between the query
    * document and each corpus document, the declarative inverted-index
    * shape (explode to (token, doc) postings, EQUI-join query tokens to
    * corpus tokens, count matches per pair); (b) vector — sim01's exact
    * cosine protocol. Both legs rank with the engine-stable tiebreak
    * (score DESC, id ASC) through the bounded-heap [[graft.plans.TopKPerKey]],
    * then a per-(query, candidate) FULL OUTER join fuses them: absent
    * legs contribute 0, so a candidate surfaced by either leg competes.
    *
    * At 100 TB: the lexical join is |query tokens| broadcast against
    * the corpus posting stream (at real scale the postings become a
    * pre-built bucketed inverted index — same equi-key); the vector leg
    * swaps to the sim03/06 IVF path unchanged, because RRF consumes
    * only ranks. The fusion join carries ≤ 2·k rows per query. The RRF
    * scores are sums of 1/(60+r) — never decimal-terminating, so the
    * 6-dp rounding sits safely off the half grid on both engines.
    */
  def sim13HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.tokens
    import graft.sources.Tables.documents

    val postings = documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val qPostings = postings.filter(col("doc_id") < NumQueryVectors)
      .select(col("doc_id").as("q_id"), col("tok"))
    val overlap = postings.join(broadcast(qPostings), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id").agg(count(lit(1)).as("overlap"))
    val lex = graft.plans.TopKPerKey(overlap,
        keyCols = Seq("q_id"),
        orderCols = Seq(("overlap", true), ("doc_id", false)),
        k = TopK)
      .select(col("q_id"), col("doc_id").as("id"), col("rk").as("rk_lex"))

    val e = Dedup.vectors(spark, dir)
    val qVecs = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cos = e.join(broadcast(qVecs), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
    val vec = graft.plans.TopKPerKey(cos,
        keyCols = Seq("q_id"),
        orderCols = Seq(("cos", true), ("vec_id", false)),
        k = TopK)
      .select(col("q_id"), col("vec_id").as("id"), col("rk").as("rk_vec"))

    val fused = lex.join(vec, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("rk_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("rk_vec")), lit(0.0)),
          6).as("rrf"))
    graft.plans.TopKPerKey(fused,
        keyCols = Seq("q_id"),
        orderCols = Seq(("rrf", true), ("id", false)),
        k = TopK)
      .select("q_id", "rk", "id", "rrf")
      .orderBy("q_id", "rk")
  }

  /** Candidates re-ranked exactly per query by sim14 (PQ's refine
    * budget — the two quantizers are deliberately comparable).
    */
  val SqRefine = 160

  /** sim14: SCALAR-quantization ANN (SQ8) — the third point of the ANN
    * design space after IVF (prune WHERE you search, sim03/06) and PQ
    * (compress WHAT you score against a trained codebook, sim08). SQ8
    * compresses each float64 dimension to one byte with per-dimension
    * affine bounds: code = min(255, ⌊(x−lo_d)/(hi_d−lo_d)·256⌋). No
    * k-means training — the "codebook" is 64 (lo, hi) pairs from one
    * corpus pass, which is why real systems reach for SQ first: 8×
    * compression, training that is a streaming min/max, and decode
    * that is a multiply-add.
    *
    * Spark shape: the per-dim bounds aggregate is posexplode →
    * groupBy(dim) — partial min/max combine map-side, so the shuffle
    * carries |partitions|×dims rows and the driver collects O(dims)
    * scalars (the same O(codebook) collect contract as the k-means
    * trainer). The bounds inline as literals, so encoding is a pure
    * scan-stage expression (zero shuffle, whole-stage codegen — the
    * sim02/sim03 posture). Approx scoring is an INTEGER sum of squared
    * code deltas (exact arithmetic — the oracle needs no float
    * protocol at all for the candidate stage), the top [[SqRefine]]
    * flow through the bounded-heap [[graft.plans.TopKPerKey]], and
    * only those are re-ranked against the true vectors (sim08's
    * refine read pattern: scan codes, touch full vectors for ≤
    * |queries|·[[SqRefine]] rows).
    *
    * At 100 TB: codes are 64 B/vector vs 512 B raw — the approx scan
    * reads 1/8th the bytes, bounds ship as 1 KB of literals with the
    * task binary, and the encode pass parallelizes embarrassingly.
    * Recall vs exact sim04 is spec-asserted; the DuckDB oracle replays
    * bounds → codes → integer candidate ranking → exact refine.
    */
  def sim14SqAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val bounds = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // (x−lo)/(hi−lo) is raw IEEE division of corpus values — bit-
    // identical in DuckDB (the dedup02/03 FILTER-bound rule); ·256 is
    // a power-of-two scale (exact), floor/least are integer-exact.
    def codes(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array((0 until Dims).map { d =>
        val (lo, hi) = bounds(d)
        if (hi == lo) lit(0L)
        else least(lit(255L),
          floor((try_element_at(v, lit(d + 1)) - lit(lo)) / lit(hi - lo) * 256))
      }: _*)
    val enc = e.select(col("vec_id"), codes(col("v")).as("c"))
    val queries = broadcast(e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        codes(col("v")).as("qc")))
    val approx = enc.join(queries, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        aggregate(zip_with(col("qc"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("ad"))
    val cand = graft.plans.TopKPerKey(approx,
        keyCols = Seq("q_id"),
        orderCols = Seq(("ad", false), ("vec_id", false)),
        k = SqRefine)
      .select("q_id", "vec_id")
    val w = Window.partitionBy("q_id").orderBy(col("l2"), col("vec_id"))
    broadcast(cand).join(e, Seq("vec_id"))
      .join(queries.select("q_id", "qv"), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Distance(col("qv"), col("v")), 4).as("l2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("q_id", "rk", "vec_id", "l2")
      .orderBy("q_id", "rk")
  }

  /** sim15: IVF-PQ composite ANN — the two index axes the family built
    * separately, composed the way production systems (FAISS `IVFPQ`)
    * actually deploy them: the coarse quantizer prunes WHERE to search
    * (sim03's trained cells, NProbe of NumCentroids scanned) and PQ
    * compresses WHAT is scored inside the surviving cells (sim08's
    * per-subspace codes), so the approximate stage reads
    * ≈ NProbe/NumCentroids of the corpus at 1/64th the bytes per row.
    * Exact refine then touches true vectors only for the top
    * [[PqRefine]] candidates per query.
    *
    * One codebook serves both roles — the spherical k-means-TRAINED
    * centroids ([[trainedCodebook]]): cells assign/probe on its cosine
    * (sim03's contract, so the cell layout is literally sim06's
    * bucketed one), sub-quantizers slice it per subspace (sim08's
    * contract). Candidate scoring and refine rank on L2 (sim08's
    * metric).
    *
    * At 100 TB this is the read pattern that matters most in the ANN
    * family: the corpus is laid out bucketed by cell (sim06's file
    * pruning selects NProbe/NumCentroids of the files), each selected
    * file is scanned as 8-byte PQ codes instead of 512-byte vectors,
    * and the full-vector reads are ≤ |queries|·[[PqRefine]] rows.
    * Recall vs exact sim04 and containment of the candidate stage in
    * the probed cells are spec-asserted; the DuckDB oracle replays
    * training → assignment → probes → PQ encode/reconstruct →
    * cell-restricted approx ranking → exact refine.
    */
  def sim15IvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val centroids = trainedCodebook(spark, dir)
    val codebook = centroids.map(_._2)
    val recon = ivfAssigned(e, centroids)
      .select(col("vec_id"), col("cell"),
        pqReconstruct(col("v"), codebook, PqSubspaces).as("r"))
    val probes = ivfProbes(e, centroids)
    val approx = recon.join(broadcast(probes), col("cell") === col("probe_cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Distance(col("qv"), col("r")), 6).as("ad"))
    val cand = graft.plans.TopKPerKey(approx,
        keyCols = Seq("q_id"),
        orderCols = Seq(("ad", false), ("vec_id", false)),
        k = PqRefine)
      .select("q_id", "vec_id")
    val queries = broadcast(e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    val w = Window.partitionBy("q_id").orderBy(col("l2"), col("vec_id"))
    broadcast(cand).join(e, Seq("vec_id"))
      .join(queries, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Distance(col("qv"), col("v")), 4).as("l2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select("q_id", "rk", "vec_id", "l2")
      .orderBy("q_id", "rk")
  }

  /** sim16's NProbe sweep values — powers of two up to the full
    * codebook. The last point probes every cell (exhaustive), so its
    * recall is 1.0 by construction and anchors the curve.
    */
  val SweepProbes: Seq[Int] = Seq(1, 2, 4, 8, 16)

  /** sim16: recall@k vs NProbe SWEEP — the tuning curve behind every
    * IVF deployment's probe-count knob (speed is ∝ NProbe/K of the
    * corpus read; this measures what each step buys in recall). sim10
    * evaluates ONE configuration; this sweeps the whole knob in a
    * single pass.
    *
    * One-pass trick: with exact rescoring, a true top-k neighbor is
    * retrieved iff its cell is probed — the only candidates scoring
    * above the true j-th neighbor are true neighbors 1..j-1, so no
    * true neighbor can be pushed out of the exact-rescored top-k.
    * Retrieved recall therefore equals CANDIDATE recall, and the whole
    * curve needs no per-NProbe search: join the exact top-k with each
    * neighbor's cell and the query's probe RANK of that cell, then
    * recall@p = fraction with rank ≤ p — a ≤ |queries|·k row frame
    * aggregated over the sweep list. At 100 TB the expensive legs are
    * the exact baseline (sim01's one corpus scan) and the assignment
    * scan (sim03's, zero shuffle); the sweep itself is free.
    *
    * The DuckDB oracle replays training → assignment → probe ranking →
    * the same hit aggregation; the spec additionally pins curve
    * monotonicity, the exhaustive anchor, and agreement with the
    * DEPLOYED sim03 operator at its production NProbe.
    */
  def sim16NprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val centroids = trainedCodebook(spark, dir)
    val exact = sim01BruteForceTopK(spark, dir).select("q_id", "vec_id")
    val assigned = ivfAssigned(e, centroids).select(col("vec_id"), col("cell"))
    // Each query's rank over ALL cells (1 = nearest centroid): per-row
    // sort of the literal codebook scores, ties to the smallest cid —
    // the ivfProbes ordering contract, un-truncated.
    val probeRank = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"),
        posexplode(reverse(array_sort(centroidScores(col("v"), centroids))))
          .as(Seq("pos", "pc")))
      .select(col("q_id"), (-col("pc.negcid")).as("cell"),
        (col("pos") + 1).cast("int").as("probe_rank"))
    exact
      .join(assigned, Seq("vec_id"))
      .join(broadcast(probeRank), Seq("q_id", "cell"))
      .select(col("q_id"), col("probe_rank"),
        explode(array(SweepProbes.map(p => lit(p)): _*)).as("nprobe"))
      .groupBy("q_id", "nprobe")
      .agg(count(lit(1)).as("n_exact"),
        sum((col("probe_rank") <= col("nprobe")).cast("long")).as("n_hit"))
      .select(col("q_id"), col("nprobe"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 4)
          .as("recall_at_k"))
      .orderBy("q_id", "nprobe")
  }

  /** sim17's staleness grid: append batches 1..[[StaleBatches]], each
    * drifting further from the training distribution. Batch b's
    * appended vector for query q blends the query toward its own
    * element-REVERSED vector at fraction t = b·[[StaleDriftStep]]:
    * same magnitude scale (so the append stays a genuine near
    * neighbor — the hard case for a stale index) while the direction
    * rotates away from anything the codebook was trained on.
    * Engine-portable by construction: the blend is two IEEE ops per
    * element on corpus doubles, replayed verbatim in the oracle.
    */
  val StaleBatches = 3
  val StaleDriftStep = 0.2
  val StaleIdBase = 1000000L

  /** sim17: INDEX-STALENESS monitor for the streamed IVF appends —
    * stream11 maintains the cell layout between re-trains, but nothing
    * measures WHEN re-training is due: appended vectors that drift
    * from the training distribution land in cells their true queries
    * do not probe, and recall decays silently. This operator reports
    * recall@k of the DEPLOYED config (trained codebook, NProbe probes)
    * over the post-append corpus at every staleness level s (= append
    * batches applied, 0..[[StaleBatches]]) against the exact baseline
    * over the same corpus — the re-train trigger a production ANN
    * deployment thresholds on.
    *
    * One-pass shape (sim16's candidate-recall identity): with exact
    * rescoring a true neighbor is retrieved iff its cell is probed, so
    * no per-level search runs — score the merged corpus ONCE against
    * the broadcast queries, explode each row into the staleness levels
    * that include it (batch..B — ×(B+1) of one corpus scan, the whole
    * evaluation), bounded-heap top-k per (query, level), then join
    * each exact neighbor's cell against the query's probe RANK and
    * aggregate hits per level. Appends are assigned by the SAME
    * literal-argmax rule as stream11's landings (one definition —
    * the monitor can never drift from the index it monitors).
    *
    * The monitor REPORTS the recall trajectory; decay is the alarm
    * condition, not a guaranteed shape — on this corpus at these drift
    * levels the curve is flat-to-rising (appends near old queries land
    * in probed cells), which is itself the answer "no re-train due".
    * The DuckDB oracle replays training → drift synthesis → per-level
    * exact ranking → assignment → probe ranking → hit aggregation; the
    * spec pins recall-monotone-nonincreasing (with strict decay) on a
    * drift-injected synthetic corpus where the cell flip is analytic —
    * when staleness DOES cost recall, the monitor provably shows it.
    */
  def sim17StalenessMonitor(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val centroids = trainedCodebook(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    stalenessCurve(e.select("vec_id", "v"), driftedAppends(queries),
        centroids, NProbe, queries, StaleBatches)
      .select(col("staleness"),
        (col("staleness").cast("long") * NumQueryVectors).as("n_appended"),
        col("n_exact"), col("n_hit"), col("recall_at_k"))
  }

  /** One drifted append per (query, batch): vec_id =
    * [[StaleIdBase]] + batch·100 + q_id, vector = the reversal blend at
    * t = batch·[[StaleDriftStep]].
    */
  private[graft] def driftedAppends(queries: DataFrame): DataFrame =
    queries
      .select(col("q_id"), col("qv"),
        explode(sequence(lit(1), lit(StaleBatches))).as("batch"))
      .withColumn("t", col("batch").cast("double") * lit(StaleDriftStep))
      .select(
        (lit(StaleIdBase) + col("batch") * 100L + col("q_id")).as("vec_id"),
        transform(sequence(lit(1), lit(Dims)),
          i => (lit(1.0) - col("t")) * element_at(col("qv"), i) +
            col("t") * element_at(col("qv"), lit(Dims + 1) - i)).as("v"),
        col("batch").cast("int").as("batch"))

  /** Core of sim17 over any (base corpus, appends, codebook, probe
    * config, query set) — separable so the spec can drive hand-built
    * centroids and analytically-placed appends.
    */
  private[graft] def stalenessCurve(
      base: DataFrame, appends: DataFrame,
      centroids: Array[(Long, Array[Double])],
      nprobe: Int, queries: DataFrame, maxBatch: Int): DataFrame = {
    val full = base.select(col("vec_id"), col("v"), lit(0).as("batch"))
      .unionByName(appends.select(col("vec_id"), col("v"),
        col("batch").cast("int").as("batch")))
    // Literal-argmax assignment (sim03/stream11's rule) with the batch
    // tag carried through — scan stage, zero Exchange.
    val best = array_max(centroidScores(col("v"), centroids))
    val assigned = full.select(col("vec_id"), col("v"), col("batch"),
      (-best.getField("negcid")).as("cell"))
    val scored = assigned.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("batch"), col("cell"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      // A vector tagged batch b exists at levels b..maxBatch — the
      // per-level corpora share one scan.
      .withColumn("staleness",
        explode(sequence(col("batch"), lit(maxBatch))))
    val topk = graft.plans.TopKPerKey(scored,
      keyCols = Seq("q_id", "staleness"),
      orderCols = Seq(("cos", true), ("vec_id", false)),
      k = TopK)
    // Each query's rank over ALL cells (sim16's un-truncated probe
    // ordering): hit ⇔ the neighbor's cell ranks ≤ nprobe.
    val probeRank = queries
      .select(col("q_id"),
        posexplode(reverse(array_sort(centroidScores(col("qv"), centroids))))
          .as(Seq("pos", "pc")))
      .select(col("q_id"), (-col("pc.negcid")).as("cell"),
        (col("pos") + 1).cast("int").as("probe_rank"))
    topk
      .join(broadcast(probeRank), Seq("q_id", "cell"))
      .groupBy("staleness")
      .agg(count(lit(1)).as("n_exact"),
        sum((col("probe_rank") <= nprobe).cast("long")).as("n_hit"))
      .withColumn("recall_at_k",
        round(col("n_hit").cast("double") / col("n_exact"), 4))
      .orderBy("staleness")
  }

  /** sim18's store base — one per (session, dir), so the version
    * sequence is deterministic in every session: v1 = the deployed
    * codebook, v2 = the retrained one. A production deployment keeps
    * ONE long-lived store and lets versions accrue; the per-session
    * base is what makes the oracled output replayable.
    */
  private[graft] def sim18Base(spark: SparkSession, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_sim18_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_${graft.GraftCache.sessionTag(spark)}"

  private val sim18Versions =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  graft.GraftCache.onRelease(() => sim18Versions.clear())

  /** The (pre-swap, post-swap) committed versions, published once per
    * (session, dir): v1 = the DEPLOYED codebook (what stream11's
    * appends were assigned under), v2 = [[trainKmeans]] re-run over
    * the post-append merged corpus. The training happens in-engine;
    * the store flip is the commit point.
    */
  private[graft] def sim18Published(spark: SparkSession, dir: String): (Long, Long) =
    sim18Versions.computeIfAbsent(
      s"$dir:${graft.GraftCache.sessionTag(spark)}",
      _ => {
        val base = sim18Base(spark, dir)
        graft.sources.CodebookStore.reset(spark, base)
        val v1 = graft.sources.CodebookStore.publish(spark, base,
          trainedCodebook(spark, dir))
        val retrained = trainKmeans(mergedCorpus(spark, dir),
            NumCentroids, KmeansIters, cosine = true)
          .zipWithIndex.map { case (cv, i) => i.toLong -> cv }
        val v2 = graft.sources.CodebookStore.publish(spark, base, retrained)
        (v1, v2)
      })

  /** The post-append corpus sim17 monitors and sim18 re-trains over:
    * the base embeddings plus every drift-synthesized append batch.
    */
  private[graft] def mergedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    e.select("vec_id", "v")
      .unionByName(driftedAppends(queries).select("vec_id", "v"))
  }

  /** sim18: codebook RE-TRAIN + versioned SWAP — act on sim17's alarm:
    * the staleness monitor measures WHEN re-training is due; this
    * operator EXECUTES it. The codebook is re-trained in-engine over
    * the post-append merged corpus (sim09's Lloyd trainer — the same
    * engine-exact protocol the original codebook came from, seeded by
    * the same vec_id < K rule, so the result IS a fresh sim03 build
    * over the merged corpus), published as a VERSIONED artifact
    * through [[graft.sources.CodebookStore]] (MergeSink's OCC claim +
    * `_SUCCESS`-commit pattern — the marker is the flip, readers never
    * see a half-written codebook), and the merged corpus — streamed
    * appends included — is re-assigned under the version read BACK
    * from the store (the round-trip is part of the contract: what the
    * operator reports is what a reader resolves, not a driver-local
    * array). The RETAINED v1 keeps every pre-swap probe result
    * reproducible (etl23's time-travel contract — spec-pinned).
    *
    * Output: the post-swap cell layout with the append mass per cell —
    * the numbers an index rebuild reports. Plan shape: the assignment
    * is the literal-argmax scan stage (zero joins anywhere — plan-
    * audited); the only shuffle is the per-cell rollup.
    */
  def sim18RetrainSwap(spark: SparkSession, dir: String): DataFrame = {
    val (_, v2) = sim18Published(spark, dir)
    val cb = graft.sources.CodebookStore.codebookAt(
      spark, sim18Base(spark, dir), v2)
    ivfAssigned(mergedCorpus(spark, dir), cb)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        sum((col("vec_id") >= StaleIdBase).cast("long")).as("n_appends"))
      .select(lit(v2).as("codebook_version"), col("cell"),
        col("n_vectors"), col("n_appends"))
      .orderBy("cell")
  }

  /** Arrival assignment under an EXPLICIT codebook — stream17's
    * decision core: the same literal-argmax rule as
    * [[ivfAssignArrivals]], with the codebook supplied by the caller
    * (resolved per micro-batch from the CodebookStore's latest
    * committed version, so a mid-stream re-train + swap re-routes new
    * appends without touching already-landed batches).
    */
  private[graft] def ivfAssignArrivalsWith(
      batch: DataFrame, centroids: Array[(Long, Array[Double])]): DataFrame =
    ivfAssigned(
      batch.select(col("vec_id"), asDoubleArray(col("embedding")).as("v")),
      centroids)

  /** sim19 search parameters: entry fan-out, beam width, expansion
    * rounds — per query the search scores ≤ EntryCount +
    * Rounds·Beam·([[KnnK]] + [[GraphRandomDegree]]) candidates, a
    * constant independent of corpus size (the graph-ANN read pattern).
    */
  val GraphEntryCount = 8
  val GraphBeam = 12
  val GraphRounds = 4

  /** Long-range edges per node — the SMALL-WORLD ingredient (NSW's
    * insight, Malkov et al.; ultimately Watts-Strogatz): sim07's kNN
    * edges are cell-LOCAL by construction, so a graph of only local
    * edges is disconnected across IVF cells and a beam search starting
    * at fixed entries can never reach most of the corpus (measured:
    * recall 0.10 with local edges only). A few deterministic
    * hash-derived "random" edges per node make the graph navigable —
    * long hops reach the right region, local kNN edges then refine —
    * and recall jumps to the usable range the spec pins.
    */
  val GraphRandomDegree = 3

  /** sim19's navigable edge frame, pinned once per (session, dir):
    * sim07's kNN edges (ONE definition with the audited build — the
    * search can never navigate a different local graph than sim07
    * emits) UNION [[GraphRandomDegree]] engine-portable hash-derived
    * long-range edges per node (`tokenHash64("src:j") mod n` — the
    * md5 contract, so the DuckDB oracle replays the exact edge set).
    */
  private[graft] def knnGraphEdges(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim19.graph:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val e = Dedup.vectors(spark, dir)
      // Corpus count as a driver scalar (the codebook-scalar contract);
      // vec_ids are dense 0..n-1, so `hash mod n` lands on a real node.
      val n = e.count()
      val local = sim07KnnGraph(spark, dir)
        .select(col("vec_id").as("src"), col("nb_id").as("dst"))
      val longRange = e.select(col("vec_id").as("src"))
        .select(col("src"),
          explode(sequence(lit(1), lit(GraphRandomDegree))).as("j"))
        .select(col("src"),
          pmod(tokenHash64(concat_ws(":", col("src"), col("j"))), lit(n))
            .as("dst"))
        .filter(col("dst") =!= col("src"))
      local.unionByName(longRange).distinct()
    }

  /** sim19: GRAPH-based ANN — beam search over the kNN graph (the
    * HNSW/DiskANN family's read pattern, single-layer): start from a
    * fixed entry set, repeatedly expand the current beam's graph
    * neighbors, score only the newly-visited candidates against the
    * query, and keep the best [[GraphBeam]] as the next beam; after
    * [[GraphRounds]] expansions the visited pool's top-[[TopK]] is the
    * answer. This closes the ANN design space the family built
    * point-by-point: LSH (sim02) and IVF (sim03/06) prune WHERE to
    * search by hashing/quantizing the query, PQ/SQ (sim08/14) compress
    * WHAT is scored — a graph index instead NAVIGATES: each hop moves
    * the candidate set toward the query through precomputed
    * neighborhoods, touching a CONSTANT number of vectors per query
    * regardless of corpus size.
    *
    * Spark shape: the graph is sim07's audited build (pinned edge
    * frame); each round is two broadcast equi-joins — the tiny beam
    * (queries×B rows) against the edge frame, then the tiny frontier
    * against the corpus to fetch vectors — plus an anti-join against
    * the visited pool so no candidate is ever scored twice. Every
    * per-round frame is O(queries·B·K); the corpus is only ever probed
    * by broadcast key lookup. At 100 TB the vector fetch becomes a
    * point-read against the bucketed layout (sim06's file-pruning
    * story — the equi-key is already there); the declarative
    * broadcast-semi-join form here is the same plan with the lookup
    * expressed as a scan-side join. Deterministic end to end: 4-dp
    * scores with vec_id tie-breaks at every beam cut, so the DuckDB
    * oracle replays all rounds via an unrolled CTE chain. Recall vs
    * exact sim01 is spec-asserted.
    */
  def sim19GraphAnn(spark: SparkSession, dir: String): DataFrame =
    sim19TopPer(sim19VisitedPool(spark, dir), TopK)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")

  private[graft] def sim19TopPer(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** The search's full visited pool — every (query, candidate, score)
    * the beam search ever evaluates. Separable so the GrowthProbe can
    * measure the constant-budget claim directly: this frame IS the
    * operator's whole read set. Pinned once per (session, dir) since
    * round 16: sim23's tombstoned search navigates THE SAME pool by
    * construction (route-through semantics — the tombstone set cannot
    * change where the beam goes, only what is returned), so the two
    * operators and the sim20 production-trajectory spec all read one
    * artifact instead of re-searching.
    */
  private[graft] def sim19VisitedPool(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim19.pool:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val e = Dedup.vectors(spark, dir)
      val queries = e.filter(col("vec_id") < NumQueryVectors)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      beamSearchPool(e.select("vec_id", "v"), knnGraphEdges(spark, dir), queries)
    }

  /** The beam search over EXPLICIT (corpus, graph, queries) frames —
    * sim19's loop verbatim, separated (round 16) so sim21's insert can
    * search with the APPEND vectors as queries and the recall spec can
    * search the post-insert AUGMENTED graph; `corpus` must carry
    * (vec_id, v) and `queries` (q_id, qv). Entry set = vec_id <
    * [[GraphEntryCount]] of the given corpus (the fixed deployed
    * entries — append ids sit far above, so an augmented corpus keeps
    * the same entry set).
    */
  private[graft] def beamSearchPool(
      corpus: DataFrame, graph: DataFrame, queries: DataFrame): DataFrame = {
    // Round 0: the fixed entry set scored against every query.
    val entry = corpus.filter(col("vec_id") < GraphEntryCount)
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
    beamSearchPoolFrom(corpus, graph, queries, entry, GraphRounds, GraphBeam)
  }

  /** The expansion loop over an EXPLICIT round-0 pool and explicit
    * (rounds, beam) — [[beamSearchPool]]'s body parameterized (round
    * 20) so sim25's layered search can seed the base-layer loop with
    * its coarse-routed per-query entries and run a SMALLER budget;
    * the fixed-entry wrapper produces the identical plan it always
    * did. `entry` must carry (q_id, vec_id, cos).
    */
  private[graft] def beamSearchPoolFrom(
      corpus: DataFrame, graph: DataFrame, queries: DataFrame,
      entry: DataFrame, rounds: Int, beam: Int): DataFrame = {
    val e = corpus
    def topPer(df: DataFrame, k: Int): DataFrame = sim19TopPer(df, k)
    // Each round's pool is MATERIALIZED with an eager localCheckpoint —
    // the pool is O(queries·budget) rows, but the next round's plan
    // references it THREE times (beam, anti-join, union), so carrying
    // the lazy lineage across rounds recomputes earlier rounds
    // combinatorially (~3^rounds — measured 14 s at sf0.1 where the
    // checkpointed form costs well under a second). Same inlining
    // lesson as the oracle's MATERIALIZED CTEs, applied engine-side;
    // localCheckpoint (not persist) because truncating the lineage is
    // the point and the blocks are freed by the context cleaner.
    // Fault-tolerance trade-off (round-14 ADVICE): localCheckpoint
    // blocks are NOT recoverable — on a real cluster an executor loss
    // mid-search fails the job (truncated lineage cannot recompute).
    // That is the right trade HERE: the pool is O(queries·budget) rows
    // and the whole search re-runs in seconds, so re-submitting beats
    // paying reliable-checkpoint I/O per round; a long-lived deployment
    // would swap in checkpoint() against the cluster FS in this loop.
    var visited = entry.localCheckpoint(true)
    for (r <- 1 to rounds) {
      val beamDf = topPer(visited, beam).select("q_id", "vec_id")
      // Frontier: the beam's unvisited graph neighbors (per query).
      val frontier = broadcast(beamDf)
        .join(graph, col("vec_id") === col("src"))
        .select(col("q_id"), col("dst"))
        .filter(col("dst") =!= col("q_id"))
        .distinct()
        .join(visited.select(col("q_id"), col("vec_id").as("dst")),
          Seq("q_id", "dst"), "left_anti")
        .select(col("q_id"), col("dst").as("vec_id"))
      val scored = broadcast(frontier)
        .join(e, Seq("vec_id"))
        .join(broadcast(queries), Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      // The final round's pool is consumed ONCE downstream — the
      // 3-references blowup only exists while a NEXT round re-reads
      // the pool, so the last materialization is pure waste (one
      // whole job at this frame's scheduling-bound size).
      visited = visited.unionByName(scored)
      if (r < rounds) visited = visited.localCheckpoint(true)
    }
    visited
  }

  /** Knob grid for sim20's graph-ANN sweep: (entries, beam)
    * trajectories, axes varied one at a time around the deployed
    * ([[GraphEntryCount]], [[GraphBeam]]) config — the ablation every
    * graph-index deployment tunes. The ROUNDS axis 0..[[GraphRounds]]
    * needs no grid entry: it is read out of each trajectory's pool via
    * the entered-round identity (below).
    */
  val GraphSweepConfigs: Seq[(Int, Int)] = Seq(
    (2, GraphBeam), (GraphEntryCount, 4), (GraphEntryCount, 8),
    (GraphEntryCount, GraphBeam))

  /** sim20: recall-vs-budget TUNING SWEEP for the graph index —
    * sim16's (NProbe) and dedup13's (bands/rows) knob-curve discipline
    * applied to sim19's knobs: entry count, beam width, and search
    * rounds. Per config: the candidate budget actually spent (pool
    * rows — the graph family's cost unit, what sim19's constant-read
    * claim is ABOUT) and recall@[[TopK]] against the exact baseline.
    *
    * The identity that makes the sweep cheap differs by axis, and the
    * difference is the honest structure of beam search:
    *  - ROUNDS nest EXACTLY within one trajectory: round r's search is
    *    a strict prefix of round r+1's (the beam is a deterministic
    *    function of the pool, and the pool only grows), so ONE search
    *    per (entries, beam) yields the whole rounds curve by tagging
    *    every pool row with the round it ENTERED — a neighbor is found
    *    at budget r iff its entered-round ≤ r (with exact rescoring,
    *    pool membership IS retrieval — sim16's candidate-recall
    *    identity).
    *  - ENTRY COUNT and BEAM WIDTH do NOT nest: a narrower beam takes
    *    a genuinely different path through the graph (its round-r beam
    *    is the top-B of ITS OWN pool, not a subset of the wider
    *    search's), so each (entries, beam) point is its own
    *    trajectory. The sweep runs all of [[GraphSweepConfigs]] in ONE
    *    4-round loop — config carried as columns, per-config beam cut
    *    as one ranked window, per-round frames still
    *    O(configs·queries·beam·degree) — so the multi-config sweep
    *    costs the same number of rounds (and localCheckpoint
    *    materializations) as a single sim19 search.
    *
    * Monotone-in-rounds is exact BY CONSTRUCTION (pools only grow);
    * cross-trajectory monotonicity is NOT asserted anywhere — beam
    * search gives no such guarantee, and the curve measuring where it
    * fails to hold is precisely the operator's value. Spec pins the
    * production-config trajectory equal to sim19's own pool row-for-
    * row, rounds-monotonicity, and the exhaustive anchor
    * (entries = corpus ⇒ recall 1.0 at round 0).
    */
  def sim20GraphSweep(spark: SparkSession, dir: String): DataFrame = {
    val nTrue = (NumQueryVectors * TopK).toLong
    val ex = sim01BruteForceTopK(spark, dir)
      .select(col("q_id"), col("vec_id"), lit(true).as("hit"))
    sim20Pools(spark, dir)
      .join(broadcast(ex), Seq("q_id", "vec_id"), "left")
      .select(col("entries"), col("beam"),
        explode(sequence(col("er"), lit(GraphRounds))).as("rounds"),
        coalesce(col("hit"), lit(false)).as("hit"))
      .groupBy("entries", "beam", "rounds")
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("hit").cast("long")).as("n_hits"))
      .withColumn("n_true", lit(nTrue))
      .withColumn("recall", intRatio(col("n_hits"), col("n_true"), 4))
      .orderBy("entries", "beam", "rounds")
  }

  /** All configured trajectories' visited pools in ONE beam-search
    * loop, every row tagged (entries, beam, er) where `er` is the
    * round the candidate entered the pool. Separable so the spec can
    * pin the production config against [[sim19VisitedPool]] and drive
    * the exhaustive anchor with entries = corpus size.
    */
  private[graft] def sim20Pools(spark: SparkSession, dir: String,
      configs: Seq[(Int, Int)] = GraphSweepConfigs): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val graph = knnGraphEdges(spark, dir)
    val maxEnt = configs.map(_._1).max
    // Entry superset scored once; each config's round-0 pool is a
    // static filter of it (no config×corpus nested loop).
    val entryScores = e.filter(col("vec_id") < maxEnt)
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
    var visited = configs.map { case (ent, b) =>
      entryScores.filter(col("vec_id") < ent)
        .select(lit(ent).as("entries"), lit(b).as("beam"),
          col("q_id"), col("vec_id"), col("cos"))
    }.reduce(_.unionByName(_))
      .withColumn("er", lit(0))
      .localCheckpoint(true)
    // The widest beam in the grid bounds every config's cut, so the
    // per-config rank can come from ONE bounded-heap TopKPerKey at
    // that literal k (round 21): the column-valued bound (`brk <=
    // beam`) kept RewriteRowNumberTopK from firing here, leaving a
    // full Exchange+Sort+Window of the whole pool per round — the
    // heap form prunes map-side to ≤ k rows per (entries, beam, q_id)
    // BEFORE the shuffle and sorts nothing. Row-identical: rank order
    // (cos desc, vec_id) is a total order per key, k ≥ every beam in
    // `configs`, and the per-row `beam` filter then applies the
    // config's own width exactly as the window form did.
    val maxBeam = configs.map(_._2).max
    for (r <- 1 to GraphRounds) {
      // Per-config beam cut: ONE ranked heap cut, the width read from
      // the row's own beam column.
      val beamDf = graft.plans.TopKPerKey(visited,
          keyCols = Seq("entries", "beam", "q_id"),
          orderCols = Seq(("cos", true), ("vec_id", false)),
          k = maxBeam)
        .filter(col("rk") <= col("beam"))
        .select("entries", "beam", "q_id", "vec_id")
      val frontier = broadcast(beamDf)
        .join(graph, col("vec_id") === col("src"))
        .select(col("entries"), col("beam"), col("q_id"), col("dst"))
        .filter(col("dst") =!= col("q_id"))
        .distinct()
        .join(visited.select(col("entries"), col("beam"), col("q_id"),
            col("vec_id").as("dst")),
          Seq("entries", "beam", "q_id", "dst"), "left_anti")
        .select(col("entries"), col("beam"), col("q_id"),
          col("dst").as("vec_id"))
      val scored = broadcast(frontier)
        .join(e, Seq("vec_id"))
        .join(broadcast(queries), Seq("q_id"))
        .select(col("entries"), col("beam"), col("q_id"), col("vec_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
        .withColumn("er", lit(r))
      // Last round: consumed once downstream — skip the checkpoint
      // (sim19's argument; one whole scheduling-bound job saved).
      visited = visited.unionByName(scored)
      if (r < GraphRounds) visited = visited.localCheckpoint(true)
    }
    visited
  }

  /** sim25's layer knobs. The coarse layer samples ~1/[[Sim25CoarseMod]]
    * of the corpus (HNSW's per-level sampling, Malkov & Yashunin 2018
    * §4, collapsed to one coarse level); [[Sim25CoarseDegree]]
    * hash-derived edges per coarse node make the layer navigable on
    * its own (the long-range construction, applied within the layer);
    * the routing runs [[Sim25CoarseEntries]] global entries through a
    * narrow ([[Sim25CoarseBeam]]) beam, and the BASE search then runs
    * a deliberately SMALLER budget than sim19's deployed config —
    * [[Sim25Beam]] < GraphBeam, [[Sim25Rounds]] < GraphRounds — which
    * is the operator's claim: per-query adaptive entries buy back more
    * recall than the budget cut costs (sim20 measured entry diversity
    * as the binding knob: 2 fixed entries cost −0.20 recall).
    */
  val Sim25CoarseMod = 8
  val Sim25CoarseDegree = 4
  val Sim25CoarseEntries = 2
  val Sim25CoarseBeam = 4
  val Sim25CoarseRounds = 3
  val Sim25Beam = 8
  val Sim25Rounds = 3

  /** The coarse layer: a deterministic md5-sampled ~1/mod of the
    * corpus, densely ranked so the layer's hash-derived edges can land
    * on real layer nodes (`crank` is the layer's own id space — the
    * rank window is one pass over a layer-sized THIN frame, an
    * index-BUILD cost on the build cadence, not a query cost).
    */
  private[graft] def sim25CoarseNodes(spark: SparkSession, dir: String): DataFrame =
    Dedup.vectors(spark, dir)
      .filter(pmod(tokenHash64(concat(lit("coarse:"),
        col("vec_id").cast("string"))), lit(Sim25CoarseMod)) === 0)
      .withColumn("crank",
        row_number().over(Window.orderBy("vec_id")).cast("long") - 1)

  /** The coarse layer's own navigable edges: [[Sim25CoarseDegree]]
    * hash-derived edges per node ONTO THE LAYER (`hash mod m` over the
    * dense crank space — sim19's long-range rule, with the layer as
    * the id space). The base graph's kNN edges are cell-local and its
    * long-range edges land mostly OFF the layer, so the layer needs
    * its own edge set to be navigable — exactly HNSW's per-level edge
    * lists.
    */
  private[graft] def sim25CoarseEdges(coarse: DataFrame): DataFrame = {
    val m = coarse.count()
    val ranks = coarse.select(col("crank"), col("vec_id").as("dst"))
    coarse.select(col("vec_id").as("src"))
      .select(col("src"),
        explode(sequence(lit(1), lit(Sim25CoarseDegree))).as("j"))
      .select(col("src"),
        pmod(tokenHash64(concat_ws(":", lit("c"), col("src"), col("j"))),
          lit(m)).as("crank"))
      .join(ranks, Seq("crank"))
      .filter(col("dst") =!= col("src"))
      .select("src", "dst")
      .distinct()
  }

  /** sim25's full visited pool (coarse routing ∪ base expansion) —
    * separable so the spec can measure the budget claim directly
    * against [[sim19VisitedPool]]'s row count. Pinned per (session,
    * dir), sim19's contract.
    */
  private[graft] def sim25Pool(spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim25.pool:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val e = Dedup.vectors(spark, dir)
      val queries = e.filter(col("vec_id") < NumQueryVectors)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val coarse = sim25CoarseNodes(spark, dir)
      val coarseVecs = coarse.select("vec_id", "v")
      // Coarse ROUTING: from the layer's fixed entries, a narrow beam
      // over the layer's own edges — every candidate it scores is a
      // real corpus vector, so the routing pool is part of the answer
      // (and of the budget), not a throwaway.
      val coarseEntry = coarse.filter(col("crank") < Sim25CoarseEntries)
        .join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(cosineSim(col("qv"), col("v")), 4).as("cos"))
      val routed = beamSearchPoolFrom(coarseVecs, sim25CoarseEdges(coarse),
        queries, coarseEntry, Sim25CoarseRounds, Sim25CoarseBeam)
      // BASE search seeded by the ENTIRE routed pool: the first base
      // beam cut takes each query's best coarse nodes — the per-query
      // adaptive entry set — and the anti-join sees every routed
      // candidate, so nothing is ever scored twice across layers.
      beamSearchPoolFrom(e.select("vec_id", "v"), knnGraphEdges(spark, dir),
        queries, routed, Sim25Rounds, Sim25Beam)
    }

  /** sim25: LAYERED (coarse-entry) graph search — the hierarchical
    * half of HNSW sim19 deliberately deferred (Malkov & Yashunin 2018
    * §4), built because sim20 MEASURED entry diversity as the binding
    * recall knob (dropping the fixed entry set from 8 to 2 cost −0.20
    * recall while halving the beam cost almost nothing): instead of
    * spending budget on MORE fixed entries, route each query through a
    * sampled COARSE LAYER first — a narrow beam over ~n/8 nodes with
    * their own hash-derived edges — and seed the base-layer search
    * with the query's own best coarse nodes. The base search then
    * affords a SMALLER budget (beam 8×3 rounds vs the deployed 12×4)
    * because it starts in the right region instead of walking there
    * from fixed entries; the spec measures BOTH halves of the claim —
    * recall ≥ sim19's 0.5 floor AND strictly fewer scored candidates
    * than sim19's pool.
    *
    * Spark shape: the coarse layer is built by the same declarative
    * grammar as the base graph (md5 sample, dense-rank id space,
    * hash-mod edges — one THIN build-cadence window); both layers run
    * the ONE expansion loop ([[beamSearchPoolFrom]] — sim19's body,
    * parameterized) so the layered search cannot expand differently
    * than the deployed one; the routed pool flows into the base loop
    * as its round-0 pool, which makes the cross-layer score-once
    * contract structural (the anti-join sees the routing's visits).
    * Deterministic end to end (4-dp scores, vec_id tie-breaks), so
    * the DuckDB oracle replays both layers' rounds as one unrolled
    * CTE chain.
    */
  def sim25LayeredAnn(spark: SparkSession, dir: String): DataFrame =
    sim19TopPer(sim25Pool(spark, dir), TopK)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")

  /** Local-edge degree for an inserted node — the graph family's
    * insert budget: the new node links to its beam search's top-K
    * (= [[KnnK]], sim07's degree, so inserted nodes look like built
    * nodes) and each of those receives the back-edge.
    */
  val GraphInsertDegree: Int = KnnK

  /** The insert rule's forward edges for an EXPLICIT arrival frame
    * (q_id, qv) — the decision core sim21 and stream24 share: one beam
    * search over the DEPLOYED graph with the arrivals as queries
    * ([[beamSearchPool]] — the same machinery, so an insert costs
    * exactly one search: ≤ entry + rounds·beam·degree scored
    * candidates per arrival, a constant in the corpus size), the
    * top-[[GraphInsertDegree]] cut as the new node's neighbors.
    * Batch-insert semantics: every arrival in a batch links against
    * the PRE-BATCH graph — arrivals never see each other, which is
    * what makes the rule deterministic, embarrassingly parallel, and
    * re-batching-invariant (the streamed twin's contract). Output:
    * (vec_id = the arrival, rk, nb_id, cos) — sim07's edge shape.
    */
  private[graft] def insertEdgesFor(
      spark: SparkSession, dir: String, arrivals: DataFrame): DataFrame = {
    val e = Dedup.vectors(spark, dir)
    sim19TopPer(
        beamSearchPool(e.select("vec_id", "v"), knnGraphEdges(spark, dir),
          arrivals),
        GraphInsertDegree)
      .select(col("q_id").as("vec_id"), col("rk"),
        col("vec_id").as("nb_id"), col("cos"))
  }

  /** stream24's per-micro-batch core: arrivals carry (vec_id,
    * embedding) — stream11's shape — and the emitted rows are the
    * insert rule's forward edges against the pinned deployed graph.
    */
  private[graft] def graphInsertArrivalEdges(
      spark: SparkSession, dir: String, batch: DataFrame): DataFrame =
    insertEdgesFor(spark, dir,
      batch.select(col("vec_id").as("q_id"),
        asDoubleArray(col("embedding")).as("qv")))

  /** The insert rule's forward edges for the sim17/sim18/sim21 append
    * batches, pinned once per (session, dir) — sim21's oracled entry,
    * its recall spec's augmented graph, and sim22's compaction all
    * read this ONE frame (the trainedCodebook discipline applied to
    * the edge deltas: "the inserts" is a single artifact, never three
    * separately-searched ones — and the pin saves two redundant beam
    * searches per session).
    */
  private[graft] def pinnedInsertEdges(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim21.insertEdges:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val e = Dedup.vectors(spark, dir)
      val queries = e.filter(col("vec_id") < NumQueryVectors)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      insertEdgesFor(spark, dir,
        driftedAppends(queries)
          .select(col("vec_id").as("q_id"), col("v").as("qv")))
    }

  /** sim21: GRAPH-ANN INSERT — the append path the graph family lacked
    * (round-15 directive #3: IVF has stream11's appends, sim17's
    * staleness monitor and sim18's retrain/swap; the graph stopped at
    * sim19/sim20 — a vector arriving today was invisible to beam
    * search until a full sim07 rebuild). The HNSW/DiskANN insert rule
    * (Malkov & Yashunin 2018, arXiv:1603.09320 §4): a new node's
    * neighbors are its OWN beam-search results over the existing
    * graph, and each neighbor receives the reciprocal back-edge — the
    * back-edges are what make the inserted node REACHABLE (forward
    * edges alone would let the new node search but never be found).
    * Arrivals are sim17/sim18's drift-synthesized append batches (the
    * shared [[driftedAppends]] law, so the ANN maintenance family
    * exercises one append story end to end: stream11 lands them in
    * IVF cells, sim17 alarms on them, sim18 retrains over them, sim21
    * wires them into the graph).
    *
    * Spark shape: ONE beam search for the whole append batch (config
    * columns were sim20's trick; here the batch IS the query set), so
    * the insert cost per arrival is the search's constant candidate
    * budget — corpus-size-independent, the property that makes
    * graph-ANN maintenance streamable at 100 TB. Deterministic end to
    * end (4-dp scores, vec_id tie-breaks), so the DuckDB oracle
    * replays the insert as sim19's unrolled round chain with the
    * drift-blend appends as the query CTE. Output: the forward edges
    * (back-edges are the transpose — pinned in the spec together with
    * the reachability recall floor).
    */
  def sim21GraphInsert(spark: SparkSession, dir: String): DataFrame =
    pinnedInsertEdges(spark, dir).orderBy("vec_id", "rk")

  /** The post-insert AUGMENTED graph: deployed edges ∪ forward insert
    * edges ∪ back-edges — what the recall spec searches to pin that
    * inserted vectors are actually REACHABLE (the whole point of the
    * back-edge half of the rule).
    */
  private[graft] def augmentedGraphEdges(
      spark: SparkSession, dir: String): DataFrame = {
    val ins = pinnedInsertEdges(spark, dir)
    knnGraphEdges(spark, dir)
      .unionByName(ins.select(col("vec_id").as("src"), col("nb_id").as("dst")))
      .unionByName(ins.select(col("nb_id").as("src"), col("vec_id").as("dst")))
      .distinct()
  }

  /** Compaction degree — the post-consolidate bound on a node's
    * cosine-ranked adjacency (= [[KnnK]], sim07's build degree:
    * compaction restores the build-time invariant the insert deltas
    * stretched).
    */
  val GraphCompactDegree: Int = KnnK

  /** sim22: GRAPH-ANN COMPACTION — fold the insert deltas back into a
    * degree-bounded graph (the DiskANN consolidate / HNSW
    * neighbor-re-selection step, run as the periodic batch maintenance
    * leg; Malkov & Yashunin 2018 §4's SELECT-NEIGHBORS applied at
    * rest). sim21's back-edges are what make an inserted node
    * reachable, but they are APPENDED degree: a popular neighbor's
    * adjacency grows by one per arrival that chose it, and after
    * enough append batches the per-hop fan-out — the constant that
    * prices sim19's whole read-budget claim — drifts upward unbounded.
    * Compaction rebuilds every node's cosine-ranked adjacency from the
    * accumulated EVIDENCE (its build edges ∪ insert forward edges ∪
    * received back-edges), keeping the best [[GraphCompactDegree]] —
    * so the node set is the merged corpus, the degree bound is
    * restored, and NOTHING rescans the corpus pair space: candidates
    * are exactly the edge lists already materialized (linear in
    * corpus + inserts at fixed degree). The long-range band
    * ([[knnGraphEdges]]'s small-world ingredient) is deliberately NOT
    * re-ranked — it exists to be cosine-BAD (that is what makes it
    * long-range) and regenerates by the same hash rule over the merged
    * id space at read time ([[compactedNavigableEdges]]).
    *
    * Spark shape: the candidate frame is a union of three
    * already-built edge frames (never a corpus join); scoring joins it
    * vec_id-equi to the merged corpus twice (co-partitionable on the
    * id at 100 TB — the rebuild's natural cost, paid per maintenance
    * cycle, not per query); the cut is the bounded-heap
    * [[graft.plans.TopKPerKey]]. A node untouched by inserts re-ranks
    * exactly its sim07 top-K and reproduces its build rows verbatim
    * (spec-pinned identity — compaction is a no-op where nothing
    * changed); an appended node keeps its [[GraphInsertDegree]] search
    * results. Deterministic end to end (4-dp scores, nb_id
    * tie-breaks), so the DuckDB oracle replays build + insert chain +
    * re-rank verbatim. Output: sim07's edge shape over the merged node
    * set — the drop-in replacement for the local band of the next
    * deployment's [[knnGraphEdges]].
    */
  /** sim22's candidate evidence — the union of three already-built
    * edge frames, the operator's WHOLE read set beyond the two vector
    * lookups (the GrowthProbe measures this frame directly: linear in
    * corpus + inserts at fixed degree, never a pair space). Pinned per
    * (dir, session) — round 21: sim24's re-link references this frame
    * THREE times in one plan (kept edges + both sides of the dead-dst
    * hop join) and sim22/sim24/the navigable-edge specs each re-read
    * it, so the union+distinct was recomputed up to three times per
    * call for a thin session-stable edge frame.
    */
  private[graft] def sim22CandidateEdges(
      spark: SparkSession, dir: String): DataFrame =
    graft.GraftCache.getOrPersist(
      s"sim22.cand:$dir:${graft.GraftCache.sessionTag(spark)}") {
      val ins = pinnedInsertEdges(spark, dir)
      sim07KnnGraph(spark, dir)
        .select(col("vec_id").as("src"), col("nb_id").as("dst"))
        .unionByName(ins.select(col("vec_id").as("src"), col("nb_id").as("dst")))
        .unionByName(ins.select(col("nb_id").as("src"), col("vec_id").as("dst")))
        .distinct()
    }

  /** The consolidate's scoring + degree cut over an EXPLICIT candidate
    * edge frame and node universe — sim22's re-rank verbatim, factored
    * (round 17) so sim24's tombstoned consolidate re-ranks through the
    * SAME machinery (two vec_id-equi joins against the node frame,
    * bounded-heap cut at [[GraphCompactDegree]]). Joining the nodes
    * also FENCES the edge frame: an edge endpoint outside `nodes`
    * (sim24 passes live nodes only) drops in the equi-join.
    */
  private[graft] def compactRerank(
      cand: DataFrame, nodes: DataFrame): DataFrame = {
    val scored = cand
      .join(nodes.select(col("vec_id").as("src"), col("v").as("sv")),
        Seq("src"))
      .join(nodes.select(col("vec_id").as("dst"), col("v").as("dv")),
        Seq("dst"))
      .select(col("src").as("vec_id"), col("dst").as("nb_id"),
        round(cosineSim(col("sv"), col("dv")), 4).as("cos"))
    graft.plans.TopKPerKey(scored,
        keyCols = Seq("vec_id"),
        orderCols = Seq(("cos", true), ("nb_id", false)),
        k = GraphCompactDegree)
      .select("vec_id", "rk", "nb_id", "cos")
      .orderBy("vec_id", "rk")
  }

  def sim22GraphCompact(spark: SparkSession, dir: String): DataFrame =
    compactRerank(sim22CandidateEdges(spark, dir), mergedCorpus(spark, dir))

  /** The navigable graph a post-compaction deployment searches:
    * sim22's compacted local band ∪ the long-range band regenerated by
    * [[knnGraphEdges]]'s hash rule over the MERGED id space — what the
    * reachability spec beam-searches to pin that compaction kept the
    * inserted nodes findable (the degree cut must not sever the
    * back-edges that reach them) at the restored per-hop budget.
    * Appended ids are not dense in 0..n−1, so `hash mod n` maps
    * through a POSITION: base ids keep pos = vec_id (they ARE dense),
    * appends take positions nBase.. in vec_id order (the append frame
    * is arrival-batch-sized, so its ranking window sorts a handful of
    * rows — never the corpus).
    */
  private[graft] def compactedNavigableEdges(
      spark: SparkSession, dir: String): DataFrame = {
    val local = sim22GraphCompact(spark, dir)
      .select(col("vec_id").as("src"), col("nb_id").as("dst"))
    val e = Dedup.vectors(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val nBase = e.count()
    val appendRanked = driftedAppends(queries).select("vec_id")
      .select(col("vec_id"),
        (lit(nBase) + row_number().over(Window.orderBy("vec_id")) - 1)
          .as("pos"))
    val ranked = e.select(col("vec_id"), col("vec_id").as("pos"))
      .unionByName(appendRanked)
    val n = nBase + appendRanked.count()
    val longRange = ranked.select(col("vec_id").as("src"),
        explode(sequence(lit(1), lit(GraphRandomDegree))).as("j"))
      .select(col("src"),
        pmod(tokenHash64(concat_ws(":", col("src"), col("j"))), lit(n))
          .as("pos"))
      .join(ranked.select(col("vec_id").as("dst"), col("pos")), Seq("pos"))
      .select("src", "dst")
      .filter(col("dst") =!= col("src"))
    local.unionByName(longRange).distinct()
  }

  /** Tombstone selection threshold (first two hex chars of a SALTED
    * md5 — ~16/256 ≈ 6% of the corpus): cur24's takedown protocol on
    * the vector side, standing in for the external delete list
    * (expired documents, opt-outs, GDPR erasure) an ANN deployment
    * receives. Salted, so the set is independent of every other hash
    * decision (entries, long-range edges, LSH).
    */
  val TombstoneHexThr = "10"

  /** The tombstone predicate over a vec_id column — deterministic and
    * engine-portable (the md5-prefix protocol).
    */
  private[graft] def tombstoneFlag(id: Column): Column =
    substring(md5(concat(lit("tombstone:"), id.cast("string"))), 1, 2) <
      TombstoneHexThr

  /** sim23: GRAPH-ANN DELETE — tombstoned search, completing the graph
    * index's CRUD story (sim19 reads, sim21 inserts, sim22 compacts,
    * this deletes): deleted vectors must stop appearing in results
    * IMMEDIATELY, but physically unlinking them between compactions
    * would tear the navigable structure apart (a deleted hub's edges
    * are how the search crosses its region — DiskANN's delete
    * semantics, Singh et al. 2021, arXiv:2105.09613 §4: tombstoned
    * nodes are routed THROUGH but never returned; the next sim22-style
    * consolidate physically drops them). So the search runs sim19's
    * navigation UNCHANGED — the tombstone set cannot change where the
    * beam goes, only what is returned — and the final top-k cut
    * re-ranks over live candidates only.
    *
    * Spark shape: the visited pool IS sim19's pinned frame (one
    * search per session serves both operators — by construction, not
    * coincidence); the delete adds one codegen'd scan-stage predicate
    * and the same bounded window cut. The route-through-vs-hard-filter
    * trade is spec-MEASURED: pre-filtering the graph and corpus to
    * live nodes (what a naive delete would do) loses recall against
    * the exact-over-live baseline, while route-through holds sim19's
    * floor. Deterministic end to end, so the DuckDB oracle replays
    * sim19's unrolled round chain with the tombstone predicate on the
    * final cut.
    */
  def sim23GraphDelete(spark: SparkSession, dir: String): DataFrame =
    sim19TopPer(
        sim19VisitedPool(spark, dir).filter(!tombstoneFlag(col("vec_id"))),
        TopK)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")

  /** sim24's candidate evidence: sim22's accumulated edge frames with
    * the tombstone set resolved PHYSICALLY — edges between live nodes
    * kept; an edge whose dst was deleted RE-LINKS through the deleted
    * node's own live out-edges (DiskANN's delete-consolidate rule,
    * Singh et al. 2021, arXiv:2105.09613 §4.2: N(p) ← N(p)\D ∪
    * N(d)\D for each deleted d ∈ N(p) — route-through made physical,
    * which is what keeps a region reachable after its hub dies);
    * edges FROM a deleted node disappear with the node. Still never a
    * pair space: the re-link is one edge⋈edge equi-join on the dead
    * endpoint — the dead side is tombstone-rate-sized at fixed degree,
    * so the frame stays linear in corpus + inserts (GrowthProbe row).
    */
  private[graft] def sim24CandidateEdges(
      spark: SparkSession, dir: String): DataFrame = {
    val edges = sim22CandidateEdges(spark, dir)
    val liveSrc = edges.filter(!tombstoneFlag(col("src")))
    val kept = liveSrc.filter(!tombstoneFlag(col("dst")))
    val relinked = liveSrc.filter(tombstoneFlag(col("dst")))
      .join(edges.select(col("src").as("dst"), col("dst").as("hop")),
        Seq("dst"))
      .filter(!tombstoneFlag(col("hop")) && col("hop") =!= col("src"))
      .select(col("src"), col("hop").as("dst"))
    kept.unionByName(relinked).distinct()
  }

  /** sim24: TOMBSTONED CONSOLIDATE — the composed maintenance run the
    * CRUD story was missing (round-16 missing #2 / the builder's named
    * deferral): sim22's compaction over sim23's tombstone set. sim23
    * deletes LOGICALLY (route-through: tombstoned nodes navigated but
    * never returned) precisely because unlinking between compactions
    * would tear the navigable structure; this operator is the
    * compaction that finally pays the physical debt — deleted nodes
    * dropped from the adjacency entirely (no row as src, never a dst),
    * every live node's cosine-ranked adjacency rebuilt from the
    * accumulated evidence with deleted neighbors REPLACED by their own
    * live out-neighbors ([[sim24CandidateEdges]]'s re-link), cut back
    * to [[GraphCompactDegree]]. The long-range band regenerates over
    * the LIVE id space at read time ([[sim24NavigableEdges]] — the
    * spec's reachability surface).
    *
    * Spark shape: candidates are already-built edge frames + ONE
    * equi-join level (never a corpus pair space); scoring and the
    * bounded-heap cut are [[compactRerank]] — sim22's machinery
    * verbatim over the LIVE node universe (the node join doubles as
    * the fence: nothing tombstoned can survive into the output).
    * Deterministic end to end, so the DuckDB oracle replays build +
    * insert chain + re-link + re-rank. The interesting law is only
    * provable on this composed run and is spec-pinned: live appends
    * whose region's hub was deleted remain REACHABLE through the
    * re-linked graph.
    */
  def sim24TombstonedConsolidate(spark: SparkSession, dir: String): DataFrame =
    compactRerank(sim24CandidateEdges(spark, dir),
      mergedCorpus(spark, dir).filter(!tombstoneFlag(col("vec_id"))))

  /** The navigable graph a post-tombstoned-consolidate deployment
    * searches: sim24's compacted live local band ∪ the long-range band
    * regenerated by [[knnGraphEdges]]'s hash rule over the LIVE id
    * space (live ids are not dense — deletion punches holes — so
    * `hash mod n` maps through a rank position, same as
    * [[compactedNavigableEdges]]'s append handling; the ranking window
    * here covers all live ids, fine at spec scale — a 100 TB
    * deployment derives positions once per consolidate with a
    * distributed rank and stores them beside the adjacency).
    */
  private[graft] def sim24NavigableEdges(
      spark: SparkSession, dir: String): DataFrame = {
    val local = sim24TombstonedConsolidate(spark, dir)
      .select(col("vec_id").as("src"), col("nb_id").as("dst"))
    val live = mergedCorpus(spark, dir)
      .filter(!tombstoneFlag(col("vec_id"))).select("vec_id")
    val ranked = live.select(col("vec_id"),
      (row_number().over(Window.orderBy("vec_id")) - 1).as("pos"))
    val n = ranked.count()
    val longRange = ranked.select(col("vec_id").as("src"),
        explode(sequence(lit(1), lit(GraphRandomDegree))).as("j"))
      .select(col("src"),
        pmod(tokenHash64(concat_ws(":", col("src"), col("j"))), lit(n))
          .as("pos"))
      .join(ranked.select(col("vec_id").as("dst"), col("pos")), Seq("pos"))
      .select("src", "dst")
      .filter(col("dst") =!= col("src"))
    local.unionByName(longRange).distinct()
  }

  def sim12FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.vectors(spark, dir)
      .withColumn("cat", col("vec_id") % FilterCats)
    val queries = e.filter(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("cat").as("q_cat"))
    val scored = e
      .join(broadcast(queries),
        col("cat") === col("q_cat") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineSim(col("qv"), col("v")), 4).as("cos"))
    graft.plans.TopKPerKey(scored,
        keyCols = Seq("q_id"),
        orderCols = Seq(("cos", true), ("vec_id", false)),
        k = TopK)
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }
}
