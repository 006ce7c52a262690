package graft.operators

import graft.functions.GraftFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  private val NumQueryVectors = 5

  /** sim01: exact brute-force top-k cosine neighbors for each query
    * vector. Ranking is done on the 4-dp-rounded score (with the vec id
    * as tiebreaker) so ordering is stable across engines. Top-k runs
    * through the custom [[graft.plans.TopKPerKey]] operator — a bounded
    * heap per query instead of a full per-partition window sort (at
    * corpus scale the scored stream is |corpus| × |queries| rows; only
    * k per query are ever buffered).
    */
  def sim01BruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
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
      .select("q_id", "rk", "vec_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** Random-hyperplane signature: `planes` pseudo-random hyperplanes are
    * derived per (plane, dim) from xxhash64 — deterministic, no driver-side
    * randomness, no data movement. Sign pattern per plane → one int bucket.
    */
  def hyperplaneBucket(v: org.apache.spark.sql.Column, planes: Int, dims: Int): org.apache.spark.sql.Column = {
    // plane_p · v = Σ_d coef(p,d) * v[d], coef ∈ {-1,+1} from xxhash64(p,d)
    val signs = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(v, transform(sequence(lit(0), lit(dims - 1)),
          d => when(xxhash64(lit(p), d).bitwiseAND(1) === 0, 1.0).otherwise(-1.0)),
          (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
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
    val Dims = 64
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

  /** sim03: IVF-style ANN. A small coarse-quantizer codebook (here: a
    * deterministic sample of the corpus standing in for k-means
    * centroids — swap in real trained centroids at deploy) partitions
    * the corpus into cells; each vector is assigned to its
    * nearest-centroid cell ONCE (broadcast codebook, argmax per row, no
    * shuffle), and a query searches only its `NProbe` closest cells.
    * Corpus scan fraction ≈ NProbe/NumCentroids; at 100 TB the
    * cell-assigned corpus is written bucketed by cell so a query touches
    * only those buckets. Recall vs exact sim01 is asserted in the spec.
    */
  def sim03IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val NumCentroids = 16
    val NProbe = 4
    val e = Dedup.vectors(spark, dir)
    val centroids = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // Cell assignment: argmax over the broadcast codebook via one
    // window on (vec_id) — 16 scored rows per vector, top-1 kept.
    val scored = e.join(broadcast(centroids), lit(true))
      .select(col("vec_id"), col("v"), col("cid"),
        cosineSim(col("v"), col("cv")).as("cscore"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("cscore").desc, col("cid"))
    val assigned = scored
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("cid").as("cell"))
    // Query probes: its NProbe nearest cells.
    val probes = e.filter(col("vec_id") < NumQueryVectors)
      .join(broadcast(centroids), lit(true))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cid"),
        cosineSim(col("v"), col("cv")).as("cscore"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cscore").desc, col("cid"))))
      .filter(col("crk") <= NProbe)
      .select(col("q_id"), col("qv"), col("cid").as("probe_cell"))
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
}
