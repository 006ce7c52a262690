package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for the engine (SURVEY.md §4).
  *
  * Centralizes every config the operators rely on, so loaders and
  * operators stay side-effect-free:
  *   - AQE on (runtime shuffle coalescing + skew-join splitting — the
  *     100 TB posture: no hard-coded partition counts in operators).
  *   - `spark.sql.shuffle.partitions` sized to the local core count
  *     (at cluster scale AQE re-coalesces from this initial value).
  *   - UTC session timezone (oracle comparisons are tz-stable).
  *   - `spark.sql.legacy.parquet.nanosAsLong` — legacy-fixture support:
  *     `events.ts` has shipped as parquet TIMESTAMP(NANOS), which Spark's
  *     vectorized reader otherwise rejects; the flag is harmless for the
  *     current timestamp[us] data and keeps the nanos flavor loadable
  *     (see the schema-adaptive [[graft.sources.Tables.events]]).
  *   - [[GraftExtensions]] registered, so `cosine_sim` is callable from
  *     SQL as well as the Column API.
  */
object GraftSession {

  /** Configs that must also apply when someone builds their own session
    * (e.g. a test harness): applied via builder below.
    */
  val requiredConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // zstd over the default snappy for every parquet the engine writes
    // (optimization guide §6: markedly smaller at similar read speed —
    // at 100 TB that is shuffle-adjacent I/O, storage, and re-read
    // bandwidth). Parameterized (round-21 directive #3: the round-20
    // driver bench showed a 10–25% regression cluster on the emit/write
    // family that coincided with the zstd switch, so the codec and its
    // level are deployment knobs with the 100 TB default local):
    // SPARK_GRAFT_PARQUET_CODEC overrides the codec,
    // SPARK_GRAFT_PARQUET_ZSTD_LEVEL the parquet-writer zstd level
    // (parquet default 3; level 1 cuts most of the compression CPU for
    // a few % size — the right trade for session-tmpdir intermediates
    // written once and read once).
    "spark.sql.parquet.compression.codec" ->
      sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
    "spark.hadoop.parquet.compression.codec.zstd.level" ->
      sys.env.getOrElse("SPARK_GRAFT_PARQUET_ZSTD_LEVEL", "3"))

  /** Build (or get) the canonical local session. `cpus` sizes both the
    * local master threads and the initial shuffle partition count.
    */
  def build(cpus: Int, appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(GraftExtensions.inject)
    requiredConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def cpusFromEnv: Int =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
}
