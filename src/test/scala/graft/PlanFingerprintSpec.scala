package graft

import org.apache.spark.sql.functions.col

/** Pins the two load-bearing properties of the bench floor ratchet's
  * plan fingerprint: STABILITY for an unchanged plan (a fingerprint
  * that drifted run-to-run would silently reseed every floor and
  * soften the contamination gate to nothing) and SENSITIVITY to plan
  * shape (a structural change must move it, or legitimately-grown
  * plans stay suspect-prone forever — the round-15 directive's
  * failure mode).
  */
class PlanFingerprintSpec extends SparkSpec {

  test("normalize strips the run-varying surfaces: paths, ids, digits, whitespace") {
    // Two renderings of the SAME plan from different sessions: other
    // tmp dir (pid/session tags), other localCheckpoint RDD id, other
    // statistic counts — one normal form.
    val a = "Relation [doc_id#12L] parquet, " +
      "Location InMemoryFileIndex(1 paths)[file:/tmp/graft_cur20_sf0_01_ab12_p991_s1], " +
      "LogicalRDD [q_id#3L, cos#7], rdd_42"
    val b = "Relation  [doc_id#99L] parquet, " +
      "Location InMemoryFileIndex(1 paths)[file:/tmp/graft_cur20_sf0_01_ab12_p17_s6], " +
      "LogicalRDD [q_id#55L, cos#8], rdd_7781"
    assert(PlanFingerprint.normalize(a) == PlanFingerprint.normalize(b))
    // A structural difference survives normalization.
    val c = a.replace("parquet", "orc")
    assert(PlanFingerprint.normalize(a) != PlanFingerprint.normalize(c))
  }

  test("stable across rebuilds of the same query; sensitive to a plan-shape change") {
    val build = SparkEntry.queries("q01_pricing_summary")
    val fp1 = PlanFingerprint.of(build(spark, sf))
    val fp2 = PlanFingerprint.of(build(spark, sf))
    assert(fp1 == fp2, "same query, fresh frame: fingerprint must not drift")
    assert(fp1.matches("[0-9a-f]{12}"))
    // Growing the plan (an extra filter stage) must move the fingerprint
    // — the cur18-fold scenario the ratchet exists for.
    val grown = PlanFingerprint.of(
      build(spark, sf).filter(col("sum_qty") >= 0))
    assert(grown != fp1, "a plan-shape change must re-key the floor")
  }

  test("iterative localCheckpoint lineage fingerprints identically across searches") {
    // sim19's pool rebuilds fresh eager checkpoints on every call, so
    // its plan string carries new RDD ids each time — exactly the
    // digit-run surface normalize() must erase, or the graph family's
    // floors would reseed every single round.
    val build = SparkEntry.queries("sim19_graph_ann")
    val fp1 = PlanFingerprint.of(build(spark, sf))
    val fp2 = PlanFingerprint.of(build(spark, sf))
    assert(fp1 == fp2, "checkpointed lineage must not drift the fingerprint")
  }

  test("write-then-read-back operators fingerprint stably (session-tagged out dirs)") {
    // cur20 writes its emit under a (pid, session)-tagged dir and the
    // returned frame READS those files — the path is different in every
    // JVM, so path normalization is what keeps its floor alive.
    val build = SparkEntry.queries("cur20_sequence_sink")
    val fp1 = PlanFingerprint.of(build(spark, sf))
    val fp2 = PlanFingerprint.of(build(spark, sf))
    assert(fp1 == fp2)
  }
}
