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

  test("signature is invariant to conjunct order and comparison direction") {
    // Catalyst renders commutative conjuncts and comparison direction
    // nondeterministically (constraint-set iteration order — measured:
    // `isnotnull(x) AND (len > 5)` one run, `(5 < len) AND
    // isnotnull(x)` the next). The structural signature must not see
    // the difference, or floors would reseed at random.
    import org.apache.spark.sql.functions.lit
    // A parquet-backed frame: a LocalRelation would constant-fold the
    // whole filter away at optimize time and make the test vacuous.
    val df = graft.sources.Tables.documents(spark, sf)
    val f1 = df.filter(col("lang").isNotNull && col("n_chars") > 5)
      .select("doc_id")
    val f2 = df.filter(lit(5) < col("n_chars") && col("lang").isNotNull)
      .select("doc_id")
    assert(PlanFingerprint.of(f1) == PlanFingerprint.of(f2),
      "commuted/flipped predicates are the same plan shape")
    // Literal VALUE drift (sim08/sim15's trained floats) is invisible
    // by construction — only class structure is hashed...
    val f3 = df.filter(col("lang").isNotNull && col("n_chars") > 7)
      .select("doc_id")
    assert(PlanFingerprint.of(f1) == PlanFingerprint.of(f3))
    // ...while a genuinely different predicate KIND moves it.
    val f4 = df.filter(col("lang").isNotNull && col("n_chars") === 5)
      .select("doc_id")
    assert(PlanFingerprint.of(f1) != PlanFingerprint.of(f4))
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
    // its analyzed plan carries new LogicalRDD leaves each time —
    // exactly the surface the structural signature must be blind to
    // (RDD ids are not part of the node/expression-class shape), or
    // the graph family's floors would reseed every single round.
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

  test("write-leg notes fold into the tagged fingerprint; a write-leg-only change rotates it") {
    // Round-16 "what's wrong" #2: the emit family RETURNS its read-back
    // audit, so the plain fingerprint is blind to the write leg. The
    // tagged form must (a) equal the plain form for untagged queries —
    // no floor on the rest of the surface may move — (b) fold a noted
    // write leg in, and (c) ROTATE when only the write leg's plan
    // changes while the returned audit frame is identical.
    val df = graft.sources.Tables.documents(spark, sf).select("doc_id")
    assert(PlanFingerprint.ofTagged("spec_untagged", df) ==
      PlanFingerprint.of(df), "no note → tagged == plain")
    val legA = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source")
    PlanFingerprint.noteWriteLeg("spec_tagged", legA)
    val withA = PlanFingerprint.ofTagged("spec_tagged", df)
    assert(withA != PlanFingerprint.of(df), "a noted write leg must fold in")
    // Re-noting the identical leg is a no-op (repeated calls within a
    // session keep the fingerprint stable)...
    PlanFingerprint.noteWriteLeg("spec_tagged", legA)
    assert(PlanFingerprint.ofTagged("spec_tagged", df) == withA)
    // ...and a write-leg-only plan change rotates the fingerprint even
    // though the RETURNED frame `df` never changed — the reseed that
    // used to wait for the next clean regeneration.
    PlanFingerprint.noteWriteLeg("spec_tagged",
      legA.filter(org.apache.spark.sql.functions.col("doc_id") >= 0))
    assert(PlanFingerprint.ofTagged("spec_tagged", df) != withA,
      "an emit-leg-only change must re-key the floor")
    // The real emit family notes under its own short ids during
    // construction: cur20/cur23/cur26/cur27 all carry write legs.
    SparkEntry.queries("cur23_payload_shards")(spark, sf)
    val audited = SparkEntry.queries("cur23_payload_shards")(spark, sf)
    assert(PlanFingerprint.ofTagged("cur23", audited) !=
      PlanFingerprint.of(audited),
      "cur23 must note its payload write leg")
    assert(PlanFingerprint.ofTagged("cur23", audited) ==
      PlanFingerprint.ofTagged("cur23", audited), "tagged form is stable")
  }
}
