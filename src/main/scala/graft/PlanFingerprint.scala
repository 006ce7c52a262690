package graft

import org.apache.spark.sql.DataFrame

/** Canonical fingerprint of a query's OPTIMIZED plan, for the bench
  * floor ratchet (round-15 directive #4): a query whose plan
  * DELIBERATELY grew (cur18 after the boilerplate fold) can never
  * raise its min-merged clean floor, so it would stay suspect-prone
  * forever. Keying each committed floor by the plan fingerprint lets
  * the gate tell "same plan, contaminated machine" (retry, keep the
  * floor) apart from "the plan changed" (reseed the floor from the
  * current clean run instead of min-merging across the change).
  *
  * The fingerprint must be STABLE across JVMs and sessions for an
  * unchanged plan — that is the whole load-bearing property, because a
  * fingerprint that drifted run-to-run would silently reseed every
  * floor each round and soften the contamination gate to nothing. Three
  * run-varying surfaces are normalized out of the canonicalized plan
  * string (Catalyst's `canonicalized` already zeroes expression ids):
  * filesystem paths (scan locations under session/pid-tagged tmp dirs),
  * all digit runs (localCheckpoint RDD ids, shuffle/statistics ids —
  * this also erases LITERAL values, a deliberate trade: the ratchet
  * targets plan SHAPE, and keeping a literal-only change on the old
  * floor errs in the gate-stays-tight direction), and whitespace.
  */
object PlanFingerprint {

  /** Normalize one plan string: strip path-like tokens, digit runs,
    * and whitespace runs. Exposed for the spec's pure cases.
    */
  private[graft] def normalize(plan: String): String = plan
    .replaceAll("(?:file:)?/[A-Za-z0-9_.\\-/=*@]+", "<path>")
    .replaceAll("\\d+", "#")
    .replaceAll("\\s+", " ")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 12-hex-char fingerprint of the frame's canonicalized optimized
    * plan. Forces analysis+optimization but never execution.
    */
  def of(df: DataFrame): String =
    md5Hex(normalize(df.queryExecution.optimizedPlan.canonicalized.toString))
      .take(12)
}
