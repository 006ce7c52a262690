package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Canonical fingerprint of a query's OPTIMIZED plan, for the bench
  * floor ratchet (round-15 directive #4): a query whose plan
  * DELIBERATELY grew (cur18 after the boilerplate fold) can never
  * raise its min-merged clean floor, so it would stay suspect-prone
  * forever. Keying each committed floor by the plan fingerprint lets
  * the gate tell "same plan, contaminated machine" (retry, keep the
  * floor) apart from "the plan changed" (reseed the floor from the
  * current clean run instead of min-merging across the change).
  *
  * The fingerprint must be STABLE across JVMs, sessions, and cache
  * regimes for an unchanged plan — a fingerprint that drifted
  * run-to-run would silently reseed floors and soften the
  * contamination gate. The plan STRING is not stable enough, even
  * canonicalized and digit-normalized (both measured in round 16):
  * trained float literals drift in their low bits run-to-run
  * (sim08/sim15's PQ codebooks — partial-agg order), and Catalyst
  * renders commutative conjuncts and comparison direction
  * nondeterministically (`isnotnull(x) AND (len > 5)` one run,
  * `(5 < len) AND isnotnull(x)` the next — constraint-set iteration
  * order), and the OPTIMIZED plan additionally depends on the cache
  * regime at analysis time (the CacheManager substitutes
  * InMemoryRelation into any subtree matching a live pin, so the same
  * query fingerprints differently inside and outside the bench's
  * release cadence — measured: 36/157 moved between regimes). So the
  * fingerprint hashes a STRUCTURAL SIGNATURE of the ANALYZED plan —
  * the stage BEFORE cache substitution and optimizer constraint
  * inference, i.e. the plan as the operator code wrote it: the
  * operator tree (node names, child order) with, per node, the SORTED
  * multiset of its expressions' class names (comparison directions
  * collapsed — a flipped `<` is the same constraint). Conjunct order,
  * expression ids, literal values, file paths, RDD ids, and cache
  * state are invisible by construction; added/removed operators or
  * expression kinds — the ratchet's target, which lives in the
  * operator code — move it. Two deliberate trades, both erring in the
  * gate-stays-tight direction: literal-only retunes (a threshold
  * constant) and engine-side optimizer-rule changes keep their old
  * floor.
  */
object PlanFingerprint {

  /** Comparison direction is renderer's choice, not plan shape. */
  private def normCls(c: String): String = c match {
    case "LessThan" | "GreaterThan" => "Cmp"
    case "LessThanOrEqual" | "GreaterThanOrEqual" => "CmpEq"
    case s => s
  }

  private def exprClasses(e: Expression): Seq[String] =
    normCls(e.getClass.getSimpleName) +: e.children.flatMap(exprClasses)

  /** The structural signature: nodeName[sorted expr-class multiset]
    * (child;child;…). Exposed for the spec and the forensic dump.
    */
  private[graft] def signature(n: LogicalPlan): String = {
    val cls = n.expressions.flatMap(exprClasses).sorted.mkString(",")
    s"${n.nodeName}[$cls](${n.children.map(signature).mkString(";")})"
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 12-hex-char fingerprint of the frame's ANALYZED plan structure.
    * Forces analysis but never optimization or execution.
    */
  def of(df: DataFrame): String =
    md5Hex(signature(df.queryExecution.analyzed)).take(12)

  /** WRITE-LEG registry (round-16 "what's wrong" #2): emit operators
    * (cur20/cur23/cur26/cur27) RETURN their read-back audit, so [[of]]
    * on the returned frame was blind to the write leg's plan — an
    * emit-leg-only change kept its old floor and read suspect until
    * the next clean regeneration. The operator notes the frame it
    * WRITES under its short query id at construction time (cheap:
    * analysis only); [[ofTagged]] folds every noted signature into
    * that query's fingerprint, so an emit-leg change reseeds the floor
    * like any other plan change. Multiple distinct write legs under
    * one tag (cur27's two emits) accumulate order-insensitively; a
    * re-noted identical signature is a no-op, so repeated query calls
    * within a session keep the fingerprint stable.
    *
    * Contract limits (round-17 ADVICE, documented not papered over):
    * the registry is process-local and populated only when the emit
    * operator's construction actually reaches its note call in THIS
    * JVM — [[ofTagged]] is meaningful only after the tagged operator
    * ran in the same session (the bench and FingerprintDump both
    * construct before fingerprinting, which is why their values
    * agree), and a caller fingerprinting a tag whose construction
    * aborted before the note gets the untagged form. Accumulation is
    * append-only within a session: a leg whose plan LEGITIMATELY
    * differs between calls (a session conf change mid-run — nothing
    * the bench does) folds both signatures in until the JVM exits,
    * which errs in the reseed direction, never toward keeping a stale
    * floor silently.
    */
  private val writeLegs =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  def noteWriteLeg(tag: String, df: DataFrame): Unit = {
    val h = md5Hex(signature(df.queryExecution.analyzed)).take(12)
    writeLegs.merge(tag, Set(h), _ ++ _); ()
  }

  /** [[of]] plus any noted write-leg signatures for `tag` — identical
    * to [[of]] when the tag has no write leg (the common case: no
    * fingerprint on the 160-query surface moves).
    */
  def ofTagged(tag: String, df: DataFrame): String = {
    val legs = Option(writeLegs.get(tag))
      .filter(_.nonEmpty)
      .map(_.toSeq.sorted.mkString("|w:", "|w:", ""))
      .getOrElse("")
    if (legs.isEmpty) of(df)
    else md5Hex(signature(df.queryExecution.analyzed) + legs).take(12)
  }
}

/** Dev utility for ratchet debugging: print the plan fingerprint of
  * named queries (all when none named). Run it twice in separate JVMs
  * to check cross-session stability — the fingerprint's load-bearing
  * property. Usage: `runMain graft.FingerprintDump <sfDir> [q1,q2,…]`.
  * Set GRAFT_FP_DUMPDIR to also write each query's signature text for
  * diffing two runs. The analyzed-plan signature is cache-regime
  * independent, so a plain build-and-fingerprint sweep matches
  * bench-recorded values exactly; family-boundary releases only bound
  * memory (construction still stages/pins for side-effect operators).
  */
object FingerprintDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = GraftSession.build(GraftSession.cpusFromEnv, "graft-fp")
    var prevFamily: String = null
    names.foreach { n =>
      if (prevFamily != null && Bench.family(n) != prevFamily)
        GraftCache.release()
      prevFamily = Bench.family(n)
      val fp =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          sys.env.get("GRAFT_FP_DUMPDIR").foreach { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(d, s"$n.txt"),
              PlanFingerprint.signature(df.queryExecution.analyzed))
          }
          PlanFingerprint.ofTagged(Bench.shortId(n), df)
        }
        catch { case e: Throwable => s"ERR:${e.getClass.getSimpleName}" }
      println(s"fp $n $fp")
    }
    GraftCache.release()
    spark.stop()
  }
}
