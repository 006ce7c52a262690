package graft

import graft.functions.{CosineSimilarity, L2Distance, MinHashSignature, ShingleHashes, WinnowFingerprints}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook (SURVEY.md §4): registers the engine's
  * native expressions so they are first-class in SQL text as well as the
  * Column API — `SELECT cosine_sim(a.v, b.v) FROM ...` plans the same
  * codegen'd expression as [[graft.functions.GraftFunctions.cosineSim]].
  *
  * Usable both programmatically (`GraftSession.build`) and via
  * `spark.sql.extensions=graft.GraftExtensions` on a real cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRowNumberTopK)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"cosine_sim takes exactly 2 arguments, got ${children.size}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_distance"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"l2_distance takes exactly 2 arguments, got ${children.size}")
        L2Distance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"winnow_fingerprints(text, k, w) takes 3 arguments, got ${children.size}")
        WinnowFingerprints(children.head,
          intArg(children(1), "winnow_fingerprints k"),
          intArg(children(2), "winnow_fingerprints w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"shingle_hashes(text, n) takes 2 arguments, got ${children.size}")
        ShingleHashes(children.head, intArg(children(1), "shingle_hashes n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"minhash_signature(hashes, n) takes 2 arguments, got ${children.size}")
        MinHashSignature(children.head, intArg(children(1), "minhash_signature n"))
      }))
  }

  /** A literal integer argument in SQL text (`shingle_hashes(text, 3)`). */
  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte  => b.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }
}
