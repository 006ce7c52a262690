package graft

import graft.functions.{CosineSimilarity, L2Distance}
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
  }
}
