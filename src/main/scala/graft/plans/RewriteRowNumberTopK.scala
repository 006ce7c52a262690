package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `row_number() OVER (PARTITION BY k ORDER BY o)`
  * followed by a rank bound (`rk <= K`, `rk < K+1`, `rk = 1`) is a
  * per-key top-K — rewrite the Window (full per-partition sort) into
  * the bounded-heap [[TopKPerKeyPlan]] operator.
  *
  * Deliberately narrow: exactly one window expression, it is
  * row_number (ties impossible, so rank/dense_rank gap semantics can't
  * be silently changed), at least one CONJUNCT of the filter condition
  * is a rank bound (round 21 — etl16's `rn === 1 && op =!= "D"` shape
  * previously kept the whole sort: the non-rank conjuncts are applied
  * in a residual Filter ABOVE the top-k, which is semantics-identical
  * because the original filter also ran after ranking), and the
  * partition spec is non-empty (a global top-k is better served by
  * TakeOrderedAndProject). The rewritten node reuses the window
  * alias's exprId, so downstream references resolve unchanged.
  *
  * Registered via `GraftExtensions.injectOptimizerRule`; Spark's own
  * InferWindowGroupLimit (3.5+) only pre-filters below the Window —
  * the sort itself survives. This rule removes the sort entirely.
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  private def rankBound(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) && v == 1 => Some(1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rank) => Some(v)
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w match {
      case Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          partitionSpec, orderSpec, child, _)
          if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
            spec.partitionSpec == partitionSpec && spec.orderSpec == orderSpec =>
        val rankAttr = alias.toAttribute.asInstanceOf[AttributeReference]
        val (bounds, rest) = splitConjuncts(cond)
          .partition(c => rankBound(c, rankAttr).exists(_ > 0))
        if (bounds.isEmpty) None
        else {
          val k = bounds.flatMap(c => rankBound(c, rankAttr)).min
          val topk = TopKPerKeyPlan(partitionSpec, orderSpec, k, rankAttr, child)
          Some(if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(cond, w)
        .map(topk => Project(projList, topk))
        .getOrElse(f)
  }
}
