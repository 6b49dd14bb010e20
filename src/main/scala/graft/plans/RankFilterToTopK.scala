package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `row_number() over (partition by g order by o) as rn`
  * filtered by `rn <= k` collapses to the bounded-heap TopKPerGroup
  * operator, with the window re-applied on the ≤k survivors per group
  * so `rn` stays available to the rest of the plan.
  *
  * The rewrite preserves semantics whenever the original query's
  * ordering is deterministic (ties at the boundary are arbitrary in
  * BOTH forms — that's row_number's contract). It fires only on the
  * strict shape: a lone row_number window expression whose rank is
  * compared to an integer literal, no other conjuncts.
  *
  * This is the Rule[LogicalPlan] leg of the custom-operator trio
  * (plan node + planner strategy + optimizer rule, SURVEY.md §3);
  * enable with GraftExtensions (injectOptimizerRule) or
  * `TopK.enableAutoRewrite(spark)`.
  */
object RankFilterToTopK extends Rule[LogicalPlan] {

  // k computed in Long: `rn < Int.MinValue` (an always-false filter)
  // must yield k ≤ 0 and leave the Filter alone — Int math would wrap
  // k-1 to Int.MaxValue and the rewrite would DROP the filter,
  // returning all rows instead of none
  private def kOf(cond: Expression, rn: ExprId): Option[Long] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k.toLong)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k.toLong - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k.toLong)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k.toLong - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))
      if a.exprId == rn => Some(1L)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, child, _)) if order.nonEmpty && part.nonEmpty =>
      kOf(cond, al.exprId) match {
        case Some(k) if k > 0 && k <= Int.MaxValue =>
          w.copy(child = TopKPerGroupPlan(part, order, k.toInt, child))
        case _ => f
      }
  }
}
