package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (extension tier (c), `Rule[LogicalPlan]`): rewrites
  * the ubiquitous window-top-k idiom
  *
  *   `row_number() OVER (PARTITION BY k ORDER BY o) <= K`
  *
  * into the bounded-heap `TopKPerKeyPlan` operator, so EXISTING
  * user queries written with windows get the ≤K-rows-per-key-
  * per-partition shuffle instead of a full per-key sort of all rows.
  * Register with `spark.experimental.extraOptimizations` or via
  * `GraftExtensions`.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private object LimitValue {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Cast(LimitValue(v), _, _, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))
        if part.nonEmpty && order.nonEmpty =>
      cond match {
        case LessThanOrEqual(RankRef(a), LimitValue(k))
            if a.exprId == alias.exprId && k > 0 && k <= Int.MaxValue =>
          rewrite(part, order, k.toInt, alias, child)
        case LessThan(RankRef(a), LimitValue(k))
            if a.exprId == alias.exprId && k > 1 && k <= Int.MaxValue =>
          rewrite(part, order, (k - 1).toInt, alias, child)
        case _ => f
      }
  }

  /** The rank column possibly wrapped in a numeric cast. */
  private object RankRef {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case Cast(RankRef(a), _, _, _) => Some(a)
      case _ => None
    }
  }

  private def rewrite(part: Seq[Expression], order: Seq[SortOrder], k: Int,
      alias: Alias, child: LogicalPlan): LogicalPlan = {
    // Spark's InferWindowGroupLimit (3.5+) may already have inserted a
    // sort-based partial limit under the Window; the heap operator
    // subsumes it, so strip it rather than doing the work twice.
    val input = child match {
      case WindowGroupLimit(p2, o2, _, k2, inner)
          if p2 == part && o2 == order && k2 >= k => inner
      case other => other
    }
    val rankLong = AttributeReference("rnk_l", LongType, nullable = false)()
    val topk = TopKPerKeyPlan(part, order, k, rankLong, input)
    // restore the window's output shape: rank as int, original exprId
    Project(
      child.output :+ Alias(Cast(rankLong, IntegerType), alias.name)(
        exprId = alias.exprId),
      topk)
  }
}
