package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.expressions.ArrayIntersectSize

/** Optimizer rule: `size(array_intersect(a, b))` over string arrays
  * becomes [[ArrayIntersectSize]] — same value, no intermediate array
  * (see the expression's scaladoc for why this matters on the dedup
  * verify path). Scoped to string arrays, where boxed-element equality
  * is exactly array_intersect's; `legacySizeOfNull = true` (size(null)
  * = -1) is left alone — the fused expression is null-propagating.
  * Injected via [[graft.GraftExtensions]]; fires once per matching node
  * (the rewritten tree no longer matches).
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  private def stringArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ai: ArrayIntersect, false)
        if stringArray(ai.left.dataType) && stringArray(ai.right.dataType) =>
      ArrayIntersectSize(ai.left, ai.right)
  }
}
