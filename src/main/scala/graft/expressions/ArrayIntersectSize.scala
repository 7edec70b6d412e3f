package graft.expressions

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}

/** Count of distinct elements of `left` that also occur in `right` —
  * value-identical to `size(array_intersect(left, right))` (including
  * the null-element rule: a null element counts iff BOTH sides contain
  * one) but WITHOUT materializing the intersection array.
  * `array_intersect` builds, fills, and copies a new array whose only
  * consumer is `size`; on the dedup verify path (q27/q43/q46) that
  * allocation runs once per candidate pair. The optimizer rule
  * [[graft.plans.IntersectSizeRewrite]] installs this automatically for
  * string arrays, so query code keeps the declarative spelling.
  */
case class ArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isSupportedArray(dt: DataType): Boolean = dt match {
    // Only element types whose boxed equals/hashCode match Spark's
    // array_intersect semantics: strings and integral types. Floats
    // (-0.0 vs 0.0 boxing) and binary (Array[Byte] reference equality)
    // would silently diverge in the JHashSet kernel, so reject them here
    // rather than advertise a domain the kernel does not honor.
    case ArrayType(StringType | ByteType | ShortType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupportedArray(left.dataType) && isSupportedArray(right.dataType)
      && left.dataType.asInstanceOf[ArrayType].elementType ==
        right.dataType.asInstanceOf[ArrayType].elementType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same string or integral " +
          s"element type, got ${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayIntersectSize.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ArrayIntersectSize.count($a, $b, $et);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_intersect_size"
}

object ArrayIntersectSize {
  /** Static kernel shared by eval and generated code: hash right once,
    * count left's distinct members. Boxed-element equality matches
    * array_intersect for strings and integral types (the rewrite rule
    * only fires for string arrays).
    */
  def count(a: ArrayData, b: ArrayData, et: DataType): Int = {
    val rightSet = new JHashSet[Any]()
    var rightHasNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) rightHasNull = true
      else rightSet.add(b.get(i, et))
      i += 1
    }
    val seen = new JHashSet[Any]()
    var leftNullCounted = false
    var cnt = 0
    var j = 0
    val na = a.numElements()
    while (j < na) {
      if (a.isNullAt(j)) {
        if (rightHasNull && !leftNullCounted) { cnt += 1; leftNullCounted = true }
      } else {
        val v = a.get(j, et)
        if (rightSet.contains(v) && seen.add(v)) cnt += 1
      }
      j += 1
    }
    cnt
  }
}
