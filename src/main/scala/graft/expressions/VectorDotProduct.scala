package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two array<float> / array<double> columns (each
  * side independently; mixed widths widen the float element to double —
  * the same CAST-to-DOUBLE the oracle applies).
  *
  * Semantically identical to the declarative fold
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,v) => acc+v)` —
  * sequential left-to-right accumulation in double — but compiled to a
  * tight primitive loop via doGenCode instead of per-element interpreted
  * `ArrayAggregate.eval` (which costs ~1000x on the brute-force ANN path:
  * the fold allocates and re-evaluates lambda trees per element, and worse,
  * blocks whole-stage codegen for the surrounding join).
  *
  * The accumulation order matches DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b), ...)))`
  * oracle bit-for-bit, so results hash-compare exactly. The double-side
  * support exists for the IVF path, whose Lloyd centroids are exact
  * integer-ratio doubles (identical in both engines by construction).
  */
case class VectorDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yv = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xv * $yv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}
