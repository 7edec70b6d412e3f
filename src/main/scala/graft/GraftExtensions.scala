package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{StringPolyHash, VectorDotProduct}
import graft.plans.IntersectSizeRewrite

/** Registers the engine's custom Catalyst surface: expressions as SQL
  * functions (`spark.sql("SELECT vector_dot(a, b) ...")` works alongside
  * the Column API) and the optimizer rule that fuses
  * `size(array_intersect)` into a count-only expression. Installed by
  * GraftSession via `builder.withExtensions`; external users can add it
  * with `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => IntersectSizeRewrite)
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vector_dot"),
      (args: Seq[Expression]) => VectorDotProduct(args(0), args(1)),
    ))
    e.injectFunction((
      FunctionIdentifier("string_poly_hash"),
      new ExpressionInfo(classOf[StringPolyHash].getName, "string_poly_hash"),
      (args: Seq[Expression]) => StringPolyHash(args.head),
    ))
  }
}
