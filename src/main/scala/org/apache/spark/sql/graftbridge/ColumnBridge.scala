package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression conversions for the graft engine's custom
  * expressions. Spark 4 made these `private[sql]` (the Column API is
  * ColumnNode-based since the Connect refactor), so this bridge lives in an
  * `org.apache.spark.sql` subpackage — the established pattern for
  * third-party Catalyst extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
