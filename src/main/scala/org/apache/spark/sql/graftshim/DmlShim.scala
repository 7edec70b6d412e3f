package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}

/** The two `private[sql]` doors the SQL DML front end needs (see
  * [[graft.plans.GraftDmlRule]]): materializing a parsed MERGE
  * source's LogicalPlan as a DataFrame, and wrapping a parsed (still
  * unresolved) Catalyst Expression as a Column so the ordinary
  * DataFrame analyzer resolves it against the merge's matched frame.
  * Same namespace pattern as [[StreamingShim]] — exactly how Delta
  * Lake's DeltaAnalysis reaches the same constructors (public
  * knowledge: delta-io/delta).
  */
object DmlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def column(e: Expression): Column = ExpressionUtils.column(e)
}
