package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a DSv1 streaming source needs: serving
  * a batch DataFrame with `isStreaming = true`. The engine asserts the
  * flag on every `Source.getBatch` result, and the only constructor
  * that sets it rides `SparkSession.internalCreateDataFrame` — so this
  * shim lives inside the `org.apache.spark.sql` namespace, exactly the
  * pattern Delta Lake's DeltaSource uses for the same contract
  * (public knowledge: delta-io/delta, DeltaLog.createDataFrame). It
  * re-plans nothing: the already-composed batch plan is handed over as
  * its own RDD, streaming-tagged.
  */
object StreamingShim {
  def asStreaming(spark: SparkSession, df: DataFrame, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[ClassicDataset[Row]].queryExecution.toRdd,
      schema, isStreaming = true)
  }

  /** The inverse door, for a DSv1 streaming SINK: the DataFrame a
    * `Sink.addBatch` receives is backed by the query's
    * IncrementalExecution and cannot be re-planned by batch writers —
    * the standard move (Spark's own ForeachBatchSink, Delta's
    * DeltaSink) re-wraps the micro-batch's materialized RDD as a plain
    * batch frame before handing it to the write path.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[ClassicDataset[Row]].queryExecution.toRdd,
      df.schema, isStreaming = false)
  }
}
