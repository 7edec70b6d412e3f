package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total (prefix sum) — the scalable replacement for
  * `sum over (partition by group order by ...)` when a group's rows far
  * exceed one reducer: a plain window puts EVERY row of the group on a
  * single task (a 100 TB corpus with 4 languages would run 4 tasks). The
  * classic two-level decomposition restores parallelism:
  *
  *   1. local running totals per (group, bucket) — parallel across
  *      buckets, where `bucket` is any order-aligned split of the order
  *      column (e.g. `doc_id div 500`);
  *   2. per-bucket totals rolled into EXCLUSIVE bucket offsets by a
  *      second window over the tiny (group, bucket) table;
  *   3. offsets joined back (broadcast-sized) and added to the local
  *      totals.
  *
  * Exact same result as the single-partition window (addition is
  * associative and the bucket order extends the row order), proven in
  * PipelineSpec.
  */
object PrefixSum {

  /** Adds `out` = running total of `valueCol` over rows ordered by
    * `orderCols` within each `groupCols` group. `bucketCol` must be
    * monotone in the order (equal order prefix => equal bucket).
    */
  def withRunningTotal(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: String,
      orderCols: Seq[String],
      valueCol: String,
      out: String): DataFrame =
    withRunningTotals(df, groupCols, bucketCol, orderCols, Seq(valueCol -> out))

  /** Running MINIMUM over the same two-level decomposition (min is
    * associative, so the identical bucket argument applies): `out` =
    * min of `valueCol` over all EARLIER rows (exclusive — the running
    * "best so far" a dominance sweep compares against; the first row of
    * each group gets NULL). Exclusivity makes the skyline predicate a
    * pure per-row comparison with no self-reference.
    */
  def withRunningMinExclusive(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: String,
      orderCols: Seq[String],
      valueCol: String,
      out: String): DataFrame = {
    val keys = (groupCols :+ bucketCol).map(col)
    val localW = Window.partitionBy(keys: _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val keyNames = groupCols :+ bucketCol
    val offsets = df
      .groupBy(keys: _*)
      .agg(min(col(valueCol)).as("__bmin"))
      .select(
        keyNames.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") }
          :+ min(col("__bmin")).over(offsetW).as("__moff"): _*)
    val joinCond = keyNames.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__k$i") }
      .reduce(_ && _)
    df.withColumn("__mlocal", min(col(valueCol)).over(localW))
      .join(offsets, joinCond)
      .withColumn(out, least(col("__mlocal"), col("__moff")))
      .drop(keyNames.indices.map(i => s"__k$i") ++ Seq("__mlocal", "__moff"): _*)
  }

  /** Multi-value form: every (valueCol -> out) pair rides the SAME
    * decomposition — one local window pass, one bucket-totals aggregate,
    * one offsets window, one join — where N sequential
    * [[withRunningTotal]] calls would pay the shuffle and join N times.
    * (q69 computes its rank — running count of 1 — and its cumulative
    * token sum together this way.)
    */
  def withRunningTotals(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: String,
      orderCols: Seq[String],
      valueOuts: Seq[(String, String)]): DataFrame = {
    require(valueOuts.nonEmpty, "need at least one (valueCol, out) pair")
    val keys = (groupCols :+ bucketCol).map(col)
    val localW = Window.partitionBy(keys: _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsetW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val keyNames = groupCols :+ bucketCol
    val offsets = df
      .groupBy(keys: _*)
      .agg(
        sum(col(valueOuts.head._1)).as("__btot0"),
        valueOuts.tail.zipWithIndex.map { case ((v, _), i) =>
          sum(col(v)).as(s"__btot${i + 1}")
        }: _*)
      .select(
        keyNames.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") }
          ++ valueOuts.indices.map { i =>
            coalesce(sum(col(s"__btot$i")).over(offsetW), lit(0L)).as(s"__off$i")
          }: _*)
    // One offset row per (group, bucket): pick the bucket width so this
    // stays broadcast-sized (one bucket per input split, not per row
    // range) — AQE then broadcasts it; under a coarse mis-sizing the
    // equi-join still runs as a correct shuffle join. The join is
    // NULL-SAFE (<=>): a window treats a NULL group as its own partition
    // and emits its rows, so the decomposition must too.
    val joinCond = keyNames.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__k$i") }
      .reduce(_ && _)
    val withLocals = valueOuts.zipWithIndex.foldLeft(df) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"__local$i", sum(col(v)).over(localW))
    }
    val joined = valueOuts.zipWithIndex.foldLeft(withLocals.join(offsets, joinCond)) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, col(s"__local$i") + col(s"__off$i"))
    }
    joined.drop(
      keyNames.indices.map(i => s"__k$i")
        ++ valueOuts.indices.flatMap(i => Seq(s"__local$i", s"__off$i")): _*)
  }
}
