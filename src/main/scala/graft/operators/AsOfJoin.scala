package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each probe row, attach the most
  * recent build row with build.time <= probe.time and the same key.
  *
  * Spark has no native as-of join; the usual formulations are (a) an
  * inequality join + per-probe max — a pair explosion the optimizer plans
  * as nested loops, or (b) this UNION + LAST_VALUE WINDOW idiom: tag both
  * inputs, union them, and run one `last(ref, ignoreNulls)` window
  * ordered by (time, side) per key. Cost is one shuffle on the key plus a
  * per-key sort — O((|probe|+|build|) log) — with no pair blow-up, which
  * is what survives at 100 TB.
  *
  * Tie semantics match ASOF `>=`: at equal time the build row sorts first
  * (side 0 < side 1) and is therefore visible to the probe row; build
  * rows are pre-deduplicated per (key, time) by greatest tiebreak so the
  * match is deterministic.
  */
object AsOfJoin {

  /** @param probe   rows needing a lookup: (key, time, id)
    * @param build   reference rows: (key, time, ref)
    * Columns are passed by name; output is (id, key, asof_ref) with
    * `defaultRef` where no build row precedes the probe.
    */
  def lookup(
      probe: DataFrame, probeKey: String, probeTime: String, probeId: String,
      build: DataFrame, buildKey: String, buildTime: String, buildRef: String,
      defaultRef: Long = -1L,
  ): DataFrame = {
    val b = build
      .groupBy(col(buildKey).as("k"), col(buildTime).as("t"))
      .agg(max(col(buildRef)).as("ref"))
      .select(col("k"), col("t"), lit(0).as("side"), col("ref"), lit(null).cast("long").as("id"))
    val p = probe.select(
      col(probeKey).as("k"), col(probeTime).as("t"),
      lit(1).as("side"), lit(null).cast("long").as("ref"), col(probeId).as("id"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    b.unionByName(p)
      .withColumn("asof_ref", last(col("ref"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(
        col("id"),
        col("k"),
        coalesce(col("asof_ref"), lit(defaultRef)).as("asof_ref"))
  }
}
