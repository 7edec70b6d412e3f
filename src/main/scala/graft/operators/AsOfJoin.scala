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
  *
  * HOT-KEY LIMIT of [[lookup]]: the window sorts ALL of a key's rows on
  * one task, so a key owning a data-scale fraction of rows (one
  * instrument trading a market's volume, one device flooding a fleet)
  * serializes and can exceed one task's spill budget. The escape hatch is
  * [[lookupBucketed]] — the same two-level decomposition as
  * [[PrefixSum]]: split each key's timeline into order-aligned time
  * buckets, resolve as-of locally per (key, bucket) in parallel, and
  * carry each bucket's last build ref forward through a window over the
  * tiny (key, bucket) summary table. Identical output (proven in
  * ScalePatternsSpec on a hot-key fixture); costs one extra small join.
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

  /** Hot-key-safe variant: identical result to [[lookup]], but each key's
    * timeline is split into `bucketWidth`-wide time buckets so no task
    * ever sorts more than one (key, bucket) slice. A probe's answer is
    * its LOCAL as-of (nearest preceding build row inside its own bucket)
    * when one exists, else the CARRY — the last build ref of the nearest
    * earlier non-empty bucket, rolled forward by a window over the
    * (key, bucket) summary table (rows = keys x active buckets, orders of
    * magnitude smaller than the data). `bucketWidth` is the skew knob:
    * size it so one hot key's densest bucket fits a task. The bucket id
    * is an exact long-space floorDiv (no double rounding at ns-epoch
    * magnitudes, correct for negative times).
    */
  def lookupBucketed(
      probe: DataFrame, probeKey: String, probeTime: String, probeId: String,
      build: DataFrame, buildKey: String, buildTime: String, buildRef: String,
      bucketWidth: Long,
      defaultRef: Long = -1L,
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val b = build
      .groupBy(col(buildKey).as("k"), col(buildTime).as("t"))
      .agg(max(col(buildRef)).as("ref"))
      .select(col("k"), col("t"), lit(0).as("side"), col("ref"), lit(null).cast("long").as("id"))
    val p = probe.select(
      col(probeKey).as("k"), col(probeTime).as("t"),
      lit(1).as("side"), lit(null).cast("long").as("ref"), col(probeId).as("id"))
    val u = b.unionByName(p)
      .withColumn("bkt",
        expr(s"(t - ((t % $bucketWidth + $bucketWidth) % $bucketWidth)) div $bucketWidth"))
      .localCheckpoint() // feeds the local pass AND the bucket summary
    val localW = Window.partitionBy(col("k"), col("bkt"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // Last build ref per (key, bucket): argmax by aggregation (map-side
    // partials) — build rows are already unique per (k, t).
    val bucketLast = u.where(col("side") === 0)
      .groupBy(col("k"), col("bkt"))
      .agg(max(struct(col("t"), col("ref"))).as("m"))
      .select(col("k"), col("bkt"), col("m.ref").as("bref"))
    val carryW = Window.partitionBy(col("k")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Both joins here are NULL-SAFE (<=>): the windows in [[lookup]]
    // treat a NULL key as its own partition and emit its probe rows, so
    // the decomposition must too (a plain equi-join would silently drop
    // them) — same contract as PrefixSum's offsets join.
    val bucketsRaw = u.select(col("k"), col("bkt")).distinct()
      .join(
        bucketLast.select(col("k").as("__lk"), col("bkt").as("__lb"), col("bref")),
        col("k") <=> col("__lk") && col("bkt") <=> col("__lb"), "left")
      .select(col("k"), col("bkt"), col("bref"))
    val buckets = bucketsRaw
      .withColumn("carry", last(col("bref"), ignoreNulls = true).over(carryW))
      .select(col("k").as("__bk"), col("bkt").as("__bb"), col("carry"))
    u.withColumn("loc", last(col("ref"), ignoreNulls = true).over(localW))
      .where(col("side") === 1)
      .join(buckets, col("k") <=> col("__bk") && col("bkt") <=> col("__bb"))
      .select(
        col("id"),
        col("k"),
        coalesce(col("loc"), col("carry"), lit(defaultRef)).as("asof_ref"))
  }
}
