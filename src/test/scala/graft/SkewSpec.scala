package graft

import org.apache.spark.sql.functions._

/** Skew-handling evidence to go with the [[SkewTwin]] measured table.
  *
  * Two claims the 100 TB story rests on, proven here rather than assumed:
  *
  *  1. AQE's runtime skew-join split actually FIRES on the hot-key
  *     equi-join shape every defended query reduces to (partial-agg
  *     groupBy + equi-join back on the possibly-hot key — q93's span_h,
  *     q117's block noun, q33's salted merge). The production thresholds
  *     (256 MB skewed-partition floor) are sized for real executors, so
  *     the test lowers them to fixture scale — the POINT is that the
  *     shape is split-ELIGIBLE: no window, no single-reducer stage, a
  *     plain shuffled equi-join AQE can re-plan mid-query.
  *
  *  2. The q79 bucketed as-of bounds the hot user's per-task slice by
  *     construction: a user owning 30% of the stream lands
  *     events-per-(user, day) rows on a task, never events-per-user.
  */
class SkewSpec extends SparkSpec {

  /** Run `body` with AQE skew thresholds shrunk to fixture scale and
    * broadcast joins disabled (a broadcast would dissolve the join we
    * are trying to observe), restoring the session afterwards.
    */
  private def withFixtureScaleSkewConf[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The SkewTwin hot-key probe: one key owning ~90% of the rows (300k),
    * a long tail of ordinary keys, with a hash payload so shuffle bytes
    * track row counts (sequential longs alone compress to almost
    * nothing and can dodge byte-based skew thresholds).
    */
  private def hotProbe = {
    val pay = sha2(col("id").cast("string"), 256).as("pay")
    spark.range(0, 300000)
      .select(lit(1L).as("k"), col("id").as("v"), pay)
      .unionAll(spark.range(0, 30000)
        .select((col("id") % 100 + 2).as("k"), col("id").as("v"), pay))
  }

  test("AQE skew split fires (skew=true) on the bare-shuffle hot-key equi-join") {
    withFixtureScaleSkewConf {
      // Both join inputs are plain shuffle reads (fact-to-dim on the
      // hot key) — the LSH band-bucket / candidate-verify join shape.
      // The downstream aggregate re-keys on a DIFFERENT column, so no
      // parent requires the join's partitioning.
      val dims = spark.range(0, 102).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = hotProbe.join(dims, Seq("k"))
        .groupBy((col("v") % 97).as("g"))
        .agg(sum(col("v") + col("w")).as("s"))
      joined.collect()
      // AQE's final plan only (the "== Initial Plan ==" tail repeats the
      // pre-adaptive plan and must not satisfy the assertion).
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire on the hot-key join:\n$plan")
    }
  }

  test("join against a SAME-KEY aggregate is NOT split-eligible — the partial-agg bound carries it instead") {
    withFixtureScaleSkewConf {
      // The groupBy+join-back decomposition (q93's span_h, q117's noun):
      // the aggregate side reuses the join key's partitioning, so the
      // SMJ's right input is Sort(HashAggregate(shuffle)) — NOT a bare
      // shuffle read. OptimizeSkewedJoin can only split map-output
      // ranges, so this shape does not get skew=true even with a 30 MB
      // hot partition. Pinned here because round 6's q93 scaladoc
      // claimed otherwise; the shape's ACTUAL defenses are (a) the
      // map-side partial agg bounding the aggregate side to one row per
      // key per task, and (b) for truly ubiquitous keys, q93's hybrid
      // hot-set broadcast join-back (see spanDupStats), which removes
      // the hot key from the shuffled join entirely.
      val perKey = hotProbe.groupBy(col("k")).agg(count(lit(1)).as("n"))
      val joined = hotProbe.join(perKey, Seq("k"))
        .groupBy((col("v") % 97).as("g"))
        .agg(sum(col("v") + col("n")).as("s"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("skew=true"),
        "same-key-aggregate join unexpectedly skew-split — q93's hybrid rationale is stale")
      assert(plan.contains("SortMergeJoin"), plan)
    }
  }

  test("window-based hot-key shapes are NOT split-eligible (why the groupBy+join rewrite matters)") {
    withFixtureScaleSkewConf {
      import org.apache.spark.sql.expressions.Window
      // Same hot key, spelled as a count window: the hot key's whole
      // row set is one window partition — AQE has no skew handle on
      // window exchanges, so nothing in the plan says skew.
      val probe = spark.range(0, 300000)
        .select(lit(1L).as("k"), col("id").as("v"))
        .unionAll(spark.range(0, 30000)
          .select((col("id") % 100 + 2).as("k"), col("id").as("v")))
      // Same downstream re-key as the join test, so the ONLY difference
      // between the two plans is window-over-k vs groupBy+join-back.
      val windowed = probe
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("k"))))
        .groupBy((col("v") % 97).as("g")).agg(sum(col("v") + col("n")).as("s"))
      windowed.collect()
      val plan = windowed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("skew=true"),
        "window spelling unexpectedly skew-split — rewrite rationale stale")
      assert(plan.contains("Window"), plan)
    }
  }

  test("q79 bucketed as-of bounds the hot user's per-task slice to (user, day)") {
    // Hot-user twin of the sf0.001 events (SkewTwin's transform): one
    // user owns ~30% of the stream.
    val hot = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("ts div 1000").as("t_us"), col("event_id"))
      .withColumn("user_id",
        when(col("event_id") % 10 < 3, lit(1L)).otherwise(col("user_id")))
    val day = 86400000000L
    val hotTotal = hot.where(col("user_id") === 1L).count()
    val maxSlice = hot
      .groupBy(col("user_id"), (col("t_us") - (col("t_us") % day)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).first().getLong(0)
    // The events table spans a month, so the hot user's day-slices must
    // sit far below their total — the bound q79's per-(key, bucket)
    // window sort actually pays per task.
    assert(hotTotal > 100, s"fixture too small for the claim: $hotTotal")
    assert(maxSlice * 5 <= hotTotal,
      s"day bucketing does not bound the hot user: maxSlice=$maxSlice total=$hotTotal")
  }
}
