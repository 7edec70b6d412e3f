package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale patterns: bucketed tables for co-located
  * (shuffle-free) joins, and partitioned layouts for partition pruning —
  * the two techniques that remove the scan+shuffle tax at 100 TB.
  */
class StorageSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // Bucketing co-locates both sides: no hash exchange feeds the join.
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-order layout bounds both dimensions per file; a 1-D sort leaves the other dimension unclustered") {
    import graft.queries.ScalePatterns
    val ev = Tables.events(spark, sf001).select(col("user_id"), col("ts"))
    val b = ev.agg(min(col("user_id")), max(col("user_id")), min(col("ts")), max(col("ts"))).first()
    val (u0, u1, t0, t1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val q = ev
      .withColumn("uq", expr(s"((user_id - $u0) * 255) div ${math.max(u1 - u0, 1L)}"))
      .withColumn("tq", expr(s"((ts - $t0) * 255) div ${math.max(t1 - t0, 1L)}"))
    // Per-file normalized [0,1] spread of each quantized dimension.
    def spreads(df: org.apache.spark.sql.DataFrame): Seq[(Double, Double)] = {
      val dir = Files.createTempDirectory("graft-zorder").toString
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max(col("uq")) - min(col("uq"))) / 255.0).as("us"),
          ((max(col("tq")) - min(col("tq"))) / 255.0).as("ts"))
        .collect().toSeq.map(r => (r.getDouble(1), r.getDouble(2)))
    }
    val z = spreads(q
      .withColumn("zkey", ScalePatterns.mortonKey(col("uq"), col("tq"), bits = 8))
      .repartitionByRange(16, col("zkey")).sortWithinPartitions(col("zkey")))
    val linear = spreads(q.repartitionByRange(16, col("user_id")))
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val (zu, zt) = (avg(z.map(_._1)), avg(z.map(_._2)))
    val (lu, lt) = (avg(linear.map(_._1)), avg(linear.map(_._2)))
    // 16 files over the 16-bit z-space = 4096 cells each = a 64x64 block:
    // both dims bounded well below the full range.
    assert(zu < 0.55 && zt < 0.55, s"z-order spreads not block-bounded: u=$zu t=$zt")
    // The 1-D sort clusters user tightly but leaves time at ~full range.
    assert(lu < 0.2, s"linear user spread unexpectedly wide: $lu")
    assert(lt > 0.85, s"linear layout should NOT bound time: $lt")
    // And z-order's time clustering is categorically better than linear's.
    assert(zt < lt / 2, s"z-order time spread $zt vs linear $lt")
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-partitioned").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).where(col("event_type") === "click")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // The pruned scan must touch exactly the one matching partition.
    val n = df.count()
    val total = spark.read.parquet(dir).count()
    assert(n > 0 && n < total)
  }

  test("mergeSchema union: evolved batches surface as one schema with NULLs for absent columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    val c = Tables.customer(spark, sf0001)
    c.select(col("c_custkey"), col("c_name")).limit(3)
      .write.mode("overwrite").parquet(s"$dir/v1")
    c.select(col("c_custkey"), col("c_mktsegment")).limit(3)
      .write.mode("overwrite").parquet(s"$dir/v2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
    assert(merged.columns.toSet == Set("c_custkey", "c_name", "c_mktsegment"))
    // Each batch's foreign column reads as NULL, never as a failure.
    assert(merged.where(col("c_name").isNull).count() == 3)
    assert(merged.where(col("c_mktsegment").isNull).count() == 3)
  }
}
