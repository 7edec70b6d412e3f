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
}
