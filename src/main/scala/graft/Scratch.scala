package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-scratch")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache(); System.gc()
    }
    val docs = Tables.documents(spark, sfDir)
    val sig = graft.operators.Dedup
      .minhashSignatures(docs, "doc_id", "text").localCheckpoint()
    val bands = sig.select(
      col("doc_id"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).as("band"), col(s"mh$i").as("key"))): _*)).as("b"),
    ).select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))

    // A: r2 shape — collect_list first, size filter after (unbounded buffer).
    def collectFirst(): Long =
      bands.groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")).between(2, 1000))
        .select(posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
        .select(col("doc_a"),
          explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).count().count()

    // B: r3 shape — windowed pre-count drops degenerate buckets before
    // any array is built (bounded buffer, same single exchange).
    def windowPrecount(): Long =
      bands.withColumn("bn",
          count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
        .where(col("bn").between(2, 1000))
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .select(posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
        .select(col("doc_a"),
          explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).count().count()

    // Interleave to cancel machine-load drift.
    time("collect_1")(collectFirst()); time("window_1")(windowPrecount())
    time("collect_2")(collectFirst()); time("window_2")(windowPrecount())
    time("collect_3")(collectFirst()); time("window_3")(windowPrecount())
    spark.stop()
  }
}
