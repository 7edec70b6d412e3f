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

    def joinImpl(): Long = {
      val w = Window.partitionBy(col("band"), col("key"))
      val capped = bands.withColumn("bn", count(lit(1)).over(w))
        .where(col("bn") <= 1000).drop("bn")
      capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
    }
    def bucketImpl(): Long =
      bands.groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")).between(2, 1000))
        .select(posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
        .select(col("doc_a"),
          explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).count().count()

    // Interleave to cancel machine-load drift.
    time("join_1")(joinImpl()); time("bucket_1")(bucketImpl())
    time("join_2")(joinImpl()); time("bucket_2")(bucketImpl())
    time("join_3")(joinImpl()); time("bucket_3")(bucketImpl())
    spark.stop()
  }
}
