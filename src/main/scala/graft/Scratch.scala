package graft

import org.apache.spark.sql.SparkSession
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
    }
    val docs = Tables.documents(spark, sfDir)
    val sig = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    time("sig")(sig.count())
    time("sig2")(sig.count())
    val bands = sig.select(
      col("doc_id"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).as("band"), col(s"mh$i").as("key"))): _*)).as("b"),
    ).select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    time("bands")(bands.count())
    val joined = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
    time("join_raw")(joined.count())
    time("join_agg")(joined.groupBy(col("a.doc_id"), col("b.doc_id")).count().count())
    val sigC = sig.localCheckpoint()
    val bandsC = sigC.select(
      col("doc_id"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).as("band"), col(s"mh$i").as("key"))): _*)).as("b"),
    ).select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    val joinedC = bandsC.as("a").join(bandsC.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
    time("join_checkpointed")(joinedC.groupBy(col("a.doc_id"), col("b.doc_id")).count().count())
    spark.stop()
  }
}
