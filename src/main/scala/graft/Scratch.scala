package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the library surface).
  *
  * Current experiment: q60's posting-cap implementation. Candidates:
  *   A typed TopKAggregator (bounded buffers, but a typed boundary —
  *     encode/decode per row — and an extra stage);
  *   B salted two-level window: rank within (word, salt) partitions,
  *     keep <= cap per slice, then rank the <= nSalt*cap survivors per
  *     word — all codegen windows, per-task sort bounded by df/nSalt;
  *   C single per-word ranking window (the unbounded-sort baseline);
  *   D no cap at all (the r3 join-explosion shape).
  * Each run ends in the same query-postings join + top-5 output.
  */
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
    val cap = 256

    def weighted(): DataFrame =
      graft.queries.TextCorpus.weightedPostings(docs, 90).localCheckpoint()

    def finish(w: DataFrame, capped: DataFrame): Long = {
      val queries = w.where(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("q_id"), col("word"), col("w_milli").as("wq"))
      val rankW = Window.partitionBy(col("q_id")).orderBy(col("dot").desc, col("doc_id"))
      queries.join(capped, "word")
        .where(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("wq") * col("w_milli")).as("dot"))
        .withColumn("rank", row_number().over(rankW))
        .where(col("rank") <= 5)
        .count()
    }

    def typedAgg(): Long = {
      val w = weighted()
      finish(w, graft.queries.TextCorpus.cappedPostings(w, cap))
    }

    def salted(): Long = {
      val w = weighted()
      val s1 = Window.partitionBy(col("word"), pmod(col("doc_id"), lit(16)))
        .orderBy(col("w_milli").desc, col("doc_id"))
      val s2 = Window.partitionBy(col("word"))
        .orderBy(col("w_milli").desc, col("doc_id"))
      val capped = w
        .withColumn("r1", row_number().over(s1)).where(col("r1") <= cap)
        .withColumn("r2", row_number().over(s2)).where(col("r2") <= cap)
        .select(col("word"), col("doc_id"), col("w_milli"))
      finish(w, capped)
    }

    def plainWindow(): Long = {
      val w = weighted()
      val s2 = Window.partitionBy(col("word"))
        .orderBy(col("w_milli").desc, col("doc_id"))
      val capped = w
        .withColumn("r2", row_number().over(s2)).where(col("r2") <= cap)
        .select(col("word"), col("doc_id"), col("w_milli"))
      finish(w, capped)
    }

    def noCap(): Long = {
      val w = weighted()
      finish(w, w.select(col("word"), col("doc_id"), col("w_milli")))
    }

    (1 to 3).foreach { i =>
      time(s"typedAgg_$i")(typedAgg())
      time(s"salted_$i")(salted())
      time(s"plainWin_$i")(plainWindow())
      time(s"noCap_$i")(noCap())
    }
    spark.stop()
  }
}
