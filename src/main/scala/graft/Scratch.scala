package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the library surface).
  *
  * Current experiment: the q43 r2->r3 bench delta (1.03 -> 1.23 s at
  * sf0.1, n=3) — interleaved A/B of the r3 shape (signatures derived
  * from the checkpointed shingle-set table, hashing each shingle once)
  * against the r2 shape (an independent minhashSignatures pass that
  * re-tokenizes the corpus), n=5 each in ONE JVM with cache-clear + GC
  * between runs. Bench-noise rule: never conclude a regression from
  * single contended runs.
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
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sfDir)

    def shingleSets() = {
      val toks = graft.functions.text.normalizedTokens(col("text"))
      docs.select(col("doc_id"), toks.as("toks"))
        .where(size(col("toks")) >= Dedup.shingleSize)
        .select(col("doc_id"), array_distinct(Dedup.shingles(col("toks"))).as("sh"))
        .localCheckpoint()
    }

    def verify(sh: org.apache.spark.sql.DataFrame,
        sigs: org.apache.spark.sql.DataFrame): Long = {
      val v = Dedup.lshCandidates(sigs).select(col("doc_a"), col("doc_b"))
        .join(sh.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id"))
        .drop("doc_id")
        .join(sh.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id"))
        .drop("doc_id")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_common"),
          size(col("sh_a")).cast("long").as("n_a"),
          size(col("sh_b")).cast("long").as("n_b"))
        .where(lit(3) * col("n_common") >= col("n_a") + col("n_b"))
      docs.select(col("doc_id"))
        .join(v.select(col("doc_b").as("doc_id"), col("doc_a").as("cand")), Seq("doc_id"), "left")
        .groupBy(col("doc_id")).agg(min(col("cand")).as("mc"))
        .select(col("doc_id"), coalesce(col("mc"), col("doc_id")).as("canonical_id"))
        .count()
    }

    // A (r3 shape): signatures from the checkpointed shingle table.
    def fromShingles(): Long = {
      val sh = shingleSets()
      val sigs = sh.select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hs"))
        .select(Seq(col("doc_id")) ++ Dedup.minhashCols(col("hs")): _*)
      verify(sh, sigs)
    }

    // B (r2 shape): an independent signature pass re-tokenizing the corpus.
    def independent(): Long = {
      val sh = shingleSets()
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      verify(sh, sigs)
    }

    (1 to 5).foreach { i =>
      time(s"fromShingles_$i")(fromShingles())
      time(s"independent_$i")(independent())
    }
    spark.stop()
  }
}
