package graft

/** Ad-hoc profiling entry (not part of the library surface): times each
  * named query twice (cold + warm within this JVM) on the given sf dir.
  * Run: SPARK_GRAFT_CPUS=32 runMain graft.Scratch <sfDir> <query...>
  *
  * CLOSED (round 5): q79 (bucketed as-of) under VERIFY's exact
  * conditions — local[4], shufflePartitions=4, coalesce(1) parquet
  * write — after the r4 Verify run jumped to ~10 minutes when q79 was
  * added. Measured 2026-08-12: q35_count 4.71s, q79_count 4.53s,
  * q35_verify 2.11s, q79_verify_1 2.14s, q79_verify_2 1.26s — q79 costs
  * the SAME as the plain q35 under Verify's config; neither the
  * localCheckpoint nor the null-safe joins add anything material. The
  * r4 wall-time jump was machine-level load (the same fleet-wide
  * 1.6-1.9x multiplier the r4 verdict documented on untouched queries),
  * not q79.
  *
  * CLOSED (round 5): q110 profiler fused-vs-split A/B at sf0.1,
  * local[32] — fused single-aggregation spelling (countDistinct +
  * min/max together -> keyed SortAggregate over the expanded stream)
  * benched 7.52 s; the split two-pass spelling measured 5.38 s cold /
  * 1.20 s warm on the same corpus (cold pays this JVM's first-codegen;
  * the bench, which warms up first, sees the warm number). The split
  * is the shipped shape.
  */
/** CLOSED (round 5): q101's 10.6 s bench / 15-16 s Scratch readings at
  * sf0.1 are machine load, not plan cost — a quiet-machine stage profile
  * (same JVM, local[32]) measured shingleSets 0.65 s (5000 docs),
  * prefixCandidates 4.45 s cold / 1.98 s warm (309,803 candidates), and
  * the FULL query 4.23 s including the exact array_intersect verify of
  * all 310k candidates. The loaded-run multiplier (~2.5x) matches the
  * bench's own calibration drift (0.33 -> 0.68 s on the q01 probe in the
  * same run). No structural fix needed; the candidate count is the real
  * cost driver and is already 144x below all-pairs (DedupSpec).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(appName = "graft-scratch", master = Some(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); System.gc()
    }
    args.drop(1).foreach { q =>
      time(s"${q}_cold")(SparkEntry.queries(q)(spark, sfDir).count())
      time(s"${q}_warm")(SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
