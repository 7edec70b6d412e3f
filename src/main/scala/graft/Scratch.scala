package graft

/** Ad-hoc profiling entry (not part of the library surface).
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
  * Run: SPARK_GRAFT_CPUS=4 runMain graft.Scratch /root/testdata/sf0.01
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
    val out = java.nio.file.Files.createTempDirectory("scratch").toString
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); System.gc()
    }
    def verifyStyle(q: String): Unit =
      SparkEntry.queries(q)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$q")
    time("q35_count")(SparkEntry.queries("q35_asof_join")(spark, sfDir).count())
    time("q79_count")(SparkEntry.queries("q79_asof_bucketed")(spark, sfDir).count())
    time("q35_verify")(verifyStyle("q35_asof_join"))
    time("q79_verify_1")(verifyStyle("q79_asof_bucketed"))
    time("q79_verify_2")(verifyStyle("q79_asof_bucketed"))
    // Round-5 plan audit: AQE-final plans of the new queries.
    args.drop(1).foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
