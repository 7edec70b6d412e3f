package graft

/** Ad-hoc profiling entry (not part of the library surface).
  *
  * Current experiment: q79 (bucketed as-of) runtime — the r4j Verify run
  * jumped to 10 minutes after adding it.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-scratch")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache(); System.gc()
    }
    time("q35")(SparkEntry.queries("q35_asof_join")(spark, sfDir).count())
    time("q79_1")(SparkEntry.queries("q79_asof_bucketed")(spark, sfDir).count())
    time("q79_2")(SparkEntry.queries("q79_asof_bucketed")(spark, sfDir).count())
    spark.stop()
  }
}
