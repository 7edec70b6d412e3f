package graft

/** Ad-hoc profiling entry (not part of the library surface).
  *
  * Current experiment: q74 bucketed-write parallelism — time the full
  * write + read-back query at sf0.1 and print the executed plan (is the
  * one-file-per-bucket layout trusted, i.e. no SortExec under the join?).
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
    (1 to 3).foreach { i =>
      time(s"q74_$i")(SparkEntry.queries("q74_bucketed_join")(spark, sfDir).count())
    }
    val df = SparkEntry.queries("q74_bucketed_join")(spark, sfDir)
    df.collect()
    println("PLAN_BEGIN")
    println(df.queryExecution.executedPlan.toString.take(4000))
    println("PLAN_END")
    spark.stop()
  }
}
