package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...}}.
  *
  * Measures query execution (count() over the full plan), not JVM/session
  * startup — per BASELINE.md the baseline comparison is query time. A
  * warmup action first touches every table so one-time scan setup
  * (parquet footer reads, codegen of common scans) is off the clock.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession
      .builder(appName = "graft-bench", master = Some(s"local[$cpus]"),
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch each table once (footer reads + scan codegen).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).count())

    val results = SparkEntry.allDefs.map { q =>
      val t0 = System.nanoTime()
      // NonFatal only: an OOM/JVM-corrupting error must abort the bench
      // rather than distort every subsequent measurement.
      val ok = try { q.fn(spark, sfDir).count(); true }
      catch { case scala.util.control.NonFatal(_) => false }
      val sec = (System.nanoTime() - t0) / 1e9
      // Off the clock: drop leftover cached blocks/broadcasts so one
      // query's garbage doesn't tax the next one's measurement.
      spark.catalog.clearCache()
      System.gc()
      q.name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
