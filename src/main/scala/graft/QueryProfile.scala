package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Per-job/stage PROFILER for one or more registered queries — the
  * round-17 measurement instrument (optimization guide §1: decide
  * whether time goes to scheduling, scan, shuffle, or compute BEFORE
  * touching anything). The Spark UI is disabled in this sandbox, so
  * this listener-based breakdown stands in for the Stages page.
  *
  * Run: SPARK_GRAFT_CPUS=32 runMain graft.QueryProfile <sfDir> <query...>
  *
  * For each query: one untimed warm pass (scenario/layout builds and
  * codegen off the clock, same as Bench), then one timed pass with a
  * listener recording every job's wall time, task count, and call
  * site. Prints jobs sorted by duration plus the gap between summed
  * job time and the query's wall time (= driver-side planning,
  * file listing, log parsing, checkpoint I/O — anything that runs no
  * job).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: QueryProfile <sfDir> <query...>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-profile", master = Some(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).count())

    final case class JobRec(id: Int, desc: String, site: String,
        var start: Long = 0L, var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, site, start = js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    }
    // Per-stage task-duration skew (guide §2.5): a stage whose max task
    // runs >>3x its median has a hot key/band a salting pass should
    // split; printed for every stage with enough tasks to judge.
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Vector[Long]]()
    val taskListener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null && te.taskInfo.successful)
          stageTasks.merge(te.stageId, Vector(te.taskInfo.duration),
            (a, b) => a ++ b)
    }
    // Streaming queries hide their per-batch breakdown from the job
    // listener (WAL writes, offset planning, state commits run no job):
    // print every micro-batch's engine-reported durationMs instead.
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val durs = scala.jdk.CollectionConverters.MapHasAsScala(p.durationMs)
          .asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"  STREAM batch=${p.batchId} rows=${p.numInputRows} $durs")
      }
    })

    names.foreach { q =>
      // Warm pass (scenario builds, codegen) — off the clock.
      SparkEntry.queries(q)(spark, sfDir).count()
      spark.catalog.clearCache(); System.gc()
      jobs.clear()
      stageTasks.clear()
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.addSparkListener(taskListener)
      val t0 = System.nanoTime()
      val tPlan0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val planSec = (System.nanoTime() - tPlan0) / 1e9
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.sparkContext.removeSparkListener(taskListener)
      // Let the listener bus drain before reading.
      Thread.sleep(300)
      val recs = scala.jdk.CollectionConverters.CollectionHasAsScala(jobs.values())
        .asScala.toSeq.sortBy(r => -(r.end - r.start))
      val jobSum = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(f"\n=== $q total=$sec%.2fs dfBuild=$planSec%.2fs jobs=${recs.size} jobSum=$jobSum%.2fs driverGap=${sec - jobSum}%.2fs")
      recs.take(30).foreach { r =>
        println(f"  job ${r.id}%4d ${(r.end - r.start) / 1e3}%7.2fs  ${r.site.take(60)}%-60s ${r.desc.take(60)}")
      }
      // Stage skew: only stages with >= 8 tasks and a max worth seeing.
      scala.jdk.CollectionConverters.MapHasAsScala(stageTasks).asScala.toSeq
        .filter { case (_, ds) => ds.size >= 8 && ds.max >= 100 }
        .sortBy { case (_, ds) => -ds.max }
        .take(10)
        .foreach { case (sid, ds) =>
          val sorted = ds.sorted
          val med = sorted(sorted.size / 2)
          println(f"  stage $sid%4d tasks=${ds.size}%4d med=${med}ms max=${ds.max}ms skew=${ds.max.toDouble / math.max(med, 1)}%.1fx")
        }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
