package graft

import org.apache.spark.sql.DataFrame

import graft.streaming.EventStreams

/** Structured Streaming equivalence: each EventStreams transform run as a
  * file stream + memory sink must equal the same transform run in batch
  * mode (the unified-API contract the engine relies on).
  */
class StreamingSpec extends SparkSpec {

  private def batchEvents = Tables.events(spark, sf0001)

  /** The file stream source requires a DIRECTORY; stage the single
    * events.parquet file into one.
    */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def runStream(name: String, transform: DataFrame => DataFrame,
      mode: String): DataFrame = {
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(streamDir)
    val q = transform(stream).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("windowed aggregates: streaming == batch") {
    val streamed = runStream("w_counts", EventStreams.windowedAggregates, "complete")
    val batch = EventStreams.windowedAggregates(batchEvents)
    assert(streamed.count() > 0)
    assert(asSet(streamed) == asSet(batch))
  }

  test("session windows: streaming == batch") {
    val streamed = runStream("w_sessions", EventStreams.sessionWindows(_), "complete")
    val batch = EventStreams.sessionWindows(batchEvents)
    assert(streamed.count() > 0)
    assert(asSet(streamed) == asSet(batch))
  }

  test("watermark drops late data in append mode") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-late-events")
    val t0 = 1700000000L * 1000000000L // nanos, aligned far from corpus times
    def stageEvents(rows: Seq[(Long, Long)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-late-stage")
      rows.map { case (id, tsNs) => (id, tsNs, 1L, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(name))
    }
    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir.toString)
    val q = EventStreams.windowedAggregates(stream).writeStream
      .format("memory").queryName("w_late").outputMode("append").start()
    try {
      // Batch 1: events spanning 0..20min -> watermark advances to +10min.
      stageEvents(Seq((1L, t0), (2L, t0 + 20L * 60 * 1000000000L)), "000.parquet")
      q.processAllAvailable()
      // Batch 2: one event 60min BEFORE t0 (far past the watermark -> must
      // be dropped) plus one at +40min to advance watermark and flush.
      stageEvents(
        Seq((3L, t0 - 60L * 60 * 1000000000L), (4L, t0 + 40L * 60 * 1000000000L)),
        "001.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("w_late")
      .select(col("window_start")).as[Long].collect().toSet
    val lateWindow = (t0 / 1000000000L - 3600) / 300 * 300
    val firstWindow = t0 / 1000000000L / 300 * 300
    assert(emitted.contains(firstWindow), s"on-time window missing from $emitted")
    assert(!emitted.contains(lateWindow), s"late event's window was emitted: $emitted")
  }

  test("stateful user totals (mapGroupsWithState): streaming == batch groupBy") {
    import org.apache.spark.sql.functions._
    val streamed = runStream(
      "w_totals", df => EventStreams.statefulUserTotals(df).toDF(), "update")
    val batch = batchEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
    assert(streamed.count() == batch.count())
    // One trigger -> one update per key; compare counts per user exactly,
    // totals to 1e-6 (sum order differs between the two plans).
    val s = streamed.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val b = batch.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s.keySet == b.keySet)
    s.foreach { case (k, (n, tot)) =>
      assert(n == b(k)._1, s"user $k count")
      assert(math.abs(tot - b(k)._2) < 1e-6, s"user $k total")
    }
  }
}
