package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts [nanos-as-long], user_id, event_type, value, props).
  *
  * Every transform here is WRITTEN ONCE and runs in both batch and
  * streaming mode (the Structured Streaming contract) — the tests run each
  * against a file stream + memory sink AND against the batch read, and
  * assert equality. At scale the streaming shuffle partitions its state by
  * the grouping key; watermarks bound state size for the windowed
  * aggregations.
  */
object EventStreams {

  /** events.ts arrives as nanos-since-epoch Long (see GraftSession's
    * nanosAsLong); convert to a proper event-time timestamp column.
    */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 5-minute event-time windows per event type, 10-minute
    * watermark for late data.
    */
  def windowedAggregates(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Event-time session windows per user (gap-based). */
  def sessionWindows(events: DataFrame, gap: String = "8 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_ts", "1 hour")
      .groupBy(session_window(col("event_ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start"),
        col("n_events"), col("session_value"))

  /** Custom stateful aggregation via mapGroupsWithState: running per-user
    * event count + value total (the arbitrary-state API surface; state is
    * one small record per key, partitioned by the grouping key).
    */
  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  def statefulUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(uid, n, tot)
          state.update(next)
          next
      }
  }
}
