package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** Sliding (hopping) 10-minute windows every 5 minutes per event type
    * — each event contributes to size/slide = 2 overlapping windows (the
    * trailing-indicator shape: "events in the LAST 10 minutes, refreshed
    * every 5"). Same watermark-bounded state as the tumbling form; the
    * duplication factor is the constant size/slide, not data-dependent.
    */
  def slidingAggregates(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "10 minutes", "5 minutes"), col("event_type"))
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

  /** Streaming exact dedup with BOUNDED state: the first event per
    * event_id is emitted, later duplicates arriving within the watermark
    * horizon are dropped, and the key's dedup state is evicted once the
    * watermark passes it. That eviction is what makes dedup feasible on
    * an unbounded stream — a plain dropDuplicates pins every key seen
    * forever. The streaming form of the exact-dedup pipeline op (q23).
    */
  def dedupedEvents(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  case class RawEvent(user_id: Long, event_ts: java.sql.Timestamp, value: Double)
  case class OpenSession(start_ms: Long, end_ms: Long, n: Long, total: Double)
  case class ClosedSession(
      user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, session_value: Double)

  /** Event-time sessionization with EXPLICIT closure via
    * flatMapGroupsWithState + EventTimeTimeout: a user's open session
    * closes (and is emitted, exactly once, in append mode) either when a
    * later event arrives beyond the gap, or when the watermark passes
    * session end + gap (the timeout path — no further event needed).
    * State is one small OpenSession record per active user, evicted on
    * close; contrast q32's session_window aggregation, which emits the
    * same sessions but only exposes them through the aggregation output.
    * In-batch disorder is handled by sorting the group's events; a
    * cross-batch event older than (session start - gap) would need
    * multi-session state — out of scope for this surface.
    */
  def closedSessions(events: DataFrame, gapMinutes: Int = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    withEventTime(events)
      .withWatermark("event_ts", "10 minutes")
      .select(col("user_id"), col("event_ts"), col("value"))
      .as[RawEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[RawEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.start_ms / 1000, s.end_ms / 1000, s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.event_ts.getTime)
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.event_ts.getTime
              cur match {
                case Some(s) if t - s.end_ms <= gapMs =>
                  cur = Some(OpenSession(
                    math.min(s.start_ms, t), math.max(s.end_ms, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += ClosedSession(uid, s.start_ms / 1000, s.end_ms / 1000, s.n, s.total)
                  cur = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  cur = Some(OpenSession(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Timeout fires when the event-time watermark passes
              // session end + gap; must stay above the current watermark.
              state.setTimeoutTimestamp(
                math.max(s.end_ms + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-static enrichment join: each micro-batch joins against the
    * CURRENT static table (planned per batch — broadcast when the dim is
    * small), the standard shape for enriching an event stream with
    * dimension attributes. Stream-static inner joins need no watermark:
    * the static side is not stateful.
    */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"), col("value"))
      .join(dim, "user_id")

  /** Stream-stream interval join: each click pairs with the same user's
    * views from the preceding `maxGapMinutes`. BOTH sides carry a
    * watermark and the join condition bounds click_ts - view_ts to
    * [0, maxGap], which is what makes the join feasible on unbounded
    * streams: the runtime can evict a buffered view once the click-side
    * watermark passes view_ts + maxGap (an unconstrained stream-stream
    * join would pin both sides' state forever). Inner matches emit as
    * soon as both rows arrive. The streaming form of q63's first funnel
    * hop / q39's banded range join.
    */
  def viewClickPairs(events: DataFrame, maxGapMinutes: Int = 30): DataFrame =
    viewClickJoin(events, maxGapMinutes, "inner")

  /** LEFT OUTER variant of [[viewClickPairs]]: views with NO click inside
    * the gap are still emitted, with null click columns — the funnel
    * drop-off shape. Outer rows cannot be emitted when they arrive: the
    * runtime holds each view until the click-side watermark proves no
    * future click can match (watermark past view_ts + maxGap), emits the
    * null-extended row, and evicts the state — the eviction semantics an
    * inner join never exercises (StreamingSpec drives the watermark
    * forward and asserts the expiry-time emission).
    */
  def viewClickPairsOuter(events: DataFrame, maxGapMinutes: Int = 30): DataFrame =
    viewClickJoin(events, maxGapMinutes, "left_outer")

  private def viewClickJoin(
      events: DataFrame, maxGapMinutes: Int, joinType: String): DataFrame = {
    val views = withEventTime(events).where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val clicks = withEventTime(events).where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    views.join(clicks,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $maxGapMinutes MINUTES"),
      joinType)
      // user_id comes from the view side: present on every row, including
      // the null-extended outer rows (c_user is null there).
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        unix_timestamp(col("view_ts")).as("view_s"),
        unix_timestamp(col("click_ts")).as("click_s"))
  }

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

  /** The same running totals on Spark 4's transformWithState — the
    * successor arbitrary-state API (typed per-key state variables on the
    * RocksDB state store, with timers and TTL available). Kept alongside
    * the mapGroupsWithState form so the suite proves both state APIs
    * produce identical results; transformWithState is where schema
    * evolution and multiple state variables live at scale.
    */
  class UserTotalsProcessor extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var totals: ValueState[UserTotals] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent], tv: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(key, 0L, 0.0)
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserTotals(key, n, tot)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def statefulUserTotalsTws(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
