package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.tables.Tables

/** Structured Streaming surface (SURVEY.md §2.5).
  *
  * The same logical plan serves batch and stream (run it over a batch
  * DataFrame or a readStream source unchanged) — the spec proves
  * batch/stream parity by feeding the same rows through both.
  *
  * Scale design: the windowed aggregation keys state by
  * (window, event_type) — state size is bounded by windows-in-flight ×
  * type cardinality, independent of event volume; the watermark lets
  * Spark evict closed windows. The sessionizer keys state by user with
  * an explicit timeout, so idle users are evicted too.
  */
object EventsStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class SessionState(nEvents: Long, startMs: Long, lastMs: Long)

  case class Session(user_id: Long, n_events: Long, start_ms: Long,
    duration_ms: Long)

  /** Tumbling 5-minute windows per event type; works on batch and
    * streaming inputs alike. Input needs (ts: timestamp, event_type,
    * value).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** The events table with ns-long `ts` converted to a proper µs
    * timestamp column — the batch twin's input, sharing the plan with
    * the streaming source.
    */
  def eventsAsTimestamps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Stateful streaming sessionizer: 30-minute-gap sessions per user
    * via flatMapGroupsWithState with a processing-time timeout.
    * Emits a session when the gap closes it; timeout flushes the rest.
    */
  def sessionize(spark: SparkSession,
      events: org.apache.spark.sql.Dataset[Event],
      gapMs: Long = 30L * 60 * 1000)
      : org.apache.spark.sql.Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.nEvents, s.startMs, s.lastMs - s.startMs))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastMs = t))
                case Some(s) =>
                  closed += Session(userId, s.nEvents, s.startMs,
                    s.lastMs - s.startMs)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutDuration(gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Drain-safe sessionizer: same 30-minute-gap semantics but with an
    * EVENT-time timeout against the watermark, so a backfill run under
    * `Trigger.AvailableNow` terminates — a processing-time timeout
    * keeps scheduling micro-batches forever under that trigger, which
    * is why this variant exists (and why only it may go in Bench).
    * Input must carry a watermark on `ts` before the groupByKey.
    */
  def sessionizeEventTime(spark: SparkSession,
      events: org.apache.spark.sql.Dataset[Event],
      gapMs: Long = 30L * 60 * 1000)
      : org.apache.spark.sql.Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.nEvents, s.startMs, s.lastMs - s.startMs))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastMs = t))
                case Some(s) =>
                  closed += Session(userId, s.nEvents, s.startMs,
                    s.lastMs - s.startMs)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // close the open session once the watermark passes its
                // last event + gap — fires during the drain batches
                state.setTimeoutTimestamp(s.lastMs + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream enrichment join: every non-signup event joined to
    * its user's signup events within a bounded event-time range
    * (signup at-or-before the event, at most 30 days earlier) — the
    * streaming sibling of the batch as-of join. BOTH sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions, which is what lets Spark evict join state; without
    * the range bound a stream-stream join buffers forever. Inner join
    * → results emit as soon as both sides match, no watermark wait.
    * Works identically on batch inputs (the spec proves parity).
    */
  def enrichedWithSignup(events: DataFrame): DataFrame = {
    val ev = events.filter(col("event_type") =!= "signup")
      .withWatermark("ts", "1 hour")
    val su = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    ev.join(su,
      col("user_id") === col("s_user")
        && col("signup_ts") <= col("ts")
        && col("signup_ts") >= col("ts") - expr("INTERVAL 30 DAYS"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("signup_ts"))
  }

  /** Streaming exactly-once dedup: drop re-delivered events by id
    * inside the watermark horizon — the ingest-side twin of the batch
    * exact-dedup operator. dropDuplicatesWithinWatermark keys state on
    * event_id ALONE, so a redelivery with a re-stamped timestamp (the
    * common at-least-once case) still dedups; state holds one entry
    * per id seen within the horizon and the watermark evicts older
    * ones, so state is bounded by arrival rate × horizon, not stream
    * length.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
}
