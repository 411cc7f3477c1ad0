package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** Sliding 10-minute windows advancing every 5 minutes, per event
    * type — the overlapping-window variant of [[windowedCounts]]
    * (Spark's `window(col, windowDuration, slideDuration)` emits both
    * covering windows per event). State is keyed (window × type):
    * twice [[windowedCounts]]'s key count for window/slide = 2,
    * still independent of event volume, and the watermark retires
    * windows exactly as in the tumbling case. Batch twin under the
    * driver oracle: [[graft.ops.EventOps.eventsSliding]].
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_cents"))

  /** The events table with ns-long `ts` converted to a proper µs
    * timestamp column — the batch twin's input, sharing the plan with
    * the streaming source.
    */
  def eventsAsTimestamps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Live anomaly flags via a STREAM-STATIC broadcast join — the
    * reference-data enrichment pattern a production monitor runs: the
    * streaming hourly (window × type) counts join a BATCH-computed
    * per-type baseline (mean/std of hourly counts, e.g. refreshed
    * nightly from [[graft.ops.EventOps.eventsAnomaly]]'s history), and
    * each closed window reports its z-score. The static side is a
    * census (one row per event type) and broadcasts — no state beyond
    * the windowed agg's own watermark-bounded keys, and the join adds
    * ZERO streaming state (a static broadcast probe, unlike the
    * stream-stream [[enrichedWithSignup]]). Works identically on a
    * batch input, which is what the parity spec exercises.
    *
    * `baseline`: (event_type, mean_n, std_n). The join is LEFT outer:
    * an event type ABSENT from the baseline is the most anomalous
    * signal a monitor sees (brand-new traffic) and must flag, not
    * vanish through an inner join; a zero-variance baseline (constant
    * history) has no finite z, so any deviation from its mean flags
    * directly; a null std with a present mean (one-window history —
    * stddev_samp of a single sample) can't establish variance and
    * flags like a missing baseline. `z` is null in all three special
    * cases, and `anomalous` is always a real boolean, never null.
    */
  def anomalyFlags(events: DataFrame, baseline: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(baseline), Seq("event_type"), "left")
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"),
        when(col("std_n") > 0,
          round((col("n") - col("mean_n")) / col("std_n"), 4)).as("z"),
        // std_n can be NULL with a PRESENT mean (stddev_samp over a
        // one-window baseline); without the explicit isNull arm the
        // whole disjunction evaluates to NULL and the window silently
        // neither flags nor clears — treat it like a missing baseline:
        // flag, with null z
        (col("mean_n").isNull || col("std_n").isNull ||
          (col("std_n") === 0 && col("n") =!= col("mean_n")) ||
          (col("std_n") > 0 &&
            abs((col("n") - col("mean_n")) / col("std_n")) > 3.0))
          .as("anomalous"))

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
                  // min/max fold: an in-watermark but out-of-order event
                  // arriving in a LATER micro-batch must never shrink the
                  // session envelope (lastMs = t alone would regress the
                  // tail and re-arm eviction early)
                  cur = Some(s.copy(nEvents = s.nEvents + 1,
                    startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t)))
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
                  // min/max fold: an in-watermark but out-of-order event
                  // arriving in a LATER micro-batch must never shrink the
                  // session envelope (lastMs = t alone would regress the
                  // tail and re-arm eviction early)
                  cur = Some(s.copy(nEvents = s.nEvents + 1,
                    startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t)))
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

  case class TwsSessionState(nEvents: Long, revenueCents: Long,
    startMs: Long, lastMs: Long, timerMs: Long)

  case class TwsSession(user_id: Long, n_events: Long, revenue_cents: Long,
    start_ms: Long, duration_ms: Long)

  /** Per-user sessionizer on the `transformWithState` API (SURVEY
    * §7.12's deferred arbitrary-stateful item): the 30-minute-gap
    * semantics of [[sessionizeEventTime]] plus per-session revenue,
    * with the state LIFECYCLE fully explicit — a typed ValueState
    * holds the open session, an event-time timer at last_event + gap
    * is the custom eviction (it fires when the watermark passes:
    * emit the session, clear the state), and superseded timers are
    * deleted by hand. Revenue accumulates in integer cents so the
    * fold is order-independent and the batch-parity oracle exact.
    *
    * Drain-safe: event-time timers fire on watermark advancement, so
    * an AvailableNow backfill terminates (the bench requirement).
    * State per user is ONE fixed-size row + one timer — bounded by
    * active users inside the gap horizon, the same eviction contract
    * the GroupStateTimeout variant has, but owned by the operator.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, TwsSession] {
    @transient private var session: ValueState[TwsSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[TwsSessionState]("session",
        Encoders.product[TwsSessionState], TTLConfig.NONE)

    private def emit(u: Long, s: TwsSessionState) =
      TwsSession(u, s.nEvents, s.revenueCents, s.startMs,
        s.lastMs - s.startMs)

    private def cents(v: Double): Long = math.round(v * 100)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TwsSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = Seq.newBuilder[TwsSession]
      var cur = if (session.exists()) Some(session.get()) else None
      val prevTimer = cur.map(_.timerMs).getOrElse(-1L)
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            // same min/max fold as the GroupState variants: a cross-batch
            // out-of-order event must not regress the session tail
            cur = Some(s.copy(nEvents = s.nEvents + 1,
              revenueCents = s.revenueCents + cents(e.value),
              startMs = math.min(s.startMs, t),
              lastMs = math.max(s.lastMs, t)))
          case Some(s) =>
            closed += emit(user, s)
            cur = Some(TwsSessionState(1, cents(e.value), t, t, -1L))
          case None =>
            cur = Some(TwsSessionState(1, cents(e.value), t, t, -1L))
        }
      }
      cur.foreach { s =>
        // custom eviction: re-arm the gap timer on the session's new
        // tail, dropping the superseded one (timers are per-key
        // resources the operator owns, unlike GroupStateTimeout's
        // single implicit slot)
        val at = s.lastMs + gapMs
        if (prevTimer > 0 && prevTimer != at)
          getHandle.deleteTimer(prevTimer)
        if (prevTimer != at) getHandle.registerTimer(at)
        session.update(s.copy(timerMs = at))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsSession] = {
      // eviction path: the watermark passed last_event + gap with no
      // new rows — close the session and free the state row
      val out =
        if (session.exists()
            && session.get().timerMs == expiredTimerInfo.getExpiryTimeInMs) {
          val s = session.get()
          session.clear()
          Iterator.single(emit(user, s))
        } else Iterator.empty
      out
    }

    /** Warm-start hook ([[SessionProcessorWithInit]]): install an
      * open session from batch history and arm its eviction timer, as
      * if its events had flowed through the stream.
      */
    private[streaming] def seed(s: TwsSessionState): Unit = {
      val at = s.lastMs + gapMs
      getHandle.registerTimer(at)
      session.update(s.copy(timerMs = at))
    }
  }

  /** The transformWithState sessionizer over a watermarked event
    * stream. Requires the RocksDB state store provider (the API's
    * contract) — callers set
    * `spark.sql.streaming.stateStore.providerClass` before start.
    */
  def sessionizeTws(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[TwsSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Warm-start variant of [[SessionProcessor]]
    * (StatefulProcessorWithInitialState): each key's still-open
    * session from a BATCH prefix seeds the state store before the
    * first micro-batch, and its eviction timer is re-armed — the
    * restart-from-history contract a production sessionizer needs
    * (recompute history as a batch job, resume the stream without
    * replaying it).
    */
  class SessionProcessorWithInit(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, TwsSession, TwsSessionState] {
    private val inner = new SessionProcessor(gapMs)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      inner.setHandle(getHandle)
      inner.init(outputMode, timeMode)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TwsSession] =
      inner.handleInputRows(user, rows, timerValues)

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsSession] =
      inner.handleExpiredTimer(user, timerValues, expiredTimerInfo)

    override def handleInitialState(user: Long, st: TwsSessionState,
        timerValues: TimerValues): Unit =
      inner.seed(st)
  }

  /** Still-open sessions at the end of a batch prefix — the initial
    * state for [[sessionizeTwsFrom]]. Per-user fold (one user's
    * history in memory per group — bounded by per-user activity, the
    * same envelope every GroupState sessionizer already has).
    */
  def openSessions(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[(Long, TwsSessionState)] = {
    import spark.implicits._
    events.groupByKey(_.user_id).mapGroups { (user, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur: TwsSessionState = null
      sorted.foreach { e =>
        val t = e.ts.getTime
        val c = math.round(e.value * 100)
        cur =
          if (cur == null || t - cur.lastMs > gapMs)
            TwsSessionState(1, c, t, t, -1L)
          else cur.copy(nEvents = cur.nEvents + 1,
            revenueCents = cur.revenueCents + c, lastMs = t)
      }
      (user, cur)
    }
  }

  /** transformWithState sessionizer seeded with batch-computed open
    * sessions: history was processed once as a batch (its CLOSED
    * sessions are already in the warehouse), the stream resumes from
    * the open tails without replaying a single historical event.
    */
  def sessionizeTwsFrom(spark: SparkSession, events: Dataset[Event],
      initial: Dataset[(Long, TwsSessionState)],
      gapMs: Long = 30L * 60 * 1000): Dataset[TwsSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessorWithInit(gapMs),
        TimeMode.EventTime(), OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
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

  /** Per-session journey digest emitted at session close. */
  case class TwsDigest(user_id: Long, n_events: Long, n_types: Long,
    dominant_type: String, topk_cents: Long, start_ms: Long,
    duration_ms: Long)

  /** Session bounds for [[DigestProcessor]] (counts and top-k live in
    * the composite states, not here).
    */
  case class TwsDigestBounds(nEvents: Long, startMs: Long, lastMs: Long,
    timerMs: Long)

  /** Per-user journey digest on transformWithState's COMPOSITE state
    * types (SURVEY §7.16's deferred ListState/MapState item): the same
    * 30-minute-gap session boundary as [[SessionProcessor]], but the
    * per-session facts live in the state shapes a production journey
    * tracker needs —
    *
    *  - `MapState[String, Long]` holds per-event-type counts, updated
    *    key-wise per batch (O(types touched), never a whole-map
    *    rewrite — the point of MapState over a map-in-ValueState,
    *    which would round-trip the full map every micro-batch);
    *  - `ListState[Long]` holds the top-k event values in integer
    *    cents, appended when under capacity and rewritten (k values)
    *    only when a trim is needed;
    *  - a ValueState carries the session bounds and the event-time
    *    eviction timer, exactly the [[SessionProcessor]] lifecycle.
    *
    * The digest emitted at close: distinct-type count, dominant type
    * (max count, lexicographic tie-break — order-independent), top-k
    * value sum (multiset semantics — order-independent), plus the
    * session envelope. State per user is bounded by the event-type
    * vocabulary + k + one bounds row, evicted whole at close.
    */
  class DigestProcessor(gapMs: Long, k: Int)
      extends StatefulProcessor[Long, Event, TwsDigest] {
    @transient private var bounds: ValueState[TwsDigestBounds] = _
    @transient private var typeCounts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var topCents: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bounds = getHandle.getValueState[TwsDigestBounds]("bounds",
        Encoders.product[TwsDigestBounds], TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      topCents = getHandle.getListState[Long]("top_cents",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def digestOf(user: Long, b: TwsDigestBounds,
        counts: collection.Map[String, Long],
        top: collection.Seq[Long]): TwsDigest = {
      val dominant = counts.minBy { case (t, c) => (-c, t) }._1
      TwsDigest(user, b.nEvents, counts.size, dominant,
        top.sorted.takeRight(k).sum, b.startMs, b.lastMs - b.startMs)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TwsDigest] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = Seq.newBuilder[TwsDigest]
      var cur = if (bounds.exists()) Some(bounds.get()) else None
      val prevTimer = cur.map(_.timerMs).getOrElse(-1L)
      val hadStored = cur.isDefined
      // RocksDB discipline (the profiled 30× fix — the first version
      // cleared + iterated the composite state on EVERY mid-batch
      // session close, ~3 point ops and a CF scan per EVENT at bench
      // density): stored state is read AT MOST ONCE per batch (only
      // the FIRST close can own a stored component), mid-batch
      // sessions live entirely in these batch-local buffers, and the
      // store is written/cleared exactly once at the end.
      var storedLoaded = !hadStored // a fresh key has nothing stored
      var storedCounts: collection.Map[String, Long] = Map.empty
      var storedTop: Seq[Long] = Nil
      def loadStored(): Unit = if (!storedLoaded) {
        val m = scala.collection.mutable.Map.empty[String, Long]
        typeCounts.iterator().foreach { case (ty, c) => m(ty) = c }
        storedCounts = m
        storedTop = topCents.get().toSeq
        storedLoaded = true
      }
      // true once a close consumed the stored contribution: later
      // sessions in this batch are pure-delta and the store must be
      // reset (once) on the way out
      var storeConsumed = false
      var delta = scala.collection.mutable.Map.empty[String, Long]
      var top = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(b) if t - b.lastMs <= gapMs =>
            cur = Some(b.copy(nEvents = b.nEvents + 1,
              startMs = math.min(b.startMs, t),
              lastMs = math.max(b.lastMs, t)))
          case Some(b) =>
            // close: delta over the stored map/top (empty once spent)
            val merged = scala.collection.mutable.Map.empty[String, Long]
            if (!storeConsumed) { loadStored(); storedCounts.foreach {
              case (ty, c) => merged(ty) = c } }
            delta.foreach { case (ty, c) =>
              merged(ty) = merged.getOrElse(ty, 0L) + c }
            val mergedTop =
              (if (storeConsumed) Nil else storedTop) ++ top
            closed += digestOf(user, b, merged, mergedTop)
            storeConsumed = true
            delta = scala.collection.mutable.Map.empty[String, Long]
            top = scala.collection.mutable.ArrayBuffer.empty[Long]
            cur = Some(TwsDigestBounds(1, t, t, -1L))
          case None =>
            cur = Some(TwsDigestBounds(1, t, t, -1L))
        }
        delta(e.event_type) = delta.getOrElse(e.event_type, 0L) + 1
        // in-memory top-k of the DELTA alone: safe because
        // topk(stored ++ topk(delta)) == topk(stored ++ delta) —
        // an element outside topk(delta) is dominated by k delta
        // elements already, so it can never enter the combined top-k
        top += math.round(e.value * 100)
        if (top.length > k) {
          top.sortInPlace()
          top.remove(0, top.length - k)
        }
      }
      cur.foreach { b =>
        if (storeConsumed) {
          // sessions closed this batch: the stored contribution was
          // emitted, so reset once and write the open tail's delta —
          // |delta| puts after one clear, zero point reads
          typeCounts.clear()
          delta.foreach { case (ty, c) => typeCounts.updateValue(ty, c) }
          topCents.put(top.toArray)
        } else if (!hadStored) {
          // brand-new key: pure puts, nothing stored to consult
          delta.foreach { case (ty, c) => typeCounts.updateValue(ty, c) }
          topCents.put(top.toArray)
        } else {
          // continuing stored session, nothing closed: key-wise merge —
          // only types touched this batch round-trip, the full map is
          // NEVER read on this path (the point of MapState over a
          // map-in-ValueState)
          delta.foreach { case (ty, c) =>
            val base =
              if (!typeCounts.containsKey(ty)) 0L
              else typeCounts.getValue(ty)
            typeCounts.updateValue(ty, base + c)
          }
          if (delta.nonEmpty) {
            // one list read decides append-vs-rewrite; k values max
            val stored = topCents.get().toSeq
            if (stored.length + top.length <= k)
              topCents.appendList(top.toArray)
            else {
              val merged = (stored ++ top).sorted.takeRight(k)
              topCents.put(merged.toArray)
            }
          }
        }
        val at = b.lastMs + gapMs
        if (prevTimer > 0 && prevTimer != at) getHandle.deleteTimer(prevTimer)
        if (prevTimer != at) getHandle.registerTimer(at)
        bounds.update(b.copy(timerMs = at))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsDigest] = {
      if (bounds.exists()
          && bounds.get().timerMs == expiredTimerInfo.getExpiryTimeInMs) {
        val b = bounds.get()
        val counts = scala.collection.mutable.Map.empty[String, Long]
        typeCounts.iterator().foreach { case (ty, c) => counts(ty) = c }
        val top = topCents.get().toSeq
        bounds.clear(); typeCounts.clear(); topCents.clear()
        Iterator.single(digestOf(user, b, counts, top))
      } else Iterator.empty
    }
  }

  /** The journey-digest processor over a watermarked event stream
    * (RocksDB state store required, like [[sessionizeTws]]).
    */
  def journeyDigest(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000, k: Int = 3): Dataset[TwsDigest] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new DigestProcessor(gapMs, k),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One ranked evidence row of a closed session's top-k. */
  case class TopkEvidence(user_id: Long, start_ms: Long, rank: Int,
    event_id: Long, cents: Long)

  /** Per-session top-k evidence WITH IDENTITY on
    * `MapState[event_id, cents]` — the state shape [[DigestProcessor]]'s
    * top-k SUM cannot express (SURVEY §7.23): a review pipeline needs
    * WHICH events were the session's largest, so the k entries keep
    * their event ids as map keys and displacement is pure point ops
    * (removeKey the evicted id, updateValue the entrant) — never a
    * whole-structure rewrite. Same session lifecycle, batch-local
    * delta discipline and single store write per key-batch as the
    * digest (its profiled RocksDB contract); state per user is ≤ k
    * map entries + one bounds row, evicted whole at close.
    *
    * Emission at close: the merged top-k as (rank, event_id, cents)
    * rows ordered (cents desc, event_id asc) — exactly the batch twin
    * [[graft.ops.EventOps.eventsSessionTopk]]'s ordering.
    */
  class TopkEvidenceProcessor(gapMs: Long, k: Int)
      extends StatefulProcessor[Long, Event, TopkEvidence] {
    @transient private var bounds: ValueState[TwsDigestBounds] = _
    @transient private var topEvents: org.apache.spark.sql.streaming.MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bounds = getHandle.getValueState[TwsDigestBounds]("bounds",
        Encoders.product[TwsDigestBounds], TTLConfig.NONE)
      topEvents = getHandle.getMapState[Long, Long]("top_events",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    /** (cents desc, event_id asc) — a beats b. */
    private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

    private def topkOf(es: Seq[(Long, Long)]): Seq[(Long, Long)] =
      es.sortWith(beats).take(k)

    private def emitRows(user: Long, startMs: Long,
        es: Seq[(Long, Long)]): Iterator[TopkEvidence] =
      topkOf(es).zipWithIndex.map { case ((id, c), i) =>
        TopkEvidence(user, startMs, i + 1, id, c)
      }.iterator

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TopkEvidence] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = Seq.newBuilder[TopkEvidence]
      var cur = if (bounds.exists()) Some(bounds.get()) else None
      val prevTimer = cur.map(_.timerMs).getOrElse(-1L)
      val hadStored = cur.isDefined
      // stored map read at most once per batch (first close only),
      // mid-batch sessions live in the batch-local buffer, store
      // written/diffed exactly once at the end — the digest contract
      var storedLoaded = !hadStored
      var storedTop: Seq[(Long, Long)] = Nil
      def loadStored(): Unit = if (!storedLoaded) {
        storedTop = topEvents.iterator().toSeq
        storedLoaded = true
      }
      var storeConsumed = false
      var top = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def trim(): Unit = if (top.length > k) {
        val kept = topkOf(top.toSeq)
        top.clear(); top ++= kept
      }
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(b) if t - b.lastMs <= gapMs =>
            cur = Some(b.copy(nEvents = b.nEvents + 1,
              startMs = math.min(b.startMs, t),
              lastMs = math.max(b.lastMs, t)))
          case Some(b) =>
            if (!storeConsumed) loadStored()
            val merged = (if (storeConsumed) Nil else storedTop) ++ top
            closed ++= emitRows(user, b.startMs, merged)
            storeConsumed = true
            top = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            cur = Some(TwsDigestBounds(1, t, t, -1L))
          case None =>
            cur = Some(TwsDigestBounds(1, t, t, -1L))
        }
        // topk(stored ++ topk(delta)) == topk(stored ++ delta): an
        // element outside topk(delta) is dominated by k delta entries
        top += ((e.event_id, math.round(e.value * 100)))
        trim()
      }
      cur.foreach { b =>
        if (storeConsumed) {
          // stored contribution emitted: one clear + ≤k puts
          topEvents.clear()
          top.foreach { case (id, c) => topEvents.updateValue(id, c) }
        } else if (!hadStored) {
          top.foreach { case (id, c) => topEvents.updateValue(id, c) }
        } else if (top.nonEmpty) {
          // continuing session: merge and apply the DIFF as point ops —
          // evicted ids removeKey, entrants updateValue; survivors'
          // cents never change (event ids are unique), so untouched
          // keys never round-trip the store
          loadStored()
          val merged = topkOf(storedTop ++ top)
          val before = storedTop.map(_._1).toSet
          val after = merged.map(_._1).toSet
          (before -- after).foreach(topEvents.removeKey)
          merged.filterNot { case (id, _) => before(id) }
            .foreach { case (id, c) => topEvents.updateValue(id, c) }
        }
        val at = b.lastMs + gapMs
        if (prevTimer > 0 && prevTimer != at) getHandle.deleteTimer(prevTimer)
        if (prevTimer != at) getHandle.registerTimer(at)
        bounds.update(b.copy(timerMs = at))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TopkEvidence] = {
      if (bounds.exists()
          && bounds.get().timerMs == expiredTimerInfo.getExpiryTimeInMs) {
        val b = bounds.get()
        val es = topEvents.iterator().toSeq
        bounds.clear(); topEvents.clear()
        emitRows(user, b.startMs, es)
      } else Iterator.empty
    }
  }

  /** The top-k-evidence processor over a watermarked event stream
    * (RocksDB state store required, like [[sessionizeTws]]).
    */
  def sessionTopk(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000, k: Int = 3): Dataset[TopkEvidence] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TopkEvidenceProcessor(gapMs, k),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
