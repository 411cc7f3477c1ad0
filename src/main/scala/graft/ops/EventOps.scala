package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Event-stream analytics (SURVEY.md §2.2): the batch twins of the
  * streaming pipeline in graft.streaming.EventsStream.
  *
  * The events source carries nanosecond timestamps, which Spark 4 won't
  * read as TIMESTAMP (µs); the session sets
  * `spark.sql.legacy.parquet.nanosAsLong`, so `ts` arrives as BIGINT
  * nanos and all time math here is exact integer arithmetic — which is
  * also what makes the DuckDB oracle (epoch_ns) hash-match bit for bit.
  */
object EventOps {

  private val NanosPerSec = 1000000000L

  /** Tumbling 5-minute windows per event type: one partial-agg shuffle
    * keyed by (window, type) — state per key, not per event, which is
    * what keeps the streaming twin's state bounded too.
    */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        (expr(s"ts div ${300L * NanosPerSec}") * 300).as("win_start_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("win_start_epoch", "event_type")

  /** Sliding 10-minute windows advancing every 5 minutes, per event
    * type — the overlapping-window twin of [[eventsWindow]]. Each
    * event covers exactly window/slide = 2 starts, materialized with
    * a 2-element explode (the same covering-window trick Spark's own
    * `window()` uses), so the expansion is a constant factor and the
    * shuffle stays keyed on (window, type) — state per key, never per
    * event. Batch twin of
    * [[graft.streaming.EventsStream.slidingCounts]].
    */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame = {
    val slideNs = 300L * NanosPerSec // 5 min
    Tables.events(spark, dir)
      .select(col("event_type"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("base", expr(s"ts div $slideNs") * slideNs)
      .select(col("event_type"), col("cents"),
        explode(array(col("base"), col("base") - slideNs)).as("ws"))
      .groupBy(expr(s"ws div $NanosPerSec").as("win_start_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("win_start_epoch", "event_type")
  }

  /** As-of join: every event paired with the user's most recent signup
    * at-or-before it — runs on the custom AsOfJoinExec operator
    * (graft.plans.AsOfJoin), oracle-checked against DuckDB's native
    * ASOF JOIN.
    */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val s = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .distinct()
    graft.plans.AsOf.asofJoin(e, s, "user_id", "s_user", "ts", "signup_ts")
      .select(col("event_id"), col("user_id"),
        expr(s"ts div $NanosPerSec").as("event_epoch"),
        expr(s"signup_ts div $NanosPerSec").as("signup_epoch"),
        expr(s"(ts - signup_ts) div $NanosPerSec").as("lag_sec"))
      .orderBy("event_id")
  }

  /** JSON metadata extraction — the reference keeps arbitrary metadata
    * in JSONB columns (frames.py/frames_global.py metadata_json); the
    * events `props` column plays that role here: extract a typed field
    * and aggregate it per event type.
    */
  def propsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Sessionization: per-user 30-minute-gap sessions via lag + running
    * sum, all in integer nanos. Shuffles once on user_id; both window
    * passes reuse that partitioning (single sort, no second exchange).
    */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > 1800L * NanosPerSec, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("bigint"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        expr(s"min(ts) div $NanosPerSec").as("start_epoch"))
      .orderBy("user_id", "session_idx")
  }

  /** Batch twin of [[graft.streaming.EventsStream.journeyDigest]]:
    * per-session journey digests (distinct-type count, dominant type,
    * top-3 value sum) over the same 30-minute-gap sessions — the
    * digest semantics under the driver's DuckDB oracle, where the
    * streaming variant is spec-checked.
    *
    * Parity: cents are fixed-pointed with `floor(value·100 + 0.5)`
    * (pure IEEE double arithmetic, bit-identical on both engines);
    * the dominant type is `min_by(type, (-n, type))` — max count,
    * lexicographic tie-break; the top-3 sum is a multiset (boundary
    * ties carry equal values), so every digest is order-independent.
    *
    * Plan shape: sessionize with one user_id window (single shuffle,
    * both window passes share the sort), then TWO nested partial-agg
    * levels and NO join — per-(session,type) partials carry their own
    * top-3 arrays, and the session level merges them (the global
    * top-3 is the top-3 of the per-type top-3s), so nothing bigger
    * than 3 longs per type crosses the second exchange.
    */
  def eventsJourneyDigest(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > 1800L * NanosPerSec, 1)
          .otherwise(0))
      .withColumn("sess",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("bigint"))
    val perType = sess
      .groupBy("user_id", "sess", "event_type")
      .agg(count(lit(1)).as("n"),
        slice(sort_array(collect_list(col("cents")), asc = false), 1, 3)
          .as("top3"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    perType
      .groupBy("user_id", "sess")
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_types"),
        min_by(col("event_type"), struct((-col("n")).as("neg_n"),
          col("event_type"))).as("dominant_type"),
        aggregate(
          slice(sort_array(flatten(collect_list(col("top3"))), asc = false),
            1, 3),
          lit(0L), (acc, x) => acc + x).as("topk_cents"),
        expr(s"min(min_ts) div $NanosPerSec").as("start_epoch"),
        expr(s"(max(max_ts) - min(min_ts)) div $NanosPerSec")
          .as("duration_sec"))
      .drop("sess")
      .orderBy("user_id", "start_epoch")
  }

  /** Per-session top-k evidence WITH IDENTITY — the review list the
    * digest's top-k SUM deliberately drops: for each 30-minute-gap
    * session, the 3 highest-value events as (rank, event_id, cents)
    * rows — the concrete events an attribution or fraud review opens
    * first. Batch twin of
    * [[graft.streaming.EventsStream.sessionTopk]] (the MapState
    * point-op processor), under the DuckDB oracle.
    *
    * Plan shape: the one user-window sessionization shuffle shared by
    * every session op, then the bounded [[graft.functions.TopKByScore]]
    * aggregate per (user, session) — k-row map-side partials, never a
    * window over all events by value. Cents are exact longs riding
    * the double score (≪ 2^53); ordering (cents desc, event_id asc)
    * on both engines.
    */
  def eventsSessionTopk(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > 1800L * NanosPerSec, 1)
          .otherwise(0))
      .withColumn("sess",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("bigint"))
    sess.groupBy("user_id", "sess")
      .agg(graft.functions.TopKByScore
        .topk(col("cents").cast("double"), col("event_id"), 3).as("top"),
        expr(s"min(ts) div $NanosPerSec").as("start_epoch"))
      .select(col("user_id"), col("start_epoch"),
        posexplode(col("top")).as(Seq("p", "t")))
      .select(col("user_id"), col("start_epoch"),
        (col("p") + 1).cast("bigint").as("rank"),
        col("t.id").as("event_id"),
        col("t.score").cast("long").as("cents"))
      .orderBy("user_id", "start_epoch", "rank")
  }

  /** Weekly new-vs-returning split — the growth-accounting view on
    * top of [[eventsRetention]]'s cohort triangle: per activity week,
    * how many active users were in their FIRST week vs returning.
    * No user-level self-join: one distinct (user, week) pass, then
    * each user's min week and week set come from the same per-user
    * aggregate (the week list is bounded by the time range, not the
    * corpus), re-exploded to the ≤weeks-sized census.
    */
  def eventsNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val weekNs = 7L * 86400L * NanosPerSec
    Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div $weekNs").as("week"))
      .distinct()
      .groupBy("user_id")
      .agg(min("week").as("fw"), collect_set("week").as("weeks"))
      .select(col("fw"), explode(col("weeks")).as("week"))
      .groupBy("week")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("week") === col("fw"), 1L).otherwise(0L))
          .as("n_new"))
      .select(col("week"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        round(col("n_new") * 100.0 / col("n_active"), 4).as("pct_new"))
      .orderBy("week")
  }

  /** Weekly growth accounting — the user-lifecycle ledger one rung
    * above [[eventsNewVsReturning]]'s new/returning split (the
    * "growth accounting" table a product review opens first): per
    * week, active users decomposed into NEW (first week ever),
    * RETAINED (also active the week before) and RESURRECTED (active
    * before, but not last week), plus CHURNED (active last week, not
    * this one — a churn EVENT counted once at the gap's start, not in
    * every silent week) and the identity-bearing net growth
    * new + resurrected − churned = Δactive (spec-asserted).
    *
    * One per-user aggregate carries everything: first week + the
    * sorted distinct week set — every state classifies against the
    * user's OWN array (array_contains on week±1), so there is no
    * (user, week) self-join anywhere; churn candidates explode from
    * the same array. The only corpus-sized exchange is the distinct
    * (user, week) pass; the global max week is a one-row census
    * broadcast; output is ≤ weeks rows.
    */
  def eventsUserLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val weekNs = 7L * 86400L * NanosPerSec
    lifecycleOf(Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div $weekNs").as("week")))
  }

  /** The lifecycle ledger over any (user_id, week) activity frame —
    * split out so the spec can plant a churn/resurrection pattern the
    * dense synthetic corpus never produces (every user is active
    * every week there).
    */
  private[graft] def lifecycleOf(activity: DataFrame): DataFrame = {
    val perUser = activity
      .select(col("user_id"), col("week"))
      .distinct()
      .groupBy("user_id")
      .agg(min("week").as("fw"),
        sort_array(collect_set("week")).as("weeks"))
    val maxW = perUser.agg(max(expr("element_at(weeks, -1)")).as("mw"))
    // one-row census cross join — declared, broadcast
    val base = perUser.join(broadcast(maxW), lit(true))
    val states = base
      .select(col("fw"), col("weeks"), explode(col("weeks")).as("week"))
      .select(col("week"),
        when(col("week") === col("fw"), lit("new"))
          .when(expr("array_contains(weeks, week - 1)"), lit("retained"))
          .otherwise(lit("resurrected")).as("state"))
    val churned = base
      .select(col("weeks"), col("mw"), explode(col("weeks")).as("aw"))
      .filter(!expr("array_contains(weeks, aw + 1)")
        && col("aw") + 1 <= col("mw"))
      .select((col("aw") + 1).as("week"), lit("churned").as("state"))
    states.unionByName(churned)
      .groupBy("week")
      .agg(
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("state") === "churned", 1L).otherwise(0L))
          .as("n_churned"))
      .select(col("week"),
        (col("n_new") + col("n_retained") + col("n_resurrected"))
          .as("n_active"),
        col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_churned"),
        (col("n_new") + col("n_resurrected") - col("n_churned"))
          .as("net_growth"))
      .orderBy("week")
  }

  /** Pareto-tail power-law fit: the Hill estimator of the per-user
    * activity tail index over the top-100 users — the one-number
    * companion of [[eventsPareto]]'s concentration share (α near 1
    * means a catastrophically heavy tail for shuffle sizing; α > 2
    * means bounded variance and safe uniform partitioning).
    * α̂ = k / Σ_{i≤k} ln(x_i / x_{k+1}) over the order statistics.
    *
    * Per-user counting is one map-combined exchange; the top-(k+1)
    * rides TakeOrderedAndProject (never a global user sort), the rank
    * window covers ≤101 survivors, each log ratio casts to DECIMAL
    * per row (exact sum), and the boundary row broadcasts.
    */
  def eventsPowerLaw(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(20,10)"
    val top = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(101)
    val w = Window.orderBy(col("n_events").desc, col("user_id"))
    val ranked = top.withColumn("rk", row_number().over(w))
    val boundary = ranked
      .agg(max(struct(col("rk"), col("n_events"))).as("b"))
      .select(col("b.rk").as("krk"), col("b.n_events").as("x_kp1"))
    ranked.crossJoin(broadcast(boundary))
      .filter(col("rk") < col("krk"))
      .select(col("x_kp1"),
        log(col("n_events").cast("double") / col("x_kp1"))
          .cast(dec).as("lx"))
      .groupBy("x_kp1")
      .agg(count(lit(1)).as("k_used"), sum(col("lx")).as("s"))
      .select(col("k_used"), col("x_kp1"),
        when(col("s") > lit(0).cast(dec),
          round(col("k_used") / col("s").cast("double"), 6))
          .as("alpha"))
  }

  /** Time-to-convert distribution: per converting user (first
    * purchase at or after first signup), the signup→purchase lag in
    * whole days, capped into a 15-bucket histogram with per-bucket and
    * cumulative shares — the curve a growth team reads conversion
    * velocity off. Both firsts come from ONE per-user conditional-min
    * aggregate (map-side combined, no self-join of the events table);
    * the bucket census is ≤15 rows, so the cumulative window and the
    * one-row total broadcast are driver-trivial at any corpus size.
    */
  def eventsConversionLag(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("s_ts"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p_ts"))
      .filter(col("p_ts") >= col("s_ts"))
    val counts = perUser
      .select(least(expr(s"(p_ts - s_ts) div $dayNs"), lit(14L))
        .as("lag_days"))
      .groupBy("lag_days")
      .agg(count(lit(1)).as("n_users"))
    val total = counts.agg(sum("n_users").as("tot"))
    val w = Window.orderBy("lag_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(total))
      .withColumn("cum_users", sum("n_users").over(w))
      .select(col("lag_days"), col("n_users"),
        round(col("n_users") * 100.0 / col("tot"), 4).as("pct"),
        round(col("cum_users") * 100.0 / col("tot"), 4).as("cum_pct"))
      .orderBy("lag_days")
  }

  /** Conversion funnel view → click → purchase, defined on strictly
    * increasing first-occurrence times per user. One shuffle
    * (per-user conditional-min agg, map-side combined), then a scalar
    * roll-up — no joins, no window.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    def firstTs(t: String) =
      min(when(col("event_type") === t, col("ts")))
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(firstTs("view").as("tv"), firstTs("click").as("tc"),
        firstTs("purchase").as("tp"))
      .agg(
        count(col("tv")).as("n_view"),
        sum(when(col("tc") > col("tv"), 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("tc") > col("tv") && col("tp") > col("tc"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
  }

  /** Windowed funnel (the ClickHouse `windowFunnel` shape): the
    * view → click → purchase chain where EACH step follows the
    * previous within 24 h — unlike [[eventsFunnel]]'s
    * any-time-ordering, this is the conversion-window semantics
    * product analytics actually uses. Emits the user census per
    * funnel depth 0–3 (0 = active user with no qualifying view).
    *
    * Plan shape: three conditional-min aggregates chained by
    * user_id-keyed joins — every exchange hashes the same key, so
    * Catalyst reuses one shuffle layout; no window over event rows,
    * output bounded at 4 rows.
    */
  def eventsWindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val winNs = 86400L * NanosPerSec
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val users = ev.select("user_id").distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("tv") && col("ts") <= col("tv") + winNs)
      .groupBy("user_id").agg(min(col("ts")).as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("tc") && col("ts") <= col("tc") + winNs)
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    users
      .join(v.select(col("user_id"), lit(1).as("d1")), Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1).as("d2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("d3")), Seq("user_id"), "left")
      .select(when(col("d3").isNotNull, 3)
        .when(col("d2").isNotNull, 2)
        .when(col("d1").isNotNull, 1)
        .otherwise(0).as("funnel_depth"))
      .groupBy("funnel_depth")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("funnel_depth")
  }

  /** Daily cohort retention: cohort = day of a user's first event,
    * counted distinct-active at offsets 0-7 days. The first-day agg
    * and the join back both hash on user_id, so Catalyst reuses one
    * exchange; output state is per (cohort, offset) — independent of
    * event volume.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Event-type transition matrix: per-user consecutive event bigrams
    * via lag over (ts, event_id), counted per (prev, curr) pair — the
    * Markov-chain feature extraction of a behavioral pipeline. One
    * shuffle on user_id for the window, one partial-agg shuffle on the
    * 25-key transition matrix.
    */
  /** Daily volume-anomaly detection: each (event_type, day)'s count
    * z-scored against that type's whole-history daily distribution,
    * flagged at |z| > 2 — the ingest-volume regression alarm of a
    * production event pipeline. All moments are exact integer sums
    * (counts of counts), so mean/variance/z derive from identical
    * integers on both engines — no float-order dependence. Shuffle
    * shape: one partial-agg exchange for the daily counts, a tiny
    * per-type moment aggregate broadcast back over them.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("n").as("sum_n"),
        sum(col("n") * col("n")).as("sum_n2"))
      .filter(col("n_days") > 1)
    daily.join(broadcast(stats), "event_type")
      .withColumn("mean", col("sum_n").cast("double") / col("n_days"))
      .withColumn("variance",
        (col("sum_n2").cast("double")
          - col("n_days") * col("mean") * col("mean"))
          / (col("n_days") - 1))
      .withColumn("z",
        when(col("variance") <= 0, lit(0.0))
          .otherwise(round((col("n") - col("mean")) / sqrt(col("variance")),
            4)))
      .select(col("event_type"), col("day"), col("n"), col("z"),
        (abs(col("z")) > 2).cast("int").as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Inter-arrival-time profile: per event type, exact p50/p90 of the
    * gap (seconds) between a user's consecutive events of that type —
    * the latency/cadence profile behind rate limiting and session-gap
    * tuning. The lag window and the nothing-else-shared percentile
    * aggregate are both keyed off one (user, type) exchange; gaps are
    * exact integer nanos so the interpolated percentiles are
    * engine-identical (Spark `percentile` ↔ DuckDB `quantile_cont`).
    */
  def eventsInterArrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag("ts", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_sec",
        ((col("ts") - col("prev")).cast("double") / NanosPerSec))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap_sec, 0.5)"), 4).as("p50_gap_sec"),
        round(expr("percentile(gap_sec, 0.9)"), 4).as("p90_gap_sec"))
      .orderBy("event_type")
  }

  /** Events-in-windows via the custom broadcast RANGE JOIN operator
    * ([[graft.plans.RangeJoinExec]]): 240 synthesized 2-6 h
    * maintenance windows on a 3 h stride (overlapping by
    * construction) joined to every event whose timestamp falls inside
    * — per-window event and user counts. Spark's native plan for the
    * containment predicate is an O(|L|·|R|) nested loop; the custom
    * operator pays O(log |R| + overlap) per event and never shuffles
    * the fact at all (one partial-agg exchange for the counts only).
    */
  def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val baseNs = 1704067200L * NanosPerSec // 2024-01-01T00:00:00Z
    val hourNs = 3600L * NanosPerSec
    val windows = spark.range(240).select(
      col("id").as("window_id"),
      (lit(baseNs) + col("id") * (3 * hourNs)).as("start_ns"),
      (lit(baseNs) + col("id") * (3 * hourNs)
        + (lit(2L) + col("id") % 5) * hourNs).as("end_ns"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.RangeJoinOp
      .rangeJoin(ev, windows, "ts", "start_ns", "end_ns")
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("window_id")
  }

  /** The per-user lag-bigram transition counts (src, dst, n) — ONE
    * definition shared by the raw census [[eventsTransitions]] and
    * the stationary-distribution summary [[eventsMarkovStationary]],
    * so the matrix the latter iterates can never silently drift from
    * the census it claims to summarize.
    */
  private def typeBigrams(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  def eventsTransitions(spark: SparkSession, dir: String): DataFrame =
    typeBigrams(spark, dir)
      .select(col("src").as("prev_type"), col("dst").as("curr_type"),
        col("n"))
      .orderBy("prev_type", "curr_type")

  /** Stationary distribution of the event-type Markov chain — the
    * long-run visit share [[eventsTransitions]]' bigram matrix
    * implies (where user attention settles if behavior keeps its
    * current dynamics — the one-number-per-type summary read next to
    * the raw transition census): 12 synchronous power-iteration steps
    * v' = vᵀP from the uniform start over the row-stochastic matrix;
    * types that never occur as a transition SOURCE have no row (and
    * absorb no long-run mass by construction on both engines).
    *
    * Engine-exact by construction: P = count/total in exact IEEE
    * double division cast straight to DECIMAL(18,12) (half-up ties,
    * identical on both engines); each step multiplies two scale-12
    * decimals — EXACT (37,24) products inside both engines' 38-digit
    * width — sums them exactly (order-independent), and rounds back
    * to 12 dp in exact decimal arithmetic, so both engines walk
    * bit-identical iterates.
    *
    * 100 TB shape: the corpus is touched ONCE (the per-user lag
    * bigram count — the same shuffle [[eventsTransitions]] pays);
    * the matrix (≤T² rows) and the iterate (≤T rows) are census-sized
    * and materialized per step (localCheckpoint — the dupLabels
    * discipline), so the 12 steps cost 12 tiny census jobs, never a
    * second fact scan.
    */
  def eventsMarkovStationary(spark: SparkSession,
      dir: String): DataFrame = {
    // the ONE corpus-touching job: everything below reads this ≤T²
    // census leaf, never the fact again
    val trans = typeBigrams(spark, dir).localCheckpoint(false)
    // a type that appears only as a destination (sink) would silently
    // leak stationary mass at every power step below (v.join(pmat,
    // "src") discards its row), turning the output into a
    // non-distribution. No such type exists in an events corpus whose
    // sessions continue past every type, but fail loudly with the
    // offending names rather than emit quietly-wrong mass. Census-sized
    // set difference on the checkpointed ≤T² leaf — never the fact.
    val sinks = trans.select(col("dst")).except(trans.select(col("src")))
      .limit(5).collect().map(_.getString(0))
    require(sinks.isEmpty, "markov stationary requires every event type" +
      s" to out-transition; sink-only types: ${sinks.mkString(",")}")
    val totals = trans.groupBy("src").agg(sum("n").as("tot"))
    val pmat = trans.join(broadcast(totals), "src")
      .select(col("src"), col("dst"),
        (col("n").cast("double") / col("tot"))
          .cast("decimal(18,12)").as("p"))
      .localCheckpoint(false)
    val nTypes = pmat.select("src").distinct()
      .agg(count(lit(1)).as("t"))
    // one-row census cross join — declared, broadcast
    var v = pmat.select("src").distinct()
      .join(broadcast(nTypes), lit(true))
      .select(col("src"),
        (lit(1.0) / col("t")).cast("decimal(18,12)").as("pi"))
      .localCheckpoint(false)
    for (_ <- 1 to 12) {
      v = v.join(pmat, "src")
        .groupBy(col("dst"))
        .agg(sum(col("pi") * col("p")).as("s"))
        .select(col("dst").as("src"),
          round(col("s"), 12).cast("decimal(18,12)").as("pi"))
        .localCheckpoint(false)
    }
    v.join(broadcast(totals), Seq("src"))
      .select(col("src").as("event_type"), col("tot").as("n_out"),
        round(col("pi").cast("double"), 10).as("pi"))
      .orderBy("event_type")
  }

  /** Top-20 three-step user paths (the "path analysis" report of a
    * product-analytics suite, one order up from [[eventsTransitions]]'
    * Markov bigrams): consecutive event-type trigrams per user in
    * (ts, event_id) order, counted corpus-wide, ranked (n desc, path).
    * The lead window partitions by user — per-user state only, the
    * same scale declaration as every sessionize twin — and the final
    * top-20 compiles to TakeOrderedAndProject (distributed partial
    * top-k), never a global sort.
    */
  def eventsPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(byUser))
      .withColumn("t3", lead(col("event_type"), 2).over(byUser))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(20)
  }

  /** DAU / trailing-7-day WAU per day. Rolling DISTINCT counts don't
    * fit window frames (no count(DISTINCT) over RANGE), so each
    * active (user, day) pair is exploded onto the up-to-7 future days
    * it covers — turning the rolling distinct into a plain groupBy
    * count(DISTINCT) per covered day. Linear in activity × window,
    * no self-join, no range join.
    */
  def eventsDauWau(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val active = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .distinct()
    val span = active.agg(min("day").as("d0"), max("day").as("d1")).head()
    val (d0, d1) = (span.getLong(0), span.getLong(1))
    val dau = active.groupBy("day")
      .agg(countDistinct("user_id").as("dau"))
    val wau = active
      .withColumn("cover", explode(expr(s"sequence(day, least(day + 6, $d1))")))
      .filter(col("cover") >= d0 + 6) // only full 7-day windows
      .groupBy(col("cover").as("day"))
      .agg(countDistinct("user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") * 100.0 / col("wau"), 2).as("stickiness_pct"))
      .orderBy("day")
  }

  /** Resample to a dense per-user daily grid with gap filling: days
    * with no events appear with n=0, and last_seen_day carries the
    * most recent active day forward (window `last` with ignoreNulls).
    * The grid is generated with sequence+explode over the observed
    * span — no driver loop; one shuffle on user_id that both the join
    * and the window reuse.
    */
  def eventsResample(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val daily = Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"),
        col("value"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
    val span = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
    val grid = span
      .select(col("user_id"),
        explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
        when(col("n").isNotNull, col("day")).as("active_day"))
      .withColumn("last_seen_day",
        last(col("active_day"), ignoreNulls = true).over(w))
      .drop("active_day")
      .orderBy("user_id", "day")
  }

  /** Drop-off audit: user-days with views but no purchase that day — a
    * left-anti join of the per-(user, day) view roll-up against the
    * distinct buyer-day set. Both sides hash on the same composite
    * key, and the buyer side collapses to distinct keys before the
    * join.
    */
  def eventsDropoff(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"))
    val viewers = e.filter(col("event_type") === "view")
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_views"))
    val buyers = e.filter(col("event_type") === "purchase")
      .select("user_id", "day").distinct()
    viewers.join(buyers, Seq("user_id", "day"), "left_anti")
      .orderBy("user_id", "day")
  }

  /** Hour-of-day × day-of-week activity matrix — the seasonality
    * heatmap behind capacity planning and anomaly baselines. Bucket
    * arithmetic is pure epoch-integer math (epoch day 0 = Thursday;
    * +4 maps 0 to Sunday), so both engines bucket identically with no
    * timezone machinery; one partial-agg exchange on ≤ 168 keys.
    */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * NanosPerSec
    val dayNs = 86400L * NanosPerSec
    Tables.events(spark, dir)
      .select(
        expr(s"(ts div $dayNs + 4) % 7").as("dow"),
        expr(s"(ts div $hourNs) % 24").as("hour"),
        col("user_id"), col("value"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy("dow", "hour")
  }

  /** Last-touch purchase attribution — every purchase credited to the
    * user's most recent PRIOR view, rolled up by recency bucket
    * (same-session ≤ 30 min, same-day, older). The purchase→view
    * pairing is the custom [[graft.plans.AsOfJoin]] operator's second
    * production use (eventsAsof being the first): hash-clustered on
    * user, (user, time)-sorted, O(1)-state merge per row — the native
    * alternative is a per-user window over ALL views per purchase.
    * Revenue sums in DECIMAL; lag stays integer seconds.
    */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      // one row per (user, view-time): ts ties would otherwise emit
      // duplicate as-of matches
      .distinct()
    graft.plans.AsOf.asofJoin(purchases, views,
        "user_id", "v_user", "ts", "view_ts")
      .withColumn("lag_sec", expr(s"(ts - view_ts) div $NanosPerSec"))
      .withColumn("bucket",
        when(col("lag_sec") <= 1800L, "session")
          .when(col("lag_sec") <= 86400L, "day")
          .otherwise("older"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
        round(sum(col("lag_sec")).cast("double") / count(lit(1)), 2)
          .as("avg_lag_sec"))
      .orderBy("bucket")
  }

  /** Cohort LTV matrix — the revenue companion of [[eventsRetention]]
    * (which counts ACTIVITY; LTV sums VALUE): users cohorted by their
    * first-seen week, purchase revenue accumulated per (cohort week,
    * weeks-since-first) cell — the curve a growth team reads
    * lifetime value off.
    *
    * Week arithmetic stays in raw epoch-nanos integer division (no
    * date truncation — portable and timezone-free); revenue sums in
    * DECIMAL. Shuffle shape: one per-user first-seen aggregate
    * (map-combined), one user join, one (cohort, age) partial agg —
    * all key-uniform, no windows.
    */
  def eventsCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val weekNs = 7L * 86400L * NanosPerSec
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val firstSeen = ev.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"))
    ev.filter(col("event_type") === "purchase")
      .join(firstSeen, "user_id")
      .select(
        expr(s"first_ts div $weekNs").as("cohort_week"),
        expr(s"(ts - first_ts) div $weekNs").as("age_week"),
        col("user_id"), col("value"))
      .groupBy("cohort_week", "age_week")
      .agg(countDistinct(col("user_id")).as("n_buyers"),
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("cohort_week", "age_week")
  }

  /** Event-concentration (Pareto) audit: what share of all events the
    * heaviest users (at or above the p99 per-user event count)
    * generate — the skew census run before sizing any per-user
    * shuffle, and the abuse/bot screen of a production event
    * pipeline. The p99 cut comes from the KLL sketch in its exact
    * regime (k = 2¹⁷ above the verify-scale user count → sketch
    * quantile = sorted-rank element, oracle hash-parity; past k it
    * degrades to the ApproxSpec-bounded estimate by design — the
    * same contract as q_sketch_quantile). Plan: one per-user
    * partial-agg shuffle, a one-row sketch census broadcast back, a
    * final global aggregate. No window, no sort over users.
    */
  def eventsPareto(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.QuantileSketch
    val per = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val cut = per.agg(
        QuantileSketch.sketchAgg(col("n").cast("double"), 1 << 17).as("sk"),
        count(lit(1)).as("n_users"))
      .select(QuantileSketch.estimate(col("sk"), 0.99).as("p99"),
        col("n_users"))
    per.crossJoin(broadcast(cut))
      .agg(max(col("n_users")).as("n_users"),
        sum(col("n")).as("n_events"),
        round(max(col("p99")), 6).as("p99_cut"),
        sum(when(col("n") >= col("p99"), 1L).otherwise(0L))
          .as("top_users"),
        sum(when(col("n") >= col("p99"), col("n")).otherwise(0L))
          .as("top_events"))
      .withColumn("top_share_pct",
        round(col("top_events") * 100.0 / col("n_events"), 4))
  }

  /** RFM segmentation: per-user Recency / Frequency / Monetary
    * quartiles crossed into ≤64 segments with user counts and exact
    * revenue mass — the classic marketing-analytics cut of an event
    * log. Recency is exact integer day arithmetic on the nano
    * timestamps; monetary sums integer cents (floor(v·100+0.5), the
    * [[eventsSliding]] trick) so no float accumulation ever shuffles.
    * Each ntile(4) breaks ties with user_id, making the quartile
    * assignment a total order both engines agree on.
    *
    * Scale shape: the only event-sized operation is the per-user
    * partial agg; the three quartile windows sort the USER CENSUS
    * (one row per user — orders of magnitude below the event count,
    * same census-bounded declaration as [[eventsPareto]]'s sketch
    * input). At a 100 TB event log with ~10⁸ users the census sort is
    * a routine exchange, not a straggler.
    */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
        sum(col("cents")).as("cents"))
    val ref = perUser.agg(max(col("last_ts")).as("ref_ts"))
    perUser.crossJoin(broadcast(ref))
      .withColumn("rec_days",
        expr(s"(ref_ts - last_ts) div ${86400L * NanosPerSec}"))
      .withColumn("r_score", ntile(4).over(
        Window.orderBy(col("rec_days"), col("user_id"))).cast("bigint"))
      .withColumn("f_score", ntile(4).over(
        Window.orderBy(col("freq").desc, col("user_id"))).cast("bigint"))
      .withColumn("m_score", ntile(4).over(
        Window.orderBy(col("cents").desc, col("user_id"))).cast("bigint"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("sum_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Forecast backtest — the holdout evaluation a capacity-planning
    * forecast is judged by before anyone trusts it: per event type, an
    * OLS linear trend of DAILY counts fit on the first 21 days and
    * scored on the remaining held-out days (MAE). All regression
    * moments (Σt, Σy, Σty, Σt²) are exact integer sums over the
    * per-(type, day) census — the [[graft.ops.TextOps]] zipf-slope
    * discipline — so slope/intercept are engine-exact doubles;
    * held-out absolute errors are DECIMAL-cast per census row before
    * the mean. Everything after the one daily partial-agg shuffle is
    * census-sized (≤ types × days).
    */
  def eventsForecastEval(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * NanosPerSec
    val dec = "decimal(20,10)"
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(count(lit(1)).as("n"))
    val d0row = daily.agg(min("day").as("d0"))
    val t = daily.crossJoin(broadcast(d0row))
      .select(col("event_type"), (col("day") - col("d0")).as("t"),
        col("n"))
    val fit = t.filter(col("t") < 21)
      .groupBy("event_type")
      .agg(count(lit(1)).as("k"), sum("t").as("st"), sum("n").as("sy"),
        sum(col("t") * col("n")).as("sty"),
        sum(col("t") * col("t")).as("stt"))
      // a one-day training history has no line (zero OLS denominator,
      // where the engines' divide-by-zero semantics diverge): such a
      // type drops on BOTH engines instead of fitting garbage
      .filter(col("k") >= 2)
      .select(col("event_type"), col("k").as("n_train"),
        ((col("k") * col("sty") - col("st") * col("sy")).cast("double")
          / (col("k") * col("stt") - col("st") * col("st")))
          .as("slope"),
        col("st"), col("sy"), col("k"))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("st")) / col("k"))
    t.filter(col("t") >= 21)
      .join(broadcast(fit), "event_type")
      .select(col("event_type"), col("n_train"), col("slope"),
        col("intercept"),
        abs(col("n") - (col("intercept") + col("slope") * col("t")))
          .cast(dec).as("err"))
      .groupBy("event_type", "n_train", "slope", "intercept")
      .agg(count(lit(1)).as("n_test"),
        round(sum(col("err")).cast("double") / count(lit(1)), 4)
          .as("mae"))
      .select(col("event_type"), col("n_train"), col("n_test"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 4).as("intercept"), col("mae"))
      .orderBy("event_type")
  }

  /** Behavioral-diversity census — per-user Shannon entropy over event
    * types (a habit-vs-exploration segmentation: H=0 is a single-type
    * user, H=ln 5 a uniform one), histogrammed in 0.2-nat bins. The
    * per-(user, type) counts are one partial-agg shuffle; the user
    * total is a window over the per-user census (≤|types| rows per
    * user — per-user state only, the sessionize-twin declaration);
    * entropy terms are doubles cast to exact DECIMAL before the
    * per-user sum, so partition order never changes a bin assignment.
    * Output is the bounded histogram (≤9 bins), with the average
    * events-per-user in each bin from exact integer sums.
    */
  def eventsTypeEntropy(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(20,10)"
    val byUt = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    val withTot = byUt.withColumn("tot",
      sum(col("n")).over(Window.partitionBy("user_id")))
    val p = col("n").cast("double") / col("tot")
    val perUser = withTot
      .select(col("user_id"), col("tot"), (-p * log(p)).cast(dec).as("term"))
      .groupBy("user_id", "tot")
      .agg(sum(col("term")).cast("double").as("h"))
    perUser
      .select(col("tot"), least(floor(col("h") / 0.2), lit(8))
        .cast("int").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("tot")), 2).as("avg_events"))
      .withColumn("lo_nats", round(col("bin") * 0.2, 1))
      .select("bin", "lo_nats", "n_users", "avg_events")
      .orderBy("bin")
  }
}
