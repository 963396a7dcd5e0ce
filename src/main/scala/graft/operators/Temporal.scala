package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table.
  *
  * These are the batch semantics of the engine's streaming surface (SURVEY.md
  * §2.3 "Streaming"): the same `window`/`session_window` expressions run
  * unchanged under Structured Streaming with a watermark (see
  * graft.streaming.EventStreams and its spec). The reference's only temporal
  * behavior is its heartbeat/save-model timer loop
  * (`container/Heartbeat.java:150-242`) — superseded by real event-time
  * processing here.
  *
  * Scale notes: tumbling windows and sessions shuffle once on the group key;
  * the as-of join is the union+last-over-window form (one sort per user
  * partition, no quadratic per-user join), which is the 100 TB-safe plan.
  */
object Temporal {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** q23: tumbling 1-hour window aggregate (event-time). */
  def q23WindowTumbling(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
      .select(
        date_format(col("w.start"), fmt).as("window_start"),
        col("event_type"), col("n"), col("value_sum"))

  /** q43: sliding 1-hour windows every 30 minutes (batch semantics of
    * streaming.EventStreams.slidingCounts): each event is counted in the two
    * windows covering it. */
  def q43SlidingWindow(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
      .select(
        date_format(col("w.start"), fmt).as("window_start"),
        col("event_type"), col("n"), col("value_sum"))

  /** q24: session windows per user with a 30-minute inactivity gap.
    * A session's `end` is last-event + gap (half-open: an event exactly at
    * the gap boundary starts a new session). */
  def q24Sessionize(t: Tables): DataFrame =
    t.events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("value_sum"))
      .select(
        col("user_id"),
        date_format(col("w.start"), fmt).as("session_start"),
        col("n_events"), col("value_sum"))

  /** q25: event-time range join — purchases within 1 hour after each error,
    * per user. Equi-key (user_id) carries the shuffle; the time bound is a
    * post-join filter, so this stays a hash/sort-merge join (no NL join). */
  def q25RangeJoin(t: Tables): DataFrame = {
    val e = t.events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("u"), col("ts").as("err_ts"))
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("p_ts"), col("value").as("p_value"))
    e.join(p,
        col("u") === col("u2") &&
        col("p_ts") > col("err_ts") &&
        col("p_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("error_id"))
      .agg(
        count(col("p_ts")).as("n_purchases_1h"),
        round(coalesce(sum("p_value"), lit(0.0)), 2).as("purchase_value_1h"))
  }

  /** q65: weekly retention cohorts — the product-analytics staple: users
    * cohorted by the ISO week of their FIRST event, then per (cohort,
    * weeks-since) the count of cohort members active that week and the
    * retention fraction. Both engines truncate weeks to Monday, so the
    * offset is an exact multiple of 7 days and the integer division is
    * noise-free; retention is one IEEE division of two exact longs (the
    * t12 unrounded rule).
    *
    * Scale shape: the first-event frame is one user-keyed partial-agg
    * exchange; (user, week) activity partial-aggregates to distinct pairs
    * before its exchange; the cohort grid is ≤ weeks² rows, so the
    * window for cohort_size is over a tiny frame. The corpus of events is
    * never joined row-to-row — both sides reduce to user-bounded frames
    * first. */
  def q65RetentionCohorts(t: Tables): DataFrame = retentionCohorts(t.events)

  /** See [[q65RetentionCohorts]]; core over any (user_id, ts) frame. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firsts = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val active = events
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val grid = active.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // every user is active in their own first week, so offset 0 IS the
    // cohort size — no separate census pass
    val w = Window.partitionBy(col("cohort_week"))
    grid
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(w))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** q66: ordered conversion funnel — per user, the signup → click →
    * purchase progression: first signup, first click strictly AFTER it,
    * first purchase strictly after that, and the stage reached (0–3).
    * The ORDER is the semantics (a click before signup does not count) —
    * which is what separates a funnel from q32's pivot counts.
    *
    * Scale shape: ONE exchange on user_id, then three whole-partition
    * window passes over that same partitioning (each stage's min is
    * conditioned on the previous stage's window column — no self-joins,
    * no re-scans), and the per-user collapse reuses the partitioning so
    * Catalyst plans no second exchange. Per-user state is three
    * timestamps regardless of event count. */
  def q66Funnel(t: Tables): DataFrame = funnel(t.events)

  /** See [[q66Funnel]]; core over any (user_id, ts, event_type) frame. */
  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("s_ts"), min(col("t2")).as("c_ts"),
        min(col("t3")).as("p_ts"))
      .select(col("user_id"),
        date_format(col("s_ts"), fmt).as("signup_ts"),
        date_format(col("c_ts"), fmt).as("first_click_ts"),
        date_format(col("p_ts"), fmt).as("first_purchase_ts"),
        when(col("p_ts").isNotNull, 3).when(col("c_ts").isNotNull, 2)
          .when(col("s_ts").isNotNull, 1).otherwise(0).as("funnel_stage"))
  }

  /** q26: as-of join — for each error event, the most recent signup of the
    * same user at-or-before it. Implemented the scale-safe way: union both
    * sides, one window sort per user, `last(signup_ts)` carried forward —
    * no per-user cross join, one shuffle total. */
  def q26AsOfJoin(t: Tables): DataFrame = {
    val tagged = t.events
      .filter(col("event_type").isin("error", "signup"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("signup_ts"))
    // ties (identical ts): signup sorts before the error so it is visible
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_type").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("prior_signup", last(col("signup_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("ts"), fmt).as("error_ts"),
        date_format(col("prior_signup"), fmt).as("prior_signup_ts"))
  }

  /** q103: nearest-event join — for each error, the temporally CLOSEST
    * click by the same user within a ±10-minute tolerance, whichever
    * direction is nearer (tie → the earlier click). The bidirectional
    * generalization of q26's backward-only as-of: log/sensor alignment
    * wants "what was the user doing around this failure", not only
    * before it. Spark has no nearest join; the naive form is a range
    * join + per-key sort.
    *
    * Implemented the q26 scale-safe way, doubled: union-tag both event
    * types, ONE user-keyed exchange, then two RANGE-frame passes over
    * the same sort — max(click) over (-∞, 0] and min(click) over
    * [0, +∞) on epoch-microsecond ordering (RANGE, not ROWS, so a click
    * at the exact error instant is visible to both sides) — and a pure
    * projection picks the nearer candidate. No join at all; cost is one
    * shuffle + one sort regardless of tolerance. Diffs are exact longs. */
  def q103NearestEvent(t: Tables, tolSec: Long = 600L): DataFrame =
    nearestEvent(t.events, tolSec)

  /** q103 core over any (event_id, user_id, ts, event_type) frame. */
  def nearestEvent(events: DataFrame, tolSec: Long = 600L): DataFrame = {
    val base = events
      .filter(col("event_type").isin("error", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "click", unix_micros(col("ts"))).as("click_us"))
    val wb = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(0, Window.unboundedFollowing)
    val tolUs = tolSec * 1000000L
    base
      .withColumn("b", max(col("click_us")).over(wb))
      .withColumn("f", min(col("click_us")).over(wf))
      .filter(col("event_type") === "error")
      .withColumn("b_ok", col("b").isNotNull && col("us") - col("b") <= tolUs)
      .withColumn("f_ok", col("f").isNotNull && col("f") - col("us") <= tolUs)
      .withColumn("nearest_us",
        when(col("b_ok") && (!col("f_ok") ||
          col("us") - col("b") <= col("f") - col("us")), col("b"))
          .when(col("f_ok"), col("f")))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), fmt).as("error_ts"),
        date_format(timestamp_micros(col("nearest_us")), fmt).as("nearest_click_ts"),
        when(col("nearest_us").isNotNull,
          abs(col("us") - col("nearest_us"))).as("diff_us"))
  }
}
