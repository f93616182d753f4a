package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregations over the `events` table.
  *
  * The reference declares a watermark but never consumes it (SURVEY.md §2
  * row 3.2 — `WatermarkStrategy.forMonotonousTimestamps()` at
  * `streaming/RealTimeRecommendations.java:48` with no event-time operator
  * downstream). These operators make event time real. Each has two uses:
  * batch form (DuckDB-oracled here) and streaming form — the same groupBy
  * expressions behind `readStream` + `withWatermark` (spec-tested in
  * `StreamingSpec`).
  *
  * Determinism: `value` sums go through DECIMAL (see [[Relational.moneySum]]);
  * window boundaries are epoch-aligned UTC instants, identical across engines.
  */
object TimeWindows {

  /** Tumbling 15-minute windows × event_type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Relational.moneySum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2 windows). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Relational.moneySum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Per-user session windows with a 5-minute inactivity gap. Session
    * semantics: events whose [ts, ts+gap) intervals overlap merge; end =
    * last event + gap.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Relational.moneySum(col("value")).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Sequential k-stage conversion funnel (default view → click →
    * purchase): a user counts at stage i+1 only with an event at-or-after
    * their stage-i entry time (first stage-1 event, then the first stage-2
    * event ≥ that time, …) — true temporal ordering, not mere event-type
    * presence. The stage list is a parameter; the streaming twin
    * [[graft.streaming.Stateful.funnelAdvances]] takes the same list.
    *
    * Each stage is a filtered min-aggregate (map-side combine, shuffle
    * keyed by user) plus one equi-join against the previous stage's
    * per-user entry times; the funnel narrows monotonically, so each
    * successive join is smaller. No windows, no sessionization — at any
    * scale the widest shuffle is |users at stage 1| narrow rows. The final
    * rate computation joins the k-row count frame against itself (shifted
    * by one stage) — constant size regardless of data volume, and the plan
    * stays window-free (PlanSpec asserts it).
    *
    * @return one row per stage: (stage, stage_name, n_users,
    *         conv_from_prev, conv_from_start); counts are monotonically
    *         non-increasing by construction (PropertySpec invariant)
    */
  def conversionFunnel(events: DataFrame,
                       stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // per-user entry times, folded stage over stage (first frame has no
    // predecessor join; each later one scopes to events ≥ the prior entry)
    val entries = stages.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (stageName, _)) =>
        val typed = events.where(col("event_type") === stageName)
        val scoped = acc.headOption match {
          case None => typed
          case Some(prev) =>
            typed.join(prev.select(col("user_id"), col("t_entry").as("t_prev")), "user_id")
              .where(col("ts") >= col("t_prev"))
        }
        scoped.groupBy(col("user_id")).agg(min(col("ts")).as("t_entry")) :: acc
    }.reverse
    val counts = entries.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stages(i)).as("stage_name"), col("n_users"))
    }.reduce(_ union _)
      // k rows; three consumers below (self, shifted, first) — the barrier
      // runs the stage aggregates once instead of once per consumer
      .transform(graft.barrier)
    val firstN = counts.where(col("stage") === 1).select(col("n_users").as("first_n"))
    val prevN = counts.select((col("stage") + 1).as("stage"), col("n_users").as("prev_n"))
    counts.join(prevN, Seq("stage"), "left")
      .crossJoin(firstN) // 1 row by construction
      .select(col("stage"), col("stage_name"), col("n_users"),
        when(col("prev_n").isNull, lit(1.0))
          .when(col("prev_n") === 0, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("prev_n")).as("conv_from_prev"),
        when(col("first_n") === 0, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("first_n")).as("conv_from_start"))
  }

  /** Trending leaderboard: the k most-active users per tumbling window,
    * via the [[org.apache.spark.sql.graft.ExactTopK]] map-side aggregate —
    * per-window counts first (one shuffle keyed by (window, user)), then a
    * top-k aggregate per window whose partial buffers ship ≤ k entries per
    * window into the final shuffle, instead of a row_number sort window
    * over every (window, user) count. Ties break deterministically by
    * lower user_id (the aggregate's score DESC, payload ASC contract —
    * matching the oracle's row_number order).
    *
    * The same expressions run as the streaming form behind
    * `withWatermark` ([[graft.streaming.RealTime.trendingUsersStream]]) —
    * windowed leaderboards are the canonical streaming analytics op.
    *
    * @return (ws, we, rank, user_id, n_events) — rank 1..k per window
    */
  def trendingUsers(events: DataFrame, k: Int = 3, width: String = "15 minutes"): DataFrame = {
    val counts = events
      .groupBy(window(col("ts"), width), col("user_id"))
      .agg(count(lit(1)).cast("double").as("activity"))
    val topk = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.ExactTopK(
        org.apache.spark.sql.graft.shim.expression(col("activity")),
        org.apache.spark.sql.graft.shim.expression(col("user_id")),
        k).toAggregateExpression())
    counts
      .groupBy(col("window"))
      .agg(topk.as("top"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        posexplode(col("top")))
      .select(col("ws"), col("we"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.payload").as("user_id"),
        col("col.score").cast("long").as("n_events"))
  }

  /** Weekly cohort retention over the event log — the standard engagement
    * matrix: users are grouped into cohorts by the epoch-week of their
    * FIRST event, and each (cohort, week-offset) cell counts how many of
    * that cohort were active `offset` weeks later. Week = ⌊epoch-seconds /
    * 604800⌋, a fixed UTC grid both engines compute identically (no
    * calendar/locale semantics to disagree on).
    *
    * Plan shape: one distinct over (user, week) — the only pass over the
    * raw log — then user-keyed min-aggregate for cohorts, an equi-join
    * back (both sides already narrow), and a (cohort, offset)-keyed count.
    * Every shuffle carries 2-3 integer columns; nothing is quadratic in
    * users or weeks. Retention is an exact integer-count division.
    *
    * @return (cohort_week, week_offset, n_active, cohort_size, retention)
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val week = floor(unix_timestamp(col("ts")) / 604800L).cast("long")
    val activity = events.select(col("user_id"), week.as("week")).distinct()
    val cohorts = activity.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, week) is distinct already
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
  }

  /** Behavioral training sequences: per (user, session), the ordered
    * event-type sequence fingerprinted to md5-prefix32 — the "user action
    * sequence" construction that turns an event log into sequence-model
    * training rows. Ordering is pinned by (ts, event_id), so the sequence
    * is deterministic even under timestamp ties; the collect_list is
    * bounded by session length (sessions are gap-bounded by construction,
    * never corpus-sized), and the session_window aggregate shuffles each
    * event exactly once, keyed by user.
    *
    * @return (user_id, session_start, n_events, seq_hash)
    */
  def sessionSequences(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.TextAnalysis.md5Prefix32(
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              e => e.getField("event_type")),
            " ")).as("seq_hash"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("seq_hash"))

  /** First-order Markov transition matrix over per-user event sequences:
    * for every ordered (event_type → next event_type) adjacency in a
    * user's timeline, the transition count and probability — the
    * behavioral model behind "what do users do after an error?" and the
    * input to sequence-level anomaly scoring.
    *
    * Order is the same (ts, event_id) total order as
    * [[lastTouchAttribution]]; the probability is one division of exact
    * integer counts (deterministic across engines). Plan shape: one
    * `lead` window partitioned by user (single user-keyed shuffle — state
    * per row is one successor, never a per-user collect), then a
    * (from, to)-keyed count whose cardinality is |event types|² —
    * constant — so the final aggregate is a broadcast-sized result at any
    * corpus scale.
    *
    * @return (from_type, to_type, n_transitions, p) — P(to | from)
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("from_type")
      .agg(sum(col("n_transitions")).as("n_from"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        (col("n_transitions").cast("double") / col("n_from").cast("double")).as("p"))
  }

  /** Transition-latency percentiles — the SLO companion to
    * [[transitionMatrix]] (q100): for every adjacent (from → to) step in
    * each user's (ts, event_id)-ordered stream, the exact p50/p90/p99 of
    * the step latency per transition edge.
    *
    * Exactness: gaps are integer microseconds ×100 before `percentile`,
    * so linear interpolation at p ∈ {.50, .90, .99} (index fraction a
    * multiple of 1/100) always lands on an integer — Spark `percentile`
    * and DuckDB `quantile_cont` agree bit-for-bit (the q121 trick at
    * two-decimal granularity); the /100 rescale is a single exact-input
    * division.
    *
    * Shape: one user-keyed lead window (the [[automationSignals]]
    * single-shuffle shape) into a per-edge ObjectHashAggregate whose
    * state is the gap multiset per (from, to) — |edges| ≤ |types|²
    * groups, each percentile list merged once.
    *
    * @return (from_type, to_type, n, p50_us, p90_us, p99_us)
    */
  def transitionLatency(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap100",
        (expr("unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))")
          - expr("unix_micros(ts)")) * 100)
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(gap100, array(0.50D, 0.90D, 0.99D))").as("ps"))
      .select(col("from_type"), col("to_type"), col("n"),
        (element_at(col("ps"), 1) / 100.0).as("p50_us"),
        (element_at(col("ps"), 2) / 100.0).as("p90_us"),
        (element_at(col("ps"), 3) / 100.0).as("p99_us"))
  }

  /** Last-touch attribution: each purchase is attributed to the same
    * user's most recent click at or before it (the marketing-analytics
    * as-of self-join). Order is (ts, event_id) — a total order, so the
    * "most recent" choice is deterministic even for same-timestamp events —
    * and the attribution carries the click→purchase latency plus a
    * within-30-minutes flag (purchases with no prior click keep NULL
    * click columns: observability wants the unattributed rows counted,
    * not dropped).
    *
    * Plan shape: one scan filtered to clicks+purchases, one window pass
    * partitioned BY USER (a running `last(_, ignoreNulls)` over a rows
    * frame — single shuffle on user_id, no per-user quadratic work, and
    * never a global sort). This is the window-native form of the q23
    * as-of join: when the probe side is the same table, the running-state
    * window beats a binned range join (one pass, no bin fan-out).
    *
    * @return (purchase_id, user_id, purchase_ts, click_id, click_ts,
    *         latency_s, within_30m)
    */
  def lastTouchAttribution(events: DataFrame, maxLagSeconds: Long = 1800): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("attr_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("attr_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("attr_click_id").as("click_id"),
        col("attr_click_ts").as("click_ts"))
      .withColumn("latency_s",
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"))
      .withColumn("within_30m",
        col("latency_s").isNotNull && col("latency_s") <= maxLagSeconds)
  }

  /** Daily volume anomaly flags — the pipeline-health monitor that
    * catches a collapsed ingest (volume crater) or a runaway producer
    * (spike) per event type: a day is anomalous when its count deviates
    * from the type's mean by more than `k` standard deviations.
    *
    * The z-test runs ENTIRELY in exact integer arithmetic — the flag is
    * (n·c − S)² > k²·(n·Q − S²), the cleared-denominator form of
    * |c − μ| > k·σ with μ = S/n, σ² = (n·Q − S²)/n² — so, unlike a float
    * `stddev`, the verdict never depends on aggregation order (the q99
    * contract). The squares are compared in DECIMAL(38,0): exact on both
    * engines and overflow-safe to n·c ≈ 10¹⁸ (a BIGINT square would cap
    * daily counts near 3·10⁹/n). Day key is the epoch-day integer —
    * identical arithmetic on both engines, no date-formatting ambiguity.
    *
    * Plan shape: one (type, day) count with map-side combine, a tiny
    * per-type stats aggregate (|types| rows) broadcast back over the
    * daily counts — the detail side never reshuffles.
    *
    * @return (event_type, day_num, cnt, dev = n·cnt − S, is_spike)
    */
  def dailyVolumeAnomalies(events: DataFrame, k: Int = 2): DataFrame =
    volumeAnomaliesFromDaily(dailyCounts(events), k)

  /** The incremental stage of [[dailyVolumeAnomalies]]: one (type, day)
    * count with map-side combine. Split out so the streaming twin
    * ([[graft.streaming.RealTime.dailyCountsStream]]) can maintain the
    * SAME daily table live while the z-flag pass below runs over whatever
    * horizon of closed days the caller grades.
    */
  def dailyCounts(events: DataFrame): DataFrame = events
    .groupBy(col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day_num"))
    .agg(count(lit(1)).as("cnt"))

  /** Per-type daily-volume TREND: exact ordinary-least-squares slope of
    * count over day — is this event type growing or decaying, and how
    * well does a line explain it? With x = day_num and y = cnt both
    * integers, every OLS moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    * DECIMAL aggregate, so slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
    * r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)) are single
    * divisions of exact integers — bit-identical on any engine or
    * partitioning. Slope ships ×10⁶ as an exact integer (micro-counts
    * per day) plus the double form.
    *
    * Cost: the [[dailyCounts]] aggregate plus a constant-size moment
    * fold per type — nothing scales past |types| × |days|.
    *
    * @return (event_type, n_days, slope_micro, slope, r2)
    */
  def volumeTrend(events: DataFrame): DataFrame =
    volumeTrendFromDaily(dailyCounts(events))

  /** The grading stage of [[volumeTrend]] over an already-materialized
    * daily table — shared with the streaming twin exactly like
    * [[volumeAnomaliesFromDaily]]: the live `dailyCountsStream` keeps
    * the daily counts current and this moment fold closes the report.
    */
  def volumeTrendFromDaily(daily: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("day_num"))).as("sx"),
        sum(dec(col("cnt"))).as("sy"),
        sum(dec(col("day_num")) * dec(col("cnt"))).as("sxy"),
        sum(dec(col("day_num")) * dec(col("day_num"))).as("sxx"),
        sum(dec(col("cnt")) * dec(col("cnt"))).as("syy"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("CAST((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) AS BIGINT)")
          .as("slope_micro"),
        ((dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
          / (dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        (((dec(col("n")) * col("sxy") - col("sx") * col("sy"))
          * (dec(col("n")) * col("sxy") - col("sx") * col("sy"))).cast("double")
          / ((dec(col("n")) * col("sxx") - col("sx") * col("sx"))
            * (dec(col("n")) * col("syy") - col("sy") * col("sy"))).cast("double"))
          .as("r2"))
  }

  /** The grading stage of [[dailyVolumeAnomalies]] over an
    * already-materialized daily-count table (from [[dailyCounts]] or its
    * streaming twin): per-type stats broadcast back over the daily rows.
    */
  def volumeAnomaliesFromDaily(daily: DataFrame, k: Int = 2): DataFrame = {
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("q"))
    val dec = "decimal(38,0)"
    daily.join(broadcast(stats), "event_type")
      .withColumn("dev", col("n_days") * col("cnt") - col("s"))
      .select(col("event_type"), col("day_num"), col("cnt"), col("dev"),
        (col("dev").cast(dec) * col("dev").cast(dec) >
          lit(k * k).cast(dec) *
            (col("n_days").cast(dec) * col("q").cast(dec)
              - col("s").cast(dec) * col("s").cast(dec))).as("is_spike"))
  }

  /** Per-user automation (bot) signals from inter-event gap statistics —
    * the "is this traffic human?" gate a training pipeline runs before
    * user-generated text enters the corpus. For every user with >= 5
    * gaps: gap count, span, min/max gap, mean gap, and the squared
    * coefficient of variation of gaps (cv² = n·Σdt²/(Σdt)² − 1, the
    * scale-free uniformity measure — metronomic scripted traffic has
    * cv² ≈ 0, human traffic is bursty with cv² ≥ 1). The bot flag is the
    * exact integer predicate 25·n·Σdt² < 26·(Σdt)² (cv² < 0.04) over >=
    * `minGaps` gaps, evaluated in DECIMAL(38,0) like the q103 z-test so
    * no float rounding can flip a verdict near the threshold.
    *
    * One user-keyed window (lead) feeding one user-keyed aggregate — the
    * same single-shuffle shape as [[timeWeightedAvg]]; state per user is
    * five scalars regardless of event count. cv² itself is emitted as
    * DOUBLE via one final division (NULL when the span is zero).
    */
  def automationSignals(events: DataFrame, minGaps: Long = 10L): DataFrame = {
    val dec = "decimal(38,0)"
    val gaps = events
      .withColumn("dt",
        expr("unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))")
          - expr("unix_micros(ts)"))
      .where(col("dt").isNotNull)
    val agg = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("dt")).as("sx"),
        min(col("dt")).as("min_gap_us"),
        max(col("dt")).as("max_gap_us"),
        sum(col("dt").cast(dec) * col("dt").cast(dec)).as("sxx"))
      .where(col("n_gaps") >= 5)
    val sx2 = col("sx").cast(dec) * col("sx").cast(dec)
    agg.select(col("user_id"), col("n_gaps"), col("sx").as("span_us"),
      col("min_gap_us"), col("max_gap_us"),
      (col("sx").cast("double") / col("n_gaps").cast("double")).as("mean_gap_us"),
      when(col("sx") =!= 0L,
        (col("n_gaps").cast(dec) * col("sxx")).cast("double") / sx2.cast("double")
          - 1.0).as("cv2"),
      (col("n_gaps") >= minGaps &&
        lit(25).cast(dec) * col("n_gaps").cast(dec) * col("sxx") <
          lit(26).cast(dec) * sx2).as("is_bot"))
  }

  /** Time-weighted average of `value` per user — the irregular-series
    * aggregation (monitoring, IoT, position marking) where a plain AVG is
    * wrong because samples arrive unevenly: each reading is weighted by
    * how long it was CURRENT (carry-forward until the next event), so a
    * value held for an hour counts 3600× one held for a second.
    *
    * Exactness: readings scale to integer cents (⌊value·100⌋ — both
    * engines floor the identical double), hold times are exact integer
    * microseconds from the (ts, event_id)-ordered `lead`, and the
    * weighted sum Σ cents·Δt stays a BIGINT (< 2⁶³ up to ~30-year spans
    * at value ≤ 10⁶) — order-invariant where a float Σ value·Δt is not.
    * One double division at the end returns original units.
    *
    * Plan: one user-keyed window pass (single shuffle), one hash
    * aggregate. Users with one event have no held interval → NULL twa,
    * kept (observability counts them).
    *
    * @return (user_id, n_events, span_us, twa)
    */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"))
      .withColumn("dt",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("dt")).as("span_us"),
        sum(col("cents") * col("dt")).as("num"))
      .select(col("user_id"), col("n_events"), col("span_us"),
        (col("num").cast("double") / (col("span_us") * lit(100L)).cast("double"))
          .as("twa"))
  }

  /** Growth accounting: per epoch-day, the active-user count, the
    * NEW-user count (first-ever appearance), and the running cumulative
    * reach — the DAU/new/reach triple every product dashboard starts
    * from. New-vs-returning comes from one per-user min-day aggregate
    * (map-combinable), actives from a per-day distinct count, and the
    * running total is a window over the DAILY table — |days| rows, so the
    * single-partition cumulative window is a constant-size final step,
    * never a corpus-wide sort.
    *
    * @return (day_num, n_active, n_new, cum_reach)
    */
  def userReach(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val daily = events.select(day.as("day_num"), col("user_id"))
      .groupBy("day_num")
      .agg(countDistinct(col("user_id")).as("n_active"))
    val news = events.select(col("user_id"), day.as("day_num"))
      .groupBy("user_id").agg(min(col("day_num")).as("first_day"))
      .groupBy(col("first_day").as("day_num"))
      .agg(count(lit(1)).as("n_new"))
    reachFromDaily(daily, news)
  }

  /** The closing stage of [[userReach]] over already-materialized daily
    * tables — shared with the streaming twins
    * ([[graft.streaming.RealTime.dailyActivesStream]] /
    * [[graft.streaming.RealTime.newUsersStream]] maintain `daily` and
    * `news` live; this joins them and adds the running reach). The
    * cumulative window runs over the |days|-row daily table — a
    * constant-size final step, never a corpus-wide sort.
    */
  def reachFromDaily(daily: DataFrame, news: DataFrame): DataFrame =
    daily.join(news, Seq("day_num"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_reach", sum(col("n_new")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day_num"))))
      .select("day_num", "n_active", "n_new", "cum_reach")

  /** Half-life EWMA of daily volume per event type — the smoothed
    * baseline a monitoring pipeline tracks instead of raw daily counts:
    * s₁ = x₁, s_d = x_d + s_{d−1}/2 over the day-ordered counts (α = ½
    * exponential weighting, unnormalized).
    *
    * Exactness argument (why a FLOAT recurrence can be graded): the fold
    * order is pinned by the sorted day array, halving is exact in binary
    * floating point, and every step is the same two IEEE operations on
    * both engines — so the result is bit-identical even where rounding
    * occurs. (Contrast a float SUM, whose shuffle-order dependence forced
    * q96/q127 onto integer grids.)
    *
    * Scale shape: the fold runs over the per-type DAILY array — O(days)
    * elements per type, the q103 stats bound, never a corpus-sized
    * collect. Day counts come from the same map-combined aggregate as
    * [[dailyCounts]].
    *
    * @return (event_type, n_days, last_day, ewma)
    */
  def ewmaDailyVolume(events: DataFrame): DataFrame =
    ewmaFromDaily(dailyCounts(events))

  /** The grading stage of [[ewmaDailyVolume]], factored over the shared
    * per-(type, day) counts so the streaming twin (`dailyCountsStream` →
    * this) emits the identical smoothed baseline — the q103/q144/q161/
    * q166/q195/q209 twin seam.
    */
  def ewmaFromDaily(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day_num"), col("cnt")))).as("days"))
      .select(col("event_type"),
        size(col("days")).cast("long").as("n_days"),
        expr("days[size(days) - 1].day_num").as("last_day"),
        expr("""aggregate(slice(days, 2, size(days) - 1),
                CAST(days[0].cnt AS DOUBLE),
                (acc, e) -> CAST(e.cnt AS DOUBLE) + acc / 2.0)""").as("ewma"))

  /** Algebraic daily→monthly rollup merge — the incremental-view pattern
    * behind every multi-granularity dashboard at 100 TB: the monthly
    * report is re-aggregated FROM the materialized daily partials
    * ([[dailyCounts]]-shaped state, extended with a cents sum), never by
    * rescanning events. Count and sum merge as sums, the daily peak as a
    * max, active days as a count — all algebraic, so merging partials is
    * exactly as correct as the direct aggregate (the DuckDB oracle
    * computes the same report through its own daily CTE; the grade IS
    * the partial-merge ≡ direct proof). Months are fixed 30-day epoch
    * blocks (day_num div 30) — pure integer keys, no calendar ambiguity
    * between engines.
    *
    * @return (event_type, month_num, n_events, total_cents, peak_daily,
    *         days_active)
    */
  def monthlyRollup(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_num"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
    daily
      .groupBy(col("event_type"), expr("day_num div 30").as("month_num"))
      .agg(sum(col("cnt")).as("n_events"),
        sum(col("cents")).as("total_cents"),
        max(col("cnt")).as("peak_daily"),
        count(lit(1)).as("days_active"))
  }

  /** SCD-2 interval construction (q146): the event log folded into the
    * slowly-changing-dimension history a warehouse keeps per entity — for
    * each user, one row per RUN of equal `event_type` values in (ts,
    * event_id) order, carrying `[valid_from_us, valid_to_us)` validity
    * and a version number; the open (current) interval has NULL
    * `valid_to_us`. This is the change-data-capture → dimension-table
    * compaction every incremental pipeline runs on entity state.
    *
    * One shuffle total: lag/filter/row_number/lead all share the same
    * (user_id)×(ts, event_id) window, so Catalyst plans a single
    * partitioned sort and the change filter runs between window passes
    * without re-sorting. Per-user row counts bound the sort — no global
    * ordering anywhere.
    *
    * @return (user_id, version, attr_value, valid_from_us, valid_to_us,
    *         is_current)
    */
  def scdIntervals(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("attr_value"),
        unix_micros(col("ts")).as("valid_from_us"),
        col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Lag-k autocorrelation of per-type daily volumes (q150) — the
    * seasonality detector next to [[volumeTrendFromDaily]]'s trend and the
    * EWMA baseline: r(lag) of the (cnt_t, cnt_{t+lag}) pairs, one
    * coefficient per (event_type, lag). A strong r(7) is weekly
    * periodicity; r(1) near 1 is day-over-day persistence.
    *
    * Exactness contract (the q143/q144 pattern): all five moments are
    * exact DECIMAL(38,0) sums over integer day counts, so they are
    * order-invariant; the coefficient is then num/√(d1·d2) evaluated in
    * one fixed IEEE order (two exact-integer→double casts, one multiply,
    * one sqrt, one divide) — bit-identical on both engines. The exact
    * num/d1/d2 ship alongside as BIGINTs, so the grade pins the integer
    * algebra, not just the float.
    *
    * Scale shape: everything after [[dailyCounts]]'s map-combinable
    * aggregate touches only the |types|·|days| daily table; the lag
    * self-join broadcasts that table, and the moments collapse to
    * |types|·|lags| rows.
    */
  def autocorrelation(events: DataFrame, lags: Seq[Int] = Seq(1, 7)): DataFrame =
    autocorrelationFromDaily(dailyCounts(events), lags)

  def autocorrelationFromDaily(daily: DataFrame, lags: Seq[Int]): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val base = daily.select(col("event_type"), col("day_num"), col("cnt"))
    val lagged = base
      .withColumn("lag_d", explode(lit(lags.toArray)))
      .select(col("event_type"), col("lag_d"), col("day_num"), col("cnt").as("x"))
    val future = base.select(
      col("event_type").as("f_type"), col("day_num").as("f_day"),
      col("cnt").as("y"))
    lagged
      .join(broadcast(future),
        col("event_type") === col("f_type") &&
          col("f_day") === col("day_num") + col("lag_d"))
      .groupBy(col("event_type"), col("lag_d"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"),
        sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .select(col("event_type"), col("lag_d"), col("n").as("n_pairs"),
        (dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("long").as("num"),
        (dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("long").as("den_x"),
        (dec(col("n")) * col("syy") - col("sy") * col("sy")).cast("long").as("den_y"),
        ((dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double") *
            (dec(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("r"))
  }

  /** Time-interval join: every click paired with ALL of the same user's
    * views inside the preceding `horizonMinutes` — the multi-touch
    * counterpart of [[lastTouchAttribution]] (which keeps only the most
    * recent touch). This is the batch twin of the stream–stream interval
    * join [[graft.streaming.RealTime.clickViewPairsStream]]; both emit
    * the identical (user, click, view, gap) pair set on a closed input
    * (spec-asserted).
    *
    * Plan shape: an equi-join keyed on user_id with the time range as a
    * post-join filter — Spark plans a shuffle/sort-merge join on the user
    * key (plan-asserted: never a nested-loop), so per-task work is
    * bounded by per-user event counts, and the pair fan-out is bounded by
    * event-rate × horizon per user, never by corpus size. At 100 TB both
    * sides partition by user_id; AQE handles hot users via skew-join
    * splitting.
    *
    * @return (user_id, click_id, view_id, gap_us) — gap ≥ 0, one row per
    *         qualifying (click, view) pair
    */
  def clickViewPairs(events: DataFrame, horizonMinutes: Int = 30): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    clicks.join(views, Seq("user_id"))
      .where(col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
  }

  /** Position-based multi-touch attribution (q190) — the U-shaped
    * 40/20/40 model beside q97's last-touch: every purchase credits its
    * prior clicks 40% to the first touch, 40% to the last, and the
    * middle touches share the remaining 20%. Credits are exact integer
    * ppm — ⌊200000/(n−2)⌋ per middle touch (the floor remainder is the
    * unassigned residue, visible in the row); n = 1 → 10⁶, n = 2 →
    * 500000 each — so the model is auditable and hash-stable.
    *
    * Scale shape: one user-keyed window identifies each purchase's
    * prior-click count and its first/last click ids (running count +
    * running first/last over the same (ts, event_id) order q97 uses) —
    * a single shuffle, no purchase×click pair fan-out at all.
    *
    * @return per purchase with ≥1 prior click: (purchase_id, user_id,
    *         n_clicks, first_click_id, last_click_id, first_ppm,
    *         last_ppm, mid_ppm)
    */
  def positionAttribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isClick = col("event_type") === "click"
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .where(col("event_type").isin("click", "purchase"))
      // purchase rows are not clicks, so the running click count at a
      // purchase row counts exactly the clicks strictly before it
      .withColumn("n_clicks", sum(when(isClick, 1L).otherwise(0L)).over(w))
      .withColumn("first_click_id",
        first(when(isClick, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_id",
        last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase" && col("n_clicks") >= 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("n_clicks"), col("first_click_id"), col("last_click_id"),
        when(col("n_clicks") === 1, lit(1000000L))
          .when(col("n_clicks") === 2, lit(500000L))
          .otherwise(lit(400000L)).as("first_ppm"),
        when(col("n_clicks") === 1, lit(1000000L))
          .when(col("n_clicks") === 2, lit(500000L))
          .otherwise(lit(400000L)).as("last_ppm"),
        when(col("n_clicks") <= 2, lit(0L))
          .otherwise(expr("200000 div (n_clicks - 2)")).as("mid_ppm"))
  }

  /** Exponentially-decayed leaderboard (q180) — the production form of
    * "trending": recent activity counts more, with a 7-day half-life,
    * so a burst last week outranks steady noise last month. q89 ranks
    * within fixed windows; this ranks across ALL history with recency
    * decay — the score every feed-ranking system actually uses.
    *
    * Exactness: 2^(−age/7) is irrational, so per-age weights come from
    * [[DecayWeights]] — ⌊2^(−age/7)·10⁶⌋ for age 0..63, computed once
    * in one JVM and embedded as literals in both plans (ages past 63
    * weigh 0; the table IS the truncation policy). The score
    * Σ cnt·w_ppm is then an exact BIGINT, and the ranking a top-k heap.
    *
    * Scale shape: one map-combined (user, day) count, a broadcast
    * 1-row max-day, per-row weight lookup, one more map-combined user
    * aggregate, TakeOrderedAndProject. No windows, no sorts.
    *
    * @return (user_id, n_events, decayed_ppm) — topK by score
    */
  def decayedLeaderboard(events: DataFrame, k: Int = 20): DataFrame = {
    val w = array(DecayWeights.ppm.map(lit): _*)
    val daily = events
      .groupBy(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val maxDay = daily.agg(max(col("day")).as("max_day"))
    daily.crossJoin(broadcast(maxDay))
      .withColumn("age", col("max_day") - col("day"))
      .withColumn("w_ppm",
        when(col("age") <= 63, element_at(w, (col("age") + 1).cast("int")))
          .otherwise(lit(0L)))
      .groupBy("user_id")
      .agg(sum(col("cnt")).as("n_events"),
        sum(col("cnt") * col("w_ppm")).as("decayed_ppm"))
      .orderBy(col("decayed_ppm").desc, col("user_id"))
      .limit(k)
  }

  /** Churn hazard curve (q164) — the Nelson–Aalen cumulative-hazard
    * estimator over user lifetimes: a user "dies" on their last active
    * day, the at-risk set at day t is everyone whose last day is ≥ t,
    * and H(t) = Σ_{s≤t} d_s/n_s accumulates the daily hazard. This is
    * the survival-analysis view of retention — q86's cohort table says
    * who came back; the hazard curve says how the leaving RATE evolves
    * (the estimator of choice when S(t) would need a product of floats).
    *
    * Exactness: each hazard term is ⌊d·10⁹/n⌋ — an exact BIGINT both
    * engines floor identically — and the cumulative sum adds exact
    * integers, so H_nano is hash-stable (a float Π(1−d/n) Kaplan–Meier
    * would not be; consumers wanting S(t) exponentiate −H themselves).
    *
    * Scale shape: one map-combined per-user max (the only corpus-wide
    * work), then a |days|-row death table — the windows run over
    * CALENDAR metadata, bounded by the observation span, not the
    * corpus (the q162 argument).
    *
    * @return per death day: (day_num, deaths, n_at_risk, h_term_nano,
    *         h_cum_nano)
    */
  def churnHazard(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deaths = events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("user_id").agg(max(col("day")).as("dday"))
      .groupBy("dday").agg(count(lit(1)).as("deaths"))
      .transform(graft.barrier) // read by the total and the scan
    val total = deaths.agg(sum(col("deaths")).as("n_users"))
    // both unpartitioned windows run over the |days|-row death table
    // (GlobalWindowSpec-pinned), never the event stream
    val before = Window.orderBy("dday").rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy("dday").rowsBetween(Window.unboundedPreceding, 0)
    deaths.crossJoin(broadcast(total))
      .withColumn("n_at_risk",
        col("n_users") - coalesce(sum(col("deaths")).over(before), lit(0L)))
      .withColumn("h_term_nano", expr("deaths * 1000000000 div n_at_risk"))
      .withColumn("h_cum_nano", sum(col("h_term_nano")).over(upTo))
      .select(col("dday").as("day_num"), col("deaths"), col("n_at_risk"),
        col("h_term_nano"), col("h_cum_nano"))
  }

  /** Markov next-event model fit (q165) — train the maximum-likelihood
    * next-type predictor (argmax of [[transitionMatrix]]'s rows, ties to
    * the alphabetically first type) and grade it in-sample: of all
    * transitions leaving each type, how many went to the predicted
    * type? The model-evaluation companion to q100, in the q83/q85
    * measure-the-model family — accuracy per from-type is exactly the
    * max row share, so the report doubles as the matrix's concentration
    * profile.
    *
    * Scale shape: one user-keyed lead window builds the pair stream
    * (barriered — the model build and the grade both read it); the
    * model is ≤ |types|² rows, broadcast back over the pairs; integer
    * counts and one floor-div ppm per row.
    *
    * @return (from_type, predicted, n_pairs, hits, acc_ppm)
    */
  def markovEval(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
      .transform(graft.barrier)
    val model = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val pred = model.withColumn("rn", row_number().over(
        Window.partitionBy("from_type").orderBy(col("n").desc, col("to_type"))))
      .where(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    pairs.join(broadcast(pred), "from_type")
      .groupBy(col("from_type"), col("predicted"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L)).as("hits"))
      .withColumn("acc_ppm", expr("hits * 1000000 div n_pairs"))
  }

  /** CUSUM change-point detection (q166) — the cumulative-sum chart
    * over per-type daily volumes: where q103's z-flags mark single
    * outlier days, CUSUM accumulates small sustained shifts until they
    * cross a threshold (the classic Page 1954 chart, in its
    * running-sum-minus-running-min form: S⁺_t = max over prefixes of
    * the centered sum = cum − min(cum), and symmetrically S⁻).
    *
    * Exactness: residuals are centered WITHOUT division — r_t =
    * cnt·n_days − total (they sum to zero exactly) — so both cusum
    * sides are exact BIGINT window sums. The flag policy is integer
    * too: in the ×n_days scale, S⁺ > total ⟺ Σ(cnt−mean) > mean — the
    * accumulated above-mean excess exceeds one average day of volume
    * (mirrored below). Windows partition per type over
    * calendar-bounded rows.
    *
    * @return (event_type, day_num, cnt, cusum_pos, cusum_neg, flag_up,
    *         flag_down)
    */
  def cusumChangePoints(events: DataFrame): DataFrame =
    cusumFromDaily(dailyCounts(events))

  /** The chart stage of [[cusumChangePoints]] over an already-maintained
    * daily table — the twin seam ([[graft.streaming.RealTime
    * .dailyCountsStream]] closes through this same stage, like
    * q103/q144/q150/q161).
    */
  def cusumFromDaily(dailyIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyIn.transform(graft.barrier)
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("total"))
    val upTo = Window.partitionBy("event_type").orderBy("day_num")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(broadcast(stats), "event_type")
      .withColumn("resid", col("cnt") * col("n_days") - col("total"))
      .withColumn("s", sum(col("resid")).over(upTo))
      .withColumn("cusum_pos", col("s") - min(col("s")).over(upTo))
      .withColumn("cusum_neg", max(col("s")).over(upTo) - col("s"))
      .withColumn("flag_up", col("cusum_pos") > col("total"))
      .withColumn("flag_down", col("cusum_neg") > col("total"))
      .select(col("event_type"), col("day_num"), col("cnt"),
        col("cusum_pos"), col("cusum_neg"), col("flag_up"), col("flag_down"))
  }

  /** Forecast skill report (MASE-style): per event type, how much better
    * does the seasonal-naive predictor (count of the same weekday last
    * week, lag-7 over observed days) track daily volume than the plain
    * naive predictor (yesterday's count, lag-1)? The standard baseline
    * grade run before shipping any real forecaster.
    *
    * Only days where BOTH lags exist score, so the two mean absolute
    * errors share one denominator and the skill ratio reduces to the
    * single division seasonal_abs_err / naive_abs_err of two exact
    * BIGINT sums (NULL when the naive error is zero). skill < 1 means
    * weekly seasonality is real; ≥ 1 means last week is no better than
    * yesterday.
    *
    * Lags are over *observed* days per type (the [[dailyCounts]] grid),
    * the same convention as q132's EWMA and q144's trend. The windows
    * order |days| metadata rows per type — never event rows.
    *
    * @return (event_type, n_days, naive_abs_err, seasonal_abs_err, skill)
    */
  def forecastSkill(events: DataFrame): DataFrame =
    forecastSkillFromDaily(dailyCounts(events))

  /** The grading stage of [[forecastSkill]] over an already-maintained
    * daily table (the q103/q144/q150/q161/q166 twin seam).
    */
  def forecastSkillFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day_num")
    daily
      .withColumn("lag1", lag(col("cnt"), 1).over(w))
      .withColumn("lag7", lag(col("cnt"), 7).over(w))
      .where(col("lag1").isNotNull && col("lag7").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cnt") - col("lag1"))).as("naive_abs_err"),
        sum(abs(col("cnt") - col("lag7"))).as("seasonal_abs_err"))
      .withColumn("skill",
        when(col("naive_abs_err") === 0L, lit(null).cast("double"))
          .otherwise(col("seasonal_abs_err").cast("double")
            / col("naive_abs_err").cast("double")))
  }
  /** Sequential precedence pairs (q213) — the non-adjacent sequence-
    * mining report beside the adjacent-only transition matrix (q100):
    * for each ordered type pair (a, b), how many users ever did a
    * BEFORE b (anywhere in their history, not just consecutively), next
    * to how many users did both at all, and the ppm share — the
    * directionality signal ("views precede purchases for 94% of users
    * who do both") that funnel analysis (q82) reads per-step and
    * PrefixSpan-style miners generalize.
    *
    * "Some a before some b" collapses to `min ts(a) < max ts(b)` — so
    * the whole computation is one per-(user, type) min/max aggregate
    * (map-combined, the only wide shuffle) and a per-user self-join
    * bounded by |types|² rows per user, never by event count. Ties at
    * the same microsecond do not count as precedence (strict <) —
    * deterministic in both engines without composite tiebreaks.
    *
    * @return (type_a, type_b, n_users_both, n_users_ab, direction_ppm)
    */
  def sequentialPairs(events: DataFrame): DataFrame =
    sequentialPairsFromExtremes(events
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(expr("unix_micros(ts)")).as("first_us"),
        max(expr("unix_micros(ts)")).as("last_us"))
      .transform(graft.barrier)) // both sides of the per-user pair join

  /** The grading stage of [[sequentialPairs]], factored over the
    * per-(user, type) timestamp extremes so the streaming twin
    * (`RealTime.userTypeExtremes`, a complete-mode min/max aggregate
    * whose state is |users|·|types| rows) closes through the identical
    * report — the dailyCounts twin-seam pattern.
    */
  def sequentialPairsFromExtremes(ut: DataFrame): DataFrame = {
    val a = ut.select(col("user_id"), col("event_type").as("type_a"),
      col("first_us").as("fa"))
    val b = ut.select(col("user_id").as("uid_b"),
      col("event_type").as("type_b"), col("last_us").as("lb"))
    a.join(b, col("user_id") === col("uid_b") &&
        col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users_both"),
        sum(when(col("fa") < col("lb"), 1L).otherwise(0L)).as("n_users_ab"))
      .withColumn("direction_ppm",
        expr("n_users_ab * 1000000 div n_users_both"))
  }

  /** Theil–Sen robust trend per event type (q226) — the median of all
    * pairwise day-over-day slopes: the resistant counterpart to q144's
    * OLS line (one wild day moves OLS arbitrarily, moves a median of
    * C(n,2) slopes almost not at all; the MAD-vs-z-score argument of
    * q119 applied to trend). Each slope is ONE IEEE division of two
    * exact integers — bit-identical on both engines — and the median is
    * an exact order statistic (even counts average the two middles:
    * add + halve, both IEEE-deterministic). Ranking ties break by
    * (d1, d2), the total-order convention.
    *
    * Scale shape: the pair join is per-type over the DAILY table —
    * C(|days|, 2) rows per type (the q103 stats bound), never
    * event-cardinality; the rank window partitions per type.
    *
    * @return (event_type, n_days, n_pairs, median_slope)
    */
  def theilSenTrend(events: DataFrame): DataFrame =
    theilSenFromDaily(dailyCounts(events))

  /** The grading stage of [[theilSenTrend]] over the shared per-(type,
    * day) counts — the dailyCounts twin seam.
    */
  def theilSenFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = daily.select(col("event_type"), col("day_num"), col("cnt"))
      .transform(graft.barrier) // both sides of the pair join
    val b = d.select(col("event_type").as("et2"), col("day_num").as("d2"),
      col("cnt").as("c2"))
    val slopes = d.join(b,
        col("event_type") === col("et2") && col("day_num") < col("d2"))
      .select(col("event_type"), col("day_num").as("d1"), col("d2"),
        ((col("c2") - col("cnt")).cast("double")
          / (col("d2") - col("day_num")).cast("double")).as("slope"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("slope"), col("d1"), col("d2"))
    val ranked = slopes
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
    val nDays = d.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    ranked
      .where(col("rn") === expr("(np + 1) div 2") ||
        col("rn") === expr("(np + 2) div 2"))
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_pairs"),
        (sum(col("slope")) / count(lit(1))).as("median_slope"))
      .join(nDays, "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("median_slope"))
  }

  /** Seasonally-adjusted volume anomalies (q250) — the production form
    * of q103's daily z-flags: a Sunday is compared against SUNDAYS, not
    * against the all-days mean, so weekly seasonality (q209 measures
    * it) stops masking real anomalies and stops flagging ordinary
    * weekend dips. Per (type, weekday) population with n days, sum S,
    * and Σx², day x flags when its squared z-score exceeds 4 — in the
    * exact cross-multiplied integer form of q103:
    *
    *   z² > 4  ⟺  (x·n − S)² > 4·(n·Σx² − S²)
    *
    * (both sides DECIMAL(38,0)-safe BIGINTs at calendar scale; no
    * division, no float). Singleton weekday populations (n = 1) never
    * flag — zero variance means no evidence, not infinite surprise.
    *
    * Scale shape: one map-combined daily aggregate, weekday moments as
    * a broadcast ≤ |types|·7 join back — events shuffle once.
    *
    * @return per (type, day): (event_type, day_num, weekday, cnt, n_w,
    *         flagged ∈ {0,1})
    */
  def seasonalAnomalies(events: DataFrame): DataFrame =
    seasonalAnomaliesFromDaily(dailyCounts(events))

  /** The grading stage of [[seasonalAnomalies]] — the dailyCountsStream
    * twin seam (q103/q144/q209/q237/q245 pattern).
    */
  def seasonalAnomaliesFromDaily(daily: DataFrame): DataFrame = {
    // DECIMAL(38,0)-first moments and deviation square (the
    // binarySegmentationFromDaily pattern): past 2^63 a BIGINT square
    // would silently wrap under non-ANSI Spark while the HUGEINT oracle
    // errors — the internal comparison goes decimal, the OUTPUT columns
    // stay engine-portable BIGINT.
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val d = daily.withColumn("weekday", col("day_num") % 7)
      .transform(graft.barrier) // read by the moment aggregate and the flags
    val moments = d.groupBy("event_type", "weekday")
      .agg(count(lit(1)).as("n_w"), sum(col("cnt")).as("s_w"),
        sum(dec(col("cnt")) * col("cnt")).as("ss_w"))
    d.join(broadcast(moments), Seq("event_type", "weekday"))
      .withColumn("dev", dec(col("cnt")) * col("n_w") - col("s_w"))
      .select(col("event_type"), col("day_num"), col("weekday"), col("cnt"),
        col("n_w"),
        when(col("n_w") > 1 &&
          col("dev") * col("dev")
            > lit(4L) * (dec(col("n_w")) * col("ss_w")
              - dec(col("s_w")) * col("s_w")),
          lit(1L)).otherwise(lit(0L)).as("flagged"))
  }

  /** Binary-segmentation changepoint (q245) — per event type, the ONE
    * split of the daily-count series that maximizes the between-segment
    * contrast: split after ordered day k scores
    *
    *   score(k) = (S₁·(n−k) − (S−S₁)·k)² / (k·(n−k))
    *
    * (the squared mean-difference statistic with denominators cleared —
    * the first step of binary segmentation, the classic changepoint
    * method CUSUM (q166) approximates online). The EXACT rational score
    * floors to nano units — score_nano = num·10⁹ div (k·(n−k)·S²-free
    * form below) — so both engines pick the identical argmax; ties
    * break to the earliest split day.
    *
    * Scoring detail: num = (S₁·(n−k) − (S−S₁)·k)² is DECIMAL(38,0)
    * (S ≤ total events of the type); the surfaced score_nano =
    * num·10⁹ div (k·(n−k)) is compared as an exact BIGINT across
    * splits. The scale caveat: num·10⁹ holds 38 digits through ~10¹⁴
    * events per type — past that, pre-scale counts.
    *
    * Scale shape: per-type prefix sums over DAILY metadata (the
    * q164/q237 calendar-bounded argument); one type-partitioned window
    * for the cumsum, one for the argmax rank.
    *
    * @return per type: (event_type, n_days, split_day, left_days,
    *         right_days, left_sum, right_sum, score_nano)
    */
  def binarySegmentation(events: DataFrame): DataFrame =
    binarySegmentationFromDaily(dailyCounts(events))

  /** The grading stage of [[binarySegmentation]] over the shared daily
    * counts — the q103/q144/q209/q237 streaming-twin seam.
    */
  def binarySegmentationFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val wOrd = Window.partitionBy("event_type").orderBy("day_num")
    val wAll = Window.partitionBy("event_type")
    val scored = daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("s1", sum(col("cnt")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("cnt")).over(wAll))
      .where(col("k") < col("n")) // a split needs a non-empty right side
      .withColumn("d",
        dec(col("s1")) * (dec(col("n")) - dec(col("k")))
          - (dec(col("s")) - dec(col("s1"))) * dec(col("k")))
      .withColumn("score_nano",
        expr("""(d * d * 1000000000)
               div (CAST(k AS DECIMAL(38,0)) * (n - k))"""))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(desc("score_nano"), asc("day_num"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        col("day_num").as("split_day"),
        col("k").as("left_days"), (col("n") - col("k")).as("right_days"),
        col("s1").as("left_sum"), (col("s") - col("s1")).as("right_sum"),
        col("score_nano"))
  }

  /** Kendall concordance between event-type volumes (q237) — do two
    * event types move TOGETHER day over day? For every type pair
    * (a < b), over the days both were observed: concordant day pairs
    * ((x₁−x₂)(y₁−y₂) > 0), discordant, and ties on either side — the
    * exact integer ingredients of Kendall's τ-b, shipped raw (the S =
    * C − D numerator is the graded signal; τ itself needs a sqrt both
    * engines would round). The rank-based companion to q150's
    * autocorrelation and q226's Theil–Sen: robust to outlier days,
    * sensitive only to direction.
    *
    * Scale shape: the day×day comparison runs over DAILY COUNT
    * metadata — |days|² pairs per type pair, calendar-bounded (the
    * q162/q164 argument), never event-count-bounded. One map-combined
    * daily aggregate is the only corpus-wide work; the pair grid is a
    * day-keyed self-join of the |types|·|days| table with itself.
    *
    * @return per type pair: (type_a, type_b, n_day_pairs, concordant,
    *         discordant, tie_a, tie_b) — tie_a counts day pairs with
    *         equal a-counts regardless of b (and symmetrically tie_b),
    *         so C + D + ties ≥ n_day_pairs with both-tied pairs in both
    */
  def kendallConcordance(events: DataFrame): DataFrame =
    kendallFromDaily(dailyCounts(events))

  /** The grading stage of [[kendallConcordance]] over the shared
    * per-(type, day) counts — the q103/q144/q209 streaming-twin seam.
    */
  def kendallFromDaily(daily: DataFrame): DataFrame = {
    val d = daily.transform(graft.barrier) // four self-join sides
    val a1 = d.select(col("event_type").as("type_a"), col("day_num"),
      col("cnt").as("x1"))
    val b1 = d.select(col("event_type").as("type_b"), col("day_num"),
      col("cnt").as("y1"))
    // per-day (x, y) grid for each type pair: join the two type streams
    // on the day, then self-join day < day for the ordered day pairs
    val xy = a1.join(b1, Seq("day_num")).where(col("type_a") < col("type_b"))
      .transform(graft.barrier)
    val xy2 = xy.select(col("type_a"), col("type_b"),
      col("day_num").as("d2"), col("x1").as("x2"), col("y1").as("y2"))
    // DECIMAL(38,0) product: two BIGINT daily-count differences can
    // overflow their product past 2^63 (silent wrap non-ANSI vs HUGEINT
    // oracle error); only the SIGN is consumed, so decimal is free here
    xy.join(xy2, Seq("type_a", "type_b")).where(col("day_num") < col("d2"))
      .select(col("type_a"), col("type_b"),
        ((col("x1") - col("x2")).cast("decimal(38,0)")
          * (col("y1") - col("y2"))).as("prod"),
        (col("x1") === col("x2")).as("ta"), (col("y1") === col("y2")).as("tb"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_day_pairs"),
        sum(when(col("prod") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("prod") < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(col("ta"), 1L).otherwise(0L)).as("tie_a"),
        sum(when(col("tb"), 1L).otherwise(0L)).as("tie_b"))
  }

  /** Weekday seasonality index per event type (q209) — the seasonal
    * profile beside the trend (q144), EWMA (q132), autocorrelation
    * (q150), and CUSUM (q166) views of the same daily volumes: for each
    * (type, weekday), the mean events/day on that weekday relative to
    * the type's overall mean events/day, in exact ppm. Weekday is the
    * calendar-free `epoch_day % 7` (0 = Thursday — 1970-01-01), so both
    * engines bucket identically with zero timezone machinery. The index
    * is one integer cross-multiplied floor division
    * `n_events · type_days · 10⁶ div (n_days · type_events)` — no float
    * averages anywhere.
    *
    * Scale shape: one map-combined aggregate to ≤ |types|·7 rows (the
    * distinct-day count rides the same shuffle), then a window
    * partitioned BY TYPE over those rows for the per-type totals. Events
    * never shuffle twice.
    *
    * @return (event_type, weekday, n_events, n_days, index_ppm)
    */
  def weekdaySeasonality(events: DataFrame): DataFrame =
    weekdaySeasonalityFromDaily(dailyCounts(events))

  /** The grading stage of [[weekdaySeasonality]], factored over the
    * shared per-(type, day) counts so the streaming twin
    * (`RealTime.dailyCountsStream` → this) emits the identical report —
    * the q103/q144/q161/q166/q195 twin seam.
    */
  def weekdaySeasonalityFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tw = daily
      .groupBy(col("event_type"), (col("day_num") % 7).as("weekday"))
      .agg(sum(col("cnt")).as("n_events"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy("event_type")
    tw.withColumn("type_events", sum(col("n_events")).over(w))
      .withColumn("type_days", sum(col("n_days")).over(w))
      .select(col("event_type"), col("weekday"), col("n_events"),
        col("n_days"),
        expr("n_events * type_days * 1000000 div (n_days * type_events)")
          .as("index_ppm"))
  }

  /** Time-weighted average value (q266) — the metering/finance
    * aggregate an event-sampled series needs instead of a plain mean: a
    * user's `value` holds from each event until the next, so the honest
    * average weights each reading by how LONG it held, not by how often
    * it was sampled (a sensor that reports 100× during a spike would
    * drag a plain mean to the spike; TWA is invariant to re-sampling).
    * Per user: Σ ⌊value·100⌋·Δt_µs over consecutive-event intervals,
    * with the exact e2·µs numerator and the span denominator carried
    * separately and ONE floor division to the graded e2 average —
    * shuffle-order-proof integers throughout (on spans past ~months ×
    * e2 values past ~10⁶ the numerator needs DECIMAL(38,0); shape
    * unchanged).
    *
    * Scale shape: one user-keyed lead window (the automationSignals
    * idiom), then a map-combined per-user aggregate — nothing beyond
    * |events| rows shuffles, and only on the user key.
    *
    * @return per user with ≥ 2 events:
    *         (user_id, n_intervals, twv_e2us, span_us, twa_e2)
    */
  def timeWeightedValue(events: DataFrame): DataFrame =
    events
      .withColumn("v_e2",
        expr("CAST(floor(value * 100) AS BIGINT)"))
      .withColumn("dt",
        expr("unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))")
          - expr("unix_micros(ts)"))
      .where(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("v_e2") * col("dt")).as("twv_e2us"),
        sum(col("dt")).as("span_us"))
      .where(col("span_us") > 0L) // all-simultaneous users have no TWA
      .withColumn("twa_e2", expr("twv_e2us div span_us"))

  /** Engagement curve (q271) — the L28-style power-user histogram every
    * growth team reads weekly: how many users were active on exactly d
    * distinct days, and how many events those users generated. The
    * shape of this curve (smile vs decay) is THE retention diagnostic —
    * a per-day active count (q-rolling WAU) cannot distinguish one
    * cohort of daily users from 28 cohorts of one-day tourists; this
    * histogram does.
    *
    * Scale shape: one user-keyed aggregate (distinct days via a
    * (user, day) pre-dedup that map-combines, event count alongside),
    * then a ≤ |days|-row histogram. Exact integers only.
    *
    * @return (active_days, n_users, total_events)
    */
  def engagementCurve(events: DataFrame): DataFrame =
    engagementCurveFromUserDays(userDayCounts(events))

  /** The (user, day) event-count stage [[engagementCurve]] aggregates —
    * split out as a seam so the STREAMED form
    * ([[graft.streaming.RealTime.userDayCountsStream]], watermarked
    * 1-day tumbling per-user counts) closes through the identical
    * [[engagementCurveFromUserDays]] tail (the dailyCountsStream twin
    * pattern; spec-asserted equal on a closed input).
    */
  def userDayCounts(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day_num"))
      .groupBy(col("user_id"), col("day_num"))
      .agg(count(lit(1)).as("n_events"))

  /** Behavior-path trigram mining (q274) — the three-step extension of
    * [[transitionMatrix]]'s bigram flows: for every user's
    * (ts, event_id)-ordered stream, count each consecutive
    * A → B → C type path corpus-wide and keep the global top-k (the
    * "what journeys actually happen" question a bigram matrix cannot
    * answer — view→click→purchase and view→click→error share every
    * bigram prefix but are opposite funnels). Deterministic top-k tie
    * break by path; exact counts only.
    *
    * Scale shape: two lead() columns over the same user-keyed window
    * (ONE shuffle — both leads share the frame), a map-combined
    * ≤ |types|³ path aggregate, and a TakeOrderedAndProject heap.
    *
    * @return top-k rows: (t1, t2, t3, n_paths)
    */
  def pathTrigrams(events: DataFrame, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .where(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** Weekly growth accounting (q279) — the standard user-state quartet
    * every growth dashboard leads with: per week, users who are NEW
    * (first-ever active week), RETAINED (also active the week before),
    * RESURRECTED (active, inactive last week, but seen before), and
    * CHURNED (active last week, gone this week — attributed to the week
    * they went missing). The identity actives(w) = new + retained +
    * resurrected holds by construction and is the report's own
    * consistency check; churn is the only row counted against a week
    * the user was absent.
    *
    * Scale shape: one (user, week) dedup (map-combined), a per-user min
    * week aggregate joined back user-keyed, and a self-join on
    * (user, week−1) — all equi-joins on the user key; the report is
    * ≤ |weeks| rows. Exact integers only.
    *
    * @return per week: (week, n_active, n_new, n_retained,
    *         n_resurrected, n_churned)
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"))
      .distinct()
      .transform(graft.barrier) // read by first-week, prev-week, and churn
    val firstWeek = uw.groupBy(col("user_id")).agg(min(col("week")).as("fw"))
    val prev = uw.select(col("user_id"), (col("week") + 1L).as("week"),
      lit(1L).as("was_prev"))
    val states = uw
      .join(firstWeek, "user_id")
      .join(prev, Seq("user_id", "week"), "left")
      .select(col("week"),
        when(col("week") === col("fw"), "new")
          .when(col("was_prev") === 1L, "retained")
          .otherwise("resurrected").as("state"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    // churned in week w: active in w−1, absent in w
    val churned = prev
      .join(uw, Seq("user_id", "week"), "left_anti")
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_churned"))
    states.join(churned, Seq("week"), "full_outer")
      .select(col("week"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** The histogram tail over a (user_id, day_num, n_events) table —
    * one row per user-day means rows-per-user IS distinct active days.
    */
  def engagementCurveFromUserDays(userDays: DataFrame): DataFrame =
    userDays
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("active_days"), sum(col("n_events")).as("n_events"))
      .groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("total_events"))
}

/** [[TimeWindows.decayedLeaderboard]]'s half-life weight table — the
  * DpNoise one-JVM trick: ⌊2^(−age/7)·10⁶⌋ for age 0..63 days, embedded
  * as identical literals in both engines' plans.
  */
object DecayWeights {
  val ppm: Seq[Long] =
    (0 to 63).map(a => math.floor(math.pow(2.0, -a / 7.0) * 1e6).toLong)
}
