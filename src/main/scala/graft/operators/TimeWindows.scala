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

  /** Sequential conversion funnel view → click → purchase: a user counts
    * at stage k+1 only with an event at-or-after their stage-k entry time
    * (first view, then first click ≥ that view, then a purchase ≥ that
    * click) — true temporal ordering, not mere event-type presence.
    *
    * Each stage is a filtered min-aggregate (map-side combine, shuffle
    * keyed by user) plus one equi-join against the previous stage's
    * per-user entry times; the funnel narrows monotonically, so each
    * successive join is smaller. No windows, no sessionization — at any
    * scale the widest shuffle is |users with views| narrow rows.
    *
    * @return one row: (n_view, n_click, n_purchase) cumulative user counts
    */
  def conversionFunnel(events: DataFrame): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = events.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = events.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_p"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
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
}
