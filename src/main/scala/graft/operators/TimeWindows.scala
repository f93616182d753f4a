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
