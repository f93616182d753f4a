package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{BloomPrune, Corpus, Dedup, Reco, Relational, Similarity, Sketches, Skew, TimeWindows, TrainingMix}
import graft.plans.LabelPropagation
import graft.sources.{Bucketing, Multimodal}
import graft.streaming.RealTime

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; every SQL-expressible one has matching ANSI SQL in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet tables).
  * Column names and types are kept identical on both sides — the driver
  * hash-compares values after sorting columns by name.
  */

import graft.EntryHelpers._

/** Registry: event-time-series queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object TimeSeriesRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_window_tumbling" -> ((s, dir) => TimeWindows.tumbling(Tables.events(s, dir))),
    // per-window activity leaderboard via the ExactTopK map-side aggregate
    "q89_trending_users" -> ((s, dir) => TimeWindows.trendingUsers(Tables.events(s, dir))),
    "q21_window_sliding" -> ((s, dir) => TimeWindows.sliding(Tables.events(s, dir))),
    "q22_window_session" -> ((s, dir) => TimeWindows.sessions(Tables.events(s, dir))),
    // behavioral sequences: per-session ordered event-type fingerprint
    "q77_session_sequences" -> ((s, dir) =>
      TimeWindows.sessionSequences(Tables.events(s, dir))),
    // weekly cohort retention matrix over the event log
    "q86_cohort_retention" -> ((s, dir) =>
      TimeWindows.cohortRetention(Tables.events(s, dir))),
    // temporal conversion funnel view -> click -> purchase
    "q82_conversion_funnel" -> ((s, dir) =>
      TimeWindows.conversionFunnel(Tables.events(s, dir))),
    // last-touch attribution: purchases as-of-joined to the most recent
    // prior click per user (running-state window, one user-keyed shuffle)
    "q97_attribution" -> ((s, dir) =>
      TimeWindows.lastTouchAttribution(Tables.events(s, dir))),
    // first-order Markov transitions between consecutive events per user
    "q100_transition_matrix" -> ((s, dir) =>
      TimeWindows.transitionMatrix(Tables.events(s, dir))),
    // SCD-2 validity intervals per user folded from the event log
    "q146_scd_intervals" -> ((s, dir) =>
      TimeWindows.scdIntervals(Tables.events(s, dir))),
    // Nelson-Aalen cumulative churn hazard over user lifetimes, exact
    // nano-unit hazard terms
    "q164_churn_hazard" -> ((s, dir) =>
      TimeWindows.churnHazard(Tables.events(s, dir))),
    // MLE Markov next-type predictor graded in-sample (argmax of the
    // q100 matrix; accuracy = max row share, in exact ppm)
    "q165_markov_eval" -> ((s, dir) =>
      TimeWindows.markovEval(Tables.events(s, dir))),
    // CUSUM chart over per-type daily volumes: sustained-shift detector
    // beside q103's single-day z-flags, exact integer both sides
    "q166_cusum" -> ((s, dir) =>
      TimeWindows.cusumChangePoints(Tables.events(s, dir))),
    // 7-day-half-life decayed activity leaderboard: literal weight
    // table, exact integer scores, top-k heap
    "q180_decayed_leaderboard" -> ((s, dir) =>
      TimeWindows.decayedLeaderboard(Tables.events(s, dir))),
    // U-shaped 40/20/40 multi-touch attribution (exact ppm credits) —
    // the position-based model beside q97's last-touch
    "q190_position_attribution" -> ((s, dir) =>
      TimeWindows.positionAttribution(Tables.events(s, dir))),
    // MASE-style forecast skill: seasonal-naive (lag-7) vs naive (lag-1)
    // absolute error on daily volumes, one shared denominator
    "q195_forecast_skill" -> ((s, dir) =>
      TimeWindows.forecastSkill(Tables.events(s, dir))),
    // Kendall concordance counts between type volumes over day pairs —
    // calendar-bounded metadata self-join, exact integers
    "q237_kendall" -> ((s, dir) =>
      TimeWindows.kendallConcordance(Tables.events(s, dir))),
    // binary-segmentation changepoint per type: exact nano-scored split
    // argmax over the daily-count metadata
    "q245_binary_segmentation" -> ((s, dir) =>
      TimeWindows.binarySegmentation(Tables.events(s, dir))),
    // weekday-deseasonalized anomaly flags: q103's cross-multiplied z²
    // against the WEEKDAY population, so seasonality stops masking
    "q250_seasonal_anomalies" -> ((s, dir) =>
      TimeWindows.seasonalAnomalies(Tables.events(s, dir))),
    // time-weighted average value per user: interval-held readings,
    // exact e2*us numerators, re-sampling-invariant
    "q266_time_weighted_value" -> ((s, dir) =>
      TimeWindows.timeWeightedValue(Tables.events(s, dir))),
    // L28 engagement curve: users by exact distinct-active-day count —
    // the power-user histogram a rolling WAU cannot show
    "q271_engagement_curve" -> ((s, dir) =>
      TimeWindows.engagementCurve(Tables.events(s, dir))),
    // top-20 three-step behavior paths per user stream — the funnel
    // journeys a bigram transition matrix cannot distinguish
    "q274_path_trigrams" -> ((s, dir) =>
      TimeWindows.pathTrigrams(Tables.events(s, dir))),
    // weekly growth accounting: new/retained/resurrected/churned user
    // states with the actives identity as the built-in check
    "q279_growth_accounting" -> ((s, dir) =>
      TimeWindows.growthAccounting(Tables.events(s, dir))),
    // weekday seasonality index per event type: exact ppm mean-per-
    // weekday vs overall mean, epoch-day % 7 bucketing
    "q209_weekday_seasonality" -> ((s, dir) =>
      TimeWindows.weekdaySeasonality(Tables.events(s, dir))),
    // non-adjacent precedence mining: which event type precedes which,
    // per user, via one min/max aggregate + a types²-bounded pair join
    "q213_sequential_pairs" -> ((s, dir) =>
      TimeWindows.sequentialPairs(Tables.events(s, dir))),
    // Theil-Sen robust trend: median of C(days,2) pairwise slopes per
    // type — the resistant counterpart to q144's OLS
    "q226_theil_sen" -> ((s, dir) =>
      TimeWindows.theilSenTrend(Tables.events(s, dir))),
    // lag-1/lag-7 autocorrelation of per-type daily volumes — the
    // seasonality detector beside q144's trend and q132's EWMA
    "q150_autocorrelation" -> ((s, dir) =>
      TimeWindows.autocorrelation(Tables.events(s, dir))),
    // integer z-test spike/crater flags on per-type daily event volumes
    "q103_volume_anomalies" -> ((s, dir) =>
      TimeWindows.dailyVolumeAnomalies(Tables.events(s, dir))),
    // growth accounting: daily actives, first-appearance news, running
    // cumulative reach
    "q112_user_reach" -> ((s, dir) =>
      TimeWindows.userReach(Tables.events(s, dir))),
    // carry-forward time-weighted average of value per user (irregular
    // series; integer cents x micros, one final division)
    "q114_time_weighted_avg" -> ((s, dir) =>
      TimeWindows.timeWeightedAvg(Tables.events(s, dir))),
    // bot gate: per-user gap stats + exact-integer cv² uniformity flag
    "q118_automation_signals" -> ((s, dir) =>
      TimeWindows.automationSignals(Tables.events(s, dir))),
    // incremental-view rollup: monthly report merged FROM daily partials
    // (algebraic merge graded against the direct aggregate)
    "q131_rollup_merge" -> ((s, dir) =>
      TimeWindows.monthlyRollup(Tables.events(s, dir))),
    // growth/decay monitor: exact-integer OLS slope + r² of daily counts
    // per event type (micro-count slope as an exact BIGINT)
    "q144_volume_trend" -> ((s, dir) =>
      TimeWindows.volumeTrend(Tables.events(s, dir))),
    // half-life EWMA volume baseline: pinned-order fold, exact halving —
    // a gradeable float recurrence (see ewmaDailyVolume)
    "q132_ewma_volume" -> ((s, dir) =>
      TimeWindows.ewmaDailyVolume(Tables.events(s, dir))),
    // per-transition step-latency SLOs: exact p50/p90/p99 on the x100
    // integer grid (q100's edges, q121's percentile exactness)
    "q134_transition_latency" -> ((s, dir) =>
      TimeWindows.transitionLatency(Tables.events(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "q20_window_tumbling" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events)
        |SELECT make_timestamp(((epoch_ms(t) // 900000) * 900000) * 1000) AS ws,
        |       make_timestamp(((epoch_ms(t) // 900000) * 900000 + 900000) * 1000) AS we,
        |       event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2, 3""".stripMargin,
    // same tumbling-window arithmetic as q20; rank = row_number over
    // (count DESC, user_id ASC), the ExactTopK tie-break contract
    "q89_trending_users" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id FROM events),
        |c AS (
        |  SELECT make_timestamp(((epoch_ms(t) // 900000) * 900000) * 1000) AS ws,
        |         make_timestamp(((epoch_ms(t) // 900000) * 900000 + 900000) * 1000) AS we,
        |         user_id, count(*) AS n_events
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT ws, we, CAST(rank AS INTEGER) AS rank, user_id,
        |       CAST(n_events AS BIGINT) AS n_events FROM (
        |  SELECT ws, we, user_id, n_events,
        |         row_number() OVER (PARTITION BY ws ORDER BY n_events DESC, user_id) AS rank
        |  FROM c)
        |WHERE rank <= 3""".stripMargin,
    "q21_window_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events),
        |ks AS (SELECT 0 AS k UNION ALL SELECT 1)
        |SELECT make_timestamp((((epoch_ms(t) // 1800000) - k) * 1800000) * 1000) AS ws,
        |       make_timestamp((((epoch_ms(t) // 1800000) - k) * 1800000 + 3600000) * 1000) AS we,
        |       event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e CROSS JOIN ks GROUP BY 1, 2, 3""".stripMargin,
    "q22_window_session" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id, value FROM events),
        |x AS (SELECT user_id, t, value,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |                  OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 5 MINUTE
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM e),
        |s AS (SELECT user_id, t, value,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM x)
        |SELECT min(t) AS session_start,
        |       max(t) + INTERVAL 5 MINUTE AS session_end,
        |       user_id, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // µs-cast timestamps on every comparison, matching Spark's precision;
    // rates are exact-integer-count divisions, so doubles agree bit-for-bit
    "q82_conversion_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.t) AS t_click
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.t >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.t >= c.t_click
        |      GROUP BY e.user_id),
        |n AS (
        |  SELECT 1 AS stage, 'view' AS stage_name, (SELECT count(*) FROM v) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p))
        |SELECT CAST(stage AS INTEGER) AS stage, stage_name, n_users,
        |  CASE WHEN lag(n_users) OVER (ORDER BY stage) IS NULL THEN CAST(1 AS DOUBLE)
        |       WHEN lag(n_users) OVER (ORDER BY stage) = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(n_users AS DOUBLE) / lag(n_users) OVER (ORDER BY stage)
        |       END AS conv_from_prev,
        |  CASE WHEN first_value(n_users) OVER (ORDER BY stage) = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(n_users AS DOUBLE) / first_value(n_users) OVER (ORDER BY stage)
        |       END AS conv_from_start
        |FROM n""".stripMargin,
    // q22's lag/cumsum sessionization with an ordered list aggregate on top
    "q77_session_sequences" ->
      s"""WITH e AS (
         |  SELECT CAST(ts AS TIMESTAMP) AS t, user_id, event_id, event_type FROM events),
         |x AS (SELECT t, user_id, event_id, event_type,
         |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         |                  OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 5 MINUTE
         |             THEN 1 ELSE 0 END AS new_sess
         |      FROM e),
         |s AS (SELECT t, user_id, event_id, event_type,
         |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |      FROM x),
         |seq AS (
         |  SELECT user_id, sid, min(t) AS session_start, count(*) AS n_events,
         |    array_to_string(list(event_type ORDER BY t, event_id), ' ') AS seq
         |  FROM s GROUP BY user_id, sid)
         |SELECT session_start, user_id, n_events,
         |  ${md5Prefix32Sql("seq")} AS seq_hash
         |FROM seq""".stripMargin,
    // fixed UTC epoch-week grid on both engines; retention divides exact
    // integer counts, so the doubles cannot disagree
    "q86_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
        |  FROM events),
        |co AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM co GROUP BY cohort_week),
        |act AS (
        |  SELECT co.cohort_week, a.week - co.cohort_week AS week_offset,
        |         count(*) AS n_active
        |  FROM a JOIN co ON a.user_id = co.user_id
        |  GROUP BY 1, 2)
        |SELECT act.cohort_week, act.week_offset, act.n_active, sz.cohort_size,
        |  CAST(act.n_active AS DOUBLE) / sz.cohort_size AS retention
        |FROM act JOIN sz ON act.cohort_week = sz.cohort_week""".stripMargin,
    // same daily counts, same day-pair grid, same sign/tie conditionals
    "q237_kendall" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |xy AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day_num,
        |    a.cnt AS x, b.cnt AS y
        |  FROM daily a JOIN daily b
        |    ON a.day_num = b.day_num AND a.event_type < b.event_type),
        |p AS (
        |  SELECT u.type_a, u.type_b, u.x AS x1, u.y AS y1, w.x AS x2, w.y AS y2
        |  FROM xy u JOIN xy w ON u.type_a = w.type_a AND u.type_b = w.type_b
        |    AND u.day_num < w.day_num)
        |SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_day_pairs,
        |  CAST(COALESCE(sum(CASE WHEN CAST(x1 - x2 AS HUGEINT) * (y1 - y2) > 0
        |    THEN 1 END), 0) AS BIGINT) AS concordant,
        |  CAST(COALESCE(sum(CASE WHEN CAST(x1 - x2 AS HUGEINT) * (y1 - y2) < 0
        |    THEN 1 END), 0) AS BIGINT) AS discordant,
        |  CAST(COALESCE(sum(CASE WHEN x1 = x2 THEN 1 END), 0) AS BIGINT) AS tie_a,
        |  CAST(COALESCE(sum(CASE WHEN y1 = y2 THEN 1 END), 0) AS BIGINT) AS tie_b
        |FROM p GROUP BY 1, 2""".stripMargin,
    // same prefix sums over ordered days, same cleared-denominator nano
    // score, same (score DESC, day) argmax
    "q245_binary_segmentation" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |pre AS (
        |  SELECT event_type, day_num, cnt,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_num)
        |      AS BIGINT) AS k,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS s
        |  FROM daily),
        |sc AS (
        |  SELECT *,
        |    CAST((CAST(s1 AS HUGEINT) * (n - k) - CAST(s - s1 AS HUGEINT) * k)
        |      * (CAST(s1 AS HUGEINT) * (n - k) - CAST(s - s1 AS HUGEINT) * k)
        |      * 1000000000
        |      // (CAST(k AS HUGEINT) * (n - k)) AS BIGINT) AS score_nano
        |  FROM pre WHERE k < n)
        |SELECT event_type, n AS n_days, day_num AS split_day,
        |  k AS left_days, n - k AS right_days,
        |  s1 AS left_sum, s - s1 AS right_sum, score_nano
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY score_nano DESC, day_num) AS rn FROM sc)
        |WHERE rn = 1""".stripMargin,
    // same epoch-day buckets, same per-user distinct-day counts, same
    // histogram rollup
    "q271_engagement_curve" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
        |      AS BIGINT) AS active_days,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT active_days, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n_events) AS BIGINT) AS total_events
        |FROM pu GROUP BY 1""".stripMargin,
    // same user-keyed lead pairs, same path counts, same tie-broken
    // top-20
    "q274_path_trigrams" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS t1,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS t3
        |  FROM events)
        |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
        |FROM s WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, t1, t2, t3 LIMIT 20""".stripMargin,
    // same epoch-week buckets, same first-week/prev-week state split,
    // same week-after churn attribution
    "q279_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS week
        |  FROM events),
        |fw AS (SELECT user_id, min(week) AS fw FROM uw GROUP BY 1),
        |pv AS (SELECT user_id, week + 1 AS week FROM uw),
        |st AS (
        |  SELECT uw.week,
        |    CASE WHEN uw.week = fw.fw THEN 'new'
        |         WHEN pv.user_id IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS state
        |  FROM uw
        |  JOIN fw ON uw.user_id = fw.user_id
        |  LEFT JOIN pv ON uw.user_id = pv.user_id AND uw.week = pv.week),
        |ag AS (
        |  SELECT week, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(COALESCE(sum(CASE WHEN state = 'new' THEN 1 END), 0)
        |      AS BIGINT) AS n_new,
        |    CAST(COALESCE(sum(CASE WHEN state = 'retained' THEN 1 END), 0)
        |      AS BIGINT) AS n_retained,
        |    CAST(COALESCE(sum(CASE WHEN state = 'resurrected' THEN 1 END), 0)
        |      AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1),
        |chn AS (
        |  SELECT p.week, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM pv p
        |  WHERE NOT EXISTS (SELECT 1 FROM uw
        |    WHERE uw.user_id = p.user_id AND uw.week = p.week)
        |  GROUP BY 1)
        |SELECT COALESCE(ag.week, chn.week) AS week,
        |  COALESCE(n_active, 0) AS n_active, COALESCE(n_new, 0) AS n_new,
        |  COALESCE(n_retained, 0) AS n_retained,
        |  COALESCE(n_resurrected, 0) AS n_resurrected,
        |  COALESCE(n_churned, 0) AS n_churned
        |FROM ag FULL OUTER JOIN chn ON ag.week = chn.week""".stripMargin,
    // same user-keyed lead intervals, same e2*us numerator, same floor
    // average, same zero-span drop
    "q266_time_weighted_value" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v_e2,
        |    epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(CAST(ts AS TIMESTAMP)) AS dt
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(v_e2 * dt) AS BIGINT) AS twv_e2us,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  CAST(sum(v_e2 * dt) // sum(dt) AS BIGINT) AS twa_e2
        |FROM iv WHERE dt IS NOT NULL
        |GROUP BY 1 HAVING sum(dt) > 0""".stripMargin,
    // same weekday populations, same integer cross-multiplied 2-sigma
    // flag, singletons never flag
    "q250_seasonal_anomalies" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, day_num % 7 AS weekday FROM daily),
        |m AS (
        |  SELECT event_type, weekday, CAST(count(*) AS BIGINT) AS n_w,
        |    CAST(sum(cnt) AS BIGINT) AS s_w,
        |    sum(CAST(cnt AS HUGEINT) * cnt) AS ss_w
        |  FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.day_num, d.weekday, d.cnt, m.n_w,
        |  CAST(CASE WHEN m.n_w > 1
        |    AND (CAST(d.cnt AS HUGEINT) * m.n_w - m.s_w)
        |        * (CAST(d.cnt AS HUGEINT) * m.n_w - m.s_w)
        |        > 4 * (CAST(m.n_w AS HUGEINT) * m.ss_w
        |            - CAST(m.s_w AS HUGEINT) * m.s_w)
        |    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM d JOIN m ON d.event_type = m.event_type AND d.weekday = m.weekday""".stripMargin,
    // lead() over the same (ts, event_id) total order; P(to|from) is one
    // division of exact integer counts
    "q100_transition_matrix" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
        |seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM ev),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
        |  FROM pairs GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n_transitions,
        |  CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM pairs p JOIN tot t USING (from_type)""".stripMargin,
    // change rows = where lag() differs, then version/lead over the same
    // per-user order; micros epochs so both engines emit exact BIGINTs
    "q146_scd_intervals" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, ts, event_id, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type AS attr_value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
        |  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS valid_to_us,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // same last-day deaths, same ordered at-risk scan, same nano floors
    "q164_churn_hazard" ->
      """WITH d AS (
        |  SELECT user_id,
        |    max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS dday
        |  FROM events GROUP BY 1),
        |dd AS (SELECT dday, CAST(count(*) AS BIGINT) AS deaths FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(deaths) AS BIGINT) AS n_users FROM dd),
        |scan AS (
        |  SELECT dday, deaths,
        |    CAST(n_users - COALESCE(sum(deaths) OVER (ORDER BY dday
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS n_at_risk
        |  FROM dd CROSS JOIN tot),
        |h AS (
        |  SELECT dday, deaths, n_at_risk,
        |    CAST(deaths * 1000000000 // n_at_risk AS BIGINT) AS h_term_nano
        |  FROM scan)
        |SELECT dday AS day_num, deaths, n_at_risk, h_term_nano,
        |  CAST(sum(h_term_nano) OVER (ORDER BY dday
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS h_cum_nano
        |FROM h""".stripMargin,
    // same lead pairs, same (n DESC, type) argmax, same ppm floor
    "q165_markov_eval" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |pairs AS (SELECT from_type, to_type FROM p WHERE to_type IS NOT NULL),
        |model AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs GROUP BY 1, 2),
        |pred AS (
        |  SELECT from_type, to_type AS predicted FROM (
        |    SELECT *, row_number() OVER (PARTITION BY from_type
        |      ORDER BY n DESC, to_type) AS rn FROM model)
        |  WHERE rn = 1)
        |SELECT p.from_type, pred.predicted,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(sum(CASE WHEN p.to_type = pred.predicted THEN 1 END), 0)
        |    AS BIGINT) AS hits,
        |  CAST(COALESCE(sum(CASE WHEN p.to_type = pred.predicted THEN 1 END), 0)
        |    AS BIGINT) * 1000000 // count(*) AS acc_ppm
        |FROM pairs p JOIN pred ON pred.from_type = p.from_type
        |GROUP BY 1, 2""".stripMargin,
    // same x n_days centering (residuals sum to zero exactly), same
    // running-extrema cusum identities, same one-average-day threshold
    "q166_cusum" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(cnt) AS BIGINT) AS total
        |  FROM daily GROUP BY 1),
        |s AS (
        |  SELECT d.event_type, d.day_num, d.cnt, st.total,
        |    sum(d.cnt * st.n_days - st.total) OVER
        |      (PARTITION BY d.event_type ORDER BY d.day_num
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM daily d JOIN st USING (event_type)),
        |x AS (
        |  SELECT event_type, day_num, cnt, total, s,
        |    CAST(s - min(s) OVER (PARTITION BY event_type ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cusum_pos,
        |    CAST(max(s) OVER (PARTITION BY event_type ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - s AS BIGINT)
        |      AS cusum_neg
        |  FROM s)
        |SELECT event_type, day_num, cnt, cusum_pos, cusum_neg,
        |  cusum_pos > total AS flag_up, cusum_neg > total AS flag_down
        |FROM x""".stripMargin,
    // same literal weight table, same age lookup and integer score,
    // same (score DESC, user) top-20
    "q180_decayed_leaderboard" ->
      s"""WITH daily AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |md AS (SELECT max(day) AS max_day FROM daily),
        |sc AS (
        |  SELECT user_id, cnt,
        |    CASE WHEN max_day - day <= 63
        |      THEN ([${operators.DecayWeights.ppm.mkString(", ")}])
        |        [CAST(max_day - day + 1 AS INTEGER)]
        |      ELSE 0 END AS w_ppm
        |  FROM daily CROSS JOIN md)
        |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(sum(cnt * w_ppm) AS BIGINT) AS decayed_ppm
        |FROM sc GROUP BY 1
        |ORDER BY decayed_ppm DESC, user_id LIMIT 20""".stripMargin,
    // same running click count / first / last over the q97 order, same
    // integer ppm credit schedule
    "q190_position_attribution" ->
      """WITH ce AS (
        |  SELECT event_id, ts, user_id, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (
        |  SELECT event_id, user_id, event_type,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_clicks,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
        |  FROM ce)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(n_clicks AS BIGINT) AS n_clicks, first_click_id, last_click_id,
        |  CAST(CASE WHEN n_clicks = 1 THEN 1000000
        |       WHEN n_clicks = 2 THEN 500000 ELSE 400000 END AS BIGINT) AS first_ppm,
        |  CAST(CASE WHEN n_clicks = 1 THEN 1000000
        |       WHEN n_clicks = 2 THEN 500000 ELSE 400000 END AS BIGINT) AS last_ppm,
        |  CAST(CASE WHEN n_clicks <= 2 THEN 0
        |       ELSE 200000 // (n_clicks - 2) END AS BIGINT) AS mid_ppm
        |FROM r WHERE event_type = 'purchase' AND n_clicks >= 1""".stripMargin,
    // same daily pairs, same IEEE slope divisions, same exact median
    // order statistic with (d1, d2) tiebreaks
    "q226_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.event_type, a.day_num AS d1, b.day_num AS d2,
        |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.day_num - a.day_num AS DOUBLE)
        |      AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day_num < b.day_num),
        |rk AS (
        |  SELECT event_type, slope,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope, d1, d2) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM sl),
        |med AS (
        |  SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
        |    sum(slope) / count(*) AS median_slope
        |  FROM rk WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
        |  GROUP BY 1),
        |nd AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT med.event_type, n_days, n_pairs, median_slope
        |FROM med JOIN nd ON med.event_type = nd.event_type""".stripMargin,
    // same per-(user, type) min/max collapse, same strict-< precedence
    "q213_sequential_pairs" ->
      """WITH ut AS (
        |  SELECT user_id, event_type,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_users_both,
        |  CAST(sum(CASE WHEN a.first_us < b.last_us THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_users_ab,
        |  CAST(sum(CASE WHEN a.first_us < b.last_us THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS direction_ppm
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |GROUP BY 1, 2""".stripMargin,
    // same epoch-day % 7 buckets, same cross-multiplied ppm index
    "q209_weekday_seasonality" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num
        |  FROM events),
        |tw AS (
        |  SELECT event_type, day_num % 7 AS weekday,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT day_num) AS BIGINT) AS n_days
        |  FROM d GROUP BY 1, 2),
        |tt AS (
        |  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS type_events,
        |    CAST(sum(n_days) AS BIGINT) AS type_days
        |  FROM tw GROUP BY 1)
        |SELECT tw.event_type, weekday, n_events, n_days,
        |  n_events * type_days * 1000000 // (n_days * type_events) AS index_ppm
        |FROM tw JOIN tt ON tw.event_type = tt.event_type""".stripMargin,
    // same observed-day lag convention, same both-lags-present filter,
    // same single division of exact BIGINT error sums
    "q195_forecast_skill" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, cnt,
        |    lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day_num) AS lag1,
        |    lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day_num) AS lag7
        |  FROM daily)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(cnt - lag1)) AS BIGINT) AS naive_abs_err,
        |  CAST(sum(abs(cnt - lag7)) AS BIGINT) AS seasonal_abs_err,
        |  CASE WHEN sum(abs(cnt - lag1)) = 0 THEN NULL
        |       ELSE CAST(sum(abs(cnt - lag7)) AS DOUBLE)
        |         / CAST(sum(abs(cnt - lag1)) AS DOUBLE) END AS skill
        |FROM lagged WHERE lag1 IS NOT NULL AND lag7 IS NOT NULL
        |GROUP BY event_type""".stripMargin,
    // five HUGEINT moments over the lag-joined daily table; r evaluated
    // in the same cast/multiply/sqrt/divide order as the Spark column
    "q150_autocorrelation" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |lags AS (SELECT unnest([1, 7]) AS lag_d),
        |pairs AS (
        |  SELECT a.event_type, l.lag_d, a.cnt AS x, b.cnt AS y
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.event_type = a.event_type
        |    AND b.day_num = a.day_num + l.lag_d),
        |m AS (
        |  SELECT event_type, lag_d, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, lag_d, n AS n_pairs,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
        |  CAST(n * syy - sy * sy AS BIGINT) AS den_y,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |      * CAST(n * syy - sy * sy AS DOUBLE)) AS r
        |FROM m""".stripMargin,
    // x100 scale lands quantile_cont interpolation on integers at
    // p ∈ {.5,.9,.99}; the /100 rescale divides exact integers
    "q134_transition_latency" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER w AS to_type,
        |    100 * (epoch_us(CAST(lead(ts) OVER w AS TIMESTAMP))
        |           - epoch_us(CAST(ts AS TIMESTAMP))) AS gap100
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type AS from_type, to_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(gap100, 0.50) / 100.0 AS p50_us,
        |  quantile_cont(gap100, 0.90) / 100.0 AS p90_us,
        |  quantile_cont(gap100, 0.99) / 100.0 AS p99_us
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // same pinned fold: list_reduce seeds with the first element exactly
    // like the Spark aggregate() seeded with days[0]
    "q132_ewma_volume" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  max(day_num) AS last_day,
        |  list_reduce(list(CAST(cnt AS DOUBLE) ORDER BY day_num),
        |    (acc, x) -> x + acc / 2.0) AS ewma
        |FROM daily GROUP BY 1""".stripMargin,
    // the oracle recomputes the report through its own daily CTE — the
    // hash grade IS the partial-merge == direct-aggregate proof
    "q131_rollup_merge" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day_num // 30 AS month_num,
        |  CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(max(cnt) AS BIGINT) AS peak_daily,
        |  CAST(count(*) AS BIGINT) AS days_active
        |FROM daily GROUP BY 1, 2""".stripMargin,
    // HUGEINT OLS moments; slope_micro sign-adjusts DuckDB's floor //
    // to match Spark's truncating div (denominator ≥ 0 by Cauchy-Schwarz)
    "q144_volume_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(day_num AS HUGEINT)) AS sx,
        |    sum(CAST(cnt AS HUGEINT)) AS sy,
        |    sum(CAST(day_num AS HUGEINT) * CAST(cnt AS HUGEINT)) AS sxy,
        |    sum(CAST(day_num AS HUGEINT) * CAST(day_num AS HUGEINT)) AS sxx,
        |    sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS syy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  CAST(CASE WHEN n * sxy - sx * sy < 0
        |    THEN -((sx * sy - n * sxy) * 1000000 // (n * sxx - sx * sx))
        |    ELSE (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) END
        |    AS BIGINT) AS slope_micro,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
        |    / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE) AS r2
        |FROM m""".stripMargin,
    // same lead() gaps; Σdt² and (Σdt)² in DECIMAL(38,0) so the cv² flag
    // is an exact integer compare (q103 pattern); cv² NULL on zero span
    "q118_automation_signals" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |gaps AS (
        |  SELECT user_id,
        |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dt
        |  FROM ev),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(dt) AS BIGINT) AS sx,
        |    CAST(min(dt) AS BIGINT) AS min_gap_us,
        |    CAST(max(dt) AS BIGINT) AS max_gap_us,
        |    sum(CAST(dt AS DECIMAL(38,0)) * CAST(dt AS DECIMAL(38,0))) AS sxx
        |  FROM gaps WHERE dt IS NOT NULL GROUP BY 1 HAVING count(*) >= 5)
        |SELECT user_id, n_gaps, sx AS span_us, min_gap_us, max_gap_us,
        |  CAST(sx AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
        |  CASE WHEN sx <> 0 THEN
        |    CAST(CAST(n_gaps AS DECIMAL(38,0)) * sxx AS DOUBLE)
        |      / CAST(CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS DOUBLE)
        |      - 1.0 END AS cv2,
        |  n_gaps >= 10 AND
        |    CAST(25 AS DECIMAL(38,0)) * CAST(n_gaps AS DECIMAL(38,0)) * sxx <
        |    CAST(26 AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
        |    AS is_bot
        |FROM agg""".stripMargin,
    // same lead() hold intervals; sum(cents*dt) is an exact BIGINT on
    // both engines, one division returns original units
    "q114_time_weighted_avg" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CAST(floor(value * 100.0) AS BIGINT) AS cents
        |  FROM events),
        |held AS (
        |  SELECT user_id, cents,
        |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dt
        |  FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  CAST(CAST(sum(cents * dt) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(dt) AS BIGINT) * 100 AS DOUBLE) AS twa
        |FROM held GROUP BY 1""".stripMargin,
    // epoch-day integer keys; coalesce keeps all-returning days at 0 new
    "q112_user_reach" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num
        |  FROM events),
        |daily AS (
        |  SELECT day_num, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM ev GROUP BY 1),
        |firsts AS (
        |  SELECT user_id, min(day_num) AS first_day FROM ev GROUP BY 1),
        |news AS (
        |  SELECT first_day AS day_num, CAST(count(*) AS BIGINT) AS n_new
        |  FROM firsts GROUP BY 1)
        |SELECT d.day_num, d.n_active,
        |  COALESCE(n.n_new, 0) AS n_new,
        |  CAST(sum(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day_num) AS BIGINT) AS cum_reach
        |FROM daily d LEFT JOIN news n USING (day_num)""".stripMargin,
    // same cleared-denominator integer z-test; epoch-day via integer
    // division, squared comparison in DECIMAL(38,0) on both engines
    "q103_volume_anomalies" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(cnt) AS BIGINT) AS s,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS q
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day_num, d.cnt,
        |  st.n_days * d.cnt - st.s AS dev,
        |  CAST(st.n_days * d.cnt - st.s AS DECIMAL(38,0))
        |      * CAST(st.n_days * d.cnt - st.s AS DECIMAL(38,0))
        |    > CAST(4 AS DECIMAL(38,0))
        |      * (CAST(st.n_days AS DECIMAL(38,0)) * CAST(st.q AS DECIMAL(38,0))
        |         - CAST(st.s AS DECIMAL(38,0)) * CAST(st.s AS DECIMAL(38,0)))
        |    AS is_spike
        |FROM daily d JOIN stats st USING (event_type)""".stripMargin,
    // running last-click window with the same (ts, event_id) total order;
    // IGNORE NULLS last_value is the as-of state carrier on both engines
    "q97_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |tagged AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_click_ts
        |  FROM ev)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  attr_click_id AS click_id, attr_click_ts AS click_ts,
        |  CAST((epoch_us(ts) - epoch_us(attr_click_ts)) // 1000000 AS BIGINT) AS latency_s,
        |  ((epoch_us(ts) - epoch_us(attr_click_ts)) // 1000000 IS NOT NULL
        |    AND (epoch_us(ts) - epoch_us(attr_click_ts)) // 1000000 <= 1800) AS within_30m
        |FROM tagged WHERE event_type = 'purchase'""".stripMargin,
  )
}
