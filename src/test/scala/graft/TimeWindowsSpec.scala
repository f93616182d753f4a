package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeWindows

class TimeWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  test("sessionSequences orders by event time (not arrival) and splits on the gap") {
    // user 7: two sessions (>5 min gap); rows arrive OUT of time order.
    // user 8: one session whose event-type sequence equals user 7's first.
    val events = Seq(
      (2L, ts(1), 7L, "click", 1.0, ""),
      (1L, ts(0), 7L, "view", 1.0, ""), // arrives later, happens first
      (3L, ts(20), 7L, "buy", 1.0, ""), // 19 min later → new session
      (4L, ts(40), 8L, "view", 1.0, ""),
      (5L, ts(41), 8L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.sessionSequences(events).collect()
      .map(row => (row.getAs[Long]("user_id"), row.getAs[Timestamp]("session_start")) ->
        (row.getAs[Long]("n_events"), row.getAs[Long]("seq_hash"))).toMap
    assert(r.size === 3)
    val (n1, h1) = r((7L, ts(0)))
    val (n2, h2) = r((7L, ts(20)))
    val (n3, h3) = r((8L, ts(40)))
    assert(n1 === 2L && n2 === 1L && n3 === 2L)
    // same event-type sequence ("view click") → same fingerprint, across users
    assert(h1 === h3)
    // a different sequence gets a different fingerprint
    assert(h2 !== h1)
  }

  test("lastTouchAttribution: most recent prior click, ties by event_id, nulls kept") {
    val events = Seq(
      (1L, ts(0), 7L, "click", 1.0, ""),
      (2L, ts(5), 7L, "click", 1.0, ""),   // the most recent prior click
      (3L, ts(10), 7L, "purchase", 1.0, ""),
      (4L, ts(10), 7L, "click", 1.0, ""),  // same ts as purchase, HIGHER id → not prior
      (5L, ts(50), 7L, "purchase", 1.0, ""), // 40 min after click 4 → outside 30m
      (6L, ts(2), 8L, "purchase", 1.0, ""), // user 8 never clicked
      (7L, ts(3), 8L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.lastTouchAttribution(events).collect()
      .map(row => row.getAs[Long]("purchase_id") ->
        (Option(row.getAs[java.lang.Long]("click_id")),
          Option(row.getAs[java.lang.Long]("latency_s")),
          row.getAs[Boolean]("within_30m"))).toMap
    assert(r(3L) === ((Some(2L), Some(300L), true)))
    assert(r(5L) === ((Some(4L), Some(2400L), false)))
    assert(r(6L) === ((None, None, false)))
  }

  test("transitionMatrix: hand-computed counts, per-from probabilities sum to 1") {
    // user 7: view -> click -> view -> purchase ; user 8: view -> click
    val events = Seq(
      (1L, ts(0), 7L, "view", 1.0, ""),
      (2L, ts(1), 7L, "click", 1.0, ""),
      (3L, ts(2), 7L, "view", 1.0, ""),
      (4L, ts(3), 7L, "purchase", 1.0, ""),
      (5L, ts(0), 8L, "view", 1.0, ""),
      (6L, ts(1), 8L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = TimeWindows.transitionMatrix(events).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("p"))).toMap
    assert(m(("view", "click")) === ((2L, 2.0 / 3)))
    assert(m(("click", "view")) === ((1L, 1.0)))
    assert(m(("view", "purchase")) === ((1L, 1.0 / 3)))
    assert(!m.contains(("click", "purchase")), "unseen transitions yield no row")
    // rows partition the adjacency count: per-from p sums to exactly 1
    val byFrom = m.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    assert(byFrom.forall { case (_, s) => math.abs(s - 1.0) < 1e-12 })
  }

  test("conversionFunnel requires temporal order, not mere event presence") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), 1L, "view", 1.0, ""), (2L, ts(1), 1L, "click", 1.0, ""),
      (3L, ts(2), 1L, "purchase", 1.0, ""),
      // user 2: purchase BEFORE the click → counts at click, not purchase
      (4L, ts(0), 2L, "view", 1.0, ""), (5L, ts(2), 2L, "click", 1.0, ""),
      (6L, ts(1), 2L, "purchase", 1.0, ""),
      // user 3: click before any view → stops at view
      (7L, ts(1), 3L, "view", 1.0, ""), (8L, ts(0), 3L, "click", 1.0, ""),
      // user 4: never viewed → not even stage 1
      (9L, ts(0), 4L, "click", 1.0, ""), (10L, ts(1), 4L, "purchase", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.conversionFunnel(events).collect()
      .map(row => row.getAs[Int]("stage") ->
        (row.getAs[String]("stage_name"), row.getAs[Long]("n_users"),
          row.getAs[Double]("conv_from_prev"), row.getAs[Double]("conv_from_start")))
      .toMap
    assert(r(1) === (("view", 3L, 1.0, 1.0))) // users 1, 2, 3
    assert(r(2) === (("click", 2L, 2.0 / 3.0, 2.0 / 3.0))) // users 1, 2
    assert(r(3) === (("purchase", 1L, 0.5, 1.0 / 3.0))) // user 1 only
  }

  test("conversionFunnel generalizes to an arbitrary stage list") {
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.0, ""), (2L, ts(1), 1L, "b", 1.0, ""),
      (3L, ts(2), 2L, "a", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.conversionFunnel(events, Seq("a", "b"))
      .collect().map(row => row.getAs[Int]("stage") -> row.getAs[Long]("n_users")).toMap
    assert(r === Map(1 -> 2L, 2 -> 1L))
  }

  test("trendingUsers: per-window leaderboard with deterministic tie-break") {
    // window [10:00, 10:15): user 1 ×3, user 2 ×2, users 3,4 ×1 (tie → lower id)
    // window [10:15, 10:30): user 4 ×2
    val events = Seq(
      (1L, ts(0), 1L, "view", 1.0, ""), (2L, ts(1), 1L, "view", 1.0, ""),
      (3L, ts(2), 1L, "view", 1.0, ""),
      (4L, ts(3), 2L, "view", 1.0, ""), (5L, ts(4), 2L, "view", 1.0, ""),
      (6L, ts(5), 3L, "view", 1.0, ""), (7L, ts(6), 4L, "view", 1.0, ""),
      (8L, ts(16), 4L, "view", 1.0, ""), (9L, ts(17), 4L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.trendingUsers(events).collect()
      .map(row => (row.getAs[java.sql.Timestamp]("ws"), row.getAs[Int]("rank")) ->
        (row.getAs[Long]("user_id"), row.getAs[Long]("n_events")))
      .toMap
    assert(r((ts(0), 1)) === ((1L, 3L)))
    assert(r((ts(0), 2)) === ((2L, 2L)))
    assert(r((ts(0), 3)) === ((3L, 1L))) // tie with user 4 → lower id wins
    assert(r((ts(15), 1)) === ((4L, 2L)))
    assert(r.size === 4) // second window has only one user
  }

  test("cohortRetention: hand-computed weekly matrix") {
    // fixed UTC grid: week w maps to ts = w * 604800 s
    def wk(w: Long, u: Long, id: Long) =
      (id, new java.sql.Timestamp(w * 604800L * 1000L), u, "view", 1.0, "")
    val events = Seq(
      wk(100L, 1L, 1), wk(101L, 1L, 2), wk(102L, 1L, 3), // user 1: weeks 100,101,102
      wk(100L, 2L, 4), wk(102L, 2L, 5), //                  user 2: weeks 100,102
      wk(101L, 3L, 6), //                                   user 3: week 101 only
      wk(100L, 1L, 7)) //                                   dup (user 1, week 100) — ignored
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.TimeWindows.cohortRetention(events).collect()
      .map(row => (row.getAs[Long]("cohort_week"), row.getAs[Long]("week_offset")) ->
        (row.getAs[Long]("n_active"), row.getAs[Long]("cohort_size"),
          row.getAs[Double]("retention")))
      .toMap
    // cohort 100 = {1, 2}; cohort 101 = {3}
    assert(r === Map(
      (100L, 0L) -> ((2L, 2L, 1.0)),
      (100L, 1L) -> ((1L, 2L, 0.5)),
      (100L, 2L) -> ((2L, 2L, 1.0)),
      (101L, 0L) -> ((1L, 1L, 1.0))))
  }

  test("sessionSequences breaks timestamp ties by event_id") {
    val events = Seq(
      (11L, ts(0), 1L, "b", 1.0, ""),
      (10L, ts(0), 1L, "a", 1.0, ""), // same instant — id order decides: a b
      (20L, ts(30), 2L, "a", 1.0, ""),
      (21L, ts(30), 2L, "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hashes = TimeWindows.sessionSequences(events)
      .select("seq_hash").as[Long].collect()
    assert(hashes.distinct.length === 1) // both users fingerprint as "a b"
  }

  test("dailyVolumeAnomalies: a planted 10x day is flagged, steady days are not") {
    def day(d: Int, i: Int): Timestamp =
      Timestamp.valueOf(f"2026-01-${d}%02d 10:00:${i % 60}%02d.${i}%06d")
    // 9 steady days of 10 events, day 10 has 100 (the runaway producer)
    val rows = (1 to 9).flatMap(d => (0 until 10).map(i =>
      (d * 1000L + i, day(d, i), 1L, "click", 1.0, ""))) ++
      (0 until 100).map(i => (10000L + i, day(10, i), 1L, "click", 1.0, ""))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.dailyVolumeAnomalies(events).collect()
      .map(row => row.getAs[Long]("day_num") ->
        (row.getAs[Long]("cnt"), row.getAs[Boolean]("is_spike"))).toMap
    assert(r.size === 10)
    val spikes = r.filter(_._2._2)
    assert(spikes.size === 1 && spikes.head._2._1 === 100L)
    // hand-check the integer z-test on the spike day:
    // n=10, S=190, Q=10900 -> dev=10*100-190=810; dev^2=656100
    // > 4*(10*10900 - 190^2)=4*72900=291600
    assert(r.values.count(!_._2) === 9)
  }

  test("timeWeightedAvg: hold-time weighting, single-event users keep NULL") {
    val events = Seq(
      // user 1: 10.0 held 3 min, then 40.0 held 1 min, then close -> 17.5
      (1L, ts(0), 1L, "v", 10.0, ""), (2L, ts(3), 1L, "v", 40.0, ""),
      (3L, ts(4), 1L, "v", 99.0, ""),
      // user 2: a single reading holds nothing
      (4L, ts(0), 2L, "v", 5.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.timeWeightedAvg(events).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_events"), Option(x.get(x.fieldIndex("twa"))))).toMap
    assert(r(1L)._1 === 3L)
    assert(math.abs(r(1L)._2.get.asInstanceOf[Double] - 17.5) < 1e-12)
    assert(r(2L)._1 === 1L && r(2L)._2.isEmpty)
  }

  test("automationSignals: metronomic traffic flags as bot, bursty human does not") {
    def at(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)
    val bot = (0 to 10).map(i => ((100 + i).toLong, at(i * 2), 1L, "v", 1.0, ""))
    // human: 10 gaps with one long pause -> cv2 large
    val human = (0 to 10).map(i =>
      ((200 + i).toLong, at(if (i <= 5) i else 3600 + i * 7), 2L, "v", 1.0, ""))
    // too few gaps (4): filtered out entirely
    val sparse = (0 to 4).map(i => ((300 + i).toLong, at(i), 3L, "v", 1.0, ""))
    val events = (bot ++ human ++ sparse)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.automationSignals(events).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_gaps"), x.getAs[Boolean]("is_bot"),
          x.getAs[Double]("cv2"))).toMap
    assert(r(1L) === ((10L, true, 0.0))) // perfectly uniform 2 s gaps
    assert(r(2L)._2 === false && r(2L)._3 > 1.0)
    assert(!r.contains(3L))
  }

  test("userReach: new-vs-returning split and monotone cumulative reach") {
    def day(d: Int, i: Int): Timestamp =
      Timestamp.valueOf(f"2026-01-${d}%02d 10:00:${i}%02d")
    // day1: users 1,2 (both new); day2: 1 returns + 3 is new; day3: all return
    val events = Seq(
      (1L, day(1, 0), 1L, "view", 1.0, ""), (2L, day(1, 1), 2L, "view", 1.0, ""),
      (3L, day(2, 0), 1L, "view", 1.0, ""), (4L, day(2, 1), 3L, "view", 1.0, ""),
      (5L, day(3, 0), 1L, "view", 1.0, ""), (6L, day(3, 1), 2L, "view", 1.0, ""),
      (7L, day(3, 2), 3L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.userReach(events).collect()
      .map(x => x.getAs[Long]("day_num") ->
        (x.getAs[Long]("n_active"), x.getAs[Long]("n_new"), x.getAs[Long]("cum_reach")))
      .toSeq.sortBy(_._1).map(_._2)
    assert(r === Seq((2L, 2L, 2L), (2L, 1L, 3L), (3L, 0L, 3L)))
  }

  test("transitionLatency: exact interpolated percentiles per edge") {
    def s(sec: Int): Timestamp = new Timestamp(sec * 1000L)
    // user 1: a@0 b@10 a@30 b@100 -> a->b gaps {10s, 70s}, b->a gap {20s}
    val events = Seq(
      (1L, s(0), 1L, "a", 0.0, ""), (2L, s(10), 1L, "a", 0.0, ""),
      (3L, s(30), 1L, "a", 0.0, ""), (4L, s(100), 1L, "a", 0.0, ""))
      .zip(Seq("a", "b", "a", "b"))
      .map { case ((id, ts, u, _, v, p), ty) => (id, ts, u, ty, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.transitionLatency(events).collect()
      .map(x => (x.getAs[String]("from_type"), x.getAs[String]("to_type")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("p50_us"),
          x.getAs[Double]("p90_us"), x.getAs[Double]("p99_us"))).toMap
    assert(r(("a", "b")) === ((2L, 4.0e7, 6.4e7, 6.94e7))) // 10s..70s interpolated
    assert(r(("b", "a")) === ((1L, 2.0e7, 2.0e7, 2.0e7)))  // single sample
  }

  test("ewmaDailyVolume: day-ordered half-life fold matches hand numbers") {
    def t(day: Int, i: Int): Timestamp =
      new Timestamp((day.toLong * 1440 + i) * 60000L)
    // type a daily counts by day: d0=2, d1=1, d3=4 (gap at d2 — the fold
    // is over OBSERVED days); s = 2 -> 1 + 2/2 = 2 -> 4 + 2/2 = 5
    val events = Seq(
      (1L, t(0, 0), 1L, "a", 0.0, ""), (2L, t(0, 1), 1L, "a", 0.0, ""),
      (3L, t(1, 0), 1L, "a", 0.0, ""),
      (4L, t(3, 0), 1L, "a", 0.0, ""), (5L, t(3, 1), 1L, "a", 0.0, ""),
      (6L, t(3, 2), 1L, "a", 0.0, ""), (7L, t(3, 3), 1L, "a", 0.0, ""),
      (8L, t(0, 0), 2L, "b", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.ewmaDailyVolume(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_days"), x.getAs[Long]("last_day"), x.getAs[Double]("ewma")))
      .toMap
    assert(r("a") === ((3L, 3L, 5.0)))
    assert(r("b") === ((1L, 0L, 1.0))) // single day: seed only
  }

  test("volumeTrend: exact OLS slope and r2 match hand-computed lines") {
    def t(day: Int, i: Int): Timestamp =
      new Timestamp((day.toLong * 1440 + i) * 60000L)
    // "up": counts 1,3,5 over days 0-2 — a perfect slope-2 line;
    // "down": counts 4,2 over days 0-1 — a perfect slope −2 line
    val events = (
      (1 to 1).map(i => (i.toLong, t(0, i), 1L, "up", 0.0, "")) ++
      (1 to 3).map(i => (10 + i.toLong, t(1, i), 1L, "up", 0.0, "")) ++
      (1 to 5).map(i => (20 + i.toLong, t(2, i), 1L, "up", 0.0, "")) ++
      (1 to 4).map(i => (30 + i.toLong, t(0, i), 2L, "down", 0.0, "")) ++
      (1 to 2).map(i => (40 + i.toLong, t(1, i), 2L, "down", 0.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.volumeTrend(events).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("up").getAs[Long]("n_days") === 3L)
    assert(r("up").getAs[Long]("slope_micro") === 2000000L)
    assert(r("up").getAs[Double]("slope") === 2.0)
    assert(r("up").getAs[Double]("r2") === 1.0)
    assert(r("down").getAs[Long]("slope_micro") === -2000000L)
    assert(r("down").getAs[Double]("slope") === -2.0)
  }

  test("monthlyRollup: daily partials merge to the direct monthly numbers") {
    def t(day: Int, i: Int): Timestamp =
      new Timestamp((day.toLong * 1440 + i) * 60000L)
    // month 0 = days 0..29, month 1 = days 30..59; type a: days 0 (2 ev),
    // 29 (1 ev), 30 (3 ev); type b: day 0 (1 ev)
    val events = Seq(
      (1L, t(0, 0), 1L, "a", 1.00, ""), (2L, t(0, 1), 1L, "a", 2.00, ""),
      (3L, t(29, 0), 1L, "a", 0.50, ""),
      (4L, t(30, 0), 1L, "a", 1.00, ""), (5L, t(30, 1), 1L, "a", 1.00, ""),
      (6L, t(30, 2), 1L, "a", 1.00, ""),
      (7L, t(0, 0), 2L, "b", 9.99, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.monthlyRollup(events).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("month_num")) ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("total_cents"),
          x.getAs[Long]("peak_daily"), x.getAs[Long]("days_active"))).toMap
    assert(r(("a", 0L)) === ((3L, 350L, 2L, 2L))) // days 0 (2 ev, 300c) + 29
    assert(r(("a", 1L)) === ((3L, 300L, 3L, 1L)))
    assert(r(("b", 0L)) === ((1L, 999L, 1L, 1L)))
  }

  test("scdIntervals: runs collapse, versions count changes, last is open") {
    // user 1: a a b a  -> intervals a[t0,t2) b[t2,t3) a[t3,∞)
    // user 2: single event -> one open interval
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.0, ""),
      (2L, ts(1), 1L, "a", 1.0, ""), // same run, no new version
      (3L, ts(2), 1L, "b", 1.0, ""),
      (4L, ts(3), 1L, "a", 1.0, ""),
      (5L, ts(0), 2L, "x", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.scdIntervals(events).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("version")) ->
        (x.getAs[String]("attr_value"), x.getAs[Long]("valid_from_us"),
          Option(x.getAs[java.lang.Long]("valid_to_us")).map(_.toLong),
          x.getAs[Boolean]("is_current"))).toMap
    def us(min: Int): Long = ts(min).getTime * 1000L
    assert(r.size === 4)
    assert(r((1L, 1L)) === (("a", us(0), Some(us(2)), false)))
    assert(r((1L, 2L)) === (("b", us(2), Some(us(3)), false)))
    assert(r((1L, 3L)) === (("a", us(3), None, true)))
    assert(r((2L, 1L)) === (("x", us(0), None, true)))
  }

  test("autocorrelation: perfectly linear dailies give r(1) = 1 exactly") {
    // type a: counts 1,2,3,4,5 on days 0..4 -> lag-1 pairs perfectly
    // correlated; only 5 days, so lag 7 emits no row
    def t(day: Int, i: Int): Timestamp =
      new Timestamp((day.toLong * 1440 + i) * 60000L)
    val rows = for {
      d <- 0 until 5
      i <- 0 to d // day d gets d+1 events
    } yield ((d * 100 + i).toLong, t(d, i), 1L, "a", 1.0, "")
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.autocorrelation(events, lags = Seq(1, 7)).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("event_type") === "a")
    assert(row.getAs[Int]("lag_d") === 1)
    assert(row.getAs[Long]("n_pairs") === 4L)
    // moments: sx=10 sy=14 sxy=40 sxx=30 syy=54 -> num=20, both dens=20
    assert(row.getAs[Long]("num") === 20L)
    assert(row.getAs[Long]("den_x") === 20L)
    assert(row.getAs[Long]("den_y") === 20L)
    assert(row.getAs[Double]("r") === 1.0)
  }

  private def dayTs(day: Int, min: Int = 0): Timestamp =
    new Timestamp((day.toLong * 1440 + min) * 60000L)

  test("positionAttribution: U-shaped credits with exact middle shares") {
    // u1: 3 clicks then purchase (40/40/20 split, one middle at 200000);
    // u2: 1 click then purchase (full credit); u3: clickless purchase
    // excluded
    val events = Seq(
      (1L, ts(0), 1L, "click", 1.0, ""), (2L, ts(1), 1L, "click", 1.0, ""),
      (3L, ts(2), 1L, "click", 1.0, ""), (4L, ts(3), 1L, "purchase", 1.0, ""),
      (5L, ts(0), 2L, "click", 1.0, ""), (6L, ts(1), 2L, "purchase", 1.0, ""),
      (7L, ts(0), 3L, "purchase", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.positionAttribution(events).collect()
      .map(x => x.getAs[Long]("purchase_id") ->
        (x.getAs[Long]("n_clicks"), x.getAs[Long]("first_click_id"),
          x.getAs[Long]("last_click_id"), x.getAs[Long]("first_ppm"),
          x.getAs[Long]("last_ppm"), x.getAs[Long]("mid_ppm"))).toMap
    assert(r.keySet === Set(4L, 6L))
    assert(r(4L) === ((3L, 1L, 3L, 400000L, 400000L, 200000L)))
    assert(r(6L) === ((1L, 5L, 5L, 1000000L, 1000000L, 0L)))
  }

  test("decayedLeaderboard: half-life weights rank recency over volume") {
    import graft.operators.DecayWeights
    val w = DecayWeights.ppm
    assert(w.head === 1000000L)
    assert(w(7) === 500000L && w(14) === 250000L) // exact halvings
    assert(w.zip(w.tail).forall { case (a, b) => a > b })
    // u1: 1 event today (1e6); u2: 3 events 7 days ago (1.5e6);
    // u3: 100 events 70 days ago (age > 63 -> 0)
    val events = (Seq((1L, dayTs(70), 1L, "view", 1.0, ""),
      (2L, dayTs(63), 2L, "view", 1.0, ""),
      (3L, dayTs(63, 1), 2L, "view", 1.0, ""),
      (4L, dayTs(63, 2), 2L, "view", 1.0, "")) ++
      (0 until 100).map(i => (10L + i, dayTs(0, i), 3L, "view", 1.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.decayedLeaderboard(events).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("decayed_ppm")))
    assert(r.toSeq === Seq(2L -> ((3L, 1500000L)), 1L -> ((1L, 1000000L)),
      3L -> ((100L, 0L))))
  }

  test("churnHazard: at-risk shrinks by prior deaths, nano terms are exact floors") {
    // users 1,2 last active day 0; user 3 last active day 2
    val events = Seq(
      (1L, dayTs(0), 1L, "view", 1.0, ""),
      (2L, dayTs(0, 5), 2L, "view", 1.0, ""),
      (3L, dayTs(0), 3L, "view", 1.0, ""),
      (4L, dayTs(2), 3L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.churnHazard(events).collect()
      .map(x => x.getAs[Long]("day_num") ->
        (x.getAs[Long]("deaths"), x.getAs[Long]("n_at_risk"),
          x.getAs[Long]("h_term_nano"), x.getAs[Long]("h_cum_nano"))).toMap
    assert(r.keySet === Set(0L, 2L))
    assert(r(0L) === ((2L, 3L, 2000000000L / 3L, 2000000000L / 3L)))
    assert(r(2L) === ((1L, 1L, 1000000000L,
      2000000000L / 3L + 1000000000L)))
  }

  test("markovEval: argmax prediction, alphabetical ties, exact ppm accuracy") {
    // user 1: A B A B -> pairs A->B, B->A, A->B
    // user 2: C A C B -> pairs C->A, A->C, C->B (C's argmax ties -> A)
    val events = Seq(
      (1L, ts(0), 1L, "A", 1.0, ""), (2L, ts(1), 1L, "B", 1.0, ""),
      (3L, ts(2), 1L, "A", 1.0, ""), (4L, ts(3), 1L, "B", 1.0, ""),
      (5L, ts(10), 2L, "C", 1.0, ""), (6L, ts(11), 2L, "A", 1.0, ""),
      (7L, ts(12), 2L, "C", 1.0, ""), (8L, ts(13), 2L, "B", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.markovEval(events).collect()
      .map(x => x.getAs[String]("from_type") ->
        (x.getAs[String]("predicted"), x.getAs[Long]("n_pairs"),
          x.getAs[Long]("hits"), x.getAs[Long]("acc_ppm"))).toMap
    assert(r("A") === (("B", 3L, 2L, 2000000L / 3L)))
    assert(r("B") === (("A", 1L, 1L, 1000000L)))
    assert(r("C") === (("A", 2L, 1L, 500000L)))
  }

  test("cusumChangePoints: running-extrema identities, one-average-day flag") {
    // type X: days 0,1,2 with counts 1,1,10 -> n=3, total=12
    // resid x3: -9,-9,18; s: -9,-18,0; pos: 0,0,18 (18 > 12 -> flag);
    // neg: 0,9,0 (never > 12)
    val rows = (0 until 1).map(_ => (1L, dayTs(0), 1L, "X", 1.0, "")) ++
      Seq((2L, dayTs(1), 1L, "X", 1.0, "")) ++
      (0 until 10).map(i => (10L + i, dayTs(2, i), 1L, "X", 1.0, ""))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.cusumChangePoints(events).collect()
      .map(x => x.getAs[Long]("day_num") ->
        (x.getAs[Long]("cusum_pos"), x.getAs[Long]("cusum_neg"),
          x.getAs[Boolean]("flag_up"), x.getAs[Boolean]("flag_down"))).toMap
    assert(r(0L) === ((0L, 0L, false, false)))
    assert(r(1L) === ((0L, 9L, false, false)))
    assert(r(2L) === ((18L, 0L, true, false)))
  }

  test("forecastSkillFromDaily: hand-numbered lags, shared denominator, NULL on zero naive") {
    val daily =
      ((0 to 9).map(d => ("c", d.toLong, Seq(10L,11L,12L,13L,14L,15L,16L,20L,21L,22L)(d))) ++
       (0 to 9).map(d => ("flat", d.toLong, 5L)))
        .toDF("event_type", "day_num", "cnt")
    val r = TimeWindows.forecastSkillFromDaily(daily).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_days"), x.getAs[Long]("naive_abs_err"),
          x.getAs[Long]("seasonal_abs_err"), Option(x.get(x.fieldIndex("skill"))))).toMap
    // days 7..9 score: naive |20-16|+|21-20|+|22-21| = 6; seasonal 10+10+10 = 30
    assert(r("c") === ((3L, 6L, 30L, Some(5.0))))
    // constant series: both errors zero, skill NULL (not 0/0)
    assert(r("flat") === ((3L, 0L, 0L, None)))
  }

  test("theilSen: the median slope fully rejects one wild day") {
    // counts 1,2,3,4,100 over days 0-4: 6 of the 10 pairwise slopes are
    // exactly 1; OLS would report ~20/day, Theil-Sen reports 1
    def at(day: Int, i: Int) = new Timestamp((day * 86400L + i) * 1000L)
    val counts = Seq(1, 2, 3, 4, 100)
    val events = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ((d * 1000 + i).toLong, at(d, i), 1L, "view", 0.0, "")) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.TimeWindows.theilSenTrend(events).collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Double]("median_slope") === 1.0)
  }

  test("sequentialPairs: strict first-before-last precedence, both-users base") {
    def at(sec: Int) = new Timestamp(sec * 1000L)
    val events = Seq(
      // user 1 interleaves: view(1), click(2), view(3) → precedence both ways
      (1L, at(1), 1L, "view", 0.0, ""), (2L, at(2), 1L, "click", 0.0, ""),
      (3L, at(3), 1L, "view", 0.0, ""),
      // user 2: only view — contributes to no pair
      (4L, at(5), 2L, "view", 0.0, ""),
      // user 3: purchase(7) then view(8) — one direction only
      (5L, at(7), 3L, "purchase", 0.0, ""), (6L, at(8), 3L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.TimeWindows.sequentialPairs(events).collect()
      .map(x => (x.getAs[String]("type_a"), x.getAs[String]("type_b")) ->
        (x.getAs[Long]("n_users_both"), x.getAs[Long]("n_users_ab"),
          x.getAs[Long]("direction_ppm"))).toMap
    assert(r(("view", "click")) === ((1L, 1L, 1000000L)))
    assert(r(("click", "view")) === ((1L, 1L, 1000000L)))
    assert(r(("purchase", "view")) === ((1L, 1L, 1000000L)))
    assert(r(("view", "purchase")) === ((1L, 0L, 0L)))
  }

  test("weekdaySeasonality: ppm index is the cross-multiplied day-rate ratio") {
    // epoch day 0 (weekday 0) carries two events, day 1 (weekday 1) one;
    // type mean = 3 events / 2 days
    def at(day: Int, sec: Int) =
      new Timestamp(day * 86400000L + sec * 1000L)
    val events = Seq(
      (1L, at(0, 10), 1L, "view", 0.0, ""),
      (2L, at(0, 20), 2L, "view", 0.0, ""),
      (3L, at(1, 10), 1L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.TimeWindows.weekdaySeasonality(events).collect()
      .map(x => x.getAs[Long]("weekday") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("n_days"),
          x.getAs[Long]("index_ppm"))).toMap
    assert(r(0L) === ((2L, 1L, 1333333L))) // 2/1 vs 3/2 → 4/3
    assert(r(1L) === ((1L, 1L, 666666L)))  // 1/1 vs 3/2 → 2/3
  }

  test("kendallFromDaily: monotone co-movement is all-concordant, ties counted") {
    // days 0..2: a = 1,2,3 ; b = 10,20,30 (concordant); c = 5,5,1
    val daily = Seq(
      ("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L),
      ("b", 0L, 10L), ("b", 1L, 20L), ("b", 2L, 30L),
      ("c", 0L, 5L), ("c", 1L, 5L), ("c", 2L, 1L))
      .toDF("event_type", "day_num", "cnt")
    val r = TimeWindows.kendallFromDaily(daily).collect()
      .map(x => (x.getAs[String]("type_a"), x.getAs[String]("type_b")) ->
        (x.getAs[Long]("n_day_pairs"), x.getAs[Long]("concordant"),
          x.getAs[Long]("discordant"), x.getAs[Long]("tie_a"),
          x.getAs[Long]("tie_b"))).toMap
    assert(r(("a", "b")) === ((3L, 3L, 0L, 0L, 0L)))
    // a vs c: pairs (0,1): a up, c tied -> tie_b; (0,2): a up c down ->
    // discordant; (1,2): a up c down -> discordant
    assert(r(("a", "c")) === ((3L, 0L, 2L, 0L, 1L)))
    assert(r(("b", "c")) === ((3L, 0L, 2L, 0L, 1L)))
  }

  test("binarySegmentation: a clean level shift splits exactly at the step") {
    // type a: days 0-3 at 2/day then days 4-7 at 10/day -> split after day 3
    val rows = (0 until 4).flatMap(d => (0 until 2).map(i =>
      ((d * 100 + i).toLong, dayTs(d, i), 1L, "a"))) ++
      (4 until 8).flatMap(d => (0 until 10).map(i =>
        ((d * 100 + i).toLong, dayTs(d, i), 1L, "a")))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type")
    val r = TimeWindows.binarySegmentation(events).collect()
    assert(r.length === 1)
    val m = r.head
    assert(m.getAs[Long]("n_days") === 8L)
    assert(m.getAs[Long]("split_day") === 3L)
    assert(m.getAs[Long]("left_days") === 4L && m.getAs[Long]("right_days") === 4L)
    assert(m.getAs[Long]("left_sum") === 8L && m.getAs[Long]("right_sum") === 40L)
    // score at the true split: d = 8*4 - 40*4 = -128; 128^2*1e9/(4*4)
    assert(m.getAs[Long]("score_nano") === 128L * 128L * 1000000000L / 16L)
  }

  test("seasonalAnomalies: a weekend dip never flags, a weekday spike does") {
    // type a: weekday-0 days {0,7,...,42} at 10 except day 42 at 100 — a
    // point can only clear 2 sigma of a population that CONTAINS it when
    // n >= 6 (max z^2 = n-1), hence seven Mondays. weekday-1 days {1,8}
    // at 2 (steady low; the all-days mean would flag these as dips, the
    // weekday population must not)
    val rows =
      Seq(0, 7, 14, 21, 28, 35).flatMap(d => (0 until 10).map(i =>
        ((d * 100 + i).toLong, dayTs(d, i), 1L, "a"))) ++
      (0 until 100).map(i => ((4200 + i).toLong, dayTs(42, i), 1L, "a")) ++
      Seq(1, 8).flatMap(d => (0 until 2).map(i =>
        ((d * 100 + i).toLong, dayTs(d, i), 1L, "a")))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type")
    val r = TimeWindows.seasonalAnomalies(events).collect()
      .map(x => x.getAs[Long]("day_num") ->
        (x.getAs[Long]("weekday"), x.getAs[Long]("cnt"), x.getAs[Long]("flagged")))
      .toMap
    assert(r(42L) === ((0L, 100L, 1L)), "the weekday spike must flag")
    assert(r(0L)._3 === 0L && r(7L)._3 === 0L && r(14L)._3 === 0L)
    assert(r(1L) === ((1L, 2L, 0L)), "steady weekday-1 days are normal")
    assert(r(8L)._3 === 0L)
  }

  test("binarySegmentationFromDaily closes the streamed daily twin to batch") {
    val daily = Seq(("a", 0L, 2L), ("a", 1L, 2L), ("a", 2L, 9L), ("a", 3L, 9L))
      .toDF("event_type", "day_num", "cnt")
    val r = TimeWindows.binarySegmentationFromDaily(daily).collect().head
    assert(r.getAs[Long]("split_day") === 1L)
    assert(r.getAs[Long]("left_sum") === 4L && r.getAs[Long]("right_sum") === 18L)
  }

  test("growthAccounting: the quartet sums to actives, churn lands a week late") {
    def wk(w: Long) = new java.sql.Timestamp(w * 7L * 86400000L)
    // u1: weeks 0,1,3 → new@0, retained@1, churned@2, resurrected@3,
    //     churned@4; u2: week 1 only → new@1, churned@2
    val rows = Seq(
      (1L, wk(0), 1L, "a", 0.0, ""), (2L, wk(1), 1L, "a", 0.0, ""),
      (3L, wk(3), 1L, "a", 0.0, ""),
      (4L, wk(1), 2L, "a", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.growthAccounting(rows).collect()
      .map(x => x.getAs[Long]("week") ->
        (x.getAs[Long]("n_active"), x.getAs[Long]("n_new"),
          x.getAs[Long]("n_retained"), x.getAs[Long]("n_resurrected"),
          x.getAs[Long]("n_churned"))).toMap
    assert(r(0L) === ((1L, 1L, 0L, 0L, 0L)))
    assert(r(1L) === ((2L, 1L, 1L, 0L, 0L)))
    assert(r(2L) === ((0L, 0L, 0L, 0L, 2L)))  // both vanish
    assert(r(3L) === ((1L, 0L, 0L, 1L, 0L)))  // u1 comes back
    assert(r(4L) === ((0L, 0L, 0L, 0L, 1L)))  // and churns again
    // identity: actives = new + retained + resurrected, every week
    r.values.foreach { case (a, n, ret, res, _) => assert(a === n + ret + res) }
  }

  test("pathTrigrams: ordered three-step paths, never crossing users") {
    def ts(n: Long) = new java.sql.Timestamp(n * 60000L)
    val rows = Seq(
      // user 1: a b c d → paths (a,b,c), (b,c,d)
      (1L, ts(0), 1L, "a", 0.0, ""), (2L, ts(1), 1L, "b", 0.0, ""),
      (3L, ts(2), 1L, "c", 0.0, ""), (4L, ts(3), 1L, "d", 0.0, ""),
      // user 2: a b c → (a,b,c) again
      (5L, ts(0), 2L, "a", 0.0, ""), (6L, ts(1), 2L, "b", 0.0, ""),
      (7L, ts(2), 2L, "c", 0.0, ""),
      // user 3: only 2 events — no trigram, and never merges with user 1
      (8L, ts(4), 3L, "d", 0.0, ""), (9L, ts(5), 3L, "a", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.pathTrigrams(rows).collect()
      .map(x => (x.getAs[String]("t1"), x.getAs[String]("t2"),
        x.getAs[String]("t3")) -> x.getAs[Long]("n_paths")).toMap
    assert(r === Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L))
  }

  test("engagementCurve: distinct days per user, tourists vs regulars") {
    def day(d: Long, off: Long = 0L) = new java.sql.Timestamp(d * 86400000L + off)
    val rows = Seq(
      // user 1: 3 events on 2 distinct days
      (1L, day(0), 1L, "a", 0.0, ""), (2L, day(0, 60000L), 1L, "a", 0.0, ""),
      (3L, day(1), 1L, "a", 0.0, ""),
      // users 2 and 3: one day each
      (4L, day(5), 2L, "a", 0.0, ""), (5L, day(6), 3L, "a", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.engagementCurve(rows).collect()
      .map(x => x.getAs[Long]("active_days") ->
        (x.getAs[Long]("n_users"), x.getAs[Long]("total_events"))).toMap
    assert(r === Map(2L -> ((1L, 3L)), 1L -> ((2L, 2L))))
  }

  test("timeWeightedValue: long-held readings dominate; last reading holds nothing") {
    def us(n: Long) = new java.sql.Timestamp(n / 1000L)
    // user 1: v=2.00 held 10s, v=4.00 held 20s, final v=99 never held
    // → twv = 200·1e7 + 400·2e7 = 1e10; span 3e7 µs; twa = 333 (e2)
    val rows = Seq(
      (1L, us(0L), 1L, "a", 2.0, ""),
      (2L, us(10000000L), 1L, "a", 4.0, ""),
      (3L, us(30000000L), 1L, "a", 99.0, ""),
      (4L, us(0L), 2L, "a", 5.0, ""))  // single event: no interval, dropped
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeWindows.timeWeightedValue(rows).collect()
    assert(r.length === 1)
    val m = r.head
    assert(m.getAs[Long]("user_id") === 1L)
    assert(m.getAs[Long]("n_intervals") === 2L)
    assert(m.getAs[Long]("twv_e2us") === 10000000000L)
    assert(m.getAs[Long]("span_us") === 30000000L)
    assert(m.getAs[Long]("twa_e2") === 333L)
  }
}
