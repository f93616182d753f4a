package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RealTime

/** Event row for the streaming session-sequence twin spec (top-level so
  * the product encoder resolves outside the suite instance).
  */
case class SessEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
case class DocEv(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** J3 pipeline specs: file-stream source → enrichment → sinks, driven
  * synchronously with AvailableNow + awaitTermination (the deterministic
  * test harness SURVEY.md §5.4 calls for).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeEvents(dir: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, "part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))

  private val userRecs = Seq(
    (1L, Array(101L, 102L)),
    (2L, Array(201L))).toDF("userId", "recommendedProducts")
  private val topProducts = Seq(
    (11L, 4.9), (12L, 4.8), (13L, 4.7)).toDF("productId", "avg_rating")

  test("enrich: known user gets own recs, cold-start user gets fallback, cap applies") {
    val reviews = Seq((1L, 5L, 5.0, 1000L), (99L, 6L, 4.0, 1001L))
      .toDF("userId", "productId", "review", "timestamp")
    val out = RealTime.enrich(reviews, userRecs, topProducts, cap = 2)
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("101", "102"))
    assert(out(99L) === Seq("11", "12")) // sorted fallback, capped at 2
  }

  test("streaming dedup drops re-delivered reviews, watermark-bounded state") {
    val in = tmp("dedup-in")
    writeEvents(in, Seq(
      """{"userId": 1, "productId": 3, "review": 5.0, "timestamp": 1105916400}""",
      """{"userId": 1, "productId": 3, "review": 5.0, "timestamp": 1105916401}""",
      """{"userId": 1, "productId": 4, "review": 4.0, "timestamp": 1105916402}""",
      """{"userId": 2, "productId": 3, "review": 3.0, "timestamp": 1105916403}"""))
    val outDir = tmp("dedup-out")
    val withTs = RealTime.readReviews(spark, in)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(col("timestamp")))
    graft.streaming.RealTime.dedupReviews(withTs)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", tmp("ck-dedup"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000)
    val rows = spark.read.parquet(outDir)
    assert(rows.count() === 3) // the re-delivered (1,3) collapsed
    assert(rows.select("userId", "productId").distinct().count() === 3)
  }

  test("sessionSequencesStream: streamed fingerprints equal the batch form on the same slice") {
    def t(min: Int): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + min * 60000L)
    // the same shape as TimeWindowsSpec's batch case: user 7 has two
    // sessions with in-batch disorder; user 8's single session repeats
    // user 7's first event-type sequence
    val closed = Seq(
      SessEv(2L, t(1), 7L, "click"), SessEv(1L, t(0), 7L, "view"),
      SessEv(3L, t(20), 7L, "buy"),
      SessEv(4L, t(40), 8L, "view"), SessEv(5L, t(41), 8L, "click"))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.sessionSequencesStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_seq")
      .option("checkpointLocation", tmp("sess-seq-ck"))
      .start()
    input.addData(closed.take(2): _*) // user 7 session 1, out of time order
    q.processAllAvailable()
    input.addData(closed.drop(2): _*) // session 2 + user 8
    q.processAllAvailable()
    // far-future events advance the watermark past every closed session
    // (watermark updates at batch end, so a second batch does the flush)
    input.addData(SessEv(8L, t(600), 9L, "view"))
    q.processAllAvailable()
    input.addData(SessEv(9L, t(601), 9L, "click"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_seq")
      .where($"user_id" =!= 9L) // user 9's session never closed
      .select("user_id", "session_start", "n_events", "seq_hash")
      .as[(Long, java.sql.Timestamp, Long, Long)].collect().toSet
    val batch = graft.operators.TimeWindows.sessionSequences(
      closed.toDF("event_id", "ts", "user_id", "event_type"))
      .select("user_id", "session_start", "n_events", "seq_hash")
      .as[(Long, java.sql.Timestamp, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 3) // two sessions for user 7, one for user 8
  }

  test("dailyCountsStream: streamed daily counts + batch z-pass equal dailyVolumeAnomalies") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // view: 6 closed days, 1 event/day except day 5 with 10 (a >2σ spike
    // needs n ≥ 6 days — max z over n days is (n−1)/√n); click: 2 flat
    // days (zero variance, never a spike). Hand-check for view day 5:
    // n=6, S=15, Q=105 → dev=45, 45² = 2025 > 4·(6·105−225) = 1620.
    val viewSingles = (0 to 4).map(d => SessEv(d + 1L, t(d, 0), 1L, "view"))
    val viewSpike = (0 until 10).map(i => SessEv(10 + i.toLong, t(5, i * 10), 2L, "view"))
    val clicks = Seq(
      SessEv(30L, t(0, 5), 1L, "click"), SessEv(31L, t(0, 6), 2L, "click"),
      SessEv(32L, t(1, 5), 1L, "click"), SessEv(33L, t(1, 6), 2L, "click"))
    val closed = viewSingles ++ viewSpike ++ clicks

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dailycounts")
      .option("checkpointLocation", tmp("dailycounts-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(11L, t(40, 0), 9L, "view")) // advance the watermark
    q.processAllAvailable()
    input.addData(SessEv(12L, t(40, 1), 9L, "view")) // next batch flushes
    q.processAllAvailable()
    q.stop()

    // localCheckpoint: the z-pass self-joins this frame with its own
    // aggregate, which the memory-sink View cannot deduplicate
    val streamedDaily = spark.table("dailycounts").where($"day_num" < 40).localCheckpoint()
    val batchDaily = graft.operators.TimeWindows.dailyCounts(
      closed.toDF("event_id", "ts", "user_id", "event_type"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "day_num", "cnt").as[(String, Long, Long)].collect().toSet
    assert(rows(streamedDaily) === rows(batchDaily))

    // the z-flag pass over the streamed table equals the one-shot batch op
    def graded(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "day_num", "cnt", "dev", "is_spike")
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
    val streamedGraded = graded(
      graft.operators.TimeWindows.volumeAnomaliesFromDaily(streamedDaily))
    val batchGraded = graded(graft.operators.TimeWindows.dailyVolumeAnomalies(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamedGraded === batchGraded)
    assert(streamedGraded.exists { case (ty, d, _, _, spike) =>
      ty == "view" && d == 5 && spike }) // the planted day-5 view spike
    assert(streamedGraded.count(_._5) === 1) // and nothing else flags
  }

  test("userDayCountsStream closes through the batch L28 engagement curve") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // user 1: 3 events over 2 days; users 2, 3: one day each
    val closed = Seq(
      SessEv(1L, t(0, 0), 1L, "a"), SessEv(2L, t(0, 1), 1L, "a"),
      SessEv(3L, t(1, 0), 1L, "a"),
      SessEv(4L, t(5, 0), 2L, "a"), SessEv(5L, t(6, 0), 3L, "a"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.userDayCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("userdays")
      .option("checkpointLocation", tmp("userdays-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(9L, t(40, 0), 9L, "a")) // advance the watermark
    q.processAllAvailable()
    input.addData(SessEv(10L, t(40, 1), 9L, "a")) // next batch flushes
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("userdays").where($"day_num" < 40).localCheckpoint()
    def curve(df: org.apache.spark.sql.DataFrame) =
      df.select("active_days", "n_users", "total_events")
        .as[(Long, Long, Long)].collect().toSet
    val fromStream = curve(
      graft.operators.TimeWindows.engagementCurveFromUserDays(streamed))
    val batch = curve(graft.operators.TimeWindows.engagementCurve(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(fromStream === batch)
    assert(fromStream === Set((2L, 1L, 3L), (1L, 2L, 2L)))
  }

  test("reach twins: streamed daily actives + new users close to the batch userReach report") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // day 0: u1, u2 (u1 twice); day 1: u1 returns, u3 new; day 2: u3 only
    val byDay = Seq(
      Seq(SessEv(1L, t(0, 0), 1L, "view"), SessEv(2L, t(0, 5), 1L, "view"),
        SessEv(3L, t(0, 9), 2L, "view")),
      Seq(SessEv(4L, t(1, 0), 1L, "view"), SessEv(5L, t(1, 1), 3L, "view")),
      Seq(SessEv(6L, t(2, 0), 3L, "view")))
    val flushTail = Seq(SessEv(7L, t(40, 0), 9L, "view"), SessEv(8L, t(40, 1), 9L, "view"))

    def runStream(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                  name: String): org.apache.spark.sql.DataFrame = {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
      val q = f(input.toDF()).writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation", tmp(name + "-ck")).start()
      // day-ordered batches: first-arrival == min-day for the new-user twin
      for (day <- byDay) { input.addData(day: _*); q.processAllAvailable() }
      for (ev <- flushTail) { input.addData(ev); q.processAllAvailable() }
      q.stop()
      spark.table(name).where($"day_num" < 40).localCheckpoint()
    }
    val actives = runStream(RealTime.dailyActivesStream(_), "reach_actives")
    val news = runStream(RealTime.newUsersStream(_), "reach_news")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("day_num", "n_active", "n_new", "cum_reach")
        .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = rows(graft.operators.TimeWindows.reachFromDaily(actives, news))
    val batch = rows(graft.operators.TimeWindows.userReach(
      byDay.flatten.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed === Set((0L, 2L, 2L, 2L), (1L, 2L, 1L, 3L), (2L, 1L, 0L, 3L)))
  }

  test("dailyWordsStream: streamed bitmap words close to the batch rolling-WAU curve") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // users straddle the 63-bit word boundary on purpose (62, 63, 126)
    val closed = Seq(
      SessEv(1L, t(0, 0), 1L, "view"), SessEv(2L, t(0, 1), 62L, "view"),
      SessEv(3L, t(0, 2), 63L, "view"),
      SessEv(4L, t(3, 0), 1L, "view"), SessEv(5L, t(3, 1), 126L, "view"),
      SessEv(6L, t(9, 0), 126L, "view"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyWordsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dailywords")
      .option("checkpointLocation", tmp("dailywords-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(7L, t(40, 0), 9L, "view")) // advance the watermark
    q.processAllAvailable()
    input.addData(SessEv(8L, t(40, 1), 9L, "view")) // next batch flushes
    q.processAllAvailable()
    q.stop()

    val words = spark.table("dailywords").where($"day_num" < 40).localCheckpoint()
    def curve(df: org.apache.spark.sql.DataFrame) =
      df.select("day_num", "active_users").as[(Long, Long)].collect().toMap
    val streamed = curve(graft.operators.Sketches.rollingFromWords(words))
    val batch = curve(graft.operators.Sketches.rollingActiveUsers(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    // hand check: day 0 = {1,62,63}; day 3 window covers days 0+3 -> 4
    // distinct; day 9 window covers 3..9 -> {1,126} = 2
    assert(streamed === Map(0L -> 3L, 3L -> 4L, 9L -> 2L))
  }

  test("clickViewPairsStream: stream-stream interval join equals the batch twin across batches") {
    def t(min: Int): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + min * 60000L)
    // user 7: views 0/10/25, clicks 20/40 -> click 20 pairs views {0,10},
    // click 40 pairs views {10,25}; user 8's view 5 + click 50 is outside
    // the 30-min horizon and must produce nothing (nor match user 7)
    val viewRows = Seq(
      SessEv(1L, t(0), 7L, "view"), SessEv(2L, t(10), 7L, "view"),
      SessEv(3L, t(25), 7L, "view"), SessEv(4L, t(5), 8L, "view"))
    val clickRows = Seq(
      SessEv(11L, t(20), 7L, "click"), SessEv(12L, t(40), 7L, "click"),
      SessEv(13L, t(50), 8L, "click"))

    val vIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val cIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val joined = RealTime.clickViewPairsStream(
      cIn.toDF().select("user_id", "event_id", "ts"),
      vIn.toDF().select("user_id", "event_id", "ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("cv_pairs")
      .option("checkpointLocation", tmp("cv-ck"))
      .start()
    // views first, clicks in a LATER batch: pairs must form against
    // buffered state, not just within-batch rows
    vIn.addData(viewRows.take(2): _*)
    q.processAllAvailable()
    cIn.addData(clickRows.head)
    q.processAllAvailable()
    vIn.addData(viewRows.drop(2): _*)
    cIn.addData(clickRows.tail: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cv_pairs")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.TimeWindows.clickViewPairs(
      (viewRows ++ clickRows).toDF("event_id", "ts", "user_id", "event_type"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(p => (p._2, p._3)) ===
      Set((11L, 1L), (11L, 2L), (12L, 2L), (12L, 3L)))
    // gap_us is exact integer microseconds
    assert(streamed.find(p => p._2 == 11L && p._3 == 1L).get._4 === 20L * 60000000L)
  }

  test("clickViewPairsStream left_outer: orphan clicks flush null-padded after the watermark") {
    def t(min: Int): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + min * 60000L)
    val vIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val cIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val joined = RealTime.clickViewPairsStream(
      cIn.toDF().select("user_id", "event_id", "ts"),
      vIn.toDF().select("user_id", "event_id", "ts"),
      joinType = "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("cv_outer")
      .option("checkpointLocation", tmp("cv-outer-ck"))
      .start()
    // user 7's click has an in-horizon view; user 8's click has none
    vIn.addData(SessEv(1L, t(0), 7L, "view"))
    cIn.addData(SessEv(11L, t(20), 7L, "click"), SessEv(12L, t(20), 8L, "click"))
    q.processAllAvailable()
    val early = spark.table("cv_outer").as[(Long, Long, Option[Long], Option[Long])]
      .collect()
    // matched pair emits eagerly; the orphan must NOT appear yet — no
    // watermark has proven its horizon empty
    assert(early.map(_._2).toSet === Set(11L))
    // advance event time far past the horizon on BOTH inputs (the join
    // watermark is the min), then a second batch performs the eviction
    vIn.addData(SessEv(90L, t(600), 9L, "view"))
    cIn.addData(SessEv(91L, t(600), 9L, "click"))
    q.processAllAvailable()
    vIn.addData(SessEv(92L, t(601), 9L, "view"))
    cIn.addData(SessEv(93L, t(601), 9L, "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cv_outer")
      .where($"user_id" === 8L)
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.length === 1)
    assert(rows.head._2 === 12L && rows.head._3.isEmpty && rows.head._4.isEmpty)
  }

  test("trendingUsersStream: streamed leaderboard equals the batch form once windows close") {
    def t(min: Int): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + min * 60000L)
    val closed = Seq(
      SessEv(1L, t(0), 1L, "view"), SessEv(2L, t(1), 1L, "view"),
      SessEv(3L, t(2), 2L, "view"), SessEv(4L, t(3), 3L, "view"),
      SessEv(5L, t(16), 3L, "view"), SessEv(6L, t(17), 3L, "view"))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.trendingUsersStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("trending")
      .option("checkpointLocation", tmp("trending-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(8L, t(600), 9L, "view")) // advance the watermark
    q.processAllAvailable()
    input.addData(SessEv(9L, t(601), 9L, "view")) // next batch flushes
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("trending")
      .where($"user_id" =!= 9L)
      .select("ws", "rank", "user_id", "n_events")
      .as[(java.sql.Timestamp, Int, Long, Long)].collect().toSet
    val batch = graft.operators.TimeWindows.trendingUsers(
      closed.toDF("event_id", "ts", "user_id", "event_type"))
      .select("ws", "rank", "user_id", "n_events")
      .as[(java.sql.Timestamp, Int, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(_._1).size >= 2) // both closed windows emitted
  }

  test("corrupt-record surface: PERMISSIVE+audit quarantines, FAILFAST rejects") {
    val in = tmp("stream-bad")
    writeEvents(in, Seq(
      """{"userId": 1, "productId": 3, "review": 5.0, "timestamp": 1105916400}""",
      """{"userId": oops not json"""))
    // PERMISSIVE with a corrupt-record column: bad line captured, good line parsed
    val outDir = tmp("bad-out")
    RealTime.readReviews(spark, in,
      options = Map("columnNameOfCorruptRecord" -> "_corrupt_record"),
      schema = RealTime.reviewSchemaWithCorrupt)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", tmp("ck-bad"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000)
    val rows = spark.read.parquet(outDir)
    assert(rows.count() === 2)
    assert(rows.where(col("_corrupt_record").isNotNull).count() === 1)
    assert(rows.where(col("userId") === 1L && col("_corrupt_record").isNull).count() === 1)
    // FAILFAST: the same input makes the micro-batch fail (reference
    // deserializer parity: ReviewDeserialization.java throws on bad JSON)
    val strict = RealTime.readReviews(spark, in, options = Map("mode" -> "FAILFAST"))
      .writeStream.format("noop").option("checkpointLocation", tmp("ck-strict"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.awaitTermination(60000)
    }
    // the malformed-record error surfaces wrapped in FAILED_READ_FILE
    val chain = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.toString.toLowerCase).mkString(" | ")
    assert(chain.contains("malformed") || chain.contains("failed_read_file"), chain)
  }

  test("end-to-end micro-batch: json source -> enrich -> json sink + ratings append") {
    val in = tmp("stream-in")
    val outDir = tmp("stream-out")
    val ratingsDir = tmp("ratings") + "/table"
    writeEvents(in, Seq(
      """{"userId": 1, "productId": 3, "review": 5.0, "timestamp": 1105916400}""",
      """{"userId": 42, "productId": 9, "review": 2.0, "timestamp": 1105916401}"""))

    val reviews = RealTime.readReviews(spark, in)
    val q1 = RealTime.updateRatings(reviews, ratingsDir, tmp("ck1"))
    q1.awaitTermination(60000)

    val q2 = RealTime.writeOutput(
      RealTime.enrich(RealTime.readReviews(spark, in), userRecs, topProducts),
      outDir, tmp("ck2")).start()
    q2.awaitTermination(60000)

    val appended = spark.read.parquet(ratingsDir)
    assert(appended.count() === 2)
    // batch_id is the idempotence partition key (see updateRatings)
    assert(appended.columns.toSet ===
      Set("userId", "productId", "rating", "timestamp", "batch_id"))

    val out = spark.read.json(outDir)
      .select($"userId", $"recommendedProducts")
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("101", "102"))
    assert(out(42L) === Seq("11", "12", "13")) // cold start -> global top products
  }

  test("exactly-once across kill-and-restart: a replayed batch never duplicates the sink") {
    val in = tmp("eo-in")
    val ratingsDir = tmp("eo-ratings") + "/table"
    val ck = tmp("eo-ck")
    def multiset(dir: String): Seq[(Long, Long, Double, Long)] =
      spark.read.parquet(dir)
        .select($"userId", $"productId", $"rating", $"timestamp")
        .as[(Long, Long, Double, Long)].collect().toSeq.sorted

    // half 1 arrives and commits
    writeEvents(in, Seq(
      """{"userId": 1, "productId": 3, "review": 5.0, "timestamp": 1105916400}""",
      """{"userId": 2, "productId": 4, "review": 3.0, "timestamp": 1105916401}"""))
    // the manager unregisters a terminated run asynchronously; a restart
    // on the SAME checkpoint needs the old run fully gone first
    def awaitStopped(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      q.awaitTermination(60000)
      q.stop()
      val deadline = System.currentTimeMillis() + 30000
      while (spark.streams.active.exists(_.id == q.id)
          && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(!spark.streams.active.exists(_.id == q.id))
    }

    val q1 = RealTime.updateRatings(RealTime.readReviews(spark, in), ratingsDir, ck)
    awaitStopped(q1)
    assert(multiset(ratingsDir).size === 2)

    // simulate the worst-case crash: the sink wrote batch N but the engine
    // died BEFORE recording the checkpoint commit — delete the newest
    // commit marker, so the restart must replay that batch against a sink
    // that already contains its rows
    val commits = new java.io.File(ck, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty)
    val latest = commits.maxBy(_.getName.toLong)
    // the local checksum FS keeps a .N.crc sidecar; a stale one would
    // block the replay's rewrite of the marker
    new java.io.File(latest.getParentFile, "." + latest.getName + ".crc").delete()
    assert(latest.delete())

    // half 2 arrives while the pipeline is down
    Files.write(Paths.get(in, "part-1.json"),
      """{"userId": 3, "productId": 5, "review": 4.0, "timestamp": 1105916402}"""
        .getBytes("UTF-8"))

    // restart from the checkpoint: replays the uncommitted batch, then
    // processes the new file
    val q2 = RealTime.updateRatings(RealTime.readReviews(spark, in), ratingsDir, ck)
    awaitStopped(q2)

    // one-shot reference run over the same total input, fresh everything
    val oneShotDir = tmp("eo-oneshot") + "/table"
    val q3 = RealTime.updateRatings(
      RealTime.readReviews(spark, in), oneShotDir, tmp("eo-ck-oneshot"))
    awaitStopped(q3)

    assert(multiset(ratingsDir) === multiset(oneShotDir)) // no dupes, no loss
    assert(multiset(ratingsDir).size === 3)
  }

  test("rate-limited replay emits the static rows in order") {
    val static = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "v")
    val stream = graft.streaming.Replay.replayStream(spark, static, "k", rowsPerSecond = 50)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("replay_out").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("replay_out").count() < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
      }
    } finally q.stop()
    val rows = spark.table("replay_out").select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(rows.size >= 5)
    assert(rows(0L) === "a" && rows(4L) === "e")
  }

  test("streaming session windows merge within the gap and split beyond it") {
    val in = tmp("stream-sess")
    writeEvents(in, Seq(
      """{"userId": 1, "productId": 1, "review": 1.0, "timestamp": 0}""",
      """{"userId": 1, "productId": 2, "review": 1.0, "timestamp": 100}""",  // same session (gap 5 min)
      """{"userId": 1, "productId": 3, "review": 1.0, "timestamp": 1000}""") // > 5 min later -> new session
    )
    val agg = RealTime.readReviews(spark, in)
      .withColumn("ts", timestamp_seconds($"timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"userId")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()
    val ns = spark.table("sess_out").select("n").as[Long].collect().sorted.toSeq
    assert(ns === Seq(1L, 2L))
  }

  test("streaming windowed aggregation with watermark (tumbling twin)") {
    val in = tmp("stream-win")
    writeEvents(in, Seq(
      """{"userId": 1, "productId": 3, "review": 5.0, "timestamp": 0}""",
      """{"userId": 2, "productId": 4, "review": 3.0, "timestamp": 60}""",
      """{"userId": 3, "productId": 5, "review": 4.0, "timestamp": 1000}"""))
    val agg = RealTime.readReviews(spark, in)
      .withColumn("ts", timestamp_seconds($"timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out").select("cnt").as[Long].collect()
    // ts 0s and 60s share the first 15-min window; 1000s falls in the second
    assert(rows.sorted.toSeq === Seq(1L, 2L))
  }

  test("streaming near-dup gate flags arriving docs against the static corpus index") {
    val base = "spark catalyst optimizer pushes filters below joins and prunes columns " +
      "for parquet scans while tungsten generates compact bytecode for each stage"
    val corpus = Seq((10L, base),
      (11L, "standing corpus document about watermarks state stores and checkpoints " +
        "sharing nothing textual with the incoming batch documents whatsoever"))
      .toDF("doc_id", "text")
    val in = tmp("neardup-in")
    val flags = tmp("neardup-flags")
    val ck = tmp("neardup-ck")
    // doc 20 = 1-word edit of corpus doc 10 (planted); doc 21 = clean
    Files.write(Paths.get(in, "batch-0.json"), Seq(
      s"""{"doc_id": 20, "text": "${base.replace("compact", "efficient")}"}""",
      """{"doc_id": 21, "text": "totally novel content with its own vocabulary about graph rounds and convergence fingerprints"}""")
      .mkString("\n").getBytes("UTF-8"))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(docsSchema).json(in)
    val q = RealTime.flagNearDups(stream, corpus, flags, ck)
    q.awaitTermination()
    val out = spark.read.parquet(flags)
      .select("doc_id", "dup_of_min").as[(Long, Long)].collect().toMap
    assert(out === Map(20L -> 10L)) // planted near-dup flagged, clean doc admitted
  }

  test("streaming CMS: merged per-batch sketches equal the one-shot batch sketch") {
    val in = tmp("cms-in")
    val sk = tmp("cms-sketch")
    val ck = tmp("cms-ck")
    // two files -> (with maxFilesPerTrigger) two micro-batches
    Files.write(Paths.get(in, "a.json"),
      (1 to 40).map(i => s"""{"key": "u${i % 7}"}""").mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(in, "b.json"),
      (1 to 25).map(i => s"""{"key": "u${i % 5}"}""").mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
    RealTime.cmsSketchStream(stream, sk, ck, d = 2, w = 64).awaitTermination()
    assert(spark.read.parquet(sk).count() >= 2, "one sketch row per micro-batch")
    val merged = RealTime.mergedCmsSketch(spark, sk).as[Seq[Long]].head()
    val batchTwin = spark.read.schema(schema).json(in)
      .select(graft.functions.TextAnalysis.md5Prefix32(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("cms:"),
          org.apache.spark.sql.functions.col("key"))).as("h"))
      .agg(org.apache.spark.sql.graft.shim.column(
        org.apache.spark.sql.graft.CountMinSketchAgg(
          org.apache.spark.sql.graft.shim.expression(
            org.apache.spark.sql.functions.col("h")), 2, 64).toAggregateExpression()).as("sk"))
      .as[Seq[Long]].head()
    assert(merged === batchTwin)
    assert(merged.sum === 65L * 2, "every row lands in one bucket per sketch row")
  }

  test("streaming quote gate admits only docs that quote no probe") {
    // raw probe with capitalization + irregular spacing: the gate must
    // normalize BOTH sides before matching
    val probes = Seq("Never Gonna Give you up  never gonna LET you down")
      .toDF("probe")
    val in = tmp("quote-in")
    val outDir = tmp("quote-out")
    val ck = tmp("quote-ck")
    Files.write(Paths.get(in, "batch-0.json"), Seq(
      // quoting doc: probe appears verbatim mid-text (case/whitespace vary)
      """{"doc_id": 1, "text": "intro words Never Gonna  Give you up never gonna let YOU down outro"}""",
      """{"doc_id": 2, "text": "entirely original content free of any memorized refrain"}""")
      .mkString("\n").getBytes("UTF-8"))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(docsSchema).json(in)
    val q = RealTime.dropQuotingDocs(stream, probes)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val admitted = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSeq
    assert(admitted === Seq(2L)) // the quoting doc was dropped at ingestion
  }

  test("streaming repetition gate drops the looping doc, admits prose and shorts") {
    val in = tmp("rep-in")
    val outDir = tmp("rep-out")
    val ck = tmp("rep-ck")
    Files.write(Paths.get(in, "batch-0.json"), Seq(
      // "a b c" ×3 → 3/7 grams ≈ 428571 ppm < 500000 default... make it loop harder:
      """{"doc_id": 1, "text": "spam spam spam spam spam spam spam spam"}""",
      """{"doc_id": 2, "text": "each word here appears exactly once in order"}""",
      """{"doc_id": 3, "text": "too short"}""")
      .mkString("\n").getBytes("UTF-8"))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = RealTime.repetitionGateStream(
      spark.readStream.schema(docsSchema).json(in), outDir, ck)
    q.awaitTermination()
    val admitted = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSeq.sorted
    // doc 1: 6 grams all "spam spam spam" → 1e6 ppm, dropped; doc 3 has
    // no 3-gram and must pass the gate untouched
    assert(admitted === Seq(2L, 3L))
    // the gate's verdicts equal the batch operator's on the same rows
    val batch = spark.read.schema(docsSchema).json(in)
    val batchFlagged = graft.operators.Corpus.repetitionScore(batch)
      .where($"rep_ppm" > 500000L).select("doc_id").as[Long].collect().toSeq
    assert(batchFlagged === Seq(1L))
  }

  test("streamed daily counts close through volumeTrendFromDaily to the batch trend") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // view: 1,3,5 events over days 0-2 (slope exactly 2)
    val closed =
      Seq(SessEv(1L, t(0, 1), 1L, "view")) ++
      (1 to 3).map(i => SessEv(10 + i.toLong, t(1, i), 1L, "view")) ++
      (1 to 5).map(i => SessEv(20 + i.toLong, t(2, i), 1L, "view"))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("trend_daily")
      .option("checkpointLocation", tmp("trend-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(90L, t(40, 0), 9L, "view"))
    q.processAllAvailable()
    input.addData(SessEv(91L, t(40, 1), 9L, "view"))
    q.processAllAvailable()
    q.stop()

    val streamedDaily = spark.table("trend_daily").where($"day_num" < 40)
    val streamed = graft.operators.TimeWindows.volumeTrendFromDaily(streamedDaily)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val batch = graft.operators.TimeWindows.volumeTrend(
      closed.toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(streamed.keySet === batch.keySet)
    for ((k, s) <- streamed; b = batch(k)) {
      assert(s.getAs[Long]("slope_micro") === b.getAs[Long]("slope_micro"))
      assert(s.getAs[Double]("slope") === b.getAs[Double]("slope"))
      assert(s.getAs[Double]("r2") === b.getAs[Double]("r2"))
    }
    assert(streamed("view").getAs[Double]("slope") === 2.0)
  }

  test("streamed daily counts close through autocorrelationFromDaily to the batch r") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // view: counts 1..5 over days 0-4 -> lag-1 r exactly 1.0
    val closed = (0 until 5).flatMap(d =>
      (0 to d).map(i => SessEv((d * 100 + i).toLong, t(d, i), 1L, "view")))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("acf_daily")
      .option("checkpointLocation", tmp("acf-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(90L, t(40, 0), 9L, "view"))
    q.processAllAvailable()
    input.addData(SessEv(91L, t(40, 1), 9L, "view"))
    q.processAllAvailable()
    q.stop()

    val streamedDaily = spark.table("acf_daily").where($"day_num" < 40)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("lag_d")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("num"), r.getAs[Long]("den_x"),
          r.getAs[Long]("den_y"), r.getAs[Double]("r"))).toMap
    val streamed = key(graft.operators.TimeWindows.autocorrelationFromDaily(
      streamedDaily, Seq(1, 7)))
    val batch = key(graft.operators.TimeWindows.autocorrelation(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed(("view", 1))._5 === 1.0)
  }

  test("streamed daily counts close through dpFromDaily to the batch release") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    val closed = (0 until 4).flatMap(d =>
      (0 to d + 1).map(i => SessEv((d * 100 + i).toLong, t(d, i), 1L, "view")))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dp_daily")
      .option("checkpointLocation", tmp("dp-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(90L, t(40, 0), 9L, "view")) // advances the watermark
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_num")) ->
        (r.getAs[Long]("true_cnt"), r.getAs[Long]("noise"),
          r.getAs[Long]("released"))).toMap
    val streamed = key(graft.operators.Relational.dpFromDaily(
      spark.table("dp_daily").where($"day_num" < 40)))
    val batch = key(graft.operators.Relational.dpNoisedCounts(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed.keySet.map(_._2) === Set(0L, 1L, 2L, 3L))
  }

  test("streamed daily counts close through cusumFromDaily to the batch chart") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // counts 1,1,10 over days 0-2: day 2 flags up (cusum 18 > total 12)
    val closed = Seq(SessEv(1L, t(0, 0), 1L, "view"), SessEv(2L, t(1, 0), 1L, "view")) ++
      (0 until 10).map(i => SessEv(10L + i, t(2, i), 1L, "view"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_daily")
      .option("checkpointLocation", tmp("cusum-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(90L, t(40, 0), 9L, "view"))
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_num")) ->
        (r.getAs[Long]("cusum_pos"), r.getAs[Long]("cusum_neg"),
          r.getAs[Boolean]("flag_up"), r.getAs[Boolean]("flag_down"))).toMap
    val streamed = key(graft.operators.TimeWindows.cusumFromDaily(
      spark.table("cusum_daily").where($"day_num" < 40)))
    val batch = key(graft.operators.TimeWindows.cusumChangePoints(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed(("view", 2L))._3 === true)
  }

  test("streamed daily counts close through forecastSkillFromDaily to the batch report") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // counts 3,1,1,1,1,1,1,2,5 over days 0-8: scoring days 7 and 8 give
    // naive |2-1|+|5-2| = 4 and seasonal |2-3|+|5-1| = 5 -> skill 1.25
    val perDay = Seq(3, 1, 1, 1, 1, 1, 1, 2, 5)
    val closed = perDay.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => SessEv((d * 100 + i).toLong, t(d, i), 1L, "view")) }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("skill_daily")
      .option("checkpointLocation", tmp("skill-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(9000L, t(40, 0), 9L, "view"))
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("naive_abs_err"),
          r.getAs[Long]("seasonal_abs_err"), r.getAs[Double]("skill"))).toMap
    val streamed = key(graft.operators.TimeWindows.forecastSkillFromDaily(
      spark.table("skill_daily").where($"day_num" < 40)))
    val batch = key(graft.operators.TimeWindows.forecastSkill(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed("view") === ((2L, 4L, 5L, 1.25)))
  }

  test("streamed daily counts close through weekdaySeasonalityFromDaily") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // days 0,1,7 (weekdays 0,1,0): weekday 0 has 3 events over 2 days,
    // weekday 1 has 1 event over 1 day; type mean = 4 events / 3 days
    val closed = Seq(
      SessEv(1L, t(0, 1), 1L, "view"), SessEv(2L, t(0, 2), 2L, "view"),
      SessEv(3L, t(1, 1), 1L, "view"), SessEv(4L, t(7, 1), 1L, "view"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("season_daily")
      .option("checkpointLocation", tmp("season-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(9000L, t(40, 0), 9L, "view")) // close the watermark
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("weekday")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_days"),
          r.getAs[Long]("index_ppm"))).toMap
    val streamed = key(graft.operators.TimeWindows.weekdaySeasonalityFromDaily(
      spark.table("season_daily").where($"day_num" < 40)))
    val batch = key(graft.operators.TimeWindows.weekdaySeasonality(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed(("view", 0L)) === ((3L, 2L, 1125000L))) // (3/2)/(4/3)
    assert(streamed(("view", 1L)) === ((1L, 1L, 750000L)))  // (1/1)/(4/3)
  }

  test("streamed daily counts close through ewmaFromDaily to the batch baseline") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // counts 4, 2, 3 over days 0-2: s = 4 → 2+2 = 4 → 3+2 = 5
    val perDay = Seq(4, 2, 3)
    val closed = perDay.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => SessEv((d * 100 + i).toLong, t(d, i), 1L, "view")) }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_daily")
      .option("checkpointLocation", tmp("ewma-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(SessEv(9000L, t(40, 0), 9L, "view")) // close the watermark
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("last_day"),
          r.getAs[Double]("ewma"))).toMap
    val streamed = key(graft.operators.TimeWindows.ewmaFromDaily(
      spark.table("ewma_daily").where($"day_num" < 40)))
    val batch = key(graft.operators.TimeWindows.ewmaDailyVolume(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed("view") === ((3L, 2L, 5.0)))
  }

  test("streamed user-type extremes close through sequentialPairsFromExtremes") {
    def at(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val closed = Seq(
      SessEv(1L, at(1), 1L, "view"), SessEv(2L, at(2), 1L, "click"),
      SessEv(3L, at(3), 1L, "view"),
      SessEv(4L, at(7), 3L, "purchase"), SessEv(5L, at(8), 3L, "view"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.userTypeExtremes(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("seq_extremes")
      .start()
    // split across micro-batches: min/max must fold the second batch in
    input.addData(closed.take(2): _*)
    q.processAllAvailable()
    input.addData(closed.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getAs[String]("type_a"), x.getAs[String]("type_b")) ->
        (x.getAs[Long]("n_users_both"), x.getAs[Long]("n_users_ab"),
          x.getAs[Long]("direction_ppm"))).toMap
    val streamed = key(graft.operators.TimeWindows.sequentialPairsFromExtremes(
      spark.table("seq_extremes")))
    val batch = key(graft.operators.TimeWindows.sequentialPairs(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    // user 1's interleaving spans the batch split: view(1),click(2) | view(3)
    assert(streamed(("click", "view")) === ((1L, 1L, 1000000L)))
  }

  test("streaming checksum equals the batch table checksum on a closed input") {
    val rows = Seq((1L, "x"), (2L, "y"), (3L, null.asInstanceOf[String]), (4L, "z"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = RealTime.checksumStream(
        input.toDF().toDF("k", "s"), Seq("k", "s"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cksum_stream")
      .option("checkpointLocation", tmp("cksum-ck"))
      .start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cksum_stream")
      .select("n_rows", "checksum").as[(Long, Long)].collect().head
    val batch = graft.operators.Relational.tableChecksum(
      Seq(("t", rows.toDF("k", "s"), Seq("k", "s")))).collect().head
    assert(streamed._1 === batch.getAs[Long]("n_rows"))
    assert(streamed._2 === batch.getAs[Long]("checksum"))
  }

  test("streaming near-dup band join equals batch minhashPairs on a closed input") {
    val base = "spark catalyst optimizer pushes filters below joins and prunes columns " +
      "for parquet scans while tungsten generates compact bytecode for each stage"
    val nearDup = base.replace("compact", "efficient")
    val distinctDoc = "entirely different words about streaming watermarks and state " +
      "stores that share nothing with the other documents in this corpus at all whatsoever"
    def t(min: Int) = new java.sql.Timestamp(min * 60000L)
    // docs arrive minutes apart, inside the join horizon
    val docs = Seq(DocEv(0L, t(1), base), DocEv(1L, t(5), nearDup),
      DocEv(2L, t(9), distinctDoc), DocEv(3L, t(13), base))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocEv](spark)
    val q = RealTime.nearDupPairsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_pairs")
      .option("checkpointLocation", tmp("neardup-pairs-ck"))
      .start()
    input.addData(docs: _*)
    q.processAllAvailable()
    // watermark flush so every in-horizon pair is emitted
    input.addData(DocEv(9L, t(2000), distinctDoc))
    q.processAllAvailable()
    input.addData(DocEv(10L, t(2001), distinctDoc))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("neardup_pairs")
      .select("a_id", "b_id", "est_jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.Dedup.minhashPairs(
      docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // the flush sentinels (9, 10) pair with each other — exclude them
    assert(streamed.filterNot(p => p._1 >= 9L) === batch)
    assert(batch.exists(p => (p._1, p._2) == (0L, 3L) && p._3 == 1.0)) // exact dup

    // the custom-state PRODUCTION gate (flatMapGroupsWithState on the band
    // bucket) emits the same pair set on the same closed input
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocEv](spark)
    val q2 = streaming.Stateful.nearDupPairsStatefulStream(spark, input2.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_pairs_stateful")
      .option("checkpointLocation", tmp("neardup-stateful-ck"))
      .start()
    input2.addData(docs: _*)
    q2.processAllAvailable()
    input2.addData(DocEv(9L, t(2000), distinctDoc))
    q2.processAllAvailable()
    input2.addData(DocEv(10L, t(2001), distinctDoc))
    q2.processAllAvailable()
    q2.stop()
    val stateful = spark.table("neardup_pairs_stateful")
      .select("a_id", "b_id", "est_jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(stateful.filterNot(p => p._1 >= 9L) === batch)
  }

  test("streamed daily counts close through kendallFromDaily to the batch counts") {
    def t(day: Int, min: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + min) * 60000L)
    // view grows 1..4, click shrinks 4..1 over days 0-3 -> all discordant
    val closed = (0 until 4).flatMap { d =>
      (0 to d).map(i => SessEv((d * 100 + i).toLong, t(d, i), 1L, "view")) ++
        (0 until (4 - d)).map(i => SessEv((d * 100 + 50 + i).toLong, t(d, 30 + i), 2L, "click"))
    }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEv](spark)
    val q = RealTime.dailyCountsStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("kendall_daily")
      .option("checkpointLocation", tmp("kendall-ck"))
      .start()
    input.addData(closed: _*)
    q.processAllAvailable()
    // late watermark-closing rows (day 40) flush the open day-3 windows
    input.addData(SessEv(990L, t(40, 0), 9L, "view"))
    q.processAllAvailable()
    input.addData(SessEv(991L, t(40, 1), 9L, "view"))
    q.processAllAvailable()
    q.stop()

    val streamedDaily = spark.table("kendall_daily").where($"day_num" < 40)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_day_pairs"), r.getAs[Long]("concordant"),
          r.getAs[Long]("discordant"), r.getAs[Long]("tie_a"),
          r.getAs[Long]("tie_b"))).toMap
    val streamed = key(graft.operators.TimeWindows.kendallFromDaily(streamedDaily))
    val batch = key(graft.operators.TimeWindows.kendallConcordance(
      closed.toDF("event_id", "ts", "user_id", "event_type")))
    assert(streamed === batch)
    assert(streamed(("click", "view")) === ((6L, 0L, 6L, 0L, 0L)))
  }

  test("kafka binding contract: pinned options + value projections") {
    import spark.implicits._
    // the exact option set a real cluster flips to, per
    // RealTimeRecommendations.java:40-48 (consumer) and :58-68 (producer).
    // The connector jar is env-blocked, so the CONTRACT is what's pinned:
    // any drift here silently breaks the documented one-flip migration.
    val src = RealTime.kafkaSourceOptions("broker:9092")
    assert(src === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "Reviews",
      "startingOffsets" -> "earliest"))
    val snk = RealTime.kafkaSinkOptions("broker:9092")
    assert(snk === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "topic" -> "Output"))

    // source-side value projection: decodes the exact JSON payload the
    // reference's generator produces (kafka_stream_generator.py:28-31)
    // from a Kafka-shaped (value: binary) relation
    val wire = Seq(
      """{"userId": 7, "productId": 3, "review": 4.5, "timestamp": 1105916400}""")
      .toDF("s").select(col("s").cast("binary").as("value"))
    val decoded = RealTime.decodeKafkaValue(wire).collect().head
    assert((decoded.getLong(0), decoded.getLong(1), decoded.getDouble(2),
      decoded.getLong(3)) === ((7L, 3L, 4.5, 1105916400L)))

    // sink-side: writeOutput's payload column is `value` with the
    // KafkaOutput JSON shape {userId, recommendedProducts}, and the kafka
    // form takes options + empty path without constructing a file sink
    val enriched = Seq((7L, Seq("3:4.5", "9:2.0")))
      .toDF("userId", "recommendedProducts")
    val streamEnriched = spark.readStream.format("rate").load()
      .select(col("value").as("userId"),
        array(lit("3:4.5")).as("recommendedProducts"))
    val w = RealTime.writeOutput(streamEnriched, outDir = "",
      checkpointDir = "/tmp/unused-ck", format = "kafka", options = snk)
    assert(w != null) // construction-only: starting needs the connector jar
    val payload = enriched
      .select(to_json(struct(col("userId"), col("recommendedProducts")))
        .as("value")).as[String].collect().head
    assert(payload ===
      """{"userId":7,"recommendedProducts":["3:4.5","9:2.0"]}""")
  }
}
