package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RealTime, Stateful}

class StatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mapGroupsWithState keeps running per-user stats across micro-batches") {
    val in = Files.createTempDirectory("stateful-in").toString
    Files.write(java.nio.file.Paths.get(in, "b1.json"),
      Seq(
        """{"userId": 1, "productId": 3, "review": 4.0, "timestamp": 10}""",
        """{"userId": 1, "productId": 4, "review": 2.0, "timestamp": 20}""",
        """{"userId": 2, "productId": 5, "review": 5.0, "timestamp": 30}""")
        .mkString("\n").getBytes("UTF-8"))

    val reviews = RealTime.readReviews(spark, in).as[Stateful.Review]
    val q = Stateful.runningUserStats(spark, reviews)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_stats")
      .option("checkpointLocation", Files.createTempDirectory("stateful-ck").toString)
      .start()
    q.processAllAvailable()

    // second batch arrives: user 1 reviews again — state must accumulate
    Files.write(java.nio.file.Paths.get(in, "b2.json"),
      Seq("""{"userId": 1, "productId": 9, "review": 3.0, "timestamp": 40}""")
        .mkString("\n").getBytes("UTF-8"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("user_stats").as[Stateful.UserStats].collect()
    val u1 = rows.filter(_.userId == 1).maxBy(_.nReviews)
    assert(u1.nReviews === 3)
    assert(u1.meanRating === 3.0) // (4+2+3)/3
    assert(u1.lastTimestamp === 40)
    val u2 = rows.filter(_.userId == 2).maxBy(_.nReviews)
    assert(u2.nReviews === 1 && u2.meanRating === 5.0)
  }

  test("streaming transitions equal the batch window's adjacency multiset") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      Stateful.TransitionEvent](spark)
    val q = Stateful.transitions(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("transitions_out")
      .option("checkpointLocation", Files.createTempDirectory("trans-ck").toString)
      .start()
    // batch 1 arrives OUT of time order; ties at t=3 break by eventId
    input.addData(
      Stateful.TransitionEvent(1L, 2L, "click", 2L),
      Stateful.TransitionEvent(1L, 1L, "view", 1L),
      Stateful.TransitionEvent(1L, 4L, "purchase", 3L),
      Stateful.TransitionEvent(1L, 3L, "view", 3L))
    q.processAllAvailable()
    // batch 2: cross-batch adjacency purchase -> view via carried state
    input.addData(Stateful.TransitionEvent(1L, 5L, "view", 9L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("transitions_out").as[Stateful.Transition].collect()
      .map(t => (t.fromType, t.toType)).groupBy(identity).view.mapValues(_.length).toMap
    // the (ts, event_id) order folds (3,"view") before (4,"purchase") at
    // t=3 — the batch window twin's adjacency multiset exactly
    assert(streamed === Map(
      ("view", "click") -> 1, ("click", "view") -> 1,
      ("view", "purchase") -> 1, ("purchase", "view") -> 1))
  }

  test("streamed inter-arrival gaps close through the batch histogram stage") {
    import org.apache.spark.sql.functions.col
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      Stateful.GapEvent](spark)
    val q = Stateful.interArrivalGaps(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("gaps_out")
      .option("checkpointLocation", Files.createTempDirectory("gaps-ck").toString)
      .start()
    // same shape the batch fixture uses: gaps 1us, 7us, 8us for one
    // user, delivered out of order and across two micro-batches
    input.addData(
      Stateful.GapEvent(1L, 2L, "a", 1L),
      Stateful.GapEvent(1L, 1L, "a", 0L),
      Stateful.GapEvent(1L, 3L, "a", 8L))
    q.processAllAvailable()
    input.addData(Stateful.GapEvent(1L, 4L, "b", 16L)) // cross-batch gap
    q.processAllAvailable()
    q.stop()
    val streamed = graft.operators.Relational.histogramFromGaps(
      spark.table("gaps_out")
        .select(col("eventType").as("event_type"), col("gapUs").as("gap_us")))
      .collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("bucket")) ->
        (x.getAs[Long]("lo_us"), x.getAs[Long]("hi_us"), x.getAs[Long]("n"))).toMap
    // batch twin on the identical closed input
    def us(micro: Long): java.sql.Timestamp = {
      val ts = new java.sql.Timestamp(micro / 1000)
      ts.setNanos((micro % 1000000L).toInt * 1000); ts
    }
    import spark.implicits._
    val batch = graft.operators.Relational.latencyHistogram(Seq(
      (1L, us(0L), 1L, "a", 1.0, ""), (2L, us(1L), 1L, "a", 1.0, ""),
      (3L, us(8L), 1L, "a", 1.0, ""), (4L, us(16L), 1L, "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("bucket")) ->
        (x.getAs[Long]("lo_us"), x.getAs[Long]("hi_us"), x.getAs[Long]("n"))).toMap
    assert(streamed === batch)
    assert(streamed(("a", 4L))._3 === 1L) // the cross-batch 8us gap
  }

  test("streaming funnel advances only on in-order stages, across micro-batches") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      Stateful.FunnelEvent](spark)
    val q = Stateful.funnelAdvances(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_adv")
      .option("checkpointLocation", Files.createTempDirectory("funnel-ck").toString)
      .start()
    // batch 1, deliberately out of time order WITHIN the batch: user 1's
    // view(t=1) then click(t=2) must both fire despite arrival order;
    // user 2's purchase arrives before any view → no advance at all
    input.addData(
      Stateful.FunnelEvent(1L, "click", 2L), Stateful.FunnelEvent(1L, "view", 1L),
      Stateful.FunnelEvent(2L, "purchase", 1L))
    q.processAllAvailable()
    // batch 2: user 1 purchases (stage 3 via carried state); user 2 views
    // (stage 1); a repeated view for user 1 must NOT re-advance
    input.addData(
      Stateful.FunnelEvent(1L, "purchase", 3L), Stateful.FunnelEvent(1L, "view", 4L),
      Stateful.FunnelEvent(2L, "view", 2L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_adv").as[Stateful.FunnelAdvance].collect()
      .map(a => (a.userId, a.stage, a.stageName, a.timestamp)).toSet
    assert(rows === Set(
      (1L, 1, "view", 1L), (1L, 2, "click", 2L), (1L, 3, "purchase", 3L),
      (2L, 1, "view", 2L)))
  }

  test("funnel TTL: stale state evicts with a flush, a later event restarts at stage 0") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      Stateful.FunnelEvent](spark)
    val out = Stateful.funnelAdvancesWithTTL(spark, input.toDF(),
      watermarkDelay = "0 seconds", ttlMs = 60000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_ttl")
      .option("checkpointLocation", Files.createTempDirectory("funnel-ttl-ck").toString)
      .start()

    // user 1 reaches stage 2 by t=15s, then goes idle
    input.addData(
      Stateful.FunnelEvent(1L, "view", 10000L), Stateful.FunnelEvent(1L, "click", 15000L))
    q.processAllAvailable() // watermark -> 15s
    input.addData(Stateful.FunnelEvent(2L, "view", 120000L)) // watermark -> 120s > 15s+TTL
    q.processAllAvailable()
    input.addData(Stateful.FunnelEvent(2L, "click", 130000L)) // next batch fires the timeout
    q.processAllAvailable()
    // post-eviction: user 1 must restart at stage 0 — a view advances to
    // stage 1 again, and the earlier click progress is gone
    input.addData(Stateful.FunnelEvent(1L, "view", 140000L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_ttl").as[Stateful.FunnelAdvanceEvent].collect()
    val evicted = rows.filter(_.evicted)
    assert(evicted.map(e => (e.userId, e.stage, e.stageName, e.timestamp)).toSeq ===
      Seq((1L, 2, "click", 15000L)),
      s"user 1 idle past its TTL must flush once at its last stage; got ${rows.toSeq}")
    // user 1's advances: stage 1+2 pre-eviction, stage 1 AGAIN after restart
    assert(rows.filter(r => r.userId == 1L && !r.evicted)
      .map(r => (r.stage, r.timestamp)).sortBy(_._2).toSeq ===
      Seq((1, 10000L), (2, 15000L), (1, 140000L)))
    // user 2 stayed active — never evicted, advanced normally
    assert(!rows.exists(r => r.userId == 2L && r.evicted))
    assert(rows.filter(r => r.userId == 2L).map(_.stage).sorted.toSeq === Seq(1, 2))
  }

  test("event-time TTL evicts an idle user's state once the watermark passes it") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Stateful.Review](
      spark)
    val out = Stateful.statsWithTTL(spark, input.toDF(),
      watermarkDelay = "0 seconds", ttlMs = 60000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ttl_stats")
      .option("checkpointLocation", Files.createTempDirectory("ttl-ck").toString)
      .start()

    input.addData(Stateful.Review(1, 3, 4.0, 10000L)) // user 1 @ t=10s
    q.processAllAvailable()                           // watermark -> 10s
    input.addData(Stateful.Review(2, 5, 5.0, 120000L)) // user 2 @ t=120s
    q.processAllAvailable()                            // watermark -> 120s > 10s+TTL
    input.addData(Stateful.Review(2, 6, 4.0, 130000L)) // next batch fires the timeout
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ttl_stats").as[Stateful.UserStatsEvent].collect()
    val evicted = rows.filter(_.evicted)
    assert(evicted.map(_.userId).toSet === Set(1L),
      s"user 1 idle past its TTL must be evicted exactly once; got ${rows.toSeq}")
    assert(evicted.head.nReviews === 1 && evicted.head.meanRating === 4.0)
    // user 2 stayed active — never evicted
    assert(!rows.exists(r => r.userId == 2 && r.evicted))
  }

  test("streaming EWMA folds closed days in order and matches the batch recurrence") {
    def ms(day: Int, min: Int): Long = (day.toLong * 1440 + min) * 60000L
    // view: counts 3,1,2 over days 0-2; click: 2,5 over days 0,3 (a gap —
    // the recurrence folds observed days only, like the batch array form).
    // Minutes start at 1: an epoch-0 event ties the initial watermark and
    // is dropped as late, which is correct behavior but not this fixture.
    val closed =
      (1 to 3).map(i => Stateful.VolumeEvent("view", ms(0, i))) ++
      Seq(Stateful.VolumeEvent("view", ms(1, 1))) ++
      (1 to 2).map(i => Stateful.VolumeEvent("view", ms(2, i))) ++
      (1 to 2).map(i => Stateful.VolumeEvent("click", ms(0, 10 + i))) ++
      (1 to 5).map(i => Stateful.VolumeEvent("click", ms(3, i)))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      Stateful.VolumeEvent](spark)
    val q = Stateful.ewmaVolumeStream(spark, input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_stream")
      .option("checkpointLocation", Files.createTempDirectory("ewma-ck").toString)
      .start()
    // all closed days in one batch (later batches would be late behind
    // the advanced watermark), then a far-future sentinel advances the
    // watermark past every day; one more batch fires the pending timeouts
    input.addData(closed: _*)
    q.processAllAvailable()
    input.addData(Stateful.VolumeEvent("zz", ms(40, 0)))
    q.processAllAvailable()
    input.addData(Stateful.VolumeEvent("zz", ms(40, 1)))
    q.processAllAvailable()
    q.stop()

    // last snapshot per type = the closed report; all days must be folded
    val last = spark.table("ewma_stream").as[Stateful.EwmaSnapshot].collect()
      .groupBy(_.eventType).map { case (t, snaps) =>
        t -> snaps.maxBy(s => (s.nDays, s.lastDay))
      }
    assert(last("view").openDayCount === 0 && last("click").openDayCount === 0)

    // batch twin over the same closed input (ts at micros precision)
    val batchEvents = closed.map(e =>
      (e.eventType, new java.sql.Timestamp(e.timestamp))).toDF("event_type", "ts")
    val batch = graft.operators.TimeWindows.ewmaDailyVolume(batchEvents)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("last_day"), r.getAs[Double]("ewma"))).toMap
    for (t <- Seq("view", "click")) {
      assert(last(t).nDays === batch(t)._1, s"$t n_days")
      assert(last(t).lastDay === batch(t)._2, s"$t last_day")
      assert(last(t).ewma === batch(t)._3, s"$t ewma must match bit-for-bit")
    }
    // hand-check view: 3 → 1 + 3/2 = 2.5 → 2 + 2.5/2 = 3.25
    assert(last("view").ewma === 3.25)
  }

  test("scdIntervalsStream: out-of-order CDC folds to the batch closed intervals") {
    // offset from epoch 0: the INITIAL watermark is 0 ms, and rows at-or-
    // under the watermark are dropped as late — an epoch-0 event would
    // silently vanish before the first fold
    def ts(min: Int): java.sql.Timestamp = new java.sql.Timestamp((60 + min) * 60000L)
    def us(min: Int): Long = (60L + min) * 60000000L
    // user 1: a a b a (t0,t1,t2,t3) -> closed a[t0,t2) v1, b[t2,t3) v2;
    // user 2: one event -> open only, nothing emitted
    // tuples are (event_id, user_id, ts, event_type)
    val rows = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "a"),
      (3L, 1L, ts(2), "b"), (4L, 1L, ts(3), "a"),
      (5L, 2L, ts(0), "x"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, Long, java.sql.Timestamp, String)](spark)
    val q = Stateful.scdIntervalsStream(spark,
        input.toDF().toDF("event_id", "user_id", "ts", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("scd_stream")
      .option("checkpointLocation", Files.createTempDirectory("scd-ck").toString)
      .start()
    // arrivals OUT of time order: the buffer must reorder before folding
    input.addData((3L, 1L, ts(2), "b"), (1L, 1L, ts(0), "a"), (5L, 2L, ts(0), "x"))
    q.processAllAvailable()
    input.addData((2L, 1L, ts(1), "a"), (4L, 1L, ts(3), "a"))
    q.processAllAvailable()
    // sentinel advances the watermark past every real event; one more
    // batch fires the pending event-time timeouts
    input.addData((98L, 99L, ts(120), "zz"))
    q.processAllAvailable()
    input.addData((99L, 99L, ts(121), "zz"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("scd_stream").as[Stateful.ScdClosed].collect()
      .filter(_.userId < 99L)
      .map(c => (c.userId, c.version, c.attrValue, c.validFromUs, c.validToUs))
      .toSet
    assert(streamed === Set(
      (1L, 1L, "a", us(0), us(2)),
      (1L, 2L, "b", us(2), us(3))))
    // batch twin over the same closed input: streamed rows = the
    // non-current intervals exactly
    val batch = graft.operators.TimeWindows.scdIntervals(
        rows.map { case (e, u, t, a) => (e, t, u, a) }
          .toDF("event_id", "ts", "user_id", "event_type"))
      .where(!org.apache.spark.sql.functions.col("is_current"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("attr_value"), r.getAs[Long]("valid_from_us"),
        r.getAs[Long]("valid_to_us")))
      .toSet
    assert(streamed === batch, "stream and batch disagree on closed intervals")
  }
}
