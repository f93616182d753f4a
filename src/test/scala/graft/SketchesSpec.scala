package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CountMinSketchAgg, GraftExtensions}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Sketches}
import graft.functions.TextAnalysis

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cmsCol(h: org.apache.spark.sql.Column, d: Int, w: Int) =
    org.apache.spark.sql.graft.shim.column(
      CountMinSketchAgg(
        org.apache.spark.sql.graft.shim.expression(h), d, w).toAggregateExpression())

  test("cms estimate is one-sided (est >= exact) and tight for heavy keys") {
    val out = Sketches.cmsHeavyHitters(Tables.events(spark, TestSpark.sf))
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall { case (_, exact, est) => est >= exact },
      "CMS point estimates must never undercount")
    // w=1024 over this key cardinality: collisions add at most a small
    // constant; heads are counted within 2x
    assert(out.forall { case (_, exact, est) => est <= exact * 2 })
  }

  test("cms merge across partitions equals the single-partition sketch") {
    val hashed = Tables.events(spark, TestSpark.sf)
      .select(TextAnalysis.md5Prefix32(concat(lit("cms:"), col("user_id").cast("string"))).as("h"))
    val one = hashed.coalesce(1).agg(cmsCol(col("h"), 4, 256).as("sk")).as[Seq[Long]].head()
    val many = hashed.repartition(13).agg(cmsCol(col("h"), 4, 256).as("sk")).as[Seq[Long]].head()
    assert(one === many, "elementwise merge must be partitioning-invariant")
    assert(one.sum == hashed.count() * 4, "every row increments one counter per sketch row")
  }

  test("cmsJoinSize: collision-free fixture is exact; real join is one-sided and tight") {
    // left multiplicities {1:2, 2:1}, right {1:1, 2:2, 3:1} -> exact 2+2 = 4;
    // three distinct keys in w=1024 buckets cannot collide in every row
    val left = Seq(1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 2L, 2L, 3L).toDF("k")
    val row = Sketches.cmsJoinSize(left, right, "k").collect().head
    assert(row.getAs[Long]("n_left") === 3L && row.getAs[Long]("n_right") === 4L)
    assert(row.getAs[Long]("exact_join") === 4L)
    assert(row.getAs[Long]("est_join") === 4L && row.getAs[Long]("overest") === 0L)
    // real event streams: estimate never undercounts, and at w=1024 the
    // collision mass stays well under 20% of the true size
    val ev = Tables.events(spark, TestSpark.sf)
    val r2 = Sketches.cmsJoinSize(
      ev.where("event_type = 'click'"),
      ev.where("event_type = 'view'"), "user_id").collect().head
    val (exact, est) = (r2.getAs[Long]("exact_join"), r2.getAs[Long]("est_join"))
    assert(est >= exact, "inner-product estimate must be one-sided")
    assert(exact > 0 && est <= exact + (exact / 5))
  }

  test("cms_sketch is callable from SQL with literal d and w") {
    GraftExtensions.register(spark)
    Tables.events(spark, TestSpark.sf).createOrReplaceTempView("events_v")
    val n = spark.sql(
      "SELECT cms_sketch(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS LONG), 2, 64) AS sk FROM events_v")
      .select(size(col("sk"))).as[Int].head()
    assert(n == 128)
  }

  test("char-class profile counts partition the text exactly") {
    val out = TextAnalysis.charClassProfile(Tables.documents(spark, TestSpark.sf))
      .join(Tables.documents(spark, TestSpark.sf), "doc_id")
      .select(col("n_letters") + col("n_digits") + col("n_spaces") + col("n_other"),
        length(col("text")), col("class_diversity"))
      .as[(Int, Int, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (sum, len, _) => sum == len })
    assert(out.forall { case (_, _, div) => div >= 0.0 && div < 1.0 })
  }

  test("collocations rank planted fixed phrases first by lift") {
    val filler = (1 to 40).map(i => s"filler$i common common").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $filler", "en", "s1", 1L),
      (2L, s"alpha beta gamma delta $filler", "en", "s1", 1L),
      (3L, s"alpha beta gamma delta $filler", "en", "s1", 1L),
      (4L, s"alpha beta gamma delta $filler", "en", "s1", 1L),
      (5L, s"alpha beta gamma delta $filler", "en", "s1", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.collocations(docs, minCount = 5, k = 5)
      .select("bigram", "lift").as[(String, Double)].collect()
    // "alpha beta" occurs 5x with unigram counts 5/5 -> maximal lift;
    // "common common" occurs 80x but its unigram count is 120 -> low lift
    assert(out.head._1 == "alpha beta")
    assert(out.map(_._1).contains("common common") === false ||
      out.last._2 < out.head._2)
    // lift of a perfect collocation = N / c_x exactly
    val n = out.head._2
    assert(n > 1.0)
  }

  test("rollingActiveUsers: windows union users across days, dedup within the window") {
    import java.sql.Timestamp
    def t(day: Int) = new Timestamp(day.toLong * 86400000L)
    // u1 active days 0 and 8 (outside one 7-day window of each other),
    // u2 active days 0 and 3, u3 only day 3; day 20 isolates u9.
    // Windows (trailing 7 days, ends = observed days):
    //   day 0: {u1,u2} = 2; day 3: {u1,u2,u3} = 3 (u2 deduped);
    //   day 8: {u1,u2,u3} = 3 (days 2..8 cover 3 and 8); day 20: {u9}
    val rows = Seq((1L, t(0), 1L, "a", 0.0, ""), (2L, t(0), 2L, "a", 0.0, ""),
      (3L, t(3), 2L, "a", 0.0, ""), (4L, t(3), 3L, "a", 0.0, ""),
      (5L, t(8), 1L, "a", 0.0, ""), (6L, t(20), 9L, "a", 0.0, ""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Sketches.rollingActiveUsers(df).collect()
      .map(x => x.getAs[Long]("day_num") -> x.getAs[Long]("active_users")).toMap
    assert(r === Map(0L -> 2L, 3L -> 3L, 8L -> 3L, 20L -> 1L))
    // and on the real table every window equals the naive sliding distinct
    val ev = Tables.events(spark, TestSpark.sf)
    val fast = Sketches.rollingActiveUsers(ev)
    val pairs = ev.select(expr("unix_micros(ts) div 86400000000").as("d"),
      col("user_id")).distinct()
    val slow = pairs.select(col("d").as("day_num")).distinct()
      .join(pairs, expr("d BETWEEN day_num - 6 AND day_num"))
      .groupBy("day_num").agg(countDistinct("user_id").as("active_users"))
    assert(fast.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ===
      slow.collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
  }

  test("bitmapDistinct equals count(DISTINCT) with dup users and word-boundary ids") {
    import java.sql.Timestamp
    val t = new Timestamp(86400000L) // all rows land on day 1
    // users 0, 62, 63 straddle the 63-bit word boundary; user 0 repeats
    val rows = Seq((1L, t, 0L, "a", 0.0, ""), (2L, t, 0L, "a", 0.0, ""),
      (3L, t, 62L, "a", 0.0, ""), (4L, t, 63L, "a", 0.0, ""),
      (5L, t, 126L, "b", 0.0, ""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Sketches.bitmapDistinct(df).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("distinct_users"))).toMap
    assert(r("a") === ((2L, 3L))) // words {0, 1}; users 0, 62, 63 (0 deduped)
    assert(r("b") === ((1L, 1L)))
    // and on the real table the bitmap count must equal countDistinct
    val ev = Tables.events(spark, TestSpark.sf)
    val bitmap = Sketches.bitmapDistinct(ev)
      .agg(sum("distinct_users")).as[Long].collect().head
    val exact = ev.select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .groupBy("event_type", "d").agg(countDistinct("user_id").as("n"))
      .agg(sum("n")).as[Long].collect().head
    assert(bitmap === exact)
  }

  test("kmvCardinality: h_k is the 64th smallest distinct hash; sub-k sources are exact") {
    val docs = (
      (0L until 30L).map(i => (i, "alpha", s"alpha document number $i with plenty of shared text to gram over")) ++
      Seq((100L, "tiny", "abcdefgh")))  // exactly one 8-gram -> n_kept = 1
      .toDF("doc_id", "source", "text")
    val sh = graft.operators.Corpus.hashedGrams(docs)
    val r = Sketches.kmvCardinality(sh).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // independent path: sort the distinct hashes and take the 64th
    val alphaH = sh.where($"source" === "alpha").select("h").distinct()
      .as[Long].collect().sorted
    assert(r("alpha").getAs[Long]("n_kept") === math.min(64, alphaH.length).toLong)
    if (alphaH.length >= 64) {
      assert(r("alpha").getAs[Long]("h_k") === alphaH(63))
      assert(r("alpha").getAs[Long]("est") === 63L * 4294967296L / alphaH(63))
    }
    val tiny = r("tiny")
    assert(tiny.getAs[Long]("n_kept") === 1L)
    assert(tiny.getAs[Long]("est") === 1L)
    assert(tiny.getAs[Long]("exact_grams") === 1L)
    assert(tiny.getAs[Long]("err_ppm") === 0L)
  }

  test("bloomFprReport: counts partition the users and the ppm identity holds") {
    import java.sql.Timestamp
    val events = (
      (0L until 20L).map(u => (u, "purchase", new Timestamp(1000L + u))) ++
      (0L until 20L).map(u => (u, "view", new Timestamp(2000L + u))) ++   // members also view
      (20L until 50L).map(u => (u, "view", new Timestamp(3000L + u))))
      .toDF("user_id", "event_type", "ts")
    // small filter (m=64) so the load factor is high and FPs are plausible
    val r = Sketches.bloomFprReport(events, m = 64, kh = 2).collect().head
    assert(r.getAs[Long]("m_bits") === 64L)
    assert(r.getAs[Long]("n_members") === 20L)
    assert(r.getAs[Long]("n_probes") === 30L)
    val bits = r.getAs[Long]("bits_set")
    assert(bits >= 1L && bits <= math.min(64L, 2L * 20L))
    val fp = r.getAs[Long]("n_false_pos")
    assert(fp >= 0L && fp <= 30L)
    assert(r.getAs[Long]("fpr_ppm") === fp * 1000000L / 30L)
  }
  test("cmsTopMovers: exact deltas ranked, one-sided bounds on both halves") {
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    val rows =
      (1 to 5).map(i => (i.toLong, day(0), 1L, "a", 0.0, "")) ++   // u1: 5 before
      (6 to 8).map(i => (i.toLong, day(10), 2L, "a", 0.0, "")) ++  // u2: 3 after
      Seq((9L, day(0), 3L, "a", 0.0, ""), (10L, day(10), 3L, "a", 0.0, ""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Sketches.cmsTopMovers(df, splitDay = 5L).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("cnt_a"), x.getAs[Long]("cnt_b"), x.getAs[Long]("delta"),
          x.getAs[Long]("est_a"), x.getAs[Long]("est_b"),
          x.getAs[Boolean]("bounds_ok"))).toMap
    assert(r(1L)._1 === 5L && r(1L)._2 === 0L && r(1L)._3 === -5L)
    assert(r(2L)._1 === 0L && r(2L)._2 === 3L && r(2L)._3 === 3L)
    assert(r(3L)._3 === 0L)
    // one-sided CMS: estimates can only overshoot, never undershoot
    r.values.foreach { case (ca, cb, _, ea, eb, ok) =>
      assert(ea >= ca && eb >= cb && ok)
    }
  }

  test("RollingPackUtil: rolling packs equal direct base-256 packing; injective on windows") {
    import org.apache.spark.sql.graft.RollingPackUtil
    val rnd = new scala.util.Random(13)
    val alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789"
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(40)
      val s = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = RollingPackUtil.packs(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val bytes = s.getBytes("UTF-8")
      val want =
        if (n < RollingPackUtil.K) Array.emptyLongArray
        else (0 to n - RollingPackUtil.K).map { i =>
          (0 until RollingPackUtil.K).foldLeft(0L)((h, j) => (h << 8) | (bytes(i + j) & 0xFFL))
        }.toArray
      assert(got.toSeq === want.toSeq, s"text=[$s]")
      // injectivity: distinct packed values == distinct 8-gram strings
      if (n >= RollingPackUtil.K) {
        val grams = (0 to n - RollingPackUtil.K).map(i => s.substring(i, i + RollingPackUtil.K))
        assert(got.distinct.length === grams.distinct.length, s"text=[$s]")
      }
    }
  }

  test("GramMixUtil.mix32 equals the DuckDB-spelled %-and-// arithmetic") {
    import org.apache.spark.sql.graft.GramMixUtil
    val M = 4294967296L
    val rnd = new scala.util.Random(29)
    // ASCII-leading packs are non-negative; sample that range plus edges
    val samples = Seq(0L, 1L, M - 1, M, Long.MaxValue) ++
      Seq.fill(100)(rnd.nextLong() & 0x7FFFFFFFFFFFFFFFL)
    samples.foreach { g =>
      val t = ((g % M) * 1640531527L % M + (g / M) * 2654435761L % M) % M
      val v = t ^ (t / 65536L)
      val u = v * 1103515245L % M
      val want = u ^ (u / 65536L)
      assert(GramMixUtil.mix32(g) === want, s"g=$g")
      assert(want >= 0L && want < M)
    }
  }

  test("hashedGrams codegen path equals the interpreted utils") {
    import org.apache.spark.sql.graft.{GramMixUtil, RollingPackUtil}
    val texts = Seq("", "short", "exactly8", "a longer text with spaces 123")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, s"s$i", t) }
      .toDF("doc_id", "source", "text")
    val got = Corpus.hashedGrams(docs).select("source", "g", "h")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq.sorted).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val packs = RollingPackUtil.packs(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val want = packs.map(g => (g, GramMixUtil.mix32(g))).toSeq.sorted
      assert(got.getOrElse(s"s$i", Seq.empty) === want, s"text=[$t]")
    }
  }
}
