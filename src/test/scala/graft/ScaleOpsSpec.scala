package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomPrune, Skew}
import graft.sources.Bucketing
import graft.streaming.{RealTime, StreamJoins}

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join plans without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      Bucketing.writeBucketed(
        Tables.lineitem(spark, TestSpark.sf).select("l_orderkey", "l_quantity"),
        "li_bucketed", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.orders(spark, TestSpark.sf)
          .select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
        "ord_bucketed", "l_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      val expected = Tables.lineitem(spark, TestSpark.sf)
        .join(Tables.orders(spark, TestSpark.sf),
          $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("itemKNN pair fan-out over userId-bucketed ratings joins with no pre-join Exchange") {
    // the 100-TB endgame for q107: pre-bucket the deduped ratings by
    // userId once, and the pair self-join's only remaining shuffle is the
    // (pa, pb) aggregate — the join itself reads co-located buckets. At
    // 100 TB neither side broadcasts, so force the shuffled-join path the
    // bucket layout must rescue.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val deduped = Tables.ratings(spark, TestSpark.sf)
        .groupBy($"userId", $"productId")
        .agg(org.apache.spark.sql.functions.max($"rating").cast("long").as("rv"))
      Bucketing.writeBucketed(deduped, "knn_bucketed", "userId", 8)
      val r = spark.table("knn_bucketed")
      val pairs = r.as("a").join(r.as("b"),
          $"a.userId" === $"b.userId" && $"a.productId" < $"b.productId")
        .groupBy($"a.productId".as("pa"), $"b.productId".as("pb"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("support"))
      pairs.collect()
      // count Exchanges as plan NODES (the AQE string repeats the tree in
      // its Initial Plan section — string counting double-counts)
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val finalPlan = pairs.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // in a finalized AQE plan each materialized shuffle is a
      // ShuffleQueryStage LEAF (its exchange hidden inside .plan, which
      // collect does not traverse) — count both shapes, no double count
      val n = finalPlan.collect {
        case e: ShuffleExchangeLike => e
        case s: ShuffleQueryStageExec => s
      }.size
      assert(n <= 1,
        s"pair join over bucketed ratings still shuffles its inputs:\n$finalPlan")
      // exactly the unbucketed self-join's pairs
      val plainR = deduped
      val plain = plainR.as("a").join(plainR.as("b"),
          $"a.userId" === $"b.userId" && $"a.productId" < $"b.productId")
        .groupBy($"a.productId".as("pa"), $"b.productId".as("pb"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("support"))
      assert(pairs.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(pairs).count() === 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q52's bucketed join AND its per-customer aggregate are exchange-free") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q52_bucketed_join")(spark, TestSpark.sf)
      val plan = df.queryExecution.executedPlan.toString
      // bucket layout satisfies both the join's and the groupBy's required
      // distribution — the whole query must plan with zero shuffles
      assert(!plan.contains("Exchange hashpartitioning"),
        s"q52 still shuffles:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the plain join's rows under skew") {
    // power-law key: one hot key with 500 rows
    val big = ((1 to 500).map(i => (1L, i)) ++ (1 to 50).map(i => (2L, i)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedEquiJoin(big, small, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "name").exceptAll(
      plain.select("k", "payload", "name")).count() === 0)
  }

  test("bloomPruneJoin probes the bitmap below the probe-side exchange and equals the plain join") {
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffled-join path (no broadcast, no AQE replanning) so the
      // plan tree exposes the exchange the bloom probe must sit below
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val li = Tables.lineitem(spark, TestSpark.sf).select("l_orderkey", "l_quantity")
      val urgent = Tables.orders(spark, TestSpark.sf)
        .where($"o_orderpriority" === "1-URGENT").select("o_orderkey")
      val pruned = BloomPrune.bloomPruneJoin(li, urgent, "l_orderkey", "o_orderkey")
      // pushdown actually happened: some shuffle exchange has the
      // might_contain filter in its subtree — probe rows die BEFORE shuffling
      import org.apache.spark.sql.execution.FilterExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val prunedExchanges = pruned.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.child.collectFirst {
          case f: FilterExec if f.condition.sql.contains("might_contain") => f
        }.nonEmpty => e
      }
      assert(prunedExchanges.nonEmpty,
        s"no exchange has the bloom probe below it:\n${pruned.queryExecution.executedPlan}")
      // equivalence (the q58 oracle contract): identical multiset vs plain join
      val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      assert(pruned.count() > 0)
      assert(pruned.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(pruned).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("stream-stream interval join matches pairs within the window, evicts beyond it") {
    val in1 = Files.createTempDirectory("ss-left").toString
    val in2 = Files.createTempDirectory("ss-right").toString
    def write(dir: String, name: String, rows: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(dir, name), rows.mkString("\n").getBytes("UTF-8"))
    // left event at t=100; right events at t=110 (in window), t=200 (outside)
    write(in1, "l.json", Seq("""{"userId": 1, "productId": 10, "review": 5.0, "timestamp": 100}"""))
    write(in2, "r.json", Seq(
      """{"userId": 1, "productId": 11, "review": 4.0, "timestamp": 110}""",
      """{"userId": 1, "productId": 12, "review": 4.0, "timestamp": 200}""",
      """{"userId": 2, "productId": 13, "review": 4.0, "timestamp": 105}"""))
    val joined = StreamJoins.intervalJoin(
      RealTime.readReviews(spark, in1), RealTime.readReviews(spark, in2))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join")
      .option("checkpointLocation", Files.createTempDirectory("ss-ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join")
      .select("userId", "l_product", "r_product")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows === Set((1L, 10L, 11L))) // only the in-window same-user pair
  }
}
