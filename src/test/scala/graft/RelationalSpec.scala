package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin picks the latest at-or-before order, NULL when none") {
    val events = Seq(
      (100L, 1L, Timestamp.valueOf("2020-01-10 00:00:00")),
      (101L, 1L, Timestamp.valueOf("2020-01-01 00:00:00")), // exactly at order t
      (102L, 2L, Timestamp.valueOf("2020-01-05 00:00:00"))) // user with no orders
      .toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, 1L, Timestamp.valueOf("2020-01-01 00:00:00")),
      (9L, 1L, Timestamp.valueOf("2020-01-08 00:00:00")),
      (8L, 1L, Timestamp.valueOf("2020-01-12 00:00:00"))) // after both events
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Relational.asofJoin(events, orders)
      .select("event_id", "last_order_key")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(9L)) // latest ≤ Jan 10 is the Jan 8 order
    assert(out(101L) === Some(7L)) // equal timestamp counts as at-or-before
    assert(out(102L) === None)     // no orders for user 2
  }

  test("q24 carries exact counts and an in-query sketch accuracy bound") {
    val rows = SparkEntry.queries("q24_approx_distinct")(spark, TestSpark.sf)
      .select("event_type", "exact_users", "approx_ok")
      .as[(String, Long, Boolean)].collect()
    val exact = Tables.events(spark, TestSpark.sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (k, n, ok) =>
      assert(n === exact(k))
      assert(ok, s"HLL estimate for $k outside the 15% bound")
    }
  }

  test("rollup includes the grand-total row") {
    val r = Relational.orderRollup(Tables.orders(spark, TestSpark.sf))
      .where($"o_orderstatus".isNull && $"o_orderpriority".isNull)
      .select("n_orders").as[Long].collect()
    assert(r.length === 1)
    assert(r.head === Tables.orders(spark, TestSpark.sf).count())
  }

  test("semi and anti joins partition the customer set") {
    val c = Tables.customer(spark, TestSpark.sf)
    val o = Tables.orders(spark, TestSpark.sf)
    val withO = c.join(o.select($"o_custkey".as("c_custkey")), Seq("c_custkey"), "left_semi").count()
    val withoutO = Relational.customersWithoutOrders(c, o).count()
    assert(withO + withoutO === c.count())
  }

  test("kAnonymity: small equivalence classes are counted with their exposed rows") {
    // QI (a, b): group (1,1) has 3 rows, (1,2) has 1, (2,2) has 2
    val df = Seq((1, 1, "x"), (1, 1, "y"), (1, 1, "z"), (1, 2, "w"),
      (2, 2, "u"), (2, 2, "v")).toDF("a", "b", "payload")
    val r = Relational.kAnonymity(df, Seq("a", "b"), k = 3L).collect().head
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("n_small_groups") === 2L) // (1,2) and (2,2)
    assert(r.getAs[Long]("rows_at_risk") === 3L)   // 1 + 2
    assert(r.getAs[Long]("k") === 3L)
    // with k = 1 everything is anonymous
    val ok = Relational.kAnonymity(df, Seq("a", "b"), k = 1L).collect().head
    assert(ok.getAs[Long]("rows_at_risk") === 0L)
  }

  test("bucketRangeLookup: exclusive upper bounds, cross-bucket intervals, out-of-range drop") {
    // width 10; [0,15) spans buckets 0-1, [15,30) spans 1-2: the residual
    // lo<=v<hi filter must separate the shared bucket 1
    val fact = Seq(0L, 14L, 15L, 29L, 99L).map(v => (v, 1L)).toDF("v", "weight")
    val r = Relational.bucketRangeLookup(fact,
      Seq(("low", 0L, 15L), ("high", 15L, 30L)), bucketWidth = 10L)
      .collect().map(x => x.getAs[String]("bracket") ->
        (x.getAs[Long]("n_rows"), x.getAs[Long]("total_weight"))).toMap
    assert(r("low") === ((2L, 2L)))  // 0, 14 — 15 is excluded (hi exclusive)
    assert(r("high") === ((2L, 2L))) // 15, 29; 99 matches no interval
    assert(r.size === 2)
  }

  test("madOutliers: one wild value does not move the median; it is the only outlier") {
    import java.sql.Timestamp
    val t = new Timestamp(0L)
    // values 1..9 plus one wild 10000: median 5.5, MAD 2.5 -> only the
    // wild row has |x-med| > 3*MAD; a mean/stddev gate would be dragged
    val rows = ((1 to 9).map(_.toDouble) :+ 10000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, t, 1L, "a", v, "") }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.madOutliers(df).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("median_value") === 5.5)
    assert(r.getAs[Double]("mad_value") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("rfmSegments: threshold quartiles place 4 users, ties share a quartile") {
    def ts(day: Int) = new Timestamp(day.toLong * 86400000L)
    // u1: recent + mid spend, u2: top spender, u3: most frequent with
    // tiny spend, u4: oldest. Distinct metrics spread 1..4; the u2/u4
    // frequency tie and the u1/u4 spend tie land TOGETHER (threshold
    // semantics — tied values share the better quartile), unlike ntile.
    // Hand-computed cuts over ×4 metrics: recency [0,4,28,40] →
    // (3,16,31); frequency [4,4,8,16] → (4,6,10); cents
    // [16,800,800,20000] → (604,800,5600).
    val rows = Seq(
      (1L, ts(0), 1L, "a", 1.0, ""), (2L, ts(10), 1L, "a", 1.0, ""),
      (3L, ts(9), 2L, "a", 50.0, ""),
      (4L, ts(0), 3L, "a", 0.01, ""), (5L, ts(1), 3L, "a", 0.01, ""),
      (6L, ts(2), 3L, "a", 0.01, ""), (7L, ts(3), 3L, "a", 0.01, ""),
      (8L, ts(0), 4L, "a", 2.0, ""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.rfmSegments(df).collect()
      .map(x => (x.getAs[Int]("r_q"), x.getAs[Int]("f_q"), x.getAs[Int]("m_q")) ->
        (x.getAs[Long]("n_users"), x.getAs[Long]("segment_cents"))).toMap
    assert(r.size === 4)
    assert(r((1, 2, 2)) === ((1L, 200L)))  // u1
    assert(r((2, 3, 1)) === ((1L, 5000L))) // u2
    assert(r((3, 1, 4)) === ((1L, 4L)))    // u3
    assert(r((4, 3, 2)) === ((1L, 200L)))  // u4: ties with u2 (f) and u1 (m)
  }

  test("keySkewReport: hand-computed HHI and top share on a skewed key") {
    val t = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w"))
      .toDF("k", "payload")
    val r = Relational.keySkewReport(Seq(("t.k", t, "k"))).collect().head
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Long]("max_key_rows") === 3L)
    assert(r.getAs[Double]("top_share") === 0.75)
    assert(r.getAs[Double]("hhi") === (9.0 + 1.0) / 16.0)
  }

  test("abTestReport: planted perfect divergence is significant; rates are exact") {
    import graft.functions.TextAnalysis
    val t = new Timestamp(0L)
    // recover each user's hash arm first, then make arm 0 always convert
    // and arm 1 never — the report must call that significant
    val arms = spark.range(0, 100).select($"id",
      (TextAnalysis.md5Prefix32(concat(lit("ab:"), $"id".cast("string"))) % 2).as("arm"))
      .as[(Long, Long)].collect().toMap
    val rows = (0L until 100L).map { u =>
      (u, t, u, if (arms(u) == 0L) "purchase" else "view", 0.0, "")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.abTestReport(df).collect().head
    val (nA, nB) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(nA + nB === 100L)
    assert(r.getAs[Long]("c_a") === nA)   // arm 0 all convert
    assert(r.getAs[Long]("c_b") === 0L)   // arm 1 none convert
    assert(r.getAs[Double]("rate_a") === 1.0)
    assert(r.getAs[Double]("rate_b") === 0.0)
    assert(r.getAs[Double]("lift") === 0.0)
    assert(r.getAs[Boolean]("significant"))
  }

  test("integrityAudit counts planted orphans; the clean relation reports 1.0") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "orphan"), (2L, "c"))
      .toDF("fk", "payload")
    val parent = Seq((1L, "p1"), (2L, "p2")).toDF("pk", "name")
    val r = Relational.integrityAudit(Seq(
      ("child->parent", child, "fk", parent, "pk"),
      ("parent->parent", parent, "pk", parent, "pk"))).collect()
      .map(x => x.getAs[String]("relation") ->
        (x.getAs[Long]("n_child"), x.getAs[Long]("n_orphans"),
          x.getAs[Double]("match_pct"))).toMap
    assert(r("child->parent") === ((4L, 1L, 0.75)))
    assert(r("parent->parent") === ((2L, 0L, 1.0)))
  }

  test("lDiversity flags homogeneous classes k-anonymity would pass") {
    // class A: 3 rows, ONE sensitive value (large but homogeneous);
    // class B: 2 rows, two sensitive values
    val df = Seq(
      ("A", 1L), ("A", 1L), ("A", 1L),
      ("B", 1L), ("B", 2L))
      .toDF("qi", "sens")
    val r = Relational.lDiversity(df, Seq("qi"), "sens", l = 2L).collect().head
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("n_homogeneous") === 1L) // only A
    assert(r.getAs[Long]("rows_at_risk") === 3L)
    assert(r.getAs[Long]("min_diversity") === 1L)
    assert(r.getAs[Long]("l") === 2L)
  }

  test("tombstonePurge audits exactly what the anti-join scrub would remove") {
    val events = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("user_id", "payload")
    val del = Seq(1L, 3L, 99L).toDF("user_id") // 99 absent from the table
    val r = Relational.tombstonePurge(Seq(("events", events, "user_id")), del)
      .collect().head
    assert(r.getAs[String]("table_name") === "events")
    assert(r.getAs[Long]("n_before") === 5L)
    assert(r.getAs[Long]("n_purged") === 3L) // user 1 twice + user 3
    assert(r.getAs[Long]("n_after") === 2L)
    assert(r.getAs[Long]("n_users_purged") === 2L) // 99 never appears
    // the audit equals the scrub: anti-join survivor count == n_after
    val scrubbed = events.join(del, Seq("user_id"), "left_anti").count()
    assert(scrubbed === r.getAs[Long]("n_after"))
  }

  test("tableChecksum is row-order invariant, change-sensitive, and null-safe") {
    val a = Seq((1L, Some("x"), "p"), (2L, Some("y"), "q"), (3L, None, "r"))
      .toDF("k", "s", "t")
    val shuffled = Seq((3L, None, "r"), (1L, Some("x"), "p"), (2L, Some("y"), "q"))
      .toDF("k", "s", "t").repartition(7)
    val changed = Seq((1L, Some("x"), "p"), (2L, Some("z"), "q"), (3L, None, "r"))
      .toDF("k", "s", "t")
    // null in s vs the string shifted into t — concat_ws would collide
    val nullLeft = Seq((1L, Option.empty[String], "x")).toDF("k", "s", "t")
    val nullRight = Seq((1L, Some("x"), null.asInstanceOf[String])).toDF("k", "s", "t")

    def sum(df: org.apache.spark.sql.DataFrame): Long =
      Relational.tableChecksum(Seq(("t", df, Seq("k", "s", "t")))).collect()
        .head.getAs[Long]("checksum")
    assert(sum(a) === sum(shuffled), "permuting rows/partitions must not move the checksum")
    assert(sum(a) !== sum(changed), "a single changed cell must move the checksum")
    assert(sum(nullLeft) !== sum(nullRight), "null position must be distinguishable")
  }

  test("distributionDrift splits the day range at its midpoint and scores the mix shift") {
    // days 0..3 → mid_day = 2; type a is balanced, type b vanishes late
    def ts(day: Int, i: Int) = new java.sql.Timestamp((day * 86400L + i) * 1000L)
    val ev = Seq(
      ("a", ts(0, 1)), ("a", ts(1, 2)), ("a", ts(2, 3)), ("a", ts(3, 4)),
      ("b", ts(0, 5)), ("b", ts(1, 6)))
      .toDF("event_type", "ts")
    val r = Relational.distributionDrift(ev).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("a").getAs[Long]("n_early") === 2L)
    assert(r("a").getAs[Long]("n_late") === 2L)
    assert(r("b").getAs[Long]("n_early") === 2L)
    assert(r("b").getAs[Long]("n_late") === 0L)
    // tot_early=4 tot_late=2: e(a)=(8/3, 4/3) → χ²=0.5; e(b)=(4/3, 2/3) → χ²=1.0
    assert(math.abs(r("a").getAs[Double]("chi2_contrib") - 0.5) < 1e-12)
    assert(math.abs(r("b").getAs[Double]("chi2_contrib") - 1.0) < 1e-12)
    assert(math.abs(r("b").getAs[Double]("exp_early") - 4.0 / 3) < 1e-12)
  }

  test("columnProfile counts nulls/distincts and keeps typed min/max ordering") {
    // k=10 vs k=9 is the lexicographic trap: string min would pick "10"
    val df = Seq(
      (Some(9L), Some("b")), (Some(10L), None),
      (Some(2L), Some("a")), (None, Some("a")))
      .toDF("k", "s")
    val r = Relational.columnProfile(df, Seq("k", "s")).collect()
      .map(x => x.getAs[String]("col_name") -> x).toMap
    assert(r.size === 2)
    assert(r("k").getAs[Long]("n_rows") === 4L)
    assert(r("k").getAs[Long]("n_nulls") === 1L)
    assert(r("k").getAs[Long]("n_distinct") === 3L)
    assert(r("k").getAs[String]("min_val") === "2")
    assert(r("k").getAs[String]("max_val") === "10")
    assert(r("s").getAs[Long]("n_nulls") === 1L)
    assert(r("s").getAs[Long]("n_distinct") === 2L)
    assert(r("s").getAs[String]("min_val") === "a")
    assert(r("s").getAs[String]("max_val") === "b")
  }

  test("rangeBoundaries: hand-computed exact cuts, perfectly balanced buckets") {
    // keys 1..8, b=4: scaled cuts at interp indices 1.75/3.5/5.25 over
    // 4,8,...,32 -> 11, 18, 25 (exact integers); 2 rows per bucket
    val df = (1L to 8L).toDF("k")
    val r = Relational.rangeBoundaries(df, "k", b = 4).collect()
      .map(x => x.getAs[Int]("bucket") ->
        (Option(x.getAs[java.lang.Long]("upper_scaled")).map(_.toLong),
          x.getAs[Long]("n_rows"))).toMap
    assert(r === Map(
      0 -> ((Some(11L), 2L)), 1 -> ((Some(18L), 2L)),
      2 -> ((Some(25L), 2L)), 3 -> ((None, 2L))))
  }

  test("tCloseness: homogeneous classes hit TVD 1/2 and flag; balanced do not") {
    // global margin: a=2, b=2, N=4; class X all-a, class Y all-b.
    // X: |2·4-2·2| + |0·4-2·2| = 8 -> t = 8/16 = 0.5, flagged (t > 1/4).
    val df = Seq(("X", "a"), ("X", "a"), ("Y", "b"), ("Y", "b"))
      .toDF("grp", "sens")
    val r = Relational.tCloseness(df, Seq("grp"), "sens").collect()
      .map(x => x.getAs[String]("grp") ->
        (x.getAs[Long]("n_class"), x.getAs[Long]("t_num"),
          x.getAs[Long]("t_den"), x.getAs[Double]("t"),
          x.getAs[Boolean]("flagged"))).toMap
    assert(r("X") === ((2L, 8L, 16L, 0.5, true)))
    assert(r("Y") === ((2L, 8L, 16L, 0.5, true)))
    // a class mirroring the global mix exactly has t = 0 and no flag
    val bal = Seq(("X", "a"), ("X", "b"), ("Y", "a"), ("Y", "b"))
      .toDF("grp", "sens")
    val r2 = Relational.tCloseness(bal, Seq("grp"), "sens").collect()
    assert(r2.forall(x => x.getAs[Long]("t_num") == 0L &&
      !x.getAs[Boolean]("flagged")))
  }

  test("unconvertedViews: only views with no in-horizon click count") {
    def t(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"1970-01-01 10:$min%02d:00")
    // u1: view then click 10 min later (converted); u2: view, click 40
    // min later (outside horizon); u3: view, no click at all
    val events = Seq(
      (1L, t(0), 1L, "view", 1.0, ""), (2L, t(10), 1L, "click", 1.0, ""),
      (3L, t(0), 2L, "view", 1.0, ""), (4L, t(40), 2L, "click", 1.0, ""),
      (5L, t(0), 3L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.unconvertedViews(events).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_views") === 3L)
    assert(r.head.getAs[Long]("n_unconverted") === 2L)
    assert(r.head.getAs[Long]("unconv_ppm") === 2000000L / 3L)
  }

  test("latencyHistogram: gaps land in their power-of-two buckets") {
    def us(micro: Long): java.sql.Timestamp = {
      val ts = new java.sql.Timestamp(micro / 1000)
      ts.setNanos((micro % 1000000L).toInt * 1000); ts
    }
    // one user, gaps of exactly 1us, 7us, 8us: buckets 1 ([1,1]),
    // 3 ([4,7]), 4 ([8,15]); typed by the FROM event's type
    val events = Seq(
      (1L, us(0L), 1L, "a", 1.0, ""), (2L, us(1L), 1L, "a", 1.0, ""),
      (3L, us(8L), 1L, "a", 1.0, ""), (4L, us(16L), 1L, "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.latencyHistogram(events).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("bucket")) ->
        (x.getAs[Long]("lo_us"), x.getAs[Long]("hi_us"), x.getAs[Long]("n"))).toMap
    assert(r(("a", 1L)) === ((1L, 1L, 1L)))
    assert(r(("a", 3L)) === ((4L, 7L, 1L)))
    assert(r(("a", 4L)) === ((8L, 15L, 1L)))
    assert(r.size === 3)
  }

  test("q183/q184 plans broadcast every dimension; the fact never double-shuffles") {
    val q5 = SparkEntry.queries("q183_region_revenue")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(q5.contains("BroadcastHashJoin"), s"q183 lost its broadcast dims:\n$q5")
    assert(!q5.contains("CartesianProduct"), s"q183 has a cross join:\n$q5")
    val q3 = SparkEntry.queries("q184_shipping_priority")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(q3.contains("TakeOrderedAndProject"),
      s"q184 must heap-select, not global-sort:\n$q3")
    assert(q3.contains("PushedFilters") || q3.contains("Filter"),
      s"q184 lost its pushed predicates:\n$q3")
  }

  test("corrMatrix: engineered perfect and zero correlations come out exact") {
    // price = 100*quantity (r=1); discount alternates independently of
    // quantity over a balanced design (r=0); tax constant (den 0 -> NaN)
    val li = Seq(
      (1.0, 1.0, 0.01, 0.05), (2.0, 2.0, 0.02, 0.05),
      (1.0, 1.0, 0.02, 0.05), (2.0, 2.0, 0.01, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val r = Relational.corrMatrix(li).collect()
      .map(x => (x.getAs[String]("x_col"), x.getAs[String]("y_col")) -> x).toMap
    assert(r.size === 6)
    // the 2^30 shift underflows these tiny engineered variances to 0,
    // so r2_ppm is NULL (guarded) — but the sign of the exact covariance
    // numerator is still graded
    assert(r(("quantity", "price_cents")).getAs[Long]("sign") === 1L)
    assert(r(("quantity", "discount_pct")).getAs[Long]("sign") === 0L)
    // constant column: zero variance -> sign of num is 0, r2 NULL
    assert(r(("quantity", "tax_pct")).getAs[Long]("sign") === 0L)
    assert(r(("quantity", "tax_pct")).isNullAt(
      r(("quantity", "tax_pct")).fieldIndex("r2_ppm")))
    // a big engineered sample clears the shift: 2^18 rows of y = 100x
    // must grade r2_ppm ~ 1e6 exactly-deterministically (and x vs an
    // alternating flag grades ~0)
    val n = 1 << 18
    val big = spark.range(n).selectExpr(
      "CAST(1 + id % 50 AS DOUBLE) AS l_quantity",
      "CAST(430 * (1 + id % 50) AS DOUBLE) AS l_extendedprice",
      "CAST(0.01 * (id % 2) AS DOUBLE) AS l_discount",
      "CAST(0.01 * ((id + 1) % 2) AS DOUBLE) AS l_tax")
    val rb = Relational.corrMatrix(big).collect()
      .map(x => (x.getAs[String]("x_col"), x.getAs[String]("y_col")) -> x).toMap
    val perfect = rb(("quantity", "price_cents"))
    assert(perfect.getAs[Long]("sign") === 1L)
    // shifted-exact r^2: within 2% of 1e6 for a perfectly linear pair
    assert(math.abs(perfect.getAs[Long]("r2_ppm") - 1000000L) <= 20000L)
    val anti = rb(("discount_pct", "tax_pct"))
    assert(anti.getAs[Long]("sign") === -1L)
    assert(anti.getAs[Long]("r2_ppm") >= 980000L)
  }

  test("bootstrapCI: thresholds are a Poisson(1) CDF, interval brackets the mean") {
    import graft.operators.PoissonBoot
    val t = PoissonBoot.thresholds
    assert(t.length === 5)
    assert(t.zip(t.tail).forall { case (a, b) => a < b })
    // CDF(1) = 2/e ~ 0.7358, CDF(4) ~ 0.9963
    assert(math.abs(t(1).toDouble / 4294967296.0 - 2.0 / math.E) < 1e-9)
    assert(t(4).toDouble / 4294967296.0 > 0.995)
    val r = Relational.bootstrapCI(graft.Tables.events(spark, TestSpark.sf))
      .collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (m, lo, hi) = (x.getAs[Long]("mean_micro"),
        x.getAs[Long]("lo_micro"), x.getAs[Long]("hi_micro"))
      assert(lo <= hi, "interval must be ordered")
      assert(x.getAs[Long]("n_reps") === 32L)
      // a 90% bootstrap interval around a mean of thousands of rows
      // must bracket the point estimate
      assert(lo <= m && m <= hi, s"CI [$lo, $hi] misses the mean $m")
    }
    val again = Relational.bootstrapCI(graft.Tables.events(spark, TestSpark.sf))
      .collect().map(_.toString).sorted
    assert(again.toSeq === r.map(_.toString).sorted.toSeq, "replicas replay")
  }

  test("independenceAudit: exact deviations, zero for a perfectly independent grid") {
    // 2 types x 2 weekdays, perfectly independent: obs = r*c/N exactly
    def t(day: Int, i: Int): java.sql.Timestamp =
      new java.sql.Timestamp((day.toLong * 1440 + i) * 60000L)
    // type a: 2 on day 0 (weekday 0), 2 on day 1; type b: 1 and 1
    val rows = Seq(
      (1L, t(0, 0), 1L, "a", 1.0, ""), (2L, t(0, 1), 1L, "a", 1.0, ""),
      (3L, t(1, 0), 1L, "a", 1.0, ""), (4L, t(1, 1), 1L, "a", 1.0, ""),
      (5L, t(0, 2), 1L, "b", 1.0, ""), (6L, t(1, 2), 1L, "b", 1.0, ""))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.independenceAudit(events).collect()
    assert(r.length === 4)
    r.foreach { x =>
      assert(x.getAs[Long]("contrib_nano") === 0L)
      assert(x.getAs[Long]("flagged") === 0L)
    }
    // a fully dependent grid: type a only day0, type b only day1 -> every
    // cell deviates; with 2 obs per cell the 3-sigma flag fires (dev^2 =
    // (2*4-2*2)^2 = 16 > 9*r*c*n = ... wait r=c=2, n=4 -> 9*2*2*4 = 144)
    val dep = Seq(
      (1L, t(0, 0), 1L, "a", 1.0, ""), (2L, t(0, 1), 1L, "a", 1.0, ""),
      (3L, t(1, 0), 1L, "b", 1.0, ""), (4L, t(1, 1), 1L, "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = Relational.independenceAudit(dep).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("weekday")) -> x).toMap
    // observed cells only: (a,0) and (b,1); dev = 2*4 - 2*2 = 4
    assert(r2.keySet === Set(("a", 0L), ("b", 1L)))
    r2.values.foreach { x =>
      // dev = 4, contrib = 16/(2*2*4) = 1 -> exactly 1e9 nano
      assert(x.getAs[Long]("contrib_nano") === 1000000000L)
      assert(x.getAs[Long]("flagged") === 0L) // 16 < 144: n too small for 3 sigma
    }
  }

  test("benfordAudit: shares are exact ppb and the expectation sums to ~1") {
    import graft.operators.BenfordExpected
    // the table itself: decreasing, log10(2) first, ~10^9 total
    val e = BenfordExpected.ppb
    assert(e.length === 9 && e.zip(e.tail).forall { case (a, b) => a > b })
    assert(e.head === math.floor(math.log10(2.0) * 1e9).toLong)
    assert(math.abs(e.sum - 1000000000L) < 10L)
    // fixture: 2 orders leading 1, 1 order leading 9 -> exact thirds
    val orders = Seq((1L, 123.45), (2L, 1999.0), (3L, 900.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = Relational.benfordAudit(orders).collect()
      .map(x => x.getAs[Int]("digit") ->
        (x.getAs[Long]("obs"), x.getAs[Long]("obs_ppb"),
          x.getAs[Long]("dev_ppb"))).toMap
    assert(r.keySet === Set(1, 9))
    assert(r(1)._1 === 2L && r(1)._2 === 2000000000L / 3L)
    assert(r(9)._1 === 1L && r(9)._2 === 1000000000L / 3L)
    assert(r(1)._3 === r(1)._2 - e(0))
    // real orders: every digit appears and shares sum to ~1
    val real = Relational.benfordAudit(graft.Tables.orders(spark, TestSpark.sf))
      .collect()
    assert(real.map(_.getAs[Int]("digit")).toSet === (1 to 9).toSet)
    val shareSum = real.map(_.getAs[Long]("obs_ppb")).sum
    assert(shareSum > 999999900L && shareSum <= 1000000000L)
  }

  test("dpNoisedCounts: noise is bounded, centered, and reproducible") {
    import graft.operators.DpNoise
    // the threshold table itself: strictly increasing, inside [0, 2^32),
    // and CDF(0) = 1/(1+alpha) lands where the closed form says
    val t = DpNoise.thresholds
    assert(t.length === 30)
    assert(t.zip(t.tail).forall { case (a, b) => a < b })
    assert(t.head > 0L && t.last < 4294967296L)
    val alpha = math.exp(-DpNoise.epsilon)
    assert(math.abs(t(15).toDouble / 4294967296.0 - 1.0 / (1 + alpha)) < 1e-9)
    val r = Relational.dpNoisedCounts(graft.Tables.events(spark, TestSpark.sf))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("noise")
      assert(n >= -15L && n <= 15L, s"noise $n outside the truncation")
      assert(row.getAs[Long]("released") ===
        row.getAs[Long]("true_cnt") + n)
    }
    // at eps = 0.25 the mechanism is wide but centered: the mean |noise|
    // of the geometric is ~2a/(1-a^2) ~ 4; 8 is a regression alarm only
    val meanAbs = r.map(x => math.abs(x.getAs[Long]("noise"))).sum.toDouble / r.length
    assert(meanAbs < 8.0, s"mean |noise| $meanAbs implausibly wide")
    assert(r.map(_.getAs[Long]("noise")).distinct.length > 1,
      "hash-indexed draws must vary across groups")
    val again = Relational.dpNoisedCounts(graft.Tables.events(spark, TestSpark.sf))
      .collect().map(_.toString).sorted
    assert(again.toSeq === r.map(_.toString).sorted.toSeq, "seeded noise replays")
  }

  test("skyline: sort-scan matches the brute-force dominance definition") {
    // hand fixture: days 0..3, prices in cents after the x100 scale.
    // (300, d3) and (500, d1) and (900, d0) are the frontier; (300, d1)
    // is dominated by (500, d1); (500, d0) by (900, d0) and (500, d1);
    // the duplicate (900, d0) rows collapse with n_rows = 2
    val day = (d: Int) => java.sql.Date.valueOf(s"1970-01-0${d + 1}")
    val orders = Seq(
      (1L, 3.0, day(3)), (2L, 5.0, day(1)), (3L, 9.0, day(0)),
      (4L, 9.0, day(0)), (5L, 3.0, day(1)), (6L, 5.0, day(0)))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val r = Relational.skyline(orders).collect()
      .map(x => (x.getAs[Long]("price_cents"), x.getAs[Long]("day_num")) ->
        x.getAs[Long]("n_rows")).toMap
    assert(r === Map((300L, 3L) -> 1L, (500L, 1L) -> 1L, (900L, 0L) -> 2L))
    // real corpus: compare against the O(n^2) definition point by point
    val real = Relational.skyline(graft.Tables.orders(spark, TestSpark.sf))
      .collect().map(x => (x.getAs[Long]("price_cents"), x.getAs[Long]("day_num")))
      .toSet
    val pts = graft.Tables.orders(spark, TestSpark.sf)
      .selectExpr("CAST(floor(o_totalprice * 100) AS BIGINT) AS x",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS y")
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val brute = pts.filter { case (x, y) =>
      !pts.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y) }
    }.toSet
    assert(real === brute, "grid prune must be lossless")
  }

  test("skyline: anti-diagonal adversarial frontier (every point undominated)") {
    // price and recency trade off perfectly monotonically — the worst
    // case for the prune (nothing is dominated, ALL points survive to
    // the scan stage). Correctness: the full anti-diagonal IS the
    // skyline. Scale: the scan window partitions by x-bucket, so this
    // shape spreads over buckets instead of one task (the r10 `weak`).
    val n = 500
    val adv = spark.range(n.toLong).selectExpr(
      "id AS o_orderkey",
      "CAST(1 + id AS DOUBLE) AS o_totalprice",
      s"date_add(DATE '1992-01-01', CAST($n - 1 - id AS INT)) AS o_orderdate")
    val r = Relational.skyline(adv).collect()
    assert(r.length === n, s"anti-diagonal skyline must keep all $n points")
    assert(r.forall(_.getAs[Long]("n_rows") == 1L))
    // mixed adversarial: add, for every frontier point, a same-bucket
    // dominated twin (one cent cheaper, same day) — the LOCAL scan must
    // kill exactly those, cross-bucket thr pruning must not over-kill
    val twin = adv.selectExpr("o_orderkey + 1000000 AS o_orderkey",
      "o_totalprice - 0.005 AS o_totalprice", "o_orderdate")
    val r2 = Relational.skyline(adv.unionAll(twin)).collect()
      .map(x => (x.getAs[Long]("price_cents"), x.getAs[Long]("day_num"))).toSet
    val expected = (0 until n)
      .map(i => ((1 + i) * 100L, (8035 + n - 1 - i).toLong)).toSet
    assert(r2 === expected, "dominated same-bucket twins must be eliminated")
  }

  test("smallQuantityRevenue: only lines below 20% of their part's avg count") {
    val part = Seq((1L, "Brand#4"), (2L, "Brand#4"), (3L, "Other"))
      .toDF("p_partkey", "p_brand")
    // part 1: quantities 1,10,10,10 → avg 7.75, 20% = 1.55 → only q=1 hits
    // part 2: 5,5 → 20% of avg is 1 → nothing strictly below via 5·cnt·q < sumq
    // part 3: wrong brand, excluded even though its quantity is tiny
    val li = Seq(
      (1L, 1.0, 100.50), (1L, 10.0, 10.0), (1L, 10.0, 10.0), (1L, 10.0, 10.0),
      (2L, 5.0, 50.0), (2L, 5.0, 50.0),
      (3L, 1.0, 999.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Relational.smallQuantityRevenue(part, li).collect().head
    assert(r.getAs[Long]("n_parts") === 1L)
    assert(r.getAs[Long]("n_lines") === 1L)
    assert(r.getAs[Double]("revenue") === 100.50)
    assert(r.getAs[Double]("avg_yearly") === 100.50 / 7.0)
  }

  test("waitingSuppliers: only the sole late supplier of a shared order scores") {
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val supplier = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("s_suppkey", "s_name")
    val orders = Seq(10L, 11L, 12L, 13L, 14L)
      .map(k => (k, t("2020-01-01"))).toDF("o_orderkey", "o_orderdate")
    val late = t("2020-06-01")  // 152 days
    val ok = t("2020-02-01")    //  31 days
    val li = Seq(
      (10L, 1L, late), (10L, 2L, ok),   // order 10: only supplier 1 late → counts
      (11L, 1L, late), (11L, 2L, late), // both late → nobody counts
      (12L, 1L, late),                  // single-supplier order → excluded
      (13L, 1L, ok), (13L, 2L, ok),     // nobody late
      (14L, 2L, late), (14L, 3L, ok))   // only supplier 2 late → counts
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val r = Relational.waitingSuppliers(supplier, orders, li)
      .collect().map(x => x.getAs[Long]("s_suppkey") ->
        (x.getAs[String]("s_name"), x.getAs[Long]("numwait"))).toMap
    assert(r === Map(1L -> ("alpha", 1L), 2L -> ("beta", 1L)))
  }

  test("customerDistribution keeps zero-order customers in the histogram") {
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val r = Relational.customerDistribution(customer, orders)
      .collect().map(x => x.getAs[Long]("c_count") -> x.getAs[Long]("custdist"))
      .toMap
    // 3 and 4 placed nothing, 2 placed one, 1 placed two
    assert(r === Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("partRevenueShare: integer threshold keeps only above-1.5x-mean parts") {
    // revenues: part 1 = 90.00, part 2 = 9.00 (10% off 10.00), part 3 = 1.00
    // mean = 100/3; only part 1 clears 1.5x the mean
    val li = Seq(
      (1L, 90.0, 0.0),
      (2L, 10.0, 0.10),
      (3L, 1.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val r = Relational.partRevenueShare(li).collect()
    assert(r.map(_.getAs[Long]("l_partkey")).toSeq === Seq(1L))
    assert(r.head.getAs[Long]("revenue_e4") === 900000L) // 90.00 · 10⁴
    assert(r.head.getAs[Long]("share_ppm") === 900000L)  // 90 of 100.00 total
  }

  test("idleRichCustomers: above positive-average balance AND no recent order") {
    val customer = Seq(
      (1L, 7, 100.0),  // rich, has a RECENT order → excluded
      (2L, 7, 100.0),  // rich, only an old order → kept
      (3L, 8, 10.0),   // below the positive average (72.50) → excluded
      (4L, 8, -50.0),  // negative balance → excluded (and not in the average)
      (5L, 8, 80.0))   // above average, orderless → kept
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (10L, 1L, Timestamp.valueOf("2001-05-01 00:00:00")),  // after the cutoff
      (11L, 2L, Timestamp.valueOf("1999-05-01 00:00:00")))  // before the cutoff
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val r = Relational.idleRichCustomers(customer, orders)
      .collect().map(x => x.getAs[Int]("c_nationkey") ->
        (x.getAs[Long]("n_cust"), x.getAs[Long]("total_cents"))).toMap
    assert(r === Map(7 -> ((1L, 10000L)), 8 -> ((1L, 8000L))))
  }

  test("cheapestShipper: per-part argmin with suppkey tiebreak") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 10L), // part 1: suppliers 10, 20 (dup line)
      (2L, 30L), (2L, 40L))            // part 2: equal balances → tie
      .toDF("l_partkey", "l_suppkey")
    val s = Seq((10L, 50.0), (20L, 10.0), (30L, 7.5), (40L, 7.5))
      .toDF("s_suppkey", "s_acctbal")
    val r = Relational.cheapestShipper(li, s).collect()
      .map(x => x.getAs[Long]("l_partkey") ->
        (x.getAs[Long]("s_suppkey"), x.getAs[Long]("bal_cents"),
          x.getAs[Long]("n_shippers"))).toMap
    assert(r(1L) === ((20L, 1000L, 2L)))
    assert(r(2L) === ((30L, 750L, 2L))) // tie broken by the lower suppkey
  }

  test("giniRevenue: zero for equal parts, hand value for a 1:3 split") {
    val equal = Seq((1L, 2.0, 0.0), (2L, 2.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    assert(Relational.giniRevenue(equal).collect().head
      .getAs[Long]("gini_ppm") === 0L)
    val skewed = Seq((1L, 1.0, 0.0), (2L, 3.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val g = Relational.giniRevenue(skewed).collect().head
    assert(g.getAs[Long]("total_e4") === 40000L)
    // raw Σi·x = 70000 (1·10000 + 2·30000), surfaced >>30 (sf1.0 found
    // the raw BIGINT surface overflowing at 3.4e20): 70000 >> 30 = 0
    assert(g.getAs[Long]("weighted_sum_shr30") === 0L)
    assert(g.getAs[Long]("gini_ppm") === 250000L)    // (140000−120000)/80000
  }

  test("randomizedResponse: mass is conserved and a no-flip sample reports truth") {
    // resolve event ids whose "rr:" draw does NOT flip (3/4 of ids)
    val noflip = spark.range(1, 100).toDF("event_id")
      .select(col("event_id"),
        (graft.functions.TextAnalysis.md5Prefix32(
          concat(lit("rr:"), col("event_id").cast("string"))) % 4 =!= 0).as("nf"))
      .as[(Long, Boolean)].collect().filter(_._2).map(_._1).take(6)
    def at(i: Int) = new Timestamp(1000L * i)
    val events = noflip.zipWithIndex.map { case (id, i) =>
      (id, at(i), 1L, if (i % 2 == 0) "view" else "click", 0.0, "") }
      .toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Relational.randomizedResponse(events).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("true_cnt"), x.getAs[Long]("obs_cnt"),
          x.getAs[Long]("est_cnt"))).toMap
    // nobody flipped → observed equals truth per type
    assert(r("view")._1 === 3L && r("view")._2 === 3L)
    assert(r("click")._1 === 3L && r("click")._2 === 3L)
    // debias formula recomputed by hand: (4·3·2 − 6)/(3·2) = 3
    assert(r("view")._3 === 3L && r("click")._3 === 3L)
  }

  test("diffInDiff: treatment jump net of control drift, in exact micro") {
    // resolve the md5 arms first so the fixture is deterministic
    val arms = spark.range(1, 20).toDF("user_id")
      .select(col("user_id"),
        (graft.functions.TextAnalysis.md5Prefix32(
          concat(lit("ab:"), col("user_id").cast("string"))) % 2).as("arm"))
      .as[(Long, Long)].collect().toMap
    val uc = arms.collectFirst { case (u, 0L) => u }.get // control
    val ut = arms.collectFirst { case (u, 1L) => u }.get // treatment
    def at(day: Long) = new Timestamp(day * 86400000L)
    val events = Seq(
      (1L, at(19730), uc, "view", 0.0, ""),     // control pre: no conversion
      (2L, at(19740), uc, "view", 0.0, ""),     // control post: no conversion
      (3L, at(19730), ut, "view", 0.0, ""),     // treatment pre: no conversion
      (4L, at(19740), ut, "purchase", 0.0, "")) // treatment post: converts
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Relational.diffInDiff(events).collect().head
    assert(m.getAs[Long]("rate_t_post_micro") === 1000000L)
    assert(m.getAs[Long]("rate_t_pre_micro") === 0L)
    assert(m.getAs[Long]("rate_c_post_micro") === 0L)
    assert(m.getAs[Long]("did_micro") === 1000000L)
  }

  test("aucRankSum: ties earn half credit, perfect separation scores 1") {
    // pos@10 beats neg@5 fully, ties neg@10 → (1 + 0.5) / 2 = 0.75
    val mixed = Seq((10L, true), (10L, false), (5L, false))
      .toDF("score", "is_pos")
    val m = Relational.aucRankSum(mixed).collect().head
    assert(m.getAs[Long]("n_pos") === 1L)
    assert(m.getAs[Long]("n_neg") === 2L)
    assert(m.getAs[Long]("auc_num2") === 3L)
    assert(m.getAs[Long]("auc_ppm") === 750000L)
    val perfect = Seq((9L, true), (8L, true), (2L, false))
      .toDF("score", "is_pos")
    assert(Relational.aucRankSum(perfect).collect().head
      .getAs[Long]("auc_ppm") === 1000000L)
  }

  private def day(n: Long): Timestamp = new Timestamp(n * 86400000L)

  test("orderPriorityCheck: only orders with a >30-day-late line count") {
    val orders = Seq(
      (1L, "HIGH", day(9870)),  // late line below
      (2L, "HIGH", day(9871)),  // on-time line only
      (3L, "LOW", day(9875)),   // late line below
      (4L, "LOW", day(100)))    // outside the window, late line ignored
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, day(9910)), (2L, day(9880)), (3L, day(9999)), (4L, day(9999)))
      .toDF("l_orderkey", "l_shipdate")
    val r = Relational.orderPriorityCheck(orders, li).collect()
      .map(x => x.getAs[String]("o_orderpriority") ->
        x.getAs[Long]("order_count")).toMap
    assert(r === Map("HIGH" -> 1L, "LOW" -> 1L))
  }

  test("lateLinesByPriority: exact conditional count and ppm floor") {
    val orders = Seq((1L, "HIGH", day(100)), (2L, "LOW", day(100)))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, day(200)), (1L, day(110)), (1L, day(120)), // 1 late of 3
      (2L, day(161)))                                 // 1 late of 1
      .toDF("l_orderkey", "l_shipdate")
    val r = Relational.lateLinesByPriority(orders, li).collect()
      .map(x => x.getAs[String]("o_orderpriority") ->
        (x.getAs[Long]("n_lines"), x.getAs[Long]("n_late"),
          x.getAs[Long]("late_ppm"))).toMap
    assert(r("HIGH") === ((3L, 1L, 333333L)))
    assert(r("LOW") === ((1L, 1L, 1000000L)))
  }

  test("promoRevenueShare: exact e4 units and ppm share in the window") {
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val li = Seq(
      (1L, 10.0, 0.0, day(9862)),  // promo: 1000_00 cents*pct = 100000*100
      (2L, 30.0, 0.0, day(9870)),  // standard
      (1L, 99.0, 0.0, day(9893))) // outside window
      .toDF("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val m = Relational.promoRevenueShare(part, li).collect().head
    assert(m.getAs[Long]("n_lines") === 2L)
    assert(m.getAs[Long]("promo_e4") === 100000L)
    assert(m.getAs[Long]("total_e4") === 400000L)
    assert(m.getAs[Long]("promo_ppm") === 250000L)
  }

  test("bracketRevenue: disjunctive brackets select and attribute exactly") {
    val part = Seq(
      (1L, "Brand#4", 10), (2L, "Brand#2", 20), (3L, "Brand#19", 30),
      (4L, "Brand#4", 40)) // size outside b1
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 100.0, 0.0),   // b1
      (2L, 20.0, 200.0, 0.0),  // b2
      (3L, 30.0, 300.0, 0.0),  // b3
      (4L, 5.0, 999.0, 0.0),   // no bracket (size 40)
      (1L, 45.0, 999.0, 0.0))  // qty outside b1
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val m = Relational.bracketRevenue(part, li).collect().head
    assert(m.getAs[Long]("n_lines") === 3L)
    assert((m.getAs[Long]("b1_lines"), m.getAs[Long]("b2_lines"),
      m.getAs[Long]("b3_lines")) === ((1L, 1L, 1L)))
    assert(m.getAs[Long]("revenue_e4") === (100_00L + 200_00L + 300_00L) * 100L)
  }

  test("mannWhitneyDrift: disjoint supports give AUC 0 or 1e6; midranks halve ties") {
    // a: all length 1 (below), b: all length 3 (above)
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "xxx", "b"), (4L, "xxx", "b"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val r = Relational.mannWhitneyDrift(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("u2"), x.getAs[Long]("auc_ppm"))).toMap
    // source a: R1 = midranks {1.5,1.5} -> 2R1 = 6; 2U = 6 - 2*3 = 0
    assert(r("a") === ((0L, 0L)))
    // source b: R1 = {3.5,3.5} -> 2R1 = 14; 2U = 14 - 6 = 8 = 2*n1*n2
    assert(r("b") === ((8L, 1000000L)))
    // identical distributions: AUC = 1/2 exactly (all ties at one value)
    val same = Seq((1L, "x", "a"), (2L, "x", "b")).toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val r2 = Relational.mannWhitneyDrift(same).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("auc_ppm")).toMap
    assert(r2("a") === 500000L && r2("b") === 500000L)
  }

  test("forecastRevenue: only the in-band lines sum, in exact e4 units") {
    val li = Seq(
      (10.0, 100.0, 0.06, day(9900)),  // in: 1000000 e4... 10000c * 6pct
      (30.0, 100.0, 0.06, day(9000)),  // out: date
      (10.0, 100.0, 0.01, day(9900)),  // out: discount
      (40.0, 100.0, 0.06, day(9900)))  // out: quantity
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    val m = Relational.forecastRevenue(li).collect().head
    assert(m.getAs[Long]("n_lines") === 1L)
    assert(m.getAs[Long]("revenue_e4") === 10000L * 6L)
  }

  test("returnedRevenue: R-lines only, window only, exact e4 per customer") {
    val cust = Seq((1L, 5L), (2L, 6L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 1L, day(9900)), (200L, 2L, day(9000)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (100L, "R", 50.0, 0.0),  // counted: 5000c * 100 = 500000 e4
      (100L, "N", 99.0, 0.0),  // wrong flag
      (200L, "R", 99.0, 0.0))  // order outside window
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val r = Relational.returnedRevenue(cust, orders, li).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("c_custkey") === 1L)
    assert(r.head.getAs[Long]("n_lines") === 1L)
    assert(r.head.getAs[Long]("lost_e4") === 500000L)
  }

  test("bigOrders: the HAVING threshold gates, cents rank the winners") {
    val orders = Seq((1L, 7L, 1000.0), (2L, 8L, 2000.0), (3L, 9L, 99.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val li = Seq(
      (1L, 200.0), (1L, 60.0),  // 260 > 250: qualifies
      (2L, 251.0),              // qualifies
      (3L, 250.0))              // 250 not > 250
      .toDF("l_orderkey", "l_quantity")
    val r = Relational.bigOrders(orders, li).collect()
      .map(x => x.getAs[Long]("o_orderkey") ->
        (x.getAs[Long]("total_qty"), x.getAs[Long]("total_cents")))
    assert(r.toSeq === Seq(2L -> ((251L, 200000L)), 1L -> ((260L, 100000L))))
  }

  test("nationTrade: only cross-pair flows count, per year, both directions") {
    val nation = Seq((1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3"))
      .toDF("n_nationkey", "n_name")
    val cust = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((100L, 1), (200L, 2)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((1000L, 10L), (2000L, 20L), (3000L, 30L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (1000L, 200L, 10.0, 0.0, day(9862)),  // supp N2 -> cust N1: counts
      (2000L, 100L, 20.0, 0.0, day(9862)),  // supp N1 -> cust N2: counts
      (1000L, 100L, 99.0, 0.0, day(9862)),  // same nation: excluded
      (3000L, 100L, 99.0, 0.0, day(9862)))  // cust N3: excluded
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val r = Relational.nationTrade(nation, cust, supp, orders, li).collect()
      .map(x => (x.getAs[String]("supp_nation"), x.getAs[String]("cust_nation")) ->
        (x.getAs[Long]("l_year"), x.getAs[Long]("n_lines"),
          x.getAs[Long]("revenue_e4"))).toMap
    assert(r.size === 2)
    assert(r(("NATION_2", "NATION_1")) === ((27L, 1L, 100000L)))
    assert(r(("NATION_1", "NATION_2")) === ((27L, 1L, 200000L)))
  }

  test("topSupplier: the exact-e4 max keeps every tied winner") {
    val supp = Seq(1L, 2L, 3L).toDF("s_suppkey")
    val li = Seq(
      (1L, 50.0, 0.0, day(9900)), (1L, 50.0, 0.0, day(9901)), // 1: 100.00
      (2L, 100.0, 0.0, day(9900)),                            // 2: 100.00 tie
      (3L, 99.0, 0.0, day(9900)),                             // 3: below
      (2L, 999.0, 0.0, day(100)))                             // outside window
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val r = Relational.topSupplier(supp, li).collect()
      .map(x => x.getAs[Long]("s_suppkey") -> x.getAs[Long]("total_e4")).toMap
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("marketShare: the nation's slice of regional revenue, exact ppm") {
    val region = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = Seq((10L, 1), (30L, 3)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((100L, 1), (200L, 2)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((1000L, 10L), (3000L, 30L)).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (1000L, 100L, 10.0, 0.0, day(9900)),  // ASIA cust, NATION_1 supp
      (1000L, 200L, 30.0, 0.0, day(9900)),  // ASIA cust, other supp
      (3000L, 100L, 99.0, 0.0, day(9900)))  // EUROPE cust: excluded
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val r = Relational.marketShare(region, nation, cust, supp, orders, li)
      .collect()
    assert(r.length === 1)
    val m = r.head
    assert(m.getAs[Long]("l_year") === 27L)
    assert(m.getAs[Long]("nation_e4") === 100000L)
    assert(m.getAs[Long]("total_e4") === 400000L)
    assert(m.getAs[Long]("share_ppm") === 250000L)
  }

  test("cdcApply: one-join merge honors I/U/D, checksum matches expected state") {
    val orders = Seq(
      (7L, 10.0, "O"),   // delete slice
      (11L, 20.0, "O"),  // update slice: price += 5.00
      (31L, 30.0, "F"),  // insert source: re-keyed copy lands, original stays
      (1L, 40.0, "O"))   // untouched
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val r = Relational.cdcApply(orders).collect().head
    assert(r.getAs[Long]("n_before") === 4L)
    assert(r.getAs[Long]("n_inserted") === 1L)
    assert(r.getAs[Long]("n_updated") === 1L)
    assert(r.getAs[Long]("n_deleted") === 1L)
    assert(r.getAs[Long]("n_after") === 4L)
    // checksum equals the hash-sum of the hand-built expected state
    val expected = Seq(
      (11L, 2500L, "O"), (31L, 3000L, "F"),
      (1000000031L, 3000L, "F"), (1L, 4000L, "O"))
      .toDF("k", "price_e2", "status")
      .agg(sum(Relational.rowHash(Seq("k", "price_e2", "status"))))
      .collect().head.getLong(0)
    assert(r.getAs[Long]("state_checksum") === expected)
  }

  test("rankFamily: the four ranking semantics split exactly at ties") {
    val cust = Seq(
      (1L, 100.5, "A"), (2L, 100.2, "A"), (3L, 50.0, "A"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val r = Relational.rankFamily(cust).collect()
      .map(x => x.getAs[Long]("c_custkey") ->
        (x.getAs[Long]("rn"), x.getAs[Long]("rnk"), x.getAs[Long]("drnk"),
          x.getAs[Long]("pr_ppm"))).toMap
    // custkeys 1 and 2 tie at 100 whole dollars
    assert(r(1L) === ((1L, 1L, 1L, 0L)))
    assert(r(2L) === ((2L, 1L, 1L, 0L)))
    assert(r(3L) === ((3L, 3L, 2L, 1000000L)))
  }

  test("incrementalRevenue: old - deletes + inserts equals the recompute") {
    val li = Seq(
      (13L, "A", 10.0, 0.0),  // delete slice (13 % 13 = 0)
      (17L, "A", 20.0, 0.0),  // insert slice
      (1L, "A", 30.0, 0.0))   // untouched
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val r = Relational.incrementalRevenue(li).collect()
    assert(r.length === 1)
    val m = r.head
    assert(m.getAs[Long]("n_maintained") === 2L)
    assert(m.getAs[Long]("rev_maintained_e4") === 500000L)
    assert(m.getAs[Long]("n_direct") === 2L)
    assert(m.getAs[Long]("rev_direct_e4") === 500000L)
    assert(m.getAs[Boolean]("maintained_ok"))
  }

  test("snapshotDiff: added, removed, changed, unchanged each counted once") {
    val orders = Seq(
      (29L, 100.0, "O", "1-URGENT"),  // only in new → added
      (23L, 100.0, "O", "1-URGENT"),  // only in old → removed
      (19L, 100.0, "O", "1-URGENT"),  // price bumped in new → changed
      (1L, 100.0, "O", "1-URGENT"))   // identical → unchanged
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
    val r = Relational.snapshotDiff(orders).collect().head
    assert(r.getAs[Long]("n_added") === 1L)
    assert(r.getAs[Long]("n_removed") === 1L)
    assert(r.getAs[Long]("n_changed") === 1L)
    assert(r.getAs[Long]("n_unchanged") === 1L)
  }

  test("promotionSuppliers: 2x-average shipper, distinct per nation") {
    val nation = Seq((1, "NATION_1"), (2, "NATION_2"))
      .toDF("n_nationkey", "n_name")
    val supp = Seq((100L, 1), (200L, 1), (300L, 2))
      .toDF("s_suppkey", "s_nationkey")
    val part = Seq((1L, "cold widget"), (2L, "cold rod"), (3L, "blue rod"))
      .toDF("p_partkey", "p_name")
    val li = Seq(
      // part 1: total 12 over 3 suppliers (avg 4) — supp 100 ships 9
      // (> 2·avg = 8: dominant); supp 200 ships 2, supp 300 ships 1
      (1L, 100L, 5.0), (1L, 100L, 4.0), (1L, 200L, 2.0), (1L, 300L, 1.0),
      // part 2: 2 suppliers at 8 vs 4 (avg 6) — 8 < 12 = 2·avg: nobody
      (2L, 100L, 8.0), (2L, 300L, 4.0),
      // part 3: wrong name pattern → excluded even though 300 ships all
      (3L, 300L, 9.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val r = Relational.promotionSuppliers(nation, supp, part, li).collect()
      .map(x => x.getAs[String]("n_name") -> x.getAs[Long]("n_suppliers")).toMap
    assert(r === Map("NATION_1" -> 1L))
  }

  test("productProfit: name-contains prune, nation-year rollup") {
    val nation = Seq((1, "NATION_1")).toDF("n_nationkey", "n_name")
    val supp = Seq((100L, 1)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((1L, "cold widget"), (2L, "blue rod"))
      .toDF("p_partkey", "p_name")
    val li = Seq(
      (1L, 100L, 10.0, 0.0, day(9900)),   // widget: counts
      (1L, 100L, 20.0, 0.5, day(9900)),   // widget, 50% discount
      (2L, 100L, 99.0, 0.0, day(9900)))   // rod: excluded
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val r = Relational.productProfit(nation, supp, part, li).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("n_name") === "NATION_1")
    assert(r.head.getAs[Long]("l_year") === 27L)
    assert(r.head.getAs[Long]("n_lines") === 2L)
    // 10.00 → 1000e2·100 = 100000; 20.00 at 50% → 2000e2·50 = 100000
    assert(r.head.getAs[Long]("profit_e4") === 200000L)
  }

  test("partSupplierCounts: distinct pairs, brand exclusion, size bands") {
    val part = Seq((1L, "Brand#4", 5), (2L, "Brand#4", 15), (3L, "Brand#13", 5))
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 100L), (1L, 100L), // duplicate shipped pair collapses
      (1L, 200L), (2L, 100L),
      (3L, 300L))             // excluded brand
      .toDF("l_partkey", "l_suppkey")
    val r = Relational.partSupplierCounts(part, li).collect()
      .map(x => (x.getAs[String]("p_brand"), x.getAs[Long]("size_band")) ->
        (x.getAs[Long]("n_parts"), x.getAs[Long]("n_suppliers"))).toMap
    assert(r === Map(("Brand#4", 0L) -> ((1L, 2L)), ("Brand#4", 1L) -> ((1L, 1L))))
  }
}
