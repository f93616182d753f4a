package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco

class RecoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topProducts honors HAVING and K, ordered desc with id tiebreak") {
    val top = Reco.topProducts(Tables.ratings(spark, TestSpark.sf)).collect()
    assert(top.length <= 20)
    assert(top.forall(_.getAs[Long]("cnt") > 10))
    val avgs = top.map(_.getAs[Double]("avg_rating"))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b })
  }

  test("coRatingPairs emits C(k,2) canonical pairs per product") {
    val r = Seq((1L, 10L, 5.0), (2L, 10L, 4.0), (3L, 10L, 5.0), (4L, 20L, 5.0))
      .toDF("userId", "productId", "rating")
    val pairs = Reco.coRatingPairs(r).as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("skew guard: maxRatersPerProduct bounds a viral product at C(cap,2) pairs") {
    // one viral product, 1000 raters — the reference's unguarded per-group
    // pair loop (Recommendations.java:164-168) would buffer C(1000,2) =
    // 499500 pairs in one group. The cap keeps the k smallest userIds, so
    // the worst bucket is bounded at C(cap,2) regardless of k.
    val viral = spark.range(0, 1000)
      .select(col("id").as("userId"), lit(7L).as("productId"), lit(5.0).as("rating"))
    val capped = Reco.coRatingPairs(viral, maxRatersPerProduct = Some(50))
      .as[(Long, Long)].collect()
    assert(capped.length === 50 * 49 / 2)
    assert(capped.forall { case (s, d) => s < 50 && d < 50 && s < d })
    // and uncapped really is quadratic — the thing the guard prevents
    assert(Reco.coRatingPairs(viral).count() === 1000L * 999 / 2)
  }

  test("skew guard: cap is a no-op below the cap — identical pairs on unskewed data") {
    // every product has <= 5 raters, cap = 5: the capped run must be
    // byte-identical to the uncapped semantic, so enabling the guard on a
    // healthy corpus costs nothing in results
    val r = (0 until 200).map { i =>
      (i.toLong % 40, i.toLong / 5, 5.0) // 40 products x exactly 5 raters
    }.toDF("userId", "productId", "rating")
    val capped = Reco.coRatingPairs(r, Some(5)).as[(Long, Long)].collect().toSet
    val open = Reco.coRatingPairs(r).as[(Long, Long)].collect().toSet
    assert(capped === open)
    assert(open.nonEmpty)
  }

  test("skew guard: AQE splits the hot co-rating product across tasks") {
    // moderate skew BELOW any cap: one product with 3000 raters among 100
    // products of 10. With AQE skew-join thresholds scaled to this fixture
    // the hot productId partition must be split (skew=true in the final
    // plan) instead of one straggler task computing all C(3000,2) pairs.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-scaled thresholds: the hot partition's shuffle bytes
      // (~3000 rows) must exceed both factor×median and the floor
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      val hot = spark.range(0, 3000)
        .select(col("id").as("userId"), lit(0L).as("productId"), lit(5.0).as("rating"))
      // 100 cold products x 10 raters, user ranges disjoint per product and
      // from the hot product (the final pair distinct() dedups ACROSS
      // products, so shared users would collapse cold pairs into hot ones)
      val cold = spark.range(0, 1000)
        .select(expr("10000 + (id % 100) * 10 + (id div 100)").as("userId"),
          (col("id") % 100 + 1).as("productId"), lit(5.0).as("rating"))
      // collect() a 1-row aggregate OVER the pair join and inspect that
      // same execution: its AdaptiveSparkPlan finalizes (df.count()/rdd
      // actions build a separate query execution whose plan never mutates)
      val counted = Reco.coRatingPairs(hot.unionAll(cold)).agg(count(lit(1)).as("n"))
      val n = counted.collect().head.getLong(0)
      assert(n === 3000L * 2999 / 2 + 100L * 45) // C(3000,2) + 100·C(10,2)
      val plan = counted.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot product partition:\n$plan")
      // task-size spread note: without the split, one task computes all
      // C(3000,2) = 4 498 500 hot pairs while the median task emits ~45;
      // the AQEShuffleRead lines record how many sub-tasks AQE carved the
      // hot productId partition into
      plan.linesIterator
        .filter(l => l.contains("skew=true") || l.contains("AQEShuffleRead"))
        .foreach(l => info(l.trim))
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("undirected closure is symmetric") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val u = Reco.undirected(e).as[(Long, Long)].collect().toSet
    assert(u === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("recommendations never contain a product the user already rated") {
    val labels = Seq((1L, 99L), (2L, 99L)).toDF("id", "label")
    val ratings = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L))
      .toDF("userId", "productId")
    val recs = Reco.recommendations(labels, ratings)
      .select($"userId", explode($"recommendedProducts").as("p"))
      .as[(Long, Long)].collect()
    // user 1 already rated 10,11 -> only 12 can be recommended; user 2 -> only 10
    assert(recs.toSet === Set((1L, 12L), (2L, 10L)))
  }

  test("sampleSplit buckets partition the filtered input exactly") {
    val s = Reco.sampleSplit(Tables.ratings(spark, TestSpark.sf))
    val total = Tables.ratings(spark, TestSpark.sf).where($"userId" < 1000).count()
    val byBucket = s.groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(byBucket.values.sum === total)
    assert(byBucket.keySet.subsetOf(Set(0, 1)))
  }

  test("seededSplit is a reproducible multiset complement (spliter.py parity)") {
    val ratings = Tables.ratings(spark, TestSpark.sf)
    val base = ratings.where($"userId" < 1000)
    val (db, stream) = Reco.seededSplit(ratings)
    val total = base.count()
    assert(db.count() + stream.count() === total)
    // multiset identity: base \ db \ stream = ∅ and db ⊎ stream covers base
    assert(base.exceptAll(db).exceptAll(stream).count() === 0)
    assert(db.unionAll(stream).exceptAll(base).count() === 0)
    // same seed → same membership (deterministic resample)
    val (db2, _) = Reco.seededSplit(ratings)
    assert(db.exceptAll(db2).count() === 0 && db2.exceptAll(db).count() === 0)
    // sampled fraction lands near 0.7
    val frac = db.count().toDouble / total
    assert(math.abs(frac - 0.7) < 0.05, s"fraction drifted: $frac")
  }

  test("itemNeighbors: hand-computed cosines, support filter, symmetric lists") {
    import spark.implicits._
    // u1 and u2 co-rate (A=100, B=200); u2 and u3 co-rate (B, C=300);
    // A-C is co-rated only by nobody twice -> dropped by minSupport=2
    val ratings = Seq(
      (1L, 100L, 2.0), (1L, 200L, 4.0),
      (2L, 100L, 2.0), (2L, 200L, 4.0), (2L, 300L, 1.0),
      (3L, 200L, 4.0), (3L, 300L, 1.0))
      .toDF("userId", "productId", "rating")
    val r = graft.operators.Reco.itemNeighbors(ratings).collect()
      .map(x => (x.getAs[Long]("item"), x.getAs[Long]("neighbor")) ->
        (x.getAs[Long]("dot"), x.getAs[Long]("support"), x.getAs[Double]("cos")))
      .toMap
    // pairs survive in both directions; the unsupported A-C pair is absent
    assert(r.keySet === Set((100L, 200L), (200L, 100L), (200L, 300L), (300L, 200L)))
    // A-B: dot = 2*4 + 2*4 = 16, support 2; norms: A 8, B 48
    val (d, s, c) = r((100L, 200L))
    assert(d === 16L && s === 2L)
    assert(math.abs(c - 16.0 / math.sqrt(8.0 * 48.0)) < 1e-12)
    // B-C: dot = 4 + 4 = 8, support 2; norms: B 48, C 2
    assert(r((200L, 300L))._1 === 8L)
    assert(math.abs(r((200L, 300L))._3 - 8.0 / math.sqrt(48.0 * 2.0)) < 1e-12)
  }

  test("cfPredictions: unrated items score via rated neighbors; saturated users get none") {
    import spark.implicits._
    val ratings = Seq(
      (1L, 100L, 2.0), (1L, 200L, 4.0),
      (2L, 100L, 2.0), (2L, 200L, 4.0), (2L, 300L, 1.0),
      (3L, 200L, 4.0), (3L, 300L, 1.0))
      .toDF("userId", "productId", "rating")
    val p = graft.operators.Reco.cfPredictions(ratings).collect()
      .map(x => (x.getAs[Long]("userId"), x.getAs[Long]("item")) ->
        x.getAs[Double]("pred")).toMap
    // u1 lacks C (neighbor of B, rated 4) -> pred 4.0 from the single
    // neighbor; u3 lacks A (neighbor of B) -> pred 4.0; u2 rated all
    assert(p.keySet === Set((1L, 300L), (3L, 100L)))
    assert(p((1L, 300L)) === 4.0 && p((3L, 100L)) === 4.0)
  }

  test("negativeSampling: never rated, bounded per user, deterministic") {
    // user 1 rated 9 of 10 products -> negatives can only be product 10;
    // user 2 rated only product 10 -> negatives never include 10
    val ratings = ((1L to 9L).map(p => (1L, p, 5.0)) :+ ((2L, 10L, 5.0)))
      .toDF("userId", "productId", "rating")
    val run1 = graft.operators.Reco.negativeSampling(ratings, nCand = 16, k = 5)
      .collect().map(x => (x.getAs[Long]("userId"),
        x.getAs[Long]("neg_productId"), x.getAs[Long]("cand_index")))
    val rated = Set((1L to 9L).map((1L, _)): _*) + ((2L, 10L))
    assert(run1.forall { case (u, p, _) => !rated((u, p)) },
      "a sampled negative must not be a rated pair")
    assert(run1.forall { case (_, p, _) => p >= 1L && p <= 10L })
    assert(run1.groupBy(_._1).forall(_._2.length <= 5))
    assert(run1.filter(_._1 == 1L).forall(_._2 == 10L))
    assert(run1.exists(_._1 == 2L), "16 draws over 10 products reach user 2")
    val run2 = graft.operators.Reco.negativeSampling(ratings, nCand = 16, k = 5)
      .collect().map(x => (x.getAs[Long]("userId"),
        x.getAs[Long]("neg_productId"), x.getAs[Long]("cand_index")))
    assert(run1.sorted.toSeq === run2.sorted.toSeq, "hash draws are reproducible")
  }

  test("basketLift: exact support/population lift over the shared pair table") {
    // u1:{A,B}, u2:{A,B}, u3:{A,C}: only (A,B) clears minSupport=2;
    // lift = support*N/(ca*cb) = 2*3/(3*2) = 1.0
    val ratings = Seq(
      (1L, 1L, 5.0), (1L, 2L, 5.0), (2L, 1L, 5.0),
      (2L, 2L, 5.0), (3L, 1L, 5.0), (3L, 3L, 5.0))
      .toDF("userId", "productId", "rating")
    val ded = graft.operators.Reco.dedupedRatings(ratings)
    val r = graft.operators.Reco.basketLift(ded,
      graft.operators.Reco.itemPairs(ded)).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("pa") === 1L && row.getAs[Long]("pb") === 2L)
    assert(row.getAs[Long]("support") === 2L)
    assert(row.getAs[Long]("ca") === 3L && row.getAs[Long]("cb") === 2L)
    assert(row.getAs[Long]("n_users") === 3L)
    assert(row.getAs[Double]("lift") === 1.0)
  }

  test("calibrationCurve: honest holdout, monotone deciles, exact gaps") {
    val ratings = graft.Tables.ratings(spark, TestSpark.sf)
    val r = graft.operators.Reco.calibrationCurve(ratings).collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(r.length >= 2, "the decile table must have several buckets")
    r.foreach { x =>
      assert(x.getAs[Long]("gap_micro") ===
        x.getAs[Long]("mean_pred_micro") - x.getAs[Long]("mean_actual_micro"))
      assert(x.getAs[Long]("n_pairs") > 0L)
      // item means live in the rating range [1, 5] in micro units
      assert(x.getAs[Long]("mean_pred_micro") >= 1000000L)
      assert(x.getAs[Long]("mean_pred_micro") <= 5000000L)
    }
    // buckets partition by predicted value: means must be nondecreasing
    val preds = r.map(_.getAs[Long]("mean_pred_micro"))
    assert(preds.zip(preds.tail).forall { case (a, b) => a <= b },
      s"decile mean predictions not monotone: ${preds.mkString(",")}")
    // the holdout is disjoint from training by construction: re-running
    // is deterministic
    val again = graft.operators.Reco.calibrationCurve(ratings).collect()
      .map(_.toString).sorted
    assert(again.toSeq === r.map(_.toString).sorted.toSeq)
  }

  test("alsRankOneStep: hand-folded integer alternation matches the plan") {
    val ratings = Seq((1L, 10L, 4.0), (1L, 20L, 2.0), (2L, 10L, 5.0))
      .toDF("userId", "productId", "rating")
    val out = graft.operators.Reco.alsRankOneStep(ratings).collect()
      .map(r => r.getAs[Long]("productId") -> r).toMap
    assert(out.keySet === Set(10L, 20L))
    // recover the hash-seeded item factors the operator derived, then
    // re-run the alternation by hand with plain BigInt arithmetic
    val v = out.map { case (p, r) => p -> r.getAs[Long]("v0") }
    assert(v.values.forall(x => x >= 1L && x <= 1000L))
    val rv = Map((1L, 10L) -> 4L, (1L, 20L) -> 2L, (2L, 10L) -> 5L)
    def uMicro(u: Long): Long = {
      val its = rv.keys.filter(_._1 == u).toSeq
      val num = its.map(k => rv(k) * v(k._2)).sum
      val den = its.map(k => v(k._2) * v(k._2)).sum
      num * 1000000L / den
    }
    val expNum = Map(10L -> (4L * uMicro(1) + 5L * uMicro(2)),
      20L -> 2L * uMicro(1))
    val expDen = Map(
      10L -> (uMicro(1) * uMicro(1) + uMicro(2) * uMicro(2)),
      20L -> uMicro(1) * uMicro(1))
    out.foreach { case (p, r) =>
      // the surfaced value is the exact BIGINT micro-unit floor of the
      // hand-folded num/den alternation (no DECIMAL/float column)
      val vNewMicro = r.getAs[Long]("v_new_micro")
      assert(vNewMicro ===
        (BigInt(expNum(p)) * 1000000 / BigInt(expDen(p))).toLong)
      assert(vNewMicro > 0L)
    }
  }

  test("slopeOnePredictions: hand-derived deviations, supports, and top picks") {
    // u1: A=5 B=3 | u2: A=4 B=2 C=1 | u3: B=4 C=2   (ids A=1 B=2 C=3)
    val ratings = Seq(
      (1L, 1L, 5.0), (1L, 2L, 3.0),
      (2L, 1L, 4.0), (2L, 2L, 2.0), (2L, 3L, 1.0),
      (3L, 2L, 4.0), (3L, 3L, 2.0))
      .toDF("userId", "productId", "rating")
    val deduped = Reco.dedupedRatings(ratings)
    val pairs = Reco.itemPairs(deduped)
    // pair (A,B): co-raters u1,u2 -> dsum = (5-3)+(4-2) = 4, support 2
    // pair (B,C): co-raters u2,u3 -> dsum = (2-1)+(4-2) = 3, support 2
    // pair (A,C): support 1 -> dropped by minSupport
    val pm = pairs.collect()
      .map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb")) ->
        (x.getAs[Long]("dsum"), x.getAs[Long]("support"))).toMap
    assert(pm === Map((1L, 2L) -> ((4L, 2L)), (2L, 3L) -> ((3L, 2L))))
    val out = Reco.slopeOnePredictions(deduped, pairs).collect()
      .map(x => (x.getAs[Long]("userId"), x.getAs[Long]("item")) ->
        (x.getAs[Long]("num"), x.getAs[Long]("den"), x.getAs[Double]("pred"))).toMap
    // u1 -> C via base B: dev(C,B) = -3, num = -3 + 3*2 = 3, den 2, pred 1.5
    // u3 -> A via base B: dev(A,B) = +4, num = 4 + 4*2 = 12, den 2, pred 6.0
    // u2 rated everything -> no rows
    assert(out === Map(
      (1L, 3L) -> ((3L, 2L, 1.5)),
      (3L, 1L) -> ((12L, 2L, 6.0))))
  }

  test("hitRateEval: sane metric row, and an all-test split can never hit") {
    val deduped = Reco.dedupedRatings(graft.Tables.ratings(spark, TestSpark.sf))
    val r = Reco.hitRateEval(deduped).collect().head
    val (nTest, nHits) = (r.getAs[Long]("n_test"), r.getAs[Long]("n_hits"))
    assert(nTest > 0L)
    assert(nHits >= 0L && nHits <= nTest)
    assert(r.getAs[Long]("hit_rate_ppm") === nHits * 1000000L / nTest)
    assert(r.getAs[Long]("n_test_users") <= nTest)
    // testMod=1 -> empty train -> the model cannot leak a single hit
    val leak = Reco.hitRateEval(deduped, testMod = 1).collect().head
    assert(leak.getAs[Long]("n_hits") === 0L)
    assert(leak.getAs[Long]("n_test") > nTest)
  }

  test("conformalEval: zero nonconformity gives q=0 and full coverage") {
    // every test rating equals its item's train mean → nc ≡ 0 everywhere,
    // so the calibration quantile is 0 and eval coverage is exactly 1
    val split = ((1L to 40L).map(u => (u, 100L, 4L, false)) ++  // train: mean 4
      (41L to 80L).map(u => (u, 100L, 4L, true)))               // test: rv = mean
      .toDF("userId", "productId", "rv", "is_test")
    val m = Reco.conformalEval(split).collect().head
    assert(m.getAs[Long]("q_micro") === 0L)
    assert(m.getAs[Long]("coverage_ppm") === 1000000L)
    assert(m.getAs[Long]("n_cal") + m.getAs[Long]("n_eval") === 40L)
    assert(m.getAs[Long]("target_ppm") === 900000L)
  }

  test("recCoverage: coverage counts distinct items, lift vs catalog mean") {
    // catalog {1,2,3} with counts 2,1,1; recs hit items 1 and 2
    val deduped = Seq((1L, 1L, 5L), (2L, 1L, 4L), (1L, 2L, 3L), (2L, 3L, 2L))
      .toDF("userId", "productId", "rv")
    val preds = Seq((9L, 1L), (9L, 2L)).toDF("userId", "item")
    val m = Reco.recCoverage(deduped, preds).collect().head
    assert(m.getAs[Long]("catalog_size") === 3L)
    assert(m.getAs[Long]("n_ratings") === 4L)
    assert(m.getAs[Long]("n_distinct_items") === 2L)
    assert(m.getAs[Long]("coverage_ppm") === 666666L)
    // rec pop sum 2+1=3 over 2 recs vs catalog mean 4/3 → 9/8
    assert(m.getAs[Long]("pop_lift_ppm") === 1125000L)
  }

  test("mrrFromRanked: best-rank reciprocals in micro units, misses score 0") {
    // user 1 hits at rank 2 (500000), user 2 misses, user 3 at rank 1
    val split = Seq(
      (1L, 100L, 5L, true), (2L, 200L, 5L, true), (3L, 300L, 5L, true),
      (1L, 101L, 4L, false)) // train row — must not affect the metric
      .toDF("userId", "productId", "rv", "is_test")
    val ranked = Seq(
      (1L, 900L, 1L), (1L, 100L, 2L),
      (2L, 900L, 1L),
      (3L, 300L, 1L), (3L, 900L, 2L))
      .toDF("userId", "item", "rn")
    val m = Reco.mrrFromRanked(split, ranked).collect().head
    assert(m.getAs[Long]("n_test_users") === 3L)
    assert(m.getAs[Long]("n_hit_users") === 2L)
    assert(m.getAs[Long]("rr_micro_sum") === 1500000L)
    assert(m.getAs[Long]("mrr_micro") === 500000L)
  }

  test("ndcgFromRanked: discounted hits over ideal, misses stay in the mean") {
    // user 1: held-out {100, 101}, hit only 100 at rank 2 → dcg = w(2),
    // idcg = prefix(2); user 2: one held-out item, missed → ndcg 0
    val split = Seq(
      (1L, 100L, 5L, true), (1L, 101L, 5L, true), (2L, 200L, 5L, true),
      (1L, 102L, 4L, false)) // train row — must not affect the metric
      .toDF("userId", "productId", "rv", "is_test")
    val ranked = Seq(
      (1L, 900L, 1L), (1L, 100L, 2L),
      (2L, 900L, 1L))
      .toDF("userId", "item", "rn")
    val m = Reco.ndcgFromRanked(split, ranked).collect().head
    val expected = graft.operators.NdcgWeights.micro(1) * 1000000L /
      graft.operators.NdcgWeights.prefix(1)
    assert(m.getAs[Long]("n_test_users") === 2L)
    assert(m.getAs[Long]("ndcg_ppm_sum") === expected)
    assert(m.getAs[Long]("ndcg_mean_ppm") === expected / 2L)
    // perfect ranking scores exactly 1e6
    val perfect = Reco.ndcgFromRanked(
      Seq((1L, 100L, 5L, true)).toDF("userId", "productId", "rv", "is_test"),
      Seq((1L, 100L, 1L)).toDF("userId", "item", "rn")).collect().head
    assert(perfect.getAs[Long]("ndcg_mean_ppm") === 1000000L)
  }

  test("itemPairsWithHoldout: one fan-out reproduces both pair tables exactly") {
    // the combined frame's full columns must equal itemPairs(deduped)
    // and its *_train columns (filtered to support_train >= 2) must
    // equal itemPairs(train) — the q201 seam's correctness contract
    val ratings = graft.Tables.ratings(spark, TestSpark.sf)
    val deduped = Reco.dedupedRatings(ratings)
    val split = Reco.holdoutSplit(deduped)
    val combined = Reco.itemPairsWithHoldout(split).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) -> r).toMap

    val full = Reco.itemPairs(deduped).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) ->
        (r.getAs[Long]("dot"), r.getAs[Long]("support"), r.getAs[Long]("dsum")))
      .toMap
    assert(combined.keySet === full.keySet)
    full.foreach { case (k, (d, s, ds)) =>
      val c = combined(k)
      assert((c.getAs[Long]("dot"), c.getAs[Long]("support"),
        c.getAs[Long]("dsum")) === ((d, s, ds)), s"full mismatch at $k")
    }

    val train = Reco.itemPairs(
      split.where(!col("is_test")).select("userId", "productId", "rv"))
      .collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) ->
        (r.getAs[Long]("dot"), r.getAs[Long]("support"), r.getAs[Long]("dsum")))
      .toMap
    val combinedTrain = combined.collect {
      case (k, c) if c.getAs[Long]("support_train") >= 2L =>
        k -> (c.getAs[Long]("dot_train"), c.getAs[Long]("support_train"),
          c.getAs[Long]("dsum_train"))
    }
    assert(combinedTrain === train)
  }

  test("intraListDiversity: exact cos^2 ppm means over the rec-pair grid") {
    // user 1 recommended items {10, 20}; pair (10, 20) has dot 6,
    // s2(10) = 9, s2(20) = 4 -> cos^2 = 36/36 = 1 -> 1e6 ppm.
    // user 2 recommended {10, 30}; (10, 30) not co-rated -> 0.
    val deduped = Seq((7L, 10L, 3L), (8L, 20L, 2L), (9L, 30L, 5L))
      .toDF("userId", "productId", "rv")
    val preds = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 30L))
      .toDF("userId", "item")
    val pairs = Seq((10L, 20L, 6L, 2L)).toDF("pa", "pb", "dot", "support")
    val m = Reco.intraListDiversity(deduped, preds, pairs).collect().head
    assert(m.getAs[Long]("n_users") === 2L)
    assert(m.getAs[Long]("n_rec_pairs") === 2L)
    assert(m.getAs[Long]("n_corated_pairs") === 1L)
    assert(m.getAs[Long]("mean_cos2_ppm") === 500000L) // (1e6 + 0) / 2
  }

  test("cfCapReport: an un-binding cap reproduces the exact chain exactly") {
    val deduped = Reco.dedupedRatings(graft.Tables.ratings(spark, TestSpark.sf))
    val pairs = Reco.itemPairs(deduped)
    val nb = Reco.itemNeighborsFromPairs(deduped, pairs)
    val preds = Reco.cfPredictionsFrom(deduped, nb)
    // cap far above any user's degree: the capped chain IS the exact chain
    val r = Reco.cfCapReport(deduped, pairs, nb, preds, cap = 1 << 20).head()
    assert(r.getAs[Long]("n_pairs_capped") === r.getAs[Long]("n_pairs_exact"))
    assert(r.getAs[Long]("n_nb_inter") === r.getAs[Long]("n_nb_exact"))
    assert(r.getAs[Long]("nb_precision_ppm") === 1000000L)
    assert(r.getAs[Long]("nb_recall_ppm") === 1000000L)
    assert(r.getAs[Long]("rec_overlap_ppm") === 1000000L)
    assert(r.getAs[Long]("drift_micro_sum") === 0L)
    assert(r.getAs[Long]("n_pairs_exact") > 0L)
  }

  test("cfCapReport: a binding cap bounds the pair table and reports sane ppms") {
    val deduped = Reco.dedupedRatings(graft.Tables.ratings(spark, TestSpark.sf))
    val pairs = Reco.itemPairs(deduped)
    val nb = Reco.itemNeighborsFromPairs(deduped, pairs)
    val preds = Reco.cfPredictionsFrom(deduped, nb)
    val r = Reco.cfCapReport(deduped, pairs, nb, preds, cap = 4).head()
    assert(r.getAs[Long]("n_pairs_capped") < r.getAs[Long]("n_pairs_exact"))
    val prec = r.getAs[Long]("nb_precision_ppm")
    val rec = r.getAs[Long]("nb_recall_ppm")
    assert(prec >= 0L && prec <= 1000000L)
    assert(rec >= 0L && rec <= 1000000L)
    assert(r.getAs[Long]("n_common_rec") <= r.getAs[Long]("n_rec_exact"))
  }
}
