package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closes the WindowExec warning list (VERDICT r13 #8): Spark warns "No
  * Partition Defined for Window" on every unpartitioned window, and the
  * library's standing claim is that each such site is METADATA-bounded —
  * its input is dimensions (days, buckets, types, top-k), never facts.
  * This spec makes the claim mechanical: for every registered query that
  * owns a global-window site, it extracts each unpartitioned Window's
  * input frame from the optimized plan
  * ([[org.apache.spark.sql.graft.shim.globalWindowInputs]]), counts it,
  * and asserts the count against the site's documented bound computed
  * from the same data. A site rewrite that loses the bound — or a new
  * global window sneaking into one of these queries — fails here, not in
  * a code-review argument.
  *
  * Inventory (every `Window.orderBy`/`Window.partitionBy()` in main
  * source): skyline thr (Relational:~807), rangeJoinNeighbors (:~895),
  * randomizedResponse (:~1105), aucRankSum (:~1566), mannWhitneyDrift
  * (:~2282), groupKFold (TrainingMix:~482), reachFromDaily
  * (TimeWindows:~519), churnHazard (:~816), rrfFusion (Corpus:~1475),
  * otsu (Multimodal:~359,370), compactionPlan (ZOrder:~269).
  */
class GlobalWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def windowInputCounts(name: String): Seq[Long] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val ins = org.apache.spark.sql.graft.shim.globalWindowInputs(df)
    assert(ins.nonEmpty,
      s"$name no longer has a global window — update the inventory")
    ins.map(_.count())
  }

  private def assertBounded(name: String, bound: Long): Unit = {
    val counts = windowInputCounts(name)
    counts.foreach(c =>
      assert(c <= bound, s"$name: global window reads $c rows > bound $bound"))
  }

  private lazy val events = Tables.events(spark, sf)
  private lazy val docs = Tables.documents(spark, sf)

  test("q159_skyline: threshold window over <= `buckets` rows") {
    assertBounded("q159_skyline", 1024L)
  }

  test("q47_range_join: histogram window over the value DOMAIN, not the events") {
    val domain = events
      .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .distinct().count()
    assertBounded("q47_range_join", domain)
  }

  test("q229_randomized_response: index window over |event types|") {
    // the window's frame is barriered at construction (invisible in the
    // registered query's final plan) — count the pre-barrier seam instead
    val types = events.select("event_type").distinct().count()
    val ins = org.apache.spark.sql.graft.shim.globalWindowInputs(
      graft.operators.Relational.typesIndexed(events))
    assert(ins.nonEmpty)
    ins.foreach(df => assert(df.count() <= types))
  }

  test("q208_auc_popularity: rank-sum window over |distinct scores|") {
    val scores = EntryHelpers.ratingsDf(spark, sf)
      .groupBy("productId").agg(count(lit(1)).as("score"))
      .select("score").distinct().count()
    assertBounded("q208_auc_popularity", scores)
  }

  test("q236_mann_whitney: rank scaffold over |distinct lengths|") {
    val lens = docs.select("n_chars").distinct().count()
    assertBounded("q236_mann_whitney", lens)
  }

  test("q272_group_kfold: leak-audit window over k folds") {
    assertBounded("q272_group_kfold", 8L)
  }

  test("q112_user_reach: cumulative window over |days|") {
    val days = events
      .select(expr("unix_micros(ts) div 86400000000").as("d")).distinct().count()
    assertBounded("q112_user_reach", days)
  }

  test("q164_churn_hazard: both hazard windows over |days|") {
    val days = events
      .select(expr("unix_micros(ts) div 86400000000").as("d")).distinct().count()
    assertBounded("q164_churn_hazard", days)
  }

  test("q258_rrf_fusion: rank windows over <= top-k rows") {
    assertBounded("q258_rrf_fusion", 20L)
  }

  test("q168_otsu: threshold scan over the 8-bit gray domain") {
    assertBounded("q168_otsu", 256L)
  }

  test("q162_compaction_plan: packing window over |sources| x buckets segments") {
    val sources = docs.select("source").distinct().count()
    assertBounded("q162_compaction_plan", sources * 64L)
  }
}
