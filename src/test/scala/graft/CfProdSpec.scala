package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco

/** The degree-capped CF PRODUCTION forms (RecoRegistry.prodQueries) must
  * stay within the quality envelope q280 graded for the cap: the capped
  * chain differs from the exact one ONLY in which rating rows feed pair
  * generation, and these specs pin (a) the cap mechanism itself, (b) the
  * q280-floor fidelity of the capped neighbors/recommendations at the
  * production cap, and (c) that the holdout metrics the capped retrain
  * produces stay within a few percent of the exact ones. This is what
  * lets the capped bench totals (`SPARK_GRAFT_SKETCH_PROD=1`) stand in
  * for the exact family at 100 TB without their own DuckDB oracles.
  */
class CfProdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sf = TestSpark.sf
  private lazy val deduped = EntryHelpers.cfDeduped(spark, sf)

  test("capRatings: at most cap rows per user, all drawn from the input") {
    val capped = Reco.capRatings(deduped, cap = 8)
    val over = capped.groupBy("userId").count().where(col("count") > 8).count()
    assert(over === 0)
    // subset: every capped row exists verbatim in the deduped table
    assert(capped.exceptAll(deduped.select("userId", "productId", "rv")).count() === 0)
    // the cap BINDS on this data (otherwise the suite proves nothing)
    assert(capped.count() < deduped.count())
  }

  test("capRatings (ExactTopK aggregate) equals the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val cap = 8
    val viaWindow = deduped
      .withColumn("crn", row_number().over(
        Window.partitionBy("userId").orderBy(desc("rv"), asc("productId"))))
      .where(col("crn") <= cap).select("userId", "productId", "rv")
    val viaAgg = Reco.capRatings(deduped, cap)
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
    // split variant: is_test packs through the payload's low bit unchanged
    val split = EntryHelpers.holdoutSplitDf(spark, sf)
    val capped = Reco.capRatings(split, cap)
    assert(capped.columns.toSeq === split.columns.toSeq)
    assert(capped.exceptAll(split).count() === 0) // rows drawn verbatim
  }

  test("capRatings keeps each user's highest ratings (rv DESC, productId ASC)") {
    val cap = 8
    val capped = Reco.capRatings(deduped, cap)
    // for every user, the minimum kept (rv, -productId) dominates every
    // dropped row under the same order — i.e. the kept set is exactly the
    // per-user top-`cap` prefix of the shared total order
    val dropped = deduped.select("userId", "productId", "rv")
      .exceptAll(capped)
    val worstKept = capped.groupBy("userId")
      .agg(min(struct(col("rv"), (-col("productId")).as("np"))).as("wk"))
    val bad = dropped.join(worstKept, "userId")
      .where(struct(col("rv"), (-col("productId")).as("np")) > col("wk"))
    assert(bad.count() === 0)
  }

  test("production cap meets the q280 quality floors on this corpus") {
    val rep = Reco.cfCapReport(deduped,
      EntryHelpers.cfPairs(spark, sf),
      EntryHelpers.cfNeighbors(spark, sf),
      EntryHelpers.cfPreds(spark, sf)).head()
    assert(rep.getAs[Long]("cap") === Reco.CfPairCap.toLong)
    // the capped pair table must actually be smaller (the cost the cap buys)
    assert(rep.getAs[Long]("n_pairs_capped") <= rep.getAs[Long]("n_pairs_exact"))
    // q280 graded 98.7% / 98.6% at sf0.01; floors at 95% leave room for
    // corpus-to-corpus variation without letting a broken cap pass
    assert(rep.getAs[Long]("nb_precision_ppm") >= 950000L)
    assert(rep.getAs[Long]("nb_recall_ppm") >= 950000L)
    assert(rep.getAs[Long]("rec_overlap_ppm") >= 950000L)
    // common recommendations must not drift: q280 measured exactly 0
    assert(rep.getAs[Long]("drift_micro_sum") === 0L)
  }

  test("capped prod neighbors equal itemNeighborsFromPairs over capRatings") {
    // the registry seam must be the same computation as the graded report's
    // capped chain — not a reimplementation that could diverge
    val viaSeam = EntryHelpers.cfNeighborsCapped(spark, sf)
      .select("item", "neighbor")
    val direct = Reco.itemNeighborsFromPairs(deduped,
        Reco.itemPairs(Reco.capRatings(deduped)))
      .select("item", "neighbor")
    assert(viaSeam.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaSeam).count() === 0)
    assert(viaSeam.count() > 0)
  }

  test("capped holdout metrics stay within 5% of the exact ones") {
    val split = EntryHelpers.holdoutSplitDf(spark, sf)
    val exact = Reco.hitRateFromRanked(split,
      EntryHelpers.holdoutRanked(spark, sf)).head()
    val capped = Reco.hitRateFromRanked(split,
      EntryHelpers.holdoutRankedCapped(spark, sf)).head()
    // identical denominators: the cap never touches the split or test set
    assert(capped.getAs[Long]("n_test") === exact.getAs[Long]("n_test"))
    assert(capped.getAs[Long]("n_test_users") === exact.getAs[Long]("n_test_users"))
    val he = exact.getAs[Long]("n_hits").toDouble
    val hc = capped.getAs[Long]("n_hits").toDouble
    assert(math.abs(hc - he) <= math.max(1.0, 0.05 * he),
      s"capped hits $hc vs exact $he")
    val me = Reco.mrrFromRanked(split,
      EntryHelpers.holdoutRanked(spark, sf)).head().getAs[Long]("mrr_micro").toDouble
    val mc = Reco.mrrFromRanked(split,
      EntryHelpers.holdoutRankedCapped(spark, sf)).head().getAs[Long]("mrr_micro").toDouble
    assert(math.abs(mc - me) <= math.max(1000.0, 0.05 * me),
      s"capped mrr_micro $mc vs exact $me")
  }

  test("cap mechanism on a SKEWED (zipf-head) corpus: bites hard, report coherent") {
    // the plain ScaleUp derivation is degree-scale-invariant by
    // construction, so the cap never binds hard there; this fixture
    // reassigns 20% of replica orders onto a 20-user zipf head (ScaleUp
    // skew mode) so per-user degree explodes and the cap actually cuts.
    //
    // DELIBERATELY NO 95% quality floors here: on a ~600-product fixture
    // the head users' co-rating pairs clear the min-support filter and
    // carry real signal, so extreme-skew capping measurably costs quality
    // (measured: nb precision/recall ~71%, rec overlap ~54% at this skew)
    // — an honest property of the cap, not a bug. On a production-shaped
    // corpus (sf10-skew: 2M products, 0.5% zipf mass) a head user's pair
    // draws are support-1 noise the min-support filter discards anyway,
    // so the cap removes COST, not signal — that operating point is
    // graded by the q280 report in the round's BENCH_cf_*_sf10_skew
    // artifacts, not by this fixture.
    val dir = java.nio.file.Files.createTempDirectory("graft-cf-skew").toString
    ScaleUp.derive(spark, sf, dir, reps = 3, skew = Some((20, 200)))
    val ded = EntryHelpers.cfDeduped(spark, dir)
    val rep = Reco.cfCapReport(ded,
      EntryHelpers.cfPairs(spark, dir),
      EntryHelpers.cfNeighbors(spark, dir),
      EntryHelpers.cfPreds(spark, dir)).head()
    info(s"skewed cap report: $rep")
    // the cap must BITE on this corpus (a real pair cut, not a no-op)
    val cut = rep.getAs[Long]("n_pairs_exact") - rep.getAs[Long]("n_pairs_capped")
    assert(cut > rep.getAs[Long]("n_pairs_exact") / 10, s"cap cut only $cut")
    // report coherence: intersections bounded by both sides
    assert(rep.getAs[Long]("n_nb_inter") <= rep.getAs[Long]("n_nb_exact"))
    assert(rep.getAs[Long]("n_nb_inter") <= rep.getAs[Long]("n_nb_capped"))
    assert(rep.getAs[Long]("n_rec_inter") <= rep.getAs[Long]("n_rec_exact"))
    assert(rep.getAs[Long]("n_rec_inter") <= rep.getAs[Long]("n_rec_capped"))
    // capped chain still produces a full recommendation surface
    assert(rep.getAs[Long]("n_rec_capped") > 0L)
  }

  test("prod registry: every CF prod key shadows a graded key and runs") {
    assert(RecoRegistry.prodQueries.keySet.subsetOf(SparkEntry.queries.keySet))
    RecoRegistry.prodQueries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, name)
    }
  }
}
