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

/** Registry: recommendation + recsys-evaluation queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object RecoRegistry {

  /** PRODUCTION twins of the exact CF family — the [[Reco.CfPairCap]]
    * per-user degree cap on PAIR GENERATION only, the plan a 100-TB run
    * would execute (the exact chain stays the graded truth: sf10 measured
    * it at ~19× growth on 10× data, and q280 graded the cap harmless —
    * neighbor precision 98.7%, rec overlap 98.6%, zero common-rec drift).
    * Benched under SPARK_GRAFT_SKETCH_PROD=1, quality-pinned by
    * CfProdSpec against the exact seams; never driver-graded.
    */
  def prodQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_item_cf" -> ((s, dir) => cfNeighborsCapped(s, dir)),
    "q108_cf_predict" -> ((s, dir) => cfPredsCapped(s, dir)),
    "q191_slope_one" -> ((s, dir) =>
      Reco.slopeOnePredictions(cfDeduped(s, dir), cfPairsCapped(s, dir))),
    "q201_hitrate_eval" -> ((s, dir) =>
      Reco.hitRateFromRanked(holdoutSplitDf(s, dir), holdoutRankedCapped(s, dir))),
    "q212_mrr_eval" -> ((s, dir) =>
      Reco.mrrFromRanked(holdoutSplitDf(s, dir), holdoutRankedCapped(s, dir))),
    "q269_ndcg_eval" -> ((s, dir) =>
      Reco.ndcgFromRanked(holdoutSplitDf(s, dir), holdoutRankedCapped(s, dir))),
    "q173_basket_lift" -> ((s, dir) =>
      Reco.basketLift(cfDeduped(s, dir), cfPairsCapped(s, dir))),
    "q218_rec_coverage" -> ((s, dir) =>
      Reco.recCoverage(cfDeduped(s, dir), cfPredsCapped(s, dir))),
    "q239_intra_list_diversity" -> ((s, dir) =>
      Reco.intraListDiversity(cfDeduped(s, dir), cfPredsCapped(s, dir),
        cfPairsCapped(s, dir))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: J1 (SURVEY §2 rows 1.1-1.6) ----
    "q01_top_products" -> ((s, dir) => Reco.topProducts(EntryHelpers.ratingsDf(s, dir))),
    // J2 rows 2.2-2.4 — filters + projection. Reads the BASE tables, not
    // the staged ratings view: the userId<1000 filter is ~0.7%-selective
    // and pushes to the parquet scan as LessThan(o_custkey,1000)
    // (plan-asserted) — against the staged view it would scan the full
    // checkpoint. Selective consumers go to base tables; full-view
    // consumers share the seam.
    "q02_good_ratings" -> ((s, dir) =>
      Reco.goodRatings(Tables.ratings(s, dir)).select("userId", "productId", "rating")),
    // Support 4.3/4.4 — deterministic DB/stream split
    "q05_sample_split" -> ((s, dir) => Reco.sampleSplit(EntryHelpers.ratingsDf(s, dir))),
    // J2 row 2.15 — flagship recommendation generation. The library result
    // keeps the natural array<long> column (see entry()/qRecommendations);
    // the registered form serializes it to a canonical CSV string because
    // the driver's pandas compare cannot sort/hash ndarray cells.
    "q08_recommendations" -> ((s, dir) =>
      qRecommendations(s, dir).select(
        col("userId"),
        array_join(col("recommendedProducts").cast("array<string>"), ",")
          .as("recommendedProducts"))),
    // Seeded-sample split parity (spliter.py:24-25): membership is engine-
    // specific, so the registered form emits the oracle-checkable invariants
    // of the split — exact complement cardinality and the sampled fraction.
    "q28_seeded_split" -> ((s, dir) => {
      val base = EntryHelpers.ratingsDf(s, dir).where(col("userId") < 1000)
      val (db, stream) = Reco.seededSplit(EntryHelpers.ratingsDf(s, dir))
      db.agg(count(lit(1)).as("n_db"))
        .crossJoin(stream.agg(count(lit(1)).as("n_stream")))
        .crossJoin(base.agg(count(lit(1)).as("n_total")))
        .select(col("n_total"),
          (col("n_db") + col("n_stream")).as("n_parts_sum"),
          (abs(col("n_db").cast("double") - col("n_total") * 0.7)
            <= col("n_total") * 0.05).as("frac_ok"))
    }),
    // deterministic hash-based negative sampling (BPR/two-tower training
    // pairs): k unrated products per user, no user x product cross join
    // reads the memoized deduped pairs: the sampler only needs (user,
    // product) identity, which cf_deduped already holds uniquely
    "q148_negative_sampling" -> ((s, dir) =>
      Reco.negativeSampling(cfDeduped(s, dir))),
    // one rank-1 ALS alternation in exact integer arithmetic: hash-seeded
    // item factors, closed-form user solve, graded item re-solve
    "q158_als_step" -> ((s, dir) =>
      Reco.alsFromDeduped(cfDeduped(s, dir))),
    // association-rule lift over the memoized co-rated pair table —
    // third consumer of the q107/q108 fan-out
    "q173_basket_lift" -> ((s, dir) =>
      Reco.basketLift(cfDeduped(s, dir), cfPairs(s, dir))),
    // holdout calibration: hash-split train/test, item-mean model,
    // exact decile table of predicted vs actual on unseen ratings
    "q175_calibration" -> ((s, dir) =>
      Reco.calibrationFromDeduped(cfDeduped(s, dir))),
    // Slope One predictions over the memoized pair seam — the deviation-
    // based recommender beside q107/q108's cosine itemKNN
    "q191_slope_one" -> ((s, dir) =>
      Reco.slopeOnePredictions(cfDeduped(s, dir), cfPairs(s, dir))),
    // hit-rate@5 holdout eval: md5 80/20 split, itemKNN retrained on
    // train only, exact ppm hit rate — the ranking-metric report
    "q201_hitrate_eval" -> ((s, dir) =>
      Reco.hitRateFromRanked(holdoutSplitDf(s, dir), holdoutRanked(s, dir))),
    // MRR@5 over the SAME memoized holdout + retrained predictions —
    // the position-sensitive ranking metric beside q201
    "q212_mrr_eval" -> ((s, dir) =>
      Reco.mrrFromRanked(holdoutSplitDf(s, dir), holdoutRanked(s, dir))),
    // split-conformal interval + achieved coverage on the shared
    // holdout — the distribution-free uncertainty report card
    "q228_conformal" -> ((s, dir) =>
      Reco.conformalEval(holdoutSplitDf(s, dir))),
    // intra-list diversity of the top-k recommendations: exact cos^2 ppm
    // from the memoized pair table — the echo-chamber audit beside q218
    "q239_intra_list_diversity" -> ((s, dir) =>
      Reco.intraListDiversity(cfDeduped(s, dir), cfPreds(s, dir), cfPairs(s, dir))),
    // per-user degree cap A/B: capped pair generation vs the exact seams —
    // neighbor precision/recall, rec overlap, prediction drift, pair cost
    "q280_cf_cap_quality" -> ((s, dir) =>
      Reco.cfCapReport(cfDeduped(s, dir), cfPairs(s, dir),
        cfNeighbors(s, dir), cfPreds(s, dir))),
    // nDCG@5 over the SAME memoized holdout + retrained predictions —
    // one-JVM literal discount table, no per-row float logs
    "q269_ndcg_eval" -> ((s, dir) =>
      Reco.ndcgFromRanked(holdoutSplitDf(s, dir), holdoutRanked(s, dir))),
    // item-item CF: top-5 cosine neighbors per product over user-rating
    // vectors (integer dots/norms, ExactTopK ranking); neighbor table
    // memoized per session — q108 scores over it without recomputing
    "q107_item_cf" -> ((s, dir) => cfNeighbors(s, dir)),
    // itemKNN inference: top-3 predicted-rating recs per user via
    // micro-unit-integer weighted neighbor scores
    "q108_cf_predict" -> ((s, dir) => cfPreds(s, dir)),
    // coverage + popularity-lift audit over the SAME memoized top-3
    // predictions — the beyond-accuracy report beside q201/q212
    "q218_rec_coverage" -> ((s, dir) =>
      Reco.recCoverage(cfDeduped(s, dir), cfPreds(s, dir))),
    // ---- SLICE twins (sf10 oracle gate; see EntryHelpers.CfSliceMod) ----
    // the identical CF chains over userId % 16 == 0: every operator and
    // shuffle shape exercised on the same parquet, sized so DuckDB's
    // oracle fits where the full-population chain spills ≥60-70 GB at sf10
    "q281_item_cf_slice" -> ((s, dir) => cfNeighborsSlice(s, dir)),
    "q282_cf_predict_slice" -> ((s, dir) => cfPredsSlice(s, dir)),
    "q283_slope_one_slice" -> ((s, dir) =>
      Reco.slopeOnePredictions(cfDedupedSlice(s, dir), cfPairsSlice(s, dir))),
    "q284_hitrate_slice" -> ((s, dir) =>
      Reco.hitRateFromRanked(holdoutSplitSliceDf(s, dir), holdoutRankedSlice(s, dir))),
    // q280's cap-quality A/B over the slice population - the report that
    // grades the production cap ON SKEWED DATA at sf10 scale, sized so
    // both the Spark exact chain and the DuckDB twin stay oracle-feasible
    "q286_cf_cap_quality_slice" -> ((s, dir) =>
      Reco.cfCapReport(cfDedupedSlice(s, dir), cfPairsSlice(s, dir),
        cfNeighborsSlice(s, dir), cfPredsSlice(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "q01_top_products" ->
      s"""WITH $ratingsCte
         |SELECT productId, avg(rating) AS avg_rating, count(*) AS cnt
         |FROM ratings GROUP BY productId HAVING count(*) > 10
         |ORDER BY avg_rating DESC, productId LIMIT 20""".stripMargin,
    "q02_good_ratings" ->
      s"""WITH $ratingsCte
         |SELECT userId, productId, rating FROM ratings
         |WHERE rating > 3.0 AND userId < 1000""".stripMargin,
    "q05_sample_split" ->
      s"""WITH $ratingsCte
         |SELECT userId, productId, rating,
         |       CASE WHEN (userId * 131 + productId * 31 + CAST(rating AS BIGINT)) % 1000 < 700
         |            THEN 0 ELSE 1 END AS bucket
         |FROM ratings WHERE userId < 1000""".stripMargin,
    "q08_recommendations" ->
      s"""$graphPrefix,
         |$recsCtes
         |SELECT userId,
         |       array_to_string(list_transform(recommendedProducts, x -> CAST(x AS VARCHAR)), ',')
         |         AS recommendedProducts
         |FROM recs""".stripMargin,
    "q28_seeded_split" ->
      s"""WITH $ratingsCte
         |SELECT count(*) AS n_total, count(*) AS n_parts_sum, true AS frac_ok
         |FROM ratings WHERE userId < 1000""".stripMargin,
    // same split + second "conf:" hash, same item-mean model, same
    // exact order-statistic quantile and coverage floors
    "q228_conformal" ->
      s"""WITH $ratingsCte,
         |r0 AS (
         |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
         |  FROM ratings GROUP BY 1, 2),
         |rs AS (
         |  SELECT userId, productId, rv,
         |    ${md5Prefix32Sql("'hit:' || CAST(userId AS VARCHAR) || ':' || CAST(productId AS VARCHAR)")} % 5 = 0 AS is_test
         |  FROM r0),
         |model AS (
         |  SELECT productId,
         |    CAST(sum(rv) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
         |      AS pred_micro
         |  FROM rs WHERE NOT is_test GROUP BY 1),
         |sc AS (
         |  SELECT rs.userId, rs.productId, rs.rv,
         |    ${md5Prefix32Sql("'conf:' || CAST(rs.userId AS VARCHAR) || ':' || CAST(rs.productId AS VARCHAR)")} % 2 = 0 AS is_cal,
         |    abs(rs.rv * 1000000 - model.pred_micro) AS nc
         |  FROM rs JOIN model ON rs.productId = model.productId
         |  WHERE is_test),
         |cn AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM sc WHERE is_cal),
         |qv AS (
         |  SELECT CAST(nc AS BIGINT) AS q_micro FROM (
         |    SELECT nc, row_number() OVER (ORDER BY nc) AS rn
         |    FROM sc WHERE is_cal) CROSS JOIN cn
         |  WHERE rn = least(((n_cal + 1) * 90 + 99) // 100, n_cal)),
         |ev AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_eval,
         |    CAST(sum(CASE WHEN nc <= q_micro THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_covered,
         |    CAST(max(q_micro) AS BIGINT) AS q_micro
         |  FROM sc CROSS JOIN qv WHERE NOT is_cal)
         |SELECT n_cal, n_eval, q_micro, n_covered,
         |  n_covered * 1000000 // n_eval AS coverage_ppm,
         |  CAST(900000 AS BIGINT) AS target_ppm
         |FROM ev CROSS JOIN cn""".stripMargin,
    // q218's prediction chain verbatim, then the rec-pair self-join,
    // pair-table cos^2 lookup, and the 1-row diversity report
    // MATERIALIZED hints on the reused/heavy CTEs: without them DuckDB
    // inlines sc/topk into the final plan and the join-order it picks at
    // sf1.0 spilled past 79 GB to ENOSPC; materialized, the same query
    // runs in under a minute with a 25 GB cap (results identical)
    "q239_intra_list_diversity" ->
      s"""WITH $itemCfCtes,
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS MATERIALIZED (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |topk AS MATERIALIZED (
        |  SELECT userId, item FROM (
        |    SELECT userId, item,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predt) WHERE rn <= 3),
        |rp AS (
        |  SELECT a.userId, a.item AS item, b.item AS item2
        |  FROM topk a JOIN topk b ON a.userId = b.userId AND a.item < b.item),
        |jj AS (
        |  SELECT rp.userId, p.dot, na.s2 AS s2a, nb2.s2 AS s2b
        |  FROM rp
        |  LEFT JOIN pairs p ON p.pa = rp.item AND p.pb = rp.item2
        |  JOIN norms na ON na.productId = rp.item
        |  JOIN norms nb2 ON nb2.productId = rp.item2)
        |SELECT CAST(count(DISTINCT userId) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_rec_pairs,
        |  CAST(COALESCE(sum(CASE WHEN dot IS NOT NULL THEN 1 END), 0) AS BIGINT)
        |    AS n_corated_pairs,
        |  CAST(COALESCE(sum(COALESCE(CAST(dot AS HUGEINT) * dot * 1000000
        |      // (CAST(s2a AS HUGEINT) * s2b), 0)), 0)
        |    // count(*) AS BIGINT) AS mean_cos2_ppm
        |FROM jj""".stripMargin,
    // the full itemKNN chain twice — exact (the shared CTEs) and with a
    // per-user top-64 cap on PAIR GENERATION only (row_number over
    // (rv DESC, productId)) — then integer set-overlap and floored-micro
    // drift metrics; MATERIALIZED on both pair tables and both scoring
    // aggregates (the q239 lesson: inlined, DuckDB's join order re-derives
    // the Σdeg² self-join per reference)
    "q280_cf_cap_quality" ->
      s"""WITH $itemCfCtes,
        |nb5 AS MATERIALIZED (
        |  SELECT item, neighbor, cos FROM (
        |    SELECT item, neighbor, cos,
        |      row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |nbw AS (SELECT item, neighbor,
        |    CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM nb5),
        |sc AS MATERIALIZED (
        |  SELECT r.userId, nbw.item,
        |    CAST(sum(nbw.w * r.rv) AS BIGINT) AS num, CAST(sum(nbw.w) AS BIGINT) AS den
        |  FROM r JOIN nbw ON r.productId = nbw.neighbor
        |  GROUP BY 1, 2 HAVING sum(nbw.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |topk_e AS MATERIALIZED (
        |  SELECT userId, item, pred FROM (
        |    SELECT userId, item, pred,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predt) WHERE rn <= 3),
        |rcap AS (
        |  SELECT userId, productId, rv FROM (
        |    SELECT userId, productId, rv,
        |      row_number() OVER (PARTITION BY userId ORDER BY rv DESC, productId) AS crn
        |    FROM r) WHERE crn <= ${Reco.CfPairCap}),
        |pairs_cap AS MATERIALIZED (
        |  SELECT a.productId AS pa, b.productId AS pb,
        |    CAST(sum(a.rv * b.rv) AS BIGINT) AS dot
        |  FROM rcap a JOIN rcap b
        |    ON a.userId = b.userId AND a.productId < b.productId
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |mir_cap AS (
        |  SELECT pa AS item, pb AS neighbor, dot FROM pairs_cap
        |  UNION ALL
        |  SELECT pb, pa, dot FROM pairs_cap),
        |scored_cap AS (
        |  SELECT item, neighbor,
        |    CAST(dot AS DOUBLE) / sqrt(CAST(na.s2 * nb.s2 AS DOUBLE)) AS cos
        |  FROM mir_cap JOIN norms na ON na.productId = item
        |               JOIN norms nb ON nb.productId = neighbor),
        |nb5c AS MATERIALIZED (
        |  SELECT item, neighbor, cos FROM (
        |    SELECT item, neighbor, cos,
        |      row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored_cap) WHERE rn <= 5),
        |nbwc AS (SELECT item, neighbor,
        |    CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM nb5c),
        |scc AS MATERIALIZED (
        |  SELECT r.userId, nbwc.item,
        |    CAST(sum(nbwc.w * r.rv) AS BIGINT) AS num, CAST(sum(nbwc.w) AS BIGINT) AS den
        |  FROM r JOIN nbwc ON r.productId = nbwc.neighbor
        |  GROUP BY 1, 2 HAVING sum(nbwc.w) > 0),
        |candc AS (
        |  SELECT scc.* FROM scc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = scc.userId AND r.productId = scc.item)),
        |predtc AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM candc),
        |topk_c AS MATERIALIZED (
        |  SELECT userId, item, pred FROM (
        |    SELECT userId, item, pred,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predtc) WHERE rn <= 3),
        |m AS (SELECT
        |  (SELECT count(*) FROM pairs) AS n_pairs_exact,
        |  (SELECT count(*) FROM pairs_cap) AS n_pairs_capped,
        |  (SELECT count(*) FROM nb5) AS n_nb_exact,
        |  (SELECT count(*) FROM nb5c) AS n_nb_capped,
        |  (SELECT count(*) FROM nb5 a JOIN nb5c b
        |     ON a.item = b.item AND a.neighbor = b.neighbor) AS n_nb_inter,
        |  (SELECT count(*) FROM topk_e) AS n_rec_exact,
        |  (SELECT count(*) FROM topk_c) AS n_rec_capped,
        |  (SELECT count(*) FROM topk_e e JOIN topk_c c
        |     ON e.userId = c.userId AND e.item = c.item) AS n_rec_inter,
        |  (SELECT count(*) FROM topk_e e JOIN topk_c c
        |     ON e.userId = c.userId AND e.item = c.item) AS n_common_rec,
        |  (SELECT COALESCE(CAST(sum(CAST(floor(abs(e.pred - c.pred) * 1000000.0)
        |       AS BIGINT)) AS BIGINT), 0)
        |     FROM topk_e e JOIN topk_c c
        |     ON e.userId = c.userId AND e.item = c.item) AS drift_micro_sum)
        |SELECT CAST(${Reco.CfPairCap} AS BIGINT) AS cap, CAST(5 AS BIGINT) AS k,
        |  n_pairs_exact, n_pairs_capped, n_nb_exact, n_nb_capped, n_nb_inter,
        |  1000000 * n_nb_inter // n_nb_capped AS nb_precision_ppm,
        |  1000000 * n_nb_inter // n_nb_exact AS nb_recall_ppm,
        |  n_rec_exact, n_rec_capped, n_rec_inter,
        |  1000000 * n_rec_inter // n_rec_exact AS rec_overlap_ppm,
        |  n_common_rec, drift_micro_sum
        |FROM m""".stripMargin,
    "q286_cf_cap_quality_slice" ->
      s"""WITH $itemCfSliceCtes,
        |nb5 AS MATERIALIZED (
        |  SELECT item, neighbor, cos FROM (
        |    SELECT item, neighbor, cos,
        |      row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |nbw AS (SELECT item, neighbor,
        |    CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM nb5),
        |sc AS MATERIALIZED (
        |  SELECT r.userId, nbw.item,
        |    CAST(sum(nbw.w * r.rv) AS BIGINT) AS num, CAST(sum(nbw.w) AS BIGINT) AS den
        |  FROM r JOIN nbw ON r.productId = nbw.neighbor
        |  GROUP BY 1, 2 HAVING sum(nbw.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |topk_e AS MATERIALIZED (
        |  SELECT userId, item, pred FROM (
        |    SELECT userId, item, pred,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predt) WHERE rn <= 3),
        |rcap AS (
        |  SELECT userId, productId, rv FROM (
        |    SELECT userId, productId, rv,
        |      row_number() OVER (PARTITION BY userId ORDER BY rv DESC, productId) AS crn
        |    FROM r) WHERE crn <= ${Reco.CfPairCap}),
        |pairs_cap AS MATERIALIZED (
        |  SELECT a.productId AS pa, b.productId AS pb,
        |    CAST(sum(a.rv * b.rv) AS BIGINT) AS dot
        |  FROM rcap a JOIN rcap b
        |    ON a.userId = b.userId AND a.productId < b.productId
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |mir_cap AS (
        |  SELECT pa AS item, pb AS neighbor, dot FROM pairs_cap
        |  UNION ALL
        |  SELECT pb, pa, dot FROM pairs_cap),
        |scored_cap AS (
        |  SELECT item, neighbor,
        |    CAST(dot AS DOUBLE) / sqrt(CAST(na.s2 * nb.s2 AS DOUBLE)) AS cos
        |  FROM mir_cap JOIN norms na ON na.productId = item
        |               JOIN norms nb ON nb.productId = neighbor),
        |nb5c AS MATERIALIZED (
        |  SELECT item, neighbor, cos FROM (
        |    SELECT item, neighbor, cos,
        |      row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored_cap) WHERE rn <= 5),
        |nbwc AS (SELECT item, neighbor,
        |    CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM nb5c),
        |scc AS MATERIALIZED (
        |  SELECT r.userId, nbwc.item,
        |    CAST(sum(nbwc.w * r.rv) AS BIGINT) AS num, CAST(sum(nbwc.w) AS BIGINT) AS den
        |  FROM r JOIN nbwc ON r.productId = nbwc.neighbor
        |  GROUP BY 1, 2 HAVING sum(nbwc.w) > 0),
        |candc AS (
        |  SELECT scc.* FROM scc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = scc.userId AND r.productId = scc.item)),
        |predtc AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM candc),
        |topk_c AS MATERIALIZED (
        |  SELECT userId, item, pred FROM (
        |    SELECT userId, item, pred,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predtc) WHERE rn <= 3),
        |m AS (SELECT
        |  (SELECT count(*) FROM pairs) AS n_pairs_exact,
        |  (SELECT count(*) FROM pairs_cap) AS n_pairs_capped,
        |  (SELECT count(*) FROM nb5) AS n_nb_exact,
        |  (SELECT count(*) FROM nb5c) AS n_nb_capped,
        |  (SELECT count(*) FROM nb5 a JOIN nb5c b
        |     ON a.item = b.item AND a.neighbor = b.neighbor) AS n_nb_inter,
        |  (SELECT count(*) FROM topk_e) AS n_rec_exact,
        |  (SELECT count(*) FROM topk_c) AS n_rec_capped,
        |  (SELECT count(*) FROM topk_e e JOIN topk_c c
        |     ON e.userId = c.userId AND e.item = c.item) AS n_rec_inter,
        |  (SELECT count(*) FROM topk_e e JOIN topk_c c
        |     ON e.userId = c.userId AND e.item = c.item) AS n_common_rec,
        |  (SELECT COALESCE(CAST(sum(CAST(floor(abs(e.pred - c.pred) * 1000000.0)
        |       AS BIGINT)) AS BIGINT), 0)
        |     FROM topk_e e JOIN topk_c c
        |     ON e.userId = c.userId AND e.item = c.item) AS drift_micro_sum)
        |SELECT CAST(${Reco.CfPairCap} AS BIGINT) AS cap, CAST(5 AS BIGINT) AS k,
        |  n_pairs_exact, n_pairs_capped, n_nb_exact, n_nb_capped, n_nb_inter,
        |  1000000 * n_nb_inter // n_nb_capped AS nb_precision_ppm,
        |  1000000 * n_nb_inter // n_nb_exact AS nb_recall_ppm,
        |  n_rec_exact, n_rec_capped, n_rec_inter,
        |  1000000 * n_rec_inter // n_rec_exact AS rec_overlap_ppm,
        |  n_common_rec, drift_micro_sum
        |FROM m""".stripMargin,
    // identical md5 candidate draws, earliest-draw dedup, NOT EXISTS
    // anti-join, first-k by draw order
    "q148_negative_sampling" ->
      s"""WITH $ratingsCte,
        |mp AS (SELECT max(productId) AS max_pid FROM ratings),
        |users AS (SELECT DISTINCT userId FROM ratings),
        |draws AS (SELECT unnest(range(1, 17)) AS i),
        |cand AS (
        |  SELECT userId, i,
        |    ${md5Prefix32Sql("'neg:' || CAST(userId AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
        |      % max_pid + 1 AS cand_pid
        |  FROM users CROSS JOIN mp CROSS JOIN draws),
        |dedup AS (
        |  SELECT userId, cand_pid, CAST(min(i) AS BIGINT) AS cand_index
        |  FROM cand GROUP BY 1, 2),
        |neg AS (
        |  SELECT d.* FROM dedup d
        |  WHERE NOT EXISTS (SELECT 1 FROM ratings r
        |    WHERE r.userId = d.userId AND r.productId = d.cand_pid))
        |SELECT userId, cand_pid AS neg_productId, cand_index FROM (
        |  SELECT *, row_number() OVER (PARTITION BY userId ORDER BY cand_index) AS rn
        |  FROM neg) WHERE rn <= 5""".stripMargin,
    // same hash-seeded v0, the same floored micro-unit user solve, and
    // HUGEINT item sums mirroring the Spark side's DECIMAL(38,0); the
    // output is the identical BIGINT micro-unit floor (no HUGEINT /
    // DECIMAL / float column ever surfaces — fetch-path-proof)
    "q158_als_step" ->
      s"""WITH $ratingsCte,
        |ded AS (
        |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv,
        |    ${md5Prefix32Sql("'als:' || CAST(productId AS VARCHAR)")} % 1000 + 1 AS v
        |  FROM ratings GROUP BY 1, 2),
        |uf AS (
        |  SELECT userId,
        |    sum(rv * v) * 1000000 // sum(v * v) AS u_micro
        |  FROM ded GROUP BY 1),
        |it AS (
        |  SELECT d.productId, d.v AS v0,
        |    sum(CAST(d.rv * u.u_micro AS HUGEINT)) AS num2,
        |    sum(CAST(u.u_micro AS HUGEINT) * u.u_micro) AS den2
        |  FROM ded d JOIN uf u ON u.userId = d.userId
        |  GROUP BY 1, 2)
        |SELECT productId, CAST(v0 AS BIGINT) AS v0,
        |  CAST(num2 * 1000000 // den2 AS BIGINT) AS v_new_micro
        |FROM it""".stripMargin,
    // q107's pair CTE, user-population margins, the same exact-product
    // lift division and (lift DESC, pa, pb) top-20
    "q173_basket_lift" ->
      s"""WITH $itemCfCtes,
        |pop AS (SELECT productId, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY 1),
        |tt AS (SELECT CAST(count(DISTINCT userId) AS BIGINT) AS n_users FROM r)
        |SELECT p.pa, p.pb, p.support, a.cnt AS ca, b.cnt AS cb, tt.n_users,
        |  CAST(CAST(p.support AS HUGEINT) * tt.n_users AS DOUBLE)
        |    / CAST(CAST(a.cnt AS HUGEINT) * b.cnt AS DOUBLE) AS lift
        |FROM pairs p
        |JOIN pop a ON a.productId = p.pa
        |JOIN pop b ON b.productId = p.pb
        |CROSS JOIN tt
        |ORDER BY lift DESC, p.pa, p.pb LIMIT 20""".stripMargin,
    // same md5 split, same floored micro model, same x10 quantile cuts
    // and strictly-below bucketing, same floored decile means
    "q175_calibration" ->
      s"""WITH $ratingsCte,
        |ded AS (
        |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv,
        |    ${md5Prefix32Sql("'cal:' || CAST(userId AS VARCHAR) || ':' || CAST(productId AS VARCHAR)")}
        |      % 5 = 0 AS is_test
        |  FROM ratings GROUP BY 1, 2),
        |model AS (
        |  SELECT productId, sum(rv) * 1000000 // count(*) AS pred_micro
        |  FROM ded WHERE NOT is_test GROUP BY 1),
        |scored AS (
        |  SELECT m.pred_micro, d.rv
        |  FROM ded d JOIN model m USING (productId) WHERE d.is_test),
        |cuts AS (
        |  SELECT quantile_cont(pred_micro * 10,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
        |  FROM scored),
        |bk AS (
        |  SELECT pred_micro, rv,
        |    len(list_filter(cuts.cs, c -> pred_micro * 10 > c)) AS bucket
        |  FROM scored CROSS JOIN cuts)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(pred_micro) // count(*) AS BIGINT) AS mean_pred_micro,
        |  CAST(sum(rv) * 1000000 // count(*) AS BIGINT) AS mean_actual_micro,
        |  CAST(sum(pred_micro) // count(*)
        |    - sum(rv) * 1000000 // count(*) AS BIGINT) AS gap_micro
        |FROM bk GROUP BY 1""".stripMargin,
    // same popularity counts, same 1-row coverage + cross-multiplied lift
    "q218_rec_coverage" ->
      s"""WITH $itemCfCtes,
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |topk AS (
        |  SELECT userId, item FROM (
        |    SELECT userId, item,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predt) WHERE rn <= 3),
        |pop AS (
        |  SELECT productId, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY 1),
        |cat AS (
        |  SELECT CAST(count(*) AS BIGINT) AS catalog_size,
        |    CAST(sum(cnt) AS BIGINT) AS n_ratings FROM pop),
        |ag AS (
        |  SELECT CAST(count(DISTINCT userId) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_recs,
        |    CAST(count(DISTINCT t.item) AS BIGINT) AS n_distinct_items,
        |    CAST(sum(pop.cnt) AS BIGINT) AS rec_pop_sum
        |  FROM topk t JOIN pop ON t.item = pop.productId)
        |SELECT n_users, n_recs, n_distinct_items, catalog_size, n_ratings,
        |  n_distinct_items * 1000000 // catalog_size AS coverage_ppm,
        |  rec_pop_sum * catalog_size * 1000000 // (n_recs * n_ratings)
        |    AS pop_lift_ppm
        |FROM ag CROSS JOIN cat""".stripMargin,
    // q107's CTE chain with the dsum deviation column; pb-side mirror
    // negates it, exact integer num/den, NOT EXISTS anti, (pred DESC,
    // item) ExactTopK mirror — the q108 oracle pattern
    "q191_slope_one" ->
      s"""WITH $itemCfCtes,
        |mir2 AS (
        |  SELECT pa AS item, pb AS base, dsum AS dev, support AS c FROM pairs
        |  UNION ALL
        |  SELECT pb, pa, -dsum, support FROM pairs),
        |mirp AS (
        |  SELECT item, base, dev, c FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY c DESC, base) AS prn
        |    FROM mir2) WHERE prn <= 8),
        |sc2 AS (
        |  SELECT r.userId, m.item,
        |    CAST(sum(m.dev + r.rv * m.c) AS BIGINT) AS num,
        |    CAST(sum(m.c) AS BIGINT) AS den
        |  FROM r JOIN mirp m ON r.productId = m.base
        |  GROUP BY 1, 2),
        |cand2 AS (
        |  SELECT sc2.* FROM sc2
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc2.userId AND r.productId = sc2.item)),
        |predt2 AS (
        |  SELECT userId, item, num, den,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand2)
        |SELECT userId, item, num, den, pred FROM (
        |  SELECT *, row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |  FROM predt2) WHERE rn <= 3""".stripMargin,
    // the q107/q108 chain rebuilt over the TRAIN split only (same md5
    // draw), top-5 per user, EXISTS hit probe, exact ppm
    "q201_hitrate_eval" ->
      s"""WITH ${itemCfChainFrom(
        s"""$ratingsCte,
           |r0 AS (
           |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
           |  FROM ratings GROUP BY 1, 2),
           |rs AS (
           |  SELECT userId, productId, rv,
           |    ${md5Prefix32Sql("'hit:' || CAST(userId AS VARCHAR) || ':' || CAST(productId AS VARCHAR)")} % 5 = 0 AS is_test
           |  FROM r0),
           |r AS (SELECT userId, productId, rv FROM rs WHERE NOT is_test)""".stripMargin)},
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item, num, den,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |topk AS (
        |  SELECT userId, item FROM (
        |    SELECT userId, item,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predt) WHERE rn <= 5),
        |test AS (SELECT userId, productId AS item FROM rs WHERE is_test),
        |hits AS (
        |  SELECT t.* FROM test t
        |  WHERE EXISTS (SELECT 1 FROM topk k WHERE k.userId = t.userId AND k.item = t.item)),
        |ta AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(count(DISTINCT userId) AS BIGINT) AS n_test_users FROM test),
        |ha AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM hits)
        |SELECT CAST(5 AS BIGINT) AS k, n_test_users, n_test, n_hits,
        |  CAST(n_hits * 1000000 // n_test AS BIGINT) AS hit_rate_ppm
        |FROM ta CROSS JOIN ha""".stripMargin,
    // same holdout chain as q201, then best-rank reciprocals in exact
    // integer micro units
    "q212_mrr_eval" ->
      s"""WITH ${itemCfChainFrom(
        s"""$ratingsCte,
           |r0 AS (
           |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
           |  FROM ratings GROUP BY 1, 2),
           |rs AS (
           |  SELECT userId, productId, rv,
           |    ${md5Prefix32Sql("'hit:' || CAST(userId AS VARCHAR) || ':' || CAST(productId AS VARCHAR)")} % 5 = 0 AS is_test
           |  FROM r0),
           |r AS (SELECT userId, productId, rv FROM rs WHERE NOT is_test)""".stripMargin)},
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |ranked AS (
        |  SELECT userId, item,
        |    CAST(row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item)
        |      AS BIGINT) AS rn
        |  FROM predt),
        |topr AS (SELECT * FROM ranked WHERE rn <= 5),
        |test AS (SELECT userId, productId AS item FROM rs WHERE is_test),
        |fh AS (
        |  SELECT t.userId, CAST(min(k.rn) AS BIGINT) AS first_rank
        |  FROM test t JOIN topr k ON k.userId = t.userId AND k.item = t.item
        |  GROUP BY 1),
        |ta AS (
        |  SELECT CAST(count(DISTINCT userId) AS BIGINT) AS n_test_users FROM test),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_hit_users,
        |    CAST(coalesce(sum(1000000 // first_rank), 0) AS BIGINT) AS rr_micro_sum
        |  FROM fh)
        |SELECT CAST(5 AS BIGINT) AS k, n_test_users, n_hit_users, rr_micro_sum,
        |  CAST(rr_micro_sum // n_test_users AS BIGINT) AS mrr_micro
        |FROM ta CROSS JOIN ag""".stripMargin,
    // same holdout chain as q201/q212, then the one-JVM literal
    // discount table: dcg/idcg in exact micro units, ppm mean
    "q269_ndcg_eval" ->
      s"""WITH ${itemCfChainFrom(
        s"""$ratingsCte,
           |r0 AS (
           |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
           |  FROM ratings GROUP BY 1, 2),
           |rs AS (
           |  SELECT userId, productId, rv,
           |    ${md5Prefix32Sql("'hit:' || CAST(userId AS VARCHAR) || ':' || CAST(productId AS VARCHAR)")} % 5 = 0 AS is_test
           |  FROM r0),
           |r AS (SELECT userId, productId, rv FROM rs WHERE NOT is_test)""".stripMargin)},
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |ranked AS (
        |  SELECT userId, item,
        |    CAST(row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item)
        |      AS BIGINT) AS rn
        |  FROM predt),
        |topr AS (SELECT * FROM ranked WHERE rn <= 5),
        |test AS (SELECT userId, productId AS item FROM rs WHERE is_test),
        |dcg AS (
        |  SELECT t.userId,
        |    CAST(sum(${NdcgWeightsSqlList}[CAST(k.rn AS INTEGER)]) AS BIGINT)
        |      AS dcg_micro
        |  FROM test t JOIN topr k ON k.userId = t.userId AND k.item = t.item
        |  GROUP BY 1),
        |pu AS (
        |  SELECT n.userId,
        |    COALESCE(d.dcg_micro, 0) * 1000000
        |      // ${NdcgPrefixSqlList}[CAST(least(n.n_rel, 5) AS INTEGER)]
        |      AS ndcg_ppm
        |  FROM (SELECT userId, CAST(count(*) AS BIGINT) AS n_rel
        |        FROM test GROUP BY 1) n
        |  LEFT JOIN dcg d ON n.userId = d.userId)
        |SELECT CAST(5 AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n_test_users,
        |  CAST(sum(ndcg_ppm) AS BIGINT) AS ndcg_ppm_sum,
        |  CAST(sum(ndcg_ppm) // count(*) AS BIGINT) AS ndcg_mean_ppm
        |FROM pu""".stripMargin,
    // q107's oracle over the slice population — same CTE chain, sliced r
    "q281_item_cf_slice" ->
      s"""WITH $itemCfSliceCtes
        |SELECT item, neighbor, dot, support, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin,
    // q108's oracle over the slice population
    "q282_cf_predict_slice" ->
      s"""WITH $itemCfSliceCtes,
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item, num, den,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand)
        |SELECT userId, item, num, den, pred FROM (
        |  SELECT *, row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |  FROM predt) WHERE rn <= 3""".stripMargin,
    // q191's oracle over the slice population
    "q283_slope_one_slice" ->
      s"""WITH $itemCfSliceCtes,
        |mir2 AS (
        |  SELECT pa AS item, pb AS base, dsum AS dev, support AS c FROM pairs
        |  UNION ALL
        |  SELECT pb, pa, -dsum, support FROM pairs),
        |mirp AS (
        |  SELECT item, base, dev, c FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY c DESC, base) AS prn
        |    FROM mir2) WHERE prn <= 8),
        |sc2 AS (
        |  SELECT r.userId, m.item,
        |    CAST(sum(m.dev + r.rv * m.c) AS BIGINT) AS num,
        |    CAST(sum(m.c) AS BIGINT) AS den
        |  FROM r JOIN mirp m ON r.productId = m.base
        |  GROUP BY 1, 2),
        |cand2 AS (
        |  SELECT sc2.* FROM sc2
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc2.userId AND r.productId = sc2.item)),
        |predt2 AS (
        |  SELECT userId, item, num, den,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand2)
        |SELECT userId, item, num, den, pred FROM (
        |  SELECT *, row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |  FROM predt2) WHERE rn <= 3""".stripMargin,
    // q201's oracle over the slice population: the slice filter lands on
    // r0 (the deduped base), exactly where cfDedupedSlice applies it
    "q284_hitrate_slice" ->
      s"""WITH ${itemCfChainFrom(
        s"""$ratingsCte,
           |r0 AS (
           |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
           |  FROM ratings WHERE userId % ${EntryHelpers.CfSliceMod} = 0 GROUP BY 1, 2),
           |rs AS (
           |  SELECT userId, productId, rv,
           |    ${md5Prefix32Sql("'hit:' || CAST(userId AS VARCHAR) || ':' || CAST(productId AS VARCHAR)")} % 5 = 0 AS is_test
           |  FROM r0),
           |r AS (SELECT userId, productId, rv FROM rs WHERE NOT is_test)""".stripMargin)},
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item, num, den,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand),
        |topk AS (
        |  SELECT userId, item FROM (
        |    SELECT userId, item,
        |      row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |    FROM predt) WHERE rn <= 5),
        |test AS (SELECT userId, productId AS item FROM rs WHERE is_test),
        |hits AS (
        |  SELECT t.* FROM test t
        |  WHERE EXISTS (SELECT 1 FROM topk k WHERE k.userId = t.userId AND k.item = t.item)),
        |ta AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(count(DISTINCT userId) AS BIGINT) AS n_test_users FROM test),
        |ha AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM hits)
        |SELECT CAST(5 AS BIGINT) AS k, n_test_users, n_test, n_hits,
        |  CAST(n_hits * 1000000 // n_test AS BIGINT) AS hit_rate_ppm
        |FROM ta CROSS JOIN ha""".stripMargin,
    // integer dots/norms from the deduped (user, product) max-rating;
    // cosine = one division by one sqrt of an exact integer product, and
    // the row_number (cos DESC, neighbor) mirror of the ExactTopK contract
    "q107_item_cf" ->
      s"""WITH $itemCfCtes
        |SELECT item, neighbor, dot, support, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin,
    // q107's CTE chain, then micro-unit integer weights (identical double
    // floored on both engines), exact integer weighted sums, NOT EXISTS
    // as the left-anti twin, and the (pred DESC, item) ExactTopK mirror
    "q108_cf_predict" ->
      s"""WITH $itemCfCtes,
        |nb AS (
        |  SELECT item, neighbor, CAST(floor(cos * 1000000.0) AS BIGINT) AS w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |    FROM scored) WHERE rn <= 5),
        |sc AS (
        |  SELECT r.userId, nb.item,
        |    CAST(sum(nb.w * r.rv) AS BIGINT) AS num, CAST(sum(nb.w) AS BIGINT) AS den
        |  FROM r JOIN nb ON r.productId = nb.neighbor
        |  GROUP BY 1, 2 HAVING sum(nb.w) > 0),
        |cand AS (
        |  SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r WHERE r.userId = sc.userId AND r.productId = sc.item)),
        |predt AS (
        |  SELECT userId, item, num, den,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred FROM cand)
        |SELECT userId, item, num, den, pred FROM (
        |  SELECT *, row_number() OVER (PARTITION BY userId ORDER BY pred DESC, item) AS rn
        |  FROM predt) WHERE rn <= 3""".stripMargin,
  )
}
