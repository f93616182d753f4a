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

/** Shared building blocks for the per-family query registries: the
  * session-scoped DataFrame memo (one materialization per expensive shared
  * subplan per Verify/Bench run) and the DuckDB-oracle CTE/SQL fragments.
  * Split out of the former single-file SparkEntry registry (r11); all
  * members keep their exact bodies.
  */
private[graft] object EntryHelpers {
  // ---------------------------------------------------------------------------
  // Shared building blocks (Spark side)
  // ---------------------------------------------------------------------------

  /** Session+dir-scoped memo so expensive shared subplans (label propagation,
    * the good-ratings projection) are built & materialized once per Verify/
    * Bench run instead of once per query.
    *
    * Eviction is explicit: a cached DataFrame strongly references its
    * SparkSession (via QueryExecution), so weak keys alone would never be
    * collected — instead a SparkListener clears every entry of a context's
    * sessions when that application ends. Keyed on the session object, so
    * no identity-hash collisions between concurrent sessions.
    */
  private[graft] val dfCache =
    new java.util.HashMap[SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()
  private[graft] def cached(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
    val perSession = dfCache.synchronized {
      var m = dfCache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        dfCache.put(s, m)
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            dfCache.synchronized {
              val it = dfCache.keySet().iterator()
              while (it.hasNext) if (it.next().sparkContext eq s.sparkContext) it.remove()
            }
        })
      }
      m
    }
    perSession.getOrElseUpdate((dir, key), build)
  }

  /** The ratings VIEW is a |lineitem| ⋈ |orders| join (6M × 1.5M rows at
    * sf1.0) that ~10 registered queries consumed independently — each
    * re-ran the join, and some (q272's global-identity audit) ran it
    * twice inside one query. Staged once per session behind a barrier,
    * exactly the materialized view a deployment would keep; every
    * consumer reads the checkpoint.
    */
  private[graft] def ratingsDf(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "ratings_df") {
      Tables.ratings(spark, dir).transform(graft.barrier)
    }

  private[graft] def good(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "good") {
      Reco.goodRatings(ratingsDf(spark, dir))
        .select("userId", "productId").distinct().cache()
    }

  private[graft] def coPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "pairs") {
      Reco.coRatingPairs(Reco.goodRatings(ratingsDf(spark, dir))).cache()
    }

  private[graft] def communityLabels(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "labels") {
      LabelPropagation.run(Reco.undirected(coPairs(spark, dir)))
    }

  /** itemKNN shared stages, memoized per session: q107 and q108 both
    * consume the deduped rating table and the cosine neighbor table, and
    * the neighbor pair self-join is the family's dominant cost — without
    * this seam q108 re-executes the entire q107 pipeline. The neighbor
    * frame is ≤ |items|·k rows; the deduped frame is |ratings| rows × 3
    * narrow columns — both are the tables a cluster deployment would
    * persist between the train and inference passes anyway.
    */
  private[graft] def cfDeduped(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_deduped") {
      // barrier (eager localCheckpoint) already stops recomputation; the
      // cache() layers a columnar in-memory copy on top because q108 scans
      // this table twice more (scoring join + rated anti-join)
      Reco.dedupedRatings(ratingsDf(spark, dir)).cache()
    }

  /** The co-rated pair table WITH its train-split twin from one combined
    * fan-out (the family's Σdeg² cost, paid once for q107/q108/q173/q191
    * AND the q201/q212 holdout retrain — [[Reco.itemPairsWithHoldout]]).
    */
  private[graft] def cfPairsAll(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_pairs_all") {
      Reco.itemPairsWithHoldout(holdoutSplitDf(spark, dir))
    }

  /** The full-corpus pair view of [[cfPairsAll]] — bit-identical to the
    * old standalone `Reco.itemPairs(cfDeduped)` frame (spec-proven).
    */
  private[graft] def cfPairs(spark: SparkSession, dir: String): DataFrame =
    cfPairsAll(spark, dir).select("pa", "pb", "dot", "support", "dsum")

  private[graft] def cfNeighbors(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_neighbors") {
      Reco.itemNeighborsFromPairs(cfDeduped(spark, dir), cfPairs(spark, dir)).cache()
    }

  /** The full-corpus itemKNN predictions, memoized so q108 and q218's
    * coverage audit pay the scoring join once per session.
    */
  private[graft] def cfPreds(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_preds") {
      Reco.cfPredictionsFrom(cfDeduped(spark, dir), cfNeighbors(spark, dir)).cache()
    }

  /** The CF PRODUCTION seams — the [[Reco.CfPairCap]] per-user degree cap
    * on pair generation only, graded harmless by q280 (neighbor precision
    * 98.7%, rec overlap 98.6%, zero drift on common recs) and required by
    * the sf10 measurement (exact family ~19× growth on 10× data once the
    * Σdeg² fan-out starts spilling). Benched via SPARK_GRAFT_SKETCH_PROD=1
    * like the sketch prod twins; never driver-graded — `CfProdSpec` pins
    * the capped outputs against the exact seams instead.
    */
  /** The capped split: [[Reco.capRatings]] over the holdout split (is_test
    * passes through), so ONE capped Σ min(deg,cap)² fan-out serves the
    * full-corpus pair table AND the train retrain — the same combined
    * shape the exact path uses ([[cfPairsAll]]).
    */
  private[graft] def cfCappedSplit(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_capped_split") {
      graft.barrier(Reco.capRatings(holdoutSplitDf(spark, dir)))
    }

  private[graft] def cfPairsCappedAll(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_pairs_capped_all") {
      Reco.itemPairsWithHoldout(cfCappedSplit(spark, dir)) // barriered inside
    }

  private[graft] def cfPairsCapped(spark: SparkSession, dir: String): DataFrame =
    cfPairsCappedAll(spark, dir).select("pa", "pb", "dot", "support", "dsum")

  private[graft] def cfNeighborsCapped(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_neighbors_capped") {
      Reco.itemNeighborsFromPairs(cfDeduped(spark, dir),
        cfPairsCapped(spark, dir)).cache()
    }

  private[graft] def cfPredsCapped(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_preds_capped") {
      Reco.cfPredictionsFrom(cfDeduped(spark, dir),
        cfNeighborsCapped(spark, dir)).cache()
    }

  private[graft] def holdoutRankedCapped(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_ranked_capped") {
      Reco.holdoutRankedPredsFromPairs(holdoutSplitDf(spark, dir),
        cfPairsCappedAll(spark, dir)).cache()
    }

  /** The offline-eval holdout stages, memoized so q201 (hit rate) and
    * q212 (MRR) pay the retrained pair fan-out once per session: the
    * md5 split is barriered, the ranked top-k prediction table is
    * cached (both metrics probe it).
    */
  private[graft] def holdoutSplitDf(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_split") {
      Reco.holdoutSplit(cfDeduped(spark, dir))
    }

  private[graft] def holdoutRanked(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_ranked") {
      Reco.holdoutRankedPredsFromPairs(holdoutSplitDf(spark, dir),
        cfPairsAll(spark, dir)).cache()
    }

  /** SLICE twins of the CF family (q281-q284): the IDENTICAL chains over
    * the deterministic `userId % 16 == 0` sub-population. Purpose: the
    * sf10 oracle gate — the full-population CF oracles exceed DuckDB's
    * disk there (≥60-70 GB spill, CORRECTNESS_sf10_subset r15), while the
    * slice keeps every operator, every shuffle shape, and the Σdeg²
    * fan-out exercised on the same sf10 parquet at ~1/16 the user count
    * (pair volume ~1/16 — per-user degree is unchanged, so the slice cuts
    * users, not the per-user work profile). Modulo on the USER key keeps
    * each kept user's rating set complete — the chain's semantics per
    * user are untouched, unlike a row-level sample.
    */
  private[graft] val CfSliceMod = 16

  private[graft] def cfDedupedSlice(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_deduped_slice") {
      Reco.dedupedRatings(
        ratingsDf(spark, dir).where(col("userId") % CfSliceMod === 0)).cache()
    }

  private[graft] def holdoutSplitSliceDf(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_split_slice") {
      Reco.holdoutSplit(cfDedupedSlice(spark, dir))
    }

  private[graft] def cfPairsSliceAll(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_pairs_slice_all") {
      Reco.itemPairsWithHoldout(holdoutSplitSliceDf(spark, dir))
    }

  private[graft] def cfPairsSlice(spark: SparkSession, dir: String): DataFrame =
    cfPairsSliceAll(spark, dir).select("pa", "pb", "dot", "support", "dsum")

  private[graft] def cfNeighborsSlice(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_neighbors_slice") {
      Reco.itemNeighborsFromPairs(cfDedupedSlice(spark, dir),
        cfPairsSlice(spark, dir)).cache()
    }

  private[graft] def cfPredsSlice(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_preds_slice") {
      Reco.cfPredictionsFrom(cfDedupedSlice(spark, dir),
        cfNeighborsSlice(spark, dir)).cache()
    }

  private[graft] def holdoutRankedSlice(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_ranked_slice") {
      Reco.holdoutRankedPredsFromPairs(holdoutSplitSliceDf(spark, dir),
        cfPairsSliceAll(spark, dir)).cache()
    }

  /** The corpus 8-gram explode + ONE (source, g) dedup is the dominant
    * shared cost of the sketch family (q102/q147/q157/q185/q194) — one
    * barriered materialization per session, exactly the staged artifact a
    * cluster deployment would persist. The frame is DISTINCT by
    * (source, g) ([[Corpus.distinctGrams]]): every consumer is
    * multiplicity-insensitive, so results are identical while each
    * query's own shuffles read the ~8×-smaller deduped frame instead of
    * re-deduplicating the raw gram stream per query.
    */
  private[graft] def hllGrams(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "hll_grams") {
      Corpus.distinctGrams(Tables.documents(spark, dir))
    }


  /** The token-shingle similarity family's persisted artifacts, memoized
    * per session exactly as a cluster deployment would persist them: the
    * per-doc hashed shingle SETS (q106's verify table), their exploded
    * inverted INDEX (q36/q133's join input), q36's exact Jaccard pair
    * result (q85's truth), and q39's LSH candidate pairs (q85's estimate
    * and q45's closure input). Before this seam, q85 re-ran BOTH full
    * pipelines and q45 re-ran the LSH — the bench's biggest redundancy.
    */
  private[graft] def shingleSets(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "shingle_sets") {
      Dedup.shingleSets(Tables.documents(spark, dir))
    }

  private[graft] def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "shingle_index") {
      Dedup.shingleIndexFrom(shingleSets(spark, dir))
    }

  private[graft] def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "jaccard_pairs") {
      Dedup.ngramJaccardPairsFrom(shingleIndex(spark, dir))
        .transform(graft.barrier)
    }

  private[graft] def mhPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "minhash_pairs") {
      Dedup.minhashPairs(Tables.documents(spark, dir))
        .transform(graft.barrier)
    }

  /** Hashing-trick doc vectors (q261), memoized so q262's re-ranker
    * reads the same |docs|·≤64-row table instead of re-exploding the
    * corpus — on a cluster this is the persisted feature table.
    */
  private[graft] def hashedVectors(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "hashed_vectors") {
      Corpus.hashedVectorizer(Tables.documents(spark, dir))
        .transform(graft.barrier)
    }

  /** Near-dup cluster labels (q45), memoized per session so q73's
    * weighting reuses the LSH/CC run instead of repeating it. The frame is
    * |docs| rows × 3 narrow columns — on a cluster this is the persisted
    * cluster-assignment table every downstream dedup consumer reads.
    */
  private[graft] def nearDupClusterLabels(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "neardup_clusters") {
      Dedup.nearDupClustersFromPairs(Tables.documents(spark, dir),
        mhPairs(spark, dir)
          .select(col("a_id").as("src"), col("b_id").as("dst"))).cache()
    }

  private[graft] def qRecommendations(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "recs") {
      Reco.recommendations(communityLabels(spark, dir), good(spark, dir)).cache()
    }

  private[graft] def qStreamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val reviews = ratingsDf(spark, dir).select("userId").distinct()
    RealTime.enrich(
      reviews,
      qRecommendations(spark, dir),
      Reco.topProducts(ratingsDf(spark, dir)))
  }

  // ---------------------------------------------------------------------------
  // Driver contract maps
  // ---------------------------------------------------------------------------

  /** Deterministic FIXED-SIZE query panel for the similarity-search
    * benchmarks: every 25th vector within the first 2000 ids — 80 queries
    * at every scale factor. The id cap is what keeps the brute-force
    * graded-truth baseline LINEAR in corpus size (the sf1.0 sweep flagged
    * the uncapped panel: queries x corpus both grew 10x, so the truth
    * baseline grew ~100x — an evaluation WORKLOAD must not scale with the
    * corpus). A no-op at sf<=0.1 (all vec_ids < 2000), so the driver's
    * grading surface is byte-identical.
    */
  private[graft] def simQueries(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .where(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
  /** DuckDB twin of [[graft.operators.Similarity.bruteForceTopK]] over the
    * q37 query subset — shared by the q37 oracle and the q83 recall oracle.
    */
  private[graft] def bruteTopkOracle: String = bruteTopkOracleFrom("embeddings")

  /** [[bruteTopkOracle]] with the CORPUS side parameterized (the query
    * panel stays the full-table q37 panel) — `src` may be a CTE name, so
    * the q285 slice twin can rank against a reduced corpus.
    */
  private[graft] def bruteTopkOracleFrom(src: String): String =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2000),
       |scored AS (
       |  SELECT q_id, e.vec_id, ${cosineSql("q_emb", "e.embedding")} AS sim
       |  FROM q CROSS JOIN $src e WHERE q_id <> e.vec_id)
       |SELECT q_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** DuckDB twin of [[graft.operators.Similarity.ivfTopK]] (stride-37
    * centroids, nprobe 4) — shared by the q41 oracle and the q83 recall
    * oracle.
    */
  private[graft] def ivfTopkOracle: String = ivfTopkOracleN(4)

  /** Two-level assignment CTE chain — the DuckDB twin of
    * [[graft.operators.Similarity.ivfAssign]]'s hierarchical rule
    * (supers = `(c_id // 37) % ⌈√|cents|⌉ = 0 OR min(c_id)`; centroid and
    * vector each rank against supers top-2; final top-`nprobe` over the
    * shared-super candidates; every tie-break (sim DESC, id ASC)).
    * Emits CTEs `cents, kk, sup, ca, va, cand, assign`; `assign` has
    * (vec_id, embedding, cell). Consumers splice it after WITH.
    */
  private[graft] def hierAssignSql(nprobe: Int, src: String = "embeddings"): String =
    s"""cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb FROM $src WHERE vec_id % 37 = 0),
       |kk AS (
       |  SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k, min(c_id) AS mn FROM cents),
       |sup AS (
       |  SELECT c_id AS s_id, c_emb AS s_emb FROM cents, kk
       |  WHERE (c_id // 37) % kk.k = 0 OR c_id = kk.mn),
       |ca AS (
       |  SELECT c_id, s_id FROM (
       |    SELECT c.c_id, s.s_id,
       |      row_number() OVER (PARTITION BY c.c_id
       |        ORDER BY ${cosineSql("c.c_emb", "s.s_emb")} DESC, s.s_id) AS rn
       |    FROM cents c CROSS JOIN sup s) WHERE rn <= 2),
       |va AS (
       |  SELECT vec_id, s_id FROM (
       |    SELECT e.vec_id, s.s_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.embedding", "s.s_emb")} DESC, s.s_id) AS rn
       |    FROM $src e CROSS JOIN sup s) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT va.vec_id, ca.c_id FROM va JOIN ca USING (s_id)),
       |assign AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM cand JOIN $src e ON e.vec_id = cand.vec_id
       |              JOIN cents c ON c.c_id = cand.c_id)
       |  WHERE rn <= $nprobe)""".stripMargin

  private[graft] def ivfTopkOracleN(nprobe: Int, src: String = "embeddings"): String =
    s"""WITH ${hierAssignSql(1, src)},
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 2000),
       |probes AS (
       |  SELECT q_id, q_emb, cell FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cosineSql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM q CROSS JOIN cents c)
       |  WHERE rn <= $nprobe),
       |scored AS (
       |  SELECT p.q_id, a.vec_id, ${cosineSql("p.q_emb", "a.embedding")} AS sim
       |  FROM probes p JOIN assign a ON p.cell = a.cell
       |  WHERE p.q_id <> a.vec_id)
       |SELECT q_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** DuckDB twin of [[Relational.corrMatrix]]: the same four cents-scaled
    * features, one HUGEINT moment pass, six UNION ALL pair rows.
    */
  private[graft] def corrMatrixOracle: String = {
    val cols = Seq(
      "quantity" -> "CAST(floor(l_quantity) AS BIGINT)",
      "price_cents" -> "CAST(floor(l_extendedprice * 100) AS BIGINT)",
      "discount_pct" -> "CAST(floor(l_discount * 100) AS BIGINT)",
      "tax_pct" -> "CAST(floor(l_tax * 100) AS BIGINT)")
    val feats = cols.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val sums = cols.map { case (c, _) => s"sum(CAST($c AS HUGEINT)) AS s_$c" }
    val squares = cols.map { case (c, _) =>
      s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c" }
    val crosses = cols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
      s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b" }
    // all-integer surface (the Spark twin's 2^30-shift algebra): sign of
    // the exact covariance numerator plus the shifted-exact r^2 in ppm —
    // no HUGEINT/DECIMAL/float output column survives to the fetch path
    val pairs = cols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
      s"""SELECT '$a' AS x_col, '$b' AS y_col, CAST(n AS BIGINT) AS n,
         |  CAST(CASE WHEN CAST(n AS HUGEINT) * sp_${a}_$b - s_$a * s_$b > 0 THEN 1
         |            WHEN CAST(n AS HUGEINT) * sp_${a}_$b - s_$a * s_$b < 0 THEN -1
         |            ELSE 0 END AS BIGINT) AS sign,
         |  CAST(CASE WHEN (CAST(n AS HUGEINT) * ss_$a - s_$a * s_$a) // 1073741824 > 0
         |        AND (CAST(n AS HUGEINT) * ss_$b - s_$b * s_$b) // 1073741824 > 0
         |    THEN (abs(CAST(n AS HUGEINT) * sp_${a}_$b - s_$a * s_$b) // 1073741824)
         |       * (abs(CAST(n AS HUGEINT) * sp_${a}_$b - s_$a * s_$b) // 1073741824)
         |       * 1000000
         |      // (((CAST(n AS HUGEINT) * ss_$a - s_$a * s_$a) // 1073741824)
         |         * ((CAST(n AS HUGEINT) * ss_$b - s_$b * s_$b) // 1073741824))
         |  END AS BIGINT) AS r2_ppm
         |FROM m""".stripMargin }
    s"""WITH f AS (SELECT $feats FROM lineitem),
       |m AS (SELECT count(*) AS n, ${(sums ++ squares ++ crosses).mkString(", ")}
       |  FROM f)
       |${pairs.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** DuckDB twin of [[graft.functions.TextAnalysis.md5Prefix32]]: parse the
    * first 8 hex digits of md5 as a BIGINT (no hex-cast builtin in DuckDB
    * 1.0; 16**i fits exactly in doubles, so the digit fold is exact).
    */
  /** DuckDB twin of [[org.apache.spark.sql.graft.RollingPoly32Array]]: the
    * per-position Karp–Rabin window hash as an unrolled Σ codepoint·Bʲ mod
    * M over a codepoint list `cs` (1-based position variable `i`). The
    * power constants are generated from [[RollingPolyUtil.powers]] so the
    * two engines' polynomials can never drift.
    */
  private[graft] def rollingFpsSql(csList: String): String = {
    import org.apache.spark.sql.graft.RollingPolyUtil
    val terms = RollingPolyUtil.powers.zipWithIndex
      .map { case (p, j) => s"$csList[i+$j]*$p" }.mkString(" + ")
    s"""CASE WHEN len($csList) >= ${RollingPolyUtil.K} THEN
       |      list_transform(range(1, len($csList) - ${RollingPolyUtil.K - 2}),
       |        i -> ($terms) % ${RollingPolyUtil.M})
       |    ELSE CAST([] AS BIGINT[]) END""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Corpus.hashedGrams]]: a WITH-clause
    * prefix defining `hashed(source, g, h)` — `g` the exact base-256
    * byte-packed 8-gram ([[org.apache.spark.sql.graft.RollingPackUtil]]:
    * injective, so count(DISTINCT g) is the byte-exact gram count), `h`
    * the [[org.apache.spark.sql.graft.GramMixUtil.mix32]] multiply–
    * xorshift finalizer spelled as layered CTEs (every intermediate exact
    * in signed 64-bit). Codepoints equal bytes on this ASCII corpus —
    * the same cross-engine contract as the rolling-poly fingerprints,
    * enforced by this very oracle at every scale it runs.
    */
  private[graft] def packedGramsSql: String = {
    val powers = (0 until 8).map(j => (0 until 7 - j).foldLeft(1L)((a, _) => a * 256L))
    val terms = powers.zipWithIndex.map { case (p, j) => s"cs[i+$j]*$p" }.mkString(" + ")
    s"""codes AS (
       |  SELECT source,
       |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
       |  FROM documents),
       |sh AS (
       |  SELECT source, unnest(CASE WHEN len(cs) >= 8 THEN
       |      list_transform(range(1, len(cs) - 6), i -> $terms)
       |    ELSE CAST([] AS BIGINT[]) END) AS g
       |  FROM codes),
       |m1 AS (SELECT source, g,
       |  ((g % 4294967296) * 1640531527 % 4294967296
       |   + (g // 4294967296) * 2654435761 % 4294967296) % 4294967296 AS t FROM sh),
       |m2 AS (SELECT source, g, xor(t, t // 65536) AS v FROM m1),
       |m3 AS (SELECT source, g, v * 1103515245 % 4294967296 AS u FROM m2),
       |hashed AS (SELECT source, g, xor(u, u // 65536) AS h FROM m3)""".stripMargin
  }

  private[graft] def md5Prefix32Sql(e: String): String =
    s"CAST(list_sum(list_transform(range(0, 8), hx -> " +
      s"CAST(strpos('0123456789abcdef', substring(md5($e), CAST(hx + 1 AS INTEGER), 1)) - 1 AS BIGINT)" +
      s" * CAST(16 ** (7 - hx) AS BIGINT))) AS BIGINT)"

  /** DuckDB twin of [[TextAnalysis.qualityScore]] — shared by q34 and the
    * q80 curriculum cuts layered on top of it.
    */
  private[graft] def qualityScoreOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      |base AS (
      |  SELECT doc_id,
      |    CAST(len(t) AS DOUBLE) AS n_tokens,
      |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS punct,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS DOUBLE) AS stop,
      |    CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
      |    CAST(length(text) AS DOUBLE) AS n_chars_d
      |  FROM toks)
      |SELECT doc_id, n_tokens,
      |  punct / n_chars_d AS punct_ratio,
      |  stop / n_tokens AS stopword_ratio,
      |  ttr AS type_token_ratio,
      |  0.4 * least(n_tokens / 50.0, 1.0)
      |    + 0.2 * least((stop / n_tokens) * 5.0, 1.0)
      |    + 0.2 * ttr
      |    + 0.2 * (1.0 - least((punct / n_chars_d) * 10.0, 1.0)) AS quality_score
      |FROM base""".stripMargin

  /** CTE chain shared by the q39 and q45 twins: md5-prefix shingle hashes,
    * the fixed permutation algebra of
    * [[org.apache.spark.sql.graft.MinHashSignature]] (m_j = min_i
    * ((h_i mod p)·a_j + b_j) mod p with a_j = (2654435761·(j+1)) mod p,
    * b_j = (1000003·(j+1)) mod p, p = 2³¹−1 — h reduced mod p before the
    * multiply on BOTH engines, keeping products < 2⁶²),
    * content band keys, and the
    * est-Jaccard-filtered pair set as final CTE `mh_pairs`.
    */
  private[graft] def minhashCtes: String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(0, len(t) - 2),
       |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
       |  FROM toks WHERE len(t) >= 3),
       |hs AS (
       |  SELECT doc_id, list_transform(shingles, s -> ${md5Prefix32Sql("s")}) AS hs
       |  FROM sh),
       |sigs AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), j ->
       |      list_min(list_transform(hs,
       |        h -> ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647) + (1000003 * (j + 1)) % 2147483647) % 2147483647))) AS sig
       |  FROM hs WHERE len(hs) > 0),
       |bands AS (SELECT unnest(range(0, 16)) AS band),
       |banded AS (
       |  SELECT doc_id, sig, band,
       |    array_to_string(list_transform(sig[band*4+1 : band*4+4],
       |      x -> CAST(x AS VARCHAR)), '_') AS bk
       |  FROM sigs CROSS JOIN bands),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS sig_a, b.sig AS sig_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |mh_pairs AS (
       |  SELECT a_id, b_id, est_jaccard FROM (
       |    SELECT a_id, b_id,
       |      CAST(list_sum(list_transform(range(0, 64),
       |        i -> CASE WHEN sig_a[i+1] = sig_b[i+1] THEN 1 ELSE 0 END)) AS DOUBLE) / 64
       |        AS est_jaccard
       |    FROM cand)
       |  WHERE est_jaccard >= 0.5)""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.minhashPairs]]. */
  private[graft] def minhashOracle: String =
    s"""WITH $minhashCtes
       |SELECT a_id, b_id, est_jaccard FROM mh_pairs""".stripMargin

  /** Shared DuckDB chain for the itemKNN family (q107/q108): deduped
    * integer ratings → norms → user-keyed co-rating pairs (support ≥ 2) →
    * mirrored, cosine-scored neighbor candidates. Mirrors
    * [[graft.operators.Reco.itemNeighbors]] up to its ExactTopK cut.
    *
    * The chain runs over whatever CTE block defines `r` (userId,
    * productId, rv) — parameterized so q201's holdout evaluation can run
    * the identical chain over the TRAIN split only (its `rDef` filters
    * by the md5 draw before `r`).
    */
  private[graft] def itemCfChainFrom(rDef: String): String =
    s"""$rDef,
       |norms AS (
       |  SELECT productId, CAST(sum(rv * rv) AS BIGINT) AS s2 FROM r GROUP BY 1),
       |pairs AS MATERIALIZED (
       |  -- MATERIALIZED: the chain's one Σdeg² blowup. Every consumer
       |  -- reads it at least twice (mir's UNION ALL; q239 a third time
       |  -- for the cos² pair lookup) — inlined, DuckDB re-derives the
       |  -- self-join per reference and its sf1.0 join order spilled >40 GB
       |  -- on q239 (the round-13 gate had to route temp to tmpfs).
       |  -- Materialized once, the aggregate output is ~1e6 rows. Pure
       |  -- hint — results identical.
       |  SELECT a.productId AS pa, b.productId AS pb,
       |    CAST(sum(a.rv * b.rv) AS BIGINT) AS dot,
       |    CAST(count(*) AS BIGINT) AS support,
       |    CAST(sum(a.rv - b.rv) AS BIGINT) AS dsum
       |  FROM r a JOIN r b ON a.userId = b.userId AND a.productId < b.productId
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |mir AS (
       |  SELECT pa AS item, pb AS neighbor, dot, support FROM pairs
       |  UNION ALL
       |  SELECT pb, pa, dot, support FROM pairs),
       |scored AS (
       |  SELECT item, neighbor, dot, support,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(na.s2 * nb.s2 AS DOUBLE)) AS cos
       |  FROM mir JOIN norms na ON na.productId = item
       |           JOIN norms nb ON nb.productId = neighbor)""".stripMargin

  private[graft] def itemCfCtes: String = itemCfChainFrom(
    // MATERIALIZED: `r` is referenced 2-4x per CF oracle; inlined, DuckDB's
    // sf1.0 join orders recompute the 6M-row dedup repeatedly (and q239's
    // plan spilled to ENOSPC). Pure hint — results identical.
    s"""$ratingsCte,
       |r AS MATERIALIZED (
       |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
       |  FROM ratings GROUP BY 1, 2)""".stripMargin)

  /** [[itemCfCtes]] over the q281-q284 slice population (userId %
    * [[CfSliceMod]]) — the sf10-oracle-sized twin chain.
    */
  private[graft] def itemCfSliceCtes: String = itemCfChainFrom(
    s"""$ratingsCte,
       |r AS MATERIALIZED (
       |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
       |  FROM ratings WHERE userId % $CfSliceMod = 0 GROUP BY 1, 2)""".stripMargin)

  /** DuckDB twin of [[graft.operators.Dedup.ngramJaccardPairs]] — shared by
    * the q36 oracle and the q85 LSH-quality oracle (where it is the exact
    * truth side).
    */
  private[graft] def ngramJaccardOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
       |strsh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(0, len(t) - 2),
       |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
       |  FROM toks WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(shingles, s -> ${md5Prefix32Sql("s")}))) AS shingle
       |  FROM strsh),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |shf AS (
       |  SELECT doc_id, shingle FROM (
       |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
       |  WHERE df <= 1000),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, inter, jaccard FROM (
       |  SELECT i.a_id, i.b_id, i.inter,
       |    CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) AS jaccard
       |  FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.a_id
       |  JOIN sz sb ON sb.doc_id = i.b_id)
       |WHERE jaccard >= 0.5""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.incrementalNearDups]] as wired
    * in q59: incoming = doc_id%10<3, corpus = the rest. Reuses the
    * [[minhashCtes]] signature/banding algebra; the only change is the
    * candidate join (incoming × corpus across the split, no `<` order) and
    * the per-incoming-doc aggregate.
    */
  private[graft] def incrementalNearDupOracle: String =
    s"""WITH $minhashCtes,
       |inc AS (SELECT * FROM banded WHERE doc_id % 10 < 3),
       |corp AS (SELECT * FROM banded WHERE doc_id % 10 >= 3),
       |ipairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_of,
       |    a.sig AS sig_a, b.sig AS sig_b
       |  FROM inc a JOIN corp b ON a.band = b.band AND a.bk = b.bk),
       |iest AS (
       |  SELECT doc_id, dup_of,
       |    CAST(list_sum(list_transform(range(0, 64),
       |      i -> CASE WHEN sig_a[i+1] = sig_b[i+1] THEN 1 ELSE 0 END)) AS DOUBLE) / 64
       |      AS est_jaccard
       |  FROM ipairs)
       |SELECT doc_id, count(*) AS n_matches, max(est_jaccard) AS best_est,
       |  min(dup_of) AS dup_of_min
       |FROM iest WHERE est_jaccard >= 0.5 GROUP BY doc_id""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.crossCorpusContamination]] as
    * wired in q60: train = doc_id%5<>0, test = doc_id%5=0, word 8-grams
    * md5-prefix-hashed to BIGINT on both sides (q36 pattern).
    */
  private[graft] def contaminationOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
       |strsh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(0, len(t) - 7),
       |      i -> array_to_string(t[i+1:i+8], ' '))) AS shingles
       |  FROM toks WHERE len(t) >= 8),
       |g AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(shingles, s -> ${md5Prefix32Sql("s")}))) AS g
       |  FROM strsh)
       |SELECT tr.doc_id AS doc_id,
       |  count(DISTINCT tr.g) AS n_shared_grams,
       |  count(DISTINCT te.doc_id) AS n_test_docs
       |FROM (SELECT * FROM g WHERE doc_id % 5 <> 0) tr
       |JOIN (SELECT * FROM g WHERE doc_id % 5 = 0) te ON tr.g = te.g
       |GROUP BY tr.doc_id""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.nearDupClusters]]: the q39 pair
    * set, closed transitively (recursive min-label CTE, same shape as the
    * q19 oracle), left-joined back to every document — singletons cluster
    * to themselves.
    */
  private[graft] def nearDupClustersOracle: String =
    s"""WITH RECURSIVE $minhashCtes,
       |nd_edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM mh_pairs
       |  UNION ALL SELECT b_id AS src, a_id AS dst FROM mh_pairs),
       |reach(id, label) AS (
       |  SELECT DISTINCT src AS id, src AS label FROM nd_edges
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN nd_edges e ON e.src = r.id
       |  WHERE r.label < e.dst),
       |comp AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)
       |SELECT d.doc_id,
       |       COALESCE(c.cluster, d.doc_id) AS cluster,
       |       COALESCE(c.cluster, d.doc_id) = d.doc_id AS is_canonical
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.simhashPairs]] (maxHamming=3):
    * md5-nibble bit votes, four 16-bit chunks, chunk-equality candidates,
    * bit_count Hamming verify — generated column lists keep the 64 votes
    * mechanical.
    */
  private[graft] def simhashOracle: String = {
    val nibbleCols = (0 until 16).map(j =>
      s"CAST(strpos('0123456789abcdef', substring(h, ${j + 1}, 1)) - 1 AS BIGINT) AS n$j")
      .mkString(",\n    ")
    val voteCols = (0 until 64).map(i =>
      s"sum(CASE WHEN (n${i / 4} >> ${i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n    ")
    val chunkCols = (0 until 4).map { c =>
      (0 until 16).map(b => s"CASE WHEN v${c * 16 + b} > 0 THEN ${1 << b} ELSE 0 END")
        .mkString(" + ") + s" AS c$c"
    }.mkString(",\n    ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
       |  FROM documents),
       |hashed AS (SELECT doc_id, md5(t) AS h FROM toks),
       |nibbled AS (
       |  SELECT doc_id,
       |    $nibbleCols
       |  FROM hashed),
       |votes AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM nibbled GROUP BY doc_id),
       |sig AS (
       |  SELECT doc_id,
       |    $chunkCols
       |  FROM votes),
       |ks AS (SELECT unnest(range(0, 4)) AS chunk),
       |chunked AS (
       |  SELECT doc_id, c0, c1, c2, c3, chunk,
       |    CASE chunk WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS chunkVal
       |  FROM sig CROSS JOIN ks),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    a.c0 AS ac0, a.c1 AS ac1, a.c2 AS ac2, a.c3 AS ac3,
       |    b.c0 AS bc0, b.c1 AS bc1, b.c2 AS bc2, b.c3 AS bc3
       |  FROM chunked a JOIN chunked b
       |    ON a.chunk = b.chunk AND a.chunkVal = b.chunkVal AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, hamming FROM (
       |  SELECT a_id, b_id,
       |    CAST(bit_count(xor(ac0, bc0)) + bit_count(xor(ac1, bc1))
       |       + bit_count(xor(ac2, bc2)) + bit_count(xor(ac3, bc3)) AS INTEGER) AS hamming
       |  FROM cand)
       |WHERE hamming <= 3""".stripMargin
  }

  /** Unrolled MMR greedy (twin of [[Similarity.mmrSelect]]): the same
    * 64-candidate pool, then `k` selection rounds as MATERIALIZED CTEs
    * — each scores 0.5·rel − 0.5·max-sim-to-selected with the shared
    * [[cosineSql]] and picks by (score DESC, vec_id).
    */
  private[graft] def mmrOracle(k: Int): String = {
    val pool =
      s"""pool AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |    ${cosineSql("e.embedding", "q.q_emb")} AS rel
         |  FROM embeddings e
         |  CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0
         |  ORDER BY rel DESC, e.vec_id LIMIT 64)""".stripMargin
    val s1 =
      """s1 AS MATERIALIZED (
        |  SELECT vec_id, rel, 0.5 * rel - 0.5 * 0.0 AS score
        |  FROM pool ORDER BY 0.5 * rel - 0.5 * 0.0 DESC, vec_id LIMIT 1)""".stripMargin
    val rounds = (2 to k).map { i =>
      val prior = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      val selEmb = (1 until i).map(j =>
        s"SELECT e.embedding FROM pool e JOIN s$j ON e.vec_id = s$j.vec_id")
        .mkString(" UNION ALL ")
      s"""m$i AS (
         |  SELECT p.vec_id, p.rel,
         |    max(${cosineSql("p.embedding", "s.embedding")}) AS ms
         |  FROM pool p CROSS JOIN ($selEmb) s
         |  WHERE p.vec_id NOT IN ($prior)
         |  GROUP BY 1, 2),
         |s$i AS MATERIALIZED (
         |  SELECT vec_id, rel, 0.5 * rel - 0.5 * ms AS score
         |  FROM m$i ORDER BY 0.5 * rel - 0.5 * ms DESC, vec_id LIMIT 1)""".stripMargin
    }
    val unions = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, vec_id, rel, score FROM s$i")
      .mkString("\nUNION ALL\n")
    (Seq(pool, s1) ++ rounds).mkString(",\n") + "\n" + unions
  }

  /** ANSI twin of [[Similarity.cosine]]: left-fold double dot product /
    * norms, identical operand order → bit-identical doubles.
    */
  private[graft] def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($x) + 1), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  // ---------------------------------------------------------------------------
  // Oracle SQL shared fragments (ANSI twins of the Spark builders above)
  // ---------------------------------------------------------------------------

  /** ANSI-SQL twin of [[Tables.ratings]] — keep in lockstep. */
  private[graft] val ratingsCte: String =
    """ratings AS (
      |  SELECT o_custkey AS userId, l_partkey AS productId,
      |         CAST(CAST(FLOOR(l_quantity) AS BIGINT) % 5 + 1 AS DOUBLE) AS rating
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** ANSI-SQL twin of [[good]] (distinct good ratings). */
  private[graft] val goodCte: String =
    """good AS (
      |  SELECT DISTINCT userId, productId FROM ratings
      |  WHERE rating > 3.0 AND userId < 1000
      |)""".stripMargin

  private[graft] val pairsCte: String =
    """pairs AS (
      |  SELECT DISTINCT a.userId AS src, b.userId AS dst
      |  FROM good a JOIN good b
      |    ON a.productId = b.productId AND a.userId < b.userId
      |)""".stripMargin

  private[graft] val edgesCte: String =
    """edges AS (
      |  SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
      |)""".stripMargin

  /** Unrolled synchronous BFS (`rounds` fixed supersteps) as a
    * non-recursive CTE chain — the SQL twin of
    * [[graft.plans.GraphOps.bfsLayers]]. Ends with CTE `v<rounds>`
    * holding (id, layer). MATERIALIZED for the kCoreCtes reason.
    */
  private[graft] def bfsCtes(rounds: Int): String =
    bfsCtesFrom("v", "SELECT min(src) AS id, 0 AS layer FROM edges", rounds)

  /** [[bfsCtes]] parameterized on the CTE prefix and the seed SELECT —
    * so q276's double sweep can run two independent chains ("v", "w").
    */
  private[graft] def bfsCtesFrom(p: String, seedSql: String, rounds: Int): String = {
    val init = s"${p}0 AS MATERIALIZED ($seedSql)"
    val steps = (1 to rounds).map { i =>
      s"""${p}f$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS id FROM edges e
         |  JOIN $p${i - 1} v ON e.src = v.id AND v.layer = ${i - 1}),
         |$p$i AS MATERIALIZED (
         |  SELECT id, layer FROM $p${i - 1}
         |  UNION ALL
         |  SELECT f.id, ${i} AS layer FROM ${p}f$i f
         |  WHERE NOT EXISTS (SELECT 1 FROM $p${i - 1} p WHERE p.id = f.id))""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** Unrolled synchronous k-core peeling (`rounds` fixed supersteps) as a
    * non-recursive CTE chain — the SQL twin of
    * [[graft.plans.GraphOps.kCore]] (whose early exit only fires at a
    * fixpoint, where further peels are no-ops). Ends with CTE `e<rounds>`.
    */
  private[graft] def kCoreCtes(k: Int, rounds: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    // round references its predecessor 3× — 3^rounds copies of the base
    // scan exhausts file handles before it exhausts patience
    val init = "e0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM pairs)"
    val peels = (1 to rounds).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT u FROM (
         |    SELECT u, count(*) AS deg FROM (
         |      SELECT u, v FROM e${i - 1} UNION ALL SELECT v, u FROM e${i - 1})
         |    GROUP BY u) WHERE deg >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${i - 1} e
         |  JOIN s$i a ON e.u = a.u JOIN s$i b ON e.v = b.u)""".stripMargin
    }
    (init +: peels).mkString(",\n")
  }

  /** Unrolled fixed-round k-truss peel ending in CTE `t<rounds>`; the
    * per-round support CTEs reuse the q90 wedge-join shape. MATERIALIZED
    * for the same fan-out reason as [[kCoreCtes]].
    */
  private[graft] def kTrussCtes(k: Int, rounds: Int): String = {
    val init = "t0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM pairs)"
    def supSql(i: Int, of: Int): String =
      s"""sup$i AS MATERIALIZED (
         |  SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
         |  FROM t$of e
         |  JOIN (SELECT u, v FROM t$of UNION ALL SELECT v, u FROM t$of) s1
         |    ON s1.u = e.u
         |  JOIN (SELECT u, v FROM t$of UNION ALL SELECT v, u FROM t$of) s2
         |    ON s2.u = e.v AND s2.v = s1.v
         |  GROUP BY 1, 2)""".stripMargin
    val peels = (1 to rounds).map { i =>
      s"""${supSql(i, i - 1)},
         |t$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM t${i - 1} e
         |  JOIN sup$i s ON e.u = s.u AND e.v = s.v AND s.sup >= ${k - 2})""".stripMargin
    }
    ((init +: peels) :+ supSql(rounds + 1, rounds)).mkString(",\n")
  }

  /** Unrolled synchronous label propagation (fixed 5 supersteps, Gelly
    * max-label tiebreak) as a non-recursive CTE chain — the SQL twin of
    * [[LabelPropagation.run]]. Ends with CTE `l<iters>`.
    */
  private[graft] def lpCtes(iters: Int): String = {
    val init = "l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges)"
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id, l.label AS label, count(*) AS cnt
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.id
         |  GROUP BY e.dst, l.label
         |),
         |b$i AS (
         |  SELECT id, label FROM (
         |    SELECT id, label,
         |           row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label DESC) AS rn
         |    FROM c$i)
         |  WHERE rn = 1
         |),
         |l$i AS (
         |  SELECT p.id AS id, COALESCE(b.label, p.label) AS label
         |  FROM l${i - 1} p LEFT JOIN b$i b ON p.id = b.id
         |)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  /** Unrolled scaled-integer PageRank (twin of [[graft.plans.GraphOps
    * .pageRank]]): per round, per-edge floor-division contributions summed
    * on the destination, damped with the same integer algebra. Ends with
    * CTE `r<iters>` holding (v, r).
    */
  private[graft] def pageRankCtes(iters: Int): String = {
    val init =
      """deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT src AS v, 1000000000000 // n AS r FROM deg CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS v, CAST(sum(r.r // d.deg) AS BIGINT) AS cs
         |  FROM edges e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON r.v = e.src
         |  GROUP BY 1
         |),
         |r$i AS (
         |  SELECT p.v, (1000000000000 * 15 // 100 // nn.n)
         |    + (85 * COALESCE(c.cs, 0) // 100) AS r
         |  FROM r${i - 1} p LEFT JOIN c$i c ON c.v = p.v CROSS JOIN nn
         |)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  /** [[graft.operators.NdcgWeights]] as DuckDB list literals (q269) —
    * the SAME JVM-computed integers Spark's plan embeds, 1-indexed.
    */
  private[graft] val NdcgWeightsSqlList: String =
    operators.NdcgWeights.micro.take(5).mkString("[", ", ", "]")
  private[graft] val NdcgPrefixSqlList: String =
    operators.NdcgWeights.prefix.take(5).mkString("[", ", ", "]")

  /** Unrolled Luby-MIS rounds (q270) over the symmetric `edges` CTE —
    * same packed pk = md5·2³¹+id priorities, same strict neighbor-max
    * winner rule, same winner/neighbor removal per round. MATERIALIZED
    * is load-bearing (the kCoreCtes reason): each round references its
    * predecessor 4×, and inlined CTEs would re-evaluate exponentially.
    */
  private[graft] def lubyCtes(rounds: Int): String = {
    val init =
      s"""vs AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
         |pkt AS MATERIALIZED (SELECT id,
         |  ${md5Prefix32Sql("'mis:' || CAST(id AS VARCHAR)")} * 2147483648 + id
         |    AS pk FROM vs),
         |u0 AS MATERIALIZED (SELECT id FROM vs),
         |m0 AS MATERIALIZED (SELECT id FROM vs WHERE FALSE),
         |oo0 AS MATERIALIZED (SELECT id FROM vs WHERE FALSE)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""nm$r AS MATERIALIZED (
         |  SELECT e.src AS id, max(pn.pk) AS mx
         |  FROM edges e
         |  JOIN u${r - 1} ua ON e.src = ua.id
         |  JOIN u${r - 1} ub ON e.dst = ub.id
         |  JOIN pkt pn ON pn.id = e.dst
         |  GROUP BY 1),
         |w$r AS MATERIALIZED (
         |  SELECT u.id FROM u${r - 1} u
         |  JOIN pkt p ON p.id = u.id
         |  LEFT JOIN nm$r n ON n.id = u.id
         |  WHERE n.mx IS NULL OR p.pk > n.mx),
         |no$r AS MATERIALIZED (
         |  SELECT DISTINCT e.src AS id FROM edges e
         |  JOIN w$r w ON e.dst = w.id
         |  JOIN u${r - 1} u ON e.src = u.id),
         |m$r AS MATERIALIZED (SELECT id FROM m${r - 1} UNION SELECT id FROM w$r),
         |oo$r AS MATERIALIZED (SELECT id FROM oo${r - 1} UNION SELECT id FROM no$r),
         |u$r AS MATERIALIZED (SELECT id FROM u${r - 1}
         |  EXCEPT SELECT id FROM w$r EXCEPT SELECT id FROM no$r)""".stripMargin
    }
    (init +: rs).mkString(",\n")
  }

  /** Seeded-teleport twin of [[pageRankCtes]] (q257): identical rounds,
    * teleport mass only at v ≡ 0 mod 100, everything BIGINT floor math.
    */
  private[graft] def personalizedPageRankCtes(iters: Int): String = {
    val init =
      """deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |ns AS (SELECT count(*) AS ns FROM deg WHERE src % 100 = 0),
        |p0 AS (SELECT src AS v,
        |  CASE WHEN src % 100 = 0 THEN 1000000000000 // ns ELSE 0 END AS r
        |  FROM deg CROSS JOIN ns)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pc$i AS (
         |  SELECT e.dst AS v, CAST(sum(r.r // d.deg) AS BIGINT) AS cs
         |  FROM edges e JOIN deg d ON e.src = d.src JOIN p${i - 1} r ON r.v = e.src
         |  GROUP BY 1
         |),
         |p$i AS (
         |  SELECT p.v,
         |    (CASE WHEN p.v % 100 = 0 THEN 1000000000000 * 15 // 100 // ns.ns
         |      ELSE 0 END)
         |    + (85 * COALESCE(c.cs, 0) // 100) AS r
         |  FROM p${i - 1} p LEFT JOIN pc$i c ON c.v = p.v CROSS JOIN ns
         |)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  private[graft] def graphPrefix: String =
    s"WITH $ratingsCte,\n$goodCte,\n$pairsCte,\n$edgesCte,\n${lpCtes(5)}"

  /** ANSI twin of [[Reco.recommendations]] over `l5` + `good` (community-
    * product rewrite — see the algebra note in Reco.recommendations).
    */
  private[graft] val recsCtes: String =
    """comm_products AS (
      |  SELECT DISTINCT l.label, g.productId
      |  FROM l5 l JOIN good g ON l.id = g.userId
      |),
      |cand AS (
      |  SELECT l.id AS userId, c.productId
      |  FROM l5 l JOIN comm_products c ON l.label = c.label
      |),
      |unseen AS (
      |  SELECT c.userId, c.productId FROM cand c
      |  LEFT JOIN good r ON c.userId = r.userId AND c.productId = r.productId
      |  WHERE r.userId IS NULL
      |),
      |recs AS (
      |  SELECT userId, (list_sort(list(productId)))[1:20] AS recommendedProducts
      |  FROM unseen GROUP BY userId
      |)""".stripMargin
}
