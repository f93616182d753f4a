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
object SparkEntry {

  /** Flagship query (SURVEY.md §7 step 4): the full J2 recommendation
    * pipeline — good ratings → co-rating graph → label-propagation
    * communities → per-user recommendation sets. Driver smoke-checks rows>0
    * on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    qRecommendations(spark, "/root/testdata/sf0.001")

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
  private val dfCache =
    new java.util.HashMap[SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()
  private def cached(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
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

  private def good(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "good") {
      Reco.goodRatings(Tables.ratings(spark, dir))
        .select("userId", "productId").distinct().cache()
    }

  private def coPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "pairs") {
      Reco.coRatingPairs(Reco.goodRatings(Tables.ratings(spark, dir))).cache()
    }

  private def communityLabels(spark: SparkSession, dir: String): DataFrame =
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
  private def cfDeduped(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_deduped") {
      // barrier (eager localCheckpoint) already stops recomputation; the
      // cache() layers a columnar in-memory copy on top because q108 scans
      // this table twice more (scoring join + rated anti-join)
      Reco.dedupedRatings(Tables.ratings(spark, dir)).cache()
    }

  /** The co-rated pair table WITH its train-split twin from one combined
    * fan-out (the family's Σdeg² cost, paid once for q107/q108/q173/q191
    * AND the q201/q212 holdout retrain — [[Reco.itemPairsWithHoldout]]).
    */
  private def cfPairsAll(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_pairs_all") {
      Reco.itemPairsWithHoldout(holdoutSplitDf(spark, dir))
    }

  /** The full-corpus pair view of [[cfPairsAll]] — bit-identical to the
    * old standalone `Reco.itemPairs(cfDeduped)` frame (spec-proven).
    */
  private def cfPairs(spark: SparkSession, dir: String): DataFrame =
    cfPairsAll(spark, dir).select("pa", "pb", "dot", "support", "dsum")

  private def cfNeighbors(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_neighbors") {
      Reco.itemNeighborsFromPairs(cfDeduped(spark, dir), cfPairs(spark, dir)).cache()
    }

  /** The full-corpus itemKNN predictions, memoized so q108 and q218's
    * coverage audit pay the scoring join once per session.
    */
  private def cfPreds(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "cf_preds") {
      Reco.cfPredictionsFrom(cfDeduped(spark, dir), cfNeighbors(spark, dir)).cache()
    }

  /** The offline-eval holdout stages, memoized so q201 (hit rate) and
    * q212 (MRR) pay the retrained pair fan-out once per session: the
    * md5 split is barriered, the ranked top-k prediction table is
    * cached (both metrics probe it).
    */
  private def holdoutSplitDf(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_split") {
      Reco.holdoutSplit(cfDeduped(spark, dir))
    }

  private def holdoutRanked(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "holdout_ranked") {
      Reco.holdoutRankedPredsFromPairs(holdoutSplitDf(spark, dir),
        cfPairsAll(spark, dir)).cache()
    }

  /** The corpus 8-gram explode+hash is the dominant cost of BOTH HLL
    * queries (q102 per-source sketches, q147 merge proof) — one barriered
    * materialization per session, exactly the shared scan a cluster
    * deployment would stage.
    */
  private def hllGrams(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "hll_grams") {
      Corpus.hashedGrams(Tables.documents(spark, dir))
    }


  /** The token-shingle similarity family's persisted artifacts, memoized
    * per session exactly as a cluster deployment would persist them: the
    * per-doc hashed shingle SETS (q106's verify table), their exploded
    * inverted INDEX (q36/q133's join input), q36's exact Jaccard pair
    * result (q85's truth), and q39's LSH candidate pairs (q85's estimate
    * and q45's closure input). Before this seam, q85 re-ran BOTH full
    * pipelines and q45 re-ran the LSH — the bench's biggest redundancy.
    */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "shingle_sets") {
      Dedup.shingleSets(Tables.documents(spark, dir))
    }

  private def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "shingle_index") {
      Dedup.shingleIndexFrom(shingleSets(spark, dir))
    }

  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "jaccard_pairs") {
      Dedup.ngramJaccardPairsFrom(shingleIndex(spark, dir))
        .transform(graft.barrier)
    }

  private def mhPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "minhash_pairs") {
      Dedup.minhashPairs(Tables.documents(spark, dir))
        .transform(graft.barrier)
    }

  /** Hashing-trick doc vectors (q261), memoized so q262's re-ranker
    * reads the same |docs|·≤64-row table instead of re-exploding the
    * corpus — on a cluster this is the persisted feature table.
    */
  private def hashedVectors(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "hashed_vectors") {
      Corpus.hashedVectorizer(Tables.documents(spark, dir))
        .transform(graft.barrier)
    }

  /** Near-dup cluster labels (q45), memoized per session so q73's
    * weighting reuses the LSH/CC run instead of repeating it. The frame is
    * |docs| rows × 3 narrow columns — on a cluster this is the persisted
    * cluster-assignment table every downstream dedup consumer reads.
    */
  private def nearDupClusterLabels(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "neardup_clusters") {
      Dedup.nearDupClustersFromPairs(Tables.documents(spark, dir),
        mhPairs(spark, dir)
          .select(col("a_id").as("src"), col("b_id").as("dst"))).cache()
    }

  private def qRecommendations(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "recs") {
      Reco.recommendations(communityLabels(spark, dir), good(spark, dir)).cache()
    }

  private def qStreamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val reviews = Tables.ratings(spark, dir).select("userId").distinct()
    RealTime.enrich(
      reviews,
      qRecommendations(spark, dir),
      Reco.topProducts(Tables.ratings(spark, dir)))
  }

  // ---------------------------------------------------------------------------
  // Driver contract maps
  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: J1 (SURVEY §2 rows 1.1-1.6) ----
    "q01_top_products" -> ((s, dir) => Reco.topProducts(Tables.ratings(s, dir))),
    // J2 rows 2.2-2.4 — filters + projection
    "q02_good_ratings" -> ((s, dir) =>
      Reco.goodRatings(Tables.ratings(s, dir)).select("userId", "productId", "rating")),
    // J2 rows 2.6-2.7 — co-rating pair self-join + distinct
    "q03_corating_pairs" -> ((s, dir) => coPairs(s, dir)),
    // J2 row 2.8 — undirected closure (cached pairs: both union branches
    // read the same materialization instead of re-running the self-join)
    "q04_undirected_edges" -> ((s, dir) => Reco.undirected(coPairs(s, dir))),
    // graph cohesion: exact triangle count over the canonical pair list
    // (wedge join + closing equi-join; reuses the memoized q03 pairs)
    "q90_triangle_count" -> ((s, dir) => plans.GraphOps.triangleCount(coPairs(s, dir))),
    // per-vertex cohesion: triangles credited to all three corners of the
    // canonical wedge join, over C(deg,2) — exact-integer division
    "q129_clustering_coeff" -> ((s, dir) =>
      plans.GraphOps.clusteringCoefficients(coPairs(s, dir))),
    // degree mixing: Newman assortativity from exact DECIMAL moments over
    // the symmetrized co-rating edges (one double division at the end)
    "q143_assortativity" -> ((s, dir) =>
      plans.GraphOps.degreeAssortativity(coPairs(s, dir))),
    // density filter: fixed-round synchronous 3-core peeling over the
    // memoized co-rating pairs (survivors + their in-subgraph degree)
    "q151_kcore" -> ((s, dir) => plans.GraphOps.kCore(coPairs(s, dir))),
    // 17-truss edge peel over the same pair seam: edges embedded in >= 15
    // surviving triangles, fixed-round wedge-join contract (q151 form)
    "q214_ktruss" -> ((s, dir) => plans.GraphOps.kTruss(coPairs(s, dir))),
    // synchronous BFS from the min-id seed over the co-rating closure:
    // per-layer reachability counts (fixed supersteps, unrollable twin)
    "q174_bfs_layers" -> ((s, dir) =>
      plans.GraphOps.bfsLayers(Reco.undirected(coPairs(s, dir)))),
    // triadic-closure candidates: common-neighbor count + neighborhood
    // Jaccard for non-edges, global top-100 heap (TakeOrderedAndProject)
    "q154_link_prediction" -> ((s, dir) =>
      plans.GraphOps.linkPrediction(coPairs(s, dir))),
    // graph centrality: 3-iteration PageRank in scaled-integer arithmetic
    // (floor-division damping -> bit-identical ranks on any engine/partitioning)
    "q96_pagerank" -> ((s, dir) =>
      plans.GraphOps.pageRank(Reco.undirected(coPairs(s, dir)))
        .select(col("v").as("user_id"), col("r").as("rank_scaled"))),
    // HITS authorities over the bipartite rating graph in exact
    // path-count integers (unnormalized power iteration, same ranking)
    "q160_hits" -> ((s, dir) =>
      plans.GraphOps.hits(
        Reco.goodRatings(Tables.ratings(s, dir))
          .select(col("userId"), col("productId")).distinct())),
    // Support 4.3/4.4 — deterministic DB/stream split
    "q05_sample_split" -> ((s, dir) => Reco.sampleSplit(Tables.ratings(s, dir))),
    // J2 rows 2.9-2.11 — label propagation communities
    "q06_communities" -> ((s, dir) => communityLabels(s, dir)),
    // J2 row 2.12 — community sizes
    "q07_community_sizes" -> ((s, dir) => Reco.communitySizes(communityLabels(s, dir))),
    // J2 row 2.15 — flagship recommendation generation. The library result
    // keeps the natural array<long> column (see entry()/qRecommendations);
    // the registered form serializes it to a canonical CSV string because
    // the driver's pandas compare cannot sort/hash ndarray cells.
    "q08_recommendations" -> ((s, dir) =>
      qRecommendations(s, dir).select(
        col("userId"),
        array_join(col("recommendedProducts").cast("array<string>"), ",")
          .as("recommendedProducts"))),
    // J3 rows 3.4-3.5 — stream enrichment (batch twin of RealTime.enrich);
    // same canonical-CSV serialization of the array output.
    "q09_stream_enrich" -> ((s, dir) =>
      qStreamEnrich(s, dir).select(
        col("userId"),
        array_join(col("recommendedProducts"), ",").as("recommendedProducts"))),

    // ---- general relational coverage (SURVEY §2 "no instance" categories) ----
    "q10_pricing_summary" -> ((s, dir) => Relational.pricingSummary(Tables.lineitem(s, dir))),
    // irregular price-tier lookup as a bucketed equi-join (never a
    // nested-loop range join); weight = exact price cents
    "q117_bucket_range_lookup" -> ((s, dir) =>
      Relational.bucketRangeLookup(
        Tables.lineitem(s, dir).select(
          expr("CAST(floor(l_extendedprice) AS BIGINT)").as("v"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("weight")),
        Seq(("b1_budget", 0L, 2000L), ("b2_mid", 2000L, 10000L),
          ("b3_upper", 10000L, 30000L), ("b4_premium", 30000L, 70000L),
          ("b5_luxury", 70000L, 200000L)),
        bucketWidth = 2000L)),
    "q11_revenue_by_nation" -> ((s, dir) =>
      Relational.revenueByNation(Tables.orders(s, dir), Tables.customer(s, dir), Tables.nation(s, dir))),
    "q12_top_orders_per_customer" -> ((s, dir) => Relational.topOrdersPerCustomer(Tables.orders(s, dir))),
    "q13_order_rollup" -> ((s, dir) => Relational.orderRollup(Tables.orders(s, dir))),
    "q14_lineitem_cube" -> ((s, dir) => Relational.lineitemCube(Tables.lineitem(s, dir))),
    "q15_semi_join" -> ((s, dir) =>
      Relational.customersWithOpenOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q16_anti_join" -> ((s, dir) =>
      Relational.customersWithoutOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q17_setops" -> ((s, dir) =>
      Relational.setOpsSymmetricDiff(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q18_event_scalars" -> ((s, dir) => Relational.eventScalars(Tables.events(s, dir))),
    // statistical aggregates from exact decimal moments (order-independent,
    // unlike the float-summing corr/covar built-ins → oracle-able)
    "q46_event_stats" -> ((s, dir) => Relational.eventStats(Tables.events(s, dir))),
    // analytic window sweep: lag/lead/ntile/percent_rank/cume_dist/first
    "q57_window_analytics" -> ((s, dir) => Relational.windowAnalytics(Tables.events(s, dir))),
    // range join via binned equi-join (a naive |x-y|<=r predicate would
    // plan as a nested loop — see PlanSpec assertion)
    "q47_range_join" -> ((s, dir) => Relational.rangeJoinNeighbors(Tables.events(s, dir))),
    // grouped top-K via the ExactTopK map-side aggregate with a REAL score
    // (value DESC, event_id ASC tiebreak) — each mapper ships ≤K entries
    // per group into the shuffle, vs a full sort window
    "q49_topk_events_per_type" -> ((s, dir) => {
      val topk = org.apache.spark.sql.graft.shim.column(
        org.apache.spark.sql.graft.ExactTopK(
          org.apache.spark.sql.graft.shim.expression(col("value")),
          org.apache.spark.sql.graft.shim.expression(col("event_id")),
          3).toAggregateExpression())
      Tables.events(s, dir).groupBy(col("event_type")).agg(topk.as("tk"))
        .select(col("event_type"), posexplode(col("tk")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          col("col.payload").as("event_id"), col("col.score").as("value"))
    }),
    // exact interpolated percentiles (single-pass sort-based aggregate;
    // both engines use the p·(n−1) linear-interpolation definition)
    "q48_char_percentiles" -> ((s, dir) =>
      Tables.documents(s, dir).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"),
        max(col("n_chars")).as("max_chars"))),
    // Connected components over the co-rating graph — bounded alternating
    // large-star/small-star DataFrame rounds (GraphX Pregel fixpoint remains
    // as the interop cross-check in GraphOps/GraphSpec). Edge direction is
    // irrelevant to CC, so the canonical pair list feeds it directly.
    "q19_connected_components" -> ((s, dir) =>
      graft.plans.GraphOps.connectedComponentsDF(coPairs(s, dir))),

    // AS-OF temporal join (scalable union+running-last implementation)
    "q23_asof_join" -> ((s, dir) =>
      Relational.asofJoin(Tables.events(s, dir), Tables.orders(s, dir))),
    // HLL sketch distinct counts. The estimate itself has no cross-engine
    // twin, so the registered form emits the exact count plus an in-query
    // accuracy bound on the sketch — the oracle checks the exact columns
    // and that the bound holds (`approx_ok` must come back true).
    "q24_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_events"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= greatest(col("exact_users").cast("double") * 0.15, lit(5.0))).as("approx_ok"))),
    // Seeded-sample split parity (spliter.py:24-25): membership is engine-
    // specific, so the registered form emits the oracle-checkable invariants
    // of the split — exact complement cardinality and the sampled fraction.
    "q28_seeded_split" -> ((s, dir) => {
      val base = Tables.ratings(s, dir).where(col("userId") < 1000)
      val (db, stream) = Reco.seededSplit(Tables.ratings(s, dir))
      db.agg(count(lit(1)).as("n_db"))
        .crossJoin(stream.agg(count(lit(1)).as("n_stream")))
        .crossJoin(base.agg(count(lit(1)).as("n_total")))
        .select(col("n_total"),
          (col("n_db") + col("n_stream")).as("n_parts_sum"),
          (abs(col("n_db").cast("double") - col("n_total") * 0.7)
            <= col("n_total") * 0.05).as("frac_ok"))
    }),

    // GROUPING SETS with grouping_id (finer than rollup/cube)
    "q27_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       count(*) AS n_orders,
          |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin)
    }),
    // PIVOT: per-user event-type count matrix
    "q25_pivot" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)),
    // edit distance (dynamic-programming Levenshtein — identical ints in
    // any standard implementation, so oracle-safe)
    "q26_edit_distance" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"), col("c_name"),
        levenshtein(col("c_name"), lit("Customer#000000001")).as("dist"),
        levenshtein(col("c_mktsegment"), col("c_name")).as("seg_dist"))),

    // ---- event-time windows (batch forms; streaming twins in graft.streaming) ----
    "q20_window_tumbling" -> ((s, dir) => TimeWindows.tumbling(Tables.events(s, dir))),
    // per-window activity leaderboard via the ExactTopK map-side aggregate
    "q89_trending_users" -> ((s, dir) => TimeWindows.trendingUsers(Tables.events(s, dir))),
    "q21_window_sliding" -> ((s, dir) => TimeWindows.sliding(Tables.events(s, dir))),
    "q22_window_session" -> ((s, dir) => TimeWindows.sessions(Tables.events(s, dir))),
    // batch twin of the watermarked streaming dedup (RealTime.dedupReviews):
    // one surviving row per key, chosen as the earliest event (argmin via
    // min(struct) hash aggregate — no sort, no window)
    "q50_dedup_first_arrival" -> ((s, dir) =>
      RealTime.dedupFirstArrival(Tables.events(s, dir),
        Seq("user_id", "event_type"), "ts", "event_id")),
    // Skew.saltedEquiJoin under the grade: output is provably identical to
    // the plain equi-join (salting only changes partitioning, so the
    // plain-join oracle applies verbatim)
    "q51_salted_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val small = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      Skew.saltedEquiJoin(big, small, "custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }),
    // Bucketed-table join under the grade: both sides pre-shuffled on the
    // bucket key at write time, so the join AND the per-customer aggregate
    // run exchange-free (plan asserted in BucketingSpec); the aggregate
    // groups on the bucket key only (c_name via max) to keep the bucketed
    // HashPartitioning satisfying the aggregate's distribution.
    "q52_bucketed_join" -> ((s, dir) => cached(s, dir, "q52") {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val ob = s"orders_bkt$tag"; val cb = s"cust_bkt$tag"
      Bucketing.writeBucketed(
        Tables.orders(s, dir).select(col("o_custkey").as("custkey"), col("o_totalprice")),
        ob, "custkey", 8)
      Bucketing.writeBucketed(
        Tables.customer(s, dir).select(col("c_custkey").as("custkey"), col("c_name")),
        cb, "custkey", 8)
      Bucketing.bucketedJoin(s, ob, cb, "custkey")
        .groupBy(col("custkey"))
        .agg(max(col("c_name")).as("c_name"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    }),
    // Bloom-filter join pruning under the grade: the probe side is filtered
    // by a bitmap over the build side's keys before the exchange; false
    // positives die in the exact join, so the plain-join oracle applies
    // verbatim (same contract style as q51).
    "q58_bloom_prune_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      BloomPrune.bloomPruneJoin(
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
        urgent, "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    }),

    // ---- training-data pipeline: deduplication ----
    "q30_dedup_exact" -> ((s, dir) => Dedup.exactGroups(Tables.documents(s, dir))),
    "q31_dedup_canonical" -> ((s, dir) => Dedup.dropExactDuplicates(Tables.documents(s, dir))),
    "q36_ngram_jaccard" -> ((s, dir) => jaccardPairs(s, dir)),
    "q39_dedup_minhash" -> ((s, dir) => mhPairs(s, dir)),
    "q40_dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(Tables.documents(s, dir))),
    // end-to-end dedup: LSH pairs -> transitive closure -> cluster labels
    "q45_dedup_clusters" -> ((s, dir) => nearDupClusterLabels(s, dir)),
    // ingestion-time dedup: incoming batch (doc_id%10<3) LSH-checked against
    // the standing corpus (the rest) — no corpus self-join
    "q59_incremental_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalNearDups(
        docs.where(col("doc_id") % 10 >= 3), docs.where(col("doc_id") % 10 < 3))
    }),
    // benchmark decontamination: train docs sharing any word-8-gram with the
    // held-out test split (doc_id%5==0)
    "q60_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.crossCorpusContamination(
        docs.where(col("doc_id") % 5 =!= 0), docs.where(col("doc_id") % 5 === 0))
    }),

    // ---- training-data pipeline: text analysis ----
    "q32_token_stats" -> ((s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir))),
    "q33_lang_id" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),
    "q34_quality_score" -> ((s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))),
    "q35_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir)).select("doc_id", "fp_md5")),
    // BPE-ish pretokenizer counts (letters-runs / digits / symbols + a
    // ceil(len/4) subword estimate)
    "q53_token_bpe" -> ((s, dir) => TextAnalysis.bpeTokenCounts(Tables.documents(s, dir))),
    // rolling char-8-gram md5-prefix fingerprints (winnowing primitive)
    "q54_rolling_fingerprint" -> ((s, dir) =>
      TextAnalysis.rollingFingerprints(Tables.documents(s, dir))),
    // Gopher-style repetition quality signals (word-2-gram concentration)
    "q61_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, dir))),
    // winnowing: min rolling-hash per window of 4 — selected fingerprints
    "q64_winnowing" -> ((s, dir) =>
      TextAnalysis.winnowedFingerprints(Tables.documents(s, dir))),

    // ---- training-data pipeline: mix construction / packing ----
    // equal char budget per language (budget boundary doc kept)
    "q62_balanced_mix" -> ((s, dir) =>
      TrainingMix.balancedMix(Tables.documents(s, dir), 15000L)),
    // contiguous greedy packing into 4096-char bins per source
    "q63_pack_sequences" -> ((s, dir) =>
      TrainingMix.packSequences(Tables.documents(s, dir), 4096L)),
    // PII scrub: counts + redacted-text digest (full text dropped for a
    // compact graded output; the operator itself returns it)
    "q65_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(Tables.documents(s, dir)).drop("redacted")),
    // temperature-style replication: low-resource langs get extra epochs
    "q66_lang_upsample" -> ((s, dir) =>
      TrainingMix.langUpsample(Tables.documents(s, dir))),
    // TF-IDF-shaped rarity-weighted top terms per document
    "q55_top_terms" -> ((s, dir) => TextAnalysis.topTermsPerDoc(Tables.documents(s, dir))),
    // approximate percentile sketch with an in-query accuracy bound, same
    // contract style as q24: oracle checks exact columns + that the bound
    // holds (approx p50 must land inside the exact [p40, p60] bracket)
    "q56_approx_percentile" -> ((s, dir) =>
      Tables.documents(s, dir).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.5)").as("p50_exact"),
        expr("approx_percentile(n_chars, 0.5, 10000)")
          .between(expr("percentile(n_chars, 0.4)"), expr("percentile(n_chars, 0.6)"))
          .as("approx_ok"))),

    // ---- training-data pipeline: corpus composition ----
    // three-stage quality-filter funnel, all stages in one scan
    "q67_filter_funnel" -> ((s, dir) =>
      TextAnalysis.filterFunnel(Tables.documents(s, dir))),
    // per-source trigram diversity (template-spam signal)
    "q68_ngram_diversity" -> ((s, dir) =>
      Corpus.distinctNgramRatio(Tables.documents(s, dir))),
    // source × source shared-8-gram matrix (gram-bucketed join)
    "q69_source_overlap" -> ((s, dir) =>
      Corpus.sourceOverlap(Tables.documents(s, dir))),
    // literal-quote decontamination: broadcast probes, zero-shuffle scan
    "q70_quote_hits" -> ((s, dir) =>
      Corpus.quoteHits(Tables.documents(s, dir))),
    // k-means E-step over the full corpus: broadcast centroids, map-side
    // argmax, integer output
    "q71_kmeans_assign" -> ((s, dir) =>
      Similarity.ivfAssign(Tables.embeddings(s, dir)).select("vec_id", "cell")),
    // k-means M-step (one Lloyd iteration with q71): per-cell count +
    // mean vector on the micro-unit integer grid — order-invariant, so
    // the float mean becomes gradeable
    "q127_kmeans_update" -> ((s, dir) =>
      Similarity.kmeansUpdateExact(Tables.embeddings(s, dir))),
    // int8 scalar quantization: per-vector range + exact code checksum
    "q81_quantize" -> ((s, dir) =>
      Similarity.quantizeEmbeddings(Tables.embeddings(s, dir))),
    // repeated 32-token windows across the corpus (headers/footers/chrome)
    "q72_boilerplate" -> ((s, dir) =>
      Corpus.boilerplateWindows(Tables.documents(s, dir))),
    // C4-style segment-dedup rewrite: drop 8-token segments seen in >= 3
    // docs, re-assemble survivors in order, hash the rewritten text
    "q116_segment_dedup" -> ((s, dir) =>
      Corpus.segmentDedupRewrite(Tables.documents(s, dir))),
    // robust stats: per-source winsorized length clipping (exact
    // percentile bounds broadcast back — the document side never shuffles)
    "q91_winsorize" -> ((s, dir) =>
      Corpus.winsorize(Tables.documents(s, dir))),
    // soft dedup: weight 1/|cluster| instead of dropping near-dups;
    // shares the memoized q45 cluster frame (one LSH/CC run per session)
    "q73_dedup_weights" -> ((s, dir) =>
      Dedup.weightsFromClusters(nearDupClusterLabels(s, dir))),
    // leakage-free holdout: split by salted CLUSTER hash, so near-dups of
    // heldout docs can never appear in training (same memoized frame)
    "q88_leakage_split" -> ((s, dir) =>
      TrainingMix.leakageFreeSplit(nearDupClusterLabels(s, dir))),
    // overlapping 64-token context windows, stride 48 (long-doc prep)
    "q74_chunking" -> ((s, dir) =>
      TrainingMix.chunkDocuments(Tables.documents(s, dir))),
    // length-banded batches + exact padding-waste accounting
    "q120_batch_padding" -> ((s, dir) =>
      TrainingMix.lengthBucketBatches(Tables.documents(s, dir))),
    // reproducible salted-hash holdout: 5 docs per source, ExactTopK
    "q75_stratified_sample" -> ((s, dir) =>
      TrainingMix.stratifiedSample(Tables.documents(s, dir))),
    // reproducible export layout: salted-hash shards + release manifest
    "q79_shard_manifest" -> ((s, dir) =>
      TrainingMix.shardManifest(Tables.documents(s, dir))),
    // curriculum phases: fixed cuts over the deterministic quality score
    "q80_curriculum" -> ((s, dir) =>
      TextAnalysis.curriculumPhases(Tables.documents(s, dir))),
    // vocab induction: corpus-wide top-50 word bigrams (BPE counting pass)
    "q76_top_ngrams" -> ((s, dir) =>
      Corpus.topNgrams(Tables.documents(s, dir))),
    // vocabulary coverage: per-doc OOV fraction against the corpus's own
    // deterministic top-1000 token vocabulary (broadcast back)
    "q145_oov_rate" -> ((s, dir) =>
      Corpus.oovRate(Tables.documents(s, dir))),
    // corpus release audit: v1/v2 simulated by modulo splits, with
    // doc_id%13 docs edited in v2 so every status class appears
    "q78_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.snapshotDiff(
        docs.where(col("doc_id") % 7 =!= 0),
        docs.where(col("doc_id") % 11 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [v2]")))
              .otherwise(col("text"))))
    }),
    // behavioral sequences: per-session ordered event-type fingerprint
    "q77_session_sequences" -> ((s, dir) =>
      TimeWindows.sessionSequences(Tables.events(s, dir))),
    // LSH configuration grading: precision/recall of the MinHash candidate
    // set vs the exact n-gram Jaccard truth at the same 0.5 threshold
    "q85_lsh_quality" -> ((s, dir) =>
      Dedup.lshQualityFrom(mhPairs(s, dir).select("a_id", "b_id"),
        jaccardPairs(s, dir).select("a_id", "b_id"))),
    // weekly cohort retention matrix over the event log
    "q86_cohort_retention" -> ((s, dir) =>
      TimeWindows.cohortRetention(Tables.events(s, dir))),
    // temporal conversion funnel view -> click -> purchase
    "q82_conversion_funnel" -> ((s, dir) =>
      TimeWindows.conversionFunnel(Tables.events(s, dir))),
    // last-touch attribution: purchases as-of-joined to the most recent
    // prior click per user (running-state window, one user-keyed shuffle)
    "q97_attribution" -> ((s, dir) =>
      TimeWindows.lastTouchAttribution(Tables.events(s, dir))),
    // first-order Markov transitions between consecutive events per user
    "q100_transition_matrix" -> ((s, dir) =>
      TimeWindows.transitionMatrix(Tables.events(s, dir))),
    // multi-touch interval join: clicks x same-user views within 30 min;
    // batch twin of the stream-stream join RealTime.clickViewPairsStream
    "q101_interval_join" -> ((s, dir) =>
      TimeWindows.clickViewPairs(Tables.events(s, dir))),
    // deterministic 256-register HLL distinct-8-gram estimate per source,
    // graded against the exact distinct count (error is the deliverable)
    "q102_hll_cardinality" -> ((s, dir) =>
      Corpus.hllCardinalityFrom(hllGrams(s, dir))),
    // HLL shard-merge ≡ direct-registers proof over the same memoized
    // hashed grams — the property that makes the sketch distributed
    "q147_hll_merge" -> ((s, dir) =>
      Corpus.hllMergeFrom(hllGrams(s, dir))),
    // pairwise source overlap by register inclusion-exclusion — the
    // constant-size sketch form of the quadratic exact overlap matrix
    "q157_hll_intersection" -> ((s, dir) =>
      Corpus.hllIntersectionFrom(hllGrams(s, dir))),
    // SCD-2 validity intervals per user folded from the event log
    "q146_scd_intervals" -> ((s, dir) =>
      TimeWindows.scdIntervals(Tables.events(s, dir))),
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
    // 2-D Pareto skyline over orders (price x recency), grid-pruned so
    // the exact sort-scan window never sees more than ~|skyline| points
    "q159_skyline" -> ((s, dir) =>
      Relational.skyline(Tables.orders(s, dir))),
    // epsilon-DP count release via the geometric mechanism — integer
    // inverse-CDF noise, bit-identical on both engines
    "q161_dp_release" -> ((s, dir) =>
      Relational.dpNoisedCounts(Tables.events(s, dir))),
    // compaction bin-packing over segment metadata: size-desc running
    // total into ceil(total/8) targets, fill report per planned file
    "q162_compaction_plan" -> ((s, dir) =>
      graft.sources.ZOrder.compactionPlan(Tables.documents(s, dir))),
    // Benford first-digit audit on order totals — observed vs expected
    // shares in exact parts-per-billion, shared-literal expectation
    "q163_benford" -> ((s, dir) =>
      Relational.benfordAudit(Tables.orders(s, dir))),
    // Nelson-Aalen cumulative churn hazard over user lifetimes, exact
    // nano-unit hazard terms
    "q164_churn_hazard" -> ((s, dir) =>
      TimeWindows.churnHazard(Tables.events(s, dir))),
    // MLE Markov next-type predictor graded in-sample (argmax of the
    // q100 matrix; accuracy = max row share, in exact ppm)
    "q165_markov_eval" -> ((s, dir) =>
      TimeWindows.markovEval(Tables.events(s, dir))),
    // CUSUM chart over per-type daily volumes: sustained-shift detector
    // beside q103's single-day z-flags, exact integer both sides
    "q166_cusum" -> ((s, dir) =>
      TimeWindows.cusumChangePoints(Tables.events(s, dir))),
    // one BPE merge-selection step: overlapping pair counts rank the
    // candidates, greedy replace-shrinkage grades what each would merge
    "q167_bpe_merge" -> ((s, dir) =>
      Corpus.bpeMergeStep(Tables.documents(s, dir))),
    // positional-index phrase query: adjacent-position self-join over
    // (doc, pos, token) postings — the index algebra twin of q95
    "q169_phrase_search" -> ((s, dir) =>
      Corpus.phraseSearch(Tables.documents(s, dir))),
    // per-label farthest-from-centroid vectors: exact decimal distance
    // numerators over micro-quantized coordinates, per-label ranking
    "q170_embedding_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(Tables.embeddings(s, dir))),
    // chi-square independence audit (type x weekday): exact integer
    // deviations, 3-sigma integer flag, per-cell contribution
    "q171_independence" -> ((s, dir) =>
      Relational.independenceAudit(Tables.events(s, dir))),
    // exact per-source KS and Wasserstein-1 drift of the length
    // distribution vs the rest of the corpus (one grid pass, both stats)
    "q172_ks_drift" -> ((s, dir) =>
      Corpus.ksDrift(Tables.documents(s, dir))),
    // association-rule lift over the memoized co-rated pair table —
    // third consumer of the q107/q108 fan-out
    "q173_basket_lift" -> ((s, dir) =>
      Reco.basketLift(cfDeduped(s, dir), cfPairs(s, dir))),
    // holdout calibration: hash-split train/test, item-mean model,
    // exact decile table of predicted vs actual on unseen ratings
    "q175_calibration" -> ((s, dir) =>
      Reco.calibrationFromDeduped(cfDeduped(s, dir))),
    // Chao1 + Good-Turing unseen-vocabulary estimates per source from
    // one count-of-counts pass — the corpus-coverage report
    "q176_vocab_richness" -> ((s, dir) =>
      Corpus.vocabRichness(Tables.documents(s, dir))),
    // Poisson-bootstrap CI on per-type mean value: hash-seeded replica
    // multiplicities, exact integer replica means, ranked interval picks
    "q177_bootstrap_ci" -> ((s, dir) =>
      Relational.bootstrapCI(Tables.events(s, dir))),
    // d-gap + varint byte cost of the top-df posting lists vs raw ids —
    // the storage half of the q169 index
    "q178_postings_compression" -> ((s, dir) =>
      Corpus.postingsCompression(Tables.documents(s, dir))),
    // pairwise correlation matrix from one exact-moment pass — the
    // feature screen built-in corr can't hash-match
    "q179_corr_matrix" -> ((s, dir) =>
      Relational.corrMatrix(Tables.lineitem(s, dir))),
    // 7-day-half-life decayed activity leaderboard: literal weight
    // table, exact integer scores, top-k heap
    "q180_decayed_leaderboard" -> ((s, dir) =>
      TimeWindows.decayedLeaderboard(Tables.events(s, dir))),
    // interval ANTI-join: views with no click in the next 30 min — the
    // unconverted-impression report (q101's missing complement)
    "q181_unconverted_views" -> ((s, dir) =>
      Relational.unconvertedViews(Tables.events(s, dir))),
    // power-of-two inter-arrival histogram per type (the Prometheus
    // bucket form; integer log2 via binary length)
    "q182_latency_histogram" -> ((s, dir) =>
      Relational.latencyHistogram(Tables.events(s, dir))),
    // TPC-H Q5 shape: five-table star, same-nation correlation, exact
    // decimal revenue — the join-reorder stressor
    "q183_region_revenue" -> ((s, dir) =>
      Relational.regionRevenue(Tables.region(s, dir), Tables.nation(s, dir),
        Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    // TPC-H Q3 shape: segment + date cutoffs, top-10 pending revenue
    "q184_shipping_priority" -> ((s, dir) =>
      Relational.shippingPriority(Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // greedy set-cover source selection: which 3 sources buy the most
    // distinct 8-grams (the data-curation budget question), over the
    // memoized hashed-gram stream
    "q185_greedy_coverage" -> ((s, dir) =>
      Corpus.greedyCoverageFrom(hllGrams(s, dir))),
    // quantile normalization of doc length onto the corpus distribution
    // (distributed global rank, per-source rank windows, exact integers)
    "q186_quantile_normalize" -> ((s, dir) =>
      Corpus.quantileNormalize(Tables.documents(s, dir))),
    // consistent-hash ring reshard 4 -> 5 shards: observed movement vs
    // the 1/(n+1) theory and the mod-hash disaster baseline
    "q187_reshard_report" -> ((s, dir) =>
      graft.sources.ZOrder.reshardReport(Tables.documents(s, dir))),
    // MMR diverse retrieval: one distributed relevance pass into a
    // 64-candidate pool, then 5 greedy diversity rounds over it
    "q188_mmr_select" -> ((s, dir) =>
      Similarity.mmrSelect(Tables.embeddings(s, dir))),
    // contrastive pair mining: adjacent-chunk positives + hash-drawn
    // cross-doc negatives (the embedding-training dataset builder)
    "q189_contrastive_pairs" -> ((s, dir) =>
      TrainingMix.contrastivePairs(Tables.documents(s, dir))),
    // U-shaped 40/20/40 multi-touch attribution (exact ppm credits) —
    // the position-based model beside q97's last-touch
    "q190_position_attribution" -> ((s, dir) =>
      TimeWindows.positionAttribution(Tables.events(s, dir))),
    // TPC-H Q17 shape: correlated avg-quantity subquery decorrelated to
    // a broadcast brand-stats join; exact integer threshold compare
    "q192_small_qty_revenue" -> ((s, dir) =>
      Relational.smallQuantityRevenue(Tables.part(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q21 shape: the EXISTS/NOT-EXISTS pair collapsed into one
    // per-order window pass; per-supplier waiting-order counts, top-20
    "q193_waiting_suppliers" -> ((s, dir) =>
      Relational.waitingSuppliers(Tables.supplier(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // Slope One predictions over the memoized pair seam — the deviation-
    // based recommender beside q107/q108's cosine itemKNN
    "q191_slope_one" -> ((s, dir) =>
      Reco.slopeOnePredictions(cfDeduped(s, dir), cfPairs(s, dir))),
    // MASE-style forecast skill: seasonal-naive (lag-7) vs naive (lag-1)
    // absolute error on daily volumes, one shared denominator
    "q195_forecast_skill" -> ((s, dir) =>
      TimeWindows.forecastSkill(Tables.events(s, dir))),
    // stratified k-fold assignment by hash + per-(stratum, fold) balance
    // report in exact ppm deviation from the ideal split
    "q199_kfold_assign" -> ((s, dir) =>
      TrainingMix.kfoldAssignment(Tables.documents(s, dir))),
    // kNN label-consistency audit: IVF cell self-join, ExactTopK
    // neighbors, broadcast label lookups — the label-noise detector
    "q200_knn_label_consistency" -> ((s, dir) =>
      Similarity.knnLabelConsistency(Tables.embeddings(s, dir))),
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
    // randomized-response local-DP histogram: true vs observed vs
    // debiased counts per type — the measure-the-mechanism report
    "q229_randomized_response" -> ((s, dir) =>
      Relational.randomizedResponse(Tables.events(s, dir))),
    // TPC-H Q4 shape: quarter-window orders with >=1 late line via one
    // orderkey-keyed LEFT SEMI (EXISTS decorrelated), per-priority count
    "q230_order_priority" -> ((s, dir) =>
      Relational.orderPriorityCheck(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q12 shape: fact-dim equi-join + two-level conditional count,
    // exact ppm late share per priority
    "q231_late_by_priority" -> ((s, dir) =>
      Relational.lateLinesByPriority(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q14 shape: one month's PROMO revenue share in exact e4
    // units, broadcast part dim, one ppm floor
    "q232_promo_share" -> ((s, dir) =>
      Relational.promoRevenueShare(Tables.part(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q19 shape: disjunctive bracket predicates as a residual on
    // one equi-join (never a nested loop), exact e4 revenue
    "q233_bracket_revenue" -> ((s, dir) =>
      Relational.bracketRevenue(Tables.part(s, dir), Tables.lineitem(s, dir))),
    // community conductance: cut/min(vol, 2m-vol) per LP community in
    // exact ppm — the Cheeger grade beside q198's modularity
    "q234_conductance" -> ((s, dir) =>
      plans.GraphOps.conductance(communityLabels(s, dir), coPairs(s, dir))),
    // inter-label centroid gap matrix on the micro grid — exact decimal
    // numerators, label-pair join over the metadata-sized centroid table
    "q235_centroid_gaps" -> ((s, dir) =>
      Similarity.centroidGaps(Tables.embeddings(s, dir))),
    // exact Mann-Whitney U (doubled midranks) per source vs rest — the
    // rank-based drift test beside q172's KS, same count grid
    "q236_mann_whitney" -> ((s, dir) =>
      Relational.mannWhitneyDrift(Tables.documents(s, dir))),
    // Kendall concordance counts between type volumes over day pairs —
    // calendar-bounded metadata self-join, exact integers
    "q237_kendall" -> ((s, dir) =>
      TimeWindows.kendallConcordance(Tables.events(s, dir))),
    // log2-bucket degree histogram of the co-rating graph — the skew
    // gate for every per-vertex fan-out, pure map-combined aggregates
    "q238_degree_histogram" -> ((s, dir) =>
      plans.GraphOps.degreeHistogram(coPairs(s, dir))),
    // intra-list diversity of the top-k recommendations: exact cos^2 ppm
    // from the memoized pair table — the echo-chamber audit beside q218
    "q239_intra_list_diversity" -> ((s, dir) =>
      Reco.intraListDiversity(cfDeduped(s, dir), cfPreds(s, dir), cfPairs(s, dir))),
    // TPC-H Q6 shape: three pushed range predicates, one exact e4 sum —
    // the canonical pushdown benchmark
    "q240_forecast_revenue" -> ((s, dir) =>
      Relational.forecastRevenue(Tables.lineitem(s, dir))),
    // TPC-H Q10 shape: returned-line revenue per customer, dim joined
    // after the aggregate, top-20 heap
    "q241_returned_revenue" -> ((s, dir) =>
      Relational.returnedRevenue(Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // TPC-H Q18 shape: per-order HAVING aggregate first, joins see only
    // qualifying orders, top-20 by exact cents
    "q242_big_orders" -> ((s, dir) =>
      Relational.bigOrders(Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // IVF-cell label purity: unsupervised cells vs the label column in
    // exact ppm — the external clustering index on the q71 assignment
    "q243_cell_purity" -> ((s, dir) =>
      Similarity.cellPurity(Tables.embeddings(s, dir))),
    // per-doc shared-window exposure ppm — the document-level
    // boilerplate signal curation thresholds on (q72's corpus twin)
    "q244_doc_span_share" -> ((s, dir) =>
      Corpus.docSpanShare(Tables.documents(s, dir))),
    // binary-segmentation changepoint per type: exact nano-scored split
    // argmax over the daily-count metadata
    "q245_binary_segmentation" -> ((s, dir) =>
      TimeWindows.binarySegmentation(Tables.events(s, dir))),
    // average-hash over REAL P2 pixels: cross-multiplied mean bits, the
    // global-structure image signature beside q210's gradients
    "q246_image_ahash" -> ((s, dir) =>
      graft.sources.Multimodal.imageAhash(
        graft.sources.Multimodal.synthesizePgm(Tables.documents(s, dir)))),
    // TPC-H Q7 shape: two-nation trade volume per ship-year, both dims
    // broadcast before the fact-fact join
    "q247_nation_trade" -> ((s, dir) =>
      Relational.nationTrade(Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q15 shape: quarter revenue per supplier, max re-joined so
    // ties all surface — exact e4 keeps the tie compare exact
    "q248_top_supplier" -> ((s, dir) =>
      Relational.topSupplier(Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    // Flesch-style readability in exact milli units (vowel-group
    // syllable proxy, documented double floor)
    "q249_readability" -> ((s, dir) =>
      graft.functions.TextAnalysis.readability(Tables.documents(s, dir))),
    // weekday-deseasonalized anomaly flags: q103's cross-multiplied z²
    // against the WEEKDAY population, so seasonality stops masking
    "q250_seasonal_anomalies" -> ((s, dir) =>
      TimeWindows.seasonalAnomalies(Tables.events(s, dir))),
    // two-hop reach per vertex: distinct friends-of-friends audience —
    // the neighborhood function's first step, wedge-join envelope
    "q251_two_hop_reach" -> ((s, dir) =>
      plans.GraphOps.twoHopReach(coPairs(s, dir))),
    // TPC-H Q8 shape: national market share of a region's revenue per
    // ship-year, deepest star in the suite, exact ppm share
    "q252_market_share" -> ((s, dir) =>
      Relational.marketShare(Tables.region(s, dir), Tables.nation(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q16 shape: distinct supplier counts per (brand, size band)
    // from the shipped pair reduction, one brand excluded
    "q253_part_supplier_counts" -> ((s, dir) =>
      Relational.partSupplierCounts(Tables.part(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q9 shape: name-contains pushdown into the part scan, star
    // to supplier nation x ship-year, revenue-side profit proxy
    "q254_product_profit" -> ((s, dir) =>
      Relational.productProfit(Tables.nation(s, dir), Tables.supplier(s, dir),
        Tables.part(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q20 shape: dominant-shipper-per-part semi-join chain with
    // the half compare cross-multiplied exact, nation rollup
    "q255_promotion_suppliers" -> ((s, dir) =>
      Relational.promotionSuppliers(Tables.nation(s, dir), Tables.supplier(s, dir),
        Tables.part(s, dir), Tables.lineitem(s, dir))),
    // HyperBall-register two-hop reach beside q251's exact: constant
    // HLL state per vertex, exact totals + in-query 5% L1 bound graded
    "q256_approx_reach" -> ((s, dir) =>
      plans.GraphOps.twoHopReachApprox(coPairs(s, dir))),
    // random walk with restart from a deterministic seed set — q96's
    // exact integer-mass rounds with seeded teleport
    "q257_personalized_pagerank" -> ((s, dir) =>
      plans.GraphOps.personalizedPageRank(Reco.undirected(coPairs(s, dir)))
        .select(col("v").as("user_id"), col("r").as("ppr_scaled"))),
    // reciprocal-rank fusion of the BM25 and term-density runs —
    // integer-floor 1e9/(60+rank) contributions, RRF-over-union
    "q258_rrf_fusion" -> ((s, dir) =>
      Corpus.rrfFusion(Tables.documents(s, dir),
        Seq("dup", "spark", "window", "batch"))),
    // degenerate-text detector: most-repeated word 3-gram share per doc
    // in exact ppm — the multiset the shingle ops deliberately drop
    "q259_repetition_score" -> ((s, dir) =>
      Corpus.repetitionScore(Tables.documents(s, dir))),
    // DSIR importance scores vs the en target slice — integer-log2
    // likelihood-ratio weights, token-keyed join-back, no float logs
    "q260_importance_weights" -> ((s, dir) =>
      Corpus.importanceWeights(Tables.documents(s, dir))),
    // hashing-trick doc vectors: zero-vocabulary sparse counts, the
    // only fit-free vectorizer at corpus scale (memoized for q262)
    "q261_hashed_vectorizer" -> ((s, dir) => hashedVectors(s, dir)),
    // two-stage near-dup pipeline: MinHash recall -> hashed-vector
    // cos^2 ppm re-rank, |pairs|x64-bounded dot join
    "q262_rerank_candidates" -> ((s, dir) =>
      Dedup.rerankCandidates(mhPairs(s, dir), hashedVectors(s, dir))),
    // TPC-H refresh-function IVM proof: old - deletes + inserts vs the
    // direct recompute, additive aggregates make it exact
    "q263_incremental_revenue" -> ((s, dir) =>
      Relational.incrementalRevenue(Tables.lineitem(s, dir))),
    // lakehouse snapshot diff: one keyed full outer join over md5
    // payload checksums -> added/removed/changed/unchanged
    "q264_snapshot_diff" -> ((s, dir) =>
      Relational.snapshotDiff(Tables.orders(s, dir))),
    // resource-allocation link prediction: 1/deg(center) wedge weights
    // as exact 1e9-floor integers, beside q154's Jaccard
    "q265_resource_allocation" -> ((s, dir) =>
      plans.GraphOps.resourceAllocation(coPairs(s, dir))),
    // time-weighted average value per user: interval-held readings,
    // exact e2*us numerators, re-sampling-invariant
    "q266_time_weighted_value" -> ((s, dir) =>
      TimeWindows.timeWeightedValue(Tables.events(s, dir))),
    // per-class precision/recall/F1 of q33's langID vs the truth label
    // — cleared-denominator ppm floors, 0-denominator classes explicit
    "q267_langid_eval" -> ((s, dir) =>
      TextAnalysis.langIdEval(Tables.documents(s, dir))),
    // Cohen's kappa over the same confusion seam — chance-corrected
    // agreement as one integer ratio, truncation-matched across engines
    "q268_langid_kappa" -> ((s, dir) =>
      TextAnalysis.langIdKappa(Tables.documents(s, dir))),
    // nDCG@5 over the SAME memoized holdout + retrained predictions —
    // one-JVM literal discount table, no per-row float logs
    "q269_ndcg_eval" -> ((s, dir) =>
      Reco.ndcgFromRanked(holdoutSplitDf(s, dir), holdoutRanked(s, dir))),
    // Luby's maximal independent set: md5-packed strict priorities,
    // 3 bounded rounds, honest undecided residual
    "q270_luby_mis" -> ((s, dir) =>
      plans.GraphOps.lubyMIS(coPairs(s, dir))),
    // L28 engagement curve: users by exact distinct-active-day count —
    // the power-user histogram a rolling WAU cannot show
    "q271_engagement_curve" -> ((s, dir) =>
      TimeWindows.engagementCurve(Tables.events(s, dir))),
    // group-aware k-fold: rows follow their user's md5 fold, with the
    // cross-fold distinct-user identity graded as leak_free
    "q272_group_kfold" -> ((s, dir) =>
      TrainingMix.groupKFold(Tables.ratings(s, dir))),
    // 10%-trimmed mean doc length per source — the robust location
    // between mean and median, exact floor cuts and milli average
    "q273_trimmed_mean" -> ((s, dir) =>
      Corpus.trimmedMeanLength(Tables.documents(s, dir))),
    // top-20 three-step behavior paths per user stream — the funnel
    // journeys a bigram transition matrix cannot distinguish
    "q274_path_trigrams" -> ((s, dir) =>
      TimeWindows.pathTrigrams(Tables.events(s, dir))),
    // CMS sketch-delta change detection: per-half sketches, exact top
    // movers as graded truth, one-sided bounds on both probes
    "q275_cms_movers" -> ((s, dir) =>
      Sketches.cmsTopMovers(Tables.events(s, dir))),
    // double-sweep diameter lower bound: two bounded BFS passes, the
    // second from the first sweep's farthest vertex
    "q276_diameter_bound" -> ((s, dir) =>
      plans.GraphOps.diameterLowerBound(Reco.undirected(coPairs(s, dir)))),
    // CDC MERGE apply: one full outer join for I/U/D semantics, graded
    // by the order-invariant state checksum
    "q277_cdc_apply" -> ((s, dir) =>
      Relational.cdcApply(Tables.orders(s, dir))),
    // ranking-family ties report: row_number/rank/dense_rank/exact-ppm
    // percent_rank pinned over the same tie-prone order
    "q278_rank_family" -> ((s, dir) =>
      Relational.rankFamily(Tables.customer(s, dir))),
    // weekly growth accounting: new/retained/resurrected/churned user
    // states with the actives identity as the built-in check
    "q279_growth_accounting" -> ((s, dir) =>
      TimeWindows.growthAccounting(Tables.events(s, dir))),
    // per-source Spearman rank correlation of n_chars vs token count —
    // exact BIGINT d² sums, per-source windows only
    "q202_spearman" -> ((s, dir) =>
      Corpus.spearmanRanks(Tables.documents(s, dir))),
    // edge-embeddedness histogram over the co-rating graph — local
    // bridges at 0, wedge-join candidates, exact counts
    "q203_edge_embeddedness" -> ((s, dir) =>
      plans.GraphOps.edgeEmbeddedness(coPairs(s, dir))),
    // TF-IDF keyword search with integer-log2 idf — exact BIGINT scores,
    // broadcast term stats, TakeOrderedAndProject heap
    "q197_tfidf_search" -> ((s, dir) =>
      Corpus.tfidfSearch(Tables.documents(s, dir),
        Seq("dup", "spark", "window", "batch"))),
    // Newman modularity per LP community — exact integer numerators
    // 4m·e_c − d_c² over the memoized labels + pair seams
    "q198_modularity" -> ((s, dir) =>
      plans.GraphOps.modularity(communityLabels(s, dir), coPairs(s, dir))),
    // KMV bottom-k distinct sketch per source over the memoized gram
    // stream, graded against the exact distinct count (q102 pattern)
    "q194_kmv_sketch" -> ((s, dir) =>
      Sketches.kmvCardinality(hllGrams(s, dir))),
    // Bloom filter built over purchasers, probed with non-purchasers —
    // observed FPR in exact ppm (measure-the-mechanism, q187 pattern)
    "q196_bloom_fpr" -> ((s, dir) =>
      Sketches.bloomFprReport(Tables.events(s, dir))),
    // TPC-H Q13 shape: order-count histogram INCLUDING zero-order
    // customers (left-outer + count-of-counts)
    "q204_custdist" -> ((s, dir) =>
      Relational.customerDistribution(Tables.customer(s, dir), Tables.orders(s, dir))),
    // TPC-H Q11 shape: parts above 1.5x the average part revenue, share
    // of total in exact ppm — HAVING vs a broadcast global scalar
    "q205_part_revenue_share" -> ((s, dir) =>
      Relational.partRevenueShare(Tables.lineitem(s, dir))),
    // TPC-H Q22 shape: above-average balances with no RECENT order, per
    // nation — broadcast scalar threshold + custkey anti join
    "q206_idle_rich" -> ((s, dir) =>
      Relational.idleRichCustomers(Tables.customer(s, dir), Tables.orders(s, dir))),
    // per-doc character entropy (floor-log2 proxy, exact integers) —
    // the compressibility quality signal
    "q211_char_entropy" -> ((s, dir) =>
      graft.functions.TextAnalysis.charEntropy(Tables.documents(s, dir))),
    // class-based TF-IDF: each source's 5 most distinctive tokens by
    // tf x integer-log2 source-idf — the cluster-profile report
    "q217_source_keywords" -> ((s, dir) =>
      Corpus.sourceKeywords(Tables.documents(s, dir))),
    // BM25 ranking with cleared-denominator exact integers — tf
    // saturation + length normalization beside q197's raw TF-IDF
    "q224_bm25_search" -> ((s, dir) =>
      Corpus.bm25Search(Tables.documents(s, dir),
        Seq("dup", "spark", "window", "batch"))),
    // top principal direction by 3-round integer power iteration over
    // the milli-grid second-moment matrix, with the Rayleigh quotient
    "q220_pca_power" -> ((s, dir) =>
      Similarity.pcaPower(Tables.embeddings(s, dir))),
    // difference-in-differences across the cutover day, control arm
    // netting out common shocks — exact micro-rate cells
    "q221_diff_in_diff" -> ((s, dir) =>
      Relational.diffInDiff(Tables.events(s, dir))),
    // per-shard source-distribution TVD vs the corpus — the
    // shuffle-quality audit over the q79 shard hash
    "q222_shard_balance" -> ((s, dir) =>
      TrainingMix.shardBalance(Tables.documents(s, dir))),
    // BPE pieces per word and chars per piece, per language — the
    // tokenizer-fertility accounting over the q53 decomposition
    "q219_token_fertility" -> ((s, dir) =>
      graft.functions.TextAnalysis.tokenFertility(Tables.documents(s, dir))),
    // unigram LM surprisal per document: integer-log2 bits/token — the
    // model-based quality filter beside q34's heuristics
    "q207_lm_surprisal" -> ((s, dir) =>
      Corpus.lmSurprisal(Tables.documents(s, dir))),
    // rank-sum (Mann-Whitney) AUC of item popularity predicting a good
    // rating — exact tie-aware pair counting over the score histogram
    "q208_auc_popularity" -> ((s, dir) => {
      val r = Tables.ratings(s, dir)
      val pop = r.groupBy(col("productId"))
        .agg(count(lit(1)).as("score"))
      Relational.aucRankSum(
        r.join(pop, "productId")
          .select(col("score"), (col("rating") > 3.0).as("is_pos")))
    }),
    // weekday seasonality index per event type: exact ppm mean-per-
    // weekday vs overall mean, epoch-day % 7 bucketing
    "q209_weekday_seasonality" -> ((s, dir) =>
      TimeWindows.weekdaySeasonality(Tables.events(s, dir))),
    // non-adjacent precedence mining: which event type precedes which,
    // per user, via one min/max aggregate + a types²-bounded pair join
    "q213_sequential_pairs" -> ((s, dir) =>
      TimeWindows.sequentialPairs(Tables.events(s, dir))),
    // Theil-Sen robust trend: median of C(days,2) pairwise slopes per
    // type — the resistant counterpart to q144's OLS
    "q226_theil_sen" -> ((s, dir) =>
      TimeWindows.theilSenTrend(Tables.events(s, dir))),
    // TPC-H Q2 shape: cheapest-balance supplier per part — dedup +
    // broadcast dim + per-part argmin window
    "q215_cheapest_shipper" -> ((s, dir) =>
      Relational.cheapestShipper(Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    // Gini concentration of part revenue: tie-invariant global index via
    // the range-partitioned zipWithIndex, exact decimal ppm ratio
    "q216_gini_revenue" -> ((s, dir) =>
      Relational.giniRevenue(Tables.lineitem(s, dir))),
    // t-closeness: per-QI-class sensitive-distribution distance (exact
    // integer TVD), completing the k-anonymity / l-diversity trio
    "q149_t_closeness" -> ((s, dir) =>
      Relational.tCloseness(
        Tables.events(s, dir)
          .withColumn("day_num", expr("unix_micros(ts) div 86400000000"))
          .withColumn("v_bucket", expr("CAST(floor(value / 100.0) AS BIGINT)")),
        Seq("day_num", "v_bucket"), "event_type")),
    // lag-1/lag-7 autocorrelation of per-type daily volumes — the
    // seasonality detector beside q144's trend and q132's EWMA
    "q150_autocorrelation" -> ((s, dir) =>
      TimeWindows.autocorrelation(Tables.events(s, dir))),
    // PPS sample + Horvitz-Thompson corpus-total estimate: pure-integer
    // md5 inclusion draws, graded estimate-vs-exact (the q102 pattern)
    "q152_pps_sample" -> ((s, dir) =>
      TrainingMix.ppsSample(Tables.documents(s, dir))),
    // per-source lexical diversity: Simpson repeat concentration + TTR,
    // single divisions of exact integer counts
    "q153_token_diversity" -> ((s, dir) =>
      graft.functions.TextAnalysis.tokenDiversity(Tables.documents(s, dir))),
    // range-partition planner: 8 equal-frequency n_chars ranges from one
    // exact scaled percentile aggregate + the achieved balance report
    "q156_range_boundaries" -> ((s, dir) =>
      Relational.rangeBoundaries(
        Tables.documents(s, dir).select(col("n_chars")), "n_chars")),
    // integer z-test spike/crater flags on per-type daily event volumes
    "q103_volume_anomalies" -> ((s, dir) =>
      TimeWindows.dailyVolumeAnomalies(Tables.events(s, dir))),
    // sorted-neighborhood blocking (merge/purge): prefix-sorted window
    // candidates verified by exact token Jaccard >= 1/2
    "q104_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir))),
    // z-order layout profile: Morton-bucket rectangles over
    // (l_partkey, l_suppkey) — per-bucket min/max = the skipping stats
    "q105_zorder_profile" -> ((s, dir) =>
      graft.sources.ZOrder.zOrderProfile(
        Tables.lineitem(s, dir), "l_partkey", "l_suppkey")),
    // zone-map skipping report: files read under sorted vs hashed layout
    // for fixed shipdate predicates, from (min,max,count) stats alone
    "q124_zonemap_skipping" -> ((s, dir) =>
      graft.sources.ZOrder.zoneMapSkipping(Tables.lineitem(s, dir))),
    // prefix-filtered EXACT set-similarity join (PPJoin): q36's pairs
    // from ~1/12th the candidates, rarest-first prefixes as skew guard
    "q106_ppjoin" -> ((s, dir) =>
      Dedup.ppjoinPairsFrom(shingleSets(s, dir))),
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
    // 256-bucket histogram p50/p90/p99 per source, graded against the
    // exact order statistic (integer-only sketch-vs-truth report)
    "q109_hist_quantiles" -> ((s, dir) =>
      Corpus.histogramQuantiles(Tables.documents(s, dir))),
    // Levenshtein fuzzy matches over sorted-neighborhood candidates
    // (string-metric family: edits/transpositions token sets miss)
    "q110_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir))),
    // growth accounting: daily actives, first-appearance news, running
    // cumulative reach
    "q112_user_reach" -> ((s, dir) =>
      TimeWindows.userReach(Tables.events(s, dir))),
    // carry-forward time-weighted average of value per user (irregular
    // series; integer cents x micros, one final division)
    "q114_time_weighted_avg" -> ((s, dir) =>
      TimeWindows.timeWeightedAvg(Tables.events(s, dir))),
    // bot gate: per-user gap stats + exact-integer cv² uniformity flag
    "q118_automation_signals" -> ((s, dir) =>
      TimeWindows.automationSignals(Tables.events(s, dir))),
    // robust outlier gate: median/MAD on a doubled integer scale, exact
    // integer 2·|x−med| > k·2·MAD predicate
    "q119_mad_outliers" -> ((s, dir) =>
      Relational.madOutliers(Tables.events(s, dir))),
    // shuffle-planning skew diagnostic: per join key, exact HHI collision
    // mass + hottest-key share (order-invariant integer stats)
    "q130_key_skew" -> ((s, dir) =>
      Relational.keySkewReport(Seq(
        ("lineitem.l_orderkey", Tables.lineitem(s, dir), "l_orderkey"),
        ("lineitem.l_partkey", Tables.lineitem(s, dir), "l_partkey"),
        ("orders.o_custkey", Tables.orders(s, dir), "o_custkey"),
        ("events.user_id", Tables.events(s, dir), "user_id"),
        ("documents.source", Tables.documents(s, dir), "source")))),
    // incremental-view rollup: monthly report merged FROM daily partials
    // (algebraic merge graded against the direct aggregate)
    "q131_rollup_merge" -> ((s, dir) =>
      TimeWindows.monthlyRollup(Tables.events(s, dir))),
    // snapshot drift monitor: chi-square event-type mix shift between the
    // two halves of the day range (exact integer counts, tiny pivot)
    "q138_distribution_drift" -> ((s, dir) =>
      Relational.distributionDrift(Tables.events(s, dir))),
    // growth/decay monitor: exact-integer OLS slope + r² of daily counts
    // per event type (micro-count slope as an exact BIGINT)
    "q144_volume_trend" -> ((s, dir) =>
      TimeWindows.volumeTrend(Tables.events(s, dir))),
    // governance: right-to-be-forgotten purge audit — broadcast the
    // deletion list, flag-join each fact table, one conditional aggregate
    "q140_tombstone_purge" -> ((s, dir) => {
      val del = Tables.events(s, dir).where(col("user_id") % 97 === 0)
        .select("user_id").distinct()
      Relational.tombstonePurge(Seq(
        ("events", Tables.events(s, dir), "user_id"),
        ("ratings", Tables.ratings(s, dir), "userId")), del)
    }),
    // migration validation: order-invariant md5-sum checksum per table
    // (shuffle/file-layout independent; both engines compute it equally)
    "q139_table_checksum" -> ((s, dir) =>
      Relational.tableChecksum(Seq(
        ("region", Tables.region(s, dir), Seq("r_regionkey", "r_name")),
        ("nation", Tables.nation(s, dir), Seq("n_nationkey", "n_name", "n_regionkey")),
        ("customer", Tables.customer(s, dir),
          Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))))),
    // data-quality profiler: one-scan per-column nulls / exact distinct /
    // typed min-max, unpivoted to long form via stack
    "q137_column_profile" -> ((s, dir) =>
      Relational.columnProfile(
        Tables.orders(s, dir)
          .withColumn("o_orderdate", col("o_orderdate").cast("date")),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_orderpriority"))),
    // half-life EWMA volume baseline: pinned-order fold, exact halving —
    // a gradeable float recurrence (see ewmaDailyVolume)
    "q132_ewma_volume" -> ((s, dir) =>
      TimeWindows.ewmaDailyVolume(Tables.events(s, dir))),
    // asymmetric containment pairs: the quote/subset detector a symmetric
    // Jaccard threshold misses (same inverted-index skeleton as q36)
    "q133_containment" -> ((s, dir) =>
      Dedup.containmentPairsFrom(shingleIndex(s, dir))),
    // per-transition step-latency SLOs: exact p50/p90/p99 on the x100
    // integer grid (q100's edges, q121's percentile exactness)
    "q134_transition_latency" -> ((s, dir) =>
      TimeWindows.transitionLatency(Tables.events(s, dir))),
    // RFM customer-value grid: recency/frequency/spend quartiled against
    // exact broadcast percentile cuts (no global sort), per 4x4x4 segment
    "q121_rfm_segments" -> ((s, dir) =>
      Relational.rfmSegments(Tables.events(s, dir))),
    // A/B report: salted-hash arms, user-day conversion units, lift, and
    // an exact-integer two-proportion z-test flag (A/A sanity on this log)
    "q123_ab_test" -> ((s, dir) =>
      Relational.abTestReport(Tables.events(s, dir))),
    // k-anonymity release gate over (event_type, day, value-centile)
    // quasi-identifiers: small equivalence classes and rows they expose
    "q115_k_anonymity" -> ((s, dir) =>
      Relational.kAnonymity(
        Tables.events(s, dir)
          .withColumn("day_num", expr("unix_micros(ts) div 86400000000"))
          .withColumn("v_bucket", expr("CAST(floor(value / 100.0) AS BIGINT)")),
        Seq("event_type", "day_num", "v_bucket"), k = 20L)),
    // l-diversity homogeneity audit over the same QI classes with the
    // user-id bucket as the sensitive attribute
    "q142_l_diversity" -> ((s, dir) =>
      Relational.lDiversity(
        Tables.events(s, dir)
          .withColumn("day_num", expr("unix_micros(ts) div 86400000000"))
          .withColumn("v_bucket", expr("CAST(floor(value / 100.0) AS BIGINT)"))
          .withColumn("u_bucket", expr("user_id div 10")),
        Seq("event_type", "day_num", "v_bucket"), "u_bucket", l = 3L)),
    // CMS inner-product estimate of |clicks x purchases on user_id|,
    // graded against the exact join size (optimizer statistics)
    "q113_join_size_sketch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Sketches.cmsJoinSize(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'purchase'"), "user_id")
    }),
    // exact distinct users per (type, day) from OR-folded 63-bit bitmap
    // words + popcount — the index-structure distinct (vs q102's HLL)
    "q122_bitmap_distinct" -> ((s, dir) =>
      Sketches.bitmapDistinct(Tables.events(s, dir))),
    // exact trailing-7-day active users per observed day: sliding
    // distinct via per-(day, word) bitmaps — the W-day fan-out replicates
    // the collapsed word table, never the event scan
    "q125_rolling_wau" -> ((s, dir) =>
      Sketches.rollingActiveUsers(Tables.events(s, dir))),
    // per-source quality nucleus: best-first cumulative keep within an
    // exact integer byte budget (half of each source's total)
    "q126_nucleus_select" -> ((s, dir) =>
      TrainingMix.nucleusSelect(Tables.documents(s, dir))),
    // FK orphan audit across the star schema: child count, orphan count,
    // match rate per declared relation
    "q111_integrity_audit" -> ((s, dir) =>
      Relational.integrityAudit(Seq(
        ("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey"),
        ("lineitem->part", Tables.lineitem(s, dir), "l_partkey",
          Tables.part(s, dir), "p_partkey"),
        ("lineitem->supplier", Tables.lineitem(s, dir), "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"),
        ("orders->customer", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey"),
        ("customer->nation", Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey"),
        ("supplier->nation", Tables.supplier(s, dir), "s_nationkey",
          Tables.nation(s, dir), "n_nationkey")))),

    // ---- training-data pipeline: similarity search ----
    "q37_sim_topk_brute" -> ((s, dir) =>
      Similarity.bruteForceTopK(simQueries(s, dir), Tables.embeddings(s, dir))),
    // Registered form is the IVF-cell-bucketed near-dup (equi-join on cell,
    // scale-safe); the all-pairs quadratic form stays as spec ground truth.
    "q38_embedding_neardup" -> ((s, dir) =>
      Similarity.embeddingNearDupPairsIVF(Tables.embeddings(s, dir), threshold = 0.4)),
    "q41_sim_topk_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(simQueries(s, dir), Tables.embeddings(s, dir))),
    // semantic train/test contamination: held-out (odd) vectors with a
    // training (even) vector inside cosine 0.4 in a shared IVF cell
    "q98_semantic_contamination" -> ((s, dir) =>
      Similarity.semanticContamination(Tables.embeddings(s, dir))),
    // ANN tuning curve: recall@5 at nprobe 1/2/4 against one barriered
    // brute truth — the latency/recall trade-off sweep beside q83
    "q225_ann_tuning" -> ((s, dir) =>
      Similarity.annTuning(simQueries(s, dir), Tables.embeddings(s, dir))),
    // sign-random-projection signatures: cosine-LSH bits over the micro
    // grid with one-JVM ±1 plane literals; bucket sizes = near-dup sets
    "q227_srp_signatures" -> ((s, dir) =>
      Similarity.srpSignatures(Tables.embeddings(s, dir))),
    // ANN quality report card: recall@k (and rank drift) of the q41 IVF
    // result against the q37 brute-force ground truth
    "q83_ann_recall" -> ((s, dir) =>
      Similarity.annRecall(s,
        Similarity.ivfTopK(simQueries(s, dir), Tables.embeddings(s, dir)),
        Similarity.bruteForceTopK(simQueries(s, dir), Tables.embeddings(s, dir)))),

    // ---- training-data pipeline: multimodal columns ----
    "q42_multimodal_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    // Library output is array<float>; the registered form serializes each
    // feature to a fixed 3-decimal string (the stub features are exact
    // milli-fractions, so the formatting is lossless on both engines).
    "q43_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(col("doc_id"),
          array_join(transform(col("features"), f => format_number(f, 3)), ",")
            .as("features"))),
    "q44_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    // REAL decode, no stub: synthesize a spec-conformant 8-bit PCM WAV per
    // document, then parse the RIFF header and fold per-sample amplitude
    // stats with pure byte expressions (the oracle recomputes the stats
    // from the synthesis formula; MultimodalSpec decodes a hand-built
    // fixture to pin the byte-level parse itself)
    "q84_wav_decode" -> ((s, dir) =>
      Multimodal.decodeWav(Multimodal.synthesizeWav(Tables.documents(s, dir)))),
    // REAL image decode: binary PPM (P6) header parse (variable-length
    // ASCII dimensions) + per-channel pixel sums, pure byte expressions
    "q87_ppm_decode" -> ((s, dir) =>
      Multimodal.decodePpm(Multimodal.synthesizePpm(Tables.documents(s, dir)))),
    // perceptual dHash over the REAL P6 bytes: 4x4 nearest-neighbor luma
    // grid -> 12 horizontal + 12 vertical gradient bits — the image-side
    // near-dup signature beside MinHash/SimHash
    "q210_image_dhash" -> ((s, dir) =>
      Multimodal.imageDhash(Multimodal.synthesizePpm(Tables.documents(s, dir)))),
    // frame-level ZCR + energy over the REAL PCM bytes — the first DSP
    // features, one row per 16-sample frame
    "q223_wav_zcr" -> ((s, dir) =>
      Multimodal.wavZcr(Multimodal.synthesizeWav(Tables.documents(s, dir)))),
    // REAL audio featurization: amplitude histogram over the decoded PCM
    // sample bytes (one row per doc × bin, map-side only)
    "q92_wav_features" -> ((s, dir) =>
      Multimodal.wavAmplitudeHistogram(Multimodal.synthesizeWav(Tables.documents(s, dir)))),
    // REAL plain-PGM (P2) decode: the pixel region is variable-width ASCII
    // decimal tokens, so this exercises the tokenize-and-cast parse path
    // (vs the fixed-byte-offset slicing of q84/q87)
    "q135_pgm_decode" -> ((s, dir) =>
      Multimodal.decodePgm(Multimodal.synthesizePgm(Tables.documents(s, dir)))),
    // Otsu binarization threshold over the corpus histogram of REAL-
    // decoded PGM pixels — exact integer variance ratio, one division
    "q168_otsu" -> ((s, dir) =>
      Multimodal.otsuThreshold(Multimodal.synthesizePgm(Tables.documents(s, dir)))),
    // REAL BMP (24-bit) decode: little-endian header fields, BOTTOM-UP
    // rows, 4-byte stride padding — the 2D-geometry decode the other
    // three codecs don't exercise (0xAA pad bytes trap a bad stride)
    "q155_bmp_decode" -> ((s, dir) =>
      Multimodal.decodeBmp(Multimodal.synthesizeBmp(Tables.documents(s, dir)))),
    // temporal-media kernel: per consecutive frame pair, exact integer
    // |Δpixel| sums over synthesized frame sequences; planted inverted
    // frames must flag as hard cuts
    "q141_scene_cuts" -> ((s, dir) =>
      Multimodal.sceneCuts(Multimodal.synthesizeFrameSeq(Tables.documents(s, dir)))),
    // MapType coverage: construct map<string,string> props per media row,
    // then aggregate through element_at lookups and map_keys
    "q136_media_props" -> ((s, dir) =>
      Multimodal.mediaProps(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(
          element_at(col("props"), "kind").as("kind"),
          element_at(col("props"), "parity").as("parity"),
          element_at(col("props"), "bytes").cast("long").as("bytes"),
          size(map_keys(col("props"))).cast("long").as("n_keys"))
        .groupBy("kind", "parity")
        .agg(count(lit(1)).as("n_docs"), sum("bytes").as("total_bytes"),
          max("n_keys").as("n_keys"))
        .orderBy("kind", "parity")),

    // ---- training-data pipeline: sketches ----
    // Count-Min sketch heavy-hitter report card: exact top-20 user counts
    // probed against the CMS (one-sided error — cms_est >= exact always);
    // the gap grades the (d=4, w=1024) config before the sketch replaces
    // exact counting at scale
    "q93_cms_heavyhitters" -> ((s, dir) =>
      Sketches.cmsHeavyHitters(Tables.events(s, dir))),

    // ---- training-data pipeline: text analysis (round 6 additions) ----
    // char-class profile + Simpson diversity (log-free entropy twin)
    "q94_charclass_profile" -> ((s, dir) =>
      TextAnalysis.charClassProfile(Tables.documents(s, dir))),
    // corpus collocations by lift (log-free monotone twin of PMI)
    "q95_collocations" -> ((s, dir) =>
      Corpus.collocations(Tables.documents(s, dir))),
    // per-source z-score length normalization from exact integer sums
    "q99_zscore_norm" -> ((s, dir) =>
      Corpus.zscoreLengths(Tables.documents(s, dir))),
  )

  /** Deterministic query subset for the similarity-search benchmarks. */
  private def simQueries(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  def oracleSql: Map[String, String] = Map(
    "q01_top_products" ->
      s"""WITH $ratingsCte
         |SELECT productId, avg(rating) AS avg_rating, count(*) AS cnt
         |FROM ratings GROUP BY productId HAVING count(*) > 10
         |ORDER BY avg_rating DESC, productId LIMIT 20""".stripMargin,
    "q02_good_ratings" ->
      s"""WITH $ratingsCte
         |SELECT userId, productId, rating FROM ratings
         |WHERE rating > 3.0 AND userId < 1000""".stripMargin,
    "q03_corating_pairs" ->
      s"""WITH $ratingsCte,
         |$goodCte
         |SELECT DISTINCT a.userId AS src, b.userId AS dst
         |FROM good a JOIN good b
         |  ON a.productId = b.productId AND a.userId < b.userId""".stripMargin,
    "q04_undirected_edges" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte
         |SELECT src, dst FROM pairs
         |UNION ALL SELECT dst AS src, src AS dst FROM pairs""".stripMargin,
    // same symmetrized edges; HUGEINT moments mirror Spark's DECIMAL(38,0)
    // exactly, so the one double division agrees bit-for-bit
    "q143_assortativity" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |und AS (SELECT src, dst FROM pairs
         |        UNION ALL SELECT dst AS src, src AS dst FROM pairs),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices FROM deg),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m2,
         |    sum(CAST(da.deg AS HUGEINT)) AS sx,
         |    sum(CAST(da.deg AS HUGEINT) * CAST(db.deg AS HUGEINT)) AS sxy,
         |    sum(CAST(da.deg AS HUGEINT) * CAST(da.deg AS HUGEINT)) AS sxx
         |  FROM und e JOIN deg da ON e.src = da.src JOIN deg db ON e.dst = db.src)
         |SELECT n_vertices, m2 // 2 AS n_edges,
         |  CAST(m2 * 1000 // n_vertices AS BIGINT) AS mean_degree_x1000,
         |  CAST(CAST(m2 AS HUGEINT) * sxy - sx * sx AS DOUBLE)
         |    / CAST(CAST(m2 AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS assortativity
         |FROM m CROSS JOIN nv""".stripMargin,
    // same hub wedge join, NOT-EXISTS non-edge filter, and the row_number
    // mirror of the (jaccard DESC, src, dst) top-k contract
    "q154_link_prediction" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |cn AS (
         |  SELECT x.dst AS src, y.dst AS dst, CAST(count(*) AS BIGINT) AS cn
         |  FROM edges x JOIN edges y ON x.src = y.src AND x.dst < y.dst
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |ne AS (
         |  SELECT c.* FROM cn c
         |  WHERE NOT EXISTS (SELECT 1 FROM pairs p
         |    WHERE p.src = c.src AND p.dst = c.dst))
         |SELECT src, dst, cn, deg_src, deg_dst, jaccard FROM (
         |  SELECT ne.src, ne.dst, ne.cn, da.deg AS deg_src, db.deg AS deg_dst,
         |    CAST(ne.cn AS DOUBLE)
         |      / CAST(da.deg + db.deg - ne.cn AS DOUBLE) AS jaccard,
         |    row_number() OVER (ORDER BY CAST(ne.cn AS DOUBLE)
         |      / CAST(da.deg + db.deg - ne.cn AS DOUBLE) DESC, ne.src, ne.dst) AS rn
         |  FROM ne JOIN deg da ON ne.src = da.src JOIN deg db ON ne.dst = db.src)
         |WHERE rn <= 100""".stripMargin,
    // unrolled 5-round synchronous 3-core peel; the Spark loop's early
    // exit only fires at a fixpoint, where extra peels are no-ops
    "q151_kcore" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |${kCoreCtes(3, 5)}
         |SELECT u AS id, CAST(count(*) AS BIGINT) AS core_deg FROM (
         |  SELECT u, v FROM e5 UNION ALL SELECT v, u FROM e5)
         |GROUP BY u""".stripMargin,
    // unrolled 3-round 17-truss peel; final support recomputed on the
    // surviving subgraph (left join keeps 0-support survivors)
    "q214_ktruss" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |${kTrussCtes(17, 3)}
         |SELECT e.u, e.v, coalesce(s.sup, 0) AS support
         |FROM t3 e LEFT JOIN sup4 s ON e.u = s.u AND e.v = s.v""".stripMargin,
    // same seed, same unrolled frontier supersteps, same layer report
    "q174_bfs_layers" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |${bfsCtes(4)}
         |SELECT CAST(layer AS BIGINT) AS layer,
         |  CAST(count(*) AS BIGINT) AS n_vertices,
         |  CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
         |FROM v4 GROUP BY 1""".stripMargin,
    // wedge join + closing edge over the canonical (src < dst) pair list —
    // each triangle a<b<c counted exactly once on both engines
    "q90_triangle_count" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte
         |SELECT count(*) AS n_triangles
         |FROM pairs e1
         |JOIN pairs e2 ON e1.dst = e2.src
         |JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,
    // same canonical wedge join as q90, each triangle credited to its 3
    // corners; 2T/deg(deg-1) is one division of exact integers
    "q129_clustering_coeff" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |und AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
         |deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY 1),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM pairs e1
         |  JOIN pairs e2 ON e1.dst = e2.src
         |  JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |pv AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM (
         |    SELECT a AS v FROM tri UNION ALL
         |    SELECT b FROM tri UNION ALL
         |    SELECT c FROM tri) GROUP BY 1)
         |SELECT d.v AS user_id, d.degree,
         |  coalesce(p.triangles, 0) AS triangles,
         |  CASE WHEN d.degree >= 2
         |       THEN CAST(2 * coalesce(p.triangles, 0) AS DOUBLE)
         |            / (d.degree * (d.degree - 1))
         |       ELSE 0.0 END AS clustering_coeff
         |FROM deg d LEFT JOIN pv p ON p.v = d.v""".stripMargin,
    // scaled-integer PageRank twin: 3 unrolled rounds of the same
    // floor-division algebra (sums CAST from HUGEINT back to BIGINT)
    "q96_pagerank" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |${pageRankCtes(3)}
         |SELECT v AS user_id, r AS rank_scaled FROM r3""".stripMargin,
    "q05_sample_split" ->
      s"""WITH $ratingsCte
         |SELECT userId, productId, rating,
         |       CASE WHEN (userId * 131 + productId * 31 + CAST(rating AS BIGINT)) % 1000 < 700
         |            THEN 0 ELSE 1 END AS bucket
         |FROM ratings WHERE userId < 1000""".stripMargin,
    "q06_communities" ->
      s"""$graphPrefix
         |SELECT id, label FROM l5""".stripMargin,
    "q07_community_sizes" ->
      s"""$graphPrefix
         |SELECT label, count(*) AS members FROM l5 GROUP BY label""".stripMargin,
    "q08_recommendations" ->
      s"""$graphPrefix,
         |$recsCtes
         |SELECT userId,
         |       array_to_string(list_transform(recommendedProducts, x -> CAST(x AS VARCHAR)), ',')
         |         AS recommendedProducts
         |FROM recs""".stripMargin,
    "q09_stream_enrich" ->
      s"""$graphPrefix,
         |$recsCtes,
         |topk AS (
         |  SELECT productId FROM ratings GROUP BY productId HAVING count(*) > 10
         |  ORDER BY avg(rating) DESC, productId LIMIT 20
         |),
         |toparr AS (SELECT list_sort(list(productId)) AS fallbackProducts FROM topk),
         |users AS (SELECT DISTINCT userId FROM ratings)
         |SELECT u.userId,
         |       array_to_string(
         |         (list_transform(
         |            CASE WHEN len(r.recommendedProducts) > 0 THEN r.recommendedProducts
         |                 ELSE t.fallbackProducts END,
         |            x -> CAST(x AS VARCHAR)))[1:20], ',') AS recommendedProducts
         |FROM users u
         |LEFT JOIN recs r ON u.userId = r.userId
         |CROSS JOIN toparr t""".stripMargin,

    "q10_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // interval semantics (lo <= v < hi) stated directly; the bucket
    // expansion is a Spark-side physical rewrite, not a semantic change
    "q117_bucket_range_lookup" ->
      """WITH br(bracket, lo, hi) AS (VALUES
        |    ('b1_budget', 0, 2000), ('b2_mid', 2000, 10000),
        |    ('b3_upper', 10000, 30000), ('b4_premium', 30000, 70000),
        |    ('b5_luxury', 70000, 200000)),
        |f AS (
        |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS v,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT bracket, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
        |  count(*) AS n_rows,
        |  CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_weight
        |FROM f JOIN br ON f.v >= br.lo AND f.v < br.hi
        |GROUP BY 1, 2, 3""".stripMargin,
    "q11_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q12_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn, running_spend FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |         OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q13_order_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q14_lineitem_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q15_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q16_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q17_setops" ->
      """WITH rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000),
        |big AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000)
        |(SELECT custkey FROM rich UNION SELECT custkey FROM big)
        |EXCEPT
        |(SELECT custkey FROM rich INTERSECT SELECT custkey FROM big)""".stripMargin,
    "q18_event_scalars" ->
      """SELECT event_id,
        |  CAST(year(CAST(ts AS TIMESTAMP)) AS INTEGER) AS y,
        |  CAST(month(CAST(ts AS TIMESTAMP)) AS INTEGER) AS m,
        |  CAST(day(CAST(ts AS TIMESTAMP)) AS INTEGER) AS d,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS h,
        |  upper(event_type) AS etype,
        |  CAST(length(event_type) AS INTEGER) AS etype_len,
        |  event_type || '#' || CAST(user_id AS VARCHAR) AS tag,
        |  substring(event_type, 1, 2) AS prefix,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(floor(value) AS BIGINT) AS value_floor,
        |  CAST(ceil(value) AS BIGINT) AS value_ceil,
        |  sqrt(value) AS value_sqrt,
        |  abs(user_id - 75) AS dist_from_mid
        |FROM events""".stripMargin,

    // Transitive min-label closure as a recursive CTE: label m spreads from
    // the component minimum outward (guard label < dst bounds growth), so
    // min(label) per vertex = the component's minimum member id — exactly
    // the large-star/small-star fixpoint labeling.
    "q19_connected_components" ->
      s"""WITH RECURSIVE $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |verts AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, label) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.label < e.dst
         |)
         |SELECT id, min(label) AS component FROM reach GROUP BY id""".stripMargin,

    "q27_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "q25_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q26_edit_distance" ->
      """SELECT c_custkey, c_name,
        |  CAST(levenshtein(c_name, 'Customer#000000001') AS INTEGER) AS dist,
        |  CAST(levenshtein(c_mktsegment, c_name) AS INTEGER) AS seg_dist
        |FROM customer""".stripMargin,
    // identical closed-form arithmetic over the same exact decimal moments
    // → bit-identical doubles (see Relational.eventStats)
    "q46_event_stats" ->
      """WITH m AS (
        |  SELECT event_type,
        |    count(*) AS n,
        |    CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(user_id) AS DOUBLE) AS sy,
        |    CAST(sum(user_id * user_id) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(user_id AS DECIMAL(18,0)) AS DECIMAL(28,2))) AS DOUBLE) AS sxy
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  sx / nd AS mean_value,
        |  (nd * sxy - sx * sy) / (nd * nd) AS covar_pop,
        |  sqrt((nd * sxx - sx * sx) / (nd * nd)) AS stddev_pop_value,
        |  (nd * sxy - sx * sy)
        |    / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)) AS corr_value_user
        |FROM m""".stripMargin,
    "q57_window_analytics" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id, ts,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q49_topk_events_per_type" ->
      """SELECT event_type, CAST(rn AS INTEGER) AS rank, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3""".stripMargin,
    "q48_char_percentiles" ->
      """SELECT source, count(*) AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50_chars,
        |  quantile_cont(n_chars, 0.9) AS p90_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY source""".stripMargin,
    // quantile_cont = Spark's exact interpolated percentile (the q48
    // contract), so the clip bounds are bit-identical on both engines
    "q91_winsorize" ->
      """WITH b AS (
        |  SELECT source,
        |    quantile_cont(n_chars, 0.05) AS p_lo,
        |    quantile_cont(n_chars, 0.95) AS p_hi
        |  FROM documents GROUP BY source)
        |SELECT doc_id, d.source AS source, n_chars,
        |  least(greatest(CAST(n_chars AS DOUBLE), p_lo), p_hi) AS clipped_chars,
        |  (n_chars < p_lo OR n_chars > p_hi) AS was_clipped
        |FROM documents d JOIN b ON d.source = b.source""".stripMargin,
    "q47_range_join" ->
      """WITH j AS (
        |  SELECT a.event_id, count(*) AS cnt
        |  FROM events a JOIN events b
        |    ON a.event_id <> b.event_id AND abs(a.value - b.value) <= 0.25
        |  GROUP BY a.event_id)
        |SELECT e.event_id, COALESCE(j.cnt, 0) AS n_neighbors
        |FROM events e LEFT JOIN j ON e.event_id = j.event_id""".stripMargin,
    "q24_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS exact_users,
        |  true AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q28_seeded_split" ->
      s"""WITH $ratingsCte
         |SELECT count(*) AS n_total, count(*) AS n_parts_sum, true AS frac_ok
         |FROM ratings WHERE userId < 1000""".stripMargin,
    "q23_asof_join" ->
      """WITH uorders AS (
        |  SELECT o_custkey AS user_id, o_orderdate AS t, max(o_orderkey) AS o_key
        |  FROM orders GROUP BY 1, 2),
        |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |j AS (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_key, o.t,
        |         row_number() OVER (PARTITION BY e.event_id ORDER BY o.t DESC, o.o_key DESC) AS rn
        |  FROM e LEFT JOIN uorders o ON e.user_id = o.user_id AND o.t <= e.ts)
        |SELECT event_id, user_id, ts, o_key AS last_order_key, t AS last_order_ts
        |FROM j WHERE rn = 1""".stripMargin,
    "q20_window_tumbling" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events)
        |SELECT make_timestamp(((epoch_ms(t) // 900000) * 900000) * 1000) AS ws,
        |       make_timestamp(((epoch_ms(t) // 900000) * 900000 + 900000) * 1000) AS we,
        |       event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2, 3""".stripMargin,
    // same tumbling-window arithmetic as q20; rank = row_number over
    // (count DESC, user_id ASC), the ExactTopK tie-break contract
    "q89_trending_users" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id FROM events),
        |c AS (
        |  SELECT make_timestamp(((epoch_ms(t) // 900000) * 900000) * 1000) AS ws,
        |         make_timestamp(((epoch_ms(t) // 900000) * 900000 + 900000) * 1000) AS we,
        |         user_id, count(*) AS n_events
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT ws, we, CAST(rank AS INTEGER) AS rank, user_id,
        |       CAST(n_events AS BIGINT) AS n_events FROM (
        |  SELECT ws, we, user_id, n_events,
        |         row_number() OVER (PARTITION BY ws ORDER BY n_events DESC, user_id) AS rank
        |  FROM c)
        |WHERE rank <= 3""".stripMargin,
    "q21_window_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events),
        |ks AS (SELECT 0 AS k UNION ALL SELECT 1)
        |SELECT make_timestamp((((epoch_ms(t) // 1800000) - k) * 1800000) * 1000) AS ws,
        |       make_timestamp((((epoch_ms(t) // 1800000) - k) * 1800000 + 3600000) * 1000) AS we,
        |       event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e CROSS JOIN ks GROUP BY 1, 2, 3""".stripMargin,
    "q22_window_session" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id, value FROM events),
        |x AS (SELECT user_id, t, value,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |                  OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 5 MINUTE
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM e),
        |s AS (SELECT user_id, t, value,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM x)
        |SELECT min(t) AS session_start,
        |       max(t) + INTERVAL 5 MINUTE AS session_end,
        |       user_id, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q50_dedup_first_arrival" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |r AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM e)
        |SELECT user_id, event_type, ts AS first_ts, event_id AS first_id
        |FROM r WHERE rn = 1""".stripMargin,
    "q51_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q52_bucketed_join" ->
      """SELECT o_custkey AS custkey, max(c_name) AS c_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_custkey""".stripMargin,

    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS text_md5
        |FROM documents GROUP BY text""".stripMargin,
    "q31_dedup_canonical" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""".stripMargin,
    "q32_token_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(t) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct_tokens,
        |  CAST(length(text) AS INTEGER) AS char_len,
        |  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / CAST(len(t) AS INTEGER) AS avg_token_len
        |FROM toks""".stripMargin,
    "q33_lang_id" ->
      """SELECT doc_id, h_en, h_de, h_fr, h_es, h_zh,
        |  CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
        |       WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
        |       WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
        |       WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS pred_lang
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS INTEGER) AS h_en,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS INTEGER) AS h_de,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS INTEGER) AS h_fr,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|que|una)\b')) AS INTEGER) AS h_es,
        |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS INTEGER) AS h_zh
        |  FROM documents)""".stripMargin,
    "q34_quality_score" -> qualityScoreOracle,
    // fixed-constant phase cuts over the q34 score (bit-identical doubles
    // on both engines, so the boundary comparisons cannot disagree)
    "q80_curriculum" ->
      s"""SELECT doc_id, quality_score,
         |  CASE WHEN quality_score >= 0.7 THEN 3
         |       WHEN quality_score >= 0.5 THEN 2
         |       ELSE 1 END AS phase
         |FROM ($qualityScoreOracle) q""".stripMargin,
    "q79_shard_manifest" ->
      s"""WITH h AS (
         |  SELECT doc_id, n_chars,
         |    ${md5Prefix32Sql("'shard:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard
         |  FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |FROM h GROUP BY shard""".stripMargin,
    "q35_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
    "q53_token_bpe" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+') AS words,
        |    len(regexp_extract_all(text, '[0-9]')) AS n_digit_tokens,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_other_tokens
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  CAST(n_digit_tokens AS INTEGER) AS n_digit_tokens,
        |  CAST(n_other_tokens AS INTEGER) AS n_other_tokens,
        |  CAST(COALESCE(list_sum(list_transform(words, w -> (length(w) + 3) // 4)), 0)
        |       + n_digit_tokens + n_other_tokens AS BIGINT) AS n_bpe_est
        |FROM base""".stripMargin,
    "q54_rolling_fingerprint" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text) >= 8 THEN
         |      list_transform(range(1, length(text) - 6),
         |        i -> ${md5Prefix32Sql("substring(text, CAST(i AS INTEGER), 8)")})
         |    ELSE CAST([] AS BIGINT[]) END AS fps
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(fps) AS INTEGER) AS n_grams,
         |  list_min(fps) AS min_fp,
         |  list_max(fps) AS max_fp,
         |  CAST(len(list_distinct(fps)) AS INTEGER) AS n_distinct_fp
         |FROM g""".stripMargin,
    "q55_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df, CAST(t.tf AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN df d USING (term)),
        |r AS (
        |  SELECT doc_id, term, tf, df, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rank, term, tf, df, score
        |FROM r WHERE rn <= 3""".stripMargin,
    "q56_approx_percentile" ->
      """SELECT source, count(*) AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50_exact,
        |  true AS approx_ok
        |FROM documents GROUP BY source""".stripMargin,
    "q39_dedup_minhash" -> minhashOracle,
    "q40_dedup_simhash" -> simhashOracle,
    "q45_dedup_clusters" -> nearDupClustersOracle,
    // the q45 cluster labels (recursive-CTE twin) + the salted 0.1 split
    "q88_leakage_split" ->
      s"""WITH cl AS ($nearDupClustersOracle)
         |SELECT doc_id, cluster,
         |  CASE WHEN ${md5Prefix32Sql("'split:v1:' || CAST(cluster AS VARCHAR)")} % 1000 < 100
         |       THEN 'heldout' ELSE 'train' END AS split
         |FROM cl""".stripMargin,
    // bloom-prune is output-identical to the plain join (false positives die
    // in the exact join) — so the oracle is the plain ANSI join+agg
    "q58_bloom_prune_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey""".stripMargin,
    "q59_incremental_neardup" -> incrementalNearDupOracle,
    "q60_contamination" -> contaminationOracle,
    // single divisions of exact integer counts → bit-identical doubles
    "q61_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 1),
         |    i -> t[i+1] || ' ' || t[i+2])) AS g
         |  FROM toks WHERE len(t) >= 2),
         |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_gram_frac,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(c) AS BIGINT) AS dup_gram_frac
         |FROM c GROUP BY doc_id""".stripMargin,
    "q62_balanced_mix" ->
      """SELECT doc_id, lang, source, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
        |FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars
        |  FROM documents)
        |WHERE cum_chars - n_chars < 15000""".stripMargin,
    // `//`/`%` on positive BIGINTs twin Spark's exact div/pmod
    "q63_pack_sequences" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(prev // 4096 AS BIGINT) AS bin,
        |  CAST(prev % 4096 AS BIGINT) AS bin_offset
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |    COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |  FROM documents)""".stripMargin,
    // regex dialect kept to the Java/RE2-common subset; DuckDB standard
    // strings treat backslash literally, so '\.' is the escaped-dot regex
    // counts per cascade stage, matching piiRedact (each category counted
    // on the previous pass's output)
    "q65_pii_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')
         |      AS after_email
         |  FROM documents),
         |r2 AS (
         |  SELECT doc_id, text, after_email,
         |    regexp_replace(after_email,
         |      '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS after_ip
         |  FROM r)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(after_email,
         |    '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INTEGER) AS n_ips,
         |  CAST(len(regexp_extract_all(after_ip, '[0-9]{7,}')) AS INTEGER) AS n_long_nums,
         |  md5(regexp_replace(after_ip, '[0-9]{7,}', '<NUM>', 'g')) AS redacted_md5
         |FROM r2""".stripMargin,
    // ceil yields an integral double; CAST rounds, which is exact here
    "q66_lang_upsample" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT max(cnt) AS mx FROM c),
        |w AS (SELECT lang,
        |  least(4, CAST(ceil(CAST(mx AS DOUBLE) / cnt) AS BIGINT)) AS n_epochs
        |  FROM c, m)
        |SELECT d.doc_id, d.lang, unnest(range(1, n_epochs + 1)) AS epoch
        |FROM documents d JOIN w USING (lang)""".stripMargin,
    // funnel predicates are the q34 oracle's twins (identical expression
    // trees → identical doubles → identical boundary comparisons)
    "q67_filter_funnel" ->
      """WITH toks AS (
        |  SELECT text, n_chars, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |f AS (
        |  SELECT n_chars >= 200 AS p1,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.4 AS p2,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|of|and|to|in|der|die|und|ist|nicht|le|la|et|les|des)\b')) AS DOUBLE)
        |      / CAST(len(t) AS DOUBLE) >= 0.02 AS p3
        |  FROM toks),
        |c AS (SELECT count(*) AS n0, count(*) FILTER (p1) AS n1,
        |  count(*) FILTER (p1 AND p2) AS n2,
        |  count(*) FILTER (p1 AND p2 AND p3) AS n3 FROM f)
        |SELECT '1_length' AS stage, n0 AS docs_in, n1 AS survivors, n0 - n1 AS dropped FROM c
        |UNION ALL SELECT '2_repetition', n1, n2, n1 - n2 FROM c
        |UNION ALL SELECT '3_language', n2, n3, n2 - n3 FROM c""".stripMargin,
    "q68_ngram_diversity" ->
      s"""WITH toks AS (
         |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |g AS (
         |  SELECT source,
         |    unnest(list_transform(range(0, len(t) - 2),
         |      i -> ${md5Prefix32Sql("array_to_string(t[i+1:i+3], ' ')")})) AS g
         |  FROM toks WHERE len(t) >= 3)
         |SELECT source, count(*) AS n_grams, count(DISTINCT g) AS n_distinct,
         |  CAST(count(DISTINCT g) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS distinct_ratio
         |FROM g GROUP BY source""".stripMargin,
    "q69_source_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |g0 AS (
         |  SELECT source,
         |    unnest(list_transform(range(0, len(t) - 7),
         |      i -> ${md5Prefix32Sql("array_to_string(t[i+1:i+8], ' ')")})) AS g
         |  FROM toks WHERE len(t) >= 8),
         |g AS (SELECT DISTINCT source, g FROM g0)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(DISTINCT a.g) AS n_shared_grams
         |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    // md5-of-text parity with the q35 fingerprint oracle
    "q78_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.h IS NULL THEN 'added'
        |       WHEN v2.h IS NULL THEN 'removed'
        |       WHEN v1.h = v2.h THEN 'unchanged'
        |       ELSE 'modified' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin,
    "q76_top_ngrams" ->
      """WITH toks AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT unnest(list_transform(range(0, len(t) - 1),
        |    i -> array_to_string(t[i+1:i+2], ' '))) AS gram
        |  FROM toks WHERE len(t) >= 2)
        |SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram LIMIT 50""".stripMargin,
    // same deterministic (count desc, token asc) top-1000 vocabulary;
    // the count division is exact-integer → double on both engines
    "q145_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1)
        |  ORDER BY cnt DESC, tok ASC LIMIT 1000)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY 1""".stripMargin,
    // µs-cast timestamps on every comparison, matching Spark's precision;
    // rates are exact-integer-count divisions, so doubles agree bit-for-bit
    "q82_conversion_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.t) AS t_click
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.t >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.t >= c.t_click
        |      GROUP BY e.user_id),
        |n AS (
        |  SELECT 1 AS stage, 'view' AS stage_name, (SELECT count(*) FROM v) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p))
        |SELECT CAST(stage AS INTEGER) AS stage, stage_name, n_users,
        |  CASE WHEN lag(n_users) OVER (ORDER BY stage) IS NULL THEN CAST(1 AS DOUBLE)
        |       WHEN lag(n_users) OVER (ORDER BY stage) = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(n_users AS DOUBLE) / lag(n_users) OVER (ORDER BY stage)
        |       END AS conv_from_prev,
        |  CASE WHEN first_value(n_users) OVER (ORDER BY stage) = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(n_users AS DOUBLE) / first_value(n_users) OVER (ORDER BY stage)
        |       END AS conv_from_start
        |FROM n""".stripMargin,
    // q22's lag/cumsum sessionization with an ordered list aggregate on top
    "q77_session_sequences" ->
      s"""WITH e AS (
         |  SELECT CAST(ts AS TIMESTAMP) AS t, user_id, event_id, event_type FROM events),
         |x AS (SELECT t, user_id, event_id, event_type,
         |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         |                  OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 5 MINUTE
         |             THEN 1 ELSE 0 END AS new_sess
         |      FROM e),
         |s AS (SELECT t, user_id, event_id, event_type,
         |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |      FROM x),
         |seq AS (
         |  SELECT user_id, sid, min(t) AS session_start, count(*) AS n_events,
         |    array_to_string(list(event_type ORDER BY t, event_id), ' ') AS seq
         |  FROM s GROUP BY user_id, sid)
         |SELECT session_start, user_id, n_events,
         |  ${md5Prefix32Sql("seq")} AS seq_hash
         |FROM seq""".stripMargin,
    "q75_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT source, doc_id,
         |    ${md5Prefix32Sql("'sample:' || CAST(doc_id AS VARCHAR)")} AS sample_hash
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, sample_hash,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY sample_hash, doc_id) AS rn
         |  FROM h)
         |SELECT source, doc_id, sample_hash FROM r WHERE rn <= 5""".stripMargin,
    // the q45 cluster oracle wrapped with a per-cluster count window;
    // 1.0/bigint is a single exact-operand IEEE division on both engines
    "q73_dedup_weights" ->
      s"""SELECT doc_id, cluster,
         |  count(*) OVER (PARTITION BY cluster) AS cluster_size,
         |  CAST(1 AS DOUBLE) / (count(*) OVER (PARTITION BY cluster)) AS weight
         |FROM ($nearDupClustersOracle) base""".stripMargin,
    "q74_chunking" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |nc AS (
         |  SELECT doc_id, t, len(t) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1 END AS nchunk
         |  FROM toks),
         |c AS (
         |  SELECT doc_id, t, n, unnest(range(0, nchunk)) AS chunk_id FROM nc)
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |  CAST(least(64, n - chunk_id * 48) AS INTEGER) AS n_tokens,
         |  ${md5Prefix32Sql("array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' ')")} AS chunk_hash
         |FROM c""".stripMargin,
    // float→double widening, one division, floor — all bit-deterministic
    "q81_quantize" ->
      """WITH r AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS q_min,
        |    CAST(list_max(embedding) AS DOUBLE) AS q_max
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, embedding, q_min, q_max,
        |    CASE WHEN q_max > q_min THEN q_max - q_min ELSE CAST(1 AS DOUBLE) END AS scale
        |  FROM r)
        |SELECT vec_id, q_min, q_max,
        |  CAST(list_sum(list_transform(embedding, x ->
        |    least(255, CAST(floor((CAST(x AS DOUBLE) - q_min) / scale * 256.0) AS BIGINT))))
        |    AS BIGINT) AS code_sum
        |FROM s""".stripMargin,
    // q71's assignment + aligned-unnest explode onto the micro-unit grid;
    // integer (cell, dim) sums, one final division, list ordered by dim
    "q127_kmeans_update" ->
      s"""WITH c AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
         |  WHERE vec_id % 37 = 0),
         |a AS (
         |  SELECT e.vec_id, c.c_id,
         |    ${cosineSql("e.embedding", "c.c_emb")} AS c_sim
         |  FROM embeddings e CROSS JOIN c),
         |r AS (
         |  SELECT vec_id, c_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
         |  FROM a),
         |asg AS (SELECT vec_id, c_id AS cell FROM r WHERE rn = 1),
         |x AS (
         |  SELECT asg.cell,
         |    unnest(range(0, len(e.embedding))) AS dim,
         |    unnest(list_transform(e.embedding,
         |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS micro
         |  FROM asg JOIN embeddings e USING (vec_id)),
         |g AS (
         |  SELECT cell, dim, CAST(sum(micro) AS BIGINT) AS s, count(*) AS n
         |  FROM x GROUP BY 1, 2)
         |SELECT cell, CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_members,
         |  CAST(s AS DOUBLE) / n AS centroid_micro
         |FROM g""".stripMargin,
    // same bit-identical cosine + (DESC sim, ASC id) argmax contract as q41
    "q71_kmeans_assign" ->
      s"""WITH c AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
         |  WHERE vec_id % 37 = 0),
         |a AS (
         |  SELECT e.vec_id, c.c_id,
         |    ${cosineSql("e.embedding", "c.c_emb")} AS c_sim
         |  FROM embeddings e CROSS JOIN c),
         |r AS (
         |  SELECT vec_id, c_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
         |  FROM a)
         |SELECT vec_id, c_id AS cell FROM r WHERE rn = 1""".stripMargin,
    "q72_boilerplate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |w AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT)),
         |      c -> ${md5Prefix32Sql("array_to_string(t[c*32+1 : c*32+32], ' ')")})) AS g
         |  FROM toks)
         |SELECT g, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences,
         |  min(doc_id) AS first_doc
         |FROM w GROUP BY g HAVING count(*) > 1""".stripMargin,
    // same aligned-unnest segment build; string_agg ORDER BY sid mirrors
    // the sort_array re-assembly, coalesce('') covers all-removed docs
    "q116_segment_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |seg AS (
         |  SELECT doc_id,
         |    unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS sid,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT)),
         |      c -> array_to_string(t[c*8+1 : c*8+8], ' '))) AS seg
         |  FROM toks),
         |hseg AS (
         |  SELECT doc_id, sid, seg, ${md5Prefix32Sql("seg")} AS g FROM seg),
         |dup AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM hseg GROUP BY 1),
         |j AS (
         |  SELECT h.doc_id, h.sid, h.seg,
         |    CAST(len(string_split(h.seg, ' ')) AS BIGINT) AS n_tok,
         |    d.n_docs < 3 AS keep
         |  FROM hseg h JOIN dup d USING (g))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
         |  CAST(coalesce(sum(CASE WHEN NOT keep THEN 1 END), 0) AS BIGINT) AS n_removed,
         |  CAST(coalesce(sum(CASE WHEN keep THEN n_tok END), 0) AS BIGINT) AS kept_tokens,
         |  ${md5Prefix32Sql("coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY sid), '')")} AS kept_hash
         |FROM j GROUP BY doc_id""".stripMargin,
    "q70_quote_hits" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |p AS (
        |  SELECT doc_id AS probe_doc_id, array_to_string(t[9:20], ' ') AS probe
        |  FROM toks WHERE doc_id % 97 = 0 AND len(t) >= 20),
        |n AS (SELECT doc_id, array_to_string(t, ' ') AS norm FROM toks)
        |SELECT n.doc_id AS doc_id, p.probe_doc_id AS probe_doc_id
        |FROM n JOIN p ON contains(n.norm, p.probe)""".stripMargin,
    "q64_winnowing" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text) >= 8 THEN
         |      list_transform(range(1, length(text) - 6),
         |        i -> ${md5Prefix32Sql("substring(text, CAST(i AS INTEGER), 8)")})
         |    ELSE CAST([] AS BIGINT[]) END AS fps
         |  FROM documents)
         |SELECT doc_id,
         |  unnest(list_distinct(list_transform(range(0, len(fps) - 3),
         |    i -> list_min(fps[i+1:i+4])))) AS fp
         |FROM g WHERE len(fps) >= 4""".stripMargin,
    // shingles are md5-prefix-hashed to BIGINT before the self-join on BOTH
    // sides (narrow shuffle keys in Spark, identical collision behavior in
    // the oracle) — see Dedup.ngramJaccardPairs
    "q36_ngram_jaccard" -> ngramJaccardOracle,
    // LSH quality report card: precision/recall of the q39 candidate set
    // against the q36 exact-Jaccard truth — both sides independently
    // oracled, so the grading query composes their CTEs
    "q85_lsh_quality" ->
      s"""WITH est AS ($minhashOracle),
         |truth AS ($ngramJaccardOracle),
         |h AS (SELECT count(*) AS n_hits FROM est e
         |      JOIN truth t ON e.a_id = t.a_id AND e.b_id = t.b_id),
         |c AS (SELECT count(*) AS n_candidates FROM est),
         |tr AS (SELECT count(*) AS n_truth FROM truth)
         |SELECT c.n_candidates, tr.n_truth, h.n_hits,
         |  CASE WHEN c.n_candidates = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(h.n_hits AS DOUBLE) / c.n_candidates END AS lsh_precision,
         |  CASE WHEN tr.n_truth = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(h.n_hits AS DOUBLE) / tr.n_truth END AS lsh_recall
         |FROM c CROSS JOIN tr CROSS JOIN h""".stripMargin,
    // fixed UTC epoch-week grid on both engines; retention divides exact
    // integer counts, so the doubles cannot disagree
    "q86_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
        |  FROM events),
        |co AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM co GROUP BY cohort_week),
        |act AS (
        |  SELECT co.cohort_week, a.week - co.cohort_week AS week_offset,
        |         count(*) AS n_active
        |  FROM a JOIN co ON a.user_id = co.user_id
        |  GROUP BY 1, 2)
        |SELECT act.cohort_week, act.week_offset, act.n_active, sz.cohort_size,
        |  CAST(act.n_active AS DOUBLE) / sz.cohort_size AS retention
        |FROM act JOIN sz ON act.cohort_week = sz.cohort_week""".stripMargin,
    "q37_sim_topk_brute" -> bruteTopkOracle,
    "q38_embedding_neardup" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id % 37 = 0),
         |assign AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.c_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosineSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE rn <= 4)
         |SELECT DISTINCT a_id, b_id, sim FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |         ${cosineSql("a.embedding", "b.embedding")} AS sim
         |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |WHERE sim >= 0.4""".stripMargin,
    "q41_sim_topk_ivf" -> ivfTopkOracle,
    // same cell-join candidates as q38, split odd (test) vs even (train);
    // argmax = row_number over (sim DESC, train_id ASC), the ExactTopK
    // tie-break contract
    "q98_semantic_contamination" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id % 37 = 0),
         |assign AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.c_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosineSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE rn <= 4),
         |pairs AS (
         |  SELECT DISTINCT test_id, train_id, sim FROM (
         |    SELECT t.vec_id AS test_id, r.vec_id AS train_id,
         |           ${cosineSql("t.embedding", "r.embedding")} AS sim
         |    FROM assign t JOIN assign r ON t.cell = r.cell
         |    WHERE t.vec_id % 2 = 1 AND r.vec_id % 2 = 0)
         |  WHERE sim >= 0.4),
         |ranked AS (
         |  SELECT test_id, train_id, sim,
         |    row_number() OVER (PARTITION BY test_id ORDER BY sim DESC, train_id) AS rn,
         |    count(*) OVER (PARTITION BY test_id) AS n_hits
         |  FROM pairs)
         |SELECT test_id, CAST(n_hits AS BIGINT) AS n_hits,
         |  train_id AS best_train_id, sim AS best_sim
         |FROM ranked WHERE rn = 1""".stripMargin,
    // recall@k of the IVF result vs the brute-force ground truth: both
    // sides are the (deterministic, independently oracled) q37/q41 result
    // sets, so the recall computation itself oracles as a join + counts
    "q83_ann_recall" ->
      s"""WITH ivf AS ($ivfTopkOracle),
         |brute AS ($bruteTopkOracle),
         |m AS (
         |  SELECT i.q_id, i.vec_id, i.rank AS ivf_rank, b.rank AS true_rank
         |  FROM ivf i JOIN brute b ON i.q_id = b.q_id AND i.vec_id = b.vec_id),
         |ks AS (SELECT unnest(range(1, 6)) AS k),
         |nq AS (SELECT count(DISTINCT q_id) AS n_queries FROM brute),
         |h AS (
         |  SELECT k, count(*) AS n_hits,
         |         avg(CAST(abs(ivf_rank - true_rank) AS DOUBLE)) AS mre
         |  FROM ks JOIN m ON m.ivf_rank <= ks.k AND m.true_rank <= ks.k
         |  GROUP BY k)
         |SELECT ks.k AS k, nq.n_queries AS n_queries,
         |  COALESCE(h.n_hits, 0) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / (nq.n_queries * ks.k) AS recall,
         |  COALESCE(h.mre, CAST(0 AS DOUBLE)) AS mean_rank_err
         |FROM ks LEFT JOIN h ON ks.k = h.k CROSS JOIN nq""".stripMargin,
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
    // same md5 flip/replacement draws, same sign-safe truncating
    // debias division
    "q229_randomized_response" ->
      s"""WITH ty AS (
         |  SELECT event_type,
         |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) - 1 AS t_idx
         |  FROM (SELECT DISTINCT event_type FROM events)),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM ty),
         |rep AS (
         |  SELECT e.event_type,
         |    CASE WHEN ${md5Prefix32Sql("'rr:' || CAST(event_id AS VARCHAR)")} % 4 = 0
         |      THEN r.event_type ELSE e.event_type END AS reported
         |  FROM events e CROSS JOIN kk
         |  JOIN ty r ON ${md5Prefix32Sql("'rrv:' || CAST(event_id AS VARCHAR)")} % kk.kk = r.t_idx),
         |tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM rep GROUP BY 1),
         |ob AS (SELECT reported, CAST(count(*) AS BIGINT) AS obs_cnt
         |  FROM rep GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM rep)
         |SELECT tc.event_type, true_cnt, obs_cnt,
         |  CAST(CASE WHEN 4 * obs_cnt * kk - nn < 0
         |    THEN -((nn - 4 * obs_cnt * kk) // (3 * kk))
         |    ELSE (4 * obs_cnt * kk - nn) // (3 * kk) END AS BIGINT) AS est_cnt,
         |  CAST(CASE WHEN 4 * obs_cnt * kk - nn < 0
         |    THEN -((nn - 4 * obs_cnt * kk) // (3 * kk))
         |    ELSE (4 * obs_cnt * kk - nn) // (3 * kk) END AS BIGINT) - true_cnt
         |    AS err
         |FROM tc JOIN ob ON tc.event_type = ob.reported
         |CROSS JOIN nn CROSS JOIN kk""".stripMargin,
    // same quarter window, same +30-day lateness EXISTS, same counts
    "q230_order_priority" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS o_day
        |  FROM orders
        |  WHERE epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 >= 9862
        |    AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 < 9952)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM o WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000
        |        > o.o_day + 30)
        |GROUP BY 1""".stripMargin,
    // same join, same +60-day cutoff, same conditional count + ppm floor
    "q231_late_by_priority" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS o_day
        |  FROM orders),
        |l AS (
        |  SELECT l_orderkey,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS ship_day
        |  FROM lineitem),
        |g AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(COALESCE(sum(CASE WHEN ship_day > o_day + 60 THEN 1 END), 0)
        |      AS BIGINT) AS n_late
        |  FROM l JOIN o ON l_orderkey = o_orderkey GROUP BY 1)
        |SELECT o_orderpriority, n_lines, n_late,
        |  n_late * 1000000 // n_lines AS late_ppm FROM g""".stripMargin,
    // same month window, same e4 revenue units, same PROMO flag + ppm
    "q232_promo_share" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev_e4
        |  FROM lineitem
        |  WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000
        |        BETWEEN 9862 AND 9892),
        |j AS (
        |  SELECT rev_e4, p_type = 'PROMO' AS is_promo
        |  FROM li JOIN part ON l_partkey = p_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(sum(CASE WHEN is_promo THEN rev_e4 END), 0) AS BIGINT)
        |    AS promo_e4,
        |  CAST(sum(rev_e4) AS BIGINT) AS total_e4,
        |  CAST(CAST(COALESCE(sum(CASE WHEN is_promo THEN rev_e4 END), 0)
        |      AS HUGEINT)
        |    * 1000000 // CAST(sum(rev_e4) AS BIGINT) AS BIGINT) AS promo_ppm
        |FROM j""".stripMargin,
    // same three brackets, same OR residual on the one equi-join, same
    // e4 revenue and per-bracket memberships
    "q233_bracket_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev_e4
        |  FROM lineitem),
        |j AS (
        |  SELECT qty, rev_e4,
        |    (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |      AND qty BETWEEN 1 AND 20) AS b1,
        |    (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |      AND qty BETWEEN 10 AND 35) AS b2,
        |    (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
        |      AND qty BETWEEN 25 AND 50) AS b3
        |  FROM li JOIN part ON l_partkey = p_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(sum(CASE WHEN b1 THEN 1 END), 0) AS BIGINT) AS b1_lines,
        |  CAST(COALESCE(sum(CASE WHEN b2 THEN 1 END), 0) AS BIGINT) AS b2_lines,
        |  CAST(COALESCE(sum(CASE WHEN b3 THEN 1 END), 0) AS BIGINT) AS b3_lines,
        |  CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
        |FROM j WHERE b1 OR b2 OR b3""".stripMargin,
    // same LP labels (l5), same two-sided cut count, same degree volume
    // and least() denominator, exact ppm
    "q234_conductance" ->
      s"""$graphPrefix,
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs)
        |  GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
        |tg AS (
        |  SELECT la.label AS la, lb.label AS lb
        |  FROM pairs p JOIN l5 la ON la.id = p.src JOIN l5 lb ON lb.id = p.dst),
        |cut AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS cut FROM (
        |    SELECT la AS label FROM tg WHERE la <> lb
        |    UNION ALL SELECT lb FROM tg WHERE la <> lb)
        |  GROUP BY 1),
        |vol AS (
        |  SELECT l.label, CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(sum(d.deg) AS BIGINT) AS vol
        |  FROM l5 l JOIN deg d ON d.id = l.id GROUP BY 1)
        |SELECT vol.label, n_members, vol,
        |  CAST(COALESCE(cut, 0) AS BIGINT) AS cut, mm.m,
        |  CAST(CASE WHEN least(vol, 2 * mm.m - vol) > 0
        |    THEN COALESCE(cut, 0) * 1000000 // least(vol, 2 * mm.m - vol)
        |    ELSE 0 END AS BIGINT) AS conductance_ppm
        |FROM vol LEFT JOIN cut USING (label) CROSS JOIN mm""".stripMargin,
    // same micro grid, same HUGEINT cross-centroid numerators, same
    // nano floor
    "q235_centroid_gaps" ->
      """WITH ex AS (
        |  SELECT label, unnest(range(0, len(embedding))) AS dim,
        |    unnest(list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS m
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, dim, CAST(sum(m) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2),
        |g AS (
        |  SELECT a.label AS label_a, b.label AS label_b, a.n AS na, b.n AS nb,
        |    sum((CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)
        |      * (CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)) AS num
        |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY 1, 2, 3, 4)
        |SELECT label_a, label_b, na AS n_a, nb AS n_b,
        |  CAST(num // (CAST(na AS HUGEINT) * na * nb * nb * 1000) AS BIGINT)
        |    AS gap_nano
        |FROM g""".stripMargin,
    // same count grid, same doubled midranks, same u2 and AUC ppm floor
    "q236_mann_whitney" ->
      """WITH vc AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM vc GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM srcs),
        |gv AS (SELECT v, CAST(sum(c) AS BIGINT) AS g FROM vc GROUP BY 1),
        |rk AS (
        |  SELECT v, g, CAST(COALESCE(sum(g) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS below
        |  FROM gv),
        |r2t AS (
        |  SELECT source, sum(CAST(c AS HUGEINT) * (2 * below + g + 1)) AS r2
        |  FROM vc JOIN rk USING (v) GROUP BY 1)
        |SELECT s.source, s.n_s, tot.n - s.n_s AS n_rest,
        |  CAST(r2 - CAST(s.n_s AS HUGEINT) * (s.n_s + 1) AS BIGINT) AS u2,
        |  CAST((r2 - CAST(s.n_s AS HUGEINT) * (s.n_s + 1)) * 500000
        |    // (CAST(s.n_s AS HUGEINT) * (tot.n - s.n_s)) AS BIGINT) AS auc_ppm
        |FROM r2t s2 JOIN srcs s ON s2.source = s.source CROSS JOIN tot""".stripMargin,
    // same daily counts, same day-pair grid, same sign/tie conditionals
    "q237_kendall" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |xy AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day_num,
        |    a.cnt AS x, b.cnt AS y
        |  FROM daily a JOIN daily b
        |    ON a.day_num = b.day_num AND a.event_type < b.event_type),
        |p AS (
        |  SELECT u.type_a, u.type_b, u.x AS x1, u.y AS y1, w.x AS x2, w.y AS y2
        |  FROM xy u JOIN xy w ON u.type_a = w.type_a AND u.type_b = w.type_b
        |    AND u.day_num < w.day_num)
        |SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_day_pairs,
        |  CAST(COALESCE(sum(CASE WHEN CAST(x1 - x2 AS HUGEINT) * (y1 - y2) > 0
        |    THEN 1 END), 0) AS BIGINT) AS concordant,
        |  CAST(COALESCE(sum(CASE WHEN CAST(x1 - x2 AS HUGEINT) * (y1 - y2) < 0
        |    THEN 1 END), 0) AS BIGINT) AS discordant,
        |  CAST(COALESCE(sum(CASE WHEN x1 = x2 THEN 1 END), 0) AS BIGINT) AS tie_a,
        |  CAST(COALESCE(sum(CASE WHEN y1 = y2 THEN 1 END), 0) AS BIGINT) AS tie_b
        |FROM p GROUP BY 1, 2""".stripMargin,
    // same degree aggregate, same binary-length log2 buckets
    "q238_degree_histogram" ->
      s"""WITH $ratingsCte,
        |$goodCte,
        |$pairsCte,
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs)
        |  GROUP BY 1)
        |SELECT CAST(len(bin(deg)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_vertices,
        |  CAST(min(deg) AS BIGINT) AS min_deg,
        |  CAST(max(deg) AS BIGINT) AS max_deg
        |FROM deg GROUP BY 1""".stripMargin,
    // same three range predicates, same e4 discount-revenue sum
    "q240_forecast_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
        |    AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000
        |      BETWEEN 9862 AND 10226
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      BETWEEN 5 AND 7
        |  AND l_quantity < 24.0""".stripMargin,
    // same quarter window, same R-flag filter, same post-aggregate dim
    // join and (lost DESC, custkey) top-20
    "q241_returned_revenue" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  WHERE epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
        |        BETWEEN 9862 AND 9951),
        |lost AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
        |      AS BIGINT) AS lost_e4
        |  FROM lineitem JOIN o ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R' GROUP BY 1)
        |SELECT c_custkey, c_nationkey, n_lines, lost_e4
        |FROM lost JOIN customer ON o_custkey = c_custkey
        |ORDER BY lost_e4 DESC, c_custkey LIMIT 20""".stripMargin,
    // same per-order HAVING aggregate, same cents, same top-20 tiebreak
    "q242_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT o_orderkey, o_custkey, total_qty,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS total_cents
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY total_cents DESC, o_orderkey LIMIT 20""".stripMargin,
    // q71's stride-seeded assignment, label lookup, per-cell plurality
    // with (cnt DESC, label) ties, exact ppm purity
    "q243_cell_purity" ->
      s"""WITH c AS (
        |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
        |  WHERE vec_id % 37 = 0),
        |a AS (
        |  SELECT e.vec_id, e.label, c.c_id,
        |    ${cosineSql("e.embedding", "c.c_emb")} AS c_sim
        |  FROM embeddings e CROSS JOIN c),
        |asn AS (
        |  SELECT vec_id, label, c_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY c_sim DESC, c_id) AS rn FROM a)
        |  WHERE rn = 1),
        |cl AS (
        |  SELECT cell, label, CAST(count(*) AS BIGINT) AS cnt
        |  FROM asn GROUP BY 1, 2),
        |top AS (
        |  SELECT cell, label, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY cell) AS BIGINT) AS n_members,
        |    row_number() OVER (PARTITION BY cell
        |      ORDER BY cnt DESC, label) AS rn
        |  FROM cl)
        |SELECT cell, n_members, label AS top_label, cnt AS top_count,
        |  cnt * 1000000 // n_members AS purity_ppm
        |FROM top WHERE rn = 1""".stripMargin,
    // q72's window hashes kept per doc, occurrence-count join back,
    // same >=2 shared rule and ppm floor
    "q244_doc_span_share" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT)),
        |      c -> ${md5Prefix32Sql("array_to_string(t[c*32+1 : c*32+32], ' ')")})) AS g
        |  FROM toks),
        |df AS (SELECT g, CAST(count(*) AS BIGINT) AS occ FROM w GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(sum(CASE WHEN occ >= 2 THEN 1 END), 0) AS BIGINT)
        |    AS n_shared,
        |  CAST(COALESCE(sum(CASE WHEN occ >= 2 THEN 1 END), 0) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS shared_ppm
        |FROM w JOIN df USING (g) GROUP BY 1""".stripMargin,
    // same prefix sums over ordered days, same cleared-denominator nano
    // score, same (score DESC, day) argmax
    "q245_binary_segmentation" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |pre AS (
        |  SELECT event_type, day_num, cnt,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_num)
        |      AS BIGINT) AS k,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS s
        |  FROM daily),
        |sc AS (
        |  SELECT *,
        |    CAST((CAST(s1 AS HUGEINT) * (n - k) - CAST(s - s1 AS HUGEINT) * k)
        |      * (CAST(s1 AS HUGEINT) * (n - k) - CAST(s - s1 AS HUGEINT) * k)
        |      * 1000000000
        |      // (CAST(k AS HUGEINT) * (n - k)) AS BIGINT) AS score_nano
        |  FROM pre WHERE k < n)
        |SELECT event_type, n AS n_days, day_num AS split_day,
        |  k AS left_days, n - k AS right_days,
        |  s1 AS left_sum, s - s1 AS right_sum, score_nano
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY score_nano DESC, day_num) AS rn FROM sc)
        |WHERE rn = 1""".stripMargin,
    // pixels re-derived from the q135 generative formula (Spark parses
    // the real bytes); same cross-multiplied mean bits
    "q246_image_ahash" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w * h AS n,
        |    list_transform(range(0, w * h), k -> (doc_id * 13 + k * 7) % 256) AS b
        |  FROM d)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_pixels,
        |  CAST(list_sum(b) AS BIGINT) AS px_sum,
        |  CAST(list_sum(list_transform(range(0, n), k ->
        |    CASE WHEN b[CAST(k + 1 AS INTEGER)] * n > list_sum(b)
        |    THEN 1 << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ahash
        |FROM px""".stripMargin,
    // same nation-pair prune before the joins, same epoch-day//365
    // year, same e4 revenue
    "q247_nation_trade" ->
      """WITH n AS (
        |  SELECT n_nationkey, n_name FROM nation
        |  WHERE n_name IN ('NATION_1', 'NATION_2')),
        |c AS (
        |  SELECT c_custkey, n_name AS cust_nation
        |  FROM customer JOIN n ON c_nationkey = n_nationkey),
        |s AS (
        |  SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN n ON s_nationkey = n_nationkey),
        |o AS (
        |  SELECT o_orderkey, cust_nation
        |  FROM orders JOIN c ON o_custkey = c_custkey)
        |SELECT supp_nation, cust_nation,
        |  (epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000) // 365
        |    AS l_year,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
        |    AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN s ON l_suppkey = s_suppkey
        |JOIN o ON l_orderkey = o_orderkey
        |WHERE supp_nation <> cust_nation
        |GROUP BY 1, 2, 3""".stripMargin,
    // same quarter revenue view, same exact-e4 max tie re-join
    "q248_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
        |      AS BIGINT) AS total_e4
        |  FROM lineitem
        |  WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000
        |        BETWEEN 9862 AND 9951
        |  GROUP BY 1),
        |mx AS (SELECT max(total_e4) AS mx FROM rev)
        |SELECT s_suppkey, total_e4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |CROSS JOIN mx WHERE total_e4 = mx""".stripMargin,
    // same symmetric closure, same distinct one-or-two-hop union
    "q251_two_hop_reach" ->
      s"""WITH $ratingsCte,
        |$goodCte,
        |$pairsCte,
        |und AS (
        |  SELECT src, dst FROM pairs
        |  UNION ALL SELECT dst AS src, src AS dst FROM pairs),
        |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        |  FROM und GROUP BY 1),
        |reach AS (
        |  SELECT v AS id, CAST(count(*) AS BIGINT) AS reach2 FROM (
        |    SELECT src AS v, dst AS u2 FROM und
        |    UNION
        |    SELECT a.src AS v, b.dst AS u2
        |    FROM und a JOIN und b ON a.dst = b.src
        |    WHERE a.src <> b.dst)
        |  GROUP BY 1)
        |SELECT deg.id, deg.deg, reach.reach2
        |FROM deg JOIN reach ON deg.id = reach.id""".stripMargin,
    // same region/nation prunes, same epoch-day//365 year, same e4
    // sums and ppm floor
    "q252_market_share" ->
      """WITH rn AS (
        |  SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |c AS (SELECT c_custkey FROM customer
        |  JOIN rn ON c_nationkey = n_nationkey),
        |o AS (SELECT o_orderkey FROM orders JOIN c ON o_custkey = c_custkey),
        |sn AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_1'),
        |li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    (epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000) // 365
        |      AS l_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev_e4
        |  FROM lineitem),
        |g AS (
        |  SELECT l_year,
        |    CAST(COALESCE(sum(CASE WHEN sn.s_suppkey IS NOT NULL
        |      THEN rev_e4 END), 0) AS BIGINT) AS nation_e4,
        |    CAST(sum(rev_e4) AS BIGINT) AS total_e4
        |  FROM li JOIN o ON l_orderkey = o_orderkey
        |  LEFT JOIN sn ON l_suppkey = sn.s_suppkey
        |  GROUP BY 1)
        |SELECT l_year, nation_e4, total_e4,
        |  CAST(CAST(nation_e4 AS HUGEINT) * 1000000 // total_e4 AS BIGINT)
        |    AS share_ppm FROM g""".stripMargin,
    // same distinct shipped-pair reduction, same brand exclusion and
    // size-band floor, same distinct counts
    "q253_part_supplier_counts" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |p AS (
        |  SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) // 10 AS size_band
        |  FROM part WHERE p_brand <> 'Brand#13')
        |SELECT p_brand, size_band,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        |FROM ps JOIN p ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
    // same name-contains prune, same supplier-nation x ship-year star,
    // same revenue-side proxy in e4
    "q254_product_profit" ->
      """WITH p AS (SELECT p_partkey FROM part
        |  WHERE p_name LIKE '%widget%'),
        |li AS (
        |  SELECT l_partkey, l_suppkey,
        |    (epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000) // 365
        |      AS l_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev_e4
        |  FROM lineitem)
        |SELECT n_name, l_year, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(rev_e4) AS BIGINT) AS profit_e4
        |FROM li
        |JOIN p ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    // same name prune, same per-pair/per-part quantity aggregates, same
    // 2x-average cross-multiplied dominance, same distinct nation rollup
    "q255_promotion_suppliers" ->
      """WITH p AS (SELECT p_partkey FROM part
        |  WHERE p_name LIKE '%cold%'),
        |pair AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS pair_qty_e2
        |  FROM lineitem JOIN p ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |pt AS (
        |  SELECT l_partkey AS pk, CAST(sum(pair_qty_e2) AS BIGINT)
        |    AS part_qty_e2, CAST(count(*) AS BIGINT) AS n_suppliers_part
        |  FROM pair GROUP BY 1),
        |dom AS (
        |  SELECT DISTINCT l_suppkey FROM pair JOIN pt ON l_partkey = pk
        |  WHERE pair_qty_e2 * n_suppliers_part > part_qty_e2 * 2)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
        |FROM dom
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    // exact totals of the same one-or-two-hop distinct union; the HLL
    // estimate has no cross-engine twin, so the bound column is graded
    "q256_approx_reach" ->
      s"""WITH $ratingsCte,
        |$goodCte,
        |$pairsCte,
        |und AS (
        |  SELECT src, dst FROM pairs
        |  UNION ALL SELECT dst AS src, src AS dst FROM pairs),
        |reach AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS reach2 FROM (
        |    SELECT src AS v, dst AS u2 FROM und
        |    UNION
        |    SELECT a.src AS v, b.dst AS u2
        |    FROM und a JOIN und b ON a.dst = b.src
        |    WHERE a.src <> b.dst)
        |  GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_vertices,
        |  CAST(sum(reach2) AS BIGINT) AS total_reach2,
        |  true AS approx_ok
        |FROM reach""".stripMargin,
    // same seeded teleport, same integer floor-division mass rounds
    "q257_personalized_pagerank" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |${personalizedPageRankCtes(3)}
         |SELECT v AS user_id, r AS ppr_scaled FROM p3""".stripMargin,
    // same packed priorities, same strict winner rule, same 3 rounds
    "q270_luby_mis" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |${lubyCtes(3)}
         |SELECT vs.id,
         |  CASE WHEN m3.id IS NOT NULL THEN 'mis'
         |       WHEN oo3.id IS NOT NULL THEN 'out'
         |       ELSE 'undecided' END AS status
         |FROM vs
         |LEFT JOIN m3 ON vs.id = m3.id
         |LEFT JOIN oo3 ON vs.id = oo3.id""".stripMargin,
    // same epoch-day buckets, same per-user distinct-day counts, same
    // histogram rollup
    "q271_engagement_curve" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
        |      AS BIGINT) AS active_days,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT active_days, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n_events) AS BIGINT) AS total_events
        |FROM pu GROUP BY 1""".stripMargin,
    // same md5 user folds, same per-fold aggregates, same cross-fold
    // distinct-user identity
    "q272_group_kfold" ->
      s"""WITH $ratingsCte,
        |f AS (
        |  SELECT userId, productId,
        |    ${md5Prefix32Sql("'fold:' || CAST(userId AS VARCHAR)")} % 5 AS fold
        |  FROM ratings),
        |pf AS (
        |  SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT userId) AS BIGINT) AS n_users,
        |    CAST(count(DISTINCT productId) AS BIGINT) AS n_items
        |  FROM f GROUP BY 1),
        |g AS (SELECT CAST(count(DISTINCT userId) AS BIGINT) AS n_users_global
        |  FROM ratings),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS n_users_all_folds FROM pf)
        |SELECT fold, n_rows, n_users, n_items, n_users_all_folds,
        |  n_users_global, n_users_all_folds = n_users_global AS leak_free
        |FROM pf CROSS JOIN g CROSS JOIN t""".stripMargin,
    // same (n_chars, doc_id) rank order, same floor cut, same milli mean
    "q273_trimmed_mean" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT)
        |    AS trimmed_mean_milli
        |FROM r WHERE rk > n * 100 // 1000 AND rk <= n - n * 100 // 1000
        |GROUP BY 1""".stripMargin,
    // same user-keyed lead pairs, same path counts, same tie-broken
    // top-20
    "q274_path_trigrams" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS t1,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS t3
        |  FROM events)
        |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
        |FROM s WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, t1, t2, t3 LIMIT 20""".stripMargin,
    // same per-half bucket counts, same probe algebra, same top movers
    "q275_cms_movers" ->
      s"""WITH hashed AS (
         |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 < 19738 AS is_a
         |  FROM events),
         |perm AS (SELECT unnest(range(0, 4)) AS j),
         |bk AS (
         |  SELECT is_a, j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
         |    count(*) AS c
         |  FROM hashed CROSS JOIN perm GROUP BY 1, 2, 3),
         |movers AS (
         |  SELECT user_id, h,
         |    CAST(COALESCE(sum(CASE WHEN is_a THEN 1 END), 0) AS BIGINT) AS cnt_a,
         |    CAST(COALESCE(sum(CASE WHEN NOT is_a THEN 1 END), 0) AS BIGINT) AS cnt_b
         |  FROM hashed GROUP BY 1, 2
         |  ORDER BY abs(cnt_b - cnt_a) DESC, user_id LIMIT 20),
         |probe AS (
         |  SELECT user_id, cnt_a, cnt_b, j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b
         |  FROM movers CROSS JOIN perm)
         |SELECT p.user_id, p.cnt_a, p.cnt_b, p.cnt_b - p.cnt_a AS delta,
         |  CAST(min(COALESCE(ba.c, 0)) AS BIGINT) AS est_a,
         |  CAST(min(COALESCE(bb.c, 0)) AS BIGINT) AS est_b,
         |  CAST(min(COALESCE(ba.c, 0)) AS BIGINT) >= p.cnt_a
         |    AND CAST(min(COALESCE(bb.c, 0)) AS BIGINT) >= p.cnt_b AS bounds_ok
         |FROM probe p
         |LEFT JOIN bk ba ON ba.is_a AND ba.j = p.j AND ba.b = p.b
         |LEFT JOIN bk bb ON NOT bb.is_a AND bb.j = p.j AND bb.b = p.b
         |GROUP BY 1, 2, 3, 4""".stripMargin,
    // same two unrolled sweeps, same deepest-vertex reseed, same bound
    "q276_diameter_bound" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |${bfsCtesFrom("v", "SELECT min(src) AS id, 0 AS layer FROM edges", 6)},
         |far AS MATERIALIZED (
         |  SELECT id FROM v6 ORDER BY layer DESC, id LIMIT 1),
         |${bfsCtesFrom("w", "SELECT id, 0 AS layer FROM far", 6)}
         |SELECT
         |  CAST((SELECT min(id) FROM v6 WHERE layer = 0) AS BIGINT) AS seed1,
         |  CAST((SELECT max(layer) FROM v6) AS BIGINT) AS ecc1,
         |  CAST((SELECT id FROM far) AS BIGINT) AS seed2,
         |  CAST((SELECT max(layer) FROM w6) AS BIGINT) AS diameter_lb,
         |  CAST((SELECT count(*) FROM w6) AS BIGINT) AS n_reached2""".stripMargin,
    // same deterministic change set, same one-join merge semantics,
    // same null-sentinel row hashes
    "q277_cdc_apply" ->
      s"""WITH st AS (
         |  SELECT o_orderkey AS k,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS price_e2,
         |    o_orderstatus AS status
         |  FROM orders),
         |ch AS (
         |  SELECT k, CAST(NULL AS BIGINT) AS c_price,
         |    CAST(NULL AS VARCHAR) AS c_status, 'D' AS op
         |  FROM st WHERE k % 7 = 0
         |  UNION ALL
         |  SELECT k, price_e2 + 500, status, 'U' FROM st
         |  WHERE k % 7 <> 0 AND k % 11 = 0
         |  UNION ALL
         |  SELECT k + 1000000000, price_e2, status, 'I' FROM st
         |  WHERE k % 31 = 0),
         |ap AS (
         |  SELECT COALESCE(st.k, ch.k) AS k,
         |    COALESCE(ch.c_price, st.price_e2) AS price_e2,
         |    COALESCE(ch.c_status, st.status) AS status, ch.op
         |  FROM st FULL OUTER JOIN ch ON st.k = ch.k
         |  WHERE COALESCE(ch.op, '') <> 'D'),
         |h AS (SELECT op, concat_ws(chr(1),
         |    COALESCE(CAST(k AS VARCHAR), chr(0) || 'null'),
         |    COALESCE(CAST(price_e2 AS VARCHAR), chr(0) || 'null'),
         |    COALESCE(status, chr(0) || 'null')) AS j FROM ap)
         |SELECT
         |  CAST((SELECT count(*) FROM st) AS BIGINT) AS n_before,
         |  CAST(COALESCE(sum(CASE WHEN op = 'I' THEN 1 END), 0) AS BIGINT)
         |    AS n_inserted,
         |  CAST(COALESCE(sum(CASE WHEN op = 'U' THEN 1 END), 0) AS BIGINT)
         |    AS n_updated,
         |  CAST((SELECT count(*) FROM ch WHERE op = 'D') AS BIGINT)
         |    AS n_deleted,
         |  CAST(count(*) AS BIGINT) AS n_after,
         |  CAST(sum(${md5Prefix32Sql("j")}) AS BIGINT) AS state_checksum
         |FROM h""".stripMargin,
    // same tie-prone dollar buckets, same four ranking semantics, same
    // exact ppm percent_rank
    "q278_rank_family" ->
      """WITH b AS (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(floor(c_acctbal) AS BIGINT) AS bal_dollars
        |  FROM customer),
        |r AS (
        |  SELECT c_mktsegment, bal_dollars, c_custkey,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY bal_dollars DESC, c_custkey) AS BIGINT) AS rn,
        |    CAST(rank() OVER (PARTITION BY c_mktsegment
        |      ORDER BY bal_dollars DESC) AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY c_mktsegment
        |      ORDER BY bal_dollars DESC) AS BIGINT) AS drnk,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM b)
        |SELECT c_mktsegment, bal_dollars, c_custkey, rn, rnk, drnk,
        |  CASE WHEN n = 1 THEN 0
        |    ELSE (rnk - 1) * 1000000 // (n - 1) END AS pr_ppm
        |FROM r WHERE rn <= 5""".stripMargin,
    // same epoch-week buckets, same first-week/prev-week state split,
    // same week-after churn attribution
    "q279_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS week
        |  FROM events),
        |fw AS (SELECT user_id, min(week) AS fw FROM uw GROUP BY 1),
        |pv AS (SELECT user_id, week + 1 AS week FROM uw),
        |st AS (
        |  SELECT uw.week,
        |    CASE WHEN uw.week = fw.fw THEN 'new'
        |         WHEN pv.user_id IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS state
        |  FROM uw
        |  JOIN fw ON uw.user_id = fw.user_id
        |  LEFT JOIN pv ON uw.user_id = pv.user_id AND uw.week = pv.week),
        |ag AS (
        |  SELECT week, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(COALESCE(sum(CASE WHEN state = 'new' THEN 1 END), 0)
        |      AS BIGINT) AS n_new,
        |    CAST(COALESCE(sum(CASE WHEN state = 'retained' THEN 1 END), 0)
        |      AS BIGINT) AS n_retained,
        |    CAST(COALESCE(sum(CASE WHEN state = 'resurrected' THEN 1 END), 0)
        |      AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1),
        |chn AS (
        |  SELECT p.week, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM pv p
        |  WHERE NOT EXISTS (SELECT 1 FROM uw
        |    WHERE uw.user_id = p.user_id AND uw.week = p.week)
        |  GROUP BY 1)
        |SELECT COALESCE(ag.week, chn.week) AS week,
        |  COALESCE(n_active, 0) AS n_active, COALESCE(n_new, 0) AS n_new,
        |  COALESCE(n_retained, 0) AS n_retained,
        |  COALESCE(n_resurrected, 0) AS n_resurrected,
        |  COALESCE(n_churned, 0) AS n_churned
        |FROM ag FULL OUTER JOIN chn ON ag.week = chn.week""".stripMargin,
    // same two runs off the same tf table, same top-20 + rank windows,
    // same integer-floor reciprocal contributions, NULL-rank = 0
    "q258_rrf_fusion" ->
      """WITH stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, n_chars AS dl,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok IN ('dup', 'spark', 'window', 'batch')
        |  GROUP BY 1, 2, 3),
        |idf AS (
        |  SELECT tok, CAST(len(bin(n_docs // df)) AS BIGINT) AS idf2
        |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        |  CROSS JOIN stats),
        |sc AS (
        |  SELECT doc_id, CAST(sum(idf2 * (CAST(22 AS HUGEINT) * tf.tf * total_dl * 1000000
        |      // (CAST(10 AS HUGEINT) * tf.tf * total_dl
        |          + CAST(3 AS HUGEINT) * total_dl
        |          + CAST(9 AS HUGEINT) * dl * n_docs)))
        |      AS BIGINT) AS score_micro
        |  FROM tf JOIN idf ON tf.tok = idf.tok CROSS JOIN stats
        |  GROUP BY 1),
        |bm AS (
        |  SELECT doc_id, CAST(row_number() OVER
        |      (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS r_bm25
        |  FROM (SELECT * FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20)),
        |dn AS (
        |  SELECT doc_id, CAST(row_number() OVER
        |      (ORDER BY density_micro DESC, doc_id) AS BIGINT) AS r_density
        |  FROM (SELECT doc_id, tf_sum * 1000000 // dl AS density_micro
        |        FROM (SELECT doc_id, dl, CAST(sum(tf) AS BIGINT) AS tf_sum
        |              FROM tf GROUP BY 1, 2)
        |        ORDER BY density_micro DESC, doc_id LIMIT 20))
        |SELECT COALESCE(bm.doc_id, dn.doc_id) AS doc_id, r_bm25, r_density,
        |  COALESCE(1000000000 // (60 + r_bm25), 0)
        |    + COALESCE(1000000000 // (60 + r_density), 0) AS rrf_e9
        |FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id""".stripMargin,
    // same tokenization, same multiset 3-gram counts, same ppm floor
    "q259_repetition_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(len(t) - 2 AS BIGINT) AS n_grams,
        |    unnest(list_transform(range(0, len(t) - 2),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        |  FROM toks WHERE len(t) >= 3),
        |c AS (
        |  SELECT doc_id, n_grams, g, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT doc_id, n_grams, CAST(max(c) AS BIGINT) AS max_rep,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(c) * 1000000 // n_grams AS BIGINT) AS rep_ppm
        |FROM c GROUP BY 1, 2""".stripMargin,
    // same cross-multiplied integer-log2 ratio weights, same -64 cap,
    // same token-keyed score join
    "q260_importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents),
        |cs AS (SELECT t, CAST(count(*) AS BIGINT) AS n_s FROM toks GROUP BY 1),
        |ts AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM toks
        |  WHERE lang = 'en' GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS big_n_s,
        |    CAST(COALESCE(sum(CASE WHEN lang = 'en' THEN 1 END), 0) AS BIGINT)
        |      AS big_n_t
        |  FROM toks),
        |w AS (
        |  SELECT cs.t,
        |    CASE WHEN ts.n_t IS NULL THEN CAST(-64 AS BIGINT)
        |    WHEN CAST(ts.n_t AS HUGEINT) * big_n_s
        |         >= CAST(cs.n_s AS HUGEINT) * big_n_t
        |    THEN CAST(len(bin(CAST(CAST(ts.n_t AS HUGEINT) * big_n_s
        |      // (CAST(cs.n_s AS HUGEINT) * big_n_t) AS BIGINT))) AS BIGINT)
        |    ELSE -CAST(len(bin(CAST(CAST(cs.n_s AS HUGEINT) * big_n_t
        |      // (CAST(ts.n_t AS HUGEINT) * big_n_s) AS BIGINT))) AS BIGINT)
        |    END AS w
        |  FROM cs LEFT JOIN ts ON cs.t = ts.t CROSS JOIN tot)
        |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(w.w) AS BIGINT) AS dsir_score
        |FROM toks JOIN w ON toks.t = w.t
        |GROUP BY 1, 2""".stripMargin,
    // same md5-prefix32 dimension hash, same mod-64 buckets, same counts
    "q261_hashed_vectorizer" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
        |  FROM documents)
        |SELECT doc_id, ${md5Prefix32Sql("t")} % 64 AS dim,
        |  CAST(count(*) AS BIGINT) AS weight
        |FROM toks GROUP BY 1, 2""".stripMargin,
    // same MinHash candidates, same hashed vectors, same cross-
    // multiplied cos^2 ppm
    "q262_rerank_candidates" ->
      s"""WITH $minhashCtes,
        |hv AS (
        |  SELECT doc_id, ${md5Prefix32Sql("tk")} % 64 AS dim,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM (SELECT doc_id, unnest(t) AS tk FROM toks)
        |  GROUP BY 1, 2),
        |nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS s2
        |  FROM hv GROUP BY 1),
        |dots AS (
        |  SELECT p.a_id, p.b_id, CAST(sum(a.w * b.w) AS BIGINT) AS dot
        |  FROM mh_pairs p
        |  JOIN hv a ON a.doc_id = p.a_id
        |  JOIN hv b ON b.doc_id = p.b_id AND b.dim = a.dim
        |  GROUP BY 1, 2)
        |SELECT d.a_id, d.b_id, d.dot,
        |  CAST(CAST(d.dot AS HUGEINT) * d.dot * 1000000
        |    // (CAST(na.s2 AS HUGEINT) * nb.s2) AS BIGINT) AS cos2_ppm
        |FROM dots d
        |JOIN nrm na ON na.doc_id = d.a_id
        |JOIN nrm nb ON nb.doc_id = d.b_id""".stripMargin,
    // same delta slices, same old - del + ins identity, same direct
    // recompute and equality flag
    "q263_incremental_revenue" ->
      """WITH l AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev_e4,
        |    l_orderkey % 13 = 0 AS is_del,
        |    l_orderkey % 13 <> 0 AND l_orderkey % 17 = 0 AS is_ins
        |  FROM lineitem),
        |o AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_old,
        |  CAST(sum(rev_e4) AS BIGINT) AS rev_old FROM l
        |  WHERE NOT is_ins GROUP BY 1),
        |d AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_del,
        |  CAST(sum(rev_e4) AS BIGINT) AS rev_del FROM l
        |  WHERE is_del GROUP BY 1),
        |i AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_ins,
        |  CAST(sum(rev_e4) AS BIGINT) AS rev_ins FROM l
        |  WHERE is_ins GROUP BY 1),
        |dr AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_direct,
        |  CAST(sum(rev_e4) AS BIGINT) AS rev_direct_e4 FROM l
        |  WHERE NOT is_del GROUP BY 1)
        |SELECT COALESCE(o.l_returnflag, d.l_returnflag, i.l_returnflag,
        |    dr.l_returnflag) AS l_returnflag,
        |  COALESCE(n_old, 0) - COALESCE(n_del, 0) + COALESCE(n_ins, 0)
        |    AS n_maintained,
        |  COALESCE(rev_old, 0) - COALESCE(rev_del, 0) + COALESCE(rev_ins, 0)
        |    AS rev_maintained_e4,
        |  COALESCE(n_direct, 0) AS n_direct,
        |  COALESCE(rev_direct_e4, 0) AS rev_direct_e4,
        |  COALESCE(n_old, 0) - COALESCE(n_del, 0) + COALESCE(n_ins, 0)
        |      = COALESCE(n_direct, 0)
        |    AND COALESCE(rev_old, 0) - COALESCE(rev_del, 0)
        |      + COALESCE(rev_ins, 0) = COALESCE(rev_direct_e4, 0)
        |    AS maintained_ok
        |FROM o
        |FULL OUTER JOIN d ON o.l_returnflag = d.l_returnflag
        |FULL OUTER JOIN i ON COALESCE(o.l_returnflag, d.l_returnflag)
        |  = i.l_returnflag
        |FULL OUTER JOIN dr ON COALESCE(o.l_returnflag, d.l_returnflag,
        |  i.l_returnflag) = dr.l_returnflag""".stripMargin,
    // same simulated snapshots, same md5 payload checksums, same
    // one-join diff counts
    "q264_snapshot_diff" ->
      s"""WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_e2,
        |    o_orderstatus, o_orderpriority
        |  FROM orders),
        |olds AS (
        |  SELECT o_orderkey AS k,
        |    ${md5Prefix32Sql("CAST(price_e2 AS VARCHAR) || o_orderstatus || o_orderpriority")}
        |      AS ck_old
        |  FROM base WHERE o_orderkey % 29 <> 0),
        |news AS (
        |  SELECT o_orderkey AS k,
        |    ${md5Prefix32Sql("CAST(CASE WHEN o_orderkey % 19 = 0 THEN price_e2 + 100 ELSE price_e2 END AS VARCHAR) || o_orderstatus || o_orderpriority")}
        |      AS ck_new
        |  FROM base WHERE o_orderkey % 23 <> 0)
        |SELECT
        |  CAST(COALESCE(sum(CASE WHEN ck_old IS NULL THEN 1 END), 0) AS BIGINT)
        |    AS n_added,
        |  CAST(COALESCE(sum(CASE WHEN ck_new IS NULL THEN 1 END), 0) AS BIGINT)
        |    AS n_removed,
        |  CAST(COALESCE(sum(CASE WHEN ck_old IS NOT NULL AND ck_new IS NOT NULL
        |    AND ck_old <> ck_new THEN 1 END), 0) AS BIGINT) AS n_changed,
        |  CAST(COALESCE(sum(CASE WHEN ck_old = ck_new THEN 1 END), 0) AS BIGINT)
        |    AS n_unchanged
        |FROM olds FULL OUTER JOIN news ON olds.k = news.k""".stripMargin,
    // same wedge join, same 1e9-floor reciprocal weights, same non-edge
    // anti join and (ra DESC, src, dst) top-100
    "q265_resource_allocation" ->
      s"""WITH $ratingsCte,
         |$goodCte,
         |$pairsCte,
         |$edgesCte,
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |sc AS (
         |  SELECT x.dst AS src, y.dst AS dst, CAST(count(*) AS BIGINT) AS cn,
         |    CAST(sum(1000000000 // d.deg) AS BIGINT) AS ra_e9
         |  FROM edges x
         |  JOIN edges y ON x.src = y.src AND x.dst < y.dst
         |  JOIN deg d ON d.src = x.src
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |ne AS (
         |  SELECT s.* FROM sc s
         |  WHERE NOT EXISTS (SELECT 1 FROM pairs p
         |    WHERE p.src = s.src AND p.dst = s.dst))
         |SELECT src, dst, cn, ra_e9 FROM (
         |  SELECT ne.*, row_number() OVER
         |    (ORDER BY ra_e9 DESC, src, dst) AS rn FROM ne)
         |WHERE rn <= 100""".stripMargin,
    // same user-keyed lead intervals, same e2*us numerator, same floor
    // average, same zero-span drop
    "q266_time_weighted_value" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v_e2,
        |    epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(CAST(ts AS TIMESTAMP)) AS dt
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(v_e2 * dt) AS BIGINT) AS twv_e2us,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  CAST(sum(v_e2 * dt) // sum(dt) AS BIGINT) AS twa_e2
        |FROM iv WHERE dt IS NOT NULL
        |GROUP BY 1 HAVING sum(dt) > 0""".stripMargin,
    // same q33 predictions, same confusion rollup, same cleared ppm
    // floors with explicit zero-denominator classes
    "q267_langid_eval" ->
      """WITH pred AS (
        |  SELECT doc_id,
        |    CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
        |         WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
        |         WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
        |         WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS pred_lang
        |  FROM (
        |    SELECT doc_id,
        |      len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS h_en,
        |      len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS h_de,
        |      len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS h_fr,
        |      len(regexp_extract_all(lower(text), '\b(el|los|las|que|una)\b')) AS h_es,
        |      len(regexp_extract_all(text, '[一-鿿]')) AS h_zh
        |    FROM documents)),
        |cm AS (
        |  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
        |  GROUP BY 1, 2),
        |cls AS (SELECT DISTINCT lang AS cls FROM cm
        |  UNION SELECT DISTINCT pred_lang FROM cm),
        |tp AS (SELECT lang AS cls, n AS tp FROM cm WHERE lang = pred_lang),
        |tt AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS n_truth
        |  FROM cm GROUP BY 1),
        |pt AS (SELECT pred_lang AS cls, CAST(sum(n) AS BIGINT) AS n_pred
        |  FROM cm GROUP BY 1),
        |j AS (
        |  SELECT cls.cls, COALESCE(tp.tp, 0) AS tp,
        |    COALESCE(pt.n_pred, 0) - COALESCE(tp.tp, 0) AS fp,
        |    COALESCE(tt.n_truth, 0) - COALESCE(tp.tp, 0) AS fn
        |  FROM cls LEFT JOIN tp ON cls.cls = tp.cls
        |  LEFT JOIN tt ON cls.cls = tt.cls
        |  LEFT JOIN pt ON cls.cls = pt.cls)
        |SELECT cls, tp, fp, fn,
        |  CASE WHEN tp + fp = 0 THEN 0
        |    ELSE tp * 1000000 // (tp + fp) END AS precision_ppm,
        |  CASE WHEN tp + fn = 0 THEN 0
        |    ELSE tp * 1000000 // (tp + fn) END AS recall_ppm,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |    ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_ppm
        |FROM j""".stripMargin,
    // same confusion seam, same cleared kappa ratio, Spark's
    // toward-zero div mirrored with the q229 sign-split
    "q268_langid_kappa" ->
      """WITH pred AS (
        |  SELECT doc_id,
        |    CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
        |         WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
        |         WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
        |         WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS pred_lang
        |  FROM (
        |    SELECT doc_id,
        |      len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS h_en,
        |      len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS h_de,
        |      len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS h_fr,
        |      len(regexp_extract_all(lower(text), '\b(el|los|las|que|una)\b')) AS h_es,
        |      len(regexp_extract_all(text, '[一-鿿]')) AS h_zh
        |    FROM documents)),
        |cm AS (
        |  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
        |  GROUP BY 1, 2),
        |nn AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs FROM cm),
        |dg AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_agree
        |  FROM cm WHERE lang = pred_lang),
        |pe AS (
        |  SELECT CAST(COALESCE(sum(rt * ct), 0) AS BIGINT) AS pe_num FROM
        |    (SELECT lang, CAST(sum(n) AS BIGINT) AS rt FROM cm GROUP BY 1) r
        |  JOIN (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS ct
        |    FROM cm GROUP BY 1) c ON r.lang = c.lang)
        |SELECT n_docs, n_agree, pe_num,
        |  CAST(CASE WHEN n_docs * n_docs = pe_num THEN 1000000
        |    WHEN n_docs * n_agree - pe_num < 0
        |    THEN -((pe_num - n_docs * n_agree) * 1000000
        |      // (n_docs * n_docs - pe_num))
        |    ELSE (n_docs * n_agree - pe_num) * 1000000
        |      // (n_docs * n_docs - pe_num) END AS BIGINT) AS kappa_ppm
        |FROM nn CROSS JOIN dg CROSS JOIN pe""".stripMargin,
    // same weekday populations, same integer cross-multiplied 2-sigma
    // flag, singletons never flag
    "q250_seasonal_anomalies" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, day_num % 7 AS weekday FROM daily),
        |m AS (
        |  SELECT event_type, weekday, CAST(count(*) AS BIGINT) AS n_w,
        |    CAST(sum(cnt) AS BIGINT) AS s_w,
        |    sum(CAST(cnt AS HUGEINT) * cnt) AS ss_w
        |  FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.day_num, d.weekday, d.cnt, m.n_w,
        |  CAST(CASE WHEN m.n_w > 1
        |    AND (CAST(d.cnt AS HUGEINT) * m.n_w - m.s_w)
        |        * (CAST(d.cnt AS HUGEINT) * m.n_w - m.s_w)
        |        > 4 * (CAST(m.n_w AS HUGEINT) * m.ss_w
        |            - CAST(m.s_w AS HUGEINT) * m.s_w)
        |    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM d JOIN m ON d.event_type = m.event_type AND d.weekday = m.weekday""".stripMargin,
    // same sentence/word/vowel-group regex counts, same two milli floors
    "q249_readability" ->
      """SELECT doc_id,
        |  CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |    AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
        |    AS n_words,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables,
        |  CAST(CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |    THEN 206835
        |      - (1015 * len(regexp_extract_all(lower(text), '[a-z]+')))
        |        // GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      - (84600 * len(regexp_extract_all(lower(text), '[aeiouy]+')))
        |        // len(regexp_extract_all(lower(text), '[a-z]+'))
        |    END AS BIGINT) AS fre_milli
        |FROM documents""".stripMargin,
    // q218's prediction chain verbatim, then the rec-pair self-join,
    // pair-table cos^2 lookup, and the 1-row diversity report
    "q239_intra_list_diversity" ->
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
    // same one-JVM plane literals, same micro-grid integer dots, same
    // window bucket sizes
    "q227_srp_signatures" -> {
      val bitExprs = graft.operators.SrpPlanes.signs(64).zipWithIndex
        .map { case (signs, p) =>
          val lst = signs.mkString("[", ", ", "]")
          s"CASE WHEN list_sum(list_transform(range(0, 64), d -> " +
            s"CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 1000000) AS BIGINT)" +
            s" * ($lst)[d+1])) >= 0 THEN ${1L << p} ELSE 0 END"
        }.mkString("\n        + ")
      s"""WITH s AS (
         |  SELECT vec_id, CAST($bitExprs AS BIGINT) AS sig FROM embeddings)
         |SELECT vec_id, sig,
         |  CAST(count(*) OVER (PARTITION BY sig) AS BIGINT) AS n_same_sig
         |FROM s""".stripMargin
    },
    // same brute truth, same q41 cell join per probe width, same ppm floor
    "q225_ann_tuning" ->
      s"""WITH brute AS ($bruteTopkOracle),
         |nq AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries FROM brute),
         |i1 AS (${ivfTopkOracleN(1)}),
         |i2 AS (${ivfTopkOracleN(2)}),
         |i4 AS (${ivfTopkOracleN(4)}),
         |h AS (
         |  SELECT CAST(1 AS BIGINT) AS nprobe, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM i1 WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i1.q_id AND b.vec_id = i1.vec_id)
         |  UNION ALL
         |  SELECT 2, CAST(count(*) AS BIGINT) FROM i2
         |  WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i2.q_id AND b.vec_id = i2.vec_id)
         |  UNION ALL
         |  SELECT 4, CAST(count(*) AS BIGINT) FROM i4
         |  WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i4.q_id AND b.vec_id = i4.vec_id))
         |SELECT nprobe, n_queries, n_hits,
         |  n_hits * 1000000 // (n_queries * 5) AS recall_ppm
         |FROM h CROSS JOIN nq""".stripMargin,
    "q42_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels
        |FROM documents""".stripMargin,
    // documents.text is pure ASCII in this dataset (asserted in
    // MultimodalSpec), so VARCHAR slices in DuckDB see the same bytes the
    // Spark side's binary payload slices do.
    "q43_multimodal_features" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform(range(0, 8), i ->
         |    printf('%.3f', CAST((${md5Prefix32Sql("substring(text, CAST(i*16+1 AS INTEGER), 16)")} % 1000)
         |                        / 1000.0 AS REAL))), ',') AS features
         |FROM documents""".stripMargin,
    // synth∘decode is the identity on the sample stream, so the oracle
    // recomputes every parsed field from the synthesis formula: n = 32 +
    // doc_id % 33 samples of (doc_id·31 + i·7) mod 256 at 8 kHz mono 8-bit.
    // The byte-level header/PCM parse itself is pinned by MultimodalSpec's
    // hand-built fixture.
    "q84_wav_decode" ->
      """WITH n AS (
        |  SELECT doc_id, 32 + doc_id % 33 AS ns FROM documents),
        |s AS (
        |  SELECT doc_id, ns,
        |    list_transform(range(0, ns), i -> (doc_id * 31 + i * 7) % 256) AS smp
        |  FROM n)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_header,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(8 AS BIGINT) AS bits_per_sample,
        |  CAST(ns AS BIGINT) AS n_samples,
        |  CAST(list_max(smp) AS BIGINT) AS peak,
        |  CAST(list_sum(smp) AS BIGINT) AS amp_sum,
        |  CAST(list_sum(smp) AS DOUBLE) / ns AS mean_amp
        |FROM s""".stripMargin,
    // same synth∘decode-identity pattern as q84: the oracle recomputes the
    // parsed fields from the synthesis formula (w = 4 + doc_id%5,
    // h = 3 + doc_id%4, pixel k = (doc_id·17 + k·11) mod 256); the byte-
    // level P6 parse is pinned by MultimodalSpec's hand-built fixtures
    "q87_ppm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, w * h * 3), k -> (doc_id * 17 + k * 11) % 256) AS b
        |  FROM d)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_magic,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, w * h), i -> b[i * 3 + 1])) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w * h), i -> b[i * 3 + 2])) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w * h), i -> b[i * 3 + 3])) AS BIGINT) AS b_sum,
        |  CAST(list_sum(b) AS DOUBLE) / (w * h * 3) AS mean_luma
        |FROM px""".stripMargin,
    // same 16-sample frames, crossings and energy re-derived from the
    // q84 synthesis formula (the byte parse is spec-pinned)
    "q223_wav_zcr" ->
      """WITH d AS (SELECT doc_id, 32 + doc_id % 33 AS n FROM documents),
        |f AS (
        |  SELECT doc_id, n, t.i AS frame_idx, t.i * 16 AS st,
        |    least(16, n - t.i * 16) AS flen
        |  FROM d, range(4) t(i) WHERE t.i * 16 < n)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(flen AS BIGINT) AS n_in_frame,
        |  CAST(coalesce(list_sum(list_transform(range(0, flen - 1), k ->
        |    CASE WHEN ((doc_id*31 + (st+k)*7) % 256 >= 128)
        |      <> ((doc_id*31 + (st+k+1)*7) % 256 >= 128)
        |    THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings,
        |  CAST(list_sum(list_transform(range(0, flen), k ->
        |    abs((doc_id*31 + (st+k)*7) % 256 - 128))) AS BIGINT) AS energy
        |FROM f""".stripMargin,
    // same 4x4 nearest-neighbor grid and gradient bits, pixels re-derived
    // from the q87 synthesis formula (the byte parse is spec-pinned)
    "q210_image_dhash" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |g AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, 16), t ->
        |      (doc_id*17 + (3*((t//4)*h//4*w + (t%4)*w//4))*11) % 256
        |      + (doc_id*17 + (3*((t//4)*h//4*w + (t%4)*w//4) + 1)*11) % 256
        |      + (doc_id*17 + (3*((t//4)*h//4*w + (t%4)*w//4) + 2)*11) % 256) AS gl
        |  FROM d)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(list_sum(list_transform(range(0, 12), x ->
        |    CASE WHEN gl[(x//3)*4 + (x%3) + 2] > gl[(x//3)*4 + (x%3) + 1]
        |    THEN 1 << CAST(x AS INT) ELSE 0 END)) AS BIGINT) AS dhash_h,
        |  CAST(list_sum(list_transform(range(0, 12), x ->
        |    CASE WHEN gl[(x//4+1)*4 + (x%4) + 1] > gl[(x//4)*4 + (x%4) + 1]
        |    THEN 1 << CAST(x AS INT) ELSE 0 END)) AS BIGINT) AS dhash_v
        |FROM g""".stripMargin,
    // recomputes every statistic from the synthesis formula (w/h from
    // doc_id, per-channel mods); top_row_sum is image row y = 0
    "q155_bmp_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h FROM documents)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_magic,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(24 AS BIGINT) AS bpp,
        |  CAST(((3 * w + 3) // 4) * 4 AS BIGINT) AS row_size,
        |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
        |    list_transform(range(0, w), x -> (doc_id * 7 + x * 3 + y * 5) % 256))))
        |    AS BIGINT) AS b_sum,
        |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
        |    list_transform(range(0, w), x -> (doc_id * 11 + x * 5 + y * 3) % 256))))
        |    AS BIGINT) AS g_sum,
        |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
        |    list_transform(range(0, w), x -> (doc_id * 13 + x * 7 + y * 11) % 256))))
        |    AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w), x ->
        |    (doc_id * 7 + x * 3) % 256 + (doc_id * 11 + x * 5) % 256
        |      + (doc_id * 13 + x * 7) % 256)) AS BIGINT) AS top_row_sum
        |FROM d""".stripMargin,
    // histogram of the q84 synthesis formula's sample stream: n = 32 +
    // doc_id%33 samples of (doc_id·31 + i·7) mod 256, bucketed by 32s
    "q92_wav_features" ->
      """WITH n AS (
        |  SELECT doc_id, 32 + doc_id % 33 AS ns FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(range(0, ns), i -> (doc_id * 31 + i * 7) % 256) AS smp
        |  FROM n),
        |bs AS (SELECT unnest(range(0, 8)) AS bin)
        |SELECT doc_id,
        |  CAST(bin AS INTEGER) AS bin,
        |  CAST(bin * 32 AS INTEGER) AS bin_lo,
        |  CAST(len(list_filter(smp, v -> v >= bin * 32 AND v < (bin + 1) * 32)) AS BIGINT)
        |    AS n_in_bin
        |FROM s CROSS JOIN bs""".stripMargin,
    // recomputes the q135 synthesis formula: w = 3 + doc_id%4,
    // h = 2 + doc_id%3, pixel k = (doc_id*13 + k*7) mod 256
    "q135_pgm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, w * h), k -> (doc_id * 13 + k * 7) % 256) AS b
        |  FROM d)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_magic,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_min(b) AS BIGINT) AS px_min,
        |  CAST(list_max(b) AS BIGINT) AS px_max,
        |  CAST(list_sum(b) AS BIGINT) AS px_sum,
        |  CAST(list_sum(b) AS DOUBLE) / (w * h) AS mean_gray
        |FROM px""".stripMargin,
    // pixel values re-derived from the generative formula (Spark parses
    // the real bytes); same cumulative scan, same HUGEINT variance ratio
    "q168_otsu" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS iw, 2 + doc_id % 3 AS ih FROM documents),
        |pxl AS (
        |  SELECT unnest(list_transform(range(0, iw * ih),
        |    k -> (doc_id * 13 + k * 7) % 256)) AS v
        |  FROM d),
        |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM pxl GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(sum(v * cnt) AS BIGINT) AS s
        |  FROM hist),
        |c AS (
        |  SELECT v,
        |    CAST(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS w0,
        |    CAST(sum(v * cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s0
        |  FROM hist),
        |f AS (
        |  SELECT v, w0, n,
        |    CAST(CAST(s0 AS HUGEINT) * n - CAST(w0 AS HUGEINT) * s AS HUGEINT) AS numr,
        |    CAST(w0 AS HUGEINT) * (n - w0) AS den
        |  FROM c CROSS JOIN tot WHERE w0 > 0 AND w0 < n)
        |SELECT v AS threshold, w0, n - w0 AS w1, n AS n_pixels,
        |  CAST(numr * numr AS DOUBLE) / CAST(den AS DOUBLE) AS between_var_scaled
        |FROM f
        |QUALIFY row_number() OVER (
        |  ORDER BY CAST(numr * numr AS DOUBLE) / CAST(den AS DOUBLE) DESC, v) = 1""".stripMargin,
    // recomputes the frame-sequence formula (inverted frame 2 on every
    // 5th doc) and the same integer |Δ| fold per consecutive pair
    "q141_scene_cuts" ->
      """WITH d AS (
        |  SELECT doc_id, (3 + doc_id % 4) * (2 + doc_id % 3) AS n_pixels,
        |    3 + doc_id % 3 AS nf
        |  FROM documents),
        |pairs AS (SELECT doc_id, n_pixels, unnest(range(1, nf)) AS f FROM d),
        |diffs AS (
        |  SELECT doc_id, f, n_pixels,
        |    list_sum(list_transform(range(0, n_pixels), k -> abs(
        |      (CASE WHEN f = 2 AND doc_id % 5 = 0
        |            THEN 255 - ((doc_id*13 + f*29 + k*7) % 256)
        |            ELSE (doc_id*13 + f*29 + k*7) % 256 END)
        |      - (CASE WHEN f - 1 = 2 AND doc_id % 5 = 0
        |            THEN 255 - ((doc_id*13 + (f-1)*29 + k*7) % 256)
        |            ELSE (doc_id*13 + (f-1)*29 + k*7) % 256 END)))) AS s
        |  FROM pairs)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
        |  CAST(s AS BIGINT) AS sum_absdiff,
        |  CAST(n_pixels AS BIGINT) AS n_pixels,
        |  CAST(s AS DOUBLE) / n_pixels AS mean_absdiff,
        |  s * 4 > n_pixels * 510 AS is_cut
        |FROM diffs""".stripMargin,
    // the props map is (kind, bytes, parity) derived from media_kind and
    // the payload byte length; the oracle recomputes the lookups directly
    "q136_media_props" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS bytes
        |  FROM documents)
        |SELECT kind,
        |  CASE WHEN bytes % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  CAST(3 AS BIGINT) AS n_keys
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q44_multimodal_frames" ->
      s"""WITH ks AS (SELECT unnest(range(0, 4)) AS b),
         |frames AS (
         |  SELECT doc_id, b, substring(text, CAST(b*32+1 AS INTEGER), 32) AS frame
         |  FROM documents CROSS JOIN ks)
         |SELECT doc_id,
         |  CAST(b AS INTEGER) AS frame_no,
         |  CAST(length(frame) AS INTEGER) AS frame_bytes,
         |  ${md5Prefix32Sql("frame")} AS frame_fp
         |FROM frames""".stripMargin,
    // CMS twin: rebuild every (row j, bucket) counter with the same
    // permutation algebra as CountMinSketchAgg (h reduced mod p before the
    // multiply — products < 2^62), then probe the exact top-20 heads
    "q93_cms_heavyhitters" ->
      s"""WITH hashed AS (
         |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |perm AS (SELECT unnest(range(0, 4)) AS j),
         |buckets AS (
         |  SELECT j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
         |    count(*) AS c
         |  FROM hashed CROSS JOIN perm GROUP BY 1, 2),
         |heads AS (
         |  SELECT user_id, h, count(*) AS exact_cnt FROM hashed GROUP BY 1, 2
         |  ORDER BY exact_cnt DESC, user_id LIMIT 20),
         |probe AS (
         |  SELECT user_id, exact_cnt, j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b
         |  FROM heads CROSS JOIN perm)
         |SELECT p.user_id, p.exact_cnt, CAST(min(bk.c) AS BIGINT) AS cms_est
         |FROM probe p JOIN buckets bk ON bk.j = p.j AND bk.b = p.b
         |GROUP BY 1, 2""".stripMargin,
    // char-class profile: same regex classes, same integer-product Simpson
    // index (single division -> bit-identical doubles)
    "q94_charclass_profile" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INTEGER) AS n_letters,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS n_digits,
        |    CAST(length(text) - length(regexp_replace(text, '\s', '', 'g')) AS INTEGER) AS n_spaces,
        |    CAST(length(text) AS INTEGER) AS n
        |  FROM documents WHERE length(text) > 0),
        |cls AS (
        |  SELECT doc_id, n_letters, n_digits, n_spaces,
        |    n - n_letters - n_digits - n_spaces AS n_other
        |  FROM base)
        |SELECT doc_id, n_letters, n_digits, n_spaces, n_other,
        |  1.0 - CAST(n_letters * n_letters + n_digits * n_digits
        |      + n_spaces * n_spaces + n_other * n_other AS DOUBLE)
        |    / CAST((n_letters + n_digits + n_spaces + n_other)
        |      * (n_letters + n_digits + n_spaces + n_other) AS DOUBLE) AS class_diversity
        |FROM cls""".stripMargin,
    // lead() over the same (ts, event_id) total order; P(to|from) is one
    // division of exact integer counts
    "q100_transition_matrix" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
        |seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM ev),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
        |  FROM pairs GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n_transitions,
        |  CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM pairs p JOIN tot t USING (from_type)""".stripMargin,
    // HLL twin: same md5-prefix32 hash, register split, and scaled-integer
    // harmonic sum; bin()/conv(_,10,2) agree on minimal binary strings, and
    // the single float op is the final division by the folded constant
    "q102_hll_cardinality" ->
      s"""WITH sh AS (
        |  SELECT source, unnest(list_transform(range(0, GREATEST(length(text) - 7, 0)),
        |    i -> substring(text, CAST(i + 1 AS INTEGER), 8))) AS g
        |  FROM documents),
        |hashed AS (
        |  SELECT source, g, ${md5Prefix32Sql("g")} AS h FROM sh),
        |regs AS (
        |  SELECT source, h % 256 AS reg,
        |    max(CASE WHEN (h // 256) = 0 THEN 25
        |             ELSE 25 - length(bin(h // 256)) END) AS rho
        |  FROM hashed GROUP BY 1, 2),
        |sk AS (
        |  SELECT source,
        |    CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_scaled,
        |    CAST(count(*) AS BIGINT) AS occupied
        |  FROM regs GROUP BY 1),
        |ex AS (
        |  SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS n_exact
        |  FROM hashed GROUP BY 1)
        |SELECT ex.source, ex.n_exact, sk.occupied, sk.s_scaled,
        |  5.175699493294551e16 / CAST(sk.s_scaled AS DOUBLE) AS est
        |FROM ex JOIN sk USING (source)""".stripMargin,
    // same gram hash and register algebra as q102, computed twice: once
    // through per-source shard registers then merged by max, once directly
    // over the union — the graded row carries both plus the equality proof
    "q147_hll_merge" ->
      s"""WITH sh AS (
        |  SELECT source, unnest(list_transform(range(0, GREATEST(length(text) - 7, 0)),
        |    i -> substring(text, CAST(i + 1 AS INTEGER), 8))) AS g
        |  FROM documents),
        |hashed AS (
        |  SELECT source, g, ${md5Prefix32Sql("g")} AS h FROM sh),
        |rho AS (
        |  SELECT source, h % 256 AS reg,
        |    CASE WHEN (h // 256) = 0 THEN 25
        |         ELSE 25 - length(bin(h // 256)) END AS rho
        |  FROM hashed),
        |shard AS (
        |  SELECT source, reg, max(rho) AS rho FROM rho GROUP BY 1, 2),
        |merged AS (
        |  SELECT reg, max(rho) AS rho FROM shard GROUP BY 1),
        |msk AS (
        |  SELECT CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_merged,
        |    CAST(count(*) AS BIGINT) AS occ_merged
        |  FROM merged),
        |direct AS (
        |  SELECT reg, max(rho) AS rho FROM rho GROUP BY 1),
        |dsk AS (
        |  SELECT CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_direct,
        |    CAST(count(*) AS BIGINT) AS occ_direct
        |  FROM direct),
        |ex AS (
        |  SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_exact,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_shards
        |  FROM hashed)
        |SELECT n_shards, n_exact, occ_merged, s_merged, occ_direct, s_direct,
        |  s_merged = s_direct AND occ_merged = occ_direct AS merge_eq_direct,
        |  5.175699493294551e16 / CAST(s_merged AS DOUBLE) AS est
        |FROM ex CROSS JOIN msk CROSS JOIN dsk""".stripMargin,
    // same register algebra pairwise: scaled harmonic sums as exact
    // BIGINTs, the estimate evaluated in the same (a + b) - union order
    "q157_hll_intersection" ->
      s"""WITH sh AS (
        |  SELECT source, unnest(list_transform(range(0, GREATEST(length(text) - 7, 0)),
        |    i -> substring(text, CAST(i + 1 AS INTEGER), 8))) AS g
        |  FROM documents),
        |hashed AS (
        |  SELECT source, g, ${md5Prefix32Sql("g")} AS h FROM sh),
        |regs AS (
        |  SELECT source, h % 256 AS reg,
        |    max(CASE WHEN (h // 256) = 0 THEN 25
        |             ELSE 25 - length(bin(h // 256)) END) AS rho
        |  FROM hashed GROUP BY 1, 2),
        |single AS (
        |  SELECT source,
        |    CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s
        |  FROM regs GROUP BY 1),
        |pr AS (
        |  SELECT x.source AS sa, y.source AS sb
        |  FROM (SELECT DISTINCT source FROM regs) x
        |  JOIN (SELECT DISTINCT source FROM regs) y ON x.source < y.source),
        |un AS (
        |  SELECT pr.sa, pr.sb, r.reg, max(r.rho) AS rho
        |  FROM pr JOIN regs r ON r.source = pr.sa OR r.source = pr.sb
        |  GROUP BY 1, 2, 3),
        |usk AS (
        |  SELECT sa, sb,
        |    CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_union
        |  FROM un GROUP BY 1, 2),
        |dg AS (SELECT DISTINCT source, g FROM hashed),
        |ex AS (
        |  SELECT a.source AS sa, b.source AS sb,
        |    CAST(count(*) AS BIGINT) AS n_inter_exact
        |  FROM dg a JOIN dg b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT u.sa, u.sb,
        |  COALESCE(ex.n_inter_exact, 0) AS n_inter_exact,
        |  a.s AS s_a, b.s AS s_b, u.s_union,
        |  (5.175699493294551e16 / CAST(a.s AS DOUBLE)
        |     + 5.175699493294551e16 / CAST(b.s AS DOUBLE))
        |    - 5.175699493294551e16 / CAST(u.s_union AS DOUBLE) AS est_inter
        |FROM usk u
        |JOIN single a ON a.source = u.sa
        |JOIN single b ON b.source = u.sb
        |LEFT JOIN ex ON ex.sa = u.sa AND ex.sb = u.sb""".stripMargin,
    // change rows = where lag() differs, then version/lead over the same
    // per-user order; micros epochs so both engines emit exact BIGINTs
    "q146_scd_intervals" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, ts, event_id, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type AS attr_value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
        |  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS valid_to_us,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
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
    // the declarative skyline: a distinct point survives iff its y beats
    // the running max-y in (x DESC, y DESC) order — the Spark side's grid
    // prune is a lossless physical rewrite, so the results agree exactly
    "q159_skyline" ->
      """WITH pts AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS y,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT x, y, n_rows,
        |    max(y) OVER (ORDER BY x DESC, y DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS my
        |  FROM pts)
        |SELECT x AS price_cents, y AS day_num, n_rows
        |FROM w WHERE my IS NULL OR y > my""".stripMargin,
    // the same three path-count rounds in HUGEINT, the same (a2, id)
    // top-20 tiebreak; `good` is already the distinct bipartite edge
    // list. Outputs cast to BIGINT: HUGEINT/DECIMAL output columns hash
    // differently across DuckDB fetch paths
    "q160_hits" ->
      s"""WITH $ratingsCte,
        |$goodCte,
        |a1 AS (
        |  SELECT productId AS p, CAST(count(*) AS HUGEINT) AS a1
        |  FROM good GROUP BY 1),
        |h1 AS (
        |  SELECT g.userId AS u, sum(a1.a1) AS h1
        |  FROM good g JOIN a1 ON a1.p = g.productId GROUP BY 1),
        |a2 AS (
        |  SELECT g.productId AS p, sum(h1.h1) AS a2
        |  FROM good g JOIN h1 ON h1.u = g.userId GROUP BY 1)
        |SELECT a2.p AS productId,
        |  CAST(a1.a1 AS BIGINT) AS a1,
        |  CAST(a2.a2 AS BIGINT) AS a2
        |FROM a2 JOIN a1 ON a1.p = a2.p
        |ORDER BY a2.a2 DESC, a2.p LIMIT 20""".stripMargin,
    // the identical 30-entry threshold table (one JVM computed it for
    // both engines) folded with the same u >= t compare
    "q161_dp_release" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS true_cnt
        |  FROM events GROUP BY 1, 2),
        |n AS (
        |  SELECT *,
        |    CAST(len(list_filter([${operators.DpNoise.thresholds.mkString(", ")}],
        |      t -> ${md5Prefix32Sql("'dp:' || event_type || ':' || CAST(day_num AS VARCHAR)")} >= t)) - 15
        |      AS BIGINT) AS noise
        |  FROM daily)
        |SELECT event_type, day_num, true_cnt, noise,
        |  true_cnt + noise AS released FROM n""".stripMargin,
    // same segment aggregate, same (size DESC, source, bucket) pack
    // order, exact integer cumulative-sum bin assignment and fill
    "q162_compaction_plan" ->
      """WITH segs AS (
        |  SELECT source, doc_id % 64 AS bucket,
        |    CAST(sum(n_chars) AS BIGINT) AS seg_bytes
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(seg_bytes) AS BIGINT) AS total FROM segs),
        |packed AS (
        |  SELECT seg_bytes, (total + 7) // 8 AS target,
        |    CAST(sum(seg_bytes) OVER (ORDER BY seg_bytes DESC, source, bucket)
        |      AS BIGINT) AS cum
        |  FROM segs CROSS JOIN tot)
        |SELECT CAST((cum - 1) // target AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(seg_bytes) AS BIGINT) AS bin_bytes, target,
        |  CAST(sum(seg_bytes) AS BIGINT) * 1000000 // target AS fill_ppm
        |FROM packed GROUP BY 1, 4""".stripMargin,
    // identical ppb expectation literals, identical floor-div shares
    "q163_benford" ->
      s"""WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |    1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM c)
        |SELECT digit, obs, n_total,
        |  CAST(([${operators.BenfordExpected.ppb.mkString(", ")}])[digit] AS BIGINT)
        |    AS exp_ppb,
        |  obs * 1000000000 // n_total AS obs_ppb,
        |  obs * 1000000000 // n_total
        |    - CAST(([${operators.BenfordExpected.ppb.mkString(", ")}])[digit] AS BIGINT)
        |    AS dev_ppb
        |FROM c CROSS JOIN tot""".stripMargin,
    // same last-day deaths, same ordered at-risk scan, same nano floors
    "q164_churn_hazard" ->
      """WITH d AS (
        |  SELECT user_id,
        |    max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS dday
        |  FROM events GROUP BY 1),
        |dd AS (SELECT dday, CAST(count(*) AS BIGINT) AS deaths FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(deaths) AS BIGINT) AS n_users FROM dd),
        |scan AS (
        |  SELECT dday, deaths,
        |    CAST(n_users - COALESCE(sum(deaths) OVER (ORDER BY dday
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS n_at_risk
        |  FROM dd CROSS JOIN tot),
        |h AS (
        |  SELECT dday, deaths, n_at_risk,
        |    CAST(deaths * 1000000000 // n_at_risk AS BIGINT) AS h_term_nano
        |  FROM scan)
        |SELECT dday AS day_num, deaths, n_at_risk, h_term_nano,
        |  CAST(sum(h_term_nano) OVER (ORDER BY dday
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS h_cum_nano
        |FROM h""".stripMargin,
    // same lead pairs, same (n DESC, type) argmax, same ppm floor
    "q165_markov_eval" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |pairs AS (SELECT from_type, to_type FROM p WHERE to_type IS NOT NULL),
        |model AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs GROUP BY 1, 2),
        |pred AS (
        |  SELECT from_type, to_type AS predicted FROM (
        |    SELECT *, row_number() OVER (PARTITION BY from_type
        |      ORDER BY n DESC, to_type) AS rn FROM model)
        |  WHERE rn = 1)
        |SELECT p.from_type, pred.predicted,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(sum(CASE WHEN p.to_type = pred.predicted THEN 1 END), 0)
        |    AS BIGINT) AS hits,
        |  CAST(COALESCE(sum(CASE WHEN p.to_type = pred.predicted THEN 1 END), 0)
        |    AS BIGINT) * 1000000 // count(*) AS acc_ppm
        |FROM pairs p JOIN pred ON pred.from_type = p.from_type
        |GROUP BY 1, 2""".stripMargin,
    // same x n_days centering (residuals sum to zero exactly), same
    // running-extrema cusum identities, same one-average-day threshold
    "q166_cusum" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(cnt) AS BIGINT) AS total
        |  FROM daily GROUP BY 1),
        |s AS (
        |  SELECT d.event_type, d.day_num, d.cnt, st.total,
        |    sum(d.cnt * st.n_days - st.total) OVER
        |      (PARTITION BY d.event_type ORDER BY d.day_num
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM daily d JOIN st USING (event_type)),
        |x AS (
        |  SELECT event_type, day_num, cnt, total, s,
        |    CAST(s - min(s) OVER (PARTITION BY event_type ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cusum_pos,
        |    CAST(max(s) OVER (PARTITION BY event_type ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - s AS BIGINT)
        |      AS cusum_neg
        |  FROM s)
        |SELECT event_type, day_num, cnt, cusum_pos, cusum_neg,
        |  cusum_pos > total AS flag_up, cusum_neg > total AS flag_down
        |FROM x""".stripMargin,
    // same tokenizer, same overlapping pair positions, same greedy
    // replace-shrinkage count (replace is left-to-right in both engines)
    "q167_bpe_merge" ->
      """WITH wt AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |w2 AS (SELECT w FROM wt WHERE length(w) >= 2),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
        |  FROM w2),
        |top AS (
        |  SELECT pair, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM p GROUP BY 1 ORDER BY n_pair DESC, pair LIMIT 10)
        |SELECT t.pair, t.n_pair,
        |  CAST(sum(length(w2.w) - length(replace(w2.w, t.pair, chr(1))))
        |    AS BIGINT) AS n_applied
        |FROM w2 CROSS JOIN top t
        |GROUP BY 1, 2""".stripMargin,
    // same tokenizer; bigrams from list adjacency (positionally equal to
    // the Spark side's postings self-join), same (count, phrase) top-3
    "q169_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i + 1 AS INTEGER)])) AS phrase
        |  FROM toks)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM bg GROUP BY 1
        |ORDER BY n_occurrences DESC, phrase LIMIT 3""".stripMargin,
    // same micro quantization, same HUGEINT (m*n - s)^2 numerators, the
    // same per-label (num DESC, vec_id) ranking and final division
    "q170_embedding_outliers" ->
      """WITH ex AS (
        |  SELECT label, vec_id,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS m
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, dim, CAST(sum(m) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2),
        |dist AS (
        |  SELECT ex.label, ex.vec_id, cent.n,
        |    sum((CAST(ex.m AS HUGEINT) * cent.n - cent.s)
        |      * (CAST(ex.m AS HUGEINT) * cent.n - cent.s)) AS dist_num
        |  FROM ex JOIN cent ON cent.label = ex.label AND cent.dim = ex.dim
        |  GROUP BY 1, 2, 3)
        |SELECT label, vec_id, n AS n_members,
        |  CAST(dist_num // (CAST(n AS HUGEINT) * n * 1000) AS BIGINT) AS dist_nano
        |FROM (SELECT *, row_number() OVER (PARTITION BY label
        |    ORDER BY dist_num DESC, vec_id) AS rn FROM dist)
        |WHERE rn <= 5""".stripMargin,
    // same HUGEINT dev = obs*N - r*c, same 9rcN flag, same one-division
    // contribution; margins from the same cell table
    "q171_independence" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7 AS weekday,
        |    CAST(count(*) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2),
        |rw AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cl AS (SELECT weekday, CAST(sum(obs) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
        |g AS (
        |  SELECT cells.event_type, cells.weekday, cells.obs, rw.r, cl.c, tt.n,
        |    CAST(cells.obs AS HUGEINT) * tt.n
        |      - CAST(rw.r AS HUGEINT) * cl.c AS dev
        |  FROM cells JOIN rw USING (event_type) JOIN cl USING (weekday)
        |  CROSS JOIN tt)
        |SELECT event_type, weekday, obs, r, c, n,
        |  CAST(dev * dev * 1000000000
        |    // (CAST(r AS HUGEINT) * c * n) AS BIGINT) AS contrib_nano,
        |  CAST(CASE WHEN dev * dev > 9 * CAST(r AS HUGEINT) * c * n
        |    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM g""".stripMargin,
    // same (source, value) grid, same scaled CDF-difference integers,
    // same max/sum-by-gap aggregates and single divisions
    "q172_ks_drift" ->
      """WITH vc AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM vc GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM srcs),
        |gv AS (SELECT v, CAST(sum(c) AS BIGINT) AS g FROM vc GROUP BY 1),
        |grid AS (
        |  SELECT s.source, s.n_s, va.v, COALESCE(vc.c, 0) AS c
        |  FROM srcs s CROSS JOIN vals va
        |  LEFT JOIN vc ON vc.source = s.source AND vc.v = va.v),
        |cum AS (
        |  SELECT grid.source, grid.n_s, grid.v, gv.g, tot.n,
        |    CAST(sum(grid.c) OVER (PARTITION BY grid.source ORDER BY grid.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
        |    CAST(sum(gv.g) OVER (PARTITION BY grid.source ORDER BY grid.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cg,
        |    COALESCE(lead(grid.v) OVER (PARTITION BY grid.source ORDER BY grid.v)
        |      - grid.v, 0) AS gap
        |  FROM grid JOIN gv ON gv.v = grid.v CROSS JOIN tot),
        |d AS (
        |  SELECT source, n_s, n,
        |    abs(CAST(cs AS HUGEINT) * (n - n_s)
        |      - CAST(cg - cs AS HUGEINT) * n_s) AS diff, gap
        |  FROM cum)
        |SELECT source, n_s, n - n_s AS n_rest,
        |  CAST(max(diff) * 1000000
        |    // (CAST(n_s AS HUGEINT) * (n - n_s)) AS BIGINT) AS d_ppm,
        |  CAST(sum(diff * gap) * 1000000
        |    // (CAST(n_s AS HUGEINT) * (n - n_s)) AS BIGINT) AS w1_micro
        |FROM d GROUP BY 1, 2, n""".stripMargin,
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
    // same tokenizer, same count-of-counts fold, same guarded one-
    // expression Chao1 and floored Good-Turing ppm
    "q176_vocab_richness" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents),
        |tc AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |cc AS (
        |  SELECT source, c, CAST(count(*) AS BIGINT) AS f
        |  FROM tc GROUP BY 1, 2),
        |m AS (
        |  SELECT source,
        |    CAST(sum(c * f) AS BIGINT) AS n_tokens,
        |    CAST(sum(f) AS BIGINT) AS d_types,
        |    CAST(COALESCE(sum(CASE WHEN c = 1 THEN f END), 0) AS BIGINT) AS f1,
        |    CAST(COALESCE(sum(CASE WHEN c = 2 THEN f END), 0) AS BIGINT) AS f2
        |  FROM cc GROUP BY 1)
        |SELECT source, n_tokens, d_types, f1, f2,
        |  f1 * 1000000 // n_tokens AS gt_unseen_ppm,
        |  CASE WHEN f2 > 0
        |    THEN CAST(d_types AS DOUBLE)
        |      + CAST(f1 * f1 AS DOUBLE) / CAST(2 * f2 AS DOUBLE)
        |    ELSE CAST(d_types AS DOUBLE) END AS chao1
        |FROM m""".stripMargin,
    // same Poisson threshold literals, same md5 replica draws, same
    // floored replica means and ranked 2nd/31st interval picks
    "q177_bootstrap_ci" ->
      s"""WITH base AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |pt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(cents) * 1000000 // count(*) AS BIGINT) AS mean_micro
        |  FROM base GROUP BY 1),
        |hashed AS (
        |  SELECT event_type, cents,
        |    ${md5Prefix32Sql("'boot:' || CAST(event_id AS VARCHAR)")} AS h
        |  FROM base),
        |mixed AS (
        |  SELECT event_type, cents, rep,
        |    ((h + rep * 2654435761) % 4294967296) * 1640531527 % 4294967296 AS u1
        |  FROM hashed CROSS JOIN (SELECT unnest(range(0, 32)) AS rep)),
        |fan AS (
        |  SELECT event_type, cents, rep,
        |    len(list_filter([${operators.PoissonBoot.thresholds.mkString(", ")}],
        |      t -> xor(u1, u1 // 65536) >= t)) AS k
        |  FROM mixed),
        |rm AS (
        |  SELECT event_type, rep,
        |    CAST(sum(cents * k) * 1000000 // sum(k) AS BIGINT) AS rep_mean
        |  FROM fan GROUP BY 1, 2 HAVING sum(k) > 0),
        |rk AS (
        |  SELECT event_type, rep_mean,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY rep_mean, rep) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_reps
        |  FROM rm)
        |SELECT pt.event_type, pt.n_rows, pt.mean_micro,
        |  lo.rep_mean AS lo_micro, hi.rep_mean AS hi_micro,
        |  CAST(lo.n_reps AS BIGINT) AS n_reps
        |FROM pt
        |JOIN rk lo ON lo.event_type = pt.event_type AND lo.rn = 2
        |JOIN rk hi ON hi.event_type = pt.event_type AND hi.rn = hi.n_reps - 1""".stripMargin,
    // same distinct postings, same (df DESC, tok) top-20, same binary-
    // length varint formula and exact ppm ratio
    "q178_postings_compression" ->
      """WITH p AS (
        |  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
        |    doc_id
        |  FROM documents),
        |top AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM p GROUP BY 1 ORDER BY df DESC, tok LIMIT 20),
        |g AS (
        |  SELECT p.tok, top.df,
        |    COALESCE(p.doc_id - lag(p.doc_id) OVER
        |      (PARTITION BY p.tok ORDER BY p.doc_id), p.doc_id + 1) AS gap
        |  FROM p JOIN top USING (tok)),
        |v AS (
        |  SELECT tok, df,
        |    CAST((length(bin(gap)) + 6) // 7 AS BIGINT) AS vb
        |  FROM g)
        |SELECT tok, df, df * 8 AS raw_bytes,
        |  CAST(sum(vb) AS BIGINT) AS varint_bytes,
        |  CAST(sum(vb) AS BIGINT) * 1000000 // (df * 8) AS ratio_ppm
        |FROM v GROUP BY 1, 2""".stripMargin,
    // same cents scaling, same HUGEINT moments, same per-pair
    // multiply/sqrt/divide order
    "q179_corr_matrix" -> corrMatrixOracle,
    // same literal weight table, same age lookup and integer score,
    // same (score DESC, user) top-20
    "q180_decayed_leaderboard" ->
      s"""WITH daily AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |md AS (SELECT max(day) AS max_day FROM daily),
        |sc AS (
        |  SELECT user_id, cnt,
        |    CASE WHEN max_day - day <= 63
        |      THEN ([${operators.DecayWeights.ppm.mkString(", ")}])
        |        [CAST(max_day - day + 1 AS INTEGER)]
        |      ELSE 0 END AS w_ppm
        |  FROM daily CROSS JOIN md)
        |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(sum(cnt * w_ppm) AS BIGINT) AS decayed_ppm
        |FROM sc GROUP BY 1
        |ORDER BY decayed_ppm DESC, user_id LIMIT 20""".stripMargin,
    // NOT EXISTS over the same user-keyed time range; per-day totals
    // with the same floored ppm
    "q181_unconverted_views" ->
      """WITH v AS (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT day_num, CAST(count(*) AS BIGINT) AS n_unconverted
        |  FROM v WHERE NOT EXISTS (
        |    SELECT 1 FROM c WHERE c.user_id = v.user_id
        |      AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE)
        |  GROUP BY 1),
        |t AS (
        |  SELECT day_num, CAST(count(*) AS BIGINT) AS n_views
        |  FROM v GROUP BY 1)
        |SELECT t.day_num, t.n_views,
        |  COALESCE(u.n_unconverted, 0) AS n_unconverted,
        |  COALESCE(u.n_unconverted, 0) * 1000000 // t.n_views AS unconv_ppm
        |FROM t LEFT JOIN u USING (day_num)""".stripMargin,
    // same per-user lead gaps, same binary-length bucket, same edges
    "q182_latency_histogram" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS TIMESTAMP)) - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_us
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    CASE WHEN gap_us = 0 THEN 0
        |         ELSE CAST(length(bin(gap_us)) AS BIGINT) END AS bucket
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT event_type, bucket,
        |  CASE WHEN bucket = 0 THEN 0
        |       ELSE (1::BIGINT << CAST(bucket - 1 AS INTEGER)) END AS lo_us,
        |  CASE WHEN bucket = 0 THEN 0
        |       ELSE (1::BIGINT << CAST(bucket AS INTEGER)) - 1 END AS hi_us,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY 1, 2""".stripMargin,
    // same epoch-day filters, same same-nation correlation, the q10
    // decimal revenue sum
    "q183_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
        |    BETWEEN 9862 AND 10226
        |GROUP BY 1""".stripMargin,
    // same cutoffs, same exact-decimal revenue, same (rev DESC, date,
    // key) top-10
    "q184_shipping_priority" ->
      """SELECT o_orderkey,
        |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
        |    AS o_orderdate_day,
        |  o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 < 10013
        |  AND epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 > 10013
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderdate_day, o_orderkey LIMIT 10""".stripMargin,
    // same distinct (source, token) table, the same three unrolled
    // greedy rounds with (gain DESC, source) argmax and NOT EXISTS
    // freshness — MATERIALIZED for the q151 inlining reason
    "q185_greedy_coverage" ->
      """WITH sh AS (
        |  SELECT source, unnest(list_transform(range(0, GREATEST(length(text) - 7, 0)),
        |    i -> substring(text, CAST(i + 1 AS INTEGER), 8))) AS t
        |  FROM documents),
        |st AS MATERIALIZED (SELECT DISTINCT source, t FROM sh),
        |g1 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain FROM st GROUP BY 1),
        |p1 AS MATERIALIZED (
        |  SELECT source, gain FROM g1 ORDER BY gain DESC, source LIMIT 1),
        |c1 AS MATERIALIZED (
        |  SELECT DISTINCT t FROM st JOIN p1 USING (source)),
        |g2 AS (
        |  SELECT s.source, CAST(count(*) AS BIGINT) AS gain FROM st s
        |  WHERE NOT EXISTS (SELECT 1 FROM c1 WHERE c1.t = s.t)
        |    AND s.source NOT IN (SELECT source FROM p1)
        |  GROUP BY 1),
        |p2 AS MATERIALIZED (
        |  SELECT source, gain FROM g2 ORDER BY gain DESC, source LIMIT 1),
        |c2 AS MATERIALIZED (
        |  SELECT t FROM c1 UNION SELECT t FROM st JOIN p2 USING (source)),
        |g3 AS (
        |  SELECT s.source, CAST(count(*) AS BIGINT) AS gain FROM st s
        |  WHERE NOT EXISTS (SELECT 1 FROM c2 WHERE c2.t = s.t)
        |    AND s.source NOT IN (SELECT source FROM p1)
        |    AND s.source NOT IN (SELECT source FROM p2)
        |  GROUP BY 1),
        |p3 AS MATERIALIZED (
        |  SELECT source, gain FROM g3 ORDER BY gain DESC, source LIMIT 1),
        |c3 AS MATERIALIZED (
        |  SELECT t FROM c2 UNION SELECT t FROM st JOIN p3 USING (source))
        |SELECT CAST(1 AS BIGINT) AS round, source, gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c1) AS covered_total FROM p1
        |UNION ALL
        |SELECT 2, source, gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c2) FROM p2
        |UNION ALL
        |SELECT 3, source, gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c3) FROM p3""".stripMargin,
    // same integer rank arithmetic; the global order statistic is
    // tie-insensitive, so row_number's arbitrary tie order is safe
    "q186_quantile_normalize" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_s
        |  FROM d),
        |tot AS (SELECT count(*) AS n FROM d),
        |g AS (
        |  SELECT n_chars AS gv,
        |    row_number() OVER (ORDER BY n_chars) AS gpos
        |  FROM d)
        |SELECT s.doc_id, s.source, s.n_chars,
        |  CAST(s.rn AS BIGINT) AS rank_in_source,
        |  g.gv AS norm_chars
        |FROM s CROSS JOIN tot
        |JOIN g ON g.gpos = (s.rn * tot.n + s.n_s - 1) // s.n_s""".stripMargin,
    // same md5 ring, same pos*64+shard integer argmin, same wrap and
    // movement flags
    "q187_reshard_report" ->
      s"""WITH r4 AS (
        |  SELECT s.s AS shard,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      * 64 + s.s AS key,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      AS pos
        |  FROM (SELECT unnest(range(0, 4)) AS s) s
        |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v) v),
        |r5 AS (
        |  SELECT s.s AS shard,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      * 64 + s.s AS key,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      AS pos
        |  FROM (SELECT unnest(range(0, 5)) AS s) s
        |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v) v),
        |d AS (
        |  SELECT doc_id,
        |    ${md5Prefix32Sql("'doc:' || CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents),
        |b AS (
        |  SELECT d.doc_id, d.h,
        |    COALESCE(min(CASE WHEN r4.pos >= d.h THEN r4.key END),
        |      min(r4.key)) % 64 AS shard_before
        |  FROM d CROSS JOIN r4 GROUP BY 1, 2),
        |a AS (
        |  SELECT d.doc_id,
        |    COALESCE(min(CASE WHEN r5.pos >= d.h THEN r5.key END),
        |      min(r5.key)) % 64 AS shard_after
        |  FROM d CROSS JOIN r5 GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(sum(CASE WHEN shard_before <> shard_after THEN 1 END), 0)
        |    AS BIGINT) AS moved,
        |  CAST(COALESCE(sum(CASE WHEN shard_before <> shard_after THEN 1 END), 0)
        |    AS BIGINT) * 1000000 // count(*) AS moved_ppm,
        |  CAST(200000 AS BIGINT) AS ch_theory_ppm,
        |  CAST(COALESCE(sum(CASE WHEN b.h % 4 <> b.h % 5 THEN 1 END), 0)
        |    AS BIGINT) AS mod_moved,
        |  CAST(COALESCE(sum(CASE WHEN b.h % 4 <> b.h % 5 THEN 1 END), 0)
        |    AS BIGINT) * 1000000 // count(*) AS mod_moved_ppm
        |FROM b JOIN a USING (doc_id)""".stripMargin,
    // same pool, same unrolled greedy, same 0.5-weighted score and
    // (score DESC, vec_id) picks
    "q188_mmr_select" -> s"WITH ${mmrOracle(5)}",
    // q74's chunk CTE, the same adjacency pairing, the same md5 draw
    // mod doc-space with self-collisions dropped, chunk-0 resolution
    "q189_contrastive_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |nc AS (
         |  SELECT doc_id, t, len(t) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1 END AS nchunk
         |  FROM toks),
         |ch AS (
         |  SELECT doc_id, chunk_id,
         |    ${md5Prefix32Sql("array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' ')")} AS chunk_hash
         |  FROM (SELECT doc_id, t, unnest(range(0, nchunk)) AS chunk_id FROM nc)),
         |anchors AS (
         |  SELECT a.doc_id, a.chunk_id, a.chunk_hash AS anchor_hash,
         |    p.chunk_id AS pos_chunk_id, p.chunk_hash AS pos_hash
         |  FROM ch a JOIN ch p
         |    ON p.doc_id = a.doc_id AND p.chunk_id = a.chunk_id + 1),
         |md AS (SELECT max(doc_id) AS max_doc FROM documents),
         |z AS (SELECT doc_id AS neg_doc_id, chunk_hash AS neg_hash
         |  FROM ch WHERE chunk_id = 0),
         |draws AS (
         |  SELECT anchors.*, d.draw,
         |    ${md5Prefix32Sql("'ctr:' || CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR) || ':' || CAST(d.draw AS VARCHAR)")}
         |      % (md.max_doc + 1) AS neg_doc_id
         |  FROM anchors CROSS JOIN md
         |  CROSS JOIN (SELECT unnest(range(1, 3)) AS draw) d)
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id, anchor_hash,
         |  CAST(pos_chunk_id AS INTEGER) AS pos_chunk_id, pos_hash,
         |  CAST(draw AS BIGINT) AS draw, neg_doc_id, z.neg_hash
         |FROM draws JOIN z USING (neg_doc_id)
         |WHERE neg_doc_id <> doc_id""".stripMargin,
    // same running click count / first / last over the q97 order, same
    // integer ppm credit schedule
    "q190_position_attribution" ->
      """WITH ce AS (
        |  SELECT event_id, ts, user_id, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (
        |  SELECT event_id, user_id, event_type,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_clicks,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
        |  FROM ce)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(n_clicks AS BIGINT) AS n_clicks, first_click_id, last_click_id,
        |  CAST(CASE WHEN n_clicks = 1 THEN 1000000
        |       WHEN n_clicks = 2 THEN 500000 ELSE 400000 END AS BIGINT) AS first_ppm,
        |  CAST(CASE WHEN n_clicks = 1 THEN 1000000
        |       WHEN n_clicks = 2 THEN 500000 ELSE 400000 END AS BIGINT) AS last_ppm,
        |  CAST(CASE WHEN n_clicks <= 2 THEN 0
        |       ELSE 200000 // (n_clicks - 2) END AS BIGINT) AS mid_ppm
        |FROM r WHERE event_type = 'purchase' AND n_clicks >= 1""".stripMargin,
    // same brand slice, same integer cross-multiplied 0.2*avg threshold,
    // same DECIMAL money sum; avg_yearly is the one shared division
    "q192_small_qty_revenue" ->
      """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
        |bl AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q, l_extendedprice
        |  FROM lineitem JOIN bp ON l_partkey = p_partkey),
        |st AS (
        |  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(q) AS BIGINT) AS sumq
        |  FROM bl GROUP BY 1)
        |SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly
        |FROM bl JOIN st ON l_partkey = pk AND q * 5 * cnt < sumq""".stripMargin,
    // same left-outer order counts with zero-order customers kept, same
    // count-of-counts histogram
    "q204_custdist" ->
      """WITH oc AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |pc AS (
        |  SELECT coalesce(n_orders, 0) AS c_count
        |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY 1""".stripMargin,
    // same exact cent·percent revenue units, same integer cross-multiplied
    // 2x-average threshold and ppm share
    "q205_part_revenue_share" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
        |      AS DECIMAL(38,0)) AS revenue_e4
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(revenue_e4) AS DECIMAL(38,0)) AS total_e4,
        |    CAST(count(*) AS BIGINT) AS n_parts FROM rev)
        |SELECT l_partkey, CAST(revenue_e4 AS BIGINT) AS revenue_e4,
        |  CAST(revenue_e4 AS BIGINT) * 1000000 // CAST(total_e4 AS BIGINT)
        |    AS share_ppm
        |FROM rev CROSS JOIN tot
        |WHERE revenue_e4 * n_parts * 2 > total_e4 * 3""".stripMargin,
    // same integer cross-multiplied positive-average threshold, same
    // custkey anti join, same per-nation totals
    "q206_idle_rich" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |pos AS (
        |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |    CAST(count(*) AS BIGINT) AS n_pos
        |  FROM c WHERE bal_cents > 0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(bal_cents) AS BIGINT) AS total_cents
        |FROM c CROSS JOIN pos
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 >= 11323)
        |GROUP BY 1""".stripMargin,
    // same q79 shard hash, same closed-form absent-source mass, same
    // ppm floor of the exact TVD
    "q222_shard_balance" ->
      s"""WITH sc AS (
         |  SELECT ${md5Prefix32Sql("'shard:' || CAST(doc_id AS VARCHAR)")} % 16
         |      AS shard,
         |    source, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ctot FROM sc GROUP BY 1),
         |tt AS (SELECT CAST(sum(ctot) AS BIGINT) AS n_total FROM st),
         |sh AS (SELECT shard, CAST(sum(c) AS BIGINT) AS n_sh FROM sc GROUP BY 1),
         |ag AS (
         |  SELECT sc.shard,
         |    CAST(sum(abs(sc.c * n_total - st.ctot * sh.n_sh)) AS BIGINT) AS sum_abs,
         |    CAST(sum(st.ctot) AS BIGINT) AS c_present,
         |    CAST(max(sh.n_sh) AS BIGINT) AS n_docs,
         |    CAST(max(n_total) AS BIGINT) AS nt
         |  FROM sc JOIN st ON sc.source = st.source
         |  JOIN sh ON sc.shard = sh.shard CROSS JOIN tt
         |  GROUP BY 1)
         |SELECT shard, n_docs,
         |  sum_abs + (nt - c_present) * n_docs AS tvd_num,
         |  (sum_abs + (nt - c_present) * n_docs) * 1000000
         |    // (2 * n_docs * nt) AS tvd_ppm
         |FROM ag""".stripMargin,
    // same q123 arm hash, same (user, day) units, same per-cell micro
    // floors and integer DiD
    "q221_diff_in_diff" ->
      s"""WITH assigned AS (
         |  SELECT user_id,
         |    ${md5Prefix32Sql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
         |    event_type
         |  FROM events),
         |pu AS (
         |  SELECT arm, CASE WHEN day_num >= 19738 THEN 1 ELSE 0 END AS post,
         |    user_id, day_num,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         |  FROM assigned GROUP BY 1, 2, 3, 4),
         |cells AS (
         |  SELECT arm, post, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(converted) AS BIGINT) AS c,
         |    CAST(sum(converted) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
         |      AS rate_micro
         |  FROM pu GROUP BY 1, 2)
         |SELECT
         |  cp.n AS n_c_pre, cp.c AS c_c_pre, cp.rate_micro AS rate_c_pre_micro,
         |  co.n AS n_c_post, co.c AS c_c_post, co.rate_micro AS rate_c_post_micro,
         |  tp.n AS n_t_pre, tp.c AS c_t_pre, tp.rate_micro AS rate_t_pre_micro,
         |  tt.n AS n_t_post, tt.c AS c_t_post, tt.rate_micro AS rate_t_post_micro,
         |  (tt.rate_micro - tp.rate_micro) - (co.rate_micro - cp.rate_micro)
         |    AS did_micro
         |FROM (SELECT * FROM cells WHERE arm = 0 AND post = 0) cp
         |CROSS JOIN (SELECT * FROM cells WHERE arm = 0 AND post = 1) co
         |CROSS JOIN (SELECT * FROM cells WHERE arm = 1 AND post = 0) tp
         |CROSS JOIN (SELECT * FROM cells WHERE arm = 1 AND post = 1) tt""".stripMargin,
    // same milli grid, same unrolled 3 iterations with truncating
    // renormalization (DuckDB // floors negatives — spelled as
    // sign·(|w|·1000 // max) to match Spark's truncating div)
    "q220_pca_power" -> {
      def iter(i: Int): String =
        s"""w$i AS MATERIALIZED (
           |  SELECT m.i AS d, CAST(sum(m.mij * v${i - 1}.vi) AS BIGINT) AS wi
           |  FROM m JOIN v${i - 1} ON m.j = v${i - 1}.d GROUP BY 1),
           |v$i AS MATERIALIZED (
           |  SELECT d, CAST(CASE WHEN wi < 0 THEN -((-wi) * 1000 // mx)
           |    ELSE wi * 1000 // mx END AS BIGINT) AS vi
           |  FROM w$i CROSS JOIN (SELECT max(abs(wi)) AS mx FROM w$i))""".stripMargin
      s"""WITH x AS (
        |  SELECT vec_id, t.i AS i,
        |    CAST(floor(CAST(embedding[t.i + 1] AS DOUBLE) * 1000) AS BIGINT) AS xi
        |  FROM embeddings, range(64) t(i)),
        |m AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.xi * b.xi) AS BIGINT) AS mij
        |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT i AS d, CAST(1000 AS BIGINT) AS vi FROM m),
        |${iter(1)},
        |${iter(2)},
        |${iter(3)},
        |num AS (
        |  SELECT CAST(sum(CAST(a.vi AS HUGEINT) * m.mij * b.vi) AS HUGEINT) AS num
        |  FROM m JOIN v3 b ON m.j = b.d JOIN v3 a ON m.i = a.d),
        |den AS (SELECT CAST(sum(vi * vi) AS BIGINT) AS den FROM v3)
        |SELECT d AS dim, vi AS component_milli,
        |  CAST(num * 1000 // CAST(den AS HUGEINT) AS BIGINT) AS lambda_milli
        |FROM v3 CROSS JOIN num CROSS JOIN den""".stripMargin
    },
    // same cleared-denominator integer BM25, same micro floors, same
    // (score DESC, doc_id) top-20
    "q224_bm25_search" ->
      """WITH stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, n_chars AS dl,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok IN ('dup', 'spark', 'window', 'batch')
        |  GROUP BY 1, 2, 3),
        |idf AS (
        |  SELECT tok, CAST(len(bin(n_docs // df)) AS BIGINT) AS idf2
        |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        |  CROSS JOIN stats),
        |sc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
        |    CAST(sum(idf2 * (CAST(22 AS HUGEINT) * tf.tf * total_dl * 1000000
        |      // (CAST(10 AS HUGEINT) * tf.tf * total_dl
        |          + CAST(3 AS HUGEINT) * total_dl
        |          + CAST(9 AS HUGEINT) * dl * n_docs)))
        |      AS BIGINT) AS score_micro
        |  FROM tf JOIN idf ON tf.tok = idf.tok CROSS JOIN stats
        |  GROUP BY 1)
        |SELECT doc_id, n_terms_matched, score_micro FROM sc
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,
    // same (source, token) counts, same integer-log2 source-idf weight,
    // same (score DESC, tok) top-5 per source
    "q217_source_keywords" ->
      """WITH tf AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT source,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM tf),
        |sc AS (
        |  SELECT tf.source, tf.tok, tf.tf, df.df,
        |    tf.tf * CAST(len(bin(n_sources // df.df)) AS BIGINT) AS score
        |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN s)
        |SELECT source, tok, tf, df, score, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, tok) AS rank
        |  FROM sc) WHERE rank <= 5""".stripMargin,
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
    // same word/digit/other decomposition as q53, same per-language sums
    // and milli floors
    "q219_token_fertility" ->
      """WITH base AS (
        |  SELECT lang, n_chars,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS nw,
        |    CAST(COALESCE(list_sum(list_transform(
        |        regexp_extract_all(text, '[A-Za-z]+'), w -> (length(w) + 3) // 4)), 0)
        |      + len(regexp_extract_all(text, '[0-9]'))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS nb
        |  FROM documents),
        |ag AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(nw) AS BIGINT) AS total_words,
        |    CAST(sum(nb) AS BIGINT) AS total_bpe
        |  FROM base GROUP BY 1)
        |SELECT lang, n_docs, total_chars, total_words, total_bpe,
        |  total_bpe * 1000 // total_words AS fertility_milli,
        |  total_chars * 1000 // total_bpe AS chars_per_token_milli
        |FROM ag WHERE total_words > 0 AND total_bpe > 0""".stripMargin,
    // same char split, same floor-log2 entropy numerator, same milli floor
    "q211_char_entropy" ->
      """WITH cc AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |        FROM documents)
        |  WHERE ch <> '' GROUP BY 1, 2),
        |ag AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_counted,
        |    CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |    CAST(sum(c * (len(bin(c)) - 1)) AS BIGINT) AS sum_c_log
        |  FROM cc GROUP BY 1)
        |SELECT doc_id, n_chars_counted, n_distinct_chars, sum_c_log,
        |  (n_chars_counted * (len(bin(n_chars_counted)) - 1) - sum_c_log)
        |    * 1000 // n_chars_counted AS entropy_milli_bits
        |FROM ag""".stripMargin,
    // same tokenization, same integer-log2 surprisal bits, same final
    // milli floor division
    "q207_lm_surprisal" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |vocab AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM vocab),
        |bits AS (
        |  SELECT tok, CAST(len(bin(n_total // ct)) AS BIGINT) AS b
        |  FROM vocab CROSS JOIN tot)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(c * b) AS BIGINT) AS surprisal_bits,
        |  CAST(sum(c * b) AS BIGINT) * 1000 // CAST(sum(c) AS BIGINT)
        |    AS bits_per_token_milli
        |FROM tf JOIN bits USING (tok) GROUP BY 1""".stripMargin,
    // same score-histogram collapse, same doubled tie-aware pair count,
    // same ppm floor
    "q208_auc_popularity" ->
      s"""WITH $ratingsCte,
        |pop AS (
        |  SELECT productId, CAST(count(*) AS BIGINT) AS score
        |  FROM ratings GROUP BY 1),
        |sc AS (
        |  SELECT score,
        |    CAST(sum(CASE WHEN rating > 3 THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN rating > 3 THEN 0 ELSE 1 END) AS BIGINT) AS n
        |  FROM ratings JOIN pop USING (productId) GROUP BY 1),
        |cum AS (
        |  SELECT p, n,
        |    coalesce(sum(n) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_n
        |  FROM sc)
        |SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(n) AS BIGINT) AS n_neg,
        |  CAST(sum(p * (2 * cum_n + n)) AS BIGINT) AS auc_num2,
        |  CAST(sum(p * (2 * cum_n + n)) AS BIGINT) * 500000
        |    // (CAST(sum(p) AS BIGINT) * CAST(sum(n) AS BIGINT)) AS auc_ppm
        |FROM cum""".stripMargin,
    // same distinct pair collapse, same (bal_cents, suppkey) argmin order
    "q215_cheapest_shipper" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |s AS (
        |  SELECT s_suppkey,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM supplier),
        |j AS (
        |  SELECT l_partkey, s_suppkey, bal_cents,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY bal_cents, s_suppkey) AS rn,
        |    CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n_shippers
        |  FROM ps JOIN s ON l_suppkey = s_suppkey)
        |SELECT l_partkey, s_suppkey, bal_cents, n_shippers
        |FROM j WHERE rn = 1""".stripMargin,
    // same revenue units, same ascending index (tie-invariant), same
    // exact ppm Gini ratio
    "q216_gini_revenue" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
        |      AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |idx AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS i
        |  FROM rev)
        |SELECT CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(x) AS BIGINT) AS total_e4,
        |  CAST(sum(CAST(i AS HUGEINT) * x) AS BIGINT) AS weighted_sum,
        |  CAST((CAST(2 AS HUGEINT) * sum(CAST(i AS HUGEINT) * x)
        |      - (CAST(count(*) AS HUGEINT) + 1) * CAST(sum(x) AS HUGEINT))
        |    * 1000000
        |    // (CAST(count(*) AS HUGEINT) * CAST(sum(x) AS HUGEINT))
        |    AS BIGINT) AS gini_ppm
        |FROM idx""".stripMargin,
    // same daily pairs, same IEEE slope divisions, same exact median
    // order statistic with (d1, d2) tiebreaks
    "q226_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.event_type, a.day_num AS d1, b.day_num AS d2,
        |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.day_num - a.day_num AS DOUBLE)
        |      AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day_num < b.day_num),
        |rk AS (
        |  SELECT event_type, slope,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope, d1, d2) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM sl),
        |med AS (
        |  SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
        |    sum(slope) / count(*) AS median_slope
        |  FROM rk WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
        |  GROUP BY 1),
        |nd AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT med.event_type, n_days, n_pairs, median_slope
        |FROM med JOIN nd ON med.event_type = nd.event_type""".stripMargin,
    // same per-(user, type) min/max collapse, same strict-< precedence
    "q213_sequential_pairs" ->
      """WITH ut AS (
        |  SELECT user_id, event_type,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_users_both,
        |  CAST(sum(CASE WHEN a.first_us < b.last_us THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_users_ab,
        |  CAST(sum(CASE WHEN a.first_us < b.last_us THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS direction_ppm
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |GROUP BY 1, 2""".stripMargin,
    // same epoch-day % 7 buckets, same cross-multiplied ppm index
    "q209_weekday_seasonality" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num
        |  FROM events),
        |tw AS (
        |  SELECT event_type, day_num % 7 AS weekday,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT day_num) AS BIGINT) AS n_days
        |  FROM d GROUP BY 1, 2),
        |tt AS (
        |  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS type_events,
        |    CAST(sum(n_days) AS BIGINT) AS type_days
        |  FROM tw GROUP BY 1)
        |SELECT tw.event_type, weekday, n_events, n_days,
        |  n_events * type_days * 1000000 // (n_days * type_events) AS index_ppm
        |FROM tw JOIN tt ON tw.event_type = tt.event_type""".stripMargin,
    // same per-(order, supplier) late flag, same order-keyed window
    // counts, same (numwait DESC, s_suppkey) top-20 total order
    "q193_waiting_suppliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS ship_day
        |  FROM lineitem),
        |o AS (
        |  SELECT o_orderkey,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS order_day
        |  FROM orders),
        |ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN ship_day - order_day > 120 THEN 1 ELSE 0 END) AS supp_late
        |  FROM li JOIN o ON l_orderkey = o_orderkey GROUP BY 1, 2),
        |fl AS (
        |  SELECT l_suppkey FROM (
        |    SELECT l_suppkey, supp_late,
        |      count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |      sum(supp_late) OVER (PARTITION BY l_orderkey) AS n_late_supp
        |    FROM ps)
        |  WHERE supp_late = 1 AND n_supp >= 2 AND n_late_supp = 1),
        |agg AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait FROM fl GROUP BY 1)
        |SELECT s_suppkey, s_name, numwait FROM (
        |  SELECT s.s_suppkey, s.s_name, a.numwait,
        |    row_number() OVER (ORDER BY a.numwait DESC, s.s_suppkey) AS rn
        |  FROM agg a JOIN supplier s ON a.l_suppkey = s.s_suppkey)
        |WHERE rn <= 20""".stripMargin,
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
    // same observed-day lag convention, same both-lags-present filter,
    // same single division of exact BIGINT error sums
    "q195_forecast_skill" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, cnt,
        |    lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day_num) AS lag1,
        |    lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day_num) AS lag7
        |  FROM daily)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(cnt - lag1)) AS BIGINT) AS naive_abs_err,
        |  CAST(sum(abs(cnt - lag7)) AS BIGINT) AS seasonal_abs_err,
        |  CASE WHEN sum(abs(cnt - lag1)) = 0 THEN NULL
        |       ELSE CAST(sum(abs(cnt - lag7)) AS DOUBLE)
        |         / CAST(sum(abs(cnt - lag1)) AS DOUBLE) END AS skill
        |FROM lagged WHERE lag1 IS NOT NULL AND lag7 IS NOT NULL
        |GROUP BY event_type""".stripMargin,
    // same stride centroids, same rn<=2 probe assignment, same DISTINCT
    // cell candidates, (sim DESC, b_id) top-5, broadcast label lookups
    "q200_knn_label_consistency" ->
      s"""WITH cents AS (
        |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id % 37 = 0),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT e.vec_id, c.c_id AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosineSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
        |    FROM embeddings e CROSS JOIN cents c)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |sims AS (
        |  SELECT c.a_id, c.b_id, ${cosineSql("ea.embedding", "eb.embedding")} AS sim
        |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.a_id
        |              JOIN embeddings eb ON eb.vec_id = c.b_id),
        |top AS (
        |  SELECT a_id, b_id FROM (
        |    SELECT a_id, b_id,
        |      row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn
        |    FROM sims) WHERE rn <= 5)
        |SELECT t.a_id AS vec_id, la.label, CAST(count(*) AS BIGINT) AS n_neighbors,
        |  CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_same,
        |  CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS consistency_ppm
        |FROM top t JOIN embeddings la ON la.vec_id = t.a_id
        |           JOIN embeddings lb ON lb.vec_id = t.b_id
        |GROUP BY 1, 2""".stripMargin,
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
    // same (metric, doc_id) tie-broken per-source ranks, exact d² sums,
    // the same fixed IEEE rho expression
    "q202_spearman" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |rk AS (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r1,
        |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS r2
        |  FROM t),
        |ag AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        |  FROM rk GROUP BY 1)
        |SELECT source, n_docs, sum_d2,
        |  CASE WHEN n_docs > 1 THEN
        |    1.0 - (6.0 * CAST(sum_d2 AS DOUBLE))
        |      / (CAST(n_docs AS DOUBLE) * CAST(n_docs * n_docs - 1 AS DOUBLE))
        |  ELSE NULL END AS rho
        |FROM ag""".stripMargin,
    // same undirected wedge candidates, LEFT join keeps local bridges at
    // embeddedness 0, exact histogram
    "q203_edge_embeddedness" ->
      s"""WITH $ratingsCte,
        |$goodCte,
        |$pairsCte,
        |und AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
        |cn AS (
        |  SELECT u1.dst AS x, u2.dst AS y, CAST(count(*) AS BIGINT) AS cn
        |  FROM und u1 JOIN und u2 ON u1.src = u2.src AND u1.dst < u2.dst
        |  GROUP BY 1, 2),
        |emb AS (
        |  SELECT COALESCE(cn.cn, 0) AS embeddedness
        |  FROM pairs p LEFT JOIN cn ON cn.x = p.src AND cn.y = p.dst)
        |SELECT embeddedness, CAST(count(*) AS BIGINT) AS n_edges
        |FROM emb GROUP BY 1""".stripMargin,
    // same tokenizer, same IN-list term filter, same integer-log2 idf via
    // binary length, same (score DESC, doc_id) top-20 total order
    "q197_tfidf_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |qt AS (
        |  SELECT doc_id, tok FROM toks
        |  WHERE tok IN ('dup', 'spark', 'window', 'batch')),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM qt GROUP BY 1, 2),
        |idf AS (
        |  SELECT tok,
        |    CAST(length(bin((SELECT n_docs FROM n) // count(*))) AS BIGINT) AS idf2
        |  FROM tf GROUP BY tok),
        |sc AS (
        |  SELECT tf.doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
        |    CAST(sum(tf.tf * idf.idf2) AS BIGINT) AS score
        |  FROM tf JOIN idf USING (tok) GROUP BY 1)
        |SELECT doc_id, n_terms_matched, score FROM (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM sc)
        |WHERE rn <= 20""".stripMargin,
    // q06's unrolled LP chain, then the same exact-integer modularity
    // numerators over the canonical pair list
    "q198_modularity" ->
      s"""$graphPrefix,
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs)
        |  GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
        |intra AS (
        |  SELECT la.label, CAST(count(*) AS BIGINT) AS e_c
        |  FROM pairs p JOIN l5 la ON la.id = p.src JOIN l5 lb ON lb.id = p.dst
        |  WHERE la.label = lb.label GROUP BY 1),
        |dc AS (
        |  SELECT l.label, CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(sum(d.deg) AS BIGINT) AS d_c
        |  FROM l5 l JOIN deg d ON d.id = l.id GROUP BY 1)
        |SELECT dc.label, n_members, CAST(COALESCE(e_c, 0) AS BIGINT) AS e_c,
        |  d_c, mm.m,
        |  CAST(4 * mm.m * COALESCE(e_c, 0) - d_c * d_c AS BIGINT) AS q_num
        |FROM dc LEFT JOIN intra USING (label) CROSS JOIN mm""".stripMargin,
    // same gram hash stream, bottom-64 DISTINCT hashes per source, the
    // same (k-1)·2^32/h_k estimate and exact-side grading division
    "q194_kmv_sketch" ->
      s"""WITH sh AS (
        |  SELECT source, unnest(list_transform(range(0, GREATEST(length(text) - 7, 0)),
        |    i -> substring(text, CAST(i + 1 AS INTEGER), 8))) AS g
        |  FROM documents),
        |hashed AS (
        |  SELECT source, g, ${md5Prefix32Sql("g")} AS h FROM sh),
        |dh AS (SELECT DISTINCT source, h FROM hashed),
        |rn AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |  FROM dh),
        |sk AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(max(h) AS BIGINT) AS h_k
        |  FROM rn WHERE r <= 64 GROUP BY 1),
        |ex AS (
        |  SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS exact_grams
        |  FROM hashed GROUP BY 1),
        |est AS (
        |  SELECT source, CAST(64 AS BIGINT) AS k, n_kept, h_k,
        |    CASE WHEN n_kept < 64 THEN n_kept
        |         ELSE CAST(270582939648 // h_k AS BIGINT) END AS est,
        |    exact_grams
        |  FROM sk JOIN ex USING (source))
        |SELECT source, k, n_kept, h_k, est, exact_grams,
        |  CAST(abs(est - exact_grams) * 1000000 // exact_grams AS BIGINT)
        |    AS err_ppm
        |FROM est""".stripMargin,
    // same member/probe split, same kh md5 bit draws, same 63-bit word
    // bit_or filter, all-bits-set false-positive test, exact ppm
    "q196_bloom_fpr" ->
      s"""WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS is_member
        |  FROM events GROUP BY 1),
        |mpos AS (
        |  SELECT DISTINCT
        |    ${md5Prefix32Sql("'bf:' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 8192 AS pos
        |  FROM u CROSS JOIN (SELECT unnest(range(0, 3)) AS j) js
        |  WHERE is_member = 1),
        |words AS (
        |  SELECT pos // 63 AS word, bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
        |  FROM mpos GROUP BY 1),
        |ppos AS (
        |  SELECT user_id,
        |    ${md5Prefix32Sql("'bf:' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 8192 AS pos
        |  FROM u CROSS JOIN (SELECT unnest(range(0, 3)) AS j) js
        |  WHERE is_member = 0),
        |probe AS (
        |  SELECT p.user_id,
        |    min(CASE WHEN (w.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 63 AS INTEGER))) <> 0
        |             THEN 1 ELSE 0 END) AS all_hit
        |  FROM ppos p LEFT JOIN words w ON w.word = p.pos // 63
        |  GROUP BY 1),
        |pa AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |    CAST(sum(all_hit) AS BIGINT) AS n_false_pos
        |  FROM probe),
        |ma AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_members FROM u WHERE is_member = 1),
        |wa AS (SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set FROM words)
        |SELECT CAST(8192 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k_hashes,
        |  n_members, bits_set, n_probes, n_false_pos,
        |  CAST(n_false_pos * 1000000 // n_probes AS BIGINT) AS fpr_ppm
        |FROM pa CROSS JOIN ma CROSS JOIN wa""".stripMargin,
    // same md5 fold draw, same exact ppm deviation integer division
    "q199_kfold_assign" ->
      s"""WITH f AS (
         |  SELECT lang,
         |    ${md5Prefix32Sql("'fold:' || CAST(doc_id AS VARCHAR)")} % 5 AS fold
         |  FROM documents),
         |per AS (
         |  SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM f GROUP BY 1, 2),
         |tot AS (
         |  SELECT lang, fold, n_docs,
         |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS n_stratum
         |  FROM per)
         |SELECT lang, fold, n_docs, n_stratum,
         |  CAST(abs(5 * n_docs - n_stratum) * 1000000 // n_stratum AS BIGINT)
         |    AS dev_ppm
         |FROM tot""".stripMargin,
    // exact-integer TVD per QI class vs the corpus margin; HUGEINT
    // products mirror the Spark side's DECIMAL(38,0)
    "q149_t_closeness" ->
      """WITH q AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(floor(value / 100.0) AS BIGINT) AS v_bucket,
        |    event_type
        |  FROM events),
        |cs AS (
        |  SELECT day_num, v_bucket, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM q GROUP BY 1, 2, 3),
        |classes AS (
        |  SELECT day_num, v_bucket, CAST(sum(c) AS BIGINT) AS n_class
        |  FROM cs GROUP BY 1, 2),
        |margin AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS g FROM cs GROUP BY 1),
        |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_total FROM margin),
        |grid AS (
        |  SELECT cl.day_num, cl.v_bucket, cl.n_class, t.n_total,
        |    m.event_type, m.g, COALESCE(cs.c, 0) AS c
        |  FROM classes cl CROSS JOIN margin m CROSS JOIN tot t
        |  LEFT JOIN cs ON cs.day_num = cl.day_num AND cs.v_bucket = cl.v_bucket
        |    AND cs.event_type = m.event_type)
        |SELECT day_num, v_bucket, n_class,
        |  CAST(sum(abs(CAST(c AS HUGEINT) * n_total - CAST(g AS HUGEINT) * n_class))
        |    AS BIGINT) AS t_num,
        |  CAST(CAST(n_class AS HUGEINT) * n_total * 2 AS BIGINT) AS t_den,
        |  CAST(sum(abs(CAST(c AS HUGEINT) * n_total - CAST(g AS HUGEINT) * n_class))
        |      AS DOUBLE)
        |    / CAST(CAST(n_class AS HUGEINT) * n_total * 2 AS DOUBLE) AS t,
        |  sum(abs(CAST(c AS HUGEINT) * n_total - CAST(g AS HUGEINT) * n_class)) * 4
        |    > CAST(n_class AS HUGEINT) * n_total * 2 AS flagged
        |FROM grid GROUP BY day_num, v_bucket, n_class, n_total""".stripMargin,
    // same x8 scaling before quantile_cont, same strictly-greater bucket
    // rule; cuts are exact integers by construction on both engines
    "q156_range_boundaries" ->
      """WITH cs AS (
        |  SELECT quantile_cont(n_chars * 8,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS cs
        |  FROM documents),
        |bk AS (
        |  SELECT len(list_filter(cs.cs, c -> n_chars * 8 > c)) AS bucket
        |  FROM documents CROSS JOIN cs),
        |cnt AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM bk GROUP BY 1)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CASE WHEN bucket < 7
        |    THEN CAST(cs.cs[CAST(bucket + 1 AS INTEGER)] AS BIGINT) END AS upper_scaled,
        |  n_rows
        |FROM cnt CROSS JOIN cs""".stripMargin,
    // same tokenizer, HUGEINT count-squared products, identical division
    // order for the two reported ratios
    "q153_token_diversity" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |m AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS BIGINT) AS rep_pairs
        |  FROM c GROUP BY 1)
        |SELECT source, n_tokens, n_types, rep_pairs,
        |  CAST(rep_pairs AS DOUBLE)
        |    / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) AS DOUBLE) AS simpson,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
        |FROM m""".stripMargin,
    // identical md5 inclusion compare and per-term floor-scaled HT
    // contribution; the double casts mirror the Spark column order
    "q152_pps_sample" ->
      s"""WITH base AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |mx AS (SELECT max(n_chars) AS max_chars FROM base),
        |k AS (
        |  SELECT n_tok, n_chars, max_chars,
        |    ${md5Prefix32Sql("'pps:' || CAST(doc_id AS VARCHAR)")} * max_chars
        |      < n_chars * 4294967296 AS kept
        |  FROM base CROSS JOIN mx)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(sum(CASE WHEN kept THEN 1 END), 0) AS BIGINT) AS n_kept,
        |  CAST(sum(n_tok) AS BIGINT) AS exact_tokens,
        |  CAST(COALESCE(sum(CASE WHEN kept
        |    THEN n_tok * max_chars * 1000000 // n_chars END), 0) AS BIGINT)
        |    AS est_tokens_micro,
        |  CAST(CAST(COALESCE(sum(CASE WHEN kept
        |    THEN n_tok * max_chars * 1000000 // n_chars END), 0) AS BIGINT) AS DOUBLE)
        |    / 1e6 AS est_tokens,
        |  (CAST(CAST(COALESCE(sum(CASE WHEN kept
        |      THEN n_tok * max_chars * 1000000 // n_chars END), 0) AS BIGINT) AS DOUBLE)
        |      / 1e6 - CAST(sum(n_tok) AS DOUBLE))
        |    / CAST(sum(n_tok) AS DOUBLE) AS rel_err
        |FROM k""".stripMargin,
    // five HUGEINT moments over the lag-joined daily table; r evaluated
    // in the same cast/multiply/sqrt/divide order as the Spark column
    "q150_autocorrelation" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |lags AS (SELECT unnest([1, 7]) AS lag_d),
        |pairs AS (
        |  SELECT a.event_type, l.lag_d, a.cnt AS x, b.cnt AS y
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.event_type = a.event_type
        |    AND b.day_num = a.day_num + l.lag_d),
        |m AS (
        |  SELECT event_type, lag_d, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, lag_d, n AS n_pairs,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
        |  CAST(n * syy - sy * sy AS BIGINT) AS den_y,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |      * CAST(n * syy - sy * sy AS DOUBLE)) AS r
        |FROM m""".stripMargin,
    // integer dots/norms from the deduped (user, product) max-rating;
    // cosine = one division by one sqrt of an exact integer product, and
    // the row_number (cos DESC, neighbor) mirror of the ExactTopK contract
    "q107_item_cf" ->
      s"""WITH $itemCfCtes
        |SELECT item, neighbor, dot, support, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin,
    // same QI classes; sensitive = user-id decade bucket
    "q142_l_diversity" ->
      """WITH qi AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(floor(value / 100.0) AS BIGINT) AS v_bucket,
        |    user_id // 10 AS u_bucket
        |  FROM events),
        |cells AS (
        |  SELECT event_type, day_num, v_bucket, u_bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM qi GROUP BY 1, 2, 3, 4),
        |classes AS (
        |  SELECT event_type, day_num, v_bucket,
        |    CAST(sum(n) AS BIGINT) AS class_rows,
        |    CAST(count(*) AS BIGINT) AS n_sensitive
        |  FROM cells GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(COALESCE(sum(CASE WHEN n_sensitive < 3 THEN 1 END), 0) AS BIGINT)
        |    AS n_homogeneous,
        |  CAST(COALESCE(sum(CASE WHEN n_sensitive < 3 THEN class_rows END), 0) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(min(n_sensitive) AS BIGINT) AS min_diversity,
        |  CAST(3 AS BIGINT) AS l
        |FROM classes""".stripMargin,
    // same QI buckets (epoch-day, value-centile); constant-size summary
    "q115_k_anonymity" ->
      """WITH qi AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(floor(value / 100.0) AS BIGINT) AS v_bucket
        |  FROM events),
        |groups AS (
        |  SELECT event_type, day_num, v_bucket, CAST(count(*) AS BIGINT) AS n
        |  FROM qi GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(COALESCE(sum(CASE WHEN n < 20 THEN 1 END), 0) AS BIGINT) AS n_small_groups,
        |  CAST(COALESCE(sum(CASE WHEN n < 20 THEN n END), 0) AS BIGINT) AS rows_at_risk,
        |  CAST(20 AS BIGINT) AS k
        |FROM groups""".stripMargin,
    // same salted-hash in-bucket order; integer division batches rows
    "q120_batch_padding" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, n_tok, (n_tok - 1) // 64 AS bucket_id,
         |    ${md5Prefix32Sql("'batch:' || CAST(doc_id AS VARCHAR)")} AS ord
         |  FROM toks),
         |rn AS (
         |  SELECT bucket_id, n_tok,
         |    (row_number() OVER (PARTITION BY bucket_id ORDER BY ord, doc_id) - 1) // 16
         |      AS batch_id
         |  FROM b)
         |SELECT bucket_id, batch_id, count(*) AS n_docs,
         |  CAST(max(n_tok) AS BIGINT) AS max_tokens,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
         |  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste,
         |  CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) * max(n_tok) AS DOUBLE)
         |    AS efficiency
         |FROM rn GROUP BY 1, 2""".stripMargin,
    // identical global row_number file assignment; overlap test and
    // amplification are exact-integer until the single final division
    "q124_zonemap_skipping" ->
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber,
         |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS k
         |  FROM lineitem),
         |tot AS (SELECT (count(*) + 4095) // 4096 AS n_files FROM base),
         |layouts AS (
         |  SELECT 'sorted' AS layout,
         |    (row_number() OVER (ORDER BY k, l_orderkey, l_linenumber) - 1) // 4096 AS file_id, k
         |  FROM base
         |  UNION ALL
         |  SELECT 'hashed' AS layout,
         |    ${md5Prefix32Sql("'file:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")}
         |      % (SELECT n_files FROM tot) AS file_id, k
         |  FROM base),
         |stats AS (
         |  SELECT layout, file_id, min(k) AS min_k, max(k) AS max_k,
         |    CAST(count(*) AS BIGINT) AS n_in_file
         |  FROM layouts GROUP BY 1, 2),
         |preds(pred, lo, hi) AS (VALUES
         |  ('month_1996_06', 9648, 9678), ('year_1997', 9862, 10227),
         |  ('tail_2001', 11474, 11688)),
         |exact AS (
         |  SELECT pred, CAST(count(*) AS BIGINT) AS exact_rows
         |  FROM base JOIN preds ON k >= lo AND k < hi GROUP BY 1)
         |SELECT s.layout, p.pred,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(COALESCE(sum(CASE WHEN s.min_k < p.hi AND s.max_k >= p.lo THEN 1 END), 0) AS BIGINT) AS files_read,
         |  CAST(COALESCE(sum(CASE WHEN s.min_k < p.hi AND s.max_k >= p.lo THEN s.n_in_file END), 0) AS BIGINT) AS rows_scanned,
         |  max(e.exact_rows) AS exact_rows,
         |  CAST(COALESCE(sum(CASE WHEN s.min_k < p.hi AND s.max_k >= p.lo THEN s.n_in_file END), 0) AS DOUBLE)
         |    / CAST(max(e.exact_rows) AS DOUBLE) AS read_amplification
         |FROM stats s CROSS JOIN preds p JOIN exact e ON e.pred = p.pred
         |GROUP BY 1, 2""".stripMargin,
    // z-test in DECIMAL(38,0) cross-multiplied form (q103/q118 pattern);
    // lift as ONE division of exact integer products
    "q123_ab_test" ->
      s"""WITH assigned AS (
         |  SELECT user_id,
         |    ${md5Prefix32Sql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
         |    event_type
         |  FROM events),
         |pu AS (
         |  SELECT arm, user_id, day_num,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         |  FROM assigned GROUP BY 1, 2, 3),
         |pa AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(converted) AS BIGINT) AS c
         |  FROM pu GROUP BY 1),
         |ab AS (
         |  SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
         |  FROM (SELECT * FROM pa WHERE arm = 0) a, (SELECT * FROM pa WHERE arm = 1) b)
         |SELECT n_a, c_a, n_b, c_b,
         |  CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
         |  CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
         |  CAST(c_b * n_a AS DOUBLE) / CAST(c_a * n_b AS DOUBLE) AS lift,
         |  CAST(10000 AS DECIMAL(38,0)) * CAST(n_a + n_b AS DECIMAL(38,0))
         |    * (CAST(c_a*n_b - c_b*n_a AS DECIMAL(38,0)) * CAST(c_a*n_b - c_b*n_a AS DECIMAL(38,0)))
         |  > CAST(38416 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
         |    * CAST(c_a + c_b AS DECIMAL(38,0)) * CAST(n_a + n_b - c_a - c_b AS DECIMAL(38,0))
         |    AS significant
         |FROM ab""".stripMargin,
    // 63-bit words keep 1<<bit off the sign bit (DuckDB raises overflow
    // at 1<<63); bit_count is TINYINT there, INT in Spark -> cast the sum
    "q122_bitmap_distinct" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    user_id
        |  FROM events),
        |words AS (
        |  SELECT event_type, day_num, user_id // 63 AS word_idx,
        |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
        |  FROM ev GROUP BY 1, 2, 3)
        |SELECT event_type, day_num,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(bit_count(bits)) AS BIGINT) AS distinct_users
        |FROM words GROUP BY 1, 2""".stripMargin,
    // the range join re-derives the same trailing-window membership the
    // bitmap OR computes; COUNT(DISTINCT) over it is the graded truth
    "q125_rolling_wau" ->
      """WITH ev AS (
        |  SELECT DISTINCT
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day_num FROM ev)
        |SELECT d.day_num,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM days d JOIN ev e ON e.day_num BETWEEN d.day_num - 6 AND d.day_num
        |GROUP BY 1""".stripMargin,
    // same quality expression as q34 (bit-identical doubles), doc_id tie
    // break, and the pure-integer budget predicate 2·cum <= total
    "q126_nucleus_select" ->
      s"""WITH q AS ($qualityScoreOracle),
         |d AS (
         |  SELECT doc.doc_id, doc.source, doc.n_chars, q.quality_score
         |  FROM documents doc JOIN q ON doc.doc_id = q.doc_id),
         |c AS (
         |  SELECT *,
         |    sum(n_chars) OVER (PARTITION BY source
         |      ORDER BY quality_score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars,
         |    sum(n_chars) OVER (PARTITION BY source) AS total_chars
         |  FROM d)
         |SELECT doc_id, source, n_chars, quality_score,
         |  CAST(cum_chars AS BIGINT) AS cum_chars
         |FROM c WHERE cum_chars * 2 <= total_chars""".stripMargin,
    // HUGEINT keeps c² and n² exact (the q103 overflow posture); the two
    // shares are single divisions of exact integers
    "q130_key_skew" -> {
      def one(rel: String, table: String, key: String): String =
        s"""SELECT '$rel' AS relation,
           |  CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(max(c) AS BIGINT) AS max_key_rows,
           |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share,
           |  CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
           |    / CAST(CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS BIGINT) AS DOUBLE) AS hhi
           |FROM (SELECT $key AS k, count(*) AS c FROM $table
           |      WHERE $key IS NOT NULL GROUP BY 1)""".stripMargin
      Seq(
        one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        one("lineitem.l_partkey", "lineitem", "l_partkey"),
        one("orders.o_custkey", "orders", "o_custkey"),
        one("events.user_id", "events", "user_id"),
        one("documents.source", "documents", "source")).mkString("\nUNION ALL\n")
    },
    // x100 scale lands quantile_cont interpolation on integers at
    // p ∈ {.5,.9,.99}; the /100 rescale divides exact integers
    "q134_transition_latency" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER w AS to_type,
        |    100 * (epoch_us(CAST(lead(ts) OVER w AS TIMESTAMP))
        |           - epoch_us(CAST(ts AS TIMESTAMP))) AS gap100
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type AS from_type, to_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(gap100, 0.50) / 100.0 AS p50_us,
        |  quantile_cont(gap100, 0.90) / 100.0 AS p90_us,
        |  quantile_cont(gap100, 0.99) / 100.0 AS p99_us
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // q36's gram index CTEs with asymmetric denominators; both ratios are
    // single divisions of exact integer counts
    "q133_containment" ->
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
         |SELECT a_id, b_id, inter, n_a, n_b, c_a_in_b, c_b_in_a FROM (
         |  SELECT i.a_id, i.b_id, i.inter,
         |    sa.n_sh AS n_a, sb.n_sh AS n_b,
         |    CAST(i.inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS c_a_in_b,
         |    CAST(i.inter AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS c_b_in_a
         |  FROM inter i
         |  JOIN sz sa ON sa.doc_id = i.a_id
         |  JOIN sz sb ON sb.doc_id = i.b_id)
         |WHERE greatest(c_a_in_b, c_b_in_a) >= 0.7""".stripMargin,
    // same pinned fold: list_reduce seeds with the first element exactly
    // like the Spark aggregate() seeded with days[0]
    "q132_ewma_volume" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  max(day_num) AS last_day,
        |  list_reduce(list(CAST(cnt AS DOUBLE) ORDER BY day_num),
        |    (acc, x) -> x + acc / 2.0) AS ewma
        |FROM daily GROUP BY 1""".stripMargin,
    // the oracle recomputes the report through its own daily CTE — the
    // hash grade IS the partial-merge == direct-aggregate proof
    "q131_rollup_merge" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day_num // 30 AS month_num,
        |  CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(max(cnt) AS BIGINT) AS peak_daily,
        |  CAST(count(*) AS BIGINT) AS days_active
        |FROM daily GROUP BY 1, 2""".stripMargin,
    // same deletion list (events users ≡ 0 mod 97), same flag-join counts
    "q140_tombstone_purge" ->
      s"""WITH $ratingsCte,
         |del AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
         |ev AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_before,
         |    CAST(sum(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
         |    CAST(count(DISTINCT CASE WHEN d.user_id IS NOT NULL THEN e.user_id END) AS BIGINT)
         |      AS n_users_purged
         |  FROM events e LEFT JOIN del d ON e.user_id = d.user_id),
         |rt AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_before,
         |    CAST(sum(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
         |    CAST(count(DISTINCT CASE WHEN d.user_id IS NOT NULL THEN r.userId END) AS BIGINT)
         |      AS n_users_purged
         |  FROM ratings r LEFT JOIN del d ON r.userId = d.user_id)
         |SELECT 'events' AS table_name, n_before, n_purged,
         |  n_before - n_purged AS n_after, n_users_purged FROM ev
         |UNION ALL
         |SELECT 'ratings', n_before, n_purged, n_before - n_purged, n_users_purged FROM rt""".stripMargin,
    // chr(1)-joined null-sentineled row strings → md5-prefix row hash →
    // order-invariant sum, identical on both engines by construction
    "q139_table_checksum" ->
      s"""WITH rg AS (SELECT concat_ws(chr(1),
         |    COALESCE(CAST(r_regionkey AS VARCHAR), chr(0) || 'null'),
         |    COALESCE(r_name, chr(0) || 'null')) AS j FROM region),
         |nt AS (SELECT concat_ws(chr(1),
         |    COALESCE(CAST(n_nationkey AS VARCHAR), chr(0) || 'null'),
         |    COALESCE(n_name, chr(0) || 'null'),
         |    COALESCE(CAST(n_regionkey AS VARCHAR), chr(0) || 'null')) AS j FROM nation),
         |cu AS (SELECT concat_ws(chr(1),
         |    COALESCE(CAST(c_custkey AS VARCHAR), chr(0) || 'null'),
         |    COALESCE(c_name, chr(0) || 'null'),
         |    COALESCE(CAST(c_nationkey AS VARCHAR), chr(0) || 'null'),
         |    COALESCE(c_mktsegment, chr(0) || 'null')) AS j FROM customer)
         |SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(${md5Prefix32Sql("j")}) AS BIGINT) AS checksum FROM rg
         |UNION ALL
         |SELECT 'nation', CAST(count(*) AS BIGINT),
         |  CAST(sum(${md5Prefix32Sql("j")}) AS BIGINT) FROM nt
         |UNION ALL
         |SELECT 'customer', CAST(count(*) AS BIGINT),
         |  CAST(sum(${md5Prefix32Sql("j")}) AS BIGINT) FROM cu""".stripMargin,
    // HUGEINT OLS moments; slope_micro sign-adjusts DuckDB's floor //
    // to match Spark's truncating div (denominator ≥ 0 by Cauchy-Schwarz)
    "q144_volume_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(day_num AS HUGEINT)) AS sx,
        |    sum(CAST(cnt AS HUGEINT)) AS sy,
        |    sum(CAST(day_num AS HUGEINT) * CAST(cnt AS HUGEINT)) AS sxy,
        |    sum(CAST(day_num AS HUGEINT) * CAST(day_num AS HUGEINT)) AS sxx,
        |    sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS syy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  CAST(CASE WHEN n * sxy - sx * sy < 0
        |    THEN -((sx * sy - n * sxy) * 1000000 // (n * sxx - sx * sx))
        |    ELSE (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) END
        |    AS BIGINT) AS slope_micro,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
        |    / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE) AS r2
        |FROM m""".stripMargin,
    // mirrors the Spark expression order exactly (tot*row/grand, then
    // squared-residual ratios) so the doubles match bit-for-bit
    "q138_distribution_drift" ->
      """WITH d AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num
        |  FROM events),
        |mid AS (
        |  SELECT (min(day_num) + max(day_num) + 1) // 2 AS mid_day FROM d),
        |pt AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN day_num < mid_day THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
        |    CAST(sum(CASE WHEN day_num >= mid_day THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |  FROM d CROSS JOIN mid GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_early) AS BIGINT) AS tot_early,
        |    CAST(sum(n_late) AS BIGINT) AS tot_late FROM pt)
        |SELECT event_type, n_early, n_late,
        |  CAST(tot_early AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |    / CAST(tot_early + tot_late AS DOUBLE) AS exp_early,
        |  CAST(tot_late AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |    / CAST(tot_early + tot_late AS DOUBLE) AS exp_late,
        |  (CAST(n_early AS DOUBLE) - CAST(tot_early AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |      / CAST(tot_early + tot_late AS DOUBLE))
        |    * (CAST(n_early AS DOUBLE) - CAST(tot_early AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |      / CAST(tot_early + tot_late AS DOUBLE))
        |    / (CAST(tot_early AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |      / CAST(tot_early + tot_late AS DOUBLE))
        |  + (CAST(n_late AS DOUBLE) - CAST(tot_late AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |      / CAST(tot_early + tot_late AS DOUBLE))
        |    * (CAST(n_late AS DOUBLE) - CAST(tot_late AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |      / CAST(tot_early + tot_late AS DOUBLE))
        |    / (CAST(tot_late AS DOUBLE) * CAST(n_early + n_late AS DOUBLE)
        |      / CAST(tot_early + tot_late AS DOUBLE))
        |  AS chi2_contrib
        |FROM pt CROSS JOIN tot""".stripMargin,
    // per-column profile over the same typed views Spark aggregates;
    // min/max are typed first, stringified after, so numerics don't sort
    // lexicographically
    "q137_column_profile" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |  FROM orders)
        |SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_val,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM t
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM t
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM t
        |UNION ALL
        |SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |  CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR) FROM t
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM t""".stripMargin,
    // threshold quartiles: ×4 scale makes quantile_cont interpolation land
    // on integers, so the cuts match Spark percentile bit-for-bit and the
    // quartile predicates are exact comparisons on both engines
    "q121_rfm_segments" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |u AS (
        |  SELECT user_id, max(day_num) AS last_day,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM ev GROUP BY 1),
        |mx AS (SELECT max(day_num) AS corpus_max_day FROM ev),
        |r AS (
        |  SELECT u.*, mx.corpus_max_day - u.last_day AS recency_days
        |  FROM u CROSS JOIN mx),
        |c AS (
        |  SELECT
        |    quantile_cont(4 * recency_days, 0.25) AS r25,
        |    quantile_cont(4 * recency_days, 0.50) AS r50,
        |    quantile_cont(4 * recency_days, 0.75) AS r75,
        |    quantile_cont(4 * frequency, 0.25) AS f25,
        |    quantile_cont(4 * frequency, 0.50) AS f50,
        |    quantile_cont(4 * frequency, 0.75) AS f75,
        |    quantile_cont(4 * monetary_cents, 0.25) AS m25,
        |    quantile_cont(4 * monetary_cents, 0.50) AS m50,
        |    quantile_cont(4 * monetary_cents, 0.75) AS m75
        |  FROM r),
        |q AS (
        |  SELECT
        |    CAST(1 + CASE WHEN 4 * recency_days > r25 THEN 1 ELSE 0 END
        |           + CASE WHEN 4 * recency_days > r50 THEN 1 ELSE 0 END
        |           + CASE WHEN 4 * recency_days > r75 THEN 1 ELSE 0 END
        |      AS INTEGER) AS r_q,
        |    CAST(1 + CASE WHEN 4 * frequency < f75 THEN 1 ELSE 0 END
        |           + CASE WHEN 4 * frequency < f50 THEN 1 ELSE 0 END
        |           + CASE WHEN 4 * frequency < f25 THEN 1 ELSE 0 END
        |      AS INTEGER) AS f_q,
        |    CAST(1 + CASE WHEN 4 * monetary_cents < m75 THEN 1 ELSE 0 END
        |           + CASE WHEN 4 * monetary_cents < m50 THEN 1 ELSE 0 END
        |           + CASE WHEN 4 * monetary_cents < m25 THEN 1 ELSE 0 END
        |      AS INTEGER) AS m_q,
        |    monetary_cents
        |  FROM r CROSS JOIN c)
        |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
        |FROM q GROUP BY 1, 2, 3""".stripMargin,
    // doubled-scale medians land interpolation on integers, so
    // quantile_cont == Spark percentile bit-for-bit; outlier test integer
    "q119_mad_outliers" ->
      """WITH b AS (
        |  SELECT event_type, 2 * CAST(floor(value * 100) AS BIGINT) AS x2
        |  FROM events),
        |med AS (
        |  SELECT event_type, CAST(quantile_cont(x2, 0.5) AS BIGINT) AS med2
        |  FROM b GROUP BY 1),
        |dev AS (
        |  SELECT b.event_type, x2, med2, abs(x2 - med2) AS ad
        |  FROM b JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, CAST(quantile_cont(2 * ad, 0.5) AS BIGINT) AS mad2x
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |  CAST(max(d.med2) AS DOUBLE) / 200.0 AS median_value,
        |  CAST(max(m.mad2x) AS DOUBLE) / 400.0 AS mad_value,
        |  CAST(coalesce(sum(CASE WHEN 2 * d.ad > 3 * m.mad2x THEN 1 END), 0) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m USING (event_type) GROUP BY 1""".stripMargin,
    // same lead() gaps; Σdt² and (Σdt)² in DECIMAL(38,0) so the cv² flag
    // is an exact integer compare (q103 pattern); cv² NULL on zero span
    "q118_automation_signals" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |gaps AS (
        |  SELECT user_id,
        |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dt
        |  FROM ev),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(dt) AS BIGINT) AS sx,
        |    CAST(min(dt) AS BIGINT) AS min_gap_us,
        |    CAST(max(dt) AS BIGINT) AS max_gap_us,
        |    sum(CAST(dt AS DECIMAL(38,0)) * CAST(dt AS DECIMAL(38,0))) AS sxx
        |  FROM gaps WHERE dt IS NOT NULL GROUP BY 1 HAVING count(*) >= 5)
        |SELECT user_id, n_gaps, sx AS span_us, min_gap_us, max_gap_us,
        |  CAST(sx AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
        |  CASE WHEN sx <> 0 THEN
        |    CAST(CAST(n_gaps AS DECIMAL(38,0)) * sxx AS DOUBLE)
        |      / CAST(CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS DOUBLE)
        |      - 1.0 END AS cv2,
        |  n_gaps >= 10 AND
        |    CAST(25 AS DECIMAL(38,0)) * CAST(n_gaps AS DECIMAL(38,0)) * sxx <
        |    CAST(26 AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
        |    AS is_bot
        |FROM agg""".stripMargin,
    // same lead() hold intervals; sum(cents*dt) is an exact BIGINT on
    // both engines, one division returns original units
    "q114_time_weighted_avg" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CAST(floor(value * 100.0) AS BIGINT) AS cents
        |  FROM events),
        |held AS (
        |  SELECT user_id, cents,
        |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dt
        |  FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  CAST(CAST(sum(cents * dt) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(dt) AS BIGINT) * 100 AS DOUBLE) AS twa
        |FROM held GROUP BY 1""".stripMargin,
    // q93's bucket algebra on both sides; inner product per permutation
    // row via a (j, bucket) equi-join (zero cells contribute nothing)
    "q113_join_size_sketch" ->
      s"""WITH ca AS (
        |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h
        |  FROM events WHERE event_type = 'click'),
        |cb AS (
        |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h
        |  FROM events WHERE event_type = 'purchase'),
        |perm AS (SELECT unnest(range(0, 4)) AS j),
        |ba AS (
        |  SELECT j,
        |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
        |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
        |    count(*) AS c
        |  FROM ca CROSS JOIN perm GROUP BY 1, 2),
        |bb AS (
        |  SELECT j,
        |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
        |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
        |    count(*) AS c
        |  FROM cb CROSS JOIN perm GROUP BY 1, 2),
        |ip AS (
        |  SELECT ba.j, CAST(sum(ba.c * bb.c) AS BIGINT) AS s
        |  FROM ba JOIN bb ON ba.j = bb.j AND ba.b = bb.b GROUP BY 1),
        |est AS (SELECT min(s) AS est_join FROM ip),
        |ex AS (
        |  SELECT CAST(COALESCE(sum(x.c * y.c), 0) AS BIGINT) AS exact_join
        |  FROM (SELECT user_id, count(*) AS c FROM ca GROUP BY 1) x
        |  JOIN (SELECT user_id, count(*) AS c FROM cb GROUP BY 1) y USING (user_id)),
        |n AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ca) AS n_left,
        |         (SELECT CAST(count(*) AS BIGINT) FROM cb) AS n_right)
        |SELECT n_left, n_right, exact_join, est_join,
        |  est_join - exact_join AS overest
        |FROM n, ex, est""".stripMargin,
    // epoch-day integer keys; coalesce keeps all-returning days at 0 new
    "q112_user_reach" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num
        |  FROM events),
        |daily AS (
        |  SELECT day_num, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM ev GROUP BY 1),
        |firsts AS (
        |  SELECT user_id, min(day_num) AS first_day FROM ev GROUP BY 1),
        |news AS (
        |  SELECT first_day AS day_num, CAST(count(*) AS BIGINT) AS n_new
        |  FROM firsts GROUP BY 1)
        |SELECT d.day_num, d.n_active,
        |  COALESCE(n.n_new, 0) AS n_new,
        |  CAST(sum(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day_num) AS BIGINT) AS cum_reach
        |FROM daily d LEFT JOIN news n USING (day_num)""".stripMargin,
    // NOT EXISTS per relation as the anti-join twin; exact counts, one
    // division for the rate
    "q111_integrity_audit" ->
      """WITH audit(relation, n_child, n_orphans) AS (
        |  SELECT 'lineitem->orders',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'lineitem->part',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL SELECT 'lineitem->supplier',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL SELECT 'orders->customer',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'customer->nation',
        |    (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |    (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |     WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |  UNION ALL SELECT 'supplier->nation',
        |    (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |    (SELECT CAST(count(*) AS BIGINT) FROM supplier s
        |     WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)))
        |SELECT relation, n_child, n_orphans,
        |  CAST(n_child - n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE) AS match_pct
        |FROM audit""".stripMargin,
    // q104's blocked window, levenshtein verify (unit-cost DP on both
    // engines), integer threshold lev*100 <= max_len*20
    "q110_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, lower(trim(text)) AS norm FROM documents),
        |k AS (
        |  SELECT doc_id, norm, substring(norm, 1, 4) AS blk,
        |         substring(norm, 1, 16) AS sort_key FROM d),
        |w AS (
        |  SELECT doc_id, norm,
        |    lead(doc_id, 1) OVER win AS nb1, lead(norm, 1) OVER win AS nn1,
        |    lead(doc_id, 2) OVER win AS nb2, lead(norm, 2) OVER win AS nn2
        |  FROM k WINDOW win AS (PARTITION BY blk ORDER BY sort_key, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS a_id, nb1 AS b_id,
        |    CAST(levenshtein(norm, nn1) AS INTEGER) AS lev,
        |    CAST(greatest(length(norm), length(nn1)) AS INTEGER) AS max_len
        |  FROM w WHERE nb1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, nb2, CAST(levenshtein(norm, nn2) AS INTEGER),
        |    CAST(greatest(length(norm), length(nn2)) AS INTEGER)
        |  FROM w WHERE nb2 IS NOT NULL)
        |SELECT a_id, b_id, lev, max_len FROM pairs
        |WHERE lev * 100 <= max_len * 20""".stripMargin,
    // same integer bucket/threshold/edge algebra; the exact side is the
    // (n_chars, doc_id)-ordered row_number probe at rank t
    "q109_hist_quantiles" ->
      """WITH mm AS (
        |  SELECT source, min(n_chars) AS lo, max(n_chars) AS hi,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |hist AS (
        |  SELECT source, ((n_chars - lo) * 256) // (hi - lo + 1) AS b, count(*) AS c
        |  FROM documents JOIN mm USING (source) GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, b, sum(c) OVER (PARTITION BY source ORDER BY b) AS cm FROM hist),
        |th AS (
        |  SELECT source, lo, hi, n, p, (p * n + 99) // 100 AS t
        |  FROM mm, unnest([50, 90, 99]) AS u(p)),
        |est AS (
        |  SELECT th.source, th.p, th.lo, th.hi, min(cum.b) AS eb
        |  FROM th JOIN cum ON th.source = cum.source AND cum.cm >= th.t
        |  GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |ex AS (
        |  SELECT th.source, th.p, r.n_chars AS exact_v
        |  FROM th JOIN ranked r ON th.source = r.source AND r.rn = th.t)
        |SELECT e.source, e.p, ex.exact_v,
        |  e.lo + ((e.eb + 1) * (e.hi - e.lo + 1)) // 256 - 1 AS est_v,
        |  (e.lo + ((e.eb + 1) * (e.hi - e.lo + 1)) // 256 - 1) - ex.exact_v AS err
        |FROM est e JOIN ex USING (source, p)""".stripMargin,
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
    // q36's shingle CTEs, then rarest-first prefixes ((f, g) total order),
    // prefix self-join, and exact verify via list_intersect
    "q106_ppjoin" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
        |strsh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(0, len(t) - 2),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
        |  FROM toks WHERE len(t) >= 3),
        |d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(shingles, s -> ${md5Prefix32Sql("s")})) AS sh
        |  FROM strsh),
        |tok AS (SELECT doc_id, unnest(sh) AS g FROM d),
        |freq AS (SELECT g, count(*) AS f FROM tok GROUP BY 1),
        |ranked AS (
        |  SELECT doc_id, g,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY f, g) AS rn,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM tok JOIN freq USING (g)),
        |pref AS (SELECT doc_id, g FROM ranked WHERE rn <= n - (n + 1) // 2 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, inter, un,
        |  CAST(inter AS DOUBLE) / CAST(un AS DOUBLE) AS j
        |FROM (
        |  SELECT a_id, b_id,
        |    CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS inter,
        |    CAST(len(da.sh) + len(db.sh) AS BIGINT)
        |      - CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS un
        |  FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
        |WHERE 2 * inter >= un""".stripMargin,
    // same mask-doubling bit spread as ZOrder.spread16, one CTE per
    // ladder rung; // mirrors Spark's div, all BIGINT bit arithmetic
    "q105_zorder_profile" ->
      """WITH mm AS (
        |  SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
        |         min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
        |  FROM lineitem),
        |s AS (
        |  SELECT l_partkey AS x, l_suppkey AS y,
        |    CASE WHEN xmax > xmin
        |      THEN ((l_partkey - xmin) * 65535) // (xmax - xmin) ELSE 0 END AS x16,
        |    CASE WHEN ymax > ymin
        |      THEN ((l_suppkey - ymin) * 65535) // (ymax - ymin) ELSE 0 END AS y16
        |  FROM lineitem, mm),
        |a AS (SELECT x, y, ((x16 | (x16 << 8)) & 16711935) AS xa,
        |             ((y16 | (y16 << 8)) & 16711935) AS ya FROM s),
        |b AS (SELECT x, y, ((xa | (xa << 4)) & 252645135) AS xb,
        |             ((ya | (ya << 4)) & 252645135) AS yb FROM a),
        |c AS (SELECT x, y, ((xb | (xb << 2)) & 858993459) AS xc,
        |             ((yb | (yb << 2)) & 858993459) AS yc FROM b),
        |d AS (SELECT x, y, (((xc | (xc << 1)) & 1431655765)
        |             | ((((yc | (yc << 1)) & 1431655765)) << 1)) AS z FROM c)
        |SELECT z // 67108864 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        |FROM d GROUP BY 1""".stripMargin,
    // same blocked window via WINDOW ... PARTITION BY; list_intersect on
    // distinct tokens mirrors array_intersect; len() cast to Spark's INT
    "q104_sorted_neighborhood" ->
      """WITH d AS (
        |  SELECT doc_id, lower(trim(text)) AS norm FROM documents),
        |k AS (
        |  SELECT doc_id, substring(norm, 1, 4) AS blk,
        |    substring(norm, 1, 16) AS sort_key,
        |    list_distinct(string_split_regex(norm, '\s+')) AS toks
        |  FROM d),
        |w AS (
        |  SELECT doc_id, toks,
        |    lead(doc_id, 1) OVER win AS nb1, lead(toks, 1) OVER win AS nt1,
        |    lead(doc_id, 2) OVER win AS nb2, lead(toks, 2) OVER win AS nt2
        |  FROM k WINDOW win AS (PARTITION BY blk ORDER BY sort_key, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS a_id, nb1 AS b_id,
        |    CAST(len(list_intersect(toks, nt1)) AS INTEGER) AS inter,
        |    CAST(len(toks) + len(nt1) - len(list_intersect(toks, nt1)) AS INTEGER) AS un
        |  FROM w WHERE nb1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, nb2,
        |    CAST(len(list_intersect(toks, nt2)) AS INTEGER),
        |    CAST(len(toks) + len(nt2) - len(list_intersect(toks, nt2)) AS INTEGER)
        |  FROM w WHERE nb2 IS NOT NULL)
        |SELECT a_id, b_id, inter, un,
        |  CAST(inter AS DOUBLE) / CAST(un AS DOUBLE) AS j
        |FROM pairs WHERE 2 * inter >= un""".stripMargin,
    // same cleared-denominator integer z-test; epoch-day via integer
    // division, squared comparison in DECIMAL(38,0) on both engines
    "q103_volume_anomalies" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(cnt) AS BIGINT) AS s,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS q
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day_num, d.cnt,
        |  st.n_days * d.cnt - st.s AS dev,
        |  CAST(st.n_days * d.cnt - st.s AS DECIMAL(38,0))
        |      * CAST(st.n_days * d.cnt - st.s AS DECIMAL(38,0))
        |    > CAST(4 AS DECIMAL(38,0))
        |      * (CAST(st.n_days AS DECIMAL(38,0)) * CAST(st.q AS DECIMAL(38,0))
        |         - CAST(st.s AS DECIMAL(38,0)) * CAST(st.s AS DECIMAL(38,0)))
        |    AS is_spike
        |FROM daily d JOIN stats st USING (event_type)""".stripMargin,
    // same user-keyed equi-join + range filter; gap in exact integer
    // microseconds (epoch_us <-> unix_micros) so no float arithmetic
    "q101_interval_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events)
        |SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        |FROM ev c JOIN ev v ON c.user_id = v.user_id
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |  AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 30 MINUTE""".stripMargin,
    // running last-click window with the same (ts, event_id) total order;
    // IGNORE NULLS last_value is the as-of state carrier on both engines
    "q97_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |tagged AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_click_ts
        |  FROM ev)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  attr_click_id AS click_id, attr_click_ts AS click_ts,
        |  CAST((epoch_us(ts) - epoch_us(attr_click_ts)) // 1000000 AS BIGINT) AS latency_s,
        |  ((epoch_us(ts) - epoch_us(attr_click_ts)) // 1000000 IS NOT NULL
        |    AND (epoch_us(ts) - epoch_us(attr_click_ts)) // 1000000 <= 1800) AS within_30m
        |FROM tagged WHERE event_type = 'purchase'""".stripMargin,
    // collocation lift: exact integer products, one double division each
    "q95_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |uni AS (SELECT unnest(t) AS term FROM toks),
        |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uc),
        |bg AS (
        |  SELECT unnest(list_transform(range(0, len(t) - 1),
        |    i -> t[i+1] || ' ' || t[i+2])) AS bigram
        |  FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT bigram, count(*) AS c_xy FROM bg GROUP BY 1 HAVING count(*) >= 5),
        |sp AS (
        |  SELECT bigram, c_xy,
        |    string_split(bigram, ' ')[1] AS t1, string_split(bigram, ' ')[2] AS t2
        |  FROM bc),
        |j AS (
        |  SELECT sp.bigram, sp.c_xy, u1.c AS c1, u2.c AS c2,
        |    CAST(sp.c_xy * tot.n_total AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
        |  FROM sp JOIN uc u1 ON sp.t1 = u1.term JOIN uc u2 ON sp.t2 = u2.term CROSS JOIN tot)
        |SELECT bigram, c_xy, c1, c2, lift FROM j
        |ORDER BY lift DESC, bigram LIMIT 50""".stripMargin,
    // z-scores from exact integer sums: Var = (n*ss - s*s) / n^2, one
    // division + one sqrt -> bit-identical doubles on both engines
    "q99_zscore_norm" ->
      """WITH st AS (
        |  SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS s,
        |         CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  (CAST(d.n_chars AS DOUBLE) - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
        |    / sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE)
        |      / CAST(st.n * st.n AS DOUBLE)) AS z
        |FROM documents d JOIN st USING (source)""".stripMargin,
  )

  /** DuckDB twin of [[graft.operators.Similarity.bruteForceTopK]] over the
    * q37 query subset — shared by the q37 oracle and the q83 recall oracle.
    */
  private def bruteTopkOracle: String =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0),
       |scored AS (
       |  SELECT q_id, e.vec_id, ${cosineSql("q_emb", "e.embedding")} AS sim
       |  FROM q CROSS JOIN embeddings e WHERE q_id <> e.vec_id)
       |SELECT q_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** DuckDB twin of [[graft.operators.Similarity.ivfTopK]] (stride-37
    * centroids, nprobe 4) — shared by the q41 oracle and the q83 recall
    * oracle.
    */
  private def ivfTopkOracle: String = ivfTopkOracleN(4)

  private def ivfTopkOracleN(nprobe: Int): String =
    s"""WITH cents AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id % 37 = 0),
       |assign AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM embeddings e CROSS JOIN cents c)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0),
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
  private def corrMatrixOracle: String = {
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
  private def md5Prefix32Sql(e: String): String =
    s"CAST(list_sum(list_transform(range(0, 8), hx -> " +
      s"CAST(strpos('0123456789abcdef', substring(md5($e), CAST(hx + 1 AS INTEGER), 1)) - 1 AS BIGINT)" +
      s" * CAST(16 ** (7 - hx) AS BIGINT))) AS BIGINT)"

  /** DuckDB twin of [[TextAnalysis.qualityScore]] — shared by q34 and the
    * q80 curriculum cuts layered on top of it.
    */
  private def qualityScoreOracle: String =
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
  private def minhashCtes: String =
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
  private def minhashOracle: String =
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
  private def itemCfChainFrom(rDef: String): String =
    s"""$rDef,
       |norms AS (
       |  SELECT productId, CAST(sum(rv * rv) AS BIGINT) AS s2 FROM r GROUP BY 1),
       |pairs AS (
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

  private def itemCfCtes: String = itemCfChainFrom(
    s"""$ratingsCte,
       |r AS (
       |  SELECT userId, productId, CAST(max(rating) AS BIGINT) AS rv
       |  FROM ratings GROUP BY 1, 2)""".stripMargin)

  /** DuckDB twin of [[graft.operators.Dedup.ngramJaccardPairs]] — shared by
    * the q36 oracle and the q85 LSH-quality oracle (where it is the exact
    * truth side).
    */
  private def ngramJaccardOracle: String =
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
  private def incrementalNearDupOracle: String =
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
  private def contaminationOracle: String =
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
  private def nearDupClustersOracle: String =
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
  private def simhashOracle: String = {
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
  private def mmrOracle(k: Int): String = {
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
  private def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($x) + 1), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  // ---------------------------------------------------------------------------
  // Oracle SQL shared fragments (ANSI twins of the Spark builders above)
  // ---------------------------------------------------------------------------

  /** ANSI-SQL twin of [[Tables.ratings]] — keep in lockstep. */
  private val ratingsCte: String =
    """ratings AS (
      |  SELECT o_custkey AS userId, l_partkey AS productId,
      |         CAST(CAST(FLOOR(l_quantity) AS BIGINT) % 5 + 1 AS DOUBLE) AS rating
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** ANSI-SQL twin of [[good]] (distinct good ratings). */
  private val goodCte: String =
    """good AS (
      |  SELECT DISTINCT userId, productId FROM ratings
      |  WHERE rating > 3.0 AND userId < 1000
      |)""".stripMargin

  private val pairsCte: String =
    """pairs AS (
      |  SELECT DISTINCT a.userId AS src, b.userId AS dst
      |  FROM good a JOIN good b
      |    ON a.productId = b.productId AND a.userId < b.userId
      |)""".stripMargin

  private val edgesCte: String =
    """edges AS (
      |  SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
      |)""".stripMargin

  /** Unrolled synchronous BFS (`rounds` fixed supersteps) as a
    * non-recursive CTE chain — the SQL twin of
    * [[graft.plans.GraphOps.bfsLayers]]. Ends with CTE `v<rounds>`
    * holding (id, layer). MATERIALIZED for the kCoreCtes reason.
    */
  private def bfsCtes(rounds: Int): String =
    bfsCtesFrom("v", "SELECT min(src) AS id, 0 AS layer FROM edges", rounds)

  /** [[bfsCtes]] parameterized on the CTE prefix and the seed SELECT —
    * so q276's double sweep can run two independent chains ("v", "w").
    */
  private def bfsCtesFrom(p: String, seedSql: String, rounds: Int): String = {
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
  private def kCoreCtes(k: Int, rounds: Int): String = {
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
  private def kTrussCtes(k: Int, rounds: Int): String = {
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
  private def lpCtes(iters: Int): String = {
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
  private def pageRankCtes(iters: Int): String = {
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
  private val NdcgWeightsSqlList: String =
    operators.NdcgWeights.micro.take(5).mkString("[", ", ", "]")
  private val NdcgPrefixSqlList: String =
    operators.NdcgWeights.prefix.take(5).mkString("[", ", ", "]")

  /** Unrolled Luby-MIS rounds (q270) over the symmetric `edges` CTE —
    * same packed pk = md5·2³¹+id priorities, same strict neighbor-max
    * winner rule, same winner/neighbor removal per round. MATERIALIZED
    * is load-bearing (the kCoreCtes reason): each round references its
    * predecessor 4×, and inlined CTEs would re-evaluate exponentially.
    */
  private def lubyCtes(rounds: Int): String = {
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
  private def personalizedPageRankCtes(iters: Int): String = {
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

  private def graphPrefix: String =
    s"WITH $ratingsCte,\n$goodCte,\n$pairsCte,\n$edgesCte,\n${lpCtes(5)}"

  /** ANSI twin of [[Reco.recommendations]] over `l5` + `good` (community-
    * product rewrite — see the algebra note in Reco.recommendations).
    */
  private val recsCtes: String =
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
