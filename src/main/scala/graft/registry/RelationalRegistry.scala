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

/** Registry: relational / SQL-analytics / governance queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object RelationalRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // 2-D Pareto skyline over orders (price x recency), grid-pruned so
    // the exact sort-scan window never sees more than ~|skyline| points
    "q159_skyline" -> ((s, dir) =>
      Relational.skyline(Tables.orders(s, dir))),
    // epsilon-DP count release via the geometric mechanism — integer
    // inverse-CDF noise, bit-identical on both engines
    "q161_dp_release" -> ((s, dir) =>
      Relational.dpNoisedCounts(Tables.events(s, dir))),
    // Benford first-digit audit on order totals — observed vs expected
    // shares in exact parts-per-billion, shared-literal expectation
    "q163_benford" -> ((s, dir) =>
      Relational.benfordAudit(Tables.orders(s, dir))),
    // chi-square independence audit (type x weekday): exact integer
    // deviations, 3-sigma integer flag, per-cell contribution
    "q171_independence" -> ((s, dir) =>
      Relational.independenceAudit(Tables.events(s, dir))),
    // Poisson-bootstrap CI on per-type mean value: hash-seeded replica
    // multiplicities, exact integer replica means, ranked interval picks
    "q177_bootstrap_ci" -> ((s, dir) =>
      Relational.bootstrapCI(Tables.events(s, dir))),
    // pairwise correlation matrix from one exact-moment pass — the
    // feature screen built-in corr can't hash-match
    "q179_corr_matrix" -> ((s, dir) =>
      Relational.corrMatrix(Tables.lineitem(s, dir))),
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
    // TPC-H Q17 shape: correlated avg-quantity subquery decorrelated to
    // a broadcast brand-stats join; exact integer threshold compare
    "q192_small_qty_revenue" -> ((s, dir) =>
      Relational.smallQuantityRevenue(Tables.part(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q21 shape: the EXISTS/NOT-EXISTS pair collapsed into one
    // per-order window pass; per-supplier waiting-order counts, top-20
    "q193_waiting_suppliers" -> ((s, dir) =>
      Relational.waitingSuppliers(Tables.supplier(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
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
    // exact Mann-Whitney U (doubled midranks) per source vs rest — the
    // rank-based drift test beside q172's KS, same count grid
    "q236_mann_whitney" -> ((s, dir) =>
      Relational.mannWhitneyDrift(Tables.documents(s, dir))),
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
    // TPC-H Q7 shape: two-nation trade volume per ship-year, both dims
    // broadcast before the fact-fact join
    "q247_nation_trade" -> ((s, dir) =>
      Relational.nationTrade(Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // TPC-H Q15 shape: quarter revenue per supplier, max re-joined so
    // ties all surface — exact e4 keeps the tie compare exact
    "q248_top_supplier" -> ((s, dir) =>
      Relational.topSupplier(Tables.supplier(s, dir), Tables.lineitem(s, dir))),
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
    // TPC-H refresh-function IVM proof: old - deletes + inserts vs the
    // direct recompute, additive aggregates make it exact
    "q263_incremental_revenue" -> ((s, dir) =>
      Relational.incrementalRevenue(Tables.lineitem(s, dir))),
    // lakehouse snapshot diff: one keyed full outer join over md5
    // payload checksums -> added/removed/changed/unchanged
    "q264_snapshot_diff" -> ((s, dir) =>
      Relational.snapshotDiff(Tables.orders(s, dir))),
    // CDC MERGE apply: one full outer join for I/U/D semantics, graded
    // by the order-invariant state checksum
    "q277_cdc_apply" -> ((s, dir) =>
      Relational.cdcApply(Tables.orders(s, dir))),
    // ranking-family ties report: row_number/rank/dense_rank/exact-ppm
    // percent_rank pinned over the same tie-prone order
    "q278_rank_family" -> ((s, dir) =>
      Relational.rankFamily(Tables.customer(s, dir))),
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
    // difference-in-differences across the cutover day, control arm
    // netting out common shocks — exact micro-rate cells
    "q221_diff_in_diff" -> ((s, dir) =>
      Relational.diffInDiff(Tables.events(s, dir))),
    // rank-sum (Mann-Whitney) AUC of item popularity predicting a good
    // rating — exact tie-aware pair counting over the score histogram
    "q208_auc_popularity" -> ((s, dir) => {
      val r = EntryHelpers.ratingsDf(s, dir)
      val pop = r.groupBy(col("productId"))
        .agg(count(lit(1)).as("score"))
      Relational.aucRankSum(
        r.join(pop, "productId")
          .select(col("score"), (col("rating") > 3.0).as("is_pos")))
    }),
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
    // range-partition planner: 8 equal-frequency n_chars ranges from one
    // exact scaled percentile aggregate + the achieved balance report
    "q156_range_boundaries" -> ((s, dir) =>
      Relational.rangeBoundaries(
        Tables.documents(s, dir).select(col("n_chars")), "n_chars")),
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
    // snapshot drift monitor: chi-square event-type mix shift between the
    // two halves of the day range (exact integer counts, tiny pivot)
    "q138_distribution_drift" -> ((s, dir) =>
      Relational.distributionDrift(Tables.events(s, dir))),
    // governance: right-to-be-forgotten purge audit — broadcast the
    // deletion list, flag-join each fact table, one conditional aggregate
    "q140_tombstone_purge" -> ((s, dir) => {
      val del = Tables.events(s, dir).where(col("user_id") % 97 === 0)
        .select("user_id").distinct()
      Relational.tombstonePurge(Seq(
        ("events", Tables.events(s, dir), "user_id"),
        ("ratings", EntryHelpers.ratingsDf(s, dir), "userId")), del)
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
  )

  def oracles: Map[String, String] = Map(
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
    // same per-cent histogram + 25-cent range window — the count-without-
    // enumeration form (5.1e9 pairs at sf1.0 made the pair join a
    // scale-killer on BOTH engines); integer cents pin the boundary
    "q47_range_join" ->
      """WITH hist AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT c, CAST(sum(cnt) OVER (ORDER BY c
        |    RANGE BETWEEN 25 PRECEDING AND 25 FOLLOWING) AS BIGINT) AS w
        |  FROM hist)
        |SELECT e.event_id, t.w - 1 AS n_neighbors
        |FROM events e JOIN tot t
        |  ON CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) = t.c""".stripMargin,
    "q24_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS exact_users,
        |  true AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,
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
    "q56_approx_percentile" ->
      """SELECT source, count(*) AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50_exact,
        |  true AS approx_ok
        |FROM documents GROUP BY source""".stripMargin,
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
    // same cents scaling, same HUGEINT moments, same per-pair
    // multiply/sqrt/divide order
    "q179_corr_matrix" -> corrMatrixOracle,
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
        |  CAST(sum(CAST(i AS HUGEINT) * x) // 1073741824 AS BIGINT)
        |    AS weighted_sum_shr30,
        |  CAST((CAST(2 AS HUGEINT) * sum(CAST(i AS HUGEINT) * x)
        |      - (CAST(count(*) AS HUGEINT) + 1) * CAST(sum(x) AS HUGEINT))
        |    * 1000000
        |    // (CAST(count(*) AS HUGEINT) * CAST(sum(x) AS HUGEINT))
        |    AS BIGINT) AS gini_ppm
        |FROM idx""".stripMargin,
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
  )
}
