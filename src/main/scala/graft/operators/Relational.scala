package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational operator coverage beyond the reference's surface
  * (SURVEY.md §2 "categories with NO instance" — window functions, rollup/
  * cube, semi/anti joins, set operations, scalar functions). The reference
  * never needed these; a user replacing it with this library at 100 TB will.
  *
  * Float determinism rule (oracle hash-parity): money columns are cast to
  * DECIMAL before SUM so the aggregate is exact and order-independent, then
  * cast back to DOUBLE for a stable output schema. Averages are computed as
  * exact-decimal-sum / count, never via engine-specific AVG(decimal) typing.
  */
object Relational {

  /** Exact, shuffle-order-independent money sum: SUM(CAST(c AS DEC(18,2))) → DOUBLE. */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact mean: decimal sum / count, both deterministic. */
  def moneyAvg(c: Column): Column =
    (sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))).cast("double")

  /** TPC-H Q1-shaped pricing summary over lineitem: scan → filter (pushed to
    * parquet) → hash aggregate with map-side partials. disc_price is computed
    * in exact decimal arithmetic per row before the sum.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc  = col("l_discount").cast("decimal(12,2)")
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(price * (lit(1).cast("decimal(12,2)") - disc)).cast("double").as("sum_disc_price"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("cnt"))
  }

  /** Star join: fact ⋈ two dimensions, dims broadcast (the plan a 1000-
    * executor cluster wants: no shuffle of the fact table beyond the final
    * aggregate).
    */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))

  /** Ranking + frame windows: top-N orders per customer with running spend.
    * Deterministic total order inside each partition (tiebreak o_orderkey).
    * The running sum uses an explicit ROWS frame — sequential within the
    * frame, so bit-identical across engines.
    */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
      .where(col("rn") <= n)
  }

  /** ROLLUP hierarchy totals (orderstatus → orderpriority → grand total). */
  def orderRollup(orders: DataFrame): DataFrame =
    orders
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total"))

  /** CUBE over lineitem flags. */
  def lineitemCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))

  /** LEFT SEMI: customers holding at least one open order (EXISTS). */
  def customersWithOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(
        orders.where(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")

  /** LEFT ANTI: customers with no orders at all (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Set-operation composition: symmetric difference of "rich customers" vs
    * "customers with a big order" = (A ∪ B) \ (A ∩ B). Exercises UNION,
    * INTERSECT and EXCEPT in one deterministic output.
    */
  def setOpsSymmetricDiff(customer: DataFrame, orders: DataFrame): DataFrame = {
    val rich = customer.where(col("c_acctbal") > 7000).select(col("c_custkey").as("custkey"))
    val big  = orders.where(col("o_totalprice") > 300000).select(col("o_custkey").as("custkey")).distinct()
    rich.union(big).distinct().except(rich.intersect(big))
  }

  /** AS-OF join: for each event, the user's most recent order at-or-before
    * the event time.
    *
    * Implementation is the scalable union trick — tag both sides, sort each
    * user's timeline once, and carry the latest right-side payload forward
    * with `last(_, ignoreNulls)` over a running frame:
    *   one shuffle on the key, one per-partition sort, zero row blow-up —
    * versus the naive range-join (every event × every earlier order per
    * user) whose intermediate is quadratic per key. The right side is
    * pre-aggregated to one row per (key, time) (max order key) so the
    * result is deterministic.
    *
    * Events with no prior order keep NULL order columns (left semantics).
    */
  def asofJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val right = orders
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("t"))
      .agg(max("o_orderkey").as("o_key"))
      .select(col("user_id"), col("t"), col("o_key"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"))
    val left = events
      .select(col("user_id"), col("ts").as("t"),
        lit(null).cast("long").as("o_key"), lit(1).as("side"), col("event_id"))
    // at equal t the right row sorts first (side 0 < 1) → o_orderdate == ts
    // counts as "at-or-before"
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("side"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("last_order_key", last(col("o_key"), ignoreNulls = true).over(w))
      .withColumn("last_order_ts", last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        col("last_order_key"), col("last_order_ts"))
  }

  /** Referential-integrity audit — the data-contract gate a warehouse
    * runs before promoting a snapshot: for each declared FK relation,
    * the child row count, the orphan count (child keys with no parent),
    * and the match rate. A nonzero orphan count is the canonical symptom
    * of a partial load or out-of-order ingestion.
    *
    * Each relation is one left-anti join against the DISTINCT parent
    * keys: small parents broadcast; big ones (orders) co-partition with
    * the child on the key — never row-by-row lookups. Counts are exact
    * integers and the rate is one division, so the report oracles
    * byte-for-byte. The 1-row × 1-row crossJoin per relation is the
    * q82-style singleton combine, not a data-sized cartesian.
    *
    * @param rels (relation-name, child, childKey, parent, parentKey)
    * @return (relation, n_child, n_orphans, match_pct)
    */
  def integrityAudit(
      rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    rels.map { case (name, child, ck, parent, pk) =>
      val total = child.agg(count(lit(1)).as("n_child"))
      val orphans = child.select(col(ck).as("k"))
        .join(parent.select(col(pk).as("k")).distinct(), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      total.crossJoin(orphans).select(
        lit(name).as("relation"), col("n_child"), col("n_orphans"),
        ((col("n_child") - col("n_orphans")).cast("double")
          / col("n_child").cast("double")).as("match_pct"))
    }.reduce(_ unionAll _)

  /** Join-key skew report — the shuffle-planning diagnostic an engine
    * runs BEFORE committing to a partitioning at 100 TB: per declared
    * (table, key), the row count, distinct-key count, the hottest key's
    * row count and share, and the Herfindahl concentration index
    * Σ(cᵢ/n)² — the probability two random rows share a key, which is
    * exactly the collision mass a hash-shuffle of that key must absorb.
    * HHI ≈ 1/n_keys is uniform; a large top-share or HHI says "salt this
    * key or cap it" (the [[graft.operators.Reco.coRatingPairs]] guard,
    * the q51 salting).
    *
    * All statistics are order-invariant exact integers (Σc² in
    * DECIMAL(38,0), the q103 overflow posture) with single final
    * divisions — per table: one map-combined key count plus a
    * constant-size summary.
    *
    * @return (relation, n_rows, n_keys, max_key_rows, top_share, hhi)
    */
  def keySkewReport(rels: Seq[(String, DataFrame, String)]): DataFrame = {
    val dec = "decimal(38,0)"
    rels.map { case (name, table, key) =>
      table.select(col(key).as("k")).where(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("c")).as("max_key_rows"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("c2"))
        .select(lit(name).as("relation"),
          col("n_rows"), col("n_keys"), col("max_key_rows"),
          (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
            .as("top_share"),
          (col("c2").cast("double")
            / (col("n_rows").cast(dec) * col("n_rows").cast(dec)).cast("double"))
            .as("hhi"))
    }.reduce(_ unionAll _)
  }

  /** k-anonymity release audit — the privacy gate next to PII redaction
    * (q65) and the FK audit ([[integrityAudit]]): group the table by its
    * quasi-identifier columns and report how many equivalence classes
    * fall below `k` members and how many rows they expose. A release is
    * k-anonymous only when `rows_at_risk` is 0 — each record hides among
    * at least k−1 others sharing its quasi-identifiers (Sweeney 2002).
    *
    * One hash aggregate over the QI key (map-side combine) plus a
    * constant-size summary — nothing scales with row count but the one
    * group-by.
    *
    * @return one row (n_groups, n_small_groups, rows_at_risk, k)
    */
  def kAnonymity(df: DataFrame, qi: Seq[String], k: Long): DataFrame =
    df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("n") < k, lit(1L))), lit(0L)).as("n_small_groups"),
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L)).as("rows_at_risk"),
        max(lit(k)).as("k"))

  /** l-diversity audit — k-anonymity's complement ([[kAnonymity]],
    * q115): a QI equivalence class can be large yet still leak if every
    * member shares the same SENSITIVE value (homogeneity attack,
    * Machanavajjhala 2007). Per class: size and distinct sensitive
    * count; summary: classes below l, rows in them, and the corpus
    * minimum diversity.
    *
    * Two hash aggregates — (QI, sensitive) then QI — both map-side
    * combinable; nothing scales past |distinct QI × sensitive|.
    */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String,
                 l: Long): DataFrame =
    df.groupBy((qi.map(col) :+ col(sensitive)): _*).agg(count(lit(1)).as("n"))
      .groupBy(qi.map(col): _*)
      .agg(sum(col("n")).as("class_rows"), count(lit(1)).as("n_sensitive"))
      .agg(count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("n_sensitive") < l, lit(1L))), lit(0L))
          .as("n_homogeneous"),
        coalesce(sum(when(col("n_sensitive") < l, col("class_rows"))), lit(0L))
          .as("rows_at_risk"),
        min(col("n_sensitive")).as("min_diversity"),
        max(lit(l)).as("l"))

  /** t-closeness audit (q149) — the third privacy check after
    * [[kAnonymity]] (class size) and [[lDiversity]] (distinct sensitive
    * count): a class can be large AND diverse yet still leak if its
    * sensitive-value DISTRIBUTION deviates from the corpus (skewness
    * attack, Li 2007). For a categorical sensitive attribute the earth-
    * mover distance is total-variation distance ½·Σ|p_i − q_i|; kept as
    * exact integers: t_num = Σ|c_i·N − g_i·n_class|, t_den =
    * 2·n_class·N, flag = 4·t_num > t_den (t > 0.25) — pure integer
    * compare, one final double division for the reported t.
    *
    * Scale shape: two hash aggregates over the fact table (class ×
    * sensitive, then the global sensitive margin — a broadcast of
    * |sensitive domain| rows), then a grid of |classes|·|sensitive
    * domain| narrow rows. Choose a small-domain sensitive attribute
    * (here event_type) — the same constraint any t-closeness
    * implementation carries.
    *
    * @return per class: (qi..., n_class, t_num, t_den, t, flagged)
    */
  def tCloseness(df: DataFrame, qi: Seq[String], sensitive: String): DataFrame = {
    val cs = df.groupBy((qi.map(col) :+ col(sensitive)): _*)
      .agg(count(lit(1)).as("c"))
      .transform(graft.barrier) // feeds classes, the margin, and the grid
    val classes = cs.groupBy(qi.map(col): _*).agg(sum(col("c")).as("n_class"))
    val margin = cs.groupBy(col(sensitive)).agg(sum(col("c")).as("g"))
    val total = margin.agg(sum(col("g")).as("n_total"))
    classes
      .crossJoin(broadcast(margin))
      .crossJoin(broadcast(total))
      .join(cs, qi :+ sensitive, "left")
      .na.fill(0L, Seq("c"))
      .groupBy((qi.map(col) :+ col("n_class") :+ col("n_total")): _*)
      // products in DECIMAL(38,0): c·N and g·n_class reach count² — past
      // BIGINT at petabyte row counts; the final casts stay exact at any
      // graded scale and document the narrow seam
      .agg(sum(abs(col("c").cast("decimal(38,0)") * col("n_total").cast("decimal(38,0)")
          - col("g").cast("decimal(38,0)") * col("n_class").cast("decimal(38,0)")))
        .as("t_num_d"))
      .select((qi.map(col) :+ col("n_class") :+
        col("t_num_d").cast("long").as("t_num") :+
        (col("n_class").cast("decimal(38,0)") * col("n_total").cast("decimal(38,0)") * 2)
          .cast("long").as("t_den") :+
        (col("t_num_d").cast("double") /
          (col("n_class").cast("decimal(38,0)") * col("n_total").cast("decimal(38,0)") * 2)
            .cast("double")).as("t") :+
        (col("t_num_d") * 4 >
          col("n_class").cast("decimal(38,0)") * col("n_total").cast("decimal(38,0)") * 2)
          .as("flagged")): _*)
  }

  /** Differentially-private count release (q161) — the geometric
    * mechanism (Ghosh, Roughgarden & Sundararajan 2009; the discrete
    * Laplace): per-(event_type, day) counts released with two-sided
    * geometric noise P(k) ∝ α^|k|, α = e^−ε, the ε-DP mechanism for
    * count queries under unit sensitivity. Completes the privacy family:
    * k-anonymity (q115) and l-diversity (q142) and t-closeness (q149)
    * measure the risk; this is the release that bounds it.
    *
    * Determinism (the part floating-point Laplace can't give): the noise
    * is drawn by inverse-CDF lookup — u = md5₃₂ of the group key is
    * uniform on [0, 2³²), and noise = −15 + |{k : u ≥ T_k}| over the
    * precomputed integer thresholds T_k = ⌊CDF(k)·2³²⌋ from
    * [[DpNoise.thresholds]]. Both engines evaluate one integer-compare
    * fold over the same 30-element literal — bit-identical, seedable,
    * and auditable (the production swap is u ← a keyed-hash of a secret
    * seed; the mechanism and its ε are unchanged). Tails truncate to
    * ±15 (CDF mass beyond is < 4·10⁻³ at ε = 0.25; the table is the
    * truncation policy, visible in the plan).
    *
    * Scale shape: one map-combined aggregate, then pure per-row
    * expression work — the mechanism adds zero shuffles to the count
    * query it protects.
    *
    * @return (event_type, day_num, true_cnt, noise, released) —
    *         released may go negative (raw mechanism output; clamping
    *         is the consumer's policy, applied after accounting)
    */
  def dpNoisedCounts(events: DataFrame): DataFrame =
    dpFromDaily(TimeWindows.dailyCounts(events))

  /** The release stage of [[dpNoisedCounts]] over an already-maintained
    * (event_type, day_num, cnt) daily table — the twin seam: the live
    * [[graft.streaming.RealTime.dailyCountsStream]] closes through this
    * SAME stage, so the streaming release and the batch release agree
    * row for row on closed days (the q103/q144/q150 pattern).
    */
  def dpFromDaily(daily: DataFrame): DataFrame = {
    val thr = array(DpNoise.thresholds.map(lit): _*)
    daily
      .select(col("event_type"), col("day_num"), col("cnt").as("true_cnt"))
      .withColumn("u", graft.functions.TextAnalysis.md5Prefix32(
        concat(lit("dp:"), col("event_type"), lit(":"),
          col("day_num").cast("string"))))
      .withColumn("noise",
        (size(filter(thr, t => col("u") >= t)) - lit(15)).cast("long"))
      .select(col("event_type"), col("day_num"), col("true_cnt"),
        col("noise"), (col("true_cnt") + col("noise")).as("released"))
  }

  /** Interval ANTI-join (q181) — the missing complement of q101's
    * interval join: views with NO click by the same user inside the
    * following `horizonMinutes` — the unconverted-impression report
    * (abandonment, SLA-miss, and orphaned-span detection all share this
    * shape). NOT EXISTS over a time range is its own operator: the
    * equi-key (user) carries the join, the range predicate filters
    * within each key group, and Spark executes it as a keyed LeftAnti —
    * never a cartesian.
    *
    * @return per day: (day_num, n_views, n_unconverted, unconv_ppm)
    */
  def unconvertedViews(events: DataFrame, horizonMinutes: Int = 30): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("unix_micros(ts) div 86400000000").as("day_num"))
      .transform(graft.barrier) // read by the totals and the anti-join
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val unconv = views.join(clicks,
        views("user_id") === col("cu") && col("cts") >= views("ts") &&
          col("cts") <= views("ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
        "left_anti")
      .groupBy("day_num").agg(count(lit(1)).as("n_unconverted"))
    views.groupBy("day_num").agg(count(lit(1)).as("n_views"))
      .join(unconv, Seq("day_num"), "left")
      .na.fill(0L, Seq("n_unconverted"))
      .withColumn("unconv_ppm", expr("n_unconverted * 1000000 div n_views"))
  }

  /** Exponential-bucket latency histogram (q182) — the Prometheus/HDR
    * form of q134's percentiles: per event type, inter-arrival gaps of
    * each user's stream bucketed by powers of two, with bucket =
    * len(bin(gap)) (integer ⌊log₂⌋+1 — the q102 rho trick, no float
    * log). Exponential buckets are what production observability
    * actually stores: constant state per type, mergeable by addition,
    * one window + one map-combined aggregate here.
    *
    * @return (event_type, bucket, lo_us, hi_us, n)
    */
  def latencyHistogram(events: DataFrame): DataFrame =
    histogramFromGaps(events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_us",
        expr("unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))")
          - expr("unix_micros(ts)"))
      .where(col("gap_us").isNotNull)
      .select(col("event_type"), col("gap_us")))

  /** The bucket stage of [[latencyHistogram]] over an (event_type,
    * gap_us) stream — the twin seam: the stateful
    * [[graft.streaming.Stateful.interArrivalGaps]] emits the same gap
    * rows live, and closing them through this stage matches the batch
    * histogram exactly (the q103/q161/q166 pattern with real
    * per-key state instead of a windowed aggregate).
    */
  def histogramFromGaps(gaps: DataFrame): DataFrame =
    gaps
      .withColumn("bucket",
        when(col("gap_us") === 0, lit(0L))
          .otherwise(expr("CAST(length(conv(gap_us, 10, 2)) AS BIGINT)")))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_us",
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))")))
      .withColumn("hi_us",
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1")))
      .select(col("event_type"), col("bucket"), col("lo_us"), col("hi_us"), col("n"))

  /** TPC-H Q5 shape (q183) — local-supplier volume: revenue per nation
    * in one region and one year, counting only lineitems whose customer
    * and supplier sit in the SAME nation. The classic join-order
    * stressor: a five-table star with two independent selective dims
    * (region filter, date filter) and a correlated equality between two
    * branches — exactly the shape Catalyst's join reordering and
    * broadcast planning exist for (dims broadcast; lineitem never
    * shuffles more than once).
    *
    * Dates compare as integer epoch-days (the shared NTZ contract);
    * revenue is the exact-decimal q10 money sum.
    *
    * @return (n_name, revenue, n_items)
    */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
      regionName: String = "ASIA", loDay: Long = 9862L,
      hiDay: Long = 10227L): DataFrame = {
    val n = nation.join(broadcast(region.where(col("r_name") === regionName)),
      col("n_regionkey") === col("r_regionkey"))
    val o = orders.where(
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .between(loDay, hiDay - 1))
    lineitem
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")
          * (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q3 shape (q184) — shipping priority: the top-10 highest-
    * pending-revenue orders for one market segment, ordered before a
    * cutoff but shipped after it. Filter-pushdown + broadcast dim +
    * top-k heap; revenue exact-decimal before the one ranking cast.
    *
    * @return (o_orderkey, o_orderdate_day, o_orderpriority, revenue)
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String = "BUILDING",
      cutDay: Long = 10013L): DataFrame = {
    val c = customer.where(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val o = orders.where(
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000") < cutDay)
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("o_orderdate_day"),
        col("o_orderpriority"))
    lineitem.where(
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000") > cutDay)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate_day", "o_orderpriority")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")
          * (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate_day"), col("o_orderkey"))
      .limit(10)
  }

  /** Pairwise correlation matrix (q179) — feature-screening across the
    * lineitem numerics (quantity, price, discount, tax) from ONE pass
    * of exact integer moments: every Σx, Σx², Σxy is a DECIMAL(38,0)
    * aggregate over cents-scaled integers (the q46/q143 determinism
    * argument — built-in `corr` sums doubles in partition order and
    * never hash-matches).
    *
    * The surfaced statistic is all-integer: sign(num) and r²·10⁶ from
    * the exact moments, with every factor down-shifted by a FIXED 2³⁰
    * before the squaring so num_s²·10⁶ and den_s·den_s stay inside
    * DECIMAL(38,0) (|num|, den ≤ n·max|x|² ≈ 4·10²⁵ at sf0.1 → shifted
    * ≤ 4·10¹⁶; the identical shifted integers floor identically on both
    * engines, so the ppm value is deterministic to the last digit —
    * unlike a float r whose sqrt/rounding varies by engine version).
    * |num| is taken BEFORE the shift: floor-vs-truncate division
    * semantics differ on negatives across engines, abs makes them agree.
    * Validity envelope: |num| < 2³⁰·1.8·10¹⁵ ≈ 2·10²⁴ per 38-digit
    * headroom — past that (≳10¹² rows at these magnitudes) raise the
    * shift in both plans.
    *
    * Scale shape: one map-combined moment aggregate (constant-width
    * state), then constant-size row construction — the matrix costs
    * one scan regardless of width·rows.
    *
    * @return per pair: (x_col, y_col, n, sign ∈ {-1,0,1}, r2_ppm;
    *         r2_ppm NULL when either variance underflows the shift)
    */
  def corrMatrix(lineitem: DataFrame): DataFrame = {
    val cols = Seq(
      "quantity" -> "CAST(floor(l_quantity) AS BIGINT)",
      "price_cents" -> "CAST(floor(l_extendedprice * 100) AS BIGINT)",
      "discount_pct" -> "CAST(floor(l_discount * 100) AS BIGINT)",
      "tax_pct" -> "CAST(floor(l_tax * 100) AS BIGINT)")
    val f = lineitem.select(cols.map { case (n, e) => expr(e).as(n) }: _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val moments = f.agg(
      count(lit(1)).as("n"),
      (cols.map { case (c, _) => sum(dec(col(c))).as(s"s_$c") } ++
        cols.map { case (c, _) => sum(dec(col(c)) * dec(col(c))).as(s"ss_$c") } ++
        cols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
          sum(dec(col(a)) * dec(col(b))).as(s"sp_${a}_$b") }): _*)
      .transform(graft.barrier) // six pair rows read the one-row frame
    val pairRows = cols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
      moments.select(
        lit(a).as("x_col"), lit(b).as("y_col"), col("n"),
        (dec(col("n")) * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")).as("num"),
        (dec(col("n")) * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")).as("den_x"),
        (dec(col("n")) * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")).as("den_y"))
    }
    // zero/underflowed variance has no defined correlation: NULL, not a
    // division error (ANSI) or engine-specific inf/NaN
    pairRows.reduce(_ unionAll _)
      .withColumn("ns", expr("abs(num) div 1073741824"))
      .withColumn("dxs", expr("den_x div 1073741824"))
      .withColumn("dys", expr("den_y div 1073741824"))
      .select(col("x_col"), col("y_col"), col("n"),
        signum(col("num")).cast("long").as("sign"),
        when(col("dxs") > 0 && col("dys") > 0,
          expr("(cast(ns as decimal(38,0)) * ns * 1000000) div " +
            "(cast(dxs as decimal(38,0)) * dys)")).as("r2_ppm"))
  }

  /** Poisson-bootstrap confidence intervals (q177) — the distributed
    * bootstrap production metric systems actually run: each row joins
    * replica `b` with multiplicity ~ Poisson(1) (so a replica is a
    * with-replacement resample in expectation), per-replica means are
    * computed in one pass, and the CI is an order statistic over the
    * `reps` replica means. Completes the eval family: q123 gives the
    * z-test, this gives the assumption-free interval.
    *
    * Determinism: multiplicities come from the [[PoissonBoot]] inverse-
    * CDF threshold table (the [[DpNoise]] one-JVM trick), keyed by ONE
    * md5 per row mixed per-replica with three integer ops —
    * reproducible, engine-identical, and 10× cheaper than hashing per
    * (row, replica). Sums are
    * exact integer cents; replica means are floored micro-cent
    * divisions; the interval bounds are exact ranked picks (2nd and
    * 31st of 32 ≈ a 90% percentile-bootstrap CI), not float quantiles.
    *
    * Scale shape: there is NO ×`reps` row fan-out — each replica's
    * multiplicity is an inline codegen'd expression feeding two
    * aggregates per replica in one wide map-side-combined pass; shuffle
    * cardinality is |types|·2·reps columns, independent of row count,
    * and the (type, replica) rows are recovered by exploding the
    * already-aggregated result. The ranking window runs over `reps`
    * rows per type.
    *
    * @return per type: (event_type, n_rows, mean_micro, lo_micro,
    *         hi_micro, n_reps)
    */
  def bootstrapCI(events: DataFrame, reps: Int = 32): DataFrame = {
    val base = events.select(col("event_type"), col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .transform(graft.barrier) // read by the point estimate and the fan
    val point = base.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(cents) * 1000000 div count(1)").as("mean_micro"))
    // ONE md5 per row; per-replica draws come from a 32-bit integer
    // mixer (Knuth multiplicative + xor-shift) over (h, rep) — md5 at
    // ×reps volume was the whole cost of the operator (23 s → ~2 s at
    // sf0.1), and the mixer is the same three integer ops on both
    // engines
    // WIDE aggregation instead of a ×reps row explode: the explode form
    // pushed |rows|·reps rows through an interpreted filter() lambda and a
    // (type, rep)-keyed hash aggregate — at sf1.0 that was 320M interpreted
    // threshold scans. Here each replica's multiplicity is an inline
    // codegen'd expression (same mixer arithmetic, same values) feeding 2
    // aggregates per replica, and the (type, rep) shape is recovered by
    // exploding the ALREADY-AGGREGATED |types| rows. Map-side work per row:
    // reps mixers + reps·|thr| compares, zero extra rows.
    val withU = base
      .withColumn("h", graft.functions.TextAnalysis.md5Prefix32(
        concat(lit("boot:"), col("event_id").cast("string"))))
      .select(col("event_type") +: col("cents") +:
        (0 until reps).map { r =>
          val u1 = s"pmod(pmod(h + $r * 2654435761, 4294967296) * 1640531527, 4294967296)"
          expr(s"($u1) ^ (($u1) div 65536)").as(s"u$r")
        }: _*)
    def kOf(r: Int): Column = PoissonBoot.thresholds
      .map(t => when(col(s"u$r") >= t, 1L).otherwise(0L)).reduce(_ + _)
    val aggCols = (0 until reps).flatMap(r => Seq(
      sum(col("cents") * kOf(r)).as(s"sc$r"), sum(kOf(r)).as(s"nk$r")))
    val repMeans = withU.groupBy("event_type")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("event_type"),
        posexplode(array((0 until reps).map(r =>
          struct(col(s"sc$r").as("sc"), col(s"nk$r").as("nk"))): _*)))
      .select(col("event_type"), col("pos").as("rep"),
        col("col.sc").as("sc"), col("col.nk").as("nk"))
      .where(col("nk") > 0)
      .select(col("event_type"), col("rep"),
        expr("sc * 1000000 div nk").as("rep_mean"))
    // rep id as tiebreak: equal replica means must rank identically on
    // both engines for the ranked picks to agree
    val ranked = repMeans
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("rep_mean"), col("rep"))))
    val counts = ranked.groupBy("event_type").agg(count(lit(1)).as("n_reps"))
    val lo = ranked.where(col("rn") === 2)
      .select(col("event_type"), col("rep_mean").as("lo_micro"))
    val hi = ranked.join(broadcast(counts), "event_type")
      .where(col("rn") === col("n_reps") - 1)
      .select(col("event_type"), col("rep_mean").as("hi_micro"))
    point
      .join(broadcast(lo), "event_type")
      .join(broadcast(hi.select("event_type", "hi_micro")), "event_type")
      .join(broadcast(counts), "event_type")
      .select(col("event_type"), col("n_rows"), col("mean_micro"),
        col("lo_micro"), col("hi_micro"), col("n_reps"))
  }

  /** Chi-square independence audit (q171) — is event type independent
    * of weekday? The contingency-table companion to [[benfordAudit]]:
    * per cell, the observed count against the independence expectation
    * E = r·c/N, with the deviation kept exact — dev = obs·N − r·c (a
    * DECIMAL(38,0) integer, internal only) — and the cell flagged when
    * the squared standardized residual exceeds 3σ: dev² > 9·r·c·N, a
    * pure integer compare. The per-cell χ² contribution dev²/(r·c·N)
    * ships as the exact nano-unit floor ⌊dev²·10⁹/(r·c·N)⌋ — a BIGINT
    * (contribution ≤ N, so the nano value fits int64 through ~10⁹-row
    * tables), never a float and never a raw DECIMAL output column
    * (either hashes differently across DuckDB fetch paths).
    *
    * Bound note: dev²·10⁹ reaches (obs·N)²·10⁹ — exact through
    * DECIMAL(38,0) up to ~10⁷-row tables; beyond that, pre-scale counts
    * (e.g. to per-million) before the audit.
    *
    * Scale shape: one map-combined cell aggregate; margins are tiny
    * broadcast aggregates of the cell table itself.
    *
    * @return per cell: (event_type, weekday, obs, r, c, n,
    *         contrib_nano, flagged ∈ {0,1})
    */
  def independenceAudit(events: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = events
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("weekday"))
      .groupBy("event_type", "weekday").agg(count(lit(1)).as("obs"))
      .transform(graft.barrier) // read by both margins and the grid
    val rows = cells.groupBy("event_type").agg(sum(col("obs")).as("r"))
    val cols = cells.groupBy("weekday").agg(sum(col("obs")).as("c"))
    val tot = cells.agg(sum(col("obs")).as("n"))
    cells
      .join(broadcast(rows), "event_type")
      .join(broadcast(cols), "weekday")
      .crossJoin(broadcast(tot))
      .withColumn("dev", dec(col("obs")) * dec(col("n")) - dec(col("r")) * dec(col("c")))
      .withColumn("contrib_nano",
        expr("(dev * dev * 1000000000) div " +
          "(cast(r as decimal(38,0)) * c * n)"))
      .withColumn("flagged", when(col("dev") * col("dev")
        > dec(lit(9)) * dec(col("r")) * dec(col("c")) * dec(col("n")),
        lit(1L)).otherwise(lit(0L)))
      .select(col("event_type"), col("weekday"), col("obs"), col("r"),
        col("c"), col("n"), col("contrib_nano"), col("flagged"))
  }

  /** Benford first-digit audit (q163) — the classic fraud / synthetic-
    * data detector: naturally-occurring multiplicative magnitudes put
    * digit d first with probability log₁₀(1+1/d); ledgers that deviate
    * hard were typed in, generated, or truncated. Joins the data-quality
    * family (q111 integrity audit, q137 column profile, q138 drift) as
    * the distribution-shape check.
    *
    * Integer grading end to end: observed shares and the expectation are
    * both parts-per-billion BIGINTs (the log₁₀ constants come from
    * [[BenfordExpected]], one JVM feeding both engines — the DpNoise
    * trick), so deviation is an exact subtraction, no float compare
    * anywhere. One map-combined 9-group aggregate; the audit adds zero
    * shuffles beyond it.
    *
    * @return per leading digit: (digit, obs, n_total, exp_ppb, obs_ppb,
    *         dev_ppb)
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val expArr = array(BenfordExpected.ppb.map(lit): _*)
    val digits = orders.select(
        substring(expr("CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING)"), 1, 1)
          .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val tot = digits.agg(sum(col("obs")).as("n_total"))
    digits.crossJoin(broadcast(tot))
      .withColumn("exp_ppb", element_at(expArr, col("digit")))
      .withColumn("obs_ppb", expr("obs * 1000000000 div n_total"))
      .select(col("digit"), col("obs"), col("n_total"), col("exp_ppb"),
        col("obs_ppb"), (col("obs_ppb") - col("exp_ppb")).as("dev_ppb"))
  }

  /** Range-partition boundary planner (q156) — the primitive behind
    * `repartitionByRange`/global sort at 100 TB: choose `b−1` split
    * points for a key so the resulting ranges are equal-frequency, and
    * report the balance actually achieved. Spark itself samples for
    * this; the exact-percentile form is the planner a pipeline runs
    * once per layout decision, and its balance report is the skew gate.
    *
    * Exactness (the q121/q48 trick generalized): the key is scaled ×b
    * BEFORE `percentile`, so every interpolated cut ((n−1)·i/b lands on
    * the 1/b grid) is an exact integer — Spark `percentile` and DuckDB
    * `quantile_cont` agree bit-for-bit. Bucket of a row = how many cuts
    * its scaled key strictly exceeds (ties stick to the lower bucket) —
    * a pure integer fold over the broadcast cut array; no sort, no
    * window anywhere.
    *
    * @return one row per bucket: (bucket, upper_scaled — NULL for the
    *         top bucket, n_rows)
    */
  def rangeBoundaries(df: DataFrame, key: String, b: Int = 8): DataFrame = {
    require(b >= 2, "need at least two ranges")
    val fracs = (1 until b).map(i => i.toDouble / b).mkString(", ")
    val cuts = df.agg(
      expr(s"percentile($key * $b, array($fracs))").as("cs"))
    val bucketed = df
      .crossJoin(broadcast(cuts))
      .select(aggregate(col("cs"),
        lit(0), (acc, c) => acc + when(col(key) * b > c, 1).otherwise(0))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    bucketed
      .crossJoin(broadcast(cuts))
      .select(col("bucket"),
        when(col("bucket") < b - 1,
          element_at(col("cs"), col("bucket") + 1).cast("long"))
          .as("upper_scaled"),
        col("n_rows"))
  }

  /** 2-D Pareto skyline (q159) — the multi-objective filter behind "best
    * candidates" selection (maximize both dimensions; a row survives iff
    * no other row is ≥ on both and > on one). Here: orders that are
    * undominated on (price, recency) — no later order was also more
    * expensive.
    *
    * Algorithm — two lossless prunes that together ARE the skyline, with
    * no global sort-scan anywhere:
    *
    *   1. Cross-bucket prune: per x-bucket max-y (one map-combined
    *      aggregate → `buckets` rows), running max over strictly-higher
    *      buckets (a `buckets`-row metadata window, broadcast back as
    *      `thr`). A point with y ≤ thr(b) is dominated by some point in
    *      a strictly higher bucket (strictly higher x, ≥ its y).
    *   2. Per-bucket LOCAL sort-scan: within each bucket — a window
    *      PARTITIONED by bucket, ordered (x DESC, y DESC) — a point
    *      survives iff its y strictly exceeds the running max-y of the
    *      bucket rows before it (the classic sort-scan, bucket-local).
    *
    * Exactness: a dominator of p sits in p's bucket or a strictly higher
    * one (equal-width x-buckets are monotone in x, so lower buckets have
    * strictly smaller x and cannot dominate). A higher-bucket dominator
    * implies y_p ≤ max-y(that bucket) ≤ thr(b_p) — killed by prune 1. A
    * same-bucket dominator q has (x_q, y_q) ≥ (x_p, y_p), so q precedes
    * p in the local order and its y enters p's running max — killed by
    * prune 2; and if q itself was thr-pruned, y_p ≤ y_q ≤ thr proves p
    * was already gone. So the survivor set is exactly the skyline.
    *
    * Scale shape: NO unpartitioned data window exists — the former
    * global exact window (r10 `weak`: on anti-correlated data every
    * point is on the frontier and the prune passes the whole corpus to
    * one task) is gone. The only unpartitioned window runs over the
    * ≤ `buckets`-row max-y table. The local window partitions by bucket:
    * per-partition size is the bucket's distinct-point count — x-range/
    * `buckets` wide, and ≤ |days| rows per distinct price within it —
    * so adversarially anti-correlated data spreads across all buckets
    * instead of collapsing onto one task.
    *
    * @return (price_cents, day_num, n_rows): the undominated distinct
    *         points and how many orders sit on each
    */
  def skyline(orders: DataFrame, buckets: Int = 1024): DataFrame = {
    val pts = orders.select(
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("x"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_rows"))
      .transform(graft.barrier) // read by the prune stats and the filter
    val mm = pts.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val bucketed = pts.crossJoin(broadcast(mm))
      .withColumn("b", expr(s"((x - lo) * $buckets) div (hi - lo + 1)"))
    // thr(b) = max y over strictly higher buckets; NULL for the top bucket.
    // Unpartitioned window over <= `buckets` rows (GlobalWindowSpec-pinned)
    val thr = bucketed.groupBy("b").agg(max(col("y")).as("by"))
      .withColumn("thr", max(col("by")).over(Window.orderBy(col("b").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select("b", "thr")
    val cand = bucketed.join(broadcast(thr), "b")
      .where(col("thr").isNull || col("y") > col("thr"))
    val wLocal = Window.partitionBy(col("b"))
      .orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("my", max(col("y")).over(wLocal))
      .where(col("my").isNull || col("y") > col("my"))
      .select(col("x").as("price_cents"), col("y").as("day_num"), col("n_rows"))
  }

  /** Scalar-function sweep over events: date parts, string ops, JSON
    * extraction, math — all codegen'd built-ins, no UDFs (SURVEY.md §2
    * "no scalar functions in the reference"; indispensable in practice).
    */
  def eventScalars(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      year(col("ts")).as("y"),
      month(col("ts")).as("m"),
      dayofmonth(col("ts")).as("d"),
      hour(col("ts")).as("h"),
      upper(col("event_type")).as("etype"),
      length(col("event_type")).as("etype_len"),
      concat(col("event_type"), lit("#"), col("user_id").cast("string")).as("tag"),
      substring(col("event_type"), 1, 2).as("prefix"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"),
      floor(col("value")).cast("long").as("value_floor"),
      ceil(col("value")).cast("long").as("value_ceil"),
      sqrt(col("value")).as("value_sqrt"),
      abs(col("user_id") - lit(75)).as("dist_from_mid"))

  /** Statistical aggregates (covariance, correlation, stddev) per event
    * type — computed from EXACT decimal moments, not the built-in
    * `corr`/`covar_samp`: the built-ins sum doubles in partition order, so
    * their low bits differ run to run and engine to engine. Here every
    * moment (Σx, Σx², Σxy over 2-decimal values and integer user ids) is an
    * exact DECIMAL/BIGINT sum — order-independent and shuffle-safe — and
    * only the final closed-form arithmetic happens in double precision,
    * identically in any engine. Same cost profile as any hash aggregate:
    * map-side partial sums, one shuffle of |groups| rows.
    */
  def eventStats(events: DataFrame): DataFrame = {
    val x = col("value").cast("decimal(18,2)")
    val y = col("user_id").cast("long")
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum((x * x).cast("decimal(28,4)")).as("sxx"),
        sum(y).as("sy"),
        sum(y * y).as("syy"),
        sum((x * y.cast("decimal(18,0)")).cast("decimal(28,2)")).as("sxy"))
      .select(statCols: _*)
  }

  /** Range self-join, counted WITHOUT enumerating pairs: per event, how
    * many other events have `value` within ±radius.
    *
    * History: the first form bucketized `floor(value/r)` into an equi-join
    * + residual filter — correct and distributed, but it still ENUMERATES
    * every matching pair, and the sf1.0 sweep measured that cardinality at
    * 5.1 BILLION pairs for one million events (values cluster, so Σ per-
    * value neighborhood ≈ 5000× n). Counting does not need the pairs:
    * values are exact 2-decimal quantities, so the count of neighbors of
    * value v is a RANGE SUM over the per-cent histogram,
    *   W(c) = Σ_{|c'−c| ≤ 25¢} cnt(c'),   n_neighbors = W(c) − 1.
    *
    * Scale shape: one map-combined groupBy to the cents histogram —
    * bounded by the VALUE DOMAIN (≤ max_cents rows, 56k here), not the
    * corpus; a range-frame window over that metadata-bounded table; and a
    * broadcast join back to the events. O(n) work where pair enumeration
    * was O(Σ neighborhood²-ish); no shuffle of pairs at any scale.
    *
    * Boundary exactness: the integer-cent domain replaces the old double
    * `abs(a−b) <= r` residual — 25¢ is exact where `v ± 0.25` rounding
    * could disagree across engines at the boundary; both engines now
    * compare identical integers.
    */
  def rangeJoinNeighbors(events: DataFrame, radius: Double = 0.25): DataFrame = {
    val radiusCents = math.round(radius * 100).toInt
    val cents = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val hist = events.select(cents.as("c"))
      .groupBy("c").agg(count(lit(1)).as("cnt"))
    // unpartitioned window: |domain| rows (value-range-bounded metadata,
    // the q121/q164 argument), never corpus-sized
    val w = Window.orderBy(col("c"))
      .rangeBetween(-radiusCents.toLong, radiusCents.toLong)
    val tot = hist.withColumn("w", sum(col("cnt")).over(w))
    events.select(col("event_id"), cents.as("c"))
      .join(broadcast(tot), Seq("c"))
      .select(col("event_id"), (col("w") - 1).as("n_neighbors"))
  }

  /** Analytic window-function sweep per user: lag/lead neighbors, quartile
    * ntile, percent_rank/cume_dist, first value — one sort per (small) user
    * partition, no global sort. Determinism: the (ts, event_id) tiebreak is
    * total, percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are exact
    * rationals evaluated identically in any engine, and lag/lead move raw
    * column bits, so the whole row hash-matches the oracle.
    */
  def windowAnalytics(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      first(col("event_id")).over(wRows).as("first_event"))
  }

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * customer-value grid: each user's last-activity age, event count, and
    * integer-cent spend are quartiled against EXACT corpus-wide percentile
    * cuts and the 4×4×4 segment grid is summarized. Quartile 1 = most
    * recent / most frequent / highest spend.
    *
    * Quartiling is threshold-based, not rank-based: the p25/p50/p75 cuts
    * of each metric are computed in ONE single-row aggregate over the
    * per-user table and broadcast back, and each user lands in
    * `1 + Σ (metric beyond cut)`. Unlike `ntile(4)` this never funnels
    * every user through a single-partition global sort — the per-user
    * table only ever moves through map-side comparisons — which is the
    * shape that survives 100× user cardinality. Semantic delta vs
    * equal-count ntile, by design: users TIED AT a cut all land on the
    * better (lower) quartile together, so segment populations need not be
    * equal-size fourths when the metric is discrete. Exactness: metrics
    * are quadrupled before `percentile`, so linear interpolation at
    * p ∈ {.25,.5,.75} (index fraction a multiple of ¼) always lands on an
    * integer — Spark `percentile` and DuckDB `quantile_cont` agree
    * bit-for-bit (the q119 doubled-scale trick, one notch finer), and the
    * quartile predicate `4·x > cut` is pure integer comparison.
    *
    * Shape: one user-keyed aggregate collapses events to a row per user;
    * one 1-row percentile aggregate (per-partition sorted state over the
    * REDUCED user table, merged once) + two broadcast crossJoins; per-row
    * comparisons; constant-size grid out. No Window anywhere
    * (plan-asserted in PlanSpec).
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val byUser = events.groupBy(col("user_id")).agg(
      max(day).as("last_day"),
      count(lit(1)).as("frequency"),
      sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("monetary_cents"))
    val maxDay = events.agg(max(day).as("corpus_max_day"))
    val users = byUser.crossJoin(broadcast(maxDay))
      .withColumn("recency_days", col("corpus_max_day") - col("last_day"))
    // all nine cuts in one single-row aggregate; ×4 scale keeps the
    // interpolated values integral (exactly representable doubles)
    val cuts = users.agg(
      expr("percentile(4 * recency_days, 0.25)").as("r25"),
      expr("percentile(4 * recency_days, 0.50)").as("r50"),
      expr("percentile(4 * recency_days, 0.75)").as("r75"),
      expr("percentile(4 * frequency, 0.25)").as("f25"),
      expr("percentile(4 * frequency, 0.50)").as("f50"),
      expr("percentile(4 * frequency, 0.75)").as("f75"),
      expr("percentile(4 * monetary_cents, 0.25)").as("m25"),
      expr("percentile(4 * monetary_cents, 0.50)").as("m50"),
      expr("percentile(4 * monetary_cents, 0.75)").as("m75"))
    def quartileUp(metric: Column, c25: Column, c50: Column, c75: Column): Column =
      (lit(1) + when(metric * 4 > c25, 1).otherwise(0)
        + when(metric * 4 > c50, 1).otherwise(0)
        + when(metric * 4 > c75, 1).otherwise(0)).cast("int")
    def quartileDown(metric: Column, c25: Column, c50: Column, c75: Column): Column =
      (lit(1) + when(metric * 4 < c75, 1).otherwise(0)
        + when(metric * 4 < c50, 1).otherwise(0)
        + when(metric * 4 < c25, 1).otherwise(0)).cast("int")
    users.crossJoin(broadcast(cuts))
      .select(
        quartileUp(col("recency_days"), col("r25"), col("r50"), col("r75")).as("r_q"),
        quartileDown(col("frequency"), col("f25"), col("f50"), col("f75")).as("f_q"),
        quartileDown(col("monetary_cents"), col("m25"), col("m50"), col("m75")).as("m_q"),
        col("monetary_cents"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary_cents")).as("segment_cents"))
  }

  /** A/B experiment report over consistent-hash arm assignment — the
    * analysis side of online experimentation: users hash into arm 0/1 by
    * a salted md5 (sticky, data-independent, no coordination), the
    * experiment unit is the user-day, conversion is "any `convType` event
    * that day", and the report emits per-arm rates, relative lift, and a
    * two-proportion z-test flag at alpha = 0.05.
    *
    * The z-test runs in EXACT integer arithmetic: |z| > 1.96 is
    * equivalent to 10000·N·(c_a·n_b − c_b·n_a)² > 38416·n_a·n_b·C·(N−C)
    * (N = n_a+n_b, C = c_a+c_b), evaluated in DECIMAL(38,0) so both
    * engines agree bit-for-bit — no sqrt, no float accumulation. Counts
    * here (~10⁴ units) put the left side near 10²⁴, far inside 38 digits;
    * the identity holds to ~10¹² units per arm. On an untreated log the
    * hash split IS the A/A test, so `significant` doubles as a sanity
    * gate on the assignment hash.
    *
    * Scale shape: one (arm, user, day) hash aggregate — map-side combined,
    * user-keyed shuffle — then a 2-row arm rollup and a 1×1 crossJoin.
    */
  def abTestReport(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val assigned = events.select(
      (graft.functions.TextAnalysis.md5Prefix32(
        concat(lit("ab:"), col("user_id").cast("string"))) % 2).as("arm"),
      col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day_num"),
      col("event_type"))
    val perUnit = assigned.groupBy("arm", "user_id", "day_num")
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L)).as("converted"))
    val perArm = perUnit.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("converted").as("c"))
    val a = perArm.where(col("arm") === 0).select(col("n").as("n_a"), col("c").as("c_a"))
    val b = perArm.where(col("arm") === 1).select(col("n").as("n_b"), col("c").as("c_b"))
    a.crossJoin(b).select(
      col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      (col("c_a").cast("double") / col("n_a").cast("double")).as("rate_a"),
      (col("c_b").cast("double") / col("n_b").cast("double")).as("rate_b"),
      ((col("c_b") * col("n_a")).cast("double")
        / (col("c_a") * col("n_b")).cast("double")).as("lift"),
      expr("""CAST(10000 AS DECIMAL(38,0)) * CAST(n_a + n_b AS DECIMAL(38,0))
        * (CAST(c_a*n_b - c_b*n_a AS DECIMAL(38,0)) * CAST(c_a*n_b - c_b*n_a AS DECIMAL(38,0)))
        > CAST(38416 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
        * CAST(c_a + c_b AS DECIMAL(38,0)) * CAST(n_a + n_b - c_a - c_b AS DECIMAL(38,0))""")
        .as("significant"))
  }

  /** Difference-in-differences (q221) — the quasi-experimental estimate
    * an A/B test (q123) cannot give you when assignment wasn't random
    * over time: how much did the treatment arm's conversion rate move
    * ACROSS a cutover day, net of the control arm's own movement
    * (which absorbs seasonality and shocks common to both). Reuses the
    * q123 md5 arm assignment so the two reports describe the same
    * experiment; units are (user, day) with an any-conversion flag.
    *
    * Per-cell rates are exact micro-unit floors (c·10⁶ div n, each a
    * single integer division), and the DiD estimate is the integer
    * difference of those floors — floor-before-subtract is documented
    * (the alternative, one rational with four denominators, grades
    * identically only in DECIMAL; ±2 micro of floor error is far below
    * any decision threshold at these counts).
    *
    * Scale shape: one map-combined (arm, period, user, day) dedup
    * aggregate, one 4-row cell aggregate, then constant-size pivots.
    *
    * @return 1 row: per-cell (n, c, rate_micro) ×4 + did_micro
    */
  def diffInDiff(events: DataFrame, cutDay: Long = 19738L,
      convType: String = "purchase"): DataFrame = {
    val assigned = events.select(
      (graft.functions.TextAnalysis.md5Prefix32(
        concat(lit("ab:"), col("user_id").cast("string"))) % 2).as("arm"),
      col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day_num"),
      col("event_type"))
    val perUnit = assigned
      .withColumn("post", (col("day_num") >= cutDay).cast("int"))
      .groupBy("arm", "post", "user_id", "day_num")
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("converted"))
    val cells = perUnit.groupBy("arm", "post")
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
      .withColumn("rate_micro", expr("c * 1000000 div n"))
    def cell(arm: Int, post: Int, suffix: String): DataFrame =
      cells.where(col("arm") === arm && col("post") === post)
        .select(col("n").as(s"n_$suffix"), col("c").as(s"c_$suffix"),
          col("rate_micro").as(s"rate_${suffix}_micro"))
    cell(0, 0, "c_pre").crossJoin(cell(0, 1, "c_post"))
      .crossJoin(cell(1, 0, "t_pre")).crossJoin(cell(1, 1, "t_post"))
      .withColumn("did_micro",
        (col("rate_t_post_micro") - col("rate_t_pre_micro"))
          - (col("rate_c_post_micro") - col("rate_c_pre_micro")))
  }

  /** Randomized-response frequency estimation (q229) — LOCAL
    * differential privacy: each event reports its true type with
    * probability 3/4 and a hash-drawn uniform type otherwise, and the
    * collector unbiases the noisy histogram with
    * ĉ_t = (4·obs_t·K − N)/(3K). The measure-the-mechanism report
    * (q83/q93/q187 pattern) ships the true count, the observed noisy
    * count, the debiased estimate, and the error — completing the
    * privacy family (k-anon q115, l-div q142, t-close q149, central DP
    * q161) with its local-DP member. Flip and replacement draws are the
    * md5 idiom, so both engines perturb identically; the only division
    * is one truncating integer div per type (spelled sign-safely in the
    * oracle because DuckDB's // floors negatives).
    *
    * Scale shape: the type table (K rows) broadcasts twice; the
    * perturbation is map-side; two map-combined count aggregates.
    *
    * @return (event_type, true_cnt, obs_cnt, est_cnt, err)
    */
  /** The |types|-row index frame BEFORE its barrier — split out so
    * GlobalWindowSpec can count the unpartitioned window's input (the
    * barrier materializes at construction, hiding the window from the
    * registered query's final plan).
    */
  private[graft] def typesIndexed(events: DataFrame): DataFrame =
    events.select(col("event_type")).distinct()
      // |types| rows — the one unpartitioned window, driver-sized
      .withColumn("t_idx",
        row_number().over(Window.orderBy("event_type")).cast("long") - 1)

  def randomizedResponse(events: DataFrame): DataFrame = {
    val types = typesIndexed(events).transform(graft.barrier)
    val k = types.agg(count(lit(1)).as("kk"))
    val reported = events.select(col("event_id"), col("event_type"))
      .crossJoin(broadcast(k))
      .withColumn("flip",
        graft.functions.TextAnalysis.md5Prefix32(
          concat(lit("rr:"), col("event_id").cast("string"))) % 4 === 0)
      .withColumn("r_idx",
        graft.functions.TextAnalysis.md5Prefix32(
          concat(lit("rrv:"), col("event_id").cast("string"))) % col("kk"))
      .join(broadcast(types.select(col("t_idx"),
        col("event_type").as("rand_type"))), col("r_idx") === col("t_idx"))
      .select(col("event_type"),
        when(col("flip"), col("rand_type")).otherwise(col("event_type"))
          .as("reported"))
      .transform(graft.barrier) // true counts + observed counts + N
    val trueC = reported.groupBy(col("event_type"))
      .agg(count(lit(1)).as("true_cnt"))
    val obs = reported.groupBy(col("reported").as("rt"))
      .agg(count(lit(1)).as("obs_cnt"))
    val n = reported.agg(count(lit(1)).as("nn"))
    trueC.join(obs, col("event_type") === col("rt"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(k))
      .select(col("event_type"), col("true_cnt"), col("obs_cnt"),
        expr("(4 * obs_cnt * kk - nn) div (3 * kk)").as("est_cnt"))
      .withColumn("err", col("est_cnt") - col("true_cnt"))
  }

  /** Robust outlier detection per event type via the Median Absolute
    * Deviation — the resistant complement to the z-score family (q99/q103):
    * one wild value moves a mean/stddev arbitrarily but moves a median
    * not at all, so MAD gating survives the heavy-tailed value
    * distributions real telemetry has. Emits per group the exact median,
    * the MAD, and how many rows sit beyond `k`·MAD (unscaled MAD — the
    * 1.4826 normal-consistency factor is a presentation constant, not
    * applied here).
    *
    * Exactness across engines: values become integer cents, then medians
    * are computed on a DOUBLED integer scale, where linear interpolation
    * at p=0.5 lands on an integer — so Spark `percentile` and DuckDB
    * `quantile_cont` agree bit-for-bit, and the outlier predicate
    * 2·|x−med| > k·(2·MAD) is pure integer comparison. The group medians
    * broadcast back (two small joins); the events side shuffles once per
    * percentile pass. Exact percentile state is per-group value-sorted —
    * at 100 TB swap stage one for `approx_percentile` (the q56 form);
    * the exact form is registered because the oracle can reproduce it
    * (q109 precedent).
    */
  def madOutliers(events: DataFrame, k: Int = 3): DataFrame = {
    val base = events.select(col("event_type"),
      expr("CAST(2 * floor(value * 100) AS BIGINT)").as("x2"))
    val med = base.groupBy("event_type")
      .agg(expr("percentile(x2, 0.5)").cast("long").as("med2"))
    val dev = base.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("x2") - col("med2")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(2 * ad, 0.5)").cast("long").as("mad2x"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (max(col("med2")).cast("double") / 200.0).as("median_value"),
        (max(col("mad2x")).cast("double") / 400.0).as("mad_value"),
        coalesce(sum(when(lit(2) * col("ad") > lit(k) * col("mad2x"), 1L)), lit(0L))
          .as("n_outliers"))
  }

  /** Bucketed range-lookup join — the scale technique for joining a fact
    * value against an IRREGULAR interval dimension (IP→geo ranges, tax
    * brackets, rating tiers) without a nested-loop range join: each
    * interval [lo, hi) is expanded to the coarse `bucketWidth`-wide
    * buckets it overlaps, the fact side computes its bucket with one
    * integer division, and the join becomes a broadcast HASH join on the
    * bucket id with the exact `lo <= v < hi` predicate left as a residual
    * filter. A plain `JOIN ON v BETWEEN lo AND hi` plans as
    * BroadcastNestedLoopJoin — every fact row tests every interval, which
    * at 100 TB is a scan × dimension blow-up; here each row meets only the
    * intervals sharing its bucket (one, for non-overlapping dimensions).
    * PlanSpec asserts the hash-join shape.
    *
    * `fact` must expose `v` (long value) and `weight` (long measure);
    * intervals are (name, lo, hi) with hi exclusive. Reference scope: the
    * reference's only lookups are key-equality (Redis GET, e.g.
    * `/root/reference/flink/flink-psd/src/main/java/streaming/RealTimeRecommendations.java:58-68`);
    * interval dimensions are the generalization warehouses need.
    */
  def bucketRangeLookup(fact: DataFrame, brackets: Seq[(String, Long, Long)],
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0 && brackets.forall(b => b._2 < b._3),
      "need bucketWidth > 0 and lo < hi")
    val spark = fact.sparkSession
    import spark.implicits._
    val dim = brackets.toDF("bracket", "lo", "hi")
      .select(col("bracket"), col("lo"), col("hi"),
        explode(sequence(expr(s"lo div $bucketWidth"),
          expr(s"(hi - 1) div $bucketWidth"))).as("bucket"))
    fact
      .withColumn("bucket", expr(s"v div $bucketWidth"))
      .join(broadcast(dim), Seq("bucket"))
      .where(col("v") >= col("lo") && col("v") < col("hi"))
      .groupBy(col("bracket"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("weight")), lit(0L)).as("total_weight"))
  }

  /** Right-to-be-forgotten purge audit — the governance pass a
    * training-data pipeline must run before every release: for each
    * fact table, how many rows the deletion list removes, how many
    * distinct listed users actually appear, and what survives.
    *
    * One scan per table: the deletion list broadcasts (a GDPR list is
    * tiny next to the corpus) as a left join adding a purge flag, and
    * the three counts fold in a single conditional aggregate — there is
    * no second "count the survivors" pass. The actual scrub is the same
    * join shape with `WHERE NOT hit` (left_anti); auditing and
    * scrubbing share one plan, so the audit numbers are exactly what
    * the scrub will do.
    *
    * @param tables    (name, df, userCol) per audited fact table
    * @param deletions single-column `user_id` frame of listed users
    */
  def tombstonePurge(tables: Seq[(String, DataFrame, String)],
                     deletions: DataFrame): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    val del = deletions.select(col("user_id").as("__del_uid")).distinct()
    tables.map { case (name, df, userCol) =>
      df.join(broadcast(del), col(userCol) === col("__del_uid"), "left")
        .agg(
          count(lit(1)).as("n_before"),
          sum(when(col("__del_uid").isNotNull, 1L).otherwise(0L)).as("n_purged"),
          count_distinct(when(col("__del_uid").isNotNull, col(userCol))).as("n_users_purged"))
        .select(lit(name).as("table_name"), col("n_before"), col("n_purged"),
          (col("n_before") - col("n_purged")).as("n_after"), col("n_users_purged"))
    }.reduce(_ unionAll _)
  }

  /** The per-row hash behind [[tableChecksum]] — shared with the
    * streaming maintainer ([[graft.streaming.RealTime.checksumStream]]),
    * so both compute the identical commutative sum.
    */
  def rowHash(cols: Seq[String]): Column =
    graft.functions.TextAnalysis.md5Prefix32(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))): _*))

  /** Order-invariant table checksum — the migration/replication
    * validation primitive: row hash = first 32 md5 bits of the
    * chr(1)-joined null-sentineled column strings, table checksum = the
    * SUM of row hashes (commutative, so partition order, shuffle order,
    * and file layout cannot change it — exactly what comparing two
    * copies of a 100 TB table needs). Sum of n < 2³¹ values below 2³²
    * cannot overflow BIGINT. md5 (not murmur3/xxhash64) because it is
    * the one hash with identical output in every engine — the checksum
    * is only useful if BOTH sides of a migration can compute it.
    *
    * Nulls map to the sentinel `\\u0000null` BEFORE the join (concat_ws
    * silently skips nulls in both engines, which would make
    * ("a", null, "b") collide with ("a", "b", null)).
    *
    * Plan: per table, one scan → map-side hash → single-row partial-sum
    * aggregate; the union of per-table rows is driver-free.
    */
  def tableChecksum(tables: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    tables.map { case (name, df, cols) =>
      df.select(rowHash(cols).as("h"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
    }.reduce(_ unionAll _)
  }

  /** Chi-square distribution drift between the first and second half of
    * the event timeline: did the event-type mix shift between snapshots?
    * The epoch split is the integer midpoint of the observed day range
    * (deterministic; no config), and every count is an exact integer —
    * the only floating-point steps are the final expected-count divisions
    * and the squared-residual ratio, identical IEEE ops on any engine.
    *
    * Plan shape: one scan → per-(type, epoch) hash aggregate →
    * conditional-sum pivot to one row per type → broadcast 1-row totals
    * joined back. Nothing is ever larger than |event types| rows after
    * the first aggregate, so the statistic costs one shuffle regardless
    * of input size; the same shape serves daily jobs at 100 TB.
    *
    * The reference has no drift monitoring; this guards the same nightly
    * ratings rebuild its batch jobs assume is stable
    * (`/root/reference/flink/flink-psd/src/main/java/batch/Recommendations.java`).
    *
    * @return one row per event_type: counts in each epoch, expected
    *         counts under homogeneity, and the chi-square contribution
    */
  def distributionDrift(events: DataFrame): DataFrame = {
    val byDay = events.select(col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day_num"))
    val mid = byDay.agg(
      expr("(min(day_num) + max(day_num) + 1) div 2").as("mid_day"))
    val perType = byDay.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg(
        sum(when(col("day_num") < col("mid_day"), 1L).otherwise(0L)).as("n_early"),
        sum(when(col("day_num") >= col("mid_day"), 1L).otherwise(0L)).as("n_late"))
    val totals = perType.agg(
      sum("n_early").as("tot_early"), sum("n_late").as("tot_late"))
    val joined = perType.crossJoin(broadcast(totals))
    val rowTot = (col("n_early") + col("n_late")).cast("double")
    val grand = (col("tot_early") + col("tot_late")).cast("double")
    val eEarly = col("tot_early").cast("double") * rowTot / grand
    val eLate = col("tot_late").cast("double") * rowTot / grand
    joined.select(
      col("event_type"), col("n_early"), col("n_late"),
      eEarly.as("exp_early"), eLate.as("exp_late"),
      ((col("n_early").cast("double") - eEarly) * (col("n_early").cast("double") - eEarly) / eEarly
        + (col("n_late").cast("double") - eLate) * (col("n_late").cast("double") - eLate) / eLate)
        .as("chi2_contrib"))
  }

  /** Column-quality profile: per column, null count, exact distinct
    * count, and typed min/max (cast to string only AFTER the typed
    * aggregation, so numeric columns do not sort lexicographically).
    *
    * Plan shape: one SINGLE-COLUMN pruned scan per profiled column,
    * unioned — each branch's parquet read touches only its own column
    * chunk, so total bytes ≈ one full-width scan, and each exact
    * `count(distinct)` runs as a plain two-level aggregate. The
    * alternative (all columns in ONE aggregate) plans an Expand that
    * multiplies every row by the number of distinct aggregates before
    * the shuffle — measured 10× slower here (3.1 s vs 0.3 s warm at
    * sf0.1) and strictly worse at 100 TB, where the Expand inflates
    * shuffle volume ∝ columns while the union form keeps per-branch
    * shuffles at |distinct values of that column|.
    *
    * Profiling is the warehouse-side generalization of the reference's
    * ad-hoc count loop (`batch/ProductReviewAggregation.java:43-47`).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }

  /** TPC-H Q17 shape — "small-quantity-order revenue": revenue lost to
    * line items whose quantity is below 20% of their part's average order
    * quantity, restricted to one brand. The classic correlated scalar
    * subquery (`l_quantity < 0.2 * (SELECT avg(l_quantity) ...)`),
    * decorrelated Spark-first:
    *
    *  - the brand's part keys broadcast-SEMI-filter lineitem '''before'''
    *    the per-part average is computed — the aggregate runs over the
    *    brand's ~1/|brands| slice, never the full fact table;
    *  - the per-part (cnt, sumq) stats table is |brand parts| rows and
    *    broadcasts back, so the fact table is never shuffled at all —
    *    the only exchange in the plan is the tiny stats partial agg;
    *  - the threshold compare is exact integer cross-multiplication
    *    (`l_quantity` is integral in this corpus): qty·5·cnt < sumq
    *    avoids the float 0.2·avg entirely.
    *
    * Revenue is an exact DECIMAL sum (the q10 money rule); avg_yearly is
    * that sum's one IEEE division by 7.0. At 100 TB the two lineitem
    * scans (stats + probe) each prune to three columns and the broadcast
    * side stays |parts of one brand| — this is the plan a 1000-executor
    * cluster wants.
    */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
      brand: String = "Brand#4"): DataFrame = {
    val brandParts = part.where(col("p_brand") === brand).select(col("p_partkey"))
    val brandLines = lineitem
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        col("l_extendedprice"))
    val stats = brandLines.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum(col("q")).as("sumq"))
    brandLines
      .join(broadcast(stats), col("l_partkey") === col("pk"))
      .where(col("q") * lit(5L) * col("cnt") < col("sumq"))
      .agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"),
        moneySum(col("l_extendedprice")).as("revenue"),
        (moneySum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q21 shape — "suppliers who kept orders waiting": for each
    * supplier, how many multi-supplier orders did ONLY they ship late
    * on (late = shipped more than `lateDays` days after the order date;
    * this corpus has no receipt/commit dates, so lateness is defined
    * against `o_orderdate`).
    *
    * Q21's EXISTS / NOT EXISTS pair over lineitem collapses into ONE
    * per-order pass: aggregate to (order, supplier, late?) rows, then a
    * window over the order key counts suppliers and late suppliers in
    * the same exchange — no second shuffle, no self-joins. A qualifying
    * row is `late ∧ n_supp ≥ 2 ∧ n_late_supp = 1`. The per-supplier
    * count then shuffles |suppliers| rows, the name join broadcasts the
    * supplier dim, and the top-k is a TakeOrderedAndProject heap.
    *
    * All-integer arithmetic (epoch-day subtraction, flag sums); ties on
    * the waiting count break by supplier key — the ExactTopK total-order
    * convention.
    */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, lateDays: Int = 120, k: Int = 20): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_suppkey"),
      expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000").as("ship_day"))
    val o = orders.select(col("o_orderkey"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("order_day"))
    val perSupp = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("ship_day") - col("order_day") > lateDays, 1L)
        .otherwise(0L)).as("supp_late"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", sum(col("supp_late")).over(w))
      .where(col("supp_late") === 1L && col("n_supp") >= 2L &&
        col("n_late_supp") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
  }

  /** TPC-H Q13 shape (q204) — customer order-count distribution: how many
    * customers placed exactly k orders, INCLUDING the zero-order customers
    * the reference's inner joins always drop (the left-outer + count-of-
    * counts idiom; cf. the manual aggregation loop the reference builds
    * for its one group-by at `batch/ProductReviewAggregation.java:43-47`).
    *
    * Scale shape: orders pre-aggregates to one row per customer (map-
    * combined, one keyed shuffle over orders), the left join runs
    * custkey-keyed against the customer dim on the SAME key (AQE
    * co-partitions the two exchanges), and the final histogram aggregate
    * ships |distinct order counts| rows — never a row per customer past
    * the join. No driver materialization at any cardinality.
    *
    * @return (c_count, custdist) — exact BIGINTs
    */
  def customerDistribution(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q11 shape (q205) — parts whose revenue exceeds num/den × the
    * corpus-average part revenue (default 3/2; this corpus's part revenue
    * is near-uniform, max ≈ 1.8× mean, so Q11's classic 2× selects
    * nothing — 1.5× keeps the top ~1%), with each survivor's share of
    * total revenue in exact ppm. The Q11 HAVING-against-a-global-scalar
    * form: the threshold compare is the integer cross-multiplication
    * `revenue · n_parts · den > num · total` — no division, no float, and
    * (unlike Q11's literal fraction) self-scaling: the predicate selects
    * "heavy" parts at every corpus size.
    *
    * Revenue is exact end-to-end: cents = CAST(DECIMAL(18,2)·100),
    * percent-off = CAST(DECIMAL(18,2)·100), per-row revenue in
    * cent·percent units (10⁻⁴ dollars) is a pure BIGINT product, and the
    * sums are DECIMAL(38,0) (the q103 overflow posture for 100-TB row
    * counts).
    *
    * Scale shape: one map-combined per-part aggregate (the only wide
    * shuffle), a 1-row total aggregated FROM the per-part rows (never a
    * second scan), broadcast back via cross join; the ppm share is one
    * integer division per surviving row.
    *
    * @return (l_partkey, revenue_e4, share_ppm) — revenue in 10⁻⁴ dollars
    */
  def partRevenueShare(lineitem: DataFrame, num: Int = 3, den: Int = 2): DataFrame = {
    val rev = lineitem
      .select(col("l_partkey"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("rev_e4").cast("decimal(38,0)")).as("revenue_e4"))
      .transform(graft.barrier) // read twice: the 1-row total and the output
    val tot = rev.agg(sum(col("revenue_e4")).as("total_e4"),
      count(lit(1)).as("n_parts"))
    rev.crossJoin(broadcast(tot))
      .where(col("revenue_e4") * col("n_parts") * lit(den.toLong) >
        col("total_e4") * lit(num.toLong))
      // ppm share in pure BIGINT integral division: DuckDB's `//` on
      // DECIMAL operands routes through DOUBLE and floors the rounded
      // quotient (observed off-by-one at sf0.01) — BIGINT // BIGINT is
      // exact in both engines
      .select(col("l_partkey"), col("revenue_e4").cast("long").as("revenue_e4"),
        expr("CAST(revenue_e4 AS BIGINT) * 1000000 div CAST(total_e4 AS BIGINT)")
          .as("share_ppm"))
  }

  /** TPC-H Q22 shape (q206) — "idle rich" customers: balance above the
    * positive-balance corpus average AND no order on or after epoch day
    * `recentDay` (this corpus gives every customer SOME order, so Q22's
    * "no orders ever" selects nothing; "gone quiet lately" is the
    * churn-risk form of the same plan), reported per nation. The two
    * classic subqueries become (a) a 1-row aggregate broadcast back with
    * the division avoided entirely — the per-row threshold test is
    * `bal_cents · n_pos > sum_cents` in exact BIGINTs — and (b) a
    * custkey-keyed LEFT ANTI join against the date-filtered orders.
    *
    * Scale shape: the scalar aggregate is map-combined over the customer
    * dim; the anti join is the only wide shuffle (orders filtered by a
    * pushed-down date predicate and projected to the join key,
    * semi-join-shaped so nothing multiplies); the final per-nation
    * aggregate ships |nations| rows.
    *
    * @return (c_nationkey, n_cust, total_cents)
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      recentDay: Long = 11323L): DataFrame = {
    val c = customer.select(col("c_custkey"), col("c_nationkey"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
    val pos = c.where(col("bal_cents") > 0L)
      .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val recent = orders.where(
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          >= recentDay)
      .select(col("o_custkey"))
    c.crossJoin(broadcast(pos))
      .where(col("bal_cents") * col("n_pos") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), sum(col("bal_cents")).as("total_cents"))
  }

  /** Rank-sum AUC (q208) — how well a numeric score separates positives
    * from negatives, computed exactly via the Mann–Whitney U identity
    * instead of any ROC-curve sweep: AUC = (pairs where a positive
    * outscores a negative + half the ties) / (P·N). Everything is exact
    * BIGINT — per-score-group positive/negative counts, a running
    * negative count over the SCORE HISTOGRAM, the doubled pair count
    * `p·(2·cum_n + n)` (doubling absorbs the half-credit ties), and one
    * final ppm floor division.
    *
    * Scale shape: the input collapses to one row per DISTINCT score
    * before any ordering (map-combined aggregate); the unpartitioned
    * running-sum window then runs over the score histogram — bounded by
    * the score's value range (popularity counts here: ≤ max item
    * degree), never by the row count. The q121 lesson applied: global
    * windows only over provably small tables, documented at the call.
    *
    * @param scored rows with a numeric `score` and boolean `is_pos`
    * @return 1 row: (n_pos, n_neg, auc_num2, auc_ppm)
    */
  def aucRankSum(scored: DataFrame): DataFrame = {
    val byScore = scored.groupBy(col("score").as("s"))
      .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("p"),
        sum(when(col("is_pos"), 0L).otherwise(1L)).as("n"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * (col("cum_n") * 2L + col("n"))).as("auc_num2"))
      .withColumn("auc_ppm",
        expr("auc_num2 * 500000 div (n_pos * n_neg)"))
  }

  /** TPC-H Q2 shape (q215) — the argmin join: for every part, the
    * cheapest-balance supplier who ever shipped it (this corpus has no
    * partsupp/supplycost, so supplier account balance stands in for the
    * cost column; the plan shape — dedup, dim join, per-key argmin — is
    * Q2's exactly). Ties break (bal_cents, s_suppkey) ascending, the
    * total-order convention.
    *
    * Scale shape: lineitem collapses to distinct (part, supplier) pairs
    * first (map-combined — the fact table never carries duplicate pairs
    * into the join), the supplier dim broadcasts, and the argmin is a
    * window PARTITIONED BY part over per-part candidate lists bounded by
    * the supplier fan-in. No global sort anywhere.
    *
    * @return (l_partkey, s_suppkey, bal_cents, n_shippers)
    */
  def cheapestShipper(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val ps = lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
    val s = supplier.select(col("s_suppkey"),
      expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("bal_cents"), col("s_suppkey"))
    ps.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_shippers",
        count(lit(1)).over(Window.partitionBy("l_partkey")))
      .where(col("rn") === 1)
      .select(col("l_partkey"), col("s_suppkey"), col("bal_cents"),
        col("n_shippers"))
  }

  /** Gini concentration of part revenue (q216) — how unequal is revenue
    * across the catalog, the Lorenz-curve scalar every assortment review
    * starts from: G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over revenues
    * ascending. Revenue is the q205 exact cent·percent unit; the global
    * ascending index comes from the range-partitioned sort +
    * zipWithIndex indexer (the q186 path — never an unpartitioned
    * row_number), and because Gini is TIE-INVARIANT (equal x values
    * contribute the same Σ i·x under any permutation of their index
    * block) the indexer's arbitrary tie order is harmless. The whole
    * ratio — INCLUDING Σi·x and both products — runs in DECIMAL(38,0):
    * i·x per-row products and n·Σx cross 2⁶³ at ~10⁷ parts of real
    * revenue, and a BIGINT intermediate would silently wrap (non-ANSI)
    * exactly where the oracle's HUGEINT stays exact (the r09 ADVICE
    * finding). DECIMAL first, multiply after — same order of operations
    * as the oracle.
    *
    * @return 1 row: (n_parts, total_e4, weighted_sum_shr30, gini_ppm) —
    *         the Σi·x diagnostic ships 2³⁰-down-shifted (the q179
    *         pattern): the raw sum crossed 2⁶³ at the sf1.0 sweep
    *         (3.4·10²⁰ observed), so a BIGINT surface column must carry
    *         a fixed exact shift; both engines floor the same shift.
    */
  def giniRevenue(lineitem: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rev = lineitem
      .select(col("l_partkey"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("rev_e4")).as("x"))
    val idx = graft.streaming.Replay.indexed(rev.select(col("x")), "x")
      .select((col("__idx") + 1).as("i"), col("x"))
    idx.agg(count(lit(1)).as("n_parts"), sum(col("x")).as("total_e4"),
        sum(dec(col("i")) * dec(col("x"))).as("weighted_sum"))
      .select(col("n_parts"), col("total_e4"),
        // surfaced as BIGINT (the fetch-path-portable type) after a fixed
        // 2^30 exact down-shift — the raw Σi·x overflowed int64 at sf1.0;
        // the decimal carry stays internal to the ratio below
        expr("CAST(weighted_sum div 1073741824 AS BIGINT)")
          .as("weighted_sum_shr30"),
        // `div` (IntegralDivide), NOT decimal `/`: the latter rounds at
        // the result scale where both engines must FLOOR identically
        expr("""CAST((CAST(2 AS DECIMAL(38,0)) * weighted_sum
               - CAST(n_parts + 1 AS DECIMAL(38,0)) * CAST(total_e4 AS DECIMAL(38,0)))
               * 1000000
               div (CAST(n_parts AS DECIMAL(38,0)) * CAST(total_e4 AS DECIMAL(38,0)))
               AS BIGINT)""").as("gini_ppm"))
  }

  /** TPC-H Q4 shape (q230) — order-priority checking: per priority, how
    * many orders placed in one quarter had at least one LATE line (this
    * corpus carries no l_commitdate/l_receiptdate, so "late" is
    * shipdate > orderdate + 30 days — the same EXISTS-decorrelation
    * exercise on the columns the generator provides). The correlated
    * EXISTS plans as one LEFT SEMI equi-join on orderkey with the
    * lateness residual — never a per-order subquery.
    *
    * Scale shape: the date cut pushes into the orders scan, the semi
    * join is orderkey-keyed (the fact table's natural key), and the
    * report is a ≤ |priorities|-row map-combined count.
    *
    * @return (o_orderpriority, order_count)
    */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame,
      fromDay: Long = 9862L, toDay: Long = 9952L,
      lateDays: Long = 30L): DataFrame = {
    val o = orders
      .withColumn("o_day",
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
      .where(col("o_day") >= fromDay && col("o_day") < toDay)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_day"))
    val l = lineitem.select(col("l_orderkey"),
      expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("ship_day"))
    o.join(l, col("l_orderkey") === col("o_orderkey")
        && col("ship_day") > col("o_day") + lateDays, "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q12 shape (q231) — the two-level conditional count: per
    * order priority, lines shipped very late (> 60 days after the
    * order) vs lines shipped on time, plus the exact ppm late share
    * (the corpus has no l_shipmode, so priority plays the grouping
    * role — the plan shape is Q12's exactly: one fact-dim equi-join,
    * conditional sums, no second pass).
    *
    * @return (o_orderpriority, n_lines, n_late, late_ppm)
    */
  def lateLinesByPriority(orders: DataFrame, lineitem: DataFrame,
      lateDays: Long = 60L): DataFrame = {
    val o = orders.select(col("o_orderkey"), col("o_orderpriority"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("o_day"))
    lineitem
      .select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
          .as("ship_day"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("ship_day") > col("o_day") + lateDays, 1L).otherwise(0L))
          .as("n_late"))
      .withColumn("late_ppm", expr("n_late * 1000000 div n_lines"))
  }

  /** TPC-H Q14 shape (q232) — promotion revenue share: of one month's
    * lineitem revenue, what fraction came from PROMO-type parts. The
    * part dim broadcasts; revenue is the exact cent·percent unit
    * (q205's e4 grade) so the share is one integer ppm floor — Q14's
    * `100 * sum(case …) / sum(…)` with the float division replaced by
    * the suite's exact idiom.
    *
    * @return 1 row: (n_lines, promo_e4, total_e4, promo_ppm)
    */
  def promoRevenueShare(part: DataFrame, lineitem: DataFrame,
      fromDay: Long = 9862L, toDay: Long = 9893L): DataFrame = {
    val p = part.select(col("p_partkey"),
      (col("p_type") === "PROMO").as("is_promo"))
    lineitem
      .where(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .between(fromDay, toDay - 1))
      .select(col("l_partkey"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("is_promo"), col("rev_e4")).otherwise(0L)).as("promo_e4"),
        sum(col("rev_e4")).as("total_e4"))
      // DECIMAL-first: promo_e4·10⁶ wraps BIGINT once the month's revenue
      // passes ~9·10¹² e4-units (≈ SF 5 here) — the oracle's HUGEINT order
      .withColumn("promo_ppm",
        expr("""CAST(CAST(promo_e4 AS DECIMAL(38,0)) * 1000000
               div total_e4 AS BIGINT)"""))
  }

  /** TPC-H Q19 shape (q233) — disjunctive bracket revenue: the sum of
    * discounted revenue over an OR of three (brand, size-range,
    * quantity-range) brackets. Q19's point is the OPTIMIZER exercise:
    * the common `l_partkey = p_partkey` conjunct must stay an equi-join
    * with the disjunction as a residual filter (never a nested-loop
    * over the OR), and the per-bracket predicates must not block
    * pushdown of the join keys. Revenue in exact e4 units; bracket
    * membership reported per bracket for auditability.
    *
    * @return 1 row: (n_lines, b1_lines, b2_lines, b3_lines, revenue_e4)
    */
  def bracketRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val p = part.select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = lineitem.select(col("l_partkey"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
        (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
        .as("rev_e4"))
    val b1 = col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
      col("qty").between(1, 20)
    val b2 = col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
      col("qty").between(10, 35)
    val b3 = col("p_brand") === "Brand#19" && col("p_size").between(20, 50) &&
      col("qty").between(25, 50)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(b1 || b2 || b3)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(b1, 1L).otherwise(0L)).as("b1_lines"),
        sum(when(b2, 1L).otherwise(0L)).as("b2_lines"),
        sum(when(b3, 1L).otherwise(0L)).as("b3_lines"),
        sum(col("rev_e4")).as("revenue_e4"))
  }

  /** TPC-H Q6 shape (q240) — the forecast-revenue-change query: one
    * tight scan with THREE pushable range predicates (ship-date year,
    * discount band, quantity cap) and a single sum — the canonical
    * filter-pushdown benchmark. Revenue here is Q6's
    * Σ extendedprice·discount in exact cent·percent (e4) units; the
    * plan must be scan → partial agg → 1-row exchange, nothing else.
    *
    * @return 1 row: (n_lines, revenue_e4)
    */
  def forecastRevenue(lineitem: DataFrame, fromDay: Long = 9862L,
      toDay: Long = 10227L): DataFrame =
    lineitem
      .where(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .between(fromDay, toDay - 1))
      .where(expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .between(5L, 7L))
      .where(col("l_quantity") < 24.0)
      .select((expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
        expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("rev_e4"))
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(col("rev_e4")), lit(0L)).as("revenue_e4"))

  /** TPC-H Q10 shape (q241) — returned-item reporting: the top-20
    * customers by revenue lost to returns in one quarter. Fact-fact
    * equi-join (lineitem⋈orders on the natural key), per-customer
    * aggregate, customer dim joined AFTER the aggregate (|customers|
    * rows, not |lineitem|), top-k heap. Exact e4 revenue.
    *
    * @return (c_custkey, c_nationkey, n_lines, lost_e4) — top 20 by
    *         (lost_e4 DESC, c_custkey)
    */
  def returnedRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, fromDay: Long = 9862L, toDay: Long = 9952L,
      k: Int = 20): DataFrame = {
    val o = orders
      .where(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .between(fromDay, toDay - 1))
      .select(col("o_orderkey"), col("o_custkey"))
    val lost = lineitem.where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_e4")).as("lost_e4"))
    lost.join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("lost_e4").desc, col("c_custkey"))
      .limit(k)
      .select(col("c_custkey"), col("c_nationkey"), col("n_lines"),
        col("lost_e4"))
  }

  /** TPC-H Q18 shape (q242) — large-volume customers: orders whose
    * total line quantity exceeds a threshold, with their customer and
    * order facts, top-k by (order total DESC). The per-order HAVING
    * aggregate runs FIRST (map-combined on the fact table's key), so
    * the joins only ever see the tiny qualifying-order set. Quantity
    * sums exact BIGINT; totalprice surfaces in exact cents.
    *
    * @return (o_orderkey, o_custkey, total_qty, total_cents) — top k by
    *         (total_cents DESC, o_orderkey)
    */
  def bigOrders(orders: DataFrame, lineitem: DataFrame,
      minQty: Long = 250L, k: Int = 20): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("total_qty"))
      .where(col("total_qty") > minQty)
    orders
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("total_cents"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(k)
      .select(col("o_orderkey"), col("o_custkey"), col("total_qty"),
        col("total_cents"))
  }

  /** TPC-H Q7 shape (q247) — volume shipping between two nations: line
    * revenue where the SUPPLIER sits in one nation and the CUSTOMER in
    * the other (both directions), per (supp_nation, cust_nation,
    * ship-year). The join-order exercise: both nation-keyed dims
    * broadcast onto their fact keys BEFORE the fact-fact join, and the
    * nation-pair filter prunes early. Exact e4 revenue; the year from
    * the epoch-day floor both engines share.
    *
    * @return (supp_nation, cust_nation, l_year, n_lines, revenue_e4)
    */
  def nationTrade(nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n = nation.select(col("n_nationkey"), col("n_name"))
      .where(col("n_name").isin(nationA, nationB))
    val c = customer.join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val s = supplier.join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = orders.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000) div 365")
          .as("l_year"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_e4")).as("revenue_e4"))
  }

  /** TPC-H Q15 shape (q248) — top supplier(s) by one quarter's shipped
    * revenue, INCLUDING ties (Q15's defining wrinkle: the view's max is
    * re-joined, so equal-revenue suppliers all surface). The max is a
    * broadcast 1-row aggregate over the |suppliers|-row revenue table;
    * exact e4 revenue makes the tie compare exact where Q15's float
    * view can plausibly diverge.
    *
    * @return (s_suppkey, total_e4) — every supplier at the max
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
      fromDay: Long = 9862L, toDay: Long = 9952L): DataFrame = {
    val rev = lineitem
      .where(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .between(fromDay, toDay - 1))
      .select(col("l_suppkey"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("rev_e4")).as("total_e4"))
      .transform(graft.barrier) // read by the max and the tie filter
    val mx = rev.agg(max(col("total_e4")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .where(col("total_e4") === col("mx"))
      .join(supplier.select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("total_e4"))
  }

  /** TPC-H Q8 shape (q252) — national market share: of the revenue
    * flowing to customers in one REGION, what fraction is supplied by
    * one NATION, per ship-year. The deepest star in the suite (region →
    * nation → customer → orders → lineitem ← supplier → nation), with
    * every dimension chain broadcast and the share as an exact ppm
    * floor over e4 revenue — Q8's `sum(case …)/sum(…)` without the
    * float division.
    *
    * Sum bound: e4 revenue sums wrap BIGINT at ~9·10⁹ rows per group —
    * past that, swap the two sums to DECIMAL(38,0); shape unchanged
    * (the ppm product already runs DECIMAL-first).
    *
    * @return per year: (l_year, nation_e4, total_e4, share_ppm)
    */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      regionName: String = "ASIA", nationName: String = "NATION_1")
      : DataFrame = {
    val rn = nation.join(broadcast(region.where(col("r_name") === regionName)
        .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val c = customer.join(broadcast(rn),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val o = orders.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    val sn = supplier.join(broadcast(nation
        .where(col("n_name") === nationName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), lit(1L).as("is_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000) div 365")
          .as("l_year"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy(col("l_year"))
      .agg(coalesce(sum(when(col("is_nation") === 1L, col("rev_e4"))), lit(0L))
          .as("nation_e4"),
        sum(col("rev_e4")).as("total_e4"))
      // DECIMAL-first for the same reason as promoRevenueShare's ppm
      .withColumn("share_ppm",
        expr("""CAST(CAST(nation_e4 AS DECIMAL(38,0)) * 1000000
               div total_e4 AS BIGINT)"""))
  }

  /** TPC-H Q16 shape (q253) — supplier counts per part class: for each
    * (brand, size band), how many DISTINCT suppliers have ever shipped
    * such a part, excluding one brand (Q16's NOT-clause). This corpus
    * has no partsupp table, so shipped (part, supplier) pairs from
    * lineitem stand in for it — the plan shape is Q16's exactly:
    * distinct pair reduction FIRST (map-combined on the fact key), the
    * part dim broadcast after, count-distinct per class.
    *
    * @return (p_brand, size_band, n_parts, n_suppliers)
    */
  def partSupplierCounts(part: DataFrame, lineitem: DataFrame,
      excludeBrand: String = "Brand#13"): DataFrame = {
    val ps = lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
    val p = part.where(col("p_brand") =!= excludeBrand)
      .select(col("p_partkey"), col("p_brand"),
        expr("CAST(p_size AS BIGINT) div 10").as("size_band"))
    ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("size_band"))
      .agg(count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_suppliers"))
  }

  /** Incremental aggregate maintenance (q263) — the TPC-H refresh-
    * function exercise (RF1 inserts / RF2 deletes) as an IVM proof: a
    * revenue-per-returnflag aggregate is maintained under a delta by
    * combining three partial aggregates — old state minus delete
    * contributions plus insert contributions — and the graded output
    * carries BOTH the maintained and the directly-recomputed answers
    * with an equality flag. Additive aggregates (count, integer-e4 sum)
    * make the maintenance exact: no rescan of the base is ever needed
    * in production (the recompute here exists to PROVE the identity).
    *
    * Deterministic delta: deletes = orderkey ≡ 0 (mod 13); inserts =
    * the disjoint orderkey ≢ 0 (mod 13) ∧ ≡ 0 (mod 17) slice. Old
    * state = all minus inserts; target state = all minus deletes.
    *
    * Scale shape: four map-combined aggregates over one barriered
    * 3-column scan, joined on the ≤ |returnflags|-row group key. At
    * 100 TB the incremental path reads only the delta partitions.
    *
    * @return per flag: (l_returnflag, n_maintained, rev_maintained_e4,
    *         n_direct, rev_direct_e4, maintained_ok)
    */
  def incrementalRevenue(lineitem: DataFrame): DataFrame = {
    val l = lineitem.select(col("l_returnflag"), col("l_orderkey"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"),
        (col("l_orderkey") % 13L === 0L).as("is_del"),
        (col("l_orderkey") % 13L =!= 0L && col("l_orderkey") % 17L === 0L)
          .as("is_ins"))
      .transform(graft.barrier) // read by the four partial aggregates
    def slice(cond: Column, n: String, rev: String): DataFrame =
      l.where(cond).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as(n), sum(col("rev_e4")).as(rev))
    val old = slice(!col("is_ins"), "n_old", "rev_old")
    val del = slice(col("is_del"), "n_del", "rev_del")
    val ins = slice(col("is_ins"), "n_ins", "rev_ins")
    val direct = slice(!col("is_del"), "n_direct", "rev_direct_e4")
    old
      .join(del, Seq("l_returnflag"), "full_outer")
      .join(ins, Seq("l_returnflag"), "full_outer")
      .join(direct, Seq("l_returnflag"), "full_outer")
      .select(col("l_returnflag"),
        (coalesce(col("n_old"), lit(0L)) - coalesce(col("n_del"), lit(0L))
          + coalesce(col("n_ins"), lit(0L))).as("n_maintained"),
        (coalesce(col("rev_old"), lit(0L)) - coalesce(col("rev_del"), lit(0L))
          + coalesce(col("rev_ins"), lit(0L))).as("rev_maintained_e4"),
        coalesce(col("n_direct"), lit(0L)).as("n_direct"),
        coalesce(col("rev_direct_e4"), lit(0L)).as("rev_direct_e4"))
      .withColumn("maintained_ok",
        col("n_maintained") === col("n_direct")
          && col("rev_maintained_e4") === col("rev_direct_e4"))
  }

  /** Snapshot diff (q264) — the table-versioning audit every lakehouse
    * runs between two versions of a keyed table: rows ADDED, REMOVED,
    * CHANGED (key present in both, payload checksum differs), and
    * UNCHANGED, via ONE full outer join on the key with an md5-prefix32
    * payload checksum on each side (never a column-by-column compare —
    * the checksum makes the diff schema-stable and the shuffle narrow).
    * Versions are simulated deterministically: the "old" snapshot lacks
    * the orderkey ≡ 0 (mod 29) slice (those diff as added), the "new"
    * lacks ≡ 0 (mod 23) (removed), and ≡ 0 (mod 19) rows ship a bumped
    * totalprice in new (changed).
    *
    * @return 1 row: (n_added, n_removed, n_changed, n_unchanged)
    */
  def snapshotDiff(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_e2"),
        col("o_orderstatus"), col("o_orderpriority"))
      .transform(graft.barrier) // read by both snapshot projections
    def checksum(price: Column): Column =
      graft.functions.TextAnalysis.md5Prefix32(concat_ws("",
        price.cast("string"), col("o_orderstatus"), col("o_orderpriority")))
    val oldSnap = base.where(col("o_orderkey") % 29L =!= 0L)
      .select(col("o_orderkey").as("k"), checksum(col("price_e2")).as("ck_old"))
    val newSnap = base.where(col("o_orderkey") % 23L =!= 0L)
      .select(col("o_orderkey").as("k"),
        checksum(when(col("o_orderkey") % 19L === 0L,
          col("price_e2") + 100L).otherwise(col("price_e2"))).as("ck_new"))
    oldSnap.join(newSnap, Seq("k"), "full_outer")
      .agg(
        sum(when(col("ck_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("ck_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("ck_old").isNotNull && col("ck_new").isNotNull
          && col("ck_old") =!= col("ck_new"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("ck_old") === col("ck_new"), 1L).otherwise(0L))
          .as("n_unchanged"))
  }

  /** CDC MERGE apply (q277) — the lakehouse upsert: apply a change
    * stream of I(nsert)/U(pdate)/D(elete) operations to a keyed state
    * table in ONE full outer join (never a per-op pass), and grade the
    * result with the order-invariant [[tableChecksum]] idiom so the
    * applied state compares across engines without shipping it. The
    * change set is derived deterministically from the same table
    * (inserts = keys ≡ 0 mod 31 re-keyed +10⁹, updates = ≡ 0 mod 11
    * with price bumped, deletes = ≡ 0 mod 7), with precedence
    * D > U > I per key and unmatched-change inserts landing as new
    * rows — MERGE INTO's matched/not-matched semantics exactly.
    *
    * Scale shape: one key-equi full outer join (state shuffles once on
    * its key — the join a Delta/Iceberg MERGE plans), map-side hashing,
    * constant-size output.
    *
    * @return 1 row: (n_before, n_inserted, n_updated, n_deleted,
    *         n_after, state_checksum)
    */
  def cdcApply(orders: DataFrame): DataFrame = {
    val state = orders.select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_e2"), col("o_orderstatus").as("status"))
      .transform(graft.barrier) // read by the change derivation and the join
    val changes = state.where(col("k") % 7L === 0L)
      .select(col("k"), lit(null).cast("long").as("c_price"),
        lit(null).cast("string").as("c_status"), lit("D").as("op"))
      .unionAll(state.where(col("k") % 7L =!= 0L && col("k") % 11L === 0L)
        .select(col("k"), (col("price_e2") + 500L).as("c_price"),
          col("status").as("c_status"), lit("U").as("op")))
      .unionAll(state.where(col("k") % 31L === 0L)
        .select((col("k") + 1000000000L).as("k"), col("price_e2").as("c_price"),
          col("status").as("c_status"), lit("I").as("op")))
    val applied = state.join(changes, Seq("k"), "full_outer")
      .where(coalesce(col("op"), lit("")) =!= "D")
      .select(col("k"),
        coalesce(col("c_price"), col("price_e2")).as("price_e2"),
        coalesce(col("c_status"), col("status")).as("status"),
        col("op"))
      .transform(graft.barrier) // read by the counts and the checksum
    val counts = applied.agg(count(lit(1)).as("n_after"),
      sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserted"),
      sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updated"))
    val before = state.agg(count(lit(1)).as("n_before"))
    val deleted = changes.where(col("op") === "D")
      .agg(count(lit(1)).as("n_deleted"))
    val checksum = applied.agg(
      sum(rowHash(Seq("k", "price_e2", "status"))).as("state_checksum"))
    before.crossJoin(broadcast(counts)).crossJoin(broadcast(deleted))
      .crossJoin(broadcast(checksum))
      .select(col("n_before"), col("n_inserted"), col("n_updated"),
        col("n_deleted"), col("n_after"), col("state_checksum"))
  }

  /** Ranking-family ties report (q278) — row_number vs rank vs
    * dense_rank vs percent_rank over the SAME deterministic order, on a
    * column with real ties (customer balances bucketed to whole
    * dollars): the four semantics differ exactly at ties, and this
    * report pins each engine to the same answers. percent_rank is kept
    * exact as the ppm floor (rank−1)·10⁶ div (n−1) rather than the
    * engines' native float. Top-5 per market segment by the tie-prone
    * key, deterministic final tiebreak on custkey only INSIDE
    * row_number (the others must see the ties).
    *
    * @return ≤ 5·|segments| rows: (c_mktsegment, bal_dollars, c_custkey,
    *         rn, rnk, drnk, pr_ppm)
    */
  def rankFamily(customer: DataFrame, k: Int = 5): DataFrame = {
    val byBal = Window.partitionBy("c_mktsegment")
      .orderBy(col("bal_dollars").desc, col("c_custkey"))
    val tied = Window.partitionBy("c_mktsegment")
      .orderBy(col("bal_dollars").desc)
    val base = customer.select(col("c_mktsegment"), col("c_custkey"),
      expr("CAST(floor(c_acctbal) AS BIGINT)").as("bal_dollars"))
    base
      .withColumn("rn", row_number().over(byBal).cast("long"))
      .withColumn("rnk", rank().over(tied).cast("long"))
      .withColumn("drnk", dense_rank().over(tied).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("c_mktsegment")))
      .where(col("rn") <= k)
      .select(col("c_mktsegment"), col("bal_dollars"), col("c_custkey"),
        col("rn"), col("rnk"), col("drnk"),
        expr("CASE WHEN n = 1 THEN 0 ELSE (rnk - 1) * 1000000 div (n - 1) END")
          .as("pr_ppm"))
  }

  /** TPC-H Q20 shape (q255) — promotion-stock suppliers: per nation, the
    * suppliers who shipped MORE THAN TWICE the average supplier's share
    * of some pattern-named part (this corpus has no partsupp/availqty,
    * so Q20's "availqty > half the year's demand" becomes dominant-
    * shipper-of-a-part — the same nested semi-join chain: part-name
    * prune → correlated per-part quantity subquery → supplier semi-join
    * → nation rollup). The 2×-average compare cross-multiplies exact:
    * pair_qty·n_suppliers > 2·part_qty, all e2 — no float share. (A
    * strict-majority cut was measured degenerate on this corpus: parts
    * spread over 10–51 near-uniform suppliers, so no pair ever clears
    * 50%; the relative-to-average cut keeps the identical plan with a
    * non-trivial answer at every SF.)
    *
    * Scale shape: the name prune broadcasts into the fact scan FIRST, so
    * both aggregates run on the 1/|patterns| slice; the per-pair and
    * per-part aggregates share one shuffle (partkey prefix); the final
    * rollup is |nations| rows. A supplier counts once per nation however
    * many parts it dominates (count DISTINCT). Product bound:
    * pair_qty_e2·n_suppliers wraps only past ~10¹⁵ qty-units·suppliers
    * per part — swap to DECIMAL(38,0) beyond that, shape unchanged.
    *
    * @return per nation: (n_name, n_suppliers)
    */
  def promotionSuppliers(nation: DataFrame, supplier: DataFrame,
      part: DataFrame, lineitem: DataFrame,
      namePattern: String = "cold"): DataFrame = {
    val p = part.where(col("p_name").contains(namePattern))
      .select(col("p_partkey"))
    val pairQty = lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("qty_e2"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty_e2")).as("pair_qty_e2"))
      .transform(graft.barrier) // read by the per-part total and the compare
    val partQty = pairQty.groupBy(col("l_partkey"))
      .agg(sum(col("pair_qty_e2")).as("part_qty_e2"),
        count(lit(1)).as("n_suppliers_part"))
    pairQty
      .join(partQty.select(col("l_partkey").as("pk"), col("part_qty_e2"),
        col("n_suppliers_part")), col("l_partkey") === col("pk"))
      .where(col("pair_qty_e2") * col("n_suppliers_part")
        > col("part_qty_e2") * 2L)
      .select(col("l_suppkey")).distinct()
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"))
  }

  /** TPC-H Q9 shape (q254) — product-line profit per supplier nation ×
    * ship-year, for parts whose name contains a pattern (Q9's
    * `p_name LIKE '%green%'` — the contains-pushdown exercise: the
    * substring filter must reach the part scan, and only the surviving
    * keys join the fact table). This corpus has no partsupp/supplycost,
    * so profit is the discounted-revenue side of Q9's expression —
    * documented proxy, identical plan shape.
    *
    * Sum bound: profit_e4 wraps BIGINT at ~9·10⁹ rows per
    * (nation, year) group — swap to DECIMAL(38,0) past that.
    *
    * @return (n_name, l_year, n_lines, profit_e4)
    */
  def productProfit(nation: DataFrame, supplier: DataFrame, part: DataFrame,
      lineitem: DataFrame, namePattern: String = "widget"): DataFrame = {
    val p = part.where(col("p_name").contains(namePattern))
      .select(col("p_partkey"))
    lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000) div 365")
          .as("l_year"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")))
          .as("rev_e4"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_year"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_e4")).as("profit_e4"))
  }

  /** Mann–Whitney U drift audit (q236) — per source, the exact
    * rank-sum statistic of that source's document lengths against the
    * rest of the corpus, the nonparametric "is this source's length
    * distribution shifted?" test beside q172's KS/W1 distances. On the
    * same (source, value) count grid as q172, with MIDRANKS kept
    * integer by doubling: 2·midrank(v) = 2·(#values below v) + g_v + 1,
    * so 2·R₁ = Σ_v c_v·(2·cum_below + g_v + 1) and 2·U₁ = 2·R₁ −
    * n₁(n₁+1) are exact BIGINTs both engines aggregate identically.
    * The normalized effect size (the AUC / common-language effect,
    * U/(n₁·n₂)) ships as one ppm floor.
    *
    * Scale shape: the q172 argument verbatim — one map-combined
    * (source, value) count is the corpus-wide work; the grid is
    * |sources| × |distinct lengths| metadata with per-source windows.
    *
    * @return per source: (source, n_s, n_rest, u2, auc_ppm)
    */
  def mannWhitneyDrift(documents: DataFrame): DataFrame = {
    val vc = documents.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
      .transform(graft.barrier) // grid + margins + globals
    val srcs = vc.groupBy("source").agg(sum(col("c")).as("n_s"))
    val tot = srcs.agg(sum(col("n_s")).as("n"))
    val gv = vc.groupBy("v").agg(sum(col("c")).as("g"))
    val wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    // global rank scaffold: ≤ |distinct lengths| rows — metadata-sized,
    // so the unpartitioned running sum is bounded (the q162 argument)
    val ranks = gv
      .withColumn("below", coalesce(sum(col("g")).over(wv), lit(0L)))
      .select(col("v"), col("g"), col("below"))
    vc.join(broadcast(ranks), "v")
      .groupBy(col("source"))
      // decimal-first (the gini/bm25 rule): c·below crosses 2⁶³ past
      // ~2·10⁹ rows; the surfaced u2 ≤ 2·n_s·n_rest fits BIGINT through
      // the same envelope and is documented exact within it
      .agg(sum(col("c").cast("decimal(38,0)")
        * (lit(2L) * col("below") + col("g") + 1L)).as("r2"))
      .join(broadcast(srcs), "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), (col("n") - col("n_s")).as("n_rest"),
        (col("r2") - col("n_s").cast("decimal(38,0)") * (col("n_s") + 1L))
          .cast("long").as("u2"))
      // u2 = 2·U ∈ [0, 2·n_s·n_rest]; AUC ppm = u2·5·10⁵ / (n_s·n_rest)
      .withColumn("auc_ppm",
        expr("""CAST(CAST(u2 AS DECIMAL(38,0)) * 500000
               div (CAST(n_s AS DECIMAL(38,0)) * n_rest) AS BIGINT)"""))
  }

  private def statCols: Seq[Column] = {
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val sy = col("sy").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    Seq(
      col("event_type"),
      col("n"),
      (sx / n).as("mean_value"),
      ((n * sxy - sx * sy) / (n * n)).as("covar_pop"),
      sqrt((n * sxx - sx * sx) / (n * n)).as("stddev_pop_value"),
      ((n * sxy - sx * sy)
        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_value_user"))
  }
}

/** [[Relational.bootstrapCI]]'s Poisson(1) multiplicity table — the
  * [[DpNoise]] one-JVM trick: cumulative thresholds ⌊CDF(k)·2³²⌋ for
  * k = 0..4 (mass beyond 5 is < 4·10⁻⁴ and truncates to 5), embedded
  * as identical literals in both engines. multiplicity =
  * |{k : u ≥ T_k}| for u uniform on [0, 2³²).
  */
object PoissonBoot {
  val thresholds: Seq[Long] = {
    val pmf = (0 to 4).scanLeft(0.0) { (acc, k) =>
      acc + math.exp(-1.0) / (1 to k).product.toDouble
    }.tail // CDF(0..4)
    pmf.map(c => math.floor(c * 4294967296.0).toLong)
  }
}

/** [[Relational.benfordAudit]]'s expected first-digit shares as exact
  * parts-per-billion: ⌊log₁₀(1+1/d)·10⁹⌋ for d = 1..9 — computed once
  * here and embedded as literals in both engines' plans.
  */
object BenfordExpected {
  val ppb: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e9).toLong)
}

/** The [[Relational.dpNoisedCounts]] noise table, shared verbatim with
  * the oracle-SQL builder so both engines fold over IDENTICAL integer
  * literals (one JVM computes them; the doubles never cross an engine
  * boundary).
  *
  * Two-sided geometric with α = e^−ε, ε = 0.25. Closed-form CDF:
  * k < 0 → α^−k / (1+α);  k ≥ 0 → 1 − α^(k+1) / (1+α). Thresholds are
  * ⌊CDF(k)·2³²⌋ for k = −15..14 (k = 15 is the implicit 2³² cap), so
  * noise = −15 + |{k : u ≥ T_k}| for u uniform on [0, 2³²).
  */
object DpNoise {
  val epsilon: Double = 0.25
  private val alpha = math.exp(-epsilon)
  val thresholds: Seq[Long] = (-15 to 14).map { k =>
    val c = if (k < 0) math.pow(alpha, -k) / (1 + alpha)
            else 1.0 - math.pow(alpha, k + 1) / (1 + alpha)
    math.floor(c * 4294967296.0).toLong
  }
}
