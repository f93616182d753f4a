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

/** Registry: graph-analytics queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object GraphRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
        Reco.goodRatings(EntryHelpers.ratingsDf(s, dir))
          .select(col("userId"), col("productId")).distinct())),
    // J2 rows 2.9-2.11 — label propagation communities
    "q06_communities" -> ((s, dir) => communityLabels(s, dir)),
    // J2 row 2.12 — community sizes
    "q07_community_sizes" -> ((s, dir) => Reco.communitySizes(communityLabels(s, dir))),
    // Connected components over the co-rating graph — bounded alternating
    // large-star/small-star DataFrame rounds (GraphX Pregel fixpoint remains
    // as the interop cross-check in GraphOps/GraphSpec). Edge direction is
    // irrelevant to CC, so the canonical pair list feeds it directly.
    "q19_connected_components" -> ((s, dir) =>
      graft.plans.GraphOps.connectedComponentsDF(coPairs(s, dir))),
    // community conductance: cut/min(vol, 2m-vol) per LP community in
    // exact ppm — the Cheeger grade beside q198's modularity
    "q234_conductance" -> ((s, dir) =>
      plans.GraphOps.conductance(communityLabels(s, dir), coPairs(s, dir))),
    // log2-bucket degree histogram of the co-rating graph — the skew
    // gate for every per-vertex fan-out, pure map-combined aggregates
    "q238_degree_histogram" -> ((s, dir) =>
      plans.GraphOps.degreeHistogram(coPairs(s, dir))),
    // two-hop reach per vertex: distinct friends-of-friends audience —
    // the neighborhood function's first step, wedge-join envelope
    "q251_two_hop_reach" -> ((s, dir) =>
      plans.GraphOps.twoHopReach(coPairs(s, dir))),
    // HyperBall-register two-hop reach beside q251's exact: constant
    // HLL state per vertex, exact totals + in-query 5% L1 bound graded
    "q256_approx_reach" -> ((s, dir) =>
      plans.GraphOps.twoHopReachApprox(coPairs(s, dir))),
    // random walk with restart from a deterministic seed set — q96's
    // exact integer-mass rounds with seeded teleport
    "q257_personalized_pagerank" -> ((s, dir) =>
      plans.GraphOps.personalizedPageRank(Reco.undirected(coPairs(s, dir)))
        .select(col("v").as("user_id"), col("r").as("ppr_scaled"))),
    // resource-allocation link prediction: 1/deg(center) wedge weights
    // as exact 1e9-floor integers, beside q154's Jaccard
    "q265_resource_allocation" -> ((s, dir) =>
      plans.GraphOps.resourceAllocation(coPairs(s, dir))),
    // Luby's maximal independent set: md5-packed strict priorities,
    // 3 bounded rounds, honest undecided residual
    "q270_luby_mis" -> ((s, dir) =>
      plans.GraphOps.lubyMIS(coPairs(s, dir))),
    // double-sweep diameter lower bound: two bounded BFS passes, the
    // second from the first sweep's farthest vertex
    "q276_diameter_bound" -> ((s, dir) =>
      plans.GraphOps.diameterLowerBound(Reco.undirected(coPairs(s, dir)))),
    // edge-embeddedness histogram over the co-rating graph — local
    // bridges at 0, wedge-join candidates, exact counts
    "q203_edge_embeddedness" -> ((s, dir) =>
      plans.GraphOps.edgeEmbeddedness(coPairs(s, dir))),
    // Newman modularity per LP community — exact integer numerators
    // 4m·e_c − d_c² over the memoized labels + pair seams
    "q198_modularity" -> ((s, dir) =>
      plans.GraphOps.modularity(communityLabels(s, dir), coPairs(s, dir))),
  )

  def oracles: Map[String, String] = Map(
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
    "q06_communities" ->
      s"""$graphPrefix
         |SELECT id, label FROM l5""".stripMargin,
    "q07_community_sizes" ->
      s"""$graphPrefix
         |SELECT label, count(*) AS members FROM l5 GROUP BY label""".stripMargin,
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
  )
}
