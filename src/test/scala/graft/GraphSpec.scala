package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco
import graft.plans.{GraphOps, LabelPropagation}

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val twoTriangles =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L))

  test("connected components: two triangles -> two components keyed by min id") {
    val cc = GraphOps.connectedComponents(
      spark, Reco.undirected(twoTriangles.toDF("src", "dst")))
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L && cc(12L) === 10L)
  }

  test("large-star/small-star DF CC: two triangles + chain + isolated-pair fixture") {
    // chain 20-21-22-23 exercises multi-hop collapse; pair 30-31 a 2-star
    val edges = (twoTriangles ++ Seq((21L, 20L), (21L, 22L), (23L, 22L), (30L, 31L)))
      .toDF("src", "dst")
    val cc = GraphOps.connectedComponentsDF(edges).as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("DF CC matches GraphX CC labels on the real co-rating graph (sf0.001)") {
    val pairs = Reco.coRatingPairs(Reco.goodRatings(Tables.ratings(spark, TestSpark.sf)))
      .localCheckpoint()
    val df = GraphOps.connectedComponentsDF(pairs).as[(Long, Long)].collect().toMap
    val gx = GraphOps.connectedComponents(spark, Reco.undirected(pairs))
      .as[(Long, Long)].collect().toMap
    assert(df === gx)
  }

  test("LP communities never span connected components (real graph, sf0.001)") {
    val edges = Reco.undirected(
      Reco.coRatingPairs(Reco.goodRatings(Tables.ratings(spark, TestSpark.sf))))
      .localCheckpoint()
    val lp = LabelPropagation.run(edges).as[(Long, Long)].collect().toMap
    val cc = GraphOps.connectedComponents(spark, edges).as[(Long, Long)].collect().toMap
    // all vertices sharing an LP label are in the same component
    lp.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(cc).toSet.size === 1)
    }
  }

  test("triangleCount: hand-computed graphs and GraphX cross-check on the real graph") {
    // K4 has C(4,3) = 4 triangles; adding a pendant vertex changes nothing
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) :+ ((4L, 9L))
    assert(GraphOps.triangleCount(k4.toDF("src", "dst"))
      .as[Long].head() === 4L)
    // a square (4-cycle) has none; one diagonal makes two
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(GraphOps.triangleCount(square.toDF("src", "dst")).as[Long].head() === 0L)
    assert(GraphOps.triangleCount((square :+ ((1L, 3L))).toDF("src", "dst"))
      .as[Long].head() === 2L)
    // real co-rating graph: agree with GraphX's TriangleCount (which
    // reports per-vertex counts — each triangle touches 3 vertices)
    val pairs = Reco.coRatingPairs(Reco.goodRatings(Tables.ratings(spark, TestSpark.sf)))
      .localCheckpoint()
    val ours = GraphOps.triangleCount(pairs).as[Long].head()
    val gx = org.apache.spark.graphx.lib.TriangleCount.run(
      org.apache.spark.graphx.Graph.fromEdges(
        pairs.select("src", "dst").rdd.map(r =>
          org.apache.spark.graphx.Edge(r.getLong(0), r.getLong(1), 1L)),
        defaultValue = 0L))
      .vertices.map(_._2.toLong).sum() / 3
    assert(ours === gx.toLong)
  }

  test("clusteringCoefficients: triangle+pendant hand graph, corners credited once") {
    // 1-2-3 triangle with pendant 4 on 3: coeff(1)=coeff(2)=1,
    // coeff(3) = 2·1/(3·2) = 1/3, coeff(4) = 0 (degree 1)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.clusteringCoefficients(edges).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("degree"), x.getAs[Long]("triangles"),
          x.getAs[Double]("clustering_coeff"))).toMap
    assert(r(1L) === ((2L, 1L, 1.0)))
    assert(r(2L) === ((2L, 1L, 1.0)))
    assert(r(3L) === ((3L, 1L, 1.0 / 3.0)))
    assert(r(4L) === ((1L, 0L, 0.0)))
    // consistency on the real graph: per-vertex triangle credits sum to 3T
    val pairs = Reco.coRatingPairs(
      Reco.goodRatings(Tables.ratings(spark, TestSpark.sf)))
    val cc = GraphOps.clusteringCoefficients(pairs)
    val creditSum = cc.agg(org.apache.spark.sql.functions.sum("triangles"))
      .as[Long].head()
    val total = GraphOps.triangleCount(pairs).as[Long].head()
    assert(creditSum === 3L * total)
  }

  test("scaled-integer PageRank: star center dominates, mass conserved, GraphX order agrees") {
    // star: center 1 connected to 2..6, plus a detached edge 10-11
    val star = (2L to 6L).map(i => (1L, i)) :+ (10L, 11L)
    val edges = Reco.undirected(star.toDF("src", "dst"))
    val pr = GraphOps.pageRank(edges).as[(Long, Long)].collect().toMap
    assert(pr(1L) > pr(2L), "hub must outrank spokes")
    assert((2L to 6L).map(pr).toSet.size === 1, "symmetric spokes rank equally")
    assert(pr(10L) === pr(11L))
    // floor division only ever DROPS sub-unit mass: total in (0.97, 1.0] of scale
    val total = pr.values.sum
    assert(total <= 1000000000000L && total > 970000000000L)
    // cross-check ranking against GraphX's float PageRank on the same graph
    val edgeRdd = spark.sparkContext.parallelize(star.flatMap { case (a, b) =>
      Seq(org.apache.spark.graphx.Edge(a, b, 1L), org.apache.spark.graphx.Edge(b, a, 1L)) })
    val gx = org.apache.spark.graphx.lib.PageRank
      .run(org.apache.spark.graphx.Graph.fromEdges(edgeRdd, 0L), numIter = 3)
      .vertices.collect().toMap
    val byOurs = pr.toSeq.sortBy(-_._2).map(_._1)
    val byGx = gx.toSeq.sortBy(-_._2).map(_._1)
    assert(byOurs.head === byGx.head, "both rankings agree on the top vertex")
  }

  test("degreeAssortativity: the star K1,3 is perfectly disassortative (r = -1)") {
    // center degree 3, leaves degree 1: every edge joins extremes
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = GraphOps.degreeAssortativity(star).collect().head
    assert(r.getAs[Long]("n_vertices") === 4L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("mean_degree_x1000") === 1500L) // 2·3/4 = 1.5
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("GraphX LP agrees with DataFrame LP on the trivially-converged graph") {
    // a single complete triangle converges to one community in both
    val edges = Reco.undirected(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"))
    val df = LabelPropagation.run(edges).as[(Long, Long)].collect().toMap
    val gx = GraphOps.labelPropagationGraphX(spark, edges).as[(Long, Long)].collect().toMap
    assert(df.values.toSet.size === 1)
    assert(gx.values.toSet.size === 1)
  }

  test("kCore: K4 survives the 3-core, its tail peels off") {
    // K4 on 1-4 (every degree 3) + a tail 4-5-6: 6 then 5 cascade away
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val pairs = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val r = GraphOps.kCore(pairs, k = 3, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("linkPrediction: the square's diagonals are the only candidates") {
    // C4 cycle 1-2-3-4-1: non-edges (1,3) and (2,4) each share BOTH
    // remaining vertices (cn=2, deg=2 everywhere -> jaccard = 2/2 = 1);
    // every adjacent pair is excluded by the non-edge filter
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val r = GraphOps.linkPrediction(square, minCommon = 2, k = 10)
      .collect().map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst")) ->
        (x.getAs[Long]("cn"), x.getAs[Double]("jaccard"))).toMap
    assert(r === Map((1L, 3L) -> ((2L, 1.0)), (2L, 4L) -> ((2L, 1.0))))
  }

  test("bfsLayers: path graph layers from the min seed; disconnected part unreached") {
    // path 1-2-3-4 plus isolated edge 9-10: seed=1, layers 0..3 cover the
    // path; {9,10} never appear within 4 rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
    val und = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.bfsLayers(und).collect()
      .map(x => x.getAs[Long]("layer") ->
        (x.getAs[Long]("n_vertices"), x.getAs[Long]("min_id"),
          x.getAs[Long]("max_id"))).toMap
    assert(r === Map(
      0L -> ((1L, 1L, 1L)), 1L -> ((1L, 2L, 2L)),
      2L -> ((1L, 3L, 3L)), 3L -> ((1L, 4L, 4L))))
    // early exit: a triangle exhausts its frontier in 2 rounds and stops
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val triUnd = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val r2 = GraphOps.bfsLayers(triUnd, rounds = 4).collect()
    assert(r2.map(_.getAs[Long]("layer")).toSet === Set(0L, 1L))
  }

  test("hits: path counts match hand numbers on a tiny bipartite graph") {
    // users {1,2}, products {10,20}; edges 1-10, 1-20, 2-10.
    // a1 = deg: a1(10)=2, a1(20)=1
    // h1(1) = a1(10)+a1(20) = 3; h1(2) = a1(10) = 2
    // a2(10) = h1(1)+h1(2) = 5; a2(20) = h1(1) = 3
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("userId", "productId")
    val r = GraphOps.hits(e).collect()
      .map(x => x.getAs[Long]("productId") ->
        (x.getAs[Long]("a1"), x.getAs[Long]("a2"))).toMap
    assert(r === Map(10L -> ((2L, 5L)), 20L -> ((1L, 3L))))
  }

  test("kCore: a path fully cascades at k=2, a cycle is its own 2-core") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(GraphOps.kCore(path, k = 2, rounds = 5).count() === 0L)
    val cycle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val r = GraphOps.kCore(cycle, k = 2, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("modularity: two triangles, a bridge, and a leaf community by hand") {
    val pairs = Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L),(1L,7L))
      .toDF("src", "dst")
    val labels = Seq((1L,1L),(2L,1L),(3L,1L),(4L,2L),(5L,2L),(6L,2L),(7L,3L))
      .toDF("id", "label")
    val r = graft.plans.GraphOps.modularity(labels, pairs).collect()
      .map(x => x.getAs[Long]("label") ->
        (x.getAs[Long]("n_members"), x.getAs[Long]("e_c"), x.getAs[Long]("d_c"),
          x.getAs[Long]("m"), x.getAs[Long]("q_num"))).toMap
    // m=8; A: d=8, e=3 -> 96-64=32 ; B: d=7, e=3 -> 96-49=47 ;
    // C: singleton leaf, e=0, d=1 -> -1
    assert(r === Map(
      1L -> ((3L, 3L, 8L, 8L, 32L)),
      2L -> ((3L, 3L, 7L, 8L, 47L)),
      3L -> ((1L, 0L, 1L, 8L, -1L))))
  }

  test("edgeEmbeddedness: triangle edges score 1, the pendant edge is a local bridge") {
    val pairs = Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L)).toDF("src", "dst")
    val r = graft.plans.GraphOps.edgeEmbeddedness(pairs).collect()
      .map(x => x.getAs[Long]("embeddedness") -> x.getAs[Long]("n_edges")).toMap
    assert(r === Map(1L -> 3L, 0L -> 1L))
  }

  test("kTruss: the 4-clique survives a 4-truss; triangle and bridge peel") {
    // 4-clique {1..4} (each edge in 2 triangles), a lone triangle {5,6,7}
    // (each edge in 1), and a bridge 4-5 (in none)
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val pairs = (clique ++ Seq((5L, 6L), (5L, 7L), (6L, 7L), (4L, 5L)))
      .toDF("src", "dst")
    val r = graft.plans.GraphOps.kTruss(pairs, k = 4, rounds = 3).collect()
      .map(x => (x.getAs[Long]("u"), x.getAs[Long]("v")) ->
        x.getAs[Long]("support")).toMap
    assert(r.keySet === clique.toSet)
    assert(r.values.forall(_ === 2L))
  }

  test("conductance: cross-community edges count to both sides, exact ppm") {
    // two triangles {1,2,3} and {4,5,6} joined by one bridge 3-4
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "label")
    val r = GraphOps.conductance(labels, pairs).collect()
      .map(x => x.getAs[Long]("label") -> x).toMap
    // per community: vol = 2*3 + 1 = 7, cut = 1, m = 7,
    // min(vol, 2m - vol) = min(7, 7) = 7 -> phi = 1e6/7 = 142857
    for (l <- Seq(10L, 20L)) {
      val c = r(l)
      assert(c.getAs[Long]("n_members") === 3L)
      assert(c.getAs[Long]("vol") === 7L)
      assert(c.getAs[Long]("cut") === 1L)
      assert(c.getAs[Long]("m") === 7L)
      assert(c.getAs[Long]("conductance_ppm") === 142857L)
    }
    // one community covering everything: cut 0, phi 0
    val one = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L),
      (6L, 10L)).toDF("id", "label")
    val r1 = GraphOps.conductance(one, pairs).collect()
    assert(r1.length === 1 && r1.head.getAs[Long]("cut") === 0L
      && r1.head.getAs[Long]("conductance_ppm") === 0L)
  }

  test("degreeHistogram: log2 buckets with exact min/max degrees") {
    // star 1-{2,3,4,5}: deg(1) = 4 -> bucket 3; leaves deg 1 -> bucket 1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    val r = GraphOps.degreeHistogram(pairs).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n_vertices"), x.getAs[Long]("min_deg"),
          x.getAs[Long]("max_deg"))).toMap
    assert(r === Map(1L -> ((4L, 1L, 1L)), 3L -> ((1L, 4L, 4L))))
  }

  test("twoHopReach: path, star, and triangle hand numbers") {
    // path 1-2-3-4: reach2(1) = {2,3}, reach2(2) = {1,3,4}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.twoHopReach(path).collect()
      .map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("deg"), x.getAs[Long]("reach2"))).toMap
    assert(r(1L) === ((1L, 2L)))
    assert(r(2L) === ((2L, 3L)))
    assert(r(3L) === ((2L, 3L)))
    assert(r(4L) === ((1L, 2L)))
    // triangle: everyone reaches everyone, reach2 = 2 = deg (no double
    // counting of the 2-hop route back through the third vertex)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val rt = GraphOps.twoHopReach(tri).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("reach2")).toMap
    assert(rt === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("diameterLowerBound: double sweep finds the true path diameter") {
    // path 1-2-3-4-5: sweep 1 from vertex 1 reaches depth 4; the farthest
    // vertex is 5; sweep 2 from 5 also spans 4 — the exact diameter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.diameterLowerBound(edges).collect().head
    assert(r.getAs[Long]("seed1") === 1L)
    assert(r.getAs[Long]("ecc1") === 4L)
    assert(r.getAs[Long]("seed2") === 5L)
    assert(r.getAs[Long]("diameter_lb") === 4L)
    assert(r.getAs[Long]("n_reached2") === 5L)
    // star: both eccentricities bounded by 2, reseed at a leaf
    val star = Seq((1L, 9L), (9L, 1L), (2L, 9L), (9L, 2L), (3L, 9L), (9L, 3L))
      .toDF("src", "dst")
    val rs = GraphOps.diameterLowerBound(star).collect().head
    assert(rs.getAs[Long]("diameter_lb") === 2L)
  }

  test("lubyMIS: independence, coverage, and triangle uniqueness hold") {
    // triangle: exactly one MIS vertex (highest packed priority), both
    // neighbors out, all decided in round 1
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val rt = GraphOps.lubyMIS(tri).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[String]("status")).toMap
    assert(rt.values.count(_ == "mis") === 1)
    assert(rt.values.count(_ == "out") === 2)
    // structural invariants on a bigger graph: MIS is independent, and
    // every out vertex has a MIS neighbor (Luby's correctness contract)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 5L))
      .toDF("src", "dst")
    val edges = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 5L))
    val st = GraphOps.lubyMIS(g).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[String]("status")).toMap
    val mis = st.filter(_._2 == "mis").keySet
    assert(mis.nonEmpty)
    assert(!edges.exists { case (a, b) => mis(a) && mis(b) }, "MIS not independent")
    st.filter(_._2 == "out").keys.foreach { v =>
      assert(edges.exists { case (a, b) => (a == v && mis(b)) || (b == v && mis(a)) },
        s"out vertex $v has no MIS neighbor")
    }
    // determinism: a second run returns the identical partition
    val st2 = GraphOps.lubyMIS(g).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[String]("status")).toMap
    assert(st === st2)
  }

  test("resourceAllocation: rare shared neighbors outweigh hubs, edges excluded") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) are the only non-edge
    // candidates, each certified by TWO degree-2 centers → ra = 2·(1e9/2)
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val r = GraphOps.resourceAllocation(sq).collect()
      .map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst")) ->
        (x.getAs[Long]("cn"), x.getAs[Long]("ra_e9"))).toMap
    assert(r === Map((1L, 3L) -> ((2L, 1000000000L)),
      (2L, 4L) -> ((2L, 1000000000L))))
    // star center is a hub: its wedges earn only 1e9/deg each
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst")
    val rs = GraphOps.resourceAllocation(star, minCommon = 1).collect()
      .map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst")) ->
        x.getAs[Long]("ra_e9")).toMap
    assert(rs === Map((1L, 2L) -> 333333333L, (1L, 3L) -> 333333333L,
      (2L, 3L) -> 333333333L))
  }

  test("personalizedPageRank: teleport mass stays near the seed") {
    // undirected path 100-1-2 (vertex 100 is the only seed: 100 % 100 = 0).
    // One iteration, scale 1e12, |S| = 1:
    //   r0 = (100: 1e12, 1: 0, 2: 0)
    //   contribs: 100→1: 1e12 (deg 1); 1→{100,2}: 0; 2→1: 0
    //   r1(100) = 0.15·1e12 + 0            = 150000000000
    //   r1(1)   = 0          + 0.85·1e12   = 850000000000
    //   r1(2)   = 0                        = 0 (kept — zero set is the answer)
    val edges = Seq((100L, 1L), (1L, 100L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val r = GraphOps.personalizedPageRank(edges, iters = 1).collect()
      .map(x => x.getAs[Long]("v") -> x.getAs[Long]("r")).toMap
    assert(r === Map(100L -> 150000000000L, 1L -> 850000000000L, 2L -> 0L))
  }

  test("twoHopReachApprox: exact totals carried, sketch bound holds") {
    // path 1-2-3-4: reaches 2,3,3,2 → total 10 over 4 vertices; at these
    // counts HLL++ runs sparse-exact, so the 5% L1 bound must hold
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.twoHopReachApprox(path).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_vertices") === 4L)
    assert(r.head.getAs[Long]("total_reach2") === 10L)
    assert(r.head.getAs[Boolean]("approx_ok"))
  }
}
