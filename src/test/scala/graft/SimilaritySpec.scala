package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine of a vector with itself is exactly 1.0 on unit directions") {
    val df = Seq((Array(1.0f, 0f, 0f), Array(2.0f, 0f, 0f)),
      (Array(0f, 3f, 0f), Array(0f, 0f, 4f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("sim"))
    val sims = df.as[Double].collect()
    assert(sims(0) === 1.0)
    assert(sims(1) === 0.0)
  }

  test("ivfTopK achieves reasonable recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.where($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val brute = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, k = 5, nprobe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall too low: $recall") // nprobe=4 of ~13 cells
    assert(ivf.forall { case (a, b) => a != b })
  }

  test("native CosineSimilarity expression is bit-identical to the fold reference") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("a_emb")).where($"a_id" < 40)
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("b_emb")).where($"b_id" < 40)
    val pairs = a.join(b, $"a_id" < $"b_id")
    val diff = pairs.select(
      Similarity.cosine($"a_emb", $"b_emb").as("native"),
      Similarity.cosineFold($"a_emb", $"b_emb").as("fold"))
      .where($"native" =!= $"fold") // bitwise: any difference shows up
      .count()
    assert(diff === 0)
  }

  test("KMeans-trained IVF reaches at least stride-seed recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.where($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val brute = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val centroids = Similarity.kmeansCentroids(spark, emb, nCells = 14)
    val trained = Similarity.ivfTopKWithCentroids(q, emb, centroids, k = 5, nprobe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & trained).size.toDouble / brute.size
    assert(recall >= 0.3, s"trained-IVF recall too low: $recall")
  }

  test("IVF-bucketed near-dup is a subset of exact near-dup with high recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val exact = Similarity.embeddingNearDupPairs(emb, threshold = 0.4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.embeddingNearDupPairsIVF(emb, threshold = 0.4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(ivf.subsetOf(exact), s"bucketed pairs not in exact set: ${ivf -- exact}")
    assert(exact.nonEmpty)
    val recall = ivf.size.toDouble / exact.size
    assert(recall >= 0.5, s"cell-bucketed recall too low: $recall")
  }

  test("annRecall grades IVF vs brute force: k rows, bounded metrics, floor recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.where($"vec_id" % 25 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val report = Similarity.annRecall(spark,
      Similarity.ivfTopK(q, emb, k = 5, nprobe = 4),
      Similarity.bruteForceTopK(q, emb, k = 5))
      .collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Double]("recall"), r.getAs[Double]("mean_rank_err")))
      .toMap
    assert(report.keySet === Set(1L, 2L, 3L, 4L, 5L))
    report.values.foreach { case (recall, mre) =>
      assert(recall >= 0.0 && recall <= 1.0)
      assert(mre >= 0.0 && mre <= 4.0) // |rank drift| inside a depth-5 list
    }
    // the quality floor at the default probe budget (nprobe=4 of ~13 cells)
    assert(report(5L)._1 >= 0.3, s"recall@5 too low: ${report(5L)._1}")
  }

  test("annRecall is exactly 1.0 with zero rank error when approx == exact") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.where($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val brute = Similarity.bruteForceTopK(q, emb, k = 5)
    val rows = Similarity.annRecall(spark, brute, brute).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0)
      assert(r.getAs[Double]("mean_rank_err") === 0.0)
      assert(r.getAs[Long]("n_hits") === r.getAs[Long]("n_queries") * r.getAs[Long]("k"))
    }
  }

  test("bruteForceTopK ranks are dense 1..k per query") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.where($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val ranks = Similarity.bruteForceTopK(q, emb, k = 5)
      .select("rank").as[Int].collect().sorted
    assert(ranks.toSeq === Seq(1, 2, 3, 4, 5))
  }

  test("quantizeEmbeddings: codes span 0..255, extremes hit the rails, degenerate is zero") {
    val df = Seq(
      (1L, Array(0.0f, 1.0f, 0.5f)), // min→0, max→255, mid→128
      (2L, Array(2.0f, 2.0f, 2.0f))) // degenerate: all codes 0
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizeEmbeddings(df).collect()
      .map(row => row.getAs[Long]("vec_id") ->
        (row.getAs[Double]("q_min"), row.getAs[Double]("q_max"), row.getAs[Long]("code_sum")))
      .toMap
    assert(r(1L) === ((0.0, 1.0, 0L + 255L + 128L)))
    assert(r(2L) === ((2.0, 2.0, 0L)))
    // real corpus: every code sum is within [0, 255·dim]
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val dim = emb.select(size($"embedding")).as[Int].head()
    val sums = Similarity.quantizeEmbeddings(emb).select("code_sum").as[Long].collect()
    assert(sums.forall(s => s >= 0 && s <= 255L * dim))
  }

  test("kmeansUpdate computes elementwise member means in position order") {
    val assigned = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), 10L),
      (2L, Array(3.0f, 6.0f, 9.0f), 10L),
      (3L, Array(5.0f, 5.0f, 5.0f), 20L))
      .toDF("vec_id", "embedding", "cell")
    val r = Similarity.kmeansUpdate(assigned).collect()
      .map(row => row.getAs[Long]("cell") ->
        (row.getSeq[Double](row.fieldIndex("c_emb")), row.getAs[Long]("n_members")))
      .toMap
    assert(r(10L)._1 === Seq(2.0, 4.0, 6.0))
    assert(r(10L)._2 === 2L)
    assert(r(20L)._1 === Seq(5.0, 5.0, 5.0))
    assert(r(20L)._2 === 1L)
  }

  test("kmeansUpdateExact: micro-grid means match hand numbers") {
    // stride 2 -> centroids {0, 2}; 1/3 assign by cosine to 0/2
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f), 0), // cos with c0 = 1 -> cell 0
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(0.0f, 3.0f), 0)) // cos with c2 = 1 -> cell 2
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.kmeansUpdateExact(emb, centroidStride = 2).collect()
      .map(x => (x.getAs[Long]("cell"), x.getAs[Int]("dim")) ->
        (x.getAs[Long]("n_members"), x.getAs[Double]("centroid_micro")))
      .toMap
    assert(r((0L, 0)) === ((2L, 1500000.0))) // (1e6 + 2e6)/2
    assert(r((0L, 1)) === ((2L, 0.0)))
    assert(r((2L, 0)) === ((2L, 0.0)))
    assert(r((2L, 1)) === ((2L, 2000000.0))) // (1e6 + 3e6)/2
  }

  test("lloydNextAssign re-assembles exploded centroids and re-assigns") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(0.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    // updated centroids: cell 0 -> (1.5, 0), cell 2 -> (0, 2.0); axis-
    // aligned vectors keep their cells under the refreshed assignment
    val r = Similarity.lloydNextAssign(emb, centroidStride = 2).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("cell")).toMap
    assert(r === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("one full Lloyd iteration over real embeddings keeps k cells and dim") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val dim = emb.select(size($"embedding")).as[Int].head()
    val assigned = Similarity.ivfAssign(emb)
    val updated = Similarity.kmeansUpdate(assigned)
    val nCells = assigned.select("cell").distinct().count()
    assert(updated.count() === nCells)
    assert(updated.select(size($"c_emb")).as[Int].collect().forall(_ == dim))
    // every member is counted exactly once across cells
    assert(updated.agg(sum($"n_members")).as[Long].head() === emb.count())
  }

  test("srpSignatures: duplicates collide, a negated vector flips every bit") {
    val emb = Seq(
      (0L, Array(1.0f, 0.5f), 0),
      (1L, Array(1.0f, 0.5f), 0),   // exact duplicate → same bucket
      (2L, Array(-1.0f, -0.5f), 0)) // negation → complementary signature
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.srpSignatures(emb, dims = 2).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("sig"), x.getAs[Long]("n_same_sig"))).toMap
    assert(r(0L)._1 === r(1L)._1 && r(0L)._2 === 2L)
    assert((r(0L)._1 ^ r(2L)._1) === 65535L) // all 16 bits flip
    assert(r(2L)._2 === 1L)
  }

  test("annTuning: recall is monotone in nprobe and exact at full probe width") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.where($"vec_id" % 25 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val r = Similarity.annTuning(queries, emb, nprobes = Seq(1, 2, 1000))
      .collect().map(x => x.getAs[Long]("nprobe") -> x.getAs[Long]("recall_ppm"))
      .toMap
    // probing every cell IS brute force → recall exactly 1
    assert(r(1000L) === 1000000L)
    assert(r(1L) <= r(2L) && r(2L) <= r(1000L))
  }

  test("pcaPower: converges to the dominant axis with hand-checked integers") {
    // M (milli²) = [[1e6, 0], [0, 1.8e7]] → iterates v: (1000,1000) →
    // (55,1000) → (3,1000) → (0,1000); λ = 1.8e7·1000²/1000² in milli
    val emb = Seq(
      (0L, Array(0.0f, 3.0f), 0),
      (1L, Array(0.0f, -3.0f), 0),
      (2L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.pcaPower(emb, dims = 2).collect()
      .map(x => x.getAs[Int]("dim") ->
        (x.getAs[Long]("component_milli"), x.getAs[Long]("lambda_milli"))).toMap
    assert(r(0) === ((0L, 18000000000L)))
    assert(r(1) === ((1000L, 18000000000L)))
  }

  test("mmrSelect: relevance first, then diversity penalizes the near-duplicate") {
    // query 0 = (1,0). 1=(1,0): rel 1. 2=(0,1): rel 0. 3=(3,4): rel 0.6.
    // round1: 1 (score 0.5). round2: all scores 0 (unit-circle maxsim to
    // the query direction equals rel) -> lowest id 2. round3: only 3
    // left, maxsim = cos((3,4),(0,1)) = 0.8 -> score 0.3 - 0.4 = -0.1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0), (3L, Array(3.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.mmrSelect(emb, k = 3).collect()
      .sortBy(_.getAs[Long]("round"))
      .map(x => (x.getAs[Long]("round"), x.getAs[Long]("vec_id"),
        x.getAs[Double]("rel"), x.getAs[Double]("score")))
    assert(r.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(r(0)._3 === 1.0 && r(0)._4 === 0.5)
    assert(r(1)._3 === 0.0 && r(1)._4 === 0.0)
    assert(math.abs(r(2)._3 - 0.6) < 1e-12)
    assert(math.abs(r(2)._4 - (-0.1)) < 1e-12)
    // real corpus: 5 distinct picks, scores non-increasing is NOT
    // guaranteed by MMR, but every pick must come from the pool and be
    // unique
    val real = Similarity.mmrSelect(Tables.embeddings(spark, TestSpark.sf))
      .collect()
    assert(real.length === 5)
    assert(real.map(_.getAs[Long]("vec_id")).distinct.length === 5)
  }

  test("embeddingOutliers: exact distance numerators rank the far vector first") {
    // label 0: (0,0), (0,0), (3,0) -> centroid (1,0); v3's numerator is
    // (3e6*3 - 3e6)^2 = 3.6e13, the twins' (0*3 - 3e6)^2 = 9e12 each
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.0f, 0.0f), 0),
      (3L, Array(3.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingOutliers(emb).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("dist_nano")).toMap
    // dist_nano = dist_num / (n^2 * 1000): (3-1)^2 = 4 -> 4e9 nano
    assert(r(3L) === 4000000000L)
    assert(r(1L) === 1000000000L)
    assert(r(2L) === 1000000000L)
    // real corpus: 5 rows per label, non-negative nano distances
    val real = Similarity.embeddingOutliers(
      Tables.embeddings(spark, TestSpark.sf)).collect()
    val byLabel = real.groupBy(_.getAs[Int]("label"))
    byLabel.values.foreach { rows =>
      assert(rows.length === 5)
      assert(rows.forall(_.getAs[Long]("dist_nano") >= 0L))
    }
  }

  test("semanticContamination: odd test ids vs even train ids, best hit is the max") {
    val out = Similarity.semanticContamination(Tables.embeddings(spark, TestSpark.sf))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty, "the synthetic embeddings contain cross-split near pairs")
    assert(out.forall { case (test, _, train, _) => test % 2 == 1 && train % 2 == 0 })
    assert(out.forall { case (_, nHits, _, sim) => nHits >= 1 && sim >= 0.4 && sim <= 1.0 })
    // per-test best_sim must dominate every reported pair for that test id
    val pairsBest = out.map { case (t, _, _, s) => (t, s) }.toMap
    assert(pairsBest.values.forall(_ >= 0.4))
  }

  test("knnLabelConsistency: two clean poles give 4-of-5 agreement everywhere") {
    // pole A: ids 0..4 near [1, 0] (id 0 is a stride centroid), label 1;
    // pole B: ids 37..41 near [0, 1] (id 37 is the other centroid), label 2.
    // nprobe=2 with 2 cells -> every pair is a candidate; top-5 for any
    // vector = its 4 pole-mates + 1 cross-pole vector.
    val vecs = ((0 to 4).map(i => (i.toLong, Array(1.0f, 0.01f * i), 1)) ++
      (37 to 41).map(i => (i.toLong, Array(0.01f * (i - 37), 1.0f), 2)))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnLabelConsistency(vecs).collect()
    assert(r.length === 10)
    r.foreach { x =>
      assert(x.getAs[Long]("n_neighbors") === 5L)
      assert(x.getAs[Long]("n_same") === 4L)
      assert(x.getAs[Long]("consistency_ppm") === 800000L)
    }
  }

  test("centroidGaps: hand centroids give the exact nano gap") {
    // label 0 centroid (1, 0); label 1 centroid (0, 2) -> gap^2 = 5
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(0.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidGaps(emb).collect()
    assert(r.length === 1)
    val g = r.head
    assert(g.getAs[Int]("label_a") === 0 && g.getAs[Int]("label_b") === 1)
    assert(g.getAs[Long]("n_a") === 2L && g.getAs[Long]("n_b") === 1L)
    assert(g.getAs[Long]("gap_nano") === 5000000000L)
    // real corpus: C(labels, 2) rows, all non-negative
    val emb2 = Tables.embeddings(spark, TestSpark.sf)
    val nl = emb2.select("label").distinct().count()
    val real = Similarity.centroidGaps(emb2).collect()
    assert(real.length === (nl * (nl - 1) / 2).toInt)
    assert(real.forall(_.getAs[Long]("gap_nano") >= 0L))
  }

  test("cellPurity: members partition across cells, purity exact and bounded") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val r = Similarity.cellPurity(emb).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Long]("n_members")).sum === emb.count())
    r.foreach { x =>
      val (n, top, ppm) = (x.getAs[Long]("n_members"),
        x.getAs[Long]("top_count"), x.getAs[Long]("purity_ppm"))
      assert(top >= 1L && top <= n)
      assert(ppm === top * 1000000L / n)
    }
    // determinism: identical report on a second run
    val again = Similarity.cellPurity(emb).collect().map(_.toString).sorted
    assert(again.toSeq === r.map(_.toString).sorted.toSeq)
  }
}
