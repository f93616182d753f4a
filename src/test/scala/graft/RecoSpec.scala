package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco

class RecoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topProducts honors HAVING and K, ordered desc with id tiebreak") {
    val top = Reco.topProducts(Tables.ratings(spark, TestSpark.sf)).collect()
    assert(top.length <= 20)
    assert(top.forall(_.getAs[Long]("cnt") > 10))
    val avgs = top.map(_.getAs[Double]("avg_rating"))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b })
  }

  test("coRatingPairs emits C(k,2) canonical pairs per product") {
    val r = Seq((1L, 10L, 5.0), (2L, 10L, 4.0), (3L, 10L, 5.0), (4L, 20L, 5.0))
      .toDF("userId", "productId", "rating")
    val pairs = Reco.coRatingPairs(r).as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("undirected closure is symmetric") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val u = Reco.undirected(e).as[(Long, Long)].collect().toSet
    assert(u === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("recommendations never contain a product the user already rated") {
    val labels = Seq((1L, 99L), (2L, 99L)).toDF("id", "label")
    val ratings = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L))
      .toDF("userId", "productId")
    val recs = Reco.recommendations(labels, ratings)
      .select($"userId", explode($"recommendedProducts").as("p"))
      .as[(Long, Long)].collect()
    // user 1 already rated 10,11 -> only 12 can be recommended; user 2 -> only 10
    assert(recs.toSet === Set((1L, 12L), (2L, 10L)))
  }

  test("sampleSplit buckets partition the filtered input exactly") {
    val s = Reco.sampleSplit(Tables.ratings(spark, TestSpark.sf))
    val total = Tables.ratings(spark, TestSpark.sf).where($"userId" < 1000).count()
    val byBucket = s.groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(byBucket.values.sum === total)
    assert(byBucket.keySet.subsetOf(Set(0, 1)))
  }

  test("seededSplit is a reproducible multiset complement (spliter.py parity)") {
    val ratings = Tables.ratings(spark, TestSpark.sf)
    val base = ratings.where($"userId" < 1000)
    val (db, stream) = Reco.seededSplit(ratings)
    val total = base.count()
    assert(db.count() + stream.count() === total)
    // multiset identity: base \ db \ stream = ∅ and db ⊎ stream covers base
    assert(base.exceptAll(db).exceptAll(stream).count() === 0)
    assert(db.unionAll(stream).exceptAll(base).count() === 0)
    // same seed → same membership (deterministic resample)
    val (db2, _) = Reco.seededSplit(ratings)
    assert(db.exceptAll(db2).count() === 0 && db2.exceptAll(db).count() === 0)
    // sampled fraction lands near 0.7
    val frac = db.count().toDouble / total
    assert(math.abs(frac - 0.7) < 0.05, s"fraction drifted: $frac")
  }

  test("itemNeighbors: hand-computed cosines, support filter, symmetric lists") {
    import spark.implicits._
    // u1 and u2 co-rate (A=100, B=200); u2 and u3 co-rate (B, C=300);
    // A-C is co-rated only by nobody twice -> dropped by minSupport=2
    val ratings = Seq(
      (1L, 100L, 2.0), (1L, 200L, 4.0),
      (2L, 100L, 2.0), (2L, 200L, 4.0), (2L, 300L, 1.0),
      (3L, 200L, 4.0), (3L, 300L, 1.0))
      .toDF("userId", "productId", "rating")
    val r = graft.operators.Reco.itemNeighbors(ratings).collect()
      .map(x => (x.getAs[Long]("item"), x.getAs[Long]("neighbor")) ->
        (x.getAs[Long]("dot"), x.getAs[Long]("support"), x.getAs[Double]("cos")))
      .toMap
    // pairs survive in both directions; the unsupported A-C pair is absent
    assert(r.keySet === Set((100L, 200L), (200L, 100L), (200L, 300L), (300L, 200L)))
    // A-B: dot = 2*4 + 2*4 = 16, support 2; norms: A 8, B 48
    val (d, s, c) = r((100L, 200L))
    assert(d === 16L && s === 2L)
    assert(math.abs(c - 16.0 / math.sqrt(8.0 * 48.0)) < 1e-12)
    // B-C: dot = 4 + 4 = 8, support 2; norms: B 48, C 2
    assert(r((200L, 300L))._1 === 8L)
    assert(math.abs(r((200L, 300L))._3 - 8.0 / math.sqrt(48.0 * 2.0)) < 1e-12)
  }

  test("cfPredictions: unrated items score via rated neighbors; saturated users get none") {
    import spark.implicits._
    val ratings = Seq(
      (1L, 100L, 2.0), (1L, 200L, 4.0),
      (2L, 100L, 2.0), (2L, 200L, 4.0), (2L, 300L, 1.0),
      (3L, 200L, 4.0), (3L, 300L, 1.0))
      .toDF("userId", "productId", "rating")
    val p = graft.operators.Reco.cfPredictions(ratings).collect()
      .map(x => (x.getAs[Long]("userId"), x.getAs[Long]("item")) ->
        x.getAs[Double]("pred")).toMap
    // u1 lacks C (neighbor of B, rated 4) -> pred 4.0 from the single
    // neighbor; u3 lacks A (neighbor of B) -> pred 4.0; u2 rated all
    assert(p.keySet === Set((1L, 300L), (3L, 100L)))
    assert(p((1L, 300L)) === 4.0 && p((3L, 100L)) === 4.0)
  }
}
