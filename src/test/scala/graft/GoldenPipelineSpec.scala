package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco
import graft.plans.LabelPropagation
import graft.sources.Formats

/** Golden end-to-end test (SURVEY §5.2): run the J1→J2 pipeline over the
  * reference's own shipped dataset format — the first rows of
  * `data/stream.edges` (userId,productId,rating,timestamp CSV) — and assert
  * the reference's hard-coded semantics hold: K=20 / minReviews=10
  * (`ProductReviewAggregation.java:25-26`), userId<1000 + rating>3
  * (`Recommendations.java:153,172-176`), and the no-rated-product invariant
  * (`Recommendations.java:74`).
  */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edgesPath = "/root/reference/data/stream.edges"
  private lazy val available = new java.io.File(edgesPath).isFile

  private lazy val ratings = {
    val df = Formats.readEdgesCsv(spark, edgesPath).limit(5000).cache()
    df.count()
    df
  }

  test("J1: top products over the reference dataset honor HAVING and K") {
    assume(available)
    val top = Reco.topProducts(ratings).collect()
    assert(top.length <= 20)
    assert(top.forall(_.getAs[Long]("cnt") > 10))
  }

  test("J2: full pipeline over the reference dataset keeps the :74 invariant") {
    assume(available)
    val good = Reco.goodRatings(ratings).select("userId", "productId").distinct().cache()
    val labels = LabelPropagation.run(Reco.undirected(Reco.coRatingPairs(Reco.goodRatings(ratings))))
    val recs = Reco.recommendations(labels, good)
    val flat = recs.select($"userId", explode($"recommendedProducts").as("p"))
      .as[(Long, Long)].collect().toSet
    val rated = good.as[(Long, Long)].collect().toSet
    assert(flat.nonEmpty)
    assert((flat & rated).isEmpty)
    // cap respected
    assert(recs.select(size($"recommendedProducts")).as[Int].collect().forall(_ <= 20))
    // only users from the filtered (userId<1000) population get recommendations
    assert(flat.forall(_._1 < 1000))
  }

  test("hand-checked community structure on a tiny slice") {
    assume(available)
    // first 20 edges: users co-rating products with rating>3 form small cliques
    val tiny = Formats.readEdgesCsv(spark, edgesPath).limit(20)
    val pairs = Reco.coRatingPairs(Reco.goodRatings(tiny))
    val labels = LabelPropagation.run(Reco.undirected(pairs))
    // labels exist iff pairs exist, and every labeled vertex appears in pairs
    val vertexIds = pairs.select(explode(array($"src", $"dst"))).distinct()
      .as[Long].collect().toSet
    val labeled = labels.select("id").as[Long].collect().toSet
    assert(labeled === vertexIds)
  }
}
