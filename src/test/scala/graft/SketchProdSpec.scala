package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** The sketch-only PRODUCTION forms must be estimate-identical to their
  * graded twins: the prod path drops the exact-truth side and every
  * shuffle that exists only to serve it (gram dedup, per-source sort,
  * direct-path proof), and these specs pin that nothing else changed.
  * This is what lets the prod bench totals (`SPARK_GRAFT_SKETCH_PROD=1`)
  * stand in for the graded queries' sketch sides at 100 TB without their
  * own DuckDB oracles.
  */
class SketchProdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.documents(spark, TestSpark.sf)

  test("hllCardinalityProd: (source, occupied, s_scaled, est) equal the graded query's") {
    val graded = Corpus.hllCardinality(docs)
      .select("source", "occupied", "s_scaled", "est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val prod = Corpus.hllCardinalityProd(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(prod === graded)
    assert(prod.nonEmpty)
  }

  test("hllMergeProd: merged registers and estimate equal the graded query's") {
    val g = Corpus.hllMerge(docs).head()
    val p = Corpus.hllMergeProd(docs).head()
    assert(p.getAs[Long]("n_shards") === g.getAs[Long]("n_shards"))
    assert(p.getAs[Long]("occ_merged") === g.getAs[Long]("occ_merged"))
    assert(p.getAs[Long]("s_merged") === g.getAs[Long]("s_merged"))
    assert(p.getAs[Double]("est") === g.getAs[Double]("est"))
  }

  test("hllIntersectionProd: per-pair sketch sums and estimates equal the graded query's") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("sa"), r.getAs[String]("sb"))
    val graded = Corpus.hllIntersection(docs).collect()
      .map(r => key(r) -> (r.getAs[Long]("s_a"), r.getAs[Long]("s_b"),
        r.getAs[Long]("s_union"), r.getAs[Double]("est_inter"))).toMap
    val prod = Corpus.hllIntersectionProd(docs).collect()
      .map(r => key(r) -> (r.getAs[Long]("s_a"), r.getAs[Long]("s_b"),
        r.getAs[Long]("s_union"), r.getAs[Double]("est_inter"))).toMap
    assert(prod === graded)
    assert(prod.nonEmpty)
  }

  test("histogramQuantilesProd: estimates equal the graded query's est_v") {
    val graded = Corpus.histogramQuantiles(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("p")) -> r.getAs[Long]("est_v")).toMap
    val prod = Corpus.histogramQuantilesProd(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("p")) -> r.getAs[Long]("est_v")).toMap
    assert(prod === graded)
    assert(prod.nonEmpty)
  }

  test("prod registry: every prod key shadows a graded key and runs") {
    assert(SparkEntry.prodQueries.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.prodQueries.foreach { case (name, fn) =>
      assert(fn(spark, TestSpark.sf).count() > 0, name)
    }
  }
}
