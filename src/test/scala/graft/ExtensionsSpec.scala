package graft

import org.apache.spark.sql.graft.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_sim is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val sim = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(0 AS FLOAT))) AS s")
      .as[Double].collect().head
    assert(sim === 1.0)
  }

  test("md5_prefix32_array from SQL matches the conv(substring(md5)) builtin form") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT md5_prefix32_array(array('hello', 'world')) AS fast, " +
        "transform(array('hello', 'world'), s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)) AS ref")
      .as[(Seq[Long], Seq[Long])].collect()
    assert(rows(0)._1 === rows(0)._2)
    assert(rows(0)._1.forall(v => v >= 0L && v < (1L << 32)))
  }

  test("minhash_signature is callable from SQL and matches identical inputs") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT minhash_signature(array(CAST(5 AS BIGINT), 17, 255)) AS sig " +
        "UNION ALL SELECT minhash_signature(array(CAST(5 AS BIGINT), 17, 255))")
      .as[Seq[Long]].collect()
    assert(rows(0).length === 64)
    assert(rows(0) === rows(1))
  }

  test("coRatingPairs skew cap bounds per-product pair count") {
    val r = (1L to 50L).map(u => (u, 99L, 5.0)).toDF("userId", "productId", "rating")
    val unbounded = Reco.coRatingPairs(r).count()
    val capped = Reco.coRatingPairs(r, maxRatersPerProduct = Some(10)).count()
    assert(unbounded === 50L * 49 / 2)
    assert(capped === 10L * 9 / 2)
  }
}
