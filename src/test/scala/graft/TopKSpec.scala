package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ExactTopK, GraftExtensions}
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topKCol(score: org.apache.spark.sql.Column,
                      payload: org.apache.spark.sql.Column, k: Int) =
    org.apache.spark.sql.graft.shim.column(
      ExactTopK(
        org.apache.spark.sql.graft.shim.expression(score),
        org.apache.spark.sql.graft.shim.expression(payload), k).toAggregateExpression())

  test("top_k aggregate equals the window row_number form (multi-partition)") {
    // many partitions -> exercises update/serialize/merge across partials
    val orders = Tables.orders(spark, TestSpark.sf).repartition(7)
    val viaAgg = orders
      .groupBy("o_custkey")
      .agg(topKCol(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("e"))
      .select(col("o_custkey"), col("e.score").as("o_totalprice"), col("e.payload").as("o_orderkey"))
      .as[(Long, Double, Long)].collect().toSet
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("o_custkey", "o_totalprice", "o_orderkey")
      .as[(Long, Double, Long)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("top_k is callable from SQL with a literal k") {
    GraftExtensions.register(spark)
    Tables.orders(spark, TestSpark.sf).createOrReplaceTempView("orders_v")
    val n = spark.sql(
      "SELECT o_custkey, top_k(o_totalprice, o_orderkey, 2) AS t FROM orders_v GROUP BY o_custkey")
      .select(size(col("t"))).as[Int].collect()
    assert(n.nonEmpty && n.forall(x => x >= 1 && x <= 2))
  }

  test("tie-break prefers the smaller payload at equal score") {
    val df = Seq((1L, 5.0, 100L), (1L, 5.0, 50L), (1L, 5.0, 70L)).toDF("g", "s", "p")
    val out = df.groupBy("g").agg(topKCol(col("s"), col("p"), 2).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.payload")).as[Long].collect().toSeq
    assert(out === Seq(50L, 70L))
  }
}
