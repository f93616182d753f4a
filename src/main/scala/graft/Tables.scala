package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet star schema (TESTDATA.md) plus the
  * derived `ratings` view that maps this corpus onto the reference's rating
  * fact (reference schema: `data/stream.edges` `userId,productId,rating,ts`,
  * see `spliter.py:18-20`):
  *
  *   userId    = o_custkey   (orders)
  *   productId = l_partkey   (lineitem)
  *   rating    = floor(l_quantity) % 5 + 1  — deterministic 1..5
  *
  * The rating derivation is integral-valued, so double sums/averages over it
  * are exact (< 2^53) and engine-order-independent — required for the DuckDB
  * oracle hash-compare.
  *
  * Scale note: every loader is a plain parquet scan — column pruning and
  * predicate pushdown reach the file scan via Catalyst, so downstream
  * operators only pay for the columns/rows they use, at any scale factor.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** `events.ts` arrives in whatever parquet timestamp encoding the data
    * generator used — TIMESTAMP(NANOS) (which Spark 4 refuses to read
    * natively; legacy conf reads it as a nanos Long), or TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (which Spark 4 infers as TIMESTAMP_NTZ).
    * Normalize every variant to a microsecond session-TZ TimestampType
    * column: all graft sessions pin UTC, so the NTZ→TZ cast is
    * value-preserving and matches DuckDB's naive-timestamp read.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** The rating-like fact all reference-shaped queries run over.
    *
    * Shared ANSI-SQL prefix for the DuckDB oracle lives in
    * [[SparkEntry.ratingsCte]] — keep the two in lockstep.
    *
    * Scale note: lineitem⋈orders is a co-partitionable equi-join on the order
    * key; at cluster scale both sides shuffle-hash/sort-merge on l_orderkey
    * (or broadcast when orders is a filtered dim). No driver materialization.
    */
  def ratings(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_quantity")
    val o  = orders(spark, sfDir).select("o_orderkey", "o_custkey")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(
        col("o_custkey").as("userId"),
        col("l_partkey").as("productId"),
        (floor(col("l_quantity")).cast("long") % 5 + 1).cast("double").as("rating"))
  }
}
