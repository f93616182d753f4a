package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-explicit file sources/sinks (SURVEY §2 rows 1.1/4.1/4.6). The
  * reference reads headerless CSV edges (`spliter.py:18-20`) and JSON
  * `Review` envelopes (`kafka_stream_generator.py:28-31`); inference is
  * never used on correctness paths — schemas are declared (SURVEY §1.3).
  */
object Formats {

  /** The reference's universal ratings-edge schema:
    * `userId,productId,rating,timestamp` CSV without header
    * (`data/stream.edges` format).
    */
  val edgeSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("productId", LongType),
    StructField("rating", DoubleType),
    StructField("timestamp", LongType)))

  def readEdgesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(edgeSchema).option("header", "false").csv(path)

  def writeEdgesCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(path)

  def readReviewsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(RealTimeSchemas.review).json(path)

  /** ORC source/sink for the same edge schema — the columnar alternative
    * when a consumer's lake standardizes on ORC instead of parquet. Spark's
    * built-in ORC reader keeps the same pushdown/pruning contract as
    * parquet (predicate pushdown asserted in FormatsSpec), so every graft
    * operator runs unchanged over ORC-resident tables.
    */
  def readEdgesOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(edgeSchema).orc(path)

  def writeEdgesOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  private object RealTimeSchemas {
    val review: StructType = graft.streaming.RealTime.reviewSchema
  }
}
