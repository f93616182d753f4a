package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate-limited replay source (SURVEY §2 row 4.7): the reference replays a
  * CSV to Kafka at 1 row/sec — submitting one Flink job per record
  * (`kafka/kafka_stream_generator.py:20-41`). Spark-native equivalent: the
  * built-in `rate` source emits a monotonically increasing `value` N times
  * per second; joining it to the indexed static dataset turns any table
  * into a paced stream, inside ONE continuous query.
  *
  * The join is stream–static on the row index: the static side is indexed
  * once (a window over a constant is fine at replay scales — a replay
  * driver is never the 100-TB path; for large replays, index with
  * zipWithIndex at write time instead).
  */
object Replay {

  /** Index the static rows deterministically by the given sort column. */
  def indexed(df: DataFrame, orderCol: String): DataFrame =
    df.withColumn("__idx",
      row_number().over(Window.orderBy(col(orderCol))).cast("long") - 1)

  /** Replay `static` as a stream at `rowsPerSecond`, in `orderCol` order.
    * Each emitted row carries `replay_time` (the rate tick's timestamp).
    */
  def replayStream(spark: SparkSession, static: DataFrame, orderCol: String,
                   rowsPerSecond: Int = 10): DataFrame = {
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // (timestamp, value)
    ticks.join(indexed(static, orderCol), col("value") === col("__idx"))
      .drop("__idx", "value")
      .withColumnRenamed("timestamp", "replay_time")
  }
}
