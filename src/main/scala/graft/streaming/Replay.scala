package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rate-limited replay source (SURVEY §2 row 4.7): the reference replays a
  * CSV to Kafka at 1 row/sec — submitting one Flink job per record
  * (`kafka/kafka_stream_generator.py:20-41`). Spark-native equivalent: the
  * built-in `rate` source emits a monotonically increasing `value` N times
  * per second; joining it to the indexed static dataset turns any table
  * into a paced stream, inside ONE continuous query.
  *
  * The join is stream–static on the row index: the static side is indexed
  * once via a distributed range-partitioned sort + `zipWithIndex` — NOT an
  * unpartitioned `row_number` window, which would funnel the whole table
  * through one partition.
  */
object Replay {

  /** Index the static rows 0..N-1 in `orderCol` order. `orderBy` range-
    * partitions (every partition's keys precede the next's), so per-
    * partition `zipWithIndex` offsets compose into a contiguous global
    * index without any single-partition stage. Deterministic when
    * `orderCol` is unique (the replay contract).
    */
  def indexed(df: DataFrame, orderCol: String): DataFrame = {
    val sorted = df.orderBy(col(orderCol))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("__idx", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

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
