package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream joins with watermarked state cleanup — the Structured
  * Streaming category the reference never reaches (its only join is the
  * per-event Redis lookup, SURVEY §2 row 3.4). An interval join of two
  * review streams: for every event on the left stream, right-stream events
  * from the same user within `intervalSeconds` after it.
  *
  * Watermarks bound the join state: left rows older than the watermark can
  * never match future right rows (and vice versa), so the state store
  * evicts them — without the watermark this join's state grows without
  * bound, which is the classic 100-TB streaming failure mode.
  */
object StreamJoins {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   watermark: String = "1 minute", intervalSeconds: Int = 30): DataFrame = {
    val l = left
      .withColumn("l_ts", timestamp_seconds(col("timestamp")))
      .withWatermark("l_ts", watermark)
      .select(col("userId"), col("productId").as("l_product"), col("l_ts"))
    val r = right
      .withColumn("r_ts", timestamp_seconds(col("timestamp")))
      .withWatermark("r_ts", watermark)
      .select(col("userId").as("r_userId"), col("productId").as("r_product"), col("r_ts"))
    l.join(r,
      col("userId") === col("r_userId") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $intervalSeconds SECONDS") &&
        col("l_product") =!= col("r_product"))
      .select(col("userId"), col("l_product"), col("r_product"), col("l_ts"), col("r_ts"))
  }
}
