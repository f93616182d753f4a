package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-backend bridge: Spark 4 made `Column` backend-agnostic and scoped
  * the Expression↔Column converters `private[sql]`; custom Catalyst
  * expressions (e.g. [[org.apache.spark.sql.graft.CosineSimilarity]]) still need a
  * Column wrapper to participate in the DataFrame API. This one-liner lives
  * in the spark.sql namespace solely to re-export that converter.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The input frames of every UNPARTITIONED window in `df`'s optimized
    * plan, as runnable DataFrames (Dataset.ofRows is private[sql]; this
    * re-export exists so GlobalWindowSpec can COUNT the rows entering
    * each intentional global window and pin the metadata-bounded claim —
    * every `Window.orderBy` site in this library must prove its input is
    * bounded by dimensions (days, sources, buckets, k), never facts).
    */
  def globalWindowInputs(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, w.child)
    }
  }
}
