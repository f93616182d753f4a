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
}
