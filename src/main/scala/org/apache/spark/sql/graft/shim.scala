package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and Catalyst `Expression` for our
  * custom expressions. Spark 4 made the converters `private[sql]`
  * (columnNodeSupport.scala), so this one-file shim lives in the sql
  * package namespace — the sanctioned pattern for Spark-native
  * libraries extending Catalyst. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
