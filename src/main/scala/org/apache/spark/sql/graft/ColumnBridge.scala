package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters — the
  * supported extension-point pattern for libraries that add native
  * Catalyst expressions (Spark 4 moved the public `new Column(expr)`
  * constructor behind org.apache.spark.sql.classic.ExpressionUtils). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
