package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ catalyst-Expression
  * converters (Spark 4 moved Column onto ColumnNode; the classic
  * converters are sql-private). This is the one sanctioned escape hatch
  * a library embedding custom Catalyst expressions needs — everything
  * else stays on public API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
