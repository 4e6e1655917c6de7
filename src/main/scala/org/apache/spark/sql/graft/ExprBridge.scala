package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils): custom Catalyst
  * expressions need a way to become Columns; this is the supported
  * internal path and the only code we place inside the Spark
  * namespace.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
