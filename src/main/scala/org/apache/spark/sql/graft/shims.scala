package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned crossing between graft's custom Catalyst expressions
  * and the public Column API. Spark 4 moved Column onto ColumnNode and made
  * the Expression⇄Column converters `private[sql]`; this shim lives in the
  * sql package solely to re-export them. Nothing else may go here. */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
