package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's unified Column API hides the Column ↔ catalyst Expression
  * bridge behind `private[sql]`; custom Expressions still need it to be
  * exposed as Columns. This shim lives in the org.apache.spark.sql
  * namespace solely to re-export those two conversions — the standard
  * pattern for Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
