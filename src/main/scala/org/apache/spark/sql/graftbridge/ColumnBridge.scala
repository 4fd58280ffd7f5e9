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

/** DataFrame ↔ LogicalPlan bridge (Dataset.ofRows is private[sql]) —
  * needed to hand a custom logical operator back to the session. */
object PlanBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
