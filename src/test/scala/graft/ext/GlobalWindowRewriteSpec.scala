package graft.ext

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalWindowRewriteSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  // isolated sibling session: installing the rule must not change
  // plans for the other suites sharing SparkTestSession
  private lazy val ext = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s
  }

  private def input(s: org.apache.spark.sql.SparkSession) =
    Tables.customer(s, sf)
      .select(col("c_custkey"), col("c_acctbal"))

  test("global row_number is rewritten away from the one-task sort") {
    val df = input(ext).withColumn("rn",
      row_number().over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_gw_pid"),
      s"rewrite did not fire:\n$plan")
    // the remaining SinglePartition exchange belongs to the
    // #partitions-row offsets table, not the data path
    val singles = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(singles <= 1, s"data still funnels through one task:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange on the data path:\n$plan")
  }

  test("rewritten plan returns exactly the original ranks") {
    val base = input(spark).withColumn("rn",
        row_number().over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
      .select(col("c_custkey"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rewritten = input(ext).withColumn("rn",
        row_number().over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
      .select(col("c_custkey"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rewritten === base)
  }

  test("downstream operators over the rewritten attribute still work") {
    val df = input(ext).withColumn("rn",
        row_number().over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
      .filter(col("rn") <= 10)
      .withColumn("even", col("rn") % 2 === 0)
    assert(df.count() === 10)
    assert(df.filter(col("even")).count() === 5)
  }

  test("rank/dense_rank and partitioned windows are left alone") {
    val ranked = input(ext).withColumn("r",
      rank().over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
    assert(!ranked.queryExecution.executedPlan.toString.contains("_gw_pid"),
      "rank() must not be rewritten (peer semantics)")
    val parted = input(ext).withColumn("rn",
      row_number().over(Window.partitionBy(col("c_custkey") % 7)
        .orderBy(col("c_acctbal"), col("c_custkey"))))
    assert(!parted.queryExecution.executedPlan.toString.contains("_gw_pid"),
      "partitioned windows must not be rewritten")
  }
}
