package graft.ext

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalRankSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def input = Tables.customer(spark, sf)
    .select($"c_custkey", $"c_acctbal")

  test("withRowNumber equals the single-partition window row_number") {
    val viaWindow = input
      .withColumn("rn_w", row_number()
        .over(Window.orderBy($"c_acctbal", $"c_custkey")).cast("long"))
      .select($"c_custkey", $"rn_w")
    val viaRank = GlobalRank
      .withRowNumber(input, Seq($"c_acctbal", $"c_custkey"))
      .select($"c_custkey", $"rn")
    val diff = viaRank.join(viaWindow, "c_custkey")
      .filter($"rn" =!= $"rn_w").count()
    assert(diff === 0, "distributed rank diverges from window rank")
    assert(viaRank.count() === input.count())
  }

  test("ntileFromRn replays SQL ntile bucket sizes bit-exactly") {
    // n=47, k=10: first 7 buckets get 5 rows, last 3 get 4 — the
    // uneven case the naive floor(rn*k/n) formula gets wrong.
    val n = 47
    val rows = (1 to n).map(_.toLong).toDF("x")
    val viaWindow = rows.withColumn("b",
      ntile(10).over(Window.orderBy($"x")).cast("long"))
    val viaFormula = rows
      .withColumn("rn", $"x")
      .withColumn("b2", GlobalRank.ntileFromRn($"rn", lit(n.toLong), 10))
    val diff = viaWindow.join(viaFormula, "x")
      .filter($"b" =!= $"b2").count()
    assert(diff === 0)
  }

  test("no single-partition exchange in the GlobalRank plan") {
    val plan = GlobalRank
      .withRowNumber(input, Seq($"c_acctbal", $"c_custkey"))
      .queryExecution.executedPlan.toString
    // the data path must range-partition, never funnel the table
    // through one task the way an unpartitioned window does; the only
    // allowed SinglePartition exchange is the offsets side, whose
    // input is the #shuffle-partitions-row count table
    val singles = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(singles <= 1,
      s"data path funnels through SinglePartition:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"expected range partitioning in:\n$plan")
    assert(plan.contains("hashpartitioning(_graft_pid"),
      s"expected pid-local window shuffle in:\n$plan")
  }
}
