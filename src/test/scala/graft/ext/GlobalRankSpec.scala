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

  test("withPrefixSum equals the single-partition window running sum") {
    val base = Tables.orders(spark, sf)
      .select($"o_orderkey", ($"o_orderkey" % 97).as("v"))
    val viaWindow = base
      .withColumn("cum_w", sum($"v")
        .over(Window.orderBy($"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"o_orderkey", $"cum_w")
    val viaRank = GlobalRank
      .withPrefixSum(base, Seq($"o_orderkey"), $"v")
      .select($"o_orderkey", $"cum")
    val diff = viaRank.join(viaWindow, "o_orderkey")
      .filter($"cum" =!= $"cum_w").count()
    assert(diff === 0, "distributed prefix sum diverges from window")
    assert(viaRank.count() === base.count())
  }

  test("withPrefixMax equals the single-partition exclusive window max") {
    val base = Tables.orders(spark, sf)
      .select($"o_orderkey", ($"o_orderkey" * 31 % 997).as("v"))
    val viaWindow = base
      .withColumn("pm_w", max($"v")
        .over(Window.orderBy($"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select($"o_orderkey", $"pm_w")
    val viaRank = GlobalRank
      .withPrefixMax(base, Seq($"o_orderkey"), $"v")
      .select($"o_orderkey", $"pmax")
    val diff = viaRank.join(viaWindow, "o_orderkey")
      .filter(!($"pmax" <=> $"pm_w")).count()
    assert(diff === 0, "distributed prefix max diverges from window")
    // exactly one row (the global minimum key) has no predecessor
    assert(viaRank.filter($"pmax".isNull).count() === 1)
  }

  test("no single-partition exchange in the GlobalRank plan") {
    val plan = GlobalRank
      .withRowNumber(input, Seq($"c_acctbal", $"c_custkey"))
      .queryExecution.executedPlan.toString
    // the data path must spread by deterministic key buckets, never
    // funnel the table through one task the way an unpartitioned
    // window does; the only allowed SinglePartition exchange is the
    // offsets side, whose input is the #buckets-row count table
    val singles = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(singles <= 1,
      s"data path funnels through SinglePartition:\n$plan")
    assert(plan.contains("hashpartitioning(_gr_pid"),
      s"expected deterministic pid bucketing in:\n$plan")
  }

  test("rank survives with exchange reuse AND AQE disabled") {
    // The naive double-repartitionByRange formulation silently relies
    // on exchange reuse: each physical range exchange re-samples its
    // boundaries from an RDD-id-derived seed, so with reuse off the
    // counts side can disagree with the data side (measured 13 152 of
    // 15 000 ranks wrong at sf0.1 before the quantile-literal
    // bucketing fix). Pin the fix under the hostile config.
    val reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.exchange.reuse", "false")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val viaWindow = input
        .withColumn("rn_w", row_number()
          .over(Window.orderBy($"c_acctbal", $"c_custkey")).cast("long"))
        .select($"c_custkey", $"rn_w")
      val viaRank = GlobalRank
        .withRowNumber(input, Seq($"c_acctbal", $"c_custkey"))
        .select($"c_custkey", $"rn")
      val diff = viaRank.join(viaWindow, "c_custkey")
        .filter($"rn" =!= $"rn_w").count()
      assert(diff === 0,
        "rank must not depend on exchange reuse for correctness")
    } finally {
      spark.conf.set("spark.sql.exchange.reuse", reuse)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("withRowNumberAndPrefixSum equals the two-call composition " +
      "byte for byte") {
    import spark.implicits._
    val df = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars")
    val sort = Seq(col("n_chars"), col("doc_id"))
    val combined = GlobalRank
      .withRowNumberAndPrefixSum(df, sort, col("n_chars"))
      .select($"doc_id", $"rn", $"cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val twoCall = GlobalRank
      .withPrefixSum(GlobalRank.withRowNumber(df, sort), sort,
        col("n_chars"))
      .select($"doc_id", $"rn", $"cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(combined.toSeq === twoCall.toSeq)
    // and both equal the single-partition window truth
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"n_chars".asc, $"doc_id".asc)
    val truth = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"n_chars").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .select($"doc_id", $"rn", $"cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(combined.toSeq === truth.toSeq)
  }
}
