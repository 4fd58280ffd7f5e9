package graft.ext

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def input = Tables.customer(spark, sf)
    .select($"c_nationkey".cast("long").as("nationkey"), $"c_custkey",
      round($"c_acctbal", 2).as("acctbal"))

  private def viaCustom(k: Int) =
    TopKPerKey.topK(input, Seq("nationkey"),
      Seq(("acctbal", false), ("c_custkey", true)), k)

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"nationkey")
      .orderBy($"acctbal".desc, $"c_custkey".asc)
    input.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k).drop("rn")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("custom operator returns exactly the window formulation's rows") {
    for (k <- Seq(1, 3, 10)) {
      assert(asSet(viaCustom(k)) === asSet(viaWindow(k)), s"k=$k")
    }
  }

  test("plans as partial + final exec around one exchange, no sort") {
    val df = viaCustom(3)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val execs = plan.collect { case t: TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true))
    assert(plan.collect { case e: ShuffleExchangeLike => e }.size === 1)
    assert(!plan.toString.contains("SortExec"),
      "bounded-heap top-k must not sort partitions")
  }

  test("k larger than any group degrades to identity") {
    assert(viaCustom(100000).count() === input.count())
  }

  test("k=1 yields one row per key (argmax)") {
    val got = viaCustom(1)
    assert(got.count() === input.select($"nationkey").distinct().count())
  }

  test("epoch flush: tiny retain cap still yields exact results at high key cardinality") {
    // 60k rows, 20k distinct keys (≫ cap): with maxPartialRows=256 the
    // partial pass flushes ~hundreds of epochs per task; the union of
    // epoch top-ks must still reduce to the exact per-key top-2.
    val df = spark.range(60000).selectExpr(
      "id % 20000 AS key",
      "CAST((id * 2654435761) % 1000 AS DOUBLE) AS score",
      "id AS tiebreak")
    val got = TopKPerKey.topK(df, Seq("key"),
      Seq(("score", false), ("tiebreak", true)), 2, maxPartialRows = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"key")
      .orderBy($"score".desc, $"tiebreak".asc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).drop("rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("retain cap keeps partial output a superset per epoch (cap=k edge)") {
    // cap equal to k: every row insertion can trigger a flush — the
    // degenerate worst case must still be exact.
    val df = spark.range(5000).selectExpr(
      "id % 97 AS key", "CAST(id % 31 AS DOUBLE) AS score",
      "id AS tiebreak")
    val got = TopKPerKey.topK(df, Seq("key"),
      Seq(("score", false), ("tiebreak", true)), 3, maxPartialRows = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"key")
      .orderBy($"score".desc, $"tiebreak".asc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("unknown column raises a clear error") {
    val e = intercept[Exception] {
      TopKPerKey.topK(input, Seq("nope"), Seq(("acctbal", false)), 3)
        .collect()
    }
    assert(e.getMessage.contains("nope"))
  }
}
