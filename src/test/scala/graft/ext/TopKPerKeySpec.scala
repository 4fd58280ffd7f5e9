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

  test("unknown column raises a clear error") {
    val e = intercept[Exception] {
      TopKPerKey.topK(input, Seq("nope"), Seq(("acctbal", false)), 3)
        .collect()
    }
    assert(e.getMessage.contains("nope"))
  }
}
