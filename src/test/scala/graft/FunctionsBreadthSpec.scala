package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining API-surface breadth: map-typed columns, describe/summary
  * statistics, seeded sampling determinism, id generation — the
  * long-tail operations a reference user may reach for.
  */
class FunctionsBreadthSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("map functions: create/keys/values/concat/element_at") {
    val df = Tables.nation(spark, sf)
      .select($"n_name", $"n_regionkey",
        map(lit("region"), $"n_regionkey".cast("string"),
          lit("name"), $"n_name").as("m"))
      .withColumn("m2", map_concat($"m",
        map(lit("extra"), lit("x"))))
    val r = df.collect()(0)
    val m2 = r.getAs[Map[String, String]]("m2")
    assert(m2.keySet === Set("region", "name", "extra"))
    assert(df.select(element_at($"m", "name")).collect()(0).getString(0)
      === r.getString(0))
    assert(df.select(map_keys($"m")).collect()(0).getSeq[String](0).sorted
      === Seq("name", "region"))
  }

  test("describe/summary produce the standard statistics rows") {
    val desc = Tables.orders(spark, sf).describe("o_totalprice")
      .collect().map(_.getString(0)).toSet
    assert(Set("count", "mean", "stddev", "min", "max").subsetOf(desc))
    val summ = Tables.orders(spark, sf).select("o_totalprice")
      .summary("25%", "50%", "75%").collect().map(_.getString(0)).toSet
    assert(summ === Set("25%", "50%", "75%"))
  }

  test("seeded sample is deterministic and approximately sized") {
    val li = Tables.lineitem(spark, sf)
    val a = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(a === b)
    val n = li.count()
    assert(a > n / 20 && a < n / 5, s"sample size $a of $n")
  }

  test("seeded randomSplit partitions without overlap or loss") {
    // orders has a unique key; lineitem's (orderkey, linenumber) pairs
    // are NOT unique in the synthetic data, which would make the
    // value-based intersect check meaningless
    val o = Tables.orders(spark, sf).select($"o_orderkey")
    val Array(tr, te) = o.randomSplit(Array(0.8, 0.2), seed = 7)
    assert(tr.count() + te.count() === o.count())
    assert(tr.intersect(te).count() === 0)
  }

  test("monotonically_increasing_id yields unique ids") {
    val ids = Tables.customer(spark, sf)
      .withColumn("id", monotonically_increasing_id())
    assert(ids.select("id").distinct().count() === ids.count())
  }
}
