package graft.scale

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("pagerank conserves rank mass up to integer-truncation dust") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank_fp")).sum
    // every iteration truncates ≤1 fp-unit per EDGE at the
    // contribution division plus ≤2 per node (damping + teleport) —
    // mass can only leak DOWN from FpOne, bounded by those counts
    import spark.implicits._
    val nEdges = 2L * graft.Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_partkey").distinct().count()
    val maxLeak = GraphOps.Iterations * (nEdges + 2L * rows.length)
    assert(total <= GraphOps.FpOne, s"mass above 1: $total")
    assert(total >= GraphOps.FpOne - maxLeak,
      s"leaked more than truncation can explain: $total")
    rows.foreach(r => assert(r.getAs[Long]("rank_fp") > 0L))
  }

  test("pagerankOn API: the hub of a star graph outranks every leaf") {
    import SparkTestSession.spark.implicits._
    // undirected star: hub <-> leaf1..leaf6 (both directions)
    val leaves = (1 to 6).map(i => s"leaf$i")
    val edges = leaves.flatMap(l => Seq(("hub", l), (l, "hub")))
      .toDF("src", "dst")
    val ranks = GraphOps.pagerankOn(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rank_fp")).toMap
    assert(ranks.size === 7)
    val hub = ranks("hub")
    leaves.foreach(l => assert(hub > ranks(l), s"hub <= $l"))
    // symmetric leaves must tie exactly (integer arithmetic: no drift)
    assert(leaves.map(ranks).distinct.size === 1)
  }

  test("pagerank favors high-degree nodes") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    // suppliers connect to many parts; parts to few suppliers — the
    // average supplier must outrank the average part
    val (sup, part) = rows.partition(_.getAs[String]("node").startsWith("s"))
    val supAvg = sup.map(_.getAs[Long]("rank_fp")).sum.toDouble / sup.length
    val partAvg = part.map(_.getAs[Long]("rank_fp")).sum.toDouble / part.length
    assert(supAvg > partAvg,
      s"supplier avg $supAvg not above part avg $partAvg")
  }
}
