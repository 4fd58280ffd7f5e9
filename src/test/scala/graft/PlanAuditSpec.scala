package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.plans.{Cross, LeftAnti, LeftSemi}
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide plan audit: NO query may silently degenerate into an
  * all-pairs plan. A CartesianProduct or a non-Cross
  * BroadcastNestedLoopJoin is the physical signature of a join that
  * lost its equi-keys — the #1 way a correct-at-sf0.01 query dies at
  * 100 TB. Whitelist = the queries whose all-pairs shape is the POINT
  * (documented ground-truth tiers and the literal cross-join demo);
  * Cross-typed BNLJ with a 1-row broadcast side is the standard
  * broadcast-scalar pattern and is allowed everywhere.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  /** All-pairs by design (ground-truth/verification tier, or the
    * cross-join capability demo itself). */
  private val allPairsByDesign = Set(
    "q_join_cross",       // the cross-join demo
    "q_dedup_embed_cosine" // exact all-pairs ground truth for the LSH path
  )

  /** BNLJ-Inner with a BOUNDED-BY-DESIGN broadcast side — the loop
    * side is a constant-cardinality dimension, not the fact table, so
    * the plan is O(facts·const): fine at any scale. Audited here so a
    * new unbounded case can't hide behind these. */
  private val boundedBroadcastLoop = Set(
    "q_rolling_active",   // 7-day band joins the ~|days| calendar side
    "q_sketch_union",     // per-group sketch table (|groups| rows)
    "q_ann_bruteforce",   // 10-row broadcast query set vs corpus
    "q_knn_labels",       // rides q_ann_bruteforce's query set
    "q_hard_negatives",   // 10-row anchor set broadcast vs corpus with
                          // a label-inequality loop predicate — the
                          // q_ann_bruteforce shape with a filter
    "q_ann_recall",       // recall gate re-plans the brute truth subtree
                          // twice (semi-join probe + n_true agg) — both
                          // are the same bounded 10-row broadcast loop
    "q_matryoshka_eval",  // full- and truncated-dim rankings both ride
                          // the q_ann_bruteforce 10-row broadcast
                          // query loop over one corpus scan each
    "q_isotonic_calibration", // PAVA-minimax interval/grid joins are
                          // triangular over the ≤100-row SCORE-BIN table
                          // (data-independent cardinality); the corpus
                          // collapses to those bins in one equi aggregate
                          // before any nested loop runs
    "q_dtw_distance",     // C(|event_types|,2) = 10-row pair fan: both
                          // sides are the |types|-row day-series table
                          // (events collapse to day arrays in one equi
                          // aggregate first); the DP kernel then runs
                          // scan-local inside DtwExpr
    "q_tukey_hsd"         // the same C(|types|,2) pair fan over the
                          // k-row per-type MOMENT table (events
                          // collapse in one equi aggregate first);
                          // type_a < type_b is the triangular-pair
                          // predicate, data-independent cardinality
  )

  private def offenders(p: SparkPlan): Seq[String] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    inner.collect {
      case c: CartesianProductExec =>
        s"CartesianProduct: ${c.simpleStringWithNodeId()}"
      case b: BroadcastNestedLoopJoinExec
          if b.joinType != Cross && b.joinType != LeftSemi &&
            b.joinType != LeftAnti =>
        // Cross-typed BNLJ = broadcast scalar (1-row stats join);
        // semi/anti with tiny broadcast side = IN/EXISTS subquery.
        s"BNLJ(${b.joinType}): ${b.simpleStringWithNodeId()}"
    }
  }

  for (q <- SparkEntry.catalog
      if !allPairsByDesign(q.name) && !boundedBroadcastLoop(q.name)) {
    test(s"${q.name} plans no cartesian / non-cross nested loop") {
      val bad = offenders(q.run(spark, sf).queryExecution.executedPlan)
      assert(bad.isEmpty, bad.mkString("; "))
    }
  }

  test("the whitelists themselves are still exercised (guards stay honest)") {
    // if someone fixes a whitelisted query to a banded plan, it should
    // move OUT of the whitelist — flag when the all-pairs shape is gone
    val stale = (allPairsByDesign ++ boundedBroadcastLoop).filterNot { name =>
      offenders(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan).nonEmpty ||
        name == "q_join_cross" // cross may plan as CartesianProduct OR BNLJ-Cross
    }
    assert(stale.isEmpty,
      s"no longer plan a flagged join — remove from whitelist: $stale")
  }
}
