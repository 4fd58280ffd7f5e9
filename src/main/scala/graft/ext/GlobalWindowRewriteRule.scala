package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule that repairs the classic scale-killer
  * `row_number() OVER (ORDER BY …)` — an unpartitioned window, which
  * Spark executes by moving EVERY row to a single partition (WindowExec
  * logs exactly that warning) — by rewriting it into the distributed
  * [[GlobalRank]] shape:
  *
  * {{{
  *   Window(row_number over (order by k))          -- one-task sort
  * ⇒ range-repartition by k
  *   ⋈ broadcast(per-partition row counts → prefix offsets)
  *   window(row_number partition by partition-id) + offset
  * }}}
  *
  * The rewrite preserves the original output attribute (same exprId,
  * same IntegerType), so downstream operators are untouched. It fires
  * only on a Window node whose ONLY window expression is a bare
  * row_number with empty partitionSpec — the unambiguous
  * global-ranking pattern; rank/dense_rank carry peer semantics that
  * need the strict-order caveat a human should sign off on, so they
  * are left alone.
  *
  * The offsets branch re-derives from a COPY of the child with
  * re-instanced leaves (same discipline `Dataset.join` applies to
  * self-joins), so no attribute exprId appears on both sides of the
  * join. Installed via [[GraftExtensions]]; exercised and
  * plan-asserted in ExtensionsSpec.
  */
object GlobalWindowRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // The rewrite references the range exchange from both the data
    // path and the counts path; physical exchange reuse (default on)
    // is what pins both to ONE sampled set of boundaries. Without it
    // the two exchanges could sample different boundaries — leave the
    // plan alone rather than trade a slow plan for a wrong one.
    if (!conf.exchangeReuseEnabled) plan
    else plan.transformUp {
      case Window(
          Seq(alias @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(Nil, _, _)),
            _)),
          Nil, order, child, _) if order.nonEmpty && child.resolved =>
        rewrite(alias, order, child)
    }
  }

  /** Fresh-exprId copy of `plan`: leaves are re-instanced and every
    * reference to a leaf output is remapped (aliases created above
    * the leaves already carry unique ids). */
  private def freshCopy(plan: LogicalPlan): LogicalPlan = {
    val remap = mutable.Map.empty[ExprId, Attribute]
    val relabeled = plan.transformUp {
      case m: MultiInstanceRelation =>
        val old = m.asInstanceOf[LogicalPlan].output
        val fresh = m.newInstance()
        old.zip(fresh.output).foreach { case (o, n) =>
          remap(o.exprId) = n
        }
        fresh.asInstanceOf[LogicalPlan]
    }
    relabeled.transformAllExpressions {
      case a: AttributeReference =>
        remap.get(a.exprId)
          .map(_.withQualifier(a.qualifier).withName(a.name))
          .getOrElse(a)
    }
  }

  private def rewrite(alias: Alias, order: Seq[SortOrder],
      child: LogicalPlan): LogicalPlan = {
    val nPart = conf.numShufflePartitions

    // data path: range partition on the sort key, tag partition ids
    val pidL = Alias(SparkPartitionID(), "_gw_pid")()
    val partedL = Project(child.output :+ pidL,
      RepartitionByExpression(order, child, Some(nPart)))

    // offsets path: an independent copy (fresh leaf exprIds), same
    // range partitioning — partition p holds the same key range on
    // both sides, so its row count is identical
    val childR = freshCopy(child)
    val orderR = order.map(_.transform {
      case a: AttributeReference =>
        childR.output.find(_.name == a.name).getOrElse(a)
    }.asInstanceOf[SortOrder])
    val pidR = Alias(SparkPartitionID(), "_gw_pid_r")()
    val partedR = Project(childR.output :+ pidR,
      RepartitionByExpression(orderR, childR, Some(nPart)))
    val cnt = Alias(AggregateExpression(Count(Seq(Literal(1))),
      Complete, isDistinct = false), "_gw_cnt")()
    val agg = Aggregate(Seq(pidR.toAttribute),
      Seq(pidR.toAttribute, cnt), partedR)
    // running offset over the nPart-row count table — the only
    // unpartitioned window left, bounded by the partition count
    val offSpec = WindowSpecDefinition(Nil,
      Seq(SortOrder(pidR.toAttribute, Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))
    val offRaw = Alias(WindowExpression(
      AggregateExpression(Sum(cnt.toAttribute), Complete,
        isDistinct = false), offSpec), "_gw_off_raw")()
    val offWindow = Window(Seq(offRaw), Nil,
      Seq(SortOrder(pidR.toAttribute, Ascending)), agg)
    val offset = Alias(Coalesce(Seq(offRaw.toAttribute, Literal(0L))),
      "_gw_off")()
    val offsets = Project(Seq(pidR.toAttribute, offset), offWindow)

    // hint goes directly on the Join: EliminateResolvedHint has
    // already run by the time user-provided optimizer rules fire, so
    // a ResolvedHint wrapper would survive to execution and trip the
    // planner's internal-error check
    val joined = Join(partedL, offsets, Inner,
      Some(EqualTo(pidL.toAttribute, pidR.toAttribute)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // local row number within each range partition + that partition's
    // offset, surfaced under the ORIGINAL attribute id and type
    val localSpec = WindowSpecDefinition(Seq(pidL.toAttribute), order,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    val localRn = Alias(WindowExpression(RowNumber(), localSpec),
      "_gw_rn")()
    val rnWindow = Window(Seq(localRn), Seq(pidL.toAttribute), order,
      joined)
    val rnFinal = Alias(
      Cast(Add(Cast(localRn.toAttribute, LongType),
        offset.toAttribute), IntegerType),
      alias.name)(exprId = alias.exprId)
    Project(child.output :+ rnFinal, rnWindow)
  }
}
