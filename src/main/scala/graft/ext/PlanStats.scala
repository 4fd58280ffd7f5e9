package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Structural plan counters for the headliner regression gate
  * (VERDICT r14 #2): wall-time regression detection is noise-limited
  * (round 14's artifact carried a phantom 22 % load regression), but
  * the SHAPE of a plan — how many shuffle exchanges, broadcast
  * exchanges, and source scans it contains — is deterministic for a
  * fixed input + config. HeadlinePlanPinSpec pins these counts per
  * headliner; growth fails the suite the moment a commit introduces
  * an extra shuffle, long before any bench can see it through noise.
  *
  * Counted on the PRE-adaptive plan (AdaptiveSparkPlanExec.initialPlan
  * — AQE only ever REMOVES work at runtime, e.g. converting a shuffle
  * join to broadcast, and the static plan is what commits can regress)
  * and across subquery plans (a shuffle hiding inside a scalar
  * subquery is still a shuffle).
  */
object PlanStats {
  final case class Counts(shuffles: Int, broadcasts: Int, scans: Int) {
    override def toString = s"Counts($shuffles, $broadcasts, $scans)"
  }

  def of(df: DataFrame): Counts = ofPlan(df.queryExecution.executedPlan)

  def ofPlan(p: SparkPlan): Counts = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val shuffles = inner.collectWithSubqueries {
      case _: ShuffleExchangeExec => 1
    }.sum
    val broadcasts = inner.collectWithSubqueries {
      case _: BroadcastExchangeExec => 1
    }.sum
    // leaf "scan" nodes of any source kind: parquet FileSourceScan,
    // DSv2 BatchScan, RDD/ExternalRDD scans (checkpointed iterative
    // queries), in-memory relation scans, local relations
    val scans = inner.collectWithSubqueries {
      case l if l.children.isEmpty &&
        l.nodeName.toLowerCase(java.util.Locale.ROOT).contains("scan") => 1
    }.sum
    Counts(shuffles, broadcasts, scans)
  }
}
