package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Whole-operator extension showcase (design-rule tier (c): custom
  * `LogicalPlan` + `Strategy` + `SparkPlan`): exact per-key top-k
  * without the window-function plan's full per-partition sort.
  *
  * The built-in formulation — `row_number().over(partitionBy(key)
  * .orderBy(ord)) <= k` — must sort EVERY group's rows. This operator
  * keeps a bounded k-element heap per key and plans as two stages:
  * a partial pass on the map side (each partition reduces to ≤ k rows
  * per locally-seen key — correct because a key's global top-k is a
  * subset of the union of its per-partition top-ks) and a final pass
  * after a hash exchange on the key. Shuffle volume drops from
  * |input| to ≤ k·|keys per partition| — the same shape partial
  * aggregation gives groupBy, applied to top-k. At 100 TB this is the
  * difference between shuffling the fact table and shuffling k rows
  * per key per executor.
  *
  * Rows are emitted per key in heap-drain order sorted by `order`.
  * Results are identical to the window formulation whenever `order` is
  * a total order (ties broken by a unique column) — asserted against
  * the window plan in TopKPerKeySpec and oracled as q_topk_custom.
  */
case class TopKPerKey(
    keyNames: Seq[String],
    order: Seq[(String, Boolean)], // (column, ascending)
    k: Int,
    child: LogicalPlan,
    maxPartialRows: Int = TopKPerKey.DefaultMaxPartialRows)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // key/order columns are referenced by NAME (not Expression fields),
  // and the heap compares whole rows — without this the optimizer's
  // ColumnPruning sees no references and prunes the child to nothing
  // under column-free parents like count()
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Memory contract:
  *
  *  - PARTIAL pass (map side): retained rows are capped at
  *    `maxPartialRows` — when the cap is hit the accumulated per-key
  *    heaps are FLUSHED downstream and the map is cleared (an "epoch").
  *    Correct because top-k(S) ⊆ ∪ top-k(Sᵢ) for any partition
  *    S = ⊎ Sᵢ: a row beaten by k better rows within its epoch is
  *    beaten by k better rows overall. Flushing trades shuffle volume
  *    (≤ k·keys per epoch instead of k·keys per partition) for bounded
  *    memory — the same escape hatch hash aggregation gets from
  *    spilling partial aggregates.
  *  - FINAL pass (reduce side): must hold k rows per key assigned to
  *    the reducer — ≈ k·|keys|/shuffle-partitions rows. This is the
  *    operator's cardinality contract; when k·|keys| approaches the
  *    input size itself, the window-sort formulation (which spills) is
  *    the better plan and this operator buys nothing anyway.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    maxPartialRows: Int = TopKPerKey.DefaultMaxPartialRows)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val cap = if (partial) maxPartialRows else Int.MaxValue
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // better row = smaller under `ord`; heap head = current worst
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(
        BindReferences.bindReferences(sortExprs, childOutput))
      new Iterator[InternalRow] {
        private val heaps = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.PriorityQueue[UnsafeRow]]()
        private var retained = 0
        private var outQueue: Iterator[UnsafeRow] = Iterator.empty

        private def drain(): Iterator[UnsafeRow] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
          val values = heaps.values().iterator()
          while (values.hasNext) {
            out ++= values.next().dequeueAll.reverse // best-first per key
          }
          heaps.clear()
          retained = 0
          out.iterator
        }

        /** Consume input until the retain cap forces an epoch flush or
          * the input ends; returns whether any output was produced. */
        private def advance(): Boolean = {
          if (!it.hasNext && heaps.isEmpty) return false
          while (it.hasNext) {
            val row = it.next().asInstanceOf[UnsafeRow]
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
                ord.asInstanceOf[Ordering[UnsafeRow]])
              heaps.put(key.copy(), heap)
            }
            if (heap.size < kLocal) {
              heap.enqueue(row.copy()); retained += 1
            } else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            if (retained >= cap) { outQueue = drain(); return true }
          }
          outQueue = drain()
          outQueue.hasNext
        }

        override def hasNext: Boolean = outQueue.hasNext || advance()
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          outQueue.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keyNames, order, k, child, maxPartialRows) =>
      def attr(n: String): Attribute = child.output
        .find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(
          s"TopKPerKey: column $n not in ${child.output.map(_.name)}"))
      val keys = keyNames.map(attr)
      val sortOrder = order.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending)
      }
      TopKPerKeyExec(keys, sortOrder, k, partial = false,
        TopKPerKeyExec(keys, sortOrder, k, partial = true,
          planLater(child), maxPartialRows)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Partial-pass retain cap (rows across all heaps in one task).
    * ~1 M UnsafeRow copies ≈ low hundreds of MB for typical widths —
    * well inside an executor's working memory while keeping epoch
    * flushes rare (only kicks in at ≥1M/k distinct keys per task). */
  val DefaultMaxPartialRows: Int = 1 << 20

  /** Register the strategy (idempotent) and run per-key top-k through
    * the custom operator. Order pairs are (column, ascending). */
  def topK(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int,
      maxPartialRows: Int = DefaultMaxPartialRows): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    PlanBridge.ofRows(spark,
      TopKPerKey(keys, order, k, PlanBridge.analyzed(df), maxPartialRows))
  }
}
