package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering under a total order — WITHOUT the
  * single-partition window Spark plans for `row_number() OVER (ORDER
  * BY …)` (its WindowExec warns "Moving all data to a single
  * partition"; at 100 TB that is a one-executor sort, the canonical
  * scale-killer).
  *
  * Shape: range-repartition on the sort key (so partition p holds keys
  * strictly below partition p+1), count rows per partition (a
  * #partitions-row table), turn counts into per-partition starting
  * offsets with a cumulative sum over that TINY table, broadcast the
  * offsets back, and add them to per-partition local row numbers. Two
  * shuffles of only the projected columns, no global sort point; the
  * result is identical to the single-partition form whenever the sort
  * order is total (strict — add a unique tie-break column, exactly as
  * you must anyway for deterministic ranks).
  *
  * This is the standard distributed ranking recipe (TeraSort-style
  * range partitioning + prefix offsets) and the building block for the
  * catalog's percent_rank / cume_dist / ntile queries.
  */
object GlobalRank {

  /** `df` plus a 1-based global row number column `rn` under the total
    * order `sort`. `sort` must be strict (no ties) for a deterministic
    * result — include a unique key as the last column. */
  def withRowNumber(df: DataFrame, sort: Seq[Column],
      rnCol: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val pid = "_graft_pid"
    // Range partitioning: partition boundaries come from a sample pass,
    // but the FINAL rank depends only on the total order, not on where
    // the boundaries fall — determinism survives resampling.
    val parted = df.repartitionByRange(nPart, sort: _*)
      .withColumn(pid, spark_partition_id())
    // Per-partition counts: nPart rows — the single-partition window
    // over THIS table is fine (it is bounded by the partition count,
    // not the data).
    val offsets = parted.groupBy(col(pid)).agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          Window.orderBy(col(pid))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(pid), col("_offset"))
    // Local row number within each range partition + that partition's
    // offset. The pid-partitioned window shuffles by pid (partitions
    // stay whole), never concentrates on one task.
    val w = Window.partitionBy(col(pid)).orderBy(sort: _*)
    parted.join(broadcast(offsets), pid)
      .withColumn(rnCol, row_number().over(w).cast("long") + col("_offset"))
      .drop(pid, "_offset")
  }

  /** SQL `ntile(k)` bucket from a global row number: the first
    * `n mod k` buckets get `n/k + 1` rows, the rest `n/k` — bit-exact
    * with the window function, computed without its single-partition
    * sort. `rn` is 1-based, `n` the total row count. */
  def ntileFromRn(rn: Column, n: Column, k: Int): Column = {
    // Column./ is DOUBLE division (SQL semantics) — use try_divide-free
    // explicit floor division to stay in long arithmetic.
    def fdiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val q = fdiv(n, lit(k))
    val r = n % k
    val bigRows = (q + 1) * r // rows living in the size-(q+1) buckets
    // greatest(q,1): when n < k the otherwise-branch is never TAKEN but
    // is still EVALUATED per row — keep its divisor nonzero.
    when(rn <= bigRows, fdiv(rn - 1, q + 1) + 1)
      .otherwise(r + fdiv(rn - 1 - bigRows, greatest(q, lit(1L))) + 1)
  }
}
