package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused codegen dynamic-time-warping distance for two `array<long>`
  * series (Sakoe–Chiba 1978, the unconstrained-band case): the
  * alignment-cost kernel of q_dtw_distance, all-integer — local cost
  * |xᵢ − yⱼ|, D(i,j) = cost + min(D(i−1,j), D(i,j−1), D(i−1,j−1)).
  *
  * A dataflow formulation of this DP would need an O(n·m) self-join
  * or an n-deep iterative loop PER PAIR — the in-row dependency
  * (D(i,j) on D(i,j−1)) makes it inexpressible as a window. Inside a
  * scan-stage expression it is two rolling O(m) buffers and a tight
  * loop, so each pair costs n·m integer ops with zero allocation
  * beyond the two buffers and no shuffle at all: the right custom-
  * Expression case per the tier rules (compose > Expression > plan),
  * since composition genuinely cannot express it. The DuckDB oracle
  * replays the same recurrence with a recursive CTE over rows and a
  * list_reduce fold within each row — exact integers on both sides.
  *
  * Overflow headroom: costs are day-cents deltas (≲1e10); a warping
  * path visits ≤ n+m cells, so accumulated cost ≲ (n+m)·1e10 —
  * decades of daily data stay far under int64. The `Inf` sentinel is
  * 2⁶² so Inf + cost cannot wrap. An empty side yields 0 by
  * convention — alignment is undefined there, and callers guarantee
  * non-empty series (a groupBy day rollup always has ≥ 1 row).
  */
case class DtwExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return 0L
    val Inf = DtwExpr.Inf
    val prev = new Array[Long](m + 1)
    val curr = new Array[Long](m + 1)
    var j = 1
    prev(0) = 0L
    while (j <= m) { prev(j) = Inf; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = Inf
      val xi = x.getLong(i - 1)
      j = 1
      while (j <= m) {
        val d = xi - y.getLong(j - 1)
        val cost = if (d < 0) -d else d
        var best = prev(j)
        if (curr(j - 1) < best) best = curr(j - 1)
        if (prev(j - 1) < best) best = prev(j - 1)
        curr(j) = cost + best
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val prev = ctx.freshName("prev")
      val curr = ctx.freshName("curr")
      val xi = ctx.freshName("xi")
      val d = ctx.freshName("d")
      val cost = ctx.freshName("cost")
      val best = ctx.freshName("best")
      s"""
        int $n = $a.numElements();
        int $m = $b.numElements();
        if ($n == 0 || $m == 0) {
          ${ev.value} = 0L;
        } else {
          long[] $prev = new long[$m + 1];
          long[] $curr = new long[$m + 1];
          $prev[0] = 0L;
          for (int $j = 1; $j <= $m; $j++) $prev[$j] = ${DtwExpr.Inf}L;
          for (int $i = 1; $i <= $n; $i++) {
            $curr[0] = ${DtwExpr.Inf}L;
            long $xi = $a.getLong($i - 1);
            for (int $j = 1; $j <= $m; $j++) {
              long $d = $xi - $b.getLong($j - 1);
              long $cost = $d < 0 ? -$d : $d;
              long $best = $prev[$j];
              if ($curr[$j - 1] < $best) $best = $curr[$j - 1];
              if ($prev[$j - 1] < $best) $best = $prev[$j - 1];
              $curr[$j] = $cost + $best;
            }
            System.arraycopy($curr, 0, $prev, 0, $m + 1);
          }
          ${ev.value} = $prev[$m];
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwExpr =
    copy(left = newLeft, right = newRight)
}

object DtwExpr {
  /** 2⁶² — an additive-overflow-safe infinity for the DP borders,
    * mirrored literally in the DuckDB oracle. */
  val Inf: Long = 1L << 62

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def dtw(a: Column, b: Column): Column =
    ColumnBridge.column(DtwExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
