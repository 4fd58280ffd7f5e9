package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused codegen longest-common-subsequence LENGTH for two
  * `array<long>` token sequences — the alignment kernel of ROUGE-L
  * (Lin 2004): L(i,j) = L(i−1,j−1)+1 when xᵢ = yⱼ else
  * max(L(i−1,j), L(i,j−1)).
  *
  * Same tier-(b) justification as [[DtwExpr]]: the in-row dependency
  * (L(i,j) on L(i,j−1)) is window-inexpressible, and a dataflow
  * formulation would need an O(n·m) self-join per pair. As a
  * scan-stage expression it is two rolling O(m) buffers inside
  * whole-stage codegen — no shuffle, no allocation beyond the
  * buffers. The DuckDB oracle replays the identical recurrence with
  * the DTW oracle's recursive-CTE + list_reduce row fold.
  *
  * All values are small nonnegative integers (≤ min(n,m)), so no
  * overflow concern exists at any scale; empty sides yield 0 (the
  * correct LCS of an empty sequence, no sentinel needed).
  */
case class LcsExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return 0L
    val prev = new Array[Long](m + 1)
    val curr = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      val xi = x.getLong(i - 1)
      var j = 1
      while (j <= m) {
        curr(j) =
          if (xi == y.getLong(j - 1)) prev(j - 1) + 1L
          else if (curr(j - 1) >= prev(j)) curr(j - 1)
          else prev(j)
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
      s"""
        int $n = $a.numElements();
        int $m = $b.numElements();
        if ($n == 0 || $m == 0) {
          ${ev.value} = 0L;
        } else {
          long[] $prev = new long[$m + 1];
          long[] $curr = new long[$m + 1];
          for (int $i = 1; $i <= $n; $i++) {
            long $xi = $a.getLong($i - 1);
            for (int $j = 1; $j <= $m; $j++) {
              if ($xi == $b.getLong($j - 1)) {
                $curr[$j] = $prev[$j - 1] + 1L;
              } else {
                $curr[$j] = $curr[$j - 1] >= $prev[$j]
                  ? $curr[$j - 1] : $prev[$j];
              }
            }
            System.arraycopy($curr, 0, $prev, 0, $m + 1);
          }
          ${ev.value} = $prev[$m];
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsExpr =
    copy(left = newLeft, right = newRight)
}

object LcsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def lcs(a: Column, b: Column): Column =
    ColumnBridge.column(LcsExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
