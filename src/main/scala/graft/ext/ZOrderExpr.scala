package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two long keys — the clustering key
  * for multi-dimensional data layout. Sorting a 100 TB table by
  * `zorder(k1, k2)` before writing makes file-level min/max ranges
  * tight on BOTH dimensions simultaneously, so parquet row-group and
  * file pruning works for predicates on either key — where a plain
  * lexicographic sort prunes only its leading column.
  *
  * Takes the low 32 bits of each input (each key is expected to be
  * pre-bucketed, e.g. `k % 1024`); `left` occupies the even bit
  * positions, `right` the odd. Classic mask-spread bit arithmetic,
  * inlined into whole-stage codegen: the layout pass is a full-table
  * scan + sort, and the key must cost shifts, not dispatches.
  */
case class ZOrderExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpr.spread(a.asInstanceOf[Long]) |
      (ZOrderExpr.spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ea = ctx.freshName("even")
      val ob = ctx.freshName("odd")
      s"""
        long $ea = graft.ext.ZOrderExpr.spread($a);
        long $ob = graft.ext.ZOrderExpr.spread($b);
        ${ev.value} = $ea | ($ob << 1);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {

  /** Spread the low 32 bits of x to the even bit positions of a long
    * (bit i → bit 2i) via the standard 2-D Morton mask ladder. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def zorder(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
