package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of TextOps.polyHash — the portable 31-bit
  * polynomial codepoint hash (h = foldl (acc·base + cp) mod 2³¹-1)
  * that every oracled sketch query keys on.
  *
  * The Column-API formulation (`aggregate(split(s,""), ...)`) is
  * semantically identical but runs as an INTERPRETED higher-order
  * function and materializes a per-char array — measured 3.6× slower
  * than codegen'd aggregates on this corpus shape (BENCHNOTES round 1).
  * This expression walks the string's codepoints in one fused loop
  * inside whole-stage codegen: no array, no lambda dispatch, exactly
  * the same values (parity locked by PropertySpec against the
  * interpreted fold, and transitively by the DuckDB oracles).
  *
  * Codepoint semantics match Spark's `split(s,"")`+`ascii` and
  * DuckDB's `string_split(s,'')`+`ord`: one term per unicode
  * codepoint (surrogate pairs advance by two chars), empty string → 0.
  */
case class PolyHashExpr(child: Expression, base: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  private val P = 2147483647L

  override protected def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
        java.lang.String $str = $c.toString();
        long ${ev.value}Acc = 0L;
        int $i = 0;
        while ($i < $str.length()) {
          int $cp = $str.codePointAt($i);
          ${ev.value}Acc = (${ev.value}Acc * ${base}L + $cp) % ${P}L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = ${ev.value}Acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def polyHash(c: Column, base: Long): Column =
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(c), base))
}
