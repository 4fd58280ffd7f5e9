package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Sum of a binary column's UNSIGNED bytes as one fused codegen loop —
  * the decoded-content "luma" kernel of the frame queries. The
  * Column-API formulation (aggregate over sequence + conv(hex-pair))
  * is semantically identical but runs as an INTERPRETED higher-order
  * function that materializes the blob's hex string per row — the
  * same class of overhead PolyHashExpr replaced (measured 3.6× there;
  * QBench round 14 measures this swap on the byte-stride shot query,
  * q_byte_shots since round 15). Byte
  * semantics match DuckDB's strpos-decoded hex pairs exactly: each
  * byte contributes its unsigned value, empty input → 0.
  */
case class ByteSumExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_sum needs BINARY input, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < b.length) { acc += (b(i) & 0xff); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      s"""
        long ${ev.value}Acc = 0L;
        for (int $i = 0; $i < $c.length; $i++) {
          ${ev.value}Acc += ($c[$i] & 0xff);
        }
        ${ev.value} = ${ev.value}Acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSumExpr =
    copy(child = newChild)
}

object ByteSumExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def byteSum(c: Column): Column =
    ColumnBridge.column(ByteSumExpr(ColumnBridge.expression(c)))
}
