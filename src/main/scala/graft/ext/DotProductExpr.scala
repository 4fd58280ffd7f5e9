package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused codegen dot product for two `array<double>` columns — the
  * inner loop of every similarity query (ANN brute-force re-rank, LSH
  * hyperplane signatures, cosine near-dup).
  *
  * The Column-API form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * semantically the same but evaluates the lambdas INTERPRETED, one
  * dispatch per element, and materializes the zipped array. At
  * corpus×queries×dim scale that interpreter overhead dominates the
  * scan. This expression compiles to a bare `acc += a[i]*b[i]` loop
  * over the unsafe array data inside whole-stage codegen: no
  * allocation, no virtual calls (parity with the interpreted form is
  * locked in SimilaritySpec).
  *
  * Contract: element nulls are not expected (embedding vectors are
  * dense); lengths normally match — the shorter length bounds the loop
  * so a ragged pair degrades to a truncated dot, never an exception.
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
