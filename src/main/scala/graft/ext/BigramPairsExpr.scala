package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass adjacent-token pair builder — the scan kernel
  * under the n-gram LM family (bigram LM, stupid backoff): tokenize
  * once, emit every adjacent (w1, w2) pair in order, duplicates kept
  * (counts are the point). Value-identical to the interpreted
  * formulation `transform(sequence(1, n−1), i → struct(tᵢ, tᵢ₊₁))`
  * over `split(lower(text), "\s+")` — ScaleSpec pins corpus parity.
  *
  * Why an Expression: the interpreted lambda body re-evaluates the
  * OUTER tokens expression at every `element_at(t, i)` call — no
  * common-subexpression elimination inside interpreted higher-order
  * functions — so each document re-tokenizes per element: O(n²) per
  * doc, measured 4.4 s for a 265 k-pair corpus scan at sf0.1
  * (BigramProbe, round 9; same pathology the span-corruption and
  * shingle kernels removed). One compiled loop tokenizes once and
  * allocates the pair rows directly inside whole-stage codegen.
  */
case class BigramPairsExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BigramPairsExpr.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_pairs"

  @transient private lazy val ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  def compute(input: UTF8String): GenericArrayData = {
    val toks = ws.split(input.toLowerCase.toString, -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val u = new Array[UTF8String](n)
    var i = 0
    while (i < n) { u(i) = UTF8String.fromString(toks(i)); i += 1 }
    val out = new Array[Any](n - 1)
    i = 0
    while (i + 1 < n) {
      out(i) = new GenericInternalRow(
        Array[Any](u(i), u(i + 1))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bigramPairsExpr", this,
      classOf[BigramPairsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BigramPairsExpr =
    copy(child = newChild)
}

object BigramPairsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false))),
    containsNull = false)

  /** Column-API entry point. */
  def bigramPairs(c: Column): Column =
    ColumnBridge.column(BigramPairsExpr(ColumnBridge.expression(c)))
}
