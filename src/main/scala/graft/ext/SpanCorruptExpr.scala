package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass T5/UL2 span corruption — builds the corrupted
  * input and the denoising target in one walk over the token stream:
  * every 7th position starting at 4 (1-based, when a following token
  * exists) opens a 2-token span replaced by `<extra_id_K>` in the
  * input and emitted after the same sentinel in the target. Returns a
  * struct (n_tokens, n_spans, corrupted, target).
  *
  * Bit-identical to the interpreted formulation (two `transform`
  * lambdas over `sequence(1, n)` + flatten + array_join): tokens come
  * from the same limit-−1 whitespace split (leading/trailing empty
  * tokens kept), and every piece — including empty tokens — is joined
  * with a single space exactly as `array_join` does, so double-space
  * artifacts replicate. The DuckDB oracle replays the interpreted
  * shape; ScaleSpec's splice-back test plus a corpus parity case pin
  * all three representations together.
  *
  * Why an Expression: the two interpreted transform lambdas walk an
  * eval tree per token (twice), putting the scan-local query at 4.5 s
  * at sf0.1; the fused pass is ~15×. Same (b)-tier rationale and
  * referenced-object call shape as [[LangIdExpr]]/[[TextStatsExpr]].
  */
case class SpanCorruptExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SpanCorruptExpr.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "span_corrupt"

  @transient private lazy val ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = ws.split(input.toLowerCase.toString, -1)
    val n = toks.length
    val corr = new java.lang.StringBuilder
    val tgt = new java.lang.StringBuilder
    // started-flags (not length checks) so a FIRST piece that is an
    // empty token still takes a separator before the next piece,
    // exactly like array_join over the flattened piece list
    var corrStarted = false
    var tgtStarted = false
    def addCorr(s: String): Unit = {
      if (corrStarted) corr.append(' '): Unit
      corr.append(s): Unit
      corrStarted = true
    }
    def addTgt(s: String): Unit = {
      if (tgtStarted) tgt.append(' '): Unit
      tgt.append(s): Unit
      tgtStarted = true
    }
    var nSpans = 0L
    var i = 1
    while (i <= n) {
      if (i % 7 == 4 && i < n) {
        val sentinel = "<extra_id_" + ((i - 4) / 7) + ">"
        addCorr(sentinel)
        addTgt(sentinel)
        addTgt(toks(i - 1))
        addTgt(toks(i))
        nSpans += 1
      } else if (i % 7 == 5) {
        // span body: dropped from the input, already in the target
      } else {
        addCorr(toks(i - 1))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, nSpans,
        UTF8String.fromString(corr.toString),
        UTF8String.fromString(tgt.toString)))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("spanCorruptExpr", this,
      classOf[SpanCorruptExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SpanCorruptExpr =
    copy(child = newChild)
}

object SpanCorruptExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("corrupted", StringType, nullable = false),
    StructField("target", StringType, nullable = false)))

  /** Column-API entry point. */
  def spanCorrupt(c: Column): Column =
    ColumnBridge.column(SpanCorruptExpr(ColumnBridge.expression(c)))
}
