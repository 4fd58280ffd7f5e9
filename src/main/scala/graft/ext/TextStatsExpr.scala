package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass per-document text statistics — the shared
  * scan-stage kernel behind the Gopher rule battery and the linear
  * quality classifier. Emits one struct of exact integer cells:
  *
  *   n_tokens, n_distinct_tokens, sum_char_len, en_sw_hits,
  *   n_bigrams, n_distinct_bigrams
  *
  * Semantics are BIT-IDENTICAL to the interpreted Column formulation
  * (`split(lower(text), "\s+")` + higher-order aggregate/filter +
  * bigram transform + array_distinct), including the split quirks the
  * generated DuckDB oracles replay: limit −1 keeps leading AND
  * trailing empty tokens ("  a b  " → ["", "a", "b", ""], "" → [""],
  * "   " → ["", ""]); token length counts CODE POINTS (Spark
  * `length()`); a bigram is `tokᵢ ++ " " ++ tokᵢ₊₁` over the raw
  * token array, so empty-token artifacts like " a" participate in
  * distinctness exactly as before. Parity is pinned per-cell against
  * the interpreted forms in ScaleSpec, corpus-wide plus edge rows.
  *
  * Why an Expression: the interpreted formulation re-walks the token
  * array through four non-codegen higher-order functions, and
  * `transform`+`array_distinct` allocate an interpreted bigram array
  * per row — measured ~15 s PER QUERY at sf0.1 (q_gopher_rules
  * 14.9 s, q_quality_classifier 14.4 s), the two slowest queries in
  * the entire catalog. One compiled pass with two hash sets does the
  * same work inside whole-stage codegen (same (b)-tier extension
  * rationale and referenced-object call shape as [[LangIdExpr]]).
  */
case class TextStatsExpr(child: Expression, enStopwords: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "text_stats"

  @transient private lazy val ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val swSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    enStopwords.foreach(s.add)
    s
  }

  /** One pass over the lowered token array; all cells exact. */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = ws.split(input.toLowerCase.toString, -1)
    val n = toks.length
    var sumLen = 0L
    var sw = 0L
    val seen = new java.util.HashSet[String]()
    val seenBi = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      val t = toks(i)
      sumLen += t.codePointCount(0, t.length)
      if (swSet.contains(t)) sw += 1
      seen.add(t)
      if (i + 1 < n && n >= 2) seenBi.add(t + " " + toks(i + 1))
      i += 1
    }
    val nBi = if (n >= 2) (n - 1).toLong else 0L
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, seen.size.toLong, sumLen, sw, nBi,
        seenBi.size.toLong))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textStatsExpr", this,
      classOf[TextStatsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("sum_char_len", LongType, nullable = false),
    StructField("en_sw_hits", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))

  /** Column-API entry point. */
  def textStats(c: Column, enStopwords: Seq[String]): Column =
    ColumnBridge.column(
      TextStatsExpr(ColumnBridge.expression(c), enStopwords))
}
