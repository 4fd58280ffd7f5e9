package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass per-document REPETITION statistics — the
  * Gopher/C4 repetition-signal family ([[TextStatsExpr]]'s sibling):
  * where that kernel counts distinct tokens/bigrams, this one also
  * needs the MODE frequency (the count of the most-repeated token and
  * bigram), which a hash-SET cannot produce — so it carries two small
  * hash-MAPS and emits one struct of exact integer cells:
  *
  *   n_tokens, n_distinct_tokens, max_tok_cnt,
  *   n_bigrams, n_distinct_bigrams, max_bi_cnt
  *
  * Token semantics are identical to [[TextStatsExpr]] (split limit −1
  * empty-token quirks, bigram = `tokᵢ ++ " " ++ tokᵢ₊₁` over the raw
  * array) so the DuckDB oracle replays it with the same
  * `string_split_regex` + list-comprehension shapes as the Gopher
  * oracle. Kept separate from TextStatsExpr so the (hot, already
  * tuned) quality/Gopher queries don't pay for per-token map upkeep
  * they don't read.
  *
  * Why an Expression: computing a per-doc mode via
  * explode → groupBy(doc, tok) → max would shuffle the full token
  * stream TWICE per n-gram order (the corpus, not the docs, becomes
  * the shuffle volume); the interpreted higher-order alternative
  * (transform over distinct × filter count) is the O(n·distinct)
  * eval-tree walk the round-9 straggler hunt measured at 14+ s. One
  * compiled pass rides whole-stage codegen in the scan stage — per-doc
  * state only, embarrassingly parallel at any corpus size.
  */
case class RepetitionStatsExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_stats"

  @transient private lazy val ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** One pass; two count maps; all cells exact. */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = ws.split(input.toLowerCase.toString, -1)
    val n = toks.length
    val tokCnt = new java.util.HashMap[String, Long]()
    val biCnt = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      tokCnt.merge(toks(i), 1L, (a, b) => a + b)
      if (i + 1 < n) biCnt.merge(toks(i) + " " + toks(i + 1), 1L,
        (a, b) => a + b)
      i += 1
    }
    var maxTok = 0L
    val it = tokCnt.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > maxTok) maxTok = v }
    var maxBi = 0L
    val it2 = biCnt.values().iterator()
    while (it2.hasNext) { val v = it2.next(); if (v > maxBi) maxBi = v }
    val nBi = if (n >= 2) (n - 1).toLong else 0L
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, tokCnt.size.toLong, maxTok, nBi,
        biCnt.size.toLong, maxBi))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("repetitionStatsExpr", this,
      classOf[RepetitionStatsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("max_tok_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("max_bi_cnt", LongType, nullable = false)))

  /** Column-API entry point. */
  def repetitionStats(c: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(c)))
}
