package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst language-ID: argmax over per-language stopword hit
  * counts with first-declared-wins tie-break, `"und"` when nothing
  * hits — bit-identical to the interpreted Column formulation
  * (`TextOps.langIdInterpreted`: split + 5 higher-order `filter`s +
  * a `reduceLeft` struct chain) but ONE fused pass instead of five
  * interpreted array traversals per row.
  *
  * Why this is an Expression and not a faster Column tree: Spark's
  * higher-order functions (`filter`, `aggregate`) don't participate in
  * whole-stage codegen — each lambda invocation walks an interpreted
  * eval tree per element, and the five per-language filters re-walk
  * the token array five times. Measured at sf0.1 the interpreted form
  * put q_lang_confusion at 3.8 s — slower than PageRank. Same
  * (b)-tier extension rationale as [[SuperCategoryExpr]] /
  * [[PolyHashExpr]]: a scalar `UnaryExpression` fuses into the scan
  * stage's codegen; the hot loop lives in this compiled class and the
  * generated code makes one null-safe call per row.
  *
  * Tokenization parity with `split(lower(text), "\\s+")`: lowercase
  * via `UTF8String.toLowerCase` (the exact routine behind Spark's
  * `lower()`), then split on Java-regex `\s` = the six ASCII
  * whitespace bytes — safe to detect byte-wise because UTF-8
  * continuation/multibyte bytes are ≥ 0x80. Leading/trailing empty
  * split tokens can never equal a stopword, so skipping them is
  * hit-count-neutral. A stopword listed under several languages (the
  * es/fr shared articles) increments EVERY owning language, exactly
  * like the per-language `isInCollection` filters.
  */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lang_id"

  @transient private lazy val langU8: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray
  // flat (stopword bytes, owning language) pairs — duplicates kept so
  // shared words credit every owner
  @transient private lazy val flat: Array[(Array[Byte], Int)] =
    langs.zipWithIndex.flatMap { case ((_, ws), i) =>
      ws.map(w => (UTF8String.fromString(w).getBytes, i))
    }.toArray
  @transient private lazy val undU8 = UTF8String.fromString("und")

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c ||
      b == 0x0d

  /** One pass: tokenize the lowercased bytes, count stopword hits per
    * language, return the first language holding the strict maximum. */
  def detect(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val counts = new Array[Int](langU8.length)
    val n = b.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      var j = i
      while (j < n && !isWs(b(j))) j += 1
      if (j > i) {
        val len = j - i
        var w = 0
        while (w < flat.length) {
          val wb = flat(w)._1
          if (wb.length == len) {
            var k = 0
            while (k < len && b(i + k) == wb(k)) k += 1
            if (k == len) counts(flat(w)._2) += 1
          }
          w += 1
        }
      }
      i = j
    }
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bestHits) { bestHits = counts(l); best = l }
      l += 1
    }
    if (best < 0) undU8 else langU8(best)
  }

  override def nullSafeEval(input: Any): Any =
    detect(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("langIdExpr", this, classOf[LangIdExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.detect($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def langId(c: Column, langs: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c), langs))
}
