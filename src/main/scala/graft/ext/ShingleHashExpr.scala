package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass 3-token shingle hasher — the scan kernel under
  * EVERY shingle-based operator (MinHash/LSH dedup, n-gram Jaccard,
  * contamination screen, sketch union): tokenize, slide a width-3
  * window, hash each shingle, first-occurrence-dedupe. Emits exactly
  * the values of the interpreted formulation
  * `array_distinct(transform(sequence(1, n−2), i → xxhash64(tᵢ, tᵢ₊₁,
  * tᵢ₊₂)))` over `split(lower(text), "\s+")` — BYTE-IDENTICAL hashes,
  * because the per-shingle value is computed with Spark's own XXH64
  * (seed 42, per-argument chaining, UTF8String bytes), so every
  * downstream signature, band, bucket, and pair is unchanged and the
  * exact-Jaccard oracles keep holding. Parity is pinned corpus-wide
  * against the interpreted model in ScaleSpec.
  *
  * Why an Expression: the interpreted form walks a lambda eval-tree
  * per element and allocates the transform array before
  * array_distinct — measured 6.5 s at sf0.1 for a 260 k-shingle
  * corpus scan (SketchProbe2, round 9), the hidden constant in every
  * dedup query's warm-up. One compiled loop with a LinkedHashSet
  * rides whole-stage codegen in the scan stage (same (b)-tier shape
  * as [[TextStatsExpr]]).
  */
case class ShingleHashExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  @transient private lazy val ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  private def h64(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes, seed)

  /** One pass; Spark-identical xxhash64 chaining; first-occurrence
    * dedup (array_distinct semantics). */
  def compute(input: UTF8String): GenericArrayData = {
    val toks = ws.split(input.toLowerCase.toString, -1)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val u = new Array[UTF8String](n)
    var i = 0
    while (i < n) { u(i) = UTF8String.fromString(toks(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i + 2 < n) {
      var h = 42L
      h = h64(u(i), h)
      h = h64(u(i + 1), h)
      h = h64(u(i + 2), h)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashExpr", this,
      classOf[ShingleHashExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def shingleHashes(c: Column): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(c)))
}
