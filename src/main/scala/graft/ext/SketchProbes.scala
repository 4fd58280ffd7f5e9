package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Scan-stage probes for the driver-built sketches in
  * [[graft.scale.Sketches]] (Bloom filter / Count-Min). The sketch is
  * built by a mergeable Aggregator (map-side combine; only the
  * fixed-size table crosses the shuffle), collapsed to ONE bounded row
  * on the driver, and then embedded here as a reference object — the
  * same lifecycle as Spark's own runtime-filter
  * `BloomFilterMightContain`, but with the probe arithmetic inlined
  * into whole-stage codegen so the 100 TB fact scan pays a few shifts
  * and array reads per row, no virtual dispatch, no deserialization.
  *
  * The hash family (`Sketches.mix`, salts 1..depth for CMS and
  * 101..100+k for Bloom) is shared between build and probe: both sides
  * are plain JVM long arithmetic, so interpreted eval, generated code,
  * and the Aggregator agree bit-for-bit.
  */
case class BloomProbeExpr(child: Expression, bits: Array[Long], numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"
  private def mBits: Int = bits.length * 64

  override protected def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Long]
    var j = 0
    while (j < numHashes) {
      val pos = (graft.scale.Sketches.mix(v, 101L + j) & (mBits - 1)).toInt
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val tab = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val j = ctx.freshName("j")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      s"""
        boolean $hit = true;
        for (int $j = 0; $j < $numHashes; $j++) {
          int $pos = (int) (graft.scale.Sketches.mix($x, 101L + $j)
            & (${mBits} - 1));
          if (($tab[$pos >> 6] & (1L << ($pos & 63))) == 0L) {
            $hit = false; break;
          }
        }
        ${ev.value} = $hit;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbeExpr {
  def probe(c: Column, bits: Array[Long], numHashes: Int): Column =
    ColumnBridge.column(
      BloomProbeExpr(ColumnBridge.expression(c), bits, numHashes))
}

/** Count-Min estimate: min over `depth` counter rows at the key's
  * hashed slot — the CONSERVATIVE side of CMS (estimate ≥ true count,
  * always), which is what makes the sketch→exact-confirm heavy-hitter
  * pattern lossless. */
case class CmsProbeExpr(child: Expression, table: Array[Long],
                        depth: Int, width: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Long]
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val slot = (graft.scale.Sketches.mix(v, i + 1L) & (width - 1)).toInt
      val c = table(i * width + slot)
      if (c < est) est = c
      i += 1
    }
    est
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val tab = ctx.addReferenceObj("cmsTable", table, "long[]")
      val i = ctx.freshName("i")
      val slot = ctx.freshName("slot")
      val est = ctx.freshName("est")
      val c = ctx.freshName("c")
      s"""
        long $est = Long.MAX_VALUE;
        for (int $i = 0; $i < $depth; $i++) {
          int $slot = (int) (graft.scale.Sketches.mix($x, $i + 1L)
            & (${width} - 1));
          long $c = $tab[$i * $width + $slot];
          if ($c < $est) $est = $c;
        }
        ${ev.value} = $est;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsProbeExpr {
  def estimate(c: Column, table: Array[Long], depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsProbeExpr(ColumnBridge.expression(c), table, depth, width))
}
