package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst implementation of the reference's first-match
  * keyword→category mapping (reference glue_job.py:50-73, a Python UDF
  * there — an opaque BatchEvalPython barrier; SURVEY.md §4.3).
  *
  * Semantics: iterate (keyword, category) pairs in order, return the
  * category of the FIRST keyword contained in the input; null or
  * no-match → fallback. Never null-producing.
  *
  * This is the (b)-tier extension point from the design rules: a
  * scalar `UnaryExpression` with `doGenCode`, so it fuses into
  * whole-stage codegen like any built-in — no UDF serialization, no
  * codegen fallback. Functionally identical to the when-chain form
  * (Transforms.superCategory); the spec asserts parity.
  */
case class SuperCategoryExpr(
    child: Expression,
    keywords: Seq[(String, String)],
    fallback: String = "Other")
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "super_category"

  @transient private lazy val kwArray: Array[UTF8String] =
    keywords.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val catArray: Array[UTF8String] =
    keywords.map(p => UTF8String.fromString(p._2)).toArray
  @transient private lazy val fallbackU8: UTF8String =
    UTF8String.fromString(fallback)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return fallbackU8
    val s = v.asInstanceOf[UTF8String]
    var i = 0
    while (i < kwArray.length) {
      if (s.contains(kwArray(i))) return catArray(i)
      i += 1
    }
    fallbackU8
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val kws = ctx.addReferenceObj("kws", kwArray, "org.apache.spark.unsafe.types.UTF8String[]")
    val cats = ctx.addReferenceObj("cats", catArray, "org.apache.spark.unsafe.types.UTF8String[]")
    val fb = ctx.addReferenceObj("fallback", fallbackU8, "org.apache.spark.unsafe.types.UTF8String")
    val i = ctx.freshName("i")
    val result = ev.value
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String $result = $fb;
        if (!${childGen.isNull}) {
          for (int $i = 0; $i < ${kwArray.length}; $i++) {
            if (${childGen.value}.contains($kws[$i])) {
              $result = $cats[$i];
              break;
            }
          }
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SuperCategoryExpr =
    copy(child = newChild)
}

object SuperCategoryExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 classic Column↔Expression bridge). */
  def superCategory(c: Column, keywords: Seq[(String, String)],
      fallback: String = "Other"): Column =
    ColumnBridge.column(
      SuperCategoryExpr(ColumnBridge.expression(c), keywords, fallback))
}
