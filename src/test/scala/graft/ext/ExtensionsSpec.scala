package graft.ext

import graft.SparkTestSession
import graft.yelp.Transforms
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val cases = Seq(
    "Food Trucks; Bars",           // multi-match → Restaurants (order)
    "Bars, Nightlife",             // Nightlife
    "Hair Salons",                 // Beauty & Spas
    "Departme",                    // partial keyword → Other
    "Department Stores",           // Shopping
    "xyz",                         // no match → Other
    null.asInstanceOf[String])     // null → Other

  def df = cases.toDF("categories")

  test("native expression matches when-chain and Scala UDF on all cases") {
    val out = df.select(
      Transforms.superCategory($"categories").as("chain"),
      SuperCategoryExpr.superCategory($"categories",
        Transforms.keywordOrder).as("native"),
      GraftExtensions.mapSuperCategoryUdf($"categories").as("udf"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getString(0) === r.getString(2))
    }
  }

  test("interpreted eval matches codegen path") {
    // eval() is exercised via a literal fold on the driver
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = SuperCategoryExpr(Literal("Food Trucks; Bars"),
      Transforms.keywordOrder)
    assert(e.eval(null).asInstanceOf[UTF8String].toString === "Restaurants")
    val nullE = SuperCategoryExpr(Literal(null,
      org.apache.spark.sql.types.StringType), Transforms.keywordOrder)
    assert(nullE.eval(null).asInstanceOf[UTF8String].toString === "Other")
  }

  test("UdfRewriteRule replaces the named UDF with the native expression") {
    GraftExtensions.install(spark)
    // parquet-backed input: a literal LocalRelation would be constant-
    // folded away before we can inspect the rewritten expression
    val plan = graft.Tables.part(spark, SparkTestSession.sf)
      .select(GraftExtensions.mapSuperCategoryUdf($"p_type").as("sc"))
      .queryExecution.optimizedPlan
    val udfs = plan.expressions.flatMap(_.collect { case u: ScalaUDF => u })
    val natives = plan.expressions.flatMap(_.collect {
      case e: SuperCategoryExpr => e })
    assert(udfs.isEmpty, "ScalaUDF survived the rewrite")
    assert(natives.nonEmpty, "native expression not injected")
  }

  test("rewritten plan returns identical results to the un-rewritten UDF") {
    GraftExtensions.install(spark)
    val got = df.select(
      GraftExtensions.mapSuperCategoryUdf($"categories").as("sc"))
      .collect().map(_.getString(0))
    val want = df.select(Transforms.superCategory($"categories").as("sc"))
      .collect().map(_.getString(0))
    assert(got.sameElements(want))
  }

  test("SQL function registration: super_category usable from spark.sql") {
    GraftExtensions.install(spark)
    df.createOrReplaceTempView("cat_cases")
    val out = spark.sql(
      "SELECT super_category(categories) AS sc FROM cat_cases")
      .collect().map(_.getString(0))
    val want = df.select(Transforms.superCategory($"categories"))
      .collect().map(_.getString(0))
    assert(out.sameElements(want))
  }

  test("SQL registration exposes the whole codegen expression library") {
    GraftExtensions.install(spark)
    val row = spark.sql("""
      SELECT dot_product(array(1.0d, 2.0d, 3.0d),
                         array(4.0d, 5.0d, 6.0d)) AS dp,
             zorder(3L, 5L) AS z,
             poly_hash('abc') AS ph""").head()
    assert(row.getDouble(0) === 32.0)
    // interleave(0b011, 0b101): even bits 3, odd bits 5 → 0b100111
    assert(row.getLong(1) === 39L)
    val expected = ("abc".foldLeft(0L)((a, c) =>
      (a * 31 + c) % 2147483647L))
    assert(row.getLong(2) === expected)
  }

  test("native expression stays inside whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val exec = graft.Tables.part(spark, SparkTestSession.sf)
      .select(SuperCategoryExpr.superCategory(col("p_type"),
        graft.ops.ScalarQueries.typeKeywords).as("c"))
      .queryExecution.executedPlan
    val wsc = exec.collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, s"no WholeStageCodegen span in:\n$exec")
    // and the projection actually lives inside the codegen span
    assert(wsc.exists(_.toString.contains("super_category")))
  }
}
