package graft.yelp

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Yelp-shaped fixture (FIXTURES.md §B) exercising every edge case the
  * reference pipeline defines: null categories, insertion-order
  * multi-match, star boundaries, exact duplicates, null rows,
  * mapped/unmapped/Unknown states.
  */
object YelpFixture {
  import SparkTestSession.spark

  def business: DataFrame = {
    import SparkTestSession.spark.implicits._
    Seq(
      // id, name, city, state, stars, review_count, categories
      ("b1", "Taco Haven", "Philadelphia", "PA", 4.5, 120L,
        "Food Trucks; Bars"), // multi-match → Restaurants (Food first)
      ("b2", "Nail Palace", "Tampa", "FL", 3.0, 40L,
        "Nail Salons, Beauty"),
      ("b3", "Mystery Biz", "Reno", "NV", 2.0, 10L,
        null.asInstanceOf[String]), // null → Other
      ("b4", "Quantum Gym", "Boise", "ID", 4.0, 55L,
        "Gyms, Fitness & Instruction"),
      ("b5", "Oddity Shop", "Montreal", "QC", 3.5, 9L,
        "Esoterica"), // no keyword → Other; QC unmapped → pass-through
      ("b6", "Lost Diner", "Jackson", "Unknown", 1.0, 3L,
        "Restaurants")) // Unknown → Mississippi quirk
      .toDF("business_id", "name", "city", "state", "stars",
        "review_count", "categories")
  }

  def reviews: DataFrame = {
    import SparkTestSession.spark.implicits._
    Seq(
      // review_id, user_id, business_id, stars, useful, funny, cool, text, date
      ("r1", "u1", "b1", 5.0, 1L, 0L, 0L, "amazing tacos", "2019-07-14 10:00:00"),
      ("r1", "u1", "b1", 5.0, 1L, 0L, 0L, "amazing tacos", "2019-07-14 10:00:00"), // exact dup
      ("r2", "u1", "b2", 2.0, 0L, 0L, 0L, "meh polish", "2020-01-02 09:30:00"), // boundary negative
      ("r3", "u2", "b3", 3.0, 2L, 1L, 0L, "its fine", "2018-11-11 20:15:00"), // boundary neutral
      ("r4", "u2", "b4", 4.0, 0L, 0L, 1L, "solid gym", "2021-03-08 07:45:00"), // positive
      ("r5", "u3", "b5", 1.0, 0L, 0L, 0L, "weird stuff", "2017-05-21 13:10:00"),
      ("r6", "u3", "b6", 5.0, 3L, 2L, 1L, "hidden gem", "2022-12-25 18:00:00"),
      ("r7", "u9", "b1", 4.0, 0L, 0L, 0L, "orphan user", "2019-08-01 11:00:00"), // u9 missing → dropped by inner join
      ("r8", null, "b1", 4.0, 0L, 0L, 0L, "null user", "2019-08-02 11:00:00")) // null key → dropped
      .toDF("review_id", "user_id", "business_id", "stars", "useful",
        "funny", "cool", "text", "date")
  }

  def users: DataFrame = {
    import SparkTestSession.spark.implicits._
    Seq(
      // user_id, name, review_count, useful, funny, cool, fans
      ("u1", "Ana", 250L, 900L, 300L, 150L, 12L),
      ("u2", "Bo", 40L, 50L, 10L, 5L, 2L),
      ("u3", "Cy", 7L, 3L, 0L, 1L, 0L))
      .toDF("user_id", "name", "review_count", "useful", "funny",
        "cool", "fans")
  }
}

class YelpPipelineSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  lazy val master: DataFrame = MasterTable.build(
    YelpFixture.business, YelpFixture.reviews, YelpFixture.users)

  test("master schema matches the golden union schema") {
    assert(master.columns.toSeq === Seq(
      "business_id", "user_id", "name", "cool", "review_id", "funny",
      "stars", "useful", "city", "review_count", "fans", "b_name",
      "state", "super_category", "sentiment", "only_date", "year",
      "month"))
  }

  test("inner joins drop orphan/null user keys; dedup drops exact dup") {
    // r1 dup collapses; r7 (u9) and r8 (null) drop → 6 rows
    assert(master.count() === 6)
  }

  test("user-granularity columns resolve to the user table") {
    val r1 = master.filter($"review_id" === "r1").collect()(0)
    assert(r1.getAs[String]("name") === "Ana") // user's name, not business
    assert(r1.getAs[Long]("useful") === 900L)  // lifetime, not per-review
    assert(r1.getAs[Double]("stars") === 5.0)  // review stars, not b_stars
    assert(r1.getAs[Long]("review_count") === 250L)
  }

  test("super-category first-match order: Food Trucks; Bars → Restaurants") {
    val byBiz = master.select($"business_id", $"super_category").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byBiz("b1") === "Restaurants")
    assert(byBiz("b2") === "Beauty & Spas")
    assert(byBiz("b3") === "Other")
    assert(byBiz("b4") === "Fitness")
    assert(byBiz("b5") === "Other")
  }

  test("sentiment boundaries: 2.0 negative, 3.0 neutral, 4.0 positive") {
    val m = master.select($"review_id", $"sentiment").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("r2") === "negative")
    assert(m("r3") === "neutral")
    assert(m("r4") === "positive")
  }

  test("state normalization: mapped, pass-through, Unknown quirk") {
    val m = master.select($"business_id", $"state").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("b1") === "Pennsylvania")
    assert(m("b5") === "QC") // unmapped passes through
    assert(m("b6") === "Mississippi") // the reference's Unknown quirk
  }

  test("date derivations: year/month/only_date from review date") {
    val r6 = master.filter($"review_id" === "r6").collect()(0)
    assert(r6.getAs[Int]("year") === 2022)
    assert(r6.getAs[Int]("month") === 12)
    assert(r6.getAs[java.sql.Date]("only_date").toString === "2022-12-25")
  }

  test("analytics Q1 KPIs count distinct entities") {
    val k = Analytics.kpiTotals(master).collect()(0)
    assert(k.getLong(0) === 6) // businesses
    assert(k.getLong(1) === 6) // reviews
    assert(k.getLong(2) === 3) // users
  }

  test("analytics Q7 top states ranks by distinct businesses") {
    val top = Analytics.topStates(master, 3).collect()
    assert(top.length === 3)
    assert(top.map(_.getLong(1)).sameElements(
      top.map(_.getLong(1)).sorted(Ordering[Long].reverse)))
  }

  test("analytics Q9 per-city rank is dense and bounded") {
    val t = Analytics.topBusinessesPerCity(master, 2)
    assert(t.groupBy($"city").agg(max($"rank").as("mx"))
      .filter($"mx" > 2).count() === 0)
  }

  test("dedup AllColumns matches reference bit-parity mode") {
    val all = MasterTable.build(YelpFixture.business, YelpFixture.reviews,
      YelpFixture.users, dedup = MasterTable.AllColumns)
    assert(all.count() === 6)
  }

  test("dropNulls variant (scripts/etl.py:58) drops the null-categories row") {
    val dropped = MasterTable.build(YelpFixture.business,
      YelpFixture.reviews, YelpFixture.users, dropNulls = true)
    assert(dropped.count() === 5)
    assert(dropped.filter($"business_id" === "b3").count() === 0)
  }

  test("MasterTable.build runs UNCHANGED as a streaming query (stream-static joins + stateful dedup)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reviews = MemoryStream[YelpVolume.Rev]
    // same build call as batch — reviews side is a stream, dims static
    val m = MasterTable.build(
      YelpVolume.bizRows.toDF(), reviews.toDF(), YelpVolume.userRows.toDF())
    val q = m.writeStream.format("memory").queryName("stream_master")
      .outputMode("append").start()
    try {
      val batch1 = YelpVolume.revRows.take(50)
      reviews.addData(batch1: _*)
      q.processAllAvailable()
      assert(spark.table("stream_master").count() === 50)
      // second micro-batch: 25 new reviews + 10 replays of batch 1 —
      // the pipeline's dropDuplicates("review_id") is STATEFUL across
      // batches, so replays must not re-emit
      val batch2 = YelpVolume.revRows.slice(50, 75) ++ batch1.take(10)
      reviews.addData(batch2: _*)
      q.processAllAvailable()
      assert(spark.table("stream_master").count() === 75)
      // derived columns flow through the streaming plan identically
      val cats = spark.table("stream_master")
        .select($"super_category").distinct().collect().map(_.getString(0))
      assert(cats.nonEmpty && cats.forall(c => c != null))
    } finally q.stop()
  }

  test("partitioned write produces year= directories; coalesce(1) single CSV") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "yelp_out")
    MasterTable.write(master, s"$dir/parq")
    val years = new java.io.File(s"$dir/parq").listFiles()
      .map(_.getName).filter(_.startsWith("year="))
    assert(years.nonEmpty)
    MasterTable.write(master, s"$dir/csv", singleFile = true)
    val csvs = new java.io.File(s"$dir/csv").listFiles()
      .map(_.getName).filter(_.endsWith(".csv"))
    assert(csvs.length === 1)
  }
}
