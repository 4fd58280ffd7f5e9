package graft.yelp

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Volume end-to-end: a deterministic 5k-review Yelp-shaped dataset
  * through the full master pipeline + every Analytics query, with
  * expectations computed independently from the generator model (not
  * from Spark). Proves the pipeline a reference user runs daily works
  * beyond hand-picked fixtures.
  */
object YelpVolume {
  import SparkTestSession.spark

  val NumBiz = 200
  val NumUsers = 500
  val NumReviews = 5000

  // deterministic LCG over a fixed seed
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  case class Biz(business_id: String, name: String, city: String,
      state: String, stars: Double, review_count: Long, categories: String)
  case class Rev(review_id: String, user_id: String, business_id: String,
      stars: Double, useful: Long, funny: Long, cool: Long, text: String,
      date: String)
  case class Usr(user_id: String, name: String, review_count: Long,
      useful: Long, funny: Long, cool: Long, fans: Long)

  val cities = Seq("Philadelphia", "Tampa", "Reno", "Boise", "Tucson")
  val states = Seq("PA", "FL", "NV", "ID", "AZ", "QC", "Unknown")
  val cats = Seq("Restaurants, Mexican", "Bars, Nightlife", "Hair Salons",
    "Gyms", "Books, Shopping", "Esoterica", null)

  lazy val bizRows: Seq[Biz] = {
    val r = lcg(7L).map(x => math.abs(x)).grouped(4).take(NumBiz).toSeq
    r.zipWithIndex.map { case (Seq(a, b, c, dd), i) =>
      Biz(f"b$i%04d", s"Biz $i", cities((a % cities.size).toInt),
        states((b % states.size).toInt), 1.0 + (c % 9).toInt * 0.5,
        dd % 500, cats((a % cats.size).toInt))
    }
  }

  lazy val userRows: Seq[Usr] = {
    val r = lcg(11L).map(x => math.abs(x)).grouped(5).take(NumUsers).toSeq
    r.zipWithIndex.map { case (Seq(a, b, c, dd, e), i) =>
      Usr(f"u$i%04d", s"User $i", a % 1000, b % 5000, c % 800, dd % 400,
        e % 50)
    }
  }

  lazy val revRows: Seq[Rev] = {
    val r = lcg(13L).map(x => math.abs(x)).grouped(6).take(NumReviews).toSeq
    r.zipWithIndex.map { case (Seq(a, b, c, dd, e, f), i) =>
      val year = 2015 + (e % 8).toInt
      val month = 1 + (f % 12).toInt
      val day = 1 + (a % 28).toInt
      Rev(f"r$i%05d", f"u${(b % NumUsers).toInt}%04d",
        f"b${(a % NumBiz).toInt}%04d", 1.0 + (c % 5).toInt,
        dd % 20, e % 10, f % 10,
        "text " * (1 + (dd % 40).toInt),
        f"$year%04d-$month%02d-$day%02d ${(b % 24).toInt}%02d:00:00")
    }
  }

  lazy val master: DataFrame = {
    import spark.implicits._
    MasterTable.build(bizRows.toDF(), revRows.toDF(), userRows.toDF())
      .cache()
  }
}

class YelpVolumeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import YelpVolume._

  test("pipeline keeps every unique review (no orphans in this model)") {
    assert(master.count() === NumReviews)
  }

  test("Q1 KPIs match the generator model") {
    val k = Analytics.kpiTotals(master).collect()(0)
    assert(k.getLong(0) === bizRows.map(_.business_id)
      .intersect(revRows.map(_.business_id).distinct).distinct.size)
    assert(k.getLong(1) === NumReviews)
    assert(k.getLong(2) === revRows.map(_.user_id).distinct.size)
  }

  test("Q2 average rating equals the model's mean of review stars") {
    val got = Analytics.avgRating(master).collect()(0).getDouble(0)
    val want = revRows.map(_.stars).sum / NumReviews
    assert(math.abs(got - want) < 1e-4)
  }

  test("Q4 yearly trends partition the review count exactly") {
    val trend = Analytics.yearlyTrends(master).collect()
    assert(trend.map(_.getLong(1)).sum === NumReviews)
    val wantYears = revRows.map(_.date.take(4).toInt).distinct.sorted
    assert(trend.map(_.getInt(0)).sorted.toSeq === wantYears)
  }

  test("Q6 engagement uses USER lifetime counters (granularity rule)") {
    val byCat = Analytics.engagementByCategory(master).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // model: engagement of a review = user's useful+funny+cool
    val userEng = userRows.map(u => u.user_id -> (u.useful + u.funny + u.cool)).toMap
    val bizCat = bizRows.map(b => b.business_id ->
      Transforms.keywordOrder.find(p =>
        Option(b.categories).exists(_.contains(p._1)))
        .map(_._2).getOrElse("Other")).toMap
    val model = revRows.groupBy(r => bizCat(r.business_id))
      .map { case (cat, rs) =>
        cat -> rs.map(r => userEng(r.user_id).toDouble).sum / rs.size }
    model.foreach { case (cat, want) =>
      assert(math.abs(byCat(cat) - want) < 0.01, s"cat=$cat")
    }
  }

  test("Q7 top states rank by distinct business count, desc") {
    val top = Analytics.topStates(master, 5).collect()
    val counts = top.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)))
    // states are normalized: PA → Pennsylvania, Unknown → Mississippi
    val names = Analytics.topStates(master, 100).collect()
      .map(_.getString(0)).toSet
    assert(!names.contains("PA"))
    assert(names.contains("QC")) // pass-through stays
  }

  test("Q9 per-city top-k is bounded and rank-consistent") {
    val t = Analytics.topBusinessesPerCity(master, 3)
    val bad = t.groupBy($"city").agg(max($"rank").as("mx"),
      count(lit(1)).as("n"))
      .filter($"mx" > 3 || $"n" > 3).count()
    assert(bad === 0)
  }

  test("Q3/Q5/Q8 dashboard queries run with sane shapes") {
    val q3 = Analytics.businessesByStars(master).collect()
    assert(q3.map(_.getLong(1)).sum >= q3.length) // ≥1 biz per bucket
    val q5 = Analytics.dayWiseByCategory(master)
    assert(q5.select($"dow").distinct().count() === 7)
    val q8 = Analytics.mostActive(master).collect()
    assert(q8.map(_.getString(0)).toSet === Set("city", "super_category", "dow"))
  }

  test("Q10 review-length analytics over the extended (keepText) master") {
    val extended = MasterTable.build(bizRows.toDF(), revRows.toDF(),
      userRows.toDF(), keepText = true)
    assert(extended.columns.contains("text"))
    val q10 = Analytics.reviewLengthByMonth(extended)
    val rows = q10.collect()
    assert(rows.map(_.getLong(4)).sum === NumReviews)
    // generator model: text = "text " * (1 + dd%40) → avg length sane
    rows.foreach { r =>
      assert(r.getDouble(2) >= 5.0 && r.getDouble(2) <= 205.0)
    }
  }

  test("sentiment partitions all reviews across the three labels") {
    val bySent = master.groupBy($"sentiment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySent.values.sum === NumReviews)
    val wantNeg = revRows.count(_.stars <= 2)
    val wantNeu = revRows.count(_.stars == 3.0)
    assert(bySent("negative") === wantNeg)
    assert(bySent("neutral") === wantNeu)
    assert(bySent("positive") === NumReviews - wantNeg - wantNeu)
  }

  test("business dimension still broadcasts at volume") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    // dropNulls variant: distinct logical plan, so the cached master's
    // InMemoryRelation is not substituted and the join plan is visible
    val m = MasterTable.build(bizRows.toDF(), revRows.toDF(),
      userRows.toDF(), dropNulls = true)
    val p = m.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    assert(p.collect { case b: BroadcastExchangeLike => b }.nonEmpty,
      s"plan:\n${p.toString.take(4000)}")
  }
}
