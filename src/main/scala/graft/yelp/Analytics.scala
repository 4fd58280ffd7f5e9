package graft.yelp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dashboard query set (SURVEY.md §2.11) — the analytics the
  * reference delegates to Athena/Power BI, implemented natively over
  * the master table. Each takes the master DataFrame (MasterTable.build
  * output, with `text` optionally retained for reviewLength).
  */
object Analytics {

  /** Q1 KPI row: total businesses / reviews / users. */
  def kpiTotals(m: DataFrame): DataFrame =
    m.agg(
      countDistinct(col("business_id")).as("n_businesses"),
      count(col("review_id")).as("n_reviews"),
      countDistinct(col("user_id")).as("n_users"))

  /** Q2 global average rating. */
  def avgRating(m: DataFrame): DataFrame =
    m.agg(round(avg(col("stars")), 4).as("avg_rating"))

  /** Q3 businesses by star rating. */
  def businessesByStars(m: DataFrame): DataFrame =
    m.groupBy(col("stars"))
      .agg(countDistinct(col("business_id")).as("n_businesses"))

  /** Q4 yearly trends: reviews vs active businesses. */
  def yearlyTrends(m: DataFrame): DataFrame =
    m.groupBy(col("year"))
      .agg(count(col("review_id")).as("n_reviews"),
        countDistinct(col("business_id")).as("n_businesses"))

  /** Q5 day-of-week × super-category review counts. */
  def dayWiseByCategory(m: DataFrame): DataFrame =
    m.groupBy(date_format(col("only_date"), "EEEE").as("dow"),
        col("super_category"))
      .agg(count(lit(1)).as("n_reviews"))

  /** Q6 engagement score (user useful+funny+cool) by super-category. */
  def engagementByCategory(m: DataFrame): DataFrame =
    m.groupBy(col("super_category"))
      .agg(round(avg(col("useful") + col("funny") + col("cool")), 2)
        .as("engagement"))

  /** Q7 top states by business count. */
  def topStates(m: DataFrame, k: Int = 10): DataFrame =
    m.groupBy(col("state"))
      .agg(countDistinct(col("business_id")).as("n_businesses"))
      .orderBy(col("n_businesses").desc, col("state").asc)
      .limit(k)

  /** Q8 most active day / city / category — single-row argmax via
    * top-1 sorts (TakeOrderedAndProject, no full materialization). */
  def mostActive(m: DataFrame): DataFrame = {
    def top(c: String) = m.groupBy(col(c).as("val"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("val").asc).limit(1)
      .select(lit(c).as("dimension"), col("val"), col("cnt"))
    top("city")
      .unionByName(top("super_category"))
      .unionByName(m.withColumn("dow", date_format(col("only_date"), "EEEE"))
        .groupBy(col("dow").as("val")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("val").asc).limit(1)
        .select(lit("dow").as("dimension"), col("val"), col("cnt")))
  }

  /** Q9 top businesses per city by avg rating then review volume —
    * per-group top-k via window rank. */
  def topBusinessesPerCity(m: DataFrame, k: Int = 3): DataFrame = {
    val byBiz = m.groupBy(col("city"), col("business_id"), col("b_name"))
      .agg(round(avg(col("stars")), 4).as("avg_stars"),
        count(lit(1)).as("n_reviews"))
    val w = Window.partitionBy(col("city"))
      .orderBy(col("avg_stars").desc, col("n_reviews").desc,
        col("business_id").asc)
    byBiz.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("city"), col("b_name"), col("avg_stars"),
        col("n_reviews"), col("rank").cast("long").as("rank"))
  }

  /** Q10 review length stats by month (requires `text` retained in the
    * extended master — the reference drops it, README.md:20 wants it). */
  def reviewLengthByMonth(m: DataFrame): DataFrame =
    m.groupBy(col("year"), col("month"))
      .agg(round(avg(length(col("text"))), 2).as("avg_len"),
        max(length(col("text"))).cast("long").as("max_len"),
        count(lit(1)).as("n_reviews"))
}
