package graft.yelp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's end-to-end master-table pipeline
  * (reference glue_job.py:20-92 / scripts/etl.py:30-178), re-expressed
  * Spark-first:
  *
  *  - renames collapse into aliased selects (one projection node);
  *  - the business side of join #2 is broadcast (114K rows ≪ threshold
  *    — the reference leaves this to chance, SURVEY.md §4.2);
  *  - super_category / sentiment / state are native expression chains
  *    (the reference pays a Python UDF boundary for super_category);
  *  - exact dedup keys on review_id — the natural key — instead of the
  *    reference's all-column dropDuplicates (same result on
  *    well-formed data; also collapses same-key rows that differ in a
  *    non-key column, which all-column dedup would keep —
  *    `dedup=AllColumns` restores bit-parity semantics. Physically:
  *    keyed dedup plans as SortAggregate with first(), all-column as
  *    a pure HashAggregate; both combine map-side before the
  *    shuffle).
  *
  * Output schema is the union of the reference variants' outputs
  * (SURVEY.md §3.5.4): business_id, user_id, name, cool, review_id,
  * funny, stars, useful, city, review_count, fans, b_name, state,
  * super_category, sentiment, only_date, year, month.
  */
object MasterTable {

  sealed trait DedupMode
  case object ByReviewId extends DedupMode
  case object AllColumns extends DedupMode

  /** Columns kept after the 3-way join (reference glue_job.py:39-44).
    * Granularity note (SURVEY.md §2.3): `cool/funny/useful/
    * review_count/name` resolve to the USER table, `stars` to the
    * REVIEW — by design. */
  val keptColumns: Seq[String] = Seq(
    "business_id", "user_id", "name", "cool", "r_date", "review_id",
    "funny", "stars", "useful", "city", "review_count", "fans",
    "b_name", "state", "categories")

  /** `dropNulls` mirrors the scripts/etl.py:58 variant (`na.drop()`);
    * the canonical glue_job.py pipeline has no null-drop, so the
    * default is off — null categories flow to super_category "Other"
    * (reference glue_job.py:64-65). */
  /** `keepText` builds the EXTENDED master with the review text
    * retained — required by the review-length analytics the reference
    * lists as an objective but never computes (README.md:20, dashboard
    * Q10; the reference's projection drops text at glue_job.py:39-44). */
  def build(business: DataFrame, review: DataFrame, user: DataFrame,
      dedup: DedupMode = ByReviewId,
      dropNulls: Boolean = false,
      keepText: Boolean = false): DataFrame = {

    // Disambiguating renames (reference glue_job.py:25-32) — expressed
    // as withColumnRenamed chains; Catalyst collapses them into the
    // join's single projection.
    val b = business
      .withColumnRenamed("name", "b_name")
      .withColumnRenamed("stars", "b_stars")
      .withColumnRenamed("review_count", "b_review_count")
    val r = review
      .withColumnRenamed("cool", "r_cool")
      .withColumnRenamed("date", "r_date")
      .withColumnRenamed("useful", "r_useful")
      .withColumnRenamed("funny", "r_funny")

    // J1: review ⋈ user on user_id (fact ⋈ mid-size → shuffle join);
    // J2: ⋈ business on business_id (small dim → broadcast).
    val kept = if (keepText) keptColumns :+ "text" else keptColumns
    val joined = r
      .join(user, Seq("user_id"), "inner")
      .join(broadcast(b), Seq("business_id"), "inner")
      .select(kept.map(col): _*)

    val deduped = dedup match {
      case ByReviewId => joined.dropDuplicates("review_id")
      case AllColumns => joined.dropDuplicates()
    }
    val cleaned = if (dropNulls) deduped.na.drop() else deduped

    cleaned
      .withColumn("super_category", Transforms.superCategory(col("categories")))
      .withColumn("sentiment", Transforms.sentiment(col("stars")))
      .withColumn("state", Transforms.normalizeState(col("state")))
      .withColumn("only_date", to_date(col("r_date")))
      .withColumn("year", year(col("r_date")))
      .withColumn("month", month(col("r_date")))
      .drop("r_date", "categories")
  }

  /** BI-facing single-file write (reference glue_job.py:88-92). The
    * reference's `coalesce(1)` funnels everything through one task —
    * kept only behind `singleFile=true`; the default is a partitioned
    * parquet layout (`year`) that prunes the dashboard's yearly-trend
    * scans and parallelizes the write. */
  def write(master: DataFrame, path: String,
      singleFile: Boolean = false): Unit = {
    require(path.trim.nonEmpty, "Output path cannot be empty.")
    if (singleFile)
      master.coalesce(1).write.mode("overwrite")
        .option("header", true).csv(path)
    else
      master.write.mode("overwrite").partitionBy("year").parquet(path)
  }
}
