package graft.yelp

import org.apache.spark.sql.types._

/** Pinned schemas for the Yelp Open Dataset tables.
  *
  * The reference relies on `spark.read.json` inference
  * (reference scripts/etl.py:21-23) which costs an extra full pass over
  * the data and breaks silently on drift; at 100 TB we pin the
  * `StructType`s so every scan is single-pass and the contract is
  * explicit (SURVEY.md §1.2). Field lists mirror the public Yelp
  * dataset schema the reference reads (FIXTURES.md §B).
  */
object Schemas {

  /** business.json — including the nested attributes/hours structs the
    * reference's projection prunes (they must survive the scan). */
  val business: StructType = StructType(Seq(
    StructField("business_id", StringType),
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postal_code", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("stars", DoubleType),
    StructField("review_count", LongType),
    StructField("is_open", LongType),
    StructField("attributes", StructType(Seq(
      StructField("WiFi", StringType),
      StructField("BusinessParking", StringType),
      StructField("OutdoorSeating", StringType)))),
    StructField("categories", StringType),
    StructField("hours", StructType(
      Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday").map(d => StructField(d, StringType))))))

  /** review.json */
  val review: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("user_id", StringType),
    StructField("business_id", StringType),
    StructField("stars", DoubleType),
    StructField("useful", LongType),
    StructField("funny", LongType),
    StructField("cool", LongType),
    StructField("text", StringType),
    StructField("date", StringType)))

  /** user.json — the slice the master table consumes. */
  val user: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("name", StringType),
    StructField("review_count", LongType),
    StructField("yelping_since", StringType),
    StructField("useful", LongType),
    StructField("funny", LongType),
    StructField("cool", LongType),
    StructField("fans", LongType),
    StructField("average_stars", DoubleType)))
}
