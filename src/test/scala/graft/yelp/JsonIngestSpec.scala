package graft.yelp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's real ingestion shape: JSON-lines on disk → pinned-
  * schema scan → master pipeline (S1, SURVEY.md §2.1). Validates the
  * Schemas StructTypes against actual JSON parsing — nested
  * attributes/hours structs survive the scan and are pruned by the
  * projection, exactly like the Yelp dumps.
  */
class JsonIngestSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val dir = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "yelp_json")

  private def writeLines(name: String, lines: Seq[String]): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
    p.toString
  }

  lazy val bizPath: String = writeLines("business.json", Seq(
    """{"business_id":"b1","name":"Taco Haven","address":"1 Main St","city":"Philadelphia","state":"PA","postal_code":"19101","latitude":39.95,"longitude":-75.16,"stars":4.5,"review_count":120,"is_open":1,"attributes":{"WiFi":"free","BusinessParking":"{}","OutdoorSeating":"True"},"categories":"Food Trucks; Bars","hours":{"Monday":"9:0-17:0","Tuesday":"9:0-17:0","Wednesday":"9:0-17:0","Thursday":"9:0-17:0","Friday":"9:0-17:0","Saturday":"10:0-14:0","Sunday":null}}""",
    """{"business_id":"b2","name":"Null Biz","city":"Reno","state":"NV","stars":2.0,"review_count":3,"categories":null}"""))

  lazy val revPath: String = writeLines("review.json", Seq(
    """{"review_id":"r1","user_id":"u1","business_id":"b1","stars":5.0,"useful":1,"funny":0,"cool":0,"text":"great","date":"2019-07-14 10:00:00"}""",
    """{"review_id":"r2","user_id":"u1","business_id":"b2","stars":2.0,"useful":0,"funny":0,"cool":0,"text":"meh","date":"2020-01-02 09:30:00"}"""))

  lazy val usrPath: String = writeLines("user.json", Seq(
    """{"user_id":"u1","name":"Ana","review_count":250,"yelping_since":"2010-01-01","useful":900,"funny":300,"cool":150,"fans":12,"average_stars":3.9}"""))

  test("pinned schemas parse real JSON incl. nested structs") {
    val b = spark.read.schema(Schemas.business).json(bizPath)
    assert(b.count() === 2)
    val r1 = b.filter($"business_id" === "b1").collect()(0)
    assert(r1.getAs[org.apache.spark.sql.Row]("attributes")
      .getAs[String]("WiFi") === "free")
    assert(r1.getAs[org.apache.spark.sql.Row]("hours")
      .getAs[String]("Monday") === "9:0-17:0")
    // missing fields in sparse rows come back null, not errors
    val r2 = b.filter($"business_id" === "b2").collect()(0)
    assert(r2.getAs[org.apache.spark.sql.Row]("attributes") === null)
  }

  test("JSON-sourced master pipeline end-to-end") {
    val master = MasterTable.build(
      spark.read.schema(Schemas.business).json(bizPath),
      spark.read.schema(Schemas.review).json(revPath),
      spark.read.schema(Schemas.user).json(usrPath))
    val rows = master.collect()
    assert(rows.length === 2)
    val byId = rows.map(r => r.getAs[String]("review_id") -> r).toMap
    assert(byId("r1").getAs[String]("super_category") === "Restaurants")
    assert(byId("r2").getAs[String]("super_category") === "Other")
    assert(byId("r1").getAs[String]("state") === "Pennsylvania")
    assert(byId("r1").getAs[Long]("useful") === 900L) // user granularity
    assert(byId("r2").getAs[String]("sentiment") === "negative")
    assert(byId("r1").getAs[Int]("year") === 2019)
  }

  test("corrupt JSON lines: PERMISSIVE quarantines, DROPMALFORMED skips, FAILFAST raises") {
    // real dumps contain the occasional truncated line — ingestion
    // must be able to quarantine rather than kill a 100 TB batch
    val p = writeLines("corrupt.json", Seq(
      """{"user_id":"u1","name":"Ok","review_count":1,"useful":0,"funny":0,"cool":0,"fans":0}""",
      """{"user_id":"u2","name":"Trunc""",
      """not json at all"""))
    import org.apache.spark.sql.types._
    val withCorrupt = StructType(Schemas.user.fields :+
      StructField("_corrupt_record", StringType))
    val permissive = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(p).cache()
    assert(permissive.count() === 3)
    assert(permissive.filter($"_corrupt_record".isNotNull).count() === 2)
    assert(permissive.filter($"user_id" === "u1")
      .select($"_corrupt_record").collect()(0).isNullAt(0))
    permissive.unpersist()
    val dropped = spark.read.schema(Schemas.user)
      .option("mode", "DROPMALFORMED").json(p)
    assert(dropped.count() === 1)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.schema(Schemas.user)
        .option("mode", "FAILFAST").json(p).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("schema-on-read tolerates extra unknown JSON fields") {
    val p = writeLines("extra.json", Seq(
      """{"user_id":"u9","name":"Zed","review_count":1,"useful":0,"funny":0,"cool":0,"fans":0,"brand_new_field":{"x":1}}"""))
    val u = spark.read.schema(Schemas.user).json(p)
    assert(u.count() === 1)
    assert(u.collect()(0).getAs[String]("name") === "Zed")
  }
}
