package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-based streaming source over the events table: the production
  * ingestion shape (readStream on a directory of parquet/json drops),
  * validated against the identical batch aggregation.
  */
class FileSourceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("readStream over a parquet directory matches the batch result") {
    // stage the events table as a streaming-source directory
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "stream_src")
    val batchEvents = Tables.events(spark, sf)
    batchEvents.write.mode("overwrite").parquet(s"$dir/events")

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(s"$dir/events")
    val agg = EventStreams.tumblingCounts(stream, width = "1 day")
    val q = agg.writeStream.format("memory").queryName("file_src_t")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("file_src_t")
      .agg(sum($"cnt")).collect()(0).getLong(0)
    assert(streamed === batchEvents.count())

    val batchAgg = EventStreams.tumblingCounts(batchEvents, width = "1 day")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val streamAgg = spark.table("file_src_t")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamAgg === batchAgg)
  }

  test("catalog API: temp views are listable and SQL-addressable") {
    Tables.nation(spark, sf).createOrReplaceTempView("nation_v")
    assert(spark.catalog.tableExists("nation_v"))
    assert(spark.catalog.listTables().collect()
      .exists(_.name == "nation_v"))
    assert(spark.sql("SELECT count(*) AS c FROM nation_v")
      .collect()(0).getLong(0) === 25L)
    spark.catalog.dropTempView("nation_v")
    assert(!spark.catalog.tableExists("nation_v"))
  }
}
