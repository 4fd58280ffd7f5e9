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

  test("checkpointed file sink is exactly-once across query restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ckpt")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.range(0, 10).write.mode("append").parquet(in)
    runOnce()
    assert(spark.read.parquet(out).count() === 10)
    // second input drop + RESTART from the same checkpoint: the first
    // file must not be reprocessed — exactly 20 distinct ids, no dups
    spark.range(10, 20).write.mode("append").parquet(in)
    runOnce()
    val ids = spark.read.parquet(out).select($"id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.length === 20, s"duplicates or loss: ${ids.length} rows")
    assert(ids.toSeq === (0L until 20L))
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
