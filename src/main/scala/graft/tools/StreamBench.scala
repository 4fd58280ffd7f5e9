package graft.tools

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Change, Event}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stateful-streaming throughput micro-bench (VERDICT r13 #7): the
  * stateful runtime (transformWithState debounce, fMGWS CDC apply) is
  * parity-locked but had zero perf visibility — a state-store
  * regression was invisible to the batch-only bench. Feeds N synthetic
  * rows through each processor via MemoryStream in B micro-batches and
  * prints rows/s (wall time over processAllAvailable of all batches,
  * after a small untimed warm-up stream). Recorded per round in
  * BENCHNOTES.
  *
  *   sbt "runMain graft.tools.StreamBench 200000 20"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-streambench")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext

    def run(tag: String, total: Int)(feed: (Int, Int) => Unit): Unit = {
      // rows/s numerator = rows actually fed: total/batches floors, so
      // when batches ∤ total the loop delivers batches*(total/batches)
      // rows, not `total` — using `total` overstated throughput.
      val perBatch = total / batches
      val fed = batches.toLong * perBatch
      val t0 = System.nanoTime()
      var i = 0
      while (i < batches) { feed(i, perBatch); i += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[streambench] $tag: $fed rows / $batches batches " +
        f"in $secs%.2f s = ${fed / secs}%.0f rows/s")
    }

    def events(batch: Int, rows: Int): Seq[Event] =
      (0 until rows).map { j =>
        val id = batch.toLong * rows + j
        Event(id, new java.sql.Timestamp(1700000000000L + id * 1000L),
          id % 997, if (id % 3 == 0) "click" else "view",
          (id % 100).toDouble)
      }
    def changes(batch: Int, rows: Int): Seq[Change] =
      (0 until rows).map { j =>
        val id = batch.toLong * rows + j
        Change(id % 4999, id, if (id % 11 == 0) "D" else "U", id % 10000)
      }

    // ---- debounce (transformWithState) ----
    locally {
      val warm = MemoryStream[Event]
      val wq = EventStreams.debouncedEvents(spark, warm.toDS())
        .writeStream.format("noop").outputMode("append").start()
      warm.addData(events(0, 1000): _*); wq.processAllAvailable(); wq.stop()
      val in = MemoryStream[Event]
      val q = EventStreams.debouncedEvents(spark, in.toDS())
        .writeStream.format("noop").outputMode("append").start()
      try run("debounce_tws", n) { (b, rows) =>
        in.addData(events(b, rows): _*); q.processAllAvailable()
      } finally q.stop()
    }

    // ---- KMV distinct sketch (transformWithState) ----
    locally {
      val warm = MemoryStream[Event]
      val wq = EventStreams.kmvByType(spark, warm.toDS())
        .writeStream.format("noop").outputMode("update").start()
      warm.addData(events(0, 1000): _*); wq.processAllAvailable(); wq.stop()
      val in = MemoryStream[Event]
      val q = EventStreams.kmvByType(spark, in.toDS())
        .writeStream.format("noop").outputMode("update").start()
      try run("kmv_tws", n) { (b, rows) =>
        in.addData(events(b, rows): _*); q.processAllAvailable()
      } finally q.stop()
    }

    // ---- CDC apply (flatMapGroupsWithState) ----
    locally {
      val warm = MemoryStream[Change]
      val wq = EventStreams.cdcApply(spark, warm.toDS())
        .writeStream.format("noop").outputMode("update").start()
      warm.addData(changes(0, 1000): _*); wq.processAllAvailable(); wq.stop()
      val in = MemoryStream[Change]
      val q = EventStreams.cdcApply(spark, in.toDS())
        .writeStream.format("noop").outputMode("update").start()
      try run("cdc_apply_fmgws", n) { (b, rows) =>
        in.addData(changes(b, rows): _*); q.processAllAvailable()
      } finally q.stop()
    }

    spark.stop()
  }
}
