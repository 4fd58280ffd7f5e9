package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Drives each streaming transform with a MemoryStream through a
  * memory sink — golden-sequence tests incl. late-data semantics
  * (SURVEY.md §5.2.5: these can't be DuckDB-oracled; MemoryStream
  * sequences are the spec instead).
  */
class EventStreamsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import EventStreams._

  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long, typ: String,
      value: Double = 1.0) = Event(id, ts(minute), user, typ, value)

  private def runToCompletion(out: DataFrame, name: String,
      mode: String): Unit = {
    val q: StreamingQuery = out.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("tumbling window counts by event type (complete mode)") {
    val in = MemoryStream[Event]
    in.addData(ev(1, 10, 1, "click"), ev(2, 20, 1, "click"),
      ev(3, 70, 2, "view"))
    runToCompletion(tumblingCounts(in.toDF()), "tumbling_t", "complete")
    val got = spark.table("tumbling_t")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2))).toSet
    assert(got === Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "view", 1L)))
  }

  test("stream-static join enriches events with a broadcast dimension") {
    val in = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    in.addData(ev(1, 5, 1, "click"), ev(2, 6, 2, "view"),
      ev(3, 7, 99, "click"))
    runToCompletion(enrichedEvents(in.toDF(), dim), "enriched_t", "append")
    val got = spark.table("enriched_t")
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[String]("segment"))).toSet
    // matched users get their segment; unknown users survive the left
    // join with the sentinel instead of being dropped
    assert(got === Set((1L, "gold"), (2L, "silver"), (3L, "unknown")))
  }

  test("append mode emits a window only after the watermark passes it") {
    val in = MemoryStream[Event]
    val out = tumblingCounts(in.toDF(), width = "10 minutes",
      lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumbling_wm")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 2, 1, "click"))
      q.processAllAvailable()
      // watermark = max(ts)-5min = still inside window [0,10) → nothing
      assert(spark.table("tumbling_wm").count() === 0)
      in.addData(ev(2, 40, 1, "click")) // watermark → 35min, closes [0,10)
      q.processAllAvailable()
      val rows = spark.table("tumbling_wm").collect()
      assert(rows.length === 1 && rows(0).getLong(2) === 1L)
    } finally q.stop()
  }

  test("late event beyond watermark is dropped") {
    val in = MemoryStream[Event]
    val out = tumblingCounts(in.toDF(), width = "10 minutes",
      lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 2, 1, "click"))
      q.processAllAvailable()
      in.addData(ev(2, 60, 1, "view")) // watermark → 55
      q.processAllAvailable()
      in.addData(ev(3, 3, 1, "click")) // 52 min late → dropped
      q.processAllAvailable()
      in.addData(ev(4, 120, 1, "view")) // close everything
      q.processAllAvailable()
      val clickCnt = spark.table("late_drop")
        .filter($"event_type" === "click").collect().map(_.getLong(2)).sum
      assert(clickCnt === 1L, "late click should have been discarded")
    } finally q.stop()
  }

  test("session windows split on gap") {
    val in = MemoryStream[Event]
    in.addData(
      ev(1, 0, 7, "click"), ev(2, 5, 7, "click"),  // session 1
      ev(3, 30, 7, "click"))                        // gap > 10min → session 2
    runToCompletion(userSessions(in.toDF(), gap = "10 minutes"),
      "sessions_t", "complete")
    val got = spark.table("sessions_t").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toList.sorted
    assert(got === List((7L, 1L), (7L, 2L)))
  }

  test("streaming dedup keeps first occurrence per event_id") {
    val in = MemoryStream[Event]
    in.addData(ev(1, 0, 1, "click", 5.0), ev(1, 1, 1, "click", 5.0),
      ev(2, 2, 1, "view", 3.0))
    runToCompletion(dedupedEvents(in.toDF()), "dedup_t", "append")
    assert(spark.table("dedup_t").count() === 2)
  }

  test("flatMapGroupsWithState accumulates per-user running totals") {
    val in = MemoryStream[Event]
    val q = runningUserStats(spark, in.toDS()).writeStream
      .format("memory").queryName("running_t").outputMode("update").start()
    try {
      in.addData(ev(1, 0, 1, "click", 2.0), ev(2, 1, 1, "click", 3.0))
      q.processAllAvailable()
      in.addData(ev(3, 2, 1, "click", 5.0), ev(4, 2, 2, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val byUser = spark.table("running_t")
      .groupBy($"user_id").max("n_events", "total_value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(byUser(1L) === (3L, 10.0))
    assert(byUser(2L) === (1L, 1.0))
  }

  test("transformWithState matches flatMapGroupsWithState on the same input") {
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = runningUserStatsTws(spark, in.toDS()).writeStream
        .format("memory").queryName("tws_t").outputMode("update").start()
      try {
        in.addData(ev(1, 0, 1, "click", 2.0), ev(2, 1, 1, "click", 3.0))
        q.processAllAvailable()
        in.addData(ev(3, 2, 1, "click", 5.0), ev(4, 2, 2, "view", 1.0))
        q.processAllAvailable()
      } finally q.stop()
      val byUser = spark.table("tws_t")
        .groupBy($"user_id").max("n_events", "total_value")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      // same totals the flatMapGroupsWithState test asserts
      assert(byUser(1L) === (3L, 10.0))
      assert(byUser(2L) === (1L, 1.0))
      // state accumulated ACROSS batches, not per-batch
      val updatesUser1 = spark.table("tws_t").filter($"user_id" === 1)
        .select($"n_events").collect().map(_.getLong(0)).sorted
      assert(updatesUser1 === Array(2L, 3L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join attributes purchases to prior clicks") {
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val out = purchaseAttribution(clicks.toDF(), purchases.toDF())
    val q = out.writeStream.format("memory").queryName("attrib_t")
      .outputMode("append").start()
    try {
      clicks.addData(ev(1, 0, 7, "click"), ev(2, 30, 7, "click"),
        ev(3, 10, 8, "click"))
      purchases.addData(ev(100, 45, 7, "purchase", 9.99))
      q.processAllAvailable()
      // advance both watermarks far enough to emit the joined rows
      clicks.addData(ev(4, 300, 9, "click"))
      purchases.addData(ev(101, 300, 9, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib_t")
      .filter($"purchase_id" === 100L).collect()
    // purchase at t=45 joins user 7's clicks at t=0 and t=30 (≤1h back)
    assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
    assert(rows.forall(_.getLong(2) === 7L))
  }

  test("interval join drops exactly the late click beyond the watermark") {
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val out = purchaseAttribution(clicks.toDF(), purchases.toDF())
    val q = out.writeStream.format("memory").queryName("attrib_late")
      .outputMode("append").start()
    try {
      // on-time click + purchase for user 7
      clicks.addData(ev(1, 0, 7, "click"))
      purchases.addData(ev(100, 30, 7, "purchase", 9.99))
      q.processAllAvailable()
      // advance BOTH watermarks to ~340 min (1h lateness on each side)
      clicks.addData(ev(2, 400, 9, "click"))
      purchases.addData(ev(101, 400, 9, "purchase"))
      q.processAllAvailable()
      // late click at t=20: inside purchase 100's [t-1h, t] interval,
      // but 320 min behind the watermark → must be discarded, not joined
      clicks.addData(ev(5, 20, 7, "click"))
      q.processAllAvailable()
      // push watermarks further so any (incorrect) pending match would
      // have been emitted before we assert
      clicks.addData(ev(6, 500, 9, "click"))
      purchases.addData(ev(102, 500, 9, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val joined = spark.table("attrib_late")
      .filter($"purchase_id" === 100L).collect()
    // exact joined-set: ONLY the on-time click; the late click's id must
    // appear nowhere in the output
    assert(joined.map(_.getLong(1)).toSeq === Seq(1L))
    assert(spark.table("attrib_late")
      .filter($"click_id" === 5L).count() === 0L,
      "late click beyond watermark must be dropped from join state")
  }

  test("left-outer interval join emits unattributed purchases after the watermark") {
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val out = purchaseAttribution(clicks.toDF(), purchases.toDF(),
      joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      // user 7 has a prior click; user 8's purchase has none
      clicks.addData(ev(1, 0, 7, "click"))
      purchases.addData(ev(100, 30, 7, "purchase", 9.99),
        ev(200, 30, 8, "purchase", 5.0))
      q.processAllAvailable()
      // the null-match for purchase 200 may only emit once the
      // watermark proves no click can still arrive in its interval
      clicks.addData(ev(2, 300, 9, "click"))
      purchases.addData(ev(201, 300, 9, "purchase"))
      q.processAllAvailable()
      clicks.addData(ev(3, 500, 9, "click"))
      purchases.addData(ev(202, 500, 9, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows.contains((100L, 1L)), "matched purchase joins its click")
    assert(rows.contains((200L, -1L)),
      "unattributed purchase must emit with null click after watermark")
    assert(!rows.exists(p => p._1 == 200L && p._2 != -1L))
  }

  test("same transforms run in batch mode (stream-batch unification)") {
    val batch = Seq(ev(1, 10, 1, "click"), ev(2, 20, 1, "click"),
      ev(3, 70, 2, "view")).toDF()
    val got = tumblingCounts(batch).collect()
    assert(got.length === 2)
  }
}
