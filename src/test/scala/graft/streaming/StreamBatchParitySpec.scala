package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming↔batch parity: each streaming op replays its exact input
  * through the SAME transform executed as a batch plan — the path the
  * DuckDB-oracled batch twins (q_time_bucket / q_sessionize /
  * q_event_debounce) hash-check — asserting the STATEFUL RUNTIME
  * (watermark bookkeeping, state store, append-mode eviction)
  * computes what the batch plan does. Late-data semantics are part of
  * the contract: the batch side sees the input MINUS the rows the
  * watermark provably dropped, restricted to windows the final
  * watermark closed (append mode emits nothing else).
  *
  * Watermark mechanics the sequences rely on: the watermark is
  * max(event ts) − lateness, computed at the END of a micro-batch and
  * applied to the NEXT one; a window/session is emitted (and its
  * state evicted) once its END ≤ watermark; a row whose every window
  * has END ≤ watermark is dropped.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import EventStreams._

  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def tsSec(sec: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")

  private def ev(id: Long, minute: Int, user: Long, typ: String,
      value: Double = 1.0) = Event(id, ts(minute), user, typ, value)

  test("tumbling windows: streaming append == batch twin on retained " +
      "rows, late row dropped") {
    val in = MemoryStream[Event]
    val q = tumblingCounts(in.toDF(), width = "10 minutes",
      lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_tumbling")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 2, 1, "click", 1.0), ev(2, 12, 1, "click", 2.0),
        ev(3, 14, 2, "view", 3.0))
      q.processAllAvailable() // watermark → 9: nothing closed yet
      in.addData(ev(5, 34, 1, "click", 4.0))
      q.processAllAvailable() // watermark → 29: [0,10) and [10,20) emit
      in.addData(ev(4, 3, 2, "view", 5.0)) // window end 10 ≤ 29: DROPPED
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // batch twin: same transform, batch execution, minus the dropped
    // late row, restricted to windows the final watermark (29) closed
    val retained = Seq(ev(1, 2, 1, "click", 1.0),
      ev(2, 12, 1, "click", 2.0), ev(3, 14, 2, "view", 3.0),
      ev(5, 34, 1, "click", 4.0)).toDF()
    val batch = tumblingCounts(retained, width = "10 minutes",
        lateness = "5 minutes")
      .filter($"w_start" < lit(ts(20))) // closed ⇔ end ≤ 29 ⇔ start < 20
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed === batch)
    // and the late view row really was dropped, not merged
    assert(!streamed.exists(t => t._2 == "view" && t._4 == 8.0))
    assert(streamed.nonEmpty)
  }

  test("sliding windows: streaming append == batch twin on retained " +
      "rows, late row dropped from every window") {
    val in = MemoryStream[Event]
    val q = slidingCounts(in.toDF(), width = "10 minutes",
      slide = "5 minutes", lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_sliding")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 12, 1, "click"), ev(2, 17, 2, "view"))
      q.processAllAvailable() // watermark → 12
      in.addData(ev(3, 44, 1, "click"))
      q.processAllAvailable() // watermark → 39: starts ≤ 29 emit
      // windows of minute 13 are [5,15) and [10,20): both ends ≤ 39
      in.addData(ev(4, 13, 1, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_sliding").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val retained = Seq(ev(1, 12, 1, "click"), ev(2, 17, 2, "view"),
      ev(3, 44, 1, "click")).toDF()
    val batch = slidingCounts(retained, width = "10 minutes",
        slide = "5 minutes", lateness = "5 minutes")
      .filter($"w_start" < lit(ts(30))) // closed ⇔ end ≤ 39 ⇔ start < 30
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("session windows: streaming append == batch twin; a late " +
      "session-merging row is dropped, not merged") {
    val in = MemoryStream[Event]
    val q = userSessions(in.toDF(), gap = "10 minutes",
      lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_sessions")
      .outputMode("append").start()
    try {
      // u1 at minutes 0 and 15: gap 15 > 10 ⇒ TWO sessions
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 15, 1, "click", 2.0))
      q.processAllAvailable() // watermark → 0 (below both sessions)
      in.addData(ev(3, 60, 9, "view", 7.0))
      q.processAllAvailable() // watermark → 55: both u1 sessions emit
      // minute 7 would bridge [0,10) and [15,25) into ONE session had
      // it arrived on time; its session end 17 ≤ 55 ⇒ DROPPED
      in.addData(ev(4, 7, 1, "click", 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_sessions").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val retained = Seq(ev(1, 0, 1, "click", 1.0),
      ev(2, 15, 1, "click", 2.0), ev(3, 60, 9, "view", 7.0)).toDF()
    val batch = userSessions(retained, gap = "10 minutes",
        lateness = "5 minutes")
      .filter($"s_end" <= lit(ts(55))) // final watermark
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed === batch)
    // u1 kept TWO sessions — the late bridge row did not merge them
    assert(streamed.count(_._3 == 1L) === 2)
    // counterfactual: had the bridge row been on time, batch would
    // see ONE merged u1 session — proving the drop is semantic
    val merged = userSessions(retained.unionByName(
        Seq(ev(4, 7, 1, "click", 9.0)).toDF()), gap = "10 minutes")
      .collect().count(_.getLong(2) == 1L)
    assert(merged === 1)
  }

  test("watermark boundary: window end EXACTLY at the watermark is " +
      "closed (row dropped); event ts exactly at the watermark is kept") {
    val in = MemoryStream[Event]
    val q = tumblingCounts(in.toDF(), width = "10 minutes",
      lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_boundary")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 15, 1, "click", 1.0))
      q.processAllAvailable() // watermark → 10
      // ts 10 == watermark: its window [10,20) has end 20 > 10 ⇒ KEPT
      // ts 0: window [0,10) has end 10 ≤ 10 — END EXACTLY AT THE
      // WATERMARK is closed ⇒ DROPPED (the ≤-vs-< boundary this test
      // pins)
      in.addData(ev(2, 10, 1, "click", 2.0), ev(3, 0, 2, "view", 4.0))
      q.processAllAvailable() // watermark stays 10
      in.addData(ev(4, 40, 1, "click", 8.0))
      q.processAllAvailable() // watermark → 35: [10,20) emits
    } finally q.stop()
    val streamed = spark.table("parity_boundary").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val retained = Seq(ev(1, 15, 1, "click", 1.0),
      ev(2, 10, 1, "click", 2.0), ev(4, 40, 1, "click", 8.0)).toDF()
    val batch = tumblingCounts(retained, width = "10 minutes",
        lateness = "5 minutes")
      .filter($"w_start" < lit(ts(30))) // closed ⇔ end ≤ 35 ⇔ start < 30
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed === batch)
    // the at-watermark row WAS accepted: [10,20) counts both clicks
    assert(streamed.exists(t => t._1 == ts(10) && t._3 == 2L))
    // the end-at-watermark window's row was dropped: no view anywhere
    assert(!streamed.exists(_._2 == "view"))
  }

  test("watermark boundary: a micro-batch arriving WHOLLY late emits " +
      "nothing and perturbs no state") {
    val in = MemoryStream[Event]
    val q = tumblingCounts(in.toDF(), width = "10 minutes",
      lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_wholly_late")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 2, 1, "click", 1.0), ev(2, 30, 1, "click", 2.0))
      q.processAllAvailable() // watermark → 25: [0,10) emits
      val afterOnTime = spark.table("parity_wholly_late").count()
      // every row's window end (10, 10, 20) ≤ 25 ⇒ the WHOLE batch is
      // late: dropped on input, nothing emitted, open state untouched
      in.addData(ev(3, 1, 2, "view", 4.0), ev(4, 5, 2, "view", 8.0),
        ev(5, 12, 1, "click", 16.0))
      q.processAllAvailable() // watermark unchanged (12−5 < 25)
      assert(spark.table("parity_wholly_late").count() === afterOnTime)
      in.addData(ev(6, 50, 1, "click", 32.0))
      q.processAllAvailable() // watermark → 45: [30,40) emits intact
    } finally q.stop()
    val streamed = spark.table("parity_wholly_late").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val retained = Seq(ev(1, 2, 1, "click", 1.0),
      ev(2, 30, 1, "click", 2.0), ev(6, 50, 1, "click", 32.0)).toDF()
    val batch = tumblingCounts(retained, width = "10 minutes",
        lateness = "5 minutes")
      .filter($"w_start" < lit(ts(40))) // closed ⇔ end ≤ 45 ⇔ start < 40
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed === batch)
    // [30,40) emitted with ONLY the on-time row — the late batch
    // neither merged into it nor resurrected [0,10)/[10,20)
    assert(streamed.exists(t => t._1 == ts(30) && t._3 == 1L &&
      t._4 == 2.0))
    assert(!streamed.exists(_._2 == "view"))
  }

  test("watermark boundary: ON-TIME rows in different micro-batches " +
      "merge into one session across the batch boundary") {
    val in = MemoryStream[Event]
    val q = userSessions(in.toDF(), gap = "10 minutes",
      lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_session_merge")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 20, 1, "click", 2.0))
      q.processAllAvailable() // watermark → 15; session [20,30) open
      // minute 28 is ON TIME (28 > 15) and overlaps [20,30): the state
      // store must extend the session to [20,38) ACROSS the boundary
      in.addData(ev(2, 28, 1, "click", 3.0))
      q.processAllAvailable() // watermark → 23; merged session open
      in.addData(ev(3, 60, 9, "view", 7.0))
      q.processAllAvailable() // watermark → 55 ≥ 38: merged session emits
    } finally q.stop()
    val streamed = spark.table("parity_session_merge").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val retained = Seq(ev(1, 20, 1, "click", 2.0),
      ev(2, 28, 1, "click", 3.0), ev(3, 60, 9, "view", 7.0)).toDF()
    val batch = userSessions(retained, gap = "10 minutes",
        lateness = "5 minutes")
      .filter($"s_end" <= lit(ts(55))) // final watermark
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed === batch)
    // exactly ONE u1 session, spanning both micro-batches' rows
    assert(streamed.filter(_._3 == 1L) ===
      Set((ts(20), ts(38), 1L, 2L, 5.0)))
  }

  test("streaming dedup == batch dropDuplicates on the same input") {
    val in = MemoryStream[Event]
    val q = dedupedEvents(in.toDF(), lateness = "30 minutes").writeStream
      .format("memory").queryName("parity_dedup")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0, 1, "click"), ev(2, 1, 1, "view"),
        ev(1, 2, 1, "click")) // in-batch duplicate id
      q.processAllAvailable()
      in.addData(ev(1, 3, 1, "click"), ev(3, 10, 2, "view")) // cross-batch dup
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_dedup").collect()
      .map(_.getAs[Long]("event_id")).sorted
    val batch = Seq(ev(1, 0, 1, "click"), ev(2, 1, 1, "view"),
        ev(1, 2, 1, "click"), ev(1, 3, 1, "click"), ev(3, 10, 2, "view"))
      .toDF().dropDuplicates("event_id")
      .collect().map(_.getAs[Long]("event_id")).sorted
    assert(streamed === batch)
    assert(streamed === Array(1L, 2L, 3L))
  }

  test("dedup state eviction: a duplicate id REPLAYED after the " +
      "watermark expires its state is emitted again (bounded-state " +
      "contract)") {
    // dropDuplicatesWithinWatermark trades exactly-once-forever for
    // bounded state: the id's dedup entry lives only while the
    // watermark can still admit a duplicate (ts + lateness). This
    // test pins BOTH sides of that trade: (1) a dup inside the
    // window is dropped, (2) after the watermark passes ts+lateness
    // the entry is evicted and a replay of the SAME id re-emits —
    // the documented divergence from batch dropDuplicates, and the
    // reason the operator survives 100 TB/day where an unbounded
    // dedup map OOMs.
    val in = MemoryStream[Event]
    val q = dedupedEvents(in.toDF(), lateness = "10 minutes").writeStream
      .format("memory").queryName("dedup_evict")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0, 1, "click"))
      q.processAllAvailable()
      in.addData(ev(1, 5, 1, "click")) // dup within ts+lateness: dropped
      q.processAllAvailable()
      // advance the watermark far beyond id 1's eviction horizon
      // (ts(0) + 10 min): watermark = 60 − 10 = 50 > 10
      in.addData(ev(2, 60, 2, "view"))
      q.processAllAvailable()
      in.addData(ev(1, 55, 1, "click")) // same id, state evicted → emits
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("dedup_evict").collect()
      .map(r => (r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"))).sortBy(_._2.getTime)
    assert(emitted.map(_._1).toSeq === Seq(1L, 1L, 2L),
      s"expected dup re-admittance after eviction, got: ${emitted.toSeq}")
    // the admitted replay is the minute-55 one, not the minute-5 dup
    assert(emitted.filter(_._1 == 1L).map(_._2).toSeq ===
      Seq(ts(0), ts(55)))
  }

  test("debounce via transformWithState == the oracled batch lag form " +
      "across micro-batch boundaries") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      def sev(id: Long, sec: Int, user: Long, typ: String) =
        Event(id, tsSec(sec), user, typ, 1.0)
      // u1 clicks at 0,3,7,9,20 s: lag gaps 3,4,2,11 ⇒ kept {0s, 20s};
      // u2 views at 1,4 s: gap 3 ⇒ kept {1s}. The 0/3 | 7/9/20 split
      // forces the 3s→7s gap to cross a micro-batch via state.
      val all = Seq(sev(10, 0, 1, "click"), sev(11, 3, 1, "click"),
        sev(12, 7, 1, "click"), sev(13, 9, 1, "click"),
        sev(14, 20, 1, "click"), sev(20, 1, 2, "view"),
        sev(21, 4, 2, "view"))
      val in = MemoryStream[Event]
      val q = debouncedEvents(spark, in.toDS()).writeStream
        .format("memory").queryName("parity_debounce")
        .outputMode("append").start()
      try {
        in.addData(all.filter(_.ts.getTime <= tsSec(4).getTime): _*)
        q.processAllAvailable()
        in.addData(all.filter(_.ts.getTime > tsSec(4).getTime): _*)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("parity_debounce").collect()
        .map(_.getAs[Long]("event_id")).sorted
      // the batch twin is q_event_debounce's window-lag form
      // (ops/StatsQueries.scala), applied to the identical rows
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".asc, $"event_id".asc)
      val batch = all.toDF()
        .withColumn("gap_us",
          unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        .filter($"gap_us".isNull || $"gap_us" > 5000000L)
        .collect().map(_.getAs[Long]("event_id")).sorted
      assert(streamed === batch)
      assert(streamed === Array(10L, 14L, 20L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming top-k via transformWithState: latest snapshot == " +
      "batch top-k; state stays k-bounded across micro-batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val all = Seq(
        ev(1, 0, 1, "click", 5.0), ev(2, 1, 1, "click", 9.0),
        ev(3, 2, 1, "click", 7.0), ev(4, 3, 1, "click", 9.0),
        ev(5, 4, 1, "click", 1.0), ev(6, 0, 2, "view", 4.0),
        ev(7, 1, 2, "view", 2.0))
      val in = MemoryStream[Event]
      val q = topKPerType(spark, in.toDS()).writeStream
        .format("memory").queryName("parity_topk")
        .outputMode("update").start()
      try {
        // split so the k-boundary (9.0 tie and the 7.0 bump) crosses
        // micro-batches through state
        in.addData(all.take(3): _*)
        q.processAllAvailable()
        in.addData(all.drop(3): _*)
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("parity_topk").collect()
      // per key, the latest snapshot is the max-seq emission
      val latest = rows.groupBy(_.getAs[String]("event_type"))
        .view.mapValues { rs =>
          val maxSeq = rs.map(_.getAs[Long]("seq")).max
          rs.filter(_.getAs[Long]("seq") == maxSeq)
            .sortBy(_.getAs[Long]("rank"))
            .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("event_id"),
              r.getAs[Double]("value")))
            .toSeq
        }.toMap
      // batch truth: top-3 by (value desc, event_id asc) per type
      val want = all.groupBy(_.event_type).view.mapValues(
        _.sortBy(e => (-e.value, e.event_id)).take(3).zipWithIndex
          .map { case (e, i) => ((i + 1).toLong, e.event_id, e.value) })
        .toMap
      assert(latest === want)
      // tie on 9.0 broke by event_id: id 2 ranks above id 4
      assert(latest("click").map(_._2) === Seq(2L, 4L, 3L))
      // every snapshot ever emitted was k-bounded
      assert(rows.groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("seq"))).values.forall(_.size <= 3))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("CDC apply: streaming latest-wins state == batch window twin, " +
      "out-of-order old change never overwrites") {
    val changes = Seq(
      Change(1L, 5L, "U", 500L),  // key 1 newest first...
      Change(2L, 1L, "U", 100L),
      Change(3L, 2L, "U", 250L))
    val late = Seq(
      Change(1L, 3L, "D", 0L),    // ...then an OLDER delete: must lose
      Change(2L, 7L, "D", 0L),    // a NEWER delete: must tombstone
      Change(3L, 9L, "U", 900L))
    val in = MemoryStream[Change]
    val q = cdcApply(spark, in.toDS()).writeStream
      .format("memory").queryName("parity_cdc")
      .outputMode("update").start()
    try {
      in.addData(changes: _*)
      q.processAllAvailable()
      in.addData(late: _*)
      q.processAllAvailable()
    } finally q.stop()
    // final state per key = its highest-seq emission across batches
    val streamed = spark.table("parity_cdc").collect()
      .map(r => (r.getAs[Long]("key"), (r.getAs[Long]("seq"),
        r.getAs[Boolean]("alive"), r.getAs[Long]("cents"))))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    // batch twin: q_cdc_merge's core — newest seq per key wins
    val w = Window.partitionBy($"key").orderBy($"seq".desc)
    val batch = (changes ++ late).toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .collect()
      .map(r => r.getAs[Long]("key") -> (r.getAs[Long]("seq"),
        r.getAs[String]("op") != "D", r.getAs[Long]("cents"))).toMap
    assert(streamed === batch)
    // the out-of-order delete for key 1 lost: still alive at seq 5
    assert(streamed(1L) === ((5L, true, 500L)))
    // the newer delete for key 2 won: tombstoned
    assert(streamed(2L) === ((7L, false, 0L)))
  }

  test("foreachBatch CDC snapshot sink: parquet snapshot converges to " +
      "the batch merge, tombstones retained across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-snap")
      .toFile.getAbsolutePath
    val snap = s"$dir/snapshot"
    val in = MemoryStream[Change]
    val q = cdcSnapshotSink(in.toDS(), snap, s"$dir/ckpt")
    try {
      in.addData(Change(1L, 5L, "U", 500L), Change(2L, 1L, "U", 100L),
        Change(3L, 2L, "U", 250L))
      q.processAllAvailable()
      in.addData(Change(1L, 3L, "D", 0L),  // stale delete: must lose
        Change(2L, 7L, "D", 0L),           // fresh delete: tombstones
        Change(3L, 9L, "U", 900L),
        Change(4L, 1L, "U", 42L))          // new key in a later batch
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(snap).collect()
      .map(r => r.getAs[Long]("key") -> (r.getAs[Long]("seq"),
        r.getAs[String]("op"), r.getAs[Long]("cents"))).toMap
    // snapshot holds exactly one row per key ever seen, newest seq wins
    assert(got === Map(
      1L -> ((5L, "U", 500L)),  // stale cross-batch delete lost
      2L -> ((7L, "D", 0L)),    // tombstone RETAINED, not dropped
      3L -> ((9L, "U", 900L)),
      4L -> ((1L, "U", 42L))))
    // the live view a reader derives
    val alive = spark.read.parquet(snap)
      .filter($"op" =!= "D").select($"key").as[Long].collect().toSet
    assert(alive === Set(1L, 3L, 4L))
    // cleanup scratch
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  test("q_lateness_profile's beyond-band predicts exactly the rows a " +
      "5-minute watermark drops") {
    // one event per micro-batch so the watermark tracks the arrival
    // high-water mark row-by-row (wm before batch k = hwm<k − 5 min).
    // Lateness values are either 0 (guaranteed kept) or 12 min —
    // beyond delay + window width, guaranteed dropped — so the
    // profile's bucket boundary IS the drop predictor, with no
    // window-alignment slack in between.
    val arrivals = Seq(        // (event_id = arrival order, ts minute)
      ev(1, 60, 1, "click", 1.0),
      ev(2, 61, 1, "click", 2.0),
      ev(3, 49, 1, "click", 4.0),   // 12 min late -> 4_beyond
      ev(4, 62, 1, "click", 8.0),
      ev(5, 50, 1, "click", 16.0),  // 12 min late -> 4_beyond
      ev(6, 90, 1, "click", 32.0))  // on time; closes the open windows
    val in = MemoryStream[Event]
    val q = tumblingCounts(in.toDF(), width = "1 minute",
      lateness = "5 minutes").writeStream
      .format("memory").queryName("parity_lateness")
      .outputMode("append").start()
    try arrivals.foreach { e =>
      in.addData(e); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity_lateness").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).toSet
    // the profile over the SAME arrival sequence
    val profile = graft.ops.StatsQueries.latenessProfileOn(
      arrivals.toDF().select($"event_type", $"user_id", $"event_id",
        unix_micros($"ts").as("ts_us"))).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n")).toMap
    assert(profile === Map("0_on_time" -> 4L, "4_beyond" -> 2L))
    // batch twin on the profile-predicted retained rows (the on-time
    // ones), restricted to windows the final watermark (85) closed
    val retained = arrivals.filter(e => Seq(1L, 2L, 4L, 6L).contains(e.event_id))
    val batch = tumblingCounts(retained.toDF(), width = "1 minute",
        lateness = "5 minutes")
      .filter($"w_start" < lit(ts(85)))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
    // and the two beyond-band rows are nowhere in the output
    assert(!streamed.exists(t => t._3 == 4.0 || t._3 == 16.0))
  }

  test("streaming KMV via transformWithState == the oracled batch " +
      "q_kmv_by_type across micro-batch boundaries") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val sf = SparkTestSession.sf
      val evs = graft.Tables.events(spark, sf)
        .select($"event_id", $"ts", $"user_id", $"event_type",
          coalesce($"value", lit(0.0)).as("value"))
        .as[Event].collect()
      // three arbitrary chunks: the KMV sketch is mergeable, so the
      // split must not matter
      val chunks = evs.grouped((evs.length + 2) / 3).toSeq
      val in = MemoryStream[Event]
      val q = kmvByType(spark, in.toDS()).writeStream
        .format("memory").queryName("parity_kmv")
        .outputMode("update").start()
      try {
        chunks.foreach { c => in.addData(c.toSeq: _*); q.processAllAvailable() }
      } finally q.stop()
      val allSnapshots = spark.table("parity_kmv").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
      // the state bound IS the operator's contract (VERDICT r14 #7):
      // every intermediate snapshot — not just the final one — must
      // carry k ≤ kCap, i.e. the carried state re-enters each fold
      // already capped
      assert(allSnapshots.forall(_._3 <= graft.scale.Sketches.KmvK),
        s"KMV snapshot exceeded kCap: ${allSnapshots.filter(_._3 > graft.scale.Sketches.KmvK).toSeq}")
      val streamed = allSnapshots
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
        .map(t => t._1 -> (t._3, t._4, t._5)).toMap
      val batch = graft.SparkEntry.queries("q_kmv_by_type")(spark, sf)
        .collect().map { r =>
          r.getAs[String]("event_type") -> (
            r.getAs[Long]("k"), r.getAs[Long]("vk"),
            r.getAs[Double]("est"))
        }.toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming Page-Hinkley via transformWithState == the oracled " +
      "batch q_page_hinkley across micro-batch boundaries") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val sf = SparkTestSession.sf
      // the exact daily grid the batch query folds, in day order
      val grid = graft.Tables.events(spark, sf)
        .filter($"value".isNotNull)
        .select($"event_type", to_date($"ts").as("day"),
          ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
        .groupBy($"event_type", $"day").agg(sum($"c").as("cents"))
        .select($"event_type",
          datediff($"day", lit("1970-01-01").cast("date"))
            .cast("long").as("dayn"),
          $"cents")
        .as[DailyPoint].collect().sortBy(p => (p.dayn, p.event_type))
      // three chunks split on day boundaries: state must carry the
      // fold across micro-batches
      val cut1 = grid(grid.length / 3).dayn
      val cut2 = grid(2 * grid.length / 3).dayn
      val chunks = Seq(grid.filter(_.dayn <= cut1),
        grid.filter(p => p.dayn > cut1 && p.dayn <= cut2),
        grid.filter(_.dayn > cut2))
      val in = MemoryStream[DailyPoint]
      val q = pageHinkleyAlarms(spark, in.toDS()).writeStream
        .format("memory").queryName("parity_ph")
        .outputMode("update").start()
      try {
        chunks.foreach { c => in.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      // update mode re-emits per batch: keep each key's final snapshot
      val streamed = spark.table("parity_ph").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
        .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
      val batch = graft.SparkEntry.queries("q_page_hinkley")(spark, sf)
        .collect().map { r =>
          r.getAs[String]("event_type") -> (
            r.getAs[Long]("n_days"), r.getAs[Long]("ph_max_e6"),
            r.getAs[java.sql.Date]("alarm_day").toLocalDate.toEpochDay,
            r.getAs[Boolean]("drift_flag"))
        }.toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
