package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice over the `events` shape (TESTDATA.md):
  * watermarked tumbling/sliding/session windows, streaming dedup, and
  * custom per-key state via flatMapGroupsWithState.
  *
  * Every transform takes a plain DataFrame so the SAME logic runs in
  * batch mode (oracle-checkable — see q_time_bucket) and in streaming
  * mode (spec drives it with MemoryStream + memory sink). This is the
  * capability the reference lacks entirely (SURVEY.md §2.10): its
  * check-in time-series data was never processed by committed code.
  *
  * Scale notes: watermarks bound state size (without one, windowed
  * state grows forever at 100 TB/day); session windows use Spark's
  * native merging-session state store; dedup keys expire with the
  * watermark via dropDuplicatesWithinWatermark.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling event-time windows with a watermark bounding state. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("total"))

  /** Sliding windows (width, slide). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"))

  /** Session windows: gap-based per-user sessions. */
  def userSessions(events: DataFrame, gap: String = "10 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"),
        col("n_events"), col("session_value"))

  /** Streaming exact dedup on the event key; state expires with the
    * watermark instead of growing unboundedly. */
  def dedupedEvents(events: DataFrame,
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases matched to the clicks of
    * the same user within the preceding hour. Both sides carry
    * watermarks so the join state is bounded — the unbounded-state
    * trap is the reason stream-stream joins REQUIRE the time-range
    * condition at scale. `joinType` "left_outer" additionally emits
    * unattributed purchases (null click columns) once the watermark
    * proves no matching click can still arrive. */
  def purchaseAttribution(clicks: DataFrame,
      purchases: DataFrame, joinType: String = "inner"): DataFrame = {
    val c = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      expr("""p_user = c_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR"""),
      joinType)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Stream-static enrichment join: the event stream joined to a
    * static dimension (here a user→segment lookup) with an explicit
    * broadcast hint. Stream-static joins are stateless — the static
    * side is (re-)read per micro-batch and hash-broadcast to the
    * stream's tasks, so no watermark and no join state are needed; at
    * 100 TB/day this is the canonical way to decorate a firehose with
    * slowly-changing reference data (the dimension refresh cadence is
    * the micro-batch, not a shuffle of the stream). Left join keeps
    * events whose user is missing from the dimension. */
  def enrichedEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), coalesce(col("segment"), lit("unknown")).as("segment"))

  /** Custom state machine: running per-user totals emitted on every
    * update (flatMapGroupsWithState, update mode). The buffer is one
    * (count, sum) pair per live user — O(#users), not O(#events). */
  def runningUserStats(spark: SparkSession,
      events: Dataset[Event]): Dataset[UserStats] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var v = v0
          batch.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          Iterator(UserStats(userId, n, math.round(v * 100.0) / 100.0))
      }
  }

  /** The same per-user running totals on Spark 4's transformWithState
    * — the arbitrary-stateful API that supersedes
    * flatMapGroupsWithState: typed state variables from a handle,
    * RocksDB-backed, with per-state TTL support. Kept semantically
    * identical to [[runningUserStats]] so the spec can assert parity
    * between the old and new state APIs on one input. */
  class UserTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, UserStats] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserStats] = {
      val (n0, v0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var v = v0
      rows.foreach { e => n += 1; v += e.value }
      totals.update((n, v))
      Iterator(UserStats(key, n, math.round(v * 100.0) / 100.0))
    }
  }

  /** RocksDB state store is required by transformWithState; the spec
    * sets spark.sql.streaming.stateStore.providerClass accordingly. */
  def runningUserStatsTws(spark: SparkSession,
      events: Dataset[Event]): Dataset[UserStats] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Streaming telemetry debounce — the stateful twin of
    * q_event_debounce's lag-based batch form (ops/StatsQueries.scala):
    * an event is dropped when it arrives within `gapUs` of the
    * PREVIOUS raw event of the same (user, type); emitted rows are the
    * KEPT events. State is ONE timestamp per live key — O(#keys), not
    * O(#events). Rows inside a micro-batch are processed in
    * (ts, event_id) order so a batch's internal arrival order can't
    * change the answer; parity with the batch window-lag form holds
    * whenever each key's events arrive in event-time order across
    * micro-batches (out-of-order beyond that is the watermark's
    * business, as in any lag-based stream op). */
  class DebounceProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Long, String), Event, Event] {
    @transient private var lastTsUs:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      lastTsUs = getHandle.getValueState[Long]("lastTsUs",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: (Long, String), rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Event] = {
      val ordered = rows.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var prev = if (lastTsUs.exists()) Some(lastTsUs.get()) else None
      val kept = Vector.newBuilder[Event]
      ordered.foreach { e =>
        val t = e.ts.getTime * 1000L
        if (prev.forall(p => t - p > gapUs)) kept += e
        prev = Some(t) // lag semantics: gap to previous RAW event
      }
      prev.foreach(lastTsUs.update)
      kept.result().iterator
    }
  }

  /** Debounced event stream: default 5 s gap, matching
    * q_event_debounce. */
  def debouncedEvents(spark: SparkSession, events: Dataset[Event],
      gapUs: Long = 5000000L): Dataset[Event] = {
    import spark.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new DebounceProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** One streaming top-k snapshot row: `seq` is the per-key emission
    * counter, so a consumer (or the parity spec) can select each
    * key's LATEST snapshot out of an update-mode sink. */
  case class TopKEntry(value: Double, event_id: Long)
  case class TopKState(seq: Long, entries: Seq[TopKEntry])
  case class TopKRow(event_type: String, seq: Long, rank: Long,
      event_id: Long, value: Double)

  /** Streaming per-key top-k — the stateful twin of the custom batch
    * TopKPerKey operator (ext/TopKPerKey.scala): per event type,
    * maintain the k highest-value events seen so far and re-emit the
    * full snapshot whenever the key receives rows. State is the
    * BOUNDED k-entry list per key — O(#keys·k) total, the same
    * bounded-heap argument that makes the batch operator's
    * per-partition partial pass safe — so the stream never holds the
    * corpus. Ties break on (value desc, event_id asc), exactly the
    * batch operator's total order, which is what makes the parity
    * assertable. */
  class TopKProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, Event, TopKRow] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[TopKState] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[TopKState]("topk",
        org.apache.spark.sql.Encoders.product[TopKState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TopKRow] = {
      val prev = if (st.exists()) st.get() else TopKState(0L, Nil)
      val merged = (prev.entries.iterator ++
        rows.map(e => TopKEntry(e.value, e.event_id))).toIndexedSeq
        .sortBy(t => (-t.value, t.event_id)).take(k)
      val next = TopKState(prev.seq + 1, merged)
      st.update(next)
      merged.iterator.zipWithIndex.map { case (t, i) =>
        TopKRow(key, next.seq, (i + 1).toLong, t.event_id, t.value)
      }
    }
  }

  /** Streaming top-k per event type (default k=3); update mode —
    * each micro-batch re-emits the touched keys' snapshots. */
  def topKPerType(spark: SparkSession, events: Dataset[Event],
      k: Int = 3): Dataset[TopKRow] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** One streaming KMV snapshot row: `seq` is the per-key emission
    * counter (latest wins in an update-mode sink). */
  case class KmvSnapshot(event_type: String, seq: Long, k: Long,
      vk: Long, est: Double)
  case class KmvSt(seq: Long, hashes: Seq[Long])

  /** The exact scrambled hash of the batch q_kmv_by_type
    * (PolyHashExpr base-31 codepoint fold + two Lehmer steps mod
    * 2³¹−1) in plain JVM form, so stream and batch hash
    * bit-identically. */
  def kmvHash(s: String): Long = {
    val P = 2147483647L
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    (acc * 48271L % P) * 48271L % P
  }

  /** Streaming KMV distinct-user estimator — the bounded-state twin
    * of the batch q_kmv_by_type: per event type the state is the k
    * smallest DISTINCT scrambled user hashes — O(#types·k), never
    * O(#users), the whole point of KMV as STREAM state — and every
    * touched key re-emits its (k, vk, est) snapshot per batch.
    * est = (k−1)·P/vk with the batch query's exact double arithmetic
    * and Spark round(·,1) HALF_UP semantics, so StreamBatchParity can
    * assert bit-equality, not approximate closeness. The sketch is
    * also mergeable (union + re-min-k), which is why cross-batch
    * folding is exact regardless of how rows split into batches.
    *
    * State/cost bound (VERDICT r14 #7): the per-key fold re-sorts
    * `prev.hashes ++ batchHashes` — with state capped at kCap and a
    * micro-batch contributing b distinct hashes for the key that is
    * O((kCap+b)·log(kCap+b)) per key per batch, i.e. linear in the
    * batch with a kCap-bounded constant — NEVER a function of total
    * stream length, because the take(kCap) guarantees the carried
    * state re-enters the next fold at ≤ kCap elements (asserted in
    * StreamBatchParitySpec). Estimate error is the standard KMV bound
    * ~1/√(kCap−2) relative std error (Beyer et al., SIGMOD'07) —
    * kCap=256 ⇒ ~6 %, the same figure the batch sketch's spec gates —
    * so raising accuracy costs memory linearly and CPU O(k log k),
    * while the per-key state stays 8·kCap bytes + fixed overhead. */
  class KmvProcessor(kCap: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, Event, KmvSnapshot] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[KmvSt] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[KmvSt]("kmv",
        org.apache.spark.sql.Encoders.product[KmvSt],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[KmvSnapshot] = {
      val prev = if (st.exists()) st.get() else KmvSt(0L, Nil)
      val merged = (prev.hashes.iterator ++
          rows.map(e => kmvHash(e.user_id.toString)))
        .toSeq.distinct.sorted.take(kCap)
      st.update(KmvSt(prev.seq + 1, merged))
      val k = merged.size.toLong
      val vk = merged.last
      // vk == 0 guard (ADVICE r14): hash 0 is reachable, and when it is
      // the ONLY retained hash (k == 1) the raw (k−1)·P/vk is 0/0 —
      // Spark doubles say NaN, DuckDB raises — so both twins and the
      // oracle pin est = 0.0 (the value the k==1, vk≠0 case yields
      // anyway: zero evidence of cardinality beyond the sample).
      val est =
        if (vk == 0L) 0.0
        else java.math.BigDecimal
          .valueOf((k - 1).toDouble * 2147483647L / vk)
          .setScale(1, java.math.RoundingMode.HALF_UP).doubleValue()
      Iterator(KmvSnapshot(key, prev.seq + 1, k, vk, est))
    }
  }

  /** Streaming per-type KMV snapshots; k defaults to the batch
    * sketch's [[graft.scale.Sketches.KmvK]]. */
  def kmvByType(spark: SparkSession, events: Dataset[Event],
      kCap: Int = graft.scale.Sketches.KmvK): Dataset[KmvSnapshot] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new KmvProcessor(kCap),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** One pre-aggregated day of a metric series (the q_page_hinkley
    * daily-cents grid) and the detector's per-batch alarm snapshot. */
  case class DailyPoint(event_type: String, dayn: Long, cents: Long)
  case class PhAlarm(event_type: String, n_days: Long, ph_max_e6: Long,
      alarm_dayn: Long, drift_flag: Boolean)
  /** Cumulative fields are decimal strings (arbitrary-precision):
    * the batch twin folds in decimal(38,0)/HUGEINT, so the stream's
    * running sums must not wrap where the batch would not.
    *
    * CHECKPOINT COMPATIBILITY (ADVICE r14): round 14 changed these
    * fields from Long to String (BigInt-as-decimal-string), which
    * changes the value-state encoder schema — a Page–Hinkley query
    * restored from a pre-r14 checkpoint will fail state
    * deserialization. Upgrading across that boundary requires a NEW
    * checkpoint location (the detector is cheap to re-prime: replay
    * the per-day aggregates). Tests always start fresh state, so the
    * incompatibility is invisible there by design — this note is the
    * contract. */
  case class PhSt(i: Long, cum: String, m: String, rmin: String,
      maxgap: String, alarmDayn: Long)

  /** Streaming Page–Hinkley — the ONLINE form q_page_hinkley's batch
    * windows replay in hindsight, as a stateful processor: per metric
    * series the state is the six-field tuple (day count, running sum,
    * deviation cumsum m, running min of m, max gap, alarm day) —
    * O(#series), not O(#days) — and each day folds in with EXACTLY
    * the batch query's integer arithmetic (devᵢ = (xᵢ·i − cumᵢ)·10⁶/i
    * in BigInt, whose toward-zero division IS the sign-split
    * truncation and whose width matches the batch decimal(38,0)). Rows
    * inside a micro-batch fold in day order; cross-batch parity holds
    * when days arrive in order per key (the debounce caveat — beyond
    * that is the watermark's business). Every touched key re-emits
    * its alarm snapshot per batch (update mode). */
  class PageHinkleyProcessor(lambdaMeans: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, DailyPoint, PhAlarm] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[PhSt] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[PhSt]("ph",
        org.apache.spark.sql.Encoders.product[PhSt],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[DailyPoint],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[PhAlarm] = {
      val s0 = if (st.exists()) st.get()
        else PhSt(0L, "0", "0", "0", "-1", 0L)
      // All dev/cumsum/flag arithmetic in BigInt: the batch twin runs
      // in decimal(38,0), and BigInt division truncates toward zero
      // exactly like DuckDB's // on HUGEINT and JVM integer division.
      var i = s0.i
      var cum = BigInt(s0.cum)
      var m = BigInt(s0.m)
      var rmin = BigInt(s0.rmin)
      var maxgap = BigInt(s0.maxgap)
      var alarmDayn = s0.alarmDayn
      rows.toIndexedSeq.sortBy(_.dayn).foreach { p =>
        i += 1
        cum += p.cents
        val dev = (BigInt(p.cents) * i - cum) * 1000000 / i
        m += dev
        if (m < rmin) rmin = m
        val gap = m - rmin
        if (gap > maxgap) { maxgap = gap; alarmDayn = p.dayn }
      }
      st.update(PhSt(i, cum.toString, m.toString, rmin.toString,
        maxgap.toString, alarmDayn))
      // Emission guard: the batch oracle CASTs HUGEINT to BIGINT and
      // DuckDB raises on overflow — fail loudly here too, never wrap.
      require(maxgap.isValidLong,
        s"page-hinkley ph_max_e6 overflows int64 for key=$key: $maxgap")
      Iterator(PhAlarm(key, i, maxgap.toLong, alarmDayn,
        maxgap * i > BigInt(lambdaMeans) * cum * 1000000))
    }
  }

  /** Streaming drift alarms over a pre-aggregated daily stream;
    * λ defaults to the batch q_page_hinkley's 5× mean-day rule. */
  def pageHinkleyAlarms(spark: SparkSession,
      points: Dataset[DailyPoint],
      lambdaMeans: Long = graft.ops.StatsQueries.PhLambdaMeans)
      : Dataset[PhAlarm] = {
    import spark.implicits._
    points
      .groupByKey(_.event_type)
      .transformWithState(new PageHinkleyProcessor(lambdaMeans),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** One CDC change record and the key's materialized fate. */
  case class Change(key: Long, seq: Long, op: String, cents: Long)
  case class KeyFate(key: Long, seq: Long, alive: Boolean, cents: Long)

  /** Streaming CDC apply — the stateful twin of the batch
    * q_cdc_merge: per merge key the state is exactly the newest
    * (seq, op, cents) seen so far, updated latest-wins BY SEQUENCE
    * NUMBER (an out-of-order older change can never overwrite a newer
    * one — the property that makes CDC correct under shuffle/network
    * reordering), and every update emits the key's current fate, with
    * a delete tombstone materialized as alive=false. State is one
    * fixed-size tuple per live key — O(#keys), not O(#changes) — the
    * same footprint a streaming MERGE INTO maintains at 100 TB/day. */
  def cdcApply(spark: SparkSession,
      changes: Dataset[Change]): Dataset[KeyFate] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, String, Long), KeyFate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[Change],
         state: GroupState[(Long, String, Long)]) =>
          var cur = state.getOption.getOrElse((Long.MinValue, "", 0L))
          batch.foreach { c =>
            if (c.seq > cur._1) cur = (c.seq, c.op, c.cents)
          }
          state.update(cur)
          Iterator(KeyFate(key, cur._1, cur._2 != "D", cur._3))
      }
  }

  /** foreachBatch MERGE sink — the streaming-merge-into-a-table
    * pattern for engines without an ACID table format: every
    * micro-batch of changes is merged latest-wins-by-seq into a
    * parquet snapshot. The new snapshot is FULLY materialized into a
    * temp dir before the old one is swapped out (read-then-overwrite
    * of the same path would corrupt the files mid-scan), and
    * tombstoned keys are RETAINED with op='D' so a late out-of-order
    * change can never resurrect a deleted key — readers filter
    * `op <> 'D'` for the live view. At production scale the
    * rewrite-the-snapshot step is what Delta/Iceberg's MERGE replaces
    * with a log commit; the merge plan itself (union + one window
    * shuffle on the key) is identical. */
  def cdcSnapshotSink(changes: Dataset[Change], snapshotDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        val s = batch.sparkSession
        import org.apache.hadoop.fs.Path
        val fs = new Path(snapshotDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val snap = new Path(snapshotDir)
        val old = new Path(snapshotDir + "_old")
        val tmp = new Path(s"${snapshotDir}_tmp$batchId")
        // Crash recovery: a prior run that died mid-swap (after
        // snap→snap_old but before tmp→snap) left the newest COMPLETE
        // snapshot parked at _old — restore it before merging, so no
        // batch ever rebuilds from only its own changes.
        if (!fs.exists(snap) && fs.exists(old))
          require(fs.rename(old, snap), s"recovery rename $old failed")
        // Sweep temp dirs orphaned by failed/retried batches.
        Option(fs.globStatus(new Path(snapshotDir + "_tmp*")))
          .getOrElse(Array.empty)
          .foreach(st => fs.delete(st.getPath, true))
        val cur =
          if (fs.exists(snap)) s.read.parquet(snapshotDir)
          else batch.toDF().limit(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("seq").desc)
        cur.unionByName(batch.toDF())
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .write.mode("overwrite").parquet(tmp.toString)
        // Rename-aside swap: the previous snapshot survives at _old
        // until the new one is in place, and every rename result is
        // CHECKED — a failed swap aborts the batch (checkpoint will
        // retry) instead of silently destroying the snapshot.
        if (fs.exists(old)) { fs.delete(old, true): Unit }
        if (fs.exists(snap))
          require(fs.rename(snap, old), s"swap: retiring $snap failed")
        require(fs.rename(tmp, snap), s"swap: promoting $tmp failed")
        if (fs.exists(old)) { fs.delete(old, true): Unit }
      }
      .start()
  }
}
