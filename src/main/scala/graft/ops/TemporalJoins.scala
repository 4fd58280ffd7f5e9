package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operators don't express directly:
  * as-of (latest-preceding-match) and bounded-interval range joins.
  *
  * Reference analog: the dashboards attribute reviews/check-ins to the
  * business state "as of" the review date (README.md:16-20 trend
  * panels); more broadly an as-of join is the canonical
  * training-data-pipeline primitive for point-in-time-correct feature
  * lookup (no leakage from the future).
  *
  * Both operators here deliberately avoid the naive non-equi join
  * (`l.key = r.key AND r.ts <= l.ts`), which Spark can only plan as a
  * broadcast nested-loop / cartesian-per-key — O(n·m) per key and a
  * guaranteed scale-killer. Instead:
  *
  *  - as-of: union both sides, ONE hash exchange on the key, one sort,
  *    one window pass carrying the latest right payload forward —
  *    O((n+m) log (n+m)) per partition, spillable, AQE-friendly.
  *  - range join: band each side into fixed-width time buckets and
  *    equi-join on (key, bucket) with the right side replicated into
  *    the buckets its interval can reach, then apply the exact bound —
  *    candidates are bounded by bucket co-residency, not |l|×|r|.
  */
object TemporalJoins {

  /** As-of join: every `left` row picks the single most recent `right`
    * row with `right.tsCol <= left.tsCol` for the same `key` (ties on
    * the timestamp take the right row — `>=` semantics, matching
    * DuckDB/kdb ASOF). Left-outer: unmatched left rows keep nulls.
    *
    * Contract: `right` must be unique per (key, ts) — pre-aggregate if
    * not (the output would otherwise be nondeterministic in any
    * engine). Right payload columns must not collide with left's.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTs)
    // Right rows sort BEFORE left rows at an equal timestamp (__side
    // 0 < 1) so an exact-tie right row is visible to the window frame.
    val r = right.select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payloadCols.map(col) :+ col(rightTs).as("__rts"): _*).as("__r"))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val outCols: Seq[Column] = left.columns.map(col).toSeq ++
      payloadCols.map(c => col(s"__m.$c").as(c)) :+
      col("__m.__rts").as("matched_ts")
    matched.filter(col("__side") === 1).select(outCols: _*)
  }

  /** FORWARD as-of join: every `left` row picks the single EARLIEST
    * `right` row with `right.tsCol >= left.tsCol` for the same `key`
    * ("time to next event" — churn/response-latency features; the
    * mirror of [[asofJoin]]). Ties on the timestamp take the right row
    * (`<=` semantics, matching DuckDB's forward ASOF). Same
    * union-once/one-exchange/one-window shape as the backward join.
    * Same uniqueness contract on `right` per (key, ts).
    *
    * The window sorts DESCENDING and carries `last` over a RUNNING
    * preceding frame rather than using a `[currentRow,
    * unboundedFollowing]` frame with `first`: Spark executes an
    * unbounded-FOLLOWING frame by re-scanning from the current row to
    * the partition end for every output row — O(n²) on a hot key —
    * while the running frame is the same O(n) streaming pass the
    * backward join gets. Semantics are identical, tie rule included:
    * in descending order a right row at an equal timestamp sorts
    * before the left row (side 1 > 0 desc), so it is inside the
    * preceding frame, and `last` over rows seen so far in descending
    * time is exactly the EARLIEST right at-or-after the current row.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTs)
    val r = right.select(
      col(key), col(rightTs).as("__ts"), lit(1).as("__side"),
      struct(payloadCols.map(col) :+ col(rightTs).as("__rts"): _*).as("__r"))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val outCols: Seq[Column] = left.columns.map(col).toSeq ++
      payloadCols.map(c => col(s"__m.$c").as(c)) :+
      col("__m.__rts").as("matched_ts")
    matched.filter(col("__side") === 0).select(outCols: _*)
  }

  /** Bounded-interval range join: all (left, right) pairs sharing `key`
    * with `right.ts` in `[left.ts - windowSec, left.ts]`. Scalable
    * shape: band both sides into `windowSec`-wide buckets, replicate
    * the LEFT side into its bucket and the previous one (the interval
    * spans at most 2 buckets), equi-join on (key, bucket), then the
    * exact predicate. The equi-join shuffles on (key, bucket) — a
    * sort-merge/broadcast plan, never a nested loop.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    // Exact long bucketing: Column./ is double division, which would
    // make bucket ids fractional — subtract the remainder first so the
    // division is exact, then cast back to long.
    val bucket = (ts: Column) => {
      val us = unix_micros(ts)
      val w = lit(windowSec * 1000000L)
      ((us - pmod(us, w)) / w).cast("long")
    }
    // Alias both sides: left and right may share lineage (e.g. two
    // filters of the same table), where unqualified l(key) === r(key)
    // resolves to a trivially-true self-comparison.
    val l = left
      .withColumn("__b", explode(array(bucket(col(leftTs)) - 1, bucket(col(leftTs)))))
      .alias("__gl")
    val r = right.withColumn("__b", bucket(col(rightTs))).alias("__gr")
    l.join(r, col(s"__gl.$key") === col(s"__gr.$key") &&
        col("__gl.__b") === col("__gr.__b") &&
        col(s"__gr.$rightTs") <= col(s"__gl.$leftTs") &&
        col(s"__gr.$rightTs") >=
          col(s"__gl.$leftTs") - expr(s"INTERVAL $windowSec SECOND"))
      .drop(col("__gl.__b")).drop(col("__gr.__b")).drop(col(s"__gr.$key"))
  }

  /** General INTERVAL-overlap join: all (left, right) pairs whose time
    * intervals intersect ([ls,le] ∩ [rs,re] ≠ ∅) — the two-sided
    * generalization of [[rangeJoin]] (whose right side is a point).
    * Both sides replicate into every `bucketSec`-wide bucket their
    * interval touches; candidates come from the bucket equi-join.
    *
    * Dedup without a distinct: a pair sharing k buckets would emit k
    * times, so each match is emitted ONLY from the bucket containing
    * the overlap's start (bucket(max(ls,rs))) — an emit-once rule that
    * is a pure per-row predicate, saving the extra shuffle a
    * `.distinct()` would cost. Replication factor is
    * interval_len/bucketSec + 1 per row — size bucketSec to the
    * typical interval, exactly like any banded spatial join. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSec: Long): DataFrame = {
    val w = lit(bucketSec * 1000000L)
    def bucketOf(ts: Column): Column = {
      val us = unix_micros(ts)
      ((us - pmod(us, w)) / w).cast("long")
    }
    val l = left.withColumn("__b",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
      .alias("__il")
    val r = right.withColumn("__b",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
      .alias("__ir")
    l.join(r,
        col("__il.__b") === col("__ir.__b") &&
        col(s"__il.$lStart") <= col(s"__ir.$rEnd") &&
        col(s"__ir.$rStart") <= col(s"__il.$lEnd") &&
        col("__il.__b") === bucketOf(greatest(col(s"__il.$lStart"),
          col(s"__ir.$rStart"))))
      .drop("__b")
  }

  /** q_interval_overlap: which user activity sessions overlapped an
    * error incident (each error event widened ±5 min)? Sessions are
    * the 10-minute-gap sessionization of each user's events — the
    * interval×interval workload (session spans vs incident windows)
    * that point-in-window rangeJoin cannot express. Output is the
    * per-user incident exposure: overlap seconds are exact integer
    * microsecond arithmetic. */
  private def intervalOverlapQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val sessions = ev
      .withColumn("gap_us",
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .withColumn("is_new",
        when($"gap_us".isNull || $"gap_us" > 600L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum($"is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess")
      .agg(min($"ts").as("s_start"), max($"ts").as("s_end"))
    val incidents = ev.filter($"event_type" === "error")
      .select($"event_id".as("incident_id"),
        ($"ts" - expr("INTERVAL 300 SECOND")).as("i_start"),
        ($"ts" + expr("INTERVAL 300 SECOND")).as("i_end"))
    intervalOverlapJoin(sessions, incidents,
        "s_start", "s_end", "i_start", "i_end", 600L)
      .select($"user_id", $"incident_id",
        (unix_micros(least($"s_end", $"i_end")) -
          unix_micros(greatest($"s_start", $"i_start"))).as("overlap_us"))
      .groupBy($"user_id")
      .agg(countDistinct($"incident_id").as("n_incidents"),
        sum($"overlap_us").as("exposure_us"))
  }

  /** q_asof_attribution: attribute each purchase event to the latest
    * click at-or-before it by the same user (point-in-time-correct
    * last-touch attribution). Clicks are pre-deduped to one per
    * (user, ts) so the as-of match is well-defined. */
  private def asofAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("purchase_ts"), $"value")
    asofJoin(purchases, clicks, "user_id", "purchase_ts", "ts")
      .select($"purchase_id", $"user_id", $"purchase_ts", $"value",
        $"click_id", $"matched_ts".as("click_ts"),
        (unix_micros($"purchase_ts") - unix_micros($"matched_ts"))
          .as("gap_us"))
  }

  /** q_range_join_banded: every (purchase, click) pair by the same user
    * within the preceding hour — the batch twin of the streaming
    * interval join (EventStreams.purchaseAttribution), planned as a
    * banded equi-join instead of a nested loop. */
  private def rangeAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("purchase_ts"))
    rangeJoin(purchases, clicks, "user_id", "purchase_ts", "click_ts", 3600L)
      .select($"purchase_id", $"user_id", $"purchase_ts",
        $"click_id", $"click_ts")
  }

  /** q_asof_nearest: NEAREST-event as-of — for every click, the
    * purchase with the smallest absolute time gap in EITHER
    * direction, completing the backward/forward pair (the
    * sensor-alignment / nearest-context-join semantics: "which
    * purchase does this click most plausibly belong to?"). Composed
    * from the two existing one-exchange as-ofs plus one click-keyed
    * equi join of their outputs; ties (equidistant purchases, incl.
    * gap 0) resolve BACKWARD in both engines. Direction and gap ride
    * along so consumers can filter asymmetrically. */
  private def asofNearest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id",
        $"ts".as("click_ts"))
    val back = asofJoin(clicks, purchases, "user_id", "click_ts", "ts")
      .select($"click_id", $"user_id", $"click_ts",
        $"purchase_id".as("prev_id"), $"matched_ts".as("prev_ts"))
    val fwd = asofJoinForward(clicks, purchases, "user_id", "click_ts", "ts")
      .select($"click_id", $"purchase_id".as("next_id"),
        $"matched_ts".as("next_ts"))
    val pickPrev = $"prev_ts".isNotNull &&
      ($"next_ts".isNull || $"prev_gap" <= $"next_gap")
    back.join(fwd, "click_id")
      .withColumn("prev_gap",
        unix_micros($"click_ts") - unix_micros($"prev_ts"))
      .withColumn("next_gap",
        unix_micros($"next_ts") - unix_micros($"click_ts"))
      .select($"click_id", $"user_id", $"click_ts",
        when(pickPrev, $"prev_id").otherwise($"next_id")
          .as("nearest_purchase_id"),
        when(pickPrev, $"prev_gap").otherwise($"next_gap")
          .as("nearest_gap_us"),
        when($"prev_ts".isNull && $"next_ts".isNull, lit("none"))
          .when(pickPrev, lit("backward"))
          .otherwise(lit("forward")).as("direction"))
  }

  /** q_multitouch_attribution: LINEAR multi-touch credit — each
    * purchase's revenue split EQUALLY across every click by the same
    * user in the preceding hour (the multi-touch generalization of
    * q_asof_attribution's last-touch and q_range_join_banded's raw
    * pair table), rolled up by click hour-of-day: "which hours'
    * clicks drive revenue". Credit stays exact: per-touch share is
    * the integer (cents·1e6) div n_touch, so the hourly sums are
    * BIGINT-exact and Σ shares per purchase differs from cents·1e6
    * only by the division remainder (< n_touch, never invented
    * revenue). Shape: the pair table comes from the banded equi-join
    * (never a nested loop), n_touch is a purchase-keyed window over
    * pairs (bounded by clicks-per-user-hour), and the rollup
    * collapses map-side to 24 rows. */
  private def multitouchAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("purchase_ts"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    rangeJoin(purchases, clicks, "user_id", "purchase_ts", "click_ts", 3600L)
      .withColumn("n_touch",
        count(lit(1)).over(W.partitionBy($"purchase_id")))
      .select(hour($"click_ts").cast("long").as("click_hour"),
        expr("(cents * 1000000) div n_touch").as("credit"))
      .groupBy($"click_hour")
      .agg(count(lit(1)).as("n_touches"),
        sum($"credit").as("credit_e6_cents"))
  }

  /** q_asof_forward: for every click, the NEXT purchase at-or-after it
    * by the same user and the wait in µs — the forward mirror of
    * q_asof_attribution (conversion-latency / time-to-next-event
    * features). Purchases are pre-deduped to one per (user, ts) so
    * the match is well-defined. */
  private def asofForward(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id",
        $"ts".as("click_ts"))
    asofJoinForward(clicks, purchases, "user_id", "click_ts", "ts")
      .select($"click_id", $"user_id", $"click_ts",
        $"purchase_id", $"matched_ts".as("purchase_ts"),
        (unix_micros($"matched_ts") - unix_micros($"click_ts"))
          .as("wait_us"))
  }

  /** Bitemporal snapshot audit — the two-axis time query a warehouse
    * with late-arriving corrections needs and none of the one-axis
    * operators here (as-of = valid time only, SCD2 = transaction time
    * only) can answer: "what did we BELIEVE at transaction time T_tx
    * about each user's state valid at T_v, and how does it differ
    * from what we know now?" Valid time = event ts; transaction time
    * = event_id (the ingestion-order proxy, monotone). Both cutoffs
    * derive deterministically as integer midpoints of the observed
    * ranges. The per-user belief is the (valid-ts, tx) argmax under
    * each knowledge horizon — one min-struct aggregate per horizon,
    * no window over raw events — and `revised` marks users whose
    * believed state CHANGED once post-T_tx arrivals landed: the
    * late-data audit that decides whether a snapshot can be served
    * from cache. Shape: one scan, two combinable argmax rollups on
    * user, one broadcast 1-row cutoff table. */
  private def bitemporalSnapshot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val recs = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cuts = recs.agg(min($"us").as("mn_us"), max($"us").as("mx_us"),
        min($"event_id").as("mn_id"), max($"event_id").as("mx_id"))
      .select(expr("(mn_us + mx_us) div 2").as("v_cut"),
        expr("(mn_id + mx_id) div 2").as("tx_cut"))
    val valid = recs.crossJoin(broadcast(cuts)).filter($"us" <= $"v_cut")
    val full = valid.groupBy($"user_id")
      .agg(min(struct((-$"us").as("nu"), (-$"event_id").as("ni"),
        $"cents")).as("pk"))
      .select($"user_id", $"pk.cents".as("believed_full_cents"))
    val atTx = valid.filter($"event_id" <= $"tx_cut")
      .groupBy($"user_id")
      .agg(min(struct((-$"us").as("nu"), (-$"event_id").as("ni"),
        $"cents")).as("pk"))
      .select($"user_id", $"pk.cents".as("believed_tx_cents"))
    full.join(atTx, Seq("user_id"), "left")
      .withColumn("revised",
        $"believed_tx_cents".isNull ||
          $"believed_tx_cents" =!= $"believed_full_cents")
  }

  /** Shapley multi-touch attribution — the game-theoretic middle
    * ground between the heuristic linear split
    * ([[multitouchAttribution]]) and the model-based Markov removal
    * effect (q_markov_attribution): each conversion's credit is the
    * Shapley value of the PRESENCE game over the distinct channels
    * touched before the first purchase, which for a unanimity-style
    * coverage game collapses closed-form to 1/|touched set| per
    * channel (the q_shapley_coverage collapse, applied to journeys).
    * Position-agnostic by construction — a channel is paid for being
    * in the winning coalition, not for being first or last. With ≤ 4
    * non-purchase channels the credits are EXACT twelfths
    * (lcm(1..4) = 12): credit_12 = Σ 12/|set|, and
    * Σ_channels credit_12 = 12·conversions is the efficiency axiom
    * the spec pins at the wire. Shape: one first-purchase rollup, one
    * distinct (user, channel) pre-conversion set, one owner-count
    * join — all combinable, linear at any event volume. */
  private def shapleyAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", $"ts")
    val conv = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("conv_ts"))
    val touched = ev.filter($"event_type" =!= "purchase")
      .join(conv, "user_id")
      .filter($"ts" <= $"conv_ts")
      .select($"user_id", $"event_type").distinct()
    val setSizes = touched.groupBy($"user_id")
      .agg(count(lit(1)).as("set_size"))
    val tot = setSizes.agg(count(lit(1)).as("n_conv"))
    touched.join(setSizes, "user_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_journeys"),
        sum(when($"set_size" === 1L, 1L).otherwise(0L))
          .as("n_exclusive"),
        sum(expr("12 div set_size")).as("credit_12"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        expr("credit_12 * 1000000 div (12 * n_conv)"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_bitemporal_snapshot", bitemporalSnapshot, Some("""
      WITH recs AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS cents
                    FROM events
                    WHERE event_type = 'purchase'
                      AND value IS NOT NULL),
      cuts AS (SELECT (min(us) + max(us)) // 2 AS v_cut,
                      (min(event_id) + max(event_id)) // 2 AS tx_cut
               FROM recs),
      valid AS (SELECT r.* FROM recs r, cuts WHERE r.us <= cuts.v_cut),
      fullk AS (SELECT user_id, cents AS believed_full_cents
                FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY us DESC, event_id DESC) AS rn
                      FROM valid) WHERE rn = 1),
      attx AS (SELECT user_id, cents AS believed_tx_cents
               FROM (SELECT v.*, row_number() OVER (PARTITION BY user_id
                       ORDER BY us DESC, event_id DESC) AS rn
                     FROM valid v, cuts WHERE v.event_id <= cuts.tx_cut)
               WHERE rn = 1)
      SELECT f.user_id, f.believed_full_cents, a.believed_tx_cents,
             a.believed_tx_cents IS NULL
               OR a.believed_tx_cents <> f.believed_full_cents
               AS revised
      FROM fullk f LEFT JOIN attx a ON f.user_id = a.user_id""")),

    Q("q_shapley_attribution", shapleyAttribution, Some("""
      WITH conv AS (SELECT user_id, min(ts) AS conv_ts FROM events
                    WHERE event_type = 'purchase' GROUP BY 1),
      touched AS (SELECT DISTINCT e.user_id, e.event_type
                  FROM events e JOIN conv c ON e.user_id = c.user_id
                  WHERE e.event_type <> 'purchase'
                    AND e.ts <= c.conv_ts),
      sizes AS (SELECT user_id, CAST(count(*) AS BIGINT) AS set_size
                FROM touched GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_conv FROM sizes)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_journeys,
             CAST(sum(CASE WHEN set_size = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_exclusive,
             CAST(sum(12 // set_size) AS BIGINT) AS credit_12,
             CAST(max(n_conv) AS BIGINT) AS n_conv,
             CAST(sum(12 // set_size) * 1000000 // (12 * max(n_conv))
               AS BIGINT) AS share_ppm
      FROM touched JOIN sizes USING (user_id), tot
      GROUP BY 1""")),

    Q("q_asof_attribution", asofAttribution, Some("""
      WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      purch AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id, p.purchase_ts, p.value,
             c.click_id, c.ts AS click_ts,
             CAST(epoch_us(p.purchase_ts) - epoch_us(c.ts) AS BIGINT)
               AS gap_us
      FROM purch p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.purchase_ts >= c.ts"""),
      headline = true),

    Q("q_interval_overlap", intervalOverlapQ, Some("""
      WITH seq AS (SELECT user_id, event_id, ts,
                          lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS prev_ts
                   FROM events),
      marked AS (SELECT user_id, event_id, ts,
                        CASE WHEN prev_ts IS NULL OR
                                  epoch_us(ts) - epoch_us(prev_ts)
                                    > 600000000
                             THEN 1 ELSE 0 END AS is_new
                 FROM seq),
      numbered AS (SELECT user_id, ts,
                          sum(is_new) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS sess
                   FROM marked),
      sessions AS (SELECT user_id, sess,
                          min(ts) AS s_start, max(ts) AS s_end
                   FROM numbered GROUP BY 1, 2),
      inc AS (SELECT event_id AS incident_id,
                     ts - INTERVAL 300 SECOND AS i_start,
                     ts + INTERVAL 300 SECOND AS i_end
              FROM events WHERE event_type = 'error'),
      ov AS (SELECT s.user_id, i.incident_id,
                    epoch_us(least(s.s_end, i.i_end)) -
                      epoch_us(greatest(s.s_start, i.i_start))
                      AS overlap_us
             FROM sessions s JOIN inc i
               ON s.s_start <= i.i_end AND i.i_start <= s.s_end)
      SELECT user_id,
             CAST(count(DISTINCT incident_id) AS BIGINT) AS n_incidents,
             CAST(sum(overlap_us) AS BIGINT) AS exposure_us
      FROM ov GROUP BY 1""")),

    Q("q_range_join_banded", rangeAttribution, Some("""
      SELECT p.event_id AS purchase_id, p.user_id,
             p.ts AS purchase_ts,
             c.event_id AS click_id, c.ts AS click_ts
      FROM events p JOIN events c
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 1 HOUR""")),

    Q("q_asof_nearest", asofNearest, Some("""
      WITH purch AS (
        SELECT user_id, ts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      clicks AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'),
      b AS (SELECT c.click_id, c.user_id, c.click_ts,
                   p.purchase_id AS prev_id, p.ts AS prev_ts
            FROM clicks c ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.click_ts >= p.ts),
      f AS (SELECT c.click_id, p.purchase_id AS next_id, p.ts AS next_ts
            FROM clicks c ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.click_ts <= p.ts),
      j AS (SELECT b.click_id, b.user_id, b.click_ts,
                   b.prev_id, b.prev_ts, f.next_id, f.next_ts,
                   epoch_us(b.click_ts) - epoch_us(b.prev_ts)
                     AS prev_gap,
                   epoch_us(f.next_ts) - epoch_us(b.click_ts)
                     AS next_gap
            FROM b JOIN f USING (click_id))
      SELECT click_id, user_id, click_ts,
             CASE WHEN prev_ts IS NOT NULL
                   AND (next_ts IS NULL OR prev_gap <= next_gap)
                  THEN prev_id ELSE next_id END AS nearest_purchase_id,
             CAST(CASE WHEN prev_ts IS NOT NULL
                   AND (next_ts IS NULL OR prev_gap <= next_gap)
                  THEN prev_gap ELSE next_gap END AS BIGINT)
               AS nearest_gap_us,
             CASE WHEN prev_ts IS NULL AND next_ts IS NULL THEN 'none'
                  WHEN prev_ts IS NOT NULL
                   AND (next_ts IS NULL OR prev_gap <= next_gap)
                  THEN 'backward'
                  ELSE 'forward' END AS direction
      FROM j""")),

    Q("q_multitouch_attribution", multitouchAttribution, Some("""
      WITH pr AS (
        SELECT p.event_id AS purchase_id,
               CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               c.ts AS click_ts
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 1 HOUR),
      n AS (SELECT cents, click_ts,
                   CAST(count(*) OVER (PARTITION BY purchase_id)
                     AS BIGINT) AS n_touch
            FROM pr)
      SELECT CAST(hour(click_ts) AS BIGINT) AS click_hour,
             CAST(count(*) AS BIGINT) AS n_touches,
             CAST(sum((cents * 1000000) // n_touch) AS BIGINT)
               AS credit_e6_cents
      FROM n GROUP BY 1""")),

    Q("q_asof_forward", asofForward, Some("""
      WITH purch AS (
        SELECT user_id, ts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      clicks AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click')
      SELECT c.click_id, c.user_id, c.click_ts,
             p.purchase_id, p.ts AS purchase_ts,
             CAST(epoch_us(p.ts) - epoch_us(c.click_ts) AS BIGINT)
               AS wait_us
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND c.click_ts <= p.ts"""),
      headline = true)
  )
}
