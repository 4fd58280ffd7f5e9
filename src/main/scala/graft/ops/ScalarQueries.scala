package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8) plus the derived-column
  * patterns the reference builds its master table from: date extraction
  * (`year`/`month`/`to_date`, glue_job.py:76-77, scripts/etl.py:105),
  * CASE chains (sentiment scripts/etl.py:96-101; state normalization
  * scripts/glue_job.py:85-115), substring-containment category mapping
  * (glue_job.py:50-73), string functions, JSON extraction, array
  * split/explode, pivot, and null handling (na.drop/coalesce,
  * scripts/etl.py:58). Everything is built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs in the hot path.
  */
object ScalarQueries {

  /** year()/month() extraction + group (reference glue_job.py:76-77 and
    * dashboard Q4 yearly-trend shape). */
  private def dateExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy(
        year($"o_orderdate").cast("long").as("o_year"),
        month($"o_orderdate").cast("long").as("o_month"))
      .agg(count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** to_date() (scripts/etl.py:105 `only_date`) + day-of-week name
    * (dashboard Q5 "day-wise reviews"). */
  private def toDateDow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(to_date($"l_shipdate").as("ship_date"),
        date_format($"l_shipdate", "EEEE").as("dow"))
      .groupBy($"dow")
      .agg(count(lit(1)).as("cnt"), min($"ship_date").as("first_date"))
  }

  /** Sentiment-style 3-way CASE chain on a numeric column — exactly the
    * reference's stars→sentiment mapping (scripts/etl.py:96-101) with
    * o_totalprice standing in for stars. */
  private def caseChain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("bucket",
        when($"o_totalprice" <= 50000.0, "low")
          .when($"o_totalprice" <= 150000.0, "mid")
          .otherwise("high"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"o_totalprice"), 2).as("avg_price"))
  }

  /** State-normalization pattern (scripts/glue_job.py:85-115): map known
    * codes to long names, pass unknowns through — implemented the
    * scalable way, as a broadcast map literal + coalesce instead of a
    * 27-branch when-chain (SURVEY.md §2.8 X4 "idiomatic" mapping). */
  private def mapNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val regionFull = Map(
      "AMERICA" -> "The Americas", "ASIA" -> "Asia-Pacific",
      "EUROPE" -> "Europe")
    val m = typedLit(regionFull)
    Tables.region(s, d)
      .select($"r_name",
        coalesce(element_at(m, $"r_name"), $"r_name").as("r_full"))
  }

  /** Super-category first-match containment chain (glue_job.py:50-73):
    * ordered keyword → category lookup over a delimited string, null →
    * "Other", no-match → "Other". Built programmatically as a when-chain
    * (native Contains expressions, whole-stage codegen) over p_type. */
  val typeKeywords: Seq[(String, String)] = Seq(
    "BURNISHED" -> "polished", "ECONOMY" -> "economy", "STANDARD" -> "standard",
    "PROMO" -> "promotional", "SMALL" -> "compact", "MEDIUM" -> "midsize",
    "LARGE" -> "oversize")

  def superCategoryCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val chain = typeKeywords.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, (kw, cat)) =>
        Some(acc match {
          case None    => when(c.contains(kw), cat)
          case Some(w) => w.when(c.contains(kw), cat)
        })
    }.get
    when(c.isNull, "other").otherwise(coalesce(chain, lit("other")))
  }

  private def superCategory(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .withColumn("category", superCategoryCol($"p_type"))
      .groupBy($"category")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Same query through the custom codegen'd Catalyst Expression
    * (graft.ext.SuperCategoryExpr) — shares the when-chain oracle,
    * proving the extension point produces identical results. */
  private def superCategoryNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .withColumn("category", graft.ext.SuperCategoryExpr.superCategory(
        $"p_type", typeKeywords, fallback = "other"))
      .groupBy($"category")
      .agg(count(lit(1)).as("cnt"))
  }

  /** String function battery: upper/lower/length/substring/concat/trim/
    * replace/lpad — all codegen'd built-ins (absent in reference; §2.8
    * "not present" list made available natively). */
  private def stringFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      upper($"p_brand").as("brand_u"),
      lower($"p_type").as("type_l"),
      length($"p_name").cast("long").as("name_len"),
      substring($"p_name", 1, 5).as("name_pfx"),
      concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
      regexp_replace($"p_name", " ", "_").as("name_us"),
      lpad($"p_partkey".cast("string"), 8, "0").as("key_pad"))
  }

  /** split + explode (categories-as-array capability, SURVEY.md §2.8):
    * p_type tokenized to words, exploded, counted. */
  private def splitExplode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select(explode(split($"p_type", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
  }

  /** JSON scalar extraction (events.props is a JSON string). */
  private def jsonExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .filter($"k" > 50)
  }

  /** Semi-structured VARIANT path (Spark 4's open-variant type —
    * parse_json once into the binary variant encoding, then typed
    * variant_get extraction): the modern replacement for per-access
    * get_json_object string re-parsing. The rollup proves the typed
    * extraction (sum/min/max over the long-typed path) and the
    * is_variant_null/try_variant_get guards. Oracle: DuckDB's JSON
    * accessors produce the same scalars. Scan-local — the variant
    * column never leaves the map side; only the |types|-row rollup
    * shuffles. */
  private def variantExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
        expr("try_variant_get(parse_json(props), '$.missing', 'long')")
          .as("miss"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"), min($"k").as("min_k"),
        max($"k").as("max_k"),
        sum(when($"miss".isNull, 1L).otherwise(0L)).as("n_missing"))
  }

  /** Pivot event_type → columns (BI-layer capability pulled into the
    * engine; oracle expressed with FILTERed aggregates). The value
    * list is pinned deliberately: a pinned pivot skips the extra
    * distinct-values collection job AND keeps the output schema (and
    * thus the oracle's column set) independent of which types happen
    * to appear at a given sf. */
  private def pivotEvents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum($"value"), 2))
      .na.fill(0.0)
  }

  /** Null handling: left join produces nulls, then na.drop() (F2,
    * scripts/etl.py:58) — equivalent to keeping matched rows only. */
  private def nullDrop(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"o_orderkey", $"o_orderstatus")
      .na.drop()
  }

  /** Null fill: coalesce missing aggregates to sentinel values (F3
    * null-guard pattern natively). */
  private def nullFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d).groupBy($"o_custkey")
          .agg(round(sum($"o_totalprice"), 2).as("spent")),
        $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", coalesce($"spent", lit(0.0)).as("spent"))
  }

  /** Math battery: abs/floor/ceil/sqrt/pow/round. */
  private def mathFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_linenumber" === 1)
      .select(
        $"l_orderkey",
        round(abs($"l_extendedprice" - $"l_quantity" * lit(1000.0)), 2).as("absdiff"),
        floor($"l_extendedprice").cast("long").as("flr"),
        ceil($"l_extendedprice").cast("long").as("cl"),
        round(sqrt($"l_quantity"), 6).as("sq"),
        round(pow($"l_discount", 2), 6).as("disc2"))
  }

  /** Conditional aggregation (count/sum with predicates — the FILTER
    * clause pattern used all over BI queries). */
  private def conditionalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        count(when($"l_quantity" > 25, 1)).as("n_big"),
        count(when($"l_quantity" <= 25, 1)).as("n_small"),
        round(sum(when($"l_discount" > 0.05, $"l_extendedprice")
          .otherwise(0.0)), 2).as("discounted_px"))
  }

  /** Time bucketing via window() in batch mode (tumbling 1-day windows
    * over events — the Structured-Streaming agg shape, runnable and
    * oracle-checkable as a batch query). */
  /** Peak activity hours per event type (the reference synopsis'
    * "check-in peak hours" analytic — reference README.md:30 lists the
    * check-in dataset but never processes it; the events table stands
    * in, SURVEY.md §2.10): hour-of-day histogram, top 3 per type via
    * window rank. */
  private def peakHours(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byHour = Tables.events(s, d)
      .groupBy(hour($"ts").cast("long").as("hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"cnt".desc, $"hour".asc)
    byHour.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
  }

  private def timeBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
      .select(date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"event_type", $"cnt", $"total")
  }

  /** Gap-based sessionization in BATCH mode via the native
    * session_window operator (the streaming module uses the same call
    * on a stream). Oracle: the classic SQL gaps-and-islands rewrite —
    * a session id is the running count of gap>10min flags per user;
    * session end = last event + gap (session_window's semantics). */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("session_value"))
      .select(
        date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss")
          .as("s_start"),
        date_format($"session_window.end", "yyyy-MM-dd HH:mm:ss")
          .as("s_end"),
        $"user_id", $"n_events", $"session_value")
  }

  /** Ordered-funnel analysis: how many users progressed view → click →
    * purchase IN ORDER (each step's timestamp ≥ the previous step's
    * first completion). Dependent step minima can't be one conditional
    * aggregate, so the funnel runs as a chain of per-step aggregations,
    * each broadcast back into the next step's scan — the events table
    * is scanned once per step with only (user, ts) aggregates ever
    * shuffling, never re-sorted or collected per user (a hot user with
    * millions of events costs the same as a cold one). */
  private def eventFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val step1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val step2 = ev.filter($"event_type" === "click")
      .join(broadcast(step1), "user_id").filter($"ts" >= $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val step3 = ev.filter($"event_type" === "purchase")
      .join(broadcast(step2), "user_id").filter($"ts" >= $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val stages = Seq(("1_view", step1), ("2_click_after_view", step2),
      ("3_purchase_after_click", step3))
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"),
        $"n_users")
    }.reduce(_.unionByName(_))
  }

  /** RFM segmentation — the classic CRM rollup: per purchasing user,
    * Recency (days since last purchase, anchored at the corpus max
    * day so the statistic is reproducible), Frequency (purchase
    * count), Monetary (exact cents), each quintile-scored 1–5 with a
    * deterministic (metric, user_id) total order so ntile can never
    * tie-split differently, then a CASE segment taxonomy (the
    * insertion-order-sensitive chain, mirrored verbatim in the
    * oracle like the super-category precedent). Integers end to end.
    * Scale note: the three ntiles are GLOBAL rank windows — at
    * billions of users the distributed [[graft.ext.GlobalRank]]
    * machinery (q_ntile_bins) replaces the single-partition sort;
    * the quintile CONTRACT is unchanged. */
  private def rfmSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val anchor = p.agg(max($"day").as("anchor"))
    val rfm = p.crossJoin(broadcast(anchor))
      .groupBy($"user_id")
      .agg(datediff(first($"anchor"), max($"day")).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum($"cents").as("monetary_cents"))
    // Three ntile(5)s over ALL purchasing users were three
    // unpartitioned windows (single-task sorts) — each now rides the
    // distributed GlobalRank + ntileFromRn shape (bit-exact to SQL
    // ntile; desc key negated for the range-partition fast path).
    val n = rfm.agg(count(lit(1)).as("n_users"))
    val G = graft.ext.GlobalRank
    def scoreOf(df: DataFrame, key: org.apache.spark.sql.Column,
        out: String): DataFrame =
      G.withRowNumber(df, Seq(key, $"user_id"), "_rn")
        .withColumn(out, G.ntileFromRn($"_rn", $"n_users", 5))
        .drop("_rn")
    val scored0 = rfm.crossJoin(broadcast(n))
      .withColumn("negrec", -$"recency_days")
    val scored = scoreOf(scoreOf(scoreOf(scored0,
        $"negrec", "r_score"),
        $"frequency", "f_score"),
        $"monetary_cents", "m_score")
      .drop("negrec", "n_users")
    scored
      .withColumn("segment",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4,
          "champion")
          .when($"f_score" >= 4, "loyal")
          .when($"m_score" >= 4, "big_spender")
          .when($"r_score" <= 2 && $"f_score" >= 3, "at_risk")
          .when($"r_score" <= 2, "hibernating")
          .otherwise("regular"))
  }

  /** Daily OHLC bars — the candlestick rollup every metrics store
    * serves: per (event_type, day), open = value of the FIRST event,
    * close = the LAST, high/low = extremes, volume = count, all in
    * exact cents. First/last resolve through ordered-struct min/max
    * with the event_id tiebreak (the argmax idiom — never first()/
    * last(), whose result depends on partition arrival order). One
    * map-side-combinable aggregate; no window, no sort. */
  /** Peak concurrency by sweep line — "how many users were active AT
    * ONCE", the capacity question per-bucket counts can't answer
    * (two users in the same hour may never overlap): each (user, day)
    * activity interval [min_ts, max_ts] emits +1 at its start and −1
    * just after its end, deltas collapse per distinct microsecond
    * (map-side combinable), and the running concurrency is a
    * DISTRIBUTED prefix sum over the distinct-timestamp grid via
    * [[graft.ext.GlobalRank.withPrefixSum]] — a genuinely row-scaled
    * frame that would otherwise be exactly the unpartitioned-window
    * scale-killer PlanAuditSpec bans. Peak per day is then one
    * bounded rollup. Exact integers end to end. */
  private def concurrencyPeak(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val iv = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day"),
        unix_micros($"ts").as("us"))
      .groupBy($"user_id", $"day")
      .agg(min($"us").as("lo"), max($"us").as("hi"))
    val deltas = iv.select($"lo".as("us"), lit(1L).as("delta"))
      .unionAll(iv.select(($"hi" + 1L).as("us"), lit(-1L).as("delta")))
      .groupBy($"us").agg(sum($"delta").as("delta"))
    val running = graft.ext.GlobalRank
      .withPrefixSum(deltas, Seq($"us"), $"delta", "conc")
    val starts = iv.groupBy($"day")
      .agg(count(lit(1)).as("n_intervals"))
    running
      .select(to_date(timestamp_micros($"us")).as("day"), $"conc")
      .groupBy($"day").agg(max($"conc").as("peak_concurrent"))
      .join(starts, Seq("day"), "right")
      .select($"day", coalesce($"peak_concurrent", lit(0L))
        .as("peak_concurrent"), $"n_intervals")
  }

  /** Sliding-window DISTINCT users — exact "7-day active users per
    * day", the classic hard operator (a distinct inside a sliding
    * frame can't be window-aggregated: COUNT(DISTINCT) OVER RANGE is
    * unsupported in Spark, and sketches trade exactness). Exact
    * distributed form: each (user, active day) covers the window-end
    * days [day, day+6]; per user those cover-intervals MERGE
    * (gaps-and-islands, user-partitioned window) so one user never
    * counts twice; merged intervals become +1/−1 deltas on the
    * distinct-day grid, and the running count is one cumulative
    * window over that CALENDAR-bounded grid (whitelisted — the
    * conversion_hazard risk-grid argument: the frame walks days,
    * never users or events). Emits the change-point days (the grid)
    * with the exact 7-day distinct count in force from that day. */
  private def slidingDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val wUser = W.partitionBy($"user_id").orderBy($"day".asc)
    val active = Tables.events(s, d)
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .distinct()
    val islands = active
      .withColumn("newi",
        when($"day" > coalesce(lag($"day", 1).over(wUser),
          lit(Long.MinValue)) + 6, 1L).otherwise(0L))
      .withColumn("grp", sum($"newi").over(
        wUser.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy($"user_id", $"grp")
      .agg(min($"day").as("st"), (max($"day") + 6).as("en"))
    val deltas = islands.select($"st".as("day"), lit(1L).as("delta"))
      .unionAll(islands.select(($"en" + 1).as("day"),
        lit(-1L).as("delta")))
      .groupBy($"day").agg(sum($"delta").as("delta"))
    deltas
      .withColumn("active_7d", sum($"delta").over(W.orderBy($"day".asc)
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .select($"day".as("dayn"), $"active_7d")
  }

  /** Time-WEIGHTED average value per series (TWAP) — the sampling-
    * rate-proof mean [[dailyOhlc]]'s volume-weighted family lacks: a
    * burst of identical readings must not move it. Each observation
    * holds from its timestamp to the NEXT one (one lead window per
    * type, ties broken on event_id — total order, deterministic);
    * twap_cents = Σ centsᵢ·gapᵢ div span, folded in decimal(38,0)
    * (cents × µs-gap products pass int64 at ~1e19 µs·cents — wraps a
    * year-long series of large values, the cross-corr lesson), and
    * the output quotient provably fits BIGINT (it is a weighted mean
    * of cents). Shape: one partitioned lead window + one rollup per
    * type; sentinel −1 for a zero-length span. */
  private def twapByType(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"us".asc, $"event_id".asc)
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("nxt", lead($"us", 1).over(W))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        (max($"us") - min($"us")).as("span_us"),
        sum(when($"nxt".isNotNull,
          expr("cast(cents as decimal(38,0)) * (nxt - us)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("num"))
      .select($"event_type", $"n_events", $"span_us",
        when($"span_us" > 0,
          expr("cast(num div span_us as bigint)"))
          .otherwise(lit(-1L)).as("twap_cents"))
  }

  private def dailyOhlc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        unix_micros($"ts").as("us"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(
        min(struct($"us", $"event_id", $"cents")).getField("cents")
          .as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(struct($"us", $"event_id", $"cents")).getField("cents")
          .as("close_cents"),
        count(lit(1)).as("volume"))
  }

  /** User activity streaks — the gaps-and-islands rollup behind
    * "7-day streak" product mechanics: per user, consecutive active
    * CALENDAR days group into islands via the classic day − rank
    * anchor (consecutive days share an anchor; any gap shifts it),
    * then per user the longest streak, the island count, and the
    * total active days. Distinct from q_sessionize (event-time gaps)
    * and q_rolling_active (calendar windows): islands are exact
    * runs. Shape: per-user day-distinct rollup, one rank window on
    * (user, day) — calendar-bounded rows per user at any volume. */
  private def userStreaks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"day".asc)
    Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .withColumn("rn", row_number().over(W))
      .withColumn("anchor", date_sub($"day", $"rn"))
      .groupBy($"user_id", $"anchor")
      .agg(count(lit(1)).as("streak_len"))
      .groupBy($"user_id")
      .agg(max($"streak_len").as("longest_streak"),
        count(lit(1)).as("n_islands"),
        sum($"streak_len").as("active_days"))
  }

  /** Duplicate-charge detector — the first fraud/billing rule every
    * payments pipeline ships: pairs of purchases by the SAME user at
    * the SAME whole-dollar amount within 24 hours (exact-cents
    * equality is vacuous on continuous amounts — the dollar band is
    * the practical dedupe key). A self-join banded by (user, dollar)
    * keys — so the shuffle carries candidate groups, never a
    * time-range cross product — then the µs-integer window test;
    * pair order pinned (earlier id first). Each pair is emitted once
    * with its gap for triage. */
  private def doubleCharge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("dollars", expr("cents div 100"))
    p.as("a").join(p.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.dollars") === col("b.dollars") &&
          col("a.event_id") < col("b.event_id"))
      .filter(abs(col("a.us") - col("b.us")) <= 86400000000L)
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("first_id"),
        col("b.event_id").as("second_id"),
        col("a.cents").as("cents"),
        abs(col("a.us") - col("b.us")).as("gap_us"))
  }

  /** Velocity flags — the rate-limit rule: users whose purchase count
    * inside ANY trailing 1-hour window reaches 3. A RANGE window over
    * epoch-µs per user (events within the window are counted by
    * VALUE distance, not row count — the point of range frames), max
    * over the series, flag at the threshold. Exact integers; the
    * window partitions per user. */
  private def velocityFlags(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us".asc)
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("us"))
      .withColumn("in_hour", count(lit(1)).over(W))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        max($"in_hour").as("max_per_hour"))
      .withColumn("flagged", $"max_per_hour" >= 3L)
  }

  /** Median time-to-convert per funnel step — the latency companion
    * of [[eventFunnel]] (which only counts): per user the earliest
    * ordered chain view→click→purchase gives step gaps in exact
    * epoch-µs; each step's LOWER MEDIAN is the exact order statistic
    * at rank ⌈n/2⌉ over a deterministic (gap, user) total order —
    * never an interpolated percentile, so the cell is
    * engine-identical by construction. Output also carries p90 (rank
    * ⌈9n/10⌉, the same integer-ceiling discipline as q_gpd_tail).
    * Shape: three per-user min rollups, a rank window on the
    * |users|-row gap table. */
  private def funnelLatency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val s1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"us" >= $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"), min($"t1").as("t1"))
    val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"us" >= $"t2")
      .groupBy($"user_id")
      .agg(min($"us").as("t3"), min($"t1").as("t1"), min($"t2").as("t2"))
    // localCheckpoint: each stats() leg consumes `gaps` three ways
    // (count, GlobalRank's approxQuantile pass, the rank shuffle), so
    // the unmaterialized 3-stage funnel join chain re-ran ~6× per
    // query (r17; measured 3.50 → 2.52 s at the sf0.1 verify config
    // vs the r16 stamp). |gaps| = fully-converted users — tiny.
    val gaps = s3.select($"user_id",
        ($"t2" - $"t1").as("view_to_click_us"),
        ($"t3" - $"t2").as("click_to_buy_us"))
      .localCheckpoint(eager = false)
    // rank + total count over ALL converted users: distributed
    // GlobalRank row number plus a broadcast scalar count — the
    // original unpartitioned row_number/count windows single-task
    // sorted (and single-task held) the whole gap table
    def stats(col0: String, tag: String) = {
      val one = gaps.select(
        org.apache.spark.sql.functions.col(col0).as("gap"), $"user_id")
      val tot = one.agg(count(lit(1)).as("n"))
      graft.ext.GlobalRank
        .withRowNumber(one, Seq($"gap", $"user_id"), "r")
        .crossJoin(broadcast(tot))
        .filter($"r" === expr("(n + 1) div 2") ||
          $"r" === expr("(9 * n + 9) div 10"))
        .groupBy($"n")
        .agg(min(when($"r" === expr("(n + 1) div 2"), $"gap"))
            .as("median_us"),
          min(when($"r" === expr("(9 * n + 9) div 10"), $"gap"))
            .as("p90_us"))
        .select(lit(tag).as("step"), $"n".as("n_converted"),
          $"median_us", $"p90_us")
    }
    stats("view_to_click_us", "1_view_to_click")
      .unionByName(stats("click_to_buy_us", "2_click_to_buy"))
  }

  /** Seasonal percentile envelope — the "normal range" band an
    * on-call dashboard draws: per (event_type, day-of-week), the
    * exact p25/p50/p75 order statistics of daily revenue at
    * integer-ceiling ranks over a deterministic (cents, day) total
    * order (the q_gpd_tail/q_funnel_latency discipline — never an
    * interpolated percentile). Today's value outside its weekday
    * band is the alert. Shape: daily rollup, one rank window per
    * (type, dow) partition over calendar-bounded rows. */
  private def weekdayEnvelope(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"dow")
      .orderBy($"cents".asc, $"day".asc)
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
      .withColumn("dow", dayofweek($"day").cast("long"))
      .withColumn("r", row_number().over(W).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type", $"dow")))
      .filter($"r" === expr("(n + 3) div 4") ||
        $"r" === expr("(n + 1) div 2") ||
        $"r" === expr("(3 * n + 3) div 4"))
      .groupBy($"event_type", $"dow")
      .agg(max($"n").as("n_days"),
        min(when($"r" === expr("(n + 3) div 4"), $"cents")).as("p25"),
        min(when($"r" === expr("(n + 1) div 2"), $"cents")).as("p50"),
        min(when($"r" === expr("(3 * n + 3) div 4"), $"cents"))
          .as("p75"))
  }

  /** New-vs-returning growth accounting — the weekly purchaser mix
    * every growth review opens with: a purchaser is NEW in the week
    * of their first-ever purchase and RETURNING in any later active
    * week. One first-purchase rollup + one distinct (user, week)
    * activity table, both combinable; exact counts. */
  private def newVsReturning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        date_trunc("week", $"ts").cast("date").as("week"))
    val first = p.groupBy($"user_id").agg(min($"week").as("first_week"))
    p.distinct().join(first, "user_id")
      .groupBy($"week")
      .agg(
        sum(when($"week" === $"first_week", 1L).otherwise(0L))
          .as("n_new"),
        sum(when($"week" =!= $"first_week", 1L).otherwise(0L))
          .as("n_returning"))
      .withColumn("returning_ppm", expr(
        "n_returning * 1000000 div (n_new + n_returning)"))
  }

  /** Conversion deadline (µs) for [[windowFunnel]]: 24 hours. */
  val FunnelWindowUs = 86400000000L

  /** Time-BOUNDED funnel (ClickHouse windowFunnel semantics) — the
    * deadline-aware upgrade of [[eventFunnel]], which only orders
    * steps: here view→click→purchase must ALL land within
    * [[FunnelWindowUs]] of the anchoring view, and a user's level is
    * the best over EVERY view anchor, not just the earliest (a user
    * whose first view went stale but who converted off a later view
    * still counts — the unbounded funnel can't express that).
    * Timestamps compare as epoch-µs BIGINTs (no interval/timezone
    * arithmetic to diverge on). Greedy-min per step is exact for
    * level counting: taking the EARLIEST qualifying click maximizes
    * the residual deadline for the purchase. Shape: per-user equi
    * joins (shuffle keyed on user, map-side combinable min per
    * anchor); per-user event counts bound the anchor×step fan, the
    * same contract as q_sessionize. */
  private def windowFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val anchors = ev.filter($"event_type" === "view")
      .select($"user_id", $"us".as("v_us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"us".as("c_us"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"us".as("p_us"))
    // conditional-min keeps anchors whose user HAS later-step events
    // but none qualifying (they stay at the lower level; a
    // join-then-filter would silently drop them)
    val c = anchors.join(clicks, Seq("user_id"), "left")
      .groupBy($"user_id", $"v_us")
      .agg(min(when(
        $"c_us" > $"v_us" && $"c_us" <= $"v_us" + FunnelWindowUs,
        $"c_us")).as("c_us"))
    val p = c.join(purchases, Seq("user_id"), "left")
      .groupBy($"user_id", $"v_us", $"c_us")
      .agg(min(when($"c_us".isNotNull &&
        $"p_us" > $"c_us" && $"p_us" <= $"v_us" + FunnelWindowUs,
        $"p_us")).as("p_us"))
    p.select($"user_id",
        (lit(1L) + when($"c_us".isNotNull, 1L).otherwise(0L)
          + when($"p_us".isNotNull, 1L).otherwise(0L)).as("level"))
      .groupBy($"user_id").agg(max($"level").as("best_level"))
      .groupBy($"best_level")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Weekly cohort retention: users grouped by signup week, counted as
    * retained in each later week they have ANY event. Both sides are
    * user-level pre-aggregates before the join — the events table never
    * joins raw-to-raw, so the shuffle carries (user, week) rows, not
    * events. */
  private def cohortRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).cast("date").as("c_week"))
    val activity = ev
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("a_week"))
      .distinct()
    activity.join(cohort, "user_id")
      .filter($"a_week" >= $"c_week")
      .groupBy($"c_week",
        (datediff($"a_week", $"c_week") / 7).cast("long").as("week_n"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format($"c_week", "yyyy-MM-dd").as("cohort_week"),
        $"week_n", $"n_users")
  }

  /** Cohort LTV triangle — [[cohortRetention]]'s revenue twin: per
    * signup-week cohort, PURCHASE revenue by cohort age plus the
    * running cumulative (the LTV curve growth teams read payback
    * periods off). Same shape as retention: one broadcast-joinable
    * cohort table keyed by user, a map-side (cohort, age) rollup, and
    * ONE window per cohort whose frame walks AGES (≤ weeks-of-history
    * rows), never purchases. Cents exact; cum via BIGINT window sum;
    * ltv_per_user_e2 is one integer division against the cohort size. */
  private def cohortLtv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).cast("date").as("c_week"))
    val sizes = cohort.groupBy($"c_week")
      .agg(count(lit(1)).as("cohort_users"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_week").orderBy($"week_n".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    ev.filter($"event_type" === "purchase")
      .select($"user_id",
        date_trunc("week", $"ts").cast("date").as("a_week"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .join(cohort, "user_id")
      .filter($"a_week" >= $"c_week")
      .groupBy($"c_week",
        (datediff($"a_week", $"c_week") / 7).cast("long").as("week_n"))
      .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("cents"))
      .withColumn("cum_cents", sum($"cents").over(w))
      .join(broadcast(sizes), "c_week")
      .select(date_format($"c_week", "yyyy-MM-dd").as("cohort_week"),
        $"week_n", $"n_purchases", $"cents", $"cum_cents",
        $"cohort_users",
        expr("cum_cents div cohort_users").as("ltv_per_user_cents"))
  }

  /** Rolling 7-day active users per day — the WAU curve. COUNT
    * DISTINCT over a sliding window can't ride a window frame (frames
    * don't dedup), so: dedup to (day, user) once, band-join the tiny
    * day dimension against it (each day sees its trailing week), and
    * count distinct users per anchor day. The fact side is the
    * DEDUPED (day, user) set — at 100 TB that's the small aggregate of
    * the event stream, and the 7× fan-out happens after dedup, never
    * on raw events. */
  private def rollingActive(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dayUsers = Tables.events(s, d)
      .select($"ts".cast("date").as("a_day"), $"user_id")
      .distinct()
    val days = dayUsers.select($"a_day".as("day")).distinct()
    days.join(dayUsers,
        $"a_day" <= $"day" && $"a_day" >= date_sub($"day", 6))
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"))
      .select(date_format($"day", "yyyy-MM-dd").as("day"), $"wau")
  }

  /** ANSI-safe `try_*` function surface — the error-absorbing scalar
    * family (try_divide / try_cast / try_element_at) that keeps a
    * 100 TB batch job alive when one row divides by zero or carries a
    * malformed value: the failure becomes a NULL the pipeline can
    * count and quarantine instead of a task-killing exception (the
    * row-level cousin of q_json_quarantine's file-level policy). The
    * rollup counts each absorber's null volume per divisor class and
    * pins min/max of the safe ratio — bag-of-nulls accounting is
    * exact integers; no double ever sums. */
  private def tryFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        ($"o_custkey" % 5).as("div5"))
      .withColumn("safe_ratio", expr("try_divide(cents, div5)"))
      .withColumn("prio_num",
        expr("try_cast(o_orderpriority AS INT)"))
      .withColumn("oob", expr(
        "try_element_at(array(10L, 20L, 30L), CAST(div5 AS INT) + 2)"))
      .groupBy($"div5")
      .agg(count(lit(1)).as("n"),
        sum(when($"safe_ratio".isNull, 1L).otherwise(0L))
          .as("n_div_null"),
        sum(when($"prio_num".isNull, 1L).otherwise(0L))
          .as("n_prio_null"),
        sum(when($"oob".isNull, 1L).otherwise(0L)).as("n_oob_null"),
        round(min($"safe_ratio"), 4).as("min_ratio"),
        round(max($"safe_ratio"), 4).as("max_ratio"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_try_funcs", tryFuncs, Some("""
      WITH o AS (SELECT o_orderkey, o_orderpriority,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        o_custkey % 5 AS div5
                 FROM orders),
      t AS (SELECT *,
                   cents / nullif(div5, 0) AS safe_ratio,
                   TRY_CAST(o_orderpriority AS INT) AS prio_num,
                   ([10, 20, 30])[div5 + 2] AS oob
            FROM o)
      SELECT CAST(div5 AS BIGINT) AS div5,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN safe_ratio IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_div_null,
             CAST(sum(CASE WHEN prio_num IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_prio_null,
             CAST(sum(CASE WHEN oob IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_oob_null,
             round(min(safe_ratio), 4) AS min_ratio,
             round(max(safe_ratio), 4) AS max_ratio
      FROM t GROUP BY 1""")),
    Q("q_rolling_active", rollingActive, Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS a_day, user_id
                  FROM events),
      days AS (SELECT DISTINCT a_day AS day FROM du)
      SELECT strftime(d.day, '%Y-%m-%d') AS day,
             CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days d JOIN du u
        ON u.a_day <= d.day AND u.a_day >= d.day - 6
      GROUP BY 1""")),

    Q("q_cohort_retention", cohortRetention, Some("""
      WITH cohort AS (SELECT user_id,
                             CAST(date_trunc('week', min(ts)) AS DATE)
                               AS c_week
                      FROM events WHERE event_type = 'signup'
                      GROUP BY 1),
      act AS (SELECT DISTINCT user_id,
                     CAST(date_trunc('week', ts) AS DATE) AS a_week
              FROM events)
      SELECT strftime(c.c_week, '%Y-%m-%d') AS cohort_week,
             CAST((a.a_week - c.c_week) // 7 AS BIGINT) AS week_n,
             CAST(count(*) AS BIGINT) AS n_users
      FROM act a JOIN cohort c ON a.user_id = c.user_id
      WHERE a.a_week >= c.c_week
      GROUP BY 1, 2""")),

    Q("q_cohort_ltv", cohortLtv, Some("""
      WITH cohort AS (SELECT user_id,
                             CAST(date_trunc('week', min(ts)) AS DATE)
                               AS c_week
                      FROM events WHERE event_type = 'signup'
                      GROUP BY 1),
      sizes AS (SELECT c_week, CAST(count(*) AS BIGINT)
                  AS cohort_users
                FROM cohort GROUP BY 1),
      p AS (SELECT c.c_week,
                   CAST((CAST(date_trunc('week', e.ts) AS DATE)
                     - c.c_week) // 7 AS BIGINT) AS week_n,
                   CAST(CAST(e.value AS DECIMAL(18,2)) * 100
                     AS BIGINT) AS cents
            FROM events e JOIN cohort c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
              AND CAST(date_trunc('week', e.ts) AS DATE) >= c.c_week),
      g AS (SELECT c_week, week_n,
                   CAST(count(*) AS BIGINT) AS n_purchases,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM p GROUP BY 1, 2),
      cum AS (SELECT *,
                     CAST(sum(cents) OVER (PARTITION BY c_week
                       ORDER BY week_n ASC ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS cum_cents
              FROM g)
      SELECT strftime(cum.c_week, '%Y-%m-%d') AS cohort_week, week_n,
             n_purchases, cents, cum_cents, cohort_users,
             CAST(cum_cents // cohort_users AS BIGINT)
               AS ltv_per_user_cents
      FROM cum JOIN sizes ON cum.c_week = sizes.c_week""")),

    Q("q_event_funnel", eventFunnel, Some("""
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
      SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
      UNION ALL
      SELECT '2_click_after_view', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM s3""")),
    Q("q_weekday_envelope", weekdayEnvelope, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      dw AS (SELECT *, CAST(dayofweek(day) + 1 AS BIGINT) AS dow
             FROM daily),
      r AS (SELECT *,
                   CAST(row_number() OVER (PARTITION BY event_type, dow
                     ORDER BY cents ASC, day ASC) AS BIGINT) AS r,
                   CAST(count(*) OVER (PARTITION BY event_type, dow)
                     AS BIGINT) AS n
            FROM dw)
      SELECT event_type, dow, max(n) AS n_days,
             min(CASE WHEN r = (n + 3) // 4 THEN cents END) AS p25,
             min(CASE WHEN r = (n + 1) // 2 THEN cents END) AS p50,
             min(CASE WHEN r = (3 * n + 3) // 4 THEN cents END) AS p75
      FROM r
      WHERE r = (n + 3) // 4 OR r = (n + 1) // 2
         OR r = (3 * n + 3) // 4
      GROUP BY 1, 2""")),

    Q("q_new_vs_returning", newVsReturning, Some("""
      WITH p AS (SELECT user_id,
                        CAST(date_trunc('week', ts) AS DATE) AS week
                 FROM events WHERE event_type = 'purchase'),
      first AS (SELECT user_id, min(week) AS first_week FROM p
                GROUP BY 1),
      a AS (SELECT DISTINCT p.user_id, p.week FROM p)
      SELECT week,
             CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN week <> first_week THEN 1 ELSE 0 END)
               AS BIGINT) AS n_returning,
             CAST(sum(CASE WHEN week <> first_week THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS returning_ppm
      FROM a JOIN first ON a.user_id = first.user_id
      GROUP BY 1""")),

    Q("q_funnel_latency", funnelLatency, Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                  FROM events),
      s1 AS (SELECT user_id, min(us) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.us) AS t2, min(s1.t1) AS t1
             FROM ev e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.us >= s1.t1
             GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.us) AS t3, min(s2.t1) AS t1,
                    min(s2.t2) AS t2
             FROM ev e JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.us >= s2.t2
             GROUP BY 1),
      gaps AS (SELECT user_id, t2 - t1 AS g1, t3 - t2 AS g2 FROM s3),
      r1 AS (SELECT g1 AS gap, user_id,
                    CAST(row_number() OVER (ORDER BY g1 ASC,
                      user_id ASC) AS BIGINT) AS r,
                    CAST(count(*) OVER () AS BIGINT) AS n
             FROM gaps),
      r2 AS (SELECT g2 AS gap, user_id,
                    CAST(row_number() OVER (ORDER BY g2 ASC,
                      user_id ASC) AS BIGINT) AS r,
                    CAST(count(*) OVER () AS BIGINT) AS n
             FROM gaps),
      a1 AS (SELECT '1_view_to_click' AS step, n AS n_converted,
                    min(CASE WHEN r = (n + 1) // 2 THEN gap END)
                      AS median_us,
                    min(CASE WHEN r = (9 * n + 9) // 10 THEN gap END)
                      AS p90_us
             FROM r1 WHERE r = (n + 1) // 2 OR r = (9 * n + 9) // 10
             GROUP BY 2),
      a2 AS (SELECT '2_click_to_buy', n,
                    min(CASE WHEN r = (n + 1) // 2 THEN gap END),
                    min(CASE WHEN r = (9 * n + 9) // 10 THEN gap END)
             FROM r2 WHERE r = (n + 1) // 2 OR r = (9 * n + 9) // 10
             GROUP BY 2)
      SELECT * FROM a1 UNION ALL SELECT * FROM a2""")),

    Q("q_double_charge", doubleCharge, Some("""
      WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events
                 WHERE event_type = 'purchase' AND value IS NOT NULL)
      SELECT a.user_id, a.event_id AS first_id, b.event_id AS second_id,
             a.cents, abs(a.us - b.us) AS gap_us
      FROM p a JOIN p b
        ON a.user_id = b.user_id AND a.cents // 100 = b.cents // 100
       AND a.event_id < b.event_id
      WHERE abs(a.us - b.us) <= 86400000000""")),

    Q("q_velocity_flags", velocityFlags, Some("""
      WITH p AS (SELECT user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'purchase'),
      w AS (SELECT user_id,
                   count(*) OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 3600000000 PRECEDING
                       AND CURRENT ROW) AS in_hour
            FROM p)
      SELECT user_id, count(*) AS n_purchases,
             CAST(max(in_hour) AS BIGINT) AS max_per_hour,
             max(in_hour) >= 3 AS flagged
      FROM w GROUP BY 1""")),

    Q("q_concurrency_peak", concurrencyPeak, Some("""
      WITH iv AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         min(epoch_us(ts)) AS lo,
                         max(epoch_us(ts)) AS hi
                  FROM events GROUP BY 1, 2),
      dl AS (SELECT us, CAST(sum(delta) AS BIGINT) AS delta FROM (
               SELECT lo AS us, 1 AS delta FROM iv
               UNION ALL SELECT hi + 1, -1 FROM iv) GROUP BY 1),
      run AS (SELECT us, sum(delta) OVER (ORDER BY us) AS conc
              FROM dl),
      pk AS (SELECT CAST(make_timestamp(us) AS DATE) AS day,
                    CAST(max(conc) AS BIGINT) AS peak_concurrent
             FROM run GROUP BY 1),
      st AS (SELECT day, CAST(count(*) AS BIGINT) AS n_intervals
             FROM iv GROUP BY 1)
      SELECT st.day,
             CAST(coalesce(pk.peak_concurrent, 0) AS BIGINT)
               AS peak_concurrent,
             st.n_intervals
      FROM st LEFT JOIN pk USING (day)""")),

    Q("q_sliding_distinct", slidingDistinct, Some("""
      WITH active AS (SELECT DISTINCT user_id,
                        CAST(datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) AS BIGINT) AS day
                      FROM events),
      isl AS (SELECT *, CASE WHEN day > coalesce(lag(day) OVER (
                  PARTITION BY user_id ORDER BY day ASC),
                  -9223372036854775807) + 6 THEN 1 ELSE 0 END AS newi
              FROM active),
      grp AS (SELECT *, sum(newi) OVER (PARTITION BY user_id
                ORDER BY day ASC ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS grp
              FROM isl),
      iv AS (SELECT user_id, grp, min(day) AS st, max(day) + 6 AS en
             FROM grp GROUP BY 1, 2),
      deltas AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta
                 FROM (SELECT st AS day, 1 AS delta FROM iv
                       UNION ALL SELECT en + 1, -1 FROM iv)
                 GROUP BY 1)
      SELECT day AS dayn,
             CAST(sum(delta) OVER (ORDER BY day ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS active_7d
      FROM deltas""")),

    Q("q_twap", twapByType, Some("""
      WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      l AS (SELECT event_type, us, cents,
                   lead(us) OVER (PARTITION BY event_type
                                  ORDER BY us ASC, event_id ASC) AS nxt
            FROM e),
      a AS (SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(us) - min(us) AS BIGINT) AS span_us,
                   sum(CASE WHEN nxt IS NOT NULL
                       THEN CAST(cents AS HUGEINT) * (nxt - us)
                       ELSE 0 END) AS num
            FROM l GROUP BY 1)
      SELECT event_type, n_events, span_us,
             CAST(CASE WHEN span_us > 0 THEN num // span_us
                  ELSE -1 END AS BIGINT) AS twap_cents
      FROM a""")),

    Q("q_daily_ohlc", dailyOhlc, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        epoch_us(ts) AS us, event_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      r AS (SELECT *,
                   row_number() OVER (PARTITION BY event_type, day
                     ORDER BY us ASC, event_id ASC, cents ASC) AS rf,
                   row_number() OVER (PARTITION BY event_type, day
                     ORDER BY us DESC, event_id DESC, cents DESC) AS rl
            FROM e)
      SELECT event_type, day,
             CAST(max(CASE WHEN rf = 1 THEN cents END) AS BIGINT)
               AS open_cents,
             max(cents) AS high_cents,
             min(cents) AS low_cents,
             CAST(max(CASE WHEN rl = 1 THEN cents END) AS BIGINT)
               AS close_cents,
             count(*) AS volume
      FROM r GROUP BY 1, 2""")),

    Q("q_user_streaks", userStreaks, Some("""
      WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                  FROM events),
      rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY day ASC) AS rn
             FROM du),
      isl AS (SELECT user_id, day - CAST(rn AS INTEGER) AS anchor,
                     count(*) AS streak_len
              FROM rk GROUP BY 1, 2)
      SELECT user_id,
             CAST(max(streak_len) AS BIGINT) AS longest_streak,
             count(*) AS n_islands,
             CAST(sum(streak_len) AS BIGINT) AS active_days
      FROM isl GROUP BY 1""")),

    Q("q_rfm_segments", rfmSegments, Some("""
      WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events
                 WHERE event_type = 'purchase' AND value IS NOT NULL),
      anchor AS (SELECT max(day) AS anchor FROM p),
      rfm AS (SELECT user_id,
                     CAST(date_diff('day', max(day), max(anchor))
                       AS BIGINT) AS recency_days,
                     CAST(count(*) AS BIGINT) AS frequency,
                     CAST(sum(cents) AS BIGINT) AS monetary_cents
              FROM p, anchor GROUP BY 1),
      scored AS (SELECT *,
                   CAST(ntile(5) OVER (ORDER BY recency_days DESC,
                     user_id ASC) AS BIGINT) AS r_score,
                   CAST(ntile(5) OVER (ORDER BY frequency ASC,
                     user_id ASC) AS BIGINT) AS f_score,
                   CAST(ntile(5) OVER (ORDER BY monetary_cents ASC,
                     user_id ASC) AS BIGINT) AS m_score
                 FROM rfm)
      SELECT *,
             CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                    THEN 'champion'
                  WHEN f_score >= 4 THEN 'loyal'
                  WHEN m_score >= 4 THEN 'big_spender'
                  WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                  WHEN r_score <= 2 THEN 'hibernating'
                  ELSE 'regular' END AS segment
      FROM scored""")),

    Q("q_window_funnel", windowFunnel, Some(s"""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                  FROM events),
      anchors AS (SELECT user_id, us AS v_us FROM ev
                  WHERE event_type = 'view'),
      clicks AS (SELECT user_id, us AS c_us FROM ev
                 WHERE event_type = 'click'),
      purchases AS (SELECT user_id, us AS p_us FROM ev
                    WHERE event_type = 'purchase'),
      c AS (SELECT a.user_id, a.v_us,
                   min(CASE WHEN k.c_us > a.v_us
                            AND k.c_us <= a.v_us + $FunnelWindowUs
                            THEN k.c_us END) AS c_us
            FROM anchors a LEFT JOIN clicks k ON k.user_id = a.user_id
            GROUP BY 1, 2),
      p AS (SELECT c.user_id, c.v_us, c.c_us,
                   min(CASE WHEN c.c_us IS NOT NULL
                            AND q.p_us > c.c_us
                            AND q.p_us <= c.v_us + $FunnelWindowUs
                            THEN q.p_us END) AS p_us
            FROM c LEFT JOIN purchases q ON q.user_id = c.user_id
            GROUP BY 1, 2, 3),
      lvl AS (SELECT user_id,
                     max(1 + CASE WHEN c_us IS NOT NULL THEN 1 ELSE 0 END
                           + CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END)
                       AS best_level
              FROM p GROUP BY 1)
      SELECT CAST(best_level AS BIGINT) AS best_level,
             count(*) AS n_users
      FROM lvl GROUP BY 1""")),
    Q("q_sessionize", sessionize, Some("""
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts) > INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
             strftime(max(ts) + INTERVAL 10 MINUTE,
               '%Y-%m-%d %H:%M:%S') AS s_end,
             user_id, count(*) AS n_events,
             round(sum(value), 2) AS session_value
      FROM sessions GROUP BY user_id, sid"""), headline = true),

    Q("q_date_extract", dateExtract, Some("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(month(o_orderdate) AS BIGINT) AS o_month,
             count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1, 2""")),

    Q("q_to_date_dow", toDateDow, Some("""
      SELECT dayname(l_shipdate) AS dow, count(*) AS cnt,
             min(CAST(l_shipdate AS DATE)) AS first_date
      FROM lineitem GROUP BY 1""")),

    Q("q_case_chain", caseChain, Some("""
      SELECT CASE WHEN o_totalprice <= 50000.0 THEN 'low'
                  WHEN o_totalprice <= 150000.0 THEN 'mid'
                  ELSE 'high' END AS bucket,
             count(*) AS cnt, round(avg(o_totalprice), 2) AS avg_price
      FROM orders GROUP BY 1""")),

    Q("q_map_normalize", mapNormalize, Some("""
      SELECT r_name,
             CASE WHEN r_name = 'AMERICA' THEN 'The Americas'
                  WHEN r_name = 'ASIA' THEN 'Asia-Pacific'
                  WHEN r_name = 'EUROPE' THEN 'Europe'
                  ELSE r_name END AS r_full
      FROM region""")),

    Q("q_super_category", superCategory, Some("""
      SELECT CASE
               WHEN p_type IS NULL THEN 'other'
               WHEN contains(p_type, 'BURNISHED') THEN 'polished'
               WHEN contains(p_type, 'ECONOMY') THEN 'economy'
               WHEN contains(p_type, 'STANDARD') THEN 'standard'
               WHEN contains(p_type, 'PROMO') THEN 'promotional'
               WHEN contains(p_type, 'SMALL') THEN 'compact'
               WHEN contains(p_type, 'MEDIUM') THEN 'midsize'
               WHEN contains(p_type, 'LARGE') THEN 'oversize'
               ELSE 'other' END AS category,
             count(*) AS cnt
      FROM part GROUP BY 1"""), headline = true),

    Q("q_super_category_native", superCategoryNative, Some("""
      SELECT CASE
               WHEN p_type IS NULL THEN 'other'
               WHEN contains(p_type, 'BURNISHED') THEN 'polished'
               WHEN contains(p_type, 'ECONOMY') THEN 'economy'
               WHEN contains(p_type, 'STANDARD') THEN 'standard'
               WHEN contains(p_type, 'PROMO') THEN 'promotional'
               WHEN contains(p_type, 'SMALL') THEN 'compact'
               WHEN contains(p_type, 'MEDIUM') THEN 'midsize'
               WHEN contains(p_type, 'LARGE') THEN 'oversize'
               ELSE 'other' END AS category,
             count(*) AS cnt
      FROM part GROUP BY 1""")),

    Q("q_string_funcs", stringFuncs, Some("""
      SELECT p_partkey,
             upper(p_brand) AS brand_u,
             lower(p_type) AS type_l,
             CAST(length(p_name) AS BIGINT) AS name_len,
             substr(p_name, 1, 5) AS name_pfx,
             concat_ws('|', p_brand, p_type) AS brand_type,
             replace(p_name, ' ', '_') AS name_us,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad
      FROM part""")),

    Q("q_split_explode", splitExplode, Some("""
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part) t
      GROUP BY word""")),

    Q("q_json_extract", jsonExtract, Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""")),

    Q("q_variant_extract", variantExtract, Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
             CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS min_k,
             CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS max_k,
             CAST(sum(CASE WHEN json_extract_string(props, '$.missing')
                    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      FROM events GROUP BY 1""")),

    Q("q_pivot_events", pivotEvents, Some("""
      SELECT user_id,
             coalesce(round(sum(value) FILTER (WHERE event_type = 'click'), 2), 0.0) AS click,
             coalesce(round(sum(value) FILTER (WHERE event_type = 'error'), 2), 0.0) AS error,
             coalesce(round(sum(value) FILTER (WHERE event_type = 'purchase'), 2), 0.0) AS purchase,
             coalesce(round(sum(value) FILTER (WHERE event_type = 'signup'), 2), 0.0) AS signup,
             coalesce(round(sum(value) FILTER (WHERE event_type = 'view'), 2), 0.0) AS view
      FROM events GROUP BY user_id""")),

    Q("q_null_drop", nullDrop, Some("""
      SELECT c_custkey, o_orderkey, o_orderstatus
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL""")),

    Q("q_null_fill", nullFill, Some("""
      SELECT c_custkey, coalesce(spent, 0.0) AS spent
      FROM customer LEFT JOIN
        (SELECT o_custkey, round(sum(o_totalprice), 2) AS spent
         FROM orders GROUP BY 1) o ON c_custkey = o_custkey""")),

    Q("q_math_funcs", mathFuncs, Some("""
      SELECT l_orderkey,
             round(abs(l_extendedprice - l_quantity * 1000.0), 2) AS absdiff,
             CAST(floor(l_extendedprice) AS BIGINT) AS flr,
             CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
             round(sqrt(l_quantity), 6) AS sq,
             round(pow(l_discount, 2), 6) AS disc2
      FROM lineitem WHERE l_linenumber = 1""")),

    Q("q_conditional_agg", conditionalAgg, Some("""
      SELECT l_returnflag,
             count(*) FILTER (WHERE l_quantity > 25) AS n_big,
             count(*) FILTER (WHERE l_quantity <= 25) AS n_small,
             round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice
                            ELSE 0.0 END), 2) AS discounted_px
      FROM lineitem GROUP BY 1""")),

    Q("q_peak_hours", peakHours, Some("""
      SELECT * FROM (
        SELECT hour, event_type, cnt,
               CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY cnt DESC, hour ASC) AS BIGINT) AS rank
        FROM (SELECT CAST(hour(ts) AS BIGINT) AS hour, event_type,
                     count(*) AS cnt
              FROM events GROUP BY 1, 2) h) r
      WHERE rank <= 3""")),

    Q("q_time_bucket", timeBucket, Some("""
      SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
             event_type, count(*) AS cnt, round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2"""))
  )
}
