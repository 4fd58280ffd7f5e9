package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second breadth batch: window frames and ranking variants,
  * statistical / percentile aggregates, ordered list aggregation,
  * higher-order array functions, date arithmetic, JSON struct parsing,
  * and union-by-name — the §2 "absent in reference, in-scope for the
  * engine" surface (SURVEY.md §2.6–§2.10).
  */
object AdvancedQueries {

  /** RANGE frame: per customer, sum of orders within the prior 90 days
    * (event-time window without a self-join). */
  private def windowRange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate"))
      .rangeBetween(-90L * 86400, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("d90_total", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey", $"d90_total")
  }

  /** Ranking battery: dense_rank / percent_rank / ntile over one
    * deterministic ordering. */
  private def windowRanks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(s, d).select(
      $"c_mktsegment", $"c_custkey",
      dense_rank().over(w).cast("long").as("drank"),
      round(percent_rank().over(w), 6).as("prank"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  /** first/last value over a bounded frame. */
  private def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      $"o_custkey", $"o_orderkey",
      first($"o_orderkey").over(w).as("first_order"),
      last($"o_orderkey").over(w).as("last_order"))
  }

  /** lead + cume_dist over the order stream. */
  private def windowLead(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(s, d).select(
      $"o_custkey", $"o_orderkey",
      lead($"o_orderkey", 1).over(w).as("next_order"),
      round(cume_dist().over(w), 6).as("cd"))
  }

  /** approx_percentile — the sketch-based scalable form of
    * q_percentiles. Accuracy 100 000: the Greenwald-Khanna summary is
    * EXACT while a group's row count stays under the head buffer
    * (50 000) and degrades gracefully to ε=1e-5 rank error beyond —
    * so at verify/bench SFs the result equals DuckDB's discrete
    * quantile (value-level oracle), while at 100 TB it is still a
    * bounded-memory mergeable sketch, not a full sort. */
  private def approxPercentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        round(percentile_approx($"o_totalprice", lit(0.5), lit(100000)), 4)
          .as("p50_approx"),
        round(percentile_approx($"o_totalprice", lit(0.99), lit(100000)), 4)
          .as("p99_approx"))
  }

  /** Statistical aggregates per group. */
  private def statsAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
        round(var_samp($"l_quantity"), 4).as("var_qty"),
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qp"),
        round(covar_samp($"l_quantity", $"l_discount"), 6).as("cov_qd"))
  }

  /** Exact interpolated percentiles (the scalable dashboards use
    * approx_percentile; exact keeps the oracle tight). */
  private def percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        round(percentile($"o_totalprice", lit(0.5)), 4).as("p50"),
        round(percentile($"o_totalprice", lit(0.9)), 4).as("p90"),
        round(percentile($"o_totalprice", lit(0.99)), 4).as("p99"))
  }

  /** Ordered list aggregation (collect_list is unordered by contract —
    * sort_array makes it deterministic; the BI string_agg pattern). */
  private def listAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, d)
      .groupBy($"n_regionkey".cast("long").as("regionkey"))
      .agg(array_join(sort_array(collect_list($"n_name")), ",")
        .as("nations"))
  }

  /** Map-typed column battery: construction (map_from_arrays), merge
    * (map_concat), key/value extraction, lookup, membership — the
    * attribute-bag shape semi-structured pipelines carry. Key/value
    * lists are flattened to joined strings: the verification harness
    * sorts output columns with pandas, which cannot order array
    * cells. */
  private def mapFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = map_from_arrays(
      array(lit("status"), lit("priority")),
      array($"o_orderstatus", $"o_orderpriority"))
    val merged = map_concat(m, map_from_arrays(
      array(lit("bucket")),
      array(when($"o_totalprice" > 150000, "high").otherwise("low"))))
    Tables.orders(s, d).select(
      $"o_orderkey",
      array_join(map_keys(m), ",").as("ks"),
      array_join(map_values(merged), ",").as("vs"),
      element_at(m, "status").as("status_val"),
      size(merged).cast("long").as("m_size"),
      map_contains_key(m, "status").as("has_status"))
  }

  /** Higher-order array functions over the embeddings: transform /
    * filter / exists / aggregate. */
  private def higherOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .select(
        $"vec_id",
        size(filter($"v", x => x > 0)).cast("long").as("n_pos"),
        exists($"v", x => x > lit(0.3)).as("has_big"),
        round(aggregate($"v", lit(0.0), (a, x) => a + abs(x)), 4)
          .as("l1_norm"),
        round(element_at(transform($"v", x => x * 2), 1), 6)
          .as("first_doubled"))
  }

  /** Array-function battery over token arrays: sort, slice, flatten,
    * zip_with, array_contains, array_position, reverse. */
  private def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d)
      .select($"doc_id",
        slice(split(lower($"text"), "\\s+"), 1, 6).as("toks"))
    base.select(
      $"doc_id",
      array_join(array_sort($"toks"), " ").as("sorted_toks"),
      array_join(reverse($"toks"), " ").as("rev_toks"),
      array_contains($"toks", "the").as("has_the"),
      array_position($"toks", "data").cast("long").as("data_pos"),
      array_join(flatten(array($"toks", array(lit("eof")))), " ")
        .as("flat"),
      array_join(zip_with($"toks", $"toks", (a, b) => concat(a, b)), " ")
        .as("doubled"))
  }

  /** Date arithmetic battery. */
  private def dateArith(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).filter($"o_orderkey" % 100 === 0).select(
      $"o_orderkey",
      to_date($"o_orderdate").as("od"),
      date_add(to_date($"o_orderdate"), 30).as("plus30"),
      add_months(to_date($"o_orderdate"), 2).as("plus2m"),
      last_day($"o_orderdate").as("eom"),
      trunc($"o_orderdate", "month").as("som"),
      quarter($"o_orderdate").cast("long").as("qtr"),
      dayofweek($"o_orderdate").cast("long").as("dow_n"))
  }

  /** from_json → struct field access (typed parse of events.props). */
  private def jsonStruct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .withColumn("p", from_json($"props",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .groupBy(($"p.k" % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"), round(avg($"value"), 4).as("avg_value"))
  }

  /** unionByName with missing columns (schema evolution append). */
  private def unionByNameQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables.customer(s, d)
      .select($"c_custkey".as("key"), $"c_name".as("name"),
        $"c_acctbal".as("bal"))
    val b = Tables.supplier(s, d)
      .select(($"s_suppkey" + 1000000L).as("key"), $"s_name".as("name"))
    a.unionByName(b.withColumn("bal", lit(null).cast("double")),
        allowMissingColumns = true)
      .select($"key", $"name", coalesce(round($"bal", 2), lit(-1.0)).as("bal"))
  }

  /** String battery #2: regexp_extract / initcap / translate /
    * reverse / repeat / instr. */
  private def stringFuncs2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d).filter($"p_partkey" <= 500).select(
      $"p_partkey",
      regexp_extract($"p_type", "^(\\w+)", 1).as("first_word"),
      initcap(lower($"p_type")).as("type_title"),
      translate($"p_brand", "#", "-").as("brand_t"),
      reverse($"p_name").as("name_rev"),
      repeat($"p_brand", 2).as("brand_x2"),
      instr($"p_type", "ED").cast("long").as("ed_pos"))
  }

  /** Equal-frequency binning via ntile — the quantile-bucket feature
    * transform (and the partition-size equalizer for export jobs).
    * The (o_totalprice, o_orderkey) order is total, so bin assignment
    * is deterministic. NOT `ntile().over(Window.orderBy(…))`: an
    * unpartitioned window plans a single-partition sort; the
    * GlobalRank primitive computes the identical bucket with range
    * partitioning + broadcast offsets (bit-exact — ntileFromRn
    * replays the SQL bucket-size rule). */
  private def ntileBins(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d).select($"o_orderkey", $"o_totalprice")
    val n = base.agg(count(lit(1)).as("n_rows"))
    graft.ext.GlobalRank
      .withRowNumber(base, Seq($"o_totalprice", $"o_orderkey"))
      .crossJoin(broadcast(n))
      .select($"o_totalprice",
        graft.ext.GlobalRank.ntileFromRn($"rn", $"n_rows", 10).as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        round(min($"o_totalprice"), 2).as("lo"),
        round(max($"o_totalprice"), 2).as("hi"))
  }

  /** Two-phase salted aggregation: group by (key, salt) first so a
    * hot key's rows spread over 16 reducers, then re-aggregate the
    * tiny partial table by key. Equal to the plain groupBy (the
    * oracle IS the plain GROUP BY) — this entry exists to keep the
    * skew-mitigation shape under the correctness gate, like
    * q_join_salted does for joins. The salt must be deterministic
    * (orderkey-derived, not rand()) or reruns re-bucket rows. */
  private def saltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partial = Tables.lineitem(s, d)
      .withColumn("salt", pmod($"l_orderkey", lit(16)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum($"l_quantity").as("q"), count(lit(1)).as("c"))
    partial.groupBy($"l_returnflag")
      .agg(round(sum($"q"), 2).as("sum_qty"), sum($"c").as("n"))
  }

  /** Distribution ranks: percent_rank + cume_dist over account
    * balance — the empirical-CDF transform behind calibration and
    * outlier screens. Total order via the custkey tie-break, which
    * also makes the closed forms exact: with no peer rows,
    * percent_rank = (rn-1)/(N-1) and cume_dist = rn/N. Computed from
    * the distributed GlobalRank row number — an unpartitioned
    * `percent_rank().over(…)` window would sort the table on one
    * task. */
  private def distRanks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.customer(s, d).select($"c_custkey", $"c_acctbal")
    val n = base.agg(count(lit(1)).as("n_rows"))
    graft.ext.GlobalRank
      .withRowNumber(base, Seq($"c_acctbal", $"c_custkey"))
      .crossJoin(broadcast(n))
      .select($"c_custkey",
        round(($"rn" - 1).cast("double") / ($"n_rows" - 1), 6)
          .as("pct_rank"),
        round($"rn".cast("double") / $"n_rows", 6).as("cdf"))
  }

  /** Equi-WIDTH histogram (q_ntile_bins is the equi-DEPTH one): bin
    * width from broadcast min/max stats, one scan + one aggregate —
    * never a sort. Same broadcast-1-row-stats shape as featureScale,
    * so the big side stays embarrassingly parallel. */
  /** Item-CF recommendation serving — the query that turns
    * q_assoc_rules' co-occurrence model into per-customer top-3
    * suggestions: score(candidate) = Σ over the customer's owned
    * parts of pair support with the candidate, owned parts excluded
    * by an anti-join, ties broken (score desc, partkey asc). All
    * scores are exact integer co-occurrence counts — no cosine
    * normalization noise. THE item-CF scale hazard is the scoring
    * fan: owned⋈pairs multiplies every owned part by its full
    * neighbor list, and the untruncated model measured 12.6 s at
    * sf0.1 (a ~50 M-row intermediate). Production item-CF truncates
    * the model to the top-[[RecNeighborCap]] neighbors per item — a
    * deterministic (support desc, partkey asc) rank on the PAIR
    * table, which bounds the scoring join at |owned|·cap rows at any
    * corpus size (measured 12.6 → 2.0 s; the cap is part of the
    * operator contract and the oracle replays it). The rank windows
    * run per item / per customer on model rows, never on facts. */
  /** Neighbor-model truncation for [[recommendTopN]]. */
  val RecNeighborCap = 20

  private def recommendTopN(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"c").orderBy($"score".desc, $"cand".asc)
    val Wn = org.apache.spark.sql.expressions.Window
      .partitionBy($"a").orderBy($"sup_ab".desc, $"b".asc)
    val owned = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p")).distinct()
    val op = Tables.lineitem(s, d)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val pairs = op.as("x").join(op.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") =!= col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("sup_ab"))
      .withColumn("nrk", row_number().over(Wn))
      .filter($"nrk" <= RecNeighborCap)
      .drop("nrk")
    val scored = owned.join(pairs, $"p" === $"a")
      .groupBy($"c", $"b".as("cand"))
      .agg(sum($"sup_ab").as("score"))
    scored.join(owned.select($"c", $"p".as("cand")),
        Seq("c", "cand"), "left_anti")
      .withColumn("rnk", row_number().over(W).cast("long"))
      .filter($"rnk" <= 3)
      .select($"c".as("c_custkey"), $"cand".as("p_partkey"),
        $"score", $"rnk")
  }

  /** Week-over-week growth report — the universal BI sheet: weekly
    * revenue per event type with the previous week's value, absolute
    * delta, and growth in ppm (one truncating integer division —
    * both engines truncate toward zero, so negative growth is safe).
    * Exact cents end to end; the lag window runs on the tiny
    * (type, week) rollup, never events. */
  private def wowGrowth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"week".asc)
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type",
        date_trunc("week", $"ts").cast("date").as("week"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"week")
      .agg(sum($"cents").as("cents"))
      .withColumn("prev_cents", lag($"cents", 1).over(W))
      .withColumn("delta_cents", $"cents" - $"prev_cents")
      .withColumn("growth_ppm",
        when($"prev_cents" > 0,
          expr("delta_cents * 1000000 div prev_cents")))
  }

  /** ABC (Pareto) classification of parts by revenue — the 80/15/5
    * inventory rule: rank parts by exact e4-dollar revenue, walk the
    * cumulative share, and class A ends where the running total
    * crosses 80 % (B at 95 %) — both thresholds CROSS-MULTIPLIED
    * (cum·100 ≤ 80·total), never a float share. Deterministic
    * (revenue desc, partkey asc) total order; the rank window runs on
    * the |parts| rollup. The classic scale demo that cumulative
    * analytics needs ONE pre-aggregate, not a sorted fact table. */
  private def abcAnalysis(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byPart = Tables.lineitem(s, d)
      .select($"l_partkey",
        (($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long") *
          (lit(100L) - ($"l_discount".cast("decimal(3,2)") * 100)
            .cast("long"))).as("rev_e4"))
      .groupBy($"l_partkey")
      .agg(sum($"rev_e4").as("revenue_e4"))
    val tot = byPart.agg(sum($"revenue_e4").as("total_e4"))
    // rank + running revenue share over ALL parts: distributed
    // rank/prefix-sum from ONE range partitioning (desc key as a
    // negated asc key — the qiniCurve trick keeps GlobalRank's
    // range-partition fast path), never a single-task sort
    graft.ext.GlobalRank
      .withRowNumberAndPrefixSum(
        byPart.withColumn("negrev", -$"revenue_e4"),
        Seq($"negrev", $"l_partkey"), $"revenue_e4",
        rnCol = "rnk", sumCol = "cum_e4")
      .drop("negrev")
      .crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when($"cum_e4" * 100L <= $"total_e4" * 80L, "A")
          .when($"cum_e4" * 100L <= $"total_e4" * 95L, "B")
          .otherwise("C"))
      .select($"l_partkey", $"revenue_e4", $"rnk", $"cum_e4",
        $"abc_class")
  }

  /** Equi-depth histogram of order totals — the ANALYZE-TABLE
    * statistic a cost-based optimizer actually stores (equi-WIDTH,
    * q_histogram, starves on skew; equi-depth bounds every bucket's
    * selectivity error): 8 buckets of equal row count via ntile over
    * the deterministic (cents, orderkey) total order, then per-bucket
    * lo/hi/rows/ndv — exact integers only. */
  private def equidepthStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ntile(8) over ALL orders is an unpartitioned window (one-task
    // sort of the whole table) — ride the distributed GlobalRank +
    // ntileFromRn shape instead, bit-exact to SQL ntile (the
    // q_ntile_bins precedent).
    val base = Tables.orders(s, d)
      .select($"o_orderkey",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val n = base.agg(count(lit(1)).as("n_tot"))
    graft.ext.GlobalRank
      .withRowNumber(base, Seq($"cents", $"o_orderkey"))
      .crossJoin(broadcast(n))
      .select($"cents",
        graft.ext.GlobalRank.ntileFromRn($"rn", $"n_tot", 8).as("bucket"))
      .groupBy($"bucket")
      .agg(min($"cents").as("lo_cents"), max($"cents").as("hi_cents"),
        count(lit(1)).as("n_rows"),
        countDistinct($"cents").as("ndv"))
  }

  private def histogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nb = 20
    val stats = Tables.orders(s, d)
      .agg(min($"o_totalprice").as("mn"), max($"o_totalprice").as("mx"))
    Tables.orders(s, d).crossJoin(broadcast(stats))
      .select(least(
        floor(($"o_totalprice" - $"mn") / (($"mx" - $"mn") / nb)),
        lit(nb - 1)).cast("long").as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"))
  }

  /** Association-rule mining (market-basket) over parts co-ordered in
    * the same order: pair support from an in-order self-join (order
    * baskets are ~7 lineitems, so the per-group pair blowup is bounded
    * by C(7,2) — never an all-pairs across orders), item supports and
    * the order count from one pass each over the cached basket table.
    * confidence = sup_ab/sup_a and lift = sup_ab·N/(sup_a·sup_b) are
    * emitted as RAW doubles — each is ONE correctly-rounded divide of
    * exact integers (float rule 1), so no rounding is needed for the
    * hash compare. Top-20 by (support, a, b) is a total order via
    * TakeOrderedAndProject. The item-support join is left unhinted:
    * |parts| scales with SF, so AQE picks broadcast only while it
    * fits. */
  private def assocRules(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Three consumers (pair join ×2 sides via aliases, item supports,
    // order count) — registry-cache the distinct basket table.
    val op = graft.GraftCaches.getOrPersist(s, s"basket.order_part:$d") {
      Tables.lineitem(s, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    }
    val supItem = op.groupBy($"pk").agg(count(lit(1)).as("sup"))
    val nOrders = op.select($"ok").distinct()
      .agg(count(lit(1)).as("n_orders"))
    op.as("x").join(op.as("y"), Seq("ok"))
      .filter($"x.pk" < $"y.pk")
      .groupBy($"x.pk".as("a"), $"y.pk".as("b"))
      .agg(count(lit(1)).as("sup_ab"))
      .join(supItem.select($"pk".as("a"), $"sup".as("sup_a")), "a")
      .join(supItem.select($"pk".as("b"), $"sup".as("sup_b")), "b")
      .crossJoin(broadcast(nOrders))
      .orderBy($"sup_ab".desc, $"a".asc, $"b".asc)
      .limit(20)
      .select($"a", $"b", $"sup_ab", $"sup_a", $"sup_b",
        ($"sup_ab" / $"sup_a").as("confidence"),
        ($"sup_ab" * $"n_orders" / ($"sup_a" * $"sup_b")).as("lift"))
  }

  /** Key-skew profiler — the diagnostic a pipeline runs BEFORE picking
    * a join/agg strategy on a key (salting and AQE skew-join decisions
    * start from exactly this table): top-20 heaviest l_suppkey values
    * with each key's share and the cumulative share of the head.
    * Shares are single divides of exact integers (float rule 1); the
    * cumulative numerator is a running BIGINT sum over the already-
    * limited 20 rows (exact, and the unpartitioned window is fine
    * because it sees only the top-k survivors, never the corpus).
    * hot_ratio = cnt·n_keys/total compares each key to the uniform
    * expectation — the number a salting heuristic thresholds on. */
  private def skewProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.lineitem(s, d)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum($"cnt").as("total"),
      count(lit(1)).as("n_keys"))
    val top = counts.crossJoin(broadcast(tot))
      .orderBy($"cnt".desc, $"l_suppkey".asc)
      .limit(20)
    val w = Window.orderBy($"cnt".desc, $"l_suppkey".asc)
      .rowsBetween(Long.MinValue, 0)
    top.withColumn("cum_cnt", sum($"cnt").over(w))
      .select($"l_suppkey", $"cnt",
        ($"cnt" / $"total").as("share"),
        ($"cum_cnt" / $"total").as("cum_share"),
        ($"cnt" * $"n_keys" / $"total").as("hot_ratio"))
  }

  /** Feature standardization: z-score and min-max scaling of a
    * numeric column. The stats collapse to ONE row which joins back
    * as a broadcast — never a window over the whole table (a global
    * window frame forces a single partition at scale; the 1-row
    * cross join keeps the big side embarrassingly parallel).
    *
    * The moments accumulate in exact decimal, not double: a double
    * sum's value depends on partial-aggregate merge order, so mu and
    * sigma would drift by an ulp between runs and flip rounded
    * z-scores on boundary rows (observed as a run-to-run hash flake
    * at 15k rows). The price is first snapped to DECIMAL(18,2) — both
    * Spark and DuckDB recover the 2-decimal price grid identically
    * from the double — and every product/sum stays in decimal until
    * after aggregation. (Casting the squared DOUBLE to a wide decimal
    * does NOT work: beyond ~17 significant digits Spark's
    * shortest-string cast and DuckDB's exact-binary-expansion cast
    * disagree, which flipped rounded z-scores on boundary rows.)
    * sigma is NULL when n<=1 (sample stddev undefined).
    *
    * The FINAL scaled value is emitted in fixed-point integer units
    * (hundredths / 1e-4 units via floor), never `round(double, n)`:
    * rounding a derived double quotient at a fine grid is itself
    * engine-divergent — Spark rounds the exact binary expansion
    * HALF_UP while DuckDB rounds a scaled double, and boundary rows
    * flip (this exact query hash-failed three rounds on that rule).
    * floor() of a bit-identical double is exact in every engine, so
    * the BIGINT units — and the single int→double divide that derives
    * the convenience doubles — are reproducible everywhere. */
  private def featureScale(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val x  = $"o_totalprice".cast("decimal(18,2)")
    val stats = Tables.orders(s, d).agg(
      sum(x).cast("double").as("sx"),
      sum((x * x).cast("decimal(38,4)")).cast("double").as("sx2"),
      count(lit(1)).cast("double").as("n"),
      min($"o_totalprice").as("mn"),
      max($"o_totalprice").as("mx"))
    val withMoments = stats
      .withColumn("mu", $"sx" / $"n")
      .withColumn("sigma",
        when($"n" > 1,
          sqrt(($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1))))
    val z  = ($"o_totalprice" - $"mu") / $"sigma"
    val mm = ($"o_totalprice" - $"mn") / ($"mx" - $"mn")
    Tables.orders(s, d).crossJoin(broadcast(withMoments))
      .select($"o_orderkey",
        floor(z * 100).as("zscore_c2"),
        floor(mm * 10000).as("minmax_e4"))
      .withColumn("zscore", $"zscore_c2".cast("double") / 100.0)
      .withColumn("minmax", $"minmax_e4".cast("double") / 10000.0)
  }

  /** Unpivot (melt): wide metric columns → long (metric, value) rows —
    * the reshape a feature store or metrics warehouse applies before
    * generic per-metric processing, and the inverse of q_pivot_events.
    * Spark's native `unpivot` is a zero-shuffle projection (each input
    * row emits k rows map-side via Expand; the only exchange is the
    * final 3-group aggregate). Totals accumulate on the decimal grid
    * (the q_time_decay pattern); min/max pass input doubles through
    * untouched, so the whole row is hash-exact. */
  private def unpivotMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
        $"l_discount")
      .unpivot(Array($"l_orderkey"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount"),
        "metric", "value")
      .groupBy($"metric")
      .agg(count(lit(1)).as("n"),
        round(sum($"value".cast("decimal(18,2)")).cast("double"), 2)
          .as("total"),
        min($"value").as("min_v"), max($"value").as("max_v"))
  }

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    * SQL-surface twin of q_window_top_per_group: for every region, the
    * top-3 customers by account balance among that region's nations,
    * expressed as `FROM region r, LATERAL (… WHERE n_regionkey =
    * r.r_regionkey ORDER BY … LIMIT 3)`. Catalyst decorrelates the
    * lateral into a join + per-group limit, so the N-per-group plan
    * survives; the outer side here is the 5-row region dim (any plan
    * is cheap), while at scale the same shape with a large outer
    * should prefer the window-rank formulation — this entry exists to
    * pin the LATERAL surface itself. acctbal is emitted untouched
    * (no arithmetic → parquet-identical doubles in both engines). */
  private def lateralTopk(s: SparkSession, d: String): DataFrame = {
    Tables.region(s, d).createOrReplaceTempView("lt_region")
    Tables.nation(s, d).createOrReplaceTempView("lt_nation")
    Tables.customer(s, d).createOrReplaceTempView("lt_customer")
    s.sql("""
      SELECT r.r_name, t.c_name, t.c_acctbal
      FROM lt_region r, LATERAL (
        SELECT c.c_name, c.c_acctbal
        FROM lt_customer c JOIN lt_nation n
          ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY c.c_acctbal DESC, c.c_custkey ASC
        LIMIT 3) t""")
  }

  /** Recursive CTE (Spark 4's UnionLoop) — iterative SQL without
    * driver-side loops: expand the user-journey Markov chain from
    * 'signup' to depth 3, carrying each path's probability as an
    * exact e6 fixed-point product (w·cnt div tot per hop — integer
    * both engines; headroom note: w_e6·cnt overflows int64 only past
    * ~9·10¹² observations of one transition). The recursion walks the
    * TRANSITION table (≤ |types|² rows after the fact-table rollup),
    * so each loop step is a tiny join at any corpus size — and the
    * transition table is GraftCaches-persisted before the loop,
    * because UnionLoop re-evaluates loop-referenced relations every
    * iteration (uncached, each hop re-ran the fact-table window). */
  private def recursivePaths(s: SparkSession, d: String): DataFrame = {
    // materialize the |types|²-row transition table ONCE (UnionLoop
    // re-evaluates every relation referenced inside the loop body on
    // each iteration — an uncached CTE would re-run the fact-table
    // window rollup per hop: measured 2.6 s → 0.6 s at sf0.1)
    import s.implicits._
    val trans = graft.GraftCaches.getOrPersist(s, s"recursive.trans:$d") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      val pairs = Tables.events(s, d)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("cnt"))
      val tot = pairs.groupBy($"prev_type")
        .agg(sum($"cnt").as("tot"))
      pairs.join(tot, "prev_type")
    }
    trans.createOrReplaceTempView("rp_trans")
    s.sql("""
      WITH RECURSIVE paths(path, last_type, depth, w_e6) AS (
        SELECT 'signup', 'signup', CAST(0 AS BIGINT),
               CAST(1000000 AS BIGINT)
        UNION ALL
        SELECT concat(p.path, '>', tr.next_type), tr.next_type,
               p.depth + 1, p.w_e6 * tr.cnt div tr.tot
        FROM paths p JOIN rp_trans tr ON tr.prev_type = p.last_type
        WHERE p.depth < 3)
      SELECT path, depth, w_e6 FROM paths""")
  }

  /** Explicit GROUPING SETS with grouping() markers — the
    * mixed-granularity rollup surface between the q_rollup /
    * q_cube extremes: exactly the (flag,status), (flag), () sets,
    * with per-column grouping indicators distinguishing real NULLs
    * from subtotal rows. One shuffle; the expand operator fans each
    * input row to its |sets| grouping keys map-side, partials
    * combine before the exchange — same scale shape as rollup. */
  private def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("gs_lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM gs_lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), ())""")
  }

  /** 2-D Pareto skyline (Börzsönyi et al. 2001, "The Skyline
    * Operator") over part: the price/size frontier — every part for
    * which no other part is both cheaper-or-equal AND
    * larger-or-equal with at least one strict. The naive dominance
    * test is an O(n²) inequality self-join (a
    * BroadcastNestedLoopJoin — unplannable at scale); in 2-D the
    * skyline reduces EXACTLY to a running high-water mark: group to
    * price levels, walk levels in price order, keep a level iff its
    * best size beats the EXCLUSIVE prefix max of all cheaper levels
    * (then keep the points achieving their level's best — equal-size
    * ties are mutually non-dominating). The prefix max runs through
    * [[graft.ext.GlobalRank.withPrefixMax]] — range partition +
    * broadcast per-bucket high-water offsets, never a
    * single-partition sort — so the whole operator is two map-side-
    * collapsing aggregates, one ranged exchange of the LEVEL table
    * (≤ |distinct prices|), and a frontier join back (frontier
    * cardinality is O(distinct-price-levels) worst case, tiny in
    * practice; AQE broadcasts it). */
  private def skylinePareto(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pts = Tables.part(s, d).select($"p_partkey",
      ($"p_retailprice".cast("decimal(12,2)") * 100).cast("long")
        .as("price_cents"),
      $"p_size".cast("long").as("size"))
    val lvl = pts.groupBy($"price_cents").agg(max($"size").as("best_size"))
    val sky = graft.ext.GlobalRank
      .withPrefixMax(lvl, Seq(col("price_cents")), col("best_size"))
      .filter($"pmax".isNull || $"best_size" > $"pmax")
      .select($"price_cents", $"best_size")
    pts.join(sky, Seq("price_cents"))
      .filter($"size" === $"best_size")
      .select($"p_partkey", $"price_cents", $"size")
  }

  val queries: Seq[Q] = Seq(
    Q("q_skyline_pareto", skylinePareto, Some("""
      WITH pts AS (SELECT p_partkey,
                          CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                            AS BIGINT) AS price_cents,
                          CAST(p_size AS BIGINT) AS size
                   FROM part),
      lvl AS (SELECT price_cents, max(size) AS best_size
              FROM pts GROUP BY 1),
      r AS (SELECT price_cents, best_size,
                   max(best_size) OVER (ORDER BY price_cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS pmax
            FROM lvl),
      sky AS (SELECT price_cents, best_size FROM r
              WHERE pmax IS NULL OR best_size > pmax)
      SELECT p.p_partkey, p.price_cents, p.size
      FROM pts p JOIN sky s
        ON p.price_cents = s.price_cents AND p.size = s.best_size""")),

    Q("q_unpivot_metrics", unpivotMetrics, Some("""
      WITH u AS (
        SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS value
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_discount', l_discount FROM lineitem)
      SELECT metric, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total,
             min(value) AS min_v, max(value) AS max_v
      FROM u GROUP BY 1""")),

    Q("q_ntile_bins", ntileBins, Some("""
      WITH b AS (SELECT o_orderkey, o_totalprice,
                        CAST(ntile(10) OVER (ORDER BY o_totalprice,
                                             o_orderkey) AS BIGINT)
                          AS bin
                 FROM orders)
      SELECT bin, count(*) AS n,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
      FROM b GROUP BY 1""")),

    Q("q_salted_agg", saltedAgg, Some("""
      SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1""")),

    Q("q_dist_ranks", distRanks, Some("""
      SELECT c_custkey,
             round(percent_rank() OVER
               (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
             round(cume_dist() OVER
               (ORDER BY c_acctbal, c_custkey), 6) AS cdf
      FROM customer""")),

    Q("q_recommend_topn", recommendTopN, Some(s"""
      WITH owned AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                     FROM orders JOIN lineitem
                       ON o_orderkey = l_orderkey),
      op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem),
      rawpairs AS (SELECT x.pk AS a, y.pk AS b,
                          CAST(count(*) AS BIGINT) AS sup_ab
                   FROM op x JOIN op y ON x.ok = y.ok AND x.pk <> y.pk
                   GROUP BY 1, 2),
      pairs AS (SELECT a, b, sup_ab FROM (
                  SELECT *, row_number() OVER (PARTITION BY a
                    ORDER BY sup_ab DESC, b ASC) AS nrk
                  FROM rawpairs) WHERE nrk <= $RecNeighborCap),
      scored AS (SELECT o.c, p.b AS cand,
                        CAST(sum(p.sup_ab) AS BIGINT) AS score
                 FROM owned o JOIN pairs p ON o.p = p.a
                 GROUP BY 1, 2),
      fresh AS (SELECT s.* FROM scored s
                LEFT JOIN owned w ON w.c = s.c AND w.p = s.cand
                WHERE w.c IS NULL),
      rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY c
               ORDER BY score DESC, cand ASC) AS BIGINT) AS rnk
             FROM fresh)
      SELECT c AS c_custkey, cand AS p_partkey, score, rnk
      FROM rk WHERE rnk <= 3""")),

    Q("q_wow_growth", wowGrowth, Some("""
      WITH w AS (SELECT event_type,
                        CAST(date_trunc('week', ts) AS DATE) AS week,
                        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      l AS (SELECT *, lag(cents) OVER (PARTITION BY event_type
              ORDER BY week ASC) AS prev_cents
            FROM w)
      SELECT event_type, week, cents, prev_cents,
             cents - prev_cents AS delta_cents,
             CASE WHEN prev_cents > 0 THEN
               CAST((cents - prev_cents) * 1000000 // prev_cents
                 AS BIGINT) END AS growth_ppm
      FROM l""")),

    Q("q_abc_analysis", abcAnalysis, Some("""
      WITH bp AS (SELECT l_partkey,
                         CAST(sum(CAST(CAST(l_extendedprice AS
                           DECIMAL(12,2)) * 100 AS BIGINT)
                           * (100 - CAST(CAST(l_discount AS
                             DECIMAL(3,2)) * 100 AS BIGINT)))
                           AS BIGINT) AS revenue_e4
                  FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(sum(revenue_e4) AS BIGINT) AS total_e4
              FROM bp),
      r AS (SELECT *,
                   CAST(row_number() OVER (ORDER BY revenue_e4 DESC,
                     l_partkey ASC) AS BIGINT) AS rnk,
                   CAST(sum(revenue_e4) OVER (ORDER BY revenue_e4 DESC,
                     l_partkey ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_e4
            FROM bp, tot)
      SELECT l_partkey, revenue_e4, rnk, cum_e4,
             CASE WHEN cum_e4 * 100 <= total_e4 * 80 THEN 'A'
                  WHEN cum_e4 * 100 <= total_e4 * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM r""")),

    Q("q_equidepth_stats", equidepthStats, Some("""
      WITH c AS (SELECT o_orderkey,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM orders),
      b AS (SELECT *, CAST(ntile(8) OVER (ORDER BY cents ASC,
              o_orderkey ASC) AS BIGINT) AS bucket
            FROM c)
      SELECT bucket, min(cents) AS lo_cents, max(cents) AS hi_cents,
             count(*) AS n_rows,
             CAST(count(DISTINCT cents) AS BIGINT) AS ndv
      FROM b GROUP BY 1""")),

    Q("q_histogram", histogram, Some("""
      WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
                 FROM orders)
      SELECT CAST(least(floor((o_totalprice - mn) / ((mx - mn) / 20)),
                        19) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM orders, s
      GROUP BY 1""")),

    Q("q_feature_scale", featureScale, Some("""
      WITH g AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS xd,
                        o_totalprice
                 FROM orders),
           raw AS (SELECT
                     CAST(sum(xd) AS DOUBLE) AS sx,
                     CAST(sum(CAST(xd * xd AS DECIMAL(38,4)))
                          AS DOUBLE) AS sx2,
                     CAST(count(*) AS DOUBLE) AS n,
                     min(o_totalprice) AS mn,
                     max(o_totalprice) AS mx
                   FROM g),
           s AS (SELECT sx / n AS mu,
                        CASE WHEN n > 1 THEN
                          sqrt((sx2 - sx * sx / n) / (n - 1))
                        END AS sigma,
                        mn, mx
                 FROM raw),
           f AS (SELECT o_orderkey,
                   CAST(floor((o_totalprice - mu) / sigma * 100)
                        AS BIGINT) AS zscore_c2,
                   CAST(floor((o_totalprice - mn) / (mx - mn) * 10000)
                        AS BIGINT) AS minmax_e4
                 FROM orders, s)
      SELECT o_orderkey, zscore_c2, minmax_e4,
             CAST(zscore_c2 AS DOUBLE) / 100.0 AS zscore,
             CAST(minmax_e4 AS DOUBLE) / 10000.0 AS minmax
      FROM f""")),

    Q("q_assoc_rules", assocRules, Some("""
      WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                  FROM lineitem),
      sup AS (SELECT pk, count(*) AS sup FROM op GROUP BY 1),
      n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
      pairs AS (SELECT x.pk AS a, y.pk AS b, count(*) AS sup_ab
                FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
                GROUP BY 1, 2),
      top AS (SELECT p.a, p.b, p.sup_ab, sa.sup AS sup_a, sb.sup AS sup_b,
                     n.n_orders
              FROM pairs p
              JOIN sup sa ON sa.pk = p.a
              JOIN sup sb ON sb.pk = p.b
              CROSS JOIN n
              ORDER BY p.sup_ab DESC, p.a ASC, p.b ASC LIMIT 20)
      SELECT a, b, sup_ab, sup_a, sup_b,
             sup_ab / sup_a AS confidence,
             sup_ab * n_orders / (sup_a * sup_b) AS lift
      FROM top""")),

    Q("q_skew_profile", skewProfile, Some("""
      WITH c AS (SELECT l_suppkey, count(*) AS cnt
                 FROM lineitem GROUP BY 1),
      t AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM c),
      top AS (SELECT c.l_suppkey, c.cnt, t.total, t.n_keys
              FROM c CROSS JOIN t
              ORDER BY c.cnt DESC, c.l_suppkey ASC LIMIT 20),
      r AS (SELECT *, sum(cnt) OVER (ORDER BY cnt DESC, l_suppkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cnt
            FROM top)
      SELECT l_suppkey, cnt,
             cnt / total AS share,
             cum_cnt / total AS cum_share,
             cnt * n_keys / total AS hot_ratio
      FROM r""")),

    Q("q_window_range", windowRange, Some("""
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2)
               AS d90_total
      FROM orders"""), headline = true),

    Q("q_window_ranks", windowRanks, Some("""
      SELECT c_mktsegment, c_custkey,
             CAST(dense_rank() OVER w AS BIGINT) AS drank,
             round(percent_rank() OVER w, 6) AS prank,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC)""")),

    Q("q_window_first_last", windowFirstLast, Some("""
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)""")),

    Q("q_window_lead", windowLead, Some("""
      SELECT o_custkey, o_orderkey,
             lead(o_orderkey, 1) OVER w AS next_order,
             round(cume_dist() OVER w, 6) AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC)""")),

    Q("q_approx_percentiles", approxPercentiles, Some("""
      SELECT o_orderpriority,
             round(quantile_disc(o_totalprice, 0.5), 4) AS p50_approx,
             round(quantile_disc(o_totalprice, 0.99), 4) AS p99_approx
      FROM orders GROUP BY o_orderpriority""")),

    Q("q_stats_agg", statsAgg, Some("""
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 4) AS sd_qty,
             round(var_samp(l_quantity), 4) AS var_qty,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
             round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
      FROM lineitem GROUP BY 1""")),

    Q("q_percentiles", percentiles, Some("""
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      FROM orders GROUP BY 1""")),

    Q("q_list_agg", listAgg, Some("""
      SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
             list_aggregate(list_sort(list(n_name)), 'string_agg', ',')
               AS nations
      FROM nation GROUP BY 1""")),

    Q("q_map_funcs", mapFuncs, Some("""
      WITH t AS (
        SELECT o_orderkey,
               map(['status', 'priority'],
                   [o_orderstatus, o_orderpriority]) AS m,
               map(['status', 'priority', 'bucket'],
                   [o_orderstatus, o_orderpriority,
                    CASE WHEN o_totalprice > 150000 THEN 'high'
                         ELSE 'low' END]) AS merged
        FROM orders)
      SELECT o_orderkey,
             array_to_string(map_keys(m), ',') AS ks,
             array_to_string(map_values(merged), ',') AS vs,
             map_extract(m, 'status')[1] AS status_val,
             CAST(cardinality(merged) AS BIGINT) AS m_size,
             list_contains(map_keys(m), 'status') AS has_status
      FROM t""")),

    Q("q_higher_order", higherOrder, Some("""
      SELECT vec_id,
             CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
               AS BIGINT) AS n_pos,
             len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.3)) > 0
               AS has_big,
             round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
               x -> abs(x))), 4) AS l1_norm,
             round(CAST(embedding[1] AS DOUBLE) * 2, 6) AS first_doubled
      FROM embeddings""")),

    Q("q_array_funcs", arrayFuncs, Some("""
      WITH t AS (SELECT doc_id,
                        string_split_regex(lower(text), '\s+')[1:6] AS toks
                 FROM documents)
      SELECT doc_id,
             array_to_string(list_sort(toks), ' ') AS sorted_toks,
             array_to_string(list_reverse(toks), ' ') AS rev_toks,
             list_contains(toks, 'the') AS has_the,
             CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT)
               AS data_pos,
             array_to_string(list_concat(toks, ['eof']), ' ') AS flat,
             array_to_string(list_transform(toks, x -> x || x), ' ')
               AS doubled
      FROM t""")),

    Q("q_date_arith", dateArith, Some("""
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS od,
             CAST(o_orderdate AS DATE) + 30 AS plus30,
             CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
             last_day(o_orderdate) AS eom,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
             CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_n
      FROM orders WHERE o_orderkey % 100 = 0""")),

    Q("q_json_struct", jsonStruct, Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
               AS k_mod,
             count(*) AS cnt, round(avg(value), 4) AS avg_value
      FROM events GROUP BY 1""")),

    Q("q_union_by_name", unionByNameQ, Some("""
      SELECT c_custkey AS key, c_name AS name,
             coalesce(round(c_acctbal, 2), -1.0) AS bal
      FROM customer
      UNION ALL
      SELECT s_suppkey + 1000000, s_name, -1.0 FROM supplier""")),

    Q("q_string_funcs2", stringFuncs2, Some("""
      SELECT p_partkey,
             regexp_extract(p_type, '^(\w+)', 1) AS first_word,
             -- initcap: DuckDB has no initcap; title-case each word
             array_to_string(list_transform(
               string_split(lower(p_type), ' '),
               w -> upper(w[1]) || w[2:]), ' ') AS type_title,
             replace(p_brand, '#', '-') AS brand_t,
             reverse(p_name) AS name_rev,
             repeat(p_brand, 2) AS brand_x2,
             CAST(instr(p_type, 'ED') AS BIGINT) AS ed_pos
      FROM part WHERE p_partkey <= 500""")),

    Q("q_lateral_topk", lateralTopk, Some("""
      SELECT r.r_name, t.c_name, t.c_acctbal
      FROM region r, LATERAL (
        SELECT c.c_name, c.c_acctbal
        FROM customer c JOIN nation n
          ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY c.c_acctbal DESC, c.c_custkey ASC
        LIMIT 3) t""")),

    Q("q_recursive_paths", recursivePaths, Some("""
      WITH RECURSIVE trans AS (
        WITH seq AS (SELECT user_id, event_type,
                            lag(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS prev_type
                     FROM events),
        pairs AS (SELECT prev_type, event_type AS next_type,
                         count(*) AS cnt
                  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT p.prev_type, p.next_type, p.cnt, t.tot
        FROM pairs p
        JOIN (SELECT prev_type, sum(cnt) AS tot
              FROM pairs GROUP BY 1) t USING (prev_type)),
      paths(path, last_type, depth, w_e6) AS (
        SELECT 'signup', 'signup', CAST(0 AS BIGINT),
               CAST(1000000 AS BIGINT)
        UNION ALL
        SELECT concat(p.path, '>', tr.next_type), tr.next_type,
               p.depth + 1, CAST(p.w_e6 * tr.cnt // tr.tot AS BIGINT)
        FROM paths p JOIN trans tr ON tr.prev_type = p.last_type
        WHERE p.depth < 3)
      SELECT path, CAST(depth AS BIGINT) AS depth,
             CAST(w_e6 AS BIGINT) AS w_e6
      FROM paths""")),

    Q("q_grouping_sets", groupingSets, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), ())"""))
  )
}
