package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator inventory (SURVEY.md §2.3–§2.7, §2.10):
  * projections, filters, inner/outer/semi/anti/cross joins, hash
  * aggregation, distinct, sort / top-k, set ops, rollup/cube, window
  * functions. Each query is expressed declaratively on the DataFrame API
  * so Catalyst applies pushdown / pruning / join selection; small
  * dimension sides are explicitly `broadcast(...)`-hinted where the
  * 100 TB plan needs it (fact tables shuffle, dims broadcast).
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: wide hash aggregate with partial
    * (map-side) combine; the groupBy keys are low-cardinality so the
    * shuffle moves only #groups × #partitions rows. */
  private def aggPricing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q6-style selective scan → scalar agg. The filter must reach
    * the parquet reader as PushedFilters (asserted in specs). */
  private def filterRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.04, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  /** Flagship 3-way join: fact ⋈ fact shuffles on the join key; the
    * customer dimension is broadcast (no shuffle for the small side). */
  private def joinMktsegment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
  }

  /** TPC-H Q5-shaped regional supplier volume — the classic 6-table
    * join: revenue per nation where the CUSTOMER and the SUPPLIER sit
    * in the same nation of one region, for one order year. The join
    * tree is the 100 TB shape this engine optimizes for: lineitem
    * (fact) shuffles ONCE on orderkey against orders; customer,
    * supplier, nation, region are all broadcast dims, and the
    * same-nation constraint rides the supplier join as a composite
    * key instead of a post-filter. Revenue uses the exact-cents
    * discipline — price·(100−disc%) as BIGINT e4-dollar units — so
    * the rollup hashes identically in any engine (the
    * round(sum(double)) idiom of the older Q3 row is kept there for
    * contrast, but every NEW money rollup is integer). */
  private def regionalVolume(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey",
      (($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long") *
        (lit(100L) - ($"l_discount".cast("decimal(3,2)") * 100)
          .cast("long"))).as("rev_e4"))
    val ord = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("date") &&
        $"o_orderdate" < lit("1997-01-01").cast("date"))
      .select($"o_orderkey", $"o_custkey")
    val cust = Tables.customer(s, d)
      .select($"c_custkey", $"c_nationkey".cast("long").as("c_nk"))
    val supp = Tables.supplier(s, d)
      .select($"s_suppkey", $"s_nationkey".cast("long").as("s_nk"))
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
        .filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".cast("long").as("nk"), $"n_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp),
        $"l_suppkey" === $"s_suppkey" && $"s_nk" === $"c_nk")
      .join(broadcast(asiaNations), $"s_nk" === $"nk")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_items"), sum($"rev_e4").as("revenue_e4"))
  }

  /** TPC-H Q8-shaped market share — of all PROMO-part revenue sold
    * into the ASIA market (customer's region), what fraction came
    * from NATION_2 suppliers, per order year? The numerator/
    * denominator are both exact e4-dollar BIGINTs from one pass
    * (conditional aggregation, no second scan), and the share is ONE
    * integer division to ppm. Same fact-shuffles-once,
    * dims-broadcast shape as [[regionalVolume]], plus the part dim
    * pre-filtered BEFORE the join so partition pruning and the
    * broadcast build stay small. */
  private def marketShare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey",
      $"l_partkey",
      (($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long") *
        (lit(100L) - ($"l_discount".cast("decimal(3,2)") * 100)
          .cast("long"))).as("rev_e4"))
    val promo = Tables.part(s, d).filter($"p_type" === "PROMO")
      .select($"p_partkey")
    val ord = Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey",
        year($"o_orderdate").cast("long").as("o_year"))
    val asiaCust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    li.join(broadcast(promo), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(asiaCust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(sum($"rev_e4").as("total_e4"),
        coalesce(sum(when($"supp_nation" === "NATION_2", $"rev_e4")),
          lit(0L)).as("nation_e4"))
      .withColumn("share_ppm", expr("nation_e4 * 1000000 div total_e4"))
  }

  /** Revenue waterfall — the finance decomposition every P&L sheet
    * wants from the fact table: gross → discount → net → tax →
    * charged, per return flag, ALL as exact integer identities on the
    * e6-dollar grid (price_cents·(100−d%)·(100+t%)): gross −
    * discount = net and net + tax = charged hold EXACTLY, cell by
    * cell, because every term is the same integers regrouped — the
    * spec pins both identities at the wire. One map-side-combinable
    * aggregate; the waterfall of a 100 TB fact table is a |flags|-row
    * result. */
  private def revenueWaterfall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pc = ($"l_extendedprice".cast("decimal(12,2)") * 100)
      .cast("long")
    val dPct = ($"l_discount".cast("decimal(3,2)") * 100).cast("long")
    val tPct = ($"l_tax".cast("decimal(3,2)") * 100).cast("long")
    Tables.lineitem(s, d)
      .select($"l_returnflag", pc.as("pc"), dPct.as("dp"),
        tPct.as("tp"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum($"pc" * 100L * 100L).as("gross_e6"),
        sum($"pc" * $"dp" * 100L).as("discount_e6"),
        sum($"pc" * (lit(100L) - $"dp") * 100L).as("net_e6"),
        sum($"pc" * (lit(100L) - $"dp") * $"tp").as("tax_e6"),
        sum($"pc" * (lit(100L) - $"dp") * (lit(100L) + $"tp"))
          .as("charged_e6"))
  }

  /** Price indices (Laspeyres / Paasche / Fisher) — the economics
    * rollup behind "did prices move or did the basket move": per part
    * matched across the two shipdate halves, period price
    * p_t = revenue_t/qty_t, and
    * L = Σp₁q₀/Σp₀q₀, P = Σp₁q₁/Σp₀q₁. The algebra collapses the
    * denominators exactly (p₀q₀ = rev₀, p₁q₁ = rev₁) and each cross
    * term floors as ONE exact integer division per part
    * (rev₁·q₀·10³ div q₁ — floor-then-sum, order-independent), so
    * both index ratios are single DECIMAL divisions to ppm. Fisher is
    * ⌊√(L_ppm·P_ppm)⌋ — sqrt of an exact sub-2⁵³ integer is
    * correctly rounded in every IEEE engine, so no correction is
    * needed, and the geometric-mean bound min(L,P) ≤ F ≤ max(L,P) is
    * the spec's wire pin. Shape: one part×period rollup, one matched
    * self-alignment, two scalar sums. */
  private def priceIndices(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d)
      .select($"l_partkey",
        ($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long")
          .as("cents"),
        $"l_quantity".cast("decimal(12,2)").cast("long").as("qty"),
        datediff(to_date($"l_shipdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("us"))
    val cut = base.agg(expr("(min(us) + max(us)) div 2").as("cut"))
    val cells = base.crossJoin(broadcast(cut))
      .groupBy($"l_partkey")
      .agg(sum(when($"us" <= $"cut", $"cents").otherwise(0L)).as("s0"),
        sum(when($"us" <= $"cut", $"qty").otherwise(0L)).as("q0"),
        sum(when($"us" > $"cut", $"cents").otherwise(0L)).as("s1"),
        sum(when($"us" > $"cut", $"qty").otherwise(0L)).as("q1"))
      .filter($"q0" > 0 && $"q1" > 0)
    cells
      .select(
        count(lit(1)).as("n_matched_parts"),
        sum($"s0").as("rev0"), sum($"s1").as("rev1"),
        // Σ p1·q0 and Σ p0·q1, each term one exact integer division;
        // the SUM rides decimal(38) — 2e14-scale terms over 2e5 parts
        // pass int64 already at sf1
        sum(expr("CAST(s1 * q0 * 1000 div q1 AS DECIMAL(38,0))"))
          .as("l_num_e3"),
        sum(expr("CAST(s0 * q1 * 1000 div q0 AS DECIMAL(38,0))"))
          .as("p_den_e3"))
      .withColumn("laspeyres_ppm", expr(
        "CAST(CAST(l_num_e3 AS DECIMAL(38,0)) * 1000000" +
          " div (CAST(rev0 AS DECIMAL(38,0)) * 1000) AS BIGINT)"))
      .withColumn("paasche_ppm", expr(
        "CAST(CAST(rev1 AS DECIMAL(38,0)) * 1000000 * 1000" +
          " div CAST(p_den_e3 AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("fisher_ppm",
        floor(sqrt(($"laspeyres_ppm" * $"paasche_ppm").cast("double")))
          .cast("long"))
      .select($"n_matched_parts", $"rev0", $"rev1",
        $"l_num_e3".cast("long").as("l_num_e3"),
        $"p_den_e3".cast("long").as("p_den_e3"),
        $"laspeyres_ppm", $"paasche_ppm", $"fisher_ppm")
  }

  /** Supplier return-rate outlier screen — the marketplace quality
    * rule: which suppliers get returned MORE THAN CHANCE allows,
    * against the corpus base rate? Per supplier the one-proportion
    * z-test runs ENTIRELY in integers by cross-multiplication:
    * z² = (r·N − R·n)²/(n·R·(N−R)) ≥ 3.84 (5 %) ⟺
    * 100·(r·N − R·n)² ≥ 384·n·R·(N−R), every product in
    * DECIMAL(38,0)/HUGEINT, where
    * (r, n) are the supplier's returned/total items and (R, N) the
    * corpus totals. Signed: flagged only when the rate is HIGH
    * (r·N > R·n). Emits rate ppm, excess ppm, and the exact
    * comparands so the spec can replay the algebra. One combinable
    * rollup + one broadcast totals row. */
  private def returnRateOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d)
      .select($"l_suppkey",
        when($"l_returnflag" === "R", 1L).otherwise(0L).as("ret"))
    val cells = base.groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n"), sum($"ret").as("r"))
    val tot = cells.agg(sum($"n").as("nn"), sum($"r").as("rr"))
    cells.crossJoin(broadcast(tot))
      .withColumn("rate_ppm", expr("r * 1000000 div n"))
      .withColumn("excess_ppm",
        expr("r * 1000000 div n - rr * 1000000 div nn"))
      // z² = (rN−Rn)² / (n·R·(N−R)) ≥ 3.84, cross-multiplied ×100
      .withColumn("z2_num", expr(
        "CAST((r * nn - rr * n) AS DECIMAL(38,0))" +
          " * (r * nn - rr * n) * 100"))
      .withColumn("z2_den", expr(
        "CAST(n AS DECIMAL(38,0)) * rr * (nn - rr)"))
      .withColumn("high_outlier",
        $"r" * $"nn" > $"rr" * $"n" && expr("z2_num >= 384 * z2_den"))
      .select($"l_suppkey", $"n", $"r", $"rate_ppm", $"excess_ppm",
        $"high_outlier")
  }

  /** Star-schema dim chain: both dims broadcast → zero shuffles before
    * the final small aggregation. */
  private def joinBroadcastDims(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("cnt"), round(avg($"c_acctbal"), 4).as("avg_bal"))
  }

  /** Left outer join preserving customers with zero orders; count(key)
    * skips nulls so empty groups report 0. */
  /** TPC-H Q5-style star join — the deepest multi-way join in the
    * catalog (6 tables): lineitem ⋈ orders is the fact-fact shuffle;
    * customer and supplier are SF-scaling dimensions left UNHINTED so
    * the planner picks broadcast at test SFs from parquet stats and
    * AQE falls back to shuffle once they outgrow the threshold at
    * real scale (hinting them broadcast would OOM a 100 TB run);
    * only the fixed-size nation ⋈ region chain is hinted. The
    * local-supplier condition (c_nationkey = s_nationkey) makes the
    * supplier join two-keyed — the classic Q5 wrinkle that defeats
    * naive star-join rewrites. Date filter reaches the orders scan as
    * PushedFilters. */
  private def starJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dims = Tables.nation(s, d)
      .join(Tables.region(s, d), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(s, d),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(dims), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private def joinLeft(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("order_cnt"))
  }

  /** Left-semi = EXISTS: orders having at least one high-quantity line. */
  private def joinSemi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d).filter($"l_quantity" > 45),
        $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Left-anti = NOT EXISTS: customers that never placed an urgent
    * order (the filter lives on the anti side so the result is
    * non-empty at every SF). */
  private def joinAnti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  /** Full outer join over two aggregated sides (nations seen from the
    * customer vs supplier tables), null-filled with coalesce. */
  private def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, d).groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").cast("long").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
  }

  /** Cross join of two tiny dims (cartesian stays driver-small). */
  private def joinCross(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r1 = Tables.region(s, d).select($"r_name".as("r1"))
    val r2 = Tables.region(s, d).select($"r_name".as("r2"))
    r1.crossJoin(r2).filter($"r1" < $"r2")
  }

  /** Non-equi (theta) join: same-nation supplier/customer pairs with a
    * balance inequality; nation key equality keeps it a hash join with a
    * post-filter rather than a cartesian. */
  private def joinNonEqui(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, d)
      .join(Tables.customer(s, d),
        $"s_nationkey" === $"c_nationkey" && $"s_acctbal" > $"c_acctbal")
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("richer_than"))
  }

  /** SCD1 upsert (the warehouse MERGE pattern without a table format):
    * a deterministic change set (re-priced orders + brand-new rows) is
    * applied to the base with latest-wins per key — unionByName +
    * per-key window top-1. One shuffle on the merge key; at scale this
    * is the nightly-merge shape when Delta/Iceberg MERGE isn't
    * available. */
  private def upsertScd1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderstatus", round($"o_totalprice", 2)
        .as("price"), lit(0).as("version"))
    // changes: 10% re-priced + appended new keys (shifted id space)
    val updates = Tables.orders(s, d).filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", lit("U").as("o_orderstatus"),
        round($"o_totalprice" + 1000.0, 2).as("price"), lit(1).as("version"))
    val inserts = Tables.orders(s, d).filter($"o_orderkey" % 100 === 7)
      .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), round($"o_totalprice", 2).as("price"),
        lit(1).as("version"))
    val merged = base.unionByName(updates).unionByName(inserts)
    val w = Window.partitionBy($"o_orderkey").orderBy($"version".desc)
    merged.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .withColumn("version", $"version".cast("long"))
  }

  /** SCD TYPE-2 upsert: build the versioned dimension — one row per
    * (key, attribute-run) with a [valid_from, valid_to] interval —
    * from a change stream. Change points are detected with lag(),
    * intervals closed with lead(); both windows partition BY KEY, so
    * the whole history build is one shuffle on the key and each
    * partition's windows run independently — no global sort, the
    * standard warehouse pattern at any scale. (SCD1 keep-latest is
    * q_upsert_scd1; as-of reads over the result are q_asof_attribution.) */
  private def upsertScd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // change stream: a customer's attribute on a day = min priority
    // of that day's orders (deterministic within-day tie-break)
    val changes = Tables.orders(s, d)
      .groupBy($"o_custkey", $"o_orderdate".cast("date").as("day"))
      .agg(min($"o_orderpriority").as("attr"))
    val w = Window.partitionBy($"o_custkey").orderBy($"day")
    changes
      .withColumn("prev", lag($"attr", 1).over(w))
      .filter($"prev".isNull || $"attr" =!= $"prev")
      .withColumn("valid_from", $"day")
      .withColumn("valid_to",
        date_sub(lead($"valid_from", 1).over(
          Window.partitionBy($"o_custkey").orderBy($"valid_from")), 1))
      .withColumn("version",
        row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"valid_from"))
          .cast("long"))
      .select($"o_custkey", $"attr", $"valid_from", $"valid_to", $"version")
  }

  /** Null-safe equi join (<=>): groups where BOTH sides are null still
    * match — the semantics MERGE keys need when nullable. */
  private def joinNullSafe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // derive a nullable key on both sides deterministically
    val a = Tables.customer(s, d).select($"c_custkey",
      when($"c_custkey" % 7 === 0, lit(null).cast("long"))
        .otherwise($"c_custkey" % 5).as("k"))
    val b = Tables.supplier(s, d).select($"s_suppkey",
      when($"s_suppkey" % 7 === 0, lit(null).cast("long"))
        .otherwise($"s_suppkey" % 5).as("k"))
    a.as("a").join(b.as("b"), $"a.k" <=> $"b.k")
      .groupBy($"a.k".as("k"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Global top-k: Catalyst plans orderBy+limit as TakeOrderedAndProject
    * — no total sort, each partition keeps k rows. Orderkey tiebreak
    * makes the result set deterministic for the oracle. */
  private def topk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", round($"o_totalprice", 2).as("total"))
  }

  /** Distinct projection (A4): shuffles only the single kept column. */
  private def distinctSegments(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_mktsegment").distinct()

  /** Multi-key global sort (range partitioned at scale). */
  private def sortMulti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, d)
      .orderBy($"n_regionkey".desc, $"n_name".asc)
      .select($"n_name", $"n_regionkey".cast("long").as("regionkey"))
  }

  /** Set ops: UNION (distinct), INTERSECT, EXCEPT over key projections. */
  private def setUnion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey"))
    val p = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey"))
    c.union(p).distinct()
  }

  private def setIntersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey"))
    val p = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey"))
    c.intersect(p)
  }

  private def setExcept(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey"))
    val p = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey"))
    c.except(p)
  }

  /** Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) — the
    * multiplicity-preserving variants [[setExcept]]'s DISTINCT forms
    * cannot express: "how many MORE of each (flag, status) line does
    * the even-order half carry than the odd half" is an EXCEPT ALL
    * question (reconciliation diffs, CDC audits), and INTERSECT ALL
    * is the matched volume. Spark plans both as aggregate+generate
    * (count per key, replicate the surplus) — no row-by-row
    * comparison — so the shuffle carries key counts, not rows. The
    * two results roll up to counted form (tagged, unioned) so the
    * output is |keys|-bounded while still pinning multiplicities. */
  private def setOpsAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def half(par: Int) = Tables.lineitem(s, d)
      .filter($"l_orderkey" % 2 === par)
      .select($"l_returnflag", $"l_linestatus")
    val a = half(0)
    val b = half(1)
    a.exceptAll(b).groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
      .unionByName(
        a.intersectAll(b).groupBy($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all")))
  }

  /** ROLLUP hierarchy totals (region → nation → grand total). */
  private def rollupRegionNation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
  }

  /** CUBE over two independent dimensions. */
  private def cubeStatusPriority(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** Per-group top-k via window rank (dashboard "top businesses per
    * city" pattern, SURVEY.md §2.11 Q9). */
  private def windowTopPerGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"c_nationkey".cast("long").as("nationkey"), $"c_custkey",
        round($"c_acctbal", 2).as("acctbal"), $"rn".cast("long").as("rn"))
  }

  /** Running (cumulative) sum per customer — frame-based window agg.
    * The per-partition order is total (orderdate, orderkey) so the
    * floating addition order is deterministic and oracle-safe. */
  private def windowRunning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey", $"running")
  }

  /** lag(): gap in days between consecutive orders of a customer. */
  private def windowLag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate", $"prev_date").cast("long").as("gap_days"))
  }

  /** Scalar count action surface (A5) as a 1-row DataFrame. */
  private def scalarCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct($"l_orderkey").as("n_orders"))
  }

  /** Per-nation top-3 customers through the custom TopKPerKey
    * operator (graft.ext: LogicalPlan + Strategy + bounded-heap Exec
    * with map-side partial) — same semantics as the window form, so it
    * shares that oracle shape. */
  private def topkCustom(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val in = Tables.customer(s, d)
      .select($"c_nationkey".cast("long").as("nationkey"), $"c_custkey",
        round($"c_acctbal", 2).as("acctbal"))
    graft.ext.TopKPerKey.topK(in, Seq("nationkey"),
      Seq(("acctbal", false), ("c_custkey", true)), 3)
  }

  /** Dashboard Q8 argmax shape (SURVEY.md §2.11 "most active day /
    * city / category"): top-1 per dimension via TakeOrderedAndProject,
    * stitched with unionByName — no full sort, no window state. */
  private def mostActive(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def top1(df: DataFrame, c: String, dim: String): DataFrame =
      df.groupBy(col(c).cast("string").as("val"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("val").asc).limit(1)
        .select(lit(dim).as("dimension"), col("val"), col("cnt"))
    top1(Tables.orders(s, d), "o_orderpriority", "priority")
      .unionByName(top1(Tables.events(s, d), "event_type", "event_type"))
      .unionByName(top1(Tables.customer(s, d), "c_mktsegment", "segment"))
  }

  /** approx_count_distinct (HLL++): the scalable form of the dashboard
    * countDistinct KPIs — with its error contract made DRIVER-CHECKABLE
    * (round 10, retiring the catalog's last no-oracle rows): HLL
    * estimates differ across engines, so the query emits the EXACT
    * distincts plus within-5%-of-exact flags. The estimate is
    * deterministic for fixed data and rsd, so the flags are stable
    * booleans the DuckDB oracle pins as TRUE — an estimator regression
    * now hash-fails the gate instead of hiding behind a rows-only
    * check. (The exact countDistinct rides the same pass; at 100 TB a
    * release build drops it and ships the estimate alone.) */
  private def approxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // One single-distinct aggregate per column, stitched with a 1×1
    // crossJoin — NOT one agg with two countDistincts: two distinct
    // column groups make Catalyst plan an Expand that triplicates
    // every fact row through the shuffle (distinct group × 2 + the
    // non-distinct HLL stream), which made this the single slowest
    // catalog query (41.6 s verify wall at sf0.1, r16 VERIFYTIMES).
    // A single-distinct agg plans partial map-side dedup instead:
    // each branch shuffles its column's per-partition DISTINCT
    // values only, and each scan prunes to one column. Measured
    // 7.84 → 5.39 s cold at sf0.1 (1.45×, same-box conditions).
    def one(col: org.apache.spark.sql.Column, exact: String, est: String) =
      Tables.lineitem(s, d).agg(
        countDistinct(col).as(exact),
        approx_count_distinct(col, 0.01).as(est))
    one($"l_orderkey", "exact_orders", "est_o")
      .crossJoin(one($"l_partkey", "exact_parts", "est_p"))
      .select($"exact_orders", $"exact_parts",
        (abs($"est_o" - $"exact_orders").cast("double")
          <= $"exact_orders" * 0.05).as("orders_within_5pct"),
        (abs($"est_p" - $"exact_parts").cast("double")
          <= $"exact_parts" * 0.05).as("parts_within_5pct"))
  }

  /** Salting granularity [[skewAdvisor]] plans against — the official
    * shuffle-partition count at the pinned bench config. */
  val SkewAdvisorParts = 32L

  /** JOIN-KEY SKEW ADVISOR — the pre-flight profile behind the
    * q_join_salted / AQE-skew decisions: per candidate join key, how
    * concentrated are the rows, and what salt factor would level the
    * biggest key across [[SkewAdvisorParts]] partition slots? All
    * exact integers: skew_ratio_e3 = max_cnt·n_keys·1000 div n_rows
    * (1000 = perfectly uniform), salt_factor =
    * ⌈max_cnt·P / n_rows⌉ (the number of sub-splits that brings the
    * hottest key down to the average per-slot load; 1 = no salting
    * needed). One map-side-combinable count per key then a 1-row
    * rollup per profiled key — the 100 TB shape is two aggregate
    * passes over the fact table, nothing else. */
  private def skewAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def profile(keyName: String, key: org.apache.spark.sql.Column) =
      Tables.lineitem(s, d)
        .groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"), sum($"cnt").as("n_rows"),
          max($"cnt").as("max_cnt"))
        .select(lit(keyName).as("join_key"), $"n_keys", $"n_rows",
          $"max_cnt",
          expr("max_cnt * n_keys * 1000 div n_rows").as("skew_ratio_e3"),
          expr(s"greatest((max_cnt * $SkewAdvisorParts + n_rows - 1)" +
            " div n_rows, 1L)").as("salt_factor"),
          expr("max_cnt * n_keys * 1000 div n_rows >= 4000")
            .as("salting_recommended"))
    profile("l_suppkey", $"l_suppkey")
      .unionByName(profile("l_partkey", $"l_partkey"))
      .unionByName(profile("l_orderkey", $"l_orderkey"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_skew_advisor", skewAdvisor, Some(s"""
      WITH p1 AS (SELECT l_suppkey AS k, count(*) AS cnt
                  FROM lineitem GROUP BY 1),
      p2 AS (SELECT l_partkey AS k, count(*) AS cnt
             FROM lineitem GROUP BY 1),
      p3 AS (SELECT l_orderkey AS k, count(*) AS cnt
             FROM lineitem GROUP BY 1),
      r1 AS (SELECT 'l_suppkey' AS join_key,
                    CAST(count(*) AS BIGINT) AS n_keys,
                    CAST(sum(cnt) AS BIGINT) AS n_rows,
                    CAST(max(cnt) AS BIGINT) AS max_cnt
             FROM p1),
      r2 AS (SELECT 'l_partkey', CAST(count(*) AS BIGINT),
                    CAST(sum(cnt) AS BIGINT), CAST(max(cnt) AS BIGINT)
             FROM p2),
      r3 AS (SELECT 'l_orderkey', CAST(count(*) AS BIGINT),
                    CAST(sum(cnt) AS BIGINT), CAST(max(cnt) AS BIGINT)
             FROM p3),
      u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3)
      SELECT join_key, n_keys, n_rows, max_cnt,
             CAST(max_cnt * n_keys * 1000 // n_rows AS BIGINT)
               AS skew_ratio_e3,
             CAST(greatest((max_cnt * $SkewAdvisorParts + n_rows - 1)
               // n_rows, 1) AS BIGINT) AS salt_factor,
             max_cnt * n_keys * 1000 // n_rows >= 4000
               AS salting_recommended
      FROM u""")),
    Q("q_agg_pricing", aggPricing, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""), headline = true),

    Q("q_filter_revenue", filterRevenue, Some("""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.04 AND 0.07
        AND l_quantity < 24"""), headline = true),

    Q("q_return_rate_outliers", returnRateOutliers, Some("""
      WITH c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CASE WHEN l_returnflag = 'R'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS r
                 FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(r) AS BIGINT) AS rr
            FROM c)
      SELECT l_suppkey, n, r,
             CAST(r * 1000000 // n AS BIGINT) AS rate_ppm,
             CAST(r * 1000000 // n - rr * 1000000 // nn AS BIGINT)
               AS excess_ppm,
             r * nn > rr * n
               AND CAST((r * nn - rr * n) AS HUGEINT)
                   * (r * nn - rr * n) * 100
                   >= 384 * (CAST(n AS HUGEINT) * rr * (nn - rr))
               AS high_outlier
      FROM c, t""")),

    Q("q_price_indices", priceIndices, Some("""
      WITH base AS (SELECT l_partkey,
                           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                             * 100 AS BIGINT) AS cents,
                           CAST(CAST(l_quantity AS DECIMAL(12,2))
                             AS BIGINT) AS qty,
                           date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE)) AS us
                    FROM lineitem),
      cut AS (SELECT (min(us) + max(us)) // 2 AS cut FROM base),
      cells AS (SELECT l_partkey,
                       CAST(sum(CASE WHEN us <= cut THEN cents
                                ELSE 0 END) AS BIGINT) AS s0,
                       CAST(sum(CASE WHEN us <= cut THEN qty
                                ELSE 0 END) AS BIGINT) AS q0,
                       CAST(sum(CASE WHEN us > cut THEN cents
                                ELSE 0 END) AS BIGINT) AS s1,
                       CAST(sum(CASE WHEN us > cut THEN qty
                                ELSE 0 END) AS BIGINT) AS q1
                FROM base, cut GROUP BY 1
                HAVING sum(CASE WHEN us <= cut THEN qty ELSE 0 END) > 0
                   AND sum(CASE WHEN us > cut THEN qty ELSE 0 END) > 0),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_matched_parts,
                   CAST(sum(s0) AS BIGINT) AS rev0,
                   CAST(sum(s1) AS BIGINT) AS rev1,
                   CAST(sum(s1 * q0 * 1000 // q1) AS HUGEINT)
                     AS l_num_e3,
                   CAST(sum(s0 * q1 * 1000 // q0) AS HUGEINT)
                     AS p_den_e3
            FROM cells),
      r AS (SELECT *,
                   CAST(l_num_e3 * 1000000
                     // (CAST(rev0 AS HUGEINT) * 1000) AS BIGINT)
                     AS laspeyres_ppm,
                   CAST(CAST(rev1 AS HUGEINT) * 1000000 * 1000
                     // p_den_e3 AS BIGINT) AS paasche_ppm
            FROM m)
      SELECT n_matched_parts, rev0, rev1,
             CAST(l_num_e3 AS BIGINT) AS l_num_e3,
             CAST(p_den_e3 AS BIGINT) AS p_den_e3,
             laspeyres_ppm, paasche_ppm,
             CAST(floor(sqrt(CAST(laspeyres_ppm * paasche_ppm
               AS DOUBLE))) AS BIGINT) AS fisher_ppm
      FROM r""")),

    Q("q_revenue_waterfall", revenueWaterfall, Some("""
      WITH li AS (SELECT l_returnflag,
                         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * 100 AS BIGINT) AS pc,
                         CAST(CAST(l_discount AS DECIMAL(3,2)) * 100
                           AS BIGINT) AS dp,
                         CAST(CAST(l_tax AS DECIMAL(3,2)) * 100
                           AS BIGINT) AS tp
                  FROM lineitem)
      SELECT l_returnflag, count(*) AS n_items,
             CAST(sum(pc * 100 * 100) AS BIGINT) AS gross_e6,
             CAST(sum(pc * dp * 100) AS BIGINT) AS discount_e6,
             CAST(sum(pc * (100 - dp) * 100) AS BIGINT) AS net_e6,
             CAST(sum(pc * (100 - dp) * tp) AS BIGINT) AS tax_e6,
             CAST(sum(pc * (100 - dp) * (100 + tp)) AS BIGINT)
               AS charged_e6
      FROM li GROUP BY 1""")),

    Q("q_regional_volume", regionalVolume, headline = true,
      oracle = Some("""
      WITH li AS (SELECT l_orderkey, l_suppkey,
                         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * 100 AS BIGINT)
                         * (100 - CAST(CAST(l_discount AS DECIMAL(3,2))
                           * 100 AS BIGINT)) AS rev_e4
                  FROM lineitem),
      ord AS (SELECT o_orderkey, o_custkey FROM orders
              WHERE o_orderdate >= DATE '1996-01-01'
                AND o_orderdate < DATE '1997-01-01'),
      asia AS (SELECT n_nationkey AS nk, n_name
               FROM nation JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA')
      SELECT n_name, count(*) AS n_items,
             CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
      FROM li
      JOIN ord ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND s_nationkey = c_nationkey
      JOIN asia ON s_nationkey = nk
      GROUP BY 1""")),

    Q("q_market_share", marketShare, Some("""
      WITH li AS (SELECT l_orderkey, l_suppkey, l_partkey,
                         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * 100 AS BIGINT)
                         * (100 - CAST(CAST(l_discount AS DECIMAL(3,2))
                           * 100 AS BIGINT)) AS rev_e4
                  FROM lineitem),
      promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
      asia_cust AS (SELECT c_custkey FROM customer
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA'),
      supp AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
               JOIN nation ON s_nationkey = n_nationkey),
      base AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      rev_e4, supp_nation
               FROM li
               JOIN promo ON l_partkey = p_partkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN asia_cust ON o_custkey = c_custkey
               JOIN supp ON l_suppkey = s_suppkey),
      g AS (SELECT o_year, CAST(sum(rev_e4) AS BIGINT) AS total_e4,
                   CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_2'
                     THEN rev_e4 END), 0) AS BIGINT) AS nation_e4
            FROM base GROUP BY 1)
      SELECT o_year, total_e4, nation_e4,
             CAST(nation_e4 * 1000000 // total_e4 AS BIGINT)
               AS share_ppm
      FROM g""")),

    Q("q_join_mktsegment", joinMktsegment, Some("""
      SELECT c_mktsegment, count(*) AS cnt,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment"""), headline = true),

    Q("q_join_broadcast_dims", joinBroadcastDims, Some("""
      SELECT r_name, n_name, count(*) AS cnt,
             round(avg(c_acctbal), 4) AS avg_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name""")),

    Q("q_join_left", joinLeft, Some("""
      SELECT c_custkey, count(o_orderkey) AS order_cnt
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey""")),

    Q("q_join_semi", joinSemi, Some("""
      SELECT o_orderstatus, count(*) AS cnt
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderstatus""")),

    Q("q_join_anti", joinAnti, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')""")),

    Q("q_join_full_outer", joinFullOuter, Some("""
      WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
      SELECT CAST(coalesce(c_nationkey, s_nationkey) AS BIGINT) AS nationkey,
             coalesce(n_cust, 0) AS n_cust,
             coalesce(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey""")),

    Q("q_join_cross", joinCross, Some("""
      SELECT a.r_name AS r1, b.r_name AS r2
      FROM region a CROSS JOIN region b
      WHERE a.r_name < b.r_name""")),

    Q("q_join_non_equi", joinNonEqui, Some("""
      SELECT s_suppkey, count(*) AS richer_than
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      GROUP BY s_suppkey""")),

    Q("q_join_null_safe", joinNullSafe, Some("""
      WITH a AS (SELECT c_custkey,
                        CASE WHEN c_custkey % 7 = 0 THEN NULL
                             ELSE c_custkey % 5 END AS k
                 FROM customer),
      b AS (SELECT s_suppkey,
                   CASE WHEN s_suppkey % 7 = 0 THEN NULL
                        ELSE s_suppkey % 5 END AS k
            FROM supplier)
      SELECT a.k, count(*) AS cnt
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      GROUP BY a.k""")),

    Q("q_upsert_scd1", upsertScd1, Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price,
               0 AS version
        FROM orders),
      updates AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               round(o_totalprice + 1000.0, 2) AS price, 1 AS version
        FROM orders WHERE o_orderkey % 10 = 0),
      inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus,
               round(o_totalprice, 2) AS price, 1 AS version
        FROM orders WHERE o_orderkey % 100 = 7),
      merged AS (
        SELECT * FROM base UNION ALL
        SELECT * FROM updates UNION ALL
        SELECT * FROM inserts)
      SELECT o_orderkey, o_orderstatus, price,
             CAST(version AS BIGINT) AS version
      FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                        ORDER BY version DESC) AS rn
            FROM merged) t
      WHERE rn = 1""")),

    Q("q_upsert_scd2", upsertScd2, Some("""
      WITH changes AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
               min(o_orderpriority) AS attr
        FROM orders GROUP BY 1, 2),
      runs AS (
        SELECT o_custkey, day, attr,
               lag(attr) OVER (PARTITION BY o_custkey ORDER BY day)
                 AS prev
        FROM changes),
      pts AS (
        SELECT o_custkey, day AS valid_from, attr
        FROM runs WHERE prev IS NULL OR attr <> prev)
      SELECT o_custkey, attr, valid_from,
             lead(valid_from) OVER (PARTITION BY o_custkey
               ORDER BY valid_from) - 1 AS valid_to,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY valid_from) AS BIGINT) AS version
      FROM pts"""), headline = true),

    Q("q_star_join", starJoin, headline = true, oracle = Some("""
      SELECT n_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2)
               AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1""")),

    Q("q_topk", topk, Some("""
      SELECT o_orderkey, round(o_totalprice, 2) AS total
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10""")),

    Q("q_distinct", distinctSegments, Some(
      "SELECT DISTINCT c_mktsegment FROM customer")),

    Q("q_sort_multi", sortMulti, Some("""
      SELECT n_name, CAST(n_regionkey AS BIGINT) AS regionkey
      FROM nation ORDER BY n_regionkey DESC, n_name ASC""")),

    Q("q_set_union", setUnion, Some("""
      SELECT DISTINCT nationkey FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier) u""")),

    Q("q_set_intersect", setIntersect, Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier""")),

    Q("q_set_except", setExcept, Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      EXCEPT
      SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier""")),

    Q("q_set_ops_all", setOpsAll, Some("""
      WITH a AS (SELECT l_returnflag, l_linestatus FROM lineitem
                 WHERE l_orderkey % 2 = 0),
      b AS (SELECT l_returnflag, l_linestatus FROM lineitem
            WHERE l_orderkey % 2 <> 0),
      ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
      ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS n, 'except_all' AS op
      FROM ea GROUP BY 1, 2
      UNION ALL
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS n, 'intersect_all' AS op
      FROM ia GROUP BY 1, 2""")),

    Q("q_rollup", rollupRegionNation, Some("""
      SELECT r_name, n_name, count(*) AS cnt,
             CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)""")),

    Q("q_cube", cubeStatusPriority, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    Q("q_window_top_per_group", windowTopPerGroup, Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey,
             round(c_acctbal, 2) AS acctbal, CAST(rn AS BIGINT) AS rn
      FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
            FROM customer) t
      WHERE rn <= 3"""), headline = true),

    Q("q_window_running", windowRunning, Some("""
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      FROM orders"""), headline = true),

    Q("q_window_lag", windowLag, Some("""
      SELECT o_custkey, o_orderkey,
             CAST(date_diff('day',
               lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC),
               o_orderdate) AS BIGINT) AS gap_days
      FROM orders""")),

    Q("q_scalar_counts", scalarCounts, Some("""
      SELECT count(*) AS n_rows,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem""")),

    Q("q_topk_custom", topkCustom, headline = true, oracle = Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey,
             round(c_acctbal, 2) AS acctbal
      FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY round(c_acctbal, 2) DESC, c_custkey ASC) AS rn
            FROM customer) t
      WHERE rn <= 3""")),

    Q("q_most_active", mostActive, Some("""
      (SELECT 'priority' AS dimension, o_orderpriority AS val,
              count(*) AS cnt
       FROM orders GROUP BY 2 ORDER BY cnt DESC, val ASC LIMIT 1)
      UNION ALL
      (SELECT 'event_type', event_type, count(*) AS cnt
       FROM events GROUP BY 2 ORDER BY cnt DESC, event_type ASC LIMIT 1)
      UNION ALL
      (SELECT 'segment', c_mktsegment, count(*) AS cnt
       FROM customer GROUP BY 2 ORDER BY cnt DESC, c_mktsegment ASC
       LIMIT 1)""")),

    Q("q_approx_distinct", approxDistinct, Some("""
      SELECT count(DISTINCT l_orderkey) AS exact_orders,
             count(DISTINCT l_partkey) AS exact_parts,
             TRUE AS orders_within_5pct, TRUE AS parts_within_5pct
      FROM lineitem"""))
  )
}
