package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hypothesis-testing / statistical-inference operators: the decision
  * layer on top of the drift monitors (q_ks_test, q_psi_drift,
  * q_mann_whitney) and trend estimators (q_theil_sen, q_lead_lag).
  * A training-data pipeline uses these to turn "the distributions
  * look different" into an auditable accept/reject: Welch's t for
  * mean shifts under unequal variances, Spearman/Kendall for
  * monotone-trend detection robust to outliers, Kruskal–Wallis and
  * one-way ANOVA F for k-sample location differences (rank-based and
  * parametric), Brown–Forsythe for variance homogeneity, Cramér's V
  * for association strength between categorical columns, the Wilson
  * score interval for proportions, the Gini coefficient for
  * concentration, and the Wald–Wolfowitz runs test for residual
  * randomness.
  *
  * Reference analog: the dashboard's comparative panels (ratings by
  * category / city over time, README.md:16-20) are exactly the
  * group-comparison questions these tests answer with error control.
  *
  * Float discipline (see StatsQueries' header for the full rules):
  * every cross-row accumulation is an exact BIGINT (cents on the
  * decimal grid, midranks doubled to stay integral, concordance
  * counts); doubles appear only per-row on identical integer inputs,
  * emitted through floor(q·10^k) fixed-point. Where a statistic sums
  * per-group DOUBLE terms across rows (Kruskal's Σ R²/n, Cramér's
  * Σ χ²-contribs), the term is floored to fixed-point FIRST and the
  * sum runs over BIGINTs — "floor-then-sum" — so the accumulation is
  * order-independent and bit-identical across engines by
  * construction (a double sum over rows would be partition-order
  * dependent in Spark).
  *
  * 100 TB shapes: Welch/Kruskal/Cramér are one map-side-combinable
  * groupBy over the fact table collapsing to a handful of rows;
  * Spearman/Kendall first collapse to per-(type, day) calendar
  * cardinality, so their windows and pair joins walk days, not
  * events (the q_eval_auc lesson), and stay flat as event volume
  * grows — empirically confirmed for this family by the 10× replica
  * probes (BENCHNOTES round 9).
  */
object InferenceQueries {

  /** events → (event_type, cents, is_ref) on the exact cent grid,
    * the same reference/current split (event_id parity) the KS and
    * Mann–Whitney monitors use. */
  private def centsSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
  }

  /** Daily revenue per event type on the exact cent grid — the
    * calendar-cardinality series the trend tests rank. */
  private def dailyCents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
  }

  /** Welch's unequal-variance two-sample t-test per event type —
    * reference (even event_id) vs current (odd): the parametric
    * companion to [[StatsQueries]]' Mann–Whitney U. One groupBy
    * carries all six exact-integer moments (n, Σx, Σx² per side);
    * the t statistic and Welch–Satterthwaite degrees of freedom are
    * per-row doubles on those BIGINTs — identical expression trees
    * in both engines, emitted as floor·1e6 / floor·1e3 fixed-point.
    * The n·Σx² product is formed in DOUBLE (it overflows int64 at
    * real volumes); at larger scales the Σx² accumulator itself
    * moves to decimal(38,0). Shape: one exchange, |types| rows. */
  private def welchTTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    centsSplit(s, d)
      .groupBy($"event_type")
      .agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when($"is_ref", $"cents").otherwise(0L)).as("s_ref"),
        sum(when($"is_ref", $"cents" * $"cents").otherwise(0L)).as("q_ref"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n_cur"),
        sum(when(!$"is_ref", $"cents").otherwise(0L)).as("s_cur"),
        sum(when(!$"is_ref", $"cents" * $"cents").otherwise(0L)).as("q_cur"))
      .withColumn("var_ref",
        ($"n_ref".cast("double") * $"q_ref" -
          $"s_ref".cast("double") * $"s_ref")
          / ($"n_ref".cast("double") * ($"n_ref" - 1)))
      .withColumn("var_cur",
        ($"n_cur".cast("double") * $"q_cur" -
          $"s_cur".cast("double") * $"s_cur")
          / ($"n_cur".cast("double") * ($"n_cur" - 1)))
      .withColumn("se2", $"var_ref" / $"n_ref" + $"var_cur" / $"n_cur")
      .select($"event_type", $"n_ref", $"n_cur",
        expr("s_ref div n_ref").as("mean_ref_cents"),
        expr("s_cur div n_cur").as("mean_cur_cents"),
        // n > 1 guards: with n_i ≤ 1 the variance divides by
        // n·(n−1) = 0, and the resulting ±Infinity passes se2 > 0 —
        // a garbage t/df row instead of the null this emits
        when($"n_ref" > 1 && $"n_cur" > 1 && $"se2" > 0,
          floor(($"s_ref".cast("double") / $"n_ref" -
            $"s_cur".cast("double") / $"n_cur")
            / sqrt($"se2") * lit(1000000.0))).as("t_e6"),
        when($"n_ref" > 1 && $"n_cur" > 1 && $"se2" > 0,
          floor($"se2" * $"se2" /
            (($"var_ref" / $"n_ref") * ($"var_ref" / $"n_ref")
              / ($"n_ref" - 1) +
              ($"var_cur" / $"n_cur") * ($"var_cur" / $"n_cur")
                / ($"n_cur" - 1)) * lit(1000.0))).as("df_e3"))
  }

  /** Spearman rank correlation between calendar time and daily
    * revenue per event type — the rank-based monotone-trend test
    * (the nonparametric sibling of q_theil_sen's robust slope).
    * Ranks stay exactly integral by doubling: day ranks are unique
    * (2·row_number), value ranks use the midrank identity
    * 2·midrank = 2·rank + g − 1 with g the tie-group size — so all
    * five Pearson moments over the doubled ranks are exact BIGINTs,
    * and doubling cancels in the correlation. One double division at
    * the end, floor·1e6. Shape: windows partition by type over
    * calendar-cardinality rows — flat in event volume. */
  private def spearmanTrend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val byDay = W.partitionBy($"event_type").orderBy($"day".asc)
    val byVal = W.partitionBy($"event_type").orderBy($"cents".asc)
    val tie = W.partitionBy($"event_type", $"cents")
    dailyCents(s, d)
      .select($"event_type",
        (lit(2L) * row_number().over(byDay)).as("rx2"),
        (lit(2L) * rank().over(byVal) + count(lit(1)).over(tie) - 1)
          .as("ry2"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"rx2").as("sx"), sum($"ry2").as("sy"),
        sum($"rx2" * $"ry2").as("sxy"),
        sum($"rx2" * $"rx2").as("sxx"),
        sum($"ry2" * $"ry2").as("syy"))
      .select($"event_type", $"n_days",
        when(($"n_days" * $"sxx" - $"sx" * $"sx") > 0 &&
          ($"n_days" * $"syy" - $"sy" * $"sy") > 0,
          floor(($"n_days" * $"sxy" - $"sx" * $"sy").cast("double")
            / sqrt(($"n_days" * $"sxx" - $"sx" * $"sx").cast("double")
              * ($"n_days" * $"syy" - $"sy" * $"sy").cast("double"))
            * lit(1000000.0))).as("rho_e6"))
  }

  /** Kendall's τ-b between calendar time and daily revenue per event
    * type: exact concordant/discordant/tie counts over all day pairs
    * — the O(n²) pair fan-out is DAYS², not events² (the q_theil_sen
    * bound: a year of daily points is ~66k pairs per type at any
    * event volume). Day ranks have no ties by construction, so
    * τ-b's denominator is √((n₀−T_y)·n₀). Counts are exact BIGINTs;
    * one double division, floor·1e6. */
  private def kendallTau(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dly = dailyCents(s, d)
    val a = dly.select($"event_type", $"day", $"cents")
    val b = dly.select($"event_type".as("t2"), $"day".as("day2"),
      $"cents".as("cents2"))
    val pairs = a.join(b,
      $"event_type" === $"t2" && $"day" < $"day2")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"cents2" > $"cents", 1L).otherwise(0L)).as("n_conc"),
        sum(when($"cents2" < $"cents", 1L).otherwise(0L)).as("n_disc"))
    val n = dly.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    pairs.join(n, "event_type")
      .select($"event_type", $"n_days", $"n_pairs", $"n_conc", $"n_disc",
        ($"n_pairs" - $"n_conc" - $"n_disc").as("n_tie_y"),
        when(($"n_pairs" - ($"n_pairs" - $"n_conc" - $"n_disc")) > 0,
          floor(($"n_conc" - $"n_disc").cast("double")
            / sqrt(($"n_pairs" - ($"n_pairs" - $"n_conc" - $"n_disc"))
              .cast("double") * $"n_pairs")
            * lit(1000000.0))).as("tau_e6"))
  }

  /** Kruskal–Wallis H across ALL event types — "does at least one
    * type's value distribution sit elsewhere?", the k-sample
    * extension of Mann–Whitney reusing the same midrank machinery,
    * now ranked GLOBALLY: the cumulative window walks the distinct
    * cent grid (≤ value-range/0.01 rows at any event volume), never
    * raw events. Per-type rank sums R2_i = Σ cnt·(2·prev+g+1) are
    * exact BIGINTs; the Σ R_i²/n_i accumulation floors each term to
    * an integer first (floor-then-sum — R² exceeds int64 so the
    * per-term quotient runs in double, identically in both engines),
    * making the sum order-independent. Emits both the raw H and the
    * tie-corrected H (tie mass Σ(g³−g) is exact). Single-row out. */
  private def kruskalWallis(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cum = W.orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val tc = centsSplit(s, d)
      .groupBy($"event_type", $"cents")
      .agg(count(lit(1)).as("cnt"))
    val grid = tc.groupBy($"cents").agg(sum($"cnt").as("g"))
      .withColumn("prev", sum($"g").over(cum) - $"g")
    val ranks = tc.join(grid, "cents")
      .groupBy($"event_type")
      .agg(sum($"cnt").as("n_i"),
        sum($"cnt" * (lit(2L) * $"prev" + $"g" + 1)).as("r2_i"))
    val ties = grid.agg(
      sum($"g" * $"g" * $"g" - $"g").as("tie_num"))
    val h = ranks.agg(
      sum(floor($"r2_i".cast("double") * $"r2_i" / (lit(4.0) * $"n_i")))
        .as("h_num"),
      sum($"n_i").as("n_total"),
      count(lit(1)).as("k_groups"))
    h.crossJoin(ties)
      .select($"n_total", $"k_groups", $"tie_num", $"h_num",
        floor((lit(12.0) * $"h_num"
          / ($"n_total".cast("double") * ($"n_total" + 1))
          - lit(3.0) * ($"n_total" + 1)) * lit(1000000.0)).as("h_e6"),
        floor((lit(12.0) * $"h_num"
          / ($"n_total".cast("double") * ($"n_total" + 1))
          - lit(3.0) * ($"n_total" + 1))
          / (lit(1.0) - $"tie_num".cast("double")
            / ($"n_total".cast("double") * $"n_total" * $"n_total"
              - $"n_total"))
          * lit(1000000.0)).as("h_corr_e6"))
  }

  /** Cramér's V between order priority and order status — association
    * STRENGTH for a categorical×categorical pair, normalizing the χ²
    * that q_chi_square leaves as per-cell contributions into one
    * [0,1] effect size. Contingency cells/margins/total come from one
    * pass (window sums over the |priorities|×|statuses| cell table);
    * each cell's χ² term is floored to ·1e6 BIGINT before summing
    * (floor-then-sum, order-independent), then V = √(χ²/(N·(k−1)))
    * per-row. Shape: one map-side-combinable groupBy, 15-row tail. */
  /** ADJUSTED standardized residuals per contingency cell (Haberman
    * 1973) — the drill-down [[cramersV]]/chi² can't give: WHICH cells
    * drive the dependence. z = (O−E)/√(E(1−rt/N)(1−ct/N)) ships as
    * the sign-carried EXACT rational z² (the turningPoints device):
    * z2_e4 = (O·N − rt·ct)²·N·10⁴ div (rt·ct·(N−rt)·(N−ct)) in
    * decimal(38,0)/HUGEINT (the N³ powers cancel exactly; headroom:
    * dev²·N·10⁴ ≤ 10³⁸ holds through ~10⁷× volume ASSUMING the
    * observed near-independent margins where dev ≲ N^(3/2) — in the
    * worst case dev ≈ N²/4 (one dominant cell in a 2×2 with balanced
    * margins) the bound is dev²·N·10⁴ ≈ N⁵·6e2, which crosses
    * decimal(38,0)/HUGEINT near N ≈ 10⁷ (only ~70× this table) with
    * engine-divergent overflow behavior — at that margin skew this
    * form needs the
    * common-factor reduction (divide dev by gcd with the denominator)
    * before squaring; ADVICE r14 #4), flag |z| ≥ 1.96 ⟺ magnitude
    * ≥ 38416. The marginal
    * windows walk the bounded |priority|×|status| cell frame — the
    * cramersV whitelist argument. */
  private def crosstabStdres(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    Tables.orders(s, d)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderstatus".as("st"))
      .agg(count(lit(1)).as("o"))
      .withColumn("rt", sum($"o").over(W.partitionBy($"pri")))
      .withColumn("ct", sum($"o").over(W.partitionBy($"st")))
      .withColumn("n", sum($"o").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .withColumn("dev",
        expr("cast(o as decimal(38,0)) * n" +
          " - cast(rt as decimal(38,0)) * ct"))
      .withColumn("mag", expr(
        "case when rt < n and ct < n then" +
          " cast(dev * dev * n * 10000 div (cast(rt as decimal(38,0))" +
          " * ct * (n - rt) * (n - ct)) as bigint) else 0L end"))
      .select($"pri", $"st", $"o", $"rt", $"ct", $"n",
        when($"dev" >= 0, $"mag").otherwise(-$"mag").as("z2_e4"),
        ($"mag" >= 38416L).as("sig_5pct"))
  }

  /** ORDINAL association battery — Goodman–Kruskal γ and BOTH
    * Somers' d directions over the (order priority × order status)
    * contingency grid: the strength-AND-direction numbers
    * [[cramersV]]'s symmetric, sign-less V cannot give when the two
    * categoricals are ORDERED (priority by its leading digit; status
    * by its letter — the demonstration orderings, as with
    * [[jonckheere]]). Concordant/discordant/tied-one-way pair masses
    * come from the bounded cell-grid pair fan (|priority|×|status|
    * cells squared — data-independent cardinality, the tukey_hsd
    * whitelist argument; the cell table itself is one
    * map-side-combinable aggregate over orders). All counts exact
    * BIGINTs in decimal(38,0) (pair masses are O(N²)); ratios ship
    * sign-carried as ·1e6 floors of |C−D| over the respective
    * denominators. γ ignores all ties; d_status excludes only
    * priority-ties (status dependent); d_priority the transpose. */
  private def ordinalAssoc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.orders(s, d)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderstatus".as("st"))
      .agg(count(lit(1)).as("n"))
    val a = cells.select($"pri".as("p1"), $"st".as("s1"), $"n".as("n1"))
    val b = cells.select($"pri".as("p2"), $"st".as("s2"), $"n".as("n2"))
    val pairs = a.join(b,
      $"p1" < $"p2" || ($"p1" === $"p2" && $"s1" < $"s2"))
    val masses = pairs.agg(
      sum(when($"p1" =!= $"p2" &&
        (($"p1" < $"p2" && $"s1" < $"s2") ||
          ($"p1" > $"p2" && $"s1" > $"s2")),
        expr("cast(n1 as decimal(38,0)) * n2")).otherwise(
        lit(0).cast("decimal(38,0)"))).as("c_mass"),
      sum(when($"p1" =!= $"p2" &&
        (($"p1" < $"p2" && $"s1" > $"s2") ||
          ($"p1" > $"p2" && $"s1" < $"s2")),
        expr("cast(n1 as decimal(38,0)) * n2")).otherwise(
        lit(0).cast("decimal(38,0)"))).as("d_mass"),
      sum(when($"p1" === $"p2" && $"s1" =!= $"s2",
        expr("cast(n1 as decimal(38,0)) * n2")).otherwise(
        lit(0).cast("decimal(38,0)"))).as("tx_mass"),
      sum(when($"p1" =!= $"p2" && $"s1" === $"s2",
        expr("cast(n1 as decimal(38,0)) * n2")).otherwise(
        lit(0).cast("decimal(38,0)"))).as("ty_mass"))
    masses
      .withColumn("dev", $"c_mass" - $"d_mass")
      .select(
        $"c_mass".cast("long").as("concordant"),
        $"d_mass".cast("long").as("discordant"),
        $"tx_mass".cast("long").as("tied_pri_only"),
        $"ty_mass".cast("long").as("tied_st_only"),
        expr("""case when c_mass + d_mass > 0 then
            cast(case when dev >= 0
              then 1000000 * dev div (c_mass + d_mass)
              else -(1000000 * (-dev) div (c_mass + d_mass)) end
              as bigint) end""").as("gamma_e6"),
        expr("""case when c_mass + d_mass + ty_mass > 0 then
            cast(case when dev >= 0
              then 1000000 * dev div (c_mass + d_mass + ty_mass)
              else -(1000000 * (-dev) div (c_mass + d_mass + ty_mass))
              end as bigint) end""").as("somers_d_status_e6"),
        expr("""case when c_mass + d_mass + tx_mass > 0 then
            cast(case when dev >= 0
              then 1000000 * dev div (c_mass + d_mass + tx_mass)
              else -(1000000 * (-dev) div (c_mass + d_mass + tx_mass))
              end as bigint) end""").as("somers_d_priority_e6"))
  }

  private def cramersV(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cells = Tables.orders(s, d)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderstatus".as("st"))
      .agg(count(lit(1)).as("o"))
      .withColumn("rt", sum($"o").over(W.partitionBy($"pri")))
      .withColumn("ct", sum($"o").over(W.partitionBy($"st")))
      .withColumn("n", sum($"o").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    cells
      .select($"pri", $"st", $"rt", $"ct", $"n",
        // deviation formed entirely in double: o·n (and rt·ct) exceed
        // int64 once row counts reach ~3e9, where Spark would wrap
        // silently while the oracle errors — the anovaF SSB discipline
        floor(($"o".cast("double") * $"n" - $"rt".cast("double") * $"ct")
          * ($"o".cast("double") * $"n" - $"rt".cast("double") * $"ct")
          / ($"n".cast("double") * $"rt" * $"ct")
          * lit(1000000.0)).as("cell_e6"))
      .agg(max($"n").as("n"),
        countDistinct($"pri").as("n_rows"),
        countDistinct($"st").as("n_cols"),
        sum($"cell_e6").as("chi2_e6"))
      .select($"n", $"n_rows", $"n_cols", $"chi2_e6",
        floor(sqrt(($"chi2_e6".cast("double") / lit(1000000.0))
          / ($"n".cast("double") * (least($"n_rows", $"n_cols") - 1)))
          * lit(1000000.0)).as("v_e6"))
  }

  /** One-way ANOVA F across event types — the parametric k-sample
    * companion to [[kruskalWallis]]: is between-group mean spread
    * large relative to within-group variance? Group moments
    * (n, Σx, Σx²) are exact BIGINTs from one combinable groupBy;
    * grand totals ride window sums over the |types|-row table. The
    * between term n_i(m_i−m)² = (s_i·N − S·n_i)²/(n_i·N²) and within
    * term q_i − s_i²/n_i are per-group doubles (cross products exceed
    * int64) floored to e6 BIGINTs and THEN summed — floor-then-sum —
    * so both sums of squares are order-independent; F is a per-row
    * double on the floored pair (deterministic by construction,
    * documented as the floored-inputs F). Single-row out. */
  private def anovaF(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val g = centsSplit(s, d)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_i"), sum($"cents").as("s_i"),
        sum($"cents" * $"cents").as("q_i"))
      .withColumn("n", sum($"n_i").over(all))
      .withColumn("s", sum($"s_i").over(all))
      .withColumn("k", count(lit(1)).over(all))
    g.select($"n", $"k",
        floor(($"s_i".cast("double") * $"n" - $"s".cast("double") * $"n_i")
          * ($"s_i".cast("double") * $"n" - $"s".cast("double") * $"n_i")
          / ($"n_i".cast("double") * $"n" * $"n")).as("ssb_t"),
        floor($"q_i".cast("double") -
          $"s_i".cast("double") * $"s_i" / $"n_i").as("ssw_t"))
      .groupBy($"n", $"k")
      .agg(sum($"ssb_t").as("ssb_sq"), sum($"ssw_t").as("ssw_sq"))
      .select($"n".as("n_total"), $"k".as("k_groups"),
        $"ssb_sq", $"ssw_sq",
        when($"ssw_sq" > 0,
          floor(($"ssb_sq".cast("double") / ($"k" - 1))
            / ($"ssw_sq".cast("double") / ($"n" - $"k"))
            * lit(1000000.0))).as("f_e6"))
  }

  /** Brown–Forsythe variance-homogeneity test (Levene with the
    * MEDIAN center — robust to non-normality): ANOVA on the absolute
    * deviations from each group's median. Deviations stay exactly
    * integral by doubling: med2 = 2·median is integral-valued on the
    * cent grid even for even n (both engines interpolate pos=p·(n−1);
    * the ·2 product of a half-integral double is exact), so
    * z = |2·cents − med2| is an exact BIGINT and the ANOVA moments
    * over z are exact. Same floor-then-sum tail as [[anovaF]].
    * Shape: one percentile aggregate per group (the q_outlier_iqr
    * shape — per-group spill, no global sort), broadcast back, one
    * combinable moment pass. */
  private def brownForsythe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val base = centsSplit(s, d)
    val med = base.groupBy($"event_type")
      .agg((expr("percentile(cents, 0.5D)") * 2).cast("long").as("med2"))
    val g = base.join(broadcast(med), "event_type")
      .select($"event_type",
        abs(lit(2L) * $"cents" - $"med2").as("z"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_i"), sum($"z").as("s_i"),
        sum($"z" * $"z").as("q_i"))
      .withColumn("n", sum($"n_i").over(all))
      .withColumn("s", sum($"s_i").over(all))
      .withColumn("k", count(lit(1)).over(all))
    g.select($"n", $"k",
        floor(($"s_i".cast("double") * $"n" - $"s".cast("double") * $"n_i")
          * ($"s_i".cast("double") * $"n" - $"s".cast("double") * $"n_i")
          / ($"n_i".cast("double") * $"n" * $"n")).as("ssb_t"),
        floor($"q_i".cast("double") -
          $"s_i".cast("double") * $"s_i" / $"n_i").as("ssw_t"))
      .groupBy($"n", $"k")
      .agg(sum($"ssb_t").as("ssb_sq"), sum($"ssw_t").as("ssw_sq"))
      .select($"n".as("n_total"), $"k".as("k_groups"),
        $"ssb_sq", $"ssw_sq",
        when($"ssw_sq" > 0,
          floor(($"ssb_sq".cast("double") / ($"k" - 1))
            / ($"ssw_sq".cast("double") / ($"n" - $"k"))
            * lit(1000000.0))).as("f_e6"))
  }

  /** Two-sample power analysis per event type — the PLANNING half of
    * [[welchTTest]]: given the observed per-side variances, the
    * per-group n required to detect a δ = 2 % mean shift at
    * α = 0.05 / power = 0.80 (z 1.96 / 0.8416), via
    * n = (s²_ref + s²_cur)·(z_α + z_β)² / δ². Answers "how many more
    * events must this source log before the drift gate can call a
    * 2 % move?" — the sizing question asked before waiting on a
    * verdict. Variances are per-row doubles on the same six exact
    * BIGINT moments as the t-test; δ is anchored to the pooled mean
    * (2 % of (s_ref+s_cur)/(n_ref+n_cur), exact integer `div` before
    * the double tail); emitted as ceil'd whole observations plus the
    * ratio to the n already on hand (e3 fixed point). */
  private def powerWelch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val zSum = 1.96 + 0.8416
    centsSplit(s, d)
      .groupBy($"event_type")
      .agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when($"is_ref", $"cents").otherwise(0L)).as("s_ref"),
        sum(when($"is_ref", $"cents" * $"cents").otherwise(0L)).as("q_ref"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n_cur"),
        sum(when(!$"is_ref", $"cents").otherwise(0L)).as("s_cur"),
        sum(when(!$"is_ref", $"cents" * $"cents").otherwise(0L)).as("q_cur"))
      .withColumn("mean_cents",
        expr("(s_ref + s_cur) div (n_ref + n_cur)"))
      .withColumn("delta_cents", expr("(mean_cents * 2) div 100"))
      .withColumn("var_ref",
        ($"n_ref".cast("double") * $"q_ref" -
          $"s_ref".cast("double") * $"s_ref")
          / ($"n_ref".cast("double") * ($"n_ref" - 1)))
      .withColumn("var_cur",
        ($"n_cur".cast("double") * $"q_cur" -
          $"s_cur".cast("double") * $"s_cur")
          / ($"n_cur".cast("double") * ($"n_cur" - 1)))
      .select($"event_type", $"n_ref", $"n_cur", $"mean_cents",
        $"delta_cents",
        // n > 1 guards: the welchTTest degenerate-side discipline
        when($"n_ref" > 1 && $"n_cur" > 1 && $"delta_cents" > 0,
          ceil(($"var_ref" + $"var_cur") * lit(zSum * zSum)
            / ($"delta_cents".cast("double") * $"delta_cents")))
          .as("n_needed"),
        when($"n_ref" > 1 && $"n_cur" > 1 && $"delta_cents" > 0,
          floor(ceil(($"var_ref" + $"var_cur") * lit(zSum * zSum)
            / ($"delta_cents".cast("double") * $"delta_cents"))
            .cast("double")
            / (($"n_ref" + $"n_cur").cast("double") / 2)
            * lit(1000.0))).as("x_current_e3"))
  }

  /** Mood's median test across event types — the most
    * outlier-robust of the k-sample location tests (only the side of
    * the GRAND median matters, not magnitude): dichotomize every
    * value at the global median, then χ² on the k×2 contingency of
    * (type × above/not-above). The doubled-median trick keeps the
    * dichotomy exact (med2 = 2·median is integral on the cent grid);
    * counts and margins are exact BIGINTs, each cell's χ² term is
    * floored e6 then integer-summed (the Cramér tail). Shape: one
    * global percentile aggregate (broadcast scalar), one combinable
    * per-type count pass, |types|×2 cell table. */
  private def moodMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val base = centsSplit(s, d)
    val med = base.agg(
      (expr("percentile(cents, 0.5D)") * 2).cast("long").as("med2"))
    val counts = base.crossJoin(broadcast(med))
      .groupBy($"event_type")
      .agg(sum(when(lit(2L) * $"cents" > $"med2", 1L).otherwise(0L))
        .as("a"),
        sum(when(lit(2L) * $"cents" > $"med2", 0L).otherwise(1L))
          .as("b"))
      .withColumn("ta", sum($"a").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .withColumn("tb", sum($"b").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .withColumn("n", $"ta" + $"tb")
    // per-type cell terms for BOTH columns of the k×2 table,
    // floored e6 then summed
    counts
      .select($"event_type", $"a", $"b", $"ta", $"tb", $"n",
        // cross products in double throughout (a·n overflows int64 at
        // ~3e9 rows; Spark wraps, DuckDB errors — the cramersV fix)
        when($"ta" > 0 && $"tb" > 0,
          floor(($"a".cast("double") * $"n"
            - ($"a" + $"b").cast("double") * $"ta")
            * ($"a".cast("double") * $"n"
              - ($"a" + $"b").cast("double") * $"ta")
            / ($"n".cast("double") * ($"a" + $"b") * $"ta")
            * lit(1000000.0)) +
            floor(($"b".cast("double") * $"n"
              - ($"a" + $"b").cast("double") * $"tb")
              * ($"b".cast("double") * $"n"
                - ($"a" + $"b").cast("double") * $"tb")
              / ($"n".cast("double") * ($"a" + $"b") * $"tb")
              * lit(1000000.0))).as("cell_e6"))
      .agg(max($"n").as("n_total"),
        count(lit(1)).as("k_groups"),
        max($"ta").as("n_above"),
        sum($"cell_e6").as("chi2_e6"))
  }

  /** Lorenz curve by revenue decile — [[giniRevenue]]'s companion
    * that shows WHERE the inequality lives ("the top decile carries
    * X % of revenue"): users ranked ascending by total purchase
    * cents, dealt into 10 equal-count deciles via the custom
    * GlobalRank ntile (no single-partition sort), each decile's
    * revenue share and cumulative share emitted as exact integer ppm
    * ((cents·1e6) div total) — no doubles anywhere in this one. */
  private def lorenzDeciles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"user_id").agg(sum($"cents").as("cents"))
    val tot = perUser.agg(count(lit(1)).as("n_users"),
      sum($"cents").as("total_cents"))
    graft.ext.GlobalRank
      .withRowNumber(perUser, Seq($"cents", $"user_id"), "i")
      .crossJoin(broadcast(tot))
      .withColumn("decile",
        graft.ext.GlobalRank.ntileFromRn($"i", $"n_users", 10))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_users_d"), sum($"cents").as("cents_d"),
        max($"total_cents").as("total_cents"))
      .withColumn("cum_cents", sum($"cents_d").over(
        W.orderBy($"decile").rowsBetween(W.unboundedPreceding, 0)))
      .select($"decile", $"n_users_d", $"cents_d",
        expr("(cents_d * 1000000) div total_cents").as("share_ppm"),
        expr("(cum_cents * 1000000) div total_cents").as("cum_share_ppm"))
  }

  /** SPRT integer boundary: with the symmetric hypotheses
    * p₀ = 0.45 vs p₁ = 0.55, the per-event log-likelihood-ratio
    * increments are ±ln(11/9) — equal magnitude — so the cumulative
    * LLR is S·ln(11/9) with S = Σ(2k−n) an EXACT INTEGER, and Wald's
    * boundaries ±ln((1−β)/α) = ±ln 19 (α = β = 0.05) become the
    * integer test |S| ≥ ceil(ln 19 / ln(11/9)) = 15. */
  val SprtBoundary = 15L

  /** Wald's sequential probability ratio test per event type, replayed
    * over the daily stream: is the high-value share (cents ≥ $100,
    * the Wilson convention) running at p₁ = 0.55 rather than
    * p₀ = 0.45? The sequential gate STOPS at the first day the
    * evidence crosses a boundary instead of waiting for a fixed-n
    * verdict — the online counterpart of [[powerWelch]]'s planning.
    * The symmetric hypothesis pair makes the whole test exact integer
    * arithmetic (see [[SprtBoundary]]): daily S-increments 2k−n,
    * cumulative S over calendar windows, first-crossing days via
    * conditional MIN — no ln in either engine (the boundary constant
    * is derived once, in the comment). llr_e6 emits S·ln(11/9) for
    * readability only. */
  private def sprt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cum = W.partitionBy($"event_type").orderBy($"day".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val lnRatio = math.log(11.0 / 9.0)
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg((lit(2L) * sum(when($"cents" >= 10000L, 1L).otherwise(0L))
        - count(lit(1))).as("s_day"))
      .withColumn("s_cum", sum($"s_day").over(cum))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"s_day").as("s_final"),
        min(when($"s_cum" >= SprtBoundary, $"day")).as("d_hi"),
        min(when($"s_cum" <= -SprtBoundary, $"day")).as("d_lo"))
      .select($"event_type", $"n_days", $"s_final",
        floor($"s_final".cast("double") * lit(lnRatio) * lit(1000000.0))
          .as("llr_e6"),
        when($"d_hi".isNotNull && ($"d_lo".isNull || $"d_hi" <= $"d_lo"),
          lit("accept_h1"))
          .when($"d_lo".isNotNull, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"),
        least($"d_hi", $"d_lo").as("decision_day"))
  }

  /** Wilson z for the 95 % score interval (two-sided). */
  val WilsonZ = 1.96

  /** Wilson score interval per event type for the high-value-event
    * share (value ≥ $100) — the binomial confidence interval that
    * stays inside [0,1] and behaves at extreme proportions where the
    * Wald interval collapses (the release-gate statistic for "did
    * this source's premium share really move?"). Counts (k, n) are
    * exact from one combinable groupBy; center and half-width are
    * per-row doubles on those integers (the Welch discipline),
    * emitted floor·1e6. Shape: one exchange, |types| rows. */
  private def wilsonCi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val z = WilsonZ
    val g = Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"cents" >= 10000L, 1L).otherwise(0L)).as("k"))
      .withColumn("p_hat", $"k".cast("double") / $"n")
      .withColumn("center",
        ($"p_hat" + lit(z * z) / (lit(2.0) * $"n"))
          / (lit(1.0) + lit(z * z) / $"n"))
      .withColumn("half",
        lit(z) * sqrt($"p_hat" * (lit(1.0) - $"p_hat") / $"n"
          + lit(z * z) / (lit(4.0) * $"n" * $"n"))
          / (lit(1.0) + lit(z * z) / $"n"))
    g.select($"event_type", $"n", $"k",
      floor($"p_hat" * lit(1000000.0)).as("p_e6"),
      floor(($"center" - $"half") * lit(1000000.0)).as("lo_e6"),
      floor(($"center" + $"half") * lit(1000000.0)).as("hi_e6"))
  }

  /** Gini coefficient of purchase revenue across users — the
    * inequality summary ("do 1 % of users drive 90 % of revenue?")
    * that sizes stratified sampling and loss weighting. Uses the
    * rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx) over the
    * ascending-sorted per-user totals, with the global rank i from
    * the custom [[graft.ext.GlobalRank]] operator — TeraSort-style
    * sampled buckets + broadcast offsets, NOT the single-partition
    * `row_number() OVER (ORDER BY …)` window (the canonical
    * scale-killer at user cardinality). Everything through num/den is
    * exact BIGINT; one double division, floor·1e6. Shape: one
    * combinable per-user rollup, the rank's bucket exchange, then a
    * scalar aggregate. */
  private def giniRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"user_id").agg(sum($"cents").as("cents"))
    graft.ext.GlobalRank
      .withRowNumber(perUser, Seq($"cents", $"user_id"), "i")
      .agg(count(lit(1)).as("n_users"), sum($"cents").as("total_cents"),
        sum($"i" * $"cents").as("rank_weighted"))
      .select($"n_users", $"total_cents",
        (lit(2L) * $"rank_weighted" - ($"n_users" + 1) * $"total_cents")
          .as("gini_num"),
        ($"n_users" * $"total_cents").as("gini_den"))
      .withColumn("gini_e6",
        when($"gini_den" > 0,
          floor($"gini_num".cast("double") / $"gini_den"
            * lit(1000000.0))))
  }

  /** Wald–Wolfowitz runs test on the daily revenue delta sign per
    * event type — "are up-days and down-days randomly interleaved,
    * or does the series trend/mean-revert?": the randomness
    * diagnostic read on residuals after q_stl_decompose/q_theil_sen
    * detrending. Signs, run boundaries (sign ≠ previous sign), and
    * the (n₊, n₋) counts are exact integers from two lag windows
    * over the calendar-cardinality daily table; zero-deltas drop
    * (the standard convention). The normal approximation
    * z = (R − E[R])/√Var[R] is a per-row double on those integers,
    * floor·1e6, null-guarded for degenerate one-sided series. */
  private def runsTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val byDay = W.partitionBy($"event_type").orderBy($"day".asc)
    val signs = dailyCents(s, d)
      .withColumn("prev", lag($"cents", 1).over(byDay))
      .filter($"prev".isNotNull && $"cents" =!= $"prev")
      .withColumn("s", when($"cents" > $"prev", 1L).otherwise(-1L))
      .withColumn("prev_s", lag($"s", 1).over(byDay))
    signs
      .groupBy($"event_type")
      .agg(
        sum(when($"s" === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when($"s" === -1L, 1L).otherwise(0L)).as("n_down"),
        (sum(when($"prev_s".isNotNull && $"s" =!= $"prev_s", 1L)
          .otherwise(0L)) + 1L).as("n_runs"))
      .withColumn("m", lit(2.0) * $"n_up" * $"n_down"
        / ($"n_up" + $"n_down") + lit(1.0))
      .withColumn("v", lit(2.0) * $"n_up" * $"n_down"
        * (lit(2.0) * $"n_up" * $"n_down" - $"n_up" - $"n_down")
        / (($"n_up" + $"n_down").cast("double")
          * ($"n_up" + $"n_down")
          * ($"n_up" + $"n_down" - 1)))
      .select($"event_type", $"n_up", $"n_down", $"n_runs",
        when($"n_up" > 0 && $"n_down" > 0 && $"v" > 0,
          floor(($"n_runs" - $"m") / sqrt($"v") * lit(1000000.0)))
          .as("z_e6"))
  }

  /** McNemar's test for PAIRED binary outcomes — "did the same user
    * purchase in the first semi-month vs the second?": the
    * within-subject companion to the two-cohort z/t tests (those
    * compare DIFFERENT users; McNemar conditions on the discordant
    * pairs of the SAME user, so between-user variance cancels). The
    * 2×2 concordance table comes from one per-user aggregate (two
    * MAX-of-indicator bits per user — map-side combinable) collapsed
    * to four global cells; the statistic (|b−c|−1)²/(b+c) with
    * continuity correction is pure BIGINT arithmetic to the end —
    * no float anywhere, engine-identical by construction. Shape:
    * one user-keyed exchange collapsing to a single row; at 100 TB
    * the per-user bits combine map-side so the wire carries one row
    * per user, never per event. */
  private def mcnemar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase" &&
          dayofmonth($"ts") <= 15, 1L).otherwise(0L)).as("pa"),
        max(when($"event_type" === "purchase" &&
          dayofmonth($"ts") > 15, 1L).otherwise(0L)).as("pb"))
    per.agg(
        sum(when($"pa" === 0 && $"pb" === 0, 1L).otherwise(0L)).as("n00"),
        sum(when($"pa" === 0 && $"pb" === 1, 1L).otherwise(0L)).as("n01"),
        sum(when($"pa" === 1 && $"pb" === 0, 1L).otherwise(0L)).as("n10"),
        sum(when($"pa" === 1 && $"pb" === 1, 1L).otherwise(0L)).as("n11"))
      .select($"n00", $"n01", $"n10", $"n11",
        when($"n01" + $"n10" > 0,
          expr("(n10 - n01) * (n10 - n01) * 1000000 div (n10 + n01)"))
          .as("mcnemar_e6"),
        when($"n01" + $"n10" > 0,
          expr("""(abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1000000
                  div (n10 + n01)""")).as("mcnemar_cc_e6"))
  }

  /** Cochran's Q — k-treatment generalization of McNemar over the
    * user×event-type participation matrix (x_ij = 1 iff user i ever
    * emitted type j): "do the five event types have equal user
    * penetration, accounting for per-user activity?" Row sums R_i and
    * column sums C_j each come from one distinct-cell aggregate;
    * Q = (k−1)(k·ΣC² − N²)/(k·N − ΣR²). The cross products k·ΣC² and
    * N² are formed in DOUBLE (they exceed int64 once C_j reaches
    * ~1.4e9 users — the cramersV lesson) on exact BIGINT inputs, so
    * both engines evaluate the identical IEEE expression; the single
    * output cell is floor·1e6 fixed-point. Shape: distinct() is one
    * (user,type)-keyed exchange that combines map-side; everything
    * after is |users|+k rows. */
  private def cochranQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pres = Tables.events(s, d)
      .select($"user_id", $"event_type").distinct()
    val rAgg = pres.groupBy($"user_id")
      .agg(count(lit(1)).as("r_i"))
      .agg(count(lit(1)).as("n_users"), sum($"r_i").as("n_tot"),
        sum($"r_i" * $"r_i").as("sum_r2"))
    val cAgg = pres.groupBy($"event_type")
      .agg(count(lit(1)).as("c_j"))
      .agg(count(lit(1)).as("k"), sum($"c_j" * $"c_j").as("sum_c2"))
    rAgg.crossJoin(cAgg)
      .select($"n_users", $"k", $"n_tot", $"sum_r2", $"sum_c2",
        when($"k" * $"n_tot" - $"sum_r2" > 0,
          floor(($"k" - 1).cast("double")
            * ($"k".cast("double") * $"sum_c2"
              - $"n_tot".cast("double") * $"n_tot")
            / ($"k".cast("double") * $"n_tot"
              - $"sum_r2".cast("double"))
            * lit(1000000.0)).cast("long")).as("q_e6"))
  }

  /** Friedman rank test — the BLOCKED k-sample location test the
    * battery lacked: within each complete calendar day (block), rank
    * the k event types by daily revenue, then test whether the rank
    * sums differ (Kruskal–Wallis ranks globally; Friedman ranks
    * within blocks, removing day-level effects such as weekends).
    * Midranks use the battery's doubled-midrank convention
    * (2·midrank = 2·prev + g + 1 from the per-block value grid —
    * integral even under ties), so rank sums R2_j stay exact BIGINT;
    * with R_j = R2_j/2 the statistic 12/(nk(k+1))·ΣR_j² − 3n(k+1)
    * reduces to 3·ΣR2_j²/(nk(k+1)) − 3n(k+1) — all-integer with div.
    * Kendall's W = χ²/(n(k−1)) tags on as the effect size. Integer
    * headroom: ΣR2² ≤ k(2kn)² stays under int64 through ~1e6 blocks
    * (blocks are CALENDAR days — never row-scale). Shape: one
    * (day,type) rollup, per-day windows over ≤k rows, k-row tail. */
  private def friedman(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cell = Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"day", $"event_type")
      .agg(sum($"cents").as("cents"))
    val kRow = cell.select($"event_type").distinct()
      .agg(count(lit(1)).as("k"))
    val complete = cell
      .withColumn("m", count(lit(1)).over(W.partitionBy($"day")))
      .crossJoin(broadcast(kRow))
      .filter($"m" === $"k")
    val cum = W.partitionBy($"day").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val grid = complete.groupBy($"day", $"cents")
      .agg(count(lit(1)).as("g"))
      .withColumn("prev", sum($"g").over(cum) - $"g")
    val perType = complete.join(grid, Seq("day", "cents"))
      .select($"event_type", (lit(2L) * $"prev" + $"g" + 1).as("rank2"))
      .groupBy($"event_type")
      .agg(sum($"rank2").as("r2_j"), count(lit(1)).as("n_blocks"))
    perType
      .agg(max($"n_blocks").as("n"), count(lit(1)).as("k"),
        sum($"r2_j" * $"r2_j").as("sum_r2sq"))
      .select($"n", $"k", $"sum_r2sq",
        (expr("3 * sum_r2sq * 1000000 div (n * k * (k + 1))")
          - lit(3L) * $"n" * ($"k" + 1) * 1000000L).as("chi2_e6"))
      // greatest(·,0): integer-div flooring can leave chi2_e6 at −1
      // under exact H0, and negative div diverges across engines
      // (Spark div truncates toward zero, DuckDB // floors).
      .withColumn("w_e6", expr("greatest(chi2_e6, 0L) div (n * (k - 1))"))
  }

  /** PAGE'S L test (Page 1963) for ORDERED alternatives across the
    * same day-blocks [[friedman]] ranks — Friedman asks "do the k
    * treatments differ AT ALL?"; Page asks the sharper monotone
    * question "do they INCREASE along a hypothesized order?" (here
    * the alphabetical event-type order — the demonstration ordering,
    * as with [[jonckheere]]). Reuses Friedman's exact block machinery
    * verbatim: complete day blocks, doubled midranks
    * (2·avg = 2·prev + g + 1 on the per-block cent grid), per-type
    * rank sums R2_j — then L2 = Σ_j j·R2_j with j the type's 1-based
    * lex index, E[L2] = m·k(k+1)²/2, and (the turningPoints device)
    * the z ships as the sign-carried EXACT rational
    * z2_e6 = 36·10⁶·(L2−E)² div (m·k²(k+1)(k²−1)) — the no-ties null
    * variance, the standard convention (midranks only perturb it
    * O(tie mass); documented, not hidden). Flag |z| ≥ 1.96 ⟺
    * magnitude ≥ 3 841 600. Shape: Friedman's calendar-bounded grid
    * walk plus one k-row ordered index (bounded global window —
    * whitelisted). */
  private def pageTrend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cell = Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"day", $"event_type")
      .agg(sum($"cents").as("cents"))
    val kRow = cell.select($"event_type").distinct()
      .agg(count(lit(1)).as("k"))
    val complete = cell
      .withColumn("m", count(lit(1)).over(W.partitionBy($"day")))
      .crossJoin(broadcast(kRow))
      .filter($"m" === $"k")
    val cum = W.partitionBy($"day").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val grid = complete.groupBy($"day", $"cents")
      .agg(count(lit(1)).as("g"))
      .withColumn("prev", sum($"g").over(cum) - $"g")
    val perType = complete.join(grid, Seq("day", "cents"))
      .select($"event_type", (lit(2L) * $"prev" + $"g" + 1).as("rank2"))
      .groupBy($"event_type")
      .agg(sum($"rank2").as("r2_j"), count(lit(1)).as("n_blocks"))
      // the hypothesized order: 1-based alphabetical type index
      // (k-row frame — bounded global window)
      .withColumn("j", row_number()
        .over(W.orderBy($"event_type".asc)).cast("long"))
    perType
      .agg(max($"n_blocks").as("m"), count(lit(1)).as("k"),
        sum($"j" * $"r2_j").as("l2"))
      .select($"m", $"k", $"l2",
        ($"m" * $"k" * ($"k" + 1) * ($"k" + 1)).as("e_l2_x2"))
      .withColumn("dev2", $"l2" * 2 - $"e_l2_x2")
      // k = 1 zeroes the variance denominator: Spark div would yield
      // NULL while DuckDB // raises — pin the degenerate case to NULL
      // on both engines (guard mirrors the KMV vk==0 pattern)
      .withColumn("mag", expr(
        "case when k < 2 then cast(null as bigint) else" +
          " cast(36000000 * cast(dev2 as decimal(38,0)) * dev2" +
          " div (4 * m * k * k * (k + 1) * (k * k - 1)) as bigint) end"))
      .select($"m", $"k", $"l2",
        when($"dev2" >= 0, $"mag").otherwise(-$"mag").as("z2_e6"),
        ($"mag" >= 3841600L).as("ordered_trend_5pct"))
  }

  /** JONCKHEERE–TERPSTRA test (Jonckheere 1954) for ordered
    * k-sample alternatives on the VALUE axis — the between-subjects
    * sibling of [[pageTrend]] (no blocks): do the k groups' value
    * distributions shift monotonically along the hypothesized
    * (alphabetical) group order? The pairwise-group Mann–Whitney sum
    * 2U = Σ_{t1<t2} (2·#{x<y} + #{x=y}) computes WITHOUT any pair
    * fan: on the (type × distinct-cents) grid, a per-type
    * cumulative-less window then a per-cents prefix-over-earlier-
    * types window turn 2U into one linear pass — the grid walks
    * VALUES, never rows (the kruskalWallis whitelist argument), so
    * the shape survives any event volume. E[2U] = (n² − Σn_i²)/2
    * exactly (ties included: P(<)+P(>)+P(=) telescopes), and z ships
    * sign-carried exact: z2_e6 = 18·10⁶·dev² div
    * (n²(2n+3) − Σn_i²(2n_i+3)) — the standard no-ties variance
    * (documented convention; headroom: dev² ≤ n⁴/4 keeps
    * 18·10⁶·dev² inside decimal(38,0) through ~100× this volume).
    * Flag ≥ 3 841 600 ⟺ |z| ≥ 1.96. */
  private def jonckheere(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val vals = centsSplit(s, d)
      .groupBy($"event_type", $"cents").agg(count(lit(1)).as("cnt"))
    val types = vals.select($"event_type").distinct()
    // dense (type × cents) lattice so the rows-frame cumulative IS
    // the value-semantics cumulative (every cents appears exactly
    // once per type) — k·|distinct cents| rows, value-range bounded
    val full = vals.select($"cents").distinct()
      .crossJoin(broadcast(types))
      .join(vals, Seq("event_type", "cents"), "left")
      .na.fill(0L, Seq("cnt"))
    val wLess = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val wPrevTypes = W.partitionBy($"cents").orderBy($"event_type".asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val lattice = full
      .withColumn("cum_less", coalesce(sum($"cnt").over(wLess), lit(0L)))
      .withColumn("less_prev",
        coalesce(sum($"cum_less").over(wPrevTypes), lit(0L)))
      .withColumn("eq_prev",
        coalesce(sum($"cnt").over(wPrevTypes), lit(0L)))
    val u2 = lattice
      .agg(sum($"cnt" * (lit(2L) * $"less_prev" + $"eq_prev")).as("u2"))
    val sizes = vals.groupBy($"event_type").agg(sum($"cnt").as("n_i"))
      .agg(sum($"n_i").as("n"), sum($"n_i" * $"n_i").as("sum_ni2"),
        // n³-scale terms in decimal(38,0): int64 tops out at n≈1.6e6
        expr("sum(cast(n_i as decimal(38,0)) * n_i * (2 * n_i + 3))")
          .as("var_sub"),
        count(lit(1)).as("k_groups"))
    u2.crossJoin(sizes)
      .withColumn("e_u2", expr("(n * n - sum_ni2) div 2")) // exact: even
      .withColumn("var_u72",
        expr("cast(n as decimal(38,0)) * n * (2 * n + 3) - var_sub"))
      .withColumn("dev", $"u2" - $"e_u2")
      .withColumn("mag", expr(
        "case when var_u72 > 0 then" +
          " cast(18000000 * cast(abs(dev) as decimal(38,0)) * abs(dev)" +
          " div var_u72 as bigint) else 0L end"))
      .select($"k_groups", $"n", $"u2", $"e_u2",
        $"var_u72".cast("long").as("var_u72"),
        when($"dev" >= 0, $"mag").otherwise(-$"mag").as("z2_e6"),
        ($"mag" >= 3841600L).as("ordered_shift_5pct"))
  }

  /** CLIFF'S DELTA (Cliff 1993) — the ORDINAL effect size for the
    * [[mannWhitney]] split: δ = (#{x>y} − #{x<y}) / (n_x·n_y) over
    * all cross-arm pairs (x = odd event_ids, y = even — the
    * [[centsSplit]] arms), the dominance measure that stays
    * meaningful where Cohen's d's variance normalization lies (heavy
    * tails, ordinal grids). Pair counts collapse on the per-type
    * cent grid with one cumulative window (gt = Σ cnt_x·cumLess_y,
    * lt = Σ cnt_x·(n_y − cum_y)), so the computation walks values,
    * never pairs. δ ships exact: delta_e6 = sign·10⁶·|gt−lt| div
    * (n_x·n_y), with the Romano et al. magnitude bands (0.147 /
    * 0.33 / 0.474) as a label — thresholds on the e6 grid, no
    * floats. */
  private def cliffsDelta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val g = centsSplit(s, d)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("trt_cnt"))
    val cum = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val walked = g
      .withColumn("cum_ref", sum($"ref_cnt").over(cum))
      .withColumn("less_ref", $"cum_ref" - $"ref_cnt")
      .withColumn("n_ref_t",
        max($"cum_ref").over(W.partitionBy($"event_type")))
    val agg = walked.groupBy($"event_type")
      .agg(sum($"ref_cnt").as("n_ref"), sum($"trt_cnt").as("n_trt"),
        sum($"trt_cnt" * $"less_ref").as("gt"),
        sum($"trt_cnt" * ($"n_ref_t" - $"cum_ref")).as("lt"))
    agg
      // an arm with zero rows for a type zeroes n_ref·n_trt: Spark
      // div gives NULL (and the label chain would fall to 'large'),
      // DuckDB // raises — pin the degenerate case to NULL on both
      .withColumn("mag",
        when($"n_ref" * $"n_trt" === 0L, lit(null).cast("long"))
          .otherwise(expr("abs(gt - lt) * 1000000 div (n_ref * n_trt)")))
      .select($"event_type", $"n_ref", $"n_trt", $"gt", $"lt",
        when($"gt" >= $"lt", $"mag").otherwise(-$"mag").as("delta_e6"),
        when($"mag".isNull, lit(null).cast("string"))
          .when($"mag" < 147000L, "negligible")
          .when($"mag" < 330000L, "small")
          .when($"mag" < 474000L, "medium")
          .otherwise("large").as("magnitude"))
  }

  /** Cohen's d / Hedges' g — the EFFECT SIZE the battery's p-values
    * lack: a significant Welch t on 1e9 rows can reflect a trivially
    * small shift, so the accept/reject layer needs the standardized
    * mean difference too. Same exact-integer moment rollup as
    * [[welchTTest]] (n, Σx, Σx² per arm, one map-side-combinable
    * groupBy); d = (m̄₁−m̄₂)/s_pooled and the small-sample correction
    * g = d·(1 − 3/(4(n₁+n₂)−9)) are per-row doubles on those BIGINTs
    * with the Σx·Σx products formed in DOUBLE (int64-safe at any
    * scale), emitted floor·1e6. Guards mirror welchTTest: both arms
    * need n > 1 and positive pooled variance. */
  private def cohensD(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = centsSplit(s, d)
      .groupBy($"event_type")
      .agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("n1"),
        sum(when($"is_ref", $"cents").otherwise(0L)).as("s1"),
        sum(when($"is_ref", $"cents" * $"cents").otherwise(0L)).as("ss1"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n2"),
        sum(when(!$"is_ref", $"cents").otherwise(0L)).as("s2"),
        sum(when(!$"is_ref", $"cents" * $"cents").otherwise(0L)).as("ss2"))
      .filter($"n1" > 1 && $"n2" > 1)
    val sp2 = (($"ss1" - $"s1".cast("double") * $"s1"
      / $"n1".cast("double"))
      + ($"ss2" - $"s2".cast("double") * $"s2"
        / $"n2".cast("double"))) / ($"n1" + $"n2" - 2).cast("double")
    val dStat = ($"s1".cast("double") / $"n1".cast("double")
      - $"s2".cast("double") / $"n2".cast("double")) / sqrt(sp2)
    m.select($"event_type", $"n1", $"n2",
        when(sp2 > 0, floor(dStat * lit(1000000.0)).cast("long"))
          .as("d_e6"),
        when(sp2 > 0, floor(dStat
          * (lit(1.0) - lit(3.0)
            / (lit(4.0) * ($"n1" + $"n2") - lit(9.0)))
          * lit(1000000.0)).cast("long")).as("g_e6"))
  }

  /** Mutual information between event type and day-of-week — the
    * INFORMATION-THEORETIC association measure beside Cramér's V
    * (χ²-based): MI = Σᵢⱼ pᵢⱼ·ln(pᵢⱼ/(pᵢ·pⱼ)) answers "how many nats
    * does knowing the weekday buy about the event mix" and feeds
    * feature selection directly. Same one-pass cell/margin windows as
    * [[cramersV]]; every per-cell and per-margin entropy term is a
    * double on exact BIGINT counts floored to e9 BEFORE the sum
    * (floor-then-sum — order-independent), and the normalized
    * variant NMI = MI/√(H_x·H_y) finishes per-row on the three
    * BIGINTs. The o·n / rx·ry cross products are formed in DOUBLE
    * (int64-safe at any scale — the cramersV lesson). ln is libm:
    * e9-floor boundary exposure ~1e-7 per cell, the corpus'
    * accepted rate. Shape: one map-side-combinable groupBy,
    * |types|·7 cells, 1-row tail. */
  private def mutualInformation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, d)
      .groupBy($"event_type".as("x"),
        dayofweek($"ts").cast("long").as("y"))
      .agg(count(lit(1)).as("o"))
      .withColumn("rx", sum($"o").over(W.partitionBy($"x")))
      .withColumn("ry", sum($"o").over(W.partitionBy($"y")))
      .withColumn("n", sum($"o").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    val mi = cells
      .select(($"o".cast("double") / $"n"
        * log($"o".cast("double") * $"n"
          / ($"rx".cast("double") * $"ry"))).as("term"), $"n")
      .agg(sum(floor($"term" * lit(1000000000.0)).cast("long"))
        .as("mi_e9"), max($"n").as("n"))
    val hx = cells.groupBy($"x")
      .agg(max($"rx").as("rx"), max($"n").as("n"))
      .agg(sum(floor(-($"rx".cast("double") / $"n")
        * log($"rx".cast("double") / $"n") * lit(1000000000.0))
        .cast("long")).as("hx_e9"))
    val hy = cells.groupBy($"y")
      .agg(max($"ry").as("ry"), max($"n").as("n"))
      .agg(sum(floor(-($"ry".cast("double") / $"n")
        * log($"ry".cast("double") / $"n") * lit(1000000000.0))
        .cast("long")).as("hy_e9"))
    mi.crossJoin(hx).crossJoin(hy)
      .select($"n", $"mi_e9", $"hx_e9", $"hy_e9",
        when($"hx_e9" > 0 && $"hy_e9" > 0,
          floor($"mi_e9".cast("double")
            / sqrt($"hx_e9".cast("double") * $"hy_e9")
            * lit(1000000.0)).cast("long")).as("nmi_e6"))
  }

  /** Jensen–Shannon divergence between the reference and current
    * revenue-band distributions per event type — the BOUNDED,
    * symmetric drift score beside q_psi_drift (PSI explodes on
    * empty bins; JS ≤ ln 2 always, the property that makes it the
    * standard training-data drift gate). Bands are exact integer
    * cents div 2000 (~$20 buckets); both one-sided KL(p‖m) and
    * KL(q‖m) accumulate floor-then-sum e9 terms (zero-count cells
    * contribute exactly zero and are skipped by the when-guard), and
    * JS = (KL_pm+KL_qm)/2 finishes as floor of a double halving —
    * exact for any int sum, deterministic even if a floored sum
    * lands at −1. One groupBy to |types|·|bands| cells, margins by
    * window, |types|-row tail. */
  private def jsDivergence(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cells = centsSplit(s, d)
      .groupBy($"event_type", expr("cents div 2000").as("band"))
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("a"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("b"))
      .withColumn("na", sum($"a").over(W.partitionBy($"event_type")))
      .withColumn("nb", sum($"b").over(W.partitionBy($"event_type")))
    val p = $"a".cast("double") / $"na"
    val q = $"b".cast("double") / $"nb"
    val m = (p + q) / lit(2.0)
    val terms = cells.select($"event_type", $"na", $"nb",
      when($"a" > 0, floor(p * log(p / m) * lit(1000000000.0))
        .cast("long")).otherwise(0L).as("tp_e9"),
      when($"b" > 0, floor(q * log(q / m) * lit(1000000000.0))
        .cast("long")).otherwise(0L).as("tq_e9"))
    terms.groupBy($"event_type")
      .agg(max($"na").as("n_ref"), max($"nb").as("n_cur"),
        sum($"tp_e9").as("kl_pm_e9"), sum($"tq_e9").as("kl_qm_e9"))
      .withColumn("js_e9",
        floor(($"kl_pm_e9" + $"kl_qm_e9").cast("double") / lit(2.0))
          .cast("long"))
  }

  /** Exact 1-D Wasserstein-1 (earth mover) distance between the
    * reference and current revenue distributions per event type —
    * the drift metric with UNITS (cents of probability mass moved),
    * complementing JS (bounded, unitless) and PSI (bin-dependent):
    * W₁ = ∫|F_ref − F_cur| dx over the EXACT cent value grid, no
    * binning anywhere. Everything is BIGINT: cumulative counts from
    * one cents-grid window, the integrand |A·nb − B·na|·gap as exact
    * cross products, one integer division at the end (w1_e2, units
    * of 1e-2 cents). Integer headroom: the summed numerator is
    * na·nb·W₁ ≈ n²·(typical shift) — past ~1e7 rows/arm swap the
    * accumulator to decimal(38,0) (the corpus' standard widen note).
    * Shape: map-side-combinable (type, cents) rollup, windows over
    * the value-grid cardinality, |types|-row tail. */
  private def wassersteinDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy($"event_type").orderBy($"cents".asc)
    val cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    val grid = centsSplit(s, d)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("a"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("b"))
      .withColumn("cum_a", sum($"a").over(cum))
      .withColumn("cum_b", sum($"b").over(cum))
      .withColumn("gap", lead($"cents", 1).over(w) - $"cents")
      .withColumn("na", sum($"a").over(W.partitionBy($"event_type")))
      .withColumn("nb", sum($"b").over(W.partitionBy($"event_type")))
    grid
      .filter($"gap".isNotNull)
      .groupBy($"event_type")
      .agg(max($"na").as("n_ref"), max($"nb").as("n_cur"),
        (count(lit(1)) + 1).as("m_support"),
        sum(abs($"cum_a" * $"nb" - $"cum_b" * $"na") * $"gap")
          .as("w1_num"))
      .withColumn("w1_e2", expr("w1_num * 100 div (n_ref * n_cur)"))
  }

  /** Per-type mean-centered daily series on a deterministic 1e-4 grid:
    * each day's deviation from the series mean, scaled by the series
    * RANGE and floored to integer ten-thousandths. The deviation is
    * carried as the exact BIGINT n·x − Σx (clears the mean's division)
    * and the scale as the exact BIGINT n·(max − min), so the only
    * float op is ONE correctly-rounded divide before the floor —
    * bit-identical in both engines — and every downstream moment sum
    * runs on small exact integers (|z| ≤ 1e4 ⇒ Σz⁴ fits int64 past
    * 9e5 days/series). Series with < 8 days or zero range are
    * excluded: no variance to normalize by. Shape: the daily rollup is
    * map-side combinable; the |types|-row totals broadcast back. */
  private def zGridDaily(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = dailyCents(s, d)
    val tot = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sc"),
        min($"cents").as("mn"), max($"cents").as("mx"))
      .filter($"n" >= 8 && $"mx" > $"mn")
    daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("z_e4",
        floor(($"n" * $"cents" - $"sc").cast("double") * lit(10000.0) /
          ($"n" * ($"mx" - $"mn"))))
  }

  /** Paired t-test per event type — each USER is their own control:
    * the pre/post difference d_u = (odd-day spend) − (even-day spend)
    * cancels all between-user variance, which is why paired designs
    * need far fewer units than [[welchTTest]]'s independent samples.
    * One (type,user) rollup builds the differences as exact integer
    * cents; n, Σd, Σd² (DECIMAL(38,0)/HUGEINT) feed the closed form
    * t = d̄ / (s_d/√n) = Σd·√(n−1) / √(n·Σd² − (Σd)²), emitted as
    * floor·e6 beside the exact integer moments. Guarded on n > 1 and
    * positive variance (the welch lesson). */
  private def pairedTTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pairedDiffs(s, d).groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"dd").as("sd"),
        sum($"dd".cast("decimal(38,0)") * $"dd").as("sdd"))
      .withColumn("var_n2",
        $"n" * $"sdd" - $"sd".cast("decimal(38,0)") * $"sd")
      .filter($"n" > 1 && $"var_n2" > 0)
      .select($"event_type", $"n", $"sd",
        floor($"sd".cast("double") *
          sqrt(($"n" - 1).cast("double")) /
          sqrt($"var_n2".cast("double")) * lit(1000000.0)).as("t_e6"))
  }

  /** Per-(type, user) paired differences shared by [[pairedTTest]],
    * [[wilcoxonSignedRank]], and [[signTest]]: odd-day spend − even-
    * day spend in exact cents (each user their own control). */
  private def pairedDiffs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
          % 2 === 0).as("pre"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"user_id")
      .agg((sum(when(!$"pre", $"cents").otherwise(0L)) -
        sum(when($"pre", $"cents").otherwise(0L))).as("dd"))
  }

  /** WILCOXON SIGNED-RANK test — [[pairedTTest]]'s nonparametric twin
    * on the SAME per-user paired differences: ranks |d| instead of
    * averaging d, so one whale's swing can't carry the test. Zero
    * differences drop (the standard Wilcoxon convention); |d| ranks
    * come doubled off the per-type |d| grid (2·avg = 2·prev + g + 1,
    * the [[kruskalWallis]] midrank machinery, so ties stay integral);
    * W2⁺ = Σ_{d>0} rank2 with E[W2⁺] = n(n+1)/2 exactly and
    * Var[W2⁺]·12 = 2n(n+1)(2n+1) − Σ(t³−t) (tie-corrected, exact —
    * t³−t is divisible by 6). The z ships sign-carried exact:
    * z2_e6 = 12·10⁶·dev² div V12, flag ≥ 3 841 600 ⟺ |z| ≥ 1.96.
    * Shape: one (type,user) rollup, then windows on the per-type |d|
    * VALUE grid — user cardinality never enters a frame. */
  private def wilcoxonSignedRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val diffs = pairedDiffs(s, d).filter($"dd" =!= 0L)
      .select($"event_type", $"dd", abs($"dd").as("ad"))
    val cum = W.partitionBy($"event_type").orderBy($"ad".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val grid = diffs.groupBy($"event_type", $"ad")
      .agg(count(lit(1)).as("g"),
        sum(when($"dd" > 0, 1L).otherwise(0L)).as("pos"))
      .withColumn("prev", sum($"g").over(cum) - $"g")
    val ranks = grid.groupBy($"event_type")
      .agg(sum($"g").as("n"),
        sum($"pos" * (lit(2L) * $"prev" + $"g" + 1)).as("w2_pos"),
        sum($"g" * $"g" * $"g" - $"g").as("tie_num"))
    ranks
      .withColumn("e2", expr("n * (n + 1) div 2")) // exact: even
      .withColumn("v12", expr(
        "2 * cast(n as decimal(38,0)) * (n + 1) * (2 * n + 1)" +
          " - tie_num"))
      .withColumn("dev", $"w2_pos" - $"e2")
      .withColumn("mag", expr(
        "case when v12 > 0 then" +
          " cast(12000000 * cast(abs(dev) as decimal(38,0)) * abs(dev)" +
          " div v12 as bigint) else 0L end"))
      .select($"event_type", $"n", $"w2_pos", $"e2".cast("long").as("e2"),
        $"v12".cast("long").as("v12"),
        when($"dev" >= 0, $"mag").otherwise(-$"mag").as("z2_e6"),
        ($"mag" >= 3841600L).as("shift_5pct"))
  }

  /** SIGN TEST on the same paired differences — the assumption-free
    * floor under [[wilcoxonSignedRank]] (uses only the SIGNS, so it
    * survives even ordinal-scale garbage where ranks are suspect).
    * Zeros drop; with continuity correction the z ships sign-carried
    * exact: z2_e6 = 10⁶·(|n⁺−n⁻|−1)² div n (the mann_kendall (|S|−1)
    * device), flag ≥ 3 841 600. One rollup, |types| rows. */
  private def signTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pairedDiffs(s, d).filter($"dd" =!= 0L)
      .groupBy($"event_type")
      .agg(sum(when($"dd" > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when($"dd" < 0, 1L).otherwise(0L)).as("n_neg"))
      .withColumn("n", $"n_pos" + $"n_neg")
      .withColumn("mag", expr(
        "case when n > 0 and abs(n_pos - n_neg) > 1 then" +
          " (abs(n_pos - n_neg) - 1) * (abs(n_pos - n_neg) - 1)" +
          " * 1000000 div n else 0L end"))
      .select($"event_type", $"n", $"n_pos", $"n_neg",
        when($"n_pos" >= $"n_neg", $"mag").otherwise(-$"mag")
          .as("z2_e6"),
        ($"mag" >= 3841600L).as("shift_5pct"))
  }

  /** Overdispersion (variance-to-mean) index of the daily event
    * counts — the Poisson sanity check run before anyone models
    * arrivals: for a Poisson process D = s²/m = 1; D ≫ 1 means
    * burstiness/clumping (retries, bots, campaigns) and every
    * Poisson-assuming alert threshold is wrong. Clears to ONE exact
    * rational D = (nΣy² − (Σy)²) / ((n−1)·Σy) on the daily-count
    * grain — no float anywhere, int64 everywhere (counts are small). */
  private def overdispersion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"y").as("sy"),
        sum($"y" * $"y").as("syy"))
      .filter($"n_days" > 1 && $"sy" > 0)
      .withColumn("disp_num", $"n_days" * $"syy" - $"sy" * $"sy")
      .withColumn("disp_e3", expr(
        "disp_num * 1000 div ((n_days - 1) * sy)"))
      .withColumn("overdispersed", $"disp_e3" > 1000L)
  }

  /** Kernel two-sample drift via MOMENT CLOSURE — MMD² with the
    * degree-2 polynomial kernel k(x,y) = (1 + xy/c)², which expands
    * so every pair expectation collapses to moments:
    * MMD² = 2(μ_r − μ_c)²/c + (q_r − q_c)²/c² with μ = Σx/n and
    * q = Σx²/n — the kernel test WITHOUT the O(n²) pair join that
    * makes Gaussian-kernel MMD intractable at 100 TB. Detects both
    * mean and spread drift in one number (KS/W1 complement). The
    * scale c is the squared global reference mean, so the statistic
    * is dimensionless. Exact moments (Σx² on DECIMAL(38,0)/HUGEINT);
    * the closed form is a short identical double tree floored to e9.
    * One map-side aggregate, |types| rows. */
  private def mmdDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = centsSplit(s, d)
      .groupBy($"event_type")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("n_r"),
        sum(when($"is_ref", $"cents").otherwise(0L)).as("s_r"),
        sum(when($"is_ref", $"cents".cast("decimal(38,0)") * $"cents")
          .otherwise(lit(0).cast("decimal(38,0)"))).as("q_r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n_c"),
        sum(when(!$"is_ref", $"cents").otherwise(0L)).as("s_c"),
        sum(when(!$"is_ref", $"cents".cast("decimal(38,0)") * $"cents")
          .otherwise(lit(0).cast("decimal(38,0)"))).as("q_c"))
      .filter($"n_r" > 0 && $"n_c" > 0 && $"s_r" > 0)
    m.withColumn("mu_r", $"s_r".cast("double") / $"n_r")
      .withColumn("mu_c", $"s_c".cast("double") / $"n_c")
      .withColumn("qq_r", $"q_r".cast("double") / $"n_r")
      .withColumn("qq_c", $"q_c".cast("double") / $"n_c")
      .withColumn("c_scale", $"mu_r" * $"mu_r")
      .select($"event_type", $"n_r", $"n_c", $"s_r", $"s_c",
        floor((lit(2.0) * ($"mu_r" - $"mu_c") * ($"mu_r" - $"mu_c")
          / $"c_scale"
          + ($"qq_r" - $"qq_c") * ($"qq_r" - $"qq_c")
          / ($"c_scale" * $"c_scale")) * lit(1000000000.0))
          .as("mmd2_e9"))
  }

  /** Energy-distance drift — the two-sample test with FULL
    * distributional sensitivity (mean, spread, shape) that still
    * avoids the O(n²) pair join: every pairwise-|x−y| expectation is
    * an exact prefix-sum integral over the merged value grid
    * (Σ|a−b| = Σ_intervals gap·#straddling-pairs — the wasserstein
    * machinery, applied three times). D = 2E|X−Y| − E|X−X'| −
    * E|Y−Y'| ≥ 0 with equality iff the distributions match. All
    * three integrals are exact BIGINTs; the common-denominator emit
    * e_num = 2·SXY·n_r·n_c·... rides HUGEINT/DECIMAL(38,0) (it wraps
    * int64 at real volumes). Shape: one groupBy on the (type, value)
    * grid, one cumulative window over DISTINCT VALUES (not rows),
    * one |types|-row rollup. */
  private def energyDistance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy($"event_type").orderBy($"cents".asc)
    val cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    val grid = centsSplit(s, d)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("a"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("b"))
      .withColumn("cum_a", sum($"a").over(cum))
      .withColumn("cum_b", sum($"b").over(cum))
      .withColumn("gap", lead($"cents", 1).over(w) - $"cents")
      .withColumn("na", sum($"a").over(W.partitionBy($"event_type")))
      .withColumn("nb", sum($"b").over(W.partitionBy($"event_type")))
    grid.filter($"gap".isNotNull)
      .groupBy($"event_type")
      .agg(max($"na").as("n_r"), max($"nb").as("n_c"),
        sum($"gap" * ($"cum_a" * ($"nb" - $"cum_b")
          + $"cum_b" * ($"na" - $"cum_a"))).as("sxy"),
        sum($"gap" * ($"cum_a" * ($"na" - $"cum_a"))).as("sxx"),
        sum($"gap" * ($"cum_b" * ($"nb" - $"cum_b"))).as("syy"))
      .withColumn("e_num", expr(
        "2 * CAST(sxy AS DECIMAL(38,0)) * n_r * n_c" +
          " - 2 * CAST(sxx AS DECIMAL(38,0)) * n_c * n_c" +
          " - 2 * CAST(syy AS DECIMAL(38,0)) * n_r * n_r"))
      .select($"event_type", $"n_r", $"n_c", $"sxy", $"sxx", $"syy",
        expr("CAST(CAST(e_num AS DECIMAL(38,0)) * 100 div" +
          " (CAST(n_r AS DECIMAL(38,0)) * n_r * n_c * n_c)" +
          " AS BIGINT)").as("energy_e2"))
  }

  /** Split-conformal prediction interval per event type — the
    * distribution-free uncertainty wrapper: fit a (trivially simple)
    * predictor on a TRAIN split, take the ceil(0.9·(n+1))-th smallest
    * absolute residual on a disjoint CALIBRATION split as the
    * interval half-width q̂, and the conformal guarantee says a fresh
    * point lands inside ±q̂ with probability ≥ 90 % — verified here
    * on a third TEST split, all three splits deterministic by
    * event_id mod 4 (train {0,1}, calibrate {2}, test {3}). Float-
    * free throughout: the predictor is the train mean as the exact
    * rational S/n, residuals ride the cross-multiplied |n·x − S|
    * grid, the order statistic is a row_number pick, and coverage is
    * an exact integer comparison + one ppm division. Shape: one
    * grouped pass for the fit, one bounded window on the calibration
    * slice, map-side counting on test. */
  private def conformalInterval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 4).as("split"))
      .filter($"cents".isNotNull)
    val fit = ev.filter($"split" <= 1).groupBy($"event_type")
      .agg(count(lit(1)).as("n_tr"), sum($"cents").as("s_tr"))
    val cal = ev.filter($"split" === 2)
      .join(broadcast(fit), Seq("event_type"))
      .withColumn("r", abs($"n_tr" * $"cents" - $"s_tr"))
    val calN = cal.groupBy($"event_type")
      .agg(count(lit(1)).as("n_cal"))
      .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
    val qh = cal
      .withColumn("rk", row_number().over(W.partitionBy($"event_type")
        .orderBy($"r".asc, $"event_id".asc)))
      .join(broadcast(calN), Seq("event_type"))
      .filter($"rk" === $"k")
      .select($"event_type", $"n_cal", $"k", $"r".as("qhat_scaled"))
    ev.filter($"split" === 3)
      .join(broadcast(fit), Seq("event_type"))
      .join(broadcast(qh), Seq("event_type"))
      .groupBy($"event_type")
      .agg(max($"n_tr").as("n_train"), max($"n_cal").as("n_cal"),
        max($"qhat_scaled").as("qhat_scaled"),
        max(expr("qhat_scaled div n_tr")).as("qhat_cents"),
        count(lit(1)).as("n_test"),
        sum(when(abs($"n_tr" * $"cents" - $"s_tr") <= $"qhat_scaled",
          1L).otherwise(0L)).as("n_covered"))
      .withColumn("coverage_ppm",
        expr("n_covered * 1000000 div n_test"))
  }

  /** Grubbs-style maximum-studentized-deviation screen per
    * daily-revenue series — "is the single most extreme day a
    * statistical outlier, and which day is it": the monitoring
    * question behind every incident-review dashboard. The deviation
    * rides the exact BIGINT d = n·x − Σx (no mean division), and the
    * squared studentized statistic clears to ONE exact rational:
    * G² = (x−x̄)²/s² = d² / (n·Σx² − (Σx)²) — numerator and
    * denominator both exact, the ppm emit carried through
    * DECIMAL(38,0)/HUGEINT because d² wraps int64 at real daily
    * volumes. The 3σ flag is the same algebra cross-multiplied
    * (d² > 9·(nΣx²−S²)), so the whole test is float-free. The peak
    * day is an argmax via min(struct(−|d|, day)) — map-side
    * combinable, deterministic smaller-day tie-break. Shape: daily
    * rollup, |types|-row totals broadcast back, one argmax aggregate. */
  private def grubbsOutlier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = dailyCents(s, d)
    // Σx² (and everything touching it) rides DECIMAL(38,0): n·Σx²
    // exceeds int64 already at sf0.1 daily volumes (365·(1.7e7¢)²).
    val tot = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sc"),
        sum($"cents".cast("decimal(38,0)") * $"cents").as("sq"))
      .withColumn("var_n2",
        $"n" * $"sq" - $"sc".cast("decimal(38,0)") * $"sc")
      .filter($"n" >= 8 && $"var_n2" > 0)
    daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("adev", abs($"n" * $"cents" - $"sc"))
      .groupBy($"event_type")
      .agg(max($"n").as("n_days"), max($"var_n2").as("var_n2"),
        min(struct((-$"adev").as("na"), $"day")).as("pk"))
      .select($"event_type", $"n_days", $"var_n2",
        $"pk.day".as("peak_day"), (-$"pk.na").as("peak_adev"))
      .withColumn("g2_ppm",
        expr("CAST(CAST(peak_adev AS DECIMAL(38,0)) * peak_adev" +
          " * 1000000 div var_n2 AS BIGINT)"))
      .withColumn("beyond_3sigma",
        expr("CAST(peak_adev AS DECIMAL(38,0)) * peak_adev" +
          " > var_n2 * 9"))
      .drop("var_n2")
  }

  /** Rounds of the generalized ESD sweep ([[esdOutliers]]). */
  val EsdRounds = 3

  /** Generalized ESD outlier sweep (Rosner 1983) — the iterative
    * upgrade of [[grubbsOutlier]], which can only name ONE outlier
    * and suffers masking: two spikes shield each other because both
    * inflate the variance. ESD removes the current peak and RETESTS
    * on the shrunken sample, [[EsdRounds]] unrolled rounds; the
    * number of outliers is max{i : round i significant} even when an
    * intermediate round dips below the bar (Rosner's rule — that is
    * the whole point of running past the first failure). Each round
    * reuses the Grubbs exact-integer form: peak deviation
    * |n·x − S| and variance n·Σx² − S² in DECIMAL(38,0)/HUGEINT,
    * significance as adev² > 9·var_n2 (the 3σ convention the Grubbs
    * row pinned), moments updated by SUBTRACTION of the removed row
    * — exact, no recomputation drift. Shape: the calendar-bounded
    * daily table aggregates once per round; each round is one
    * combinable rollup + one argmin-struct peak pick, all tiny. */
  private def esdOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily0 = graft.GraftCaches.getOrPersist(s, s"inf.esd.daily:$d") {
      dailyCents(s, d)
    }
    var remaining = daily0
    val rounds = (1 to EsdRounds).map { r =>
      val tot = remaining.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sc"),
          sum($"cents".cast("decimal(38,0)") * $"cents").as("sq"))
        .withColumn("var_n2",
          $"n" * $"sq" - $"sc".cast("decimal(38,0)") * $"sc")
        .filter($"n" >= 8 && $"var_n2" > 0)
      val peak = remaining.join(broadcast(tot), Seq("event_type"))
        .withColumn("adev", abs($"n" * $"cents" - $"sc"))
        .groupBy($"event_type")
        .agg(max($"n").as("n_eff"), max($"var_n2").as("var_n2"),
          min(struct((-$"adev").as("na"), $"day")).as("pk"))
        .select($"event_type", lit(r.toLong).as("round"), $"n_eff",
          $"var_n2", $"pk.day".as("peak_day"), (-$"pk.na").as("peak_adev"))
        .withColumn("g2_ppm",
          expr("CAST(CAST(peak_adev AS DECIMAL(38,0)) * peak_adev" +
            " * 1000000 div var_n2 AS BIGINT)"))
        .withColumn("significant",
          expr("CAST(peak_adev AS DECIMAL(38,0)) * peak_adev" +
            " > var_n2 * 9"))
      val peakCached = graft.GraftCaches.getOrPersist(s,
        s"inf.esd.r$r:$d")(peak)
      remaining = remaining.join(
        broadcast(peakCached.select($"event_type",
          $"peak_day".as("day"))),
        Seq("event_type", "day"), "left_anti")
      peakCached
    }
    val all = rounds.reduce(_ unionByName _)
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    all
      .withColumn("k_esd", coalesce(
        max(when($"significant", $"round")).over(W), lit(0L)))
      .select($"event_type", $"round", $"peak_day", $"peak_adev",
        $"n_eff", $"g2_ppm", $"significant", $"k_esd")
  }

  /** Unrolled DuckDB replay of [[esdOutliers]]: per round, a moment
    * rollup over the not-yet-removed days, the (adev desc, day asc)
    * peak, and the exact-integer significance test. */
  private def esdOracle: String = {
    val base = """
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      d1 AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS cents
             FROM e GROUP BY 1, 2)"""
    val rounds = (1 to EsdRounds).map { r =>
      s""",
      t$r AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sc,
                     sum(CAST(cents AS HUGEINT) * cents) AS sq
              FROM d$r GROUP BY 1
              HAVING count(*) >= 8
                 AND count(*) * sum(CAST(cents AS HUGEINT) * cents)
                     - CAST(sum(cents) AS HUGEINT) * sum(cents) > 0),
      a$r AS (SELECT d.event_type, d.day,
                     abs(t.n * d.cents - t.sc) AS adev, t.n,
                     t.n * t.sq - CAST(t.sc AS HUGEINT) * t.sc
                       AS var_n2,
                     row_number() OVER (PARTITION BY d.event_type
                       ORDER BY abs(t.n * d.cents - t.sc) DESC,
                                d.day ASC) AS rn
              FROM d$r d JOIN t$r t ON d.event_type = t.event_type),
      p$r AS (SELECT event_type, CAST($r AS BIGINT) AS round,
                     n AS n_eff, day AS peak_day,
                     CAST(adev AS BIGINT) AS peak_adev, var_n2,
                     CAST(CAST(adev AS HUGEINT) * adev * 1000000
                       // var_n2 AS BIGINT) AS g2_ppm,
                     CAST(adev AS HUGEINT) * adev > var_n2 * 9
                       AS significant
              FROM a$r WHERE rn = 1),
      d${r + 1} AS (SELECT d.* FROM d$r d
                    LEFT JOIN p$r p ON p.event_type = d.event_type
                                   AND p.peak_day = d.day
                    WHERE p.event_type IS NULL)"""
    }.mkString
    val union = (1 to EsdRounds).map(r =>
      s"SELECT event_type, round, peak_day, peak_adev, n_eff, g2_ppm," +
        s" significant FROM p$r").mkString(" UNION ALL ")
    s"""$base$rounds,
      allr AS ($union)
      SELECT event_type, round, peak_day, peak_adev, n_eff, g2_ppm,
             significant,
             coalesce(max(CASE WHEN significant THEN round END)
               OVER (PARTITION BY event_type), 0) AS k_esd
      FROM allr"""
  }

  /** Difference-in-differences — the workhorse quasi-experimental
    * estimator the A/B family (q_ab_test through q_cuped) cannot
    * replace when assignment isn't randomized: treatment = odd
    * user_id, post = the second half of the observed day range
    * (integer midpoint cutoff), outcome = purchase cents. The 2×2
    * cell means collapse to ONE exact rational over the common
    * denominator n₁n₂n₃n₄ —
    * DiD = S_tp/n_tp − S_tr/n_tr − S_cp/n_cp + S_cr/n_cr — emitted
    * as a single integer division to micro-cents (numerator ≈
    * Σ·n³ ≤ ~1e30 in DECIMAL(38,0)/HUGEINT). The parallel-trends
    * DIAGNOSTIC rides along: the same contrast computed on a fake
    * cutoff INSIDE the pre period must be ~0 for the design to be
    * credible. Shape: one conditional aggregate over events — four
    * cells and eight moments in a single map-side-combinable pass. */
  private def diffInDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(($"user_id" % 2 === 1).as("treated"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cuts = base.agg(
        expr("(min(dayn) + max(dayn)) div 2").as("cut"),
        expr("(3 * min(dayn) + max(dayn)) div 4").as("fake_cut"))
    // real contrast: post vs pre around `cut`; placebo contrast runs
    // ENTIRELY inside the pre period (fake post = (fake_cut, cut],
    // fake pre = <= fake_cut) — parallel trends predicts ~0 there
    def cells(post: org.apache.spark.sql.Column, pre: org.apache.spark.sql.Column) = Seq(
      ("tp", $"treated" && post), ("tr", $"treated" && pre),
      ("cp", !$"treated" && post), ("cr", !$"treated" && pre))
    val real = cells($"dayn" > $"cut", $"dayn" <= $"cut")
    val fake = cells($"dayn" > $"fake_cut" && $"dayn" <= $"cut",
      $"dayn" <= $"fake_cut")
    val aggs = real.flatMap { case (tag, c) => Seq(
        sum(when(c, $"cents").otherwise(0L)).as(s"s_$tag"),
        sum(when(c, 1L).otherwise(0L)).as(s"n_$tag"))
      } ++ fake.flatMap { case (tag, c) => Seq(
        sum(when(c, $"cents").otherwise(0L)).as(s"fs_$tag"),
        sum(when(c, 1L).otherwise(0L)).as(s"fn_$tag"))
      }
    val m = base.crossJoin(broadcast(cuts))
      .agg(aggs.head, aggs.tail: _*)
    def didExpr(p: String): String = {
      val (s0, n0) = (s"${p}s_", s"${p}n_")
      s"""CAST((CAST(${s0}tp AS DECIMAL(38,0)) * ${n0}tr * ${n0}cp * ${n0}cr
           - CAST(${s0}tr AS DECIMAL(38,0)) * ${n0}tp * ${n0}cp * ${n0}cr
           - CAST(${s0}cp AS DECIMAL(38,0)) * ${n0}tp * ${n0}tr * ${n0}cr
           + CAST(${s0}cr AS DECIMAL(38,0)) * ${n0}tp * ${n0}tr * ${n0}cp)
          * 1000000
          div (CAST(${n0}tp AS DECIMAL(38,0)) * ${n0}tr * ${n0}cp
               * ${n0}cr) AS BIGINT)"""
    }
    m.filter($"n_tp" > 0 && $"n_tr" > 0 && $"n_cp" > 0 && $"n_cr" > 0 &&
        $"fn_tp" > 0 && $"fn_tr" > 0 && $"fn_cp" > 0 && $"fn_cr" > 0)
      .withColumn("did_microcents", expr(didExpr("")))
      .withColumn("placebo_microcents", expr(didExpr("f")))
      .select($"n_tp", $"n_tr", $"n_cp", $"n_cr",
        $"s_tp", $"s_tr", $"s_cp", $"s_cr",
        $"did_microcents", $"placebo_microcents")
  }

  /** Zero-inflation screen per (event_type, user) daily counts — the
    * count-model diagnostic PAIRED with q_overdispersion: a Poisson
    * fit can fail two ways, variance (overdispersion) and mass at
    * zero (zero inflation), and each points at a different model
    * (NB vs ZIP). Per event type over the (user × observed-day-range)
    * grid: observed zero cells vs the Poisson expectation
    * n·e^(−λ), λ = events/cells — λ and the observed count are exact
    * rationals/integers; e^(−λ) is the statistic's one libm call,
    * applied to a ~unit-magnitude argument and floored e6 (flip
    * margin ~1e-10, the safe grid regime). zi_ratio_ppm > 1e6 means
    * more zeros than Poisson explains. Shape: one (type, user)
    * rollup + one per-type aggregate; the day grid is arithmetic
    * (max−min+1), never materialized. */
  private def zeroInflation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, d)
      .select($"event_type", $"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"))
    val perUser = base.groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n_ev"),
        countDistinct($"dayn").as("active_days"))
    val span = base.groupBy($"event_type")
      .agg((max($"dayn") - min($"dayn") + 1L).as("n_days"))
    val users = base.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    perUser.groupBy($"event_type")
      .agg(sum($"n_ev").as("total_events"),
        sum($"active_days").as("nonzero_cells"),
        count(lit(1)).as("users_seen"))
      .join(broadcast(span), "event_type")
      .crossJoin(broadcast(users))
      .withColumn("n_cells", $"n_users" * $"n_days")
      .withColumn("zero_cells", $"n_cells" - $"nonzero_cells")
      // λ = total_events / n_cells; expected zeros = n_cells·e^(−λ)
      .withColumn("expected_zero_e6",
        floor($"n_cells" * exp(-($"total_events".cast("double") /
          $"n_cells")) * lit(1e6)).cast("long"))
      // zero_cells scales with n_users·n_days: widen to decimal(38,0)
      // BEFORE the e12 multiply (ADVICE r11 — int64 wraps silently
      // past ~9.2e6 cells where the HUGEINT oracle stays exact)
      .withColumn("zi_ratio_ppm",
        when($"expected_zero_e6" > 0,
          expr("cast(zero_cells as decimal(38,0)) * 1000000000000" +
            " div expected_zero_e6")))
      .select($"event_type", $"n_cells", $"zero_cells",
        $"total_events", $"expected_zero_e6", $"zi_ratio_ppm")
  }

  /** Jarque–Bera normality test per daily-revenue series — the
    * moment-based screen (skewness² + excess-kurtosis²) a metrics
    * pipeline runs before trusting any Gaussian-assuming monitor
    * (3σ anomaly rules, Welch tests). Works on the [[zGridDaily]]
    * integer grid, so the 2nd/3rd/4th central-moment sums are exact
    * BIGINTs in ONE map-side-combinable aggregate (scale cancels in
    * both skew and kurtosis — the grid's range normalization drops
    * out). The three emitted statistics are short identical double
    * expressions over those exact integers, floored to fixed-point:
    * skew = √n·m3/(m2·√m2), kurt = n·m4/m2², JB = n/6·(S² + (K−3)²/4).
    * Shape: daily rollup + |types|-row aggregate — two exchanges. */
  private def jarqueBera(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    zGridDaily(s, d)
      .groupBy($"event_type")
      .agg(max($"n").as("n_days"),
        sum($"z_e4" * $"z_e4").as("m2"),
        sum($"z_e4" * $"z_e4" * $"z_e4").as("m3"),
        sum($"z_e4" * $"z_e4" * $"z_e4" * $"z_e4").as("m4"))
      .withColumn("sk",
        sqrt($"n_days".cast("double")) * $"m3" /
          ($"m2" * sqrt($"m2".cast("double"))))
      .withColumn("kt",
        $"n_days".cast("double") * $"m4" /
          ($"m2".cast("double") * $"m2"))
      .select($"event_type", $"n_days", $"m2", $"m3", $"m4",
        floor($"sk" * lit(1000000.0)).as("skew_e6"),
        floor($"kt" * lit(1000000.0)).as("kurt_e6"),
        floor($"n_days".cast("double") / lit(6.0) *
          ($"sk" * $"sk" +
            ($"kt" - lit(3.0)) * ($"kt" - lit(3.0)) / lit(4.0)) *
          lit(1000.0)).as("jb_e3"))
  }

  /** Durbin–Watson statistic per daily-revenue series — the
    * first-order autocorrelation screen on the mean-centered series
    * (DW ≈ 2(1−ρ₁): ≈2 means independent residuals, →0 positive,
    * →4 negative autocorrelation) that decides whether [[groupOls]]'s
    * iid-error assumption holds before anyone trusts its slopes. On
    * the [[zGridDaily]] integer grid the statistic needs NO doubles at
    * all: Σ(z_t − z_{t−1})² and Σz_t² are exact BIGINT sums (range
    * normalization cancels), and dw_e6 is one exact integer division.
    * Shape: ONE window shuffle on the series key for the lag, then a
    * |types|-row aggregate — the frame walks days, not events. */
  private def durbinWatson(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    zGridDaily(s, d)
      .withColumn("dz", $"z_e4" - lag($"z_e4", 1).over(w))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"z_e4" * $"z_e4").as("sum_z2"),
        sum($"dz" * $"dz").as("sum_dz2"))
      .filter($"sum_z2" > 0)
      .withColumn("dw_e6", expr("sum_dz2 * 1000000 div sum_z2"))
  }

  /** Dickey–Fuller unit-root screen per event type — does the daily
    * series mean-revert (stationary) or random-walk? The OTHER half
    * of the stationarity toolbox next to [[durbinWatson]]
    * (residual autocorrelation) and q_changepoint (level shifts):
    * forecasting models (q_holt_linear, q_ar2_forecast) are only
    * valid on stationary inputs, so a pipeline gates on this test.
    * On the shared [[zGridDaily]] e4 grid the regression
    * Δz_t = β·z_{t−1} + ε is float-FREE end to end: β̂ and its t²
    * are single exact rationals of the three moment sums
    * (t² = (n−1)·sxd² / (sxx·sdd − sxd²), the cross-multiplied form
    * of β̂²/se²), so no engine can disagree. The grid is mean-shifted
    * by construction, making this the demeaned (drift) variant —
    * reject the unit root at 5 % when t ≤ −2.86, tested as
    * sxd < 0 ∧ t²_e6 ≥ 8 179 600 in integers. Shape: the daily
    * rollup, one lag window per type partition, one combinable
    * aggregate — series length is calendar-bounded at any volume. */
  private def adfTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    zGridDaily(s, d)
      .withColumn("xlag", lag($"z_e4", 1).over(w))
      .withColumn("dz", $"z_e4" - $"xlag")
      .filter($"xlag".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_diffs"),
        sum($"xlag" * $"dz").as("sxd"),
        sum($"xlag" * $"xlag").as("sxx"),
        sum($"dz" * $"dz").as("sdd"))
      .filter($"sxx" > 0)
      .withColumn("beta_ppm",
        expr("CAST(CAST(sxd AS DECIMAL(38,0)) * 1000000 div sxx" +
          " AS BIGINT)"))
      .withColumn("t2_den", expr(
        "CAST(CAST(sxx AS DECIMAL(38,0)) * sdd" +
          " - CAST(sxd AS DECIMAL(38,0)) * sxd AS DECIMAL(38,0))"))
      .filter($"t2_den" > 0)
      .withColumn("t2_e6", expr(
        "CAST((n_diffs - 1) * CAST(sxd AS DECIMAL(38,0)) * sxd" +
          " * 1000000 div t2_den AS BIGINT)"))
      .withColumn("stationary_5pct",
        $"sxd" < 0 && $"t2_e6" >= 8179600L)
      .select($"event_type", $"n_diffs", $"sxd", $"sxx", $"sdd",
        $"beta_ppm", $"t2_e6", $"stationary_5pct")
  }

  /** Granger-causality screen (lag 1) between every ORDERED pair of
    * event-type daily series — does yesterday's series A improve
    * today's prediction of series B beyond B's own yesterday? The
    * cross-series counterpart of q_lead_lag (which only correlates):
    * Granger compares nested regressions, restricted
    * y_t = a + b·y_{t−1} against unrestricted + c·x_{t−1}, via
    * F = (n−3)·(RSS_r − RSS_u)/RSS_u. On the [[zGridDaily]] e4 grid
    * all nine moment sums are exact BIGINTs; the centered forms
    * (A = nΣx²−(Σx)² …) stay exact, and only the final F assembles
    * in double from those bit-identical integers (the q_partial_corr
    * discipline — exact-rational F needs ~1e44 and overflows any
    * engine's decimal). RSS identities: RSS_r ∝ (YA−D²)/A,
    * RSS_u ∝ (Y·det−D²B+2DEC−E²A)/det with det = AB−C². Flag at the
    * F(1,25) 5 % point 4.24, floored e3 in both engines. Shape: the
    * tiny per-type z table self-joins on day into ≤ |types|² pairs —
    * all windows and joins run on calendar-bounded rows. */
  private def grangerLag1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    val z = zGridDaily(s, d)
      .withColumn("zlag", lag($"z_e4", 1).over(w))
      .filter($"zlag".isNotNull)
      .select($"event_type", $"day", $"z_e4", $"zlag")
    val bSide = z.select($"event_type".as("type_b"), $"day",
      $"z_e4".as("y"), $"zlag".as("x"))
    val aSide = z.select($"event_type".as("type_a"), $"day",
      $"zlag".as("wv"))
    val m = bSide.join(aSide, Seq("day"))
      .filter($"type_a" =!= $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n"),
        sum($"y").as("sy"), sum($"x").as("sx"), sum($"wv").as("sw"),
        sum($"y" * $"y").as("syy"), sum($"x" * $"x").as("sxx"),
        sum($"wv" * $"wv").as("sww"), sum($"x" * $"y").as("sxy"),
        sum($"wv" * $"y").as("swy"), sum($"x" * $"wv").as("sxw"))
    val cc = m.select($"type_a", $"type_b", $"n",
      ($"n" * $"sxx" - $"sx" * $"sx").as("a_c"),
      ($"n" * $"sww" - $"sw" * $"sw").as("b_c"),
      ($"n" * $"sxw" - $"sx" * $"sw").as("c_c"),
      ($"n" * $"sxy" - $"sx" * $"sy").as("d_c"),
      ($"n" * $"swy" - $"sw" * $"sy").as("e_c"),
      ($"n" * $"syy" - $"sy" * $"sy").as("y_c"))
    // centered moments are exact longs (~1e12 tops); their PRODUCTS
    // overflow int64, so the determinant gate runs in decimal(38,0)
    // (exact) and the F assembly in double (deterministic on
    // bit-identical integer inputs, q_partial_corr discipline)
    val detDec = expr("CAST(a_c AS DECIMAL(38,0)) * b_c" +
      " - CAST(c_c AS DECIMAL(38,0)) * c_c")
    val detD = $"a_c".cast("double") * $"b_c" -
      $"c_c".cast("double") * $"c_c"
    val rssR = ($"y_c".cast("double") * $"a_c" -
      $"d_c".cast("double") * $"d_c") / $"a_c".cast("double")
    val rssU = ($"y_c".cast("double") * detD
      - $"d_c".cast("double") * $"d_c" * $"b_c"
      + lit(2.0) * $"d_c" * $"e_c" * $"c_c"
      - $"e_c".cast("double") * $"e_c" * $"a_c") / detD
    cc.filter($"n" > 3 && $"a_c" > 0 && detDec > 0)
      .withColumn("f_e3",
        when(rssU > 0,
          floor(($"n" - 3).cast("double") * (rssR - rssU) / rssU
            * lit(1000.0))))
      .withColumn("granger_5pct",
        $"f_e3".isNotNull && $"f_e3" >= 4240L)
      .select($"type_a", $"type_b", $"n", $"a_c", $"b_c", $"c_c",
        $"d_c", $"e_c", $"y_c", $"f_e3", $"granger_5pct")
  }

  /** Instrumental-variable (Wald) estimator — the causal battery's
    * answer to ENDOGENOUS exposure, completing q_did (parallel
    * trends) and q_cuped (variance reduction): when per-user purchase
    * COUNT is self-selected, its naive regression on spend is
    * confounded, but with the user-parity instrument z = user_id % 2
    * (as-good-as-random, the same assignment q_did/q_ab_test use) the
    * Wald ratio (ȳ₁−ȳ₀)/(x̄₁−x̄₀) = cents-per-purchase identifies the
    * causal rate (Angrist–Imbens–Rubin 1996). Cross-multiplying the
    * two mean contrasts gives EXACT integers — num = sy₁n₀ − sy₀n₁,
    * den = sx₁n₀ − sx₀n₁ — and wald_e6 = sign·(|num|·10⁶ div |den|),
    * the sign-split keeping the truncating division identical on both
    * engines even for negative contrasts (Spark div vs DuckDB //
    * may disagree on negative operands across versions). The
    * intent-to-treat numerator and first-stage denominator ride along
    * for weak-instrument screening. Shape: one per-user rollup, one
    * 2-row aggregate — map-side combinable at any volume. */
  private def ivWald(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pu = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("x"),
        sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
          .as("y"))
      .select(($"user_id" % 2).cast("long").as("z"), $"x", $"y")
    pu.agg(
        sum(when($"z" === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when($"z" === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when($"z" === 1L, $"x").otherwise(0L)).as("sx1"),
        sum(when($"z" === 0L, $"x").otherwise(0L)).as("sx0"),
        sum(when($"z" === 1L, $"y").otherwise(0L)).as("sy1"),
        sum(when($"z" === 0L, $"y").otherwise(0L)).as("sy0"))
      .filter($"n0" > 0 && $"n1" > 0)
      .withColumn("num", expr(
        "cast(sy1 as decimal(38,0)) * n0 - cast(sy0 as decimal(38,0)) * n1"))
      .withColumn("den", expr(
        "cast(sx1 as decimal(38,0)) * n0 - cast(sx0 as decimal(38,0)) * n1"))
      .filter($"den" =!= 0)
      // ADVICE r12: the ride-along columns are GUARDED, not bare-cast
      // — with ANSI off a decimal→long overflow returns NULL silently
      // while DuckDB's CAST(HUGEINT AS BIGINT) raises, so the engines
      // would FAIL differently at extreme scale. The explicit CASE
      // makes both emit NULL iff the exact value exceeds int64.
      .select($"n0", $"n1", $"sx0", $"sx1", $"sy0", $"sy1",
        expr("case when abs(num) <= 9223372036854775807" +
          " then cast(num as bigint) end").as("itt_num"),
        expr("case when abs(den) <= 9223372036854775807" +
          " then cast(den as bigint) end").as("fs_den"),
        expr("""cast(case when (num >= 0) = (den >= 0)
                 then abs(num) * 1000000 div abs(den)
                 else -(abs(num) * 1000000 div abs(den)) end
               as bigint)""").as("wald_e6"))
  }

  /** Half-bandwidth (days on each side of the cutoff) for
    * [[rddSharp]]. */
  val RddBandwidth = 60L

  /** Sharp regression discontinuity — the causal design for CUTOFF
    * rules (Thistlethwaite–Campbell 1960; Imbens–Lemieux 2008): fit a
    * separate OLS line to daily purchase revenue on each side of the
    * date-range midpoint within ±[[RddBandwidth]] days, and read the
    * treatment effect as the gap between the two intercepts AT the
    * cutoff. Every regression quantity is a closed-form rational of
    * integer moments over x = day − cutoff (|x| ≤ 60, so nΣx²−(Σx)²
    * and ΣyΣx²−ΣxΣxy stay ≪ 10³⁸ even at 100× revenue): per side,
    * slope_e6 = (nΣxy−ΣxΣy)·10⁶/D and intercept ŷ(0) = A/D with
    * D = nΣx²−(Σx)², A = ΣyΣx²−ΣxΣxy; the effect A_r/D_r − A_l/D_l
    * cross-multiplies to the single exact fraction
    * (A_r·D_l − A_l·D_r)/(D_r·D_l) before the ONE sign-split
    * truncating division (both engines identical — same discipline
    * as [[ivWald]]). Shape: daily rollup (map-side combinable), one
    * broadcast 1-row cutoff, one 2-row side aggregate — day-bounded
    * at any event volume, the q_eval_auc lesson. */
  /** Caliper (e3 propensity units) for [[psmAtt]]. */
  val PsmCaliper = 50L

  /** Propensity-score MATCHING ATT (Rosenbaum & Rubin 1983) — the
    * missing member of the causal tier (DiD compares cohorts over
    * time, CUPED adjusts variance, RDD needs a threshold; matching is
    * the workhorse when treatment is merely CORRELATED with observed
    * activity): each user's deterministic propensity snaps to the e3
    * grid (≤1001 buckets — a bounded, data-volume-independent frame),
    * controls collapse per bucket to (count, exact e2 mean outcome),
    * every treated bucket finds its NEAREST control bucket over the
    * bounded bucket×bucket cross (broadcast, ≤1001² pairs by
    * construction, ties to the smaller bucket via struct-min), a
    * [[PsmCaliper]] caps the match distance, and
    * ATT_e2 = Σ(outcome·100 − matched control mean_e2) div #matched —
    * exact integers end to end (the per-bucket control mean is an
    * exact floor, shared by every treated user matched there). Shape:
    * one user rollup, two bounded-bucket aggregates, one broadcast
    * join back; the corpus never shuffles twice. */
  private def psmAtt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(when($"event_type" === "click", 1L).otherwise(0L))
          .as("n_click"),
        coalesce(sum(when($"event_type" === "purchase",
          ($"value".cast("decimal(18,2)") * 100).cast("long"))),
          lit(0L)).as("out_cents"))
      .withColumn("score_e3",
        expr("(1000 * n_click) div (n_ev + 1)"))
      .withColumn("treated", $"user_id" % 2 === 1)
    val controls = users.filter(!$"treated")
      .groupBy($"score_e3".as("cb"))
      .agg(count(lit(1)).as("c_cnt"), sum($"out_cents").as("c_sum"))
      .withColumn("c_mean_e2", expr("(c_sum * 100) div c_cnt"))
    val nearest = users.filter($"treated").select($"score_e3").distinct()
      .crossJoin(broadcast(controls.select($"cb", $"c_mean_e2")))
      .withColumn("dist", abs($"score_e3" - $"cb"))
      .groupBy($"score_e3")
      .agg(min(struct($"dist", $"cb", $"c_mean_e2")).as("m"))
      .select($"score_e3", $"m.dist".as("dist"),
        $"m.c_mean_e2".as("c_mean_e2"))
    val t = users.filter($"treated")
      .join(broadcast(nearest), Seq("score_e3"), "left")
      .withColumn("matched",
        $"dist".isNotNull && $"dist" <= PsmCaliper)
    val nCtl = users.filter(!$"treated")
      .agg(count(lit(1)).as("n_controls"))
    t.agg(count(lit(1)).as("n_treated"),
        sum(when($"matched", 1L).otherwise(0L)).as("n_matched"),
        sum(when($"matched", $"out_cents" * 100L - $"c_mean_e2")
          .otherwise(0L)).as("att_num"))
      .crossJoin(broadcast(nCtl))
      .select($"n_treated", $"n_matched", $"n_controls",
        when($"n_matched" > 0, expr("att_num div n_matched"))
          .otherwise(lit(null).cast("long")).as("att_e2"))
  }

  private def rddSharp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"dayn").agg(sum($"cents").as("y"))
    val cut = daily.agg(expr("(min(dayn) + max(dayn)) div 2").as("cut"))
    val sides = daily.crossJoin(broadcast(cut))
      .withColumn("x", $"dayn" - $"cut")
      .filter($"x" >= -RddBandwidth && $"x" <= RddBandwidth)
      .withColumn("side", when($"x" < 0, lit("l")).otherwise(lit("r")))
    val m = sides.groupBy($"side")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .withColumn("dd", expr(
        "cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
      .withColumn("aa", expr(
        "cast(sy as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sxy"))
      .withColumn("sn", expr(
        "cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy"))
      .filter($"dd" > 0)
    def sgnDiv(num: String, den: String, k: Long) = expr(
      s"""cast(case when ($num >= 0) = ($den >= 0)
           then abs($num) * $k div abs($den)
           else -(abs($num) * $k div abs($den)) end as bigint)""")
    val persSide = m.select($"side", $"n", $"sx", $"sy", $"sxy", $"sxx",
      sgnDiv("sn", "dd", 1000000L).as("slope_e6"),
      sgnDiv("aa", "dd", 1000L).as("intercept_e3"),
      $"aa", $"dd")
    val l = persSide.filter($"side" === "l")
      .select($"n".as("n_l"), $"slope_e6".as("slope_l_e6"),
        $"intercept_e3".as("intercept_l_e3"),
        $"aa".as("aa_l"), $"dd".as("dd_l"))
    val r = persSide.filter($"side" === "r")
      .select($"n".as("n_r"), $"slope_e6".as("slope_r_e6"),
        $"intercept_e3".as("intercept_r_e3"),
        $"aa".as("aa_r"), $"dd".as("dd_r"))
    l.crossJoin(broadcast(r))
      .withColumn("en", expr("aa_r * dd_l - aa_l * dd_r"))
      .withColumn("ed", expr("dd_r * dd_l"))
      .select($"n_l", $"n_r", $"slope_l_e6", $"slope_r_e6",
        $"intercept_l_e3", $"intercept_r_e3",
        sgnDiv("en", "ed", 1000L).as("effect_e3"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_gini_revenue", giniRevenue, Some("""
      WITH pu AS (SELECT user_id,
                         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                       AS BIGINT)) AS BIGINT) AS cents
                  FROM events
                  WHERE event_type = 'purchase' AND value IS NOT NULL
                  GROUP BY 1),
      r AS (SELECT cents,
                   CAST(row_number() OVER (ORDER BY cents, user_id)
                     AS BIGINT) AS i
            FROM pu),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   CAST(sum(i * cents) AS BIGINT) AS rank_weighted
            FROM r)
      SELECT n_users, total_cents,
             CAST(2 * rank_weighted - (n_users + 1) * total_cents
               AS BIGINT) AS gini_num,
             CAST(n_users * total_cents AS BIGINT) AS gini_den,
             CASE WHEN n_users * total_cents > 0 THEN
               CAST(floor(CAST(2 * rank_weighted
                               - (n_users + 1) * total_cents AS DOUBLE)
                 / (n_users * total_cents) * 1000000.0) AS BIGINT)
             END AS gini_e6
      FROM a""")),

    Q("q_runs_test", runsTest, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      d AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS cents
            FROM e GROUP BY 1, 2),
      lagd AS (SELECT event_type, day, cents,
                      lag(cents) OVER (PARTITION BY event_type
                        ORDER BY day ASC) AS prev
               FROM d),
      s AS (SELECT event_type, day,
                   CASE WHEN cents > prev THEN 1 ELSE -1 END AS s
            FROM lagd WHERE prev IS NOT NULL AND cents <> prev),
      s2 AS (SELECT event_type, s,
                    lag(s) OVER (PARTITION BY event_type
                      ORDER BY day ASC) AS prev_s
             FROM s),
      g AS (SELECT event_type,
                   CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_up,
                   CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_down,
                   CAST(sum(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                            THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
            FROM s2 GROUP BY 1),
      mv AS (SELECT *,
                    2.0 * n_up * n_down / (n_up + n_down) + 1.0 AS m,
                    2.0 * n_up * n_down
                      * (2.0 * n_up * n_down - n_up - n_down)
                      / (CAST(n_up + n_down AS DOUBLE)
                         * (n_up + n_down) * (n_up + n_down - 1)) AS v
             FROM g)
      SELECT event_type, n_up, n_down, n_runs,
             CASE WHEN n_up > 0 AND n_down > 0 AND v > 0 THEN
               CAST(floor((n_runs - m) / sqrt(v) * 1000000.0) AS BIGINT)
             END AS z_e6
      FROM mv""")),

    Q("q_lorenz_deciles", lorenzDeciles, Some("""
      WITH pu AS (SELECT user_id,
                         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                       AS BIGINT)) AS BIGINT) AS cents
                  FROM events
                  WHERE event_type = 'purchase' AND value IS NOT NULL
                  GROUP BY 1),
      t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM pu),
      r AS (SELECT cents,
                   CAST(ntile(10) OVER (ORDER BY cents, user_id)
                     AS BIGINT) AS decile
            FROM pu),
      g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users_d,
                   CAST(sum(cents) AS BIGINT) AS cents_d
            FROM r GROUP BY 1),
      c AS (SELECT *, CAST(sum(cents_d) OVER (ORDER BY decile ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM g)
      SELECT decile, n_users_d, cents_d,
             CAST((cents_d * 1000000) // total_cents AS BIGINT)
               AS share_ppm,
             CAST((cum * 1000000) // total_cents AS BIGINT)
               AS cum_share_ppm
      FROM c CROSS JOIN t""")),

    Q("q_sprt", sprt, Some(s"""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      dly AS (SELECT event_type, day,
                     CAST(2 * sum(CASE WHEN cents >= 10000 THEN 1
                                       ELSE 0 END) - count(*)
                       AS BIGINT) AS s_day
              FROM e GROUP BY 1, 2),
      c AS (SELECT event_type, day, s_day,
                   CAST(sum(s_day) OVER (PARTITION BY event_type
                     ORDER BY day ASC ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS s_cum
            FROM dly),
      a AS (SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(s_day) AS BIGINT) AS s_final,
                   min(CASE WHEN s_cum >= $SprtBoundary THEN day END)
                     AS d_hi,
                   min(CASE WHEN s_cum <= -$SprtBoundary THEN day END)
                     AS d_lo
            FROM c GROUP BY 1)
      SELECT event_type, n_days, s_final,
             CAST(floor(CAST(s_final AS DOUBLE)
               * ${math.log(11.0 / 9.0)} * 1000000.0) AS BIGINT)
               AS llr_e6,
             CASE WHEN d_hi IS NOT NULL
                   AND (d_lo IS NULL OR d_hi <= d_lo)
                  THEN 'accept_h1'
                  WHEN d_lo IS NOT NULL THEN 'accept_h0'
                  ELSE 'continue' END AS decision,
             least(d_hi, d_lo) AS decision_day
      FROM a""")),

    Q("q_power_welch", powerWelch, Some(s"""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events
                 WHERE value IS NOT NULL),
      a AS (SELECT event_type,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_ref,
                   CAST(sum(CASE WHEN is_ref THEN cents ELSE 0 END)
                     AS BIGINT) AS s_ref,
                   CAST(sum(CASE WHEN is_ref THEN cents * cents ELSE 0
                            END) AS BIGINT) AS q_ref,
                   CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END)
                     AS BIGINT) AS n_cur,
                   CAST(sum(CASE WHEN is_ref THEN 0 ELSE cents END)
                     AS BIGINT) AS s_cur,
                   CAST(sum(CASE WHEN is_ref THEN 0 ELSE cents * cents
                            END) AS BIGINT) AS q_cur
            FROM e GROUP BY 1),
      m AS (SELECT *, CAST((s_ref + s_cur) // (n_ref + n_cur)
                        AS BIGINT) AS mean_cents
            FROM a),
      d2 AS (SELECT *, CAST((mean_cents * 2) // 100 AS BIGINT)
                         AS delta_cents
             FROM m),
      v AS (SELECT *,
                   (CAST(n_ref AS DOUBLE) * q_ref
                      - CAST(s_ref AS DOUBLE) * s_ref)
                     / (CAST(n_ref AS DOUBLE) * (n_ref - 1)) AS var_ref,
                   (CAST(n_cur AS DOUBLE) * q_cur
                      - CAST(s_cur AS DOUBLE) * s_cur)
                     / (CAST(n_cur AS DOUBLE) * (n_cur - 1)) AS var_cur
            FROM d2)
      SELECT event_type, n_ref, n_cur, mean_cents, delta_cents,
             CASE WHEN n_ref > 1 AND n_cur > 1 AND delta_cents > 0 THEN
               CAST(ceil((var_ref + var_cur) * ${(1.96 + 0.8416) * (1.96 + 0.8416)}
                 / (CAST(delta_cents AS DOUBLE) * delta_cents))
                 AS BIGINT) END AS n_needed,
             CASE WHEN n_ref > 1 AND n_cur > 1 AND delta_cents > 0 THEN
               CAST(floor(CAST(CAST(ceil((var_ref + var_cur)
                   * ${(1.96 + 0.8416) * (1.96 + 0.8416)}
                   / (CAST(delta_cents AS DOUBLE) * delta_cents))
                   AS BIGINT) AS DOUBLE)
                 / (CAST(n_ref + n_cur AS DOUBLE) / 2)
                 * 1000.0) AS BIGINT) END AS x_current_e3
      FROM v""")),

    Q("q_mood_median", moodMedian, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      m AS (SELECT CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
            FROM e),
      g AS (SELECT event_type,
                   CAST(sum(CASE WHEN 2 * cents > med2 THEN 1 ELSE 0
                            END) AS BIGINT) AS a,
                   CAST(sum(CASE WHEN 2 * cents > med2 THEN 0 ELSE 1
                            END) AS BIGINT) AS b
            FROM e CROSS JOIN m GROUP BY 1),
      w AS (SELECT *, CAST(sum(a) OVER () AS BIGINT) AS ta,
                   CAST(sum(b) OVER () AS BIGINT) AS tb,
                   CAST(sum(a + b) OVER () AS BIGINT) AS n
            FROM g),
      t AS (SELECT n, ta,
                   CASE WHEN ta > 0 AND tb > 0 THEN
                     CAST(floor((CAST(a AS DOUBLE) * n
                         - CAST(a + b AS DOUBLE) * ta)
                       * (CAST(a AS DOUBLE) * n
                          - CAST(a + b AS DOUBLE) * ta)
                       / (CAST(n AS DOUBLE) * (a + b) * ta)
                       * 1000000.0) AS BIGINT) +
                     CAST(floor((CAST(b AS DOUBLE) * n
                         - CAST(a + b AS DOUBLE) * tb)
                       * (CAST(b AS DOUBLE) * n
                          - CAST(a + b AS DOUBLE) * tb)
                       / (CAST(n AS DOUBLE) * (a + b) * tb)
                       * 1000000.0) AS BIGINT)
                   END AS cell_e6
            FROM w)
      SELECT CAST(max(n) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS k_groups,
             CAST(max(ta) AS BIGINT) AS n_above,
             CAST(sum(cell_e6) AS BIGINT) AS chi2_e6
      FROM t""")),

    Q("q_wilson_ci", wilsonCi, Some(s"""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN cents >= 10000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS k
            FROM e GROUP BY 1),
      w AS (SELECT *, CAST(k AS DOUBLE) / n AS p_hat FROM g),
      c AS (SELECT *,
                   (p_hat + ${WilsonZ * WilsonZ} / (2.0 * n))
                     / (1.0 + ${WilsonZ * WilsonZ} / n) AS center,
                   $WilsonZ * sqrt(p_hat * (1.0 - p_hat) / n
                     + ${WilsonZ * WilsonZ} / (4.0 * n * n))
                     / (1.0 + ${WilsonZ * WilsonZ} / n) AS half
            FROM w)
      SELECT event_type, n, k,
             CAST(floor(p_hat * 1000000.0) AS BIGINT) AS p_e6,
             CAST(floor((center - half) * 1000000.0) AS BIGINT) AS lo_e6,
             CAST(floor((center + half) * 1000000.0) AS BIGINT) AS hi_e6
      FROM c""")),
    Q("q_welch_ttest", welchTTest, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events
                 WHERE value IS NOT NULL),
      a AS (SELECT event_type,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_ref,
                   CAST(sum(CASE WHEN is_ref THEN cents ELSE 0 END)
                     AS BIGINT) AS s_ref,
                   CAST(sum(CASE WHEN is_ref THEN cents * cents ELSE 0
                            END) AS BIGINT) AS q_ref,
                   CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END)
                     AS BIGINT) AS n_cur,
                   CAST(sum(CASE WHEN is_ref THEN 0 ELSE cents END)
                     AS BIGINT) AS s_cur,
                   CAST(sum(CASE WHEN is_ref THEN 0 ELSE cents * cents
                            END) AS BIGINT) AS q_cur
            FROM e GROUP BY 1),
      v AS (SELECT *,
                   (CAST(n_ref AS DOUBLE) * q_ref
                      - CAST(s_ref AS DOUBLE) * s_ref)
                     / (CAST(n_ref AS DOUBLE) * (n_ref - 1)) AS var_ref,
                   (CAST(n_cur AS DOUBLE) * q_cur
                      - CAST(s_cur AS DOUBLE) * s_cur)
                     / (CAST(n_cur AS DOUBLE) * (n_cur - 1)) AS var_cur
            FROM a),
      w AS (SELECT *, var_ref / n_ref + var_cur / n_cur AS se2 FROM v)
      SELECT event_type, n_ref, n_cur,
             CAST(s_ref // n_ref AS BIGINT) AS mean_ref_cents,
             CAST(s_cur // n_cur AS BIGINT) AS mean_cur_cents,
             CASE WHEN n_ref > 1 AND n_cur > 1 AND se2 > 0 THEN
               CAST(floor((CAST(s_ref AS DOUBLE) / n_ref
                           - CAST(s_cur AS DOUBLE) / n_cur)
                 / sqrt(se2) * 1000000.0) AS BIGINT) END AS t_e6,
             CASE WHEN n_ref > 1 AND n_cur > 1 AND se2 > 0 THEN
               CAST(floor(se2 * se2 /
                 ((var_ref / n_ref) * (var_ref / n_ref) / (n_ref - 1)
                  + (var_cur / n_cur) * (var_cur / n_cur) / (n_cur - 1))
                 * 1000.0) AS BIGINT) END AS df_e3
      FROM w""")),

    Q("q_spearman_trend", spearmanTrend, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      d AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS cents
            FROM e GROUP BY 1, 2),
      r AS (SELECT event_type,
                   2 * CAST(row_number() OVER (PARTITION BY event_type
                     ORDER BY day ASC) AS BIGINT) AS rx2,
                   2 * CAST(rank() OVER (PARTITION BY event_type
                     ORDER BY cents ASC) AS BIGINT)
                     + CAST(count(*) OVER (PARTITION BY event_type, cents)
                       AS BIGINT) - 1 AS ry2
            FROM d),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(rx2) AS BIGINT) AS sx,
                   CAST(sum(ry2) AS BIGINT) AS sy,
                   CAST(sum(rx2 * ry2) AS BIGINT) AS sxy,
                   CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
                   CAST(sum(ry2 * ry2) AS BIGINT) AS syy
            FROM r GROUP BY 1)
      SELECT event_type, n_days,
             CASE WHEN (n_days * sxx - sx * sx) > 0
                   AND (n_days * syy - sy * sy) > 0 THEN
               CAST(floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                        * CAST(n_days * syy - sy * sy AS DOUBLE))
                 * 1000000.0) AS BIGINT) END AS rho_e6
      FROM m""")),

    Q("q_kendall_tau", kendallTau, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      d AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS cents
            FROM e GROUP BY 1, 2),
      p AS (SELECT a.event_type,
                   CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END AS conc,
                   CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END AS disc
            FROM d a JOIN d b
              ON a.event_type = b.event_type AND a.day < b.day),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(conc) AS BIGINT) AS n_conc,
                   CAST(sum(disc) AS BIGINT) AS n_disc
            FROM p GROUP BY 1),
      n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM d GROUP BY 1)
      SELECT event_type, n_days, n_pairs, n_conc, n_disc,
             (n_pairs - n_conc - n_disc) AS n_tie_y,
             CASE WHEN (n_pairs - (n_pairs - n_conc - n_disc)) > 0 THEN
               CAST(floor(CAST(n_conc - n_disc AS DOUBLE)
                 / sqrt(CAST(n_pairs - (n_pairs - n_conc - n_disc)
                        AS DOUBLE) * n_pairs)
                 * 1000000.0) AS BIGINT) END AS tau_e6
      FROM m JOIN n USING (event_type)""")),

    Q("q_kruskal_wallis", kruskalWallis, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      tc AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
             FROM e GROUP BY 1, 2),
      c AS (SELECT cents, CAST(sum(cnt) AS BIGINT) AS g
            FROM tc GROUP BY 1),
      cw AS (SELECT cents, g,
                    CAST(sum(g) OVER (ORDER BY cents ASC
                      ROWS UNBOUNDED PRECEDING) - g AS BIGINT) AS prev
             FROM c),
      r AS (SELECT tc.event_type, CAST(sum(tc.cnt) AS BIGINT) AS n_i,
                   CAST(sum(tc.cnt * (2 * cw.prev + cw.g + 1))
                     AS BIGINT) AS r2_i
            FROM tc JOIN cw USING (cents) GROUP BY 1),
      t AS (SELECT CAST(sum(g * g * g - g) AS BIGINT) AS tie_num FROM c),
      h AS (SELECT CAST(sum(CAST(floor(CAST(r2_i AS DOUBLE) * r2_i
                     / (4.0 * n_i)) AS BIGINT)) AS BIGINT) AS h_num,
                   CAST(sum(n_i) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS k_groups
            FROM r)
      SELECT n_total, k_groups, tie_num, h_num,
             CAST(floor((12.0 * h_num
               / (CAST(n_total AS DOUBLE) * (n_total + 1))
               - 3.0 * (n_total + 1)) * 1000000.0) AS BIGINT) AS h_e6,
             CAST(floor((12.0 * h_num
               / (CAST(n_total AS DOUBLE) * (n_total + 1))
               - 3.0 * (n_total + 1))
               / (1.0 - CAST(tie_num AS DOUBLE)
                 / (CAST(n_total AS DOUBLE) * n_total * n_total
                   - n_total))
               * 1000000.0) AS BIGINT) AS h_corr_e6
      FROM h CROSS JOIN t""")),

    Q("q_anova_f", anovaF, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_i,
                   CAST(sum(cents) AS BIGINT) AS s_i,
                   CAST(sum(cents * cents) AS BIGINT) AS q_i
            FROM e GROUP BY 1),
      w AS (SELECT *, CAST(sum(n_i) OVER () AS BIGINT) AS n,
                   CAST(sum(s_i) OVER () AS BIGINT) AS s,
                   CAST(count(*) OVER () AS BIGINT) AS k
            FROM g),
      t AS (SELECT n, k,
                   CAST(floor((CAST(s_i AS DOUBLE) * n
                               - CAST(s AS DOUBLE) * n_i)
                     * (CAST(s_i AS DOUBLE) * n - CAST(s AS DOUBLE) * n_i)
                     / (CAST(n_i AS DOUBLE) * n * n)) AS BIGINT)
                     AS ssb_t,
                   CAST(floor(CAST(q_i AS DOUBLE)
                              - CAST(s_i AS DOUBLE) * s_i / n_i)
                     AS BIGINT) AS ssw_t
            FROM w),
      a AS (SELECT n, k, CAST(sum(ssb_t) AS BIGINT) AS ssb_sq,
                   CAST(sum(ssw_t) AS BIGINT) AS ssw_sq
            FROM t GROUP BY 1, 2)
      SELECT n AS n_total, k AS k_groups, ssb_sq, ssw_sq,
             CASE WHEN ssw_sq > 0 THEN
               CAST(floor((CAST(ssb_sq AS DOUBLE) / (k - 1))
                 / (CAST(ssw_sq AS DOUBLE) / (n - k))
                 * 1000000.0) AS BIGINT) END AS f_e6
      FROM a""")),

    Q("q_brown_forsythe", brownForsythe, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      m AS (SELECT event_type,
                   CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
            FROM e GROUP BY 1),
      z AS (SELECT e.event_type, abs(2 * e.cents - m.med2) AS z
            FROM e JOIN m USING (event_type)),
      g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_i,
                   CAST(sum(z) AS BIGINT) AS s_i,
                   CAST(sum(z * z) AS BIGINT) AS q_i
            FROM z GROUP BY 1),
      w AS (SELECT *, CAST(sum(n_i) OVER () AS BIGINT) AS n,
                   CAST(sum(s_i) OVER () AS BIGINT) AS s,
                   CAST(count(*) OVER () AS BIGINT) AS k
            FROM g),
      t AS (SELECT n, k,
                   CAST(floor((CAST(s_i AS DOUBLE) * n
                               - CAST(s AS DOUBLE) * n_i)
                     * (CAST(s_i AS DOUBLE) * n - CAST(s AS DOUBLE) * n_i)
                     / (CAST(n_i AS DOUBLE) * n * n)) AS BIGINT)
                     AS ssb_t,
                   CAST(floor(CAST(q_i AS DOUBLE)
                              - CAST(s_i AS DOUBLE) * s_i / n_i)
                     AS BIGINT) AS ssw_t
            FROM w),
      a AS (SELECT n, k, CAST(sum(ssb_t) AS BIGINT) AS ssb_sq,
                   CAST(sum(ssw_t) AS BIGINT) AS ssw_sq
            FROM t GROUP BY 1, 2)
      SELECT n AS n_total, k AS k_groups, ssb_sq, ssw_sq,
             CASE WHEN ssw_sq > 0 THEN
               CAST(floor((CAST(ssb_sq AS DOUBLE) / (k - 1))
                 / (CAST(ssw_sq AS DOUBLE) / (n - k))
                 * 1000000.0) AS BIGINT) END AS f_e6
      FROM a""")),

    Q("q_ordinal_assoc", ordinalAssoc, Some("""
      WITH cells AS (SELECT o_orderpriority AS pri,
                            o_orderstatus AS st,
                            CAST(count(*) AS BIGINT) AS n
                     FROM orders GROUP BY 1, 2),
      pr AS (SELECT a.pri AS p1, a.st AS s1, a.n AS n1,
                    b.pri AS p2, b.st AS s2, b.n AS n2
             FROM cells a JOIN cells b
               ON a.pri < b.pri OR (a.pri = b.pri AND a.st < b.st)),
      m AS (SELECT
              sum(CASE WHEN p1 <> p2 AND ((p1 < p2 AND s1 < s2)
                    OR (p1 > p2 AND s1 > s2))
                  THEN CAST(n1 AS HUGEINT) * n2 ELSE 0 END) AS c_mass,
              sum(CASE WHEN p1 <> p2 AND ((p1 < p2 AND s1 > s2)
                    OR (p1 > p2 AND s1 < s2))
                  THEN CAST(n1 AS HUGEINT) * n2 ELSE 0 END) AS d_mass,
              sum(CASE WHEN p1 = p2 AND s1 <> s2
                  THEN CAST(n1 AS HUGEINT) * n2 ELSE 0 END) AS tx_mass,
              sum(CASE WHEN p1 <> p2 AND s1 = s2
                  THEN CAST(n1 AS HUGEINT) * n2 ELSE 0 END) AS ty_mass
            FROM pr)
      SELECT CAST(c_mass AS BIGINT) AS concordant,
             CAST(d_mass AS BIGINT) AS discordant,
             CAST(tx_mass AS BIGINT) AS tied_pri_only,
             CAST(ty_mass AS BIGINT) AS tied_st_only,
             CASE WHEN c_mass + d_mass > 0 THEN
               CAST(CASE WHEN c_mass >= d_mass
                 THEN 1000000 * (c_mass - d_mass) // (c_mass + d_mass)
                 ELSE -(1000000 * (d_mass - c_mass)
                        // (c_mass + d_mass)) END AS BIGINT)
             END AS gamma_e6,
             CASE WHEN c_mass + d_mass + ty_mass > 0 THEN
               CAST(CASE WHEN c_mass >= d_mass
                 THEN 1000000 * (c_mass - d_mass)
                      // (c_mass + d_mass + ty_mass)
                 ELSE -(1000000 * (d_mass - c_mass)
                        // (c_mass + d_mass + ty_mass)) END AS BIGINT)
             END AS somers_d_status_e6,
             CASE WHEN c_mass + d_mass + tx_mass > 0 THEN
               CAST(CASE WHEN c_mass >= d_mass
                 THEN 1000000 * (c_mass - d_mass)
                      // (c_mass + d_mass + tx_mass)
                 ELSE -(1000000 * (d_mass - c_mass)
                        // (c_mass + d_mass + tx_mass)) END AS BIGINT)
             END AS somers_d_priority_e6
      FROM m""")),

    Q("q_cramers_v", cramersV, Some("""
      WITH cells AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
                            CAST(count(*) AS BIGINT) AS o
                     FROM orders GROUP BY 1, 2),
      w AS (SELECT pri, st, o,
                   CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS rt,
                   CAST(sum(o) OVER (PARTITION BY st) AS BIGINT) AS ct,
                   CAST(sum(o) OVER () AS BIGINT) AS n
            FROM cells),
      x AS (SELECT n, pri, st,
                   CAST(floor((CAST(o AS DOUBLE) * n
                       - CAST(rt AS DOUBLE) * ct)
                     * (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                     / (CAST(n AS DOUBLE) * rt * ct)
                     * 1000000.0) AS BIGINT) AS cell_e6
            FROM w),
      a AS (SELECT CAST(max(n) AS BIGINT) AS n,
                   CAST(count(DISTINCT pri) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT st) AS BIGINT) AS n_cols,
                   CAST(sum(cell_e6) AS BIGINT) AS chi2_e6
            FROM x)
      SELECT n, n_rows, n_cols, chi2_e6,
             CAST(floor(sqrt((CAST(chi2_e6 AS DOUBLE) / 1000000.0)
               / (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1)))
               * 1000000.0) AS BIGINT) AS v_e6
      FROM a""")),

    Q("q_mcnemar", mcnemar, Some("""
      WITH per AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND day(ts) <= 15
                        THEN 1 ELSE 0 END) AS pa,
               max(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                        THEN 1 ELSE 0 END) AS pb
        FROM events GROUP BY 1),
      c AS (
        SELECT CAST(sum(CASE WHEN pa = 0 AND pb = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n00,
               CAST(sum(CASE WHEN pa = 0 AND pb = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n01,
               CAST(sum(CASE WHEN pa = 1 AND pb = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n10,
               CAST(sum(CASE WHEN pa = 1 AND pb = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n11
        FROM per)
      SELECT n00, n01, n10, n11,
             CASE WHEN n01 + n10 > 0 THEN
               CAST((n10 - n01) * (n10 - n01) * 1000000 // (n10 + n01)
                 AS BIGINT) END AS mcnemar_e6,
             CASE WHEN n01 + n10 > 0 THEN
               CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1000000
                 // (n10 + n01) AS BIGINT) END AS mcnemar_cc_e6
      FROM c""")),

    Q("q_cochran_q", cochranQ, Some("""
      WITH pres AS (SELECT DISTINCT user_id, event_type FROM events),
      r AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(r_i) AS BIGINT) AS n_tot,
                   CAST(sum(r_i * r_i) AS BIGINT) AS sum_r2
            FROM (SELECT user_id, count(*) AS r_i FROM pres GROUP BY 1)),
      c AS (SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(c_j * c_j) AS BIGINT) AS sum_c2
            FROM (SELECT event_type, count(*) AS c_j
                  FROM pres GROUP BY 1))
      SELECT n_users, k, n_tot, sum_r2, sum_c2,
             CASE WHEN k * n_tot - sum_r2 > 0 THEN
               CAST(floor(CAST(k - 1 AS DOUBLE)
                 * (CAST(k AS DOUBLE) * sum_c2
                    - CAST(n_tot AS DOUBLE) * n_tot)
                 / (CAST(k AS DOUBLE) * n_tot - CAST(sum_r2 AS DOUBLE))
                 * 1000000.0) AS BIGINT) END AS q_e6
      FROM r CROSS JOIN c""")),

    Q("q_friedman", friedman, Some("""
      WITH cell AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
             FROM cell),
      fullc AS (SELECT *, count(*) OVER (PARTITION BY day) AS m
                FROM cell),
      comp AS (SELECT f.day, f.event_type, f.cents
               FROM fullc f CROSS JOIN kk WHERE f.m = kk.k),
      grid AS (SELECT day, cents, CAST(count(*) AS BIGINT) AS g,
                      CAST(sum(count(*)) OVER (
                        PARTITION BY day ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - count(*) AS BIGINT) AS prev
               FROM comp GROUP BY day, cents),
      pt AS (SELECT c.event_type,
                    CAST(sum(2 * g.prev + g.g + 1) AS BIGINT) AS r2_j,
                    CAST(count(*) AS BIGINT) AS n_blocks
             FROM comp c JOIN grid g
               ON c.day = g.day AND c.cents = g.cents
             GROUP BY 1),
      a AS (SELECT CAST(max(n_blocks) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(r2_j * r2_j) AS BIGINT) AS sum_r2sq
            FROM pt)
      SELECT n, k, sum_r2sq,
             CAST(3 * sum_r2sq * 1000000 // (n * k * (k + 1))
               - 3 * n * (k + 1) * 1000000 AS BIGINT) AS chi2_e6,
             CAST(greatest(3 * sum_r2sq * 1000000 // (n * k * (k + 1))
               - 3 * n * (k + 1) * 1000000, 0) // (n * (k - 1))
               AS BIGINT) AS w_e6
      FROM a""")),

    Q("q_page_trend", pageTrend, Some("""
      WITH cell AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
             FROM cell),
      fullc AS (SELECT *, count(*) OVER (PARTITION BY day) AS m
                FROM cell),
      comp AS (SELECT f.day, f.event_type, f.cents
               FROM fullc f CROSS JOIN kk WHERE f.m = kk.k),
      grid AS (SELECT day, cents, CAST(count(*) AS BIGINT) AS g,
                      CAST(sum(count(*)) OVER (
                        PARTITION BY day ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - count(*) AS BIGINT) AS prev
               FROM comp GROUP BY day, cents),
      pt AS (SELECT c.event_type,
                    CAST(sum(2 * g.prev + g.g + 1) AS BIGINT) AS r2_j,
                    CAST(count(*) AS BIGINT) AS n_blocks
             FROM comp c JOIN grid g
               ON c.day = g.day AND c.cents = g.cents
             GROUP BY 1),
      idx AS (SELECT event_type, r2_j, n_blocks,
                     CAST(row_number() OVER (ORDER BY event_type ASC)
                       AS BIGINT) AS j
              FROM pt),
      a AS (SELECT CAST(max(n_blocks) AS BIGINT) AS m,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(j * r2_j) AS BIGINT) AS l2
            FROM idx),
      dv AS (SELECT m, k, l2,
                    l2 * 2 - m * k * (k + 1) * (k + 1) AS dev2
             FROM a),
      z AS (SELECT m, k, l2, dev2,
                   CASE WHEN k < 2 THEN NULL
                   ELSE CAST(CAST(36000000 AS HUGEINT) * dev2 * dev2
                     // (4 * m * k * k * (k + 1) * (k * k - 1))
                     AS BIGINT) END AS mag
            FROM dv)
      SELECT m, k, l2,
             CAST(CASE WHEN dev2 >= 0 THEN mag ELSE -mag END AS BIGINT)
               AS z2_e6,
             mag >= 3841600 AS ordered_trend_5pct
      FROM z""")),

    Q("q_jonckheere", jonckheere, Some("""
      WITH v AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        CAST(count(*) AS BIGINT) AS cnt
                 FROM events WHERE value IS NOT NULL
                 GROUP BY 1, 2),
      latt AS (SELECT t.event_type, c.cents, coalesce(v.cnt, 0) AS cnt
               FROM (SELECT DISTINCT cents FROM v) c
               CROSS JOIN (SELECT DISTINCT event_type FROM v) t
               LEFT JOIN v USING (event_type, cents)),
      w1 AS (SELECT *, CAST(coalesce(sum(cnt) OVER (
                 PARTITION BY event_type ORDER BY cents ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_less
             FROM latt),
      w2 AS (SELECT *, CAST(coalesce(sum(cum_less) OVER (
                 PARTITION BY cents ORDER BY event_type ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS less_prev,
                  CAST(coalesce(sum(cnt) OVER (
                 PARTITION BY cents ORDER BY event_type ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS eq_prev
             FROM w1),
      u AS (SELECT CAST(sum(cnt * (2 * less_prev + eq_prev))
              AS BIGINT) AS u2
            FROM w2),
      sz AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
                    CAST(sum(n_i * n_i) AS BIGINT) AS sum_ni2,
                    CAST(sum(CAST(n_i AS HUGEINT) * n_i
                      * (2 * n_i + 3)) AS HUGEINT) AS var_sub,
                    CAST(count(*) AS BIGINT) AS k_groups
             FROM (SELECT event_type, sum(cnt) AS n_i
                   FROM v GROUP BY 1)),
      st AS (SELECT k_groups, n, u2,
                    (n * n - sum_ni2) // 2 AS e_u2,
                    CAST(n AS HUGEINT) * n * (2 * n + 3) - var_sub
                      AS var_u72
             FROM u, sz),
      z AS (SELECT *, u2 - e_u2 AS dev FROM st)
      SELECT k_groups, n, u2, CAST(e_u2 AS BIGINT) AS e_u2,
             CAST(var_u72 AS BIGINT) AS var_u72,
             CAST(CASE WHEN var_u72 <= 0 THEN 0
                  WHEN dev >= 0 THEN
                    CAST(18000000 AS HUGEINT) * abs(dev) * abs(dev)
                      // var_u72
                  ELSE -(CAST(18000000 AS HUGEINT) * abs(dev)
                      * abs(dev) // var_u72) END AS BIGINT) AS z2_e6,
             var_u72 > 0 AND CAST(18000000 AS HUGEINT) * abs(dev)
               * abs(dev) // var_u72 >= 3841600 AS ordered_shift_5pct
      FROM z""")),

    Q("q_cliffs_delta", cliffsDelta, Some("""
      WITH g AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        CAST(sum(CASE WHEN event_id % 2 = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
                        CAST(sum(CASE WHEN event_id % 2 = 0
                          THEN 0 ELSE 1 END) AS BIGINT) AS trt_cnt
                 FROM events WHERE value IS NOT NULL
                 GROUP BY 1, 2),
      w AS (SELECT *, CAST(sum(ref_cnt) OVER (
                PARTITION BY event_type ORDER BY cents ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_ref,
                 CAST(sum(ref_cnt) OVER (PARTITION BY event_type)
              AS BIGINT) AS n_ref_t
            FROM g),
      a AS (SELECT event_type,
                   CAST(sum(ref_cnt) AS BIGINT) AS n_ref,
                   CAST(sum(trt_cnt) AS BIGINT) AS n_trt,
                   CAST(sum(trt_cnt * (cum_ref - ref_cnt)) AS BIGINT)
                     AS gt,
                   CAST(sum(trt_cnt * (n_ref_t - cum_ref)) AS BIGINT)
                     AS lt
            FROM w GROUP BY 1),
      m AS (SELECT *, CASE WHEN n_ref * n_trt = 0 THEN NULL
                      ELSE abs(gt - lt) * 1000000 // (n_ref * n_trt)
                      END AS mag
            FROM a)
      SELECT event_type, n_ref, n_trt, gt, lt,
             CAST(CASE WHEN gt >= lt THEN mag ELSE -mag END AS BIGINT)
               AS delta_e6,
             CASE WHEN mag IS NULL THEN NULL
                  WHEN mag < 147000 THEN 'negligible'
                  WHEN mag < 330000 THEN 'small'
                  WHEN mag < 474000 THEN 'medium'
                  ELSE 'large' END AS magnitude
      FROM m""")),

    Q("q_cohens_d", cohensD, Some("""
      WITH m AS (
        SELECT event_type,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN cents
                        ELSE 0 END) AS BIGINT) AS s1,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN cents * cents
                        ELSE 0 END) AS BIGINT) AS ss1,
               CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n2,
               CAST(sum(CASE WHEN event_id % 2 <> 0 THEN cents
                        ELSE 0 END) AS BIGINT) AS s2,
               CAST(sum(CASE WHEN event_id % 2 <> 0 THEN cents * cents
                        ELSE 0 END) AS BIGINT) AS ss2
        FROM (SELECT event_type, event_id,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
              FROM events WHERE value IS NOT NULL)
        GROUP BY 1 HAVING n1 > 1 AND n2 > 1),
      x AS (SELECT event_type, n1, n2,
                   ((ss1 - CAST(s1 AS DOUBLE) * s1 / CAST(n1 AS DOUBLE))
                    + (ss2 - CAST(s2 AS DOUBLE) * s2
                       / CAST(n2 AS DOUBLE)))
                   / CAST(n1 + n2 - 2 AS DOUBLE) AS sp2,
                   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS md
            FROM m)
      SELECT event_type, n1, n2,
             CASE WHEN sp2 > 0 THEN
               CAST(floor(md / sqrt(sp2) * 1000000.0) AS BIGINT)
             END AS d_e6,
             CASE WHEN sp2 > 0 THEN
               CAST(floor(md / sqrt(sp2)
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                 * 1000000.0) AS BIGINT)
             END AS g_e6
      FROM x""")),

    Q("q_mutual_information", mutualInformation, Some("""
      WITH cells AS (
        SELECT event_type AS x,
               CAST(isodow(CAST(ts AS DATE)) % 7 + 1 AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
      w AS (SELECT x, y, o,
                   CAST(sum(o) OVER (PARTITION BY x) AS BIGINT) AS rx,
                   CAST(sum(o) OVER (PARTITION BY y) AS BIGINT) AS ry,
                   CAST(sum(o) OVER () AS BIGINT) AS n
            FROM cells),
      mi AS (SELECT CAST(sum(CAST(floor(CAST(o AS DOUBLE) / n
                      * ln(CAST(o AS DOUBLE) * n
                           / (CAST(rx AS DOUBLE) * ry))
                      * 1000000000.0) AS BIGINT)) AS BIGINT) AS mi_e9,
                    CAST(max(n) AS BIGINT) AS n
             FROM w),
      hx AS (SELECT CAST(sum(CAST(floor(-(CAST(rx AS DOUBLE) / n)
                      * ln(CAST(rx AS DOUBLE) / n)
                      * 1000000000.0) AS BIGINT)) AS BIGINT) AS hx_e9
             FROM (SELECT x, max(rx) AS rx, max(n) AS n
                   FROM w GROUP BY 1)),
      hy AS (SELECT CAST(sum(CAST(floor(-(CAST(ry AS DOUBLE) / n)
                      * ln(CAST(ry AS DOUBLE) / n)
                      * 1000000000.0) AS BIGINT)) AS BIGINT) AS hy_e9
             FROM (SELECT y, max(ry) AS ry, max(n) AS n
                   FROM w GROUP BY 1))
      SELECT n, mi_e9, hx_e9, hy_e9,
             CASE WHEN hx_e9 > 0 AND hy_e9 > 0 THEN
               CAST(floor(CAST(mi_e9 AS DOUBLE)
                 / sqrt(CAST(hx_e9 AS DOUBLE) * hy_e9)
                 * 1000000.0) AS BIGINT) END AS nmi_e6
      FROM mi CROSS JOIN hx CROSS JOIN hy""")),

    Q("q_js_divergence", jsDivergence, Some("""
      WITH base AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               event_id % 2 = 0 AS is_ref
        FROM events WHERE value IS NOT NULL),
      cells AS (
        SELECT event_type, cents // 2000 AS band,
               CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                 AS a,
               CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                 AS b
        FROM base GROUP BY 1, 2),
      w AS (SELECT *,
                   CAST(sum(a) OVER (PARTITION BY event_type)
                     AS BIGINT) AS na,
                   CAST(sum(b) OVER (PARTITION BY event_type)
                     AS BIGINT) AS nb
            FROM cells),
      terms AS (
        SELECT event_type, na, nb,
               CASE WHEN a > 0 THEN
                 CAST(floor(CAST(a AS DOUBLE) / na
                   * ln((CAST(a AS DOUBLE) / na)
                        / ((CAST(a AS DOUBLE) / na
                            + CAST(b AS DOUBLE) / nb) / 2.0))
                   * 1000000000.0) AS BIGINT) ELSE 0 END AS tp_e9,
               CASE WHEN b > 0 THEN
                 CAST(floor(CAST(b AS DOUBLE) / nb
                   * ln((CAST(b AS DOUBLE) / nb)
                        / ((CAST(a AS DOUBLE) / na
                            + CAST(b AS DOUBLE) / nb) / 2.0))
                   * 1000000000.0) AS BIGINT) ELSE 0 END AS tq_e9
        FROM w),
      agg AS (SELECT event_type,
                     CAST(max(na) AS BIGINT) AS n_ref,
                     CAST(max(nb) AS BIGINT) AS n_cur,
                     CAST(sum(tp_e9) AS BIGINT) AS kl_pm_e9,
                     CAST(sum(tq_e9) AS BIGINT) AS kl_qm_e9
              FROM terms GROUP BY 1)
      SELECT event_type, n_ref, n_cur, kl_pm_e9, kl_qm_e9,
             CAST(floor(CAST(kl_pm_e9 + kl_qm_e9 AS DOUBLE) / 2.0)
               AS BIGINT) AS js_e9
      FROM agg""")),

    Q("q_wasserstein_drift", wassersteinDrift, Some("""
      WITH base AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               event_id % 2 = 0 AS is_ref
        FROM events WHERE value IS NOT NULL),
      grid AS (
        SELECT event_type, cents,
               CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                 AS a,
               CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                 AS b
        FROM base GROUP BY 1, 2),
      w AS (SELECT *,
                   CAST(sum(a) OVER (PARTITION BY event_type
                     ORDER BY cents ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_a,
                   CAST(sum(b) OVER (PARTITION BY event_type
                     ORDER BY cents ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_b,
                   lead(cents, 1) OVER (PARTITION BY event_type
                     ORDER BY cents ASC) - cents AS gap,
                   CAST(sum(a) OVER (PARTITION BY event_type)
                     AS BIGINT) AS na,
                   CAST(sum(b) OVER (PARTITION BY event_type)
                     AS BIGINT) AS nb
            FROM grid)
      SELECT event_type,
             CAST(max(na) AS BIGINT) AS n_ref,
             CAST(max(nb) AS BIGINT) AS n_cur,
             CAST(count(*) + 1 AS BIGINT) AS m_support,
             CAST(sum(abs(cum_a * nb - cum_b * na) * gap) AS BIGINT)
               AS w1_num,
             CAST(sum(abs(cum_a * nb - cum_b * na) * gap) * 100
               // (max(na) * max(nb)) AS BIGINT) AS w1_e2
      FROM w WHERE gap IS NOT NULL GROUP BY 1""")),

    Q("q_jarque_bera", jarqueBera, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sc,
                     min(cents) AS mn, max(cents) AS mx
              FROM daily GROUP BY 1
              HAVING count(*) >= 8 AND max(cents) > min(cents)),
      z AS (SELECT daily.event_type AS event_type, n,
                   CAST(floor(CAST(n * cents - sc AS DOUBLE) * 10000.0
                     / (n * (mx - mn))) AS BIGINT) AS z_e4
            FROM daily JOIN tot ON daily.event_type = tot.event_type),
      m AS (SELECT event_type, max(n) AS n_days,
                   CAST(sum(z_e4 * z_e4) AS BIGINT) AS m2,
                   CAST(sum(z_e4 * z_e4 * z_e4) AS BIGINT) AS m3,
                   CAST(sum(z_e4 * z_e4 * z_e4 * z_e4) AS BIGINT) AS m4
            FROM z GROUP BY 1),
      sk AS (SELECT *,
                    sqrt(CAST(n_days AS DOUBLE)) * m3
                      / (m2 * sqrt(CAST(m2 AS DOUBLE))) AS sk,
                    CAST(n_days AS DOUBLE) * m4
                      / (CAST(m2 AS DOUBLE) * m2) AS kt
             FROM m)
      SELECT event_type, n_days, m2, m3, m4,
             CAST(floor(sk * 1000000.0) AS BIGINT) AS skew_e6,
             CAST(floor(kt * 1000000.0) AS BIGINT) AS kurt_e6,
             CAST(floor(CAST(n_days AS DOUBLE) / 6.0
               * (sk * sk + (kt - 3.0) * (kt - 3.0) / 4.0)
               * 1000.0) AS BIGINT) AS jb_e3
      FROM sk""")),

    Q("q_durbin_watson", durbinWatson, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sc,
                     min(cents) AS mn, max(cents) AS mx
              FROM daily GROUP BY 1
              HAVING count(*) >= 8 AND max(cents) > min(cents)),
      z AS (SELECT daily.event_type AS event_type, day,
                   CAST(floor(CAST(n * cents - sc AS DOUBLE) * 10000.0
                     / (n * (mx - mn))) AS BIGINT) AS z_e4
            FROM daily JOIN tot ON daily.event_type = tot.event_type),
      lagd AS (SELECT event_type, z_e4,
                      z_e4 - lag(z_e4) OVER (PARTITION BY event_type
                        ORDER BY day ASC) AS dz
               FROM z),
      agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(z_e4 * z_e4) AS BIGINT) AS sum_z2,
                     CAST(sum(dz * dz) AS BIGINT) AS sum_dz2
              FROM lagd GROUP BY 1)
      SELECT event_type, n_days, sum_z2, sum_dz2,
             CAST(sum_dz2 * 1000000 // sum_z2 AS BIGINT) AS dw_e6
      FROM agg WHERE sum_z2 > 0""")),

    Q("q_adf_test", adfTest, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sc,
                     min(cents) AS mn, max(cents) AS mx
              FROM daily GROUP BY 1
              HAVING count(*) >= 8 AND max(cents) > min(cents)),
      z AS (SELECT daily.event_type AS event_type, day,
                   CAST(floor(CAST(n * cents - sc AS DOUBLE) * 10000.0
                     / (n * (mx - mn))) AS BIGINT) AS z_e4
            FROM daily JOIN tot ON daily.event_type = tot.event_type),
      lagd AS (SELECT event_type, z_e4,
                      lag(z_e4) OVER (PARTITION BY event_type
                        ORDER BY day ASC) AS xlag
               FROM z),
      agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_diffs,
                     CAST(sum(xlag * (z_e4 - xlag)) AS BIGINT) AS sxd,
                     CAST(sum(xlag * xlag) AS BIGINT) AS sxx,
                     CAST(sum((z_e4 - xlag) * (z_e4 - xlag)) AS BIGINT)
                       AS sdd
              FROM lagd WHERE xlag IS NOT NULL GROUP BY 1),
      t AS (SELECT *,
                   CAST(sxx AS HUGEINT) * sdd
                     - CAST(sxd AS HUGEINT) * sxd AS t2_den
            FROM agg WHERE sxx > 0)
      SELECT event_type, n_diffs, sxd, sxx, sdd,
             CAST(CAST(sxd AS HUGEINT) * 1000000 // sxx AS BIGINT)
               AS beta_ppm,
             CAST((n_diffs - 1) * CAST(sxd AS HUGEINT) * sxd * 1000000
               // t2_den AS BIGINT) AS t2_e6,
             sxd < 0 AND (n_diffs - 1) * CAST(sxd AS HUGEINT) * sxd
               * 1000000 // t2_den >= 8179600 AS stationary_5pct
      FROM t WHERE t2_den > 0""")),

    Q("q_granger_lag1", grangerLag1, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sc,
                     min(cents) AS mn, max(cents) AS mx
              FROM daily GROUP BY 1
              HAVING count(*) >= 8 AND max(cents) > min(cents)),
      z AS (SELECT daily.event_type AS event_type, day,
                   CAST(floor(CAST(n * cents - sc AS DOUBLE) * 10000.0
                     / (n * (mx - mn))) AS BIGINT) AS z_e4
            FROM daily JOIN tot ON daily.event_type = tot.event_type),
      lagd AS (SELECT event_type, day, z_e4,
                      lag(z_e4) OVER (PARTITION BY event_type
                        ORDER BY day ASC) AS zlag
               FROM z),
      lz AS (SELECT * FROM lagd WHERE zlag IS NOT NULL),
      pair AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                      b.z_e4 AS y, b.zlag AS x, a.zlag AS wv
               FROM lz b JOIN lz a ON a.day = b.day
               WHERE a.event_type <> b.event_type),
      m AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(wv) AS BIGINT) AS sw,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(wv * wv) AS BIGINT) AS sww,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(wv * y) AS BIGINT) AS swy,
                   CAST(sum(x * wv) AS BIGINT) AS sxw
            FROM pair GROUP BY 1, 2),
      c AS (SELECT type_a, type_b, n,
                   CAST(n * sxx - sx * sx AS BIGINT) AS a_c,
                   CAST(n * sww - sw * sw AS BIGINT) AS b_c,
                   CAST(n * sxw - sx * sw AS BIGINT) AS c_c,
                   CAST(n * sxy - sx * sy AS BIGINT) AS d_c,
                   CAST(n * swy - sw * sy AS BIGINT) AS e_c,
                   CAST(n * syy - sy * sy AS BIGINT) AS y_c
            FROM m),
      f AS (SELECT *,
                   (CAST(y_c AS DOUBLE) * a_c
                    - CAST(d_c AS DOUBLE) * d_c)
                     / CAST(a_c AS DOUBLE) AS rss_r,
                   (CAST(y_c AS DOUBLE)
                      * (CAST(a_c AS DOUBLE) * b_c
                         - CAST(c_c AS DOUBLE) * c_c)
                    - CAST(d_c AS DOUBLE) * d_c * b_c
                    + 2.0 * d_c * e_c * c_c
                    - CAST(e_c AS DOUBLE) * e_c * a_c)
                     / (CAST(a_c AS DOUBLE) * b_c
                        - CAST(c_c AS DOUBLE) * c_c) AS rss_u
            FROM c
            WHERE n > 3 AND a_c > 0
              AND CAST(a_c AS HUGEINT) * b_c
                  - CAST(c_c AS HUGEINT) * c_c > 0)
      SELECT type_a, type_b, n, a_c, b_c, c_c, d_c, e_c, y_c,
             CASE WHEN rss_u > 0 THEN
               CAST(floor(CAST(n - 3 AS DOUBLE) * (rss_r - rss_u)
                 / rss_u * 1000.0) AS BIGINT) END AS f_e3,
             CASE WHEN rss_u > 0 THEN
               CAST(floor(CAST(n - 3 AS DOUBLE) * (rss_r - rss_u)
                 / rss_u * 1000.0) AS BIGINT) END IS NOT NULL
             AND CASE WHEN rss_u > 0 THEN
               CAST(floor(CAST(n - 3 AS DOUBLE) * (rss_r - rss_u)
                 / rss_u * 1000.0) AS BIGINT) END >= 4240
               AS granger_5pct
      FROM f""")),

    Q("q_esd_outliers", esdOutliers, Some(esdOracle)),

    Q("q_zero_inflation", zeroInflation, Some("""
      WITH base AS (SELECT event_type, user_id,
                           date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) AS dayn
                    FROM events),
      pu AS (SELECT event_type, user_id,
                    CAST(count(*) AS BIGINT) AS n_ev,
                    CAST(count(DISTINCT dayn) AS BIGINT) AS active_days
             FROM base GROUP BY 1, 2),
      span AS (SELECT event_type,
                      CAST(max(dayn) - min(dayn) + 1 AS BIGINT)
                        AS n_days
               FROM base GROUP BY 1),
      u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM base),
      g AS (SELECT pu.event_type,
                   CAST(sum(n_ev) AS BIGINT) AS total_events,
                   CAST(sum(active_days) AS BIGINT) AS nonzero_cells
            FROM pu GROUP BY 1),
      j AS (SELECT g.event_type, total_events, nonzero_cells,
                   n_users * n_days AS n_cells
            FROM g JOIN span ON g.event_type = span.event_type, u),
      e AS (SELECT *, n_cells - nonzero_cells AS zero_cells,
                   CAST(floor(n_cells * exp(-(CAST(total_events
                     AS DOUBLE) / n_cells)) * 1e6) AS BIGINT)
                     AS expected_zero_e6
            FROM j)
      SELECT event_type, n_cells, zero_cells, total_events,
             expected_zero_e6,
             CASE WHEN expected_zero_e6 > 0 THEN
               CAST(CAST(zero_cells AS HUGEINT) * 1000000000000
                 // expected_zero_e6 AS BIGINT) END AS zi_ratio_ppm
      FROM e""")),

    Q("q_did", diffInDiff, Some("""
      WITH base AS (SELECT user_id % 2 = 1 AS treated,
                           date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) AS dayn,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS cents
                    FROM events
                    WHERE event_type = 'purchase'
                      AND value IS NOT NULL),
      cuts AS (SELECT (min(dayn) + max(dayn)) // 2 AS cut,
                      (3 * min(dayn) + max(dayn)) // 4 AS fake_cut
               FROM base),
      m AS (SELECT
              sum(CASE WHEN treated AND dayn > cut THEN cents ELSE 0 END) AS s_tp,
              sum(CASE WHEN treated AND dayn > cut THEN 1 ELSE 0 END) AS n_tp,
              sum(CASE WHEN treated AND dayn <= cut THEN cents ELSE 0 END) AS s_tr,
              sum(CASE WHEN treated AND dayn <= cut THEN 1 ELSE 0 END) AS n_tr,
              sum(CASE WHEN NOT treated AND dayn > cut THEN cents ELSE 0 END) AS s_cp,
              sum(CASE WHEN NOT treated AND dayn > cut THEN 1 ELSE 0 END) AS n_cp,
              sum(CASE WHEN NOT treated AND dayn <= cut THEN cents ELSE 0 END) AS s_cr,
              sum(CASE WHEN NOT treated AND dayn <= cut THEN 1 ELSE 0 END) AS n_cr,
              sum(CASE WHEN treated AND dayn > fake_cut AND dayn <= cut THEN cents ELSE 0 END) AS fs_tp,
              sum(CASE WHEN treated AND dayn > fake_cut AND dayn <= cut THEN 1 ELSE 0 END) AS fn_tp,
              sum(CASE WHEN treated AND dayn <= fake_cut THEN cents ELSE 0 END) AS fs_tr,
              sum(CASE WHEN treated AND dayn <= fake_cut THEN 1 ELSE 0 END) AS fn_tr,
              sum(CASE WHEN NOT treated AND dayn > fake_cut AND dayn <= cut THEN cents ELSE 0 END) AS fs_cp,
              sum(CASE WHEN NOT treated AND dayn > fake_cut AND dayn <= cut THEN 1 ELSE 0 END) AS fn_cp,
              sum(CASE WHEN NOT treated AND dayn <= fake_cut THEN cents ELSE 0 END) AS fs_cr,
              sum(CASE WHEN NOT treated AND dayn <= fake_cut THEN 1 ELSE 0 END) AS fn_cr
            FROM base, cuts)
      SELECT CAST(n_tp AS BIGINT) AS n_tp, CAST(n_tr AS BIGINT) AS n_tr,
             CAST(n_cp AS BIGINT) AS n_cp, CAST(n_cr AS BIGINT) AS n_cr,
             CAST(s_tp AS BIGINT) AS s_tp, CAST(s_tr AS BIGINT) AS s_tr,
             CAST(s_cp AS BIGINT) AS s_cp, CAST(s_cr AS BIGINT) AS s_cr,
             CAST((CAST(s_tp AS HUGEINT) * n_tr * n_cp * n_cr
                 - CAST(s_tr AS HUGEINT) * n_tp * n_cp * n_cr
                 - CAST(s_cp AS HUGEINT) * n_tp * n_tr * n_cr
                 + CAST(s_cr AS HUGEINT) * n_tp * n_tr * n_cp)
               * 1000000
               // (CAST(n_tp AS HUGEINT) * n_tr * n_cp * n_cr)
               AS BIGINT) AS did_microcents,
             CAST((CAST(fs_tp AS HUGEINT) * fn_tr * fn_cp * fn_cr
                 - CAST(fs_tr AS HUGEINT) * fn_tp * fn_cp * fn_cr
                 - CAST(fs_cp AS HUGEINT) * fn_tp * fn_tr * fn_cr
                 + CAST(fs_cr AS HUGEINT) * fn_tp * fn_tr * fn_cp)
               * 1000000
               // (CAST(fn_tp AS HUGEINT) * fn_tr * fn_cp * fn_cr)
               AS BIGINT) AS placebo_microcents
      FROM m
      WHERE n_tp > 0 AND n_tr > 0 AND n_cp > 0 AND n_cr > 0
        AND fn_tp > 0 AND fn_tr > 0 AND fn_cp > 0 AND fn_cr > 0""")),

    Q("q_iv_wald", ivWald, Some("""
      WITH pu AS (SELECT user_id % 2 AS z,
                         CAST(count(*) AS BIGINT) AS x,
                         CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                           * 100 AS BIGINT)) AS BIGINT) AS y
                  FROM events
                  WHERE event_type = 'purchase' AND value IS NOT NULL
                  GROUP BY user_id),
      m AS (SELECT
              CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n1,
              CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n0,
              CAST(sum(CASE WHEN z = 1 THEN x ELSE 0 END) AS BIGINT)
                AS sx1,
              CAST(sum(CASE WHEN z = 0 THEN x ELSE 0 END) AS BIGINT)
                AS sx0,
              CAST(sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT)
                AS sy1,
              CAST(sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT)
                AS sy0
            FROM pu),
      c AS (SELECT *,
              CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1
                AS num,
              CAST(sx1 AS HUGEINT) * n0 - CAST(sx0 AS HUGEINT) * n1
                AS den
            FROM m WHERE n0 > 0 AND n1 > 0)
      SELECT n0, n1, sx0, sx1, sy0, sy1,
             CAST(CASE WHEN abs(num) <= 9223372036854775807
                    THEN num END AS BIGINT) AS itt_num,
             CAST(CASE WHEN abs(den) <= 9223372036854775807
                    THEN den END AS BIGINT) AS fs_den,
             CAST(CASE WHEN (num >= 0) = (den >= 0)
                    THEN abs(num) * 1000000 // abs(den)
                    ELSE -(abs(num) * 1000000 // abs(den)) END
               AS BIGINT) AS wald_e6
      FROM c WHERE den <> 0""")),

    Q("q_crosstab_stdres", crosstabStdres, Some("""
      WITH cells AS (SELECT o_orderpriority AS pri,
                            o_orderstatus AS st,
                            CAST(count(*) AS BIGINT) AS o
                     FROM orders GROUP BY 1, 2),
      m AS (SELECT pri, st, o,
                   CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT)
                     AS rt,
                   CAST(sum(o) OVER (PARTITION BY st) AS BIGINT)
                     AS ct,
                   CAST(sum(o) OVER () AS BIGINT) AS n
            FROM cells),
      z AS (SELECT *,
                   CAST(o AS HUGEINT) * n
                     - CAST(rt AS HUGEINT) * ct AS dev,
                   CASE WHEN rt < n AND ct < n THEN
                     CAST((CAST(o AS HUGEINT) * n
                           - CAST(rt AS HUGEINT) * ct)
                       * (CAST(o AS HUGEINT) * n
                          - CAST(rt AS HUGEINT) * ct)
                       * n * 10000
                       // (CAST(rt AS HUGEINT) * ct * (n - rt)
                          * (n - ct)) AS BIGINT)
                   ELSE 0 END AS mag
            FROM m)
      SELECT pri, st, o, rt, ct, n,
             CAST(CASE WHEN dev >= 0 THEN mag ELSE -mag END AS BIGINT)
               AS z2_e4,
             mag >= 38416 AS sig_5pct
      FROM z""")),

    Q("q_psm_att", psmAtt, Some(s"""
      WITH u AS (SELECT user_id,
                        CAST(count(*) AS BIGINT) AS n_ev,
                        CAST(sum(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                        CAST(coalesce(sum(CASE WHEN event_type =
                          'purchase' THEN CAST(CAST(value AS
                          DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
                          AS BIGINT) AS out_cents
                 FROM events GROUP BY 1),
      s AS (SELECT *, (1000 * n_click) // (n_ev + 1) AS score_e3,
                   user_id % 2 = 1 AS treated
            FROM u),
      ctl AS (SELECT score_e3 AS cb,
                     CAST(count(*) AS BIGINT) AS c_cnt,
                     CAST(sum(out_cents) AS BIGINT) AS c_sum
              FROM s WHERE NOT treated GROUP BY 1),
      cm AS (SELECT cb, CAST((c_sum * 100) // c_cnt AS BIGINT)
                          AS c_mean_e2
             FROM ctl),
      tb AS (SELECT DISTINCT score_e3 FROM s WHERE treated),
      near AS (SELECT score_e3, dist, c_mean_e2 FROM (
                 SELECT tb.score_e3, abs(tb.score_e3 - cm.cb) AS dist,
                        cm.cb, cm.c_mean_e2,
                        row_number() OVER (PARTITION BY tb.score_e3
                          ORDER BY abs(tb.score_e3 - cm.cb) ASC,
                                   cm.cb ASC) AS rn
                 FROM tb CROSS JOIN cm)
               WHERE rn = 1),
      t AS (SELECT s.out_cents, near.dist, near.c_mean_e2,
                   near.dist IS NOT NULL
                     AND near.dist <= $PsmCaliper AS matched
            FROM s LEFT JOIN near USING (score_e3)
            WHERE s.treated),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_treated,
                     CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_matched,
                     CAST(sum(CASE WHEN matched
                       THEN out_cents * 100 - c_mean_e2 ELSE 0 END)
                       AS BIGINT) AS att_num
              FROM t),
      nc AS (SELECT CAST(count(*) AS BIGINT) AS n_controls
             FROM s WHERE NOT treated)
      SELECT n_treated, n_matched, n_controls,
             CAST(CASE WHEN n_matched > 0 THEN att_num // n_matched
                  END AS BIGINT) AS att_e2
      FROM agg, nc""")),

    Q("q_rdd_sharp", rddSharp, Some(s"""
      WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS dayn,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                              * 100 AS BIGINT)) AS BIGINT) AS y
                     FROM events
                     WHERE event_type = 'purchase'
                       AND value IS NOT NULL
                     GROUP BY 1),
      cut AS (SELECT (min(dayn) + max(dayn)) // 2 AS cut FROM daily),
      sides AS (SELECT dayn - cut AS x, y,
                       CASE WHEN dayn - cut < 0 THEN 'l' ELSE 'r' END
                         AS side
                FROM daily, cut
                WHERE dayn - cut BETWEEN -$RddBandwidth
                  AND $RddBandwidth),
      m AS (SELECT side, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM sides GROUP BY 1),
      e AS (SELECT side, n, sx, sy, sxy, sxx,
                   CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                     AS dd,
                   CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy
                     AS aa,
                   CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                     AS sn
            FROM m
            WHERE CAST(n AS HUGEINT) * sxx
                  - CAST(sx AS HUGEINT) * sx > 0),
      p AS (SELECT side, n, aa, dd,
                   CASE WHEN (sn >= 0) = (dd >= 0)
                     THEN abs(sn) * 1000000 // abs(dd)
                     ELSE -(abs(sn) * 1000000 // abs(dd)) END
                     AS slope_e6,
                   CASE WHEN (aa >= 0) = (dd >= 0)
                     THEN abs(aa) * 1000 // abs(dd)
                     ELSE -(abs(aa) * 1000 // abs(dd)) END
                     AS intercept_e3
            FROM e)
      SELECT l.n AS n_l, r.n AS n_r,
             CAST(l.slope_e6 AS BIGINT) AS slope_l_e6,
             CAST(r.slope_e6 AS BIGINT) AS slope_r_e6,
             CAST(l.intercept_e3 AS BIGINT) AS intercept_l_e3,
             CAST(r.intercept_e3 AS BIGINT) AS intercept_r_e3,
             CAST(CASE WHEN (r.aa * l.dd - l.aa * r.dd >= 0)
                         = (r.dd * l.dd >= 0)
                    THEN abs(r.aa * l.dd - l.aa * r.dd) * 1000
                      // abs(r.dd * l.dd)
                    ELSE -(abs(r.aa * l.dd - l.aa * r.dd) * 1000
                      // abs(r.dd * l.dd)) END AS BIGINT) AS effect_e3
      FROM (SELECT * FROM p WHERE side = 'l') l,
           (SELECT * FROM p WHERE side = 'r') r""")),

    Q("q_grubbs_outlier", grubbsOutlier, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sc,
                     sum(CAST(cents AS HUGEINT) * cents) AS sq
              FROM daily GROUP BY 1),
      tv AS (SELECT *, n * sq - CAST(sc AS HUGEINT) * sc AS var_n2
             FROM tot
             WHERE n >= 8 AND n * sq > CAST(sc AS HUGEINT) * sc),
      dev AS (SELECT daily.event_type AS event_type, day, n, var_n2,
                     abs(n * cents - sc) AS adev
              FROM daily JOIN tv ON daily.event_type = tv.event_type),
      pk AS (SELECT event_type, n AS n_days, var_n2, day,
                    CAST(adev AS BIGINT) AS peak_adev
             FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                     ORDER BY adev DESC, day ASC) AS rn
                   FROM dev)
             WHERE rn = 1)
      SELECT event_type, n_days, day AS peak_day, peak_adev,
             CAST(CAST(peak_adev AS HUGEINT) * peak_adev * 1000000
               // var_n2 AS BIGINT) AS g2_ppm,
             CAST(peak_adev AS HUGEINT) * peak_adev
               > var_n2 * 9 AS beyond_3sigma
      FROM pk""")),

    Q("q_conformal_interval", conformalInterval, Some("""
      WITH ev AS (SELECT event_type, event_id,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents,
                         event_id % 4 AS split
                  FROM events WHERE value IS NOT NULL),
      fit AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_tr,
                     CAST(sum(cents) AS BIGINT) AS s_tr
              FROM ev WHERE split <= 1 GROUP BY 1),
      cal AS (SELECT ev.event_type AS event_type, event_id,
                     abs(n_tr * cents - s_tr) AS r
              FROM ev JOIN fit ON ev.event_type = fit.event_type
              WHERE split = 2),
      cn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
                    (9 * (count(*) + 1) + 9) // 10 AS k
             FROM cal GROUP BY 1),
      qh AS (SELECT c.event_type AS event_type, n_cal,
                    CAST(r AS BIGINT) AS qhat_scaled
             FROM (SELECT *, row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY r ASC, event_id ASC) AS rk
                   FROM cal) c
             JOIN cn ON c.event_type = cn.event_type AND c.rk = cn.k),
      t AS (SELECT ev.event_type AS event_type, n_tr, s_tr, n_cal,
                   qhat_scaled, cents
            FROM ev JOIN fit ON ev.event_type = fit.event_type
                    JOIN qh ON ev.event_type = qh.event_type
            WHERE split = 3),
      agg AS (SELECT event_type,
                     CAST(max(n_tr) AS BIGINT) AS n_train,
                     CAST(max(n_cal) AS BIGINT) AS n_cal,
                     CAST(max(qhat_scaled) AS BIGINT) AS qhat_scaled,
                     CAST(max(qhat_scaled // n_tr) AS BIGINT)
                       AS qhat_cents,
                     CAST(count(*) AS BIGINT) AS n_test,
                     CAST(sum(CASE WHEN abs(n_tr * cents - s_tr)
                         <= qhat_scaled THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_covered
              FROM t GROUP BY 1)
      SELECT event_type, n_train, n_cal, qhat_scaled, qhat_cents,
             n_test, n_covered,
             CAST(n_covered * 1000000 // n_test AS BIGINT)
               AS coverage_ppm
      FROM agg""")),

    Q("q_paired_ttest", pairedTTest, Some("""
      WITH e AS (SELECT event_type, user_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) % 2 = 0 AS pre
                 FROM events WHERE value IS NOT NULL),
      u AS (SELECT event_type, user_id,
                   CAST(sum(CASE WHEN NOT pre THEN cents ELSE 0 END)
                     - sum(CASE WHEN pre THEN cents ELSE 0 END)
                     AS BIGINT) AS dd
            FROM e GROUP BY 1, 2),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(dd) AS BIGINT) AS sd,
                   sum(CAST(dd AS HUGEINT) * dd) AS sdd
            FROM u GROUP BY 1),
      v AS (SELECT *, n * sdd - CAST(sd AS HUGEINT) * sd AS var_n2
            FROM m WHERE n > 1)
      SELECT event_type, n, sd,
             CAST(floor(CAST(sd AS DOUBLE)
               * sqrt(CAST(n - 1 AS DOUBLE))
               / sqrt(CAST(var_n2 AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS t_e6
      FROM v WHERE var_n2 > 0""")),

    Q("q_wilcoxon_signed_rank", wilcoxonSignedRank, Some("""
      WITH e AS (SELECT event_type, user_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) % 2 = 0 AS pre
                 FROM events WHERE value IS NOT NULL),
      u AS (SELECT event_type, user_id,
                   CAST(sum(CASE WHEN NOT pre THEN cents ELSE 0 END)
                     - sum(CASE WHEN pre THEN cents ELSE 0 END)
                     AS BIGINT) AS dd
            FROM e GROUP BY 1, 2),
      dz AS (SELECT event_type, dd, abs(dd) AS ad FROM u
             WHERE dd <> 0),
      grid AS (SELECT event_type, ad, CAST(count(*) AS BIGINT) AS g,
                      CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS pos,
                      CAST(sum(count(*)) OVER (PARTITION BY event_type
                        ORDER BY ad ASC ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) - count(*)
                        AS BIGINT) AS prev
               FROM dz GROUP BY event_type, ad),
      rk AS (SELECT event_type, CAST(sum(g) AS BIGINT) AS n,
                    CAST(sum(pos * (2 * prev + g + 1)) AS BIGINT)
                      AS w2_pos,
                    CAST(sum(g * g * g - g) AS BIGINT) AS tie_num
             FROM grid GROUP BY 1),
      st AS (SELECT *, n * (n + 1) // 2 AS e2,
                    2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
                      - tie_num AS v12
             FROM rk),
      z AS (SELECT *, w2_pos - e2 AS dev,
                   CASE WHEN v12 > 0 THEN
                     CAST(CAST(12000000 AS HUGEINT) * abs(w2_pos - e2)
                       * abs(w2_pos - e2) // v12 AS BIGINT)
                   ELSE 0 END AS mag
            FROM st)
      SELECT event_type, n, w2_pos, CAST(e2 AS BIGINT) AS e2,
             CAST(v12 AS BIGINT) AS v12,
             CAST(CASE WHEN dev >= 0 THEN mag ELSE -mag END AS BIGINT)
               AS z2_e6,
             mag >= 3841600 AS shift_5pct
      FROM z""")),

    Q("q_sign_test", signTest, Some("""
      WITH e AS (SELECT event_type, user_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) % 2 = 0 AS pre
                 FROM events WHERE value IS NOT NULL),
      u AS (SELECT event_type, user_id,
                   CAST(sum(CASE WHEN NOT pre THEN cents ELSE 0 END)
                     - sum(CASE WHEN pre THEN cents ELSE 0 END)
                     AS BIGINT) AS dd
            FROM e GROUP BY 1, 2),
      c AS (SELECT event_type,
                   CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_pos,
                   CAST(sum(CASE WHEN dd < 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_neg
            FROM u WHERE dd <> 0 GROUP BY 1),
      m AS (SELECT *, n_pos + n_neg AS n,
                   CASE WHEN n_pos + n_neg > 0
                          AND abs(n_pos - n_neg) > 1 THEN
                     (abs(n_pos - n_neg) - 1) * (abs(n_pos - n_neg) - 1)
                       * 1000000 // (n_pos + n_neg)
                   ELSE 0 END AS mag
            FROM c)
      SELECT event_type, n, n_pos, n_neg,
             CAST(CASE WHEN n_pos >= n_neg THEN mag ELSE -mag END
               AS BIGINT) AS z2_e6,
             mag >= 3841600 AS shift_5pct
      FROM m""")),

    Q("q_overdispersion", overdispersion, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS y
                     FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM daily GROUP BY 1)
      SELECT event_type, n_days, sy, syy,
             CAST(n_days * syy - sy * sy AS BIGINT) AS disp_num,
             CAST((n_days * syy - sy * sy) * 1000
               // ((n_days - 1) * sy) AS BIGINT) AS disp_e3,
             (n_days * syy - sy * sy) * 1000 // ((n_days - 1) * sy)
               > 1000 AS overdispersed
      FROM m WHERE n_days > 1 AND sy > 0""")),

    Q("q_mmd_drift", mmdDrift, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events WHERE value IS NOT NULL),
      m AS (SELECT event_type,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_r,
                   CAST(sum(CASE WHEN is_ref THEN cents ELSE 0 END)
                     AS BIGINT) AS s_r,
                   sum(CASE WHEN is_ref
                       THEN CAST(cents AS HUGEINT) * cents
                       ELSE 0 END) AS q_r,
                   CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_c,
                   CAST(sum(CASE WHEN NOT is_ref THEN cents ELSE 0 END)
                     AS BIGINT) AS s_c,
                   sum(CASE WHEN NOT is_ref
                       THEN CAST(cents AS HUGEINT) * cents
                       ELSE 0 END) AS q_c
            FROM e GROUP BY 1),
      c AS (SELECT *,
                   CAST(s_r AS DOUBLE) / n_r AS mu_r,
                   CAST(s_c AS DOUBLE) / n_c AS mu_c,
                   CAST(q_r AS DOUBLE) / n_r AS qq_r,
                   CAST(q_c AS DOUBLE) / n_c AS qq_c
            FROM m WHERE n_r > 0 AND n_c > 0 AND s_r > 0),
      s AS (SELECT *, mu_r * mu_r AS c_scale FROM c)
      SELECT event_type, n_r, n_c, s_r, s_c,
             CAST(floor((2.0 * (mu_r - mu_c) * (mu_r - mu_c) / c_scale
               + (qq_r - qq_c) * (qq_r - qq_c) / (c_scale * c_scale))
               * 1000000000.0) AS BIGINT) AS mmd2_e9
      FROM s""")),

    Q("q_energy_distance", energyDistance, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events WHERE value IS NOT NULL),
      grid AS (SELECT event_type, cents,
                      sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
                      sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS b
               FROM e GROUP BY 1, 2),
      w AS (SELECT *,
                   sum(a) OVER (PARTITION BY event_type
                     ORDER BY cents ASC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum_a,
                   sum(b) OVER (PARTITION BY event_type
                     ORDER BY cents ASC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum_b,
                   lead(cents) OVER (PARTITION BY event_type
                     ORDER BY cents ASC) - cents AS gap,
                   sum(a) OVER (PARTITION BY event_type) AS na,
                   sum(b) OVER (PARTITION BY event_type) AS nb
            FROM grid),
      agg AS (SELECT event_type,
                     CAST(max(na) AS BIGINT) AS n_r,
                     CAST(max(nb) AS BIGINT) AS n_c,
                     CAST(sum(gap * (cum_a * (nb - cum_b)
                       + cum_b * (na - cum_a))) AS BIGINT) AS sxy,
                     CAST(sum(gap * (cum_a * (na - cum_a)))
                       AS BIGINT) AS sxx,
                     CAST(sum(gap * (cum_b * (nb - cum_b)))
                       AS BIGINT) AS syy
              FROM w WHERE gap IS NOT NULL GROUP BY 1)
      SELECT event_type, n_r, n_c, sxy, sxx, syy,
             CAST((2 * CAST(sxy AS HUGEINT) * n_r * n_c
                   - 2 * CAST(sxx AS HUGEINT) * n_c * n_c
                   - 2 * CAST(syy AS HUGEINT) * n_r * n_r) * 100
               // (CAST(n_r AS HUGEINT) * n_r * n_c * n_c) AS BIGINT)
               AS energy_e2
      FROM agg"""))
  )
}
