package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Agreement, stratified-association, and uplift-evaluation operators —
  * round 13's measurement battery. The reference's dashboard compares
  * the same metric across segments and sources (README.md:16-20,
  * `reviews.py`-style rollups); these are the statistics that say
  * whether two measurements AGREE rather than merely correlate, and
  * whether a stratified association or a ranked uplift is real:
  *
  *  - q_icc_agreement: one-way random-effects intraclass correlation
  *    ICC(1,1) (Shrout & Fleiss 1979) across event-type "raters" of
  *    daily revenue "subjects".
  *  - q_bland_altman: Bland–Altman (1986) agreement between two paired
  *    daily measures — mean difference, 1.96·sd limits, points outside.
  *  - q_mantel_haenszel: Mantel–Haenszel (1959) common odds ratio and
  *    Cochran–MH chi-square across weekday strata.
  *  - q_turning_points: Kendall's turning-point randomness test over
  *    each daily series (Kendall & Stuart, vol. 3).
  *  - q_cross_corr_lags: the sample cross-correlation function at lags
  *    −3..+3 between two daily series (Box & Jenkins ch. 11).
  *  - q_qini_curve: cumulative uplift (Qini) curve by score decile
  *    (Radcliffe 2007) — the evaluation view q_did/q_iv_wald lack.
  *
  * Float discipline: identical to StatsQueries — inputs snap to the
  * cents grid via decimal, every cross-row product runs in
  * decimal(38,0) (HUGEINT on the oracle side), every emitted quotient
  * is a sign-split truncating division or an
  * [[StatsQueries.exactFloorDivSqrt]] exact floor, so no engine can
  * diverge. 100 TB shape: every query here collapses the fact table
  * with ONE map-side-combinable rollup to a day / stratum / decile
  * grid (bounded by calendar × type, not row count) before any window
  * or join runs; the only per-row second pass (Bland–Altman's outside
  * count) joins a broadcast 1-row moment table.
  */
object AgreementQueries {

  /** Cents snap shared by every query in this battery. */
  private def cents(c: Column): Column =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** Daily cents per event type — the battery's shared series. */
  private def dailyCents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        cents($"value").as("c"))
      .groupBy($"event_type", $"day")
      .agg(sum($"c").as("day_cents"))
  }

  /** Raters in the balanced ICC design = the event-type count; days
    * missing any type are dropped (one-way ANOVA needs balance). */
  val IccRaters = 5L

  /** One-way random-effects ICC(1,1): subjects = days, raters = the
    * [[IccRaters]] event types, measurement = daily cents. With
    * A = Σᵢ sᵢ², T = Σ x², S the grand sum, n subjects, k raters:
    * MSB = (nA − S²)/(nk(n−1)), MSW = (kT − A)/(nk(k−1)), and
    * ICC = (MSB − MSW)/(MSB + (k−1)MSW) reduces over the common
    * denominator nk(n−1)(k−1) to the EXACT integer fraction
    * num = (nA − S²)(k−1) − (kT − A)(n−1),
    * den = (k−1)·((nA − S²) + (kT − A)(n−1)) — den ≥ 0 always (both
    * mean squares are nonnegative), so one sign-split truncating
    * division emits icc_e6 identically on both engines. decimal(38,0)
    * holds the products to ~3e10× current volume. Shape: day-grid
    * rollup, then a 1-row aggregate. */
  private def iccAgreement(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    dailyCents(s, d)
      .groupBy($"day")
      .agg(count(lit(1)).as("kk"), sum($"day_cents").as("si"),
        sum(expr("cast(day_cents as decimal(38,0)) * day_cents"))
          .as("qi"))
      .filter($"kk" === IccRaters)
      .agg(count(lit(1)).as("n"), sum($"si").as("s"),
        sum(expr("cast(si as decimal(38,0)) * si")).as("a"),
        sum($"qi").as("t"))
      .withColumn("num", expr(
        s"(cast(n as decimal(38,0)) * a - cast(s as decimal(38,0)) * s)" +
          s" * (${IccRaters} - 1)" +
          s" - ($IccRaters * t - a) * (n - 1)"))
      .withColumn("den", expr(
        s"(${IccRaters} - 1) *" +
          s" ((cast(n as decimal(38,0)) * a - cast(s as decimal(38,0)) * s)" +
          s"  + ($IccRaters * t - a) * (n - 1))"))
      .select($"n".as("n_days"), lit(IccRaters).as("k_types"),
        when($"den" > 0, 1L).otherwise(0L).as("icc_defined"),
        when($"den" <= 0, lit(-2000000L))
          .when($"num" >= 0,
            expr("cast(num * 1000000 div den as bigint)"))
          .otherwise(expr("cast(-((-num) * 1000000 div den) as bigint)"))
          .as("icc_e6"))
  }

  /** The two paired daily measures Bland–Altman compares. */
  val BaPair: (String, String) = ("click", "view")

  /** Bland–Altman agreement: per-day difference d = click − view in
    * whole DOLLARS (cents div 100 — both sums are nonnegative so the
    * truncation is engine-identical), then the classic triple: mean
    * difference (e2), the SQUARED 1.96·sd half-width of the limits of
    * agreement (e4 — emitted squared so the whole statistic stays
    * sqrt-free: 1.96² = 38416/10⁴ is exact rational, and
    * h² = 38416·v/(10⁴·n(n−1)) with v = nΣd² − (Σd)² needs only
    * integer products), and the count of days OUTSIDE the limits via
    * the cross-multiplied exact test
    * (n·dᵢ − Σd)²·10⁴·(n−1) > 38416·v·n. All products in
    * decimal(38,0)/HUGEINT — exact at any volume. Shape: day-grid
    * rollup → 1-row moments → broadcast back over the ≤|days| rows. */
  private def blandAltman(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = dailyCents(s, d)
      .withColumn("v", expr("day_cents div 100"))
    val pairs = daily.filter($"event_type" === BaPair._1)
      .select($"day", $"v".as("x"))
      .join(daily.filter($"event_type" === BaPair._2)
        .select($"day", $"v".as("y")), "day")
      .select($"day", ($"x" - $"y").as("dd"))
    val m = pairs.agg(count(lit(1)).as("n"), sum($"dd").as("sd1"),
        sum(expr("cast(dd as decimal(38,0)) * dd")).as("sdd"))
      .withColumn("vv", expr(
        "cast(n as decimal(38,0)) * sdd" +
          " - cast(sd1 as decimal(38,0)) * sd1"))
    val outside = pairs.crossJoin(broadcast(m))
      .filter(expr(
        "(cast(n as decimal(38,0)) * dd - sd1)" +
          " * (cast(n as decimal(38,0)) * dd - sd1) * 10000 * (n - 1)" +
          " > 38416 * vv * n"))
      .agg(count(lit(1)).as("n_outside"))
    m.crossJoin(broadcast(outside))
      .select($"n".as("n_days"), $"sd1".as("sum_d"),
        when($"sd1" >= 0, expr("cast(sd1 * 100 div n as bigint)"))
          .otherwise(expr("cast(-((-sd1) * 100 div n) as bigint)"))
          .as("mean_d_e2"),
        when($"n" > 1,
          expr("cast(38416 * vv div (n * (n - 1)) as bigint)"))
          .otherwise(lit(-1L)).as("halfwidth2_e4"),
        $"n_outside")
  }

  /** Mantel–Haenszel common odds ratio + Cochran–MH chi-square across
    * weekday strata: exposure = user parity (the q_did/q_iv_wald
    * instrument), outcome = the event being a purchase, stratum =
    * day-of-week. Per stratum the 2×2 cells (a,b,c,dd) are exact
    * counts; the MH sums R = Σ aₖdₖ/nₖ and S = Σ bₖcₖ/nₖ and the CMH
    * expectation/variance terms are each emitted through ONE
    * per-stratum e6/e12-scaled truncating division (all operands
    * nonnegative, so Spark's div and DuckDB's // agree), making the
    * estimator "scaled-MH": exact-by-construction and
    * engine-identical, within 1e-6 of the real-valued MH statistic
    * per stratum. or_e6 = ΣR·10⁶ div ΣS; chi2_e4 from
    * (Σa·10⁶ − ΣE)² against ΣV. Shape: one map-side-combinable rollup
    * to ≤7 strata rows, one 1-row aggregate — any volume. */
  private def mantelHaenszel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    Tables.events(s, d)
      .select(dayofweek($"ts").cast("long").as("stratum"),
        ($"user_id" % 2 === 1).as("exposed"),
        ($"event_type" === "purchase").as("success"))
      .groupBy($"stratum")
      .agg(sum(when($"exposed" && $"success", 1L).otherwise(0L)).as("a"),
        sum(when($"exposed" && !$"success", 1L).otherwise(0L)).as("b"),
        sum(when(!$"exposed" && $"success", 1L).otherwise(0L)).as("c"),
        sum(when(!$"exposed" && !$"success", 1L).otherwise(0L)).as("dd"))
      .withColumn("n", $"a" + $"b" + $"c" + $"dd")
      .filter($"n" > 1)
      .select($"a", $"n",
        expr(s"cast(a as $dec) * dd * 1000000 div n").as("r"),
        expr(s"cast(b as $dec) * c * 1000000 div n").as("s2"),
        expr(s"cast(a + b as $dec) * (a + c) * 1000000 div n").as("e"),
        expr(s"cast(a + b as $dec) * (c + dd) * (a + c) * (b + dd)" +
          s" * 1000000000000 div (cast(n as $dec) * n * (n - 1))")
          .as("v"))
      .agg(count(lit(1)).as("n_strata"), sum($"a").as("sum_a"),
        sum($"r").as("sum_r"), sum($"s2").as("sum_s"),
        sum($"e").as("sum_e"), sum($"v").as("sum_v"))
      .select($"n_strata", $"sum_a", $"sum_r", $"sum_s",
        when($"sum_s" > 0,
          expr(s"cast(cast(sum_r as $dec) * 1000000 div sum_s as bigint)"))
          .otherwise(lit(-1L)).as("or_e6"),
        when($"sum_v" > 0, expr(
          s"cast((cast(sum_a as $dec) * 1000000 - sum_e)" +
            s" * (cast(sum_a as $dec) * 1000000 - sum_e)" +
            s" * 10000 div (cast(sum_v as $dec) * 1000000) as bigint)"))
          .otherwise(lit(-1L)).as("chi2_e4"))
      .withColumn("assoc_5pct", $"chi2_e4" >= 38415L)
  }

  /** Kendall's turning-point test per event type: an interior day is a
    * turning point when it is a strict local max or min of the daily
    * cents series (ties break neither way — deterministic on the cents
    * grid). Under randomness E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90,
    * so with m = 3T − 2n + 4 (= 3(T − E)) the squared z-statistic is
    * the EXACT rational z² = 10·m²/(16n − 29) — emitted e4 with m's
    * sign, flag |z| ≥ 1.96 ⟺ magnitude ≥ 38416. No sqrt anywhere.
    * Shape: day-grid rollup, per-type window (≤|days| rows each), a
    * |types|-row aggregate. */
  private def turningPoints(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val win = W.partitionBy($"event_type").orderBy($"day".asc)
    dailyCents(s, d)
      .select($"event_type", $"day", $"day_cents".as("x"))
      .withColumn("p", lag($"x", 1).over(win))
      .withColumn("q", lead($"x", 1).over(win))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when($"p".isNotNull && $"q".isNotNull &&
          (($"x" > $"p" && $"x" > $"q") || ($"x" < $"p" && $"x" < $"q")),
          1L).otherwise(0L)).as("n_turning"))
      .filter($"n_days" >= 3)
      .withColumn("m",
        lit(3L) * $"n_turning" - lit(2L) * $"n_days" + lit(4L))
      .withColumn("mag",
        expr("cast(cast(m as decimal(38,0)) * m * 100000" +
          " div (16 * n_days - 29) as bigint)"))
      .select($"event_type", $"n_days", $"n_turning",
        when($"m" >= 0, $"mag").otherwise(-$"mag").as("z2_e4"),
        ($"mag" >= 38416L).as("nonrandom_5pct"))
  }

  /** The (x, y) series pair and lag range of [[crossCorrLags]]. */
  val CcfPair: (String, String) = ("click", "purchase")
  val CcfLags: Seq[Long] = -3L to 3L

  /** Sample cross-correlation function: corr(click_t, purchase_{t+ℓ})
    * for ℓ ∈ [[CcfLags]] over the daily DOLLARS grid (cents div 100 —
    * nonnegative, engine-identical; the coarser grid keeps
    * num²·10⁶ inside decimal(38,0) through ~100× current volume,
    * documented like rddSharp's bound). Exact centered moments
    * num/vx/vy fold in decimal(38,0)/HUGEINT on both engines and ride
    * along through the |x| ≤ int64-max guarded cast (NULL beyond —
    * never a silent wrap); ccf_e3 is the tie-proof
    * [[StatsQueries.exactFloorDivSqrt]] floor of num·10³/√(vx·vy),
    * sentinel −2000 when either variance is zero. Shape: day-grid
    * rollup → 7-row lag fan (broadcast) → equi-join on shifted day
    * number → 7-row aggregate. */
  private def crossCorrLags(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = dailyCents(s, d)
      .select($"event_type",
        datediff($"day", lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        expr("day_cents div 100").as("v"))
    val a = daily.filter($"event_type" === CcfPair._1)
      .select($"dayn", $"v".as("x"))
    val b = daily.filter($"event_type" === CcfPair._2)
      .select($"dayn".as("dayn_b"), $"v".as("y"))
    val lags = s.createDataFrame(
      CcfLags.map(Tuple1(_))).toDF("lag_days")
    // Centered moments in decimal(38,0) end to end (sums, per-row
    // products, and the n·sxy − sx·sy forms): bare Long here wraps
    // silently past ~100× volume where the HUGEINT oracle raises —
    // the moments go out through the same |x| ≤ int64-max guarded
    // cast as itt_num/fs_den, so both engines emit NULL identically.
    val m = a.crossJoin(broadcast(lags))
      .join(b, $"dayn_b" === $"dayn" + $"lag_days")
      .groupBy($"lag_days")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(x as decimal(38,0))")).as("sx"),
        sum(expr("cast(y as decimal(38,0))")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .select($"lag_days", $"n".as("n_days"),
        expr("cast(n as decimal(38,0)) * sxy - sx * sy").as("num"),
        expr("cast(n as decimal(38,0)) * sxx - sx * sx").as("vx"),
        expr("cast(n as decimal(38,0)) * syy - sy * sy").as("vy"))
    m.select($"lag_days", $"n_days",
      expr("case when abs(num) <= 9223372036854775807" +
        " then cast(num as bigint) end").as("num"),
      expr("case when abs(vx) <= 9223372036854775807" +
        " then cast(vx as bigint) end").as("vx"),
      expr("case when abs(vy) <= 9223372036854775807" +
        " then cast(vy as bigint) end").as("vy"),
      when($"vx" > 0 && $"vy" > 0,
        StatsQueries.exactFloorDivSqrt($"num",
          $"vx" * $"vy", 1000L).cast("long"))
        .otherwise(lit(-2000L)).as("ccf_e3"))
  }

  /** Qini (cumulative uplift) curve by score decile: users ranked by
    * click count (the "model score", tie-broken on user_id), treatment
    * = user parity, response = any purchase. Per decile prefix,
    * qini_e2 = 100·Yₜ − ⌊100·Y_c·Nₜ/N_c⌋ — the treated responders in
    * excess of the control response rate scaled to the treated count
    * (Radcliffe 2007), exact integers end to end. Ranking rides
    * [[graft.ext.GlobalRank]] (range-partitioned, no single-partition
    * sort) with ntileFromRn bit-exact to SQL ntile(10); the cumulative
    * window runs over the 10 decile rows only. Shape: user rollup →
    * distributed rank → 10-row rollup. */
  private def qiniCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val users = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L))
        .as("score"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("responder"))
      .withColumn("treated", ($"user_id" % 2).cast("long"))
    val tot = users.agg(count(lit(1)).as("n_users"))
    // score DESC expressed as -score ASC: GlobalRank's range-partition
    // fast path needs a plain projectable numeric first key, and the
    // negation gives the identical total order
    val ranked = graft.ext.GlobalRank
      .withRowNumber(users.withColumn("negscore", -$"score"),
        Seq($"negscore", $"user_id"), "rn")
      .crossJoin(broadcast(tot))
      .withColumn("decile",
        graft.ext.GlobalRank.ntileFromRn($"rn", $"n_users", 10))
    val cum = W.orderBy($"decile".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked.groupBy($"decile")
      .agg(sum($"treated").as("nt"),
        (count(lit(1)) - sum($"treated")).as("nc"),
        sum(when($"treated" === 1, $"responder").otherwise(0L)).as("yt"),
        sum(when($"treated" === 0, $"responder").otherwise(0L)).as("yc"))
      .select($"decile",
        sum($"nt").over(cum).as("cum_nt"),
        sum($"nc").over(cum).as("cum_nc"),
        sum($"yt").over(cum).as("cum_yt"),
        sum($"yc").over(cum).as("cum_yc"))
      .withColumn("qini_e2",
        when($"cum_nc" > 0, expr(
          "cast(cum_yt * 100 - cast(cum_yc as decimal(38,0))" +
            " * cum_nt * 100 div cum_nc as bigint)"))
          .otherwise(lit(-1L)))
  }

  /** Critical q²·10³ for the studentized range at k = 5, df → ∞,
    * α = 5 % (q ≈ 3.858 → q² ≈ 14.885; Harter 1960 tables). */
  val TukeyQ2E3 = 14885L

  /** Tukey HSD post-hoc pairwise comparisons — the step AFTER
    * q_anova_f rejects: WHICH event-type means differ? Every
    * ingredient snaps to an INTENSIVE (volume-independent) grid
    * first — mean_e2 = ⌊100·sᵢ/nᵢ⌋ per group and
    * msw = ⌊SSW/(N−k)⌋ with SSW = Σ⌊(nᵢΣxᵢ² − sᵢ²)/nᵢ⌋ (all
    * operands nonnegative, so the truncations are engine-identical) —
    * then the squared studentized-range statistic is the exact
    * rational q² = 2·diff_e2²·nᵢnⱼ / (10⁴·msw·(nᵢ+nⱼ)). The
    * intensive snap is what makes the decimal(38,0) bound
    * volume-proof: means and MSW stay O(1) as rows grow, only the
    * n-terms scale (the extensive cross-multiplied form overflowed 38
    * digits at the 100× probe — caught and replaced at add time).
    * Flag q² ≥ [[TukeyQ2E3]]. Shape: one per-type moment rollup
    * (k rows), a k×k self-join on the broadcast k-row table. */
  private def tukeyHsd(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val g = Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", cents($"value").as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        sum(expr(s"cast(c as $dec) * c")).as("q"))
      .withColumn("mean_e2",
        expr(s"cast(cast(s as $dec) * 100 div n as bigint)"))
      .withColumn("ssw_g",
        expr(s"(cast(n as $dec) * q - cast(s as $dec) * s) div n"))
    val tot = g.agg(sum($"n").as("nn"), count(lit(1)).as("k"),
      sum($"ssw_g").as("ssw"))
      .withColumn("msw", expr("cast(ssw div (nn - k) as bigint)"))
    val a = g.select($"event_type".as("type_a"), $"n".as("na"),
      $"mean_e2".as("ma"))
    val b = g.select($"event_type".as("type_b"), $"n".as("nb"),
      $"mean_e2".as("mb"))
    a.join(b, $"type_a" < $"type_b")
      .crossJoin(broadcast(tot))
      .filter($"msw" > 0 && $"nn" > $"k")
      .select($"type_a", $"type_b", $"na", $"nb",
        ($"ma" - $"mb").as("mean_diff_e2"),
        expr(s"cast(2 * cast(ma - mb as $dec) * (ma - mb)" +
          s" * na * nb * 1000 div (cast(10000 as $dec) * msw" +
          s" * (na + nb)) as bigint)").as("q2_e3"))
      .withColumn("differ_5pct", $"q2_e3" >= TukeyQ2E3)
  }

  /** Cronbach's alpha internal-consistency coefficient — do the
    * event-type "items" measure one underlying daily activity trait?
    * The reliability twin of [[iccAgreement]] (Cronbach 1951):
    * α = k/(k−1) · (1 − Σᵢvᵢ / v_tot) over the balanced day×item
    * grid, where every variance is the n²-scaled integer
    * v_n = n·Σx² − (Σx)² — the common n² cancels in the ratio, so
    * one sign-split e6 division emits α exactly. Shape: the ICC
    * rollup plus one per-item moment aggregate — day-grid bounded. */
  private def cronbachAlpha(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val daily = dailyCents(s, d)
    val balanced = daily.groupBy($"day")
      .agg(count(lit(1)).as("kk"), sum($"day_cents").as("tot"))
      .filter($"kk" === IccRaters)
    val itemVar = daily.join(balanced.select($"day"), "day")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"day_cents").as("s"),
        sum(expr(s"cast(day_cents as $dec) * day_cents")).as("q"))
      .agg(sum(expr(s"cast(n as $dec) * q - cast(s as $dec) * s"))
        .as("sum_item_var"), count(lit(1)).as("k"))
    val totVar = balanced
      .agg(count(lit(1)).as("n"), sum($"tot").as("s"),
        sum(expr(s"cast(tot as $dec) * tot")).as("q"))
      .select($"n",
        expr(s"cast(n as $dec) * q - cast(s as $dec) * s").as("v_tot"))
    itemVar.crossJoin(broadcast(totVar))
      .select($"n".as("n_days"), $"k".as("k_items"),
        when($"v_tot" > 0, expr(
          "cast(sum_item_var * 1000000 div v_tot as bigint)"))
          .otherwise(lit(-1L)).as("var_ratio_e6"),
        when($"v_tot" > 0, expr(
          """cast(case when v_tot - sum_item_var >= 0
               then k * (v_tot - sum_item_var) * 1000000
                    div ((k - 1) * v_tot)
               else -(k * (sum_item_var - v_tot) * 1000000
                    div ((k - 1) * v_tot)) end as bigint)"""))
          .otherwise(lit(-2000000L)).as("alpha_e6"))
  }

  /** Rating categories for [[fleissKappa]] (terciles). */
  val FleissCats = 3L

  /** Fleiss' kappa multi-rater categorical agreement (Fleiss 1971) —
    * the CATEGORICAL multi-rater member completing the agreement
    * battery (q_eval_kappa is two-rater Cohen, [[iccAgreement]] and
    * [[cronbachAlpha]] are continuous): each event type "rates" each
    * day low/med/high by the day's RANK within that type's own daily
    * series (exact tercile via the ntile row-count rule — bit-exact,
    * no value thresholds to tie). With A = Σᵢⱼ nᵢⱼ² and the category
    * column sums cⱼ, κ reduces over common denominators to the exact
    * fraction κ = (A·D₂ − B·D₁) / (D₁·(D₂ − B)) with B = Σⱼcⱼ²,
    * D₁ = nk(k−1), D₂ = (nk)² — one sign-split e6 division. Shape:
    * day-grid windows per type, a (day, category) rollup, a 1-row
    * aggregate. */
  private def fleissKappa(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val byType = W.partitionBy($"event_type")
      .orderBy($"day_cents".asc, $"day".asc)
    val daily = dailyCents(s, d)
    val balanced = daily.groupBy($"day")
      .agg(count(lit(1)).as("kk")).filter($"kk" === IccRaters)
      .select($"day")
    val rated = daily.join(balanced, "day")
      .withColumn("rn", row_number().over(byType).cast("long"))
      .withColumn("nd", count(lit(1)).over(
        W.partitionBy($"event_type")
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .withColumn("cat", expr(s"(rn - 1) * $FleissCats div nd"))
    val cells = rated.groupBy($"day", $"cat")
      .agg(count(lit(1)).as("nij"))
    val m = cells.agg(
      sum(expr("cast(nij as decimal(38,0)) * nij")).as("a"),
      sum($"nij").as("nk"),
      countDistinct($"day").as("n"))
    val cats = cells.groupBy($"cat").agg(sum($"nij").as("cj"))
      .agg(sum(expr("cast(cj as decimal(38,0)) * cj")).as("b"))
    m.crossJoin(broadcast(cats))
      .select($"n".as("n_subjects"), lit(IccRaters).as("k_raters"),
        expr(s"""cast(case
            when cast(nk as decimal(38,0)) * nk - b <= 0 then -2000000
            when (a - n * $IccRaters) * cast(nk as decimal(38,0)) * nk
                 - b * (nk * ($IccRaters - 1)) >= 0
            then ((a - n * $IccRaters) * cast(nk as decimal(38,0)) * nk
                  - b * (nk * ($IccRaters - 1))) * 1000000
                 div ((cast(nk as decimal(38,0)) * ($IccRaters - 1))
                      * (cast(nk as decimal(38,0)) * nk - b))
            else -((b * (nk * ($IccRaters - 1))
                    - (a - n * $IccRaters)
                      * cast(nk as decimal(38,0)) * nk) * 1000000
                 div ((cast(nk as decimal(38,0)) * ($IccRaters - 1))
                      * (cast(nk as decimal(38,0)) * nk - b)))
          end as bigint)""").as("kappa_e6"))
  }

  /** Max lag of [[ljungBox]]; χ²₇ 5 % critical = 14.067 → e3. */
  val LbLags = 7
  val LbCritE3 = 14067L

  /** Ljung–Box portmanteau whiteness test per metric series (Ljung &
    * Box 1978) — the TEST over the autocorrelations q_autocorr only
    * reports: Q = n(n+2)·Σ_{k≤h} ρ̂ₖ²/(n−k) against χ²_h. Exactness:
    * centering clears through z_t = n·x_t − S (exact integers), each
    * ρ̂ₖ = Σ z_t z_{t+k} / Σ z_t² snaps once to the e4 grid
    * (sign-split), and Q accumulates the per-lag ⌊ρ²_e8/(n−k)⌋ floors
    * — every step a truncating division of nonneg/sign-split integers
    * in decimal(38,0), identical on both engines (the documented e4/e8
    * grid is the statistic's contract). Shape: day-grid windows with
    * [[LbLags]] lead columns, one |types|-row rollup. */
  private def ljungBox(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ord = W.partitionBy($"event_type").orderBy($"day".asc)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val dec = "decimal(38,0)"
    val base = dailyCents(s, d)
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("s", sum($"day_cents").over(whole))
      .withColumn("z", expr(s"cast(n as $dec) * day_cents - s"))
    val withLeads = (1 to LbLags).foldLeft(base) { (df, k) =>
      df.withColumn(s"z$k", lead($"z", k).over(ord))
    }
    val aggCols = Seq(sum(expr(s"z * z")).as("den")) ++
      (1 to LbLags).map(k => sum(expr(s"z * z$k")).as(s"num$k"))
    val agg = withLeads.groupBy($"event_type")
      .agg(max($"n").as("n"), aggCols: _*)
      .filter($"den" > 0 && $"n" > LbLags)
    val rhoTerms = (1 to LbLags).map { k =>
      s"""(case when num$k >= 0 then num$k * 10000 div den
               else -((-num$k) * 10000 div den) end)"""
    }
    val qSum = (1 to LbLags).map { k =>
      val r = s"rho${k}_e4"
      s"(cast($r as $dec) * $r div (n - $k))"
    }.mkString(" + ")
    val withRho = (1 to LbLags).foldLeft(agg) { (df, k) =>
      df.withColumn(s"rho${k}_e4",
        expr(s"cast(${rhoTerms(k - 1)} as bigint)"))
    }
    withRho
      .withColumn("q_e3", expr(
        s"cast(cast(n as $dec) * (n + 2) * ($qSum) * 1000" +
          s" div 100000000 as bigint)"))
      .select(($"event_type" +: $"n".as("n_days") +:
        (1 to LbLags).map(k => col(s"rho${k}_e4")) :+
        $"q_e3" :+ ($"q_e3" >= LbCritE3).as("nonwhite_5pct")): _*)
  }

  /** Hodges–Lehmann robust location estimator per metric series
    * (Hodges & Lehmann 1963) — the point estimate that goes with
    * q_median_ci's distribution-free interval and q_theil_sen's
    * robust slope: the median of all Walsh averages (xᵢ+xⱼ)/2 over
    * i ≤ j, ~29 % more efficient than the plain median under
    * normality while keeping a 29 % breakdown point. Exactness:
    * Walsh SUMS xᵢ+xⱼ stay integer (the estimator is emitted in
    * HALF-cents — no /2 anywhere), the median is the exact type-1
    * order statistic at rank ⌈m/2⌉ picked by a cumulative count over
    * the sorted sums — no interpolation. Shape: day-grid triangular
    * self-join per type (C(|days|,2)+|days| pairs — calendar-bounded
    * at any volume), one rank window, a |types|-row rollup. */
  private def hodgesLehmann(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val daily = dailyCents(s, d)
      .select($"event_type",
        datediff($"day", lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        $"day_cents".as("x"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        $"a.event_type" === $"b.event_type" &&
          $"a.dayn" <= $"b.dayn")
      .select($"a.event_type".as("event_type"),
        ($"a.x" + $"b.x").as("w"))
    val ranked = pairs
      .withColumn("rn", row_number().over(
        W.partitionBy($"event_type").orderBy($"w".asc)))
      .withColumn("m", count(lit(1)).over(
        W.partitionBy($"event_type")
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    ranked.filter($"rn" === expr("(m + 1) div 2"))
      .select($"event_type", $"m".as("n_walsh"),
        $"w".as("hl_half_cents"))
  }

  /** TOST margin: ±[[TostMarginPct]] % of the pooled mean. */
  val TostMarginPct = 5L

  /** Two one-sided tests (TOST) for mean EQUIVALENCE (Schuirmann
    * 1987) — the inferential inverse of q_welch_ttest: failing to
    * find a difference is not evidence of equivalence; TOST declares
    * two arms equivalent only when BOTH one-sided z-tests reject at
    * the ±δ margin (δ = [[TostMarginPct]] % of the pooled mean).
    * Intensive grid throughout (the Tukey lesson): per-arm means
    * snap e2, sample variances e0, se²·10⁴ from two truncating
    * divisions — all O(1) in volume — and both rejections are the
    * FULLY cross-multiplied integer comparisons
    * (Δ_e2 ± δ_e2)²·10⁶ > 2706025·se²_e4 (z²₀.₀₅ = 1.645² as the
    * exact rational 2706025/10⁶) with the sign guards one-sided
    * tests need. Shape: one 2-row conditional aggregate. */
  private def tostEquivalence(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val (ta, tb) = BaPair
    Tables.events(s, d)
      .filter($"value".isNotNull &&
        ($"event_type" === ta || $"event_type" === tb))
      .select(($"event_type" === ta).as("isa"),
        cents($"value").as("c"))
      .agg(sum(when($"isa", 1L).otherwise(0L)).as("n1"),
        sum(when(!$"isa", 1L).otherwise(0L)).as("n2"),
        sum(when($"isa", $"c").otherwise(0L)).as("s1"),
        sum(when(!$"isa", $"c").otherwise(0L)).as("s2"),
        sum(when($"isa", expr(s"cast(c as $dec) * c"))
          .otherwise(lit(0))).as("q1"),
        sum(when(!$"isa", expr(s"cast(c as $dec) * c"))
          .otherwise(lit(0))).as("q2"))
      .filter($"n1" > 1 && $"n2" > 1)
      .select($"n1", $"n2",
        expr(s"cast(cast(s1 as $dec) * 100 div n1" +
          s" - cast(s2 as $dec) * 100 div n2 as bigint)").as("diff_e2"),
        expr(s"cast($TostMarginPct * (cast(s1 as $dec) + s2)" +
          s" div (n1 + n2) as bigint)").as("delta_e2"),
        expr(s"""cast(
            ((cast(n1 as $dec) * q1 - cast(s1 as $dec) * s1)
              div (cast(n1 as $dec) * (n1 - 1))) * 10000 div n1
          + ((cast(n2 as $dec) * q2 - cast(s2 as $dec) * s2)
              div (cast(n2 as $dec) * (n2 - 1))) * 10000 div n2
          as bigint)""").as("se2_e4"))
      .withColumn("lower_reject", // (Δ+δ) > 0 and (Δ+δ)² > z²·se²
        $"diff_e2" + $"delta_e2" > 0 &&
          expr("cast(diff_e2 + delta_e2 as decimal(38,0))" +
            " * (diff_e2 + delta_e2) * 1000000") >
          expr("cast(2706025 as decimal(38,0)) * se2_e4"))
      .withColumn("upper_reject", // (δ−Δ) > 0 and (δ−Δ)² > z²·se²
        $"delta_e2" - $"diff_e2" > 0 &&
          expr("cast(delta_e2 - diff_e2 as decimal(38,0))" +
            " * (delta_e2 - diff_e2) * 1000000") >
          expr("cast(2706025 as decimal(38,0)) * se2_e4"))
      .withColumn("equivalent_5pct", $"lower_reject" && $"upper_reject")
  }

  /** Shared oracle CTE: daily cents per event type. */
  private val DailySql: String =
    """daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS day_cents
                 FROM events WHERE value IS NOT NULL
                 GROUP BY 1, 2)"""

  val queries: Seq[Q] = Seq(
    Q("q_icc_agreement", iccAgreement, Some(s"""
      WITH $DailySql,
      subj AS (SELECT day, count(*) AS kk,
                      CAST(sum(day_cents) AS HUGEINT) AS si,
                      sum(CAST(day_cents AS HUGEINT) * day_cents) AS qi
               FROM daily GROUP BY 1 HAVING count(*) = $IccRaters),
      m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(si) AS s,
                   sum(si * si) AS a, sum(qi) AS t
            FROM subj),
      f AS (SELECT n,
              (n * a - s * s) * ($IccRaters - 1)
                - ($IccRaters * t - a) * (n - 1) AS num,
              ($IccRaters - 1) * ((n * a - s * s)
                + ($IccRaters * t - a) * (n - 1)) AS den
            FROM m)
      SELECT CAST(n AS BIGINT) AS n_days,
             CAST($IccRaters AS BIGINT) AS k_types,
             CAST(CASE WHEN den > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS icc_defined,
             CAST(CASE WHEN den <= 0 THEN -2000000
                       WHEN num >= 0 THEN num * 1000000 // den
                       ELSE -((-num) * 1000000 // den) END AS BIGINT)
               AS icc_e6
      FROM f""")),

    Q("q_bland_altman", blandAltman, Some(s"""
      WITH $DailySql,
      p AS (SELECT a.day, a.day_cents // 100 - b.day_cents // 100 AS dd
            FROM daily a JOIN daily b USING (day)
            WHERE a.event_type = '${BaPair._1}'
              AND b.event_type = '${BaPair._2}'),
      m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(dd) AS HUGEINT) AS sd1,
                   sum(CAST(dd AS HUGEINT) * dd) AS sdd
            FROM p),
      v AS (SELECT n, sd1, n * sdd - sd1 * sd1 AS vv FROM m),
      o AS (SELECT CAST(count(*) AS BIGINT) AS n_outside
            FROM p, v
            WHERE (v.n * dd - sd1) * (v.n * dd - sd1) * 10000 * (v.n - 1)
                  > 38416 * vv * v.n)
      SELECT CAST(n AS BIGINT) AS n_days, CAST(sd1 AS BIGINT) AS sum_d,
             CAST(CASE WHEN sd1 >= 0 THEN sd1 * 100 // n
                       ELSE -((-sd1) * 100 // n) END AS BIGINT)
               AS mean_d_e2,
             CAST(CASE WHEN n > 1 THEN 38416 * vv // (n * (n - 1))
                       ELSE -1 END AS BIGINT) AS halfwidth2_e4,
             n_outside
      FROM v, o""")),

    Q("q_mantel_haenszel", mantelHaenszel, Some("""
      WITH cells AS (SELECT dayofweek(ts) AS dow,
                            user_id % 2 = 1 AS exposed,
                            event_type = 'purchase' AS success
                     FROM events),
      s AS (SELECT dow,
              CAST(sum(CASE WHEN exposed AND success THEN 1 ELSE 0 END)
                AS HUGEINT) AS a,
              CAST(sum(CASE WHEN exposed AND NOT success THEN 1 ELSE 0
                END) AS HUGEINT) AS b,
              CAST(sum(CASE WHEN NOT exposed AND success THEN 1 ELSE 0
                END) AS HUGEINT) AS c,
              CAST(sum(CASE WHEN NOT exposed AND NOT success THEN 1
                ELSE 0 END) AS HUGEINT) AS dd
            FROM cells GROUP BY 1),
      t AS (SELECT a, a + b + c + dd AS n, b, c, dd FROM s
            WHERE a + b + c + dd > 1),
      u AS (SELECT a, n,
              a * dd * 1000000 // n AS r,
              b * c * 1000000 // n AS s2,
              (a + b) * (a + c) * 1000000 // n AS e,
              (a + b) * (c + dd) * (a + c) * (b + dd) * 1000000000000
                // (n * n * (n - 1)) AS v
            FROM t),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
                   CAST(sum(a) AS BIGINT) AS sum_a,
                   sum(r) AS sum_r, sum(s2) AS sum_s,
                   sum(e) AS sum_e, sum(v) AS sum_v
            FROM u)
      SELECT n_strata, sum_a,
             CAST(sum_r AS BIGINT) AS sum_r,
             CAST(sum_s AS BIGINT) AS sum_s,
             CAST(CASE WHEN sum_s > 0 THEN sum_r * 1000000 // sum_s
                       ELSE -1 END AS BIGINT) AS or_e6,
             CAST(CASE WHEN sum_v > 0 THEN
                    (CAST(sum_a AS HUGEINT) * 1000000 - sum_e)
                    * (CAST(sum_a AS HUGEINT) * 1000000 - sum_e)
                    * 10000 // (sum_v * 1000000)
                  ELSE -1 END AS BIGINT) AS chi2_e4,
             CASE WHEN sum_v > 0 THEN
               (CAST(sum_a AS HUGEINT) * 1000000 - sum_e)
               * (CAST(sum_a AS HUGEINT) * 1000000 - sum_e)
               * 10000 // (sum_v * 1000000)
             ELSE -1 END >= 38415 AS assoc_5pct
      FROM g""")),

    Q("q_turning_points", turningPoints, Some(s"""
      WITH $DailySql,
      w AS (SELECT event_type, day, day_cents AS x,
                   lag(day_cents) OVER win AS p,
                   lead(day_cents) OVER win AS q
            FROM daily
            WINDOW win AS (PARTITION BY event_type ORDER BY day ASC)),
      t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CASE WHEN p IS NOT NULL AND q IS NOT NULL
                     AND ((x > p AND x > q) OR (x < p AND x < q))
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
            FROM w GROUP BY 1),
      z AS (SELECT event_type, n_days, n_turning,
                   3 * n_turning - 2 * n_days + 4 AS m,
                   CAST(CAST(3 * n_turning - 2 * n_days + 4 AS HUGEINT)
                     * (3 * n_turning - 2 * n_days + 4) * 100000
                     // (16 * n_days - 29) AS BIGINT) AS mag
            FROM t WHERE n_days >= 3)
      SELECT event_type, n_days, n_turning,
             CAST(CASE WHEN m >= 0 THEN mag ELSE -mag END AS BIGINT)
               AS z2_e4,
             mag >= 38416 AS nonrandom_5pct
      FROM z""")),

    Q("q_cross_corr_lags", crossCorrLags, Some(s"""
      WITH $DailySql,
      a AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS dayn,
                   day_cents // 100 AS x
            FROM daily WHERE event_type = '${CcfPair._1}'),
      b AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS dayn,
                   day_cents // 100 AS y
            FROM daily WHERE event_type = '${CcfPair._2}'),
      lags(lag_days) AS (VALUES ${CcfLags.map(l => s"(CAST($l AS BIGINT))").mkString(", ")}),
      p AS (SELECT l.lag_days, a.x, b.y
            FROM a CROSS JOIN lags l
            JOIN b ON b.dayn = a.dayn + l.lag_days),
      m AS (SELECT lag_days, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(x AS HUGEINT)) AS sx,
                   sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM p GROUP BY 1),
      c AS (SELECT lag_days, n,
                   CAST(n AS HUGEINT) * sxy - sx * sy AS num,
                   CAST(n AS HUGEINT) * sxx - sx * sx AS vx,
                   CAST(n AS HUGEINT) * syy - sy * sy AS vy
            FROM m),
      k AS (SELECT lag_days, n, num, vx, vy,
                   vx * vy AS pp,
                   CASE WHEN vx > 0 AND vy > 0 THEN
                     CAST(floor(CAST(num AS DOUBLE) * 1000.0 /
                       sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)))
                       AS BIGINT)
                   ELSE 0 END AS kd
            FROM c)
      SELECT lag_days, n AS n_days,
             CAST(CASE WHEN abs(num) <= 9223372036854775807
                  THEN num END AS BIGINT) AS num,
             CAST(CASE WHEN abs(vx) <= 9223372036854775807
                  THEN vx END AS BIGINT) AS vx,
             CAST(CASE WHEN abs(vy) <= 9223372036854775807
                  THEN vy END AS BIGINT) AS vy,
             CAST(CASE WHEN vx <= 0 OR vy <= 0 THEN -2000
               WHEN (CASE WHEN num >= 0 AND kd + 1 <= 0 THEN TRUE
                          WHEN num < 0 AND kd + 1 >= 0 THEN FALSE
                          WHEN num >= 0 THEN
                            CAST(kd + 1 AS HUGEINT) * (kd + 1) * pp
                              <= CAST(num AS HUGEINT) * num * 1000000
                          ELSE CAST(kd + 1 AS HUGEINT) * (kd + 1) * pp
                              >= CAST(num AS HUGEINT) * num * 1000000
                     END) THEN kd + 1
               WHEN (CASE WHEN num >= 0 AND kd <= 0 THEN TRUE
                          WHEN num < 0 AND kd >= 0 THEN FALSE
                          WHEN num >= 0 THEN
                            CAST(kd AS HUGEINT) * kd * pp
                              <= CAST(num AS HUGEINT) * num * 1000000
                          ELSE CAST(kd AS HUGEINT) * kd * pp
                              >= CAST(num AS HUGEINT) * num * 1000000
                     END) THEN kd
               ELSE kd - 1 END AS BIGINT) AS ccf_e3
      FROM k""")),

    Q("q_qini_curve", qiniCurve, Some("""
      WITH u AS (SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS score,
              CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS responder,
              CAST(user_id % 2 AS BIGINT) AS treated
            FROM events GROUP BY user_id),
      d AS (SELECT CAST(ntile(10) OVER (ORDER BY score DESC,
              user_id ASC) AS BIGINT) AS decile, * FROM u),
      g AS (SELECT decile,
              CAST(sum(treated) AS BIGINT) AS nt,
              CAST(count(*) - sum(treated) AS BIGINT) AS nc,
              CAST(sum(CASE WHEN treated = 1 THEN responder ELSE 0 END)
                AS BIGINT) AS yt,
              CAST(sum(CASE WHEN treated = 0 THEN responder ELSE 0 END)
                AS BIGINT) AS yc
            FROM d GROUP BY 1),
      c AS (SELECT decile,
              CAST(sum(nt) OVER w AS BIGINT) AS cum_nt,
              CAST(sum(nc) OVER w AS BIGINT) AS cum_nc,
              CAST(sum(yt) OVER w AS BIGINT) AS cum_yt,
              CAST(sum(yc) OVER w AS BIGINT) AS cum_yc
            FROM g
            WINDOW w AS (ORDER BY decile ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW))
      SELECT decile, cum_nt, cum_nc, cum_yt, cum_yc,
             CAST(CASE WHEN cum_nc > 0 THEN cum_yt * 100
                    - CAST(cum_yc AS HUGEINT) * cum_nt * 100 // cum_nc
                  ELSE -1 END AS BIGINT) AS qini_e2
      FROM c""")),

    Q("q_tost_equivalence", tostEquivalence, Some(s"""
      WITH e AS (SELECT event_type = '${BaPair._1}' AS isa,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS c
                 FROM events
                 WHERE value IS NOT NULL
                   AND event_type IN ('${BaPair._1}', '${BaPair._2}')),
      m AS (SELECT
              CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS HUGEINT)
                AS n1,
              CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS HUGEINT)
                AS n2,
              CAST(sum(CASE WHEN isa THEN c ELSE 0 END) AS HUGEINT)
                AS s1,
              CAST(sum(CASE WHEN NOT isa THEN c ELSE 0 END) AS HUGEINT)
                AS s2,
              sum(CASE WHEN isa THEN CAST(c AS HUGEINT) * c ELSE 0 END)
                AS q1,
              sum(CASE WHEN NOT isa THEN CAST(c AS HUGEINT) * c
                  ELSE 0 END) AS q2
            FROM e),
      g AS (SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   CAST(s1 * 100 // n1 - s2 * 100 // n2 AS BIGINT)
                     AS diff_e2,
                   CAST($TostMarginPct * (s1 + s2) // (n1 + n2)
                     AS BIGINT) AS delta_e2,
                   CAST(((n1 * q1 - s1 * s1) // (n1 * (n1 - 1)))
                          * 10000 // n1
                      + ((n2 * q2 - s2 * s2) // (n2 * (n2 - 1)))
                          * 10000 // n2 AS BIGINT) AS se2_e4
            FROM m WHERE n1 > 1 AND n2 > 1)
      SELECT n1, n2, diff_e2, delta_e2, se2_e4,
             diff_e2 + delta_e2 > 0
               AND CAST(diff_e2 + delta_e2 AS HUGEINT)
                   * (diff_e2 + delta_e2) * 1000000
                   > CAST(2706025 AS HUGEINT) * se2_e4
               AS lower_reject,
             delta_e2 - diff_e2 > 0
               AND CAST(delta_e2 - diff_e2 AS HUGEINT)
                   * (delta_e2 - diff_e2) * 1000000
                   > CAST(2706025 AS HUGEINT) * se2_e4
               AS upper_reject,
             (diff_e2 + delta_e2 > 0
               AND CAST(diff_e2 + delta_e2 AS HUGEINT)
                   * (diff_e2 + delta_e2) * 1000000
                   > CAST(2706025 AS HUGEINT) * se2_e4)
             AND (delta_e2 - diff_e2 > 0
               AND CAST(delta_e2 - diff_e2 AS HUGEINT)
                   * (delta_e2 - diff_e2) * 1000000
                   > CAST(2706025 AS HUGEINT) * se2_e4)
               AS equivalent_5pct
      FROM g""")),

    Q("q_hodges_lehmann", hodgesLehmann, Some(s"""
      WITH $DailySql,
      dd AS (SELECT event_type,
                    CAST(day - DATE '1970-01-01' AS BIGINT) AS dayn,
                    day_cents AS x
             FROM daily),
      pairs AS (SELECT a.event_type, a.x + b.x AS w
                FROM dd a JOIN dd b
                  ON a.event_type = b.event_type
                 AND a.dayn <= b.dayn),
      r AS (SELECT event_type, w,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY w ASC) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS m
            FROM pairs)
      SELECT event_type, CAST(m AS BIGINT) AS n_walsh,
             CAST(w AS BIGINT) AS hl_half_cents
      FROM r WHERE rn = (m + 1) // 2""")),

    Q("q_fleiss_kappa", fleissKappa, Some(s"""
      WITH $DailySql,
      bal AS (SELECT day FROM daily
              GROUP BY 1 HAVING count(*) = $IccRaters),
      rated AS (SELECT d.event_type, d.day,
                       row_number() OVER (PARTITION BY d.event_type
                         ORDER BY d.day_cents ASC, d.day ASC) AS rn,
                       count(*) OVER (PARTITION BY d.event_type)
                         AS nd
                FROM daily d JOIN bal USING (day)),
      cells AS (SELECT day, (rn - 1) * $FleissCats // nd AS cat,
                       CAST(count(*) AS HUGEINT) AS nij
                FROM rated GROUP BY 1, 2),
      m AS (SELECT sum(nij * nij) AS a,
                   CAST(sum(nij) AS HUGEINT) AS nk,
                   CAST(count(DISTINCT day) AS HUGEINT) AS n
            FROM cells),
      c AS (SELECT sum(cj * cj) AS b
            FROM (SELECT cat, CAST(sum(nij) AS HUGEINT) AS cj
                  FROM cells GROUP BY 1))
      SELECT CAST(n AS BIGINT) AS n_subjects,
             CAST($IccRaters AS BIGINT) AS k_raters,
             CAST(CASE WHEN nk * nk - b <= 0 THEN -2000000
               WHEN (a - n * $IccRaters) * nk * nk
                    - b * (nk * ($IccRaters - 1)) >= 0
               THEN ((a - n * $IccRaters) * nk * nk
                     - b * (nk * ($IccRaters - 1))) * 1000000
                    // ((nk * ($IccRaters - 1)) * (nk * nk - b))
               ELSE -((b * (nk * ($IccRaters - 1))
                       - (a - n * $IccRaters) * nk * nk) * 1000000
                    // ((nk * ($IccRaters - 1)) * (nk * nk - b)))
               END AS BIGINT) AS kappa_e6
      FROM m, c""")),

    Q("q_ljung_box", ljungBox, Some {
      val leads = (1 to LbLags)
        .map(k => s"lead(z, $k) OVER win AS z$k").mkString(",\n             ")
      val nums = (1 to LbLags)
        .map(k => s"sum(z * z$k) AS num$k").mkString(",\n             ")
      val rhos = (1 to LbLags).map(k =>
        s"""CASE WHEN num$k >= 0 THEN num$k * 10000 // den
               ELSE -((-num$k) * 10000 // den) END AS rho${k}_e4""")
        .mkString(",\n             ")
      val qsum = (1 to LbLags)
        .map(k => s"(CAST(rho${k}_e4 AS HUGEINT) * rho${k}_e4 // (n - $k))")
        .mkString(" + ")
      val rhoCols = (1 to LbLags)
        .map(k => s"CAST(rho${k}_e4 AS BIGINT) AS rho${k}_e4")
        .mkString(",\n             ")
      s"""
      WITH $DailySql,
      w AS (SELECT event_type, day, day_cents,
                   CAST(count(*) OVER wt AS HUGEINT) AS n,
                   sum(day_cents) OVER wt AS s
            FROM daily WINDOW wt AS (PARTITION BY event_type)),
      z AS (SELECT event_type, day, n,
                   n * day_cents - s AS z
            FROM w),
      l AS (SELECT event_type, day, n, z,
             $leads
            FROM z
            WINDOW win AS (PARTITION BY event_type ORDER BY day ASC)),
      g AS (SELECT event_type, max(n) AS n,
                   sum(z * z) AS den,
             $nums
            FROM l GROUP BY 1
            HAVING sum(z * z) > 0 AND max(n) > $LbLags),
      r AS (SELECT event_type, n, den,
             $rhos
            FROM g)
      SELECT event_type, CAST(n AS BIGINT) AS n_days,
             $rhoCols,
             CAST(n * (n + 2) * ($qsum) * 1000 // 100000000 AS BIGINT)
               AS q_e3,
             n * (n + 2) * ($qsum) * 1000 // 100000000 >= $LbCritE3
               AS nonwhite_5pct
      FROM r"""
    }),

    Q("q_tukey_hsd", tukeyHsd, Some(s"""
      WITH g AS (SELECT event_type,
                        CAST(count(*) AS HUGEINT) AS n,
                        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS HUGEINT) AS s,
                        sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS HUGEINT)
                          * CAST(CAST(value AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS q
                 FROM events WHERE value IS NOT NULL GROUP BY 1),
      g2 AS (SELECT *, s * 100 // n AS mean_e2,
                    (n * q - s * s) // n AS ssw_g
             FROM g),
      tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                     CAST(count(*) AS HUGEINT) AS k,
                     sum(ssw_g) AS ssw
              FROM g2),
      tm AS (SELECT nn, k, ssw // (nn - k) AS msw FROM tot)
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
             CAST(a.mean_e2 - b.mean_e2 AS BIGINT) AS mean_diff_e2,
             CAST(2 * (a.mean_e2 - b.mean_e2) * (a.mean_e2 - b.mean_e2)
               * a.n * b.n * 1000
               // (10000 * t.msw * (a.n + b.n)) AS BIGINT) AS q2_e3,
             2 * (a.mean_e2 - b.mean_e2) * (a.mean_e2 - b.mean_e2)
               * a.n * b.n * 1000
               // (10000 * t.msw * (a.n + b.n)) >= $TukeyQ2E3
               AS differ_5pct
      FROM g2 a JOIN g2 b ON a.event_type < b.event_type, tm t
      WHERE t.msw > 0 AND t.nn > t.k""")),

    Q("q_cronbach_alpha", cronbachAlpha, Some(s"""
      WITH $DailySql,
      bal AS (SELECT day, CAST(sum(day_cents) AS HUGEINT) AS tot
              FROM daily GROUP BY 1 HAVING count(*) = $IccRaters),
      iv AS (SELECT CAST(sum(nv) AS HUGEINT) AS sum_item_var,
                    CAST(count(*) AS HUGEINT) AS k
             FROM (SELECT d.event_type,
                          CAST(count(*) AS HUGEINT)
                            * sum(CAST(d.day_cents AS HUGEINT)
                                  * d.day_cents)
                          - CAST(sum(d.day_cents) AS HUGEINT)
                            * sum(d.day_cents) AS nv
                   FROM daily d JOIN bal USING (day)
                   GROUP BY 1)),
      tv AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(count(*) AS HUGEINT) * sum(tot * tot)
                      - sum(tot) * sum(tot) AS v_tot
             FROM bal)
      SELECT tv.n AS n_days, CAST(iv.k AS BIGINT) AS k_items,
             CAST(CASE WHEN v_tot > 0
                    THEN sum_item_var * 1000000 // v_tot
                    ELSE -1 END AS BIGINT) AS var_ratio_e6,
             CAST(CASE WHEN v_tot <= 0 THEN -2000000
                       WHEN v_tot - sum_item_var >= 0
                       THEN k * (v_tot - sum_item_var) * 1000000
                            // ((k - 1) * v_tot)
                       ELSE -(k * (sum_item_var - v_tot) * 1000000
                            // ((k - 1) * v_tot)) END AS BIGINT)
               AS alpha_e6
      FROM iv, tv"""))
  )
}
