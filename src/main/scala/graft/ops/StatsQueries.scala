package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-statistics operators: IQR outlier screening,
  * correlation from exact decimal moments, and time-decayed
  * (recency-weighted) aggregation.
  *
  * Reference analog: the dashboard's distribution panels (review-count
  * histograms, rating spreads — README.md:16-20) imply exactly these
  * screens; for a training-data pipeline they are the numeric-feature
  * quality gates (outlier filtering before feature scaling, drift
  * checks via correlation, recency weighting for data mixing).
  *
  * All three share the same 100 TB shape as q_feature_scale: the
  * per-group statistics collapse to a handful of rows, join back as a
  * BROADCAST, and the big fact side stays embarrassingly parallel —
  * never a global window.
  *
  * Float discipline (the q_feature_scale lesson, ADVICE r4): every
  * cross-row SUM of doubles is order-dependent, so any sum feeding a
  * compared value is accumulated in exact decimal — either by snapping
  * the input to its decimal grid first, or by rounding a per-row
  * double term to a fixed scale before the decimal cast. Double math
  * that happens strictly per-row (or after aggregation, on identical
  * inputs) is bit-identical across engines and safe — EXCEPT
  * `round(double, n)` itself (rule 4): rounding a derived double
  * quotient at a fine grid diverges even on bit-identical inputs
  * (Spark rounds the exact binary expansion HALF_UP; DuckDB rounds a
  * scaled double), so emitted fine-grid values go through
  * floor(q · 10^n) into BIGINT fixed-point units — floor of a
  * bit-identical double is exact in every engine (the q_pagerank /
  * q_robust_scale / q_feature_scale pattern).
  *
  * Corollary (the r6 lesson, VERDICT r6): NEVER integerize an input
  * via round(double, n) — snap on the decimal grid instead:
  * `cast(x as decimal(18,2)) * 100 → long` here,
  * `CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)` in the oracle.
  * And once a rounded ln/log exists, pin it to BIGINT units through
  * DECIMAL(18,6) and keep EVERY subsequent multiply/divide in
  * decimal/BIGINT space — feeding the rounded double back into a
  * multiply-then-floor chain reintroduces the boundary divergence the
  * round was supposed to kill.
  */
object StatsQueries {

  /** IQR outlier screen over `events.value` per event type: Tukey
    * fences at q1/q3 ± 1.5·IQR, with exact linearly-interpolated
    * percentiles (both engines define quantile as pos = p·(n-1) with
    * linear interpolation — identical double arithmetic on identical
    * inputs). Two aggregates over the fact table: one to build the
    * per-type fences (tiny result, broadcast back), one to count
    * violations — no sort of the fact side ever leaves a partition
    * (percentile aggregates spill per-group; at 100 TB swap in
    * approx_percentile with a documented error budget). */
  private def outlierIqr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fences = Tables.events(s, d).groupBy($"event_type").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3"))
      .select($"event_type", $"q1", $"q3",
        ($"q1" - ($"q3" - $"q1") * 1.5).as("lo"),
        ($"q3" + ($"q3" - $"q1") * 1.5).as("hi"))
    Tables.events(s, d).join(broadcast(fences), "event_type")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"value" < $"lo" || $"value" > $"hi", 1L).otherwise(0L))
          .as("n_outliers"),
        round(max($"q1"), 2).as("q1"),
        round(max($"q3"), 2).as("q3"),
        round(max($"hi"), 2).as("hi_fence"))
      .withColumn("outlier_pct",
        round($"n_outliers".cast("double") / $"n", 6))
  }

  /** Pairwise Pearson correlations among lineitem's numeric columns
    * from EXACT decimal moments: each input is snapped to its decimal
    * grid (quantity/price/discount are 2-decimal values), products and
    * sums stay in decimal arithmetic (order-independent, exact), and
    * only the final covariance/correlation formula runs in double —
    * on sums that are bit-identical in both engines (decimal→double
    * is correctly rounded from the exact value in both; it is the
    * double→decimal direction that diverges, per ADVICE r4). One
    * map-side-combinable aggregate, one row out. */
  private def corrMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q = $"l_quantity".cast("decimal(12,2)")
    val p = $"l_extendedprice".cast("decimal(18,2)")
    val dc = $"l_discount".cast("decimal(4,2)")
    val m = Tables.lineitem(s, d).agg(
      count(lit(1)).cast("double").as("n"),
      sum(q).cast("double").as("sq"),
      sum(p).cast("double").as("sp"),
      sum(dc).cast("double").as("sd"),
      sum(q * q).cast("double").as("sqq"),
      sum(p * p).cast("double").as("spp"),
      sum(dc * dc).cast("double").as("sdd"),
      sum(q * p).cast("double").as("sqp"),
      sum(q * dc).cast("double").as("sqd"),
      sum(p * dc).cast("double").as("spd"))
    def corr(sxy: org.apache.spark.sql.Column,
        sx: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
        sxx: org.apache.spark.sql.Column, syy: org.apache.spark.sql.Column) = {
      val cov = sxy / $"n" - (sx / $"n") * (sy / $"n")
      val vx = sxx / $"n" - (sx / $"n") * (sx / $"n")
      val vy = syy / $"n" - (sy / $"n") * (sy / $"n")
      round(cov / (sqrt(vx) * sqrt(vy)), 6)
    }
    m.select(
      $"n".cast("long").as("n"),
      corr($"sqp", $"sq", $"sp", $"sqq", $"spp").as("corr_qty_price"),
      corr($"sqd", $"sq", $"sd", $"sqq", $"sdd").as("corr_qty_disc"),
      corr($"spd", $"sp", $"sd", $"spp", $"sdd").as("corr_price_disc"))
  }

  /** Recency-weighted aggregation: each event contributes
    * value · 1/(1+age_days) relative to the corpus's latest day — the
    * data-mixing primitive that up-weights fresh data. The decay is a
    * RATIONAL weight, not exp(): 1/(1+d) is a single correctly-rounded
    * IEEE divide, identical in every engine, where libm exp() differs
    * by ulps across implementations. Per-row terms are rounded to the
    * 1e-6 grid and summed in decimal (order-independent); the
    * reference date is one tiny aggregate broadcast back. */
  private def timeDecay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ref = Tables.events(s, d).agg(max(to_date($"ts")).as("ref_day"))
    val term = round($"value" / (lit(1.0) + datediff($"ref_day", to_date($"ts"))), 6)
      .cast("decimal(18,6)")
    Tables.events(s, d).crossJoin(broadcast(ref))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"value".cast("decimal(18,2)")).cast("double"), 2)
          .as("raw_total"),
        round(sum(term).cast("double"), 4).as("decayed_total"))
  }

  /** Robust (median/MAD) standardization — the outlier-insensitive
    * sibling of q_feature_scale's z-score: med and MAD come from two
    * exact-percentile passes (each a 1-row aggregate broadcast back),
    * the scaled value is pure per-row double math on inputs both
    * engines compute identically. 1.4826·MAD makes the scale
    * consistent with σ under normality; |rz| > 3.5 is the standard
    * robust outlier flag (computed from the UNROUNDED quotient).
    * At 100 TB the exact percentiles swap for approx_percentile with
    * an error budget; the plan shape (scan → tiny agg → broadcast →
    * scan) is unchanged.
    *
    * The emitted value is fixed-point (1e-4 units via floor), not
    * `round(quotient, 4)`: per float rule 4, round() of a derived
    * double quotient at a fine grid diverges between engines even
    * when the quotient itself is bit-identical — floor into BIGINT
    * units is exact everywhere (this query hash-failed r5 on exactly
    * that rule). */
  private def robustScale(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val med = Tables.orders(s, d)
      .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    val mad = Tables.orders(s, d).crossJoin(broadcast(med))
      .agg(expr("percentile(abs(o_totalprice - med), 0.5)").as("mad"),
        max($"med").as("med"))
    val rz = ($"o_totalprice" - $"med") / (lit(1.4826) * $"mad")
    Tables.orders(s, d).crossJoin(broadcast(mad))
      .select($"o_orderkey",
        floor(rz * 10000).as("robust_z_e4"),
        (abs(rz) > 3.5).as("is_outlier"))
      .withColumn("robust_z", $"robust_z_e4".cast("double") / 10000.0)
  }

  /** Logistic regression by two unrolled IRLS (Newton) steps —
    * P(purchase | spend), the GLM companion to [[groupOls]] and the
    * second FIT-IN-ENGINE model beside q_naive_bayes: β starts at
    * (0,0), so step 1's working weights are the constant 1/4 and its
    * sums are EXACT (counts, Σx, Σx² on the spend grid scaled to
    * x = cents/1e4 to keep e9 fixed-point in int64); step 2
    * recomputes μᵢ = σ(β₀+β₁xᵢ) per row and accumulates the five
    * Newton sums (Σw, Σwx, Σwx², Σ(y−μ), Σ(y−μ)x) as floor-then-sum
    * e9 BIGINTs — order-independent across partitions, the corpus'
    * accumulation discipline — then solves the 2×2 system per-row in
    * double. exp() is libm: a 1-ulp divergence flips one e9-floored
    * term with p ≈ 1e-7/row; a single flipped unit moves β by ~1e-13
    * relative, invisible at the e6 emit. The held-out mean log-loss
    * (odd event_ids; the model trains on even) rides the same pass.
    * Shape: two map-side-combinable aggregates over the scan, scalar
    * tails — one broadcast of a 1-row β table between them. */
  private def logisticIrls(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, d)
      .select((($"event_type" === "purchase").cast("long")).as("y"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_train"))
      .filter($"cents".isNotNull)
      .withColumn("x", $"cents".cast("double") / lit(10000.0))
    val train = rows.filter($"is_train")
    // step 1 from beta = 0: mu = 1/2, w = 1/4 exactly -> Newton sums
    // are exact integers on the cent grid (no float accumulation)
    val it1 = train.agg(count(lit(1)).as("n"), sum($"y").as("sy"),
        sum($"cents").as("sx_c"), sum($"cents" * $"cents").as("sxx_c"),
        sum($"y" * $"cents").as("sxy_c"))
      .select($"n", $"sy",
        ($"sx_c".cast("double") / lit(10000.0)).as("sx"),
        ($"sxx_c".cast("double") / lit(100000000.0)).as("sxx"),
        ($"sxy_c".cast("double") / lit(10000.0)).as("sxy"))
      .select($"n", $"sx", $"sxx",
        ($"sy" - $"n" / lit(2.0)).as("g0"),
        ($"sxy" - $"sx" / lit(2.0)).as("g1"))
      .select($"n", $"sx", $"sxx", $"g0", $"g1",
        ($"n" / lit(4.0) * ($"sxx" / lit(4.0))
          - ($"sx" / lit(4.0)) * ($"sx" / lit(4.0))).as("det"))
      .select(
        (($"sxx" / lit(4.0)) * $"g0" - ($"sx" / lit(4.0)) * $"g1")
          .divide($"det").as("b0"),
        (($"n" / lit(4.0)) * $"g1" - ($"sx" / lit(4.0)) * $"g0")
          .divide($"det").as("b1"))
    // step 2: per-row sigmoid terms on the broadcast beta, each
    // floored to e9 BEFORE the sum
    val eta = $"b0" + $"b1" * $"x"
    val mu = lit(1.0) / (lit(1.0) + exp(-eta))
    val wgt = mu * (lit(1.0) - mu)
    val it2 = train.crossJoin(broadcast(it1))
      .select(
        floor(wgt * lit(1000000000.0)).cast("long").as("tw"),
        floor(wgt * $"x" * lit(1000000000.0)).cast("long").as("twx"),
        floor(wgt * $"x" * $"x" * lit(1000000000.0)).cast("long")
          .as("twxx"),
        floor(($"y" - mu) * lit(1000000000.0)).cast("long").as("tg0"),
        floor(($"y" - mu) * $"x" * lit(1000000000.0)).cast("long")
          .as("tg1"),
        $"b0", $"b1")
      .groupBy($"b0", $"b1")
      .agg(sum($"tw").as("sw"), sum($"twx").as("swx"),
        sum($"twxx").as("swxx"), sum($"tg0").as("sg0"),
        sum($"tg1").as("sg1"), count(lit(1)).as("n_train"))
    val det2 = ($"sw".cast("double") * $"swxx"
      - $"swx".cast("double") * $"swx") / lit(1e18)
    val g0d = $"sg0".cast("double") / lit(1e9)
    val g1d = $"sg1".cast("double") / lit(1e9)
    val beta = it2.select($"n_train", $"b0", $"b1",
        ($"b0" + ($"swxx".cast("double") / lit(1e9) * g0d
          - $"swx".cast("double") / lit(1e9) * g1d).divide(det2))
          .as("beta0"),
        ($"b1" + ($"sw".cast("double") / lit(1e9) * g1d
          - $"swx".cast("double") / lit(1e9) * g0d).divide(det2))
          .as("beta1"))
    // held-out mean log-loss at the fitted beta (floor-then-sum e9)
    val etaT = $"beta0" + $"beta1" * $"x"
    val ll = $"y".cast("double") * etaT - log(lit(1.0) + exp(etaT))
    rows.filter(!$"is_train").crossJoin(broadcast(beta))
      .select($"n_train", $"beta0", $"beta1",
        floor(ll * lit(1000000000.0)).cast("long").as("tll"))
      .groupBy($"n_train", $"beta0", $"beta1")
      .agg(count(lit(1)).as("n_test"), sum($"tll").as("sll"))
      .select($"n_train", $"n_test",
        floor($"beta0" * lit(1000000.0)).cast("long").as("beta0_e6"),
        floor($"beta1" * lit(1000000.0)).cast("long").as("beta1_e6"),
        // sll <= 0 by construction; negate BEFORE the integer
        // division so both engines divide non-negative operands
        // (Spark div truncates, DuckDB // floors — they only agree
        // on non-negatives)
        expr("(-sll) div n_test").as("neg_mean_ll_e9"))
  }

  /** Winsorization at the exact 5th/95th percentiles per event type —
    * the CLIPPING companion to q_quantile_filter (which drops tail
    * rows) and q_robust_scale (which rescales): training pipelines
    * winsorize reward/score columns so outliers stop dominating
    * gradients without discarding the rows. Bounds are the k-th
    * smallest exact cent values (k_lo = max(1, ⌊5n/100⌋),
    * k_hi = min(n, ⌊95n/100⌋+1) — rank-based, so the bound is
    * tie-invariant and no float percentile interpolation exists
    * anywhere); the clipped sum is pure BIGINT. Everything to the
    * emit is exact integer arithmetic. Shape: one per-type sort
    * window for the ranks (the price of exact percentiles — at
    * larger scales swap in the t-digest/approx path), a broadcast of
    * the |types|-row bounds table back onto the scan, one
    * map-side-combinable rollup. */
  private def winsorize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
    val ranked = base
      .withColumn("rn", row_number().over(
        W.partitionBy($"event_type").orderBy($"cents".asc)))
      .withColumn("n", count(lit(1)).over(W.partitionBy($"event_type")))
    val bounds = ranked
      .groupBy($"event_type")
      .agg(
        max(when($"rn" === greatest(lit(1L), expr("5 * n div 100")),
          $"cents")).as("lo"),
        max(when($"rn" === least($"n", expr("95 * n div 100 + 1")),
          $"cents")).as("hi"),
        max($"n").as("n"))
    base.join(broadcast(bounds), "event_type")
      .groupBy($"event_type")
      .agg(max($"n").as("n"), max($"lo").as("lo"), max($"hi").as("hi"),
        sum(when($"cents" < $"lo", 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when($"cents" > $"hi", 1L).otherwise(0L)).as("n_clip_hi"),
        sum(greatest($"lo", least($"hi", $"cents"))).as("wins_sum"))
      .withColumn("wins_mean_e2", expr("wins_sum * 100 div n"))
  }

  /** Telemetry debounce: drop an event arriving within 5 s of the
    * PREVIOUS event of the same (user, type) — the duplicate-click /
    * retry suppressor. Lag-based (gap to the previous raw event, not
    * to the previous KEPT one — the standard windowed approximation;
    * chained-burst semantics need the sessionize machinery instead,
    * documented trade-off). One window shuffle, integer microsecond
    * gaps, summary per type. */
  private def debounce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("gap_us",
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .withColumn("kept",
        ($"gap_us".isNull || $"gap_us" > 5000000L).cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_total"),
        sum($"kept").as("n_kept"),
        (count(lit(1)) - sum($"kept")).as("n_debounced"))
  }

  /** Calendar-coverage profile per event type: span vs active days —
    * the data-freshness/completeness check a pipeline runs before
    * trusting a time slice. Pure integer date arithmetic (datediff,
    * distinct-day counts), one tiny aggregate. Always emits one row
    * per type even when coverage is complete (gap_days = 0). */
  private def dateGaps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type")
      .agg(min($"day").as("first_day"), max($"day").as("last_day"),
        countDistinct($"day").as("active_days"))
      .select($"event_type", $"first_day", $"last_day",
        (datediff($"last_day", $"first_day") + 1).cast("long")
          .as("span_days"),
        $"active_days",
        (datediff($"last_day", $"first_day") + 1 - $"active_days")
          .cast("long").as("gap_days"))
  }

  /** First-order Markov transition model over each user's event
    * sequence (ordered by ts, tie-broken by event_id): the
    * user-journey statistics behind funnel design and next-event
    * prediction. One window shuffle on user_id produces the lagged
    * pairs; the transition counts and the per-origin totals both
    * collapse map-side; p(next|prev) is a per-row divide of exact
    * counts. */
  private def markovTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val pairs = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy($"prev_type").agg(sum($"cnt").as("tot"))
    pairs.join(broadcast(totals), "prev_type")
      .select($"prev_type", $"next_type", $"cnt",
        round($"cnt" / $"tot", 4).as("p_next"))
  }

  /** Fixed-point rounds for [[markovAttribution]] — the emitted
    * statistic is the exact k-step conversion probability (geometric
    * convergence makes 8 rounds ≈ the stationary value; defining the
    * statistic AT k keeps it bit-exact rather than approximately
    * converged). */
  val MkIters = 8

  /** Markov-chain (removal-effect) channel attribution — the
    * data-driven attribution model that replaces heuristic splits:
    * user journeys become a first-order chain over channel states
    * (start → {view,click,signup,error}* → conv|null, absorbing at
    * the FIRST purchase), the chain's start→conv probability is a
    * fixed point, and a channel's credit is its REMOVAL EFFECT — how
    * much conversion probability disappears when every edge into the
    * channel is redirected to null (done for free here: dropping
    * b=c rows while keeping the original n_a denominators IS that
    * redirect). Per-conversion heuristics (even-split = the Shapley
    * value of both the OR- and AND-game) can't see path structure;
    * removal effect can. Mechanics: the transition table is a
    * ≤|states|²-row aggregate (map-side; journeys shuffle once on
    * user_id for the lag), and the 5 fixed points (full + 4
    * removals) run as [[MkIters]] unrolled integer rounds on the e9
    * grid — P_i(a) = Σ_b n_ab·P_{i−1}(b) div n_a, exact integer ops
    * joining 36-row tables, the PageRank idiom. Output: per channel,
    * full/removed k-step conv probability, effect, normalized share. */
  private def markovAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val fp = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(min(struct($"ts", $"event_id")).as("fp"))
    val pre = ev.filter($"event_type" =!= "purchase")
      .join(fp, Seq("user_id"), "left")
      .filter($"fp".isNull || struct($"ts", $"event_id") < $"fp")
      .withColumn("converted", $"fp".isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val seqd = pre
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .withColumn("rn", row_number().over(w))
    val trans = seqd.filter($"nxt".isNotNull)
      .select($"event_type".as("a"), $"nxt".as("b"))
      .unionByName(seqd.filter($"nxt".isNull)
        .select($"event_type".as("a"),
          when($"converted", "conv").otherwise("null").as("b")))
      .unionByName(seqd.filter($"rn" === 1)
        .select(lit("start").as("a"), $"event_type".as("b")))
      .unionByName(fp
        .join(pre.select($"user_id").distinct(), Seq("user_id"),
          "left_anti")
        .select(lit("start").as("a"), lit("conv").as("b")))
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
    val t = graft.GraftCaches.getOrPersist(s, s"stats.markov_t:$d") {
      trans.join(
        broadcast(trans.groupBy($"a").agg(sum($"n_ab").as("n_a"))),
        "a")
    }
    // The transition table is bounded by |states|² ≤ 36 rows at ANY
    // corpus size, so the 5 × MkIters fixed points run DRIVER-SIDE on
    // the collected table (the q_heavy_hitters bounded-collect
    // contract — this is a fixed-size model, not data). A first
    // formulation ran them as 40 unrolled tiny-table joins: 21.8 s of
    // sequential micro-shuffles for 36 rows. Pure-integer Scala is
    // bit-identical to the SQL replay.
    val edges = t.select($"a", $"b", $"n_ab", $"n_a")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    def pconv(removed: Option[String]): Long = {
      val tt = edges.filter(e => !removed.contains(e._2))
      var p = Map("conv" -> 1000000000L, "null" -> 0L)
        .withDefaultValue(0L)
      for (_ <- 1 to MkIters) {
        val step = tt.groupBy(_._1).map { case (a, es) =>
          a -> es.map(e => e._3 * p(e._2)).sum / es.head._4
        }
        p = (step ++ Map("conv" -> 1000000000L, "null" -> 0L))
          .withDefaultValue(0L)
      }
      p("start")
    }
    val full = pconv(None)
    val rows = Seq("view", "click", "signup", "error").map { c =>
      val rem = pconv(Some(c))
      (c, full, rem, math.max(full - rem, 0L))
    }
    val tot = rows.map(_._4).sum
    rows.map { case (c, f, r, e) =>
      (c, f, r, e, if (tot > 0) Some(e * 1000000L / tot) else None)
    }.toDF("channel", "p_full_e9", "p_removed_e9", "effect_e9",
      "share_ppm")
  }

  /** Unrolled DuckDB replay of [[markovAttribution]] — the journey
    * CTEs plus [[MkIters]] integer fixed-point rounds for each of the
    * 5 chain variants (full + 4 removals), generated the pagerank way. */
  private def markovOracle: String = {
    def variant(tag: String, filter: String): String = {
      val head = s""",
      t_$tag AS (SELECT * FROM t$filter),
      p_${tag}_0 AS (SELECT DISTINCT a AS state,
                            CAST(0 AS BIGINT) AS p_e9
                     FROM t_$tag
                     UNION ALL SELECT state, p_e9 FROM absorbers)"""
      val steps = (1 to MkIters).map { i =>
        s""",
      p_${tag}_$i AS (SELECT a AS state,
                             CAST(sum(n_ab * p.p_e9) // max(n_a)
                               AS BIGINT) AS p_e9
                      FROM t_$tag e
                      JOIN p_${tag}_${i - 1} p ON e.b = p.state
                      GROUP BY 1
                      UNION ALL SELECT state, p_e9 FROM absorbers)"""
      }.mkString
      head + steps
    }
    val channels = Seq("view", "click", "signup", "error")
    val variants = variant("full", "") +
      channels.map(c => variant(c, s" WHERE b <> '$c'")).mkString
    val removalRows = channels.map(c =>
      s"""SELECT '$c' AS channel,
                 (SELECT p_e9 FROM p_${c}_$MkIters
                  WHERE state = 'start') AS p_removed_e9""")
      .mkString("\n        UNION ALL\n        ")
    s"""
      WITH ev AS (SELECT user_id, ts, event_id, event_type
                  FROM events),
      fp AS (SELECT user_id,
                    min(struct_pack(t := ts, e := event_id)) AS fp
             FROM ev WHERE event_type = 'purchase' GROUP BY 1),
      pre AS (SELECT ev.user_id, ev.ts, ev.event_id, ev.event_type,
                     fp.fp IS NOT NULL AS converted
              FROM ev LEFT JOIN fp USING (user_id)
              WHERE ev.event_type <> 'purchase'
                AND (fp.fp IS NULL
                     OR struct_pack(t := ts, e := event_id) < fp.fp)),
      seqd AS (SELECT *,
                      lead(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS nxt,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS rn
               FROM pre),
      edges0 AS (
        SELECT event_type AS a, nxt AS b
        FROM seqd WHERE nxt IS NOT NULL
        UNION ALL
        SELECT event_type AS a,
               CASE WHEN converted THEN 'conv' ELSE 'null' END AS b
        FROM seqd WHERE nxt IS NULL
        UNION ALL
        SELECT 'start' AS a, event_type AS b FROM seqd WHERE rn = 1
        UNION ALL
        SELECT 'start' AS a, 'conv' AS b
        FROM fp ANTI JOIN (SELECT DISTINCT user_id FROM pre) p
          USING (user_id)),
      trans AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
                FROM edges0 GROUP BY 1, 2),
      t AS (SELECT trans.a, trans.b, trans.n_ab, tot.n_a
            FROM trans
            JOIN (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
                  FROM trans GROUP BY 1) tot USING (a)),
      absorbers AS (SELECT 'conv' AS state,
                           CAST(1000000000 AS BIGINT) AS p_e9
                    UNION ALL
                    SELECT 'null', CAST(0 AS BIGINT))$variants,
      removals AS (
        $removalRows),
      fullp AS (SELECT p_e9 AS p_full_e9 FROM p_full_$MkIters
                WHERE state = 'start'),
      eff AS (SELECT channel, p_full_e9, p_removed_e9,
                     greatest(p_full_e9 - p_removed_e9, 0)
                       AS effect_e9
              FROM removals, fullp),
      tot2 AS (SELECT CAST(sum(effect_e9) AS BIGINT) AS tot_eff
               FROM eff)
      SELECT channel, p_full_e9, p_removed_e9,
             CAST(effect_e9 AS BIGINT) AS effect_e9,
             CASE WHEN tot_eff > 0
               THEN CAST(effect_e9 * 1000000 // tot_eff AS BIGINT)
             END AS share_ppm
      FROM eff, tot2"""
  }

  /** Weighted median (lower weighted median: smallest value whose
    * cumulative weight reaches half the total) of line price weighted
    * by QUANTITY, per return flag — the robust center that answers
    * "the price of the median UNIT SHIPPED", which the unweighted
    * median (price of the median line) systematically misses when
    * cheap lines carry big quantities. Cross-multiplied selection
    * (2·cumw ≥ totw — no halving division), exact integer cents and
    * weights; the cumulative window walks DISTINCT price points per
    * flag after a map-side (flag, price) pre-aggregate, not rows. */
  private def weightedMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy($"l_returnflag").orderBy($"cents".asc)
    val cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    Tables.lineitem(s, d)
      .select($"l_returnflag",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag", $"cents")
      .agg(sum($"qty").as("wt"))
      .withColumn("cumw", sum($"wt").over(cum))
      .withColumn("totw", sum($"wt").over(W.partitionBy($"l_returnflag")))
      .filter($"cumw" * 2 >= $"totw")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_returnflag", $"totw".as("total_qty"),
        $"cents".as("wmedian_cents"), $"cumw".as("cum_at_median"))
  }

  /** Benford first-digit screen — the fraud/synthetic-data smell test:
    * the first significant digit of organic amounts follows
    * p(d) = log10(1+1/d). The digit is extracted via BIGINT→string
    * (identical rendering in every engine — no log10/power on doubles
    * anywhere near the digit), counts are exact, and only the
    * constant expected-p and the observed share are floating (one
    * per-row divide each). A synthetic-uniform price column fails the
    * screen, which is itself informative for the test data. */
  private def benford(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = ($"o_totalprice".cast("decimal(18,2)") * 100)
      .cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = Tables.orders(s, d)
      .select(digit.as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum($"n").as("tot"))
    counts.crossJoin(broadcast(tot))
      .select($"digit", $"n",
        round($"n" / $"tot", 4).as("obs_p"),
        round(log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0)), 4)
          .as("benford_p"))
  }

  /** Inter-arrival-time percentiles per event type — the ops-telemetry
    * profile (burstiness, staleness SLO). Gaps are exact integer
    * microseconds from one window pass; the percentiles are exact
    * interpolated quantiles over those integers. */
  private def interEvent(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d)
      .select($"event_type", $"ts", $"event_id")
      .withColumn("gap_us",
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .filter($"gap_us".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_us, 0.5)").as("p50_us"),
        expr("percentile(gap_us, 0.95)").as("p95_us"),
        max($"gap_us").as("max_us"))
  }

  /** Forward-fill (LOCF — last observation carried forward): treat
    * `click` events' values as sparse sensor readings and carry each
    * user's most recent reading onto every subsequent event — the
    * gap-fill a feature-engineering pipeline runs before training-set
    * assembly (as-of self-join semantics, expressed as ONE window).
    * Shape at scale: a single shuffle on user_id, then a running
    * `last(ignoreNulls)` frame — no self-join, no range probe; the
    * user_id predicate is pushed to the parquet scan. Values pass
    * through untouched (no arithmetic), so the hash compare is
    * float-safe by construction. */
  private def locfFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Long.MinValue, 0)
    Tables.events(s, d)
      .filter($"user_id" < 10)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"event_type", $"ts",
        when($"event_type" === "click", $"value").as("reading"))
      .withColumn("filled", last($"reading", ignoreNulls = true).over(w))
      .select($"event_id", $"user_id", $"ts_us", $"event_type",
        $"reading", $"filled",
        ($"reading".isNull && $"filled".isNotNull).as("is_filled"))
  }

  /** Group-mean imputation: a deterministic subset of readings is
    * nulled (event_id ≡ 0 mod 37 — the planted-missingness pattern),
    * then refilled with the per-series mean of the SURVIVING readings
    * — the feature-engineering fill a training pipeline applies when
    * LOCF has no donor. The means collapse to one tiny aggregate that
    * joins back BROADCAST onto the scan (never a window over the fact
    * table). Float discipline: values snap to integer cents ON THE
    * DECIMAL GRID (cast decimal(18,2)·100, never round(double·100)),
    * sum/count are exact BIGINTs and the imputed value is emitted as
    * the floor of one exact-integer divide (rule 4a); the audit
    * counts per series are exact. */
  private def imputeGroupMean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, d)
      .select($"event_id", $"event_type",
        when($"event_id" % 37 =!= 0,
          ($"value".cast("decimal(18,2)") * 100).cast("long")).as("cents"))
    val means = base.filter($"cents".isNotNull)
      .groupBy($"event_type")
      .agg(sum($"cents").as("sc"), count(lit(1)).as("nc"))
    base.join(broadcast(means), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"cents".isNull, 1L).otherwise(0L)).as("n_imputed"),
        max(expr("sc div nc")).as("fill_cents"),
        sum(coalesce($"cents", expr("sc div nc")))
          .as("total_cents_after_fill"))
  }

  /** Population-stability-index drift report — THE production metric
    * for "has this feature's distribution moved between the reference
    * window and now" (model-monitoring 101; >0.2 conventionally
    * triggers retraining). Orders before 1998 are the reference
    * population, 1998+ the current one; o_totalprice is binned into
    * 10 equal-width buckets from the GLOBAL min/max (one broadcast
    * stats row), and PSI = Σ (p−q)·ln(p/q) with add-one smoothing so
    * empty bins stay defined. Float discipline (the r6 lesson: never
    * feed a rounded ln back into a double multiply-then-floor): ln is
    * rounded to the 1e-6 grid (rule 6) and immediately pinned as
    * BIGINT micro-units via DECIMAL(18,6); p−q is carried as the
    * EXACT integer ratio num/den (common-denominator form), so each
    * bin's 1e-9-unit term is one integer `div` — floor of an exact
    * integer quotient, bit-identical in every engine — and the grand
    * total is an exact integer window sum. No double ever re-enters
    * after the ln. One conditional-aggregate shuffle on the bin; the
    * 10-row total window is post-aggregation. */
  private def psiDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val stats = o.agg(min($"o_totalprice").as("mn"),
      max($"o_totalprice").as("mx"))
    val cut = lit("1998-01-01").cast("timestamp")
    val binned = o.crossJoin(broadcast(stats))
      .select(least(floor(($"o_totalprice" - $"mn") /
          (($"mx" - $"mn") / 10)), lit(9)).cast("long").as("bin"),
        ($"o_orderdate" < cut).as("is_ref"))
      .groupBy($"bin")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("ref_n"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("cur_n"))
    val tot = binned.agg(sum($"ref_n").as("ref_tot"),
      sum($"cur_n").as("cur_tot"))
    val p = ($"ref_n" + 1) / ($"ref_tot" + 10)
    val q = ($"cur_n" + 1) / ($"cur_tot" + 10)
    // ln on the 1e-6 grid, pinned to exact BIGINT micro-units; p−q as
    // the exact integer ratio num/den. term·1e9 = num·lnU·1000 div den
    // (both factors share sign, so trunc-div == floor-div).
    val lnUnits = (round(log(p / q), 6).cast("decimal(18,6)") *
      1000000).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    binned.crossJoin(broadcast(tot))
      .withColumn("ln_units", lnUnits)
      .withColumn("num", ($"ref_n" + 1) * ($"cur_tot" + 10) -
        ($"cur_n" + 1) * ($"ref_tot" + 10))
      .withColumn("den", ($"ref_tot" + 10) * ($"cur_tot" + 10))
      .select($"bin", $"ref_n", $"cur_n",
        expr("CAST((CAST(num AS DECIMAL(38,0)) * ln_units * 1000)" +
          " div den AS BIGINT)").as("psi_term_units"))
      .withColumn("psi_total_units", sum($"psi_term_units").over(w))
  }

  /** Calendar densification (resample to a fixed hourly grid): the
    * sparse high-severity `error` series is re-laid onto a complete
    * hourly spine between its first and last occurrence, gaps
    * zero-filled and flagged — the step that turns an irregular event
    * log into the fixed-grid series a forecaster or SLA monitor
    * consumes. The spine comes from a per-key
    * `sequence(min_hour, max_hour, 1 hour)` explode — bounded by the
    * series' own time range, never a global calendar cross join — and
    * the left join back is one co-partitioned shuffle on
    * (series, hour). Hours travel as epoch-microsecond BIGINTs;
    * counts are exact longs. */
  private def calendarFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .filter($"event_type" === "error" && $"value" > 200.0)
      .select($"event_type", date_trunc("hour", $"ts").as("hr"))
      .groupBy($"event_type", $"hr").agg(count(lit(1)).as("n_events"))
    val spine = hourly.groupBy($"event_type")
      .agg(min($"hr").as("t0"), max($"hr").as("t1"))
      .select($"event_type",
        explode(sequence($"t0", $"t1", expr("interval 1 hour"))).as("hr"))
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .select($"event_type", unix_micros($"hr").as("hr_us"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        $"n_events".isNull.as("was_gap"))
  }

  /** Grouped least-squares trend: per event series, the OLS slope of
    * value against day index — the per-key regression a metrics
    * pipeline fits to ask "is this series drifting, and how fast".
    * Float discipline: x is an integer day index and y integer cents
    * snapped on the decimal grid (cast decimal(18,2)·100),
    * all four moments (Σx, Σy, Σxy, Σx²) are exact BIGINT sums, and
    * the closed-form slope (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is ONE divide
    * of exact integers (rule 1) — numerator and denominator are also
    * emitted so the oracle pins the integer algebra, not just the
    * quotient. One map-side-combining aggregate, no window, no
    * self-join. */
  private def groupOls(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val day = datediff($"ts".cast("date"), lit("2024-01-01").cast("date"))
      .cast("long")
    Tables.events(s, d)
      .select($"event_type", day.as("x"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .select($"event_type", $"n",
        ($"n" * $"sxy" - $"sx" * $"sy").as("slope_num"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("slope_den"),
        (($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx")).as("slope_cents_per_day"),
        ($"sy" / $"n").as("mean_cents"))
  }

  /** CHOW structural-break test (Chow 1960) on the weekly revenue
    * trend — the "did the regression REGIME change at the pivot?"
    * question [[groupOls]]'s single slope and q_changepoint's mean
    * shifts can't answer (a break can flip slope with no level jump).
    * Per event type the weekly series splits at its midpoint week;
    * each segment's OLS residual sum of squares comes STRAIGHT from
    * the five integer moments as the exact rational
    * SSR = [D·Syy − Sy·(Sy·Sxx − Sx·Sxy) − Sxy·(n·Sxy − Sx·Sy)] / D,
    * D = n·Sxx − Sx² — no per-row residual, no squared-residual
    * overflow (the reason a Breusch–Pagan form was rejected). Each
    * SSR floors ONCE (documented floor point — the three
    * denominators differ, so a common-denominator cross-
    * multiply of F would pass 1e38), then
    * F_e6 = 10⁶·(n−4)·max(SSR_p − SSR₁ − SSR₂, 0) div (2·(SSR₁+SSR₂))
    * — the SSR floor is the INTEGER grid (cents² units: SSR ≈ 1e14
    * here vs int64's 9e18, ~300× volume headroom since SSR ∝ vol²,
    * and F is insensitive to a ±1 cents² floor), and the
    * greatest(·,0) guards the −1 the independent floors can
    * leave under an exact no-break fit (the q_friedman lesson:
    * negative div diverges between engines). x is the RELATIVE week
    * index (≤ ~110), keeping D·Syy ≈ 1e21 with 17 orders of
    * decimal(38,0) headroom. Shape: one weekly rollup, one 2-segment
    * moment aggregate, |types| rows out. */
  private def chowBreak(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val weekly = Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type",
        (datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
          / 7).cast("long").as("wk"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"wk").agg(sum($"cents").as("y"))
      .withColumn("x", $"wk" - min($"wk").over(W))
      .withColumn("seg",
        when($"x" * 2 < max($"x").over(W), 1L).otherwise(2L))
    def ssrE3(pre: String) = expr(
      s"""case when ${pre}d > 0 then
         cast((cast(${pre}d as decimal(38,0)) * ${pre}syy
               - cast(${pre}sy as decimal(38,0))
                 * (${pre}sy * ${pre}sxx - ${pre}sx * ${pre}sxy)
               - cast(${pre}sxy as decimal(38,0))
                 * (${pre}n * ${pre}sxy - ${pre}sx * ${pre}sy))
              div ${pre}d as bigint)
         end""")
    def moments(dfw: DataFrame, pre: String) = dfw
      .groupBy($"event_type")
      .agg(count(lit(1)).as(s"${pre}n"), sum($"x").as(s"${pre}sx"),
        sum($"y").as(s"${pre}sy"), sum($"x" * $"x").as(s"${pre}sxx"),
        sum($"x" * $"y").as(s"${pre}sxy"),
        expr("sum(cast(y as decimal(38,0)) * y)").as(s"${pre}syy"))
      .withColumn(s"${pre}d",
        expr(s"${pre}n * ${pre}sxx - ${pre}sx * ${pre}sx"))
      .withColumn(s"${pre}ssr", ssrE3(pre))
    val p = moments(weekly, "p_")
    val s1 = moments(weekly.filter($"seg" === 1L), "a_")
    val s2 = moments(weekly.filter($"seg" === 2L), "b_")
    p.join(s1, "event_type").join(s2, "event_type")
      .select($"event_type", $"p_n".as("n_weeks"), $"a_n".as("n_seg1"),
        $"b_n".as("n_seg2"), $"p_ssr".as("ssr_pooled"),
        $"a_ssr".as("ssr_seg1"), $"b_ssr".as("ssr_seg2"),
        expr("""case when a_n >= 3 and b_n >= 3
                 and a_ssr is not null and b_ssr is not null
                 and a_ssr + b_ssr > 0 then
               cast(cast(1000000 as decimal(38,0)) * (p_n - 4)
                 * greatest(p_ssr - a_ssr - b_ssr, 0L)
                 div (2 * (a_ssr + b_ssr)) as bigint)
               end""").as("f_e6"))
  }

  /** Ridge-regularized grouped trend — [[groupOls]] with an L2 penalty
    * on the slope, the regression a pipeline reaches for when short or
    * noisy series make raw OLS slopes jumpy: the closed form is
    * slope_λ = Sxy_c / (Sxx_c + λ) with the intercept unpenalized, so
    * no iteration and the same five exact-integer moments as OLS. The
    * penalty is expressed as a FRACTION of Sxx_c (λ = 0 %, 10 %, 50 %)
    * — scale-free, and it makes the shrinkage path an exact integer
    * computation: every slope is ONE integer division, carried through
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) because
    * Sxy_c·1e6 overflows int64 at real event volumes. Monotone
    * shrinkage toward zero is pinned by StatsSpec. One map-side
    * combinable aggregate, |types| rows out. */
  private def ridgeTrend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val day = datediff($"ts".cast("date"), lit("2024-01-01").cast("date"))
      .cast("long")
    Tables.events(s, d)
      .select($"event_type", day.as("x"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .filter($"y".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .select($"event_type", $"n",
        ($"n" * $"sxy" - $"sx" * $"sy").as("sxy_c"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("sxx_c"))
      .withColumn("slope0_e6", expr(
        "CAST(CAST(sxy_c AS DECIMAL(38,0)) * 1000000 div sxx_c AS BIGINT)"))
      .withColumn("slope10_e6", expr(
        "CAST(CAST(sxy_c AS DECIMAL(38,0)) * 1000000" +
          " div (sxx_c + sxx_c div 10) AS BIGINT)"))
      .withColumn("slope50_e6", expr(
        "CAST(CAST(sxy_c AS DECIMAL(38,0)) * 1000000" +
          " div (sxx_c + sxx_c div 2) AS BIGINT)"))
  }

  /** Rolling anomaly detection — flag events whose value exceeds 3
    * rolling standard deviations over the trailing 50 events of the
    * same type (the streaming-shaped drift/outlier monitor a metrics
    * pipeline runs per series). Float discipline: values snap to
    * integer cents on the decimal grid (cast decimal(18,2)·100 — the
    * 2-decimal grid is exact in every engine),
    * the rolling moments are BIGINT window sums (exact regardless of
    * accumulation order), and the 3σ test is CROSS-MULTIPLIED into
    * pure integer form — (n·x−s)² > 9·(n·q−s²) ⇔ (x−mean)² > 9·var —
    * so no float ever reaches the comparison (rules 2/5). Shape at
    * scale: ONE shuffle on event_type, then a bounded 50-row frame —
    * no self-join, no global window. */
  private def rollingAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(-49, 0)
    Tables.events(s, d)
      .select($"event_id", $"event_type", $"ts",
        unix_micros($"ts").as("ts_us"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sw", sum($"cents").over(w))
      .withColumn("qw", sum($"cents" * $"cents").over(w))
      .filter($"n" >= 10 &&
        ($"n" * $"cents" - $"sw") * ($"n" * $"cents" - $"sw") >
          lit(9) * ($"n" * $"qw" - $"sw" * $"sw"))
      .select($"event_id", $"event_type", $"ts_us", $"cents", $"n",
        (($"n" * $"cents" - $"sw") *
          ($"n" * $"cents" - $"sw")).as("dev2_n2"),
        ($"n" * $"qw" - $"sw" * $"sw").as("var_n2"))
  }

  /** Lagged-feature construction for forecasting — the
    * feature-engineering step that turns a daily metric series into
    * supervised training rows: per (series, day), the day's total
    * beside its lag-1 and lag-7 values and the trailing-7-day sum
    * (nulls where history is short — the consumer's train/skip
    * decision, not ours to impute). One aggregate collapses events to
    * the daily grain (map-side combinable), then ONE window shuffle on
    * the series key serves all three features — the frames share the
    * same (partition, order). Cents snap on the decimal grid; every
    * feature is an exact BIGINT. */
  private def featureLags(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"), count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    val w7 = w.rowsBetween(-6, 0)
    daily.select($"event_type", $"day", $"cents", $"n",
      lag($"cents", 1).over(w).as("lag1_cents"),
      lag($"cents", 7).over(w).as("lag7_cents"),
      sum($"cents").over(w7).as("roll7_cents"))
  }

  /** Lag-1 autocorrelation per metric series — the "is yesterday
    * predictive of today" diagnostic that decides whether the lagged
    * features (q_feature_lags) are worth training on. Daily totals on
    * the exact cents grid; consecutive-day pairs via ONE window lag on
    * the series key (pairs where the previous calendar day exists);
    * then Pearson r from EXACT integer moments (Σx Σy Σxx Σyy Σxy all
    * BIGINT — cents² summed over day-cardinality rows sits far inside
    * BIGINT), with the double algebra only after aggregation on
    * bit-identical inputs, rounded at 1e-6 like q_corr_moments. */
  private def autocorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    val pairs = daily
      .withColumn("x_prev", lag($"x", 1).over(w))
      .withColumn("day_prev", lag($"day", 1).over(w))
      .filter($"x_prev".isNotNull &&
        datediff($"day", $"day_prev") === 1)
    val m = pairs.groupBy($"event_type").agg(
      count(lit(1)).as("n_pairs"), sum($"x").as("sx"),
      sum($"x_prev").as("sy"), sum($"x" * $"x").as("sxx"),
      sum($"x_prev" * $"x_prev").as("syy"),
      sum($"x" * $"x_prev").as("sxy"))
    val n = $"n_pairs".cast("double")
    val cov = $"sxy" / n - ($"sx" / n) * ($"sy" / n)
    val vx = $"sxx" / n - ($"sx" / n) * ($"sx" / n)
    val vy = $"syy" / n - ($"sy" / n) * ($"sy" / n)
    // e6-floor, not round(·,6): round-to-decimals on doubles is
    // engine-divergent at decimal ties (the q_rolling_corr r9 lesson)
    m.select($"event_type", $"n_pairs", $"sx", $"sy", $"sxx", $"syy",
      $"sxy",
      floor(cov / (sqrt(vx) * sqrt(vy)) * lit(1000000.0))
        .as("autocorr_e6"))
  }

  /** Partial autocorrelation (lags 1–3) of the daily revenue series
    * per event type via the Durbin–Levinson recursion — the AR-order
    * diagnostic that separates DIRECT lag-k dependence from
    * correlation inherited through intermediate lags (the companion
    * q_autocorr/q_feature_lags read before choosing AR features).
    * Classical ACF about the FULL-series mean: every cross-sum
    * (Σx, Σx², Σ xₜxₜ₊ₖ and the two alignment partial sums) is an
    * exact BIGINT from lead-k windows over the calendar-cardinality
    * table; the covariances, r₁..r₃, and the unrolled φ₂₂/φ₃₃
    * recursion are per-row doubles written identically in both
    * engines, floored e6 (Σx² overflows int64 only beyond ~30× this
    * probe scale — the decimal(38) swap note applies). Lags are
    * OBSERVATION lags in day order (calendar gaps treated as
    * adjacent). One daily rollup + one |types|-row tail. */
  private def pacf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy($"event_type").orderBy($"day".asc)
    // cents-not-null BEFORE the rollup (the dailyCents convention): a
    // day whose events all carry null value would otherwise emit an
    // x=NULL row that inflates n while contributing nothing to the
    // sums, skewing the mean/ACF denominators
    val daily = Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("x"))
    val led = daily
      .withColumn("x1", lead($"x", 1).over(w))
      .withColumn("x2", lead($"x", 2).over(w))
      .withColumn("x3", lead($"x", 3).over(w))
    val agg = led.groupBy($"event_type").agg(
      count(lit(1)).as("n"), sum($"x").as("sxs"),
      sum($"x" * $"x").as("sxx"),
      sum($"x" * $"x1").as("sxy1"),
      sum(when($"x1".isNotNull, $"x")).as("sa1"), sum($"x1").as("sb1"),
      sum($"x" * $"x2").as("sxy2"),
      sum(when($"x2".isNotNull, $"x")).as("sa2"), sum($"x2").as("sb2"),
      sum($"x" * $"x3").as("sxy3"),
      sum(when($"x3".isNotNull, $"x")).as("sa3"), sum($"x3").as("sb3"))
      .withColumn("mm", $"sxs".cast("double") / $"n")
      .withColumn("c0",
        ($"sxx".cast("double") - $"sxs".cast("double") * $"mm") / $"n")
      .withColumn("r1", ($"sxy1".cast("double")
        - $"mm" * ($"sa1" + $"sb1")
        + ($"n" - 1) * $"mm" * $"mm") / $"n" / $"c0")
      .withColumn("r2", ($"sxy2".cast("double")
        - $"mm" * ($"sa2" + $"sb2")
        + ($"n" - 2) * $"mm" * $"mm") / $"n" / $"c0")
      .withColumn("r3", ($"sxy3".cast("double")
        - $"mm" * ($"sa3" + $"sb3")
        + ($"n" - 3) * $"mm" * $"mm") / $"n" / $"c0")
      .withColumn("p11", $"r1")
      .withColumn("den2", lit(1.0) - $"r1" * $"p11")
      .withColumn("p22", ($"r2" - $"p11" * $"r1") / $"den2")
      .withColumn("p21", $"p11" - $"p22" * $"p11")
      .withColumn("den3",
        lit(1.0) - ($"p21" * $"r1" + $"p22" * $"r2"))
      .withColumn("p33",
        ($"r3" - ($"p21" * $"r2" + $"p22" * $"r1")) / $"den3")
    agg.select($"event_type", $"n".as("n_days"),
      when($"c0" > 0, floor($"r1" * lit(1000000.0))).as("r1_e6"),
      when($"c0" > 0, floor($"r2" * lit(1000000.0))).as("r2_e6"),
      when($"c0" > 0, floor($"r3" * lit(1000000.0))).as("r3_e6"),
      when($"c0" > 0 && abs($"den2") > 0,
        floor($"p22" * lit(1000000.0))).as("pacf2_e6"),
      when($"c0" > 0 && abs($"den2") > 0 && abs($"den3") > 0,
        floor($"p33" * lit(1000000.0))).as("pacf3_e6"))
  }

  /** AR(2) forecast via Yule–Walker, per event type — the battery's
    * first PREDICTIVE emit: q_pacf diagnoses the AR order; this
    * closes the loop by fitting φ₁, φ₂ from the same exact-integer
    * autocovariance sums (φ₁ = r₁(1−r₂)/(1−r₁²),
    * φ₂ = (r₂−r₁²)/(1−r₁²)) and rolling the recursion forward three
    * days from the last two observed values:
    * x̂ₜ₊ₕ = μ + φ₁(x̂ₜ₊ₕ₋₁−μ) + φ₂(x̂ₜ₊ₕ₋₂−μ), unrolled so both
    * engines evaluate the identical expression tree. Float
    * discipline: the whole chain is +,·,/ on exact BIGINTs — no
    * libm at all — so the doubles are bit-identical by IEEE
    * determinism and the floor(·) emits (φ·1e6, forecasts at the
    * cent grid) are exact. The last-two-values pivot rides the same
    * lead-window pass as the sums (row_number over the descending
    * day order), so the series is scanned once. Shape: calendar-
    * cardinality windows, |types|-row tail — flat in event volume. */
  private def ar2Forecast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy($"event_type").orderBy($"day".asc)
    val wDesc = W.partitionBy($"event_type").orderBy($"day".desc)
    val daily = Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("x"))
    val led = daily
      .withColumn("x1", lead($"x", 1).over(w))
      .withColumn("x2", lead($"x", 2).over(w))
      .withColumn("rn", row_number().over(wDesc))
    val agg = led.groupBy($"event_type").agg(
      count(lit(1)).as("n"), sum($"x").as("sxs"),
      sum($"x" * $"x").as("sxx"),
      sum($"x" * $"x1").as("sxy1"),
      sum(when($"x1".isNotNull, $"x")).as("sa1"), sum($"x1").as("sb1"),
      sum($"x" * $"x2").as("sxy2"),
      sum(when($"x2".isNotNull, $"x")).as("sa2"), sum($"x2").as("sb2"),
      max(when($"rn" === 1, $"x")).as("xn"),
      max(when($"rn" === 2, $"x")).as("xn1"))
      .withColumn("mm", $"sxs".cast("double") / $"n")
      .withColumn("c0",
        ($"sxx".cast("double") - $"sxs".cast("double") * $"mm") / $"n")
      .withColumn("r1", ($"sxy1".cast("double")
        - $"mm" * ($"sa1" + $"sb1")
        + ($"n" - 1) * $"mm" * $"mm") / $"n" / $"c0")
      .withColumn("r2", ($"sxy2".cast("double")
        - $"mm" * ($"sa2" + $"sb2")
        + ($"n" - 2) * $"mm" * $"mm") / $"n" / $"c0")
      .withColumn("den", lit(1.0) - $"r1" * $"r1")
      .withColumn("phi1", $"r1" * (lit(1.0) - $"r2") / $"den")
      .withColumn("phi2", ($"r2" - $"r1" * $"r1") / $"den")
      .withColumn("f1", $"mm" + $"phi1" * ($"xn" - $"mm")
        + $"phi2" * ($"xn1" - $"mm"))
      .withColumn("f2", $"mm" + $"phi1" * ($"f1" - $"mm")
        + $"phi2" * ($"xn" - $"mm"))
      .withColumn("f3", $"mm" + $"phi1" * ($"f2" - $"mm")
        + $"phi2" * ($"f1" - $"mm"))
    val ok = $"c0" > 0 && abs($"den") > 0 && $"n" >= 3
    agg.select($"event_type", $"n".as("n_days"),
      when(ok, floor($"phi1" * lit(1000000.0))).as("phi1_e6"),
      when(ok, floor($"phi2" * lit(1000000.0))).as("phi2_e6"),
      when(ok, floor($"f1")).as("f1_cents"),
      when(ok, floor($"f2")).as("f2_cents"),
      when(ok, floor($"f3")).as("f3_cents"))
  }

  /** Day-of-week seasonality index per metric series — mean of each
    * weekday relative to the series' overall mean, the decomposition
    * diagnostic read before choosing lag features (a strong weekly
    * index argues for lag-7 over lag-1, q_feature_lags). The ratio of
    * two means clears to one divide of exact BIGINT cross-products:
    * index = (sum_dow · n_all) / (n_dow · sum_all). One daily-grain
    * aggregate, one 7-group aggregate, one broadcast of the per-series
    * totals. */
  private def seasonality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val byDow = daily
      .groupBy($"event_type", dayofweek($"day").cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum($"cents").as("sum_cents"))
    val totals = byDow.groupBy($"event_type")
      .agg(sum($"n_days").as("n_all"), sum($"sum_cents").as("sum_all"))
    byDow.join(broadcast(totals), Seq("event_type"))
      .select($"event_type", $"dow", $"n_days", $"sum_cents",
        (($"sum_cents" * $"n_all").cast("double") /
          ($"n_days" * $"sum_all")).as("seasonal_index"))
  }

  /** Bhattacharyya coefficient + Hellinger distance between the
    * weekday revenue profiles of two event types — the bounded-metric
    * member completing the drift-distance family (PSI diverges on
    * empty cells, JS needs logs, Wasserstein needs an order; Hellinger
    * is a PROPER METRIC on [0,1] with none of those needs). Shares
    * snap to the intensive e6 grid (p_e6 = cents_w·10⁶ div N — O(1)
    * in volume, the Tukey discipline), each √(p_e6·q_e6) term is the
    * exact integer floor ⌊√w⌋ via the double-candidate + integer-
    * correction rule (w ≤ 10¹² always, so every comparand is tiny),
    * BC_e6 = Σ terms over the ≤7 weekday cells, and H²_e6 = 10⁶ − BC
    * (exact in these units; the share-grid flooring is the operator
    * contract). Shape: one dow rollup — 7 cells at any volume. */
  private def bhattacharyya(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (ta, tb) = ("click", "purchase")
    val cells = Tables.events(s, d)
      .filter($"value".isNotNull &&
        ($"event_type" === ta || $"event_type" === tb))
      .select(dayofweek($"ts").cast("long").as("dow"),
        ($"event_type" === ta).as("isa"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy($"dow")
      .agg(sum(when($"isa", $"c").otherwise(0L)).as("cw"),
        sum(when(!$"isa", $"c").otherwise(0L)).as("dw"))
    val tot = cells.agg(sum($"cw").as("n"), sum($"dw").as("m"))
    val terms = cells.crossJoin(broadcast(tot))
      .filter($"n" > 0 && $"m" > 0)
      .select($"dow",
        expr("cast(cast(cw as decimal(38,0)) * 1000000 div n" +
          " as bigint)").as("p_e6"),
        expr("cast(cast(dw as decimal(38,0)) * 1000000 div m" +
          " as bigint)").as("q_e6"))
      .withColumn("w", $"p_e6" * $"q_e6")
      .withColumn("kd", floor(sqrt($"w".cast("double"))).cast("long"))
      .withColumn("term",
        when(($"kd" + 1) * ($"kd" + 1) <= $"w", $"kd" + 1)
          .when($"kd" * $"kd" <= $"w", $"kd")
          .otherwise($"kd" - 1))
    terms.agg(count(lit(1)).as("n_cells"),
      sum($"term").as("bc_e6"))
      .withColumn("hellinger2_e6", lit(1000000L) - $"bc_e6")
  }

  /** Page–Hinkley alarm multiplier: flag when the PH statistic
    * exceeds [[PhLambdaMeans]] × the series' mean daily value. */
  val PhLambdaMeans = 5L

  /** Page–Hinkley sequential drift test per metric series (Page 1954;
    * Hinkley 1971) — the ONLINE companion of [[cusumDrift]]: CUSUM
    * locates the best single level-shift in hindsight against the
    * GLOBAL mean; Page–Hinkley accumulates deviations from the
    * RUNNING mean, so its statistic is computable as the stream
    * arrives and alarms at first crossing. Per day i,
    * devᵢ = xᵢ − x̄ᵢ floors to e6 via the sign-split exact division
    * (xᵢ·i − cumᵢ)/i; the PH statistic is
    * max_t (m_t − min_{s≤t} m_s) over the running sum m of those
    * deviations. Alarm day = the first day achieving the max gap;
    * flag when PH > [[PhLambdaMeans]]·mean (cross-multiplied exact).
    * Shape: day-grid windows per type (the rolling_corr shape), one
    * |types|-row rollup. */
  private def pageHinkley(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ord = W.partitionBy($"event_type").orderBy($"day".asc)
    val run = ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val dec = "decimal(38,0)"
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("x"))
      .groupBy($"event_type", $"day").agg(sum($"x").as("x"))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("cum", sum($"x").over(run))
      .withColumn("dev_e6", expr(
        s"""case when cast(x as $dec) * i - cum >= 0
             then cast((cast(x as $dec) * i - cum) * 1000000 div i
                  as bigint)
             else -cast((cum - cast(x as $dec) * i) * 1000000 div i
                  as bigint) end"""))
      .withColumn("m", sum($"dev_e6").over(run))
      .withColumn("rmin", min($"m").over(run))
      .withColumn("gap", $"m" - $"rmin")
      .withColumn("maxgap", max($"gap").over(whole))
      .withColumn("n_days", count(lit(1)).over(whole))
      .withColumn("sum_all", max($"cum").over(whole))
      .filter($"gap" === $"maxgap")
      .groupBy($"event_type")
      .agg(max($"n_days").as("n_days"),
        max($"maxgap").as("ph_max_e6"),
        min($"day").as("alarm_day"),
        max($"sum_all").as("sum_all"))
      .select($"event_type", $"n_days", $"ph_max_e6", $"alarm_day",
        (expr(s"cast(ph_max_e6 as $dec) * n_days") >
          expr(s"cast(sum_all as $dec) * ${PhLambdaMeans} * 1000000"))
          .as("drift_flag"))
  }

  /** CUSUM changepoint locator per metric series — the first-order
    * drift detector that complements q_psi_drift's distributional one:
    * the day maximizing |Σ_{t≤day}(x_t − mean)| is the most likely
    * level-shift point. Kept exactly integer by scaling through n·Σx:
    * cusum'(day) = n_all·cum(day) − rank(day)·sum_all (= n_all² × the
    * usual statistic — same argmax). One window pass per series for
    * the running sum, one TakeOrdered-style max via row_number. */
  private def cusumDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    val scored = daily
      .withColumn("cum", sum($"cents").over(w.rowsBetween(Long.MinValue, 0)))
      .withColumn("rank_day", row_number().over(w).cast("long"))
    val totals = scored.groupBy($"event_type")
      .agg(count(lit(1)).as("n_all"), sum($"cents").as("sum_all"))
    val dev = scored.join(broadcast(totals), Seq("event_type"))
      .withColumn("cusum_scaled",
        $"n_all" * $"cum" - $"rank_day" * $"sum_all")
      .withColumn("abs_cusum", abs($"cusum_scaled"))
    val wMax = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
      .orderBy($"abs_cusum".desc, $"day".asc)
    dev.withColumn("rn", row_number().over(wMax)).filter($"rn" === 1)
      .select($"event_type", $"day".as("changepoint_day"),
        $"rank_day".as("day_index"), $"n_all", $"cusum_scaled",
        $"abs_cusum")
  }

  /** Dataset-profiling manifest — the per-column stats card
    * (row/null/distinct counts, lexicographic min/max) a pipeline
    * publishes with every snapshot. ONE aggregate pass computes every
    * column's measures (not one scan per column); the row-per-column
    * layout comes from exploding an array of structs built from that
    * single row. Values are profiled through their STRING rendering
    * (BIGINT→string is identical in every engine; lexicographic
    * min/max is engine-neutral), so nothing float-formatted leaks
    * into the manifest. */
  private def dataProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority")
    val aggs = cols.flatMap { c =>
      val sc = col(c).cast("string")
      Seq(count(sc).as(s"${c}__nn"),
        countDistinct(sc).as(s"${c}__nd"),
        min(sc).as(s"${c}__mn"),
        max(sc).as(s"${c}__mx"))
    } :+ count(lit(1)).as("__n")
    val one = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        col(s"${c}__nn").as("n_nonnull"), col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_s"), col(s"${c}__mx").as("max_s"))
    }: _*)
    one.select(explode(entries).as("e")).select($"e.*")
  }

  /** Top session paths — the user-journey patterns (event-type
    * sequences within a 10-minute-gap session) ranked by frequency,
    * the input to funnel design. One user-keyed window pass assigns
    * sessions; the path string re-sorts each session's events locally
    * (collect_list + array_sort — bounded by session length, never a
    * second shuffle); path counts collapse map-side. */
  private def sessionPaths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val paths = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("gap_us",
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .withColumn("is_new",
        when($"gap_us".isNull || $"gap_us" > 600L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum($"is_new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .groupBy($"user_id", $"sess")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
        e => e.getField("event_type")), ">").as("path"))
    paths.groupBy($"path").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path".asc)
      .limit(10)
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per event type —
    * the distribution-free complement of the binned PSI monitor (no
    * binning choice to get wrong): the corpus splits into a reference
    * and current sample by event-id parity, values snap to the exact
    * cent grid, and KS = max over thresholds of |ECDF_ref − ECDF_cur|
    * is carried as the cross-multiplied integer pair (ks_num, ks_den =
    * n_ref·n_cur) so the oracle hash is byte-stable — the statistic
    * itself is ks_num / ks_den. Shape: per-(type, value) pre-aggregate
    * collapses ties BEFORE the cumulative window (the window walks
    * distinct values, not rows — the q_eval_auc lesson), then a
    * |types|-row rollup. Two exchanges total at any scale. */
  /** Two-sample ANDERSON–DARLING (the tie-adjusted A²akN of Scholz &
    * Stephens 1987, k = 2) — the tail-weighted member of the
    * [[ksTest]] family: its 1/(F(1−F)) weight makes it the most
    * powerful of the ECDF tests against tail departures, where KS's
    * max-deviation saturates. Everything stays integer on the
    * distinct-cents grid by clearing the midrank halves: with
    * Q = 2B_a = 2·cum − l and P_i = N·(2·cum_i − l_i) − n_i·Q, the
    * j-th inner term (l/N)·(N·M_a − n_i·B_a)²/(B_a(N−B_a) − Nl/4)
    * equals l·P²/D with D = Q(2N−Q) − N·l exactly. Terms have
    * DIFFERENT denominators, so the statistic is emitted as the
    * PER-TERM exact floor sum (each term e6·(N−1)·l·P² div
    * (N²·n_i·D) in decimal(38,0)/HUGEINT — deterministic and
    * engine-identical by construction; the documented discrete
    * variant, like the per-term floors of zipfSlope). Numerator
    * magnitude bounds the headroom at ~30× current volume (10×
    * probed); D = 0 only when one grid value carries ALL mass —
    * guarded. Shape: identical to ksTest — one distinct-value grid,
    * partitioned running windows, one rollup. */
  private def andersonDarling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("c"))
      .select($"event_type", $"r", $"c",
        sum($"r").over(running).as("cum_r"),
        sum($"c").over(running).as("cum_c"),
        sum($"r").over(whole).as("n_ref"),
        sum($"c").over(whole).as("n_cur"))
      .withColumn("l", $"r" + $"c")
      .withColumn("nn", $"n_ref" + $"n_cur")
      .withColumn("q", lit(2L) * ($"cum_r" + $"cum_c") - $"l")
      .withColumn("dden",
        expr("cast(q as decimal(38,0)) * (2 * nn - q)" +
          " - cast(nn as decimal(38,0)) * l"))
      .withColumn("p_ref",
        expr("cast(nn as decimal(38,0)) * (2 * cum_r - r)" +
          " - cast(n_ref as decimal(38,0)) * q"))
      .withColumn("p_cur",
        expr("cast(nn as decimal(38,0)) * (2 * cum_c - c)" +
          " - cast(n_cur as decimal(38,0)) * q"))
      .withColumn("t_ref", when($"dden" > 0, expr(
        "cast(1000000 as decimal(38,0)) * (nn - 1) * l * p_ref * p_ref" +
          " div (cast(nn as decimal(38,0)) * nn * n_ref * dden)"))
        .otherwise(lit(0L)))
      .withColumn("t_cur", when($"dden" > 0, expr(
        "cast(1000000 as decimal(38,0)) * (nn - 1) * l * p_cur * p_cur" +
          " div (cast(nn as decimal(38,0)) * nn * n_cur * dden)"))
        .otherwise(lit(0L)))
      .groupBy($"event_type")
      .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
        count(lit(1)).as("n_grid"),
        sum($"t_ref" + $"t_cur").cast("long").as("a2akn_e6"))
  }

  /** Two-sample KUIPER test — [[ksTest]]'s circular-sensitive
    * sibling: V = D⁺ + D⁻ (max ECDF excess in EACH direction) instead
    * of max |D|, which catches a distribution that has shifted
    * probability out of the middle into BOTH tails — a change whose
    * positive and negative deviations can each stay under the KS
    * radar while their sum does not. Same distinct-cents grid, same
    * integer cross-multiplied ECDFs; the e6 statistic folds in
    * decimal(38,0)/HUGEINT (num·10⁶ wraps int64 past ~100×). */
  private def kuiperTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("c"))
      .select($"event_type",
        sum($"r").over(running).as("cum_r"),
        sum($"c").over(running).as("cum_c"),
        sum($"r").over(whole).as("n_ref"),
        sum($"c").over(whole).as("n_cur"))
      .groupBy($"event_type")
      .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
        greatest(max($"cum_r" * $"n_cur" - $"cum_c" * $"n_ref"),
          lit(0L)).as("dplus_num"),
        greatest(max($"cum_c" * $"n_ref" - $"cum_r" * $"n_cur"),
          lit(0L)).as("dminus_num"))
      .select($"event_type", $"n_ref", $"n_cur",
        $"dplus_num", $"dminus_num",
        expr("cast(cast(dplus_num + dminus_num as decimal(38,0))" +
          " * 1000000 div (cast(n_ref as decimal(38,0)) * n_cur)" +
          " as bigint)").as("v_e6"))
  }

  private def ksTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    // full-partition frame: computed once per partition, O(n)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      // null values carry no ECDF mass, and Spark (NULLS FIRST) vs
      // DuckDB (NULLS LAST) order them differently under ASC — drop
      // them identically on both sides before the cumulative window
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("c"))
      .select($"event_type",
        sum($"r").over(running).as("cum_r"),
        sum($"c").over(running).as("cum_c"),
        sum($"r").over(whole).as("n_ref"),
        sum($"c").over(whole).as("n_cur"))
      .groupBy($"event_type")
      .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
        max(abs($"cum_r" * $"n_cur" - $"cum_c" * $"n_ref")).as("ks_num"),
        max($"n_ref" * $"n_cur").as("ks_den"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample drift test per
    * event type — the rank-based companion to [[ksTest]]: KS is
    * sensitive to any ECDF gap, U specifically to stochastic
    * dominance (one sample tending larger). Same reference/current
    * split (event-id parity), same cent-grid snap. The whole
    * statistic is carried in integers: for a tie group of g values
    * whose predecessors total p, each member's midrank is
    * p + (g+1)/2, so 2·midrank = 2p + g + 1 stays integral, and the
    * emitted pair (u2_ref = 2·U_ref, u2_den = 2·n_ref·n_cur) is the
    * exact rational U/(n_ref·n_cur) — the common-language effect
    * size / AUC. Shape: per-(type,value) pre-aggregate collapses
    * ties BEFORE the cumulative window (walks distinct values, not
    * rows), then a |types|-row rollup — two exchanges at any scale. */
  private def mannWhitney(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cum = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("c"))
      .withColumn("cum_all", sum($"r" + $"c").over(cum))
      .withColumn("prev", $"cum_all" - $"r" - $"c")
      .groupBy($"event_type")
      .agg(sum($"r").as("n_ref"), sum($"c").as("n_cur"),
        sum($"r" * (lit(2L) * $"prev" + $"r" + $"c" + lit(1L)))
          .as("w2_ref"))
      .select($"event_type", $"n_ref", $"n_cur",
        ($"w2_ref" - $"n_ref" * ($"n_ref" + lit(1L))).as("u2_ref"),
        (lit(2L) * $"n_ref" * $"n_cur").as("u2_den"))
  }

  /** Two-sample Cramér–von Mises drift test per event type — the
    * INTEGRATED-square companion completing the ECDF-drift family:
    * [[ksTest]] reacts to the single worst gap, [[mannWhitney]] to
    * stochastic dominance, CvM to accumulated distributional distance
    * (many small gaps a KS sup-norm ignores). Same reference/current
    * event-id-parity split, same cents-grid snap. Evaluating
    * T = (mn/N²)·Σ over all N pooled points of (F_m − G_n)² at each
    * DISTINCT value weighted by its pooled multiplicity g makes the
    * statistic tie-exact and fully integral: with the same scaled gap
    * D = cum_r·n_cur − cum_c·n_ref the KS query uses,
    * T = Σ g·D² / (N²·m·n) — emitted as the exact pair
    * (cvm_num = Σ g·D² in decimal(38,0)/HUGEINT, cvm_den = N²·m·n)
    * plus the e6 fixed-point quotient and the asymptotic 5 % flag
    * (critical value 0.461, Anderson 1962). All comparands
    * nonnegative, so the truncating division is engine-identical.
    * Shape: identical to KS — per-(type,value) pre-aggregate, one
    * cumulative window over DISTINCT values, a |types|-row rollup. */
  private def cvmTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"cents")
      .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("c"))
      .select($"event_type", ($"r" + $"c").as("g"),
        sum($"r").over(running).as("cum_r"),
        sum($"c").over(running).as("cum_c"),
        sum($"r").over(whole).as("n_ref"),
        sum($"c").over(whole).as("n_cur"))
      .groupBy($"event_type")
      // ADVICE r12: the gap itself is computed in decimal(38,0), not
      // int64 — cum_r·n_cur can pass 9.2e18 per event type at scale,
      // where a bare int64 product wraps silently while DuckDB's
      // window sums are HUGEINT and stay exact
      .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
        sum(expr("cast(g as decimal(38,0))" +
          " * (cast(cum_r as decimal(38,0)) * n_cur" +
          "    - cast(cum_c as decimal(38,0)) * n_ref)" +
          " * (cast(cum_r as decimal(38,0)) * n_cur" +
          "    - cast(cum_c as decimal(38,0)) * n_ref)")).as("num_dec"))
      .filter($"n_ref" > 0 && $"n_cur" > 0)
      // num and den individually exceed int64 already at sf0.1 —
      // only the bounded e6 quotient is emitted (the spec replays
      // the internals in BigInt; N²mn bounds T at 1 so the quotient
      // caps at 1e6·N/4-ish, always a comfortable BIGINT)
      .withColumn("den_dec", expr(
        "cast(n_ref + n_cur as decimal(38,0)) * (n_ref + n_cur)" +
          " * n_ref * n_cur"))
      .select($"event_type", $"n_ref", $"n_cur",
        expr("cast(num_dec * 1000000 div den_dec as bigint)")
          .as("cvm_e6"))
      .withColumn("drift_5pct", $"cvm_e6" >= 461000L)
  }

  /** Quantile-positions (percent) [[qte]] reads the effect at. */
  val QtePercents = Seq(25L, 50L, 75L)

  /** Quantile treatment effects — the DISTRIBUTIONAL view the mean
    * contrasts (q_ab_test, q_did, q_iv_wald) cannot give: a treatment
    * can leave the mean still while compressing the tails, and QTE at
    * p25/p50/p75 is where that shows (Koenker–Bassett quantile
    * regression's two-sample special case). Quantiles are EXACT
    * type-1 order statistics, selected without any per-group global
    * sort: purchases pre-aggregate to the (treated, cents) GRID, a
    * cumulative window walks the DISTINCT values of each arm, and the
    * p-quantile is min{v : 100·cum(v) ≥ p·n} — integer comparisons
    * only, no interpolation to diverge. Output: one row per p with
    * both arm quantiles and their gap. Shape: one map-side-combinable
    * rollup + a 2-partition window over the value grid (bounded by
    * the cents grid, not row count). */
  private def qte(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"treated").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"treated")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val arms = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(($"user_id" % 2 === 1).as("treated"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"treated", $"cents")
      .agg(count(lit(1)).as("cnt"))
      .select($"treated", $"cents",
        sum($"cnt").over(running).as("cum"),
        sum($"cnt").over(whole).as("n"))
    val qs = QtePercents.map { p =>
      min(when($"cum" * 100L >= lit(p) * $"n", $"cents")).as(s"q$p")
    }
    val aggCols = max($"n").as("n") +: qs
    val byArm = arms.groupBy($"treated")
      .agg(aggCols.head, aggCols.tail: _*)
    val t = byArm.filter($"treated")
      .select($"n".as("n_treated") +: QtePercents.map(p =>
        col(s"q$p").as(s"q${p}_treated")): _*)
    val c = byArm.filter(!$"treated")
      .select($"n".as("n_control") +: QtePercents.map(p =>
        col(s"q$p").as(s"q${p}_control")): _*)
    val wide = t.crossJoin(broadcast(c))
    // one row per quantile position: (p, treated, control, qte)
    val rows = QtePercents.map { p =>
      struct(lit(p).as("p"), col(s"q${p}_treated").as("q_treated"),
        col(s"q${p}_control").as("q_control"),
        (col(s"q${p}_treated") - col(s"q${p}_control")).as("qte_cents"))
    }
    wide.select($"n_treated", $"n_control",
        explode(array(rows: _*)).as("qrow"))
      .select($"qrow.p", $"n_treated", $"n_control",
        $"qrow.q_treated", $"qrow.q_control", $"qrow.qte_cents")
  }

  /** Dynamic-time-warping distance between every PAIR of event-type
    * daily-revenue series — the alignment-tolerant companion to
    * [[rollingCorr]]: Pearson tracks same-day co-movement, DTW
    * ([[graft.ext.DtwExpr]], Sakoe–Chiba 1978) still matches series
    * whose shapes agree but LAG (a promo that hits clicks on Monday
    * and purchases on Wednesday scores far on correlation, near on
    * DTW). Series are exact day-cents arrays ordered by day
    * (array_sort on (day, cents) structs — deterministic), the DP
    * runs all-integer inside the codegen expression, and the DuckDB
    * oracle replays the identical recurrence with a recursive CTE
    * over rows + a list_reduce fold within each row. Shape: one
    * day rollup, a |types|²-row broadcast pair fan, then O(n·m)
    * integer work per pair INSIDE the scan — no shuffle beyond the
    * rollup, and the arrays are day-bounded at any event volume. */
  private def dtwDistance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val series = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
      .groupBy($"event_type")
      .agg(transform(
        array_sort(collect_list(struct($"day", $"day_cents"))),
        p => p.getField("day_cents")).as("v"))
    val a = series.select($"event_type".as("type_a"), $"v".as("x"))
    val b = series.select($"event_type".as("type_b"), $"v".as("y"))
    a.join(broadcast(b), $"type_a" < $"type_b")
      .select($"type_a", $"type_b",
        size($"x").cast("long").as("n_a"),
        size($"y").cast("long").as("n_b"),
        graft.ext.DtwExpr.dtw($"x", $"y").as("dtw_cents"))
  }

  /** Distribution-free median confidence interval per event type —
    * the UNCERTAINTY companion q_percentiles lacks: the classic
    * order-statistic CI (binomial/sign-test inversion, normal-
    * approximated ranks l = ⌊(n − 1.96√n)/2⌋, u = n + 1 − l) needs
    * NO distributional assumption, just the exact order statistics
    * at two computed ranks. Ranks use the statistic's one libm call
    * (√n on an exact integer — both engines correctly round the
    * same double, and the ⌊·⌋ sits ~√n/2 away from the nearest
    * integer flip for any realistic n); the median and both CI
    * endpoints are then exact type-1 order statistics selected by
    * cumulative counts over the cents grid — the q_qte machinery,
    * no per-type global sort, no interpolation. */
  private def medianCi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"event_type").orderBy($"cents".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    Tables.events(s, d)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"cents")
      .agg(count(lit(1)).as("cnt"))
      .select($"event_type", $"cents",
        sum($"cnt").over(running).as("cum"),
        sum($"cnt").over(whole).as("n"))
      .withColumn("med_rank", expr("(n + 1) div 2"))
      .withColumn("lo_rank", greatest(lit(1L),
        floor(($"n".cast("double") - lit(1.96) *
          sqrt($"n".cast("double"))) / lit(2.0)).cast("long")))
      .withColumn("hi_rank",
        least($"n", $"n" + 1L - $"lo_rank"))
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        max($"med_rank").as("med_rank"),
        max($"lo_rank").as("lo_rank"),
        max($"hi_rank").as("hi_rank"),
        min(when($"cum" >= $"med_rank", $"cents")).as("median_cents"),
        min(when($"cum" >= $"lo_rank", $"cents")).as("ci_lo_cents"),
        min(when($"cum" >= $"hi_rank", $"cents")).as("ci_hi_cents"))
  }

  /** Tail probability denominator for [[varCvar]] (1/20 = 5 %). */
  val VarTailDen = 20L

  /** Historical Value-at-Risk and Conditional VaR (expected
    * shortfall) of day-over-day revenue changes per event type — the
    * tail-risk pair a revenue monitor reads beside
    * [[rollingAnomaly]]'s z-scores: VaR₅ is the exact type-1
    * 5th-percentile of the
    * daily delta distribution (the k-th smallest delta with
    * k = ⌈n/20⌉ — an order statistic, never interpolated), and
    * CVaR₅ = mean of the k deltas at or below it, emitted as the
    * exact pair (tail sum, k) plus the sign-split truncating
    * quotient (engine-identical for the usually-negative tail).
    * Deltas are exact BIGINT cents from a lag window that walks
    * DAYS, not events, and ranks come from a per-type window over
    * the day-bounded delta series — the q_eval_auc shape, so the
    * window input stays ~365 rows per type-year at any event
    * volume. */
  private def varCvar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val byDay = W.partitionBy($"event_type").orderBy($"day".asc)
    val daily = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
      .withColumn("delta",
        $"day_cents" - lag($"day_cents", 1).over(byDay))
      .filter($"delta".isNotNull)
    val ranked = daily
      .withColumn("rn", row_number().over(
        W.partitionBy($"event_type").orderBy($"delta".asc, $"day".asc)))
      .withColumn("n", count(lit(1)).over(
        W.partitionBy($"event_type")))
      .withColumn("k", expr(s"(n + ${VarTailDen - 1}) div $VarTailDen"))
    ranked.filter($"rn" <= $"k")
      .groupBy($"event_type")
      .agg(max($"n").as("n_days"), max($"k").as("k_tail"),
        max(when($"rn" === $"k", $"delta")).as("var_cents"),
        sum($"delta").as("tail_sum_cents"))
      .withColumn("cvar_cents", expr(
        """cast(case when tail_sum_cents >= 0
             then tail_sum_cents div k_tail
             else -((-tail_sum_cents) div k_tail) end as bigint)"""))
  }

  /** How many daily observations the binary-decay EWMA looks back. */
  val EwmaWindow = 16

  /** Exponentially-weighted moving average of daily event volume with
    * a BINARY decay (α = 1/2) — chosen so the whole smoother stays in
    * exact integer arithmetic: over the last [[EwmaWindow]] daily
    * cent-totals (oldest→newest) the left fold acc·2 + x yields
    * Σ xᵢ·2^(k-1-i) and the denominator is 2^k − 1, an exact rational
    * EWMA with zero float drift across engines (the KS/U convention:
    * emit numerator and denominator, plus the integer-division cents
    * value for readability). The fold-over-collected-frame trick
    * works because both engines fold ordered window frames
    * identically when the init contributes zero. One exchange (the
    * daily rollup); the window walks calendar days, not events. */
  private def ewmaBinary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val win = W.partitionBy($"event_type").orderBy($"day".asc)
      .rowsBetween(-(EwmaWindow - 1), 0)
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
      .withColumn("lastk", collect_list($"day_cents").over(win))
      .select($"event_type", $"day", $"day_cents",
        size($"lastk").cast("long").as("n_window"),
        aggregate($"lastk", lit(0L), (acc, x) => acc * 2 + x)
          .as("ewma_num"),
        (expr(s"shiftleft(1L, size(lastk))") - lit(1L)).as("ewma_den"))
      .withColumn("ewma_cents", expr("ewma_num div ewma_den"))
  }

  /** How many daily observations the Holt smoother looks back. */
  val HoltWindow = 8

  /** Holt LINEAR (level + trend) exponential smoothing of daily event
    * volume with α = 1/2, β = 1/4 — the trend-aware upgrade of
    * [[ewmaBinary]], chosen so the coupled recursion stays in EXACT
    * RATIONAL arithmetic: representing (level, trend) at step t as
    * integers (L, B) over the common denominator D = 8^(t−1), the
    * updates are the integer recurrences
    *   L' = 4·(D·x + L + B),  B' = D·x − L + 7·B,  D' = 8·D
    * (derived from l' = (x + l + b)/2 and b' = (l'−l)/4 + 3b/4), and
    * the one-step-ahead forecast is the exact rational (L+B)/D. The
    * fold runs over the ordered [[HoltWindow]]-day frame via a struct
    * accumulator — Spark `aggregate`, DuckDB `list_reduce` over a
    * struct-wrapped list, both folding the identical integer
    * recurrence, so numerator and denominator match bit-for-bit. The
    * readability forecast_cents divides through floor(double) — the
    * numerator can exceed 2^53 at extreme day totals, where the
    * division is still DETERMINISTIC (identical doubles both
    * engines), just not exact; the emitted num/den pair stays exact
    * always. Same shape as the EWMA: one daily-rollup exchange, the
    * window walks calendar days. */
  /** OLS influence diagnostics per (type, day) — the regression
    * HEALTH view q_ridge_trend/q_group_ols lack: WHICH days drive the
    * daily-revenue-on-time fit? Per type, leverage
    * hᵢ = 1/n + (xᵢ−x̄)²/Σ(x−x̄)² clears its denominators exactly via
    * the n-scaled zᵢ = n·xᵢ − Σx:
    * h_e6 = 10⁶·(Σz² + n·zᵢ²) div (n·Σz²); the residual clears the
    * slope/intercept fractions to the single exact numerator
    * Eᵢ = n·B_d·yᵢ − Sy·B_d + B_n·Sx − n·B_n·xᵢ over n·B_d
    * (B_n = nΣxy − SxSy, B_d = nΣx² − Sx²), emitted e2. Both flags
    * are FULLY cross-multiplied integer comparisons: high leverage
    * hᵢ > 2p/n = 4/n ⟺ n·zᵢ² > 3Σz², outlier |eᵢ| > 2s ⟺
    * (n−2)·Eᵢ² > 4·ΣEⱼ² (s² = SSE/(n−2), the common (nB_d)² cancels).
    * Shape: day-grid windows per type — calendar-bounded. */
  private def olsInfluence(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val dec = "decimal(38,0)"
    Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .groupBy($"event_type", $"day").agg(sum($"y").as("y"))
      .withColumn("x",
        datediff($"day", lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("sx", sum($"x").over(whole))
      .withColumn("sy", sum($"y").over(whole))
      .withColumn("sxx", sum($"x" * $"x").over(whole))
      .withColumn("sxy", sum(expr(s"cast(x as $dec) * y")).over(whole))
      .filter($"n" > 2)
      .withColumn("z", expr(s"cast(n as $dec) * x - sx"))
      .withColumn("sz2", sum(expr("z * z")).over(whole))
      .withColumn("bn",
        expr(s"cast(n as $dec) * sxy - cast(sx as $dec) * sy"))
      .withColumn("bd",
        expr(s"cast(n as $dec) * sxx - cast(sx as $dec) * sx"))
      .filter($"bd" > 0 && $"sz2" > 0)
      .withColumn("ei", expr(
        s"cast(n as $dec) * bd * y - cast(sy as $dec) * bd" +
          s" + bn * sx - cast(n as $dec) * bn * x"))
      .withColumn("se2", sum(expr("ei * ei")).over(whole))
      .select($"event_type", $"day",
        expr(s"cast(1000000 * (sz2 + cast(n as $dec) * z * z)" +
          s" div (cast(n as $dec) * sz2) as bigint)").as("leverage_e6"),
        expr(s"""cast(case when ei >= 0
            then ei * 100 div (cast(n as $dec) * bd)
            else -((-ei) * 100 div (cast(n as $dec) * bd)) end
          as bigint)""").as("resid_e2"),
        (expr(s"cast(n as $dec) * z * z") > expr("3 * sz2"))
          .as("high_leverage"),
        (expr(s"(cast(n as $dec) - 2) * ei * ei") > expr("4 * se2"))
          .as("outlier"))
  }

  /** Croston EWMA denominator: α = 1/[[CrostonAlphaInv]]. */
  val CrostonAlphaInv = 8L

  /** Croston's method (1972) per customer — the forecaster for
    * INTERMITTENT series that [[holtLinear]]/q_ar2_forecast (built
    * for dense daily series) mis-handle: most customers order on a
    * few scattered days, so Croston smooths the order SIZES and the
    * INTER-ORDER intervals separately and forecasts their ratio as a
    * demand rate. All integer: sizes/gaps live on the e3 grid, both
    * EWMAs use α = 1/8 with the sign-split truncating step
    * z' = z + (v·10³ − z) div 8 (engine-identical), the fold runs
    * inside ONE `aggregate` over the customer's ordered order array
    * — state and elements both encoded as `array<long>` ([z, p,
    * last_day, i] / [day, cents, 0, 0]) so Spark's lambda and
    * DuckDB's list_reduce unify on the same type (the DTW-oracle
    * encoding). Customers need ≥ 3 orders (one real EWMA step on the
    * gap). Shape: one per-customer rollup, folds scan-local and
    * bounded by per-customer order count. */
  private def croston(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = CrostonAlphaInv
    val upd = // sign-split EWMA step on the e3 grid
      (cur: String, tgt: String) =>
        s"""case when $tgt - $cur >= 0
             then $cur + ($tgt - $cur) div $a
             else $cur - (($cur - $tgt) div $a) end"""
    val orders = Tables.orders(s, d)
      .select($"o_custkey",
        array(
          datediff(to_date($"o_orderdate"),
            lit("1970-01-01").cast("date")).cast("long"),
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"),
          lit(0L), lit(0L)).as("o"))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sort_array(collect_list($"o")).as("os"))
      .filter($"n_orders" >= 3)
    orders.select($"o_custkey", $"n_orders",
      expr(s"""aggregate(os,
          array(0L, 0L, -1L, 0L),
          (acc, o) -> array(
            case when element_at(acc, 4) = 0
                 then element_at(o, 2) * 1000
                 else ${upd("element_at(acc, 1)",
                            "element_at(o, 2) * 1000")} end,
            case when element_at(acc, 4) = 0 then 0L
                 when element_at(acc, 4) = 1
                 then (element_at(o, 1) - element_at(acc, 3)) * 1000
                 else ${upd("element_at(acc, 2)",
                   "(element_at(o, 1) - element_at(acc, 3)) * 1000")}
                 end,
            element_at(o, 1),
            element_at(acc, 4) + 1))""").as("st"))
      .select($"o_custkey", $"n_orders",
        expr("element_at(st, 1)").as("z_e3"),
        expr("element_at(st, 2)").as("p_e3"))
      .withColumn("croston_rate_e3",
        when($"p_e3" > 0, expr("z_e3 * 1000 div p_e3"))
          .otherwise(lit(-1L)))
  }

  private def crostonOracle: String = {
    val a = CrostonAlphaInv
    def upd(cur: String, tgt: String): String =
      s"""CASE WHEN $tgt - $cur >= 0
           THEN $cur + ($tgt - $cur) // $a
           ELSE $cur - (($cur - $tgt) // $a) END"""
    s"""
      WITH o AS (SELECT o_custkey,
                        [CAST(o_orderdate AS DATE) - DATE '1970-01-01',
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT),
                         0, 0] AS o
                 FROM orders),
      g AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                   list_sort(list(o)) AS os
            FROM o GROUP BY 1 HAVING count(*) >= 3),
      f AS (SELECT o_custkey, n_orders,
              list_reduce(
                list_prepend(
                  [CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(-1 AS BIGINT), CAST(0 AS BIGINT)], os),
                (acc, o) -> [
                  CASE WHEN acc[4] = 0 THEN o[2] * 1000
                       ELSE ${upd("acc[1]", "o[2] * 1000")} END,
                  CASE WHEN acc[4] = 0 THEN 0
                       WHEN acc[4] = 1 THEN (o[1] - acc[3]) * 1000
                       ELSE ${upd("acc[2]",
                         "(o[1] - acc[3]) * 1000")} END,
                  o[1],
                  acc[4] + 1]) AS st
            FROM g)
      SELECT o_custkey, n_orders,
             CAST(st[1] AS BIGINT) AS z_e3,
             CAST(st[2] AS BIGINT) AS p_e3,
             CAST(CASE WHEN st[2] > 0 THEN st[1] * 1000 // st[2]
                       ELSE -1 END AS BIGINT) AS croston_rate_e3
      FROM f"""
  }

  private def holtLinear(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val win = W.partitionBy($"event_type").orderBy($"day".asc)
      .rowsBetween(-(HoltWindow - 1), 0)
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
      .withColumn("lastk", collect_list($"day_cents").over(win))
      .withColumn("st", expr("""
        aggregate(
          slice(lastk, 2, size(lastk) - 1),
          named_struct('l', element_at(lastk, 1), 'b', CAST(0 AS BIGINT),
                       'd', CAST(1 AS BIGINT)),
          (acc, x) -> named_struct(
            'l', 4 * (acc.d * x + acc.l + acc.b),
            'b', acc.d * x - acc.l + 7 * acc.b,
            'd', 8 * acc.d))"""))
      .select($"event_type", $"day", $"day_cents",
        size($"lastk").cast("long").as("n_window"),
        ($"st.l" + $"st.b").as("forecast_num"),
        $"st.d".as("forecast_den"),
        floor(($"st.l" + $"st.b").cast("double") / $"st.d")
          .as("forecast_cents"))
  }

  /** DuckDB replay of [[holtLinear]], generated UNROLLED: DuckDB
    * 1.0's `list_reduce` with a struct accumulator mis-resolves
    * accumulator fields from the second step on (probe:
    * `list_reduce(list_transform([10,20,30], x -> {'a':x,'b':0}),
    * (acc,e) -> {'a': acc.a+100, 'b': acc.a})` returns b=210 — the
    * NEW a — where left-fold old-value semantics require 110), so a
    * coupled two-variable recursion cannot ride a struct fold there.
    * Instead the k−1 fold steps are emitted as chained CTEs, each
    * SELECT computing (l', b', d') from the PREVIOUS step's columns
    * — plain SQL column references with unambiguous old-value
    * semantics (the unrolled-iteration pattern the PageRank/HITS
    * oracles established). Rows with fewer than i frame elements
    * pass through step i unchanged. */
  private def holtOracle: String = {
    val steps = (2 to HoltWindow).map { i =>
      s"""s$i AS (SELECT event_type, day, day_cents, lastk,
           CASE WHEN len(lastk) >= $i
                THEN 4 * (d * lastk[$i] + l + b) ELSE l END AS l,
           CASE WHEN len(lastk) >= $i
                THEN d * lastk[$i] - l + 7 * b ELSE b END AS b,
           CASE WHEN len(lastk) >= $i THEN 8 * d ELSE d END AS d
         FROM s${i - 1})"""
    }.mkString(",\n      ")
    s"""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      dly AS (SELECT event_type, day,
                     CAST(sum(cents) AS BIGINT) AS day_cents
              FROM e GROUP BY 1, 2),
      w AS (SELECT event_type, day, day_cents,
                   list(day_cents) OVER (PARTITION BY event_type
                     ORDER BY day ASC
                     ROWS BETWEEN ${HoltWindow - 1} PRECEDING
                       AND CURRENT ROW) AS lastk
            FROM dly),
      s1 AS (SELECT event_type, day, day_cents, lastk,
                    CAST(lastk[1] AS BIGINT) AS l,
                    CAST(0 AS BIGINT) AS b,
                    CAST(1 AS BIGINT) AS d
             FROM w),
      $steps
      SELECT event_type, day, day_cents,
             CAST(len(lastk) AS BIGINT) AS n_window,
             CAST(l + b AS BIGINT) AS forecast_num,
             CAST(d AS BIGINT) AS forecast_den,
             CAST(floor(CAST(l + b AS DOUBLE) / d) AS BIGINT)
               AS forecast_cents
      FROM s$HoltWindow"""
  }

  /** Rolling window size (days) for [[rollingCorr]]. */
  val RollCorrWindow = 7

  /** Descending bit ladder for the integer binary search in
    * [[rollingCorr]]: 2¹¹ = 2048 covers the whole |corr_e3| range
    * [0, 1000] (Cauchy–Schwarz bounds |num·10³/√(vx·vy)| at 1000, so
    * the greedy descent can never climb past 1000 — every probe above
    * it fails its integer comparison). */
  private val CorrSearchBits =
    Seq(1024L, 512L, 256L, 128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)

  /** Shared moments pipeline for [[rollingCorr]] and its bisection
    * twin q_rolling_moments: per-(type_a, type_b) 7-day rolling
    * integer moment sums over the daily-cents series, through the
    * centered combinations num = n·Σxy − Σx·Σy, vx, vy. All exact
    * BIGINT cents — no floating point anywhere. Shape: one
    * groupBy(type, day) pre-aggregate (map-side combinable), a
    * day-equi self-join that fans the DAY-cardinality table to its
    * 10 type pairs, then a window PARTITIONED BY PAIR — parallel
    * across pairs, and the frame walks days, not events (the
    * q_eval_auc lesson), so the window input is ~365 rows per
    * pair-year at ANY event volume. */
  private def rollingMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val win = W.partitionBy($"type_a", $"type_b").orderBy($"day".asc)
      .rowsBetween(-(RollCorrWindow - 1), 0)
    val daily = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
    val a = daily.select($"event_type".as("type_a"), $"day",
      $"day_cents".as("x"))
    val b = daily.select($"event_type".as("type_b"), $"day",
      $"day_cents".as("y"))
    a.join(b, Seq("day")).filter($"type_a" < $"type_b")
      .select($"type_a", $"type_b", $"day", $"x", $"y",
        count(lit(1)).over(win).as("n_w"),
        sum($"x").over(win).as("sx"),
        sum($"y").over(win).as("sy"),
        sum($"x" * $"y").over(win).as("sxy"),
        sum($"x" * $"x").over(win).as("sxx"),
        sum($"y" * $"y").over(win).as("syy"))
      .select($"type_a", $"type_b", $"day", $"x", $"y", $"n_w",
        ($"n_w" * $"sxy" - $"sx" * $"sy").as("num"),
        ($"n_w" * $"sxx" - $"sx" * $"sx").as("vx"),
        ($"n_w" * $"syy" - $"sy" * $"sy").as("vy"))
  }

  /** Rolling inter-series correlation — the co-movement monitor
    * between every PAIR of event-type daily-revenue series: a 7-day
    * rolling Pearson correlation per (type_a, type_b) pair, the
    * leading-indicator / decoupling detector that complements
    * [[corrMoments]] (global, between columns of one row) with a
    * time-LOCAL statistic between two SERIES. Moments come from
    * [[rollingMoments]] (exact BIGINT cents); `corr_e3` =
    * ⌊num·10³/√(vx·vy)⌋ is then computed with NO sqrt, NO floor and
    * NO double on either engine: an 11-step unrolled greedy bit
    * descent finds k = ⌊|num|·10³/√p⌋ (each step one integer
    * comparison (t+b)²·p ≤ num²·10⁶, exact in decimal(38,0) /
    * HUGEINT), and the negative side uses the identity
    * ⌊−q⌋ = −k when q = k exactly (k²·p = num²·10⁶), else −(k+1).
    * Degenerate windows (n_w = 1 or zero variance) emit the sentinel
    * −2000 with `corr_defined` = 0 instead of NULL, so the measure
    * column is non-nullable end to end — no engine, version, or
    * dataframe dtype coercion (int64-with-nulls → float64) can
    * perturb the comparison. Comparand bound: |m| ≤ 2047 so
    * m²·p ≤ 4.2e6·p; exact while p = vx·vy < ~2.4e31 (sf ≤ 1 by a
    * wide margin; num²·10⁶ ≤ p·10⁶ by Cauchy–Schwarz). */
  private def rollingCorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val base = rollingMoments(s, d)
      .withColumn("pp", $"vx".cast(dec) * $"vy".cast(dec))
      .withColumn("a2",
        abs($"num").cast(dec) * abs($"num").cast(dec) * lit(1000000L))
    // greedy bit descent: after the fold, t = max{m ≥ 0 : m²·pp ≤ a2}
    // = ⌊|num|·10³/√pp⌋ (each withColumn is its own Project;
    // CollapseProject keeps the non-cheap CASE producers un-inlined,
    // so plan size stays linear in the 11 steps)
    val searched = CorrSearchBits.foldLeft(base.withColumn("t", lit(0L))) {
      (df, b) =>
        df.withColumn("t",
          when(($"t" + b).cast(dec) * ($"t" + b).cast(dec) * $"pp" <= $"a2",
            $"t" + b).otherwise($"t"))
    }
    searched
      .withColumn("corr_defined",
        when($"vx" > 0 && $"vy" > 0, 1L).otherwise(0L))
      .withColumn("corr_e3",
        when($"corr_defined" === 0, lit(-2000L))
          .when($"num" >= 0, $"t")
          .when($"t".cast(dec) * $"t".cast(dec) * $"pp" === $"a2", -$"t")
          .otherwise(-($"t" + 1)))
      .select($"type_a", $"type_b", $"day", $"x", $"y", $"n_w",
        $"num", $"vx", $"vy", $"corr_defined", $"corr_e3")
  }

  /** Exact ⌊num·scale/√p⌋ — engine-independent by construction.
    * A double gives the CANDIDATE k (always within ±1 of the true
    * floor: a few ULPs of pipeline rounding are ≪1 grid cell); the
    * candidate is then CORRECTED with pure integer comparisons:
    * for p > 0, m ≤ num·scale/√p ⟺ sign-split m²·p vs num²·scale²,
    * both exact in decimal(38,0) (the oracle side uses HUGEINT; the
    * caller is responsible for num²·scale² and k²·p fitting 38
    * digits). This kills the round-9/round-10 red row for good:
    * whenever the TRUE quotient lands exactly ON the floor grid
    * (e.g. |corr| = 1 on collinear windows, or R/S over a
    * perfect-square variance), a 1-ULP disagreement between two IEEE
    * pipelines flips a plain ⌊·⌋ by one — no grid or rounding
    * convention fixes a tie the data genuinely produces, only exact
    * arithmetic does. */
  def exactFloorDivSqrt(num: Column, p: Column, scale: Long): Column = {
    val dec = "decimal(38,0)"
    val a2 = num.cast(dec) * num.cast(dec) * lit(scale * scale)
    // m ≤ num·scale/√p, decided exactly in integers
    def leq(m: Column): Column = {
      val m2p = m.cast(dec) * m.cast(dec) * p.cast(dec)
      when(num >= 0 && m <= 0, lit(true))
        .when(num < 0 && m >= 0, lit(false))
        .when(num >= 0, m2p <= a2) // both sides positive
        .otherwise(m2p >= a2)      // both sides negative
    }
    val kd = floor(num.cast("double") * lit(scale.toDouble) /
      sqrt(p.cast("double")))
    when(leq(kd + 1), kd + 1).when(leq(kd), kd).otherwise(kd - 1)
  }

  /** Mahalanobis outlier screen over the per-user (spend, activity)
    * plane — the MULTIVARIATE upgrade of q_outlier_iqr (per-column
    * fences miss points that are unremarkable on each axis but
    * jointly impossible, e.g. huge spend with two events). Both
    * features first snap to the shared e4 z-grid (bounded at any
    * volume), then the 2×2 covariance inverts in CLOSED FORM and the
    * whole quadratic d² = (dx,dy)·Σ⁻¹·(dx,dy)ᵀ reduces to the single
    * exact rational Q/det with Q = B·dxn² − 2C·dxn·dyn + A·dyn² over
    * the n-scaled centered moments (population covariance, so the n
    * powers cancel exactly; every term fits DECIMAL(38,0)/HUGEINT at
    * the grid bound). Emitted as md2_e3 = Q·1000 div det plus the
    * χ²₂(0.999) flag md2_e3 ≥ 13816 — integers end to end, no
    * sqrt, no engine can diverge. Shape: one user rollup, one
    * broadcast 1-row moment table, one scan over users. */
  private def mahalanobis2d(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, d)
      .select($"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"user_id")
      .agg(coalesce(sum($"cents"), lit(0L)).as("spend"),
        count(lit(1)).as("n_ev"))
    val tot = users.agg(count(lit(1)).as("n"),
      sum($"spend").as("ssp"), min($"spend").as("mnsp"),
      max($"spend").as("mxsp"),
      sum($"n_ev").as("sev"), min($"n_ev").as("mnev"),
      max($"n_ev").as("mxev"))
    val z = users.crossJoin(broadcast(tot))
      .filter($"mxsp" > $"mnsp" && $"mxev" > $"mnev")
      .select($"user_id",
        floor(($"n" * $"spend" - $"ssp").cast("double") * lit(10000.0) /
          ($"n" * ($"mxsp" - $"mnsp"))).as("zx"),
        floor(($"n" * $"n_ev" - $"sev").cast("double") * lit(10000.0) /
          ($"n" * ($"mxev" - $"mnev"))).as("zy"))
    val m = z.agg(count(lit(1)).as("n"),
      sum($"zx").as("sx"), sum($"zy").as("sy"),
      sum($"zx" * $"zx").as("sxx"), sum($"zy" * $"zy").as("syy"),
      sum($"zx" * $"zy").as("sxy"))
    z.crossJoin(broadcast(m))
      .select($"user_id", $"zx", $"zy",
        ($"n" * $"sxx" - $"sx" * $"sx").as("a_c"),
        ($"n" * $"syy" - $"sy" * $"sy").as("b_c"),
        ($"n" * $"sxy" - $"sx" * $"sy").as("c_c"),
        ($"n" * $"zx" - $"sx").as("dxn"),
        ($"n" * $"zy" - $"sy").as("dyn"))
      .withColumn("det", expr(
        "CAST(a_c AS DECIMAL(38,0)) * b_c" +
          " - CAST(c_c AS DECIMAL(38,0)) * c_c"))
      .filter($"det" > 0)
      .withColumn("q_num", expr(
        "CAST(b_c AS DECIMAL(38,0)) * dxn * dxn" +
          " - 2 * CAST(c_c AS DECIMAL(38,0)) * dxn * dyn" +
          " + CAST(a_c AS DECIMAL(38,0)) * dyn * dyn"))
      .withColumn("md2_e3",
        expr("CAST(q_num * 1000 div det AS BIGINT)"))
      .withColumn("outlier", $"md2_e3" >= 13816L)
      .select($"user_id", $"zx", $"zy", $"md2_e3", $"outlier")
  }

  /** Generalized-Pareto tail fit via probability-weighted moments
    * (Hosking/Wallis 1987) — the peaks-over-threshold model behind
    * tail-latency SLAs and loss-severity curves: how heavy is the
    * tail ABOVE the 90th percentile, per event type? PWM beats ML
    * here because both estimators collapse to EXACT RATIONALS of two
    * order-statistic sums: with exceedances y₍ᵢ₎ sorted ascending,
    * S = Σy and M = Σ(i−1)·y₍ᵢ₎, the PWM a₁ = E[Y·(1−F)] satisfies
    * n(n−1)·a₁ = S(n−1) − M, giving
    * ξ = 2 − S(n−1)/(2M − S(n−1)) and
    * σ = 2S(S(n−1) − M)/(n(2M − S(n−1))) —
    * emitted as single integer divisions over DECIMAL(38,0)/HUGEINT,
    * no libm anywhere. The rank weights (i−1) are TIE-INVARIANT
    * (equal values commute under any tiebreak), so row_number with
    * an id tiebreak is deterministic AND order-canonical. The
    * threshold is the exact ⌈0.9n⌉-th order statistic, never an
    * interpolated percentile. ξ > 0 ⇒ heavy (Pareto-like) tail;
    * ξ < 0 ⇒ bounded. Shape: two rank windows per type partition
    * (events-cardinality but per-series parallel), one combinable
    * aggregate. */
  private def gpdTail(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
    val byVal = W.partitionBy($"event_type")
      .orderBy($"cents".asc, $"event_id".asc)
    val ranked = ev
      .withColumn("r", row_number().over(byVal).cast("long"))
      .withColumn("n_tot", count(lit(1))
        .over(W.partitionBy($"event_type")))
    // ceil(0.9n) in integers: double 0.9 rounds ABOVE 9/10, so
    // ceil(0.9*10.0) is 10, not 9 — (9n+9) div 10 is the exact form
    val thresh = ranked
      .filter($"r" === expr("(9 * n_tot + 9) div 10"))
      .select($"event_type", $"cents".as("u_cents"))
    val exc = ev.join(broadcast(thresh), "event_type")
      .filter($"cents" > $"u_cents")
      .select($"event_type", $"event_id", $"u_cents",
        ($"cents" - $"u_cents").as("y"))
      .withColumn("i", row_number().over(W.partitionBy($"event_type")
        .orderBy($"y".asc, $"event_id".asc)).cast("long"))
    exc.groupBy($"event_type")
      .agg(max($"u_cents").as("u_cents"),
        count(lit(1)).as("n_exceed"),
        sum($"y").as("s_sum"),
        sum(($"i" - 1L) * $"y").as("m_weighted"))
      .filter($"n_exceed" >= 8)
      .withColumn("den", expr(
        "2 * CAST(m_weighted AS DECIMAL(38,0))" +
          " - CAST(s_sum AS DECIMAL(38,0)) * (n_exceed - 1)"))
      .filter($"den" =!= 0)
      .withColumn("xi_e6", expr(
        "2000000 - CAST(CAST(s_sum AS DECIMAL(38,0)) * (n_exceed - 1)" +
          " * 1000000 div den AS BIGINT)"))
      .withColumn("sigma_e3", expr(
        "CAST(2 * CAST(s_sum AS DECIMAL(38,0))" +
          " * (CAST(s_sum AS DECIMAL(38,0)) * (n_exceed - 1)" +
          "    - m_weighted) * 1000" +
          " div (n_exceed * den) AS BIGINT)"))
      .withColumn("heavy_tail", $"xi_e6" > 0)
      .select($"event_type", $"u_cents", $"n_exceed", $"s_sum",
        $"m_weighted", $"xi_e6", $"sigma_e3", $"heavy_tail")
  }

  /** Theil-T inequality with within/between decomposition — what
    * q_gini_revenue cannot do: Theil is the inequality measure that
    * DECOMPOSES additively by group (nations here, over supplier
    * revenue), separating "suppliers unequal inside their nation"
    * from "nations unequal among themselves" — the first question a
    * marketplace-concentration review asks. Per nation the exact
    * integer moments are n_g, rev_g, and S_g = Σ⌊x·ln x/10³⌋ over
    * supplier revenues x (floor-then-sum per SUPPLIER, order-
    * independent). The grid is deliberately COARSE — x·ln x ≈ 3e14
    * at sf0.1, where libm's 1-ULP ln disagreement between JVM and
    * DuckDB is ~0.1 absolute, so a fine grid flips floors (measured:
    * the e-3 grid hash-failed with ±2 in the sum); dividing by 10³
    * puts the flip margin ~6 orders away while costing 3e-9 relative
    * precision on T; T_g and the between/within terms are short
    * identical double trees over those BIGINTs, floored e6:
    * T_g = ΣxLnx/rev_g − ln(rev_g/n_g), weight w_g = rev_g/rev,
    * between = Σ w_g·ln((rev_g/n_g)/(rev/n)). The spec recomputes
    * the UNFLOORED identity T = Σw_g·T_g + T_between to float
    * precision and bounds the floored columns against it. Shape: a
    * supplier rollup, a nation rollup, one broadcast totals row. */
  private def theilDecomposition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bySupp = Tables.lineitem(s, d)
      .select($"l_suppkey",
        (($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long") *
          (lit(100L) - ($"l_discount".cast("decimal(3,2)") * 100)
            .cast("long"))).as("rev_e4"))
      .groupBy($"l_suppkey")
      .agg(sum($"rev_e4").as("x"))
      .filter($"x" > 0)
      .join(broadcast(Tables.supplier(s, d)
        .select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
    val byNation = bySupp.groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_g"), sum($"x").as("rev_g"),
        sum(floor($"x".cast("double") * log($"x".cast("double"))
          / lit(1e3)).cast("long")).as("sxlnx_m3"))
    val tot = byNation.agg(sum($"n_g").as("n_all"),
      sum($"rev_g").as("rev_all"))
    byNation.crossJoin(broadcast(tot))
      .withColumn("t_within_e6",
        floor(($"sxlnx_m3".cast("double") * lit(1e3) / $"rev_g"
          - log($"rev_g".cast("double") / $"n_g")) * lit(1e6))
          .cast("long"))
      .withColumn("between_term_e6",
        floor($"rev_g".cast("double") / $"rev_all"
          * log(($"rev_g".cast("double") / $"n_g") /
            ($"rev_all".cast("double") / $"n_all")) * lit(1e6))
          .cast("long"))
      .select($"nationkey", $"n_g", $"rev_g", $"sxlnx_m3",
        $"t_within_e6", $"between_term_e6")
  }

  /** Post-stratification adjustment — the Simpson's-paradox guard for
    * period-over-period KPIs: the raw current-period mean moves when
    * the SEGMENT MIX moves, even if every segment is flat, so the
    * adjusted mean re-weights current per-segment means by the
    * REFERENCE period's composition: adj = Σ (n_ref_g/n_ref)·(S_g/n_g).
    * Periods split on the integer midpoint day; segments are market
    * segments via the customer dim on purchases... here user_id % 5
    * cohorts (events carry no dim). All cell moments are exact; the
    * adjusted mean assembles in double from those integers (per-
    * segment denominators differ, so no common-denominator rational
    * exists below ~n⁵) and floors e2-cents. Output carries raw vs
    * adjusted so the composition effect = raw − adjusted is the
    * actionable number. */
  private def postStratified(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, d)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(($"user_id" % 5).as("seg"),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cut = base.agg(expr("(min(dayn) + max(dayn)) div 2").as("cut"))
    val cells = base.crossJoin(broadcast(cut))
      .groupBy($"seg")
      .agg(sum(when($"dayn" <= $"cut", 1L).otherwise(0L)).as("n_ref"),
        sum(when($"dayn" > $"cut", 1L).otherwise(0L)).as("n_cur"),
        sum(when($"dayn" > $"cut", $"cents").otherwise(0L)).as("s_cur"))
      .filter($"n_ref" > 0 && $"n_cur" > 0)
    val tot = cells.agg(sum($"n_ref").as("nr_all"),
      sum($"n_cur").as("nc_all"), sum($"s_cur").as("sc_all"))
    cells.crossJoin(broadcast(tot))
      .withColumn("term_e2",
        floor($"n_ref".cast("double") / $"nr_all" *
          ($"s_cur".cast("double") / $"n_cur") * lit(100.0))
          .cast("long"))
      .groupBy($"nr_all", $"nc_all", $"sc_all")
      .agg(count(lit(1)).as("n_segments"),
        sum($"term_e2").as("adjusted_mean_e2"))
      .withColumn("raw_mean_e2",
        expr("CAST(sc_all AS DECIMAL(38,0)) * 100 div nc_all"))
      .withColumn("mix_effect_e2", $"raw_mean_e2" - $"adjusted_mean_e2")
      .select($"n_segments", $"nr_all", $"nc_all", $"sc_all",
        $"raw_mean_e2", $"adjusted_mean_e2", $"mix_effect_e2")
  }

  /** Block sizes for the [[hurstRs]] rescaled-range ladder — dyadic so
    * the log-log regression collapses to one closed-form difference. */
  val HurstBlocks = Seq(4L, 8L, 16L)

  /** Hurst exponent via rescaled-range (R/S) analysis per event-type
    * daily series — the long-memory detector: H ≈ 0.5 means diffusive
    * (independent increments), H > 0.5 trending/persistent, H < 0.5
    * mean-reverting; the number a capacity planner checks before
    * trusting √t-scaling of aggregated load. Per dyadic block size
    * m ∈ [[HurstBlocks]]: full blocks of m consecutive days, per-block
    * cumulative demeaned deviations dev_j = m·Σ_{i≤j}x_i − j·S_block
    * (EXACT integers — the m-scaling clears the mean's denominator),
    * R_num = max dev − min dev, S²·m² = m·Σx² − S² (exact), and the
    * rescaled range R/S = R_num/√(m·Σx²−S²) lands on the e6 grid via
    * [[exactFloorDivSqrt]] — the tie-proof floor, because a
    * perfect-square block variance puts the quotient exactly ON the
    * grid. With the dyadic ladder the log-log slope collapses to
    * H = log₂(R̄S₁₆/R̄S₄)/2: ONE ln over one rational of exact
    * integers (block-count cross-multiplied), floored e6 — the whole
    * statistic touches libm exactly once. Shape: per-type rank
    * window on the calendar-bounded daily table, one combinable
    * rollup per block size. */
  private def hurstRs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val daily = graft.GraftCaches.getOrPersist(s, s"stats.hurst:$d") {
      dailyCentsLocal(s, d)
        .withColumn("rn", row_number().over(W.partitionBy($"event_type")
          .orderBy($"day".asc)).cast("long"))
    }
    val out = HurstBlocks.map(m => perBlock(s, daily, m)).reduce(
      _ unionByName _)
    val piv = out.groupBy($"event_type")
      .pivot("m", HurstBlocks.map(_.toString))
      .agg(first($"sum_rs_e6").as("rs"), first($"n_blocks").as("nb"))
    piv.filter($"4_rs".isNotNull && $"8_rs".isNotNull &&
        $"16_rs".isNotNull && $"4_rs" > 0 && $"16_rs" > 0)
      .select($"event_type",
        $"4_rs".as("rs4_sum"), $"4_nb".as("n4"),
        $"8_rs".as("rs8_sum"), $"8_nb".as("n8"),
        $"16_rs".as("rs16_sum"), $"16_nb".as("n16"))
      .withColumn("h_e6",
        floor(log(($"rs16_sum" * $"n4").cast("double") /
            ($"rs4_sum" * $"n16").cast("double")) /
          lit(2.0 * math.log(2.0)) * lit(1000000.0)).cast("long"))
  }

  /** One block-size level of [[hurstRs]]: full m-day blocks → exact
    * integer R and S² forms → tie-proof e6 rescaled range. */
  private def perBlock(s: SparkSession, daily: DataFrame,
      m: Long): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val wBlk = W.partitionBy($"event_type", $"blk")
    val cum = wBlk.orderBy($"rn".asc)
      .rowsBetween(W.unboundedPreceding, 0)
    daily
      .withColumn("blk", expr(s"(rn - 1) div $m"))
      .withColumn("j", ($"rn" - 1) % m + 1)
      .withColumn("cs", sum($"cents").over(cum))
      .withColumn("sb", sum($"cents").over(wBlk))
      .withColumn("dev", lit(m) * $"cs" - $"j" * $"sb")
      .groupBy($"event_type", $"blk")
      .agg(count(lit(1)).as("cnt"), max($"sb").as("sbv"),
        sum($"cents".cast("decimal(38,0)") * $"cents").as("qb"),
        max($"dev").as("mxd"), min($"dev").as("mnd"))
      .filter($"cnt" === m)
      .withColumn("s2n", expr(s"$m * qb - CAST(sbv AS DECIMAL(38,0))" +
        " * sbv"))
      .filter($"s2n" > 0)
      .withColumn("rs_e6",
        exactFloorDivSqrt($"mxd" - $"mnd", $"s2n", 1000000L))
      .groupBy($"event_type")
      .agg(sum($"rs_e6").as("sum_rs_e6"), count(lit(1)).as("n_blocks"))
      .withColumn("m", lit(m.toString))
  }

  /** DuckDB replay of [[hurstRs]] — per block size the exact block
    * moments, the corrected tie-proof floor, and the closed-form
    * dyadic slope with the identical double divisor literal. */
  private def hurstOracle: String = {
    val levels = HurstBlocks.map { m =>
      s"""
      b$m AS (SELECT event_type, (rn - 1) // $m AS blk,
                     (rn - 1) % $m + 1 AS j, cents,
                     sum(cents) OVER (PARTITION BY event_type,
                       (rn - 1) // $m ORDER BY rn) AS cs,
                     sum(cents) OVER (PARTITION BY event_type,
                       (rn - 1) // $m) AS sb
              FROM rnd),
      g$m AS (SELECT event_type, blk, count(*) AS cnt,
                     CAST(max(sb) AS BIGINT) AS sbv,
                     sum(CAST(cents AS HUGEINT) * cents) AS qb,
                     CAST(max($m * cs - j * sb) AS BIGINT) AS mxd,
                     CAST(min($m * cs - j * sb) AS BIGINT) AS mnd
              FROM b$m GROUP BY 1, 2 HAVING count(*) = $m),
      s$m AS (SELECT event_type, mxd - mnd AS num,
                     $m * qb - CAST(sbv AS HUGEINT) * sbv AS s2n
              FROM g$m
              WHERE $m * qb - CAST(sbv AS HUGEINT) * sbv > 0),
      k$m AS (SELECT event_type, num, s2n,
                     CAST(floor(CAST(num AS DOUBLE) * 1000000.0 /
                       sqrt(CAST(s2n AS DOUBLE))) AS BIGINT) AS kd
              FROM s$m),
      r$m AS (SELECT event_type,
                     CASE WHEN CAST(kd + 1 AS HUGEINT) * (kd + 1) * s2n
                            <= CAST(num AS HUGEINT) * num
                               * 1000000000000 THEN kd + 1
                          WHEN kd <= 0 OR CAST(kd AS HUGEINT) * kd * s2n
                            <= CAST(num AS HUGEINT) * num
                               * 1000000000000 THEN kd
                          ELSE kd - 1 END AS rs_e6
              FROM k$m),
      a$m AS (SELECT event_type, CAST(sum(rs_e6) AS BIGINT) AS sum_rs,
                     CAST(count(*) AS BIGINT) AS nb
              FROM r$m GROUP BY 1)"""
    }.mkString(",")
    val div = 2.0 * math.log(2.0)
    s"""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      d1 AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS cents
             FROM e GROUP BY 1, 2),
      rnd AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY day ASC) AS BIGINT) AS rn
              FROM d1),$levels
      SELECT a4.event_type,
             a4.sum_rs AS rs4_sum, a4.nb AS n4,
             a8.sum_rs AS rs8_sum, a8.nb AS n8,
             a16.sum_rs AS rs16_sum, a16.nb AS n16,
             CAST(floor(ln(CAST(a16.sum_rs * a4.nb AS DOUBLE) /
               CAST(a4.sum_rs * a16.nb AS DOUBLE)) / $div * 1000000.0)
               AS BIGINT) AS h_e6
      FROM a4 JOIN a8 ON a4.event_type = a8.event_type
              JOIN a16 ON a4.event_type = a16.event_type
      WHERE a4.sum_rs > 0 AND a16.sum_rs > 0"""
  }

  /** Daily revenue cents per (event_type, day) — the shared series
    * base for [[hurstRs]] (twin of InferenceQueries.dailyCents,
    * private there). */
  private def dailyCentsLocal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
  }

  /** MANN–KENDALL trend test (Mann 1945, Kendall 1975) with the tie
    * correction — the standard nonparametric "is this series
    * monotonically drifting" answer ([[theilSen]] gives the slope;
    * this gives the SIGNIFICANCE): S = Σ_{i<j} sgn(cⱼ − cᵢ) over the
    * daily grid, Var(S)·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) exact,
    * and (the turningPoints device) the z-score ships as the EXACT
    * rational z² with S's sign: z2_e6 = 18·10⁶·(S∓1)² div VarS18,
    * flag |z| ≥ 1.96 ⟺ magnitude ≥ 3 841 600. No sqrt anywhere.
    * Shape: day-grid rollup, then a CALENDAR-BOUNDED pair fan (the
    * i<j self-join carries the event-type equi key, ≤ |days|² rows
    * per type at ANY volume) and a tie rollup on the distinct-cents
    * frame. */
  private def mannKendall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = dailyCentsLocal(s, d)
    val a = daily.select($"event_type", $"day".as("d1"),
      $"cents".as("c1"))
    val b = daily.select($"event_type".as("et2"), $"day".as("d2"),
      $"cents".as("c2"))
    val sTab = a.join(b, $"event_type" === $"et2" && $"d1" < $"d2")
      .groupBy($"event_type")
      .agg(sum(signum($"c2" - $"c1").cast("long")).as("s_stat"))
    val ties = daily.groupBy($"event_type", $"cents")
      .agg(count(lit(1)).as("t"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_values"),
        sum($"t").as("n_days"),
        sum($"t" * ($"t" - 1) * (lit(2L) * $"t" + 5)).as("tie_term"))
    sTab.join(ties, "event_type")
      .withColumn("var_s_18",
        $"n_days" * ($"n_days" - 1) * (lit(2L) * $"n_days" + 5)
          - $"tie_term")
      .withColumn("mag", expr(
        "case when var_s_18 > 0 then" +
          " cast(18000000 * cast(abs(s_stat) - 1 as decimal(38,0))" +
          " * (abs(s_stat) - 1) div var_s_18 as bigint)" +
          " else 0L end"))
      .select($"event_type", $"n_days", $"s_stat", $"var_s_18",
        when($"s_stat" === 0, lit(0L))
          .when($"s_stat" > 0, $"mag").otherwise(-$"mag").as("z2_e6"),
        ($"s_stat" =!= 0 && $"mag" >= 3841600L).as("trend_5pct"))
  }

  /** Poisson-bootstrap replicate count for [[bootstrapCi]]. */
  val BootstrapReplicates = 32

  /** Poisson bootstrap confidence band — THE bootstrap that works on
    * distributed data: classical resampling needs the global row count
    * up front and a shared random state, but for large n the
    * multinomial resample weight of each row converges to Poisson(1),
    * which is a PER-ROW independent draw. Each row therefore fans out
    * to [[BootstrapReplicates]] (replicate, weight) pairs, the weight
    * drawn by inverting the Poisson(1) CDF on a hash-derived uniform
    * in 1e-5 grid units (36788 / 73576 / 91970 / 98101 / 99634 —
    * ⌊1e5·CDF⌋, capped at 5) — deterministic, seedless, and exactly
    * replayable by the oracle. Per (series, replicate) the weighted
    * sum and weight-count collapse MAP-SIDE, so the shuffle carries
    * |types|·B rows at any corpus size; the replicate means then rank
    * inside a B-row window and the band is the 2nd-lowest/2nd-highest
    * replicate mean (~94 % coverage at B = 32). All cells up to the
    * final mean divides are exact integers. */
  private def bootstrapCi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val b = BootstrapReplicates
    val reps = Tables.events(s, d)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u",
        (($"event_id" + $"b" * 1000003L) * 2654435761L)
          % 4294967296L % 100000L)
      .withColumn("w",
        when($"u" < 36788L, 0L).when($"u" < 73576L, 1L)
          .when($"u" < 91970L, 2L).when($"u" < 98101L, 3L)
          .when($"u" < 99634L, 4L).otherwise(5L))
      .groupBy($"event_type", $"b")
      .agg(sum($"w").as("n_w"), sum($"w" * $"cents").as("sum_wx"))
      .withColumn("mean_b", $"sum_wx".cast("double") / $"n_w")
    val lo = W.partitionBy($"event_type").orderBy($"mean_b".asc, $"b".asc)
    val hi = W.partitionBy($"event_type").orderBy($"mean_b".desc, $"b".asc)
    reps
      .withColumn("r_lo", row_number().over(lo))
      .withColumn("r_hi", row_number().over(hi))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n_replicates"),
        sum($"n_w").as("sum_w_all"),
        max(when($"r_lo" === 2, $"mean_b")).as("ci_lo"),
        max(when($"r_hi" === 2, $"mean_b")).as("ci_hi"))
  }

  /** Event-time disorder profile — the watermark-sizing measurement
    * for the streaming side of the house: per (event_type, user_id)
    * stream, replaying events in ARRIVAL order (event_id), how far
    * behind the stream's running event-time high-water mark does each
    * event land? `delayThresholdMs` on withWatermark is exactly a bet
    * on this distribution's tail, and mapGroupsWithState keys state by
    * the same (type, user) granularity this profiles. Lateness is
    * exact integer microseconds binned into operational buckets
    * (on-time / ≤1 s / ≤1 min / ≤10 min / beyond); the rollup emits
    * per-type bucket counts plus the max observed lateness. One
    * window PARTITIONED BY (type, user) — user-cardinality
    * parallelism, never a per-type megapartition — then a map-side
    * combinable bucket aggregate.
    *
    * Library form over ANY stream shaped (event_type, user_id,
    * event_id, ts_us): the catalog binding profiles the events
    * corpus — which it certifies as fully in-order (every row lands
    * in `0_on_time`; that "no watermark needed" answer IS the
    * operational signal) — while StatsSpec feeds a constructed
    * disordered stream to exercise every lateness bucket. */
  def latenessProfileOn(events: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val arrival = W.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("event_id").asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    events
      .withColumn("late_us",
        max(col("ts_us")).over(arrival) - col("ts_us"))
      .withColumn("bucket",
        when(col("late_us") === 0L, "0_on_time")
          .when(col("late_us") <= 1000000L, "1_le_1s")
          .when(col("late_us") <= 60000000L, "2_le_1min")
          .when(col("late_us") <= 600000000L, "3_le_10min")
          .otherwise("4_beyond"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(col("late_us")).as("max_late_us"))
  }

  private def latenessProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    latenessProfileOn(Tables.events(s, d)
      .select($"event_type", $"user_id", $"event_id",
        unix_micros($"ts").as("ts_us")))
  }

  /** Time-to-event hazard table — the survival-analysis primitive
    * behind conversion/churn/retention modelling, with censoring done
    * RIGHT: each signup user either converts at their first
    * on-or-after-signup purchase (event at day-offset t) or is
    * censored at the observation end; a user whose only purchases
    * precede signup is censored, not dropped. Per distinct event
    * offset the table carries the exact integer risk set
    * (n_total − everyone who exited strictly before t), conversions
    * and censorings at t, and the discrete hazard n_conv/n_risk as a
    * 1e6-unit integer — the Kaplan–Meier input cells without the
    * cumulative product (a cross-engine float trap: Πᵢ(1−hᵢ) only
    * replays via libm exp/ln, so the oracle-stable emit is the exact
    * hazard column the curve derives from). Shape: two filtered
    * per-user aggregates, a day-offset rollup, then windows that walk
    * DISTINCT OFFSETS (≤ observation-span days, corpus-size
    * independent — the q_eval_auc lesson); the one global scalar
    * (observation end) is a 1-row broadcast cross join. */
  private def conversionHazard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("s_ts"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    val perUser = signup.join(purch, Seq("user_id"), "left")
      .groupBy($"user_id", $"s_ts")
      .agg(min(when($"p_ts" >= $"s_ts", $"p_ts")).as("c_ts"))
    val obsEnd = ev.agg(max($"ts").as("end_ts"))
    val byT = perUser.crossJoin(obsEnd)
      .select(
        when($"c_ts".isNotNull,
          datediff($"c_ts".cast("date"), $"s_ts".cast("date")))
          .otherwise(datediff($"end_ts".cast("date"), $"s_ts".cast("date")))
          .cast("long").as("t"),
        $"c_ts".isNotNull.as("converted"))
      .groupBy($"t")
      .agg(sum(when($"converted", 1L).otherwise(0L)).as("n_conv"),
        sum(when(!$"converted", 1L).otherwise(0L)).as("n_cens"))
    val before = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val whole = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    byT
      .withColumn("n_risk",
        sum($"n_conv" + $"n_cens").over(whole) -
          coalesce(sum($"n_conv" + $"n_cens").over(before), lit(0L)))
      .filter($"n_conv" > 0)
      .select($"t", $"n_risk", $"n_conv", $"n_cens",
        expr("n_conv * 1000000 div n_risk").as("hazard_e6"))
  }

  /** Nelson–Aalen cumulative-hazard curve over the same
    * signup→purchase risk sets as [[conversionHazard]] — the CURVE
    * the per-offset hazard table feeds: Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, plus
    * its variance estimate Σ dᵢ/nᵢ². Chosen over Kaplan–Meier for
    * the emit because NA is a SUM of exact rationals — carried as
    * cumulative BIGINT e6/e9 fixed-point with zero float anywhere
    * (KM's Π(1−dᵢ/nᵢ) only replays via libm exp/ln; a consumer gets
    * S(t) = exp(−Ĥ(t)) to first order, or exactly from the hazard
    * cells). Unlike the hazard table this keeps pure-censoring
    * offsets (they shrink later risk sets and advance the curve's
    * support). Integer headroom: dᵢ·10⁹ overflows int64 only past
    * ~9·10⁹ same-day conversions — at that scale widen the two
    * cumulated terms to DECIMAL(38,0); the shape (windows walking
    * distinct day offsets, ≤ observation-span rows) is unchanged.
    * Same scale story as the hazard table: two filtered per-user
    * aggregates, a day-offset rollup, then O(span-days) windows. */
  private def nelsonAalen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("s_ts"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    val perUser = signup.join(purch, Seq("user_id"), "left")
      .groupBy($"user_id", $"s_ts")
      .agg(min(when($"p_ts" >= $"s_ts", $"p_ts")).as("c_ts"))
    val obsEnd = ev.agg(max($"ts").as("end_ts"))
    val byT = perUser.crossJoin(obsEnd)
      .select(
        when($"c_ts".isNotNull,
          datediff($"c_ts".cast("date"), $"s_ts".cast("date")))
          .otherwise(datediff($"end_ts".cast("date"), $"s_ts".cast("date")))
          .cast("long").as("t"),
        $"c_ts".isNotNull.as("converted"))
      .groupBy($"t")
      .agg(sum(when($"converted", 1L).otherwise(0L)).as("n_conv"),
        sum(when(!$"converted", 1L).otherwise(0L)).as("n_cens"))
    val before = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val whole = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val running = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    byT
      .withColumn("n_risk",
        sum($"n_conv" + $"n_cens").over(whole) -
          coalesce(sum($"n_conv" + $"n_cens").over(before), lit(0L)))
      .withColumn("na_e6",
        sum(expr("n_conv * 1000000 div n_risk")).over(running))
      .withColumn("na_var_e9",
        sum(expr("n_conv * 1000000000 div (n_risk * n_risk)"))
          .over(running))
      .select($"t", $"n_risk", $"n_conv", $"n_cens",
        $"na_e6", $"na_var_e9")
  }

  /** Per-user conversion day-offsets over the signup→purchase risk
    * sets shared with [[nelsonAalen]]: (t, converted, user-parity
    * cohort). Two filtered per-user aggregates plus one broadcast
    * scalar — the construction every survival query downstream
    * groups and windows over day offsets, never events. */
  private def survivalRows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("s_ts"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    val perUser = signup.join(purch, Seq("user_id"), "left")
      .groupBy($"user_id", $"s_ts")
      .agg(min(when($"p_ts" >= $"s_ts", $"p_ts")).as("c_ts"))
    val obsEnd = ev.agg(max($"ts").as("end_ts"))
    perUser.crossJoin(obsEnd)
      .select(
        when($"c_ts".isNotNull,
          datediff($"c_ts".cast("date"), $"s_ts".cast("date")))
          .otherwise(datediff($"end_ts".cast("date"),
            $"s_ts".cast("date")))
          .cast("long").as("t"),
        $"c_ts".isNotNull.as("converted"),
        ($"user_id" % 2 === 0).as("is_a"))
  }

  /** Kaplan–Meier survival curve over the [[nelsonAalen]] risk sets —
    * the product-limit companion: Ŝ(t) = Π_{tᵢ≤t}(1 − dᵢ/nᵢ), carried
    * as the LOG-survival ln Ŝ(t) = Σ ln((nᵢ−dᵢ)/nᵢ) so the
    * accumulation obeys the floor-then-sum discipline (each per-row
    * ln term is computed on exact BIGINT risk counts, floored to e9
    * fixed-point, and SUMMED as BIGINT — order-independent; a raw
    * double product would be partition-order dependent). Greenwood's
    * variance factor Σ dᵢ/(nᵢ(nᵢ−dᵢ)) is pure integer division —
    * exact e9 with zero float. A terminal cell with dᵢ = nᵢ drives
    * Ŝ to exactly 0 (ln → −∞): the term is withheld (NULL — both
    * engines' SUM skips it) and the `absorbed` flag marks the curve
    * as exactly zero from that offset on. ln is the one libm call:
    * a 1-ulp Spark/DuckDB divergence lands on an e9 floor boundary
    * with probability ~1e-7 per cell — the same accepted exposure as
    * the corpus' other log-based emits. Shape identical to
    * nelsonAalen: O(span-days) windows after a day-offset rollup. */
  private def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val byT = survivalRows(s, d)
      .groupBy($"t")
      .agg(sum(when($"converted", 1L).otherwise(0L)).as("n_conv"),
        sum(when(!$"converted", 1L).otherwise(0L)).as("n_cens"))
    val before = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val whole = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val running = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    byT
      .withColumn("n_risk",
        sum($"n_conv" + $"n_cens").over(whole) -
          coalesce(sum($"n_conv" + $"n_cens").over(before), lit(0L)))
      .withColumn("term_e9",
        when($"n_conv" < $"n_risk",
          floor(log(($"n_risk" - $"n_conv").cast("double")
            / $"n_risk".cast("double")) * lit(1000000000.0))
            .cast("long")))
      .withColumn("lns_e9", sum($"term_e9").over(running))
      .withColumn("gw_e9",
        sum(when($"n_conv" < $"n_risk",
          expr("n_conv * 1000000000 div (n_risk * (n_risk - n_conv))")))
          .over(running))
      .withColumn("absorbed",
        max(when($"n_conv" === $"n_risk", 1L).otherwise(0L))
          .over(running))
      .select($"t", $"n_risk", $"n_conv", $"n_cens",
        $"lns_e9", $"gw_e9", $"absorbed")
  }

  /** Log-rank (Mantel–Cox) test between the user-parity cohorts'
    * conversion curves — the standard "are these two survival curves
    * the same?" decision the KM/NA curves feed. At each event offset
    * with d = d₁+d₂ > 0 conversions and n = n₁+n₂ at risk: cohort A's
    * observed-minus-expected O₁−E₁ = d₁ − d·n₁/n is EXACT e6 BIGINT
    * (integer div), and the hypergeometric variance
    * d·n₁·n₂·(n−d) / (n²(n−1)) is formed in DOUBLE on exact counts
    * (the 4-way product passes int64 at ~1e5 concurrent at-risk
    * users; IEEE double products are correctly rounded identically
    * in both engines) and floored to e6 — then both accumulate
    * floor-then-sum. χ² = (ΣOE)²/ΣV finishes per-row in double on
    * the two BIGINTs. Shape: the day-offset rollup carries both
    * cohorts' four counts in ONE pass (no per-cohort join — the
    * t-grid is complete by construction); O(span-days) windows. */
  private def logrank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val byT = survivalRows(s, d)
      .groupBy($"t")
      .agg(
        sum(when($"is_a" && $"converted", 1L).otherwise(0L)).as("d1"),
        sum(when($"is_a" && !$"converted", 1L).otherwise(0L)).as("c1"),
        sum(when(!$"is_a" && $"converted", 1L).otherwise(0L)).as("d2"),
        sum(when(!$"is_a" && !$"converted", 1L).otherwise(0L)).as("c2"))
    val before = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, -1)
    val whole = W.orderBy($"t".asc)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val risk = byT
      .withColumn("n1",
        sum($"d1" + $"c1").over(whole) -
          coalesce(sum($"d1" + $"c1").over(before), lit(0L)))
      .withColumn("n2",
        sum($"d2" + $"c2").over(whole) -
          coalesce(sum($"d2" + $"c2").over(before), lit(0L)))
      .withColumn("dd", $"d1" + $"d2")
      .withColumn("nn", $"n1" + $"n2")
      .filter($"dd" > 0 && $"nn" > 1)
    val terms = risk.select(
      ($"d1" * 1000000L - expr("dd * n1 * 1000000 div nn"))
        .as("oe_e6"),
      floor($"dd".cast("double") * $"n1" * $"n2" * ($"nn" - $"dd")
        / ($"nn".cast("double") * $"nn" * ($"nn" - 1))
        * lit(1000000.0)).cast("long").as("v_e6"),
      $"d1")
    terms
      .agg(sum($"d1").as("o1"), sum($"oe_e6").as("sum_oe_e6"),
        sum($"v_e6").as("sum_v_e6"))
      .select($"o1", $"sum_oe_e6", $"sum_v_e6",
        when($"sum_v_e6" > 0,
          floor(($"sum_oe_e6".cast("double") / lit(1000000.0))
            * ($"sum_oe_e6".cast("double") / lit(1000000.0))
            / ($"sum_v_e6".cast("double") / lit(1000000.0))
            * lit(1000000.0)).cast("long")).as("chi2_e6"))
  }

  /** Benjamini–Hochberg step-up FDR control over a family of
    * per-segment Welch z-tests — the multiple-comparisons gate every
    * metrics sweep needs once it tests more than one segment: 5 event
    * types × calendar weeks ≈ 25 simultaneous A/B tests (event-id
    * parity split), each yielding a two-sided normal p-value, then
    * one BH pass picks the largest k with p₍ᵢ₎ ≤ α·i/m and rejects
    * ranks 1..k. Float discipline: the moment sums feeding each test
    * are exact integer cents (Σx, Σx² per arm); the per-segment z and
    * Φ(|z|) (Abramowitz–Stegun 26.2.17 polynomial — max abs error
    * 7.5e-8) run in double on those identical integer inputs, and the
    * resulting p is immediately pinned to BIGINT e6 units via
    * floor(p·10⁶) (rule 4 — floor of a bit-identical double is exact
    * in every engine), so the ENTIRE BH
    * comparison chain is integer: reject cells satisfy
    * p_e6·m ≤ α_e6·i with α_e6 = 50 000 (α = 0.05). Shape: one fact
    * rollup to m segment rows, then O(m) windows — the test family is
    * segment-cardinality, never row-cardinality. */
  private def fdrBh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val seg = Tables.events(s, d)
      .select($"event_type", weekofyear($"ts").as("week"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_a"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"week")
      .agg(
        sum(when($"is_a", 1L).otherwise(0L)).as("n_a"),
        sum(when($"is_a", $"cents").otherwise(0L)).as("s_a"),
        sum(when($"is_a", $"cents" * $"cents").otherwise(0L)).as("ss_a"),
        sum(when(!$"is_a", 1L).otherwise(0L)).as("n_b"),
        sum(when(!$"is_a", $"cents").otherwise(0L)).as("s_b"),
        sum(when(!$"is_a", $"cents" * $"cents").otherwise(0L)).as("ss_b"))
      .filter($"n_a" >= 2 && $"n_b" >= 2)
    val z = seg
      .withColumn("var_a",
        (($"ss_a" - $"s_a".cast("double") * $"s_a" / $"n_a".cast("double"))
          / ($"n_a" - 1).cast("double")))
      .withColumn("var_b",
        (($"ss_b" - $"s_b".cast("double") * $"s_b" / $"n_b".cast("double"))
          / ($"n_b" - 1).cast("double")))
      .withColumn("az", abs(
        ($"s_a" / $"n_a".cast("double") - $"s_b" / $"n_b".cast("double"))
          / sqrt($"var_a" / $"n_a" + $"var_b" / $"n_b")))
    // Φ(|z|) via A&S 26.2.17: t = 1/(1+0.2316419|z|); the only
    // libm call is exp(−z²/2); p is floored onto the 1e-6 integer
    // grid the moment it exists and every comparison after is integer.
    val p = z
      .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.2316419) * $"az"))
      .withColumn("phi",
        exp(-$"az" * $"az" / 2.0) * lit(0.3989422804014327))
      .withColumn("poly",
        $"tt" * (lit(0.319381530)
          + $"tt" * (lit(-0.356563782)
            + $"tt" * (lit(1.781477937)
              + $"tt" * (lit(-1.821255978)
                + $"tt" * lit(1.330274429))))))
      .withColumn("p_e6",
        floor($"phi" * $"poly" * lit(2000000.0)).cast("long"))
    val byP = W.orderBy($"p_e6".asc, $"event_type".asc, $"week".asc)
    val whole = W.orderBy($"p_e6".asc, $"event_type".asc, $"week".asc)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    p.select($"event_type", $"week", $"n_a", $"n_b", $"p_e6")
      .withColumn("rank", row_number().over(byP).cast("long"))
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("k", max(when($"p_e6" * $"m" <= lit(50000L) * $"rank",
        $"rank").otherwise(0L)).over(whole))
      .select($"event_type", $"week", $"n_a", $"n_b", $"p_e6", $"rank",
        ($"rank" <= $"k").as("rejected"))
  }

  /** Single change-point detection per event-type daily-revenue
    * series — binary segmentation's first split: the day boundary k
    * maximizing the between-segment sum of squares
    * S_L²/n_L + S_R²/n_R (equivalently minimizing pooled SSE, since
    * Σx² is split-invariant). The prefix sums S_k are exact integer
    * cents over an O(days) window; each candidate's score is then
    * per-row double math on those identical integers (IEEE +,*,/
    * only — bit-identical in both engines), so the argmax and the
    * emitted floor()ed gain replay exactly. Tie-break: earliest
    * split day. Shape: fact table → per-(type,day) rollup (map-side
    * combinable), then windows that walk CALENDAR DAYS per type —
    * score evaluation is O(days²)-free (prefix sums make each
    * candidate O(1)) and day-cardinality at any event volume. */
  private def changepoint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val running = W.partitionBy($"event_type").orderBy($"day".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"event_type")
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val daily = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
    val scored = daily
      .withColumn("s_l", sum($"day_cents").over(running))
      .withColumn("k", count(lit(1)).over(running))
      .withColumn("s", sum($"day_cents").over(whole))
      .withColumn("n", count(lit(1)).over(whole))
      .filter($"k" < $"n")
      .withColumn("score",
        $"s_l".cast("double") * $"s_l" / $"k".cast("double")
          + ($"s" - $"s_l").cast("double") * ($"s" - $"s_l")
            / ($"n" - $"k").cast("double"))
      .withColumn("gain_cents2",
        floor($"score" - $"s".cast("double") * $"s" / $"n".cast("double"))
          .cast("long"))
    val best = W.partitionBy($"event_type")
      .orderBy($"gain_cents2".desc, $"day".asc)
    scored
      .withColumn("rn", row_number().over(best))
      .filter($"rn" === 1)
      .select($"event_type", $"day".as("split_day"),
        $"k".as("n_left"), ($"n" - $"k").as("n_right"),
        expr("s_l div k").as("mean_left_cents"),
        expr("(s - s_l) div (n - k)").as("mean_right_cents"),
        $"gain_cents2")
  }

  /** Theil–Sen robust trend estimator per event-type daily-revenue
    * series — the median of all pairwise slopes (breakdown point
    * ~29 %, vs 0 % for OLS — one corrupted day can't move it), plus
    * the companion median intercept. The pair fan-out is the
    * CALENDAR's square, not the data's (days²/2 per type — 435 pairs
    * for a 30-day window at ANY event volume), generated by a
    * banded self-join of the daily rollup. Slopes are per-row double
    * quotients of exact integer cents/day deltas (bit-identical both
    * engines); the medians are exact interpolated percentiles over
    * those identical doubles (the q_percentiles precedent), and the
    * emitted values go through floor(q·10⁴) BIGINT units (float
    * rule 4). Day index is anchored to a FIXED epoch so the
    * intercept is replayable without a per-type min-day subquery. */
  private def theilSen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("day_cents"))
      .withColumn("x", datediff($"day", lit("2024-01-01")).cast("long"))
    val a = daily.select($"event_type", $"x".as("xa"),
      $"day_cents".as("ca"))
    val b = daily.select($"event_type", $"x".as("xb"),
      $"day_cents".as("cb"))
    val slopes = a.join(b, Seq("event_type"))
      .filter($"xa" < $"xb")
      .withColumn("slope",
        ($"cb" - $"ca").cast("double") / ($"xb" - $"xa").cast("double"))
    val med = slopes.groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        percentile($"slope", lit(0.5)).as("m"))
    daily.join(broadcast(med), Seq("event_type"))
      .withColumn("resid", $"day_cents".cast("double") - $"m" * $"x")
      .groupBy($"event_type")
      .agg(max($"n_pairs").as("n_pairs"),
        floor(max($"m") * 10000.0).cast("long").as("slope_e4"),
        floor(percentile($"resid", lit(0.5)) * 10000.0).cast("long")
          .as("intercept_e4"))
  }

  /** STL-lite seasonal decomposition of each event-type daily-revenue
    * series: trend = centered 7-day moving average (interior days
    * only, so the denominator is the CONSTANT 7 and the detrended
    * series 7·cents − Σ₇ stays an exact integer), seasonal =
    * day-of-week mean of that exact detrended series, residual = the
    * rest. Float discipline: the only doubles are per-row quotients
    * of exact integers (bit-identical both engines), emitted through
    * floor(q·10⁴) — floor(double) rather than integer div because
    * detrended values go NEGATIVE and `div`/`//` truncation
    * conventions differ across engines there. Shape: one daily
    * rollup, a 7-row window per type walking CALENDAR DAYS, and a
    * |types×7|-row seasonal table broadcast back — corpus-size
    * independent past the first rollup. */
  private def stlDecompose(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val w7 = W.partitionBy($"event_type").orderBy($"day".asc)
      .rowsBetween(-3, 3)
    val daily = Tables.events(s, d)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
    val interior = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("sum7", sum($"cents").over(w7))
      .filter($"n7" === 7)
      .withColumn("detr7", lit(7L) * $"cents" - $"sum7")
      .withColumn("dow", dayofweek($"day"))
    val seasonal = interior.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("k"), sum($"detr7").as("sdet"))
    interior.join(broadcast(seasonal), Seq("event_type", "dow"))
      .select($"event_type", $"day", $"cents",
        expr("sum7 * 10000 div 7").as("trend_e4"),
        floor($"sdet".cast("double") * 10000.0 /
          (lit(7.0) * $"k")).cast("long").as("seasonal_e4"),
        floor(($"detr7".cast("double") / 7.0 -
          $"sdet".cast("double") / (lit(7.0) * $"k")) * 10000.0)
          .cast("long").as("resid_e4"))
  }

  /** Lead–lag cross-correlation finder between the click and purchase
    * daily-revenue series: Pearson correlation of click(day) vs
    * purchase(day+L) for every lag L ∈ [−7, +7], with the best lag
    * flagged (max correlation, ties to the smaller |L| then smaller
    * L) — the leading-indicator detector that generalizes
    * [[rollingCorr]]'s contemporaneous view. All five moment sums per
    * lag are exact integer cents; the one double step casts each
    * variance to double BEFORE their product (the rolling-corr int64
    * lesson) and the emit floors corr·10⁶. Shape: the corpus
    * collapses to two days-cardinality series; the 15-lag fan-out and
    * the shifted equi-join both act on THAT table, so every post-
    * rollup stage is calendar-bounded at any event volume. */
  private def leadLag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .filter($"value".isNotNull &&
        $"event_type".isin("click", "purchase"))
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
    val clicks = daily.filter($"event_type" === "click")
      .select($"day", $"cents".as("x"))
    val purch = daily.filter($"event_type" === "purchase")
      .select($"day".as("p_day"), $"cents".as("y"))
    val lagged = clicks
      .withColumn("lag", explode(sequence(lit(-7), lit(7))))
      .join(purch, date_add($"day", $"lag") === $"p_day")
    val m = lagged.groupBy($"lag")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .withColumn("vx", ($"n_days" * $"sxx" - $"sx" * $"sx").cast("double"))
      .withColumn("vy", ($"n_days" * $"syy" - $"sy" * $"sy").cast("double"))
      .withColumn("corr_e6",
        floor(($"n_days" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt($"vx" * $"vy") * 1000000.0).cast("long"))
    val best = W.orderBy($"corr_e6".desc, abs($"lag").asc, $"lag".asc)
    m.withColumn("rn", row_number().over(best))
      .select($"lag".cast("long").as("lag"), $"n_days", $"corr_e6",
        ($"rn" === 1).as("is_best"))
  }

  /** Partial correlation of daily revenue and daily event count,
    * CONTROLLING for day-of-week — the confound-aware dependence
    * measure: raw corr(revenue, volume) is inflated by their shared
    * weekly seasonality, and the partial r_xy·z = (r_xy − r_xz·r_yz)
    * / √((1−r_xz²)(1−r_yz²)) subtracts exactly the part both series
    * owe to the weekday. All nine moment sums land in ONE map-side
    * combinable aggregate over the daily grain; second moments ride
    * DECIMAL(38,0) (Σx² wraps int64 at real daily volumes — the
    * grubbs lesson), covariances are formed in double (welch
    * discipline) and the three r's plus the partial are identical
    * short double expressions floored to e6. |types| rows out. */
  private def partialCorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("x"), count(lit(1)).as("y"))
      .withColumn("z", dayofweek($"day").cast("long"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"z").as("sz"),
        sum(dec($"x") * $"y").as("sxy"), sum(dec($"x") * $"z").as("sxz"),
        sum($"y" * $"z").as("syz"), sum(dec($"x") * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"), sum($"z" * $"z").as("szz"))
      .filter($"n" >= 8)
    def cv(sab: org.apache.spark.sql.Column, sa: org.apache.spark.sql.Column,
        sb: org.apache.spark.sql.Column) =
      $"n".cast("double") * sab.cast("double") -
        sa.cast("double") * sb.cast("double")
    m.withColumn("rxy", cv($"sxy", $"sx", $"sy") /
        sqrt(cv($"sxx", $"sx", $"sx") * cv($"syy", $"sy", $"sy")))
      .withColumn("rxz", cv($"sxz", $"sx", $"sz") /
        sqrt(cv($"sxx", $"sx", $"sx") * cv($"szz", $"sz", $"sz")))
      .withColumn("ryz", cv($"syz", $"sy", $"sz") /
        sqrt(cv($"syy", $"sy", $"sy") * cv($"szz", $"sz", $"sz")))
      .select($"event_type", $"n".as("n_days"),
        floor($"rxy" * lit(1000000.0)).as("rxy_e6"),
        floor($"rxz" * lit(1000000.0)).as("rxz_e6"),
        floor($"ryz" * lit(1000000.0)).as("ryz_e6"),
        floor(($"rxy" - $"rxz" * $"ryz") /
          sqrt((lit(1.0) - $"rxz" * $"rxz") *
            (lit(1.0) - $"ryz" * $"ryz")) * lit(1000000.0))
          .as("pcorr_e6"))
  }

  /** Seasonal-naive MASE — the forecast-evaluation yardstick (scale-
    * free, Hyndman–Koehler): the seasonal-naive forecast x̂_t = x_{t−7}
    * scored relative to the 1-step naive x̂_t = x_{t−1} on the SAME
    * series. Ratio < 1 = weekly seasonality carries real signal (the
    * lag-7 copy beats the lag-1 copy); > 1 = the "seasonality" is
    * noise. Both MAEs are exact integer |error| sums over the daily
    * grain (one lag window per series), and the relative form
    * e7·n1 / (e1·n7) is ONE integer division on the e6 grid — no
    * float anywhere. The complement to [[holtLinear]]/q_ar2_forecast:
    * those FIT forecasts, this scores which baseline to beat. */
  private def seasonalMase(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
      .withColumn("e1", abs($"cents" - lag($"cents", 1).over(w)))
      .withColumn("e7", abs($"cents" - lag($"cents", 7).over(w)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when($"e1".isNotNull, 1L).otherwise(0L)).as("n1"),
        sum($"e1").as("sum_e1"),
        sum(when($"e7".isNotNull, 1L).otherwise(0L)).as("n7"),
        sum($"e7").as("sum_e7"))
      .filter($"n7" > 0 && $"sum_e1" > 0)
      .withColumn("mase_e6", expr(
        "CAST(CAST(sum_e7 AS DECIMAL(38,0)) * n1 * 1000000" +
          " div (CAST(sum_e1 AS DECIMAL(38,0)) * n7) AS BIGINT)"))
  }

  /** Daily z-grid with a per-series day index — the shared input of
    * [[saxSymbols]] and [[matrixProfile]]: [[graft.ops.InferenceQueries]]'
    * zGridDaily convention (exact n·x−Σx deviations over n·range, one
    * double divide, floor to 1e-4 ints) plus rn = 1-based day rank
    * within the series. The row_number window walks DAYS, not events
    * — calendar-bounded at any corpus size. */
  private def zDailyIndexed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
    val tot = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sc"),
        min($"cents").as("mn"), max($"cents").as("mx"))
      .filter($"n" >= 8 && $"mx" > $"mn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("z_e4",
        floor(($"n" * $"cents" - $"sc").cast("double") * lit(10000.0) /
          ($"n" * ($"mx" - $"mn"))))
      .withColumn("rn", row_number().over(w).cast("long"))
  }

  /** SAX symbolization (Piecewise Aggregate Approximation + Gaussian
    * breakpoints) — the standard time-series-to-string compressor:
    * each series collapses to one symbol per 7-day segment, the
    * alphabet {a,b,c,d} cut at the N(0,1) quartiles ±0.6745, after
    * which motif search / anomaly grep run on STRINGS. On the
    * [[zDailyIndexed]] grid the segment mean never needs computing:
    * the breakpoint test Σz/cnt < b is cross-multiplied to
    * Σz < b·cnt, so the whole symbolization is exact integer algebra
    * on the e4 grid (breakpoints ±6745). One map-side segment rollup;
    * |types|·|segments| rows — calendar-bounded at any volume. */
  private def saxSymbols(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    zDailyIndexed(s, d)
      .withColumn("seg", expr("(rn - 1) div 7"))
      .groupBy($"event_type", $"seg")
      .agg(count(lit(1)).as("n_days"), sum($"z_e4").as("sum_z_e4"))
      .withColumn("symbol",
        when($"sum_z_e4" < lit(-6745L) * $"n_days", "a")
          .when($"sum_z_e4" < 0L, "b")
          .when($"sum_z_e4" < lit(6745L) * $"n_days", "c")
          .otherwise("d"))
  }

  /** Subsequence length and exclusion radius for [[matrixProfile]]. */
  val MpWindow = 7
  val MpExclusion = 4

  /** Exact matrix profile over the daily series — THE time-series
    * motif/discord primitive (Yeh et al.'s all-pairs subsequence
    * search): for every 7-day window, the squared distance to its
    * NEAREST non-trivial match (|i−j| ≥ 4 exclusion zone) in the same
    * series. A small profile value = a repeated motif; the largest
    * value = the series' unique discord (anomaly). Naively O(n²) in
    * the series length — but n here is the DAY count, so the pair
    * table is calendar-bounded (~66k pairs/series-year) and CONSTANT
    * in event volume: the only data-sized work is the daily rollup.
    * Distances are exact BIGINT sums over the e4 z-grid via a
    * (pair × 7 offsets) equi-join — no arrays, no UDFs, and the same
    * formulation replays verbatim in the oracle. Argmin ties resolve
    * to the smaller match index. */
  private def matrixProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val z = graft.GraftCaches.getOrPersist(s, s"stats.zdaily:$d") {
      zDailyIndexed(s, d)
    }
    val starts = z.filter($"rn" + (MpWindow - 1) <= $"n")
      .select($"event_type", $"rn", $"day")
    val pairs = starts.select($"event_type", $"rn".as("i"))
      .join(starts.select($"event_type", $"rn".as("j")),
        Seq("event_type"))
      .filter($"j" >= $"i" + MpExclusion)
    val zi = z.select($"event_type", $"rn".as("pi"), $"z_e4".as("vi"))
    val zj = z.select($"event_type", $"rn".as("pj"), $"z_e4".as("vj"))
    val d2 = pairs
      .withColumn("k", explode(sequence(lit(0L), lit(MpWindow - 1L))))
      .withColumn("pi", $"i" + $"k").withColumn("pj", $"j" + $"k")
      .join(zi, Seq("event_type", "pi"))
      .join(zj, Seq("event_type", "pj"))
      .groupBy($"event_type", $"i", $"j")
      .agg(sum(($"vi" - $"vj") * ($"vi" - $"vj")).as("d2"))
    val both = d2.select($"event_type", $"i", $"j", $"d2")
      .unionAll(d2.select($"event_type", $"j".as("i"), $"i".as("j"),
        $"d2"))
    both.groupBy($"event_type", $"i")
      .agg(min(struct($"d2", $"j")).as("m"))
      .join(starts.select($"event_type", $"rn".as("i"), $"day"),
        Seq("event_type", "i"))
      .select($"event_type", $"i", $"day",
        $"m.d2".as("mp_d2"), $"m.j".as("mp_j"))
  }

  /** Shared daily z-grid CTE prefix (ends defining `z` with columns
    * event_type, day, n, z_e4, rn) for the SAX / matrix-profile
    * oracles — mirrors [[zDailyIndexed]]. */
  private val ZDailyCtes = """
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
      z AS (SELECT daily.event_type AS event_type, day, n,
                   CAST(floor(CAST(n * cents - sc AS DOUBLE) * 10000.0
                     / (n * (mx - mn))) AS BIGINT) AS z_e4,
                   CAST(row_number() OVER (
                     PARTITION BY daily.event_type
                     ORDER BY day ASC) AS BIGINT) AS rn
            FROM daily JOIN tot ON daily.event_type = tot.event_type)"""

  val queries: Seq[Q] = Seq(
    Q("q_mahalanobis_2d", mahalanobis2d, Some("""
      WITH u AS (SELECT user_id,
                        CAST(coalesce(sum(CAST(CAST(value AS
                          DECIMAL(18,2)) * 100 AS BIGINT)), 0)
                          AS BIGINT) AS spend,
                        CAST(count(*) AS BIGINT) AS n_ev
                 FROM events GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(spend) AS BIGINT) AS ssp,
                     min(spend) AS mnsp, max(spend) AS mxsp,
                     CAST(sum(n_ev) AS BIGINT) AS sev,
                     min(n_ev) AS mnev, max(n_ev) AS mxev
              FROM u),
      z AS (SELECT user_id,
                   CAST(floor(CAST(n * spend - ssp AS DOUBLE) * 10000.0
                     / (n * (mxsp - mnsp))) AS BIGINT) AS zx,
                   CAST(floor(CAST(n * n_ev - sev AS DOUBLE) * 10000.0
                     / (n * (mxev - mnev))) AS BIGINT) AS zy
            FROM u, tot WHERE mxsp > mnsp AND mxev > mnev),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(zx) AS BIGINT) AS sx,
                   CAST(sum(zy) AS BIGINT) AS sy,
                   CAST(sum(zx * zx) AS BIGINT) AS sxx,
                   CAST(sum(zy * zy) AS BIGINT) AS syy,
                   CAST(sum(zx * zy) AS BIGINT) AS sxy
            FROM z),
      c AS (SELECT user_id, zx, zy,
                   CAST(n * sxx - sx * sx AS BIGINT) AS a_c,
                   CAST(n * syy - sy * sy AS BIGINT) AS b_c,
                   CAST(n * sxy - sx * sy AS BIGINT) AS c_c,
                   CAST(n * zx - sx AS BIGINT) AS dxn,
                   CAST(n * zy - sy AS BIGINT) AS dyn
            FROM z, m),
      q AS (SELECT user_id, zx, zy,
                   CAST(a_c AS HUGEINT) * b_c
                     - CAST(c_c AS HUGEINT) * c_c AS det,
                   CAST(b_c AS HUGEINT) * dxn * dxn
                     - 2 * CAST(c_c AS HUGEINT) * dxn * dyn
                     + CAST(a_c AS HUGEINT) * dyn * dyn AS q_num
            FROM c)
      SELECT user_id, zx, zy,
             CAST(q_num * 1000 // det AS BIGINT) AS md2_e3,
             q_num * 1000 // det >= 13816 AS outlier
      FROM q WHERE det > 0""")),

    Q("q_hurst_rs", hurstRs, Some(hurstOracle)),

    Q("q_post_stratified", postStratified, Some("""
      WITH base AS (SELECT user_id % 5 AS seg,
                           date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) AS dayn,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS cents
                    FROM events
                    WHERE event_type = 'purchase'
                      AND value IS NOT NULL),
      cut AS (SELECT (min(dayn) + max(dayn)) // 2 AS cut FROM base),
      cells AS (SELECT seg,
                       CAST(sum(CASE WHEN dayn <= cut THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_ref,
                       CAST(sum(CASE WHEN dayn > cut THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_cur,
                       CAST(sum(CASE WHEN dayn > cut THEN cents
                                ELSE 0 END) AS BIGINT) AS s_cur
                FROM base, cut GROUP BY 1
                HAVING sum(CASE WHEN dayn <= cut THEN 1 ELSE 0 END) > 0
                   AND sum(CASE WHEN dayn > cut THEN 1 ELSE 0 END) > 0),
      tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr_all,
                     CAST(sum(n_cur) AS BIGINT) AS nc_all,
                     CAST(sum(s_cur) AS BIGINT) AS sc_all
              FROM cells),
      terms AS (SELECT nr_all, nc_all, sc_all,
                       CAST(floor(CAST(n_ref AS DOUBLE) / nr_all
                         * (CAST(s_cur AS DOUBLE) / n_cur) * 100.0)
                         AS BIGINT) AS term_e2
                FROM cells, tot)
      SELECT CAST(count(*) AS BIGINT) AS n_segments, nr_all, nc_all,
             sc_all,
             CAST(CAST(sc_all AS HUGEINT) * 100 // nc_all AS BIGINT)
               AS raw_mean_e2,
             CAST(sum(term_e2) AS BIGINT) AS adjusted_mean_e2,
             CAST(CAST(sc_all AS HUGEINT) * 100 // nc_all AS BIGINT)
               - CAST(sum(term_e2) AS BIGINT) AS mix_effect_e2
      FROM terms GROUP BY 2, 3, 4""")),

    Q("q_theil_decomposition", theilDecomposition, Some("""
      WITH sx AS (SELECT l_suppkey,
                         CAST(sum(CAST(CAST(l_extendedprice AS
                           DECIMAL(12,2)) * 100 AS BIGINT)
                           * (100 - CAST(CAST(l_discount AS
                             DECIMAL(3,2)) * 100 AS BIGINT)))
                           AS BIGINT) AS x
                  FROM lineitem GROUP BY 1),
      sj AS (SELECT s_nationkey AS nationkey, x FROM sx
             JOIN supplier ON l_suppkey = s_suppkey
             WHERE x > 0),
      g AS (SELECT nationkey, CAST(count(*) AS BIGINT) AS n_g,
                   CAST(sum(x) AS BIGINT) AS rev_g,
                   CAST(sum(CAST(floor(CAST(x AS DOUBLE)
                     * ln(CAST(x AS DOUBLE)) / 1e3) AS BIGINT))
                     AS BIGINT) AS sxlnx_m3
            FROM sj GROUP BY 1),
      t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_all,
                   CAST(sum(rev_g) AS BIGINT) AS rev_all
            FROM g)
      SELECT nationkey, n_g, rev_g, sxlnx_m3,
             CAST(floor((CAST(sxlnx_m3 AS DOUBLE) * 1e3
               / rev_g - ln(CAST(rev_g AS DOUBLE) / n_g)) * 1e6)
               AS BIGINT) AS t_within_e6,
             CAST(floor(CAST(rev_g AS DOUBLE) / rev_all
               * ln((CAST(rev_g AS DOUBLE) / n_g)
                    / (CAST(rev_all AS DOUBLE) / n_all)) * 1e6)
               AS BIGINT) AS between_term_e6
      FROM g, t""")),

    Q("q_gpd_tail", gpdTail, Some("""
      WITH ev AS (SELECT event_type, event_id,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents
                  FROM events WHERE value IS NOT NULL),
      ranked AS (SELECT *,
                        CAST(row_number() OVER (PARTITION BY event_type
                          ORDER BY cents ASC, event_id ASC) AS BIGINT)
                          AS r,
                        CAST(count(*) OVER (PARTITION BY event_type)
                          AS BIGINT) AS n_tot
                 FROM ev),
      thresh AS (SELECT event_type, cents AS u_cents FROM ranked
                 WHERE r = (9 * n_tot + 9) // 10),
      exc AS (SELECT ev.event_type, ev.event_id, t.u_cents,
                     ev.cents - t.u_cents AS y
              FROM ev JOIN thresh t ON ev.event_type = t.event_type
              WHERE ev.cents > t.u_cents),
      idx AS (SELECT *,
                     CAST(row_number() OVER (PARTITION BY event_type
                       ORDER BY y ASC, event_id ASC) AS BIGINT) AS i
              FROM exc),
      m AS (SELECT event_type, max(u_cents) AS u_cents,
                   CAST(count(*) AS BIGINT) AS n_exceed,
                   CAST(sum(y) AS BIGINT) AS s_sum,
                   CAST(sum((i - 1) * y) AS BIGINT) AS m_weighted
            FROM idx GROUP BY 1 HAVING count(*) >= 8),
      dd AS (SELECT *,
                    2 * CAST(m_weighted AS HUGEINT)
                      - CAST(s_sum AS HUGEINT) * (n_exceed - 1) AS den
             FROM m)
      SELECT event_type, u_cents, n_exceed, s_sum, m_weighted,
             2000000 - CAST(CAST(s_sum AS HUGEINT) * (n_exceed - 1)
               * 1000000 // den AS BIGINT) AS xi_e6,
             CAST(2 * CAST(s_sum AS HUGEINT)
               * (CAST(s_sum AS HUGEINT) * (n_exceed - 1) - m_weighted)
               * 1000 // (n_exceed * den) AS BIGINT) AS sigma_e3,
             2000000 - CAST(s_sum AS HUGEINT) * (n_exceed - 1)
               * 1000000 // den > 0 AS heavy_tail
      FROM dd WHERE den <> 0""")),

    Q("q_outlier_iqr", outlierIqr, Some("""
      WITH f AS (SELECT event_type,
                        quantile_cont(value, 0.25) AS q1,
                        quantile_cont(value, 0.75) AS q3
                 FROM events GROUP BY 1),
      fe AS (SELECT event_type, q1, q3,
                    q1 - (q3 - q1) * 1.5 AS lo,
                    q3 + (q3 - q1) * 1.5 AS hi
             FROM f)
      SELECT e.event_type,
             count(*) AS n,
             CAST(sum(CASE WHEN e.value < fe.lo OR e.value > fe.hi
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             round(max(fe.q1), 2) AS q1,
             round(max(fe.q3), 2) AS q3,
             round(max(fe.hi), 2) AS hi_fence,
             round(sum(CASE WHEN e.value < fe.lo OR e.value > fe.hi
                            THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS outlier_pct
      FROM events e JOIN fe USING (event_type)
      GROUP BY 1""")),

    Q("q_corr_moments", corrMoments, Some("""
      WITH g AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS q,
                        CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
                        CAST(l_discount AS DECIMAL(4,2)) AS d
                 FROM lineitem),
      m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(q) AS DOUBLE) AS sq,
                   CAST(sum(p) AS DOUBLE) AS sp,
                   CAST(sum(d) AS DOUBLE) AS sd,
                   CAST(sum(q * q) AS DOUBLE) AS sqq,
                   CAST(sum(p * p) AS DOUBLE) AS spp,
                   CAST(sum(d * d) AS DOUBLE) AS sdd,
                   CAST(sum(q * p) AS DOUBLE) AS sqp,
                   CAST(sum(q * d) AS DOUBLE) AS sqd,
                   CAST(sum(p * d) AS DOUBLE) AS spd
            FROM g)
      SELECT CAST(n AS BIGINT) AS n,
             round((sqp / n - (sq / n) * (sp / n)) /
                   (sqrt(sqq / n - (sq / n) * (sq / n)) *
                    sqrt(spp / n - (sp / n) * (sp / n))), 6)
               AS corr_qty_price,
             round((sqd / n - (sq / n) * (sd / n)) /
                   (sqrt(sqq / n - (sq / n) * (sq / n)) *
                    sqrt(sdd / n - (sd / n) * (sd / n))), 6)
               AS corr_qty_disc,
             round((spd / n - (sp / n) * (sd / n)) /
                   (sqrt(spp / n - (sp / n) * (sp / n)) *
                    sqrt(sdd / n - (sd / n) * (sd / n))), 6)
               AS corr_price_disc
      FROM m""")),

    Q("q_data_profile", dataProfile, Some("""
      WITH g AS (SELECT count(*) AS n,
                        count(CAST(o_orderkey AS VARCHAR)) AS k_nn,
                        count(DISTINCT CAST(o_orderkey AS VARCHAR)) AS k_nd,
                        min(CAST(o_orderkey AS VARCHAR)) AS k_mn,
                        max(CAST(o_orderkey AS VARCHAR)) AS k_mx,
                        count(CAST(o_custkey AS VARCHAR)) AS c_nn,
                        count(DISTINCT CAST(o_custkey AS VARCHAR)) AS c_nd,
                        min(CAST(o_custkey AS VARCHAR)) AS c_mn,
                        max(CAST(o_custkey AS VARCHAR)) AS c_mx,
                        count(o_orderstatus) AS s_nn,
                        count(DISTINCT o_orderstatus) AS s_nd,
                        min(o_orderstatus) AS s_mn,
                        max(o_orderstatus) AS s_mx,
                        count(o_orderpriority) AS p_nn,
                        count(DISTINCT o_orderpriority) AS p_nd,
                        min(o_orderpriority) AS p_mn,
                        max(o_orderpriority) AS p_mx
                 FROM orders)
      SELECT 'o_orderkey' AS column_name, n AS n_rows, k_nn AS n_nonnull,
             k_nd AS n_distinct, k_mn AS min_s, k_mx AS max_s FROM g
      UNION ALL
      SELECT 'o_custkey', n, c_nn, c_nd, c_mn, c_mx FROM g
      UNION ALL
      SELECT 'o_orderstatus', n, s_nn, s_nd, s_mn, s_mx FROM g
      UNION ALL
      SELECT 'o_orderpriority', n, p_nn, p_nd, p_mn, p_mx FROM g""")),

    Q("q_benford", benford, Some("""
      WITH c AS (SELECT CAST(substr(CAST(
                          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT) AS VARCHAR), 1, 1) AS INT)
                          AS digit
                 FROM orders),
      g AS (SELECT digit, count(*) AS n FROM c GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
      SELECT digit, CAST(n AS BIGINT) AS n,
             round(n * 1.0 / tot, 4) AS obs_p,
             round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_p
      FROM g, t""")),

    Q("q_interevent_times", interEvent, Some("""
      WITH g AS (SELECT event_type,
                        epoch_us(ts) - epoch_us(lag(ts) OVER (
                          PARTITION BY event_type
                          ORDER BY ts ASC, event_id ASC)) AS gap_us
                 FROM events)
      SELECT event_type, count(*) AS n_gaps,
             quantile_cont(gap_us, 0.5) AS p50_us,
             quantile_cont(gap_us, 0.95) AS p95_us,
             CAST(max(gap_us) AS BIGINT) AS max_us
      FROM g WHERE gap_us IS NOT NULL GROUP BY 1""")),

    Q("q_impute_group_mean", imputeGroupMean, Some("""
      WITH base AS (SELECT event_id, event_type,
                           CASE WHEN event_id % 37 <> 0
                                THEN CAST(CAST(value AS DECIMAL(18,2)) * 100
                                          AS BIGINT)
                           END AS cents
                    FROM events),
      m AS (SELECT event_type, sum(cents) AS sc, count(cents) AS nc
            FROM base WHERE cents IS NOT NULL GROUP BY 1)
      SELECT b.event_type, count(*) AS n_rows,
             CAST(sum(CASE WHEN b.cents IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_imputed,
             CAST(max(sc // nc) AS BIGINT) AS fill_cents,
             CAST(sum(coalesce(b.cents, sc // nc)) AS BIGINT)
               AS total_cents_after_fill
      FROM base b JOIN m ON b.event_type = m.event_type
      GROUP BY 1""")),

    Q("q_mann_kendall", mannKendall, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                              * 100 AS BIGINT)) AS BIGINT) AS cents
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      st AS (SELECT a.event_type,
                    CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
             FROM daily a JOIN daily b
               ON a.event_type = b.event_type AND a.day < b.day
             GROUP BY 1),
      tg AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS t
             FROM daily GROUP BY 1, 2),
      ties AS (SELECT event_type,
                      CAST(count(*) AS BIGINT) AS n_values,
                      CAST(sum(t) AS BIGINT) AS n_days,
                      CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                        AS tie_term
               FROM tg GROUP BY 1),
      m AS (SELECT st.event_type, s_stat, n_days,
                   n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                     AS var_s_18
            FROM st JOIN ties USING (event_type)),
      z AS (SELECT *, CASE WHEN var_s_18 > 0 THEN
                        CAST(CAST(18000000 AS HUGEINT)
                          * (abs(s_stat) - 1) * (abs(s_stat) - 1)
                          // var_s_18 AS BIGINT)
                      ELSE 0 END AS mag
            FROM m)
      SELECT event_type, n_days, s_stat,
             CAST(var_s_18 AS BIGINT) AS var_s_18,
             CAST(CASE WHEN s_stat = 0 THEN 0
                  WHEN s_stat > 0 THEN mag ELSE -mag END AS BIGINT)
               AS z2_e6,
             s_stat <> 0 AND mag >= 3841600 AS trend_5pct
      FROM z""")),

    Q("q_anderson_darling", andersonDarling, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events
                 WHERE value IS NOT NULL),
      g AS (SELECT event_type, cents,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS r,
                   CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS c
            FROM e GROUP BY 1, 2),
      cum AS (SELECT event_type, r, c,
                     CAST(sum(r) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum_r,
                     CAST(sum(c) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum_c,
                     CAST(sum(r) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n_ref,
                     CAST(sum(c) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n_cur
              FROM g),
      t AS (SELECT event_type, n_ref, n_cur,
                   r + c AS l, n_ref + n_cur AS nn,
                   2 * (cum_r + cum_c) - (r + c) AS q,
                   CAST(nn AS HUGEINT) * (2 * cum_r - r)
                     - CAST(n_ref AS HUGEINT)
                       * (2 * (cum_r + cum_c) - (r + c)) AS p_ref,
                   CAST(nn AS HUGEINT) * (2 * cum_c - c)
                     - CAST(n_cur AS HUGEINT)
                       * (2 * (cum_r + cum_c) - (r + c)) AS p_cur,
                   CAST(2 * (cum_r + cum_c) - (r + c) AS HUGEINT)
                     * (2 * nn - (2 * (cum_r + cum_c) - (r + c)))
                     - CAST(nn AS HUGEINT) * (r + c) AS dden
            FROM (SELECT *, n_ref + n_cur AS nn FROM cum)),
      s AS (SELECT event_type, n_ref, n_cur,
                   CASE WHEN dden > 0 THEN
                     CAST(1000000 AS HUGEINT) * (nn - 1) * l
                       * p_ref * p_ref
                     // (CAST(nn AS HUGEINT) * nn * n_ref * dden)
                   ELSE 0 END
                   + CASE WHEN dden > 0 THEN
                     CAST(1000000 AS HUGEINT) * (nn - 1) * l
                       * p_cur * p_cur
                     // (CAST(nn AS HUGEINT) * nn * n_cur * dden)
                   ELSE 0 END AS term
            FROM t)
      SELECT event_type, n_ref, n_cur,
             CAST(count(*) AS BIGINT) AS n_grid,
             CAST(sum(term) AS BIGINT) AS a2akn_e6
      FROM s GROUP BY 1, 2, 3""")),

    Q("q_kuiper_test", kuiperTest, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events
                 WHERE value IS NOT NULL),
      g AS (SELECT event_type, cents,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS r,
                   CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS c
            FROM e GROUP BY 1, 2),
      cum AS (SELECT event_type,
                     CAST(sum(r) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum_r,
                     CAST(sum(c) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum_c,
                     CAST(sum(r) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n_ref,
                     CAST(sum(c) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n_cur
              FROM g),
      a AS (SELECT event_type, max(n_ref) AS n_ref,
                   max(n_cur) AS n_cur,
                   CAST(greatest(max(cum_r * n_cur - cum_c * n_ref), 0)
                     AS BIGINT) AS dplus_num,
                   CAST(greatest(max(cum_c * n_ref - cum_r * n_cur), 0)
                     AS BIGINT) AS dminus_num
            FROM cum GROUP BY 1)
      SELECT event_type, n_ref, n_cur, dplus_num, dminus_num,
             CAST(CAST(dplus_num + dminus_num AS HUGEINT) * 1000000
               // (CAST(n_ref AS HUGEINT) * n_cur) AS BIGINT) AS v_e6
      FROM a""")),

    Q("q_ks_test", ksTest, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events
                 WHERE value IS NOT NULL),
      g AS (SELECT event_type, cents,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS r,
                   CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS c
            FROM e GROUP BY 1, 2),
      cum AS (SELECT event_type,
                     CAST(sum(r) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum_r,
                     CAST(sum(c) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS cum_c,
                     CAST(sum(r) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n_ref,
                     CAST(sum(c) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n_cur
              FROM g)
      SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
             CAST(max(abs(cum_r * n_cur - cum_c * n_ref)) AS BIGINT)
               AS ks_num,
             CAST(max(n_ref * n_cur) AS BIGINT) AS ks_den
      FROM cum GROUP BY 1""")),

    Q("q_mann_whitney", mannWhitney, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events
                 WHERE value IS NOT NULL),
      g AS (SELECT event_type, cents,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS r,
                   CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS c
            FROM e GROUP BY 1, 2),
      cum AS (SELECT event_type, r, c,
                     CAST(sum(r + c) OVER (PARTITION BY event_type
                       ORDER BY cents ASC ROWS UNBOUNDED PRECEDING)
                       - r - c AS BIGINT) AS prev
              FROM g),
      agg AS (SELECT event_type,
                     CAST(sum(r) AS BIGINT) AS n_ref,
                     CAST(sum(c) AS BIGINT) AS n_cur,
                     CAST(sum(r * (2 * prev + r + c + 1)) AS BIGINT)
                       AS w2_ref
              FROM cum GROUP BY 1)
      SELECT event_type, n_ref, n_cur,
             CAST(w2_ref - n_ref * (n_ref + 1) AS BIGINT) AS u2_ref,
             CAST(2 * n_ref * n_cur AS BIGINT) AS u2_den
      FROM agg""")),

    Q("q_cvm_test", cvmTest, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        event_id % 2 = 0 AS is_ref
                 FROM events WHERE value IS NOT NULL),
      g AS (SELECT event_type, cents,
                   CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS r,
                   CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                     AS BIGINT) AS c
            FROM e GROUP BY 1, 2),
      w AS (SELECT event_type, r + c AS gg,
                   sum(r) OVER win AS cum_r,
                   sum(c) OVER win AS cum_c,
                   sum(r) OVER (PARTITION BY event_type) AS n_ref,
                   sum(c) OVER (PARTITION BY event_type) AS n_cur
            FROM g
            WINDOW win AS (PARTITION BY event_type ORDER BY cents ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)),
      a AS (SELECT event_type,
                   CAST(max(n_ref) AS BIGINT) AS n_ref,
                   CAST(max(n_cur) AS BIGINT) AS n_cur,
                   sum(CAST(gg AS HUGEINT)
                       * (cum_r * n_cur - cum_c * n_ref)
                       * (cum_r * n_cur - cum_c * n_ref)) AS num
            FROM w GROUP BY 1),
      b AS (SELECT event_type, n_ref, n_cur,
                   CAST(num * 1000000
                     // (CAST(n_ref + n_cur AS HUGEINT)
                        * (n_ref + n_cur) * n_ref * n_cur)
                     AS BIGINT) AS cvm_e6
            FROM a WHERE n_ref > 0 AND n_cur > 0)
      SELECT event_type, n_ref, n_cur, cvm_e6,
             cvm_e6 >= 461000 AS drift_5pct
      FROM b""")),

    Q("q_qte", qte, Some("""
      WITH pu AS (SELECT user_id % 2 = 1 AS treated,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents
                  FROM events
                  WHERE event_type = 'purchase' AND value IS NOT NULL),
      g AS (SELECT treated, cents, CAST(count(*) AS BIGINT) AS cnt
            FROM pu GROUP BY 1, 2),
      w AS (SELECT treated, cents,
                   sum(cnt) OVER (PARTITION BY treated
                     ORDER BY cents ASC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum,
                   sum(cnt) OVER (PARTITION BY treated) AS n
            FROM g),
      q AS (SELECT treated, CAST(max(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN cum * 100 >= 25 * n THEN cents
                     END) AS BIGINT) AS q25,
                   CAST(min(CASE WHEN cum * 100 >= 50 * n THEN cents
                     END) AS BIGINT) AS q50,
                   CAST(min(CASE WHEN cum * 100 >= 75 * n THEN cents
                     END) AS BIGINT) AS q75
            FROM w GROUP BY 1),
      t AS (SELECT n AS n_treated, q25 AS q25_t, q50 AS q50_t,
                   q75 AS q75_t
            FROM q WHERE treated),
      c AS (SELECT n AS n_control, q25 AS q25_c, q50 AS q50_c,
                   q75 AS q75_c
            FROM q WHERE NOT treated)
      SELECT CAST(25 AS BIGINT) AS p, n_treated, n_control,
             q25_t AS q_treated, q25_c AS q_control,
             CAST(q25_t - q25_c AS BIGINT) AS qte_cents
      FROM t, c
      UNION ALL
      SELECT CAST(50 AS BIGINT), n_treated, n_control, q50_t, q50_c,
             CAST(q50_t - q50_c AS BIGINT)
      FROM t, c
      UNION ALL
      SELECT CAST(75 AS BIGINT), n_treated, n_control, q75_t, q75_c,
             CAST(q75_t - q75_c AS BIGINT)
      FROM t, c""")),

    Q("q_median_ci", medianCi, Some("""
      WITH e AS (SELECT event_type,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      g AS (SELECT event_type, cents,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM e GROUP BY 1, 2),
      w AS (SELECT event_type, cents,
                   sum(cnt) OVER (PARTITION BY event_type
                     ORDER BY cents ASC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum,
                   sum(cnt) OVER (PARTITION BY event_type) AS n
            FROM g),
      r AS (SELECT event_type, cents, cum, n,
                   (n + 1) // 2 AS med_rank,
                   greatest(1, CAST(floor((CAST(n AS DOUBLE)
                     - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0)
                     AS BIGINT)) AS lo_rank
            FROM w),
      r2 AS (SELECT *, least(n, n + 1 - lo_rank) AS hi_rank FROM r)
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n,
             CAST(max(med_rank) AS BIGINT) AS med_rank,
             CAST(max(lo_rank) AS BIGINT) AS lo_rank,
             CAST(max(hi_rank) AS BIGINT) AS hi_rank,
             CAST(min(CASE WHEN cum >= med_rank THEN cents END)
               AS BIGINT) AS median_cents,
             CAST(min(CASE WHEN cum >= lo_rank THEN cents END)
               AS BIGINT) AS ci_lo_cents,
             CAST(min(CASE WHEN cum >= hi_rank THEN cents END)
               AS BIGINT) AS ci_hi_cents
      FROM r2 GROUP BY 1""")),

    Q("q_dtw_distance", dtwDistance, Some(s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                              * 100 AS BIGINT)) AS BIGINT) AS day_cents
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      series AS (SELECT event_type,
                        list(day_cents ORDER BY day ASC) AS v
                 FROM daily GROUP BY 1),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.v AS x, b.v AS y
                FROM series a JOIN series b
                  ON a.event_type < b.event_type),
      dp AS (
        -- row-by-row DTW: `row` holds D(i, 0..m); the left-to-right
        -- in-row dependency folds via list_reduce with a LIST
        -- accumulator (acc = the row built so far, elements = [j])
        WITH RECURSIVE rec AS (
          SELECT type_a, type_b, x, y, 0 AS i,
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, len(y)),
                     j -> CAST(${graft.ext.DtwExpr.Inf} AS BIGINT)))
                   AS row
          FROM pairs
          UNION ALL
          SELECT type_a, type_b, x, y, i + 1,
                 list_reduce(
                   list_prepend(
                     [CAST(${graft.ext.DtwExpr.Inf} AS BIGINT)],
                     list_transform(generate_series(1, len(y)),
                       j -> [CAST(j AS BIGINT)])),
                   (acc, xj) -> list_append(acc,
                     abs(x[i + 1] - y[xj[1]])
                     + least(row[xj[1] + 1], acc[len(acc)],
                             row[xj[1]])))
          FROM rec WHERE i < len(x))
        SELECT type_a, type_b, x, y, row FROM rec
        WHERE i = len(x))
      SELECT type_a, type_b,
             CAST(len(x) AS BIGINT) AS n_a,
             CAST(len(y) AS BIGINT) AS n_b,
             CAST(row[len(y) + 1] AS BIGINT) AS dtw_cents
      FROM dp""")),

    Q("q_var_cvar", varCvar, Some(s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                              * 100 AS BIGINT)) AS BIGINT) AS day_cents
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      dl AS (SELECT event_type, day,
                    day_cents - lag(day_cents) OVER (
                      PARTITION BY event_type ORDER BY day ASC)
                      AS delta
             FROM daily),
      dd AS (SELECT event_type, day, delta FROM dl
             WHERE delta IS NOT NULL),
      rk AS (SELECT event_type, delta,
                    row_number() OVER (PARTITION BY event_type
                      ORDER BY delta ASC, day ASC) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS n
             FROM dd),
      kk AS (SELECT event_type, delta, rn,
                    CAST(n AS BIGINT) AS n,
                    (n + ${VarTailDen - 1}) // $VarTailDen AS k
             FROM rk),
      t AS (SELECT event_type,
                   CAST(max(n) AS BIGINT) AS n_days,
                   CAST(max(k) AS BIGINT) AS k_tail,
                   CAST(max(CASE WHEN rn = k THEN delta END)
                     AS BIGINT) AS var_cents,
                   CAST(sum(delta) AS BIGINT) AS tail_sum_cents
            FROM kk WHERE rn <= k GROUP BY 1)
      SELECT event_type, n_days, k_tail, var_cents, tail_sum_cents,
             CAST(CASE WHEN tail_sum_cents >= 0
                    THEN tail_sum_cents // k_tail
                    ELSE -((-tail_sum_cents) // k_tail) END
               AS BIGINT) AS cvar_cents
      FROM t""")),

    Q("q_ewma_binary", ewmaBinary, Some(s"""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events
                 WHERE value IS NOT NULL),
      dly AS (SELECT event_type, day,
                     CAST(sum(cents) AS BIGINT) AS day_cents
              FROM e GROUP BY 1, 2),
      w AS (SELECT event_type, day, day_cents,
                   list(day_cents) OVER (PARTITION BY event_type
                     ORDER BY day ASC
                     ROWS BETWEEN ${EwmaWindow - 1} PRECEDING
                       AND CURRENT ROW) AS lastk
            FROM dly)
      SELECT event_type, day, day_cents,
             CAST(len(lastk) AS BIGINT) AS n_window,
             CAST(list_reduce(lastk, (acc, x) -> acc * 2 + x) AS BIGINT)
               AS ewma_num,
             CAST((CAST(1 AS BIGINT) << len(lastk)) - 1 AS BIGINT)
               AS ewma_den,
             CAST(list_reduce(lastk, (acc, x) -> acc * 2 + x)
               // ((CAST(1 AS BIGINT) << len(lastk)) - 1) AS BIGINT)
               AS ewma_cents
      FROM w""")),

    Q("q_ols_influence", olsInfluence, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS y
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      w AS (SELECT event_type, day, y,
                   CAST(day - DATE '1970-01-01' AS HUGEINT) AS x,
                   CAST(count(*) OVER wt AS HUGEINT) AS n,
                   CAST(sum(day - DATE '1970-01-01') OVER wt
                     AS HUGEINT) AS sx,
                   sum(y) OVER wt AS sy,
                   sum(CAST(day - DATE '1970-01-01' AS HUGEINT)
                       * (day - DATE '1970-01-01')) OVER wt AS sxx,
                   sum(CAST(day - DATE '1970-01-01' AS HUGEINT) * y)
                     OVER wt AS sxy
            FROM daily
            WINDOW wt AS (PARTITION BY event_type)),
      z AS (SELECT *, n * x - sx AS z,
                   n * sxy - sx * sy AS bn,
                   n * sxx - sx * sx AS bd
            FROM w WHERE n > 2),
      z2 AS (SELECT *, sum(z * z) OVER wt AS sz2
             FROM z WINDOW wt AS (PARTITION BY event_type)),
      e AS (SELECT *,
                   n * bd * y - sy * bd + bn * sx - n * bn * x AS ei
            FROM z2 WHERE bd > 0 AND sz2 > 0),
      e2 AS (SELECT *, sum(ei * ei) OVER wt AS se2
             FROM e WINDOW wt AS (PARTITION BY event_type))
      SELECT event_type, day,
             CAST(1000000 * (sz2 + n * z * z) // (n * sz2) AS BIGINT)
               AS leverage_e6,
             CAST(CASE WHEN ei >= 0 THEN ei * 100 // (n * bd)
                       ELSE -((-ei) * 100 // (n * bd)) END AS BIGINT)
               AS resid_e2,
             n * z * z > 3 * sz2 AS high_leverage,
             (n - 2) * ei * ei > 4 * se2 AS outlier
      FROM e2""")),

    Q("q_croston", croston, Some(crostonOracle)),
    Q("q_holt_linear", holtLinear, Some(holtOracle)),

    Q("q_pacf", pacf, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events WHERE value IS NOT NULL),
      d AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS x
            FROM e GROUP BY 1, 2),
      l AS (SELECT event_type, x,
                   lead(x, 1) OVER (PARTITION BY event_type
                     ORDER BY day ASC) AS x1,
                   lead(x, 2) OVER (PARTITION BY event_type
                     ORDER BY day ASC) AS x2,
                   lead(x, 3) OVER (PARTITION BY event_type
                     ORDER BY day ASC) AS x3
            FROM d),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sxs,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * x1) AS BIGINT) AS sxy1,
                   CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END)
                     AS BIGINT) AS sa1,
                   CAST(sum(x1) AS BIGINT) AS sb1,
                   CAST(sum(x * x2) AS BIGINT) AS sxy2,
                   CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END)
                     AS BIGINT) AS sa2,
                   CAST(sum(x2) AS BIGINT) AS sb2,
                   CAST(sum(x * x3) AS BIGINT) AS sxy3,
                   CAST(sum(CASE WHEN x3 IS NOT NULL THEN x END)
                     AS BIGINT) AS sa3,
                   CAST(sum(x3) AS BIGINT) AS sb3
            FROM l GROUP BY 1),
      m AS (SELECT *, CAST(sxs AS DOUBLE) / n AS mm FROM a),
      c AS (SELECT *,
                   (CAST(sxx AS DOUBLE) - CAST(sxs AS DOUBLE) * mm)
                     / n AS c0
            FROM m),
      r AS (SELECT *,
                   (CAST(sxy1 AS DOUBLE) - mm * (sa1 + sb1)
                     + (n - 1) * mm * mm) / n / c0 AS r1,
                   (CAST(sxy2 AS DOUBLE) - mm * (sa2 + sb2)
                     + (n - 2) * mm * mm) / n / c0 AS r2,
                   (CAST(sxy3 AS DOUBLE) - mm * (sa3 + sb3)
                     + (n - 3) * mm * mm) / n / c0 AS r3
            FROM c),
      p2 AS (SELECT *, r1 AS p11, 1.0 - r1 * r1 AS den2 FROM r),
      p3 AS (SELECT *, (r2 - p11 * r1) / den2 AS p22 FROM p2),
      p4 AS (SELECT *, p11 - p22 * p11 AS p21 FROM p3),
      p5 AS (SELECT *, 1.0 - (p21 * r1 + p22 * r2) AS den3 FROM p4),
      p6 AS (SELECT *,
                   (r3 - (p21 * r2 + p22 * r1)) / den3 AS p33
             FROM p5)
      SELECT event_type, n AS n_days,
             CASE WHEN c0 > 0 THEN
               CAST(floor(r1 * 1000000.0) AS BIGINT) END AS r1_e6,
             CASE WHEN c0 > 0 THEN
               CAST(floor(r2 * 1000000.0) AS BIGINT) END AS r2_e6,
             CASE WHEN c0 > 0 THEN
               CAST(floor(r3 * 1000000.0) AS BIGINT) END AS r3_e6,
             CASE WHEN c0 > 0 AND abs(den2) > 0 THEN
               CAST(floor(p22 * 1000000.0) AS BIGINT) END AS pacf2_e6,
             CASE WHEN c0 > 0 AND abs(den2) > 0 AND abs(den3) > 0 THEN
               CAST(floor(p33 * 1000000.0) AS BIGINT) END AS pacf3_e6
      FROM p6""")),

    Q("q_ar2_forecast", ar2Forecast, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events WHERE value IS NOT NULL),
      d AS (SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS x
            FROM e GROUP BY 1, 2),
      l AS (SELECT event_type, x,
                   lead(x, 1) OVER (PARTITION BY event_type
                     ORDER BY day ASC) AS x1,
                   lead(x, 2) OVER (PARTITION BY event_type
                     ORDER BY day ASC) AS x2,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY day DESC) AS rn
            FROM d),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sxs,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * x1) AS BIGINT) AS sxy1,
                   CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END)
                     AS BIGINT) AS sa1,
                   CAST(sum(x1) AS BIGINT) AS sb1,
                   CAST(sum(x * x2) AS BIGINT) AS sxy2,
                   CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END)
                     AS BIGINT) AS sa2,
                   CAST(sum(x2) AS BIGINT) AS sb2,
                   CAST(max(CASE WHEN rn = 1 THEN x END) AS BIGINT)
                     AS xn,
                   CAST(max(CASE WHEN rn = 2 THEN x END) AS BIGINT)
                     AS xn1
            FROM l GROUP BY 1),
      m AS (SELECT *, CAST(sxs AS DOUBLE) / n AS mm FROM a),
      c AS (SELECT *,
                   (CAST(sxx AS DOUBLE) - CAST(sxs AS DOUBLE) * mm)
                     / n AS c0
            FROM m),
      r AS (SELECT *,
                   (CAST(sxy1 AS DOUBLE) - mm * (sa1 + sb1)
                     + (n - 1) * mm * mm) / n / c0 AS r1,
                   (CAST(sxy2 AS DOUBLE) - mm * (sa2 + sb2)
                     + (n - 2) * mm * mm) / n / c0 AS r2
            FROM c),
      p AS (SELECT *, 1.0 - r1 * r1 AS den FROM r),
      f0 AS (SELECT *, r1 * (1.0 - r2) / den AS phi1,
                    (r2 - r1 * r1) / den AS phi2
             FROM p),
      f1c AS (SELECT *, mm + phi1 * (xn - mm) + phi2 * (xn1 - mm)
                      AS f1
              FROM f0),
      f2c AS (SELECT *, mm + phi1 * (f1 - mm) + phi2 * (xn - mm)
                      AS f2
              FROM f1c),
      f3c AS (SELECT *, mm + phi1 * (f2 - mm) + phi2 * (f1 - mm)
                      AS f3
              FROM f2c)
      SELECT event_type, n AS n_days,
             CASE WHEN c0 > 0 AND abs(den) > 0 AND n >= 3 THEN
               CAST(floor(phi1 * 1000000.0) AS BIGINT) END AS phi1_e6,
             CASE WHEN c0 > 0 AND abs(den) > 0 AND n >= 3 THEN
               CAST(floor(phi2 * 1000000.0) AS BIGINT) END AS phi2_e6,
             CASE WHEN c0 > 0 AND abs(den) > 0 AND n >= 3 THEN
               CAST(floor(f1) AS BIGINT) END AS f1_cents,
             CASE WHEN c0 > 0 AND abs(den) > 0 AND n >= 3 THEN
               CAST(floor(f2) AS BIGINT) END AS f2_cents,
             CASE WHEN c0 > 0 AND abs(den) > 0 AND n >= 3 THEN
               CAST(floor(f3) AS BIGINT) END AS f3_cents
      FROM f3c""")),

    Q("q_psi_drift", psiDrift, Some("""
      WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
                 FROM orders),
      b AS (SELECT least(CAST(floor((o_totalprice - s.mn)
                                    / ((s.mx - s.mn) / 10)) AS BIGINT),
                         9) AS bin,
                   o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
            FROM orders CROSS JOIN s),
      c AS (SELECT bin,
                   sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                   sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_n
            FROM b GROUP BY 1),
      t AS (SELECT sum(ref_n) AS ref_tot, sum(cur_n) AS cur_tot FROM c),
      u AS (SELECT c.bin, c.ref_n, c.cur_n,
                   CAST((CAST((c.ref_n + 1) * (t.cur_tot + 10)
                              - (c.cur_n + 1) * (t.ref_tot + 10)
                              AS HUGEINT)
                         * CAST(CAST(round(
                               ln(((c.ref_n + 1) / (t.ref_tot + 10))
                                  / ((c.cur_n + 1) / (t.cur_tot + 10))), 6)
                             AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                         * 1000)
                        // ((t.ref_tot + 10) * (t.cur_tot + 10))
                        AS BIGINT)
                     AS psi_term_units
            FROM c CROSS JOIN t)
      SELECT bin, CAST(ref_n AS BIGINT) AS ref_n,
             CAST(cur_n AS BIGINT) AS cur_n, psi_term_units,
             CAST(sum(psi_term_units) OVER () AS BIGINT)
               AS psi_total_units
      FROM u""")),

    Q("q_calendar_fill", calendarFill, Some("""
      WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                             count(*) AS n_events
                      FROM events
                      WHERE event_type = 'error' AND value > 200.0
                      GROUP BY 1, 2),
      b AS (SELECT event_type, min(hr) AS t0, max(hr) AS t1
            FROM hourly GROUP BY 1),
      spine AS (SELECT b.event_type, gs.g AS hr
                FROM b
                JOIN generate_series(TIMESTAMP '2024-01-01',
                                     TIMESTAMP '2027-01-01',
                                     INTERVAL 1 HOUR) gs(g)
                  ON gs.g BETWEEN b.t0 AND b.t1)
      SELECT s.event_type, epoch_us(s.hr) AS hr_us,
             coalesce(h.n_events, 0) AS n_events,
             h.n_events IS NULL AS was_gap
      FROM spine s
      LEFT JOIN hourly h ON s.event_type = h.event_type
                        AND s.hr = h.hr""")),

    Q("q_chow_break", chowBreak, Some("""
      WITH weekly AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01',
                 CAST(ts AS DATE)) // 7 AS BIGINT) AS wk,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      x1 AS (SELECT event_type,
                    wk - min(wk) OVER (PARTITION BY event_type) AS x,
                    y
             FROM weekly),
      xd AS (SELECT event_type, x, y,
                    CASE WHEN x * 2
                      < max(x) OVER (PARTITION BY event_type)
                      THEN 1 ELSE 2 END AS seg
             FROM x1),
      mp AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    sum(CAST(y AS HUGEINT) * y) AS syy
             FROM xd GROUP BY 1),
      m1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    sum(CAST(y AS HUGEINT) * y) AS syy
             FROM xd WHERE seg = 1 GROUP BY 1),
      m2 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    sum(CAST(y AS HUGEINT) * y) AS syy
             FROM xd WHERE seg = 2 GROUP BY 1),
      ss AS (SELECT p.event_type,
                    p.n AS n_weeks, a.n AS n_seg1, b.n AS n_seg2,
                    CASE WHEN p.n * p.sxx - p.sx * p.sx > 0 THEN
                      CAST(((p.n * p.sxx - p.sx * p.sx) * p.syy
                        - CAST(p.sy AS HUGEINT)
                          * (p.sy * p.sxx - p.sx * p.sxy)
                        - CAST(p.sxy AS HUGEINT)
                          * (p.n * p.sxy - p.sx * p.sy))
                        // (p.n * p.sxx - p.sx * p.sx) AS BIGINT)
                    END AS ssr_pooled,
                    CASE WHEN a.n * a.sxx - a.sx * a.sx > 0 THEN
                      CAST(((a.n * a.sxx - a.sx * a.sx) * a.syy
                        - CAST(a.sy AS HUGEINT)
                          * (a.sy * a.sxx - a.sx * a.sxy)
                        - CAST(a.sxy AS HUGEINT)
                          * (a.n * a.sxy - a.sx * a.sy))
                        // (a.n * a.sxx - a.sx * a.sx) AS BIGINT)
                    END AS ssr_seg1,
                    CASE WHEN b.n * b.sxx - b.sx * b.sx > 0 THEN
                      CAST(((b.n * b.sxx - b.sx * b.sx) * b.syy
                        - CAST(b.sy AS HUGEINT)
                          * (b.sy * b.sxx - b.sx * b.sxy)
                        - CAST(b.sxy AS HUGEINT)
                          * (b.n * b.sxy - b.sx * b.sy))
                        // (b.n * b.sxx - b.sx * b.sx) AS BIGINT)
                    END AS ssr_seg2
             FROM mp p JOIN m1 a USING (event_type)
                       JOIN m2 b USING (event_type))
      SELECT event_type, n_weeks, n_seg1, n_seg2,
             ssr_pooled, ssr_seg1, ssr_seg2,
             CASE WHEN n_seg1 >= 3 AND n_seg2 >= 3
                    AND ssr_seg1 IS NOT NULL AND ssr_seg2 IS NOT NULL
                    AND ssr_seg1 + ssr_seg2 > 0 THEN
               CAST(CAST(1000000 AS HUGEINT) * (n_weeks - 4)
                 * greatest(ssr_pooled - ssr_seg1 - ssr_seg2, 0)
                 // (2 * (ssr_seg1 + ssr_seg2)) AS BIGINT)
             END AS f_e6
      FROM ss""")),

    Q("q_group_ols", groupOls, Some("""
      WITH e AS (SELECT event_type,
                        CAST(datediff('day', DATE '2024-01-01',
                          CAST(ts AS DATE)) AS BIGINT) AS x,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS y
                 FROM events),
      m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM e GROUP BY 1)
      SELECT event_type, n,
             CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
             CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
             (n * sxy - sx * sy) / (n * sxx - sx * sx)
               AS slope_cents_per_day,
             sy / n AS mean_cents
      FROM m""")),

    Q("q_ridge_trend", ridgeTrend, Some("""
      WITH e AS (SELECT event_type,
                        CAST(datediff('day', DATE '2024-01-01',
                          CAST(ts AS DATE)) AS BIGINT) AS x,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS y
                 FROM events WHERE value IS NOT NULL),
      m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM e GROUP BY 1),
      c AS (SELECT event_type, n,
                   CAST(n * sxy - sx * sy AS BIGINT) AS sxy_c,
                   CAST(n * sxx - sx * sx AS BIGINT) AS sxx_c
            FROM m)
      SELECT event_type, n, sxy_c, sxx_c,
             CAST(CAST(sxy_c AS HUGEINT) * 1000000 // sxx_c
               AS BIGINT) AS slope0_e6,
             CAST(CAST(sxy_c AS HUGEINT) * 1000000
               // (sxx_c + sxx_c // 10) AS BIGINT) AS slope10_e6,
             CAST(CAST(sxy_c AS HUGEINT) * 1000000
               // (sxx_c + sxx_c // 2) AS BIGINT) AS slope50_e6
      FROM c""")),

    Q("q_rolling_anomaly", rollingAnomaly, Some("""
      WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us, ts,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS cents
                 FROM events),
      r AS (SELECT event_id, event_type, ts_us, cents,
                   count(*) OVER w AS n,
                   sum(cents) OVER w AS sw,
                   sum(cents * cents) OVER w AS qw
            FROM e
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
      SELECT event_id, event_type, ts_us, cents, n,
             CAST((n * cents - sw) * (n * cents - sw) AS BIGINT) AS dev2_n2,
             CAST(n * qw - sw * sw AS BIGINT) AS var_n2
      FROM r
      WHERE n >= 10
        AND (n * cents - sw) * (n * cents - sw) > 9 * (n * qw - sw * sw)""")),

    Q("q_feature_lags", featureLags, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                                          * 100 AS BIGINT)) AS BIGINT)
                              AS cents,
                            count(*) AS n
                     FROM events GROUP BY 1, 2)
      SELECT event_type, day, cents, n,
             lag(cents, 1) OVER w AS lag1_cents,
             lag(cents, 7) OVER w AS lag7_cents,
             CAST(sum(cents) OVER (PARTITION BY event_type
               ORDER BY day ASC
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS roll7_cents
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)""")),

    Q("q_seasonality", seasonality, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                                          * 100 AS BIGINT)) AS BIGINT)
                              AS cents
                     FROM events GROUP BY 1, 2),
      dw AS (SELECT event_type, CAST(isodow(day) % 7 + 1 AS BIGINT)
                      AS dow,
                    count(*) AS n_days, sum(cents) AS sum_cents
             FROM daily GROUP BY 1, 2),
      t AS (SELECT event_type, sum(n_days) AS n_all,
                   sum(sum_cents) AS sum_all
            FROM dw GROUP BY 1)
      SELECT dw.event_type, dow, CAST(n_days AS BIGINT) AS n_days,
             CAST(sum_cents AS BIGINT) AS sum_cents,
             CAST(sum_cents * n_all AS DOUBLE) / (n_days * sum_all)
               AS seasonal_index
      FROM dw JOIN t ON dw.event_type = t.event_type""")),

    Q("q_bhattacharyya", bhattacharyya, Some("""
      WITH cells AS (SELECT dayofweek(ts) AS dow,
              CAST(sum(CASE WHEN event_type = 'click'
                THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                ELSE 0 END) AS HUGEINT) AS cw,
              CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                ELSE 0 END) AS HUGEINT) AS dw
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'purchase')
            GROUP BY 1),
      tot AS (SELECT sum(cw) AS n, sum(dw) AS m FROM cells),
      sh AS (SELECT dow,
                    CAST(cw * 1000000 // n AS BIGINT) AS p_e6,
                    CAST(dw * 1000000 // m AS BIGINT) AS q_e6
             FROM cells, tot WHERE n > 0 AND m > 0),
      t AS (SELECT dow, p_e6 * q_e6 AS w,
                   CAST(floor(sqrt(CAST(p_e6 * q_e6 AS DOUBLE)))
                     AS BIGINT) AS kd
            FROM sh),
      r AS (SELECT dow,
                   CASE WHEN (kd + 1) * (kd + 1) <= w THEN kd + 1
                        WHEN kd * kd <= w THEN kd
                        ELSE kd - 1 END AS term
            FROM t)
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(term) AS BIGINT) AS bc_e6,
             CAST(1000000 - sum(term) AS BIGINT) AS hellinger2_e6
      FROM r""")),

    Q("q_page_hinkley", pageHinkley, Some(s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS x
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      w1 AS (SELECT event_type, day, x,
                    CAST(row_number() OVER win AS BIGINT) AS i,
                    sum(x) OVER win AS cum
             FROM daily
             WINDOW win AS (PARTITION BY event_type ORDER BY day ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)),
      w2 AS (SELECT *,
                    CASE WHEN CAST(x AS HUGEINT) * i - cum >= 0
                      THEN CAST((CAST(x AS HUGEINT) * i - cum)
                        * 1000000 // i AS BIGINT)
                      ELSE -CAST((cum - CAST(x AS HUGEINT) * i)
                        * 1000000 // i AS BIGINT) END AS dev_e6
             FROM w1),
      w3 AS (SELECT *, sum(dev_e6) OVER win AS m
             FROM w2
             WINDOW win AS (PARTITION BY event_type ORDER BY day ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)),
      w4 AS (SELECT *, m - min(m) OVER win AS gap
             FROM w3
             WINDOW win AS (PARTITION BY event_type ORDER BY day ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)),
      w5 AS (SELECT *,
                    max(gap) OVER wt AS maxgap,
                    count(*) OVER wt AS n_days,
                    max(cum) OVER wt AS sum_all
             FROM w4
             WINDOW wt AS (PARTITION BY event_type)),
      g AS (SELECT event_type,
                   CAST(max(n_days) AS BIGINT) AS n_days,
                   CAST(max(maxgap) AS BIGINT) AS ph_max_e6,
                   min(day) AS alarm_day,
                   CAST(max(sum_all) AS BIGINT) AS sum_all
            FROM w5 WHERE gap = maxgap GROUP BY 1)
      SELECT event_type, n_days, ph_max_e6, alarm_day,
             CAST(ph_max_e6 AS HUGEINT) * n_days
               > CAST(sum_all AS HUGEINT) * $PhLambdaMeans * 1000000
               AS drift_flag
      FROM g""")),

    Q("q_cusum_drift", cusumDrift, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                                          * 100 AS BIGINT)) AS BIGINT)
                              AS cents
                     FROM events GROUP BY 1, 2),
      sc AS (SELECT event_type, day, cents,
                    sum(cents) OVER (PARTITION BY event_type
                      ORDER BY day ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum,
                    CAST(row_number() OVER (PARTITION BY event_type
                      ORDER BY day ASC) AS BIGINT) AS rank_day
             FROM daily),
      t AS (SELECT event_type, count(*) AS n_all, sum(cents) AS sum_all
            FROM sc GROUP BY 1),
      dev AS (SELECT sc.event_type, day, rank_day, n_all,
                     n_all * cum - rank_day * sum_all AS cusum_scaled,
                     abs(n_all * cum - rank_day * sum_all) AS abs_cusum
              FROM sc JOIN t ON sc.event_type = t.event_type),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY abs_cusum DESC, day ASC) AS rn
            FROM dev)
      SELECT event_type, day AS changepoint_day,
             rank_day AS day_index, CAST(n_all AS BIGINT) AS n_all,
             CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
             CAST(abs_cusum AS BIGINT) AS abs_cusum
      FROM r WHERE rn = 1""")),

    Q("q_autocorr", autocorr, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                                          * 100 AS BIGINT)) AS BIGINT)
                              AS x
                     FROM events GROUP BY 1, 2),
      p AS (SELECT event_type, day, x,
                   lag(x, 1) OVER w AS x_prev,
                   lag(day, 1) OVER w AS day_prev
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)),
      pairs AS (SELECT * FROM p
                WHERE x_prev IS NOT NULL
                  AND date_diff('day', day_prev, day) = 1),
      m AS (SELECT event_type, count(*) AS n_pairs, sum(x) AS sx,
                   sum(x_prev) AS sy, sum(x * x) AS sxx,
                   sum(x_prev * x_prev) AS syy, sum(x * x_prev) AS sxy
            FROM pairs GROUP BY 1)
      SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
             CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
             CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
             CAST(sxy AS BIGINT) AS sxy,
             CAST(floor((CAST(sxy AS DOUBLE) / n_pairs
                     - (CAST(sx AS DOUBLE) / n_pairs)
                       * (CAST(sy AS DOUBLE) / n_pairs))
                   / (sqrt(CAST(sxx AS DOUBLE) / n_pairs
                           - (CAST(sx AS DOUBLE) / n_pairs)
                             * (CAST(sx AS DOUBLE) / n_pairs))
                      * sqrt(CAST(syy AS DOUBLE) / n_pairs
                             - (CAST(sy AS DOUBLE) / n_pairs)
                               * (CAST(sy AS DOUBLE) / n_pairs)))
                   * 1000000.0) AS BIGINT)
               AS autocorr_e6
      FROM m""")),

    Q("q_locf_fill", locfFill, Some("""
      WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                        event_type,
                        CASE WHEN event_type = 'click' THEN value END
                          AS reading
                 FROM events WHERE user_id < 10),
      f AS (SELECT *, last_value(reading IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
            FROM e)
      SELECT event_id, user_id, ts_us, event_type, reading, filled,
             (reading IS NULL AND filled IS NOT NULL) AS is_filled
      FROM f""")),

    Q("q_event_debounce", debounce, Some("""
      WITH g AS (SELECT event_type,
                        epoch_us(ts) - epoch_us(lag(ts) OVER (
                          PARTITION BY user_id, event_type
                          ORDER BY ts ASC, event_id ASC)) AS gap_us
                 FROM events)
      SELECT event_type, count(*) AS n_total,
             CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 5000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(count(*) - sum(CASE WHEN gap_us IS NULL
                                        OR gap_us > 5000000
                                      THEN 1 ELSE 0 END) AS BIGINT)
               AS n_debounced
      FROM g GROUP BY 1""")),

    Q("q_date_gaps", dateGaps, Some("""
      WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events)
      SELECT event_type, min(day) AS first_day, max(day) AS last_day,
             CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT)
               AS span_days,
             CAST(count(DISTINCT day) AS BIGINT) AS active_days,
             CAST(date_diff('day', min(day), max(day)) + 1
                  - count(DISTINCT day) AS BIGINT) AS gap_days
      FROM d GROUP BY 1""")),

    Q("q_session_paths", sessionPaths, Some("""
      WITH seq AS (SELECT user_id, event_id, ts, event_type,
                          lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS prev_ts
                   FROM events),
      marked AS (SELECT user_id, event_id, ts, event_type,
                        CASE WHEN prev_ts IS NULL OR
                                  epoch_us(ts) - epoch_us(prev_ts)
                                    > 600000000
                             THEN 1 ELSE 0 END AS is_new
                 FROM seq),
      numbered AS (SELECT user_id, event_id, ts, event_type,
                          sum(is_new) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS sess
                   FROM marked),
      paths AS (SELECT user_id, sess,
                       string_agg(event_type, '>'
                         ORDER BY ts ASC, event_id ASC) AS path
                FROM numbered GROUP BY 1, 2)
      SELECT path, count(*) AS n_sessions
      FROM paths GROUP BY 1
      ORDER BY n_sessions DESC, path ASC LIMIT 10""")),

    Q("q_markov_transitions", markovTransitions, Some("""
      WITH seq AS (SELECT user_id, event_type,
                          lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS prev_type
                   FROM events),
      pairs AS (SELECT prev_type, event_type AS next_type,
                       count(*) AS cnt
                FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT prev_type, sum(cnt) AS tot FROM pairs GROUP BY 1)
      SELECT p.prev_type, p.next_type, CAST(p.cnt AS BIGINT) AS cnt,
             round(p.cnt / t.tot, 4) AS p_next
      FROM pairs p JOIN tot t USING (prev_type)""")),

    Q("q_logistic_irls", logisticIrls, Some("""
      WITH rows0 AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               event_id % 2 = 0 AS is_train
        FROM events WHERE value IS NOT NULL),
      rx AS (SELECT y, cents, CAST(cents AS DOUBLE) / 10000.0 AS x,
                    is_train
             FROM rows0),
      it1a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(cents) AS BIGINT) AS sx_c,
                      CAST(sum(cents * cents) AS BIGINT) AS sxx_c,
                      CAST(sum(y * cents) AS BIGINT) AS sxy_c
               FROM rx WHERE is_train),
      it1b AS (SELECT n, sy,
                      CAST(sx_c AS DOUBLE) / 10000.0 AS sx,
                      CAST(sxx_c AS DOUBLE) / 100000000.0 AS sxx,
                      CAST(sxy_c AS DOUBLE) / 10000.0 AS sxy
               FROM it1a),
      it1c AS (SELECT n, sx, sxx,
                      sy - n / 2.0 AS g0,
                      sxy - sx / 2.0 AS g1
               FROM it1b),
      it1d AS (SELECT n, sx, sxx, g0, g1,
                      n / 4.0 * (sxx / 4.0)
                        - (sx / 4.0) * (sx / 4.0) AS det
               FROM it1c),
      it1f AS (SELECT
                 ((sxx / 4.0) * g0 - (sx / 4.0) * g1) / det AS b0,
                 ((n / 4.0) * g1 - (sx / 4.0) * g0) / det AS b1
               FROM it1d),
      m2 AS (SELECT r.y, r.x, i.b0, i.b1,
                    1.0 / (1.0 + exp(-(i.b0 + i.b1 * r.x))) AS mu
             FROM rx r CROSS JOIN it1f i WHERE r.is_train),
      t2 AS (SELECT b0, b1,
                    CAST(floor(mu * (1.0 - mu) * 1000000000.0)
                      AS BIGINT) AS tw,
                    CAST(floor(mu * (1.0 - mu) * x * 1000000000.0)
                      AS BIGINT) AS twx,
                    CAST(floor(mu * (1.0 - mu) * x * x
                      * 1000000000.0) AS BIGINT) AS twxx,
                    CAST(floor((y - mu) * 1000000000.0) AS BIGINT)
                      AS tg0,
                    CAST(floor((y - mu) * x * 1000000000.0)
                      AS BIGINT) AS tg1
             FROM m2),
      a2 AS (SELECT b0, b1,
                    CAST(sum(tw) AS BIGINT) AS sw,
                    CAST(sum(twx) AS BIGINT) AS swx,
                    CAST(sum(twxx) AS BIGINT) AS swxx,
                    CAST(sum(tg0) AS BIGINT) AS sg0,
                    CAST(sum(tg1) AS BIGINT) AS sg1,
                    CAST(count(*) AS BIGINT) AS n_train
             FROM t2 GROUP BY 1, 2),
      beta AS (SELECT n_train, b0, b1,
                      b0 + (CAST(swxx AS DOUBLE) / 1e9
                              * (CAST(sg0 AS DOUBLE) / 1e9)
                            - CAST(swx AS DOUBLE) / 1e9
                              * (CAST(sg1 AS DOUBLE) / 1e9))
                        / ((CAST(sw AS DOUBLE) * swxx
                            - CAST(swx AS DOUBLE) * swx) / 1e18)
                        AS beta0,
                      b1 + (CAST(sw AS DOUBLE) / 1e9
                              * (CAST(sg1 AS DOUBLE) / 1e9)
                            - CAST(swx AS DOUBLE) / 1e9
                              * (CAST(sg0 AS DOUBLE) / 1e9))
                        / ((CAST(sw AS DOUBLE) * swxx
                            - CAST(swx AS DOUBLE) * swx) / 1e18)
                        AS beta1
               FROM a2),
      tl AS (SELECT b.n_train, b.beta0, b.beta1,
                    CAST(floor((CAST(r.y AS DOUBLE)
                        * (b.beta0 + b.beta1 * r.x)
                      - ln(1.0 + exp(b.beta0 + b.beta1 * r.x)))
                      * 1000000000.0) AS BIGINT) AS tll
             FROM rx r CROSS JOIN beta b WHERE NOT r.is_train)
      SELECT n_train, CAST(count(*) AS BIGINT) AS n_test,
             CAST(floor(beta0 * 1000000.0) AS BIGINT) AS beta0_e6,
             CAST(floor(beta1 * 1000000.0) AS BIGINT) AS beta1_e6,
             CAST((-CAST(sum(tll) AS BIGINT))
               // CAST(count(*) AS BIGINT) AS BIGINT)
               AS neg_mean_ll_e9
      FROM tl GROUP BY n_train, beta0, beta1"""),
      // headline (round 12, VERDICT r11 #5): second bench
      // representative for the fit-in-engine tier — two unrolled
      // Newton steps as scan-aggregates; a plan regression in the
      // model-fitting queries should be caught by BENCH, not only
      // by the oracle
      headline = true),

    Q("q_winsorize", winsorize, Some("""
      WITH base AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
        FROM events WHERE value IS NOT NULL),
      ranked AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base),
      bounds AS (
        SELECT event_type,
               max(CASE WHEN rn = greatest(1, 5 * n // 100)
                        THEN cents END) AS lo,
               max(CASE WHEN rn = least(n, 95 * n // 100 + 1)
                        THEN cents END) AS hi,
               max(n) AS n
        FROM ranked GROUP BY 1)
      SELECT b.event_type,
             CAST(max(bo.n) AS BIGINT) AS n,
             CAST(max(bo.lo) AS BIGINT) AS lo,
             CAST(max(bo.hi) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN b.cents < bo.lo THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clip_lo,
             CAST(sum(CASE WHEN b.cents > bo.hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clip_hi,
             CAST(sum(greatest(bo.lo, least(bo.hi, b.cents)))
               AS BIGINT) AS wins_sum,
             CAST(sum(greatest(bo.lo, least(bo.hi, b.cents))) * 100
               // max(bo.n) AS BIGINT) AS wins_mean_e2
      FROM base b JOIN bounds bo ON b.event_type = bo.event_type
      GROUP BY 1""")),

    Q("q_robust_scale", robustScale, Some("""
      WITH m AS (SELECT quantile_cont(o_totalprice, 0.5) AS med
                 FROM orders),
      s AS (SELECT quantile_cont(abs(o_totalprice - m.med), 0.5) AS mad,
                   max(m.med) AS med
            FROM orders, m),
      f AS (SELECT o_orderkey,
              CAST(floor((o_totalprice - s.med) / (1.4826 * s.mad)
                         * 10000) AS BIGINT) AS robust_z_e4,
              abs((o_totalprice - s.med) / (1.4826 * s.mad)) > 3.5
                AS is_outlier
            FROM orders, s)
      SELECT o_orderkey, robust_z_e4, is_outlier,
             CAST(robust_z_e4 AS DOUBLE) / 10000.0 AS robust_z
      FROM f""")),

    Q("q_time_decay", timeDecay, Some("""
      WITH r AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
      t AS (SELECT e.event_type, e.value,
                   CAST(round(e.value /
                     (1.0 + date_diff('day', CAST(e.ts AS DATE), r.ref_day)),
                     6) AS DECIMAL(18,6)) AS term
            FROM events e CROSS JOIN r)
      SELECT event_type, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS raw_total,
             round(CAST(sum(term) AS DOUBLE), 4) AS decayed_total
      FROM t GROUP BY 1""")),

    Q("q_rolling_corr", rollingCorr, Some {
      // 11 unrolled binary-search steps, HUGEINT end to end — the
      // oracle replays the Spark bit descent literally, one CTE per
      // bit, so there is no sqrt/floor/double ANYWHERE to diverge
      val cols = "type_a, type_b, day, x, y, n_w, num, vx, vy, pp, a2"
      val steps = CorrSearchBits.zipWithIndex.map { case (b, i) =>
        val prev = if (i == 0) "c" else s"s$i"
        s"""s${i + 1} AS (SELECT $cols,
           CASE WHEN (t + $b) * (t + $b) * pp <= a2
                THEN t + $b ELSE t END AS t FROM $prev)"""
      }.mkString(",\n      ")
      s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS day_cents
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.day, a.day_cents AS x, b.day_cents AS y
                FROM daily a JOIN daily b ON a.day = b.day
                WHERE a.event_type < b.event_type),
      w AS (SELECT type_a, type_b, day, x, y,
                   count(*) OVER win AS n_w,
                   sum(x) OVER win AS sx, sum(y) OVER win AS sy,
                   sum(x * y) OVER win AS sxy,
                   sum(x * x) OVER win AS sxx,
                   sum(y * y) OVER win AS syy
            FROM pairs
            WINDOW win AS (PARTITION BY type_a, type_b
                           ORDER BY day ASC
                           ROWS BETWEEN ${RollCorrWindow - 1} PRECEDING
                             AND CURRENT ROW)),
      m AS (SELECT type_a, type_b, day, x, y, n_w,
                   CAST(n_w * sxy - sx * sy AS BIGINT) AS num,
                   CAST(n_w * sxx - sx * sx AS BIGINT) AS vx,
                   CAST(n_w * syy - sy * sy AS BIGINT) AS vy
            FROM w),
      c AS (SELECT type_a, type_b, day, x, y, n_w, num, vx, vy,
                   CAST(vx AS HUGEINT) * CAST(vy AS HUGEINT) AS pp,
                   CAST(abs(num) AS HUGEINT) * CAST(abs(num) AS HUGEINT)
                     * 1000000 AS a2,
                   CAST(0 AS HUGEINT) AS t
            FROM m),
      $steps
      SELECT type_a, type_b, day,
             CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y, n_w,
             num, vx, vy,
             CAST(CASE WHEN vx > 0 AND vy > 0 THEN 1 ELSE 0 END
               AS BIGINT) AS corr_defined,
             CAST(CASE WHEN NOT (vx > 0 AND vy > 0) THEN -2000
                       WHEN num >= 0 THEN t
                       WHEN t * t * pp = a2 THEN -t
                       ELSE -(t + 1) END AS BIGINT) AS corr_e3
      FROM s${CorrSearchBits.size}"""
    },
      // headline (round 10): the 61-query stats/inference battery had
      // zero bench representation — this self-join + pair-partitioned
      // window is its regression canary
      headline = true),

    // bisection twin (VERDICT r11 #1): identical pipeline through
    // num/vx/vy with the correlation step OMITTED — if the driver's
    // gate ever reds q_rolling_corr again, this row localizes the
    // divergence (twin green => the corr_e3 step or its dtype
    // handling; twin red => upstream cents cast / window)
    Q("q_rolling_moments", rollingMoments, Some(s"""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS day_cents
                     FROM events WHERE value IS NOT NULL
                     GROUP BY 1, 2),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.day, a.day_cents AS x, b.day_cents AS y
                FROM daily a JOIN daily b ON a.day = b.day
                WHERE a.event_type < b.event_type),
      w AS (SELECT type_a, type_b, day, x, y,
                   count(*) OVER win AS n_w,
                   sum(x) OVER win AS sx, sum(y) OVER win AS sy,
                   sum(x * y) OVER win AS sxy,
                   sum(x * x) OVER win AS sxx,
                   sum(y * y) OVER win AS syy
            FROM pairs
            WINDOW win AS (PARTITION BY type_a, type_b
                           ORDER BY day ASC
                           ROWS BETWEEN ${RollCorrWindow - 1} PRECEDING
                             AND CURRENT ROW))
      SELECT type_a, type_b, day,
             CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y, n_w,
             CAST(n_w * sxy - sx * sy AS BIGINT) AS num,
             CAST(n_w * sxx - sx * sx AS BIGINT) AS vx,
             CAST(n_w * syy - sy * sy AS BIGINT) AS vy
      FROM w""")),

    Q("q_bootstrap_ci", bootstrapCi, Some(s"""
      WITH e AS (SELECT event_type, event_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      x AS (SELECT event_type, event_id, cents,
                   unnest(range(0, $BootstrapReplicates)) AS b
            FROM e),
      ww AS (SELECT event_type, b, cents,
                    CASE WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
                         WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3
                         WHEN u < 99634 THEN 4 ELSE 5 END AS w
             FROM (SELECT event_type, b, cents,
                          ((event_id + b * 1000003) * 2654435761)
                            % 4294967296 % 100000 AS u
                   FROM x)),
      rep AS (SELECT event_type, b, sum(w) AS n_w,
                     sum(w * cents) AS sum_wx
              FROM ww GROUP BY 1, 2),
      m AS (SELECT event_type, b, n_w,
                   CAST(sum_wx AS DOUBLE) / n_w AS mean_b,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY CAST(sum_wx AS DOUBLE) / n_w ASC, b ASC)
                     AS r_lo,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY CAST(sum_wx AS DOUBLE) / n_w DESC, b ASC)
                     AS r_hi
            FROM rep)
      SELECT event_type, count(*) AS n_replicates,
             CAST(sum(n_w) AS BIGINT) AS sum_w_all,
             max(CASE WHEN r_lo = 2 THEN mean_b END) AS ci_lo,
             max(CASE WHEN r_hi = 2 THEN mean_b END) AS ci_hi
      FROM m GROUP BY 1""")),

    Q("q_lateness_profile", latenessProfile, Some("""
      WITH e AS (SELECT event_type, user_id, event_id,
                        epoch_us(ts) AS ts_us
                 FROM events),
      w AS (SELECT event_type,
                   max(ts_us) OVER (PARTITION BY event_type, user_id
                     ORDER BY event_id ASC
                     ROWS UNBOUNDED PRECEDING) - ts_us AS late_us
            FROM e),
      bkt AS (SELECT event_type,
                     CASE WHEN late_us = 0 THEN '0_on_time'
                          WHEN late_us <= 1000000 THEN '1_le_1s'
                          WHEN late_us <= 60000000 THEN '2_le_1min'
                          WHEN late_us <= 600000000 THEN '3_le_10min'
                          ELSE '4_beyond' END AS bucket,
                     late_us
              FROM w)
      SELECT event_type, bucket, count(*) AS n,
             CAST(max(late_us) AS BIGINT) AS max_late_us
      FROM bkt GROUP BY 1, 2""")),

    Q("q_conversion_hazard", conversionHazard, Some("""
      WITH su AS (SELECT user_id, min(ts) AS s_ts
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, ts AS p_ts
             FROM events WHERE event_type = 'purchase'),
      per_user AS (SELECT su.user_id, su.s_ts,
                          min(CASE WHEN pu.p_ts >= su.s_ts
                                   THEN pu.p_ts END) AS c_ts
                   FROM su LEFT JOIN pu ON su.user_id = pu.user_id
                   GROUP BY 1, 2),
      oe AS (SELECT max(ts) AS end_ts FROM events),
      rows_t AS (SELECT CASE WHEN c_ts IS NOT NULL
                             THEN date_diff('day', CAST(s_ts AS DATE),
                                            CAST(c_ts AS DATE))
                             ELSE date_diff('day', CAST(s_ts AS DATE),
                                            CAST(end_ts AS DATE))
                        END AS t,
                        c_ts IS NOT NULL AS converted
                 FROM per_user CROSS JOIN oe),
      by_t AS (SELECT CAST(t AS BIGINT) AS t,
                      sum(CASE WHEN converted THEN 1 ELSE 0 END)
                        AS n_conv,
                      sum(CASE WHEN converted THEN 0 ELSE 1 END)
                        AS n_cens
               FROM rows_t GROUP BY 1),
      r AS (SELECT t, n_conv, n_cens,
                   sum(n_conv + n_cens) OVER () -
                     coalesce(sum(n_conv + n_cens) OVER (
                       ORDER BY t ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n_risk
            FROM by_t)
      SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             CAST(n_conv AS BIGINT) AS n_conv,
             CAST(n_cens AS BIGINT) AS n_cens,
             CAST(n_conv * 1000000 // n_risk AS BIGINT) AS hazard_e6
      FROM r WHERE n_conv > 0""")),

    Q("q_nelson_aalen", nelsonAalen, Some("""
      WITH su AS (SELECT user_id, min(ts) AS s_ts
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, ts AS p_ts
             FROM events WHERE event_type = 'purchase'),
      per_user AS (SELECT su.user_id, su.s_ts,
                          min(CASE WHEN pu.p_ts >= su.s_ts
                                   THEN pu.p_ts END) AS c_ts
                   FROM su LEFT JOIN pu ON su.user_id = pu.user_id
                   GROUP BY 1, 2),
      oe AS (SELECT max(ts) AS end_ts FROM events),
      rows_t AS (SELECT CASE WHEN c_ts IS NOT NULL
                             THEN date_diff('day', CAST(s_ts AS DATE),
                                            CAST(c_ts AS DATE))
                             ELSE date_diff('day', CAST(s_ts AS DATE),
                                            CAST(end_ts AS DATE))
                        END AS t,
                        c_ts IS NOT NULL AS converted
                 FROM per_user CROSS JOIN oe),
      by_t AS (SELECT CAST(t AS BIGINT) AS t,
                      sum(CASE WHEN converted THEN 1 ELSE 0 END)
                        AS n_conv,
                      sum(CASE WHEN converted THEN 0 ELSE 1 END)
                        AS n_cens
               FROM rows_t GROUP BY 1),
      r AS (SELECT t, n_conv, n_cens,
                   sum(n_conv + n_cens) OVER () -
                     coalesce(sum(n_conv + n_cens) OVER (
                       ORDER BY t ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n_risk
            FROM by_t)
      SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             CAST(n_conv AS BIGINT) AS n_conv,
             CAST(n_cens AS BIGINT) AS n_cens,
             CAST(sum(n_conv * 1000000 // n_risk) OVER (
               ORDER BY t ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS na_e6,
             CAST(sum(n_conv * 1000000000 // (n_risk * n_risk)) OVER (
               ORDER BY t ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS na_var_e9
      FROM r""")),

    Q("q_kaplan_meier", kaplanMeier, Some("""
      WITH su AS (SELECT user_id, min(ts) AS s_ts
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, ts AS p_ts
             FROM events WHERE event_type = 'purchase'),
      per_user AS (SELECT su.user_id, su.s_ts,
                          min(CASE WHEN pu.p_ts >= su.s_ts
                                   THEN pu.p_ts END) AS c_ts
                   FROM su LEFT JOIN pu ON su.user_id = pu.user_id
                   GROUP BY 1, 2),
      oe AS (SELECT max(ts) AS end_ts FROM events),
      rows_t AS (SELECT CASE WHEN c_ts IS NOT NULL
                             THEN date_diff('day', CAST(s_ts AS DATE),
                                            CAST(c_ts AS DATE))
                             ELSE date_diff('day', CAST(s_ts AS DATE),
                                            CAST(end_ts AS DATE))
                        END AS t,
                        c_ts IS NOT NULL AS converted
                 FROM per_user CROSS JOIN oe),
      by_t AS (SELECT CAST(t AS BIGINT) AS t,
                      sum(CASE WHEN converted THEN 1 ELSE 0 END)
                        AS n_conv,
                      sum(CASE WHEN converted THEN 0 ELSE 1 END)
                        AS n_cens
               FROM rows_t GROUP BY 1),
      r AS (SELECT t, n_conv, n_cens,
                   sum(n_conv + n_cens) OVER () -
                     coalesce(sum(n_conv + n_cens) OVER (
                       ORDER BY t ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n_risk
            FROM by_t),
      terms AS (SELECT t, n_risk, n_conv, n_cens,
                       CASE WHEN n_conv < n_risk THEN
                         CAST(floor(ln(CAST(n_risk - n_conv AS DOUBLE)
                           / CAST(n_risk AS DOUBLE)) * 1000000000.0)
                           AS BIGINT) END AS term_e9,
                       CASE WHEN n_conv < n_risk THEN
                         CAST(n_conv * 1000000000
                           // (n_risk * (n_risk - n_conv)) AS BIGINT)
                       END AS gw_term_e9
                FROM r)
      SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             CAST(n_conv AS BIGINT) AS n_conv,
             CAST(n_cens AS BIGINT) AS n_cens,
             CAST(sum(term_e9) OVER (ORDER BY t ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS lns_e9,
             CAST(sum(gw_term_e9) OVER (ORDER BY t ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS gw_e9,
             CAST(max(CASE WHEN n_conv = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS absorbed
      FROM terms""")),

    Q("q_logrank_test", logrank, Some("""
      WITH su AS (SELECT user_id, min(ts) AS s_ts
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, ts AS p_ts
             FROM events WHERE event_type = 'purchase'),
      per_user AS (SELECT su.user_id, su.s_ts,
                          min(CASE WHEN pu.p_ts >= su.s_ts
                                   THEN pu.p_ts END) AS c_ts
                   FROM su LEFT JOIN pu ON su.user_id = pu.user_id
                   GROUP BY 1, 2),
      oe AS (SELECT max(ts) AS end_ts FROM events),
      rows_t AS (SELECT CASE WHEN c_ts IS NOT NULL
                             THEN date_diff('day', CAST(s_ts AS DATE),
                                            CAST(c_ts AS DATE))
                             ELSE date_diff('day', CAST(s_ts AS DATE),
                                            CAST(end_ts AS DATE))
                        END AS t,
                        c_ts IS NOT NULL AS converted,
                        user_id % 2 = 0 AS is_a
                 FROM per_user CROSS JOIN oe),
      by_t AS (SELECT CAST(t AS BIGINT) AS t,
                      CAST(sum(CASE WHEN is_a AND converted
                               THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                      CAST(sum(CASE WHEN is_a AND NOT converted
                               THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                      CAST(sum(CASE WHEN NOT is_a AND converted
                               THEN 1 ELSE 0 END) AS BIGINT) AS d2,
                      CAST(sum(CASE WHEN NOT is_a AND NOT converted
                               THEN 1 ELSE 0 END) AS BIGINT) AS c2
               FROM rows_t GROUP BY 1),
      risk AS (SELECT *,
                      CAST(sum(d1 + c1) OVER () -
                        coalesce(sum(d1 + c1) OVER (ORDER BY t ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS n1,
                      CAST(sum(d2 + c2) OVER () -
                        coalesce(sum(d2 + c2) OVER (ORDER BY t ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS n2
               FROM by_t),
      terms AS (SELECT d1,
                       CAST(d1 * 1000000
                         - (d1 + d2) * n1 * 1000000 // (n1 + n2)
                         AS BIGINT) AS oe_e6,
                       CAST(floor(CAST(d1 + d2 AS DOUBLE) * n1 * n2
                         * ((n1 + n2) - (d1 + d2))
                         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                            * ((n1 + n2) - 1))
                         * 1000000.0) AS BIGINT) AS v_e6
                FROM risk
                WHERE d1 + d2 > 0 AND n1 + n2 > 1),
      a AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
                   CAST(sum(oe_e6) AS BIGINT) AS sum_oe_e6,
                   CAST(sum(v_e6) AS BIGINT) AS sum_v_e6
            FROM terms)
      SELECT o1, sum_oe_e6, sum_v_e6,
             CASE WHEN sum_v_e6 > 0 THEN
               CAST(floor((CAST(sum_oe_e6 AS DOUBLE) / 1000000.0)
                 * (CAST(sum_oe_e6 AS DOUBLE) / 1000000.0)
                 / (CAST(sum_v_e6 AS DOUBLE) / 1000000.0)
                 * 1000000.0) AS BIGINT) END AS chi2_e6
      FROM a""")),

    Q("q_fdr_bh", fdrBh, Some("""
      WITH seg AS (
        SELECT event_type, CAST(weekofyear(ts) AS INTEGER) AS week,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN cents
                        ELSE 0 END) AS BIGINT) AS s_a,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN cents * cents
                        ELSE 0 END) AS BIGINT) AS ss_a,
               CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN event_id % 2 <> 0 THEN cents
                        ELSE 0 END) AS BIGINT) AS s_b,
               CAST(sum(CASE WHEN event_id % 2 <> 0 THEN cents * cents
                        ELSE 0 END) AS BIGINT) AS ss_b
        FROM (SELECT event_type, ts, event_id,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
              FROM events WHERE value IS NOT NULL)
        GROUP BY 1, 2
        HAVING n_a >= 2 AND n_b >= 2),
      z AS (
        SELECT event_type, week, n_a, n_b,
               abs((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt(
                     ((ss_a - CAST(s_a AS DOUBLE) * s_a
                         / CAST(n_a AS DOUBLE))
                       / CAST(n_a - 1 AS DOUBLE)) / n_a
                   + ((ss_b - CAST(s_b AS DOUBLE) * s_b
                         / CAST(n_b AS DOUBLE))
                       / CAST(n_b - 1 AS DOUBLE)) / n_b)) AS az
        FROM seg),
      p AS (
        SELECT event_type, week, n_a, n_b,
               CAST(floor(
                 exp(-az * az / 2.0) * 0.3989422804014327
                 * ((1.0 / (1.0 + 0.2316419 * az))
                    * (0.319381530
                       + (1.0 / (1.0 + 0.2316419 * az))
                         * (-0.356563782
                            + (1.0 / (1.0 + 0.2316419 * az))
                              * (1.781477937
                                 + (1.0 / (1.0 + 0.2316419 * az))
                                   * (-1.821255978
                                      + (1.0 / (1.0 + 0.2316419 * az))
                                        * 1.330274429)))))
                 * 2000000.0) AS BIGINT) AS p_e6
        FROM z),
      ranked AS (
        SELECT event_type, week, n_a, n_b, p_e6,
               CAST(row_number() OVER (
                 ORDER BY p_e6 ASC, event_type ASC, week ASC)
                 AS BIGINT) AS rank,
               count(*) OVER () AS m
        FROM p),
      kk AS (
        SELECT *, max(CASE WHEN p_e6 * m <= 50000 * rank
                           THEN rank ELSE 0 END) OVER () AS k
        FROM ranked)
      SELECT event_type, week, n_a, n_b, p_e6, rank,
             rank <= k AS rejected
      FROM kk""")),

    Q("q_changepoint", changepoint, Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS day_cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      pre AS (
        SELECT event_type, day, day_cents,
               sum(day_cents) OVER (PARTITION BY event_type
                 ORDER BY day ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS s_l,
               CAST(count(*) OVER (PARTITION BY event_type
                 ORDER BY day ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS k,
               sum(day_cents) OVER (PARTITION BY event_type) AS s,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n
        FROM daily),
      scored AS (
        SELECT event_type, day, k, n, s_l, s,
               CAST(floor(
                 CAST(s_l AS DOUBLE) * s_l / CAST(k AS DOUBLE)
                 + CAST(s - s_l AS DOUBLE) * (s - s_l)
                     / CAST(n - k AS DOUBLE)
                 - CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE))
                 AS BIGINT) AS gain_cents2
        FROM pre WHERE k < n),
      best AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY gain_cents2 DESC, day ASC) AS rn
        FROM scored)
      SELECT event_type, day AS split_day,
             k AS n_left, n - k AS n_right,
             CAST(s_l // k AS BIGINT) AS mean_left_cents,
             CAST((s - s_l) // (n - k) AS BIGINT) AS mean_right_cents,
             gain_cents2
      FROM best WHERE rn = 1""")),

    Q("q_theil_sen", theilSen, Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS day_cents,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2, 4),
      slopes AS (
        SELECT a.event_type,
               CAST(b.day_cents - a.day_cents AS DOUBLE)
                 / CAST(b.x - a.x AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.x < b.x),
      med AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
               quantile_cont(slope, 0.5) AS m
        FROM slopes GROUP BY 1)
      SELECT d.event_type, max(med.n_pairs) AS n_pairs,
             CAST(floor(max(med.m) * 10000.0) AS BIGINT) AS slope_e4,
             CAST(floor(quantile_cont(
               CAST(d.day_cents AS DOUBLE) - med.m * d.x, 0.5)
               * 10000.0) AS BIGINT) AS intercept_e4
      FROM daily d JOIN med USING (event_type)
      GROUP BY 1""")),

    Q("q_stl_decompose", stlDecompose, Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      win AS (
        SELECT event_type, day, cents,
               count(*) OVER w7 AS n7,
               sum(cents) OVER w7 AS sum7
        FROM daily
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day ASC
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      interior AS (
        SELECT event_type, day, cents, sum7,
               7 * cents - sum7 AS detr7,
               dayofweek(day) + 1 AS dow
        FROM win WHERE n7 = 7),
      seas AS (
        SELECT event_type, dow, count(*) AS k,
               sum(detr7) AS sdet
        FROM interior GROUP BY 1, 2)
      SELECT i.event_type, i.day, i.cents,
             CAST(i.sum7 * 10000 // 7 AS BIGINT) AS trend_e4,
             CAST(floor(CAST(s.sdet AS DOUBLE) * 10000.0
               / (7.0 * s.k)) AS BIGINT) AS seasonal_e4,
             CAST(floor((CAST(i.detr7 AS DOUBLE) / 7.0
               - CAST(s.sdet AS DOUBLE) / (7.0 * s.k)) * 10000.0)
               AS BIGINT) AS resid_e4
      FROM interior i JOIN seas s
        ON i.event_type = s.event_type AND i.dow = s.dow""")),

    Q("q_lead_lag", leadLag, Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE value IS NOT NULL
          AND event_type IN ('click', 'purchase')
        GROUP BY 1, 2),
      c AS (SELECT day, cents AS x FROM daily
            WHERE event_type = 'click'),
      p AS (SELECT day AS p_day, cents AS y FROM daily
            WHERE event_type = 'purchase'),
      lagged AS (
        SELECT l.lag, c.x, p.y
        FROM c CROSS JOIN (SELECT unnest(generate_series(-7, 7))
                             AS lag) l
        JOIN p ON c.day + l.lag * INTERVAL 1 DAY = p.p_day),
      m AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM lagged GROUP BY 1),
      e AS (
        SELECT lag, n_days,
               CAST(floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                        * CAST(n_days * syy - sy * sy AS DOUBLE))
                 * 1000000.0) AS BIGINT) AS corr_e6
        FROM m),
      r AS (
        SELECT *, row_number() OVER (
          ORDER BY corr_e6 DESC, abs(lag) ASC, lag ASC) AS rn
        FROM e)
      SELECT CAST(lag AS BIGINT) AS lag, n_days, corr_e6,
             rn = 1 AS is_best
      FROM r""")),

    Q("q_markov_attribution", markovAttribution, Some(markovOracle)),

    Q("q_weighted_median", weightedMedian, Some("""
      WITH p AS (SELECT l_returnflag,
                        CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                          * 100 AS BIGINT) AS cents,
                        CAST(l_quantity AS BIGINT) AS qty
                 FROM lineitem),
      g AS (SELECT l_returnflag, cents,
                   CAST(sum(qty) AS BIGINT) AS wt
            FROM p GROUP BY 1, 2),
      c AS (SELECT *,
                   CAST(sum(wt) OVER (PARTITION BY l_returnflag
                     ORDER BY cents ASC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
                   CAST(sum(wt) OVER (PARTITION BY l_returnflag)
                     AS BIGINT) AS totw
            FROM g),
      f AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY cents ASC) AS rn
            FROM c WHERE cumw * 2 >= totw)
      SELECT l_returnflag, totw AS total_qty,
             cents AS wmedian_cents, cumw AS cum_at_median
      FROM f WHERE rn = 1""")),

    Q("q_seasonal_mase", seasonalMase, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS cents
                FROM e GROUP BY 1, 2),
      lagd AS (SELECT event_type,
                      abs(cents - lag(cents, 1) OVER (
                        PARTITION BY event_type ORDER BY day ASC))
                        AS e1,
                      abs(cents - lag(cents, 7) OVER (
                        PARTITION BY event_type ORDER BY day ASC))
                        AS e7
               FROM daily),
      agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(CASE WHEN e1 IS NOT NULL THEN 1 ELSE 0
                       END) AS BIGINT) AS n1,
                     CAST(sum(e1) AS BIGINT) AS sum_e1,
                     CAST(sum(CASE WHEN e7 IS NOT NULL THEN 1 ELSE 0
                       END) AS BIGINT) AS n7,
                     CAST(sum(e7) AS BIGINT) AS sum_e7
              FROM lagd GROUP BY 1)
      SELECT event_type, n_days, n1, sum_e1, n7, sum_e7,
             CAST(CAST(sum_e7 AS HUGEINT) * n1 * 1000000
               // (CAST(sum_e1 AS HUGEINT) * n7) AS BIGINT) AS mase_e6
      FROM agg WHERE n7 > 0 AND sum_e1 > 0""")),

    Q("q_partial_corr", partialCorr, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      daily AS (SELECT event_type, day,
                       CAST(sum(cents) AS BIGINT) AS x,
                       CAST(count(*) AS BIGINT) AS y
                FROM e GROUP BY 1, 2),
      dz AS (SELECT *, CAST(isodow(day) % 7 + 1 AS BIGINT) AS z
             FROM daily),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(z) AS BIGINT) AS sz,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(x AS HUGEINT) * z) AS sxz,
                   CAST(sum(y * z) AS BIGINT) AS syz,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(z * z) AS BIGINT) AS szz
            FROM dz GROUP BY 1 HAVING count(*) >= 8),
      r AS (SELECT event_type, n,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     AS rxy,
                   (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
                     AS rxz,
                   (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
                     AS ryz
            FROM m)
      SELECT event_type, n AS n_days,
             CAST(floor(rxy * 1000000.0) AS BIGINT) AS rxy_e6,
             CAST(floor(rxz * 1000000.0) AS BIGINT) AS rxz_e6,
             CAST(floor(ryz * 1000000.0) AS BIGINT) AS ryz_e6,
             CAST(floor((rxy - rxz * ryz)
               / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
               * 1000000.0) AS BIGINT) AS pcorr_e6
      FROM r""")),

    Q("q_sax_symbols", saxSymbols, Some(s"""
      $ZDailyCtes
      SELECT event_type, seg, n_days, sum_z_e4,
             CASE WHEN sum_z_e4 < -6745 * n_days THEN 'a'
                  WHEN sum_z_e4 < 0 THEN 'b'
                  WHEN sum_z_e4 < 6745 * n_days THEN 'c'
                  ELSE 'd' END AS symbol
      FROM (SELECT event_type, CAST((rn - 1) // 7 AS BIGINT) AS seg,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(z_e4) AS BIGINT) AS sum_z_e4
            FROM z GROUP BY 1, 2)""")),

    Q("q_matrix_profile", matrixProfile, headline = true, oracle = Some(s"""
      $ZDailyCtes,
      st AS (SELECT event_type, rn, day FROM z WHERE rn + 6 <= n),
      pairs AS (SELECT a.event_type AS event_type, a.rn AS i,
                       b.rn AS j
                FROM st a JOIN st b ON a.event_type = b.event_type
                  AND b.rn >= a.rn + 4),
      pk AS (SELECT p.event_type AS event_type, i, j,
                    i + r.range AS pi, j + r.range AS pj
             FROM pairs p CROSS JOIN range(0, 7) r),
      d2 AS (SELECT pk.event_type AS event_type, i, j,
                    CAST(sum((zi.z_e4 - zj.z_e4)
                      * (zi.z_e4 - zj.z_e4)) AS BIGINT) AS d2
             FROM pk
             JOIN z zi ON zi.event_type = pk.event_type
               AND zi.rn = pk.pi
             JOIN z zj ON zj.event_type = pk.event_type
               AND zj.rn = pk.pj
             GROUP BY 1, 2, 3),
      u AS (SELECT event_type, i, j, d2 FROM d2
            UNION ALL
            SELECT event_type, j AS i, i AS j, d2 FROM d2),
      mp AS (SELECT event_type, i, j AS mp_j, d2 AS mp_d2,
                    row_number() OVER (PARTITION BY event_type, i
                      ORDER BY d2 ASC, j ASC) AS rk
             FROM u)
      SELECT mp.event_type AS event_type, mp.i AS i, st.day AS day,
             mp_d2, mp_j
      FROM mp JOIN st ON st.event_type = mp.event_type
        AND st.rn = mp.i
      WHERE rk = 1"""))
  )

}
