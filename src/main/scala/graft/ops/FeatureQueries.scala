package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experimentation and feature-engineering statistics — the decision
  * gates that sit beside a training-data pipeline: did the treatment
  * move the metric (two-proportion z), are two categoricals dependent
  * (chi-square), where should a stump split (Gini), and what does a
  * category tell us about the label without leaking it (leave-one-out
  * target encoding).
  *
  * Reference analog: the dashboards' comparative panels (per-state /
  * per-category rating contrasts — README.md:16-20) are informal
  * versions of exactly these tests; here they are emitted with their
  * exact integer evidence so a reviewer can re-derive every number.
  *
  * Scale shape shared by all four: per-group integer cells collapse
  * the corpus (map-side combinable), marginals are GROUP-cardinality
  * (tiny) and rejoin as broadcasts; nothing ever needs two fact rows
  * co-located. Float discipline (StatsQueries header): all compared
  * doubles are either ONE divide of exact BIGINTs or a fixed
  * parenthesized per-row chain over exact integer inputs — each IEEE
  * op is correctly rounded on bit-identical operands, so the result is
  * bit-identical across engines; no round(), no ln, no cross-row
  * double sum anywhere.
  */
object FeatureQueries {

  /** Two-proportion z-test per metric series: cohort A/B by user-id
    * parity, "conversion" = value ≥ 50 (cents ≥ 5000 on the decimal
    * grid). The pooled z² is cleared to integer evidence —
    * diff = x_a·n_b − x_b·n_a (exact BIGINT, sign = direction) — and
    * the statistic itself is a fixed-order double chain over the exact
    * cells: z² = diff²·(n_a+n_b) / (n_a·n_b·x·(n−x)), x pooled. The
    * square is done in double because diff² ·(n_a+n_b) can exceed
    * BIGINT at petabyte row counts; each factor converts exactly and
    * every multiply is correctly rounded on identical operands. */
  private def abTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, d)
      .select($"event_type", ($"user_id" % 2 === 0).as("cohort_a"),
        (($"value".cast("decimal(18,2)") * 100).cast("long") >= 5000L)
          .as("conv"))
      .groupBy($"event_type")
      .agg(sum(when($"cohort_a", 1L).otherwise(0L)).as("n_a"),
        sum(when($"cohort_a" && $"conv", 1L).otherwise(0L)).as("x_a"),
        sum(when(!$"cohort_a", 1L).otherwise(0L)).as("n_b"),
        sum(when(!$"cohort_a" && $"conv", 1L).otherwise(0L)).as("x_b"))
    cells
      .withColumn("diff", $"x_a" * $"n_b" - $"x_b" * $"n_a")
      .withColumn("pooled", $"x_a" + $"x_b")
      .select($"event_type", $"n_a", $"x_a", $"n_b", $"x_b", $"diff",
        (($"diff".cast("double") * $"diff" * ($"n_a" + $"n_b")) /
          ($"n_a".cast("double") * $"n_b" * $"pooled" *
            ($"n_a" + $"n_b" - $"pooled"))).as("z2"))
  }

  /** Chi-square independence evidence for lang × source — emitted as
    * the per-cell contribution table (observed count, expected-count
    * ratio, and the cell's chi² term), not a single opaque statistic:
    * the per-cell view is what a curation reviewer actually reads
    * ("which source is over-feeding which language"). Cells and
    * marginals are three tiny aggregates off one scan; marginals
    * rejoin the 100-row cell table as broadcasts. Every emitted ratio
    * is ONE divide of exact BIGINTs ((O·N − R·C)² stays well inside
    * BIGINT at any realistic group count). */
  private def chiSquare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val cells = docs.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("observed"))
    val rows = docs.groupBy($"lang").agg(count(lit(1)).as("row_tot"))
    val cols = docs.groupBy($"source").agg(count(lit(1)).as("col_tot"))
    val tot = docs.agg(count(lit(1)).as("n"))
    cells
      .join(broadcast(rows), Seq("lang"))
      .join(broadcast(cols), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("dev", $"observed" * $"n" - $"row_tot" * $"col_tot")
      .select($"lang", $"source", $"observed", $"row_tot", $"col_tot",
        $"n",
        (($"row_tot" * $"col_tot").cast("double") / $"n").as("expected"),
        ($"dev" * $"dev").as("chi_num"),
        (($"dev" * $"dev").cast("double") /
          ($"n" * $"row_tot" * $"col_tot")).as("contrib"))
  }

  /** Decision-stump split selection: for each candidate threshold on
    * n_chars, the weighted Gini impurity of the induced left/right
    * partition against the held-out label — the scan primitive behind
    * tree building and behind "where do I cut this quality score".
    * One pass: each row fans out to the fixed 7-threshold grid
    * (explode of a literal array — a 7× pre-agg blowup that map-side
    * combines straight back down), then per-threshold integer cells.
    * Weighted Gini is cleared to one divide:
    * G = [n_r·(n_l² − pos_l² − neg_l²) + n_l·(n_r² − pos_r² − neg_r²)]
    *     / (n · n_l · n_r), guarded null when a side is empty. */
  private def giniSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val thresholds = array((150L to 450L by 50L).map(lit): _*)
    val cells = Tables.documents(s, d)
      .select($"n_chars", ($"doc_id" % 3 =!= 0).as("gold"),
        explode(thresholds).as("threshold"))
      .groupBy($"threshold")
      .agg(count(lit(1)).as("n"),
        sum(when($"n_chars" < $"threshold", 1L).otherwise(0L)).as("n_l"),
        sum(when($"n_chars" < $"threshold" && $"gold", 1L).otherwise(0L))
          .as("pos_l"),
        sum(when($"gold", 1L).otherwise(0L)).as("pos"))
    cells
      .withColumn("n_r", $"n" - $"n_l")
      .withColumn("pos_r", $"pos" - $"pos_l")
      .withColumn("neg_l", $"n_l" - $"pos_l")
      .withColumn("neg_r", $"n_r" - $"pos_r")
      .withColumn("gini_num",
        $"n_r" * ($"n_l" * $"n_l" - $"pos_l" * $"pos_l" -
          $"neg_l" * $"neg_l") +
          $"n_l" * ($"n_r" * $"n_r" - $"pos_r" * $"pos_r" -
            $"neg_r" * $"neg_r"))
      .select($"threshold", $"n", $"n_l", $"pos_l", $"n_r", $"pos_r",
        $"gini_num",
        when($"n_l" > 0 && $"n_r" > 0,
          $"gini_num".cast("double") / ($"n" * $"n_l" * $"n_r"))
          .as("gini"))
  }

  /** Leave-one-out target encoding of `source` against the held-out
    * label — the category-to-number feature that excludes each row's
    * own label from its encoding (the standard target-leak guard).
    * Per-category sums are GROUP-cardinality and broadcast back onto
    * the scan; each row's encoding is then pure per-row arithmetic:
    * loo = (sum_y − y) / (cnt − 1), emitted beside its exact integer
    * numerator/denominator. The fact side never shuffles. */
  private def targetEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labeled = Tables.documents(s, d)
      .select($"doc_id", $"source",
        when($"doc_id" % 3 =!= 0, 1L).otherwise(0L).as("y"))
    val perCat = labeled.groupBy($"source")
      .agg(sum($"y").as("sum_y"), count(lit(1)).as("cnt"))
    labeled.join(broadcast(perCat), Seq("source"))
      .select($"doc_id", $"source", $"y",
        ($"sum_y" - $"y").as("loo_num"), ($"cnt" - 1).as("loo_den"),
        when($"cnt" > 1,
          ($"sum_y" - $"y").cast("double") / ($"cnt" - 1)).as("loo"))
  }

  /** Inverse-frequency class weights — the loss-reweighting table for
    * imbalanced training (weight_c = N / (k·n_c), the sklearn
    * "balanced" convention: a class at uniform share weighs 1.0).
    * One GROUP-cardinality aggregate plus a broadcast scalar; the
    * weight is ONE divide of exact BIGINT products. */
  private def classWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perClass = Tables.documents(s, d)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val tot = perClass.agg(sum($"n").as("n_total"),
      count(lit(1)).as("k_classes"))
    perClass.crossJoin(broadcast(tot))
      .select($"lang", $"n", $"n_total", $"k_classes",
        ($"n_total".cast("double") / ($"k_classes" * $"n")).as("weight"))
  }

  /** Quantile normalization across groups (Bolstad et al. 2003 — the
    * cross-sample distribution aligner): each source's n_chars
    * distribution is summarized at 21 exact order statistics
    * (p = 0..20 vigintiles, rank = (n_s−1)·p div 20 + 1), and the
    * reference distribution is the per-p mean across sources (exact
    * e6 integer). Mapping a source's value at quantile p to ref(p)
    * removes between-source distribution shift while preserving each
    * source's internal ranks.
    *
    * The scale move: order statistics WITHOUT sorting the data. The
    * value domain is bounded, so the data-scaled stage is one
    * map-side-combining (source, value) count; ranks come from a
    * cumulative sum over that value-domain-bounded table and the
    * order statistic is "min value whose cumulative count reaches the
    * rank" — a 105-row broadcast-grid probe. A per-source global sort
    * (the textbook formulation) would shuffle the corpus into as few
    * partitions as there are sources; this never moves row-level
    * data at all. */
  private def quantileNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, d)
      .groupBy($"source", $"n_chars").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_chars".asc)
    val cum = counts.withColumn("cum", sum($"c").over(w))
    val totals = counts.groupBy($"source").agg(sum($"c").as("n_s"))
    val grid = totals
      .crossJoin(broadcast((0 to 20).toDF("p")))
      .select($"source", $"p".cast("long").as("p"),
        (expr("((n_s - 1) * p) div 20") + 1).as("rk"))
    val vals = grid.join(cum, Seq("source"))
      .filter($"cum" >= $"rk")
      .groupBy($"source", $"p").agg(min($"n_chars").as("value"))
    val ref = vals.groupBy($"p")
      .agg(sum($"value").as("sv"), count(lit(1)).as("ns"))
      .select($"p", expr("(sv * 1000000) div ns").as("ref_e6"))
    vals.join(ref, "p")
      .select($"source", $"p", $"value", $"ref_e6")
      .orderBy($"source".asc, $"p".asc)
  }

  /** Weight-of-evidence / information-value scorecard (the
    * credit-risk feature screen, Siddiqi 2006): per category,
    * WOE = ln((pos/POS)/(neg/NEG)) measures directional evidence and
    * IV = Σ (pos/POS − neg/NEG)·WOE summarizes total predictive
    * power (rule of thumb: IV < 0.02 useless, > 0.5 suspicious).
    * Uses the corpus's standard pseudo-label (doc_id % 3 ≠ 0, the
    * calibration/AUC convention) over language categories. Float
    * discipline: cells and margins are exact BIGINTs from ONE
    * map-side-combining aggregate; each ln term forms its cross
    * products in double (int64-safe at any scale — the cramersV
    * lesson) and floors to e6/e9 BEFORE the IV sum (floor-then-sum).
    * Zero-cell categories emit null WOE (undefined evidence) and
    * contribute nothing to IV, mirrored exactly in the oracle. */
  private def woeIv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, d)
      .select($"lang", ($"doc_id" % 3 =!= 0).as("gold"))
      .groupBy($"lang")
      .agg(sum(when($"gold", 1L).otherwise(0L)).as("n_pos"),
        sum(when(!$"gold", 1L).otherwise(0L)).as("n_neg"))
    val tot = cells.agg(sum($"n_pos").as("tp"), sum($"n_neg").as("tn"))
    val lr = log(($"n_pos".cast("double") * $"tn")
      / ($"n_neg".cast("double") * $"tp"))
    val terms = cells.crossJoin(broadcast(tot))
      .select($"lang", $"n_pos", $"n_neg",
        when($"n_pos" > 0 && $"n_neg" > 0,
          floor(lr * lit(1e6)).cast("long")).as("woe_e6"),
        when($"n_pos" > 0 && $"n_neg" > 0,
          floor(($"n_pos".cast("double") / $"tp"
            - $"n_neg".cast("double") / $"tn") * lr * lit(1e9))
            .cast("long")).as("iv_term_e9"))
    terms
      .crossJoin(broadcast(terms.agg(sum($"iv_term_e9").as("iv_e9"))))
      .orderBy($"lang".asc)
  }

  /** Delta-method CI for a RATIO metric (revenue per event, per
    * user-unit) — the experimentation stat everyone gets wrong by
    * treating Σx/Σy as a mean: units are users, the metric is a ratio
    * of two per-user sums, and its variance needs the delta method
    * Var(R̂) = (σx² − 2Rσxy + R²σy²)/((n−1)·(Σy)²)·(n−1)n/(n(n−1)) —
    * cleared here to se = √((vx − 2R·vxy + R²·vy)/(n−1)) / Σy with
    * vx = nΣx²−(Σx)² etc. All six moments exact in ONE per-user
    * rollup (second moments DECIMAL(38,0)/HUGEINT); R, se and the
    * ±1.96·se Wald band are short identical double trees floored to
    * e6/e9. Guarded on a positive quadratic form (fp dust near a
    * deterministic x∝y relation would otherwise NaN the sqrt —
    * engine-divergent: Spark nulls, DuckDB errors). */
  private def deltaMethodRatio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perUser = Tables.events(s, d)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"user_id")
      .agg(sum($"cents").as("x"), count(lit(1)).as("y"))
    perUser.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum(dec($"x") * $"x").as("sxx"),
        sum(dec($"x") * $"y").as("sxy"), sum($"y" * $"y").as("syy"))
      .filter($"n" > 1 && $"sy" > 0)
      .withColumn("r", $"sx".cast("double") / $"sy")
      .withColumn("vx", $"n".cast("double") * $"sxx".cast("double") -
        $"sx".cast("double") * $"sx".cast("double"))
      .withColumn("vxy", $"n".cast("double") * $"sxy".cast("double") -
        $"sx".cast("double") * $"sy".cast("double"))
      .withColumn("vy", $"n".cast("double") * $"syy".cast("double") -
        $"sy".cast("double") * $"sy".cast("double"))
      .withColumn("qf",
        $"vx" - lit(2.0) * $"r" * $"vxy" + $"r" * $"r" * $"vy")
      .filter($"qf" > 0.0)
      .withColumn("se",
        sqrt($"qf" / ($"n".cast("double") - lit(1.0))) / $"sy")
      .select($"event_type", $"n", $"sx", $"sy",
        floor($"r" * lit(1000000.0)).as("r_e6"),
        floor($"se" * lit(1000000000.0)).as("se_e9"),
        floor(($"r" - lit(1.96) * $"se") * lit(1000000.0))
          .as("ci_lo_e6"),
        floor(($"r" + lit(1.96) * $"se") * lit(1000000.0))
          .as("ci_hi_e6"))
  }

  /** Sample-ratio-mismatch guardrail — the FIRST check every
    * experimentation platform runs before reading any metric: if the
    * 50/50 assignment hash didn't actually split 50/50, the
    * experiment is corrupted (bucketing bug, bot filtering one arm,
    * logging loss) and all downstream stats are invalid. The 1-df χ²
    * against the expected equal split clears to the exact integer
    * form (n_a − n_b)²·1000 / (n_a + n_b), compared against the
    * 0.001-significance critical value 10.828 in cross-multiplied
    * integer form — platforms alarm SRM at 0.001, not 0.05, because
    * it runs on every experiment every day. Per event_type, one
    * map-side counting aggregate. */
  private def srmCheck(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", ($"user_id" % 2 === 0).as("arm_a"))
      .groupBy($"event_type")
      .agg(sum(when($"arm_a", 1L).otherwise(0L)).as("n_a"),
        sum(when(!$"arm_a", 1L).otherwise(0L)).as("n_b"))
      .withColumn("chi2_e3", expr(
        "(n_a - n_b) * (n_a - n_b) * 1000 div (n_a + n_b)"))
      .withColumn("srm_alarm", $"chi2_e3" > 10828L)
  }

  /** CUPED variance reduction per event type — the experimentation
    * workhorse (Deng et al.): adjust each unit's metric by a
    * pre-period covariate, Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X),
    * and the metric's variance drops by exactly corr²(X,Y) — often
    * 30-50 % smaller confidence intervals for free. Here each USER's
    * even-epoch-day spend is the covariate and odd-day spend the
    * metric (a deterministic within-unit split that keeps the oracle
    * replayable; in production X is the pre-experiment window). One
    * (type,user) rollup with conditional sums, then |types|-row
    * moments: all five sums exact, second moments on DECIMAL(38,0)/
    * HUGEINT, θ and the variance-reduction ratio formed in double and
    * floored (θ_e6, var_red_ppm = 1e6·cov²/(vx·vy)). */
  private def cuped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, d)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
          % 2 === 0).as("pre"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"user_id")
      .agg(sum(when($"pre", $"cents").otherwise(0L)).as("x"),
        sum(when(!$"pre", $"cents").otherwise(0L)).as("y"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    users.groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum(dec($"x") * $"y").as("sxy"),
        sum(dec($"x") * $"x").as("sxx"), sum(dec($"y") * $"y").as("syy"))
      .withColumn("cov",
        $"n_users".cast("double") * $"sxy".cast("double") -
          $"sx".cast("double") * $"sy".cast("double"))
      .withColumn("vx",
        $"n_users".cast("double") * $"sxx".cast("double") -
          $"sx".cast("double") * $"sx".cast("double"))
      .withColumn("vy",
        $"n_users".cast("double") * $"syy".cast("double") -
          $"sy".cast("double") * $"sy".cast("double"))
      .filter($"vx" > 0.0 && $"vy" > 0.0)
      .select($"event_type", $"n_users", $"sx", $"sy",
        floor($"cov" * lit(1000000.0) / $"vx").as("theta_e6"),
        floor($"cov" * $"cov" * lit(1000000.0) / ($"vx" * $"vy"))
          .as("var_red_ppm"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_delta_method_ratio", deltaMethodRatio, Some("""
      WITH e AS (SELECT event_type, user_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      u AS (SELECT event_type, user_id,
                   CAST(sum(cents) AS BIGINT) AS x,
                   CAST(count(*) AS BIGINT) AS y
            FROM e GROUP BY 1, 2),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM u GROUP BY 1),
      c AS (SELECT *,
                   CAST(sx AS DOUBLE) / sy AS r,
                   CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                   CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS vxy,
                   CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
            FROM m WHERE n > 1 AND sy > 0),
      q AS (SELECT *, vx - 2.0 * r * vxy + r * r * vy AS qf FROM c),
      f AS (SELECT *,
                   sqrt(qf / (CAST(n AS DOUBLE) - 1.0)) / sy AS se
            FROM q WHERE qf > 0.0)
      SELECT event_type, n, sx, sy,
             CAST(floor(r * 1000000.0) AS BIGINT) AS r_e6,
             CAST(floor(se * 1000000000.0) AS BIGINT) AS se_e9,
             CAST(floor((r - 1.96 * se) * 1000000.0) AS BIGINT)
               AS ci_lo_e6,
             CAST(floor((r + 1.96 * se) * 1000000.0) AS BIGINT)
               AS ci_hi_e6
      FROM f""")),
    Q("q_srm_check", srmCheck, Some("""
      WITH a AS (SELECT event_type,
                        CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                          ELSE 0 END) AS BIGINT) AS n_a,
                        CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1
                          ELSE 0 END) AS BIGINT) AS n_b
                 FROM events GROUP BY 1)
      SELECT event_type, n_a, n_b,
             CAST((n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b)
               AS BIGINT) AS chi2_e3,
             (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) > 10828
               AS srm_alarm
      FROM a""")),
    Q("q_cuped", cuped, Some("""
      WITH e AS (SELECT event_type, user_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        datediff('day', DATE '1970-01-01',
                          CAST(ts AS DATE)) % 2 = 0 AS pre
                 FROM events WHERE value IS NOT NULL),
      u AS (SELECT event_type, user_id,
                   CAST(sum(CASE WHEN pre THEN cents ELSE 0 END)
                     AS BIGINT) AS x,
                   CAST(sum(CASE WHEN NOT pre THEN cents ELSE 0 END)
                     AS BIGINT) AS y
            FROM e GROUP BY 1, 2),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM u GROUP BY 1),
      c AS (SELECT *,
                   CAST(n_users AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                   CAST(n_users AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                   CAST(n_users AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
            FROM m)
      SELECT event_type, n_users, sx, sy,
             CAST(floor(cov * 1000000.0 / vx) AS BIGINT) AS theta_e6,
             CAST(floor(cov * cov * 1000000.0 / (vx * vy)) AS BIGINT)
               AS var_red_ppm
      FROM c WHERE vx > 0.0 AND vy > 0.0""")),
    Q("q_woe_iv", woeIv, Some("""
      WITH cells AS (SELECT lang,
                 CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_pos,
                 CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_neg
            FROM documents GROUP BY 1),
      t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
                   CAST(sum(n_neg) AS BIGINT) AS tn
            FROM cells),
      terms AS (SELECT lang, n_pos, n_neg,
                       CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                            THEN floor(ln((CAST(n_pos AS DOUBLE) * tn)
                                 / (CAST(n_neg AS DOUBLE) * tp)) * 1e6)
                            ELSE NULL END AS BIGINT) AS woe_e6,
                       CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                            THEN floor((CAST(n_pos AS DOUBLE) / tp
                                  - CAST(n_neg AS DOUBLE) / tn)
                                 * ln((CAST(n_pos AS DOUBLE) * tn)
                                   / (CAST(n_neg AS DOUBLE) * tp))
                                 * 1e9)
                            ELSE NULL END AS BIGINT) AS iv_term_e9
                FROM cells, t)
      SELECT lang, n_pos, n_neg, woe_e6, iv_term_e9,
             (SELECT CAST(sum(iv_term_e9) AS BIGINT) FROM terms)
               AS iv_e9
      FROM terms
      ORDER BY lang""")),
    Q("q_quantile_normalize", quantileNormalize, Some("""
      WITH c AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
                 FROM documents GROUP BY 1, 2),
      cum AS (SELECT source, n_chars,
                     sum(c) OVER (PARTITION BY source
                                  ORDER BY n_chars) AS cum
              FROM c),
      tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
              FROM c GROUP BY 1),
      grid AS (SELECT source, CAST(p AS BIGINT) AS p,
                      ((n_s - 1) * p) // 20 + 1 AS rk
               FROM tot CROSS JOIN (SELECT unnest(range(0, 21)) AS p)),
      v AS (SELECT g.source, g.p, min(cum.n_chars) AS value
            FROM grid g JOIN cum ON g.source = cum.source
                                AND cum.cum >= g.rk
            GROUP BY 1, 2),
      r AS (SELECT p, CAST((sum(value) * 1000000) // count(*) AS BIGINT)
                        AS ref_e6
            FROM v GROUP BY 1)
      SELECT v.source, v.p, v.value, r.ref_e6
      FROM v JOIN r USING (p)
      ORDER BY v.source, v.p""")),
    Q("q_class_weights", classWeights, Some("""
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      t AS (SELECT sum(n) AS n_total, count(*) AS k_classes FROM c)
      SELECT lang, CAST(n AS BIGINT) AS n,
             CAST(n_total AS BIGINT) AS n_total,
             CAST(k_classes AS BIGINT) AS k_classes,
             CAST(n_total AS DOUBLE) / (k_classes * n) AS weight
      FROM c, t""")),

    Q("q_ab_test", abTest, Some("""
      WITH e AS (SELECT event_type, user_id % 2 = 0 AS cohort_a,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) >= 5000 AS conv
                 FROM events),
      c AS (SELECT event_type,
                   sum(CASE WHEN cohort_a THEN 1 ELSE 0 END) AS n_a,
                   sum(CASE WHEN cohort_a AND conv THEN 1 ELSE 0 END)
                     AS x_a,
                   sum(CASE WHEN NOT cohort_a THEN 1 ELSE 0 END) AS n_b,
                   sum(CASE WHEN NOT cohort_a AND conv THEN 1 ELSE 0 END)
                     AS x_b
            FROM e GROUP BY 1)
      SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
             CAST(x_a AS BIGINT) AS x_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(x_b AS BIGINT) AS x_b,
             CAST(x_a * n_b - x_b * n_a AS BIGINT) AS diff,
             ((CAST(x_a * n_b - x_b * n_a AS DOUBLE)
                 * (x_a * n_b - x_b * n_a)) * (n_a + n_b))
               / (CAST(n_a AS DOUBLE) * n_b * (x_a + x_b)
                  * (n_a + n_b - x_a - x_b)) AS z2
      FROM c""")),

    Q("q_chi_square", chiSquare, Some("""
      WITH cells AS (SELECT lang, source, count(*) AS observed
                     FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, count(*) AS row_tot FROM documents GROUP BY 1),
      c AS (SELECT source, count(*) AS col_tot FROM documents
            GROUP BY 1),
      t AS (SELECT count(*) AS n FROM documents)
      SELECT cells.lang, cells.source,
             CAST(observed AS BIGINT) AS observed,
             CAST(row_tot AS BIGINT) AS row_tot,
             CAST(col_tot AS BIGINT) AS col_tot, CAST(n AS BIGINT) AS n,
             CAST(row_tot * col_tot AS DOUBLE) / n AS expected,
             CAST((observed * n - row_tot * col_tot)
                  * (observed * n - row_tot * col_tot) AS BIGINT)
               AS chi_num,
             CAST((observed * n - row_tot * col_tot)
                  * (observed * n - row_tot * col_tot) AS DOUBLE)
               / (n * row_tot * col_tot) AS contrib
      FROM cells JOIN r USING (lang) JOIN c USING (source)
      CROSS JOIN t""")),

    Q("q_gini_split", giniSplit, Some("""
      WITH g AS (SELECT n_chars, doc_id % 3 <> 0 AS gold,
                        unnest([150, 200, 250, 300, 350, 400, 450])
                          AS threshold
                 FROM documents),
      cells AS (SELECT threshold, count(*) AS n,
                       sum(CASE WHEN n_chars < threshold THEN 1 ELSE 0
                           END) AS n_l,
                       sum(CASE WHEN n_chars < threshold AND gold
                           THEN 1 ELSE 0 END) AS pos_l,
                       sum(CASE WHEN gold THEN 1 ELSE 0 END) AS pos
                FROM g GROUP BY 1),
      x AS (SELECT threshold, n, n_l, pos_l, n - n_l AS n_r,
                   pos - pos_l AS pos_r, n_l - pos_l AS neg_l,
                   (n - n_l) - (pos - pos_l) AS neg_r
            FROM cells),
      y AS (SELECT threshold, n, n_l, pos_l, n_r, pos_r,
                   n_r * (n_l * n_l - pos_l * pos_l - neg_l * neg_l)
                     + n_l * (n_r * n_r - pos_r * pos_r - neg_r * neg_r)
                     AS gini_num
            FROM x)
      SELECT CAST(threshold AS BIGINT) AS threshold,
             CAST(n AS BIGINT) AS n, CAST(n_l AS BIGINT) AS n_l,
             CAST(pos_l AS BIGINT) AS pos_l, CAST(n_r AS BIGINT) AS n_r,
             CAST(pos_r AS BIGINT) AS pos_r,
             CAST(gini_num AS BIGINT) AS gini_num,
             CASE WHEN n_l > 0 AND n_r > 0 THEN
               CAST(gini_num AS DOUBLE) / (n * n_l * n_r) END AS gini
      FROM y""")),

    Q("q_target_encode", targetEncode, Some("""
      WITH l AS (SELECT doc_id, source,
                        CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END AS y
                 FROM documents),
      p AS (SELECT source, sum(y) AS sum_y, count(*) AS cnt
            FROM l GROUP BY 1)
      SELECT doc_id, l.source, CAST(y AS BIGINT) AS y,
             CAST(sum_y - y AS BIGINT) AS loo_num,
             CAST(cnt - 1 AS BIGINT) AS loo_den,
             CASE WHEN cnt > 1 THEN
               CAST(sum_y - y AS DOUBLE) / (cnt - 1) END AS loo
      FROM l JOIN p USING (source)"""))
  )
}
