package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics computed AT CORPUS SCALE — the scoring
  * half of a training-data pipeline: once a classifier/ranker/labeler
  * runs over millions of rows, its quality numbers (confusion matrix,
  * agreement, ranking quality) must come out of the same engine as one
  * aggregate pass, not a driver-side sklearn detour over collected
  * rows.
  *
  * Reference analog: the dashboards' quality panels (rating averages,
  * engagement — README.md:16-20) are the BI cousins; for an ML data
  * pipeline these are the eval gates run per snapshot.
  *
  * All three share one scale shape: the per-row judgment (predicted
  * label, annotator vote, rank position) is scan-stage arithmetic, and
  * everything after is a map-side-combinable aggregate — no metric
  * ever needs the rows co-located, only the counts.
  *
  * Float discipline: every emitted ratio is ONE divide of exact
  * BIGINTs (rule 1 — a single correctly-rounded op on bit-identical
  * inputs), with the integer numerator/denominator emitted beside it
  * so the oracle pins the algebra, not just the quotient. F1 uses the
  * identity F1 = 2·tp / (2·tp + fp + fn) to stay one divide; kappa
  * uses (n·agree − Σ marginals) / (n² − Σ marginals). No ln, no
  * multi-op double chain anywhere.
  */
object EvalQueries {

  /** Binary-classifier confusion matrix + precision/recall/F1 in one
    * aggregate pass: the "predicted" label is a cheap length gate (the
    * quality-classifier stand-in), the "gold" label a deterministic
    * held-out rule, so tp/fp/fn/tn are reproducible in SQL. At 100 TB
    * the only thing that moves is four counters per partition. */
  private def confusion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val judged = Tables.documents(s, d).select(
      (length($"text") >= 200).as("pred"),
      ($"doc_id" % 3 =!= 0).as("gold"))
    judged.agg(
      sum(when($"pred" && $"gold", 1L).otherwise(0L)).as("tp"),
      sum(when($"pred" && !$"gold", 1L).otherwise(0L)).as("fp"),
      sum(when(!$"pred" && $"gold", 1L).otherwise(0L)).as("fn"),
      sum(when(!$"pred" && !$"gold", 1L).otherwise(0L)).as("tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        ($"tp".cast("double") / ($"tp" + $"fp")).as("precision"),
        ($"tp".cast("double") / ($"tp" + $"fn")).as("recall"),
        ((lit(2) * $"tp").cast("double") /
          (lit(2) * $"tp" + $"fp" + $"fn")).as("f1"))
  }

  /** Cohen's kappa between two deterministic "annotators" (a length
    * gate and a token-count gate — correlated through document length,
    * so agreement is non-trivial): kappa = (p_o − p_e)/(1 − p_e)
    * cleared to the exact integer form
    * (n·agree − na1·nb1 − na0·nb0) / (n² − na1·nb1 − na0·nb0).
    * Numerator and denominator are exact BIGINT emitted beside the
    * single-divide double. One counting aggregate; the marginals are
    * algebra over the same four cells. */
  private def kappa(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val votes = Tables.documents(s, d).select(
      (length($"text") >= 150).as("a"),
      (size(split(lower($"text"), "\\s+")) >= 25).as("b"))
    val cells = votes.agg(
      count(lit(1)).as("n"),
      sum(when($"a" && $"b", 1L).otherwise(0L)).as("n11"),
      sum(when($"a" && !$"b", 1L).otherwise(0L)).as("n10"),
      sum(when(!$"a" && $"b", 1L).otherwise(0L)).as("n01"),
      sum(when(!$"a" && !$"b", 1L).otherwise(0L)).as("n00"))
    cells
      .withColumn("agree", $"n11" + $"n00")
      .withColumn("chance",
        ($"n11" + $"n10") * ($"n11" + $"n01") +
          ($"n01" + $"n00") * ($"n10" + $"n00"))
      .select($"n", $"n11", $"n10", $"n01", $"n00", $"agree",
        ($"n" * $"agree" - $"chance").as("kappa_num"),
        ($"n" * $"n" - $"chance").as("kappa_den"),
        (($"n" * $"agree" - $"chance").cast("double") /
          ($"n" * $"n" - $"chance")).as("kappa"))
  }

  /** Mean reciprocal rank at 10 — retrieval-eval over per-(series,
    * day) "queries": events ranked by value within each query, a
    * deterministic relevance rule, RR = 1/rank of the first relevant
    * result in the top 10 (0 when none). RR lands as the exact
    * integer 1e6 div rank, so the per-series mean is a BIGINT sum and
    * one divide. One window shuffle on the query key (rank), one
    * aggregate — at scale, ranking depth 10 makes the window frame
    * trivially bounded. */
  private def mrr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day")
      .orderBy($"cents".desc, $"event_id".asc)
    val ranked = Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"), $"event_id",
        $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 10)
    val hits = ranked.filter($"user_id" % 5 === 0)
      .groupBy($"event_type", $"day")
      .agg(min($"rnk").as("first_rel"))
    ranked.select($"event_type", $"day").distinct()
      .join(hits, Seq("event_type", "day"), "left")
      .withColumn("rr_e6",
        coalesce(expr("1000000L div first_rel"), lit(0L)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_queries"),
        sum(when($"first_rel".isNotNull, 1L).otherwise(0L))
          .as("n_with_hit"),
        sum($"rr_e6").as("sum_rr_e6"))
      .withColumn("mrr",
        $"sum_rr_e6".cast("double") / $"n_queries" / 1000000.0)
  }

  /** ROC AUC per language via the rank-sum (Mann–Whitney) identity,
    * computed at DISTINCT-SCORE granularity: collapsing to per-(lang,
    * score) positive/negative counts first shrinks the window input
    * from |corpus| to |distinct scores| — at 100 TB the running sum
    * walks thousands of rows per language, not billions. Ties
    * contribute half a concordant pair each, cleared to integers by
    * carrying 2·numerator: auc_num = Σ_s pos_s·(2·neg_below_s +
    * neg_s), AUC = auc_num / (2·n_pos·n_neg) — exact BIGINT algebra,
    * ONE divide at the end (float rule 1). */
  private def auc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perScore = Tables.documents(s, d)
      .select($"lang", $"n_chars".as("score"),
        ($"doc_id" % 3 =!= 0).as("gold"))
      .groupBy($"lang", $"score")
      .agg(sum(when($"gold", 1L).otherwise(0L)).as("pos"),
        sum(when(!$"gold", 1L).otherwise(0L)).as("neg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"score".asc)
      .rowsBetween(Long.MinValue, -1)
    perScore
      .withColumn("neg_below", coalesce(sum($"neg").over(w), lit(0L)))
      .groupBy($"lang")
      .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
        sum($"pos" * (lit(2) * $"neg_below" + $"neg")).as("auc_num"))
      .select($"lang", $"n_pos", $"n_neg", $"auc_num",
        ($"auc_num".cast("double") / (lit(2) * $"n_pos" * $"n_neg"))
          .as("auc"))
  }

  /** NDCG@10, micro-averaged per series: retrieval ranked by value
    * within each (series, day) query, graded relevance user_id % 3 ∈
    * {0,1,2}, logarithmic position discount from a PINNED integer
    * table (⌊1e6/log2(r+1)⌋ for r = 1..10 — the same ten literals on
    * both engines, so no ln is ever evaluated at query time). The
    * ideal ordering re-ranks the SAME retrieved ten by relevance
    * (self-normalized NDCG), making IDCG a second row_number over an
    * already-10-row frame. Micro-averaging (Σdcg / Σidcg per series)
    * keeps the emit a single divide of exact BIGINTs rather than a
    * fp-order-dependent mean of per-query ratios. */
  private def ndcg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val disc = map(Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
      .zipWithIndex.flatMap { case (e6, i) =>
        Seq(lit(i + 1), lit(e6)) }: _*)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day")
      .orderBy($"cents".desc, $"event_id".asc)
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day")
      .orderBy($"rel".desc, $"event_id".asc)
    Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"), $"event_id",
        ($"user_id" % 3).as("rel"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("rnk", row_number().over(wRank))
      .filter($"rnk" <= 10)
      .withColumn("irnk", row_number().over(wIdeal))
      .groupBy($"event_type")
      .agg(countDistinct($"day").as("n_queries"),
        sum($"rel" * element_at(disc, $"rnk")).as("dcg_e6"),
        sum($"rel" * element_at(disc, $"irnk")).as("idcg_e6"))
      .select($"event_type", $"n_queries", $"dcg_e6", $"idcg_e6",
        ($"dcg_e6".cast("double") / $"idcg_e6").as("ndcg_micro"))
  }

  /** Precision@k / Recall@k (k = 10) — the cutoff-based companion to
    * [[mrr]]/[[ndcg]]: per (event_type, day) ranking of the day's
    * events by spend, a hit is a relevant event (user_id % 3 ≠ 0)
    * inside the top 10. The per-ranker rollup carries exact integer
    * cells (query count, hits inside the cutoff, total relevant) and
    * derives the two micro-averaged ratios with one divide each —
    * precision over the fixed k·queries budget, recall over all
    * relevant. Same pre-agg-below-window shape as the rest of the eval
    * battery: one rank window, a per-day aggregate, a |types|-row
    * rollup — two exchanges at any scale. */
  private def prAtK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day")
      .orderBy($"cents".desc, $"event_id".asc)
    Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"), $"event_id",
        when($"user_id" % 3 =!= 0, 1L).otherwise(0L).as("rel"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("rnk", row_number().over(wRank))
      .groupBy($"event_type", $"day")
      .agg(sum(when($"rnk" <= 10, $"rel").otherwise(0L)).as("tp"),
        sum($"rel").as("day_rel"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_queries"),
        sum($"tp").as("tp_at_10"),
        sum($"day_rel").as("n_rel"))
      .select($"event_type", $"n_queries", $"tp_at_10", $"n_rel",
        ($"tp_at_10".cast("double") / ($"n_queries" * 10).cast("double"))
          .as("precision_at_10"),
        ($"tp_at_10".cast("double") / $"n_rel".cast("double"))
          .as("recall_at_10"))
  }

  /** Calibration (reliability) table — the per-bin comparison of a
    * classifier's claimed confidence against observed frequency that
    * decides whether its scores are usable as sampling weights. The
    * "predicted probability" is a deterministic fake (n_chars % 100
    * over 100), binned into deciles; per bin the emit carries exact
    * integer cells (n, n_pos, sum_p100) and three single-divide
    * ratios, including the calibration gap cleared to one divide:
    * obs − pred = (100·n_pos − sum_p100) / (100·n). Pure scan-stage
    * arithmetic plus one 10-group aggregate. */
  private def calibration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(($"n_chars" % 100).as("p100"),
        ($"doc_id" % 3 =!= 0).as("gold"))
      .groupBy(($"p100" / 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when($"gold", 1L).otherwise(0L)).as("n_pos"),
        sum($"p100").cast("long").as("sum_p100"))
      .select($"bin", $"n", $"n_pos", $"sum_p100",
        ($"sum_p100".cast("double") / (lit(100) * $"n")).as("mean_pred"),
        ($"n_pos".cast("double") / $"n").as("obs_rate"),
        ((lit(100) * $"n_pos" - $"sum_p100").cast("double") /
          (lit(100) * $"n")).as("gap"))
  }

  /** Rank-biased overlap (Webber/Moffat/Zobel 2010) between the two
    * supplier rankings the RRF query fuses (exact-integer revenue vs
    * quantity): RBO(p) = (1−p)·Σ_d p^(d−1)·|S₁..d ∩ T₁..d|/d — the
    * top-weighted ranking-similarity measure that, unlike Kendall/
    * Spearman (q_kendall_tau, q_spearman_trend), handles top-k lists
    * and weights agreement at the head. Emitted as the per-depth
    * curve with a running rbo_e9.
    *
    * Exactness move: prefix-intersection sizes come from
    * X_d = |{items : max(rank₁, rank₂) ≤ d}| — one count per item,
    * no pairwise list comparison — and the geometric weights
    * (1−p)·p^(d−1) are evaluated ONCE in Scala and interpolated as
    * the SAME e9 integer literals into both engines (the shared-
    * double-constant discipline), so no libm pow runs at query time
    * anywhere and every term is pure BIGINT: (w_d·X_d) div d,
    * floor-then-sum. The depth grid is bounded ([[RboK]] rows);
    * the data-scaled stage is the supplier aggregate. */
  val RboK = 50
  val RboP = 0.9
  val RboWeightsE9: Seq[Long] = (1 to RboK)
    .map(dd => math.floor((1.0 - RboP) * math.pow(RboP, dd - 1) * 1e9)
      .toLong)

  private def rankBiasedOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val metrics = Tables.lineitem(s, d)
      .groupBy($"l_suppkey")
      .agg(
        sum(($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          * (lit(100L) - ($"l_discount".cast("decimal(4,2)") * 100)
            .cast("long"))).as("rev_units"),
        sum(($"l_quantity".cast("decimal(18,2)") * 100).cast("long"))
          .as("qty_cents"))
    // same distributed double-ranking as rrfFuse (the depth-grid
    // windows below stay global — they walk the RboK-row grid)
    val G = graft.ext.GlobalRank
    val m = G.withRowNumber(
        G.withRowNumber(
          metrics.withColumn("negrev", -$"rev_units")
            .withColumn("negqty", -$"qty_cents"),
          Seq($"negrev", $"l_suppkey"), "r1"),
        Seq($"negqty", $"l_suppkey"), "r2")
      .select(greatest($"r1", $"r2").as("mx"))
      .groupBy($"mx").agg(count(lit(1)).as("c"))
    val grid = (1 to RboK).map(_.toLong).toDF("d")
    // X_d = Σ_{m≤d} c(m) as an EQUI-join at m=d plus a running sum
    // over the bounded depth grid — no non-equi band join anywhere
    // (PlanAuditSpec audits the whole catalog for nested-loop joins)
    val xd = grid.join(m, grid("d") === m("mx"), "left_outer")
      .select($"d", coalesce($"c", lit(0L)).as("c0"))
      .withColumn("x_d", sum($"c0").over(
        org.apache.spark.sql.expressions.Window.orderBy($"d".asc)))
    xd.select($"d", $"x_d",
        expr("(x_d * 1000000) div d").as("a_e6"),
        (element_at(typedLit(RboWeightsE9), $"d".cast("int"))
          * $"x_d").as("num"))
      .withColumn("term_e9", expr("num div d"))
      .withColumn("rbo_e9", sum($"term_e9").over(
        org.apache.spark.sql.expressions.Window.orderBy($"d".asc)))
      .select($"d", $"x_d", $"a_e6", $"rbo_e9")
      .orderBy($"d".asc)
  }

  /** Isotonic (monotone) calibration — the PAVA fit computed through
    * its minimax characterization: over score bins i (the same
    * 100-value pseudo-score domain as [[calibration]]),
    * iso(i) = max_{j≤i} min_{k≥i} rate(j..k), which equals the
    * pool-adjacent-violators solution exactly (Barlow et al. 1972,
    * §1.2). Chosen over replaying the sequential PAVA loop because
    * minimax is pure dataflow — two joins + two aggregates — with no
    * driver-side iteration, and every term is the floor-e6 integer
    * rate of an interval read off prefix sums, so both engines agree
    * bit-for-bit (the estimator is defined AS the minimax over
    * floored interval rates).
    *
    * Scale shape: the only data-scaled stage is the 100-group
    * map-side-combining aggregate; prefix sums, the O(bins²) interval
    * table, and the O(bins³→171k-row) minimax all run on the BOUNDED
    * bin table, so a 100× corpus changes nothing after the first
    * aggregate. The single-partition window is the documented-OK
    * dim-bounded shape (≤ 100 rows — the rrfFuse precedent). */
  private def isotonicCalibration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score".asc)
    val pref = Tables.documents(s, d)
      .select(($"n_chars" % 100).as("score"),
        ($"doc_id" % 3 =!= 0).as("gold"))
      .groupBy($"score")
      .agg(count(lit(1)).as("n"),
        sum(when($"gold", 1L).otherwise(0L)).as("pos"))
      .select($"score", $"n", $"pos",
        row_number().over(w).cast("long").as("rn"),
        (sum($"n").over(w) - $"n").as("cn_prev"),
        (sum($"pos").over(w) - $"pos").as("cpos_prev"))
    val pairs = pref.as("x").join(pref.as("y"), $"x.rn" <= $"y.rn")
      .select($"x.rn".as("j"), $"y.rn".as("k"),
        expr("""((y.cpos_prev + y.pos - x.cpos_prev) * 1000000)
                div (y.cn_prev + y.n - x.cn_prev)""").as("rate_e6"))
    val mji = pairs
      .join(pref.select($"rn".as("i")), $"j" <= $"i" && $"i" <= $"k")
      .groupBy($"i", $"j").agg(min($"rate_e6").as("mj"))
    val iso = mji.groupBy($"i").agg(max($"mj").as("iso_e6"))
    pref.join(iso, pref("rn") === iso("i"))
      .select($"score", $"n", $"pos",
        expr("(pos * 1000000) div n").as("rate_e6"), $"iso_e6")
      .orderBy($"score".asc)
  }

  /** Reciprocal-rank fusion (RRF) of two independent rankers — the
    * standard way a retrieval stack ensembles lexical and semantic
    * rankings (score = Σ 1/(k + rankᵣ), k = 60 per the original
    * Cormack/Clarke/Büttcher formulation): here suppliers ranked by
    * exact-integer revenue and by total quantity, fused and top-20'd.
    * The reciprocal is carried as the scaled integer 10⁶ div (60+rank)
    * so the fused score is exact BIGINT — no float ordering ties.
    * Scale shape: the fact scan collapses to a DIM-cardinality
    * aggregate (one row per supplier); the two rank windows run over
    * that dim-sized table, where a single-partition window is the
    * documented-OK shape (bounded by |suppliers|, not data — the
    * GlobalRank offsets table precedent). At a fact-cardinality
    * ranking, swap in GlobalRank.withRowNumber. */
  private def rrfFuse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val metrics = Tables.lineitem(s, d)
      .groupBy($"l_suppkey")
      .agg(
        sum(($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          * (lit(100L) - ($"l_discount".cast("decimal(4,2)") * 100)
            .cast("long"))).as("rev_units"),
        sum(($"l_quantity".cast("decimal(18,2)") * 100).cast("long"))
          .as("qty_cents"))
    // Two global rankings over ALL suppliers: distributed GlobalRank
    // (desc keys negated for the range-partition fast path) instead
    // of two unpartitioned single-task-sort windows.
    val G = graft.ext.GlobalRank
    G.withRowNumber(
        G.withRowNumber(
          metrics.withColumn("negrev", -$"rev_units")
            .withColumn("negqty", -$"qty_cents"),
          Seq($"negrev", $"l_suppkey"), "rank_rev"),
        Seq($"negqty", $"l_suppkey"), "rank_qty")
      .select($"l_suppkey", $"rank_rev", $"rank_qty",
        (expr("1000000L div (60 + rank_rev)") +
          expr("1000000L div (60 + rank_qty)")).as("rrf_e6"))
      .orderBy($"rrf_e6".desc, $"l_suppkey".asc)
      .limit(20)
  }

  /** Decile lift / gains table — the campaign-targeting view of a
    * scored classifier ("score the corpus, keep the top k %: how much
    * better than random?"): documents ranked by score DESCENDING into
    * equal-count deciles (GlobalRank ntile — no single-partition
    * sort), per decile the positive rate as a LIFT over the base rate
    * and the cumulative share of all positives captured. Everything
    * is exact integer ppm — lift = (pos_d·N·1e6) div (n_d·P),
    * capture = (cum_pos·1e6) div P — zero doubles (the EvalQueries
    * discipline). Same deterministic score/gold convention as
    * q_eval_auc (n_chars score, doc_id%3 gold). */
  private def evalLift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d)
      .select($"doc_id", $"n_chars".cast("long").as("score"),
        ($"doc_id" % 3 =!= 0).as("gold"))
      .withColumn("neg", -$"score")
    val tot = base.agg(count(lit(1)).as("n_all"),
      sum(when($"gold", 1L).otherwise(0L)).as("p_all"))
    graft.ext.GlobalRank
      .withRowNumber(base, Seq($"neg", $"doc_id"), "i")
      .crossJoin(broadcast(tot))
      .withColumn("decile",
        graft.ext.GlobalRank.ntileFromRn($"i", $"n_all", 10))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_d"),
        sum(when($"gold", 1L).otherwise(0L)).as("pos_d"),
        max($"n_all").as("n_all"), max($"p_all").as("p_all"))
      .withColumn("cum_pos", sum($"pos_d").over(
        W.orderBy($"decile").rowsBetween(W.unboundedPreceding, 0)))
      .select($"decile", $"n_d", $"pos_d",
        expr("(pos_d * n_all * 1000000) div (n_d * p_all)")
          .as("lift_ppm"),
        expr("(cum_pos * 1000000) div p_all").as("capture_ppm"))
  }

  /** Trained naive-Bayes classifier + held-out confusion matrix —
    * the LEARNING counterpart to q_quality_classifier's fixed
    * weights: the model (class priors, Laplace-smoothed weekday and
    * revenue-band likelihoods) is FIT inside the engine from the
    * even-event_id half and evaluated on the odd half, end to end in
    * one DAG. The model tables are class-cardinality and BROADCAST;
    * scoring is test × |classes| via one cross join of a 5-row dim
    * (the broadcast-scalar fan pattern) plus two broadcast left
    * joins; the argmax is an exact struct-min with a class-name tie
    * break. Determinism: scores are identical expression trees on
    * exact BIGINT counts; an argmax flip would need two classes'
    * log-scores within ~1 ulp, which at count scales ≤ 1e12 forces
    * the underlying rationals EQUAL — and exact ties fall to the
    * name tie-break in both engines. Shape: two map-side-combinable
    * count rollups (model), one broadcast-joined scan (scoring), one
    * |classes|² confusion rollup. */
  private def naiveBayes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, d)
      .select($"event_type".as("cls"),
        dayofweek($"ts").cast("long").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_train"))
      .filter($"cents".isNotNull)
      .withColumn("b", expr("cents div 5000"))
    val train = rows.filter($"is_train")
    val test = rows.filter(!$"is_train")
      .select($"cls".as("actual"), $"w", $"b")
    val nTrain = train.agg(count(lit(1)).as("n_train"),
      countDistinct($"cls").as("k_cls"),
      countDistinct($"b").as("k_b"))
    val prior = train.groupBy($"cls").agg(count(lit(1)).as("n_c"))
    val likW = train.groupBy($"cls", $"w").agg(count(lit(1)).as("n_cw"))
    val likB = train.groupBy($"cls", $"b").agg(count(lit(1)).as("n_cb"))
    val score = log(($"n_c" + lit(1.0)) / ($"n_train" + $"k_cls")) +
      log((coalesce($"n_cw", lit(0L)) + lit(1.0)) / ($"n_c" + lit(7.0))) +
      log((coalesce($"n_cb", lit(0L)) + lit(1.0)) / ($"n_c" + $"k_b"))
    // collapse identical test rows to distinct feature cells first:
    // scoring cost becomes |cells|·|classes|, independent of test
    // volume after the map-side-combinable rollup
    test.groupBy($"actual", $"w", $"b")
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(prior))
      .join(broadcast(likW), Seq("cls", "w"), "left")
      .join(broadcast(likB), Seq("cls", "b"), "left")
      .crossJoin(broadcast(nTrain))
      .withColumn("sc", score)
      .groupBy($"actual", $"w", $"b", $"n_rows")
      .agg(min(struct((-$"sc").as("ns"), $"cls")).getField("cls")
        .as("predicted"))
      .groupBy($"actual", $"predicted")
      .agg(sum($"n_rows").as("n"))
  }

  /** 5-fold cross-validation of the naive-Bayes model — the
    * model-selection primitive on top of [[naiveBayes]]'s single
    * split, built on the COMPLEMENT-COUNTS trick: fold f's training
    * counts are (total − fold_f) for every model table, so all five
    * models come from ONE pass over the data (two count rollups:
    * per-key totals and per-(key, fold) cells) instead of five
    * re-trains — the shape that matters at 100 TB, where "fit 5
    * models" must not mean "scan 5 times". Fold assignment is the
    * Knuth hash of event_id (deterministic, partition-independent);
    * smoothing uses the GLOBAL class/band cardinalities (documented
    * choice — per-fold vocabularies would make the smoothing
    * constant data-dependent per fold). Scoring collapses test rows
    * to distinct (fold, actual, w, b) cells first; every model
    * table is fold/class-cardinality and broadcasts. Emits per-fold
    * accuracy as exact integers. */
  private def crossvalNb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, d)
      .select($"event_type".as("cls"),
        dayofweek($"ts").cast("long").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (pmod($"event_id" * lit(2654435761L), lit(4294967296L)) % 5)
          .as("fold"))
      .filter($"cents".isNotNull)
      .withColumn("b", expr("cents div 5000"))
    val nTot = rows.agg(count(lit(1)).as("n_all"),
      countDistinct($"cls").as("k_cls"),
      countDistinct($"b").as("k_b"))
    val nFold = rows.groupBy($"fold").agg(count(lit(1)).as("n_f"))
    val priorT = rows.groupBy($"cls").agg(count(lit(1)).as("n_c"))
    val priorF = rows.groupBy($"cls", $"fold")
      .agg(count(lit(1)).as("n_c_f"))
    val likwT = rows.groupBy($"cls", $"w").agg(count(lit(1)).as("n_cw"))
    val likwF = rows.groupBy($"cls", $"w", $"fold")
      .agg(count(lit(1)).as("n_cw_f"))
    val likbT = rows.groupBy($"cls", $"b").agg(count(lit(1)).as("n_cb"))
    val likbF = rows.groupBy($"cls", $"b", $"fold")
      .agg(count(lit(1)).as("n_cb_f"))
    val cells = rows.select($"cls".as("actual"), $"w", $"b", $"fold")
      .groupBy($"fold", $"actual", $"w", $"b")
      .agg(count(lit(1)).as("n_rows"))
    val trC = $"n_c" - coalesce($"n_c_f", lit(0L))
    val score =
      log((trC + lit(1.0)) /
        ($"n_all" - $"n_f" + $"k_cls")) +
      log((coalesce($"n_cw", lit(0L)) - coalesce($"n_cw_f", lit(0L))
        + lit(1.0)) / (trC + lit(7.0))) +
      log((coalesce($"n_cb", lit(0L)) - coalesce($"n_cb_f", lit(0L))
        + lit(1.0)) / (trC + $"k_b"))
    cells
      .crossJoin(broadcast(priorT))
      .join(broadcast(priorF), Seq("cls", "fold"), "left")
      .join(broadcast(likwT), Seq("cls", "w"), "left")
      .join(broadcast(likwF), Seq("cls", "w", "fold"), "left")
      .join(broadcast(likbT), Seq("cls", "b"), "left")
      .join(broadcast(likbF), Seq("cls", "b", "fold"), "left")
      .crossJoin(broadcast(nTot))
      .join(broadcast(nFold), Seq("fold"))
      .withColumn("sc", score)
      .groupBy($"fold", $"actual", $"w", $"b", $"n_rows")
      .agg(min(struct((-$"sc").as("ns"), $"cls")).getField("cls")
        .as("predicted"))
      .groupBy($"fold")
      .agg(sum($"n_rows").as("n_rows"),
        sum(when($"actual" === $"predicted", $"n_rows")
          .otherwise(0L)).as("n_correct"))
      .withColumn("acc_e6", expr("n_correct * 1000000 div n_rows"))
  }

  /** One-pass learning curve — held-out naive-Bayes accuracy as a
    * function of training-set size, the "how much data do we need"
    * planner every data-acquisition decision rests on: event_ids
    * hash into 10 deterministic bands; band 9 is the fixed held-out
    * set and the nine nested training sets are bands < f for
    * f = 1..9. The CUMULATIVE-counts trick (the prefix analog of
    * [[crossvalNb]]'s complement trick) builds all nine models from
    * the SAME per-(key, band) count cells: the data is scanned once
    * for the cell rollups, and the ×9 expansion happens on the tiny
    * class-cardinality tables, never the fact table. Accuracy per
    * threshold in exact integers — a regression in the curve's shape
    * (non-monotone tail, collapsed small-data end) hash-fails the
    * driver gate. */
  private def learningCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, d)
      .select($"event_type".as("cls"),
        dayofweek($"ts").cast("long").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (pmod($"event_id" * lit(2654435761L), lit(4294967296L)) % 10)
          .as("band10"))
      .filter($"cents".isNotNull)
      .withColumn("b", expr("cents div 5000"))
    val fdim = (1L to 9L).toDF("f")
    val kDims = rows.agg(countDistinct($"cls").as("k_cls"),
      countDistinct($"b").as("k_b"))
    val tr = rows.filter($"band10" < 9)
    def perF(counts: DataFrame, keys: Seq[String], out: String) =
      counts.crossJoin(fdim).filter($"band10" < $"f")
        .groupBy(($"f" +: keys.map(col)): _*)
        .agg(sum($"cnt").as(out))
    val priorF = perF(tr.groupBy($"cls", $"band10")
      .agg(count(lit(1)).as("cnt")), Seq("cls"), "n_c")
    val likwF = perF(tr.groupBy($"cls", $"w", $"band10")
      .agg(count(lit(1)).as("cnt")), Seq("cls", "w"), "n_cw")
    val likbF = perF(tr.groupBy($"cls", $"b", $"band10")
      .agg(count(lit(1)).as("cnt")), Seq("cls", "b"), "n_cb")
    val ntrF = perF(tr.groupBy($"band10")
      .agg(count(lit(1)).as("cnt")), Seq.empty, "n_train")
    val cells = rows.filter($"band10" === 9)
      .groupBy($"cls".as("actual"), $"w", $"b")
      .agg(count(lit(1)).as("n_rows"))
    val score =
      log(($"n_c" + lit(1.0)) / ($"n_train" + $"k_cls")) +
      log((coalesce($"n_cw", lit(0L)) + lit(1.0)) / ($"n_c" + lit(7.0))) +
      log((coalesce($"n_cb", lit(0L)) + lit(1.0)) / ($"n_c" + $"k_b"))
    cells
      .crossJoin(broadcast(priorF))
      .join(broadcast(likwF), Seq("f", "cls", "w"), "left")
      .join(broadcast(likbF), Seq("f", "cls", "b"), "left")
      .join(broadcast(ntrF), Seq("f"))
      .crossJoin(broadcast(kDims))
      .withColumn("sc", score)
      .groupBy($"f", $"actual", $"w", $"b", $"n_rows")
      .agg(min(struct((-$"sc").as("ns"), $"cls")).getField("cls")
        .as("predicted"), max($"n_train").as("n_train"))
      .groupBy($"f")
      .agg(max($"n_train").as("n_train"),
        sum($"n_rows").as("n_test"),
        sum(when($"actual" === $"predicted", $"n_rows")
          .otherwise(0L)).as("n_correct"))
      .withColumn("acc_e6", expr("n_correct * 1000000 div n_test"))
  }

  /** COEC position-bias correction (clicks over expected clicks) —
    * the ranking-eval normalizer: raw CTR punishes whatever ranks low
    * because position drives clicks, so each impression is credited
    * against the GLOBAL click prior of its position and a series'
    * quality is clicks / Σ prior(position) — COEC > 1 means the
    * series out-performs its positions. Impressions are the per-(type,
    * day) top-10 by value (one bounded rank window); the position
    * prior is a 10-row broadcast; expected clicks are exact because
    * priors land on a ppm integer grid before the sum. */
  private def positionBias(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day")
      .orderBy($"cents".desc, $"event_id".asc)
    val imps = Tables.events(s, d)
      .select($"event_type", to_date($"ts").as("day"), $"event_id",
        ($"user_id" % 3 === 0).as("clicked"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter($"pos" <= 10)
    val prior = imps.groupBy($"pos")
      .agg(count(lit(1)).as("n_p"),
        sum(when($"clicked", 1L).otherwise(0L)).as("c_p"))
      .withColumn("prior_ppm", expr("c_p * 1000000 div n_p"))
      .select($"pos", $"prior_ppm")
    imps.join(broadcast(prior), Seq("pos"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_imps"),
        sum(when($"clicked", 1L).otherwise(0L)).as("clicks"),
        sum($"prior_ppm").as("expected_ppm"))
      .withColumn("coec_e3",
        expr("clicks * 1000000000 div expected_ppm"))
  }

  /** Best single-threshold split (depth-1 regression stump) of `yCol`
    * on ordered feature `feat`, per event type: bins aggregate
    * map-side, prefix sums over the ≤31-bin window give every split's
    * left/right moments in one pass, and the variance-reduction score
    * (S_L·n − S·n_L)²/(n_L·n_R) picks the argmax (score formed in
    * double from exact sums — the welch discipline; ties to the
    * smaller split). Leaf values are FLOORED integer means: the <1¢
    * quantization is the price of bit-determinism in the boosting
    * residuals. */
  private def bestStump(data: DataFrame, feat: String, yCol: String)
      : DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("event_type")).orderBy(col("bin").asc)
    data.groupBy(col("event_type"), col(feat).as("bin"))
      .agg(count(lit(1)).as("nb"), sum(col(yCol)).as("sb"))
      .withColumn("n_l", sum(col("nb")).over(w))
      .withColumn("s_l", sum(col("sb")).over(w))
      .withColumn("n",
        sum(col("nb")).over(W.partitionBy(col("event_type"))))
      .withColumn("s",
        sum(col("sb")).over(W.partitionBy(col("event_type"))))
      .filter(col("n_l") < col("n"))
      .withColumn("score", {
        val num = col("s_l").cast("double") * col("n") -
          col("s").cast("double") * col("n_l")
        num * num / (col("n_l").cast("double") * (col("n") - col("n_l")))
      })
      .withColumn("rn", row_number().over(W
        .partitionBy(col("event_type"))
        .orderBy(col("score").desc, col("bin").asc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("bin").as("split"),
        col("n_l"), (col("n") - col("n_l")).as("n_r"),
        expr("s_l div n_l").as("mean_l"),
        expr("(s - s_l) div (n - n_l)").as("mean_r"),
        floor(col("score")).as("score_e0"))
  }

  /** Two rounds of gradient boosting with depth-1 stumps — the GBDT
    * training loop re-expressed as dataflow: round 1 fits revenue
    * cents on hour-of-day, round 2 fits the ROUND-1 RESIDUALS on
    * day-of-week, exactly the stagewise residual-fitting that grows a
    * boosted ensemble (each round is [[bestStump]]'s one-pass split
    * search). Because leaf values floor to integer cents, residuals
    * stay exact BIGINTs and the whole two-model ensemble is
    * bit-deterministic — no learning-rate float chain. Per round the
    * work is one map-side bin aggregate + a ≤31-row window per
    * series: at 100 TB only the bin rollups scan data. Output: one
    * row per (type, round) with the chosen split, leaf means, and
    * the variance-reduction score. */
  private def stumpBoost(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.events(s, d)
      .select($"event_type", hour($"ts").cast("long").as("f1"),
        dayofweek($"ts").cast("long").as("f2"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .filter($"y".isNotNull)
    val r1 = bestStump(rows, "f1", "y")
    val resid = rows.join(broadcast(r1), Seq("event_type"))
      .withColumn("r", $"y" -
        when($"f1" <= $"split", $"mean_l").otherwise($"mean_r"))
      .select($"event_type", $"f2", $"r")
    val r2 = bestStump(resid, "f2", "r")
    r1.withColumn("round", lit(1L)).withColumn("feature", lit("hour"))
      .unionByName(r2.withColumn("round", lit(2L))
        .withColumn("feature", lit("dow")))
  }

  /** Brier score per language — the PROBABILISTIC companion to
    * [[confusion]]: where the confusion matrix judges the thresholded
    * label, Brier judges the raw probability (mean squared error of
    * p against the 0/1 outcome), so an over-confident classifier pays
    * even when its argmax is right. The "probability" is a
    * deterministic length ramp snapped to a 1e-3 grid
    * (p_e3 = min(n_chars·1000 div 400, 1000) — integer division, so
    * both engines agree bit-for-bit), and each row's squared error
    * (p_e3 − y_e3)² ≤ 1e6 is an exact BIGINT: the per-language sum
    * stays inside int64 up to ~9e12 rows, far past 100 TB of
    * documents. One map-side-combinable aggregate; the only double is
    * the final single divide. */
  private def brierScore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"lang",
        least(expr("n_chars * 1000 div 400"), lit(1000L)).as("p_e3"),
        when($"doc_id" % 3 =!= 0, 1000L).otherwise(0L).as("y_e3"))
      .withColumn("sq_e6", ($"p_e3" - $"y_e3") * ($"p_e3" - $"y_e3"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum($"sq_e6").as("sum_sq_e6"),
        sum(when($"y_e3" === 1000L, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("brier_e6", expr("sum_sq_e6 div n"))
      .withColumn("brier",
        $"sum_sq_e6".cast("double") / $"n" / 1000000.0)
  }

  /** Murphy (1973) decomposition of the Brier score per language —
    * WHY is a forecaster bad: reliability (calibration error of each
    * forecast bin), resolution (how far bin outcomes spread from the
    * base rate; larger is better), uncertainty (the outcome's own
    * variance, the no-skill floor). Same forecast/outcome pair as
    * [[brierScore]]; forecasts bin by decile (p_e3 div 100). Each
    * component clears its bin denominators exactly:
    * REL/N = Σ_b ⌊(Σp − 10³·posᵦ)²/nᵦ⌋ / N,
    * RES/N = Σ_b ⌊10⁶·(posᵦN − Pnᵦ)²/(nᵦN²)⌋ / N,
    * UNC = 10⁶·P(N−P)/N² — truncating divisions of nonnegative
    * decimal(38,0) integers (the per-bin floor grid is the operator
    * contract). With CONTINUOUS forecasts binned by decile the
    * three-term identity BS = REL − RES + UNC picks up the
    * within-bin variance/covariance terms (Stephenson et al. 2008's
    * generalized decomposition); decomp_gap_e6 rides along as exactly
    * that term — the spec replays it to the flooring grid, so a
    * drifting gap fails the suite. Shape: one (lang, bin) rollup —
    * ≤ |langs|·11 rows — then a |langs|-row rollup. */
  private def brierDecomposition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val bins = Tables.documents(s, d)
      .select($"lang",
        least(expr("n_chars * 1000 div 400"), lit(1000L)).as("p_e3"),
        when($"doc_id" % 3 =!= 0, 1000L).otherwise(0L).as("y_e3"))
      .withColumn("bin", expr("p_e3 div 100"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("nb"), sum($"p_e3").as("sp"),
        sum(when($"y_e3" === 1000L, 1L).otherwise(0L)).as("pos"),
        sum(($"p_e3" - $"y_e3") * ($"p_e3" - $"y_e3")).as("sq"))
    val tot = bins.groupBy($"lang")
      .agg(sum($"nb").as("n"), sum($"pos").as("p"),
        sum($"sq").as("sum_sq"))
    bins.join(tot, "lang")
      .select($"lang", $"n", $"p", $"sum_sq",
        expr(s"cast((cast(sp as $dec) - 1000 * pos)" +
          s" * (cast(sp as $dec) - 1000 * pos) div nb as $dec)")
          .as("rel_b"),
        expr(s"cast(1000000 as $dec)" +
          s" * (cast(pos as $dec) * n - cast(p as $dec) * nb)" +
          s" * (cast(pos as $dec) * n - cast(p as $dec) * nb)" +
          s" div (cast(nb as $dec) * n * n)").as("res_b"))
      .groupBy($"lang")
      .agg(max($"n").as("n"), max($"p").as("n_pos"),
        max($"sum_sq").as("sum_sq"),
        sum($"rel_b").as("rel_sum"), sum($"res_b").as("res_sum"))
      .select($"lang", $"n", $"n_pos",
        expr("cast(sum_sq div n as bigint)").as("brier_e6"),
        expr(s"cast(rel_sum div n as bigint)").as("rel_e6"),
        expr(s"cast(res_sum div n as bigint)").as("res_e6"),
        expr(s"cast(cast(1000000 as $dec) * n_pos * (n - n_pos)" +
          s" div (cast(n as $dec) * n) as bigint)").as("unc_e6"))
      .withColumn("decomp_gap_e6",
        $"brier_e6" - ($"rel_e6" - $"res_e6" + $"unc_e6"))
  }

  /** Matthews correlation coefficient — the single-number confusion
    * summary that stays honest under class imbalance (accuracy and F1
    * both inflate when one class dominates; MCC is the Pearson
    * correlation of the 2×2 table and is 0 for any constant
    * classifier). Same one-pass four-counter aggregate as
    * [[confusion]] but with an independent predictor (a token-count
    * gate) so the two queries don't pin the same cells. The χ²-style
    * cross products tp·tn, fp·fn and the four marginals are formed in
    * DOUBLE (the cramersV discipline: int64 products wrap silently
    * past ~3e9 rows while DuckDB raises), left-associated identically
    * in both engines, and the final value is emitted as floor·1e6
    * BIGINT — floor on bit-identical IEEE doubles is deterministic. */
  private def matthewsCorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val judged = Tables.documents(s, d).select(
      (size(split($"text", "\\s+")) >= 20).as("pred"),
      ($"doc_id" % 3 =!= 0).as("gold"))
    judged.agg(
      sum(when($"pred" && $"gold", 1L).otherwise(0L)).as("tp"),
      sum(when($"pred" && !$"gold", 1L).otherwise(0L)).as("fp"),
      sum(when(!$"pred" && $"gold", 1L).otherwise(0L)).as("fn"),
      sum(when(!$"pred" && !$"gold", 1L).otherwise(0L)).as("tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        floor(($"tp".cast("double") * $"tn" -
            $"fp".cast("double") * $"fn") * lit(1000000.0) /
          sqrt(($"tp" + $"fp").cast("double") * ($"tp" + $"fn") *
            ($"tn" + $"fp") * ($"tn" + $"fn"))).as("mcc_e6"))
  }

  /** Per-class F-beta sweep (F0.5 / F1 / F2) — the multi-class
    * extension of [[confusion]]'s binary F1: a 3-class deterministic
    * pair (pred = n_chars mod 3, gold = doc_id mod 3) reduces to a
    * 9-cell contingency table in ONE map-side-combinable aggregate,
    * and every per-class count (tp on the diagonal, fp/fn from the
    * marginals) is algebra over those 9 rows — three tiny joins on a
    * 3-row key, never a second pass over the data. The β² weights
    * 1/4, 1, 4 clear to the integer forms 5tp/(5tp+fn+4fp),
    * 2tp/(2tp+fp+fn), 5tp/(5tp+4fn+fp): each score is ONE exact
    * integer division on BIGINTs (e6 grid), so the result is
    * bit-deterministic at any scale. */
  private def fbetaPerClass(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, d)
      .select(($"n_chars" % 3).as("pred_c"), ($"doc_id" % 3).as("gold_c"))
      .groupBy($"pred_c", $"gold_c").agg(count(lit(1)).as("cnt"))
    val predTot = cells.groupBy($"pred_c".as("cls"))
      .agg(sum($"cnt").as("n_pred"))
    val goldTot = cells.groupBy($"gold_c".as("cls"))
      .agg(sum($"cnt").as("n_gold"))
    val diag = cells.filter($"pred_c" === $"gold_c")
      .select($"pred_c".as("cls"), $"cnt".as("tp"))
    predTot.join(goldTot, Seq("cls")).join(diag, Seq("cls"))
      .select($"cls", $"tp",
        ($"n_pred" - $"tp").as("fp"), ($"n_gold" - $"tp").as("fn"))
      .withColumn("f05_e6",
        expr("tp * 5 * 1000000 div (5 * tp + fn + 4 * fp)"))
      .withColumn("f1_e6",
        expr("tp * 2 * 1000000 div (2 * tp + fp + fn)"))
      .withColumn("f2_e6",
        expr("tp * 5 * 1000000 div (5 * tp + 4 * fn + fp)"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_learning_curve", learningCurve, Some("""
      WITH rows0 AS (
        SELECT event_type AS cls,
               CAST(isodow(CAST(ts AS DATE)) % 7 + 1 AS BIGINT) AS w,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 // 5000 AS b,
               (event_id * 2654435761) % 4294967296 % 10 AS band10
        FROM events WHERE value IS NOT NULL),
      fdim AS (SELECT CAST(x AS BIGINT) AS f
               FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8),
                            (9)) v(x)),
      kd AS (SELECT CAST(count(DISTINCT cls) AS BIGINT) AS k_cls,
                    CAST(count(DISTINCT b) AS BIGINT) AS k_b
             FROM rows0),
      tr AS (SELECT * FROM rows0 WHERE band10 < 9),
      pf AS (SELECT f, cls, CAST(sum(cnt) AS BIGINT) AS n_c
             FROM (SELECT cls, band10, count(*) AS cnt
                   FROM tr GROUP BY 1, 2) c
             CROSS JOIN fdim WHERE c.band10 < f GROUP BY 1, 2),
      lwf AS (SELECT f, cls, w, CAST(sum(cnt) AS BIGINT) AS n_cw
              FROM (SELECT cls, w, band10, count(*) AS cnt
                    FROM tr GROUP BY 1, 2, 3) c
              CROSS JOIN fdim WHERE c.band10 < f GROUP BY 1, 2, 3),
      lbf AS (SELECT f, cls, b, CAST(sum(cnt) AS BIGINT) AS n_cb
              FROM (SELECT cls, b, band10, count(*) AS cnt
                    FROM tr GROUP BY 1, 2, 3) c
              CROSS JOIN fdim WHERE c.band10 < f GROUP BY 1, 2, 3),
      ntf AS (SELECT f, CAST(sum(cnt) AS BIGINT) AS n_train
              FROM (SELECT band10, count(*) AS cnt
                    FROM tr GROUP BY 1) c
              CROSS JOIN fdim WHERE c.band10 < f GROUP BY 1),
      cells AS (SELECT cls AS actual, w, b,
                       CAST(count(*) AS BIGINT) AS n_rows
                FROM rows0 WHERE band10 = 9 GROUP BY 1, 2, 3),
      scored AS (
        SELECT p.f, c.actual, c.w, c.b, c.n_rows, p.cls, nt.n_train,
               ln((p.n_c + 1.0) / (nt.n_train + kd.k_cls))
               + ln((coalesce(lw.n_cw, 0) + 1.0) / (p.n_c + 7.0))
               + ln((coalesce(lb.n_cb, 0) + 1.0) / (p.n_c + kd.k_b))
                 AS sc
        FROM cells c
        CROSS JOIN pf p
        LEFT JOIN lwf lw ON lw.f = p.f AND lw.cls = p.cls
                        AND lw.w = c.w
        LEFT JOIN lbf lb ON lb.f = p.f AND lb.cls = p.cls
                        AND lb.b = c.b
        JOIN ntf nt ON nt.f = p.f
        CROSS JOIN kd),
      pred AS (SELECT f, actual, w, b, n_rows,
                      min(struct_pack(ns := -sc, c := cls)).c
                        AS predicted,
                      max(n_train) AS n_train
               FROM scored GROUP BY 1, 2, 3, 4, 5),
      agg AS (SELECT f, CAST(max(n_train) AS BIGINT) AS n_train,
                     CAST(sum(n_rows) AS BIGINT) AS n_test,
                     CAST(sum(CASE WHEN actual = predicted
                              THEN n_rows ELSE 0 END) AS BIGINT)
                       AS n_correct
              FROM pred GROUP BY 1)
      SELECT f, n_train, n_test, n_correct,
             CAST(n_correct * 1000000 // n_test AS BIGINT) AS acc_e6
      FROM agg""")),

    Q("q_crossval_nb", crossvalNb, Some("""
      WITH rows0 AS (
        SELECT event_type AS cls,
               CAST(isodow(CAST(ts AS DATE)) % 7 + 1 AS BIGINT) AS w,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 // 5000 AS b,
               (event_id * 2654435761) % 4294967296 % 5 AS fold
        FROM events WHERE value IS NOT NULL),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                    CAST(count(DISTINCT cls) AS BIGINT) AS k_cls,
                    CAST(count(DISTINCT b) AS BIGINT) AS k_b
             FROM rows0),
      nf AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_f
             FROM rows0 GROUP BY 1),
      pt AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_c
             FROM rows0 GROUP BY 1),
      pf AS (SELECT cls, fold, CAST(count(*) AS BIGINT) AS n_c_f
             FROM rows0 GROUP BY 1, 2),
      lwt AS (SELECT cls, w, CAST(count(*) AS BIGINT) AS n_cw
              FROM rows0 GROUP BY 1, 2),
      lwf AS (SELECT cls, w, fold, CAST(count(*) AS BIGINT) AS n_cw_f
              FROM rows0 GROUP BY 1, 2, 3),
      lbt AS (SELECT cls, b, CAST(count(*) AS BIGINT) AS n_cb
              FROM rows0 GROUP BY 1, 2),
      lbf AS (SELECT cls, b, fold, CAST(count(*) AS BIGINT) AS n_cb_f
              FROM rows0 GROUP BY 1, 2, 3),
      cells AS (SELECT fold, cls AS actual, w, b,
                       CAST(count(*) AS BIGINT) AS n_rows
                FROM rows0 GROUP BY 1, 2, 3, 4),
      scored AS (
        SELECT c.fold, c.actual, c.w, c.b, c.n_rows, pt.cls,
               ln((pt.n_c - coalesce(pf.n_c_f, 0) + 1.0)
                  / (nt.n_all - nf.n_f + nt.k_cls))
               + ln((coalesce(lwt.n_cw, 0) - coalesce(lwf.n_cw_f, 0)
                     + 1.0)
                    / (pt.n_c - coalesce(pf.n_c_f, 0) + 7.0))
               + ln((coalesce(lbt.n_cb, 0) - coalesce(lbf.n_cb_f, 0)
                     + 1.0)
                    / (pt.n_c - coalesce(pf.n_c_f, 0) + nt.k_b))
                 AS sc
        FROM cells c
        CROSS JOIN pt
        LEFT JOIN pf ON pf.cls = pt.cls AND pf.fold = c.fold
        LEFT JOIN lwt ON lwt.cls = pt.cls AND lwt.w = c.w
        LEFT JOIN lwf ON lwf.cls = pt.cls AND lwf.w = c.w
                     AND lwf.fold = c.fold
        LEFT JOIN lbt ON lbt.cls = pt.cls AND lbt.b = c.b
        LEFT JOIN lbf ON lbf.cls = pt.cls AND lbf.b = c.b
                     AND lbf.fold = c.fold
        CROSS JOIN nt
        JOIN nf ON nf.fold = c.fold),
      pred AS (SELECT fold, actual, w, b, n_rows,
                      min(struct_pack(ns := -sc, c := cls)).c
                        AS predicted
               FROM scored GROUP BY 1, 2, 3, 4, 5),
      agg AS (SELECT fold,
                     CAST(sum(n_rows) AS BIGINT) AS n_rows,
                     CAST(sum(CASE WHEN actual = predicted
                              THEN n_rows ELSE 0 END) AS BIGINT)
                       AS n_correct
              FROM pred GROUP BY 1)
      SELECT CAST(fold AS BIGINT) AS fold, n_rows, n_correct,
             CAST(n_correct * 1000000 // n_rows AS BIGINT) AS acc_e6
      FROM agg""")),

    Q("q_naive_bayes", naiveBayes, Some("""
      WITH rows0 AS (
        SELECT event_type AS cls,
               CAST(isodow(CAST(ts AS DATE)) % 7 + 1 AS BIGINT) AS w,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 // 5000 AS b,
               event_id % 2 = 0 AS is_train
        FROM events WHERE value IS NOT NULL),
      train AS (SELECT * FROM rows0 WHERE is_train),
      test AS (SELECT cls AS actual, w, b
               FROM rows0 WHERE NOT is_train),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
                    CAST(count(DISTINCT cls) AS BIGINT) AS k_cls,
                    CAST(count(DISTINCT b) AS BIGINT) AS k_b
             FROM train),
      prior AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_c
                FROM train GROUP BY 1),
      likw AS (SELECT cls, w, CAST(count(*) AS BIGINT) AS n_cw
               FROM train GROUP BY 1, 2),
      likb AS (SELECT cls, b, CAST(count(*) AS BIGINT) AS n_cb
               FROM train GROUP BY 1, 2),
      cells AS (SELECT actual, w, b,
                       CAST(count(*) AS BIGINT) AS n_rows
                FROM test GROUP BY 1, 2, 3),
      scored AS (
        SELECT c.actual, c.w, c.b, c.n_rows, p.cls,
               ln((p.n_c + 1.0) / (nt.n_train + nt.k_cls))
               + ln((coalesce(lw.n_cw, 0) + 1.0) / (p.n_c + 7.0))
               + ln((coalesce(lb.n_cb, 0) + 1.0) / (p.n_c + nt.k_b))
                 AS sc
        FROM cells c
        CROSS JOIN prior p
        LEFT JOIN likw lw ON lw.cls = p.cls AND lw.w = c.w
        LEFT JOIN likb lb ON lb.cls = p.cls AND lb.b = c.b
        CROSS JOIN nt),
      pred AS (SELECT actual, w, b, n_rows,
                      min(struct_pack(ns := -sc, c := cls)).c
                        AS predicted
               FROM scored GROUP BY 1, 2, 3, 4)
      SELECT actual, predicted, CAST(sum(n_rows) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2""")),

    Q("q_eval_lift", evalLift, Some("""
      WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
                        doc_id % 3 <> 0 AS gold
                 FROM documents),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                   CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END)
                     AS BIGINT) AS p_all
            FROM b),
      r AS (SELECT gold,
                   CAST(ntile(10) OVER (ORDER BY score DESC, doc_id ASC)
                     AS BIGINT) AS decile
            FROM b),
      g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_d,
                   CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END)
                     AS BIGINT) AS pos_d
            FROM r GROUP BY 1),
      c AS (SELECT *, CAST(sum(pos_d) OVER (ORDER BY decile ASC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
            FROM g)
      SELECT decile, n_d, pos_d,
             CAST((pos_d * n_all * 1000000) // (n_d * p_all) AS BIGINT)
               AS lift_ppm,
             CAST((cum_pos * 1000000) // p_all AS BIGINT)
               AS capture_ppm
      FROM c CROSS JOIN t""")),
    Q("q_eval_rrf", rrfFuse, Some("""
      WITH m AS (SELECT l_suppkey,
                        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * 100 AS BIGINT)
                          * (100 - CAST(CAST(l_discount AS DECIMAL(4,2))
                                        * 100 AS BIGINT))) AS BIGINT)
                          AS rev_units,
                        CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
                                      * 100 AS BIGINT)) AS BIGINT)
                          AS qty_cents
                 FROM lineitem GROUP BY 1),
      r AS (SELECT l_suppkey,
                   CAST(row_number() OVER (ORDER BY rev_units DESC,
                     l_suppkey ASC) AS BIGINT) AS rank_rev,
                   CAST(row_number() OVER (ORDER BY qty_cents DESC,
                     l_suppkey ASC) AS BIGINT) AS rank_qty
            FROM m)
      SELECT l_suppkey, rank_rev, rank_qty,
             CAST(1000000 // (60 + rank_rev)
                  + 1000000 // (60 + rank_qty) AS BIGINT) AS rrf_e6
      FROM r ORDER BY rrf_e6 DESC, l_suppkey ASC LIMIT 20""")),

    Q("q_eval_confusion", confusion, Some("""
      WITH j AS (SELECT length(text) >= 200 AS pred,
                        doc_id % 3 <> 0 AS gold
                 FROM documents),
      c AS (SELECT
              sum(CASE WHEN pred AND gold THEN 1 ELSE 0 END) AS tp,
              sum(CASE WHEN pred AND NOT gold THEN 1 ELSE 0 END) AS fp,
              sum(CASE WHEN NOT pred AND gold THEN 1 ELSE 0 END) AS fn,
              sum(CASE WHEN NOT pred AND NOT gold THEN 1 ELSE 0 END)
                AS tn
            FROM j)
      SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
             CAST(tp AS DOUBLE) / (tp + fp) AS precision,
             CAST(tp AS DOUBLE) / (tp + fn) AS recall,
             CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1
      FROM c""")),

    Q("q_eval_kappa", kappa, Some("""
      WITH v AS (SELECT length(text) >= 150 AS a,
                        len(string_split_regex(lower(text), '\s+')) >= 25
                          AS b
                 FROM documents),
      c AS (SELECT count(*) AS n,
                   sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
                   sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
                   sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
                   sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                     AS n00
            FROM v),
      k AS (SELECT n, n11, n10, n01, n00, n11 + n00 AS agree,
                   (n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00) AS chance
            FROM c)
      SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
             CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
             CAST(n00 AS BIGINT) AS n00, CAST(agree AS BIGINT) AS agree,
             CAST(n * agree - chance AS BIGINT) AS kappa_num,
             CAST(n * n - chance AS BIGINT) AS kappa_den,
             CAST(n * agree - chance AS DOUBLE) / (n * n - chance)
               AS kappa
      FROM k""")),

    Q("q_eval_mrr", mrr, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, event_id,
                        user_id,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS cents
                 FROM events),
      r AS (SELECT event_type, day, event_id, user_id,
                   row_number() OVER (PARTITION BY event_type, day
                     ORDER BY cents DESC, event_id ASC) AS rnk
            FROM e),
      top AS (SELECT * FROM r WHERE rnk <= 10),
      hits AS (SELECT event_type, day, min(rnk) AS first_rel
               FROM top WHERE user_id % 5 = 0 GROUP BY 1, 2),
      q AS (SELECT DISTINCT event_type, day FROM top),
      rr AS (SELECT q.event_type, q.day, h.first_rel,
                    coalesce(1000000 // h.first_rel, 0) AS rr_e6
             FROM q LEFT JOIN hits h
               ON q.event_type = h.event_type AND q.day = h.day)
      SELECT event_type, count(*) AS n_queries,
             CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_with_hit,
             CAST(sum(rr_e6) AS BIGINT) AS sum_rr_e6,
             CAST(sum(rr_e6) AS DOUBLE) / count(*) / 1000000.0 AS mrr
      FROM rr GROUP BY 1""")),

    Q("q_eval_auc", auc, Some("""
      WITH s AS (SELECT lang, n_chars AS score,
                        sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END)
                          AS pos,
                        sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                          AS neg
                 FROM documents GROUP BY 1, 2),
      c AS (SELECT lang, score, pos, neg,
                   coalesce(sum(neg) OVER (PARTITION BY lang
                     ORDER BY score ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS neg_below
            FROM s)
      SELECT lang, CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(neg) AS BIGINT) AS n_neg,
             CAST(sum(pos * (2 * neg_below + neg)) AS BIGINT) AS auc_num,
             CAST(sum(pos * (2 * neg_below + neg)) AS DOUBLE)
               / (2 * sum(pos) * sum(neg)) AS auc
      FROM c GROUP BY 1""")),

    Q("q_eval_ndcg", ndcg, Some("""
      WITH d(r, e6) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
        (4, 430676), (5, 386852), (6, 356207), (7, 333333),
        (8, 315464), (9, 301029), (10, 289064)),
      e AS (SELECT event_type, CAST(ts AS DATE) AS day, event_id,
                   user_id % 3 AS rel,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS cents
            FROM events),
      r AS (SELECT event_type, day, event_id, rel,
                   row_number() OVER (PARTITION BY event_type, day
                     ORDER BY cents DESC, event_id ASC) AS rnk
            FROM e),
      top AS (SELECT event_type, day, event_id, rel, rnk,
                     row_number() OVER (PARTITION BY event_type, day
                       ORDER BY rel DESC, event_id ASC) AS irnk
              FROM r WHERE rnk <= 10)
      SELECT t.event_type,
             CAST(count(DISTINCT t.day) AS BIGINT) AS n_queries,
             CAST(sum(t.rel * dr.e6) AS BIGINT) AS dcg_e6,
             CAST(sum(t.rel * di.e6) AS BIGINT) AS idcg_e6,
             CAST(sum(t.rel * dr.e6) AS DOUBLE) / sum(t.rel * di.e6)
               AS ndcg_micro
      FROM top t JOIN d dr ON t.rnk = dr.r JOIN d di ON t.irnk = di.r
      GROUP BY 1""")),

    Q("q_eval_calibration", calibration, Some("""
      WITH p AS (SELECT n_chars % 100 AS p100,
                        doc_id % 3 <> 0 AS gold
                 FROM documents),
      b AS (SELECT p100 // 10 AS bin, count(*) AS n,
                   sum(CASE WHEN gold THEN 1 ELSE 0 END) AS n_pos,
                   sum(p100) AS sum_p100
            FROM p GROUP BY 1)
      SELECT CAST(bin AS BIGINT) AS bin, n, CAST(n_pos AS BIGINT)
               AS n_pos,
             CAST(sum_p100 AS BIGINT) AS sum_p100,
             CAST(sum_p100 AS DOUBLE) / (100 * n) AS mean_pred,
             CAST(n_pos AS DOUBLE) / n AS obs_rate,
             CAST(100 * n_pos - sum_p100 AS DOUBLE) / (100 * n) AS gap
      FROM b""")),

    Q("q_rbo", rankBiasedOverlap, Some {
      val w = RboWeightsE9.mkString("[", ", ", "]")
      s"""
      WITH m AS (SELECT l_suppkey,
                        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * 100 AS BIGINT)
                          * (100 - CAST(CAST(l_discount AS DECIMAL(4,2))
                                        * 100 AS BIGINT))) AS BIGINT)
                          AS rev_units,
                        CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
                                      * 100 AS BIGINT)) AS BIGINT)
                          AS qty_cents
                 FROM lineitem GROUP BY 1),
      r AS (SELECT greatest(
                     CAST(row_number() OVER (ORDER BY rev_units DESC,
                       l_suppkey ASC) AS BIGINT),
                     CAST(row_number() OVER (ORDER BY qty_cents DESC,
                       l_suppkey ASC) AS BIGINT)) AS mx
            FROM m),
      cnt AS (SELECT mx, CAST(count(*) AS BIGINT) AS c
              FROM r GROUP BY 1),
      grid AS (SELECT CAST(unnest(range(1, ${RboK + 1})) AS BIGINT)
                 AS d),
      xd AS (SELECT grid.d,
                    CAST(coalesce(sum(cnt.c), 0) AS BIGINT) AS x_d
             FROM grid LEFT JOIN cnt ON cnt.mx <= grid.d
             GROUP BY 1),
      t AS (SELECT d, x_d,
                   CAST((x_d * 1000000) // d AS BIGINT) AS a_e6,
                   CAST(($w[d] * x_d) // d AS BIGINT) AS term_e9
            FROM xd)
      SELECT d, x_d, a_e6,
             CAST(sum(term_e9) OVER (ORDER BY d) AS BIGINT) AS rbo_e9
      FROM t ORDER BY d"""
    }),
    Q("q_isotonic_calibration", isotonicCalibration, Some("""
      WITH p AS (SELECT n_chars % 100 AS score,
                        doc_id % 3 <> 0 AS gold
                 FROM documents),
      b AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT)
                     AS pos
            FROM p GROUP BY 1),
      pref AS (SELECT score, n, pos,
                      CAST(row_number() OVER (ORDER BY score) AS BIGINT)
                        AS rn,
                      CAST(sum(n) OVER (ORDER BY score) - n AS BIGINT)
                        AS cn_prev,
                      CAST(sum(pos) OVER (ORDER BY score) - pos
                        AS BIGINT) AS cpos_prev
               FROM b),
      pairs AS (SELECT x.rn AS j, y.rn AS k,
                       CAST(((y.cpos_prev + y.pos - x.cpos_prev)
                              * 1000000)
                            // (y.cn_prev + y.n - x.cn_prev) AS BIGINT)
                         AS rate_e6
                FROM pref x JOIN pref y ON x.rn <= y.rn),
      mji AS (SELECT i.rn AS i, pairs.j, min(pairs.rate_e6) AS mj
              FROM pairs JOIN pref i
                ON pairs.j <= i.rn AND i.rn <= pairs.k
              GROUP BY 1, 2),
      iso AS (SELECT i, CAST(max(mj) AS BIGINT) AS iso_e6
              FROM mji GROUP BY 1)
      SELECT pref.score, pref.n, pref.pos,
             CAST((pref.pos * 1000000) // pref.n AS BIGINT) AS rate_e6,
             iso.iso_e6
      FROM pref JOIN iso ON pref.rn = iso.i
      ORDER BY pref.score""")),
    Q("q_eval_pr_at_k", prAtK, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, event_id,
                        CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END
                          AS rel,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events),
      r AS (SELECT event_type, day, rel,
                   row_number() OVER (PARTITION BY event_type, day
                     ORDER BY cents DESC, event_id ASC) AS rnk
            FROM e),
      q AS (SELECT event_type, day,
                   sum(CASE WHEN rnk <= 10 THEN rel ELSE 0 END) AS tp,
                   sum(rel) AS day_rel
            FROM r GROUP BY 1, 2)
      SELECT event_type, count(*) AS n_queries,
             CAST(sum(tp) AS BIGINT) AS tp_at_10,
             CAST(sum(day_rel) AS BIGINT) AS n_rel,
             CAST(sum(tp) AS DOUBLE) / (count(*) * 10)
               AS precision_at_10,
             CAST(sum(tp) AS DOUBLE) / sum(day_rel) AS recall_at_10
      FROM q GROUP BY 1""")),

    Q("q_brier_decomposition", brierDecomposition, Some("""
      WITH p AS (SELECT lang,
                        least(n_chars * 1000 // 400, 1000) AS p_e3,
                        CASE WHEN doc_id % 3 <> 0 THEN 1000 ELSE 0 END
                          AS y_e3
                 FROM documents),
      b AS (SELECT lang, p_e3 // 100 AS bin,
                   CAST(count(*) AS HUGEINT) AS nb,
                   CAST(sum(p_e3) AS HUGEINT) AS sp,
                   CAST(sum(CASE WHEN y_e3 = 1000 THEN 1 ELSE 0 END)
                     AS HUGEINT) AS pos,
                   CAST(sum((p_e3 - y_e3) * (p_e3 - y_e3)) AS HUGEINT)
                     AS sq
            FROM p GROUP BY 1, 2),
      t AS (SELECT lang, CAST(sum(nb) AS HUGEINT) AS n,
                   CAST(sum(pos) AS HUGEINT) AS pp,
                   CAST(sum(sq) AS HUGEINT) AS sum_sq
            FROM b GROUP BY 1),
      c AS (SELECT b.lang, t.n, t.pp, t.sum_sq,
                   (sp - 1000 * pos) * (sp - 1000 * pos) // nb AS rel_b,
                   1000000 * (pos * n - pp * nb) * (pos * n - pp * nb)
                     // (nb * n * n) AS res_b
            FROM b JOIN t USING (lang)),
      g AS (SELECT lang, max(n) AS n, max(pp) AS n_pos,
                   max(sum_sq) AS sum_sq,
                   sum(rel_b) AS rel_sum, sum(res_b) AS res_sum
            FROM c GROUP BY 1)
      SELECT lang, CAST(n AS BIGINT) AS n,
             CAST(n_pos AS BIGINT) AS n_pos,
             CAST(sum_sq // n AS BIGINT) AS brier_e6,
             CAST(rel_sum // n AS BIGINT) AS rel_e6,
             CAST(res_sum // n AS BIGINT) AS res_e6,
             CAST(1000000 * n_pos * (n - n_pos) // (n * n) AS BIGINT)
               AS unc_e6,
             CAST(sum_sq // n
               - (rel_sum // n - res_sum // n
                  + 1000000 * n_pos * (n - n_pos) // (n * n))
               AS BIGINT) AS decomp_gap_e6
      FROM g""")),

    Q("q_brier_score", brierScore, Some("""
      WITH p AS (SELECT lang,
                        least(n_chars * 1000 // 400, 1000) AS p_e3,
                        CASE WHEN doc_id % 3 <> 0 THEN 1000 ELSE 0 END
                          AS y_e3
                 FROM documents)
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum((p_e3 - y_e3) * (p_e3 - y_e3)) AS BIGINT)
               AS sum_sq_e6,
             CAST(sum(CASE WHEN y_e3 = 1000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pos,
             CAST(sum((p_e3 - y_e3) * (p_e3 - y_e3)) // count(*)
               AS BIGINT) AS brier_e6,
             CAST(sum((p_e3 - y_e3) * (p_e3 - y_e3)) AS DOUBLE)
               / count(*) / 1000000.0 AS brier
      FROM p GROUP BY 1""")),

    Q("q_matthews_corr", matthewsCorr, Some("""
      WITH j AS (SELECT len(string_split_regex(text, '\s+')) >= 20
                          AS pred,
                        doc_id % 3 <> 0 AS gold
                 FROM documents),
      c AS (SELECT
              CAST(sum(CASE WHEN pred AND gold THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
              CAST(sum(CASE WHEN pred AND NOT gold THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
              CAST(sum(CASE WHEN NOT pred AND gold THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
              CAST(sum(CASE WHEN NOT pred AND NOT gold THEN 1 ELSE 0
                END) AS BIGINT) AS tn
            FROM j)
      SELECT tp, fp, fn, tn,
             CAST(floor((CAST(tp AS DOUBLE) * tn
                         - CAST(fp AS DOUBLE) * fn) * 1000000.0
               / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                      * (tn + fp) * (tn + fn))) AS BIGINT) AS mcc_e6
      FROM c""")),

    Q("q_fbeta_per_class", fbetaPerClass, Some("""
      WITH cells AS (SELECT n_chars % 3 AS pred_c, doc_id % 3 AS gold_c,
                            count(*) AS cnt
                     FROM documents GROUP BY 1, 2),
      pt AS (SELECT pred_c AS cls, sum(cnt) AS n_pred
             FROM cells GROUP BY 1),
      gt AS (SELECT gold_c AS cls, sum(cnt) AS n_gold
             FROM cells GROUP BY 1),
      dg AS (SELECT pred_c AS cls, cnt AS tp
             FROM cells WHERE pred_c = gold_c),
      c AS (SELECT pt.cls AS cls, tp, n_pred - tp AS fp,
                   n_gold - tp AS fn
            FROM pt JOIN gt ON pt.cls = gt.cls
                    JOIN dg ON pt.cls = dg.cls)
      SELECT CAST(cls AS BIGINT) AS cls, CAST(tp AS BIGINT) AS tp,
             CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
             CAST(tp * 5 * 1000000 // (5 * tp + fn + 4 * fp)
               AS BIGINT) AS f05_e6,
             CAST(tp * 2 * 1000000 // (2 * tp + fp + fn)
               AS BIGINT) AS f1_e6,
             CAST(tp * 5 * 1000000 // (5 * tp + 4 * fn + fp)
               AS BIGINT) AS f2_e6
      FROM c""")),

    Q("q_stump_boost", stumpBoost, Some("""
      WITH rows0 AS (SELECT event_type,
                            CAST(hour(ts) AS BIGINT) AS f1,
                            CAST(isodow(CAST(ts AS DATE)) % 7 + 1
                              AS BIGINT) AS f2,
                            CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS y
                     FROM events WHERE value IS NOT NULL),
      b1 AS (SELECT event_type, f1 AS bin, count(*) AS nb,
                    sum(y) AS sb
             FROM rows0 GROUP BY 1, 2),
      c1 AS (SELECT *,
                    sum(nb) OVER (PARTITION BY event_type
                      ORDER BY bin) AS n_l,
                    sum(sb) OVER (PARTITION BY event_type
                      ORDER BY bin) AS s_l,
                    sum(nb) OVER (PARTITION BY event_type) AS n,
                    sum(sb) OVER (PARTITION BY event_type) AS s
             FROM b1),
      d1 AS (SELECT *,
                    (CAST(s_l AS DOUBLE) * n - CAST(s AS DOUBLE) * n_l)
                    * (CAST(s_l AS DOUBLE) * n - CAST(s AS DOUBLE) * n_l)
                    / (CAST(n_l AS DOUBLE) * (n - n_l)) AS score
             FROM c1 WHERE n_l < n),
      s1 AS (SELECT event_type, bin AS split,
                    CAST(n_l AS BIGINT) AS n_l,
                    CAST(n - n_l AS BIGINT) AS n_r,
                    CAST(s_l // n_l AS BIGINT) AS mean_l,
                    CAST((s - s_l) // (n - n_l) AS BIGINT) AS mean_r,
                    CAST(floor(score) AS BIGINT) AS score_e0
             FROM (SELECT *, row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY score DESC, bin ASC) AS rn
                   FROM d1)
             WHERE rn = 1),
      resid AS (SELECT r.event_type AS event_type, r.f2,
                       r.y - CASE WHEN r.f1 <= s1.split THEN s1.mean_l
                                  ELSE s1.mean_r END AS r
                FROM rows0 r JOIN s1 ON r.event_type = s1.event_type),
      b2 AS (SELECT event_type, f2 AS bin, count(*) AS nb,
                    sum(r) AS sb
             FROM resid GROUP BY 1, 2),
      c2 AS (SELECT *,
                    sum(nb) OVER (PARTITION BY event_type
                      ORDER BY bin) AS n_l,
                    sum(sb) OVER (PARTITION BY event_type
                      ORDER BY bin) AS s_l,
                    sum(nb) OVER (PARTITION BY event_type) AS n,
                    sum(sb) OVER (PARTITION BY event_type) AS s
             FROM b2),
      d2 AS (SELECT *,
                    (CAST(s_l AS DOUBLE) * n - CAST(s AS DOUBLE) * n_l)
                    * (CAST(s_l AS DOUBLE) * n - CAST(s AS DOUBLE) * n_l)
                    / (CAST(n_l AS DOUBLE) * (n - n_l)) AS score
             FROM c2 WHERE n_l < n),
      s2 AS (SELECT event_type, bin AS split,
                    CAST(n_l AS BIGINT) AS n_l,
                    CAST(n - n_l AS BIGINT) AS n_r,
                    CAST(s_l // n_l AS BIGINT) AS mean_l,
                    CAST((s - s_l) // (n - n_l) AS BIGINT) AS mean_r,
                    CAST(floor(score) AS BIGINT) AS score_e0
             FROM (SELECT *, row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY score DESC, bin ASC) AS rn
                   FROM d2)
             WHERE rn = 1)
      SELECT event_type, split, n_l, n_r, mean_l, mean_r, score_e0,
             CAST(1 AS BIGINT) AS round, 'hour' AS feature
      FROM s1
      UNION ALL
      SELECT event_type, split, n_l, n_r, mean_l, mean_r, score_e0,
             CAST(2 AS BIGINT) AS round, 'dow' AS feature
      FROM s2""")),

    Q("q_position_bias", positionBias, Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, event_id,
                        user_id % 3 = 0 AS clicked,
                        CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM events WHERE value IS NOT NULL),
      imps AS (SELECT * FROM (
                 SELECT event_type, day, event_id, clicked,
                        CAST(row_number() OVER (
                          PARTITION BY event_type, day
                          ORDER BY cents DESC, event_id ASC)
                          AS BIGINT) AS pos
                 FROM e) r WHERE pos <= 10),
      prior AS (SELECT pos,
                       CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END)
                         * 1000000 // count(*) AS BIGINT) AS prior_ppm
                FROM imps GROUP BY 1)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_imps,
             CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END) AS BIGINT)
               AS clicks,
             CAST(sum(prior_ppm) AS BIGINT) AS expected_ppm,
             CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END)
               * 1000000000 // sum(prior_ppm) AS BIGINT) AS coec_e3
      FROM imps JOIN prior USING (pos)
      GROUP BY 1"""))
  )
}
