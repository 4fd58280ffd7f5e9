package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Model checks for the hypothesis-testing operators
  * (InferenceQueries) and the graph-structure statistics (GraphOps
  * round-9 additions): each statistic is recomputed brute-force in
  * plain Scala from the collected base rows and compared
  * value-for-value against the catalog query — collecting is fine
  * HERE (tests at sf0.001), never in src/main. */
class InferenceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  /** (event_type, cents, is_ref) exactly as the queries derive them —
    * the cast lives in Spark so the spec replays the STATISTIC, not
    * the decimal-grid snap (already pinned by the oracle compare). */
  private lazy val centsRows: Seq[(String, Long, Boolean)] =
    Tables.events(spark, sf)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Boolean)].collect().toSeq

  /** (event_type, day-string, day-total cents). */
  private lazy val dailyRows: Seq[(String, String, Long)] =
    Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("cents"))
      .as[(String, String, Long)].collect().toSeq

  test("floor-then-sum family is bit-identical under a different " +
      "shuffle partitioning (order-independence holds at the wire)") {
    // the central determinism claim: per-group double terms are
    // floored to BIGINT BEFORE summing, so re-partitioning (which
    // changes double-accumulation order in a naive formulation) must
    // not move a single cell
    val names = Seq("q_anova_f", "q_brown_forsythe", "q_kruskal_wallis",
      "q_cramers_v", "q_mood_median", "q_dp_histogram", "q_gini_revenue",
      "q_mcnemar", "q_cochran_q", "q_friedman", "q_cohens_d",
      "q_logrank_test", "q_kaplan_meier")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def snap(): Map[String, Set[String]] = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect()
        .map(_.toString).toSet
    }.toMap
    val base = snap()
    try {
      spark.conf.set(key, "7")
      val odd = snap()
      names.foreach(n => assert(odd(n) === base(n), s"$n diverged"))
    } finally spark.conf.set(key, prev)
  }

  test("q_welch_ttest matches a brute-force recompute") {
    val got = SparkEntry.queries("q_welch_ttest")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val byType = centsRows.groupBy(_._1)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (t, rows) =>
      val ref = rows.filter(_._3).map(_._2)
      val cur = rows.filterNot(_._3).map(_._2)
      val (n1, n2) = (ref.size.toLong, cur.size.toLong)
      val (s1, s2) = (ref.sum, cur.sum)
      val (q1, q2) = (ref.map(c => c * c).sum, cur.map(c => c * c).sum)
      val v1 = (n1.toDouble * q1 - s1.toDouble * s1) /
        (n1.toDouble * (n1 - 1))
      val v2 = (n2.toDouble * q2 - s2.toDouble * s2) /
        (n2.toDouble * (n2 - 1))
      val se2 = v1 / n1 + v2 / n2
      val tStat = (s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(se2)
      val df = se2 * se2 /
        ((v1 / n1) * (v1 / n1) / (n1 - 1) +
          (v2 / n2) * (v2 / n2) / (n2 - 1))
      val r = got(t)
      assert(r.getAs[Long]("n_ref") === n1)
      assert(r.getAs[Long]("n_cur") === n2)
      assert(r.getAs[Long]("mean_ref_cents") === s1 / n1)
      assert(r.getAs[Long]("mean_cur_cents") === s2 / n2)
      assert(r.getAs[Long]("t_e6") === math.floor(tStat * 1e6).toLong)
      assert(r.getAs[Long]("df_e3") === math.floor(df * 1e3).toLong)
      // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
      assert(r.getAs[Long]("df_e3") >= (math.min(n1, n2) - 1) * 1000 - 1)
      assert(r.getAs[Long]("df_e3") <= (n1 + n2 - 2) * 1000)
    }
  }

  test("q_spearman_trend matches exact doubled-midrank recompute") {
    val got = SparkEntry.queries("q_spearman_trend")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    dailyRows.groupBy(_._1).foreach { case (t, rows0) =>
      val rows = rows0.sortBy(_._2)
      val n = rows.size.toLong
      val vals = rows.map(_._3)
      val rx2 = (1 to rows.size).map(_.toLong * 2)
      val ry2 = vals.map { v =>
        val below = vals.count(_ < v).toLong
        val g = vals.count(_ == v).toLong
        2 * (below + 1) + g - 1
      }
      val (sx, sy) = (rx2.sum, ry2.sum)
      val sxy = rx2.zip(ry2).map { case (a, b) => a * b }.sum
      val sxx = rx2.map(a => a * a).sum
      val syy = ry2.map(a => a * a).sum
      val num = (n * sxy - sx * sy).toDouble
      val den = math.sqrt((n * sxx - sx * sx).toDouble *
        (n * syy - sy * sy).toDouble)
      val r = got(t)
      assert(r.getAs[Long]("n_days") === n)
      assert(r.getAs[Long]("rho_e6") ===
        math.floor(num / den * 1e6).toLong)
      assert(math.abs(r.getAs[Long]("rho_e6")) <= 1000000L)
    }
  }

  test("q_kendall_tau matches an exact pair-count recompute") {
    val got = SparkEntry.queries("q_kendall_tau")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    dailyRows.groupBy(_._1).foreach { case (t, rows0) =>
      val vals = rows0.sortBy(_._2).map(_._3)
      var (conc, disc, tie) = (0L, 0L, 0L)
      for (i <- vals.indices; j <- (i + 1) until vals.size) {
        if (vals(j) > vals(i)) conc += 1
        else if (vals(j) < vals(i)) disc += 1
        else tie += 1
      }
      val nPairs = conc + disc + tie
      val tau = (conc - disc).toDouble /
        math.sqrt((nPairs - tie).toDouble * nPairs)
      val r = got(t)
      assert(r.getAs[Long]("n_pairs") === nPairs)
      assert(r.getAs[Long]("n_conc") === conc)
      assert(r.getAs[Long]("n_disc") === disc)
      assert(r.getAs[Long]("n_tie_y") === tie)
      assert(r.getAs[Long]("tau_e6") === math.floor(tau * 1e6).toLong)
    }
  }

  test("q_kruskal_wallis matches exact global-midrank recompute") {
    val r = SparkEntry.queries("q_kruskal_wallis")(spark, sf).head()
    val all = centsRows.map(x => (x._1, x._2))
    val grid = all.map(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val sorted = grid.keys.toSeq.sorted
    val prev = sorted.scanLeft(0L)((acc, c) => acc + grid(c))
      .zip(sorted).map { case (p, c) => c -> p }.toMap
    val byType = all.groupBy(_._1)
    val r2 = byType.view.mapValues(_.map { case (_, c) =>
      2 * prev(c) + grid(c) + 1 }.sum).toMap
    val nI = byType.view.mapValues(_.size.toLong).toMap
    val hNum = byType.keys.map(t =>
      math.floor(r2(t).toDouble * r2(t) / (4.0 * nI(t))).toLong).sum
    val nTotal = all.size.toLong
    val tieNum = grid.values.map(g => g * g * g - g).sum
    val h = 12.0 * hNum / (nTotal.toDouble * (nTotal + 1)) -
      3.0 * (nTotal + 1)
    assert(r.getAs[Long]("n_total") === nTotal)
    assert(r.getAs[Long]("k_groups") === byType.size.toLong)
    assert(r.getAs[Long]("tie_num") === tieNum)
    assert(r.getAs[Long]("h_num") === hNum)
    assert(r.getAs[Long]("h_e6") === math.floor(h * 1e6).toLong)
    val hCorr = h / (1.0 - tieNum.toDouble /
      (nTotal.toDouble * nTotal * nTotal - nTotal))
    assert(r.getAs[Long]("h_corr_e6") === math.floor(hCorr * 1e6).toLong)
    // tie-corrected H is larger in magnitude whenever ties exist
    if (tieNum > 0) assert(r.getAs[Long]("h_corr_e6") >=
      r.getAs[Long]("h_e6"))
  }

  /** Shared ANOVA tail: floor-then-sum of per-group SSB/SSW terms. */
  private def anovaTail(groups: Map[String, Seq[Long]])
      : (Long, Long, Long, Long, Option[Long]) = {
    val nTotal = groups.values.map(_.size.toLong).sum
    val sTotal = groups.values.map(_.sum).sum
    val k = groups.size.toLong
    val terms = groups.values.map { xs =>
      val (nI, sI) = (xs.size.toLong, xs.sum)
      val qI = xs.map(x => x * x).sum
      val diff = sI.toDouble * nTotal - sTotal.toDouble * nI
      (math.floor(diff * diff /
        (nI.toDouble * nTotal * nTotal)).toLong,
        math.floor(qI.toDouble - sI.toDouble * sI / nI).toLong)
    }
    val (ssb, ssw) = (terms.map(_._1).sum, terms.map(_._2).sum)
    val f = if (ssw > 0) Some(math.floor((ssb.toDouble / (k - 1)) /
      (ssw.toDouble / (nTotal - k)) * 1e6).toLong) else None
    (nTotal, k, ssb, ssw, f)
  }

  test("q_anova_f matches the floor-then-sum brute recompute") {
    val r = SparkEntry.queries("q_anova_f")(spark, sf).head()
    val groups = centsRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (n, k, ssb, ssw, f) = anovaTail(groups)
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("k_groups") === k)
    assert(r.getAs[Long]("ssb_sq") === ssb)
    assert(r.getAs[Long]("ssw_sq") === ssw)
    assert(Option(r.getAs[Long]("f_e6")) === f)
    assert(r.getAs[Long]("ssb_sq") >= 0 && r.getAs[Long]("ssw_sq") >= 0)
  }

  test("q_brown_forsythe matches the median-deviation brute recompute") {
    val r = SparkEntry.queries("q_brown_forsythe")(spark, sf).head()
    val groups = centsRows.groupBy(_._1).view.mapValues { rows =>
      val xs = rows.map(_._2).sorted
      // pos = 0.5·(n−1) linear interpolation, doubled to stay integral
      val pos = 0.5 * (xs.size - 1)
      val (lo, hi) = (xs(pos.toInt), xs(math.ceil(pos).toInt))
      val med2 = (lo + hi) // 2·median: exact for half-integral medians
      rows.map(t => math.abs(2 * t._2 - med2))
    }.toMap
    val (n, k, ssb, ssw, f) = anovaTail(groups)
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("k_groups") === k)
    assert(r.getAs[Long]("ssb_sq") === ssb)
    assert(r.getAs[Long]("ssw_sq") === ssw)
    assert(Option(r.getAs[Long]("f_e6")) === f)
  }

  test("q_lorenz_deciles: convex increasing curve, partitions users " +
      "and revenue, consistent with the Gini value") {
    val rows = SparkEntry.queries("q_lorenz_deciles")(spark, sf)
      .collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (1L to 10L))
    val perUser = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"user_id").agg(sum($"cents").as("cents"))
      .as[(Long, Long)].collect().toSeq
    assert(rows.map(_.getAs[Long]("n_users_d")).sum === perUser.size)
    assert(rows.map(_.getAs[Long]("cents_d")).sum ===
      perUser.map(_._2).sum)
    // ascending deal: PER-USER means are non-decreasing (raw decile
    // shares can dip when n mod 10 deals an early decile one extra
    // cheap user); exact cross-multiplied compare, no division
    val means = rows.map(r =>
      (r.getAs[Long]("cents_d"), r.getAs[Long]("n_users_d")))
    assert(means.zip(means.tail).forall { case ((c1, n1), (c2, n2)) =>
      c1 * n2 <= c2 * n1 })
    val cums = rows.map(_.getAs[Long]("cum_share_ppm"))
    assert(cums.zip(cums.tail).forall(p => p._1 < p._2))
    assert(cums.last >= 999990L && cums.last <= 1000000L)
    // grouping theorem: the decile-trapezoid Gini is a LOWER bound on
    // the exact per-user Gini (grouping erases within-decile
    // dispersion; the grouped Lorenz curve dominates the true one)
    val lorenz = 0.0 +: cums.map(_ / 1e6)
    val area = lorenz.sliding(2).map(w => (w(0) + w(1)) / 2 * 0.1).sum
    val giniFromLorenz = 1.0 - 2.0 * area
    val gini = SparkEntry.queries("q_gini_revenue")(spark, sf)
      .head().getAs[Long]("gini_e6") / 1e6
    assert(giniFromLorenz <= gini + 1e-9 && giniFromLorenz >= 0.0 &&
      gini < 1.0, s"trapezoid $giniFromLorenz vs exact $gini")
  }

  test("q_sprt matches an exact sequential replay; decision is the " +
      "FIRST boundary crossing") {
    val got = SparkEntry.queries("q_sprt")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val b = ops.InferenceQueries.SprtBoundary
    Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(String, String, Long)].collect().toSeq
      .groupBy(_._1).foreach { case (t, rows) =>
        val daily = rows.groupBy(_._2).view.mapValues { dr =>
          2L * dr.count(_._3 >= 10000L) - dr.size
        }.toSeq.sortBy(_._1)
        var s = 0L
        var dHi: Option[String] = None
        var dLo: Option[String] = None
        daily.foreach { case (day, inc) =>
          s += inc
          if (s >= b && dHi.isEmpty) dHi = Some(day)
          if (s <= -b && dLo.isEmpty) dLo = Some(day)
        }
        val decision =
          if (dHi.isDefined && (dLo.isEmpty || dHi.get <= dLo.get))
            "accept_h1"
          else if (dLo.isDefined) "accept_h0" else "continue"
        val r = got(t)
        assert(r.getAs[Long]("n_days") === daily.size.toLong)
        assert(r.getAs[Long]("s_final") === s)
        assert(r.getAs[String]("decision") === decision, s"type $t")
        val gotDay = Option(r.getAs[java.sql.Date]("decision_day"))
          .map(_.toString)
        assert(gotDay === (dHi.toSeq ++ dLo.toSeq).sorted.headOption)
        assert(r.getAs[Long]("llr_e6") ===
          math.floor(s.toDouble * math.log(11.0 / 9.0) * 1e6).toLong)
      }
  }

  test("q_power_welch matches a brute recompute; bigger detectable " +
      "effect needs fewer samples") {
    val got = SparkEntry.queries("q_power_welch")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val zSum = 1.96 + 0.8416
    centsRows.groupBy(_._1).foreach { case (t, rows) =>
      val ref = rows.filter(_._3).map(_._2)
      val cur = rows.filterNot(_._3).map(_._2)
      val (n1, n2) = (ref.size.toLong, cur.size.toLong)
      val (s1, s2) = (ref.sum, cur.sum)
      val mean = (s1 + s2) / (n1 + n2)
      val delta = mean * 2 / 100
      val v1 = (n1.toDouble * ref.map(c => c * c).sum -
        s1.toDouble * s1) / (n1.toDouble * (n1 - 1))
      val v2 = (n2.toDouble * cur.map(c => c * c).sum -
        s2.toDouble * s2) / (n2.toDouble * (n2 - 1))
      val need = math.ceil((v1 + v2) * (zSum * zSum) /
        (delta.toDouble * delta)).toLong
      val r = got(t)
      assert(r.getAs[Long]("mean_cents") === mean)
      assert(r.getAs[Long]("delta_cents") === delta)
      assert(r.getAs[Long]("n_needed") === need)
      assert(r.getAs[Long]("x_current_e3") ===
        math.floor(need.toDouble / ((n1 + n2).toDouble / 2) * 1e3)
          .toLong)
      assert(need > 0)
    }
  }

  test("q_mood_median matches the exact dichotomy recompute") {
    val r = SparkEntry.queries("q_mood_median")(spark, sf).head()
    val all = centsRows.map(t => (t._1, t._2))
    val xs = all.map(_._2).sorted
    val pos = 0.5 * (xs.size - 1)
    val med2 = xs(pos.toInt) + xs(math.ceil(pos).toInt)
    val byType = all.groupBy(_._1)
    val ab = byType.view.mapValues { rows =>
      val a = rows.count(t => 2 * t._2 > med2).toLong
      (a, rows.size.toLong - a)
    }.toMap
    val ta = ab.values.map(_._1).sum
    val tb = ab.values.map(_._2).sum
    val n = ta + tb
    val chi2 = ab.values.map { case (a, b) =>
      val termA = {
        val d = (a * n - (a + b) * ta).toDouble
        math.floor(d * (a * n - (a + b) * ta) /
          (n.toDouble * (a + b) * ta) * 1e6).toLong
      }
      val termB = {
        val d = (b * n - (a + b) * tb).toDouble
        math.floor(d * (b * n - (a + b) * tb) /
          (n.toDouble * (a + b) * tb) * 1e6).toLong
      }
      termA + termB
    }.sum
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("k_groups") === byType.size.toLong)
    assert(r.getAs[Long]("n_above") === ta)
    assert(r.getAs[Long]("chi2_e6") === chi2)
    assert(r.getAs[Long]("chi2_e6") >= 0L)
  }

  test("q_wilson_ci matches a brute recompute; interval brackets p " +
      "and stays inside [0,1]") {
    val rows = SparkEntry.queries("q_wilson_ci")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = centsRows.groupBy(_._1)
    val z = ops.InferenceQueries.WilsonZ
    rows.foreach { r =>
      val xs = byType(r.getAs[String]("event_type")).map(_._2)
      val n = xs.size.toLong
      val k = xs.count(_ >= 10000L).toLong
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("k") === k)
      val pHat = k.toDouble / n
      val center = (pHat + z * z / (2.0 * n)) / (1.0 + z * z / n)
      val half = z * math.sqrt(pHat * (1.0 - pHat) / n +
        z * z / (4.0 * n * n)) / (1.0 + z * z / n)
      assert(r.getAs[Long]("p_e6") === math.floor(pHat * 1e6).toLong)
      assert(r.getAs[Long]("lo_e6") ===
        math.floor((center - half) * 1e6).toLong)
      assert(r.getAs[Long]("hi_e6") ===
        math.floor((center + half) * 1e6).toLong)
      // score interval properties
      assert(r.getAs[Long]("lo_e6") >= -1L)  // floor can dip 1 ulp unit
      assert(r.getAs[Long]("hi_e6") <= 1000000L)
      assert(r.getAs[Long]("lo_e6") <= r.getAs[Long]("p_e6"))
      assert(r.getAs[Long]("p_e6") <= r.getAs[Long]("hi_e6"))
    }
  }

  test("q_cramers_v matches exact contingency recompute, V in [0,1]") {
    val r = SparkEntry.queries("q_cramers_v")(spark, sf).head()
    val cells = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_orderstatus")
      .as[(String, String)].collect().toSeq
    val n = cells.size.toLong
    val byCell = cells.groupBy(identity).view.mapValues(_.size.toLong)
    val rt = cells.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val chi2e6 = byCell.map { case ((p, st), o) =>
      val diff = (o * n - rt(p) * ct(st)).toDouble
      math.floor(diff * (o * n - rt(p) * ct(st)) /
        (n.toDouble * rt(p) * ct(st)) * 1e6).toLong
    }.sum
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("n_rows") === rt.size.toLong)
    assert(r.getAs[Long]("n_cols") === ct.size.toLong)
    assert(r.getAs[Long]("chi2_e6") === chi2e6)
    val k = math.min(rt.size, ct.size).toLong
    val v = math.sqrt((chi2e6 / 1e6) / (n.toDouble * (k - 1)))
    assert(r.getAs[Long]("v_e6") === math.floor(v * 1e6).toLong)
    assert(r.getAs[Long]("v_e6") >= 0L &&
      r.getAs[Long]("v_e6") <= 1000000L)
  }

  test("q_gini_revenue matches the exact rank-formula recompute and " +
      "avoids the single-partition rank window") {
    val r = SparkEntry.queries("q_gini_revenue")(spark, sf)
    val row = r.head()
    val perUser = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"user_id").agg(sum($"cents").as("cents"))
      .as[(Long, Long)].collect().toSeq
    val sorted = perUser.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.size.toLong
    val total = sorted.sum
    val rankW = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val num = 2 * rankW - (n + 1) * total
    assert(row.getAs[Long]("n_users") === n)
    assert(row.getAs[Long]("total_cents") === total)
    assert(row.getAs[Long]("gini_num") === num)
    assert(row.getAs[Long]("gini_den") === n * total)
    assert(row.getAs[Long]("gini_e6") ===
      math.floor(num.toDouble / (n * total) * 1e6).toLong)
    // G ∈ [0, 1) by construction on the ascending sort
    assert(row.getAs[Long]("gini_e6") >= 0L &&
      row.getAs[Long]("gini_e6") < 1000000L)
    // the global rank must NOT come from a single-partition window
    val plan = r.queryExecution.executedPlan
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    // GlobalRank's offsets path legitimately runs ONE unpartitioned
    // cumsum — over the #buckets-row COUNT table (an aggregate sits
    // in its subtree). What must never appear is an unpartitioned
    // window directly over the user-cardinality data path.
    val unpartitioned = inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    unpartitioned.foreach { w =>
      val overCounts = w.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate
          .HashAggregateExec if a.groupingExpressions.nonEmpty => a
      }.nonEmpty
      assert(overCounts,
        s"unpartitioned window over the raw data path: $w")
    }
    // and the per-bucket rank window IS partitioned
    assert(inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty => w
    }.nonEmpty, "expected the bucket-partitioned rank window")
  }

  test("q_runs_test matches an exact run-count recompute") {
    val got = SparkEntry.queries("q_runs_test")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    dailyRows.groupBy(_._1).foreach { case (t, rows0) =>
      val vals = rows0.sortBy(_._2).map(_._3)
      val signs = vals.zip(vals.tail).collect {
        case (a, b) if b > a => 1L
        case (a, b) if b < a => -1L
      }
      val nUp = signs.count(_ == 1L).toLong
      val nDown = signs.count(_ == -1L).toLong
      val runs = 1L + signs.zip(signs.tail).count(p => p._1 != p._2)
      val r = got(t)
      assert(r.getAs[Long]("n_up") === nUp)
      assert(r.getAs[Long]("n_down") === nDown)
      assert(r.getAs[Long]("n_runs") === runs)
      if (nUp > 0 && nDown > 0) {
        val nn = (nUp + nDown).toDouble
        val m = 2.0 * nUp * nDown / (nUp + nDown) + 1.0
        val v = 2.0 * nUp * nDown * (2.0 * nUp * nDown - nUp - nDown) /
          (nn * (nUp + nDown) * (nUp + nDown - 1))
        if (v > 0)
          assert(r.getAs[Long]("z_e6") ===
            math.floor((runs - m) / math.sqrt(v) * 1e6).toLong)
      }
    }
  }

  test("q_degree_assortativity matches exact edge-moment recompute") {
    val r = SparkEntry.queries("q_degree_assortativity")(spark, sf).head()
    val li = Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val ds = li.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val dp = li.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = li.size.toLong
    val xs = li.map(e => ds(e._1)); val ys = li.map(e => dp(e._2))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = li.map(e => ds(e._1) * dp(e._2)).sum
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    assert(r.getAs[Long]("n_edges") === n)
    assert(r.getAs[Long]("sx") === sx)
    assert(r.getAs[Long]("sy") === sy)
    val num = n.toDouble * sxy - sx.toDouble * sy
    val den = math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
      (n.toDouble * syy - sy.toDouble * sy))
    assert(r.getAs[Long]("assort_e6") ===
      math.floor(num / den * 1e6).toLong)
    assert(math.abs(r.getAs[Long]("assort_e6")) <= 1000000L)
  }

  test("q_graph_jaccard matches exact capped-graph recompute") {
    val got = SparkEntry.queries("q_graph_jaccard")(spark, sf).collect()
      .map(r => (r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"),
        r.getAs[Long]("shared"), r.getAs[Long]("deg_a"),
        r.getAs[Long]("deg_b"), r.getAs[Long]("jac_ppm"))).toSeq
    val li = Tables.lineitem(spark, sf)
      .select($"l_suppkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val pd = li.groupBy(_._2).view.mapValues(_.size).toMap
    val capped = li.filter(e => pd(e._2) <= scale.GraphOps.JaccardDfCap)
    val parts = capped.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val sups = parts.keys.toSeq.sorted
    val allPairs = for {
      i <- sups.indices; j <- (i + 1) until sups.size
      a = sups(i); b = sups(j)
      shared = (parts(a) & parts(b)).size.toLong if shared > 0
    } yield {
      val (da, db) = (parts(a).size.toLong, parts(b).size.toLong)
      (a, b, shared, da, db, shared * 1000000L / (da + db - shared))
    }
    val want = allPairs.sortBy(t => (-t._6, t._1, t._2)).take(20)
    assert(got === want)
    // every emitted pair genuinely shares a part and jac ≤ 1e6
    got.foreach(t => assert(t._3 >= 1 && t._6 <= 1000000L))
  }

  test("q_mcnemar: 2x2 concordance cells and the corrected statistic " +
      "replay from a brute per-user pass; cells partition the users") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", dayofmonth($"ts").as("dom"))
      .as[(Long, String, Int)].collect()
    val cells = ev.groupBy(_._1).values.toSeq.map { rs =>
      (rs.exists(r => r._2 == "purchase" && r._3 <= 15),
        rs.exists(r => r._2 == "purchase" && r._3 > 15))
    }
    val row = SparkEntry.queries("q_mcnemar")(spark, sf).collect().head
    val n01 = cells.count(c => !c._1 && c._2).toLong
    val n10 = cells.count(c => c._1 && !c._2).toLong
    assert(row.getAs[Long]("n00") ===
      cells.count(c => !c._1 && !c._2).toLong)
    assert(row.getAs[Long]("n01") === n01)
    assert(row.getAs[Long]("n10") === n10)
    assert(row.getAs[Long]("n11") ===
      cells.count(c => c._1 && c._2).toLong)
    assert(row.getAs[Long]("n00") + row.getAs[Long]("n01")
      + row.getAs[Long]("n10") + row.getAs[Long]("n11")
      === cells.size.toLong)
    if (n01 + n10 > 0) {
      assert(row.getAs[Long]("mcnemar_e6") ===
        (n10 - n01) * (n10 - n01) * 1000000L / (n10 + n01))
      val b = (n10 - n01).abs - 1
      assert(row.getAs[Long]("mcnemar_cc_e6") ===
        b * b * 1000000L / (n10 + n01))
    }
  }

  test("q_cochran_q: statistic replays from the brute participation " +
      "matrix; row and column sums reconcile") {
    val pres = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct()
      .as[(Long, String)].collect().toSet
    val rSums = pres.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cSums = pres.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val k = cSums.size.toLong
    val nTot = rSums.values.sum
    val sumR2 = rSums.values.map(r => r * r).sum
    val sumC2 = cSums.values.map(c => c * c).sum
    val row = SparkEntry.queries("q_cochran_q")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_users") === rSums.size.toLong)
    assert(row.getAs[Long]("k") === k)
    assert(row.getAs[Long]("n_tot") === nTot)
    assert(nTot === cSums.values.sum, "row and column totals agree")
    assert(row.getAs[Long]("sum_r2") === sumR2)
    assert(row.getAs[Long]("sum_c2") === sumC2)
    if (k * nTot - sumR2 > 0) {
      val q = (k - 1).toDouble * (k.toDouble * sumC2 -
        nTot.toDouble * nTot) / (k.toDouble * nTot - sumR2.toDouble)
      assert(row.getAs[Long]("q_e6") === math.floor(q * 1e6).toLong)
      assert(q >= 0.0, "Cochran's Q is a scaled variance")
    }
  }

  test("q_friedman: within-block doubled midranks replay brutally; " +
      "each complete block's rank2 values sum to k(k+1)") {
    val cells = dailyRows.map(r => (r._2, r._1, r._3))
    val byDay = cells.groupBy(_._1)
    val k = cells.map(_._2).distinct.size
    val complete = byDay.filter(_._2.size == k)
    val r2 = scala.collection.mutable.Map.empty[String, Long]
    complete.values.foreach { rs =>
      val sorted = rs.sortBy(_._3)
      rs.foreach { r =>
        val below = rs.count(_._3 < r._3)
        val tied = rs.count(_._3 == r._3)
        val rank2 = 2L * below + tied + 1
        r2(r._2) = r2.getOrElse(r._2, 0L) + rank2
      }
      // doubled midranks of one block always sum to k(k+1)
      assert(rs.map(r =>
        2L * rs.count(_._3 < r._3) + rs.count(_._3 == r._3) + 1).sum
        === k.toLong * (k + 1))
    }
    val n = complete.size.toLong
    val sumR2sq = r2.values.map(v => v * v).sum
    val row = SparkEntry.queries("q_friedman")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Long]("sum_r2sq") === sumR2sq)
    val chi2 = 3L * sumR2sq * 1000000L / (n * k * (k + 1)) -
      3L * n * (k + 1) * 1000000L
    assert(row.getAs[Long]("chi2_e6") === chi2)
    assert(row.getAs[Long]("w_e6") ===
      math.max(chi2, 0L) / (n * (k - 1)))
  }

  test("q_cohens_d: standardized mean difference replays from the " +
      "exact moments; Hedges' g shrinks toward zero") {
    val got = SparkEntry.queries("q_cohens_d")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    centsRows.groupBy(_._1).foreach { case (ty, rs) =>
      val a = rs.filter(_._3).map(_._2)
      val b = rs.filterNot(_._3).map(_._2)
      if (a.size > 1 && b.size > 1) {
        val (n1, n2) = (a.size.toLong, b.size.toLong)
        val sp2 = ((a.map(x => x * x).sum -
          a.sum.toDouble * a.sum / n1.toDouble)
          + (b.map(x => x * x).sum -
            b.sum.toDouble * b.sum / n2.toDouble)) / (n1 + n2 - 2).toDouble
        val d = (a.sum.toDouble / n1.toDouble -
          b.sum.toDouble / n2.toDouble) / math.sqrt(sp2)
        val row = got(ty)
        if (sp2 > 0) {
          assert((row.getAs[Long]("d_e6") -
            math.floor(d * 1e6).toLong).abs <= 1, s"$ty d")
          val g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
          assert((row.getAs[Long]("g_e6") -
            math.floor(g * 1e6).toLong).abs <= 1, s"$ty g")
          assert(row.getAs[Long]("g_e6").abs <=
            row.getAs[Long]("d_e6").abs + 1, s"$ty |g| <= |d|")
        }
      }
    }
  }

  test("q_mutual_information: brute recompute from the contingency " +
      "table; information inequalities hold") {
    val cellRows = Tables.events(spark, sf)
      .select($"event_type", dayofweek($"ts").cast("long").as("y"))
      .as[(String, Long)].collect()
    val n = cellRows.length.toDouble
    val cells = cellRows.groupBy(identity).view.mapValues(_.size).toMap
    val rx = cellRows.groupBy(_._1).view.mapValues(_.size).toMap
    val ry = cellRows.groupBy(_._2).view.mapValues(_.size).toMap
    val miE9 = cells.map { case ((x, y), o) =>
      math.floor(o / n * math.log(o * n / (rx(x).toDouble * ry(y)))
        * 1e9).toLong
    }.sum
    def hE9(m: Map[_, Int]): Long = m.values.map(c =>
      math.floor(-(c / n) * math.log(c / n) * 1e9).toLong).sum
    val row = SparkEntry.queries("q_mutual_information")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n") === cellRows.length.toLong)
    assert(row.getAs[Long]("mi_e9") === miE9)
    assert(row.getAs[Long]("hx_e9") === hE9(rx))
    assert(row.getAs[Long]("hy_e9") === hE9(ry))
    // 0 <= MI <= min(Hx, Hy) up to floor dust
    val dust = cells.size.toLong + 1
    assert(row.getAs[Long]("mi_e9") >= -dust)
    assert(row.getAs[Long]("mi_e9") <=
      math.min(row.getAs[Long]("hx_e9"), row.getAs[Long]("hy_e9")) + dust)
    val nmi = row.getAs[Long]("nmi_e6")
    assert(nmi >= -1 && nmi <= 1000001L)
  }

  test("q_js_divergence: brute recompute per type; JS bounded by " +
      "ln 2 and symmetric in its one-sided parts") {
    val rows = centsRows.map(r => (r._1, r._2 / 2000, r._3))
    val got = SparkEntry.queries("q_js_divergence")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    rows.groupBy(_._1).foreach { case (ty, rs) =>
      val na = rs.count(_._3).toDouble
      val nb = rs.count(!_._3).toDouble
      val bands = rs.map(_._2).distinct
      var klP = 0L
      var klQ = 0L
      bands.foreach { band =>
        val a = rs.count(r => r._2 == band && r._3)
        val b = rs.count(r => r._2 == band && !r._3)
        val p = a / na
        val q = b / nb
        val m = (p + q) / 2.0
        if (a > 0) klP += math.floor(p * math.log(p / m) * 1e9).toLong
        if (b > 0) klQ += math.floor(q * math.log(q / m) * 1e9).toLong
      }
      val row = got(ty)
      assert(row.getAs[Long]("n_ref") === na.toLong, s"$ty n_ref")
      assert(row.getAs[Long]("n_cur") === nb.toLong, s"$ty n_cur")
      assert(row.getAs[Long]("kl_pm_e9") === klP, s"$ty kl_pm")
      assert(row.getAs[Long]("kl_qm_e9") === klQ, s"$ty kl_qm")
      assert(row.getAs[Long]("js_e9") ===
        math.floor((klP + klQ).toDouble / 2.0).toLong, s"$ty js")
      // JS in [0, ln 2] up to per-band floor dust
      val dust = bands.size.toLong + 1
      assert(row.getAs[Long]("js_e9") >= -dust, s"$ty js lower")
      assert(row.getAs[Long]("js_e9") <= 693147181L + dust,
        s"$ty js upper")
    }
  }

  test("q_wasserstein_drift: exact integral replays from the brute " +
      "CDF walk; metric properties hold") {
    val got = SparkEntry.queries("q_wasserstein_drift")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    centsRows.groupBy(_._1).foreach { case (ty, rs) =>
      val grid = rs.map(_._2).distinct.sorted
      val na = rs.count(_._3).toLong
      val nb = rs.count(!_._3).toLong
      var cumA = 0L
      var cumB = 0L
      var num = 0L
      grid.dropRight(1).zip(grid.drop(1)).foreach { case (v, next) =>
        cumA += rs.count(r => r._2 == v && r._3)
        cumB += rs.count(r => r._2 == v && !r._3)
        num += (cumA * nb - cumB * na).abs * (next - v)
      }
      val row = got(ty)
      assert(row.getAs[Long]("n_ref") === na, s"$ty n_ref")
      assert(row.getAs[Long]("n_cur") === nb, s"$ty n_cur")
      assert(row.getAs[Long]("m_support") === grid.length.toLong)
      assert(row.getAs[Long]("w1_num") === num, s"$ty num")
      assert(row.getAs[Long]("w1_e2") === num * 100 / (na * nb))
      // identity of indiscernibles direction: distance nonneg and
      // bounded by the support range (total mass moved <= range)
      assert(row.getAs[Long]("w1_e2") >= 0)
      assert(row.getAs[Long]("w1_e2") <=
        (grid.last - grid.head) * 100, s"$ty bound")
    }
  }

  /** Brute z_e4 grid exactly as zGridDaily derives it. */
  private def zGrid(xs: Seq[Long]): Seq[Long] = {
    val n = xs.length.toLong
    val (mn, mx, sc) = (xs.min, xs.max, xs.sum)
    xs.map(x => math.floor((n * x - sc).toDouble * 10000.0 /
      (n * (mx - mn))).toLong)
  }

  test("q_paired_ttest: statistic replays from brute per-user " +
    "differences") {
    val got = SparkEntry.queries("q_paired_ttest")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
          % 2 === 0).as("pre"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    ev.groupBy(_._1).foreach { case (ty, rs) =>
      val dd = rs.groupBy(_._2).values.map(es =>
        es.filterNot(_._4).map(_._3).sum - es.filter(_._4).map(_._3).sum)
        .toSeq
      val n = dd.length.toLong
      val sd = dd.sum
      val varN2 = BigInt(n) * dd.map(v => BigInt(v) * v).sum -
        BigInt(sd) * sd
      if (n > 1 && varN2 > 0) {
        val row = got(ty)
        assert(row.getAs[Long]("n") === n)
        assert(row.getAs[Long]("sd") === sd)
        assert(row.getAs[Long]("t_e6") === math.floor(sd.toDouble *
          math.sqrt((n - 1).toDouble) /
          math.sqrt(varN2.toDouble) * 1e6).toLong, s"$ty t")
      }
    }
    assert(got.nonEmpty)
  }

  test("q_overdispersion: the exact rational replays and the Poisson " +
    "flag matches") {
    val got = SparkEntry.queries("q_overdispersion")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("y"))
      .as[(String, java.sql.Date, Long)].collect().toSeq
    daily.groupBy(_._1).foreach { case (ty, rs) =>
      val ys = rs.map(_._3)
      val (n, sy, syy) = (ys.length.toLong, ys.sum,
        ys.map(y => y * y).sum)
      if (n > 1 && sy > 0) {
        val row = got(ty)
        val num = n * syy - sy * sy
        assert(row.getAs[Long]("disp_num") === num, s"$ty num")
        val d = num * 1000L / ((n - 1) * sy)
        assert(row.getAs[Long]("disp_e3") === d, s"$ty d")
        assert(row.getAs[Boolean]("overdispersed") === (d > 1000L))
      }
    }
    assert(got.nonEmpty)
  }

  test("q_mmd_drift: closed form replays from brute moments and the " +
    "statistic is nonnegative") {
    val got = SparkEntry.queries("q_mmd_drift")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    centsRows.groupBy(_._1).foreach { case (ty, rs) =>
      val ref = rs.filter(_._3).map(_._2)
      val cur = rs.filterNot(_._3).map(_._2)
      if (ref.nonEmpty && cur.nonEmpty && ref.sum > 0) {
        val muR = ref.sum.toDouble / ref.length
        val muC = cur.sum.toDouble / cur.length
        val qqR = ref.map(x => BigInt(x) * x).sum.toDouble / ref.length
        val qqC = cur.map(x => BigInt(x) * x).sum.toDouble / cur.length
        val c = muR * muR
        val mmd2 = 2.0 * (muR - muC) * (muR - muC) / c +
          (qqR - qqC) * (qqR - qqC) / (c * c)
        val row = got(ty)
        // brute accumulates doubles in a different order: 1-unit slack
        assert((row.getAs[Long]("mmd2_e9") -
          math.floor(mmd2 * 1e9).toLong).abs <= 1, s"$ty mmd")
        assert(row.getAs[Long]("mmd2_e9") >= 0L, s"$ty nonneg")
      }
    }
    assert(got.nonEmpty)
  }

  test("q_energy_distance: prefix-sum integrals equal the brute " +
    "pairwise sums; the distance is nonnegative") {
    val got = SparkEntry.queries("q_energy_distance")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    centsRows.groupBy(_._1).foreach { case (ty, rs) =>
      val ref = rs.filter(_._3).map(_._2)
      val cur = rs.filterNot(_._3).map(_._2)
      val sxy = (for (a <- ref; b <- cur) yield (a - b).abs).sum
      val sxx = (for (i <- ref.indices; j <- i + 1 until ref.length)
        yield (ref(i) - ref(j)).abs).sum
      val syy = (for (i <- cur.indices; j <- i + 1 until cur.length)
        yield (cur(i) - cur(j)).abs).sum
      val row = got(ty)
      assert(row.getAs[Long]("sxy") === sxy, s"$ty sxy")
      assert(row.getAs[Long]("sxx") === sxx, s"$ty sxx")
      assert(row.getAs[Long]("syy") === syy, s"$ty syy")
      val (na, nb) = (BigInt(ref.length), BigInt(cur.length))
      val eNum = 2 * BigInt(sxy) * na * nb - 2 * BigInt(sxx) * nb * nb -
        2 * BigInt(syy) * na * na
      assert(row.getAs[Long]("energy_e2") ===
        (eNum * 100 / (na * na * nb * nb)).toLong, s"$ty e")
      // energy distance >= 0, with floor dust on the e2 grid
      assert(row.getAs[Long]("energy_e2") >= -1L, s"$ty nonneg")
    }
    assert(got.nonEmpty)
  }

  test("q_conformal_interval: q-hat replays as the exact order " +
    "statistic and test coverage honors the 90% guarantee shape") {
    val got = SparkEntry.queries("q_conformal_interval")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long)].collect().toSeq
    ev.groupBy(_._1).foreach { case (ty, rs) =>
      val train = rs.filter(r => r._2 % 4 <= 1)
      val calib = rs.filter(r => r._2 % 4 == 2)
      val test = rs.filter(r => r._2 % 4 == 3)
      val (nTr, sTr) = (train.length.toLong, train.map(_._3).sum)
      val resid = calib
        .map(r => ((nTr * r._3 - sTr).abs, r._2)).sorted
      val k = (9 * (calib.length + 1) + 9) / 10
      val qhat = resid(k - 1)._1
      val covered = test.count(r => (nTr * r._3 - sTr).abs <= qhat)
      val row = got(ty)
      assert(row.getAs[Long]("n_train") === nTr, s"$ty train")
      assert(row.getAs[Long]("n_cal") === calib.length.toLong)
      assert(row.getAs[Long]("qhat_scaled") === qhat, s"$ty qhat")
      assert(row.getAs[Long]("qhat_cents") === qhat / nTr)
      assert(row.getAs[Long]("n_test") === test.length.toLong)
      assert(row.getAs[Long]("n_covered") === covered.toLong)
      assert(row.getAs[Long]("coverage_ppm") ===
        covered.toLong * 1000000L / test.length)
      // marginal validity: coverage concentrates near >= 90%; allow
      // finite-sample binomial slack of ~3/sqrt(n_test)
      val slack = (3000000.0 / math.sqrt(test.length.toDouble)).toLong
      assert(row.getAs[Long]("coverage_ppm") >= 900000L - slack,
        s"$ty coverage")
    }
    assert(got.nonEmpty)
  }

  test("q_jarque_bera: moment sums replay from a brute z-grid walk; " +
    "Pearson's kurtosis-skewness inequality holds") {
    val got = SparkEntry.queries("q_jarque_bera")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    var checked = 0
    dailyRows.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.map(_._3)
      val n = xs.length.toLong
      if (n >= 8 && xs.max > xs.min) {
        val z = zGrid(xs)
        val m2 = z.map(v => v * v).sum
        val m3 = z.map(v => v * v * v).sum
        val m4 = z.map(v => v * v * v * v).sum
        val row = got(ty)
        assert(row.getAs[Long]("n_days") === n, s"$ty n")
        assert(row.getAs[Long]("m2") === m2, s"$ty m2")
        assert(row.getAs[Long]("m3") === m3, s"$ty m3")
        assert(row.getAs[Long]("m4") === m4, s"$ty m4")
        val sk = math.sqrt(n.toDouble) * m3 / (m2 * math.sqrt(m2.toDouble))
        val kt = n.toDouble * m4 / (m2.toDouble * m2)
        assert(row.getAs[Long]("skew_e6") ===
          math.floor(sk * 1000000.0).toLong, s"$ty skew")
        assert(row.getAs[Long]("kurt_e6") ===
          math.floor(kt * 1000000.0).toLong, s"$ty kurt")
        assert(row.getAs[Long]("jb_e3") >= 0L, s"$ty jb nonneg")
        // Pearson: kurtosis >= skewness^2 + 1 for any distribution
        assert(kt >= sk * sk + 1.0 - 1e-9, s"$ty pearson")
        checked += 1
      }
    }
    assert(checked > 0 && got.size === checked)
  }

  test("q_grubbs_outlier: peak day and statistic replay from a brute " +
    "walk; the 3-sigma flag is the same algebra cross-multiplied") {
    val got = SparkEntry.queries("q_grubbs_outlier")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    var checked = 0
    dailyRows.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.map(_._3)
      val n = xs.length.toLong
      val sc = xs.sum
      val varN2 = xs.map(x => BigInt(x) * x).sum * n - BigInt(sc) * sc
      if (n >= 8 && varN2 > 0) {
        val peak = rs.map(r => (r._2, (n * r._3 - sc).abs))
          .sortBy { case (day, adev) => (-adev, day) }.head
        val row = got(ty)
        assert(row.getAs[Long]("n_days") === n, s"$ty n")
        assert(row.getAs[java.sql.Date]("peak_day").toString === peak._1,
          s"$ty day")
        assert(row.getAs[Long]("peak_adev") === peak._2, s"$ty adev")
        assert(row.getAs[Long]("g2_ppm") ===
          (BigInt(peak._2) * peak._2 * 1000000 / varN2).toLong, s"$ty g2")
        assert(row.getAs[Boolean]("beyond_3sigma") ===
          (BigInt(peak._2) * peak._2 > varN2 * 9), s"$ty 3sigma")
        // G^2 <= (n-1)^2/n * 1e6 ppm (max possible studentized dev)
        assert(row.getAs[Long]("g2_ppm") <=
          (n - 1) * (n - 1) * 1000000L / n, s"$ty bound")
        checked += 1
      }
    }
    assert(checked > 0 && got.size === checked)
  }

  test("q_adf_test: moments replay from the ordered z-grid walk, " +
    "t2 is the exact rational, and the AR coefficient is stable") {
    val got = SparkEntry.queries("q_adf_test")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    dailyRows.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      if (n >= 8 && xs.max > xs.min) {
        val z = zGrid(xs)
        val pairs = z.drop(1).zip(z) // (current, lag)
        val sxd = pairs.map { case (c, p) => p * (c - p) }.sum
        val sxx = pairs.map { case (_, p) => p * p }.sum
        val sdd = pairs.map { case (c, p) => (c - p) * (c - p) }.sum
        if (sxx > 0) {
          val row = got(ty)
          assert(row.getAs[Long]("n_diffs") === n - 1, s"$ty n")
          assert(row.getAs[Long]("sxd") === sxd, s"$ty sxd")
          assert(row.getAs[Long]("sxx") === sxx, s"$ty sxx")
          assert(row.getAs[Long]("sdd") === sdd, s"$ty sdd")
          assert(row.getAs[Long]("beta_ppm") ===
            (BigInt(sxd) * 1000000 / sxx).toLong, s"$ty beta")
          val den = BigInt(sxx) * sdd - BigInt(sxd) * sxd
          if (den > 0) {
            val t2 = BigInt(n - 2) * sxd * sxd * 1000000 / den
            assert(row.getAs[Long]("t2_e6") === t2.toLong, s"$ty t2")
            assert(row.getAs[Boolean]("stationary_5pct") ===
              (sxd < 0 && t2 >= 8179600), s"$ty flag")
          }
          // Cauchy-Schwarz puts beta-hat of any real series in
          // [-2, 0] only for mean-reverting data; pin the weaker
          // regression identity instead: |sxd| <= sqrt(sxx*sdd)
          assert(BigInt(sxd) * sxd <= BigInt(sxx) * sdd, s"$ty cs")
        }
      }
    }
    assert(got.nonEmpty)
    // the synthetic i.i.d. daily sums must mean-revert decisively
    assert(got.values.forall(_.getAs[Boolean]("stationary_5pct")))
  }

  test("q_granger_lag1: centered moments replay from the aligned " +
    "z-grid pair walk, F matches the nested-RSS identity, and RSS " +
    "never increases when a regressor is added") {
    val got = SparkEntry.queries("q_granger_lag1")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("type_a"),
        r.getAs[String]("type_b")) -> r).toMap
    assert(got.nonEmpty)
    // rebuild per-type (day -> (z, zlag)) walks
    val series = dailyRows.groupBy(_._1).flatMap { case (ty, rs) =>
      val ordered = rs.sortBy(_._2)
      val xs = ordered.map(_._3)
      if (xs.length >= 8 && xs.max > xs.min) {
        val z = zGrid(xs)
        Some(ty -> ordered.map(_._2).zip(z).drop(0).sliding(2)
          .collect { case Seq((_, p), (day, c)) => day -> ((c, p)) }
          .toMap)
      } else None
    }
    val types = series.keys.toSeq.sorted
    for (ta <- types; tb <- types if ta != tb) {
      val days = series(ta).keySet intersect series(tb).keySet
      val rows = days.toSeq.sorted.map { day =>
        val (y, x) = series(tb)(day)
        val (_, wv) = series(ta)(day)
        (y, x, wv)
      }
      val n = rows.length.toLong
      if (n > 3) {
        val (sy, sx, sw) = (rows.map(_._1).sum, rows.map(_._2).sum,
          rows.map(_._3).sum)
        val a = n * rows.map(r => r._2 * r._2).sum - sx * sx
        val b = n * rows.map(r => r._3 * r._3).sum - sw * sw
        val cv = n * rows.map(r => r._2 * r._3).sum - sx * sw
        val dv = n * rows.map(r => r._1 * r._2).sum - sx * sy
        val ev = n * rows.map(r => r._1 * r._3).sum - sw * sy
        val yv = n * rows.map(r => r._1 * r._1).sum - sy * sy
        val det = BigInt(a) * b - BigInt(cv) * cv
        if (a > 0 && det > 0) {
          val row = got((ta, tb))
          assert(row.getAs[Long]("n") === n, s"$ta->$tb n")
          assert((row.getAs[Long]("a_c"), row.getAs[Long]("b_c"),
            row.getAs[Long]("c_c"), row.getAs[Long]("d_c"),
            row.getAs[Long]("e_c"), row.getAs[Long]("y_c")) ===
            ((a, b, cv, dv, ev, yv)), s"$ta->$tb moments")
          val detD = a.toDouble * b - cv.toDouble * cv
          val rssR = (yv.toDouble * a - dv.toDouble * dv) / a.toDouble
          val rssU = (yv.toDouble * detD - dv.toDouble * dv * b
            + 2.0 * dv * ev * cv - ev.toDouble * ev * a) / detD
          if (rssU > 0) {
            val f = math.floor((n - 3).toDouble * (rssR - rssU) /
              rssU * 1000.0).toLong
            assert(row.getAs[Long]("f_e3") === f, s"$ta->$tb f")
            assert(row.getAs[Boolean]("granger_5pct") === (f >= 4240L))
            // adding a regressor can only shrink RSS => F >= 0 up to
            // the floor's -1 grid step
            assert(f >= -1L, s"$ta->$tb rss monotonicity")
          }
        }
      }
    }
  }

  test("q_esd_outliers: rounds replay brute-force with subtracted " +
    "moments, peaks are distinct days, and k_esd follows Rosner's rule") {
    val got = SparkEntry.queries("q_esd_outliers")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("round"))
        -> r).toMap
    assert(got.nonEmpty)
    dailyRows.groupBy(_._1).foreach { case (ty, rs0) =>
      var rs = rs0.map(t => t._2 -> t._3).sortBy(_._1)
      var flags = Vector.empty[Boolean]
      (1 to ops.InferenceQueries.EsdRounds).foreach { round =>
        val n = rs.length.toLong
        val sc = rs.map(_._2).sum
        val sq = rs.map(t => BigInt(t._2) * t._2).sum
        val varN2 = BigInt(n) * sq - BigInt(sc) * sc
        if (n >= 8 && varN2 > 0) {
          val peak = rs.map { case (day, c) =>
            (day, (BigInt(n) * c - sc).abs)
          }.maxBy { case (day, a) => (a, ReverseDay(day)) }
          val row = got((ty, round.toLong))
          assert(row.getAs[Long]("n_eff") === n, s"$ty r$round n")
          assert(row.getAs[java.sql.Date]("peak_day").toString ===
            peak._1, s"$ty r$round day")
          assert(BigInt(row.getAs[Long]("peak_adev")) === peak._2)
          assert(row.getAs[Long]("g2_ppm") ===
            (peak._2 * peak._2 * 1000000 / varN2).toLong)
          val sig = peak._2 * peak._2 > varN2 * 9
          assert(row.getAs[Boolean]("significant") === sig)
          flags :+= sig
          rs = rs.filterNot(_._1 == peak._1)
        }
      }
      // Rosner: k = LAST significant round, not the first failure
      val k = flags.lastIndexWhere(identity) + 1
      (1 to flags.length).foreach { round =>
        assert(got((ty, round.toLong)).getAs[Long]("k_esd") ===
          k.toLong, s"$ty k")
      }
    }
  }

  /** Orders day strings DESCENDING so maxBy picks the EARLIEST day on
    * adev ties (the query's min-struct tiebreak). */
  private def ReverseDay(day: String): String =
    day.map(c => (255 - c.toInt).toChar)

  test("q_did: all sixteen cell moments and both contrasts replay " +
    "in exact BigInt rationals") {
    val rows = SparkEntry.queries("q_did")(spark, sf).collect()
    assert(rows.length === 1)
    val row = rows.head
    val base = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(($"user_id" % 2 === 1),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Boolean, Long, Long)].collect()
    val (mn, mx) = (base.map(_._2).min, base.map(_._2).max)
    val cut = (mn + mx) / 2
    val fakeCut = (3 * mn + mx) / 4
    def cell(t: Boolean, lo: Long, hi: Long) = {
      val rs = base.filter(r => r._1 == t && r._2 > lo && r._2 <= hi)
      (rs.map(_._3).sum, rs.length.toLong)
    }
    def did(cs: Seq[(Long, Long)]): Long = {
      val Seq((stp, ntp), (str0, ntr), (scp, ncp), (scr, ncr)) = cs
      ((BigInt(stp) * ntr * ncp * ncr - BigInt(str0) * ntp * ncp * ncr
        - BigInt(scp) * ntp * ntr * ncr + BigInt(scr) * ntp * ntr * ncp)
        * 1000000 /
        (BigInt(ntp) * ntr * ncp * ncr)).toLong
    }
    val realCells = Seq(cell(true, cut, Long.MaxValue),
      cell(true, Long.MinValue, cut), cell(false, cut, Long.MaxValue),
      cell(false, Long.MinValue, cut))
    val fakeCells = Seq(cell(true, fakeCut, cut),
      cell(true, Long.MinValue, fakeCut), cell(false, fakeCut, cut),
      cell(false, Long.MinValue, fakeCut))
    assert((row.getAs[Long]("s_tp"), row.getAs[Long]("n_tp")) ===
      realCells.head)
    assert((row.getAs[Long]("s_cr"), row.getAs[Long]("n_cr")) ===
      realCells(3))
    assert(row.getAs[Long]("did_microcents") === did(realCells))
    assert(row.getAs[Long]("placebo_microcents") === did(fakeCells))
    // the placebo window partitions the pre period exactly
    assert(fakeCells.map(_._2).sum === realCells(1)._2 +
      realCells(3)._2)
  }

  test("q_zero_inflation: cells replay brute-force and the Poisson " +
    "expectation matches the closed form") {
    val got = SparkEntry.queries("q_zero_inflation")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    val base = Tables.events(spark, sf)
      .select($"event_type", $"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long"))
      .as[(String, Long, Long)].collect()
    val nUsers = base.map(_._2).distinct.length.toLong
    base.groupBy(_._1).foreach { case (ty, rs) =>
      val nDays = rs.map(_._3).max - rs.map(_._3).min + 1
      val nCells = nUsers * nDays
      val nonzero = rs.map(r => (r._2, r._3)).distinct.length.toLong
      val total = rs.length.toLong
      val row = got(ty)
      assert(row.getAs[Long]("n_cells") === nCells, ty)
      assert(row.getAs[Long]("zero_cells") === nCells - nonzero, ty)
      assert(row.getAs[Long]("total_events") === total, ty)
      val expZero = math.floor(nCells *
        math.exp(-(total.toDouble / nCells)) * 1e6).toLong
      assert(row.getAs[Long]("expected_zero_e6") === expZero, ty)
      if (expZero > 0)
        assert(row.getAs[Long]("zi_ratio_ppm") ===
          BigInt(nCells - nonzero) * 1000000000000L / expZero, ty)
      assert(row.getAs[Long]("zero_cells") >= 0, ty)
    }
  }

  test("q_durbin_watson: statistic replays from the ordered z-grid " +
    "walk and sits in [0, 4]") {
    val got = SparkEntry.queries("q_durbin_watson")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    dailyRows.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.sortBy(_._2).map(_._3) // ISO day strings sort by time
      val n = xs.length.toLong
      if (n >= 8 && xs.max > xs.min) {
        val z = zGrid(xs)
        val z2 = z.map(v => v * v).sum
        val dz2 = z.drop(1).zip(z)
          .map { case (cur, prev) => (cur - prev) * (cur - prev) }.sum
        val row = got(ty)
        assert(row.getAs[Long]("n_days") === n, s"$ty n")
        assert(row.getAs[Long]("sum_z2") === z2, s"$ty z2")
        assert(row.getAs[Long]("sum_dz2") === dz2, s"$ty dz2")
        val dw = dz2 * 1000000L / z2
        assert(row.getAs[Long]("dw_e6") === dw, s"$ty dw")
        // (a-b)^2 <= 2a^2 + 2b^2 summed over the chain bounds DW by 4
        assert(dw >= 0L && dw <= 4000000L, s"$ty range")
      }
    }
    assert(got.nonEmpty)
  }

  test("q_iv_wald: moments, contrasts, and the sign-split ratio " +
      "replay brute-force; Wald = ITT/first-stage exactly") {
    val row = SparkEntry.queries("q_iv_wald")(spark, sf).head()
    val perUser = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("x"),
        sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
          .as("y"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1), r.getLong(2)))
    val (g1, g0) = perUser.partition(_._1 == 1L)
    assert(row.getAs[Long]("n1") === g1.length.toLong)
    assert(row.getAs[Long]("n0") === g0.length.toLong)
    assert(row.getAs[Long]("sx1") === g1.map(_._2).sum)
    assert(row.getAs[Long]("sx0") === g0.map(_._2).sum)
    assert(row.getAs[Long]("sy1") === g1.map(_._3).sum)
    assert(row.getAs[Long]("sy0") === g0.map(_._3).sum)
    val num = BigInt(g1.map(_._3).sum) * g0.length -
      BigInt(g0.map(_._3).sum) * g1.length
    val den = BigInt(g1.map(_._2).sum) * g0.length -
      BigInt(g0.map(_._2).sum) * g1.length
    assert(BigInt(row.getAs[Long]("itt_num")) === num)
    assert(BigInt(row.getAs[Long]("fs_den")) === den)
    // sign-split truncating division (matches both engines)
    val mag = num.abs * 1000000 / den.abs
    val want = if (num.signum * den.signum >= 0) mag else -mag
    assert(BigInt(row.getAs[Long]("wald_e6")) === want)
  }

  test("q_rdd_sharp: per-side OLS moments and the intercept gap " +
      "replay brute-force in exact rationals") {
    val row = SparkEntry.queries("q_rdd_sharp")(spark, sf).head()
    val daily = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"dayn").agg(sum($"cents").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cut = (daily.map(_._1).min + daily.map(_._1).max) / 2
    val h = ops.InferenceQueries.RddBandwidth
    def fit(side: Seq[(Long, Long)]): (Long, BigInt, BigInt, BigInt) = {
      val n = side.length.toLong
      val sx = side.map(_._1).sum
      val sy = side.map(_._2).sum
      val sxy = side.map(p => p._1 * p._2).sum
      val sxx = side.map(p => p._1 * p._1).sum
      val dd = BigInt(n) * sxx - BigInt(sx) * sx
      val aa = BigInt(sy) * sxx - BigInt(sx) * sxy
      val sn = BigInt(n) * sxy - BigInt(sx) * sy
      (n, dd, aa, sn)
    }
    def sgnDiv(num: BigInt, den: BigInt, k: Long): BigInt = {
      val mag = num.abs * k / den.abs
      if (num.signum * den.signum >= 0) mag else -mag
    }
    val xs = daily.map { case (d, y) => (d - cut, y) }
      .filter(p => p._1 >= -h && p._1 <= h)
    val (nl, ddl, aal, snl) = fit(xs.filter(_._1 < 0).toSeq)
    val (nr, ddr, aar, snr) = fit(xs.filter(_._1 >= 0).toSeq)
    assert(row.getAs[Long]("n_l") === nl)
    assert(row.getAs[Long]("n_r") === nr)
    assert(BigInt(row.getAs[Long]("slope_l_e6")) ===
      sgnDiv(snl, ddl, 1000000L))
    assert(BigInt(row.getAs[Long]("slope_r_e6")) ===
      sgnDiv(snr, ddr, 1000000L))
    assert(BigInt(row.getAs[Long]("intercept_l_e3")) ===
      sgnDiv(aal, ddl, 1000L))
    assert(BigInt(row.getAs[Long]("intercept_r_e3")) ===
      sgnDiv(aar, ddr, 1000L))
    assert(BigInt(row.getAs[Long]("effect_e3")) ===
      sgnDiv(aar * ddl - aal * ddr, ddr * ddl, 1000L))
    // consistency: the exact-rational effect sits within 1e-3 grid
    // slack of the difference of the two rounded intercepts
    val approx = row.getAs[Long]("intercept_r_e3") -
      row.getAs[Long]("intercept_l_e3")
    assert((row.getAs[Long]("effect_e3") - approx).abs <= 2L)
  }

  test("q_jonckheere: the lattice-window 2U equals the brute pairwise " +
      "count and the z replays in BigInt") {
    val byType = centsRows.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val types = byType.keys.toSeq.sorted
    var u2 = BigInt(0)
    for {
      (t1, i) <- types.zipWithIndex; t2 <- types.drop(i + 1)
      x <- byType(t1); y <- byType(t2)
    } {
      if (x < y) u2 += 2 else if (x == y) u2 += 1
    }
    val n = BigInt(centsRows.size)
    val sumNi2 = types.map(t => BigInt(byType(t).size).pow(2)).sum
    val eU2 = (n * n - sumNi2) / 2
    val varU72 = n * n * (2 * n + 3) -
      types.map { t => val ni = BigInt(byType(t).size)
        ni * ni * (2 * ni + 3) }.sum
    val dev = u2 - eU2
    val mag = BigInt(18000000) * dev.abs * dev.abs / varU72
    val want = if (dev >= 0) mag else -mag
    val row = SparkEntry.queries("q_jonckheere")(spark, sf).head()
    assert(row.getAs[Long]("u2") === u2.toLong)
    assert(row.getAs[Long]("e_u2") === eU2.toLong)
    assert(row.getAs[Long]("var_u72") === varU72.toLong)
    assert(row.getAs[Long]("z2_e6") === want.toLong)
  }

  test("q_cliffs_delta: dominance counts replay brute-force per type " +
      "and the Romano bands label the e6 magnitude") {
    val got = SparkEntry.queries("q_cliffs_delta")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("gt"), r.getAs[Long]("lt"),
          r.getAs[Long]("delta_e6"), r.getAs[String]("magnitude"))).toMap
    centsRows.groupBy(_._1).foreach { case (t, rows) =>
      val ref = rows.filter(_._3).map(_._2)
      val trt = rows.filterNot(_._3).map(_._2)
      var gt = 0L; var lt = 0L
      for (x <- trt; y <- ref) {
        if (x > y) gt += 1 else if (x < y) lt += 1
      }
      val mag = BigInt(gt - lt).abs * 1000000 /
        (BigInt(ref.size) * trt.size)
      val (ggt, glt, gdelta, gmag) = got(t)
      assert((ggt, glt) === ((gt, lt)))
      assert(gdelta === (if (gt >= lt) mag.toLong else -mag.toLong))
      val wantLabel =
        if (mag < 147000) "negligible" else if (mag < 330000) "small"
        else if (mag < 474000) "medium" else "large"
      assert(gmag === wantLabel)
    }
  }

  test("q_wilcoxon_signed_rank + q_sign_test: both replay from the " +
      "same driver-side paired differences in BigInt") {
    val diffs = Tables.events(spark, sf)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
          % 2 === 0).as("pre"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long, Boolean)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(rs => rs.filterNot(_._4).map(_._3).sum -
        rs.filter(_._4).map(_._3).sum)
      .toSeq.map { case ((t, _), dd) => (t, dd) }
      .filter(_._2 != 0L)
    val wGot = SparkEntry.queries("q_wilcoxon_signed_rank")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("w2_pos"),
          r.getAs[Long]("z2_e6"))).toMap
    val sGot = SparkEntry.queries("q_sign_test")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Long]("z2_e6"))).toMap
    diffs.groupBy(_._1).foreach { case (t, rows) =>
      val ds = rows.map(_._2)
      val sortedAbs = ds.map(_.abs).sorted
      // doubled midrank of |d|: 2*avg over the tie group
      def rank2(ad: Long): Long = {
        val below = sortedAbs.count(_ < ad)
        val tieSz = sortedAbs.count(_ == ad)
        2L * below + tieSz + 1
      }
      val n = BigInt(ds.size)
      val w2pos = ds.filter(_ > 0).map(d => BigInt(rank2(d.abs))).sum
      val e2 = n * (n + 1) / 2
      val tieNum = sortedAbs.groupBy(identity).values
        .map(g => BigInt(g.size).pow(3) - g.size).sum
      val v12 = 2 * n * (n + 1) * (2 * n + 1) - tieNum
      val dev = w2pos - e2
      val mag = BigInt(12000000) * dev.abs * dev.abs / v12
      val (gn, gw, gz) = wGot(t)
      assert(gn === n.toLong)
      assert(gw === w2pos.toLong)
      assert(gz === (if (dev >= 0) mag.toLong else -mag.toLong))
      // sign test
      val (np, nn) = (ds.count(_ > 0).toLong, ds.count(_ < 0).toLong)
      val smag = if (np + nn > 0 && (np - nn).abs > 1)
        BigInt((np - nn).abs - 1).pow(2) * 1000000 / (np + nn)
      else BigInt(0)
      val (gp, gneg, gsz) = sGot(t)
      assert((gp, gneg) === ((np, nn)))
      assert(gsz === (if (np >= nn) smag.toLong else -smag.toLong))
    }
  }

  test("q_page_trend: L replays from driver-side midranks over " +
      "complete day blocks in BigInt") {
    val cells = dailyRows.groupBy(_._2) // by day
    val k = dailyRows.map(_._1).distinct.size
    val complete = cells.filter(_._2.size == k)
    val types = dailyRows.map(_._1).distinct.sorted
    val r2 = scala.collection.mutable.Map.empty[String, BigInt]
    complete.foreach { case (_, rows) =>
      val sorted = rows.map(_._3).sorted
      rows.foreach { case (t, _, c) =>
        val below = sorted.count(_ < c)
        val tieSz = sorted.count(_ == c)
        r2(t) = r2.getOrElse(t, BigInt(0)) + (2 * below + tieSz + 1)
      }
    }
    val m = BigInt(complete.size)
    val l2 = types.zipWithIndex
      .map { case (t, i) => BigInt(i + 1) * r2(t) }.sum
    val dev2 = l2 * 2 - m * k * (k + 1) * (k + 1)
    val mag = BigInt(36000000) * dev2 * dev2 /
      (4 * m * k * k * (k + 1) * (BigInt(k) * k - 1))
    val row = SparkEntry.queries("q_page_trend")(spark, sf).head()
    assert(row.getAs[Long]("m") === m.toLong)
    assert(row.getAs[Long]("l2") === l2.toLong)
    assert(row.getAs[Long]("z2_e6") ===
      (if (dev2 >= 0) mag.toLong else -mag.toLong))
  }
}
