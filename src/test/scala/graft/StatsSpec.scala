package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the distribution-stats operators (StatsQueries)
  * and the chunking/perplexity text operators. */
class StatsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("q_anderson_darling: driver-side BigInt midrank replay") {
    val evs = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val expected = evs.groupBy(_._1).map { case (t, rows) =>
      val nR = rows.count(_._3).toLong
      val nC = rows.size - nR
      val n = nR + nC
      var cumR = 0L; var cumC = 0L
      var a2 = BigInt(0); var grid = 0L
      rows.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, g) =>
        val r = g.count(_._3).toLong; val c = g.size - r
        cumR += r; cumC += c
        val l = r + c
        val q = 2 * (cumR + cumC) - l
        val dden = BigInt(q) * (2 * n - q) - BigInt(n) * l
        if (dden > 0) {
          val pR = BigInt(n) * (2 * cumR - r) - BigInt(nR) * q
          val pC = BigInt(n) * (2 * cumC - c) - BigInt(nC) * q
          a2 += BigInt(1000000) * (n - 1) * l * pR * pR /
            (BigInt(n) * n * nR * dden)
          a2 += BigInt(1000000) * (n - 1) * l * pC * pC /
            (BigInt(n) * n * nC * dden)
        }
        grid += 1
      }
      t -> (nR, nC, grid, a2.toLong)
    }
    val got = SparkEntry.queries("q_anderson_darling")(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === expected(r.getString(0)))
    }
  }

  test("q_kuiper_test: driver-side ECDF replay, and V dominates KS") {
    val evs = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_ref"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val expected = evs.groupBy(_._1).map { case (t, rows) =>
      val nR = rows.count(_._3).toLong
      val nC = rows.size - nR
      var cumR = 0L; var cumC = 0L
      var dp = 0L; var dm = 0L
      rows.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, g) =>
        cumR += g.count(_._3); cumC += g.count(!_._3)
        dp = math.max(dp, cumR * nC - cumC * nR)
        dm = math.max(dm, cumC * nR - cumR * nC)
      }
      t -> (nR, nC, dp, dm,
        (BigInt(dp + dm) * 1000000 / (BigInt(nR) * nC)).toLong)
    }
    val ks = SparkEntry.queries("q_ks_test")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("ks_num")).toMap
    val got = SparkEntry.queries("q_kuiper_test")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === expected(t))
      // V num = D+ + D- >= max(D+, D-) = KS num, always
      assert(r.getLong(3) + r.getLong(4) >= ks(t))
    }
  }

  test("q_outlier_iqr: fences ordered, pct in [0,1], counts partition the table") {
    val rows = SparkEntry.queries("q_outlier_iqr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("q3"))
      assert(r.getAs[Double]("q3") <= r.getAs[Double]("hi_fence"))
      val pct = r.getAs[Double]("outlier_pct")
      assert(pct >= 0.0 && pct <= 1.0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("q_corr_moments: correlations in [-1,1] and equal to Spark's corr()") {
    val r = SparkEntry.queries("q_corr_moments")(spark, sf).head()
    val cs = Seq("corr_qty_price", "corr_qty_disc", "corr_price_disc")
      .map(r.getAs[Double])
    cs.foreach(c => assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c"))
    // the exact-decimal moment form must equal Spark's own corr()
    val ref = Tables.lineitem(spark, sf).agg(
      corr($"l_quantity", $"l_extendedprice"),
      corr($"l_quantity", $"l_discount"),
      corr($"l_extendedprice", $"l_discount")).head()
    cs.zipWithIndex.foreach { case (c, i) =>
      assert(math.abs(c - ref.getDouble(i)) < 1e-4,
        s"moment corr diverges from corr() at $i: $c vs ${ref.getDouble(i)}")
    }
  }

  test("q_time_decay: decayed total is positive and never exceeds raw") {
    val rows = SparkEntry.queries("q_time_decay")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_total")
      val dec = r.getAs[Double]("decayed_total")
      assert(dec > 0.0 && dec <= raw, s"decay out of band: $dec vs $raw")
    }
  }

  test("q_robust_scale: centered on the median, flags only extreme rows") {
    val rows = SparkEntry.queries("q_robust_scale")(spark, sf).collect()
    assert(rows.length === Tables.orders(spark, sf).count())
    val zs = rows.map(_.getAs[Double]("robust_z")).sorted
    // median of robust-z is 0 by construction (subtraction of med)
    assert(math.abs(zs(zs.length / 2)) < 0.01)
    // is_outlier comes from the UNROUNDED quotient while robust_z is
    // the floored 1e-4 fixed-point value, so only assert agreement
    // away from the 3.5 boundary (within 1e-3 of it the floor can
    // legitimately land on the other side)
    rows.foreach { r =>
      val z = math.abs(r.getAs[Double]("robust_z"))
      if (math.abs(z - 3.5) > 1e-3)
        assert(r.getAs[Boolean]("is_outlier") === (z > 3.5))
    }
  }

  test("q_pmi_terms: min support holds and ordering is by pmi") {
    val rows = SparkEntry.queries("q_pmi_terms")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("c12") >= 20L))
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.sameElements(pmis.sorted(Ordering[Double].reverse)))
  }

  test("q_data_profile: one row per column, count invariants hold") {
    val rows = SparkEntry.queries("q_data_profile")(spark, sf).collect()
    assert(rows.length === 4)
    val n = Tables.orders(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_nonnull") <= n)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
      assert(r.getAs[String]("min_s") <= r.getAs[String]("max_s"))
    }
  }

  test("q_benford: nine digits, probabilities sum to 1 on both sides") {
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).sorted.sameElements(1 to 9))
    val obs = rows.map(_.getAs[Double]("obs_p")).sum
    val exp = rows.map(_.getAs[Double]("benford_p")).sum
    assert(math.abs(obs - 1.0) < 1e-3 && math.abs(exp - 1.0) < 1e-3)
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.orders(spark, sf).count())
  }

  test("q_interevent_times: ordered percentiles, gaps count checks out") {
    val rows = SparkEntry.queries("q_interevent_times")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTypes = rows.length.toLong
    assert(rows.map(_.getAs[Long]("n_gaps")).sum ===
      Tables.events(spark, sf).count() - nTypes)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_us") <= r.getAs[Double]("p95_us"))
      assert(r.getAs[Double]("p95_us") <= r.getAs[Long]("max_us").toDouble)
    }
  }

  test("q_date_gaps: gaps are exactly span minus active") {
    val rows = SparkEntry.queries("q_date_gaps")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("active_days") <= r.getAs[Long]("span_days"))
      assert(r.getAs[Long]("gap_days") ===
        r.getAs[Long]("span_days") - r.getAs[Long]("active_days"))
    }
  }

  test("q_markov_transitions: rows partition the non-first events, probs sum to 1") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    // every event except each user's first contributes one transition
    assert(rows.map(_.getAs[Long]("cnt")).sum === nEvents - nUsers)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (p, g) =>
      val tot = g.map(_.getAs[Double]("p_next")).sum
      assert(math.abs(tot - 1.0) < 1e-3, s"$p: $tot")
    }
  }

  test("q_token_entropy: bounded by ln(n_distinct), zero for degenerate docs") {
    val rows = SparkEntry.queries("q_token_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val hMax = math.log(r.getAs[Long]("n_distinct").toDouble)
      // h is rounded to 4 decimals; allow the half-step plus term dust
      assert(h >= -1e-9 && h <= hMax + 6e-5,
        s"doc ${r.getAs[Long]("doc_id")}: H=$h above ln(k)=$hMax")
    }
  }

  test("q_source_overlap: one row per unordered source pair, jaccard in (0,1]") {
    val rows = SparkEntry.queries("q_source_overlap")(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf)
      .select($"source").distinct().count()
    assert(rows.length === (nSrc * (nSrc - 1) / 2).toInt)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q_doc_chunks: chunks tile every document exactly") {
    val chunks = SparkEntry.queries("q_doc_chunks")(spark, sf)
    val docs = Tables.documents(spark, sf).select($"doc_id",
      size(split(lower($"text"), "\\s+")).cast("long").as("n_tokens"))
    // per doc: starts are 1,49,97,…; the last chunk must reach the end
    val agg = chunks.groupBy($"doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max($"chunk_id" * 48 + $"n_chunk_tokens").as("covered"),
      min($"n_chunk_tokens").as("min_ct"),
      max($"n_chunk_tokens").as("max_ct"))
    val joined = agg.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("covered") === r.getAs[Long]("n_tokens"),
        s"doc ${r.getAs[Long]("doc_id")} not fully tiled")
      assert(r.getAs[Long]("max_ct") <= 64L)
    }
    // overlap really is 16 tokens: chunk i starts 48 past chunk i-1
    val twoPlus = joined.filter(_.getAs[Long]("n_chunks") > 1)
    assert(twoPlus.nonEmpty, "fixture has no multi-chunk docs")
  }

  test("q_calendar_fill: contiguous per-series spine, gaps zero-filled " +
      "and genuinely present") {
    val rows = SparkEntry.queries("q_calendar_fill")(spark, sf).collect()
    assert(rows.exists(_.getAs[Boolean]("was_gap")),
      "fixture produced no gaps — densification is vacuous")
    rows.foreach { r =>
      val gap = r.getAs[Boolean]("was_gap")
      val n = r.getAs[Long]("n_events")
      assert(gap === (n == 0L), "was_gap must mirror n_events == 0")
    }
    // the spine is contiguous: per series, row count == hour span
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val hrs = rs.map(_.getAs[Long]("hr_us"))
      val span = (hrs.max - hrs.min) / 3600000000L + 1
      assert(rs.length.toLong === span, "spine has holes or duplicates")
    }
  }

  test("q_perplexity: every multi-token doc scored, xent positive") {
    val out = SparkEntry.queries("q_perplexity")(spark, sf)
    val expected = Tables.documents(spark, sf)
      .filter(size(split(lower($"text"), "\\s+")) >= 2).count()
    assert(out.count() === expected)
    out.collect().foreach { r =>
      assert(r.getAs[Double]("xent_nats") > 0.0)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
  }

  test("q_autocorr: moment form equals Spark's corr() over the same pairs") {
    val rows = SparkEntry.queries("q_autocorr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day".asc)
    val ref = daily
      .withColumn("x_prev", lag($"x", 1).over(w))
      .withColumn("day_prev", lag($"day", 1).over(w))
      .filter($"x_prev".isNotNull && datediff($"day", $"day_prev") === 1)
      .groupBy($"event_type").agg(corr($"x", $"x_prev").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ac = r.getAs[Long]("autocorr_e6") / 1e6
      assert(ac >= -1.0 && ac <= 1.0)
      assert(math.abs(ac - ref(r.getAs[String]("event_type"))) < 1e-4,
        s"moment autocorr diverges from corr() for ${r.getString(0)}")
    }
  }

  test("q_seasonality: day-weighted indices average to exactly 1 per series") {
    val rows = SparkEntry.queries("q_seasonality")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, dws) =>
      assert(dws.length <= 7)
      assert(dws.map(_.getAs[Long]("dow")).distinct.length === dws.length)
      val nAll = dws.map(_.getAs[Long]("n_days")).sum
      // Σ n_dow · index = n_all  (the weighted indices must rebuild the mean)
      val weighted = dws.map(r =>
        r.getAs[Long]("n_days") * r.getAs[Double]("seasonal_index")).sum
      assert(math.abs(weighted - nAll) < 1e-6 * nAll)
      dws.foreach(r => assert(r.getAs[Double]("seasonal_index") > 0.0))
    }
  }

  test("q_cusum_drift: one interior argmax per series, consistent cells") {
    val rows = SparkEntry.queries("q_cusum_drift")(spark, sf).collect()
    val nSeries = Tables.events(spark, sf)
      .select($"event_type").distinct().count()
    assert(rows.length === nSeries)
    rows.foreach { r =>
      assert(r.getAs[Long]("abs_cusum") ===
        math.abs(r.getAs[Long]("cusum_scaled")))
      val idx = r.getAs[Long]("day_index")
      assert(idx >= 1L && idx <= r.getAs[Long]("n_all"))
    }
  }

  test("q_class_weights: balanced weights rebuild the corpus size") {
    val rows = SparkEntry.queries("q_class_weights")(spark, sf).collect()
    val n = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    assert(rows.head.getAs[Long]("k_classes") === rows.length.toLong)
    // Σ n_c · weight_c = N for the sklearn "balanced" convention
    val weighted = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("weight")).sum
    assert(math.abs(weighted - n) < 1e-6 * n)
  }

  test("q_dp_histogram: noise replays the Laplace inverse CDF exactly, " +
      "counts partition the table, |noise| bounded by b*ln(1e5)") {
    val rows = SparkEntry.queries("q_dp_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_true")).sum ===
      Tables.events(spark, sf).count())
    rows.foreach { r =>
      val u01 = (r.getAs[Long]("u") + 0.5) / 100000.0
      val noise = if (u01 >= 0.5) -math.log(1.0 - 2.0 * (u01 - 0.5))
        else math.log(1.0 - 2.0 * (0.5 - u01))
      assert(r.getAs[Long]("noisy_e3") ===
        math.floor((r.getAs[Long]("n_true") + noise) * 1000.0).toLong)
      // inverse-CDF range: |noise| ≤ b·ln(1e5) on the 1e-5 grid
      assert(math.abs(noise) <= math.log(100000.0) + 1e-9)
    }
    // the uniforms really spread (not all on one side of the median)
    val signs = rows.map(r => (r.getAs[Long]("u") + 0.5) / 100000.0 >= 0.5)
    assert(signs.contains(true) && signs.contains(false))
  }

  test("q_k_anonymity: classes partition the table; l bounded by k") {
    val rows = SparkEntry.queries("q_k_anonymity")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k")).sum ===
      Tables.customer(spark, sf).count())
    rows.foreach { r =>
      val (k, l) = (r.getAs[Long]("k"), r.getAs[Long]("l_div"))
      assert(k >= 1L && l >= 1L && l <= k)
      assert(r.getAs[Boolean]("anonymous") === (k >= 5L))
      // band arithmetic: shifted-positive division keeps bands in range
      val band = r.getAs[Long]("bal_band")
      assert(band >= 0L && band <= 10L, s"band out of range: $band")
    }
  }

  test("q_ks_test matches an independent exact KS recompute per type") {
    val got = SparkEntry.queries("q_ks_test")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("ks_num"), r.getAs[Long]("ks_den"))).toMap
    // brute recompute from raw rows (sf0.001 is small enough)
    val raw = Tables.events(spark, sf)
      .select($"event_type", ($"value".cast("decimal(18,2)") * 100)
        .cast("long").as("cents"), ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull) // mirror the query's null policy
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = raw.groupBy(_._1).map { case (typ, rows) =>
      val ref = rows.filter(_._3).map(_._2).sorted
      val cur = rows.filterNot(_._3).map(_._2).sorted
      val (nR, nC) = (ref.length.toLong, cur.length.toLong)
      val ksNum = rows.map(_._2).distinct.map { t =>
        val cr = ref.count(_ <= t).toLong
        val cc = cur.count(_ <= t).toLong
        math.abs(cr * nC - cc * nR)
      }.max
      typ -> ((nR, nC, ksNum, nR * nC))
    }
    assert(got === want)
    // and the statistic is a valid probability-scale difference
    got.values.foreach { case (_, _, num, den) =>
      assert(num >= 0L && num <= den)
    }
  }

  test("q_median_ci: median and CI endpoints are exact order " +
      "statistics at the sign-test ranks, and the interval brackets " +
      "the median") {
    val got = SparkEntry.queries("q_median_ci")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("med_rank"),
          r.getAs[Long]("lo_rank"), r.getAs[Long]("hi_rank"),
          r.getAs[Long]("median_cents"), r.getAs[Long]("ci_lo_cents"),
          r.getAs[Long]("ci_hi_cents")))).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .as[(String, Long)].collect()
    val want = raw.groupBy(_._1).map { case (typ, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length.toLong
      val med = (n + 1) / 2
      val lo = math.max(1L,
        math.floor((n.toDouble - 1.96 * math.sqrt(n.toDouble)) / 2.0)
          .toLong)
      val hi = math.min(n, n + 1 - lo)
      typ -> ((n, med, lo, hi, xs((med - 1).toInt), xs((lo - 1).toInt),
        xs((hi - 1).toInt)))
    }
    assert(got === want)
    got.values.foreach { case (_, _, lo, hi, med, cl, ch) =>
      assert(lo <= hi)
      assert(cl <= med && med <= ch,
        "CI must bracket the point estimate")
    }
  }

  test("q_dtw_distance: the codegen DP replays a brute Scala DTW, " +
      "and the kernel satisfies the metric sanity properties") {
    val got = SparkEntry.queries("q_dtw_distance")(spark, sf).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("dtw_cents")))).toMap
    assert(got.size === 10) // C(5,2) type pairs
    def dtwRef(x: Array[Long], y: Array[Long]): Long = {
      val Inf = graft.ext.DtwExpr.Inf
      val prev = Array.fill(y.length + 1)(Inf)
      prev(0) = 0L
      for (i <- 1 to x.length) {
        val curr = Array.fill(y.length + 1)(Inf)
        for (j <- 1 to y.length) {
          val cost = math.abs(x(i - 1) - y(j - 1))
          curr(j) = cost +
            math.min(prev(j), math.min(curr(j - 1), prev(j - 1)))
        }
        Array.copy(curr, 0, prev, 0, y.length + 1)
      }
      prev(y.length)
    }
    val series = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    got.foreach { case ((ta, tb), (na, nb, dtw)) =>
      assert(na === series(ta).length.toLong)
      assert(nb === series(tb).length.toLong)
      assert(dtw === dtwRef(series(ta), series(tb)), s"$ta/$tb")
      // symmetry and identity of the kernel itself
      assert(dtw === dtwRef(series(tb), series(ta)))
      assert(dtwRef(series(ta), series(ta)) === 0L)
    }
    // interpreted eval matches codegen (the DataFrame path) on a
    // small frame where both are forced
    val df = Seq((Seq(1L, 5L, 9L), Seq(1L, 9L)))
      .toDF("x", "y")
    val viaExpr = df.select(
      graft.ext.DtwExpr.dtw($"x", $"y").as("d")).head().getLong(0)
    assert(viaExpr === dtwRef(Array(1L, 5L, 9L), Array(1L, 9L)))
    assert(viaExpr === 4L) // |5-1| or |5-9| is the only off-path cost
  }

  test("q_var_cvar: the 5% tail order statistics replay from a brute " +
      "day-delta sort and CVaR never exceeds VaR") {
    val got = SparkEntry.queries("q_var_cvar")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("k_tail"),
          r.getAs[Long]("var_cents"), r.getAs[Long]("tail_sum_cents"),
          r.getAs[Long]("cvar_cents")))).toMap
    val daily = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).collect {
      case (typ, rows) if rows.length >= 2 =>
        val deltas = rows.sortBy(_._2).map(_._3)
          .sliding(2).map(p => p(1) - p(0)).toArray.sorted
        val n = deltas.length.toLong
        val k = ((n + ops.StatsQueries.VarTailDen - 1) /
          ops.StatsQueries.VarTailDen).toInt
        val tail = deltas.take(k)
        val ts = tail.sum
        val cvar = if (ts >= 0) ts / k else -((-ts) / k)
        typ -> ((n, k.toLong, deltas(k - 1), ts, cvar))
    }
    assert(got === want)
    got.values.foreach { case (_, _, varC, _, cvarC) =>
      assert(cvarC <= varC, "expected shortfall must be <= VaR")
    }
  }

  test("q_cvm_test matches an exact tie-aware Cramér–von Mises " +
      "recompute per type and caps at the theoretical maximum") {
    val got = SparkEntry.queries("q_cvm_test")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("cvm_e6"), r.getAs[Boolean]("drift_5pct"))))
      .toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", ($"value".cast("decimal(18,2)") * 100)
        .cast("long").as("cents"), ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = raw.groupBy(_._1).collect {
      case (typ, rows)
          if rows.exists(_._3) && rows.exists(!_._3) =>
        val ref = rows.filter(_._3).map(_._2)
        val cur = rows.filterNot(_._3).map(_._2)
        val (m, n) = (BigInt(ref.length), BigInt(cur.length))
        val num = rows.map(_._2).distinct.map { t =>
          val g = BigInt(rows.count(_._2 == t))
          val d = BigInt(ref.count(_ <= t)) * n -
            BigInt(cur.count(_ <= t)) * m
          g * d * d
        }.sum
        val den = (m + n) * (m + n) * m * n
        val e6 = num * 1000000 / den
        typ -> ((m.toLong, n.toLong, e6.toLong, e6 >= 461000))
    }
    assert(got === want)
    // T <= mn/N <= N/4 by construction; e6 stays under that cap
    got.foreach { case (typ, (m, n, e6, _)) =>
      assert(e6 >= 0L && e6 <= (m * n * 1000000L) / (m + n), typ)
    }
  }

  test("q_qte: arm quantiles are exact type-1 order statistics and " +
      "the gaps replay from a brute sort") {
    val rows = SparkEntry.queries("q_qte")(spark, sf).collect()
      .map(r => r.getAs[Long]("p") ->
        ((r.getAs[Long]("n_treated"), r.getAs[Long]("n_control"),
          r.getAs[Long]("q_treated"), r.getAs[Long]("q_control"),
          r.getAs[Long]("qte_cents")))).toMap
    assert(rows.keySet === Set(25L, 50L, 75L))
    val raw = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(($"user_id" % 2 === 1).as("treated"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(Boolean, Long)].collect()
    val t = raw.filter(_._1).map(_._2).sorted
    val c = raw.filterNot(_._1).map(_._2).sorted
    def q1(xs: Array[Long], p: Long): Long = {
      // min v with 100·|{x <= v}| >= p·n == order stat at ceil(pn/100)
      val k = ((p * xs.length + 99) / 100).toInt
      xs(k - 1)
    }
    rows.foreach { case (p, (nt, nc, qt, qc, gap)) =>
      assert(nt === t.length.toLong && nc === c.length.toLong)
      assert(qt === q1(t, p), s"p$p treated")
      assert(qc === q1(c, p), s"p$p control")
      assert(gap === qt - qc)
    }
    // monotone: higher p never gives a smaller quantile
    assert(rows(25L)._3 <= rows(50L)._3 && rows(50L)._3 <= rows(75L)._3)
    assert(rows(25L)._4 <= rows(50L)._4 && rows(50L)._4 <= rows(75L)._4)
  }

  test("q_mann_whitney matches an exact midrank recompute and the " +
      "U_ref + U_cur identity") {
    val got = SparkEntry.queries("q_mann_whitney")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("u2_ref"), r.getAs[Long]("u2_den"))).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", ($"value".cast("decimal(18,2)") * 100)
        .cast("long").as("cents"), ($"event_id" % 2 === 0).as("is_ref"))
      .filter($"cents".isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = raw.groupBy(_._1).map { case (typ, rows) =>
      val all = rows.map(_._2).sorted
      // 2×midrank of value v = 2·(#strictly below) + (#ties) + 1
      def midrank2(v: Long): Long =
        2L * all.count(_ < v) + all.count(_ == v) + 1
      val refs = rows.filter(_._3).map(_._2)
      val (nR, nC) = (refs.length.toLong, (rows.length - refs.length).toLong)
      val w2 = refs.map(midrank2).sum
      typ -> ((nR, nC, w2 - nR * (nR + 1), 2L * nR * nC))
    }
    assert(got === want)
    // U_ref + U_cur = n_ref·n_cur ⇒ 0 ≤ u2_ref ≤ u2_den
    got.values.foreach { case (_, _, u2, den) =>
      assert(u2 >= 0L && u2 <= den)
    }
  }

  test("q_rolling_corr matches a brute windowed-moment recompute, " +
      "correlations stay in [-1, 1], and the result is partition-" +
      "count invariant") {
    def collectCorr(): Map[(String, String, String),
        (Long, Long, Long, Long, Long, Long)] =
      SparkEntry.queries("q_rolling_corr")(spark, sf).collect()
        .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
          r.getAs[java.sql.Date]("day").toString) ->
          (r.getAs[Long]("n_w"), r.getAs[Long]("num"), r.getAs[Long]("vx"),
            r.getAs[Long]("vy"), r.getAs[Long]("corr_defined"),
            r.getAs[Long]("corr_e3"))).toMap
    val got = collectCorr()
    // the measure column is NON-nullable by construction (r12: the
    // degenerate windows carry the -2000 sentinel, never NULL)
    assert(!SparkEntry.queries("q_rolling_corr")(spark, sf)
      .schema("corr_e3").nullable,
      "corr_e3 must be non-nullable (sentinel, not NULL)")
    // all 10 unordered type pairs appear
    assert(got.keys.map(k => (k._1, k._2)).toSet.size === 10)
    // brute: daily totals -> per-pair day-sorted series -> 7-row frames
    val daily = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val types = byType.keys.toSeq.sorted
    val want = (for {
      ta <- types; tb <- types if ta < tb
      days = (byType(ta).keySet intersect byType(tb).keySet).toSeq.sorted
      (day, i) <- days.zipWithIndex
    } yield {
      val frame = days.slice(math.max(0, i - 6), i + 1)
      val xs = frame.map(byType(ta))
      val ys = frame.map(byType(tb))
      val n = frame.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      val (num, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)
      // INDEPENDENT exact floor: linear scan for the unique integer k
      // in [-1000, 1000] with k <= num*1e3/sqrt(vx*vy) < k+1, decided
      // purely in BigInt (no doubles anywhere — the stronger oracle
      // than replaying the query's bit-descent tree)
      val (defined, corrE3) = if (vx > 0 && vy > 0) {
        val p = BigInt(vx) * BigInt(vy)
        val a2 = BigInt(num) * BigInt(num) * 1000000
        def leq(m: Long): Boolean =
          if (num >= 0 && m <= 0) true
          else if (num < 0 && m >= 0) false
          else if (num >= 0) BigInt(m) * BigInt(m) * p <= a2
          else BigInt(m) * BigInt(m) * p >= a2
        (1L, (-1000L to 1000L).takeWhile(leq).last)
      } else (0L, -2000L)
      (ta, tb, day) -> ((n, num, vx, vy, defined, corrE3))
    }).toMap
    // exact match cell-for-cell, fixed-point correlation included
    assert(got === want)
    got.values.foreach { case (nw, _, vx, vy, defined, corr) =>
      assert(nw >= 1 && nw <= ops.StatsQueries.RollCorrWindow)
      assert(vx >= 0 && vy >= 0, "window variance terms are nonnegative")
      if (defined == 1L) assert(corr >= -1000L && corr <= 1000L)
      else assert(corr === -2000L, "undefined rows carry the sentinel")
    }
    // |corr| = 1 windows exist in the data (every pair's 2-point
    // frame is collinear) — the exact-tie rows that flipped the
    // round-9/round-10 floating floor MUST be pinned at the grid edge
    assert(want.values.exists { case (_, _, _, _, d, c) =>
      d == 1L && (c == 1000L || c == -1000L) },
      "expected at least one exactly-collinear window")
    // the moments twin is the corr pipeline truncated before the
    // search: cell-identical through num/vx/vy
    val twin = SparkEntry.queries("q_rolling_moments")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n_w"), r.getAs[Long]("num"), r.getAs[Long]("vx"),
          r.getAs[Long]("vy"))).toMap
    assert(twin === got.map { case (k, v) =>
      k -> ((v._1, v._2, v._3, v._4)) })
    // determinism pin (the round-9 red row was boundary-flaky): the
    // fixed-point result must not depend on physical partitioning
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "7")
      assert(collectCorr() === got,
        "corr_e3 changed under a different shuffle-partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q_bootstrap_ci: band brackets the observed mean, replicate " +
      "count is exact, and a replicate-0 recompute matches") {
    val got = SparkEntry.queries("q_bootstrap_ci")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_replicates"), r.getAs[Long]("sum_w_all"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))).toMap
    assert(got.nonEmpty)
    val b = ops.StatsQueries.BootstrapReplicates
    val raw = Tables.events(spark, sf)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def weight(id: Long, rep: Long): Long = {
      val u = ((id + rep * 1000003L) * 2654435761L) % 4294967296L % 100000L
      if (u < 36788L) 0L else if (u < 73576L) 1L else if (u < 91970L) 2L
      else if (u < 98101L) 3L else if (u < 99634L) 4L else 5L
    }
    raw.groupBy(_._1).foreach { case (typ, rows) =>
      val (nr, sumW, lo, hi) = got(typ)
      assert(nr === b.toLong)
      assert(lo <= hi)
      // the true mean sits inside the (wider) min..max replicate band,
      // and a from-scratch fold of every replicate reproduces the
      // 2nd-order statistics exactly
      val means = (0 until b).map { rep =>
        val ws = rows.map { case (_, id, c) => (weight(id, rep), c) }
        val nw = ws.map(_._1).sum
        ws.map { case (w, c) => w * c }.sum.toDouble / nw
      }.sorted
      assert(lo === means(1) && hi === means(b - 2))
      val wantSumW = (0 until b).flatMap(rep =>
        rows.map { case (_, id, _) => weight(id, rep) }).sum
      assert(sumW === wantSumW)
      val trueMean = rows.map(_._3).sum.toDouble / rows.length
      assert(trueMean >= means.head && trueMean <= means.last,
        s"$typ: observed mean outside the full replicate range")
    }
  }

  test("q_lateness_profile: buckets partition every event and a brute " +
      "per-user high-water-mark replay matches") {
    val got = SparkEntry.queries("q_lateness_profile")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("bucket")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("max_late_us"))).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", $"user_id", $"event_id",
        unix_micros($"ts").as("ts_us"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def bucket(late: Long): String =
      if (late == 0L) "0_on_time" else if (late <= 1000000L) "1_le_1s"
      else if (late <= 60000000L) "2_le_1min"
      else if (late <= 600000000L) "3_le_10min" else "4_beyond"
    val want = raw.groupBy(t => (t._1, t._2)).toSeq.flatMap {
      case ((typ, _), rows) =>
        var hwm = Long.MinValue
        rows.sortBy(_._3).map { case (_, _, _, ts) =>
          hwm = math.max(hwm, ts)
          (typ, bucket(hwm - ts), hwm - ts)
        }
    }.groupBy(t => (t._1, t._2)).view
      .mapValues(v => (v.size.toLong, v.map(_._3).max)).toMap
    assert(got === want)
    assert(got.map(_._2._1).sum === raw.length.toLong,
      "buckets partition the event table")
    // the synthetic corpus is fully in-order, so the catalog binding
    // certifies exactly that — every row in 0_on_time
    assert(got.keys.map(_._2).toSet === Set("0_on_time"))
  }

  test("lateness profile: a constructed disordered stream exercises " +
      "every bucket with exact boundary values") {
    // per-user arrival sequences with known high-water-mark gaps,
    // including both boundary sides of every bucket edge
    val rows = Seq(
      // user 1: hwm jumps to 100s, then late arrivals at each edge
      ("a", 1L, 1L, 100000000L),            // on time (new hwm)
      ("a", 1L, 2L, 100000000L - 1000000L), // exactly 1s late
      ("a", 1L, 3L, 100000000L - 1000001L), // 1s+1us -> le_1min
      ("a", 1L, 4L, 100000000L - 60000000L),  // exactly 1min
      ("a", 1L, 5L, 40000000L),             // 60s+... -> le_1min edge
      ("a", 1L, 6L, 100000000L),            // ties hwm: on time
      // user 2 (same type): independent hwm — big disorder
      ("a", 2L, 1L, 700000000L),
      ("a", 2L, 2L, 700000000L - 600000000L),  // exactly 10min
      ("a", 2L, 3L, 700000000L - 600000001L),  // beyond
      // type b: strictly increasing, all on time
      ("b", 3L, 1L, 1L), ("b", 3L, 2L, 2L))
      .toDF("event_type", "user_id", "event_id", "ts_us")
    val got = ops.StatsQueries.latenessProfileOn(rows).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("bucket")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("max_late_us"))).toMap
    assert(got === Map(
      ("a", "0_on_time") -> ((3L, 0L)),
      ("a", "1_le_1s") -> ((1L, 1000000L)),
      ("a", "2_le_1min") -> ((3L, 60000000L)),
      ("a", "3_le_10min") -> ((1L, 600000000L)),
      ("a", "4_beyond") -> ((1L, 600000001L)),
      ("b", "0_on_time") -> ((2L, 0L))))
  }

  test("q_conversion_hazard matches a brute per-user survival replay " +
      "with correct censoring") {
    val got = SparkEntry.queries("q_conversion_hazard")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
          r.getAs[Long]("n_cens"), r.getAs[Long]("hazard_e6"))).toMap
    assert(got.nonEmpty)
    // collect epoch micros + the Spark-side UTC date string so the
    // brute never touches the JVM default timezone
    val raw = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        $"ts".cast("date").cast("string").as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        java.time.LocalDate.parse(r.getString(3))))
    val endDay = raw.maxBy(_._3)._4
    val byUser = raw.groupBy(_._1)
    val exits = byUser.toSeq.flatMap { case (_, evs) =>
      val signups = evs.filter(_._2 == "signup")
      if (signups.isEmpty) None
      else {
        val s = signups.minBy(_._3)
        val conv = evs.filter(e => e._2 == "purchase" && e._3 >= s._3)
        if (conv.nonEmpty) {
          val c = conv.minBy(_._3)
          Some((java.time.temporal.ChronoUnit.DAYS.between(s._4, c._4),
            true))
        } else Some((java.time.temporal.ChronoUnit.DAYS.between(
          s._4, endDay), false))
      }
    }
    val n = exits.size.toLong
    val want = exits.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, xs) =>
        val exitedBefore = exits.count(_._1 < t).toLong
        val nConv = xs.count(_._2).toLong
        (t, n - exitedBefore, nConv, xs.count(!_._2).toLong,
          if (nConv > 0) Some(nConv * 1000000L / (n - exitedBefore))
          else None)
    }.collect { case (t, risk, conv, cens, Some(h)) =>
      t -> ((risk, conv, cens, h))
    }.toMap
    assert(got === want)
    // risk sets are non-increasing in t and hazards are probabilities
    val ts = got.keys.toSeq.sorted
    ts.zip(ts.tail).foreach { case (a, b) =>
      assert(got(a)._1 >= got(b)._1)
    }
    got.values.foreach { case (risk, conv, _, h) =>
      assert(conv <= risk && h >= 0L && h <= 1000000L)
    }
  }

  test("q_ewma_binary: exact binary-decay fold, denominator 2^n - 1, " +
      "and day-one passthrough") {
    val got = SparkEntry.queries("q_ewma_binary")(spark, sf).cache()
    // denominator is always 2^n_window − 1 and num/den stays within
    // the window's min..max daily total (a weighted mean must)
    assert(got.filter(
      $"ewma_den" =!= expr("shiftleft(1L, cast(n_window as int)) - 1L"))
      .count() === 0)
    // brute recompute of the fold per (type, day)
    val daily = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("day_cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(t => t._2 -> t._3)).toMap
    val want = byType.flatMap { case (typ, series) =>
      series.indices.map { i =>
        val lastK = series.slice(math.max(0, i - ops.StatsQueries.EwmaWindow + 1),
          i + 1).map(_._2)
        val num = lastK.foldLeft(0L)((acc, x) => acc * 2 + x)
        (typ, series(i)._1) -> num
      }
    }
    val gotNums = got.collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString)
        -> r.getAs[Long]("ewma_num")).toMap
    assert(gotNums === want)
    got.unpersist()
  }

  test("q_holt_linear: exact rational (level, trend) fold replay; " +
      "denominator 8^(n-1), day-one passthrough") {
    val got = SparkEntry.queries("q_holt_linear")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n_window"), r.getAs[Long]("forecast_num"),
          r.getAs[Long]("forecast_den"), r.getAs[Long]("forecast_cents")))
      .toMap
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("day_cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(t => t._2 -> t._3)).toMap
    byType.foreach { case (typ, series) =>
      series.indices.foreach { i =>
        val lastK = series.slice(
          math.max(0, i - ops.StatsQueries.HoltWindow + 1), i + 1)
          .map(_._2)
        var (l, b, dd) = (lastK.head, 0L, 1L)
        lastK.tail.foreach { x =>
          val (l2, b2) = (4 * (dd * x + l + b), dd * x - l + 7 * b)
          l = l2; b = b2; dd = 8 * dd
        }
        val (nW, num, den, cents) = got((typ, series(i)._1))
        assert(nW === lastK.size.toLong)
        assert(num === l + b, s"$typ day $i")
        assert(den === dd)
        assert(cents === math.floor((l + b).toDouble / dd).toLong)
        // day one: no smoothing yet — forecast IS the day total
        if (i == 0) assert(num === series(i)._2 && den === 1L)
      }
    }
  }

  test("q_pacf: Durbin-Levinson replay from exact sums; pacf1 == r1; " +
      "values bounded") {
    val got = SparkEntry.queries("q_pacf")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.size
      val mm = xs.sum.toDouble / n
      val c0 = (xs.map(x => x * x).sum.toDouble -
        xs.sum.toDouble * mm) / n
      def rk(k: Int): Double = {
        val sxy = xs.dropRight(k).zip(xs.drop(k))
          .map { case (a, b) => a * b }.sum
        val sa = xs.dropRight(k).sum
        val sb = xs.drop(k).sum
        (sxy.toDouble - mm * (sa + sb) + (n - k) * mm * mm) / n / c0
      }
      val (r1, r2, r3) = (rk(1), rk(2), rk(3))
      val p11 = r1
      val den2 = 1.0 - r1 * p11
      val p22 = (r2 - p11 * r1) / den2
      val p21 = p11 - p22 * p11
      val den3 = 1.0 - (p21 * r1 + p22 * r2)
      val p33 = (r3 - (p21 * r2 + p22 * r1)) / den3
      val r = got(t)
      assert(r.getAs[Long]("n_days") === n.toLong)
      assert(r.getAs[Long]("r1_e6") === math.floor(r1 * 1e6).toLong)
      assert(r.getAs[Long]("r2_e6") === math.floor(r2 * 1e6).toLong)
      assert(r.getAs[Long]("r3_e6") === math.floor(r3 * 1e6).toLong)
      assert(r.getAs[Long]("pacf2_e6") === math.floor(p22 * 1e6).toLong)
      assert(r.getAs[Long]("pacf3_e6") === math.floor(p33 * 1e6).toLong)
      // autocorrelations of a real series stay inside [-1, 1]
      Seq("r1_e6", "r2_e6", "r3_e6").foreach(c =>
        assert(math.abs(r.getAs[Long](c)) <= 1000001L))
    }
  }

  test("q_nelson_aalen: cumulative sums of the hazard cells, keeps " +
      "censoring-only offsets, curve monotone, risk sets decreasing") {
    val na = SparkEntry.queries("q_nelson_aalen")(spark, sf)
      .collect().sortBy(_.getAs[Long]("t"))
    assert(na.nonEmpty)
    // the hazard table (independently spec'd) must be the subset of
    // NA rows with conversions, cell for cell
    val hz = SparkEntry.queries("q_conversion_hazard")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
          r.getAs[Long]("n_cens"))).toMap
    val naConv = na.filter(_.getAs[Long]("n_conv") > 0)
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
          r.getAs[Long]("n_cens"))).toMap
    assert(naConv === hz)
    // NA must also carry at least the censoring-only offsets (the
    // observation-end bucket is always one)
    assert(na.length >= hz.size)
    // replay the two cumulative curves from the per-row cells
    var cumNa = 0L
    var cumVar = 0L
    var prevRisk = Long.MaxValue
    na.foreach { r =>
      val risk = r.getAs[Long]("n_risk")
      val conv = r.getAs[Long]("n_conv")
      cumNa += conv * 1000000L / risk
      cumVar += conv * 1000000000L / (risk * risk)
      assert(r.getAs[Long]("na_e6") === cumNa)
      assert(r.getAs[Long]("na_var_e9") === cumVar)
      assert(risk <= prevRisk, "risk sets must be non-increasing")
      prevRisk = risk
    }
  }

  test("q_fdr_bh: p-values replay from exact moment sums, step-up " +
      "rejection is downward closed at the BH threshold") {
    val got = SparkEntry.queries("q_fdr_bh")(spark, sf).collect()
    assert(got.length >= 10, "expected a real test family")
    // brute: per (type, ISO week, arm) moments in exact cents
    val raw = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", weekofyear($"ts").as("week"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_a"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getBoolean(3))))
      .groupBy(_._1)
    val wantP = raw.flatMap { case (k, xs) =>
      val a = xs.filter(_._2._2).map(_._2._1)
      val b = xs.filterNot(_._2._2).map(_._2._1)
      if (a.length < 2 || b.length < 2) None
      else {
        val (na, nb) = (a.length.toDouble, b.length.toDouble)
        val (sa, sb) = (a.sum, b.sum)
        val (ssa, ssb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
        val va = (ssa - sa.toDouble * sa / na) / (na - 1)
        val vb = (ssb - sb.toDouble * sb / nb) / (nb - 1)
        val az = math.abs((sa / na - sb / nb) / math.sqrt(va / na + vb / nb))
        val t = 1.0 / (1.0 + 0.2316419 * az)
        val phi = math.exp(-az * az / 2.0) * 0.3989422804014327
        val poly = t * (0.319381530 + t * (-0.356563782 + t *
          (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
        Some(k -> math.floor(phi * poly * 2000000.0).toLong)
      }
    }
    val gotP = got.map(r => (r.getAs[String]("event_type"),
      r.getAs[Int]("week")) -> r.getAs[Long]("p_e6")).toMap
    assert(gotP === wantP)
    // BH step-up: k = max rank with p_e6·m ≤ 50000·rank; rejection is
    // exactly ranks 1..k (downward closed)
    val m = got.length.toLong
    val byRank = got.sortBy(_.getAs[Long]("rank"))
    val k = byRank.filter(r => r.getAs[Long]("p_e6") * m <=
      50000L * r.getAs[Long]("rank"))
      .map(_.getAs[Long]("rank")).maxOption.getOrElse(0L)
    byRank.foreach { r =>
      assert(r.getAs[Boolean]("rejected") === (r.getAs[Long]("rank") <= k))
    }
    // ranks are a permutation of 1..m ordered by p
    assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to m))
    assert(byRank.map(_.getAs[Long]("p_e6")).toSeq.sliding(2).forall(
      s => s.length < 2 || s(0) <= s(1)))
  }

  test("q_theil_sen: exact pairwise-slope median replay, " +
      "median slope within the pairwise slope range") {
    val got = SparkEntry.queries("q_theil_sen")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_e4"),
          r.getAs[Long]("intercept_e4"))).toMap
    assert(got.size === 5)
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    daily.foreach { case (ty, xs) =>
      val byDay = xs.groupBy(_._2).map { case (d, ys) =>
        (java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse("2024-01-01"),
          java.time.LocalDate.parse(d)), ys.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      val pairs = for {
        (xa, ca) <- byDay; (xb, cb) <- byDay if xa < xb
      } yield (cb - ca).toDouble / (xb - xa).toDouble
      val m = medianOf(pairs)
      val icept = medianOf(byDay.map { case (x, c) => c.toDouble - m * x })
      val (nPairs, slopeE4, iceptE4) = got(ty)
      assert(nPairs === pairs.length.toLong)
      assert(slopeE4 === math.floor(m * 10000.0).toLong)
      assert(iceptE4 === math.floor(icept * 10000.0).toLong)
      // the median slope must sit inside the pairwise slope range
      assert(m >= pairs.min && m <= pairs.max)
    }
  }

  test("q_stl_decompose: interior-day additive identity and exact " +
      "seasonal replay") {
    val got = SparkEntry.queries("q_stl_decompose")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // floor()ed components reassemble the exact series within the
      // two floor errors: cents·10⁴ = trend + seasonal + resid (+ε)
      val lhs = r.getAs[Long]("cents") * 10000L
      val rhs = r.getAs[Long]("trend_e4") +
        r.getAs[Long]("seasonal_e4") + r.getAs[Long]("resid_e4")
      assert(math.abs(lhs - rhs) <= 3L,
        s"additive identity broke: $lhs vs $rhs")
    }
    // brute seasonal replay for one type: day-of-week means of the
    // exact detrended series over interior days
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull && $"event_type" === "purchase")
      .select(to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val interior = daily.indices.filter(i =>
      i >= 3 && i + 3 < daily.length).map { i =>
      val sum7 = (i - 3 to i + 3).map(daily(_)._2).sum
      (daily(i)._1, daily(i)._2, sum7, 7L * daily(i)._2 - sum7)
    }
    val wantTrend = interior.map(x => x._1 -> x._3 * 10000L / 7L).toMap
    val gotP = got.filter(_.getAs[String]("event_type") == "purchase")
    assert(gotP.length === interior.length)
    gotP.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      assert(r.getAs[Long]("trend_e4") === wantTrend(day))
    }
  }

  test("q_lead_lag: exact moment replay at every lag, best-lag rule " +
      "deterministic") {
    val got = SparkEntry.queries("q_lead_lag")(spark, sf).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("corr_e6"),
          r.getAs[Boolean]("is_best"))).toMap
    assert(got.size === 15)
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).map { case (k, xs) =>
        k -> xs.map(_._3).sum
      }
    def series(t: String) = daily.collect {
      case ((ty, d), c) if ty == t => java.time.LocalDate.parse(d) -> c
    }.toMap
    val (cs, ps) = (series("click"), series("purchase"))
    val want = (-7L to 7L).map { l =>
      val pairs = cs.toSeq.flatMap { case (d, x) =>
        ps.get(d.plusDays(l)).map(y => (x, y))
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val corr = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble *
          (n * syy - sy * sy).toDouble)
      l -> (n, math.floor(corr * 1000000.0).toLong)
    }.toMap
    (-7L to 7L).foreach { l =>
      assert(got(l)._1 === want(l)._1, s"n at lag $l")
      assert(got(l)._2 === want(l)._2, s"corr at lag $l")
    }
    val bestLag = (-7L to 7L).minBy(l =>
      (-want(l)._2, math.abs(l), l))
    (-7L to 7L).foreach { l =>
      assert(got(l)._3 === (l == bestLag), s"is_best at lag $l")
    }
  }

  test("q_changepoint: argmax over all splits of the exact " +
      "between-segment sum of squares, earliest-day tiebreak") {
    val got = SparkEntry.queries("q_changepoint")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[java.sql.Date]("split_day").toString,
          r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
          r.getAs[Long]("mean_left_cents"),
          r.getAs[Long]("mean_right_cents"),
          r.getAs[Long]("gain_cents2"))).toMap
    assert(got.size === 5)
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val want = daily.map { case (ty, xs) =>
      val byDay = xs.groupBy(_._2).map { case (d, ys) =>
        d -> ys.map(_._3).sum
      }.toSeq.sortBy(_._1)
      val n = byDay.length.toLong
      val s = byDay.map(_._2).sum
      val cands = byDay.inits.toSeq.reverse.tail.init.map { prefix =>
        val k = prefix.length.toLong
        val sl = prefix.map(_._2).sum
        val gain = sl.toDouble * sl / k +
          (s - sl).toDouble * (s - sl) / (n - k) -
          s.toDouble * s / n
        (prefix.last._1, k, sl, math.floor(gain).toLong)
      }
      // deterministic earliest-day tiebreak: scan in day order
      val bestGain = cands.map(_._4).max
      val first = cands.find(_._4 == bestGain).get
      ty -> ((first._1, first._2, n - first._2, first._3 / first._2,
        (s - first._3) / (n - first._2), first._4))
    }
    want.foreach { case (ty, w) => assert(got(ty) === w, s"type $ty") }
  }

  test("q_kaplan_meier: ln-survival and Greenwood cells replay from " +
      "the risk table; curve agrees with q_nelson_aalen's risk sets") {
    val km = SparkEntry.queries("q_kaplan_meier")(spark, sf)
      .collect().sortBy(_.getAs[Long]("t"))
    assert(km.nonEmpty)
    // identical risk-set construction to NA, row for row
    val na = SparkEntry.queries("q_nelson_aalen")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
          r.getAs[Long]("n_cens"))).toMap
    assert(km.map(r => r.getAs[Long]("t") ->
      (r.getAs[Long]("n_risk"), r.getAs[Long]("n_conv"),
        r.getAs[Long]("n_cens"))).toMap === na)
    // replay the two cumulative columns cell by cell
    var lns = 0L
    var gw = 0L
    var absorbed = 0L
    km.foreach { r =>
      val risk = r.getAs[Long]("n_risk")
      val conv = r.getAs[Long]("n_conv")
      if (conv < risk) {
        lns += math.floor(math.log(
          (risk - conv).toDouble / risk) * 1e9).toLong
        gw += conv * 1000000000L / (risk * (risk - conv))
      } else absorbed = 1L
      assert(r.getAs[Long]("lns_e9") === lns)
      assert(r.getAs[Long]("gw_e9") === gw)
      assert(r.getAs[Long]("absorbed") === absorbed)
      // log-survival is non-increasing (survival is a product of
      // factors <= 1)
      assert(r.getAs[Long]("lns_e9") <= 0L)
    }
  }

  test("q_logrank_test: O-E and variance terms replay from the " +
      "two-cohort risk table; chi-square from the summed terms") {
    val row = SparkEntry.queries("q_logrank_test")(spark, sf)
      .collect().head
    // rebuild the per-offset two-cohort risk table brutally
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        $"ts".cast("date").cast("string").as("day"))
      .as[(Long, String, Long, String)].collect()
    def dayNum(d: String): Long =
      java.time.LocalDate.parse(d).toEpochDay
    val endDay = ev.map(e => dayNum(e._4)).max
    val byUser = ev.groupBy(_._1)
    val rows = byUser.toSeq.flatMap { case (uid, rs) =>
      val signups = rs.filter(_._2 == "signup")
      if (signups.isEmpty) None
      else {
        val sRow = signups.minBy(_._3)
        val conv = rs.filter(r => r._2 == "purchase" && r._3 >= sRow._3)
        val t =
          if (conv.nonEmpty) dayNum(conv.minBy(_._3)._4) - dayNum(sRow._4)
          else endDay - dayNum(sRow._4)
        Some((t, conv.nonEmpty, uid % 2 == 0))
      }
    }
    val ts = rows.map(_._1).distinct.sorted
    var n1 = rows.count(_._3).toLong
    var n2 = rows.count(!_._3).toLong
    var sumOe = 0L
    var sumV = 0L
    var o1 = 0L
    ts.foreach { t =>
      val here = rows.filter(_._1 == t)
      val d1 = here.count(r => r._3 && r._2).toLong
      val d2 = here.count(r => !r._3 && r._2).toLong
      val dd = d1 + d2
      val nn = n1 + n2
      if (dd > 0 && nn > 1) {
        o1 += d1
        sumOe += d1 * 1000000L - dd * n1 * 1000000L / nn
        sumV += math.floor(dd.toDouble * n1 * n2 * (nn - dd)
          / (nn.toDouble * nn * (nn - 1)) * 1e6).toLong
      }
      n1 -= here.count(_._3)
      n2 -= here.count(!_._3)
    }
    assert(row.getAs[Long]("o1") === o1)
    assert(row.getAs[Long]("sum_oe_e6") === sumOe)
    assert(row.getAs[Long]("sum_v_e6") === sumV)
    val chi2 = math.floor((sumOe / 1e6) * (sumOe / 1e6)
      / (sumV / 1e6) * 1e6).toLong
    assert(row.getAs[Long]("chi2_e6") === chi2)
  }

  test("q_ar2_forecast: Yule-Walker phis and the 3-step recursion " +
      "replay from the exact daily sums; stationarity sanity") {
    val daily = Tables.events(spark, sf)
      .select($"event_type", $"ts".cast("date").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("x"))
      .as[(String, String, Long)].collect()
    val got = SparkEntry.queries("q_ar2_forecast")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.sortBy(_._2).map(_._3)
      val n = xs.length
      val mm = xs.sum.toDouble / n
      val c0 = (xs.map(x => x * x).sum.toDouble - xs.sum.toDouble * mm) / n
      def r(k: Int): Double = {
        val sxy = xs.dropRight(k).zip(xs.drop(k)).map(p => p._1 * p._2).sum
        val sa = xs.dropRight(k).sum
        val sb = xs.drop(k).sum
        (sxy.toDouble - mm * (sa + sb) + (n - k) * mm * mm) / n / c0
      }
      val (r1, r2) = (r(1), r(2))
      val den = 1.0 - r1 * r1
      val phi1 = r1 * (1.0 - r2) / den
      val phi2 = (r2 - r1 * r1) / den
      val f1 = mm + phi1 * (xs(n - 1) - mm) + phi2 * (xs(n - 2) - mm)
      val f2 = mm + phi1 * (f1 - mm) + phi2 * (xs(n - 1) - mm)
      val f3 = mm + phi1 * (f2 - mm) + phi2 * (f1 - mm)
      val row = got(ty)
      // replay tolerance: the brute recompute associates the sums
      // differently than the engine's aggregate, so compare at the
      // e6 grid with a 1-unit slack rather than bit-exactly (the
      // ENGINE-vs-ENGINE exactness is what the DuckDB oracle pins)
      assert((row.getAs[Long]("phi1_e6") -
        math.floor(phi1 * 1e6).toLong).abs <= 1, s"$ty phi1")
      assert((row.getAs[Long]("phi2_e6") -
        math.floor(phi2 * 1e6).toLong).abs <= 1, s"$ty phi2")
      assert((row.getAs[Long]("f1_cents") -
        math.floor(f1).toLong).abs <= 1, s"$ty f1")
      assert((row.getAs[Long]("f2_cents") -
        math.floor(f2).toLong).abs <= 1, s"$ty f2")
      assert((row.getAs[Long]("f3_cents") -
        math.floor(f3).toLong).abs <= 1, s"$ty f3")
      // AR(2) stationarity of the fitted pair on real data
      val (p1, p2) = (row.getAs[Long]("phi1_e6") / 1e6,
        row.getAs[Long]("phi2_e6") / 1e6)
      assert(p2 > -1.01 && p2 + p1 < 1.01 && p2 - p1 < 1.01,
        s"$ty fitted AR(2) outside the stationary triangle")
    }
  }

  test("q_winsorize: rank bounds and clipped sum replay from a brute " +
      "sort; clipping never moves an interior value") {
    val base = Tables.events(spark, sf)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .as[(String, Long)].collect()
    val got = SparkEntry.queries("q_winsorize")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    base.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.length.toLong
      val lo = xs((math.max(1L, 5 * n / 100) - 1).toInt)
      val hi = xs((math.min(n, 95 * n / 100 + 1) - 1).toInt)
      val row = got(ty)
      assert(row.getAs[Long]("n") === n, s"$ty n")
      assert(row.getAs[Long]("lo") === lo, s"$ty lo")
      assert(row.getAs[Long]("hi") === hi, s"$ty hi")
      assert(row.getAs[Long]("n_clip_lo") === xs.count(_ < lo).toLong)
      assert(row.getAs[Long]("n_clip_hi") === xs.count(_ > hi).toLong)
      val winsSum = xs.map(x => math.max(lo, math.min(hi, x))).sum
      assert(row.getAs[Long]("wins_sum") === winsSum, s"$ty sum")
      assert(row.getAs[Long]("wins_mean_e2") === winsSum * 100 / n)
      // clipping is interior-preserving and bounded
      assert(lo <= hi, s"$ty bounds ordered")
      assert(row.getAs[Long]("n_clip_lo") + row.getAs[Long]("n_clip_hi")
        <= n / 5, s"$ty clips at most ~10% plus ties")
    }
  }

  test("q_logistic_irls: both Newton steps replay brutally " +
      "(floor-then-sum terms), and the fit beats the trivial model") {
    val rows = Tables.events(spark, sf)
      .select(($"event_type" === "purchase").cast("long").as("y"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_train"))
      .filter($"cents".isNotNull)
      .as[(Long, Long, Boolean)].collect()
    val train = rows.filter(_._3)
    val test = rows.filterNot(_._3)
    // step 1 at beta = 0 (exact integer sums)
    val n = train.length.toLong
    val sy = train.map(_._1).sum
    val sxC = train.map(_._2).sum
    val sxxC = train.map(c => c._2 * c._2).sum
    val sxyC = train.map(c => c._1 * c._2).sum
    val (sx, sxx, sxy) =
      (sxC.toDouble / 10000.0, sxxC.toDouble / 100000000.0,
        sxyC.toDouble / 10000.0)
    val g0 = sy - n / 2.0
    val g1 = sxy - sx / 2.0
    val det = n / 4.0 * (sxx / 4.0) - (sx / 4.0) * (sx / 4.0)
    val b0 = ((sxx / 4.0) * g0 - (sx / 4.0) * g1) / det
    val b1 = ((n / 4.0) * g1 - (sx / 4.0) * g0) / det
    // step 2 with per-row e9-floored terms
    var (sw, swx, swxx, sg0, sg1) = (0L, 0L, 0L, 0L, 0L)
    train.foreach { case (y, cents, _) =>
      val x = cents.toDouble / 10000.0
      val mu = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
      val w = mu * (1.0 - mu)
      sw += math.floor(w * 1e9).toLong
      swx += math.floor(w * x * 1e9).toLong
      swxx += math.floor(w * x * x * 1e9).toLong
      sg0 += math.floor((y - mu) * 1e9).toLong
      sg1 += math.floor((y - mu) * x * 1e9).toLong
    }
    val det2 = (sw.toDouble * swxx - swx.toDouble * swx) / 1e18
    val beta0 = b0 + (swxx.toDouble / 1e9 * (sg0.toDouble / 1e9)
      - swx.toDouble / 1e9 * (sg1.toDouble / 1e9)) / det2
    val beta1 = b1 + (sw.toDouble / 1e9 * (sg1.toDouble / 1e9)
      - swx.toDouble / 1e9 * (sg0.toDouble / 1e9)) / det2
    var sll = 0L
    test.foreach { case (y, cents, _) =>
      val x = cents.toDouble / 10000.0
      val eta = beta0 + beta1 * x
      sll += math.floor((y.toDouble * eta
        - math.log(1.0 + math.exp(eta))) * 1e9).toLong
    }
    val row = SparkEntry.queries("q_logistic_irls")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_train") === n)
    assert(row.getAs[Long]("n_test") === test.length.toLong)
    assert((row.getAs[Long]("beta0_e6") -
      math.floor(beta0 * 1e6).toLong).abs <= 1)
    assert((row.getAs[Long]("beta1_e6") -
      math.floor(beta1 * 1e6).toLong).abs <= 1)
    assert((row.getAs[Long]("neg_mean_ll_e9") -
      (-sll) / test.length).abs <= 2)
    // the fitted model must beat always-predict-base-rate on
    // held-out mean log-loss... at least not catastrophically lose:
    // the bound that matters for a 2-step Newton from zero is being
    // well inside the [0, ln 4] band where the sigmoid is informative
    val mll = row.getAs[Long]("neg_mean_ll_e9") / 1e9
    assert(mll > 0.0 && mll < 1.386, s"mean log-loss $mll out of band")
  }

  test("q_t_closeness: per-group EMD replays from a brute banded " +
      "CDF walk; t in [0,1] and a full-population group would be 0") {
    val base = Tables.customer(spark, sf)
      .select($"c_mktsegment", $"c_nationkey",
        (($"c_acctbal".cast("decimal(12,2)") * 100).cast("long")
          + 100000L).as("shifted"))
      .select($"c_mktsegment", $"c_nationkey",
        expr("shifted div 100000").as("band"))
      .as[(String, Long, Long)].collect()
    val bands = base.map(_._3).distinct.sorted
    val nAll = base.length.toLong
    val rng = bands.max - bands.min
    val globCum = bands.map(b =>
      b -> base.count(_._3 <= b).toLong).toMap
    val got = SparkEntry.queries("q_t_closeness")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Long]("nk")) -> r)
      .toMap
    base.groupBy(r => (r._1, r._2)).foreach { case (g, rs) =>
      val nG = rs.length.toLong
      var num = 0L
      bands.dropRight(1).zip(bands.drop(1)).foreach { case (b, nb) =>
        val cumG = rs.count(_._3 <= b).toLong
        num += (cumG * nAll - globCum(b) * nG).abs * (nb - b)
      }
      val row = got(g)
      assert(row.getAs[Long]("n_g") === nG, s"$g size")
      val t = num * 1000000L / (rng * nG * nAll)
      assert(row.getAs[Long]("t_e6") === t, s"$g t")
      assert(t >= 0L && t <= 1000000L, s"$g range")
      assert(row.getAs[Boolean]("close") === (t <= 200000L))
    }
    // identity: the whole population measured against itself is 0
    // (verified structurally: a group's t shrinks as it grows toward
    // the population -- the largest group must not exceed the median
    // group's t by construction of the normalization)
    assert(got.nonEmpty)
  }

  test("q_l_diversity: frequency profiles replay from a brute pass " +
      "and the three diversity grades are consistent") {
    val base = Tables.customer(spark, sf)
      .select($"c_mktsegment", $"c_nationkey",
        ($"c_acctbal".cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
      .as[(String, Long, Long)].collect()
    val got = SparkEntry.queries("q_l_diversity")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Long]("nk"),
        r.getAs[Long]("band")) -> r).toMap
    val brute = base.groupBy(r =>
      (r._1, r._2, (r._3 + 100000L) / 100000L))
    assert(got.keySet === brute.keySet)
    brute.foreach { case (g, rs) =>
      val counts = rs.groupBy(_._3).view.mapValues(_.length.toLong)
        .toMap
      val ranked = counts.toSeq.sortBy { case (v, c) => (-c, v) }
      val row = got(g)
      assert(row.getAs[Long]("n") === rs.length.toLong, s"$g n")
      assert(row.getAs[Long]("l_distinct") === counts.size.toLong)
      assert(row.getAs[Long]("r1") === ranked.head._2, s"$g r1")
      val tail3 = ranked.drop(2).map(_._2).sum
      assert(row.getAs[Long]("tail3") === tail3, s"$g tail")
      assert(row.getAs[Boolean]("recursive_23_ok") ===
        (ranked.head._2 < 2L * tail3), s"$g rec")
      val clnc = counts.valuesIterator
        .map(c => math.floor(c.toDouble * math.log(c.toDouble) * 1e9)
          .toLong).sum
      assert(row.getAs[Long]("sum_clnc_e9") === clnc, s"$g clnc")
      val n = rs.length.toLong
      val nlnn = math.floor(n.toDouble * math.log(n.toDouble) * 1e9)
        .toLong
      assert(row.getAs[Long]("n_lnn_e9") === nlnn, s"$g nlnn")
      assert(row.getAs[Boolean]("entropy_l3_ok") ===
        (nlnn - clnc >= n * math.floor(math.log(3.0) * 1e9).toLong))
      // grade consistency: entropy or recursive diversity at l=3
      // implies at least 3 distinct values
      if (row.getAs[Boolean]("entropy_l3_ok"))
        assert(row.getAs[Long]("l_distinct") >= 3L, s"$g entropy=>l3")
      if (row.getAs[Boolean]("recursive_23_ok"))
        assert(row.getAs[Long]("l_distinct") >= 3L, s"$g rec=>l3")
    }
  }

  test("q_hurst_rs: block moments and tie-proof rescaled ranges " +
      "replay exactly, and the dyadic slope matches") {
    val got = SparkEntry.queries("q_hurst_rs")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    def exactRs(num: Long, s2n: BigInt): Long = {
      def leq(m: Long): Boolean =
        if (m <= 0) true
        else BigInt(m) * m * s2n <= BigInt(num) * num * BigInt(10).pow(12)
      var k = math.floor(num.toDouble * 1e6 /
        math.sqrt(s2n.toDouble)).toLong
      if (leq(k + 1)) k += 1 else if (!leq(k)) k -= 1
      k
    }
    dailyRowsStats.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.sortBy(_._2).map(_._3)
      val levels = Seq(4, 8, 16).map { m =>
        val blocks = xs.grouped(m).filter(_.length == m).toSeq
        val rsVals = blocks.flatMap { b =>
          val sb = b.sum
          val qb = b.map(x => BigInt(x) * x).sum
          val s2n = BigInt(m) * qb - BigInt(sb) * sb
          if (s2n > 0) {
            val devs = b.scanLeft(0L)(_ + _).drop(1).zipWithIndex
              .map { case (cs, i) => m * cs - (i + 1).toLong * sb }
            Some(exactRs(devs.max - devs.min, s2n))
          } else None
        }
        m -> ((rsVals.sum, rsVals.length.toLong))
      }.toMap
      val (rs4, n4) = levels(4); val (rs8, n8) = levels(8)
      val (rs16, n16) = levels(16)
      if (n4 > 0 && n8 > 0 && n16 > 0 && rs4 > 0 && rs16 > 0) {
        val row = got(ty)
        assert((row.getAs[Long]("rs4_sum"), row.getAs[Long]("n4")) ===
          ((rs4, n4)), s"$ty m4")
        assert((row.getAs[Long]("rs8_sum"), row.getAs[Long]("n8")) ===
          ((rs8, n8)), s"$ty m8")
        assert((row.getAs[Long]("rs16_sum"), row.getAs[Long]("n16")) ===
          ((rs16, n16)), s"$ty m16")
        val h = math.floor(math.log((rs16 * n4).toDouble /
          (rs4 * n16).toDouble) / (2.0 * math.log(2.0)) * 1e6).toLong
        assert(row.getAs[Long]("h_e6") === h, s"$ty h")
      }
    }
  }

  /** (event_type, dayString, dailyCents) rows for the Hurst replay. */
  private lazy val dailyRowsStats: Seq[(String, String, Long)] =
    Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day").agg(sum($"cents").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .toSeq

  test("q_theil_decomposition: group moments replay, T_g >= 0, and " +
      "the within/between decomposition reconstructs total Theil") {
    val got = SparkEntry.queries("q_theil_decomposition")(spark, sf)
      .collect().map(r => r.getAs[Long]("nationkey") -> r).toMap
    assert(got.nonEmpty)
    val xs = Tables.lineitem(spark, sf)
      .select($"l_suppkey",
        (($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long") *
          (lit(100L) - ($"l_discount".cast("decimal(3,2)") * 100)
            .cast("long"))).as("rev"))
      .groupBy($"l_suppkey").agg(sum($"rev").as("x"))
      .filter($"x" > 0)
      .join(Tables.supplier(spark, sf),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_nationkey".cast("long"), $"x")
      .as[(Long, Long)].collect()
    val byN = xs.groupBy(_._1)
    assert(got.keySet === byN.keySet)
    val (nAll, revAll) = (xs.length.toLong, xs.map(_._2).sum)
    var reconstructed = 0.0
    byN.foreach { case (nk, rs) =>
      val (nG, revG) = (rs.length.toLong, rs.map(_._2).sum)
      val sM3 = rs.map(r => math.floor(r._2.toDouble *
        math.log(r._2.toDouble) / 1e3).toLong).sum
      val row = got(nk)
      assert(row.getAs[Long]("n_g") === nG, s"n$nk")
      assert(row.getAs[Long]("rev_g") === revG, s"n$nk rev")
      assert(row.getAs[Long]("sxlnx_m3") === sM3, s"n$nk s")
      val tW = sM3.toDouble * 1e3 / revG -
        math.log(revG.toDouble / nG)
      assert(row.getAs[Long]("t_within_e6") ===
        math.floor(tW * 1e6).toLong, s"n$nk tw")
      // Theil within a group is a KL divergence: nonnegative up to
      // the coarse-grid slack (one e-3 grid step per supplier)
      assert(tW >= -1e-5, s"n$nk nonneg")
      val between = revG.toDouble / revAll *
        math.log((revG.toDouble / nG) / (revAll.toDouble / nAll))
      assert(row.getAs[Long]("between_term_e6") ===
        math.floor(between * 1e6).toLong, s"n$nk bt")
      reconstructed += revG.toDouble / revAll * tW + between
    }
    // decomposition identity (unfloored): sum of weighted withins +
    // between terms equals the global Theil over all suppliers
    val totalTheil = xs.map { case (_, x) =>
      x.toDouble / revAll *
        math.log(x.toDouble / (revAll.toDouble / nAll))
    }.sum
    assert(math.abs(reconstructed - totalTheil) < 1e-4,
      s"decomposition: $reconstructed vs $totalTheil")
  }

  test("q_gpd_tail: PWM estimators replay from a brute sorted pass, " +
      "and an exactly-uniform ladder gives xi = -1 exactly") {
    val got = SparkEntry.queries("q_gpd_tail")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long)].collect()
    ev.groupBy(_._1).foreach { case (ty, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val u = sorted(((9 * sorted.length + 9) / 10 - 1).toInt)._3
      val ys = sorted.map(_._3).filter(_ > u).map(_ - u).sorted
      val n = ys.length.toLong
      if (n >= 8) {
        val s = ys.sum
        val m = ys.zipWithIndex.map { case (y, i) => i.toLong * y }.sum
        val den = BigInt(2) * m - BigInt(s) * (n - 1)
        if (den != 0) {
          val row = got(ty)
          assert(row.getAs[Long]("u_cents") === u, s"$ty u")
          assert(row.getAs[Long]("n_exceed") === n, s"$ty n")
          assert(row.getAs[Long]("s_sum") === s, s"$ty s")
          assert(row.getAs[Long]("m_weighted") === m, s"$ty m")
          val xi = 2000000L - (BigInt(s) * (n - 1) * 1000000 / den)
          assert(row.getAs[Long]("xi_e6") === xi.toLong, s"$ty xi")
          val sig = BigInt(2) * s * (BigInt(s) * (n - 1) - m) * 1000 /
            (n * den)
          assert(row.getAs[Long]("sigma_e3") === sig.toLong, s"$ty sig")
          assert(row.getAs[Boolean]("heavy_tail") === (xi > 0))
        }
      }
    }
    // closed-form identity: the exact ladder y_i = i (a discrete
    // uniform, the ideally bounded tail) has S(n-1)/(2M - S(n-1)) = 3
    // for every n, so xi = 2 - 3 = -1 with NO rounding
    for (n <- Seq(8L, 50L, 1000L)) {
      val s = n * (n + 1) / 2
      val m = (1L to n).map(i => (i - 1) * i).sum
      assert(BigInt(s) * (n - 1) === BigInt(3) * (2 * m - s * (n - 1)))
    }
  }

  test("q_mahalanobis_2d: quadratic form replays in BigInt and the " +
      "trace identity holds (mean d2 = dimension, exactly)") {
    val got = SparkEntry.queries("q_mahalanobis_2d")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.nonEmpty)
    val zs = got.values.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("zx"),
        r.getAs[Long]("zy"))).toSeq
    val n = zs.length.toLong
    val (sx, sy) = (zs.map(_._2).sum, zs.map(_._3).sum)
    val a = n * zs.map(z => z._2 * z._2).sum - sx * sx
    val b = n * zs.map(z => z._3 * z._3).sum - sy * sy
    val c = n * zs.map(z => z._2 * z._3).sum - sx * sy
    val det = BigInt(a) * b - BigInt(c) * c
    assert(det > 0)
    var sumQ = BigInt(0)
    zs.foreach { case (uid, zx, zy) =>
      val (dxn, dyn) = (n * zx - sx, n * zy - sy)
      val q = BigInt(b) * dxn * dxn - BigInt(c) * 2 * dxn * dyn +
        BigInt(a) * dyn * dyn
      sumQ += q
      val md2 = q * 1000 / det
      assert(got(uid).getAs[Long]("md2_e3") === md2.toLong, s"u$uid")
      assert(got(uid).getAs[Boolean]("outlier") === (md2 >= 13816))
      assert(md2 >= 0, s"u$uid psd")
    }
    // trace identity for the population-covariance form:
    // sum over points of Q_i equals 2n * det, exactly
    assert(sumQ === BigInt(2) * n * det)
    // so the e3 mean sits within one floor step of 2000
    val meanE3 = got.values.map(_.getAs[Long]("md2_e3")).sum / n
    assert(meanE3 >= 1999L && meanE3 <= 2000L)
  }

  test("q_ridge_trend: moments replay from a brute pass and the " +
    "shrinkage path is monotone toward zero") {
    val events = Tables.events(spark, sf)
      .select($"event_type",
        datediff($"ts".cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .filter($"y".isNotNull)
      .as[(String, Long, Long)].collect().toSeq
    val got = SparkEntry.queries("q_ridge_trend")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    events.groupBy(_._1).foreach { case (ty, rs) =>
      val n = rs.length.toLong
      val sx = rs.map(_._2).sum
      val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
      val row = got(ty)
      assert(row.getAs[Long]("sxy_c") === num, s"$ty num")
      assert(row.getAs[Long]("sxx_c") === den, s"$ty den")
      val s0 = row.getAs[Long]("slope0_e6")
      val s10 = row.getAs[Long]("slope10_e6")
      val s50 = row.getAs[Long]("slope50_e6")
      assert(s0 === BigInt(num) * 1000000 / den, s"$ty s0")
      assert(s10 === BigInt(num) * 1000000 / (den + den / 10), s"$ty s10")
      assert(s50 === BigInt(num) * 1000000 / (den + den / 2), s"$ty s50")
      // larger penalty never grows the slope magnitude
      assert(s50.abs <= s10.abs && s10.abs <= s0.abs, s"$ty monotone")
    }
    assert(got.nonEmpty)
  }

  /** (type, day, day_cents, day_count) rollup shared by the new
    * time-series pins. */
  private lazy val dailyXY: Seq[(String, String, Long, Long)] =
    Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("x"), count(lit(1)).as("y"))
      .as[(String, String, Long, Long)].collect().toSeq

  test("q_partial_corr: all three r's and the partial replay from " +
    "brute moments; every coefficient sits in [-1, 1]") {
    val got = SparkEntry.queries("q_partial_corr")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    dailyXY.groupBy(_._1).filter(_._2.length >= 8).foreach {
      case (ty, rs) =>
        val n = rs.length.toDouble
        val x = rs.map(_._3.toDouble)
        val y = rs.map(_._4.toDouble)
        val z = rs.map { r =>
          val d = java.time.LocalDate.parse(r._2)
          (d.getDayOfWeek.getValue % 7 + 1).toDouble // Sunday=1 grid
        }
        def r2(a: Seq[Double], b: Seq[Double]): Double = {
          val (sa, sb) = (a.sum, b.sum)
          val sab = a.zip(b).map(p => p._1 * p._2).sum
          val (saa, sbb) = (a.map(v => v * v).sum, b.map(v => v * v).sum)
          (n * sab - sa * sb) /
            math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
        }
        val (rxy, rxz, ryz) = (r2(x, y), r2(x, z), r2(y, z))
        val row = got(ty)
        // brute doubles accumulate in a different order than the
        // engine's exact-integer moments, so compare to 1 ulp of e6
        assert((row.getAs[Long]("rxy_e6") -
          math.floor(rxy * 1e6).toLong).abs <= 1, s"$ty rxy")
        assert((row.getAs[Long]("rxz_e6") -
          math.floor(rxz * 1e6).toLong).abs <= 1, s"$ty rxz")
        assert((row.getAs[Long]("ryz_e6") -
          math.floor(ryz * 1e6).toLong).abs <= 1, s"$ty ryz")
        val pc = (rxy - rxz * ryz) /
          math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        assert((row.getAs[Long]("pcorr_e6") -
          math.floor(pc * 1e6).toLong).abs <= 1, s"$ty pcorr")
        Seq("rxy_e6", "rxz_e6", "ryz_e6", "pcorr_e6").foreach(c =>
          assert(row.getAs[Long](c).abs <= 1000000L, s"$ty $c range"))
    }
    assert(got.nonEmpty)
  }

  test("q_weighted_median: the pick equals a brute cumulative-weight " +
    "walk and majorizes half the quantity on both sides") {
    val got = SparkEntry.queries("q_weighted_median")(spark, sf)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long"),
        $"l_quantity".cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    li.groupBy(_._1).foreach { case (f, rs) =>
      val tot = rs.map(_._3).sum
      val byPrice = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val (med, cumAt) = byPrice.collectFirst {
        case (c, w) if { cum += w; cum * 2 >= tot } => (c, cum)
      }.get
      val row = got(f)
      assert(row.getAs[Long]("total_qty") === tot, s"$f tot")
      assert(row.getAs[Long]("wmedian_cents") === med, s"$f median")
      assert(row.getAs[Long]("cum_at_median") === cumAt, s"$f cum")
      // weighted-median property: at least half the quantity on each
      // side (<= med and >= med)
      assert(rs.filter(_._2 <= med).map(_._3).sum * 2 >= tot, s"$f low")
      assert(rs.filter(_._2 >= med).map(_._3).sum * 2 >= tot, s"$f high")
    }
    assert(got.size === li.map(_._1).distinct.size)
  }

  test("q_markov_attribution: fixed points replay from a brute " +
    "integer chain walk and removal never helps") {
    val got = SparkEntry.queries("q_markov_attribution")(spark, sf)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    // brute journeys: absorb at the first purchase per user
    val trans = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e =>
        (e._2.toInstant.getEpochSecond, e._2.getNanos, e._3))
      val fpIdx = sorted.indexWhere(_._4 == "purchase")
      val pre = (if (fpIdx >= 0) sorted.take(fpIdx) else sorted)
        .map(_._4)
      val term = if (fpIdx >= 0) "conv" else "null"
      val path = ("start" +: pre) :+ term
      path.zip(path.drop(1)).foreach(p => trans(p) += 1L)
    }
    val nA = trans.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    def pconv(removed: Option[String]): Long = {
      val tt = trans.filter { case ((_, b), _) =>
        !removed.contains(b) }
      var p = Map("conv" -> 1000000000L, "null" -> 0L)
        .withDefaultValue(0L)
      for (_ <- 1 to ops.StatsQueries.MkIters) {
        val step = tt.toSeq.groupBy(_._1._1).map { case (a, es) =>
          a -> es.map { case ((_, b), n) => n * p(b) }.sum / nA(a)
        }
        p = (step ++ Map("conv" -> 1000000000L, "null" -> 0L))
          .withDefaultValue(0L)
      }
      p("start")
    }
    val full = pconv(None)
    val effects = Seq("view", "click", "signup", "error").map { c =>
      val row = got(c)
      assert(row.getAs[Long]("p_full_e9") === full, s"$c full")
      val rem = pconv(Some(c))
      assert(row.getAs[Long]("p_removed_e9") === rem, s"$c removed")
      val eff = math.max(full - rem, 0L)
      assert(row.getAs[Long]("effect_e9") === eff, s"$c effect")
      // removing a channel can only lose conversion probability
      assert(rem <= full, s"$c monotone")
      c -> eff
    }
    val tot = effects.map(_._2).sum
    effects.foreach { case (c, eff) =>
      assert(got(c).getAs[Long]("share_ppm") ===
        eff * 1000000L / tot, s"$c share")
    }
  }

  test("q_erasure_audit: accounting reconciles with a brute delete " +
    "and the surviving log truly contains no requested subject") {
    val rows = SparkEntry.queries("q_erasure_audit")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"user_id").as[(String, Long)]
      .collect().toSeq
    val byType = ev.groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val all = byType(ty)
      val erased = all.filter(_._2 % 97 == 0)
      assert(r.getAs[Long]("n_before") === all.size.toLong)
      assert(r.getAs[Long]("n_subjects") ===
        erased.map(_._2).distinct.size.toLong)
      assert(r.getAs[Long]("n_erased") === erased.size.toLong)
      assert(r.getAs[Long]("n_after") ===
        (all.size - erased.size).toLong)
      assert(r.getAs[Long]("n_leaked") === 0L)
      assert(r.getAs[Boolean]("clean"))
    }
    assert(rows.length === byType.size)
  }

  test("q_seasonal_mase: error sums replay from the ordered daily " +
    "walk and the ratio clears to the exact rational") {
    val got = SparkEntry.queries("q_seasonal_mase")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    dailyXY.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.sortBy(_._2).map(_._3)
      val e1 = xs.drop(1).zip(xs).map { case (c, p) => (c - p).abs }
      val e7 = xs.drop(7).zip(xs).map { case (c, p) => (c - p).abs }
      if (e7.nonEmpty && e1.sum > 0) {
        val row = got(ty)
        assert(row.getAs[Long]("n_days") === xs.length.toLong)
        assert(row.getAs[Long]("n1") === e1.length.toLong)
        assert(row.getAs[Long]("sum_e1") === e1.sum)
        assert(row.getAs[Long]("n7") === e7.length.toLong)
        assert(row.getAs[Long]("sum_e7") === e7.sum)
        assert(row.getAs[Long]("mase_e6") ===
          (BigInt(e7.sum) * e1.length * 1000000 /
            (BigInt(e1.sum) * e7.length)).toLong)
      }
    }
    assert(got.nonEmpty)
  }

  test("q_dp_mean: noise replays the seedless Laplace mechanism and " +
    "the clamp bounds the true sum") {
    val rows = SparkEntry.queries("q_dp_mean")(spark, sf)
      .collect().sortBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      val tid = i + 1L
      def u01(t: Long): Double =
        (((t * 1000003L) % 4294967296L * 48271L % 4294967296L
          % 100000L).toDouble + 0.5) / 100000.0
      def lap(u: Double, scale: Double): Double =
        if (u >= 0.5) -math.log(1.0 - 2.0 * (u - 0.5)) * scale
        else math.log(1.0 - 2.0 * (0.5 - u)) * scale
      val nTrue = r.getAs[Long]("n_true")
      val sumTrue = r.getAs[Long]("sum_true")
      assert(sumTrue <= nTrue * 50000L, "clamp violated")
      assert(r.getAs[Long]("noisy_sum_e3") ===
        math.floor((sumTrue + lap(u01(tid * 2 - 1), 50000.0)) * 1000.0)
          .toLong, s"row $i sum")
      assert(r.getAs[Long]("noisy_n_e3") ===
        math.floor((nTrue + lap(u01(tid * 2), 1.0)) * 1000.0).toLong,
        s"row $i n")
      assert(r.getAs[Long]("dp_mean_e3") ===
        r.getAs[Long]("noisy_sum_e3") * 1000L / r.getAs[Long]("noisy_n_e3"))
    }
  }

  /** Brute z_e4 with 1-based day rank, as zDailyIndexed derives it. */
  private def zIndexed(rs: Seq[(String, String, Long, Long)])
      : Seq[(Long, Long)] = {
    val xs = rs.sortBy(_._2).map(_._3)
    val n = xs.length.toLong
    val (mn, mx, sc) = (xs.min, xs.max, xs.sum)
    xs.zipWithIndex.map { case (x, i) =>
      (i + 1L, math.floor((n * x - sc).toDouble * 10000.0 /
        (n * (mx - mn))).toLong)
    }
  }

  test("q_sax_symbols: segments and symbols replay from the brute " +
    "z-grid; breakpoints are the Gaussian quartiles") {
    val got = SparkEntry.queries("q_sax_symbols")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("seg")) -> r)
      .toMap
    var checked = 0
    dailyXY.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.map(_._3)
      if (xs.length >= 8 && xs.max > xs.min) {
        zIndexed(rs).groupBy { case (rn, _) => (rn - 1) / 7 }.foreach {
          case (seg, zs) =>
            val sum = zs.map(_._2).sum
            val cnt = zs.length.toLong
            val row = got((ty, seg))
            assert(row.getAs[Long]("n_days") === cnt, s"$ty/$seg n")
            assert(row.getAs[Long]("sum_z_e4") === sum, s"$ty/$seg sum")
            val expect = if (sum < -6745 * cnt) "a"
              else if (sum < 0) "b"
              else if (sum < 6745 * cnt) "c" else "d"
            assert(row.getAs[String]("symbol") === expect, s"$ty/$seg sym")
            checked += 1
        }
      }
    }
    assert(checked > 0 && got.size === checked)
  }

  test("q_matrix_profile: profile equals a brute all-pairs scan with " +
    "the exclusion zone; discord and motif are identifiable") {
    val got = SparkEntry.queries("q_matrix_profile")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("i")) -> r)
      .toMap
    var checked = 0
    dailyXY.groupBy(_._1).foreach { case (ty, rs) =>
      val xs = rs.map(_._3)
      if (xs.length >= 8 && xs.max > xs.min) {
        val z = zIndexed(rs).map(_._2).toArray
        val n = z.length
        val starts = 0 until (n - 6)
        if (starts.size > 4) {
          starts.foreach { i =>
            val cands = starts.filter(j => (j - i).abs >= 4)
            if (cands.nonEmpty) {
              val best = cands.map { j =>
                val d2 = (0 until 7).map { k =>
                  val dd = z(i + k) - z(j + k); dd * dd
                }.sum
                (d2, j + 1L)
              }.min
              val row = got((ty, i + 1L))
              assert(row.getAs[Long]("mp_d2") === best._1, s"$ty/$i d2")
              assert(row.getAs[Long]("mp_j") === best._2, s"$ty/$i j")
              checked += 1
            }
          }
        }
      }
    }
    assert(checked > 0 && got.size === checked)
  }

  test("q_page_hinkley: BigInt replay of the running-mean deviation " +
      "stream, max-gap statistic, and first alarm day") {
    val rows = SparkEntry.queries("q_page_hinkley")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("x"))
      .groupBy($"event_type", $"day").agg(sum($"x").as("x"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val series = daily(tpe)
        .map(x => x.getDate(1).toLocalDate.toEpochDay ->
          BigInt(x.getLong(2)))
        .sortBy(_._1)
      var cum = BigInt(0); var m = BigInt(0); var rmin = BigInt(0)
      var maxGap = BigInt(-1); var alarmDay = 0L
      series.zipWithIndex.foreach { case ((day, x), idx) =>
        val i = BigInt(idx + 1)
        cum += x
        val d = x * i - cum
        val dev = if (d >= 0) d * 1000000 / i else -((-d) * 1000000 / i)
        m += dev
        if (m < rmin) rmin = m
        val gap = m - rmin
        if (gap > maxGap) { maxGap = gap; alarmDay = day }
      }
      assert(r.getAs[Long]("n_days") === series.size.toLong)
      assert(r.getAs[Long]("ph_max_e6") === maxGap.toLong)
      assert(r.getAs[java.sql.Date]("alarm_day").toLocalDate.toEpochDay
        === alarmDay)
      val sumAll = series.map(_._2).sum
      assert(r.getAs[Boolean]("drift_flag") ===
        (maxGap * series.size >
          sumAll * ops.StatsQueries.PhLambdaMeans * 1000000))
      // the gap statistic is nonnegative by construction
      assert(maxGap >= 0)
    }
  }

  test("q_croston: JVM fold replay of both EWMAs; rate identity") {
    val rows = SparkEntry.queries("q_croston")(spark, sf).collect()
    assert(rows.nonEmpty)
    val a = ops.StatsQueries.CrostonAlphaInv
    def step(cur: Long, tgt: Long): Long =
      if (tgt - cur >= 0) cur + (tgt - cur) / a
      else cur - ((cur - tgt) / a)
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey",
        datediff(to_date($"o_orderdate"),
          lit("1970-01-01").cast("date")).cast("long").as("d"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("c"))
      .collect().groupBy(_.getLong(0))
    rows.foreach { r =>
      val os = orders(r.getAs[Long]("o_custkey"))
        .map(x => (x.getLong(1), x.getLong(2))).sorted
      assert(os.size >= 3)
      assert(r.getAs[Long]("n_orders") === os.size.toLong)
      var z = 0L; var p = 0L; var last = -1L; var i = 0L
      os.foreach { case (d, c) =>
        z = if (i == 0) c * 1000 else step(z, c * 1000)
        p = if (i == 0) 0L
        else if (i == 1) (d - last) * 1000
        else step(p, (d - last) * 1000)
        last = d; i += 1
      }
      assert(r.getAs[Long]("z_e3") === z)
      assert(r.getAs[Long]("p_e3") === p)
      val rate = if (p > 0) z * 1000 / p else -1L
      assert(r.getAs[Long]("croston_rate_e3") === rate)
      assert(z > 0) // sizes are positive, so the size EWMA stays positive
    }
  }

  test("q_ols_influence: BigInt replay of leverage, residual, flags; " +
      "leverage identities") {
    val rows = SparkEntry.queries("q_ols_influence")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .groupBy($"event_type", $"day").agg(sum($"y").as("y"))
      .collect().groupBy(_.getString(0))
    val byType = daily.map { case (t, rs) =>
      t -> rs.map(x => BigInt(x.getDate(1).toLocalDate.toEpochDay) ->
        BigInt(x.getLong(2))).sortBy(_._1)
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach {
      case (tpe, rws) =>
        val pts = byType(tpe)
        val n = BigInt(pts.size)
        val sx = pts.map(_._1).sum
        val sy = pts.map(_._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val bn = n * sxy - sx * sy
        val bd = n * sxx - sx * sx
        val zs = pts.map(p => n * p._1 - sx)
        val sz2 = zs.map(z => z * z).sum
        val eis = pts.map { case (x, y) =>
          n * bd * y - sy * bd + bn * sx - n * bn * x }
        val se2 = eis.map(e => e * e).sum
        // residuals of an OLS fit sum to ~0 (exactly 0 in the reals;
        // here the common denominator is shared so the sum IS 0)
        assert(eis.sum === BigInt(0))
        val lev = rws.map(r => BigInt(r.getAs[Long]("leverage_e6"))).sum
        // sum of leverages = p = 2 exactly in the reals; e6 floors
        // put the emitted sum within n cells of 2e6
        assert((lev - 2000000).abs <= n, s"leverage sum $lev")
        rws.foreach { r =>
          val x = BigInt(r.getAs[java.sql.Date]("day")
            .toLocalDate.toEpochDay)
          val i = pts.indexWhere(_._1 == x)
          val z = zs(i)
          assert(r.getAs[Long]("leverage_e6") ===
            (BigInt(1000000) * (sz2 + n * z * z) / (n * sz2)).toLong)
          val ei = eis(i)
          val want = if (ei >= 0) ei * 100 / (n * bd)
            else -((-ei) * 100 / (n * bd))
          assert(r.getAs[Long]("resid_e2") === want.toLong)
          assert(r.getAs[Boolean]("high_leverage") ===
            (n * z * z > 3 * sz2))
          assert(r.getAs[Boolean]("outlier") ===
            ((n - 2) * ei * ei > 4 * se2))
        }
    }
  }

  test("q_bhattacharyya: BigInt replay of share grid and isqrt terms; " +
      "BC bounds") {
    val r = SparkEntry.queries("q_bhattacharyya")(spark, sf).head()
    val cs = Tables.events(spark, sf)
      .filter($"value".isNotNull &&
        ($"event_type" === "click" || $"event_type" === "purchase"))
      .select(dayofweek($"ts").cast("long").as("w"), $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect()
    val byDow = cs.groupBy(_.getLong(0)).map { case (w, rs) =>
      w -> (BigInt(rs.filter(_.getString(1) == "click")
          .map(_.getLong(2)).sum),
        BigInt(rs.filter(_.getString(1) == "purchase")
          .map(_.getLong(2)).sum))
    }
    val n = byDow.values.map(_._1).sum
    val m = byDow.values.map(_._2).sum
    def isqrt(w: BigInt): BigInt = {
      val kd = BigInt(math.sqrt(w.toDouble).toLong)
      if ((kd + 1) * (kd + 1) <= w) kd + 1
      else if (kd * kd <= w) kd else kd - 1
    }
    val terms = byDow.values.map { case (cw, dw) =>
      isqrt((cw * 1000000 / n) * (dw * 1000000 / m))
    }
    assert(r.getAs[Long]("n_cells") === byDow.size.toLong)
    assert(r.getAs[Long]("bc_e6") === terms.sum.toLong)
    assert(r.getAs[Long]("hellinger2_e6") ===
      1000000L - terms.sum.toLong)
    // Cauchy-Schwarz: BC <= 1 (grid flooring only pushes it DOWN)
    assert(r.getAs[Long]("bc_e6") <= 1000000L)
    assert(r.getAs[Long]("bc_e6") >= 0L)
  }
}
