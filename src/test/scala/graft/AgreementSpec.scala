package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force BigInt replays + invariants for the agreement /
  * stratified-association / uplift battery (AgreementQueries). Every
  * replay recomputes the statistic from the raw day/stratum/user grid
  * with arbitrary-precision integers — any grid snap, overflow, or
  * division-convention drift in the distributed path fails here. */
class AgreementSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  /** The shared daily-cents grid, replayed locally. */
  private lazy val daily: Map[(String, java.sql.Date), Long] =
    Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1)) -> r.getLong(2)).toMap

  test("q_icc_agreement: BigInt replay of the exact ICC fraction") {
    val r = SparkEntry.queries("q_icc_agreement")(spark, sf).head()
    val k = ops.AgreementQueries.IccRaters.toInt
    val byDay = daily.groupBy(_._1._2).filter(_._2.size == k)
    val n = BigInt(byDay.size)
    assert(r.getAs[Long]("n_days") === byDay.size.toLong)
    val sis = byDay.values.map(m => BigInt(m.values.sum)).toSeq
    val s = sis.sum
    val a = sis.map(x => x * x).sum
    val t = byDay.values.flatMap(_.values)
      .map(x => BigInt(x) * BigInt(x)).sum
    val num = (n * a - s * s) * (k - 1) - (BigInt(k) * t - a) * (n - 1)
    val den = BigInt(k - 1) * ((n * a - s * s) +
      (BigInt(k) * t - a) * (n - 1))
    val expect =
      if (den <= 0) BigInt(-2000000)
      else if (num >= 0) num * 1000000 / den
      else -((-num) * 1000000 / den)
    assert(r.getAs[Long]("icc_e6") === expect.toLong)
    if (r.getAs[Long]("icc_defined") == 1L) {
      val icc = r.getAs[Long]("icc_e6")
      // one-way ICC is bounded below by -1/(k-1), above by 1
      assert(icc <= 1000000L && icc >= -1000000L / (k - 1) - 1)
    }
  }

  test("q_bland_altman: BigInt replay of moments, limits, outside count") {
    val r = SparkEntry.queries("q_bland_altman")(spark, sf).head()
    val (ma, mb) = ops.AgreementQueries.BaPair
    val ds = daily.collect { case ((t, day), v) if t == ma => day -> v }
      .toSeq.flatMap { case (day, x) =>
        daily.get((mb, day)).map(y => x / 100 - y / 100)
      }.map(BigInt(_))
    val n = BigInt(ds.size)
    val sd1 = ds.sum
    val sdd = ds.map(x => x * x).sum
    val vv = n * sdd - sd1 * sd1
    assert(r.getAs[Long]("n_days") === ds.size.toLong)
    assert(r.getAs[Long]("sum_d") === sd1.toLong)
    val meanE2 =
      if (sd1 >= 0) sd1 * 100 / n else -((-sd1) * 100 / n)
    assert(r.getAs[Long]("mean_d_e2") === meanE2.toLong)
    assert(r.getAs[Long]("halfwidth2_e4") ===
      (BigInt(38416) * vv / (n * (n - 1))).toLong)
    val outside = ds.count(d =>
      (n * d - sd1) * (n * d - sd1) * 10000 * (n - 1) > 38416 * vv * n)
    assert(r.getAs[Long]("n_outside") === outside.toLong)
    // the 1.96-sd band contains ~95% of normal data; even on
    // arbitrary data Chebyshev bounds outside/n by 1/1.96² ≈ 26%
    assert(outside * 4 <= ds.size,
      s"outside=$outside of n=${ds.size} — band is misplaced")
  }

  test("q_mantel_haenszel: BigInt replay of scaled MH sums and CMH") {
    val r = SparkEntry.queries("q_mantel_haenszel")(spark, sf).head()
    val cells = Tables.events(spark, sf)
      .select(dayofweek($"ts").cast("long").as("w"),
        ($"user_id" % 2 === 1).as("e"),
        ($"event_type" === "purchase").as("s"))
      .collect()
      .groupBy(_.getLong(0)).map { case (_, rows) =>
        def cnt(e: Boolean, s: Boolean) = BigInt(rows.count(r =>
          r.getBoolean(1) == e && r.getBoolean(2) == s))
        (cnt(true, true), cnt(true, false), cnt(false, true),
          cnt(false, false))
      }.filter { case (a, b, c, d) => a + b + c + d > 1 }
    assert(r.getAs[Long]("n_strata") === cells.size.toLong)
    val (rs, ss, es, vs, as_) = cells.foldLeft(
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))) {
      case ((rAcc, sAcc, eAcc, vAcc, aAcc), (a, b, c, d)) =>
        val n = a + b + c + d
        (rAcc + a * d * 1000000 / n,
          sAcc + b * c * 1000000 / n,
          eAcc + (a + b) * (a + c) * 1000000 / n,
          vAcc + (a + b) * (c + d) * (a + c) * (b + d) *
            BigInt("1000000000000") / (n * n * (n - 1)),
          aAcc + a)
    }
    assert(r.getAs[Long]("sum_a") === as_.toLong)
    assert(r.getAs[Long]("sum_r") === rs.toLong)
    assert(r.getAs[Long]("sum_s") === ss.toLong)
    val orE6 = if (ss > 0) rs * 1000000 / ss else BigInt(-1)
    assert(r.getAs[Long]("or_e6") === orE6.toLong)
    val chi = if (vs > 0) {
      val diff = as_ * 1000000 - es
      diff * diff * 10000 / (vs * 1000000)
    } else BigInt(-1)
    assert(r.getAs[Long]("chi2_e4") === chi.toLong)
    assert(r.getAs[Boolean]("assoc_5pct") === (chi >= 38415))
  }

  test("q_turning_points: replay T and the exact z² fraction per type") {
    val rows = SparkEntry.queries("q_turning_points")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val xs = daily.collect { case ((t, day), v) if t == tpe =>
        day.toLocalDate.toEpochDay -> v
      }.toSeq.sortBy(_._1).map(_._2)
      val t = (1 until xs.size - 1).count(i =>
        (xs(i) > xs(i - 1) && xs(i) > xs(i + 1)) ||
          (xs(i) < xs(i - 1) && xs(i) < xs(i + 1)))
      assert(r.getAs[Long]("n_days") === xs.size.toLong)
      assert(r.getAs[Long]("n_turning") === t.toLong)
      val m = BigInt(3 * t - 2 * xs.size + 4)
      val mag = m * m * 100000 / (16 * xs.size - 29)
      val z2 = if (m >= 0) mag else -mag
      assert(r.getAs[Long]("z2_e4") === z2.toLong)
      assert(r.getAs[Boolean]("nonrandom_5pct") === (mag >= 38416))
    }
  }

  test("q_cross_corr_lags: lag-0 agrees with corr(); all lags bounded") {
    val rows = SparkEntry.queries("q_cross_corr_lags")(spark, sf)
      .collect()
    assert(rows.length === ops.AgreementQueries.CcfLags.size)
    rows.foreach { r =>
      val c = r.getAs[Long]("ccf_e3")
      assert(c == -2000L || (c >= -1000L && c <= 1000L),
        s"ccf_e3 out of range: $c")
      // moments identity: vx, vy ≥ 0 and num² ≤ vx·vy (Cauchy–Schwarz)
      val (num, vx, vy) = (BigInt(r.getAs[Long]("num")),
        BigInt(r.getAs[Long]("vx")), BigInt(r.getAs[Long]("vy")))
      assert(vx >= 0 && vy >= 0 && num * num <= vx * vy)
    }
    val lag0 = rows.find(_.getAs[Long]("lag_days") == 0L).get
    if (lag0.getAs[Long]("ccf_e3") != -2000L) {
      val (a, b) = ops.AgreementQueries.CcfPair
      val expect = Tables.events(spark, sf)
        .filter($"value".isNotNull)
        .select($"event_type", to_date($"ts").as("day"),
          ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
        .groupBy($"day", $"event_type")
        .agg(expr("sum(c) div 100").as("v"))
        .groupBy($"day")
        .agg(max(when($"event_type" === a, $"v")).as("x"),
          max(when($"event_type" === b, $"v")).as("y"))
        .filter($"x".isNotNull && $"y".isNotNull)
        .agg(corr($"x", $"y")).head().getDouble(0)
      assert(math.abs(lag0.getAs[Long]("ccf_e3") / 1000.0 - expect)
        < 2e-3, s"lag-0 ccf vs corr(): ${lag0.getAs[Long]("ccf_e3")}" +
        s" vs $expect")
    }
  }

  test("q_qini_curve: deciles partition users, prefixes monotone, " +
    "qini replays") {
    val rows = SparkEntry.queries("q_qini_curve")(spark, sf)
      .collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.length === 10)
    val nUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    val last = rows.last
    assert(last.getAs[Long]("cum_nt") + last.getAs[Long]("cum_nc")
      === nUsers)
    rows.sliding(2).foreach {
      case Array(p, c) =>
        Seq("cum_nt", "cum_nc", "cum_yt", "cum_yc").foreach { col =>
          assert(p.getAs[Long](col) <= c.getAs[Long](col),
            s"$col not monotone")
        }
      case _ =>
    }
    rows.foreach { r =>
      val (nt, nc, yt, yc) = (r.getAs[Long]("cum_nt"),
        r.getAs[Long]("cum_nc"), r.getAs[Long]("cum_yt"),
        r.getAs[Long]("cum_yc"))
      assert(yt <= nt && yc <= nc)
      val expect = if (nc > 0)
        (BigInt(yt) * 100 - BigInt(yc) * nt * 100 / nc).toLong
      else -1L
      assert(r.getAs[Long]("qini_e2") === expect)
    }
  }

  test("q_tukey_hsd: exact rational replay of all pairwise q2; " +
    "symmetry with the ANOVA within-groups term") {
    val rows = SparkEntry.queries("q_tukey_hsd")(spark, sf).collect()
    val cents = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => BigInt(r.getLong(1))) }
    val k = BigInt(cents.size)
    val nn = cents.values.map(v => BigInt(v.size)).sum
    val ssw = cents.values.map { v =>
      val n = BigInt(v.size)
      (n * v.map(x => x * x).sum - v.sum * v.sum) / n
    }.sum
    val msw = ssw / (nn - k)
    assert(msw > 0)
    assert(rows.length === (cents.size * (cents.size - 1)) / 2)
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(ta < tb)
      val (va, vb) = (cents(ta), cents(tb))
      val (na, nb) = (BigInt(va.size), BigInt(vb.size))
      val diff = va.sum * 100 / na - vb.sum * 100 / nb
      assert(r.getAs[Long]("mean_diff_e2") === diff.toLong)
      val q2 = 2 * diff * diff * na * nb * 1000 /
        (BigInt(10000) * msw * (na + nb))
      assert(r.getAs[Long]("q2_e3") === q2.toLong)
      assert(r.getAs[Boolean]("differ_5pct") ===
        (q2 >= ops.AgreementQueries.TukeyQ2E3))
      assert(q2 >= 0)
    }
  }

  test("q_cronbach_alpha: exact alpha replay; bounded above by 1") {
    val r = SparkEntry.queries("q_cronbach_alpha")(spark, sf).head()
    val k = ops.AgreementQueries.IccRaters.toInt
    val byDay = daily.groupBy(_._1._2).filter(_._2.size == k)
    val n = BigInt(byDay.size)
    def varN(xs: Iterable[BigInt]): BigInt = {
      val s = xs.sum
      BigInt(xs.size) * xs.map(x => x * x).sum - s * s
    }
    val types = byDay.values.head.keys.map(_._1).toSeq.sorted
    val sumItemVar = types.map { t =>
      varN(byDay.values.map(m =>
        BigInt(m.collectFirst { case ((tt, _), v) if tt == t => v }.get)))
    }.sum
    val vTot = varN(byDay.values.map(m => BigInt(m.values.sum)))
    assert(r.getAs[Long]("n_days") === byDay.size.toLong)
    assert(r.getAs[Long]("k_items") === k.toLong)
    val expect =
      if (vTot <= 0) BigInt(-2000000)
      else if (vTot - sumItemVar >= 0)
        BigInt(k) * (vTot - sumItemVar) * 1000000 / ((k - 1) * vTot)
      else -(BigInt(k) * (sumItemVar - vTot) * 1000000 / ((k - 1) * vTot))
    assert(r.getAs[Long]("alpha_e6") === expect.toLong)
    // alpha <= 1 always (item variances are nonnegative)
    assert(r.getAs[Long]("alpha_e6") <= 1000000L ||
      r.getAs[Long]("alpha_e6") === -2000000L)
    if (vTot > 0)
      assert(r.getAs[Long]("var_ratio_e6") ===
        (sumItemVar * 1000000 / vTot).toLong)
  }

  test("q_fleiss_kappa: exact replay from tercile-rank ratings") {
    val r = SparkEntry.queries("q_fleiss_kappa")(spark, sf).head()
    val k = ops.AgreementQueries.IccRaters.toInt
    val cats = ops.AgreementQueries.FleissCats
    val byDay = daily.groupBy(_._1._2).filter(_._2.size == k)
    val days = byDay.keySet
    // per type: rank its balanced days by (cents, day), tercile them
    val ratings = daily.toSeq
      .filter { case ((_, day), _) => days(day) }
      .groupBy(_._1._1).toSeq.flatMap { case (_, xs) =>
        val nd = xs.size
        xs.sortBy { case ((_, day), v) => (v, day.toLocalDate.toEpochDay) }
          .zipWithIndex.map { case (((_, day), _), i) =>
            day -> (i.toLong * cats / nd)
          }
      }
    val cells = ratings.groupBy(identity).map { case ((day, cat), g) =>
      (day, cat) -> BigInt(g.size)
    }
    val a = cells.values.map(x => x * x).sum
    val nk = cells.values.sum
    val n = BigInt(days.size)
    val b = cells.groupBy(_._1._2).values
      .map(g => g.values.sum).map(c => c * c).sum
    assert(r.getAs[Long]("n_subjects") === days.size.toLong)
    val d2mb = nk * nk - b
    val expect =
      if (d2mb <= 0) BigInt(-2000000)
      else {
        val num = (a - n * k) * nk * nk - b * (nk * (k - 1))
        val den = (nk * (k - 1)) * d2mb
        if (num >= 0) num * 1000000 / den
        else -((-num) * 1000000 / den)
      }
    assert(r.getAs[Long]("kappa_e6") === expect.toLong)
    assert(r.getAs[Long]("kappa_e6") <= 1000000L)
  }

  test("q_ljung_box: exact replay of rho grid and Q statistic") {
    val rows = SparkEntry.queries("q_ljung_box")(spark, sf).collect()
    assert(rows.nonEmpty)
    val h = ops.AgreementQueries.LbLags
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val xs = daily.collect { case ((t, day), v) if t == tpe =>
        day.toLocalDate.toEpochDay -> BigInt(v)
      }.toSeq.sortBy(_._1).map(_._2)
      val n = BigInt(xs.size)
      val s = xs.sum
      val z = xs.map(x => n * x - s)
      val den = z.map(v => v * v).sum
      assert(den > 0 && n > h)
      val rhos = (1 to h).map { kk =>
        val num = (0 until xs.size - kk)
          .map(i => z(i) * z(i + kk)).sum
        if (num >= 0) num * 10000 / den else -((-num) * 10000 / den)
      }
      (1 to h).foreach { kk =>
        assert(r.getAs[Long](s"rho${kk}_e4") === rhos(kk - 1).toLong)
        assert(rhos(kk - 1).abs <= 10000)
      }
      val qsum = (1 to h).map(kk =>
        rhos(kk - 1) * rhos(kk - 1) / (n - kk)).sum
      val q = n * (n + 2) * qsum * 1000 / 100000000
      assert(r.getAs[Long]("q_e3") === q.toLong)
      assert(r.getAs[Boolean]("nonwhite_5pct") ===
        (q >= ops.AgreementQueries.LbCritE3))
      assert(q >= 0)
    }
  }

  test("q_hodges_lehmann: exact Walsh-average median replay; " +
      "bracketed by the series min/max sums") {
    val rows = SparkEntry.queries("q_hodges_lehmann")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val xs = daily.collect { case ((t, day), v) if t == tpe =>
        day.toLocalDate.toEpochDay -> v
      }.toSeq.sortBy(_._1).map(_._2)
      val walsh = (for {
        i <- xs.indices; j <- i until xs.size
      } yield xs(i) + xs(j)).sorted
      assert(r.getAs[Long]("n_walsh") === walsh.size.toLong)
      val want = walsh((walsh.size + 1) / 2 - 1)
      assert(r.getAs[Long]("hl_half_cents") === want)
      assert(want >= 2 * xs.min && want <= 2 * xs.max)
    }
  }

  test("q_tost_equivalence: BigInt replay on the intensive grid; " +
      "equivalence = both one-sided rejections") {
    val r = SparkEntry.queries("q_tost_equivalence")(spark, sf).head()
    val (ta, tb) = ops.AgreementQueries.BaPair
    val cs = Tables.events(spark, sf)
      .filter($"value".isNotNull &&
        ($"event_type" === ta || $"event_type" === tb))
      .select($"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(x => x.getString(0) -> BigInt(x.getLong(1)))
    val a = cs.filter(_._1 == ta).map(_._2)
    val b = cs.filter(_._1 == tb).map(_._2)
    val (n1, n2) = (BigInt(a.length), BigInt(b.length))
    val (s1, s2) = (a.sum, b.sum)
    val (q1, q2) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
    val diff = s1 * 100 / n1 - s2 * 100 / n2
    val delta = ops.AgreementQueries.TostMarginPct * (s1 + s2) /
      (n1 + n2)
    val se2 = ((n1 * q1 - s1 * s1) / (n1 * (n1 - 1))) * 10000 / n1 +
      ((n2 * q2 - s2 * s2) / (n2 * (n2 - 1))) * 10000 / n2
    assert(r.getAs[Long]("n1") === n1.toLong)
    assert(r.getAs[Long]("n2") === n2.toLong)
    assert(r.getAs[Long]("diff_e2") === diff.toLong)
    assert(r.getAs[Long]("delta_e2") === delta.toLong)
    assert(r.getAs[Long]("se2_e4") === se2.toLong)
    val z2 = BigInt(2706025)
    val lo = diff + delta > 0 &&
      (diff + delta) * (diff + delta) * 1000000 > z2 * se2
    val hi = delta - diff > 0 &&
      (delta - diff) * (delta - diff) * 1000000 > z2 * se2
    assert(r.getAs[Boolean]("lower_reject") === lo)
    assert(r.getAs[Boolean]("upper_reject") === hi)
    assert(r.getAs[Boolean]("equivalent_5pct") === (lo && hi))
    // equivalence within delta requires |diff| < delta
    if (r.getAs[Boolean]("equivalent_5pct")) assert(diff.abs < delta)
  }
}
