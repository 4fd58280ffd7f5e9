package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining API-surface breadth: map-typed columns, describe/summary
  * statistics, seeded sampling determinism, id generation — the
  * long-tail operations a reference user may reach for.
  */
class FunctionsBreadthSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("window funnel: per-user brute anchor scan replays the level " +
      "histogram and the deadline only ever lowers the unbounded level") {
    val T = ops.ScalarQueries.FunnelWindowUs
    val got = SparkEntry.queries("q_window_funnel")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("best_level") -> r.getAs[Long]("n_users"))
      .toMap
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val brute = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var viewers = 0
    byUser.foreach { case (_, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        viewers += 1
        val clicks = rows.filter(_._2 == "click").map(_._3).sorted
        val purch = rows.filter(_._2 == "purchase").map(_._3).sorted
        val best = views.map { v =>
          clicks.find(c => c > v && c <= v + T) match {
            case None => 1L
            case Some(c) =>
              if (purch.exists(p => p > c && p <= v + T)) 3L else 2L
          }
        }.max
        brute(best) += 1L
      }
    }
    assert(got === brute.toMap)
    // every viewer lands in exactly one level bucket
    assert(got.values.sum === viewers.toLong)
    // unbounded dominance: a windowed view<c<=p chain implies the
    // order-only funnel also reaches stage 3 (its greedy-min anchors
    // only widen what follows), so the deadline can only LOWER counts
    val unbounded = SparkEntry.queries("q_event_funnel")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    assert(got.getOrElse(3L, 0L) <= unbounded("3_purchase_after_click"))
    assert(got.values.sum === unbounded("1_view"))
  }

  test("rfm segments: quintiles are balanced and monotone in the " +
      "underlying metric, and the taxonomy CASE replays") {
    val rows = SparkEntry.queries("q_rfm_segments")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // each ntile bucket within 1 of n/5
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Long](c)).view
        .mapValues(_.length).toMap
      assert(sizes.keySet === (1L to 5L).toSet, c)
      assert(sizes.values.max - sizes.values.min <= 1, c)
    }
    // monotone: a higher r_score never means a STALER user
    val byR = rows.groupBy(_.getAs[Long]("r_score")).view
      .mapValues(_.map(_.getAs[Long]("recency_days"))).toMap
    for (k <- 1L to 4L)
      assert(byR(k).min >= byR(k + 1).max,
        s"recency ordering broken between ntile $k and ${k + 1}")
    // taxonomy replay
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"),
        r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))
      val want =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (fs >= 4) "loyal"
        else if (ms >= 4) "big_spender"
        else if (rs <= 2 && fs >= 3) "at_risk"
        else if (rs <= 2) "hibernating"
        else "regular"
      assert(r.getAs[String]("segment") === want)
    }
  }

  test("BI trio: ABC classes are rank-monotone, equi-depth buckets " +
      "balance and order, WoW deltas reconcile") {
    // ABC: the class walk never goes backwards and A ends at 80%
    val abc = SparkEntry.queries("q_abc_analysis")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(abc.nonEmpty)
    val order = Map("A" -> 0, "B" -> 1, "C" -> 2)
    abc.sliding(2).foreach {
      case Array(a, b) =>
        assert(order(a.getAs[String]("abc_class")) <=
          order(b.getAs[String]("abc_class")))
        assert(a.getAs[Long]("revenue_e4") >= b.getAs[Long]("revenue_e4"))
      case _ =>
    }
    val total = abc.map(_.getAs[Long]("revenue_e4")).sum
    val aRev = abc.filter(_.getAs[String]("abc_class") == "A")
      .map(_.getAs[Long]("revenue_e4")).sum
    assert(BigInt(aRev) * 100 <= BigInt(total) * 80)
    // equi-depth: sizes within 1, ranges ascending and disjoint-ish
    val ed = SparkEntry.queries("q_equidepth_stats")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(ed.map(_.getAs[Long]("bucket")).toSeq === (1L to 8L))
    val sizes = ed.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1)
    ed.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
      case _ =>
    }
    ed.foreach(r => assert(r.getAs[Long]("ndv") <=
      r.getAs[Long]("n_rows")))
    // WoW: delta reconciles and growth sign matches delta sign
    val wow = SparkEntry.queries("q_wow_growth")(spark, sf).collect()
    assert(wow.nonEmpty)
    wow.filter(r => !r.isNullAt(r.fieldIndex("prev_cents"))).foreach {
      r =>
        assert(r.getAs[Long]("delta_cents") ===
          r.getAs[Long]("cents") - r.getAs[Long]("prev_cents"))
        if (r.getAs[Long]("prev_cents") > 0)
          assert(r.getAs[Long]("growth_ppm").signum ===
            r.getAs[Long]("delta_cents").signum ||
            r.getAs[Long]("growth_ppm") == 0L)
    }
  }

  test("OHLC bars and user streaks replay brute-force with their " +
      "structural invariants") {
    // OHLC: low <= open/close <= high; brute first/last per group
    val bars = SparkEntry.queries("q_daily_ohlc")(spark, sf).collect()
    assert(bars.nonEmpty)
    val ev = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").cast("string"),
        unix_micros($"ts"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, String, Long, Long, Long)].collect()
    val byBar = ev.groupBy(r => (r._1, r._2))
    bars.foreach { b =>
      val key = (b.getAs[String]("event_type"),
        b.getAs[java.sql.Date]("day").toString)
      val rs = byBar(key)
      val open = rs.minBy(r => (r._3, r._4))._5
      val close = rs.maxBy(r => (r._3, r._4))._5
      assert(b.getAs[Long]("open_cents") === open, s"$key open")
      assert(b.getAs[Long]("close_cents") === close, s"$key close")
      assert(b.getAs[Long]("high_cents") === rs.map(_._5).max)
      assert(b.getAs[Long]("low_cents") === rs.map(_._5).min)
      assert(b.getAs[Long]("volume") === rs.length.toLong)
      assert(b.getAs[Long]("low_cents") <= b.getAs[Long]("open_cents"))
      assert(b.getAs[Long]("open_cents") <= b.getAs[Long]("high_cents"))
    }
    // streaks: islands replay from consecutive-day runs
    val got = SparkEntry.queries("q_user_streaks")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    val byUser = Tables.events(spark, sf)
      .select($"user_id", datediff(to_date($"ts"),
        lit("1970-01-01").cast("date")).cast("long"))
      .distinct().as[(Long, Long)].collect().groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      val runs = scala.collection.mutable.ListBuffer.empty[Long]
      days.zipWithIndex.foreach { case (d0, i) =>
        if (i > 0 && days(i - 1) == d0 - 1) runs(runs.length - 1) += 1
        else runs += 1L
      }
      val row = got(u)
      assert(row.getAs[Long]("active_days") === days.length.toLong)
      assert(row.getAs[Long]("longest_streak") === runs.max, s"u$u")
      assert(row.getAs[Long]("n_islands") === runs.length.toLong)
    }
  }

  test("recommendations: never an owned item, per-customer rank is " +
      "dense and score-ordered, and a brute rescore agrees") {
    val rows = SparkEntry.queries("q_recommend_topn")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val owned = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val orderParts = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).values
      .map(_.map(_._2).toSet).toSeq
    val rawSup = scala.collection.mutable
      .Map.empty[(Long, Long), Long].withDefaultValue(0L)
    orderParts.foreach { ps =>
      for (a <- ps; b <- ps if a != b) rawSup((a, b)) += 1L
    }
    // replay the neighbor-model truncation (top-cap per item)
    val cap = ops.AdvancedQueries.RecNeighborCap
    val pairSup = rawSup.toSeq.groupBy(_._1._1).values.flatMap { xs =>
      xs.sortBy { case ((_, b), sup) => (-sup, b) }.take(cap)
    }.toMap.withDefaultValue(0L)
    val byCust = rows.groupBy(_.getAs[Long]("c_custkey"))
    byCust.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("score") > b.getAs[Long]("score") ||
            (a.getAs[Long]("score") == b.getAs[Long]("score") &&
              a.getAs[Long]("p_partkey") < b.getAs[Long]("p_partkey")))
        case _ =>
      }
      sorted.foreach { r =>
        val cand = r.getAs[Long]("p_partkey")
        assert(!owned(c).contains(cand), s"c$c owns $cand")
        val score = owned(c).toSeq.map(p => pairSup((p, cand))).sum
        assert(r.getAs[Long]("score") === score, s"c$c cand $cand")
      }
    }
  }

  test("table checksum is partition-invariant, replays per row, and " +
      "detects a single flipped cell") {
    def collectSums(): Map[String, (Long, Long)] =
      SparkEntry.queries("q_table_checksum")(spark, sf).collect()
        .map(r => r.getAs[String]("l_returnflag") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("checksum")))).toMap
    val got = collectSums()
    assert(got.nonEmpty)
    // brute per-row polyhash replay
    def ph(s0: String): Long = {
      var acc = 0L; var i = 0
      while (i < s0.length) {
        val cp = s0.codePointAt(i)
        acc = (acc * 31L + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      acc
    }
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag", concat_ws("|",
        $"l_orderkey", $"l_linenumber",
        $"l_quantity".cast("decimal(12,2)"),
        $"l_extendedprice".cast("decimal(12,2)"),
        $"l_returnflag", $"l_shipdate".cast("date")))
      .as[(String, String)].collect()
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.map(r => ph(r._2)).sum)
    }.toMap
    assert(got === want)
    // one flipped cell (quantity +0.01 on one row) must change the
    // group checksum but not its row count
    val flag = rows.head._1
    val mutated = rows.zipWithIndex.map { case ((f, str), i) =>
      if (i == 0) (f, str.replaceFirst("\\|", "|9")) else (f, str)
    }
    val mutSum = mutated.filter(_._1 == flag).map(r => ph(r._2)).sum
    assert(mutSum !== want(flag)._2, "checksum blind to a cell flip")
    // partition invariance
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "7")
      assert(collectSums() === got)
    } finally spark.conf.set(key, saved)
  }

  test("fraud rules: double-charge pairs and velocity flags replay " +
      "brute-force") {
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", $"event_id", unix_micros($"ts"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    // double charge: same user, same dollar, within 24h
    val got = SparkEntry.queries("q_double_charge")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("second_id")))
      .toSet
    val want = (for {
      a <- purchases; b <- purchases
      if a._1 == b._1 && a._4 / 100 == b._4 / 100 &&
        a._2 < b._2 && math.abs(a._3 - b._3) <= 86400000000L
    } yield (a._2, b._2)).toSet
    assert(got === want)
    assert(got.nonEmpty, "rule must not be vacuous on this data")
    // velocity: max trailing-hour count per user
    val vf = SparkEntry.queries("q_velocity_flags")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    val all = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().groupBy(_._1)
    assert(vf.keySet === all.keySet)
    all.foreach { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      val maxHour = ts.map(t =>
        ts.count(x => x >= t - 3600000000L && x <= t).toLong).max
      assert(vf(u).getAs[Long]("n_purchases") === ts.length.toLong)
      assert(vf(u).getAs[Long]("max_per_hour") === maxHour, s"u$u")
      assert(vf(u).getAs[Boolean]("flagged") === (maxHour >= 3L))
    }
  }

  test("revenue waterfall: gross - discount = net and net + tax = " +
      "charged hold exactly, cell by cell") {
    val rows = SparkEntry.queries("q_revenue_waterfall")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, disc, net, tax, ch) = (r.getAs[Long]("gross_e6"),
        r.getAs[Long]("discount_e6"), r.getAs[Long]("net_e6"),
        r.getAs[Long]("tax_e6"), r.getAs[Long]("charged_e6"))
      assert(g - disc === net, r.getAs[String]("l_returnflag"))
      assert(net + tax === ch, r.getAs[String]("l_returnflag"))
      assert(disc >= 0 && tax >= 0 && net > 0)
    }
  }

  test("rendezvous shards: assignments replay brute-force and growing " +
      "8 -> 9 remaps about 1/9 of keys, far below the mod-N strawman") {
    val P = 2147483647L
    def ph(s0: String): Long = {
      var acc = 0L
      s0.foreach(c => acc = (acc * 31L + c.toLong) % P)
      acc
    }
    def winner(u: Long, n: Int): Long = {
      val best = (0 until n).map { i =>
        val h = ph(s"s$i:$u")
        (BigInt(h) * h % P).toLong * 16L + (15L - i)
      }.max
      15L - best % 16L
    }
    val users = Tables.events(spark, sf).select($"user_id").distinct()
      .as[Long].collect()
    val gotRows = SparkEntry.queries("q_rendezvous_shards")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("shard_before") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("n_remapped")))).toMap
    val brute = users.map(u => (winner(u, 8), winner(u, 9)))
    val want = brute.groupBy(_._1).view.mapValues(rs =>
      (rs.length.toLong, rs.count(r => r._1 != r._2).toLong)).toMap
    assert(gotRows === want)
    val total = users.length.toLong
    val remapped = gotRows.values.map(_._2).sum
    // rendezvous property: ~1/9 of keys move (binomial slack), while
    // mod-N resharding would move (N-1)/N of them
    assert(remapped * 9 > total / 2 && remapped * 9 < total * 2,
      s"remap $remapped of $total is not ~1/9")
    val modRemap = users.count(u => u % 8 != u % 9).toLong
    assert(remapped < modRemap / 3,
      "rendezvous must beat mod-N resharding decisively")
  }

  test("post-stratification: cells replay and the mix effect is the " +
      "exact raw-minus-adjusted difference") {
    val rows = SparkEntry.queries("q_post_stratified")(spark, sf)
      .collect()
    assert(rows.length === 1)
    val row = rows.head
    assert(row.getAs[Long]("mix_effect_e2") ===
      row.getAs[Long]("raw_mean_e2") - row.getAs[Long]("adjusted_mean_e2"))
    val base = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select(($"user_id" % 5),
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val cut = (base.map(_._2).min + base.map(_._2).max) / 2
    val cells = base.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2 <= cut).toLong,
        rs.count(_._2 > cut).toLong,
        rs.filter(_._2 > cut).map(_._3).sum)
    }.filter { case (_, (nr, nc, _)) => nr > 0 && nc > 0 }.toMap
    val nrAll = cells.values.map(_._1).sum
    val ncAll = cells.values.map(_._2).sum
    val scAll = cells.values.map(_._3).sum
    assert(row.getAs[Long]("n_segments") === cells.size.toLong)
    assert((row.getAs[Long]("nr_all"), row.getAs[Long]("nc_all"),
      row.getAs[Long]("sc_all")) === ((nrAll, ncAll, scAll)))
    val adj = cells.values.map { case (nr, nc, sc) =>
      math.floor(nr.toDouble / nrAll * (sc.toDouble / nc) * 100.0)
        .toLong
    }.sum
    assert(row.getAs[Long]("adjusted_mean_e2") === adj)
    assert(row.getAs[Long]("raw_mean_e2") ===
      (BigInt(scAll) * 100 / ncAll).toLong)
  }

  test("funnel latency: exact order-statistic median/p90 replay from " +
      "the brute chain walk and median never exceeds p90") {
    val got = SparkEntry.queries("q_funnel_latency")(spark, sf)
      .collect().map(r => r.getAs[String]("step") -> r).toMap
    assert(got.size === 2)
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    val gaps = ev.toSeq.flatMap { case (u, rs) =>
      val views = rs.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val t1 = views.min
        val clicks = rs.filter(r => r._2 == "click" && r._3 >= t1)
          .map(_._3)
        if (clicks.isEmpty) None
        else {
          val t2 = clicks.min
          val buys = rs.filter(r => r._2 == "purchase" && r._3 >= t2)
            .map(_._3)
          if (buys.isEmpty) None else Some((u, t2 - t1, buys.min - t2))
        }
      }
    }
    def pick(xs: Seq[(Long, Long)], rank: Long): Long =
      xs.sortBy { case (u, g) => (g, u) }.apply((rank - 1).toInt)._2
    val n = gaps.length.toLong
    Seq(("1_view_to_click", gaps.map(g => (g._1, g._2))),
      ("2_click_to_buy", gaps.map(g => (g._1, g._3)))).foreach {
      case (step, xs) =>
        val row = got(step)
        assert(row.getAs[Long]("n_converted") === n, step)
        assert(row.getAs[Long]("median_us") === pick(xs, (n + 1) / 2))
        assert(row.getAs[Long]("p90_us") === pick(xs, (9 * n + 9) / 10))
        assert(row.getAs[Long]("median_us") <= row.getAs[Long]("p90_us"))
    }
  }

  test("price indices: terms replay brute-force and Fisher sits " +
      "between Laspeyres and Paasche (geometric-mean bound)") {
    val rows = SparkEntry.queries("q_price_indices")(spark, sf)
      .collect()
    assert(rows.length === 1)
    val row = rows.head
    val base = Tables.lineitem(spark, sf)
      .select($"l_partkey",
        ($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long"),
        $"l_quantity".cast("decimal(12,2)").cast("long"),
        datediff(to_date($"l_shipdate"), lit("1970-01-01").cast("date"))
          .cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val cut = (base.map(_._4).min + base.map(_._4).max) / 2
    val cells = base.groupBy(_._1).view.mapValues { rs =>
      val (h0, h1) = rs.partition(_._4 <= cut)
      (h0.map(_._2).sum, h0.map(_._3).sum,
        h1.map(_._2).sum, h1.map(_._3).sum)
    }.filter { case (_, (_, q0, _, q1)) => q0 > 0 && q1 > 0 }.toMap
    assert(row.getAs[Long]("n_matched_parts") === cells.size.toLong)
    val rev0 = cells.values.map(_._1).sum
    val rev1 = cells.values.map(_._3).sum
    val lNum = cells.values.map { case (_, q0, s1, q1) =>
      s1 * q0 * 1000L / q1
    }.sum
    val pDen = cells.values.map { case (s0, q0, _, q1) =>
      s0 * q1 * 1000L / q0
    }.sum
    assert((row.getAs[Long]("rev0"), row.getAs[Long]("rev1")) ===
      ((rev0, rev1)))
    assert(row.getAs[Long]("l_num_e3") === lNum)
    assert(row.getAs[Long]("p_den_e3") === pDen)
    val l = BigInt(lNum) * 1000000 / (BigInt(rev0) * 1000)
    val p = BigInt(rev1) * 1000000 * 1000 / pDen
    assert(row.getAs[Long]("laspeyres_ppm") === l.toLong)
    assert(row.getAs[Long]("paasche_ppm") === p.toLong)
    val f = row.getAs[Long]("fisher_ppm")
    assert(f === math.floor(
      math.sqrt((l * p).toDouble)).toLong)
    assert(f >= math.min(l.toLong, p.toLong) &&
      f <= math.max(l.toLong, p.toLong), "geometric-mean bound")
  }

  test("weekday envelope and new-vs-returning replay brute-force " +
      "with their ordering invariants") {
    // envelope: p25 <= p50 <= p75 and exact order-statistic replay
    val env = SparkEntry.queries("q_weekday_envelope")(spark, sf)
      .collect()
    assert(env.nonEmpty)
    val daily = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .select($"event_type", to_date($"ts").as("day"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("c"))
      .withColumn("dow", dayofweek($"day").cast("long"))
      .select($"event_type", $"dow", $"day".cast("string"), $"c")
      .as[(String, Long, String, Long)].collect()
    env.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("dow"))
      val xs = daily.filter(x => (x._1, x._2) == key)
        .sortBy(x => (x._4, x._3)).map(_._4)
      val n = xs.length.toLong
      assert(r.getAs[Long]("n_days") === n, key)
      assert(r.getAs[Long]("p25") === xs(((n + 3) / 4 - 1).toInt))
      assert(r.getAs[Long]("p50") === xs(((n + 1) / 2 - 1).toInt))
      assert(r.getAs[Long]("p75") === xs(((3 * n + 3) / 4 - 1).toInt))
      assert(r.getAs[Long]("p25") <= r.getAs[Long]("p50"))
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p75"))
    }
    // new vs returning: weekly mix replay; the first observed week is
    // all-new and sums telescope to the purchaser count
    val nvr = SparkEntry.queries("q_new_vs_returning")(spark, sf)
      .collect()
      .map(r => r.getAs[java.sql.Date]("week").toString ->
        ((r.getAs[Long]("n_new"), r.getAs[Long]("n_returning"))))
      .toMap
    val pw = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        date_trunc("week", $"ts").cast("date").cast("string"))
      .distinct().as[(Long, String)].collect()
    val firstW = pw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = pw.groupBy(_._2).map { case (w, rs) =>
      w -> ((rs.count(r => firstW(r._1) == w).toLong,
        rs.count(r => firstW(r._1) != w).toLong))
    }
    assert(nvr === want)
    val weeks = nvr.keys.toSeq.sorted
    assert(nvr(weeks.head)._2 === 0L, "first week cannot have returners")
    assert(nvr.values.map(_._1).sum === firstW.size.toLong,
      "every purchaser is new exactly once")
  }

  test("return-rate outliers: the cross-multiplied z-squared replays " +
      "in BigInt and the flag rate sits near the one-sided null rate") {
    val rows = SparkEntry.queries("q_return_rate_outliers")(spark, sf)
      .collect().map(r => r.getAs[Long]("l_suppkey") -> r).toMap
    assert(rows.nonEmpty)
    val cells = Tables.lineitem(spark, sf)
      .select($"l_suppkey",
        when($"l_returnflag" === "R", 1L).otherwise(0L))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    val nn = cells.values.map(_._1).sum
    val rr = cells.values.map(_._2).sum
    assert(rows.keySet === cells.keySet)
    var flagged = 0
    cells.foreach { case (k, (n, r)) =>
      val row = rows(k)
      assert((row.getAs[Long]("n"), row.getAs[Long]("r")) === ((n, r)))
      assert(row.getAs[Long]("rate_ppm") === r * 1000000L / n)
      assert(row.getAs[Long]("excess_ppm") ===
        r * 1000000L / n - rr * 1000000L / nn)
      val diff = BigInt(r) * nn - BigInt(rr) * n
      val want = diff > 0 &&
        diff * diff * 100 >= BigInt(384) * n * rr * (nn - rr)
      assert(row.getAs[Boolean]("high_outlier") === want, s"s$k")
      if (want) flagged += 1
    }
    // random return flags => flag share near the 2.5% one-sided null
    // rate, and certainly nowhere near the 50% a broken contrast gives
    assert(flagged.toDouble / cells.size < 0.10,
      s"flag rate ${flagged.toDouble / cells.size} too high for null data")
  }

  test("map functions: create/keys/values/concat/element_at") {
    val df = Tables.nation(spark, sf)
      .select($"n_name", $"n_regionkey",
        map(lit("region"), $"n_regionkey".cast("string"),
          lit("name"), $"n_name").as("m"))
      .withColumn("m2", map_concat($"m",
        map(lit("extra"), lit("x"))))
    val r = df.collect()(0)
    val m2 = r.getAs[Map[String, String]]("m2")
    assert(m2.keySet === Set("region", "name", "extra"))
    assert(df.select(element_at($"m", "name")).collect()(0).getString(0)
      === r.getString(0))
    assert(df.select(map_keys($"m")).collect()(0).getSeq[String](0).sorted
      === Seq("name", "region"))
  }

  test("describe/summary produce the standard statistics rows") {
    val desc = Tables.orders(spark, sf).describe("o_totalprice")
      .collect().map(_.getString(0)).toSet
    assert(Set("count", "mean", "stddev", "min", "max").subsetOf(desc))
    val summ = Tables.orders(spark, sf).select("o_totalprice")
      .summary("25%", "50%", "75%").collect().map(_.getString(0)).toSet
    assert(summ === Set("25%", "50%", "75%"))
  }

  test("seeded sample is deterministic and approximately sized") {
    val li = Tables.lineitem(spark, sf)
    val a = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(a === b)
    val n = li.count()
    assert(a > n / 20 && a < n / 5, s"sample size $a of $n")
  }

  test("seeded randomSplit partitions without overlap or loss") {
    // orders has a unique key; lineitem's (orderkey, linenumber) pairs
    // are NOT unique in the synthetic data, which would make the
    // value-based intersect check meaningless
    val o = Tables.orders(spark, sf).select($"o_orderkey")
    val Array(tr, te) = o.randomSplit(Array(0.8, 0.2), seed = 7)
    assert(tr.count() + te.count() === o.count())
    assert(tr.intersect(te).count() === 0)
  }

  test("monotonically_increasing_id yields unique ids") {
    val ids = Tables.customer(spark, sf)
      .withColumn("id", monotonically_increasing_id())
    assert(ids.select("id").distinct().count() === ids.count())
  }

  test("q_grouping_sets: detail, subtotal, and grand-total tiers " +
      "reconcile exactly") {
    val rows = SparkEntry.queries("q_grouping_sets")(spark, sf).collect()
    val detail = rows.filter(r => r.getAs[Long]("g_flag") == 0L &&
      r.getAs[Long]("g_status") == 0L)
    val subtotal = rows.filter(r => r.getAs[Long]("g_flag") == 0L &&
      r.getAs[Long]("g_status") == 1L)
    val grand = rows.filter(r => r.getAs[Long]("g_flag") == 1L)
    assert(grand.length === 1)
    assert(detail.nonEmpty && subtotal.nonEmpty)
    assert(rows.length === detail.length + subtotal.length + 1)
    // counts roll up tier by tier
    val total = Tables.lineitem(spark, sf).count()
    assert(detail.map(_.getAs[Long]("n")).sum === total)
    assert(subtotal.map(_.getAs[Long]("n")).sum === total)
    assert(grand.head.getAs[Long]("n") === total)
    // each flag subtotal equals the sum of its detail rows
    subtotal.foreach { st =>
      val flag = st.getAs[String]("l_returnflag")
      val mine = detail.filter(_.getAs[String]("l_returnflag") == flag)
      assert(st.getAs[Long]("n") === mine.map(_.getAs[Long]("n")).sum)
      assert(st.getAs[String]("l_linestatus") === null)
    }
  }

  test("q_lateral_topk equals the window-rank top-N-per-group " +
      "formulation") {
    val got = SparkEntry.queries("q_lateral_topk")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("r_name"), r.getAs[String]("c_name"),
        r.getAs[Double]("c_acctbal"))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"r_regionkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val want = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sf),
        $"n_regionkey" === $"r_regionkey")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"r_name", $"c_name", $"c_acctbal")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.size === 15, "5 regions x top 3")
  }

  test("q_recursive_paths equals an iterative driver-side expansion " +
      "of the transition matrix") {
    val got = SparkEntry.queries("q_recursive_paths")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("depth"),
        r.getAs[Long]("w_e6"))).toSet
    // brute: transition counts from per-user ordered event sequences
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts"), $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pairs = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(e => (e._3, e._4)).map(_._2)
      ordered.zip(ordered.tail)
    }
    val cnt = pairs.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val tot = cnt.groupBy(_._1._1).map { case (p, m) =>
      p -> m.values.sum
    }
    var frontier = Seq(("signup", "signup", 0L, 1000000L))
    var all = frontier
    (1 to 3).foreach { _ =>
      frontier = frontier.flatMap { case (path, last, d, w) =>
        cnt.collect { case ((p, n), c) if p == last =>
          (s"$path>$n", n, d + 1, w * c / tot(last))
        }
      }
      all ++= frontier
    }
    val want = all.map(x => (x._1, x._3, x._4)).toSet
    assert(got === want)
    // every depth-d weight family over one prefix must conserve mass
    // only approximately (integer div floors) — check bounds instead
    got.groupBy(t => (t._1.split(">").init.mkString(">"), t._2))
      .foreach { case (_, xs) =>
        assert(xs.forall(x => x._3 >= 0L && x._3 <= 1000000L))
      }
  }

  test("q_skyline_pareto equals the brute-force O(n^2) dominance scan") {
    val sky = SparkEntry.queries("q_skyline_pareto")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val pts = graft.Tables.part(spark, sf).select($"p_partkey",
        ($"p_retailprice".cast("decimal(12,2)") * 100).cast("long"),
        $"p_size".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, price, size) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= price && s2 >= size && (p2 < price || s2 > size)
      }
    }.toSet
    assert(sky === brute,
      s"skyline mismatch: extra=${sky -- brute} missing=${brute -- sky}")
    assert(sky.nonEmpty)
  }

  test("q_set_ops_all: bag semantics equal the multiset identities " +
    "max(a-b,0) and min(a,b)") {
    val rows = SparkEntry.queries("q_set_ops_all")(spark, sf).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[String]("l_returnflag"),
        r.getAs[String]("l_linestatus")) -> r.getAs[Long]("n")).toMap
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_returnflag", $"l_linestatus")
      .as[(Long, String, String)].collect().toSeq
    val a = li.filter(_._1 % 2 == 0).groupBy(r => (r._2, r._3))
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val b = li.filter(_._1 % 2 != 0).groupBy(r => (r._2, r._3))
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val keys = a.keySet ++ b.keySet
    keys.foreach { case (f, st) =>
      val ex = math.max(a((f, st)) - b((f, st)), 0L)
      val in = math.min(a((f, st)), b((f, st)))
      assert(rows.getOrElse(("except_all", f, st), 0L) === ex,
        s"$f/$st except")
      assert(rows.getOrElse(("intersect_all", f, st), 0L) === in,
        s"$f/$st intersect")
    }
    assert(rows.nonEmpty)
  }

  test("q_cohort_ltv: the cumulative curve telescopes per cohort and " +
    "is monotone non-decreasing (revenue never un-happens)") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cohort_week")).foreach {
      case (cw, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("week_n"))
        var cum = 0L
        sorted.foreach { r =>
          cum += r.getAs[Long]("cents")
          assert(r.getAs[Long]("cum_cents") === cum, s"$cw telescoping")
          assert(r.getAs[Long]("ltv_per_user_cents") ===
            cum / r.getAs[Long]("cohort_users"), s"$cw ltv")
        }
        // cohort size is constant within a cohort
        assert(rs.map(_.getAs[Long]("cohort_users")).toSet.size === 1)
    }
  }

  test("q_try_funcs: null accounting follows each absorber's failure " +
    "rule exactly") {
    val rows = SparkEntry.queries("q_try_funcs")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("div5")).toSet === Set(0L, 1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val (d, n) = (r.getAs[Long]("div5"), r.getAs[Long]("n"))
      // try_divide: null exactly when the divisor class is 0
      assert(r.getAs[Long]("n_div_null") === (if (d == 0) n else 0L))
      // try_cast: every '1-URGENT'-style priority fails the INT cast
      assert(r.getAs[Long]("n_prio_null") === n)
      // try_element_at on a 3-long array: index d+2 in [2,6] misses
      // for d >= 2
      assert(r.getAs[Long]("n_oob_null") === (if (d >= 2) n else 0L))
      if (d > 0) assert(r.getAs[Double]("min_ratio") <=
        r.getAs[Double]("max_ratio"))
    }
  }

  test("q_variant_extract: variant_get agrees with get_json_object " +
      "row-for-row; missing-path guard counts every row") {
    val rows = SparkEntry.queries("q_variant_extract")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    import spark.implicits._
    val want = Tables.events(spark, sf)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.foreach { r =>
      val (n, sk, mn, mx) = want(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("sum_k") === sk)
      assert(r.getAs[Long]("min_k") === mn)
      assert(r.getAs[Long]("max_k") === mx)
      // '$.missing' resolves to variant-null on every row
      assert(r.getAs[Long]("n_missing") === n)
    }
  }
}
