package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{hour, unix_micros}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** As-of / banded range join semantics and scale-shape tests. */
class TemporalJoinsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._
  import ops.TemporalJoins._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("q_shapley_attribution: journey sets replay brute-force and " +
      "the efficiency axiom distributes exactly 12 per conversion") {
    val got = SparkEntry.queries("q_shapley_attribution")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect()
    val convTs = ev.filter(_._2 == "purchase").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val sets = ev.filter(r => r._2 != "purchase" &&
        convTs.get(r._1).exists(r._3 <= _))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nConv = sets.size.toLong
    val want = sets.values.toSeq.flatMap(s => s.map(_ -> s.size))
      .groupBy(_._1).map { case (ch, xs) =>
        ch -> ((xs.size.toLong, xs.count(_._2 == 1).toLong,
          xs.map(12L / _._2).sum))
      }
    assert(got.keySet === want.keySet)
    want.foreach { case (ch, (nj, excl, credit)) =>
      val r = got(ch)
      assert(r.getAs[Long]("n_journeys") === nj, ch)
      assert(r.getAs[Long]("n_exclusive") === excl, ch)
      assert(r.getAs[Long]("credit_12") === credit, ch)
      assert(r.getAs[Long]("n_conv") === nConv, ch)
      assert(r.getAs[Long]("share_ppm") ===
        credit * 1000000L / (12L * nConv), ch)
    }
    // efficiency: every conversion hands out exactly 12 credit units
    assert(want.values.map(_._3).sum === 12L * nConv)
  }

  test("q_bitemporal_snapshot: per-user beliefs replay brute-force " +
      "and a tx-visible argmax record forces revised = false") {
    val got = SparkEntry.queries("q_bitemporal_snapshot")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.nonEmpty)
    val recs = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    val vCut = (recs.map(_._2).min + recs.map(_._2).max) / 2
    val txCut = (recs.map(_._3).min + recs.map(_._3).max) / 2
    val valid = recs.filter(_._2 <= vCut)
    val byUser = valid.groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, rs) =>
      val full = rs.maxBy(r => (r._2, r._3))
      val txRs = rs.filter(_._3 <= txCut)
      val row = got(u)
      assert(row.getAs[Long]("believed_full_cents") === full._4, s"u$u")
      if (txRs.isEmpty) {
        assert(row.isNullAt(row.fieldIndex("believed_tx_cents")), s"u$u")
        assert(row.getAs[Boolean]("revised"), s"u$u null-revised")
      } else {
        val tx = txRs.maxBy(r => (r._2, r._3))
        assert(row.getAs[Long]("believed_tx_cents") === tx._4, s"u$u tx")
        assert(row.getAs[Boolean]("revised") === (tx._4 != full._4))
        // knowledge monotonicity: if the full argmax was already
        // visible at tx time, the beliefs coincide
        if (full._3 <= txCut)
          assert(!row.getAs[Boolean]("revised"), s"u$u monotone")
      }
    }
    // the audit finds SOME late revisions in this data (non-vacuous)
    assert(got.values.exists(_.getAs[Boolean]("revised")))
    assert(got.values.exists(r => !r.getAs[Boolean]("revised")))
  }

  // (key, ts, tag)
  private def lhs = Seq(
    (1L, ts(100), "p1"), (1L, ts(200), "p2"), (1L, ts(50), "p0"),
    (2L, ts(500), "p3")).toDF("k", "lts", "ltag")
  private def rhs = Seq(
    (1L, ts(90), "c1"), (1L, ts(100), "c2"), (1L, ts(150), "c3"),
    (3L, ts(10), "c4")).toDF("k", "rts", "rtag")

  test("asofJoin picks the latest right row at-or-before each left row") {
    val out = asofJoin(lhs, rhs, "k", "lts", "rts")
      .select($"ltag", $"rtag").as[(String, String)].collect().toMap
    // p1@100 ties with c2@100 (>= semantics) not c1@90
    assert(out("p1") === "c2")
    // p2@200: latest preceding is c3@150
    assert(out("p2") === "c3")
  }

  test("asofJoin is left-outer: no-match rows keep null payload") {
    val out = asofJoin(lhs, rhs, "k", "lts", "rts")
    assert(out.count() === 4, "every left row survives exactly once")
    val misses = out.filter($"rtag".isNull).select($"ltag")
      .as[String].collect().toSet
    // p0@50 precedes every key-1 click; key 2 has no clicks at all
    assert(misses === Set("p0", "p3"))
  }

  test("asofJoin plans exactly one shuffle (union + window, no join node)") {
    val out = asofJoin(lhs, rhs, "k", "lts", "rts")
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }.size
    assert(shuffles === 1, s"expected 1 exchange, got $shuffles:\n$plan")
  }

  test("rangeJoin matches the naive non-equi join, without a nested loop") {
    val naive = lhs.as("l").join(rhs.as("r"),
        $"l.k" === $"r.k" && $"r.rts" <= $"l.lts" &&
          $"r.rts" >= $"l.lts" - org.apache.spark.sql.functions
            .expr("INTERVAL 60 SECOND"))
      .select($"ltag", $"rtag").as[(String, String)].collect().toSet
    val banded = rangeJoin(lhs, rhs, "k", "lts", "rts", 60L)
      .select($"ltag", $"rtag").as[(String, String)].collect().toSet
    assert(banded === naive)
    assert(naive.contains(("p1", "c1")) && naive.contains(("p1", "c2")))
    val plan = rangeJoin(lhs, rhs, "k", "lts", "rts", 60L)
      .queryExecution.executedPlan
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"banded range join must not plan a nested loop:\n$plan")
  }

  test("rangeJoin window edges are inclusive on both bounds") {
    val l = Seq((1L, ts(1000), "p")).toDF("k", "lts", "ltag")
    val r = Seq((1L, ts(940), "exact_low"), (1L, ts(1000), "exact_hi"),
      (1L, ts(939), "below"), (1L, ts(1001), "above"))
      .toDF("k", "rts", "rtag")
    val got = rangeJoin(l, r, "k", "lts", "rts", 60L)
      .select($"rtag").as[String].collect().toSet
    assert(got === Set("exact_low", "exact_hi"))
  }

  test("intervalOverlapJoin matches the naive theta join, emits each pair once") {
    // intervals spanning MANY buckets (bucketSec=60, spans up to 400s)
    // so the emit-once rule is actually exercised
    val l = Seq((ts(0), ts(400), "a"), (ts(500), ts(520), "b"),
      (ts(1000), ts(1000), "c")).toDF("ls", "le", "ltag")
    val r = Seq((ts(100), ts(600), "x"), (ts(399), ts(401), "y"),
      (ts(700), ts(999), "z")).toDF("rs", "re", "rtag")
    val naive = l.as("l").join(r.as("r"),
        $"l.ls" <= $"r.re" && $"r.rs" <= $"l.le")
      .select($"ltag", $"rtag").as[(String, String)].collect()
    val banded = intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 60L)
      .select($"ltag", $"rtag").as[(String, String)].collect()
    // SAME multiset: equality of sets plus equality of sizes proves no
    // pair was double-emitted from a shared bucket
    assert(banded.toSet === naive.toSet)
    assert(banded.length === naive.length,
      s"duplicate emits: ${banded.length} vs ${naive.length}")
    assert(naive.toSet === Set(("a", "x"), ("a", "y"), ("b", "x")))
    val plan = intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 60L)
      .queryExecution.executedPlan
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"interval join must not plan a nested loop:\n$plan")
  }

  test("intervalOverlapJoin endpoints touch counts as overlap") {
    val l = Seq((ts(100), ts(200), "a")).toDF("ls", "le", "ltag")
    val r = Seq((ts(200), ts(300), "touch_hi"), (ts(0), ts(100), "touch_lo"),
      (ts(201), ts(300), "miss")).toDF("rs", "re", "rtag")
    val got = intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 60L)
      .select($"rtag").as[String].collect().toSet
    assert(got === Set("touch_hi", "touch_lo"))
  }

  test("catalog queries return attributed rows on sf data") {
    def q(n: String): DataFrame = SparkEntry.queries(n)(spark, sf)
    val asof = q("q_asof_attribution")
    assert(asof.count() > 0)
    // exactly one output row per purchase event
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(asof.count() === purchases)
    assert(q("q_range_join_banded").count() >= 0)
  }

  test("asofJoinForward picks the earliest right row at-or-after each left row") {
    val out = asofJoinForward(lhs, rhs, "k", "lts", "rts")
      .select($"ltag", $"rtag").as[(String, String)].collect().toMap
    // p1@100 ties with c2@100 (<= semantics), not c3@150
    assert(out("p1") === "c2")
    // p0@50: earliest following is c1@90
    assert(out("p0") === "c1")
  }

  test("asofJoinForward is left-outer: rows past the last right keep nulls") {
    val out = asofJoinForward(lhs, rhs, "k", "lts", "rts")
    assert(out.count() === 4, "every left row survives exactly once")
    val misses = out.filter($"rtag".isNull).select($"ltag")
      .as[String].collect().toSet
    // p2@200 follows every key-1 click; key 2 has no clicks at all
    assert(misses === Set("p2", "p3"))
  }

  test("asofJoinForward plans exactly one shuffle, like the backward join") {
    val out = asofJoinForward(lhs, rhs, "k", "lts", "rts")
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }.size
    assert(shuffles === 1, s"expected 1 exchange, got $shuffles:\n$plan")
  }

  test("q_asof_nearest: brute nearest-purchase replay; gap is |min| " +
      "of both directions, ties go backward") {
    val got = SparkEntry.queries("q_asof_nearest")(spark, sf).collect()
      .map(r => r.getAs[Long]("click_id") ->
        (Option(r.getAs[java.lang.Long]("nearest_purchase_id"))
          .map(_.toLong),
          Option(r.getAs[java.lang.Long]("nearest_gap_us"))
            .map(_.toLong),
          r.getAs[String]("direction"))).toMap
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"event_id", $"user_id",
        unix_micros($"ts").as("us")).collect()
    val purchByUser = ev.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("user_id")).view.mapValues { rows =>
        // same dedup as the query: one purchase per (user, ts), max id
        rows.groupBy(_.getAs[Long]("us")).map { case (us, g) =>
          us -> g.map(_.getAs[Long]("event_id")).max
        }.toSeq
      }.toMap
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
    assert(got.size === clicks.length)
    clicks.foreach { c =>
      val t = c.getAs[Long]("us")
      val cands = purchByUser.getOrElse(c.getAs[Long]("user_id"), Nil)
      val prev = cands.filter(_._1 <= t)
        .sortBy(_._1).lastOption
      val next = cands.filter(_._1 >= t)
        .sortBy(_._1).headOption
      val want = (prev, next) match {
        case (None, None) => (None, None, "none")
        case (Some((pts, pid)), None) =>
          (Some(pid), Some(t - pts), "backward")
        case (None, Some((nts, nid))) =>
          (Some(nid), Some(nts - t), "forward")
        case (Some((pts, pid)), Some((nts, nid))) =>
          if (t - pts <= nts - t) (Some(pid), Some(t - pts), "backward")
          else (Some(nid), Some(nts - t), "forward")
      }
      assert(got(c.getAs[Long]("event_id")) === want,
        s"click ${c.getAs[Long]("event_id")}")
    }
  }

  test("q_multitouch_attribution: exact brute recompute; credit is " +
      "conserved per purchase up to the division remainder") {
    val got = SparkEntry.queries("q_multitouch_attribution")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("click_hour") ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("credit_e6_cents")))
      .toMap
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"event_id", $"user_id",
        unix_micros($"ts").as("us"), hour($"ts").cast("long").as("hr"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
    val purch = ev.filter(_.getAs[String]("event_type") == "purchase")
    val wUs = 3600L * 1000000L
    var totalCreditWant = 0L
    val want = collection.mutable.Map[Long, (Long, Long)]()
    purch.foreach { p =>
      val touches = clicks.filter(c =>
        c.getAs[Long]("user_id") == p.getAs[Long]("user_id") &&
          c.getAs[Long]("us") <= p.getAs[Long]("us") &&
          c.getAs[Long]("us") >= p.getAs[Long]("us") - wUs)
      if (touches.nonEmpty) {
        val share = p.getAs[Long]("cents") * 1000000L / touches.size
        // conservation: shares differ from the purchase's credit by
        // strictly less than one per-touch unit of remainder
        assert(p.getAs[Long]("cents") * 1000000L -
          share * touches.size < touches.size)
        touches.foreach { c =>
          val h = c.getAs[Long]("hr")
          val (n0, s0) = want.getOrElse(h, (0L, 0L))
          want(h) = (n0 + 1, s0 + share)
          totalCreditWant += share
        }
      }
    }
    assert(got === want.toMap)
    assert(got.values.map(_._2).sum === totalCreditWant)
  }

  test("q_asof_forward emits one row per click with non-negative waits") {
    val out = SparkEntry.queries("q_asof_forward")(spark, sf).cache()
    val clicks = Tables.events(spark, sf)
      .filter($"event_type" === "click").count()
    assert(out.count() === clicks)
    assert(out.filter($"wait_us" < 0).count() === 0,
      "a forward match can never precede its click")
    out.unpersist()
  }
}
