package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the eval-metric operators (ops/EvalQueries) that the
  * hash-compare oracle can't express: algebraic identities between the
  * emitted integer cells and the derived ratios. */
class EvalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("confusion cells partition the corpus; F1 is the harmonic mean") {
    val r = SparkEntry.queries("q_eval_confusion")(spark, sf).head()
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val n = Tables.documents(spark, sf).count()
    assert(tp + fp + fn + tn === n)
    val (p, rec, f1) = (r.getAs[Double]("precision"),
      r.getAs[Double]("recall"), r.getAs[Double]("f1"))
    assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-12)
    // harmonic mean lies between min and max of its arguments
    assert(f1 >= math.min(p, rec) - 1e-12 && f1 <= math.max(p, rec) + 1e-12)
  }

  test("kappa cells are consistent and kappa == num/den in [-1, 1]") {
    val r = SparkEntry.queries("q_eval_kappa")(spark, sf).head()
    assert(r.getAs[Long]("n11") + r.getAs[Long]("n10") +
      r.getAs[Long]("n01") + r.getAs[Long]("n00") === r.getAs[Long]("n"))
    assert(r.getAs[Long]("agree") ===
      r.getAs[Long]("n11") + r.getAs[Long]("n00"))
    val k = r.getAs[Double]("kappa")
    assert(k === r.getAs[Long]("kappa_num").toDouble /
      r.getAs[Long]("kappa_den"))
    assert(k >= -1.0 && k <= 1.0)
  }

  test("MRR covers every (series, day) query and stays in [0, 1]") {
    val rows = SparkEntry.queries("q_eval_mrr")(spark, sf).collect()
    val expected = Tables.events(spark, sf)
      .select($"event_type", $"ts".cast("date").as("day")).distinct()
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_queries") === expected(t))
      val mrr = r.getAs[Double]("mrr")
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(r.getAs[Long]("n_with_hit") <= r.getAs[Long]("n_queries"))
      // no-hit queries contribute exactly zero: sum_rr_e6 == 0 iff no hits
      assert((r.getAs[Long]("sum_rr_e6") > 0) ===
        (r.getAs[Long]("n_with_hit") > 0))
    }
    assert(rows.nonEmpty)
  }

  test("AUC is num/den in [0,1] and counts partition each language") {
    val rows = SparkEntry.queries("q_eval_auc")(spark, sf).collect()
    val perLang = Tables.documents(spark, sf)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet === perLang.keySet)
    rows.foreach { r =>
      val (np, nn) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
      assert(np + nn === perLang(r.getAs[String]("lang")))
      val auc = r.getAs[Double]("auc")
      assert(auc === r.getAs[Long]("auc_num").toDouble / (2 * np * nn))
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("AUC equals the O(n^2) pair-counting definition on one language") {
    // independent model: concordant pairs + half ties over pos×neg
    val docs = Tables.documents(spark, sf)
      .filter($"lang" === "en")
      .select($"n_chars", ($"doc_id" % 3 =!= 0).as("gold")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    val num2 = pos.iterator.map { p =>
      2L * neg.count(_ < p) + neg.count(_ == p)
    }.sum
    val expected = num2.toDouble / (2L * pos.length * neg.length)
    val got = SparkEntry.queries("q_eval_auc")(spark, sf)
      .filter($"lang" === "en").head().getAs[Double]("auc")
    assert(got === expected)
  }

  test("micro-NDCG is in (0,1] and ideal ordering dominates retrieval") {
    val rows = SparkEntry.queries("q_eval_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, i) = (r.getAs[Long]("dcg_e6"), r.getAs[Long]("idcg_e6"))
      assert(d <= i)            // ideal re-rank can only raise the sum
      assert(d > 0 && i > 0)
      assert(r.getAs[Double]("ndcg_micro") === d.toDouble / i)
    }
  }

  test("RBO curve: prefix intersections and cumulative score are " +
      "monotone, bounded, and match a brute list replay") {
    val rows = SparkEntry.queries("q_rbo")(spark, sf)
      .orderBy($"d".asc).collect()
    assert(rows.length === ops.EvalQueries.RboK)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("x_d") <= b.getAs[Long]("x_d"))
      assert(a.getAs[Long]("rbo_e9") <= b.getAs[Long]("rbo_e9"))
    case _ => }
    rows.foreach { r =>
      assert(r.getAs[Long]("x_d") <= r.getAs[Long]("d"))
      assert(r.getAs[Long]("a_e6") <= 1000000L)
    }
    assert(rows.last.getAs[Long]("rbo_e9") <= 1000000000L)
    // brute replay: build both rankings from the exact metric units
    // and count prefix intersections directly
    val m = SparkEntry.queries("q_eval_rrf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("rank_rev"),
        r.getAs[Long]("rank_qty")))
    // rrf output is top-20 only; recompute mx from full ranks instead
    import graft.Tables
    val li = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") * 100)
        .cast("long") * (lit(100L) - ($"l_discount".cast("decimal(4,2)")
        * 100).cast("long"))).as("rev"),
        sum(($"l_quantity".cast("decimal(18,2)") * 100).cast("long"))
          .as("qty"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byRev = li.sortBy(t => (-t._2, t._1)).map(_._1)
    val byQty = li.sortBy(t => (-t._3, t._1)).map(_._1)
    rows.take(20).foreach { r =>
      val dd = r.getAs[Long]("d").toInt
      val x = byRev.take(dd).toSet.intersect(byQty.take(dd).toSet).size
      assert(r.getAs[Long]("x_d") === x.toLong, s"X_$dd mismatch")
    }
    assert(m.nonEmpty) // rrf and rbo read the same ranking universe
  }

  test("isotonic calibration equals exact-rational PAVA floored to e6 " +
      "and is monotone") {
    val rows = SparkEntry.queries("q_isotonic_calibration")(spark, sf)
      .orderBy($"score".asc).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("iso_e6") <= b.getAs[Long]("iso_e6"),
          s"fit not monotone at ${b.getAs[Long]("score")}")
      case _ =>
    }
    // classic sequential PAVA over exact rationals (pool while the
    // previous block's rate >= the incoming rate; rational compare by
    // cross-multiplication), floored to e6 only at the end — must
    // equal the catalog's minimax-over-floored-rates fit because
    // floor is monotone and so commutes with both max and min
    val blocks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Int)] // (pooled pos, pooled n, bins pooled)
    rows.foreach { r =>
      var p = r.getAs[Long]("pos"); var n = r.getAs[Long]("n"); var c = 1
      while (blocks.nonEmpty &&
          blocks.last._1 * n >= p * blocks.last._2) {
        val (p0, n0, c0) = blocks.remove(blocks.size - 1)
        p += p0; n += n0; c += c0
      }
      blocks += ((p, n, c))
    }
    val expect = blocks.toSeq.flatMap { case (p, n, c) =>
      Seq.fill(c)(p * 1000000L / n)
    }
    assert(rows.map(_.getAs[Long]("iso_e6")).toSeq === expect)
  }

  test("calibration bins cover deciles; cells and gap are consistent") {
    val rows = SparkEntry.queries("q_eval_calibration")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("bin")).sorted === (0L to 9L).toArray)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      // per-bin mean prediction must sit inside the bin's decile range
      val mp = r.getAs[Double]("mean_pred")
      val b = r.getAs[Long]("bin")
      assert(mp >= b / 10.0 && mp < (b + 1) / 10.0)
      assert(math.abs(r.getAs[Double]("gap") -
        (r.getAs[Double]("obs_rate") - mp)) < 1e-12)
    }
  }

  test("q_eval_rrf: fused scores rebuild from the two rank columns and " +
      "every ranker's top-1 survives the fusion cut") {
    val got = SparkEntry.queries("q_eval_rrf")(spark, sf).collect()
    val nSupp = Tables.lineitem(spark, sf)
      .select($"l_suppkey").distinct().count()
    assert(got.length === math.min(20L, nSupp))
    got.foreach { r =>
      val (rr, rq) = (r.getAs[Long]("rank_rev"), r.getAs[Long]("rank_qty"))
      assert(r.getAs[Long]("rrf_e6") ===
        1000000L / (60L + rr) + 1000000L / (60L + rq))
    }
    // a doc ranked #1 by either ranker scores ≥ 1e6/61 + 1e6/(60+n)
    // which beats any doc outside both top-~n lists — top-1s must be
    // in the fused top-20
    assert(got.exists(_.getAs[Long]("rank_rev") === 1L))
    assert(got.exists(_.getAs[Long]("rank_qty") === 1L))
    // fused order is non-increasing in rrf_e6
    val scores = got.map(_.getAs[Long]("rrf_e6"))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
  }

  test("q_eval_pr_at_k matches a brute per-day rank recompute and the " +
      "ratios stay in range") {
    val got = SparkEntry.queries("q_eval_pr_at_k")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("tp_at_10"),
          r.getAs[Long]("n_rel"), r.getAs[Double]("precision_at_10"),
          r.getAs[Double]("recall_at_10"))).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", $"ts".cast("date").cast("string").as("day"),
        $"event_id", ($"user_id" % 3 =!= 0).as("rel"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))
    val want = raw.groupBy(_._1).map { case (typ, rows) =>
      val days = rows.groupBy(_._2)
      val tp = days.values.map { evs =>
        evs.sortBy(e => (-e._5, e._3)).take(10).count(_._4).toLong
      }.sum
      val nRel = rows.count(_._4).toLong
      typ -> ((days.size.toLong, tp, nRel))
    }
    assert(got.view.mapValues(v => (v._1, v._2, v._3)).toMap === want)
    got.values.foreach { case (nq, tp, nRel, p, r) =>
      assert(tp <= 10 * nq && tp <= nRel)
      assert(p === tp.toDouble / (nq * 10) && p >= 0.0 && p <= 1.0)
      assert(r === tp.toDouble / nRel && r >= 0.0 && r <= 1.0)
    }
  }

  test("q_eval_lift: deciles partition corpus and positives, capture " +
      "monotone to 100%, brute decile replay") {
    val rows = SparkEntry.queries("q_eval_lift")(spark, sf).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (1L to 10L))
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars".cast("long"))
      .as[(Long, Long)].collect().toSeq
    val n = docs.size.toLong
    val pAll = docs.count(_._1 % 3 != 0).toLong
    assert(rows.map(_.getAs[Long]("n_d")).sum === n)
    assert(rows.map(_.getAs[Long]("pos_d")).sum === pAll)
    // brute replay: sort by (score desc, id asc), SQL-ntile deal
    val sorted = docs.sortBy(t => (-t._2, t._1))
    val (q, r) = (n / 10, n % 10)
    val want = sorted.zipWithIndex.groupBy { case (_, i) =>
      if (i < r * (q + 1)) i / (q + 1) + 1 else (i - r) / q + 1
    }.view.mapValues(g =>
      (g.size.toLong, g.count(_._1._1 % 3 != 0).toLong)).toMap
    rows.foreach { row =>
      val d = row.getAs[Long]("decile")
      assert((row.getAs[Long]("n_d"), row.getAs[Long]("pos_d")) ===
        want(d.toInt), s"decile $d")
      assert(row.getAs[Long]("lift_ppm") ===
        row.getAs[Long]("pos_d") * n * 1000000L /
          (row.getAs[Long]("n_d") * pAll))
    }
    val caps = rows.map(_.getAs[Long]("capture_ppm"))
    assert(caps.zip(caps.tail).forall(p => p._1 <= p._2))
    assert(caps.last === 1000000L)
  }

  test("q_naive_bayes: confusion matrix replays from a brute Scala " +
      "fit; totals partition the held-out rows") {
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select($"event_type", dayofweek($"ts").cast("long").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        ($"event_id" % 2 === 0).as("is_train"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2, r._3 / 5000, r._4))
    val train = rows.filter(_._4)
    val test = rows.filterNot(_._4)
    val nTrain = train.length.toDouble
    val classes = train.map(_._1).distinct.sorted
    val kB = train.map(_._3).distinct.length.toDouble
    val nC = train.groupBy(_._1).view.mapValues(_.size).toMap
    val nCW = train.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
    val nCB = train.groupBy(r => (r._1, r._3)).view.mapValues(_.size).toMap
    def predict(w: Long, b: Long): String =
      classes.map { c =>
        val s = math.log((nC(c) + 1.0) / (nTrain + classes.length)) +
          math.log((nCW.getOrElse((c, w), 0) + 1.0) / (nC(c) + 7.0)) +
          math.log((nCB.getOrElse((c, b), 0) + 1.0) / (nC(c) + kB))
        (-s, c)
      }.min._2
    val brute = test.groupBy(r => (r._1, predict(r._2, r._3)))
      .view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_naive_bayes")(spark, sf).collect()
      .map(r => (r.getAs[String]("actual"),
        r.getAs[String]("predicted")) -> r.getAs[Long]("n")).toMap
    assert(got === brute)
    assert(got.values.sum === test.length.toLong,
      "confusion cells must partition the held-out set")
    got.keys.foreach { case (_, p) =>
      assert(classes.contains(p), "prediction outside train classes")
    }
  }

  test("q_crossval_nb: the complement-counts trick equals a naive " +
      "5x retrain, fold for fold") {
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select($"event_type", dayofweek($"ts").cast("long").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (pmod($"event_id" * lit(2654435761L), lit(4294967296L)) % 5)
          .as("fold"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3 / 5000, r._4))
    val kCls = rows.map(_._1).distinct.length
    val kB = rows.map(_._3).distinct.length.toDouble
    val classes = rows.map(_._1).distinct.sorted
    val got = SparkEntry.queries("q_crossval_nb")(spark, sf).collect()
      .map(r => r.getAs[Long]("fold") -> r).toMap
    assert(got.keySet === (0L until 5L).toSet)
    assert(got.values.map(_.getAs[Long]("n_rows")).sum ===
      rows.length.toLong, "folds must partition the rows")
    (0L until 5L).foreach { f =>
      // the NAIVE way: train on everything outside the fold
      val train = rows.filterNot(_._4 == f)
      val test = rows.filter(_._4 == f)
      val nTrain = train.length.toDouble
      val nC = train.groupBy(_._1).view.mapValues(_.size).toMap
      val nCW = train.groupBy(r => (r._1, r._2)).view
        .mapValues(_.size).toMap
      val nCB = train.groupBy(r => (r._1, r._3)).view
        .mapValues(_.size).toMap
      def predict(w: Long, b: Long): String =
        classes.map { c =>
          val nc = nC.getOrElse(c, 0)
          val sc = math.log((nc + 1.0) / (nTrain + kCls)) +
            math.log((nCW.getOrElse((c, w), 0) + 1.0) / (nc + 7.0)) +
            math.log((nCB.getOrElse((c, b), 0) + 1.0) / (nc + kB))
          (-sc, c)
        }.min._2
      val correct = test.count(r => predict(r._2, r._3) == r._1).toLong
      val row = got(f)
      assert(row.getAs[Long]("n_rows") === test.length.toLong,
        s"fold $f size")
      assert(row.getAs[Long]("n_correct") === correct, s"fold $f")
      assert(row.getAs[Long]("acc_e6") ===
        correct * 1000000L / test.length, s"fold $f acc")
    }
  }

  test("q_learning_curve: cumulative-counts models equal naive " +
      "per-threshold retrains; curve is well-formed") {
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select($"event_type", dayofweek($"ts").cast("long").as("w"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (pmod($"event_id" * lit(2654435761L), lit(4294967296L)) % 10)
          .as("band"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3 / 5000, r._4))
    val kCls = rows.map(_._1).distinct.length
    val kB = rows.map(_._3).distinct.length.toDouble
    val test = rows.filter(_._4 == 9)
    val got = SparkEntry.queries("q_learning_curve")(spark, sf)
      .collect().map(r => r.getAs[Long]("f") -> r).toMap
    assert(got.keySet === (1L to 9L).toSet)
    (1L to 9L).foreach { f =>
      val train = rows.filter(_._4 < f)
      val classes = train.map(_._1).distinct.sorted
      val nTrain = train.length.toDouble
      val nC = train.groupBy(_._1).view.mapValues(_.size).toMap
      val nCW = train.groupBy(r => (r._1, r._2)).view
        .mapValues(_.size).toMap
      val nCB = train.groupBy(r => (r._1, r._3)).view
        .mapValues(_.size).toMap
      def predict(w: Long, b: Long): String =
        classes.map { c =>
          val nc = nC(c)
          val sc = math.log((nc + 1.0) / (nTrain + kCls)) +
            math.log((nCW.getOrElse((c, w), 0) + 1.0) / (nc + 7.0)) +
            math.log((nCB.getOrElse((c, b), 0) + 1.0) / (nc + kB))
          (-sc, c)
        }.min._2
      val correct = test.count(r => predict(r._2, r._3) == r._1).toLong
      val row = got(f)
      assert(row.getAs[Long]("n_train") === train.length.toLong,
        s"f=$f train size")
      assert(row.getAs[Long]("n_test") === test.length.toLong)
      assert(row.getAs[Long]("n_correct") === correct, s"f=$f")
      assert(row.getAs[Long]("acc_e6") ===
        correct * 1000000L / test.length)
    }
    // nested training sets: n_train strictly increases with f
    (1L until 9L).foreach(f => assert(
      got(f).getAs[Long]("n_train") < got(f + 1).getAs[Long]("n_train")))
  }

  test("q_position_bias: COEC replays from the brute position table " +
    "and the corpus-wide COEC is 1 up to floor dust") {
    val rows = SparkEntry.queries("q_position_bias")(spark, sf).collect()
    val imps = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"), $"event_id",
        ($"user_id" % 3 === 0).as("clicked"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .as[(String, java.sql.Date, Long, Boolean, Long)].collect().toSeq
      .groupBy(r => (r._1, r._2)).values.flatMap { day =>
        day.sortBy(r => (-r._5, r._3)).take(10).zipWithIndex
          .map { case (r, i) => (r._1, i + 1L, r._4) }
      }.toSeq
    val prior = imps.groupBy(_._2).map { case (p, xs) =>
      p -> xs.count(_._3).toLong * 1000000L / xs.size
    }
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val mine = imps.filter(_._1 == ty)
      val clicks = mine.count(_._3).toLong
      val expected = mine.map(x => prior(x._2)).sum
      assert(r.getAs[Long]("n_imps") === mine.size.toLong, s"$ty imps")
      assert(r.getAs[Long]("clicks") === clicks, s"$ty clicks")
      assert(r.getAs[Long]("expected_ppm") === expected, s"$ty exp")
      assert(r.getAs[Long]("coec_e3") ===
        clicks * 1000000000L / expected, s"$ty coec")
    }
    // identity: summed over everything, clicks == expected clicks
    // (each prior floors at most 1 ppm per impression)
    val totClicks = rows.map(_.getAs[Long]("clicks")).sum * 1000000L
    val totExp = rows.map(_.getAs[Long]("expected_ppm")).sum
    val dust = rows.map(_.getAs[Long]("n_imps")).sum
    assert((totClicks - totExp).abs <= dust, "global COEC != 1")
  }

  test("q_stump_boost: both rounds replay from a brute split search " +
    "and the round-2 residuals reconcile with round 1's leaves") {
    val rows = SparkEntry.queries("q_stump_boost")(spark, sf).collect()
    val data = Tables.events(spark, sf)
      .select($"event_type", hour($"ts").cast("long").as("f1"),
        dayofweek($"ts").cast("long").as("f2"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      .filter($"y".isNotNull)
      .as[(String, Long, Long, Long)].collect().toSeq
    def brute(pts: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val bins = pts.groupBy(_._1).view
        .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
      val order = bins.keys.toSeq.sorted
      val (n, stot) = (pts.size.toLong, pts.map(_._2).sum)
      var (nl, sl) = (0L, 0L)
      order.dropRight(1).map { b =>
        nl += bins(b)._1; sl += bins(b)._2
        val num = sl.toDouble * n - stot.toDouble * nl
        (num * num / (nl.toDouble * (n - nl)), b, nl, sl)
      }.maxBy(t => (t._1, -t._2)) match {
        case (sc, b, nl2, sl2) =>
          (b, nl2, n - nl2, sl2 / nl2, math.floor(sc).toLong)
      }
    }
    data.groupBy(_._1).foreach { case (ty, rs) =>
      val r1 = rows.find(r => r.getAs[String]("event_type") == ty &&
        r.getAs[Long]("round") == 1L).get
      val (sp1, nl1, nr1, ml1, sc1) = brute(rs.map(r => (r._2, r._4)))
      assert(r1.getAs[Long]("split") === sp1, s"$ty r1 split")
      assert(r1.getAs[Long]("n_l") === nl1)
      assert(r1.getAs[Long]("n_r") === nr1)
      assert(r1.getAs[Long]("mean_l") === ml1)
      assert(r1.getAs[Long]("score_e0") === sc1)
      // round 2 on the floored-leaf residuals
      val (mL, mR) = (r1.getAs[Long]("mean_l"), r1.getAs[Long]("mean_r"))
      val resid = rs.map(r =>
        (r._3, r._4 - (if (r._2 <= sp1) mL else mR)))
      val r2 = rows.find(r => r.getAs[String]("event_type") == ty &&
        r.getAs[Long]("round") == 2L).get
      val bins2 = resid.groupBy(_._1).view
        .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
      val order2 = bins2.keys.toSeq.sorted
      val (n2, s2tot) = (resid.size.toLong, resid.map(_._2).sum)
      var (nl, sl) = (0L, 0L)
      val best2 = order2.dropRight(1).map { b =>
        nl += bins2(b)._1; sl += bins2(b)._2
        val num = sl.toDouble * n2 - s2tot.toDouble * nl
        (num * num / (nl.toDouble * (n2 - nl)), b, nl, sl)
      }.maxBy(t => (t._1, -t._2))
      assert(r2.getAs[Long]("split") === best2._2, s"$ty r2 split")
      // residual means truncate toward zero like Spark div
      assert(r2.getAs[Long]("mean_l") === best2._4 / best2._3)
      // boosting property: a fitted round-1 leaves strictly less
      // variance to explain; scores are nonneg by construction
      assert(r1.getAs[Long]("score_e0") >= 0L)
      assert(r2.getAs[Long]("score_e0") >= 0L)
    }
    assert(rows.length === data.map(_._1).distinct.size * 2)
  }

  test("q_brier_score: per-language rows partition the corpus; the " +
    "integer grid bounds the score in [0, 1]") {
    val rows = SparkEntry.queries("q_brier_score")(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    rows.foreach { r =>
      val brier = r.getAs[Double]("brier")
      assert(brier >= 0.0 && brier <= 1.0)
      assert(r.getAs[Long]("brier_e6") ===
        r.getAs[Long]("sum_sq_e6") / r.getAs[Long]("n"))
      // the squared-error sum can never exceed the all-wrong corpus
      assert(r.getAs[Long]("sum_sq_e6") <= r.getAs[Long]("n") * 1000000L)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
    assert(rows.nonEmpty)
  }

  test("q_matthews_corr: cells partition the corpus and mcc_e6 replays " +
    "from the cells, invariant to partition count") {
    val r = SparkEntry.queries("q_matthews_corr")(spark, sf).head()
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp + fp + fn + tn === Tables.documents(spark, sf).count())
    val expect = math.floor((tp.toDouble * tn - fp.toDouble * fn) * 1e6 /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn)))
      .toLong
    assert(r.getAs[Long]("mcc_e6") === expect)
    assert(math.abs(r.getAs[Long]("mcc_e6")) <= 1000000L)
    // partition-count invariance of the floored double
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", 7)
    assert(SparkEntry.queries("q_matthews_corr")(alt, sf)
      .head().getAs[Long]("mcc_e6") === expect)
  }

  test("q_fbeta_per_class: marginals reconcile with the raw 3x3 table " +
    "and F-beta ordering follows the precision/recall gap") {
    val rows = SparkEntry.queries("q_fbeta_per_class")(spark, sf)
      .collect().map(r => r.getAs[Long]("cls") -> r).toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    val docs = Tables.documents(spark, sf)
      .select(($"n_chars" % 3).as("p"), ($"doc_id" % 3).as("g"))
      .groupBy($"p", $"g").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (c, r) =>
      val tp = docs.getOrElse((c, c), 0L)
      val fp = docs.collect { case ((p, g), n) if p == c && g != c => n }.sum
      val fn = docs.collect { case ((p, g), n) if g == c && p != c => n }.sum
      assert(r.getAs[Long]("tp") === tp)
      assert(r.getAs[Long]("fp") === fp)
      assert(r.getAs[Long]("fn") === fn)
      assert(r.getAs[Long]("f1_e6") === tp * 2 * 1000000L /
        (2 * tp + fp + fn))
      // beta weights recall: recall<precision (fn>fp) => F2 <= F1 <= F0.5
      if (fn > fp) {
        assert(r.getAs[Long]("f2_e6") <= r.getAs[Long]("f1_e6") + 1)
        assert(r.getAs[Long]("f1_e6") <= r.getAs[Long]("f05_e6") + 1)
      } else if (fp > fn) {
        assert(r.getAs[Long]("f05_e6") <= r.getAs[Long]("f1_e6") + 1)
        assert(r.getAs[Long]("f1_e6") <= r.getAs[Long]("f2_e6") + 1)
      }
    }
  }

  test("q_brier_decomposition: BigInt replay; identity gap bounded " +
      "by the per-bin floor grid; resolution <= uncertainty") {
    val rows = SparkEntry.queries("q_brier_decomposition")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"n_chars", $"doc_id").collect()
      .map { r =>
        val p = math.min(r.getLong(1) * 1000 / 400, 1000L)
        (r.getString(0), p / 100,
          p, if (r.getLong(2) % 3 != 0) 1000L else 0L)
      }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val mine = docs.filter(_._1 == lang)
      val n = BigInt(mine.length)
      val pp = BigInt(mine.count(_._4 == 1000L))
      val sumSq = mine.map(d =>
        BigInt(d._3 - d._4) * (d._3 - d._4)).sum
      assert(r.getAs[Long]("n") === n.toLong)
      assert(r.getAs[Long]("n_pos") === pp.toLong)
      assert(r.getAs[Long]("brier_e6") === (sumSq / n).toLong)
      val bins = mine.groupBy(_._2).values
      val relSum = bins.map { b =>
        val nb = BigInt(b.length)
        val d = b.map(x => BigInt(x._3)).sum -
          1000 * b.count(_._4 == 1000L)
        d * d / nb
      }.sum
      val resSum = bins.map { b =>
        val nb = BigInt(b.length)
        val pos = BigInt(b.count(_._4 == 1000L))
        BigInt(1000000) * (pos * n - pp * nb) * (pos * n - pp * nb) /
          (nb * n * n)
      }.sum
      assert(r.getAs[Long]("rel_e6") === (relSum / n).toLong)
      assert(r.getAs[Long]("res_e6") === (resSum / n).toLong)
      val unc = BigInt(1000000) * pp * (n - pp) / (n * n)
      assert(r.getAs[Long]("unc_e6") === unc.toLong)
      // generalized Murphy identity (Stephenson et al. 2008): with
      // continuous forecasts binned by decile,
      // BS − (REL − RES + UNC) = within-bin variance − 2·covariance;
      // replay that term exactly and allow only the flooring grid
      // (≤ #bins + 4 floored emissions) around it
      val wbTerm = bins.map { b =>
        val nb = BigInt(b.length)
        val sf2 = b.map(x => BigInt(x._3) * x._3).sum
        val sfv = b.map(x => BigInt(x._3)).sum
        val sfy = b.map(x => BigInt(x._3) * x._4).sum
        val sy = b.map(x => BigInt(x._4)).sum
        (nb * sf2 - sfv * sfv - 2 * (nb * sfy - sfv * sy)) / nb
      }.sum / n
      assert(math.abs(r.getAs[Long]("decomp_gap_e6") -
        wbTerm.toLong) <= 15L,
        s"identity gap drifted from the within-bin term for $lang: " +
          s"${r.getAs[Long]("decomp_gap_e6")} vs $wbTerm")
      // resolution can never exceed uncertainty (law of total variance)
      assert(r.getAs[Long]("res_e6") <= r.getAs[Long]("unc_e6") + 1)
    }
  }
}
