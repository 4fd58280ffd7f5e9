package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the experimentation / feature-engineering operators
  * (ops/FeatureQueries) beyond the hash oracle: cell-partition
  * identities, statistic ranges, and monotonicity the SQL compare
  * can't state. */
class FeatureSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("A/B cells partition each series and z2 is non-negative") {
    val rows = SparkEntry.queries("q_ab_test")(spark, sf).collect()
    val perType = Tables.events(spark, sf)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet ===
      perType.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") ===
        perType(r.getAs[String]("event_type")))
      assert(r.getAs[Long]("x_a") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("x_b") <= r.getAs[Long]("n_b"))
      assert(r.getAs[Double]("z2") >= 0.0)
      // z2 == 0 exactly when the scaled proportions are identical
      assert((r.getAs[Double]("z2") == 0.0) ===
        (r.getAs[Long]("diff") == 0L))
    }
  }

  test("chi-square cells reconstruct their marginals; contribs >= 0") {
    val rows = SparkEntry.queries("q_chi_square")(spark, sf).collect()
    val n = rows.head.getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("observed")).sum === n)
    // per-lang observed cells must sum to the lang's row_tot
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("observed")).sum ===
        cells.head.getAs[Long]("row_tot"))
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("contrib") >= 0.0)
      assert(r.getAs[Double]("expected") > 0.0)
    }
  }

  test("Gini split: sides partition, impurity in [0, 1/2], n_l monotone") {
    val rows = SparkEntry.queries("q_gini_split")(spark, sf)
      .orderBy($"threshold").collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_l") + r.getAs[Long]("n_r") ===
        r.getAs[Long]("n"))
      if (!r.isNullAt(r.fieldIndex("gini"))) {
        val g = r.getAs[Double]("gini")
        assert(g >= 0.0 && g <= 0.5 + 1e-12)
      }
    }
    val nls = rows.map(_.getAs[Long]("n_l"))
    assert(nls.zip(nls.tail).forall { case (a, b) => a <= b })
  }

  test("LOO target encoding excludes the row's own label") {
    val df = SparkEntry.queries("q_target_encode")(spark, sf)
    assert(df.count() === Tables.documents(spark, sf).count())
    // reconstruct each category's full sum from any member row:
    // loo_num + y must be constant per source (the category's sum_y)
    val perSource = df.groupBy($"source")
      .agg(countDistinct($"loo_num" + $"y").as("distinct_sums"),
        max($"loo_num" + $"y").as("sum_y"), count(lit(1)).as("cnt"),
        sum($"y").as("check_sum"))
      .collect()
    perSource.foreach { r =>
      assert(r.getAs[Long]("distinct_sums") === 1L)
      assert(r.getAs[Long]("sum_y") === r.getAs[Long]("check_sum"))
    }
    // encodings are proportions in [0, 1]
    val bad = df.filter($"loo" < 0.0 || $"loo" > 1.0).count()
    assert(bad === 0L)
  }

  test("quantile normalization recovers exact per-source order " +
      "statistics and a floored-mean reference") {
    val rows = SparkEntry.queries("q_quantile_normalize")(spark, sf)
      .collect()
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = docs(src).map(_._2).sorted
      assert(rs.length === 21, s"$src grid incomplete")
      rs.foreach { r =>
        val p = r.getAs[Long]("p").toInt
        val idx = ((sorted.length - 1).toLong * p / 20).toInt
        assert(r.getAs[Long]("value") === sorted(idx),
          s"$src p=$p order statistic mismatch")
      }
    }
    rows.groupBy(_.getAs[Long]("p")).foreach { case (p, rs) =>
      val vals = rs.map(_.getAs[Long]("value"))
      val want = vals.sum * 1000000L / vals.length
      assert(rs.map(_.getAs[Long]("ref_e6")).toSet === Set(want),
        s"p=$p reference mean mismatch")
    }
  }

  test("q_delta_method_ratio: ratio, SE, and Wald band replay from " +
    "brute per-user moments; the band brackets the ratio") {
    val got = SparkEntry.queries("q_delta_method_ratio")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val perUser = Tables.events(spark, sf)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .filter($"cents".isNotNull)
      .groupBy($"event_type", $"user_id")
      .agg(sum($"cents").as("x"), count(lit(1)).as("y"))
      .as[(String, Long, Long, Long)].collect().toSeq
    perUser.groupBy(_._1).foreach { case (ty, rs) =>
      val n = rs.length.toDouble
      val sx = rs.map(_._3).sum.toDouble
      val sy = rs.map(_._4).sum.toDouble
      val sxx = rs.map(r => r._3.toDouble * r._3).sum
      val sxy = rs.map(r => r._3.toDouble * r._4).sum
      val syy = rs.map(r => r._4.toDouble * r._4).sum
      val r0 = sx / sy
      val (vx, vxy, vy) =
        (n * sxx - sx * sx, n * sxy - sx * sy, n * syy - sy * sy)
      val qf = vx - 2.0 * r0 * vxy + r0 * r0 * vy
      if (rs.length > 1 && qf > 0) {
        val se = math.sqrt(qf / (n - 1.0)) / sy
        val row = got(ty)
        // brute doubles accumulate in a different order: 1-unit slack
        assert((row.getAs[Long]("r_e6") -
          math.floor(r0 * 1e6).toLong).abs <= 1, s"$ty r")
        assert((row.getAs[Long]("se_e9") -
          math.floor(se * 1e9).toLong).abs <= 1, s"$ty se")
        assert(row.getAs[Long]("ci_lo_e6") <= row.getAs[Long]("r_e6"))
        assert(row.getAs[Long]("ci_hi_e6") >= row.getAs[Long]("r_e6"))
      }
    }
    assert(got.nonEmpty)
  }

  test("q_srm_check: counts partition each series and the chi-square " +
    "alarm replays exactly") {
    val rows = SparkEntry.queries("q_srm_check")(spark, sf).collect()
    val counts = Tables.events(spark, sf)
      .select($"event_type", ($"user_id" % 2 === 0).as("a"))
      .as[(String, Boolean)].collect().toSeq.groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val (na, nb) = (counts(ty).count(_._2).toLong,
        counts(ty).count(!_._2).toLong)
      assert(r.getAs[Long]("n_a") === na)
      assert(r.getAs[Long]("n_b") === nb)
      val chi2 = (na - nb) * (na - nb) * 1000L / (na + nb)
      assert(r.getAs[Long]("chi2_e3") === chi2)
      assert(r.getAs[Boolean]("srm_alarm") === (chi2 > 10828L))
    }
    assert(rows.length === counts.size)
  }

  test("q_cuped: theta and variance reduction replay from brute " +
    "per-user moments; reduction equals corr^2 in [0, 1]") {
    val got = SparkEntry.queries("q_cuped")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val users = Tables.events(spark, sf)
      .select($"event_type", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (datediff($"ts".cast("date"), lit("1970-01-01").cast("date"))
          % 2 === 0).as("pre"))
      .filter($"cents".isNotNull)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    users.groupBy(_._1).foreach { case (ty, rs) =>
      val perUser = rs.groupBy(_._2).values.map { es =>
        (es.filter(_._4).map(_._3).sum, es.filterNot(_._4).map(_._3).sum)
      }.toSeq
      val n = perUser.length.toDouble
      val sx = perUser.map(_._1).sum.toDouble
      val sy = perUser.map(_._2).sum.toDouble
      val sxy = perUser.map(p => p._1.toDouble * p._2).sum
      val sxx = perUser.map(p => p._1.toDouble * p._1).sum
      val syy = perUser.map(p => p._2.toDouble * p._2).sum
      val (cov, vx, vy) =
        (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      if (vx > 0 && vy > 0) {
        val row = got(ty)
        assert(row.getAs[Long]("n_users") === perUser.length.toLong)
        // brute double sums differ from the engine's exact-int
        // moments only in accumulation order: compare to 1 grid unit
        assert((row.getAs[Long]("theta_e6") -
          math.floor(cov * 1e6 / vx).toLong).abs <= 1, s"$ty theta")
        val vr = row.getAs[Long]("var_red_ppm")
        assert((vr - math.floor(cov * cov * 1e6 / (vx * vy)).toLong)
          .abs <= 1, s"$ty vr")
        // corr^2 bound
        assert(vr >= 0L && vr <= 1000000L, s"$ty vr range")
      }
    }
    assert(got.nonEmpty)
  }
}
