package graft.scale

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch build/probe invariants: the guarantees the oracle can't see
  * (it only checks the final exact answers). */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sf)

  private lazy val cms: Array[Long] = {
    val agg = udaf(Sketches.CmsAgg)
    orders.agg(agg($"o_custkey")).head().getSeq[Long](0).toArray
  }

  test("CMS is conservative: estimate >= exact count for every key") {
    val est = graft.ext.CmsProbeExpr.estimate(
      $"o_custkey", cms, Sketches.CmsDepth, Sketches.CmsWidth)
    val bad = orders.groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .withColumn("est", est)
      .filter($"est" < $"n")
      .count()
    assert(bad === 0, "CMS under-counted a key — breaks the heavy-hitter guarantee")
  }

  test("CMS overestimate is small at this load factor") {
    val est = graft.ext.CmsProbeExpr.estimate(
      $"o_custkey", cms, Sketches.CmsDepth, Sketches.CmsWidth)
    val worst = orders.groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .withColumn("over", est - $"n")
      .agg(max($"over")).head().getLong(0)
    // 15k–150k increments over 5×65536 counters: min-of-5 collision
    // mass stays tiny; 10 is an order of magnitude of slack
    assert(worst <= 10, s"CMS overestimate $worst too large — width mis-sized")
  }

  test("CMS probe agrees between interpreted eval and codegen") {
    val keys = orders.select($"o_custkey").distinct().limit(500)
    val expr = graft.ext.CmsProbeExpr(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true),
      cms, Sketches.CmsDepth, Sketches.CmsWidth)
    val viaPlan = keys.withColumn("est", graft.ext.CmsProbeExpr.estimate(
        $"o_custkey", cms, Sketches.CmsDepth, Sketches.CmsWidth))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaEval = viaPlan.keys.map { k =>
      k -> expr.eval(org.apache.spark.sql.catalyst.InternalRow(k))
        .asInstanceOf[Long]
    }.toMap
    assert(viaPlan === viaEval, "codegen vs interpreted CMS probe diverge")
  }

  test("bloom has zero false negatives and a tiny false-positive rate") {
    val dim = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter($"n_name" === Sketches.BloomNation),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val agg = udaf(Sketches.BloomAgg)
    val bits = dim.agg(agg($"s_suppkey")).head().getSeq[Long](0).toArray
    val probe = graft.ext.BloomProbeExpr.probe(
      $"s_suppkey", bits, Sketches.BloomHashes)
    val all = Tables.supplier(spark, sf)
      .join(dim.withColumn("in_dim", lit(true)), Seq("s_suppkey"), "left")
      .withColumn("hit", probe)
    // no false negatives: every dim key must hit
    assert(all.filter($"in_dim" && !$"hit").count() === 0)
    // false positives bounded: non-dim keys that hit
    val nonDim = all.filter($"in_dim".isNull)
    val fp = nonDim.filter($"hit").count().toDouble
    val n = math.max(nonDim.count(), 1L).toDouble
    assert(fp / n < 0.01, s"bloom fp rate ${fp / n} too high")
  }

  test("bloom prejoin prunes most fact rows before the join") {
    val dim = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter($"n_name" === Sketches.BloomNation),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val agg = udaf(Sketches.BloomAgg)
    val bits = dim.agg(agg($"s_suppkey")).head().getSeq[Long](0).toArray
    val li = Tables.lineitem(spark, sf)
    val kept = li.filter(graft.ext.BloomProbeExpr.probe(
      $"l_suppkey", bits, Sketches.BloomHashes)).count()
    val total = li.count()
    val exact = li.join(dim, $"l_suppkey" === $"s_suppkey").count()
    assert(kept >= exact, "bloom dropped a matching fact row")
    assert(kept < total / 4,
      s"bloom kept $kept of $total rows — probe not selective")
  }

  test("KMV distinct estimate lands inside the 1/sqrt(K) error band") {
    val row = graft.SparkEntry.queries("q_approx_distinct_kmv")(spark, sf)
      .head()
    val est = row.getDouble(row.fieldIndex("est"))
    val exact = row.getLong(row.fieldIndex("n_exact")).toDouble
    val bound = 3.0 / math.sqrt(Sketches.KmvK) // 3 sigma
    assert(math.abs(est - exact) / exact <= bound,
      s"KMV estimate $est vs exact $exact outside ±${bound * 100}%")
  }

  test("sketch aggregators are merge-order independent") {
    val agg = udaf(Sketches.CmsAgg)
    val a = orders.repartition(17).agg(agg($"o_custkey"))
    val b = orders.repartition(3).agg(agg($"o_custkey"))
    // partial layout differs; merged table must not
    assert(a.head().getSeq[Long](0) === b.head().getSeq[Long](0))
  }

  test("q_count_min_table: estimates replay from a brute 4x256 table, " +
      "never undercount, and honor the epsilon bound flag") {
    val rows = graft.SparkEntry.queries("q_count_min_table")(
      SparkTestSession.spark, sf).collect()
    assert(rows.length === 10)
    val users = Tables.events(SparkTestSession.spark, sf)
      .select($"user_id").as[Long].collect()
    val as = Seq(1000003L, 48271L, 69621L, 40692L)
    val cells = scala.collection.mutable.Map
      .empty[(Int, Long), Long].withDefaultValue(0L)
    users.foreach(u => as.indices.foreach(i =>
      cells((i, (u + 1) * as(i) % 2147483647L % 256L)) += 1L))
    val exact = users.groupBy(identity).view.mapValues(_.length.toLong)
    val expectTop = exact.toSeq.sortBy { case (u, c) => (-c, u) }.take(10)
    assert(rows.map(r => r.getAs[Long]("user_id") ->
      r.getAs[Long]("exact_cnt")).sortBy(p => (-p._2, p._1)).toSeq
      === expectTop)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val est = as.indices
        .map(i => cells((i, (u + 1) * as(i) % 2147483647L % 256L))).min
      assert(r.getAs[Long]("est_cnt") === est, s"user $u est")
      assert(r.getAs[Long]("overcount") >= 0L, s"user $u CMS undercounted")
      assert(r.getAs[Long]("n_total") === users.length.toLong)
      assert(r.getAs[Boolean]("within_bound") ===
        (r.getAs[Long]("overcount") * 256L <= users.length.toLong * 2L))
    }
  }

  /** The shared double-Lehmer spread (KMV / theta family). */
  private def lehmer2(x: Long): Long = {
    val P = 2147483647L
    (x % P) * 48271L % P * 48271L % P
  }

  test("q_sketch_intersect: theta intersection replays brute-force " +
      "and the estimate brackets the exact overlap") {
    val row = graft.SparkEntry.queries("q_sketch_intersect")(spark, sf)
      .head()
    // brute: per-custkey pre/post flags + the portable poly hash
    val pivot = java.sql.Timestamp.valueOf(
      Sketches.ThetaPivot + " 00:00:00")
    val flags = orders
      .select($"o_custkey", ($"o_orderdate" < lit(pivot)).as("pre"),
        ($"o_orderdate" >= lit(pivot)).as("post"))
      .groupBy($"o_custkey")
      .agg(max($"pre").as("pre"), max($"post").as("post"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    def polyHash(sv: String): Long =
      sv.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)
    def sketchOf(keys: Seq[Long]): Seq[Long] =
      keys.map(k => lehmer2(polyHash(k.toString)))
        .distinct.sorted.take(Sketches.KmvK)
    val skA = sketchOf(flags.filter(_._2).map(_._1))
    val skB = sketchOf(flags.filter(_._3).map(_._1))
    val theta = math.min(skA.max, skB.max)
    val nCommon = (skA.toSet intersect skB.toSet).count(_ < theta)
    val exact = flags.count(f => f._2 && f._3).toLong
    assert(row.getAs[Long]("k_a") === skA.length.toLong)
    assert(row.getAs[Long]("k_b") === skB.length.toLong)
    assert(row.getAs[Long]("vk_a") === skA.max)
    assert(row.getAs[Long]("vk_b") === skB.max)
    assert(row.getAs[Long]("theta") === theta)
    assert(row.getAs[Long]("n_common") === nCommon.toLong)
    assert(row.getAs[Long]("n_exact_inter") === exact)
    // estimate within the 3/sqrt(n_common) theta error band
    val est = row.getAs[Double]("est_inter")
    val bound = 3.0 / math.sqrt(nCommon.toDouble)
    assert(math.abs(est - exact) / exact <= bound,
      s"theta estimate $est vs exact $exact outside ±${bound * 100}%")
  }

  test("q_sample_agg_ci: the hash sample is reproducible, near-rate, " +
      "and every group's 3-sigma certificate holds") {
    val rows = graft.SparkEntry.queries("q_sample_agg_ci")(spark, sf)
      .collect()
    assert(rows.length === 3) // A / N / R
    val P = 2147483647L
    val brute = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect()
      .map { r =>
        val rk = r.getLong(1) * 8L + r.getInt(2)
        val in = (rk + 1) * 48271L % P * 69621L % P % Sketches.SampleMod == 0
        (r.getString(0), r.getLong(3), in)
      }
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val g = brute.filter(_._1 == flag)
      val samp = g.filter(_._3)
      assert(r.getAs[Long]("n_total") === g.length.toLong)
      assert(r.getAs[Long]("n_sample") === samp.length.toLong)
      assert(r.getAs[Long]("exact_cents") === g.map(_._2).sum)
      assert(r.getAs[Long]("est_cents") ===
        samp.map(_._2).sum * Sketches.SampleMod)
      // sampling rate within +-30% of nominal 1/16
      val rate = samp.length.toDouble / g.length
      assert(math.abs(rate * Sketches.SampleMod - 1.0) <= 0.3,
        s"$flag sample rate $rate far from 1/${Sketches.SampleMod}")
      // err_ppm replays and the variance certificate holds here
      val est = BigInt(r.getAs[Long]("est_cents"))
      val exact = BigInt(r.getAs[Long]("exact_cents"))
      assert(BigInt(r.getAs[Long]("err_ppm")) ===
        (est - exact).abs * 1000000 / exact)
      val ssq = g.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val hold = (est - exact) * (est - exact) <=
        ssq * (9L * (Sketches.SampleMod - 1L))
      assert(r.getAs[Boolean]("within_3sigma") === hold)
      assert(hold, s"$flag estimate missed its own 3-sigma band")
    }
  }

  test("q_join_size_estimate: F2 replays brute-force and the key-" +
      "sampled estimate stays inside a loose band") {
    val row = graft.SparkEntry.queries("q_join_size_estimate")(spark, sf)
      .head()
    val P = 2147483647L
    val counts = Tables.lineitem(spark, sf)
      .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactF2 = counts.map(c => BigInt(c._2) * BigInt(c._2)).sum
    val sampled = counts.filter { case (k, _) =>
      (k + 1) * 48271L % P % Sketches.SampleMod == 0 }
    val estF2 = sampled.map(c => BigInt(c._2) * BigInt(c._2)).sum *
      Sketches.SampleMod
    assert(row.getAs[Long]("n_keys") === counts.length.toLong)
    assert(row.getAs[Long]("n_sample_keys") === sampled.length.toLong)
    assert(BigInt(row.getAs[Long]("exact_f2")) === exactF2)
    assert(BigInt(row.getAs[Long]("est_f2")) === estF2)
    assert(BigInt(row.getAs[Long]("err_ppm")) ===
      (estF2 - exactF2).abs * 1000000 / exactF2)
    // with ~n/16 sampled keys the estimator sits well inside 25%
    assert((estF2 - exactF2).abs * 4 <= exactF2,
      "F2 estimate off by more than 25% — sampling is broken")
  }

  test("q_capture_recapture: Chapman/Lincoln replay from the raw " +
      "half-calendar captures; estimator brackets the observed union") {
    val r = graft.SparkEntry.queries("q_capture_recapture")(
      spark, SparkTestSession.sf).head()
    import spark.implicits._
    val act = graft.Tables.events(spark, SparkTestSession.sf)
      .select($"user_id", to_date($"ts").as("day")).collect()
      .map(x => x.getLong(0) -> x.getDate(1).toLocalDate.toEpochDay)
    val (mn, mx) = (act.map(_._2).min, act.map(_._2).max)
    val cut = Math.floorDiv(mn + mx, 2)
    val in1 = act.filter(_._2 <= cut).map(_._1).toSet
    val in2 = act.filter(_._2 > cut).map(_._1).toSet
    val (n1, n2, m) = (BigInt(in1.size), BigInt(in2.size),
      BigInt((in1 & in2).size))
    assert(r.getAs[Long]("n1") === n1.toLong)
    assert(r.getAs[Long]("n2") === n2.toLong)
    assert(r.getAs[Long]("m") === m.toLong)
    assert(r.getAs[Long]("n_observed") === (in1 | in2).size.toLong)
    val chapman = ((n1 + 1) * (n2 + 1) / (m + 1) - 1).toLong
    assert(r.getAs[Long]("chapman_n") === chapman)
    if (m > 0)
      assert(r.getAs[Long]("lincoln_n") === (n1 * n2 / m).toLong)
    assert(r.getAs[Long]("chapman_var") ===
      ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1) * (m + 1) * (m + 2))).toLong)
    // the population estimate can never undershoot what was SEEN
    assert(chapman >= (in1 | in2).size.toLong - 1)
  }
}
