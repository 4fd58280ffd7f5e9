package graft

import org.scalatest.funsuite.AnyFunSuite

/** Model + plan checks for the spatial operators: the grid-stencil
  * radius join must equal the O(|users|·|POIs|) brute-force answer
  * (the stencil is a pure optimization — 3×3 is EXHAUSTIVE when the
  * cell width equals the radius), and its physical plan must be the
  * broadcast equi-join the 100 TB story depends on, never a
  * cartesian refine. */
class SpatialSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private val LatMult = 2654435761L
  private val LonMult = 2246822519L
  private val R = 5000000L

  private def coord(key: Long, mult: Long, range: Long): Long =
    ((key * mult) % 4294967296L) % range

  test("q_geohash_cells matches an INDEPENDENT textbook subdivision " +
      "encoder and equal hashes mean equal quantized cells") {
    val got = SparkEntry.queries("q_geohash_cells")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_key") -> r).toMap
    assert(got.nonEmpty)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    // textbook geohash: interval halving, lon first, 30 bits
    def std(lat: Double, lon: Double): String = {
      var (la0, la1, lo0, lo1) = (-90.0, 90.0, -180.0, 180.0)
      val bits = (0 until 30).map { i =>
        if (i % 2 == 0) {
          val mid = (lo0 + lo1) / 2
          if (lon >= mid) { lo0 = mid; 1 } else { lo1 = mid; 0 }
        } else {
          val mid = (la0 + la1) / 2
          if (lat >= mid) { la0 = mid; 1 } else { la1 = mid; 0 }
        }
      }
      (0 until 6).map { c =>
        alphabet(bits.slice(c * 5, c * 5 + 5)
          .foldLeft(0)((a, b) => a * 2 + b))
      }.mkString
    }
    got.foreach { case (k, r) =>
      val uLat = coord(k, LatMult, 180000000L)
      val uLon = coord(k, LonMult, 360000000L)
      assert(r.getAs[String]("geohash6") ===
        std(uLat / 1e6 - 90.0, uLon / 1e6 - 180.0), s"key $k")
      assert(r.getAs[String]("cell4") ===
        r.getAs[String]("geohash6").take(4))
    }
    // 30 bits = the full 15-bit quantization of both axes: equal
    // geohash6 iff equal (latq, lonq)
    val byHash = got.values.groupBy(_.getAs[String]("geohash6"))
    byHash.values.foreach { rs =>
      val cells = rs.map { r =>
        (r.getAs[Long]("u_lat") * 32768L / 180000000L,
          r.getAs[Long]("u_lon") * 32768L / 360000000L)
      }.toSet
      assert(cells.size === 1)
    }
  }

  private lazy val users: Seq[(Long, Long, Long)] =
    Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).toSeq
      .map(k => (k, coord(k, LatMult, 180000000L),
        coord(k, LonMult, 360000000L)))

  private lazy val pois: Seq[(Long, Long, Long)] =
    Tables.supplier(spark, sf).select("s_suppkey")
      .collect().map(_.getLong(0)).toSeq
      .map(k => (k, coord(k, LatMult, 180000000L),
        coord(k, LonMult, 360000000L)))

  test("q_spatial_join equals the brute-force all-pairs radius join " +
      "(the 3x3 stencil loses nothing at cell width == radius)") {
    val brute = pois.flatMap { case (pk, plat, plon) =>
      val in = users.flatMap { case (uk, ulat, ulon) =>
        val d2 = (ulat - plat) * (ulat - plat) +
          (ulon - plon) * (ulon - plon)
        if (d2 <= R * R) Some((d2, uk)) else None
      }
      if (in.isEmpty) None
      else Some(pk -> (in.size.toLong, in.map(_._1).min, in.min._2))
    }.toMap
    val got = SparkEntry.queries("q_spatial_join")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("poi_key") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("min_dist2"),
          r.getAs[Long]("nearest_user"))).toMap
    assert(got === brute)
  }

  test("q_spatial_join plan: broadcast equi-join on the cell key, " +
      "no cartesian or nested-loop fallback") {
    val plan = SparkEntry.queries("q_spatial_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "stencil side must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "radius refine must ride the equi-join, not a cross product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "join must be on the exact cell key, not the theta predicate")
  }

  test("q_grid_density equals a brute cell rollup and every bounding " +
      "box sits inside its cell") {
    val brute = users.groupBy(u => (u._2 / R, u._3 / R))
      .filter(_._2.size >= 2)
      .map { case (c, us) =>
        c -> (us.size.toLong, us.map(_._2).min, us.map(_._2).max,
          us.map(_._3).min, us.map(_._3).max)
      }
    val got = SparkEntry.queries("q_grid_density")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("cl_lat"), r.getAs[Long]("cl_lon")) ->
        (r.getAs[Long]("n_users"),
          r.getAs[Long]("min_lat"), r.getAs[Long]("max_lat"),
          r.getAs[Long]("min_lon"), r.getAs[Long]("max_lon"))).toMap
    assert(got === brute)
    got.foreach { case ((clat, clon), (_, lo, hi, lo2, hi2)) =>
      assert(lo / R === clat && hi / R === clat)
      assert(lo2 / R === clon && hi2 / R === clon)
    }
  }

  test("q_dbscan_core: roles equal a brute all-pairs DBSCAN " +
      "classification (stencil loses nothing at cell width == eps)") {
    val eps = 10000000L
    val got = SparkEntry.queries("q_dbscan_core")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_key") ->
        (r.getAs[Long]("n_neighbors"), r.getAs[String]("role"))).toMap
    def close(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = {
      val (dx, dy) = (a._2 - b._2, a._3 - b._3)
      dx * dx + dy * dy <= eps * eps
    }
    val counts = users.map(u =>
      u._1 -> users.count(v => close(u, v)).toLong).toMap
    val cores = counts.filter(_._2 >= 10L).keySet
    users.foreach { u =>
      val (n, role) = got(u._1)
      assert(n === counts(u._1), s"user ${u._1} count")
      val expect =
        if (cores(u._1)) "core"
        else if (users.exists(v => cores(v._1) && close(u, v))) "border"
        else "noise"
      assert(role === expect, s"user ${u._1} role")
    }
    assert(got.size === users.size)
  }

  test("q_spatial_knn: ranks equal the brute radius-bounded kNN with " +
      "deterministic tie-breaks") {
    val got = SparkEntry.queries("q_spatial_knn")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("user_key"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("poi_key"), r.getAs[Long]("dist2"))).toMap
    val expect = users.flatMap { case (uk, ulat, ulon) =>
      pois.flatMap { case (pk, plat, plon) =>
        val (dx, dy) = (ulat - plat, ulon - plon)
        val d2 = dx * dx + dy * dy
        if (d2 <= R * R) Some((pk, d2)) else None
      }.sortBy { case (pk, d2) => (d2, pk) }.take(3).zipWithIndex
        .map { case ((pk, d2), i) => (uk, i + 1L) -> (pk, d2) }
    }.toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q_spatial_autocorr: BigInt replay of Moran and Geary over " +
      "the rook lattice; C >= 0; pair symmetry") {
    val r = SparkEntry.queries("q_spatial_autocorr")(spark, sf).head()
    import spark.implicits._
    val cells = Tables.customer(spark, sf).select($"c_custkey")
      .as[Long].collect()
      .map { k =>
        val lat = ((k * 2654435761L) % 4294967296L) % 180000000L
        val lon = ((k * 2246822519L) % 4294967296L) % 360000000L
        (lat / 10000000L, lon / 10000000L)
      }
      .groupBy(identity).map { case (c, g) => c -> BigInt(g.size) }
    val n = BigInt(cells.size)
    val s = cells.values.sum
    val z = cells.map { case (c, x) => c -> (n * x - s) }
    val pairs = for {
      ((la, lo), zi) <- z.toSeq
      (dla, dlo) <- Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L))
      zj <- z.get((la + dla, lo + dlo))
    } yield (zi, zj)
    val w = BigInt(pairs.size)
    val szz = pairs.map { case (a, b) => a * b }.sum
    val sdd = pairs.map { case (a, b) => (a - b) * (a - b) }.sum
    val sz2 = z.values.map(v => v * v).sum
    assert(r.getAs[Long]("n_cells") === n.toLong)
    assert(r.getAs[Long]("w_pairs") === w.toLong)
    // rook adjacency is symmetric: every pair appears twice
    assert(w % 2 === 0)
    val moran = if (szz >= 0) n * szz * 1000000 / (w * sz2)
      else -(n * (-szz) * 1000000 / (w * sz2))
    assert(r.getAs[Long]("morans_i_e6") === moran.toLong)
    val geary = (n - 1) * sdd * 1000000 / (2 * w * sz2)
    assert(r.getAs[Long]("gearys_c_e6") === geary.toLong)
    assert(geary >= 0)
    assert(r.getAs[Boolean]("clustered") ===
      (n * szz * (n - 1) > -(w * sz2)))
  }
}
