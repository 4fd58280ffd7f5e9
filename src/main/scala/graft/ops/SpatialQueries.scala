package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial / geo operators over synthetic-but-deterministic point
  * sets: every entity gets a stable position as a pure Knuth-hash
  * function of its key (the q_hash_split convention — reproducible
  * across engines, runs, and partitionings), expressed in INTEGER
  * micro-degrees on a SHIFTED grid (lat' ∈ [0, 180e6), lon' ∈
  * [0, 360e6) µ°) so every cell assignment is non-negative integer
  * division — exact and identical in Spark (`div`, truncating) and
  * DuckDB (`//`, flooring), which only agree on non-negative
  * operands.
  *
  * The operator itself is the classic SCALABLE point-radius join:
  * 1. bucket both sides into W-µ°-wide grid cells (W = radius, so a
  *    match can span at most one cell boundary per axis);
  * 2. explode the SMALL side (POIs) into its 3×3 neighbor stencil —
  *    9 rows per POI, broadcast — never the big side;
  * 3. equi-join on the cell key (co-partitioned, no theta-join);
  * 4. refine with the EXACT planar predicate dx²+dy² ≤ R² in BIGINT
  *    µ°² (zero float in the join decision — the haversine column is
  *    decoration, never a filter).
  * At 100 TB the user side stays put: the stencil explode costs
  * 9·|POI| broadcast rows, the shuffle is one hash exchange of the
  * big side by cell key, and skewed cells (urban density) fall out
  * of AQE skew splitting since the join is a plain equi-join.
  *
  * Reference analog: the dashboard's city/state rollups
  * (README.md:16-20) are point-in-region aggregations; this is the
  * radius-join generalization a geo-aware pipeline needs.
  */
object SpatialQueries {

  /** Deterministic coordinate in [0, range) µ° from a stable key —
    * Knuth multiplicative hash folded to 32 bits (q_hash_split's
    * assignment; key·mult stays under int64 through ~3.5e9 keys). */
  private def coord(key: Column, mult: Long, range: Long): Column =
    pmod(key * lit(mult), lit(4294967296L)) % lit(range)

  private val LatMult = 2654435761L // Knuth's 2^32/φ
  private val LonMult = 2246822519L // xxHash PRIME32_2
  /** Search radius == grid-cell width, in µ° (5° ≈ 550 km at the
    * equator of the planar model): a radius match crosses at most
    * one cell boundary per axis, so the 3×3 stencil is exhaustive. */
  private val R = 5000000L

  /** µ° → radians, materialized ONCE as a Scala double and
    * interpolated into both engines' expressions as the same literal
    * (Scala's Double.toString is the shortest round-trip decimal, so
    * DuckDB parses back the identical bits). Computing it per-engine
    * (Math.toRadians vs radians()) could differ in the last ulp —
    * the engines associate x·π/180 differently. */
  private val RadPerMicroDeg: Double = 1e-6 * math.Pi / 180.0

  private def users(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("user_key"),
      coord(col("c_custkey"), LatMult, 180000000L).as("u_lat"),
      coord(col("c_custkey"), LonMult, 360000000L).as("u_lon"))

  private def pois(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      col("s_suppkey").as("poi_key"),
      coord(col("s_suppkey"), LatMult, 180000000L).as("p_lat"),
      coord(col("s_suppkey"), LonMult, 360000000L).as("p_lon"))

  /** Point-radius join: for each POI, the users within R µ° (planar),
    * their count, the nearest user (exact argmin on (dist², key)),
    * and the nearest great-circle distance in 100 m units (haversine
    * on the shifted grid — the one floating-point column, floored at
    * a grid coarse enough that libm's 1-ulp sin/cos divergence is
    * immaterial; the JOIN predicate itself is exact BIGINT). */
  private def spatialJoin(s: SparkSession, d: String): DataFrame = {
    val u = users(s, d)
      .withColumn("cl_lat", expr(s"u_lat div $R"))
      .withColumn("cl_lon", expr(s"u_lon div $R"))
    val offsets = array((-1 to 1).map(lit): _*)
    val stencil = pois(s, d)
      .withColumn("dl", explode(offsets))
      .withColumn("dm", explode(offsets))
      .select(col("poi_key"), col("p_lat"), col("p_lon"),
        (expr(s"p_lat div $R") + col("dl")).as("cl_lat"),
        (expr(s"p_lon div $R") + col("dm")).as("cl_lon"))
    val rad = lit(RadPerMicroDeg)
    val phi1 = (col("u_lat") - lit(90000000L)) * rad
    val phi2 = (col("p_lat") - lit(90000000L)) * rad
    val dphi = (col("p_lat") - col("u_lat")) * rad
    val dlam = (col("p_lon") - col("u_lon")) * rad
    val a = sin(dphi / 2) * sin(dphi / 2) +
      cos(phi1) * cos(phi2) * sin(dlam / 2) * sin(dlam / 2)
    val havM = lit(2.0 * 6371000.0) * asin(sqrt(a))
    u.join(broadcast(stencil), Seq("cl_lat", "cl_lon"))
      .withColumn("dist2",
        (col("u_lat") - col("p_lat")) * (col("u_lat") - col("p_lat"))
          + (col("u_lon") - col("p_lon"))
          * (col("u_lon") - col("p_lon")))
      .filter(col("dist2") <= lit(R * R))
      .withColumn("hav_100m", floor(havM / lit(100.0)))
      .groupBy(col("poi_key"))
      .agg(count(lit(1)).as("n_users"),
        min(col("dist2")).as("min_dist2"),
        min(struct(col("dist2"), col("user_key")))
          .getField("user_key").as("nearest_user"),
        min(col("hav_100m")).as("min_hav_100m"))
  }

  private val spatialJoinOracle = s"""
      WITH u AS (SELECT c_custkey AS user_key,
                        (c_custkey * $LatMult) % 4294967296
                          % 180000000 AS u_lat,
                        (c_custkey * $LonMult) % 4294967296
                          % 360000000 AS u_lon
                 FROM customer),
      p AS (SELECT s_suppkey AS poi_key,
                   (s_suppkey * $LatMult) % 4294967296
                     % 180000000 AS p_lat,
                   (s_suppkey * $LonMult) % 4294967296
                     % 360000000 AS p_lon
            FROM supplier),
      st AS (SELECT poi_key, p_lat, p_lon,
                    p_lat // $R + dl.x AS cl_lat,
                    p_lon // $R + dm.x AS cl_lon
             FROM p
             CROSS JOIN (VALUES (-1), (0), (1)) AS dl(x)
             CROSS JOIN (VALUES (-1), (0), (1)) AS dm(x)),
      j AS (SELECT st.poi_key, u.user_key,
                   (u.u_lat - st.p_lat) * (u.u_lat - st.p_lat)
                     + (u.u_lon - st.p_lon) * (u.u_lon - st.p_lon)
                     AS dist2,
                   floor(2.0 * 6371000.0 * asin(sqrt(
                     sin((st.p_lat - u.u_lat) * $RadPerMicroDeg / 2)
                       * sin((st.p_lat - u.u_lat)
                             * $RadPerMicroDeg / 2)
                     + cos((u.u_lat - 90000000) * $RadPerMicroDeg)
                       * cos((st.p_lat - 90000000)
                             * $RadPerMicroDeg)
                       * sin((st.p_lon - u.u_lon)
                             * $RadPerMicroDeg / 2)
                       * sin((st.p_lon - u.u_lon)
                             * $RadPerMicroDeg / 2)))
                     / 100.0) AS hav_100m
            FROM u JOIN st ON u.u_lat // $R = st.cl_lat
                          AND u.u_lon // $R = st.cl_lon
            WHERE (u.u_lat - st.p_lat) * (u.u_lat - st.p_lat)
                    + (u.u_lon - st.p_lon) * (u.u_lon - st.p_lon)
                  <= ${R * R})
      SELECT poi_key, CAST(count(*) AS BIGINT) AS n_users,
             CAST(min(dist2) AS BIGINT) AS min_dist2,
             CAST(min(struct_pack(d := dist2, u := user_key)).u
               AS BIGINT) AS nearest_user,
             CAST(min(hav_100m) AS BIGINT) AS min_hav_100m
      FROM j GROUP BY 1"""

  /** Grid-density rollup — users per occupied cell with the cell's
    * bounding box: the tile-aggregation primitive (heatmaps, density
    * sampling). One map-side-combinable groupBy on the exact integer
    * cell key; never materializes empty cells. */
  private def gridDensity(s: SparkSession, d: String): DataFrame =
    users(s, d)
      .groupBy(expr(s"u_lat div $R").as("cl_lat"),
        expr(s"u_lon div $R").as("cl_lon"))
      .agg(count(lit(1)).as("n_users"),
        min(col("u_lat")).as("min_lat"), max(col("u_lat")).as("max_lat"),
        min(col("u_lon")).as("min_lon"), max(col("u_lon")).as("max_lon"))
      .filter(col("n_users") >= 2)

  private val gridDensityOracle = s"""
      WITH u AS (SELECT (c_custkey * $LatMult) % 4294967296
                          % 180000000 AS u_lat,
                        (c_custkey * $LonMult) % 4294967296
                          % 360000000 AS u_lon
                 FROM customer)
      SELECT u_lat // $R AS cl_lat, u_lon // $R AS cl_lon,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(min(u_lat) AS BIGINT) AS min_lat,
             CAST(max(u_lat) AS BIGINT) AS max_lat,
             CAST(min(u_lon) AS BIGINT) AS min_lon,
             CAST(max(u_lon) AS BIGINT) AS max_lon
      FROM u GROUP BY 1, 2 HAVING count(*) >= 2"""

  /** DBSCAN neighborhood radius (µ°) and core threshold (neighbor
    * count INCLUDING self, the textbook convention). */
  private val DbEps = 10000000L
  private val DbMinPts = 10L

  /** DBSCAN point classification (core / border / noise) — the
    * density-clustering primitive, distributed the way every scalable
    * DBSCAN is: bucket points into eps-wide cells, explode the 3×3
    * stencil on ONE side, equi-join on the cell key (co-partitioned —
    * with both sides big nothing broadcasts; the stencil fan-out is a
    * fixed 9×), refine with the exact BIGINT circle predicate. A
    * point is CORE when its eps-ball holds ≥ minPts points (self
    * included), BORDER when non-core but inside some core's ball,
    * NOISE otherwise — the classification IS the expensive half of
    * DBSCAN (clusters then grow by the connected components of
    * core-core pairs, the q_dedup_components machinery). Neighbor
    * counts are map-side-combinable; the border test is one semi-ish
    * join of the pair list against the core set. */
  private def dbscanCore(s: SparkSession, d: String): DataFrame = {
    val pts = users(s, d)
      .withColumn("cl_lat", expr(s"u_lat div $DbEps"))
      .withColumn("cl_lon", expr(s"u_lon div $DbEps"))
    val offsets = array((-1 to 1).map(lit): _*)
    val stencil = users(s, d).select(col("user_key").as("nb_key"),
        col("u_lat").as("n_lat"), col("u_lon").as("n_lon"))
      .withColumn("dl", explode(offsets))
      .withColumn("dm", explode(offsets))
      .select(col("nb_key"), col("n_lat"), col("n_lon"),
        (expr(s"n_lat div $DbEps") + col("dl")).as("cl_lat"),
        (expr(s"n_lon div $DbEps") + col("dm")).as("cl_lon"))
    val neigh = pts.join(stencil, Seq("cl_lat", "cl_lon"))
      .filter((col("u_lat") - col("n_lat"))
        * (col("u_lat") - col("n_lat"))
        + (col("u_lon") - col("n_lon"))
        * (col("u_lon") - col("n_lon")) <= lit(DbEps * DbEps))
      .select(col("user_key"), col("nb_key"))
    val counts = neigh.groupBy(col("user_key"))
      .agg(count(lit(1)).as("n_neighbors"))
      .withColumn("is_core", col("n_neighbors") >= DbMinPts)
    val nearCore = neigh
      .join(counts.filter(col("is_core"))
        .select(col("user_key").as("nb_key")), Seq("nb_key"),
        "left_semi")
      .select(col("user_key")).distinct()
      .withColumn("near_core", lit(true))
    counts.join(nearCore, Seq("user_key"), "left")
      .select(col("user_key"), col("n_neighbors"), col("is_core"),
        when(col("is_core"), "core")
          .when(col("near_core"), "border")
          .otherwise("noise").as("role"))
  }

  private val dbscanOracle = s"""
      WITH u AS (SELECT c_custkey AS user_key,
                        (c_custkey * $LatMult) % 4294967296
                          % 180000000 AS u_lat,
                        (c_custkey * $LonMult) % 4294967296
                          % 360000000 AS u_lon
                 FROM customer),
      st AS (SELECT user_key AS nb_key, u_lat AS n_lat,
                    u_lon AS n_lon,
                    u_lat // $DbEps + dl.x AS cl_lat,
                    u_lon // $DbEps + dm.x AS cl_lon
             FROM u
             CROSS JOIN (VALUES (-1), (0), (1)) AS dl(x)
             CROSS JOIN (VALUES (-1), (0), (1)) AS dm(x)),
      neigh AS (SELECT u.user_key, st.nb_key
                FROM u JOIN st ON u.u_lat // $DbEps = st.cl_lat
                              AND u.u_lon // $DbEps = st.cl_lon
                WHERE (u.u_lat - st.n_lat) * (u.u_lat - st.n_lat)
                        + (u.u_lon - st.n_lon) * (u.u_lon - st.n_lon)
                      <= ${DbEps * DbEps}),
      counts AS (SELECT user_key,
                        CAST(count(*) AS BIGINT) AS n_neighbors,
                        count(*) >= $DbMinPts AS is_core
                 FROM neigh GROUP BY 1),
      nearcore AS (SELECT DISTINCT n.user_key
                   FROM neigh n JOIN counts c
                     ON n.nb_key = c.user_key AND c.is_core)
      SELECT counts.user_key, n_neighbors, is_core,
             CASE WHEN is_core THEN 'core'
                  WHEN nearcore.user_key IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS role
      FROM counts LEFT JOIN nearcore USING (user_key)"""

  /** Radius-bounded spatial k-nearest-neighbors: the top-3 POIs within
    * R of each user by exact integer distance (ties to the smaller
    * POI key) — the "nearest stores" / geo-enrichment join. Same
    * stencil machinery as [[spatialJoin]] but grouped on the USER
    * side with a bounded rank window; users with no POI inside R drop
    * out (radius-bounded kNN — the unbounded variant needs expanding
    * ring search, which at this density the 3×3 stencil already
    * covers). POI stencil broadcasts (small side 9×); the user table
    * never shuffles before the window on its own key. */
  private def spatialKnn(s: SparkSession, d: String): DataFrame = {
    val u = users(s, d)
      .withColumn("cl_lat", expr(s"u_lat div $R"))
      .withColumn("cl_lon", expr(s"u_lon div $R"))
    val offsets = array((-1 to 1).map(lit): _*)
    val stencil = pois(s, d)
      .withColumn("dl", explode(offsets))
      .withColumn("dm", explode(offsets))
      .select(col("poi_key"), col("p_lat"), col("p_lon"),
        (expr(s"p_lat div $R") + col("dl")).as("cl_lat"),
        (expr(s"p_lon div $R") + col("dm")).as("cl_lon"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_key"))
      .orderBy(col("dist2").asc, col("poi_key").asc)
    u.join(broadcast(stencil), Seq("cl_lat", "cl_lon"))
      .withColumn("dist2",
        (col("u_lat") - col("p_lat")) * (col("u_lat") - col("p_lat"))
          + (col("u_lon") - col("p_lon"))
          * (col("u_lon") - col("p_lon")))
      .filter(col("dist2") <= lit(R * R))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("user_key"), col("rank"), col("poi_key"),
        col("dist2"))
  }

  private val spatialKnnOracle = s"""
      WITH u AS (SELECT c_custkey AS user_key,
                        (c_custkey * $LatMult) % 4294967296
                          % 180000000 AS u_lat,
                        (c_custkey * $LonMult) % 4294967296
                          % 360000000 AS u_lon
                 FROM customer),
      p AS (SELECT s_suppkey AS poi_key,
                   (s_suppkey * $LatMult) % 4294967296
                     % 180000000 AS p_lat,
                   (s_suppkey * $LonMult) % 4294967296
                     % 360000000 AS p_lon
            FROM supplier),
      st AS (SELECT poi_key, p_lat, p_lon,
                    p_lat // $R + dl.x AS cl_lat,
                    p_lon // $R + dm.x AS cl_lon
             FROM p
             CROSS JOIN (VALUES (-1), (0), (1)) AS dl(x)
             CROSS JOIN (VALUES (-1), (0), (1)) AS dm(x)),
      j AS (SELECT u.user_key, st.poi_key,
                   (u.u_lat - st.p_lat) * (u.u_lat - st.p_lat)
                     + (u.u_lon - st.p_lon) * (u.u_lon - st.p_lon)
                     AS dist2
            FROM u JOIN st ON u.u_lat // $R = st.cl_lat
                          AND u.u_lon // $R = st.cl_lon
            WHERE (u.u_lat - st.p_lat) * (u.u_lat - st.p_lat)
                    + (u.u_lon - st.p_lon) * (u.u_lon - st.p_lon)
                  <= ${R * R}),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY user_key
                        ORDER BY dist2 ASC, poi_key ASC) AS BIGINT)
                        AS rank
            FROM j)
      SELECT user_key, rank, poi_key, CAST(dist2 AS BIGINT) AS dist2
      FROM r WHERE rank <= 3"""

  /** Geohash bits per axis (6 base32 chars = 30 bits: 15 lon odd-
    * interleaved with 15 lat). */
  private val GeoBits = 15

  /** Geohash encoding in PURE integer arithmetic — the standard
    * spatial bucketing key (the string whose shared prefixes nest
    * boxes), computed with zero loops and zero floats so both engines
    * emit identical strings: quantize each axis to [[GeoBits]] bits
    * by exact integer division of the shifted µ° grid, interleave
    * with 30 unrolled div/mod/shift terms (lon takes the even bit
    * positions from the top, per the geohash spec), then base32 via
    * six substring picks from the geohash alphabet. Output carries
    * the 4-char prefix too — prefix truncation IS the coarser cell,
    * the property that makes geohash a range-scannable index key.
    * Shape: per-row expressions inside the scan; the rollup groups by
    * the prefix. */
  private def geohashCells(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // quantized axis value in [0, 2^15)
    val latQ = expr(s"(u_lat * ${1L << GeoBits}) div 180000000")
    val lonQ = expr(s"(u_lon * ${1L << GeoBits}) div 360000000")
    // interleave: bit k of lon -> position 2k+1, lat -> 2k (msb-first
    // pairing means lon owns the highest bit)
    val code = (0 until GeoBits).map { k =>
      expr(s"((lonq div ${1L << k}) % 2) * ${1L << (2 * k + 1)}" +
        s" + ((latq div ${1L << k}) % 2) * ${1L << (2 * k)}")
    }.reduce(_ + _)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    val chars = (0 until 6).map { i =>
      expr(s"substring('$alphabet', " +
        s"CAST((code div ${1L << (5 * (5 - i))}) % 32 AS INT) + 1, 1)")
    }
    users(s, d)
      .withColumn("latq", latQ).withColumn("lonq", lonQ)
      .withColumn("code", code)
      .withColumn("geohash6", concat(chars: _*))
      .withColumn("cell4", substring($"geohash6", 1, 4))
      .select($"user_key", $"u_lat", $"u_lon", $"code", $"geohash6",
        $"cell4")
  }

  /** Cell width (µ°) of the [[spatialAutocorr]] lattice — 10°, so
    * the grid is a FIXED 18×36 = 648 cells at any data volume. */
  private val AcWidth = 10000000L

  /** Spatial autocorrelation — Moran's I (1950) and Geary's C (1954)
    * over the fixed 10° cell lattice, with rook adjacency (lat/lon
    * ±1 cell, no wraparound) and x = customers-per-cell: do dense
    * cells cluster next to dense cells? Exactness: center through
    * z_c = n·x_c − S (exact ints — the common n factor cancels in
    * both ratios), weights are 0/1, so
    * I = n·Σ_{ij} zᵢzⱼ / (W·Σz²) and
    * C = (n−1)·Σ_{ij}(zᵢ−zⱼ)² / (2W·2n... — both emit as ONE
    * sign-split e6 division of decimal(38,0) integers (the C
    * numerator (zᵢ−zⱼ)² and denominator 2·Σz² carry the same n²).
    * The clustered flag compares I against its null expectation
    * −1/(n−1) fully cross-multiplied. Shape: one cell rollup (the
    * grid_density shuffle), a 4-stencil equi self-join over the
    * ≤648-row cell table, a 1-row aggregate — data-volume-free after
    * the first rollup. */
  private def spatialAutocorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val cells = users(s, d)
      .select(expr(s"u_lat div $AcWidth").as("cla"),
        expr(s"u_lon div $AcWidth").as("clo"))
      .groupBy($"cla", $"clo").agg(count(lit(1)).as("x"))
    val tot = cells.agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val z = cells.crossJoin(broadcast(tot))
      .select($"cla", $"clo", $"n",
        expr(s"cast(n as $dec) * x - s").as("z"))
    val stencil = s.createDataFrame(
      Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L))).toDF("dla", "dlo")
    val pairs = z.crossJoin(broadcast(stencil))
      .select($"cla", $"clo", $"z",
        ($"cla" + $"dla").as("nla"), ($"clo" + $"dlo").as("nlo"))
      .join(z.select($"cla".as("nla"), $"clo".as("nlo"),
        $"z".as("zn")), Seq("nla", "nlo"))
    val pm = pairs.agg(count(lit(1)).as("w"),
      sum(expr(s"cast(z as $dec) * zn")).as("szz"),
      sum(expr(s"cast(z - zn as $dec) * (z - zn)")).as("sdd"))
    val zm = z.agg(max($"n").as("n"),
      sum(expr(s"cast(z as $dec) * z")).as("sz2"))
    pm.crossJoin(broadcast(zm))
      .filter($"sz2" > 0 && $"w" > 0 && $"n" > 1)
      .select($"n".as("n_cells"), $"w".as("w_pairs"),
        expr(s"""cast(case when szz >= 0
            then cast(n as $dec) * szz * 1000000 div (w * sz2)
            else -(cast(n as $dec) * (-szz) * 1000000 div (w * sz2))
          end as bigint)""").as("morans_i_e6"),
        expr(s"cast((n - 1) * sdd * 1000000" +
          s" div (cast(2 as $dec) * w * sz2) as bigint)")
          .as("gearys_c_e6"),
        // I > E[I] = −1/(n−1) ⟺ n·Σzz·(n−1) > −W·Σz², exact
        (expr(s"cast(n as $dec) * szz * (n - 1)") >
          expr(s"-(cast(w as $dec) * sz2)")).as("clustered"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_spatial_autocorr", spatialAutocorr, Some(s"""
      WITH u AS (SELECT (c_custkey * $LatMult) % 4294967296
                          % 180000000 AS u_lat,
                        (c_custkey * $LonMult) % 4294967296
                          % 360000000 AS u_lon
                 FROM customer),
      cells AS (SELECT u_lat // $AcWidth AS cla,
                       u_lon // $AcWidth AS clo,
                       CAST(count(*) AS HUGEINT) AS x
                FROM u GROUP BY 1, 2),
      tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS s
              FROM cells),
      z AS (SELECT cla, clo, n, n * x - s AS z FROM cells, tot),
      st(dla, dlo) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)),
      pairs AS (SELECT a.z AS z, b.z AS zn
                FROM z a CROSS JOIN st
                JOIN z b ON b.cla = a.cla + st.dla
                       AND b.clo = a.clo + st.dlo),
      pm AS (SELECT CAST(count(*) AS HUGEINT) AS w,
                    sum(z * zn) AS szz,
                    sum((z - zn) * (z - zn)) AS sdd
             FROM pairs),
      zm AS (SELECT max(n) AS n, sum(z * z) AS sz2 FROM z)
      SELECT CAST(n AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_pairs,
             CAST(CASE WHEN szz >= 0
                    THEN n * szz * 1000000 // (w * sz2)
                    ELSE -(n * (-szz) * 1000000 // (w * sz2))
                  END AS BIGINT) AS morans_i_e6,
             CAST((n - 1) * sdd * 1000000 // (2 * w * sz2) AS BIGINT)
               AS gearys_c_e6,
             n * szz * (n - 1) > -(w * sz2) AS clustered
      FROM pm, zm
      WHERE sz2 > 0 AND w > 0 AND n > 1""")),
    Q("q_geohash_cells", geohashCells, Some {
      val latQ = s"(u_lat * ${1L << GeoBits}) // 180000000"
      val lonQ = s"(u_lon * ${1L << GeoBits}) // 360000000"
      val code = (0 until GeoBits).map { k =>
        s"((lonq // ${1L << k}) % 2) * ${1L << (2 * k + 1)}" +
          s" + ((latq // ${1L << k}) % 2) * ${1L << (2 * k)}"
      }.mkString(" + ")
      val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
      val chars = (0 until 6).map { i =>
        s"substring('$alphabet', " +
          s"CAST((code // ${1L << (5 * (5 - i))}) % 32 AS INT) + 1, 1)"
      }.mkString(" || ")
      s"""
      WITH u AS (SELECT c_custkey AS user_key,
                        (c_custkey * $LatMult) % 4294967296
                          % 180000000 AS u_lat,
                        (c_custkey * $LonMult) % 4294967296
                          % 360000000 AS u_lon
                 FROM customer),
      q AS (SELECT *, $latQ AS latq, $lonQ AS lonq FROM u),
      c AS (SELECT *, $code AS code FROM q)
      SELECT user_key, u_lat, u_lon, CAST(code AS BIGINT) AS code,
             $chars AS geohash6,
             substring($chars, 1, 4) AS cell4
      FROM c"""
    }),
    Q("q_dbscan_core", dbscanCore, Some(dbscanOracle)),
    Q("q_spatial_knn", spatialKnn, Some(spatialKnnOracle)),
    Q("q_spatial_join", spatialJoin, Some(spatialJoinOracle),
      headline = true),
    Q("q_grid_density", gridDensity, Some(gridDensityOracle))
  )
}
