package graft.yelp

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-oracled coverage for the ACTUAL Yelp master pipeline +
  * dashboard analytics (MasterTable.build → Analytics Q1–Q10) — not
  * just their TPC-H analogs. Round 1 validated Analytics only on a
  * generated in-memory fixture; these entries put the real code path
  * under the DuckDB hash-compare gate every round.
  *
  * The Yelp-shaped inputs (business / review / user) are DERIVED
  * DETERMINISTICALLY from the driver's TPC-H tables — orders→review,
  * customer→user, part→business — with modular arithmetic, so the
  * same fixture is reproducible in DuckDB SQL verbatim and no
  * hand-rolled data ever enters the repo. Derived attributes exercise
  * every semantic branch: the keyword first-match order ("Food Trucks,
  * Bars" → Restaurants not Nightlife), null and no-match categories →
  * "Other", the "Unknown" → Mississippi state quirk, unmapped state
  * pass-through, and star ties in the per-city top-k.
  *
  * The master table is cached once per (session, sf) via GraftCaches —
  * all ten analytics share one build, mirroring how the reference
  * materializes the master to S3 and points every dashboard query at
  * it (reference glue_job.py:88-92, README.md:16-20).
  */
object YelpQueries {

  private val NumBiz = 200 // part keys 0..199 exist at every sf

  /** business: part → (business_id, b_name, stars, review_count, city,
    * state, categories). */
  private[yelp] def businessFrom(part: DataFrame): DataFrame = {
    val p = col("p_partkey")
    part.select(
      p.as("business_id"),
      col("p_name").as("name"),
      (lit(1.0) + (p % 5).cast("double")).as("stars"),
      (p % 100).as("review_count"),
      concat(lit("City "), (p % 30).cast("string")).as("city"),
      element_at(typedLit(stateCodes), ((p % 6) + 1).cast("int")).as("state"),
      element_at(array(categoryStrings.map {
        case null => lit(null).cast("string")
        case s    => lit(s)
      }: _*), ((p % 8) + 1).cast("int")).as("categories"))
  }

  /** review: orders → (review_id, user_id, business_id, stars, date,
    * cool/funny/useful at review granularity, text). */
  private[yelp] def reviewFrom(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    orders.select(
      k.as("review_id"),
      col("o_custkey").as("user_id"),
      (k % NumBiz).as("business_id"),
      (lit(1.0) + (k % 5).cast("double")).as("stars"),
      col("o_orderdate").as("date"),
      (k % 3).as("cool"), (k % 4).as("funny"), (k % 6).as("useful"),
      repeat(concat(col("o_orderpriority"), lit(" ")),
        (lit(1) + (k % 4)).cast("int")).as("text"))
  }

  /** user: customer → (user_id, name, review_count, fans, cool/funny/
    * useful at user granularity — the columns the master resolves to
    * the USER side, SURVEY.md §2.3). */
  private[yelp] def userFrom(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(
      c.as("user_id"),
      col("c_name").as("name"),
      (c % 50).as("review_count"),
      (c % 20).as("fans"),
      (c % 7).as("cool"), (c % 5).as("funny"), (c % 11).as("useful"))
  }

  /** The extended master (text retained), cached once per session+sf. */
  private def master(s: SparkSession, d: String): DataFrame =
    graft.GraftCaches.getOrPersist(s, s"yelp.master:$d") {
      MasterTable.build(
        businessFrom(Tables.part(s, d)),
        reviewFrom(Tables.orders(s, d)),
        userFrom(Tables.customer(s, d)),
        keepText = true)
    }

  // ---- fixture constants (mirrored into the oracle SQL below) ----

  private val stateCodes =
    Seq("CA", "NY", "TX", "WA", "Unknown", "ZZ")

  private val categoryStrings: Seq[String] = Seq(
    "Restaurants, Mexican",
    "Food Trucks, Bars", // first-match: Restaurants (Food), not Nightlife
    "Shopping, Fashion",
    "Bars, Nightlife",
    "Gyms, Yoga",
    "Auto Repair",
    null,               // → Other
    "Quantum Widgets")  // no keyword → Other

  // ---- oracle SQL, generated from the same tables as the Spark side ----

  private def sqlList(xs: Seq[String]): String =
    xs.map {
      case null => "NULL"
      case s    => s"'$s'"
    }.mkString("[", ", ", "]")

  /** CASE chain for Transforms.superCategory, generated from
    * keywordOrder so SQL and Spark can never drift. */
  private def superCategorySql(c: String): String = {
    val whens = Transforms.keywordOrder.map { case (kw, cat) =>
      s"WHEN contains($c, '$kw') THEN '$cat'"
    }.mkString("\n                ")
    s"""CASE WHEN $c IS NULL THEN 'Other'
                $whens
                ELSE 'Other' END"""
  }

  /** CASE for Transforms.normalizeState (branch order irrelevant —
    * keys are distinct). */
  private def normalizeStateSql(c: String): String = {
    val whens = Transforms.stateNames.toSeq.map { case (k, v) =>
      s"WHEN $c = '$k' THEN '$v'"
    }.mkString("\n                ")
    s"CASE $whens ELSE $c END"
  }

  /** Shared WITH prologue reproducing fixture + master in DuckDB. */
  private def masterSql: String = s"""
      WITH business AS (
        SELECT p_partkey AS business_id, p_name AS b_name,
               ${sqlList(stateCodes)}[CAST(1 + p_partkey % 6 AS INT)]
                 AS state,
               'City ' || CAST(p_partkey % 30 AS VARCHAR) AS city,
               ${sqlList(categoryStrings)}[CAST(1 + p_partkey % 8 AS INT)]
                 AS categories
        FROM part),
      review AS (
        SELECT o_orderkey AS review_id, o_custkey AS user_id,
               o_orderkey % $NumBiz AS business_id,
               CAST(1 + o_orderkey % 5 AS DOUBLE) AS stars,
               o_orderdate AS r_date,
               repeat(o_orderpriority || ' ',
                      CAST(1 + o_orderkey % 4 AS INT)) AS text
        FROM orders),
      usr AS (
        SELECT c_custkey AS user_id, c_name AS name,
               c_custkey % 50 AS review_count, c_custkey % 20 AS fans,
               c_custkey % 7 AS cool, c_custkey % 5 AS funny,
               c_custkey % 11 AS useful
        FROM customer),
      master AS (
        SELECT r.business_id, r.user_id, u.name, u.cool, r.review_id,
               u.funny, r.stars, u.useful, b.city, u.review_count,
               u.fans, b.b_name,
               ${normalizeStateSql("b.state")} AS state,
               ${superCategorySql("b.categories")} AS super_category,
               CASE WHEN r.stars <= 2 THEN 'negative'
                    WHEN r.stars = 3 THEN 'neutral'
                    ELSE 'positive' END AS sentiment,
               CAST(r.r_date AS DATE) AS only_date,
               year(r.r_date) AS year, month(r.r_date) AS month,
               r.text
        FROM review r
        JOIN usr u USING (user_id)
        JOIN business b USING (business_id))"""

  /** Reviews amplified ×[[VolumeAmp]] — 1.2 M rows at the driver's
    * sf0.01 correctness gate, 12 M at the sf0.1 bench — re-keyed so
    * stars / business spread stay modular functions of the NEW id
    * (DuckDB reproduces them with a cross-joined range). */
  private val VolumeAmp = 80

  private def amplifiedReviews(s: SparkSession, d: String): DataFrame = {
    // Repartition BEFORE the ×80 explode: the sf0.1 orders parquet is
    // a single input split, so without this the 12 M generated rows —
    // and the dedup's partial aggregate over them — all ran on ONE
    // task (measured 8× slower end-to-end). The repartition shuffles
    // only the slim 150 k-row base; a production-scale input with
    // many splits makes it a near-no-op, a pathological one (few huge
    // row groups) is exactly what it guards against. Row-multiplying
    // operators must spread their INPUT, not rely on their output
    // being spread.
    val nPart = s.sessionState.conf.numShufflePartitions
    val base = reviewFrom(Tables.orders(s, d))
      .repartition(nPart)
      .withColumn("i", explode(sequence(lit(0), lit(VolumeAmp - 1))))
      .withColumn("review_id", col("review_id") * VolumeAmp + col("i"))
    base
      .withColumn("business_id", col("review_id") % NumBiz)
      .withColumn("stars", lit(1.0) + (col("review_id") % 5).cast("double"))
      .drop("i")
  }

  /** Volume validation of the REAL master pipeline: 1.2 M+ reviews
    * through MasterTable.build (joins, dedup, every derived column —
    * Catalyst prunes what the final aggregate doesn't need), then the
    * yearly-trend rollup. The oracle skips the user/business joins:
    * every o_custkey is a valid customer key and business_id < 200 ⊆
    * part keys with both dimension keys unique, so the inner joins are
    * row-preserving no-ops — the slim SQL is semantically identical. */
  private def masterVolume(s: SparkSession, d: String): DataFrame = {
    val m = MasterTable.build(
      businessFrom(Tables.part(s, d)),
      amplifiedReviews(s, d),
      userFrom(Tables.customer(s, d)))
    // Two-level aggregate instead of count+countDistinct in one pass:
    // a mixed distinct aggregate plans an Expand that streams every
    // row TWICE into the partial hash aggregate; pre-grouping by
    // (year, business_id) collapses 12 M rows map-side to
    // |years|x|businesses| partials, and the final rollup then needs
    // no distinct at all. Same result, measurably cheaper at volume.
    m.groupBy(col("year"), col("business_id"))
      .agg(count(col("review_id")).as("n"), sum(col("stars")).as("s"))
      .groupBy(col("year"))
      .agg(sum(col("n")).as("n_reviews"),
        count(lit(1)).as("n_businesses"),
        round(sum(col("s")) / sum(col("n")), 4).as("avg_stars"))
      .withColumn("year", col("year").cast("long"))
  }

  /** Persistent-catalog round-trip — the Glue-Catalog/Athena parity
    * slice (reference main.tf:28-38: the crawler registers the S3
    * master in a PERSISTENT catalog that Athena then queries by NAME;
    * every other SQL entry here uses only session temp views). The
    * master lands via `saveAsTable` partitioned by year at an external
    * location, the catalog surface is interrogated through
    * `spark.catalog` (tableExists + listColumns partition flags — the
    * crawler's schema-discovery read-back), and the result is computed
    * THROUGH the metastore path (`spark.table`, not a path read) with
    * a year predicate the CatalogFileIndex turns into partition
    * pruning — 2 of 7 year directories scanned (pinned in PlanSpec).
    * At 100 TB this is the layout+catalog pattern that makes the
    * dashboard's yearly queries touch 1/Nth of the lake. */
  private def catalogTable(s: SparkSession, d: String): DataFrame = {
    val tbl = "graft_master_catalog"
    master(s, d).drop("text")
      .write.mode("overwrite")
      .option("path", Tables.scratch(d, "catalog_master"))
      .partitionBy("year")
      .format("parquet")
      .saveAsTable(tbl)
    val inCatalog = s.catalog.tableExists(tbl)
    val partitionedByYear = s.catalog.listColumns(tbl).collect()
      .exists(c => c.name == "year" && c.isPartition)
    s.table(tbl)
      .filter(col("year") >= 1995 && col("year") <= 1996)
      .groupBy(col("year").cast("long").as("year"))
      .agg(count(col("review_id")).as("n_reviews"),
        round(sum(col("stars")), 2).as("sum_stars"))
      .withColumn("in_catalog", lit(inCatalog))
      .withColumn("partitioned_by_year", lit(partitionedByYear))
  }

  // ---- catalog entries ----

  private def onMaster(f: DataFrame => DataFrame)(
      s: SparkSession, d: String): DataFrame = f(master(s, d))

  val queries: Seq[Q] = Seq(
    Q("q_yelp_kpi", onMaster(Analytics.kpiTotals), Some(s"""
      $masterSql
      SELECT count(DISTINCT business_id) AS n_businesses,
             count(review_id) AS n_reviews,
             count(DISTINCT user_id) AS n_users
      FROM master""")),

    Q("q_yelp_avg_rating", onMaster(Analytics.avgRating), Some(s"""
      $masterSql
      SELECT round(avg(stars), 4) AS avg_rating FROM master""")),

    Q("q_yelp_biz_by_stars", onMaster(Analytics.businessesByStars), Some(s"""
      $masterSql
      SELECT stars, count(DISTINCT business_id) AS n_businesses
      FROM master GROUP BY stars""")),

    Q("q_yelp_yearly_trends",
      onMaster(m => Analytics.yearlyTrends(m)
        .withColumn("year", col("year").cast("long"))), Some(s"""
      $masterSql
      SELECT CAST(year AS BIGINT) AS year, count(review_id) AS n_reviews,
             count(DISTINCT business_id) AS n_businesses
      FROM master GROUP BY year""")),

    Q("q_yelp_daywise_category", onMaster(Analytics.dayWiseByCategory),
      Some(s"""
      $masterSql
      SELECT dayname(only_date) AS dow, super_category,
             count(*) AS n_reviews
      FROM master GROUP BY 1, 2""")),

    Q("q_yelp_engagement", onMaster(Analytics.engagementByCategory),
      Some(s"""
      $masterSql
      SELECT super_category,
             round(avg(useful + funny + cool), 2) AS engagement
      FROM master GROUP BY 1""")),

    Q("q_yelp_top_states", onMaster(m => Analytics.topStates(m)), Some(s"""
      $masterSql
      SELECT state, count(DISTINCT business_id) AS n_businesses
      FROM master GROUP BY 1
      ORDER BY n_businesses DESC, state ASC LIMIT 10""")),

    Q("q_yelp_most_active", onMaster(Analytics.mostActive), Some(s"""
      $masterSql,
      d AS (SELECT 'city' AS dimension, city AS val, count(*) AS cnt
            FROM master GROUP BY 2
            ORDER BY cnt DESC, val ASC LIMIT 1),
      c AS (SELECT 'super_category' AS dimension, super_category AS val,
                   count(*) AS cnt
            FROM master GROUP BY 2
            ORDER BY cnt DESC, val ASC LIMIT 1),
      w AS (SELECT 'dow' AS dimension, dayname(only_date) AS val,
                   count(*) AS cnt
            FROM master GROUP BY 2
            ORDER BY cnt DESC, val ASC LIMIT 1)
      SELECT * FROM d UNION ALL SELECT * FROM c
      UNION ALL SELECT * FROM w""")),

    Q("q_yelp_top_biz_per_city",
      onMaster(m => Analytics.topBusinessesPerCity(m)), Some(s"""
      $masterSql,
      by_biz AS (
        SELECT city, business_id, b_name,
               round(avg(stars), 4) AS avg_stars, count(*) AS n_reviews
        FROM master GROUP BY 1, 2, 3),
      ranked AS (
        SELECT city, b_name, avg_stars, n_reviews,
               CAST(row_number() OVER (
                 PARTITION BY city
                 ORDER BY avg_stars DESC, n_reviews DESC,
                          business_id ASC) AS BIGINT) AS rank
        FROM by_biz)
      SELECT * FROM ranked WHERE rank <= 3""")),

    Q("q_yelp_review_length",
      onMaster(m => Analytics.reviewLengthByMonth(m)
        .withColumn("year", col("year").cast("long"))
        .withColumn("month", col("month").cast("long"))), Some(s"""
      $masterSql
      SELECT CAST(year AS BIGINT) AS year, CAST(month AS BIGINT) AS month,
             round(avg(length(text)), 2) AS avg_len,
             CAST(max(length(text)) AS BIGINT) AS max_len,
             count(*) AS n_reviews
      FROM master GROUP BY 1, 2""")),

    Q("q_yelp_master_volume", masterVolume, Some(s"""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
             count(*) AS n_reviews,
             count(DISTINCT (o_orderkey * $VolumeAmp + i) % $NumBiz)
               AS n_businesses,
             round(avg(CAST(1 + (o_orderkey * $VolumeAmp + i) % 5
                            AS DOUBLE)), 4) AS avg_stars
      FROM orders CROSS JOIN (SELECT unnest(range($VolumeAmp)) AS i) t
      GROUP BY 1"""),
      headline = true),

    // the oracle replays the rollup straight off the fixture — the
    // catalog/table machinery is Spark-side surface whose OUTPUT must
    // equal the direct computation; TRUE literals pin the two
    // spark.catalog metadata probes (a false on either hash-fails)
    Q("q_catalog_table", catalogTable, Some(s"""
      $masterSql
      SELECT CAST(year AS BIGINT) AS year,
             count(review_id) AS n_reviews,
             round(sum(stars), 2) AS sum_stars,
             TRUE AS in_catalog, TRUE AS partitioned_by_year
      FROM master WHERE year BETWEEN 1995 AND 1996
      GROUP BY 1"""))
  )
}
