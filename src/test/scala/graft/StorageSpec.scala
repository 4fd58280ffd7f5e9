package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout strategies for scale: bucketing (co-located joins
  * with zero shuffle), partitioned writes (partition pruning), and
  * salting (skew). These are the §4.4 replacements for the
  * reference's coalesce(1)-and-hope layout.
  */
class StorageSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    p.collect { case e: ShuffleExchangeLike => e }.size
  }

  test("salted join returns exactly the plain join's aggregate") {
    val got = SparkEntry.queries("q_join_salted")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"), round(sum($"o_totalprice"), 2).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === want)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // Salting (above) is the MANUAL skew fix; this pins the AUTOMATIC
    // one: with a planted hot key and thresholds scaled to test data,
    // AQE must re-plan the straggler partition into skew-split reads
    // (isSkewJoin on the final SortMergeJoin).
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pad = "x" * 64
      // payload must be non-constant so it can't fold away — it has to
      // ride the shuffle and actually inflate the hot partition
      val hot = spark.range(30000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 50)
          .as("k"), concat(lit(pad), col("id")).as("payload"))
      val dim = spark.range(50).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("tag"))
      val joined = hot.join(dim, "k")
      joined.collect() // finalize this QueryExecution's adaptive plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // query stages are leaf nodes to collect(), so match the
      // rendered plan: the join must carry skew=true and the shuffle
      // read must be a skew-split one
      val rendered = finalPlan.toString
      assert(rendered.contains("skew=true") && rendered.contains("skewed"),
        s"AQE did not mark the hot-key join as skew-split:\n$rendered")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without any shuffle") {
    // the in-memory metastore is fresh per JVM but the warehouse dir
    // persists on disk — clear both before re-creating
    Seq("orders_bucketed", "customer_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"target/spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")
    val joined = spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"),
        $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name")
    assert(shuffleCount(joined) === 0,
      "bucketed equi-join must not shuffle")
    assert(joined.count() > 0)
  }

  test("q_bucketed_join: bucket-to-bucket join, only the final agg " +
      "shuffles even with broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
      assert(shuffleCount(df) === 1,
        "the 8-bucket join must be exchange-free; only the groupBy " +
          "aggregation may shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("partitioned write enables partition pruning in the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "part_out")
    Tables.orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$dir/orders_by_year")
    val pruned = spark.read.parquet(s"$dir/orders_by_year")
      .filter($"o_year" === 1996)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"no partition filter:\n$plan")
    assert(pruned.count() ===
      Tables.orders(spark, sf).filter(year($"o_orderdate") === 1996).count())
  }

  test("q_catalog_table: the metastore read-back path prunes year " +
      "partitions and the catalog lists the table") {
    // running the query creates + registers the table in this session
    val rows = SparkEntry.queries("q_catalog_table")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("in_catalog")))
    assert(rows.forall(_.getAs[Boolean]("partitioned_by_year")))
    assert(spark.catalog.tableExists("graft_master_catalog"))
    // read THROUGH the catalog (spark.table, not a path): the
    // CatalogFileIndex must turn the year predicate into partition
    // pruning — the Athena-parity property (SURVEY §2 S3)
    val pruned = spark.table("graft_master_catalog")
      .filter($"year" === 1996)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(year"),
      s"no partition filter on the catalog read:\n${plan.take(2000)}")
    // and the pruned read agrees with the in-memory master
    val expect = SparkEntry.queries("q_yelp_yearly_trends")(spark, sf)
      .filter($"year" === 1996).collect().head.getAs[Long]("n_reviews")
    assert(pruned.count() === expect)
  }

  test("IVF cell-partitioned embedding layout prunes reads to probed cells") {
    import graft.scale.Similarity
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val assigned = Similarity.ivfAssign(e, Similarity.ivfCentroidsOf(e))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ivf_out")
    assigned.join(e, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/ivf")
    // a 4-probe query reads 4 of the 16 cell directories, nothing else
    val probeCells = assigned.select($"cell").distinct()
      .orderBy($"cell").limit(4).collect().map(_.getLong(0))
    val probed = spark.read.parquet(s"$dir/ivf")
      .filter($"cell".isin(probeCells: _*))
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [cell"),
      s"no partition filter on cell:\n${plan.take(2000)}")
    assert(probed.count() ===
      assigned.filter($"cell".isin(probeCells: _*)).count())
  }

  test("schema evolution: mergeSchema unions old and new parquet batches") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "evolve")
    // v1 batch has (id, a); later batches add column b — the additive
    // schema drift every long-lived 100 TB dataset accumulates
    spark.range(0, 5).selectExpr("id", "id * 2 AS a")
      .write.mode("append").parquet(s"$dir/t")
    spark.range(5, 10).selectExpr("id", "id * 2 AS a", "id + 100 AS b")
      .write.mode("append").parquet(s"$dir/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet === Set("id", "a", "b"))
    assert(merged.count() === 10)
    // old rows surface b as null, new rows carry values
    assert(merged.filter($"b".isNull).count() === 5)
    assert(merged.filter($"b" === $"id" + 100).count() === 5)
  }

  test("jdbc round-trip: partitioned read opens 4 key-range slices and " +
      "loses no rows") {
    // the catalog query writes customer_dim into the embedded Derby db
    val agg = SparkEntry.queries("q_jdbc_roundtrip")(spark, sf)
    val nCustomers = Tables.customer(spark, sf).count()
    assert(agg.agg(sum($"n")).head.getLong(0) === nCustomers)
    // re-open the table the way the query does and pin the parallel
    // scan: numPartitions JDBC slices, not one serializing connection
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val back = spark.read.jdbc(
      s"jdbc:derby:${Tables.scratch(sf, "derby")}/db", "customer_dim",
      columnName = "c_custkey", lowerBound = 0L, upperBound = 1000000L,
      numPartitions = 4, props)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === nCustomers)
    // and the JDBC source pushes the partition predicates, not a full
    // scan per slice: each stride filters on the partition column
    val scans = back.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.toString.contains("JDBCRelation")))
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dpo").toString
    val keep = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
        .toDF("id", "part", "v")
        .write.partitionBy("part").mode("overwrite").parquet(dir)
      // overwrite ONLY partition b — a static overwrite would wipe a/c
      Seq((9, "b", 99)).toDF("id", "part", "v")
        .write.partitionBy("part").mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir)
        .collect().map(r => (r.getAs[String]("part"), r.getAs[Int]("v")))
        .toSet
      assert(got === Set(("a", 10), ("b", 99), ("c", 30)),
        "dynamic overwrite must leave untouched partitions intact")
    } finally {
      keep match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("Observation API collects pipeline metrics without a second pass") {
    // the data-quality counters a production job attaches to its write:
    // collected DURING the action (CollectMetrics node), not by
    // re-scanning afterwards
    val obs = new org.apache.spark.sql.Observation("quality")
    val df = Tables.orders(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("null_cust"),
        max($"o_totalprice").as("max_price"))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") === Tables.orders(spark, sf).count())
    assert(m("null_cust") === 0L)
    assert(m("max_price").asInstanceOf[Double] > 0.0)
  }

  test("repartition by column co-locates keys (single shuffle, then none)") {
    val re = Tables.orders(spark, sf).repartition(4, $"o_custkey")
    val agg = re.groupBy($"o_custkey").agg(count(lit(1)))
    // the groupBy reuses the repartition's hash distribution
    assert(shuffleCount(agg) === 1)
  }

  test("q_ivm_join: the signed delta-join maintenance equals a brute " +
      "full re-join, the self-check flag is TRUE everywhere, and " +
      "every delta term is actually exercised") {
    val rows = SparkEntry.queries("q_ivm_join")(spark, sf).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents"),
          r.getAs[Boolean]("matches_full")))).toMap
    assert(rows.contains("UPDATED"), "dim update produced no segment")
    rows.foreach { case (seg, (_, _, ok)) =>
      assert(ok, s"$seg: incremental != full recompute")
    }
    // brute full re-join over the post-update state
    val custSeg = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => r.getLong(0) ->
        (if (r.getLong(0) % 7 == 0) "UPDATED" else r.getString(1)))
      .toMap
    val want = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .collect()
      .flatMap { r =>
        custSeg.get(r.getLong(1)).map(seg =>
          (seg, r.getLong(2), r.getLong(0)))
      }
    val bySeg = want.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum)).toMap
    assert(rows.view.mapValues(v => (v._1, v._2)).toMap === bySeg)
    // the cross term dA x dB must be non-empty here, or this spec
    // wouldn't catch an algebra that forgets it
    val crossReal = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 10 === 0 && $"o_custkey" % 7 === 0)
      .count()
    assert(crossReal > 0, "delta-fact x delta-dim cross term is empty")
  }

  test("q_dpp_join: the fact scan carries a DYNAMIC partition " +
      "pruning filter (the dim filter is aggregate-derived, so " +
      "static pruning cannot apply) and the result replays brute") {
    val df = SparkEntry.queries("q_dpp_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "no dynamicpruningexpression in the fact scan")
    // brute replay: qualifying years from min-price-cents % 3
    val byYear = Tables.orders(spark, sf)
      .select(year($"o_orderdate").as("y"),
        $"o_totalprice".cast("decimal(18,2)").as("p"))
      .collect().map(r => (r.getInt(0),
        r.getDecimal(1).movePointRight(2).longValueExact()))
      .groupBy(_._1)
    val want = byYear.collect {
      case (y, rows) if rows.map(_._2).min % 3 == 0 =>
        y.toLong -> rows.length.toLong
    }
    val got = df.collect()
      .map(r => r.getAs[Long]("o_year") -> r.getAs[Long]("n_orders"))
      .toMap
    assert(got === want)
    assert(got.nonEmpty && got.size < byYear.size,
      "filter must prune SOME but not all years for the pin to bite")
  }
}
