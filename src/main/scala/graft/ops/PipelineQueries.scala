package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline-shape coverage, driver-oracle-checkable on the
  * TPC-H tables:
  *
  *  - q_master_pipeline mirrors the reference's full master-table
  *    flow (rename → join ×2 → project → dedup → CASE derivations →
  *    date extraction → drop; reference glue_job.py:20-92) with
  *    orders/customer/nation standing in for review/user/business.
  *  - q_csv_roundtrip / q_json_roundtrip cover the S1/S4 sources and
  *    K1/K3 sinks (SURVEY.md §2.1–2.2): write the fact table out in
  *    the interchange format, read it back with a PINNED schema
  *    (single-pass, no inference job — SURVEY.md §1.2), aggregate.
  */
object PipelineQueries {

  private def masterPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nationFull = Map("FRANCE" -> "France", "GERMANY" -> "Germany",
      "CHINA" -> "China", "UNITED STATES" -> "United States")
    val o = Tables.orders(s, d)
      .withColumnRenamed("o_totalprice", "price")
      .withColumnRenamed("o_orderdate", "odate")
    val c = Tables.customer(s, d)
      .withColumnRenamed("c_name", "cust_name")
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)),
        $"c_nationkey" === $"n_nationkey")
      .select($"o_orderkey", $"cust_name", $"price", $"c_mktsegment",
        $"odate", $"n_name")
      .dropDuplicates()
      .withColumn("bucket",
        when($"price" <= 50000.0, "low")
          .when($"price" <= 150000.0, "mid")
          .otherwise("high"))
      .withColumn("nation_full",
        coalesce(element_at(typedLit(nationFull), $"n_name"), $"n_name"))
      .withColumn("o_year", year($"odate").cast("long"))
      .withColumn("o_month", month($"odate").cast("long"))
      .drop("odate", "n_name")
      .withColumn("price", round($"price", 2))
  }

  private val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Stable scratch dir per sf under the repo's target/. */
  private def scratch(d: String, tag: String): String =
    Tables.scratch(d, tag)

  /** 1-in-N deterministic sample for the [[binaryFileScan]] blob
    * round-trip (per-object filesystem cost; see its scaladoc). */
  val BinaryScanSampleMod = 10

  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "lineitem_csv")
    Tables.lineitem(s, d).write.mode("overwrite")
      .option("header", true).csv(path)
    s.read.schema(lineitemSchema).option("header", true).csv(path)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"l_quantity"), 2).as("sum_qty"))
  }

  /** Gzip-compressed CSV round-trip: same reader/writer pair as
    * q_csv_roundtrip but through the block-compression codec path —
    * at 100 TB corpora ship compressed, and gzip splits per FILE (not
    * per block), so the write keeps Spark's default many-files layout
    * to preserve read parallelism (one task per .csv.gz part). */
  private def csvGzipRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "lineitem_csv_gz")
    Tables.lineitem(s, d).write.mode("overwrite")
      .option("header", true).option("compression", "gzip").csv(path)
    s.read.schema(lineitemSchema).option("header", true).csv(path)
      .groupBy($"l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"l_extendedprice"), 2).as("sum_price"))
  }

  /** Multiline (pretty-printed / JSON-array) reader path — the other
    * JSON on-disk shape: a whole file is ONE parse unit, so unlike
    * line-delimited JSON a multiline file is NOT splittable. This demo
    * deliberately renders the BOUNDED 25-row nation dim as a single
    * array file to exercise the `multiLine` reader; at corpus scale
    * multiline-array JSON is inherently a bounded-per-file format and
    * line-delimited JSON (q_json_roundtrip) is the splittable shape
    * you ingest instead. */
  private def jsonMultilineRoundtrip(s: SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    val path = scratch(d, "nation_json_ml")
    // render the whole (bounded) dim as ONE JSON array document
    val arr = Tables.nation(s, d)
      .select(to_json(struct($"n_nationkey", $"n_name", $"n_regionkey"))
        .as("j"))
      .agg(concat(lit("["), concat_ws(",\n", collect_list($"j")), lit("]"))
        .as("doc"))
    arr.write.mode("overwrite").text(path)
    s.read.option("multiLine", true)
      .schema(StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType),
        StructField("n_regionkey", LongType))))
      .json(path)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        min($"n_name").as("first_name"))
  }

  /** `binaryFile` source scan — the standard blob-ingest path for a
    * multimodal corpus (one image/audio/doc per object): the executors
    * materialize each document's UTF-8 bytes as a `.bin` object
    * (distributed foreachPartition, no driver collect), then the
    * binaryFile reader lists the store and yields (path, length,
    * content) rows whose ids are recovered from the object names. The
    * audit reconciles BOTH the filesystem-reported length and the
    * actual content byte count against the source-of-truth text, per
    * id bucket — the integrity check a blob-ingest job runs before
    * decode. binaryFile listing parallelizes per file at 100 TB; the
    * decode stage downstream is the Multimodal codec path.
    *
    * The blob writes go through the Hadoop FileSystem resolved from
    * the staging path — on a cluster this targets the SHARED store
    * (HDFS/S3/local-shared), never each executor's private disk, so
    * the subsequent binaryFile listing sees every object regardless
    * of which executor wrote it.
    *
    * The staged corpus is a DETERMINISTIC 1-in-[[BinaryScanSampleMod]]
    * sample: the round-trip's cost is per-OBJECT (create/close/list
    * per blob — 47 s for the full 5 000 objects at sf0.1, dominated by
    * filesystem metadata, not bytes), and the audit's semantics are
    * per-blob too, so a bounded sample exercises the identical path at
    * demo-proportionate cost. The oracle applies the same modulus. */
  private def binaryFileScan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val path = scratch(d, "docs_bin")
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) { fs.delete(hPath, true): Unit }
    fs.mkdirs(hPath): Unit
    val fsUri = fs.getUri // java.net.URI is Serializable
    Tables.documents(s, d).select($"doc_id", $"text")
      .filter($"doc_id" % BinaryScanSampleMod === 0)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        // Executor side: re-resolve the FileSystem from the URI (the
        // Configuration itself is not serializable; executors load
        // core-site.xml from their own classpath).
        val efs = FileSystem.get(fsUri,
          new org.apache.hadoop.conf.Configuration())
        rows.foreach { r =>
          val out = efs.create(new HPath(path, s"${r.getLong(0)}.bin"), true)
          try out.write(r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    s.read.format("binaryFile").load(path)
      .select(
        regexp_extract($"path", "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        $"length", length($"content").cast("long").as("content_bytes"))
      .groupBy(($"doc_id" % 5).as("bucket"))
      .agg(count(lit(1)).as("n_files"),
        sum($"length").as("fs_bytes"),
        sum($"content_bytes").as("content_bytes"))
  }

  private def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "orders_json")
    Tables.orders(s, d).write.mode("overwrite").json(path)
    s.read.schema(StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))).json(path)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** SQL entry point (replaces the reference's Athena layer, SURVEY.md
    * §3.3): register temp views, run the query through spark.sql —
    * same Catalyst plan as the DataFrame form. */
  /** Corrupt-record quarantine (dead-letter) ingest: a JSON feed with
    * deterministically planted malformed rows (every 37th record loses
    * its last 3 characters — always severing the closing brace) is
    * parsed with `from_json`, which yields NULL for unparseable input
    * instead of failing the batch; rows routing to the quarantine are
    * counted per priority beside the successfully-parsed payload sum.
    * This is the ingest-robustness contract every 100 TB pipeline
    * needs: one bad upstream record must cost one quarantine row,
    * never the job. The oracle recomputes from the CORRUPTION FORMULA
    * (o_orderkey ≡ 0 mod 37), so the hash check asserts Spark's parser
    * fails on exactly the planted rows and no others — parse detection
    * via `coalesce` on the struct's required field covers both the
    * null-struct and null-fields malformed renderings. Everything is
    * scan-stage until the final tiny aggregate. */
  private def jsonQuarantine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val js = concat(lit("{\"k\": "), $"o_orderkey",
      lit(", \"p\": "), $"o_totalprice", lit("}"))
    val dirty = Tables.orders(s, d)
      .select($"o_orderpriority", $"o_orderkey", js.as("js"))
      .select($"o_orderpriority", $"o_orderkey",
        when($"o_orderkey" % 37 === 0,
          expr("substring(js, 1, length(js) - 3)")).otherwise($"js")
          .as("js"))
      .withColumn("rec", from_json($"js",
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, p DOUBLE")))
    dirty
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"rec.k".isNull, 1L).otherwise(0L)).as("n_quarantined"),
        sum(coalesce($"rec.k", lit(0L))).as("sum_parsed_k"))
  }

  private def sqlEntry(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.customer(s, d).createOrReplaceTempView("v_customer")
    s.sql("""
      SELECT c_mktsegment, count(*) AS cnt,
             round(avg(o_totalprice), 2) AS avg_price
      FROM v_orders JOIN v_customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")
  }

  /** SQL parser surface: IN-subquery + scalar subquery through
    * spark.sql (Catalyst rewrites them to joins — the Athena-style
    * interactive path, SURVEY.md §3.3). */
  private def subqueries(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("sq_orders")
    Tables.customer(s, d).createOrReplaceTempView("sq_customer")
    s.sql("""
      SELECT c_mktsegment, count(*) AS cnt
      FROM sq_customer
      WHERE c_custkey IN (SELECT o_custkey FROM sq_orders
                          WHERE o_totalprice >
                            (SELECT avg(o_totalprice) FROM sq_orders))
      GROUP BY c_mktsegment""")
  }

  /** Partitioned write + partition-pruned read as a driver-checked
    * query: orders land partitioned by year, the read-back filters one
    * partition (the §4.4 replacement for coalesce(1) layouts). */
  private def partitionedRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = Tables.scratch(d, "orders_by_year")
    Tables.orders(s, d)
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    s.read.parquet(path)
      .filter($"o_year" === 1996)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** Dynamic partition pruning — the RUNTIME companion to
    * [[partitionedRoundtrip]]'s static pruning: the year partitions
    * the fact scan may skip are known only after the dim side
    * evaluates (its filter is on an AGGREGATED measure — min price
    * per year — which no static constraint propagation can rewrite
    * into the partition key), so Catalyst inserts a
    * dynamicpruningexpression into the scan's PartitionFilters and
    * reuses the broadcast dim to evaluate it before the fact files
    * are listed. At 100 TB this is the difference between scanning
    * every date partition and touching only the qualifying ones when
    * the qualifying set is data-driven (dimension attributes,
    * not literals). StorageSpec pins the dynamicpruning expression
    * in the plan. */
  private def dppJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = Tables.scratch(d, "orders_dpp")
    Tables.orders(s, d)
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    val fact = s.read.parquet(path)
    val dim = Tables.orders(s, d)
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg((min($"o_totalprice".cast("decimal(18,2)")) * 100)
        .cast("long").as("mn_cents"))
      .filter($"mn_cents" % 3 === 0)
    fact.join(broadcast(dim), "o_year")
      .groupBy($"o_year".cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** q_schema_evolution: the ADD-COLUMN migration read path — two
    * parquet generations under one root (v=1 without `o_year`, v=2
    * with it), unified by `mergeSchema=true`: the reader widens every
    * footer to the union schema and back-fills the missing column
    * with nulls, which is exactly how a 100 TB lake absorbs schema
    * drift without rewriting history (per-generation footers are
    * merged at PLANNING time; the data files are untouched). The
    * rollup proves both halves: row counts per generation and the
    * evolved column null-filled precisely for the old generation.
    * mergeSchema is opt-in because union-ing thousands of footers has
    * a planning cost — production pins it per-table, as here. */
  private def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = Tables.scratch(d, "orders_evolve")
    val base = Tables.orders(s, d)
    base.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", $"o_totalprice")
      .write.mode("overwrite").parquet(s"$path/v=1")
    base.filter($"o_orderkey" % 2 =!= 0)
      .select($"o_orderkey", $"o_totalprice",
        year($"o_orderdate").cast("long").as("o_year"))
      .write.mode("overwrite").parquet(s"$path/v=2")
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy($"v".cast("long").as("v"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"o_year".isNull, 1L).otherwise(0L)).as("n_missing_year"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** TPC-H Q21-shaped correlated EXISTS / NOT EXISTS ("suppliers who
    * kept the order waiting"): for finished orders, count per supplier
    * the late lineitems where ANOTHER supplier shares the order
    * (EXISTS) but NO other supplier was also late (NOT EXISTS) — the
    * classic blame-assignment query whose correlated subqueries
    * Catalyst DECORRELATES into semi/anti joins on l_orderkey (run
    * through spark.sql precisely to exercise that rewrite; the
    * DataFrame equivalent would hand-write the joins). Both probes
    * shuffle on the order key alongside the main fact join — three
    * co-partitioned passes over lineitem, no per-row subquery
    * execution, which is what makes the shape viable at 100 TB. */
  private def existsWaiting(s: SparkSession, d: String): DataFrame = {
    Tables.supplier(s, d).createOrReplaceTempView("ew_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("ew_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("ew_orders")
    s.sql("""
      SELECT s_name, count(*) AS numwait
      FROM ew_supplier
      JOIN ew_lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN ew_orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > TIMESTAMP '1997-06-01'
        AND EXISTS (SELECT 1 FROM ew_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM ew_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > TIMESTAMP '1997-06-01')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name ASC
      LIMIT 20""")
  }

  /** Expectation-suite audit (Great-Expectations-style data contract):
    * every constraint yields one row — checked count, violation
    * count, pass flag, and the SMALLEST violating key as the triage
    * sample. The row-level constraints (range, domain, positivity)
    * share ONE conditional-aggregate pass over the fact table; the
    * referential check is a broadcast-dim left join counted in the
    * same style; uniqueness compares count vs distinct. Violation
    * samples stay IN the plan (min() aggregates, no driver-side
    * probing), so the audit is one job regardless of table size —
    * the shape a 100 TB contract check must have. Two constraints
    * genuinely fail on this fixture, so the pass/fail split is
    * non-vacuous. */
  private def expectations(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    def c(name: String, bad: org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"),
        count(lit(1)).as("n_checked"),
        sum(when(bad, 1L).otherwise(0L)).as("n_violations"),
        min(when(bad, $"o_orderkey")).as("sample_key"))
    val rowLevel = o.agg(
        c("totalprice_positive", $"o_totalprice" <= 0.0).as("c1"),
        c("orderdate_before_2001",
          $"o_orderdate" >= lit("2001-01-01").cast("timestamp")).as("c2"),
        c("status_in_open_final", !$"o_orderstatus".isin("O", "F")).as("c3"))
      .select(explode(array($"c1", $"c2", $"c3")).as("r")).select($"r.*")
    val fk = o.join(broadcast(Tables.customer(s, d)
        .select($"c_custkey")), $"o_custkey" === $"c_custkey", "left")
      .agg(c("custkey_references_customer", $"c_custkey".isNull).as("r"))
      .select($"r.*")
    val uniq = o.groupBy($"o_orderkey").agg(count(lit(1)).as("k"))
      .agg(lit("orderkey_unique").as("check_name"),
        count(lit(1)).as("n_checked"),
        sum(when($"k" > 1, 1L).otherwise(0L)).as("n_violations"),
        min(when($"k" > 1, $"o_orderkey")).as("sample_key"))
    rowLevel.unionByName(fk).unionByName(uniq)
      .select($"check_name", $"n_checked", $"n_violations",
        ($"n_violations" === 0L).as("pass"), $"sample_key")
  }

  /** Bucketed co-located join: both fact and dimension are written as
    * Hive-bucketed parquet tables (8 buckets on the join key, sorted
    * within buckets), then joined THROUGH the catalog — matching
    * bucket spec on both sides means the join needs NO exchange at
    * all; at 100 TB this is the difference between re-shuffling the
    * fact table on every consuming join and paying the layout cost
    * once at write time (the same motivation as q_zorder_layout, for
    * join keys instead of range predicates). A BucketSpec case in
    * StorageSpec pins the shuffle-free plan with broadcast disabled;
    * the oracle replays the join from the raw parquet — results are
    * layout-independent by construction. Table names carry the SF-dir
    * tag so sf0.01/sf0.1 runs never collide in one session. */
  private def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val ot = s"orders_bkt_$tag"
    val ct = s"customer_bkt_$tag"
    Tables.orders(s, d).write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", Tables.scratch(d, "orders_bucketed"))
      .saveAsTable(ot)
    Tables.customer(s, d).write.mode("overwrite").format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", Tables.scratch(d, "customer_bucketed"))
      .saveAsTable(ct)
    s.table(ot).join(s.table(ct), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** Snapshot diff (CDC extraction): classify every key across two
    * table versions as insert / delete / update by comparing row
    * digests over a FULL OUTER join on the key — the change feed a
    * lakehouse pipeline derives when the source can't emit one. The
    * digest is md5 of the integer cents rendering (no float formatting
    * in the hash); unchanged keys — the overwhelming majority at
    * 100 TB — are filtered out before anything leaves the join stage,
    * so the output is change-set-sized, and the join itself is one
    * co-partitioned shuffle on the key.
    *
    * Snapshots are carved deterministically from `orders`: the old
    * version is keys ≢0 (mod 10), the new version keys ≢0 (mod 7)
    * with every ≡0 (mod 5) key's price bumped by 1.00 — yielding all
    * three change classes. */
  private def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d).select($"o_orderkey".as("k"),
      ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val old = base.filter($"k" % 10 =!= 0)
      .select($"k", md5($"cents".cast("string")).as("old_digest"))
    val neu = base.filter($"k" % 7 =!= 0)
      .select($"k", md5(
        when($"k" % 5 === 0, $"cents" + 100).otherwise($"cents")
          .cast("string")).as("new_digest"))
    old.join(neu, Seq("k"), "full_outer")
      .withColumn("change_type",
        when($"old_digest".isNull, "insert")
          .when($"new_digest".isNull, "delete")
          .when($"old_digest" =!= $"new_digest", "update"))
      .filter($"change_type".isNotNull)
      .groupBy($"change_type")
      .agg(count(lit(1)).as("n"),
        min($"k").as("first_key"), max($"k").as("last_key"))
  }

  /** Referential-integrity audit across the star schema's FK edges —
    * the constraint check a lake has to run itself (no database
    * enforces FKs over parquet). One row per edge: total, null-FK and
    * orphan (anti-join) counts. Dimension sides broadcast; the only
    * fact-fact edge (lineitem→orders) shuffles once on the key. All
    * counts are exact integers. */
  private def fkAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def edge(name: String, fact: DataFrame, fk: String,
        dim: DataFrame, pk: String, broadcastDim: Boolean): DataFrame = {
      val keys = dim.select(col(pk).as("__pk")).distinct()
      val dimSide = if (broadcastDim) broadcast(keys) else keys
      // orphan count stays IN the plan (a 1-row aggregate cross-joined
      // back) — no driver-side action in a catalog query, ever
      val orphans = fact.filter(col(fk).isNotNull)
        .join(dimSide, col(fk) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      fact.agg(
        lit(name).as("edge"),
        count(lit(1)).as("n_rows"),
        sum(when(col(fk).isNull, 1L).otherwise(0L)).as("n_null_fk"))
        .crossJoin(broadcast(orphans))
    }
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    Seq(
      edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey", false),
      edge("lineitem->part", li, "l_partkey",
        Tables.part(s, d), "p_partkey", true),
      edge("lineitem->supplier", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", true),
      edge("orders->customer", o, "o_custkey",
        Tables.customer(s, d), "c_custkey", true),
      edge("customer->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey", true),
      edge("nation->region", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey", true)
    ).reduce(_ unionAll _)
  }

  /** Incremental rollup maintenance: yesterday's MATERIALIZED partial
    * aggregates merged with today's raw delta must equal the full
    * recompute — the algebraic-decomposition property every
    * incremental materialized view rests on (sum of sums, count of
    * counts, min of mins; avg re-derived from merged sum/count, never
    * averaged). The Spark side runs the INCREMENTAL path — historical
    * rows are touched once to build partials (cheap, decimal-exact),
    * then only the delta is re-read; the oracle runs the full
    * recompute. Equality of the two IS the correctness statement. */
  private def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pivot = "1997-01-01"
    val price = $"o_totalprice".cast("decimal(18,2)")
    def partial(df: DataFrame) = df
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(price).as("s"),
        min(price).as("mn"), max(price).as("mx"))
    val hist = partial(Tables.orders(s, d)
      .filter(to_date($"o_orderdate") < lit(pivot)))
    val delta = partial(Tables.orders(s, d)
      .filter(to_date($"o_orderdate") >= lit(pivot)))
    hist.unionAll(delta)
      .groupBy($"o_orderpriority")
      .agg(sum($"n").as("n_orders"), sum($"s").as("s2"),
        min($"mn").as("min_price"), max($"mx").as("max_price"))
      .select($"o_orderpriority", $"n_orders",
        round($"s2".cast("double"), 2).as("total"),
        round($"s2".cast("double") / $"n_orders", 4).as("avg_price"),
        $"min_price".cast("double").as("min_price"),
        $"max_price".cast("double").as("max_price"))
  }

  /** Incremental JOIN-view maintenance — the delta-join algebra
    * (Blakeley/Larson/Tompa 1986; the same signed-multiplicity rule
    * DBSP/Materialize generalize) that [[incrementalRollup]]'s
    * single-table decomposition cannot express: when a materialized
    * join view J = A ⋈ B receives fact inserts ΔA AND dimension
    * updates ΔB (delete+insert as −1/+1 signed rows), the exact
    * maintenance is J += ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — every term joins a
    * SMALL delta against one stored side, so the maintenance cost is
    * ∝ |Δ|·fan, never a full re-join (at 100 TB, A⋈ΔB is a
    * broadcast-pruned scan keyed by ΔB's key set; a deployment with
    * a key index pays only the matching rows). The Spark side runs
    * the INCREMENTAL path and then CHECKS itself against the full
    * recompute on the post-update state — matches_full is computed,
    * not assumed, so a broken delta algebra hash-fails the oracle
    * (which runs only the full recompute and pins TRUE). Split:
    * fact inserts = orderkey % 10 == 0; dim updates = custkey % 7
    * == 0 moving to segment 'UPDATED'. */
  private def ivmJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select($"o_orderkey", $"o_custkey",
      ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    val aOld = o.filter($"o_orderkey" % 10 =!= 0)
      .select($"o_custkey", $"cents")
    val dA = o.filter($"o_orderkey" % 10 === 0)
      .select($"o_custkey", $"cents")
    val c = Tables.customer(s, d).select($"c_custkey", $"c_mktsegment")
    val changed = c.filter($"c_custkey" % 7 === 0)
    // signed dim delta: retract the old segment row, assert the new
    val dB = changed.select($"c_custkey", $"c_mktsegment",
        lit(-1L).as("sgn"))
      .unionByName(changed.select($"c_custkey",
        lit("UPDATED").as("c_mktsegment"), lit(1L).as("sgn")))
    def rollup(df: DataFrame) = df.groupBy($"c_mktsegment")
      .agg(sum($"w").as("n"), sum($"wc").as("wc"))
    val jOld = rollup(aOld
      .join(c.hint("broadcast"), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", lit(1L).as("w"), $"cents".as("wc")))
    val d1 = rollup(dA
      .join(c.hint("broadcast"), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", lit(1L).as("w"), $"cents".as("wc")))
    val d2 = rollup(aOld
      .join(broadcast(dB), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"sgn".as("w"),
        ($"sgn" * $"cents").as("wc")))
    val d3 = rollup(dA
      .join(broadcast(dB), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"sgn".as("w"),
        ($"sgn" * $"cents").as("wc")))
    val maintained = jOld.unionByName(d1).unionByName(d2)
      .unionByName(d3)
      .groupBy($"c_mktsegment")
      .agg(sum($"n").as("n_orders"), sum($"wc").as("revenue_cents"))
      .filter($"n_orders" > 0)
    // self-check: the incremental result must equal the full re-join
    // over the post-update state (computed, not assumed)
    val bNew = c.select($"c_custkey",
      when($"c_custkey" % 7 === 0, lit("UPDATED"))
        .otherwise($"c_mktsegment").as("c_mktsegment"))
    val full = o.select($"o_custkey", $"cents")
      .join(bNew.hint("broadcast"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("f_n"), sum($"cents").as("f_cents"))
    maintained.join(full, Seq("c_mktsegment"), "full_outer")
      .select($"c_mktsegment", $"n_orders", $"revenue_cents",
        ($"n_orders" <=> $"f_n" && $"revenue_cents" <=> $"f_cents")
          .as("matches_full"))
  }

  /** Primary-key uniqueness audit — q_fk_audit's companion: per
    * table, row count vs distinct-key count and the number of
    * violated key values. One map-side-combinable aggregate per
    * table, tiny union of 1-row results. */
  private def pkAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def check(table: String, df: DataFrame, pk: String): DataFrame = {
      val dups = df.groupBy(col(pk)).agg(count(lit(1)).as("__n"))
        .filter($"__n" > 1).agg(count(lit(1)).as("n_dup_keys"))
      df.agg(lit(table).as("table_name"),
        count(lit(1)).as("n_rows"),
        countDistinct(col(pk)).as("n_distinct_pk"))
        .crossJoin(broadcast(dups))
    }
    Seq(
      check("region", Tables.region(s, d), "r_regionkey"),
      check("nation", Tables.nation(s, d), "n_nationkey"),
      check("customer", Tables.customer(s, d), "c_custkey"),
      check("supplier", Tables.supplier(s, d), "s_suppkey"),
      check("part", Tables.part(s, d), "p_partkey"),
      check("orders", Tables.orders(s, d), "o_orderkey"),
      check("events", Tables.events(s, d), "event_id"),
      check("documents", Tables.documents(s, d), "doc_id"),
      check("embeddings", Tables.embeddings(s, d), "vec_id")
    ).reduce(_ unionAll _)
  }

  /** Cross-engine table checksum — the reconciliation primitive a
    * migration (or a nightly copy job) runs on BOTH systems to prove
    * two tables are identical without moving either: each row
    * canonicalizes to a pipe-joined string (decimals pinned to 2
    * places, dates to ISO — the formatting IS the contract), hashes
    * through the portable polynomial kernel
    * ([[graft.ext.PolyHashExpr]], replayed verbatim by DuckDB), and
    * the checksum is the SUM of row hashes — order-independent, so
    * partitioning and sort order never matter. Grouped by return
    * flag so a mismatch localizes to a slice instead of a bare "the
    * tables differ". One combinable aggregate; at any scale the
    * shuffle carries |groups| rows. */
  private def tableChecksum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rowStr = concat_ws("|",
      $"l_orderkey", $"l_linenumber",
      $"l_quantity".cast("decimal(12,2)"),
      $"l_extendedprice".cast("decimal(12,2)"),
      $"l_returnflag", $"l_shipdate".cast("date"))
    Tables.lineitem(s, d)
      .select($"l_returnflag",
        graft.ext.PolyHashExpr.polyHash(rowStr, 31L).as("h"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum($"h").as("checksum"))
  }

  /** Shard counts compared by [[rendezvousShards]]. */
  val ShardsBefore = 8
  val ShardsAfter = 9

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-hashing answer to "add a shard without reshuffling
    * the world": each user goes to argmax over shards of
    * h(user, shard), so growing [[ShardsBefore]] → [[ShardsAfter]]
    * remaps ONLY the users whose new shard wins — in expectation
    * 1/[[ShardsAfter]] of keys, vs (N−1)/N for mod-N sharding. The
    * weight is the portable polynomial hash of "user:shard" (exact
    * integers, DuckDB-replayable); the (weight, shard) argmax is
    * ENCODED into one BIGINT — w·16 + (15−shard), hash < 2³¹ so the
    * low bits are free — because struct-valued greatest is not
    * portable; ties break to the lower shard id deterministically.
    * Output: per before-shard, the key count and
    * how many remap — the elasticity audit a storage migration runs
    * before committing to a topology change; the spec pins the
    * remap fraction against both the 1/N expectation and the mod-N
    * strawman. One scan, a 2×[[ShardsAfter]]-term argmax per row,
    * one combinable rollup. */
  private def rendezvousShards(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The raw polynomial hash is AFFINE in the shard id (the shard
    // digit contributes a constant step), so across shards the
    // weights form an arithmetic progression mod p and the winner is
    // CONSTANT per key-length class (measured: every user landed on
    // the max shard). SQUARING mod p destroys the progression —
    // quadratic residues scatter — and both engines compute it in
    // exact int64 (h < 2^31 so h^2 < 2^62).
    def weight(shard: Int) = pmod(
      graft.ext.PolyHashExpr.polyHash(
        concat(lit(s"s$shard:"), $"user_id".cast("string")), 31L) *
        graft.ext.PolyHashExpr.polyHash(
          concat(lit(s"s$shard:"), $"user_id".cast("string")), 31L),
      lit(2147483647L))
    def winner(n: Int) = lit(15L) - pmod(greatest(
      (0 until n).map(i => weight(i) * 16L + (15L - i)): _*), lit(16L))
    val users = Tables.events(s, d).select($"user_id").distinct()
    users
      .withColumn("shard_before", winner(ShardsBefore))
      .withColumn("shard_after", winner(ShardsAfter))
      .groupBy($"shard_before")
      .agg(count(lit(1)).as("n_keys"),
        sum(when($"shard_before" =!= $"shard_after", 1L).otherwise(0L))
          .as("n_remapped"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_rendezvous_shards", rendezvousShards, Some {
      def w(shard: Int) = {
        val h = graft.scale.TextOps.polyHashSql(
          s"'s$shard:' || user_id", 31L)
        s"(($h) * ($h)) % 2147483647"
      }
      def best(n: Int) = (0 until n).map(i =>
        s"(${w(i)}) * 16 + ${15 - i}")
        .mkString("15 - greatest(", ", ", ") % 16")
      s"""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      a AS (SELECT user_id,
                   ${best(ShardsBefore)} AS shard_before,
                   ${best(ShardsAfter)} AS shard_after
            FROM u)
      SELECT shard_before, count(*) AS n_keys,
             CAST(sum(CASE WHEN shard_before <> shard_after
               THEN 1 ELSE 0 END) AS BIGINT) AS n_remapped
      FROM a GROUP BY 1"""
    }),
    Q("q_table_checksum", tableChecksum, Some(s"""
      WITH r AS (SELECT l_returnflag,
                        ${graft.scale.TextOps.polyHashSql(
                          "l_orderkey || '|' || l_linenumber || '|' " +
                          "|| CAST(l_quantity AS DECIMAL(12,2)) || '|' " +
                          "|| CAST(l_extendedprice AS DECIMAL(12,2)) " +
                          "|| '|' || l_returnflag || '|' " +
                          "|| CAST(l_shipdate AS DATE)", 31L)} AS h
                 FROM lineitem)
      SELECT l_returnflag, count(*) AS n_rows,
             CAST(sum(h) AS BIGINT) AS checksum
      FROM r GROUP BY 1""")),
    Q("q_pk_audit", pkAudit, Some(
      Seq(("region", "r_regionkey"), ("nation", "n_nationkey"),
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id")).map { case (t, k) =>
        s"""
      SELECT '$t' AS table_name, count(*) AS n_rows,
             CAST(count(DISTINCT $k) AS BIGINT) AS n_distinct_pk,
             CAST((SELECT count(*) FROM (
                     SELECT $k FROM $t GROUP BY $k HAVING count(*) > 1))
                  AS BIGINT) AS n_dup_keys
      FROM $t"""
      }.mkString("\n      UNION ALL"))),

    Q("q_incremental_rollup", incrementalRollup, Some("""
      WITH g AS (SELECT o_orderpriority,
                        CAST(o_totalprice AS DECIMAL(18,2)) AS p
                 FROM orders)
      SELECT o_orderpriority,
             count(*) AS n_orders,
             round(CAST(sum(p) AS DOUBLE), 2) AS total,
             round(CAST(sum(p) AS DOUBLE) / count(*), 4) AS avg_price,
             CAST(min(p) AS DOUBLE) AS min_price,
             CAST(max(p) AS DOUBLE) AS max_price
      FROM g GROUP BY 1""")),

    // oracle = FULL recompute over the post-update state with the
    // flag pinned TRUE: if the Spark side's delta algebra drops or
    // double-counts anything, its computed matches_full (or the
    // maintained counts themselves) hash-fail
    Q("q_ivm_join", ivmJoin, Some("""
      WITH b_new AS (SELECT c_custkey,
                            CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED'
                                 ELSE c_mktsegment END AS c_mktsegment
                     FROM customer),
      o AS (SELECT o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT) AS cents
            FROM orders)
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents,
             TRUE AS matches_full
      FROM o JOIN b_new ON o_custkey = c_custkey
      GROUP BY 1""")),

    Q("q_fk_audit", fkAudit, Some("""
      SELECT 'lineitem->orders' AS edge, count(*) AS n_rows,
             CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_fk,
             CAST((SELECT count(*) FROM lineitem l
                   WHERE l.l_orderkey IS NOT NULL
                     AND l.l_orderkey NOT IN
                         (SELECT o_orderkey FROM orders
                          WHERE o_orderkey IS NOT NULL)) AS BIGINT)
               AS n_orphans
      FROM lineitem
      UNION ALL
      SELECT 'lineitem->part', count(*),
             CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST((SELECT count(*) FROM lineitem l
                   WHERE l.l_partkey IS NOT NULL
                     AND l.l_partkey NOT IN
                         (SELECT p_partkey FROM part
                          WHERE p_partkey IS NOT NULL)) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem->supplier', count(*),
             CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST((SELECT count(*) FROM lineitem l
                   WHERE l.l_suppkey IS NOT NULL
                     AND l.l_suppkey NOT IN
                         (SELECT s_suppkey FROM supplier
                          WHERE s_suppkey IS NOT NULL)) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders->customer', count(*),
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST((SELECT count(*) FROM orders o
                   WHERE o.o_custkey IS NOT NULL
                     AND o.o_custkey NOT IN
                         (SELECT c_custkey FROM customer
                          WHERE c_custkey IS NOT NULL)) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'customer->nation', count(*),
             CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST((SELECT count(*) FROM customer c
                   WHERE c.c_nationkey IS NOT NULL
                     AND c.c_nationkey NOT IN
                         (SELECT n_nationkey FROM nation
                          WHERE n_nationkey IS NOT NULL)) AS BIGINT)
      FROM customer
      UNION ALL
      SELECT 'nation->region', count(*),
             CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST((SELECT count(*) FROM nation n
                   WHERE n.n_regionkey IS NOT NULL
                     AND n.n_regionkey NOT IN
                         (SELECT r_regionkey FROM region
                          WHERE r_regionkey IS NOT NULL)) AS BIGINT)
      FROM nation""")),

    Q("q_snapshot_diff", snapshotDiff, Some("""
      WITH base AS (SELECT o_orderkey AS k,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT) AS cents
                    FROM orders),
      old AS (SELECT k, md5(CAST(cents AS VARCHAR)) AS old_digest
              FROM base WHERE k % 10 <> 0),
      neu AS (SELECT k, md5(CAST(CASE WHEN k % 5 = 0 THEN cents + 100
                                      ELSE cents END AS VARCHAR))
                       AS new_digest
              FROM base WHERE k % 7 <> 0),
      d AS (SELECT coalesce(old.k, neu.k) AS k,
                   CASE WHEN old_digest IS NULL THEN 'insert'
                        WHEN new_digest IS NULL THEN 'delete'
                        WHEN old_digest <> new_digest THEN 'update'
                   END AS change_type
            FROM old FULL OUTER JOIN neu ON old.k = neu.k)
      SELECT change_type, count(*) AS n,
             min(k) AS first_key, max(k) AS last_key
      FROM d WHERE change_type IS NOT NULL
      GROUP BY 1""")),

    Q("q_subqueries", subqueries, Some("""
      SELECT c_mktsegment, count(*) AS cnt
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice >
                            (SELECT avg(o_totalprice) FROM orders))
      GROUP BY c_mktsegment""")),

    Q("q_partitioned_roundtrip", partitionedRoundtrip, Some("""
      SELECT o_orderstatus, count(*) AS cnt,
             round(sum(o_totalprice), 2) AS total
      FROM orders WHERE year(o_orderdate) = 1996
      GROUP BY 1""")),

    Q("q_schema_evolution", schemaEvolution, Some("""
      SELECT CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END
               AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_missing_year,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1""")),

    Q("q_exists_waiting", existsWaiting, Some("""
      SELECT s_name, count(*) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > TIMESTAMP '1997-06-01'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > TIMESTAMP '1997-06-01')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name ASC
      LIMIT 20""")),

    Q("q_expectations", expectations, Some("""
      WITH rl AS (
        SELECT 'totalprice_positive' AS check_name, count(*) AS n_checked,
               sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
                 AS n_violations,
               min(CASE WHEN o_totalprice <= 0.0 THEN o_orderkey END)
                 AS sample_key
        FROM orders
        UNION ALL
        SELECT 'orderdate_before_2001', count(*),
               sum(CASE WHEN o_orderdate >= TIMESTAMP '2001-01-01'
                        THEN 1 ELSE 0 END),
               min(CASE WHEN o_orderdate >= TIMESTAMP '2001-01-01'
                        THEN o_orderkey END)
        FROM orders
        UNION ALL
        SELECT 'status_in_open_final', count(*),
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                        THEN 1 ELSE 0 END),
               min(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                        THEN o_orderkey END)
        FROM orders
        UNION ALL
        SELECT 'custkey_references_customer', count(*),
               sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END),
               min(CASE WHEN c.c_custkey IS NULL THEN o.o_orderkey END)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'orderkey_unique', count(*),
               sum(CASE WHEN k > 1 THEN 1 ELSE 0 END),
               min(CASE WHEN k > 1 THEN o_orderkey END)
        FROM (SELECT o_orderkey, count(*) AS k FROM orders GROUP BY 1))
      SELECT check_name, n_checked, CAST(n_violations AS BIGINT)
               AS n_violations,
             n_violations = 0 AS pass, sample_key
      FROM rl""")),

    Q("q_bucketed_join", bucketedJoin, Some("""
      SELECT c_mktsegment, count(*) AS cnt,
             round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1""")),

    Q("q_dpp_join", dppJoin, Some("""
      WITH dim AS (SELECT year(o_orderdate) AS o_year,
                          CAST(min(CAST(o_totalprice
                            AS DECIMAL(18,2))) * 100 AS BIGINT)
                            AS mn_cents
                   FROM orders GROUP BY 1)
      SELECT CAST(f.o_year AS BIGINT) AS o_year,
             count(*) AS n_orders,
             round(sum(f.o_totalprice), 2) AS total
      FROM (SELECT year(o_orderdate) AS o_year, o_totalprice
            FROM orders) f
      JOIN dim ON f.o_year = dim.o_year
      WHERE mn_cents % 3 = 0
      GROUP BY 1""")),

    Q("q_master_pipeline", masterPipeline, Some("""
      SELECT o_orderkey, cust_name, round(price, 2) AS price,
             c_mktsegment,
             CASE WHEN price <= 50000.0 THEN 'low'
                  WHEN price <= 150000.0 THEN 'mid'
                  ELSE 'high' END AS bucket,
             CASE WHEN n_name = 'FRANCE' THEN 'France'
                  WHEN n_name = 'GERMANY' THEN 'Germany'
                  WHEN n_name = 'CHINA' THEN 'China'
                  WHEN n_name = 'UNITED STATES' THEN 'United States'
                  ELSE n_name END AS nation_full,
             CAST(year(odate) AS BIGINT) AS o_year,
             CAST(month(odate) AS BIGINT) AS o_month
      FROM (SELECT DISTINCT o_orderkey, c_name AS cust_name,
                   o_totalprice AS price, c_mktsegment,
                   o_orderdate AS odate, n_name
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey) t"""),
      headline = true),

    Q("q_csv_roundtrip", csvRoundtrip, Some("""
      SELECT l_returnflag, count(*) AS cnt,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1""")),

    Q("q_csv_gzip_roundtrip", csvGzipRoundtrip, Some("""
      SELECT l_linestatus, count(*) AS cnt,
             round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem GROUP BY 1""")),

    Q("q_json_multiline_roundtrip", jsonMultilineRoundtrip, Some("""
      SELECT n_regionkey, count(*) AS n_nations,
             min(n_name) AS first_name
      FROM nation GROUP BY 1""")),

    Q("q_binaryfile_scan", binaryFileScan, Some(s"""
      SELECT CAST(doc_id % 5 AS BIGINT) AS bucket,
             count(*) AS n_files,
             CAST(sum(octet_length(encode(text))) AS BIGINT) AS fs_bytes,
             CAST(sum(octet_length(encode(text))) AS BIGINT)
               AS content_bytes
      FROM documents
      WHERE doc_id % $BinaryScanSampleMod = 0
      GROUP BY 1""")),

    Q("q_json_quarantine", jsonQuarantine, Some("""
      SELECT o_orderpriority, count(*) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey % 37 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_quarantined,
             CAST(sum(CASE WHEN o_orderkey % 37 <> 0 THEN o_orderkey
                           ELSE 0 END) AS BIGINT) AS sum_parsed_k
      FROM orders GROUP BY 1""")),

    Q("q_json_roundtrip", jsonRoundtrip, Some("""
      SELECT o_orderstatus, count(*) AS cnt,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1""")),

    Q("q_sql_entry", sqlEntry, Some("""
      SELECT c_mktsegment, count(*) AS cnt,
             round(avg(o_totalprice), 2) AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")),

    Q("q_cdc_merge", cdcMerge, Some("""
      WITH ch AS (SELECT o_custkey AS key, o_orderkey AS seq,
                         CASE WHEN o_orderkey % 7 = 0 THEN 'D'
                              ELSE 'U' END AS op,
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents
                  FROM orders),
      latest AS (SELECT key, op, cents FROM (
                   SELECT key, op, cents,
                          row_number() OVER (PARTITION BY key
                            ORDER BY seq DESC) AS rn
                   FROM ch) t WHERE rn = 1)
      SELECT CAST(key % 10 AS BIGINT) AS shard, count(*) AS n_keys,
             CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tombstoned,
             CAST(sum(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alive,
             CAST(sum(CASE WHEN op <> 'D' THEN cents ELSE 0 END)
               AS BIGINT) AS alive_cents
      FROM latest GROUP BY 1"""))
  )

  /** CDC apply — latest-wins merge with delete tombstones, the core
    * of a lakehouse MERGE INTO / change-stream compaction (distinct
    * from the SCD1/SCD2 upserts, which never delete): orders is read
    * as a change stream keyed by customer with o_orderkey as the
    * monotone sequence number and every 7th change a delete. The
    * newest change per key decides the key's fate; a final tombstone
    * removes it from the snapshot. One window shuffle on the merge
    * key, one |shards|-row rollup — at 100 TB the window pass IS the
    * standard CDC-compaction shape (shuffle by key, sort by seq), and
    * the same plan serves any log-structured table format.
    */
  private def cdcMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val changes = Tables.orders(s, d).select(
      $"o_custkey".as("key"),
      $"o_orderkey".as("seq"),
      when($"o_orderkey" % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
      ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"key").orderBy($"seq".desc)
    changes.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .groupBy(($"key" % 10).cast("long").as("shard"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when($"op" === "D", 1L).otherwise(0L)).as("n_tombstoned"),
        sum(when($"op" =!= "D", 1L).otherwise(0L)).as("n_alive"),
        sum(when($"op" =!= "D", $"cents").otherwise(0L)).as("alive_cents"))
  }
}
