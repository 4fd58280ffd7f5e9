package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset API surface (case-class Encoders, groupByKey, custom
  * Aggregator/UDAF) plus the remaining source formats (ORC, text).
  * The reference has no UDAF/UDTF at all (SURVEY.md §2.9); these are
  * the engine-native equivalents with DuckDB oracles.
  */
object TypedAndSources {

  case class Line(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_returnflag: String)

  /** Discount-weighted average price — a custom typed Aggregator
    * (merge-able buffer → works as partial+final aggregation, the
    * scalable UDAF shape). */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Aggregator registered as an untyped UDAF column function. */
  private def typedUdaf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wavg = udaf(WeightedAvg)
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(round(wavg($"l_extendedprice", $"l_discount"), 4)
        .as("disc_weighted_price"))
  }

  /** Typed groupByKey + mapGroups — the Dataset[T] API end of the
    * surface (kept for genuinely row-typed logic; aggregations prefer
    * the relational form above, which keeps partial aggregation). */
  private def typedGroupBy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
        $"l_discount", $"l_returnflag")
      .as[Line]
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, it) =>
        var n = 0L
        var qty = 0.0
        it.foreach { l => n += 1; qty += l.l_quantity }
        (flag, n, math.round(qty * 100.0) / 100.0)
      }
      .toDF("l_returnflag", "cnt", "sum_qty")
  }

  private def scratch(d: String, tag: String): String =
    Tables.scratch(d, tag)

  /** Avro sink + source round-trip — the row-oriented interchange
    * format of the Kafka/streaming world (schema evolution, compact
    * binary rows). Spark 4 bundles the avro DataSource in spark-sql,
    * so `format("avro")` resolves with no extra jars. The oracle
    * re-derives the same aggregate from the parquet original, so the
    * hash check asserts the write→read cycle is lossless (row count,
    * grouping keys, and the decimal-rounded balance all survive the
    * Avro encoding). */
  private def avroRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "customer_avro")
    // Spark's shortname lookup special-cases "avro" to a deployment
    // error when the external module jar is absent; the FileFormat
    // class itself ships inside spark-sql 4.x, so the fully-qualified
    // name loads it directly.
    val avro = "org.apache.spark.sql.avro.AvroFileFormat"
    Tables.customer(s, d)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment", $"c_acctbal")
      .write.mode("overwrite").format(avro).save(path)
    s.read.format(avro).load(path)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        countDistinct($"c_nationkey").as("n_nations"),
        round(sum($"c_acctbal"), 2).as("bal"))
  }

  /** XML sink + source round-trip — Spark 4 ships the XML DataSource
    * in core (shortname `xml`), covering the config/feed-file
    * interchange surface. The nation dimension goes out as one
    * <nation> element per row and comes back through the schema-
    * inferring reader; the oracle recomputes the aggregate from the
    * parquet original, so the hash check asserts the XML encoding is
    * lossless for keys, strings, and grouping. */
  private def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "nation_xml")
    Tables.nation(s, d)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .write.mode("overwrite").option("rowTag", "nation")
      .format("xml").save(path)
    s.read.option("rowTag", "nation").format("xml").load(path)
      .groupBy($"n_regionkey".cast("long").as("regionkey"))
      .agg(count(lit(1)).as("cnt"),
        min($"n_name").as("first_name"),
        sum($"n_nationkey").cast("long").as("key_sum"))
  }

  /** ORC sink + source round-trip (columnar alternative to parquet). */
  private def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "supplier_orc")
    Tables.supplier(s, d).write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy($"s_nationkey".cast("long").as("nationkey"))
      .agg(count(lit(1)).as("cnt"), round(sum($"s_acctbal"), 2).as("bal"))
  }

  /** Line-oriented text source: write the raw corpus as text, read it
    * back (schema = single `value` column), re-derive stats. */
  private def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = scratch(d, "documents_text")
    Tables.documents(s, d).select($"text").write.mode("overwrite").text(path)
    s.read.text(path)
      .agg(count(lit(1)).as("n_lines"),
        sum(length($"value")).as("total_chars"),
        max(length($"value")).cast("long").as("max_chars"))
  }

  /** JDBC sink + source round-trip against the EMBEDDED Derby engine
    * that ships in the Spark distribution (zero egress — the database
    * is a directory under the scratch root). Covers the reference's
    * JDBC connectivity surface (its Athena query layer is reached over
    * JDBC — reference README.md architecture): `df.write.jdbc` creates
    * and loads the table, `spark.read.jdbc` reads it back with a
    * PARTITIONED scan (partitionColumn + bounds + numPartitions — the
    * parallel-read shape that matters on a cluster: each executor
    * opens its own connection for one key-range slice, instead of
    * serializing the whole table through a single connection). The
    * downstream aggregate snaps balances on the decimal grid, so the
    * double column survives the DOUBLE↔Derby-DOUBLE round-trip
    * bit-exactly and the oracle (straight from parquet) hash-matches
    * — which is precisely what "the round-trip is lossless" means. */
  private def jdbcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // keep Derby's boot log out of the process CWD (= the repo root)
    System.setProperty("derby.stream.error.file",
      new java.io.File(System.getProperty("java.io.tmpdir"), "derby.log")
        .getAbsolutePath)
    val url = s"jdbc:derby:${scratch(d, "derby")}/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    Tables.customer(s, d)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment", $"c_acctbal")
      .write.mode("overwrite").jdbc(url, "customer_dim", props)
    s.read.jdbc(url, "customer_dim",
        columnName = "c_custkey", lowerBound = 0L,
        upperBound = 1000000L, numPartitions = 4, props)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(($"c_acctbal".cast("decimal(18,2)") * 100).cast("long"))
          .as("bal_cents"))
  }

  /** Salted join — the skew-mitigation pattern: the (potentially
    * skewed) fact side gets a deterministic salt in [0, nSalts); the
    * dimension side is exploded nSalts× so every (key, salt) pair
    * still matches. Same result as the plain join, but a hot key's
    * rows spread over nSalts reducers instead of one. */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, nSalts: Int = 8): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()),
        lit(nSalts)).cast("int"))
    val expanded = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(expanded,
      salted(factKey) === expanded(dimKey) &&
        salted("_salt") === expanded("_salt"))
      .drop("_salt")
  }

  private def saltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val joined = saltedJoin(Tables.orders(s, d), "o_custkey",
      Tables.customer(s, d), "c_custkey")
    joined.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_typed_udaf", typedUdaf, Some("""
      SELECT l_returnflag,
             round(sum(l_extendedprice * l_discount) / sum(l_discount), 4)
               AS disc_weighted_price
      FROM lineitem GROUP BY 1""")),

    Q("q_typed_groupby", typedGroupBy, Some("""
      SELECT l_returnflag, count(*) AS cnt,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1""")),

    Q("q_avro_roundtrip", avroRoundtrip, Some("""
      SELECT c_mktsegment, count(*) AS cnt,
             CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
             round(sum(c_acctbal), 2) AS bal
      FROM customer GROUP BY 1""")),

    Q("q_xml_roundtrip", xmlRoundtrip, Some("""
      SELECT CAST(n_regionkey AS BIGINT) AS regionkey, count(*) AS cnt,
             min(n_name) AS first_name,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY 1""")),

    Q("q_orc_roundtrip", orcRoundtrip, Some("""
      SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS cnt,
             round(sum(s_acctbal), 2) AS bal
      FROM supplier GROUP BY 1""")),

    Q("q_text_roundtrip", textRoundtrip, Some("""
      SELECT count(*) AS n_lines,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             CAST(max(length(text)) AS BIGINT) AS max_chars
      FROM documents""")),

    Q("q_jdbc_roundtrip", jdbcRoundtrip, Some("""
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS bal_cents
      FROM customer GROUP BY 1""")),

    Q("q_join_salted", saltedAgg, Some("""
      SELECT c_mktsegment, count(*) AS cnt,
             round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1"""))
  )
}
