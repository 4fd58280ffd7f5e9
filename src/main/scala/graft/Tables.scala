package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet footers directly — schema comes from parquet metadata, so scans
  * are single-pass and column pruning / predicate pushdown reach the
  * file source (verified via `.explain("formatted")` in the specs).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Scratch dir for format round-trip queries — anchored to the repo
    * (not the CWD, which the driver may set elsewhere). */
  def scratch(sfDir: String, tag: String): String = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH")
      .orElse(Option("/root/repo/target").filter(p => new java.io.File(p).isDirectory))
      .getOrElse("target")
    s"$base/fmtcache/${new java.io.File(sfDir).getName}/$tag"
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.ts has shipped in two parquet encodings across testdata
    * regenerations: TIMESTAMP(NANOS) (no native Spark type — surfaces as
    * LongType under `nanosAsLong`, truncated here to micros, the same
    * truncation DuckDB applies) and plain timestamp[us] (read natively).
    * Branch on the loaded schema so either encoding works; the conf is
    * set unconditionally BEFORE the read so the LongType branch is even
    * reachable on nanos-encoded files (without it the read itself throws
    * `Illegal Parquet type`). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→Timestamp cast below is value-preserving ONLY under a
    // UTC session timezone. Every shipped entrypoint pins it, but a
    // new caller that forgets would silently shift all event
    // timestamps by its local offset — so pin it here, at the one
    // place the cast happens, instead of trusting every caller.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false loads as NTZ; the
        // session TZ is pinned to UTC everywhere (Bench/Verify/specs),
        // so this cast is a value-preserving relabel that keeps every
        // downstream consumer on the TimestampType the catalog was
        // verified against.
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** One catalog entry: a named DataFrame query plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. `oracle = None` → the driver records a weaker rows-only check
  * (used for ops whose exact output is not SQL-expressible, e.g. LSH).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times per-round */
    headline: Boolean = false)
