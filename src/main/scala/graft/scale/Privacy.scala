package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy / governance operators for the training-data pipeline:
  * PII redaction (regex scrubbing of emails / phone numbers before a
  * corpus is used for training), deterministic pseudonymization
  * (keyed hashing so identity joins still work after anonymization),
  * and URL extraction (the pre-pass for link-graph dedup and domain
  * filtering).
  *
  * Everything is scan-local native expressions — no UDFs, no shuffle;
  * at 100 TB these run inside whole-stage codegen over the parquet
  * scan, exactly like TextOps. The regex subset used (character
  * classes, bounded repetition, alternation) behaves identically in
  * Java regex (Spark) and RE2 (DuckDB), which is what makes the
  * oracles exact.
  *
  * The `documents` fixture carries no natural PII, so the queries
  * PLANT deterministic emails/phones/URLs derived from doc_id (both
  * sides replay the same construction) — the operator is then
  * demonstrably removing something real.
  */
object Privacy {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val UrlPattern = "https?://[A-Za-z0-9./_-]+"

  /** Deterministic planted-PII text: the doc text plus an email and a
    * phone number derived from doc_id. */
  private def plantedPii: Column =
    concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com tel +1-555-010-"),
      lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"))

  private val plantedPiiSql =
    """text || ' contact user' || CAST(doc_id AS VARCHAR)
       || '@example.com tel +1-555-010-'
       || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')"""

  /** PII redaction: count then scrub emails and phone numbers.
    * Spark's regexp_replace is replace-all by default (DuckDB needs
    * the 'g' flag for parity). */
  private def piiRedact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", plantedPii.as("t"))
      .select(
        $"doc_id",
        size(regexp_extract_all($"t", lit(EmailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all($"t", lit(PhonePattern), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace($"t", EmailPattern, "[EMAIL]"),
          PhonePattern, "[PHONE]").as("redacted"))
  }

  /** Deterministic pseudonymization over `customer`: a keyed SHA-256
    * of the name (same input → same token, so joins on the pseudonym
    * still co-partition), plus partial masking (first char + last 2
    * kept) — the two standard anonymization shapes. The salt is a
    * pipeline constant, NOT a per-row secret: rotating it re-keys the
    * whole corpus. */
  private def pseudonymize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select(
      $"c_custkey",
      sha2(concat(lit("graft-v1:"), $"c_name"), 256).as("name_token"),
      concat(substring($"c_name", 1, 1), lit("***"),
        substring($"c_name", -2, 2)).as("name_masked"))
  }

  /** URL extraction: the pre-pass for domain filtering / link dedup.
    * Plants two deterministic URLs per doc, extracts them plus the
    * registrable domain of the first. */
  private def urlExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = concat(lit("see https://example.com/d/"),
      $"doc_id".cast("string"),
      lit(" and http://mirror-"), pmod($"doc_id", lit(10)).cast("string"),
      lit(".example.org/x "), $"text")
    Tables.documents(s, d)
      .select($"doc_id", planted.as("t"))
      .select(
        $"doc_id",
        array_join(regexp_extract_all($"t", lit(UrlPattern), lit(0)), " ")
          .as("urls"),
        size(regexp_extract_all($"t", lit(UrlPattern), lit(0)))
          .cast("long").as("n_urls"),
        regexp_extract($"t", "https?://([A-Za-z0-9.-]+)/", 1)
          .as("first_domain"))
  }

  /** URL canonicalization + dedup — the FIRST pass of a web-scale
    * crawl pipeline: the same page arrives as scheme/case/WWW/default-
    * port/query-tracking/trailing-slash variants, and duplicates must
    * collapse on the canonical form BEFORE any content is fetched or
    * compared. Canonical policy (documented, applied identically in
    * the oracle): lowercase, drop scheme, drop leading www., drop
    * default ports, drop query+fragment, drop trailing slash. Five
    * planted variants per logical page; everything is scan-local
    * string work plus one canonical-key groupBy. */
  private def urlDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val page = pmod($"doc_id", lit(100)).cast("string")
    val variant = pmod(($"doc_id" / 100).cast("long"), lit(5))
    val raw = when(variant === 0,
        concat(lit("https://example.com/page/"), page))
      .when(variant === 1,
        concat(lit("HTTP://WWW.Example.com/page/"), page, lit("/")))
      .when(variant === 2,
        concat(lit("https://example.com:443/page/"), page,
          lit("?utm_source=x")))
      .when(variant === 3,
        concat(lit("http://example.com:80/page/"), page, lit("#frag")))
      .otherwise(
        concat(lit("https://www.example.com/page/"), page,
          lit("?a=1&utm_campaign=y")))
    val canon = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(lower(raw),
        "^https?://", ""),
        "^www\\.", ""),
        ":(80|443)/", "/"),
        "[?#].*$", ""),
        "/$", "")
    Tables.documents(s, d)
      .select($"doc_id", raw.as("raw_url"), canon.as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"raw_url").as("n_variants"),
        min($"doc_id").as("keep_doc"))
  }

  /** k-anonymity / l-diversity audit over quasi-identifiers — the
    * release gate run before a table leaves the pipeline: every
    * (segment, nation, balance-decile) equivalence class reports its
    * size k (re-identification risk is 1/k) and the diversity l of the
    * sensitive attribute inside it (k-anonymous but l=1 still leaks
    * the sensitive value). One groupBy on the QI tuple — the class
    * table is GROUP-cardinality, tiny at any scale. The balance decile
    * is banded on the exact cents grid SHIFTED POSITIVE before the
    * integer division: Spark's `div` truncates toward zero while
    * DuckDB's `//` floors, so negative balances would band differently
    * — with the +100000 shift every operand is positive and the two
    * semantics coincide. */
  private def kAnonymity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = ($"c_acctbal".cast("decimal(12,2)") * 100).cast("long")
    Tables.customer(s, d)
      .select($"c_mktsegment", $"c_nationkey", cents.as("cents"))
      .groupBy($"c_mktsegment", $"c_nationkey",
        expr("(cents + 100000) div 100000").as("bal_band"))
      .agg(count(lit(1)).as("k"),
        countDistinct($"cents").as("l_div"))
      .withColumn("anonymous", $"k" >= 5)
  }

  val queries: Seq[Q] = Seq(
    Q("q_k_anonymity", kAnonymity, Some("""
      WITH c AS (SELECT c_mktsegment, c_nationkey,
                        CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                             AS BIGINT) AS cents
                 FROM customer)
      SELECT c_mktsegment, c_nationkey,
             CAST((cents + 100000) // 100000 AS BIGINT) AS bal_band,
             count(*) AS k,
             CAST(count(DISTINCT cents) AS BIGINT) AS l_div,
             count(*) >= 5 AS anonymous
      FROM c GROUP BY 1, 2, 3""")),

    Q("q_url_dedup", urlDedup, Some("""
      WITH p AS (SELECT doc_id,
                        CAST(doc_id % 100 AS VARCHAR) AS page,
                        (doc_id // 100) % 5 AS variant
                 FROM documents),
      raw AS (SELECT doc_id,
                     CASE variant
                       WHEN 0 THEN 'https://example.com/page/' || page
                       WHEN 1 THEN 'HTTP://WWW.Example.com/page/' || page
                                   || '/'
                       WHEN 2 THEN 'https://example.com:443/page/' || page
                                   || '?utm_source=x'
                       WHEN 3 THEN 'http://example.com:80/page/' || page
                                   || '#frag'
                       ELSE 'https://www.example.com/page/' || page
                            || '?a=1&utm_campaign=y'
                     END AS raw_url
              FROM p),
      c AS (SELECT doc_id, raw_url,
                   regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(regexp_replace(lower(raw_url),
                       '^https?://', ''),
                       '^www\.', ''),
                       ':(80|443)/', '/'),
                       '[?#].*$', ''),
                       '/$', '') AS canonical_url
            FROM raw)
      SELECT canonical_url, count(*) AS n_docs,
             CAST(count(DISTINCT raw_url) AS BIGINT) AS n_variants,
             min(doc_id) AS keep_doc
      FROM c GROUP BY 1""")),

    Q("q_pii_redact", piiRedact, Some(s"""
      WITH p AS (SELECT doc_id, $plantedPiiSql AS t FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '$EmailPattern')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(t, '$PhonePattern')) AS BIGINT)
               AS n_phones,
             regexp_replace(
               regexp_replace(t, '$EmailPattern', '[EMAIL]', 'g'),
               '$PhonePattern', '[PHONE]', 'g') AS redacted
      FROM p""")),

    Q("q_pseudonymize", pseudonymize, Some("""
      SELECT c_custkey,
             sha256('graft-v1:' || c_name) AS name_token,
             left(c_name, 1) || '***' || right(c_name, 2) AS name_masked
      FROM customer""")),

    Q("q_url_extract", urlExtract, Some(s"""
      WITH p AS (SELECT doc_id,
                        'see https://example.com/d/' || CAST(doc_id AS VARCHAR)
                        || ' and http://mirror-' || CAST(doc_id % 10 AS VARCHAR)
                        || '.example.org/x ' || text AS t
                 FROM documents)
      SELECT doc_id,
             array_to_string(regexp_extract_all(t, '$UrlPattern'), ' ')
               AS urls,
             CAST(len(regexp_extract_all(t, '$UrlPattern')) AS BIGINT)
               AS n_urls,
             regexp_extract(t, 'https?://([A-Za-z0-9.-]+)/', 1)
               AS first_domain
      FROM p"""))
  )
}
