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

  /** t-closeness audit — the distributional upgrade of
    * [[kAnonymity]]: a group can be k-anonymous and l-diverse yet
    * still leak (every member wealthy); t-closeness bounds the earth
    * mover distance between each quasi-identifier group's SENSITIVE
    * distribution (banded account balance) and the global one.
    * EMD over the ordered band grid is the q_wasserstein_drift
    * machinery in exact integers: per ordered band,
    * |cum_g·n_all − cum_all·n_g| cross products, summed, one
    * integer division into t_e6 normalized by (bands−1)·n_g·n_all
    * so t ∈ [0,1]. Bands are FIXED-cardinality (11 balance bands),
    * so the dense group×band grid stays bounded at any data scale —
    * the deliberate contrast with the exact-grid Wasserstein, whose
    * support grows with data. Shape: one combinable (group, band)
    * rollup, a broadcast band dim for the dense grid, windows over
    * ≤ groups·bands rows. */
  private def tCloseness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val base = Tables.customer(s, d)
      .select($"c_mktsegment".as("seg"), $"c_nationkey".as("nk"),
        (($"c_acctbal".cast("decimal(12,2)") * 100).cast("long")
          + 100000L).as("shifted"))
      .withColumn("band", expr("shifted div 100000"))
    val gb = base.groupBy($"seg", $"nk", $"band")
      .agg(count(lit(1)).as("cnt"))
    val groups = gb.select($"seg", $"nk").distinct()
    val bands = gb.select($"band").distinct()
    val glob = gb.groupBy($"band").agg(sum($"cnt").as("gcnt"))
    val wg = W.partitionBy($"seg", $"nk").orderBy($"band".asc)
    val cum = wg.rowsBetween(W.unboundedPreceding, W.currentRow)
    val whole = W.partitionBy($"seg", $"nk")
    val dense = groups.crossJoin(broadcast(bands))
      .join(gb, Seq("seg", "nk", "band"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
      .join(broadcast(glob), "band")
      .withColumn("cum_g", sum($"cnt").over(cum))
      .withColumn("cum_all", sum($"gcnt").over(cum))
      .withColumn("n_g", sum($"cnt").over(whole))
      .withColumn("n_all", sum($"gcnt").over(whole))
      .withColumn("gap", lead($"band", 1).over(wg) - $"band")
      .withColumn("range", max($"band").over(whole)
        - min($"band").over(whole))
    dense
      .filter($"gap".isNotNull)
      .groupBy($"seg", $"nk")
      .agg(max($"n_g").as("n_g"),
        sum(abs($"cum_g" * $"n_all" - $"cum_all" * $"n_g") * $"gap")
          .as("emd_num"),
        max($"range" * $"n_g" * $"n_all").as("emd_den"))
      .withColumn("t_e6", expr("emd_num * 1000000 div emd_den"))
      .withColumn("close", $"t_e6" <= 200000L)
      .select($"seg", $"nk", $"n_g", $"t_e6", $"close")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the attribute-
    * disclosure check BETWEEN [[kAnonymity]] (group size only) and
    * [[tCloseness]] (full distribution distance): per quasi-identifier
    * group, how VARIED are the sensitive values? Three graded tests on
    * the same per-group frequency profile, each in the strongest
    * arithmetic it admits:
    *   - distinct l-diversity: #values ≥ 3 (exact count);
    *   - recursive (2,3)-diversity: r₁ < 2·(r₃+…) with frequencies
    *     ranked desc — float-FREE, the cross-multiplied form of "the
    *     modal value doesn't dominate the tail";
    *   - entropy l-diversity: H ≥ ln 3, decomposed as
    *     n·ln n − Σ cᵥ·ln cᵥ ≥ n·ln 3 with every log term floored e9
    *     per DISTINCT VALUE before summing (order-independent, the
    *     q_query_likelihood discipline) and the threshold compared as
    *     cross-multiplied integers.
    * Shape: one combinable (group, value) rollup; rank windows run on
    * the bounded group×value profile, never the raw rows. */
  private def lDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val vals = Tables.customer(s, d)
      .select($"c_mktsegment".as("seg"), $"c_nationkey".as("nk"),
        (($"c_acctbal".cast("decimal(12,2)") * 100).cast("long")
          + 100000L).as("shifted"))
      .withColumn("band", expr("shifted div 100000"))
      .groupBy($"seg", $"nk", $"band", ($"shifted" - 100000L).as("cents"))
      .agg(count(lit(1)).as("cnt"))
    val rk = W.partitionBy($"seg", $"nk", $"band")
      .orderBy($"cnt".desc, $"cents".asc)
    vals
      .withColumn("r", row_number().over(rk))
      .withColumn("clnc_e9",
        floor($"cnt".cast("double") * log($"cnt".cast("double"))
          * lit(1e9)).cast("long"))
      .groupBy($"seg", $"nk", $"band")
      .agg(sum($"cnt").as("n"),
        count(lit(1)).as("l_distinct"),
        max(when($"r" === 1, $"cnt")).as("r1"),
        coalesce(sum(when($"r" >= 3, $"cnt")), lit(0L)).as("tail3"),
        sum($"clnc_e9").as("sum_clnc_e9"))
      .withColumn("recursive_23_ok", $"r1" < lit(2L) * $"tail3")
      .withColumn("n_lnn_e9",
        floor($"n".cast("double") * log($"n".cast("double")) * lit(1e9))
          .cast("long"))
      // H ≥ ln3 ⟺ n·lnn − Σc·lnc ≥ n·ln3, all on the e9 grid
      .withColumn("entropy_l3_ok",
        $"n_lnn_e9" - $"sum_clnc_e9" >=
          $"n" * floor(log(lit(3.0)) * lit(1e9)).cast("long"))
      .select($"seg", $"nk", $"band", $"n", $"l_distinct", $"r1",
        $"tail3", $"recursive_23_ok", $"sum_clnc_e9", $"n_lnn_e9",
        $"entropy_l3_ok")
  }

  /** ε for the DP histogram release (sensitivity-1 counts → Laplace
    * scale b = 1/ε = 1). */
  val DpEpsilon = 1.0

  /** Differentially-private histogram release of event counts per
    * (event_type, ISO week) — the mechanism a governed pipeline uses
    * to PUBLISH corpus statistics: each cell's true count gets
    * Laplace(1/ε) noise (each event lands in exactly one cell, so the
    * count query has L1 sensitivity 1 and the release is ε-DP per
    * cell). The noise is SEEDLESS AND DETERMINISTIC, exactly like the
    * bootstrap's Poisson weights: a Knuth-hash uniform on the 1e-5
    * grid derived from the cell's rank in (type, week) order, pushed
    * through the Laplace inverse CDF −sgn(u−½)·ln(1−2|u−½|). The
    * midpoint offset keeps u in (0,1) so the ln argument is ≥ 1e-5 —
    * never a log of zero. ln is the only libm call (the q_fdr_bh
    * precedent: bit-identical across engines on identical doubles),
    * emitted floor·1e3. True counts ride along for verification; a
    * real release would drop n_true and u — determinism here is a
    * TESTING device (replayable by the oracle), a production release
    * would draw real randomness. Shape: one combinable groupBy to
    * |types|·|weeks| cells; the rank window runs on that tiny cell
    * table, never the events. */
  private def dpHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .select($"event_type", weekofyear($"ts").cast("long").as("week"))
      .groupBy($"event_type", $"week")
      .agg(count(lit(1)).as("n_true"))
      .withColumn("tid",
        row_number().over(W.orderBy($"event_type", $"week")).cast("long"))
      // overflow-safe mix: reduce mod 2^32 BETWEEN the multiplies and
      // keep the second multiplier small (MINSTD 48271): the one-shot
      // tid·1000003·2654435761 wraps int64 at tid ≈ 3476 cells —
      // Spark (non-ANSI) would wrap silently while the oracle errors.
      // Max intermediate here is (2^32−1)·48271 ≈ 2.1e14, far inside
      // int64 at any conceivable cell-table cardinality.
      .withColumn("u",
        (($"tid" * lit(1000003L)) % 4294967296L * lit(48271L))
          % 4294967296L % 100000L)
      .withColumn("u01", ($"u".cast("double") + lit(0.5)) / lit(100000.0))
      .select($"event_type", $"week", $"n_true", $"u",
        floor(($"n_true" +
          when($"u01" >= 0.5,
            -log(lit(1.0) - lit(2.0) * ($"u01" - lit(0.5))) / lit(DpEpsilon))
            .otherwise(
              log(lit(1.0) - lit(2.0) * (lit(0.5) - $"u01")) / lit(DpEpsilon)))
          * lit(1000.0)).as("noisy_e3"))
  }

  /** Local-differential-privacy frequency estimation by randomized
    * response (Warner 1965; the direct-encoding baseline behind
    * RAPPOR/Apple-style LDP telemetry): each event reports its TRUE
    * event_type with p = 3/4, otherwise a pseudo-uniform draw from
    * the k-type domain; the server never sees raw rows and debiases
    * observed counts with the exact-rational estimator
    *   n̂_t = (4k·n_obs − n) / (3k)            [p = 3/4 exactly]
    * clipped at 0 (counts are non-negative, and the clip also keeps
    * the integer division positive-operand — Spark `div` truncates
    * while DuckDB `//` floors on negatives, the q_dp_histogram
    * lesson). Both "coins" are the overflow-safe two-step hash mixes
    * from q_dp_histogram, so the whole mechanism replays bit-exactly
    * in the oracle: keep iff (id·2654435761 mod 2³²) < 3·2³⁰ (P =
    * 3/4 exactly on the 2³² lattice), alternative type by MINSTD
    * remix mod k.
    *
    * Shape at scale: the type domain is a DIM-cardinality table
    * (event vocabulary, independent of corpus size) — its global
    * row_number index and both joins are broadcast; the perturbation
    * is scan-stage arithmetic; n_obs / n_true collapse map-side to k
    * rows each. Nothing corpus-sized ever shuffles. */
  private def randomizedResponse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val types = Tables.events(s, d).select($"event_type").distinct()
      .withColumn("idx",
        (row_number().over(W.orderBy($"event_type")) - 1).cast("long"))
    val kdf = types.agg(count(lit(1)).as("k"))
    val ndf = Tables.events(s, d).agg(count(lit(1)).as("n"))
    val rep = Tables.events(s, d).select($"event_id", $"event_type")
      .crossJoin(broadcast(kdf))
      .withColumn("keep",
        ($"event_id" * lit(2654435761L)) % 4294967296L < 3221225472L)
      .withColumn("alt_idx",
        (($"event_id" * lit(1000003L)) % 4294967296L * lit(48271L))
          % 4294967296L % $"k")
      .join(broadcast(types.select($"idx".as("alt_idx"),
        $"event_type".as("alt_type"))), Seq("alt_idx"))
      .select(when($"keep", $"event_type").otherwise($"alt_type")
        .as("event_type"))
    val obs = rep.groupBy($"event_type").agg(count(lit(1)).as("n_obs"))
    Tables.events(s, d).groupBy($"event_type")
      .agg(count(lit(1)).as("n_true"))
      .join(obs, Seq("event_type"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(ndf))
      .crossJoin(broadcast(kdf))
      .withColumn("n_hat_e3",
        expr("(greatest(4 * k * n_obs - n, 0L) * 1000) div (3 * k)"))
  }

  /** Per-event clamp bound (cents) for [[dpMean]] — the contribution
    * cap that fixes the Laplace sensitivity. */
  val DpClampCents = 50000L

  /** Differentially-private per-type mean — the canonical DP release
    * after [[dpHistogram]]'s counts: each event's contribution clamps
    * to [0, C] (C = 500.00 — the sensitivity bound DP needs), the
    * clamped SUM gets Laplace(C/ε) noise, the COUNT gets Laplace(1/ε),
    * and the released mean is their ratio (the standard
    * noisy-sum/noisy-count estimator). Noise is the same seedless
    * replayable mechanism as the histogram: a per-row overflow-safe
    * integer mix → u01 on the 1e-5 grid → inverse-CDF Laplace, with
    * tid offsets 2·t−1 / 2·t giving the two draws independent
    * uniforms. Exact-integer clamp + sums; the only doubles are the
    * two noise terms and the final ratio, floored to e3. |types| rows
    * from one map-side-combinable pass. */
  private def dpMean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    def lap(u01: org.apache.spark.sql.Column, scale: Double) =
      when(u01 >= 0.5,
        -log(lit(1.0) - lit(2.0) * (u01 - lit(0.5))) * lit(scale))
        .otherwise(
          log(lit(1.0) - lit(2.0) * (lit(0.5) - u01)) * lit(scale))
    def u01(tid: org.apache.spark.sql.Column) =
      ((tid * lit(1000003L)) % 4294967296L * lit(48271L))
        .%(4294967296L).%(100000L).cast("double")
        .+(lit(0.5))./(lit(100000.0))
    Tables.events(s, d)
      .select($"event_type",
        least(greatest(($"value".cast("decimal(18,2)") * 100)
          .cast("long"), lit(0L)), lit(DpClampCents)).as("clamped"))
      .filter($"clamped".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_true"), sum($"clamped").as("sum_true"))
      .withColumn("tid",
        row_number().over(W.orderBy($"event_type")).cast("long"))
      .select($"event_type", $"n_true", $"sum_true",
        floor(($"sum_true" +
          lap(u01($"tid" * 2 - 1), DpClampCents / DpEpsilon))
          * lit(1000.0)).as("noisy_sum_e3"),
        floor(($"n_true" + lap(u01($"tid" * 2), 1.0 / DpEpsilon))
          * lit(1000.0)).as("noisy_n_e3"))
      .filter($"noisy_n_e3" > 0)
      .withColumn("dp_mean_e3",
        expr("noisy_sum_e3 * 1000 div noisy_n_e3"))
  }

  /** Right-to-erasure (GDPR Art. 17) audit — the delete-and-prove
    * pass: subjects with deletion requests (a deterministic id set
    * standing in for the request table) are anti-joined out of the
    * event log, and the audit row per series carries before/after/
    * erased counts plus a `clean` flag recomputed FROM THE SURVIVING
    * ROWS (not inferred from the delete) — the evidence a DPO actually
    * asks for. At 100 TB the request table is the small side: it
    * broadcasts into the anti-join and the log is rewritten in one
    * embarrassing-parallel pass; counts are map-side-combinable. */
  private def erasureAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val requests = ev.select($"user_id").distinct()
      .filter($"user_id" % 97 === 0)
    val after = ev.join(broadcast(requests), Seq("user_id"), "left_anti")
    val before = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n_before"),
        countDistinct(when($"user_id" % 97 === 0, $"user_id"))
          .as("n_subjects"))
    val post = after.groupBy($"event_type")
      .agg(count(lit(1)).as("n_after"),
        sum(when($"user_id" % 97 === 0, 1L).otherwise(0L))
          .as("n_leaked"))
    before.join(post, Seq("event_type"))
      .withColumn("n_erased", $"n_before" - $"n_after")
      .withColumn("clean", $"n_leaked" === 0L)
  }

  val queries: Seq[Q] = Seq(
    Q("q_erasure_audit", erasureAudit, Some("""
      WITH before AS (SELECT event_type,
                             CAST(count(*) AS BIGINT) AS n_before,
                             CAST(count(DISTINCT CASE
                               WHEN user_id % 97 = 0 THEN user_id END)
                               AS BIGINT) AS n_subjects
                      FROM events GROUP BY 1),
      after AS (SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n_after,
                       CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_leaked
                FROM events WHERE user_id % 97 <> 0 GROUP BY 1)
      SELECT event_type, n_before, n_subjects, n_after, n_leaked,
             CAST(n_before - n_after AS BIGINT) AS n_erased,
             n_leaked = 0 AS clean
      FROM before JOIN after USING (event_type)""")),
    Q("q_dp_mean", dpMean, Some("""
      WITH cl AS (SELECT event_type,
                         least(greatest(CAST(CAST(value AS DECIMAL(18,2))
                           * 100 AS BIGINT), 0), 50000) AS clamped
                  FROM events WHERE value IS NOT NULL),
      g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true,
                   CAST(sum(clamped) AS BIGINT) AS sum_true
            FROM cl GROUP BY 1),
      r AS (SELECT *, CAST(row_number() OVER (ORDER BY event_type)
                        AS BIGINT) AS tid
            FROM g),
      u AS (SELECT *,
                   (CAST(((tid * 2 - 1) * 1000003) % 4294967296
                     * 48271 % 4294967296 % 100000 AS DOUBLE) + 0.5)
                     / 100000.0 AS u1,
                   (CAST((tid * 2 * 1000003) % 4294967296
                     * 48271 % 4294967296 % 100000 AS DOUBLE) + 0.5)
                     / 100000.0 AS u2
            FROM r),
      n AS (SELECT event_type, n_true, sum_true,
                   CAST(floor((sum_true +
                     CASE WHEN u1 >= 0.5
                       THEN -ln(1.0 - 2.0 * (u1 - 0.5)) * 50000.0
                       ELSE ln(1.0 - 2.0 * (0.5 - u1)) * 50000.0 END)
                     * 1000.0) AS BIGINT) AS noisy_sum_e3,
                   CAST(floor((n_true +
                     CASE WHEN u2 >= 0.5
                       THEN -ln(1.0 - 2.0 * (u2 - 0.5)) * 1.0
                       ELSE ln(1.0 - 2.0 * (0.5 - u2)) * 1.0 END)
                     * 1000.0) AS BIGINT) AS noisy_n_e3
            FROM u)
      SELECT event_type, n_true, sum_true, noisy_sum_e3, noisy_n_e3,
             CAST(noisy_sum_e3 * 1000 // noisy_n_e3 AS BIGINT)
               AS dp_mean_e3
      FROM n WHERE noisy_n_e3 > 0""")),
    Q("q_randomized_response", randomizedResponse, Some("""
      WITH types AS (SELECT event_type,
                            CAST(row_number() OVER (ORDER BY event_type)
                              - 1 AS BIGINT) AS idx
                     FROM (SELECT DISTINCT event_type FROM events)),
      kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
      ev AS (SELECT e.event_id, e.event_type,
                    (e.event_id * 2654435761) % 4294967296
                      < 3221225472 AS keep,
                    ((e.event_id * 1000003) % 4294967296 * 48271)
                      % 4294967296 % kk.k AS alt_idx
             FROM events e, kk),
      rep AS (SELECT CASE WHEN ev.keep THEN ev.event_type
                          ELSE t.event_type END AS event_type
              FROM ev JOIN types t ON ev.alt_idx = t.idx),
      obs AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
              FROM rep GROUP BY 1),
      tru AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
              FROM events GROUP BY 1)
      SELECT tru.event_type, tru.n_true,
             coalesce(obs.n_obs, 0) AS n_obs, nn.n, kk.k,
             CAST(greatest(4 * kk.k * coalesce(obs.n_obs, 0) - nn.n, 0)
                    * 1000 // (3 * kk.k) AS BIGINT) AS n_hat_e3
      FROM tru LEFT JOIN obs USING (event_type), nn, kk""")),

    Q("q_dp_histogram", dpHistogram, Some("""
      WITH cells AS (SELECT event_type,
                            CAST(weekofyear(ts) AS BIGINT) AS week,
                            CAST(count(*) AS BIGINT) AS n_true
                     FROM events GROUP BY 1, 2),
      r AS (SELECT *, CAST(row_number() OVER (ORDER BY event_type, week)
                        AS BIGINT) AS tid
            FROM cells),
      n AS (SELECT *, ((tid * 1000003) % 4294967296 * 48271)
                        % 4294967296 % 100000 AS u
            FROM r),
      v AS (SELECT *, (CAST(u AS DOUBLE) + 0.5) / 100000.0 AS u01
            FROM n)
      SELECT event_type, week, n_true, CAST(u AS BIGINT) AS u,
             CAST(floor((n_true +
               CASE WHEN u01 >= 0.5
                    THEN -ln(1.0 - 2.0 * (u01 - 0.5)) / 1.0
                    ELSE ln(1.0 - 2.0 * (0.5 - u01)) / 1.0 END)
               * 1000.0) AS BIGINT) AS noisy_e3
      FROM v""")),

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

    Q("q_t_closeness", tCloseness, Some("""
      WITH base AS (
        SELECT c_mktsegment AS seg, c_nationkey AS nk,
               (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                + 100000) // 100000 AS band
        FROM customer),
      gb AS (SELECT seg, nk, band, CAST(count(*) AS BIGINT) AS cnt
             FROM base GROUP BY 1, 2, 3),
      groups AS (SELECT DISTINCT seg, nk FROM gb),
      bands AS (SELECT DISTINCT band FROM gb),
      gtot AS (SELECT band, CAST(sum(cnt) AS BIGINT) AS gcnt
               FROM gb GROUP BY 1),
      dense AS (SELECT g.seg, g.nk, b.band,
                       coalesce(gb.cnt, 0) AS cnt, gl.gcnt
                FROM groups g CROSS JOIN bands b
                LEFT JOIN gb ON gb.seg = g.seg AND gb.nk = g.nk
                            AND gb.band = b.band
                JOIN gtot gl ON gl.band = b.band),
      w AS (SELECT *,
                   CAST(sum(cnt) OVER (PARTITION BY seg, nk
                     ORDER BY band ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_g,
                   CAST(sum(gcnt) OVER (PARTITION BY seg, nk
                     ORDER BY band ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_all,
                   CAST(sum(cnt) OVER (PARTITION BY seg, nk)
                     AS BIGINT) AS n_g,
                   CAST(sum(gcnt) OVER (PARTITION BY seg, nk)
                     AS BIGINT) AS n_all,
                   lead(band, 1) OVER (PARTITION BY seg, nk
                     ORDER BY band ASC) - band AS gap,
                   CAST(max(band) OVER (PARTITION BY seg, nk)
                     - min(band) OVER (PARTITION BY seg, nk)
                     AS BIGINT) AS rng
            FROM dense),
      agg AS (SELECT seg, nk, CAST(max(n_g) AS BIGINT) AS n_g,
                     CAST(sum(abs(cum_g * n_all - cum_all * n_g)
                       * gap) AS BIGINT) AS emd_num,
                     CAST(max(rng * n_g * n_all) AS BIGINT) AS emd_den
              FROM w WHERE gap IS NOT NULL GROUP BY 1, 2)
      SELECT seg, nk, n_g,
             CAST(emd_num * 1000000 // emd_den AS BIGINT) AS t_e6,
             emd_num * 1000000 // emd_den <= 200000 AS close
      FROM agg""")),

    Q("q_l_diversity", lDiversity, Some("""
      WITH base AS (
        SELECT c_mktsegment AS seg, c_nationkey AS nk,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                 + 100000 AS shifted
        FROM customer),
      vals AS (SELECT seg, nk, shifted // 100000 AS band,
                      shifted - 100000 AS cents,
                      CAST(count(*) AS BIGINT) AS cnt
               FROM base GROUP BY 1, 2, 3, 4),
      rk AS (SELECT *,
                    row_number() OVER (PARTITION BY seg, nk, band
                      ORDER BY cnt DESC, cents ASC) AS r,
                    CAST(floor(CAST(cnt AS DOUBLE)
                      * ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT)
                      AS clnc_e9
             FROM vals),
      g AS (SELECT seg, nk, band,
                   CAST(sum(cnt) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS l_distinct,
                   CAST(max(CASE WHEN r = 1 THEN cnt END) AS BIGINT)
                     AS r1,
                   CAST(coalesce(sum(CASE WHEN r >= 3 THEN cnt END), 0)
                     AS BIGINT) AS tail3,
                   CAST(sum(clnc_e9) AS BIGINT) AS sum_clnc_e9
            FROM rk GROUP BY 1, 2, 3)
      SELECT seg, nk, band, n, l_distinct, r1, tail3,
             r1 < 2 * tail3 AS recursive_23_ok,
             sum_clnc_e9,
             CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1e9)
               AS BIGINT) AS n_lnn_e9,
             CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1e9)
               AS BIGINT) - sum_clnc_e9
               >= n * CAST(floor(ln(3.0) * 1e9) AS BIGINT)
               AS entropy_l3_ok
      FROM g""")),

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
