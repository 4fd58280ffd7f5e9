package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline over the
  * `documents` table: tokenization, token counting, quality scoring,
  * language-ID (stopword heuristic), and document fingerprinting
  * (rolling hash). Everything is native Catalyst expressions — these
  * run inside the scan stage with no shuffle at all (verified: the
  * plans are a single WholeStageCodegen over the parquet scan), so at
  * 100 TB they scale linearly with input splits.
  */
object TextOps {

  /** Whitespace tokenization, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Let-binding for higher-order-function lambdas: evaluates `v`
    * ONCE per row and hands it to `f` as a lambda-bound value.
    * Catalyst's CollapseProject inlines same-chain aliases into
    * lambda bodies, and HOFs evaluate interpreted (CodegenFallback,
    * no subexpression elimination inside the lambda), so a lambda
    * that references an aliased tokenization re-runs the full regex
    * split PER ELEMENT PER REFERENCE — O(n²) per row. transform's
    * own argument is evaluated exactly once per row, so wrapping `v`
    * in a 1-element array turns every lambda reference into an O(1)
    * variable lookup. Measured on q_sketch_union's distinct-shingle
    * pass at sf0.1: 18.7 s → 0.71 s (r17; same rows out). */
  def bindOnce(v: Column)(f: Column => Column): Column =
    element_at(transform(array(v), f), 1)

  /** Distinct word n-gram shingles (default 3), the unit for MinHash /
    * Jaccard near-dedup. Guarded for docs shorter than n tokens. */
  def shingles(text: Column, n: Int = 3): Column =
    // bindOnce: an unbound lambda re-tokenizes per shingle position
    bindOnce(tokens(text)) { t =>
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(1), size(t) - lit(n - 1)),
            i => array_join(slice(t, i, lit(n)), " "))))
    }

  /** BPE-ish regex tokenization: letter runs, single digits, and
    * punctuation runs — the GPT-2-style pre-tokenizer shape, engine-
    * portable (same regex dialect subset in Java and RE2/DuckDB). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]+"), lit(0))

  /** BPE-ish subword count: word tokens plus extra units for long
    * words (every 6 chars beyond the first 6 ≈ one extra subword) —
    * a deterministic stand-in for a real BPE vocab. */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + lit(1L) +
        floor((length(w).cast("double") - lit(1.0)) / lit(6.0)).cast("long"))

  /** Composite quality score in [0,1]: penalizes very short docs,
    * rewards moderate word length and low repetition. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val nUniq = size(array_distinct(t)).cast("double")
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val diversity = nUniq / greatest(nTok, lit(1.0))
    round((lenScore + diversity) / lit(2.0), 4)
  }

  /** Stopword tables for the n-gram/stopword language-ID heuristic.
    * Tiny on purpose: broadcast as literals, evaluated per-row with no
    * shuffle; order fixes deterministic tie-breaks. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Language-ID: argmax over per-language stopword hit counts with
    * deterministic first-wins tie-break ("und" = undetermined when no
    * stopword hits at all). Backed by the codegen
    * [[graft.ext.LangIdExpr]] — one fused tokenize-and-count pass in
    * the scan stage (the interpreted Column formulation below re-walks
    * the token array once per language through non-codegen
    * higher-order filters; measured ~9× slower at sf0.1 —
    * q_lang_confusion 3.76 s → 0.43 s under the official config). */
  def langId(text: Column): Column =
    graft.ext.LangIdExpr.langId(text, langStopwords)

  /** Reference formulation of [[graft.ext.TextStatsExpr]]'s six cells
    * via split + higher-order aggregate/filter + bigram transform +
    * array_distinct — identical values (ScaleSpec parity over the
    * corpus plus edge rows), interpreted execution. The Gopher/quality
    * oracles replay THIS shape, so the parity test anchors the native
    * kernel to them. */
  def textStatsInterpreted(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t)
    val bigrams = when(nTok < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nTok - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
    struct(
      nTok.cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      aggregate(t, lit(0L), (acc, w) => acc + length(w))
        .as("sum_char_len"),
      size(filter(t, w => w.isInCollection(langStopwords.head._2)))
        .cast("long").as("en_sw_hits"),
      size(bigrams).cast("long").as("n_bigrams"),
      size(array_distinct(bigrams)).cast("long").as("n_distinct_bigrams"))
  }

  /** Reference formulation of [[graft.ext.RepetitionStatsExpr]]'s six
    * cells — identical values (ScaleSpec parity over the corpus plus
    * edge rows), interpreted execution; the mode counts are the
    * O(n·distinct) distinct×filter walk the native kernel replaces
    * with one hash-map pass. */
  def repetitionStatsInterpreted(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t)
    val bigrams = when(nTok < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nTok - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
    val modeOf = (arr: Column) =>
      coalesce(array_max(transform(array_distinct(arr),
        d => size(filter(arr, x => x === d)))), lit(0)).cast("long")
    struct(
      nTok.cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      modeOf(t).as("max_tok_cnt"),
      size(bigrams).cast("long").as("n_bigrams"),
      size(array_distinct(bigrams)).cast("long").as("n_distinct_bigrams"),
      modeOf(bigrams).as("max_bi_cnt"))
  }

  /** Reference formulation via split + per-language higher-order
    * filters + a reduceLeft struct chain — identical values (ScaleSpec
    * parity over the corpus plus edge rows), interpreted execution.
    * The [[langIdSqlParts]] oracle fragments replay THIS shape, so the
    * parity test also anchors the native expression to the oracle. */
  def langIdInterpreted(text: Column): Column = {
    val t = tokens(text)
    val scored = langStopwords.map { case (lang, sws) =>
      val hits = size(filter(t, w => w.isInCollection(sws)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    val best = scored.reduceLeft((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") === 0, "und").otherwise(best.getField("lang"))
  }

  /** Portable 31-bit polynomial hash over a string's codepoints:
    * h = foldl (acc·base + codepoint(c)) mod P (Mersenne 2³¹-1).
    * Reproducible byte-for-byte in DuckDB (see [[polyHashSql]]) — the
    * token hash for every oracled sketch query. Backed by the codegen
    * [[graft.ext.PolyHashExpr]] (one fused loop in whole-stage
    * codegen); the equivalent-but-interpreted Column formulation is
    * [[polyHashInterpreted]], kept as the parity model. */
  def polyHash(str: Column, base: Long): Column =
    graft.ext.PolyHashExpr.polyHash(str, base)

  /** Reference formulation via split/ascii/aggregate — identical
    * values (PropertySpec parity), interpreted execution. */
  def polyHashInterpreted(str: Column, base: Long): Column =
    aggregate(split(str, ""), lit(0L),
      (acc, c) => pmod(acc * lit(base) + ascii(c), lit(2147483647L)))

  /** DuckDB rendering of [[polyHash]] for oracle SQL. `greatest(ord(c),
    * 0)` pins the one divergence: DuckDB's ord('') is -1 where Spark's
    * ascii('') is 0. */
  def polyHashSql(expr: String, base: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), " +
      s"c -> CAST(greatest(ord(c), 0) AS BIGINT))), " +
      s"(acc, x) -> (acc * $base + x) % 2147483647)"

  /** Rolling polynomial fingerprint over the token stream:
    * fp = Σ h(token_i) · B^(n-1-i)  mod p, with h = [[polyHash]] so the
    * whole fingerprint replays in DuckDB (modular form keeps every
    * intermediate < 2⁵² so ANSI-mode Spark never overflows).
    * Order-sensitive — permuted docs get different fingerprints — and
    * computable in one pass with `aggregate`. */
  def fingerprint(text: Column): Column = {
    val p = lit(2147483647L)
    aggregate(tokens(text), lit(0L),
      (acc, w) => pmod(acc * lit(1000003L) + polyHash(w, 31L), p))
  }

  /** DuckDB fragments for [[langId]], generated from [[langStopwords]]
    * so SQL and Spark can never drift: (hit-count select list over a
    * `toks` column, winner CASE over the h0..hN aliases). The CASE
    * chain picks the FIRST language (declaration order) whose hit
    * count equals the global max — provably the same winner as the
    * Spark reduceLeft (a later language replaces the champion only on
    * a strictly greater count). */
  private[scale] def langIdSqlParts: (String, String) = {
    val n = langStopwords.size
    val hits = langStopwords.zipWithIndex.map { case ((_, sws), i) =>
      val inList = sws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, w -> w IN ($inList))) AS h$i"
    }.mkString(",\n               ")
    val allH = (0 until n).map(i => s"h$i").mkString(", ")
    val branches = langStopwords.zipWithIndex.map { case ((lang, _), i) =>
      val laterGe = (i + 1 until n).map(j => s"h$i >= h$j")
      if (laterGe.isEmpty) s"ELSE '$lang'"
      else s"WHEN ${laterGe.mkString(" AND ")} THEN '$lang'"
    }.mkString("\n                  ")
    val winner = s"""CASE WHEN greatest($allH) = 0 THEN 'und'
                  $branches
             END"""
    (hits, winner)
  }

  private def langIdOracle: String = {
    val (hits, winner) = langIdSqlParts
    s"""
      WITH t AS (SELECT doc_id, lang,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      h AS (SELECT doc_id, lang,
               $hits
            FROM t)
      SELECT doc_id, lang, $winner AS lang_pred
      FROM h"""
  }

  /** The DuckDB rendering of [[qualityScore]] over `text`/`toks`. */
  private[scale] def qualitySql: String =
    """round((least(length(text) / 200.0, 1.0) +
              len(list_distinct(toks)) * 1.0 /
              greatest(len(toks), 1)) / 2.0, 4)"""

  // ---- catalog queries ----

  private def tokenCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      size(tokens($"text")).cast("long").as("n_tokens"),
      size(bpeTokens($"text")).cast("long").as("n_bpe"),
      subwordCount($"text").as("n_subwords"))
  }

  private def qualityStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("q", qualityScore($"text"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"q"), 4).as("avg_quality"),
        round(min($"q"), 4).as("min_quality"),
        round(max($"q"), 4).as("max_quality"))
  }

  private def langIdQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"lang", langId($"text").as("lang_pred"))
  }

  private def fingerprintQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", fingerprint($"text").as("fp"))
  }

  /** End-to-end curation pass — the canonical LLM training-data
    * pipeline composed from the operators above: language-verified
    * (predicted == labeled), quality-filtered, exact-deduped, then
    * rolled up to per-language document/token budgets. One scan, one
    * digest shuffle, one tiny rollup — the 100 TB shape (all per-doc
    * scoring is scan-stage; only digests and the per-language partials
    * cross the network). */
  private def curation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("lang_pred", langId($"text"))
      .withColumn("q", qualityScore($"text"))
      .filter($"q" >= 0.5 && $"lang_pred" === $"lang")
      .groupBy(md5($"text").as("digest"))
      .agg(min($"lang_pred").as("lang_pred"),
        min(size(tokens($"text")).cast("long")).as("n_tokens"))
      .groupBy($"lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
  }

  private def curationOracle: String = {
    val (hits, winner) = langIdSqlParts
    s"""
      WITH t AS (SELECT doc_id, lang, text,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      h AS (SELECT *, $hits FROM t),
      p AS (SELECT lang, text, toks, $winner AS lang_pred,
                   $qualitySql AS q
            FROM h),
      f AS (SELECT * FROM p WHERE q >= 0.5 AND lang_pred = lang),
      d AS (SELECT min(lang_pred) AS lang_pred,
                   CAST(min(len(toks)) AS BIGINT) AS n_tokens
            FROM f GROUP BY md5(text))
      SELECT lang_pred, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1"""
  }

  /** The curation pipeline composed THROUGH the split assignment —
    * one declarative plan from raw text to per-(split, language)
    * training budgets: language-verify + quality-filter (the
    * q_curation_pipeline gates), then the deterministic 80/10/10
    * Knuth-hash split (q_hash_split's assignment), then token budgets
    * per cell. What a user actually runs before a training job; the
    * whole thing is one scan + one small rollup shuffle (every gate
    * and the split id are scan-stage expressions). */
  private def curationSplits(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = pmod($"doc_id" * lit(2654435761L), lit(4294967296L)) % 100
    val split = when(bucket < 80, "train")
      .when(bucket < 90, "valid").otherwise("test")
    Tables.documents(s, d)
      .withColumn("lang_pred", langId($"text"))
      .withColumn("q", qualityScore($"text"))
      .filter($"q" >= 0.5 && $"lang_pred" === $"lang")
      .select(split.as("split"), $"lang",
        size(tokens($"text")).cast("long").as("n_tokens"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
  }

  private def curationSplitsOracle: String = {
    val (hits, winner) = langIdSqlParts
    s"""
      WITH t AS (SELECT doc_id, lang, text,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      h AS (SELECT *, $hits FROM t),
      p AS (SELECT doc_id, lang, toks, $winner AS lang_pred,
                   $qualitySql AS q
            FROM h),
      f AS (SELECT doc_id, lang, toks FROM p
            WHERE q >= 0.5 AND lang_pred = lang),
      s AS (SELECT CASE
                     WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
                       THEN 'train'
                     WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                       THEN 'valid'
                     ELSE 'test' END AS split,
                   lang, CAST(len(toks) AS BIGINT) AS n_tokens
            FROM f)
      SELECT split, lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM s GROUP BY 1, 2"""
  }

  /** Gopher/C4-style per-document quality rules — the rule-based
    * filter battery an LLM pretraining pipeline applies before dedup:
    * token-count band, mean-word-length band, minimum English-stopword
    * evidence, and duplicate-bigram ceiling (repetition detector).
    * All pure scan-stage expressions; `keep` is the conjunction. */
  /** Code-vs-prose detector — the pretraining-mix router that decides
    * whether a document goes to the code bucket (C4/RedPajama-style
    * curation keeps them separate because code skews every prose
    * quality heuristic). Since the corpus is synthetic prose, a
    * deterministic doc_id-keyed augmentation (the q_url_dedup
    * pattern) plants code-shaped suffixes on 2 of every 5 docs so the
    * decision boundary is actually exercised end-to-end. Four
    * integer-exact features — bracket/brace density, operator
    * density, snake_case tokens, keyword hits — each voted through a
    * CROSS-MULTIPLIED threshold (n_brace·100 ≥ n_chars, never a
    * float ratio); is_code = ≥3 of 4 votes. Everything is per-row
    * regexp_count arithmetic inside the scan: zero shuffles, linear
    * at any corpus size, and the oracle replays the augmentation and
    * every count verbatim. */
  private def codeDetect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val aug = when($"doc_id" % 5 === 0,
        concat($"text", lit(" def calc_"), $"doc_id",
          lit("(x): return x + "), $"doc_id" % 7,
          lit("; arr[i] = arr[i] * 2; { emit(x); }")))
      .when($"doc_id" % 5 === 1,
        concat($"text", lit(" total_sum = total_sum + 1; if "),
          lit("(total_sum == "), $"doc_id" % 13,
          lit(") { flush_buffer(); } else { skip_row(); }")))
      .otherwise($"text")
    Tables.documents(s, d)
      .select($"doc_id", aug.as("t2"))
      .select($"doc_id",
        length($"t2").cast("long").as("n_chars2"),
        regexp_count($"t2", lit("[{}()\\[\\]]")).cast("long")
          .as("n_brace"),
        regexp_count($"t2", lit("[;=<>+*/]")).cast("long").as("n_op"),
        regexp_count($"t2", lit("[a-z]+_[a-z]+")).cast("long")
          .as("n_snake"),
        regexp_count($"t2",
          lit("\\bdef\\b|\\breturn\\b|\\bif\\b|\\belse\\b"))
          .cast("long").as("n_kw"))
      .withColumn("score",
        when($"n_brace" * 100L >= $"n_chars2", 1L).otherwise(0L) +
          when($"n_op" * 50L >= $"n_chars2", 1L).otherwise(0L) +
          when($"n_snake" >= 2L, 1L).otherwise(0L) +
          when($"n_kw" >= 2L, 1L).otherwise(0L))
      .withColumn("is_code", $"score" >= 3L)
  }

  private def gopherRules(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // all rule inputs come from the single-pass codegen kernel
    // (graft.ext.TextStatsExpr): the interpreted HOF formulation this
    // replaced re-walked the token array four times per row and timed
    // 14.9 s at sf0.1 — see textStatsInterpreted (the parity model)
    val nTok = $"st.n_tokens"
    val meanWLen = $"st.sum_char_len".cast("double") /
      greatest(nTok.cast("double"), lit(1.0))
    val dupFrac = when($"st.n_bigrams" === 0L, lit(0.0))
      .otherwise(lit(1.0) - $"st.n_distinct_bigrams".cast("double") /
        $"st.n_bigrams".cast("double"))
    Tables.documents(s, d)
      .withColumn("st",
        graft.ext.TextStatsExpr.textStats($"text", langStopwords.head._2))
      .select(
        $"doc_id",
        (nTok >= 20 && nTok <= 100000).as("r_word_count"),
        (meanWLen >= 3.0 && meanWLen <= 10.0).as("r_mean_word_len"),
        ($"st.en_sw_hits" >= 2).as("r_stopwords"),
        (round(dupFrac, 4) <= 0.2).as("r_dup_bigrams"))
      .withColumn("keep",
        $"r_word_count" && $"r_mean_word_len" && $"r_stopwords" &&
          $"r_dup_bigrams")
  }

  /** Per-document repetition profile — the Gopher/C4 repetition-signal
    * family as first-class columns rather than one pass/fail rule:
    * duplicate-token fraction, MODE token share (the most-repeated
    * token's frequency), and the bigram twins, each in exact e6
    * fixed-point (integer div of exact counts — zero float anywhere),
    * plus a `repetitive` flag at the Gopher-ish 20 % thresholds.
    * Backed by the single-pass codegen kernel
    * [[graft.ext.RepetitionStatsExpr]] (two per-row hash-maps; the
    * interpreted distinct×filter mode count is O(n·distinct) per doc —
    * the exact shape the round-9 straggler hunt measured at 14+ s).
    * Scan-stage only: per-doc state, no shuffle, any corpus size. */
  private def repetitionStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("rs", graft.ext.RepetitionStatsExpr
        .repetitionStats($"text"))
      .select(
        $"doc_id",
        $"rs.n_tokens".as("n_tokens"),
        expr("(rs.n_tokens - rs.n_distinct_tokens) * 1000000" +
          " div rs.n_tokens").as("dup_tok_e6"),
        expr("rs.max_tok_cnt * 1000000 div rs.n_tokens")
          .as("top_tok_e6"),
        when($"rs.n_bigrams" === 0L, 0L)
          .otherwise(expr("(rs.n_bigrams - rs.n_distinct_bigrams)" +
            " * 1000000 div rs.n_bigrams")).as("dup_bi_e6"),
        when($"rs.n_bigrams" === 0L, 0L)
          .otherwise(expr("rs.max_bi_cnt * 1000000 div rs.n_bigrams"))
          .as("top_bi_e6"))
      .withColumn("repetitive",
        $"top_tok_e6" > 200000L || $"dup_bi_e6" > 200000L)
  }

  /** Fixed-weight linear quality classifier — the model-based filter
    * stage of a curation pipeline (production quality gates are
    * fastText-style linear models over cheap text features; the
    * weights here are pinned constants so the gate is reproducible
    * everywhere, and a trained model swaps in by replacing the
    * constants). Features are the same exact-integer-derived per-row
    * ratios the Gopher rules use (bit-identical in any engine —
    * float rule 1); the margin is one fixed-order linear combination,
    * emitted as floor(margin·1e6) BIGINT units (float rule 4: never
    * round() a derived double), with the keep decision from the
    * UNROUNDED margin. No exp(): a sigmoid is monotone in the margin,
    * so the libm-free margin is the portable score. Scan-stage only —
    * no shuffle, no UDF, stays in whole-stage codegen. */
  private def qualityClassifier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // features off the same single-pass kernel as gopherRules; the
    // exact-integer cells convert to double identically to the
    // interpreted formulation, so the fixed-order margin chain (and
    // its floor/compare) is bit-identical — parity in ScaleSpec
    val nTokD = greatest($"st.n_tokens".cast("double"), lit(1.0))
    val lenScore = least(length($"text").cast("double") / lit(500.0), lit(1.0))
    val diversity = $"st.n_distinct_tokens".cast("double") / nTokD
    val swRatio = $"st.en_sw_hits".cast("double") / nTokD
    val dupFrac = when($"st.n_bigrams" === 0L, lit(0.0))
      .otherwise(lit(1.0) - $"st.n_distinct_bigrams".cast("double") /
        $"st.n_bigrams".cast("double"))
    val margin = lit(-1.5) + lit(1.0) * lenScore + lit(1.5) * diversity +
      lit(8.0) * swRatio - lit(4.0) * dupFrac
    Tables.documents(s, d)
      .withColumn("st",
        graft.ext.TextStatsExpr.textStats($"text", langStopwords.head._2))
      .select(
        $"doc_id",
        floor(margin * 1000000).as("score_e6"),
        (margin > 0).as("keep"))
      .withColumn("score", $"score_e6".cast("double") / 1000000.0)
  }

  /** DPO/RLHF-style preference-pair assembly — the contrastive-data
    * construction step: within every (source, lang) cohort, pair the
    * highest-scoring document (chosen) with the lowest (rejected)
    * under the SAME fixed-weight quality margin as
    * [[qualityClassifier]], with deterministic doc-id tie-breaks.
    * The whole selection is ONE map-side-combinable aggregate of two
    * ordered structs — max(struct(score, −id)) / min(struct(score,
    * id)) — so the shuffle carries |sources×langs| rows, never the
    * corpus (a per-group window sort would); groups need ≥ 2 docs.
    * Scores stay in exact floor(margin·1e6) BIGINT units end-to-end. */
  private def preferencePairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nTokD = greatest($"st.n_tokens".cast("double"), lit(1.0))
    val lenScore = least(length($"text").cast("double") / lit(500.0), lit(1.0))
    val diversity = $"st.n_distinct_tokens".cast("double") / nTokD
    val swRatio = $"st.en_sw_hits".cast("double") / nTokD
    val dupFrac = when($"st.n_bigrams" === 0L, lit(0.0))
      .otherwise(lit(1.0) - $"st.n_distinct_bigrams".cast("double") /
        $"st.n_bigrams".cast("double"))
    val margin = lit(-1.5) + lit(1.0) * lenScore + lit(1.5) * diversity +
      lit(8.0) * swRatio - lit(4.0) * dupFrac
    Tables.documents(s, d)
      .withColumn("st",
        graft.ext.TextStatsExpr.textStats($"text", langStopwords.head._2))
      .select($"source", $"lang", $"doc_id",
        floor(margin * 1000000).as("score_e6"))
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        max(struct($"score_e6", (-$"doc_id").as("neg_id"))).as("hi"),
        min(struct($"score_e6", $"doc_id")).as("lo"))
      .filter($"n_docs" >= 2)
      .select($"source", $"lang", $"n_docs",
        (-$"hi.neg_id").as("chosen_doc"),
        $"hi.score_e6".as("chosen_e6"),
        $"lo.doc_id".as("rejected_doc"),
        $"lo.score_e6".as("rejected_e6"),
        ($"hi.score_e6" - $"lo.score_e6").as("gap_e6"))
  }

  /** How many top ranks the vocabulary coverage curve walks. */
  val VocabCoverageK = 32

  /** Vocabulary coverage curve — the tokenizer-sizing primitive: what
    * fraction of the token STREAM is covered by the top-k vocabulary,
    * for every k up to [[VocabCoverageK]] (the OOV-rate-vs-vocab-size
    * tradeoff [[vocabEncode]] fixes one point of). Scale shape: the
    * corpus collapses to distinct-token counts (map-side combine),
    * the curve only needs the TOP-K ranks — a TakeOrdered of the
    * vocab, not a global sort — and the single-partition cumsum that
    * follows runs over ≤ K rows at ANY corpus size; the total-token
    * scalar is a 1-row broadcast cross join. Coverage is exact
    * integer e6 (cum·10⁶ div total). */
  private def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val cnts = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val total = cnts.agg(sum($"cnt").as("total"))
    val top = cnts.orderBy($"cnt".desc, $"tok".asc)
      .limit(VocabCoverageK)
    val running = W.orderBy($"cnt".desc, $"tok".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    top
      .withColumn("k", row_number().over(
        W.orderBy($"cnt".desc, $"tok".asc)).cast("long"))
      .withColumn("cum_tokens", sum($"cnt").over(running))
      .crossJoin(total)
      .select($"k", $"tok", $"cnt", $"cum_tokens",
        $"total".as("total_tokens"),
        expr("cum_tokens * 1000000 div total").as("coverage_e6"))
  }

  private def qualityClassifierOracle: String = {
    val enSw = langStopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""
      WITH t AS (SELECT doc_id, text,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
                   least(length(text) * 1.0 / 500.0, 1.0) AS len_score,
                   len(list_distinct(toks)) * 1.0 /
                     greatest(len(toks), 1) AS diversity,
                   len(list_filter(toks, w -> w IN ($enSw))) * 1.0 /
                     greatest(len(toks), 1) AS sw_ratio,
                   [toks[i] || ' ' || toks[i+1]
                    for i in range(1, len(toks))] AS bigrams
            FROM t),
      f AS (SELECT doc_id, len_score, diversity, sw_ratio,
                   CASE WHEN len(bigrams) = 0 THEN 0.0
                        ELSE 1.0 - len(list_distinct(bigrams)) * 1.0 /
                             len(bigrams)
                   END AS dup_frac
            FROM m),
      g AS (SELECT doc_id,
                   -1.5 + 1.0 * len_score + 1.5 * diversity +
                     8.0 * sw_ratio - 4.0 * dup_frac AS margin
            FROM f),
      h AS (SELECT doc_id,
                   CAST(floor(margin * 1000000) AS BIGINT) AS score_e6,
                   margin > 0 AS keep
            FROM g)
      SELECT doc_id, score_e6, keep,
             CAST(score_e6 AS DOUBLE) / 1000000.0 AS score
      FROM h"""
  }

  private def gopherOracle: String = {
    val enSw = langStopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""
      WITH t AS (SELECT doc_id, text,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
                   len(toks) AS n_tok,
                   list_sum(list_transform(toks, w -> length(w))) * 1.0 /
                     greatest(len(toks), 1) AS mean_wlen,
                   len(list_filter(toks, w -> w IN ($enSw))) AS sw_hits,
                   [toks[i] || ' ' || toks[i+1]
                    for i in range(1, len(toks))] AS bigrams
            FROM t),
      r AS (SELECT doc_id,
                   n_tok >= 20 AND n_tok <= 100000 AS r_word_count,
                   mean_wlen >= 3.0 AND mean_wlen <= 10.0
                     AS r_mean_word_len,
                   sw_hits >= 2 AS r_stopwords,
                   round(CASE WHEN len(bigrams) = 0 THEN 0.0
                         ELSE 1.0 - len(list_distinct(bigrams)) * 1.0 /
                              len(bigrams) END, 4) <= 0.2 AS r_dup_bigrams
            FROM m)
      SELECT doc_id, r_word_count, r_mean_word_len, r_stopwords,
             r_dup_bigrams,
             r_word_count AND r_mean_word_len AND r_stopwords AND
               r_dup_bigrams AS keep
      FROM r"""
  }

  /** Corpus-level token frequency top-k — the vocabulary/stopword
    * sweep a tokenizer-training pass starts from. Explode → partial
    * count (map-side combine collapses each partition to its distinct
    * tokens) → TakeOrderedAndProject; shuffle volume is distinct-token
    * cardinality, never the token stream. */
  private def topTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token".asc)
      .limit(20)
  }

  /** Deterministic train/valid/test assignment — the reproducible-split
    * primitive a training pipeline needs: membership is a pure function
    * of the stable document id (Knuth multiplicative hash mod 100 →
    * 80/10/10 bands), so ANY executor count, partitioning, or rerun
    * yields the same split, and new documents never reshuffle old ones
    * (unlike randomSplit, which is seed- and partitioning-dependent).
    * Scan-local projection + one small agg shuffle; the assignment
    * column itself costs nothing at 100 TB. */
  private def hashSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = pmod($"doc_id" * lit(2654435761L), lit(4294967296L)) % 100
    val split = when(bucket < 80, "train")
      .when(bucket < 90, "valid").otherwise("test")
    Tables.documents(s, d)
      .select(split.as("split"), $"lang", $"n_chars")
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis): per language, keep the 5 documents with the largest
    * u^(1/w) — ranked via the equivalent ln(u)/w — where u is a
    * deterministic uniform derived from doc_id (Knuth multiplicative
    * hash, +0.5 so u is never 0) and the weight w = n_chars. Because
    * u is a pure function of the id, the sample is reproducible
    * across reruns and partitionings (unlike rand()-based sampling),
    * and longer documents are proportionally likelier — the weighted
    * data-mixing primitive. Selection routes through the custom
    * TopKPerKey operator: bounded per-partition heaps, partial+final,
    * so only per-partition survivors cross the shuffle — no global
    * sort of the corpus. */
  private def weightedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val u = (pmod($"doc_id" * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val scored = Tables.documents(s, d)
      .filter($"n_chars" > 0)
      .select($"lang", $"doc_id", (log(u) / $"n_chars").as("score"))
    graft.ext.TopKPerKey.topK(scored, Seq("lang"),
        Seq(("score", false), ("doc_id", true)), 5)
      .select($"lang", $"doc_id", round($"score", 8).as("score"))
  }

  /** Greedy maximum-coverage selection (the submodular curation
    * primitive — Nemhauser/Wolsey/Fisher 1978 gives the (1−1/e)
    * guarantee): pick [[MaxCoverRounds]] documents that together
    * cover the most distinct 3-gram shingles, one greedy argmax per
    * round. The "assemble a small probe corpus with maximal content
    * coverage" move — the set-cover complement of q_kcenter_greedy's
    * geometric diversity. (The universe is SHINGLES, not unigrams:
    * this corpus draws from a ~31-word pool, so unigram coverage
    * saturates after one pick; the shingle space is 100k+.)
    *
    * Fixed-round unrolled dataflow, zero driver-side data pulls: each
    * round is gain-count (map-side combinable groupBy over the
    * UNCOVERED posting) → 1-row argmax via TakeOrderedAndProject
    * (deterministic tie-break gain desc, doc_id asc) → the picked
    * doc's ≤vocab-sized token set broadcasts into a LEFT ANTI that
    * shrinks the posting. Rounds registry-persist the shrinking
    * posting so round r doesn't re-derive rounds 1..r−1 (the
    * kmeans/kcenter per-round pattern). Shingles stay STRINGS here —
    * cross-engine identical with no hash-collision caveat — and
    * coverage counts are exact, so the DuckDB oracle replays all
    * rounds verbatim. covered_total is the running sum of gains
    * (each gain counts only NEWLY covered shingles). */
  val MaxCoverRounds = 5

  private def maxCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val posting = graft.GraftCaches.getOrPersist(s, s"text.sh_posting:$d") {
      Tables.documents(s, d)
        .select($"doc_id", split(lower($"text"), "\\s+").as("toks"))
        .filter(size($"toks") >= 3)
        // bindOnce: unbound lambda re-splits per trigram position
        .select($"doc_id", explode(array_distinct(
          bindOnce($"toks") { tk =>
            transform(sequence(lit(1), size(tk) - lit(2)),
              i => concat_ws(" ", slice(tk, i, lit(3))))
          })).as("tok"))
    }
    var uncovered = posting
    val picks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to MaxCoverRounds) {
      val pick = graft.GraftCaches.getOrPersist(s, s"text.maxcov.k$r:$d") {
        uncovered.groupBy($"doc_id").agg(count(lit(1)).as("gain"))
          .orderBy($"gain".desc, $"doc_id".asc).limit(1)
          .select(lit(r.toLong).as("round"), $"doc_id", $"gain")
      }
      picks += pick
      val covTok = posting
        .join(broadcast(pick.select($"doc_id")), "doc_id")
        .select($"tok").distinct()
      uncovered = graft.GraftCaches.getOrPersist(s,
        s"text.maxcov.u$r:$d") {
        uncovered.join(broadcast(covTok), Seq("tok"), "left_anti")
      }
    }
    val w = Window.orderBy($"round".asc)
    picks.reduce(_ unionAll _)
      .withColumn("covered_total", sum($"gain").over(w))
      .orderBy($"round".asc)
  }

  /** Leave-one-source-out ablation — first-order data valuation for
    * mixture curation: for each source, how does the corpus-level
    * quality rate move if the source is dropped? delta_e6 > 0 means
    * removal IMPROVES the corpus (the source dilutes quality);
    * < 0 means the source carries quality. Exact integers throughout
    * (the LOO rate needs only the per-source cells subtracted from
    * the corpus totals — no second pass over the data), so the whole
    * ablation table costs ONE map-side-combining aggregate at any
    * scale. Quality gate: n_chars ≥ [[AblationMinChars]] (the
    * length-floor proxy; swap in any boolean gate). */
  val AblationMinChars = 300L

  private def sourceAblation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, d)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_chars" >= AblationMinChars, 1L).otherwise(0L))
          .as("n_pass"))
    val tot = cells.agg(sum($"n_docs").as("nn"), sum($"n_pass").as("pp"))
    cells.crossJoin(broadcast(tot))
      .select($"source", $"n_docs", $"n_pass",
        expr("(pp * 1000000) div nn").as("rate_all_e6"),
        when($"nn" > $"n_docs",
          expr("((pp - n_pass) * 1000000) div (nn - n_docs)"))
          .otherwise(lit(null).cast("long")).as("rate_loo_e6"))
      .withColumn("delta_e6", $"rate_loo_e6" - $"rate_all_e6")
      .orderBy($"source".asc)
  }

  /** Keywords kept by [[textrank]]. */
  val TextRankK = 10

  /** TextRank keyword extraction (Mihalcea/Tarau 2004) — WEIGHTED
    * PageRank on the token co-occurrence graph instead of tf-idf
    * counting: a word matters if it neighbors words that matter,
    * with edge weight = adjacency count so strong collocations pull
    * harder (the unweighted variant is degenerate on a dense small
    * vocabulary — every node ties; weights are what discriminate).
    * Same fixed-point-integer discipline as
    * [[GraphOps.pagerankOn]]: ranks live on the ppt grid, each
    * contribution is rank·w div strength (exact), teleport 0.15,
    * damping 85/100, [[GraphOps.Iterations]] unrolled rounds replayed
    * CTE-for-CTE by the oracle. Output: top-[[TextRankK]] keywords
    * with deterministic (rank_fp desc, token asc) order. Scale: the
    * weighted edge build is one combinable bigram rollup; the rank
    * loop runs on the VOCABULARY graph, bounded by distinct bigrams,
    * not corpus rows. */
  private def textrank(s: SparkSession, d: String): DataFrame =
    textrankWith(s, d, GraphOps.DefaultBroadcastNodeCap)

  /** [[textrank]] with an explicit broadcast cap — the rank table is
    * VOCABULARY-cardinality, which at 100 TB of noisy web text is
    * tens of millions of distinct tokens, so the per-iteration
    * broadcast is gated exactly like [[GraphOps.pagerankOn]]
    * (VERDICT r11 #3): at or below the cap each round broadcasts the
    * rank table; above it the join falls back to shuffle_hash on the
    * already-co-partitioned `src` key. TextOpsSpec pins both paths
    * identical. */
  private[graft] def textrankWith(s: SparkSession, d: String,
      broadcastNodeCap: Long): DataFrame = {
    import s.implicits._
    val fp = GraphOps.FpOne
    // bindOnce: unbound lambda re-tokenizes per bigram position
    val bi = Tables.documents(s, d)
      .select(explode(bindOnce(tokens(lower($"text"))) { t =>
        when(size(t) < 2, array().cast(
          "array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(t) - lit(1)),
            i => struct(element_at(t, i).as("w1"),
              element_at(t, i + 1).as("w2"))))
      }).as("p"))
      .select($"p.w1", $"p.w2")
      .filter($"w1" =!= $"w2")
    val edges = graft.GraftCaches.getOrPersist(s, s"textrank.edges:$d") {
      bi.select($"w1".as("src"), $"w2".as("dst"))
        .union(bi.select($"w2".as("src"), $"w1".as("dst")))
        .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
    }
    val strength = graft.GraftCaches.getOrPersist(s,
      s"textrank.strength:$d") {
      edges.groupBy($"src").agg(sum($"w").as("stw"))
    }
    val adj = edges.join(strength, "src")
    val nNodes = strength.count()
    val broadcastRanks = nNodes <= broadcastNodeCap
    val teleport = fp / 100 * 15 / nNodes
    var rank = strength.select($"src".as("node"),
      lit(fp / nNodes).as("rank_fp"))
    for (_ <- 1 to GraphOps.Iterations) {
      val r = rank.withColumnRenamed("node", "src")
      val joined =
        if (broadcastRanks) adj.join(broadcast(r), "src")
        else adj.join(r.hint("shuffle_hash"), "src")
      rank = joined
        .select($"dst".as("node"), expr("rank_fp * w div stw").as("c"))
        .groupBy($"node").agg(sum($"c").as("sc"))
        .select($"node",
          (lit(teleport) + expr("(85 * sc) div 100")).as("rank_fp"))
    }
    rank
      .orderBy($"rank_fp".desc, $"node".asc)
      .limit(TextRankK)
      .select($"node".as("keyword"), $"rank_fp",
        ($"rank_fp".cast("double") / lit(fp.toDouble)).as("rank"))
  }

  /** Unrolled DuckDB replay of [[textrank]] — same bigram edges, same
    * fixed-point rounds as GraphOps.pagerankOracle. */
  private def textrankOracle: String = {
    val fp = GraphOps.FpOne
    val teleport = fp / 100 * 15
    val base = s"""
      WITH tk AS (SELECT string_split_regex(lower(text), '\\s+') AS toks
                  FROM documents),
      ix AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM tk
             WHERE len(toks) >= 2),
      bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM ix
             WHERE toks[i] <> toks[i + 1]),
      dir AS (SELECT w1 AS src, w2 AS dst FROM bi
              UNION ALL SELECT w2, w1 FROM bi),
      edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
                FROM dir GROUP BY 1, 2),
      st AS (SELECT src, CAST(sum(w) AS BIGINT) AS stw
             FROM edges GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM st),
      r0 AS (SELECT src AS node, $fp // n AS rank_fp FROM st, nn)"""
    val iters = (1 to GraphOps.Iterations).map { i =>
      s""",
      c$i AS (SELECT e.dst AS node, r.rank_fp * e.w // s.stw AS c
              FROM edges e
              JOIN r${i - 1} r ON e.src = r.node
              JOIN st s ON e.src = s.src),
      r$i AS (SELECT node,
                     $teleport // nn.n + (85 * sum(c)) // 100 AS rank_fp
              FROM c$i, nn GROUP BY node, nn.n)"""
    }.mkString
    s"""$base$iters
      SELECT node AS keyword, CAST(rank_fp AS BIGINT) AS rank_fp,
             CAST(rank_fp AS DOUBLE) / $fp AS rank
      FROM r${GraphOps.Iterations}
      ORDER BY rank_fp DESC, node ASC LIMIT $TextRankK"""
  }

  /** Common denominator for exact Shapley credit: lcm(1..20), enough
    * for the 20 document sources (spec-asserted). */
  val ShapleyLcm = 232792560L

  /** Exact Shapley data valuation of the distinct-shingle COVERAGE
    * game (Ghorbani/Zou's "Data Shapley" idea specialized to the one
    * characteristic function that collapses closed-form): with
    * v(S) = |shingles covered by sources in S|, the Shapley value of
    * source i is Σ over shingles it contains of 1/|owners(shingle)| —
    * the marginal-over-all-orderings sum telescopes because coverage
    * is a union of per-shingle unanimity games. That turns an
    * exponential 2^n subset sweep into ONE owner-count join: distinct
    * (shingle, source) pairs → per-shingle owner count → per-source
    * Σ lcm/owners, all exact BIGINTs in units of 1/[[ShapleyLcm]]
    * (lcm(1..20) so every 1/|T| division is exact — no floats, no
    * floor loss). The efficiency axiom Σᵢ φᵢ = v(all) becomes the
    * wire-checkable identity Σ credit_lcm = lcm · n_shingles
    * (ScaleSpec pins it). Unlike [[sourceAblation]] (first-order LOO)
    * this is the FULL cooperative value: a shingle triplicated across
    * sources pays each owner a third, so near-duplicate-heavy sources
    * are priced down even when no single removal moves the corpus.
    * Scale: distinct pair extraction is map-side combinable, the
    * owner-count join co-partitions on shingle, and the final rollup
    * is |sources| rows — one shuffle family, linear at any volume. */
  private def shapleyCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // bindOnce: unbound lambda re-tokenizes per trigram position
    val shingles = bindOnce(tokens(col("text"))) { t =>
      when(size(t) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - lit(2)),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
            element_at(t, i + 2))))
    }
    val owners = Tables.documents(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select($"source", explode(shingles).as("sh"))
      .distinct()
    val sizes = owners.groupBy($"sh")
      .agg(count(lit(1)).as("n_owners"))
    owners.join(sizes, "sh")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_covered"),
        sum(when($"n_owners" === 1L, 1L).otherwise(0L))
          .as("n_exclusive"),
        sum(expr(s"$ShapleyLcm div n_owners")).as("credit_lcm"))
      // credit_lcm ≈ lcm·n_shingles grows with the corpus: widen to
      // decimal(38,0) before the ×1000 like the HUGEINT oracle does
      // (ADVICE r11 — Long wraps silently past ~4e7 covered shingles
      // per source where the oracle stays exact)
      .withColumn("shapley_milli",
        expr(s"cast(credit_lcm as decimal(38,0)) * 1000" +
          s" div $ShapleyLcm"))
      .orderBy($"source".asc)
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS algorithm): hash every [[WinnowK]]-token gram, slide a
    * [[WinnowW]]-gram window over the hash stream, and keep the
    * minimum of each window — the LOCAL fingerprint guarantee (any
    * shared substring of ≥ w+k−1 tokens shares ≥ 1 selected
    * fingerprint) that whole-document hashing (q_text_fingerprint)
    * and global MinHash (q_dedup_minhash_lsh) cannot give. Selecting
    * min VALUES (then distinct) rather than argmin positions
    * sidesteps the tie-breaking divergence risk entirely. The whole
    * selection runs inside the scan via the fused
    * [[graft.ext.WinnowStatsExpr]] kernel — ZERO shuffle (a dataflow
    * window formulation would shuffle the corpus-cardinality gram
    * stream just to regroup values born adjacent in one row; measured
    * 17.4 s → 2.9 s at the 100× probe) — and the gram hash is the
    * portable polynomial, so DuckDB replays selection exactly from
    * list comprehensions. Output: per-doc fingerprint density audit
    * (n_fp/n_windows as exact e6). */
  val WinnowK = 3
  val WinnowW = 4

  private def winnowFingerprints(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", graft.ext.WinnowStatsExpr
        .winnowStats($"text", WinnowK, WinnowW).as("ws"))
      .select($"doc_id", $"ws" (0).as("n_grams"), $"ws" (1).as("n_fp"))
      .filter($"n_grams" >= 1)
      .select($"doc_id", $"n_grams",
        greatest($"n_grams" - (WinnowW - 1), lit(0L)).as("n_windows"),
        $"n_fp")
      .withColumn("density_e6",
        when($"n_windows" > 0, expr("n_fp * 1000000 div n_windows"))
          .otherwise(lit(0L)))
      .orderBy($"doc_id".asc)
  }

  /** Equal-allocation STRATIFIED sample: every language contributes
    * exactly m documents, where m is the size of the smallest stratum
    * — the "balance the languages before training" downsampling move
    * (the complement of q_class_weights, which reweights instead of
    * resampling). Membership is deterministic: within each stratum
    * keep the m smallest Knuth-hash values (ties broken by doc_id), a
    * pure function of the stable ids — reruns, executor counts, and
    * partitionings all produce the SAME sample, and the per-stratum
    * quota is met EXACTLY, not in expectation like rate-based
    * Bernoulli sampling. Selection routes through TopKPerKey (bounded
    * per-partition heaps, partial+final), so the skewed big stratum
    * never globally sorts and only per-partition survivors cross the
    * shuffle. The m scalar is one count over the tiny per-lang count
    * table. Output is the per-stratum audit row: quota met
    * (n_sampled == m for every lang) plus an id checksum that pins
    * exact membership against the oracle's window replay. */
  private def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_total"))
    val m = counts.agg(min($"n_total")).head().getLong(0)
    val scored = docs.select($"lang", $"doc_id", $"n_chars",
      pmod($"doc_id" * lit(2654435761L), lit(4294967296L)).as("h"))
    val sampled = graft.ext.TopKPerKey.topK(scored, Seq("lang"),
      Seq(("h", true), ("doc_id", true)), m.toInt)
    sampled.groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"),
        sum($"doc_id").as("id_checksum"),
        sum($"n_chars").as("chars_sampled"))
      .join(counts, "lang")
      .select($"lang", $"n_total", $"n_sampled", $"id_checksum",
        $"chars_sampled")
      .orderBy($"lang".asc)
  }

  /** TF-IDF top terms per document — the classic salient-term extract
    * (here: top 3 by tf·ln(N/df), restricted to doc_id < 100 to bound
    * the output). Shape at scale: token stream collapses map-side into
    * (doc, token) and (token) partial counts; the document-frequency
    * table is vocabulary-sized and BROADCAST back onto tf, so the big
    * token stream crosses the wire once; the corpus count joins as a
    * broadcast scalar, never a driver-side collect. */
  private def tfidfTop(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tok = docs
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .filter($"token" =!= "")
    val tf = tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tok.distinct().groupBy($"token").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score".desc, $"token".asc)
    tf.join(broadcast(df), "token").crossJoin(broadcast(nDocs))
      .withColumn("score", round($"tf" * log($"n_docs" / $"df"), 4))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3 && $"doc_id" < 100)
      .select($"doc_id", $"rn".cast("long").as("rn"), $"token", $"score")
  }

  /** BM25 retrieval scoring (k1=1.2, b=0.75, Lucene's +1-inside-the-log
    * idf, so idf ≥ 0 even for stop-like terms) for a pinned 3-term
    * query — the ranking function a retrieval index computes over a
    * corpus, and the relevance filter a RAG-style curation pipeline
    * runs at selection time. Shape at scale: the token stream collapses
    * map-side into per-doc lengths (one shuffle) and — term-filtered
    * BEFORE the aggregate, so only matching postings move — per-doc
    * term frequencies; df and the corpus length stats derive from
    * those tiny tables and join back BROADCAST; top-20 is
    * TakeOrderedAndProject, never a global sort. Float discipline (the
    * r6 lesson: never feed a rounded ln back into a double
    * multiply-then-floor): idf's ln is rounded to the 1e-6 grid
    * (rule 6) and immediately pinned as BIGINT micro-units via
    * DECIMAL(18,6); tf, dl, n_docs, tot_len are all exact integers, so
    * clearing the k1/b constants' denominators (×20·tot_len) turns the
    * whole per-term score into ONE integer `div` —
    * idfU·44·tf·tot_len div (20·tf·tot_len + 6·tot_len + 18·dl·n_docs)
    * — floor of an exact non-negative integer quotient, bit-identical
    * in every engine. The convenience double is one exact divide at
    * the very end. */
  private def bm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qTerms = Seq("query", "join", "data")
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .filter($"token" =!= "")
    val dl = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(sum($"dl").as("tot_len"), count(lit(1)).as("n_docs"))
    val tf = tok.filter($"token".isInCollection(qTerms))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val idfUnits = (round(log(($"n_docs" - $"df" + lit(0.5)) /
      ($"df" + lit(0.5)) + lit(1.0)), 6).cast("decimal(18,6)") *
      1000000).cast("long")
    // score·1e6 = idfU·2.2·tf / (tf + 1.2·(0.25 + 0.75·dl·n_docs/tot_len));
    // multiply num and den by 20·tot_len to clear every constant:
    // units = idfU·44·tf·tot_len div (20·tf·tot_len + 6·tot_len + 18·dl·n_docs)
    tf.join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_units", idfUnits)
      .select($"doc_id",
        expr("CAST((CAST(idf_units AS DECIMAL(38,0)) * 44 * tf * tot_len)" +
          " div (20 * tf * tot_len + 6 * tot_len + 18 * dl * n_docs)" +
          " AS BIGINT)").as("units"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"), sum($"units").as("score_units"))
      .orderBy($"score_units".desc, $"doc_id".asc)
      .limit(20)
      .select($"doc_id", $"n_terms", $"score_units",
        ($"score_units" / lit(1000000.0)).as("score"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    * 2001) — the language-modeling counterpart to [[bm25]]:
    * ln P(q|d) = Σ_t ln((tf + μ·cf_t/C) / (|d| + μ)). Implemented in
    * the DECOMPOSED form that makes it posting-driven at scale,
    *
    *   Σ_t ln(μ·cf_t/C)  −  |q|·ln(|d|+μ)  +  Σ_{tf>0} ln(1 + tf·C/(μ·cf_t))
    *
    * — a query-constant scalar, a per-doc length penalty, and a
    * sparse correction over MATCHING postings only, so docs that
    * contain no query term are scored from the length table alone
    * and the corpus-wide token stream is touched exactly once (the
    * same trick production QL rankers use). Every ln term is a
    * double over exact BIGINT counts, floored to e9 BEFORE summing
    * (floor-then-sum), with cross products formed in double (the
    * cramersV int64 lesson); the double trees are written identically
    * in the oracle. μ = [[QlMu]]. */
  val QlMu = 100L

  private def queryLikelihood(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qTerms = Seq("query", "join", "data")
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .filter($"token" =!= "")
    val dl = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val c = dl.agg(sum($"dl").as("cc"))
    val cf = tok.filter($"token".isInCollection(qTerms))
      .groupBy($"token").agg(count(lit(1)).as("cf"))
    val bg = cf.crossJoin(broadcast(c))
      .agg(sum(floor(log(lit(QlMu.toDouble) * $"cf" / $"cc")
        * lit(1e9)).cast("long")).as("bg_e9"),
        count(lit(1)).as("qn"))
    val matched = tok.filter($"token".isInCollection(qTerms))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
      .join(broadcast(cf), "token")
      .crossJoin(broadcast(c))
      .groupBy($"doc_id")
      .agg(sum(floor(log(lit(1.0) + $"tf".cast("double") * $"cc"
          / (lit(QlMu.toDouble) * $"cf")) * lit(1e9)).cast("long"))
          .as("match_e9"),
        count(lit(1)).as("n_match"))
    dl.join(matched, Seq("doc_id"), "left")
      .crossJoin(broadcast(bg))
      .select($"doc_id", $"dl",
        coalesce($"n_match", lit(0L)).as("n_match"),
        ($"bg_e9"
          - $"qn" * floor(log(($"dl" + lit(QlMu)).cast("double"))
            * lit(1e9)).cast("long")
          + coalesce($"match_e9", lit(0L))).as("score_e9"))
      .orderBy($"score_e9".desc, $"doc_id".asc)
      .limit(20)
  }

  /** Zipf slope of the corpus token distribution: OLS of ln(freq) on
    * ln(rank) — natural text sits near −1; a synthetic or
    * template-heavy corpus (like this one's flat ~31-word pool)
    * shows a much shallower slope, which is exactly what makes the
    * statistic a data-quality gate. Float discipline for the FOUR
    * OLS moment sums: every per-rank term (ln r, ln f, ln r·ln f,
    * ln²r) floors to e9 BEFORE summation (floor-then-sum — double
    * sums of irrational logs would be partition-order-dependent),
    * and the closed-form slope/intercept then finish on the integer
    * sums in one deterministic double tree per engine. The token
    * count collapses map-side; ranks come from one window over the
    * vocabulary-cardinality table. */
  private def zipfSlope(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // global frequency rank over the FULL vocabulary (Heaps-sublinear
    // but unbounded): distributed GlobalRank with the desc key
    // negated — not an unpartitioned single-task-sort window
    val freq = graft.ext.GlobalRank.withRowNumber(
        Tables.documents(s, d)
          .select(explode(tokens($"text")).as("token"))
          .filter($"token" =!= "")
          .groupBy($"token").agg(count(lit(1)).as("f"))
          .withColumn("negf", -$"f"),
        Seq($"negf", $"token"), "r")
      .drop("negf")
    val x = log($"r".cast("double"))
    val y = log($"f".cast("double"))
    val sums = freq.agg(
      count(lit(1)).as("v"),
      sum($"f").as("n_tokens"),
      sum(floor(x * lit(1e9)).cast("long")).as("sx"),
      sum(floor(y * lit(1e9)).cast("long")).as("sy"),
      sum(floor(x * y * lit(1e9)).cast("long")).as("sxy"),
      sum(floor(x * x * lit(1e9)).cast("long")).as("sxx"))
    // slope = (V·Σxy − Σx·Σy) / (V·Σxx − Σx²) on the e9 integer sums
    // (numerator and denominator both carry one 1e9 factor, cleared)
    sums
      .withColumn("slope_d",
        ($"v".cast("double") * $"sxy"
          - $"sx".cast("double") * $"sy" / lit(1e9))
          / ($"v".cast("double") * $"sxx"
            - $"sx".cast("double") * $"sx" / lit(1e9)))
      .select($"v", $"n_tokens",
        floor($"slope_d" * lit(1e6)).cast("long").as("slope_e6"),
        floor(($"sy".cast("double") - $"slope_d" * $"sx")
          / $"v" / lit(1e9) * lit(1e6)).cast("long")
          .as("intercept_e6"))
  }

  /** Gini–Simpson diversity per source: 1 − Σ (nᵢ/N)², the
    * probability two tokens drawn without replacement differ — the
    * ecology-standard evenness score beside Shannon entropy
    * (q_token_entropy), and the quick "is this source a repetition
    * farm" gate. Σ c² is a sum of INTEGER-VALUED doubles (each c²
    * exactly representable and additions of exact integers in double
    * are rounding-free below 2⁵³), so the floor-e6 is deterministic;
    * the products are formed in double rather than int64 so the 100 TB
    * row counts the module targets can't overflow (the cramersV
    * lesson). One (source, token) map-side-combining aggregate, then
    * a source-cardinality rollup. */
  private def simpsonDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum($"c".cast("double") * $"c").as("s2"))
      .select($"source", $"n_tokens", $"n_distinct",
        floor((lit(1.0) - $"s2"
          / ($"n_tokens".cast("double") * $"n_tokens")) * lit(1e6))
          .cast("long").as("simpson_e6"))
      .orderBy($"source".asc)
  }

  /** BPE tokenizer induction, first merge round: the frequency of
    * every adjacent symbol pair, weighted by word frequency — the
    * statistic whose argmax IS the first BPE merge rule. The critical
    * scale property is that pair counting runs over the VOCABULARY
    * (word, freq) table, never the raw corpus: the token stream
    * collapses map-side into word frequencies first (one shuffle),
    * and the per-word character explode then touches |vocab|·|word|
    * rows — orders of magnitude below corpus token count, which is
    * exactly how production BPE trainers stay tractable. Top-20 by
    * (count, pair) is a total order via TakeOrderedAndProject. */
  private def bpeMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    val pairs = when(length($"w") < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length($"w") - 1),
        i => $"w".substr(i, lit(2))))
    vocab.select($"freq", explode(pairs).as("pair"))
      .groupBy($"pair").agg(sum($"freq").as("cnt"))
      .orderBy($"cnt".desc, $"pair".asc)
      .limit(20)
  }

  /** Quantile-threshold selection — keep only documents at or above
    * the corpus's 90th-percentile token count, reported per language
    * (the "top-X% by quality score" selection step of a curation
    * pipeline; any scored column slots in for the score). The exact
    * interpolated percentile collapses to a 1-row broadcast that the
    * scan-stage filter compares against — never a global sort or a
    * rank window over the corpus, which is what makes percentile
    * selection viable at 100 TB. The interpolation arithmetic is the
    * same exact formula in Spark's percentile() and DuckDB's
    * quantile_cont (locked green by q_percentiles). */
  private def quantileFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nt = Tables.documents(s, d)
      .select($"doc_id", $"lang",
        size(tokens($"text")).cast("long").as("n_tokens"))
    val thr = nt.agg(expr("percentile(n_tokens, 0.9)").as("p90"))
    nt.crossJoin(broadcast(thr))
      .filter($"n_tokens" >= $"p90")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"),
        min($"n_tokens").as("min_kept_tokens"),
        max($"p90").as("p90"))
  }

  /** Bigram language-model statistics: adjacent-token pair counts plus
    * the conditional probability p(w2 | w1) = count(w1 w2) / count(w1 ·),
    * the unit of n-gram LM training and of corpus-contamination
    * screens. Shape at scale: both the bigram and the left-unigram
    * counts collapse map-side (hash aggregate with partial combine)
    * before one key shuffle each; the unigram table is
    * vocabulary-sized and joins back BROADCAST, so the token stream
    * crosses the wire once. Top 50 by (count, w1, w2) — a total order,
    * so the output is deterministic. */
  /** Reference formulation of [[graft.ext.BigramPairsExpr]] —
    * identical values (ScaleSpec corpus parity), interpreted
    * execution: the lambda re-evaluates the outer tokens expression
    * per element (no CSE inside interpreted HOFs), O(n²) per doc. */
  def bigramPairsInterpreted(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"),
          element_at(t, i + 1).as("w2"))))
  }

  /** SPECULATIVE-DECODING acceptance-rate estimator — the data-side
    * number (cf. Leviathan et al. 2023, arXiv 2211.17192) that
    * decides whether a cheap draft model is worth its latency: train
    * the simplest corpus-supported draft (the bigram ARGMAX: per
    * token, the most frequent next token, ties broken
    * lexicographically — a total order, so training is
    * deterministic), then replay every corpus transition and measure
    * the fraction the draft predicts, per source. Shape: transition
    * pairs come from the [[graft.ext.BigramPairsExpr]] scan kernel
    * and their counts collapse map-side; the draft table is
    * vocab-bounded (Heaps-sublinear) and BROADCASTS back onto the
    * transitions — the corpus never shuffles; argmax rides a
    * per-token window (vocab-keyed partitions). Acceptance ships as
    * the exact ·1e6 floor. */
  private def draftAcceptance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1")).orderBy(col("cnt").desc, col("w2").asc)
    val trans = Tables.documents(s, d)
      .select($"source",
        explode(graft.ext.BigramPairsExpr.bigramPairs($"text")).as("p"))
      .select($"source", $"p.w1".as("w1"), $"p.w2".as("w2"))
    val draft = trans.groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(W))
      .filter($"rn" === 1).select($"w1", $"w2".as("draft_w2"))
    trans.join(broadcast(draft), "w1")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_transitions"),
        sum(when($"w2" === $"draft_w2", 1L).otherwise(0L))
          .as("n_accepted"))
      .withColumn("acceptance_e6",
        expr("n_accepted * 1000000 div n_transitions"))
  }

  private def bigramLm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // pair construction via the codegen kernel: the interpreted form
    // re-tokenized per element — 4.4 s of this query's 4.8 s at sf0.1
    val big = Tables.documents(s, d)
      .select(explode(graft.ext.BigramPairsExpr.bigramPairs($"text"))
        .as("p"))
      .select($"p.w1".as("w1"), $"p.w2".as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt"))
    val uni = big.groupBy($"w1").agg(sum($"cnt").as("tot"))
    big.join(broadcast(uni), "w1")
      .select($"w1", $"w2", $"cnt",
        round($"cnt".cast("double") / $"tot", 4).as("p_cond"))
      .orderBy($"cnt".desc, $"w1", $"w2")
      .limit(50)
  }

  /** Top-p (nucleus) quality-mass selection — per language, keep the
    * smallest prefix of documents (ordered by token count desc, then
    * doc_id) whose cumulative tokens reach 80 % of the language's
    * total: the "take the best X % of the QUALITY MASS, not the best
    * X % of the rows" curation cut (row-quantile cuts keep too many
    * near-duplicates of the head; mass cuts adapt to the score
    * distribution). Nucleus rule: a doc is kept while the cumulative
    * mass BEFORE it is still short of the target, so the row that
    * crosses the threshold is included. One window shuffle on lang
    * serves both the ordered prefix sum and the per-lang total
    * (frames share the partition key); the threshold test is
    * cross-multiplied into pure integers — 100·cum_before < 80·total
    * — so no ratio is ever materialized. */
  private def topPSelect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, d)
      .select($"lang", $"doc_id",
        size(tokens($"text")).cast("long").as("n_tokens"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_tokens".desc, $"doc_id".asc)
      .rowsBetween(Long.MinValue, -1)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    scored
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(wCum), lit(0L)))
      .withColumn("total", sum($"n_tokens").over(wTot))
      .withColumn("kept", $"cum_before" * 100 < $"total" * 80)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        max($"total").as("tokens_total"),
        sum(when($"kept", $"n_tokens").otherwise(0L)).as("tokens_kept"))
  }

  /** Hashing-trick feature-space audit — the collision report a
    * pipeline publishes before committing to hashed features (fixed
    * 64-bucket space here): per bucket, the distinct vocabulary mapped
    * into it (collision load) and the occurrence mass it would carry.
    * The hash is the codegen'd [[polyHash]] expression — scan-stage,
    * cross-engine exact — so the bucket assignment itself is part of
    * the oracle contract, not just the counts. One explode + one
    * 64-group aggregate (map-side combinable); the uniform-share
    * comparison is a single divide of exact BIGINTs. */
  private def featureHash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tk = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
      .select(pmod(polyHash($"tok", 31L), lit(64L)).as("bucket"), $"tok")
    tk.groupBy($"bucket")
      .agg(count(lit(1)).as("total_count"),
        countDistinct($"tok").as("n_tokens"))
      .crossJoin(broadcast(tk.agg(count(lit(1)).as("corpus_tokens"))))
      .select($"bucket", $"total_count", $"n_tokens", $"corpus_tokens",
        ($"total_count".cast("double") / $"corpus_tokens").as("mass"),
        ($"total_count" * 64 > $"corpus_tokens").as("overloaded"))
  }

  /** Stupid-backoff bigram scoring (the web-scale LM smoothing of
    * Brants et al. 2007, "Large Language Models in Machine
    * Translation") over a pinned 3×3 probe grid:
    * S(w2|w1) = c(w1w2)/c(w1) when the bigram was observed, else
    * 0.4·c(w2)/N. Its defining property — no normalization pass — is
    * exactly what keeps it one aggregate sweep at corpus scale: the
    * bigram and unigram tables collapse map-side, are PROBE-FILTERED
    * before any join (the bm25 term-filter trick, so only
    * probe-relevant counts move), and join back onto the 9-row grid.
    * Float discipline: 0.4 = 2/5 exactly, so score·1e9 is an integer
    * `div` on BOTH branches — c12·1e9 div c1, or 2·c2·1e9 div (5·N) —
    * and no double is ever compared. */
  private def stupidBackoff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Seq("query", "join", "data")
    val probes = words.flatMap(a => words.map(b => (a, b))).toDF("w1", "w2")
    val t = tokens($"text")
    val big = Tables.documents(s, d)
      .select(explode(graft.ext.BigramPairsExpr.bigramPairs($"text"))
        .as("p"))
      .select($"p.w1".as("w1"), $"p.w2".as("w2"))
      .filter($"w1".isInCollection(words) && $"w2".isInCollection(words))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val tok = Tables.documents(s, d)
      .select(explode(t).as("w")).filter($"w" =!= "")
    val uni = tok.filter($"w".isInCollection(words))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val n = tok.agg(count(lit(1)).as("n_tokens"))
    probes
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.select($"w".as("w1"), $"c".as("c1")), Seq("w1"), "left")
      .join(uni.select($"w".as("w2"), $"c".as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(n))
      .select($"w1", $"w2",
        coalesce($"c12", lit(0L)).as("c12"),
        coalesce($"c1", lit(0L)).as("c1"),
        coalesce($"c2", lit(0L)).as("c2"),
        $"n_tokens", $"c12".isNull.as("backed_off"))
      .withColumn("score_e9",
        when(!$"backed_off", expr("(c12 * 1000000000L) div c1"))
          .otherwise(expr("(2 * c2 * 1000000000L) div (5 * n_tokens)")))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing KenLM ships, i.e. what a real pretraining perplexity
    * filter runs) over the q_stupid_backoff probe grid:
    *   p_KN(w2|w1) = max(c12 − D, 0)/c1
    *               + D·N1+(w1·)/c1 · N1+(·w2)/N1+(··)
    * with absolute discount D = 3/4 — chosen EXACTLY so every term is
    * a rational of integers: term1 = max(4·c12−3, 0)/(4·c1) and the
    * continuation probability Pcont(w2) = N1+(·w2)/N1+(··). Scores
    * land on the 1e-9 grid via positive-operand integer divisions
    * only (two-step for term2 so no product exceeds int64:
    * pcont_e9 first, then (3·n1w1·pcont_e9) div (4·c1)) — bit-exact
    * in both engines, no doubles anywhere.
    *
    * Shape at scale (the q_bm25/q_stupid_backoff probe-filter trick):
    * the corpus bigram table comes from the registry-cached doc-bigram
    * aggregate shared with q_perplexity/q_pmi_terms; the c1/N1+(w1·)
    * and N1+(·w2) rollups are PROBE-FILTERED before aggregation so
    * only probe-relevant counts shuffle; N1+(··) is one broadcast
    * scalar. Everything joins back onto the 9-row grid broadcast. */
  private def kneserNey(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Seq("query", "join", "data")
    val probes = words.flatMap(a => words.map(b => (a, b))).toDF("w1", "w2")
    val big = lmBigrams(s, d)
    val left = big.filter($"w1".isInCollection(words))
      .groupBy($"w1")
      .agg(sum($"c12").as("c1"), count(lit(1)).as("n1w1"))
    val right = big.filter($"w2".isInCollection(words))
      .groupBy($"w2").agg(count(lit(1)).as("n1w2"))
    val nt = big.agg(count(lit(1)).as("n_types"))
    probes
      .join(big.filter($"w1".isInCollection(words)
        && $"w2".isInCollection(words)), Seq("w1", "w2"), "left")
      .join(left, Seq("w1"), "left")
      .join(right, Seq("w2"), "left")
      .crossJoin(broadcast(nt))
      .select($"w1", $"w2",
        coalesce($"c12", lit(0L)).as("c12"),
        coalesce($"c1", lit(0L)).as("c1"),
        coalesce($"n1w1", lit(0L)).as("n1w1"),
        coalesce($"n1w2", lit(0L)).as("n1w2"),
        $"n_types")
      .withColumn("pcont_e9",
        expr("(n1w2 * 1000000000L) div n_types"))
      .withColumn("score_e9", expr("""
        CASE WHEN c1 > 0
             THEN (greatest(4 * c12 - 3, 0L) * 1000000000L) div (4 * c1)
                + (3 * n1w1 * pcont_e9) div (4 * c1)
        END"""))
  }

  /** Data-mixing weights: per-language sampling weight that would
    * rebalance the corpus to a uniform language mixture —
    * weight(l) = target_share / actual_share. The shape every
    * training-mix rebalancer needs: one tiny groupBy, totals joined
    * back as a broadcast scalar (never a driver-side collect), weights
    * then drive sampleBy/weighted-sample downstream. */
  private def mixtureWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byLang = Tables.documents(s, d)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val tot = byLang.agg(sum($"n").as("tot_n"),
      count(lit(1)).as("n_langs"))
    byLang.crossJoin(broadcast(tot))
      .select($"lang", $"n",
        round($"n" / $"tot_n", 4).as("actual_share"),
        round((lit(1.0) / $"n_langs") / ($"n" / $"tot_n"), 4)
          .as("weight"))
  }

  /** Temperature-based sampling weights per (source, language) — the
    * multilingual-pretraining rebalance (XLM-R / mT5 style): sampling
    * probability ∝ p^α flattens the corpus distribution so
    * low-resource slices are seen more often without fully leveling
    * them (α = 1 keeps natural proportions, α = 0 is uniform —
    * [[mixtureWeights]]' target). α is fixed at 1/2 because p^(1/2)
    * is sqrt — the ONE power IEEE 754 requires correctly rounded, so
    * unlike exp(α·ln p) the weight is bit-identical in every engine;
    * the normalizing T^α cancels in the ratio and never needs
    * computing. Token counts are exact BIGINTs from one
    * map-side-combinable aggregate; per-group sqrt floors to an e3
    * grid BEFORE the integer normalization so the group sum is
    * order-independent; p/q shares and the boost q/p are exact
    * integer divisions (ppm / e3 grids), the token total carried
    * through DECIMAL(38,0)/HUGEINT because toks·1e6 overflows int64
    * at real corpus sizes. |sources×langs| rows out. */
  private def alphaSampling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bySrc = Tables.documents(s, d)
      .select($"source", $"lang",
        size(split($"text", "\\s+")).cast("long").as("toks"))
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("toks"))
      .withColumn("w_e3",
        floor(sqrt($"toks".cast("double")) * lit(1000.0)))
    val tot = bySrc.agg(sum($"toks").as("tot_toks"),
      sum($"w_e3").as("tot_w_e3"))
    bySrc.crossJoin(broadcast(tot))
      .select($"source", $"lang", $"n_docs", $"toks", $"w_e3",
        expr("CAST(CAST(toks AS DECIMAL(38,0)) * 1000000" +
          " div tot_toks AS BIGINT)").as("p_ppm"),
        expr("w_e3 * 1000000 div tot_w_e3").as("q_ppm"))
      .withColumn("boost_e3",
        when($"p_ppm" > 0, expr("q_ppm * 1000 div p_ppm")))
  }

  /** Flesch readability rollup per (lang, source) — the classic
    * surface-form readability pair (Flesch Reading Ease + the
    * Flesch–Kincaid grade) computed corpus-side as a data-quality
    * facet: word counts from the whitespace split, sentences from
    * punctuation runs (floored at 1 per document so unpunctuated docs
    * count as one long sentence, the honest worst case), syllables by
    * the standard vowel-group proxy ([aeiouy]+ runs — deterministic,
    * language-blind, and what every fast readability library ships).
    * All three counts are per-row regexp_count integers summed in ONE
    * map-side-combinable aggregate; the two formulas are short
    * identical double expressions over the exact group sums
    * (micro-averaged: ratios of sums, not means of ratios), floored
    * to e3. |langs×sources| rows out at any corpus size. */
  private def readability(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"lang", $"source",
        size(split($"text", "\\s+")).cast("long").as("w"),
        greatest(expr("regexp_count(text, '[.!?]+')").cast("long"),
          lit(1L)).as("sents"),
        expr("regexp_count(lower(text), '[aeiouy]+')").cast("long")
          .as("syl"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"w").as("words"),
        sum($"sents").as("sents"), sum($"syl").as("syllables"))
      .withColumn("fre_e3", floor((lit(206.835)
        - lit(1.015) * $"words" / $"sents"
        - lit(84.6) * $"syllables" / $"words") * lit(1000.0)))
      .withColumn("fk_grade_e3", floor((lit(0.39) * $"words" / $"sents"
        + lit(11.8) * $"syllables" / $"words" - lit(15.59))
        * lit(1000.0)))
  }

  /** C4-style text normalization — the cleaning projection every
    * corpus pass starts with: lowercase, strip non-alphanumerics,
    * collapse whitespace runs, trim. Scan-local expressions (no
    * shuffle); the before/after char counts feed the quality-filter
    * thresholds downstream. */
  private def textNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val norm = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9 ]", " "),
      " +", " "))
    Tables.documents(s, d)
      .select($"doc_id", norm.as("norm_text"),
        length($"text").cast("long").as("chars_before"),
        length(norm).cast("long").as("chars_after"))
  }

  /** Apply the mixture weights as a DETERMINISTIC per-language sample:
    * keep-rate(lang) = min(1, budget · uniform_share / actual_share),
    * i.e. over-represented languages are down-sampled toward a uniform
    * mix at half the corpus budget, and a document survives iff its
    * id-derived uniform (same Knuth hash as q_hash_split — partition-
    * independent, rerun-stable, unlike rand()) falls under its
    * language's rate. This is the materialization step after
    * q_mixture_weights: the rebalance actually applied to rows, the
    * way a training-mix job runs it at 100 TB — a broadcast of
    * |languages| rates against a scan-stage filter, no shuffle of the
    * kept data until the audit rollup. */
  private def mixtureSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byLang = Tables.documents(s, d)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val tot = byLang.agg(sum($"n").as("tot_n"), count(lit(1)).as("n_langs"))
    val rates = byLang.crossJoin(broadcast(tot))
      .select($"lang", $"n".as("n_total"),
        least(lit(1.0),
          ($"tot_n" / $"n_langs") / $"n" * lit(0.5)).as("rate"))
    val u = (pmod($"doc_id" * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    Tables.documents(s, d)
      .select($"doc_id", $"lang", u.as("u"))
      .join(broadcast(rates), "lang")
      .groupBy($"lang")
      .agg(max($"n_total").as("n_total"),
        sum(when($"u" < $"rate", 1L).otherwise(0L)).as("n_kept"),
        round(max($"rate"), 4).as("rate"))
  }

  /** Sequence packing: assign each document to the fixed-size token
    * block (2048 here) in which its first token lands when the corpus
    * is laid out in doc_id order — the "streaming pack" that turns a
    * document set into fixed-length training sequences. The global
    * running token total comes from GlobalRank.withPrefixSum (range
    * partition + broadcast offsets), NOT an unpartitioned window —
    * a 100 TB corpus cannot cumsum through one task. */
  private def seqPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
    graft.ext.GlobalRank
      .withPrefixSum(docs, Seq($"doc_id"), $"n_tokens")
      .select($"doc_id", $"n_tokens",
        floor(($"cum" - $"n_tokens") / 2048).cast("long").as("bin"))
  }

  /** RAG/embedding-style document chunking: fixed 64-token windows
    * with a 48-token stride (16-token overlap), the unit a retrieval
    * index or a context-window packer consumes. Chunk starts are a
    * per-row `sequence` (scan-stage, no shuffle — the explode is the
    * only row amplification and it is bounded by ~nTokens/stride per
    * doc); at 100 TB this runs embarrassingly parallel and feeds the
    * embedding UDF stage directly. */
  private def docChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val chunk = 64
    val stride = 48
    val t = tokens($"text")
    val starts = sequence(lit(1),
      greatest(size(t) - lit(chunk - stride), lit(1)), lit(stride))
    Tables.documents(s, d)
      .select($"doc_id", t.as("toks"), explode(starts).as("start"))
      .select($"doc_id",
        (($"start" - 1) / stride).cast("long").as("chunk_id"),
        size(slice($"toks", $"start", lit(chunk))).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice($"toks", $"start", lit(chunk)), " ")
          .as("chunk_text"))
  }

  /** Per-document cross-entropy (nats/bigram) under the corpus's own
    * add-one-smoothed bigram LM — the KenLM-style perplexity filter a
    * pretraining pipeline uses to score fluency (low = natural, high =
    * gibberish). p(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V),
    * V = |distinct continuations w2| (the smoothed support).
    *
    * Shape at scale: doc-bigram counts and the LM's bigram counts both
    * collapse map-side before ONE shuffle each on (w1,w2); the unigram
    * table is vocabulary-sized and joins BROADCAST only while it fits
    * an executor — web-corpus vocabularies run to tens of millions of
    * rows, past any broadcast build, so above [[UnigramBroadcastCap]]
    * the join falls back to a shuffled hash join on w1 (values are
    * join-strategy-independent; a ScaleSpec case locks the equality).
    * The unigram LM is registry-cached, so the gate's count() reads
    * the materialized table rather than recomputing the LM. Vocab
    * size V is a broadcast scalar. Float discipline: p is a rational
    * of exact integers (identical correctly-rounded divide in both
    * engines), each distinct bigram's ln(p) is rounded to the 1e-6
    * grid BEFORE the per-doc decimal sum, so accumulation order can
    * never move the result (the q_feature_scale lesson). */
  private def perplexity(s: SparkSession, d: String): DataFrame =
    perplexityOn(s, d)

  /** Per-document bigram counts, registry-cached — the shared base of
    * q_perplexity / q_kneser_ney / q_pmi_terms (the token explode
    * crosses the wire once per session, not once per query). */
  private def docBigrams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.GraftCaches.getOrPersist(s, s"text.doc_bigrams:$d") {
      Tables.documents(s, d)
        .select($"doc_id",
          explode(graft.ext.BigramPairsExpr.bigramPairs($"text")).as("p"))
        .groupBy($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
        .agg(count(lit(1)).as("cnt"))
    }
  }

  /** Corpus bigram LM counts, registry-cached (r18): every consumer
    * of the LM previously re-aggregated the cached doc-bigram table —
    * q_perplexity alone ran the (w1,w2) groupBy TWICE per invocation
    * (once under the broadcast build of the scoring join, once under
    * the vocab scalar; the two subtrees differ downstream so
    * ReuseExchange never collapses them — r18 StageProbe measured both
    * passes live). |distinct bigrams| rows — vocabulary-scale, far
    * smaller than the doc-bigram table it folds. */
  private def lmBigrams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.GraftCaches.getOrPersist(s, s"text.lm_bigrams:$d") {
      docBigrams(s, d).groupBy($"w1", $"w2").agg(sum($"cnt").as("c12"))
    }
  }

  /** Rows above which the unigram LM stops being broadcast into the
    * scoring join: ~10M (string, long) rows is a few hundred MB —
    * the executor-memory comfort limit for a broadcast build. */
  val UnigramBroadcastCap = 10000000L

  private[graft] def perplexityOn(s: SparkSession, d: String,
      uniBroadcastCap: Long = UnigramBroadcastCap): DataFrame = {
    import s.implicits._
    val docBig = docBigrams(s, d)
    val lmBig = lmBigrams(s, d)
    val lmUni = graft.GraftCaches.getOrPersist(s, s"text.lm_unigrams:$d") {
      lmBig.groupBy($"w1").agg(sum($"c12").as("c1"))
    }
    val uniJoin =
      if (lmUni.count() <= uniBroadcastCap) broadcast(lmUni)
      else lmUni.hint("shuffle_hash")
    // V = the smoothed conditional's support: distinct continuations
    // w2 in the corpus bigram table. Derived from the CACHED doc-
    // bigram table — the previous all-tokens definition re-exploded
    // the whole corpus for one scalar, a second full pass per run.
    val vocab = lmBig.agg(countDistinct($"w2").as("v"))
    val lnp = round(log(($"c12" + 1).cast("double") / ($"c1" + $"v")), 6)
      .cast("decimal(18,6)")
    docBig
      .join(lmBig, Seq("w1", "w2"))
      .join(uniJoin, "w1")
      .crossJoin(broadcast(vocab))
      .select($"doc_id", $"cnt", (lnp * $"cnt").as("term"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_bigrams"),
        round(-sum($"term").cast("double") / sum($"cnt"), 4).as("xent_nats"))
  }

  /** Top collocations by pointwise mutual information —
    * pmi(w1,w2) = ln(c12·N / (c1·c2)) over corpus bigram counts, the
    * phrase-mining/tokenizer-merge-candidate primitive. Counts come
    * from the registry-cached doc-bigram table (shared with
    * q_perplexity), position-unigram totals join back BROADCAST, and
    * N is a broadcast scalar: the token stream crosses the wire once
    * per session, not per query. The pmi itself is one per-row ln of
    * a rational of exact integers — no cross-row float accumulation.
    * Min support c12 ≥ 20 keeps the rare-pair PMI blow-up out (the
    * standard collocation-mining guard), top 40 by (pmi, w1, w2) — a
    * total order, so output is deterministic. */
  private def pmiTerms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = lmBigrams(s, d)
    val left = big.groupBy($"w1").agg(sum($"c12").as("c1"))
    val right = big.groupBy($"w2").agg(sum($"c12").as("c2"))
    val n = big.agg(sum($"c12").as("nn"))
    big.join(broadcast(left), "w1").join(broadcast(right), "w2")
      .crossJoin(broadcast(n))
      .filter($"c12" >= 20)
      .select($"w1", $"w2", $"c12",
        round(log(($"c12" * $"nn").cast("double") /
          ($"c1" * $"c2").cast("double")), 4).as("pmi"))
      .orderBy($"pmi".desc, $"w1".asc, $"w2".asc)
      .limit(40)
  }

  /** Per-document token Shannon entropy — the gibberish/degenerate-
    * repetition detector (a natural doc has H near the corpus band; a
    * keyword-stuffed or copy-looped doc collapses toward 0). Terms
    * -(c/n)·ln(c/n) are per-row doubles from exact integer rationals
    * (identical in both engines), snapped to the 1e-9 grid and summed
    * per doc in DECIMAL — order-independent. Shape: token explode →
    * (doc, token) count → one doc-keyed sum; both aggregates collapse
    * map-side. */
  private def tokenEntropy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    val withN = counts.groupBy($"doc_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_distinct"))
    counts.join(withN, "doc_id")
      .select($"doc_id", $"n", $"n_distinct",
        round(($"c" / $"n") * log($"c" / $"n"), 9)
          .cast("decimal(18,9)").as("term"))
      .groupBy($"doc_id")
      .agg(max($"n").as("n_tokens"), max($"n_distinct").as("n_distinct"),
        round(-sum($"term").cast("double"), 4).as("entropy_nats"))
  }

  /** Cross-source vocabulary overlap: Jaccard between every source
    * pair's distinct-token sets — the corpus-composition diagnostic
    * (two mirrors of one crawl show up as a ≈1.0 cell). Shape at
    * scale: per-source vocabularies collapse to (source, token)
    * postings; the pair join fans out by each token's SOURCE count
    * (≤ #sources, a constant), never by document count; per-source
    * sizes join back broadcast. Jaccard is one per-row divide of
    * exact integers, rounded — no float accumulation. */
  private def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("w"))
      .distinct()
    val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("nv"))
    val inter = vocab.as("a").join(vocab.as("b"), Seq("w"))
      .filter($"a.source" < $"b.source")
      .groupBy($"a.source".as("src_a"), $"b.source".as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select($"source".as("src_a"), $"nv".as("nv_a"))),
        "src_a")
      .join(broadcast(sizes.select($"source".as("src_b"), $"nv".as("nv_b"))),
        "src_b")
      .select($"src_a", $"src_b", $"n_inter",
        round($"n_inter" / ($"nv_a" + $"nv_b" - $"n_inter"), 4)
          .as("jaccard"))
  }

  /** Vocabulary-growth (Heaps' law) curve: cumulative distinct-token
    * count vs cumulative token count as the corpus is consumed in
    * doc_id order — the tokenizer-sizing diagnostic (a vocabulary
    * that keeps growing linearly signals noise/PII; sub-linear is
    * healthy text). Each token's FIRST document comes from one
    * min-aggregate; both running totals ride GlobalRank.withPrefixSum
    * (range-partitioned prefix sum — a 100 TB corpus cannot cumsum
    * through one task), and only every 50th document is emitted.
    * Pure integer counts end to end. */
  private def vocabGrowth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("w"))
    val newPerDoc = tok.groupBy($"w").agg(min($"doc_id").as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_new"))
    val perDoc = Tables.documents(s, d)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
      .join(newPerDoc, Seq("doc_id"), "left")
      .withColumn("n_new", coalesce($"n_new", lit(0L)))
    val cumTok = graft.ext.GlobalRank
      .withPrefixSum(perDoc, Seq($"doc_id"), $"n_tokens", "cum_tokens")
    val cumBoth = graft.ext.GlobalRank
      .withPrefixSum(cumTok, Seq($"doc_id"), $"n_new", "cum_vocab")
    cumBoth.filter($"doc_id" % 50 === 0)
      .select($"doc_id", $"cum_tokens", $"cum_vocab",
        round($"cum_vocab" / $"cum_tokens", 6).as("vocab_rate"))
  }

  /** Per-language length stats — the document profiling sweep. */
  private def docProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"n_chars"), 4).as("avg_chars"),
        max(length($"text")).cast("long").as("max_len"),
        round(avg(size(tokens($"text"))), 4).as("avg_tokens"))
  }

  /** Tokenizer-fertility telemetry per language: words, BPE-ish
    * pre-tokens, and chars aggregated per lang, with the two ratios a
    * tokenizer team actually tracks — subwords-per-word ("fertility")
    * and chars-per-subword — in exact 1e4 fixed point (integer floor
    * division keeps the oracle hash byte-stable). A single map-side-
    * combining aggregate over the scan: at 100 TB this is one shuffle
    * of |langs| partial rows per task, nothing else. */
  private def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length($"text").cast("long")).as("n_chars"),
        sum(size(tokens($"text")).cast("long")).as("n_words"),
        sum(size(bpeTokens($"text")).cast("long")).as("n_bpe"))
      .select($"lang", $"n_docs", $"n_chars", $"n_words", $"n_bpe",
        expr("(n_bpe * 10000) div n_words").as("fertility_e4"),
        expr("(n_chars * 10000) div n_bpe").as("chars_per_bpe_e4"))
  }

  /** N-gram novelty rate: the share of a document's distinct 3-gram
    * shingles that occur NOWHERE else in the corpus (df = 1) — the
    * complement of the dedup/boilerplate signals: high novelty marks
    * content worth keeping, near-zero novelty marks templated text.
    * Shape: shingle-df is one partial-agg shuffle on the shingle key,
    * the df join reuses that partitioning, and the per-doc rollup is
    * the only other exchange — no all-pairs anywhere, so it scales
    * exactly like the MinHash pipeline that shares this explode.
    * Keys are the codegen [[graft.ext.ShingleHashExpr]] 64-bit shingle
    * hashes, not the joined strings: the scan drops from 5.6 s to
    * sub-second at sf0.1 (the interpreted slice+array_join walk was
    * the cost) and the df shuffle carries 8-byte keys — at 100 TB
    * that is the difference between shuffling the corpus text and
    * shuffling fixed-width hashes. df counts are identical unless
    * xxhash64 collides (≈ q²/2⁶⁵ — the same no-collision contract the
    * MinHash/LSH oracle equality already rests on). */
  private def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, d)
      .select($"doc_id", explode(Dedup.shingleHashes($"text")).as("s"))
    val df = sh.groupBy($"s").agg(count(lit(1)).as("df"))
    sh.join(df, "s")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"df" === 1, 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_shingles", $"n_novel",
        expr("(n_novel * 10000) div n_shingles").as("novelty_e4"))
  }

  /** Epoch expansion — the materialization step after the mixture
    * weights: each source's documents are REPEATED `repeats` times
    * (an integer epoch factor derived deterministically from the
    * source id here; in production it comes from the mixing solver),
    * producing the actual upsampled training mix with an `epoch`
    * column for shuffling/curriculum control downstream. The explode
    * multiplies rows by ≤4, so as with every row-amplifying operator
    * the input must already be spread across partitions (the
    * q_yelp_master_volume lesson); the audit rollup is
    * |sources|×|epochs| rows. */
  private def epochExpand(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      // digitless source names get a null extract → default to 1 epoch
      // instead of being silently dropped by explode(sequence(1, null))
      .withColumn("repeats",
        (coalesce(regexp_extract($"source", "(\\d+)", 1).cast("long"),
          lit(0L)) % 4 + 1).cast("int"))
      .withColumn("epoch", explode(sequence(lit(1), $"repeats")))
      .groupBy($"source", $"epoch".cast("long").as("epoch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens($"text")).cast("long")).as("n_tokens"))
  }

  /** T5/UL2-style span corruption: every 7th token position starting
    * at 4 opens a 2-token span (if it fits) that is replaced by a
    * `<extra_id_K>` sentinel in the input and emitted after the same
    * sentinel in the target — the standard denoising-objective data
    * transform, made deterministic (fixed stride instead of random
    * spans) so the oracle replays it exactly. Scan-local lambda
    * expressions over the token array, no shuffle: at 100 TB this
    * rides the same single-pass scan stage as normalization. */
  private def spanCorrupt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // single-pass codegen kernel (graft.ext.SpanCorruptExpr) — the
    // interpreted two-transform formulation below is the parity model
    // the oracle replays; it timed 4.5 s at sf0.1 vs ~0.3 s fused
    Tables.documents(s, d)
      .withColumn("sc", graft.ext.SpanCorruptExpr.spanCorrupt($"text"))
      .select(
        $"doc_id",
        $"sc.n_spans".as("n_spans"),
        ($"sc.n_tokens" - $"sc.n_spans").as("n_input_tokens"),
        ($"sc.n_spans" * 3).as("n_target_tokens"),
        $"sc.corrupted".as("corrupted"),
        $"sc.target".as("target"))
  }

  /** Reference formulation of [[graft.ext.SpanCorruptExpr]] via two
    * transform lambdas + flatten + array_join — identical values
    * (ScaleSpec corpus parity), interpreted execution; the DuckDB
    * oracle replays THIS shape. */
  def spanCorruptInterpreted(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    val sentinel = (i: Column) =>
      concat(lit("<extra_id_"),
        ((i - lit(4)) / lit(7)).cast("long").cast("string"), lit(">"))
    val corrParts = transform(sequence(lit(1), n), i =>
      when(i % 7 === 4 && i < n, array(sentinel(i)))
        .when(i % 7 === 5, array().cast("array<string>"))
        .otherwise(array(element_at(t, i))))
    val tgtParts = transform(sequence(lit(1), n), i =>
      when(i % 7 === 4 && i < n,
        array(sentinel(i), element_at(t, i), element_at(t, i + 1)))
        .otherwise(array().cast("array<string>")))
    val nSpans = size(filter(sequence(lit(1), n),
      i => i % 7 === 4 && i < n)).cast("long")
    struct(
      n.cast("long").as("n_tokens"),
      nSpans.as("n_spans"),
      array_join(flatten(corrParts), " ").as("corrupted"),
      array_join(flatten(tgtParts), " ").as("target"))
  }

  /** Vocabulary size for [[vocabEncode]] — cap-bounded, so the id
    * table always broadcasts. */
  val VocabEncodeSize = 256

  /** Vocabulary encoding — the tokenize-to-ids step every pretraining
    * corpus pass ends with: the top-[[VocabEncodeSize]] tokens by
    * frequency become ids 1..N (deterministic count-desc/token-asc
    * order), everything else maps to OOV id 0, and each document is
    * re-assembled into its ORDER-PRESERVING id sequence via
    * posexplode → broadcast vocab join → sort-by-position array_agg.
    * At 100 TB the vocab stays cap-bounded (broadcast), the join is
    * map-side, and the only exchange after the count is the per-doc
    * regroup — the exact shape of a distributed tokenizer run. The id
    * sequence is emitted as a space-joined string (the q_span_corrupt
    * convention) so result cells stay scalar and hash-comparable. */
  private def vocabEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val top = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok".asc).limit(VocabEncodeSize)
    val vocab = top.select($"tok",
      row_number().over(Window.orderBy($"cnt".desc, $"tok".asc))
        .cast("long").as("id"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("id", coalesce($"id", lit(0L)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"id" === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(array_sort(collect_list(struct($"pos", $"id"))),
          x => x.getField("id").cast("string")), " ").as("ids"))
  }

  /** Fill-in-the-middle (FIM) transform — the PSM-format rearrangement
    * (Bavarian et al., arXiv:2207.14255) that turns a causal-LM corpus
    * into an infilling corpus: each document's token stream splits at
    * two cut points into prefix/middle/suffix and is re-emitted as
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M`, so the model
    * learns to generate the middle conditioned on both sides. The cut
    * points derive from two independent Knuth-hash mixes of doc_id —
    * uniform over the valid splits yet exactly replayable by the
    * oracle, the same determinism move as q_hash_split /
    * q_span_corrupt. Documents under two tokens pass through with an
    * empty middle and suffix. The reassembly is one flatten +
    * array_join over slices (empty slices vanish, so the separator
    * never doubles). Pure scan-stage lambda expressions over the token
    * array — no shuffle, rides the corpus scan at any scale. */
  private def fimTransform(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    val nn = size(t).cast("long")
    val h1 = ($"doc_id" * 2654435761L) % 4294967296L
    val h2 = ($"doc_id" * 2246822519L) % 4294967296L
    Tables.documents(s, d)
      .withColumn("n", nn)
      .withColumn("a", when($"n" >= 2, h1 % ($"n" - 1) + 1).otherwise($"n"))
      .withColumn("b",
        when($"n" >= 2, $"a" + 1 + h2 % ($"n" - $"a")).otherwise($"n"))
      .select(
        $"doc_id",
        $"n".as("n_tokens"),
        $"a".as("n_prefix"),
        ($"b" - $"a").as("n_middle"),
        ($"n" - $"b").as("n_suffix"),
        array_join(flatten(array(
          array(lit("<fim_prefix>")),
          slice(t, lit(1), $"a".cast("int")),
          array(lit("<fim_suffix>")),
          slice(t, ($"b" + 1).cast("int"), ($"n" - $"b").cast("int")),
          array(lit("<fim_middle>")),
          slice(t, ($"a" + 1).cast("int"), ($"b" - $"a").cast("int")))),
          " ").as("fim"))
  }

  /** Language-ID confusion matrix — the eval loop closed over a real
    * operator: [[langId]]'s prediction scored against the corpus's
    * labeled `lang` column, emitting per-(label, predicted) cell
    * counts and each cell's share of its label row in 1e4 units. The
    * prediction is scan-stage; the matrix is |langs|²-bounded, so the
    * only exchange is one combinable aggregate, and the label-share
    * window walks those ≤36 rows. Both the Spark expression and the
    * DuckDB replay are generated from [[langStopwords]], so oracle
    * and engine can never drift. */
  private def langConfusion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"lang".as("label"), langId($"text").as("pred"))
      .groupBy($"label", $"pred")
      .agg(count(lit(1)).as("n"))
      .withColumn("label_total",
        sum($"n").over(Window.partitionBy($"label")))
      .withColumn("share_e4", expr("n * 10000 div label_total"))
  }

  private def langConfusionOracle: String = {
    val (hits, winner) = langIdSqlParts
    s"""
      WITH t AS (SELECT lang AS label,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      h AS (SELECT label,
               $hits
            FROM t),
      p AS (SELECT label, $winner AS pred FROM h),
      c AS (SELECT label, pred, count(*) AS n FROM p GROUP BY 1, 2)
      SELECT label, pred, n,
             CAST(sum(n) OVER (PARTITION BY label) AS BIGINT)
               AS label_total,
             CAST(n * 10000 // sum(n) OVER (PARTITION BY label)
               AS BIGINT) AS share_e4
      FROM c"""
  }

  /** Padding-efficiency audit — the batch-assembly cost model for
    * fixed-length training: for each candidate bucket granularity
    * (64/128/256/512 tokens) every document pads up to the next
    * multiple, and the audit reports corpus-wide padded volume plus
    * the waste fraction in 1e4 units. This is the measurement that
    * picks a sequence-packing strategy (compare [[seqPack]], which
    * eliminates the waste by packing, and q_shard_pack, which balances
    * it across shards). Exact integer arithmetic end to end; the
    * explode is over a 4-element literal array, so the plan is one
    * corpus scan + a 4-row rollup at any scale. */
  private def padWaste(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(size(tokens($"text")).cast("long").as("nt"),
        explode(array(lit(64L), lit(128L), lit(256L), lit(512L)))
          .as("bucket"))
      .withColumn("padded", expr("((nt + bucket - 1) div bucket) * bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nt").as("n_tokens"),
        sum($"padded").as("n_padded"))
      .withColumn("waste_e4",
        expr("((n_padded - n_tokens) * 10000) div n_padded"))
  }

  /** DSIR-style importance-resampling weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document for "how target-like is it" with two bag-of-
    * hashed-bigrams unigram models — target = the `lang='en'` slice,
    * raw = the whole corpus — and emit the per-document log importance
    * weight  log w(d) = Σ_b c_d[b]·(ln p_tgt[b] − ln p_raw[b])  with
    * add-one smoothing over [[DsirBuckets]] hashed buckets. This is
    * the selection score a pretraining pipeline samples against (via
    * Gumbel-top-k or the q_mixture_sample keep-rate pattern) to tilt
    * a 100 TB crawl toward a curated target domain.
    *
    * Shape at scale — the whole point of DSIR's hashed features: both
    * "models" are fixed-width bucket tables (B rows, independent of
    * corpus size), so the scoring join is a B-row BROADCAST into the
    * doc-bucket aggregate; the only corpus-sized shuffles are the two
    * map-side-combining counts on (doc_id, bucket) and (bucket). The
    * doc-bucket table is registry-cached — raw stats, target stats,
    * and scoring all read one materialization of the explode. Float
    * discipline: each bucket's two ln's (rationals of exact integers)
    * are rounded to the 1e-6 grid and subtracted in DECIMAL, so the
    * per-doc sum is order-independent (the q_perplexity pattern). */
  private def dsirWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = DsirBuckets
    val pairs = graft.ext.BigramPairsExpr.bigramPairs($"text")
    val docB = graft.GraftCaches.getOrPersist(s, s"text.dsir_docb:$d") {
      Tables.documents(s, d)
        .select($"doc_id", $"lang", explode(pairs).as("p"))
        .select($"doc_id", $"lang",
          pmod(polyHash(concat($"p.w1", lit(" "), $"p.w2"), 31L),
            lit(b.toLong)).as("bucket"))
        .groupBy($"doc_id", $"lang", $"bucket")
        .agg(count(lit(1)).as("c"))
    }
    val raw = docB.groupBy($"bucket").agg(sum($"c").as("c_r"))
    val tgt = docB.filter($"lang" === "en")
      .groupBy($"bucket").agg(sum($"c").as("c_t"))
    val stats = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_t"))
    val tots = stats.agg(sum($"c_r").as("n_r"), sum($"c_t").as("n_t"))
    val lnTgt = round(log(($"c_t" + 1).cast("double") / ($"n_t" + b)), 6)
      .cast("decimal(18,6)")
    val lnRaw = round(log(($"c_r" + 1).cast("double") / ($"n_r" + b)), 6)
      .cast("decimal(18,6)")
    val lr = stats.crossJoin(broadcast(tots))
      .select($"bucket", (lnTgt - lnRaw).as("lr"))
    docB.join(broadcast(lr), "bucket")
      .select($"doc_id", $"lang", $"c", ($"lr" * $"c").as("term"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"c").as("n_feats"),
        // the term sum is exact at 6 dp, so ×1e6 is an integer —
        // emitted as-is (a final round-to-4 landed on .5 ties and
        // diverged across engines; the q_rolling_corr lesson)
        (sum($"term") * lit(1000000)).cast("long").as("logw_e6"))
  }

  /** Hashed-feature width for [[dsirWeights]] — fixed regardless of
    * corpus size (that independence is DSIR's scalability claim; the
    * paper uses 10⁴, shrunk here so sf0.001 still populates every
    * bucket). */
  val DsirBuckets = 128

  /** Documents to keep in [[dsirSelect]]'s Gumbel-top-k. */
  val DsirSelectK = 50

  /** The resampling step that makes [[dsirWeights]] actionable:
    * Gumbel-top-k selection (Vieira 2014 / Kool et al. 2019,
    * "Stochastic Beams and Where to Find Them") draws K documents
    * WITHOUT replacement with probability ∝ exp(log w) by ranking on
    * key = log w + Gumbel(0,1) and keeping the top K. The Gumbel
    * noise is deterministic — −ln(−ln(u)) of the same Knuth-hash
    * uniform as q_hash_split/q_mixture_sample — so the draw is
    * partition-independent and rerun-stable, and it snaps to the
    * 1e-6 grid so the ranking key is an exact BIGINT.
    *
    * Shape at scale: the per-doc key is scan-stage arithmetic on top
    * of the DSIR scoring plan (which shares the registry-cached
    * doc-bucket table); the global top-K runs as TakeOrderedAndProject
    * — per-partition heaps of K rows, no global sort shuffle. (K
    * here is the training-subset budget; at a real 100 TB selection
    * K is huge, and the same key ranks via the q_curriculum_order
    * GlobalRank path instead — semantics identical, so the small-K
    * operator is the oracled one.) Tie-break doc_id ASC makes the
    * cut deterministic even at equal keys. */
  private def dsirSelect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val u = (pmod($"doc_id" * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val g = round(-log(-log(u)), 6).cast("decimal(18,6)")
    dsirWeights(s, d)
      .withColumn("gumbel_e6", (g * 1000000).cast("long"))
      .withColumn("key_e6", $"logw_e6" + $"gumbel_e6")
      .orderBy($"key_e6".desc, $"doc_id".asc)
      .limit(DsirSelectK)
      .select($"doc_id", $"lang", $"logw_e6", $"gumbel_e6", $"key_e6")
  }

  private def dsirOracleBase: String = s"""
      WITH tk AS (SELECT doc_id, lang,
                         string_split_regex(lower(text), '\\s+') AS toks
                  FROM documents),
      pairs AS (SELECT doc_id, lang,
                       unnest([toks[i] || ' ' || toks[i+1]
                               for i in range(1, len(toks))]) AS bg
                FROM tk WHERE len(toks) >= 2),
      db AS (SELECT doc_id, lang,
                    ${polyHashSql("bg", 31L)} % $DsirBuckets AS bucket,
                    count(*) AS c
             FROM pairs GROUP BY 1, 2, 3),
      raw AS (SELECT bucket, sum(c) AS c_r FROM db GROUP BY 1),
      tgt AS (SELECT bucket, sum(c) AS c_t FROM db
              WHERE lang = 'en' GROUP BY 1),
      st AS (SELECT r.bucket, r.c_r, coalesce(t.c_t, 0) AS c_t
             FROM raw r LEFT JOIN tgt t USING (bucket)),
      tot AS (SELECT sum(c_r) AS n_r, sum(c_t) AS n_t FROM st),
      lr AS (SELECT bucket,
                    CAST(round(ln((c_t + 1) * 1.0 / (n_t + $DsirBuckets)),
                               6) AS DECIMAL(18,6))
                  - CAST(round(ln((c_r + 1) * 1.0 / (n_r + $DsirBuckets)),
                               6) AS DECIMAL(18,6)) AS lr
             FROM st, tot)
      SELECT db.doc_id, db.lang, CAST(sum(db.c) AS BIGINT) AS n_feats,
             CAST(sum(lr.lr * db.c) * 1000000 AS BIGINT) AS logw_e6
      FROM db JOIN lr USING (bucket)
      GROUP BY 1, 2"""

  /** The deny-list of [[toxicityBlocklist]] and the leet-fold map —
    * stand-in policy terms chosen from the corpus vocabulary (the
    * OPERATOR is the deliverable: a real deployment swaps the list).
    * Leet map: the standard digit/symbol→letter folds, applied BEFORE
    * matching so obfuscated spellings ("sl0w", "b1g") still hit. */
  val ToxTerms: Seq[String] = Seq("slow", "crash", "big")
  val LeetFrom = "013457@$"
  val LeetTo = "oieastas"

  /** Content-safety deny-list filter — the moderation gate every
    * training-data pipeline runs before tokenization (the C4/Gopher
    * pipelines both document a blocklist pass): normalize
    * (lowercase + leet-fold via one `translate`), then count
    * SUBSTRING occurrences of each deny-term (the X5 substring-
    * containment convention from the super-category CASE) via the
    * exact (len − len(replace))/len(term) identity — no regex, no
    * tokenization dependency, codegen-friendly. Emits per-doc hit
    * totals, distinct-term hits, and the flag (any hit). Shape: pure
    * scan-local map over the corpus — zero shuffles beyond the sink;
    * the 100 TB shape is the scan itself. */
  private def toxicityBlocklist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hitsLit = ToxTerms.map { t =>
      expr(s"cast((length(translate(lower(text), '$LeetFrom', '$LeetTo'))" +
        s" - length(replace(translate(lower(text), '$LeetFrom'," +
        s" '$LeetTo'), '$t', ''))) div ${t.length} as bigint)")
    }
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        hitsLit.reduce(_ + _).as("tox_hits"),
        hitsLit.map(h => when(h > 0, 1L).otherwise(0L))
          .reduce(_ + _).as("n_terms_hit"))
      .withColumn("flagged", $"tox_hits" > 0)
  }

  /** Hapax-legomena profile per source: vocabulary size, tokens,
    * hapax count (words occurring EXACTLY once within the source),
    * hapax share of vocabulary and type-token ratio, both e6 fixed
    * point. The vocabulary-concentration lens [[vocabGrowth]]'s
    * Heaps-curve checkpoints don't give: a source whose hapax share
    * collapses is templated/duplicated text even when its vocab size
    * looks healthy. Shape: one (source, word) rollup — the same
    * single shuffle as the vocab queries — then a \|sources\|-row
    * aggregate. */
  private def hapaxProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(count(lit(1)).as("vocab"),
        sum($"c").as("n_tokens"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select($"source", $"vocab", $"n_tokens", $"n_hapax",
        expr("n_hapax * 1000000 div vocab").as("hapax_share_e6"),
        expr("vocab * 1000000 div n_tokens").as("ttr_e6"))
  }

  /** Number of (smallest) count-classes emitted by [[goodTuring]]. */
  val GtClasses = 10L

  /** Good–Turing frequency re-estimation over the corpus unigram
    * counts (Good 1953) — the SMOOTHING view the LM battery lacked:
    * [[kneserNey]] discounts with a fixed D, Good–Turing derives the
    * adjusted count r* = (r+1)·N_{r+1}/N_r from the frequency-of-
    * frequencies table itself, and N_1/N is Good's estimate of the
    * UNSEEN mass (the probability the next token is a new word).
    * Exact: N_r are integers, r* emits as one e6 truncating division
    * (0 when N_{r+1} = 0 — the classic sparse-tail gap the smoothed
    * variants interpolate; emitting the raw gap keeps the oracle
    * exact). Emits the [[GtClasses]] SMALLEST observed count-classes
    * (the tail GT actually re-estimates) — an absolute r ≤ 10 cut is
    * vocabulary-dependent and empty on dense corpora. Shape: word
    * rollup → count histogram (≤ |distinct counts| ≲ √tokens rows) →
    * rank + self-join on r+1 over that tiny table. */
  private def goodTuring(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val fof = counts.groupBy($"c").agg(count(lit(1)).as("n_r"))
    val tot = counts.agg(sum($"c").as("n_tokens"),
      sum(when($"c" === 1, 1L).otherwise(0L)).as("f1"))
    fof.withColumn("rk", row_number().over(W.orderBy($"c".asc)))
      .filter($"rk" <= GtClasses).drop("rk")
      .join(fof.select(($"c" - 1).as("c"), $"n_r".as("n_r_next")),
        Seq("c"), "left")
      .crossJoin(broadcast(tot))
      .select($"c".as("r"), $"n_r",
        coalesce($"n_r_next", lit(0L)).as("n_r_next"),
        expr("(r + 1) * coalesce(n_r_next, 0) * 1000000 div n_r")
          .as("r_star_e6"),
        expr("f1 * 1000000 div n_tokens").as("p_unseen_e6"))
  }

  /** Merge rounds learned by [[bpeTrain]]. */
  val BpeMerges = 8
  /** End-of-word marker symbol (Sennrich et al. 2016, arXiv
    * 1508.07909: the marker makes merges word-internal and lets the
    * learned vocab distinguish suffixes from prefixes). */
  val BpeEow = "</w>"

  /** REAL distributed BPE merge-pair training (Sennrich et al. 2016)
    * — not the [[bpeTokens]] pre-tokenizer stand-in: words split to
    * character symbols plus [[BpeEow]], then [[BpeMerges]] unrolled
    * rounds each (1) count adjacent symbol pairs weighted by word
    * frequency, (2) take the global argmax pair (ties broken
    * lexicographically — a total order, so training is fully
    * deterministic), and (3) splice that pair left-to-right
    * non-overlapping in every word via an aggregate() fold (after a
    * merge the new symbol becomes the fold's last element, which is
    * exactly the non-overlap rule). Output: the k learned merge
    * rules with their pair counts — the tokenizer-training artifact.
    *
    * Scale shape: the ONLY corpus-sized pass is the initial word
    * count; everything after runs on the |vocab| word-frequency
    * table (Heaps-sublinear). Per round: one pair explode bounded by
    * total vocab characters, a map-side-combined pair aggregate, a
    * TakeOrderedAndProject argmax (never a global sort), and a
    * broadcast-1-row merge projection. Round tables LOCALCHECKPOINT
    * (lineage truncation, not just persist): each is read twice
    * (pair count + next merge), so the unrolled DAG re-expands 2^k
    * times otherwise — and at k = 8 even RENDERING the shared tree
    * (InMemoryRelation prints its cached plan per reference) is
    * exponential and OOMs the driver. On a real cluster the same
    * slot is a reliable checkpoint dir — the standard iterative-
    * algorithm discipline. */
  /** The per-word merge splice of [[bpeTrain]] as a SQL expression
    * over columns (syms, l, r): a fold whose accumulator's LAST
    * element is compared against l, so a just-merged symbol cannot
    * immediately re-merge — exactly greedy left-to-right
    * non-overlapping replacement (ScaleSpec pins the a,a,a parity
    * case). */
  val BpeMergeFoldSql: String =
    "aggregate(slice(syms, 2, size(syms) - 1), slice(syms, 1, 1)," +
      " (acc, x) -> if(element_at(acc, -1) = l AND x = r," +
      " concat(slice(acc, 1, size(acc) - 1), array(concat(l, r)))," +
      " concat(acc, array(x))))"

  /** The shared training chain: (final symbolized vocabulary after
    * all [[BpeMerges]] rounds — still keyed by the surface word — and
    * the per-round winning pairs). Session-cached per round via
    * [[graft.GraftCaches.getOrBuild]] (the checkpointed frames
    * self-materialize; an added persist would double-store), so
    * q_bpe_train and q_bpe_encode run ONE training chain per
    * session. */
  private def bpeTables(s: SparkSession, d: String)
      : (DataFrame, Seq[DataFrame]) = {
    import s.implicits._
    var words = graft.GraftCaches.getOrBuild(s, s"text.bpe_w0:$d") {
      Tables.documents(s, d)
        .select(explode(tokens($"text")).as("w"))
        .filter($"w" =!= "")
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .select($"w",
          concat(split($"w", ""), array(lit(BpeEow))).as("syms"),
          $"cnt")
        .localCheckpoint()
    }
    val bests = (1 to BpeMerges).map { i =>
      val prev = words
      val best = graft.GraftCaches.getOrBuild(s, s"text.bpe_b$i:$d") {
        prev.select(explode(expr(BpePairsSql)).as("p"), $"cnt")
          .groupBy($"p.l".as("l"), $"p.r".as("r"))
          .agg(sum($"cnt").as("pc"))
          .orderBy($"pc".desc, $"l".asc, $"r".asc).limit(1)
          .localCheckpoint()
      }
      words = graft.GraftCaches.getOrBuild(s, s"text.bpe_w$i:$d") {
        prev.crossJoin(broadcast(best))
          .select($"w", expr(BpeMergeFoldSql).as("syms"), $"cnt")
          .localCheckpoint()
      }
      best
    }
    (words, bests)
  }

  private def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeTables(s, d)._2.zipWithIndex.map { case (best, i0) =>
      best.select(lit((i0 + 1).toLong).as("round"), $"l".as("left_sym"),
        $"r".as("right_sym"), $"pc".as("pair_count"))
    }.reduce(_ unionByName _)
  }

  /** APPLY the trained tokenizer (the train→encode composition a real
    * pipeline runs): every document's whitespace words join the
    * trained vocabulary's subword counts, giving per-document token
    * counts under the learned BPE and the fertility (subwords per
    * word, e3) — the capacity-planning number tokenizer changes move.
    * The join is a broadcast of the Heaps-sublinear vocabulary; the
    * corpus never shuffles (per-doc rollup collapses map-side). */
  private def bpeEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = bpeTables(s, d)._1
      .select($"w", size($"syms").cast("long").as("n_subwords"))
    Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("w"))
      .filter($"w" =!= "")
      .join(broadcast(vocab), "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_subwords").as("n_tokens"))
      .select($"doc_id", $"n_words", $"n_tokens",
        expr("n_tokens * 1000 div n_words").as("fertility_e3"))
  }

  /** Chained-CTE DuckDB replay of [[bpeTrain]] (the labelPropOracle
    * unrolled-rounds discipline): per round, a struct unnest over the
    * adjacent-pair index range + the same totally-ordered argmax + a
    * list_reduce fold whose space-joined string accumulator gates the
    * identical left-to-right non-overlapping splice (the accumulator's
    * LAST symbol is compared, so a just-merged symbol can't re-merge —
    * same rule as the Spark aggregate() fold). Safe because document
    * tokens are [a-z]+ (regexp_replace's replacement carries no escape
    * metacharacters). */
  /** Shared chained CTEs through the full training run (w0…b_k, w_k),
    * word identity retained so the encode oracle can join back. */
  private def bpeOracleCtes: String = {
    val eos = "$" // RE2 end anchor, kept out of the interpolation
    val base = s"""
      WITH toks AS (SELECT lower(unnest(string_split_regex(text,
                      '\\s+'))) AS w
                    FROM documents),
      w0 AS (SELECT w,
                    list_append(string_split(w, ''), '$BpeEow') AS syms,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM toks WHERE w <> '' GROUP BY w)"""
    val rounds = (1 to BpeMerges).map { i =>
      s""",
      p$i AS (SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS pc
              FROM (SELECT unnest(list_transform(range(1, len(syms)),
                        j -> struct_pack(l := syms[j], r := syms[j+1])))
                      AS p, cnt
                    FROM w${i - 1}) GROUP BY 1, 2),
      b$i AS (SELECT l, r, pc FROM p$i
              ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
      w$i AS (SELECT w, string_split(list_reduce(syms, (acc, x) ->
                CASE WHEN regexp_extract(acc, '[^ ]*$eos') = b.l
                          AND x = b.r
                     THEN regexp_replace(acc, '[^ ]*$eos', b.l || b.r)
                     ELSE acc || ' ' || x END), ' ') AS syms, cnt
              FROM w${i - 1} CROSS JOIN b$i AS b)"""
    }.mkString
    s"$base$rounds"
  }

  /** Merges per batched round, rounds, and candidate-pool bound for
    * [[bpeTrainBatch]] (VERDICT r14 #3). 6 rounds × up to 4 merges =
    * 24 merges in 6 Spark rounds, where the sequential trainer needs
    * 24 — a 4× round cut, and the cut is what scales: one-winner-
    * per-round is O(V) sequential jobs, unusable at the ~32 k merges
    * a production tokenizer learns. */
  val BpeBatchM = 4
  val BpeBatchRounds = 6
  /** Top-of-the-pair-count candidate pool each round's selection fold
    * walks (a TakeOrderedAndProject bound — the fold never sees more
    * than this many pairs, so selection is O(C·M) per round). */
  val BpeBatchC = 32

  /** Adjacent-pair struct explode shared by the sequential and batch
    * trainers. The size guard matters once enough merges are learned
    * that a whole word collapses to ONE symbol (the batch trainer's
    * 24 merges reach this on the fixture): Spark's
    * sequence(1, 0) is DESCENDING [1, 0], not empty, so the unguarded
    * transform would index past a 1-element array. */
  private val BpePairsSql: String =
    "if(size(syms) < 2, array()," +
      " transform(sequence(1, size(syms) - 1)," +
      " j -> struct(element_at(syms, j) as l," +
      " element_at(syms, j + 1) as r)))"

  /** Greedy batch selection over `cands` (array<struct<npc,l,r>>,
    * sorted ascending = pair count DESC, l, r — the sequential
    * trainer's exact total order): take up to [[BpeBatchM]] pairs,
    * SKIPPING any that interacts with an already-selected rule. Two
    * rules may be applied in the same pass iff the application is
    * order-independent, which needs more care than "no shared
    * symbol" (that is both too strong and too weak):
    *   - y.r = x.l or y.l = x.r (chaining: one rule consumes a token
    *     the other matches — "a b c" under (a,b),(b,c) depends on
    *     order) — EXCLUDED;
    *   - a rule whose symbol IS another's concatenation (x matches
    *     tokens y creates, or vice versa) — EXCLUDED, both ways,
    *     plus equal concatenations;
    *   - same-side sharing (y.l = x.l or y.r = x.r) is SAFE: one
    *     token instance has one right neighbor, so the two rules'
    *     match sites are disjoint — e.g. (e,r) and (e,</w>) co-merge
    *     exactly as they would sequentially (ScaleSpec pins this).
    * First candidate always selects (it is the round's argmax — the
    * same pair the sequential trainer would take). */
  def bpeSelectSql(cap: Int): String =
    s"""aggregate(cands,
       cast(array() as array<struct<l:string,r:string,pc:bigint>>),
       (acc, x) -> if(size(acc) >= $cap, acc,
         if(exists(acc, y -> y.r = x.l or y.l = x.r
             or concat(y.l, y.r) = x.l or concat(y.l, y.r) = x.r
             or concat(x.l, x.r) = y.l or concat(x.l, x.r) = y.r
             or concat(x.l, x.r) = concat(y.l, y.r)), acc,
           concat(acc, array(named_struct(
             'l', x.l, 'r', x.r, 'pc', -x.npc))))))"""
  val BpeBatchSelectSql: String = bpeSelectSql(BpeBatchM)

  /** Multi-rule variant of [[BpeMergeFoldSql]]: one greedy
    * left-to-right pass applying ALL of the round's rules (columns:
    * syms, rules array<struct<l,r>>). At most one rule matches any
    * (last, x) — rules are keyed by their (l, r) pair — and because
    * co-selected rules are non-interacting (see
    * [[BpeBatchSelectSql]]) the single simultaneous pass produces
    * exactly what applying the rules one-per-pass in rank order
    * would (ScaleSpec replays that equivalence on the fixture). */
  val BpeBatchFoldSql: String =
    "aggregate(slice(syms, 2, size(syms) - 1), slice(syms, 1, 1)," +
      " (acc, x) -> if(exists(rules, rr -> element_at(acc, -1) = rr.l" +
      " and x = rr.r)," +
      " concat(slice(acc, 1, size(acc) - 1)," +
      " array(concat(element_at(acc, -1), x)))," +
      " concat(acc, array(x))))"

  /** BATCHED BPE training (VERDICT r14 #3): per round, ONE pair-count
    * aggregate selects up to [[BpeBatchM]] mutually non-interacting
    * merge rules (top-[[BpeBatchC]] candidates collapse to a single
    * sorted array; the selection fold walks it — no driver collect,
    * no per-winner job), then ONE broadcast applies all of them in a
    * single greedy pass. Round 1's selection provably coincides with
    * the sequential chain's first selections as long as they are
    * mutually non-interacting — on the fixture, batch round 1 ==
    * q_bpe_train merges 1–4 and the post-round-1 vocabulary equals
    * the sequential chain's post-round-4 vocabulary exactly
    * (ScaleSpec asserts both); later rounds may diverge from
    * sequential order where a created pair outranks a base pair —
    * the standard batched-BPE semantics, replayed exactly by the
    * chained-CTE DuckDB oracle. Scale: rounds shrink ~M×, and each
    * round is the same corpus-independent |vocab|-table work as the
    * sequential trainer. */
  private def bpeBatchTables(s: SparkSession, d: String)
      : (DataFrame, Seq[DataFrame]) = {
    import s.implicits._
    var words = graft.GraftCaches.getOrBuild(s, s"text.bpeb_w0:$d") {
      Tables.documents(s, d)
        .select(explode(tokens($"text")).as("w"))
        .filter($"w" =!= "")
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .select($"w",
          concat(split($"w", ""), array(lit(BpeEow))).as("syms"),
          $"cnt")
        .localCheckpoint()
    }
    val sels = (1 to BpeBatchRounds).map { i =>
      val prev = words
      val rules = graft.GraftCaches.getOrBuild(s, s"text.bpeb_b$i:$d") {
        prev.select(explode(expr(BpePairsSql)).as("p"), $"cnt")
          .groupBy($"p.l".as("l"), $"p.r".as("r"))
          .agg(sum($"cnt").as("pc"))
          .orderBy($"pc".desc, $"l".asc, $"r".asc).limit(BpeBatchC)
          .agg(sort_array(collect_list(struct(
            (-$"pc").as("npc"), $"l", $"r"))).as("cands"))
          .select(posexplode(expr(BpeBatchSelectSql)))
          .select(($"pos" + 1).cast("long").as("rank"),
            $"col.l".as("l"), $"col.r".as("r"), $"col.pc".as("pc"))
          .localCheckpoint()
      }
      words = graft.GraftCaches.getOrBuild(s, s"text.bpeb_w$i:$d") {
        val ruleList = rules
          .agg(collect_list(struct($"l", $"r")).as("rules"))
        prev.crossJoin(broadcast(ruleList))
          .select($"w", expr(BpeBatchFoldSql).as("syms"), $"cnt")
          .localCheckpoint()
      }
      rules
    }
    (words, sels)
  }

  private def bpeTrainBatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeBatchTables(s, d)._2.zipWithIndex.map { case (rules, i0) =>
      rules.select(lit((i0 + 1).toLong).as("round"), $"rank",
        $"l".as("left_sym"), $"r".as("right_sym"),
        $"pc".as("pair_count"))
    }.reduce(_ unionByName _)
  }

  /** [[bpeBatchTables]]'s final symbolized vocabulary, exposed for
    * the ScaleSpec fixture equality against the sequential chain. */
  private[scale] def bpeBatchFinalVocab(s: SparkSession, d: String)
      : DataFrame = bpeBatchTables(s, d)._1
  /** Sequential twin accessor, same purpose. */
  private[scale] def bpeSequentialFinalVocab(s: SparkSession, d: String)
      : DataFrame = bpeTables(s, d)._1
  /** Sequential merge table accessor for the ScaleSpec round-1
    * prefix-equality assertion. */
  private[scale] def bpeSequentialMerges(s: SparkSession, d: String)
      : Seq[DataFrame] = bpeTables(s, d)._2

  /** Chained-CTE DuckDB replay of [[bpeTrainBatch]] — the sequential
    * oracle's discipline extended with a string-accumulator
    * list_reduce for the greedy selection (DuckDB's list_reduce is
    * element-typed, so selected rules serialize as 'l r pc' records
    * joined by chr(30); the first element auto-seeds the fold =
    * greedy always takes the argmax, matching Spark's empty-array
    * fold) and a list_filter rule probe inside the word fold. */
  private def bpeBatchOracleCtes: String = {
    val eos = "$"
    val conflict = """len(list_filter(string_split(acc, chr(30)), s ->
              split_part(s, ' ', 2) = split_part(x, ' ', 1)
           OR split_part(s, ' ', 1) = split_part(x, ' ', 2)
           OR split_part(s, ' ', 1) || split_part(s, ' ', 2)
              = split_part(x, ' ', 1)
           OR split_part(s, ' ', 1) || split_part(s, ' ', 2)
              = split_part(x, ' ', 2)
           OR split_part(x, ' ', 1) || split_part(x, ' ', 2)
              = split_part(s, ' ', 1)
           OR split_part(x, ' ', 1) || split_part(x, ' ', 2)
              = split_part(s, ' ', 2)
           OR split_part(x, ' ', 1) || split_part(x, ' ', 2)
              = split_part(s, ' ', 1) || split_part(s, ' ', 2))) > 0"""
    val base = s"""
      WITH toks AS (SELECT lower(unnest(string_split_regex(text,
                      '\\s+'))) AS w
                    FROM documents),
      bw0 AS (SELECT w,
                    list_append(string_split(w, ''), '$BpeEow') AS syms,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM toks WHERE w <> '' GROUP BY w)"""
    val rounds = (1 to BpeBatchRounds).map { i =>
      s""",
      p$i AS (SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS pc
              FROM (SELECT unnest(list_transform(range(1, len(syms)),
                        j -> struct_pack(l := syms[j], r := syms[j+1])))
                      AS p, cnt
                    FROM bw${i - 1}) GROUP BY 1, 2),
      c$i AS (SELECT list(l || ' ' || r || ' ' || pc
                          ORDER BY pc DESC, l ASC, r ASC) AS cs
              FROM (SELECT l, r, pc FROM p$i
                    ORDER BY pc DESC, l ASC, r ASC LIMIT $BpeBatchC)),
      s$i AS (SELECT string_split(list_reduce(cs, (acc, x) -> CASE
                 WHEN len(string_split(acc, chr(30))) >= $BpeBatchM
                   THEN acc
                 WHEN $conflict THEN acc
                 ELSE acc || chr(30) || x END), chr(30)) AS sel
              FROM c$i),
      bb$i AS (SELECT CAST(rank AS BIGINT) AS rank,
                      split_part(s, ' ', 1) AS l,
                      split_part(s, ' ', 2) AS r,
                      CAST(split_part(s, ' ', 3) AS BIGINT) AS pc
               FROM (SELECT unnest(sel) AS s,
                            unnest(range(1, len(sel) + 1)) AS rank
                     FROM s$i)),
      rl$i AS (SELECT list(struct_pack(l := l, r := r)) AS rules
               FROM bb$i),
      bw$i AS (SELECT w, string_split(list_reduce(syms, (acc, x) -> CASE
                  WHEN len(list_filter(rules, rr ->
                         regexp_extract(acc, '[^ ]*$eos') = rr.l
                         AND x = rr.r)) > 0
                  THEN regexp_replace(acc, '[^ ]*$eos',
                         regexp_extract(acc, '[^ ]*$eos') || x)
                  ELSE acc || ' ' || x END), ' ') AS syms, cnt
               FROM bw${i - 1} CROSS JOIN rl$i)"""
    }.mkString
    s"$base$rounds"
  }

  private def bpeTrainBatchOracle: String = {
    val sel = (1 to BpeBatchRounds).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS round, rank, l AS left_sym,
             r AS right_sym, pc AS pair_count FROM bb$i""")
      .mkString("\n      UNION ALL\n      ")
    s"$bpeBatchOracleCtes\n      $sel"
  }

  /** Candidate pool and round count for [[bpeTrainLarge]] (VERDICT
    * r15 #1 — scale BPE training past toy merge counts). The
    * whitespace-word fixture vocabulary is 31 words / 138 total
    * characters: a HARD ceiling of 138 learnable merges, so a
    * ≥256-merge run needs a richer unit inventory, not more rounds.
    * The large trainer therefore trains over word BIGRAMS — adjacent
    * token pairs joined by an explicit '_' boundary symbol (the
    * SentencePiece move of making the word boundary an ordinary
    * symbol, Kudo & Richardson 2018 arXiv:1808.06226, bounded to
    * 2-grams so the unit table stays |V|²-capped) — lifting the
    * fixture inventory to 916 units / ~10 k merge headroom, and
    * letting the learned vocab contain cross-word tokens ("the_key")
    * exactly as byte-level production tokenizers do. */
  val BpeLargeC = 96
  val BpeLargeRounds = 8

  /** LARGE-SCALE batched BPE training: per round, select ALL
    * mutually non-interacting pairs among the top-[[BpeLargeC]]
    * candidates ([[bpeSelectSql]] with cap = pool size, so the
    * [[BpeBatchM]]-style cap never binds — the non-interaction rule
    * alone decides batch width) and apply them in one simultaneous
    * greedy pass. On the fixture this trains 466–480 merges in 8
    * rounds (min 24 per round across all three SFs) — the
    * one-winner-per-round sequential trainer would need ~470 Spark
    * rounds for the same vocab; at a production ~32 k-merge budget
    * the same all-safe-pairs selection keeps round count O(merges /
    * batch-width) with each round one |vocab|-table aggregate, which
    * is what makes BPE training feasible as a distributed plan at
    * 100 TB corpus scale (the pair-count aggregate is the only
    * corpus-sized job, and only in round 0's unit build). */
  private def bpeLargeTables(s: SparkSession, d: String)
      : (DataFrame, Seq[DataFrame]) = {
    import s.implicits._
    var words = graft.GraftCaches.getOrBuild(s, s"text.bpel_w0:$d") {
      val ts = filter(tokens($"text"), t => t =!= "")
      val n1 = greatest(size(ts) - 1, lit(0))
      Tables.documents(s, d)
        .select(explode(zip_with(
          slice(ts, lit(1), n1), slice(ts, lit(2), n1),
          (a, b) => concat(a, lit("_"), b))).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .select($"w",
          concat(split($"w", ""), array(lit(BpeEow))).as("syms"),
          $"cnt")
        .localCheckpoint()
    }
    val sels = (1 to BpeLargeRounds).map { i =>
      val prev = words
      val rules = graft.GraftCaches.getOrBuild(s, s"text.bpel_b$i:$d") {
        prev.select(explode(expr(BpePairsSql)).as("p"), $"cnt")
          .groupBy($"p.l".as("l"), $"p.r".as("r"))
          .agg(sum($"cnt").as("pc"))
          .orderBy($"pc".desc, $"l".asc, $"r".asc).limit(BpeLargeC)
          .agg(sort_array(collect_list(struct(
            (-$"pc").as("npc"), $"l", $"r"))).as("cands"))
          .select(posexplode(expr(bpeSelectSql(BpeLargeC))))
          .select(($"pos" + 1).cast("long").as("rank"),
            $"col.l".as("l"), $"col.r".as("r"), $"col.pc".as("pc"))
          .localCheckpoint()
      }
      words = graft.GraftCaches.getOrBuild(s, s"text.bpel_w$i:$d") {
        val ruleList = rules
          .agg(collect_list(struct($"l", $"r")).as("rules"))
        prev.crossJoin(broadcast(ruleList))
          .select($"w", expr(BpeBatchFoldSql).as("syms"), $"cnt")
          .localCheckpoint()
      }
      rules
    }
    (words, sels)
  }

  private def bpeTrainLarge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeLargeTables(s, d)._2.zipWithIndex.map { case (rules, i0) =>
      rules.select(lit((i0 + 1).toLong).as("round"), $"rank",
        $"l".as("left_sym"), $"r".as("right_sym"),
        $"pc".as("pair_count"))
    }.reduce(_ unionByName _)
  }

  /** [[bpeLargeTables]]'s final vocabulary + per-round rule tables,
    * exposed for the ScaleSpec driver replay and merge-count
    * assertions. */
  private[scale] def bpeLargeFinalVocab(s: SparkSession, d: String)
      : DataFrame = bpeLargeTables(s, d)._1

  /** Chained-CTE DuckDB replay of [[bpeTrainLarge]] — the
    * [[bpeBatchOracleCtes]] discipline at 8 rounds, with the
    * twice-referenced word tables declared AS MATERIALIZED: DuckDB
    * inlines multiply-referenced CTEs by default, so an unmarked
    * k-round chain re-evaluates the training prefix 2^k times (the
    * 6-round batch oracle tolerates 2^6; 2^8 at 916 units does not —
    * measured: the inlined 20-round prototype never finished, the
    * materialized one runs in ~1 s). */
  private def bpeLargeOracleCtes: String = {
    val eos = "$"
    val conflict = s"""len(list_filter(string_split(acc, chr(30)), s ->
              split_part(s, ' ', 2) = split_part(x, ' ', 1)
           OR split_part(s, ' ', 1) = split_part(x, ' ', 2)
           OR split_part(s, ' ', 1) || split_part(s, ' ', 2)
              = split_part(x, ' ', 1)
           OR split_part(s, ' ', 1) || split_part(s, ' ', 2)
              = split_part(x, ' ', 2)
           OR split_part(x, ' ', 1) || split_part(x, ' ', 2)
              = split_part(s, ' ', 1)
           OR split_part(x, ' ', 1) || split_part(x, ' ', 2)
              = split_part(s, ' ', 2)
           OR split_part(x, ' ', 1) || split_part(x, ' ', 2)
              = split_part(s, ' ', 1) || split_part(s, ' ', 2))) > 0"""
    val base = s"""
      WITH ldt AS (SELECT list_filter(string_split_regex(lower(text),
                     '\\s+'), t -> t <> '') AS ts
                   FROM documents),
      lw0 AS MATERIALIZED (SELECT w,
                    list_append(string_split(w, ''), '$BpeEow') AS syms,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM (SELECT unnest(list_transform(range(1, len(ts)),
                      j -> ts[j] || '_' || ts[j+1])) AS w FROM ldt)
             GROUP BY w)"""
    val rounds = (1 to BpeLargeRounds).map { i =>
      s""",
      lp$i AS (SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS pc
              FROM (SELECT unnest(list_transform(range(1, len(syms)),
                        j -> struct_pack(l := syms[j], r := syms[j+1])))
                      AS p, cnt
                    FROM lw${i - 1}) GROUP BY 1, 2),
      lc$i AS (SELECT list(l || ' ' || r || ' ' || pc
                          ORDER BY pc DESC, l ASC, r ASC) AS cs
              FROM (SELECT l, r, pc FROM lp$i
                    ORDER BY pc DESC, l ASC, r ASC LIMIT $BpeLargeC)),
      ls$i AS (SELECT string_split(list_reduce(cs, (acc, x) -> CASE
                 WHEN len(string_split(acc, chr(30))) >= $BpeLargeC
                   THEN acc
                 WHEN $conflict THEN acc
                 ELSE acc || chr(30) || x END), chr(30)) AS sel
              FROM lc$i),
      lb$i AS MATERIALIZED (SELECT CAST(rank AS BIGINT) AS rank,
                      split_part(s, ' ', 1) AS l,
                      split_part(s, ' ', 2) AS r,
                      CAST(split_part(s, ' ', 3) AS BIGINT) AS pc
               FROM (SELECT unnest(sel) AS s,
                            unnest(range(1, len(sel) + 1)) AS rank
                     FROM ls$i)),
      lr$i AS (SELECT list(struct_pack(l := l, r := r)) AS rules
               FROM lb$i),
      lw$i AS MATERIALIZED (SELECT w, string_split(list_reduce(syms,
                  (acc, x) -> CASE
                  WHEN len(list_filter(rules, rr ->
                         regexp_extract(acc, '[^ ]*$eos') = rr.l
                         AND x = rr.r)) > 0
                  THEN regexp_replace(acc, '[^ ]*$eos',
                         regexp_extract(acc, '[^ ]*$eos') || x)
                  ELSE acc || ' ' || x END), ' ') AS syms, cnt
               FROM lw${i - 1} CROSS JOIN lr$i)"""
    }.mkString
    s"$base$rounds"
  }

  private def bpeTrainLargeOracle: String = {
    val sel = (1 to BpeLargeRounds).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS round, rank, l AS left_sym,
             r AS right_sym, pc AS pair_count FROM lb$i""")
      .mkString("\n      UNION ALL\n      ")
    s"$bpeLargeOracleCtes\n      $sel"
  }

  private def bpeTrainOracle: String = {
    val sel = (1 to BpeMerges).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS round, l AS left_sym,
             r AS right_sym, pc AS pair_count FROM b$i""")
      .mkString("\n      UNION ALL\n      ")
    s"$bpeOracleCtes\n      $sel"
  }

  private def bpeEncodeOracle: String = s"""$bpeOracleCtes,
      vocab AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_subwords
                FROM w$BpeMerges),
      dt AS (SELECT doc_id,
                    lower(unnest(string_split_regex(text, '\\s+'))) AS w
             FROM documents),
      j AS (SELECT doc_id, n_subwords
            FROM dt JOIN vocab USING (w) WHERE w <> '')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(n_subwords) AS BIGINT) AS n_tokens,
             CAST(sum(n_subwords) * 1000 // count(*) AS BIGINT)
               AS fertility_e3
      FROM j GROUP BY 1"""

  /** Chao1 species-richness estimator per source (Chao 1984) — "how
    * big is this source's TRUE vocabulary?", the capture–recapture
    * question [[hapaxProfile]]'s observed counts can't answer. With
    * V observed words, F1 singletons, F2 doubletons:
    * Chao1 = V + F1²/(2F2) (bias-corrected V + F1(F1−1)/2 when
    * F2 = 0), plus Good's sample-coverage estimate
    * C = 1 − F1/N. Both emitted as exact e2/e6 truncating divisions
    * of integer terms. Shape: the [[hapaxProfile]] rollup plus one
    * extra conditional count — same single shuffle. */
  private def chao1Richness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(count(lit(1)).as("vocab"),
        sum($"c").as("n_tokens"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("f1"),
        sum(when($"c" === 2, 1L).otherwise(0L)).as("f2"))
      .select($"source", $"vocab", $"n_tokens", $"f1", $"f2",
        when($"f2" > 0,
          expr("vocab * 100 + f1 * f1 * 100 div (2 * f2)"))
          .otherwise(expr("vocab * 100 + f1 * (f1 - 1) * 100 div 2"))
          .as("chao1_e2"),
        expr("(n_tokens - f1) * 1000000 div n_tokens")
          .as("coverage_e6"))
  }

  /** Token cap for [[rougeL]] — bounds each pair's DP at 64² cells
    * regardless of document length (the operator contract; the oracle
    * and spec replay the same slice). */
  val RougeTokenCap = 64

  /** ROUGE-L between neighboring documents — the summary/overlap
    * EVAL metric (Lin 2004) the n-gram views can't give: Jaccard and
    * containment score unordered token SETS, ROUGE-L scores the
    * longest common SUBSEQUENCE, so reordered boilerplate stops
    * counting as overlap. Pairs are (doc, doc+1); tokens polyhash to
    * longs (cross-engine, the sketch-key convention) and cap at
    * [[RougeTokenCap]]. The LCS kernel is the codegen
    * [[graft.ext.LcsExpr]] (two rolling buffers inside whole-stage
    * codegen — the [[graft.ext.DtwExpr]] tier-(b) case); with
    * LCS-based precision AND recall, F1 collapses to the single exact
    * division 2·LCS·10⁶ div (n_a + n_b). Shape: one equi self-join on
    * doc_id+1 (1:1, shuffle ∝ corpus), DP scan-local per pair. */
  /** BLEU COMPONENTS between neighboring documents — the
    * precision-family eval twin of [[rougeL]]'s recall-family LCS
    * (Papineni et al. 2002): modified (clipped) n-gram precisions p₁
    * and p₂ as EXACT rationals — Σ_g min(cnt_cand(g), cnt_ref(g))
    * over candidate n-gram totals — plus the brevity ratio and the
    * exact integer-corrected √(p₁·p₂) geometric mean (BLEU-2 without
    * the brevity exponential: exp(1−r/c) is not exactly replayable,
    * so the ratio ships raw and the penalty stays the consumer's
    * one-liner — documented, not hidden). Tokens polyhash to longs
    * and cap at [[RougeTokenCap]] (the rouge_l conventions); clipped
    * counts run as distinct-gram filter scans inside the row —
    * O(cap²) scan-local work, no shuffle beyond the 1:1 neighbor
    * join. The √ floor is [[graft.ops.StatsQueries.exactFloorDivSqrt]]
    * in its ⌊√X⌋ = ⌊X/√X⌋ form, integer-corrected on both engines. */
  private def bleuComponents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = slice(
      transform(tokens(col("text")), t => polyHash(t, 31L)),
      1, RougeTokenCap)
    val base = Tables.documents(s, d)
      .select($"doc_id", toks.as("toks"))
    // bindOnce: `toks` aliases the hashed-token pipeline; an unbound
    // bigram lambda would re-hash the whole doc per gram position
    // (see TextOps.bindOnce)
    def grams(c: Column, n: Int): Column = bindOnce(c) { tk =>
      if (n == 1) transform(tk, x => x.cast("string"))
      else when(size(tk) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(tk) - lit(n - 1)),
          j => concat(element_at(tk, j).cast("string"), lit("_"),
            element_at(tk, j + 1).cast("string"))))
    }
    // clipped counts as per-doc GRAM-COUNT tables + one equi join per
    // order, not an O(cap²) in-row filter scan (the interpreted-HOF
    // pathology: filter-inside-aggregate re-evaluates per element —
    // measured 3.7 s vs 0.6 s at sf0.1): Σ_g min(cnt_cand, cnt_ref)
    // over the join is the same clipped mass, grams absent from
    // either side contribute 0 and the inner join drops them.
    def gramCounts(n: Int): DataFrame = base
      .select($"doc_id", explode(grams($"toks", n)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
    def matches(n: Int, out: String): DataFrame = {
      val gc = gramCounts(n)
      gc.select($"doc_id".as("doc_a"), $"g", $"cnt".as("cnt_r"))
        .join(gc.select(($"doc_id" - 1).as("doc_a"),
          $"g", $"cnt".as("cnt_c")), Seq("doc_a", "g"))
        .groupBy($"doc_a")
        .agg(sum(least($"cnt_c", $"cnt_r")).as(out))
    }
    val lens = base.select($"doc_id".as("doc_a"),
        size($"toks").cast("long").as("len_r"))
      .join(base.select(($"doc_id" - 1).as("doc_a"),
        $"doc_id".as("doc_b"),
        size($"toks").cast("long").as("len_c")), "doc_a")
    lens
      .join(matches(1, "m1"), Seq("doc_a"), "left")
      .join(matches(2, "m2"), Seq("doc_a"), "left")
      .select($"doc_a", $"doc_b", $"len_c", $"len_r",
        coalesce($"m1", lit(0L)).as("match1"),
        coalesce($"m2", lit(0L)).as("match2"))
      .withColumn("p1_e6", expr("match1 * 1000000 div len_c"))
      .withColumn("p2_e6",
        expr("match2 * 1000000 div greatest(len_c - 1, 1L)"))
      .withColumn("brevity_ratio_e3",
        expr("len_c * 1000 div len_r"))
      .withColumn("xx", $"p1_e6" * $"p2_e6")
      .withColumn("bleu2_geo_e6",
        when($"xx" === 0L, 0L).otherwise( // guard sqrt(0) NaN candidate
          graft.ops.StatsQueries.exactFloorDivSqrt(
            $"xx", $"xx", 1L).cast("long")))
      .drop("xx")
  }

  private def rougeL(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = slice(
      transform(tokens(col("text")), t => polyHash(t, 31L)),
      1, RougeTokenCap)
    val base = Tables.documents(s, d)
      .select($"doc_id", toks.as("toks"))
    val a = base.select($"doc_id".as("doc_a"), $"toks".as("ta"))
    val b = base.select(($"doc_id" - 1).as("doc_a"),
      $"doc_id".as("doc_b"), $"toks".as("tb"))
    a.join(b, "doc_a")
      .select($"doc_a", $"doc_b",
        size($"ta").cast("long").as("n_a"),
        size($"tb").cast("long").as("n_b"),
        graft.ext.LcsExpr.lcs($"ta", $"tb").as("lcs_len"))
      .withColumn("rouge_l_f_e6",
        expr("2 * lcs_len * 1000000 div (n_a + n_b)"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_dsir", dsirWeights, Some(dsirOracleBase)),

    Q("q_dsir_select", dsirSelect, Some(s"""
      WITH base AS ($dsirOracleBase),
      g AS (SELECT doc_id, lang, logw_e6,
                   CAST(round(-ln(-ln(
                     ((doc_id * 2654435761) % 4294967296 + 0.5)
                       / 4294967296.0)), 6) AS DECIMAL(18,6)) AS gd
            FROM base)
      SELECT doc_id, lang, logw_e6,
             CAST(gd * 1000000 AS BIGINT) AS gumbel_e6,
             CAST(logw_e6 + gd * 1000000 AS BIGINT) AS key_e6
      FROM g
      ORDER BY key_e6 DESC, doc_id ASC
      LIMIT $DsirSelectK""")),

    Q("q_text_token_count", tokenCount, Some("""
      SELECT doc_id,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(len(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]|[^a-z0-9\s]+')) AS BIGINT) AS n_bpe,
             CAST(list_sum(list_transform(
               string_split_regex(lower(text), '\s+'),
               w -> 1 + (length(w) - 1) // 6)) AS BIGINT) AS n_subwords
      FROM documents""")),

    Q("q_text_quality", qualityStats, Some("""
      WITH q AS (
        SELECT lang,
               round((least(length(text) / 200.0, 1.0) +
                      len(list_distinct(string_split_regex(lower(text), '\s+'))) * 1.0 /
                      greatest(len(string_split_regex(lower(text), '\s+')), 1)) / 2.0,
                     4) AS q
        FROM documents)
      SELECT lang, count(*) AS cnt, round(avg(q), 4) AS avg_quality,
             round(min(q), 4) AS min_quality, round(max(q), 4) AS max_quality
      FROM q GROUP BY lang""")),

    Q("q_text_langid", langIdQ, Some(langIdOracle)),
    Q("q_text_fingerprint", fingerprintQ, Some(s"""
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(lower(text), '\\s+'),
                 w -> ${polyHashSql("w", 31L)})),
               (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp
      FROM documents""")),

    Q("q_curation_pipeline", curation, Some(curationOracle)),

    Q("q_hash_split", hashSplit, Some("""
      WITH s AS (
        SELECT CASE
                 WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
                   THEN 'train'
                 WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                   THEN 'valid'
                 ELSE 'test' END AS split,
               lang, n_chars
        FROM documents)
      SELECT split, lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM s GROUP BY 1, 2""")),

    Q("q_max_coverage", maxCoverage, Some {
      val base = """
      WITH t AS (SELECT doc_id,
                        string_split_regex(lower(text), '\s+') AS toks
                 FROM documents),
      p AS (SELECT doc_id,
                   unnest(list_distinct(
                     [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      for i in range(1, len(toks) - 1)])) AS tok
            FROM t WHERE len(toks) >= 3),
      g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
             FROM p GROUP BY 1),
      k1 AS (SELECT CAST(1 AS BIGINT) AS round, doc_id, gain
             FROM g1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
      u1 AS (SELECT p.doc_id, p.tok FROM p
             ANTI JOIN (SELECT DISTINCT tok FROM p
                        JOIN k1 USING (doc_id)) c USING (tok))"""
      val rounds = (2 to MaxCoverRounds).map { r =>
        s""",
      g$r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
             FROM u${r - 1} GROUP BY 1),
      k$r AS (SELECT CAST($r AS BIGINT) AS round, doc_id, gain
             FROM g$r ORDER BY gain DESC, doc_id ASC LIMIT 1),
      u$r AS (SELECT u.doc_id, u.tok FROM u${r - 1} u
             ANTI JOIN (SELECT DISTINCT tok FROM p
                        JOIN k$r USING (doc_id)) c USING (tok))"""
      }.mkString
      val union = (1 to MaxCoverRounds).map(r => s"SELECT * FROM k$r")
        .mkString("\n      UNION ALL ")
      s"""$base$rounds
      SELECT round, doc_id, gain,
             CAST(sum(gain) OVER (ORDER BY round) AS BIGINT)
               AS covered_total
      FROM ($union)
      ORDER BY round"""
    }),
    Q("q_source_ablation", sourceAblation, Some(s"""
      WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(CASE WHEN n_chars >= $AblationMinChars
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
                 FROM documents GROUP BY 1),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
                   CAST(sum(n_pass) AS BIGINT) AS pp
            FROM c)
      SELECT source, n_docs, n_pass,
             CAST((pp * 1000000) // nn AS BIGINT) AS rate_all_e6,
             CAST(CASE WHEN nn > n_docs
                  THEN ((pp - n_pass) * 1000000) // (nn - n_docs)
                  ELSE NULL END AS BIGINT) AS rate_loo_e6,
             CAST(CASE WHEN nn > n_docs
                  THEN ((pp - n_pass) * 1000000) // (nn - n_docs)
                       - (pp * 1000000) // nn
                  ELSE NULL END AS BIGINT) AS delta_e6
      FROM c, t
      ORDER BY source""")),
    Q("q_textrank", textrank, Some(textrankOracle)),
    Q("q_shapley_coverage", shapleyCoverage, Some(s"""
      WITH tk AS (SELECT source,
                         string_split_regex(lower(text), '\\s+') AS toks
                  FROM documents),
      owners AS (SELECT DISTINCT source,
                        unnest([toks[i] || ' ' || toks[i+1] || ' '
                                || toks[i+2]
                                for i in range(1, len(toks) - 1)]) AS sh
                 FROM tk WHERE len(toks) >= 3),
      sizes AS (SELECT sh, CAST(count(*) AS BIGINT) AS n_owners
                FROM owners GROUP BY 1)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_covered,
             CAST(sum(CASE WHEN n_owners = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_exclusive,
             CAST(sum($ShapleyLcm // n_owners) AS BIGINT) AS credit_lcm,
             CAST((CAST(sum($ShapleyLcm // n_owners) AS HUGEINT) * 1000)
               // $ShapleyLcm AS BIGINT) AS shapley_milli
      FROM owners JOIN sizes USING (sh)
      GROUP BY source
      ORDER BY source""")),
    Q("q_winnow_fingerprints", winnowFingerprints, headline = true,
      oracle = Some(s"""
      WITH t AS (SELECT doc_id,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $WinnowK),
      g AS (SELECT doc_id,
                   [${polyHashSql(
                     "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]",
                     31L)}
                    for i in range(1, len(toks) - 1)] AS hs
            FROM t2),
      f AS (SELECT doc_id,
                   CAST(len(hs) AS BIGINT) AS n_grams,
                   CAST(greatest(len(hs) - ${WinnowW - 1}, 0) AS BIGINT)
                     AS n_windows,
                   CAST(CASE WHEN len(hs) >= $WinnowW
                        THEN len(list_distinct(
                          [list_min(hs[i:i+${WinnowW - 1}])
                           for i in range(1, len(hs) - ${WinnowW - 2})]))
                        ELSE 0 END AS BIGINT) AS n_fp
            FROM g)
      SELECT doc_id, n_grams, n_windows, n_fp,
             CAST(CASE WHEN n_windows > 0
                  THEN n_fp * 1000000 // n_windows
                  ELSE 0 END AS BIGINT) AS density_e6
      FROM f ORDER BY doc_id""")),
    Q("q_stratified_sample", stratifiedSample, Some("""
      WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total
                 FROM documents GROUP BY 1),
      mm AS (SELECT min(n_total) AS m FROM c),
      r AS (SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY (doc_id * 2654435761) % 4294967296 ASC,
                              doc_id ASC) AS rk
            FROM documents),
      s AS (SELECT lang, doc_id, n_chars
            FROM r, mm WHERE r.rk <= mm.m)
      SELECT c.lang, c.n_total,
             CAST(count(*) AS BIGINT) AS n_sampled,
             CAST(sum(s.doc_id) AS BIGINT) AS id_checksum,
             CAST(sum(s.n_chars) AS BIGINT) AS chars_sampled
      FROM s JOIN c USING (lang)
      GROUP BY 1, 2
      ORDER BY c.lang""")),
    Q("q_gopher_rules", gopherRules, Some(gopherOracle)),
    Q("q_code_detect", codeDetect, Some("""
      WITH a AS (SELECT doc_id,
                        CASE WHEN doc_id % 5 = 0 THEN
                          text || ' def calc_' || doc_id
                               || '(x): return x + ' || doc_id % 7
                               || '; arr[i] = arr[i] * 2; { emit(x); }'
                        WHEN doc_id % 5 = 1 THEN
                          text || ' total_sum = total_sum + 1; if '
                               || '(total_sum == ' || doc_id % 13
                               || ') { flush_buffer(); } '
                               || 'else { skip_row(); }'
                        ELSE text END AS t2
                 FROM documents),
      f AS (SELECT doc_id,
                   CAST(len(t2) AS BIGINT) AS n_chars2,
                   CAST(len(regexp_extract_all(t2, '[{}()\[\]]'))
                     AS BIGINT) AS n_brace,
                   CAST(len(regexp_extract_all(t2, '[;=<>+*/]'))
                     AS BIGINT) AS n_op,
                   CAST(len(regexp_extract_all(t2, '[a-z]+_[a-z]+'))
                     AS BIGINT) AS n_snake,
                   CAST(len(regexp_extract_all(t2,
                     '\bdef\b|\breturn\b|\bif\b|\belse\b'))
                     AS BIGINT) AS n_kw
            FROM a)
      SELECT *,
             CAST(CASE WHEN n_brace * 100 >= n_chars2 THEN 1 ELSE 0 END
               + CASE WHEN n_op * 50 >= n_chars2 THEN 1 ELSE 0 END
               + CASE WHEN n_snake >= 2 THEN 1 ELSE 0 END
               + CASE WHEN n_kw >= 2 THEN 1 ELSE 0 END AS BIGINT)
               AS score,
             CASE WHEN n_brace * 100 >= n_chars2 THEN 1 ELSE 0 END
               + CASE WHEN n_op * 50 >= n_chars2 THEN 1 ELSE 0 END
               + CASE WHEN n_snake >= 2 THEN 1 ELSE 0 END
               + CASE WHEN n_kw >= 2 THEN 1 ELSE 0 END >= 3 AS is_code
      FROM f""")),
    Q("q_repetition_stats", repetitionStats, Some("""
      WITH t AS (SELECT doc_id,
                        string_split_regex(lower(text), '\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id, toks,
                   [toks[i] || ' ' || toks[i+1]
                    for i in range(1, len(toks))] AS bis
            FROM t),
      tc AS (SELECT doc_id, max(c) AS max_tok
             FROM (SELECT doc_id, count(*) AS c
                   FROM (SELECT doc_id, unnest(toks) AS w FROM m)
                   GROUP BY doc_id, w)
             GROUP BY 1),
      bc AS (SELECT doc_id, max(c) AS max_bi
             FROM (SELECT doc_id, count(*) AS c
                   FROM (SELECT doc_id, unnest(bis) AS b FROM m)
                   GROUP BY doc_id, b)
             GROUP BY 1),
      base AS (SELECT doc_id,
                      CAST(len(toks) AS BIGINT) AS n,
                      CAST(len(list_distinct(toks)) AS BIGINT) AS nd,
                      CAST(len(bis) AS BIGINT) AS nb,
                      CAST(len(list_distinct(bis)) AS BIGINT) AS nbd
               FROM m),
      r AS (SELECT b.doc_id, b.n AS n_tokens,
                   CAST((b.n - b.nd) * 1000000 // b.n AS BIGINT)
                     AS dup_tok_e6,
                   CAST(tc.max_tok * 1000000 // b.n AS BIGINT)
                     AS top_tok_e6,
                   CAST(CASE WHEN b.nb = 0 THEN 0
                        ELSE (b.nb - b.nbd) * 1000000 // b.nb END
                     AS BIGINT) AS dup_bi_e6,
                   CAST(CASE WHEN b.nb = 0 THEN 0
                        ELSE coalesce(bc.max_bi, 0) * 1000000 // b.nb
                        END AS BIGINT) AS top_bi_e6
            FROM base b JOIN tc USING (doc_id)
            LEFT JOIN bc USING (doc_id))
      SELECT doc_id, n_tokens, dup_tok_e6, top_tok_e6, dup_bi_e6,
             top_bi_e6,
             top_tok_e6 > 200000 OR dup_bi_e6 > 200000 AS repetitive
      FROM r""")),
    Q("q_quality_classifier", qualityClassifier,
      Some(qualityClassifierOracle)),
    Q("q_preference_pairs", preferencePairs, Some {
      val enSw = langStopwords.head._2.map(w => s"'$w'").mkString(", ")
      s"""
      WITH t AS (SELECT doc_id, source, lang, text,
                        string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id, source, lang,
                   least(length(text) * 1.0 / 500.0, 1.0) AS len_score,
                   len(list_distinct(toks)) * 1.0 /
                     greatest(len(toks), 1) AS diversity,
                   len(list_filter(toks, w -> w IN ($enSw))) * 1.0 /
                     greatest(len(toks), 1) AS sw_ratio,
                   [toks[i] || ' ' || toks[i+1]
                    for i in range(1, len(toks))] AS bigrams
            FROM t),
      f AS (SELECT doc_id, source, lang, len_score, diversity, sw_ratio,
                   CASE WHEN len(bigrams) = 0 THEN 0.0
                        ELSE 1.0 - len(list_distinct(bigrams)) * 1.0 /
                             len(bigrams)
                   END AS dup_frac
            FROM m),
      g AS (SELECT doc_id, source, lang,
                   CAST(floor((-1.5 + 1.0 * len_score + 1.5 * diversity
                     + 8.0 * sw_ratio - 4.0 * dup_frac) * 1000000)
                     AS BIGINT) AS score_e6
            FROM f),
      r AS (SELECT source, lang, doc_id, score_e6,
                   row_number() OVER (PARTITION BY source, lang
                     ORDER BY score_e6 DESC, doc_id ASC) AS rhi,
                   row_number() OVER (PARTITION BY source, lang
                     ORDER BY score_e6 ASC, doc_id ASC) AS rlo,
                   count(*) OVER (PARTITION BY source, lang) AS n_docs
            FROM g),
      hi AS (SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
                    doc_id AS chosen_doc, score_e6 AS chosen_e6
             FROM r WHERE rhi = 1 AND n_docs >= 2),
      lo AS (SELECT source, lang, doc_id AS rejected_doc,
                    score_e6 AS rejected_e6
             FROM r WHERE rlo = 1 AND n_docs >= 2)
      SELECT hi.source, hi.lang, hi.n_docs, hi.chosen_doc, hi.chosen_e6,
             lo.rejected_doc, lo.rejected_e6,
             hi.chosen_e6 - lo.rejected_e6 AS gap_e6
      FROM hi JOIN lo USING (source, lang)"""
    }),
    Q("q_vocab_coverage", vocabCoverage, Some(s"""
      WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\\s+'))
                     AS tok
                   FROM documents),
      cnts AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnts),
      top AS (SELECT tok, cnt FROM cnts
              ORDER BY cnt DESC, tok ASC LIMIT $VocabCoverageK),
      r AS (SELECT tok, CAST(cnt AS BIGINT) AS cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC)
                     AS BIGINT) AS k,
                   CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_tokens
            FROM top)
      SELECT k, tok, cnt, cum_tokens, total AS total_tokens,
             CAST(cum_tokens * 1000000 // total AS BIGINT)
               AS coverage_e6
      FROM r CROSS JOIN tot""")),
    Q("q_curation_splits", curationSplits, Some(curationSplitsOracle)),

    Q("q_weighted_sample", weightedSample, Some("""
      WITH s AS (
        SELECT lang, doc_id,
               ln(((doc_id * 2654435761) % 4294967296 + 0.5)
                  / 4294967296.0) / n_chars AS score
        FROM documents WHERE n_chars > 0),
      r AS (
        SELECT lang, doc_id, score,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY score DESC, doc_id ASC) AS rk
        FROM s)
      SELECT lang, doc_id, round(score, 8) AS score
      FROM r WHERE rk <= 5""")),

    Q("q_tfidf_top_terms", tfidfTop, Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
      df AS (SELECT token, count(DISTINCT doc_id) AS df
             FROM tok WHERE token <> '' GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * ln(n.n_docs * 1.0 / df.df), 4) AS score
        FROM tf JOIN df USING (token) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, token, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token ASC) AS rn
        FROM scored)
      SELECT doc_id, CAST(rn AS BIGINT) AS rn, token, score
      FROM ranked WHERE rn <= 3 AND doc_id < 100""")),

    Q("q_bm25", bm25, Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS token
        FROM documents),
      tok2 AS (SELECT * FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1),
      stats AS (SELECT sum(dl) AS tot_len, count(*) AS n_docs FROM dl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok2
             WHERE token IN ('query', 'join', 'data') GROUP BY 1, 2),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
               CAST((CAST(CAST(CAST(round(
                        ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5)
                           + 1.0), 6) AS DECIMAL(18,6)) * 1000000
                      AS BIGINT) AS HUGEINT)
                     * 44 * tf.tf * stats.tot_len)
                    // (20 * tf.tf * stats.tot_len + 6 * stats.tot_len
                        + 18 * dl.dl * stats.n_docs)
                    AS BIGINT) AS units
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
        CROSS JOIN stats),
      agg AS (SELECT doc_id, count(*) AS n_terms,
                     CAST(sum(units) AS BIGINT) AS score_units
              FROM scored GROUP BY 1)
      SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, score_units,
             score_units / 1000000.0 AS score
      FROM agg ORDER BY score_units DESC, doc_id ASC LIMIT 20""")),

    Q("q_query_likelihood", queryLikelihood, Some(s"""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS token
        FROM documents),
      tok2 AS (SELECT * FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             FROM tok2 GROUP BY 1),
      c AS (SELECT CAST(sum(dl) AS BIGINT) AS cc FROM dl),
      cf AS (SELECT token, CAST(count(*) AS BIGINT) AS cf FROM tok2
             WHERE token IN ('query', 'join', 'data') GROUP BY 1),
      bg AS (SELECT CAST(sum(CAST(floor(
                      ln(${QlMu}.0 * cf / cc) * 1e9) AS BIGINT))
                      AS BIGINT) AS bg_e9,
                    CAST(count(*) AS BIGINT) AS qn
             FROM cf CROSS JOIN c),
      tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             FROM tok2
             WHERE token IN ('query', 'join', 'data') GROUP BY 1, 2),
      m AS (SELECT doc_id,
                   CAST(sum(CAST(floor(
                     ln(1.0 + CAST(tf AS DOUBLE) * cc
                        / (${QlMu}.0 * cf)) * 1e9) AS BIGINT))
                     AS BIGINT) AS match_e9,
                   CAST(count(*) AS BIGINT) AS n_match
            FROM tf JOIN cf USING (token) CROSS JOIN c
            GROUP BY 1),
      scored AS (SELECT dl.doc_id, dl.dl,
                        coalesce(m.n_match, 0) AS n_match,
                        bg.bg_e9
                          - bg.qn * CAST(floor(
                              ln(CAST(dl.dl + $QlMu AS DOUBLE)) * 1e9)
                              AS BIGINT)
                          + coalesce(m.match_e9, 0) AS score_e9
                 FROM dl LEFT JOIN m USING (doc_id) CROSS JOIN bg)
      SELECT doc_id, dl, CAST(n_match AS BIGINT) AS n_match,
             CAST(score_e9 AS BIGINT) AS score_e9
      FROM scored
      ORDER BY score_e9 DESC, doc_id ASC LIMIT 20""")),
    Q("q_zipf_slope", zipfSlope, Some("""
      WITH tok AS (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        FROM documents),
      f AS (SELECT token, CAST(count(*) AS BIGINT) AS f
            FROM tok WHERE token <> '' GROUP BY 1),
      r AS (SELECT f,
                   CAST(row_number() OVER (ORDER BY f DESC, token ASC)
                     AS BIGINT) AS r
            FROM f),
      s AS (SELECT CAST(count(*) AS BIGINT) AS v,
                   CAST(sum(f) AS BIGINT) AS n_tokens,
                   CAST(sum(CAST(floor(ln(CAST(r AS DOUBLE)) * 1e9)
                     AS BIGINT)) AS BIGINT) AS sx,
                   CAST(sum(CAST(floor(ln(CAST(f AS DOUBLE)) * 1e9)
                     AS BIGINT)) AS BIGINT) AS sy,
                   CAST(sum(CAST(floor(ln(CAST(r AS DOUBLE))
                     * ln(CAST(f AS DOUBLE)) * 1e9) AS BIGINT))
                     AS BIGINT) AS sxy,
                   CAST(sum(CAST(floor(ln(CAST(r AS DOUBLE))
                     * ln(CAST(r AS DOUBLE)) * 1e9) AS BIGINT))
                     AS BIGINT) AS sxx
            FROM r),
      d AS (SELECT v, n_tokens,
                   (CAST(v AS DOUBLE) * sxy
                     - CAST(sx AS DOUBLE) * sy / 1e9)
                   / (CAST(v AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx / 1e9) AS slope_d,
                   sx, sy
            FROM s)
      SELECT v, n_tokens,
             CAST(floor(slope_d * 1e6) AS BIGINT) AS slope_e6,
             CAST(floor((CAST(sy AS DOUBLE) - slope_d * sx)
               / v / 1e9 * 1e6) AS BIGINT) AS intercept_e6
      FROM d""")),
    Q("q_simpson_diversity", simpsonDiversity, Some("""
      WITH tok AS (
        SELECT source,
               unnest(string_split_regex(lower(text), '\s+')) AS token
        FROM documents),
      c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE token <> '' GROUP BY 1, 2),
      agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     sum(CAST(c AS DOUBLE) * c) AS s2
              FROM c GROUP BY 1)
      SELECT source, n_tokens, n_distinct,
             CAST(floor((1.0 - s2
               / (CAST(n_tokens AS DOUBLE) * n_tokens)) * 1e6)
               AS BIGINT) AS simpson_e6
      FROM agg ORDER BY source""")),
    Q("q_bpe_merges", bpeMerges, Some("""
      WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\s+'))
                     AS w
                   FROM documents),
      v AS (SELECT w, count(*) AS freq FROM tok WHERE w <> ''
            GROUP BY 1),
      p AS (SELECT substring(v.w, i.i, 2) AS pair, v.freq
            FROM v JOIN generate_series(1, 64) AS i(i)
              ON i.i <= length(v.w) - 1)
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      FROM p GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 20""")),

    Q("q_quantile_filter", quantileFilter, Some("""
      WITH nt AS (SELECT doc_id, lang,
                         CAST(len(string_split_regex(lower(text), '\s+'))
                           AS BIGINT) AS n_tokens
                  FROM documents),
      t AS (SELECT quantile_cont(n_tokens, 0.9) AS p90 FROM nt)
      SELECT lang, count(*) AS n_kept,
             CAST(min(n_tokens) AS BIGINT) AS min_kept_tokens,
             max(t.p90) AS p90
      FROM nt CROSS JOIN t
      WHERE n_tokens >= t.p90
      GROUP BY 1""")),

    Q("q_top_tokens", topTokens, Some("""
      WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\s+'))
                     AS token
                   FROM documents)
      SELECT token, count(*) AS cnt FROM tok
      GROUP BY 1 ORDER BY cnt DESC, token ASC LIMIT 20""")),

    Q("q_text_profile", docProfile, Some("""
      SELECT lang, source, count(*) AS cnt,
             round(avg(n_chars), 4) AS avg_chars,
             CAST(max(length(text)) AS BIGINT) AS max_len,
             round(avg(len(string_split_regex(lower(text), '\s+'))), 4)
               AS avg_tokens
      FROM documents GROUP BY lang, source""")),

    Q("q_draft_acceptance", draftAcceptance, Some("""
      WITH tk AS (SELECT source,
                         string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      tr AS (SELECT source,
                    unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                            for i in range(1, len(toks))]) AS p
             FROM tk WHERE len(toks) >= 2),
      t2 AS (SELECT source, p.w1 AS w1, p.w2 AS w2 FROM tr),
      cnt AS (SELECT w1, w2, count(*) AS cnt FROM t2 GROUP BY 1, 2),
      draft AS (SELECT w1, w2 AS draft_w2 FROM (
                  SELECT w1, w2, row_number() OVER (
                    PARTITION BY w1 ORDER BY cnt DESC, w2 ASC) AS rn
                  FROM cnt)
                WHERE rn = 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n_transitions,
             CAST(sum(CASE WHEN w2 = draft_w2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_accepted,
             CAST(sum(CASE WHEN w2 = draft_w2 THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS acceptance_e6
      FROM t2 JOIN draft USING (w1)
      GROUP BY 1""")),

    Q("q_bigram_lm", bigramLm, Some("""
      WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      pairs AS (SELECT unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                              for i in range(1, len(toks))]) AS p
                FROM tk WHERE len(toks) >= 2),
      big AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cnt
              FROM pairs GROUP BY 1, 2),
      uni AS (SELECT w1, sum(cnt) AS tot FROM big GROUP BY 1)
      SELECT b.w1, b.w2, CAST(b.cnt AS BIGINT) AS cnt,
             round(b.cnt * 1.0 / u.tot, 4) AS p_cond
      FROM big b JOIN uni u USING (w1)
      ORDER BY cnt DESC, w1, w2 LIMIT 50""")),

    Q("q_feature_hash", featureHash, Some(s"""
      WITH tk AS (SELECT unnest(string_split_regex(lower(text), '\\s+'))
                    AS tok
                  FROM documents),
      b AS (SELECT ${polyHashSql("tok", 31L)} % 64 AS bucket, tok
            FROM tk),
      t AS (SELECT count(*) AS corpus_tokens FROM b)
      SELECT bucket, count(*) AS total_count,
             CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens,
             CAST(corpus_tokens AS BIGINT) AS corpus_tokens,
             CAST(count(*) AS DOUBLE) / corpus_tokens AS mass,
             count(*) * 64 > corpus_tokens AS overloaded
      FROM b, t GROUP BY bucket, corpus_tokens""")),

    Q("q_topp_select", topPSelect, Some("""
      WITH s AS (SELECT lang, doc_id,
                        CAST(len(string_split_regex(lower(text), '\s+'))
                             AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT lang, doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                     PARTITION BY lang
                     ORDER BY n_tokens DESC, doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cum_before,
                   sum(n_tokens) OVER (PARTITION BY lang) AS total
            FROM s),
      k AS (SELECT lang, n_tokens, cum_before * 100 < total * 80 AS kept,
                   total
            FROM c)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             CAST(max(total) AS BIGINT) AS tokens_total,
             CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_kept
      FROM k GROUP BY 1""")),

    Q("q_kneser_ney", kneserNey, Some("""
      WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      pairs AS (SELECT unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                              for i in range(1, len(toks))]) AS p
                FROM tk WHERE len(toks) >= 2),
      big AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c12
              FROM pairs GROUP BY 1, 2),
      nt AS (SELECT count(*) AS n_types FROM big),
      l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                   count(*) AS n1w1
            FROM big WHERE w1 IN ('query', 'join', 'data') GROUP BY 1),
      r AS (SELECT w2, count(*) AS n1w2
            FROM big WHERE w2 IN ('query', 'join', 'data') GROUP BY 1),
      probes AS (SELECT a.w1, b.w2
                 FROM (SELECT unnest(['query', 'join', 'data']) AS w1) a
                 CROSS JOIN
                      (SELECT unnest(['query', 'join', 'data']) AS w2) b),
      j AS (SELECT pr.w1, pr.w2,
                   coalesce(b.c12, 0) AS c12,
                   coalesce(l.c1, 0) AS c1,
                   coalesce(l.n1w1, 0) AS n1w1,
                   coalesce(r.n1w2, 0) AS n1w2,
                   nt.n_types
            FROM probes pr
            LEFT JOIN big b ON pr.w1 = b.w1 AND pr.w2 = b.w2
            LEFT JOIN l ON pr.w1 = l.w1
            LEFT JOIN r ON pr.w2 = r.w2
            CROSS JOIN nt)
      SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, c1,
             CAST(n1w1 AS BIGINT) AS n1w1,
             CAST(n1w2 AS BIGINT) AS n1w2,
             CAST(n_types AS BIGINT) AS n_types,
             CAST(n1w2 * 1000000000 // n_types AS BIGINT) AS pcont_e9,
             CASE WHEN c1 > 0
                  THEN CAST((greatest(4 * c12 - 3, 0) * 1000000000)
                              // (4 * c1)
                          + (3 * n1w1
                               * (n1w2 * 1000000000 // n_types))
                              // (4 * c1) AS BIGINT)
             END AS score_e9
      FROM j""")),

    Q("q_stupid_backoff", stupidBackoff, Some("""
      WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      pairs AS (SELECT unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                              for i in range(1, len(toks))]) AS p
                FROM tk WHERE len(toks) >= 2),
      big AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c12
              FROM pairs
              WHERE p.w1 IN ('query', 'join', 'data')
                AND p.w2 IN ('query', 'join', 'data')
              GROUP BY 1, 2),
      tok AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents),
      tok2 AS (SELECT w FROM tok WHERE w <> ''),
      uni AS (SELECT w, count(*) AS c FROM tok2
              WHERE w IN ('query', 'join', 'data') GROUP BY 1),
      nt AS (SELECT count(*) AS n_tokens FROM tok2),
      probes AS (SELECT a.w1, b.w2
                 FROM (SELECT unnest(['query', 'join', 'data']) AS w1) a
                 CROSS JOIN
                      (SELECT unnest(['query', 'join', 'data']) AS w2) b)
      SELECT p.w1, p.w2,
             CAST(coalesce(b.c12, 0) AS BIGINT) AS c12,
             CAST(coalesce(u1.c, 0) AS BIGINT) AS c1,
             CAST(coalesce(u2.c, 0) AS BIGINT) AS c2,
             nt.n_tokens, b.c12 IS NULL AS backed_off,
             CASE WHEN b.c12 IS NOT NULL
                  THEN (b.c12 * 1000000000) // u1.c
                  ELSE (2 * coalesce(u2.c, 0) * 1000000000)
                       // (5 * nt.n_tokens)
             END AS score_e9
      FROM probes p
      LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
      LEFT JOIN uni u1 ON u1.w = p.w1
      LEFT JOIN uni u2 ON u2.w = p.w2
      CROSS JOIN nt""")),

    Q("q_seq_pack", seqPack, Some("""
      WITH t AS (SELECT doc_id,
                        CAST(len(string_split_regex(lower(text), '\s+'))
                             AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
            FROM t)
      SELECT doc_id, n_tokens,
             CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
      FROM c""")),

    Q("q_mixture_weights", mixtureWeights, Some("""
      WITH by_lang AS (SELECT lang, count(*) AS n
                       FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
                     count(*) AS n_langs
              FROM by_lang)
      SELECT lang, CAST(n AS BIGINT) AS n,
             round(n * 1.0 / tot_n, 4) AS actual_share,
             round((1.0 / n_langs) / (n * 1.0 / tot_n), 4) AS weight
      FROM by_lang, tot""")),

    Q("q_alpha_sampling", alphaSampling, Some("""
      WITH b AS (SELECT source, lang,
                        CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(len(string_split_regex(text, '\s+')))
                          AS BIGINT) AS toks
                 FROM documents GROUP BY 1, 2),
      w AS (SELECT *, CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1000.0)
                        AS BIGINT) AS w_e3
            FROM b),
      t AS (SELECT CAST(sum(toks) AS BIGINT) AS tot_toks,
                   CAST(sum(w_e3) AS BIGINT) AS tot_w_e3
            FROM w)
      SELECT source, lang, n_docs, toks, w_e3,
             CAST(CAST(toks AS HUGEINT) * 1000000 // tot_toks
               AS BIGINT) AS p_ppm,
             CAST(w_e3 * 1000000 // tot_w_e3 AS BIGINT) AS q_ppm,
             CASE WHEN CAST(toks AS HUGEINT) * 1000000 // tot_toks > 0
               THEN CAST((w_e3 * 1000000 // tot_w_e3) * 1000
                 // (CAST(toks AS HUGEINT) * 1000000 // tot_toks)
                 AS BIGINT)
             END AS boost_e3
      FROM w, t""")),

    Q("q_readability", readability, Some("""
      WITH p AS (SELECT lang, source,
                        CAST(len(string_split_regex(text, '\s+'))
                          AS BIGINT) AS w,
                        CAST(greatest(len(regexp_extract_all(text,
                          '[.!?]+')), 1) AS BIGINT) AS sents,
                        CAST(len(regexp_extract_all(lower(text),
                          '[aeiouy]+')) AS BIGINT) AS syl
                 FROM documents),
      a AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS words,
                   CAST(sum(sents) AS BIGINT) AS sents,
                   CAST(sum(syl) AS BIGINT) AS syllables
            FROM p GROUP BY 1, 2)
      SELECT lang, source, n_docs, words, sents, syllables,
             CAST(floor((206.835 - 1.015 * CAST(words AS DOUBLE) / sents
               - 84.6 * CAST(syllables AS DOUBLE) / words) * 1000.0)
               AS BIGINT) AS fre_e3,
             CAST(floor((0.39 * CAST(words AS DOUBLE) / sents
               + 11.8 * CAST(syllables AS DOUBLE) / words - 15.59)
               * 1000.0) AS BIGINT) AS fk_grade_e3
      FROM a""")),

    Q("q_text_normalize", textNormalize, Some("""
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text,
             CAST(length(text) AS BIGINT) AS chars_before,
             CAST(length(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS BIGINT) AS chars_after
      FROM documents""")),

    Q("q_doc_chunks", docChunks, Some("""
      WITH t AS (SELECT doc_id,
                        string_split_regex(lower(text), '\s+') AS toks
                 FROM documents),
      s AS (SELECT doc_id, toks,
                   unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48))
                     AS start
            FROM t)
      SELECT doc_id,
             CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
             CAST(len(toks[start : start + 63]) AS BIGINT)
               AS n_chunk_tokens,
             array_to_string(toks[start : start + 63], ' ') AS chunk_text
      FROM s""")),

    Q("q_perplexity", perplexity, headline = true, oracle = Some("""
      WITH tk AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      pairs AS (SELECT doc_id,
                       unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                               for i in range(1, len(toks))]) AS p
                FROM tk WHERE len(toks) >= 2),
      db AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS cnt
             FROM pairs GROUP BY 1, 2, 3),
      big AS (SELECT w1, w2, sum(cnt) AS c12 FROM db GROUP BY 1, 2),
      uni AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
      voc AS (SELECT count(DISTINCT w2) AS v FROM big),
      terms AS (SELECT db.doc_id, db.cnt,
                       CAST(round(ln((big.c12 + 1) * 1.0 / (uni.c1 + voc.v)),
                                  6) AS DECIMAL(18,6)) * db.cnt AS term
                FROM db JOIN big USING (w1, w2) JOIN uni USING (w1)
                     CROSS JOIN voc)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             round(-CAST(sum(term) AS DOUBLE) / sum(cnt), 4) AS xent_nats
      FROM terms GROUP BY 1""")),

    Q("q_token_entropy", tokenEntropy, Some("""
      WITH tok AS (SELECT doc_id,
                          unnest(string_split_regex(lower(text), '\s+'))
                            AS w
                   FROM documents),
      c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
      nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                    count(*) AS n_distinct
             FROM c GROUP BY 1),
      t AS (SELECT c.doc_id, nn.n, nn.n_distinct,
                   CAST(round((c.c / nn.n) * ln(c.c / nn.n), 9)
                        AS DECIMAL(18,9)) AS term
            FROM c JOIN nn USING (doc_id))
      SELECT doc_id, max(n) AS n_tokens,
             CAST(max(n_distinct) AS BIGINT) AS n_distinct,
             round(-CAST(sum(term) AS DOUBLE), 4) AS entropy_nats
      FROM t GROUP BY 1""")),

    Q("q_source_overlap", sourceOverlap, Some("""
      WITH t0 AS (SELECT source,
                         unnest(string_split_regex(lower(text), '\s+'))
                           AS w
                  FROM documents),
      v AS (SELECT DISTINCT source, w FROM t0),
      sz AS (SELECT source, count(*) AS nv FROM v GROUP BY 1),
      i AS (SELECT a.source AS src_a, b.source AS src_b,
                   count(*) AS n_inter
            FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2)
      SELECT i.src_a, i.src_b, i.n_inter,
             round(i.n_inter /
                   (sa.nv + sb.nv - i.n_inter), 4) AS jaccard
      FROM i JOIN sz sa ON i.src_a = sa.source
             JOIN sz sb ON i.src_b = sb.source""")),

    Q("q_vocab_growth", vocabGrowth, Some("""
      WITH tok AS (SELECT doc_id,
                          unnest(string_split_regex(lower(text), '\s+'))
                            AS w
                   FROM documents),
      firsts AS (SELECT w, min(doc_id) AS doc_id FROM tok GROUP BY 1),
      new_per AS (SELECT doc_id, count(*) AS n_new
                  FROM firsts GROUP BY 1),
      per_doc AS (SELECT d.doc_id,
                         CAST(len(string_split_regex(lower(d.text),
                           '\s+')) AS BIGINT) AS n_tokens,
                         coalesce(n.n_new, 0) AS n_new
                  FROM documents d LEFT JOIN new_per n USING (doc_id)),
      cum AS (SELECT doc_id,
                     sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens,
                     sum(n_new) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_vocab
              FROM per_doc)
      SELECT doc_id, CAST(cum_tokens AS BIGINT) AS cum_tokens,
             CAST(cum_vocab AS BIGINT) AS cum_vocab,
             round(cum_vocab * 1.0 / cum_tokens, 6) AS vocab_rate
      FROM cum WHERE doc_id % 50 = 0""")),

    Q("q_pmi_terms", pmiTerms, Some("""
      WITH tk AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      pairs AS (SELECT doc_id,
                       unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                               for i in range(1, len(toks))]) AS p
                FROM tk WHERE len(toks) >= 2),
      db AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS cnt
             FROM pairs GROUP BY 1, 2, 3),
      big AS (SELECT w1, w2, sum(cnt) AS c12 FROM db GROUP BY 1, 2),
      lft AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
      rgt AS (SELECT w2, sum(c12) AS c2 FROM big GROUP BY 1),
      n AS (SELECT sum(c12) AS nn FROM big)
      SELECT b.w1, b.w2, CAST(b.c12 AS BIGINT) AS c12,
             round(ln(CAST(b.c12 * n.nn AS DOUBLE) /
                      CAST(l.c1 * r.c2 AS DOUBLE)), 4) AS pmi
      FROM big b JOIN lft l USING (w1) JOIN rgt r USING (w2)
           CROSS JOIN n
      WHERE b.c12 >= 20
      ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 40""")),

    Q("q_mixture_sample", mixtureSample, Some("""
      WITH by_lang AS (SELECT lang, count(*) AS n
                       FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
                     count(*) AS n_langs
              FROM by_lang),
      rates AS (SELECT lang, n AS n_total,
                       least(1.0, (tot_n / n_langs) / n * 0.5) AS rate
                FROM by_lang, tot),
      scored AS (SELECT d.lang, r.n_total, r.rate,
                        ((d.doc_id * 2654435761) % 4294967296 + 0.5)
                          / 4294967296.0 AS u
                 FROM documents d JOIN rates r ON d.lang = r.lang)
      SELECT lang, CAST(max(n_total) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             round(max(rate), 4) AS rate
      FROM scored GROUP BY 1""")),

    Q("q_tokenizer_fertility", tokenizerFertility, Some("""
      WITH t AS (SELECT lang, length(text) AS nc,
                        len(string_split_regex(lower(text), '\s+')) AS nw,
                        len(regexp_extract_all(lower(text),
                          '[a-z]+|[0-9]|[^a-z0-9\s]+')) AS nb
                 FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(nc) AS BIGINT) AS n_chars,
             CAST(sum(nw) AS BIGINT) AS n_words,
             CAST(sum(nb) AS BIGINT) AS n_bpe,
             CAST(sum(nb) * 10000 // sum(nw) AS BIGINT) AS fertility_e4,
             CAST(sum(nc) * 10000 // sum(nb) AS BIGINT)
               AS chars_per_bpe_e4
      FROM t GROUP BY 1""")),

    Q("q_ngram_novelty", ngramNovelty, Some("""
      WITH tk AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      sh AS (SELECT doc_id,
                    unnest(list_distinct(
                      [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       for i in range(1, len(toks)-1)])) AS s
             FROM tk WHERE len(toks) >= 3),
      df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
      j AS (SELECT doc_id, df FROM sh JOIN df USING (s))
      SELECT doc_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
             CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 10000
                  // count(*) AS BIGINT) AS novelty_e4
      FROM j GROUP BY 1""")),

    Q("q_epoch_expand", epochExpand, Some("""
      WITH d AS (SELECT source,
                        coalesce(TRY_CAST(regexp_extract(source, '(\d+)', 1)
                          AS BIGINT), 0) % 4 + 1 AS repeats,
                        len(string_split_regex(lower(text), '\s+')) AS nt
                 FROM documents),
      x AS (SELECT source, unnest(range(1, repeats + 1)) AS epoch, nt
            FROM d)
      SELECT source, CAST(epoch AS BIGINT) AS epoch,
             count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM x GROUP BY 1, 2""")),

    Q("q_span_corrupt", spanCorrupt, Some("""
      WITH tk AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      c AS (SELECT doc_id, len(toks) AS n,
                   flatten(list_transform(range(1, len(toks) + 1), i ->
                     CASE WHEN i % 7 = 4 AND i < len(toks)
                            THEN ['<extra_id_' ||
                                  CAST((i - 4) // 7 AS VARCHAR) || '>']
                          WHEN i % 7 = 5 THEN []::VARCHAR[]
                          ELSE [toks[i]] END)) AS corr,
                   flatten(list_transform(range(1, len(toks) + 1), i ->
                     CASE WHEN i % 7 = 4 AND i < len(toks)
                            THEN ['<extra_id_' ||
                                  CAST((i - 4) // 7 AS VARCHAR) || '>',
                                  toks[i], toks[i + 1]]
                          ELSE []::VARCHAR[] END)) AS tgt,
                   len(list_filter(range(1, len(toks) + 1),
                     i -> i % 7 = 4 AND i < len(toks))) AS n_spans
            FROM tk)
      SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
             CAST(n - n_spans AS BIGINT) AS n_input_tokens,
             CAST(3 * n_spans AS BIGINT) AS n_target_tokens,
             array_to_string(corr, ' ') AS corrupted,
             array_to_string(tgt, ' ') AS target
      FROM c""")),

    Q("q_vocab_encode", vocabEncode, Some(s"""
      WITH tk AS (SELECT doc_id,
                         string_split_regex(lower(text), '\\s+') AS toks
                  FROM documents),
      tl AS (SELECT doc_id, t.u.pos AS pos, t.u.tok AS tok
             FROM (SELECT doc_id,
                          unnest(list_transform(toks, (x, i) ->
                            {'pos': i - 1, 'tok': x})) AS u
                   FROM tk) t),
      cnts AS (SELECT tok, count(*) AS cnt FROM tl GROUP BY 1),
      vocab AS (SELECT tok,
                       CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC)
                         AS BIGINT) AS id
                FROM cnts ORDER BY cnt DESC, tok ASC
                LIMIT $VocabEncodeSize),
      enc AS (SELECT tl.doc_id, tl.pos, coalesce(v.id, 0) AS id
              FROM tl LEFT JOIN vocab v USING (tok))
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
             array_to_string(list(id ORDER BY pos), ' ') AS ids
      FROM enc GROUP BY 1""")),

    Q("q_fim_transform", fimTransform, Some("""
      WITH tk AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS toks
                  FROM documents),
      c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
                   (doc_id * 2654435761) % 4294967296 AS h1,
                   (doc_id * 2246822519) % 4294967296 AS h2
            FROM tk),
      cut1 AS (SELECT doc_id, toks, n, h2,
                      CASE WHEN n >= 2 THEN h1 % (n - 1) + 1
                           ELSE n END AS a
               FROM c),
      cut2 AS (SELECT doc_id, toks, n, a,
                      CASE WHEN n >= 2 THEN a + 1 + h2 % (n - a)
                           ELSE n END AS b
               FROM cut1)
      SELECT doc_id, n AS n_tokens, CAST(a AS BIGINT) AS n_prefix,
             CAST(b - a AS BIGINT) AS n_middle,
             CAST(n - b AS BIGINT) AS n_suffix,
             array_to_string(flatten([
               ['<fim_prefix>'], toks[1:a],
               ['<fim_suffix>'], toks[b+1:n],
               ['<fim_middle>'], toks[a+1:b]]), ' ') AS fim
      FROM cut2""")),

    Q("q_lang_confusion", langConfusion, Some(langConfusionOracle)),

    Q("q_pad_waste", padWaste, Some("""
      WITH t AS (SELECT CAST(len(string_split_regex(lower(text), '\s+'))
                          AS BIGINT) AS nt
                 FROM documents),
      x AS (SELECT nt, unnest([64, 128, 256, 512]) AS bucket FROM t),
      p AS (SELECT CAST(bucket AS BIGINT) AS bucket, nt,
                   ((nt + bucket - 1) // bucket) * bucket AS padded
            FROM x)
      SELECT bucket, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(padded) AS BIGINT) AS n_padded,
             CAST((sum(padded) - sum(nt)) * 10000 // sum(padded)
               AS BIGINT) AS waste_e4
      FROM p GROUP BY 1""")),

    Q("q_toxicity_blocklist", toxicityBlocklist, Some(s"""
      WITH n AS (SELECT doc_id, source,
                        translate(lower(text), '$LeetFrom', '$LeetTo')
                          AS t
                 FROM documents)
      SELECT doc_id, source,
             CAST(${ToxTerms.map(t =>
               s"(length(t) - length(replace(t, '$t', ''))) // ${t.length}")
               .mkString(" + ")} AS BIGINT) AS tox_hits,
             CAST(${ToxTerms.map(t =>
               s"CASE WHEN length(t) > length(replace(t, '$t', ''))" +
                 s" THEN 1 ELSE 0 END").mkString(" + ")} AS BIGINT)
               AS n_terms_hit,
             ${ToxTerms.map(t =>
               s"(length(t) - length(replace(t, '$t', ''))) // ${t.length}")
               .mkString(" + ")} > 0 AS flagged
      FROM n""")),

    Q("q_hapax_ratio", hapaxProfile, Some("""
      WITH tok AS (SELECT source,
                          unnest(string_split_regex(lower(text), '\s+'))
                            AS w
                   FROM documents),
      wc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
      g AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_hapax
            FROM wc GROUP BY 1)
      SELECT source, vocab, n_tokens, n_hapax,
             CAST(n_hapax * 1000000 // vocab AS BIGINT)
               AS hapax_share_e6,
             CAST(vocab * 1000000 // n_tokens AS BIGINT) AS ttr_e6
      FROM g""")),

    Q("q_bpe_train", bpeTrain, Some(bpeTrainOracle)),
    Q("q_bpe_train_batch", bpeTrainBatch, Some(bpeTrainBatchOracle)),
    Q("q_bpe_train_large", bpeTrainLarge, Some(bpeTrainLargeOracle)),
    Q("q_bpe_encode", bpeEncode, Some(bpeEncodeOracle)),

    Q("q_good_turing", goodTuring, Some(s"""
      WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\\s+'))
                     AS w
                   FROM documents),
      wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY 1),
      fof AS (SELECT c, CAST(count(*) AS BIGINT) AS n_r
              FROM wc GROUP BY 1),
      low AS (SELECT c, n_r,
                     row_number() OVER (ORDER BY c ASC) AS rk
              FROM fof),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS f1
              FROM wc)
      SELECT f.c AS r, f.n_r,
             CAST(coalesce(nx.n_r, 0) AS BIGINT) AS n_r_next,
             CAST((f.c + 1) * coalesce(nx.n_r, 0) * 1000000 // f.n_r
               AS BIGINT) AS r_star_e6,
             CAST(t.f1 * 1000000 // t.n_tokens AS BIGINT)
               AS p_unseen_e6
      FROM low f
      LEFT JOIN fof nx ON nx.c = f.c + 1
      CROSS JOIN tot t
      WHERE f.rk <= $GtClasses""")),

    Q("q_chao1_richness", chao1Richness, Some("""
      WITH tok AS (SELECT source,
                          unnest(string_split_regex(lower(text), '\s+'))
                            AS w
                   FROM documents),
      wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
      g AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS f1,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS f2
            FROM wc GROUP BY 1)
      SELECT source, vocab, n_tokens, f1, f2,
             CAST(CASE WHEN f2 > 0
                    THEN vocab * 100 + f1 * f1 * 100 // (2 * f2)
                    ELSE vocab * 100 + f1 * (f1 - 1) * 100 // 2
                  END AS BIGINT) AS chao1_e2,
             CAST((n_tokens - f1) * 1000000 // n_tokens AS BIGINT)
               AS coverage_e6
      FROM g""")),

    Q("q_bleu_components", bleuComponents, Some(s"""
      WITH tk AS (SELECT doc_id,
                         list_transform(
                           string_split_regex(lower(text), '\\s+'),
                           t -> ${polyHashSql("t", 31L)}
                         )[1:$RougeTokenCap] AS toks
                  FROM documents),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.toks AS ta, b.toks AS tb
                FROM tk a JOIN tk b ON b.doc_id = a.doc_id + 1),
      g AS (SELECT doc_a, doc_b,
                   CAST(len(tb) AS BIGINT) AS len_c,
                   CAST(len(ta) AS BIGINT) AS len_r,
                   list_transform(tb, x -> CAST(x AS VARCHAR)) AS c1,
                   list_transform(ta, x -> CAST(x AS VARCHAR)) AS r1,
                   list_transform(range(1, len(tb)),
                     j -> CAST(tb[j] AS VARCHAR) || '_'
                          || CAST(tb[j + 1] AS VARCHAR)) AS c2,
                   list_transform(range(1, len(ta)),
                     j -> CAST(ta[j] AS VARCHAR) || '_'
                          || CAST(ta[j + 1] AS VARCHAR)) AS r2
            FROM pairs),
      m AS (SELECT doc_a, doc_b, len_c, len_r,
                   CAST(coalesce(list_sum(list_transform(
                     list_distinct(c1), gg -> least(
                       len(list_filter(c1, x -> x = gg)),
                       len(list_filter(r1, x -> x = gg))))), 0)
                     AS BIGINT) AS match1,
                   CAST(coalesce(list_sum(list_transform(
                     list_distinct(c2), gg -> least(
                       len(list_filter(c2, x -> x = gg)),
                       len(list_filter(r2, x -> x = gg))))), 0)
                     AS BIGINT) AS match2
            FROM g),
      f AS (SELECT doc_a, doc_b, len_c, len_r, match1, match2,
                   match1 * 1000000 // len_c AS p1_e6,
                   match2 * 1000000 // greatest(len_c - 1, 1) AS p2_e6,
                   len_c * 1000 // len_r AS brevity_ratio_e3
            FROM m),
      q AS (SELECT *, p1_e6 * p2_e6 AS xx,
                   CAST(floor(sqrt(CAST(p1_e6 * p2_e6 AS DOUBLE)))
                     AS BIGINT) AS kd
            FROM f)
      SELECT doc_a, doc_b, len_c, len_r, match1, match2,
             CAST(p1_e6 AS BIGINT) AS p1_e6,
             CAST(p2_e6 AS BIGINT) AS p2_e6,
             CAST(brevity_ratio_e3 AS BIGINT) AS brevity_ratio_e3,
             CAST(CASE WHEN xx = 0 THEN 0
                  WHEN (kd + 1) * (kd + 1) <= xx THEN kd + 1
                  WHEN kd * kd <= xx THEN kd
                  ELSE kd - 1 END AS BIGINT) AS bleu2_geo_e6
      FROM q""")),

    Q("q_rouge_l", rougeL, Some(s"""
      WITH tk AS (SELECT doc_id,
                         list_transform(
                           string_split_regex(lower(text), '\\s+'),
                           t -> ${polyHashSql("t", 31L)}
                         )[1:$RougeTokenCap] AS toks
                  FROM documents),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.toks AS x, b.toks AS y
                FROM tk a JOIN tk b ON b.doc_id = a.doc_id + 1),
      dp AS (
        -- row-by-row LCS: `row` holds L(i, 0..m); the left-to-right
        -- in-row dependency folds via list_reduce with a LIST
        -- accumulator (the DTW-oracle pattern)
        WITH RECURSIVE rec AS (
          SELECT doc_a, doc_b, x, y, 0 AS i,
                 list_transform(generate_series(0, len(y)),
                   j -> CAST(0 AS BIGINT)) AS row
          FROM pairs
          UNION ALL
          SELECT doc_a, doc_b, x, y, i + 1,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT)],
                     list_transform(generate_series(1, len(y)),
                       j -> [CAST(j AS BIGINT)])),
                   (acc, xj) -> list_append(acc,
                     CASE WHEN x[i + 1] = y[xj[1]]
                          THEN row[xj[1]] + 1
                          ELSE greatest(acc[len(acc)],
                                        row[xj[1] + 1]) END))
          FROM rec WHERE i < len(x))
        SELECT doc_a, doc_b, x, y, row FROM rec
        WHERE i = len(x))
      SELECT doc_a, doc_b,
             CAST(len(x) AS BIGINT) AS n_a,
             CAST(len(y) AS BIGINT) AS n_b,
             CAST(row[len(y) + 1] AS BIGINT) AS lcs_len,
             CAST(2 * row[len(y) + 1] * 1000000 // (len(x) + len(y))
               AS BIGINT) AS rouge_l_f_e6
      FROM dp"""))
  )
}
