package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: how a 100 TB table is ORGANIZED on disk is
  * as load-bearing as any query plan — file-level min/max pruning is
  * the only thing that turns a selective predicate into a selective
  * SCAN.
  */
object Layout {

  /** Dimension bucket width for the z-order key (10 bits each). */
  val ZBuckets = 1024

  /** Z-order clustering audit: bucket orders on (customer, order-day),
    * compute the Morton key ([[graft.ext.ZOrderExpr]]), and report
    * each of the 64 top-level z-ranges with its row count and its
    * span on BOTH dimensions. Because a z-range prefix fixes the top
    * bits of both keys, every bucket's span is ≤ 128 on each dim —
    * the property that makes writing the table sorted by `zkey`
    * prunable on either predicate (a lexicographic sort caps only
    * its leading column; LayoutSpec measures the difference on real
    * file slices). */
  private def zorderLayout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ka = pmod($"o_custkey", lit(ZBuckets)).cast("long")
    val kb = pmod(datediff($"o_orderdate", to_date(lit("1992-01-01"))),
      lit(ZBuckets)).cast("long")
    Tables.orders(s, d)
      .select($"o_orderkey", ka.as("ka"), kb.as("kb"))
      .withColumn("zkey", graft.ext.ZOrderExpr.zorder($"ka", $"kb"))
      .withColumn("zrange", shiftright($"zkey", 14).cast("long"))
      .groupBy($"zrange")
      .agg(count(lit(1)).as("n"),
        min($"ka").as("ka_min"), max($"ka").as("ka_max"),
        min($"kb").as("kb_min"), max($"kb").as("kb_max"))
  }

  private val zorderOracle = s"""
      WITH k AS (SELECT o_orderkey,
                        o_custkey % $ZBuckets AS ka,
                        date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) % $ZBuckets AS kb
                 FROM orders),
      z AS (SELECT o_orderkey, ka, kb,
                   CAST(list_sum(list_transform(range(10),
                     i -> (((ka >> i) & 1) << (2 * i))
                        + (((kb >> i) & 1) << (2 * i + 1)))) AS BIGINT)
                     AS zkey
            FROM k)
      SELECT zkey >> 14 AS zrange,
             CAST(count(*) AS BIGINT) AS n,
             min(ka) AS ka_min, max(ka) AS ka_max,
             min(kb) AS kb_min, max(kb) AS kb_max
      FROM z GROUP BY 1"""

  /** Curve order for the Hilbert key: 10 bits per dimension, matching
    * [[ZBuckets]] so the two layouts are directly comparable. */
  val HilbertOrder = 10

  /** df + Hilbert index `hd` of (`xCol`, `yCol`) on the order-`order`
    * curve — the standard per-bit fold (quadrant digit + rotate), but
    * UNROLLED into `order` chained projections instead of a loop:
    * Catalyst fuses them into one whole-stage-codegen stage, so the
    * "iterative" algorithm runs as straight-line generated code over
    * the scan, no UDF and no custom Expression needed (tier (a) of
    * the operator ladder). All arithmetic is integer-exact. */
  def hilbertIndex(df: DataFrame, xCol: String, yCol: String,
      order: Int = HilbertOrder): DataFrame = {
    var cur = df.withColumn("hx", col(xCol))
      .withColumn("hy", col(yCol)).withColumn("hd", lit(0L))
    for (i <- (order - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      cur = cur
        .withColumn("rx", rx).withColumn("ry", ry)
        .withColumn("hd", col("hd") +
          lit(s * s) * (lit(3L) * col("rx")).bitwiseXOR(col("ry")))
        // rotate: if ry==0 (lower half), swap axes, flipping both when
        // rx==1 — expressed update-style so hx2/hy2 read the PRE-step
        // hx/hy (each withColumn is its own projection)
        .withColumn("hx2", when(col("ry") === 0,
          when(col("rx") === 1, lit(s - 1) - col("hy"))
            .otherwise(col("hy"))).otherwise(col("hx")))
        .withColumn("hy2", when(col("ry") === 0,
          when(col("rx") === 1, lit(s - 1) - col("hx"))
            .otherwise(col("hx"))).otherwise(col("hy")))
        .withColumn("hx", col("hx2")).withColumn("hy", col("hy2"))
        .drop("hx2", "hy2")
    }
    cur.drop("rx", "ry", "hx", "hy")
  }

  /** Hilbert-curve clustering audit — [[zorderLayout]]'s sibling on
    * the SAME bucketed dimensions, because the Hilbert curve is what
    * modern clustering implementations moved to after Z-order: every
    * consecutive pair of cells on the curve is Manhattan-adjacent (no
    * Z-shape jumps across the space), so equal-width key ranges give
    * tighter per-file min/max envelopes on both dimensions
    * (LayoutSpec measures exactly that against the Z-order spans).
    * Same 64-range rollup shape as the Z-order audit; the DuckDB
    * oracle replays the per-bit rotate fold as a generated
    * unrolled-CTE chain (the Holt/PageRank device — SQL column
    * references give the old-value semantics the rotation needs). */
  private def hilbertLayout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ka = pmod($"o_custkey", lit(ZBuckets)).cast("long")
    val kb = pmod(datediff($"o_orderdate", to_date(lit("1992-01-01"))),
      lit(ZBuckets)).cast("long")
    hilbertIndex(
      Tables.orders(s, d).select($"o_orderkey", ka.as("ka"), kb.as("kb")),
      "ka", "kb")
      .withColumn("hrange", shiftright($"hd", 14).cast("long"))
      .groupBy($"hrange")
      .agg(count(lit(1)).as("n"),
        min($"ka").as("ka_min"), max($"ka").as("ka_max"),
        min($"kb").as("kb_min"), max($"kb").as("kb_max"))
  }

  private val hilbertOracle: String = {
    val steps = ((HilbertOrder - 1) to 0 by -1).zipWithIndex.map {
      case (i, idx) =>
        val s = 1L << i
        val prev = if (idx == 0) "k" else s"h$idx"
        s"""h${idx + 1} AS (
           SELECT o_orderkey, ka, kb,
             hd + ${s * s} * xor(
               3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
               CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END) AS hd,
             CASE WHEN (hy & $s) = 0 THEN
               CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END
             ELSE hx END AS hx,
             CASE WHEN (hy & $s) = 0 THEN
               CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END
             ELSE hy END AS hy
           FROM $prev)"""
    }.mkString(",\n      ")
    s"""
      WITH k AS (SELECT o_orderkey,
                        o_custkey % $ZBuckets AS ka,
                        date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE))
                          % $ZBuckets AS kb,
                        o_custkey % $ZBuckets AS hx,
                        date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE))
                          % $ZBuckets AS hy,
                        CAST(0 AS BIGINT) AS hd
                 FROM orders),
      $steps
      SELECT hd >> 14 AS hrange,
             CAST(count(*) AS BIGINT) AS n,
             min(ka) AS ka_min, max(ka) AS ka_max,
             min(kb) AS kb_min, max(kb) AS kb_max
      FROM h$HilbertOrder GROUP BY 1"""
  }

  /** Compaction-bin target size for [[compactionPlan]] (8 KiB demo
    * scale — several bins per partition at every test SF; a production
    * compactor targets 128 MB–1 GB). */
  val CompactionTarget = 8L * 1024

  /** Small-file compaction planner — the maintenance pass every
    * long-lived 100 TB table needs (streaming ingest and dynamic
    * partition overwrite both strew small files; scan throughput dies
    * by open()-call). Within each partition (lang), files are walked
    * in directory order and greedily grouped into ~target-size
    * compaction bins: bin = floor(cumulative-bytes-before / target) —
    * one window over the FILE MANIFEST, which is directory-sized,
    * never data-sized, and embarrassingly parallel across partitions.
    * Emits the per-bin work orders (file count, bytes, id range) a
    * compactor would execute. Integer bytes and an integer `div` keep
    * the plan hash-exact across engines. */
  /** Lakehouse DELETION VECTORS — DELETE/MERGE without file rewrite,
    * the Delta/Iceberg position-delete mechanic a 100 TB table lives
    * on (rewriting a 1 GB file to delete 3 rows is how merge jobs
    * die). Rows address as (file_id, pos); deleted positions fold
    * into ONE bitmap blob per file (bit pos%8 of byte pos/8 — built
    * natively: per-byte bit_or, dense byte grid, hex assembly, no
    * JVM closure), and the READ path re-applies the vector with
    * native expressions only: broadcast the per-file bitmaps, slice
    * one byte with substring-on-binary, test the bit with
    * shiftright/&. The oracle recomputes visibility from the delete
    * PREDICATE — so the whole bitmap encode→decode roundtrip must be
    * bit-perfect for the hash to match, and the per-file bitmap size
    * is pinned too. DV size is bounded by max-position/8 per FILE
    * (file row counts are bounded by the writer — ~128 KB per 1 M-row
    * file), so the broadcast is manifest-sized, never data-sized. */
  private def deletionVectors(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d).select(
      ($"o_orderkey" % 16).as("file_id"),
      expr("o_orderkey div 16").as("pos"),
      $"o_orderkey",
      ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    // the DELETE: a deterministic predicate standing in for a MERGE's
    // matched-set (the oracle replays it directly)
    val dels = base.filter($"o_orderkey" % 97 < 3)
    val bytes = dels
      .select($"file_id", expr("pos div 8").as("byte_idx"),
        expr("cast(shiftleft(1, cast(pos % 8 as int)) as int)")
          .as("bit"))
      .groupBy($"file_id", $"byte_idx")
      .agg(expr("bit_or(bit)").as("byte_val"))
    val extent = bytes.groupBy($"file_id")
      .agg(max($"byte_idx").as("max_byte"))
    val dv = extent
      .select($"file_id",
        explode(expr("sequence(0L, max_byte)")).as("byte_idx"))
      .join(bytes, Seq("file_id", "byte_idx"), "left")
      .groupBy($"file_id")
      .agg(expr("unhex(concat_ws('', transform(array_sort(" +
        "collect_list(struct(byte_idx, coalesce(byte_val, 0) as bv)))," +
        " x -> lpad(hex(x.bv), 2, '0'))))").as("dv"))
    base.join(broadcast(dv), Seq("file_id"), "left")
      // positions past the vector's extent slice an empty byte
      // (conv('') = NULL) — they are simply not deleted
      .withColumn("del", coalesce(
        when($"dv".isNull, lit(false)).otherwise(
          expr("(cast(conv(hex(substring(dv, cast(pos div 8 as int)" +
            " + 1, 1)), 16, 10) as int) >> cast(pos % 8 as int)) & 1")
            === 1),
        lit(false)))
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"del", 1L).otherwise(0L)).as("n_deleted"),
        sum(when(!$"del", 1L).otherwise(0L)).as("n_visible"),
        sum(when(!$"del", $"cents").otherwise(0L)).as("visible_cents"),
        coalesce(max(octet_length($"dv")), lit(0)).cast("long")
          .as("dv_bytes"))
  }

  /** Bloom filter bits per file for [[bloomSkipIndex]] (256-byte
    * blobs — a production file index carries ~1 MB per 1 M-row
    * file). */
  val BloomBits = 2048
  /** Pinned probe keys: present and absent custkeys — deterministic,
    * replayed literally by the oracle. */
  val BloomProbes: Seq[Long] = Seq(1L, 7L, 42L, 123456789L, 999999937L)

  /** Per-FILE BLOOM SKIP INDEX — the other half of file-level data
    * skipping ([[zoneMapSkip]] prunes by range; point lookups on a
    * high-cardinality key need a membership index): each file's
    * custkeys fold into a [[BloomBits]]-bit blob (two scrambled
    * poly-hash probes per key, built with the same native per-byte
    * bit_or + dense-grid + hex assembly as the deletion vectors), and
    * the read path answers "which files can contain key k" by slicing
    * two bytes out of each broadcast blob — manifest-sized work, zero
    * data touched. The oracle recomputes BOTH sides from first
    * principles: the candidate set by replaying the bloom arithmetic
    * (so the blob roundtrip is bit-pinned) and the TRUE file set from
    * the data — and `n_missed` (true files outside the candidate set)
    * is pinned to 0, the no-false-negative guarantee that makes
    * skipping sound. */
  private def bloomSkipIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 2147483647L
    def g1Of(c: org.apache.spark.sql.Column) = pmod(
      graft.ext.PolyHashExpr.polyHash(c.cast("string"), 31L) * 48271L,
      lit(P))
    val base = Tables.orders(s, d).select(
      ($"o_orderkey" % 16).as("file_id"), $"o_custkey")
    val g1 = g1Of($"o_custkey")
    val g2 = pmod(g1 * 48271L, lit(P))
    val bits = base
      .select($"file_id", explode(array(g1 % BloomBits,
        g2 % BloomBits)).as("bit"))
      .distinct()
    val bytes = bits
      .select($"file_id", expr("bit div 8").as("byte_idx"),
        expr("cast(shiftleft(1, cast(bit % 8 as int)) as int)")
          .as("bitv"))
      .groupBy($"file_id", $"byte_idx")
      .agg(expr("bit_or(bitv)").as("byte_val"))
    val grid = s.range(16).toDF("file_id")
      .select($"file_id",
        explode(expr(s"sequence(0L, ${BloomBits / 8 - 1}L)"))
          .as("byte_idx"))
    val bloom = grid.join(bytes, Seq("file_id", "byte_idx"), "left")
      .groupBy($"file_id")
      .agg(expr("unhex(concat_ws('', transform(array_sort(" +
        "collect_list(struct(byte_idx, coalesce(byte_val, 0) as bv)))," +
        " x -> lpad(hex(x.bv), 2, '0'))))").as("bloom"))
    val probes = s.createDataFrame(BloomProbes.map(Tuple1(_)))
      .toDF("probe_key")
      .select($"probe_key", (g1Of($"probe_key") % BloomBits).as("pb1"),
        (pmod(g1Of($"probe_key") * 48271L, lit(P)) % BloomBits)
          .as("pb2"))
    def bitSet(bit: String) =
      expr(s"(cast(conv(hex(substring(bloom, cast($bit div 8 as int)" +
        s" + 1, 1)), 16, 10) as int) >> cast($bit % 8 as int)) & 1 = 1")
    val cand = probes.crossJoin(broadcast(bloom))
      .withColumn("hit", bitSet("pb1") && bitSet("pb2"))
    val truth = base.join(
        broadcast(probes.select($"probe_key")),
        $"o_custkey" === $"probe_key")
      .select($"probe_key", $"file_id").distinct()
      .withColumn("has_key", lit(true))
    cand.join(truth, Seq("probe_key", "file_id"), "left")
      .groupBy($"probe_key")
      .agg(sum(when($"hit", 1L).otherwise(0L)).as("n_candidate_files"),
        sum(when($"has_key".isNotNull, 1L).otherwise(0L))
          .as("n_true_files"),
        (lit(16L) - sum(when($"hit", 1L).otherwise(0L)))
          .as("n_skipped"),
        sum(when($"has_key".isNotNull && !$"hit", 1L).otherwise(0L))
          .as("n_missed"))
  }

  /** Column ENCODING ADVISOR — the parquet-tuning pass behind layout
    * decisions (a 100 TB table's scan cost is mostly decode cost:
    * dictionary + RLE on a low-NDV column is a 10–60× size cliff):
    * for four representative lineitem columns, one pass computes rows,
    * exact NDV, and the intra-order RLE run count (value-change flags
    * from lag windows PARTITIONED by l_orderkey ordered by
    * l_linenumber — the writer's natural clustering; never a global
    * window), then models plain 64-bit vs dictionary cost
    * (rows·ceil(log2 ndv) + ndv·64, the bit width computed EXACTLY as
    * length(bin(ndv−1)) on both engines) and emits the advice. Shape:
    * one window pass + one 1-row aggregate, unpivoted to a 4-row
    * result with stack(). */
  private def encodingAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_partkey")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
    // order on every profiled column too, so rows that still tie are
    // IDENTICAL w.r.t. every run counter — a deterministic metric
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_orderkey").orderBy($"l_linenumber".asc,
        $"l_returnflag".asc, $"l_linestatus".asc, $"l_quantity".asc,
        $"l_partkey".asc)
    val flagged = cols.foldLeft(Tables.lineitem(s, d)
        .select(($"l_quantity".cast("decimal(18,2)") * 100)
          .cast("long").as("l_quantity"),
          $"l_orderkey", $"l_linenumber", $"l_returnflag",
          $"l_linestatus", $"l_partkey")) { (df, c) =>
      df.withColumn(s"chg_$c",
        when(lag(col(c), 1).over(W).isNull ||
          lag(col(c), 1).over(W) =!= col(c), 1L).otherwise(0L))
    }
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap(c => Seq(
        countDistinct(col(c)).as(s"ndv_$c"),
        sum(col(s"chg_$c")).as(s"runs_$c")))
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', ndv_$c, runs_$c").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stacked) as (column_name, ndv, n_runs)"))
      .withColumn("dict_bits",
        expr("case when ndv <= 1 then 0L" +
          " else cast(length(bin(ndv - 1)) as bigint) end"))
      .select($"column_name", $"n_rows", $"ndv", $"n_runs",
        (lit(64L) * $"n_rows").as("bits_plain"),
        ($"dict_bits" * $"n_rows" + $"ndv" * 64L).as("bits_dict"),
        expr("n_runs * 1000000 div n_rows").as("run_ppm"),
        when($"dict_bits" * $"n_rows" + $"ndv" * 64L <
          lit(64L) * $"n_rows", "dict").otherwise("plain").as("advice"))
  }

  private def compactionPlan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id".asc)
      .rowsBetween(Long.MinValue, -1)
    Tables.documents(s, d)
      .select($"lang", $"doc_id", length($"text").cast("long").as("bytes"))
      .withColumn("cum_before", coalesce(sum($"bytes").over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${CompactionTarget}L"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_files"), sum($"bytes").as("bytes"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
  }

  /** Number of output shards for [[shardPack]]. */
  val NShards = 8

  /** Balanced shard packing — the loader-facing layout step of every
    * pretraining run: documents must split into N shards whose TOKEN
    * totals (not doc counts) are near-equal, or the slowest shard
    * gates every data-parallel epoch. Greedy LPT packing is inherently
    * sequential; the scalable static approximation is SERPENTINE
    * (boustrophedon) assignment — rank docs by weight descending and
    * deal them N-at-a-time, reversing direction each pass, so each
    * pass adds its heaviest doc to the previously-lightest shard.
    * The global rank uses [[graft.ext.GlobalRank]] (range-partition +
    * broadcast offsets), never a single-partition sort; everything
    * after the rank is one integer expression and an N-row rollup.
    * Emits the per-shard manifest a loader would consume. */
  private def shardPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val weighted = Tables.documents(s, d)
      .select($"doc_id",
        size(split(lower($"text"), "\\s+")).cast("long").as("n_tok"))
      // rank heaviest-first as an ASCENDING sort on the negated weight
      // so GlobalRank takes its deterministic quantile-literal path
      // (a desc SortOrder would force the range-exchange fallback)
      .withColumn("neg_tok", -$"n_tok")
    val ranked = graft.ext.GlobalRank.withRowNumber(
      weighted, Seq($"neg_tok", $"doc_id"))
    ranked
      .withColumn("pass", expr(s"(rn - 1) div $NShards"))
      .withColumn("pos", (($"rn" - 1) % NShards).cast("long"))
      .withColumn("shard",
        when($"pass" % 2 === 0, $"pos").otherwise(lit(NShards - 1) - $"pos"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("shard_tokens"),
        min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"))
  }

  /** Length-curriculum ordering — the TRAINING-ORDER primitive: short
    * documents first (length deciles from an exact global rank),
    * deterministically shuffled WITHIN each decile (Knuth hash of
    * doc_id — reproducible across runs/partitionings, unlike rand()),
    * with each document's 1-based epoch position and the running
    * character budget at that position (the "how far into the epoch
    * does bucket k start" planner input). Both the rank and the
    * prefix sum ride [[graft.ext.GlobalRank]] — range-partitioned
    * two-phase ranking, NO single-partition window sort anywhere, so
    * the total order costs one range exchange at any scale. Decile
    * boundaries are ntile-exact (bit-identical to SQL ntile(10)). */
  private def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"n_chars",
        pmod($"doc_id" * lit(2654435761L), lit(4294967296L)).as("shuf"))
    val nRow = docs.agg(count(lit(1)).as("n_docs"))
    // plain ascending columns: GlobalRank projects sort.head for its
    // range sampling, so a bare SortOrder would not be selectable
    val ranked = graft.ext.GlobalRank
      .withRowNumber(docs, Seq($"n_chars", $"doc_id"), "len_rn")
      .crossJoin(broadcast(nRow))
      .withColumn("decile",
        graft.ext.GlobalRank.ntileFromRn($"len_rn", $"n_docs", 10))
    val order = Seq($"decile", $"shuf", $"doc_id")
    // one combined pass: rank and running budget share the range
    // partitioning (one boundary sample + one exchange, not two)
    graft.ext.GlobalRank
      .withRowNumberAndPrefixSum(ranked, order, $"n_chars",
        "epoch_pos", "cum_chars")
      .select($"doc_id", $"n_chars", $"decile", $"epoch_pos",
        $"cum_chars")
  }

  private val curriculumOracle = """
      WITH docs AS (SELECT doc_id, n_chars,
                           (doc_id * 2654435761) % 4294967296 AS shuf
                    FROM documents),
      ranked AS (SELECT *,
                        CAST(ntile(10) OVER (ORDER BY n_chars, doc_id)
                          AS BIGINT) AS decile
                 FROM docs)
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, decile,
             CAST(row_number() OVER (ORDER BY decile, shuf, doc_id)
               AS BIGINT) AS epoch_pos,
             CAST(sum(n_chars) OVER (ORDER BY decile, shuf, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_chars
      FROM ranked"""

  /** Zone-map pruning simulator — measures what per-file min/max
    * statistics (parquet row-group zone maps / Delta file stats) buy
    * a date-range predicate under two physical layouts: the NATURAL
    * write order (files cut by order key — dates scattered, so every
    * file's [min,max] straddles the predicate and nothing prunes) and
    * a DATE-CLUSTERED layout (weekly files, what partitioning or
    * Z-ordering by ship date produces — only the predicate's ~13
    * weeks survive). Per layout one map-side aggregate profiles each
    * file to (rows, min, max, matching rows); a file is skipped iff
    * max < lo or min > hi — exactly the reader-side arithmetic of
    * Spark's parquet row-group pruning at 100 TB — and the scan
    * amplification rows_scanned/rows_matched quantifies the layout's
    * pruning power. All counts exact BIGINTs; the file-profile tables
    * are bounded by file count, not row count. */
  private def zoneMapSkip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val lo = datediff(lit("1996-01-01").cast("date"), epoch).cast("long")
    val hi = datediff(lit("1996-03-31").cast("date"), epoch).cast("long")
    val rows = Tables.lineitem(s, d)
      .select($"l_orderkey",
        datediff($"l_shipdate".cast("date"), epoch).cast("long")
          .as("ship_day"))
    def profile(layout: String, fid: org.apache.spark.sql.Column) =
      rows
        .groupBy(fid.as("fid"))
        .agg(count(lit(1)).as("n"), min($"ship_day").as("mn"),
          max($"ship_day").as("mx"),
          sum(when($"ship_day".between(lo, hi), 1L).otherwise(0L))
            .as("matched"))
        .withColumn("skipped", $"mx" < lo || $"mn" > hi)
        .agg(count(lit(1)).as("n_files"),
          sum(when($"skipped", 1L).otherwise(0L)).as("n_skipped"),
          sum($"n").as("rows_total"),
          sum(when(!$"skipped", $"n").otherwise(0L)).as("rows_scanned"),
          sum($"matched").as("rows_matched"))
        .withColumn("layout", lit(layout))
        .withColumn("amp_e3",
          when($"rows_matched" > 0,
            expr("rows_scanned * 1000 div rows_matched")))
    profile("natural", expr("l_orderkey div 4096"))
      .unionByName(profile("date_weekly", expr("ship_day div 7")))
  }

  private val zoneMapOracle = """
      WITH rows0 AS (SELECT l_orderkey,
                            CAST(datediff('day', DATE '1970-01-01',
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                              AS ship_day
                     FROM lineitem),
      bounds AS (SELECT
                   CAST(datediff('day', DATE '1970-01-01',
                     DATE '1996-01-01') AS BIGINT) AS lo,
                   CAST(datediff('day', DATE '1970-01-01',
                     DATE '1996-03-31') AS BIGINT) AS hi),
      nat AS (SELECT l_orderkey // 4096 AS fid,
                     count(*) AS n, min(ship_day) AS mn,
                     max(ship_day) AS mx,
                     sum(CASE WHEN ship_day BETWEEN lo AND hi
                         THEN 1 ELSE 0 END) AS matched
              FROM rows0, bounds GROUP BY 1, lo, hi),
      wk AS (SELECT ship_day // 7 AS fid,
                    count(*) AS n, min(ship_day) AS mn,
                    max(ship_day) AS mx,
                    sum(CASE WHEN ship_day BETWEEN lo AND hi
                        THEN 1 ELSE 0 END) AS matched
             FROM rows0, bounds GROUP BY 1, lo, hi),
      pn AS (SELECT 'natural' AS layout, n, matched,
                    (mx < lo OR mn > hi) AS skipped
             FROM nat, bounds),
      pw AS (SELECT 'date_weekly' AS layout, n, matched,
                    (mx < lo OR mn > hi) AS skipped
             FROM wk, bounds),
      u AS (SELECT * FROM pn UNION ALL SELECT * FROM pw),
      agg AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
                     CAST(sum(CASE WHEN skipped THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_skipped,
                     CAST(sum(n) AS BIGINT) AS rows_total,
                     CAST(sum(CASE WHEN NOT skipped THEN n ELSE 0 END)
                       AS BIGINT) AS rows_scanned,
                     CAST(sum(matched) AS BIGINT) AS rows_matched
              FROM u GROUP BY 1)
      SELECT layout, n_files, n_skipped, rows_total, rows_scanned,
             rows_matched,
             CASE WHEN rows_matched > 0
               THEN CAST(rows_scanned * 1000 // rows_matched AS BIGINT)
             END AS amp_e3
      FROM agg"""

  /** FILE-CLUSTERING OVERLAP DEPTH — the re-cluster decision metric a
    * lakehouse OPTIMIZE reports (Delta/Iceberg "clustering depth"):
    * on the sort axis (ship_day), how many files' zone ranges
    * [min, max] cover a given day — depth 1 = perfectly clustered
    * (zone maps skip everything irrelevant), depth ≈ n_files =
    * fully interleaved (zone maps skip nothing — exactly the
    * [[zoneMapSkip]] 'natural' layout pathology, quantified). The
    * AVERAGE depth needs no sweep at all: ∫depth = Σ file extents, so
    * avg = Σ(mx−mn+1) / span exactly. The MAX depth is a sweep line —
    * +1 at mn, −1 at mx+1, running sum over the distinct-day delta
    * grid via [[graft.ext.GlobalRank.withPrefixSum]] (file count
    * scales with data: an unpartitioned window here would be the
    * audit-banned scale killer) — then one max. Both layouts of
    * [[zoneMapSkip]] are profiled, and the contrast IS the point:
    * date_weekly partitions the axis (depth 1), natural interleaves
    * (depth ≈ n_files). */
  private def fileOverlapDepth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val epoch = lit("1970-01-01").cast("date")
    val rows = Tables.lineitem(s, d)
      .select($"l_orderkey",
        datediff($"l_shipdate".cast("date"), epoch).cast("long")
          .as("ship_day"))
    def profile(layout: String,
        fid: org.apache.spark.sql.Column): DataFrame = {
      // NOTE (r17): the three consumers (both delta legs + the file
      // stats agg) share the groupBy's exchange via ReuseExchange, so
      // an explicit localCheckpoint here bought nothing (measured ±0
      // at the sf0.1 verify config) and was reverted; the query is
      // 1.6 s cold at the official bench config — its 10-15 s verify
      // wall is the 8-core config's per-job overhead across the
      // ~60 small jobs (2 profiles × quantile/offset/window passes).
      val files = rows.groupBy(fid.as("fid"))
        .agg(min($"ship_day").as("mn"), max($"ship_day").as("mx"))
      val deltas = files.select($"mn".as("day"), lit(1L).as("delta"))
        .unionAll(files.select(($"mx" + 1L).as("day"),
          lit(-1L).as("delta")))
        .groupBy($"day").agg(sum($"delta").as("delta"))
      val maxDepth = graft.ext.GlobalRank
        .withPrefixSum(deltas, Seq($"day"), $"delta", "depth")
        .agg(max($"depth").as("max_depth"))
      files
        .agg(count(lit(1)).as("n_files"),
          sum($"mx" - $"mn" + 1).as("sum_extent"),
          (max($"mx") - min($"mn") + 1).as("span_days"))
        .crossJoin(maxDepth) // scalar x scalar
        .select(lit(layout).as("layout"), $"n_files", $"span_days",
          expr("sum_extent * 1000 div span_days").as("avg_depth_e3"),
          $"max_depth")
    }
    profile("natural", expr("l_orderkey div 4096"))
      .unionByName(profile("date_weekly", expr("ship_day div 7")))
  }

  val queries: Seq[Q] = Seq(
    Q("q_file_overlap_depth", fileOverlapDepth, Some("""
      WITH rows0 AS (SELECT l_orderkey,
                            CAST(datediff('day', DATE '1970-01-01',
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                              AS ship_day
                     FROM lineitem),
      natf AS (SELECT l_orderkey // 4096 AS fid,
                      min(ship_day) AS mn, max(ship_day) AS mx
               FROM rows0 GROUP BY 1),
      wkf AS (SELECT ship_day // 7 AS fid,
                     min(ship_day) AS mn, max(ship_day) AS mx
              FROM rows0 GROUP BY 1),
      natd AS (SELECT day, sum(delta) AS delta FROM (
                 SELECT mn AS day, 1 AS delta FROM natf
                 UNION ALL SELECT mx + 1, -1 FROM natf)
               GROUP BY 1),
      wkd AS (SELECT day, sum(delta) AS delta FROM (
                 SELECT mn AS day, 1 AS delta FROM wkf
                 UNION ALL SELECT mx + 1, -1 FROM wkf)
               GROUP BY 1),
      natm AS (SELECT max(depth) AS max_depth FROM (
                 SELECT sum(delta) OVER (ORDER BY day) AS depth
                 FROM natd)),
      wkm AS (SELECT max(depth) AS max_depth FROM (
                 SELECT sum(delta) OVER (ORDER BY day) AS depth
                 FROM wkd)),
      nats AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
                      CAST(sum(mx - mn + 1) AS BIGINT) AS sum_extent,
                      CAST(max(mx) - min(mn) + 1 AS BIGINT)
                        AS span_days
               FROM natf),
      wks AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
                     CAST(sum(mx - mn + 1) AS BIGINT) AS sum_extent,
                     CAST(max(mx) - min(mn) + 1 AS BIGINT) AS span_days
              FROM wkf)
      SELECT 'natural' AS layout, n_files, span_days,
             CAST(sum_extent * 1000 // span_days AS BIGINT)
               AS avg_depth_e3,
             CAST(max_depth AS BIGINT) AS max_depth
      FROM nats, natm
      UNION ALL
      SELECT 'date_weekly', n_files, span_days,
             CAST(sum_extent * 1000 // span_days AS BIGINT),
             CAST(max_depth AS BIGINT)
      FROM wks, wkm""")),
    Q("q_curriculum_order", curriculumOrder, Some(curriculumOracle)),
    Q("q_zone_map_skip", zoneMapSkip, Some(zoneMapOracle)),
    Q("q_zorder_layout", zorderLayout, Some(zorderOracle)),
    Q("q_hilbert_layout", hilbertLayout, Some(hilbertOracle)),

    Q("q_shard_pack", shardPack, Some(s"""
      WITH w AS (SELECT doc_id,
                        CAST(len(string_split_regex(lower(text), '\\s+'))
                          AS BIGINT) AS n_tok
                 FROM documents),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY n_tok DESC, doc_id ASC)
                     AS rn
            FROM w),
      a AS (SELECT n_tok,
                   CASE WHEN ((rn - 1) // $NShards) % 2 = 0
                        THEN (rn - 1) % $NShards
                        ELSE ${NShards - 1} - ((rn - 1) % $NShards)
                   END AS shard
            FROM r)
      SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
             min(n_tok) AS min_tok, max(n_tok) AS max_tok
      FROM a GROUP BY 1""")),

    Q("q_encoding_advisor", encodingAdvisor, Some("""
      WITH b AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                        l_linestatus, l_partkey,
                        CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS l_quantity
                 FROM lineitem),
      f AS (SELECT *,
        CASE WHEN lag(l_returnflag) OVER w IS DISTINCT FROM
          l_returnflag THEN 1 ELSE 0 END AS chg_l_returnflag,
        CASE WHEN lag(l_linestatus) OVER w IS DISTINCT FROM
          l_linestatus THEN 1 ELSE 0 END AS chg_l_linestatus,
        CASE WHEN lag(l_quantity) OVER w IS DISTINCT FROM
          l_quantity THEN 1 ELSE 0 END AS chg_l_quantity,
        CASE WHEN lag(l_partkey) OVER w IS DISTINCT FROM
          l_partkey THEN 1 ELSE 0 END AS chg_l_partkey
        FROM b
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber ASC, l_returnflag ASC,
                              l_linestatus ASC, l_quantity ASC,
                              l_partkey ASC)),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT l_returnflag) AS BIGINT) AS ndv_rf,
        CAST(sum(chg_l_returnflag) AS BIGINT) AS runs_rf,
        CAST(count(DISTINCT l_linestatus) AS BIGINT) AS ndv_sm,
        CAST(sum(chg_l_linestatus) AS BIGINT) AS runs_sm,
        CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv_q,
        CAST(sum(chg_l_quantity) AS BIGINT) AS runs_q,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv_pk,
        CAST(sum(chg_l_partkey) AS BIGINT) AS runs_pk
        FROM f),
      u AS (SELECT n_rows, 'l_returnflag' AS column_name,
                   ndv_rf AS ndv, runs_rf AS n_runs FROM agg
            UNION ALL SELECT n_rows, 'l_linestatus', ndv_sm, runs_sm
            FROM agg
            UNION ALL SELECT n_rows, 'l_quantity', ndv_q, runs_q
            FROM agg
            UNION ALL SELECT n_rows, 'l_partkey', ndv_pk, runs_pk
            FROM agg),
      m AS (SELECT *, CASE WHEN ndv <= 1 THEN 0
                      ELSE CAST(length(bin(ndv - 1)) AS BIGINT) END
                        AS dict_bits
            FROM u)
      SELECT column_name, n_rows, ndv, n_runs,
             CAST(64 * n_rows AS BIGINT) AS bits_plain,
             CAST(dict_bits * n_rows + ndv * 64 AS BIGINT) AS bits_dict,
             CAST(n_runs * 1000000 // n_rows AS BIGINT) AS run_ppm,
             CASE WHEN dict_bits * n_rows + ndv * 64 < 64 * n_rows
                  THEN 'dict' ELSE 'plain' END AS advice
      FROM m""")),

    Q("q_bloom_skip_index", bloomSkipIndex, Some(s"""
      WITH base AS (SELECT o_orderkey % 16 AS file_id, o_custkey
                    FROM orders),
      h AS (SELECT file_id, o_custkey,
                   (${TextOps.polyHashSql("CAST(o_custkey AS VARCHAR)", 31L)})
                     * 48271 % 2147483647 AS g1
            FROM base),
      hh AS (SELECT file_id, g1 % $BloomBits AS b1,
                    (g1 * 48271 % 2147483647) % $BloomBits AS b2
             FROM h),
      bits AS (SELECT DISTINCT file_id, b FROM (
                 SELECT file_id, b1 AS b FROM hh
                 UNION ALL SELECT file_id, b2 FROM hh)),
      probes(probe_key) AS (VALUES ${BloomProbes.map(p =>
        s"(CAST($p AS BIGINT))").mkString(", ")}),
      ph AS (SELECT probe_key,
                    (${TextOps.polyHashSql("CAST(probe_key AS VARCHAR)", 31L)})
                      * 48271 % 2147483647 AS g1
             FROM probes),
      pb AS (SELECT probe_key, g1 % $BloomBits AS pb1,
                    (g1 * 48271 % 2147483647) % $BloomBits AS pb2
             FROM ph),
      files AS (SELECT unnest(range(0, 16)) AS file_id),
      cand AS (SELECT p.probe_key, f.file_id,
                      EXISTS(SELECT 1 FROM bits b
                             WHERE b.file_id = f.file_id
                               AND b.b = p.pb1)
                      AND EXISTS(SELECT 1 FROM bits b
                                 WHERE b.file_id = f.file_id
                                   AND b.b = p.pb2) AS hit
               FROM pb p CROSS JOIN files f),
      truth AS (SELECT DISTINCT probe_key, file_id
                FROM base JOIN probes ON o_custkey = probe_key)
      SELECT c.probe_key,
             CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_candidate_files,
             CAST(count(t.file_id) AS BIGINT) AS n_true_files,
             CAST(16 - sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_skipped,
             CAST(sum(CASE WHEN t.file_id IS NOT NULL AND NOT hit
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
      FROM cand c
      LEFT JOIN truth t ON t.probe_key = c.probe_key
                        AND t.file_id = c.file_id
      GROUP BY 1""")),

    Q("q_deletion_vectors", deletionVectors, Some("""
      WITH base AS (SELECT o_orderkey % 16 AS file_id,
                           o_orderkey // 16 AS pos,
                           o_orderkey,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                             * 100 AS BIGINT) AS cents,
                           (o_orderkey % 97 < 3) AS del
                    FROM orders),
      ext AS (SELECT file_id,
                     CAST(max(pos // 8) + 1 AS BIGINT) AS dv_bytes
              FROM base WHERE del GROUP BY 1)
      SELECT b.file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT)
               AS n_deleted,
             CAST(sum(CASE WHEN del THEN 0 ELSE 1 END) AS BIGINT)
               AS n_visible,
             CAST(sum(CASE WHEN del THEN 0 ELSE cents END) AS BIGINT)
               AS visible_cents,
             CAST(coalesce(e.dv_bytes, 0) AS BIGINT) AS dv_bytes
      FROM base b LEFT JOIN ext e USING (file_id)
      GROUP BY b.file_id, e.dv_bytes""")),

    Q("q_compaction_plan", compactionPlan, Some(s"""
      WITH f AS (SELECT lang, doc_id,
                        CAST(length(text) AS BIGINT) AS bytes
                 FROM documents),
      c AS (SELECT lang, doc_id, bytes,
                   coalesce(sum(bytes) OVER (
                     PARTITION BY lang ORDER BY doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cum_before
            FROM f),
      b AS (SELECT lang, doc_id, bytes,
                   CAST(cum_before // $CompactionTarget AS BIGINT) AS bin
            FROM c)
      SELECT lang, bin, count(*) AS n_files,
             CAST(sum(bytes) AS BIGINT) AS bytes,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM b GROUP BY 1, 2""")))
}
