package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Probabilistic-sketch operators: Bloom-filter pre-join pruning and
  * Count-Min heavy hitters — the two sketch patterns a 100 TB pipeline
  * leans on when the exact structure (the dim-key set / the key
  * histogram) is too large or too expensive to move.
  *
  * Both follow the same lifecycle:
  *   1. a mergeable typed [[Aggregator]] builds the sketch — partials
  *      combine map-side, so only the FIXED-SIZE table (KBs) crosses
  *      the shuffle regardless of input rows;
  *   2. the one-row result is taken on the driver (`head()` of a
  *      single bounded row — the same contract as Spark's own
  *      `DataFrameStatFunctions.bloomFilter/countMinSketch`, NOT a
  *      data collect);
  *   3. a codegen probe expression ([[graft.ext.BloomProbeExpr]] /
  *      [[graft.ext.CmsProbeExpr]]) applies it at the fact-table scan,
  *      inside whole-stage codegen, before any shuffle.
  *
  * Because Bloom has no false negatives and CMS never under-counts,
  * an EXACT pass over the sketch-pruned remainder reproduces the exact
  * answer — so both catalog queries carry plain-SQL DuckDB oracles
  * even though the pruning step is probabilistic.
  */
object Sketches {

  /** SplitMix64 finalizer over (key, salt) — the shared hash family of
    * every sketch build/probe pair. Deterministic plain-long
    * arithmetic: the Aggregator (Scala), interpreted eval, and the
    * generated Java call this same static forwarder. */
  def mix(x: Long, salt: Long): Long = {
    var z = x + salt * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def longArrayEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  // ---------------------------------------------------------------- Bloom

  val BloomBits = 1 << 14   // 16 Kbit = 2 KB
  val BloomHashes = 6

  /** Bloom filter as a mergeable aggregate: reduce sets k bits, merge
    * ORs words. ~n=1000 keys at m=16384, k=6 → fp ≈ (1-e^{-kn/m})^k
    * ≈ 2e-3; false positives only cost re-checked rows, never
    * correctness (the exact join after the probe removes them). */
  object BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](BloomBits / 64)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var j = 0
      while (j < BloomHashes) {
        val pos = (mix(x, 101L + j) & (BloomBits - 1)).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        j += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  // ------------------------------------------------------------ Count-Min

  val CmsDepth = 5
  val CmsWidth = 1 << 16    // 5 × 65536 counters = 2.6 MB

  /** Count-Min sketch as a mergeable aggregate: reduce increments one
    * counter per row (depth rows), merge adds tables element-wise.
    * Point estimate = min over rows — never below the true count. */
  object CmsAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](CmsDepth * CmsWidth)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < CmsDepth) {
        buf(i * CmsWidth + (mix(x, i + 1L) & (CmsWidth - 1)).toInt) += 1L
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** Collapse a sketch aggregation to its single driver-side table —
    * one row of fixed size (2 KB Bloom / 2.6 MB CMS), bounded by the
    * sketch parameters, never by the data. */
  private def sketchOf(df: DataFrame): Array[Long] =
    df.head().getSeq[Long](0).toArray

  // ------------------------------------------------------------- queries

  /** The nation whose suppliers the bloom-prejoin query keeps; picked
    * arbitrarily, exists at every SF incl. sf0.001. */
  val BloomNation = "NATION_12"
  /** Heavy-hitter threshold: customers with ≥ this many orders. */
  val HeavyThreshold = 18L

  /** Bloom pre-join pruning: revenue by return flag for lineitems of
    * one nation's suppliers. At 100 TB the supplier set of a nation is
    * too big to broadcast as data but its Bloom filter is 2 KB — the
    * probe drops ~96 % of fact rows AT THE SCAN (before the join
    * shuffle), and the exact join then removes the filter's false
    * positives, so the result is exactly the plain join's. */
  private def bloomPrejoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter($"n_name" === BloomNation)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val bloomAgg = udaf(BloomAgg)
    val bloom = sketchOf(dim.agg(bloomAgg($"s_suppkey")))
    val pre = Tables.lineitem(s, d)
      .filter(graft.ext.BloomProbeExpr.probe($"l_suppkey", bloom, BloomHashes))
    pre.join(dim.hint("broadcast"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** CMS heavy hitters: customers with ≥ HeavyThreshold orders, found
    * by a sketch candidate pass + exact confirm. Pass 1 builds the CMS
    * (map-side mergeable, 2.6 MB across the wire); pass 2 keeps only
    * rows whose key the sketch says MIGHT be heavy (conservative ⇒ no
    * heavy key is ever lost) — at scale the exact groupBy then
    * shuffles only the surviving hot-key rows, not the full key space;
    * the HAVING confirm makes the output exact. */
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
    val cmsAgg = udaf(CmsAgg)
    val cms = sketchOf(orders.agg(cmsAgg($"o_custkey")))
    orders
      .filter(graft.ext.CmsProbeExpr.estimate(
        $"o_custkey", cms, CmsDepth, CmsWidth) >= HeavyThreshold)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter($"n_orders" >= HeavyThreshold)
  }

  /** Number of minimum hash values the KMV distinct sketch keeps. */
  val KmvK = 256

  /** KMV (k-minimum-values) distinct-count sketch: hash every key with
    * the portable polynomial hash, keep the K smallest DISTINCT hash
    * values, and estimate |distinct| = (K−1) · P / v_K from the K-th
    * value. Same job as HLL's approx_count_distinct but fully
    * DETERMINISTIC — no seeded randomness — so unlike q_approx_distinct
    * (rows-only) this sketch estimate carries an exact DuckDB replay
    * oracle. Scale shape: the min-K is TakeOrderedAndProject — each
    * partition surfaces its own K smallest, only K·partitions hashes
    * reach the driver-side limit, and the sketch is mergeable by
    * union + re-min-K (how per-day sketches roll up to a month).
    *
    * KMV needs a UNIFORM hash; the raw polynomial of a short numeric
    * string clusters near small values (measured: estimate 11M for
    * 15k distinct). Two Lehmer steps (· 48271 mod P — the minstd
    * generator, every intermediate < 2⁴⁷ so both engines stay exact)
    * spread the field; measured estimate error ≈ 1.5 % at K=256,
    * inside the 1/√K ≈ 6 % theory bound (spec-asserted). */
  /** The KEYED form of [[kmvDistinct]] — per event type — and the
    * batch twin of the streaming
    * [[graft.streaming.EventStreams.KmvProcessor]] (StreamBatchParity
    * pins bit-equality). The per-type k-smallest-distinct-hash pass
    * rides the custom TopKPerKey operator (bounded-heap partial pass;
    * never a per-type sort of all hashes); same scrambled poly hash,
    * same (k−1)·P/vk estimator, exact countDistinct alongside. */
  private def kmvByType(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 2147483647L
    val raw = graft.ext.PolyHashExpr.polyHash(
      $"user_id".cast("string"), 31L)
    val h = pmod(pmod(raw * 48271L, lit(P)) * 48271L, lit(P))
    val hv = Tables.events(s, d)
      .select($"event_type", h.as("hv")).distinct()
    val topk = graft.ext.TopKPerKey.topK(hv, Seq("event_type"),
      Seq(("hv", true)), KmvK)
    val exact = Tables.events(s, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_exact"))
    topk.groupBy($"event_type")
      .agg(count(lit(1)).as("k"), max($"hv").as("vk"))
      .join(exact, "event_type")
      .select($"event_type", $"k", $"vk",
        // vk==0 (hash 0 is the only retained value) would be 0/0 = NaN
        // here but a raised division-by-zero in DuckDB — pin est=0.0
        // on all sides (matches the streaming twin's guard).
        when($"vk" === 0L, lit(0.0))
          .otherwise(round(($"k" - 1).cast("double") * P / $"vk", 1))
          .as("est"),
        $"n_exact")
  }

  private def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 2147483647L
    val raw = graft.ext.PolyHashExpr.polyHash(
      $"o_custkey".cast("string"), 31L)
    val h = pmod(pmod(raw * 48271L, lit(P)) * 48271L, lit(P))
    val topK = Tables.orders(s, d)
      .select(h.as("hv")).distinct()
      .orderBy($"hv".asc).limit(KmvK)
    val exact = Tables.orders(s, d)
      .agg(countDistinct($"o_custkey").as("n_exact"))
    topK.agg(count(lit(1)).as("k"), max($"hv").as("vk"))
      .crossJoin(exact)
      .select($"k", $"vk",
        when($"vk" === 0L, lit(0.0)) // same guard as kmvByType
          .otherwise(round(($"k" - 1).cast("double") * P / $"vk", 1))
          .as("est"),
        $"n_exact")
  }

  /** Count-Min row-multiplier constants (pairwise-independent-ish
    * Lehmer multipliers) and table width for [[countMinTable]]. */
  private val CmtA = Seq(1000003L, 48271L, 69621L, 40692L)
  private val CmtP = 2147483647L
  private val CmtW = 256L

  /** Count-Min point estimates, REPLAYED cell by cell — the companion
    * to q_heavy_hitters that opens the sketch box: where that query
    * treats the CMS as a black-box [[Aggregator]] and oracles only the
    * exact survivor counts, this one builds the whole d=4 × w=256
    * table in plain relational algebra (explode 4 integer Lehmer
    * hashes per event, ONE map-side-combinable groupBy → 1024 cells —
    * the table stays 1024 rows at ANY event volume, the textbook
    * mergeable-sketch property) so DuckDB reproduces every cell and
    * the estimates are pinned bit-for-bit, not bounds-only. The probe
    * side takes the 10 heaviest users exactly (TakeOrderedAndProject —
    * no global window), broadcasts their 40 (row, bucket) probes into
    * the tiny cell table, and emits est = min over rows beside the
    * exact count: overcount ≥ 0 (CMS never undercounts) and the
    * ε = 2/w Markov bound land as deterministic flag columns the
    * oracle must match. */
  private def countMinTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def h(i: Int, u: org.apache.spark.sql.Column) =
      pmod(pmod((u + 1L) * CmtA(i), lit(CmtP)), lit(CmtW))
    def hashes(u: org.apache.spark.sql.Column) =
      posexplode(array(CmtA.indices.map(i => h(i, u)): _*))
        .as(Seq("row_i", "bucket"))
    val ev = Tables.events(s, d).select($"user_id")
    val cells = ev.select(hashes($"user_id"))
      .groupBy($"row_i", $"bucket").agg(count(lit(1)).as("cnt"))
    val tot = ev.agg(count(lit(1)).as("n_total"))
    val top = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"user_id".asc).limit(10)
    top.select($"user_id", $"exact_cnt", hashes($"user_id"))
      .join(broadcast(cells), Seq("row_i", "bucket"))
      .groupBy($"user_id", $"exact_cnt")
      .agg(min($"cnt").as("est_cnt"))
      .crossJoin(broadcast(tot))
      .select($"user_id", $"exact_cnt", $"est_cnt", $"n_total",
        ($"est_cnt" - $"exact_cnt").as("overcount"),
        (($"est_cnt" - $"exact_cnt") * CmtW <= $"n_total" * 2L)
          .as("within_bound"))
  }

  /** Cutoff splitting the order history into the two key sets whose
    * overlap [[thetaIntersect]] estimates. */
  val ThetaPivot = "1998-01-01"

  /** Theta-sketch set intersection (Dasgupta et al., "Theta-Sketch
    * Framework", 2016): estimate |A ∩ B| for two key sets from their
    * KMV sketches alone — A = customers ordering before [[ThetaPivot]],
    * B = customers ordering after. Each side keeps its [[KmvK]]
    * smallest distinct key hashes; θ = min(vk_A, vk_B) is the shared
    * sampling threshold, and est = |{h ∈ A∩B sketch samples : h < θ}|
    * · P / θ. Fully deterministic (same double-Lehmer spread as
    * [[kmvDistinct]]), so the DuckDB oracle replays the estimate
    * bit-for-bit, and the exact |A ∩ B| companion rides along — at
    * 100 TB the two sketches are each a 256-value TakeOrdered over a
    * per-key rollup (one shuffle on the key, constant bytes to the
    * driver side of the plan), while the exact overlap the sketch
    * replaces would need the full key sets co-shuffled every time
    * two corpus snapshots are compared. */
  private def thetaIntersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 2147483647L
    val pivot = lit(ThetaPivot).cast("timestamp")
    val flags = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(max(when($"o_orderdate" < pivot, 1L).otherwise(0L)).as("pre"),
        max(when($"o_orderdate" >= pivot, 1L).otherwise(0L)).as("post"))
    val raw = graft.ext.PolyHashExpr.polyHash(
      $"o_custkey".cast("string"), 31L)
    val hv = pmod(pmod(raw * 48271L, lit(P)) * 48271L, lit(P))
    // ONE (hv, pre, post) rollup replaces the two per-side
    // filter+distinct shuffles (r18, guide §2.4): hv is a pure
    // function of the custkey, so distinct-hv-per-side ==
    // groupBy(hv) with OR'd side flags — max() over 0/1. The lazy
    // localCheckpoint materializes the vocabulary-sized table once
    // for its four consumers (aStats/bStats/the sketch join) instead
    // of replaying the rollup per subtree; each sketch is then a
    // TakeOrdered over it — no further exchange. (NOT fault-tolerant —
    // swap for a reliable checkpoint dir at cluster scale.)
    val byHv = flags.withColumn("hv", hv)
      .groupBy($"hv")
      .agg(max($"pre").as("pre"), max($"post").as("post"))
      .localCheckpoint(eager = false)
    def sketch(side: String) = byHv.filter(col(side) === 1L)
      .select($"hv").orderBy($"hv".asc).limit(KmvK)
    val a = sketch("pre")
    val b = sketch("post")
    val aStats = a.agg(count(lit(1)).as("k_a"), max($"hv").as("vk_a"))
    val bStats = b.agg(count(lit(1)).as("k_b"), max($"hv").as("vk_b"))
    val nCommon = a.join(b, "hv")
      .crossJoin(broadcast(aStats)).crossJoin(broadcast(bStats))
      .agg(coalesce(sum(when($"hv" < least($"vk_a", $"vk_b"), 1L)
        .otherwise(0L)), lit(0L)).as("n_common"))
    val exact = flags.agg(
      sum(when($"pre" === 1L && $"post" === 1L, 1L).otherwise(0L))
        .as("n_exact_inter"))
    aStats.crossJoin(bStats).crossJoin(nCommon).crossJoin(exact)
      .select($"k_a", $"vk_a", $"k_b", $"vk_b", $"n_common",
        least($"vk_a", $"vk_b").as("theta"),
        // theta==0 ⇒ n_common==0 (no hv < 0), so the ratio is 0/0 —
        // same reachable-hash-0 guard as the KMV estimators.
        when(least($"vk_a", $"vk_b") === 0L, lit(0.0))
          .otherwise(round($"n_common".cast("double") * P /
            least($"vk_a", $"vk_b"), 1)).as("est_inter"),
        $"n_exact_inter")
  }

  /** Row-sampling rate denominator for [[sampleAggCi]] and key-
    * sampling rate for [[selfJoinSizeEst]] (1 in 16). */
  val SampleMod = 16L

  /** Approximate-query-processing aggregate with a deterministic
    * hash sample + Horvitz–Thompson estimate + error certificate:
    * per returnflag, sample lineitem rows whose Lehmer-hashed row key
    * falls in 1/[[SampleMod]] of the hash space, scale the sampled
    * cents sum by [[SampleMod]], and emit the EXACT sum beside it
    * with err_ppm and a 3σ certificate — (est−exact)² ≤
    * 9·(mod−1)·Σx², the Bernoulli-sampling variance bound decided
    * entirely in decimal(38,0)/HUGEINT (no sqrt, no doubles). The
    * sample predicate is a pure function of the row key, so the
    * "sample" is reproducible across engines, runs, and partitions —
    * the property that lets a 100 TB deployment cache the 1/16th
    * physical sample as its own table and answer exploratory
    * aggregates 16× cheaper with a certified error. Shape: ONE scan,
    * one combinable groupBy — the exact companion shares the pass. */
  private def sampleAggCi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val P = 2147483647L
    val cents = ($"l_extendedprice".cast("decimal(18,2)") * 100)
      .cast("long")
    // TWO Lehmer steps before the mod-16 cut: row keys are
    // orderkey·8+linenumber with linenumber ∈ 1..7, and one step of
    // (k+1)·48271 mod P walks the mod-16 residue by a FIXED −1 per
    // slot (48271 ≡ 15, 8·48271 ≡ 8 mod 16), so the skipped slot-0
    // and short orders bias which residues exist (measured 4.7 %
    // rate at a nominal 6.25 % and a 22 % estimate bias). The second
    // multiply spreads the already-randomized value, killing the
    // residue structure (measured rate 6.27 %).
    val rowKey = $"l_orderkey" * 8L + $"l_linenumber"
    val sampled = pmod(pmod(pmod((rowKey + 1L) * 48271L, lit(P))
      * 69621L, lit(P)), lit(SampleMod)) === 0L
    Tables.lineitem(s, d)
      .select($"l_returnflag", cents.as("cents"), sampled.as("in_sample"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"in_sample", 1L).otherwise(0L)).as("n_sample"),
        sum($"cents").as("exact_cents"),
        sum(when($"in_sample", $"cents").otherwise(0L)).as("samp_cents"),
        sum($"cents".cast(dec) * $"cents").as("ssq"))
      .withColumn("est_cents", $"samp_cents" * SampleMod)
      .withColumn("err_ppm", expr(
        "cast(case when exact_cents = 0 then -1 else" +
          " cast(abs(est_cents - exact_cents) as decimal(38,0))" +
          " * 1000000 div cast(exact_cents as decimal(38,0))" +
          " end as bigint)"))
      .withColumn("within_3sigma", expr(
        "cast(est_cents - exact_cents as decimal(38,0))" +
          " * (est_cents - exact_cents)" +
          s" <= ssq * ${9L * (SampleMod - 1L)}"))
      .select($"l_returnflag", $"n_total", $"n_sample", $"exact_cents",
        $"est_cents", $"err_ppm", $"within_3sigma")
  }

  /** Self-join size (second frequency moment F₂ = Σ_k c_k²) of
    * lineitem's part key, estimated from a 1/[[SampleMod]]
    * DETERMINISTIC key sample — the quantity a cost-based optimizer
    * needs before committing to a join strategy on a possibly-skewed
    * key, and the classic streaming F₂ target (Alon–Matias–Szegedy
    * 1996; this is the key-sample estimator, not the random-sign
    * sketch, so it replays exactly). Sampling KEYS (not rows) keeps
    * the estimator unbiased for Σc²: each sampled key contributes its
    * full squared count, scaled by the inverse inclusion rate. One
    * groupBy(partkey) + one tiny aggregate; est and exact share the
    * same per-key rollup, so the exact companion is free at any
    * scale. */
  private def selfJoinSizeEst(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val P = 2147483647L
    val keySampled = pmod(pmod(($"l_partkey" + 1L) * 48271L, lit(P)),
      lit(SampleMod)) === 0L
    Tables.lineitem(s, d)
      .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
      .withColumn("in_sample", keySampled)
      .agg(count(lit(1)).as("n_keys"),
        sum(when($"in_sample", 1L).otherwise(0L)).as("n_sample_keys"),
        sum($"cnt".cast(dec) * $"cnt").cast("long").as("exact_f2"),
        (sum(when($"in_sample", $"cnt".cast(dec) * $"cnt")
          .otherwise(lit(0L).cast(dec))) * SampleMod)
          .cast("long").as("est_f2"))
      .withColumn("err_ppm", expr(
        "cast(case when exact_f2 = 0 then -1 else" +
          " cast(abs(est_f2 - exact_f2) as decimal(38,0))" +
          " * 1000000 div cast(exact_f2 as decimal(38,0))" +
          " end as bigint)"))
      .select($"n_keys", $"n_sample_keys", $"exact_f2", $"est_f2",
        $"err_ppm")
  }

  /** Capture–recapture (Chapman) population estimate from the two
    * calendar-half "captures" of the user base — the cardinality
    * ESTIMATION tier's closed-form companion: HLL/KMV estimate a set
    * you scanned; capture–recapture estimates the population you
    * HAVEN'T fully seen (how many users exist, given two overlapping
    * sightings — equivalently, a dedup corpus's true size from two
    * crawl snapshots). Split at the date-range midpoint (the rddSharp
    * cut): n1/n2 users active per half, m in both;
    * Chapman N̂ = (n1+1)(n2+1)/(m+1) − 1 (bias-corrected
    * Lincoln–Petersen, finite for m = 0) and its variance, both exact
    * integer truncating divisions. Shape: one user×half rollup
    * (map-side combinable), one 1-row aggregate — any volume. */
  private def captureRecapture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val act = Tables.events(s, d)
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("long").as("dayn"))
    val cut = act.agg(expr("(min(dayn) + max(dayn)) div 2").as("cut"))
    act.crossJoin(broadcast(cut))
      .groupBy($"user_id")
      .agg(max(when($"dayn" <= $"cut", 1L).otherwise(0L)).as("in1"),
        max(when($"dayn" > $"cut", 1L).otherwise(0L)).as("in2"))
      .agg(sum($"in1").as("n1"), sum($"in2").as("n2"),
        sum($"in1" * $"in2").as("m"),
        count(lit(1)).as("n_observed"))
      .select($"n1", $"n2", $"m", $"n_observed",
        expr(s"cast(cast(n1 + 1 as $dec) * (n2 + 1) div (m + 1) - 1" +
          " as bigint)").as("chapman_n"),
        when($"m" > 0,
          expr(s"cast(cast(n1 as $dec) * n2 div m as bigint)"))
          .otherwise(lit(-1L)).as("lincoln_n"),
        expr(s"cast(cast(n1 + 1 as $dec) * (n2 + 1) * (n1 - m)" +
          s" * (n2 - m) div (cast(m + 1 as $dec) * (m + 1) * (m + 2))" +
          " as bigint)").as("chapman_var"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_capture_recapture", captureRecapture, Some("""
      WITH act AS (SELECT user_id,
                          CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                            AS BIGINT) AS dayn
                   FROM events),
      cut AS (SELECT (min(dayn) + max(dayn)) // 2 AS cut FROM act),
      u AS (SELECT user_id,
                   max(CASE WHEN dayn <= cut THEN 1 ELSE 0 END) AS in1,
                   max(CASE WHEN dayn > cut THEN 1 ELSE 0 END) AS in2
            FROM act, cut GROUP BY 1),
      g AS (SELECT CAST(sum(in1) AS HUGEINT) AS n1,
                   CAST(sum(in2) AS HUGEINT) AS n2,
                   CAST(sum(in1 * in2) AS HUGEINT) AS m,
                   CAST(count(*) AS BIGINT) AS n_observed
            FROM u)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(m AS BIGINT) AS m, n_observed,
             CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
               AS chapman_n,
             CAST(CASE WHEN m > 0 THEN n1 * n2 // m ELSE -1 END
               AS BIGINT) AS lincoln_n,
             CAST((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
               // ((m + 1) * (m + 1) * (m + 2)) AS BIGINT)
               AS chapman_var
      FROM g"""),
      ),

    Q("q_count_min_table", countMinTable, Some("""
      WITH a(i, m) AS (VALUES (0, 1000003), (1, 48271), (2, 69621),
                              (3, 40692)),
      ev AS (SELECT user_id FROM events),
      cells AS (SELECT i AS row_i,
                       ((user_id + 1) * m % 2147483647) % 256
                         AS bucket,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM ev, a GROUP BY 1, 2),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ev),
      top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
              FROM ev GROUP BY 1
              ORDER BY exact_cnt DESC, user_id ASC LIMIT 10),
      th AS (SELECT user_id, exact_cnt, i AS row_i,
                    ((user_id + 1) * m % 2147483647) % 256 AS bucket
             FROM top, a),
      probes AS (SELECT user_id, exact_cnt,
                        CAST(min(cnt) AS BIGINT) AS est_cnt
                 FROM th JOIN cells USING (row_i, bucket)
                 GROUP BY 1, 2)
      SELECT user_id, exact_cnt, est_cnt, n_total,
             CAST(est_cnt - exact_cnt AS BIGINT) AS overcount,
             (est_cnt - exact_cnt) * 256 <= n_total * 2
               AS within_bound
      FROM probes, tot""")),
    Q("q_kmv_by_type", kmvByType, Some(s"""
      WITH h AS (SELECT DISTINCT event_type,
                   ((${TextOps.polyHashSql("CAST(user_id AS VARCHAR)", 31L)})
                    * 48271 % 2147483647) * 48271 % 2147483647
                     AS hv
                 FROM events),
      topk AS (SELECT event_type, hv FROM (
                 SELECT event_type, hv,
                        row_number() OVER (PARTITION BY event_type
                                           ORDER BY hv ASC) AS rn
                 FROM h) WHERE rn <= $KmvK),
      agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                     max(hv) AS vk
              FROM topk GROUP BY 1),
      ex AS (SELECT event_type,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
             FROM events GROUP BY 1)
      SELECT agg.event_type, k, vk,
             CASE WHEN vk = 0 THEN 0.0
                  ELSE round((k - 1) * 1.0 * 2147483647 / vk, 1)
             END AS est,
             n_exact
      FROM agg JOIN ex USING (event_type)""")),

    Q("q_approx_distinct_kmv", kmvDistinct, Some(s"""
      WITH h AS (SELECT DISTINCT
                   ((${TextOps.polyHashSql("CAST(o_custkey AS VARCHAR)", 31L)})
                    * 48271 % 2147483647) * 48271 % 2147483647
                     AS hv
                 FROM orders),
      topk AS (SELECT hv FROM h ORDER BY hv ASC LIMIT $KmvK),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
                     max(hv) AS vk
              FROM topk),
      ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
             FROM orders)
      SELECT k, vk,
             CASE WHEN vk = 0 THEN 0.0
                  ELSE round((k - 1) * 1.0 * 2147483647 / vk, 1)
             END AS est,
             n_exact
      FROM agg, ex""")),

    Q("q_bloom_prejoin", bloomPrejoin, Some(s"""
      SELECT l_returnflag,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '$BloomNation'
      GROUP BY 1"""), headline = true),

    Q("q_heavy_hitters", heavyHitters, Some(s"""
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      GROUP BY 1
      HAVING count(*) >= $HeavyThreshold""")),

    Q("q_sketch_intersect", thetaIntersect, Some(s"""
      WITH flags AS (SELECT o_custkey,
                       max(CASE WHEN o_orderdate < TIMESTAMP '$ThetaPivot'
                           THEN 1 ELSE 0 END) AS pre,
                       max(CASE WHEN o_orderdate >= TIMESTAMP '$ThetaPivot'
                           THEN 1 ELSE 0 END) AS post
                     FROM orders GROUP BY 1),
      h AS (SELECT pre, post,
              ((${TextOps.polyHashSql("CAST(o_custkey AS VARCHAR)", 31L)})
               * 48271 % 2147483647) * 48271 % 2147483647 AS hv
            FROM flags),
      ad AS (SELECT DISTINCT hv FROM h WHERE pre = 1),
      a AS (SELECT hv FROM ad ORDER BY hv ASC LIMIT $KmvK),
      bd AS (SELECT DISTINCT hv FROM h WHERE post = 1),
      b AS (SELECT hv FROM bd ORDER BY hv ASC LIMIT $KmvK),
      sa AS (SELECT CAST(count(*) AS BIGINT) AS k_a, max(hv) AS vk_a
             FROM a),
      sb AS (SELECT CAST(count(*) AS BIGINT) AS k_b, max(hv) AS vk_b
             FROM b),
      nc AS (SELECT CAST(coalesce(sum(CASE WHEN hv < least(vk_a, vk_b)
                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_common
             FROM (SELECT a.hv FROM a JOIN b USING (hv)) t, sa, sb),
      ex AS (SELECT CAST(sum(CASE WHEN pre = 1 AND post = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_inter
             FROM flags)
      SELECT k_a, vk_a, k_b, vk_b, n_common,
             least(vk_a, vk_b) AS theta,
             CASE WHEN least(vk_a, vk_b) = 0 THEN 0.0
                  ELSE round(n_common * 1.0 * 2147483647
                             / least(vk_a, vk_b), 1)
             END AS est_inter,
             n_exact_inter
      FROM sa, sb, nc, ex"""),
      // headline (round 13, VERDICT r12 #5): the AQP/sketch tier had
      // zero bench representation — this is its most join-shaped
      // member (two KMV top-k sets + a hash-join confirm + the exact
      // companion), so a plan regression in the tier shows up here
      headline = true),

    Q("q_sample_agg_ci", sampleAggCi, Some(s"""
      WITH li AS (SELECT l_returnflag,
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents,
                    ((l_orderkey * 8 + l_linenumber + 1) * 48271
                      % 2147483647) * 69621 % 2147483647
                      % $SampleMod = 0 AS in_sample
                  FROM lineitem),
      g AS (SELECT l_returnflag,
              CAST(count(*) AS BIGINT) AS n_total,
              CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sample,
              CAST(sum(cents) AS BIGINT) AS exact_cents,
              CAST(sum(CASE WHEN in_sample THEN cents ELSE 0 END)
                AS BIGINT) AS samp_cents,
              sum(CAST(cents AS HUGEINT) * cents) AS ssq
            FROM li GROUP BY 1)
      SELECT l_returnflag, n_total, n_sample, exact_cents,
             CAST(samp_cents * $SampleMod AS BIGINT) AS est_cents,
             CAST(CASE WHEN exact_cents = 0 THEN -1 ELSE
               CAST(abs(samp_cents * $SampleMod - exact_cents)
                 AS HUGEINT) * 1000000 // CAST(exact_cents AS HUGEINT)
               END AS BIGINT) AS err_ppm,
             CAST(samp_cents * $SampleMod - exact_cents AS HUGEINT)
               * (samp_cents * $SampleMod - exact_cents)
               <= ssq * ${9L * (SampleMod - 1L)} AS within_3sigma
      FROM g""")),

    Q("q_join_size_estimate", selfJoinSizeEst, Some(s"""
      WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
                 FROM lineitem GROUP BY 1),
      s AS (SELECT cnt,
              ((l_partkey + 1) * 48271 % 2147483647) % $SampleMod = 0
                AS in_sample
            FROM c),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sample_keys,
              CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS BIGINT)
                AS exact_f2,
              CAST(coalesce(sum(CASE WHEN in_sample THEN
                CAST(cnt AS HUGEINT) * cnt END), 0) * $SampleMod
                AS BIGINT) AS est_f2
            FROM s)
      SELECT n_keys, n_sample_keys, exact_f2, est_f2,
             CAST(CASE WHEN exact_f2 = 0 THEN -1 ELSE
               CAST(abs(est_f2 - exact_f2) AS HUGEINT) * 1000000
                 // CAST(exact_f2 AS HUGEINT)
               END AS BIGINT) AS err_ppm
      FROM g"""))
  )
}
