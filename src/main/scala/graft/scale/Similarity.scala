package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (L2-normalized
  * Array[Float], so cosine = dot product).
  *
  *  - Brute-force top-k: broadcast the (small) query set against the
  *    corpus — one pass, no corpus shuffle, exact. The baseline and
  *    the oracle-checked path.
  *  - LSH-bucketed ANN: 16 random-hyperplane sign bits → 4 bands of
  *    4 bits; candidates collide in ≥1 band, then exact re-rank. At
  *    100 TB the corpus is bucketed once (write-time partitioning by
  *    band key) and each query probes ~1/16 of the data per band
  *    instead of all of it.
  *
  * Hyperplanes are generated from a fixed-seed LCG so signatures are
  * deterministic across runs and engines.
  */
object Similarity {

  val Dim = 64
  val NumHyperplanes = 16
  val SimBands = 4
  val SimRowsPerBand = 4
  val TopK = 5
  val NumQueries = 10

  /** Deterministic pseudo-random hyperplanes (components in [-1, 1),
    * fixed-seed LCG — same constants as java.util.Random). */
  lazy val hyperplanes: Seq[Seq[Double]] = {
    var state = 42L
    def next(): Double = {
      state = state * 0x5DEECE66DL + 0xBL
      ((state >>> 16) % 2000003L).toDouble / 1000001.5 - 1.0
    }
    Seq.fill(NumHyperplanes)(Seq.fill(Dim)(next()))
  }

  /** dot(a, b) for equal-length array<double> columns — fused codegen
    * loop (graft.ext.DotProductExpr); the interpreted higher-order
    * form below is kept as the parity model for the spec. */
  def dot(a: Column, b: Column): Column =
    graft.ext.DotProductExpr.dotProduct(a, b)

  /** Interpreted reference: aggregate ∘ zip_with (spec parity only —
    * lambda-per-element, measurably slower in the ANN hot path). */
  def dotInterpreted(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** 16-bit hyperplane signature of an array<double> vector. */
  def lshSignature(v: Column): Column =
    hyperplanes.zipWithIndex.map { case (h, i) =>
      when(dot(v, typedLit(h)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_.bitwiseOR(_))

  /** (vec_id, band, bucket) — one row per band; bucket = the band's
    * 4-bit slice of the signature. */
  def bandBuckets(e: DataFrame): DataFrame = {
    val sig = e.withColumn("sig", lshSignature(col("v")))
    val bands = (0 until SimBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * SimRowsPerBand)
          .bitwiseAND((1 << SimRowsPerBand) - 1).as("bucket"))
    }
    sig.select(col("vec_id"), explode(array(bands: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Dimensions kept by the [[matryoshkaEval]] truncation. */
  val MatDim = 16

  /** Matryoshka truncation eval (Kusupati et al. 2022) — the
    * embedding-infra question MRL training poses: if we rank by only
    * the first [[MatDim]] of 64 dimensions (4× cheaper dot products,
    * 4× smaller index), how much of the full-dimension top-k do we
    * keep? Both rankings use COSINE (truncation changes norms, so
    * renormalization is load-bearing, not optional); recall@k is the
    * per-query overlap of the two top-[[TopK]] sets as an exact
    * integer. Shape: same broadcast-query scan as [[annBrute]] twice
    * over one corpus pass each, overlap via an inner join of two
    * k-row-per-query sets. */
  private def matryoshkaEval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    def cosOf(v: org.apache.spark.sql.Column,
        qv: org.apache.spark.sql.Column) =
      dot(v, qv) / (sqrt(dot(v, v)) * sqrt(dot(qv, qv)))
    val base = e.join(broadcast(q), $"vec_id" =!= $"query_id")
    val full = base.withColumn("cosine", cosOf($"v", $"qv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK).select($"query_id", $"vec_id")
    val trunc = base
      .withColumn("cosine",
        cosOf(slice($"v", 1, MatDim), slice($"qv", 1, MatDim)))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK).select($"query_id", $"vec_id")
    full.join(trunc, Seq("query_id", "vec_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("n_overlap"))
      .join(q.select($"query_id"), Seq("query_id"), "right")
      .select($"query_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"))
      .withColumn("recall_pct",
        expr(s"n_overlap * 100 div $TopK"))
  }

  /** Exact brute-force top-k: query side is tiny → broadcast; corpus
    * is scanned once with no shuffle before the per-query top-k. */
  private def annBrute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("cosine", dot($"v", $"qv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), round($"cosine", 4).as("cosine"))
  }

  /** LSH-bucketed ANN: candidates share ≥1 band bucket with the query,
    * then exact cosine re-rank. Returns ≤ k per query (fewer if the
    * buckets are thin — recall measured against annBrute in the spec). */
  private def annLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    // persisted (session registry): probed twice (query-bucket lookup +
    // candidate join); released by GraftCaches.release / Bench / Verify
    val buckets = graft.GraftCaches.getOrPersist(s, s"ann.band_buckets:$d") {
      bandBuckets(e)
    }
    val qIds = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val qBuckets = buckets.join(
        broadcast(qIds.select($"query_id")),
        $"vec_id" === $"query_id")
      .select($"query_id", $"band", $"bucket")
    val candidates = buckets.join(broadcast(qBuckets), Seq("band", "bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id").distinct()
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    candidates
      .join(e, "vec_id")
      .join(broadcast(qIds), "query_id")
      .withColumn("cosine", dot($"v", $"qv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), round($"cosine", 4).as("cosine"))
  }

  /** Multi-probe LSH (Lv et al. 2007): each query probes its exact
    * band bucket PLUS the [[SimRowsPerBand]] buckets at Hamming
    * distance 1 (one sign-bit flip) — the vectors most likely to have
    * landed just across a hyperplane. Recall is strictly ⊇ single-
    * probe LSH at the SAME number of hash tables: the scale lever is
    * that probing 5 buckets per band costs only a 5× wider (still
    * tiny, query-cardinality) broadcast probe list, where the
    * alternative — more bands — would re-index and re-shuffle the
    * whole CORPUS. The bucket perturbation is pure integer XOR, so
    * the oracle replays candidates exactly. */
  val MultiProbeMasks: Seq[Int] = 0 +: (0 until SimRowsPerBand).map(1 << _)

  private def annMultiprobe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val buckets = graft.GraftCaches.getOrPersist(s, s"ann.band_buckets:$d") {
      bandBuckets(e)
    }
    val qIds = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val qBuckets = buckets.join(
        broadcast(qIds.select($"query_id")),
        $"vec_id" === $"query_id")
      .select($"query_id", $"band", $"bucket")
    val flips = array(MultiProbeMasks.map(m =>
      col("bucket").bitwiseXOR(lit(m))): _*)
    val probed = qBuckets
      .select($"query_id", $"band", explode(flips).as("bucket"))
    val candidates = buckets.join(broadcast(probed), Seq("band", "bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id").distinct()
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    candidates
      .join(e, "vec_id")
      .join(broadcast(qIds), "query_id")
      .withColumn("cosine", dot($"v", $"qv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), round($"cosine", 4).as("cosine"))
  }

  /** The multi-probe oracle is the LSH oracle with the query bucket
    * list expanded by the XOR perturbation masks. */
  private def multiprobeOracle: String = {
    val sigExpr = hyperplanes.zipWithIndex.map { case (h, i) =>
      s"(CASE WHEN list_dot_product(v, ${h.mkString("[", ", ", "]")}) >= 0" +
        s" THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n               + ")
    val masks = MultiProbeMasks.mkString("[", ", ", "]")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      sig AS (SELECT vec_id,
               $sigExpr AS sig
              FROM e),
      buckets AS (SELECT vec_id, band,
                         (sig // CAST(power(${1 << SimRowsPerBand}, band)
                                      AS BIGINT))
                           % ${1 << SimRowsPerBand} AS bucket
                  FROM sig
                  CROSS JOIN (SELECT unnest(range($SimBands)) AS band) b),
      qb AS (SELECT vec_id AS query_id, band, bucket
             FROM buckets WHERE vec_id < $NumQueries),
      pb AS (SELECT query_id, band, xor(bucket, m) AS bucket
             FROM qb CROSS JOIN (SELECT unnest($masks) AS m)),
      cand AS (SELECT DISTINCT pb.query_id, bk.vec_id
               FROM buckets bk
               JOIN pb ON bk.band = pb.band AND bk.bucket = pb.bucket
               WHERE bk.vec_id <> pb.query_id),
      ranked AS (SELECT c.query_id, c.vec_id,
                        list_dot_product(ev.v, eq.v) AS cosine,
                        row_number() OVER (PARTITION BY c.query_id
                          ORDER BY list_dot_product(ev.v, eq.v) DESC,
                                   c.vec_id ASC) AS rank
                 FROM cand c
                 JOIN e ev ON c.vec_id = ev.vec_id
                 JOIN e eq ON c.query_id = eq.vec_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank,
             vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rank <= $TopK"""
  }

  val IvfCentroids = 16
  val IvfProbes = 4

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into `IvfCentroids` cells; each query probes only the `IvfProbes`
    * nearest cells and re-ranks exactly inside them. Centroids are a
    * deterministic sample of the corpus (FAISS-style sampled coarse
    * quantizer — no Lloyd refinement, which keeps cell assignment
    * bit-deterministic). At 100 TB the corpus is written partitioned
    * by cell id once, and a query touches ~probes/cells of the data. */
  /** Deterministic sampled coarse quantizer: seed ids spread over the
    * corpus, clear of the query ids (FAISS-style, no Lloyd refinement
    * — keeps cell assignment bit-deterministic). */
  def ivfCentroidsOf(e: DataFrame): DataFrame = {
    val seeds = (0 until IvfCentroids).map(i => NumQueries + 7L * i + 3L)
    e.filter(col("vec_id").isin(seeds: _*))
      .select(col("vec_id").as("cid"), col("v").as("cv"))
  }

  /** (vec_id, cell): argmax centroid dot, deterministic tie-break on
    * cid via struct max. Also the WRITE-TIME partitioner — persisting
    * the corpus `partitionBy("cell")` lets every probe-limited read
    * prune to probes/cells of the files (StorageSpec proves the
    * pruned scan). */
  def ivfAssign(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids))
      .withColumn("cdot", dot(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cell"))

  private def annIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val centroids = ivfCentroidsOf(e)
    val assigned = ivfAssign(e, centroids)
    val lists = assigned.join(e, "vec_id") // inverted lists (cell → vectors)
    val qIds = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val wProbe = Window.partitionBy($"query_id")
      .orderBy($"cdot".desc, $"cid".asc)
    val probes = qIds.crossJoin(broadcast(centroids))
      .withColumn("cdot", dot($"qv", $"cv"))
      .withColumn("pr", row_number().over(wProbe))
      .filter($"pr" <= IvfProbes)
      .select($"query_id", $"qv", $"cid".as("cell"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    probes.join(lists, "cell")
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cosine", dot($"v", $"qv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), round($"cosine", 4).as("cosine"))
  }

  val KmeansIters = 2

  /** Lloyd's k-means refinement of the sampled IVF quantizer — the
    * missing step between the deterministic seed centroids and a real
    * FAISS-style index build. `KmeansIters` fixed iterations, unrolled
    * into one DAG (no driver loop): assign (argmax centroid dot,
    * broadcast centroids — the corpus never shuffles for assignment),
    * then re-center. The per-(cell, dim) means accumulate DECIMAL sums
    * of grid-snapped values (round to 1e-7 before the cast), so the
    * refined centroids are accumulation-order-independent and the
    * DuckDB oracle replays both iterations value-for-value; cells that
    * lose all members simply drop out of the next round, exactly as
    * the oracle's group-by does. Output is the final assignment. */
  /** Library API: Lloyd refinement of a coarse quantizer over ANY
    * point set with columns (vec_id, v: array<double>) and seed
    * centroids (cid, cv). Fixed `iterations` unrolled into one DAG;
    * decimal-snapped means keep the result accumulation-order-
    * independent (engine-portable). Returns the final (vec_id, cell)
    * assignment under the refined centroids. */
  def lloydRefine(points: DataFrame, seeds: DataFrame,
      iterations: Int = KmeansIters): DataFrame = {
    var cent = seeds
    for (_ <- 1 to iterations) {
      cent = ivfAssign(points, cent).join(points, "vec_id")
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg((sum(round(col("x"), 7).cast("decimal(18,7)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          p => p.getField("m")).as("cv"))
        .select(col("cell").as("cid"), col("cv"))
    }
    ivfAssign(points, cent).select(col("vec_id"), col("cell"))
  }

  private def kmeansRefine(s: SparkSession, d: String): DataFrame = {
    val e = graft.GraftCaches.getOrPersist(s, s"ann.corpus:$d")(corpus(s, d))
    lloydRefine(e, ivfCentroidsOf(e), KmeansIters)
  }

  /** Oversampling factor ℓ for [[kmeansParInit]] — 2³ exactly, so
    * ℓ·d² stays an EXACT double (power-of-two scale) and the keep
    * comparison is bit-identical across engines. */
  val KmppOversample = 8

  /** k-means‖ initialization (Bahmani et al. 2012, "Scalable
    * k-means++"): one oversampling round of the distributed seeding
    * that replaces k sequential k-means++ passes — seed with the
    * min-id vector c₀, compute every vector's D²(v) = ‖v − c₀‖²,
    * then keep v with probability min(1, ℓ·D²(v)/φ) where
    * φ = Σ D²; finally weight each kept candidate by the number of
    * corpus vectors nearest to it (the weights that feed the final
    * small weighted clustering — here, [[lloydRefine]]). The draw is
    * the deterministic Knuth-hash uniform (partition-independent,
    * rerun-stable), so candidates are reproducible across engines.
    *
    * Shape at scale — the algorithm's raison d'être: the corpus is
    * scanned, never shuffled. c₀ and φ are broadcast scalars; the
    * candidate set (~ℓ rows/round) broadcasts into the assignment
    * scan whose argmin is a map-side-collapsing min(struct); the only
    * shuffle carries one row per candidate. Distances are EXACT
    * BIGINT on the e6 component grid (|xf| ≤ 1e6 ⇒ d² ≤ 64·4e12,
    * far under int64); the keep test compares two exactly-computed
    * doubles (a dyadic-rational u against ℓ·d²/φ, ℓ a power of two,
    * both operands correctly rounded the same way under IEEE 754 in
    * both engines). */
  private def kmeansParInit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val xf = transform($"embedding",
      x => floor(x.cast("double") * lit(1.0e6)).cast("long"))
    val emb = graft.GraftCaches.getOrPersist(s, s"ann.kmpp_xf:$d") {
      Tables.embeddings(s, d).select($"vec_id", xf.as("xf"))
    }
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val c0 = emb.orderBy($"vec_id".asc).limit(1)
      .select($"vec_id".as("c0_id"), $"xf".as("c0xf"))
    val dists = emb.crossJoin(broadcast(c0))
      .select($"vec_id", $"c0_id", d2($"xf", $"c0xf").as("d2_e12"))
    val phi = dists.agg(sum($"d2_e12").as("phi"))
    val u = (pmod($"vec_id" * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val cands = dists.crossJoin(broadcast(phi))
      .filter($"vec_id" === $"c0_id" ||
        u < lit(KmppOversample.toDouble) * $"d2_e12".cast("double")
          / $"phi".cast("double"))
      .select($"vec_id".as("cid"), $"d2_e12")
    val candVecs = cands
      .join(emb.select($"vec_id".as("cid"), $"xf".as("cxf")), "cid")
      .select($"cid", $"cxf")
    // Assignment is the n·|cands| hot path — run it through the
    // codegen dot product as d² = ‖a‖²+‖b‖²−2a·b instead of an
    // interpreted per-pair fold (measured 12.3 → ~1 s at the 100×
    // probe). EXACT despite the double carrier: every term is an
    // integer-valued double ≤ 64·(2e6)² ≈ 2.6e14, 30× under 2⁵³, so
    // the arithmetic never rounds and the cast back to long is the
    // identity the oracle's BIGINT path computes.
    val asDouble = (c: Column) => transform(c, x => x.cast("double"))
    val withN2 = emb.select($"vec_id",
      asDouble($"xf").as("xd"),
      aggregate($"xf", lit(0L), (a, x) => a + x * x).as("n2"))
    val candN2 = candVecs.select($"cid",
      asDouble($"cxf").as("cd"),
      aggregate($"cxf", lit(0L), (a, x) => a + x * x).as("cn2"))
    val counts = withN2.crossJoin(broadcast(candN2))
      .select($"vec_id", $"cid",
        ($"n2" + $"cn2" -
          (lit(2.0) * dot($"xd", $"cd")).cast("long")).as("dd"))
      .groupBy($"vec_id")
      .agg(min(struct($"dd".as("dd"), $"cid".as("cid"))).as("m"))
      .groupBy($"m.cid".as("cid"))
      .agg(count(lit(1)).as("n_assigned"))
    cands.join(counts, Seq("cid"), "left")
      .na.fill(0L, Seq("n_assigned"))
      .select($"cid".as("vec_id"), $"d2_e12", $"n_assigned")
  }

  /** k-center greedy selection (Gonzalez 1985 farthest-point
    * traversal, the 2-approximation for metric k-center) — the
    * COVERAGE-based diversity selector that complements
    * [[kmeansParInit]]'s density-based sampling: seed with the min-id
    * vector, then twice pick the vector FARTHEST from the selected
    * set (argmax of min-distance, tie → smallest id). The emitted
    * radius of pick i is the k-center objective after i−1 centers —
    * the certificate a curation pipeline uses to bound "no document
    * is farther than r from a selected exemplar". Deterministic,
    * exact e6-grid BIGINT distances end to end.
    *
    * Shape at scale: each unrolled round is one BROADCAST of a single
    * center vector into the corpus scan (update dmin = least(dmin,
    * d²)) plus one map-side-collapsing max(struct) argmax — the
    * corpus never shuffles, and the per-round min-distance table is
    * registry-persisted so round r+1 reads a materialization instead
    * of replaying rounds 1..r (the q_pca_power lesson). */
  private def kcenterGreedy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val xf = transform($"embedding",
      x => floor(x.cast("double") * lit(1.0e6)).cast("long"))
    val emb = graft.GraftCaches.getOrPersist(s, s"ann.kmpp_xf:$d") {
      Tables.embeddings(s, d).select($"vec_id", xf.as("xf"))
    }
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    def argmax(dists: DataFrame): DataFrame = dists
      .agg(max(struct($"dmin".as("dmin"), (-$"vec_id").as("nid")))
        .as("m"))
      .select((-$"m.nid").as("cid"), $"m.dmin".as("radius"))
    def vecOf(c: DataFrame): DataFrame = c
      .join(emb, c("cid") === emb("vec_id"))
      .select($"cid", $"xf".as("cxf"), $"radius")
    val c0 = emb.orderBy($"vec_id".asc).limit(1)
      .select($"vec_id".as("cid"), $"xf".as("cxf"))
    val d1 = graft.GraftCaches.getOrPersist(s, s"ann.kcenter_d1:$d") {
      emb.crossJoin(broadcast(c0))
        .select($"vec_id", $"xf", d2($"xf", $"cxf").as("dmin"))
    }
    val c1 = vecOf(argmax(d1))
    val dist2 = graft.GraftCaches.getOrPersist(s, s"ann.kcenter_d2:$d") {
      d1.crossJoin(broadcast(c1.select($"cxf".as("c1xf"))))
        .select($"vec_id", $"xf",
          least($"dmin", d2($"xf", $"c1xf")).as("dmin"))
    }
    val c2 = vecOf(argmax(dist2))
    c0.select(lit(1L).as("sel_rank"), $"cid".as("vec_id"),
        lit(null).cast("long").as("radius_e12"))
      .unionAll(c1.select(lit(2L).as("sel_rank"), $"cid".as("vec_id"),
        $"radius".as("radius_e12")))
      .unionAll(c2.select(lit(3L).as("sel_rank"), $"cid".as("vec_id"),
        $"radius".as("radius_e12")))
  }

  private val kcenterGreedyOracle = s"""
      WITH comp AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS xf
        FROM embeddings),
      c0 AS (SELECT min(vec_id) AS cid FROM embeddings),
      d1 AS (SELECT c.vec_id,
                    CAST(sum((c.xf - v.xf) * (c.xf - v.xf)) AS BIGINT)
                      AS dmin
             FROM comp c
             JOIN (SELECT i, xf FROM comp, c0 WHERE vec_id = cid) v
               USING (i)
             GROUP BY 1),
      c1 AS (SELECT vec_id AS cid, dmin AS radius FROM d1
             ORDER BY dmin DESC, vec_id ASC LIMIT 1),
      d2 AS (SELECT d1.vec_id, least(d1.dmin, n.dd) AS dmin
             FROM d1 JOIN (
               SELECT e.vec_id,
                      CAST(sum((e.xf - k.xf) * (e.xf - k.xf)) AS BIGINT)
                        AS dd
               FROM comp e
               JOIN (SELECT i, xf FROM comp, c1 WHERE vec_id = cid) k
                 USING (i)
               GROUP BY 1) n USING (vec_id)),
      c2 AS (SELECT vec_id AS cid, dmin AS radius FROM d2
             ORDER BY dmin DESC, vec_id ASC LIMIT 1)
      SELECT CAST(1 AS BIGINT) AS sel_rank, cid AS vec_id,
             CAST(NULL AS BIGINT) AS radius_e12 FROM c0
      UNION ALL
      SELECT 2, cid, CAST(radius AS BIGINT) FROM c1
      UNION ALL
      SELECT 3, cid, CAST(radius AS BIGINT) FROM c2"""

  private val kmeansParInitOracle = s"""
      WITH comp AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS xf
        FROM embeddings),
      c0 AS (SELECT min(vec_id) AS c0_id FROM embeddings),
      c0v AS (SELECT i, xf FROM comp, c0 WHERE vec_id = c0_id),
      d2 AS (SELECT c.vec_id,
                    CAST(sum((c.xf - v.xf) * (c.xf - v.xf)) AS BIGINT)
                      AS d2_e12
             FROM comp c JOIN c0v v USING (i) GROUP BY 1),
      phi AS (SELECT CAST(sum(d2_e12) AS BIGINT) AS phi FROM d2),
      cand AS (SELECT d2.vec_id AS cid, d2.d2_e12
               FROM d2, phi, c0
               WHERE d2.vec_id = c0_id
                  OR ((d2.vec_id * 2654435761) % 4294967296 + 0.5)
                       / 4294967296.0
                     < $KmppOversample.0 * CAST(d2_e12 AS DOUBLE)
                       / CAST(phi AS DOUBLE)),
      dist AS (SELECT e.vec_id, k.vec_id AS cid,
                      CAST(sum((e.xf - k.xf) * (e.xf - k.xf)) AS BIGINT)
                        AS dd
               FROM comp e JOIN comp k ON e.i = k.i
               WHERE k.vec_id IN (SELECT cid FROM cand)
               GROUP BY 1, 2),
      asg AS (SELECT cid, count(*) AS n_assigned
              FROM (SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                             ORDER BY dd ASC, cid ASC) AS rn
                    FROM dist) t
              WHERE rn = 1 GROUP BY 1)
      SELECT c.cid AS vec_id, c.d2_e12,
             coalesce(a.n_assigned, 0) AS n_assigned
      FROM cand c LEFT JOIN asg a ON c.cid = a.cid"""

  private def kmeansOracle: String = {
    val seeds = (0 until IvfCentroids)
      .map(i => NumQueries + 7L * i + 3L).mkString(", ")
    // assignment tie-break mirrors ivfAssign's max(struct): cid DESC
    def assign(cents: String, out: String) = s"""
      $out AS (SELECT vec_id, v, cid AS cell FROM (
          SELECT ev.vec_id, ev.v, c.cid,
                 row_number() OVER (PARTITION BY ev.vec_id
                   ORDER BY list_dot_product(ev.v, c.cv) DESC,
                            c.cid DESC) AS rn
          FROM e ev CROSS JOIN $cents c) t WHERE rn = 1)"""
    def recenter(assigned: String, out: String) = s"""
      ${out}m AS (SELECT cell,
                         generate_subscripts(v, 1) - 1 AS dim,
                         unnest(v) AS x
                  FROM $assigned),
      ${out}g AS (SELECT cell, dim,
                         CAST(sum(CAST(round(x, 7) AS DECIMAL(18,7)))
                              AS DOUBLE) / count(*) AS m
                  FROM ${out}m GROUP BY 1, 2),
      $out AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv
               FROM ${out}g GROUP BY 1)"""
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c0 AS (SELECT vec_id AS cid, v AS cv FROM e
             WHERE vec_id IN ($seeds)),${assign("c0", "a1")},${recenter("a1", "c1")},${assign("c1", "a2")},${recenter("a2", "c2")},${assign("c2", "af")}
      SELECT vec_id, cell FROM af"""
  }

  /** Deterministic negative sampling for contrastive training: for
    * each anchor (the query vectors), k corpus items with a DIFFERENT
    * label, picked by a reproducible per-(anchor, candidate) hash
    * order — the hard requirement is that reruns, repartitions and
    * engines agree on the sample, which rand() cannot give. Shape:
    * anchors are a tiny broadcast against one corpus scan; the
    * per-anchor top-k runs on the 64-bit mix of the id pair (pure
    * integer arithmetic, engine-portable), so candidates never
    * shuffle — only k rows per anchor survive the window. */
  private def negativeSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select($"vec_id", $"label")
    val anchors = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("anchor_id"), $"label".as("anchor_label"))
    // Knuth multiplicative mix of the pair — positive, portable
    val mix = pmod($"anchor_id" * lit(2654435761L) + $"vec_id" * lit(40503L),
      lit(4294967296L))
    val w = Window.partitionBy($"anchor_id")
      .orderBy($"u".asc, $"vec_id".asc)
    e.crossJoin(broadcast(anchors))
      .filter($"label" =!= $"anchor_label")
      .select($"anchor_id", $"vec_id", $"label", mix.as("u"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= TopK)
      .select($"anchor_id", $"rn".cast("long").as("rn"),
        $"vec_id".as("negative_id"), $"label".cast("long").as("neg_label"))
  }

  /** Corpus-wide near-dup PAIRS via the band buckets — the scale-safe
    * counterpart of q_dedup_embed_cosine's all-pairs ground truth: the
    * pair join runs INSIDE (band, bucket) groups (each ~1/2^bits of
    * the corpus per band), then exact-cosine verification keeps
    * precision at 1.0. Recall is the banded-LSH curve (≈0.5 at the
    * 0.45 threshold — spec-measured); tightening it is a parameter
    * change (more hyperplanes per band, more bands), not a new plan.
    * This is THE standard semantic-dedup shape at 100 TB: bucket
    * count scales with corpus size, so bucket width — and the per-
    * bucket quadratic — stays bounded. */
  private def embedNearDupLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val buckets = graft.GraftCaches.getOrPersist(s, s"ann.band_buckets:$d") {
      bandBuckets(e)
    }
    val cand = buckets.as("a")
      .join(buckets.as("b"), Seq("band", "bucket"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"))
      .distinct()
    cand
      .join(e.select($"vec_id".as("v1"), $"v".as("va")), "v1")
      .join(e.select($"vec_id".as("v2"), $"v".as("vb")), "v2")
      .withColumn("cosine", dot($"va", $"vb"))
      .filter($"cosine" >= 0.45)
      .select($"v1", $"v2", round($"cosine", 4).as("cosine"))
  }

  private def nearDupLshOracle: String = {
    val sigExpr = hyperplanes.zipWithIndex.map { case (h, i) =>
      s"(CASE WHEN list_dot_product(v, ${h.mkString("[", ", ", "]")}) >= 0" +
        s" THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n               + ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      sig AS (SELECT vec_id,
               $sigExpr AS sig
              FROM e),
      buckets AS (SELECT vec_id, band,
                         (sig // CAST(power(${1 << SimRowsPerBand}, band)
                                      AS BIGINT))
                           % ${1 << SimRowsPerBand} AS bucket
                  FROM sig
                  CROSS JOIN (SELECT unnest(range($SimBands)) AS band) b),
      cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
               FROM buckets a
               JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
               WHERE a.vec_id < b.vec_id)
      SELECT c.v1, c.v2,
             round(list_dot_product(ea.v, eb.v), 4) AS cosine
      FROM cand c
      JOIN e ea ON c.v1 = ea.vec_id
      JOIN e eb ON c.v2 = eb.vec_id
      WHERE list_dot_product(ea.v, eb.v) >= 0.45"""
  }

  val PqSubspaces = 8       // M: 64-dim vector → 8 subvectors of 8
  val PqCentroids = 16      // K per subspace → 4-bit codes, 8×4 = 32 bits/vector
  val PqCandidates = 40     // ADC candidate pool before exact re-rank

  /** PQ codebook seeds: centroid j of EVERY subspace is the j-th seed
    * vector's subvector (deterministic sampled codebook, no Lloyd —
    * same bit-determinism contract as the IVF quantizer). */
  def pqSeeds: Seq[Long] = (0 until PqCentroids).map(j => NumQueries + 11L * j + 5L)

  /** Product-quantization ANN: encode each corpus vector as M 4-bit
    * codes (nearest codebook centroid per subspace), score queries
    * against CODES via the ADC table (M×K query-centroid partial dots,
    * 1 280 values — broadcast), keep the top `PqCandidates` by
    * approximate score, then exact re-rank to top-k.
    *
    * This is the memory-compression scale path: 64 floats (256 B)
    * become 4 B per vector — a 100 TB embedding corpus's index fits in
    * ~1.6 TB of codes, and the scan over codes is a broadcast-join +
    * map-side-combinable sum, never a vector shuffle. Exact vectors
    * are fetched only for the candidate pool.
    *
    * Determinism (what makes the DuckDB oracle exact despite PQ being
    * approximate): sampled codebook, argmin ties → smaller centroid
    * id, ADC partials summed in subspace order (a groupBy-sum of
    * doubles would be merge-order dependent), all ranks tie-broken on
    * vec_id. */
  private def annPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    // (m, cid, cslice): the codebook, M×K rows of 8-dim slices — tiny
    val centroids = e.filter($"vec_id".isin(pqSeeds: _*))
    val mIdx = explode(sequence(lit(0), lit(PqSubspaces - 1))).as("m")
    val codebook = centroids
      .select($"vec_id", mIdx, $"v")
      .select($"vec_id", $"m",
        slice($"v", $"m" * 8 + 1, lit(8)).as("cslice"))
      .join(broadcast(
          e.filter($"vec_id".isin(pqSeeds: _*)).select($"vec_id")
            .withColumn("cid",
              (row_number().over(Window.orderBy($"vec_id")) - 1).cast("long"))),
        "vec_id")
      .select($"m", $"cid", $"cslice")
    // encode: per (vector, subspace) the nearest centroid's cid.
    // ||x-c||² = x·x − 2x·c + c·c — every term a DotProductExpr, the
    // fp-parity primitive the LSH/IVF oracles already lock.
    val subvecs = e.select($"vec_id", mIdx, $"v")
      .select($"vec_id", $"m", slice($"v", $"m" * 8 + 1, lit(8)).as("vs"))
    val codes = subvecs.join(broadcast(codebook), "m")
      .withColumn("dist",
        dot($"vs", $"vs") - lit(2.0) * dot($"vs", $"cslice")
          + dot($"cslice", $"cslice"))
      .groupBy($"vec_id", $"m")
      .agg(min(struct($"dist", $"cid")).as("best"))
      .select($"vec_id", $"m", $"best.cid".as("code"))
    // ADC lookup table: query × subspace × centroid partial dots
    val qIds = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val lut = qIds.select($"query_id", mIdx, $"qv")
      .select($"query_id", $"m", slice($"qv", $"m" * 8 + 1, lit(8)).as("qs"))
      .join(codebook, "m")
      .select($"query_id", $"m", $"cid".as("code"),
        dot($"qs", $"cslice").as("partial"))
    // approximate score: partials summed in subspace order
    val approx = codes.join(broadcast(lut), Seq("m", "code"))
      .filter($"vec_id" =!= $"query_id")
      .groupBy($"query_id", $"vec_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct($"m", $"partial"))),
          p => p.getField("partial")),
        lit(0.0), (acc, x) => acc + x).as("approx"))
    val wCand = Window.partitionBy($"query_id")
      .orderBy($"approx".desc, $"vec_id".asc)
    val pool = approx.withColumn("cr", row_number().over(wCand))
      .filter($"cr" <= PqCandidates)
      .select($"query_id", $"vec_id")
    // exact re-rank of the candidate pool
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    pool.join(e, "vec_id").join(broadcast(qIds), "query_id")
      .withColumn("cosine", dot($"v", $"qv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("long").as("rank"),
        $"vec_id".as("neighbor_id"), round($"cosine", 4).as("cosine"))
  }

  /** DuckDB oracle replaying the PQ pipeline: codebook from literal
    * seed ids (cid = rank of seed vec_id), argmin encode with the same
    * x·x − 2x·c + c·c arithmetic, ADC partials summed IN SUBSPACE
    * ORDER (list_sum over a list ordered by m — matching the Spark
    * side's ordered aggregate), candidate pool, exact re-rank. */
  private def pqOracle: String = {
    val seeds = pqSeeds.mkString(", ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cent AS (SELECT vec_id,
                      row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                      v AS cv
               FROM e WHERE vec_id IN ($seeds)),
      ms AS (SELECT unnest(range($PqSubspaces)) AS m),
      codebook AS (SELECT m, cid, cv[m*8+1 : m*8+8] AS cslice
                   FROM cent CROSS JOIN ms),
      subvecs AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS vs
                  FROM e CROSS JOIN ms),
      coded AS (SELECT vec_id, m, cid AS code FROM (
          SELECT sv.vec_id, sv.m, cb.cid,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.m
                   ORDER BY list_dot_product(sv.vs, sv.vs)
                            - 2 * list_dot_product(sv.vs, cb.cslice)
                            + list_dot_product(cb.cslice, cb.cslice) ASC,
                          cb.cid ASC) AS rn
          FROM subvecs sv JOIN codebook cb ON sv.m = cb.m) t
        WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id < $NumQueries),
      lut AS (SELECT q.query_id, cb.m, cb.cid AS code,
                     list_dot_product(q.qv[cb.m*8+1 : cb.m*8+8], cb.cslice)
                       AS partial
              FROM q CROSS JOIN codebook cb),
      approx AS (SELECT l.query_id, c.vec_id,
                        list_sum(list(l.partial ORDER BY l.m)) AS approx
                 FROM coded c
                 JOIN lut l ON c.m = l.m AND c.code = l.code
                 WHERE c.vec_id <> l.query_id
                 GROUP BY 1, 2),
      pool AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY approx DESC, vec_id ASC) AS cr
          FROM approx) t WHERE cr <= $PqCandidates),
      ranked AS (SELECT p.query_id, ev.vec_id,
                        list_dot_product(ev.v, eq.qv) AS cosine,
                        row_number() OVER (PARTITION BY p.query_id
                          ORDER BY list_dot_product(ev.v, eq.qv) DESC,
                                   ev.vec_id ASC) AS rank
                 FROM pool p
                 JOIN e ev ON p.vec_id = ev.vec_id
                 JOIN q eq ON p.query_id = eq.query_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank,
             vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rank <= $TopK"""
  }

  /** Label-aware kNN check: majority label among the exact top-k —
    * the evaluation-style query a training pipeline runs. */
  private def knnLabels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = Tables.embeddings(s, d)
      .select($"vec_id".as("neighbor_id"), $"label".cast("long").as("label"))
    annBrute(s, d).join(labels, "neighbor_id")
      .groupBy($"query_id", $"label")
      .agg(count(lit(1)).as("votes"))
  }

  /** ColBERT-style MaxSim late interaction (Khattab & Zaharia 2020):
    * a MULTI-VECTOR query scores a multi-vector document as
    * Σ_{q ∈ Q} max_{v ∈ D} q·v — each query token independently finds
    * its best-matching document token, so fine-grained matches
    * survive pooling. Here Q = the [[NumQueries]] query vectors and
    * the "documents" are the label groups (the corpus's natural
    * multi-vector sets).
    *
    * Scale shape: the query side is a handful of vectors and
    * BROADCASTS into the corpus scan; dot products run through the
    * codegen [[dot]] kernel; the per-(doc, query-token) max collapses
    * map-side, so the wire carries |docs|·|Q| partial maxima — never
    * vectors. Float discipline: max of doubles is rounding-free, so
    * floor-e6 AFTER the max and BEFORE the cross-token sum makes the
    * final score an exact BIGINT sum (floor-then-sum). */
  private def maxSim(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_vec"), $"v".as("qv"))
    Tables.embeddings(s, d)
      .filter($"vec_id" >= NumQueries)
      .select($"vec_id", $"label".cast("long").as("label"),
        $"embedding".cast("array<double>").as("v"))
      .crossJoin(broadcast(q))
      .select($"label", $"query_vec", dot($"v", $"qv").as("sim"))
      .groupBy($"label", $"query_vec")
      .agg(floor(max($"sim") * lit(1e6)).cast("long").as("best_e6"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_qtokens"),
        sum($"best_e6").as("maxsim_e6"))
      .orderBy($"label".asc)
  }

  /** Per-label centroids as distributed element-wise vector math:
    * posexplode → (label, dim) partial averages — one shuffle of
    * |labels|·dim partial sums, never the vectors themselves. Flat
    * (label, pos, centroid) output keeps the oracle comparison
    * value-typed; array_agg re-assembly is a projection away. */
  private def embedCentroids(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"label".cast("long").as("label"),
        posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg(round(avg($"v"), 6).as("centroid"))
      .withColumn("pos", $"pos".cast("long"))
  }

  /** Int8 scalar quantization of the embedding column — the storage
    * compression every vector index applies before serving. Per-vector
    * max-abs scale, q = floor(127·x/scale + 0.5) (explicit floor, not
    * round: identical halfway semantics in every engine), plus the
    * reconstruction-error summary. Scan-local higher-order
    * expressions; outputs are scalars so the verification harness
    * never sorts array cells. */
  private def embedQuantize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val scale = array_max(transform($"v", x => abs(x)))
    val qOf = (x: Column, sc: Column) => floor(x * 127 / sc + lit(0.5))
    e.select($"vec_id", scale.as("sc"), $"v")
      .select($"vec_id",
        round($"sc", 6).as("scale"),
        round(array_max(transform($"v",
          x => abs(x - qOf(x, $"sc") * $"sc" / 127))), 6).as("max_err"),
        aggregate(transform($"v", x => qOf(x, $"sc")), lit(0.0),
          (acc, q) => acc + q).cast("long").as("q_sum"))
  }

  private val quantizeOracle = """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      s AS (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS sc
            FROM e)
      SELECT vec_id, round(sc, 6) AS scale,
             round(list_max(list_transform(v,
               x -> abs(x - floor(x * 127 / sc + 0.5) * sc / 127))), 6)
               AS max_err,
             CAST(list_sum(list_transform(v,
               x -> floor(x * 127 / sc + 0.5))) AS BIGINT) AS q_sum
      FROM s"""

  /** DuckDB oracle replaying the FULL LSH pipeline value-for-value:
    * the fixed-seed hyperplanes are rendered as literal lists (Scala's
    * shortest-repr Double.toString round-trips through DuckDB's
    * parser bit-exactly), signature bits are CASE sums, banding is
    * div/mod arithmetic, and the re-rank reuses the brute-force
    * shape. Every stage is deterministic, so the approximate operator
    * still gets an EXACT oracle — the same fp-parity base
    * (list_dot_product ≡ DotProductExpr) the q_ann_bruteforce oracle
    * already proves at both gate SFs. */
  private def lshOracle: String = {
    val sigExpr = hyperplanes.zipWithIndex.map { case (h, i) =>
      s"(CASE WHEN list_dot_product(v, ${h.mkString("[", ", ", "]")}) >= 0" +
        s" THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n               + ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      sig AS (SELECT vec_id,
               $sigExpr AS sig
              FROM e),
      buckets AS (SELECT vec_id, band,
                         (sig // CAST(power(${1 << SimRowsPerBand}, band)
                                      AS BIGINT))
                           % ${1 << SimRowsPerBand} AS bucket
                  FROM sig
                  CROSS JOIN (SELECT unnest(range($SimBands)) AS band) b),
      qb AS (SELECT vec_id AS query_id, band, bucket
             FROM buckets WHERE vec_id < $NumQueries),
      cand AS (SELECT DISTINCT qb.query_id, bk.vec_id
               FROM buckets bk
               JOIN qb ON bk.band = qb.band AND bk.bucket = qb.bucket
               WHERE bk.vec_id <> qb.query_id),
      ranked AS (SELECT c.query_id, c.vec_id,
                        list_dot_product(ev.v, eq.v) AS cosine,
                        row_number() OVER (PARTITION BY c.query_id
                          ORDER BY list_dot_product(ev.v, eq.v) DESC,
                                   c.vec_id ASC) AS rank
                 FROM cand c
                 JOIN e ev ON c.vec_id = ev.vec_id
                 JOIN e eq ON c.query_id = eq.vec_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank,
             vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rank <= $TopK"""
  }

  /** DuckDB oracle replaying the IVF pipeline: literal seed ids →
    * centroids, argmax cell assignment (struct-max ties break to the
    * LARGER cid, hence ORDER BY cdot DESC, cid DESC), nprobe nearest
    * cells per query (probe ties break to the SMALLER cid, matching
    * the window in annIvf), exact re-rank inside probed cells. */
  private def ivfOracle: String = {
    val seeds = (0 until IvfCentroids)
      .map(i => NumQueries + 7L * i + 3L).mkString(", ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e
               WHERE vec_id IN ($seeds)),
      assign AS (SELECT vec_id, cid AS cell FROM (
          SELECT ev.vec_id, c.cid,
                 row_number() OVER (PARTITION BY ev.vec_id
                   ORDER BY list_dot_product(ev.v, c.cv) DESC,
                            c.cid DESC) AS rn
          FROM e ev CROSS JOIN cent c) t WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id < $NumQueries),
      probes AS (SELECT query_id, cid AS cell FROM (
          SELECT q.query_id, c.cid,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_dot_product(q.qv, c.cv) DESC,
                            c.cid ASC) AS pr
          FROM q CROSS JOIN cent c) t WHERE pr <= $IvfProbes),
      ranked AS (SELECT p.query_id, ev.vec_id,
                        list_dot_product(ev.v, eq.qv) AS cosine,
                        row_number() OVER (PARTITION BY p.query_id
                          ORDER BY list_dot_product(ev.v, eq.qv) DESC,
                                   ev.vec_id ASC) AS rank
                 FROM probes p
                 JOIN assign a ON p.cell = a.cell
                 JOIN e ev ON a.vec_id = ev.vec_id
                 JOIN q eq ON p.query_id = eq.query_id
                 WHERE ev.vec_id <> p.query_id)
      SELECT query_id, CAST(rank AS BIGINT) AS rank,
             vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rank <= $TopK"""
  }

  /** SemDeDup within-cell cosine threshold: at or above it the
    * higher-id vector of a pair is a semantic duplicate (same value
    * as the exact near-dup tier, so the spec can cross-check). */
  val SemDedupTau = 0.45

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public): assign every embedding to its
    * nearest coarse centroid (the IVF cells — broadcast centroids,
    * the corpus never shuffles for assignment), then prune
    * near-duplicates WITHIN each cell only: a vector is dropped when
    * a lower-id member of its cell has cosine ≥ τ with it; survivors
    * keep their semantic cell label. The cell structure bounds the
    * pairwise stage to Σ|cell|² instead of n² — the paper's
    * observation that semantic duplicates share a cluster — and at
    * 100 TB the cells are also the write-time partitioning, so the
    * pair join is partition-local. Deterministic end to end (sampled
    * centroids, integer tie-breaks, min-id survivor rule), so the
    * DuckDB oracle replays assignment, pairing, and pruning exactly. */
  private def semDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = graft.GraftCaches.getOrPersist(s, s"ann.corpus:$d")(corpus(s, d))
    // cells referenced three times (both pair sides + survivor base)
    val lists = graft.GraftCaches.getOrPersist(s, s"ann.semcells:$d") {
      ivfAssign(e, ivfCentroidsOf(e)).join(e, "vec_id")
    }
    val dup = lists.as("a").join(lists.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id"))
      .filter(dot(col("a.v"), col("b.v")) >= SemDedupTau)
      .select(col("a.vec_id").as("vec_id")).distinct()
    lists.join(dup, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cell")
  }

  private def semDedupOracle: String = {
    val seeds = (0 until IvfCentroids)
      .map(i => NumQueries + 7L * i + 3L).mkString(", ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id IN ($seeds)),
      a AS (SELECT vec_id, v, cid AS cell FROM (
              SELECT ev.vec_id, ev.v, c.cid,
                     row_number() OVER (PARTITION BY ev.vec_id
                       ORDER BY list_dot_product(ev.v, c.cv) DESC,
                                c.cid DESC) AS rn
              FROM e ev CROSS JOIN c) t WHERE rn = 1),
      dup AS (SELECT DISTINCT x.vec_id
              FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id > y.vec_id
              WHERE list_dot_product(x.v, y.v) >= $SemDedupTau)
      SELECT a.vec_id, a.cell
      FROM a LEFT JOIN dup USING (vec_id) WHERE dup.vec_id IS NULL"""
  }

  /** Hard-negative mining for contrastive training (the in-batch /
    * ANCE-style step): for each anchor, the top-k most SIMILAR
    * vectors carrying a DIFFERENT label — the negatives that actually
    * move a contrastive loss, where q_negative_sample's uniform draws
    * are easy negatives. Anchors broadcast into the corpus scan (the
    * annBrute shape); the label inequality prunes before the window,
    * and per-anchor top-k is the one bounded window shuffle. At full
    * corpus-as-anchors scale this composes with the IVF cells
    * (mine within probed cells) exactly like [[semDedup]] bounds its
    * pair stage. */
  private def hardNegatives(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"),
        $"label".cast("long").as("label"))
    val anchors = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("anchor_id"), $"v".as("av"),
        $"label".as("anchor_label"))
    val w = Window.partitionBy($"anchor_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    e.join(broadcast(anchors), $"label" =!= $"anchor_label")
      .withColumn("cosine", dot($"v", $"av"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"anchor_id", $"anchor_label",
        $"rank".cast("long").as("rank"), $"vec_id".as("negative_id"),
        $"label".as("neg_label"), round($"cosine", 4).as("cosine"))
  }

  /** Intra-cluster label purity — the mislabeled-data screen
    * (confident-learning-lite): embeddings are assigned to their IVF
    * cell (broadcast centroids, corpus never shuffles) and each
    * cell reports its majority label and the count of members
    * disagreeing with it; low-purity cells are where labels and
    * geometry contradict and review effort should go. Counts are
    * exact BIGINTs from one map-side-combining (cell, label)
    * aggregate; the majority pick ties to the SMALLER label via
    * max(struct(n, -label)). Cell table is |cells|-bounded at any
    * corpus size. */
  private def labelPurity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = graft.GraftCaches.getOrPersist(s, s"ann.corpus:$d")(corpus(s, d))
    val cells = ivfAssign(e, ivfCentroidsOf(e))
      .join(Tables.embeddings(s, d)
        .select($"vec_id", $"label".cast("long").as("label")), "vec_id")
    val counts = cells.groupBy($"cell", $"label")
      .agg(count(lit(1)).as("n"))
    counts.groupBy($"cell")
      .agg(sum($"n").as("n_members"),
        count(lit(1)).as("n_labels"),
        max(struct($"n", (-$"label").as("neg"))).as("best"))
      .select($"cell", $"n_members", $"n_labels",
        (-$"best.neg").as("majority_label"),
        $"best.n".as("n_majority"),
        ($"n_members" - $"best.n").as("n_flagged"))
      .withColumn("purity_e6",
        expr("(n_majority * 1000000) div n_members"))
      .orderBy($"cell".asc)
  }

  /** Mutual-nearest-neighbor pairs with margin scoring — the
    * bitext-mining / cross-corpus alignment primitive (the
    * Artetxe–Schwenk ratio margin): a pair survives only if each side
    * is the OTHER's top-1 neighbor, and the margin normalizes the
    * pair's cosine by both sides' top-4 neighborhood density so hubs
    * (vectors close to everything) stop winning. Pairs are generated
    * INSIDE IVF cells only (the [[semDedup]] bucketing, registry-
    * cached) — never all-pairs — and the per-side top-k window walks
    * cell-bounded candidate lists. Float discipline: each pair's
    * cosine floors to an e6 int BEFORE the top-4 sum (sums of raw
    * doubles are partition-order-dependent), and the margin clears to
    * ONE exact integer division via the common denominator
    * c·2·nx·ny / (sx·ny + sy·nx). Mutuality is a self-join of the
    * |vectors|-row top-1 table on the reversed key. */
  private def mutualNnMargin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = graft.GraftCaches.getOrPersist(s, s"ann.corpus:$d")(corpus(s, d))
    val lists = graft.GraftCaches.getOrPersist(s, s"ann.semcells:$d") {
      ivfAssign(e, ivfCentroidsOf(e)).join(e, "vec_id")
    }
    val pairs = lists.as("a").join(lists.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        floor(dot(col("a.v"), col("b.v")) * lit(1000000.0)).as("c_e6"))
    val w = Window.partitionBy($"x").orderBy($"c_e6".desc, $"y".asc)
    val ranked = pairs.withColumn("rnk", row_number().over(w))
    val top1 = ranked.filter($"rnk" === 1)
    val denom = ranked.filter($"rnk" <= 4)
      .groupBy($"x")
      .agg(sum($"c_e6").as("s4"), count(lit(1)).as("n4"))
    top1.as("f").join(top1.as("g"),
        col("f.x") === col("g.y") && col("f.y") === col("g.x") &&
          col("f.x") < col("g.x"))
      .select(col("f.x").as("x"), col("f.y").as("y"),
        col("f.c_e6").as("c_e6"))
      .join(denom.select($"x", $"s4".as("sx"), $"n4".as("nx")), "x")
      .join(denom.select($"x".as("y"), $"s4".as("sy"), $"n4".as("ny")),
        "y")
      // a zero denominator would null in Spark but ERROR in DuckDB
      .filter($"sx" * $"ny" + $"sy" * $"nx" =!= 0L)
      .select($"x", $"y", $"c_e6", $"nx", $"ny",
        expr("c_e6 * 2 * nx * ny * 1000000" +
          " div (sx * ny + sy * nx)").as("margin_e6"))
  }

  private def mutualNnOracle: String = {
    val seeds = (0 until IvfCentroids)
      .map(i => NumQueries + 7L * i + 3L).mkString(", ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id IN ($seeds)),
      a AS (SELECT vec_id, v, cid AS cell FROM (
              SELECT ev.vec_id, ev.v, c.cid,
                     row_number() OVER (PARTITION BY ev.vec_id
                       ORDER BY list_dot_product(ev.v, c.cv) DESC,
                                c.cid DESC) AS rn
              FROM e ev CROSS JOIN c) t WHERE rn = 1),
      p AS (SELECT x.vec_id AS x, y.vec_id AS y,
                   CAST(floor(list_dot_product(x.v, y.v) * 1000000.0)
                     AS BIGINT) AS c_e6
            FROM a x JOIN a y
              ON x.cell = y.cell AND x.vec_id <> y.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY x
                        ORDER BY c_e6 DESC, y ASC) AS rnk
            FROM p),
      t1 AS (SELECT x, y, c_e6 FROM r WHERE rnk = 1),
      dn AS (SELECT x, CAST(sum(c_e6) AS BIGINT) AS s4,
                    CAST(count(*) AS BIGINT) AS n4
             FROM r WHERE rnk <= 4 GROUP BY 1),
      m AS (SELECT f.x AS x, f.y AS y, f.c_e6 AS c_e6
            FROM t1 f JOIN t1 g
              ON f.x = g.y AND f.y = g.x AND f.x < g.x)
      SELECT m.x, m.y, m.c_e6, dx.n4 AS nx, dy.n4 AS ny,
             CAST(m.c_e6 * 2 * dx.n4 * dy.n4 * 1000000
               // (dx.s4 * dy.n4 + dy.s4 * dx.n4) AS BIGINT)
               AS margin_e6
      FROM m JOIN dn dx ON dx.x = m.x
             JOIN dn dy ON dy.x = m.y
      WHERE dx.s4 * dy.n4 + dy.s4 * dx.n4 <> 0"""
  }

  /** 8 fixed-seed Johnson-Lindenstrauss projection directions (same
    * LCG family as [[hyperplanes]], independent seed). */
  lazy val jlPlanes: Seq[Seq[Double]] = {
    var state = 777L
    def next(): Double = {
      state = state * 0x5DEECE66DL + 0xBL
      ((state >>> 16) % 2000003L).toDouble / 1000001.5 - 1.0
    }
    Seq.fill(8)(Seq.fill(Dim)(next()))
  }

  /** Johnson-Lindenstrauss random projection: every embedding is
    * mapped 64 → 8 dims through the fixed projection directions — the
    * dimensionality-reduction stage a 100 TB embedding pipeline runs
    * before storing/sketching (JL preserves pairwise distances within
    * 1±ε, so the 8-dim shadow is the cheap pre-filter ahead of exact
    * cosine on survivors; the LSH sign bits in [[lshSignature]] are
    * exactly these projections quantized to 1 bit). Scan-stage
    * per-row dots, no shuffle; the fused [[graft.ext.DotProductExpr]]
    * codegen loop does the arithmetic, and the oracle replays the
    * literal directions through list_dot_product on the fp-parity
    * base q_ann_bruteforce already proves. */
  private def embedProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cols = jlPlanes.zipWithIndex.map { case (p, i) =>
      round(dot($"v", typedLit(p)), 4).as(s"p$i")
    }
    e.select(($"vec_id" +: cols): _*)
  }

  private def jlOracle: String = {
    val projs = jlPlanes.zipWithIndex.map { case (p, i) =>
      s"round(list_dot_product(v, ${p.mkString("[", ", ", "]")}), 4) AS p$i"
    }.mkString(",\n             ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings)
      SELECT vec_id,
             $projs
      FROM e"""
  }

  /** ANN quality gate: recall@k / precision of the LSH index measured
    * against the exact brute-force top-k — the measurement a pipeline
    * runs before trusting an approximate index for retrieval dedup or
    * hard-negative mining. Both sides are the catalog's own oracled
    * pipelines (annBrute is the truth set, annLsh the candidate set);
    * the comparison itself is two tiny per-query aggregates and a
    * left-semi hit join — query-cardinality data, nothing corpus-sized
    * moves. Recall and precision are each ONE divide of exact BIGINTs.
    * At 100 TB this runs on a SAMPLED query set (NumQueries here) —
    * the estimator needs hundreds of probes, not the corpus. */
  private def annRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val truth = annBrute(s, d).select($"query_id", $"neighbor_id")
    val got = annLsh(s, d).select($"query_id", $"neighbor_id")
    val hits = got.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
    val gotN = got.groupBy($"query_id").agg(count(lit(1)).as("n_lsh"))
    truth.groupBy($"query_id").agg(count(lit(1)).as("n_true"))
      .join(gotN, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select($"query_id", $"n_true",
        coalesce($"n_lsh", lit(0L)).as("n_lsh"),
        coalesce($"n_hit", lit(0L)).as("n_hit"),
        (coalesce($"n_hit", lit(0L)).cast("double") / $"n_true")
          .as("recall"),
        when(coalesce($"n_lsh", lit(0L)) > 0,
          coalesce($"n_hit", lit(0L)).cast("double") / $"n_lsh")
          .as("precision"))
  }

  /** One flat WITH replaying BOTH pipelines (shared e/q prefix, then
    * the brute ranking as `truth` and the LSH bucket pipeline as
    * `lranked`) and deriving the per-query hit counts. */
  private def annRecallOracle: String = {
    val sigExpr = hyperplanes.zipWithIndex.map { case (h, i) =>
      s"(CASE WHEN list_dot_product(v, ${h.mkString("[", ", ", "]")}) >= 0" +
        s" THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n               + ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id < $NumQueries),
      tscored AS (SELECT q.query_id, e.vec_id,
                         list_dot_product(e.v, q.qv) AS cosine
                  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      truth AS (SELECT query_id, vec_id FROM (
                  SELECT query_id, vec_id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id ASC) AS rank
                  FROM tscored) WHERE rank <= $TopK),
      sig AS (SELECT vec_id,
               $sigExpr AS sig
              FROM e),
      buckets AS (SELECT vec_id, band,
                         (sig // CAST(power(${1 << SimRowsPerBand}, band)
                                      AS BIGINT))
                           % ${1 << SimRowsPerBand} AS bucket
                  FROM sig
                  CROSS JOIN (SELECT unnest(range($SimBands)) AS band) b),
      qb AS (SELECT vec_id AS query_id, band, bucket
             FROM buckets WHERE vec_id < $NumQueries),
      cand AS (SELECT DISTINCT qb.query_id, bk.vec_id
               FROM buckets bk
               JOIN qb ON bk.band = qb.band AND bk.bucket = qb.bucket
               WHERE bk.vec_id <> qb.query_id),
      lsh AS (SELECT query_id, vec_id FROM (
                SELECT c.query_id, c.vec_id,
                       row_number() OVER (PARTITION BY c.query_id
                         ORDER BY list_dot_product(ev.v, eq.v) DESC,
                                  c.vec_id ASC) AS rank
                FROM cand c
                JOIN e ev ON c.vec_id = ev.vec_id
                JOIN e eq ON c.query_id = eq.vec_id) WHERE rank <= $TopK),
      nt AS (SELECT query_id, count(*) AS n_true FROM truth GROUP BY 1),
      nl AS (SELECT query_id, count(*) AS n_lsh FROM lsh GROUP BY 1),
      nh AS (SELECT t.query_id, count(*) AS n_hit
             FROM truth t JOIN lsh l
               ON t.query_id = l.query_id AND t.vec_id = l.vec_id
             GROUP BY 1)
      SELECT nt.query_id, CAST(n_true AS BIGINT) AS n_true,
             CAST(coalesce(n_lsh, 0) AS BIGINT) AS n_lsh,
             CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
             CAST(coalesce(n_hit, 0) AS DOUBLE) / n_true AS recall,
             CASE WHEN coalesce(n_lsh, 0) > 0 THEN
               CAST(coalesce(n_hit, 0) AS DOUBLE) / n_lsh END AS precision
      FROM nt LEFT JOIN nl ON nt.query_id = nl.query_id
      LEFT JOIN nh ON nt.query_id = nh.query_id"""
  }

  /** Embedding-drift monitor: split the corpus into two snapshots by
    * vec_id parity (standing in for "last week's embeddings vs this
    * week's"), assign every vector to its IVF cell, and report the
    * per-cell population shift plus the L1 centroid displacement in
    * exact cross-multiplied integer form — `drift_num / (1000 ·
    * drift_den)` is Σ_d |mean_A[d] − mean_B[d]|, but the division is
    * left to the reader so the oracle hash stays integer-exact.
    * Re-embedding/model-refresh monitoring is where ANN indexes rot;
    * this is the telemetry that catches it. Shape: the quantized
    * posexplode fans each vector into |dim| rows that combine
    * map-side to (cell, dim) partials — ≤ |cells|·|dim| rows ever
    * cross the wire, independent of corpus size, then a |cells|-row
    * rollup. Rides the same broadcast-centroid assignment as the IVF
    * index build, so at 100 TB it adds one scan, no new join shape. */
  private def embedDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = corpus(s, d)
    val assigned = ivfAssign(e, ivfCentroidsOf(e))
    val exploded = assigned.join(e, "vec_id")
      .select($"cell", ($"vec_id" % 2 === 0).as("is_a"),
        posexplode(transform($"v",
          x => floor(x * 1000 + lit(0.5)).cast("long"))).as(Seq("dim", "xq")))
    exploded.groupBy($"cell", $"dim")
      .agg(
        sum(when($"is_a", $"xq").otherwise(0L)).as("sa"),
        sum(when(!$"is_a", $"xq").otherwise(0L)).as("sb"),
        sum(when($"is_a", 1L).otherwise(0L)).as("na"),
        sum(when(!$"is_a", 1L).otherwise(0L)).as("nb"))
      .groupBy($"cell")
      .agg(
        max($"na").as("n_a"),
        max($"nb").as("n_b"),
        sum(abs($"sa" * $"nb" - $"sb" * $"na")).as("drift_num"),
        max($"na" * $"nb").as("drift_den"))
      .filter($"drift_den" > 0)
  }

  private def embedDriftOracle: String = {
    val seeds = (0 until IvfCentroids)
      .map(i => NumQueries + 7L * i + 3L).mkString(", ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e
               WHERE vec_id IN ($seeds)),
      assign AS (SELECT vec_id, cid AS cell FROM (
          SELECT ev.vec_id, c.cid,
                 row_number() OVER (PARTITION BY ev.vec_id
                   ORDER BY list_dot_product(ev.v, c.cv) DESC,
                            c.cid DESC) AS rn
          FROM e ev CROSS JOIN cent c) t WHERE rn = 1),
      expl AS (SELECT a.cell, t.vec_id % 2 = 0 AS is_a,
                      t.u.dim AS dim,
                      CAST(floor(t.u.x * 1000 + 0.5) AS BIGINT) AS xq
               FROM (SELECT vec_id,
                            unnest(list_transform(v, (x, i) ->
                              {'dim': i - 1, 'x': x})) AS u
                     FROM e) t
               JOIN assign a USING (vec_id)),
      per AS (SELECT cell, dim,
                     CAST(sum(CASE WHEN is_a THEN xq ELSE 0 END)
                       AS BIGINT) AS sa,
                     CAST(sum(CASE WHEN NOT is_a THEN xq ELSE 0 END)
                       AS BIGINT) AS sb,
                     CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END)
                       AS BIGINT) AS na,
                     CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)
                       AS BIGINT) AS nb
              FROM expl GROUP BY 1, 2)
      SELECT cell, max(na) AS n_a, max(nb) AS n_b,
             CAST(sum(abs(sa * nb - sb * na)) AS BIGINT) AS drift_num,
             CAST(max(na * nb) AS BIGINT) AS drift_den
      FROM per GROUP BY 1
      HAVING max(na) * max(nb) > 0"""
  }

  /** Embedding covariance / correlation matrix — the PCA-and-
    * whitening prep every representation pipeline runs before
    * deciding "are my dimensions redundant" (a near-singular
    * covariance means wasted embedding width): all 64·65/2 upper-
    * triangle cells of cov(Xᵢ, Xⱼ) over the corpus, plus the Pearson
    * correlation per cell. Float discipline: each float component is
    * snapped ONCE to the e6 integer grid (floor(x·1e6) — float→
    * double cast and the multiply are IEEE-identical in both
    * engines), and every cross-moment (Σx̃ᵢ, Σx̃ᵢx̃ⱼ, Σx̃ᵢ²) is then an
    * EXACT BIGINT — no double ever accumulates across rows. The
    * covariance/correlation finish per-cell in double on those
    * BIGINTs, floored e9/e6. Integer headroom: Σx̃ᵢx̃ⱼ ≈ 2.8e11 per
    * vector pair-cell, int64-safe through ~3e7 vectors (then the
    * moment columns widen to decimal(38,0)). Shape: one component
    * explode (64 rows/vec), a self-join on vec_id fanning to the
    * upper triangle, and a map-side-combinable (i,j) rollup to
    * exactly 2080 cells — the shuffle carries cell partials, never
    * the fan. */
  private def embedCovariance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val comp = Tables.embeddings(s, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"vec_id", $"dim",
        floor($"x".cast("double") * lit(1000000.0)).cast("long")
          .as("xf"))
    val a = comp.select($"vec_id", $"dim".as("i"), $"xf".as("xi"))
    val b = comp.select($"vec_id", $"dim".as("j"), $"xf".as("xj"))
    val cells = a.join(b, Seq("vec_id")).filter($"i" <= $"j")
      .groupBy($"i", $"j")
      .agg(count(lit(1)).as("n"), sum($"xi").as("sx"),
        sum($"xj").as("sy"), sum($"xi" * $"xj").as("sxy"),
        sum($"xi" * $"xi").as("sxx"), sum($"xj" * $"xj").as("syy"))
    val n = $"n".cast("double")
    val cov = ($"sxy" / n - ($"sx" / n) * ($"sy" / n))
    val vx = $"sxx" / n - ($"sx" / n) * ($"sx" / n)
    val vy = $"syy" / n - ($"sy" / n) * ($"sy" / n)
    cells.select($"i".cast("long").as("i"), $"j".cast("long").as("j"),
      $"n",
      floor(cov / lit(1.0e12) * lit(1.0e9)).cast("long").as("cov_e9"),
      when($"i" === $"j", lit(1000000L))
        .otherwise(when(vx > 0 && vy > 0,
          floor(cov / sqrt(vx * vy) * lit(1000000.0)).cast("long")))
        .as("corr_e6"))
  }

  private val embedCovarianceOracle = """
      WITH comp AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS xf
        FROM embeddings),
      cells AS (
        SELECT a.dim AS i, b.dim AS j,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a.xf) AS BIGINT) AS sx,
               CAST(sum(b.xf) AS BIGINT) AS sy,
               CAST(sum(a.xf * b.xf) AS BIGINT) AS sxy,
               CAST(sum(a.xf * a.xf) AS BIGINT) AS sxx,
               CAST(sum(b.xf * b.xf) AS BIGINT) AS syy
        FROM comp a JOIN comp b
          ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2)
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n,
             CAST(floor((CAST(sxy AS DOUBLE) / n
                 - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               / 1.0e12 * 1.0e9) AS BIGINT) AS cov_e9,
             CASE WHEN i = j THEN 1000000
                  WHEN CAST(sxx AS DOUBLE) / n
                       - (CAST(sx AS DOUBLE) / n)
                         * (CAST(sx AS DOUBLE) / n) > 0
                   AND CAST(syy AS DOUBLE) / n
                       - (CAST(sy AS DOUBLE) / n)
                         * (CAST(sy AS DOUBLE) / n) > 0 THEN
               CAST(floor((CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n))
                 / sqrt((CAST(sxx AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n)
                       * (CAST(sx AS DOUBLE) / n))
                   * (CAST(syy AS DOUBLE) / n
                     - (CAST(sy AS DOUBLE) / n)
                       * (CAST(sy AS DOUBLE) / n)))
                 * 1000000.0) AS BIGINT)
             END AS corr_e6
      FROM cells"""

  /** Covariance cells as (i, j, c-double) for the FULL symmetric
    * matrix (upper triangle mirrored), shared by [[embedCovariance]]'s
    * consumers via the registry. The doubles are per-cell functions
    * of exact BIGINT moments — identical in any engine. */
  private def covMatrix(s: SparkSession, d: String): DataFrame =
    graft.GraftCaches.getOrPersist(s, s"sim.covmatrix:$d") {
      import s.implicits._
      val comp = Tables.embeddings(s, d)
        .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
        .select($"vec_id", $"dim",
          floor($"x".cast("double") * lit(1000000.0)).cast("long")
            .as("xf"))
      val a = comp.select($"vec_id", $"dim".as("i"), $"xf".as("xi"))
      val b = comp.select($"vec_id", $"dim".as("j"), $"xf".as("xj"))
      val tri = a.join(b, Seq("vec_id")).filter($"i" <= $"j")
        .groupBy($"i", $"j")
        .agg(count(lit(1)).as("n"), sum($"xi").as("sx"),
          sum($"xj").as("sy"), sum($"xi" * $"xj").as("sxy"))
        .select($"i".cast("long").as("i"), $"j".cast("long").as("j"),
          (($"sxy" / $"n".cast("double")
            - ($"sx" / $"n".cast("double"))
              * ($"sy" / $"n".cast("double"))) / lit(1.0e12)).as("c"))
      tri.unionAll(tri.filter($"i" < $"j")
        .select($"j".as("i"), $"i".as("j"), $"c"))
    }

  /** Top principal component of the embedding covariance by THREE
    * unrolled power iterations — the "is my embedding width wasted"
    * answer [[embedCovariance]] sets up: v₀ = 1/8 (exactly 0.125 —
    * 1/√64 is a power of two, representable), then each round is one
    * matvec + renormalize in the catalog's fixed-point discipline:
    * matvec terms floor(c·vⱼ·1e9) are summed as exact BIGINTs
    * (order-independent — a double matvec would be partition-order
    * dependent), the norm is floor(√ΣW²) on an exact BIGINT (sqrt is
    * correctly-rounded IEEE, identical everywhere), and the
    * renormalized component is sign(w)·(|w|·1e9 div norm) — magnitude
    * and sign separated because integer division of NEGATIVES
    * diverges across engines (Spark truncates, DuckDB floors). The
    * final Rayleigh-style eigenvalue is the norm of one more matvec
    * (‖Cv‖ with ‖v‖≈1). Everything after the covariance rollup is
    * O(dims²) = 4096 rows; iterations are unrolled into one DAG with
    * the matrix registry-persisted. */
  private def pcaPower(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = covMatrix(s, d)
    // each round's w feeds BOTH the norm aggregate and the renorm
    // select, and the next matvec reads the renormed v — without a
    // persist the recomputation doubles per round (the kcore lesson:
    // 2^rounds replays of the whole chain; measured 8.3 s at sf0.1,
    // 1.8 s persisted). The vector is dims-cardinality: broadcast it
    // into the matvec so the join is map-side.
    def matvec(v: DataFrame): DataFrame =
      m.join(broadcast(v), "j").groupBy($"i")
        .agg(sum(floor($"c" * $"v" * lit(1.0e9)).cast("long")).as("w"))
    def renorm(w: DataFrame): DataFrame = {
      val nrm = w.agg(floor(sqrt(sum($"w" * $"w").cast("double")))
        .cast("long").as("nrm"))
      w.crossJoin(broadcast(nrm))
        .select($"i".as("j"),
          (when($"w" < 0, -1L).otherwise(1L)
            * expr("abs(w) * 1000000000 div nrm")).as("v_e9"))
        .withColumn("v", $"v_e9".cast("double") / lit(1.0e9))
    }
    var v = m.select($"j").distinct()
      .withColumn("v", lit(0.125))
      .withColumn("v_e9", lit(125000000L))
    for (r <- 1 to 3) {
      val cur = v
      v = graft.GraftCaches.getOrPersist(s, s"sim.pca.v$r:$d") {
        renorm(matvec(cur))
      }
    }
    val last = matvec(v)
    val eig = last.agg(floor(sqrt(sum($"w" * $"w").cast("double")))
      .cast("long").as("eigval_e9"))
    v.crossJoin(broadcast(eig))
      .select($"j".as("dim"), $"v_e9", $"eigval_e9")
  }

  private val pcaPowerOracle = {
    val covCte = """
      comp AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS xf
        FROM embeddings),
      tri AS (
        SELECT CAST(a.dim AS BIGINT) AS i, CAST(b.dim AS BIGINT) AS j,
               (CAST(sum(a.xf * b.xf) AS DOUBLE) / count(*)
                - (CAST(sum(a.xf) AS DOUBLE) / count(*))
                  * (CAST(sum(b.xf) AS DOUBLE) / count(*))) / 1.0e12
                 AS c
        FROM comp a JOIN comp b
          ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2),
      m AS (SELECT i, j, c FROM tri
            UNION ALL
            SELECT j AS i, i AS j, c FROM tri WHERE i < j)"""
    def step(vin: String, wout: String, vout: String) = s"""
      $wout AS (SELECT m.i,
                       CAST(sum(CAST(floor(m.c * v.v * 1.0e9)
                         AS BIGINT)) AS BIGINT) AS w
                FROM m JOIN $vin v ON m.j = v.j GROUP BY 1),
      ${wout}n AS (SELECT CAST(floor(sqrt(CAST(sum(w * w) AS DOUBLE)))
                     AS BIGINT) AS nrm
                   FROM $wout),
      $vout AS (SELECT i AS j,
                       (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                         * (abs(w) * 1000000000 // nrm) AS v_e9,
                       CAST((CASE WHEN w < 0 THEN -1 ELSE 1 END)
                         * (abs(w) * 1000000000 // nrm) AS DOUBLE)
                         / 1.0e9 AS v
                FROM $wout CROSS JOIN ${wout}n)"""
    s"""
      WITH $covCte,
      v0 AS (SELECT DISTINCT j, 0.125 AS v FROM m),
      ${step("v0", "w1", "v1")},
      ${step("v1", "w2", "v2")},
      ${step("v2", "w3", "v3")},
      w4 AS (SELECT m.i,
                    CAST(sum(CAST(floor(m.c * v.v * 1.0e9) AS BIGINT))
                      AS BIGINT) AS w
             FROM m JOIN v3 v ON m.j = v.j GROUP BY 1),
      eig AS (SELECT CAST(floor(sqrt(CAST(sum(w * w) AS DOUBLE)))
                AS BIGINT) AS eigval_e9
              FROM w4)
      SELECT v3.j AS dim, CAST(v3.v_e9 AS BIGINT) AS v_e9, eig.eigval_e9
      FROM v3 CROSS JOIN eig"""
  }

  /** Variance explained by the top principal component —
    * λ₁ / trace(C), the single number that answers "how much of the
    * embedding's energy lives in one direction" (≈1/dims ⇒ healthy
    * isotropy; ≫1/dims ⇒ anisotropic collapse, the classic failure
    * mode of contrastive embeddings). Trace is floor-then-sum e9
    * over the diagonal cells; λ₁ comes from [[pcaPower]] (whose
    * per-round vectors are registry-persisted, so this costs one
    * extra aggregate); the ratio is one positive integer division. */
  private def pcaExplained(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val trace = covMatrix(s, d).filter($"i" === $"j")
      .agg(sum(floor($"c" * lit(1.0e9)).cast("long")).as("trace_e9"),
        count(lit(1)).as("dims"))
    val eig = pcaPower(s, d).agg(max($"eigval_e9").as("eigval_e9"))
    val nv = Tables.embeddings(s, d).agg(count(lit(1)).as("n_vecs"))
    nv.crossJoin(trace).crossJoin(eig)
      .withColumn("explained_e6",
        expr("eigval_e9 * 1000000 div trace_e9"))
  }

  private val pcaExplainedOracle = s"""
      SELECT n.n_vecs, t.dims, t.trace_e9, e.eigval_e9,
             CAST(e.eigval_e9 * 1000000 // t.trace_e9 AS BIGINT)
               AS explained_e6
      FROM (SELECT CAST(count(*) AS BIGINT) AS n_vecs
            FROM embeddings) n
      CROSS JOIN (
        WITH comp AS (
          SELECT vec_id,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                   * 1000000.0) AS BIGINT) AS xf
          FROM embeddings),
        tri AS (
          SELECT CAST(a.dim AS BIGINT) AS i,
                 CAST(b.dim AS BIGINT) AS j,
                 (CAST(sum(a.xf * b.xf) AS DOUBLE) / count(*)
                  - (CAST(sum(a.xf) AS DOUBLE) / count(*))
                    * (CAST(sum(b.xf) AS DOUBLE) / count(*)))
                   / 1.0e12 AS c
          FROM comp a JOIN comp b
            ON a.vec_id = b.vec_id AND a.dim <= b.dim
          GROUP BY 1, 2)
        SELECT CAST(sum(CAST(floor(c * 1.0e9) AS BIGINT)) AS BIGINT)
                 AS trace_e9,
               CAST(count(*) AS BIGINT) AS dims
        FROM tri WHERE i = j) t
      CROSS JOIN (SELECT CAST(max(eigval_e9) AS BIGINT) AS eigval_e9
                  FROM ($pcaPowerOracle)) e"""

  /** Output dimensionality of [[randomProjection]] — 64 → 16, the 4×
    * compression JL tolerates at ε ≈ √(ln n / k). */
  val JlOutDims = 16

  /** Johnson–Lindenstrauss random projection (Achlioptas 2003,
    * "Database-friendly random projections": a ±1 sign matrix is a
    * JL transform) — project every 64-dim embedding to
    * [[JlOutDims]] dims with a deterministic sign matrix
    * sign(i,j) = ±1 from the top bit of Knuth-multiplicative
    * hash((i·k+j)·2654435761 mod 2³²), and audit the isometry:
    * ratio_e4 ≈ 10⁴·‖Px‖²/(k·‖x‖²), which JL concentrates near 10⁴.
    * This is the dimensionality-reduction prefilter for ANN at
    * 100 TB — distance computations shrink 4× while rank order is
    * approximately preserved; the ratio column is the per-vector
    * audit a pipeline alerts on.
    *
    * Shape at scale: completely SCAN-LOCAL — components snap to the
    * e6 grid per row, the 16 projections and both squared norms are
    * per-row integer folds (no shuffle, no join, embarrassingly
    * parallel over input splits). All arithmetic is exact BIGINT:
    * |xf| ≤ 1e6 ⇒ |proj| ≤ 6.4e7 ⇒ Σ₁₆ proj² ≤ 6.6e16, within
    * int64; the ratio is a positive-operand integer division
    * (denominator pre-scaled to keep every product under 2⁶³). */
  private def randomProjection(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = JlOutDims
    val xf = transform($"embedding",
      x => floor(x.cast("double") * lit(1.0e6)).cast("long"))
    def signedAt(v: Column, i: Column, j: Column): Column = {
      val x = element_at(v, (i + 1).cast("int"))
      when(pmod((i * k + j) * lit(2654435761L), lit(4294967296L))
        < lit(2147483648L), x).otherwise(-x)
    }
    // bindOnce: the k×d projection lambda references the snapped
    // vector per (j, i) pair — unbound, the e6 grid transform would
    // re-run O(k·d) times per row (see TextOps.bindOnce)
    Tables.embeddings(s, d)
      .select($"vec_id", TextOps.bindOnce(xf) { v =>
        struct(
          aggregate(v, lit(0L), (a, x) => a + x * x)
            .as("orig_n2_e12"),
          transform(sequence(lit(0L), lit(k - 1L)),
            j => aggregate(sequence(lit(0L), size(v).cast("long") - 1L),
              lit(0L), (a, i) => a + signedAt(v, i, j))).as("proj"))
      }.as("s"))
      .select($"vec_id", $"s.orig_n2_e12".as("orig_n2_e12"),
        $"s.proj".as("proj"))
      .select($"vec_id", $"orig_n2_e12",
        aggregate($"proj", lit(0L), (a, p) => a + p * p)
          .as("proj_n2_e12"))
      .withColumn("ratio_e4", expr(
        s"""CASE WHEN orig_n2_e12 * $k >= 10000
            THEN proj_n2_e12 div ((orig_n2_e12 * $k) div 10000)
            END"""))
  }

  private val randomProjectionOracle = s"""
      WITH comp AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                 * 1000000.0) AS BIGINT) AS xf
        FROM embeddings),
      p AS (SELECT c.vec_id, j.j,
                   CAST(sum(CASE WHEN (c.i * $JlOutDims + j.j)
                                      * 2654435761 % 4294967296
                                      < 2147483648
                                 THEN c.xf ELSE -c.xf END) AS BIGINT)
                     AS pr
            FROM comp c
            CROSS JOIN (SELECT unnest(range($JlOutDims)) AS j) j
            GROUP BY 1, 2),
      n2 AS (SELECT vec_id, CAST(sum(xf * xf) AS BIGINT)
                      AS orig_n2_e12
             FROM comp GROUP BY 1),
      pn AS (SELECT vec_id, CAST(sum(pr * pr) AS BIGINT)
                      AS proj_n2_e12
             FROM p GROUP BY 1)
      SELECT n2.vec_id, n2.orig_n2_e12, pn.proj_n2_e12,
             CASE WHEN n2.orig_n2_e12 * $JlOutDims >= 10000
                  THEN CAST(pn.proj_n2_e12
                         // ((n2.orig_n2_e12 * $JlOutDims) // 10000)
                         AS BIGINT)
             END AS ratio_e4
      FROM n2 JOIN pn USING (vec_id)"""

  /** Number of medoid anchors [[silhouette]] clusters against. */
  val SilhouetteK = 8

  /** Medoid-based simplified silhouette — the clustering-QUALITY
    * metric the kmeans family (q_kmeanspp_init seeding,
    * q_kmeans_refine Lloyd steps) lacked: how well-separated are the
    * clusters, per cluster. Uses the simplified (centroid-form)
    * silhouette of Hruschka et al. with MEDOID anchors (the
    * [[SilhouetteK]] min-id vectors — data points, so every distance
    * is on the exact e6 component grid) and SQUARED distances:
    * s = (b₂ − a₂)/b₂ with a₂ = d² to the assigned (nearest) anchor
    * and b₂ the second-nearest, so 0 ≤ s ≤ 1 and the whole statistic
    * is integer-exact — no sqrt, no float, emitted e6. Shape: anchors
    * broadcast into the corpus scan (K rows), per-vector
    * nearest/second-nearest via ONE window over the K-row
    * per-vector group (shuffle ∝ corpus·K — the IVF assignment
    * shape), then a K-row rollup. */
  private def silhouette(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val xf = transform($"embedding",
      x => floor(x.cast("double") * lit(1.0e6)).cast("long"))
    val emb = Tables.embeddings(s, d).select($"vec_id", xf.as("xf"))
    val anchors = emb.filter($"vec_id" < SilhouetteK)
      .select($"vec_id".as("mid"), $"xf".as("mxf"))
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    val ranked = emb.crossJoin(broadcast(anchors))
      .select($"vec_id", $"mid", d2($"xf", $"mxf").as("dd"))
      .withColumn("rn", row_number().over(
        W.partitionBy($"vec_id").orderBy($"dd".asc, $"mid".asc)))
      .filter($"rn" <= 2)
    val a = ranked.filter($"rn" === 1)
      .select($"vec_id", $"mid".as("cluster_id"), $"dd".as("a2"))
    val b = ranked.filter($"rn" === 2)
      .select($"vec_id", $"dd".as("b2"))
    a.join(b, "vec_id")
      // anchors sit at distance 0 from themselves (a2 = 0, s = 1);
      // b2 = 0 would mean two identical anchors — degenerate, s := 0.
      // ADVICE r12: widen (b2 − a2) to decimal(38,0) BEFORE the ×1e6 —
      // squared e6-grid distances reach ~1.8e18 on 64 dims (5× under
      // int64 max) and components near ±1 push the comparand past it,
      // where int64 wraps silently while DuckDB's HUGEINT stays exact.
      .select($"cluster_id",
        when($"b2" > 0,
          expr("cast(cast(b2 - a2 as decimal(38,0)) * 1000000 div b2" +
            " as bigint)"))
          .otherwise(0L).as("s_e6"))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum($"s_e6").as("sum_s_e6"))
      .withColumn("mean_s_e6", expr("sum_s_e6 div n_vecs"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_silhouette", silhouette, Some(s"""
      WITH emb AS (SELECT vec_id,
                          list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 1e6)
                              AS BIGINT)) AS xf
                   FROM embeddings),
      anchors AS (SELECT vec_id AS mid, xf AS mxf FROM emb
                  WHERE vec_id < $SilhouetteK),
      dist AS (SELECT e.vec_id, a.mid,
                      list_sum(list_transform(
                        list_zip(e.xf, a.mxf),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dd
               FROM emb e CROSS JOIN anchors a),
      rk AS (SELECT vec_id, mid, dd,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY dd ASC, mid ASC) AS rn
             FROM dist),
      ab AS (SELECT a.vec_id, a.mid AS cluster_id,
                    a.dd AS a2, b.dd AS b2
             FROM (SELECT * FROM rk WHERE rn = 1) a
             JOIN (SELECT * FROM rk WHERE rn = 2) b USING (vec_id)),
      sil AS (SELECT cluster_id,
                     CASE WHEN b2 > 0 THEN (b2 - a2) * 1000000 // b2
                          ELSE 0 END AS s_e6
              FROM ab)
      SELECT cluster_id,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(s_e6) AS BIGINT) AS sum_s_e6,
             CAST(sum(s_e6) // count(*) AS BIGINT) AS mean_s_e6
      FROM sil GROUP BY 1""")),
    Q("q_random_projection", randomProjection,
      Some(randomProjectionOracle)),
    Q("q_pca_power", pcaPower, Some(pcaPowerOracle)),
    Q("q_pca_explained", pcaExplained, Some(pcaExplainedOracle)),
    Q("q_embed_covariance", embedCovariance,
      Some(embedCovarianceOracle)),
    Q("q_ann_recall", annRecall, Some(annRecallOracle)),
    Q("q_embed_project", embedProject, Some(jlOracle)),
    Q("q_semdedup", semDedup, Some(semDedupOracle)),
    Q("q_mutual_nn_margin", mutualNnMargin, Some(mutualNnOracle)),
    Q("q_hard_negatives", hardNegatives, Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CAST(label AS BIGINT) AS label
                 FROM embeddings),
      a AS (SELECT vec_id AS anchor_id, v AS av,
                   label AS anchor_label
            FROM e WHERE vec_id < $NumQueries),
      r AS (SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
                   list_dot_product(e.v, a.av) AS cosine,
                   row_number() OVER (PARTITION BY a.anchor_id
                     ORDER BY list_dot_product(e.v, a.av) DESC,
                              e.vec_id ASC) AS rank
            FROM e JOIN a ON e.label <> a.anchor_label)
      SELECT anchor_id, anchor_label, CAST(rank AS BIGINT) AS rank,
             vec_id AS negative_id, label AS neg_label,
             round(cosine, 4) AS cosine
      FROM r WHERE rank <= $TopK""")),
    Q("q_label_purity", labelPurity, Some {
      val seeds = (0 until IvfCentroids)
        .map(i => NumQueries + 7L * i + 3L).mkString(", ")
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CAST(label AS BIGINT) AS label
                 FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id IN ($seeds)),
      asg AS (SELECT vec_id, label, cid AS cell FROM (
                SELECT ev.vec_id, ev.label, c.cid,
                       row_number() OVER (PARTITION BY ev.vec_id
                         ORDER BY list_dot_product(ev.v, c.cv) DESC,
                                  c.cid DESC) AS rn
                FROM e ev CROSS JOIN c) t WHERE rn = 1),
      cnt AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS n
              FROM asg GROUP BY 1, 2),
      best AS (SELECT cell, label AS majority_label, n AS n_majority
               FROM (SELECT cell, label, n,
                            row_number() OVER (PARTITION BY cell
                              ORDER BY n DESC, label ASC) AS rn
                     FROM cnt) t WHERE rn = 1),
      agg AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_members,
                     CAST(count(*) AS BIGINT) AS n_labels
              FROM cnt GROUP BY 1)
      SELECT agg.cell, agg.n_members, agg.n_labels,
             best.majority_label, best.n_majority,
             CAST(agg.n_members - best.n_majority AS BIGINT)
               AS n_flagged,
             CAST((best.n_majority * 1000000) // agg.n_members
               AS BIGINT) AS purity_e6
      FROM agg JOIN best USING (cell)
      ORDER BY agg.cell"""
    }),
    Q("q_embed_centroids", embedCentroids, Some("""
      WITH e AS (SELECT label,
                        generate_subscripts(embedding, 1) - 1 AS pos,
                        unnest(embedding) AS v
                 FROM embeddings)
      SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
             round(avg(v), 6) AS centroid
      FROM e GROUP BY 1, 2""")),
    Q("q_matryoshka_eval", matryoshkaEval, Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id < $NumQueries),
      base AS (SELECT q.query_id, e.vec_id, e.v, q.qv
               FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      fullr AS (SELECT query_id, vec_id FROM (
                  SELECT query_id, vec_id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY list_dot_product(v, qv)
                             / (sqrt(list_dot_product(v, v))
                                * sqrt(list_dot_product(qv, qv))) DESC,
                           vec_id ASC) AS rank
                  FROM base) WHERE rank <= $TopK),
      truncr AS (SELECT query_id, vec_id FROM (
                   SELECT query_id, vec_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY list_dot_product(v[1:$MatDim],
                                qv[1:$MatDim])
                              / (sqrt(list_dot_product(v[1:$MatDim],
                                  v[1:$MatDim]))
                                 * sqrt(list_dot_product(qv[1:$MatDim],
                                     qv[1:$MatDim]))) DESC,
                            vec_id ASC) AS rank
                   FROM base) WHERE rank <= $TopK),
      ov AS (SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_overlap
             FROM fullr f JOIN truncr t
               ON f.query_id = t.query_id AND f.vec_id = t.vec_id
             GROUP BY 1)
      SELECT q.query_id,
             CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
             CAST(coalesce(ov.n_overlap, 0) * 100 // $TopK AS BIGINT)
               AS recall_pct
      FROM q LEFT JOIN ov ON q.query_id = ov.query_id""")),

    Q("q_ann_bruteforce", annBrute, Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id < ${NumQueries}),
      scored AS (SELECT q.query_id, e.vec_id,
                        list_dot_product(e.v, q.qv) AS cosine
                 FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, cosine,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id ASC) AS rank
                 FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank,
             vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rank <= ${TopK}"""), headline = true),
    Q("q_embed_quantize", embedQuantize, Some(quantizeOracle)),
    Q("q_embed_drift", embedDrift, Some(embedDriftOracle)),
    Q("q_ann_lsh", annLsh, Some(lshOracle)),
    Q("q_ann_multiprobe", annMultiprobe, Some(multiprobeOracle)),
    Q("q_ann_ivf", annIvf, Some(ivfOracle)),
    Q("q_kmeans_refine", kmeansRefine, Some(kmeansOracle)),
    Q("q_kmeanspp_init", kmeansParInit, Some(kmeansParInitOracle)),
    Q("q_kcenter_greedy", kcenterGreedy, Some(kcenterGreedyOracle)),
    Q("q_negative_sample", negativeSample, Some(s"""
      WITH e AS (SELECT vec_id, label FROM embeddings),
      a AS (SELECT vec_id AS anchor_id, label AS anchor_label
            FROM e WHERE vec_id < $NumQueries),
      cand AS (SELECT a.anchor_id, e.vec_id, e.label,
                      (a.anchor_id * 2654435761 + e.vec_id * 40503)
                        % 4294967296 AS u
               FROM e CROSS JOIN a WHERE e.label <> a.anchor_label),
      r AS (SELECT anchor_id, vec_id, label,
                   row_number() OVER (PARTITION BY anchor_id
                                      ORDER BY u ASC, vec_id ASC) AS rn
            FROM cand)
      SELECT anchor_id, CAST(rn AS BIGINT) AS rn,
             vec_id AS negative_id, CAST(label AS BIGINT) AS neg_label
      FROM r WHERE rn <= $TopK""")),
    Q("q_ann_pq", annPq, Some(pqOracle)),
    Q("q_embed_neardup_lsh", embedNearDupLsh, Some(nearDupLshOracle),
      headline = true),
    Q("q_maxsim", maxSim, Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CAST(label AS BIGINT) AS label
                 FROM embeddings),
      q AS (SELECT vec_id AS query_vec, v AS qv FROM e
            WHERE vec_id < $NumQueries),
      best AS (SELECT e.label, q.query_vec,
                      CAST(floor(max(list_dot_product(e.v, q.qv)) * 1e6)
                        AS BIGINT) AS best_e6
               FROM e CROSS JOIN q
               WHERE e.vec_id >= $NumQueries
               GROUP BY 1, 2)
      SELECT label, CAST(count(*) AS BIGINT) AS n_qtokens,
             CAST(sum(best_e6) AS BIGINT) AS maxsim_e6
      FROM best GROUP BY 1 ORDER BY label""")),
    Q("q_knn_labels", knnLabels, Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id < ${NumQueries}),
      scored AS (SELECT q.query_id, e.vec_id,
                        list_dot_product(e.v, q.qv) AS cosine
                 FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id ASC) AS rank
                 FROM scored)
      SELECT query_id, CAST(l.label AS BIGINT) AS label,
             count(*) AS votes
      FROM ranked JOIN embeddings l ON ranked.vec_id = l.vec_id
      WHERE rank <= ${TopK}
      GROUP BY 1, 2"""))
  )
}
