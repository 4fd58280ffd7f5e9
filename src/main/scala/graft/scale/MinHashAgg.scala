package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MinHash SKETCH UNION as a typed Aggregator (SURVEY.md §4.3): the
  * 128-slot signature of a whole GROUP of documents, built by merging
  * per-element mins — `union(sig(A), sig(B)) = sig(A ∪ B)` is the
  * minhash identity that makes the sketch mergeable, i.e. a partial-
  * aggregable distributive aggregate. At 100 TB this is how corpus-
  * level similarity (per source, per crawl, per day) is computed in
  * one pass: signatures combine map-side, only 128 longs per group
  * cross the shuffle.
  *
  * Input = one doc's shingle-hash array (Dedup.shingleHashes); the
  * group signature estimates Jaccard between groups' shingle SETS as
  * (matching slots)/128 — accuracy ±1/√128 ≈ 0.09 (spec-bounded
  * against the exact set Jaccard).
  */
object MinHashSigAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val P = 2147483647L
  // same deterministic coefficients as Dedup's per-doc signatures
  private lazy val coefs: Array[(Long, Long)] = {
    var state = 20240601L
    def next(bound: Long): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.floorMod(state >>> 17, bound)
    }
    Array.fill(Dedup.NumHashes)((next(P - 1) + 1, next(P)))
  }

  override def zero: Array[Long] = Array.fill(Dedup.NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      val (a, b) = coefs(i)
      var m = buf(i)
      shingles.foreach { h =>
        val v = math.floorMod(math.floorMod(h, P) * a + b, P)
        if (v < m) m = v
      }
      buf(i) = m
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Estimated Jaccard between two group signatures. */
  def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.size

  /** Catalog query: per-language corpus signatures → pairwise
    * estimated language similarity, with the estimate's contract made
    * DRIVER-CHECKABLE (round 10, retiring the catalog's last no-oracle
    * rows). The sketch estimate itself differs from anything DuckDB
    * can compute, so the query ALSO derives the EXACT corpus Jaccard
    * over 3-token shingle STRINGS — a formulation both engines can
    * reproduce verbatim (the hash-set Jaccard the sketch approximates
    * differs from it only by xxhash64 collisions) — and emits
    * (exact_jaccard_ppm, |est − exact| ≤ 0.1 flag). The estimate is
    * deterministic, so the flag is a stable boolean the oracle pins
    * TRUE: a sketch regression hash-fails the gate. The exact side is
    * the VERIFICATION harness (O(distinct shingles) join); at 100 TB
    * the release path ships the 128-long signatures alone. */
  def langSimilarity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sketch = udaf(MinHashSigAgg)
    val docs = Tables.documents(s, d)
    // ONE signature pass (guide §2.4 — a DataFrame self-join
    // re-executes its whole subtree once per side, so the r16 plan
    // MinHash-signed the entire corpus twice). |langs| rows: the
    // localCheckpoint is a rounding error that halves the UDAF work.
    val sigs = docs
      .select($"lang", Dedup.shingleHashes($"text").as("sh"))
      .groupBy($"lang")
      .agg(sketch($"sh").as("sig"))
      .localCheckpoint(eager = false)
    // slot-match fraction as native zip_with/aggregate expressions
    // (no UDF; mirrors `estimate` which the spec uses as the model)
    val matches = aggregate(
      zip_with($"a.sig", $"b.sig",
        (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    val est = sigs.as("a").join(sigs.as("b"), $"a.lang" < $"b.lang")
      .select($"a.lang".as("lang1"), $"b.lang".as("lang2"),
        (matches.cast("double") / size($"a.sig")).as("est"))
    // exact corpus Jaccard over shingle strings (oracle-reproducible:
    // trim + lowercase + \s+ split, 3-token windows, per-lang
    // DISTINCT). bindOnce: the r16 form aliased the split and let the
    // trigram lambda re-tokenize per element per reference — this one
    // pass alone measured 18.7 s at sf0.1 (see TextOps.bindOnce).
    val ls = docs
      .select($"lang", explode(TextOps.bindOnce(
        split(lower(trim($"text")), "\\s+")) { t =>
        when(size(t) >= 3,
          transform(sequence(lit(1), size(t) - lit(2)),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
              element_at(t, i + 2))))
          .otherwise(array().cast("array<string>"))
      }).as("sh"))
      .distinct()
    // ONE pass over the distinct (lang, shingle) table: the per-shingle
    // sorted lang set yields BOTH per-lang sizes and every cross-lang
    // intersection count. The r16 plan computed `ls` FOUR times — once
    // per broadcast copy of `sizes`, twice under the `inter` self-join
    // (guide §2.4: remove shuffles/passes outright; measured 20.5 s →
    // see OPTIMIZATION_r17.md). `langs` is ≤ |langs| long and sorted,
    // so expanding (x, y) pairs with x before y in the sorted distinct
    // array replays the old `x.lang < y.lang` join predicate exactly.
    // localCheckpoint materializes the ~|distinct shingles| rows once
    // for its two consumers instead of re-running the corpus explode
    // per consumer (lazy: materializes on first action, so plan-only
    // tooling stays cheap; NOT fault-tolerant — swap for a reliable
    // checkpoint dir at cluster scale, the Dedup.scala convention).
    val byShingle = ls.groupBy($"sh")
      .agg(sort_array(collect_set($"lang")).as("langs"))
      .localCheckpoint(eager = false)
    val sizes = byShingle.select(explode($"langs").as("lang"))
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val inter = byShingle
      .filter(size($"langs") >= 2)
      .select(explode(expr(
        "flatten(transform(langs, (x, i) -> " +
          "transform(slice(langs, i + 2, size(langs)), " +
          "y -> named_struct('lang1', x, 'lang2', y))))")).as("p"))
      .groupBy($"p.lang1".as("lang1"), $"p.lang2".as("lang2"))
      .agg(count(lit(1)).as("ni"))
    est
      .join(broadcast(sizes.select($"lang".as("lang1"), $"n".as("n1"))),
        "lang1")
      .join(broadcast(sizes.select($"lang".as("lang2"), $"n".as("n2"))),
        "lang2")
      .join(broadcast(inter), Seq("lang1", "lang2"), "left")
      .withColumn("ni", coalesce($"ni", lit(0L)))
      .select($"lang1", $"lang2",
        expr("(ni * 1000000) div (n1 + n2 - ni)").as("exact_jaccard_ppm"),
        (abs($"est" - $"ni".cast("double") / ($"n1" + $"n2" - $"ni"))
          <= lit(0.1)).as("est_within_band"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_sketch_union", langSimilarity, Some("""
      WITH t AS (SELECT lang,
                        string_split_regex(lower(trim(text)), '\s+') AS t
                 FROM documents),
      sh AS (SELECT lang,
                    CASE WHEN len(t) >= 3
                         THEN list_transform(range(2, len(t)),
                                i -> t[i-1] || ' ' || t[i] || ' ' || t[i+1])
                         ELSE [] END AS shingles
             FROM t),
      ls AS (SELECT DISTINCT lang, sh
             FROM (SELECT lang, unnest(shingles) AS sh FROM sh)),
      sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                FROM ls GROUP BY 1),
      inter AS (SELECT x.lang AS lang1, y.lang AS lang2,
                       CAST(count(*) AS BIGINT) AS ni
                FROM ls x JOIN ls y
                  ON x.sh = y.sh AND x.lang < y.lang
                GROUP BY 1, 2),
      pairs AS (SELECT s1.lang AS lang1, s2.lang AS lang2,
                       s1.n AS n1, s2.n AS n2
                FROM sizes s1 JOIN sizes s2 ON s1.lang < s2.lang)
      SELECT lang1, lang2,
             CAST((coalesce(ni, 0) * 1000000)
               // (n1 + n2 - coalesce(ni, 0)) AS BIGINT)
               AS exact_jaccard_ppm,
             TRUE AS est_within_band
      FROM pairs LEFT JOIN inter USING (lang1, lang2)""")))
}
