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
    * estimated language similarity (rows-only; spec bounds the
    * estimate against exact set Jaccard). */
  def langSimilarity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sketch = udaf(MinHashSigAgg)
    val sigs = Tables.documents(s, d)
      .select($"lang", Dedup.shingleHashes($"text").as("sh"))
      .groupBy($"lang")
      .agg(sketch($"sh").as("sig"))
    // slot-match fraction as native zip_with/aggregate expressions
    // (no UDF; mirrors `estimate` which the spec uses as the model)
    val matches = aggregate(
      zip_with($"a.sig", $"b.sig",
        (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    sigs.as("a").join(sigs.as("b"), $"a.lang" < $"b.lang")
      .select($"a.lang".as("lang1"), $"b.lang".as("lang2"),
        round(matches.cast("double") / size($"a.sig"), 4)
          .as("est_jaccard"))
  }

  val queries: Seq[Q] = Seq(
    Q("q_sketch_union", langSimilarity, None))
}
