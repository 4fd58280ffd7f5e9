package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the rewritten q_sketch_union (r17):
  * times each sub-frame with a count/noop so the 19-s residual can be
  * attributed (scan and UDAF already measured cheap by SketchProbe2).
  *   sbt "runMain graft.tools.SketchProbe3 /root/testdata/sf0.1"
  */
object SketchProbe3 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sketchprobe3")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(act: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = act
        println(f"[sk3] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }

    val docs = graft.Tables.documents(spark, d)
    val ls = docs
      .select($"lang", split(lower(trim($"text")), "\\s+").as("t"))
      .select($"lang", when(size($"t") >= 3,
        expr("transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"))
        .otherwise(array().cast("array<string>")).as("shingles"))
      .select($"lang", explode($"shingles").as("sh"))
      .distinct()
    time("ls.distinct")(ls.count())
    // let-bound variant: the token array is materialized ONCE per row
    // as a lambda-bound value (transform(array(split(..)), t -> ..)),
    // so t-references inside the trigram lambda are O(1) lookups
    // instead of re-running the regex split per element per reference.
    val lsLet = docs
      .select($"lang", explode(element_at(
        transform(array(split(lower(trim($"text")), "\\s+")), t =>
          when(size(t) >= 3,
            transform(sequence(lit(1), size(t) - lit(2)),
              i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
                element_at(t, i + 2))))
            .otherwise(array().cast("array<string>"))), 1)).as("sh"))
      .distinct()
    time("ls.letbound")(lsLet.count())
    time("ls.letbound==ls")(lsLet.unionAll(ls).except(lsLet.intersect(ls)).count())
    val byShingle = ls.groupBy($"sh")
      .agg(sort_array(collect_set($"lang")).as("langs"))
    time("byShingle(no ckpt)")(byShingle.count())
    val bs = byShingle.localCheckpoint()
    time("sizes")(bs.select(explode($"langs").as("lang"))
      .groupBy($"lang").agg(count(lit(1)).as("n")).count())
    time("inter")(bs.filter(size($"langs") >= 2)
      .select(explode(expr(
        "flatten(transform(langs, (x, i) -> " +
          "transform(slice(langs, i + 2, size(langs)), " +
          "y -> named_struct('lang1', x, 'lang2', y))))")).as("p"))
      .groupBy($"p.lang1".as("lang1"), $"p.lang2".as("lang2"))
      .agg(count(lit(1)).as("ni")).count())
    val sketch = udaf(graft.scale.MinHashSigAgg)
    val sigs = docs
      .select($"lang", graft.scale.Dedup.shingleHashes($"text").as("sh"))
      .groupBy($"lang").agg(sketch($"sh").as("sig")).localCheckpoint()
    val matches = aggregate(
      zip_with($"a.sig", $"b.sig",
        (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    time("est")(sigs.as("a").join(sigs.as("b"), $"a.lang" < $"b.lang")
      .select($"a.lang".as("lang1"), $"b.lang".as("lang2"),
        (matches.cast("double") / size($"a.sig")).as("est")).count())
    time("full")(graft.SparkEntry.queries("q_sketch_union")(spark, d).count())
    spark.stop()
  }
}
