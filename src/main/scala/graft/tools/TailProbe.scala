package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the r16 verify-times superlinear tail
  * (VERDICT r17 item 1): prints, at one SF, the row volumes that
  * decide whether a pairwise-text query's growth is candidate-volume
  * (fixable) or verified-output (legitimate):
  *
  *  - shingle postings (pre/post df-cap), candidate pairs, verified
  *    pairs for the ngram-jaccard/containment/cosine family;
  *  - distinct (lang, shingle) rows and the cross-lang join fan for
  *    q_sketch_union;
  *  - co-occurrence edges and broadcast-adjacency wedge volume for
  *    q_triangle_count.
  *
  *   sbt "runMain graft.tools.TailProbe /root/testdata/sf0.1"
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tailprobe")
      .config("spark.sql.shuffle.partitions",
        graft.GraftSession.shufflePartitions(d, cpus.toInt))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def p(tag: String, n: Long): Unit = println(f"[tail] $tag%-34s $n%12d")

    val sh = graft.Tables.documents(spark, d)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select($"doc_id", graft.scale.Dedup.shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0)
      .persist()
    val posting = sh.select($"doc_id", explode($"sh").as("shingle")).persist()
    p("docs", sh.count())
    p("postings", posting.count())
    val dfreq = posting.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .persist()
    p("distinct_shingles", dfreq.count())
    p("hot_shingles(df>cap)",
      dfreq.filter($"df" > graft.scale.Dedup.MaxShingleDf).count())
    // candidate fan = sum over sub-cap shingles of C(df,2)
    val fan = dfreq.filter($"df" <= graft.scale.Dedup.MaxShingleDf)
      .agg(sum(expr("df * (df - 1) div 2"))).head().getLong(0)
    p("capped_join_rows(sum C(df,2))", fan)
    val cand = graft.scale.Dedup.ngramCandidates(sh).persist()
    p("candidate_pairs(distinct)", cand.count())
    p("verified_pairs(j>=0.8)",
      graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, d).count())
    cand.unpersist()

    // q_sketch_union exact-side volumes
    val ls = graft.Tables.documents(spark, d)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select($"lang", split(lower(trim($"text")), "\\s+").as("t"))
      .select($"lang", when(size($"t") >= 3,
        expr("transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"))
        .otherwise(array().cast("array<string>")).as("shingles"))
      .select($"lang", explode($"shingles").as("s"))
      .distinct().persist()
    p("sketch_union ls rows", ls.count())
    p("sketch_union inter join rows",
      ls.as("x").join(ls.as("y"),
        $"x.s" === $"y.s" && $"x.lang" < $"y.lang").count())
    ls.unpersist()

    // q_triangle_count volumes
    val so = graft.Tables.lineitem(spark, d)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
      .persist()
    p("order-supplier rows", so.count())
    val e = so.as("x").join(so.as("y"), Seq("ok"))
      .filter($"x.sk" < $"y.sk")
      .select($"x.sk".as("a"), $"y.sk".as("b"))
    p("cooc pairs (pre-distinct)", e.count())
    p("cooc edges (distinct)", e.distinct().count())
    so.unpersist()
    posting.unpersist(); dfreq.unpersist(); sh.unpersist()
    spark.stop()
  }
}
