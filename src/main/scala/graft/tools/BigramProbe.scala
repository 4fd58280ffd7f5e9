package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the bigram-LM family cost.
  *   sbt "runMain graft.tools.BigramProbe /root/testdata/sf0.1"
  */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bigramprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(act: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = act
        println(f"[bg] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }

    val t = graft.scale.TextOps.tokens($"text")
    val pairs = when(size(t) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"),
          element_at(t, i + 1).as("w2"))))
    val docs = graft.Tables.documents(spark, d)
    time("explode-pairs")(docs.select(explode(pairs).as("p")).count())
    time("pairs-agg")(docs.select(explode(pairs).as("p"))
      .select($"p.w1".as("w1"), $"p.w2".as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("cnt")).count())
    time("full-bigram-lm")(
      graft.SparkEntry.queries("q_bigram_lm")(spark, d).count())
    time("full-backoff")(
      graft.SparkEntry.queries("q_stupid_backoff")(spark, d).count())
    spark.stop()
  }
}
