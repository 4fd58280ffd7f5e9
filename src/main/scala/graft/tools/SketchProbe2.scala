package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of q_sketch_union's cost: shingle scan vs
  * UDAF aggregate vs the pair join.
  *   sbt "runMain graft.tools.SketchProbe2 /root/testdata/sf0.1"
  */
object SketchProbe2 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sketchprobe2")
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
        println(f"[sk2] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }

    val sh = graft.Tables.documents(spark, d)
      .select($"lang", graft.scale.Dedup.shingleHashes($"text").as("sh"))
    time("scan-only")(sh.select(sum(size($"sh"))).head().getLong(0))
    val sketch = udaf(graft.scale.MinHashSigAgg)
    time("agg")(sh.groupBy($"lang").agg(sketch($"sh").as("sig")).count())
    time("full")(graft.SparkEntry.queries("q_sketch_union")(spark, d).count())
    spark.stop()
  }
}
