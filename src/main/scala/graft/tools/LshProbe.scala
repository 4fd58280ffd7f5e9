package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main for the near-dup pipeline (not part of the
  * driver contract). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
    // session warm-up: similar expression shapes, no cache overlap
    time("session warmup")(docs.select(xxhash64($"text")).count())
    time("tokens only") {
      docs.select(explode(split(lower($"text"), "\\s+"))).count()
    }
    time("shingle hashes no-cache") {
      docs.select($"doc_id",
          graft.scale.Dedup.shingleHashes($"text").as("sh"))
        .select(sum(size($"sh"))).count()
    }
    time("shingle again") {
      docs.select($"doc_id",
          graft.scale.Dedup.shingleHashes($"text").as("sh"))
        .select(sum(size($"sh"))).count()
    }
    spark.stop()
  }
}
