package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query set on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line the driver collects as BENCH_r{N}.json.
  *
  * Each query runs once untimed (JVM/codegen/broadcast warm-up — we
  * measure the engine, not JIT compilation) and then timed. AQE stays
  * on, shuffle partitions match local core count.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.headline
    qs.foreach { q => // warm-up: plan + run once, discard timing
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = qs.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qJson = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
