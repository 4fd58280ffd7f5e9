package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for decomposing a headline query's cost. Not part
  * of the driver contract; run ad hoc via
  * `sbt "runMain graft.tools.BenchProbe <sfDir>"`. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.min}%.3f s")
    }

    println(s"[probe] orders input partitions: " +
      s"${Tables.orders(spark, sfDir).rdd.getNumPartitions}")
    val amp = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("review_id"),
        col("o_custkey").as("user_id"),
        col("o_orderdate").as("r_date"))
      .repartition(32)
      .withColumn("i", explode(sequence(lit(0), lit(79))))
      .withColumn("review_id", col("review_id") * 80 + col("i"))
      .withColumn("business_id", col("review_id") % 200)
      .withColumn("stars", lit(1.0) + (col("review_id") % 5).cast("double"))
      .drop("i")

    time("explode+count") {
      amp.selectExpr("count(*)").write.format("noop").mode("overwrite").save()
    }
    time("explode+agg (no dedup)") {
      amp.groupBy(year(col("r_date")).as("year"), col("business_id"))
        .agg(count(lit(1)).as("n"), sum(col("stars")).as("s"))
        .groupBy(col("year"))
        .agg(sum(col("n")), count(lit(1)), sum(col("s")))
        .write.format("noop").mode("overwrite").save()
    }
    time("explode+dedup+agg") {
      amp.dropDuplicates("review_id")
        .groupBy(year(col("r_date")).as("year"), col("business_id"))
        .agg(count(lit(1)).as("n"), sum(col("stars")).as("s"))
        .groupBy(col("year"))
        .agg(sum(col("n")), count(lit(1)), sum(col("s")))
        .write.format("noop").mode("overwrite").save()
    }
    time("full q_yelp_master_volume") {
      graft.SparkEntry.queries("q_yelp_master_volume")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val df = graft.SparkEntry.queries("q_yelp_master_volume")(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Sort") || l.contains("Aggregate") || l.contains("Expand"))
      .foreach(l => println("[plan] " + l.trim.take(200)))
    spark.stop()
  }
}
