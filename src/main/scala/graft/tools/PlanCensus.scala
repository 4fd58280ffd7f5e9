package graft.tools

import graft.SparkEntry
import graft.ext.PlanStats
import org.apache.spark.sql.SparkSession

/** Prints the per-headliner PlanStats counts in paste-able Scala map
  * syntax, under the EXACT test-session config (local[4], 4 shuffle
  * partitions, AQE on, sf0.001) so the output IS the pin table for
  * HeadlinePlanPinSpec. Run after any deliberate plan change:
  *   sbt "runMain graft.tools.PlanCensus"
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-plancensus")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.headline.foreach { q =>
      val c = PlanStats.of(q.run(spark, d))
      println(s"""    "${q.name}" -> $c,""")
    }
    spark.stop()
  }
}
