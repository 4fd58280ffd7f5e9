package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's flagship smoke: bare session, entry(), count. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
