package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Single-query slice of graft.Verify for fast iteration: dumps only
  * the NAMED catalog queries (plus their oracle SQL) in the same
  * layout check_oracle.py expects.
  *
  *   sbt "runMain graft.tools.QSmoke /root/testdata/sf0.01 target/smoke_out q_a q_b"
  *   python3 tools/check_oracle.py /root/testdata/sf0.01 target/smoke_out
  */
object QSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val picked = graft.SparkEntry.catalog.filter(q => names(q.name))
    require(picked.size == names.size,
      s"unknown names: ${names -- picked.map(_.name).toSet}")
    picked.foreach { q =>
      val df = q.run(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/${q.name}")
      println(s"[smoke] ${q.name}: ${spark.read.parquet(s"$outDir/${q.name}").count()} rows")
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = picked.flatMap(q => q.oracle.map(o => s"${esc(q.name)}: ${esc(o.trim)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.GraftCaches.release(spark)
    spark.stop()
  }
}
