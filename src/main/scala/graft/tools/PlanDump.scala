package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for NAMED catalog queries to one file
  * each — the before/after plan evidence trail for optimization rounds
  * (plans/rN/<query>_{before,after}.txt).
  *
  * Unlike DumpPlans (which regenerates PLANS.md for every headliner at
  * the local[8] doc config), this runs at the OFFICIAL bench config
  * (local[$SPARK_GRAFT_CPUS], volume-derived shuffle partitions, AQE
  * on) so the dumped plan is the one the bench actually executes.
  *
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r17 _before q_triangle_count q_sketch_union"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2) // e.g. "_before" / "_after"
    val names = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions",
        graft.GraftSession.shufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        graft.GraftSession.aqeMinPartitionSize)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked = graft.SparkEntry.catalog.filter(q => names(q.name))
    require(picked.size == names.size,
      s"unknown names: ${names -- picked.map(_.name).toSet}")
    Files.createDirectories(Paths.get(outDir))
    picked.foreach { q =>
      val df = q.run(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val c = graft.ext.PlanStats.of(df)
      val header =
        s"# ${q.name} — explain(formatted) at $sfDir, " +
          s"local[$cpus], shuffle.partitions=" +
          s"${spark.sessionState.conf.numShufflePartitions}\n" +
          s"# PlanStats: shuffles=${c.shuffles} " +
          s"broadcasts=${c.broadcasts} scans=${c.scans}\n\n"
      Files.writeString(Paths.get(s"$outDir/${q.name}$suffix.txt"),
        header + plan)
      println(s"[plandump] wrote $outDir/${q.name}$suffix.txt")
    }
    graft.GraftCaches.release(spark)
    spark.stop()
  }
}
