package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe for the connected-components round cost: times the
  * current formulation against partition-count variants to separate
  * data cost from per-round task-scheduling overhead on the tiny
  * pair graph. Usage:
  *   sbt "runMain graft.tools.CcProbe /root/testdata/sf0.1"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ccprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = graft.SparkEntry.queries("q_dedup_minhash_lsh")(
      spark, sfDir).select(col("d1"), col("d2"))
    pairs.cache(); println(s"[ccprobe] pairs=${pairs.count()}")

    def time(tag: String)(mk: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[ccprobe] $tag run$i: $dt%.3f s ($n rows)")
      }
    }

    // (a) current shape, as shipped (fresh cache key per variant)
    time("current")(graft.scale.Dedup.connectedComponents(
      pairs, cacheKey = Some("ccprobe.a")))

    // (b) tiny fixed partition count through the loop
    def variantN(n: Int, key: String): DataFrame = {
      val sym = pairs.select(col("d1").as("node"), col("d2").as("nbr"))
        .union(pairs.select(col("d2").as("node"), col("d1").as("nbr")))
      val adjRaw = sym.union(sym.select(col("node")).distinct()
        .select(col("node"), col("node").as("nbr")))
      val adj = graft.GraftCaches.getOrPersist(spark, key)(
        adjRaw.repartition(n, col("nbr")))
      var labels = adj.select(col("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 1 to 8) {
        labels = adj.alias("g")
          .join(labels.alias("l"), col("g.nbr") === col("l.node"))
          .repartition(n, col("g.node"))
          .groupBy(col("g.node"))
          .agg(min(col("l.label")).as("label"))
      }
      labels
    }
    time("npart=2")(variantN(2, "ccprobe.b2"))
    time("npart=8")(variantN(8, "ccprobe.b8"))

    // (c) lineage truncation via eager localCheckpoint every 4 rounds
    def variantCkpt(every: Int, key: String): DataFrame = {
      val sym = pairs.select(col("d1").as("node"), col("d2").as("nbr"))
        .union(pairs.select(col("d2").as("node"), col("d1").as("nbr")))
      val adjRaw = sym.union(sym.select(col("node")).distinct()
        .select(col("node"), col("node").as("nbr")))
      val adj = graft.GraftCaches.getOrPersist(spark, key)(
        adjRaw.repartition(col("nbr")))
      var labels = adj.select(col("node")).distinct()
        .withColumn("label", col("node"))
      for (r <- 1 to 8) {
        labels = adj.alias("g")
          .join(labels.alias("l"), col("g.nbr") === col("l.node"))
          .groupBy(col("g.node"))
          .agg(min(col("l.label")).as("label"))
        if (r % every == 0 && r < 8) labels = labels.localCheckpoint()
      }
      labels
    }
    time("ckpt4")(variantCkpt(4, "ccprobe.c4"))
    time("ckpt2")(variantCkpt(2, "ccprobe.c2"))

    // (e) adjacency lineage truncated too (localCheckpoint once),
    // then checkpointed labels every `every` rounds
    def variantFull(every: Int): DataFrame = {
      val sym = pairs.select(col("d1").as("node"), col("d2").as("nbr"))
        .union(pairs.select(col("d2").as("node"), col("d1").as("nbr")))
      val adjRaw = sym.union(sym.select(col("node")).distinct()
        .select(col("node"), col("node").as("nbr")))
      val adj = adjRaw.repartition(col("nbr")).localCheckpoint()
      var labels = adj.select(col("node")).distinct()
        .withColumn("label", col("node"))
      for (r <- 1 to 8) {
        labels = adj.alias("g")
          .join(labels.alias("l"), col("g.nbr") === col("l.node"))
          .groupBy(col("g.node"))
          .agg(min(col("l.label")).as("label"))
        if (r % every == 0 && r < 8) labels = labels.localCheckpoint()
      }
      labels
    }
    time("fullck4")(variantFull(4))
    time("fullck8")(variantFull(8))

    // (d) planning-only cost of the shipped shape
    val t0 = System.nanoTime()
    val df = graft.scale.Dedup.connectedComponents(
      pairs, cacheKey = Some("ccprobe.a"))
    val plan = df.queryExecution.executedPlan
    println(f"[ccprobe] plan-only: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
      s"(nodes=${plan.toString.linesIterator.size})")
    spark.stop()
  }
}
