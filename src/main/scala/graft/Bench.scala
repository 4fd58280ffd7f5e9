package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times the headline query set on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line the driver collects as BENCH_r{N}.json.
  * The same line is also written to target/bench.json so the metric
  * survives even if stdout gets wrapped by a build-tool logger (round 1
  * lost the parse to sbt's "[info] " prefix).
  *
  * Each query runs once untimed (JVM/codegen/broadcast warm-up — we
  * measure the engine, not JIT compilation) and then timed TWICE,
  * reporting the per-query MIN — the standard de-noise against
  * shared-machine load spikes (round 1's driver run was ~6× BENCHNOTES
  * on every query and inverted one comparison). AQE stays on, shuffle
  * partitions match local core count.
  *
  * Failures are NOT swallowed: a query that errors is timed to its
  * failure point, reported in an "errors" map, and forces a non-zero
  * exit — a silently-zero bench entry must never read as a pass.
  */
object Bench {
  /** 1-minute system load average, so each BENCH artifact is
    * self-adjudicating against box-load noise (round 12's official
    * total was +14 % purely from a loaded machine and the artifact
    * carried no evidence either way — VERDICT r12 #4).
    */
  private def loadAvg(): Double = {
    val v = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    if (v.isNaN) -1.0 else v
  }

  /** Self-adjudication upgrade (VERDICT r13 #6): recording loadavg
    * made a loaded box visible after the fact; gating on it removes
    * the recurring outlier-adjudication work. One retry only — a box
    * that stays loaded is reported as-is, flagged by idle_gated plus
    * the recorded loadavg. */
  private val IdleLoadGate = 2.0
  private val IdleRetryMs = 90000L

  def main(args: Array[String]): Unit = {
    val loadStart0 = loadAvg()
    val idleGated = loadStart0 > IdleLoadGate
    if (idleGated) {
      System.err.println(
        f"[bench] loadavg $loadStart0%.2f > $IdleLoadGate%.1f — " +
          s"sleeping ${IdleRetryMs / 1000} s for an idle box")
      Thread.sleep(IdleRetryMs)
    }
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // volume-derived (== cpus at sf0.1; grows with the input so a
    // bigger SF never hash-aggregates through under-sized shuffles)
    val parts = GraftSession.shufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.headline
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    qs.foreach { q => // warm-up: plan + run once, discard timing
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errors.getOrElseUpdate(q.name, s"warmup: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // NOTE (round 8): a System.gc() before each query's clock was
    // tried here to reclaim prior queries' broadcast/shuffle state —
    // it trimmed the heavy tail (~0.2 s on q_yelp_master_volume) but
    // cost every mid query ~0.3 s (full GC evicts soft-referenced
    // broadcast/codegen state the back-to-back passes otherwise
    // reuse): idle-box totals 26.1 s with GC vs 23.5 s without.
    // Reverted; see BENCHNOTES Round 8.
    def timedPass(): Seq[(String, Double)] = qs.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errors.put(q.name, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val pass1 = timedPass().toMap
    val results = timedPass().map { case (n, t2) =>
      n -> math.min(pass1(n), t2)
    }
    val qJson = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errJson = errors
      .map { case (k, v) => jstr(k) + ":" + jstr(v.take(300)) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadEnd = loadAvg()
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"errors":$errJson,"runs":2,"agg":"min","idle_gated":$idleGated,"loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"sf":"$sfDir"}"""
    println(line)
    try {
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/bench.json"), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    GraftCaches.release(spark)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
