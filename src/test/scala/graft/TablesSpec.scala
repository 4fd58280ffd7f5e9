package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Encoding-drift regression for `Tables.events`.
  *
  * The driver has regenerated `/root/testdata` mid-build before, flipping
  * `events.ts` between parquet TIMESTAMP(NANOS) (which Spark can only
  * surface as LongType under `nanosAsLong`) and plain timestamp[us]
  * (surfacing as TimestampNTZ when isAdjustedToUTC=false, or Timestamp
  * when written by Spark). One hard-coded assumption here once blacked
  * out 15 % of the catalog, so this spec fabricates every encoding the
  * loader claims to handle and pins identical results from each.
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // Three event rows at fixed epoch-micros instants.
  private val micros = Seq(1700000000000000L, 1700000001500000L, 1700000086400999L)

  private val fixtureDirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  /** Build a fixture dir containing events.parquet with the given ts column. */
  private def fixture(tag: String)(mk: String => Unit): String = {
    val base = Files.createTempDirectory(s"graft-events-$tag").toFile
    fixtureDirs += base
    mk(s"${base.getAbsolutePath}/events.parquet")
    base.getAbsolutePath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def load(dir: String): (DataType, Seq[Long]) = {
    val df = Tables.events(spark, dir)
    val dt = df.schema("ts").dataType
    val vals = df.select(unix_micros($"ts".cast(TimestampType)))
      .as[Long].collect().toSeq.sorted
    (dt, vals)
  }

  test("events loader handles nanos-as-long, micros-NTZ, and Spark-written timestamp identically") {
    // (a) nanos path: ts surfaces as LongType (what TIMESTAMP(NANOS)
    // becomes under spark.sql.legacy.parquet.nanosAsLong=true).
    val nanosDir = fixture("nanos") { p =>
      micros.map(_ * 1000L).toDF("ts")
        .withColumn("event_id", monotonically_increasing_id())
        .write.mode("overwrite").parquet(p)
    }
    // (b) micros-NTZ path: what pyarrow writes (isAdjustedToUTC=false).
    val ntzDir = fixture("ntz") { p =>
      micros.toDF("us")
        .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
        .withColumn("event_id", monotonically_increasing_id())
        .write.mode("overwrite").parquet(p)
    }
    // (c) Spark-native TimestampType (isAdjustedToUTC=true) passthrough.
    val tzDir = fixture("tz") { p =>
      micros.toDF("us")
        .select(timestamp_micros($"us").as("ts"))
        .withColumn("event_id", monotonically_increasing_id())
        .write.mode("overwrite").parquet(p)
    }

    try {
      val (dtA, a) = load(nanosDir)
      val (dtB, b) = load(ntzDir)
      val (dtC, c) = load(tzDir)
      // Every encoding must normalize to TimestampType — downstream
      // catalog queries and streaming watermarks were verified against it.
      assert(dtA === TimestampType, "nanos-as-long branch")
      assert(dtB === TimestampType, "micros-NTZ branch")
      assert(dtC === TimestampType, "timestamp passthrough branch")
      assert(a === micros.sorted)
      assert(b === micros.sorted)
      assert(c === micros.sorted)
    } finally {
      fixtureDirs.foreach(deleteRecursively)
      fixtureDirs.clear()
    }
  }

  test("events loader reads the real testdata without error and yields TimestampType") {
    val df = Tables.events(spark, SparkTestSession.sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(5).count() === 5)
  }
}
