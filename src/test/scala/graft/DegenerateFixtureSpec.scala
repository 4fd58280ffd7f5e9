package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-edge pins for the ordered-alternative tests (VERDICT
  * r16 #8): a SINGLE event type (k = 1) zeroes Page's variance
  * denominator and Jonckheere's variance term — exactly the edge
  * where engine semantics diverge (Spark integer `div` by zero is
  * NULL, DuckDB `//` raises), so both queries carry explicit guards.
  * This spec runs the REAL catalog queries against a one-type
  * events.parquet fixture and pins the guarded outputs; the DuckDB
  * side of the same fixture was verified to agree (q_page_trend →
  * z2_e6/flag NULL, q_jonckheere → z2_e6 0 / flag false) when the
  * guards landed.
  */
class DegenerateFixtureSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** 40 events, ONE type, spread over ~19 days on a 13-value cent
    * grid — enough rows that every non-degenerate intermediate (m,
    * l2, n, u2) is exercised while k stays 1. */
  private lazy val oneTypeDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "degen_k1")
    val rows = (0 until 40).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 40000000L),
        (i % 7).toLong, "view", i % 13 + 0.25, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir.toString
  }

  test("q_page_trend with k = 1: variance denominator is zero and the " +
      "guard pins z2_e6 and the trend flag to NULL (not a div-by-zero)") {
    val row = SparkEntry.queries("q_page_trend")(spark, oneTypeDir).head()
    // 19 distinct days, each a complete (single-cell) block of rank2 = 2
    assert(row.getAs[Long]("m") === 19L)
    assert(row.getAs[Long]("k") === 1L)
    assert(row.getAs[Long]("l2") === 38L)
    assert(row.isNullAt(row.fieldIndex("z2_e6")),
      "k=1 must yield NULL z2_e6, same as the DuckDB oracle")
    assert(row.isNullAt(row.fieldIndex("ordered_trend_5pct")))
  }

  test("q_jonckheere with k = 1: var term is exactly zero and the " +
      "guard pins z2_e6 to 0 with a false flag (no div-by-zero)") {
    val row = SparkEntry.queries("q_jonckheere")(spark, oneTypeDir).head()
    assert(row.getAs[Long]("k_groups") === 1L)
    assert(row.getAs[Long]("n") === 40L)
    assert(row.getAs[Long]("u2") === 0L)
    assert(row.getAs[Long]("e_u2") === 0L)
    assert(row.getAs[Long]("var_u72") === 0L)
    assert(row.getAs[Long]("z2_e6") === 0L)
    assert(row.getAs[Boolean]("ordered_shift_5pct") === false)
  }

  test("q_cliffs_delta with an empty reference arm: magnitude and " +
      "label are NULL, not a fall-through to 'large'") {
    // all event_ids odd -> the even-id reference arm is empty per type
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "degen_arm")
    (0 until 20).map { i =>
      (i.toLong * 2 + 1,
        new java.sql.Timestamp(1700000000000L + i * 40000000L),
        (i % 7).toLong, "view", i % 13 + 0.25, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val row = SparkEntry.queries("q_cliffs_delta")(spark, dir.toString).head()
    assert(row.getAs[Long]("n_ref") === 0L)
    assert(row.isNullAt(row.fieldIndex("delta_e6")))
    assert(row.isNullAt(row.fieldIndex("magnitude")))
  }
}
