package graft.scale

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: how a 100 TB table is ORGANIZED on disk is
  * as load-bearing as any query plan — file-level min/max pruning is
  * the only thing that turns a selective predicate into a selective
  * SCAN.
  */
object Layout {

  /** Dimension bucket width for the z-order key (10 bits each). */
  val ZBuckets = 1024

  /** Z-order clustering audit: bucket orders on (customer, order-day),
    * compute the Morton key ([[graft.ext.ZOrderExpr]]), and report
    * each of the 64 top-level z-ranges with its row count and its
    * span on BOTH dimensions. Because a z-range prefix fixes the top
    * bits of both keys, every bucket's span is ≤ 128 on each dim —
    * the property that makes writing the table sorted by `zkey`
    * prunable on either predicate (a lexicographic sort caps only
    * its leading column; LayoutSpec measures the difference on real
    * file slices). */
  private def zorderLayout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ka = pmod($"o_custkey", lit(ZBuckets)).cast("long")
    val kb = pmod(datediff($"o_orderdate", to_date(lit("1992-01-01"))),
      lit(ZBuckets)).cast("long")
    Tables.orders(s, d)
      .select($"o_orderkey", ka.as("ka"), kb.as("kb"))
      .withColumn("zkey", graft.ext.ZOrderExpr.zorder($"ka", $"kb"))
      .withColumn("zrange", shiftright($"zkey", 14).cast("long"))
      .groupBy($"zrange")
      .agg(count(lit(1)).as("n"),
        min($"ka").as("ka_min"), max($"ka").as("ka_max"),
        min($"kb").as("kb_min"), max($"kb").as("kb_max"))
  }

  private val zorderOracle = s"""
      WITH k AS (SELECT o_orderkey,
                        o_custkey % $ZBuckets AS ka,
                        date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) % $ZBuckets AS kb
                 FROM orders),
      z AS (SELECT o_orderkey, ka, kb,
                   CAST(list_sum(list_transform(range(10),
                     i -> (((ka >> i) & 1) << (2 * i))
                        + (((kb >> i) & 1) << (2 * i + 1)))) AS BIGINT)
                     AS zkey
            FROM k)
      SELECT zkey >> 14 AS zrange,
             CAST(count(*) AS BIGINT) AS n,
             min(ka) AS ka_min, max(ka) AS ka_max,
             min(kb) AS kb_min, max(kb) AS kb_max
      FROM z GROUP BY 1"""

  val queries: Seq[Q] = Seq(
    Q("q_zorder_layout", zorderLayout, Some(zorderOracle)))
}
