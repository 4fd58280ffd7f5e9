package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the "would this survive 100×
  * scale-up" checks (SURVEY.md §4.4): filters reach the scan, small
  * dims broadcast instead of shuffling, aggregates combine map-side,
  * and shuffle counts stay at the expected minimum.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def initial(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def shuffles(df: DataFrame): Int =
    initial(df).collect { case e: ShuffleExchangeLike => e }.size

  private def broadcasts(df: DataFrame): Int =
    initial(df).collect { case e: BroadcastExchangeLike => e }.size

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q_agg_pricing: single shuffle, partial aggregation present") {
    val df = q("q_agg_pricing")
    assert(shuffles(df) === 1)
    val plan = initial(df).toString
    assert(plan.contains("partial_"), "no map-side combine")
  }

  test("q_filter_revenue: no shuffle at all (scan → partial → final)") {
    // scalar agg: partial aggregate per partition, single-partition final
    assert(shuffles(q("q_filter_revenue")) <= 1)
    val plan = q("q_filter_revenue").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate range not pushed to parquet")
  }

  test("q_winnow_fingerprints: fingerprint selection is scan-local " +
      "(only the output sort exchanges)") {
    // the fused WinnowStatsExpr kernel keeps gram hashing + window
    // minima inside the scan; the single range exchange is the
    // deterministic ORDER BY of the one-row-per-doc RESULT, never the
    // corpus-cardinality gram stream
    assert(shuffles(q("q_winnow_fingerprints")) <= 1)
    val plan = initial(q("q_winnow_fingerprints")).toString
    assert(plan.contains("winnow_stats"), "kernel not in the plan")
  }

  test("q_clustering_coeff: adjacency joins broadcast under the edge " +
      "cap (edges never re-shuffle for the intersection)") {
    assert(broadcasts(q("q_clustering_coeff")) >= 2,
      "higher-neighbor adjacency not broadcast onto the edge list")
  }

  test("q_join_mktsegment: customer dim broadcast, facts shuffle once each") {
    val df = q("q_join_mktsegment")
    assert(broadcasts(df) >= 1, "customer should broadcast")
    // lineitem⋈orders shuffle (2) + final agg exchange (1)
    assert(shuffles(df) <= 3)
  }

  test("q_star_join: date filter pushed, dims broadcast at this SF, " +
      "facts shuffle once each, no cartesian") {
    val df = q("q_star_join")
    val plan = initial(df).toString
    assert(plan.contains("PushedFilters: ["), "no pushdown at any scan")
    assert(plan.contains("o_orderdate"), "date filter missing from scan")
    // customer/supplier/nation⋈region all fit the threshold here; the
    // only shuffles are lineitem⋈orders (2) + final agg (1)
    assert(broadcasts(df) >= 3, "dimension chain should broadcast")
    assert(shuffles(df) <= 3, s"too many shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_exists_waiting: correlated EXISTS/NOT EXISTS decorrelate to " +
      "semi/anti joins, no per-row subquery") {
    val df = q("q_exists_waiting")
    val plan = initial(df).toString
    assert(plan.contains("LeftSemi"), s"EXISTS not decorrelated:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not decorrelated:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_join_broadcast_dims: zero shuffles before final aggregation") {
    val df = q("q_join_broadcast_dims")
    assert(broadcasts(df) === 2, "both dims must broadcast")
    assert(shuffles(df) === 1, "only the groupBy may shuffle")
  }

  test("q_topk plans as TakeOrderedAndProject (no global sort)") {
    val plan = initial(q("q_topk")).toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortExec"), "top-k must not global-sort")
  }

  test("q_master_pipeline: dimension broadcast survives the full chain") {
    assert(broadcasts(q("q_master_pipeline")) >= 1)
  }

  test("merge hint forces sort-merge join (large-large strategy)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).hint("merge")
    val plan = initial(li.join(o, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_totalprice")).toString
    assert(plan.contains("SortMergeJoin"))
  }

  test("shuffle hash hint forces shuffled hash join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).hint("shuffle_hash")
    val plan = initial(li.join(o, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_totalprice")).toString
    assert(plan.contains("ShuffledHashJoin"))
  }

  test("scans prune columns: projection-only query reads 2 columns") {
    val df = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
      s"column pruning failed:\n$plan")
  }

  test("documents text ops stay shuffle-free (scan-local)") {
    assert(shuffles(q("q_text_token_count")) === 0)
    assert(shuffles(q("q_text_fingerprint")) === 0)
    assert(shuffles(q("q_text_langid")) === 0)
  }

  test("q_yelp_master_volume: both dims broadcast; dedup shuffle carries only pruned columns") {
    val df = q("q_yelp_master_volume")
    assert(broadcasts(df) === 2, "user and business dims must broadcast")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the rollup needs 4 columns; Catalyst must prune the rest through
    // the dropDuplicates aggregate — name/city/categories etc. in the
    // dedup's first() set would mean the 12M-row exchange carries the
    // whole master row
    assert(!plan.contains("first(categories"),
      "unpruned dedup: categories crossed the shuffle")
    assert(!plan.contains("first(city"),
      "unpruned dedup: city crossed the shuffle")
  }

  test("q_yelp dashboard rollups reuse one cached master build") {
    q("q_yelp_kpi").collect()
    val plan2 = initial(q("q_yelp_engagement")).toString
    assert(plan2.contains("InMemoryTableScan") ||
      plan2.contains("TableCacheQueryStage"),
      s"second dashboard query should read the cached master:\n${plan2.take(2000)}")
  }

  test("q_peak_hours: one agg shuffle + one window shuffle, nothing more") {
    assert(shuffles(q("q_peak_hours")) <= 2)
  }

  test("q_curation_pipeline: per-doc scoring is scan-local (shuffles only for dedup+rollup)") {
    assert(shuffles(q("q_curation_pipeline")) === 2)
  }

  test("runtime bloom-filter pruning injects on a selective shuffle join") {
    // the 100 TB lever when a join's build side is selective but too
    // big to broadcast: Catalyst plants a bloom_filter_agg on the
    // build side and a might_contain probe in front of the fact scan
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{count, lit}
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter($"o_totalprice" > 400000)
      val j = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("cnt"))
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom filter injected:\n${plan.take(1500)}")
      assert(plan.toLowerCase.contains("might_contain"),
        "no application-side bloom probe")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("whole-stage codegen spans cover the hot aggregation path") {
    val df = q("q_agg_pricing")
    df.collect() // finalize the adaptive plan
    // '*(n)' prefixes mark WholeStageCodegen spans in the final plan
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "no codegen span in final adaptive plan")
  }

  test("q_chi_square: all three marginals broadcast, one cell shuffle") {
    val df = q("q_chi_square")
    // rows / cols / total each rejoin the cell table as broadcasts;
    // the only exchanges are the four tiny aggregates' own shuffles
    assert(broadcasts(df) === 3, "marginal joins must not shuffle cells")
    assert(initial(df).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isEmpty, "no sort-merge join on group-cardinality marginals")
  }

  test("q_target_encode: category stats broadcast; facts never shuffle " +
    "for the join") {
    val df = q("q_target_encode")
    assert(broadcasts(df) === 1)
    // the only shuffle is the per-category aggregate's own exchange —
    // the labeled fact scan flows join-ward shuffle-free
    assert(shuffles(df) === 1)
  }

  test("q_gini_split: threshold fan-out map-side combines to one shuffle") {
    assert(shuffles(q("q_gini_split")) === 1)
    assert(initial(q("q_gini_split")).toString.contains("partial_"),
      "explode fan-out must combine before the exchange")
  }

  test("q_ab_test and q_eval_calibration: single-shuffle aggregates") {
    assert(shuffles(q("q_ab_test")) === 1)
    assert(shuffles(q("q_eval_calibration")) === 1)
  }

  test("q_eval_auc: window walks distinct scores, not rows (pre-agg " +
    "below the window)") {
    val df = q("q_eval_auc")
    val plan = initial(df).toString
    // the (lang, score) collapse must sit under the running-sum window:
    // partial aggregate present, and ≤3 shuffles (agg, window, final)
    assert(plan.contains("partial_"))
    assert(shuffles(df) <= 3)
  }

  test("round-8 additions keep their scale shapes") {
    // span corruption is scan-local: lambda expressions only, NO shuffle
    assert(shuffles(q("q_span_corrupt")) === 0)
    // fertility is one combinable aggregate over the scan
    assert(shuffles(q("q_tokenizer_fertility")) === 1)
    // epoch expansion: explode feeds one aggregate exchange
    assert(shuffles(q("q_epoch_expand")) === 1)
    // CDC merge: window on the merge key + final shard rollup
    assert(shuffles(q("q_cdc_merge")) === 2)
    // forward as-of: purchase pre-dedup agg + the union/window
    // exchange — no join node (the bare helper is pinned to exactly
    // one shuffle in TemporalJoinsSpec)
    assert(shuffles(q("q_asof_forward")) === 2)
    // novelty: shingle-df agg, df join, per-doc rollup — and the join
    // must reuse the df aggregation's hash partitioning on the shingle
    // key rather than add a fourth exchange
    assert(shuffles(q("q_ngram_novelty")) <= 3)
  }

  test("round-9 additions keep their scale shapes") {
    // FIM is pure scan-local slicing: NO shuffle
    assert(shuffles(q("q_fim_transform")) === 0)
    // pad waste: literal 4-way explode feeds one combinable aggregate
    assert(shuffles(q("q_pad_waste")) === 1)
    // precision@k: one rank-window exchange on (type, day) that the
    // per-day aggregate reuses, then the per-type rollup
    assert(shuffles(q("q_eval_pr_at_k")) === 2)
    // lateness: one (type, user) window exchange + the bucket rollup
    assert(shuffles(q("q_lateness_profile")) === 2)
    // bootstrap: replicate aggregate on (type, b), whose type-prefix
    // partitioning the two rank windows and final rollup must reuse
    assert(shuffles(q("q_bootstrap_ci")) <= 3)
    // rolling corr: day-totals agg, the pair self-join, one
    // pair-partitioned window — never a per-event shuffle
    assert(shuffles(q("q_rolling_corr")) <= 5)
  }

  test("Q5/Q8 join trees: the fact shuffles once, every dim broadcasts") {
    // regional volume: exchanges only for lineitem+orders (orderkey)
    // and the final nation rollup; customer/supplier/nation/region
    // must ALL ride broadcast builds
    val q5 = q("q_regional_volume")
    assert(shuffles(q5) <= 3, "fact-side exchanges only")
    assert(broadcasts(q5) >= 3, "dims must broadcast")
    // market share: part pre-filter keeps the promo build broadcast
    val q8 = q("q_market_share")
    assert(shuffles(q8) <= 3, "fact-side exchanges only")
    assert(broadcasts(q8) >= 3, "dims must broadcast")
  }

  test("round-9 second batch keeps its scale shapes") {
    // repetition profile is ONE scan-stage kernel call: NO shuffle
    assert(shuffles(q("q_repetition_stats")) === 0)
    // preference pairs: one map-side-combinable ordered-struct agg —
    // the shuffle carries |source×lang| rows; NO window sort anywhere
    val pp = q("q_preference_pairs")
    assert(shuffles(pp) === 1)
    assert(initial(pp).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "preference pairs must not plan a per-group window sort")
    // vocab coverage: vocab rollup + TakeOrdered path + the ≤K-row
    // cumsum; the corpus itself shuffles once (to distinct tokens)
    assert(shuffles(q("q_vocab_coverage")) <= 3)
    // FDR: one segment rollup + O(m)-row windows
    assert(shuffles(q("q_fdr_bh")) <= 3)
    // change-point: day rollup + per-type day windows
    assert(shuffles(q("q_changepoint")) <= 3)
  }

  test("AQE splits a skewed sort-merge-join partition " +
      "(OptimizeSkewedJoin) — the runtime complement to q_join_salted") {
    // Manual salting (q_join_salted) is the PLANNED answer to skew;
    // AQE's OptimizeSkewedJoin is the RUNTIME one: after the map
    // stage, a shuffle partition that dwarfs the advisory size is
    // split into sub-reads joined against a replicated build side.
    // Pin that the mechanism actually engages on a constructed hot
    // key, so a 100 TB deployment can rely on it where salting
    // wasn't applied.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~100k rows on ONE hot key vs a uniform remainder
      val fact = spark.range(0, 110000L)
        .select(org.apache.spark.sql.functions.when($"id" < 100000L, 0L)
          .otherwise($"id" % 64).as("k"), $"id".as("payload"))
      val dim = spark.range(0, 64L)
        .select($"id".as("k"), ($"id" * 7).as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe's own QueryExecution: collect() runs
      // it directly, whereas count()/write() wrap the plan in a NEW
      // QueryExecution and leave this one's adaptive loop un-run
      assert(joined.collect().length === 110000)
      val adaptive = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // collect() can't see inside Spark 4's query-stage wrappers
      // (their plan is a member, not a child), so assert on the
      // rendered final plan: the skew flag prints as "(skew=true)"
      assert(adaptive.toString.contains("skew=true"),
        s"expected a skew=true join in the adaptive plan:\n$adaptive")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
