package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's full query catalog is assembled from per-category
  * modules (graft.ops.*, graft.scale.*); every SQL-expressible query
  * carries an equivalent DuckDB oracle, the rest get rows-only checks.
  */
object SparkEntry {

  /** All catalog entries, in registration order. */
  def catalog: Seq[Q] =
    ops.RelationalQueries.queries ++
      ops.ScalarQueries.queries ++
      ops.PipelineQueries.queries ++
      ops.AdvancedQueries.queries ++
      ops.TemporalJoins.queries ++
      ops.StatsQueries.queries ++
      ops.InferenceQueries.queries ++
      ops.AgreementQueries.queries ++
      ops.EvalQueries.queries ++
      ops.FeatureQueries.queries ++
      ops.TypedAndSources.queries ++
      ops.SpatialQueries.queries ++
      yelp.YelpQueries.queries ++
      scale.TextOps.queries ++
      scale.Privacy.queries ++
      scale.Dedup.queries ++
      scale.EntityResolution.queries ++
      scale.GraphOps.queries ++
      scale.MinHashSigAgg.queries ++
      scale.Multimodal.queries ++
      scale.Similarity.queries ++
      scale.Sketches.queries ++
      scale.Layout.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 3-way join + aggregation — the reference's master-table shape
    * (SURVEY.md §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_mktsegment")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** The subset Bench times per-round (headline performance queries). */
  def headline: Seq[Q] = catalog.filter(_.headline)
}
