package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every key in [[queries]]
  * that is SQL-expressible has a DuckDB oracle in [[oracleSql]] with
  * byte-identical column names and deterministic row order.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracle),
      (operators.AdvancedSql.queries, operators.AdvancedSql.oracle),
      (operators.Analytics.queries, operators.Analytics.oracle),
      (operators.Stats.queries, operators.Stats.oracle),
      (operators.Dedup.queries, operators.Dedup.oracle),
      (operators.Graph.queries, operators.Graph.oracle),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracle),
      (operators.Similarity.queries, operators.Similarity.oracle),
      (operators.SparseSim.queries, operators.SparseSim.oracle),
      (operators.Multimodal.queries, operators.Multimodal.oracle),
      (operators.PcaQueries.queries, operators.PcaQueries.oracle),
      (operators.KMeans.queries, operators.KMeans.oracle),
      (operators.Ols.queries, operators.Ols.oracle),
      (operators.Logistic.queries, operators.Logistic.oracle),
      (operators.Stump.queries, operators.Stump.oracle),
      (operators.Gbt.queries, operators.Gbt.oracle),
      (operators.RegTree.queries, operators.RegTree.oracle),
      (operators.Poisson.queries, operators.Poisson.oracle),
      (operators.TimeSeries.queries, operators.TimeSeries.oracle),
      (operators.AsOf.queries, operators.AsOf.oracle),
      (operators.Pipeline.queries, operators.Pipeline.oracle),
      (operators.RangeJoin.queries, operators.RangeJoin.oracle),
      (streaming.EventStreams.queries, streaming.EventStreams.oracle),
      (streaming.Funnel.queries, streaming.Funnel.oracle),
      (streaming.Budget.queries, streaming.Budget.oracle),
      (streaming.RateLimit.queries, streaming.RateLimit.oracle),
      (streaming.OooAudit.queries, streaming.OooAudit.oracle),
      (streaming.PitTiers.queries, streaming.PitTiers.oracle),
      (streaming.Trending.queries, streaming.Trending.oracle),
      (streaming.Compact.queries, streaming.Compact.oracle),
      (streaming.Sample.queries, streaming.Sample.oracle),
      (streaming.Scd2Stream.queries, streaming.Scd2Stream.oracle),
      (streaming.ControlChart.queries, streaming.ControlChart.oracle),
      (streaming.GapAlerts.queries, streaming.GapAlerts.oracle),
      (streaming.FirstTouch.queries, streaming.FirstTouch.oracle),
      (streaming.MvSnapshot.queries, streaming.MvSnapshot.oracle),
      (streaming.SnapshotFeed.queries, streaming.SnapshotFeed.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
