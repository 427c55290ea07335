package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every oracle-checked operator
  * from SURVEY.md §2.3 contributes one `queries` entry and one `oracleSql`
  * entry with IDENTICAL column names on both sides.
  */
object SparkEntry {

  /** All query modules, in build order (SURVEY.md §7.2). */
  private def modules: Seq[QueryModule] = Seq(
    operators.TextQueries,
    operators.RelationalQueries,
    operators.JoinQueries,
    operators.AggregateQueries,
    operators.WindowQueries,
    operators.FunctionQueries,
    operators.DedupQueries,
    operators.TextStatsQueries,
    operators.SimilarityQueries,
    operators.ReshapeQueries,
    operators.SubqueryQueries,
    operators.TextPipelineQueries,
    operators.PipelineQueries,
    operators.TpchQueries,
    operators.TimeSeriesQueries,
    operators.ProfileQueries,
    operators.AnalyticsQueries,
    operators.GraphQueries,
    operators.SketchQueries,
    operators.TemporalQueries,
    operators.QualityQueries,
    operators.StatsQueries,
    operators.InferenceQueries,
    operators.RetrievalQueries,
    operators.GovernanceQueries,
    operators.EvalQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
