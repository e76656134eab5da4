package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `get_profit_summary` shape (sql/pg/test.postgres.sql:8-12)
    * re-expressed over the fixtures. */
  def entry(spark: SparkSession): DataFrame =
    RelOps.aggGroupSum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelOps.queries ++ TextOps.queries ++ DedupOps.queries ++ PipelineOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ MaterializeOps.queries ++
      AsOfOps.queries ++ SourceFormatOps.queries ++ AnalyticsOps.queries ++
      GraphOps.queries ++ TpchOps.queries ++ graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelOps.oracle ++ TextOps.oracle ++ DedupOps.oracle ++ PipelineOps.oracle ++
      SimilarityOps.oracle ++ MultimodalOps.oracle ++ MaterializeOps.oracle ++
      AsOfOps.oracle ++ SourceFormatOps.oracle ++ AnalyticsOps.oracle ++
      GraphOps.oracle ++ TpchOps.oracle ++ graft.streaming.StreamOps.oracle
}
