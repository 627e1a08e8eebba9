package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query maps; each module owns its queries
  * and their DuckDB oracle SQL side by side.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
    graft.queries.ProfileQueries.queries ++
    graft.queries.RuleQueries.queries ++
    graft.queries.DedupQueries.queries ++
    graft.queries.TextQueries.queries ++
    graft.queries.SimQueries.queries ++
    graft.queries.EvalQueries.queries ++
    graft.queries.StatQueries.queries ++
    graft.queries.MatchQueries.queries ++
    graft.queries.StreamQueries.queries ++
    graft.queries.MultimodalQueries.queries ++
    graft.queries.CorpusQueries.queries ++
    graft.queries.IngestQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
    graft.queries.ProfileQueries.oracleSql ++
    graft.queries.RuleQueries.oracleSql ++
    graft.queries.DedupQueries.oracleSql ++
    graft.queries.TextQueries.oracleSql ++
    graft.queries.SimQueries.oracleSql ++
    graft.queries.EvalQueries.oracleSql ++
    graft.queries.StatQueries.oracleSql ++
    graft.queries.MatchQueries.oracleSql ++
    graft.queries.StreamQueries.oracleSql ++
    graft.queries.MultimodalQueries.oracleSql ++
    graft.queries.CorpusQueries.oracleSql ++
    graft.queries.IngestQueries.oracleSql
}
