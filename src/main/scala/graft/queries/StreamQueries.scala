package graft.queries

import graft.Tables
import graft.streaming.StreamingQuality
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate query for the streaming module: the SAME windowed
  * aggregation runs here in batch mode (window() is an ordinary
  * grouping expression), so the DuckDB oracle checks the streaming
  * plan's logic end to end. */
object StreamQueries {

  def windowedStats(spark: SparkSession, dir: String): DataFrame =
    StreamingQuality.windowedStats(Tables.loadEvents(spark, dir),
        "ts", "event_type", "value", windowLen = "1 hour")
      .withColumn("mean", round(col("mean"), 6))
      .orderBy("window_start", "key")

  /** Tumbling 1-hour windows are epoch-aligned — identical to
    * date_trunc('hour') on UTC timestamps. */
  val windowedStatsSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type AS key, COUNT(*) AS n,
      |  SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value), 6) AS mean,
      |  MIN(value) AS min, MAX(value) AS max
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_windowed_stats" -> (windowedStats _))

  def oracleSql: Map[String, String] = Map(
    "w1_windowed_stats" -> windowedStatsSql)
}
