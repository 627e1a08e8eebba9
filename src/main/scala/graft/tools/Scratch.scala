package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — current use: inspect mp1's generated rules/output. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    graft.queries.MatchQueries.multiPipeline(spark, dir).show(50, false)
  }
}
