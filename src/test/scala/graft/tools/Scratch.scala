package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev scratchpad — current use: diagnose t2_quality sf0.1 oracle drift.
  * Dumps per-doc quality components at full precision for comparison
  * against DuckDB. Usage: Scratch <sfDir> <outParquet>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val out = args(1)
    val docs = graft.Tables.load(spark, dir, "documents")
    val v = col("text")
    docs.select(col("doc_id"),
        length(v).cast(DoubleType).as("len"),
        length(regexp_replace(v, "[^A-Za-zà-ÿ]", "")).cast(DoubleType).as("alpha"),
        length(regexp_replace(v, "[^0-9]", "")).cast(DoubleType).as("digits"),
        length(regexp_replace(v, "[^\\p{Punct}]", "")).cast(DoubleType).as("punct"),
        graft.text.TextAnalysis.tokenCount("text").cast(DoubleType).as("ntok"),
        graft.text.TextAnalysis.qualityScore("text").as("raw_score"),
        round(graft.text.TextAnalysis.qualityScore("text"), 4).as("quality"))
      .orderBy("doc_id")
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
