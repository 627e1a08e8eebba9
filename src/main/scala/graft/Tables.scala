package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake catalog access for the driver-generated testdata tables
  * (TESTDATA.md). Mirrors the reference's lake-directory discovery
  * (reference: profiling/profiler.py:42-63, main.py:79-99) re-expressed
  * as parquet reads: one table per file, schema carried by parquet.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` ships with nanosecond parquet timestamps, which Spark only
    * reads as raw Long nanos (spark.sql.legacy.parquet.nanosAsLong=true,
    * set by every session in this project). This loader restores a
    * proper TimestampType `ts` (microsecond precision). */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: exact
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
