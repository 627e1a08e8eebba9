package graft.tools
import graft.profile._
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.loadEvents(spark, "/root/testdata/sf0.01")
    ev.printSchema()
    Profiler.profile(ev, "events").select("column","inferred_type","distinct_count","dominant_pattern").show(10, 40)
    spark.stop()
  }
}
