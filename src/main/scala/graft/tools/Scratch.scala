package graft.tools
import graft.profile._
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // probe: subset features -> full schema with safe defaults, sane inference
    val df = Seq(("a", "x"), ("b", "x"), ("c", "y")).toDF("k", "v")
    val p = Profiler.profile(df, "t", ProfilerConfig(features = Set("quartiles")))
    p.select("column", "inferred_type", "distinct_count", "mode_value", "top_keywords").show()
    // full-feature run on same data for comparison
    Profiler.profile(df, "t").select("column", "inferred_type", "distinct_count", "mode_value").show()
    spark.stop()
  }
}
