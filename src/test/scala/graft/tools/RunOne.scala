package graft.tools
import org.apache.spark.sql.SparkSession
/** Run one SparkEntry query and write parquet: args = name sfDir outDir */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    println(s"rows=${spark.read.parquet(s"$outDir/$name.parquet").count()}")
    spark.stop()
  }
}
