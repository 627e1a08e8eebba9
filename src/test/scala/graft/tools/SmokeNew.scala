package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev utility: run a subset of SparkEntry.queries and dump results to
  * parquet for ad-hoc oracle checks. Usage: SmokeNew <sfDir> <outDir> names... */
object SmokeNew {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      val rows = spark.read.parquet(s"$outDir/$n.parquet").count()
      println(f"$n rows=$rows ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
