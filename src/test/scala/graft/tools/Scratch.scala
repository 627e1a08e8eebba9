package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Disposable experiment harness (test scope, rewritten per experiment). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries("x3_correlations")(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/x3_correlations.parquet")
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    } + "\""
    val sql = graft.SparkEntry.oracleSql("x3_correlations")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"""{${q("x3_correlations")}: ${q(sql)}, ${q("x3_correlations.parquet")}: ${q(sql)}}""")
    spark.stop()
  }
}
