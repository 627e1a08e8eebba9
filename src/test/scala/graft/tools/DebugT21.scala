package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugT21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = graft.Tables.load(spark, "/tmp/sf1", "documents")
    t("langId cold")(docs.select(col("doc_id"),
      graft.text.TextAnalysis.langId("text").as("lang_pred"))
      .localCheckpoint(true).count())
    t("langId warm")(docs.select(col("doc_id"),
      graft.text.TextAnalysis.langId("text").as("lang_pred"))
      .localCheckpoint(true).count())
    spark.stop()
  }
}
