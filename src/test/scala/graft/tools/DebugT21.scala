package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugT21 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").localCheckpoint(true)
    t("baseline sum(length)")(docs.agg(sum(length(col("text")))).collect())
    t("one regexp_replace")(docs.agg(sum(length(
      regexp_replace(col("text"), "[^A-Za-zà-ÿ]", "")))).collect())
    t("split size")(docs.agg(sum(size(split(lower(col("text")), "[^a-zà-ÿ0-9]+")))).collect())
    t("tokenCount agg")(docs.agg(sum(graft.text.TextAnalysis.tokenCount("text"))).collect())
    t("quality agg")(docs.agg(sum(graft.text.TextAnalysis.qualityScore("text"))).collect())
    val q = docs.select(graft.text.TextAnalysis.qualityScore("text").as("q"))
    println(q.queryExecution.executedPlan.toString.linesIterator.take(4).mkString("\n"))
    spark.stop()
  }
}
