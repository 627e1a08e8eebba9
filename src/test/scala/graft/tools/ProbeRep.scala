package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeRep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val grouped = graft.text.TextAnalysis.repetitionMetrics(docs, "text", "doc_id")
      .select(col("id").as("doc_id"), col("dup_trigram_frac").as("g"))
    val inline = docs.select(col("doc_id"),
      graft.text.TextAnalysis.inlineDupTrigramFrac("text").as("i"))
    val j = grouped.join(inline, "doc_id")
    println("mismatches=" + j.filter(col("g") =!= col("i")).count())
    j.orderBy("doc_id").show(3)
    spark.stop()
  }
}
