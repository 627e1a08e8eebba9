package graft.tools
import graft.ingest.Ingest
import graft.eval.Metrics
import graft.rules._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rdir = "/root/reference/datasets/Quintet/rayyan"
    val dirty = Ingest.readCsvStrict(spark, s"$rdir/dirty.csv")
    println("rows: " + dirty.count())
    val v = ViolationScanner.scan(dirty, "rayyan",
      Seq(NotNullRule("article_jcreated_at")), "id")
    println("notnull violations: " + v.count())
    v.show(5, false)
    val blank = dirty.filter(trim(col("article_jcreated_at")) === "" ||
      col("article_jcreated_at").isNull).count()
    println("blank created_at: " + blank)
    dirty.select("id", "article_jcreated_at").show(5, false)
    spark.stop()
  }
}
