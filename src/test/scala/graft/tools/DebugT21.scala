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
    val docs = graft.Tables.load(spark, "/tmp/sf1", "documents")
    val buckets = graft.dedup.Dedup.inlineLshBuckets(docs, "text", "doc_id", 3, 16, 4)
    val plan = buckets.queryExecution.executedPlan.toString
    println("md5Long occurrences: " + ("conv".r.findAllIn(plan).length))
    println("split occurrences: " + ("split".r.findAllIn(plan).length))
    println("transform occurrences: " + ("transform".r.findAllIn(plan).length))
    println("plan length: " + plan.length)
    println(plan.take(2500))
    spark.stop()
  }
}
