package graft.tools
import org.apache.spark.sql.SparkSession

/** Disposable experiment harness (test scope, rewritten per experiment). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val chunks = graft.text.Chunking.tokenChunks(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text")
    val packed = graft.text.Packing
      .packChunks(chunks, "doc_id", "token_start", "n_tokens")
    packed.collect()
    val plan = packed.queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("Window") || l.contains("windowspecdefinition"))
      .foreach(l => println(l.trim.take(160)))
    spark.stop()
  }
}
