package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable experiment harness (test scope, rewritten per experiment).
  * Current experiment: does the exact-dup collapse path complete the
  * ×100-duplication minhash pair generation that spilled >45 GB
  * through the direct path? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val n = graft.dedup.Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      shingleSize = 3, numPerms = 16, rowsPerBand = 4, threshold = 0.8,
      collapseExactDups = true).count()
    println(f"collapse path: ${(System.nanoTime() - t0) / 1e9}%.1fs pairs=$n")
    spark.stop()
  }
}
