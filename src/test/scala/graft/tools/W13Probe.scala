package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev utility: per-component timing of the w13 gate at a given SF. */
object W13Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name ${(System.nanoTime()-t0)/1e9}%.1fs"); r
    }
    val q = graft.queries.StreamQueries
    val planted = q.w13Planted(graft.Tables.load(spark, dir, "documents"))
    val (blocked, refBuckets, dense, lm, probs) = t("control") { q.w13Control(spark, dir) }
    val cleaned = graft.text.Cleaning.c4Clean(
        planted.join(broadcast(blocked), Seq("source"), "left_anti"),
        "text", "doc_id", keep = Seq("lang"))
      .filter(col("kept"))
      .select(col("id").as("doc_id"), col("lang"), col("clean_text").as("text"))
      .localCheckpoint(true)
    t("bands") {
      cleaned.withColumn("__bb", graft.dedup.Dedup.lshBandArray(col("text"),
        shingleSize = 3, numPerms = 16, rowsPerBand = 4))
        .select(sum(size(col("__bb")))).head()
    }
    t("quality") {
      cleaned.select(sum(graft.queries.TextQueries.round4(
        graft.text.TextAnalysis.qualityScore("text")))).head()
    }
    t("trigram") {
      cleaned.select(sum(graft.queries.TextQueries.round4(
        graft.text.TextAnalysis.inlineDupTrigramFrac("text")))).head()
    }
    t("dsir") {
      val (_, score) = graft.text.Importance.scoreColumns(dense, "text", n = 2, buckets = 4096)
      cleaned.select(sum(score)).head()
    }
    spark.stop()
  }
}
