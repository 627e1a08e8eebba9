package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev utility: avg-NLL distribution of w13's cleaned corpus under the
  * control-trained hashed LM, per lang — for gate threshold choice. */
object W13LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.queries.StreamQueries
    val planted = q.w13Planted(graft.Tables.load(spark, dir, "documents"))
    val (blocked, _, _, lm, _) = q.w13Control(spark, dir)
    val cleaned = graft.text.Cleaning.c4Clean(
        planted.join(broadcast(blocked), Seq("source"), "left_anti"),
        "text", "doc_id", keep = Seq("lang"))
      .filter(col("kept"))
      .select(col("id").as("doc_id"), col("lang"), col("clean_text").as("text"))
    val (n, nll) = graft.text.LanguageModel.nllColumns(
      lm._1, lm._2, graft.queries.StreamQueries.LmB2,
      graft.queries.StreamQueries.LmB1, "text")
    cleaned.select(col("lang"), n.as("n"), nll.as("s"))
      .filter(col("n") > 0)
      .withColumn("bits", col("s").cast("double") / col("n") / 65536.0)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), round(avg("bits"), 2).as("avg"),
        round(min("bits"), 2).as("min"), round(expr("percentile(bits, 0.5)"), 2).as("p50"),
        round(expr("percentile(bits, 0.9)"), 2).as("p90"), round(max("bits"), 2).as("max"))
      .orderBy("lang").show()
    spark.stop()
  }
}
