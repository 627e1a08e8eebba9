package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Dev utility: A/B the bigram explode variants at a given SF. */
object LmProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    def build(regex: String, withW1: Boolean): DataFrame = {
      val ws = filter(split(lower(col("text")), regex), w => w =!= "")
      val len = size(ws) - 1
      val gs = zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b))
      val base = docs.select(col("doc_id").as("id"),
          when(size(ws) >= 2, gs).otherwise(array().cast("array<string>")).as("__gs"))
        .select(col("id"), explode(col("__gs")).as("g"))
      if (withW1) base.withColumn("w1", substring_index(col("g"), " ", 1)) else base
    }
    def buildNative(ascii: Boolean): DataFrame = {
      val ws = if (ascii) graft.functions.TokenArray.asciiTokens(col("text"))
        else graft.functions.TokenArray(col("text"))
      val len = size(ws) - 1
      val gs = zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b))
      docs.select(col("doc_id").as("id"),
          when(size(ws) >= 2, gs).otherwise(array().cast("array<string>")).as("__gs"))
        .select(col("id"), explode(col("__gs")).as("g"))
    }
    // warm
    build("[^a-z0-9]+", withW1 = false).queryExecution.toRdd.count()
    t("t23-form (a-z0-9, no w1)") {
      build("[^a-z0-9]+", withW1 = false).queryExecution.toRdd.count() }
    t("accented (à-ÿ), no w1") {
      build("[^a-zà-ÿ0-9]+", withW1 = false).queryExecution.toRdd.count() }
    t("t23-form + w1") {
      build("[^a-z0-9]+", withW1 = true).queryExecution.toRdd.count() }
    t("accented + w1") {
      build("[^a-zà-ÿ0-9]+", withW1 = true).queryExecution.toRdd.count() }
    t("native ascii kernel") { buildNative(true).queryExecution.toRdd.count() }
    t("native accented kernel") { buildNative(false).queryExecution.toRdd.count() }
    spark.stop()
  }
}
