package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev utility: stage timing of the t28/w14 LM paths at a given SF. */
object LmProbe {
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
    val lm = graft.text.LanguageModel
    val docs = graft.Tables.load(spark, dir, "documents")
    val en = docs.filter(col("lang") === "en")
    val model = t("train-build") { lm.train(en, "text") }
    t("train-materialize(v)") { model.v.head() }
    val scored = t("score") {
      val s = lm.score(docs, model, "text", "doc_id")
      s.queryExecution.toRdd.count(); s
    }
    t("buckets-full") {
      val b = lm.perplexityBuckets(docs, en, "text", "doc_id")
      b.queryExecution.toRdd.count()
    }
    graft.ops.StagePersists.release(spark)
    spark.catalog.clearCache()
    // w14 components
    val (c2, c1) = t("hashed-train") {
      val p = lm.hashedCounts(en, "text", 8192, 2048)
      (p._1.localCheckpoint(true), p._2.localCheckpoint(true))
    }
    val (d2, d1) = t("dense-collect") { lm.denseCounts(c2, c1, 8192, 2048) }
    t("fold-score") {
      val (n, nll) = lm.nllColumns(d2, d1, 8192, 2048, "text")
      docs.select(col("doc_id"), n.as("n"), nll.as("s"))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
