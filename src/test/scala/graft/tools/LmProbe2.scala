package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev utility: sub-stage timing of LanguageModel.score at a given SF. */
object LmProbe2 {
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
    val en = docs.filter(col("lang") === "en")
    def ws(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-zà-ÿ0-9]+"), w => w =!= "")
    def bigrams(df: org.apache.spark.sql.DataFrame, idc: String) = {
      val w = ws(col("text")); val len = size(w) - 1
      val gs = zip_with(slice(w, lit(1), len), slice(w, lit(2), len),
        (a, b) => concat(a, lit(" "), b))
      df.select(col(idc).as("id"),
          when(size(w) >= 2, gs).otherwise(array().cast("array<string>")).as("__gs"))
        .select(col("id"), explode(col("__gs")).as("g"))
        .withColumn("w1", substring_index(col("g"), " ", 1))
    }
    val g = bigrams(docs, "doc_id")
    t("explode-only") { g.queryExecution.toRdd.count() }
    val refG = bigrams(en, "doc_id").select("g", "w1").localCheckpoint(true)
    t("c2-agg") {
      refG.groupBy("g").agg(count(lit(1)).as("__c2"))
        .queryExecution.toRdd.count() }
    val c2 = refG.groupBy("g").agg(count(lit(1)).as("__c2")).localCheckpoint(true)
    val c1 = refG.groupBy("w1").agg(count(lit(1)).as("__c1")).localCheckpoint(true)
    println(s"c2 rows=${c2.count()} c1 rows=${c1.count()}")
    t("join-c2-only") {
      g.join(c2, Seq("g"), "left_outer").queryExecution.toRdd.count() }
    t("join-both") {
      g.join(c2, Seq("g"), "left_outer").join(c1, Seq("w1"), "left_outer")
        .queryExecution.toRdd.count() }
    t("join-both+ladder+agg") {
      val lm = graft.text.LanguageModel
      val v = broadcast(spark.range(1).select(lit(100000L).as("__v")))
      g.join(c2, Seq("g"), "left_outer").join(c1, Seq("w1"), "left_outer")
        .crossJoin(v)
        .select(col("id"), lm.nllFp(greatest(
          org.apache.spark.sql.GraftBridge.column(
            new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
              org.apache.spark.sql.GraftBridge.expression(
                (coalesce(col("__c2"), lit(0L)) + 1L) * lit(lm.PScale)),
              org.apache.spark.sql.GraftBridge.expression(
                coalesce(col("__c1"), lit(0L)) + col("__v")))),
          lit(1L))).as("__nll"))
        .groupBy("id").agg(count(lit(1)), sum("__nll"))
        .queryExecution.toRdd.count() }
    spark.stop()
  }
}
