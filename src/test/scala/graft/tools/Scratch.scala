package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable experiment harness (test scope, rewritten per experiment).
  * Current experiment: confirm the gram-build 151s is CollapseProject
  * inlining the word split into the per-index lambda, and time the
  * zip_with reformulation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    val ws = filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
    val n = 2
    def gramsOf(wsCol: org.apache.spark.sql.Column) =
      when(size(wsCol) >= n,
        transform(sequence(lit(1), size(wsCol) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(wsCol, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

    t("a) current two-select form") {
      println(docs.select(col("doc_id").as("id"), ws.as("__ws"))
        .select(col("id"), gramsOf(col("__ws")).as("__gs"))
        .select(explode(col("__gs"))).count())
    }
    t("b) cache barrier") {
      val pre = docs.select(col("doc_id").as("id"), ws.as("__ws")).cache()
      pre.count()
      val c = pre.select(col("id"), gramsOf(col("__ws")).as("__gs"))
        .select(explode(col("__gs"))).count()
      pre.unpersist(true)
      println(c)
    }
    t("c) zip_with form") {
      // bigram special case: zip ws with its tail
      val g = zip_with(col("__ws"),
        slice(col("__ws"), lit(2), greatest(size(col("__ws")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      println(docs.select(col("doc_id").as("id"), ws.as("__ws"))
        .select(col("id"), g.as("__gs"))
        .select(explode(col("__gs"))).count())
    }
    spark.stop()
  }
}
