package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable experiment harness (test scope, rewritten per experiment).
  * Current experiment: find the d7 rows whose jaccard denominator is 0
  * at sf10. */
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
    val sh = graft.dedup.Dedup.wordShingles(docs, "text", "doc_id", 3)
      .persist()
    val buckets = graft.dedup.Dedup.lshBuckets(
      graft.dedup.Dedup.minhashSignatures(sh, 16), 4)
    val cands = graft.dedup.Dedup.lshCandidates(buckets)
    println("cands=" + cands.count())
    val dupCands = cands.groupBy("ida", "idb").count().filter(col("count") > 1).count()
    println("dup cand pairs=" + dupCands)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    println("zero-size docs=" + docs.select(col("doc_id")).except(sizes.select(col("id"))).count())
    val a = sh.select(col("id").as("ida"), col("shingle"))
    val b = sh.select(col("id").as("idb"), col("shingle"))
    val common = cands.join(a, Seq("ida"))
      .join(b, Seq("idb", "shingle"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("common"))
    val j = common
      .join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("sz", "sza"), "ida")
      .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("sz", "szb"), "idb")
      .withColumn("den", col("sza") + col("szb") - col("common"))
    val bad = j.filter(col("den") <= 0)
    println("bad rows=" + bad.count())
    bad.show(10, false)
    spark.stop()
  }
}
