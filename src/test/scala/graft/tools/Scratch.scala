package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable experiment harness (test scope, rewritten per experiment).
  * Current experiment: time the d7 chain's stages at a given SF —
  * pair generation vs the CC loop (with round count). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val pairs = t("minhash pairs materialized") {
      graft.dedup.Dedup.minhashNearDuplicates(docs, "text", "doc_id",
        shingleSize = 3, numPerms = 16, rowsPerBand = 4, threshold = 0.7)
        .select("ida", "idb").localCheckpoint(true)
    }
    println(s"[scratch] n_pairs=${pairs.count()}")
    val (labels, rounds) = t("cc loop") {
      val r = graft.dedup.Components.connectedComponents(pairs, "ida", "idb")
      r._1.count()
      r
    }
    println(s"[scratch] rounds=$rounds labels=${labels.count()}")
    spark.stop()
  }
}
