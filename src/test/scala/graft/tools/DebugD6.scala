package graft.tools
import graft._
import org.apache.spark.sql.SparkSession

/** Scratch timer: run named SparkEntry queries at sf0.1 (warmup at
  * sf0.001, best-of-2, state dropped between runs — bench conditions). */
object DebugD6 {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("r6_trained_bands", "r7_trained_violations", "d6_embedding_dups")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dropState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count(); dropState()
      val sec = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
        val s = (System.nanoTime() - t0) / 1e9; dropState(); s
      }.min
      println(f"$n $sec%.2fs")
    }
    spark.stop()
  }
}
