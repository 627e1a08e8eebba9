package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc timing of a subset of SparkEntry.queries: args = sfDir names... */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      graft.ops.StagePersists.release(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // force full row materialization (the Bench convention): .count()
    // lets Catalyst prune computed columns, timing map queries as scans
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // warmup
    names.foreach { n => try { force(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")) } catch { case _: Throwable => }; drop() }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = force(graft.SparkEntry.queries(n)(spark, sfDir))
      println(f"$n ${(System.nanoTime()-t0)/1e9}%.2fs rows=$c")
      drop()
    }
    spark.stop()
  }
}
