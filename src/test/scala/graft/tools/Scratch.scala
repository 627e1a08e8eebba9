package graft.tools
import org.apache.spark.sql.SparkSession

/** Disposable experiment harness (test scope, rewritten per experiment).
  * Current experiment: how much of the suite's work does .count()
  * prune away vs a full toRdd materialization? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
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
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() }
      catch { case _: Throwable => }; drop()
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c1 = graft.SparkEntry.queries(n)(spark, dir).count()
      val tCount = (System.nanoTime() - t0) / 1e9
      drop()
      val t1 = System.nanoTime()
      val c2 = graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      val tForce = (System.nanoTime() - t1) / 1e9
      drop()
      println(f"$n count=$tCount%.2fs force=$tForce%.2fs rows=$c1/$c2")
    }
    spark.stop()
  }
}
