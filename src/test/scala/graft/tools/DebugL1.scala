package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable
/** Per-job wall breakdown of l1 at a given SF dir. */
object DebugL1 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val starts = mutable.Map[Int, (Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (j.time, j.stageInfos.lastOption.map(_.name).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (s, n) = starts.getOrElse(j.jobId, (0L, ""))
        jobs += ((j.jobId, s, j.time, n))
      }
    })
    graft.queries.CorpusQueries.corpusPipeline(spark, dir).count() // warm
    Thread.sleep(300); jobs.clear()
    val t0 = System.nanoTime()
    graft.queries.CorpusQueries.corpusPipeline(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"WALL: $wall%.2fs, jobs=${jobs.size}")
    var prevEnd = 0L
    jobs.sortBy(_._2).foreach { case (id, s, e, n) =>
      val gap = if (prevEnd == 0) 0 else s - prevEnd
      prevEnd = e
      println(f"job $id%3d ${(e - s) / 1000.0}%6.2fs gap ${gap / 1000.0}%5.2fs  $n")
    }
    spark.stop()
  }
}
