package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable
object DebugP10b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val starts = mutable.Map[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs += ((j.jobId, starts.getOrElse(j.jobId, 0L), j.time))
    })
    val dir = "/root/testdata/sf0.1"
    // warm run
    graft.queries.MatchQueries.multiPipeline(spark, dir).count()
    Thread.sleep(500); jobs.clear()
    val t0 = System.nanoTime()
    graft.queries.MatchQueries.multiPipeline(spark, dir).count()
    val wall = (System.nanoTime()-t0)/1e9
    Thread.sleep(500)
    println(f"WALL: $wall%.2fs, jobs=${jobs.size}")
    var prevEnd = 0L
    jobs.sortBy(_._2).foreach { case (id, s, e) =>
      val gap = if (prevEnd == 0) 0 else s - prevEnd
      println(f"  job $id%3d ${(e-s)/1000.0}%6.2fs  (gap before: ${gap/1000.0}%5.2fs)")
      prevEnd = e
    }
    spark.stop()
  }
}
