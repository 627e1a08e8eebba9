package graft.tools
import graft.profile.{Profiler, ProfilerConfig}
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 2).foreach { i =>
      time(s"docs regex  $i")(Profiler.profile(docs, "d",
        ProfilerConfig(features = Set.empty, fusedCensus = false)).count())
      time(s"docs census $i")(Profiler.profile(docs, "d",
        ProfilerConfig(features = Set.empty, fusedCensus = true)).count())
      time(s"li   regex  $i")(Profiler.profile(li, "l",
        ProfilerConfig(features = Set.empty, fusedCensus = false)).count())
      time(s"li   census $i")(Profiler.profile(li, "l",
        ProfilerConfig(features = Set.empty, fusedCensus = true)).count())
    }
    spark.stop()
  }
}
