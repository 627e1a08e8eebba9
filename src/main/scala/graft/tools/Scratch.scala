package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.profile._
    import graft.cluster.Clustering
    import graft.Tables
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    (1 to 2).foreach { i =>
      val profiles = Seq("customer", "supplier", "part", "orders", "nation")
        .map(t => Profiler.profileAuto(Tables.load(spark, dir, t), t,
          features = Set("mode", "pattern")))
        .reduce(_.unionByName(_))
      time(s"iter$i profiles")(profiles.count())
      val vecs = time(s"iter$i vectorize")(Clustering.vectorize(profiles))
      time(s"iter$i vecs.count")(vecs.count())
      time(s"iter$i kmeans")(Clustering.kmeans(vecs, 4).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
