package graft.tools
import graft._
import graft.cluster.Clustering
import graft.profile.Profiler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugC1 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    t("warm") { SparkEntry.queries("c1_kmeans_clusters")(spark, "/root/testdata/sf0.001").count() }
    val tables = Seq("customer", "supplier", "part", "orders", "nation")
      .map(t0 => t0 -> Tables.load(spark, dir, t0))
    val profiles = t("profileMany") {
      val p = Profiler.profileManyAuto(tables, features = Set("mode", "pattern"))
      p.count(); p
    }
    val vecs = t("vectorize") { Clustering.vectorize(profiles) }
    t("kmeansLocal") { Clustering.kmeansLocal(vecs, k = 4).count() }
    t("full") { SparkEntry.queries("c1_kmeans_clusters")(spark, dir).count() }
    spark.stop()
  }
}
