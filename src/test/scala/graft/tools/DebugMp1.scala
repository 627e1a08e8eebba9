package graft.tools
import graft._
import graft.cluster.Clustering
import graft.profile.{Profiler, ProfilerConfig}
import graft.pipeline.MultiTablePipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugMp1 {
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
    t("warm") { SparkEntry.queries("mp1_multi_pipeline")(spark, "/root/testdata/sf0.001").count() }
    val orders = Tables.load(spark, dir, "orders")
    val cleanA = orders.filter(col("o_orderkey") % 2 === 0)
    val cleanB = orders.filter(col("o_orderkey") % 2 === 1)
    val feats = Set("mode", "pattern")
    val profiles = t("profile-many") {
      Profiler.profileMany(Seq("orders_a" -> cleanA, "orders_b" -> cleanB),
        ProfilerConfig(exact = false, features = feats)).localCheckpoint()
    }
    val vecs = t("vectorize") { Clustering.vectorize(profiles) }
    val assignDf = t("dbscan") { Clustering.dbscanAssign(vecs, 0.5, 2) }
    val bound = t("shared-rules") { MultiTablePipeline.sharedClusterRules(profiles, assignDf) }
    println("bound rules: " + bound.size)
    t("scan+count") {
      val scans = bound.groupBy(_.table).toSeq.map { case (tn, brs) =>
        graft.rules.ViolationScanner.scan(Map("orders_a"->cleanA,"orders_b"->cleanB)(tn), tn, brs.map(_.rule).distinct, "o_orderkey") }
      scans.reduce(_.unionByName(_)).groupBy("table","column","rule").agg(count(lit(1))).count()
    }
    (1 to 2).foreach { i =>
      t(s"full-$i") { SparkEntry.queries("mp1_multi_pipeline")(spark, dir).count() }
    }
    spark.stop()
  }
}
