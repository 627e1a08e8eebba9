package graft.tools
import graft.cluster.Clustering
import graft.pipeline.MultiTablePipeline
import graft.profile.Profiler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val half1 = orders.filter(col("o_orderkey") % 2 === 0)
    val half2 = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumn("o_totalprice",
        when(col("o_orderkey") === 1, -99999.0).otherwise(col("o_totalprice")))
    val feats = Set("quartiles", "mode", "pattern")
    val profiles = Seq("orders_a" -> half1, "orders_b" -> half2).map {
      case (n, df) => Profiler.profileAuto(df, n, features = feats)
    }.reduce(_.unionByName(_)).localCheckpoint()
    val assignments = Clustering.dbscanAssign(Clustering.vectorize(profiles), 0.5, 2)
    assignments.orderBy("cluster_id", "column_id").show(40, false)
    val bound = MultiTablePipeline.sharedClusterRules(profiles, assignments)
    bound.foreach(println)
    spark.stop()
  }
}
