package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — current use: snapshot c2/x8 exact outputs at sf0.001. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    println("== c2 ==")
    graft.queries.MatchQueries.dbscanClusters(spark, dir)
      .collect().foreach(r => println(s"${r.get(0)} -> ${r.get(1)}"))
    println("== x8 ==")
    graft.queries.StatQueries.gmmOutliers(spark, dir)
      .collect().foreach(r => println(s"${r.get(0)} ${r.get(1)}"))
  }
}
