package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def time[T](l: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 2).foreach { i =>
      time(s"benford $i")(graft.profile.Benford.distribution(li, "l_extendedprice").count())
      time(s"scan-only $i")(li.select(col("l_extendedprice")).count())
      time(s"cast-str $i")(li.select(col("l_extendedprice").cast("string")).filter(col("l_extendedprice").isNotNull).count())
      time(s"regex $i")(li.select(regexp_extract(col("l_extendedprice").cast("string"), "[1-9]", 0).as("fd")).filter(col("fd") =!= "").count())
    }
    spark.stop()
  }
}
