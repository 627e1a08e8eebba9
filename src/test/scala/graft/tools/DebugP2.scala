package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Stage-level timing of the p2 percentile path at one SF: which part
  * of the sketched kernel costs — the GK sketch agg, the value
  * histogram, or the final bracketed walk. args = sfDir */
object DebugP2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def longFrame = {
      val df = graft.Tables.load(spark, sfDir, "lineitem")
      val entries = cols.map(c =>
        struct(lit(c).as("column"), col(c).cast(DoubleType).as("x")))
      df.select(explode(array(entries: _*)).as("e"))
        .select(col("e.column").as("column"), col("e.x").as("x"))
        .filter(col("x").isNotNull)
    }
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name#$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    time("sketch_agg") {
      longFrame.groupBy("column")
        .agg(percentile_approx(col("x"),
          array(lit(0.05), lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
          lit(1000)).as("b"))
        .count()
    }
    time("hist_agg") {
      longFrame.groupBy(col("column"), col("x"))
        .agg(count(lit(1)).as("cnt")).count()
    }
    time("full_sketched") {
      graft.profile.ExactPercentiles.byGroups(longFrame, Seq("column"), "x",
        Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75),
        maxGroupRows = Some(700000L)).count()
    }
    time("p2_whole_query") {
      graft.SparkEntry.queries("p2_profile_numeric")(spark, sfDir).count()
    }
    spark.stop()
  }
}
