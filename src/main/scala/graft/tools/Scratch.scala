package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======== $name ========")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // keep it scannable: operators + pushed filters + readschema
      plan.linesIterator
        .filter(l => l.matches("^\\(\\d+\\).*") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("Arguments: ") && l.contains("Broadcast"))
        .take(60).foreach(println)
    }
    show("q1_pricing")(graft.queries.RelationalQueries.queries("q1_pricing_summary")(spark, dir))
    show("q2_revenue")(graft.queries.RelationalQueries.queries("q2_revenue_by_nation")(spark, dir))
    show("r5_denial")(graft.queries.RuleQueries.queries("r5_denial_constraints")(spark, dir))
    show("d4_minhash")(graft.queries.DedupQueries.queries("d4_minhash_pairs")(spark, dir))
    show("profiler_passA")(graft.profile.Profiler.profile(
      graft.Tables.load(spark, dir, "nation"), "nation",
      graft.profile.ProfilerConfig(features = Set.empty)))
    spark.stop()
  }
}
