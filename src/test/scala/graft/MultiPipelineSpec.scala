package graft

import graft.pipeline.MultiTablePipeline
import org.apache.spark.sql.functions._

/** End-to-end multi-table pipeline spec (reference main.py --mode
  * multi): split one table into halves, cluster columns across the
  * halves, derive shared rules, and detect planted violations. */
class MultiPipelineSpec extends SparkSpec {

  test("split-table lake: shared rules detect planted errors") {
    val orders = Tables.load(spark, sf, "orders")
    val half1 = orders.filter(col("o_orderkey") % 2 === 0)
    // plant an error in half2: a totalprice far outside any IQR hull
    val half2 = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumn("o_totalprice",
        when(col("o_orderkey") === 1, -9.0e9).otherwise(col("o_totalprice")))
    val violations = MultiTablePipeline.run(spark,
      Map("orders_a" -> half1, "orders_b" -> half2),
      Map("orders_a" -> "o_orderkey", "orders_b" -> "o_orderkey"),
      eps = 0.5, minPts = 2)
    assert(!violations.isEmpty)
    // the planted extreme value must be flagged by the shared range rule
    val planted = violations.filter(
      col("table") === "orders_b" && col("row_id") === 1 &&
        col("column") === "o_totalprice")
    assert(planted.count() >= 1)
    // the clean half produces no spurious violations from shared rules
    val tables = violations.select("table").distinct().collect()
      .map(_.getString(0)).toSet
    assert(tables === Set("orders_b"))
  }

  test("shared rules only emerge from multi-member clusters") {
    val profiles = graft.profile.Profiler.profileAuto(
      Tables.load(spark, sf, "nation"), "nation",
      features = Set("quartiles", "mode", "pattern"))
    import spark.implicits._
    // every column its own singleton cluster → no shared rules
    val singletons = profiles
      .select(concat_ws("::", col("table"), col("column")).as("column_id"))
      .withColumn("cluster_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("column_id")))
    val rules = MultiTablePipeline.sharedClusterRules(profiles, singletons)
    assert(rules.isEmpty)
  }
}
