package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Exact._

/** Core relational workload over the testdata star schema.
  *
  * These exercise the engine's scan / filter / join / aggregate /
  * window / top-k paths (SURVEY.md §2.2-§2.6) on data large enough to
  * shuffle. Scale design: dimension joins are broadcast; fact-side
  * aggregation is partial (map-side combine) before the single shuffle
  * on the grouping keys; outputs are tiny (group counts), so the
  * final orderBy is cheap.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: one scan, one shuffle on a
    * 2-value key pair; all aggregates map-side combinable. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue per nation: fact table joined to broadcastable dims.
    * customer/nation/region are orders-of-magnitude smaller than
    * lineitem, so all three joins broadcast — lineitem never shuffles
    * until the final small groupBy. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val revenueByNationSql: String =
    s"""SELECT n_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** Top-20 customers by order revenue — deterministic top-k (ties
    * broken on the key). Aggregation shuffles on o_custkey; top-k is a
    * global sort of an already-small aggregate. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    o.groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(desc("total_spent"), asc("c_custkey"))
      .limit(20)
  }

  val topCustomersSql: String =
    s"""SELECT c_custkey, c_name, total_spent, n_orders FROM (
       |  SELECT o_custkey, ${dsumSql("o_totalprice")} AS total_spent,
       |         COUNT(*) AS n_orders
       |  FROM orders GROUP BY o_custkey) t
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_spent DESC, c_custkey LIMIT 20""".stripMargin

  /** Each customer's 3 largest orders — window row_number with
    * deterministic tie-break; single shuffle on the partition key. */
  def latestOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
              dround(col("o_totalprice")).as("o_totalprice"), col("rk"))
      .orderBy("o_custkey", "rk")
  }

  val latestOrdersPerCustomerSql: String =
    s"""SELECT o_custkey, o_orderkey,
       |       ${droundSql("o_totalprice")} AS o_totalprice, rk FROM (
       |  SELECT o_custkey, o_orderkey, o_totalprice,
       |    ROW_NUMBER() OVER (PARTITION BY o_custkey
       |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
       |  FROM orders) t
       |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Monthly order volume — date functions + agg (F7/F8 family). */
  def monthlyOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total"))
      .orderBy("month")
  }

  val monthlyOrdersSql: String =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q6-style selective revenue scan: every predicate reaches
    * the parquet reader as a pushed filter (spec'd via explain in
    * development); the aggregate is a single map-side-combined sum —
    * the canonical "scan only what you need" plan. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val forecastRevenueSql: String =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
       |  COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_forecast_revenue" -> (forecastRevenue _),
    "q1_pricing_summary" -> (pricingSummary _),
    "q2_revenue_by_nation" -> (revenueByNation _),
    "q3_top_customers" -> (topCustomers _),
    "q4_orders_window" -> (latestOrdersPerCustomer _),
    "q5_monthly_orders" -> (monthlyOrders _))

  def oracleSql: Map[String, String] = Map(
    "q6_forecast_revenue" -> forecastRevenueSql,
    "q1_pricing_summary" -> pricingSummarySql,
    "q2_revenue_by_nation" -> revenueByNationSql,
    "q3_top_customers" -> topCustomersSql,
    "q4_orders_window" -> latestOrdersPerCustomerSql,
    "q5_monthly_orders" -> monthlyOrdersSql)
}
