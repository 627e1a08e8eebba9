package graft

import graft.ops.Scale
import org.apache.spark.sql.functions._

/** Scale-primitive specs: salting preserves counts; bucketed joins
  * eliminate the shuffle exchange. */
class ScaleSpec extends SparkSpec {

  test("salted count equals plain groupBy count") {
    val li = Tables.load(spark, sf, "lineitem")
    val plain = li.groupBy("l_orderkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(li, "l_orderkey", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("bucketed join plan has no shuffle exchange") {
    val o = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Scale.writeBucketed(o, "b_orders", "o_orderkey", buckets = 4)
    Scale.writeBucketed(li, "b_lineitem", "o_orderkey", buckets = 4)
    val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("ShuffleExchange"),
      s"expected exchange-free bucketed join, got:\n$physical")
    // and it still computes the right thing
    val expected = o.join(li, "o_orderkey").count()
    assert(joined.count() === expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
