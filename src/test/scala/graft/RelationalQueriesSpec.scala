package graft

import graft.queries.RelationalQueries

class RelationalQueriesSpec extends SparkSpec {

  test("every query returns rows at sf0.001") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle") {
    assert(RelationalQueries.oracleSql.keySet == RelationalQueries.queries.keySet)
  }

  test("pricing summary groups are the 6 flag/status pairs") {
    val rows = RelationalQueries.pricingSummary(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 6)
    val flags = rows.map(_.getString(0)).toSet
    assert(flags.subsetOf(Set("A", "N", "R")))
  }

  test("top customers is deterministic and sorted") {
    val rows = RelationalQueries.topCustomers(spark, sf).collect()
    assert(rows.length <= 20)
    val spent = rows.map(_.getDouble(2))
    assert(spent.zip(spent.tail).forall { case (a, b) => a >= b })
  }

  test("window query keeps at most 3 orders per customer") {
    val df = RelationalQueries.latestOrdersPerCustomer(spark, sf)
    val over = df.groupBy("o_custkey").count().filter("count > 3").count()
    assert(over == 0)
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
