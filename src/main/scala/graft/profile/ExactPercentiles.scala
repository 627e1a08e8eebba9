package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact interpolated percentiles by group — same math as SQL
  * `quantile_cont` (index p·(n−1), linear interpolation between the
  * bracketing ranks).
  *
  * Spark's builtin exact `percentile` is an ObjectHashAggregate that
  * materializes a value→count map per partition; on high-cardinality
  * doubles that map IS the data and the aggregate degrades badly
  * (measured 20 s vs 3 s on 600 k×3 values, and 400 s on a wide
  * table). This kernel instead aggregates a (group, value) → count
  * histogram first — map-side combine shrinks the shuffle to distinct
  * values — and ranks the histogram with a window: each distinct value
  * covers the rank interval [cum−cnt, cum−1], so the bracketing order
  * statistics are conditional maxes over it. The per-group sort
  * touches distinct values only, not data rows (a 600 k-row column
  * with 50 distinct values sorts 50 rows).
  */
object ExactPercentiles {

  /** Input: a long frame with `groupCol` and numeric `valueCol` (nulls
    * ignored). Output: one row per group with one column per requested
    * percentile; groups with no values are absent. */
  def byGroup(long: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    byGroups(long, Seq(groupCol), valueCol, ps)

  /** Multi-column-group variant of [[byGroup]]. */
  def byGroups(long: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val x = col(s"`$valueCol`").cast(DoubleType)
    val gs = groupCols.map(g => col(s"`$g`"))
    val hist = long.filter(x.isNotNull)
      .groupBy(gs :+ x.as("__x"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(gs: _*).orderBy("__x")
    val ranked = hist
      .withColumn("__cum", sum("__cnt").over(w).cast(DoubleType))
      .withColumn("__n",
        sum("__cnt").over(Window.partitionBy(gs: _*)).cast(DoubleType))
      .withColumn("__start", col("__cum") - col("__cnt"))
    val pAggs = ps.map { case (name, p) =>
      val rowTarget = lit(p) * (col("__n") - 1)
      def covers(r: org.apache.spark.sql.Column) =
        col("__start") <= r && r < col("__cum")
      val lower = max(when(covers(floor(rowTarget)), col("__x")))
      val upper = max(when(covers(ceil(rowTarget)), col("__x")))
      val target = lit(p) * (max(col("__n")) - 1)
      (lower + (upper - lower) * (target - floor(target))).as(name)
    }
    ranked.groupBy(gs: _*).agg(pAggs.head, pAggs.tail: _*)
  }
}
