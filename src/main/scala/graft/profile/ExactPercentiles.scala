package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact interpolated percentiles by group via sort — same math as
  * SQL `quantile_cont` (index p·(n−1), linear interpolation between
  * the bracketing ranks).
  *
  * Spark's builtin exact `percentile` is an ObjectHashAggregate that
  * materializes a value→count map per partition; on high-cardinality
  * doubles that map IS the data and the aggregate degrades badly
  * (measured 20 s vs 3 s on 600 k×3 values, and 400 s on a wide
  * table). A partitioned sort + conditional max is the shuffle-native
  * formulation: one exchange on the group key, spill-friendly,
  * whole-stage codegen throughout.
  */
object ExactPercentiles {

  /** Input: a long frame with `groupCol` and numeric `valueCol` (nulls
    * ignored). Output: one row per group with one column per requested
    * percentile; groups with no values are absent. */
  def byGroup(long: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val x = col(s"`$valueCol`").cast(DoubleType)
    val w = Window.partitionBy(groupCol).orderBy("__x")
    val ranked = long.filter(x.isNotNull)
      .select(col(s"`$groupCol`"), x.as("__x"))
      .withColumn("__rn", row_number().over(w).cast(DoubleType) - 1)
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(groupCol)).cast(DoubleType))
    val pAggs = ps.map { case (name, p) =>
      val rowTarget = lit(p) * (col("__n") - 1)
      val lower = max(when(col("__rn") === floor(rowTarget), col("__x")))
      val upper = max(when(col("__rn") === ceil(rowTarget), col("__x")))
      val target = lit(p) * (max(col("__n")) - 1)
      (lower + (upper - lower) * (target - floor(target))).as(name)
    }
    ranked.groupBy(groupCol).agg(pAggs.head, pAggs.tail: _*)
  }
}
