package graft.matching

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Two-sample distribution distances between numeric columns
  * (SURVEY.md §2.8 F13; reference: method_2/pipleline_2.py:90-111 —
  * KS statistic + Wasserstein distance feed the column matcher's
  * distribution-similarity score).
  *
  * Exact path: both statistics fall out of ONE cumulative frame — the
  * union of the two columns grouped by value with per-side cumulative
  * counts. The window orders by value over the DISTINCT-value frame
  * (cardinality ≤ distinct values, not rows), so the single-partition
  * sort is bounded by value cardinality; at 100 TB with genuinely
  * continuous data, compute the same statistics on percentile_approx
  * grids instead (sketch-sized ECDFs) — same formulas, bounded input.
  */
object DistributionDistance {

  /** Cumulative ECDF frame for two columns: one row per distinct value
    * with both sides' ECDFs and the gap to the next value. */
  def ecdfFrame(a: DataFrame, aCol: String, b: DataFrame, bCol: String): DataFrame = {
    val av = a.select(col(s"`$aCol`").cast(DoubleType).as("x"))
      .filter(col("x").isNotNull)
      .groupBy("x").agg(count(lit(1)).as("na"))
      .withColumn("nb", lit(0L))
    val bv = b.select(col(s"`$bCol`").cast(DoubleType).as("x"))
      .filter(col("x").isNotNull)
      .groupBy("x").agg(count(lit(1)).as("nb"))
      .withColumn("na", lit(0L))
    val merged = av.unionByName(bv)
      .groupBy("x").agg(sum("na").as("na"), sum("nb").as("nb"))
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("ca", sum("na").over(w))
      .withColumn("cb", sum("nb").over(w))
      .withColumn("ta", sum("na").over(Window.partitionBy()))
      .withColumn("tb", sum("nb").over(Window.partitionBy()))
      .withColumn("fa", col("ca").cast(DoubleType) / col("ta").cast(DoubleType))
      .withColumn("fb", col("cb").cast(DoubleType) / col("tb").cast(DoubleType))
      .withColumn("next_x", lead("x", 1).over(Window.orderBy("x")))
  }

  /** (ks, wasserstein) in one job: KS = max |Fa − Fb|; W1 = Σ |Fa − Fb|
    * · (next_x − x) over the sorted distinct values. */
  def ksAndWasserstein(a: DataFrame, aCol: String, b: DataFrame, bCol: String): DataFrame =
    ecdfFrame(a, aCol, b, bCol).agg(
      max(abs(col("fa") - col("fb"))).as("ks"),
      sum(when(col("next_x").isNotNull,
        abs(col("fa") - col("fb")) * (col("next_x") - col("x"))).otherwise(0.0))
        .as("wasserstein"))
}
