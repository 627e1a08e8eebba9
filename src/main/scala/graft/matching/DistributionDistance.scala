package graft.matching

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Two-sample distribution distances between numeric columns
  * (SURVEY.md §2.8 F13; reference: method_2/pipleline_2.py:90-111 —
  * KS statistic + Wasserstein distance feed the column matcher's
  * distribution-similarity score).
  *
  * Exact at scale: the cumulative ECDF is a distributed prefix sum —
  * range-partition the distinct values, per-partition running sums in
  * parallel windows keyed by the physical partition id, then add each
  * partition's broadcast offset (the control-plane per-partition totals,
  * O(#partitions) rows, computed once and reused for the next-value
  * boundary handoff). No global single-partition sort anywhere.
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
    val (cum, totals) = graft.ops.Scale.prefixSums(
      merged, "x", Seq("na", "nb"), withNext = true)
    cum
      .withColumnRenamed("__cum_na", "ca")
      .withColumnRenamed("__cum_nb", "cb")
      .withColumn("ta", lit(totals("na")))
      .withColumn("tb", lit(totals("nb")))
      .withColumn("fa", col("ca").cast(DoubleType) / col("ta").cast(DoubleType))
      .withColumn("fb", col("cb").cast(DoubleType) / col("tb").cast(DoubleType))
      .withColumnRenamed("__next", "next_x")
  }

  /** (ks, wasserstein) in one pass over the ECDF frame: KS = max
    * |Fa − Fb|; W1 = Σ |Fa − Fb| · (next_x − x) over sorted distinct
    * values. */
  def ksAndWasserstein(a: DataFrame, aCol: String, b: DataFrame, bCol: String): DataFrame =
    ecdfFrame(a, aCol, b, bCol).agg(
      max(abs(col("fa") - col("fb"))).as("ks"),
      sum(when(col("next_x").isNotNull,
        abs(col("fa") - col("fb")) * (col("next_x") - col("x"))).otherwise(0.0))
        .as("wasserstein"))
}
