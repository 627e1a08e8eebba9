package graft.outlier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Statistical cell detectors (SURVEY.md §2.4 A21/A22 and the dBoost
  * Gaussian family A23/A30; reference: rules/evaluation.py:434-447,
  * profiling/dBoost/dboost/models/gaussian.py:22-38).
  *
  * Two-pass estimator/transformer shape: a tiny fit aggregate
  * (broadcast) followed by a map-side predicate — exactly Spark's
  * estimator pattern, no shuffle of the data itself.
  */
object Outliers {

  /** Deterministic mean/variance from exact decimal sums of x and x²
    * (bit-identical under any partitioning — the plain Welford-style
    * stddev aggregate is order-dependent). */
  private def momentAgg(d: Column): DataFrame => DataFrame = { df =>
    df.agg(
      (sum(d.cast(DecimalType(30, 6))).cast(DoubleType) / count(d)).as("__mean"),
      (sum((d * d).cast(DecimalType(38, 6))).cast(DoubleType) / count(d)).as("__m2"))
  }

  /** Rows where |x − μ| > k·σ (population σ). Appends nothing to the
    * input; returns the flagged rows with their key and value. */
  def sigmaOutliers(df: DataFrame, column: String, keyCol: String,
      k: Double = 3.0): DataFrame = {
    val d = col(s"`$column`").cast(DoubleType)
    val stats = momentAgg(d)(df)
      .withColumn("__sigma", sqrt(col("__m2") - col("__mean") * col("__mean")))
    df.join(broadcast(stats))
      .filter(d.isNotNull && abs(d - col("__mean")) > lit(k) * col("__sigma"))
      .select(col(s"`$keyCol`").as("row_id"), d.as("value"),
        col("__mean").as("mean"), col("__sigma").as("sigma"))
  }

  /** Robust outliers by modified z-score (Iglewicz–Hoaglin): flag rows
    * where 0.6745·|x − median| > k·MAD. Unlike [[sigmaOutliers]], the
    * estimator itself is outlier-resistant — a heavy tail can't drag μ/σ
    * toward the outliers it should flag.
    *
    * Median and MAD both come from
    * [[graft.profile.ExactPercentiles.byGroup]]'s sketch-bracketed
    * exact kernel — no per-group sort, group-size-independent memory,
    * so the fit holds at any scale; each fit is a one-row broadcast and
    * the flagging pass is a map-side predicate (the sigma-family
    * estimator/transformer shape, robust edition). */
  def madOutliers(df: DataFrame, column: String, keyCol: String,
      k: Double = 3.5): DataFrame = {
    val d = col(s"`$column`").cast(DoubleType)
    def medianOf(values: DataFrame, as: String): DataFrame =
      graft.profile.ExactPercentiles.byGroup(
          values.select(lit(1).as("__g"), col("__x")),
          "__g", "__x", Seq((as, 0.5)))
        .select(as)
    val med = broadcast(medianOf(df.select(d.as("__x")), "__med"))
    val mad = broadcast(medianOf(
      df.crossJoin(med).select(abs(d - col("__med")).as("__x")), "__mad"))
    df.crossJoin(med).crossJoin(mad)
      .filter(d.isNotNull && col("__mad") > 0 &&
        lit(0.6745) * abs(d - col("__med")) > lit(k) * col("__mad"))
      .select(col(s"`$keyCol`").as("row_id"), d.as("value"),
        col("__med").as("median"), col("__mad").as("mad"))
  }

  /** Values whose relative frequency is below `minRatio`
    * (reference: rules/evaluation.py:441-446 flags values under 1%). */
  def lowFrequencyValues(df: DataFrame, column: String,
      minRatio: Double = 0.01): DataFrame = {
    // total via a one-row agg + broadcast cross join — an empty-key
    // window (`sum().over(Window.partitionBy())`) would pull every
    // distinct value into a single task, which a mis-assigned
    // high-cardinality column turns into a straggler
    val counts = df.filter(col(s"`$column`").isNotNull)
      .groupBy(col(s"`$column`").cast(StringType).as("value"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt").cast(DoubleType) / col("total").cast(DoubleType) < minRatio)
      .select(col("value"), col("cnt"))
  }

  /** Per-group Gaussian test (dBoost partitioned model A28/A30): fit
    * μ/σ per `groupCol`, flag rows outside k·σ of their OWN group. */
  def groupedSigmaOutliers(df: DataFrame, column: String, groupCol: String,
      keyCol: String, k: Double = 3.0): DataFrame = {
    val d = col(s"`$column`").cast(DoubleType)
    val stats = df.groupBy(col(s"`$groupCol`").as("__g"))
      .agg(
        (sum(d.cast(DecimalType(30, 6))).cast(DoubleType) / count(d)).as("__mean"),
        (sum((d * d).cast(DecimalType(38, 6))).cast(DoubleType) / count(d)).as("__m2"))
      .withColumn("__sigma", sqrt(col("__m2") - col("__mean") * col("__mean")))
    df.join(broadcast(stats), col(s"`$groupCol`") === col("__g"))
      .filter(d.isNotNull && abs(d - col("__mean")) > lit(k) * col("__sigma"))
      .select(col(s"`$groupCol`").as("group"), col(s"`$keyCol`").as("row_id"),
        d.as("value"))
  }
}
