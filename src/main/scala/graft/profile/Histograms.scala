package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Equi-width and equi-depth binning (SURVEY.md §2.4 A12/A13;
  * reference: pd.cut / pd.qcut at profiling/profiler.py:285-289 — the
  * profile keeps only the max bin).
  *
  * Equi-width: one min/max pre-agg (broadcast) + one bin groupBy whose
  * keyspace is `nBins` — map-side combine makes the shuffle trivial.
  * Equi-depth: ntile over a global sort; at 100 TB replace with
  * percentile_approx cutpoints (sketch) — only the max-bin share is
  * consumed downstream, which the sketch preserves.
  */
object Histograms {

  /** Equi-width bins: (bin, lo, hi, cnt); bin ∈ [0, nBins). */
  def equiWidthBins(df: DataFrame, column: String, nBins: Int = 10): DataFrame = {
    val d = col(s"`$column`").cast(DoubleType)
    val stats = df.agg(min(d).as("__mn"), max(d).as("__mx"))
    df.filter(d.isNotNull).join(broadcast(stats))
      .withColumn("bin",
        when(col("__mx") === col("__mn"), 0)
          .otherwise(least(
            floor((d - col("__mn")) * nBins / (col("__mx") - col("__mn"))),
            lit(nBins - 1))).cast("int"))
      .groupBy("bin").agg(
        count(lit(1)).as("cnt"),
        min(d).as("lo"), max(d).as("hi"))
      .select("bin", "lo", "hi", "cnt")
  }

  /** Equi-depth bins via ntile: (bin, cnt, lo, hi); counts differ by at
    * most 1 by construction. */
  def equiDepthBins(df: DataFrame, column: String, nBins: Int = 10): DataFrame = {
    val d = col(s"`$column`").cast(DoubleType)
    df.filter(d.isNotNull).select(d.as("x"))
      .withColumn("bin", ntile(nBins).over(Window.orderBy("x")) - 1)
      .groupBy("bin").agg(count(lit(1)).as("cnt"), min("x").as("lo"), max("x").as("hi"))
      .select("bin", "lo", "hi", "cnt")
  }

  /** The profile's consumed statistic: the max bin and its share
    * (reference keeps only this). */
  def maxBinShare(bins: DataFrame): DataFrame =
    bins.agg(
      max_by(col("bin"), struct(col("cnt"), (-col("bin")).as("nb"))).as("max_bin"),
      (max(struct(col("cnt"), (-col("bin")).as("nb"))).getField("cnt")
        .cast(DoubleType) / sum("cnt").cast(DoubleType)).as("max_bin_share"))
}
