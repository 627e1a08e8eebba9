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
  * Equi-depth: exact ntile semantics WITHOUT a global sort — ranks come
  * from a distributed prefix sum over the (value, count) histogram
  * (range partition + per-partition windows + broadcast offsets), and
  * each value maps onto the rank intervals of the bins it overlaps by
  * pure integer arithmetic. Ties split across bins exactly as ntile
  * splits them; the heavy work is a map-side-combined groupBy(value).
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

  /** Equi-depth bins with exact `ntile(nBins)` semantics: (bin, cnt,
    * lo, hi); counts differ by at most 1, ties split across adjacent
    * bins by rank exactly as the window function splits them. */
  def equiDepthBins(df: DataFrame, column: String, nBins: Int = 10): DataFrame = {
    val d = col(s"`$column`").cast(DoubleType)
    val counts = df.filter(d.isNotNull).select(d.as("x"))
      .groupBy("x").agg(count(lit(1)).as("cnt"))

    // distributed prefix sum of counts in value order → each value's
    // 0-based start rank
    val (cum, totals) = graft.ops.Scale.prefixSums(counts, "x", Seq("cnt"))
    val total = totals("cnt")
    if (total == 0) return counts.select(
      lit(0).as("bin"), col("x").as("lo"), col("x").as("hi"), col("cnt"))

    // ntile(n) over N rows: the first N % n buckets hold N/n + 1 rows
    val q = total / nBins
    val rem = total % nBins
    def bucketOf(r: org.apache.spark.sql.Column) =
      when(r < rem * (q + 1), floor(r / (q + 1)))
        .otherwise(lit(rem) + floor((r - rem * (q + 1)) / math.max(q, 1L)))
        .cast("int")
    def bucketStart(b: org.apache.spark.sql.Column) =
      when(b < rem, b * (q + 1)).otherwise(lit(rem * (q + 1)) + (b - rem) * q)
    def bucketEnd(b: org.apache.spark.sql.Column) =
      bucketStart(b) + when(b < rem, q + 1).otherwise(q)

    cum
      .withColumn("__start", col("__cum_cnt") - col("cnt"))
      // a value spans at most nBins rank intervals — explode only those
      .withColumn("bin", explode(sequence(
        bucketOf(col("__start")), bucketOf(col("__start") + col("cnt") - 1))))
      .withColumn("__overlap",
        least(col("__start") + col("cnt"), bucketEnd(col("bin"))) -
          greatest(col("__start"), bucketStart(col("bin"))))
      .groupBy("bin").agg(
        sum("__overlap").as("cnt"), min("x").as("lo"), max("x").as("hi"))
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
