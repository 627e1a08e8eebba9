package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Benford first-digit analysis (SURVEY.md §2.4 A11; reference:
  * profiling/profiler.py:275-276, reds.py:61-63; `benford_conformity`
  * declared at rules.yaml:13).
  *
  * One groupBy over a 9-value keyspace — the shuffle carries at most
  * 9 × #partitions pre-aggregated rows.
  */
object Benford {

  /** Expected Benford share of first digit d: log10(1 + 1/d). */
  val expected: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap

  /** First significant digit of a (string-castable) value. */
  def firstDigit(c: Column): Column =
    regexp_extract(c.cast("string"), "[1-9]", 0)

  /** Observed first-digit distribution: (digit, cnt, share, expected). */
  def distribution(df: DataFrame, column: String): DataFrame = {
    val fd = firstDigit(col(s"`$column`"))
    val expectedCol = (1 to 9).foldLeft(lit(0.0)) { case (acc, d) =>
      when(col("digit") === d, expected(d)).otherwise(acc)
    }
    val counts = df.select(fd.as("fd")).filter(col("fd") =!= "")
      .groupBy(col("fd").cast("int").as("digit"))
      .agg(count(lit(1)).as("cnt"))
    // constant-key window on the POST-AGG frame (≤9 rows): ONE lineage,
    // so the input scan+agg runs once — a crossJoin(broadcast(agg))
    // would put the aggregate subtree on two plan branches and can
    // rescan the column when exchange reuse doesn't kick in (the
    // DomainMix.tokenShares lesson) — and the literal partition key
    // avoids the empty-partition-spec WindowExec warning the old
    // sum().over() form spammed
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    counts
      .withColumn("share",
        col("cnt").cast(DoubleType) / sum("cnt").over(w).cast(DoubleType))
      .withColumn("expected", expectedCol)
  }

  /** Benford conformity ∈ [0,1]: 1 − total-variation distance between
    * the observed and expected first-digit distributions. */
  def conformity(df: DataFrame, column: String): Double = {
    val obs = distribution(df, column).collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Double]("share")).toMap
    val tv = (1 to 9).map { d =>
      math.abs(obs.getOrElse(d, 0.0) - expected(d))
    }.sum / 2.0
    1.0 - tv
  }
}
