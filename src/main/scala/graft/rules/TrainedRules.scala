package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Threshold training from clean data (SURVEY.md §2.4 A18; reference:
  * rules/train_clean_rules.py:46-103 — 5th/95th percentile bands plus
  * mean/std per feature over clean columns).
  *
  * `exact = true` uses exact interpolated percentiles (oracle-
  * comparable, one ObjectHashAggregate job); at 100 TB use the
  * percentile_approx sketch path. Mean/std go through exact decimal
  * sums so the fitted thresholds are bit-deterministic under any
  * partitioning.
  */
object TrainedRules {

  /** Exact interpolated percentiles via the shared sketch-bracketed
    * kernel: unpivot to (column, x), delegate to
    * [[graft.profile.ExactPercentiles]]. The unpivot puts exactly one
    * row per source row in each column group, so the table row count
    * IS the per-group bound — passing it lets the kernel skip its
    * eager screen jobs and keep the whole state lazy (measured ~0.5 s
    * of control-plane jobs on the r6/r7 gate queries at sf0.1). */
  private def sortedPercentiles(df: DataFrame, cols: Seq[String],
      ps: Seq[(String, Double)]): DataFrame = {
    val entries = cols.map(c =>
      struct(lit(c).as("column"), col(s"`$c`").cast(DoubleType).as("x")))
    val long = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.column").as("column"), col("e.x").as("x"))
    graft.profile.ExactPercentiles.byGroup(long, "column", "x", ps,
      maxGroupRows = Some(graft.profile.Profiler.cheapCount(df)))
  }

  /** One row per column: (column, p05, p95, mean, std).
    *
    * `fixedPointDecimals = Some(d)` declares every trained column
    * fixed-point with ≤ d true decimal digits (money-style): the
    * moment sums then run in exact Long arithmetic
    * ([[graft.ops.FixedPoint]], ~10× the Decimal sums' throughput —
    * squares carry 2d digits, so d must satisfy
    * max(x²)·10^2d < 2^53). Default keeps the general Decimal path
    * for arbitrary doubles. */
  def thresholdBands(df: DataFrame, cols: Seq[String],
      lo: Double = 0.05, hi: Double = 0.95, exact: Boolean = true,
      fixedPointDecimals: Option[Int] = None): DataFrame = {
    val perCol = cols.map { c =>
      val d = col(s"`$c`").cast(DoubleType)
      val (mean, m2) = fixedPointDecimals match {
        case Some(dec) =>
          (graft.ops.FixedPoint.favg(d, dec),
            // squares: 2·dec true digits, wider hi/lo base for the
            // larger scaled magnitudes
            graft.ops.FixedPoint.fsum(d * d, 2 * dec, base = 1000000000L) / count(d))
        case None =>
          (sum(d.cast(DecimalType(30, 6))).cast(DoubleType) / count(d),
            sum((d * d).cast(DecimalType(38, 6))).cast(DoubleType) / count(d))
      }
      struct(lit(c).as("column"), mean.as("mean"),
        sqrt(m2 - mean * mean).as("std"))
    }
    val moments = df.agg(perCol.head.as("b0"), perCol.tail.zipWithIndex.map {
        case (c, i) => c.as(s"b${i + 1}")
      }: _*)
      .select(explode(array((0 until cols.size).map(i => col(s"b$i")): _*)).as("b"))
      .select("b.*")
    moments.join(percentileBands(df, cols, lo, hi, exact), "column")
      .select("column", "p05", "p95", "mean", "std")
  }

  /** Just the (column, p05, p95) percentile band — what rule fitting
    * consumes. Split out so [[fitAndScan]] skips the moments pass. */
  def percentileBands(df: DataFrame, cols: Seq[String], lo: Double = 0.05,
      hi: Double = 0.95, exact: Boolean = true): DataFrame =
    if (exact) sortedPercentiles(df, cols, Seq("p05" -> lo, "p95" -> hi))
    else {
      val entries = cols.map(c =>
        struct(lit(c).as("column"), col(s"`$c`").cast(DoubleType).as("x")))
      df.select(explode(array(entries: _*)).as("e"))
        .select(col("e.column").as("column"), col("e.x").as("x"))
        .groupBy("column")
        .agg(percentile_approx(col("x"), array(lit(lo), lit(hi)), lit(10000))
          .as("p"))
        .select(col("column"), col("p").getItem(0).as("p05"),
          col("p").getItem(1).as("p95"))
    }

  /** Collect fitted bands into RangeRules ([p05, p95] with optional
    * slack widening — transferred rules are more permissive,
    * reference's adaptation behavior). */
  def bandRules(bands: DataFrame, slack: Double = 0.0): Seq[RangeRule] =
    bands.collect().toSeq.map { r =>
      val lo = r.getAs[Double]("p05")
      val hi = r.getAs[Double]("p95")
      val w = (hi - lo) * slack
      RangeRule(r.getAs[String]("column"), lo - w, hi + w, "warning")
    }

  /** Train bands on `clean`, scan `target` for out-of-band cells —
    * the reference's trained-rule detection end to end. */
  def fitAndScan(clean: DataFrame, target: DataFrame, table: String,
      cols: Seq[String], keyCol: String, exact: Boolean = true): DataFrame = {
    // fit reads only the percentile band — the moments pass of
    // thresholdBands would be a wasted full-table aggregation here
    val rules = bandRules(percentileBands(clean, cols, exact = exact))
    ViolationScanner.scan(target, table, rules, keyCol)
  }
}
