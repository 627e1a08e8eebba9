package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end error-bound certification of the sketch ("100 TB")
  * configuration against exact ground truth computed in the same job —
  * the check a production profile run ships alongside its numbers.
  *
  * Percentiles: `percentile_approx` carries the Greenwald-Khanna
  * guarantee that the returned value's RANK is within ε·n of the
  * target (ε = 1/accuracy). The value-space error is unbounded (a
  * heavy-tailed column can put huge value gaps between adjacent
  * ranks), so the certificate checks rank coverage: the returned
  * value v occupies the rank interval [count(x<v), count(x≤v)−1],
  * which must intersect [p·n − εn − 3, p·n + εn + 3]. The ±3 absolute
  * slack absorbs the p·n vs p·(n−1) index conventions (measured: the
  * implementation lands a systematic 2 ranks below p·n on exact-hit
  * targets); it is negligible against εn at any production n but
  * necessary for the bound to be checkable at small n. Both counts
  * are exact conditional sums — partially aggregable, no sort.
  *
  * Distincts: `approx_count_distinct` (HyperLogLog++) has standard
  * error rsd; the certificate allows 4σ plus a small absolute slack —
  * deterministic for fixed data (the HLL hash is seedless), so the
  * booleans are stable gate output, and a bound violation flips a row
  * to false and fails the hash compare loudly.
  *
  * The exact sides of both checks are themselves oracled elsewhere
  * (p2 exact percentiles, p1 distinct counts), so a green certificate
  * ties the sketch path to DuckDB ground truth transitively. */
object SketchBounds {

  /** One row (column, metric, ok) per requested column × percentile:
    * ok = the GK rank guarantee held for `percentile_approx` at
    * `accuracy` against exact rank counts. Two scans (sketch, then
    * conditional counts against the broadcast 1-row sketch result),
    * zero driver data. */
  def percentileRankCheck(df: DataFrame, cols: Seq[String],
      ps: Seq[(String, Double)], accuracy: Int = 10000): DataFrame = {
    val apAggs = cols.map(c => percentile_approx(col(s"`$c`").cast("double"),
      array(ps.map(p => lit(p._2)): _*), lit(accuracy)).as(s"__ap_$c"))
    val ap = df.agg(apAggs.head, apAggs.tail: _*)
    val j = df.crossJoin(broadcast(ap))
    val cAggs = cols.flatMap { c =>
      val x = col(s"`$c`").cast("double")
      count(x).as(s"__n_$c") +: ps.indices.flatMap { i =>
        val v = col(s"__ap_$c").getItem(i)
        Seq(coalesce(sum(when(x < v, 1L)), lit(0L)).as(s"__lt_${c}_$i"),
          coalesce(sum(when(x <= v, 1L)), lit(0L)).as(s"__le_${c}_$i"))
      }
    }
    val agg = j.agg(cAggs.head, cAggs.tail: _*)
    val eps = 1.0 / accuracy
    val rows = cols.flatMap { c =>
      ps.zipWithIndex.map { case ((pname, p), i) =>
        val n = col(s"__n_$c").cast("double")
        val lo = lit(p) * n - lit(eps) * n - 3
        val hi = lit(p) * n + lit(eps) * n + 3
        struct(lit(c).as("column"), lit(pname).as("metric"),
          (col(s"__lt_${c}_$i").cast("double") <= hi &&
            col(s"__le_${c}_$i").cast("double") - 1 >= lo).as("ok"))
      }
    }
    agg.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** One row (column, metric=distinct, ok) per column: ok =
    * `approx_count_distinct` at relative standard deviation `rsd` is
    * within `sigmas`·rsd of the exact distinct count (+`slack`
    * absolute, for tiny cardinalities where the ratio bound is
    * meaningless).
    *
    * Shape: one aggregation subtree PER COLUMN, unioned. Putting all
    * k exact `count_distinct`s in a single agg makes Catalyst rewrite
    * through Expand — k+1 replicas of every input row — and mixing
    * the HLL aggs into the same agg then drags the sketch buffers
    * through that multiplied stream (measured 3.5× slower at sf1).
    * Per-column subtrees each read one parquet column (pruned scan:
    * same total I/O as one wide scan), keep the two-phase partial
    * agg, and parallelize across the union — linear at 100 TB. */
  def distinctCheck(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
      sigmas: Double = 4.0, slack: Long = 8): DataFrame = {
    val perCol = cols.map { c =>
      df.select(col(s"`$c`").as("__v"))
        .agg(approx_count_distinct(col("__v"), rsd).as("__a"),
          count_distinct(col("__v")).as("__e"))
        .select(lit(c).as("column"), lit("distinct").as("metric"),
          (abs(col("__a").cast("double") - col("__e").cast("double")) <=
            lit(sigmas * rsd) * col("__e").cast("double") +
            lit(slack.toDouble)).as("ok"))
    }
    perCol.reduce(_ unionAll _)
  }
}
