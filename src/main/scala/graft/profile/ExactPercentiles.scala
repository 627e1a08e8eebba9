package graft.profile

import org.apache.spark.sql.DataFrame
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

  /** Default kernel: the sketch-bracketed exact path — every stage is a
    * partially-aggregable groupBy, so it parallelizes within a group
    * (the window kernel serializes each group into one task). */
  def byGroups(long: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    byGroupsSketched(long, groupCols, valueCol, ps)

  /** Exact percentiles with NO per-group sort anywhere — the 100 TB
    * path. A `percentile_approx` sketch (rank error ≤ n/accuracy,
    * Greenwald-Khanna guarantee) brackets each target percentile p with
    * values at p±4/accuracy; the exact answer's order statistics are
    * then guaranteed to lie inside the bracket. One more pass computes,
    * per group: the exact count below the bracket (a plain conditional
    * sum) and the in-bracket value histogram (collect_list bounded to
    * ~8n/accuracy rows by the sketch guarantee, duplicates collapsed by
    * the histogram grouping first). The bracketing order statistics for
    * rank p·(n−1) are then read off the sorted candidate histogram by a
    * cumulative-walk `aggregate` expression — exact interpolation,
    * identical math to the window kernel, but every aggregation
    * partial-combines map-side: a single group spread over 1000
    * executors does 1/1000 of the work on each, where the window kernel
    * would sort the whole group on one.
    *
    * Brackets only select candidates — the result is exact no matter
    * how the sketch merges, so percentile_approx's partition-order
    * sensitivity cannot leak into the output. Coverage failure (a
    * bracket narrower than the guarantee promises) would surface as a
    * NULL percentile, not a wrong value; the parity spec cross-checks
    * against the window kernel on adversarial distributions. */
  def byGroupsSketched(long: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)],
      accuracy: Int = 1000): DataFrame = {
    import org.apache.spark.sql.Column
    val x0 = col(s"`$valueCol`").cast(DoubleType)
    val gs = groupCols.map(g => col(s"`$g`"))
    val present = long.filter(x0.isNotNull).select(gs :+ x0.as("__x"): _*)
    val delta = 4.0 / accuracy
    val brackets: Seq[Column] =
      count(lit(1)).as("__na") +: ps.zipWithIndex.map { case ((_, p), i) =>
        percentile_approx(col("__x"),
          array(lit(math.max(0.0, p - delta)), lit(math.min(1.0, p + delta))),
          lit(accuracy)).as(s"__b_$i")
      }
    val sketch = present.groupBy(gs: _*).agg(brackets.head, brackets.tail: _*)
    val hist = present.groupBy(gs :+ col("__x"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val joined = hist.join(broadcast(sketch), groupCols)
    // Small groups (n < 2·accuracy) take the whole histogram as
    // candidates: below that size the sketch's rank margin (3εn) can
    // undershoot the ≤2-rank slack between p·n and the floor/ceil
    // order statistics of p·(n−1), and "whole histogram" is ≤ 2·accuracy
    // rows — trivially collectable. Large groups keep the bracket,
    // whose margin 3εn ≥ 6 ranks then provably covers.
    val small = col("__na") < lit(2L * accuracy)
    val bAggs: Seq[Column] =
      sum("__cnt").cast(DoubleType).as("__n") +: ps.indices.toSeq.flatMap { i =>
        Seq(
          coalesce(sum(when(!small && col("__x") < col(s"__b_$i").getItem(0),
            col("__cnt"))), lit(0L)).as(s"__below_$i"),
          array_sort(collect_list(when(
            small || (col("__x") >= col(s"__b_$i").getItem(0) &&
              col("__x") <= col(s"__b_$i").getItem(1)),
            struct(col("__x").as("x"), col("__cnt").as("cnt")))))
            .as(s"__cand_$i"))
      }
    val b = joined.groupBy(gs: _*).agg(bAggs.head, bAggs.tail: _*)
    // cumulative walk over the sorted candidate histogram: carry
    // (cum rank, bracketing lo/hi once their rank interval is hit)
    val outCols = gs ++ ps.zipWithIndex.map { case ((name, p), i) =>
      val target = lit(p) * (col("__n") - 1)
      val loRank = floor(target)
      val hiRank = ceil(target)
      def pick(rank: Column, field: String, acc: Column, e: Column): Column =
        when(acc.getField(field).isNull && rank >= acc.getField("cum") &&
          rank < acc.getField("cum") + e.getField("cnt"), e.getField("x"))
          .otherwise(acc.getField(field))
      aggregate(
        col(s"__cand_$i"),
        struct(col(s"__below_$i").cast("bigint").as("cum"),
          lit(null).cast(DoubleType).as("lo"),
          lit(null).cast(DoubleType).as("hi")),
        (acc, e) => struct(
          (acc.getField("cum") + e.getField("cnt")).as("cum"),
          pick(loRank, "lo", acc, e).as("lo"),
          pick(hiRank, "hi", acc, e).as("hi")),
        acc => acc.getField("lo") +
          (acc.getField("hi") - acc.getField("lo")) * (target - loRank))
        .as(name)
    }
    b.select(outCols: _*)
  }

}
