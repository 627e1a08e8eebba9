package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact, order-independent sums of fixed-point doubles in pure Long
  * arithmetic — the cheap alternative to Decimal sums for money-style
  * columns (a Decimal sum costs 10-50× a Long sum per row: BigDecimal
  * or compact-Decimal accumulator, per-row allocation, overflow
  * checks; measured in round 5 at sf1, see RESULTS_SF1.md).
  *
  * Normalization: q = floor(e·10^decimals + 0.5) — when the true value
  * of `e` has at most `decimals` decimal digits, q is its exact scaled
  * integer (the double noise is orders of magnitude below 0.5), and
  * any engine running the same IEEE multiply/add/floor computes the
  * identical q, which is what makes these kernels oracle-parity-safe:
  * the SQL twins emit the IDENTICAL arithmetic.
  *
  * Overflow: q itself must stay below 2^53 (exact double range —
  * |e| < 2^53 / 10^decimals). A direct Long SUM of q would overflow at
  * extreme row counts, so q is split into base-`base` (hi, lo) digits
  * summed separately and recombined in Decimal on the aggregated
  * O(#groups) frame. Bounds per aggregation group:
  * n·base ≲ 9.2·10^18 and n·(q_max/base) ≲ 9.2·10^18 — with the
  * default base 10^6 and |q| ≤ 10^9 that is ~10^12 rows per group. */
object FixedPoint {

  private val DefaultBase = 1000000L

  private def q(e: Column, scale: Long): Column =
    floor(e * scale + lit(0.5)).cast("long")
  private def qSql(e: String, scale: Long): String =
    s"CAST(FLOOR(($e) * $scale + 0.5) AS BIGINT)"

  /** Exact sum of `e` (≤ `decimals` true decimal digits), as double. */
  def fsum(e: Column, decimals: Int, base: Long = DefaultBase): Column = {
    val scale = math.pow(10, decimals).toLong
    val qe = q(e, scale)
    val lo = qe % base
    val hi = ((qe - lo) / base).cast("long") // exact: q < 2^53, multiple of base
    (sum(hi).cast(DecimalType(38, 0)) * base + sum(lo)).cast(DoubleType) / scale
  }

  /** DuckDB twin of [[fsum]] — identical arithmetic (DuckDB's BIGINT
    * sums are HUGEINT-exact, so the hi/lo split is redundant there but
    * kept so both engines round the same values at the same points). */
  def fsumSql(e: String, decimals: Int, base: Long = DefaultBase): String = {
    val scale = math.pow(10, decimals).toLong
    val lo = s"${qSql(e, scale)} % $base"
    val hi = s"CAST((${qSql(e, scale)} - ${qSql(e, scale)} % $base) / $base AS BIGINT)"
    s"(CAST(SUM($hi) * $base + SUM($lo) AS DOUBLE) / $scale)"
  }

  /** Exact mean of `e`: [[fsum]] / count, both order-independent. */
  def favg(e: Column, decimals: Int, base: Long = DefaultBase): Column =
    fsum(e, decimals, base) / count(e)
  def favgSql(e: String, decimals: Int, base: Long = DefaultBase): String =
    s"(${fsumSql(e, decimals, base)} / COUNT($e))"
}
