package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic floating-point aggregation helpers.
  *
  * The driver's correctness gate hash-compares our parquet output
  * against DuckDB running the oracle SQL. A plain `sum(double)` is
  * order-dependent (Spark's partial aggregation vs DuckDB's single
  * thread accumulate in different orders), so the bits can differ.
  *
  * The inputs these helpers aggregate are fixed-point (money-style)
  * doubles: at most [[S]] true decimal digits. Each value is
  * normalized to the exact integer `q = floor(x·10^S + 0.5)` — the
  * true scaled value is an integer and the double noise is orders of
  * magnitude below 0.5, and both engines run the identical IEEE
  * multiply/floor, so the normalization is engine-identical. Integer
  * sums are exact and order-independent; the result is rescaled to
  * double once, at the end, identically on both sides.
  *
  * A Long SUM of q can overflow at extreme row counts, so q is split
  * into base-10^6 (hi, lo) digits summed separately and recombined in
  * Decimal on the O(#groups) aggregated frame: for |x| < 10^8 the
  * split sums stay inside Long up to ~10^12 rows PER GROUP, and the
  * two extra Long aggregates are still ~10× cheaper than one
  * Decimal(18,4) sum (measured at sf1: q1's aggregate 10.7s → 0.9s).
  *
  * Every helper has a `...Sql` twin emitting DuckDB SQL with the
  * IDENTICAL arithmetic (DuckDB's BIGINT sums are HUGEINT-exact, so
  * the split is redundant there but kept so both engines round the
  * same values at the same points).
  */
object Exact {
  val P = 18 // decimal precision for dround's row-level cast
  val S = 4  // fixed-point scale: 4 decimal digits survive the round-trip
  private val Scale = 10000L   // 10^S
  private val Base = 1000000L  // hi/lo split of the scaled integers

  private def q(c: Column): Column = floor(c * Scale + lit(0.5)).cast("long")
  private def qSql(e: String): String = s"CAST(FLOOR(($e) * 10000 + 0.5) AS BIGINT)"

  /** Exact sum of a fixed-point double expression, returned as double. */
  def dsum(c: Column): Column = {
    val lo = q(c) % Base
    val hi = ((q(c) - lo) / Base).cast("long") // exact: q < 2^53, multiple of Base
    (sum(hi).cast(DecimalType(38, 0)) * Base + sum(lo)).cast(DoubleType) / Scale
  }
  def dsumSql(e: String): String = {
    val lo = s"${qSql(e)} % 1000000"
    val hi = s"CAST((${qSql(e)} - ${qSql(e)} % 1000000) / 1000000 AS BIGINT)"
    s"(CAST(SUM($hi) * 1000000 + SUM($lo) AS DOUBLE) / 10000)"
  }

  /** Exact mean: exact sum divided by count, both deterministic. */
  def davg(c: Column): Column = dsum(c) / count(c)
  def davgSql(e: String): String = s"(${dsumSql(e)} / COUNT($e))"

  /** Round a double to `S` decimals deterministically via decimal. */
  def dround(c: Column): Column = c.cast(DecimalType(P, S)).cast(DoubleType)
  def droundSql(e: String): String = s"CAST(CAST($e AS DECIMAL($P,$S)) AS DOUBLE)"
}
