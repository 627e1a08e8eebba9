package graft.queries

import graft.ops.FixedPoint
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic floating-point aggregation helpers for the gate
  * queries — thin wrappers over [[graft.ops.FixedPoint]] at the
  * money-column scale (4 decimal digits: 2-decimal values and their
  * pairwise products).
  *
  * The driver's correctness gate hash-compares our parquet output
  * against DuckDB running the oracle SQL. A plain `sum(double)` is
  * order-dependent (Spark's partial aggregation vs DuckDB's single
  * thread accumulate in different orders), so the bits can differ;
  * FixedPoint sums are exact integer arithmetic with the identical
  * normalization on both engines. Every helper has a `...Sql` twin.
  */
object Exact {
  val P = 18 // decimal precision for dround's row-level cast
  val S = 4  // fixed-point scale: 4 decimal digits survive the round-trip

  /** Exact sum of a fixed-point double expression, returned as double. */
  def dsum(c: Column): Column = FixedPoint.fsum(c, S)
  def dsumSql(e: String): String = FixedPoint.fsumSql(e, S)

  /** Exact mean: exact sum divided by count, both deterministic. */
  def davg(c: Column): Column = FixedPoint.favg(c, S)
  def davgSql(e: String): String = FixedPoint.favgSql(e, S)

  /** Round a double to `S` decimals deterministically via decimal. */
  def dround(c: Column): Column = c.cast(DecimalType(P, S)).cast(DoubleType)
  def droundSql(e: String): String = s"CAST(CAST($e AS DECIMAL($P,$S)) AS DOUBLE)"
}
