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
  * Instead: round each row-level value into an exact decimal, sum
  * decimals (exact integer arithmetic in both engines), then cast the
  * final result back to double. Both engines perform the identical
  * rounding at the same two points, so results are bit-identical.
  *
  * Every helper has a `...Sql` twin emitting the equivalent DuckDB SQL.
  */
object Exact {
  val P = 18 // decimal precision for row-level casts
  val S = 4  // decimal scale: 4 decimal places survive the round-trip

  /** Exact sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(P, S))).cast(DoubleType)
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL($P,$S))) AS DOUBLE)"

  /** Exact mean: decimal sum divided by count, both deterministic. */
  def davg(c: Column): Column = dsum(c) / count(c)
  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT($e)"

  /** Round a double to `S` decimals deterministically via decimal. */
  def dround(c: Column): Column = c.cast(DecimalType(P, S)).cast(DoubleType)
  def droundSql(e: String): String = s"CAST(CAST($e AS DECIMAL($P,$S)) AS DOUBLE)"
}
