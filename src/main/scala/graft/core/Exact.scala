package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine EXACT aggregation helpers.
  *
  * Summing doubles is order-dependent, and Spark and DuckDB will not in
  * general reduce partial aggregates in the same order — so a plain
  * `sum(double)` can differ in the last ulp and fail the driver's
  * hash-compare. The fix used throughout graft: cast every term to a
  * DECIMAL (exact, order-independent sum), aggregate, cast back to double.
  * The double→decimal rounding itself is deterministic and identical in
  * both engines because an IEEE double can never be an exact midpoint of
  * two decimals at scale ≥ 1 decimal digit beyond the dyadic denominator
  * (10^-k is not dyadic for k>0), so "round to nearest" never ties.
  */
object Exact {

  /** Order-independent sum of a double column, exact to `scale` decimals. */
  def decSum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** DuckDB fragment equivalent to [[decSum]]. */
  def duckSum(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** Order-independent mean (decimal sum / count), exact division both engines. */
  def decAvg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(28, scale))).cast("double") / count(lit(1)))

  def duckAvg(expr: String, scale: Int = 6): String =
    s"(${duckSum(expr, scale)} / COUNT(*))"
}
