package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine EXACT aggregation/rounding helpers.
  *
  * Summing doubles is order-dependent, and Spark and DuckDB will not in
  * general reduce partial aggregates in the same order — so a plain
  * `sum(double)` can differ in the last ulp and fail the driver's
  * hash-compare.
  *
  * The strategy (round 4, replacing the DECIMAL-cast detour): quantize in
  * the SCALED-DOUBLE domain — `q(x) = floor(x·10^s + 0.5)` — and sum the
  * resulting integral doubles as BIGINT (exact, order-independent),
  * dividing back once at the end. Every step (multiply by an
  * exactly-representable power of ten, add 0.5, floor, integer sum, one
  * final division) is a correctly-rounded IEEE operation evaluated
  * identically by any engine, so the result is bit-identical by
  * CONSTRUCTION — no decimal types, no string round-trips.
  *
  * Why not decimal casts: Spark's double→decimal rounds the SHORTEST
  * DECIMAL REPRESENTATION half-up (`BigDecimal.valueOf`), DuckDB's
  * direct cast scales in double arithmetic, and DuckDB's VARCHAR→DECIMAL
  * parse mis-rounds scientific-notation strings (any |x| < 1e-4 with
  * mantissa ≥ 5 bumps the last decimal place: '6.5e-06' → DECIMAL(28,4)
  * gives 0.0001). Three engines' worth of rounding conventions, all
  * subtly different — measured flipping sums at sf0.1. The scaled-double
  * formulation has exactly one convention, defined by IEEE 754.
  *
  * Domain: |x|·10^s must stay below 2^53 (exact integral doubles) and
  * group sums below 2^63 — i.e. |x| < ~9e3 at s = 12 and |x| < ~9e9 at
  * s = 6. Callers must bound their inputs accordingly: quantities that
  * grow with corpus size (counts, raw idf) are normalized to O(1)
  * before a scale-12 sum (see [[graft.text.Relevance.bm25Search]]) or
  * summed at scale ≤ 6.
  */
object Exact {

  private def p10(s: Int): Double = math.pow(10, s) // exact for s ≤ 22

  /** Half-up quantization to `s` decimals, in the scaled-double domain —
    * identical in every IEEE-conformant engine.
    */
  def roundS(c: Column, scale: Int = 6): Column =
    floor(c * p10(scale) + 0.5) / p10(scale)

  /** DuckDB fragment equivalent to [[roundS]]. */
  def duckRoundS(expr: String, scale: Int = 6): String =
    s"(floor(($expr) * ${p10(scale)} + 0.5) / ${p10(scale)})"

  /** Order-independent sum of a double column, exact to `scale` decimals. */
  def decSum(c: Column, scale: Int = 6): Column =
    sum(floor(c * p10(scale) + 0.5).cast("long")).cast("double") / p10(scale)

  /** DuckDB fragment equivalent to [[decSum]]. */
  def duckSum(expr: String, scale: Int = 6): String =
    s"(CAST(SUM(CAST(floor(($expr) * ${p10(scale)} + 0.5) AS BIGINT)) AS DOUBLE) / ${p10(scale)})"

  /** [[decSum]] with a DECIMAL(38,0) accumulator — for group sums whose
    * SCALED magnitude can exceed int64 (found at the 10× bench: hits'
    * first-round L1 norm is ~edges·10^12, price-elasticity's Σxy is
    * ~rows·1.4e14 — both threw ANSI ARITHMETIC_OVERFLOW at sf1).
    * Value-identical to [[decSum]] wherever that one is defined (the
    * sum is the same exact integer; the one double cast at the end is
    * correctly rounded in both engines), and exact to ~1e38 beyond.
    * The DuckDB mirror is [[duckSum]] UNCHANGED: DuckDB's SUM(BIGINT)
    * already accumulates as HUGEINT. Costs a decimal aggregate — use
    * on norm/moment sums that scale with the corpus, not on hot
    * revenue paths with bounded group budgets.
    */
  def decSumWide(c: Column, scale: Int = 6): Column =
    sum(floor(c * p10(scale) + 0.5).cast("decimal(38,0)"))
      .cast("double") / p10(scale)

  /** Order-independent mean (scaled-integer sum / count). */
  def decAvg(c: Column, scale: Int = 6): Column =
    decSum(c, scale) / count(lit(1))

  def duckAvg(expr: String, scale: Int = 6): String =
    s"(${duckSum(expr, scale)} / COUNT(*))"
}
