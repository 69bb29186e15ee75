package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing shared by the Spark operators and the
  * DuckDB oracle SQL.
  *
  * `pHash(x)` = the first 15 hex chars (60 bits) of md5(x) as a
  * non-negative BIGINT. Both engines compute md5 over the UTF-8 bytes of
  * the same string, so the value is engine-independent. All
  * pseudo-randomness in graft (embedding init, negative sampling, LSH
  * hyperplanes, MinHash permutations) derives from it, which is what makes
  * every operator reproducible AND oracle-checkable.
  *
  * Derived "random" reals are dyadic rationals (denominator 128): doubles
  * represent them exactly, so +/× stay exact and sums are
  * order-independent — no floating-point tolerance needed anywhere.
  */
object PortableHash {

  /** 60-bit non-negative hash of a string column. */
  def pHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Dyadic uniform value in [-100/128, 100/128] from a seed string. */
  def dyadic(seed: Column): Column =
    ((pHash(seed) % 201) - 100).cast("double") / 128.0

  /** Driver-side JVM mirror of [[pHash]] (same md5 → same value); used
    * where an operator needs hash-derived CONSTANTS (MinHash permutation
    * coefficients, RESCAL core init) without paying per-row md5.
    */
  def pHashJvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Driver-side JVM mirror of [[dyadic]]. */
  def dyadicJvm(s: String): Double =
    ((pHashJvm(s) % 201) - 100).toDouble / 128.0

  /** DuckDB SQL fragment equivalent to [[pHash]] of `expr`. */
  def duck(expr: String): String =
    s"(('0x' || substring(md5($expr), 1, 15))::BIGINT)"

  /** DuckDB SQL fragment equivalent to [[dyadic]] of `expr`. */
  def duckDyadic(expr: String): String =
    s"((${duck(expr)} % 201 - 100) / 128.0)"
}
