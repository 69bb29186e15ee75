package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #323: additive schema evolution — the merged read's semantics, not
  * just the audit: old files plan the unified schema with NULL
  * backfill, new files carry real values, and the unified row set is
  * exactly the union of the snapshots.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("audit equals the snapshot recompute; the merged read backfills " +
      "NULL for pre-evolution files only") {
    val orders = graft.core.Tables.orders(spark, TestSpark.sf)
      .selectExpr("o_orderkey", "o_totalprice", "o_orderpriority",
        "CAST(o_orderdate AS STRING) AS od")
      .as[(Long, Double, String, String)].collect()
    val cut = SchemaEvolution.Cutoff.take(10)
    val (v1, v2) = orders.partition(_._4 < cut)
    def cents(rs: Array[(Long, Double, String, String)]): Long =
      rs.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum

    val got = SchemaEvolution.evolutionAudit(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((v1.length.toLong, v1.length.toLong, 0L, cents(v1))),
      "snapshot 1: every row NULL-backfilled, zero distinct priorities")
    assert(got(2L) == ((v2.length.toLong, 0L,
      v2.map(_._3).distinct.length.toLong, cents(v2))),
      "snapshot 2: no backfill, real priorities")
    assert(v1.nonEmpty && v2.nonEmpty, "both snapshots must be non-trivial")
  }
}
