package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #334 int8 serving recall: shape and bounds (values are hash-pinned by
  * the DuckDB oracle; this spec pins the contract a reader relies on).
  */
class SqRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    Ann.sqRecall(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("one row per query vector, recall = n_hits/K within [0,1]") {
    val nq = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("vec_id")
        % Ann.QueryMod === 0).count()
    assert(rows.size == nq && nq > 0)
    rows.foreach { case (q, (hits, recall)) =>
      assert(hits >= 0 && hits <= Ann.K, s"q$q hits $hits out of range")
      assert(recall == hits.toDouble / Ann.K, s"q$q recall mismatch")
    }
  }

  test("int8 on 64-dim unit vectors barely loses: mean recall ≥ 0.8") {
    val mean = rows.values.map(_._2).sum / rows.size
    assert(mean >= 0.8, s"mean int8 recall $mean below the expected band")
  }
}
