package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("leakage-safe split: partitions the corpus and NO near-dup pair " +
    "crosses splits") {
    val a = Split.assigned(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(a.count() == nDocs, "every doc gets exactly one assignment")
    assert(a.select("split").distinct().count() >= 2, "degenerate split")
    // the structural guarantee: verified near-dup pairs never cross
    val pairs = graft.dedup.Dedup.minhashPairs(spark, TestSpark.sf)
    val crossing = pairs
      .join(a.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
      .join(a.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
      .filter(col("s1") =!= col("s2")).count()
    assert(crossing == 0, s"$crossing near-dup pairs cross splits")
    // report consistency
    val rep = Split.splitHoldout(spark, TestSpark.sf).collect()
    assert(rep.map(_.getLong(1)).sum == nDocs)
    a.unpersist()
  }
}
