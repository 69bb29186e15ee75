package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash pairs all have jaccard >= tau and d1 < d2") {
    val pairs = Dedup.minhashPairs(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "planted near-dups should surface")
    pairs.foreach { case (d1, d2, j) =>
      assert(d1 < d2)
      assert(j >= Dedup.JaccardTau && j <= 1.0)
    }
  }

  test("simhash: near-dup pairs have hamming <= max, and are symmetric-free") {
    val pairs = Dedup.simhash(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (d1, d2, h) =>
      assert(d1 < d2); assert(h >= 0 && h <= Dedup.HammingMax)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("exact dedup partitions all docs") {
    val out = Dedup.exact(spark, TestSpark.sf)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0)
    assert(total == graft.core.Tables.documents(spark, TestSpark.sf).count())
  }

  test("ngram jaccard finds the planted within-source near-dups") {
    val pairs = Dedup.ngramJaccard(spark, TestSpark.sf)
      .select("jaccard").as[Double].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(j => j >= Dedup.NgramTau && j <= 1.0))
  }
}
