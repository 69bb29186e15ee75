package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class SampleExactNSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("exact-N sample: exactly N rows, the hash-min rows, heap plan") {
    val r = Sampling.sampleExactN(spark, TestSpark.sf).cache()
    assert(r.count() == Sampling.ExactN)
    // ranks are 1..N with no gaps
    assert(r.agg(min("rank"), max("rank"), countDistinct("rank")).head.toSeq
      == Seq(1, Sampling.ExactN, Sampling.ExactN.toLong))
    // the sampled set is EXACTLY the N smallest hashes corpus-wide
    // (driver recompute via the JVM mirror of pHash)
    val all = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => (graft.core.PortableHash.pHashJvm(s"exact$id"), id))
      .sorted.take(Sampling.ExactN).map(_._2).toSet
    val got = r.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == all)
    // a hash-ordered sample is uniform: it must cross strata
    assert(r.select("lang").distinct().count() > 1)
    assert(r.select("source").distinct().count() > 1)
    // plan shape: per-partition top-N heaps (TakeOrderedAndProject),
    // not a global sort of the corpus
    // (the only sort in the plan is the post-limit 100-row window sort)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
