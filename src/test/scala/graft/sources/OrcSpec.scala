package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OrcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ORC roundtrip: predicate pushed into the ORC scan, exact rows") {
    val df = Orc.roundtrip(spark, TestSpark.sf).cache()
    val plan = df.queryExecution.executedPlan.toString
    // the n_chars range must reach the ORC reader as pushed filters
    // (stripe/row-group min-max skipping), not run only post-scan
    assert(plan.contains("PushedFilters") &&
      plan.split("PushedFilters", 2)(1).takeWhile(_ != ']')
        .contains("n_chars"),
      s"n_chars filter not pushed into the ORC scan:\n$plan")
    val want = graft.core.Tables.documents(spark, TestSpark.sf)
      .filter(col("n_chars") >= Orc.LoChars && col("n_chars") <= Orc.HiChars)
      .select("doc_id", "lang", "n_chars", "source", "text")
    assert(want.count() > 0)
    assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty,
      "ORC roundtrip lost or invented rows")
    df.unpersist()
  }
}
