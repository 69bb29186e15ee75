package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class LangIdEvalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("per-language eval table: partitions the corpus both ways, micro " +
    "accuracy matches the per-doc flags, bounds hold") {
    val r = TextAnalysis.langIdEval(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    // confusion-mass conservation: true and predicted marginals both
    // partition the corpus
    val sums = r.agg(sum("n_true"), sum("n_pred"), sum("tp")).head
    assert(sums.getLong(0) == nDocs && sums.getLong(1) == nDocs)
    // micro accuracy == the #31 per-doc correct rate
    val correct = TextAnalysis.langId(spark, TestSpark.sf)
      .agg(sum("correct")).head.getLong(0)
    assert(sums.getLong(2) == correct)
    // bounds and F1 consistency
    assert(r.filter(col("precision") < 0 || col("precision") > 1 ||
      col("recall") < 0 || col("recall") > 1 ||
      col("f1") < 0 || col("f1") > 1).isEmpty)
    assert(r.filter(col("tp") > col("n_true") || col("tp") > col("n_pred")).isEmpty)
    assert(r.filter(col("tp") === 0 && col("f1") =!= 0.0).isEmpty)
    r.unpersist()
  }
}
