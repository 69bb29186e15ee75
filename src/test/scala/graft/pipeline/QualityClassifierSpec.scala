package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The LR step's values are pinned by the oracle; here we assert the
  * step is a REAL gradient step: it descends the logistic loss, and the
  * bias gradient is exactly the mean error.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("one GD step decreases the logistic loss") {
    val step = QualityClassifier.trainStep(spark, TestSpark.sf)
      .orderBy("j").collect()
    assert(step.length == 5)
    val wNew = step.map(_.getDouble(4)).toSeq
    val before = QualityClassifier.logLoss(spark, TestSpark.sf,
      QualityClassifier.W0)
    val after = QualityClassifier.logLoss(spark, TestSpark.sf, wNew)
    assert(after < before, s"loss did not descend: $before -> $after")
  }

  test("labels are non-degenerate and the bias gradient is the mean error") {
    val feats = QualityClassifier.features(spark, TestSpark.sf).cache()
    val n = feats.count()
    val pos = feats.filter(col("q") >= QualityClassifier.Thresh).count()
    assert(pos > n / 10 && pos < n * 9 / 10,
      s"degenerate labels: $pos of $n positive")
    // j=0 has x0 = 1, so grad_0 = mean(err) ∈ (−1, 1), and every
    // feature gradient is bounded by it in magnitude ≤ max|x| = 1
    val g = QualityClassifier.trainStep(spark, TestSpark.sf)
      .orderBy("j").collect()
    assert(g.forall(r => math.abs(r.getDouble(3)) < 1.0))
    assert(g.forall(_.getLong(1) == n))
    feats.unpersist()
  }
}
