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

  test("serving pass scores every doc with the stepped weights; the " +
    "trained gate beats a coin flip against the heuristic labels") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val inf = QualityClassifier.infer(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(inf.count() == nDocs)
    assert(inf.filter(col("p") < 0 || col("p") > 1).isEmpty)
    assert(inf.filter(col("keep") =!= (col("p") >= 0.5)).isEmpty)
    // the stepped model must agree with the heuristic labels it was
    // distilled from far better than chance (one step from a random
    // init already separates on these features)
    val labels = QualityClassifier.trainStep(spark, TestSpark.sf) // warm cache
    val q = graft.core.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("n_chars"),
        graft.text.TextAnalysis.words.as("ws"))
      .select(col("doc_id"),
        (graft.text.TextAnalysis.quality >= QualityClassifier.Thresh).as("y"))
    val agree = inf.join(q, "doc_id")
      .agg(avg((col("keep") === col("y")).cast("double"))).head.getDouble(0)
    assert(agree > 0.6, s"agreement $agree")
    // the verdict is non-degenerate: both classes appear
    assert(inf.filter(col("keep")).count() > 0)
    assert(inf.filter(!col("keep")).count() > 0)
    inf.unpersist()
  }
}
