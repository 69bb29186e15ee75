package graft.kge

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end train→eval composition (#74): the trained TransE
  * embeddings must be consumable by the ranking-eval stack AND beat the
  * hash-initialized baseline on the held-out slice — the property
  * nothing else in the suite checks (trainer specs assert loss descent,
  * eval specs assert rank semantics; this asserts the two compose into
  * a model that actually ranks better).
  */
class TrainEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    TrainEval.trainEval(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r).toMap

  test("both model rows evaluate the same non-empty held-out set") {
    assert(rows.keySet == Set("init", "trained"))
    val n = rows("init").getLong(1)
    assert(n > 0 && rows("trained").getLong(1) == n)
  }

  test("training lifts held-out MRR over the hash-init baseline") {
    val mrrInit = rows("init").getDouble(5)
    val mrrTrained = rows("trained").getDouble(5)
    // swept at sf0.001/sf0.01: +26-49% relative lift; assert a strict
    // improvement with headroom against grid-rounding jitter
    assert(mrrTrained > mrrInit * 1.05,
      s"trained MRR $mrrTrained not above init $mrrInit")
  }

  test("training does not degrade held-out Hits@10") {
    assert(rows("trained").getDouble(4) >= rows("init").getDouble(4))
  }
}
