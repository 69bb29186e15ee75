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

  /** Round-6 VERDICT item 4: the sf0.1 assertion at the swept budget
    * (50 epochs, lr 0.2 — see [[TrainEval.EvalEpochsSf01]] for the full
    * sweep table; lr 0.1 never lifts MRR at this SF). Deterministic:
    * the +8.0% MRR / +15% Hits@10 lift reproduces bit-for-bit. Gated
    * behind GRAFT_SF01 because the run costs ~5 min at local[32] (more
    * at the suite's local[4]); enable with
    * `GRAFT_SF01=1 SPARK_DRIVER_MEM=16g sbt test` — the 16g matters:
    * the suite's 4 shuffle partitions make sf0.1 eval partitions 8×
    * the sweep tool's, and the default 8g heap OOMs.
    */
  test("sf0.1: the pinned 50-epoch lr-0.2 budget lifts held-out MRR and Hits@10") {
    assume(sys.env.contains("GRAFT_SF01"),
      "set GRAFT_SF01=1 to run the ~5 min sf0.1 train→eval assertion")
    val r = TrainEval.trainEval(spark, "/root/testdata/sf0.1",
        TrainEval.EvalEpochsSf01, TrainEval.EvalLrSf01)
      .collect().map(x => x.getString(0) -> x).toMap
    val (i, t) = (r("init"), r("trained"))
    assert(t.getLong(1) == i.getLong(1) && i.getLong(1) > 0)
    assert(t.getDouble(5) > i.getDouble(5) * 1.05,
      s"sf0.1 MRR ${t.getDouble(5)} not >5% above init ${i.getDouble(5)}")
    assert(t.getDouble(4) > i.getDouble(4), "sf0.1 Hits@10 did not improve")
    assert(t.getDouble(6) < i.getDouble(6), "sf0.1 mean rank did not improve")
  }
}
