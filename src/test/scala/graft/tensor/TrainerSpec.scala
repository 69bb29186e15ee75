package graft.tensor

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Loss-descent / fit-ascent specs for the iterative trainers (these are
  * the rows-only operators the DuckDB oracle can't check).
  */
class TrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CP-ALS fit is non-decreasing over sweeps") {
    val fits = CpAls.cpAls(spark, TestSpark.sf)
      .orderBy("iter").as[(Int, Double)].collect().map(_._2)
    assert(fits.length == CpAls.Iters + 1)
    fits.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9) }
    assert(fits.last > fits.head, "ALS should actually improve the fit")
  }

  test("RESCAL core update improves fit") {
    val fits = RescalAls.rescalAls(spark, TestSpark.sf)
      .orderBy("iter").as[(Int, Double)].collect().map(_._2)
    assert(fits.length == 2)
    assert(fits(1) > fits(0))
  }

  test("TransE full-batch training decreases the margin loss monotonically") {
    val losses = graft.kge.TransETrainer.train(spark, TestSpark.sf)
      .orderBy("epoch").as[(Int, Double)].collect().map(_._2)
    assert(losses.length == graft.kge.TransETrainer.Epochs + 1)
    losses.sliding(2).foreach { case Array(a, b) => assert(b < a) }
  }

  test("TransE Adagrad training decreases the margin loss") {
    val losses = graft.kge.TransETrainer.trainAdagrad(spark, TestSpark.sf)
      .orderBy("epoch").as[(Int, Double)].collect().map(_._2)
    assert(losses.length == graft.kge.TransETrainer.Epochs + 1)
    losses.sliding(2).foreach { case Array(a, b) => assert(b < a) }
  }

  test("TransE Adam training decreases the margin loss") {
    val losses = graft.kge.TransETrainer.trainAdam(spark, TestSpark.sf)
      .orderBy("epoch").as[(Int, Double)].collect().map(_._2)
    assert(losses.length == graft.kge.TransETrainer.Epochs + 1)
    losses.sliding(2).foreach { case Array(a, b) => assert(b < a) }
  }

  test("HolE training decreases the margin loss") {
    val losses = graft.kge.HolETrainer.train(spark, TestSpark.sf)
      .orderBy("epoch").as[(Int, Double)].collect().map(_._2)
    assert(losses.length == graft.kge.HolETrainer.Epochs + 1)
    losses.sliding(2).foreach { case Array(a, b) => assert(b < a) }
  }

  test("MTTKRP output covers every subject id with R rows each") {
    val m = Mttkrp.cpMttkrp(spark, TestSpark.sf)
    val bad = m.groupBy("sid").count()
      .filter($"count" =!= Mttkrp.R).count()
    assert(bad == 0)
  }
}
