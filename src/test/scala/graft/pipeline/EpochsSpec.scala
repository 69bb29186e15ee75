package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class EpochsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("epoch plan: cap respected, budget never exceeded, accounting exact") {
    val r = Epochs.mixEpochs(spark, TestSpark.sf).cache()
    // every source appears once
    val nSrc = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("source").distinct().count()
    assert(r.count() == nSrc)
    // the hard Muennighoff cap: never more than MaxEpochs of any source
    assert(r.filter(col("eff_tokens") > lit(Epochs.MaxEpochs) * col("n_tokens")).isEmpty)
    assert(r.filter(col("epochs") > Epochs.MaxEpochs).isEmpty)
    // exact integer accounting: eff = full*n + frac*n (frac in [0,1))
    assert(r.filter(col("full_epochs") =!=
      expr("eff_tokens div n_tokens")).isEmpty)
    assert(r.filter(col("last_frac") < 0 || col("last_frac") >= 1).isEmpty)
    // budget conservation: total planned tokens never exceed the budget
    val Seq(totalN, totalEff) = r.agg(sum("n_tokens"), sum("eff_tokens"))
      .head.toSeq.map(_.asInstanceOf[Long])
    val budget = Epochs.BudgetX * totalN
    assert(totalEff <= budget)
    // ...and the single redistribution round leaves little on the table:
    // the residue is bounded by (rounding) + (second-round cap clips)
    assert(budget - totalEff < budget / 2)
    // the 2x budget forces repetition somewhere: at least one source
    // trains for more than one full epoch
    assert(r.filter(col("full_epochs") >= 1).count() > 0)
  }
}
