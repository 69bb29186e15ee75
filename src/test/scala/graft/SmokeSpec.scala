package graft

import org.scalatest.funsuite.AnyFunSuite

/** sf0.001 smoke: every registered non-iterative query plans, runs and
  * returns rows (the iterative trainers have their own deeper specs in
  * graft.tensor.TrainerSpec — excluded here to keep `sbt test` fast).
  */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val slow = Set("cp_als", "rescal_als", "kge_transe_train",
    "kge_transe_train_adagrad", "kge_transe_train_adam",
    "kge_transe_train_adamw",
    "kge_distmult_train", "kge_hole_train", "kge_complex_train",
    "kge_rescal_train",
    // train→eval composition: iterative too, deep spec in TrainEvalSpec
    "kge_train_eval")

  SparkEntry.queries.keys.toSeq.sorted.filterNot(slow).foreach { name =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = SparkEntry.queries(name)(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or a documented exception") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == slow, s"unexpected oracle-less queries: $noOracle")
  }
}
