package graft

import org.scalatest.funsuite.AnyFunSuite

/** sf0.001 smoke: registered non-iterative queries plan, run and
  * return rows (the iterative trainers have their own deeper specs in
  * graft.tensor.TrainerSpec — excluded here to keep `sbt test` fast).
  *
  * r11 (VERDICT r10 item 2): the full 341-query sweep outgrew the
  * driver's `sbt test` budget (the r10 run was killed mid-suite with
  * zero failures) AND duplicates graft.Verify's job — the driver runs
  * Verify + oracle parity separately over every query. Default is now
  * one representative per name-prefix family (~65 canaries: catches a
  * broken session config, cache tier, or source schema immediately);
  * set SPARK_GRAFT_FULL_SMOKE=1 for the full sweep when iterating on
  * query code.
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

  private val all = SparkEntry.queries.keys.toSeq.sorted.filterNot(slow)
  private val names =
    if (sys.env.get("SPARK_GRAFT_FULL_SMOKE").exists(_.nonEmpty)) all
    else all.groupBy(_.takeWhile(_ != '_')).values.map(_.head).toSeq.sorted

  names.foreach { name =>
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
