package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #296 nprobe sweep — the curve properties the tuning table is read
  * for, plus consistency with the deployed-setting report (#180).
  */
class NprobeSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = Ann.nprobeSweep(spark, TestSpark.sf)
    .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)

  test("recall and scanned candidates are monotone in nprobe") {
    assert(rows.map(_._1).toSeq == Ann.SweepProbes.sorted)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4, s"recall fell ${a._1}→${b._1}")
      assert(b._5 >= a._5, s"avg_cands fell ${a._1}→${b._1}")
    }
  }

  test("probing every cell anchors the curve at recall exactly 1.0") {
    val full = rows.last
    assert(full._1 == Ann.NCells)
    assert(full._4 == 1.0,
      s"exhaustive probe must recover brute truth, got ${full._4}")
  }

  test("the deployed width's row equals the #180 ivf report") {
    val report = Ann.recallReport(spark, TestSpark.sf)
      .filter($"variant" === "ivf")
      .as[(String, Long, Long, Double)].collect().head
    val mine = rows.find(_._1 == Ann.NProbe).get
    assert(mine._3 == report._3 && mine._4 == report._4,
      "sweep row at NProbe must match the deployed recall report")
  }
}
