package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("ccorr is callable from plain SQL after registration") {
    val spark = TestSpark.spark
    org.apache.spark.sql.graft.GraftExtensions.register(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val got = spark.sql(
      "SELECT ccorr(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS c")
      .head().getSeq[Double](0)
    assert(got == Seq(1 * 4.0 + 2 * 5 + 3 * 6, 1 * 5.0 + 2 * 6 + 3 * 4, 1 * 6.0 + 2 * 4 + 3 * 5))
  }
}
