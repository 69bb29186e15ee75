package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** MAD-anomaly guarantees beyond the oracle: median, MAD and outlier
  * counts equal a driver recomputation on the same grid, and the robust
  * statistics behave robustly (MAD unmoved by the outliers it flags).
  */
class MadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("median/MAD/outlier counts equal a driver recompute") {
    val got = Events.madAnomaly(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap

    val vals = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"),
        floor(col("value") * 100.0 + lit(0.5)).cast("long").as("vi"))
      .as[(String, Long)].collect()

    def nearestRank(sorted: Seq[Long], p: Int): Long = {
      val n = sorted.length.toLong
      val k = ((n * p + 99) / 100).toInt
      sorted(k - 1)
    }
    vals.groupBy(_._1).foreach { case (t, xs) =>
      val vis = xs.map(_._2).sorted.toSeq
      val med = nearestRank(vis, 50)
      val devs = vis.map(v => math.abs(v - med)).sorted
      val mad = nearestRank(devs, 50)
      val outliers = vis.count(v =>
        math.abs(v - med).toDouble > Events.MadCut * mad.toDouble).toLong
      val (_, n, gmed, gmad, gout) = got(t)
      assert(n == vis.length.toLong)
      assert(gmed == med / 100.0 && gmad == mad / 100.0,
        s"$t med/mad ($gmed, $gmad) vs driver (${med / 100.0}, ${mad / 100.0})")
      assert(gout == outliers, s"$t outliers $gout vs driver $outliers")
    }
  }
}
