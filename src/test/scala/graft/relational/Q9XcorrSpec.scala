package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #280 Q9-adapted profit and #281 lagged cross-correlation — driver
  * recomputes of the defining semantics.
  */
class Q9XcorrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q9: every (nation, year) profit cell equals the quantized " +
      "recompute over the widget-filtered join") {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
        $"l_extendedprice", $"l_discount")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val part = graft.core.Tables.part(spark, TestSpark.sf)
      .select($"p_partkey", $"p_name", $"p_retailprice")
      .as[(Long, String, Double)].collect()
      .filter(_._2.contains("widget")).map(p => p._1 -> p._3).toMap
    val supp = graft.core.Tables.supplier(spark, TestSpark.sf)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Long)].collect().toMap
    val nation = graft.core.Tables.nation(spark, TestSpark.sf)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap
    val years = graft.core.Tables.orders(spark, TestSpark.sf)
      .selectExpr("o_orderkey", "CAST(year(o_orderdate) AS LONG)")
      .as[(Long, Long)].collect().toMap
    val cells = li.filter(r => part.contains(r._2))
      .groupBy(r => (nation(supp(r._3)), years(r._1)))
      .view.mapValues { rows =>
        rows.map { case (_, pk, _, qty, ep, disc) =>
          val amt = ep * (1.0 - disc) - part(pk) * qty
          math.floor(amt * 1e6 + 0.5).toLong
        }.sum / 1e6
      }.toMap
    val got = Relational.q9Profit(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect()
    assert(got.length == cells.size, "cell count")
    got.foreach { case (n, y, p) =>
      assert(p == cells((n, y)), s"cell ($n, $y)")
    }
  }

  test("xcorr: every (pair, lag) cell equals the complete-calendar " +
      "recompute; correlations are bounded; lag-0 of a pair matches " +
      "the direct product form") {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val days = e.selectExpr("event_type",
        s"${Events.tsNanos(e)} DIV 1000000000 DIV 86400 AS day")
      .as[(String, Long)].collect()
    val byDay = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d0 = days.map(_._2).min; val d1 = days.map(_._2).max
    def series(t: String): Array[Double] =
      (d0 to d1).map(d => byDay.getOrElse((t, d), 0L).toDouble).toArray
    def q(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def dsum(vs: Seq[Double]) =
      vs.map(v => math.floor(v * 1e4 + 0.5).toLong).sum / 1e4
    def devs(t: String): Array[Double] = {
      val xs = series(t)
      val m = q(xs.sum / xs.length)
      xs.map(_ - m)
    }
    val got = Events.xcorr(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.length == Events.XcorrPairs.size * (Events.XcorrMaxLag + 1))
    got.foreach { case (tx, ty, lag, np, r) =>
      val dx = devs(tx); val dy = devs(ty)
      val sxy = dsum(dx.dropRight(lag.toInt).zip(dy.drop(lag.toInt))
        .map(p => p._1 * p._2))
      val sxx = dsum(dx.map(v => v * v)); val syy = dsum(dy.map(v => v * v))
      assert(np == dx.length.toLong - lag, s"n_pairs ($tx,$ty,$lag)")
      assert(r == sxy / math.sqrt(sxx * syy), s"cell ($tx,$ty,$lag)")
      assert(math.abs(r) <= 1.0 + 1e-9, s"bound ($tx,$ty,$lag)")
    }
  }
}
