package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #277: Holt–Winters — the 9-field recursion recomputed driver-side
  * bit-exactly, plus the structural facts that distinguish it from #233
  * Holt (live seasonal state) and pin the calendar-dow slot keying.
  */
class HoltWintersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("level/trend/seasonals/forecast equal the driver fold; seasonals " +
      "are live; the forecast uses the last day's own dow slot") {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val daily = e.selectExpr("event_type",
        s"${Events.tsNanos(e)} DIV 1000000000 DIV 86400 AS day",
        "CAST(floor(value * 100.0 + 0.5) AS LONG) AS cv")
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum)
      .toSeq.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, d), sv) => (d, sv) }.sortBy(_._1)).toMap
    val got = Events.holtWinters(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == daily.keySet.filter(t => daily(t).size >= 2))
    daily.foreach { case (t, series) =>
      if (series.size >= 2) {
        var l = series.head._2.toDouble
        var b = series(1)._2.toDouble - series.head._2.toDouble
        val s = Array.fill(7)(0.0)
        series.drop(1).foreach { case (day, sv) =>
          val y = sv.toDouble
          val dow = (day % 7).toInt
          val sOld = s(dow)
          val lNew = 0.5 * (y - sOld) + 0.5 * (l + b)
          val bNew = 0.5 * (lNew - l) + 0.5 * b
          s(dow) = 0.5 * (y - (l + b)) + 0.5 * sOld
          l = lNew; b = bNew
        }
        val r = got(t)
        assert(r.getLong(1) == series.size.toLong, s"n_days of $t")
        val lastDay = series.last._1
        assert(r.getLong(2) == lastDay, s"last_day of $t")
        assert(r.getDouble(3) == l / 100.0, s"level of $t")
        assert(r.getDouble(4) == b / 100.0, s"trend of $t")
        (0 until 7).foreach { k =>
          assert(r.getDouble(5 + k) == s(k) / 100.0, s"s$k of $t")
        }
        assert(r.getDouble(12) ==
          (l + 7.0 * b + s((lastDay % 7).toInt)) / 100.0, s"forecast of $t")
        // the seasonal state is live: at least one slot moved off init
        assert(s.exists(_ != 0.0), s"$t seasonals never updated")
      }
    }
  }
}
