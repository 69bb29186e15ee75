package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #259-261: daily-series autocorrelation, funnel stage latency, and the
  * daily pivot report — each against a driver recompute.
  */
class AcfPivotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    e.selectExpr("user_id", "event_type",
      s"${Events.tsNanos(e)} DIV 1000000000 AS ts_s")
      .as[(Long, String, Long)].collect().toSeq
  }

  test("acf: equals the textbook sample ACF recomputed on the complete " +
      "calendar with the house quantization; lag-0 normalization sane") {
    val byDay = events.groupBy(r => (r._2, r._3 / 86400L)).view
      .mapValues(_.size.toLong).toMap
    val d0 = byDay.keys.map(_._2).min
    val d1 = byDay.keys.map(_._2).max
    val types = byDay.keys.map(_._1).toSet
    def q(x: Double, s: Double) = math.floor(x * s + 0.5) / s
    def dsum(vs: Seq[Double], s: Double) =
      vs.map(v => math.floor(v * s + 0.5).toLong).sum / s
    val expect = types.flatMap { t =>
      val xs = (d0 to d1).map(d => byDay.getOrElse((t, d), 0L).toDouble)
      val n = xs.length
      val m = q(xs.sum / n.toDouble, 1e6)
      val dev = xs.map(_ - m)
      val s0 = dsum(dev.map(v => v * v), 1e4)
      Events.AcfLags.map { k =>
        val sk = dsum(dev.dropRight(k).zip(dev.drop(k)).map(p => p._1 * p._2)
          ++ Seq.fill(k)(0.0), 1e4)
        (t, k.toLong) -> ((n.toLong, (n - k).toLong, sk / s0))
      }
    }.toMap
    val got = Events.acf(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (t, k, nd, np, r) =>
      assert((nd, np, r) == expect((t, k)), s"cell ($t, lag $k)")
    }
    assert(got.map(_._1).toSet == types && got.map(_._2).toSet == Set(1L, 2L, 7L))
  }

  test("funnel latency: percentiles/means equal the nearest-rank " +
      "recompute over the stage chain; counts consistent with #89") {
    val t1 = events.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val t2 = events.filter(r => r._2 == "click" && t1.contains(r._1) &&
        r._3 > t1(r._1))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val t3 = events.filter(r => r._2 == "purchase" && t2.contains(r._1) &&
        r._3 > t2(r._1))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val lags = Map(
      "view_to_click" -> t2.map { case (u, t) => t - t1(u) }.toSeq,
      "click_to_purchase" -> t3.map { case (u, t) => t - t2(u) }.toSeq)
    val expect = lags.collect { case (st, ls) if ls.nonEmpty =>
      val hs = ls.map(_ / 3600L).sorted
      val n = hs.length.toLong
      def nr(k: Long) = hs(((n * k + 99) / 100 - 1).toInt)
      st -> ((n, nr(50), nr(90), hs.last, ls.sum.toDouble / n.toDouble))
    }
    val got = Events.funnelLatency(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { case (st, n, p50, p90, mx, mean) =>
      assert((n, p50, p90, mx, mean) == expect(st), s"stage $st")
      assert(p50 <= p90 && p90 <= mx)
    }
    // the stage populations are exactly #89's conversion counts
    val fun = Events.funnel(spark, TestSpark.sf)
      .select($"n_click", $"n_purchase").as[(Long, Long)].collect().head
    assert(got.find(_._1 == "view_to_click").map(_._2).contains(fun._1))
    assert(got.find(_._1 == "click_to_purchase").map(_._2).contains(fun._2))
  }

  test("pivot: wide cells equal conditional counts, totals conserve the " +
      "corpus, absent cells are exact zeros") {
    val cells = events.groupBy(r => (r._3 / 86400L, r._2)).view
      .mapValues(_.size.toLong).toMap
    val days = events.map(_._3 / 86400L).distinct
    val got = Events.pivotDaily(spark, TestSpark.sf)
      .select($"day", $"n_click", $"n_error", $"n_purchase", $"n_signup",
        $"n_view", $"n_total")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == days.length)
    got.foreach { case (d, c, e, p, s, v, tot) =>
      val ex = Seq("click", "error", "purchase", "signup", "view")
        .map(t => cells.getOrElse((d, t), 0L))
      assert(Seq(c, e, p, s, v) == ex, s"day $d")
      assert(tot == ex.sum)
    }
    assert(got.map(_._7).sum == events.size.toLong,
      "pivot totals must conserve the corpus row count")
  }
}
