package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #284 STL-residual anomaly flags and #285 per-source KS drift — driver
  * recomputes plus the properties each exists for (seasonal adjustment
  * changes the alarm set vs raw volume; the KS A/A property on a
  * homogeneous corpus).
  */
class StlKsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stl anomaly: flags equal the 3σ rule on the #267 remainders, " +
      "bit-exactly, and the moment inputs match the quantized recompute") {
    val dec = Events.seasonalDecompose(spark, TestSpark.sf)
      .select($"event_type", $"day", $"remainder")
      .as[(String, Long, Double)].collect()
    val stats = dec.groupBy(_._1).view.mapValues { rows =>
      val rs = rows.map(_._3)
      val n = rs.length
      val m = math.floor((rs.map(v => math.floor(v * 1e6 + 0.5).toLong)
        .sum / 1e6 / n) * 1e6 + 0.5) / 1e6
      val s2 = rs.map(v => math.floor(v * v * 1e4 + 0.5).toLong).sum / 1e4
      (m, math.sqrt(s2 / n - m * m))
    }.toMap
    val got = Events.stlAnomaly(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double, Double, Boolean)].collect()
    assert(got.length == dec.length)
    val decMap = dec.map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (t, d, _, r, m, sd, flag) =>
      assert(r == decMap((t, d)), s"remainder ($t,$d)")
      val (em, esd) = stats(t)
      assert(m == em && sd == esd, s"moments of $t")
      assert(flag == (math.abs(r - em) > 3.0 * esd), s"flag ($t,$d)")
    }
  }

  test("ks drift: every source's D and threshold equal the CDF " +
      "recompute; the synthetic corpus is an A/A split — no source " +
      "drifts at α=0.05") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"source", $"n_chars", $"text")
      .as[(String, Long, String)].collect()
      .map { case (src, nChars, text) =>
        val ws = text.trim.split("\\s+").toSeq
        val n = ws.size.toDouble
        val q = 0.3 * math.min(n / 50.0, 1.0) +
          0.3 * (1.0 - ws.count(stop).toDouble / n) +
          0.2 * math.min(((nChars.toDouble - (n - 1.0)) / n) / 8.0, 1.0) +
          0.2 * ws.distinct.size.toDouble / n
        (src, math.floor(q * 1e6 + 0.5) / 1e6)
      }
    val grid = docs.map(_._2).distinct.sorted
    val total = docs.length.toLong
    val got = DataQuality.ksTest(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val ns = rows.length.toLong
      val nr = total - ns
      val d = grid.map { t =>
        val cs = rows.count(_._2 <= t).toLong
        val cr = docs.count(r => r._1 != src && r._2 <= t).toLong
        math.abs(cs.toDouble / ns - cr.toDouble / nr)
      }.max
      val crit = 1.358 * math.sqrt(total.toDouble / (ns * nr))
      val (_, gn, gd, gc, gf) = got(src)
      assert(gn == ns, s"n of $src")
      assert(gd == d, s"D of $src")
      assert(gc == crit, s"crit of $src")
      assert(gf == (d > crit), s"flag of $src")
    }
    // A/A property under multiple testing: 20 sources × α=0.05 expects
    // ~1 false alarm; a homogeneous corpus must not flag broadly.
    val flagged = got.values.count(_._5)
    assert(flagged <= 2,
      s"$flagged of ${got.size} homogeneous sources flagged — " +
        "the threshold is mis-calibrated")
  }
}
