package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #269 readability and #271 Spearman score correlation vs driver
  * recomputes of the pinned counters and the histogram-rank method.
  */
class ReadabilityCorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, TestSpark.sf)
    .select($"doc_id", $"lang", $"n_chars", $"text")
    .as[(Long, String, Long, String)].collect().toSeq

  test("readability counters and both scores equal the pinned-regex " +
      "recompute; fragment-only docs stay defined via the clamp") {
    val got = TextAnalysis.readability(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, lang, _, text) =>
      val w = text.trim.split("\\s+").length.toLong
      val s = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val sy = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      val flesch = 206.835 - 1.015 * (w.toDouble / s) - 84.6 * (sy.toDouble / w)
      val fk = 0.39 * (w.toDouble / s) + 11.8 * (sy.toDouble / w) - 15.59
      assert(got(id) == ((id, lang, w, s, sy, flesch, fk)), s"doc $id")
    }
  }

  test("Spearman rho equals the average-rank recompute on the grid " +
      "metrics, per language, and sits in [-1, 1]") {
    def q(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val metrics = docs.map { case (_, lang, nChars, text) =>
      val ws = text.trim.split("\\s+").toSeq
      val n = ws.size.toDouble
      val quality = 0.3 * math.min(n / 50.0, 1.0) +
        0.3 * (1.0 - ws.count(stop).toDouble / n) +
        0.2 * math.min(((nChars.toDouble - (n - 1.0)) / n) / 8.0, 1.0) +
        0.2 * ws.distinct.size.toDouble / n
      (lang, nChars, q(quality))
    }
    def avgRanks[T](vs: Seq[T])(implicit ord: Ordering[T]): Map[T, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexWhere(ord.equiv(_, v)) + 1
        val hi = sorted.lastIndexWhere(ord.equiv(_, v)) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val got = TextAnalysis.scoreCorrelation(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    metrics.groupBy(_._1).foreach { case (lang, rows) =>
      val n = rows.size
      val rq = avgRanks(rows.map(_._3))
      val rc = avgRanks(rows.map(_._2))
      val xs = rows.map(r => rq(r._3) / n)
      val ys = rows.map(r => rc(r._2) / n)
      def dsum(vs: Seq[Double]) =
        vs.map(v => math.floor(v * 1e9 + 0.5).toLong).sum / 1e9
      val (sx, sy) = (dsum(xs), dsum(ys))
      val sxx = dsum(xs.map(x => x * x)); val syy = dsum(ys.map(y => y * y))
      val sxy = dsum(xs.zip(ys).map(p => p._1 * p._2))
      val rho = (sxy / n - (sx / n) * (sy / n)) /
        math.sqrt((sxx / n - (sx / n) * (sx / n)) *
          (syy / n - (sy / n) * (sy / n)))
      val (_, gn, gr) = got(lang)
      assert(gn == n.toLong, s"n for $lang")
      assert(gr == rho, s"rho for $lang")
      assert(gr >= -1.0 - 1e-12 && gr <= 1.0 + 1e-12, s"rho range $lang")
    }
  }
}
