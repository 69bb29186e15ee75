package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GopherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gopher rules: every violation count equals a driver recompute; " +
      "composite verdict consistent") {
    val texts = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("text").as[String].collect()
    val stop = TextAnalysis.stopwords.toSet
    val flags = texts.map { t =>
      val ws = t.trim.split("\\s+")
      val nw = ws.length.toLong
      val chars = ws.map(_.length.toLong).sum
      Seq(
        nw < 50 || nw > 100000,
        chars < 3 * nw || chars > 10 * nw,
        ws.map(_.length).max > 20,
        ws.count(stop) < 2,
        ws.distinct.length.toLong * 5 < nw,
        ws.count(_.length <= 2).toLong * 2 > nw)
    }
    val expect = Map(
      "word_count_50_100000" -> flags.count(_(0)).toLong,
      "mean_word_len_3_10" -> flags.count(_(1)).toLong,
      "max_word_len_20" -> flags.count(_(2)).toLong,
      "min_stopwords_2" -> flags.count(_(3)).toLong,
      "uniq_word_ratio_0.2" -> flags.count(_(4)).toLong,
      "short_word_frac_0.5" -> flags.count(_(5)).toLong,
      "gopher_keep" -> flags.count(_.exists(identity)).toLong)
    val got = Gopher.gopherRules(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length == 7)
    got.foreach { case (rule, nDocs, nViol, nPass, rate) =>
      assert(nDocs == texts.length.toLong)
      assert(nViol == expect(rule), s"$rule violation count drifted")
      assert(nPass == nDocs - nViol)
      assert(rate == nPass.toDouble / nDocs.toDouble)
    }
    // composite bounds: at least the worst rule, at most the rule sum
    val ruleCounts = expect.filterKeys(_ != "gopher_keep").values
    assert(expect("gopher_keep") >= ruleCounts.max)
    assert(expect("gopher_keep") <= ruleCounts.sum)
    // the suite must actually engage with this corpus
    assert(expect("gopher_keep") > 0)
  }
}
