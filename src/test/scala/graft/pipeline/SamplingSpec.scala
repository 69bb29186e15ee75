package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stratified sample: deterministic, and per-lang rates near target") {
    val a = Sampling.sampleStratified(spark, TestSpark.sf)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.sampleStratified(spark, TestSpark.sf)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "hash-based sampling must be reproducible")

    val total = graft.core.Tables.documents(spark, TestSpark.sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Sampling.sampleStratified(spark, TestSpark.sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val target = Map("en" -> 0.8, "de" -> 0.6, "fr" -> 0.5, "es" -> 0.4, "zh" -> 0.25)
    target.foreach { case (lang, rate) =>
      val n = total(lang).toDouble
      val got = kept.getOrElse(lang, 0L).toDouble / n
      // 4 binomial standard deviations of slack on the small test strata
      val tol = 4 * math.sqrt(rate * (1 - rate) / n)
      assert(math.abs(got - rate) <= tol,
        s"$lang: sampled fraction $got vs target $rate (n=$n)")
    }
  }

  test("temperature mix: tail upsampled relative to head, rates valid") {
    val rows = Sampling.sampleTemperature(spark, TestSpark.sf)
      .select("lang", "n_docs", "rate_mille", "sampled_docs")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { case (_, n, rate, got) =>
      assert(rate >= 0 && rate <= 1000)
      assert(got <= n)
    }
    // τ=2 flattens the distribution: a smaller language must get an
    // acceptance rate >= any larger language's (rate ∝ 1/sqrt(n))
    rows.sortBy(_._2).sliding(2).foreach { case Array(small, big) =>
      assert(small._3 >= big._3,
        s"${small._1} (n=${small._2}) rate ${small._3} < ${big._1} rate ${big._3}")
    }
  }

  test("mix report: budget respected in expectation, full-keep sources exact") {
    val rows = Sampling.corpusMixReport(spark, TestSpark.sf)
      .select("n_docs", "avail_tokens", "rate_mille", "sampled_docs", "sampled_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nDocs, avail, rate, sDocs, sToks) =>
      assert(rate >= 0 && rate <= 1000)
      assert(sDocs <= nDocs && sToks <= avail)
      if (rate == 1000) { // source under budget: keep everything
        assert(sDocs == nDocs && sToks == avail)
      }
    }
  }
}
