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

  test("neyman allocation: weights, Hamilton seats, and the drawn counts " +
      "equal a driver recompute; the budget spends exactly") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)].collect()
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val strata = docs.groupBy(_._2).map { case (lang, g) =>
      val n = g.length.toLong
      val sx = g.map(_._3).sum
      val sxx = g.map(d => d._3 * d._3).sum
      lang -> (n, q6(math.sqrt((n * sxx - sx * sx).toDouble)))
    }
    val tw = strata.values.map(v =>
      math.floor(v._2 * 1e6 + 0.5).toLong).sum.toDouble / 1e6
    val shares = strata.map { case (lang, (n, w)) =>
      val s = 100.0 * w / tw
      (lang, n, w, math.floor(s).toLong, s - math.floor(s))
    }.toSeq
    val extra = 100L - shares.map(_._4).sum
    val order = shares.sortBy { case (lang, _, _, _, rem) => (-rem, lang) }
    val alloc = order.zipWithIndex.map { case ((lang, n, w, base, _), i) =>
      lang -> (n, w, base + (if (i < extra) 1L else 0L))
    }.toMap
    val got = graft.pipeline.Sampling.neymanAlloc(spark, TestSpark.sf)
      .as[(String, Long, Double, Long, Long)].collect()
    assert(got.map(_._1).toSet == alloc.keySet)
    got.foreach { case (lang, n, sigma, na, nd) =>
      val (en, ew, ea) = alloc(lang)
      assert(n == en && na == ea, s"$lang allocation drifted")
      assert(sigma == q6(ew / en))
      // the draw fills the allocation (strata are larger than any seat)
      assert(nd == ea, s"$lang drew $nd of $ea")
    }
    // Hamilton's whole point: the budget spends exactly, no rounding dust
    assert(got.map(_._4).sum == 100L)
    // Neyman's whole point: the seat vector differs from PROPORTIONAL
    // allocation (same Hamilton rounding, population weights) — the
    // variance term genuinely moves seats even on these mild strata
    val totPop = got.map(_._2).sum
    val propShares = got.map { case (lang, n, _, _, _) =>
      val s = 100.0 * n / totPop
      (lang, math.floor(s).toLong, s - math.floor(s))
    }
    val pExtra = 100L - propShares.map(_._2).sum
    val propAlloc = propShares.sortBy { case (l, _, r) => (-r, l) }
      .zipWithIndex.map { case ((l, b, _), i) =>
        l -> (b + (if (i < pExtra) 1L else 0L)) }.toMap
    val neyAlloc = got.map(r => r._1 -> r._4).toMap
    assert(neyAlloc != propAlloc,
      s"Neyman degenerated to proportional: $neyAlloc")
  }
}
