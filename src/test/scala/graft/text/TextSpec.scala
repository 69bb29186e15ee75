package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quality score stays in [0,1] and ratios are consistent") {
    val rows = TextAnalysis.qualityScore(spark, TestSpark.sf)
      .select("stop_ratio", "uniq_ratio", "quality")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sr, ur, q) =>
      assert(sr >= 0 && sr <= 1); assert(ur > 0 && ur <= 1)
      assert(q >= 0 && q <= 1.0 + 1e-9)
    }
  }

  test("token counts: every source accounted for, averages consistent") {
    val rows = TextAnalysis.tokenCount(spark, TestSpark.sf)
      .select("n_docs", "ws_tokens_total", "avg_ws_tokens")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (n, tot, avg) =>
      assert(avg == tot.toDouble / n)
    }
  }

  test("lang id predicts one of the five languages per doc") {
    val langs = Set("de", "en", "es", "fr", "zh")
    val preds = TextAnalysis.langId(spark, TestSpark.sf)
      .select("pred_lang").as[String].collect()
    assert(preds.length == 500)
    preds.foreach(p => assert(langs(p)))
  }

  test("doc length stats: quartiles ordered and bounded by min/max") {
    val rows = TextAnalysis.docLengthStats(spark, TestSpark.sf)
      .select("min_chars", "max_chars", "mean_chars", "p25", "p50", "p75")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (mn, mx, mean, p25, p50, p75) =>
      assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx)
      assert(mean >= mn && mean <= mx)
    }
  }

  test("repetition signals: ratios bounded and mutually consistent") {
    val rows = TextAnalysis.repetition(spark, TestSpark.sf)
      .select("n_words", "uniq_ratio", "top_word_frac", "top_bigram_frac")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length == 500)
    rows.foreach { case (n, ur, twf, tbf) =>
      assert(n >= 2)
      assert(ur > 0 && ur <= 1)
      assert(twf >= 1.0 / n && twf <= 1)
      assert(tbf >= 1.0 / (n - 1) && tbf <= 1)
      // max word count ≥ mean word count n/n_uniq ⇒ twf ≥ 1/(ur·n)
      assert(twf * n >= 1.0 / ur - 1e-9)
    }
  }

  test("BPE pair merges: top-k ranked by frequency, deterministic ties") {
    val rows = Vocab.pairMerges(spark, TestSpark.sf)
      .select("pair", "n", "rnk").as[(String, Long, Int)].collect()
      .sortBy(_._3)
    assert(rows.length == Vocab.TopK)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.sliding(2).foreach { case Array((pa, na, ra), (pb, nb, rb)) =>
      assert(rb == ra + 1)
      assert(na > nb || (na == nb && pa < pb)) // (n desc, pair asc) total order
    }
    rows.foreach { case (p, n, _) => assert(p.length == 2 && n > 0) }
  }

  test("BPE learn: 3 merge rounds, counts non-increasing, round 1 = top pair") {
    val ms = Vocab.bpeLearn(spark, TestSpark.sf)
      .select("step", "l", "r", "merged", "n")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(ms.map(_._1).toSeq == Seq(1, 2, 3))
    ms.foreach { case (_, l, r, m, n) => assert(m == l + r && n > 0) }
    // a merged pair can only get rarer as earlier merges consume chars
    ms.sliding(2).foreach { case Array(a, b) => assert(a._5 >= b._5) }
    // round 1 must agree with the single-round pair count operator
    val top1 = Vocab.pairMerges(spark, TestSpark.sf)
      .filter($"rnk" === 1).select("pair", "n").as[(String, Long)].head()
    assert(ms.head._4 == top1._1 && ms.head._5 == top1._2)
  }

  test("winnowing fingerprint: shared text prefix ⇒ shared fingerprints") {
    // the planted near-dup docs must share at least one fingerprint
    val fps = TextAnalysis.fingerprint(spark, TestSpark.sf)
    val shared = fps.as("a").join(fps.as("b"),
      org.apache.spark.sql.functions.col("a.fp") ===
        org.apache.spark.sql.functions.col("b.fp") &&
        org.apache.spark.sql.functions.col("a.doc_id") <
          org.apache.spark.sql.functions.col("b.doc_id"))
    assert(shared.count() > 0)
  }
  test("bpe encode: char totals exact, merges strictly compress, bounds hold") {
    import org.apache.spark.sql.functions._
    val enc = Vocab.bpeEncode(spark, TestSpark.sf).cache()
    // per-doc bounds: a word of k chars becomes 1..k tokens
    assert(enc.filter(col("n_tokens") > col("n_chars") ||
      col("n_tokens") < col("n_words")).count() == 0)
    // n_chars is exactly the non-whitespace char count of each doc
    val want = graft.core.Tables.documents(spark, TestSpark.sf)
      .select(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .head.getLong(0)
    assert(enc.agg(sum("n_chars")).head.getLong(0) == want)
    // the three learned merges must actually fire somewhere
    assert(enc.agg(sum("n_chars")).head.getLong(0) >
      enc.agg(sum("n_tokens")).head.getLong(0))
    enc.unpersist()
  }

  test("fertility eval: per-lang rollup equals the encode frame and ratios are exact") {
    import org.apache.spark.sql.functions._
    val enc = Vocab.bpeEncode(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val langs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val got = Vocab.bpeFertility(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    // languages tile the corpus
    assert(got.map(_._2).sum == enc.size)
    assert(got.map(_._1).toSet == langs.values.toSet)
    got.foreach { case (lang, nDocs, nW, nC, nT, fert, cpt) =>
      val docs = enc.filter { case (id, _) => langs(id) == lang }.values
      assert(nDocs == docs.size)
      assert(nW == docs.iterator.map(_._1).sum)
      assert(nC == docs.iterator.map(_._2).sum)
      assert(nT == docs.iterator.map(_._3).sum)
      assert(fert == nT.toDouble / nW.toDouble)
      assert(cpt == nC.toDouble / nT.toDouble)
      // fertility lives in its structural bounds: >= 1 token per word,
      // <= the per-word char count
      assert(fert >= 1.0 && fert <= nC.toDouble / nW.toDouble)
    }
  }

  test("quality buckets: tiers ordered, non-overlapping, covering all docs") {
    val rows = TextAnalysis.qualityBuckets(spark, TestSpark.sf)
      .select("lang", "bucket", "n_docs", "min_q", "max_q")
      .as[(String, Int, Long, Double, Double)].collect()
    val total = rows.map(_._3).sum
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(total == nDocs, "every document lands in exactly one bucket")
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3), s"$lang has 4 tiers")
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo._5 <= hi._4, s"$lang tier ${lo._2} max <= tier ${hi._2} min")
      }
    }
  }

  test("rake: top-K phrases equal the driver RAKE recompute") {
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val stops = TextAnalysis.RakeStops.toSet
    // phrase segmentation: runs of non-stopwords
    val phrases = docs.flatMap { case (id, text) =>
      val ws = text.trim.split("\\s+").toSeq
      val runs = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      ws.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) { runs += cur.toSeq; cur.clear() } }
        else cur += w
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.map(id -> _)
    }
    val freq = phrases.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong)
    val degree = phrases.flatMap { case (_, p) => p.map(_ -> p.length.toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val wscore = freq.keys.map(w =>
      w -> q6(degree(w).toDouble / freq(w))).toMap
    val scored = phrases.map { case (_, p) =>
      (p.mkString(" "), p.length.toLong,
        p.map(w => math.floor(wscore(w) * 1e6 + 0.5).toLong).sum / 1e6)
    }
    val agg = scored.groupBy(_._1).map { case (ph, rs) =>
      (ph, rs.head._2, rs.length.toLong, rs.head._3)
    }.toSeq
    val expect = agg.sortBy(r => (-r._4, r._1)).take(TextAnalysis.RakeTopK)
    val got = TextAnalysis.rake(spark, TestSpark.sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expect, "RAKE top-K differs from the driver recompute")
    // multi-word phrases must rank above ubiquitous singletons somewhere
    assert(got.take(10).exists(_._2 >= 2),
      "degree/freq should favor phrases in the head of the ranking")
  }
}
