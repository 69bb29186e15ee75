package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RelevanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tfidf: exactly rank 1..3 per doc, scores non-increasing") {
    val rows = Relevance.tfidfKeywords(spark, TestSpark.sf)
      .select("doc_id", "score", "rnk")
      .as[(Long, Double, Int)].collect()
      .groupBy(_._1)
    rows.values.foreach { perDoc =>
      val byRank = perDoc.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.length))
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._2 >= b._2
        case _           => true
      })
    }
  }

  test("tfidf: rarer term outranks commoner term at equal tf") {
    // score = tf·N/df is strictly decreasing in df
    val scored = Relevance.tfidfKeywords(spark, TestSpark.sf)
      .select("tf", "df", "score").as[(Long, Long, Double)].collect()
    scored.groupBy(_._1).values.foreach { sameTf =>
      sameTf.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => if (a._2 < b._2) assert(a._3 > b._3)
        case _           => ()
      }
    }
  }

  test("bm25: top-5 per query, every hit contains a query term") {
    val hits = Relevance.bm25Search(spark, TestSpark.sf)
    val perQuery = hits.groupBy("query_id").count().as[(String, Long)].collect()
    assert(perQuery.length == 3)
    perQuery.foreach { case (_, n) => assert(n == 5) }
    val qterms = Set("spark", "query", "join", "table", "scan", "filter",
      "stream", "window", "agg")
    val docsWithTerm = graft.core.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").isInCollection(qterms))
      .select("doc_id").distinct().as[Long].collect().toSet
    hits.select("doc_id").as[Long].collect()
      .foreach(d => assert(docsWithTerm(d), s"doc $d has no query term"))
  }

  test("ngram lm score: lm_score ≥ 1, rare_ratio in [0,1], planted dups are fluent") {
    val rows = Relevance.ngramLmScore(spark, TestSpark.sf)
      .select("lm_score", "rare_ratio").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lm, rr) =>
      assert(lm >= 1.0) // every bigram at least matches itself
      assert(rr >= 0.0 && rr <= 1.0)
    }
  }
  test("perplexity: H > 0, ppl reconstructs 2^H on the grid, keep matches threshold") {
    val rows = Relevance.perplexity(spark, TestSpark.sf)
      .select("h_bits", "ppl", "keep").as[(Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (h, ppl, keep) =>
      // smoothing bounds P strictly below 1 ⇒ positive cross-entropy
      assert(h > 0.0)
      // ppl is 2^h quantized half-up on the 1e-6 grid
      assert(ppl == math.floor(math.pow(2.0, h) * 1e6 + 0.5) / 1e6)
      assert(keep == (ppl < Relevance.PplThreshold))
    }
    // the threshold must actually split the corpus (non-vacuous filter)
    assert(rows.exists(_._3) && rows.exists(!_._3),
      "PplThreshold keeps or discards EVERYTHING at this SF")
  }

  test("RRF rerank: permutation of the BM25 top-5, fusion score exact") {
    val rows = Relevance.rrfRerank(spark, TestSpark.sf)
      .select("query_id", "bm25_rnk", "q_rnk", "rrf", "fused_rnk")
      .as[(String, Int, Int, Double, Int)].collect()
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to 5), s"$q keeps all 5 candidates")
      assert(g.map(_._3).sorted.toSeq == (1 to 5))
      assert(g.map(_._5).sorted.toSeq == (1 to 5))
    }
    rows.foreach { case (_, b, qr, rrf, _) =>
      assert(rrf == 1.0 / (60.0 + b) + 1.0 / (60.0 + qr))
    }
  }

  test("zipf fit equals the closed-form least squares recomputed " +
      "driver-side and lands in the natural-language slope band") {
    import org.apache.spark.sql.functions._
    val freqs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()
    val top = freqs.sortBy { case (t, f) => (-f, t) }.take(Relevance.ZipfTop)
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val xy = top.zipWithIndex.map { case ((_, f), i) =>
      (q6(math.log((i + 1).toDouble)), q6(math.log(f.toDouble)))
    }
    def q12sum(vs: Seq[Double]) =
      vs.map(v => math.floor(v * 1e12 + 0.5).toLong).sum.toDouble / 1e12
    def q6sum(vs: Seq[Double]) =
      vs.map(v => math.floor(v * 1e6 + 0.5).toLong).sum.toDouble / 1e6
    val n = xy.length.toLong
    val sx = q6sum(xy.map(_._1)); val sy = q6sum(xy.map(_._2))
    val sxy = q12sum(xy.map(p => p._1 * p._2))
    val sxx = q12sum(xy.map(p => p._1 * p._1))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val Array((gn, gs, ge)) = Relevance.zipfFit(spark, TestSpark.sf)
      .as[(Long, Double, Double)].collect()
    assert(gn == n && gs == slope && ge == -slope)
    // corpus-health claim: a word-frequency corpus should live in the
    // broad Zipf band (negative, order −0.3..−2), not flat or positive
    assert(slope < -0.1 && slope > -3.0, s"slope $slope outside Zipf band")
  }

  test("burstiness: VMR equals the zero-inclusive driver recompute and " +
      "every reported term is genuinely super-Poisson") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val n = docs.length.toLong
    val perTerm = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").groupBy(identity).map {
        case (t, os) => (t, os.length.toLong)
      }
    }.groupBy(_._1).map { case (t, rows) =>
      val cf = rows.map(_._2).sum
      val cf2 = rows.map(r => r._2 * r._2).sum
      val df = rows.length.toLong
      val vmr = (cf2.toDouble / n.toDouble -
        (cf.toDouble / n.toDouble) * (cf.toDouble / n.toDouble)) /
        (cf.toDouble / n.toDouble)
      (t, cf, df, vmr)
    }
    val expect = perTerm.toSeq.sortBy(r => (-r._4, r._1))
      .take(Relevance.BurstTopN)
    val got = Relevance.burstiness(spark, TestSpark.sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expect, "burstiness table differs from driver recompute")
    // the head of the table must be super-Poisson and the corpus must
    // also CONTAIN near-Poisson terms the table correctly excludes
    assert(got.forall(_._4 > 1.0), "reported terms should clump")
    assert(got.length == math.min(Relevance.BurstTopN, perTerm.size))
    // dispersion must DISCRIMINATE: the band is not flat
    assert(got.head._4 > got.last._4 * 1.05,
      "VMR should separate clumpy terms from sprinkled ones")
  }

  test("heaps: beta and K equal the driver prefix-fit recompute; the " +
      "bounded-vocabulary corpus reads as closed (beta near 0)") {
    def q(x: Double, s: Double) = math.floor(x * s + 0.5) / s
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val mx = docs.map(_._1).max
    val P = Relevance.HeapsPoints
    def bucket(id: Long) = id * P / (mx + 1)
    val toks = docs.groupBy(r => bucket(r._1)).view
      .mapValues(_.map(_._2.trim.split("\\s+").length.toLong).sum).toMap
    val firstDoc = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val nv = firstDoc.values.groupBy(bucket).view
      .mapValues(_.size.toLong).toMap
    val ks = toks.keys.toSeq.sorted
    val pts = ks.map { k =>
      val cn = ks.filter(_ <= k).map(toks).sum
      val cv = ks.filter(_ <= k).map(j => nv.getOrElse(j, 0L)).sum
      (q(math.log(cn.toDouble), 1e6), q(math.log(cv.toDouble), 1e6))
    }
    def dsum(vs: Seq[Double], s: Double) =
      vs.map(v => math.floor(v * s + 0.5).toLong).sum / s
    val n = pts.length.toLong
    val sx = dsum(pts.map(_._1), 1e6); val sy = dsum(pts.map(_._2), 1e6)
    val sxy = dsum(pts.map(p => p._1 * p._2), 1e12)
    val sxx = dsum(pts.map(p => p._1 * p._1), 1e12)
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val kCoef = q(math.exp((sy - beta * sx) / n), 1e6)
    val (gn, gb, gk) = Relevance.heapsLaw(spark, TestSpark.sf)
      .as[(Long, Double, Double)].collect().head
    assert(gn == n && gb == beta && gk == kCoef)
    // corpus-health read: this synthetic corpus has a CLOSED ~50-word
    // vocabulary, so Heaps must diagnose it (β far below natural
    // text's ~0.5) — exactly the template-spam signature the op exists
    // to flag
    assert(gb >= 0.0 && gb < 0.2, s"closed vocabulary should fit flat, got $gb")
  }
}
