package graft.kge

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.PortableHash

/** #314 eval-by-category and #315 vocabulary drift — driver recomputes. */
class CategoryVocabDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("eval by category: every (category, direction) cell equals the " +
      "rank-frame recompute; each direction partitions the test slice") {
    val cats = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
      .select("pid", "sid", "oid").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (pid, ts) =>
        val (n, h, t) =
          (ts.length.toDouble, ts.map(_._2).distinct.length,
            ts.map(_._3).distinct.length)
        val (tph, hpt) = (n / h, n / t)
        pid -> (if (tph < 1.5 && hpt < 1.5) "1-1"
          else if (tph >= 1.5 && hpt < 1.5) "1-N"
          else if (tph < 1.5 && hpt >= 1.5) "N-1" else "N-N")
      }
    val tails = RankingEval.ranks(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().map(r => ("tail", r._2, r._4))
    val heads = RankingEval.ranksHead(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().map(r => ("head", r._2, r._4))
    val all = tails ++ heads
    val expect = all.groupBy(r => (cats(r._2), r._1)).view.mapValues { rs =>
      val n = rs.length
      val mrr = rs.map(r =>
        math.floor(1.0 / r._3 * 1e6 + 0.5).toLong).sum.toDouble / 1e6 / n
      (n.toLong, mrr, rs.count(_._3 <= 10).toDouble / n,
        rs.map(_._3).sum.toDouble / n)
    }.toMap
    val got = RankingEval.evalByCategory(spark, TestSpark.sf)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (cat, dir, n, mrr, h10, mr) =>
      val (en, eMrr, eH10, eMr) = expect((cat, dir))
      assert(n == en, s"($cat, $dir) n_test")
      assert(mrr == eMrr, s"($cat, $dir) mrr")
      assert(h10 == eH10 && mr == eMr, s"($cat, $dir) rates")
    }
    // each direction partitions its slice
    Seq("tail", "head").foreach { d =>
      assert(got.filter(_._2 == d).map(_._3).sum ==
        all.count(_._1 == d).toLong, s"$d partition")
    }
  }

  test("vocab drift: per-source JS over hashed slots equals the " +
      "quantized recompute; bounded by ln 2") {
    val m = graft.text.Features.NSlots
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("source", "text").as[(String, String)].collect()
    def slots(t: String): Seq[Long] = {
      val ws = t.trim.split("\\s+").toSeq
      val feats = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      feats.map(f => {
        val h = PortableHash.pHashJvm(s"FH|$f") % m
        if (h < 0) h + m else h
      })
    }
    val rows = docs.flatMap { case (src, t) => slots(t).map(src -> _) }
    val totalBy = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nSlots = totalBy.size.toLong
    val nT = rows.length.toLong
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val nS = rs.length.toLong
      val cBy = rs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val js = totalBy.keys.toSeq.sorted.map { b =>
        val c = cBy.getOrElse(b, 0L); val ct = totalBy(b)
        val numP = (c + 1L).toDouble * (nT - nS + nSlots).toDouble
        val numQ = (ct - c + 1L).toDouble * (nS + nSlots).toDouble
        val p = (c + 1L).toDouble / (nS + nSlots).toDouble
        val q = (ct - c + 1L).toDouble / (nT - nS + nSlots).toDouble
        val term = 0.5 * p * math.log(2.0 * numP / (numP + numQ)) +
          0.5 * q * math.log(2.0 * numQ / (numP + numQ))
        math.floor(term * 1e6 + 0.5).toLong
      }.sum.toDouble / 1e6
      src -> (nS, js)
    }
    val got = graft.text.Features.vocabDrift(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (src, nf, nsl, js, jsn) =>
      val (eN, eJs) = expect(src)
      assert(nf == eN, s"$src n_feats")
      assert(nsl == nSlots, s"$src n_slots")
      assert(js == eJs, s"$src js")
      assert(js >= 0.0 && js <= 0.6931471805599453 + 1e-9)
      assert(jsn == js / 0.6931471805599453)
    }
  }
}
