package graft.media

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #306 rank-vs-degree eval bias table and #307 perceptual DCT hash —
  * driver recomputes of the defining semantics.
  */
class PhashDegreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("phash: dc and the 63 sign bits equal a first-principles " +
      "recompute (pixel cycling, two-stage quantized DCT); dc is the " +
      "exact sampled-luma total; dims match the metadata decode") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._1 % 3 == 0)
    val cos = Array.tabulate(8, 8)((u, x) =>
      math.cos(math.Pi * (2 * x + 1) * u / 16.0))
    def q(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val expect = docs.map { case (id, text) =>
      val content = text.getBytes("UTF-8")
      val n = content.length
      val w = 4 + n % 60
      val h = (2 + id % 14).toInt
      val rowSize = ((3 * w + 3) / 4) * 4
      def dataByte(off: Int): Int =
        if (n == 0) 0 else content(off % n) & 0xff
      val lum = Array.tabulate(8, 8) { (gy, gx) =>
        val yi = gy * h / 8; val xi = gx * w / 8
        (0 until 3).map(c => dataByte(yi * rowSize + xi * 3 + c)).sum.toLong
      }
      // stage 1: G(u, y) = quantized Σ_x L(x, y)·C[u][x]
      val g = Array.tabulate(8, 8)((u, y) =>
        (0 until 8).map(x => q(lum(y)(x) * cos(u)(x))).sum.toDouble / 1e6)
      // stage 2: F(u, v) = quantized Σ_y G(u, y)·C[v][y]
      val f = Array.tabulate(8, 8)((u, v) =>
        (0 until 8).map(y => q(g(u)(y) * cos(v)(y))).sum.toDouble / 1e6)
      val ph = (for (u <- 0 until 8; v <- 0 until 8; if u > 0 || v > 0)
        yield if (f(u)(v) > 0.0) 1L << (u * 8 + v - 1) else 0L).sum
      id -> (w.toLong, h.toLong, f(0)(0), ph, lum.flatten.sum)
    }.toMap
    val got = Media.phash(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (id, w, h, dc, ph) =>
      val (ew, eh, edc, eph, lumTotal) = expect(id)
      assert(w == ew && h == eh, s"doc $id dims")
      assert(dc == edc, s"doc $id dc")
      // DC physics: C[0][·] = 1, so F(0,0) is the exact luma total
      assert(dc == lumTotal.toDouble, s"doc $id dc ≠ luma total")
      assert(ph == eph, s"doc $id phash")
      assert(ph >= 0L, s"doc $id sign bit 63 must be unused")
    }
    // dims agree with the metadata decode for the same bucket
    val meta = Media.metadata(spark, TestSpark.sf)
      .filter($"fmt" === "bmp")
      .select("doc_id", "width", "height")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (id, w, h, _, _) => assert(meta(id) == ((w, h))) }
  }

  test("rank-by-degree: every bucket row equals the rank-frame " +
      "recompute; buckets partition the test slice") {
    val ranks = graft.kge.RankingEval.ranks(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect() // sid, pid, oid, rank
    val deg = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
      .groupBy("oid").count()
      .as[(Long, Long)].collect().toMap
    val byBucket = ranks.groupBy(r => deg(r._3).toString.length.toLong)
    val got = graft.kge.RankingEval.evalByDegree(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == byBucket.size)
    got.foreach { case (dd, n, mnd, mxd, mrr, h10, mr) =>
      val rows = byBucket(dd)
      assert(n == rows.length.toLong, s"bucket $dd n_test")
      val degs = rows.map(r => deg(r._3))
      assert(mnd == degs.min && mxd == degs.max, s"bucket $dd range")
      val eMrr = rows.map(r =>
        math.floor(1.0 / r._4 * 1e6 + 0.5).toLong).sum.toDouble / 1e6 / n
      assert(mrr == eMrr, s"bucket $dd mrr")
      assert(h10 == rows.count(_._4 <= 10).toDouble / n, s"bucket $dd hits10")
      assert(mr == rows.map(_._4).sum.toDouble / n, s"bucket $dd mean_rank")
    }
    assert(got.map(_._2).sum == ranks.length.toLong, "buckets partition")
  }
}
