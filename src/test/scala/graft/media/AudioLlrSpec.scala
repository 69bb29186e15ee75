package graft.media

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #278 audio energy profile and #279 LLR collocations — driver
  * recomputes plus the structural properties each exists for.
  */
class AudioLlrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("audio energy: frames, silence, peak (first-max tie), and mean " +
      "equal a byte-level recompute; frame budget conserves n_bytes") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val got = Media.audioEnergy(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val frames = bytes.grouped(Media.AudioFrame).toArray
      val es = frames.map(_.map(b => { val v = (b & 0xff) - 128; (v * v).toLong }).sum)
      val silent = frames.indices.count(i =>
        es(i) < Media.SilenceT * frames(i).length)
      val peakF = es.indices.maxBy(i => (es(i), -i))
      val (_, nb, nf, ns, pf, pe, me) = got(id)
      assert(nb == bytes.length.toLong, s"bytes of $id")
      assert(nf == frames.length.toLong, s"frames of $id")
      assert(ns == silent.toLong, s"silence of $id")
      assert(pf == peakF.toLong && pe == es(peakF), s"peak of $id")
      assert(me == es.sum.toDouble / bytes.length, s"mean of $id")
      assert(frames.map(_.length).sum == bytes.length, s"budget of $id")
    }
  }

  test("LLR collocations: the top-50 equals a contingency recompute " +
      "with quantized ln; G² is nonnegative and grows with evidence at " +
      "fixed lift") {
    val pairs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"text").as[String].collect()
      .flatMap { t =>
        val ws = t.trim.split("\\s+")
        ws.dropRight(1).zip(ws.drop(1))
      }
    val n = pairs.length.toLong
    val k = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r1 = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c1 = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def qln(x: Long) = math.floor(math.log(x.toDouble) * 1e6 + 0.5) / 1e6
    def xlx(x: Long) = if (x > 0) x.toDouble * qln(x) else 0.0
    def llr(k11: Long, r: Long, c: Long, nn: Long = n): Double = 2.0 *
      (xlx(k11) + xlx(r - k11) + xlx(c - k11) + xlx(nn - r - c + k11) +
        xlx(nn) - xlx(r) - xlx(nn - r) - xlx(c) - xlx(nn - c))
    val expect = k.toSeq
      .filter(_._2 >= graft.text.Features.LlrMinCount)
      .map { case ((a, b), k11) => (a, b, k11, llr(k11, r1(a), c1(b))) }
      .sortBy(t => (-t._4, t._1, t._2)).take(graft.text.Features.LlrTopN)
    val got = graft.text.Features.llrCollocations(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Long, Double, Int)].collect()
      .sortBy(_._7)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((w1, w2, k11, _, _, g, rk), (a, b, ek, el)) =>
      assert((w1, w2, k11, g) == ((a, b, ek, el)), s"rank $rk")
      assert(g >= -1e-9, s"negative G² at rank $rk")
    }
    // evidence monotonicity: doubling every cell of a table doubles G²
    // (fixed lift, more evidence) — checked on the top pair's table
    val (a, b, k11, _) = expect.head
    assert(llr(2 * k11, 2 * r1(a), 2 * c1(b), 2 * n) >
        llr(k11, r1(a), c1(b)),
      "G² did not grow with evidence at fixed lift")
  }
}
