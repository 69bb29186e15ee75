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
      "equal a byte-level recompute; frame budget conserves n_samples") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val got = Media.audioEnergy(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val frames = bytes.grouped(Media.AudioFrame).toArray
      val es = frames.map(_.map(b => { val v = (b & 0xff) - 128; (v * v).toLong }).sum)
      val silent = frames.indices.count(i =>
        es(i) < Media.SilenceT * frames(i).length)
      val (_, sr, nb, nsamp, nf, ns, pf, pe, me) = got(id)
      assert(sr == 8000L + (id % 5) * 2000L, s"rate of $id")
      assert(nb == bytes.length.toLong + 44L, s"container bytes of $id")
      assert(nsamp == bytes.length.toLong, s"samples of $id")
      assert(nf == frames.length.toLong, s"frames of $id")
      assert(ns == silent.toLong, s"silence of $id")
      if (bytes.nonEmpty) {
        val peakF = es.indices.maxBy(i => (es(i), -i))
        assert(pf == peakF.toLong && pe == es(peakF), s"peak of $id")
        assert(me == es.sum.toDouble / bytes.length, s"mean of $id")
      } else assert(pf == 0L && pe == 0L && me == 0.0, s"empty row of $id")
      assert(frames.map(_.length).sum == bytes.length, s"budget of $id")
    }
  }

  test("WAV decode reads REAL header bytes: tampered rate is returned, " +
      "unknown chunks are walked, empty data pins the zero row") {
    // canonical container round-trips
    val content = "hello audio".getBytes("UTF-8")
    val wav = Media.buildWav(12000, content)
    val (rate, ch, bits, dOff, dLen) = Media.parseWav(wav)
    assert(rate == 12000 && ch == 1 && bits == 8 && dLen == content.length)
    assert(wav.slice(dOff, dOff + dLen).toSeq == content.toSeq)
    // the parser reads BYTES, not construction arithmetic: tamper the
    // little-endian rate field and the parsed value follows the bytes
    val tampered = wav.clone()
    tampered(24) = 0x22.toByte; tampered(25) = 0x56.toByte // 22050 LE
    assert(Media.parseWav(tampered)._1 == 22050)
    // chunk walking: an unknown word-aligned chunk before data is skipped
    val junk = Array.fill[Byte](10)(7)
    val withList = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(wav, 0, 36) // RIFF..fmt chunk
      b.write("LIST".getBytes("US-ASCII")); b.write(Array[Byte](10, 0, 0, 0))
      b.write(junk) // even length: no RIFF pad byte
      b.write(wav, 36, wav.length - 36) // data chunk
      b.toByteArray
    }
    val (r2, _, _, dOff2, dLen2) = Media.parseWav(withList)
    assert(r2 == 12000 && dLen2 == content.length)
    assert(withList.slice(dOff2, dOff2 + dLen2).toSeq == content.toSeq)
    // non-WAV fails loudly
    intercept[IllegalArgumentException](Media.parseWav("BMnot".getBytes))
  }

  test("BMP decode reads REAL header bytes: round-trip, tamper, " +
      "and a valid 54-byte layout") {
    val bmp = Media.buildBmp(17, 9, "pixels!".getBytes("UTF-8"))
    // 17px × 3B = 51 → padded row 52; 54 + 52·9
    assert(bmp.length == 54 + 52 * 9)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val (w, h, bpp) = Media.parseBmp(bmp)
    assert(w == 17 && h == 9 && bpp == 24)
    // tampered width field → parsed value follows the bytes
    val t = bmp.clone(); t(18) = 0x2a // 42
    assert(Media.parseBmp(t)._1 == 42)
    intercept[IllegalArgumentException](Media.parseBmp(Array[Byte](1, 2, 3)))
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
