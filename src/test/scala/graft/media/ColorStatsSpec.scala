package graft.media

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #320: full-frame color stats — recompute from an independent byte
  * walk of the same real BMP files, plus the tamper-honesty property
  * (the operator reports what the PIXELS say, not the construction).
  */
class ColorStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("color stats: channel sums equal an independent stride-honoring " +
      "byte walk; means and brightness are the single divisions") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expect = docs.map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val w = 4 + bytes.length % 60
      val h = (2 + id % 14).toInt
      val rowSize = ((3 * w + 3) / 4) * 4
      var b = 0L; var g = 0L; var r = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val base = y * rowSize + x * 3
        def px(off: Int): Long =
          if (bytes.isEmpty) 0L else (bytes((base + off) % bytes.length) & 0xff).toLong
        b += px(0); g += px(1); r += px(2)
      }
      id -> ((w.toLong, h.toLong, w.toLong * h, b, g, r))
    }.toMap
    val got = Media.colorStats(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
    assert(got.length == expect.size)
    got.foreach { case (id, w, h, n, b, g, r, bm, gm, rm, br) =>
      assert((w, h, n, b, g, r) == expect(id), s"doc $id")
      assert(bm == b.toDouble / n && gm == g.toDouble / n &&
        rm == r.toDouble / n, s"doc $id means")
      assert(br == (b + g + r).toDouble / (3.0 * n), s"doc $id brightness")
    }
  }

  test("the decode reads pixels, not the construction: a tampered pixel " +
      "byte moves the reported sum") {
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val bmp = Media.buildBmp(5, 3, bytes)
    val (w, h, _) = Media.parseBmp(bmp)
    assert((w, h) == (5, 3))
    // tamper one pixel byte (first pixel, blue channel) by +1
    val tampered = bmp.clone()
    tampered(54) = ((tampered(54) + 1) & 0xff).toByte
    def sums(img: Array[Byte]): (Long, Long, Long) = {
      val rowSize = ((3 * w + 3) / 4) * 4
      var b = 0L; var g = 0L; var r = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val base = 54 + y * rowSize + x * 3
        b += img(base) & 0xff; g += img(base + 1) & 0xff
        r += img(base + 2) & 0xff
      }
      (b, g, r)
    }
    val (b0, g0, r0) = sums(bmp)
    val (b1, g1, r1) = sums(tampered)
    assert(g0 == g1 && r0 == r1 && (b1 - b0).abs == 1L,
      "only the tampered channel moves, by exactly the tamper")
  }
}
