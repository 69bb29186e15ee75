package graft.media

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #199 perceptual-hash dedup: the banded emission must equal the
  * brute-force characterization (every a<b pair sharing ≥1 band with
  * Hamming ≤ 6, bucket cap never binding at this SF), recomputed
  * driver-side from the raw payload bytes.
  */
class MediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ahash(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val n = bytes.length
    val stride = math.max(1, n / 64)
    val codes = Array.tabulate(64)(k => bytes(math.min(k * stride, n - 1)) & 0xff)
    val s = codes.sum
    def band(lo: Int): Int =
      (0 until 16).map(k => if (codes(lo + k) * 64 > s) 1 << k else 0).sum
    (band(0), band(16), band(32), band(48))
  }

  test("ahash dedup equals the brute banded-pair characterization, and " +
      "the oracle's byte==codepoint premise holds") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    // the DuckDB oracle hashes CODEPOINTS; the Spark side hashes BYTES —
    // equal only while the corpus is ASCII. Pin that premise.
    assert(docs.forall(_._2.forall(_ < 128)), "corpus must be ASCII")
    val hs = docs.map { case (id, t) => id -> ahash(t.getBytes("UTF-8")) }.toMap
    def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    def shares(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Boolean =
      a._1 == b._1 || a._2 == b._2 || a._3 == b._3 || a._4 == b._4
    // cap never binds here — verify, so the brute recount below is exact
    val bandCounts = hs.values.toSeq
      .flatMap(h => Seq((0, h._1), (1, h._2), (2, h._3), (3, h._4)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(bandCounts.values.max <= Media.BandCap,
      "bucket cap binds at this SF; the brute recount would diverge")
    val ids = docs.map(_._1).sorted
    val expect = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = hs(ids(i)); b = hs(ids(j))
      if shares(a, b) && hamming(a, b) <= Media.HammingMax
    } yield (ids(i), ids(j), hamming(a, b).toLong)).toSet
    val got = Media.ahashDedup(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
    // exact duplicate payloads exist in the corpus → Hamming-0 pairs
    assert(got.exists(_._3 == 0L), "planted exact dups must collide at 0")
  }

  test("caption pairs: gates, exact caption dedup, and append-stable " +
      "split equal the driver recompute") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect()
    val gated = docs.filter { case (_, _, lang, n) =>
      n >= Media.CapMinChars && n <= Media.CapMaxChars &&
        Set("en", "de", "fr", "es")(lang)
    }
    assert(gated.nonEmpty && gated.length < docs.length,
      "the gate must both keep and drop documents")
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val keepers = gated.groupBy(d => md5hex(d._2.trim.toLowerCase))
      .map { case (_, g) => g.minBy(_._1) }.toSeq
    val expect = keepers.map { case (id, text, lang, _) =>
      val nb = text.getBytes("UTF-8").length.toLong
      val split =
        if (graft.core.PortableHash.pHashJvm(s"pairsplit|$id") % 100 <
          Media.TrainPct) "train" else "val"
      (id, lang, text.length.toLong, nb,
        320L + (nb * 7L + id) % 1280L, 240L + (id * 13L) % 720L, split)
    }.toSet
    val got = Media.captionPairs(spark, TestSpark.sf)
      .select("doc_id", "lang", "cap_len", "n_bytes", "width", "height", "split")
      .as[(Long, String, Long, Long, Long, Long, String)].collect().toSet
    assert(got == expect)
    // both splits must be non-empty at this SF for the set to train
    val splits = got.groupBy(_._7).view.mapValues(_.size).toMap
    assert(splits.getOrElse("train", 0) > 0 && splits.getOrElse("val", 0) > 0)
  }

  test("scene cuts: signatures, hamming and scene ids equal the driver " +
      "recompute; scenes segment every video; cuts actually occur") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expect = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val nFrames = 1L + n % 24L
      val stride = math.max(1, n / 16)
      val sigs = (0L until nFrames).map { idx =>
        val codes = Array.tabulate(16)(k =>
          bytes(((idx + k * stride) % n).toInt) & 0xff)
        val s = codes.sum
        (0 until 16).map(k => if (codes(k) * 16 > s) 1 << k else 0).sum
      }
      var scene = 0L
      sigs.zipWithIndex.map { case (sig, i) =>
        val ham = if (i == 0) None
          else Some(java.lang.Integer.bitCount(sig ^ sigs(i - 1)).toLong)
        if (ham.exists(_ > Media.SceneCutBits)) scene += 1
        (id, i.toLong, i * Media.FrameMs, ham, scene)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = Media.sceneCuts(spark, TestSpark.sf)
      .as[(Long, Long, Long, Option[Long], Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == expect, "scene table differs from the driver recompute")
    // every video starts in scene 0 with a NULL hamming
    assert(got.filter(_._2 == 0L).forall(r => r._4.isEmpty && r._5 == 0L))
    // the statistic must fire: some video has >1 scene
    assert(got.exists(_._5 >= 1L), "no scene cut detected anywhere")
  }
}
