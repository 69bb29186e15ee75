package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #270: the isotropy report — the sum identity against the BRUTE O(n²)
  * pairwise mean it replaces, and the anisotropy ordering the mean-norm
  * column implies.
  */
class IsotropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mean pairwise cosine equals the brute pairwise average (within " +
      "the quantization budget) and the identity ties to mean_norm") {
    val vs = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select($"label", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (l, v) =>
        val d = v.map(_.toDouble).toArray
        val nrm = math.sqrt(d.map(x => x * x).sum)
        (l, d.map(_ / nrm))
      }
    val got = Isotropy.isotropy(spark, TestSpark.sf)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // overall row present alongside every label
    assert(got.keySet == vs.map(_._1).toSet + (-1L))
    def brute(us: Array[Array[Double]]): Double = {
      val n = us.length
      var s = 0.0
      for (i <- us.indices; j <- us.indices if i != j)
        s += us(i).zip(us(j)).map(p => p._1 * p._2).sum
      s / (n.toDouble * (n - 1))
    }
    (vs.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq :+
        (-1L, vs.map(_._2))).foreach { case (l, us) =>
      val (_, n, meanCos, meanNorm) = got(l)
      assert(n == us.length.toLong, s"n for label $l")
      assert(math.abs(meanCos - brute(us.toArray)) < 1e-6,
        s"identity vs brute for label $l")
      // identity: mean_cos = (n²·mean_norm² − T)/(n(n−1)) with T ≈ n,
      // so mean_norm² ≈ (mean_cos·(n−1) + 1)/n
      val implied = (meanCos * (n - 1) + 1.0) / n
      assert(math.abs(meanNorm * meanNorm - implied) < 1e-6,
        s"mean_norm identity for label $l")
    }
    // random unit vectors in 64-d: per-label clusters (if any) can only
    // raise the within-label mean cosine above the corpus mean
    val overall = got(-1L)._3
    assert(got.filterKeys(_ >= 0).values.forall(_._3 >= overall - 0.05),
      "a label sits implausibly far below the corpus mean cosine")
  }
}
