package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #319: per-dimension embedding stats vs a driver recompute of the
  * same quantized-moment arithmetic.
  */
class DimStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dim stats: every dimension's moments equal the quantized " +
      "recompute; complete dim coverage; variance non-negative") {
    val vecs = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select($"embedding").as[Array[Float]].collect()
    val d = vecs.head.length
    def qsum(xs: Seq[Double]): Double =
      xs.map(x => BigInt(math.floor(x * 1e12 + 0.5).toLong)).sum.toDouble / 1e12
    val rows = Isotropy.dimStats(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to d.toLong))
    rows.foreach { case (dim, n, nZero, mean, variance, mn, mx) =>
      val xs = vecs.map(v => v((dim - 1).toInt).toDouble).toSeq
      assert(n == xs.length.toLong, s"dim $dim n")
      assert(nZero == xs.count(_ == 0.0).toLong, s"dim $dim zeros")
      val sx = qsum(xs)
      val sxx = qsum(xs.map(x => x * x))
      assert(mean == sx / n, s"dim $dim mean")
      assert(variance == (sxx / n) - (sx / n) * (sx / n), s"dim $dim var")
      assert(variance >= 0.0, s"dim $dim var sign")
      assert(mn == xs.min && mx == xs.max, s"dim $dim extremes")
    }
    assert(rows.length == d)
  }
}
