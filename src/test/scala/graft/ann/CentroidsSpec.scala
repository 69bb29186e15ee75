package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.VectorLsh

/** #253: per-language centroid OOD queue. */
class CentroidsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("centroids: the bottom-K queue equals a driver recompute with " +
      "quantized-mean centroids and ordered-fold cosines") {
    val ve = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val lang = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val byLang = ve.keys.toSeq.filter(lang.contains).groupBy(lang)
    val cent = byLang.map { case (l, ids) =>
      val n = ids.length
      l -> (0 until VectorLsh.EmbDim).map { d =>
        ids.map(id => math.floor(ve(id)(d) * 1e12 + 0.5).toLong).sum /
          1e12 / n
      }
    }
    def fold(f: Int => Double) =
      (0 until VectorLsh.EmbDim).foldLeft(0.0)((a, i) => a + f(i))
    def cos(a: Seq[Double], b: Seq[Double]) =
      fold(i => a(i) * b(i)) /
        (math.sqrt(fold(i => a(i) * a(i))) *
          math.sqrt(fold(i => b(i) * b(i))))
    val expect: Set[(String, Long, Double, Int)] =
      byLang.toSeq.flatMap { case (l, ids) =>
        ids.map(id => (l, id, cos(ve(id), cent(l))))
          .sortBy(r => (r._3, r._2)).take(Centroids.CentroidK)
          .zipWithIndex.map { case ((ll, id, c), i) => (ll, id, c, i + 1) }
      }.toSet
    val got = Centroids.langCentroids(spark, TestSpark.sf)
      .as[(String, Long, Double, Int)].collect().toSet
    assert(got == expect, "OOD queue differs from the driver recompute")
    assert(got.groupBy(_._1).forall(_._2.size == Centroids.CentroidK))
    // the queue must surface genuinely atypical docs: its mean cosine
    // sits strictly below the language mean
    val all: Seq[Double] = byLang.toSeq.flatMap { case (l, ids) =>
      ids.map(id => cos(ve(id), cent(l)))
    }
    val queueMean = got.toSeq.map(_._3).sum / got.size
    val corpusMean = all.sum / all.size
    assert(queueMean < corpusMean, "bottom-K should be below average")
  }
}
