package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #318: pairwise source-vocabulary overlap vs a driver recompute. */
class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("source overlap: every pair's counts and ratios equal the " +
      "set recompute; jaccard <= overlap coefficient; symmetric inputs") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"source", $"text").as[(String, String)].collect()
    val vocab = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.trim.split("\\s+")).toSet
    }
    val got = Features.sourceOverlap(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    val sources = vocab.keys.toSeq.sorted
    val expectPairs = (for {
      a <- sources; b <- sources if a < b
      if (vocab(a) intersect vocab(b)).nonEmpty
    } yield (a, b)).toSet
    assert(got.map(r => (r._1, r._2)).toSet == expectPairs)
    got.foreach { case (a, b, na, nb, nc, j, oc) =>
      val inter = (vocab(a) intersect vocab(b)).size.toLong
      assert(na == vocab(a).size.toLong && nb == vocab(b).size.toLong, (a, b))
      assert(nc == inter, (a, b))
      assert(j == inter.toDouble / (na + nb - inter).toDouble, (a, b))
      assert(oc == inter.toDouble / math.min(na, nb).toDouble, (a, b))
      assert(j <= oc, s"jaccard can never exceed containment ($a, $b)")
    }
  }
}
