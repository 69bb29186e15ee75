package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #298 path census — driver recompute + the degree-product
  * conservation law that pins the join produced every path exactly once.
  */
class PathCensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("path counts, endpoint pairs and multiplicity equal a driver " +
      "recompute; total paths conserve the in·out degree products") {
    val enc = Dict.encodedTriples(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val bySubj = enc.groupBy(_._1)
    val exp = enc.flatMap { case (a, p1, b) =>
      bySubj.getOrElse(b, Array.empty).map { case (_, p2, c) =>
        (p1, p2, a, c)
      }
    }
    val expByPair = exp.groupBy(t => (t._1, t._2))
    val got = Inference.pathCensus(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == expByPair.keySet)
    expByPair.foreach { case (k, paths) =>
      val (_, _, nPaths, nPairs, mult) = got(k)
      assert(nPaths == paths.length.toLong, s"paths of $k")
      val pairs = paths.map(t => (t._3, t._4)).distinct.length
      assert(nPairs == pairs.toLong, s"pairs of $k")
      assert(mult == paths.length.toDouble / pairs, s"multiplicity of $k")
    }
    // conservation: Σ n_paths over all pairs = Σ_b in(b)·out(b)
    val in = enc.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val out = enc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val prod = (in.keySet & out.keySet).iterator
      .map(b => in(b) * out(b)).sum
    assert(got.values.map(_._3).sum == prod, "degree-product budget")
    // the graph genuinely composes (the census is not vacuous here)
    assert(got.values.map(_._3).sum > 0)
  }
}
