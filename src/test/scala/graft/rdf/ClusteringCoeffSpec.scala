package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #266: local clustering coefficients vs a brute driver recompute on the
  * co-purchase graph, plus the corner-conservation law against #157.
  */
class ClusteringCoeffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val edges: Set[(Long, Long)] = {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
  }

  test("per-node degree/triangles/coefficient equal the brute recompute; " +
      "corner counts conserve 3x the global triangle count") {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val got = GraphAlgos.clusteringCoeff(spark, TestSpark.sf)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.map(_._1).toSet == adj.keySet, "vertex sets differ")
    got.foreach { case (v, d, t, c) =>
      assert(d == adj(v).size.toLong, s"degree of $v")
      val expT = adj(v).toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      assert(t == expT.toLong, s"triangles at $v")
      if (d >= 2)
        assert(c.contains(2.0 * expT / (d * (d - 1))), s"coeff at $v")
      else assert(c.isEmpty, s"degree-1 coeff at $v should be NULL")
    }
    val totalTri = GraphAlgos.triangles(spark, TestSpark.sf)
      .select($"n_triangles").as[Long].head()
    assert(got.map(_._3).sum == 3 * totalTri,
      "corner counts != 3 x global triangles")
  }
}
