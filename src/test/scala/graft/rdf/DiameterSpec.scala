package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #322: sampled bounded-distance diameter / distance CDF vs a full
  * driver BFS recompute from the same hash-min seeds.
  */
class DiameterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distance histogram equals a driver multi-source BFS; cum/frac " +
      "close the CDF; effective diameter is readable off the table") {
    import graft.core.PortableHash.pHashJvm
    val ents = Dict.entities(spark, TestSpark.sf)
      .select($"id", $"uri").as[(Long, String)].collect()
    val seeds = ents.map { case (id, uri) => (pHashJvm(s"diam|$uri"), uri, id) }
      .sortBy(t => (t._1, t._2)).take(GraphAlgos.DiamSeeds).map(_._3)
    val edges = Dict.encodedTriples(spark, TestSpark.sf)
      .select($"sid", $"oid").as[(Long, Long)].collect()
    val adj = (edges ++ edges.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    // driver BFS per seed, bounded at DiamIters hops
    val dist = scala.collection.mutable.Map[(Long, Long), Long]()
    seeds.foreach { s =>
      dist((s, s)) = 0L
      var frontier = Set(s)
      var d = 0L
      while (frontier.nonEmpty && d < GraphAlgos.DiamIters) {
        d += 1
        frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
          .filter(v => !dist.contains((s, v)))
        frontier.foreach(v => dist((s, v)) = d)
      }
    }
    val expectHist = dist.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = dist.size.toLong
    val diamLb = dist.values.max

    val got = GraphAlgos.diameter(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toMap == expectHist)
    var cum = 0L
    got.foreach { case (d, n, c, f, lb) =>
      cum += n
      assert(c == cum, s"cum at $d")
      assert(f == cum.toDouble / total.toDouble, s"frac at $d")
      assert(lb == diamLb)
    }
    assert(cum == total)
    // effective diameter: smallest d with >=90% of reached pairs
    val dEff = got.find(_._4 >= 0.9).map(_._1).get
    assert(dEff <= diamLb && dEff >= 0L)
  }
}
