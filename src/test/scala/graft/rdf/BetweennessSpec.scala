package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.PortableHash

/** #310 sampled bounded-distance betweenness — full driver Brandes
  * recompute (forward σ counting + backward quantized dependency
  * accumulation) at sf0.001.
  */
class BetweennessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("betweenness: every node's accumulated dependency equals the " +
      "two-phase Brandes recompute at the same seeds and hop bound") {
    val L = GraphAlgos.BetwIters
    val ents = Dict.entities(spark, TestSpark.sf)
      .select("id", "uri").as[(Long, String)].collect()
    val seeds = ents
      .map { case (id, uri) => (PortableHash.pHashJvm(s"betw|$uri"), uri, id) }
      .sortBy(t => (t._1, t._2)).take(GraphAlgos.BetwSeeds).map(_._3)
    val tri = Dict.encodedTriples(spark, TestSpark.sf)
      .select("sid", "oid").as[(Long, Long)].collect()
    val adj = (tri ++ tri.map(t => (t._2, t._1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    def q(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

    val perSeed = seeds.map { s =>
      // forward: BFS levels with path counts
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      for (k <- 1 to L) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        frontier.foreach { v =>
          adj.getOrElse(v, Array.empty).foreach { w =>
            if (!dist.contains(w)) next(w) = next.getOrElse(w, 0L) + sigma(v)
          }
        }
        next.foreach { case (w, sg) => dist(w) = k; sigma(w) = sg }
        frontier = next.keys.toSeq
      }
      // backward: quantized dependency per level, deepest first
      val delta = scala.collection.mutable.Map.empty[Long, Double]
      dist.filter(_._2 == L).keys.foreach(v => delta(v) = 0.0)
      for (k <- (L - 1) to 1 by -1) {
        dist.filter(_._2 == k).keys.foreach { v =>
          val terms = adj.getOrElse(v, Array.empty)
            .filter(w => dist.get(w).contains(k + 1))
            .map(w => q(sigma(v).toDouble / sigma(w) * (1.0 + delta(w))))
          delta(v) = terms.sum.toDouble / 1e6
        }
      }
      delta.toMap.filter { case (v, _) => dist(v) < L && dist(v) >= 1 }
    }
    val expect = perSeed.flatten
      .groupBy(_._1).view
      .mapValues(ds => (ds.length.toLong,
        ds.map(d => q(d._2)).sum.toDouble / 1e6))
      .toMap.filter(_._2._2 > 0.0)

    val got = GraphAlgos.betweenness(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.length == expect.size, "broker-node count")
    got.foreach { case (id, nSrc, bc) =>
      val (en, ebc) = expect(id)
      assert(nSrc == en, s"node $id n_sources")
      assert(bc == ebc, s"node $id betweenness")
    }
  }
}
