package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #286 community conductance and #287 the compaction plan — driver
  * recomputes plus the structural laws each rests on.
  */
class ConductanceCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("conductance: every community's cut/volume/φ equals a full " +
      "driver re-run of the deterministic LPA + the conductance " +
      "algebra over the co-purchase graph; cut edges conserved") {
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val eu = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val ue = eu.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val verts = ue.map(_._1).distinct
    // synchronous LPA, the #160 vote rule: majority label among
    // in-neighbors, ties to the smallest label, isolated keep their own
    var labels = verts.map(v => v -> v).toMap
    val inN = ue.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    (1 to GraphAlgos.LpaIters).foreach { _ =>
      val next = verts.map { v =>
        val votes = inN.getOrElse(v, Seq.empty).map(labels)
          .groupBy(identity).view.mapValues(_.size).toSeq
        if (votes.isEmpty) v -> labels(v)
        else v -> votes.minBy { case (l, c) => (-c, l) }._1
      }.toMap
      labels = next
    }
    val mTotal = ue.length.toLong
    val deg = ue.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val members = labels.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    // keys is a Set — convert before mapping to degrees, or equal
    // degree values would dedupe out of the sum
    val vol = labels.keys.toSeq.groupBy(labels).view
      .mapValues(_.map(deg).sum).toMap
    val lin = ue.filter { case (s, o) => labels(s) == labels(o) }
      .groupBy(p => labels(p._1)).view.mapValues(_.length.toLong).toMap
    val got = GraphAlgos.conductance(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
    assert(got.map(_._1).toSet == members.keySet, "community sets")
    got.foreach { case (lbl, n, v, cut, phi) =>
      assert(n == members(lbl), s"members of $lbl")
      assert(v == vol(lbl), s"volume of $lbl")
      assert(cut == vol(lbl) - lin.getOrElse(lbl, 0L), s"cut of $lbl")
      val mn = math.min(v, mTotal - v)
      if (mn > 0) assert(phi.contains(cut.toDouble / mn), s"phi of $lbl")
      else assert(phi.isEmpty, s"phi of whole-graph community $lbl")
      assert(phi.forall(p => p >= 0.0 && p <= 1.0), s"phi range of $lbl")
    }
    // conservation: Σ cut counts each boundary edge once per side
    val boundary = ue.count { case (s, o) => labels(s) != labels(o) }
    assert(got.map(_._4).sum == boundary.toLong, "cut budget")
    // the co-purchase graph (unlike the layered triple graph, where
    // synchronous LPA oscillates into independent sets) carries REAL
    // internal edges: communities are not vacuous
    assert(lin.values.sum > 0, "no intra-community edges — the metric " +
      "would be vacuous on this graph")
  }

  test("compaction plan: groups equal the greedy cumulative-fill " +
      "recompute, never cross a day, and conserve the event budget") {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val rows = e.selectExpr(
        s"${graft.relational.Events.tsNanos(e)} DIV 1000000000 AS ts_s")
      .as[Long].collect()
    val files = rows.groupBy(t => (t / 86400L, (t / 3600L) % 24L)).view
      .mapValues(_.size.toLong).toSeq
      .map { case ((d, h), n) => (d, h, n) }.sortBy(r => (r._1, r._2))
    val target = graft.sources.ZOrder.CompactTarget
    val expect = files.groupBy(_._1).toSeq.flatMap { case (d, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, h, n) =>
        val g = cum / target; cum += n; (d, g, h, n)
      }
    }.groupBy(r => (r._1, r._2)).view.mapValues { fs =>
      (fs.size.toLong, fs.map(_._4).sum, fs.map(_._3).min, fs.map(_._3).max)
    }.toMap
    val got = graft.sources.ZOrder.compactPlan(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == expect.size, "group count")
    got.foreach { case (d, g, nf, nr, hmin, hmax) =>
      assert((nf, nr, hmin, hmax) == expect((d, g)), s"group ($d, $g)")
    }
    assert(got.map(_._4).sum == rows.length.toLong, "event budget")
    // groups never cross a day by construction of the partitioned window
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
  }
}
