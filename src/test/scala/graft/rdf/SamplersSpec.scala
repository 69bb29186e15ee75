package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #169-171: relation categorization + the bern / type-constrained
  * negative samplers.
  */
class SamplersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("relation cats: tph/hpt identities and category cuts hold per relation") {
    val enc = Dict.encodedTriples(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val byRel = enc.groupBy(_._2)
    val out = Rdf.relationCats(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double, String)].collect()
    assert(out.length == byRel.size)
    out.foreach { case (pid, n, h, t, tph, hpt, cat) =>
      val rows = byRel(pid)
      assert(n == rows.length)
      assert(h == rows.map(_._1).distinct.length)
      assert(t == rows.map(_._3).distinct.length)
      assert(tph == n.toDouble / h)
      assert(hpt == n.toDouble / t)
      val expected = (tph >= 1.5, hpt >= 1.5) match {
        case (false, false) => "1-1"
        case (true, false)  => "1-N"
        case (false, true)  => "N-1"
        case (true, true)   => "N-N"
      }
      assert(cat == expected, s"pid=$pid tph=$tph hpt=$hpt")
    }
  }

  test("bern: every negative corrupts exactly the declared slot and head rate tracks t/(h+t)") {
    val out = Rdf.negSampleBernoulli(spark, TestSpark.sf)
      .as[(Long, Long, Long, String, Long, Long)].collect()
    val enc = Dict.encodedTriples(spark, TestSpark.sf).as[(Long, Long, Long)].collect()
    assert(out.length == enc.length) // one negative per positive, no drops
    out.foreach { case (sid, pid, oid, side, nsid, noid) =>
      if (side == "head") { assert(nsid != sid && noid == oid) }
      else { assert(side == "tail"); assert(nsid == sid && noid != oid) }
    }
    // head-corruption rate per relation ≈ n_tails/(n_heads+n_tails):
    // the draw is uniform over a 60-bit hash, so at n>=1000 triples the
    // empirical rate sits within 5 points of the target.
    val byRel = enc.groupBy(_._2)
    out.groupBy(_._2).foreach { case (pid, rows) =>
      if (rows.length >= 1000) {
        val h = byRel(pid).map(_._1).distinct.length.toDouble
        val t = byRel(pid).map(_._3).distinct.length.toDouble
        val rate = rows.count(_._4 == "head").toDouble / rows.length
        assert(math.abs(rate - t / (h + t)) < 0.05, s"pid=$pid rate=$rate target=${t / (h + t)}")
      }
    }
  }

  test("typed: replacements come from the relation's own slot pool and no positive leaks") {
    val enc = Dict.encodedTriples(spark, TestSpark.sf).as[(Long, Long, Long)].collect()
    val positives = enc.toSet
    val heads = enc.groupBy(_._2).map { case (p, r) => p -> r.map(_._1).toSet }
    val tails = enc.groupBy(_._2).map { case (p, r) => p -> r.map(_._3).toSet }
    val out = Rdf.negSampleTyped(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // a RATE, not a guarantee (positive-collisions rejected) — but the
    // reject should not gut the sample
    assert(out.length > enc.length / 2)
    out.foreach { case (sid, pid, oid, slot, nsid, noid) =>
      assert(!positives.contains((nsid, pid, noid)))
      if (slot == 0L) { assert(noid == oid && heads(pid).contains(nsid)) }
      else { assert(slot == 1L); assert(nsid == sid && tails(pid).contains(noid)) }
    }
    // slot choice is hash-balanced
    val headShare = out.count(_._4 == 0L).toDouble / out.length
    assert(headShare > 0.35 && headShare < 0.65)
  }
}
