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

  test("adversarial: scores equal the exact TransE recompute, weights " +
      "are the stabilized softmax, hardest negative carries max weight") {
    import graft.kge.Embeddings
    val emb = Embeddings.entityEmb(spark, TestSpark.sf)
      .as[(Long, Seq[Double])].collect().toMap
    val rel = Embeddings.relationEmb(spark, TestSpark.sf)
      .as[(Long, Seq[Double])].collect().toMap
    def score(s: Long, p: Long, o: Long): Double =
      -emb(s).indices.map { i =>
        val d = emb(s)(i) + rel(p)(i) - emb(o)(i); d * d
      }.sum
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Rdf.negSampleAdversarial(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    val byPos = got.groupBy(r => (r._1, r._2, r._3))
    assert(byPos.nonEmpty)
    byPos.foreach { case ((s, p, o), rows) =>
      assert(rows.length == Rdf.AdvK, s"K draws per positive ($s,$p,$o)")
      assert(rows.map(_._4).sorted.toSeq == (0L until Rdf.AdvK.toLong),
        "one row per salt")
      rows.foreach(r => assert(r._6 == score(s, p, r._5),
        s"score of neg ${r._5}"))
      assert(rows.forall(_._5 != o), "the true object is never a negative")
      val mx = rows.map(_._6).max
      val terms = rows.map(r => r._4 -> q6(
        math.exp(Rdf.AdvAlpha * (r._6 - mx)))).toMap
      val denom =
        terms.values.map(t => math.floor(t * 1e6 + 0.5).toLong).sum / 1e6
      rows.foreach(r => assert(r._7 == terms(r._4) / denom,
        s"weight of draw ${r._4}"))
      // the hardest (max-score) negative is the softmax argmax: its
      // term is exp(0) = 1 exactly, strictly ≥ every other term
      val hard = rows.maxBy(_._6)
      assert(rows.forall(_._7 <= hard._7))
      // weights form a distribution up to the 1e-6 term quantization
      assert(math.abs(rows.map(_._7).sum - 1.0) < 1e-4)
    }
    // adversarial weighting must actually DISCRIMINATE somewhere:
    // some positive's weights are not uniform
    assert(byPos.values.exists(rs =>
      rs.map(_._7).max - rs.map(_._7).min > 0.1))
  }
}
