package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #308 SPARQL property paths and #309 importance-weight ESS — driver
  * recomputes of the defining semantics.
  */
class PathEssSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("property paths: all three endpoint-pair sets equal recounts " +
      "from the BASE relational tables; alternation dominates the " +
      "sequence; inversion is role-swap, not a new operator") {
    val sf = TestSpark.sf
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .as[(Long, Long, Long)].collect()
    val cn = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val sn = graft.core.Tables.supplier(spark, sf)
      .select("s_suppkey", "s_nationkey").as[(Long, Long)].collect().toMap
    val nr = graft.core.Tables.nation(spark, sf)
      .select("n_nationkey", "n_regionkey").as[(Long, Long)].collect().toMap
    // seq: ?ord placedBy/inNation/inRegion ?reg
    val seq = orders.map { case (o, c) => (o, nr(cn(c))) }.toSet
    // alt_seq: (placedBy|suppliedBy)/inNation/inRegion
    val altSeq = seq ++ li.map { case (o, _, s) => (o, nr(sn(s))) }.toSet
    // inv_seq: ?cust ^placedBy/hasPart ?part
    val custOf = orders.toMap
    val invSeq = li.map { case (o, p, _) => (custOf(o), p) }.toSet
    val expect = Map(
      "seq" -> seq, "alt_seq" -> altSeq, "inv_seq" -> invSeq)
    val got = Bgp.bgpPath(spark, TestSpark.sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 3)
    got.foreach { case (path, np, ns, ne) =>
      val e = expect(path)
      assert(np == e.size.toLong, s"$path n_pairs")
      assert(ns == e.map(_._1).size.toLong.min(e.size) &&
        ns == e.map(_._1).toSet.size.toLong, s"$path n_start")
      assert(ne == e.map(_._2).toSet.size.toLong, s"$path n_end")
    }
    val byName = got.map(r => r._1 -> r._2).toMap
    assert(byName("alt_seq") >= byName("seq"), "alternation dominates")
  }

  test("ess: per-language ESS equals the log-sum-exp recompute over " +
      "the weight frame; bounded by (0, n]; shift-invariant by " +
      "construction") {
    val w = graft.pipeline.Dsir.dsirWeights(spark, TestSpark.sf)
      .select("lang", "logw").as[(String, Double)].collect()
    val got = graft.pipeline.Dsir.ess(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == w.map(_._1).distinct.length)
    got.foreach { case (lang, n, mx, ess, ratio) =>
      val lws = w.filter(_._1 == lang).map(_._2)
      assert(n == lws.length.toLong, s"$lang n_docs")
      assert(mx == lws.max, s"$lang max_logw")
      val wq = lws.map(lw =>
        math.floor(math.exp(lw - mx) * 1e6 + 0.5) / 1e6)
      val s1 = wq.map(x => math.floor(x * 1e6 + 0.5).toLong).sum.toDouble / 1e6
      val s2 = wq.map(x => math.floor(x * x * 1e12 + 0.5).toLong).sum.toDouble / 1e12
      assert(ess == s1 * s1 / s2, s"$lang ess")
      assert(ratio == s1 * s1 / s2 / n, s"$lang ess_ratio")
      assert(ess > 0.0 && ess <= n.toDouble + 1e-9, s"$lang bounds")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-12)
    }
  }
}
