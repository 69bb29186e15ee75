package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.TpchGraph

/** SHACL-suite guarantees beyond the oracle: every constraint's counts
  * equal a driver recomputation over the collected triple view, and the
  * suite is complete.
  */
class ShaclSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("all shape counts equal a driver recompute over the triples") {
    val got = Shacl.shaclCheck(spark, TestSpark.sf)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    val triples = TpchGraph.triples(spark, TestSpark.sf)
      .as[(String, String, String)].collect()
    def byP(p: String) = triples.filter(_._2 == p)
    def subs(p: String) = byP(p).map(_._1).toSet

    def targetExists(link: String, defining: String): (Long, Long) = {
      val links = byP(link)
      val targets = subs(defining)
      (links.length.toLong, links.count(t => !targets(t._3)).toLong)
    }
    def exactlyOne(focus: Iterable[String], must: String): (Long, Long) = {
      val cnt = byP(must).groupBy(_._1).view.mapValues(_.length).toMap
      val f = focus.toSeq.distinct
      (f.length.toLong, f.count(s => cnt.getOrElse(s, 0) != 1).toLong)
    }
    val exp = Map(
      "placedBy_target_has_nation" -> targetExists("placedBy", "inNation"),
      "suppliedBy_target_has_nation" -> targetExists("suppliedBy", "inNation"),
      "inNation_target_has_region" -> targetExists("inNation", "inRegion"),
      "order_exactly_one_customer" -> exactlyOne(subs("hasPart"), "placedBy"),
      "customer_exactly_one_nation" ->
        exactlyOne(byP("placedBy").map(_._3).toSet, "inNation"))

    assert(got.keySet == exp.keySet, "suite completeness")
    exp.foreach { case (c, (n, v)) =>
      val (_, gn, gv, pass) = got(c)
      assert(gn == n && gv == v, s"$c: ($gn, $gv) vs driver ($n, $v)")
      assert(pass == (v == 0L))
    }
    // this graph is CLEAN by construction — the suite must prove it
    assert(got.values.forall(_._4), "all shapes pass on the TPC-H graph")
  }
}
