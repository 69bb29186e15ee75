package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{Tables, TpchGraph}

/** Semantic guarantees for the SPARQL-side ops that the oracle's
  * bit-compare doesn't state: characteristic sets partition the subject
  * universe, and the BGP binding counts equal a recount from the BASE
  * relational tables (not from the triple view the implementation reads).
  */
class BgpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("charSets: signatures partition subjects and account every triple") {
    val rows = Bgp.charSets(spark, TestSpark.sf)
      .as[(String, Int, Long, Long)].collect()
    val t = TpchGraph.triples(spark, TestSpark.sf)
    val nSubjects = t.select("s").distinct().count()
    val nTriples = t.count()
    assert(rows.map(_._3).sum == nSubjects, "Σ n_subjects = |subjects|")
    assert(rows.map(_._4).sum == nTriples, "Σ n_triples = |triples|")
    val preds = Set("inNation", "inRegion", "placedBy", "hasPart", "suppliedBy")
    rows.foreach { case (cset, nPreds, ns, nt) =>
      val ps = cset.split(",").toSeq
      assert(ps == ps.sorted && ps.distinct == ps, s"sorted unique: $cset")
      assert(ps.forall(preds.contains), s"known predicates only: $cset")
      assert(nPreds == ps.length && ns >= 1 && nt >= ns * nPreds,
        s"each subject carries >= one triple per predicate of its set: $cset")
    }
  }

  test("bgpStar: binding counts equal a recount from the base tables") {
    val got = Bgp.bgpStar(spark, TestSpark.sf)
      .as[(String, Long, Long, Long)].collect()
      .map { case (nat, nb, no, np) => nat -> ((nb, no, np)) }.toMap

    val region = Bgp.BgpRegion.stripPrefix("r:").toLong
    val nations = Tables.nation(spark, TestSpark.sf)
      .filter(col("n_regionkey") === region)
    val expect = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .join(Tables.orders(spark, TestSpark.sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, TestSpark.sf), col("o_custkey") === col("c_custkey"))
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .groupBy(concat(lit("n:"), col("n_nationkey")).as("nat"))
      .agg(count(lit(1)).as("nb"), countDistinct(col("l_orderkey")).as("no"),
        countDistinct(col("l_partkey")).as("np"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (nat, nb, no, np) => nat -> ((nb, no, np)) }.toMap

    assert(got == expect, s"BGP bindings vs relational recount:\n$got\n$expect")
    assert(got.nonEmpty, "the bound-region pattern matches")
  }

  test("bgpOptional: bound/unbound split equals a recount from the base tables") {
    val got = Bgp.bgpOptional(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (nat, nb, ns, b, u) => nat -> ((nb, ns, b, u)) }.toMap

    val cust = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"), col("c_nationkey")).as[(Long, Long)].collect()
    val supp = Tables.supplier(spark, TestSpark.sf)
      .select(col("s_suppkey"), col("s_nationkey")).as[(Long, Long)].collect()
    val ordersByCust = Tables.orders(spark, TestSpark.sf)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap

    val expect = (cust.map { case (k, n) => (s"n:$n", ordersByCust.getOrElse(k, 0L), true) } ++
      supp.map { case (k, n) => (s"n:$n", 0L, false) })
      .groupBy(_._1).map { case (nat, rows) =>
        val bindings = rows.map { case (_, nOrd, _) => math.max(nOrd, 1L) }.sum
        val bound = rows.count { case (_, nOrd, _) => nOrd > 0 }
        nat -> ((bindings, rows.length.toLong, bound.toLong, (rows.length - bound).toLong))
      }

    assert(got == expect, s"OPTIONAL vs relational recount")
    // the OPTIONAL is non-vacuous both ways: some subjects bind, some don't
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._4 > 0),
      "both bound and unbound subjects must occur somewhere")
  }
}
