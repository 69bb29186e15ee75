package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #311-313 — the last three TPC-H subquery patterns (correlated MIN,
  * HAVING-above-global-share, nested IN), driver recomputes under the
  * documented partsupp-free adaptations.
  */
class Q2Q11Q20Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def li = graft.core.Tables.lineitem(spark, TestSpark.sf)
  private def nationOf = graft.core.Tables.supplier(spark, TestSpark.sf)
    .select("s_suppkey", "s_nationkey").as[(Long, Long)].collect().toMap

  test("q2: every emitted row is a minimal-cost (part, supplier) in " +
      "the region scope; minima and ties equal the recompute") {
    val regionNations = graft.core.Tables.nation(spark, TestSpark.sf)
      .join(graft.core.Tables.region(spark, TestSpark.sf),
        $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === Relational.Q2Region)
      .select("n_nationkey").as[Long].collect().toSet
    val sn = nationOf
    val stdParts = graft.core.Tables.part(spark, TestSpark.sf)
      .filter($"p_type" === Relational.Q2Type)
      .select("p_partkey").as[Long].collect().toSet
    val rows = li.select("l_partkey", "l_suppkey", "l_extendedprice",
      "l_quantity").as[(Long, Long, Double, Double)].collect()
      .filter(r => stdParts(r._1) && regionNations(sn(r._2)))
    val cost = rows.groupBy(r => (r._1, r._2)).view.mapValues(rs =>
      rs.map(r => math.floor(r._3 / r._4 * 100.0 + 0.5).toLong).min).toMap
    val minBy = cost.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val expect = cost.filter { case ((p, _), c) => c == minBy(p) }
    val got = Q2Probe.rows(spark)
    assert(got.length == expect.size, "row count")
    got.foreach { case (p, sc, s) =>
      assert(expect(((p, s))) == math.round(sc * 100.0), s"($p, $s)")
    }
  }

  test("q11: the share cut is the exact integer cross-multiply; " +
      "values equal the recompute; every share > 1/1000") {
    val sn = nationOf
    val n3 = graft.core.Tables.nation(spark, TestSpark.sf)
      .filter($"n_name" === Relational.Q11Nation)
      .select("n_nationkey").as[Long].collect().toSet
    val rows = li.select("l_partkey", "l_suppkey", "l_extendedprice")
      .as[(Long, Long, Double)].collect()
      .filter(r => n3(sn(r._2)))
    val vals = rows.groupBy(_._1).view.mapValues(rs =>
      rs.map(r => math.floor(r._3 * 100.0 + 0.5).toLong).sum).toMap
    val tot = vals.values.sum
    val expect = vals.filter(_._2 * Relational.Q11ShareDen > tot)
    val got = Relational.q11Share(spark, TestSpark.sf)
      .as[(Long, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (p, v, share) =>
      assert(expect(p) == math.round(v * 100.0), s"part $p value")
      assert(share == expect(p).toDouble / tot, s"part $p share")
      assert(share > 1.0 / Relational.Q11ShareDen)
    }
  }

  test("q20: dominant-supplier set equals the recompute; dominance " +
      "is strict majority of the part's year quantity") {
    val sn = nationOf
    val n3 = graft.core.Tables.nation(spark, TestSpark.sf)
      .filter($"n_name" === Relational.Q20Nation)
      .select("n_nationkey").as[Long].collect().toSet
    val rows = li
      .filter($"l_shipdate" >= java.sql.Timestamp.valueOf(Relational.Q20YearLo)
        && $"l_shipdate" < java.sql.Timestamp.valueOf(Relational.Q20YearHi))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .as[(Long, Long, Double)].collect()
    val qty = rows.groupBy(r => (r._1, r._2)).view.mapValues(rs =>
      rs.map(r => math.floor(r._3 * 100.0 + 0.5).toLong).sum).toMap
    val ptot = qty.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expect = qty
      .filter { case ((p, s), q) => q * 2 > ptot(p) && n3(sn(s)) }
      .groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val got = Relational.q20Excess(spark, TestSpark.sf)
      .select("s_suppkey", "n_dominant_parts")
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }
}

/** q2 output reader kept out of the test body (column subset). */
private object Q2Probe {
  def rows(spark: org.apache.spark.sql.SparkSession): Array[(Long, Double, Long)] = {
    import spark.implicits._
    Relational.q2MinCost(spark, graft.TestSpark.sf)
      .select("p_partkey", "supply_cost", "s_suppkey")
      .as[(Long, Double, Long)].collect()
  }
}
