package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #316-317: TPC-H Q12 (late lines by service class) and the FK orphan
  * audit, each against a first-principles driver recompute.
  */
class Q12FkOrphansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q12: late urgent/non-urgent line counts equal the recompute, " +
      "and the late predicate genuinely filters") {
    val orders = graft.core.Tables.orders(spark, TestSpark.sf)
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_micros(o_orderdate) DIV 1000000 AS order_s")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val lines = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .selectExpr("l_orderkey", "l_linestatus",
        "unix_micros(l_shipdate) DIV 1000000 AS ship_s",
        "CAST(l_shipdate AS STRING) AS sd")
      .as[(Long, String, Long, String)].collect()
    val window = lines.filter(r => r._4 >= "1996-01-01" && r._4 < "1997-01-01")
    val late = window.filter { r =>
      val (_, orderS) = orders(r._1)
      r._3 > orderS + 60L * 86400L
    }
    assert(late.nonEmpty && late.length < window.length,
      "the late predicate must bite at the test SF")
    val urgent = Set("1-URGENT", "2-HIGH")
    val expect = late.groupBy(_._2).map { case (st, rs) =>
      st -> ((rs.count(r => urgent(orders(r._1)._1)).toLong,
        rs.count(r => !urgent(orders(r._1)._1)).toLong))
    }
    val got = Relational.q12Shipmode(spark, TestSpark.sf)
      .as[(String, Long, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (st, hi, lo) => assert((hi, lo) == expect(st), st) }
  }

  test("fk orphans: every edge's metrics equal the recompute from the " +
      "same simulated-loss parent snapshots; staged loss produces real " +
      "orphans on the fact edges") {
    import graft.core.PortableHash.pHashJvm
    def kept(k: Long): Boolean = pHashJvm(s"fkloss|$k") % 13 != 0
    def keys(table: String, col: String): Set[Long] =
      graft.core.Tables.table(spark, TestSpark.sf, table)
        .selectExpr(s"CAST($col AS BIGINT)").as[Long].collect().toSet
    def child(table: String, col: String): Seq[Long] =
      graft.core.Tables.table(spark, TestSpark.sf, table)
        .selectExpr(s"CAST($col AS BIGINT)").as[Long].collect().toSeq

    val edges = Seq(
      ("lineitem_orderkey_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem_partkey_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_suppkey_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders_custkey_customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer_nationkey_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier_nationkey_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation_regionkey_region", "nation", "n_regionkey", "region", "r_regionkey"))
    val expect = edges.map { case (label, ct, cf, pt, pk) =>
      val parents = keys(pt, pk).filter(kept)
      val fks = child(ct, cf)
      val orphan = fks.filter(k => !parents(k))
      val missing = orphan.toSet
      label -> ((fks.length.toLong, orphan.length.toLong,
        missing.size.toLong,
        if (missing.isEmpty) -1L else missing.min,
        if (missing.isEmpty) -1L else missing.max))
    }.toMap

    val got = DataQuality.fkOrphans(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == edges.length)
    got.foreach { case (label, n, orph, miss, mn, mx) =>
      assert((n, orph, miss, mn, mx) == expect(label), label)
    }
    // the staged pHash loss must exercise the orphan path on the three
    // fact edges (a parent table is never lost entirely)
    Seq("lineitem_orderkey_orders", "orders_custkey_customer").foreach { e =>
      assert(expect(e)._2 > 0, s"$e should have staged orphans")
    }
    got.foreach { case (label, n, orph, _, _, _) =>
      assert(orph <= n, label)
    }
  }
}
