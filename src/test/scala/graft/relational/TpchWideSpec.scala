package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #255-258: TPC-H Q15/Q19/Q21/Q8, each checked against a driver
  * recompute of the query's defining semantics (not the SQL oracle).
  */
class TpchWideSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q6(x: Double) = math.floor(x * 1e6 + 0.5).toLong

  private lazy val lineitem = graft.core.Tables
    .lineitem(spark, TestSpark.sf)
    .select($"l_orderkey", $"l_suppkey", $"l_partkey",
      $"l_quantity", $"l_extendedprice", $"l_discount",
      $"l_shipdate".cast("string"),
      ($"l_shipdate".cast("long") / 86400L).cast("long"))
    .as[(Long, Long, Long, Double, Double, Double, String, Long)]
    .collect().toSeq

  test("q15: emits exactly the argmax supplier set over quarter revenue") {
    val perSupp = lineitem
      .filter(r => r._7 >= "1996-01-01" && r._7 < "1996-04-01")
      .groupBy(_._2).view
      .mapValues(_.map(r => q6(r._5 * (1.0 - r._6))).sum / 1e6).toMap
    val mx = perSupp.values.max
    val expect = perSupp.filter(_._2 == mx)
    val got = Relational.q15TopSupplier(spark, TestSpark.sf)
      .select($"s_suppkey", $"total_revenue").as[(Long, Double)]
      .collect().toMap
    assert(got == expect)
    assert(got.nonEmpty && perSupp.size > got.size,
      "the max must actually select (not every supplier ties)")
  }

  test("q19: revenue/count equal the brute disjunction recompute; the " +
      "envelope drops rows the residual OR would reject") {
    val part = graft.core.Tables.part(spark, TestSpark.sf)
      .select($"p_partkey".cast("long"), $"p_brand", $"p_size")
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def hit(r: (Long, Long, Long, Double, Double, Double, String, Long)) = {
      val (b, sz) = part(r._3); val q = r._4
      (b == "Brand#1" && sz >= 1 && sz <= 15 && q >= 1.0 && q <= 20.0) ||
      (b == "Brand#2" && sz >= 1 && sz <= 30 && q >= 10.0 && q <= 30.0) ||
      (b == "Brand#3" && sz >= 1 && sz <= 50 && q >= 20.0 && q <= 40.0)
    }
    val in = lineitem.filter(hit)
    val expect = in.map(r => q6(r._5 * (1.0 - r._6))).sum / 1e6
    val (rev, n) = Relational.q19Brackets(spark, TestSpark.sf)
      .as[(Double, Long)].collect().head
    assert(rev == expect && n == in.length && n > 0)
    // the envelope (3 brands, qty in the union range) is strictly wider
    // than the disjunction — the residual filter must still do work
    val envelope = lineitem.count { r =>
      val b = part(r._3)._1
      Set("Brand#1", "Brand#2", "Brand#3")(b) && r._4 >= 1.0 && r._4 <= 40.0
    }
    assert(envelope > n, "residual OR must reject some envelope rows")
  }

  test("q21: qualifying counts equal the EXISTS/NOT-EXISTS definition " +
      "recomputed driver-side") {
    val ordF = graft.core.Tables.orders(spark, TestSpark.sf)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey".cast("long"),
        ($"o_orderdate".cast("long") / 86400L).cast("long"))
      .as[(Long, Long)].collect().toMap
    // per (order, supplier): any line late?
    val pair = lineitem.filter(r => ordF.contains(r._1))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(rs => rs.exists(r => r._8 - ordF(r._1) > Relational.Q21LateDays))
      .toMap
    val byOrder = pair.keys.groupBy(_._1)
    val expect = pair.toSeq.filter { case ((ok, sk), late) =>
      val supps = byOrder(ok).map(_._2).toSet
      // EXISTS another supplier; NOT EXISTS another LATE supplier
      late && supps.size > 1 &&
        !supps.exists(s2 => s2 != sk && pair((ok, s2)))
    }.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val names = graft.core.Tables.supplier(spark, TestSpark.sf)
      .select($"s_suppkey".cast("long"), $"s_name")
      .as[(Long, String)].collect().toMap
    val expectTop = expect.toSeq
      .sortBy { case (sk, n) => (-n, names(sk)) }.take(20)
      .map { case (sk, n) => (sk, n) }.toMap
    val got = Relational.q21LateSupplier(spark, TestSpark.sf)
      .select($"s_suppkey", $"numwait").as[(Long, Long)].collect().toMap
    assert(got == expectTop)
    assert(got.nonEmpty, "some supplier must qualify at the test SF")
  }

  test("q8: per-year share equals conditional/total recompute; both " +
      "years present; share in (0,1)") {
    val nat = graft.core.Tables.nation(spark, TestSpark.sf)
      .select($"n_nationkey".cast("long"), $"n_name",
        $"n_regionkey".cast("long"))
      .as[(Long, String, Long)].collect()
    val asiaKey = graft.core.Tables.region(spark, TestSpark.sf)
      .filter($"r_name" === "ASIA").select($"r_regionkey".cast("long"))
      .as[Long].collect().head
    val asiaNations = nat.filter(_._3 == asiaKey).map(_._1).toSet
    val natName = nat.map(r => r._1 -> r._2).toMap
    val suppNation = graft.core.Tables.supplier(spark, TestSpark.sf)
      .select($"s_suppkey".cast("long"), $"s_nationkey".cast("long"))
      .as[(Long, Long)].collect().map(r => r._1 -> natName(r._2)).toMap
    val custAsia = graft.core.Tables.customer(spark, TestSpark.sf)
      .select($"c_custkey".cast("long"), $"c_nationkey".cast("long"))
      .as[(Long, Long)].collect()
      .filter(r => asiaNations(r._2)).map(_._1).toSet
    val stdParts = graft.core.Tables.part(spark, TestSpark.sf)
      .filter($"p_type" === "STANDARD").select($"p_partkey".cast("long"))
      .as[Long].collect().toSet
    val ord = graft.core.Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".cast("long"), $"o_custkey".cast("long"),
        $"o_orderdate".cast("string"))
      .as[(Long, Long, String)].collect()
      .filter(r => r._3 >= "1996-01-01" && r._3 < "1998-01-01")
      .map(r => r._1 -> ((r._2, r._3.take(4).toLong))).toMap
    val cells = lineitem.flatMap { r =>
      ord.get(r._1).collect {
        case (ck, yr) if custAsia(ck) && stdParts(r._3) =>
          val v = q6(r._5 * (1.0 - r._6))
          (yr, if (suppNation(r._2) == "NATION_3") v else 0L, v)
      }
    }.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2).sum / 1e6, rs.map(_._3).sum / 1e6)
    }.toMap
    val got = Relational.q8MarketShare(spark, TestSpark.sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == cells.size && cells.size == 2)
    got.foreach { case (y, nr, tr, sh) =>
      assert((nr, tr) == cells(y), s"year $y")
      assert(sh == nr / tr && sh > 0.0 && sh < 1.0)
    }
  }
}
