package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #228-232: the TPC-H classics Q6/Q7/Q10/Q14/Q18, each checked against
  * a driver recompute of the query's defining semantics (not the SQL).
  */
class TpchClassicsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def q6(x: Double) = math.floor(x * 1e6 + 0.5).toLong

  private lazy val lineitem = graft.core.Tables
    .lineitem(spark, TestSpark.sf)
    .select($"l_orderkey", $"l_suppkey", $"l_partkey",
      $"l_quantity", $"l_extendedprice", $"l_discount", $"l_returnflag",
      $"l_shipdate".cast("string"))
    .as[(Long, Long, Long, Double, Double, Double, String, String)]
    .collect().toSeq

  test("q6: revenue equals the scaled-integer recompute over the band") {
    val in = lineitem.filter(r => r._8 >= "1996-01-01" &&
      r._8 < "1997-01-01" && r._6 >= 0.05 && r._6 <= 0.07 && r._4 < 24.0)
    val expect = in.map(r => q6(r._5 * r._6)).sum / 1e6
    val (rev, n) = Relational.q6Forecast(spark, TestSpark.sf)
      .as[(Double, Long)].collect().head
    assert(rev == expect && n == in.length)
    assert(n > 0, "the band must select something at the test SF")
  }

  test("q7: both flow directions present, revenue cells equal recompute") {
    val nat = graft.core.Tables.nation(spark, TestSpark.sf)
      .select($"n_nationkey".cast("long"), $"n_name")
      .as[(Long, String)].collect().toMap
    val supp = graft.core.Tables.supplier(spark, TestSpark.sf)
      .select($"s_suppkey".cast("long"), $"s_nationkey".cast("long"))
      .as[(Long, Long)].collect().toMap
    val cust = graft.core.Tables.customer(spark, TestSpark.sf)
      .select($"c_custkey".cast("long"), $"c_nationkey".cast("long"))
      .as[(Long, Long)].collect().toMap
    val custOf = graft.core.Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".cast("long"), $"o_custkey".cast("long"))
      .as[(Long, Long)].collect().toMap
    val pair = Set("NATION_3", "NATION_8")
    val cells = lineitem
      .filter(r => r._8 >= "1996-01-01" && r._8 < "1998-01-01")
      .flatMap { r =>
        val sn = nat(supp(r._2)); val cn = nat(cust(custOf(r._1)))
        if (pair(sn) && pair(cn) && sn != cn)
          Some(((sn, cn, r._8.take(4).toLong), q6(r._5 * (1.0 - r._6))))
        else None
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum / 1e6).toMap
    val got = Relational.q7Volume(spark, TestSpark.sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == cells.size)
    got.foreach { case (sn, cn, y, rev) =>
      assert(rev == cells((sn, cn, y)), s"cell ($sn,$cn,$y)")
    }
    assert(got.map(_._1).distinct.length == 2,
      "both flow directions must appear")
  }

  test("q10: exactly the top 20 by (revenue desc, custkey), values exact") {
    val custOf = graft.core.Tables.orders(spark, TestSpark.sf)
      .filter($"o_orderdate" >= lit("1996-01-01") &&
        $"o_orderdate" < lit("1996-04-01"))
      .select($"o_orderkey".cast("long"), $"o_custkey".cast("long"))
      .as[(Long, Long)].collect().toMap
    val perCust = lineitem
      .filter(r => r._7 == "R" && custOf.contains(r._1))
      .groupBy(r => custOf(r._1)).view
      .mapValues(_.map(r => q6(r._5 * (1.0 - r._6))).sum / 1e6).toMap
    val expectTop = perCust.toSeq.sortBy { case (ck, rev) => (-rev, ck) }
      .take(20)
    val got = Relational.q10Returned(spark, TestSpark.sf)
      .as[(Long, String, Double, String, Double)].collect()
    assert(got.length == math.min(20, perCust.size))
    assert(got.map(r => (r._1, r._5)).toSeq == expectTop)
  }

  test("q14: promo share equals recompute; promo < total; share in (0,100)") {
    val part = graft.core.Tables.part(spark, TestSpark.sf)
      .select($"p_partkey".cast("long"), $"p_type")
      .as[(Long, String)].collect().toMap
    val in = lineitem.filter(r => r._8 >= "1996-01-01" && r._8 < "1996-02-01")
    val promo = in.map(r =>
      if (part(r._3) == "PROMO") q6(r._5 * (1.0 - r._6)) else q6(0.0)).sum / 1e6
    val total = in.map(r => q6(r._5 * (1.0 - r._6))).sum / 1e6
    val (gp, gt, gs) = Relational.q14Promo(spark, TestSpark.sf)
      .as[(Double, Double, Double)].collect().head
    assert(gp == promo && gt == total && gs == 100.0 * promo / total)
    assert(gp > 0.0 && gp < gt && gs > 0.0 && gs < 100.0)
  }

  test("q18: exactly the orders over the threshold, quantities integer") {
    val perOrder = lineitem.groupBy(_._1).view
      .mapValues(_.map(_._4.toLong).sum)
      .filter(_._2 > Relational.Q18MinQty).toMap
    val got = Relational.q18LargeOrders(spark, TestSpark.sf)
      .select($"o_orderkey", $"total_qty").as[(Long, Long)].collect().toMap
    assert(got == perOrder)
    assert(got.nonEmpty && got.values.forall(_ > Relational.Q18MinQty))
  }

  test("elasticity: per-brand slope equals the quantized closed-form " +
      "least squares; every brand covered") {
    def q(x: Double, s: Double) = math.floor(x * s + 0.5) / s
    val brand = graft.core.Tables.part(spark, TestSpark.sf)
      .select($"p_partkey".cast("long"), $"p_brand")
      .as[(Long, String)].collect().toMap
    val obs = lineitem.filter(_._4 > 0.0).map { r =>
      val x = q(math.log(r._5 * (1.0 - r._6) / r._4), 1e6)
      val y = q(math.log(r._4), 1e6)
      (brand(r._3), x, y)
    }
    val expect = obs.groupBy(_._1).map { case (b, rs) =>
      val n = rs.length.toLong
      def dsum(vs: Seq[Double], s: Double) =
        vs.map(v => math.floor(v * s + 0.5).toLong).sum / s
      val sx = dsum(rs.map(_._2).toSeq, 1e6)
      val sy = dsum(rs.map(_._3).toSeq, 1e6)
      val sxy = dsum(rs.map(r => r._2 * r._3).toSeq, 1e12)
      val sxx = dsum(rs.map(r => r._2 * r._2).toSeq, 1e12)
      b -> ((n, (n * sxy - sx * sy) / (n * sxx - sx * sx)))
    }
    val got = Relational.priceElasticity(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (b, n, e) =>
      assert((n, e) == expect(b), s"brand $b")
    }
    assert(got.map(_._1).toSet == brand.values.toSet,
      "every brand with sales must appear")
  }

  test("lead time: per-priority percentiles/mean equal the driver " +
      "nearest-rank recompute; ordering p50 <= p90 <= max holds") {
    val orders = graft.core.Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".cast("long"), $"o_orderpriority",
        ($"o_orderdate".cast("long") / 86400L).cast("long"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val leads = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey".cast("long"),
        ($"l_shipdate".cast("long") / 86400L).cast("long"))
      .as[(Long, Long)].collect().map { case (ok, sd) =>
        val (pri, od) = orders(ok)
        (pri, sd - od)
      }
    val expect = leads.groupBy(_._1).map { case (pri, rs) =>
      val ds = rs.map(_._2).sorted
      val n = ds.length.toLong
      def nr(k: Long) = ds(((n * k + 99) / 100 - 1).toInt)
      pri -> ((n, nr(50), nr(90), ds.last,
        ds.sum.toDouble / n.toDouble))
    }
    val got = Relational.ordersLeadTime(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (pri, n, p50, p90, mx, mean) =>
      assert((n, p50, p90, mx, mean) == expect(pri), s"priority $pri")
      assert(p50 <= p90 && p90 <= mx)
    }
  }

  test("concentration: per-segment Gini and top-decile share equal the " +
      "driver Lorenz recompute; Gini in [0,1); top10 >= 0.1") {
    def q12l(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    val spendByCust = graft.core.Tables.orders(spark, TestSpark.sf)
      .select($"o_custkey".cast("long"),
        $"o_totalprice".cast("double")).as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(
        _.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum / 100L)
    val seg = graft.core.Tables.customer(spark, TestSpark.sf)
      .select($"c_custkey".cast("long"), $"c_mktsegment")
      .as[(Long, String)].collect().toMap
    val expect = spendByCust.toSeq.groupBy(r => seg(r._1)).map {
      case (s, custs) =>
        val hist = custs.map(_._2).groupBy(identity).view
          .mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val n = custs.size.toLong
        val r = hist.map(h => h._1 * h._2).sum
        var cu = 0L; var cr = 0L; var terms = 0L
        var top: Option[Double] = None
        val cut = (n * 90 + 99) / 100
        hist.foreach { case (usd, nu) =>
          val (pu, pr) = (cu, cr)
          cu += nu; cr += usd * nu
          terms += q12l((cr.toDouble / r.toDouble +
            pr.toDouble / r.toDouble) *
            (cu.toDouble / n.toDouble - pu.toDouble / n.toDouble))
          if (cu <= cut) top = Some(1.0 - cr.toDouble / r.toDouble)
        }
        s -> ((n, r.toDouble, 1.0 - terms / 1e12, top.getOrElse(1.0)))
    }
    val got = Relational.revenueConcentration(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (s, n, rev, gini, t10) =>
      assert((n, rev, gini, t10) == expect(s), s"segment $s")
      assert(gini >= 0.0 && gini < 1.0)
      assert(t10 >= 0.1 - 1e-9, "top decile holds at least its weight")
    }
  }
}
