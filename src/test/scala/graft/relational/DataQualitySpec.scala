package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** DQ-suite guarantees beyond the oracle: every check's violation count
  * equals a driver recomputation from the raw tables, and the suite is
  * complete (all declared checks present exactly once).
  */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("all checks present; violation counts equal a driver recompute") {
    val got = DataQuality.dqChecks(spark, TestSpark.sf)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[(Long, Long, String, Double)].collect()
    val line = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .as[(Long, Long, Double, Double)].collect()
    val cust = Tables.customer(spark, TestSpark.sf)
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect()
    val nations = Tables.nation(spark, TestSpark.sf)
      .select("n_nationkey").as[Long].collect().toSet
    val orderKeys = orders.map(_._1).toSet
    val custKeys = cust.map(_._1).toSet

    val exp = Map(
      "orders_pk_unique" ->
        (orders.length.toLong, orders.length - orders.map(_._1).distinct.length.toLong),
      "orders_custkey_complete" -> (orders.length.toLong, 0L),
      "orders_status_accepted" ->
        (orders.length.toLong, orders.count(o => !Set("P", "O", "F")(o._3)).toLong),
      "orders_totalprice_positive" ->
        (orders.length.toLong, orders.count(_._4 <= 0.0).toLong),
      "lineitem_pk_unique" ->
        (line.length.toLong, line.length - line.map(l => (l._1, l._2)).distinct.length.toLong),
      "lineitem_qty_range" ->
        (line.length.toLong, line.count(l => l._3 < 1.0 || l._3 > 50.0).toLong),
      "lineitem_discount_range" ->
        (line.length.toLong, line.count(l => l._4 < 0.0 || l._4 > 1.0).toLong),
      "lineitem_fk_orders" ->
        (line.length.toLong, line.count(l => !orderKeys(l._1)).toLong),
      "orders_fk_customer" ->
        (orders.length.toLong, orders.count(o => !custKeys(o._2)).toLong),
      "customer_fk_nation" ->
        (cust.length.toLong, cust.count(c => !nations(c._2)).toLong))

    assert(got.keySet == exp.keySet, "suite completeness")
    exp.foreach { case (check, (n, v)) =>
      val (_, gn, gv, pass) = got(check)
      assert(gn == n && gv == v, s"$check: ($gn, $gv) vs driver ($n, $v)")
      assert(pass == (v == 0L))
    }
  }

  test("profile: one lineitem column's metrics equal a driver recompute") {
    val got = DataQuality.dqProfile(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])].collect()
    assert(got.length == 12 && got.map(r => (r._1, r._2)).distinct.length == 12)

    val qty = Tables.lineitem(spark, TestSpark.sf)
      .select("l_quantity").as[Double].collect()
    val r = got.find(x => x._1 == "lineitem" && x._2 == "l_quantity").get
    assert(r._3 == qty.length && r._4 == 0L)
    assert(r._5 == qty.distinct.length.toLong)
    assert(r._6.contains(qty.min) && r._7.contains(qty.max))
    val mean = qty.map(v => math.floor(v * 100.0 + 0.5).toLong).sum
      .toDouble / 100.0 / qty.length
    assert(r._8.contains(mean), s"mean ${r._8} vs driver $mean")
    // categorical rows carry no numeric stats
    got.filter(x => Set("lang", "source", "l_returnflag",
        "o_orderstatus", "o_orderpriority", "c_mktsegment")(x._2))
      .foreach(x => assert(x._6.isEmpty && x._7.isEmpty && x._8.isEmpty))
  }

  test("drift PSI equals the textbook definition recomputed driver-side " +
      "and is zero-ish on an identical split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Events.eventsS(spark, TestSpark.sf)
      .select(col("event_type"), (col("ts_s") / 86400L).cast("long"),
        col("value"))
      .as[(String, Long, Double)].collect()
    val days = ev.map(_._2)
    val mid = (days.min + days.max + 1) / 2
    val expect = ev.groupBy(_._1).map { case (tpe, g) =>
      val bins = g.groupBy(r => math.floor(r._3 * 100.0 + 0.5).toLong / 2000L)
      val nBins = bins.size
      val t1 = g.count(_._2 < mid).toLong
      val t2 = g.count(_._2 >= mid).toLong
      val psiTerms = bins.values.map { rows =>
        val n1 = rows.count(_._2 < mid).toLong
        val n2 = rows.count(_._2 >= mid).toLong
        val p = (n1 + 1).toDouble / (t1 + nBins)
        val q = (n2 + 1).toDouble / (t2 + nBins)
        val t = (p - q) * math.log(
          ((n1 + 1) * (t2 + nBins)).toDouble / ((n2 + 1) * (t1 + nBins)))
        math.floor(t * 1e6 + 0.5)
      }
      tpe -> (t1, t2, nBins.toLong, psiTerms.sum.toLong.toDouble / 1e6)
    }
    val got = DataQuality.driftPsi(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
    assert(got.length == expect.size)
    got.foreach { case (tpe, t1, t2, nb, psi, drift) =>
      val (e1, e2, eb, ep) = expect(tpe)
      assert((t1, t2, nb, psi) == ((e1, e2, eb, ep)), s"$tpe drifted")
      assert(drift == (psi > DataQuality.PsiAlarm))
      // the synthetic stream is stationary: PSI must sit far below alarm
      assert(psi >= 0.0 && psi < DataQuality.PsiAlarm,
        s"stationary stream should not alarm ($tpe psi=$psi)")
    }
  }

  test("Benford χ² equals the textbook statistic recomputed driver-side") {
    val prices = Tables.lineitem(spark, TestSpark.sf)
      .select("l_extendedprice").as[Double].collect()
    val cents = prices.map(v => math.floor(v * 100.0 + 0.5).toLong)
      .filter(_ > 0L)
    val counts = cents.groupBy(_.toString.head.asDigit.toLong)
      .map { case (d, g) => d -> g.length.toLong }
    val n = cents.length.toLong
    val p = (1 to 9).map(d => d.toLong -> math.log10(1 + 1.0 / d)).toMap
    val chi2 = (1L to 9L).map { d =>
      val o = counts.getOrElse(d, 0L)
      val t = (o - n * p(d)) * (o - n * p(d)) / (n * p(d))
      math.floor(t * 1e6 + 0.5).toLong
    }.sum.toDouble / 1e6
    val got = DataQuality.benford(spark, TestSpark.sf)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 9L))
    got.foreach { case (d, o, os, es, c2, rej) =>
      assert(o == counts.getOrElse(d, 0L), s"digit $d count")
      assert(os == o.toDouble / n && es == p(d))
      assert(c2 == chi2, s"chi2 $c2 vs driver $chi2")
      assert(rej == (c2 > DataQuality.BenfordCrit))
    }
    // monetary amounts spanning magnitudes: digit 1 must dominate digit 9
    assert(counts.getOrElse(1L, 0L) > counts.getOrElse(9L, 0L))
  }

  test("k-anonymity classes and summary equal a driver recompute") {
    val rows = Tables.customer(spark, TestSpark.sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
    val classes = rows.groupBy(r => (r._1, r._2)).map { case (k, g) =>
      k -> (g.length.toLong,
        g.map(r => (math.floor(r._3).toLong + 1000000L) / 1000L)
          .distinct.length.toLong)
    }
    val kAnon = classes.values.map(_._1).min
    val atRisk = classes.values.collect {
      case (sz, l) if sz < DataQuality.KAnonK || l < DataQuality.KAnonL => sz
    }.sum
    val got = DataQuality.kAnonymity(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Boolean, Boolean, Long, Double)]
      .collect()
    assert(got.length == classes.size)
    got.foreach { case (nk, seg, sz, ns, ka, ld, k, share) =>
      val (esz, ens) = classes((nk, seg))
      assert(sz == esz && ns == ens, s"class ($nk,$seg)")
      assert(ka == (sz >= DataQuality.KAnonK) && ld == (ns >= DataQuality.KAnonL))
      assert(k == kAnon && share == atRisk.toDouble / rows.length)
    }
  }

  test("woe/iv: per-bucket WOE and per-feature IV equal the driver " +
      "recompute; both label classes populated; bands ordered") {
    val conv = graft.core.Tables.orders(spark, TestSpark.sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".cast("long")).as[Long].collect().toSet
    val cust = graft.core.Tables.customer(spark, TestSpark.sf)
      .select($"c_custkey".cast("long"), $"c_mktsegment",
        $"c_nationkey".cast("long"), $"c_acctbal".cast("double"))
      .as[(Long, String, Long, Double)].collect()
    assert(cust.exists(c => conv(c._1)) && cust.exists(c => !conv(c._1)),
      "the urgent-buyer label must populate both classes")
    def q(x: Double, s: Int = 6) =
      math.floor(x * 1e6 + 0.5) / 1e6
    val fx = cust.flatMap { case (ck, seg, nk, bal) =>
      val good = conv(ck)
      val bb = ((math.floor(bal).toLong + 1000000L) /
        DataQuality.WoeBalUnits).toString
      Seq(("segment", seg, good), ("nation", nk.toString, good),
        ("balance", bb, good))
    }
    val hist = fx.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      (k, (rs.count(_._3).toLong, rs.count(!_._3).toLong))
    }
    val tot = hist.groupBy(_._1._1).map { case (f, m) =>
      f -> (m.values.map(_._1).sum, m.values.map(_._2).sum, m.size.toLong)
    }
    val expWoe = hist.map { case ((f, bkt), (g, b)) =>
      val (gt, bt, nb) = tot(f)
      (f, bkt) -> q(math.log(((g + 1) * (bt + nb)).toDouble /
        ((b + 1) * (gt + nb)).toDouble))
    }
    val expIv = hist.groupBy(_._1._1).map { case (f, m) =>
      val (gt, bt, nb) = tot(f)
      val terms = m.map { case ((_, _), (g, b)) =>
        q((((g + 1).toDouble / (gt + nb)) - ((b + 1).toDouble / (bt + nb))) *
          math.log(((g + 1) * (bt + nb)).toDouble /
            ((b + 1) * (gt + nb)).toDouble))
      }
      f -> terms.map(t => math.floor(t * 1e6 + 0.5).toLong).sum / 1e6
    }
    val got = DataQuality.woeIv(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Double, Double, String)].collect()
    assert(got.length == hist.size)
    got.foreach { case (f, bkt, g, b, woe, iv, strength) =>
      assert((g, b) == hist((f, bkt)), s"counts ($f,$bkt)")
      assert(woe == expWoe((f, bkt)), s"woe ($f,$bkt)")
      assert(iv == expIv(f), s"iv $f")
      val bands = Seq(0.02, 0.1, 0.3, 0.5)
      val expected = Seq("useless", "weak", "medium", "strong",
        "suspicious")(bands.count(iv >= _))
      assert(strength == expected, s"band $f")
    }
    // every feature must separate at least somewhat differently —
    // degenerate identical IVs would mean the label attach is broken
    assert(got.map(_._6).distinct.length >= 2)
  }
}
