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
}
