package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two correlated-subquery decorrelation showcases (#188 TPC-H Q13,
  * #189 TPC-H Q17): the join/window rewrites must reproduce the
  * subquery SEMANTICS exactly — checked against driver recomputes of
  * the correlated definitions.
  */
class DecorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q13: distribution partitions the customer universe and accounts " +
      "every non-urgent order") {
    import org.apache.spark.sql.functions._
    val got = Relational.q13CustDist(spark, TestSpark.sf)
      .as[(Long, Long)].collect().toMap
    val nCust = graft.core.Tables.customer(spark, TestSpark.sf).count()
    val orders = graft.core.Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").as[Long].collect()
    // every customer lands in exactly one c_count bucket
    assert(got.values.sum == nCust)
    // total order mass is conserved through the left join
    assert(got.map { case (k, v) => k * v }.sum == orders.length)
    // zero-order customers (the LEFT join's whole point) appear iff some
    // customer has no qualifying order — recomputed from the raw tables
    val withOrders = orders.toSet.size
    val expectedZero = nCust - withOrders
    assert(got.getOrElse(0L, 0L) == expectedZero)
    // the bucket histogram itself matches a driver recompute
    val perCust = orders.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hist = (Seq.fill(expectedZero.toInt)(0L) ++ perCust.values)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == hist)
  }

  test("q17: the window rewrite equals the correlated-subquery definition " +
      "recomputed driver-side") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .join(graft.core.Tables.part(spark, TestSpark.sf)
        .filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .as[(Long, Double, Double)].collect()
    assert(li.nonEmpty, "brand filter must keep some lineitems")
    // correlated definition: per-row compare against ITS part's 0.2*avg
    val byPart = li.groupBy(_._1)
    val qualifying = li.filter { case (pk, q, _) =>
      val g = byPart(pk)
      q < 0.2 * (g.map(_._2).sum / g.length)
    }
    val expect = qualifying.map(r =>
      math.floor(r._3 * 100.0 + 0.5).toLong).sum.toDouble / 100.0 / 7.0
    val Array(got) = Relational.q17SmallQty(spark, TestSpark.sf)
      .as[Double].collect()
    assert(qualifying.nonEmpty, "some small-quantity rows must qualify")
    assert(got == expect,
      s"window rewrite drifted from the correlated definition ($got vs $expect)")
  }
}
