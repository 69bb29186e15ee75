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

  test("q4: the semi join equals the EXISTS definition recomputed " +
      "driver-side, and never double-counts an order") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"),
        expr("unix_micros(l_shipdate) DIV 1000000").as("s"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val orders = graft.core.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) DIV 1000000").as("s"))
      .as[(Long, String, Long)].collect()
    // EXISTS, literally: at least one lineitem > 90 days late
    val expect = orders
      .filter { case (ok, _, os) =>
        li.getOrElse(ok, Array.empty).exists(_._2 > os + 90L * 86400L) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Relational.q4PrioritySemi(spark, TestSpark.sf)
      .as[(String, Long)].collect().toMap
    assert(got == expect)
    // semi-join cardinality law: counted orders never exceed the universe
    assert(got.values.sum <= orders.length)
  }

  test("q16: the anti join equals NOT IN, and the blocklist actually bites") {
    import org.apache.spark.sql.functions._
    val bad = graft.core.Tables.supplier(spark, TestSpark.sf)
      .filter(graft.core.PortableHash.pHash(col("s_name")) % 7 === 0)
      .select("s_suppkey").as[Long].collect().toSet
    assert(bad.nonEmpty, "the data-derived blocklist must be non-empty")
    val pairs = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select("l_partkey", "l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val dims = graft.core.Tables.part(spark, TestSpark.sf)
      .select("p_partkey", "p_brand", "p_size")
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val expect = pairs.filterNot(p => bad(p._2))
      .map(p => (dims(p._1), p._2)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = Relational.q16SupplierCnt(spark, TestSpark.sf)
      .as[(String, Int, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got == expect)
    // no blocklisted supplier contributes anywhere: recount with them in
    val withBad = pairs.map(p => (dims(p._1), p._2)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(withBad.exists { case (k, v) => got.getOrElse(k, 0L) < v },
      "excluding the blocklist must shrink at least one group")
  }

  test("q22: scalar cut + anti join equal the subquery definition") {
    import org.apache.spark.sql.functions._
    val cust = graft.core.Tables.customer(spark, TestSpark.sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
    val pos = cust.filter(_._3 > 0.0)
    val cut = pos.map(c => math.floor(c._3 * 100.0 + 0.5).toLong)
      .sum.toDouble / 100.0 / pos.length
    val urgent = graft.core.Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").as[Long].collect().toSet
    val kept = cust.filter(c => c._3 > cut && !urgent(c._1))
    assert(kept.nonEmpty, "some high-balance idle customers must exist")
    val expect = kept.groupBy(_._2).view.mapValues { g =>
      (g.length.toLong,
        g.map(c => math.floor(c._3 * 100.0 + 0.5).toLong).sum.toDouble / 100.0)
    }.toMap
    val got = Relational.q22IdleBalance(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect)
  }
}
