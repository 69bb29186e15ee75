package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
// #238 spec appended below the rules spec.
import graft.core.Tables

/** Association-rule guarantees beyond the oracle: the full top-20 rule
  * table matches a driver recomputation from the raw baskets, and the
  * rule metrics respect their defining identities.
  */
class BasketRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-20 rules match a driver recompute; metric identities hold") {
    val got = Relational.basketRules(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Double, Double, Int)].collect()

    val lp = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = lp.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCnt = byOrder.values.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= Relational.RuleMinSupport).toMap
    val itemCnt = lp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = byOrder.size.toLong
    val rules = pairCnt.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c)) }
      .map { case (ante, cons, c) =>
        val (na, nc) = (itemCnt(ante), itemCnt(cons))
        (ante, cons, c, na, nc, c.toDouble / na.toDouble,
          (c * n).toDouble / (na * nc).toDouble)
      }
    val exp = rules.sortBy { case (a, c2, _, _, _, _, lift) => (-lift, a, c2) }
      .take(Relational.RuleTopN).zipWithIndex
      .map { case ((a, c2, np, na, nc, conf, lift), i) =>
        (a, c2, np, na, nc, conf, lift, i + 1) }

    assert(got.sortBy(_._8).toSeq == exp, "rule table vs driver recompute")
    got.foreach { case (_, _, np, na, nc, conf, lift, _) =>
      assert(np >= Relational.RuleMinSupport && np <= na && np <= nc)
      assert(conf > 0.0 && conf <= 1.0)
      assert(lift > 0.0)
    }
  }

  test("item neighbor table equals a driver recompute of per-item " +
      "cosine top-K") {
    val lp = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = lp.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCnt = byOrder.values.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length)
          yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= Relational.RuleMinSupport).toMap
    val itemCnt = lp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = pairCnt.toSeq
      .flatMap { case ((a, b), k) => Seq((a, b, k), (b, a, k)) }
      .map { case (a, b, k) =>
        (a, b, k, itemCnt(a), itemCnt(b),
          k.toDouble / math.sqrt((itemCnt(a) * itemCnt(b)).toDouble))
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._6, r._2)).take(Relational.ItemNeighborsK)
          .zipWithIndex.map { case (r, i) =>
            (r._1, r._2, r._3, r._4, r._5, r._6, i + 1) }
      }.toSet
    val got = Relational.itemNeighbors(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Double, Int)].collect().toSet
    assert(got == expect, "neighbor table vs driver recompute")
    assert(got.nonEmpty)
    // serving-table shape: ranks dense from 1, at most K per item
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._7).toSeq.sorted == (1 to rows.size))
      assert(rows.size <= Relational.ItemNeighborsK)
    }
    // cosine in (0, 1]; symmetric cooc consistency
    got.foreach(r => assert(r._6 > 0.0 && r._6 <= 1.0))
  }

  test("triples: supports and 3-way lift equal the brute driver " +
      "recompute; top-N ordering exact") {
    val lp = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val baskets = lp.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    val n = baskets.size.toLong
    val item = lp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val support = baskets.values.flatMap(_.combinations(3))
      .map(c => (c(0), c(1), c(2)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= Relational.RuleMinSupport).toMap
    val scored = support.toSeq.map { case ((a, b, c), s) =>
      val lift = (s.toDouble * n.toDouble * n.toDouble) /
        (item(a).toDouble * item(b).toDouble * item(c).toDouble)
      (a, b, c, s, lift)
    }
    val expect = scored.sortBy(r => (-r._5, r._1, r._2, r._3))
      .take(Relational.TripleTopN)
    val got = Relational.basketTriples(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == expect, "triple table differs from brute recompute")
    assert(got.nonEmpty && got.forall(r =>
      r._1 < r._2 && r._2 < r._3 && r._4 >= Relational.RuleMinSupport))
  }
}
