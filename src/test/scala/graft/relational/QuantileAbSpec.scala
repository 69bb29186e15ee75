package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.PortableHash

/** #336 quantile treatment effects: structure on real data + a planted
  * constant shift recovered at every quantile.
  */
class QuantileAbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quantiles are monotone in p and qte = q_b − q_a") {
    val rows = Events.quantileAb(spark, TestSpark.sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(rows.keySet == Set(25, 50, 75, 90))
    Seq(25, 50, 75).sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._3 >= rows(a)._3 && rows(b)._4 >= rows(a)._4)
    }
    rows.values.foreach { case (na, nb, qa, qb, qte) =>
      assert(na > 0 && nb > 0)
      assert(qte == qb - qa)
    }
  }

  test("a planted constant treatment shift appears at every quantile") {
    import spark.implicits._
    val out = graft.core.TempDirs.create("graft_qte_")
    (0 until 400).map { u =>
      val arm = if (PortableHash.pHashJvm(s"ab|$u") % 2 == 0) "A" else "B"
      val v = if (arm == "A") 1.0 else 3.0
      (u.toLong, new java.sql.Timestamp(86400000L + u * 1000L),
        u.toLong, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val rows = Events.quantileAb(spark, out).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 3.0)
      assert(r.getDouble(5) == 2.0,
        s"p${r.getInt(0)}: qte ${r.getDouble(5)} != planted 2.0")
    }
  }
}
