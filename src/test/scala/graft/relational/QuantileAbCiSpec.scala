package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.PortableHash

/** #339 QTE bootstrap CI: the base columns must be exactly #336's, the
  * interval must be ordered around nothing it doesn't contain
  * (lo ≤ hi), a degenerate A/A (identical per-arm distributions by
  * construction) must give qte = 0 with CI = [0, 0] at every quantile,
  * and a planted constant +5.00 arm shift must give qte = 5 with
  * CI = [5, 5] (half-sampling cannot move the quantile of a constant).
  */
class QuantileAbCiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("base point estimates match #336; intervals are ordered; replicates full") {
    val base = Events.quantileAb(spark, TestSpark.sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val ci = Events.quantileAbCi(spark, TestSpark.sf).collect()
    assert(ci.map(_.getInt(0)).sorted.toSeq == Seq(25, 50, 75, 90))
    ci.foreach { r =>
      val (nA, nB, qA, qB, qte) = base(r.getInt(0))
      assert(r.getLong(1) == nA && r.getLong(2) == nB)
      assert(r.getDouble(3) == qA && r.getDouble(4) == qB)
      assert(r.getDouble(5) == qte)
      assert(r.getLong(6) == Events.QabCiB,
        s"expected all ${Events.QabCiB} replicates realized at this SF")
      assert(r.getDouble(7) <= r.getDouble(8), "qte_lo must be <= qte_hi")
    }
  }

  private def stage(users: Seq[(Long, Double)]): String = {
    val out = graft.core.TempDirs.create("graft_qabci_")
    users.zipWithIndex.map { case ((uid, v), i) =>
      (i.toLong, new java.sql.Timestamp(86400000L + i * 1000L), uid,
        "buy", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  private def armOf(uid: Long): String =
    if (PortableHash.pHashJvm(s"ab|$uid") % 2 == 0) "A" else "B"

  test("A/A with identical constant metric: qte = 0, CI = [0,0] everywhere") {
    val out = stage((1L to 200L).map(u => (u, 12.34)))
    val r = Events.quantileAbCi(spark, out).collect()
    assert(r.length == 4)
    r.foreach { row =>
      assert(row.getDouble(5) == 0.0)
      assert(row.getDouble(7) == 0.0 && row.getDouble(8) == 0.0)
    }
  }

  test("planted +5.00 arm shift: qte = 5 with CI = [5,5] at every quantile") {
    // constants per arm (computed with the operator's own hash), so any
    // nonempty half-sample has the same quantiles — the CI must pin the
    // planted effect exactly, no width
    val out = stage((1L to 400L).map { u =>
      (u, if (armOf(u) == "A") 10.0 else 15.0)
    })
    val r = Events.quantileAbCi(spark, out).collect()
    assert(r.length == 4)
    r.foreach { row =>
      assert(row.getDouble(3) == 10.0 && row.getDouble(4) == 15.0)
      assert(row.getDouble(5) == 5.0)
      assert(row.getDouble(7) == 5.0 && row.getDouble(8) == 5.0)
    }
  }
}
