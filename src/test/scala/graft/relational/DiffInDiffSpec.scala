package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #324: difference-in-differences vs a driver recompute, plus the
  * defining property: a constant shift applied to BOTH arms in the
  * post period leaves the DiD estimate unchanged (shared trends
  * cancel), while a treated-arm-only shift moves it by exactly the
  * shift.
  */
class DiffInDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q2(x: Double) = math.floor(x * 1e2 + 0.5).toLong

  private lazy val raw = {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    e.selectExpr("user_id", "value",
      s"(${Events.tsNanos(e)} DIV 1000000000) DIV 86400 AS day")
      .as[(Long, Double, Long)].collect()
  }

  private def did(rows: Seq[(Long, Double, Long)]): (Map[(String, String), (Long, Double)], Double) = {
    import graft.core.PortableHash.pHashJvm
    val cut = (rows.map(_._3).min + rows.map(_._3).max + 1) / 2
    val cells = rows.groupBy { r =>
      (if (pHashJvm(s"ab|${r._1}") % 2 == 0) "A" else "B",
        if (r._3 >= cut) "post" else "pre")
    }.map { case (k, rs) =>
      k -> ((rs.size.toLong, rs.map(r => q2(r._2)).sum.toDouble / 1e2))
    }
    def m(a: String, p: String) = {
      val (n, s) = cells((a, p)); s / n.toDouble
    }
    (cells, (m("B", "post") - m("B", "pre")) - (m("A", "post") - m("A", "pre")))
  }

  test("the wide row equals the cell recompute") {
    val (cells, expectDid) = did(raw.toSeq)
    val row = Events.diffInDiff(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(row._1 == cells(("A", "pre"))._1 && row._2 == cells(("A", "post"))._1)
    assert(row._3 == cells(("B", "pre"))._1 && row._4 == cells(("B", "post"))._1)
    def mm(a: String, p: String) = {
      val (n, s) = cells((a, p)); s / n.toDouble
    }
    assert(row._5 == mm("A", "pre") && row._6 == mm("A", "post"))
    assert(row._7 == mm("B", "pre") && row._8 == mm("B", "post"))
    assert(row._9 == expectDid)
  }

  test("shared post-period trends cancel; treated-only effects show " +
      "up at full size") {
    val (_, base) = did(raw.toSeq)
    import graft.core.PortableHash.pHashJvm
    val cut = (raw.map(_._3).min + raw.map(_._3).max + 1) / 2
    // +10.00 to EVERY post-period event (both arms): DiD unchanged
    val shared = raw.map { r =>
      if (r._3 >= cut) (r._1, r._2 + 10.0, r._3) else r
    }
    val (_, didShared) = did(shared.toSeq)
    assert(math.abs(didShared - base) < 1e-9,
      "a shared trend must cancel out of DiD")
    // +10.00 to treated (B) post only: DiD moves by exactly +10
    val treated = raw.map { r =>
      if (r._3 >= cut && pHashJvm(s"ab|${r._1}") % 2 != 0)
        (r._1, r._2 + 10.0, r._3)
      else r
    }
    val (_, didTreated) = did(treated.toSeq)
    assert(math.abs(didTreated - (base + 10.0)) < 1e-9,
      "a treated-only effect must appear at full size")
  }
}
