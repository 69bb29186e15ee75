package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #327: CUPED — the variance identity var(Y−θX) = var(Y) − 2θcov +
  * θ²var(X) against a literal per-user adjusted-metric recompute, and
  * the defining guarantees: θ minimizes adjusted variance (any other θ
  * does worse) and the adjustment never increases variance.
  */
class CupedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(x: Double, s: Double) = math.floor(x * s + 0.5).toLong

  private lazy val userXY = {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val rows = e.selectExpr("user_id", "value",
      s"(${Events.tsNanos(e)} DIV 1000000000) DIV 86400 AS day")
      .as[(Long, Double, Long)].collect()
    val cut = (rows.map(_._3).min + rows.map(_._3).max + 1) / 2
    rows.groupBy(_._1).map { case (u, rs) =>
      val x = rs.filter(_._3 < cut).map(r => q(r._2, 1e2)).sum.toDouble / 1e2
      val y = rs.filter(_._3 >= cut).map(r => q(r._2, 1e2)).sum.toDouble / 1e2
      (u, x, y)
    }.toSeq
  }

  test("per-arm rows equal the moment recompute; theta minimizes; " +
      "variance never increases") {
    import graft.core.PortableHash.pHashJvm
    def sums(rs: Seq[(Long, Double, Double)]) = (
      rs.size.toLong,
      rs.map(r => q(r._2, 1e2)).sum.toDouble / 1e2,
      rs.map(r => q(r._3, 1e2)).sum.toDouble / 1e2,
      rs.map(r => q(r._2 * r._2, 1e4)).sum.toDouble / 1e4,
      rs.map(r => q(r._3 * r._3, 1e4)).sum.toDouble / 1e4,
      rs.map(r => q(r._2 * r._3, 1e4)).sum.toDouble / 1e4)
    val (pn, psx, psy, psxx, _, psxy) = sums(userXY)
    val mpx = psx / pn
    val theta = (psxy / pn - mpx * (psy / pn)) / (psxx / pn - mpx * mpx)
    val byArm = userXY.groupBy(r =>
      if (pHashJvm(s"ab|${r._1}") % 2 == 0) "A" else "B")

    val got = Events.cuped(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("A", "B"))
    byArm.foreach { case (arm, rs) =>
      val (n, sx, sy, sxx, syy, sxy) = sums(rs)
      val (mx, my) = (sx / n, sy / n)
      val varY = syy / n - my * my
      val varX = sxx / n - mx * mx
      val cov = sxy / n - mx * my
      val varAdj = varY - 2.0 * theta * cov + theta * theta * varX
      val r = got(arm)
      assert(r._2 == n && r._3 == theta, s"$arm n/theta")
      assert(r._4 == my && r._5 == my - theta * (mx - mpx), s"$arm means")
      assert(r._6 == varY && r._7 == varAdj, s"$arm variances")
      assert(r._8 == 1.0 - varAdj / varY, s"$arm reduction")
      // the identity equals the literal per-user adjusted variance
      val adj = rs.map(r2 => r2._3 - theta * (r2._2 - mpx))
      val lm = adj.sum / n
      val lv = adj.map(a => (a - lm) * (a - lm)).sum / n
      assert(math.abs(varAdj - lv) < 1e-6, s"$arm identity")
    }
    // theta is the argmin of the POOLED adjusted variance (it is fit
    // on both arms together), and at that optimum CUPED can never
    // increase the pooled variance — the per-arm numbers may sit
    // slightly off their own arm-local optimum, which is expected
    val (_, _, _, _, psyy2, _) = sums(userXY)
    val pVarY = psyy2 / pn - (psy / pn) * (psy / pn)
    val pVarX = psxx / pn - mpx * mpx
    val pCov = psxy / pn - mpx * (psy / pn)
    def v(t: Double) = pVarY - 2.0 * t * pCov + t * t * pVarX
    assert(v(theta) <= v(theta * 0.9) + 1e-12 &&
      v(theta) <= v(theta * 1.1) + 1e-12 && v(theta) <= v(0.0) + 1e-12,
      "pooled argmin")
  }
}
