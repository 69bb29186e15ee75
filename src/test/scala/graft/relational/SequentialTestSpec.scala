package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #329: the always-valid mSPRT readout vs a driver recompute, plus
  * the monotone property that makes peeking safe: at fixed delta and
  * shrinking variance (more data), log-lambda grows — evidence only
  * accumulates.
  */
class SequentialTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("the row equals the cell recompute; p in (0,1]; reject " +
      "consistent; evidence monotone in shrinking variance") {
    import graft.core.PortableHash.pHashJvm
    val e = graft.core.Tables.events(spark, TestSpark.sf)
      .selectExpr("user_id", "event_type").as[(Long, String)].collect()
    val users = e.groupBy(_._1).toSeq.map { case (u, rs) =>
      val conv = if (rs.count(_._2 == "purchase") * 5 > rs.size) 1L else 0L
      (if (pHashJvm(s"ab|$u") % 2 == 0) "A" else "B", conv)
    }.toSeq
    val (na, ca) = (users.count(_._1 == "A").toLong,
      users.filter(_._1 == "A").map(_._2).sum)
    val (nb, cb) = (users.count(_._1 == "B").toLong,
      users.filter(_._1 == "B").map(_._2).sum)
    val delta = ca.toDouble / na - cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val v = (pp * (1.0 - pp)) * ((1.0 / na) + (1.0 / nb))
    val t2 = Events.SeqTau2
    def ll(d: Double, vv: Double) =
      0.5 * math.log(vv / (vv + t2)) + d * d * t2 / (2.0 * vv * (vv + t2))

    val r = Events.sequentialTest(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Boolean)]
      .collect().head
    assert((r._1, r._2, r._3, r._4) == ((na, ca, nb, cb)))
    assert(r._5 == delta && r._6 == v)
    assert(r._7 == q6(ll(delta, v)))
    assert(r._8 == q6(math.min(1.0, math.exp(-ll(delta, v)))))
    assert(r._8 > 0.0 && r._8 <= 1.0)
    assert(r._9 == (r._8 < 0.05))
    // peeking safety: at a MATERIAL fixed effect, 10x the data (v/10)
    // accumulates evidence — log-lambda grows. (At delta ~ 0 the ln
    // term dominates and evidence correctly DECAYS — that asymmetry is
    // what makes the p-value always-valid under the null.)
    assert(ll(0.2, v / 10.0) >= ll(0.2, v),
      "evidence must accumulate as variance shrinks at a real effect")
    assert(ll(1e-6, v / 10.0) <= ll(1e-6, v),
      "near-null evidence must not accumulate with more data")
  }
}
