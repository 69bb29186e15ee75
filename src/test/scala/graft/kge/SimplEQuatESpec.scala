package graft.kge

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #264-265: SimplE and QuatE scoring — raw-dyadic driver recomputes plus
  * the structural properties that distinguish each model from the rungs
  * below it (SimplE breaks DistMult's forced symmetry; QuatE's rotations
  * are unit-norm quaternions).
  */
class SimplEQuatESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dyad(seed: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
  }

  test("SimplE score equals the hand-computed averaged forward/inverse " +
      "CP products, and breaks DistMult's forced symmetry") {
    val rows = Scoring.simpleScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid").limit(5)
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
    rows.foreach { case (sid, pid, oid, score) =>
      val fwd = (0 until Embeddings.D).map(i =>
        dyad(s"E|$sid|$i") * dyad(s"R|$pid|$i") * dyad(s"ET|$oid|$i")).sum
      val inv = (0 until Embeddings.D).map(i =>
        dyad(s"E|$oid|$i") * dyad(s"RV|$pid|$i") * dyad(s"ET|$sid|$i")).sum
      assert(score == (fwd + inv) / 2.0, s"($sid,$pid,$oid)")
      // asymmetry: swapping s and o changes the score (DistMult cannot)
      val fwdR = (0 until Embeddings.D).map(i =>
        dyad(s"E|$oid|$i") * dyad(s"R|$pid|$i") * dyad(s"ET|$sid|$i")).sum
      val invR = (0 until Embeddings.D).map(i =>
        dyad(s"E|$sid|$i") * dyad(s"RV|$pid|$i") * dyad(s"ET|$oid|$i")).sum
      assert(score != (fwdR + invR) / 2.0, s"symmetric at ($sid,$pid,$oid)")
    }
  }

  test("QuatE score equals the hand-computed Hamilton-product inner " +
      "product under unit-normalized relation quaternions; every " +
      "relation unit has nonzero norm") {
    val rows = Scoring.quateScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid").limit(5)
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
    rows.foreach { case (sid, pid, oid, score) =>
      val expected = (0 until Embeddings.D / 4).map { u =>
        val b = 4 * u
        val q = (0 until 4).map(k => dyad(s"QR|$pid|${b + k}"))
        val nrm = math.sqrt(q(0) * q(0) + q(1) * q(1) + q(2) * q(2) + q(3) * q(3))
        assert(nrm > 0.0, s"zero-norm relation unit $u of $pid")
        val w = q.map(_ / nrm)
        val h = (0 until 4).map(k => dyad(s"E|$sid|${b + k}"))
        val t = (0 until 4).map(k => dyad(s"E|$oid|${b + k}"))
        val pa = h(0) * w(0) - h(1) * w(1) - h(2) * w(2) - h(3) * w(3)
        val pb = h(0) * w(1) + h(1) * w(0) + h(2) * w(3) - h(3) * w(2)
        val pc = h(0) * w(2) - h(1) * w(3) + h(2) * w(0) + h(3) * w(1)
        val pd = h(0) * w(3) + h(1) * w(2) - h(2) * w(1) + h(3) * w(0)
        pa * t(0) + pb * t(1) + pc * t(2) + pd * t(3)
      }.reduce(_ + _)
      assert(score == expected, s"($sid,$pid,$oid)")
      // unit-norm invariant: the rotation preserves the entity norm, so
      // |score| ≤ ‖h‖·‖t‖ (Cauchy–Schwarz under an isometry)
      val hn = math.sqrt((0 until Embeddings.D)
        .map(i => { val x = dyad(s"E|$sid|$i"); x * x }).sum)
      val tn = math.sqrt((0 until Embeddings.D)
        .map(i => { val x = dyad(s"E|$oid|$i"); x * x }).sum)
      assert(math.abs(score) <= hn * tn * (1.0 + 1e-12), s"CS at ($sid,$pid,$oid)")
    }
  }

  test("QuatE genuinely reorders the DistMult ranking (the rotation is " +
      "not a reparametrized elementwise product)") {
    val q = Scoring.quateScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid")
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
    val d = Scoring.distmultScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid")
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
    assert(q.map(r => (r._1, r._2, r._3)).toSeq ==
      d.map(r => (r._1, r._2, r._3)).toSeq, "slices differ")
    val qRank = q.sortBy(_._4).map(r => (r._1, r._2, r._3)).toSeq
    val dRank = d.sortBy(_._4).map(r => (r._1, r._2, r._3)).toSeq
    assert(qRank != dRank, "QuatE ranking identical to DistMult")
  }
}
