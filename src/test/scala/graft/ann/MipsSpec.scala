package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #282: MIPS top-k — brute recompute, the genuine cosine/MIPS
  * disagreement, and the Shrivastava–Li augmentation equivalence that
  * bridges inner-product workloads onto the cosine ANN ladder.
  */
class MipsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vs = graft.core.Tables.embeddings(spark, TestSpark.sf)
    .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    .map { case (id, v) => id -> v.map(_.toDouble).toArray }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("MIPS top-k equals the brute recompute (the test corpus is " +
      "unit-norm, so MIPS ≡ cosine here up to ulps — the norm-sensitive " +
      "semantics are pinned on a perturbed copy below)") {
    val got = Ann.mipsTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    val queries = vs.filter(_._1 % Ann.QueryMod == 0)
    assert(got.keySet == queries.map(_._1).toSet)
    queries.foreach { case (qid, qv) =>
      val scored = vs.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(qv, v)) }
      val expect = scored.sortBy(r => (-r._2, r._1)).take(Ann.K).toSeq
      assert(got(qid) == expect, s"query $qid")
    }
  }

  test("on a norm-perturbed copy, MIPS and cosine rankings genuinely " +
      "diverge — the semantics the operator exists for") {
    // scale item i by 1 + (i mod 5)/4: direction unchanged, norm varies
    val perturbed = vs.map { case (id, v) =>
      val f = 1.0 + (id % 5).toDouble / 4.0
      id -> v.map(_ * f)
    }
    val (qid, qv) = perturbed.find(_._1 % Ann.QueryMod == 0).get
    val items = perturbed.filter(_._1 != qid)
    val byMips = items.map { case (id, v) => (id, dot(qv, v)) }
      .sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    val byCos = items.map { case (id, v) =>
      (id, dot(qv, v) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v))))
    }.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    assert(byMips != byCos, "norm perturbation did not separate the " +
      "two rankings — MIPS would be redundant")
  }

  test("the Shrivastava–Li augmentation maps MIPS order to cosine order " +
      "exactly: items gain sqrt(M² − ‖v‖²), queries gain 0") {
    val m2 = vs.map { case (_, v) => dot(v, v) }.max
    def aug(v: Array[Double]): Array[Double] =
      v :+ math.sqrt(m2 - dot(v, v))
    val (qid, qv) = vs.find(_._1 % Ann.QueryMod == 0).get
    val qa = qv :+ 0.0
    val items = vs.filter(_._1 != qid)
    val byMips = items.map { case (id, v) => (id, dot(qv, v)) }
      .sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    val byAugCos = items.map { case (id, v) =>
      val a = aug(v)
      (id, dot(qa, a) / (math.sqrt(dot(qa, qa)) * math.sqrt(dot(a, a))))
    }.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    // all augmented items share norm M, so cosine order ≡ dot order ≡
    // MIPS order (ties broken by id on both sides)
    assert(byAugCos == byMips, "augmentation broke the order equivalence")
  }
}
