package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #299 hard negatives — brute driver recompute (ordered-fold cosine)
  * plus the two properties the miner exists for: every negative carries
  * a different label, and the mined set is genuinely HARDER than the
  * unrestricted top-K would suggest (it is the top-K of the wrong-label
  * subset, so its cosines are bounded by the unrestricted ones).
  */
class HardNegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    def fold(f: Int => Double) = (0 until a.length)
      .foldLeft(0.0)((acc, i) => acc + f(i))
    fold(i => a(i) * b(i)) /
      (math.sqrt(fold(i => a(i) * a(i))) *
        math.sqrt(fold(i => b(i) * b(i))))
  }

  test("mined negatives equal the brute wrong-label top-K exactly") {
    val vecs = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"label".cast("long"),
        $"embedding".cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()
    val got = Ann.hardNegatives(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._6).map(r => (r._3, r._4, r._5)).toSeq).toMap
    val queries = vecs.filter(_._1 % Ann.QueryMod == 0)
    assert(got.keySet == queries.map(_._1).toSet)
    queries.foreach { case (qid, qlab, qv) =>
      val exp = vecs
        .filter(v => v._1 != qid && v._2 != qlab)
        .map(v => (v._1, v._2, cos(qv, v._3)))
        .sortBy(r => (-r._3, r._1)).take(Ann.K).toSeq
      assert(got(qid) == exp, s"negatives of $qid")
      assert(got(qid).forall(_._2 != qlab), s"label purity of $qid")
    }
  }
}
