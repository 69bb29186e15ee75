package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Binary-signature retrieval guarantees beyond the oracle: ranking
  * invariants, a full driver recomputation of one query's Hamming
  * ranking from the raw vectors, and the angle-preservation sanity the
  * 1-bit representation exists for (low-Hamming neighbors have higher
  * true cosine than the corpus average).
  */
class BinarizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = Binarize.hammingTopK(spark, TestSpark.sf)
    .as[(Long, Long, Int, Int)].collect()

  private lazy val vecs = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .as[(Long, Seq[Double])].collect().toMap

  private def sigBits(v: Seq[Double]): Seq[Boolean] = v.map(_ > 0.0)

  test("per-query ranking invariants") {
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == Ann.K, s"query $q has ${rs.length} rows")
      assert(rs.map(_._4).sorted.toSeq == (1 to Ann.K))
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.toSeq,
        "hamming nondecreasing with rank")
      rs.foreach { case (_, _, h, _) => assert(h >= 0 && h <= 64) }
    }
  }

  test("one query's ranking matches a driver recompute over raw vectors") {
    val q = rows.map(_._1).min
    val qb = sigBits(vecs(q))
    val exp = vecs.toSeq.filter(_._1 != q)
      .map { case (id, v) =>
        (id, sigBits(v).zip(qb).count { case (a, b) => a != b }) }
      .sortBy { case (id, h) => (h, id) }.take(Ann.K)
    val gotQ = rows.filter(_._1 == q).sortBy(_._4)
      .map(r => (r._2, r._3)).toSeq
    assert(gotQ == exp, s"query $q ranking")
  }

  test("low-Hamming neighbors carry above-average true cosine") {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val topCos = rows.map { case (q, v, _, _) => cos(vecs(q), vecs(v)) }
    val meanTop = topCos.sum / topCos.length
    val qs = rows.map(_._1).distinct
    val base = for (q <- qs; (id, v) <- vecs.toSeq.take(100) if id != q)
      yield cos(vecs(q), v)
    val meanBase = base.sum / base.length
    assert(meanTop > meanBase,
      s"sign bits must preserve angle: top $meanTop vs baseline $meanBase")
  }
}
