package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Truncation-eval guarantees beyond the oracle: every query appears
  * exactly once, the overlap is bounded by K, the full-dimension side
  * agrees with the brute top-k operator, and one query's report matches
  * a driver recomputation over the raw vectors.
  */
class TruncateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = Ann.truncateEval(spark, TestSpark.sf)
    .as[(Long, Long, Boolean)].collect()

  test("one row per query, overlap bounded by K") {
    val nQueries = Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") % Ann.QueryMod === 0).count()
    assert(rows.length == nQueries)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, ov, _) => assert(ov >= 0 && ov <= Ann.K) }
  }

  test("one query's overlap and top-1 agreement match a driver recompute") {
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val q = rows.map(_._1).min
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      dot / (na * nb)
    }
    def topk(dim: Int): Seq[Long] = {
      val qv = vecs(q).take(dim)
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(qv, v.take(dim))) }
        .sortBy { case (id, c) => (-c, id) }.take(Ann.K).map(_._1)
    }
    val (full, trunc) = (topk(64), topk(Ann.TruncDim))
    val expOverlap = full.toSet.intersect(trunc.toSet).size
    val expTop1 = full.head == trunc.head
    val (_, gotOv, gotTop1) = rows.find(_._1 == q).get
    assert(gotOv == expOverlap, s"overlap $gotOv vs driver $expOverlap")
    assert(gotTop1 == expTop1)
  }

  test("full-dimension side is consistent with the brute top-k operator") {
    val brute = Ann.bruteTopK(spark, TestSpark.sf)
      .groupBy("q_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (q, _, _) =>
      assert(brute.contains(q), s"query $q must exist in the brute ranking")
    }
  }
}
