package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #272: shingle novelty vs a driver recompute, with the conservation law
  * that makes the ratio meaningful: every distinct shingle in the corpus
  * is novel exactly once.
  */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-doc novel/total shingle counts equal the recompute; novel " +
      "counts conserve the distinct-shingle budget; ratio in (0, 1]") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val ws = t.trim.split("\\s+")
        id -> ws.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty).toMap
    val first = docs.toSeq.flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = Dedup.novelty(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == docs.keySet, "doc sets differ")
    got.foreach { case (id, nSh, nNov, ratio) =>
      assert(nSh == docs(id).size.toLong, s"shingles of $id")
      val expNov = docs(id).count(g => first(g) == id)
      assert(nNov == expNov.toLong, s"novel count of $id")
      assert(ratio == nNov.toDouble / nSh, s"ratio of $id")
      assert(ratio >= 0.0 && ratio <= 1.0, s"ratio range of $id")
    }
    assert(got.map(_._3).sum == first.size.toLong,
      "novel counts != distinct shingle budget")
    // the earliest doc is all-novel by construction
    val firstDoc = docs.keys.min
    assert(got.find(_._1 == firstDoc).get._4 == 1.0,
      "earliest doc not fully novel")
  }
}
