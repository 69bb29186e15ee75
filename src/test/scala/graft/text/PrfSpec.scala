package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #325: PRF query expansion — the second pass is the same BM25 run on
  * a genuinely expanded term set; feedback terms come from the
  * first-pass top-5 only and never duplicate original query terms.
  */
class PrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expanded ranking: complete per-query top-5, scores descending " +
      "with the doc_id tiebreak, and expansion changed at least one " +
      "query's ranking vs the first pass") {
    val first = Relevance.bm25Search(spark, TestSpark.sf)
      .as[(String, Long, Double, Int)].collect()
    val second = Relevance.prfExpand(spark, TestSpark.sf)
      .as[(String, Long, Double, Int)].collect()
    val queries = first.map(_._1).distinct.sorted.toSeq
    assert(second.map(_._1).distinct.sorted.toSeq == queries)
    queries.foreach { q =>
      val rs = second.filter(_._1 == q).sortBy(_._4)
      assert(rs.map(_._4).toSeq == (1 to 5), s"$q must have a full top-5")
      rs.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
          s"$q rank order must follow (score desc, doc_id asc)")
      }
    }
    // expansion must DO something: at least one query's top-5 set or
    // scores differ from the first pass (the expanded terms add mass)
    val f = first.map(r => (r._1, r._2, r._3)).toSet
    val s = second.map(r => (r._1, r._2, r._3)).toSet
    assert(f != s, "the expanded pass must differ from the first pass")
  }
}
