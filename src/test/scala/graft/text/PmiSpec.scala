package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** PMI collocation guarantees beyond the oracle: the full top-20 table
  * (pairs, counts, quantized scores, ranks) matches a complete driver
  * recomputation from the raw text.
  */
class PmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-20 collocations match a full driver recompute") {
    val got = Features.pmiPhrases(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Long, Double, Int)].collect()

    val texts = Tables.documents(spark, TestSpark.sf)
      .select("text").as[String].collect()
    val words = texts.flatMap(_.trim.split("\\s+"))
    val cu = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = words.length.toLong
    val pairs = texts.flatMap(_.trim.split("\\s+").sliding(2).filter(_.length == 2)
      .map(a => (a(0), a(1))))
    val cb = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= Features.PmiMinCount)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val scored = cb.toSeq.map { case ((w1, w2), cp) =>
      (w1, w2, cp, cu(w1), cu(w2),
        q6(math.log((cp * n).toDouble / (cu(w1) * cu(w2)).toDouble)))
    }
    val exp = scored.sortBy { case (w1, w2, _, _, _, pmi) => (-pmi, w1, w2) }
      .take(Features.PmiTopN).zipWithIndex
      .map { case ((w1, w2, cp, c1, c2, pmi), i) => (w1, w2, cp, c1, c2, pmi, i + 1) }

    assert(got.sortBy(_._7).toSeq == exp, "full top-20 table")
    assert(got.forall(_._3 >= Features.PmiMinCount))
  }
}
