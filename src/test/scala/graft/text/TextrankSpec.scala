package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #326: TextRank — a full driver recompute of the 3-iteration
  * weighted-PageRank on the word co-occurrence graph with the same
  * quantized-contribution discipline, plus the conservation property
  * (total rank mass stays 1 within grid tolerance).
  */
class TextrankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-20 equals the driver recompute; rank mass conserved") {
    val texts = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"text").as[String].collect()
    val adj = texts.flatMap { t =>
      val ws = t.trim.split("\\s+")
      ws.dropRight(1).zip(ws.drop(1)).filter(p => p._1 != p._2)
    }
    val und = (adj ++ adj.map(_.swap)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap // (a,b) -> w
    val strength = und.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val nodes = strength.keys.toSeq.sorted
    val n = nodes.size
    def q12(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    var s = nodes.map(w => w -> 1.0 / n).toMap
    for (_ <- 1 to Relevance.TrIters) {
      val contrib = scala.collection.mutable.Map[String, Long]()
      und.foreach { case ((a, b), w) =>
        contrib(b) = contrib.getOrElse(b, 0L) + q12(s(a) / strength(a) * w)
      }
      s = nodes.map { w =>
        w -> (0.15000000000000002 / n +
          0.85 * (contrib.getOrElse(w, 0L).toDouble / 1e12))
      }.toMap
    }
    val mass = s.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, "rank mass must be conserved")
    val expect = s.toSeq.sortBy { case (w, sc) => (-sc, w) }
      .take(Relevance.TrTopN)
    val got = Relevance.textrank(spark, TestSpark.sf)
      .as[(String, Double, Int)].collect().sortBy(_._3)
    assert(got.length == Relevance.TrTopN)
    got.zip(expect).zipWithIndex.foreach {
      case (((w, sc, rnk), (ew, esc)), i) =>
        assert(w == ew && sc == esc && rnk == i + 1, s"rank ${i + 1}")
    }
  }
}
