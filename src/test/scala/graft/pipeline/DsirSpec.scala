package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{PortableHash, Tables}
import graft.text.Features

/** DSIR guarantees beyond the oracle: the weights separate the target
  * domain from the rest (the selection property the method exists for),
  * every document is scored exactly once, and one document's weight
  * matches a full driver recomputation of the two bag models.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = Dsir.dsirWeights(spark, TestSpark.sf)
    .as[(Long, String, Long, Double, Boolean)].collect()

  private lazy val docs = Tables.documents(spark, TestSpark.sf)
    .select("doc_id", "lang", "text").as[(Long, String, String)].collect()

  private def feats(text: String): Seq[Int] = {
    val ws = text.trim.split("\\s+").toSeq
    (ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .map(f => (PortableHash.pHashJvm(s"FH|$f") % Features.NSlots).toInt)
  }

  test("every document scored exactly once") {
    assert(rows.length == docs.length)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("weights separate the target domain (selection property)") {
    val (target, rest) = rows.partition(_._2 == Dsir.TargetLang)
    val meanT = target.map(_._4).sum / target.length
    val meanR = rest.map(_._4).sum / rest.length
    assert(meanT > meanR,
      s"mean target logw $meanT must exceed non-target $meanR")
    val keepT = target.count(_._5).toDouble / target.length
    val keepR = rest.count(_._5).toDouble / rest.length
    assert(keepT > keepR, s"target keep-rate $keepT vs non-target $keepR")
  }

  test("one document's weight matches a driver recompute of the models") {
    val m = Features.NSlots
    val cntR = new Array[Long](m)
    val cntT = new Array[Long](m)
    docs.foreach { case (_, lang, text) =>
      feats(text).foreach { s =>
        cntR(s) += 1
        if (lang == Dsir.TargetLang) cntT(s) += 1
      }
    }
    val (nR, nT) = (cntR.sum, cntT.sum)
    def lr(s: Int): Double = {
      val raw = math.log(((cntT(s) + 1) * (nR + m)).toDouble /
        ((cntR(s) + 1) * (nT + m)).toDouble)
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    val (docId, _, text) = docs.minBy(_._1)
    val byCnt = feats(text).groupBy(identity).view.mapValues(_.size).toMap
    val expLogw = {
      val scaled = byCnt.toSeq.map { case (s, c) =>
        math.floor(c.toDouble * lr(s) * 1e6 + 0.5).toLong
      }.sum
      scaled.toDouble / 1e6
    }
    val got = rows.find(_._1 == docId).get
    assert(got._4 == expLogw, s"logw ${got._4} vs driver $expLogw")
    assert(got._3 == byCnt.values.sum, "n_feats")
  }
}
