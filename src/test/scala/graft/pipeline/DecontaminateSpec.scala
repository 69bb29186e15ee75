package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flags only non-eval docs, and every flagged doc truly shares an 8-gram") {
    val out = Decontaminate.decontaminate(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty, "test corpus plants near-dups across the eval boundary")
    out.foreach { case (docId, nShared, minEval) =>
      assert(docId % Decontaminate.EvalMod != 0, "eval docs must not be flagged")
      assert(minEval % Decontaminate.EvalMod == 0)
      assert(nShared >= 1)
    }
    // ground truth for one flagged pair: re-derive the gram sets in Scala
    val (docId, _, evalId) = out.minBy(_._1)
    val texts = graft.core.Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id").isin(docId, evalId))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def gramSet(t: String) =
      t.trim.split("\\s+").sliding(Decontaminate.N).map(_.mkString(" ")).toSet
    assert(gramSet(texts(docId)).intersect(gramSet(texts(evalId))).nonEmpty)
  }
}
