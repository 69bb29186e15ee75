package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{PortableHash, Tables}

/** Feature-hashing guarantees beyond the oracle: total occurrence
  * accounting (every unigram and bigram lands in exactly one slot),
  * slot-range and sign-parity invariants, and a driver recompute of one
  * document's feature stream.
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val slots = Features.hashFeatures(spark, TestSpark.sf)
    .as[(Long, Long, Long, Long)].collect()

  test("every feature occurrence is slotted exactly once") {
    val lens = Tables.documents(spark, TestSpark.sf)
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .as[Int].collect()
    val expected = lens.map(_.toLong).sum + lens.map(n => math.max(n - 1, 0).toLong).sum
    assert(slots.map(_._2).sum == expected, "Σ n_occ = Σ (|words| + |bigrams|)")
  }

  test("slot range, collision accounting and sign parity hold") {
    slots.foreach { case (slot, nOcc, nFeats, signed) =>
      assert(slot >= 0 && slot < Features.NSlots)
      assert(nFeats >= 1 && nFeats <= nOcc)
      assert(math.abs(signed) <= nOcc)
      assert(((signed % 2) + 2) % 2 == nOcc % 2, "signed_sum ≡ n_occ (mod 2)")
    }
  }

  test("driver recompute of one document's features matches the hash map") {
    val text = Tables.documents(spark, TestSpark.sf)
      .orderBy("doc_id").select("text").as[String].head()
    val ws = text.trim.split("\\s+").toSeq
    val feats = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    feats.foreach { f =>
      val fh = PortableHash.pHashJvm(s"FH|$f")
      val slot = fh % Features.NSlots
      assert(slots.exists(_._1 == slot),
        s"slot $slot of feature '$f' must be occupied")
    }
  }
}
