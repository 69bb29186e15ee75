package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Packing invariants the oracle's row-compare doesn't state explicitly. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val packed = Packing.packSequences(spark, TestSpark.sf).cache()

  test("offsets stay inside a block and spans cover the token count") {
    val bad = packed.filter(
      col("offset") < 0 || col("offset") >= Packing.SeqLen ||
        col("blocks_spanned") =!=
          expr(s"(offset + tok - 1) DIV ${Packing.SeqLen} + 1"))
    assert(bad.count() == 0)
  }

  test("per-source streams are gapless: positions reconstruct the " +
    "token prefix-sums exactly") {
    // block·L + offset must equal the per-source running token count —
    // i.e. the packed stream has no holes and no overlaps
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val bad = packed
      .withColumn("cum_before",
        coalesce(sum("tok").over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("block") * Packing.SeqLen + col("offset") =!= col("cum_before"))
    assert(bad.count() == 0)
  }
}
