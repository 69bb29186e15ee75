package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Packing invariants the oracle's row-compare doesn't state explicitly. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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
  test("shard manifest: 16 shards cover the corpus, shares sum to 1, " +
    "skew bounded") {
    val rows = Packing.shardAssign(spark, TestSpark.sf)
      .select("shard", "n_docs", "tok_share")
      .as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0 until Packing.NShards.toInt))
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_._2).sum == nDocs)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12)
    // hash-uniform shards: no shard above 3x or below 1/5 of fair share
    val fair = 1.0 / Packing.NShards
    rows.foreach { case (sh, _, share) =>
      assert(share < 3 * fair && share > fair / 5, s"shard $sh share=$share")
    }
  }

  test("pair packing: every doc in exactly one pair, packed bins fit, " +
    "and pairing beats one-doc-per-bin substantially") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val r = Packing.packBins(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(r.agg(sum("n_docs")).head.getLong(0) == nDocs)
    // a pair row has both sides; a middle row exactly one
    assert(r.filter(col("n_docs") === 2 &&
      (col("d_small").isNull || col("d_large").isNull)).isEmpty)
    assert(r.filter(col("n_docs") === 1 && col("d_large").isNotNull).isEmpty)
    // packed bins really fit; split pairs really don't
    assert(r.filter(col("packed") && col("t_total") > Packing.BinLen).isEmpty)
    assert(r.filter(!col("packed") && col("n_docs") === 2 &&
      col("t_total") <= Packing.BinLen).isEmpty)
    // the point of packing: far fewer bins than documents (docs are
    // ~half the bin length here, so fold pairing should pack most)
    val bins = r.agg(sum("n_bins")).head.getLong(0)
    assert(bins < (nDocs * 3) / 4, s"bins=$bins docs=$nDocs")
    r.unpersist()
  }
}
