package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #332 end-to-end pipeline: the composed funnel must agree with the
  * component operators it chains (no drift between "runs alone" and
  * "runs composed") and behave like a funnel.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    Pipeline.e2e(spark, TestSpark.sf).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap

  test("emits all seven stages, docs and tokens monotonically non-increasing") {
    assert(rows.keySet == Pipeline.Stages.toSet)
    val order = Seq("raw", "clean", "canonical", "quality_gate",
      "decontaminated", "train_split")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._1 <= rows(a)._1, s"$b docs > $a docs")
      assert(rows(b)._2 <= rows(a)._2, s"$b tokens > $a tokens")
    }
    assert(rows("train_split")._1 > 0, "empty training corpus")
  }

  test("clean stage equals corpus_clean's own kept totals") {
    val cc = CorpusClean.corpusClean(spark, TestSpark.sf)
      .agg(sum("n_kept"), sum("tokens_kept")).head()
    assert(rows("clean")._1 == cc.getLong(0))
    assert(rows("clean")._2 == cc.getLong(1))
  }

  test("train_split stage is bounded by split_holdout's own train row") {
    // e2e's train count filters the funnel survivors; the standalone
    // split assigns ALL docs — composed train ⊆ standalone train.
    val train = Split.splitHoldout(spark, TestSpark.sf)
      .filter(col("split") === "train").head().getLong(1)
    assert(rows("train_split")._1 <= train)
  }

  test("packed stage: same survivors, block count ≥ tokens/SeqLen lower bound") {
    assert(rows("packed")._1 == rows("train_split")._1)
    assert(rows("packed")._2 == rows("train_split")._2)
    val nb = rows("packed")._3
    val lower = (rows("packed")._2 + Packing.SeqLen - 1) / Packing.SeqLen
    assert(nb >= lower, "fewer blocks than a single fused stream needs")
    // per-source ceil waste: at most one partial block per source
    val nSources = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("source").distinct().count()
    assert(nb <= lower + nSources)
  }
}
