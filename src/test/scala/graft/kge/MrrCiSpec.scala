package graft.kge

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #283: bootstrap MRR CI — replicate membership, per-replicate MRRs and
  * the nearest-rank picks recomputed driver-side from the rank frame.
  */
class MrrCiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CI row equals the half-sampling recompute; interval ordered and " +
      "replicates all populated") {
    val ranks = RankingEval.ranks(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    def dAvg(vs: Seq[Double]): Double =
      (vs.map(v => math.floor(v * 1e6 + 0.5).toLong).sum / 1e6) / vs.size
    val reps = (0 until RankingEval.CiB).map { b =>
      val in = ranks.filter { case (s, p, o, _) =>
        graft.core.PortableHash.pHashJvm(s"bs|$s|$p|$o|$b") % 2 == 0 }
      dAvg(in.map(r => 1.0 / r._4).toSeq)
    }.sorted
    val mrr = dAvg(ranks.map(r => 1.0 / r._4).toSeq)
    val row = RankingEval.mrrCi(spark, TestSpark.sf)
      .as[(Long, Double, Long, Double, Double)].head()
    assert(row._1 == ranks.length.toLong, "n_test")
    assert(row._2 == mrr, "full mrr")
    assert(row._3 == RankingEval.CiB.toLong, "replicate count")
    assert(row._4 == reps(1) && row._5 == reps(30),
      "nearest-rank picks (indices 2 and 31, 1-based)")
    assert(row._4 <= row._5, "interval inverted")
    // the interval has width: replicates genuinely vary on this corpus
    assert(row._4 < row._5, "degenerate interval — subsampling inert")
  }
}
