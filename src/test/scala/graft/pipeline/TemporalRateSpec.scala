package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #294 dedup_rate_by_source and #295 split_temporal — driver
  * recomputes plus the conservation laws each table is read for.
  */
class TemporalRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedup rate by source: counts conserve the corpus, dups equal " +
      "the canonical mapping, rates are exact divisions") {
    val canon = graft.dedup.Dedup.canonical(spark, TestSpark.sf)
      .select($"doc_id", $"is_canonical").as[(Long, Boolean)]
      .collect().toMap
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)]
      .collect()
    val got = graft.dedup.Dedup.rateBySource(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val bySrc = docs.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, ds) =>
      val (_, n, nCan, nDup, rate, chars, charsRm) = got(src)
      val dup = ds.count(d => !canon(d._1))
      assert(n == ds.length.toLong, s"docs of $src")
      assert(nDup == dup.toLong && nCan == (ds.length - dup).toLong,
        s"dup split of $src")
      assert(rate == dup.toDouble / ds.length, s"rate of $src")
      assert(chars == ds.map(_._3).sum, s"chars of $src")
      assert(charsRm == ds.filter(d => !canon(d._1)).map(_._3).sum,
        s"chars removed of $src")
    }
    // corpus budget conservation
    assert(got.values.map(_._2).sum == docs.length.toLong)
  }

  test("temporal split: cutoff arithmetic, per-type budgets, and user " +
      "overlap equal a driver recompute; overlap bounded by both sides") {
    val ev = graft.relational.Events.eventsS(spark, TestSpark.sf)
      .select($"event_type", $"user_id", expr("ts_s DIV 86400").as("day"))
      .as[(String, Long, Long)].collect()
    val d0 = ev.map(_._3).min; val d1 = ev.map(_._3).max
    val cutoff = d0 + ((d1 - d0) * 4) / 5
    val got = Split.temporal(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    val byType = ev.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, es) =>
      val (_, cd, nTr, nTe, uTr, uTe, uBoth, rate) = got(t)
      assert(cd == cutoff, s"cutoff of $t")
      val tr = es.filter(_._3 <= cutoff); val te = es.filter(_._3 > cutoff)
      assert(nTr == tr.length.toLong && nTe == te.length.toLong,
        s"event budget of $t")
      assert(nTr + nTe == es.length.toLong, s"conservation of $t")
      val sTr = tr.map(_._2).toSet; val sTe = te.map(_._2).toSet
      assert(uTr == sTr.size.toLong && uTe == sTe.size.toLong,
        s"user counts of $t")
      assert(uBoth == (sTr & sTe).size.toLong, s"overlap of $t")
      assert(uBoth <= math.min(uTr, uTe), s"overlap bound of $t")
      val expRate = if (sTe.isEmpty) 0.0 else uBoth.toDouble / uTe
      assert(rate == expRate, s"rate of $t")
    }
  }
}
