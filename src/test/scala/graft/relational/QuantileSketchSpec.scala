package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #321: the grid-CDF quantile sketch — nearest-rank readout vs a
  * driver recompute, and the merge law (shard states added = monolithic
  * state, readout identical) that makes it a sketch.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = graft.core.Tables.events(spark, TestSpark.sf)

  test("readout: every (type, q) equals the nearest-rank pick over the " +
      "cent-cell CDF recomputed on the driver") {
    val cells = events
      .selectExpr("event_type",
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cell")
      .as[(String, Long)].collect()
    val expect = cells.groupBy(_._1).flatMap { case (t, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      Sketches.QuantileQs.map { case (q, nu, de) =>
        val rank = (nu * n + de - 1) / de
        (t, q) -> ((n, rank, sorted((rank - 1).toInt).toDouble / 100.0))
      }
    }
    val got = Sketches.quantileSketch(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (t, q, n, rank, v) =>
      assert((n, rank, v) == expect((t, q)), s"($t, $q)")
    }
  }

  test("merge law: user-parity shard states summed cell-wise equal the " +
      "monolithic state, and the readout off the merged state is " +
      "identical") {
    import org.apache.spark.sql.functions._
    val s0 = Sketches.quantileState(events.filter(col("user_id") % 2 === 0))
    val s1 = Sketches.quantileState(events.filter(col("user_id") % 2 === 1))
    val merged = s0.unionByName(s1)
      .groupBy("event_type", "cell").agg(sum("cnt").as("cnt"))
    val mono = Sketches.quantileState(events)
    val mergedM = merged.as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val monoM = mono.as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(mergedM == monoM, "state must merge by plain addition")
    val fromMerged = Sketches.quantileReadout(merged)
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val fromMono = Sketches.quantileReadout(mono)
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(fromMerged.toSeq == fromMono.toSeq)
  }
}
