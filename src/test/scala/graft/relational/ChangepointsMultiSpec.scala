package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #338 multi-shift changepoints: the recursion must agree with #333's
  * single-split primitive at depth 1, the F acceptance must actually
  * reject (no split of pure noise at any depth on a planted flat
  * series), and TWO planted level shifts must BOTH be recovered — the
  * capability #333 by construction lacks.
  */
class ChangepointsMultiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("depth-1 splits are exactly #333's argmax rows for the accepted types") {
    val single = Events.changepoint(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(6))).toMap
    val multi = Events.changepointsMulti(spark, TestSpark.sf).collect()
    val d1 = multi.filter(_.getInt(0) == 1)
    assert(d1.nonEmpty, "no depth-1 changepoint accepted on real data")
    d1.foreach { r =>
      val (cpDay, gain) = single(r.getString(1))
      assert(r.getLong(2) == cpDay,
        s"${r.getString(1)}: depth-1 day ${r.getLong(2)} != #333's $cpDay")
      assert(r.getDouble(7) == gain)
    }
    // and the accepted set is a SUBSET of #333's argmax rows (the F
    // gate only removes, never invents)
    assert(d1.map(_.getString(1)).toSet.subsetOf(single.keySet))
  }

  private def stage(rows: Seq[(Long, Double)], name: String): String = {
    val out = graft.core.TempDirs.create("graft_cpm_")
    rows.zipWithIndex.map { case ((d, v), i) =>
      (i.toLong, new java.sql.Timestamp(d * 86400000L), 1L, name, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("two planted level shifts are both recovered (10→30→5)") {
    // 20 days at 10, 20 at 30, 20 at 5: depth 1 must cut at one shift,
    // depth 2 at the other — both planted days exactly
    val series = (0 until 60).map { d =>
      (d.toLong, if (d < 20) 10.0 else if (d < 40) 30.0 else 5.0)
    }
    val out = stage(series, "twoshift")
    val r = Events.changepointsMulti(spark, out).collect()
      .map(row => (row.getInt(0), row.getLong(2),
        row.getDouble(5), row.getDouble(6)))
      .sortBy(_._2)
    assert(r.map(_._2).toSet == Set(19L, 39L),
      s"expected shifts after days 19 and 39, got ${r.toSeq}")
    // depths: one of them is the depth-1 cut, the other depth 2
    assert(r.map(_._1).sorted.toSeq == Seq(1, 2))
    // the 30→5 boundary is the larger jump → depth 1 cuts there
    val d1 = r.find(_._1 == 1).get
    assert(d1._2 == 39L)
  }

  test("pure-noise and flat series are never split") {
    // flat series: SSE = 0 → the ssen > 0 guard must hold every depth
    val flat = stage((0 until 40).map(d => (d.toLong, 7.0)), "flat")
    assert(Events.changepointsMulti(spark, flat).collect().isEmpty)
    // small deterministic jitter with no level structure: t² stays
    // below the acceptance bar
    val noise = stage((0 until 40).map(d =>
      (d.toLong, 10.0 + (if (d % 2 == 0) 0.01 else -0.01))), "noise")
    assert(Events.changepointsMulti(spark, noise).collect().isEmpty)
  }
}
