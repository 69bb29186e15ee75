package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #333 changepoint: the window-algebra argmax must equal the brute
  * driver recompute of the binary-segmentation objective over the same
  * daily series.
  */
class ChangepointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("argmax split equals the brute driver recompute per type") {
    val e = graft.core.Tables.events(spark, TestSpark.sf)
    val daily = e
      .select(col("event_type"),
        expr(s"${Events.tsNanos(e)} DIV ${86400L * 1000000000L}").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sv"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      }

    def quant(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = daily.map { case (t, series) =>
      val n = series.length
      val st = series.map(_._2).sum
      val best = (1 until n).map { k =>
        val s1 = series.take(k).map(_._2).sum
        val d = (BigDecimal(s1) * (n - k) - BigDecimal(st - s1) * k)
          .toDouble / 1e6
        val gain = quant(d * d / (k.toLong * (n - k) * n).toDouble)
        (gain, series(k - 1)._1, k, s1)
      }.maxBy(c => (c._1, -c._2))
      t -> best
    }

    val got = Events.changepoint(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (gain, day, k, s1)) =>
      val (cpDay, nPre, nPost, meanPre, meanPost, g) = got(t)
      val series = daily(t); val n = series.length
      val st = series.map(_._2).sum
      assert(cpDay == day, s"$t: cp_day $cpDay != $day")
      assert(nPre == k && nPost == n - k)
      assert(g == gain, s"$t: gain $g != $gain")
      assert(meanPre == quant(s1.toDouble / k / 1e6))
      assert(meanPost == quant((st - s1).toDouble / (n - k) / 1e6))
    }
  }

  test("a planted level shift is found at the planted day") {
    import spark.implicits._
    // synthetic series staged as an events table: value 10 for 20 days,
    // 30 for the next 20 — the changepoint must be day 19 (last pre day)
    val out = graft.core.TempDirs.create("graft_cp_")
    (0 until 40).map { d =>
      val v = if (d < 20) 10.0 else 30.0
      (d.toLong, new java.sql.Timestamp(d * 86400000L), 1L, "shift", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val r = Events.changepoint(spark, out).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 20 && row.getLong(3) == 20)
    assert(row.getDouble(4) == 10.0 && row.getDouble(5) == 30.0)
  }
}
