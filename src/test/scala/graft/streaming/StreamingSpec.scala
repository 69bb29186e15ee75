package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental semantics specs: feed events through a MemoryStream in two
  * batches and check the complete-mode results equal the all-at-once
  * batch computation — the streaming/batch unification contract.
  */
// Top-level, not nested in the suite: Spark's encoder codegen cannot
// construct an inner case class (the accessor needs the outer instance),
// so nested ones silently fall back to interpreted projections and spam
// the test logs with CompileExceptions.
case class Ev(ts_s: Long, user_id: Long, value: Double)
case class EvT(ts_s: Long, event_type: String, value: Double)
case class Doc(doc_id: Long, source: String, text: String, n_chars: Long)
case class Side(ts: Timestamp, user_id: Long, id: Long)
case class Chg(ts_s: Long, user_id: Long, event_id: Long,
  event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark


  test("windowed agg over MemoryStream equals batch after both batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .groupBy((col("ts_s") - (col("ts_s") % 3600)).as("win_start"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val q = agg.writeStream.format("memory").queryName("spec_wagg")
      .outputMode("complete").start()
    stream.addData(Ev(10, 1, 1.0), Ev(3605, 1, 2.0))
    q.processAllAvailable()
    stream.addData(Ev(20, 2, 4.0), Ev(7205, 2, 8.0))
    q.processAllAvailable()
    val got = spark.table("spec_wagg").as[(Long, Long, Double)]
      .collect().toSet
    q.stop()
    assert(got == Set((0L, 2L, 5.0), (3600L, 1L, 2.0), (7200L, 1L, 8.0)))
  }

  test("session_window merges events within the gap incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val sess = stream.toDF()
      .groupBy(session_window(timestamp_seconds(col("ts_s")), "30 minutes"),
        col("user_id"))
      .agg(min("ts_s").as("s"), max("ts_s").as("e"), count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
    val q = sess.writeStream.format("memory").queryName("spec_sess")
      .outputMode("complete").start()
    stream.addData(Ev(100, 1, 0), Ev(1000, 1, 0))
    q.processAllAvailable()
    // 5000 is > 1800 after 1000 → second session; 5100 merges into it
    stream.addData(Ev(5000, 1, 0), Ev(5100, 1, 0))
    // boundary (caught at sf0.1): an event EXACTLY gap seconds after the
    // previous one MERGES — session_window's merge test is inclusive of
    // the window end, so only a strictly larger gap starts a session
    stream.addData(Ev(1000, 2, 0), Ev(1000 + 1800, 2, 0), Ev(1000 + 3601, 2, 0))
    q.processAllAvailable()
    val got = spark.table("spec_sess").as[(Long, Long, Long, Long)]
      .collect().toSet
    q.stop()
    assert(got == Set((1L, 100L, 1000L, 2L), (1L, 5000L, 5100L, 2L),
      (2L, 1000L, 2800L, 2L), (2L, 4601L, 4601L, 1L)))
  }

  test("stream-stream join: cross-batch buffering, range bound, and " +
    "watermark eviction of stale state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000)
    val clicks = MemoryStream[Side]
    val purchases = MemoryStream[Side]
    val c = clicks.toDF()
      .select(col("ts").as("click_ts"), col("user_id"),
        col("id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDF()
      .select(col("ts").as("purchase_ts"), col("user_id").as("p_user"),
        col("id").as("purchase_id"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) -
          unix_timestamp(col("click_ts"))).as("gap_s"))
    val q = joined.writeStream.format("memory").queryName("spec_ssj")
      .outputMode("append").start()
    def got = spark.table("spec_ssj").as[(Long, Long, Long)].collect().toSet
    // batch 1: a click with no purchase yet — buffered, nothing emitted
    clicks.addData(Side(ts(1000), 1, 1))
    q.processAllAvailable()
    assert(got.isEmpty)
    // batch 2: the purchase arrives IN A LATER BATCH and still pairs
    // (cross-batch state); a purchase outside the hour does not
    purchases.addData(Side(ts(2000), 1, 10), Side(ts(5000), 1, 99))
    q.processAllAvailable()
    assert(got == Set((1L, 10L, 1000L)))
    // batch 3: advance both watermarks far past click 1's join window
    clicks.addData(Side(ts(200000), 2, 2))
    purchases.addData(Side(ts(200000), 2, 20))
    q.processAllAvailable()
    assert(got == Set((1L, 10L, 1000L), (2L, 20L, 0L)))
    // batch 4: a purchase that WOULD match click 1 (gap 500) arrives
    // behind the watermark — the click's state is evicted and the late
    // row dropped: no resurrection
    purchases.addData(Side(ts(1500), 1, 11))
    q.processAllAvailable()
    q.stop()
    assert(got == Set((1L, 10L, 1000L), (2L, 20L, 0L)))
  }

  test("file-stream stream-stream join equals the batch interval join " +
    "on sf0.001") {
    val s = EventStreams.streamJoin(spark, TestSpark.sf)
    val e = graft.relational.Events.eventsS(spark, TestSpark.sf)
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_s").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts_s").as("pts"), col("value"))
    val b = c.join(p, col("user_id") === col("p_user") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + 3600)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("pts") - col("cts")).as("gap_s"), col("value"))
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty)
  }

  test("file-stream operators equal their batch analogs on sf0.001") {
    val sWagg = EventStreams.windowedAgg(spark, TestSpark.sf)
    val bWagg = graft.relational.Events.windowedAgg(spark, TestSpark.sf)
    assert(sWagg.exceptAll(bWagg).isEmpty && bWagg.exceptAll(sWagg).isEmpty)
  }

  test("stream-static enrich equals the batch join on sf0.001") {
    import org.apache.spark.sql.functions._
    val s = EventStreams.enrich(spark, TestSpark.sf)
    val dim = graft.core.Tables.customer(spark, TestSpark.sf)
      .join(graft.core.Tables.nation(spark, TestSpark.sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name").as("nation"))
    val b = graft.relational.Events.eventsS(spark, TestSpark.sf)
      .join(dim, "user_id")
      .groupBy("nation", "event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.core.Exact.decSum(col("value")).as("sum_value"))
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty)
    // every event has a matching customer row (no silent inner-join loss)
    val nEvents = s.agg(sum("n_events")).head().getLong(0)
    assert(nEvents == graft.core.Tables.events(spark, TestSpark.sf).count())
  }


  test("streaming quality gate is stateless per-row and cross-batch stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = Array.tabulate(60)(i => s"w$i").mkString(" ") // long, diverse
    val bad = "the the the the the"                         // short, stopwordy
    val stream = MemoryStream[Doc]
    val gated = DocStreams.qualityGate(stream.toDF())
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    val q = gated.writeStream.format("memory").queryName("spec_qgate")
      .outputMode("complete").start()
    stream.addData(Doc(1, "a", good, good.length), Doc(2, "a", bad, bad.length))
    q.processAllAvailable()
    stream.addData(Doc(3, "b", good, good.length), Doc(4, "a", good, good.length))
    q.processAllAvailable()
    val got = spark.table("spec_qgate").as[(String, Long)].collect().toSet
    q.stop()
    assert(got == Set(("a", 2L), ("b", 1L)))
  }

  test("streaming quality filter equals the batch gate on sf0.001") {
    import spark.implicits._
    val streamed = DocStreams.qualityFilter(spark, TestSpark.sf)
    val batch = DocStreams.qualityGate(
        graft.core.Tables.documents(spark, TestSpark.sf))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        graft.core.Exact.decSum(col("quality")).as("sum_quality"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("append mode + watermark: windows emit once when the watermark " +
    "passes them, late data is dropped, open windows stay unemitted") {
    // The PRODUCTION path (EventStreams doc: append + withWatermark,
    // state bounded by the delay) — complete-mode verification can't
    // exercise emission timing, late-drop, or state eviction; this does.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start").cast("long").as("ws"), col("n"), col("v"))
    val q = agg.writeStream.format("memory").queryName("spec_append")
      .outputMode("append").start()
    stream.addData(Ev(100, 1, 1.0), Ev(3700, 1, 2.0))
    q.processAllAvailable()
    // watermark after batch 1 = 3700 − 600 = 3100 < any window end →
    // nothing may have been emitted yet
    assert(spark.table("spec_append").count() == 0)
    stream.addData(Ev(8000, 1, 4.0))
    q.processAllAvailable()
    // watermark now 7400: one more batch lets it close [0,3600) and
    // [3600,7200); the late event (50 « watermark) must be DROPPED, not
    // re-emitted into the already-finalized first window
    stream.addData(Ev(50, 9, 9.0))
    q.processAllAvailable()
    val got = spark.table("spec_append").as[(Long, Long, Double)]
      .collect().toSet
    q.stop()
    // exactly the two watermark-closed windows, with the same rows the
    // all-at-once batch aggregation yields for them — the late row
    // absent, the open [7200,10800) window (t=8000) not emitted
    assert(got == Set((0L, 1L, 1.0), (3600L, 1L, 2.0)))
  }

  test("session_window + watermark (append): closed sessions emit once " +
    "and are EVICTED from state; late data cannot reopen them") {
    // The production shape of #37 (EventStreams doc: append + watermark
    // bounds session state by the delay) — the VERDICT r6 item-7 spec:
    // emission timing, state-row eviction (asserted via the query
    // progress state-operator metrics), and late-data behavior.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val sess = stream.toDF()
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), EventStreams.Gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("ss"),
        col("session_window.end").cast("long").as("se"),
        col("n"), col("v"))
    val q = sess.writeStream.format("memory").queryName("spec_sess_wm")
      .outputMode("append").start()
    // two users open sessions; u1 has two merged events (gap 30 min)
    stream.addData(Ev(100, 1, 1.0), Ev(700, 1, 2.0), Ev(200, 2, 5.0))
    q.processAllAvailable()
    assert(spark.table("spec_sess_wm").count() == 0,
      "no session may emit before the watermark passes its end")
    // advance the event clock far past every open session's end + delay
    stream.addData(Ev(20000, 3, 7.0))
    q.processAllAvailable()
    val afterClose = spark.table("spec_sess_wm")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // u1: [100, 700+1800); u2: [200, 200+1800) — emitted exactly once
    assert(afterClose == Set(
      (1L, 100L, 2500L, 2L, 3.0), (2L, 200L, 2000L, 1L, 5.0)))
    // state eviction: only u3's open session may remain in state
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == 1L,
      s"closed sessions must leave state, got $stateRows rows")
    // a late event far behind the watermark cannot reopen/re-emit
    stream.addData(Ev(150, 1, 9.0))
    q.processAllAvailable()
    val afterLate = spark.table("spec_sess_wm")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    q.stop()
    assert(afterLate == afterClose, "late data must be dropped")
  }

  test("windowed-agg watermark state stays bounded: emitted windows " +
    "leave state as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("spec_wagg_state")
      .outputMode("append").start()
    // 6 distinct hourly windows arrive in one feed; processAllAvailable
    // runs follow-up micro-batches, so the watermark (max ts − 10 min =
    // 17405) already closes-and-EVICTS the first four windows — only
    // the last two survive in state: the bounded-state contract.
    stream.addData((0 until 6).map(h => Ev(h * 3600L + 5, 1, 1.0)): _*)
    q.processAllAvailable()
    val open = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val emitted1 = spark.table("spec_wagg_state").count()
    assert(emitted1 == 4L, s"watermark 17405 must close 4 windows, got $emitted1")
    assert(open == 2L, s"state must hold the 2 open windows, got $open")
    // advance the watermark past the remaining two ends: they emit AND
    // leave state; only the new event's own window stays resident
    stream.addData(Ev(30000L, 2, 1.0))
    q.processAllAvailable()
    val remaining = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val emitted = spark.table("spec_wagg_state").count()
    q.stop()
    assert(emitted == 6L, s"watermark must close all 6 windows, got $emitted")
    assert(remaining == 1L,
      s"state must hold only the open window, got $remaining")
  }

  test("streaming dedup drops cross-batch duplicates from state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val dd = stream.toDF()
      .dropDuplicates("user_id")
      .groupBy().agg(count(lit(1)).as("n"))
    val q = dd.writeStream.format("memory").queryName("spec_dedup")
      .outputMode("complete").start()
    stream.addData(Ev(1, 1, 0), Ev(2, 1, 0), Ev(3, 2, 0))
    q.processAllAvailable()
    // user 1 reappearing in a LATER batch must still be deduped (state)
    stream.addData(Ev(4, 1, 0), Ev(5, 3, 0))
    q.processAllAvailable()
    val got = spark.table("spec_dedup").as[Long].collect().toSeq
    q.stop()
    assert(got == Seq(3L))
  }
  test("Count-Min state accumulates across batches to the exact matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    import graft.core.PortableHash
    import graft.relational.Sketches
    val cells = stream.toDF()
      .select(posexplode(array((0 until Sketches.CmDepth).map { d =>
        PortableHash.pHash(
          concat_ws("|", lit(s"cm$d"), col("user_id"))) % Sketches.CmWidth
      }: _*)).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
    val q = cells.writeStream.format("memory").queryName("spec_cm")
      .outputMode("complete").start()
    stream.addData(Ev(1, 7, 0), Ev(2, 7, 0), Ev(3, 9, 0))
    q.processAllAvailable()
    stream.addData(Ev(4, 7, 0), Ev(5, 11, 0))
    q.processAllAvailable()
    val got = spark.table("spec_cm").as[(Int, Long, Long)].collect().toSet
    q.stop()
    // expected: per depth, user 7 cell = 3, users 9/11 cells = 1 each
    // (colliding cells sum) — build it driver-side from the same hash
    val expected = (0 until Sketches.CmDepth).flatMap { d =>
      Seq(7L -> 3L, 9L -> 1L, 11L -> 1L)
        .groupBy { case (u, _) =>
          PortableHash.pHashJvm(s"cm$d|$u") % Sketches.CmWidth }
        .map { case (b, us) => (d, b, us.map(_._2).sum) }
    }.toSet
    assert(got == expected)
  }
  test("value-histogram state accumulates across batches to exact cell counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EvT]
    val hist = stream.toDF()
      .select(col("event_type"),
        floor(col("value") * 100.0 + lit(0.5)).cast("long").as("vi"))
      .groupBy("event_type", "vi").agg(count(lit(1)).as("cnt"))
    val q = hist.writeStream.format("memory").queryName("spec_vhist")
      .outputMode("complete").start()
    stream.addData(EvT(1, "a", 1.234), EvT(2, "a", 1.235), EvT(3, "b", 2.0))
    q.processAllAvailable()
    stream.addData(EvT(4, "a", 1.234), EvT(5, "b", -0.006))
    q.processAllAvailable()
    val got = spark.table("spec_vhist")
      .as[(String, Long, Long)].collect().toSet
    q.stop()
    // 1.234/1.235 → cells 123/124 (half-up); -0.006 → floor(-0.1) = -1
    assert(got == Set(("a", 123L, 2L), ("a", 124L, 1L), ("b", 200L, 1L),
      ("b", -1L, 1L)))
  }

  test("streamed histogram state yields the batch percentile report exactly") {
    import spark.implicits._
    // the live-state → dashboard-pick composition: nearest-rank over the
    // streamed complete-mode histogram must reproduce #108 bit-for-bit
    val state = EventStreams.valueHist(spark, TestSpark.sf)
      .as[(String, Long, Long)].collect()
    val picked = state.groupBy(_._1).map { case (t, cells) =>
      val sorted = cells.map(c => (c._2, c._3)).sortBy(_._1)
      val n = sorted.map(_._2).sum
      def pick(p: Int): Double = {
        val k = (n * p + 99) / 100
        var cum = 0L
        sorted.find { case (_, c) => cum += c; cum >= k }.get._1 / 100.0
      }
      (t, n, pick(50), pick(90), pick(99), sorted.last._1 / 100.0)
    }.toSet
    val batch = graft.relational.Events.valueQuantiles(spark, TestSpark.sf)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    assert(picked == batch)
  }

  test("windowed Count-Min: per-window matrices emit once at watermark " +
    "close, late events dropped, open windows withheld") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.core.PortableHash
    import graft.relational.Sketches
    val stream = MemoryStream[Ev]
    val q = EventStreams.windowedCountMin(stream.toDF())
      .writeStream.format("memory").queryName("spec_wcm")
      .outputMode("append").start()
    stream.addData(Ev(100, 7, 0), Ev(200, 7, 0), Ev(300, 9, 0), Ev(3700, 9, 0))
    q.processAllAvailable()
    // watermark 3700−600 = 3100 < 3600: no window may have emitted
    assert(spark.table("spec_wcm").count() == 0)
    stream.addData(Ev(8000, 11, 0))
    q.processAllAvailable()
    // watermark 7400 closes [0,3600) and [3600,7200); this late event
    // belongs to the already-closed first window and must be DROPPED
    stream.addData(Ev(50, 13, 0))
    q.processAllAvailable()
    val got = spark.table("spec_wcm").as[(Long, Int, Long, Long)]
      .collect().toSet
    q.stop()
    def cells(ws: Long, users: Seq[Long]): Set[(Long, Int, Long, Long)] =
      (0 until Sketches.CmDepth).flatMap { d =>
        users.groupBy(u => PortableHash.pHashJvm(s"cm$d|$u") % Sketches.CmWidth)
          .map { case (b, us) => (ws, d, b, us.size.toLong) }
      }.toSet
    // exactly the two closed windows' matrices, computed from on-time
    // rows only — no window-7200 rows (open), no late user-13 cells
    assert(got == cells(0L, Seq(7, 7, 9)) ++ cells(3600L, Seq(9)))
  }

  test("windowed HLL registers: replay within an open window absorbed " +
    "by max, emission exactly once at close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.windowedHllRegisters(stream.toDF())
      .writeStream.format("memory").queryName("spec_whll")
      .outputMode("append").start()
    stream.addData(Ev(100, 7, 0), Ev(200, 9, 0))
    q.processAllAvailable()
    assert(spark.table("spec_whll").count() == 0, "window still open")
    // batch 2 REPLAYS user 7 into the still-open window (at-least-once
    // delivery) and advances the watermark past the window end
    stream.addData(Ev(300, 7, 0), Ev(8000, 11, 0))
    q.processAllAvailable()
    val got = spark.table("spec_whll").as[(Long, Long, Int)].collect().toSet
    q.stop()
    def reg(u: Long): (Long, Int) = {
      val h = graft.core.PortableHash.pHashJvm(s"hll|$u")
      val (b, w) = (h / 4503599627370496L, h % 4503599627370496L)
      (b, if (w == 0) 53 else 53 - java.lang.Long.toBinaryString(w).length)
    }
    // the closed [0,3600) block equals the register state over {7, 9} —
    // the replayed 7 absorbed by max, window 7200 (user 11) withheld
    val expected = Seq(7L, 9L).map(reg)
      .groupBy(_._1).map { case (b, rs) => (0L, b, rs.map(_._2).max) }.toSet
    assert(got == expected)
  }

  test("HLL registers are idempotent max-state: replays cannot corrupt") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val regs = graft.relational.Sketches.hllPerBucket(
      stream.toDF().selectExpr("user_id"))
    val q = regs.writeStream.format("memory").queryName("spec_hll")
      .outputMode("complete").start()
    stream.addData(Ev(1, 7, 0), Ev(2, 9, 0))
    q.processAllAvailable()
    val afterFirst = spark.table("spec_hll").as[(Long, Int)].collect().toSet
    // batch 2 REPLAYS user 7 (at-least-once delivery) and adds user 11
    stream.addData(Ev(3, 7, 0), Ev(4, 11, 0))
    q.processAllAvailable()
    val got = spark.table("spec_hll").as[(Long, Int)].collect().toSet
    q.stop()
    def reg(u: Long): (Long, Int) = {
      val h = graft.core.PortableHash.pHashJvm(s"hll|$u")
      val (b, w) = (h / 4503599627370496L, h % 4503599627370496L)
      (b, if (w == 0) 53 else 53 - java.lang.Long.toBinaryString(w).length)
    }
    val expected = Seq(7L, 9L, 11L).map(reg)
      .groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(got == expected)
    assert(afterFirst.subsetOf(got), "max-merge state only grows")
  }

  test("anomaly moment state accumulates across batches exactly and the " +
    "derived head matches the closed-form 3σ band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EvT]
    val q = EventStreams.anomalyMoments(stream.toDF())
      .writeStream.format("memory").queryName("spec_anom")
      .outputMode("complete").start()
    val b1 = Seq(EvT(1, "click", 1.25), EvT(2, "click", 2.5), EvT(3, "buy", 10.0))
    val b2 = Seq(EvT(4, "click", 4.0), EvT(5, "buy", 0.5))
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    val state = spark.table("spec_anom").as[(String, Long, Long, Long)]
      .collect().map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    // exact cross-batch accumulation — AND the shard-union claim: the
    // whole-stream state equals the per-batch states added component-wise
    def mom(evs: Seq[EvT]) = evs.groupBy(_.event_type).map { case (t, xs) =>
      t -> ((xs.size.toLong,
        xs.map(e => math.floor(e.value * 1e6 + 0.5).toLong).sum,
        xs.map(e => math.floor(e.value * e.value * 1e6 + 0.5).toLong).sum))
    }
    val m1 = mom(b1); val m2s = mom(b2)
    val merged = (m1.keySet ++ m2s.keySet).map { t =>
      val a = m1.getOrElse(t, (0L, 0L, 0L)); val b = m2s.getOrElse(t, (0L, 0L, 0L))
      t -> ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
    }.toMap
    assert(state == merged)
    // head: closed-form mean/std/band over the tiny state
    val head = EventStreams.anomalyHead(spark.table("spec_anom"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    q.stop()
    for ((t, (n, sv, sv2)) <- merged) {
      val mean = sv.toDouble / 1e6 / n
      val m2v = sv2.toDouble / 1e6 / n
      val std = math.sqrt(m2v - mean * mean)
      assert(head(t) == ((t, n, mean, std, mean - 3.0 * std, mean + 3.0 * std)))
    }
  }

  test("Bloom word state ORs across batches, absorbs replays, and equals " +
    "the batch filter on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = DocStreams.bloomWords(stream.toDF())
      .writeStream.format("memory").queryName("spec_sbloom")
      .outputMode("complete").start()
    val d1 = Seq(Doc(1, "s", "alpha beta", 10), Doc(2, "s", "gamma", 5))
    stream.addData(d1: _*)
    q.processAllAvailable()
    val afterFirst = spark.table("spec_sbloom")
      .as[(Long, Long)].collect().toMap
    // batch 2 REPLAYS doc 1 verbatim (at-least-once) and adds one new doc
    val d2 = Seq(Doc(1, "s", "alpha beta", 10), Doc(3, "s", "delta", 5))
    stream.addData(d2: _*)
    q.processAllAvailable()
    val got = spark.table("spec_sbloom").as[(Long, Long)].collect().toMap
    q.stop()
    // OR-state only grows, and a replay alone would not have grown it
    afterFirst.foreach { case (w, b) =>
      assert((got.getOrElse(w, 0L) & b) == b, "bits never clear")
    }
    // equals the batch build over the union (idempotence absorbed the replay)
    val batch = graft.relational.Sketches
      .bloomOf((d1 ++ d2).toDF())
      .as[(Long, Long, Int)].collect()
      .filter(_._2 != 0L).map(r => r._1 -> r._2).toMap
    assert(got == batch, "streamed OR state == batch filter state")
  }

  test("CDC latest-state: cross-batch update, replay idempotence, " +
    "streamed equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Chg]
    val view = EventStreams.latestAgg(stream.toDF())
    val q = view.writeStream.format("memory").queryName("spec_latest")
      .outputMode("complete").start()
    def state(): Map[Long, (Long, Long, String, Double)] =
      spark.table("spec_latest").as[(Long, Long, Long, String, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val b1 = Seq(Chg(10, 1, 100, "add", 1.0), Chg(20, 2, 101, "add", 5.0))
    stream.addData(b1: _*)
    q.processAllAvailable()
    assert(state() == Map(1L -> ((10L, 100L, "add", 1.0)),
      2L -> ((20L, 101L, "add", 5.0))))
    // batch 2: user 1 gets a NEWER change (view must advance), plus an
    // at-least-once REPLAY of user 2's already-absorbed change and a
    // stale OLDER change for user 2 — neither may regress the view
    val b2 = Seq(Chg(30, 1, 102, "upd", 2.0), Chg(20, 2, 101, "add", 5.0),
      Chg(5, 2, 99, "add", 4.0))
    stream.addData(b2: _*)
    q.processAllAvailable()
    val got = state()
    q.stop()
    assert(got == Map(1L -> ((30L, 102L, "upd", 2.0)),
      2L -> ((20L, 101L, "add", 5.0))))
    // streamed state == the batch reduction over everything delivered
    val batch = EventStreams.latestAgg((b1 ++ b2).toDF())
      .as[(Long, Long, Long, String, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == batch, "streamed latest-state == batch latest-per-key")
  }

  test("AMS z state accumulates across batches by addition and equals the batch state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val z = graft.relational.Sketches.amsZ(stream.toDF().selectExpr("user_id"))
    val q = z.writeStream.format("memory").queryName("spec_ams")
      .outputMode("complete").start()
    def state(): Map[Int, Long] =
      spark.table("spec_ams").as[(Int, Long)].collect().toMap
    val b1 = Seq(Ev(1, 7, 0), Ev(2, 9, 0))
    val b2 = Seq(Ev(3, 7, 0), Ev(4, 11, 0), Ev(5, 7, 0))
    stream.addData(b1: _*)
    q.processAllAvailable()
    val s1 = state()
    stream.addData(b2: _*)
    q.processAllAvailable()
    val s2 = state()
    q.stop()
    def sign(u: Long, j: Int): Long =
      1L - 2L * ((graft.core.PortableHash.pHashJvm(s"ams|$u") >> j) & 1L)
    def zOf(us: Seq[Long]): Map[Int, Long] =
      (0 until graft.relational.Sketches.AmsJ)
        .map(j => j -> us.map(sign(_, j)).sum).toMap
    assert(s1 == zOf(b1.map(_.user_id)))
    // batch-2 partials ADDED component-wise — the sketch-merge claim
    assert(s2 == zOf(b1.map(_.user_id) ++ b2.map(_.user_id)))
    assert((0 until graft.relational.Sketches.AmsJ).forall(j =>
      s2(j) == s1(j) + zOf(b2.map(_.user_id))(j)))
  }

  test("KMV bucket-min state min-merges across batches, absorbs replays, " +
      "and the estimator head tracks the distinct count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val mins = graft.relational.Sketches.kmvBucketMins(
      stream.toDF().selectExpr("user_id"))
    val q = mins.writeStream.format("memory").queryName("spec_kmv")
      .outputMode("complete").start()
    def state(): Map[Int, Long] =
      spark.table("spec_kmv").as[(Int, Long)].collect().toMap
    def h(u: Long): Long = graft.core.PortableHash.pHashJvm(s"kmvs|$u")
    def minsOf(us: Seq[Long]): Map[Int, Long] =
      us.map(h).groupBy(v => (v % graft.relational.Sketches.KmvM).toInt)
        .view.mapValues(_.min).toMap
    val b1 = (1L to 40L).map(Ev(0, _, 0))
    val b2 = (41L to 90L).map(Ev(0, _, 0))
    stream.addData(b1: _*)
    q.processAllAvailable()
    assert(state() == minsOf(b1.map(_.user_id)))
    stream.addData(b2: _*)
    q.processAllAvailable()
    val s2 = state()
    // batch-2 partials merged by component-wise MIN — the sketch claim
    assert(s2 == minsOf((b1 ++ b2).map(_.user_id)))
    // idempotence: replaying batch 1 in full cannot move any minimum
    stream.addData(b1: _*)
    q.processAllAvailable()
    assert(state() == s2, "replay must be absorbed (min is idempotent)")
    q.stop()
    // estimator head over the state, regime-split like HLL's: empty
    // buckets → linear counting m·ln(m/empty); saturated → the joint
    // harmonic form m²·S/Σmin − m (per-bucket S/min is heavy-tailed,
    // Σmin concentrates)
    val m = graft.relational.Sketches.KmvM
    val occupied = s2.size
    val S = 1152921504606846976.0
    val est =
      if (occupied < m) m * math.log(m.toDouble / (m - occupied))
      else m.toDouble * m * S / s2.values.map(_.toDouble).sum - m
    val truth = (b1 ++ b2).map(_.user_id).distinct.size
    assert(est > truth * 0.5 && est < truth * 2.0,
      s"bucketed-min estimate $est too far from $truth")
  }

  test("flatMapGroupsWithState ledger: state accumulates across batches, " +
      "update mode emits only touched keys, tiers promote") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Chg]
    val out = UserState.ledgerStream(
      stream.toDF().selectExpr("user_id", "event_type", "ts_s", "value"))
    val q = out.writeStream.format("memory").queryName("spec_ustate")
      .outputMode("update").start()
    def emitted(): Seq[(Long, Long, Long, Double, Long, String)] =
      spark.table("spec_ustate")
        .as[(Long, Long, Long, Double, Long, String)].collect().toSeq
    // batch 1: user 1 views; user 2 buys 600.00 (silver)
    stream.addData(
      Chg(100L, 1L, 1L, "view", 0.0),
      Chg(110L, 2L, 2L, "purchase", 600.0))
    q.processAllAvailable()
    val e1 = emitted()
    assert(e1.toSet == Set(
      (1L, 1L, 0L, 0.0, 100L, "bronze"),
      (2L, 1L, 1L, 600.0, 110L, "silver")))
    // batch 2: only user 2 appears — buys 1500 more (gold: 2100 total);
    // user 1 must NOT re-emit (update mode emits touched keys only)
    stream.addData(Chg(120L, 2L, 3L, "purchase", 1500.0))
    q.processAllAvailable()
    val e2 = emitted().diff(e1)
    assert(e2 == Seq((2L, 2L, 2L, 2100.0, 120L, "gold")),
      s"second batch must emit exactly user 2's promoted ledger, got $e2")
    q.stop()
  }

  test("drift live-histogram state accumulates across batches to the " +
      "exact per-(type, bin) cell counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EvT]
    val bins = graft.relational.DataQuality.PsiBinCents
    val hist = stream.toDF()
      .select(col("event_type"),
        expr(s"CAST(floor(value * 100.0 + 0.5) AS BIGINT) div $bins").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("n_live"))
    val q = hist.writeStream.format("memory").queryName("spec_drift")
      .outputMode("complete").start()
    def state(): Map[(String, Long), Long] =
      spark.table("spec_drift").as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val b1 = Seq(EvT(0, "click", 5.0), EvT(0, "click", 25.0),
      EvT(0, "view", 45.0))
    val b2 = Seq(EvT(0, "click", 5.5), EvT(0, "view", 95.0))
    stream.addData(b1: _*)
    q.processAllAvailable()
    assert(state() == Map(("click", 0L) -> 1L, ("click", 1L) -> 1L,
      ("view", 2L) -> 1L))
    stream.addData(b2: _*)
    q.processAllAvailable()
    // partials ADD: batch-2 cells merge into the live state exactly
    assert(state() == Map(("click", 0L) -> 2L, ("click", 1L) -> 1L,
      ("view", 2L) -> 1L, ("view", 4L) -> 1L))
    q.stop()
  }

  test("streaming funnel: first-occurrence state is replay-stable — a " +
      "LATE-arriving earlier view requalifies the chain, per the " +
      "order-free contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Chg]
    val out = graft.streaming.FunnelState.funnelStream(
      stream.toDF().selectExpr("user_id", "event_type", "ts_s"))
    val q = out.writeStream.format("memory").queryName("spec_funnel")
      .outputMode("update").start()
    def rows(): Seq[(Long, Option[Long], Option[Long], Option[Long], Int)] =
      spark.table("spec_funnel")
        .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
        .collect().toSeq
    // batch 1: user 1 clicks at 200 with NO view yet (stage 0 — the
    // chain can't start); user 2 completes view→click in order
    stream.addData(
      Chg(200L, 1L, 1L, "click", 0.0),
      Chg(100L, 2L, 2L, "view", 0.0),
      Chg(150L, 2L, 3L, "click", 0.0))
    q.processAllAvailable()
    val e1 = rows()
    assert(e1.toSet == Set(
      (1L, None, Some(200L), None, 0),
      (2L, Some(100L), Some(150L), None, 2)))
    // batch 2: user 1's EARLIER view arrives LATE (ts 100 < click 200)
    // — exactly the replay hazard a chain machine mishandles; the
    // first-occurrence state requalifies the already-seen click
    stream.addData(Chg(100L, 1L, 4L, "view", 0.0))
    q.processAllAvailable()
    val e2 = rows().diff(e1)
    assert(e2 == Seq((1L, Some(100L), Some(200L), None, 2)),
      s"late view must lift user 1 to stage 2, got $e2")
    // batch 3: a purchase BEFORE the click (ts 180) must NOT advance
    // the chain (ordering test), while one after (ts 300) must
    stream.addData(Chg(180L, 2L, 5L, "purchase", 9.0))
    q.processAllAvailable()
    val e3 = rows().diff(e1 ++ e2)
    assert(e3 == Seq((2L, Some(100L), Some(150L), Some(180L), 3)),
      s"purchase at 180 > click 150 completes user 2, got $e3")
    // and a pre-click purchase genuinely blocks: user 1 buys at 150
    // (before their click at 200) — stage stays 2
    stream.addData(Chg(150L, 1L, 6L, "purchase", 9.0))
    q.processAllAvailable()
    val e4 = rows().diff(e1 ++ e2 ++ e3)
    assert(e4 == Seq((1L, Some(100L), Some(200L), Some(150L), 2)),
      s"pre-click purchase must not advance user 1, got $e4")
    q.stop()
  }
}
