package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart-from-checkpoint (VERDICT r8 item 2 — the streaming #330):
  * the batch side proves checkpoint/resume bit-identity; this proves
  * the streaming production discipline — kill a query mid-stream,
  * restart it from its durable checkpointLocation, and the final
  * output must equal the uninterrupted run with no duplicates across
  * the restart boundary (file-source offsets, watermark, session /
  * dedup / flatMapGroupsWithState state all recovered), while a
  * restart WITHOUT the checkpoint visibly diverges (the negative
  * control that shows recovery is doing the work).
  */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private def dir(prefix: String): String =
    graft.core.TempDirs.create(prefix)

  /** Append one parquet part with the (ts_s, user_id, event_type,
    * value) stream schema to `src` — a new file arrival.
    */
  private def arrive(src: String,
      rows: Seq[(Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("ts_s", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
  }

  private def stream(src: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts_s", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.readStream.schema(schema).parquet(src)
  }

  /** Run a streaming frame to a parquet file sink with AvailableNow and
    * wait for it to drain — one "process everything currently there,
    * then stop" leg of a kill/restart sequence.
    */
  private def runLeg(df: DataFrame, out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def sessions(src: String): DataFrame =
    stream(src)
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), EventStreams.Gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("ss"),
        col("session_window.end").cast("long").as("se"),
        col("n"), col("v"))

  private val batchA = Seq(
    (5L, 0L, "view", 9.0),      // u0: closes within leg 1
    (4800L, 1L, "view", 1.0), (4900L, 1L, "view", 2.0), // u1: open
    (4700L, 2L, "view", 5.0),   // u2: open
    (5000L, 8L, "view", 3.0))   // u8: open; advances wm to 4400
  private val batchB = Seq(
    (5100L, 1L, "view", 4.0),   // merges into u1's RESTORED session
    (30000L, 9L, "view", 7.0))  // closes every leg-1 session

  test("sessionize: kill + restart from checkpoint equals the uninterrupted run, no duplicates") {
    val src = dir("graft_restart_src_")
    val out = dir("graft_restart_out_")
    val ckpt = dir("graft_restart_ck_")

    arrive(src, batchA)
    runLeg(sessions(src), out, ckpt)          // leg 1: emits u0 only
    val afterLeg1 = spark.read.parquet(out).count()
    assert(afterLeg1 == 1, s"leg 1 must close exactly u0, got $afterLeg1")

    arrive(src, batchB)
    runLeg(sessions(src), out, ckpt)          // RESTART from checkpoint
    val restarted = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    // uninterrupted control: same files, one fresh run
    val src2 = dir("graft_restart_src2_")
    val out2 = dir("graft_restart_out2_")
    arrive(src2, batchA); arrive(src2, batchB)
    runLeg(sessions(src2), out2, dir("graft_restart_ck2_"))
    val uninterrupted = spark.read.parquet(out2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    assert(restarted == uninterrupted,
      s"restart diverged:\n$restarted\nvs\n$uninterrupted")
    // the leg-2 event MERGED into u1's restored session state
    assert(restarted.exists(r => r._1 == 1L && r._4 == 3L),
      "u1's session must hold 2 leg-1 events + 1 merged leg-2 event")
    // exactly-once across the restart boundary: one row per session key
    val keys = spark.read.parquet(out)
      .select("user_id", "ss").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.length == keys.distinct.length,
      "duplicate session emissions across the restart boundary")
  }

  test("dedup: recovered dropDuplicates state suppresses a cross-restart replay; a fresh checkpoint does not") {
    def dedupStream(src: String): DataFrame =
      stream(src).dropDuplicates("user_id", "event_type")
        .select("user_id", "event_type", "value")

    val src = dir("graft_rdedup_src_")
    val out = dir("graft_rdedup_out_")
    val ckpt = dir("graft_rdedup_ck_")
    val a = Seq((100L, 1L, "click", 1.0), (200L, 2L, "view", 2.0))
    val b = Seq((300L, 1L, "click", 1.0), // replay of a leg-1 row
      (400L, 3L, "buy", 3.0))

    arrive(src, a)
    runLeg(dedupStream(src), out, ckpt)
    arrive(src, b)
    runLeg(dedupStream(src), out, ckpt)   // RESTART
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "click"), (2L, "view"), (3L, "buy")),
      s"recovered dedup state must suppress the replay, got $got")

    // negative control: the same second leg WITHOUT the checkpoint (a
    // fresh query over only the leg-2 arrivals) passes the replay —
    // the suppression above is earned by the recovered state
    val srcB = dir("graft_rdedup_srcb_")
    val outB = dir("graft_rdedup_outb_")
    arrive(srcB, b)
    runLeg(dedupStream(srcB), outB, dir("graft_rdedup_ckb_"))
    val fresh = spark.read.parquet(outB)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fresh.contains((1L, "click")),
      "without the checkpoint the replay must pass — else the positive test proves nothing")
  }

  test("flatMapGroupsWithState ledger: counters continue across restart; wrong checkpoint resets them") {
    import spark.implicits._
    def ledger(src: String): DataFrame = UserState.ledgerStream(stream(src))

    // update-mode changelog through foreachBatch (the memory sink is
    // not fault-tolerant and refuses checkpoint recovery; foreachBatch
    // is the documented recoverable sink for update-mode state queries)
    def runUpdateLeg(df: DataFrame, out: String, ckpt: String): DataFrame = {
      val q = df.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out)
    }

    val src = dir("graft_rledger_src_")
    val ckpt = dir("graft_rledger_ck_")
    arrive(src, Seq((100L, 1L, "purchase", 600.0)))
    val leg1 = runUpdateLeg(ledger(src), dir("graft_rledger_o1_"), ckpt)
      .as[(Long, Long, Long, Double, Long, String)].collect()
    assert(leg1.toSeq == Seq((1L, 1L, 1L, 600.0, 100L, "silver")))

    arrive(src, Seq((200L, 1L, "purchase", 1500.0)))
    val leg2 = runUpdateLeg(ledger(src), dir("graft_rledger_o2_"), ckpt)
      .as[(Long, Long, Long, Double, Long, String)].collect()
    // cumulative across the restart: 2 purchases, 2100.00, gold tier —
    // only possible if the leg-1 ledger state was recovered
    assert(leg2.toSeq == Seq((1L, 2L, 2L, 2100.0, 200L, "gold")),
      s"ledger state must survive the restart, got ${leg2.toSeq}")

    // negative control: the same leg-2 arrival from a FRESH checkpoint
    // sees no prior state — the counters restart
    val srcB = dir("graft_rledger_srcb_")
    arrive(srcB, Seq((200L, 1L, "purchase", 1500.0)))
    val fresh = runUpdateLeg(ledger(srcB), dir("graft_rledger_o3_"),
      dir("graft_rledger_ckb_"))
      .as[(Long, Long, Long, Double, Long, String)].collect()
    assert(fresh.toSeq == Seq((1L, 1L, 1L, 1500.0, 200L, "silver")))
  }
}
