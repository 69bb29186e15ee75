package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #273 streaming top-k (incremental state semantics over MemoryStream:
  * rank movement across micro-batches) and #274 chunk windows (coverage
  * + overlap conservation + hash ≡ recompute).
  */
class TopkChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming top-k: the count state accumulates across batches and " +
      "a later batch overturns an earlier leader; ties break by type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EvT]
    val state = stream.toDF()
      .groupBy((col("ts_s") - (col("ts_s") % 3600)).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = state.writeStream.format("memory").queryName("spec_topk")
      .outputMode("complete").start()
    def top(k: Int): Seq[(Long, String, Long, Int)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("win_start").orderBy(col("n").desc, col("event_type").asc)
      spark.table("spec_topk")
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .as[(Long, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    }
    stream.addData(EvT(10, "view", 0), EvT(20, "view", 0), EvT(30, "click", 0))
    q.processAllAvailable()
    assert(top(1) == Seq((0L, "view", 2L, 1)), "batch-1 leader")
    // three more clicks in the SAME window arrive later: leader flips
    stream.addData(EvT(40, "click", 0), EvT(50, "click", 0), EvT(60, "click", 0))
    q.processAllAvailable()
    assert(top(2) == Seq((0L, "click", 4L, 1), (0L, "view", 2L, 2)),
      "cross-batch accumulation did not overturn the leader")
    // tie in a fresh window breaks by type ascending
    stream.addData(EvT(3610, "error", 0), EvT(3620, "signup", 0))
    q.processAllAvailable()
    val w2 = top(2).filter(_._1 == 3600L)
    q.stop()
    assert(w2 == Seq((3600L, "error", 1L, 1), (3600L, "signup", 1L, 2)),
      "tie order not (count desc, type asc)")
  }

  test("chunk windows: every word covered, the overlap conservation law " +
      "holds per doc, and each chunk hash equals the recompute") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val got = graft.text.TextAnalysis.chunkWindows(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    val (w, s) = (graft.text.TextAnalysis.ChunkW, graft.text.TextAnalysis.ChunkS)
    def md5(x: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    got.groupBy(_._1).foreach { case (id, rows) =>
      val ws = docs(id)
      val n = ws.size.toLong
      val expChunks =
        if (n <= w) 1L else (n - w + s - 1) / s + 1
      assert(rows.length.toLong == expChunks, s"chunk count of $id")
      rows.foreach { case (_, ci, nw, nc, start, cw, h) =>
        assert(nw == n && nc == expChunks, s"doc meta of $id")
        assert(start == ci * s, s"start of $id/$ci")
        val slice = ws.slice((ci * s).toInt, (ci * s).toInt + w)
        assert(cw == slice.size.toLong, s"width of $id/$ci")
        assert(h == md5(slice.mkString(" ")), s"hash of $id/$ci")
      }
      // conservation: Σ chunk_words = n + (n_chunks − 1)·(W − S)
      assert(rows.map(_._6).sum == n + (expChunks - 1) * (w - s),
        s"overlap law of $id")
      // coverage: the last chunk reaches the final word
      val last = rows.maxBy(_._2)
      assert(last._5 + last._6 == n, s"tail coverage of $id")
    }
  }
}
