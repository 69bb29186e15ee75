package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TopK

/** The K-bounded heap aggregate must reproduce the window-sort ranking
  * exactly: same kept set, same order, under ties, under k > n, and
  * across partition merges (the map-side partial phase is the
  * distributed heap — forcing many input partitions exercises merge()).
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranked(rows: Seq[(Long, Double, Long)], k: Int,
      asc: Boolean): Map[Long, Seq[(Double, Long)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        val cc = if (asc) c else -c
        if (cc != 0) cc < 0 else a._2 < b._2
      }
      g -> sorted.take(k)
    }

  private def viaAgg(rows: Seq[(Long, Double, Long)], k: Int,
      asc: Boolean, parts: Int): Map[Long, Seq[(Double, Long)]] = {
    val df = rows.toDF("g", "score", "id").repartition(parts)
    val tk = if (asc) TopK.topkMin(col("score"), col("id"), k)
             else TopK.topkMax(col("score"), col("id"), k)
    df.groupBy("g").agg(tk.as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "s")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getStruct(2).getDouble(0), r.getStruct(2).getLong(1)))
      .groupBy(_._1)
      .map { case (g, rs) =>
        g -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }
  }

  test("heap ranking equals the sort ranking, asc and desc, across many partitions") {
    // deterministic pseudo-random rows with duplicate scores (ties)
    val rows = (0 until 2000).map { i =>
      val g = (i % 7).toLong
      val score = ((i * 2654435761L) % 97).toDouble / 10.0
      (g, score, i.toLong)
    }
    for (asc <- Seq(true, false); parts <- Seq(1, 13)) {
      assert(viaAgg(rows, 10, asc, parts) == ranked(rows, 10, asc),
        s"asc=$asc parts=$parts diverged from the sort ranking")
    }
  }

  test("k larger than the group returns the whole group, ranked") {
    val rows = Seq((1L, 3.0, 30L), (1L, 1.0, 10L), (1L, 2.0, 20L))
    assert(viaAgg(rows, 10, asc = true, parts = 3) ==
      Map(1L -> Seq((1.0, 10L), (2.0, 20L), (3.0, 30L))))
  }

  test("maximal ties: all-equal scores rank purely by id") {
    val rows = (0 until 500).map(i => (1L, 5.0, (499 - i).toLong))
    val got = viaAgg(rows, 10, asc = false, parts = 11)
    assert(got == Map(1L -> (0L until 10L).map(i => (5.0, i))))
  }
}
