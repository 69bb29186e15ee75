package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #342 multi-index Hamming retrieval: the pigeonhole machinery and the
  * exactness certificate.
  *
  *  - coverage: band-equal candidates ⊇ every pair at hamming ≤ NBands−1
  *    (the pigeonhole guarantee the certificate relies on);
  *  - uniqueness: the first-match rule emits exactly one row per
  *    candidate pair (no DISTINCT shuffle, no duplicate heap entries);
  *  - clustered regime: a planted corpus where every query has ≥ K
  *    in-radius neighbors certifies EVERY query in stage 1 — zero
  *    fallback, the corpus-proportional serving path;
  *  - random regime: sign-random signatures blow past the certifiable
  *    radius, every query falls back, and the result STILL equals the
  *    exhaustive top-k — the fallback is complete, not approximate.
  */
class BinarizeMihSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = Ann.K

  /** Packed frame straight from (vec_id, sig_lo, sig_hi) rows. */
  private def packedDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("vec_id", "sig_lo", "sig_hi")

  private def qOf(e: DataFrame): DataFrame =
    e.select(col("vec_id").as("q_id"), col("sig_lo").as("q_lo"),
      col("sig_hi").as("q_hi"))

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  // deterministic pseudo-random 32-bit words (no Random: repeatability)
  private def w32(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= x >>> 29; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 32
    x & 0xFFFFFFFFL
  }

  test("pigeonhole coverage: candidates contain every pair at hamming <= NBands-1") {
    val base = (0L until 40L).map(i => (i, w32(i), w32(i + 1000)))
    // plant near neighbors: flip exactly NBands-1 = 7 bits of vector 0
    val nb = (0 until 3).map { j =>
      val flips = (0 until 7).map(k => 1L << ((j * 7 + k) % 32))
      (100L + j, flips.fold(base.head._2)(_ ^ _), base.head._3)
    }
    val e = packedDf(base ++ nb)
    val q = qOf(packedDf(Seq(base.head)))
    val cand = Binarize.bandCandidates(e, q)
      .select("q_id", "vec_id", "hamming")
      .as[(Long, Long, Long)].collect()
    val all = (base.tail ++ nb).map(r =>
      (r._1, hamming((base.head._2, base.head._3), (r._2, r._3))))
    val within = all.filter(_._2 <= Binarize.NBands - 1).map(_._1).toSet
    assert(within.size >= 3, "planted neighbors must be in radius")
    val candIds = cand.map(_._2).toSet
    assert(within.subsetOf(candIds),
      s"pigeonhole violated: ${within.diff(candIds)} missing from candidates")
    // and the reported hamming distances are the true distances
    val byId = all.toMap
    cand.foreach { case (_, v, h) => assert(h == byId(v)) }
  }

  test("first-match rule: exactly one candidate row per (query, vector) pair") {
    // identical signatures match in all 8 bands — the maximal-duplication case
    val e = packedDf(Seq((1L, 0xABCDL, 0x1234L), (2L, 0xABCDL, 0x1234L),
      (3L, 0xABCDL, 0x5234L)))
    val q = qOf(e.filter(col("vec_id") === 1L))
    val cand = Binarize.bandCandidates(e, q)
      .groupBy("q_id", "vec_id").count().as[(Long, Long, Long)].collect()
    assert(cand.nonEmpty)
    cand.foreach { case (_, _, n) => assert(n == 1L, "duplicate candidate row") }
  }

  test("clustered corpus: every query certified in stage 1, zero fallback") {
    // 5 clusters; members differ from the cluster center by <= 2 bits, so
    // within a cluster all pairwise distances <= 4 <= NBands-1 and each
    // query (one per cluster) has >= K in-radius neighbors.
    val rows = for {
      c <- 0 until 5
      m <- 0 to K // center + K members
    } yield {
      val center = (w32(c * 77L), w32(c * 77L + 7))
      val flip = if (m == 0) 0L else (1L << (m % 32)) | (1L << ((m + 11) % 32))
      (c * 1000L + m, center._1 ^ (if (m % 2 == 0) flip else 0L),
        center._2 ^ (if (m % 2 == 1) flip else 0L))
    }
    val e = packedDf(rows)
    val q = qOf(e.filter(col("vec_id") % 1000L === 0L))
    val (certified, fallbackQ) = Binarize.mihSplit(e, q)
    assert(certified.count() == 5L, "all 5 cluster queries certified")
    assert(fallbackQ.count() == 0L, "no fallback on a clustered corpus")
    // and the certified top-k equals the exhaustive top-k
    val brute = bruteTopK(rows, q)
    val got = certified
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id"), col("s.score").cast("int"),
        (col("pos") + 1).cast("int"))
      .as[(Long, Long, Int, Int)].collect().sortBy(r => (r._1, r._4))
    assert(got.toSeq == brute)
  }

  test("random corpus: all queries fall back and the answer is still exact") {
    val rows = (0L until 60L).map(i =>
      (i, w32(i * 3 + 5), w32(i * 31 + 17)))
    val e = packedDf(rows)
    val q = qOf(e.filter(col("vec_id") % 20L === 0L))
    val (certified, fallbackQ) = Binarize.mihSplit(e, q)
    assert(fallbackQ.count() == 3L,
      "sign-random signatures must blow the certificate radius")
    assert(certified.count() == 0L)
    // end-to-end: fallback leg = exact
    val full = certifiedUnion(e, q).sortBy(r => (r._1, r._4))
    assert(full == bruteTopK(rows, q))
  }

  /** Exhaustive reference: top-K by (hamming asc, vec_id asc) per query. */
  private def bruteTopK(rows: Seq[(Long, Long, Long)], q: DataFrame)
      : Seq[(Long, Long, Int, Int)] = {
    val qs = q.select("q_id", "q_lo", "q_hi").as[(Long, Long, Long)].collect()
    qs.toSeq.sortBy(_._1).flatMap { case (qid, qlo, qhi) =>
      rows.filter(_._1 != qid)
        .map(r => (r._1, hamming((qlo, qhi), (r._2, r._3))))
        .sortBy { case (id, h) => (h, id) }.take(K).zipWithIndex
        .map { case ((id, h), i) => (qid, id, h, i + 1) }
    }
  }

  private def certifiedUnion(e: DataFrame, q: DataFrame)
      : Seq[(Long, Long, Int, Int)] = {
    val (certified, fallbackQ) = Binarize.mihSplit(e, q)
    val exFallback = e.crossJoin(broadcast(fallbackQ))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        expr("bit_count(sig_lo ^ q_lo) + bit_count(sig_hi ^ q_hi)"))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMin(
        col("hamming").cast("double"), col("vec_id"), K).as("tk"))
    certified.unionByName(exFallback)
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id"), col("s.score").cast("int"),
        (col("pos") + 1).cast("int"))
      .as[(Long, Long, Int, Int)].collect().toSeq
  }

  test("registered query matches #159 row-for-row on the test SF") {
    val a = Binarize.mihTopK(spark, TestSpark.sf)
      .as[(Long, Long, Int, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val b = Binarize.hammingTopK(spark, TestSpark.sf)
      .as[(Long, Long, Int, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(a.nonEmpty && a == b)
  }
}
