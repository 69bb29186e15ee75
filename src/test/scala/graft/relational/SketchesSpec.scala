package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sketch guarantees the oracle's bit-compare doesn't state: estimation
  * accuracy (HLL) and the one-sided error bound (Count-Min).
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL: raw estimate lands within the m=256 error regime") {
    val r = Sketches.hll(spark, TestSpark.sf)
      .select("zsum", "v_empty", "hll_est", "n_users").head()
    val (zsum, vEmpty, est, truth) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    assert(zsum > 0 && vEmpty < Sketches.HllM)
    // standard error 1.04/sqrt(256) ≈ 6.5%; allow 3σ
    assert(math.abs(est - truth) / truth < 0.20,
      s"estimate $est vs true $truth")
  }

  test("Count-Min: estimates only ever overestimate the true count") {
    val cells = Sketches.countMin(spark, TestSpark.sf)
      .as[(Int, Long, Long)].collect()
      .map { case (d, b, c) => (d, b) -> c }.toMap
    val top = graft.core.Tables.events(spark, TestSpark.sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(5)
      .as[(Long, Long)].collect()
    top.foreach { case (user, truth) =>
      val est = (0 until Sketches.CmDepth).map { d =>
        val b = graft.core.PortableHash.pHashJvm(s"cm$d|$user") % Sketches.CmWidth
        cells((d, b))
      }.min
      assert(est >= truth, s"CM must never underestimate (user $user)")
    }
  }

  test("basket pairs: 20 ordered pairs, p1 < p2, counts consistent") {
    val rows = Relational.basketPairs(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (p1, p2, n) => assert(p1 < p2 && n >= 1) }
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq,
      "descending by co-occurrence count")
  }
  test("bloom: no false negatives, measured FP rate near theory, and " +
    "shard filters OR to the monolithic filter") {
    import graft.core.Tables
    val state = Sketches.bloom(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def contains(e: String): Boolean =
      Sketches.bloomBits(e).forall { case (w, m) => (state(w) & m) == m }
    // every inserted element must hit (no false negatives, by law)
    val present = Tables.documents(spark, TestSpark.sf)
      .select(md5(lower(trim(col("text")))).as("e"))
      .distinct().as[String].collect()
    assert(present.forall(contains), "bloom false negative")
    // absent probes: FP rate should sit near (1 − e^{−kn/m})^k
    val n = present.length.toDouble
    val theory = math.pow(1.0 -
      math.exp(-Sketches.BloomK * n / Sketches.BloomM), Sketches.BloomK)
    val absentHits = (0 until 1000).count(i => contains(s"absent|$i"))
    assert(absentHits / 1000.0 < math.max(3 * theory, 0.05),
      s"FP rate ${absentHits / 1000.0} vs theory $theory")
    // distributed claim: shard filters OR into the monolithic state
    val docs = Tables.documents(spark, TestSpark.sf)
    val pa = graft.core.PortableHash.pHash(col("doc_id").cast("string")) % 2
    val a = Sketches.bloomOf(docs.filter(pa === 0)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sketches.bloomOf(docs.filter(pa === 1)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state.forall { case (w, bits) => (a(w) | b(w)) == bits },
      "shard OR-merge differs from the monolithic filter")
  }

  test("sketches merge: two shards' states union to the monolithic state") {
    import graft.core.Tables
    val e = Tables.events(spark, TestSpark.sf)
    val shard = graft.core.PortableHash.pHash(
      concat_ws("|", lit("ms"), col("event_id"))) % 2
    val a = e.filter(shard === 0)
    val b = e.filter(shard === 1)
    // HLL: per-bucket MAX of the shard registers == monolithic registers
    val mergedHll = Sketches.hllPerBucket(a)
      .unionByName(Sketches.hllPerBucket(b))
      .groupBy("bucket").agg(max("r").as("r"))
      .as[(Long, Int)].collect().toSet
    val monoHll = Sketches.hllPerBucket(e).as[(Long, Int)].collect().toSet
    assert(mergedHll == monoHll)
    // CM: per-cell SUM of the shard matrices == monolithic matrix
    def cm(df: org.apache.spark.sql.DataFrame) = df
      .select(posexplode(array((0 until Sketches.CmDepth).map { d =>
        graft.core.PortableHash.pHash(
          concat_ws("|", lit(s"cm$d"), col("user_id"))) % Sketches.CmWidth
      }: _*)).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
    val mergedCm = cm(a).unionByName(cm(b))
      .groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val monoCm = Sketches.countMin(spark, TestSpark.sf)
      .as[(Int, Long, Long)].collect().toSet
    assert(mergedCm == monoCm)
  }

  test("AMS F2: z vector equals a driver recompute, shards merge by addition, " +
    "and the median-of-means estimate lands in the sketch's error regime") {
    import org.apache.spark.sql.functions._
    val users = graft.core.Tables.events(spark, TestSpark.sf)
      .select("user_id").as[Long].collect()
    def sign(u: Long, j: Int): Long =
      1L - 2L * ((graft.core.PortableHash.pHashJvm(s"ams|$u") >> j) & 1L)
    val zExp = (0 until Sketches.AmsJ).map { j =>
      j.toLong -> users.iterator.map(sign(_, j)).sum }.toMap
    val counts = users.groupBy(identity).view.mapValues(_.length.toLong)
    val f2True = counts.values.map(c => c * c).sum
    // z identity: E-free, exact — z_j = sum over users of sign*count
    (0 until Sketches.AmsJ).foreach { j =>
      assert(zExp(j.toInt) == counts.iterator.map { case (u, c) => sign(u, j) * c }.sum)
    }
    val out = Sketches.amsF2(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (nEv, nU, f2, medG, est, relErr) = out.head
    assert(nEv == users.length && nU == counts.size && f2 == f2True)
    // med_gsum recompute: group sums of z^2 in 6 groups of 8, 3rd smallest
    val gsums = zExp.toSeq.groupBy(_._1 / Sketches.AmsPerGroup)
      .map { case (g, zs) => g -> zs.map { case (_, z) => z * z }.sum }
    val medExp = gsums.toSeq.sortBy { case (g, v) => (v, g) }
      .apply((Sketches.AmsGroups + 1) / 2 - 1)._2
    assert(medG == medExp)
    assert(est == medG.toDouble / Sketches.AmsPerGroup)
    assert(relErr == math.abs(est - f2True.toDouble) / f2True.toDouble)
    // accuracy: a group mean of 8 estimators has std ~ F2/2; the median
    // of 6 such means is within a factor ~3 of truth with overwhelming
    // probability — generous envelope, tight enough to catch sign bugs
    assert(relErr < 2.0, s"rel_err $relErr")
    // shard-merge: z states of two halves ADD to the monolithic state
    val (h1, h2) = users.splitAt(users.length / 2)
    (0 until Sketches.AmsJ).foreach { j =>
      assert(h1.iterator.map(sign(_, j)).sum + h2.iterator.map(sign(_, j)).sum
        == zExp(j.toInt))
    }
  }
}
