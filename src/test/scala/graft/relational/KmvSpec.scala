package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{PortableHash, Tables}

/** KMV/theta sketch guarantees beyond the oracle bit-compare: the whole
  * report equals a driver-side recomputation from the raw events (the
  * sketch IS deterministic), the exact-below-k regime returns exact
  * counts, and in the estimation regime (sf0.01: 150 users > k=64) the
  * estimate lands within the k=64 error envelope.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def userSets(sf: String): (Set[Long], Set[Long]) = {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select("event_type", "user_id").distinct()
      .as[(String, Long)].collect()
    (rows.collect { case ("view", u) => u }.toSet,
      rows.collect { case ("purchase", u) => u }.toSet)
  }

  /** Driver mirror of the sketch build: (exact long kth values, double
    * estimator values). kth hashes are 60-bit — they must NEVER round
    * through a Double.
    */
  private def driverReport(a: Set[Long], b: Set[Long])
      : (Map[String, Long], Map[String, Double]) = {
    val k = Sketches.KmvK
    def h(u: Long) = PortableHash.pHashJvm(s"kmv|$u")
    def mink(s: Set[Long]) = s.map(h).toSeq.sorted.take(k)
    val (ska, skb) = (mink(a), mink(b))
    val sku = (ska ++ skb).distinct.sorted.take(k)
    val hits = sku.count(x => ska.contains(x) && skb.contains(x))
    def est(sk: Seq[Long]) =
      if (sk.length < k) sk.length.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 / sk.last.toDouble
    (Map("kth_a" -> ska.last, "kth_b" -> skb.last, "kth_u" -> sku.last,
      "hits" -> hits.toLong),
      Map("est_a" -> est(ska), "est_b" -> est(skb), "est_u" -> est(sku),
        "j_est" -> hits.toDouble / sku.length.toDouble,
        "inter_est" -> (hits.toDouble / sku.length.toDouble) * est(sku)))
  }

  test("sf0.001 (exact regime): report equals driver recompute; estimates exact") {
    val r = Sketches.kmv(spark, TestSpark.sf).head()
    val (a, b) = userSets(TestSpark.sf)
    val (expL, expD) = driverReport(a, b)
    expL.foreach { case (name, v) =>
      assert(r.getLong(r.fieldIndex(name)) == v, s"$name vs driver $v")
    }
    expD.foreach { case (name, v) =>
      assert(r.getDouble(r.fieldIndex(name)) == v, s"$name vs driver $v")
    }
    assert(r.getDouble(r.fieldIndex("est_a")) == a.size.toDouble,
      "below k the sketch has seen the whole set — estimate is exact")
    assert(r.getDouble(r.fieldIndex("inter_est")) == (a & b).size.toDouble)
  }

  test("sf0.01 (estimation regime): estimates inside the k=64 error envelope") {
    val r = Sketches.kmv(spark, "/root/testdata/sf0.01").head()
    val (a, b) = userSets("/root/testdata/sf0.01")
    assert(a.size > Sketches.KmvK, "sf0.01 must exercise the estimation path")
    // std error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3σ
    def rel(est: Double, truth: Int) = math.abs(est - truth) / truth
    assert(rel(r.getDouble(r.fieldIndex("est_a")), a.size) < 0.40)
    assert(rel(r.getDouble(r.fieldIndex("est_u")), (a | b).size) < 0.40)
    // mergeability: the union sketch built from the two k-sets equals
    // the min-k of the TRUE union (spot-checked via the driver mirror)
    val (expL, _) = driverReport(a, b)
    assert(r.getLong(r.fieldIndex("kth_u")) == expL("kth_u"))
  }
}
