package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The z-layout must measurably cluster BOTH dimensions: mean per-bucket
  * bounding-box area well under the hash layout's (which clusters
  * neither), on the oracle-able equal-width buckets AND on the real
  * write path (repartitionByRange over the zkey).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def meanArea(perBucket: DataFrame): Double = {
    val rows = perBucket.collect()
    rows.map(r => (r.getLong(1) - r.getLong(0) + 1).toDouble *
      (r.getLong(3) - r.getLong(2) + 1)).sum / rows.length
  }

  test("z buckets partition the table and beat the hash layout's " +
    "bounding boxes") {
    val rep = ZOrder.layoutReport(spark, TestSpark.sf).cache()
    val z = ZOrder.zkeyed(spark, TestSpark.sf).cache()
    val n = z.count()
    assert(rep.agg(sum("n_events")).head.getLong(0) == n)
    val zArea = meanArea(rep.select("u_min", "u_max", "d_min", "d_max"))
    val hashArea = meanArea(
      z.withColumn("bucket", pmod(col("event_id"), lit(ZOrder.Buckets)))
        .groupBy("bucket")
        .agg(min("user_id").as("u_min"), max("user_id").as("u_max"),
          min("day").as("d_min"), max("day").as("d_max"))
        .select("u_min", "u_max", "d_min", "d_max"))
    assert(zArea * 2 < hashArea,
      s"z layout not clustering: z=$zArea hash=$hashArea")
    // the real write path: range-partition by zkey, measure the physical
    // partitions' boxes (sampled bounds — spec-only, not oracle-able)
    val phys = z.repartitionByRange(ZOrder.Buckets, col("zkey"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("day").as("d_min"), max("day").as("d_max"))
      .select("u_min", "u_max", "d_min", "d_max")
    val physArea = meanArea(phys)
    assert(physArea * 2 < hashArea,
      s"range-partitioned write path not clustering: $physArea vs $hashArea")
    rep.unpersist(); z.unpersist()
  }

  test("skipping report: the layout physics hold — single-dim sort " +
      "perfect on its dim and useless off it, hash prunes nothing, " +
      "z-order prunes both dims") {
    import spark.implicits._
    val r = ZOrder.skippingReport(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4, x._5)).toMap
    assert(r.size == 6, s"3 layouts x 2 dims expected, got ${r.keySet}")
    val total = graft.core.Tables.events(spark, TestSpark.sf).count()
    val preds = ZOrder.Preds.toLong
    // hash layout: every bucket survives every predicate
    assert(r(("hash", "user"))._2 == preds * ZOrder.Buckets)
    assert(r(("hash", "day"))._2 == preds * ZOrder.Buckets)
    assert(r(("hash", "user"))._3 == preds * total)
    // user-sort on its own dimension: near-perfect pruning — strictly
    // fewer buckets than z-order, which in turn strictly beats hash
    val uSortUser = r(("usersort", "user"))._2
    val zUser = r(("zorder", "user"))._2
    assert(uSortUser <= zUser && zUser < r(("hash", "user"))._2,
      s"user-dim pruning order violated: $uSortUser, $zUser")
    // off-dimension: user-sort prunes (almost) nothing on day; z-order
    // still prunes meaningfully — strictly fewer rows than both
    val zDay = r(("zorder", "day"))._3
    assert(zDay < r(("usersort", "day"))._3 &&
      zDay < r(("hash", "day"))._3,
      "z-order must beat both layouts on the off dimension")
  }
}
