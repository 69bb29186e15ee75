package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic guarantees for the fact→SCD2-version attribution (#153) that
  * the oracle doesn't state: the attach is consistent with the #147
  * SCD2 build it consumes — every attach group IS a version, every fact
  * lands inside its version's validity interval, and nothing is lost.
  */
class Scd2AttachSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val attach = Events.scd2Attach(spark, TestSpark.sf)
    .as[(Long, Long, Double, Long, Long)].collect()
  private lazy val versions = Events.scd2(spark, TestSpark.sf)
    .select(col("user_id"), col("eff_from_s"), col("value"),
      coalesce(col("eff_to_s"), lit(Long.MaxValue)).as("eff_to_s"))
    .as[(Long, Long, Double, Long)].collect()

  test("every event is attributed to exactly one version") {
    val nEvents = Tables.events(spark, TestSpark.sf).count()
    assert(attach.map(_._4).sum == nEvents, "Σ n_events = |events|")
    assert(attach.forall(_._4 >= 1))
  }

  test("attach groups are exactly the SCD2 versions, values agree") {
    val vKey = versions.map { case (u, f, v, _) => (u, f) -> v }.toMap
    assert(attach.length == versions.length,
      "one attach row per version (a version exists iff it covers >= 1 fact)")
    attach.foreach { case (u, f, v, _, _) =>
      assert(vKey.get((u, f)).contains(v),
        s"attach group ($u, $f, $v) must be a version with the same value")
    }
  }

  test("every attributed fact lies inside its version's interval") {
    val vEnd = versions.map { case (u, f, _, t) => (u, f) -> t }.toMap
    attach.foreach { case (u, f, _, _, lastTs) =>
      assert(lastTs >= f && lastTs < vEnd((u, f)),
        s"last fact of ($u, $f) at $lastTs outside [$f, ${vEnd((u, f))})")
    }
  }
}
