package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pointer-doubling connected components (VERDICT r6 item 2): the
  * adversarial chain graph that made the one-hop loop fail loudly must
  * now converge in O(log diameter) rounds with the same labels.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("4096-link chain converges in <= 20 rounds to the component min") {
    // Chain over ids permuted by a fixed multiplicative shuffle, so
    // labels can't ride id order (the adversarial case: consecutive
    // chain positions land on far-apart ids).
    val n = 4096L
    def perm(i: Long): Long = (i * 2731) % 4099 // 4099 prime > n
    val edges = (0L until (n - 1)).map(i => (perm(i), perm(i + 1)))
      .toDF("d1", "d2")
    val (labels, rounds) =
      Components.runCounting(edges, "spec-chain", maxRounds = 60)
    assert(rounds <= 20, s"chain took $rounds rounds")
    val minId = (0L until n).map(perm).min
    val got = labels.select(col("node"), col("lab")).as[(Long, Long)]
      .collect().toMap
    assert(got.size == n)
    assert(got.values.forall(_ == minId))
  }

  test("disjoint cliques + a chain label independently and exactly") {
    // two 4-cliques (ids 100.. and 200..), one 50-link chain at 1000..,
    // one isolated edge
    val cliq = for {
      base <- Seq(100L, 200L); a <- 0 to 3; b <- 0 to 3 if a < b
    } yield (base + a, base + b)
    val chain = (0L until 49L).map(i => (1000L + i, 1000L + i + 1))
    val edges = (cliq ++ chain :+ ((5000L, 5001L))).toDF("d1", "d2")
    val labels = Components.run(edges, "spec-mixed")
      .as[(Long, Long)].collect().toMap
    (0 to 3).foreach { a =>
      assert(labels(100L + a) == 100L)
      assert(labels(200L + a) == 200L)
    }
    (0L to 49L).foreach(i => assert(labels(1000L + i) == 1000L))
    assert(labels(5000L) == 5000L && labels(5001L) == 5000L)
  }

  test("unconverged graph fails loudly, never returns wrong labels") {
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      Components.run(chain, "spec-cap", maxRounds = 2)
    }
    assert(e.getMessage.contains("spec-cap"))
  }
}
