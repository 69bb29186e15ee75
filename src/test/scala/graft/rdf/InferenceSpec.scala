package graft.rdf

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class InferenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("chain inference: cascades for exactly two rounds, reaches a " +
    "closed fixpoint, and every derived triple is sound") {
    val inf = graft.rdf.Inference.inferChain(spark, TestSpark.sf).cache()
    val base = graft.core.TpchGraph.triples(spark, TestSpark.sf)
    // the rule set cascades: both rounds fire, the third derives nothing
    assert(inf.filter(col("round") === 1).count() > 0)
    assert(inf.filter(col("round") === 2).count() > 0)
    assert(inf.filter(col("round") === 3).isEmpty)
    // nothing re-derived: inferred ∩ base = ∅, and no duplicates
    assert(inf.join(base, Seq("s", "p", "o"), "left_semi").isEmpty)
    assert(inf.select("s", "p", "o").distinct().count() == inf.count())
    // soundness + closure, checked independently on the closed graph:
    // applying every rule to the closure yields EXACTLY base ∪ inferred
    // conclusions already present (closed), and every inferred triple
    // appears among the rule applications (sound)
    val closure = base.select("s", "p", "o")
      .unionByName(inf.select("s", "p", "o")).cache()
    val applied = graft.rdf.Inference.chains.map { case (a, b, c) =>
      closure.filter(col("p") === a).select(col("s"), col("o").as("mid"))
        .join(closure.filter(col("p") === b)
          .select(col("s").as("mid"), col("o")), "mid")
        .select(col("s"), lit(c).as("p"), col("o"))
    }.reduce(_ unionByName _).distinct().cache()
    assert(applied.join(closure, Seq("s", "p", "o"), "left_anti").isEmpty,
      "closure is not closed under the rules")
    assert(inf.select("s", "p", "o")
      .join(applied, Seq("s", "p", "o"), "left_anti").isEmpty,
      "an inferred triple has no derivation")
    closure.unpersist(); applied.unpersist(); inf.unpersist()
  }
}
