package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PageRank invariants beyond the oracle's row-compare. */
class GraphAlgosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val pr = GraphAlgos.pagerank(spark, TestSpark.sf).cache()

  test("ranks are positive and sum to 1 (up to quantization loss)") {
    val row = pr.agg(sum("pr").as("total"), min("pr").as("lo")).head()
    assert(row.getDouble(1) > 0.0, "every rank must be strictly positive")
    // each decSum group floors to the 1e-12 grid, so the total drifts by
    // at most #nodes·1e-12 per iteration — far inside 1e-6 at test SFs
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-6)
  }

  test("high in-degree sinks (nations) outrank the uniform baseline") {
    val n = pr.count()
    val uniform = 1.0 / n
    // nation entities absorb rank from every customer and supplier;
    // after 3 iterations each must sit above the uniform start
    val nations = Dict.entities(spark, TestSpark.sf)
      .filter(col("uri").startsWith("n:"))
      .join(pr, "id")
    assert(nations.filter(col("pr") <= uniform).count() == 0)
  }
  test("personalized PageRank: mass conserved, concentrated on the " +
    "seed-reachable subgraph") {
    val ppr = GraphAlgos.ppr(spark, TestSpark.sf).cache()
    val total = ppr.agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
    val ent = Dict.entities(spark, TestSpark.sf)
    // seeds (nations) and their only out-neighbors (regions) hold ALL
    // the mass: nothing else is reachable from the seed set
    val reach = ent.filter(col("uri").startsWith("n:") ||
        col("uri").startsWith("r:"))
      .join(ppr, "id").agg(sum("pr")).head().getDouble(0)
    assert(math.abs(reach - total) < 1e-12)
    val unreachable = ent.filter(col("uri").startsWith("o:"))
      .join(ppr, "id").filter(col("pr") =!= 0.0).count()
    assert(unreachable == 0, "orders are unreachable from nation seeds")
  }
}
