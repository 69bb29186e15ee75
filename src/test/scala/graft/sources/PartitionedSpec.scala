package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned write → pruned read: planning-time pruning, exact rows") {
    val df = ParquetPartitioned.prunedRoundtrip(spark, TestSpark.sf).cache()
    val plan = df.queryExecution.executedPlan.toString
    // the lang filter must be a PARTITION filter (directory pruning at
    // planning time), not a post-scan data filter
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).takeWhile(_ != ']').contains("lang"),
      s"lang filter not pushed to partition pruning:\n$plan")
    val want = graft.core.Tables.documents(spark, TestSpark.sf)
      .filter(col("lang") === ParquetPartitioned.PruneLang)
    assert(df.count() == want.count() && want.count() > 0)
    // the partition column survives the directory-name round-trip
    assert(df.filter(col("lang") =!= ParquetPartitioned.PruneLang).isEmpty)
    df.unpersist()
  }
}
