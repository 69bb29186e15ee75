package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join: zero shuffle exchanges below the join, values exact") {
    val df = Bucketed.bucketedJoin(spark, TestSpark.sf)
    // materialize first: under AQE the final plan only exists after run
    val rows = df.collect()
    // QueryStageExec wraps its subplan outside `children` — descend
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case other => other.children.flatMap(nodes)
    })
    val plan = df.queryExecution.executedPlan
    val joins = nodes(plan).filter(_.nodeName.contains("SortMergeJoin"))
    assert(joins.nonEmpty, s"merge join not planned:\n$plan")
    // co-location: NO shuffle anywhere under the join — both sides read
    // their buckets directly (the aggregate above may still exchange)
    val shufflesBelowJoin = joins.flatMap(nodes).collect {
      case s: ShuffleExchangeLike => s
    }
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join still shuffles:\n$plan")
    // values: cross-check one priority against a straight computation
    val want = graft.core.Tables.orders(spark, TestSpark.sf)
      .join(graft.core.Tables.lineitem(spark, TestSpark.sf),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .count()
    assert(rows.map(_.getLong(1)).sum == want)
  }
}
