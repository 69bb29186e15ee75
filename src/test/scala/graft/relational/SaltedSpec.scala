package graft.relational

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The salted join must (a) actually join on (key, salt) — the spread is
  * structural, visible in the plan's join keys — and (b) measurably
  * spread the hot keys: the largest (key, salt) group is a fraction of
  * the largest bare-key group. Values are pinned by the oracle (the
  * UNSALTED join), so here we only verify the mechanism.
  */
class SaltedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec => nodes(q.plan)
    case other => other.children.flatMap(nodes)
  })

  test("join runs on (event_type, salt) — two join keys in the SMJ") {
    val df = Salted.saltedJoin(spark, TestSpark.sf)
    df.collect() // AQE: final plan exists only after execution
    val joins = nodes(df.queryExecution.executedPlan).collect {
      case j: SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, "merge join not planned")
    assert(joins.head.leftKeys.size == 2,
      s"expected 2 join keys (key, salt), got ${joins.head.leftKeys}")
  }

  test("salt spreads the hot keys: max (key, salt) group ≲ max key group / S") {
    val fact = Salted.saltedFact(spark, TestSpark.sf).cache()
    val maxBare = fact.groupBy("event_type").count()
      .agg(max("count")).head.getLong(0)
    val maxSalted = fact.groupBy("event_type", "salt").count()
      .agg(max("count")).head.getLong(0)
    // perfect spread would be maxBare / 16; allow 2× slack for the
    // binomial variance of a hash-assigned salt at test sizes
    assert(maxSalted * Salted.Salts <= maxBare * 2,
      s"salt did not spread: maxBare=$maxBare maxSalted=$maxSalted")
    fact.unpersist()
  }
}
