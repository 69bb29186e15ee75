package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: scale problems show up as plan smells
  * long before they show up as wall-clock at test SFs. Asserts over the
  * OPTIMIZED/physical plan of every registered batch query:
  *
  *  - no `CartesianProduct` anywhere (an unconstrained cross join at
  *    100 TB is fatal; the deliberate 1-row count cross-joins compile to
  *    BroadcastNestedLoopJoin over a broadcast singleton, which is fine
  *    and stays allowed);
  *  - the relational headliners keep their pushed filters (a filter
  *    that slides above the scan re-reads the full table).
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Streaming queries RUN a stream when invoked; their batch-visible
  // plan is the memory-sink table scan, so plan-shape checks here would
  // be vacuous (their semantics are covered by StreamingSpec + oracle).
  private val skip = Set(
    "streaming_windowed_agg", "streaming_sessionize", "streaming_dedup",
    "streaming_quality_filter", "streaming_enrich",
    // trainers execute eagerly (multi-job loops), not a single plan
    "kge_transe_train", "kge_transe_train_adagrad", "kge_transe_train_adam",
    "kge_distmult_train", "kge_hole_train", "cp_als", "rescal_als",
    // executes eagerly too (label-propagation loop of localCheckpoints);
    // the final labels frame's plan is trivial, so inspecting it here
    // would be vacuous while silently running ~20 Spark jobs (ADVICE r3)
    "dedup_components",
    // eager merge-round loop (1-row collect per round); the returned
    // frame is a local merge table with a trivial plan
    "vocab_bpe_learn")

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, TestSpark.sf)
          .queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("q1_agg keeps filter pushdown and column pruning at the scan") {
    val plan = SparkEntry.queries("q1_agg")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filter no longer pushed to the parquet scan")
    assert(!plan.contains("l_orderkey"),
      "reading columns q1 never uses — pruning regressed")
  }
}
