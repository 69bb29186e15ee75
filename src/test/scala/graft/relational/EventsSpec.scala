package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("json extract: every event parses, bounds ordered, sums consistent") {
    val rows = Events.jsonExtract(spark, TestSpark.sf)
      .select("n", "n_k", "sum_k", "min_k", "max_k")
      .as[(Long, Long, Long, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, nk, sum, mn, mx) =>
      assert(n == nk) // the generated props are all well-formed JSON
      assert(mn <= mx)
      assert(sum >= n * mn && sum <= n * mx)
    }
    val total = Events.jsonExtract(spark, TestSpark.sf)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(total == graft.core.Tables.events(spark, TestSpark.sf).count())
  }
}
