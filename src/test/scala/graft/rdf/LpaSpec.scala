package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** LPA guarantees beyond the oracle: the three synchronous rounds equal
  * a driver simulation over the raw undirected edge set, labels stay
  * inside the entity id space, and propagation genuinely coarsens the
  * labeling (communities form).
  */
class LpaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val got = GraphAlgos.lpa(spark, TestSpark.sf)
    .as[(Long, Long)].collect().toMap

  private lazy val edges = Dict.encodedTriples(spark, TestSpark.sf)
    .select(col("sid"), col("oid")).distinct()
    .as[(Long, Long)].collect()

  private lazy val ids = Dict.entities(spark, TestSpark.sf)
    .select("id").as[Long].collect()

  test("three rounds equal a driver simulation") {
    val und = (edges ++ edges.map { case (s, o) => (o, s) }).distinct
    val nbrs = und.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    var lbl = ids.map(i => i -> i).toMap
    for (_ <- 1 to GraphAlgos.LpaIters) {
      lbl = ids.map { v =>
        val votes = nbrs.getOrElse(v, Array.empty[Long]).map(lbl)
        if (votes.isEmpty) v -> lbl(v)
        else {
          val byLbl = votes.groupBy(identity).view.mapValues(_.size)
          v -> byLbl.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    assert(got == lbl, "LPA labels vs driver simulation")
  }

  test("labels live in the id space and the labeling coarsens") {
    val idSet = ids.toSet
    assert(got.keySet == idSet)
    assert(got.values.forall(idSet.contains))
    assert(got.values.toSeq.distinct.size < ids.length,
      "propagation must merge at least some labels")
  }
}
