package graft.tensor

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rdf.Dict

class UnfoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unfolding report: every mode's indices equal a driver recompute") {
    val enc = Dict.encodedTriples(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val nEnt = Dict.entities(spark, TestSpark.sf).count()
    val modes: Map[Long, Array[(Long, Long)]] = Map(
      1L -> enc.map { case (i, k, j) => (i, j + nEnt * k) },
      2L -> enc.map { case (i, k, j) => (j, i + nEnt * k) },
      3L -> enc.map { case (i, k, j) => (k, i + nEnt * j) })
    val got = Unfold.unfoldStats(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    modes.foreach { case (m, cells) =>
      val (_, nnz, rOcc, cOcc, cMin, cMax, chk) = got(m)
      assert(nnz == cells.length)
      assert(rOcc == cells.map(_._1).distinct.length)
      assert(cOcc == cells.map(_._2).distinct.length)
      assert(cMin == cells.map(_._2).min && cMax == cells.map(_._2).max)
      val p = Unfold.ChkP
      assert(chk == cells.iterator.map { case (r, c) => (r % p) * (c % p) }.sum)
    }
    // the unfolding is injective per mode: no two tensor entries share a
    // matricized cell (COO entries are distinct triples)
    modes.values.foreach(cells => assert(cells.distinct.length == cells.length))
  }
}
