package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #328: incremental dictionary update — the append-stability
  * contract (old ids bit-identical through the update), dense id
  * space, and genuine increment coverage.
  */
class DeltaUpdateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("old ids never move; new ids append densely after them; the " +
      "updated dictionary covers exactly the full entity set") {
    import org.apache.spark.sql.functions._
    import graft.core.PortableHash
    val t = graft.core.TpchGraph.triples(spark, TestSpark.sf)
    val oldT = t.filter(PortableHash.pHash(concat(lit("old|"), col("s"),
      lit("|"), col("p"), lit("|"), col("o"))) % 4 =!= 0)
    val oldDict = Dict.encode(
      oldT.select(col("s").as("uri"))
        .union(oldT.select(col("o").as("uri"))).distinct())
      .as[(String, Long)].collect().toMap

    val updated = Dict.deltaUpdate(spark, TestSpark.sf)
      .as[(String, Long, Boolean)].collect()
    val upd = updated.map(r => r._1 -> ((r._2, r._3))).toMap
    // append stability: every old uri keeps its exact id, flagged old
    oldDict.foreach { case (uri, id) =>
      assert(upd(uri) == ((id, false)), s"old id moved for $uri")
    }
    // the increment is genuine and flagged new
    val newOnes = updated.filter(_._3)
    assert(newOnes.nonEmpty, "the staged snapshot must add entities")
    assert(newOnes.forall(r => !oldDict.contains(r._1)))
    // dense id space 0..N-1, new ids strictly after all old ids
    val ids = updated.map(_._2).sorted
    assert(ids.toSeq == (0L until updated.length.toLong))
    assert(newOnes.map(_._2).min == oldDict.size.toLong)
    // coverage: exactly the full corpus entity set
    val full = Dict.entityUris(spark, TestSpark.sf)
      .as[String].collect().toSet
    assert(updated.map(_._1).toSet == full)
    // new ids follow the same deterministic bucket order among themselves
    import graft.core.PortableHash.pHashJvm
    val expectedNewOrder = newOnes.map(_._1)
      .sortBy(u => (pHashJvm(u) % Dict.NBuckets, u))
    assert(newOnes.sortBy(_._2).map(_._1).toSeq == expectedNewOrder.toSeq)
  }
}
