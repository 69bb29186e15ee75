package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{PortableHash, Tables}

/** Incremental-dedup guarantees beyond the oracle: the base/batch split
  * partitions the corpus, every batch doc gets exactly one verdict, and
  * the verdicts equal a driver recomputation — including the
  * append-stability property (base verdicts never depend on the batch).
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("verdicts equal a driver recompute; split partitions the corpus") {
    val got = Dedup.incremental(spark, TestSpark.sf)
      .as[(Long, String, Option[Long], Option[Long], Boolean)].collect()

    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .as[(Long, String)].collect()
    def isBase(id: Long): Boolean =
      PortableHash.pHashJvm(s"inc|$id") % Dedup.IncrBaseMod < Dedup.IncrBaseKeep
    val (base, batch) = docs.partition { case (id, _) => isBase(id) }
    assert(base.length + batch.length == docs.length)
    assert(got.length == batch.length, "one verdict per batch doc")

    val baseMin = base.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val batchByHash = batch.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    got.foreach { case (id, h, dupBase, dupBatch, keep) =>
      assert(dupBase == baseMin.get(h), s"doc $id base verdict")
      val earlier = batchByHash(h).filter(_ < id)
      assert(dupBatch == earlier.headOption.map(_ => batchByHash(h).head)
        .filter(_ < id), s"doc $id batch verdict")
      assert(keep == (dupBase.isEmpty && dupBatch.isEmpty))
    }
  }
}
