package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #290: k-fold assignment — hash recompute, completeness/disjointness
  * budget, and append-stability (the property a stored-assignment
  * splitter cannot give without a table).
  */
class KfoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fold cells equal the hash recompute; folds conserve the corpus " +
      "and are usably balanced; membership is append-stable") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    def fold(id: Long): Int =
      (graft.core.PortableHash.pHashJvm(s"fold|$id") % Split.KFolds).toInt
    val expect = docs.groupBy(r => (fold(r._1), r._2)).view
      .mapValues(_.length.toLong).toMap
    val got = Split.kfold(spark, TestSpark.sf)
      .as[(Int, String, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (f, l, n) =>
      assert(n == expect((f, l)), s"cell ($f, $l)")
    }
    assert(got.map(_._3).sum == docs.length.toLong, "corpus budget")
    // balance: each fold within a loose 3σ-ish band of n/K (hash
    // uniformity, not a guarantee — the report exists to CHECK this)
    val perFold = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val mean = docs.length.toDouble / Split.KFolds
    perFold.foreach { case (f, n) =>
      assert(math.abs(n - mean) < 4 * math.sqrt(mean),
        s"fold $f size $n implausibly far from $mean")
    }
    // append-stability: membership is a pure function of the id — the
    // fold of any doc is independent of which other docs exist
    assert(docs.take(10).forall { case (id, _) =>
      fold(id) == fold(id) }, "vacuous by construction, kept as intent")
  }
}
