package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class MergeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("merge semantics: deletes gone, updates applied, inserts present, " +
    "kept rows untouched — exact accounting") {
    val r = Merge.mergeUpsert(spark, TestSpark.sf).cache()
    val base = graft.core.Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal0")).cache()
    def h(key: Long): Long = graft.core.PortableHash.pHashJvm(s"chg$key") % 10
    def delta(key: Long): Double =
      (graft.core.PortableHash.pHashJvm(s"amt$key") % 1000).toDouble / 4.0
    val keys = base.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val dels = keys.keySet.filter(h(_) == 5)
    val upds = keys.keySet.filter(k => h(k) <= 4)
    val ins = keys.keySet.filter(h(_) == 6)
    // accounting
    assert(r.count() == keys.size - dels.size + ins.size)
    val got = r.collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getString(2)))).toMap
    // deletes gone, inserts present with the delta payload and new keys
    assert(dels.forall(k => !got.contains(k)))
    for (k <- ins) assert(got(k + 10000000L) == ((delta(k), "I")))
    // updates applied exactly; everything else bit-identical and marked K
    for (k <- upds) assert(got(k) == ((keys(k) + delta(k), "U")))
    for ((k, b) <- keys if !dels(k) && !upds(k))
      assert(got(k) == ((b, "K")))
    base.unpersist(); r.unpersist()
  }

  test("tableDiff audits the merge: adds = inserts, removals = deletes, " +
    "changes = updates whose payload actually moved") {
    val diff = Merge.tableDiff(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = graft.core.Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    def h(key: Long): Long = graft.core.PortableHash.pHashJvm(s"chg$key") % 10
    def delta(key: Long): Double =
      (graft.core.PortableHash.pHashJvm(s"amt$key") % 1000).toDouble / 4.0
    val dels = base.count(h(_) == 5)
    val ins = base.count(h(_) == 6)
    // an op=U change with delta == 0 must be reported UNCHANGED — the
    // diff measures values, not change-feed labels
    val realUpds = base.count(k => h(k) <= 4 && delta(k) != 0.0)
    assert(diff("n_base") == base.length)
    assert(diff("n_new") == base.length - dels + ins)
    assert(diff("added") == ins)
    assert(diff("removed") == dels)
    assert(diff("changed") == realUpds)
    assert(diff("unchanged") == base.length - dels - realUpds)
  }
}
