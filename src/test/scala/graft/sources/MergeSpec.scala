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

  test("incremental view maintenance equals the full recompute over the " +
      "applied change batch, per segment to the cent") {
    import spark.implicits._
    val segNames = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")
    def h(key: Long): Long = graft.core.PortableHash.pHashJvm(s"chg$key") % 10
    def delta(key: Long): Double =
      (graft.core.PortableHash.pHashJvm(s"amt$key") % 1000).toDouble / 4.0
    val cust = graft.core.Tables.customer(spark, TestSpark.sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
    def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong
    // FULL recompute of the view over the merged table, driver-side
    val mergedRows = cust.flatMap { case (k, seg, bal) =>
      val keep = h(k) match {
        case 5 => Nil
        case x if x <= 4 => Seq((seg, bal + delta(k)))
        case _ => Seq((seg, bal))
      }
      val insert =
        if (h(k) == 6)
          Seq((segNames(
            (graft.core.PortableHash.pHashJvm(s"seg$k") % 5).toInt), delta(k)))
        else Nil
      keep ++ insert
    }
    val expect = mergedRows.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(r => cents(r._2)).sum.toDouble / 100.0)
    }.toMap
    val got = Merge.viewDeltaMaintain(spark, TestSpark.sf)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect)
    // the batch genuinely exercises all three ops at this SF
    val ks = cust.map(_._1)
    assert(ks.exists(h(_) <= 4) && ks.exists(h(_) == 5) && ks.exists(h(_) == 6))
  }
}
