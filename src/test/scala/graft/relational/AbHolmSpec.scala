package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.PortableHash

/** #335 Holm family: structural properties on real data + a planted
  * family-wise effect where exactly one metric carries signal.
  */
class AbHolmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("holm rejections imply unadjusted rejections and form a rank prefix") {
    val rows = Events.abHolm(spark, TestSpark.sf).collect()
      .map(r => (Option(r.get(7)).map(_.asInstanceOf[Long]),
        r.getBoolean(9), r.getBoolean(10)))
    rows.foreach { case (_, unadj, holm) =>
      assert(!holm || unadj, "holm rejected what the unadjusted test kept")
    }
    val rejected = rows.collect { case (Some(rk), _, true) => rk }
    if (rejected.nonEmpty)
      assert(rejected.toSet == (1L to rejected.max).toSet,
        "holm rejections are not a rank prefix (step-down violated)")
  }

  test("planted effect on ONE metric: Holm rejects exactly that metric") {
    import spark.implicits._
    val rows = (0 until 1000).flatMap { u =>
      val arm = if (PortableHash.pHashJvm(s"ab|$u") % 2 == 0) "A" else "B"
      val pick = "t" + (PortableHash.pHashJvm(s"pick|$u") % 3 + 1)
      val base =
        if (arm == "A")
          Seq.fill(3)("boost") ++ Seq.fill(2)("t1") ++ Seq.fill(2)("t2") ++
            Seq.fill(2)("t3") ++ Seq("t4")
        else
          Seq.fill(2)("boost") ++ Seq.fill(2)("t1") ++ Seq.fill(2)("t2") ++
            Seq.fill(2)("t3") ++ Seq.fill(2)("t4")
      (base ++ Seq.fill(2)(pick)).zipWithIndex.map { case (t, i) =>
        (u * 100L + i, new java.sql.Timestamp(86400000L + u * 1000L + i),
          u.toLong, t, 1.0, "{}")
      }
    }
    val out = graft.core.TempDirs.create("graft_holm_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val got = Events.abHolm(spark, out).collect()
      .map(r => r.getString(0) -> (r.getBoolean(10), Option(r.get(7))))
      .toMap
    assert(got.keySet == Set("boost", "t1", "t2", "t3", "t4"))
    assert(got("boost")._1, "the planted effect was not Holm-rejected")
    assert(got("boost")._2.contains(1L), "the planted effect is not rank 1")
    Seq("t1", "t2", "t3", "t4").foreach { t =>
      assert(!got(t)._1, s"null metric $t falsely rejected under Holm")
    }
  }
}
