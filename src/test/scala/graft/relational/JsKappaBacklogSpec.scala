package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #300 JS source drift, #301 gate-agreement κ, #302 open-order
  * backlog — driver recomputes of the defining semantics.
  */
class JsKappaBacklogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stop = graft.text.TextAnalysis.stopwords.toSet

  /** Driver mirror of TextAnalysis.quality (same IEEE tree). */
  private def quality(text: String, nChars: Long): Double = {
    val ws = text.trim.split("\\s+")
    val nw = ws.length.toDouble
    val stopRatio = ws.count(stop).toDouble / nw
    val uniqRatio = ws.distinct.length.toDouble / nw
    val avgWordLen = (nChars.toDouble - (nw - 1.0)) / nw
    0.3 * math.min(nw / 50.0, 1.0) +
      0.3 * (1.0 - stopRatio) +
      0.2 * math.min(avgWordLen / 8.0, 1.0) +
      0.2 * uniqRatio
  }

  private def docs =
    graft.core.Tables.documents(spark, TestSpark.sf)
      .select("source", "lang", "text", "n_chars")
      .as[(String, String, String, Long)].collect()

  test("js divergence: every per-source JS equals the quantized " +
      "driver recompute; bounded by ln 2; js_norm in [0, 1]") {
    val binOf = docs.map { case (src, _, t, nc) =>
      val qv = math.floor(quality(t, nc) * 1e6 + 0.5) / 1e6
      (src, math.floor(qv * DataQuality.JsBinsPerUnit).toLong)
    }
    val bins = binOf.map(_._2).distinct.sorted
    val nBins = bins.length.toLong
    val nT = binOf.length.toLong
    val totalByBin = binOf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = binOf.groupBy(_._1)
    val expect = bySrc.map { case (src, rows) =>
      val nS = rows.length.toLong
      val cByBin = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val js = bins.map { b =>
        val c = cByBin.getOrElse(b, 0L)
        val ct = totalByBin(b)
        val numP = (c + 1L).toDouble * (nT - nS + nBins).toDouble
        val numQ = (ct - c + 1L).toDouble * (nS + nBins).toDouble
        val p = (c + 1L).toDouble / (nS + nBins).toDouble
        val q = (ct - c + 1L).toDouble / (nT - nS + nBins).toDouble
        val term = 0.5 * p * math.log(2.0 * numP / (numP + numQ)) +
          0.5 * q * math.log(2.0 * numQ / (numP + numQ))
        math.floor(term * 1e6 + 0.5).toLong
      }.sum.toDouble / 1e6
      src -> (nS, js)
    }
    val got = DataQuality.jsDivergence(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (src, nDocs, nb, js, jsNorm) =>
      val (eN, eJs) = expect(src)
      assert(nDocs == eN, s"$src n_docs")
      assert(nb == nBins, s"$src n_bins")
      assert(js == eJs, s"$src js")
      assert(jsNorm == js / DataQuality.Ln2, s"$src js_norm")
      assert(js >= 0.0 && js <= DataQuality.Ln2 + 1e-9, s"$src bounds")
      assert(jsNorm >= 0.0 && jsNorm <= 1.0 + 1e-9)
    }
  }

  test("gate agreement: confusion cells and kappa equal the driver " +
      "recompute; kappa bounded; the two gates genuinely differ " +
      "somewhere on this corpus") {
    val gated = docs.map { case (_, lang, t, nc) =>
      val ws = t.trim.split("\\s+")
      val nw = ws.length.toLong
      val chars = ws.map(_.length.toLong).sum
      val vAny = nw < 50 || nw > 100000 ||
        chars < 3 * nw || chars > 10 * nw ||
        ws.map(_.length).max > 20 ||
        ws.count(stop) < 2 ||
        ws.distinct.length.toLong * 5 < nw ||
        ws.count(_.length <= 2).toLong * 2 > nw
      (lang, !vAny, quality(t, nc) >= DataQuality.GateTheta)
    }
    val got = DataQuality.gateAgreement(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
    assert(got.length == gated.map(_._1).distinct.length)
    got.foreach { case (lang, n, n11, n10, n01, n00, rr, sr, po, kappa) =>
      val rows = gated.filter(_._1 == lang)
      assert(n == rows.length.toLong, s"$lang n")
      assert(n11 == rows.count(r => r._2 && r._3).toLong, s"$lang n11")
      assert(n10 == rows.count(r => r._2 && !r._3).toLong, s"$lang n10")
      assert(n01 == rows.count(r => !r._2 && r._3).toLong, s"$lang n01")
      assert(n00 == rows.count(r => !r._2 && !r._3).toLong, s"$lang n00")
      assert(rr == (n11 + n10).toDouble / n.toDouble)
      assert(sr == (n11 + n01).toDouble / n.toDouble)
      val ePo = (n11 + n00).toDouble / n.toDouble
      val ePe = ((n11 + n10).toDouble * (n11 + n01).toDouble +
        (n01 + n00).toDouble * (n10 + n00).toDouble) /
        (n.toDouble * n.toDouble)
      assert(po == ePo, s"$lang p_o")
      val eK = if (ePe == 1.0) 1.0 else (ePo - ePe) / (1.0 - ePe)
      assert(kappa == eK, s"$lang kappa")
      assert(kappa <= 1.0 + 1e-12 && kappa >= -1.0 - 1e-12)
    }
    // the table is non-vacuous: somewhere the gates disagree
    assert(got.map(r => r._3 + r._4).sum > 0 || got.map(_._5).sum > 0,
      "gates never disagree — threshold degenerate")
  }

  test("orders backlog: per-day levels equal the running-ledger " +
      "recompute; final backlog = orders that never fully ship") {
    val opened = graft.core.Tables.orders(spark, TestSpark.sf)
      .selectExpr("unix_timestamp(o_orderdate) DIV 86400")
      .as[Long].collect()
    val closed = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .selectExpr("l_orderkey", "unix_timestamp(l_shipdate) DIV 86400")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (_, rs) => rs.map(_._2).max }.toSeq
    val days = (opened ++ closed).distinct.sorted
    val oBy = opened.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cBy = closed.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var lvl = 0L
    val expect = days.map { d =>
      lvl += oBy.getOrElse(d, 0L) - cBy.getOrElse(d, 0L)
      d -> (oBy.getOrElse(d, 0L), cBy.getOrElse(d, 0L), lvl)
    }.toMap
    val got = Relational.ordersBacklog(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == days.length, "day-grid size")
    got.foreach { case (d, o, c, b) =>
      val (eo, ec, eb) = expect(d)
      assert(o == eo && c == ec, s"day $d deltas")
      assert(b == eb, s"day $d backlog")
    }
    // conservation: the last level is exactly the never-shipped count
    assert(lvl == opened.length.toLong - closed.length.toLong)
    assert(lvl >= 0L)
  }
}
