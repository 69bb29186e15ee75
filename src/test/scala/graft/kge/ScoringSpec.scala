package graft.kge

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.CircularCorrelation.ccorr

class ScoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CircularCorrelation matches the O(d²) definition (codegen path)") {
    val h = Array(1.0, 2.0, 3.0)
    val t = Array(4.0, 5.0, 6.0)
    // ccorr(h,t)[k] = Σ_i h(i)·t((i+k) mod 3)
    val expected = (0 until 3).map(k =>
      (0 until 3).map(i => h(i) * t((i + k) % 3)).sum)
    val got = Seq((h.toSeq, t.toSeq)).toDF("h", "t")
      .select(ccorr(col("h"), col("t"))).as[Seq[Double]].head()
    assert(got == expected)
  }

  test("CircularCorrelation interpreted (eval) path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = org.apache.spark.sql.graft.CircularCorrelation(
      Literal.create(new GenericArrayData(Array(1.0, 2.0, 3.0)), ArrayType(DoubleType)),
      Literal.create(new GenericArrayData(Array(4.0, 5.0, 6.0)), ArrayType(DoubleType)))
    val out = expr.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    assert(out.toSeq == Seq(1 * 4.0 + 2 * 5 + 3 * 6, 1 * 5.0 + 2 * 6 + 3 * 4, 1 * 6.0 + 2 * 4 + 3 * 5))
  }

  test("TransE score is -||h+r-t||^2 of the dyadic embeddings") {
    val row = Scoring.transeScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid").limit(1)
      .select($"sid", $"pid", $"oid", $"score").head()
    val (sid, pid, oid) = (row.getLong(0), row.getLong(1), row.getLong(2))
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    val expected = -(0 until Embeddings.D).map { i =>
      val d = dyad(s"E|$sid|$i") + dyad(s"R|$pid|$i") - dyad(s"E|$oid|$i")
      d * d
    }.sum
    assert(row.getDouble(3) == expected)
  }

  test("ComplEx score matches the hand-computed Re<h,r,conj(t)>") {
    val row = Scoring.complexScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid").limit(1)
      .select($"sid", $"pid", $"oid", $"score").head()
    val (sid, pid, oid) = (row.getLong(0), row.getLong(1), row.getLong(2))
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    val expected = (0 until Embeddings.D).map { i =>
      val (hr, hi) = (dyad(s"E|$sid|$i"), dyad(s"EI|$sid|$i"))
      val (tr, ti) = (dyad(s"E|$oid|$i"), dyad(s"EI|$oid|$i"))
      val (rr, ri) = (dyad(s"R|$pid|$i"), dyad(s"RI|$pid|$i"))
      hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr
    }.sum
    assert(row.getDouble(3) == expected) // dyadic products: exact equality
  }

  test("RotatE score matches the hand-computed quantized rotation " +
      "residual, rotations are unit-modulus, interpreted == codegen") {
    val row = Scoring.rotateScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid").limit(1)
      .select($"sid", $"pid", $"oid", $"score").head()
    val (sid, pid, oid) = (row.getLong(0), row.getLong(1), row.getLong(2))
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    var q = 0L
    (0 until Embeddings.D).foreach { i =>
      val a = dyad(s"R|$pid|$i"); val b = dyad(s"RI|$pid|$i")
      val m = math.sqrt((a * a) + (b * b))
      val c = if (m == 0) 1.0 else a / m
      val s = if (m == 0) 0.0 else b / m
      // rotation must be unit-modulus to 1 ulp
      assert(math.abs((c * c) + (s * s) - 1.0) < 1e-15)
      val hr = dyad(s"E|$sid|$i"); val hi = dyad(s"EI|$sid|$i")
      val tr = dyad(s"E|$oid|$i"); val ti = dyad(s"EI|$oid|$i")
      val re = ((hr * c) - (hi * s)) - tr
      val im = ((hr * s) + (hi * c)) - ti
      q += math.floor(math.sqrt((re * re) + (im * im)) * 1e12 + 0.5).toLong
    }
    assert(row.getDouble(3) == -(q.toDouble / 1e12))
    // interpreted eval path of the fold agrees with the codegen result
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def lit(xs: Array[Double]) =
      Literal.create(new GenericArrayData(xs), ArrayType(DoubleType))
    val hrA = Array(0.5, -0.25); val hiA = Array(0.125, 0.75)
    val trA = Array(-0.5, 0.375); val tiA = Array(0.25, -0.125)
    val csA = Array(0.6, 0.8, 0.8, -0.6) // two exact unit rotations
    val interp = org.apache.spark.sql.graft.RotateDistQ(
      lit(hrA), lit(hiA), lit(trA), lit(tiA), lit(csA)).eval(null)
    var expQ = 0L
    (0 until 2).foreach { i =>
      val c = csA(i); val s = csA(2 + i)
      val re = ((hrA(i) * c) - (hiA(i) * s)) - trA(i)
      val im = ((hrA(i) * s) + (hiA(i) * c)) - tiA(i)
      expQ += math.floor(math.sqrt((re * re) + (im * im)) * 1e12 + 0.5).toLong
    }
    assert(interp == expQ)
    import org.apache.spark.sql.functions.col
    val viaPlan = Seq((hrA.toSeq, hiA.toSeq, trA.toSeq, tiA.toSeq, csA.toSeq))
      .toDF("hr", "hi", "tr", "ti", "cs")
      .select(graft.functions.VectorFolds.rotateDistQ(
        col("hr"), col("hi"), col("tr"), col("ti"), col("cs")))
      .as[Long].head()
    assert(viaPlan == expQ)
  }

  test("TransH score matches the hand-computed quantized projection " +
      "from raw md5 dyadics, and eval/codegen agree") {
    val row = Scoring.transhScore(spark, TestSpark.sf)
      .orderBy("sid", "pid", "oid").limit(1)
      .select($"sid", $"pid", $"oid", $"score").head()
    val (sid, pid, oid) = (row.getLong(0), row.getLong(1), row.getLong(2))
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    val n = (0 until Embeddings.D).map(i => dyad(s"WN|$pid|$i")).toArray
    val m = math.sqrt(n.map(x => x * x).sum) // dyadic squares: exact sum
    val w = n.map(_ / m)
    // unit to 1 ulp
    assert(math.abs(w.map(x => x * x).sum - 1.0) < 1e-14)
    val h = (0 until Embeddings.D).map(i => dyad(s"E|$sid|$i")).toArray
    val t = (0 until Embeddings.D).map(i => dyad(s"E|$oid|$i")).toArray
    val r = (0 until Embeddings.D).map(i => dyad(s"R|$pid|$i")).toArray
    var aq = 0L; var bq = 0L
    (0 until Embeddings.D).foreach { i =>
      aq += math.floor((w(i) * h(i)) * 1e12 + 0.5).toLong
      bq += math.floor((w(i) * t(i)) * 1e12 + 0.5).toLong
    }
    val a = aq.toDouble / 1e12; val b = bq.toDouble / 1e12
    var q = 0L
    (0 until Embeddings.D).foreach { i =>
      val u = ((h(i) - (a * w(i))) + r(i)) - (t(i) - (b * w(i)))
      q += math.floor((u * u) * 1e12 + 0.5).toLong
    }
    assert(row.getDouble(3) == -(q.toDouble / 1e12))
    // interpreted eval agrees with a hand-rolled two-pass on toy arrays
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def alit(xs: Array[Double]) =
      Literal.create(new GenericArrayData(xs), ArrayType(DoubleType))
    val hA = Array(0.5, -0.25); val tA = Array(-0.5, 0.375)
    val rA = Array(0.125, 0.75); val wA = Array(0.6, 0.8)
    val interp = org.apache.spark.sql.graft.TransHDistQ(
      alit(hA), alit(tA), alit(rA), alit(wA)).eval(null)
    var eaq = 0L; var ebq = 0L
    (0 until 2).foreach { i =>
      eaq += math.floor((wA(i) * hA(i)) * 1e12 + 0.5).toLong
      ebq += math.floor((wA(i) * tA(i)) * 1e12 + 0.5).toLong
    }
    val ea = eaq.toDouble / 1e12; val eb = ebq.toDouble / 1e12
    var eq = 0L
    (0 until 2).foreach { i =>
      val u = ((hA(i) - (ea * wA(i))) + rA(i)) - (tA(i) - (eb * wA(i)))
      eq += math.floor((u * u) * 1e12 + 0.5).toLong
    }
    assert(interp == eq)
    import org.apache.spark.sql.functions.col
    val viaPlan = Seq((hA.toSeq, tA.toSeq, rA.toSeq, wA.toSeq))
      .toDF("h", "t", "r", "w")
      .select(graft.functions.VectorFolds.transHDistQ(
        col("h"), col("t"), col("r"), col("w")))
      .as[Long].head()
    assert(viaPlan == eq)
  }

  test("ranking: every rank is within [1, candidate-set size]") {
    val ranks = RankingEval.ranks(spark, TestSpark.sf)
    val n = ranks.count()
    assert(n > 0)
    assert(ranks.filter($"rank" < 1).count() == 0)
    val maxCand = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
      .select("pid", "oid").distinct().groupBy("pid").count()
      .agg(max("count")).head().getLong(0)
    assert(ranks.filter($"rank" > maxCand).count() == 0)
  }
  test("per-relation eval: partitions the test slice, mrr bounded") {
    val per = RankingEval.evalPerRelation(spark, TestSpark.sf)
      .select("pid", "n_test", "mrr", "hits10")
      .as[(Long, Long, Double, Double)].collect()
    val total = RankingEval.ranks(spark, TestSpark.sf).count()
    assert(per.map(_._2).sum == total, "per-relation rows partition the test slice")
    per.foreach { case (_, n, mrr, h10) =>
      assert(n > 0); assert(mrr > 0.0 && mrr <= 1.0); assert(h10 >= 0.0 && h10 <= 1.0)
    }
  }
  test("both-sides eval: two directions, bounded metrics, head ranks valid") {
    val rows = RankingEval.evalBoth(spark, TestSpark.sf)
      .select("direction", "n_test", "mrr", "hits10", "mean_rank")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("head", "tail"))
    rows.foreach { case (_, n, mrr, h10, mr) =>
      assert(n > 0); assert(mrr > 0 && mrr <= 1)
      assert(h10 >= 0 && h10 <= 1); assert(mr >= 1)
    }
    val hr = RankingEval.ranksHead(spark, TestSpark.sf)
    val maxCand = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
      .select("pid", "sid").distinct().groupBy("pid").count()
      .agg(max("count")).head().getLong(0)
    assert(hr.filter($"rank" < 1 || $"rank" > maxCand).count() == 0)
  }

  test("transr: every score equals the driver projection recompute " +
      "exactly, and the projection genuinely reorders TransE") {
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    val rows = Scoring.transrScore(spark, TestSpark.sf)
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sid, pid, oid, score) =>
      val h = (0 until Embeddings.D).map(j => dyad(s"E|$sid|$j"))
      val t = (0 until Embeddings.D).map(j => dyad(s"E|$oid|$j"))
      val r = (0 until Embeddings.DTransR).map(i => dyad(s"R|$pid|$i"))
      val m = (0 until Embeddings.DTransR * Embeddings.D)
        .map(k => dyad(s"MR|$pid|$k"))
      val expect = -(0 until Embeddings.DTransR).map { i =>
        val hp = (0 until Embeddings.D)
          .map(j => m(i * Embeddings.D + j) * h(j)).sum
        val tp = (0 until Embeddings.D)
          .map(j => m(i * Embeddings.D + j) * t(j)).sum
        val u = hp + r(i) - tp
        u * u
      }.sum
      assert(score == expect, s"transr($sid,$pid,$oid)")
    }
    // the per-relation space must CHANGE the geometry: the transr
    // ranking of the slice differs from the plain TransE ranking
    val te = Scoring.transeScore(spark, TestSpark.sf)
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (-r._4, r._1, r._2, r._3)).map(r => (r._1, r._2, r._3))
    val tr = rows.sortBy(r => (-r._4, r._1, r._2, r._3))
      .map(r => (r._1, r._2, r._3))
    assert(te.toSeq != tr.toSeq, "projection should reorder the slice")
  }

  test("pairre: every score equals the exact dyadic recompute, and the " +
      "paired scaling genuinely reorders TransE") {
    def dyad(seed: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 201) - 100).toDouble / 128.0
    }
    val rows = Scoring.pairreScore(spark, TestSpark.sf)
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sid, pid, oid, score) =>
      val expect = -(0 until Embeddings.D).map { i =>
        val u = dyad(s"E|$sid|$i") * dyad(s"RH|$pid|$i") -
          dyad(s"E|$oid|$i") * dyad(s"RT|$pid|$i")
        u * u
      }.sum
      assert(score == expect, s"pairre($sid,$pid,$oid)")
    }
    val te = Scoring.transeScore(spark, TestSpark.sf)
      .select($"sid", $"pid", $"oid", $"score")
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (-r._4, r._1, r._2, r._3)).map(r => (r._1, r._2, r._3))
    val pr = rows.sortBy(r => (-r._4, r._1, r._2, r._3))
      .map(r => (r._1, r._2, r._3))
    assert(te.toSeq != pr.toSeq, "paired scaling should reorder the slice")
  }

  test("score calibration: bins equal a recompute from the scored " +
      "slice, budgets conserve, positives separate upward") {
    // positive bins must equal floor() of the registered #13 scores
    val posBins = Scoring.transeScore(spark, TestSpark.sf)
      .select(floor(col("score")).cast("long")).as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Scoring.scoreCalibration(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (_, nPos, nNeg, nTot, rate) =>
      assert(nPos + nNeg == nTot)
      assert(rate == nPos.toDouble / nTot)
    }
    assert(got.view.mapValues(_._2).toMap.filter(_._2 > 0) == posBins)
    val n = posBins.values.sum
    assert(got.values.map(_._2).sum == n, "positive budget")
    assert(got.values.map(_._3).sum == n, "one negative per positive")
    // separation direction: positives score at least as high on average
    // (observed triples vs random corruptions under the dyadic model)
    def mean(f: ((Long, Long, Long, Long, Double)) => Long) = {
      val tot = got.values.map(v => f(v)).sum.toDouble
      got.values.map(v => v._1 * f(v)).sum / tot
    }
    assert(mean(_._2) >= mean(_._3) - 1.0,
      "positive bin mass should not sit materially below negatives")
  }
}
