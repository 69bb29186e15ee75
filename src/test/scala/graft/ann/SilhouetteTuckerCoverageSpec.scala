package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.PortableHash

/** #303 TuckER score, #304 contamination coverage, #305 simplified
  * silhouette — driver recomputes of the defining semantics.
  */
class SilhouetteTuckerCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tucker: the factored M_r bilinear equals the direct 512-term " +
      "core contraction exactly, and genuinely differs from DistMult") {
    def emb(kind: String, id: Long, d: Int): Array[Double] =
      Array.tabulate(d)(i => PortableHash.dyadicJvm(s"$kind|$id|$i"))
    val w = graft.kge.Embeddings.tuckerW
    val de = graft.kge.Embeddings.DRescal
    val got = graft.kge.Scoring.tuckerScore(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (sid, pid, oid, score) =>
      val h = emb("E", sid, de); val t = emb("E", oid, de)
      val r = emb("R", pid, de)
      // direct triple contraction, arbitrary (a, j, b) order — exact
      // dyadics, so any summation order gives the same double
      var s = 0.0
      for (a <- 0 until de; j <- 0 until de; b <- 0 until de)
        s += w(a * de * de + j * de + b) * r(j) * h(a) * t(b)
      assert(score == s, s"triple ($sid, $pid, $oid)")
    }
    // subsumption is real, not a relabeling: the shared core reorders
    // triples relative to the diagonal-only DistMult score
    val dm = graft.kge.Scoring.distmultScore(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    val tkOrder = got.sortBy(r => (-r._4, r._1, r._2, r._3)).map(r => (r._1, r._2, r._3)).toSeq
    val dmOrder = got.map(r => (r._1, r._2, r._3))
      .sortBy(k => (-dm(k), k._1, k._2, k._3)).toSeq
    assert(tkOrder != dmOrder, "TuckER must reorder vs DistMult")
  }

  test("coverage: histogram and at-or-above tail equal the driver " +
      "recompute; bin 0's tail is the whole eligible train corpus") {
    val n = graft.pipeline.Decontaminate.N
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String): Set[Long] = {
      val ws = t.trim.split("\\s+")
      if (ws.length < n) Set.empty
      else ws.sliding(n).map(g => PortableHash.pHashJvm(g.mkString(" "))).toSet
    }
    val evalSet = docs.filter(_._1 % graft.pipeline.Decontaminate.EvalMod == 0)
      .flatMap(d => grams(d._2)).toSet
    val covs = docs.filter(_._1 % graft.pipeline.Decontaminate.EvalMod != 0)
      .map(d => grams(d._2))
      .filter(_.nonEmpty)
      .map(g => g.count(evalSet).toDouble / g.size)
    val bins = covs.map(c => math.min(
      math.floor(c * graft.pipeline.Decontaminate.CovBins),
      (graft.pipeline.Decontaminate.CovBins - 1).toDouble).toLong)
    val expect = bins.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = graft.pipeline.Decontaminate.coverage(spark, TestSpark.sf)
      .as[(Long, Double, Long, Long)].collect()
    got.foreach { case (bin, lo, nd, nGe) =>
      assert(lo == bin.toDouble / graft.pipeline.Decontaminate.CovBins)
      assert(nd == expect.getOrElse(bin, 0L), s"bin $bin count")
      assert(nGe == bins.count(_ >= bin).toLong, s"bin $bin tail")
    }
    // every emitted bin at or below an occupied bin appears, and the
    // bin-0 tail counts every eligible train doc
    assert(got.map(_._1).max == bins.max)
    assert(got.find(_._1 == 0L).map(_._4).getOrElse(
      got.minBy(_._1)._4) == bins.length.toLong)
  }

  test("silhouette: per-cluster means equal a full two-iteration Lloyd " +
      "driver recompute; sizes match the kmeans table") {
    val k = KMeans.K; val d = KMeans.D
    val pts = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect()
    def sqd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val x = a(i) - b(i); s += x * x; i += 1 }
      s
    }
    def qMeans(assigned: Seq[(Long, Array[Double], Int)]): Map[Int, Array[Double]] =
      assigned.groupBy(_._3).map { case (c, rows) =>
        c -> Array.tabulate(d) { i =>
          rows.map(r => math.floor(r._2(i) * 1e6 + 0.5).toLong).sum
            .toDouble / 1e6 / rows.size
        }
      }
    val seeds = (0 until k).map(c =>
      Array.tabulate(d)(i => PortableHash.dyadicJvm(s"KM|$c|$i")))
    // sqd accumulates in ascending-index order — the identical IEEE
    // sequence as the codegen'd sqDiffSum fold, so argmin inputs and
    // the final sqrt distances are bit-equal
    val a1 = pts.map { case (id, v) =>
      (id, v, (0 until k).minBy(c => (sqd(v, seeds(c)), c)))
    }
    val c1 = qMeans(a1.toSeq)
    val a2 = pts.map { case (id, v) =>
      (id, v, c1.keys.toSeq.sorted.minBy(c => (sqd(v, c1(c)), c)))
    }
    val c2 = qMeans(a2.toSeq)
    val expect = a2.groupBy(_._3).map { case (c, rows) =>
      val abs = rows.map { case (_, v, own) =>
        val a = math.sqrt(sqd(v, c2(own)))
        val b = c2.keys.filter(_ != own).map(kc => math.sqrt(sqd(v, c2(kc)))).min
        val s = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
        (a, b, s)
      }
      def qavg(xs: Seq[Double]) =
        xs.map(x => math.floor(x * 1e6 + 0.5).toLong).sum.toDouble / 1e6 / xs.size
      c.toLong -> (rows.length.toLong, qavg(abs.map(_._1).toSeq),
        qavg(abs.map(_._2).toSeq), qavg(abs.map(_._3).toSeq))
    }
    val got = KMeans.silhouette(spark, TestSpark.sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (c, np, mi, mo, ms) =>
      val (en, ea, eb, es) = expect(c)
      assert(np == en, s"cluster $c size")
      assert(mi == ea, s"cluster $c mean_intra")
      assert(mo == eb, s"cluster $c mean_nearest_other")
      assert(ms == es, s"cluster $c mean_silhouette")
      assert(ms >= -1.0 && ms <= 1.0)
    }
    // sizes agree with the registered kmeans table
    val km = KMeans.kmeans(spark, TestSpark.sf)
      .select("cluster", "n_points").distinct()
      .as[(Long, Long)].collect().toMap
    got.foreach { case (c, np, _, _, _) => assert(km(c) == np) }
  }
}
