package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute top-k returns exactly K ranked neighbors per query, no self") {
    val out = Ann.bruteTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == Ann.K)
      assert(rows.map(_._4).sorted.toSeq == (1 to Ann.K))
      assert(!rows.exists(_._2 == q))
      // ranks ordered by (cosine desc, id asc)
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
      }
    }
  }

  test("lsh top-k is a subset of each query's bucket and respects K") {
    val out = Ann.lshTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= Ann.K)
    }
  }

  test("ivf top-k: neighbors come from the query's probed cells only") {
    val out = Ann.ivfTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= Ann.K)
      assert(rows.map(_._4).distinct.length == rows.length)
    }
  }

  test("pq top-k: K coded neighbors per query, ADC distance ordered, deterministic") {
    val out = Ann.pqTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == Ann.K)
      assert(!rows.exists(_._2 == q))
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
        case _ => ()
      }
    }
    val again = Ann.pqTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(again == out.toSet, "fixed codebook ⇒ bit-identical reruns")
  }

  test("two-phase brute top-k equals single-phase (salting loses nothing)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") % Ann.QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val single = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", graft.core.VectorLsh.cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= Ann.K)
      .select("q_id", "vec_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val twoPhase = Ann.bruteTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(twoPhase == single)
  }

  test("refine rerank: true cosines, and recall@K never below the " +
    "unrefined IVF-PQ") {
    val brute = Ann.bruteTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfpq = Ann.ivfpqTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ref = Ann.refineRerank(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    val refSets = ref.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = brute.toSeq.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
      }
      hits.sum / hits.size
    }
    // reranking a 3K-deep shortlist by EXACT cosine can only reorder
    // candidates toward the truth: on this fixed dataset the recall
    // relation is deterministic and must hold
    assert(recall(refSets) >= recall(ivfpq),
      s"refine recall ${recall(refSets)} < ivfpq recall ${recall(ivfpq)}")
    // every reranked list: K rows, ordered by true cosine
    ref.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == Ann.K)
      assert(!rows.exists(_._2 == q))
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
      }
    }
  }

  test("knn graph: mutual edges only, within-cell, bounded degree") {
    import org.apache.spark.sql.functions._
    val g = Ann.knnGraph(spark, TestSpark.sf).cache()
    val edges = g.as[(Long, Long, Double)].collect()
    assert(edges.nonEmpty)
    assert(edges.forall(e => e._1 < e._2), "edges must be canonical src<dst")
    assert(edges.map(e => (e._1, e._2)).distinct.length == edges.length)
    // mutual-kNN degree bound: each node appears in ≤ K surviving edges
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length)
    assert(deg.values.forall(_ <= Ann.KnnK), "degree exceeds K")
    assert(edges.forall(e => e._3 >= -1.0000001 && e._3 <= 1.0000001))
    g.unpersist()
  }

  test("semantic clusters: total fixed-point mapping, strong edges " +
    "intra-cluster, reps are minima") {
    import org.apache.spark.sql.functions._
    val m = Ann.semanticClusters(spark, TestSpark.sf).cache()
    val nVec = graft.core.Tables.embeddings(spark, TestSpark.sf).count()
    assert(m.count() == nVec, "mapping must cover every vector")
    // cluster ids are themselves mapped to themselves (fixed point)
    assert(m.join(m.select(col("vec_id").as("cluster_id"),
        col("cluster_id").as("c2")), "cluster_id")
      .filter(col("cluster_id") =!= col("c2")).count() == 0)
    // every strong edge is intra-cluster
    val strong = Ann.knnGraph(spark, TestSpark.sf)
      .filter(col("cosine") >= Ann.SemTau)
    assert(strong
      .join(m.select(col("vec_id").as("src"), col("cluster_id").as("cs")), "src")
      .join(m.select(col("vec_id").as("dst"), col("cluster_id").as("cd")), "dst")
      .filter(col("cs") =!= col("cd")).count() == 0)
    // a rep is its cluster's min member; clustering must shrink the set
    assert(m.groupBy("cluster_id").agg(min("vec_id").as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count() == 0)
    assert(m.filter(col("is_rep")).count() < nVec)
    m.unpersist()
  }

  test("kmeans: full partition, per-cluster dims complete, means bounded") {
    val out = KMeans.kmeans(spark, TestSpark.sf)
      .as[(Int, Int, Double, Long)].collect()
    val nVecs = graft.core.Tables.embeddings(spark, TestSpark.sf).count()
    val byCluster = out.groupBy(_._1)
    assert(byCluster.nonEmpty && byCluster.size <= KMeans.K)
    byCluster.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0 until KMeans.D)) // every dim
      assert(rows.map(_._4).distinct.length == 1)               // one size
    }
    // every vector assigned to exactly one cluster
    assert(byCluster.values.map(_.head._4).sum == nVecs)
    // a mean of unit-ish embeddings stays within the data's value range
    out.foreach { case (_, _, c, _) => assert(math.abs(c) <= 1.0) }
  }
  test("int8 quantization: codes bounded, error within the absmax bound") {
    val rows = Quantize.int8(spark, TestSpark.sf)
      .select("qscale", "code_min", "code_max", "sse")
      .as[(Double, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, lo, hi, sse) =>
      assert(lo >= -127 && hi <= 127, "codes stay in the int8 symmetric range")
      assert(hi > 0 || lo < 0, "some dimension reaches a nonzero code")
      // each dim's error is <= qscale/2 (round-to-nearest), plus the
      // 1e-12 quantization grid of the error sum itself
      assert(sse <= Quantize.D * (s / 2) * (s / 2) + 1e-9)
    }
  }
  test("PCA power iteration: unit direction, captures more variance than v0") {
    import org.apache.spark.sql.functions._
    val out = Pca.pcaPower(spark, TestSpark.sf).cache()
    val norm2 = out.agg(sum(col("pc") * col("pc"))).head().getDouble(0)
    // unit up to the scale-4 norm quantization (u² summed on the 1e-4 grid)
    assert(math.abs(norm2 - 1.0) < 1e-5, "principal direction is unit-norm")
    assert(out.select("lam").head().getDouble(0) > 0)
    val pc = out.orderBy("i").select("pc").as[Double].collect()
    val v0n = {
      val n = math.sqrt(Pca.V0.map(x => x * x).sum)
      Pca.V0.map(_ / n)
    }
    // variance captured along the iterated direction must beat the start
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select(transform(col("embedding"), _.cast("double")).as("vd"))
    def captured(v: Seq[Double]): Double = emb
      .select(graft.functions.VectorFolds.dotp(col("vd"),
        array(v.map(lit): _*)).as("s"))
      .agg(sum(col("s") * col("s"))).head().getDouble(0)
    assert(captured(pc.toSeq) > captured(v0n))
  }

  test("ABTT: removal reconstructs exactly and kills the common component") {
    import org.apache.spark.sql.functions._
    val out = Pca.abtt(spark, TestSpark.sf).cache()
    val pc = Pca.pcaPower(spark, TestSpark.sf)
      .orderBy("i").select("pc").as[Double].collect()
    // x1 must BE x − proj·u_i (two correctly-rounded ops, bit-exact)
    val badRecon = out.filter(
      col("x1") =!= col("x") - col("proj") * element_at(
        array(pc.toSeq.map(lit): _*), col("i") + 1)).count()
    assert(badRecon == 0)
    // after removal, every vector's projection on u collapses: the
    // residual is proj·(1 − ‖u‖²), and ‖u‖ is unit up to the scale-4
    // norm grid ⇒ |proj'| ≤ |proj|·1e-4-ish. Check the corpus-wide max.
    val resid = out.groupBy("vec_id")
      .agg(sum(col("x1") * element_at(array(pc.toSeq.map(lit): _*),
        col("i") + 1)).as("p1"),
        max(abs(col("proj"))).as("p0"))
      .agg(max(abs(col("p1"))).as("mp1"), max(col("p0")).as("mp0"))
      .head()
    assert(resid.getDouble(0) < 1e-3 * math.max(1.0, resid.getDouble(1)),
      s"common component survives: ${resid.getDouble(0)} vs proj ${resid.getDouble(1)}")
    out.unpersist()
  }

  test("recall report: hits recompute against the truth set and the ladder ordering holds") {
    import org.apache.spark.sql.functions._
    val truth = Ann.bruteTopK(spark, TestSpark.sf)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val nQueries = truth.map(_._1).size
    val got = Ann.recallReport(spark, TestSpark.sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet ==
      Set("lsh", "ivf", "pq", "pq_trained", "ivfpq", "ivfpq_refined"))
    // independent recompute of one variant's hit count
    val lshHits = Ann.lshTopK(spark, TestSpark.sf)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .count(truth.contains)
    assert(got("lsh")._2 == lshHits)
    got.foreach { case (v, (q, hits, rec)) =>
      assert(q == nQueries)
      assert(hits >= 0 && hits <= q * Ann.K)
      assert(rec == hits.toDouble / (q * Ann.K))
    }
    // the ladder's measured ordering: exact-residency IVF dominates the
    // compressed tiers, and the exact re-rank never hurts the shortlist
    assert(got("ivf")._3 >= got("ivfpq")._3)
    assert(got("ivfpq_refined")._3 >= got("ivfpq")._3)
    assert(got("ivf")._3 >= 0.9, "IVF scans true vectors in probed cells")
    // the Lloyd sweep is worth running: trained codes beat the hash seeds
    assert(got("pq_trained")._3 > got("pq")._3,
      s"training must lift PQ recall (${got("pq")._3} -> ${got("pq_trained")._3})")
  }

  test("trained PQ: K ranked rows per query, ADC-ordered, codebook actually moved") {
    import org.apache.spark.sql.functions._
    val out = Ann.pqTrainedTopK(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == Ann.K)
      assert(rows.map(_._4).sorted.toSeq == (1 to Ann.K))
      assert(!rows.exists(_._2 == q))
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
      }
    }
    // training must change the serving result, not just recompute #59
    val untrained = Ann.pqTopK(spark, TestSpark.sf)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val trained = out.map(r => (r._1, r._2)).toSet
    assert(trained != untrained, "swept codebook must re-rank some query")
  }

  test("mmr: the greedy selection equals a driver recompute over the " +
      "brute candidates, and diversification genuinely reorders") {
    import spark.implicits._
    val cands = Ann.bruteTopK(spark, TestSpark.sf)
      .select($"q_id", $"vec_id", $"cosine")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val vecs = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def fold(f: Int => Double) = (0 until a.length)
        .foldLeft(0.0)((acc, i) => acc + f(i))
      fold(i => a(i) * b(i)) /
        (math.sqrt(fold(i => a(i) * a(i))) *
          math.sqrt(fold(i => b(i) * b(i))))
    }
    val expect = cands.toSeq.flatMap { case (q, rel) =>
      var selected = Vector.empty[(Long, Double, Double)]
      (1 to Ann.MmrK).foreach { _ =>
        val remaining = rel.keySet -- selected.map(_._1)
        val scored = remaining.toSeq.map { d =>
          val mmr = if (selected.isEmpty) rel(d)
            else 0.5 * rel(d) - 0.5 * selected
              .map(s => cos(vecs(d), vecs(s._1))).max
          (d, rel(d), mmr)
        }
        val pick = scored.minBy(r => (-r._3, r._1))
        selected :+= pick
      }
      selected.zipWithIndex.map { case ((d, r, m), i) =>
        (q, i + 1, d, r, m)
      }
    }.sortBy(r => (r._1, r._2))
    val got = Ann.mmrRerank(spark, TestSpark.sf)
      .as[(Long, Int, Long, Double, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == expect, "MMR selection differs from the driver greedy")
    // diversification must bite: for some query the MMR list is not
    // just the top-3 by relevance
    val top3 = cands.view.mapValues(_.toSeq.sortBy(r => (-r._2, r._1))
      .take(Ann.MmrK).map(_._1).toSet).toMap
    assert(got.groupBy(_._1).exists { case (q, rows) =>
      rows.map(_._3).toSet != top3(q)
    }, "MMR should reorder at least one query's head")
  }
}
