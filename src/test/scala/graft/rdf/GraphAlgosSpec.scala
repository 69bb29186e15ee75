package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PageRank invariants beyond the oracle's row-compare. */
class GraphAlgosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val pr = GraphAlgos.pagerank(spark, TestSpark.sf).cache()

  test("ranks are positive and sum to 1 (up to quantization loss)") {
    val row = pr.agg(sum("pr").as("total"), min("pr").as("lo")).head()
    assert(row.getDouble(1) > 0.0, "every rank must be strictly positive")
    // each decSum group floors to the 1e-12 grid, so the total drifts by
    // at most #nodes·1e-12 per iteration — far inside 1e-6 at test SFs
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-6)
  }

  test("high in-degree sinks (nations) outrank the uniform baseline") {
    val n = pr.count()
    val uniform = 1.0 / n
    // nation entities absorb rank from every customer and supplier;
    // after 3 iterations each must sit above the uniform start
    val nations = Dict.entities(spark, TestSpark.sf)
      .filter(col("uri").startsWith("n:"))
      .join(pr, "id")
    assert(nations.filter(col("pr") <= uniform).count() == 0)
  }
  test("iterate-to-ε converged mode is fixed-point consistent with the " +
    "unrolled form") {
    // eps=0 forces exactly maxIters steps: 3 steps of the converged path
    // must reproduce the unrolled-3 oracle query bit-for-bit (same
    // quantized algebra, so each step is a deterministic function of the
    // previous vector regardless of partitioning or lineage shape)
    val (pr3, k3) = GraphAlgos.pagerankConverged(spark, TestSpark.sf,
      eps = 0.0, maxIters = 3)
    assert(k3 == 3)
    assert(pr3.join(pr.withColumnRenamed("pr", "expect"), "id")
      .filter(col("pr") =!= col("expect")).count() == 0,
      "converged-mode pr_3 must equal the unrolled pr_3 exactly")
    // real convergence: PageRank's L1 delta contracts like d^k = 0.85^k,
    // so eps must be reachable in a test-sized iteration budget (1e-4 ≈
    // 40-60 rounds; 1e-9 would need ~120 PLUS sit at the N·1e-12
    // quantization-grid floor). The stop criterion itself asserts the
    // last step moved the vector by < eps; mass must still sum to 1.
    val eps = 1e-4
    val (prC, kC) = GraphAlgos.pagerankConverged(spark, TestSpark.sf,
      eps = eps, maxIters = 100)
    assert(kC < 100, s"did not converge in 100 iterations")
    assert(kC > 3, "test graph should need more than 3 iterations to " +
      s"reach eps=$eps, else the unrolled form already converged")
    assert(math.abs(prC.agg(sum("pr")).head.getDouble(0) - 1.0) < 1e-6)
  }

  test("personalized PageRank: mass conserved, concentrated on the " +
    "seed-reachable subgraph") {
    val ppr = GraphAlgos.ppr(spark, TestSpark.sf).cache()
    val total = ppr.agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
    val ent = Dict.entities(spark, TestSpark.sf)
    // seeds (nations) and their only out-neighbors (regions) hold ALL
    // the mass: nothing else is reachable from the seed set
    val reach = ent.filter(col("uri").startsWith("n:") ||
        col("uri").startsWith("r:"))
      .join(ppr, "id").agg(sum("pr")).head().getDouble(0)
    assert(math.abs(reach - total) < 1e-12)
    val unreachable = ent.filter(col("uri").startsWith("o:"))
      .join(ppr, "id").filter(col("pr") =!= 0.0).count()
    assert(unreachable == 0, "orders are unreachable from nation seeds")
  }

  test("wcc: converged labels are a true component labeling; unrolled-3 " +
    "is the distance-3 min") {
    val e = GraphAlgos.undirected(spark, TestSpark.sf).cache()
    val (conv, k) = GraphAlgos.wccConverged(spark, TestSpark.sf)
    assert(k < 50, "did not reach the fixpoint in 50 rounds")
    val convC = conv.cache()
    // fixpoint: one more step must not move any label
    assert(GraphAlgos.wccStep(convC, e)
      .join(convC.withColumnRenamed("lbl", "expect"), "id")
      .filter(col("lbl") =!= col("expect")).count() == 0)
    // every edge is intra-component
    val lblOf = convC
    assert(e.join(lblOf.withColumnRenamed("id", "src")
        .withColumnRenamed("lbl", "ls"), "src")
      .join(lblOf.withColumnRenamed("id", "dst")
        .withColumnRenamed("lbl", "ld"), "dst")
      .filter(col("ls") =!= col("ld")).count() == 0,
      "an edge crosses two components")
    // each label is its component's min id (and total: one label per node)
    val nEnt = Dict.entities(spark, TestSpark.sf).count()
    assert(convC.count() == nEnt)
    assert(convC.groupBy("lbl").agg(min("id").as("mn"))
      .filter(col("lbl") =!= col("mn")).count() == 0,
      "a component's label is not its min id")
    // the unrolled-3 registered query is monotone toward the fixpoint
    val w3 = GraphAlgos.wcc(spark, TestSpark.sf)
    assert(w3.join(convC.withColumnRenamed("lbl", "fix"), "id")
      .filter(col("lbl") < col("fix")).count() == 0,
      "3-round label below the component min")
    convC.unpersist(); e.unpersist()
  }

  test("triangles: degree orientation counts exactly what a<b<c counts, " +
    "and the sqrt(2m) fan-out bound holds") {
    val row = GraphAlgos.triangles(spark, TestSpark.sf).head()
    val (nEdges, nWedges, nTri, gcc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    assert(nTri > 0, "co-purchase graph must contain triangles")
    assert(gcc > 0.0 && gcc <= 1.0)
    // independent recount via the naive a<b<c formulation in Spark
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e2 = li.as("x").join(li.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct().cache()
    assert(e2.count() == nEdges)
    val naive = e2.as("e1")
      .join(e2.as("e2"), col("e1.b") === col("e2.a"))
      .join(e2.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(naive == nTri,
      s"orientation changed the count: naive=$naive oriented=$nTri")
    e2.unpersist()
    // the Suri–Vassilvitskii bound: max oriented out-degree² ≤ 2m
    val (maxOut, m) = GraphAlgos.triangleDegBound(spark, TestSpark.sf)
    assert(maxOut * maxOut <= 2 * m,
      s"fan-out bound violated: maxOut=$maxOut m=$m")
  }

  test("degree distribution: each direction partitions the entity set, " +
    "and degree mass equals the edge count") {
    import org.apache.spark.sql.functions._
    val dd = GraphAlgos.degreeDist(spark, TestSpark.sf).cache()
    val nEnt = Dict.entities(spark, TestSpark.sf).count()
    val nEdges = Dict.encodedTriples(spark, TestSpark.sf)
      .select("sid", "oid").distinct().count()
    Seq("out", "in").foreach { dir =>
      val side = dd.filter(col("direction") === dir)
      assert(side.agg(sum("n_entities")).head().getLong(0) == nEnt,
        s"$dir histogram does not partition the entity set")
      assert(side.agg(sum(col("degree") * col("n_entities"))).head()
        .getLong(0) == nEdges, s"$dir degree mass ≠ edge count")
    }
    dd.unpersist()
  }

  test("link prediction: no existing edges, and a driver recount of " +
    "every query's cn/aa scores matches exactly") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val lp = GraphAlgos.linkpred(spark, TestSpark.sf).cache()
    assert(lp.filter(col("q") % GraphAlgos.LpQMod =!= 0).isEmpty)
    assert(lp.filter(col("cn") < 2).isEmpty)
    assert(lp.filter(col("aa") <= 0).isEmpty)
    // rebuild the co-purchase graph driver-side and recount every score
    val edges = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap(b => { val ps = b.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j)) })
      .toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val expected = (for {
      (q, nq) <- nbrs.toSeq if q % GraphAlgos.LpQMod == 0
      w <- nq.flatMap(nbrs(_)) if w != q
    } yield (q, w)).distinct
      .map { case (q, w) =>
        val common = nbrs(q) & nbrs(w)
        val aa = common.toSeq.map(v => math.floor(
          q9(1.0 / math.log(nbrs(v).size.toDouble)) * 1e9 + 0.5)).sum / 1e9
        ((q, w), (common.size.toLong, aa))
      }
      .filter { case ((q, w), (cn, _)) =>
        cn >= 2 && !edges(if (q < w) (q, w) else (w, q)) }.toMap
    val got = lp.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    for ((p, v) <- expected) assert(got(p) == v, s"pair $p")
    lp.unpersist()
  }

  test("random walks: driver simulation reproduces the whole walk corpus") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val w = GraphAlgos.walks(spark, TestSpark.sf).cache()
    // step 0 = every entity, once
    val ents = graft.rdf.Dict.entities(spark, TestSpark.sf)
      .select("id").collect().map(_.getLong(0))
    assert(w.filter(col("step") === 0).count() == ents.length)
    // driver-side simulation with the same hash rule
    val adj = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
      .select("sid", "oid").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    val expected = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
    for (seed <- ents) {
      var cur = seed
      expected += ((seed, 0, seed))
      var k = 1
      var alive = true
      while (alive && k <= GraphAlgos.WalkLen) {
        adj.get(cur) match {
          case Some(ns) =>
            val h = graft.core.PortableHash.pHashJvm(s"wk${seed}_$k")
            cur = ns((h % ns.length).toInt) // pHash is non-negative
            expected += ((seed, k, cur)); k += 1
          case None => alive = false
        }
      }
    }
    val got = w.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == expected.toSet)
    assert(got.length == expected.length)
    // the walks actually disperse: many distinct step-1 nodes
    assert(w.filter(col("step") === 1).select("node").distinct().count() > 10)
    w.unpersist()
  }

  test("bfs: converged distances are true shortest paths; unrolled-3 is " +
    "its radius-3 truncation") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val d = GraphAlgos.bfsConverged(spark, TestSpark.sf).cache()
    val seeds = graft.rdf.Dict.entities(spark, TestSpark.sf)
      .filter(col("uri").startsWith("n:")).select("id")
    // seeds at 0, and ONLY seeds at 0
    assert(d.filter(col("dist") === 0).count() == seeds.count())
    assert(d.filter(col("dist") === 0).join(seeds, "id").count() == seeds.count())
    assert(d.filter(col("dist") < 0).isEmpty)
    // shortest-path certificate on the raw graph: every edge relaxed
    // (d(dst) <= d(src)+1 where both reached; a reached src never has
    // an unreached neighbor at the fixpoint)
    val e = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
    val ue = e.select(col("sid").as("src"), col("oid").as("dst"))
      .unionByName(e.select(col("oid").as("src"), col("sid").as("dst"))).distinct()
    val ds = d.withColumnRenamed("id", "src").withColumnRenamed("dist", "d_src")
    val dd = d.withColumnRenamed("id", "dst").withColumnRenamed("dist", "d_dst")
    val joined = ue.join(ds, Seq("src"), "left").join(dd, Seq("dst"), "left")
    assert(joined.filter(col("d_src").isNotNull && col("d_dst").isNull).isEmpty)
    assert(joined.filter(col("d_dst") > col("d_src") + 1).isEmpty)
    // every reached non-seed has a witness predecessor at d-1
    val witness = joined.filter(col("d_dst") === col("d_src") + 1)
      .select(col("dst").as("id")).distinct()
    assert(d.filter(col("dist") > 0).join(witness, Seq("id"), "left_anti").isEmpty)
    // the registered query is exactly the radius-3 truncation
    val pre = GraphAlgos.bfs(spark, TestSpark.sf)
    assert(pre.exceptAll(d.filter(col("dist") <= GraphAlgos.BfsIters)).isEmpty)
    assert(d.filter(col("dist") <= GraphAlgos.BfsIters).exceptAll(pre).isEmpty)
    d.unpersist()
  }

  test("k-core: converged fixpoint is the true k-core (every survivor " +
    "keeps >= k core neighbors, every peeled vertex has < k — maximality)") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val core = GraphAlgos.kcoreConverged(spark, TestSpark.sf).cache()
    // inner-subgraph degree bound: coreDegrees already measures degree
    // INSIDE the surviving subgraph
    assert(core.filter(col("degree") < GraphAlgos.CoreK).isEmpty)
    // maximality, checked independently on the raw graph: count each
    // peeled vertex's neighbors that are IN the core — must be < k
    val coreSet = core.select(col("v"))
    val e = graft.rdf.Dict.encodedTriples(spark, TestSpark.sf)
    val ue = e.select(col("sid").as("src"), col("oid").as("dst"))
      .unionByName(e.select(col("oid").as("src"), col("sid").as("dst"))).distinct()
    val peeled = ue.select(col("src").as("v")).distinct()
      .join(coreSet, Seq("v"), "left_anti")
    val inCoreNbrs = ue
      .join(coreSet.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src").as("v")).agg(count(lit(1)).as("d_core"))
    assert(peeled.join(inCoreNbrs, Seq("v"), "left")
      .filter(coalesce(col("d_core"), lit(0L)) >= GraphAlgos.CoreK).isEmpty)
    // peeling actually bites: the 3-round prefix removes vertices
    val pre = GraphAlgos.kcore(spark, TestSpark.sf).cache()
    val nVerts = ue.select("src").distinct().count()
    assert(pre.count() < nVerts)
    // prefix soundness: never peels a core vertex, and once the counts
    // agree the prefix IS the fixpoint (degrees and all)
    assert(coreSet.join(pre.select("v"), Seq("v"), "left_anti").isEmpty)
    assert(core.count() <= pre.count())
    if (core.count() == pre.count())
      assert(core.exceptAll(pre).isEmpty && pre.exceptAll(core).isEmpty)
    pre.unpersist()
    core.unpersist()
  }

  test("assortativity: moments equal a driver recompute and the sign is the hub-spoke diagnosis") {
    import spark.implicits._
    val enc = Dict.encodedTriples(spark, TestSpark.sf)
      .select(col("sid"), col("oid")).as[(Long, Long)].collect()
    val und = (enc ++ enc.map { case (s, o) => (o, s) }).distinct
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m = und.length.toLong
    val s1 = und.iterator.map { case (u, _) => deg(u) }.sum
    val sxy = und.iterator.map { case (u, v) => deg(u) * deg(v) }.sum
    val sxx = und.iterator.map { case (u, _) => deg(u) * deg(u) }.sum
    val out = GraphAlgos.assortativity(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (gm, gs1, gsxy, gsxx, r) = out.head
    assert((gm, gs1, gsxy, gsxx) == ((m, s1, sxy, sxx)))
    assert(r == (m.toDouble * sxy.toDouble - s1.toDouble * s1.toDouble) /
      (m.toDouble * sxx.toDouble - s1.toDouble * s1.toDouble))
    // the TPC-H graph is hub-spoke (orders/customers fan into nation and
    // region hubs): hubs link to leaves, so r must be strongly negative
    assert(r < -0.05 && r > -1.0, s"hub-spoke graph should disassort, r=$r")
  }

  test("closeness: sampled harmonic centrality equals a driver BFS from " +
      "the same seeds, and hubs outrank leaves") {
    import spark.implicits._
    val enc = Dict.encodedTriples(spark, TestSpark.sf)
      .select(col("sid"), col("oid")).as[(Long, Long)].collect()
    val adj = (enc ++ enc.map { case (s, o) => (o, s) }).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Dict.entities(spark, TestSpark.sf)
      .select(col("id"), col("uri")).as[(Long, String)].collect()
      .map { case (id, uri) =>
        (graft.core.PortableHash.pHashJvm(s"close|$uri"), uri, id) }
      .sorted.take(GraphAlgos.CloseSeeds).map(_._3)
    // driver BFS per seed, truncated at CloseIters hops
    def bfsFrom(s: Long): Map[Long, Int] = {
      var dist = Map(s -> 0)
      var frontier = Set(s)
      for (d <- 1 to GraphAlgos.CloseIters) {
        frontier = frontier.flatMap(f => adj.getOrElse(f, Array.empty[Long]))
          .filterNot(k => dist.contains(k))
        dist ++= frontier.map(_ -> d)
      }
      dist
    }
    val perSeed = seeds.map(bfsFrom)
    val expect = perSeed.flatMap(_.toSeq).filter(_._2 > 0)
      .groupBy(_._1).view.mapValues { hits =>
        val hnum = hits.map(h => 12L / h._2).sum
        (hits.length.toLong, hnum, hnum.toDouble / 12.0)
      }.toMap
    val got = GraphAlgos.closeness(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == expect)
    // hub sanity: some entity reaches all 8 seeds within the horizon
    assert(got.values.exists(_._1 == GraphAlgos.CloseSeeds.toLong),
      "the hub-spoke graph should put some node within 4 hops of all seeds")
  }

  test("hits: quantized mutual reinforcement equals a driver recompute, " +
      "and the structural hub/authority split shows") {
    import spark.implicits._
    val edges = Dict.encodedTriples(spark, TestSpark.sf)
      .select(col("sid"), col("oid")).distinct()
      .as[(Long, Long)].collect()
    val ids = Dict.entities(spark, TestSpark.sf)
      .select("id").as[Long].collect()
    def q12(v: Double) = math.floor(v * 1e12 + 0.5) / 1e12
    def dsum(vs: Iterable[Double]) =
      vs.map(v => math.floor(v * 1e12 + 0.5).toLong).sum.toDouble / 1e12
    def normalize(raw: Map[Long, Double]): Map[Long, Double] = {
      val z = dsum(raw.values)
      raw.map { case (k, v) => k -> q12(v / z) }
    }
    var h = ids.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    (1 to GraphAlgos.HitsIters).foreach { _ =>
      val ar = edges.groupBy(_._2).view
        .mapValues(g => dsum(g.map(e => h(e._1)))).toMap
      a = normalize(ids.map(i => i -> ar.getOrElse(i, 0.0)).toMap)
      val hr = edges.groupBy(_._1).view
        .mapValues(g => dsum(g.map(e => a(e._2)))).toMap
      h = normalize(ids.map(i => i -> hr.getOrElse(i, 0.0)).toMap)
    }
    val arf = edges.groupBy(_._2).view
      .mapValues(g => dsum(g.map(e => h(e._1)))).toMap
    val af = normalize(ids.map(i => i -> arf.getOrElse(i, 0.0)).toMap)
    val got = GraphAlgos.hits(spark, TestSpark.sf)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == ids.toSet)
    got.foreach { case (id, (hub, auth)) =>
      assert(hub == h(id) && auth == af(id), s"node $id drifted")
    }
    // structural split: order nodes (o:) are pure hubs (authority 0),
    // nation nodes (n:) are strong authorities with zero hub score
    val uris = Dict.entities(spark, TestSpark.sf)
      .select("id", "uri").as[(Long, String)].collect().toMap
    val orders = got.filter { case (id, _) => uris(id).startsWith("o:") }
    val parts = got.filter { case (id, _) => uris(id).startsWith("p:") }
    assert(orders.nonEmpty && orders.values.forall(_._2 == 0.0),
      "nothing points at an order: authority must be exactly 0")
    assert(parts.nonEmpty && parts.values.forall(_._1 == 0.0),
      "parts have no out-edges: hub must be exactly 0")
    assert(orders.values.exists(_._1 > 0.0) && parts.values.exists(_._2 > 0.0))
  }

  /** Driver-side Tarjan for SCC ground truth. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var idx = 0
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val comps = scala.collection.mutable.Buffer[Set[Long]]()
    def strong(v: Long): Unit = {
      index(v) = idx; low(v) = idx; idx += 1
      stack.push(v); onStack += v
      adj.getOrElse(v, Nil).foreach { w =>
        if (!index.contains(w)) { strong(w); low(v) = low(v) min low(w) }
        else if (onStack(w)) low(v) = low(v) min index(w)
      }
      if (low(v) == index(v)) {
        val comp = scala.collection.mutable.Set[Long]()
        var w = -1L
        while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
        comps += comp.toSet
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strong(v))
    comps.flatMap(c => c.map(_ -> c)).toMap
  }

  test("scc: containment-graph components equal Tarjan, all settled, " +
      "sizes consistent, and version groups (size ≥ 2) exist") {
    import spark.implicits._
    val edges = graft.dedup.Dedup.containmentJoin(spark, TestSpark.sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
    val truth = tarjan(edges)
    val got = GraphAlgos.scc(spark, TestSpark.sf)
      .as[(Long, Option[Long], Option[Long], Option[Int])].collect()
    assert(got.length == truth.size, "one row per incident node")
    got.foreach { case (doc, sccId, size, round) =>
      assert(sccId.nonEmpty && round.nonEmpty,
        s"node $doc unsettled after ${GraphAlgos.SccPeels} peels")
      val comp = truth(doc)
      assert(sccId.get == comp.min, s"scc_id of $doc must be min member")
      assert(size.get == comp.size.toLong, s"scc_size of $doc")
      assert(round.get >= 1 && round.get <= GraphAlgos.SccPeels)
    }
    assert(got.exists(_._3.get >= 2L), "mutual-containment version groups")
    assert(got.exists(_._3.get == 1L), "one-directional nodes stay single")
  }

  test("scc: FW-BW peeling handles non-mutual cycles and full peel " +
      "depth on a synthetic 3-cycle + diamond + chain") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),             // 3-cycle, no mutual pair
      (5L, 10L), (5L, 11L), (10L, 4L), (11L, 4L), // diamond: 3 peel rounds
      (8L, 7L), (7L, 6L),                        // chain: 3 peel rounds
      (20L, 21L), (21L, 20L))                    // mutual pair
    val truth = tarjan(edges)
    val got = GraphAlgos.sccOf(edges.toDF("src", "dst"))
      .as[(Long, Option[Long], Option[Long], Option[Int])].collect()
    assert(got.length == truth.size)
    got.foreach { case (v, sccId, size, round) =>
      assert(sccId.contains(truth(v).min) &&
        size.contains(truth(v).size.toLong), s"node $v")
      assert(round.nonEmpty)
    }
    // the diamond and chain genuinely need all three peels
    assert(got.exists(_._4.contains(GraphAlgos.SccPeels)),
      "peel depth must be exercised")
    assert(truth(1L) == Set(1L, 2L, 3L) && truth(20L) == Set(20L, 21L))
  }

  test("katz: walk counts equal the brute enumeration, score is the " +
      "exact dyadic combination, and katz diverges from pagerank") {
    import spark.implicits._
    val edges = Dict.encodedTriples(spark, TestSpark.sf)
      .select($"sid", $"oid").distinct().as[(Long, Long)].collect()
    val inTo: Map[Long, Seq[Long]] =
      edges.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val nodes = Dict.entities(spark, TestSpark.sf)
      .select($"id").as[Long].collect()
    var p = nodes.map(_ -> 1L).toMap
    val walks = (1 to GraphAlgos.KatzIters).map { _ =>
      p = nodes.map(v =>
        v -> inTo.getOrElse(v, Seq.empty[Long])
          .map(u => p.getOrElse(u, 0L)).sum).toMap
      p
    }
    val got = GraphAlgos.katz(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == nodes.length)
    got.foreach { case (id, p1, p2, p3, k) =>
      assert(p1 == walks(0)(id) && p2 == walks(1)(id) && p3 == walks(2)(id),
        s"walk counts of $id")
      assert(k == (p1 * 16L + p2 * 4L + p3).toDouble / 64.0)
    }
    // the measure must DIFFER from pagerank's rationed flow: the two
    // top-20 node sets are not identical
    val kTop = got.sortBy(r => (-r._5, r._1)).take(20).map(_._1).toSet
    val prTop = GraphAlgos.pagerank(spark, TestSpark.sf)
      .select($"id", $"pr").as[(Long, Double)].collect()
      .sortBy(r => (-r._2, r._1)).take(20).map(_._1).toSet
    assert(kTop != prTop, "katz should rank differently from pagerank")
  }

  test("walk pairs: the skip-gram table equals a driver window-pair " +
      "recompute over the deterministic walks; symmetric; counts " +
      "conserve the pair-slot budget") {
    import spark.implicits._
    val w = GraphAlgos.walks(spark, TestSpark.sf)
      .select($"walk_id", $"step", $"node")
      .as[(Long, Int, Long)].collect()
    val byWalk: Map[Long, Seq[(Long, Int, Long)]] =
      w.groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val expect = byWalk.values.toSeq.flatMap { steps =>
      for {
        a <- steps; b <- steps
        if a._2 != b._2 && math.abs(a._2 - b._2) <= GraphAlgos.WalkWin
      } yield (a._3, b._3)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphAlgos.walkPairs(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expect, "pair table differs from driver recompute")
    // skip-gram symmetry: (a, b) and (b, a) carry equal weight
    assert(got.forall { case ((a, b), n) => got((b, a)) == n })
    // slot conservation: total pair slots = Σ per-walk ordered pairs
    val slots = byWalk.values.map { steps =>
      steps.map(a => steps.count(b => a._2 != b._2 &&
        math.abs(a._2 - b._2) <= GraphAlgos.WalkWin)).sum.toLong
    }.sum
    assert(got.values.sum == slots)
  }
}
