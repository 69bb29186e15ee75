package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables, VectorLsh}

/** Approximate-nearest-neighbor search over the `embeddings` table:
  * exact brute-force top-k (the baseline) and hyperplane-LSH-bucketed
  * top-k (the scale path).
  *
  * LLM-pipeline block (mandated by the build brief).
  *
  * 100 TB design:
  *  - the query set is small and BROADCAST; the data side is scanned once;
  *  - brute-force top-k is two-phase: per-salt top-k (distributed heaps,
  *    k·S rows survive per query) then global top-k of the survivors — no
  *    global sort, and the per-query shuffle moves only k·S rows, not N;
  *  - the LSH variant joins query buckets to data buckets (16 buckets
  *    here; 2^P scales with plane count) before scoring — candidates per
  *    query drop ~2^P-fold at the cost of recall;
  *  - ties broken by vec_id: total order, no flaky results.
  */
object Ann {

  val K = 10
  val QueryMod = 100
  val NSalt = 32

  private[ann] def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** #29: exact top-k cosine neighbors for each query vector. The
    * candidate stream collapses through [[graft.functions.TopK]]'s
    * K-bounded heap aggregate (round 9) — a hash aggregate whose
    * map-side partial phase IS the distributed heap (one per input
    * partition, K rows each cross the wire), replacing the two-phase
    * salted-WINDOW formulation that shuffle-sorted every candidate
    * row. Kept set and ranking identical (K largest under
    * (cosine desc, vec_id asc)), so the oracle is unchanged.
    */
  /** Derived-tier cache for the exact ranking (r11, VERDICT r10 item
    * 8): #29 is also the TRUTH of #180's recall report — as separate
    * subtrees each invocation of either query re-paid the full
    * N·|Q|/QueryMod scoring pass. The K·|Q|-row result is cached once
    * per session (lazy localCheckpoint truncates consumers' plans; the
    * bench's cold legs still recompute via clearDerived).
    */
  private val bruteCache = new graft.core.DfCache[(SparkSession, String)]

  def bruteTopK(spark: SparkSession, dir: String): DataFrame =
    bruteCache.getOrElseUpdate((spark, dir)) {
      val e = vecs(spark, dir)
      val q = e.filter(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
        .groupBy("q_id")
        .agg(graft.functions.TopK.topkMax(col("cosine"), col("vec_id"), K)
          .as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
        .select(col("q_id"), col("s.id").as("vec_id"),
          col("s.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
        .localCheckpoint(false)
    }

  val bruteTopKSql: String =
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), s AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    ${VectorLsh.duckFold("q.v[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) AS cosine
       |  FROM ve q JOIN ve e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id % $QueryMod = 0
       |)
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
       |  FROM s
       |) WHERE rank <= $K""".stripMargin

  /** Derived-tier cache for the serving-tier outputs (r11, VERDICT r10
    * item 8 follow-through): each tier's result is K·|Q| rows, but
    * #180 (recall report) re-executed all six tier pipelines per
    * invocation on top of its truth join — the tiers ARE the serving
    * artifacts, cached once per session exactly like the rank frames.
    * Lazy localCheckpoint inside each build truncates the report's
    * combined plan (6 tier subtrees + truth) to LogicalRDD scans.
    * Bench cold legs recompute everything via clearDerived.
    */
  private val tierCache =
    new graft.core.DfCache[(SparkSession, String, String)]
  private def cachedTier(name: String, spark: SparkSession, dir: String)(
      build: => DataFrame): DataFrame =
    tierCache.getOrElseUpdate((spark, dir, name))(build.localCheckpoint(false))

  /** #30: LSH-bucketed top-k — only candidates sharing the query's
    * hyperplane bucket are scored.
    */
  def lshTopK(spark: SparkSession, dir: String): DataFrame =
    cachedTier("lsh", spark, dir) {
    val e = vecs(spark, dir).withColumn("bucket", VectorLsh.bucket(col("v")))
    val q = e.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMax(col("cosine"), col("vec_id"), K)
        .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  // ------------------------------------------------------------- IVF topk

  val NCells = 8
  val NProbe = 2

  /** Deterministic IVF codebook: NCells dyadic centroid vectors (a real
    * IVF trains these with k-means; a fixed hash-derived codebook keeps
    * the operator oracle-checkable while exercising the identical plan
    * shape — coarse quantize, probe, scan short-lists).
    */
  private[ann] lazy val centroids: Array[Array[Double]] =
    Array.tabulate(NCells, VectorLsh.EmbDim)((c, i) =>
      graft.core.PortableHash.dyadicJvm(s"IVF|$c|$i"))

  /** Squared L2 distance of `v` to centroid c (codebook as literals —
    * zero per-row hash work, pure codegen arithmetic).
    */
  private[ann] def centDist(v: org.apache.spark.sql.Column, c: Int) = {
    val cent = array(centroids(c).map(lit).toSeq: _*)
    graft.functions.VectorFolds.sqDiffSum(v, cent)
  }

  /** Cell assignment = argmin_c dist (ties → smaller c). */
  private[ann] def cellOf(v: org.apache.spark.sql.Column) =
    array_min(array((0 until NCells).map(c =>
      struct(centDist(v, c).as("d"), lit(c).as("c"))): _*)).getField("c")

  /** #38: IVF top-k — queries probe their NProbe nearest cells and scan
    * only those short-lists. The inverted lists are the `cell` column;
    * at 100 TB you'd bucket/partition the table BY cell so a probe is a
    * partition-pruned scan, and train the codebook with distributed
    * k-means over a sample.
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame =
    cachedTier("ivf", spark, dir) {
    val e = vecs(spark, dir).withColumn("cell", cellOf(col("v")))
    val probes = vecs(spark, dir).filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(slice(array_sort(array((0 until NCells).map(c =>
          struct(centDist(col("v"), c).as("d"), lit(c).as("c"))): _*)),
          1, NProbe)).as("p"))
      .select(col("q_id"), col("qv"), col("p.c").as("cell"))
    e.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMax(col("cosine"), col("vec_id"), K)
        .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  val ivfTopKSql: String = {
    val centEl = graft.core.PortableHash.duckDyadic("'IVF|' || c || '|' || (i - 1)")
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents AS MATERIALIZED (
       |  SELECT c, list($centEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $NCells)) AS c),
       |       (SELECT unnest(range(1, ${VectorLsh.EmbDim + 1})) AS i)
       |  GROUP BY c
       |), dists AS MATERIALIZED (
       |  SELECT ve.vec_id, ve.v, cents.c,
       |    ${VectorLsh.duckFold("(v[i] - cv[i]) * (v[i] - cv[i])")} AS d
       |  FROM ve, cents
       |), cells AS MATERIALIZED (
       |  SELECT vec_id, v, c AS cell FROM dists
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
       |), probes AS MATERIALIZED (
       |  SELECT vec_id AS q_id, v AS qv, c AS cell FROM dists
       |  WHERE vec_id % $QueryMod = 0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) <= $NProbe
       |)
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT p.q_id, e.vec_id,
       |    ${VectorLsh.duckFold("p.qv[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("p.qv[i] * p.qv[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p.q_id ORDER BY
       |      ${VectorLsh.duckFold("p.qv[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("p.qv[i] * p.qv[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) DESC,
       |      e.vec_id ASC) AS INT) AS rank
       |  FROM cells e JOIN probes p ON e.cell = p.cell AND e.vec_id <> p.q_id
       |) WHERE rank <= $K""".stripMargin
  }

  // -------------------------------------------------------------- PQ topk

  val PqM = 8      // subspaces
  val PqSubDim = VectorLsh.EmbDim / PqM
  val PqNCent = 8  // centroids per subspace → 3-bit codes

  /** Deterministic PQ codebook: per subspace m, PqNCent dyadic centroids
    * of dimension PqSubDim (seed `PQ|m|c|i`). As with IVF, a real system
    * trains these with k-means per subspace; the fixed codebook keeps the
    * operator oracle-checkable with the identical plan shape.
    */
  private[ann] lazy val pqCent: Array[Array[Array[Double]]] =
    Array.tabulate(PqM, PqNCent, PqSubDim)((m, c, i) =>
      graft.core.PortableHash.dyadicJvm(s"PQ|$m|$c|$i"))

  /** Codebook as ONE flat [m][c][i] array literal: a single constant
    * reference in codegen. The first formulation — 64 per-(m,c) fold
    * expressions — generated an 8 KB+ processNext that HotSpot refused
    * to JIT (whole stage ran interpreted, 2× slower than the HOF form);
    * the compact [[graft.functions.VectorFolds.pqEncode]]/`pqLut` loops
    * JIT fine.
    */
  private[ann] lazy val pqFlatCodebook: Array[Double] =
    pqCent.flatten.flatten

  /** #59: product-quantization top-k with asymmetric distance (ADC).
    * Data vectors are compressed to PqM 3-bit codes (argmin centroid per
    * subspace); queries stay full-precision and carry a PqM×PqNCent
    * distance look-up table; approx distance = Σ_m lut[m][code_m] — a
    * fixed-order 8-term sum of table lookups, no per-candidate vector
    * math at all.
    *
    * The 100 TB story is PQ's whole point: the scanned representation is
    * 3 bytes/vector instead of 512 (170× less IO than a raw scan), codes
    * are computed once at ingest, and the per-candidate cost is M array
    * lookups. Combine with the IVF cells (#38) for IVF-PQ, the standard
    * billion-scale layout.
    */
  def pqTopK(spark: SparkSession, dir: String): DataFrame =
    cachedTier("pq", spark, dir) {
    val vf = graft.functions.VectorFolds
    val cb = lit(pqFlatCodebook)
    val e = vecs(spark, dir)
      .withColumn("codes", vf.pqEncode(col("v"), cb, PqNCent, PqSubDim))
      .select("vec_id", "codes")
    val q = vecs(spark, dir).filter(col("vec_id") % QueryMod === 0)
      .withColumn("lut", vf.pqLut(col("v"), cb, PqNCent, PqSubDim))
      .select(col("vec_id").as("q_id"), col("lut"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("approx_d", vf.pqAdc(col("lut"), col("codes"), PqNCent))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMin(col("approx_d"), col("vec_id"), K)
        .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").as("approx_d"), (col("pos") + 1).cast("int").as("rank"))
  }

  val pqTopKSql: String = {
    val centEl = graft.core.PortableHash.duckDyadic("'PQ|' || m || '|' || c || '|' || (i - 1)")
    val subFold = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${PqSubDim + 1}), i -> " +
      s"(v[(m * $PqSubDim) + i] - cv[i]) * (v[(m * $PqSubDim) + i] - cv[i]))), (acc, x) -> acc + x)"
    val adc = (1 to PqM).map(m => s"lut[$m][codes[$m] + 1]").mkString(" + ")
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents AS MATERIALIZED (
       |  SELECT m, c, list($centEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $PqM)) AS m),
       |       (SELECT unnest(range(0, $PqNCent)) AS c),
       |       (SELECT unnest(range(1, ${PqSubDim + 1})) AS i)
       |  GROUP BY m, c
       |), sd AS MATERIALIZED (
       |  SELECT vec_id, m, c, $subFold AS d
       |  FROM ve, cents
       |), codes AS (
       |  SELECT vec_id, list(code ORDER BY m) AS codes FROM (
       |    SELECT vec_id, m, c AS code FROM sd
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
       |  ) GROUP BY vec_id
       |), luts AS (
       |  SELECT vec_id AS q_id, list(lc ORDER BY m) AS lut FROM (
       |    SELECT vec_id, m, list(d ORDER BY c) AS lc FROM sd
       |    WHERE vec_id % $QueryMod = 0 GROUP BY vec_id, m
       |  ) GROUP BY vec_id
       |)
       |SELECT q_id, vec_id, approx_d, rank FROM (
       |  SELECT q_id, e.vec_id, $adc AS approx_d,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ($adc) ASC, e.vec_id ASC) AS INT) AS rank
       |  FROM codes e JOIN luts q ON e.vec_id <> q.q_id
       |) WHERE rank <= $K""".stripMargin
  }

  // ------------------------------------------------------------- IVF-PQ

  /** #76: IVF-PQ top-k — the composition of #38's coarse cells and
    * #59's product codes, i.e. the standard billion-scale ANN serving
    * layout (FAISS's IVFADC): queries probe their [[NProbe]] nearest
    * cells and scan ONLY those short-lists, and the short-lists hold
    * 3-byte PQ codes, not vectors — per candidate the cost is
    * [[PqM]] LUT lookups over 3 bytes of IO.
    *
    * At 100 TB: the data side (vec_id, cell, codes) is computed once at
    * ingest and partitioned BY cell, so a probe is a partition-pruned
    * scan of compressed codes (NProbe/NCells of the data × 170× smaller
    * rows); the query side broadcasts (q_id, lut, cell) probe rows. The
    * plan here is exactly that: one broadcast-hash join on cell, zero
    * data-side shuffles before the per-query k·heap.
    */
  def ivfpqTopK(spark: SparkSession, dir: String): DataFrame =
    ivfpqRanked(spark, dir, K)

  /** The IVFADC scan with a parameterized shortlist size (kk = [[K]]
    * serves directly; kk = [[Refine]] feeds the exact re-rank stage).
    */
  private def ivfpqRanked(spark: SparkSession, dir: String,
      kk: Int): DataFrame = cachedTier(s"ivfpq$kk", spark, dir) {
    val vf = graft.functions.VectorFolds
    val cb = lit(pqFlatCodebook)
    val e = vecs(spark, dir)
      .withColumn("cell", cellOf(col("v")))
      .withColumn("codes", vf.pqEncode(col("v"), cb, PqNCent, PqSubDim))
      .select("vec_id", "cell", "codes")
    val probes = vecs(spark, dir).filter(col("vec_id") % QueryMod === 0)
      .withColumn("lut", vf.pqLut(col("v"), cb, PqNCent, PqSubDim))
      .select(col("vec_id").as("q_id"), col("lut"),
        explode(slice(array_sort(array((0 until NCells).map(c =>
          struct(centDist(col("v"), c).as("d"), lit(c).as("c"))): _*)),
          1, NProbe)).as("p"))
      .select(col("q_id"), col("lut"), col("p.c").as("cell"))
    e.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx_d", vf.pqAdc(col("lut"), col("codes"), PqNCent))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMin(col("approx_d"), col("vec_id"), kk)
        .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").as("approx_d"), (col("pos") + 1).cast("int").as("rank"))
  }

  // ----------------------------------------------------------- kNN graph

  val KnnK = 4

  /** #129: mutual k-NN GRAPH over ALL embeddings — the artifact behind
    * semantic dedup (SemDeDup: embed → cluster → drop near-neighbors),
    * graph clustering, and label propagation: unlike the top-k SEARCH
    * ops (#29-76, a small query set against the corpus), every vector
    * is a query here, so the build must be blocked or it is n²·d.
    *
    * Blocking = the IVF coarse cells (#38's codebook): each vector
    * scores only vectors in its own cell (the standard blocked/
    * cluster-pruned kNN-graph build — SemDeDup itself computes pairs
    * within k-means clusters only), takes its top-[[KnnK]], and an edge
    * survives iff it is MUTUAL (each endpoint in the other's list) —
    * the usual symmetrization that kills hub edges. Deterministic by
    * construction, so the whole graph is oracle-checkable.
    *
    * Scale: the self-join is equi-keyed on cell — per-cell pair count
    * is (n/C)² for balanced cells, tuned by codebook size C growing
    * with n (finer quantization = smaller blocks); per-src top-k is a
    * bounded window inside the cell; the mutual filter is one
    * semi-join on the (src, dst) key. No stage touches cross-cell
    * pairs, which is what makes the build linear-ish rather than n².
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir).withColumn("cell", cellOf(col("v")))
    val knn = e.as("x").join(e.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("y.vec_id").as("dst"),
        VectorLsh.cosine(col("x.v"), col("y.v")).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("src")
          .orderBy(col("cosine").desc, col("dst").asc)))
      .filter(col("rank") <= KnnK)
      .select("src", "dst", "cosine")
    val rev = knn.select(col("dst").as("src"), col("src").as("dst"))
    knn.join(rev, Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"), col("cosine"))
  }

  val knnGraphSql: String = {
    val icentEl = graft.core.PortableHash.duckDyadic("'IVF|' || c || '|' || (i - 1)")
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), icents AS MATERIALIZED (
       |  SELECT c, list($icentEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $NCells)) AS c),
       |       (SELECT unnest(range(1, ${VectorLsh.EmbDim + 1})) AS i)
       |  GROUP BY c
       |), cells AS MATERIALIZED (
       |  SELECT vec_id, c AS cell FROM (
       |    SELECT ve.vec_id, icents.c,
       |      ${VectorLsh.duckFold("(v[i] - cv[i]) * (v[i] - cv[i])")} AS d
       |    FROM ve, icents
       |  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
       |), knn AS MATERIALIZED (
       |  SELECT src, dst, cosine FROM (
       |    SELECT x.vec_id AS src, y.vec_id AS dst,
       |      ${VectorLsh.duckFold("xv.v[i] * yv.v[i]")} /
       |        (sqrt(${VectorLsh.duckFold("xv.v[i] * xv.v[i]")}) * sqrt(${VectorLsh.duckFold("yv.v[i] * yv.v[i]")})) AS cosine
       |    FROM cells x JOIN cells y
       |      ON x.cell = y.cell AND x.vec_id <> y.vec_id
       |    JOIN ve xv ON xv.vec_id = x.vec_id
       |    JOIN ve yv ON yv.vec_id = y.vec_id
       |  ) QUALIFY ROW_NUMBER() OVER (PARTITION BY src
       |      ORDER BY cosine DESC, dst ASC) <= $KnnK
       |)
       |SELECT a.src, a.dst, a.cosine
       |FROM knn a
       |WHERE a.src < a.dst
       |  AND EXISTS (SELECT 1 FROM knn b
       |              WHERE b.src = a.dst AND b.dst = a.src)""".stripMargin
  }

  // ---------------------------------------------------- semantic clusters

  val SemTau = 0.4

  /** #130: SEMANTIC CLUSTERS — the SemDeDup composition closed end to
    * end: connected components over the mutual k-NN graph's strong
    * edges (cosine ≥ [[SemTau]]), emitted as the full-corpus mapping
    * (vec_id, cluster_id, is_rep) — every vector resolves to its
    * cluster's min vec_id or itself, so `filter(is_rep)` IS the
    * semantically deduplicated embedding set (the exact analog of
    * #111's text-side canonical mapping, on the embedding side).
    *
    * Plan: #129's graph filtered map-side, then [[graft.core.Components]]
    * (min-label propagation with pointer doubling — the #48 loop,
    * O(log diameter) rounds since round 7), then ONE left join of the
    * vector ids against the tiny component frame (broadcasts at scale).
    */
  def semanticClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = knnGraph(spark, dir)
      .filter(col("cosine") >= SemTau)
      .select("src", "dst").localCheckpoint()
    val labels = graft.core.Components.run(pairs, "semantic_clusters")
    vecs(spark, dir).select(col("vec_id"))
      .join(labels.select(col("node").as("vec_id"), col("lab")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("lab"), col("vec_id")).as("cluster_id"))
      .withColumn("is_rep", col("vec_id") === col("cluster_id"))
  }

  val semanticClustersSql: String =
    s"""WITH RECURSIVE strong AS MATERIALIZED (
       |  SELECT src, dst FROM ($knnGraphSql) WHERE cosine >= $SemTau
       |),
       |sedges AS (
       |  SELECT src, dst FROM strong UNION ALL SELECT dst, src FROM strong
       |),
       |sreach AS (
       |  SELECT src AS v, src AS lab FROM sedges
       |  UNION
       |  SELECT e.dst AS v, r.lab FROM sreach r JOIN sedges e ON e.src = r.v
       |),
       |scomp AS (SELECT v AS vec_id, MIN(lab) AS lab FROM sreach GROUP BY v)
       |SELECT em.vec_id,
       |  COALESCE(s.lab, em.vec_id) AS cluster_id,
       |  COALESCE(s.lab, em.vec_id) = em.vec_id AS is_rep
       |FROM embeddings em LEFT JOIN scomp s USING (vec_id)""".stripMargin

  // -------------------------------------------------------- refine/rerank

  val Refine = 30

  /** #120: two-stage retrieval — IVF-PQ shortlist ([[Refine]] candidates
    * per query by compressed-domain distance) REFINED by exact cosine
    * over the true vectors, serving the final top-[[K]]. This is the
    * standard ANN serving contract (FAISS refine / DiskANN's re-rank):
    * the quantized index is allowed to mis-rank inside the shortlist as
    * long as recall@shortlist holds, and the exact scorer only ever
    * touches shortlist-many vectors per query.
    *
    * Scale: stage 1 is #76's plan unchanged (partition-pruned 3-byte
    * code scan). Stage 2's candidate fetch is a BROADCAST semi-join of
    * the q×[[Refine]]-row shortlist against the vector store — point
    * lookups, no data-side shuffle — then a ≤[[Refine]]-row-per-query
    * window. Total exact-distance work per query: [[Refine]] folds,
    * independent of corpus size.
    */
  def refineRerank(spark: SparkSession, dir: String): DataFrame =
    cachedTier("refine", spark, dir) {
    val shortlist = ivfpqRanked(spark, dir, Refine).select("q_id", "vec_id")
    val q = vecs(spark, dir).filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    vecs(spark, dir).join(broadcast(shortlist), "vec_id")
      .join(broadcast(q), "q_id")
      .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= K)
      .select("q_id", "vec_id", "cosine", "rank")
  }

  /** Shared IVFADC oracle CTE chain (through `luts`) + the ranked scan
    * fragment — used by both the direct top-k and the refine stage.
    */
  private val ivfpqOracle: (String, String) = {
    val icentEl = graft.core.PortableHash.duckDyadic("'IVF|' || c || '|' || (i - 1)")
    val pcentEl = graft.core.PortableHash.duckDyadic("'PQ|' || m || '|' || c || '|' || (i - 1)")
    val subFold = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${PqSubDim + 1}), i -> " +
      s"(v[(m * $PqSubDim) + i] - cv[i]) * (v[(m * $PqSubDim) + i] - cv[i]))), (acc, x) -> acc + x)"
    val adc = (1 to PqM).map(m => s"lut[$m][codes[$m] + 1]").mkString(" + ")
    val ctes = s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), icents AS MATERIALIZED (
       |  SELECT c, list($icentEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $NCells)) AS c),
       |       (SELECT unnest(range(1, ${VectorLsh.EmbDim + 1})) AS i)
       |  GROUP BY c
       |), idists AS MATERIALIZED (
       |  SELECT ve.vec_id, icents.c,
       |    ${VectorLsh.duckFold("(v[i] - cv[i]) * (v[i] - cv[i])")} AS d
       |  FROM ve, icents
       |), cells AS MATERIALIZED (
       |  SELECT vec_id, c AS cell FROM idists
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
       |), probes AS MATERIALIZED (
       |  SELECT vec_id AS q_id, c AS cell FROM idists
       |  WHERE vec_id % $QueryMod = 0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) <= $NProbe
       |), pcents AS MATERIALIZED (
       |  SELECT m, c, list($pcentEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $PqM)) AS m),
       |       (SELECT unnest(range(0, $PqNCent)) AS c),
       |       (SELECT unnest(range(1, ${PqSubDim + 1})) AS i)
       |  GROUP BY m, c
       |), sd AS MATERIALIZED (
       |  SELECT vec_id, m, c, $subFold AS d
       |  FROM ve, pcents
       |), codes AS (
       |  SELECT vec_id, list(code ORDER BY m) AS codes FROM (
       |    SELECT vec_id, m, c AS code FROM sd
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
       |  ) GROUP BY vec_id
       |), luts AS (
       |  SELECT vec_id AS q_id, list(lc ORDER BY m) AS lut FROM (
       |    SELECT vec_id, m, list(d ORDER BY c) AS lc FROM sd
       |    WHERE vec_id % $QueryMod = 0 GROUP BY vec_id, m
       |  ) GROUP BY vec_id
       |)""".stripMargin
    val ranked = s"""SELECT p.q_id, e.vec_id, $adc AS approx_d,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p.q_id
       |      ORDER BY ($adc) ASC, e.vec_id ASC) AS INT) AS rank
       |  FROM codes e
       |  JOIN cells ce ON ce.vec_id = e.vec_id
       |  JOIN probes p ON p.cell = ce.cell AND e.vec_id <> p.q_id
       |  JOIN luts q ON q.q_id = p.q_id""".stripMargin
    (ctes, ranked)
  }

  val ivfpqTopKSql: String =
    s"""${ivfpqOracle._1}
       |SELECT q_id, vec_id, approx_d, rank FROM (
       |  ${ivfpqOracle._2}
       |) WHERE rank <= $K""".stripMargin

  /** Refine oracle: the SAME IVFADC chain truncated at [[Refine]], then
    * exact cosine over the true vectors (the brute scorer's fold) and a
    * fresh per-query rank.
    */
  val refineRerankSql: String =
    s"""${ivfpqOracle._1},
       |short AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM (
       |  ${ivfpqOracle._2}
       |  ) WHERE rank <= $Refine
       |)
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT s.q_id, s.vec_id,
       |    ${VectorLsh.duckFold("q.v[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY
       |      ${VectorLsh.duckFold("q.v[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) DESC,
       |      s.vec_id ASC) AS INT) AS rank
       |  FROM short s
       |  JOIN ve e ON e.vec_id = s.vec_id
       |  JOIN ve q ON q.vec_id = s.q_id
       |) WHERE rank <= $K""".stripMargin

  val lshTopKSql: String =
    s"""WITH ${VectorLsh.duckBucketed}
       |SELECT q_id, vec_id, cosine, rank FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    ${VectorLsh.duckFold("q.v[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${VectorLsh.duckFold("q.v[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) DESC,
       |      e.vec_id ASC) AS INT) AS rank
       |  FROM bk q JOIN bk e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
       |  WHERE q.vec_id % $QueryMod = 0
       |) WHERE rank <= $K""".stripMargin

  // --------------------------------------- #156 truncation-quality eval

  /** Truncated prefix width for the Matryoshka-style evaluation. */
  val TruncDim = 16

  /** #156: dimension-truncation retrieval quality — rank the same query
    * set with FULL 64-d cosine and with the FIRST-[[TruncDim]]-d prefix
    * cosine, and report per-query top-K overlap and top-1 agreement.
    * This is the acceptance measurement behind Matryoshka-style
    * embedding truncation (Kusupati et al. 2022) and, more generally,
    * behind ANY "store fewer dims, rerank later" decision (#138's
    * random projection is the other reduction — this op is how either
    * gets judged before it ships): truncating 64→16 cuts the vector
    * store and scan cost 4×, and this table says what it costs in
    * retrieval fidelity — measured, not hoped.
    *
    * Plan: two broadcast-query corpus scans (the brute scorer's shape —
    * at scale each would be the ANN path instead; the MEASUREMENT
    * contract is unchanged), each ending in a per-query bounded top-K
    * window, then one (q_id, vec_id)-keyed join of two K-row-per-query
    * frames and a per-query count — everything after the scans touches
    * ≤ 2K rows per query. Top-1 agreement rides the same joined frame.
    */
  def truncateEval(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    def topk(frame: DataFrame, dim: Int): DataFrame = {
      val proj = if (dim == EmbDimFull) frame
        else frame.withColumn("v", slice(col("v"), 1, dim))
      val q = proj.filter(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // The brute scorer's two-phase salted heaps (see bruteTopK): the
      // per-query window never sees more than K·NSalt rows.
      proj.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
        .withColumn("salt", pmod(col("vec_id"), lit(NSalt)))
        .withColumn("prank", row_number().over(
          Window.partitionBy("q_id", "salt")
            .orderBy(col("cosine").desc, col("vec_id").asc)))
        .filter(col("prank") <= K)
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("cosine").desc, col("vec_id").asc)))
        .filter(col("rank") <= K)
        .select("q_id", "vec_id", "rank")
    }
    val full = topk(e, EmbDimFull)
    val trunc = topk(e, TruncDim)
    val joined = full.join(trunc.withColumnRenamed("rank", "t_rank"),
      Seq("q_id", "vec_id"))
    val overlap = joined.groupBy("q_id").agg(
      count(lit(1)).as("overlap"),
      max(col("rank") === 1 && col("t_rank") === 1).as("top1_match"))
    // Queries whose lists are fully disjoint must still appear.
    full.select("q_id").distinct()
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        coalesce(col("top1_match"), lit(false)).as("top1_match"))
  }

  private val EmbDimFull = VectorLsh.EmbDim

  val truncateEvalSql: String = {
    def fold16(term: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${TruncDim + 1}), i -> ($term))), (acc, x) -> acc + x)"
    def ranked(fold: String => String, nm: String) =
      s"""$nm AS (
         |  SELECT q_id, vec_id, rank FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${fold("q.v[i] * e.v[i]")} /
         |        (sqrt(${fold("q.v[i] * q.v[i]")}) * sqrt(${fold("e.v[i] * e.v[i]")})) DESC,
         |        e.vec_id ASC) AS INT) AS rank
         |    FROM ve q JOIN ve e ON e.vec_id <> q.vec_id
         |    WHERE q.vec_id % $QueryMod = 0
         |  ) WHERE rank <= $K
         |)""".stripMargin
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |),
       |${ranked(VectorLsh.duckFold, "fr")},
       |${ranked(fold16, "tr")},
       |ov AS (
       |  SELECT fr.q_id, COUNT(*) AS overlap,
       |    bool_or(fr.rank = 1 AND tr.rank = 1) AS top1_match
       |  FROM fr JOIN tr ON tr.q_id = fr.q_id AND tr.vec_id = fr.vec_id
       |  GROUP BY fr.q_id
       |)
       |SELECT q.q_id, COALESCE(ov.overlap, 0) AS overlap,
       |  COALESCE(ov.top1_match, FALSE) AS top1_match
       |FROM (SELECT DISTINCT q_id FROM fr) q
       |LEFT JOIN ov ON ov.q_id = q.q_id""".stripMargin
  }

  // --------------------------------------------------------- #186 PQ trained

  /** #186: PQ top-k with a TRAINED codebook — the answer to #180's
    * finding that the hash-seeded PQ tiers sit at recall 0.06-0.10:
    * one distributed Lloyd sweep PER SUBSPACE over the corpus
    * (assign each sub-vector to its nearest seed centroid, then
    * per-(subspace, centroid, dim) quantized means; empty cells keep
    * their seed — standard Lloyd degeneracy rule) refines the codebook
    * the ADC scan quantizes against. Encoding/LUT/ADC are byte-for-byte
    * the #59 serving path — only the codebook rows change, which is
    * exactly how a production PQ deployment retrains.
    *
    * Scale: training is one corpus scan exploded to M·subDim rows per
    * vector feeding a map-side-combining groupBy onto the BOUNDED
    * (m, c, i) = M·nCent·subDim key space — shuffle bytes constant in
    * corpus size; the swept codebook is one 512-double row broadcast
    * back (the k-means codebook-training path #38's Scaladoc promises).
    * Serving is unchanged: 3-bit codes, M lookups per candidate.
    *
    * Exactness: assignment distances fold in the codegen'd PqEncode
    * order (strict `<` keeps the smaller c — mirrored by ORDER BY d, c);
    * centroid means are [[Exact.decAvg]]-quantized (scale 9,
    * order-independent); ADC is the fixed ascending-m 8-term sum both
    * engines evaluate literally.
    */
  def pqTrainedTopK(spark: SparkSession, dir: String): DataFrame =
    cachedTier("pq_trained", spark, dir) {
    val vf = graft.functions.VectorFolds
    val seedCb = lit(pqFlatCodebook)
    val e = vecs(spark, dir)
    // Lloyd sweep: seed-assign sub-vectors, per-(m, c, i) quantized means.
    val means = e
      .withColumn("codes0", vf.pqEncode(col("v"), seedCb, PqNCent, PqSubDim))
      .select(col("v"), posexplode(col("codes0")).as(Seq("m", "c")))
      .select(col("m"), col("c"),
        posexplode(slice(col("v"), col("m") * PqSubDim + 1, lit(PqSubDim)))
          .as(Seq("i", "x")))
      .groupBy("m", "c", "i")
      .agg(graft.core.Exact.decAvg(col("x"), 9).as("cx"))
    // Re-assemble the flat [m][c][i] codebook; empty cells keep the seed.
    val grid = spark.range(PqM * PqNCent * PqSubDim).select(
      (col("id") / (PqNCent * PqSubDim)).cast("int").as("m"),
      ((col("id") / PqSubDim) % PqNCent).cast("int").as("c"),
      (col("id") % PqSubDim).cast("int").as("i"),
      col("id"))
    val trained = grid.join(means, Seq("m", "c", "i"), "left")
      .select(col("id"),
        coalesce(col("cx"), element_at(seedCb, (col("id") + 1).cast("int"))).as("cx"))
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("id"), col("cx")))),
        s => s.getField("cx")).as("cb"))
    // Serve: identical to #59 with the swept codebook riding in broadcast.
    val data = e.crossJoin(broadcast(trained))
      .withColumn("codes", vf.pqEncode(col("v"), col("cb"), PqNCent, PqSubDim))
      .select("vec_id", "codes")
    val q = e.filter(col("vec_id") % QueryMod === 0).crossJoin(broadcast(trained))
      .withColumn("lut", vf.pqLut(col("v"), col("cb"), PqNCent, PqSubDim))
      .select(col("vec_id").as("q_id"), col("lut"))
    data.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("approx_d", vf.pqAdc(col("lut"), col("codes"), PqNCent))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("approx_d").asc, col("vec_id").asc)))
      .filter(col("rank") <= K)
      .select("q_id", "vec_id", "approx_d", "rank")
  }

  val pqTrainedTopKSql: String = {
    val centEl = graft.core.PortableHash.duckDyadic("'PQ|' || m || '|' || c || '|' || (i - 1)")
    val subFold = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${PqSubDim + 1}), i -> " +
      s"(v[(m * $PqSubDim) + i] - cv[i]) * (v[(m * $PqSubDim) + i] - cv[i]))), (acc, x) -> acc + x)"
    val adc = (1 to PqM).map(m => s"lut[$m][codes[$m] + 1]").mkString(" + ")
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents0 AS MATERIALIZED (
       |  SELECT m, c, list($centEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $PqM)) AS m),
       |       (SELECT unnest(range(0, $PqNCent)) AS c),
       |       (SELECT unnest(range(1, ${PqSubDim + 1})) AS i)
       |  GROUP BY m, c
       |), sd0 AS MATERIALIZED (
       |  SELECT vec_id, v, m, c, $subFold AS d
       |  FROM ve, cents0
       |), a0 AS (
       |  SELECT vec_id, v, m, c AS code FROM sd0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
       |), means AS (
       |  SELECT m, code AS c, i, ${graft.core.Exact.duckAvg(s"v[(m * $PqSubDim) + i]", 9)} AS cx
       |  FROM a0, (SELECT unnest(range(1, ${PqSubDim + 1})) AS i)
       |  GROUP BY m, code, i
       |), cents1 AS MATERIALIZED (
       |  SELECT g.m, g.c, list(coalesce(mn.cx, ${graft.core.PortableHash.duckDyadic("'PQ|' || g.m || '|' || g.c || '|' || (g.i - 1)")}) ORDER BY g.i) AS cv
       |  FROM (SELECT m, c, i
       |        FROM (SELECT unnest(range(0, $PqM)) AS m),
       |             (SELECT unnest(range(0, $PqNCent)) AS c),
       |             (SELECT unnest(range(1, ${PqSubDim + 1})) AS i)) g
       |  LEFT JOIN means mn ON mn.m = g.m AND mn.c = g.c AND mn.i = g.i
       |  GROUP BY g.m, g.c
       |), sd1 AS MATERIALIZED (
       |  SELECT vec_id, m, c, $subFold AS d
       |  FROM ve, cents1
       |), codes AS (
       |  SELECT vec_id, list(code ORDER BY m) AS codes FROM (
       |    SELECT vec_id, m, c AS code FROM sd1
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
       |  ) GROUP BY vec_id
       |), luts AS (
       |  SELECT vec_id AS q_id, list(lc ORDER BY m) AS lut FROM (
       |    SELECT vec_id, m, list(d ORDER BY c) AS lc FROM sd1
       |    WHERE vec_id % $QueryMod = 0 GROUP BY vec_id, m
       |  ) GROUP BY vec_id
       |)
       |SELECT q_id, vec_id, approx_d, rank FROM (
       |  SELECT q_id, e.vec_id, $adc AS approx_d,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ($adc) ASC, e.vec_id ASC) AS INT) AS rank
       |  FROM codes e JOIN luts q ON e.vec_id <> q.q_id
       |) WHERE rank <= $K""".stripMargin
  }

  // ------------------------------------------ #180 recall acceptance report

  /** #180: recall@K of every approximate serving tier against the exact
    * brute-force truth — the ACCEPTANCE REPORT an ANN deployment
    * publishes before switching traffic (the corpus-wide sibling of
    * #126's LSH-dedup recall, here for the retrieval ladder): one row
    * per variant (lsh / ivf / pq / ivfpq) with query count, truth hits,
    * and recall = hits / (n_queries · K). Numbers, not hopes: the
    * speed-for-recall trade each tier makes is MEASURED on the corpus
    * it will serve.
    *
    * Exactness: hits and query counts are integers; recall is one
    * int/int double division. Scale: each variant's frame is the
    * registered operator itself (already bounded to K rows per query),
    * so the report joins K·|queries|-sized frames on (q_id, vec_id) —
    * dictionary-small relative to the corpus — and aggregates to 4
    * rows. Truth is computed once and reused across all four joins.
    */
  def recallReport(spark: SparkSession, dir: String): DataFrame = {
    // r10 (guide §3.3/§5): the brute-force pass used to be re-planned
    // and RE-EXECUTED by each of the six semi-joins plus the six
    // broadcast n_queries branches; a per-invocation checkpoint made
    // "once" literal. r11 (VERDICT r10 item 8): the truth now comes
    // from the session-cached #29 frame itself (checkpointed inside
    // the cache build), so repeat invocations of the report — and
    // ann_brute_topk runs in the same session — stop re-paying the
    // scoring pass entirely.
    val truth = bruteTopK(spark, dir).select("q_id", "vec_id")
    val nq = truth.agg(countDistinct(col("q_id")).as("n_queries"))
    // broadcast hint: the checkpoint's LogicalRDD carries the brute
    // pass's (huge) origin size estimate, which otherwise flips these
    // semi-joins from broadcast to sort-merge.
    def row(name: String, f: DataFrame): DataFrame =
      f.select(col("q_id"), col("vec_id"))
        .join(broadcast(truth), Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(nq))
        .select(lit(name).as("variant"), col("n_queries"), col("n_hits"),
          (col("n_hits").cast("double") /
            (col("n_queries") * K).cast("double")).as("recall"))
    row("lsh", lshTopK(spark, dir))
      .unionByName(row("ivf", ivfTopK(spark, dir)))
      .unionByName(row("pq", pqTopK(spark, dir)))
      .unionByName(row("pq_trained", pqTrainedTopK(spark, dir)))
      .unionByName(row("ivfpq", ivfpqTopK(spark, dir)))
      .unionByName(row("ivfpq_refined", refineRerank(spark, dir)))
  }

  val recallReportSql: String = {
    def variant(name: String, sql: String): String =
      s"""SELECT '$name' AS variant, nq.n_queries,
         |  (SELECT COUNT(*) FROM (SELECT q_id, vec_id FROM ($sql)) c
         |   JOIN truth USING (q_id, vec_id)) AS n_hits,
         |  CAST((SELECT COUNT(*) FROM (SELECT q_id, vec_id FROM ($sql)) c
         |   JOIN truth USING (q_id, vec_id)) AS DOUBLE)
         |    / CAST(nq.n_queries * $K AS DOUBLE) AS recall
         |FROM nq""".stripMargin
    s"""WITH truth AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM ($bruteTopKSql)
       |),
       |nq AS (SELECT COUNT(DISTINCT q_id) AS n_queries FROM truth)
       |${variant("lsh", lshTopKSql)}
       |UNION ALL
       |${variant("ivf", ivfTopKSql)}
       |UNION ALL
       |${variant("pq", pqTopKSql)}
       |UNION ALL
       |${variant("pq_trained", pqTrainedTopKSql)}
       |UNION ALL
       |${variant("ivfpq", ivfpqTopKSql)}
       |UNION ALL
       |${variant("ivfpq_refined", refineRerankSql)}""".stripMargin
  }

  /** nprobe values swept by #296 — the top includes [[NCells]] so the
    * curve is anchored at exhaustive scan (recall 1.0 by construction).
    */
  val SweepProbes: Seq[Int] = Seq(1, 2, 4, NCells)

  /** #296: NPROBE SWEEP — recall@[[K]] and scanned-candidate cost of
    * the IVF tier at each probe width: the TUNING CURVE that decides
    * [[NProbe]], sibling of #288 (PQ distortion) and #289 (Jaccard
    * threshold curve) in the policy-artifact family. #180 measures the
    * ladder at its deployed settings; this is the table the setting is
    * CHOSEN from — recall climbs with nprobe while scanned candidates
    * grow ~linearly, and the knee is the deployment choice. The last
    * row probes every cell, so its recall = 1.0 anchors the curve (any
    * other value would mean the probe/scan machinery itself is broken
    * — spec-pinned).
    *
    * Scale: cells and probe ranks are computed ONCE at the maximum
    * width (candidates scored once, reused by every narrower width via
    * a prank filter — narrower sweeps are prefixes); per width, one
    * bounded per-query top-K window + a semi-join against the K·|Q|
    * truth frame. Exactness: the cosine is the house ordered fold,
    * counts are integers, recall/avg_cands one division each.
    */
  def nprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val maxP = SweepProbes.max
    val e = vecs(spark, dir).withColumn("cell", cellOf(col("v")))
    val probes = vecs(spark, dir).filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        posexplode(array_sort(array((0 until NCells).map(c =>
          struct(centDist(col("v"), c).as("d"), lit(c).as("c"))): _*)))
          .as(Seq("pi", "p")))
      .filter(col("pi") < maxP)
      .select(col("q_id"), col("qv"), (col("pi") + 1).as("prank"),
        col("p.c").as("cell"))
    val cands = e.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
      .select("q_id", "vec_id", "prank", "cosine")
      .localCheckpoint(false)
    val truth = bruteTopK(spark, dir).select("q_id", "vec_id")
    val nq = truth.agg(countDistinct(col("q_id")).as("n_queries"))
    SweepProbes.map { p =>
      val mine = cands.filter(col("prank") <= p)
      val hits = mine
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("cosine").desc, col("vec_id").asc)))
        .filter(col("rank") <= K)
        .join(truth, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val scanned = mine.agg(count(lit(1)).as("n_cands"))
      hits.crossJoin(broadcast(scanned)).crossJoin(broadcast(nq))
        .select(lit(p).as("nprobe"), col("n_queries"), col("n_hits"),
          (col("n_hits").cast("double") /
            (col("n_queries") * K).cast("double")).as("recall"),
          (col("n_cands").cast("double") / col("n_queries"))
            .as("avg_cands"))
    }.reduce(_ unionByName _)
  }

  val nprobeSweepSql: String = {
    val cos =
      s"""${VectorLsh.duckFold("p.qv[i] * e.v[i]")} /
         |      (sqrt(${VectorLsh.duckFold("p.qv[i] * p.qv[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")}))""".stripMargin
    val centEl = graft.core.PortableHash.duckDyadic("'IVF|' || c || '|' || (i - 1)")
    def row(p: Int): String =
      s"""SELECT $p AS nprobe, nq.n_queries,
         |  (SELECT COUNT(*) FROM (
         |     SELECT q_id, vec_id FROM (
         |       SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |         ORDER BY cosine DESC, vec_id ASC) AS rank
         |       FROM cand WHERE prank <= $p) WHERE rank <= $K) t
         |   JOIN truth USING (q_id, vec_id)) AS n_hits,
         |  CAST((SELECT COUNT(*) FROM (
         |     SELECT q_id, vec_id FROM (
         |       SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |         ORDER BY cosine DESC, vec_id ASC) AS rank
         |       FROM cand WHERE prank <= $p) WHERE rank <= $K) t
         |   JOIN truth USING (q_id, vec_id)) AS DOUBLE)
         |    / CAST(nq.n_queries * $K AS DOUBLE) AS recall,
         |  CAST((SELECT COUNT(*) FROM cand WHERE prank <= $p) AS DOUBLE)
         |    / nq.n_queries AS avg_cands
         |FROM nq""".stripMargin
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents AS MATERIALIZED (
       |  SELECT c, list($centEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $NCells)) AS c),
       |       (SELECT unnest(range(1, ${VectorLsh.EmbDim + 1})) AS i)
       |  GROUP BY c
       |), dists AS MATERIALIZED (
       |  SELECT ve.vec_id, ve.v, cents.c,
       |    ${VectorLsh.duckFold("(v[i] - cv[i]) * (v[i] - cv[i])")} AS d
       |  FROM ve, cents
       |), cells AS MATERIALIZED (
       |  SELECT vec_id, v, c AS cell FROM dists
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
       |), probesAll AS MATERIALIZED (
       |  SELECT vec_id AS q_id, v AS qv, c AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS prank
       |  FROM dists
       |  WHERE vec_id % $QueryMod = 0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c)
       |    <= ${SweepProbes.max}
       |), cand AS MATERIALIZED (
       |  SELECT p.q_id, e.vec_id, p.prank,
       |    $cos AS cosine
       |  FROM cells e JOIN probesAll p
       |    ON e.cell = p.cell AND e.vec_id <> p.q_id
       |), truth AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM ($bruteTopKSql)
       |), nq AS (SELECT COUNT(DISTINCT q_id) AS n_queries FROM truth)
       |${SweepProbes.map(row).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** #299: HARD-NEGATIVE MINING — per query vector, the top-[[K]] most
    * similar vectors carrying a DIFFERENT label: the contrastive /
    * triplet training miner (high-cosine wrong-label items are exactly
    * the negatives a two-tower or reranker model learns the most from;
    * random negatives are too easy and stall training — the standard
    * in-batch-negatives complaint). Labels are the embedding table's
    * own label column; the output is the (query, negative) pair table
    * a trainer joins into its batches.
    *
    * Scale: the #29 two-phase salted-heap shape verbatim (per-(query,
    * salt) partial top-K, then top-K of the K·S survivors) with the
    * label inequality fused into the scored join — K·S rows shuffle
    * per query, never the corpus. Exactness: the house ordered-fold
    * cosine; ranks break ties on vec_id.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"))
    val scored = e.join(broadcast(q),
        col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cosine", VectorLsh.cosine(col("qv"), col("v")))
      .withColumn("salt", pmod(col("vec_id"), lit(NSalt)))
    val partial = scored.withColumn("prank", row_number().over(
        Window.partitionBy("q_id", "salt")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("prank") <= K)
    partial.withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= K)
      .select("q_id", "q_label", "vec_id", "label", "cosine", "rank")
  }

  val hardNegativesSql: String =
    s"""WITH ve AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), s AS (
       |  SELECT q.vec_id AS q_id, q.label AS q_label,
       |    e.vec_id AS vec_id, e.label AS label,
       |    ${VectorLsh.duckFold("q.v[i] * e.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")})) AS cosine
       |  FROM ve q JOIN ve e
       |    ON e.vec_id <> q.vec_id AND e.label <> q.label
       |  WHERE q.vec_id % $QueryMod = 0
       |)
       |SELECT q_id, q_label, vec_id, label, cosine, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
       |  FROM s
       |) WHERE rank <= $K""".stripMargin

  // ----------------------------------------------- #243 MMR rerank

  /** Selections per query in the diversified list. */
  val MmrK = 3

  /** #243: MAXIMAL MARGINAL RELEVANCE reranking (Carbonell & Goldstein
    * 1998) — the diversification pass between retrieval and serving
    * that every search/RAG stack runs: a pure top-k by relevance
    * returns near-duplicates of one best hit; MMR greedily picks
    * argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), trading
    * relevance against redundancy with what's already chosen. λ = 1/2
    * (dyadic — both weights are halvings, exact).
    *
    * Exactness: relevance and candidate-pair similarities are the
    * SAME ordered-fold cosine the #29 brute top-k hash-matches on, so
    * both engines hold bit-identical doubles; each MMR score is two
    * exact halvings and one correctly-rounded subtract; greatest() of
    * identical doubles is exact; every argmax breaks ties on vec_id.
    * The [[MmrK]]-round greedy is UNROLLED (the wcc/scc discipline),
    * one window argmax per round — no iterative driver loop, one lazy
    * plan, oracle-checkable.
    *
    * Scale: the candidate frame is the #29 result (K per query);
    * pairwise sims are K² per query, generated by a q_id-keyed
    * self-join of the candidate slice — bounded by K²·|Q|, never
    * corpus-squared; each round's argmax is a K-row window per query.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val lam = 0.5
    val cands = bruteTopK(spark, dir)
      .select(col("q_id"), col("vec_id"), col("cosine").as("rel"))
      .localCheckpoint(false)
    val e = vecs(spark, dir)
    val withV = cands.join(e, "vec_id")
      .select(col("q_id"), col("vec_id"), col("v"))
    val pair = withV.as("a").join(withV.as("b"),
        col("a.q_id") === col("b.q_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.q_id").as("q_id"), col("a.vec_id").as("da"),
        col("b.vec_id").as("db"),
        VectorLsh.cosine(col("a.v"), col("b.v")).as("sim"))
      .localCheckpoint(false)
    val w = Window.partitionBy("q_id")
    def argmax(df: DataFrame, score: String): DataFrame =
      df.withColumn("r", row_number().over(
          w.orderBy(col(score).desc, col("vec_id").asc)))
        .filter(col("r") === 1).drop("r")
    val sel1 = argmax(cands, "rel")
      .select(col("q_id"), col("vec_id").as("s1"), col("rel").as("rel1"))
    val sc2 = cands.join(sel1, "q_id").filter(col("vec_id") =!= col("s1"))
      .join(pair.select(col("q_id"), col("da").as("vec_id"),
        col("db").as("s1"), col("sim").as("sim1")),
        Seq("q_id", "vec_id", "s1"))
      .withColumn("mmr",
        lit(lam) * col("rel") - lit(lam) * col("sim1"))
    val sel2 = argmax(sc2, "mmr")
      .select(col("q_id"), col("vec_id").as("s2"), col("rel").as("rel2"),
        col("mmr").as("mmr2"))
    val sc3 = cands.join(sel1, "q_id").join(sel2, "q_id")
      .filter(col("vec_id") =!= col("s1") && col("vec_id") =!= col("s2"))
      .join(pair.select(col("q_id"), col("da").as("vec_id"),
        col("db").as("s1"), col("sim").as("sim1")),
        Seq("q_id", "vec_id", "s1"))
      .join(pair.select(col("q_id"), col("da").as("vec_id"),
        col("db").as("s2"), col("sim").as("sim2")),
        Seq("q_id", "vec_id", "s2"))
      .withColumn("mmr",
        lit(lam) * col("rel") -
          lit(lam) * greatest(col("sim1"), col("sim2")))
    val sel3 = argmax(sc3, "mmr")
      .select(col("q_id"), col("vec_id").as("s3"), col("rel").as("rel3"),
        col("mmr").as("mmr3"))
    sel1.select(col("q_id"), lit(1).as("mmr_rank"),
        col("s1").as("vec_id"), col("rel1").as("relevance"),
        col("rel1").as("mmr_score"))
      .unionByName(sel2.select(col("q_id"), lit(2).as("mmr_rank"),
        col("s2").as("vec_id"), col("rel2").as("relevance"),
        col("mmr2").as("mmr_score")))
      .unionByName(sel3.select(col("q_id"), lit(3).as("mmr_rank"),
        col("s3").as("vec_id"), col("rel3").as("relevance"),
        col("mmr3").as("mmr_score")))
  }

  val mmrRerankSql: String = {
    val cos = s"${VectorLsh.duckFold("a.v[i] * b.v[i]")} / " +
      s"(sqrt(${VectorLsh.duckFold("a.v[i] * a.v[i]")}) * " +
      s"sqrt(${VectorLsh.duckFold("b.v[i] * b.v[i]")}))"
    val qcos = s"${VectorLsh.duckFold("q.v[i] * e.v[i]")} / " +
      s"(sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * " +
      s"sqrt(${VectorLsh.duckFold("e.v[i] * e.v[i]")}))"
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    AS v
       |  FROM embeddings
       |), cands AS MATERIALIZED (
       |  SELECT q_id, vec_id, rel FROM (
       |    SELECT q.vec_id AS q_id, e.vec_id AS vec_id, $qcos AS rel,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY $qcos DESC, e.vec_id ASC) AS rnk
       |    FROM ve q JOIN ve e ON e.vec_id <> q.vec_id
       |    WHERE q.vec_id % $QueryMod = 0
       |  ) WHERE rnk <= $K
       |), pair AS MATERIALIZED (
       |  SELECT ca.q_id, ca.vec_id AS da, cb.vec_id AS db, $cos AS sim
       |  FROM cands ca JOIN cands cb
       |    ON ca.q_id = cb.q_id AND ca.vec_id <> cb.vec_id
       |  JOIN ve a ON a.vec_id = ca.vec_id
       |  JOIN ve b ON b.vec_id = cb.vec_id
       |), sel1 AS MATERIALIZED (
       |  SELECT q_id, vec_id AS s1, rel AS rel1 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY rel DESC, vec_id ASC) AS r FROM cands
       |  ) WHERE r = 1
       |), sc2 AS (
       |  SELECT c.q_id, c.vec_id, c.rel, s.s1, s.rel1,
       |    0.5::DOUBLE * c.rel - 0.5::DOUBLE * p.sim AS mmr
       |  FROM cands c
       |  JOIN sel1 s ON s.q_id = c.q_id AND c.vec_id <> s.s1
       |  JOIN pair p ON p.q_id = c.q_id AND p.da = c.vec_id
       |    AND p.db = s.s1
       |), sel2 AS MATERIALIZED (
       |  SELECT q_id, vec_id AS s2, rel AS rel2, mmr AS mmr2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY mmr DESC, vec_id ASC) AS r FROM sc2
       |  ) WHERE r = 1
       |), sc3 AS (
       |  SELECT c.q_id, c.vec_id, c.rel,
       |    0.5::DOUBLE * c.rel
       |      - 0.5::DOUBLE * greatest(p1.sim, p2.sim) AS mmr
       |  FROM cands c
       |  JOIN sel1 s1 ON s1.q_id = c.q_id AND c.vec_id <> s1.s1
       |  JOIN sel2 s2 ON s2.q_id = c.q_id AND c.vec_id <> s2.s2
       |  JOIN pair p1 ON p1.q_id = c.q_id AND p1.da = c.vec_id
       |    AND p1.db = s1.s1
       |  JOIN pair p2 ON p2.q_id = c.q_id AND p2.da = c.vec_id
       |    AND p2.db = s2.s2
       |), sel3 AS (
       |  SELECT q_id, vec_id AS s3, rel AS rel3, mmr AS mmr3 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY mmr DESC, vec_id ASC) AS r FROM sc3
       |  ) WHERE r = 1
       |)
       |SELECT q_id, CAST(1 AS INT) AS mmr_rank, s1 AS vec_id,
       |  rel1 AS relevance, rel1 AS mmr_score FROM sel1
       |UNION ALL
       |SELECT q_id, CAST(2 AS INT), s2, rel2, mmr2 FROM sel2
       |UNION ALL
       |SELECT q_id, CAST(3 AS INT), s3, rel3, mmr3 FROM sel3""".stripMargin
  }

  // ----------------------------------------------------- #282 MIPS

  /** #282: MAXIMUM INNER PRODUCT SEARCH — exact top-k by raw dot
    * product per query. MIPS is NOT cosine (#29): the inner product
    * rewards vector NORM, which is exactly what retrieval/reco scoring
    * wants when magnitude encodes popularity or confidence (matrix-
    * factorization serving, two-tower retrieval logits, reranker
    * scores). The test corpus ships unit-normalized vectors — MIPS ≡
    * cosine there up to ulps — so the norm-sensitive semantics are
    * spec-pinned on a norm-perturbed copy instead (rankings genuinely
    * diverge once norms vary). The classic reduction (Shrivastava
    * & Li, NeurIPS 2014): augment items with √(M²−‖v‖²) so dot order
    * becomes cosine order and the whole #30/#38 ANN ladder applies —
    * the EQUIVALENCE is spec-pinned (augmented-cosine ranking ≡ MIPS
    * ranking), making this op the bridge that lets every
    * cosine-shaped index on the board serve inner-product workloads.
    *
    * Exactness: the dot is the house ordered fold — identical IEEE
    * sequence both engines, no grid. Scale: the K-bounded heap
    * aggregate (round 9, [[graft.functions.TopK]]) — a hash aggregate
    * whose map-side partial phase moves only K rows per (query,
    * partition); the scored frame never sorts at all.
    */
  def mipsTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dot", VectorLsh.dot(col("qv"), col("v")))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMax(col("dot"), col("vec_id"), K).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").as("dot"), (col("pos") + 1).cast("int").as("rank"))
  }

  val mipsTopKSql: String =
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), s AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    ${VectorLsh.duckFold("q.v[i] * e.v[i]")} AS dot
       |  FROM ve q JOIN ve e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id % $QueryMod = 0
       |)
       |SELECT q_id, vec_id, dot, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
       |  FROM s
       |) WHERE rank <= $K""".stripMargin

  // ------------------------------------------- #288 PQ distortion

  /** #288: PQ DISTORTION report — per subspace and overall, the mean
    * quantization error of the #59 product code: the compression-
    * quality artifact that decides M and NCent before anyone trusts PQ
    * recall (a subspace with outsized distortion is where recall dies,
    * and the fix — more centroids there, or an OPQ rotation — starts
    * from exactly this table). Because PQ assigns each sub-block its
    * NEAREST centroid, the per-block distortion IS min_c d(v_m, c) —
    * so the report needs no explicit reconstruction: per block, the
    * minimum over the 8 centroid fold-distances the encoder already
    * defines; overall = the 8-term fixed-order sum per vector.
    *
    * Exactness: each sub-distance is the house ordered fold; `least`
    * is a value pick; the per-vector total is a fixed left-assoc
    * 8-term tree; means are quantized order-free at 1e-12. Scale:
    * map-only over vectors (the codebook is a plan-time literal) +
    * one 9-key rollup — scan speed at any corpus size.
    */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame = {
    val vf = graft.functions.VectorFolds
    import graft.core.Exact
    def blockDist(m: Int) = least((0 until PqNCent).map { c =>
      val cent = array((0 until PqSubDim).map(i =>
        lit(pqFlatCodebook(m * PqNCent * PqSubDim + c * PqSubDim + i))): _*)
      vf.subVecSqDist(col("v"), cent, lit(m * PqSubDim))
    }: _*)
    val dists = vecs(spark, dir)
      .select(Seq(col("vec_id")) ++
        (0 until PqM).map(m => blockDist(m).as(s"d$m")): _*)
    val perBlock = dists
      .select(explode(array((0 until PqM).map(m =>
        struct(lit(m.toLong).as("m"), col(s"d$m").as("d"))): _*)).as("p"))
      .groupBy(col("p.m").as("m"))
      .agg(count(lit(1)).as("n_vecs"),
        Exact.decAvg(col("p.d"), 12).as("mean_dist"))
    val overall = dists
      .select((0 until PqM).map(m => col(s"d$m")).reduce(_ + _).as("t"))
      .agg(count(lit(1)).as("n_vecs"),
        Exact.decAvg(col("t"), 12).as("mean_dist"))
      .select(lit(-1L).as("m"), col("n_vecs"), col("mean_dist"))
    perBlock.unionByName(overall)
  }

  val pqDistortionSql: String = {
    val centEl = graft.core.PortableHash.duckDyadic(
      "'PQ|' || m || '|' || c || '|' || (i - 1)")
    val subFold = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${PqSubDim + 1}), i -> " +
      s"(v[(m * $PqSubDim) + i] - cv[i]) * (v[(m * $PqSubDim) + i] - cv[i]))), (acc, x) -> acc + x)"
    val tot = (1 to PqM).map(m => s"l[$m]").mkString(" + ")
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents AS MATERIALIZED (
       |  SELECT m, c, list($centEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $PqM)) AS m),
       |       (SELECT unnest(range(0, $PqNCent)) AS c),
       |       (SELECT unnest(range(1, ${PqSubDim + 1})) AS i)
       |  GROUP BY m, c
       |), bd AS MATERIALIZED (
       |  SELECT vec_id, m, MIN($subFold) AS d
       |  FROM ve, cents GROUP BY 1, 2
       |), per_block AS (
       |  SELECT m, COUNT(*) AS n_vecs,
       |    ${graft.core.Exact.duckAvg("d", 12)} AS mean_dist
       |  FROM bd GROUP BY 1
       |), tv AS (
       |  SELECT vec_id, $tot AS t
       |  FROM (SELECT vec_id, list(d ORDER BY m) AS l FROM bd GROUP BY 1)
       |), overall AS (
       |  SELECT CAST(-1 AS BIGINT) AS m, COUNT(*) AS n_vecs,
       |    ${graft.core.Exact.duckAvg("t", 12)} AS mean_dist
       |  FROM tv
       |)
       |SELECT CAST(m AS BIGINT) AS m, n_vecs, mean_dist FROM per_block
       |UNION ALL SELECT m, n_vecs, mean_dist FROM overall""".stripMargin
  }

  // --------------------------------------------- #334 int8 serving recall

  /** #334: INT8 SERVING RECALL — the recall half of the scalar-
    * quantization story (#86 reports the storage-side reconstruction
    * error; this measures what the SERVING tier actually loses):
    * normalize, absmax-quantize query AND database vectors to int8
    * (#86's exact scheme on the unit sphere), rank by the symmetric
    * int8 dot product s_q·s_v·Σc_q·c_v — the integer-SIMD score an
    * int8 store serves — and report per-query recall@K against the
    * float cosine truth. Together with #288 (PQ distortion) and #296
    * (nprobe sweep) this completes the tuning artifacts for every
    * compression tier on the ladder.
    *
    * Determinism: unit-normalize, scale, and codes are correctly-
    * rounded IEEE chains identical in both engines; the dot is an
    * EXACT integer (≤64·127²); the score is two multiplications over
    * identical doubles, so the (score DESC, vec_id) ranking is
    * engine-deterministic with no quantization needed — same argument
    * as the float brute ranking. Scale: quantization is map-only; the
    * scoring join broadcasts the query codes and runs the house
    * two-phase salted heaps (per-query shuffle moves k·S rows, never
    * N); truth comes from the session-cached brute pass.
    */
  def sqRecall(spark: SparkSession, dir: String): DataFrame = {
    val coded = vecs(spark, dir)
      .withColumn("nrm", VectorLsh.norm(col("v")))
      .withColumn("u", transform(col("v"), x =>
        when(col("nrm") === 0.0, lit(0.0)).otherwise(x / col("nrm"))))
      .withColumn("amax", array_max(transform(col("u"), abs(_))))
      .withColumn("qs", col("amax") / lit(127.0))
      .withColumn("cd", transform(col("u"), x =>
        when(col("amax") === 0.0, lit(0L))
          .otherwise(floor(x / col("qs") + lit(0.5)).cast("long"))))
      .select(col("vec_id"), col("qs"), col("cd"))
    val q = coded.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("q_id"), col("qs").as("qsq"),
        col("cd").as("cq"))
    val topk = coded.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("idot",
        aggregate(zip_with(col("cq"), col("cd"), _ * _), lit(0L), _ + _))
      .withColumn("score",
        col("qsq") * col("qs") * col("idot").cast("double"))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMax(col("score"), col("vec_id"), K)
        .as("tk"))
      .select(col("q_id"), explode(col("tk")).as("s"))
      .select(col("q_id"), col("s.id").as("vec_id"))
    val truth = bruteTopK(spark, dir)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    topk.join(truth, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(coalesce(sum("hit"), lit(0L)).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        (col("n_hits").cast("double") / lit(K.toDouble)).as("recall"))
  }

  val sqRecallSql: String = {
    val idot = s"list_sum(list_transform(range(1, ${VectorLsh.EmbDim + 1}), " +
      "i -> q.cd[i] * e.cd[i]))"
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), nr AS (
       |  SELECT vec_id, v,
       |    sqrt(${VectorLsh.duckFold("v[i] * v[i]")}) AS nrm
       |  FROM ve
       |), un AS (
       |  SELECT vec_id, list_transform(v,
       |    x -> CASE WHEN nrm = 0.0 THEN 0.0 ELSE x / nrm END) AS u
       |  FROM nr
       |), am AS (
       |  SELECT vec_id, u, list_max(list_transform(u, x -> abs(x))) AS amax
       |  FROM un
       |), cs AS MATERIALIZED (
       |  SELECT vec_id, amax / 127.0 AS qs,
       |    list_transform(u, x -> CASE WHEN amax = 0.0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT) END) AS cd
       |  FROM am
       |), sc AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    q.qs * e.qs * CAST($idot AS DOUBLE) AS score
       |  FROM cs q JOIN cs e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id % $QueryMod = 0
       |), tk AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS r
       |    FROM sc
       |  ) WHERE r <= $K
       |), truth AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM ($bruteTopKSql)
       |)
       |SELECT tk.q_id,
       |  CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hits,
       |  CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / $K.0 AS recall
       |FROM tk LEFT JOIN truth t
       |  ON t.q_id = tk.q_id AND t.vec_id = tk.vec_id
       |GROUP BY tk.q_id""".stripMargin
  }
}
