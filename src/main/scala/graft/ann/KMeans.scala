package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash, Tables, VectorLsh}

/** Distributed k-means (Lloyd's) over the embedding table — the
  * clustering step behind IVF codebook training ([[Ann.ivfTopK]]'s
  * "train the codebook with distributed k-means" scale path), semantic
  * data mixing, and cluster-balanced sampling.
  *
  * Two unrolled Lloyd iterations, fully LAZY (one Catalyst plan, no
  * driver loop): assign → mean → re-assign → mean. Per iteration the
  * plan is the canonical distributed shape — points never move, the
  * K×D centroid table does: a broadcast nested-loop join scores each
  * point against all K centroids (K·D doubles, trivially broadcast at
  * any corpus size), and the update is posexplode → partial-aggregated
  * groupBy(cluster, dim), so shuffle bytes are O(partitions·K·D), not
  * O(points). More iterations = repeat the same two stages; production
  * k-means (MLlib) adds a driver-side convergence check between them,
  * exactly like [[graft.dedup.Dedup.components]] does for its fixpoint.
  *
  * Oracle-exactness: per-dim means quantize through [[Exact.decSum]]
  * (order-independent integer sums); distances fold through the
  * codegen'd [[graft.functions.VectorFolds.sqDiffSum]] whose sequential
  * IEEE order DuckDB's `list_reduce` mirrors ([[VectorLsh.duckFold]]).
  * Argmin ties break on cluster id in both engines. Empty clusters are
  * dropped by the groupBy (standard Lloyd's degeneracy; k-means++ init
  * is the production mitigation).
  */
object KMeans {

  val K = 8
  val D: Int = VectorLsh.EmbDim

  private def pts(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Deterministic dyadic seed codebook (same recipe as IVF's). */
  private def seed(c: Int): Column =
    array(Array.tabulate(D)(i =>
      lit(PortableHash.dyadicJvm(s"KM|$c|$i"))).toSeq: _*)

  private val aCache = new graft.core.DfCache[(SparkSession, String)]

  /** The second-iteration assignment (vec_id, v, cluster) — the Lloyd
    * chain through re-assignment, shared (and session-cached) between
    * the codebook query (#65) and the silhouette acceptance table
    * (#305).
    */
  private def assigned2(spark: SparkSession, dir: String): DataFrame =
    aCache.getOrElseUpdate((spark, dir)) {
      val p = pts(spark, dir)
      val vf = graft.functions.VectorFolds
      // iteration 1: assign to nearest seed centroid (argmin via struct min)
      val a1 = p.withColumn("cluster",
        array_min(array((0 until K).map(c =>
          struct(vf.sqDiffSum(col("v"), seed(c)).as("d"), lit(c).as("c"))): _*))
          .getField("c"))
      // iteration 1: quantized per-dimension means
      val cents1 = a1
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim").agg(Exact.decAvg(col("x")).as("cx"))
        .groupBy("cluster").agg(
          transform(array_sort(collect_list(struct(col("dim"), col("cx")))),
            s => s.getField("cx")).as("cv"))
      // iteration 2: re-assign against the updated centroids
      p.crossJoin(broadcast(cents1))
        .withColumn("d", vf.sqDiffSum(col("v"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("d"), col("cluster"))))
        .filter(col("rn") === 1)
        .select("vec_id", "v", "cluster")
    }

  /** #65: two Lloyd iterations; one row per (cluster, dim). */
  def kmeans(spark: SparkSession, dir: String): DataFrame =
    // iteration 2: final centroids + cluster sizes
    assigned2(spark, dir)
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(Exact.decAvg(col("x")).as("c_val"), count(lit(1)).as("n_points"))
      .select("cluster", "dim", "c_val", "n_points")

  /** #305: SIMPLIFIED SILHOUETTE — the clustering-acceptance table for
    * the k-means tier (and by extension the IVF codebook it trains):
    * per point, a = distance to its OWN final centroid and b = the
    * nearest OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; reported
    * per cluster as (n_points, mean_intra, mean_nearest_other,
    * mean_silhouette). This is the measurement that tells you K is
    * wrong (clusters with s ≈ 0 overlap their neighbor) before the IVF
    * recall report (#180) pays for it downstream. The centroid-based
    * simplification is the standard big-data variant: the full
    * pairwise silhouette is O(n²) and never runs at corpus scale.
    *
    * Scale: reuses the session-cached Lloyd assignment; per point K
    * codegen'd folds against the broadcast K×D centroid table (the
    * assign stage's own shape), one map-side collapse onto K keys.
    * Exactness: final centroids are the SAME quantized means #65
    * emits; distances are sqrt of the exact fold; a, b, s are fixed
    * correctly-rounded trees; means quantize through [[Exact.decAvg]].
    */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val vf = graft.functions.VectorFolds
    val a2 = assigned2(spark, dir)
    val cents2 = a2
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(Exact.decAvg(col("x")).as("cx"))
      .groupBy("cluster").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("cx")))),
          s => s.getField("cx")).as("cv"))
    val s = a2
      .crossJoin(broadcast(cents2
        .select(col("cluster").as("kc"), col("cv"))))
      .withColumn("d", sqrt(vf.sqDiffSum(col("v"), col("cv"))))
      .groupBy("vec_id", "cluster")
      .agg(min(when(col("kc") === col("cluster"), col("d"))).as("a"),
        min(when(col("kc") =!= col("cluster"), col("d"))).as("b"))
      .withColumn("s",
        when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
    s.groupBy("cluster")
      .agg(count(lit(1)).as("n_points"),
        Exact.decAvg(col("a")).as("mean_intra"),
        Exact.decAvg(col("b")).as("mean_nearest_other"),
        Exact.decAvg(col("s")).as("mean_silhouette"))
  }

  /** The Lloyd chain through the second assignment (`a2`), factored so
    * #65's and #305's oracles share one text and cannot drift.
    */
  private[ann] val duckLloydCtes: String = {
    val seedEl = PortableHash.duckDyadic("'KM|' || c || '|' || (i - 1)")
    val fold = VectorLsh.duckFold("(v[i] - cv[i]) * (v[i] - cv[i])")
    s"""ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents0 AS MATERIALIZED (
       |  SELECT c, list($seedEl ORDER BY i) AS cv
       |  FROM (SELECT unnest(range(0, $K)) AS c),
       |       (SELECT unnest(range(1, ${D + 1})) AS i)
       |  GROUP BY c
       |), d0 AS MATERIALIZED (
       |  SELECT vec_id, v, c, $fold AS d FROM ve, cents0
       |), a1 AS (
       |  SELECT vec_id, v, c AS cluster FROM d0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) = 1
       |), m1 AS (
       |  SELECT cluster, dim, ${Exact.duckAvg("x")} AS cx
       |  FROM (SELECT cluster, unnest(v) AS x, unnest(range(0, $D)) AS dim FROM a1)
       |  GROUP BY cluster, dim
       |), cents1 AS MATERIALIZED (
       |  SELECT cluster, list(cx ORDER BY dim) AS cv FROM m1 GROUP BY cluster
       |), d1 AS MATERIALIZED (
       |  SELECT ve.vec_id, ve.v, cents1.cluster, $fold AS d FROM ve, cents1
       |), a2 AS (
       |  SELECT vec_id, v, cluster FROM d1
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1
       |)""".stripMargin
  }

  val kmeansSql: String =
    s"""WITH $duckLloydCtes
       |SELECT cluster, dim, ${Exact.duckAvg("x")} AS c_val, COUNT(*) AS n_points
       |FROM (SELECT cluster, unnest(v) AS x, unnest(range(0, $D)) AS dim FROM a2)
       |GROUP BY cluster, dim""".stripMargin

  val silhouetteSql: String = {
    val fold = VectorLsh.duckFold("(v[i] - cv[i]) * (v[i] - cv[i])")
    val sExpr = "CASE WHEN greatest(a, b) = 0.0 THEN 0.0" +
      " ELSE (b - a) / greatest(a, b) END"
    s"""WITH $duckLloydCtes, m2 AS (
       |  SELECT cluster, dim, ${Exact.duckAvg("x")} AS cx
       |  FROM (SELECT cluster, unnest(v) AS x, unnest(range(0, $D)) AS dim FROM a2)
       |  GROUP BY cluster, dim
       |), cents2 AS MATERIALIZED (
       |  SELECT cluster, list(cx ORDER BY dim) AS cv FROM m2 GROUP BY cluster
       |), d2 AS MATERIALIZED (
       |  SELECT a2.vec_id, a2.cluster AS own, cents2.cluster AS kc,
       |    sqrt($fold) AS d
       |  FROM a2, cents2
       |), sil AS (
       |  SELECT vec_id, own,
       |    MIN(CASE WHEN kc = own THEN d END) AS a,
       |    MIN(CASE WHEN kc <> own THEN d END) AS b
       |  FROM d2 GROUP BY 1, 2
       |)
       |SELECT own AS cluster, COUNT(*) AS n_points,
       |  ${Exact.duckAvg("a")} AS mean_intra,
       |  ${Exact.duckAvg("b")} AS mean_nearest_other,
       |  ${Exact.duckAvg(sExpr)} AS mean_silhouette
       |FROM sil GROUP BY 1""".stripMargin
  }
}
