package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash, Tables, VectorLsh}
import graft.functions.VectorFolds

/** #96: top principal direction of the embedding table by exact power
  * iteration — the low-rank/whitening primitive of embedding pipelines
  * (PCA projection before clustering or IVF cell training, variance
  * diagnostics of a learned space).
  *
  * Power iteration on the uncentered Gram XᵀX, two unrolled steps:
  *
  *   u = Σ_rows x · (x·v)        v' = u / ‖u‖
  *
  * Spark-first: the row pass is the codegen'd [[VectorFolds.dotp]] fold
  * (one fused loop per row), the per-dimension reduction is a posexplode
  * + 64-key quantized aggregate, and the 64-value direction vector flows
  * back as a one-row broadcast array — so each iteration is one scan,
  * one 64-key shuffle, and a broadcast, with NO driver-side linear
  * algebra. At 1e9 rows nothing changes: the d-key aggregate and the
  * O(d) broadcast are constant-size, the scan dominates.
  *
  * Exactness: x (float→double) and the dyadic v0 make each x_j·v0_j
  * product exact; the row fold accumulates SEQUENTIALLY in index order,
  * mirrored by the oracle's list_reduce (the [[VectorFolds]] contract).
  * Cross-row sums quantize on the 1e-6 grid (bounded: |x·s| < 40, so the
  * scaled BIGINT sum holds past 1e9 rows); the norm, its sqrt, and the
  * final divisions are correctly-rounded ops in identical literal order.
  * Iteration 2's v1 is arbitrary doubles, but both engines computed THE
  * SAME doubles, so its folds agree bit-for-bit too.
  */
object Pca {

  val D = VectorLsh.EmbDim

  /** Dyadic start direction (hash constants, computed driver-side). */
  val V0: IndexedSeq[Double] =
    (0 until D).map(i => PortableHash.dyadicJvm(s"PCA|$i"))

  private def embT(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("vd"))

  /** One power step: project rows on `v`, reduce per dimension, yielding
    * the UNNORMALIZED 64-row (i, u) frame.
    */
  private def step(emb: DataFrame, v: Column): DataFrame =
    emb.withColumn("s", VectorFolds.dotp(col("vd"), v))
      .select(col("s"), posexplode(col("vd")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(Exact.decSum(col("x") * col("s"), 6).as("u"))

  /** Normalize (i, u) and pack the direction into a one-row array. */
  private def packed(u: DataFrame): DataFrame =
    u.crossJoin(broadcast(
        u.agg(sqrt(Exact.decSum(col("u") * col("u"), 4)).as("nrm"))))
      .select(col("i"), (col("u") / col("nrm")).as("v"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("v")))),
        s => s.getField("v")).as("vl"))

  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    val emb = embT(spark, dir)
    val v0 = array(V0.map(lit): _*)
    val u1 = step(emb, v0)
    val v1 = packed(u1)
    val u2 = step(emb.crossJoin(broadcast(v1)), col("vl"))
    u2.crossJoin(broadcast(
        u2.agg(sqrt(Exact.decSum(col("u") * col("u"), 4)).as("nrm"))))
      .select(col("i"), (col("u") / col("nrm")).as("pc"), col("nrm").as("lam"))
  }

  private def fold(vl: String) =
    s"list_reduce(list_transform(range(1, ${D + 1}), j -> vd[j] * $vl[j]), (a, b) -> a + b)"

  /** The shared power-iteration CTE chain (through u2/n2) — reused by
    * the ABTT oracle so the two queries cannot drift.
    */
  private val powerCtes: String = {
    val v0l = V0.mkString("[", ", ", "]")
    s"""emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |  FROM embeddings
       |), s1 AS (
       |  SELECT vd, ${fold(s"($v0l)")} AS s FROM emb
       |), u1 AS (
       |  SELECT i, ${Exact.duckSum("vd[i + 1] * s", 6)} AS u
       |  FROM s1, (SELECT unnest(range(0, $D)) AS i) GROUP BY i
       |), n1 AS (SELECT sqrt(${Exact.duckSum("u * u", 4)}) AS nrm FROM u1),
       |v1 AS (SELECT i, u / nrm AS v FROM u1, n1),
       |v1l AS (SELECT list(v ORDER BY i) AS vl FROM v1),
       |s2 AS (
       |  SELECT vd, ${fold("vl")} AS s FROM emb, v1l
       |), u2 AS (
       |  SELECT i, ${Exact.duckSum("vd[i + 1] * s", 6)} AS u
       |  FROM s2, (SELECT unnest(range(0, $D)) AS i) GROUP BY i
       |), n2 AS (SELECT sqrt(${Exact.duckSum("u * u", 4)}) AS nrm FROM u2)""".stripMargin
  }

  val pcaPowerSql: String =
    s"""WITH $powerCtes
       |SELECT CAST(i AS INT) AS i, u / nrm AS pc, nrm AS lam
       |FROM u2, n2""".stripMargin

  /** The #96 direction packed into a one-row broadcastable array. */
  private def pcPacked(spark: SparkSession, dir: String): DataFrame =
    pcaPower(spark, dir)
      .agg(transform(array_sort(collect_list(struct(col("i"), col("pc")))),
        s => s.getField("pc")).as("pcl"))

  /** #109: all-but-the-top common-component removal (Mu & Viswanath,
    * ICLR'18) — the standard embedding postprocess: learned spaces
    * concentrate mass on a common direction that drowns cosine
    * similarity, so each vector sheds its projection on the top PC:
    * x' = x − (x·u)·u, with u from the #96 power iteration.
    *
    * Plan: the direction is a one-row broadcast; the removal is a
    * MAP-ONLY pass over the embedding table (one fused dot fold + one
    * fma-shaped projection per component) — scan-speed at any scale,
    * zero shuffle beyond #96's own constant-size reductions.
    *
    * Exactness: u's doubles are bit-identical in both engines (#96 is
    * hash-exact), the row fold follows the sequential [[VectorFolds]]
    * contract, and x − (proj·u_i) is two correctly-rounded ops mirrored
    * in literal order — no quantization needed anywhere in the removal.
    */
  def abtt(spark: SparkSession, dir: String): DataFrame =
    embT(spark, dir)
      .crossJoin(broadcast(pcPacked(spark, dir)))
      .withColumn("proj", VectorFolds.dotp(col("vd"), col("pcl")))
      .select(col("vec_id"), col("proj"), col("pcl"),
        posexplode(col("vd")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"), col("proj"), col("x"),
        (col("x") - col("proj") * element_at(col("pcl"), col("i") + 1)).as("x1"))

  val abttSql: String =
    s"""WITH $powerCtes,
       |pc AS (SELECT list(u / nrm ORDER BY i) AS pcl FROM u2, n2),
       |pr AS (
       |  SELECT vec_id, vd,
       |    list_reduce(list_transform(range(1, ${D + 1}),
       |      j -> vd[j] * pcl[j]), (a, b) -> a + b) AS proj,
       |    pcl
       |  FROM emb, pc
       |)
       |SELECT vec_id, CAST(i AS INT) AS i, proj, vd[i + 1] AS x,
       |  vd[i + 1] - (proj * pcl[i + 1]) AS x1
       |FROM pr, (SELECT unnest(range(0, $D)) AS i)""".stripMargin
}
