package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector helpers: sequential double folds and random-hyperplane
  * LSH bucketing with pHash-derived dyadic planes (seed `P|plane|dim`).
  * Used by both the embedding-dedup and ANN operators so the two agree on
  * the bucket function.
  */
object VectorLsh {

  val EmbDim = 64
  val NPlanes = 4

  /** Sequential double left-fold (oracle mirror: DuckDB list_reduce). */
  def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  // dot/norm run through the native codegen'd folds — bit-identical to
  // the aggregate/zip_with formulation (same sequential IEEE sequence,
  // see org.apache.spark.sql.graft.VectorFolds) without the interpreted
  // HOF lambda calls and intermediate arrays.
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFolds.dotp(a, b)

  def norm(a: Column): Column =
    sqrt(org.apache.spark.sql.graft.VectorFolds.sumSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed projection of `v` onto dyadic hyperplane `p`. The plane is a
    * driver-side literal array (the hyperplanes are constants — hashing
    * them per row would be pure waste).
    */
  def planeDot(v: Column, p: Int): Column = {
    val plane = array((0 until EmbDim).map(i =>
      lit(PortableHash.dyadicJvm(s"P|$p|$i"))): _*)
    dot(v, plane)
  }

  /** LSH bucket id in [0, 2^NPlanes): bit p = sign(v · plane_p). */
  def bucket(v: Column): Column =
    (0 until NPlanes).map(p => when(planeDot(v, p) > 0, 1 << p).otherwise(0))
      .reduce(_ + _)

  // ---------------------------------------------------------------- oracle

  /** DuckDB left-fold over 1..EmbDim mirroring [[fold]]. */
  def duckFold(term: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${EmbDim + 1}), i -> ($term))), (acc, x) -> acc + x)"

  /** DuckDB CTE fragment: embeddings as double lists + LSH bucket. */
  val duckBucketed: String = {
    val planeEl = PortableHash.duckDyadic("'P|' || p || '|' || (i - 1)")
    s"""ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), pd AS MATERIALIZED (
       |  SELECT vec_id, v, p, ${duckFold("v[i] * " + planeEl)} AS dot
       |  FROM ve, (SELECT unnest(range(0, $NPlanes)) AS p)
       |), bk AS MATERIALIZED (
       |  SELECT vec_id, v,
       |    CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
       |  FROM pd GROUP BY vec_id, v
       |)""".stripMargin
  }
}
