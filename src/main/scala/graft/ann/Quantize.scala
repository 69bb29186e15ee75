package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, VectorLsh}

/** Scalar int8 embedding quantization — the serving-storage sibling of
  * the PQ ladder ([[Ann.pqTopK]]): symmetric per-vector absmax
  * quantization (code_i = round(v_i·127/absmax), the standard int8
  * embedding-store layout), reported with the reconstruction error that
  * decides whether a corpus can serve int8.
  *
  * Per-vector work is a fixed-width codegen'd HOF chain — map-only, no
  * shuffle at all — so at 100 TB this runs at scan speed and writes
  * 64 bytes + 1 scale per vector (4× smaller than float32, vs PQ's 24×
  * with far lower recall loss).
  *
  * Output pins every code without an array-typed compare: the codes'
  * plain and index-weighted integer sums (exact, order-independent) plus
  * min/max, and the quantized-error SSE on the 1e-12 grid (each squared
  * error term is half-up-quantized then integer-summed — the
  * [[graft.core.Exact]] strategy, so the double sum is engine-exact).
  *
  * The divide-then-half-up rounding (floor(v/s + 0.5)) and every product
  * are correctly-rounded IEEE ops mirrored in literal order by the
  * oracle; a zero vector (absmax = 0) quantizes to all-zero codes.
  */
object Quantize {

  val D = VectorLsh.EmbDim
  private val S12 = 1.0e12

  /** #86: (vec_id, qscale, code stats, sse) for the whole table. */
  def int8(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("vd"))
      .withColumn("amax", array_max(transform(col("vd"), abs(_))))
      .withColumn("qscale", col("amax") / lit(127.0))
      .withColumn("codes", transform(col("vd"), v =>
        when(col("amax") === 0.0, lit(0L))
          .otherwise(floor(v / col("qscale") + lit(0.5)).cast("long"))))
      .withColumn("errs", zip_with(col("vd"), col("codes"), (v, c) =>
        floor((v - c.cast("double") * col("qscale")) *
          (v - c.cast("double") * col("qscale")) * lit(S12) + lit(0.5))
          .cast("long")))
      .select(
        col("vec_id"),
        col("qscale"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
        aggregate(transform(col("codes"), (x, i) =>
          (i + 1).cast("long") * x), lit(0L), (a, x) => a + x).as("code_wsum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"),
        (aggregate(col("errs"), lit(0L), (a, x) => a + x).cast("double") /
          lit(S12)).as("sse"))

  val int8Sql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |  FROM embeddings
       |), a AS (
       |  SELECT vec_id, vd, list_max(list_transform(vd, x -> abs(x))) AS amax
       |  FROM v
       |), q AS (
       |  SELECT vec_id, vd, amax, amax / 127.0 AS qscale FROM a
       |), c AS (
       |  SELECT vec_id, vd, qscale,
       |    list_transform(vd, x -> CASE WHEN amax = 0.0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(floor(x / qscale + 0.5) AS BIGINT) END) AS codes
       |  FROM q
       |)
       |SELECT vec_id, qscale,
       |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
       |  CAST(list_sum(list_transform(range(1, $D + 1),
       |    i -> CAST(i AS BIGINT) * codes[i])) AS BIGINT) AS code_wsum,
       |  CAST(list_min(codes) AS BIGINT) AS code_min,
       |  CAST(list_max(codes) AS BIGINT) AS code_max,
       |  CAST(list_sum(list_transform(range(1, $D + 1),
       |    i -> CAST(floor((vd[i] - CAST(codes[i] AS DOUBLE) * qscale) *
       |      (vd[i] - CAST(codes[i] AS DOUBLE) * qscale) * 1.0E12 + 0.5) AS BIGINT)))
       |    AS DOUBLE) / 1.0E12 AS sse
       |FROM c""".stripMargin
}
