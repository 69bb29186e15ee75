package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables, VectorLsh}

/** Johnson–Lindenstrauss random projection: reduce the 64-d embeddings
  * to [[M]] dimensions with a sparse sign matrix — the standard
  * cheap-preprocessing step before ANN indexing, clustering or
  * near-dup search when the native dimension is too wide (JL: pairwise
  * geometry survives projection onto O(log n / ε²) random directions;
  * Achlioptas 2001 showed ±1/0 entries suffice — no Gaussians needed).
  *
  * The projection matrix entries are pHash-derived in {−1, 0, +1}
  * (seed `RP|j|i`), so products are exact sign flips of the input
  * floats and each output component is ONE codegen'd sequential dot
  * fold of v against a literal constant array — the same
  * [[VectorLsh.planeDot]] shape the LSH bucketer uses; the DuckDB
  * oracle replays the identical IEEE fold, so the projection needs NO
  * quantization anywhere. The conventional √(3/m)-style rescale is a
  * single scalar deferred to the consumer (keeping it out preserves
  * exactness and changes no downstream ranking).
  *
  * 100 TB shape: map-only, zero shuffle, scan-speed — the projection
  * fuses into whatever scan feeds it; at 1e9+ vectors this is the
  * difference between indexing 64 floats/vec and 8.
  */
object RandomProjection {

  val M = 8

  private def rp(j: Int, i: Int): Double =
    (PortableHash.pHashJvm(s"RP|$j|$i") % 3 - 1).toDouble

  /** #138: (vec_id, y_0..y_7) projected embeddings. */
  def project(spark: SparkSession, dir: String): DataFrame = {
    val ve = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val ys = (0 until M).map { j =>
      val row = array((0 until VectorLsh.EmbDim).map(i => lit(rp(j, i))): _*)
      VectorLsh.dot(col("v"), row).as(s"y_$j")
    }
    ve.select(col("vec_id") +: ys: _*)
  }

  val projectSql: String = {
    val ys = (0 until M).map { j =>
      val c = s"CAST((${PortableHash.duck(s"'RP|$j|' || (i-1)")} % 3 - 1) AS DOUBLE)"
      s"${VectorLsh.duckFold(s"v[i] * $c")} AS y_$j"
    }
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |)
       |SELECT vec_id,
       |  ${ys.mkString(",\n  ")}
       |FROM ve""".stripMargin
  }
}
