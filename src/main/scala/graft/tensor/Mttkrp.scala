package graft.tensor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PortableHash
import graft.rdf.Dict

/** #21: one MTTKRP step (matricized-tensor times Khatri-Rao product) over
  * the boolean TPC-H COO tensor with fixed dyadic factor matrices — the
  * workhorse kernel of CP/PARAFAC decomposition.
  *
  * Reference: the README's planned PARAFAC algorithm (GigaTensor /
  * HaTen2 style); the reference's tensor layout is
  * python/sansa/ml/kbc/rdfio.py:52-89 (COO (i,j,k) triples).
  *
  * GigaTensor's insight, reproduced here Spark-first: MTTKRP over a
  * sparse boolean tensor is a JOIN + AGG, never a dense contraction —
  *   M(i, r) = Σ_{(i,j,k) ∈ X}  B(j, r) · C(k, r)
  * Per-rank values explode from the encoded COO rows (R small), then one
  * groupBy (i, r). Factors are pure hash functions of (matrix, id, r) so
  * the plan is map + single shuffle; with learned factors B broadcasts
  * (relations are few) and C joins on oid.
  */
object Mttkrp {

  /** CP rank for the oracle-checked step. */
  val R = 4

  def cpMttkrp(spark: SparkSession, dir: String): DataFrame = {
    // One term COLUMN per rank instead of an explode-by-rank: the
    // groupBy(sid) then shuffles nnz rows (R aggregates each), not
    // R·nnz rows — 4× less shuffle volume for R=4, and the map side
    // stays a single codegen'd projection. Rank rows are recovered by a
    // posexplode AFTER aggregation (N_subjects·R tiny rows).
    val terms = (0 until R).map { r =>
      (PortableHash.dyadic(concat_ws("|", lit("B"), col("pid"), lit(r.toString))) *
        PortableHash.dyadic(concat_ws("|", lit("C"), col("oid"), lit(r.toString))))
        .as(s"_t$r")
    }
    val sums = (0 until R).map(r => sum(col(s"_t$r")).as(s"_m$r"))
    Dict.encodedTriples(spark, dir)
      .select(col("sid") +: col("pid") +: col("oid") +: terms: _*)
      .groupBy("sid")
      .agg(sums.head, sums.tail: _*) // dyadic terms: exact in any order
      .select(col("sid"),
        posexplode(array((0 until R).map(r => col(s"_m$r")): _*)).as(Seq("r", "m")))
      .select(col("sid"), col("r").cast("int").as("r"), col("m"))
  }

  val cpMttkrpSql: String = {
    val b = PortableHash.duckDyadic("'B|' || pid || '|' || r")
    val c = PortableHash.duckDyadic("'C|' || oid || '|' || r")
    s"""${Dict.preludeCtes}
       |SELECT sid, CAST(r AS INT) AS r, SUM($b * $c) AS m
       |FROM encoded, (SELECT unnest(range(0, $R)) AS r)
       |GROUP BY sid, r""".stripMargin
  }
}
