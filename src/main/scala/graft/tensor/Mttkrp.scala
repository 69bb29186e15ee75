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

  def cpMttkrp(spark: SparkSession, dir: String): DataFrame =
    Dict.encodedTriples(spark, dir)
      .select(col("sid"), col("pid"), col("oid"),
        explode(sequence(lit(0), lit(R - 1))).as("r"))
      .withColumn("term",
        PortableHash.dyadic(concat_ws("|", lit("B"), col("pid"), col("r"))) *
          PortableHash.dyadic(concat_ws("|", lit("C"), col("oid"), col("r"))))
      .groupBy("sid", "r")
      .agg(sum("term").as("m")) // dyadic terms: exact in any order
      .select(col("sid"), col("r").cast("int").as("r"), col("m"))

  val cpMttkrpSql: String = {
    val b = PortableHash.duckDyadic("'B|' || pid || '|' || r")
    val c = PortableHash.duckDyadic("'C|' || oid || '|' || r")
    s"""${Dict.preludeCtes}
       |SELECT sid, CAST(r AS INT) AS r, SUM($b * $c) AS m
       |FROM encoded, (SELECT unnest(range(0, $R)) AS r)
       |GROUP BY sid, r""".stripMargin
  }
}
