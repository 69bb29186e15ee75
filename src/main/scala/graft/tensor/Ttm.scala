package graft.tensor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PortableHash
import graft.rdf.Dict

/** #87: mode-3 tensor-times-matrix (TTM) over the boolean TPC-H COO
  * tensor with a fixed dyadic relation-side matrix — the Tucker-family
  * contraction kernel that complements [[Mttkrp]]'s CP kernel (HaTen2
  * ships exactly this pair of primitives for its shared-backend CP and
  * Tucker decompositions; tensor layout per rdfio.py:52-89).
  *
  *   Y(i, j, c) = Σ_k X(i, j, k) · M(k, c)
  *
  * Spark-first, GigaTensor-style: over a sparse boolean tensor the
  * contraction is a broadcast-sized hash lookup + one keyed aggregate,
  * never a dense intermediate — only the nonzero (i, j) fibers appear.
  * Same shuffle trick as MTTKRP: one term column per output column c,
  * groupBy (sid, oid), posexplode AFTER aggregation — the shuffle
  * carries nnz rows with C aggregates each, not C·nnz rows. M's entries
  * are dyadic hash values, so the per-fiber sums (≤ |relations| terms)
  * are exact in double in any order — no quantization, the oracle is a
  * plain SUM.
  *
  * Scale (100 TB): encoded triples arrive sid-partitioned, the groupBy
  * (sid, oid) is one shuffle with map-side partial aggregation; with a
  * LEARNED M (relations are dictionary-few) M broadcasts exactly like
  * the hash-derived one here.
  */
object Ttm {

  /** Output columns of M (Tucker mode-3 rank for the oracle step). */
  val C = 4

  def ttm(spark: SparkSession, dir: String): DataFrame = {
    val terms = (0 until C).map { c =>
      PortableHash.dyadic(
        concat_ws("|", lit("TTM"), col("pid"), lit(c.toString))).as(s"_t$c")
    }
    val sums = (0 until C).map(c => sum(col(s"_t$c")).as(s"_y$c"))
    Dict.encodedTriples(spark, dir)
      .select(col("sid") +: col("oid") +: col("pid") +: terms: _*)
      .groupBy("sid", "oid")
      .agg(sums.head, sums.tail: _*) // dyadic terms: exact in any order
      .select(col("sid"), col("oid"),
        posexplode(array((0 until C).map(c => col(s"_y$c")): _*)).as(Seq("c", "y")))
      .select(col("sid"), col("oid"), col("c").cast("int").as("c"), col("y"))
  }

  val ttmSql: String = {
    val m = PortableHash.duckDyadic("'TTM|' || pid || '|' || c")
    s"""${Dict.preludeCtes}
       |SELECT sid, oid, CAST(c AS INT) AS c, SUM($m) AS y
       |FROM encoded, (SELECT unnest(range(0, $C)) AS c)
       |GROUP BY sid, oid, c""".stripMargin
  }
}
