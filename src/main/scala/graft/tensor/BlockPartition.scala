package graft.tensor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Dict

/** #39: three-way tensor block partitioning — the Spark-first analog of
  * the reference's `ThreeWayTensorPartitioner`
  * (python/sansa/ml/kbc/rdfio.py:11-34): COO coordinates (i, j, k) =
  * (sid, oid, pid) map to a dense block id
  *
  *   bid = i/ps1 + (j/ps2)·pn1 + (k/ps3)·pn2·pn1      (integer division)
  *
  * with fixed block sizes ps and per-mode block counts pn = ⌈dim/ps⌉.
  *
  * Spark-first: the reference installs this as an RDD `Partitioner`; in
  * DataFrame land the same layout is `repartition(col("bid"))` (or a
  * bucketed write on bid) before block-local tensor kernels. The
  * registered query materializes the block HISTOGRAM (bid → nnz and the
  * block's coordinate ranges), which is both the partitioner's contract
  * (every entry maps to exactly one block) and the skew diagnostic you
  * want before launching a blocked factorization at 100 TB.
  */
object BlockPartition {

  /** Block sizes per mode (subject, object, relation). Constants of the
    * layout, like [[Dict.NBuckets]] — ids only stay comparable across
    * engines/runs for equal block sizes.
    */
  val PsI = 4096L
  val PsJ = 4096L
  val PsK = 2L

  def blockPartition(spark: SparkSession, dir: String): DataFrame = {
    val nEnt = Dict.entities(spark, dir)
      .agg(count(lit(1)).as("n_ent"))
    val nRel = Dict.relations(spark, dir)
      .agg(count(lit(1)).as("n_rel"))
    // pn1/pn2 = ⌈n_ent/ps⌉ via long arithmetic (matches math.ceil on
    // exact integers, no float detour).
    Dict.encodedTriples(spark, dir)
      .crossJoin(broadcast(nEnt)).crossJoin(broadcast(nRel))
      .withColumn("pn1", expr(s"(n_ent + ${PsI - 1}) div $PsI"))
      .withColumn("pn2", expr(s"(n_ent + ${PsJ - 1}) div $PsJ"))
      .withColumn("bid",
        expr(s"sid div $PsI") + expr(s"oid div $PsJ") * col("pn1") +
          expr(s"pid div $PsK") * col("pn2") * col("pn1"))
      .groupBy("bid")
      .agg(
        count(lit(1)).as("nnz"),
        min("sid").as("min_sid"), max("sid").as("max_sid"),
        min("oid").as("min_oid"), max("oid").as("max_oid"),
        min("pid").as("min_pid"), max("pid").as("max_pid"))
  }

  val blockPartitionSql: String =
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |r AS (SELECT COUNT(*) AS n_rel FROM relations),
       |pn AS (SELECT CAST((n_ent + ${PsI - 1}) // $PsI AS BIGINT) AS pn1,
       |              CAST((n_ent + ${PsJ - 1}) // $PsJ AS BIGINT) AS pn2
       |       FROM n)
       |SELECT (sid // $PsI) + (oid // $PsJ) * pn1 + (pid // $PsK) * pn2 * pn1 AS bid,
       |  COUNT(*) AS nnz,
       |  MIN(sid) AS min_sid, MAX(sid) AS max_sid,
       |  MIN(oid) AS min_oid, MAX(oid) AS max_oid,
       |  MIN(pid) AS min_pid, MAX(pid) AS max_pid
       |FROM encoded, pn
       |GROUP BY 1""".stripMargin
}
