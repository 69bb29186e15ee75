package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** MERGE INTO / CDC-apply — the lakehouse upsert primitive (Delta/
  * Iceberg/Hudi `MERGE`): apply a change batch (updates, deletes,
  * inserts) to a base table in one pass. Every warehouse ingest loop is
  * this operator; graft expresses it as the JOIN it compiles to in every
  * engine, with no table format required.
  *
  * The change batch here is pHash-derived from the base (deterministic,
  * oracle-checkable): per customer, h = pHash('chg' || key) % 10 picks
  * update (0-4: balance += h'), delete (5), or no change; keys with
  * h = 6 ALSO produce an insert of a brand-new customer (key + 10^7).
  * A real feed supplies the same (op, key, payload) shape from CDC.
  *
  * Semantics (standard MERGE): WHEN MATCHED AND op='D' THEN DELETE;
  * WHEN MATCHED AND op='U' THEN UPDATE; WHEN NOT MATCHED THEN INSERT.
  *
  * Plan (100 TB shape): ONE full-outer shuffle join on the merge key —
  * at scale this is exactly what Delta/Iceberg MERGE compiles to, and
  * the join co-locates for free when the base is bucketed on the key
  * (#114's layout: the merge becomes exchange-free on the base side).
  * The change batch is usually small → broadcast; the full-outer form
  * is kept because CDC inserts force the outer side anyway. Row-level
  * status is emitted so the result doubles as the merge AUDIT table.
  */
object Merge {

  /** #146: the merged customer table (key, acctbal, status). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
    val h = PortableHash.pHash(concat(lit("chg"), col("c_custkey"))) % 10
    val hDelta = (PortableHash.pHash(concat(lit("amt"), col("c_custkey"))) % 1000)
      .cast("double") / 4.0 // dyadic delta
    val src = Tables.customer(spark, dir)
      .select(col("c_custkey"), h.as("h"), hDelta.as("delta"))
    val changes = src.filter(col("h") <= 5)
      .select(col("c_custkey").as("key"),
        when(col("h") === 5, lit("D")).otherwise(lit("U")).as("op"),
        col("delta"))
      .unionByName(src.filter(col("h") === 6)
        .select((col("c_custkey") + 10000000L).as("key"),
          lit("I").as("op"), col("delta")))
    base.join(changes, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("key"),
        when(col("op") === "U", col("bal") + col("delta"))
          .when(col("op") === "I", col("delta"))
          .otherwise(col("bal")).as("bal"),
        coalesce(col("op"), lit("K")).as("status")) // K = kept unchanged
  }

  val mergeUpsertSql: String = {
    val h = PortableHash.duck("'chg' || c_custkey")
    val delta = s"(${PortableHash.duck("'amt' || c_custkey")} % 1000) / 4.0"
    s"""WITH src AS (
       |  SELECT c_custkey, $h % 10 AS h, $delta AS delta FROM customer
       |), changes AS (
       |  SELECT c_custkey AS key,
       |    CASE WHEN h = 5 THEN 'D' ELSE 'U' END AS op, delta
       |  FROM src WHERE h <= 5
       |  UNION ALL
       |  SELECT c_custkey + 10000000 AS key, 'I' AS op, delta
       |  FROM src WHERE h = 6
       |), base AS (
       |  SELECT c_custkey AS key, c_acctbal AS bal FROM customer
       |)
       |SELECT COALESCE(base.key, changes.key) AS key,
       |  CASE WHEN op = 'U' THEN bal + delta
       |       WHEN op = 'I' THEN delta
       |       ELSE bal END AS bal,
       |  COALESCE(op, 'K') AS status
       |FROM base FULL OUTER JOIN changes ON base.key = changes.key
       |WHERE op IS NULL OR op <> 'D'""".stripMargin
  }
}
