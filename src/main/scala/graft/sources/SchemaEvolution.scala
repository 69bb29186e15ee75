package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** #323: ADDITIVE SCHEMA EVOLUTION across table snapshots — the
  * lakehouse read path every long-lived table eventually needs: an old
  * snapshot written BEFORE a column existed and a new snapshot carrying
  * the added column live in one table directory, and a single read must
  * plan the UNIFIED schema (Parquet `mergeSchema`), back-filling the
  * missing column with NULL for old files instead of failing or
  * silently dropping it. This op proves that path end to end with real
  * parquet writes: snapshot 1 = orders before the cutoff date written
  * WITHOUT the priority column; snapshot 2 = the rest written WITH it;
  * both land under one directory as `snap=N` partitions, read back with
  * mergeSchema, and the registered output is the per-snapshot audit
  * (row count, NULL-backfill count, exact cent-grid value checksum) a
  * migration sign-off reads.
  *
  * Scale shape: schema merge happens at PLANNING time over file footers
  * (no data pass); the audit aggregate reads only the referenced
  * columns (pruned scan) and the `snap=` partition directories prune on
  * any per-snapshot predicate. The NULL backfill is free — it never
  * materializes in the files. Exactness: counts and the cent-grid
  * checksum are pure integers.
  */
object SchemaEvolution {

  /** Snapshot-2 cutoff: orders on/after this date carry the new column. */
  val Cutoff = "1997-01-01 00:00:00"

  def evolutionAudit(spark: SparkSession, dir: String): DataFrame = {
    // Snapshots staged ONCE per (session, dir) via the TempDirs registry
    // (shutdown-hook cleanup): in production the two-schema table exists
    // before anyone audits it, so repeated calls measure the mergeSchema
    // READ path, not the staging writes (ADVICE r7).
    val out = graft.core.TempDirs.stagedFor((spark, dir, "evo"), "graft_evo_") {
      out =>
        val cut = lit(java.sql.Timestamp.valueOf(Cutoff))
        val base = Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
            col("o_orderpriority"))
        // snapshot 1: written before the column existed
        base.filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$out/snap=1")
        // snapshot 2: the schema gained `priority`
        base.filter(col("o_orderdate") >= cut)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority").as("priority"))
          .write.mode("overwrite").parquet(s"$out/snap=2")
    }

    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("snap").cast("long").as("snap"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("priority").isNull, 1L).otherwise(0L))
          .as("null_priority"),
        countDistinct(col("priority")).as("n_priorities"),
        sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("price_cents"))
  }

  val evolutionAuditSql: String =
    s"""SELECT 1 AS snap, COUNT(*) AS n_rows,
       |  COUNT(*) AS null_priority,
       |  0 AS n_priorities,
       |  CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
       |    AS BIGINT) AS price_cents
       |FROM orders WHERE o_orderdate < TIMESTAMP '$Cutoff'
       |UNION ALL
       |SELECT 2 AS snap, COUNT(*) AS n_rows,
       |  0 AS null_priority,
       |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       |  CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
       |    AS BIGINT) AS price_cents
       |FROM orders WHERE o_orderdate >= TIMESTAMP '$Cutoff'""".stripMargin
}
