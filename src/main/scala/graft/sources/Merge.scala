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

  // ------------------------------------------ #175 snapshot diff/reconcile

  /** #175: table-version reconciliation — the diff report between two
    * snapshots of a keyed table (the Delta/Iceberg "what changed between
    * version N and N+1" audit, and the regression gate a pipeline runs
    * after republishing a table): rows added / removed / value-changed /
    * unchanged, as a bounded (metric, n) report. Run here against the
    * #146 MERGE output versus its base — so the diff doubles as the
    * merge's independent audit (adds ≡ inserts, removals ≡ deletes,
    * changes ≡ updates whose payload actually moved — an op=U row with
    * a zero delta is correctly reported UNCHANGED: the diff measures
    * VALUES, not change-feed labels).
    *
    * Plan (100 TB shape): ONE full-outer shuffle join on the key — the
    * same join MERGE itself compiles to, co-located for free on a
    * key-bucketed layout — then a single aggregate pass computing every
    * count conditionally (the #164 one-pass trick). Output is bounded
    * by the metric list, never the data.
    */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_acctbal").cast("double").as("v1"))
    val next = mergeUpsert(spark, dir).select(col("key"), col("bal").as("v2"))
    base.join(next, Seq("key"), "full_outer")
      .agg(
        count(col("v1")).as("n_base"),
        count(col("v2")).as("n_new"),
        count(when(col("v1").isNull, 1)).as("added"),
        count(when(col("v2").isNull, 1)).as("removed"),
        count(when(col("v1").isNotNull && col("v2").isNotNull &&
          col("v1") =!= col("v2"), 1)).as("changed"),
        count(when(col("v1").isNotNull && col("v2").isNotNull &&
          col("v1") === col("v2"), 1)).as("unchanged"))
      .select(expr(
        """stack(6, 'n_base', n_base, 'n_new', n_new, 'added', added,
          |'removed', removed, 'changed', changed,
          |'unchanged', unchanged) as (metric, n)""".stripMargin))
  }

  val tableDiffSql: String =
    s"""WITH merged AS ($mergeUpsertSql),
       |b AS (SELECT c_custkey AS key, CAST(c_acctbal AS DOUBLE) AS v1 FROM customer),
       |n AS (SELECT key, bal AS v2 FROM merged),
       |agg AS (
       |  SELECT COUNT(v1) AS n_base, COUNT(v2) AS n_new,
       |    COUNT(CASE WHEN v1 IS NULL THEN 1 END) AS added,
       |    COUNT(CASE WHEN v2 IS NULL THEN 1 END) AS removed,
       |    COUNT(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL
       |               AND v1 <> v2 THEN 1 END) AS changed,
       |    COUNT(CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL
       |               AND v1 = v2 THEN 1 END) AS unchanged
       |  FROM b FULL OUTER JOIN n USING (key)
       |)
       |SELECT 'n_base' AS metric, n_base AS n FROM agg
       |UNION ALL SELECT 'n_new', n_new FROM agg
       |UNION ALL SELECT 'added', added FROM agg
       |UNION ALL SELECT 'removed', removed FROM agg
       |UNION ALL SELECT 'changed', changed FROM agg
       |UNION ALL SELECT 'unchanged', unchanged FROM agg""".stripMargin

  // ----------------------------------- #208 incremental view maintenance

  /** #208: INCREMENTAL materialized-view maintenance — the delta-apply
    * algebra under every Delta Live Tables / Materialize / Flink
    * dynamic-table pipeline: a per-segment aggregate view of the
    * customer table (n_cust, sum_bal) is maintained under the #146 CDC
    * batch by applying DELTAS, never rescanning the base. Each change
    * row becomes a signed contribution — update: (0, +δ) to its
    * segment; delete: (−1, −old_bal); insert: (+1, +δ) into a
    * hash-assigned segment — and the new view is the old view plus the
    * aggregated deltas, combined on the (bounded) group key.
    *
    * Why it matters at 100 TB: the full recompute rescans the base
    * table per refresh; the delta path touches ONLY the change batch
    * plus one (broadcastable) join against the base for the old values
    * of updated/deleted keys, and the view-combine moves one row per
    * GROUP, not per base row. Sum/count are self-maintainable
    * aggregates (the classic IVM result — min/max are not: a deleted
    * max forces a rescan, which is why production IVM engines track
    * auxiliary state for them; documented, not implemented).
    *
    * THE correctness claim is the oracle itself: DuckDB recomputes the
    * view FROM THE MERGED TABLE (full recompute); the hash match IS
    * the incremental ≡ full proof, per segment, to the cent.
    */
  def viewDeltaMaintain(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val segs = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY").map(lit): _*)
    val base = cust.select(col("c_custkey").as("key"),
      col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
    // the #146 change feed, verbatim (same op/delta derivation)
    val h = PortableHash.pHash(concat(lit("chg"), col("c_custkey"))) % 10
    val hDelta = (PortableHash.pHash(concat(lit("amt"), col("c_custkey"))) % 1000)
      .cast("double") / 4.0
    val src = cust.select(col("c_custkey"), h.as("h"), hDelta.as("delta"))
    val cents = (c: org.apache.spark.sql.Column) =>
      floor(c * 100.0 + 0.5).cast("long")

    // deltas: updates/deletes look up their OLD row (the only join);
    // inserts carry a hash-assigned segment
    val ud = src.filter(col("h") <= 5)
      .select(col("c_custkey").as("key"), col("h"), col("delta"))
      .join(base, "key")
      .select(col("seg"),
        when(col("h") === 5, lit(-1L)).otherwise(lit(0L)).as("dn"),
        when(col("h") === 5, -cents(col("bal")))
          .otherwise(cents(col("bal") + col("delta")) - cents(col("bal")))
          .as("dbal"))
    val ins = src.filter(col("h") === 6)
      .select(element_at(segs,
          (PortableHash.pHash(concat(lit("seg"), col("c_custkey"))) % 5)
            .cast("int") + 1).as("seg"),
        lit(1L).as("dn"), cents(col("delta")).as("dbal"))
    val deltaView = ud.unionByName(ins)
      .groupBy("seg").agg(sum("dn").as("dn"), sum("dbal").as("dbal"))

    val baseView = base.groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(cents(col("bal"))).as("sbal"))
    baseView.join(deltaView, Seq("seg"), "full_outer")
      .select(col("seg"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_cust"),
        ((coalesce(col("sbal"), lit(0L)) + coalesce(col("dbal"), lit(0L)))
          .cast("double") / 100.0).as("sum_bal"))
  }

  val viewDeltaMaintainSql: String = {
    val h = PortableHash.duck("'chg' || c_custkey")
    val delta = s"(${PortableHash.duck("'amt' || c_custkey")} % 1000) / 4.0"
    val segPick = s"['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY']" +
      s"[CAST(${PortableHash.duck("'seg' || c_custkey")} % 5 AS INT) + 1]"
    // FULL RECOMPUTE from the merged table — the incremental ≡ full claim
    s"""WITH src AS (
       |  SELECT c_custkey, $h % 10 AS h, $delta AS delta, c_mktsegment, c_acctbal
       |  FROM customer
       |), merged AS (
       |  SELECT c_mktsegment AS seg,
       |    CASE WHEN h <= 4 THEN c_acctbal + delta ELSE c_acctbal END AS bal
       |  FROM src WHERE h <> 5
       |  UNION ALL
       |  SELECT $segPick AS seg, delta AS bal FROM src WHERE h = 6
       |)
       |SELECT seg, COUNT(*) AS n_cust,
       |  CAST(SUM(CAST(floor(bal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
       |    AS sum_bal
       |FROM merged GROUP BY seg""".stripMargin
  }
}
