package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * contract, as Spark-first aggregation): a suite of named constraints —
  * key uniqueness, completeness, accepted values, value ranges,
  * referential integrity — each reported as (check, n_rows,
  * n_violations, pass). The gate a production pipeline runs BEFORE
  * publishing a table version; the report doubles as the data-contract
  * audit artifact.
  */
object DataQuality {

  /** #164: the constraint suite over the star schema's core tables.
    *
    * Scale shape (the Deequ trick): all single-table constraints on a
    * table compute in ONE aggregate pass — violations are conditional
    * counts, so a table is scanned once no matter how many checks it
    * carries (the uniqueness check rides the same pass as a distinct
    * count). Referential checks are anti-join counts keyed on the FK —
    * broadcast when the parent is dimension-sized, shuffle otherwise.
    * Output is one row per check: bounded by the suite, not the data.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)

    // --- single-table suites: ONE aggregate pass per table
    val ordersPass = o.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      sum(when(!col("o_orderstatus").isin("P", "O", "F"), 1L).otherwise(0L))
        .as("bad_status"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("bad_price"))
    val lineitemPass = l.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
        .as("pk_dup"),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("bad_qty"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
        .otherwise(0L)).as("bad_disc"))

    // --- referential integrity: anti-join counts keyed on the FK
    val fkLineOrders = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkOrdersCust = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkCustNation = c.join(broadcast(n),
        c("c_nationkey") === n("n_nationkey"), "left_anti")
      .agg(count(lit(1)).as("v"))

    def fromPass(pass: DataFrame, checks: (String, String)*): DataFrame =
      checks.map { case (check, violCol) =>
        pass.select(lit(check).as("check_name"), col("n").as("n_rows"),
          col(violCol).cast("long").as("n_violations"))
      }.reduce(_ unionByName _)
    def fromFk(check: String, parentRows: DataFrame, v: DataFrame): DataFrame =
      parentRows.agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(v))
        .select(lit(check).as("check_name"), col("n").as("n_rows"),
          col("v").cast("long").as("n_violations"))

    fromPass(ordersPass,
        "orders_pk_unique" -> "pk_dup",
        "orders_custkey_complete" -> "null_cust",
        "orders_status_accepted" -> "bad_status",
        "orders_totalprice_positive" -> "bad_price")
      .unionByName(fromPass(lineitemPass,
        "lineitem_pk_unique" -> "pk_dup",
        "lineitem_qty_range" -> "bad_qty",
        "lineitem_discount_range" -> "bad_disc"))
      .unionByName(fromFk("lineitem_fk_orders", l, fkLineOrders))
      .unionByName(fromFk("orders_fk_customer", o, fkOrdersCust))
      .unionByName(fromFk("customer_fk_nation", c, fkCustNation))
      .withColumn("pass", col("n_violations") === 0L)
  }

  val dqChecksSql: String =
    s"""WITH op AS (
       |  SELECT COUNT(*) AS n,
       |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup,
       |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
       |    SUM(CASE WHEN o_orderstatus NOT IN ('P', 'O', 'F') THEN 1 ELSE 0 END)
       |      AS bad_status,
       |    SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS bad_price
       |  FROM orders
       |), lp AS (
       |  SELECT COUNT(*) AS n,
       |    COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS pk_dup,
       |    SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END)
       |      AS bad_qty,
       |    SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END)
       |      AS bad_disc
       |  FROM lineitem
       |)
       |SELECT check_name, n_rows, n_violations, n_violations = 0 AS pass FROM (
       |  SELECT 'orders_pk_unique' AS check_name, n AS n_rows,
       |    CAST(pk_dup AS BIGINT) AS n_violations FROM op
       |  UNION ALL SELECT 'orders_custkey_complete', n,
       |    CAST(null_cust AS BIGINT) FROM op
       |  UNION ALL SELECT 'orders_status_accepted', n,
       |    CAST(bad_status AS BIGINT) FROM op
       |  UNION ALL SELECT 'orders_totalprice_positive', n,
       |    CAST(bad_price AS BIGINT) FROM op
       |  UNION ALL SELECT 'lineitem_pk_unique', n,
       |    CAST(pk_dup AS BIGINT) FROM lp
       |  UNION ALL SELECT 'lineitem_qty_range', n,
       |    CAST(bad_qty AS BIGINT) FROM lp
       |  UNION ALL SELECT 'lineitem_discount_range', n,
       |    CAST(bad_disc AS BIGINT) FROM lp
       |  UNION ALL SELECT 'lineitem_fk_orders',
       |    (SELECT COUNT(*) FROM lineitem),
       |    (SELECT COUNT(*) FROM lineitem l
       |     WHERE NOT EXISTS (SELECT 1 FROM orders o
       |       WHERE o.o_orderkey = l.l_orderkey))
       |  UNION ALL SELECT 'orders_fk_customer',
       |    (SELECT COUNT(*) FROM orders),
       |    (SELECT COUNT(*) FROM orders o
       |     WHERE NOT EXISTS (SELECT 1 FROM customer c
       |       WHERE c.c_custkey = o.o_custkey))
       |  UNION ALL SELECT 'customer_fk_nation',
       |    (SELECT COUNT(*) FROM customer),
       |    (SELECT COUNT(*) FROM customer c
       |     WHERE NOT EXISTS (SELECT 1 FROM nation n
       |       WHERE n.n_nationkey = c.c_nationkey))
       |)""".stripMargin
}
