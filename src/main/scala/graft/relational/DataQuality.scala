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

  /** #167: per-column PROFILING (the Deequ analyzer / dataset-statistics
    * report): for each registered column — completeness (null count),
    * exact distinct cardinality, and for numerics min/max plus an
    * order-independent quantized mean. The artifact that feeds schema
    * docs, drift monitors (diff two profiles), and the constraint
    * suggestions #164's checks start from.
    *
    * Scale shape: ONE aggregate pass per table computes every column's
    * metrics together (Spark plans the multiple distinct-counts via one
    * Expand — the table is still scanned once); output is one row per
    * profiled column, bounded by the schema. Mean sums are quantized at
    * a per-column scale chosen so |x|·10^s stays inside 2^53 at realistic
    * magnitudes (prices at cents, ratios at 1e-6).
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    // (table, frame, numeric: (col, decSum scale), categorical: cols)
    val specs: Seq[(String, DataFrame, Seq[(String, Int)], Seq[String])] = Seq(
      ("lineitem", Tables.lineitem(spark, dir),
        Seq("l_quantity" -> 2, "l_extendedprice" -> 2, "l_discount" -> 6),
        Seq("l_returnflag")),
      ("orders", Tables.orders(spark, dir),
        Seq("o_totalprice" -> 2), Seq("o_orderstatus", "o_orderpriority")),
      ("customer", Tables.customer(spark, dir),
        Seq("c_acctbal" -> 2), Seq("c_mktsegment")),
      ("documents", Tables.documents(spark, dir),
        Seq("n_chars" -> 0), Seq("lang", "source")))

    specs.map { case (tbl, df, nums, cats) =>
      val aggs =
        nums.flatMap { case (c, s) => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
          countDistinct(col(c)).as(s"${c}_nd"),
          min(col(c)).cast("double").as(s"${c}_min"),
          max(col(c)).cast("double").as(s"${c}_max"),
          Exact.decSum(col(c).cast("double"), s).as(s"${c}_sum"))
        } ++
        cats.flatMap { c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
          countDistinct(col(c)).as(s"${c}_nd"))
        }
      val pass = df.agg(count(lit(1)).as("n"), aggs: _*)
      val rows =
        nums.map { case (c, _) =>
          pass.select(lit(tbl).as("table_name"), lit(c).as("column_name"),
            col("n").as("n_rows"), col(s"${c}_nn").as("n_null"),
            col(s"${c}_nd").as("n_distinct"),
            col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"),
            (col(s"${c}_sum") / col("n")).as("mean_v"))
        } ++
        cats.map { c =>
          pass.select(lit(tbl).as("table_name"), lit(c).as("column_name"),
            col("n").as("n_rows"), col(s"${c}_nn").as("n_null"),
            col(s"${c}_nd").as("n_distinct"),
            lit(null).cast("double").as("min_v"),
            lit(null).cast("double").as("max_v"),
            lit(null).cast("double").as("mean_v"))
        }
      rows.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
  }

  val dqProfileSql: String = {
    import graft.core.Exact
    def num(tbl: String, c: String, s: Int) =
      s"""SELECT '$tbl' AS table_name, '$c' AS column_name,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v,
         |  ${Exact.duckSum(s"CAST($c AS DOUBLE)", s)} / COUNT(*) AS mean_v
         |FROM $tbl""".stripMargin
    def cat(tbl: String, c: String) =
      s"""SELECT '$tbl', '$c', COUNT(*),
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  COUNT(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
         |FROM $tbl""".stripMargin
    Seq(
      num("lineitem", "l_quantity", 2), num("lineitem", "l_extendedprice", 2),
      num("lineitem", "l_discount", 6), cat("lineitem", "l_returnflag"),
      num("orders", "o_totalprice", 2),
      cat("orders", "o_orderstatus"), cat("orders", "o_orderpriority"),
      num("customer", "c_acctbal", 2), cat("customer", "c_mktsegment"),
      num("documents", "n_chars", 0),
      cat("documents", "lang"), cat("documents", "source"),
    ).mkString("\nUNION ALL\n")
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
