package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

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

  // ----------------------------------------- #317 FK orphan audit detail

  /** #317: referential-integrity ORPHAN AUDIT — the actionable detail
    * table behind #164's boolean FK gates: for every foreign-key edge in
    * the star schema, the orphaned child-row count, the number of
    * DISTINCT missing parent keys, and the min/max missing key (the
    * triage handles: one missing parent with a million children is a
    * dropped-dimension-row incident; a contiguous missing-key range is a
    * lost partition). The registered run stages the incident with the
    * house fixture-from-data rule — each parent "snapshot" drops keys
    * with pHash('fkloss|'|key) % 13 == 0, simulating a lost parent
    * partition — so every orphan path is exercised and hash-checked;
    * a real deployment passes the actual parent snapshots.
    *
    * Plan shape: lineitem's THREE edges ride ONE scan — three left joins
    * against key-only parents (orders shuffles on the natural order key,
    * part/supplier broadcast) and a single aggregate emits all three
    * edges' metrics, unpivoted by a literal stack. The remaining edges
    * are one key-only left join each, broadcast wherever the parent is
    * dimension-sized. Output is one row per FK edge — bounded by the
    * schema, never the data — and all-integer, so the oracle match is
    * exact with no quantization.
    */
  def fkOrphans(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.PortableHash
    def keep(key: Column): Column =
      PortableHash.pHash(concat(lit("fkloss|"), key.cast("string"))) % 13 =!= 0
    def parent(df: DataFrame, key: String, out: String): DataFrame =
      df.select(col(key).as(out)).filter(keep(col(out)))

    val oKeys = parent(Tables.orders(spark, dir), "o_orderkey", "pk_ord")
    val pKeys = parent(Tables.part(spark, dir), "p_partkey", "pk_part")
    val sKeys = parent(Tables.supplier(spark, dir), "s_suppkey", "pk_supp")
    val cKeys = parent(Tables.customer(spark, dir), "c_custkey", "pk_cust")
    val nKeys = parent(Tables.nation(spark, dir), "n_nationkey", "pk_nat")
    val rKeys = parent(Tables.region(spark, dir), "r_regionkey", "pk_reg")

    def metrics(fk: String, pk: String, tag: String) = {
      val miss = when(col(pk).isNull, col(fk))
      Seq(
        sum(when(col(pk).isNull, 1L).otherwise(0L)).as(s"${tag}_orph"),
        countDistinct(miss).as(s"${tag}_keys"),
        min(miss).cast("long").as(s"${tag}_mn"),
        max(miss).cast("long").as(s"${tag}_mx"))
    }
    val liCols = metrics("l_orderkey", "pk_ord", "o") ++
      metrics("l_partkey", "pk_part", "p") ++
      metrics("l_suppkey", "pk_supp", "s")
    val liEdges = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .join(oKeys, col("l_orderkey") === col("pk_ord"), "left")
      .join(broadcast(pKeys), col("l_partkey") === col("pk_part"), "left")
      .join(broadcast(sKeys), col("l_suppkey") === col("pk_supp"), "left")
      .agg(count(lit(1)).as("n"), liCols: _*)
      .selectExpr(
        """stack(3,
          |  'lineitem_orderkey_orders',   n, o_orph, o_keys, o_mn, o_mx,
          |  'lineitem_partkey_part',      n, p_orph, p_keys, p_mn, p_mx,
          |  'lineitem_suppkey_supplier',  n, s_orph, s_keys, s_mn, s_mx)
          |AS (fk_name, child_rows, orphan_rows, missing_keys, mn, mx)
          |""".stripMargin)

    def edge(child: DataFrame, fk: String, parentKeys: DataFrame, pk: String,
             label: String, bcast: Boolean): DataFrame = {
      val par = if (bcast) broadcast(parentKeys) else parentKeys
      val miss = when(col(pk).isNull, col(fk))
      child.select(fk).join(par, col(fk) === col(pk), "left")
        .agg(count(lit(1)).as("child_rows"),
          sum(when(col(pk).isNull, 1L).otherwise(0L)).as("orphan_rows"),
          countDistinct(miss).as("missing_keys"),
          min(miss).cast("long").as("mn"), max(miss).cast("long").as("mx"))
        .select(lit(label).as("fk_name"), col("child_rows"),
          col("orphan_rows"), col("missing_keys"), col("mn"), col("mx"))
    }
    liEdges
      .unionByName(edge(Tables.orders(spark, dir), "o_custkey", cKeys,
        "pk_cust", "orders_custkey_customer", bcast = false))
      .unionByName(edge(Tables.customer(spark, dir), "c_nationkey", nKeys,
        "pk_nat", "customer_nationkey_nation", bcast = true))
      .unionByName(edge(Tables.supplier(spark, dir), "s_nationkey", nKeys,
        "pk_nat", "supplier_nationkey_nation", bcast = true))
      .unionByName(edge(Tables.nation(spark, dir), "n_regionkey", rKeys,
        "pk_reg", "nation_regionkey_region", bcast = true))
      .select(col("fk_name"), col("child_rows"), col("orphan_rows"),
        col("missing_keys"),
        coalesce(col("mn"), lit(-1L)).as("min_missing"),
        coalesce(col("mx"), lit(-1L)).as("max_missing"))
  }

  val fkOrphansSql: String = {
    def keep(key: String) =
      s"${graft.core.PortableHash.duck(s"'fkloss|' || $key")} % 13 <> 0"
    def edge(label: String, child: String, fk: String, parentTbl: String,
             pk: String) =
      s"""SELECT '$label' AS fk_name,
         |  CAST(COUNT(*) AS BIGINT) AS child_rows,
         |  CAST(SUM(CASE WHEN k.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS orphan_rows,
         |  CAST(COUNT(DISTINCT CASE WHEN k.$pk IS NULL THEN c.$fk END)
         |    AS BIGINT) AS missing_keys,
         |  COALESCE(CAST(MIN(CASE WHEN k.$pk IS NULL THEN c.$fk END)
         |    AS BIGINT), -1) AS min_missing,
         |  COALESCE(CAST(MAX(CASE WHEN k.$pk IS NULL THEN c.$fk END)
         |    AS BIGINT), -1) AS max_missing
         |FROM $child c LEFT JOIN
         |  (SELECT $pk FROM $parentTbl WHERE ${keep(pk)}) k
         |  ON c.$fk = k.$pk""".stripMargin
    Seq(
      edge("lineitem_orderkey_orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      edge("lineitem_partkey_part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      edge("lineitem_suppkey_supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      edge("orders_custkey_customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      edge("customer_nationkey_nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      edge("supplier_nationkey_nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      edge("nation_regionkey_region", "nation", "n_regionkey",
        "region", "r_regionkey")
    ).mkString("\nUNION ALL\n")
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
      // ONE aggregate pass per table (r10, guide §2.4): the per-column
      // output rows unfold from the single aggregate row via inline —
      // the previous per-column `pass.select(...)` union re-planned and
      // RE-EXECUTED the whole-table aggregate once per profiled column
      // (12 scans+aggregates for 4 tables; warm 6.3 s → 1.x s).
      val rows =
        nums.map { case (c, _) =>
          struct(lit(tbl).as("table_name"), lit(c).as("column_name"),
            col("n").as("n_rows"), col(s"${c}_nn").as("n_null"),
            col(s"${c}_nd").as("n_distinct"),
            col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"),
            (col(s"${c}_sum") / col("n")).as("mean_v"))
        } ++
        cats.map { c =>
          struct(lit(tbl).as("table_name"), lit(c).as("column_name"),
            col("n").as("n_rows"), col(s"${c}_nn").as("n_null"),
            col(s"${c}_nd").as("n_distinct"),
            lit(null).cast("double").as("min_v"),
            lit(null).cast("double").as("max_v"),
            lit(null).cast("double").as("mean_v"))
        }
      pass.select(inline(array(rows: _*)))
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

  // ---------------------------------------------- #203 drift / PSI

  /** Cent-bin width for the PSI histogram (20.00 value units). */
  val PsiBinCents = 2000L
  /** Industry drift alarm threshold (the 0.1/0.2 PSI convention). */
  val PsiAlarm = 0.2

  /** #203: population-stability-index DRIFT report between the first
    * and second half of the event stream, per event type — the monitor
    * that catches "the distribution moved" where #164 catches "a
    * constraint broke" and #97/#166 catch single outliers: a model
    * trained on last month's value distribution silently degrades when
    * this month's shifts, and PSI = Σ_bins (p−q)·ln(p/q) is the
    * industry gauge (PSI > 0.2 = retrain/investigate).
    *
    * Design for exactness and scale:
    *  - the split day is DATA-DERIVED ((min+max+1)/2 of the day span —
    *    integer, broadcast as a 1-row frame);
    *  - bins are FIXED-WIDTH on the cent grid (vi DIV 2000 — integer
    *    binning, no data-derived float bounds, bounded by value range
    *    never event count), so events collapse map-side onto
    *    (type, bin) and nothing data-scale shuffles;
    *  - Laplace-smoothed p, q and the ln ratio are computed from EXACT
    *    integer counts — ln takes ONE ratio of integer products (the
    *    DSIR trick), each per-bin term is quantized on the 1e-6 grid
    *    ([[graft.core.Exact.roundS]]) and the per-type PSI is an
    *    order-free quantized sum. Output: one row per type.
    */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val e = Events.eventsS(spark, dir)
      .select(col("event_type"),
        (col("ts_s") / 86400L).cast("long").as("day"),
        expr(s"CAST(floor(value * 100.0 + 0.5) AS BIGINT) div $PsiBinCents")
          .as("bin"))
    val mid = e.agg(expr("(min(day) + max(day) + 1L) div 2L").as("mid"))
    val hist = e.crossJoin(broadcast(mid))
      .groupBy("event_type", "bin")
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("n2"))
    val tot = hist.groupBy("event_type")
      .agg(sum("n1").as("t1"), sum("n2").as("t2"),
        count(lit(1)).as("n_bins"))
    val term =
      (((col("n1") + 1L).cast("double") / (col("t1") + col("n_bins"))) -
       ((col("n2") + 1L).cast("double") / (col("t2") + col("n_bins")))) *
      log(((col("n1") + 1L) * (col("t2") + col("n_bins"))).cast("double") /
          ((col("n2") + 1L) * (col("t1") + col("n_bins"))).cast("double"))
    hist.join(tot, Seq("event_type"))
      .select(col("event_type"), col("t1"), col("t2"), col("n_bins"),
        Exact.roundS(term, 6).as("term"))
      .groupBy("event_type")
      .agg(first("t1").as("n_first"), first("t2").as("n_second"),
        first("n_bins").as("n_bins"),
        Exact.decSum(col("term"), 6).as("psi"))
      .withColumn("drift", col("psi") > PsiAlarm)
  }

  val driftPsiSql: String = {
    import graft.core.Exact
    val tsS = Events.duckTsS
    val term =
      s"""((CAST(n1 + 1 AS DOUBLE) / (t1 + n_bins)) -
         | (CAST(n2 + 1 AS DOUBLE) / (t2 + n_bins))) *
         |ln(CAST((n1 + 1) * (t2 + n_bins) AS DOUBLE) /
         |   CAST((n2 + 1) * (t1 + n_bins) AS DOUBLE))""".stripMargin
    s"""WITH e AS (
       |  SELECT event_type, $tsS // 86400 AS day,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) // $PsiBinCents AS bin
       |  FROM events
       |), mid AS (
       |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e
       |), hist AS (
       |  SELECT event_type, bin,
       |    SUM(CASE WHEN day < mid THEN 1 ELSE 0 END) AS n1,
       |    SUM(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS n2
       |  FROM e, mid GROUP BY 1, 2
       |), tot AS (
       |  SELECT event_type, CAST(SUM(n1) AS BIGINT) AS t1,
       |    CAST(SUM(n2) AS BIGINT) AS t2, COUNT(*) AS n_bins
       |  FROM hist GROUP BY 1
       |), terms AS (
       |  SELECT h.event_type, t1, t2, n_bins,
       |    ${Exact.duckRoundS(term, 6)} AS term
       |  FROM hist h JOIN tot t USING (event_type)
       |)
       |SELECT event_type, MIN(t1) AS n_first, MIN(t2) AS n_second,
       |  MIN(n_bins) AS n_bins, ${Exact.duckSum("term", 6)} AS psi,
       |  ${Exact.duckSum("term", 6)} > $PsiAlarm AS drift
       |FROM terms GROUP BY event_type""".stripMargin
  }

  // ---------------------------------------------- #219 Benford's law

  /** χ²(0.95, 8 df) critical value — reject Benford conformance above. */
  val BenfordCrit = 15.507313

  /** Benford first-digit expected shares log10(1 + 1/d), d = 1..9 —
    * interpolated as double literals into BOTH engines' expressions
    * (shortest-repr round-trips, so the literals are bit-identical).
    */
  private val benfordP: Seq[Double] = (1 to 9).map(d => math.log10(1 + 1.0 / d))

  /** #219: Benford's-law conformance test on `l_extendedprice` — the
    * forensic-accounting DQ check (Nigrini's audit standard): naturally
    * grown monetary amounts spanning magnitudes follow the logarithmic
    * first-digit law, and fabricated or truncated feeds don't. The
    * complement to #203's drift monitor: PSI needs a reference window,
    * Benford's reference is a LAW, so it fires on day one of a new feed.
    *
    * Exactness: amounts quantize to integer CENTS (the house scaled-
    * double grid), and the first digit is taken from the BIGINT's
    * decimal string — integer→string is canonical in every engine,
    * dodging double-formatting divergence entirely. Observed counts are
    * exact integers; expected shares are fixed literals; each χ² term
    * (obs − n·p)²/(n·p) is one fixed IEEE tree quantized on the 1e-6
    * grid; χ² is an order-free quantized sum over the 9 digits.
    *
    * Scale: one scan collapses map-side onto NINE keys (first digit),
    * then one-row algebra — shuffle bytes constant in table size. Emits
    * one row per digit with the shared χ² verdict broadcast back on.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val obs = Tables.lineitem(spark, dir)
      .select(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
        .as("cents"))
      .filter(col("cents") > 0L)
      .select(substring(col("cents").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val full = spark.range(1, 10).select(col("id").as("digit"))
      .join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        element_at(array(benfordP.map(lit): _*), col("digit").cast("int"))
          .as("exp_share"))
    val tot = full.agg(sum("n_obs").as("n"))
    val terms = full.crossJoin(broadcast(tot))
      .withColumn("term", Exact.roundS(
        (col("n_obs") - col("n") * col("exp_share")) *
        (col("n_obs") - col("n") * col("exp_share")) /
        (col("n") * col("exp_share")), 6))
    val chi = terms.agg(Exact.decSum(col("term"), 6).as("chi2"))
    terms.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast("double") / col("n")).as("obs_share"),
        col("exp_share"), col("chi2"),
        (col("chi2") > BenfordCrit).as("benford_reject"))
  }

  val benfordSql: String = {
    import graft.core.Exact
    // VARCHAR→DOUBLE casts: DuckDB types bare decimal literals as DECIMAL
    // (overflowing the χ² tree in decimal math), and even CAST(decimal AS
    // DOUBLE) mis-rounds the last ulp — but strtod on the string literal
    // is correctly rounded, giving the bit-identical Scala double.
    val pList = benfordP.map(v => s"CAST('$v' AS DOUBLE)")
      .mkString("[", ", ", "]")
    val term = "(n_obs - n * exp_share) * (n_obs - n * exp_share) / (n * exp_share)"
    s"""WITH cents AS (
       |  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem
       |  WHERE CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) > 0
       |), obs AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    COUNT(*) AS n_obs
       |  FROM cents GROUP BY 1
       |), fulld AS (
       |  SELECT d.digit, COALESCE(o.n_obs, 0) AS n_obs,
       |    ($pList)[CAST(d.digit AS INT)] AS exp_share
       |  FROM (SELECT unnest(range(1, 10)) AS digit) d
       |  LEFT JOIN obs o USING (digit)
       |), tot AS (
       |  SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM fulld
       |), terms AS (
       |  SELECT digit, n_obs, exp_share, n,
       |    ${Exact.duckRoundS(term, 6)} AS term
       |  FROM fulld, tot
       |), chi AS (
       |  SELECT ${Exact.duckSum("term", 6)} AS chi2 FROM terms
       |)
       |SELECT digit, n_obs, CAST(n_obs AS DOUBLE) / n AS obs_share,
       |  exp_share, chi2, chi2 > $BenfordCrit AS benford_reject
       |FROM terms, chi""".stripMargin
  }

  // ---------------------------------------- #220 k-anonymity audit

  /** k-anonymity floor: classes smaller than this are re-identifiable. */
  val KAnonK = 5L
  /** l-diversity floor on the sensitive attribute within a class. */
  val KAnonL = 3L
  /** Sensitive-attribute bucket width (account balance, whole units). */
  val KAnonSensUnits = 1000L

  /** #220: k-anonymity / l-diversity privacy audit of the customer
    * table — the release gate privacy review runs before training data
    * or analytics extracts ship: with quasi-identifiers (nation, market
    * segment), every customer must hide in a crowd of ≥ k peers
    * (k-anonymity, Sweeney), and the crowd must not agree on the
    * sensitive attribute (l-diversity, Machanavajjhala — a class of 50
    * who all share one balance bucket leaks it to anyone who knows the
    * QIs). Emits one row per equivalence class with both flags plus the
    * table-level summary broadcast onto every row: the corpus
    * k-anonymity (min class size) and the exact share of customers in
    * at-risk classes — the number the privacy review reads first.
    *
    * Exactness: everything is integer counts off ONE groupBy pass
    * (distinct sensitive values ride the same aggregate), and the risk
    * share is a single correctly-rounded division. Scale: one shuffle
    * onto the QI key — class count is bounded by the QI domain, not the
    * table; the summary is a second aggregate over classes, and the
    * one-row result broadcasts back. Nothing data-scale moves twice.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        // +10^6 shift keeps the dividend positive: Spark `div` truncates
        // toward zero, DuckDB `//` floors — they agree only for x ≥ 0.
        expr(s"(CAST(floor(c_acctbal) AS BIGINT) + 1000000L) div $KAnonSensUnits")
          .as("sens"))
      .groupBy("nationkey", "mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("sens")).as("n_sensitive"))
      .withColumn("k_anonymous", col("class_size") >= KAnonK)
      .withColumn("l_diverse", col("n_sensitive") >= KAnonL)
    val summary = classes.agg(
      min("class_size").as("k_anonymity"),
      sum(when(!col("k_anonymous") || !col("l_diverse"),
        col("class_size")).otherwise(0L)).as("n_at_risk"),
      sum("class_size").as("n_total"))
    classes.crossJoin(broadcast(summary))
      .select(col("nationkey"), col("mktsegment"), col("class_size"),
        col("n_sensitive"), col("k_anonymous"), col("l_diverse"),
        col("k_anonymity"),
        (col("n_at_risk").cast("double") / col("n_total")).as("risk_share"))
  }

  val kAnonymitySql: String =
    s"""WITH classes AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       |    c_mktsegment AS mktsegment,
       |    COUNT(*) AS class_size,
       |    COUNT(DISTINCT (CAST(floor(c_acctbal) AS BIGINT) + 1000000) // $KAnonSensUnits)
       |      AS n_sensitive
       |  FROM customer GROUP BY 1, 2
       |), flagged AS (
       |  SELECT *, class_size >= $KAnonK AS k_anonymous,
       |    n_sensitive >= $KAnonL AS l_diverse
       |  FROM classes
       |), summary AS (
       |  SELECT CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
       |    CAST(SUM(CASE WHEN NOT k_anonymous OR NOT l_diverse
       |      THEN class_size ELSE 0 END) AS BIGINT) AS n_at_risk,
       |    CAST(SUM(class_size) AS BIGINT) AS n_total
       |  FROM flagged
       |)
       |SELECT nationkey, mktsegment, class_size, n_sensitive,
       |  k_anonymous, l_diverse, k_anonymity,
       |  CAST(n_at_risk AS DOUBLE) / n_total AS risk_share
       |FROM flagged, summary""".stripMargin

  // -------------------------------------------- #225 WOE / IV screening

  /** Whole dollars per balance bucket for the WOE report — bounds the
    * balance feature's keyspace by the acctbal range (≈7 buckets), the
    * #108/#224 grid argument.
    */
  val WoeBalUnits = 2000L

  /** #225: weight-of-evidence / information-value FEATURE SCREENING
    * (the credit-scoring standard, Siddiqi 2006) — the pre-modeling
    * report the quality-classifier block was missing: before training
    * anything (#146's LR), score each candidate categorical feature's
    * separating power against a binary label. Label: the customer is
    * an URGENT buyer (placed ≥1 order at '1-URGENT' priority — splits
    * the population meaningfully at every SF, where a placed-any-order
    * label is degenerate here because the generator gives every
    * customer orders). Features: market segment, nation, and the
    * whole-dollar balance bucket.
    *
    * WOE_b = ln(share of goods in b / share of bads in b); IV =
    * Σ_b (good_share − bad_share)·WOE_b, read against Siddiqi's bands
    * (<0.02 useless … >0.5 suspicious — a leakage alarm, not a
    * strength grade). Laplace +1 smoothing (the #203 PSI idiom) keeps
    * zero cells finite and every input integer: WOE is ln of ONE
    * correctly-rounded division of exact integer products, the IV term
    * one fixed IEEE tree quantized 1e-6, the IV an order-free decSum
    * over the bounded bucket frame.
    *
    * Plan: one distinct on order custkeys (data-scale, the only big
    * shuffle), one broadcast-joinable label attach, a map-side 3-way
    * feature explode collapsing onto the bounded (feature, bucket)
    * keyspace, then dictionary-sized algebra. At 100 TB the label
    * attach shuffles on custkey; everything after is constant-size.
    */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val conv = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey")).distinct()
    val fx = Tables.customer(spark, dir)
      .join(conv, col("c_custkey") === col("custkey"), "left")
      .select(
        when(col("custkey").isNotNull, 1L).otherwise(0L).as("good"),
        col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("long").cast("string").as("nation"),
        expr(s"CAST((CAST(floor(c_acctbal) AS BIGINT) + 1000000L)" +
          s" div $WoeBalUnits AS STRING)").as("balance"))
      .select(col("good"), explode(map(
        lit("segment"), col("segment"),
        lit("nation"), col("nation"),
        lit("balance"), col("balance"))).as(Seq("feature", "bucket")))
    val hist = fx.groupBy("feature", "bucket")
      .agg(sum("good").as("g"), sum(lit(1L) - col("good")).as("b"))
    val tot = hist.groupBy("feature")
      .agg(sum("g").as("gt"), sum("b").as("bt"), count(lit(1)).as("nb"))
    val woe =
      log(((col("g") + 1L) * (col("bt") + col("nb"))).cast("double") /
          ((col("b") + 1L) * (col("gt") + col("nb"))).cast("double"))
    val term =
      (((col("g") + 1L).cast("double") / (col("gt") + col("nb"))) -
       ((col("b") + 1L).cast("double") / (col("bt") + col("nb")))) * woe
    val rows = hist.join(tot, Seq("feature"))
      .select(col("feature"), col("bucket"),
        col("g").as("n_good"), col("b").as("n_bad"),
        Exact.roundS(woe, 6).as("woe"), Exact.roundS(term, 6).as("term"))
    val iv = rows.groupBy("feature")
      .agg(Exact.decSum(col("term"), 6).as("iv"))
      .withColumn("strength",
        when(col("iv") < 0.02, "useless")
          .when(col("iv") < 0.1, "weak")
          .when(col("iv") < 0.3, "medium")
          .when(col("iv") < 0.5, "strong")
          .otherwise("suspicious"))
    rows.drop("term").join(iv, Seq("feature"))
  }

  val woeIvSql: String = {
    import graft.core.Exact
    val woe =
      """ln(CAST((g + 1) * (bt + nb) AS DOUBLE) /
        |   CAST((b + 1) * (gt + nb) AS DOUBLE))""".stripMargin
    val term =
      s"""((CAST(g + 1 AS DOUBLE) / (gt + nb)) -
         | (CAST(b + 1 AS DOUBLE) / (bt + nb))) * $woe""".stripMargin
    s"""WITH conv AS (SELECT DISTINCT o_custkey AS custkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT'),
       |lab AS (
       |  SELECT CASE WHEN v.custkey IS NOT NULL THEN 1 ELSE 0 END AS good,
       |    c_mktsegment AS segment,
       |    CAST(CAST(c_nationkey AS BIGINT) AS VARCHAR) AS nation,
       |    CAST((CAST(floor(c_acctbal) AS BIGINT) + 1000000) // $WoeBalUnits
       |      AS VARCHAR) AS balance
       |  FROM customer LEFT JOIN conv v ON c_custkey = v.custkey
       |), fx AS (
       |  SELECT good, 'segment' AS feature, segment AS bucket FROM lab
       |  UNION ALL SELECT good, 'nation', nation FROM lab
       |  UNION ALL SELECT good, 'balance', balance FROM lab
       |), hist AS (
       |  SELECT feature, bucket, CAST(SUM(good) AS BIGINT) AS g,
       |    CAST(SUM(1 - good) AS BIGINT) AS b
       |  FROM fx GROUP BY 1, 2
       |), tot AS (
       |  SELECT feature, CAST(SUM(g) AS BIGINT) AS gt,
       |    CAST(SUM(b) AS BIGINT) AS bt, COUNT(*) AS nb
       |  FROM hist GROUP BY 1
       |), rows_ AS (
       |  SELECT feature, bucket, g AS n_good, b AS n_bad,
       |    ${Exact.duckRoundS(woe, 6)} AS woe,
       |    ${Exact.duckRoundS(term, 6)} AS term
       |  FROM hist JOIN tot USING (feature)
       |), iv AS (
       |  SELECT feature, ${Exact.duckSum("term", 6)} AS iv
       |  FROM rows_ GROUP BY 1
       |)
       |SELECT feature, bucket, n_good, n_bad, woe, iv,
       |  CASE WHEN iv < 0.02 THEN 'useless'
       |       WHEN iv < 0.1 THEN 'weak'
       |       WHEN iv < 0.3 THEN 'medium'
       |       WHEN iv < 0.5 THEN 'strong'
       |       ELSE 'suspicious' END AS strength
       |FROM rows_ JOIN iv USING (feature)""".stripMargin
  }

  // ------------------------------------------------ #285 KS drift test

  /** #285: KOLMOGOROV–SMIRNOV source drift — per document source, the
    * two-sample KS statistic D = max_t |F_src(t) − F_rest(t)| of the
    * quality-score distribution against the rest of the corpus, with
    * the α=0.05 decision threshold c·√((n+m)/nm), c = 1.358. The
    * distribution-FREE member of the drift family: #173's PSI needs
    * binning choices and sees only binned mass shifts; KS compares the
    * entire empirical CDFs and its threshold is exact regardless of
    * the underlying shape — the test a curation pipeline runs when a
    * source's crawler changed and the quality histogram "looks the
    * same" in coarse bins.
    *
    * Exactness: quality lives on its 1e-6 roundS grid, so both
    * empirical CDFs are integer cumulative counts over the SAME
    * value-bounded cell frame ([0,1]/1e-6 — bounded by the GRID, not
    * the corpus); each D-candidate is two integer divisions and one
    * subtraction of identical doubles; the max and the threshold
    * compare are value-exact. Scale: docs collapse onto (source, qv)
    * and (qv) histograms; the source×cell completion joins the
    * broadcast 20-row source list onto the grid frame; cum windows
    * partition by source over grid-bounded frames; output one row per
    * source.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    val scored = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), TextAnalysis.words.as("ws"))
      .select(col("source"), Exact.roundS(TextAnalysis.quality).as("qv"))
    val hs = scored.groupBy("source", "qv").agg(count(lit(1)).as("c"))
    val g = scored.groupBy("qv").agg(count(lit(1)).as("ct"))
    val srcs = scored.select("source").distinct()
    val full = g.crossJoin(broadcast(srcs))
      .join(hs, Seq("source", "qv"), "left")
      .select(col("source"), col("qv"), col("ct"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy("source").orderBy("qv")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ns = hs.groupBy("source").agg(sum("c").as("n_s"))
    val nt = scored.agg(count(lit(1)).as("n_t"))
    full
      .withColumn("cum_s", sum("c").over(w))
      .withColumn("cum_t", sum("ct").over(w))
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nt))
      .select(col("source"), col("n_s"), col("n_t"),
        abs(col("cum_s").cast("double") / col("n_s")
          - (col("cum_t") - col("cum_s")).cast("double")
            / (col("n_t") - col("n_s"))).as("d_cell"))
      .groupBy("source")
      .agg(max("n_s").as("n_docs"), max("n_t").as("n_t"),
        max("d_cell").as("d_stat"))
      .select(col("source"), col("n_docs"),
        col("d_stat"),
        (lit(1.358) * sqrt((col("n_t")).cast("double")
          / (col("n_docs") * (col("n_t") - col("n_docs")))))
          .as("crit_05"),
        (col("d_stat") > lit(1.358) * sqrt((col("n_t")).cast("double")
          / (col("n_docs") * (col("n_t") - col("n_docs")))))
          .as("drifted"))
  }

  val ksTestSql: String = {
    import graft.text.TextAnalysis
    s"""WITH d0 AS (
       |  SELECT source, n_chars,
       |    ${TextAnalysis.duckWords} AS ws
       |  FROM documents
       |), s AS (
       |  SELECT source, ${Exact.duckRoundS(TextAnalysis.duckQuality)} AS qv
       |  FROM d0
       |), hs AS (
       |  SELECT source, qv, COUNT(*) AS c FROM s GROUP BY 1, 2
       |), g AS (SELECT qv, COUNT(*) AS ct FROM s GROUP BY 1),
       |srcs AS (SELECT DISTINCT source FROM s),
       |fl AS (
       |  SELECT srcs.source, g.qv, g.ct, COALESCE(hs.c, 0) AS c
       |  FROM g CROSS JOIN srcs
       |  LEFT JOIN hs ON hs.source = srcs.source AND hs.qv = g.qv
       |), ns AS (
       |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM hs GROUP BY 1
       |), nt AS (SELECT COUNT(*) AS n_t FROM s),
       |cells AS (
       |  SELECT f.source, ns.n_s, nt.n_t,
       |    abs(CAST(SUM(f.c) OVER w AS DOUBLE) / ns.n_s
       |      - CAST(SUM(f.ct) OVER w - SUM(f.c) OVER w AS DOUBLE)
       |        / (nt.n_t - ns.n_s)) AS d_cell
       |  FROM fl f JOIN ns ON ns.source = f.source, nt
       |  WINDOW w AS (PARTITION BY f.source ORDER BY f.qv
       |    ROWS UNBOUNDED PRECEDING)
       |), agg AS (
       |  SELECT source, MAX(n_s) AS n_docs, MAX(n_t) AS n_t,
       |    MAX(d_cell) AS d_stat
       |  FROM cells GROUP BY 1
       |)
       |SELECT source, n_docs, d_stat,
       |  1.358 * sqrt(CAST(n_t AS DOUBLE) / (n_docs * (n_t - n_docs)))
       |    AS crit_05,
       |  d_stat > 1.358 * sqrt(CAST(n_t AS DOUBLE)
       |    / (n_docs * (n_t - n_docs))) AS drifted
       |FROM agg""".stripMargin
  }

  // -------------------------------------- #300 Jensen–Shannon drift

  /** Quality-score bins for the JS histogram: floor(q·20) on the 0.05
    * grid — fixed-width, value-bounded (≤ 21 bins for q ∈ [0, 1]).
    */
  val JsBinsPerUnit = 20.0

  /** ln 2 as a double literal — shortest-repr round-trips identically
    * in both engines; JS(P‖Q) ≤ ln 2, so js/ln2 normalizes to [0, 1].
    */
  val Ln2 = 0.6931471805599453

  /** #300: JENSEN–SHANNON source drift — per document source, the JS
    * divergence between the source's quality-score histogram and the
    * rest of the corpus. The third member of the drift triad with a
    * distinct contract: #203's PSI is UNBOUNDED and blows up on empty
    * bins (hence its Laplace floor dominates small-sample readings),
    * #285's KS sees only the single worst CDF gap (one tall narrow
    * spike barely moves D); JS is SYMMETRIC, SMOOTH and BOUNDED by
    * ln 2, so `js_norm` ∈ [0, 1] is comparable across sources of very
    * different sizes — the gauge a mixing policy can threshold
    * uniformly.
    *
    * Exactness: quality lives on its 1e-6 roundS grid, bins are
    * floor(q·20) (integral doubles — identical in both engines), all
    * histogram counts are exact integers over the SAME value-bounded
    * cell frame, and each cell's term ½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q))
    * takes ln of ONE ratio whose numerator/denominator are products of
    * exactly-converted integer doubles (Laplace-smoothed, so never
    * 0/0); terms are quantized on the 1e-6 grid and the per-source JS
    * is an order-free quantized sum.
    *
    * Scale: docs collapse map-side onto (source, bin) — bounded by the
    * grid × source count, never the corpus; the completion joins the
    * broadcast source list onto the ≤ 21-bin frame; output one row per
    * source.
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    val scored = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), TextAnalysis.words.as("ws"))
      .select(col("source"),
        floor(Exact.roundS(TextAnalysis.quality) * JsBinsPerUnit)
          .cast("long").as("bin"))
    val hs = scored.groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val g = scored.groupBy("bin").agg(count(lit(1)).as("ct"))
    val gt = g.agg(count(lit(1)).as("n_bins"), sum("ct").as("n_t"))
    val srcs = scored.select("source").distinct()
    val ns = hs.groupBy("source").agg(sum("c").as("n_s"))
    val full = g.crossJoin(broadcast(srcs))
      .join(hs, Seq("source", "bin"), "left")
      .select(col("source"), col("ct"),
        coalesce(col("c"), lit(0L)).as("c"))
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(gt))
    // p = (c+1)/(n_s+B), q = (r+1)/(n_r+B); ln args cross-multiplied to
    // one ratio of double products (overflow-safe at any corpus size).
    val numP = (col("c") + 1L).cast("double") *
      (col("n_t") - col("n_s") + col("n_bins")).cast("double")
    val numQ = (col("ct") - col("c") + 1L).cast("double") *
      (col("n_s") + col("n_bins")).cast("double")
    val p = (col("c") + 1L).cast("double") /
      (col("n_s") + col("n_bins")).cast("double")
    val q = (col("ct") - col("c") + 1L).cast("double") /
      (col("n_t") - col("n_s") + col("n_bins")).cast("double")
    val term = lit(0.5) * p * log(lit(2.0) * numP / (numP + numQ)) +
      lit(0.5) * q * log(lit(2.0) * numQ / (numP + numQ))
    full
      .select(col("source"), col("n_s"), col("n_bins"),
        Exact.roundS(term, 6).as("term"))
      .groupBy("source")
      .agg(first("n_s").as("n_docs"), first("n_bins").as("n_bins"),
        Exact.decSum(col("term"), 6).as("js"))
      .withColumn("js_norm", col("js") / Ln2)
  }

  val jsDivergenceSql: String = {
    import graft.text.TextAnalysis
    val numP = "(CAST(c + 1 AS DOUBLE) * CAST(n_t - n_s + n_bins AS DOUBLE))"
    val numQ = "(CAST(ct - c + 1 AS DOUBLE) * CAST(n_s + n_bins AS DOUBLE))"
    val p = "(CAST(c + 1 AS DOUBLE) / CAST(n_s + n_bins AS DOUBLE))"
    val q = "(CAST(ct - c + 1 AS DOUBLE) / CAST(n_t - n_s + n_bins AS DOUBLE))"
    val term =
      s"""0.5 * $p * ln(2.0 * $numP / ($numP + $numQ)) +
         |    0.5 * $q * ln(2.0 * $numQ / ($numP + $numQ))""".stripMargin
    s"""WITH d0 AS (
       |  SELECT source, n_chars, ${TextAnalysis.duckWords} AS ws
       |  FROM documents
       |), s AS (
       |  SELECT source,
       |    CAST(floor(${Exact.duckRoundS(TextAnalysis.duckQuality)}
       |      * $JsBinsPerUnit) AS BIGINT) AS bin
       |  FROM d0
       |), hs AS (
       |  SELECT source, bin, COUNT(*) AS c FROM s GROUP BY 1, 2
       |), g AS (SELECT bin, COUNT(*) AS ct FROM s GROUP BY 1),
       |gt AS (SELECT COUNT(*) AS n_bins, CAST(SUM(ct) AS BIGINT) AS n_t
       |       FROM g),
       |srcs AS (SELECT DISTINCT source FROM s),
       |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
       |       FROM hs GROUP BY 1),
       |fl AS (
       |  SELECT srcs.source, g.ct, COALESCE(hs.c, 0) AS c, ns.n_s,
       |    gt.n_bins, gt.n_t
       |  FROM g CROSS JOIN srcs
       |  LEFT JOIN hs ON hs.source = srcs.source AND hs.bin = g.bin
       |  JOIN ns ON ns.source = srcs.source, gt
       |), terms AS (
       |  SELECT source, n_s, n_bins,
       |    ${Exact.duckRoundS(term, 6)} AS term
       |  FROM fl
       |)
       |SELECT source, MIN(n_s) AS n_docs, MIN(n_bins) AS n_bins,
       |  ${Exact.duckSum("term", 6)} AS js,
       |  ${Exact.duckSum("term", 6)} / $Ln2 AS js_norm
       |FROM terms GROUP BY source""".stripMargin
  }

  // --------------------------------- #301 quality-gate agreement (κ)

  /** Fixed score-gate threshold (measured non-degenerate at every SF:
    * the quality median sits ≈ 0.76 on this corpus shape).
    */
  val GateTheta = 0.75

  /** #301: GATE AGREEMENT — Cohen's κ between the two document quality
    * gates the pipeline ships: the Gopher RULE suite's composite keep
    * (#191, `NOT vAny`) and the continuous SCORE gate (#32's quality ≥
    * 0.75), per language. Two gates that agree 85% of the time sounds
    * safe until you see κ ≈ 0 — agreement driven by base rates, i.e.
    * the rules and the score are measuring DIFFERENT things and the
    * choice of gate silently decides the corpus. This is the audit
    * table a curation review reads before swapping gates: the full
    * confusion (both-keep / rule-only / score-only / both-drop), each
    * gate's keep rate, observed agreement p_o and chance-corrected κ.
    *
    * Exactness: both gates are integer/rational comparisons (the rule
    * suite compares cross-multiplied integers; the score is one fixed
    * IEEE tree vs a literal), counts are exact integers, and p_o, p_e,
    * κ are fixed trees of correctly-rounded double ops evaluated
    * identically by both engines (marginal products cast to double
    * BEFORE multiplying — overflow-safe at any corpus size). Degenerate
    * marginals (p_e = 1 forces p_o = 1) pin κ = 1.0 in both engines.
    *
    * Scale: ONE map-only pass computes both gates per doc (the stat
    * columns are shared subtrees), collapsing map-side onto the |langs|
    * keyspace; output bounded by the language list.
    */
  def gateAgreement(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Gopher, TextAnalysis}
    val flags = Gopher.stats(Tables.documents(spark, dir), "lang")
      .select(col("lang"),
        (!Gopher.vAny).as("rule_keep"),
        (TextAnalysis.quality >= GateTheta).as("score_keep"))
    val cells = flags.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("rule_keep") && col("score_keep"), 1L).otherwise(0L))
        .as("n_both_keep"),
      sum(when(col("rule_keep") && !col("score_keep"), 1L).otherwise(0L))
        .as("n_rule_only"),
      sum(when(!col("rule_keep") && col("score_keep"), 1L).otherwise(0L))
        .as("n_score_only"),
      sum(when(!col("rule_keep") && !col("score_keep"), 1L).otherwise(0L))
        .as("n_both_drop"))
    val po = (col("n_both_keep") + col("n_both_drop")).cast("double") /
      col("n_docs").cast("double")
    val pe = ((col("n_both_keep") + col("n_rule_only")).cast("double") *
        (col("n_both_keep") + col("n_score_only")).cast("double") +
      (col("n_score_only") + col("n_both_drop")).cast("double") *
        (col("n_rule_only") + col("n_both_drop")).cast("double")) /
      (col("n_docs").cast("double") * col("n_docs").cast("double"))
    cells
      .withColumn("rule_keep_rate",
        (col("n_both_keep") + col("n_rule_only")).cast("double") /
          col("n_docs").cast("double"))
      .withColumn("score_keep_rate",
        (col("n_both_keep") + col("n_score_only")).cast("double") /
          col("n_docs").cast("double"))
      .withColumn("p_o", po)
      .withColumn("kappa",
        when(pe === 1.0, lit(1.0)).otherwise((po - pe) / (lit(1.0) - pe)))
  }

  val gateAgreementSql: String = {
    import graft.text.{Gopher, TextAnalysis}
    val po = "(CAST(n_both_keep + n_both_drop AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val pe =
      """((CAST(n_both_keep + n_rule_only AS DOUBLE)
        |   * CAST(n_both_keep + n_score_only AS DOUBLE)
        | + CAST(n_score_only + n_both_drop AS DOUBLE)
        |   * CAST(n_rule_only + n_both_drop AS DOUBLE))
        | / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)))""".stripMargin
    s"""WITH d AS (
       |  SELECT lang, n_chars, ${TextAnalysis.duckWords} AS ws
       |  FROM documents
       |), st AS (
       |  SELECT lang, n_chars, ws, ${Gopher.duckStatsList}
       |  FROM d
       |), f AS (
       |  SELECT lang, (NOT ${Gopher.duckVAny}) AS rule_keep,
       |    ((${TextAnalysis.duckQuality}) >= $GateTheta) AS score_keep
       |  FROM st
       |), cells AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(CASE WHEN rule_keep AND score_keep THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_both_keep,
       |    CAST(SUM(CASE WHEN rule_keep AND NOT score_keep THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_rule_only,
       |    CAST(SUM(CASE WHEN NOT rule_keep AND score_keep THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_score_only,
       |    CAST(SUM(CASE WHEN NOT rule_keep AND NOT score_keep THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_both_drop
       |  FROM f GROUP BY 1
       |)
       |SELECT lang, n_docs, n_both_keep, n_rule_only, n_score_only,
       |  n_both_drop,
       |  CAST(n_both_keep + n_rule_only AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |    AS rule_keep_rate,
       |  CAST(n_both_keep + n_score_only AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |    AS score_keep_rate,
       |  $po AS p_o,
       |  CASE WHEN $pe = 1.0 THEN 1.0
       |       ELSE ($po - $pe) / (1.0 - $pe) END AS kappa
       |FROM cells""".stripMargin
  }
}
