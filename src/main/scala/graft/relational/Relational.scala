package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** Relational bench headliners (TPC-H-style q1/q3/q5 over the driver's
  * synthetic star schema).
  *
  * Scale notes (100 TB):
  *  - `lineitem` is the fact table: every query filters it first so the
  *    predicate + projected columns push into the parquet scan.
  *  - dimension sides (`region`, `nation`, `customer`, `supplier`) are
  *    broadcast explicitly — at SF100k these stay ≤ a few GB while
  *    `lineitem`/`orders` shuffle; AQE handles the rest.
  *  - all money sums go through [[Exact.decSum]]: decimal partial
  *    aggregates are order-independent, so the result is identical no
  *    matter how many executors reduce them.
  */
object Relational {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  /** TPC-H Q1-style pricing summary. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integral doubles: exact in any order
        Exact.decSum(col("l_extendedprice")).as("sum_base_price"),
        Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  ${Exact.duckSum("l_extendedprice")} AS sum_base_price,
       |  ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")} AS sum_disc_price,
       |  ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount) * (1.0::DOUBLE + l_tax)")} AS sum_charge,
       |  COUNT(*) AS count_order,
       |  SUM(l_quantity) / COUNT(*) AS avg_qty,
       |  ${Exact.duckSum("l_extendedprice")} / COUNT(*) AS avg_price
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: unshipped-revenue top 10 for one market segment. */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1997-03-15 00:00:00"
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < ts(cut))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > ts(cut))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_s"),
        col("o_orderpriority"))
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT o_orderkey, epoch_ms(o_orderdate) // 1000 AS o_orderdate_s,
       |  o_orderpriority,
       |  ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")} AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
       |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, o_orderkey ASC
       |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation for one region + order-date year. */
  def q5JoinRegion(spark: SparkSession, dir: String): DataFrame = {
    val lo = "1996-01-01 00:00:00"; val hi = "1997-01-01 00:00:00"
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts(lo) && col("o_orderdate") < ts(hi))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))

  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- rollup

  /** #71: multi-level aggregation — `ROLLUP(l_returnflag, l_linestatus)`
    * emits the detail rows, per-returnflag subtotals, and a grand total
    * in ONE pass with the `grouping()` marker distinguishing levels
    * (0 = real value, 1 = rolled up). Spark plans this as a single
    * Expand + hash aggregate — 3× the map-side rows but still one
    * shuffle, vs three separate scans+aggregations; the grouping-key
    * space stays tiny so the shuffle never grows with data. NULL group
    * values are replaced by 'ALL' sentinels in the output so the oracle
    * compare never relies on cross-engine NULL-sorting conventions.
    */
  def q1Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        Exact.decSum(col("l_extendedprice")).as("sum_base_price"),
        count(lit(1)).as("count_order"),
        grouping("l_returnflag").as("g_rf"),
        grouping("l_linestatus").as("g_ls"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("sum_base_price"), col("count_order"),
        col("g_rf"), col("g_ls"))

  val q1RollupSql: String =
    s"""SELECT
       |  COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  ${Exact.duckSum("l_extendedprice")} AS sum_base_price,
       |  COUNT(*) AS count_order,
       |  CAST(GROUPING(l_returnflag) AS TINYINT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS TINYINT) AS g_ls
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** #93: market-basket part affinity — the top-20 part pairs most often
    * bought in the same order (the classic co-occurrence/association
    * mining step). NOT a self-join (which needs a distinct shuffle, a
    * join shuffle, and a pair-keyed aggregate shuffle): baskets are
    * collected per order — `collect_set` bounded by the largest basket,
    * TPC-H orders hold ≤ 7 parts — and the p1 < p2 pairs are generated
    * map-side from each basket array, so the whole operator is TWO
    * exchanges (order-keyed set agg, pair-keyed count; plan-verified).
    * At sf0.1 wall-clock the two forms tie (~2 s — small shuffles are
    * cheap locally); the exchange count is what survives a 1000× scale-
    * up. Pair fan-out is Σ k·(k−1)/2, bounded by basket size, never
    * catalog size. The top-20 is a TakeOrdered per-partition heap (no
    * global sort); deterministic ties: (count desc, p1, p2).
    */
  /** r10 (guide §4): ordered index pairs i<j over the SORTED distinct
    * basket — C(n,2) struct constructions instead of the n² cube +
    * filter; identical pair multiset (sorted distinct ⇒ ps[i] < ps[j]).
    * Callers must pre-filter size(ps) ≥ 2 (also keeps both `sequence`
    * bounds ascending).
    */
  private def orderedPairs(f1: String, f2: String) =
    explode(expr(
      s"""flatten(transform(sequence(1, size(ps) - 1), i ->
         |  transform(sequence(i + 1, size(ps)), j ->
         |    struct(element_at(ps, i) AS $f1,
         |           element_at(ps, j) AS $f2))))""".stripMargin))

  def basketPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(orderedPairs("p1", "p2").as("pair"))
      .select(col("pair.p1").as("p1"), col("pair.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(20)

  val basketPairsSql: String =
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       |SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
       |FROM lp a JOIN lp b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |GROUP BY 1, 2
       |ORDER BY n_orders DESC, p1, p2 LIMIT 20""".stripMargin

  // ------------------------------------------ #161 association rules

  /** Minimum pair support before a rule is scored (the Apriori support
    * floor: a rule observed once is noise).
    */
  val RuleMinSupport = 2

  val RuleTopN = 20

  /** Per-(session, dir) cache for the distinct (order, part) basket
    * frame: the rules query consumes it THREE ways (pair generation,
    * item counts, the order-count scalar) and without materialization
    * each consumer re-scanned lineitem and re-paid the distinct
    * shuffle — measured 8.3 s → ~3 s at sf0.1. At 100 TB this frame is
    * the "basket fact" you materialize once per snapshot anyway.
    */
  private val lpCache = new graft.core.DfCache[(SparkSession, String)]

  /** #161: association RULES over the co-purchase pairs — the classic
    * market-basket analysis output (Agrawal & Srikant's Apriori
    * contract at itemset size 2): each supported pair {A,B} yields the
    * directed rules A→B and B→A with confidence c(AB)/c(A) and lift
    * N·c(AB)/(c(A)·c(B)) — the "customers who bought A also bought B"
    * score with the independence baseline divided out (lift > 1 = a
    * real association, not popularity). #93 reports raw pair counts;
    * this is the inferential layer on top.
    *
    * Exactness: confidence and lift are single correctly-rounded
    * divisions over exact integer counts/products (no transcendental,
    * no quantization needed); ranking by (lift DESC, ante, cons) is a
    * total order, so the top-N is engine-exact.
    *
    * Plan: the distinct (order, part) frame feeds pair counts (the #93
    * per-basket generation — fan-out bounded by basket size) and item
    * counts (one part-keyed map-side-combining aggregate); N is a
    * one-row broadcast scalar. The support floor shrinks the pair
    * frame BEFORE the two item-count joins; directed rules double only
    * the surviving pairs; top-N is TakeOrderedAndProject heaps with a
    * post-limit rank.
    */
  def basketRules(spark: SparkSession, dir: String): DataFrame = {
    val lp = lpCache.getOrElseUpdate((spark, dir))(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct())
    val pairCnt = lp
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(orderedPairs("p1", "p2").as("pair"))
      .groupBy(col("pair.p1").as("p1"), col("pair.p2").as("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= RuleMinSupport)
    val itemCnt = lp.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("n_item"))
    val n = lp.select("l_orderkey").distinct().agg(count(lit(1)).as("n"))
    val rules = pairCnt.select(explode(array(
        struct(col("p1").as("ante"), col("p2").as("cons"), col("n_pair")),
        struct(col("p2").as("ante"), col("p1").as("cons"), col("n_pair"))))
        .as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("r.n_pair").as("n_pair"))
      .join(itemCnt.select(col("p").as("ante"), col("n_item").as("n_ante")), "ante")
      .join(itemCnt.select(col("p").as("cons"), col("n_item").as("n_cons")), "cons")
      .crossJoin(broadcast(n))
      .select(col("ante"), col("cons"), col("n_pair"), col("n_ante"),
        col("n_cons"),
        (col("n_pair").cast("double") / col("n_ante").cast("double")).as("conf"),
        ((col("n_pair") * col("n")).cast("double") /
          (col("n_ante") * col("n_cons")).cast("double")).as("lift"))
    rules
      .orderBy(col("lift").desc, col("ante").asc, col("cons").asc)
      .limit(RuleTopN)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("lift").desc, col("ante").asc, col("cons").asc)))
  }

  val basketRulesSql: String =
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pc AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_pair
       |  FROM lp a JOIN lp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $RuleMinSupport
       |),
       |ic AS (SELECT l_partkey AS p, COUNT(*) AS n_item FROM lp GROUP BY 1),
       |nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lp),
       |rules AS (
       |  SELECT ante, cons, n_pair,
       |    ia.n_item AS n_ante, ic2.n_item AS n_cons,
       |    CAST(n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS conf,
       |    CAST(n_pair * n AS DOUBLE) /
       |      CAST(ia.n_item * ic2.n_item AS DOUBLE) AS lift
       |  FROM (
       |    SELECT p1 AS ante, p2 AS cons, n_pair FROM pc
       |    UNION ALL
       |    SELECT p2, p1, n_pair FROM pc
       |  )
       |  JOIN ic ia ON ia.p = ante
       |  JOIN ic ic2 ON ic2.p = cons
       |  CROSS JOIN nn
       |)
       |SELECT ante, cons, n_pair, n_ante, n_cons, conf, lift,
       |  CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, ante ASC, cons ASC) AS INT) AS rnk
       |FROM rules
       |ORDER BY lift DESC, ante ASC, cons ASC LIMIT $RuleTopN""".stripMargin

  // ------------------------------------- #238 frequent 3-itemsets

  /** Triples reported. */
  val TripleTopN = 20

  /** #238: frequent 3-ITEMSETS — the Apriori LEVEL the basket block
    * stopped short of (Agrawal & Srikant 1994 run size-2 AND size-3+;
    * #93/#161 cover pairs): supported part triples with their 3-way
    * lift P(abc)/(P(a)P(b)P(c)) — the signal that finds BUNDLES a pair
    * scan structurally misses (three items each pairwise-common but
    * jointly rare score pair-lift ≈ 1 everywhere yet triple-lift ≪ 1,
    * and a true 3-bundle scores high only here).
    *
    * Exactness: supports are exact integers; the lift is a fixed
    * literal IEEE tree over casts of exact integers (two multiplies
    * per side, one division — mirrored in literal order; the integer
    * PRODUCTS are not formed, so nothing can exceed 2^53 at any
    * scale); ranking by (lift, p1, p2, p3) is a total order.
    *
    * Plan: triples generate MAP-SIDE from the per-order basket set
    * (fan-out C(basket,3), bounded by basket size never catalog —
    * the #93 argument one level up), one triple-keyed count with the
    * support floor applied BEFORE the three item-count joins, a 1-row
    * broadcast scalar, TakeOrdered. The oracle is the brute 3-way
    * self-join, so the hash match machine-checks the map-side
    * generation's completeness.
    */
  def basketTriples(spark: SparkSession, dir: String): DataFrame = {
    val lp = lpCache.getOrElseUpdate((spark, dir))(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct())
    // r10 (guide §4): was transform³ over the raw set — |ps|³ struct
    // constructions per order, then a filter keeping the 1/6 with
    // p1<p2<p3. Sorting the (distinct) set once and walking ordered
    // index combinations i<j<k builds exactly C(|ps|,3) structs — the
    // identical triple multiset (sorted distinct ⇒ a[i]<a[j]<a[k]).
    // The size≥3 guard both drops triple-less orders before the
    // explode and keeps every `sequence` bound ascending.
    val tripleCnt = lp
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 3)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ps) - 2), i ->
          |  flatten(transform(sequence(i + 1, size(ps) - 1), j ->
          |    transform(sequence(j + 1, size(ps)), k ->
          |      struct(element_at(ps, i) AS p1,
          |             element_at(ps, j) AS p2,
          |             element_at(ps, k) AS p3))))))""".stripMargin)).as("t"))
      .groupBy(col("t.p1").as("p1"), col("t.p2").as("p2"),
        col("t.p3").as("p3"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= RuleMinSupport)
    val itemCnt = lp.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("n_item"))
    val n = lp.select("l_orderkey").distinct().agg(count(lit(1)).as("n"))
    tripleCnt
      .join(itemCnt.select(col("p").as("p1"), col("n_item").as("c1")), "p1")
      .join(itemCnt.select(col("p").as("p2"), col("n_item").as("c2")), "p2")
      .join(itemCnt.select(col("p").as("p3"), col("n_item").as("c3")), "p3")
      .crossJoin(broadcast(n))
      .select(col("p1"), col("p2"), col("p3"), col("n_orders"),
        ((col("n_orders").cast("double") * col("n").cast("double")
          * col("n").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double")
            * col("c3").cast("double"))).as("lift3"))
      .orderBy(col("lift3").desc, col("p1"), col("p2"), col("p3"))
      .limit(TripleTopN)
  }

  val basketTriplesSql: String =
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |tc AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
       |    COUNT(*) AS n_orders
       |  FROM lp a
       |  JOIN lp b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  JOIN lp c ON b.l_orderkey = c.l_orderkey
       |    AND b.l_partkey < c.l_partkey
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= $RuleMinSupport
       |),
       |ic AS (SELECT l_partkey AS p, COUNT(*) AS n_item FROM lp GROUP BY 1),
       |nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lp)
       |SELECT p1, p2, p3, n_orders,
       |  (CAST(n_orders AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |    / (CAST(i1.n_item AS DOUBLE) * CAST(i2.n_item AS DOUBLE)
       |       * CAST(i3.n_item AS DOUBLE)) AS lift3
       |FROM tc
       |JOIN ic i1 ON i1.p = p1
       |JOIN ic i2 ON i2.p = p2
       |JOIN ic i3 ON i3.p = p3
       |CROSS JOIN nn
       |ORDER BY lift3 DESC, p1, p2, p3 LIMIT $TripleTopN""".stripMargin

  // ------------------------------------------ #242 price elasticity

  /** #242: PRICE ELASTICITY of demand per brand — the econometric
    * log-log regression every pricing team runs: elasticity =
    * d ln(qty)/d ln(unit price), estimated as the least-squares slope
    * of ln(l_quantity) on ln(effective unit price) over a brand's
    * line items (discount variation supplies the price dispersion —
    * the TPC-H-shaped data's natural experiment). Same closed-form
    * machinery as #204's Zipf fit, applied per group: elastic brands
    * (slope < −1) lose revenue to price rises; the report is the
    * input to that decision.
    *
    * Exactness (the #204 chain, group-keyed): the unit price is one
    * fixed IEEE tree (multiply, subtract, divide); both lns quantize
    * 1e-6; products of quantized doubles are single correctly-rounded
    * ops summed order-free on the 1e-12 grid; the slope is a
    * literal-order expression over exact sums, mirrored verbatim.
    *
    * Plan: one lineitem scan + a broadcast brand attach, map-side
    * quantized terms, one map-side-combining aggregate onto the
    * bounded brand keyspace, then 1-row-per-brand algebra.
    */
  def priceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0.0)
      .join(broadcast(Tables.part(spark, dir)
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        Exact.roundS(log(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) / col("l_quantity")), 6).as("x"),
        Exact.roundS(log(col("l_quantity")), 6).as("y"))
    obs.groupBy("brand")
      .agg(count(lit(1)).as("n_obs"),
        Exact.decSum(col("x"), 6).as("sx"),
        Exact.decSum(col("y"), 6).as("sy"),
        // wide accumulators (10x bench: the scale-12 moment sums
        // exceed int64 past ~65k rows/brand at |x| ~ 12)
        Exact.decSumWide(col("x") * col("y"), 12).as("sxy"),
        Exact.decSumWide(col("x") * col("x"), 12).as("sxx"))
      .select(col("brand"), col("n_obs"),
        ((col("n_obs") * col("sxy") - col("sx") * col("sy")) /
         (col("n_obs") * col("sxx") - col("sx") * col("sx")))
          .as("elasticity"))
  }

  val priceElasticitySql: String = {
    val price = "l_extendedprice * (1.0::DOUBLE - l_discount) / l_quantity"
    s"""WITH obs AS (
       |  SELECT p_brand AS brand,
       |    ${Exact.duckRoundS(s"ln($price)", 6)} AS x,
       |    ${Exact.duckRoundS("ln(l_quantity)", 6)} AS y
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_quantity > 0.0
       |), s AS (
       |  SELECT brand, COUNT(*) AS n_obs,
       |    ${Exact.duckSum("x", 6)} AS sx, ${Exact.duckSum("y", 6)} AS sy,
       |    ${Exact.duckSum("x * y", 12)} AS sxy,
       |    ${Exact.duckSum("x * x", 12)} AS sxx
       |  FROM obs GROUP BY brand
       |)
       |SELECT brand, n_obs,
       |  (n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx) AS elasticity
       |FROM s""".stripMargin
  }

  // --------------------------------------------- #246 order lead time

  /** #246: fulfillment LEAD-TIME distribution per order priority — the
    * operations SLO report a commerce pipeline watches: days from
    * order placement to line-item shipment, summarized as exact
    * p50/p90/max/mean per priority class. The check the priority
    * field exists to support: do urgent orders actually ship faster?
    *
    * Exactness: lead days are integer epoch-day differences (DIV
    * arithmetic on positive epochs — truncation ≡ floor on both
    * engines); percentiles are the #108 nearest-rank integer histogram
    * (cum windows per priority over the bounded lead-day keyspace);
    * the mean is one division of exact integer sums.
    *
    * Plan: the lineitem⋈orders equi-join is the one data-scale
    * shuffle; everything after runs on the (priority, lead_day)
    * histogram, bounded by the calendar not the fact table.
    */
  def ordersLeadTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lead = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr("unix_timestamp(l_shipdate) DIV 86400" +
          " - unix_timestamp(o_orderdate) DIV 86400").as("d"))
    val hist = lead.groupBy("priority", "d")
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("priority").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("priority")
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("priority")
      .agg(max("n").as("n_items"),
        min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("d")))
          .as("p50_days"),
        min(when(col("cum") >= expr("(n * 90 + 99) DIV 100"), col("d")))
          .as("p90_days"),
        max("d").as("max_days"),
        (sum(col("d") * col("c")).cast("double") / max("n").cast("double"))
          .as("mean_days"))
  }

  val ordersLeadTimeSql: String =
    s"""WITH lead AS (
       |  SELECT o_orderpriority AS priority,
       |    (epoch_ms(l_shipdate) // 1000) // 86400
       |      - (epoch_ms(o_orderdate) // 1000) // 86400 AS d
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), h AS (
       |  SELECT priority, d, COUNT(*) AS c FROM lead GROUP BY 1, 2
       |), cum AS (
       |  SELECT priority, d, c,
       |    SUM(c) OVER (PARTITION BY priority ORDER BY d) AS cum,
       |    SUM(c) OVER (PARTITION BY priority) AS n
       |  FROM h
       |)
       |SELECT priority, CAST(MAX(n) AS BIGINT) AS n_items,
       |  MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN d END) AS p50_days,
       |  MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN d END) AS p90_days,
       |  MAX(d) AS max_days,
       |  CAST(SUM(d * c) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_days
       |FROM cum GROUP BY priority""".stripMargin

  // ------------------------------------- #249 revenue concentration

  /** #249: REVENUE CONCENTRATION per market segment — the Gini
    * coefficient and top-decile share of per-customer spend, THE
    * business-concentration statistic ("10% of customers drive X% of
    * revenue") and the risk number a revenue team tracks next to the
    * totals: two segments with equal revenue and opposite Gini need
    * opposite playbooks. Lorenz/Gini computed on the whole-dollar
    * spend grid (the #224 argument: cents never move a concentration
    * curve, and the grid bounds the histogram by dollar range, not
    * customer count).
    *
    * Exactness: per-customer spend sums are exact integers off one
    * custkey collapse; the (segment, dollars) histogram is bounded;
    * cumulative users/revenue are integer window sums per segment
    * (the #108 partitioned-window discipline); the Gini is the exact
    * trapezoid over grouped data — 1 − Σ(q_k+q_{k-1})(p_k−p_{k-1}) —
    * with each trapezoid one fixed IEEE tree over single divisions of
    * exact integers, quantized 1e-12 and summed order-free; the
    * top-decile share is a nearest-rank cut (integer ceil) and one
    * division.
    *
    * Plan: one data-scale shuffle (the custkey collapse) + a
    * broadcast segment attach; everything after runs on the bounded
    * (segment, dollars) histogram.
    */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("vc"))
      .groupBy("o_custkey").agg(sum("vc").as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("segment"), expr("cents DIV 100").as("usd"))
    val hist = spend.groupBy("segment", "usd")
      .agg(count(lit(1)).as("nu"), sum("usd").as("rev_cell"))
    val wCum = Window.partitionBy("segment").orderBy("usd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("segment")
    val wLag = Window.partitionBy("segment").orderBy("usd")
    val cum = hist
      .withColumn("cu", sum("nu").over(wCum))
      .withColumn("cr", sum(col("usd") * col("nu")).over(wCum))
      .withColumn("n", sum("nu").over(wAll))
      .withColumn("r", sum(col("usd") * col("nu")).over(wAll))
      .withColumn("pu", coalesce(lag("cu", 1).over(wLag), lit(0L)))
      .withColumn("pr", coalesce(lag("cr", 1).over(wLag), lit(0L)))
    val trap = graft.core.Exact.roundS(
      (col("cr").cast("double") / col("r").cast("double") +
        col("pr").cast("double") / col("r").cast("double")) *
        (col("cu").cast("double") / col("n").cast("double") -
          col("pu").cast("double") / col("n").cast("double")), 12)
    val gini = cum
      .select(col("segment"), col("n"), col("r"), trap.as("t"))
      .groupBy("segment")
      .agg(max("n").as("n_cust"),
        max("r").cast("double").as("rev_usd"),
        (lit(1.0) - graft.core.Exact.decSum(col("t"), 12)).as("gini"))
    val top = cum
      .filter(col("cu") <= expr("(n * 90 + 99) DIV 100"))
      .groupBy("segment")
      .agg((lit(1.0) -
        max("cr").cast("double") / max("r").cast("double"))
        .as("top10_share"))
    gini.join(top, Seq("segment"), "left")
      .select(col("segment"), col("n_cust"), col("rev_usd"), col("gini"),
        coalesce(col("top10_share"), lit(1.0)).as("top10_share"))
  }

  val revenueConcentrationSql: String = {
    import graft.core.Exact
    val trap = Exact.duckRoundS(
      """(CAST(cr AS DOUBLE) / CAST(r AS DOUBLE)
        | + CAST(pr AS DOUBLE) / CAST(r AS DOUBLE))
        | * (CAST(cu AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(pu AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin, 12)
    s"""WITH spend AS (
       |  SELECT c_mktsegment AS segment, cents // 100 AS usd
       |  FROM (
       |    SELECT o_custkey,
       |      CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
       |        AS BIGINT) AS cents
       |    FROM orders GROUP BY o_custkey
       |  ) s JOIN customer ON c_custkey = s.o_custkey
       |), h AS (
       |  SELECT segment, usd, COUNT(*) AS nu FROM spend GROUP BY 1, 2
       |), cum0 AS (
       |  SELECT segment, usd, nu,
       |    SUM(nu) OVER w AS cu,
       |    SUM(usd * nu) OVER w AS cr,
       |    SUM(nu) OVER (PARTITION BY segment) AS n,
       |    SUM(usd * nu) OVER (PARTITION BY segment) AS r
       |  FROM h
       |  WINDOW w AS (PARTITION BY segment ORDER BY usd)
       |), cum AS (
       |  SELECT *,
       |    COALESCE(LAG(cu) OVER wo, 0) AS pu,
       |    COALESCE(LAG(cr) OVER wo, 0) AS pr
       |  FROM cum0
       |  WINDOW wo AS (PARTITION BY segment ORDER BY usd)
       |), gini AS (
       |  SELECT segment, CAST(MAX(n) AS BIGINT) AS n_cust,
       |    CAST(MAX(r) AS DOUBLE) AS rev_usd,
       |    1.0::DOUBLE - ${Exact.duckSum("t", 12)} AS gini
       |  FROM (SELECT segment, n, r, $trap AS t FROM cum)
       |  GROUP BY segment
       |), top AS (
       |  SELECT segment,
       |    1.0::DOUBLE - CAST(MAX(cr) AS DOUBLE) / CAST(MAX(r) AS DOUBLE)
       |      AS top10_share
       |  FROM cum WHERE cu <= (n * 90 + 99) // 100
       |  GROUP BY segment
       |)
       |SELECT segment, n_cust, rev_usd, gini.gini,
       |  COALESCE(top.top10_share, 1.0::DOUBLE) AS top10_share
       |FROM gini LEFT JOIN top USING (segment)""".stripMargin
  }

  // --------------------------------------- #222 item-item neighbors

  /** Neighbors kept per item in the serving table. */
  val ItemNeighborsK = 5

  /** #222: the item-item cosine NEIGHBOR TABLE — the precomputed
    * serving artifact of item-based collaborative filtering (Sarwar et
    * al. 2001; the layout behind "customers who bought X also bought"):
    * for every part, its top-K co-purchase neighbors by cosine
    * cooc(a,b)/√(c(a)·c(b)) — the angle between the items' order-
    * incidence vectors, which #161's lift is not (lift normalizes by an
    * independence baseline; cosine by popularity magnitude, so a
    * neighbor list stays comparable across head and tail items).
    *
    * Exactness: co-occurrence and item counts are exact integers off
    * the shared basket frame ([[lpCache]]); the cosine is √ of ONE
    * exact integer product (correctly rounded by IEEE) followed by one
    * division — a two-op tree identical in both engines, so scores are
    * bit-exact with no quantization and the (score desc, neighbor)
    * ranking is deterministic.
    *
    * Scale: pair fan-out is map-side from per-order baskets (bounded
    * by basket size ≤ 7, never catalog size — the #93 argument), one
    * pair-keyed count, two broadcast-joinable item-count attaches, and
    * the top-K is a window PARTITIONED by item — the plan-guard
    * invariant holds; at serving scale this is exactly the nightly
    * batch job that materializes the neighbor store.
    */
  def itemNeighbors(spark: SparkSession, dir: String): DataFrame = {
    val lp = lpCache.getOrElseUpdate((spark, dir))(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct())
    val pairCnt = lp
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(orderedPairs("p1", "p2").as("pair"))
      .groupBy(col("pair.p1").as("p1"), col("pair.p2").as("p2"))
      .agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= RuleMinSupport)
    val itemCnt = lp.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("n_item"))
    val sym = pairCnt.select(explode(array(
        struct(col("p1").as("item"), col("p2").as("neighbor"), col("cooc")),
        struct(col("p2").as("item"), col("p1").as("neighbor"), col("cooc"))))
        .as("r"))
      .select(col("r.item").as("item"), col("r.neighbor").as("neighbor"),
        col("r.cooc").as("cooc"))
      .join(itemCnt.select(col("p").as("item"), col("n_item")), "item")
      .join(itemCnt.select(col("p").as("neighbor"),
        col("n_item").as("n_neighbor")), "neighbor")
      .withColumn("cosine", col("cooc").cast("double") /
        sqrt((col("n_item") * col("n_neighbor")).cast("double")))
    sym.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("item")
          .orderBy(col("cosine").desc, col("neighbor").asc)))
      .filter(col("rnk") <= ItemNeighborsK)
      .select(col("item"), col("neighbor"), col("cooc"), col("n_item"),
        col("n_neighbor"), col("cosine"), col("rnk").cast("int").as("rnk"))
  }

  val itemNeighborsSql: String =
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pc AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS cooc
       |  FROM lp a JOIN lp b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $RuleMinSupport
       |),
       |ic AS (SELECT l_partkey AS p, COUNT(*) AS n_item FROM lp GROUP BY 1),
       |sym AS (
       |  SELECT item, neighbor, cooc, ia.n_item AS n_item,
       |    ib.n_item AS n_neighbor,
       |    CAST(cooc AS DOUBLE) /
       |      sqrt(CAST(ia.n_item * ib.n_item AS DOUBLE)) AS cosine
       |  FROM (
       |    SELECT p1 AS item, p2 AS neighbor, cooc FROM pc
       |    UNION ALL
       |    SELECT p2, p1, cooc FROM pc
       |  )
       |  JOIN ic ia ON ia.p = item
       |  JOIN ic ib ON ib.p = neighbor
       |)
       |SELECT item, neighbor, cooc, n_item, n_neighbor, cosine,
       |  CAST(rnk AS INT) AS rnk
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY item
       |    ORDER BY cosine DESC, neighbor ASC) AS rnk
       |  FROM sym
       |) WHERE rnk <= $ItemNeighborsK""".stripMargin

  // ------------------------------------------------- #188/#189 decorrelation

  /** #188: TPC-H Q13 (customer distribution) — the canonical
    * LEFT-JOIN-decorrelation showcase: the spec phrases it as "orders
    * per customer including customers with none", which naive engines
    * run as a correlated COUNT subquery per customer; the Spark-first
    * plan is one left outer join + two aggregates, and the zero-order
    * customers fall out of the join's nulls (COUNT(col) skips them)
    * rather than out of N subquery probes.
    *
    * Scale: the join and the first groupBy share the SAME custkey
    * partitioning — EnsureRequirements plans ONE exchange per side,
    * and the per-customer counts never re-shuffle; the second groupBy
    * collapses onto the bounded c_count key space map-side. The
    * "special requests" predicate (adapted to the priority column this
    * schema carries) filters orders BEFORE the join, pushed to the
    * scan. Counts are integers end to end.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    s"""SELECT c_count, COUNT(*) AS custdist FROM (
       |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
       |  FROM customer LEFT OUTER JOIN (
       |    SELECT o_custkey, o_orderkey FROM orders
       |    WHERE o_orderpriority <> '1-URGENT'
       |  ) o ON c_custkey = o_custkey
       |  GROUP BY c_custkey
       |) GROUP BY c_count""".stripMargin

  /** #189: TPC-H Q17 (small-quantity-order revenue) — the correlated
    * SCALAR-AGG decorrelation showcase: the spec compares each lineitem
    * against 0.2·avg(quantity of ITS OWN part), which naive engines
    * evaluate as one aggregate subquery per row. Spark-first the
    * correlation is a WINDOW over the part key: one shuffle onto
    * l_partkey computes the per-part mean beside every row — no
    * join-back, no second exchange, no per-row probe.
    *
    * Scale: the brand predicate broadcasts the filtered part dim and
    * prunes the fact scan first; the window partitions by l_partkey
    * (per-part groups bounded by lineitems-per-part, never corpus
    * size). Exactness: quantities are integral doubles (sum exact in
    * any order), the threshold is two correctly-rounded ops
    * 0.2·(sum/count) mirrored literally, and revenue sums on the cent
    * grid ([[Exact.decSum]] scale 2) with the /7.0 applied once.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val w = Window.partitionBy("l_partkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("qty_cut",
        lit(0.2) * (sum("l_quantity").over(w) / count(lit(1)).over(w)))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg((Exact.decSum(col("l_extendedprice"), 2) / 7.0).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT ${Exact.duckSum("l_extendedprice", 2)} / 7.0 AS avg_yearly
       |FROM (
       |  SELECT l_quantity, l_extendedprice,
       |    CAST(0.2 AS DOUBLE) * (SUM(l_quantity) OVER (PARTITION BY l_partkey)
       |      / COUNT(*) OVER (PARTITION BY l_partkey)) AS qty_cut
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_brand = 'Brand#23'
       |) WHERE l_quantity < qty_cut""".stripMargin

  // ------------------------------------------ #195 Q4: EXISTS semi-join

  /** #195: TPC-H Q4 (order-priority checking) — the EXISTS decorrelation
    * showcase completing the correlated-subquery trio (#188 COUNT,
    * #189 scalar-agg, this one EXISTS): count orders per priority where
    * at least one lineitem shipped more than 90 days after the order
    * date. The spec form probes lineitem once per order; Spark-first
    * the EXISTS is a LEFT SEMI join on the order key with the date
    * predicate as the join filter — one shuffle per side on
    * l_orderkey/o_orderkey, and the semi join emits each order AT MOST
    * ONCE no matter how many lineitems qualify (no post-join distinct,
    * no row amplification — the property that makes semi the right
    * physical shape for EXISTS at any scale).
    *
    * Scale: both sides hash-partition on the order key (the fact
    * table's natural key, co-located free if the lake is bucketed on
    * it, #114); the priority rollup collapses onto 5 keys map-side.
    * Exactness: the date gap compares integer epoch seconds; outputs
    * are pure counts.
    */
  def q4PrioritySemi(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        expr("unix_micros(l_shipdate) DIV 1000000").as("ship_s"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) DIV 1000000").as("order_s"))
      .join(li, col("l_orderkey") === col("o_orderkey") &&
        col("ship_s") > col("order_s") + lit(90L * 86400L), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND epoch_ns(l_shipdate) // 1000000000
      |        > epoch_ns(o_orderdate) // 1000000000 + 90 * 86400)
      |GROUP BY o_orderpriority""".stripMargin

  // ------------------------------- #196 Q16: NOT-IN anti-join + distinct

  /** #196: TPC-H Q16 (parts/supplier relationship) — the NOT IN
    * decorrelation showcase: distinct suppliers per (brand, size),
    * excluding suppliers on a complaints blocklist. The spec's
    * `NOT IN (subquery)` is a LEFT ANTI join; the blocklist is
    * dictionary-sized (it is a filter over the supplier dim) so the
    * anti join BROADCASTS — the exclusion costs zero shuffle no matter
    * how big the fact side is. The blocklist itself is data-derived
    * (pHash(s_name) % 7 == 0 — the house fixture-from-data rule; a real
    * deployment supplies the same one-column set).
    *
    * Plan shape: lineitem collapses to distinct (partkey, suppkey)
    * FIRST (map-side combine onto the catalog-bounded pair space — the
    * fact table never reaches a join at event cardinality), then joins
    * the part dim and anti-joins the blocklist, both broadcast. The
    * final COUNT(DISTINCT) runs over the (brand, size)-bounded frame.
    * All-integer outputs: hash-exact with no quantization.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.PortableHash
    val bad = Tables.supplier(spark, dir)
      .filter(PortableHash.pHash(col("s_name")) % 7 === 0)
      .select("s_suppkey")
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
    ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
  }

  val q16Sql: String = {
    val badHash = graft.core.PortableHash.duck("s_name")
    s"""SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       |JOIN part ON p_partkey = l_partkey
       |WHERE l_suppkey NOT IN (
       |  SELECT s_suppkey FROM supplier WHERE $badHash % 7 = 0)
       |GROUP BY p_brand, p_size""".stripMargin
  }

  // -------------------------- #197 Q22: anti-join + scalar subquery

  /** #197: TPC-H Q22 (global sales opportunity) — the scalar-subquery +
    * NOT EXISTS pair in one query: high-balance customers (above the
    * positive-balance average) with no urgent order, rolled up per
    * market segment. Two decorrelations compose: the scalar average is
    * ONE global aggregate broadcast back as a 1-row frame (the
    * house scalar-crossJoin pattern — never a per-row subquery), and
    * the NOT EXISTS is a LEFT ANTI join against the urgent-order keys.
    *
    * Scale: the threshold pass is a map-side-combining global aggregate
    * (one row moves); the anti join keys on o_custkey — hash-partitioned
    * both sides, or broadcast when the urgent subset is small; the
    * segment rollup collapses onto 5 keys map-side. Exactness: the
    * average is an exact cent-grid integer sum with ONE division
    * (engine-identical double), the > compare is then exact, and the
    * output balance sums ride the same cent grid.
    */
  def q22IdleBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val cut = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(floor(col("c_acctbal") * 100.0 + 0.5).cast("long"))
        .cast("double") / 100.0 / count(lit(1))).as("bal_cut"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    c.select("c_custkey", "c_mktsegment", "c_acctbal")
      .crossJoin(broadcast(cut)) // 1-row scalar
      .filter(col("c_acctbal") > col("bal_cut"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        (sum(floor(col("c_acctbal") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0).as("total_bal"))
  }

  val q22Sql: String =
    """WITH cut AS (
      |  SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |         / 100.0 / COUNT(*) AS bal_cut
      |  FROM customer WHERE c_acctbal > 0.0
      |)
      |SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 100.0 AS total_bal
      |FROM customer, cut
      |WHERE c_acctbal > bal_cut
      |  AND c_custkey NOT IN (
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  // -------------------------- #228-232 TPC-H classics: Q6/Q7/Q10/Q14/Q18

  /** #228: TPC-H Q6 — the forecasting-revenue-change query: revenue
    * that WOULD have been earned had discounts in a band been dropped,
    * over one ship-year. The canonical scan benchmark: a pure
    * filter + 1-row aggregate with NO join — at 100 TB it measures
    * nothing but scan/pushdown efficiency, which is exactly why every
    * engine publishes it. Predicates land in PushedFilters; revenue =
    * Σ extendedprice·discount on the quantized grid (one product per
    * row — correctly rounded in both engines — then the order-free
    * scaled-integer sum). Discount-band literals are exact binary
    * comparisons of identical doubles.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(Exact.decSum(col("l_extendedprice") * col("l_discount"))
        .as("revenue"), count(lit(1)).as("n_items"))

  val q6Sql: String =
    s"""SELECT
       |  ${Exact.duckSum("l_extendedprice * l_discount")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24.0""".stripMargin

  /** #229: TPC-H Q7 — volume shipping between two nations, by flow
    * direction and ship year: the classic multi-join with a
    * DISJUNCTIVE nation-pair predicate ((s=A ∧ c=B) ∨ (s=B ∧ c=A))
    * that defeats naive single-sided pushdown. Spark-first: both
    * dimension sides filter to the two nations BEFORE any data-scale
    * join (selectivity 2/25 applied at the scan), supplier+nation
    * broadcast, and only lineitem⋈orders⋈customer shuffle — the pair
    * disjunction runs map-side over broadcast-joined nation names.
    * Revenue per (supp_nation, cust_nation, year) cell on the exact
    * grid; year is integer EXTRACT on both engines.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_8")
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${Exact.duckSum("volume")} AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       |    l_extendedprice * (1.0::DOUBLE - l_discount) AS volume
       |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       |      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |)
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** #230: TPC-H Q10 — the returned-item reporting query: the top 20
    * customers by revenue LOST to returns in one quarter, the
    * complaint-desk triage list. Lineitem filters to returnflag 'R'
    * and orders to the quarter before the data-scale joins; nation
    * broadcast; the top-k is ORDER BY the quantized revenue with a
    * custkey tiebreak → TakeOrderedAndProject (heap per partition +
    * driver merge of 20 rows — never a global sort), the #63
    * discipline. Revenue on the exact grid so the ranking is
    * cross-engine deterministic.
    */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1996-04-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")}
       |    AS revenue
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** #231: TPC-H Q14 — promotion effect: the promo share of one ship
    * month's revenue. Part dimension broadcast; the share is
    * 100·promo/total where BOTH sums are order-free quantized — the
    * numerator a conditional decSum — and the final expression is two
    * fixed ops (multiply then divide) over engine-identical doubles.
    * (p_type here is a flat category, so the promo test is equality,
    * not the reference benchmark's LIKE prefix — same plan shape.)
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-02-01 00:00:00"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        Exact.decSum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(0.0)).as("promo_revenue"),
        Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_share"))

  val q14Sql: String = {
    val rev = "l_extendedprice * (1.0::DOUBLE - l_discount)"
    s"""WITH s AS (
       |  SELECT
       |    ${Exact.duckSum(s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0.0::DOUBLE END")}
       |      AS promo_revenue,
       |    ${Exact.duckSum(rev)} AS total_revenue
       |  FROM lineitem, part
       |  WHERE l_partkey = p_partkey
       |    AND l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-02-01'
       |)
       |SELECT promo_revenue, total_revenue,
       |  100.0::DOUBLE * promo_revenue / total_revenue AS promo_share
       |FROM s""".stripMargin
  }

  /** Q18 total-quantity threshold (TPC-H's 300 scaled to this data's
    * basket sizes — 288 qualifying orders at sf0.001).
    */
  val Q18MinQty = 150L

  /** #232: TPC-H Q18 — large-volume ("big basket") customers: orders
    * whose total quantity exceeds a threshold, with their customer.
    * The classic groupBy-HAVING-then-join: the quantity rollup runs
    * FIRST (map-side-combining onto orderkey, the narrowest possible
    * shuffle) and only qualifying orderkeys — a tiny fraction — join
    * back to orders and customer. Quantities are whole numbers stored
    * as doubles; they cast to BIGINT before summing so the threshold
    * test and output are pure integers.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_orderkey").agg(sum("q").as("total_qty"))
      .filter(col("total_qty") > Q18MinQty)
    big.join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  val q18Sql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $Q18MinQty
       |)
       |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       |  total_qty
       |FROM big, orders, customer
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey""".stripMargin

  // ------------------------- #255-258 TPC-H classics: Q15/Q19/Q21/Q8

  /** #255: TPC-H Q15 — top supplier: the supplier(s) whose shipped
    * revenue over one quarter equals the MAXIMUM over all suppliers.
    * The benchmark phrases it as a view + a scalar `= (SELECT MAX...)`
    * subquery; Spark-first the view is one map-side-combining rollup
    * onto the supplier keyspace and the scalar max is a 1-row frame
    * broadcast back (the house scalar-crossJoin pattern) — never a
    * per-row probe, and the only data-scale work is the filtered scan
    * feeding the rollup.
    *
    * Exactness: revenue per supplier is an order-free quantized sum,
    * so the max and the `=` comparison are bit-deterministic in both
    * engines (ties — none in this data, but well-defined — would all
    * be emitted, exactly as the benchmark specifies).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")}
       |      AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY 1
       |), mx AS (SELECT MAX(total_revenue) AS max_revenue FROM rev)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev, mx, supplier
       |WHERE total_revenue = max_revenue AND l_suppkey = s_suppkey""".stripMargin

  /** #256: TPC-H Q19 — discounted revenue under a DISJUNCTION of
    * brand/size/quantity brackets: each disjunct constrains BOTH join
    * sides at once, the shape that defeats naive pushdown (no single
    * conjunct applies to either table alone). Spark-first: derive the
    * pushable ENVELOPE of the disjunction per side — part prunes to
    * the three brands, lineitem to the union quantity range — so each
    * scan reads only candidate rows, then the exact OR evaluates
    * map-side above a broadcast part join (Catalyst's CNF extraction
    * does part of this; deriving the envelope explicitly documents
    * the plan we need at 100 TB, where the lineitem envelope is the
    * difference between scanning 2% and 100% of the fact table).
    *
    * Exactness: bracket bounds are whole-number doubles compared
    * exactly; revenue is the order-free quantized sum. (p_container /
    * shipmode don't exist in this schema; size brackets stand in —
    * same disjunctive cross-table shape.)
    */
  def q19Brackets(spark: SparkSession, dir: String): DataFrame = {
    val brands = Seq("Brand#1", "Brand#2", "Brand#3")
    val p = Tables.part(spark, dir)
      .filter(col("p_brand").isin(brands: _*))
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 1.0 && col("l_quantity") <= 40.0)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1.0, 20.0)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 30) &&
          col("l_quantity").between(10.0, 30.0)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
          col("l_quantity").between(20.0, 40.0)))
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    s"""SELECT
       |  ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")}
       |    AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey AND (
       |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1.0 AND 20.0)
       |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
       |    AND l_quantity BETWEEN 10.0 AND 30.0)
       |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
       |    AND l_quantity BETWEEN 20.0 AND 40.0))""".stripMargin

  /** Days after order placement past which a shipment counts late
    * (#257; the schema has no commit/receipt dates — ship lag over
    * the order date is the same lateness semantics, cf. #246).
    */
  val Q21LateDays = 60L

  /** #257: TPC-H Q21 — suppliers who kept orders waiting: for
    * finished ('F') orders with MULTIPLE distinct suppliers, count per
    * supplier the orders where they shipped late and NO other supplier
    * did — the benchmark's EXISTS + NOT EXISTS double-correlation,
    * the hardest decorrelation in the suite. Spark-first both
    * correlated subqueries collapse into ONE orderkey-grained
    * aggregate: per (orderkey, suppkey) an any-late flag, per
    * orderkey the supplier count and the late-supplier count; a
    * supplier qualifies on an order iff late ∧ n_supp > 1 ∧
    * n_late = 1. The pair collapse, the order rollup, and the
    * join-back all share the SAME orderkey partitioning — one
    * data-scale exchange per side where the naive plan runs two extra
    * correlated probes of lineitem.
    *
    * Exactness: lateness is an integer epoch-day comparison (#246's
    * DIV idiom); everything downstream is counting; the top-20 is a
    * (numwait DESC, s_name) total order → TakeOrderedAndProject.
    */
  def q21LateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pair = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((expr("unix_timestamp(l_shipdate) DIV 86400" +
        " - unix_timestamp(o_orderdate) DIV 86400") > Q21LateDays)
        .cast("int")).as("late"))
    // r10 (guide §2.4): the per-order totals were a re-aggregation of
    // `pair` joined back to itself — two executions of the
    // lineitem⋈orders aggregate. A window over the same key computes
    // n_supp/n_late in one pass (identical per-order values).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    pair
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum("late").over(w))
      .filter(col("late") === 1 && col("n_supp") > 1L && col("n_late") === 1L)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Sql: String =
    s"""WITH pair AS (
       |  SELECT l_orderkey, l_suppkey,
       |    MAX(CASE WHEN (epoch_ms(l_shipdate) // 1000) // 86400
       |          - (epoch_ms(o_orderdate) // 1000) // 86400 > $Q21LateDays
       |        THEN 1 ELSE 0 END) AS late
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'
       |  GROUP BY 1, 2
       |), per_order AS (
       |  SELECT l_orderkey, COUNT(*) AS n_supp,
       |    CAST(SUM(late) AS BIGINT) AS n_late
       |  FROM pair GROUP BY 1
       |)
       |SELECT s_suppkey, s_name, COUNT(*) AS numwait
       |FROM pair JOIN per_order USING (l_orderkey)
       |  JOIN supplier ON l_suppkey = s_suppkey
       |WHERE late = 1 AND n_supp > 1 AND n_late = 1
       |GROUP BY 1, 2
       |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** #258: TPC-H Q8 — national market share: within one region's
    * customers and one part type, the share of yearly revenue
    * supplied by one nation. The widest join tree in the suite
    * (lineitem⋈orders⋈customer⋈part + two nation lookups + region),
    * and the classic two-level aggregate: the share is a conditional
    * sum over the same cells as the total, so ONE rollup computes
    * both — never two scans.
    *
    * Spark-first: part (type-filtered), supplier→nation, and the
    * region-pruned customer-nation frame all broadcast; only
    * lineitem⋈orders⋈customer shuffles. Both year buckets and the
    * nation test evaluate map-side. Exactness: both sums are
    * order-free quantized; the share is ONE division of exact
    * doubles; year is integer EXTRACT.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val shareNation = "NATION_3"
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_type") === "STANDARD").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        Exact.decSum(when(col("supp_nation") === shareNation,
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(0.0)).as("nation_revenue"),
        Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        (col("nation_revenue") / col("total_revenue")).as("mkt_share"))
  }

  val q8Sql: String =
    s"""WITH cells AS (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       |    ${Exact.duckSum(
             "CASE WHEN n1.n_name = 'NATION_3' THEN " +
             "l_extendedprice * (1.0::DOUBLE - l_discount) " +
             "ELSE 0.0::DOUBLE END")} AS nation_revenue,
       |    ${Exact.duckSum("l_extendedprice * (1.0::DOUBLE - l_discount)")}
       |      AS total_revenue
       |  FROM lineitem, orders, customer, part, supplier,
       |    nation n1, nation n2, region
       |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND l_partkey = p_partkey AND l_suppkey = s_suppkey
       |    AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
       |    AND p_type = 'STANDARD'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1
       |)
       |SELECT o_year, nation_revenue, total_revenue,
       |  nation_revenue / total_revenue AS mkt_share
       |FROM cells""".stripMargin

  // ------------------------------------------------ #280 Q9 (adapted)

  /** #280: TPC-H Q9 — product-type PROFIT by supplier nation and order
    * year: amount = revenue − supply cost, rolled up over the
    * lineitem⋈orders⋈part⋈supplier⋈nation tree for parts matching a
    * name pattern. ADAPTATION, pinned identically in the oracle: this
    * schema ships no partsupp, so unit supply cost reads from the
    * part's retail price (p_retailprice·l_quantity) — the join tree,
    * the amount expression shape, the name-pattern pushdown and the
    * (nation, year) rollup are Q9's; only the cost column's source
    * table differs (the #196/#221-style documented adaptation).
    *
    * Spark-first: the name filter prunes part BEFORE any data join and
    * the filtered part table broadcasts, as do supplier⋈nation; only
    * lineitem⋈orders shuffles, on the orderkey both sides already key
    * by. Exactness: the amount is two products of on-grid prices in a
    * fixed tree, quantized order-free per row; year is integer
    * EXTRACT; output bounded by nations × years.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(Exact.decSum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - col("p_retailprice") * col("l_quantity")).as("sum_profit"))
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation,
       |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       |  ${Exact.duckSum(
           "l_extendedprice * (1.0::DOUBLE - l_discount) " +
           "- p_retailprice * l_quantity")} AS sum_profit
       |FROM lineitem, part, supplier, orders, nation
       |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
       |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
       |  AND p_name LIKE '%widget%'
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- #302 open-order backlog

  /** #302: OPEN-ORDER BACKLOG — the daily count of orders placed but
    * not yet fully shipped: opened at `o_orderdate`, closed on the day
    * the LAST of its lineitems ships (max l_shipdate; orders with no
    * lineitems never close and sit in the backlog permanently — the
    * honest unfulfilled-order semantics). The operational WIP gauge the
    * TPC-H suite's point-in-time queries (q4 counts late orders IN a
    * quarter) cannot substitute for: backlog is a LEVEL, and levels
    * need the full open/close ledger cumulated from day one.
    *
    * Scale — the #268 sweep-line discipline on the day grid: open/close
    * events collapse map-side onto the DAY keyspace (bounded by the
    * date span, ~2.5k days, never the order count); the close day per
    * order is one max-aggregate on l_orderkey (the key lineitem joins
    * already shuffle on); the cumulation is a triangular join over the
    * broadcast day-totals frame — O(span²) pairs, CONSTANT in data
    * size, no unpartitioned window anywhere. Pure BIGINT counting.
    */
  def ordersBacklog(spark: SparkSession, dir: String): DataFrame = {
    val opened = Tables.orders(spark, dir)
      .groupBy(expr("unix_timestamp(o_orderdate) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n_opened"))
    val closed = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(max(expr("unix_timestamp(l_shipdate) DIV 86400")).as("cday"))
      .groupBy(col("cday").as("day"))
      .agg(count(lit(1)).as("n_closed"))
    val deltas = opened.join(closed, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
    deltas
      .join(broadcast(deltas.select(col("day").as("pd"),
        (col("n_opened") - col("n_closed")).as("pdelta"))),
        col("pd") <= col("day"))
      .groupBy("day", "n_opened", "n_closed")
      .agg(sum("pdelta").as("backlog"))
      .select("day", "n_opened", "n_closed", "backlog")
  }

  /** Oracle: the definitional single running sum over the merged day
    * ledger (a window is fine oracle-side; the Spark plan is the
    * constant-size triangular join).
    */
  val ordersBacklogSql: String =
    s"""WITH op AS (
       |  SELECT epoch_ms(o_orderdate) // 1000 // 86400 AS day,
       |    COUNT(*) AS n_opened
       |  FROM orders GROUP BY 1
       |), cl0 AS (
       |  SELECT l_orderkey,
       |    MAX(epoch_ms(l_shipdate) // 1000 // 86400) AS day
       |  FROM lineitem GROUP BY 1
       |), cl AS (
       |  SELECT day, COUNT(*) AS n_closed FROM cl0 GROUP BY 1
       |), m AS (
       |  SELECT COALESCE(op.day, cl.day) AS day,
       |    COALESCE(n_opened, 0) AS n_opened,
       |    COALESCE(n_closed, 0) AS n_closed
       |  FROM op FULL OUTER JOIN cl ON op.day = cl.day
       |)
       |SELECT day, n_opened, n_closed,
       |  CAST(SUM(n_opened - n_closed) OVER
       |    (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
       |FROM m""".stripMargin

  // --------------------------- #311 Q2: correlated-MIN decorrelation

  /** Q2's region and part scope (ASIA = the q5 house literal). */
  val Q2Region = "ASIA"
  val Q2Type = "STANDARD"

  /** #311: TPC-H Q2 (minimum-cost supplier), the correlated-MIN
    * decorrelation showcase — the one classic subquery shape the suite
    * still lacked (#188 COUNT, #189 scalar-agg, #195 EXISTS, #196 NOT
    * IN, #197 scalar-broadcast): for each STANDARD part, the
    * minimum-cost supplier among the region's suppliers, where the
    * spec's `ps_supplycost = (SELECT MIN(ps_supplycost) … same part,
    * same region)` becomes ONE groupBy-min over the region-filtered
    * cost frame joined back on equality — ties emit every minimal
    * supplier, exactly the spec's semantics.
    *
    * DOCUMENTED ADAPTATION (this corpus ships no partsupp table — the
    * #280 q9 convention): supply cost of (part, supplier) = the
    * minimum observed unit price over their lineitems, on the cent
    * grid (floor(extprice/qty·100 + 0.5) — one division and one
    * correctly-rounded quantization, then pure BIGINT MINs end to end).
    *
    * Scale: region suppliers are dimension-sized and broadcast; the
    * cost frame collapses map-side onto the (part, supplier) catalog
    * keyspace; the min and the join-back key on p_partkey — one
    * shuffle, reused by both sides.
    */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val rs = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === Q2Region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val p = Tables.part(spark, dir).filter(col("p_type") === Q2Type)
      .select("p_partkey")
    val cost = Tables.lineitem(spark, dir)
      .join(broadcast(rs), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
      .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 100.0
        + 0.5).cast("long")).as("cost_c"))
    val mn = cost.groupBy("p_partkey").agg(min("cost_c").as("mc"))
    cost.join(mn, "p_partkey")
      .filter(col("cost_c") === col("mc"))
      .select(col("p_partkey"), (col("cost_c").cast("double") / 100.0)
        .as("supply_cost"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
  }

  val q2Sql: String =
    s"""WITH rs AS (
       |  SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
       |  JOIN nation ON n_nationkey = s_nationkey
       |  JOIN region ON r_regionkey = n_regionkey
       |  WHERE r_name = '$Q2Region'
       |), cost AS (
       |  SELECT l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal, n_name,
       |    MIN(CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5)
       |      AS BIGINT)) AS cost_c
       |  FROM lineitem JOIN rs ON s_suppkey = l_suppkey
       |  JOIN part ON p_partkey = l_partkey AND p_type = '$Q2Type'
       |  GROUP BY 1, 2, 3, 4, 5
       |), mn AS (SELECT p_partkey, MIN(cost_c) AS mc FROM cost GROUP BY 1)
       |SELECT p_partkey, CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost,
       |  s_suppkey, s_name, s_acctbal, n_name
       |FROM cost JOIN mn USING (p_partkey) WHERE cost_c = mc""".stripMargin

  // ------------------- #312 Q11: HAVING-above-global-share pattern

  /** Q11's nation (the q7/q8 house literal — hosts suppliers at every
    * SF) and the share cut (spec: 0.0001/SF; here a fixed 1/1000 so the
    * integer cross-multiplied compare is scale-free).
    */
  val Q11Nation = "NATION_3"
  val Q11ShareDen = 1000L

  /** #312: TPC-H Q11 (important stock) — the HAVING-above-a-global-
    * scalar pattern: per-part supplied value within one nation, keeping
    * parts whose value exceeds 1/[[Q11ShareDen]] of the nation's
    * total. The spec's `HAVING SUM(…) > (SELECT SUM(…)·fraction)`
    * decorrelates into ONE pass building the per-part values + a
    * broadcast 1-row total, and the cut compares CROSS-MULTIPLIED
    * BIGINTs (value·1000 > total) — no float fraction anywhere, so the
    * operator is exact at any corpus size.
    *
    * DOCUMENTED ADAPTATION (no partsupp): stock value of a part =
    * Σ cents(l_extendedprice) over the nation's suppliers' lineitems.
    *
    * Scale: nation suppliers broadcast; values collapse map-side onto
    * the part keyspace; the total re-aggregates the part frame (tiny);
    * output bounded by the share cut.
    */
  def q11Share(spark: SparkSession, dir: String): DataFrame = {
    val ns = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === Q11Nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val vals = Tables.lineitem(spark, dir)
      .join(broadcast(ns), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
        .as("val_c"))
    val tot = vals.agg(sum("val_c").as("tot_c"))
    vals.crossJoin(broadcast(tot))
      .filter(col("val_c") * Q11ShareDen > col("tot_c"))
      .select(col("p_partkey"),
        (col("val_c").cast("double") / 100.0).as("value"),
        (col("val_c").cast("double") / col("tot_c")).as("share"))
  }

  val q11Sql: String =
    s"""WITH ns AS (
       |  SELECT s_suppkey FROM supplier
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = '$Q11Nation'
       |), vals AS (
       |  SELECT l_partkey AS p_partkey,
       |    CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS val_c
       |  FROM lineitem JOIN ns ON s_suppkey = l_suppkey
       |  GROUP BY 1
       |), tot AS (SELECT CAST(SUM(val_c) AS BIGINT) AS tot_c FROM vals)
       |SELECT p_partkey, CAST(val_c AS DOUBLE) / 100.0 AS value,
       |  CAST(val_c AS DOUBLE) / tot_c AS share
       |FROM vals, tot WHERE val_c * $Q11ShareDen > tot_c""".stripMargin

  // ------------------- #313 Q20: nested-IN dominant-supplier pattern

  val Q20Nation = "NATION_3"
  val Q20YearLo = "1996-01-01 00:00:00"
  val Q20YearHi = "1997-01-01 00:00:00"

  /** #313: TPC-H Q20 (excess/dominant stock) — the NESTED-IN pattern
    * (`s_suppkey IN (… ps_partkey IN (…) AND availqty > 0.5·shipped)`):
    * suppliers in one nation who DOMINATED a part's supply in one year
    * — shipped more than half of that part's total shipped quantity.
    * Both IN levels decorrelate into aggregations + joins: per-(part,
    * supplier) year quantities, per-part totals, the >50% cut as a
    * cross-multiplied integer compare (2·qty > total — exact, no
    * fraction), then a count per qualifying supplier.
    *
    * DOCUMENTED ADAPTATION (no partsupp): "availqty" is the supplier's
    * own shipped quantity of the part — the dominance reading of Q20's
    * excess-stock test. Quantities ride the cent grid (whole-valued
    * doubles → exact BIGINTs).
    *
    * Scale: one (part, supplier)-keyed aggregate over the year slice
    * (map-side combine), a part-keyed total re-aggregating that frame,
    * the cut a broadcast-free same-key join, and the nation filter a
    * broadcast dim join at the end — the fact table is scanned once.
    */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts(Q20YearLo) &&
        col("l_shipdate") < ts(Q20YearHi))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(floor(col("l_quantity") * 100.0 + 0.5).cast("long"))
        .as("qty_c"))
    val ptot = li.groupBy("l_partkey").agg(sum("qty_c").as("tot_c"))
    val ns = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === Q20Nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    li.join(ptot, "l_partkey")
      .filter(col("qty_c") * 2 > col("tot_c"))
      .join(broadcast(ns), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_dominant_parts"))
  }

  // ------------------------------- #316 Q12: late lines by service class

  /** #316: TPC-H Q12 (shipping modes and order priority) — the last of
    * the 22 classic shapes this corpus can express: among lines shipped
    * LATE in a one-year window, how many belong to urgent-priority
    * orders vs the rest, per service class. Adapted to the corpus
    * columns (no l_shipmode/l_commitdate/l_receiptdate here):
    * l_linestatus stands in for the mode dimension and "late" is a ship
    * lag of more than 60 days past the order date, where reference Q12
    * tests receipt-past-commit — the same fact⋈fact shape, date filter,
    * and CASE rollup.
    *
    * Plan: lineitem prunes to 3 columns with the year window pushed to
    * the scan BEFORE the join; the join keys on the order key — the
    * lake's natural bucket key (#114), co-located free when bucketed —
    * with the lateness predicate fused as a join filter so no wide row
    * survives it; the rollup collapses onto the 2-value status space
    * map-side. Outputs are pure counts: hash-exact, no quantization.
    */
  def q12Shipmode(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .select(col("l_orderkey"), col("l_linestatus"),
        expr("unix_micros(l_shipdate) DIV 1000000").as("ship_s"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) DIV 1000000").as("order_s"))
      .join(li, col("l_orderkey") === col("o_orderkey") &&
        col("ship_s") > col("order_s") + lit(60L * 86400L))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND epoch_ns(l_shipdate) // 1000000000
      |      > epoch_ns(o_orderdate) // 1000000000 + 60 * 86400
      |GROUP BY l_linestatus""".stripMargin

  val q20Sql: String =
    s"""WITH li AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS qty_c
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$Q20YearLo'
       |    AND l_shipdate < TIMESTAMP '$Q20YearHi'
       |  GROUP BY 1, 2
       |), ptot AS (
       |  SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS tot_c
       |  FROM li GROUP BY 1
       |), ns AS (
       |  SELECT s_suppkey, s_name FROM supplier
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = '$Q20Nation'
       |)
       |SELECT s_suppkey, s_name, COUNT(*) AS n_dominant_parts
       |FROM li JOIN ptot USING (l_partkey)
       |JOIN ns ON s_suppkey = l_suppkey
       |WHERE qty_c * 2 > tot_c
       |GROUP BY 1, 2""".stripMargin
}
