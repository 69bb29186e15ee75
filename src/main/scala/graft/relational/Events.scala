package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** Batch event-stream analytics: tumbling-window aggregation and
  * gap-based sessionization (the batch analogs of
  * [[graft.streaming.EventStreams]]).
  *
  * All event-time arithmetic happens on integer epoch SECONDS. The
  * driver's `events.parquet` has carried ts as TIMESTAMP(NANOS) in some
  * rounds (read as epoch-nano longs under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
  * in others (round 6; read as LTZ under the UTC session zone), so
  * [[tsNanos]] adapts on schema: either the long itself or
  * `unix_micros(ts)·1000`. Both are exact integer math —
  * engine-independent by construction, no float/timezone hazards in the
  * oracle compare (DuckDB's `epoch_ns` on its naive µs TIMESTAMP is the
  * same integer).
  *
  * Scale notes: both operators shuffle exactly once on their natural key
  * (window bucket / user_id); the sessionize window sort is per-user, so
  * skew is bounded by the hottest user — at 100 TB you'd pre-partition the
  * event log by user and day so this becomes a sort within partitions.
  */
object Events {

  /** Epoch-nanos of the `ts` column as a LONG, whatever physical type
    * the round's events.parquet carries: already a long of nanos under
    * nanosAsLong, or a µs timestamp (µs·1000 stays well inside Int64
    * until 2262). The CAST makes an NTZ column LTZ first (identity
    * under the UTC session zone), so this also survives a session
    * missing the inferTimestampNTZ conf.
    */
  def tsNanos(df: DataFrame): String =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "ts"
      case _ => "(unix_micros(CAST(ts AS TIMESTAMP)) * 1000L)"
    }

  /** events with `ts_s` (epoch seconds, long) replacing the raw ts. */
  def eventsS(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.withColumn("ts_s", expr(s"${tsNanos(e)} DIV 1000000000"))
  }

  val duckTsS = "(epoch_ns(ts) // 1000000000)"

  /** Tumbling 1-hour windows × event_type: count + exact value sum. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    eventsS(spark, dir)
      .groupBy((col("ts_s") - (col("ts_s") % 3600)).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.decSum(col("value")).as("sum_value"))

  val windowedAggSql: String =
    s"""SELECT $duckTsS - ($duckTsS % 3600) AS win_start, event_type,
       |  COUNT(*) AS n_events, ${Exact.duckSum("value")} AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Session gap: 30 minutes of inactivity closes a session. */
  val GapS = 1800L

  /** Gap-based sessions per user (gaps-and-islands): one row per session
    * with start/end, event count and exact value sum.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    eventsS(spark, dir)
      .withColumn("prev_ts", lag("ts_s", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull || col("ts_s") - col("prev_ts") > GapS).cast("int"))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts_s").as("session_start"),
        max("ts_s").as("session_end"),
        count(lit(1)).as("n_events"),
        Exact.decSum(col("value")).as("sum_value"))
  }

  val sessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value, $duckTsS AS ts_s FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_s - prev_ts > $GapS
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM (SELECT *, LAG(ts_s) OVER w AS prev_ts FROM e
       |        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
       |), numbered AS (
       |  SELECT *, CAST(SUM(new_session) OVER
       |    (PARTITION BY user_id ORDER BY ts_s, event_id
       |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, session_seq, MIN(ts_s) AS session_start,
       |  MAX(ts_s) AS session_end, COUNT(*) AS n_events,
       |  ${Exact.duckSum("value")} AS sum_value
       |FROM numbered GROUP BY user_id, session_seq""".stripMargin

  // --------------------------------------------------- JSON props extract

  /** #67: semi-structured extraction over the JSON `props` column:
    * `from_json` with a PROJECTED schema (`k INT`) — Spark parses only
    * the requested field path inside whole-stage codegen, never
    * materializing a generic JSON tree — then one integer aggregate per
    * event type. Malformed/missing JSON yields NULL, surfaced by the
    * `n ≠ n_k` gap (the standard dirty-data signal). One shuffle on the
    * tiny event_type key space; all outputs are exact integers.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count("k").as("n_k"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))

  /** Oracle note: the naive `CAST(json_extract(...) AS INT)` coerces
    * quoted numeric strings (`"5"` → 5) where Spark's `from_json` with
    * schema `k INT` yields NULL, so the oracle extracts ONLY when the
    * JSON value is an integer (`json_type` ∈ BIGINT/UBIGINT) — matching
    * Spark's strict typed parse on strings, doubles, booleans, nulls,
    * malformed JSON, and int overflow (TRY_CAST) alike.
    */
  val jsonExtractSql: String =
    s"""SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_k,
       |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
       |FROM (SELECT event_type,
       |        CASE WHEN json_valid(props)
       |              AND json_type(props, '$$.k') IN ('BIGINT', 'UBIGINT')
       |             THEN TRY_CAST(json_extract_string(props, '$$.k') AS INT)
       |        END AS k
       |      FROM events)
       |GROUP BY event_type""".stripMargin

  // ------------------------------------------------------------ as-of join

  /** #70: as-of join — each `click` event picks up the user's most
    * recent `purchase` at or before it (attribution; the time-series
    * join Spark has no native operator for). NOT a range join (which
    * explodes to |clicks|·|purchases| candidates before filtering):
    * both sides union with a side tag, shuffle ONCE on user_id, and a
    * running `last(…, ignoreNulls)` over (ts, tag, id) carries the
    * latest purchase forward — O(n log n) in the partition sort, zero
    * row amplification. Tie rule: a purchase at the same second sorts
    * before the click (tag 0 < 1), so "at or before" includes ties;
    * equal-time purchases break on event_id. At 100 TB: pre-partition
    * the log by (user, day) and this is a sort within partitions, same
    * as sessionize.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsS(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_s"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_s"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("purchase_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("purchase_ts",
        last(when(col("tag") === 0, col("ts_s")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_s").as("click_ts"), col("purchase_id"), col("purchase_ts"),
        (col("ts_s") - col("purchase_ts")).as("lag_s"))
  }

  val asofJoinSql: String =
    s"""WITH u AS (
       |  SELECT event_id, user_id, $duckTsS AS ts_s,
       |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |), w AS (
       |  SELECT *,
       |    LAST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
       |      OVER win AS purchase_id,
       |    LAST_VALUE(CASE WHEN tag = 0 THEN ts_s END IGNORE NULLS)
       |      OVER win AS purchase_ts
       |  FROM u
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_s, tag, event_id
       |                 ROWS UNBOUNDED PRECEDING)
       |)
       |SELECT event_id AS click_id, user_id, ts_s AS click_ts,
       |  purchase_id, purchase_ts, ts_s - purchase_ts AS lag_s
       |FROM w WHERE tag = 1""".stripMargin

  // --------------------------------------------------------------- funnel

  /** #89: ordered funnel analysis (view → click → purchase): how many
    * users complete each stage IN ORDER — the product-analytics staple.
    * Per user: earliest view t1, earliest click strictly after t1,
    * earliest purchase strictly after that; raw nanosecond timestamps
    * keep every compare exact-integer. Stage k is a conditional min
    * AFTER a user-keyed join against stage k−1, so all three aggregates
    * and both joins share the ONE user_id partitioning (AQE reuses the
    * exchange; at 100 TB a user-bucketed event log makes the whole
    * funnel shuffle-free). Output is one summary row: stage counts +
    * conversion rates (single exact divisions).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def stage(tpe: String, prev: DataFrame, prevTs: String, out: String) =
      e.filter(col("event_type") === tpe)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min("ts").as(out))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = stage("click", s1, "t1", "t2")
    val s3 = stage("purchase", s2, "t2", "t3")
    val counts = Seq(
      e.select(countDistinct("user_id").as("n_users")),
      s1.select(countDistinct("user_id").as("n_view")),
      s2.select(countDistinct("user_id").as("n_click")),
      s3.select(countDistinct("user_id").as("n_purchase")))
      .reduce((a, b) => a.crossJoin(broadcast(b)))
    counts.select(col("n_users"), col("n_view"), col("n_click"),
      col("n_purchase"),
      (col("n_click").cast("double") / col("n_view").cast("double"))
        .as("view_to_click"),
      (col("n_purchase").cast("double") / col("n_click").cast("double"))
        .as("click_to_purchase"))
  }

  val funnelSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events
       |), s1 AS (
       |  SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view'
       |  GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, MIN(ts) AS t2 FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, MIN(ts) AS t3 FROM e JOIN s2 USING (user_id)
       |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id
       |)
       |SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
       |  (SELECT COUNT(DISTINCT user_id) FROM s1) AS n_view,
       |  (SELECT COUNT(DISTINCT user_id) FROM s2) AS n_click,
       |  (SELECT COUNT(DISTINCT user_id) FROM s3) AS n_purchase,
       |  CAST((SELECT COUNT(DISTINCT user_id) FROM s2) AS DOUBLE)
       |    / CAST((SELECT COUNT(DISTINCT user_id) FROM s1) AS DOUBLE) AS view_to_click,
       |  CAST((SELECT COUNT(DISTINCT user_id) FROM s3) AS DOUBLE)
       |    / CAST((SELECT COUNT(DISTINCT user_id) FROM s2) AS DOUBLE) AS click_to_purchase""".stripMargin

  // ------------------------------------------------------------ retention

  private val NsPerDay = 86400L * 1000000000L

  /** #90: cohort retention — users grouped by first-seen day, counted on
    * each later active day; the (cohort_day, day_offset) matrix every
    * growth dashboard plots. Two aggregates and one join, ALL keyed on
    * user_id except the final dictionary-small (cohort, offset) rollup;
    * the distinct (user, day) pass collapses map-side, so shuffle bytes
    * are bounded by active-user-days. Integer day arithmetic (epoch-ns
    * DIV ns/day) keeps everything exact; the rate is one division
    * against the broadcast cohort size.
    */
  /** r10 (guide §5 "materialize once"): the distinct (user, day)
    * activity frame — built identically by #90 retention, #211 growth
    * accounting and #226 stickiness, and referenced FIVE times inside
    * growth accounting's single plan. Derived-tier cached; Bench's
    * cold legs still charge the events scan (clearDerived). Day is
    * integer ts_s DIV 86400 ≡ (epoch_ns DIV ns_per_day) ≡ the previous
    * double-division-then-cast for ts_s ∈ [0, 2⁴⁰] (quotient
    * granularity 1/86400 dwarfs double rounding error) — re-proved
    * hash-exact vs the oracle for all three consumers.
    */
  private val userDayCache = new graft.core.DfCache[(SparkSession, String)]

  private def userDay(spark: SparkSession, dir: String): DataFrame =
    userDayCache.getOrElseUpdate((spark, dir)) {
      eventsS(spark, dir)
        .select(col("user_id"), expr("ts_s DIV 86400").as("day"))
        .distinct()
    }

  def retention(spark: SparkSession, dir: String): DataFrame = {
    val byDay = userDay(spark, dir)
    val cohorts = byDay.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    byDay.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
  }

  /** #97: value-anomaly detection per event type — the monitoring query
    * every event pipeline runs: per-type mean/std over `value`, then
    * flag events beyond 3σ. Two passes sharing one partitioning: a
    * 5-key moment aggregate (Σv, Σv² on the exact quantized grid —
    * population variance in the textbook E[v²]−E[v]² form, every term
    * mirrored in literal order), broadcast back, then a map-side flag +
    * per-type outlier count with min/max of the flagged values. At
    * 100 TB both passes are map-side-combining aggregates onto the
    * event-type key space; nothing shuffles but partials.
    */
  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val stats = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      (Exact.decSum(col("value"), 6) / count(lit(1))).as("mean"),
      (Exact.decSum(col("value") * col("value"), 6) / count(lit(1))).as("m2"))
      .withColumn("std", sqrt(col("m2") - col("mean") * col("mean")))
    e.join(broadcast(stats), "event_type")
      .withColumn("is_out",
        when(abs(col("value") - col("mean")) > lit(3.0) * col("std"), 1L)
          .otherwise(0L))
      .groupBy("event_type")
      .agg(
        max(col("n")).as("n"),
        sum("is_out").as("n_outliers"),
        min(when(col("is_out") === 1, col("value"))).as("out_min"),
        max(when(col("is_out") === 1, col("value"))).as("out_max"))
  }

  val anomalySql: String =
    s"""WITH stats AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    ${Exact.duckSum("value", 6)} / COUNT(*) AS mean,
       |    ${Exact.duckSum("value * value", 6)} / COUNT(*) AS m2
       |  FROM events GROUP BY event_type
       |), s2 AS (
       |  SELECT event_type, n, mean, sqrt(m2 - mean * mean) AS std FROM stats
       |)
       |SELECT e.event_type, MAX(s2.n) AS n,
       |  CAST(SUM(CASE WHEN abs(value - mean) > 3.0 * std THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  MIN(CASE WHEN abs(value - mean) > 3.0 * std THEN value END) AS out_min,
       |  MAX(CASE WHEN abs(value - mean) > 3.0 * std THEN value END) AS out_max
       |FROM events e JOIN s2 USING (event_type)
       |GROUP BY e.event_type""".stripMargin

  val retentionSql: String =
    s"""WITH byday AS (
       |  SELECT DISTINCT user_id, epoch_ns(ts) // $NsPerDay AS day FROM events
       |), cohorts AS (
       |  SELECT user_id, MIN(day) AS cohort_day FROM byday GROUP BY user_id
       |), sizes AS (
       |  SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_day
       |)
       |SELECT b.cohort_day, b.day_offset, b.n_active, s.cohort_size,
       |  CAST(b.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
       |FROM (
       |  SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
       |    COUNT(*) AS n_active
       |  FROM byday d JOIN cohorts c USING (user_id)
       |  GROUP BY 1, 2
       |) b JOIN sizes s USING (cohort_day)""".stripMargin

  // --------------------------------------------------------- cohort LTV

  /** #177: cohort lifetime-value curves — the VALUE companion of #90's
    * activity matrix (the other chart on the same growth dashboard):
    * per (cohort_day, day_offset), the day's event count and value, the
    * cumulative cohort value, and cumulative value per cohort user (the
    * LTV curve whose asymptote prices an acquisition).
    *
    * Exactness: daily value is summed as SCALED LONGS (the decSum grid
    * at 1e-6) and the cumulation runs over those exact integers in a
    * window ordered by the unique day_offset — division back to doubles
    * happens ONCE at the end, so the whole curve is order-independent
    * and engine-identical.
    *
    * Scale: the two user-keyed aggregates share retention's shape and
    * partitioning; the cumulative window is partitioned by cohort_day
    * with frames bounded by the DAY SPAN of the corpus (never event
    * count); the per-user divisor joins from the broadcast size table.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val base = e.select(col("user_id"),
      expr(s"${tsNanos(e)} DIV $NsPerDay").as("day"), col("value"))
    val cohorts = base.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    val daily = base.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("rev_s"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("rev_cum_s", sum("rev_s").over(w))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_events"),
        col("cohort_size"),
        (col("rev_s").cast("double") / 1e6).as("rev_day"),
        (col("rev_cum_s").cast("double") / 1e6).as("rev_cum"),
        ((col("rev_cum_s").cast("double") / 1e6) /
          col("cohort_size").cast("double")).as("ltv_per_user"))
  }

  val cohortLtvSql: String =
    s"""WITH base AS (
       |  SELECT user_id, epoch_ns(ts) // $NsPerDay AS day, value FROM events
       |), cohorts AS (
       |  SELECT user_id, MIN(day) AS cohort_day FROM base GROUP BY user_id
       |), sizes AS (
       |  SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_day
       |), daily AS (
       |  SELECT c.cohort_day, b.day - c.cohort_day AS day_offset,
       |    COUNT(*) AS n_events,
       |    CAST(SUM(CAST(floor(b.value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_s
       |  FROM base b JOIN cohorts c USING (user_id)
       |  GROUP BY 1, 2
       |), cum AS (
       |  SELECT *, CAST(SUM(rev_s) OVER (
       |    PARTITION BY cohort_day ORDER BY day_offset
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rev_cum_s
       |  FROM daily
       |)
       |SELECT c.cohort_day, c.day_offset, c.n_events, s.cohort_size,
       |  CAST(c.rev_s AS DOUBLE) / 1000000.0 AS rev_day,
       |  CAST(c.rev_cum_s AS DOUBLE) / 1000000.0 AS rev_cum,
       |  (CAST(c.rev_cum_s AS DOUBLE) / 1000000.0) /
       |    CAST(s.cohort_size AS DOUBLE) AS ltv_per_user
       |FROM cum c JOIN sizes s USING (cohort_day)""".stripMargin

  /** #108: exact per-type value percentiles (p50/p90/p99) — the standing
    * latency/amount SLO report of any event pipeline — by the
    * fixed-grid histogram method: quantize the value to the 0.01 grid
    * (one map-side op), build the (type, grid-cell) histogram with a
    * map-side-combining count, then take nearest-rank percentiles
    * (k = ⌈p·n⌉ in INTEGER arithmetic — `(n·90 + 99) DIV 100`, never
    * FP, whose ceil can flip an exact boundary) as the smallest cell
    * whose cumulative count reaches k.
    *
    * Scale: this is the standard exact-quantile-at-scale trick — the
    * shuffle carries the BOUNDED histogram (value-range / grid cells
    * per type), not events, and the per-type cumulative window runs
    * over that bounded frame. Contrast approxQuantile: same plan
    * shape, but with a 0.01-grid guarantee instead of an ε-rank one.
    * Every op (quantize, integer sums, integer DIV, one final /100.0)
    * is exactly mirrored — no interpolation, no non-dyadic p problem
    * (R-7 at p=0.9/0.99 would interpolate with non-dyadic fractions,
    * whose op order engines disagree on; nearest-rank stays integral).
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100.0 + lit(0.5)).cast("long").as("vi"))
      .groupBy("event_type", "vi").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("vi")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("event_type")
      .agg(
        max("n").as("n_events"),
        (min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("vi"))) / 100.0).as("p50"),
        (min(when(col("cum") >= expr("(n * 90 + 99) DIV 100"), col("vi"))) / 100.0).as("p90"),
        (min(when(col("cum") >= expr("(n * 99 + 99) DIV 100"), col("vi"))) / 100.0).as("p99"),
        (max("vi") / 100.0).as("v_max"))
  }

  val valueQuantilesSql: String =
    s"""WITH h AS (
       |  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vi,
       |    COUNT(*) AS c
       |  FROM events GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type, vi, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY vi) AS cum,
       |    SUM(c) OVER (PARTITION BY event_type) AS n
       |  FROM h
       |)
       |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       |  MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN vi END) / 100.0 AS p50,
       |  MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN vi END) / 100.0 AS p90,
       |  MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN vi END) / 100.0 AS p99,
       |  MAX(vi) / 100.0 AS v_max
       |FROM cum GROUP BY event_type""".stripMargin

  // --------------------------------------------- #166 MAD robust anomaly

  /** Robust-z cutoff: 3·1.4826 (the MAD→σ consistency constant for a
    * normal), folded to one literal double interpolated verbatim into
    * the oracle.
    */
  val MadCut = 3.0 * 1.4826

  /** #166: MAD-based robust anomaly report — the ROBUST sibling of the
    * #97 3σ monitor: mean/σ are themselves dragged by the outliers they
    * hunt (one 1e9 value inflates σ until nothing else flags); median
    * and MAD (median absolute deviation) have breakdown point 50%, so
    * the robust z-score |v − med| > 3·1.4826·MAD is the production
    * choice for skewed/contaminated value streams. Exact, via the #108
    * fixed-grid histogram method applied TWICE: the value histogram
    * yields each type's median (integer nearest-rank), the deviation
    * histogram — |vi − med_i| in integer grid cells, derived from the
    * SAME histogram, not a second data scan — yields the MAD, and the
    * outlier count is one conditional sum over the bounded histogram.
    *
    * Scale: the events scan happens ONCE (the grid histogram); every
    * later stage operates on the (type, cell) frame — bounded by value
    * range / grid, not event count — with cum windows partitioned per
    * type. The cutoff multiply is one correctly-rounded op mirrored
    * literally; everything else is integer arithmetic.
    */
  def madAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100.0 + lit(0.5)).cast("long").as("vi"))
      .groupBy("event_type", "vi").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("vi")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val med = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("event_type")
      .agg(max("n").as("n_events"),
        min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("vi")))
          .as("med_i"))
    val dev = hist.join(med, "event_type")
      .groupBy(col("event_type"), abs(col("vi") - col("med_i")).as("di"))
      .agg(sum("c").as("c"))
    val wDev = Window.partitionBy("event_type").orderBy("di")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev
      .withColumn("cum", sum("c").over(wDev))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("event_type")
      .agg(min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("di")))
        .as("mad_i"))
    hist.join(med, "event_type").join(mad, "event_type")
      .groupBy(col("event_type"), col("n_events"), col("med_i"), col("mad_i"))
      .agg(sum(when(abs(col("vi") - col("med_i")).cast("double") >
          lit(MadCut) * col("mad_i").cast("double"), col("c")).otherwise(0L))
        .as("n_outliers"))
      .select(col("event_type"), col("n_events"),
        (col("med_i") / 100.0).as("med"), (col("mad_i") / 100.0).as("mad"),
        col("n_outliers"))
  }

  val madAnomalySql: String =
    s"""WITH h AS (
       |  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vi,
       |    COUNT(*) AS c
       |  FROM events GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type, vi, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY vi) AS cum,
       |    SUM(c) OVER (PARTITION BY event_type) AS n
       |  FROM h
       |), med AS (
       |  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       |    MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN vi END) AS med_i
       |  FROM cum GROUP BY event_type
       |), dev AS (
       |  SELECT h.event_type, abs(h.vi - med.med_i) AS di, SUM(h.c) AS c
       |  FROM h JOIN med USING (event_type) GROUP BY 1, 2
       |), dcum AS (
       |  SELECT event_type, di, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY di) AS cum,
       |    SUM(c) OVER (PARTITION BY event_type) AS n
       |  FROM dev
       |), mad AS (
       |  SELECT event_type,
       |    MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN di END) AS mad_i
       |  FROM dcum GROUP BY event_type
       |)
       |SELECT h.event_type, med.n_events,
       |  med.med_i / 100.0 AS med, mad.mad_i / 100.0 AS mad,
       |  CAST(SUM(CASE WHEN CAST(abs(h.vi - med.med_i) AS DOUBLE) >
       |    $MadCut * CAST(mad.mad_i AS DOUBLE) THEN h.c ELSE 0 END) AS BIGINT)
       |    AS n_outliers
       |FROM h JOIN med USING (event_type) JOIN mad USING (event_type)
       |GROUP BY 1, 2, 3, 4""".stripMargin

  // --------------------------------------------------- #148 CUBE lattice

  /** #148: CUBE over (event_type, day) — the full grouping-sets LATTICE
    * (detail, each one-dimension margin, grand total in one pass),
    * completing the multi-level aggregation surface next to #71's
    * ROLLUP (rollup is the hierarchy prefix chain; cube is every
    * subset — the dashboard "slice by anything" query). Spark plans
    * ONE Expand (4 grouping sets) + one aggregate: a single shuffle
    * whose input is 4× the rows but whose partials still combine
    * map-side — at 100 TB the alternative (4 separate scans/aggs) reads
    * the data four times. Grouping markers disambiguate a real NULL
    * from a margin row, decSum keeps the value sums exact across the
    * replicated rows.
    */
  def cube(spark: SparkSession, dir: String): DataFrame =
    eventsS(spark, dir)
      .select(col("event_type"), expr("ts_s DIV 86400").as("day"), col("value"))
      .cube("event_type", "day")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value")).as("sum_value"),
        grouping("event_type").as("g_t"), grouping("day").as("g_d"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit(-1L)).as("day"),
        col("n"), col("sum_value"), col("g_t"), col("g_d"))

  val cubeSql: String =
    s"""SELECT
       |  COALESCE(event_type, 'ALL') AS event_type,
       |  COALESCE(day, -1) AS day,
       |  COUNT(*) AS n,
       |  ${Exact.duckSum("value")} AS sum_value,
       |  CAST(GROUPING(event_type) AS TINYINT) AS g_t,
       |  CAST(GROUPING(day) AS TINYINT) AS g_d
       |FROM (SELECT event_type, $duckTsS // 86400 AS day, value FROM events)
       |GROUP BY CUBE(event_type, day)""".stripMargin

  // --------------------------------------------- #147 SCD2 history build

  /** #147: SLOWLY-CHANGING-DIMENSION type 2 history from a change
    * stream — the warehouse-dimension primitive paired with #146's
    * MERGE (merge maintains the CURRENT table; SCD2 keeps every
    * version with validity intervals so facts join "as of" their own
    * time — the other half of every CDC ingest design). The events
    * stream is read as a per-user attribute change log: consecutive
    * no-change rows collapse (standard SCD2 — a version exists only
    * when the value actually changed), each surviving version is valid
    * [eff_from, eff_to) with eff_to = the next version's start, and the
    * open version is flagged current.
    *
    * Plan: ONE shuffle onto user_id shared by both windows (the change
    * filter's lag and the interval's lead — same partitioning, Spark
    * plans one Exchange + one Sort); windows bounded per user. The
    * as-of join that CONSUMES this table is #70. Integer second math
    * throughout; `value` comparisons are exact double equality on
    * identical parquet bits.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val changes = eventsS(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"), col("value"))
      .withColumn("prev_v", lag("value", 1).over(byUser))
      .filter(col("prev_v").isNull || col("value") =!= col("prev_v"))
    changes
      .withColumn("eff_to_s", lead("ts_s", 1).over(byUser))
      .select(col("user_id"), col("value"), col("ts_s").as("eff_from_s"),
        col("eff_to_s"), col("eff_to_s").isNull.as("is_current"))
  }

  val scd2Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, $duckTsS AS ts_s, value FROM events
       |), chg AS (
       |  SELECT user_id, event_id, ts_s, value FROM (
       |    SELECT *, LAG(value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_v
       |    FROM ev
       |  ) WHERE prev_v IS NULL OR value <> prev_v
       |)
       |SELECT user_id, value, ts_s AS eff_from_s,
       |  LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS eff_to_s,
       |  LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL AS is_current
       |FROM chg""".stripMargin

  // --------------------------------------------- #142 inter-arrival gaps

  /** #142: per-type INTER-ARRIVAL time report — the "how often does this
    * happen, and has the cadence changed" half of the SLO pair (#108
    * covers value percentiles, this covers TIME-BETWEEN-events):
    * per-user gap = ts − previous ts (the gap belongs to the LATER
    * event's type — "time since the user's last action when a purchase
    * arrives"), then exact p50/p90 + mean of the gap distribution per
    * type via the #108 fixed-histogram method. Gaps are already integer
    * seconds, so the histogram needs no grid at all.
    *
    * Plan: one user-partitioned lag window (bounded per user — the
    * sessionize partitioning, reused), a (type, gap) histogram with
    * map-side combine (shuffle carries the BOUNDED histogram, not
    * events), cumulative windows over the bounded frame, nearest-rank
    * picks in INTEGER arithmetic. Mean is an exact integer-sum ratio.
    */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val gaps = eventsS(spark, dir)
      .withColumn("gap", col("ts_s") - lag("ts_s", 1).over(byUser))
      .filter(col("gap").isNotNull)
      .select(col("event_type"), col("gap"))
    val hist = gaps.groupBy("event_type", "gap").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("gap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("event_type")
      .agg(
        max("n").as("n_gaps"),
        (sum(col("gap") * col("c")).cast("double") / max("n")).as("mean_s"),
        min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("gap"))).as("p50_s"),
        min(when(col("cum") >= expr("(n * 90 + 99) DIV 100"), col("gap"))).as("p90_s"),
        max("gap").as("max_s"))
  }

  val TopkPerWindow = 3

  /** #185: per-window top-k users by summed value — the LEADERBOARD
    * query (top spenders per hour / noisiest tenants per window), the
    * group-wise-top-k pattern at event scale: aggregate per (window,
    * user), rank WITHIN each window, keep k.
    *
    * Exactness: the ranking key is the SCALED-LONG value sum (1e-6
    * grid) — ranks compare exact integers, never floats, with user_id
    * as the total tie-break; division back to a double happens once in
    * the projection. Scale: one (window, user)-keyed aggregate with
    * map-side combine, then a window PARTITIONED by the time bucket —
    * per-partition input is the window's ACTIVE-USER count, not its
    * event count, and output is k rows per window.
    */
  def windowedTopk(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsS(spark, dir)
      .groupBy((col("ts_s") - (col("ts_s") % 3600)).as("win_start"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("v_s"))
    agg.withColumn("rnk", row_number().over(
        Window.partitionBy("win_start").orderBy(col("v_s").desc, col("user_id").asc)))
      .filter(col("rnk") <= TopkPerWindow)
      .select(col("win_start"), col("rnk"), col("user_id"), col("n_events"),
        (col("v_s").cast("double") / 1e6).as("sum_value"))
  }

  val windowedTopkSql: String =
    s"""WITH agg AS (
       |  SELECT ts_s - (ts_s % 3600) AS win_start, user_id,
       |    COUNT(*) AS n_events,
       |    CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS v_s
       |  FROM (SELECT user_id, value, $duckTsS AS ts_s FROM events)
       |  GROUP BY 1, 2
       |)
       |SELECT win_start, rnk, user_id, n_events,
       |  CAST(v_s AS DOUBLE) / 1000000.0 AS sum_value
       |FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY win_start ORDER BY v_s DESC, user_id ASC) AS INT) AS rnk
       |  FROM agg
       |) WHERE rnk <= $TopkPerWindow""".stripMargin

  /** #181: event-type transition matrix — the first-order Markov model
    * of user flows (the session-flow/Sankey artifact every product
    * analytics stack derives, and the generative model behind
    * next-event prediction baselines): for each ordered in-session pair
    * of consecutive events of one user, count (from_type → to_type) and
    * normalize per source row.
    *
    * Exactness: counts are integers; each probability is ONE int/int
    * division (rows are exactly row-stochastic: Σn per from_type equals
    * n_from by construction — the spec asserts the identity on the
    * integers, not on float sums).
    *
    * Scale: the successor pairing is the SAME per-user sequence window
    * sessionize/interarrival already pay (the canonical user-keyed
    * sort); the
    * transition aggregate lands on ≤ |types|² keys with map-side
    * combine, and the normalizing window runs over that dictionary-
    * small frame, never the data.
    */
  /** r10 (guide §5 "materialize once"): the ≤|types|²-row transition
    * frame is derived-tier cached — #181 itself, #244's four power
    * iterations and #248's two legs each re-paid the events-scale
    * per-user successor window otherwise. Bench's cold legs still
    * charge the scan (clearDerived precedes them).
    */
  private val markovCache = new graft.core.DfCache[(SparkSession, String)]

  def markovTransitions(spark: SparkSession, dir: String): DataFrame =
    markovCache.getOrElseUpdate((spark, dir)) {
      val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
      val pairs = eventsS(spark, dir)
        .withColumn("next_type", lead("event_type", 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      val cnt = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      cnt.withColumn("n_from", sum("n").over(Window.partitionBy("from_type")))
        .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
        // ≤|types|² rows: single-partition so the ~20 downstream stages
        // of #244/#248 launch 1 task, not 32 (guide §2.6 small-frame
        // task-launch overhead dominated both queries' exec legs)
        .coalesce(1)
    }

  val markovTransitionsSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |    LEAD(event_type) OVER (
       |      PARTITION BY user_id ORDER BY $duckTsS, event_id) AS next_type
       |  FROM events
       |), cnt AS (
       |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
       |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT from_type, to_type, n,
       |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
       |  CAST(n AS DOUBLE) /
       |    CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE) AS p
       |FROM cnt""".stripMargin

  // -------------------------------------- #244 Markov stationary dist

  /** Power-iteration steps for the stationary distribution. */
  val MarkovIters = 4

  /** #244: the STATIONARY DISTRIBUTION of the user-journey Markov
    * chain (#181's transition matrix): where the chain SETTLES — the
    * long-run share of attention each event type commands if users
    * keep behaving as observed, the number the transition matrix only
    * implies. π = πP by [[MarkovIters]] power steps from uniform (the
    * PageRank recursion on the behavioral chain; the event-type state
    * space is dictionary-sized so every frame here is tiny).
    *
    * Exactness: transition probabilities are the #181 single
    * divisions (bit-identical); each step's π_j = Σ_i π_i·p_ij uses
    * one correctly-rounded product per term and the order-free
    * decSum(12) grid (the PageRank discipline — a 5-term double sum
    * is still order-sensitive); states with no outgoing transitions
    * get an explicit self-loop so no mass leaks (documented, mirrored).
    *
    * Plan: dictionary-sized joins end to end — the one data-scale
    * stage is #181's transition count itself (shared shape).
    */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val p = markovTransitions(spark, dir)
      .select("from_type", "to_type", "p")
    val states = p.select(col("from_type").as("s"))
      .unionByName(p.select(col("to_type").as("s"))).distinct()
    val noOut = states
      .join(p.select(col("from_type").as("s")).distinct(), Seq("s"),
        "left_anti")
      .select(col("s").as("from_type"), col("s").as("to_type"),
        lit(1.0).as("p"))
    val pFull = p.unionByName(noOut)
    val ns = states.agg(count(lit(1)).as("ns"))
    var pi = states.crossJoin(broadcast(ns))
      .select(col("s"), (lit(1.0) / col("ns")).as("pi"))
    (1 to MarkovIters).foreach { _ =>
      pi = pFull.join(pi.select(col("s").as("from_type"), col("pi")),
          "from_type")
        .groupBy(col("to_type"))
        .agg(Exact.decSum(col("pi") * col("p"), 12).as("pi"))
        .select(col("to_type").as("s"), col("pi"))
    }
    pi.select(col("s").as("state"), col("pi"))
  }

  val markovStationarySql: String = {
    import graft.core.Exact
    def step(k: Int): String =
      s"""pi$k AS (
         |  SELECT to_type AS s, ${Exact.duckSum("pi * p", 12)} AS pi
         |  FROM pfull JOIN pi${k - 1} ON pfull.from_type = pi${k - 1}.s
         |  GROUP BY to_type
         |)""".stripMargin
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |    LEAD(event_type) OVER (
       |      PARTITION BY user_id ORDER BY $duckTsS, event_id) AS next_type
       |  FROM events
       |), cnt AS (
       |  SELECT event_type AS from_type, next_type AS to_type,
       |    COUNT(*) AS n
       |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
       |), pm AS (
       |  SELECT from_type, to_type,
       |    CAST(n AS DOUBLE) /
       |      CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
       |        AS DOUBLE) AS p
       |  FROM cnt
       |), states AS (
       |  SELECT DISTINCT s FROM (
       |    SELECT from_type AS s FROM pm
       |    UNION ALL SELECT to_type FROM pm)
       |), pfull AS MATERIALIZED (
       |  SELECT from_type, to_type, p FROM pm
       |  UNION ALL
       |  SELECT s, s, 1.0::DOUBLE FROM states
       |  WHERE s NOT IN (SELECT DISTINCT from_type FROM pm)
       |), pi0 AS (
       |  SELECT s, 1.0::DOUBLE / (SELECT COUNT(*) FROM states) AS pi
       |  FROM states
       |),
       |${(1 to MarkovIters).map(step).mkString(",\n")}
       |SELECT s AS state, pi FROM pi$MarkovIters""".stripMargin
  }

  // ----------------------------------- #251 day-of-week uniformity

  /** χ² critical value at 6 degrees of freedom, α = 0.05 (fixed
    * literal, shipped identically to the oracle).
    */
  val Chi6Crit = 12.591587

  /** #251: DAY-OF-WEEK traffic uniformity — the χ² goodness-of-fit
    * test against the uniform week, per event type: the seasonality
    * PRE-TEST the forecast family assumes an answer to (#193's
    * seasonal-naive lag only helps if weekday structure EXISTS; this
    * op is the test that says so, with a decision gate instead of an
    * eyeballed histogram). The #219 Benford machinery pointed at the
    * calendar: observed counts per (type, dow), expected n/7, χ² =
    * Σ(o−e)²/e against the 6-dof critical value.
    *
    * Exactness: dow = epoch-day mod 7 (pure integers, no timezone or
    * locale — dow 0 is the epoch's weekday, documented); counts exact;
    * each χ² term one fixed IEEE tree over single divisions of exact
    * integers, quantized 1e-6, summed order-free over SEVEN terms;
    * the verdict an exact compare against the shipped literal.
    *
    * Plan: one scan collapsing map-side onto the (type, dow) keyspace
    * (35 cells), then dictionary algebra — shuffle bytes constant in
    * stream size.
    */
  def dowUniformity(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val cells = eventsS(spark, dir)
      .select(col("event_type"), expr("(ts_s DIV 86400) % 7").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val tot = cells.groupBy("event_type").agg(sum("o").as("n"))
    val term = Exact.roundS(
      (col("o").cast("double") - col("n").cast("double") / 7.0) *
        (col("o").cast("double") - col("n").cast("double") / 7.0) /
        (col("n").cast("double") / 7.0), 6)
    cells.join(tot, "event_type")
      .select(col("event_type"), col("n"), term.as("t"))
      .groupBy("event_type")
      .agg(max("n").as("n_events"), Exact.decSum(col("t"), 6).as("chi2"))
      .withColumn("seasonal", col("chi2") > Chi6Crit)
  }

  val dowUniformitySql: String = {
    import graft.core.Exact
    val term = Exact.duckRoundS(
      """(CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 7.0::DOUBLE)
        | * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 7.0::DOUBLE)
        | / (CAST(n AS DOUBLE) / 7.0::DOUBLE)""".stripMargin, 6)
    s"""WITH cells AS (
       |  SELECT event_type, ($duckTsS // 86400) % 7 AS dow, COUNT(*) AS o
       |  FROM events GROUP BY 1, 2
       |), tot AS (
       |  SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
       |  FROM cells GROUP BY 1
       |)
       |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       |  ${Exact.duckSum("t", 6)} AS chi2,
       |  ${Exact.duckSum("t", 6)} > CAST('$Chi6Crit' AS DOUBLE) AS seasonal
       |FROM (
       |  SELECT cells.event_type, n, $term AS t
       |  FROM cells JOIN tot USING (event_type))
       |GROUP BY event_type""".stripMargin
  }

  // --------------------------------------- #248 chain entropy rate

  /** #248: ENTROPY RATE of the user-journey chain — how PREDICTABLE
    * the next event is, the single number that grades a next-action
    * model's ceiling: H = Σ_i π_i · H_i where H_i = −Σ_j p_ij ln p_ij
    * is each state's exit entropy and π is #244's stationary weight —
    * the long-run bits-per-step of user behavior (Shannon; Cover &
    * Thomas ch. 4). A next-event recommender cannot beat 1/e^H
    * average likelihood; shipping one without this number is how
    * "the model barely beats marginal frequency" goes unnoticed.
    * Emits per-state exit entropy + weight + the one-row rate.
    *
    * Exactness: p_ij are #181's single divisions (bit-identical); each
    * −p·ln p term quantizes 1e-9 (ln the only transcendental) and
    * sums order-free on the scaled-integer grid per state; π is #244's
    * quantized power iteration verbatim; the rate is Σ of one
    * correctly-rounded product per state, quantized 1e-9, decSum'd —
    * all over the dictionary-sized state space.
    */
  def entropyRate(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val p = markovTransitions(spark, dir)
      .select("from_type", "to_type", "p")
    val hExit = p.groupBy("from_type")
      .agg(Exact.decSum(Exact.roundS(-(col("p") * log(col("p"))), 9), 9)
        .as("h_exit"))
    val pi = markovStationary(spark, dir)
      .select(col("state").as("from_type"), col("pi"))
    val rows = hExit.join(pi, "from_type")
    val rate = rows.agg(
      Exact.decSum(Exact.roundS(col("pi") * col("h_exit"), 9), 9)
        .as("entropy_rate"))
    rows.crossJoin(broadcast(rate))
      .select(col("from_type").as("state"), col("h_exit"), col("pi"),
        col("entropy_rate"))
  }

  val entropyRateSql: String = {
    import graft.core.Exact
    // the #244 chain, verbatim, then the entropy head
    val stationary = markovStationarySql
    s"""WITH pi_full AS MATERIALIZED (
       |  $stationary
       |), seq2 AS (
       |  SELECT user_id, event_type,
       |    LEAD(event_type) OVER (
       |      PARTITION BY user_id ORDER BY $duckTsS, event_id) AS next_type
       |  FROM events
       |), cnt2 AS (
       |  SELECT event_type AS from_type, next_type AS to_type,
       |    COUNT(*) AS n
       |  FROM seq2 WHERE next_type IS NOT NULL GROUP BY 1, 2
       |), pm2 AS (
       |  SELECT from_type, to_type,
       |    CAST(n AS DOUBLE) /
       |      CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
       |        AS DOUBLE) AS p
       |  FROM cnt2
       |), hx AS (
       |  SELECT from_type,
       |    ${Exact.duckSum(Exact.duckRoundS("-(p * ln(p))", 9), 9)}
       |      AS h_exit
       |  FROM pm2 GROUP BY from_type
       |), rows_ AS (
       |  SELECT hx.from_type AS state, hx.h_exit, pf.pi
       |  FROM hx JOIN pi_full pf ON pf.state = hx.from_type
       |), rate AS (
       |  SELECT ${Exact.duckSum(Exact.duckRoundS("pi * h_exit", 9), 9)}
       |    AS entropy_rate
       |  FROM rows_
       |)
       |SELECT state, h_exit, pi, entropy_rate FROM rows_, rate""".stripMargin
  }

  val interarrivalSql: String =
    s"""WITH g AS (
       |  SELECT event_type,
       |    ts_s - LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap
       |  FROM (SELECT event_id, user_id, event_type, $duckTsS AS ts_s FROM events)
       |), h AS (
       |  SELECT event_type, gap, COUNT(*) AS c FROM g
       |  WHERE gap IS NOT NULL GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type, gap, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY gap) AS cum,
       |    SUM(c) OVER (PARTITION BY event_type) AS n
       |  FROM h
       |)
       |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
       |  CAST(SUM(gap * c) AS DOUBLE) / CAST(MAX(n) AS BIGINT) AS mean_s,
       |  CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN gap END) AS BIGINT) AS p50_s,
       |  CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN gap END) AS BIGINT) AS p90_s,
       |  CAST(MAX(gap) AS BIGINT) AS max_s
       |FROM cum GROUP BY event_type""".stripMargin

  // ------------------------------------ #153 fact→SCD2-version attach

  /** #153: fact-to-dimension-version attribution — the CONSUMER of the
    * #147 SCD2 build: every fact row resolves to the dimension version
    * valid at its own event time, then rolls up per version (n_events,
    * the version's value, the last fact inside the interval). This is
    * the "join facts as-of their own time" step every SCD2 design
    * exists for — and the plan deliberately avoids the naive interval
    * join (fact ⋈ version ON eff_from ≤ ts < eff_to), which amplifies
    * rows and hands the optimizer a range predicate it can only
    * nested-loop or range-bucket.
    *
    * Plan: because versions open exactly at value-change events, ONE
    * user-partitioned window pass derives each fact's version: flag the
    * change rows (lag), then the running max of change timestamps IS
    * the covering version's eff_from (the #70 as-of trick applied to
    * interval attribution). The follow-up groupBy(user_id, eff_from_s)
    * needs NO second exchange — HashPartitioning(user_id) already
    * clusters every (user_id, eff_from_s) group, and Spark's
    * EnsureRequirements accepts the subset partitioning. One shuffle
    * total; windows bounded per user.
    */
  def scd2Attach(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsS(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"), col("value"))
      .withColumn("prev_v", lag("value", 1).over(byUser))
      .withColumn("eff_from_s",
        max(when(col("prev_v").isNull || col("value") =!= col("prev_v"),
          col("ts_s"))).over(run))
      .groupBy("user_id", "eff_from_s")
      .agg(min("value").as("value"), count(lit(1)).as("n_events"),
        max("ts_s").as("last_ts_s"))
  }

  val scd2AttachSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, $duckTsS AS ts_s, value FROM events
       |), w AS (
       |  SELECT user_id, event_id, ts_s, value,
       |    CASE WHEN LAG(value) OVER u IS NULL OR value <> LAG(value) OVER u
       |      THEN ts_s END AS chg_ts
       |  FROM ev WINDOW u AS (PARTITION BY user_id ORDER BY ts_s, event_id)
       |), v AS (
       |  SELECT user_id, ts_s, value,
       |    MAX(chg_ts) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
       |      ROWS UNBOUNDED PRECEDING) AS eff_from_s
       |  FROM w
       |)
       |SELECT user_id, eff_from_s, MIN(value) AS value,
       |  COUNT(*) AS n_events, MAX(ts_s) AS last_ts_s
       |FROM v GROUP BY user_id, eff_from_s""".stripMargin

  // ------------------------------------------------------ #193 forecast eval

  /** #193: seasonal-naive forecast BACKTEST — the capacity-planning
    * baseline report: forecast each (type, day) volume/value as the
    * value one season earlier (s = 7 days), score the forecast on every
    * day that has one (the standard walk-forward backtest), and report
    * per-type MAE plus the naive-vs-seasonal improvement ratio. The
    * seasonal-naive is THE benchmark every real forecaster must beat
    * (the M-competition yardstick) — publishing its backtest is the
    * first artifact of any forecasting effort, and the report's shape
    * (lag features + error aggregation) is exactly the feature pipeline
    * a learned forecaster trains on.
    *
    * Exactness: counts and scaled value sums are integers; the lags are
    * integer-exact LAG windows over the bounded daily frame keyed by
    * REAL day offsets (lag(7) by row would silently skip missing days
    * — a self-join on day−7 keeps calendar semantics); absolute errors
    * sum as integers and the two MAEs + ratio divide once at the end.
    *
    * Scale: events collapse map-side onto the bounded (type, day)
    * space; everything after is dictionary-small (day span × 5 types).
    */
  def forecastEval(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsS(spark, dir)
    val daily = e.select(col("event_type"),
        (col("ts_s") / 86400L).cast("long").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sv"))
    val lagged = daily.alias("cur").join(
      daily.select(col("event_type"), (col("day") + 7L).as("day"),
        col("n").as("n_s"), col("sv").as("sv_s")).alias("sea"),
      Seq("event_type", "day"))
      .join(daily.select(col("event_type"), (col("day") + 1L).as("day"),
        col("n").as("n_1"), col("sv").as("sv_1")).alias("nai"),
      Seq("event_type", "day"))
    lagged.groupBy("event_type")
      .agg(count(lit(1)).as("n_days_scored"),
        sum(abs(col("n") - col("n_s"))).as("ae_n_seasonal"),
        sum(abs(col("n") - col("n_1"))).as("ae_n_naive"),
        sum(abs(col("sv") - col("sv_s"))).as("ae_v_seasonal"))
      .select(col("event_type"), col("n_days_scored"),
        (col("ae_n_seasonal").cast("double") / col("n_days_scored"))
          .as("mae_count_seasonal"),
        (col("ae_n_naive").cast("double") / col("n_days_scored"))
          .as("mae_count_naive"),
        (col("ae_v_seasonal").cast("double") / col("n_days_scored") / 1e6)
          .as("mae_value_seasonal"),
        (col("ae_n_seasonal").cast("double") / col("ae_n_naive").cast("double"))
          .as("seasonal_vs_naive"))
  }

  val forecastEvalSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, $duckTsS // 86400 AS day, COUNT(*) AS n,
       |    SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS sv
       |  FROM events GROUP BY 1, 2
       |), j AS (
       |  SELECT cur.event_type, cur.n, cur.sv,
       |    sea.n AS n_s, sea.sv AS sv_s, nai.n AS n_1
       |  FROM daily cur
       |  JOIN daily sea ON sea.event_type = cur.event_type
       |    AND sea.day = cur.day - 7
       |  JOIN daily nai ON nai.event_type = cur.event_type
       |    AND nai.day = cur.day - 1
       |), a AS (
       |  SELECT event_type, COUNT(*) AS n_days_scored,
       |    CAST(SUM(abs(n - n_s)) AS BIGINT) AS ae_n_seasonal,
       |    CAST(SUM(abs(n - n_1)) AS BIGINT) AS ae_n_naive,
       |    CAST(SUM(abs(sv - sv_s)) AS BIGINT) AS ae_v_seasonal
       |  FROM j GROUP BY event_type
       |)
       |SELECT event_type, n_days_scored,
       |  CAST(ae_n_seasonal AS DOUBLE) / n_days_scored AS mae_count_seasonal,
       |  CAST(ae_n_naive AS DOUBLE) / n_days_scored AS mae_count_naive,
       |  CAST(ae_v_seasonal AS DOUBLE) / n_days_scored / 1000000.0 AS mae_value_seasonal,
       |  CAST(ae_n_seasonal AS DOUBLE) / CAST(ae_n_naive AS DOUBLE) AS seasonal_vs_naive
       |FROM a""".stripMargin

  // -------------------------------------------------------- #192 range join

  /** #192: RANGE JOIN by bucket decomposition — the interval-predicate
    * sibling of #70's as-of join (the two custom-join shapes the brief
    * names): match every event to the "incident windows" overlapping
    * its timestamp. A range predicate alone gives Spark NO equi-key, so
    * the naive plan is BroadcastNestedLoopJoin — O(rows·intervals),
    * the quadratic cliff every engine's range-join optimization exists
    * to avoid (Databricks RANGE_JOIN hints, DuckDB IEJoin). The
    * Spark-first rewrite decomposes each interval into the fixed-width
    * BUCKETS (calendar days) it covers and each probe row into the one
    * bucket containing it: the join becomes an EQUI-join on
    * (type, bucket) — hash-partitionable, AQE-skew-splittable — with
    * the exact range predicate kept as a residual filter. Fan-out =
    * interval span / bucket width (3 here), never data-scale.
    *
    * The interval set is DATA-DERIVED (each type's 5 busiest days,
    * deterministic tiebreak, widened to [day−12h, day+36h)) so the
    * operator is oracle-checkable without a fixture table; overlapping
    * windows legitimately double-match (range-join semantics).
    *
    * Scale: intervals here are dictionary-small (the exploded bucket
    * table broadcasts — zero fact-side shuffle); with a DATA-SCALE
    * interval table the SAME plan shuffles both sides on (type, bucket)
    * — which is the whole point of having an equi-key. Exactness:
    * bucket math and the residual compare are integer seconds; value
    * sums quantize through [[Exact.decSum]].
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = eventsS(spark, dir)
      .select(col("event_type"), col("ts_s"), col("value"),
        (col("ts_s") / 86400L).cast("long").as("bday"))
    val busiest = e.groupBy("event_type", "bday")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("n").desc, col("bday").asc)))
      .filter(col("rk") <= 5)
      .select(col("event_type"),
        (col("bday") * 86400L - 43200L).as("iv_start_s"),
        (col("bday") * 86400L + 129600L).as("iv_end_s"))
    // bucket decomposition: one row per calendar day the interval covers
    val ivBuckets = busiest.select(col("event_type"), col("iv_start_s"),
      col("iv_end_s"), explode(sequence(
        (col("iv_start_s") / 86400L).cast("long"),
        ((col("iv_end_s") - 1L) / 86400L).cast("long"))).as("bday"))
    e.join(broadcast(ivBuckets), Seq("event_type", "bday"))
      .filter(col("ts_s") >= col("iv_start_s") && col("ts_s") < col("iv_end_s"))
      .groupBy("event_type", "iv_start_s", "iv_end_s")
      .agg(count(lit(1)).as("n_events"), Exact.decSum(col("value")).as("v_sum"))
  }

  val rangeJoinSql: String =
    s"""WITH e AS (
       |  SELECT event_type, $duckTsS AS ts_s, value,
       |    $duckTsS // 86400 AS bday
       |  FROM events
       |), busiest AS (
       |  SELECT event_type,
       |    bday * 86400 - 43200 AS iv_start_s,
       |    bday * 86400 + 129600 AS iv_end_s
       |  FROM (
       |    SELECT event_type, bday, COUNT(*) AS n,
       |      ROW_NUMBER() OVER (PARTITION BY event_type
       |        ORDER BY COUNT(*) DESC, bday ASC) AS rk
       |    FROM e GROUP BY event_type, bday
       |  ) WHERE rk <= 5
       |)
       |SELECT e.event_type, iv_start_s, iv_end_s,
       |  COUNT(*) AS n_events, ${Exact.duckSum("value")} AS v_sum
       |FROM e JOIN busiest
       |  ON e.event_type = busiest.event_type
       |  AND e.ts_s >= iv_start_s AND e.ts_s < iv_end_s
       |GROUP BY e.event_type, iv_start_s, iv_end_s""".stripMargin

  // ------------------------------------------------------------- #187 CUSUM

  /** #187: CUSUM drift detection over the per-type daily value stream —
    * the SEQUENTIAL change detector next to #97's pointwise 3σ and
    * #166's robust MAD: a mean SHIFT that never produces a single
    * outlier (say +5% every day after a bad deploy) is invisible to
    * both, while its cumulative excess grows linearly and CUSUM flags
    * it after a few days (Page 1954 — the classic sequential test).
    *
    * The textbook recursion S_d = max(0, S_{d-1} + x_d − μ) is
    * sequential, but it has a closed WINDOW form: with P_d = Σ_{j≤d} r_j,
    * S_d = P_d − min(0, min_{j≤d} P_j) — a cumulative sum and a running
    * min over the same ordered frame, so the whole trajectory is two
    * stacked windows, no driver loop, no recursion.
    *
    * Exactness: daily sums are scaled longs (1e-6 grid); the residual
    * uses the SCALED-NUMERATOR trick r_d = sv_d·n_days − total_sv so
    * the mean subtraction is INTEGER (no division anywhere in the
    * trajectory); the alarm S_d > total_sv ("cumulative excess exceeds
    * one average day's volume" — h expressed in in-control-mean units,
    * the knob real CUSUM charts expose when σ is unstable) is an
    * integer comparison. Only the two report divisions produce doubles,
    * mirrored in literal order. Domain: |value|·1e6·n_daily·n_days
    * < 2^63 — per-type daily volume below ~9e12 value-units at any
    * realistic day span; raise the grid to 1e-4 past that.
    *
    * Scale: one map-side-combining groupBy onto the bounded
    * (type, day) key space — shuffle carries the daily frame, never
    * events; all four windows share ONE event_type partitioning
    * (single exchange), frames bounded by the day span.
    */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val daily = e
      .select(col("event_type"),
        expr(s"${tsNanos(e)} DIV $NsPerDay").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sv"))
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("total_sv", sum("sv").over(byType))
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("p", sum(col("sv") * col("n_days") - col("total_sv"))
        .over(ordered))
      .withColumn("s", col("p") - least(lit(0L), min("p").over(ordered)))
      .select(col("event_type"), col("day"), col("n_events"),
        (col("sv").cast("double") / 1e6).as("v_day"),
        (col("s").cast("double") / col("n_days") / 1e6).as("cusum"),
        (col("s") > col("total_sv")).as("alarm"))
  }

  val cusumSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // $NsPerDay AS day,
       |    COUNT(*) AS n_events,
       |    SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS sv
       |  FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT *,
       |    CAST(SUM(sv) OVER (PARTITION BY event_type) AS BIGINT) AS total_sv,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n_days
       |  FROM daily
       |), pp AS (
       |  SELECT *, CAST(SUM(sv * n_days - total_sv) OVER (
       |    PARTITION BY event_type ORDER BY day
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
       |  FROM t
       |), ss AS (
       |  SELECT *, p - LEAST(0, MIN(p) OVER (
       |    PARTITION BY event_type ORDER BY day
       |    ROWS UNBOUNDED PRECEDING)) AS s
       |  FROM pp
       |)
       |SELECT event_type, day, n_events,
       |  CAST(sv AS DOUBLE) / 1000000.0 AS v_day,
       |  CAST(s AS DOUBLE) / n_days / 1000000.0 AS cusum,
       |  s > total_sv AS alarm
       |FROM ss""".stripMargin

  // ------------------------------------------------------ #198 EWMA

  /** #198: exponentially weighted moving average (α = 1/2, 16-day
    * horizon) over the per-type daily value stream — the smoothing
    * primitive under every ops dashboard and the forecast family's
    * third member (#193 backtests a seasonal lag, #187 detects mean
    * shifts, EWMA is the level estimate both of them compare against).
    *
    * Two design points make it EXACT where textbook EWMA is not:
    *  - α = 1/2 makes every weight a POWER OF TWO — the 16-term
    *    truncated recursion becomes integer arithmetic: cent-scaled
    *    daily sums times `1L << (15-i)`, summed as longs, ONE division
    *    pair at the end. No compounding FP recursion, no
    *    partition-order sensitivity. (Bound: |sv|·2^15·16 must stay
    *    under 2^63 — cent-scaled daily sums hold to ~1.7e13 cents/day,
    *    i.e. ~1e6× this SF; past that drop the horizon or the scale.)
    *  - gaps self-normalize: each present day contributes weight
    *    2^(15-i) to day d+i, and the smoothed value divides by the sum
    *    of weights PRESENT — calendar-correct over missing days, where
    *    a row-offset recursion silently treats a gap as one step
    *    (#193's row-lag corruption, same fix: calendar joins).
    *
    * Plan shape: events collapse map-side onto the bounded (type, day)
    * space FIRST; the 16-offset fan-out then runs over the daily frame
    * (dictionary-small — shuffle carries days, never events), one
    * aggregate onto (type, day), one semi-join back to present days.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsS(spark, dir)
      .select(col("event_type"), (col("ts_s") / 86400L).cast("long").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sv"))
    val contrib = daily
      .select(col("event_type"), col("day"), col("sv"),
        explode(sequence(lit(0), lit(15))).as("i"))
      .select(col("event_type"), (col("day") + col("i")).as("day"),
        (col("sv") * expr("shiftleft(1L, 15 - i)")).as("wsv"),
        expr("shiftleft(1L, 15 - i)").as("w"))
      .groupBy("event_type", "day")
      .agg(sum("wsv").as("num"), sum("w").as("den"))
    daily.join(contrib, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        (col("sv").cast("double") / 100.0).as("day_value"),
        (col("num").cast("double") / col("den") / 100.0).as("ewma"))
  }

  /** #215: A/B-TEST readout — the experimentation-platform primitive
    * (deterministic hash assignment + two-proportion z-test), the
    * decision gate at the end of every product-analytics pipeline.
    * Users are assigned to variants by pHash('ab|'||user) % 2 — the
    * production assignment rule (stable, uniform, no assignment table
    * to store or shuffle), conversion = ≥1 purchase, and the readout
    * is the standard pooled two-proportion z-test with the industry
    * |z| > 1.96 significance gate.
    *
    * Exactness: counts are exact integers off ONE user-collapsed pass;
    * rates and the pooled rate are single divisions; the standard
    * error is a fixed literal IEEE tree (sqrt of correctly-rounded
    * products) and the z statistic quantizes on the 1e-6 grid before
    * the significance compare — engine-identical, no tolerance. The
    * honest expected finding on this synthetic stream: assignment is
    * orthogonal to behavior, so the test should NOT fire (the A/A-test
    * property every experimentation platform validates first); the
    * spec pins that.
    *
    * Scale: events collapse map-side onto users (the one shuffle);
    * the variant rollup is a 2-key aggregate; the test head is a
    * 1-row computation.
    */
  /** r10 (guide §5): the per-user (conv, variant) frame — #215 abTest
    * and #329 sequentialTest build it identically, and each used to
    * re-run the events-scale user aggregate for BOTH variant arms of
    * its 2-row pivot. Derived-tier cached; cold legs still pay.
    *
    * conversion = "purchase-heavy user" (purchase share > 1/5, as the
    * cross-multiplied integer compare): ≥1-purchase converts EVERYONE
    * on a long-running stream (se = 0, no test), share-of-activity has
    * real cross-user variance at every SF.
    */
  private val usersConvCache = new graft.core.DfCache[(SparkSession, String)]

  private def usersConv(spark: SparkSession, dir: String): DataFrame =
    usersConvCache.getOrElseUpdate((spark, dir)) {
      import graft.core.PortableHash
      eventsS(spark, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("ne"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
        .select(col("user_id"),
          when(col("np") * 5L > col("ne"), 1L).otherwise(0L).as("conv"))
        .withColumn("variant",
          when(PortableHash.pHash(concat(lit("ab|"), col("user_id"))) % 2 === 0,
            "A").otherwise("B"))
    }

  /** One-pass pivot of the 2×2 A/B cells — identical (n, c) per arm to
    * the old filter-per-variant + crossJoin whenever both variants
    * exist (guaranteed beyond a handful of users; re-proved vs the
    * oracle at both gate SFs).
    */
  private def abCells(users: DataFrame): DataFrame =
    users.agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "A", col("conv")).otherwise(0L)).as("c_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "B", col("conv")).otherwise(0L)).as("c_b"))

  def abTest(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val wide = abCells(usersConv(spark, dir))
    val pa = col("c_a").cast("double") / col("n_a")
    val pb = col("c_b").cast("double") / col("n_b")
    val pp = (col("c_a") + col("c_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt((pp * (lit(1.0) - pp)) *
      ((lit(1.0) / col("n_a")) + (lit(1.0) / col("n_b"))))
    wide.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        pa.as("rate_a"), pb.as("rate_b"),
        // degenerate guard: all-converted / none-converted ⇒ no test
        when(se > 0.0, Exact.roundS((pa - pb) / se, 6)).as("z"))
      // the normal approximation needs n ≥ 30 per arm (the textbook
      // rule): at sf0.001 (7 vs 8 users) the unguarded test FIRES on an
      // A/A split (z = 2.35, measured) — exactly the false alarm this
      // gate exists to suppress; properly powered SFs sit at |z| < 1.2
      .withColumn("powered", col("n_a") >= 30L && col("n_b") >= 30L)
      .withColumn("significant",
        col("powered") && coalesce(abs(col("z")) > 1.96, lit(false)))
  }

  val abTestSql: String = {
    import graft.core.{Exact, PortableHash}
    val h = PortableHash.duck("'ab|' || user_id")
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
       |      > COUNT(*) THEN 1 ELSE 0 END AS conv,
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id
       |), v AS (
       |  SELECT variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c
       |  FROM u GROUP BY variant
       |), w AS (
       |  SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
       |  FROM (SELECT n, c FROM v WHERE variant = 'A') a,
       |       (SELECT n, c FROM v WHERE variant = 'B') b
       |)
       |SELECT n_a, c_a, n_b, c_b,
       |  CAST(c_a AS DOUBLE) / n_a AS rate_a,
       |  CAST(c_b AS DOUBLE) / n_b AS rate_b,
       |  CASE WHEN $seSql > 0.0 THEN ${Exact.duckRoundS(zSql, 6)} END AS z,
       |  (n_a >= 30 AND n_b >= 30) AS powered,
       |  ((n_a >= 30 AND n_b >= 30) AND COALESCE(abs(CASE WHEN $seSql > 0.0
       |    THEN ${Exact.duckRoundS(zSql, 6)} END) > 1.96, false)) AS significant
       |FROM w""".stripMargin
  }

  /** Minimum detectable relative lift for the power analysis. */
  val PowerLiftPct = 10L
  val ZAlpha = 1.959964  // two-sided α = 0.05
  val ZBeta = 0.841621   // power = 0.80

  /** #217: POWER ANALYSIS — the planning half of the experimentation
    * pair (#215 reads out a finished test; this answers "how long must
    * the NEXT one run"): minimum users per arm to detect a
    * [[PowerLiftPct]]% relative lift over the observed baseline
    * conversion at α = 0.05 (two-sided), power 0.80 — the standard
    * two-proportion formula n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))²/δ².
    * Shipping an experiment without this number is how underpowered
    * tests like #215's sf0.001 arm (7 users, z = 2.35 on an A/A split)
    * get believed; the report also emits observed-n / required-n so the
    * powered verdict is explicit.
    *
    * Exactness: the baseline rate comes from the SAME user-collapsed
    * integer pass as #215 (single division); the formula is a fixed
    * literal IEEE tree over it (two sqrts, engine-identical), and the
    * required n quantizes through ceil to an exact integer, so the
    * whole report hash-matches with no tolerance. Scale: one user
    * collapse (the only shuffle), then 1-row algebra.
    */
  def powerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val base = eventsS(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("ne"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("np") * 5L > col("ne"), 1L).otherwise(0L)).as("c_obs"))
    val p1 = col("c_obs").cast("double") / col("n_obs")
    val p2 = p1 * (lit(1.0) + lit(PowerLiftPct.toDouble) / 100.0)
    val pbar = (p1 + p2) / 2.0
    val delta = p2 - p1
    val nReq = ceil(
      ((lit(ZAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar))) +
       (lit(ZBeta) * sqrt((p1 * (lit(1.0) - p1)) + (p2 * (lit(1.0) - p2))))) *
      ((lit(ZAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar))) +
       (lit(ZBeta) * sqrt((p1 * (lit(1.0) - p1)) + (p2 * (lit(1.0) - p2))))) /
      (delta * delta)).cast("long")
    base.select(col("n_obs"), col("c_obs"),
      p1.as("baseline_rate"), p2.as("target_rate"),
      nReq.as("n_required_per_arm"),
      (expr("n_obs div 2L") >= nReq).as("powered_today"))
  }

  val powerAnalysisSql: String = {
    val p1 = "(CAST(c_obs AS DOUBLE) / n_obs)"
    val p2 = s"($p1 * (1.0 + ${PowerLiftPct.toDouble} / 100.0))"
    val pbar = s"(($p1 + $p2) / 2.0)"
    val delta = s"($p2 - $p1)"
    val half =
      s"(($ZAlpha * sqrt(2.0 * $pbar * (1.0 - $pbar))) + " +
      s"($ZBeta * sqrt(($p1 * (1.0 - $p1)) + ($p2 * (1.0 - $p2)))))"
    s"""WITH u AS (
       |  SELECT user_id, COUNT(*) AS ne,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
       |  FROM events GROUP BY user_id
       |), b AS (
       |  SELECT COUNT(*) AS n_obs,
       |    CAST(SUM(CASE WHEN np * 5 > ne THEN 1 ELSE 0 END) AS BIGINT) AS c_obs
       |  FROM u
       |)
       |SELECT n_obs, c_obs, $p1 AS baseline_rate, $p2 AS target_rate,
       |  CAST(ceil($half * $half / ($delta * $delta)) AS BIGINT)
       |    AS n_required_per_arm,
       |  n_obs // 2 >= CAST(ceil($half * $half / ($delta * $delta)) AS BIGINT)
       |    AS powered_today
       |FROM b""".stripMargin
  }

  private def seSql: String =
    "sqrt(((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) * " +
      "(1.0 - (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)))) * " +
      "((1.0 / n_a) + (1.0 / n_b)))"

  private def zSql: String =
    s"((CAST(c_a AS DOUBLE) / n_a) - (CAST(c_b AS DOUBLE) / n_b)) / $seSql"

  /** #211: GROWTH ACCOUNTING (the new/retained/resurrected/churned
    * decomposition every DAU dashboard runs — the Social Capital
    * "accounting identity" report): classify each active (user, day)
    * as NEW (first day ever), RETAINED (also active the previous
    * calendar day) or RESURRECTED (active before, but not yesterday),
    * and count CHURNED on the day a previously-active user fails to
    * show. The output satisfies two ACCOUNTING IDENTITIES the spec
    * pins exactly: active = new + retained + resurrected (every active
    * day is exactly one class), and churned_d = active_{d-1} −
    * retained_d (yesterday's actives either retain or churn).
    *
    * Plan: events collapse map-side to distinct (user, day) FIRST —
    * everything downstream runs on the bounded activity frame, never
    * events. First-day is one user-keyed aggregate joined back (same
    * user_id partitioning); yesterday-presence is a CALENDAR self-join
    * on (user, day−1) — the #193 rule: row-offset lag silently treats
    * a gap as one step; churn is a left anti join of the day-shifted
    * frame against itself, bounded to the observed day span. All
    * integer — hash-exact with no quantization.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val act = userDay(spark, dir)
    val first = act.groupBy("user_id").agg(min("day").as("first_day"))
    val prev = act.select(col("user_id"), (col("day") + 1L).as("day"),
      lit(1L).as("was_active"))
    val classified = act.join(first, "user_id")
      .join(prev, Seq("user_id", "day"), "left")
      .select(col("day"),
        when(col("day") === col("first_day"), "new")
          .when(col("was_active").isNotNull, "retained")
          .otherwise("resurrected").as("cls"))
    val daily = classified.groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val maxDay = act.agg(max("day").as("max_day"))
    val churn = act.select(col("user_id"), (col("day") + 1L).as("day"))
      .join(act, Seq("user_id", "day"), "left_anti")
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_day"))
      .groupBy("day").agg(count(lit(1)).as("n_churned"))
    // full outer: a fully-dark day still owes its churn row
    daily.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  val growthAccountingSql: String =
    s"""WITH act AS (
       |  SELECT DISTINCT user_id, $duckTsS // 86400 AS day FROM events
       |), first AS (
       |  SELECT user_id, MIN(day) AS first_day FROM act GROUP BY user_id
       |), classified AS (
       |  SELECT a.day,
       |    CASE WHEN a.day = f.first_day THEN 'new'
       |         WHEN p.user_id IS NOT NULL THEN 'retained'
       |         ELSE 'resurrected' END AS cls
       |  FROM act a
       |  JOIN first f ON f.user_id = a.user_id
       |  LEFT JOIN act p ON p.user_id = a.user_id AND p.day = a.day - 1
       |), daily AS (
       |  SELECT day, COUNT(*) AS n_active,
       |    SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
       |    SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS n_retained,
       |    SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
       |  FROM classified GROUP BY day
       |), churn AS (
       |  SELECT a.day + 1 AS day, COUNT(*) AS n_churned
       |  FROM act a
       |  WHERE NOT EXISTS (SELECT 1 FROM act n
       |      WHERE n.user_id = a.user_id AND n.day = a.day + 1)
       |    AND a.day + 1 <= (SELECT MAX(day) FROM act)
       |  GROUP BY a.day + 1
       |)
       |SELECT COALESCE(daily.day, churn.day) AS day,
       |  COALESCE(n_active, 0) AS n_active,
       |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
       |  CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
       |  COALESCE(n_churned, 0) AS n_churned
       |FROM daily FULL OUTER JOIN churn ON churn.day = daily.day""".stripMargin

  /** Attribution window: touches within 7 days before the purchase. */
  val AttribWindowS: Long = 7L * 86400L

  /** #209: multi-touch marketing ATTRIBUTION — the revenue-credit
    * assignment every growth/ads pipeline runs: each purchase's value
    * is split LINEARLY across the view/click touches in the 7 days
    * before it (last-touch is #70's as-of join; linear is the
    * other standard model, and the one with an interesting exactness
    * problem). The classically-fractional credit v/n is made EXACT by
    * integer allocation — every touch gets cents DIV n and the LAST
    * touch (by ts, event_id — total order) absorbs the remainder, the
    * banker's-allocation rule real billing systems use — so the report
    * satisfies a conservation law TO THE CENT: attributed credit +
    * unattributed (no-touch purchases, kept as their own row) equals
    * total purchase value exactly. No FP division anywhere.
    *
    * Plan: purchases ⋈ touches on user_id (one shuffle each side,
    * fan-out bounded by per-user 7-day activity, never corpus-scale);
    * the per-purchase (rank, n) window repartitions onto the purchase
    * id; the channel rollup collapses onto 3 keys map-side. At 100 TB
    * the user join pre-filters to the horizon via the #192 bucket
    * decomposition. Unattributed purchases fall out of a left anti
    * join on the same keyed frame.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsS(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("ts_s").as("pts"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_uid"), col("event_id").as("tid"),
        col("event_type").as("channel"), col("ts_s").as("tts"))
    // r10 (guide §2.4): the orphan branch used to anti-join purchases
    // against a SECOND execution of the purchase×touch join. One LEFT
    // join carries orphans as null-channel rows through the same
    // window pass: an orphan is its own 1-row pid partition, so its
    // credit is cents div 1 + cents % 1 = cents — exactly the old
    // full-cents orphan credit — and it groups under 'unattributed'.
    // A null-keyed sentinel purchase keeps the 'unattributed' row
    // present when no orphans exist ((0, NULL), matching the old
    // aggregate-over-empty row): its pid is NULL so count(pid) skips
    // it, and its NULL cents vanish from the sum. Real touch rows all
    // carry a pid, so count(pid) ≡ the old count(*) per channel.
    val sentinel = p.sparkSession.range(1).select(
      lit(null).cast("long").as("user_id"), lit(null).cast("long").as("pid"),
      lit(null).cast("long").as("pts"), lit(null).cast("long").as("cents"))
    val m = p.unionByName(sentinel).join(t,
      col("user_id") === col("t_uid") && col("tts") < col("pts") &&
        col("tts") >= col("pts") - AttribWindowS, "left")
    val w = Window.partitionBy("pid")
    m.withColumn("rnk", row_number().over(
        w.orderBy(col("tts").asc, col("tid").asc)))
      .withColumn("n", count(lit(1)).over(w))
      .select(coalesce(col("channel"), lit("unattributed")).as("channel"),
        col("pid"),
        (expr("cents div n") +
          when(col("rnk") === col("n"), col("cents") % col("n"))
            .otherwise(lit(0L))).as("credit"))
      .groupBy("channel")
      .agg(count(col("pid")).as("n_touches"),
        (sum("credit").cast("double") / 100.0).as("credited_value"))
  }

  val attributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value, $duckTsS AS ts_s
       |  FROM events
       |), p AS (
       |  SELECT user_id, event_id AS pid, ts_s AS pts,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM e WHERE event_type = 'purchase'
       |), t AS (
       |  SELECT user_id, event_id AS tid, event_type AS channel, ts_s AS tts
       |  FROM e WHERE event_type IN ('view', 'click')
       |), m AS (
       |  SELECT p.pid, p.cents, t.channel, t.tid,
       |    ROW_NUMBER() OVER (PARTITION BY p.pid
       |      ORDER BY t.tts ASC, t.tid ASC) AS rnk,
       |    COUNT(*) OVER (PARTITION BY p.pid) AS n
       |  FROM p JOIN t ON t.user_id = p.user_id
       |    AND t.tts < p.pts AND t.tts >= p.pts - $AttribWindowS
       |)
       |SELECT channel, COUNT(*) AS n_touches,
       |  CAST(SUM(cents // n
       |    + CASE WHEN rnk = n THEN cents % n ELSE 0 END) AS DOUBLE) / 100.0
       |    AS credited_value
       |FROM m GROUP BY channel
       |UNION ALL
       |SELECT 'unattributed', COUNT(*),
       |  CAST(SUM(cents) AS DOUBLE) / 100.0
       |FROM p WHERE pid NOT IN (SELECT pid FROM m)""".stripMargin

  val ewmaSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, $duckTsS // 86400 AS day, COUNT(*) AS n,
       |    SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS sv
       |  FROM events GROUP BY 1, 2
       |), contrib AS (
       |  SELECT d.event_type, d.day + i AS day,
       |    d.sv * (1::BIGINT << (15 - i)) AS wsv,
       |    (1::BIGINT << (15 - i)) AS w
       |  FROM daily d, range(0, 16) r(i)
       |), e AS (
       |  SELECT event_type, day, SUM(wsv) AS num, SUM(w) AS den
       |  FROM contrib GROUP BY 1, 2
       |)
       |SELECT t.event_type, t.day, t.n AS n_events,
       |  CAST(t.sv AS DOUBLE) / 100.0 AS day_value,
       |  CAST(num AS DOUBLE) / den / 100.0 AS ewma
       |FROM daily t JOIN e ON e.event_type = t.event_type AND e.day = t.day""".stripMargin

  // ------------------------------------ #221 Kaplan–Meier survival

  /** #221: the Kaplan–Meier survival curve of the REPURCHASE interval —
    * time from each purchase to the same user's next purchase, with the
    * last (still-open) interval per user RIGHT-CENSORED at the corpus
    * end. The censoring-aware statistic product analytics needs where
    * #142's inter-arrival histogram silently drops the open intervals:
    * the naive "mean time between purchases" averages only CLOSED
    * intervals, which biases short exactly when long gaps are still
    * open at the observation edge, and KM is the standard fix — the
    * open interval stays in the risk set until its censoring hour, then
    * leaves without contributing a death. S(t) = Π_{s ≤ t}
    * (1 − d_s/n_s) over hour-binned interval lengths s, censored
    * subjects at risk through their censoring hour (deaths-before-
    * censors, the textbook convention).
    *
    * Exactness: interval hours, deaths, censors and risk sets are
    * exact integers off one partitioned lead(); the survival product
    * is the house ordered-fold — the per-hour (d, c) table collapses
    * to a single sorted list (bounded by the observation span in
    * hours, not by purchases) and each row's S(t) is a left fold
    * carrying (at-risk, survival) state whose per-step ops (one
    * division, one subtraction, one multiplication) form the identical
    * IEEE sequence in Spark `aggregate` and DuckDB `list_reduce` —
    * bit-identical with NO quantization, proving the fold discipline
    * end-to-end.
    *
    * Scale: one user-partitioned window (the lead), one map-side-
    * combining aggregate onto ≤ span-hours keys, then dictionary-sized
    * list algebra (T² fold work, T ≤ hours in the window). Nothing
    * else moves. Emits (t_hours, n_risk, n_death, n_censored,
    * survival).
    */
  def survival(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val p = eventsS(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s"), col("event_id"))
      .withColumn("next_ts", lead("ts_s", 1).over(byUser))
    val g = eventsS(spark, dir).agg(max("ts_s").as("gmax"))
    val byT = p.crossJoin(broadcast(g))
      .select(
        when(col("next_ts").isNotNull,
          (col("next_ts") - col("ts_s")) / 3600L)
          .otherwise((col("gmax") - col("ts_s")) / 3600L)
          .cast("long").as("t"),
        when(col("next_ts").isNotNull, 1L).otherwise(0L).as("death"))
      .groupBy("t")
      .agg(sum("death").as("d"), sum(lit(1L) - col("death")).as("c"))
    val one = byT.agg(
      sort_array(collect_list(struct(col("t"), col("d"), col("c"))))
        .as("lst"),
      sum(col("d") + col("c")).as("n0"))
    one.select(col("n0"), col("lst"),
        posexplode(col("lst")).as(Seq("i", "e")))
      .select(col("e.t").as("t_hours"),
        (col("n0") - aggregate(slice(col("lst"), lit(1), col("i")), lit(0L),
          (a, x) => a + x.getField("d") + x.getField("c"))).as("n_risk"),
        col("e.d").as("n_death"), col("e.c").as("n_censored"),
        aggregate(slice(col("lst"), lit(1), col("i") + 1),
          struct(col("n0").as("rem"), lit(1.0).as("surv")),
          (a, x) => struct(
            (a.getField("rem") - x.getField("d") - x.getField("c"))
              .as("rem"),
            (a.getField("surv") *
              (lit(1.0) - x.getField("d") / a.getField("rem")))
              .as("surv")),
          a => a.getField("surv")).as("survival"))
  }

  val survivalSql: String =
    s"""WITH p AS (
       |  SELECT user_id, ts_s,
       |    lead(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
       |      AS next_ts
       |  FROM (SELECT user_id, event_id, $duckTsS AS ts_s FROM events
       |        WHERE event_type = 'purchase')
       |), g AS (
       |  SELECT MAX($duckTsS) AS gmax FROM events
       |), byt AS (
       |  SELECT CASE WHEN next_ts IS NOT NULL
       |      THEN (next_ts - ts_s) // 3600
       |      ELSE (gmax - ts_s) // 3600 END AS t,
       |    CAST(SUM(CASE WHEN next_ts IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(SUM(CASE WHEN next_ts IS NOT NULL
       |      THEN 0 ELSE 1 END) AS BIGINT) AS c
       |  FROM p, g GROUP BY 1
       |), one AS (
       |  SELECT list(struct_pack(t := t, d := d, c := c) ORDER BY t) AS lst,
       |    CAST(SUM(d + c) AS BIGINT) AS n0
       |  FROM byt
       |), ex AS (
       |  SELECT n0, lst, unnest(lst) AS e, generate_subscripts(lst, 1) AS i
       |  FROM one
       |)
       |SELECT e.t AS t_hours,
       |  n0 - COALESCE(CAST(list_sum(list_transform(lst[1:i-1],
       |    x -> x.d + x.c)) AS BIGINT), 0) AS n_risk,
       |  e.d AS n_death, e.c AS n_censored,
       |  -- field order is LOAD-BEARING: DuckDB's list_reduce evaluates
       |  -- struct_pack fields sequentially, updating the accumulator in
       |  -- place, so surv must be listed BEFORE rem to read the pre-step
       |  -- risk set (probed on 1.0.0; Spark reads the old struct either
       |  -- way, so this order is the one both engines agree on)
       |  list_reduce(
       |    list_prepend(
       |      struct_pack(d := CAST(0 AS BIGINT), c := CAST(0 AS BIGINT),
       |        surv := CAST('1.0' AS DOUBLE), rem := n0),
       |      list_transform(lst[1:i],
       |        x -> struct_pack(d := x.d, c := x.c,
       |          surv := CAST('0.0' AS DOUBLE), rem := CAST(0 AS BIGINT)))),
       |    (a, x) -> struct_pack(d := CAST(0 AS BIGINT),
       |      c := CAST(0 AS BIGINT),
       |      surv := a.surv * (1 - CAST(x.d AS DOUBLE) / a.rem),
       |      rem := a.rem - x.d - x.c)).surv
       |    AS survival
       |FROM ex""".stripMargin

  // -------------------------------------------- #254 bounce / landing

  /** #254: BOUNCE-RATE landing report — per session ENTRY event type:
    * how many sessions start there, how many BOUNCE (one-event
    * sessions — the canonical engagement-failure metric), and the mean
    * session depth. The landing-page quality table web analytics leads
    * with, here keyed by the entry event type; reads next to #240's
    * paths (paths say where sessions GO, bounce says whether they go
    * ANYWHERE).
    *
    * Exactness: sessions are #5's integer gap rule verbatim; the
    * entry type is the rank-1 row of the same (ts, event_id) total
    * order; bounce and depth are exact integers; the two ratios are
    * single divisions. Scale: the session windows share the ONE
    * user_id partitioning; the rollup collapses map-side onto the
    * event-type keyspace.
    */
  def bounce(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val sess = eventsS(spark, dir)
      .withColumn("prev_ts", lag("ts_s", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull || col("ts_s") - col("prev_ts") > GapS)
          .cast("int"))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySess = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts_s", "event_id")
    sess.withColumn("rn", row_number().over(bySess))
      .groupBy("user_id", "session_seq")
      .agg(min(when(col("rn") === 1, col("event_type"))).as("entry_type"),
        count(lit(1)).as("depth"))
      .groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("depth") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum("depth").as("total_depth"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounce"),
        (col("n_bounce").cast("double") / col("n_sessions").cast("double"))
          .as("bounce_rate"),
        (col("total_depth").cast("double") / col("n_sessions").cast("double"))
          .as("mean_depth"))
  }

  val bounceSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, $duckTsS AS ts_s FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_s - prev_ts > $GapS
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM (SELECT *, LAG(ts_s) OVER w AS prev_ts FROM e
       |        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
       |), numbered AS (
       |  SELECT *, CAST(SUM(new_session) OVER
       |    (PARTITION BY user_id ORDER BY ts_s, event_id) AS BIGINT)
       |    AS session_seq
       |  FROM flagged
       |), sess AS (
       |  SELECT user_id, session_seq,
       |    MIN(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
       |    COUNT(*) AS depth
       |  FROM (SELECT *, ROW_NUMBER() OVER
       |      (PARTITION BY user_id, session_seq ORDER BY ts_s, event_id)
       |      AS rn
       |    FROM numbered)
       |  GROUP BY 1, 2
       |)
       |SELECT entry_type, COUNT(*) AS n_sessions,
       |  CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bounce,
       |  CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
       |  CAST(SUM(depth) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    AS mean_depth
       |FROM sess GROUP BY entry_type""".stripMargin

  // ---------------------------------------------- #240 top session paths

  /** Leading events per session that define its path. */
  val PathLen = 3
  /** Paths reported. */
  val PathTopN = 20

  /** #240: top SESSION PATHS — the "how do sessions start" journey
    * report product analytics reads next to the funnel: the funnel
    * (#89) checks ONE hypothesized order; the path table enumerates
    * the orders users actually take, as the first [[PathLen]] event
    * types of every session joined into a path string, counted and
    * shared over all sessions. The standard Sankey-diagram input.
    *
    * Exactness: session assignment is #5's integer gap rule verbatim
    * (same windows, same tie rule); the leading slice is a row_number
    * filter; the path string is an order-pinned join of the (rank,
    * type) list; counts are integers, the share one division; top-N
    * by (n DESC, path) is a total order.
    *
    * Scale: the two user-keyed windows share ONE user_id partitioning
    * (the sessionize argument); the path rollup collapses map-side
    * onto the bounded path keyspace (|event types|^[[PathLen]]); the
    * session total is a 1-row broadcast.
    */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val sess = eventsS(spark, dir)
      .withColumn("prev_ts", lag("ts_s", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull || col("ts_s") - col("prev_ts") > GapS)
          .cast("int"))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySess = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts_s", "event_id")
    val paths = sess
      .withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= PathLen)
      .groupBy("user_id", "session_seq")
      .agg(sort_array(collect_list(struct(col("rn"), col("event_type"))))
        .as("pe"))
      .select(concat_ws(">", expr("transform(pe, x -> x.event_type)"))
        .as("path"))
    val tot = paths.agg(count(lit(1)).as("n_sessions"))
    paths.groupBy("path").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("path"), col("n"),
        (col("n").cast("double") / col("n_sessions").cast("double"))
          .as("share"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopN)
  }

  val topPathsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, $duckTsS AS ts_s FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_s - prev_ts > $GapS
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM (SELECT *, LAG(ts_s) OVER w AS prev_ts FROM e
       |        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
       |), numbered AS (
       |  SELECT *, CAST(SUM(new_session) OVER
       |    (PARTITION BY user_id ORDER BY ts_s, event_id) AS BIGINT)
       |    AS session_seq
       |  FROM flagged
       |), sliced AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER
       |      (PARTITION BY user_id, session_seq ORDER BY ts_s, event_id)
       |      AS rn
       |    FROM numbered)
       |  WHERE rn <= $PathLen
       |), paths AS (
       |  SELECT array_to_string(list(event_type ORDER BY rn), '>') AS path
       |  FROM sliced GROUP BY user_id, session_seq
       |), tot AS (SELECT COUNT(*) AS n_sessions FROM paths)
       |SELECT path, COUNT(*) AS n,
       |  CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_sessions) AS DOUBLE) AS share
       |FROM paths, tot
       |GROUP BY path
       |ORDER BY n DESC, path LIMIT $PathTopN""".stripMargin

  // -------------------------------------------- #233 Holt linear trend

  /** #233: HOLT'S LINEAR TREND method (double exponential smoothing,
    * Holt 1957) over the per-type daily value stream — the fourth
    * forecast-family member and the one with STATE the others lack:
    * #198's EWMA tracks a level only, so it lags every ramp; Holt
    * carries (level, trend) and extrapolates, which is what a capacity
    * planner actually wants from a daily revenue series. α = β = 1/2
    * keeps every smoothing weight a power of two (the #198 argument),
    * so each step is halvings (exponent shifts, never rounding) plus
    * correctly-rounded adds/subs in a FIXED sequential order — the
    * house ordered-fold discipline: the per-type daily table collapses
    * to ONE sorted dictionary-sized list, and the recursion
    * l_t = ½y_t + ½(l+b), b_t = ½(l_t−l) + ½b (init l₁=y₁, b₁=y₂−y₁,
    * Hyndman's convention) runs as a left fold whose IEEE sequence is
    * identical in Spark `aggregate` and the oracle's RECURSIVE-CTE row
    * recursion (NOT list_reduce — see [[holtSql]]: DuckDB 1.0.0's
    * struct-accumulator lambda was probed mixing pure and in-place
    * field semantics ACROSS STEPS of one fold, unusable for mutually-
    * recursive state). The trend update duplicates the new-level
    * expression textually on both sides, so the engines evaluate the
    * identical pure expression tree on identical inputs.
    * The recursion steps over OBSERVED days (gap handling documented:
    * #198 owns calendar normalization; Holt here is the trend member).
    *
    * Plan: one map-side-combining collapse onto the bounded
    * (type, day) space, one 5-key list aggregate, then per-type
    * dictionary-sized algebra. Emits level/trend/7-step-ahead forecast
    * in dollars (three mirrored single divisions).
    */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsS(spark, dir)
      .select(col("event_type"), expr("ts_s DIV 86400").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sv"))
    val one = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("sv"))))
        .as("lst"), count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
    val folded = one.withColumn("st",
      aggregate(
        expr("slice(lst, 2, size(lst) - 1)"),
        struct(
          element_at(col("lst"), 1).getField("sv").cast("double").as("l"),
          (element_at(col("lst"), 2).getField("sv").cast("double") -
            element_at(col("lst"), 1).getField("sv").cast("double"))
            .as("b")),
        (a, x) => {
          def lNew = lit(0.5) * x.getField("sv").cast("double") +
            lit(0.5) * (a.getField("l") + a.getField("b"))
          struct(
            lNew.as("l"),
            (lit(0.5) * (lNew - a.getField("l")) +
              lit(0.5) * a.getField("b")).as("b"))
        }))
    folded.select(col("event_type"), col("n_days"),
      element_at(col("lst"), -1).getField("day").as("last_day"),
      (col("st.l") / 100.0).as("level"),
      (col("st.b") / 100.0).as("trend"),
      ((col("st.l") + lit(7.0) * col("st.b")) / 100.0).as("forecast_7d"))
  }

  // The oracle iterates the recursion as a RECURSIVE CTE, not
  // list_reduce: DuckDB 1.0.0's list_reduce over multi-field struct
  // accumulators was probed to mix pure and in-place field semantics
  // ACROSS STEPS of the same fold (step 1 pure, step 2 sequential on a
  // 3-element probe) — unusable for a mutually-recursive (level, trend)
  // state. Plain SQL row-to-row recursion has guaranteed pure
  // semantics; the new-level expression is duplicated textually in the
  // trend update, exactly the Spark lambda's expression tree.
  val holtSql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, $duckTsS // 86400 AS day,
       |    CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS sv
       |  FROM events GROUP BY 1, 2
       |), dd AS (
       |  SELECT event_type, CAST(sv AS DOUBLE) AS y,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
       |    MAX(day) OVER (PARTITION BY event_type) AS last_day
       |  FROM daily
       |), rec AS (
       |  SELECT event_type, n_days, last_day, CAST(1 AS BIGINT) AS rn,
       |    y AS l,
       |    (SELECT d2.y FROM dd d2
       |     WHERE d2.event_type = dd.event_type AND d2.rn = 2) - y AS b
       |  FROM dd WHERE rn = 1 AND n_days >= 2
       |  UNION ALL
       |  SELECT r.event_type, r.n_days, r.last_day, r.rn + 1,
       |    0.5::DOUBLE * d.y + 0.5::DOUBLE * (r.l + r.b) AS l,
       |    0.5::DOUBLE * ((0.5::DOUBLE * d.y + 0.5::DOUBLE * (r.l + r.b))
       |      - r.l) + 0.5::DOUBLE * r.b AS b
       |  FROM rec r JOIN dd d
       |    ON d.event_type = r.event_type AND d.rn = r.rn + 1
       |)
       |SELECT event_type, n_days, last_day,
       |  l / 100.0::DOUBLE AS level, b / 100.0::DOUBLE AS trend,
       |  (l + 7.0::DOUBLE * b) / 100.0::DOUBLE AS forecast_7d
       |FROM rec WHERE rn = n_days""".stripMargin

  // ------------------------------------------- #226 DAU/WAU/MAU ratio

  /** #226: engagement STICKINESS — the DAU/WAU/MAU report and the
    * DAU/MAU ratio (the "how many of your monthlies come daily" number
    * every consumer-product dashboard leads with): per calendar day,
    * distinct users active that day (DAU), within the trailing 7 days
    * (WAU) and the trailing 28 days (MAU). #211's growth accounting
    * explains day-over-day FLOWS; stickiness is the standing-stock
    * ratio those flows produce — both read off the same activity frame.
    *
    * The exact trailing-window-distinct trick: fan each distinct
    * (user, day) out to the 28 report days it supports (a bounded ×28
    * map-side generate on the ALREADY-COLLAPSED activity frame — never
    * on events), then ONE (user, report-day) aggregate keeping the MIN
    * offset; dau = [min_off = 0], wau = [min_off < 7], mau = any row.
    * All three windows fall out of one shuffle, exactly — no sketch,
    * no 28 self-joins. Report days clamp to the corpus day span
    * (broadcast 1-row bounds); `full_window` marks days with a
    * complete 28-day lookback so partial-window rows are labeled, not
    * silently mixed. Integer throughout; the ratio is one division.
    *
    * Scale: shuffle bytes are 28× the activity frame (user-days), a
    * constant multiplier of a frame already far smaller than events;
    * both aggregates are map-side-combining; the day rollup is
    * bounded by the calendar.
    */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val act = userDay(spark, dir)
    val bounds = act.agg(min("day").as("d0"), max("day").as("d1"))
    val perUserDay = act.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("d0"), col("d1"),
        explode(sequence(lit(0L), lit(27L))).as("off"),
        col("day").as("aday"))
      .select(col("user_id"), col("d0"), col("d1"), col("off"),
        (col("aday") + col("off")).as("day"))
      .filter(col("day") <= col("d1"))
      .groupBy("user_id", "day")
      .agg(min("off").as("min_off"), first("d0").as("d0"))
    perUserDay.groupBy("day")
      .agg(
        sum(when(col("min_off") === 0L, 1L).otherwise(0L)).as("dau"),
        sum(when(col("min_off") < 7L, 1L).otherwise(0L)).as("wau"),
        count(lit(1)).as("mau"),
        first("d0").as("d0"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        (col("dau").cast("double") / col("mau")).as("stickiness"),
        (col("day") >= col("d0") + 27L).as("full_window"))
  }

  val stickinessSql: String =
    s"""WITH act AS (
       |  SELECT DISTINCT user_id, $duckTsS // 86400 AS day FROM events
       |), bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM act),
       |pud AS (
       |  SELECT user_id, day + off AS day, MIN(off) AS min_off,
       |    MIN(d0) AS d0
       |  FROM act, bounds,
       |    (SELECT unnest(range(0, 28)) AS off)
       |  WHERE day + off <= d1
       |  GROUP BY user_id, day + off
       |)
       |SELECT day,
       |  CAST(SUM(CASE WHEN min_off = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dau,
       |  CAST(SUM(CASE WHEN min_off < 7 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS wau,
       |  COUNT(*) AS mau,
       |  CAST(SUM(CASE WHEN min_off = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS stickiness,
       |  MIN(day) >= MIN(d0) + 27 AS full_window
       |FROM pud GROUP BY day""".stripMargin

  // ------------------------------------------------------- #224 RFM

  /** #224: RFM customer segmentation (Hughes 1994; the recency/
    * frequency/monetary quintile scoring behind most CRM targeting) —
    * the per-user SERVING table the analytics block was missing: the
    * survival/retention/growth reports describe the population, RFM
    * assigns each user an actionable score triple and a named segment.
    *
    * Exactness: the three metrics are integers off ONE user-collapsed
    * pass over purchases (recency in whole days behind the corpus max,
    * frequency a count, monetary an exact micro-grid sum). Quintile
    * cuts use the #108 nearest-rank histogram method per metric —
    * NEVER ntile, whose tie behavior is engine-defined: build the
    * (metric, value) histogram, cumulative-sum it, cut_k = min value
    * with cum ≥ ⌈n·k/5⌉ (integer ceil as (n·k+4) DIV 5), then score
    * map-side as 1 + Σ[v > cut] (recency inverted: 1 + Σ[v < cut], so
    * 5 is always "best"). Ties share a score by construction — the
    * property ntile cannot give — and every comparison is integer.
    * The monetary CUT metric is whole-dollar spend (micro DIV 1e6):
    * cents never move a quintile, and it bounds the histogram keyspace
    * by the spend range in dollars rather than the user count — the
    * same boundedness argument as #108's value grid. Segments are the
    * standard (r, f) grid read in one engine-order-stable CASE.
    *
    * Scale: one data-scale shuffle (the user collapse); the cum
    * windows run per metric over BOUNDED histograms (day span /
    * max basket count / dollar range); the 12 cuts collapse to one
    * broadcast row and scoring is map-side. Nothing user-scale moves
    * for a quintile decision.
    */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val p = eventsS(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("vm"))
    val g = p.agg(max("ts_s").as("gmax"))
    val u = p.groupBy("user_id")
      .agg(max("ts_s").as("last_s"), count(lit(1)).as("freq"),
        sum("vm").as("m_micro"))
      .crossJoin(broadcast(g))
      .select(col("user_id"),
        expr("(gmax - last_s) DIV 86400").as("r_days"),
        col("freq"), col("m_micro"),
        expr("m_micro DIV 1000000").as("m_usd"))
    val hist = u.select(lit("r").as("metric"), col("r_days").as("v"))
      .unionByName(u.select(lit("f").as("metric"), col("freq").as("v")))
      .unionByName(u.select(lit("m").as("metric"), col("m_usd").as("v")))
      .groupBy("metric", "v").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("metric").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("metric")
    def cut(k: Int) =
      min(when(col("cum") >= expr(s"(n * $k + 4) DIV 5"), col("v")))
        .as(s"c$k")
    val cuts = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("metric").agg(cut(1), cut(2), cut(3), cut(4))
    def pick(m: String, k: Int) =
      max(when(col("metric") === m, col(s"c$k"))).as(s"$m$k")
    val row = cuts.agg(pick("r", 1), pick("r", 2), pick("r", 3),
      pick("r", 4), pick("f", 1), pick("f", 2), pick("f", 3), pick("f", 4),
      pick("m", 1), pick("m", 2), pick("m", 3), pick("m", 4))
    def scoreUp(v: String, m: String) =
      (lit(1) + (col(v) > col(s"${m}1")).cast("int") +
        (col(v) > col(s"${m}2")).cast("int") +
        (col(v) > col(s"${m}3")).cast("int") +
        (col(v) > col(s"${m}4")).cast("int")).as(s"score_$m")
    u.crossJoin(broadcast(row))
      .select(col("user_id"), col("r_days"), col("freq"), col("m_micro"),
        (lit(1) + (col("r_days") < col("r1")).cast("int") +
          (col("r_days") < col("r2")).cast("int") +
          (col("r_days") < col("r3")).cast("int") +
          (col("r_days") < col("r4")).cast("int")).as("score_r"),
        scoreUp("freq", "f"), scoreUp("m_usd", "m"))
      .withColumn("segment",
        when(col("score_r") >= 4 && col("score_f") >= 4, "champion")
          .when(col("score_f") >= 4, "loyal")
          .when(col("score_r") >= 4 && col("score_f") <= 2, "new")
          .when(col("score_r") <= 2 && col("score_f") >= 3, "at_risk")
          .when(col("score_r") <= 2, "hibernating")
          .otherwise("regular"))
  }

  val rfmSql: String = {
    def cut(k: Int) =
      s"MIN(CASE WHEN cum >= (n * $k + 4) // 5 THEN v END) AS c$k"
    def pick(m: String, k: Int) =
      s"MAX(CASE WHEN metric = '$m' THEN c$k END) AS $m$k"
    def scoreUp(v: String, m: String) =
      s"""CAST(1 + (CASE WHEN $v > ${m}1 THEN 1 ELSE 0 END)
         |      + (CASE WHEN $v > ${m}2 THEN 1 ELSE 0 END)
         |      + (CASE WHEN $v > ${m}3 THEN 1 ELSE 0 END)
         |      + (CASE WHEN $v > ${m}4 THEN 1 ELSE 0 END) AS INT)
         |    AS score_$m""".stripMargin
    s"""WITH p AS (
       |  SELECT user_id, $duckTsS AS ts_s,
       |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vm
       |  FROM events WHERE event_type = 'purchase'
       |), g AS (SELECT MAX(ts_s) AS gmax FROM p),
       |u AS (
       |  SELECT user_id,
       |    (MAX(g.gmax) - MAX(ts_s)) // 86400 AS r_days,
       |    COUNT(*) AS freq,
       |    CAST(SUM(vm) AS BIGINT) AS m_micro,
       |    CAST(SUM(vm) AS BIGINT) // 1000000 AS m_usd
       |  FROM p, g GROUP BY user_id
       |), h AS (
       |  SELECT metric, v, COUNT(*) AS c FROM (
       |    SELECT 'r' AS metric, r_days AS v FROM u
       |    UNION ALL SELECT 'f', freq FROM u
       |    UNION ALL SELECT 'm', m_usd FROM u
       |  ) GROUP BY 1, 2
       |), cum AS (
       |  SELECT metric, v,
       |    SUM(c) OVER (PARTITION BY metric ORDER BY v) AS cum,
       |    SUM(c) OVER (PARTITION BY metric) AS n
       |  FROM h
       |), cuts AS (
       |  SELECT metric, ${cut(1)}, ${cut(2)}, ${cut(3)}, ${cut(4)}
       |  FROM cum GROUP BY metric
       |), cr AS (
       |  SELECT ${(for (m <- Seq("r", "f", "m"); k <- 1 to 4)
                     yield pick(m, k)).mkString(", ")}
       |  FROM cuts
       |)
       |SELECT user_id, r_days, freq, m_micro,
       |  CAST(1 + (CASE WHEN r_days < r1 THEN 1 ELSE 0 END)
       |         + (CASE WHEN r_days < r2 THEN 1 ELSE 0 END)
       |         + (CASE WHEN r_days < r3 THEN 1 ELSE 0 END)
       |         + (CASE WHEN r_days < r4 THEN 1 ELSE 0 END) AS INT)
       |    AS score_r,
       |  ${scoreUp("freq", "f")},
       |  ${scoreUp("m_usd", "m")},
       |  CASE
       |    WHEN (1 + (CASE WHEN r_days < r1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r4 THEN 1 ELSE 0 END)) >= 4
       |     AND (1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f4 THEN 1 ELSE 0 END)) >= 4
       |      THEN 'champion'
       |    WHEN (1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f4 THEN 1 ELSE 0 END)) >= 4
       |      THEN 'loyal'
       |    WHEN (1 + (CASE WHEN r_days < r1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r4 THEN 1 ELSE 0 END)) >= 4
       |     AND (1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f4 THEN 1 ELSE 0 END)) <= 2
       |      THEN 'new'
       |    WHEN (1 + (CASE WHEN r_days < r1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r4 THEN 1 ELSE 0 END)) <= 2
       |     AND (1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN freq > f4 THEN 1 ELSE 0 END)) >= 3
       |      THEN 'at_risk'
       |    WHEN (1 + (CASE WHEN r_days < r1 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r2 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r3 THEN 1 ELSE 0 END)
       |            + (CASE WHEN r_days < r4 THEN 1 ELSE 0 END)) <= 2
       |      THEN 'hibernating'
       |    ELSE 'regular'
       |  END AS segment
       |FROM u, cr""".stripMargin
  }

  // --------------------------------------------- #259 autocorrelation

  /** ACF lags reported (1 = momentum, 2 = short memory, 7 = the weekly
    * period #193's seasonal-naive forecast assumes).
    */
  val AcfLags = Seq(1, 2, 7)

  /** #259: AUTOCORRELATION of the per-type daily volume series at lags
    * 1/2/7 — the Box–Jenkins model-identification diagnostic the
    * forecast family reads FIRST: #193 assumes a lag-7 season and #251
    * tests weekday uniformity; the ACF is the statistic that says
    * which lags carry signal at all (r₇ high → seasonal-naive is
    * justified; r₁ high → yesterday beats last week).
    *
    * The series is the daily event COUNT on the COMPLETE calendar —
    * missing days are true zeros of a volume series, and skipping them
    * (row-offset lag) is #193's calendar-corruption bug. Sample ACF:
    * r_k = Σ_{d≤n−k}(x_d−x̄)(x_{d+k}−x̄) / Σ_d(x_d−x̄)².
    *
    * Exactness: counts are integers; x̄ is ONE division quantized at
    * 1e-6 (both engines then hold the bit-identical mean); each
    * deviation and each product is a single correctly-rounded IEEE op
    * over exact values; the sums quantize at 1e-4 order-free; r_k is
    * one division of exact sums. Scale: events collapse map-side onto
    * the bounded (type, day) keyspace; the calendar completion, the
    * per-type windows (frames bounded by the day span) and the final
    * 5-key rollup all run on the daily frame, never on events.
    */
  def acf(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsS(spark, dir)
      .groupBy(col("event_type"), expr("ts_s DIV 86400").as("day"))
      .agg(count(lit(1)).as("c"))
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val series = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).cast("double").as("x"))
    val byType = Window.partitionBy("event_type")
    val byDay = byType.orderBy("day")
    val dev = series
      .withColumn("m", Exact.roundS(
        sum("x").over(byType) / count(lit(1)).over(byType).cast("double")))
      .withColumn("dev", col("x") - col("m"))
      .withColumn("dev1", lead("dev", 1).over(byDay))
      .withColumn("dev2", lead("dev", 2).over(byDay))
      .withColumn("dev7", lead("dev", 7).over(byDay))
    val sums = dev.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      Exact.decSum(col("dev") * col("dev"), 4).as("s0"),
      Exact.decSum(when(col("dev1").isNotNull, col("dev") * col("dev1"))
        .otherwise(0.0), 4).as("s1"),
      Exact.decSum(when(col("dev2").isNotNull, col("dev") * col("dev2"))
        .otherwise(0.0), 4).as("s2"),
      Exact.decSum(when(col("dev7").isNotNull, col("dev") * col("dev7"))
        .otherwise(0.0), 4).as("s7"))
    sums.select(col("event_type"), col("n_days"), col("s0"),
      explode(array(
        struct(lit(1L).as("lag"), col("s1").as("num")),
        struct(lit(2L).as("lag"), col("s2").as("num")),
        struct(lit(7L).as("lag"), col("s7").as("num")))).as("r"))
      .select(col("event_type"), col("r.lag").as("lag"),
        col("n_days"), (col("n_days") - col("r.lag")).as("n_pairs"),
        (col("r.num") / col("s0")).as("acf"))
  }

  val acfSql: String = {
    def devp(k: Int) =
      s"""${Exact.duckSum(
        s"CASE WHEN dev$k IS NOT NULL THEN dev * dev$k ELSE 0.0::DOUBLE END",
        4)}"""
    s"""WITH d AS (
       |  SELECT event_type, $duckTsS // 86400 AS day, COUNT(*) AS c
       |  FROM events GROUP BY 1, 2
       |), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
       |grid AS (
       |  SELECT t.event_type, UNNEST(generate_series(d0, d1)) AS day
       |  FROM (SELECT DISTINCT event_type FROM d) t, span
       |), s AS (
       |  SELECT g.event_type, g.day,
       |    CAST(COALESCE(d.c, 0) AS DOUBLE) AS x
       |  FROM grid g LEFT JOIN d
       |    ON g.event_type = d.event_type AND g.day = d.day
       |), dv AS (
       |  SELECT event_type, day,
       |    x - ${Exact.duckRoundS(
                "SUM(x) OVER (PARTITION BY event_type) " +
                "/ CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE)")}
       |      AS dev,
       |    LEAD(x, 1) OVER w AS x1, LEAD(x, 2) OVER w AS x2,
       |    LEAD(x, 7) OVER w AS x7,
       |    ${Exact.duckRoundS(
                "SUM(x) OVER (PARTITION BY event_type) " +
                "/ CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE)")}
       |      AS m
       |  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)
       |), dvl AS (
       |  SELECT event_type, dev,
       |    x1 - m AS dev1, x2 - m AS dev2, x7 - m AS dev7
       |  FROM dv
       |), sums AS (
       |  SELECT event_type, COUNT(*) AS n_days,
       |    ${Exact.duckSum("dev * dev", 4)} AS s0,
       |    ${devp(1)} AS s1, ${devp(2)} AS s2, ${devp(7)} AS s7
       |  FROM dvl GROUP BY 1
       |)
       |SELECT event_type, r.lag, n_days, n_days - r.lag AS n_pairs,
       |  r.num / s0 AS acf
       |FROM sums, UNNEST([{'lag': 1::BIGINT, 'num': s1},
       |  {'lag': 2::BIGINT, 'num': s2},
       |  {'lag': 7::BIGINT, 'num': s7}]) AS t(r)""".stripMargin
  }

  // --------------------------------------- #260 funnel stage latency

  /** #260: FUNNEL STAGE LATENCY — the time-to-convert distribution per
    * funnel transition: #89 counts WHO converts view→click→purchase in
    * order; this reports HOW LONG each transition takes (p50/p90/max
    * hours + mean seconds), the number that turns a funnel into an SLO
    * ("median click within 2 h of first view") and decides
    * re-engagement timing.
    *
    * Stage times are #89's per-user earliest-stage chain verbatim
    * (exact-ns conditional mins); each lag is an integer second
    * difference, bucketed to integer HOURS for the #108 nearest-rank
    * histogram (the hour keyspace is calendar-bounded where raw
    * seconds would scale with the span); the mean stays on exact
    * second sums — one division. Scale: all three stage aggregates and
    * both joins share the ONE user_id partitioning (the #89 argument);
    * the histograms and percentile windows run on the bounded
    * (stage, hour) frame.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val ns = tsNanos(e)
    val ev = e.select(col("user_id"), col("event_type"),
      expr(s"$ns DIV 1000000000").as("ts_s"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_s").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts_s") > col("t1"))
      .groupBy("user_id").agg(min("ts_s").as("t2"), min("t1").as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts_s") > col("t2"))
      .groupBy("user_id").agg(min("ts_s").as("t3"), min("t2").as("t2"))
    val lags = s2.select(lit("view_to_click").as("stage"),
        (col("t2") - col("t1")).as("lag_s"))
      .unionAll(s3.select(lit("click_to_purchase").as("stage"),
        (col("t3") - col("t2")).as("lag_s")))
      .withColumn("h", expr("lag_s DIV 3600"))
    val hist = lags.groupBy("stage", "h")
      .agg(count(lit(1)).as("c"), sum("lag_s").as("ssum"))
    val wCum = Window.partitionBy("stage").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("stage")
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("stage")
      .agg(max("n").as("n_users"),
        min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("h")))
          .as("p50_h"),
        min(when(col("cum") >= expr("(n * 90 + 99) DIV 100"), col("h")))
          .as("p90_h"),
        max("h").as("max_h"),
        (sum("ssum").cast("double") / max("n").cast("double"))
          .as("mean_s"))
  }

  val funnelLatencySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, $duckTsS AS ts_s FROM events
       |), s1 AS (
       |  SELECT user_id, MIN(ts_s) AS t1 FROM e WHERE event_type = 'view'
       |  GROUP BY 1
       |), s2 AS (
       |  SELECT e.user_id, MIN(ts_s) AS t2, MIN(t1) AS t1
       |  FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND ts_s > t1 GROUP BY 1
       |), s3 AS (
       |  SELECT e.user_id, MIN(ts_s) AS t3, MIN(t2) AS t2
       |  FROM e JOIN s2 USING (user_id)
       |  WHERE event_type = 'purchase' AND ts_s > t2 GROUP BY 1
       |), lags AS (
       |  SELECT 'view_to_click' AS stage, t2 - t1 AS lag_s FROM s2
       |  UNION ALL
       |  SELECT 'click_to_purchase' AS stage, t3 - t2 AS lag_s FROM s3
       |), h AS (
       |  SELECT stage, lag_s // 3600 AS h, COUNT(*) AS c,
       |    CAST(SUM(lag_s) AS BIGINT) AS ssum
       |  FROM lags GROUP BY 1, 2
       |), cum AS (
       |  SELECT stage, h, c, ssum,
       |    SUM(c) OVER (PARTITION BY stage ORDER BY h) AS cum,
       |    SUM(c) OVER (PARTITION BY stage) AS n
       |  FROM h
       |)
       |SELECT stage, CAST(MAX(n) AS BIGINT) AS n_users,
       |  MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN h END) AS p50_h,
       |  MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN h END) AS p90_h,
       |  MAX(h) AS max_h,
       |  CAST(SUM(ssum) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_s
       |FROM cum GROUP BY stage""".stripMargin

  // ------------------------------------------------- #261 pivot report

  /** The pivot's pinned column list — pivoting an UNBOUNDED column is
    * a schema explosion; a production pivot always pins its values
    * (Spark's own API docs make the same point: the values-given form
    * skips the distinct-scan AND bounds the schema).
    */
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  /** #261: PIVOT — the daily wide-table activity report: one row per
    * day, one COLUMN per event type, plus the daily total. The
    * relational reshape every BI export ends with (long→wide), done
    * with Spark's first-class `groupBy().pivot(col, values)` operator.
    *
    * Spark-first: with the value list pinned ([[PivotTypes]]), pivot
    * compiles to ONE map-side-combining aggregate of conditional
    * counts onto the day keyspace — a single shuffle of 7-column
    * partials, no Expand, no distinct pre-scan, no per-type pass.
    * Absent (day, type) cells surface as exact zero counts.
    * Exactness: pure integer counting on integer epoch-days.
    */
  def pivotDaily(spark: SparkSession, dir: String): DataFrame = {
    val wide = eventsS(spark, dir)
      .select(expr("ts_s DIV 86400").as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
    PivotTypes.foldLeft(wide) { (df, t) =>
        df.withColumn(s"n_$t", coalesce(col(s"`$t`"), lit(0L))).drop(t)
      }
      .withColumn("n_total",
        PivotTypes.map(t => col(s"n_$t")).reduce(_ + _))
  }

  val pivotDailySql: String = {
    val cells = PivotTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n       |  ")
    val total = PivotTypes.map(t => s"n_$t").mkString(" + ")
    s"""SELECT day, ${PivotTypes.map(t => s"n_$t").mkString(", ")},
       |  $total AS n_total
       |FROM (
       |  SELECT $duckTsS // 86400 AS day,
       |    $cells
       |  FROM events GROUP BY 1
       |)""".stripMargin
  }

  // --------------------------------------------- #263 audience overlap

  /** #263: AUDIENCE OVERLAP — for every pair of event types, how many
    * users do both, and the Jaccard of the two audiences: the
    * audience-overlap matrix growth teams read to decide which surface
    * drives which ("do purchasers click, or arrive cold?"), and the
    * co-occurrence input to feature-adoption maps. The funnel (#89)
    * imposes an order; this is the ORDER-FREE co-audience view.
    *
    * Spark-first scale shape: the whole corpus collapses in ONE
    * map-side-combining aggregate to a per-user TYPE BITMASK (5 pinned
    * types → bits 0-4, the [[PivotTypes]] order), the mask histogram
    * is ≤ 32 rows forever, and all 10 pair cells are conditional sums
    * over that histogram — events are touched once, pairs never see
    * data-scale rows. (The naive distinct-pair self-join shuffles the
    * corpus twice; the bitmask form is why audience matrices stay
    * cheap at any scale.) Exactness: pure integer counting; the
    * Jaccard is one division of exact BIGINTs.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val flags = PivotTypes.zipWithIndex.map { case (t, i) =>
      max(when(col("event_type") === t, 1L).otherwise(0L)).as(s"f$i")
    }
    val mask = PivotTypes.indices
      .map(i => col(s"f$i") * lit(1L << i)).reduce(_ + _)
    val hist = Tables.events(spark, dir)
      .groupBy("user_id").agg(flags.head, flags.tail: _*)
      .select(mask.as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("c"))
    val pairs = for {
      a <- PivotTypes.indices; b <- PivotTypes.indices if a < b
    } yield struct(lit(a).as("ai"), lit(b).as("bi"))
    val names = array(PivotTypes.map(lit): _*)
    hist
      .select(explode(array(pairs: _*)).as("p"), col("mask"), col("c"))
      .select(col("p.ai").as("ai"), col("p.bi").as("bi"),
        col("mask"), col("c"))
      .select(col("ai"), col("bi"), col("c"),
        expr("shiftright(mask, ai) & 1").as("ba"),
        expr("shiftright(mask, bi) & 1").as("bb"))
      .groupBy("ai", "bi")
      .agg(sum(col("ba") * col("c")).as("n_a"),
        sum(col("bb") * col("c")).as("n_b"),
        sum(col("ba") * col("bb") * col("c")).as("n_both"))
      .filter(col("n_both") > 0L)
      .select(
        element_at(names, col("ai").cast("int") + 1).as("type_a"),
        element_at(names, col("bi").cast("int") + 1).as("type_b"),
        col("n_a"), col("n_b"), col("n_both"),
        (col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both"))).as("jaccard"))
  }

  /** Oracle: the definitional form — distinct (user, type) pairs
    * self-joined on the user — over the SAME pair universe; the bitmask
    * is a plan optimization, never a semantics change.
    */
  val audienceOverlapSql: String =
    s"""WITH d AS (
       |  SELECT DISTINCT user_id, event_type FROM events
       |), c AS (
       |  SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1
       |), b AS (
       |  SELECT x.event_type AS type_a, y.event_type AS type_b,
       |    COUNT(*) AS n_both
       |  FROM d x JOIN d y
       |    ON x.user_id = y.user_id AND x.event_type < y.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT type_a, type_b, ca.n AS n_a, cb.n AS n_b, n_both,
       |  CAST(n_both AS DOUBLE) / (ca.n + cb.n - n_both) AS jaccard
       |FROM b
       |JOIN c ca ON ca.event_type = type_a
       |JOIN c cb ON cb.event_type = type_b""".stripMargin

  // --------------------------------------- #267 seasonal decomposition

  /** #267: CLASSICAL SEASONAL DECOMPOSITION (additive, weekly) of each
    * event type's daily volume series: x_d = trend + seasonal + remainder
    * — the Makridakis/Hyndman "classical decomposition" that turns one
    * noisy series into the three questions that matter (is volume
    * growing? which weekday carries it? what's left to alarm on?). The
    * ACF (#259) says WHETHER a weekly season exists; this op extracts
    * it. The remainder is what #97/#140-style anomaly detection should
    * run on — alarming on raw volume confuses Sunday with an outage.
    *
    * Construction, all on the COMPLETE calendar (missing days are true
    * zeros, the #193/#259 discipline):
    *   trend_d    = centered 7-term moving average (defined only where
    *                all 7 neighbors exist — the standard edge rule);
    *   seasonal_w = quantized mean of (x − trend) per day-of-week,
    *                recentred so the OBSERVED indices sum to zero (the
    *                additive-model identifiability constraint; the
    *                recentring mean divides by the dow count actually
    *                present, so the constraint holds even on a
    *                <13-day span with missing weekdays — ADVICE r6);
    *   remainder  = x − trend − seasonal.
    *
    * Exactness: x is an integer count; the 7-term sum is an exact
    * BIGINT, trend = one division by 7.0; detrended values quantize at
    * 1e-6 into order-free sums, the per-dow mean and the recentring
    * mean are each ONE quantized division ([[Exact.roundS]]), so both
    * engines hold bit-identical seasonal indices; the remainder is two
    * correctly-rounded subtractions of identical doubles.
    *
    * Scale: events collapse map-side onto the bounded (type, day)
    * keyspace; every window partitions by event_type over the bounded
    * calendar frame (never the corpus); the dow profile is a 35-key
    * aggregate. Output: one row per (type, day) with defined trend —
    * calendar-bounded.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsS(spark, dir)
      .groupBy(col("event_type"), expr("ts_s DIV 86400").as("day"))
      .agg(count(lit(1)).as("c"))
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val series = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("x"))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val trended = series
      .withColumn("s7", sum("x").over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("trend",
        when(col("n7") === 7, col("s7").cast("double") / 7.0))
      .withColumn("dow", pmod(col("day"), lit(7)))
    val dowIdx = trended.filter(col("trend").isNotNull)
      .groupBy("event_type", "dow")
      .agg((Exact.decSum(col("x") - col("trend"), 6)
        / count(lit(1))).as("raw_idx"))
      .withColumn("raw_idx", Exact.roundS(col("raw_idx")))
    // recentring divides by the number of dow indices actually PRESENT
    // (ADVICE r6): a sub-13-day trend span covers < 7 distinct
    // weekdays, and a literal /7.0 would leave the observed indices
    // summing away from zero. Equal to /7.0 whenever all 7 exist.
    val meanIdx = dowIdx.groupBy("event_type")
      .agg(Exact.roundS(Exact.decSum(col("raw_idx"), 6) / count(lit(1)))
        .as("mean_idx"))
    val centred = dowIdx.join(broadcast(meanIdx), "event_type")
      .select(col("event_type"), col("dow"),
        (col("raw_idx") - col("mean_idx")).as("seasonal"))
    trended.filter(col("trend").isNotNull)
      .join(centred, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("x"),
        col("trend"), col("seasonal"),
        (col("x") - col("trend") - col("seasonal")).as("remainder"))
  }

  val seasonalDecomposeSql: String =
    s"""WITH d AS (
       |  SELECT event_type, $duckTsS // 86400 AS day, COUNT(*) AS c
       |  FROM events GROUP BY 1, 2
       |), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
       |grid AS (
       |  SELECT t.event_type, UNNEST(generate_series(d0, d1)) AS day
       |  FROM (SELECT DISTINCT event_type FROM d) t, span
       |), s AS (
       |  SELECT g.event_type, g.day, COALESCE(d.c, 0) AS x
       |  FROM grid g LEFT JOIN d
       |    ON g.event_type = d.event_type AND g.day = d.day
       |), tr AS (
       |  SELECT event_type, day, x, day % 7 AS dow,
       |    CASE WHEN COUNT(*) OVER w7 = 7
       |         THEN CAST(SUM(x) OVER w7 AS DOUBLE) / 7.0 END AS trend
       |  FROM s WINDOW w7 AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
       |), raw AS (
       |  SELECT event_type, dow,
       |    ${Exact.duckRoundS(
             Exact.duckSum("CAST(x AS DOUBLE) - trend") + " / COUNT(*)")}
       |      AS raw_idx
       |  FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2
       |), mi AS (
       |  SELECT event_type,
       |    ${Exact.duckRoundS(Exact.duckSum("raw_idx") + " / COUNT(*)")}
       |      AS mean_idx
       |  FROM raw GROUP BY 1
       |), ctr AS (
       |  SELECT r.event_type, r.dow, r.raw_idx - m.mean_idx AS seasonal
       |  FROM raw r JOIN mi m ON r.event_type = m.event_type
       |)
       |SELECT t.event_type, t.day, t.dow, t.x, t.trend, c.seasonal,
       |  t.x - t.trend - c.seasonal AS remainder
       |FROM tr t JOIN ctr c
       |  ON t.event_type = c.event_type AND t.dow = c.dow
       |WHERE t.trend IS NOT NULL""".stripMargin

  // ------------------------------------------- #268 session concurrency

  /** #268: PEAK CONCURRENCY — per day, the maximum number of sessions
    * active at the same instant (plus sessions started and the
    * end-of-day level): the capacity number — connection pools, rate
    * limits, on-call staffing — that no per-day COUNT can produce,
    * because concurrency is a property of OVERLAP, not volume. The
    * classic sweep-line: +1 at each session start, −1 one second after
    * its end (sessions are inclusive-second intervals, so back-to-back
    * sessions at t and t′=end overlap at the boundary), and the peak
    * is the maximum of the running sum.
    *
    * Spark-first scale shape — the DISTRIBUTED PREFIX SUM: a global
    * ordered running sum does not partition, so boundaries collapse
    * first onto per-second net deltas keyed by DAY (map-side combine),
    * the within-day cumulative runs under a day-partitioned window,
    * and the cross-day carry is a triangular join over the PER-DAY
    * TOTALS frame — calendar-bounded, broadcast, never data-scale.
    * That two-level scan (local scan + small carry table) is exactly
    * how parallel prefix sums are built; corpus rows shuffle once,
    * onto the session keyspace they already use (#5's user_id
    * partitioning feeds the interval extraction).
    *
    * Exactness: everything is BIGINT counting on integer seconds;
    * day peak = carry + max(0, max within-day cumulative) evaluated at
    * boundary seconds (concurrency only changes there), with the
    * carried level itself a candidate (a quiet day can peak at its
    * inherited level). Days with no boundary events are not emitted —
    * their constant level is the previous emitted day's eod_conc.
    */
  def concurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val sess = eventsS(spark, dir)
      .withColumn("prev_ts", lag("ts_s", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull || col("ts_s") - col("prev_ts") > GapS)
          .cast("int"))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(min("ts_s").as("s"), max("ts_s").as("e"))
    val bounds = sess.select(col("s").as("t"), lit(1L).as("d"))
      .unionAll(sess.select((col("e") + 1L).as("t"), lit(-1L).as("d")))
    val net = bounds
      .groupBy(expr("t DIV 86400").as("day"), col("t"))
      .agg(sum("d").as("net"),
        sum(when(col("d") > 0L, col("d")).otherwise(0L)).as("starts"))
    val wDay = Window.partitionBy("day").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val intra = net.withColumn("cum_in", sum("net").over(wDay))
    val dayTot = intra.groupBy("day")
      .agg(sum("net").as("tot"), sum("starts").as("n_starts"),
        max("cum_in").as("max_in"))
    val carry = dayTot
      .join(broadcast(dayTot.select(col("day").as("pd"), col("tot").as("ptot"))),
        col("pd") < col("day"), "left")
      .groupBy("day", "tot", "n_starts", "max_in")
      .agg(coalesce(sum(col("ptot")), lit(0L)).as("carry"))
    carry.select(col("day"), col("n_starts"),
      greatest(col("carry"), col("carry") + col("max_in")).as("peak_conc"),
      (col("carry") + col("tot")).as("eod_conc"))
  }

  /** Oracle: the definitional single global running sum (fine for an
    * oracle; the Spark side is the two-level partitioned form), with
    * the carried-in level recovered per day as arg_min_t(conc − net).
    */
  val concurrencySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, $duckTsS AS ts_s FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_s - prev_ts > $GapS
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM (SELECT *, LAG(ts_s) OVER w AS prev_ts FROM e
       |        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
       |), numbered AS (
       |  SELECT *, CAST(SUM(new_session) OVER
       |    (PARTITION BY user_id ORDER BY ts_s, event_id
       |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |  FROM flagged
       |), sess AS (
       |  SELECT user_id, session_seq, MIN(ts_s) AS s, MAX(ts_s) AS e2
       |  FROM numbered GROUP BY 1, 2
       |), b AS (
       |  SELECT s AS t, 1 AS d FROM sess
       |  UNION ALL SELECT e2 + 1, -1 FROM sess
       |), net AS (
       |  SELECT t // 86400 AS day, t, CAST(SUM(d) AS BIGINT) AS net,
       |    CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT) AS starts
       |  FROM b GROUP BY 1, 2
       |), cum AS (
       |  SELECT day, t, net, starts,
       |    CAST(SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS conc
       |  FROM net
       |)
       |SELECT day, CAST(SUM(starts) AS BIGINT) AS n_starts,
       |  GREATEST(arg_min(conc - net, t), MAX(conc)) AS peak_conc,
       |  arg_max(conc, t) AS eod_conc
       |FROM cum GROUP BY day""".stripMargin

  // ------------------------------------------ #277 Holt-Winters seasonal

  /** #277: HOLT–WINTERS additive triple exponential smoothing of the
    * per-type daily revenue series — the final rung of the smoothing
    * ladder (#198 EWMA smooths a level, #233 Holt adds a trend, this
    * adds the WEEKLY SEASONAL the decomposition #267 measures
    * post-hoc): ℓ_t = α(y_t − s_{t−7}) + (1−α)(ℓ+b),
    * b_t = β(ℓ_t − ℓ) + (1−β)b, s_t = γ(y_t − (ℓ+b)) + (1−γ)s_{t−7}
    * (Hyndman's additive form), α = β = γ = ½ so every smoothing
    * weight is a halving. Seasonal slots are keyed by CALENDAR
    * day-of-week (day mod 7), not step parity — a gap day advances the
    * season correctly where positional indexing would rotate it.
    * Init pinned: ℓ₁ = y₁, b₁ = y₂ − y₁ (the #233 convention),
    * seasonals zero — the recursion is the operator; #267 is the
    * better initializer a production run would feed in.
    *
    * Exactness — the #233 argument with a 9-field state: the fold is
    * ONE sequential left fold per type over the sorted dictionary-sized
    * daily list, every step a fixed tree of halvings and
    * correctly-rounded adds/subs; the oracle iterates the identical
    * recursion as a RECURSIVE CTE (l and b duplicate the new-level
    * expression textually; each seasonal slot updates through a CASE
    * on the same dow), so both engines execute the same IEEE sequence.
    * Slot lookups are value reads, not arithmetic — no rounding enters
    * through the array/column representation difference.
    *
    * Plan: one map-side collapse onto (type, day), one 5-key list
    * aggregate, then per-type dictionary-sized algebra. Emits level /
    * trend / the 7 seasonal indices / 7-day-ahead forecast in dollars.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsS(spark, dir)
      .select(col("event_type"), expr("ts_s DIV 86400").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sv"))
    val one = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("sv"))))
        .as("lst"), count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
    val zeros7 = array((0 until 7).map(_ => lit(0.0)): _*)
    val folded = one.withColumn("st",
      aggregate(
        expr("slice(lst, 2, size(lst) - 1)"),
        struct(
          element_at(col("lst"), 1).getField("sv").cast("double").as("l"),
          (element_at(col("lst"), 2).getField("sv").cast("double") -
            element_at(col("lst"), 1).getField("sv").cast("double"))
            .as("b"),
          zeros7.as("s")),
        (a, x) => {
          def y = x.getField("sv").cast("double")
          def dow = pmod(x.getField("day"), lit(7L))
          def sOld = element_at(a.getField("s"), (dow + 1).cast("int"))
          def lNew = lit(0.5) * (y - sOld) +
            lit(0.5) * (a.getField("l") + a.getField("b"))
          struct(
            lNew.as("l"),
            (lit(0.5) * (lNew - a.getField("l")) +
              lit(0.5) * a.getField("b")).as("b"),
            transform(sequence(lit(0), lit(6)), k =>
              when(k.cast("long") === dow,
                lit(0.5) * (y - (a.getField("l") + a.getField("b"))) +
                  lit(0.5) * sOld)
                .otherwise(element_at(a.getField("s"), k + 1))).as("s"))
        }))
    val sCols = (0 until 7).map(k =>
      (element_at(col("st.s"), k + 1) / 100.0).as(s"s$k"))
    folded.select(Seq(col("event_type"), col("n_days"),
      element_at(col("lst"), -1).getField("day").as("last_day"),
      (col("st.l") / 100.0).as("level"),
      (col("st.b") / 100.0).as("trend")) ++ sCols :+
      ((col("st.l") + lit(7.0) * col("st.b") +
        element_at(col("st.s"),
          (pmod(element_at(col("lst"), -1).getField("day"), lit(7L)) + 1)
            .cast("int"))) / 100.0).as("forecast_7d"): _*)
  }

  val holtWintersSql: String = {
    def sCase(ref: String) =
      s"CASE d.dow" + (0 until 7).map(k =>
        s" WHEN $k THEN r.s$k").mkString + " END"
    val lNew = s"0.5::DOUBLE * (d.y - ${sCase("r")}) + " +
      "0.5::DOUBLE * (r.l + r.b)"
    val sUpd = (0 until 7).map(k =>
      s"""CASE WHEN d.dow = $k
         |      THEN 0.5::DOUBLE * (d.y - (r.l + r.b)) + 0.5::DOUBLE * r.s$k
         |      ELSE r.s$k END AS s$k""".stripMargin).mkString(",\n    ")
    val sLast = "CASE last_day % 7" + (0 until 7).map(k =>
      s" WHEN $k THEN s$k").mkString + " END"
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, $duckTsS // 86400 AS day,
       |    CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS sv
       |  FROM events GROUP BY 1, 2
       |), dd AS (
       |  SELECT event_type, day % 7 AS dow, CAST(sv AS DOUBLE) AS y,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
       |    MAX(day) OVER (PARTITION BY event_type) AS last_day
       |  FROM daily
       |), rec AS (
       |  SELECT event_type, n_days, last_day, CAST(1 AS BIGINT) AS rn,
       |    y AS l,
       |    (SELECT d2.y FROM dd d2
       |     WHERE d2.event_type = dd.event_type AND d2.rn = 2) - y AS b,
       |    ${(0 until 7).map(k => s"0.0::DOUBLE AS s$k").mkString(", ")}
       |  FROM dd WHERE rn = 1 AND n_days >= 2
       |  UNION ALL
       |  SELECT r.event_type, r.n_days, r.last_day, r.rn + 1,
       |    $lNew AS l,
       |    0.5::DOUBLE * (($lNew) - r.l) + 0.5::DOUBLE * r.b AS b,
       |    $sUpd
       |  FROM rec r JOIN dd d
       |    ON d.event_type = r.event_type AND d.rn = r.rn + 1
       |)
       |SELECT event_type, n_days, last_day,
       |  l / 100.0::DOUBLE AS level, b / 100.0::DOUBLE AS trend,
       |  ${(0 until 7).map(k => s"s$k / 100.0::DOUBLE AS s$k").mkString(", ")},
       |  (l + 7.0::DOUBLE * b + $sLast) / 100.0::DOUBLE AS forecast_7d
       |FROM rec WHERE rn = n_days""".stripMargin
  }

  // ------------------------------------------ #281 cross-correlation

  /** Pinned lead–lag pairs (x leads y) and the maximum lag probed. */
  val XcorrPairs = Seq(("view", "click"), ("view", "purchase"),
    ("click", "purchase"))
  val XcorrMaxLag = 7

  /** #281: LAGGED CROSS-CORRELATION between event types' daily volume
    * series — the lead–lag detector: does view volume today predict
    * purchase volume k days out? #259's ACF asks this of a series
    * against ITSELF; the funnel (#89/#260) answers it per user; this is
    * the population-level version marketing mix and capacity models
    * consume (peak lag = conversion latency at the aggregate level).
    * r_k = Σ(x_t−x̄)(y_{t+k}−ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²), lags 0..7 over
    * the three pinned funnel-ordered pairs.
    *
    * The series discipline is #259's verbatim: COMPLETE calendar
    * (missing days are true zeros), quantized means so both engines
    * hold bit-identical centers, deviation products quantized 1e-4
    * order-free; the denominators are the FULL-series sums (the
    * #259 normalization convention, so r_k shrinks as the overlap
    * thins rather than inflating at the edges); one division + one
    * sqrt at the end.
    *
    * Scale: events collapse map-side onto (type, day); the pair×lag
    * expansion (3×8) and the shifted join run on the bounded daily
    * frame keyed by day — never on events.
    */
  def xcorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsS(spark, dir)
      .groupBy(col("event_type"), expr("ts_s DIV 86400").as("day"))
      .agg(count(lit(1)).as("c"))
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val series = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).cast("double").as("x"))
    val byType = Window.partitionBy("event_type")
    val dev = series
      .withColumn("m", Exact.roundS(
        sum("x").over(byType) / count(lit(1)).over(byType).cast("double")))
      .select(col("event_type"), col("day"),
        (col("x") - col("m")).as("dev"))
    val s0 = dev.groupBy("event_type")
      .agg(Exact.decSum(col("dev") * col("dev"), 4).as("ss"))
    val pairLit = array(XcorrPairs.map { case (x, y) =>
      struct(lit(x).as("tx"), lit(y).as("ty")) }: _*)
    val xside = dev
      .select(explode(pairLit).as("p"), col("event_type"), col("day"),
        col("dev").as("dx"))
      .filter(col("p.tx") === col("event_type"))
      .select(col("p.tx").as("tx"), col("p.ty").as("ty"), col("day"),
        col("dx"), explode(expr(s"sequence(0L, ${XcorrMaxLag}L)")).as("lag"))
    val yside = dev.select(col("event_type").as("ty"),
      col("day").as("dayy"), col("dev").as("dy"))
    xside.join(yside,
        xside("ty") === yside("ty") &&
          yside("dayy") === xside("day") + xside("lag"))
      .groupBy(xside("tx").as("tx"), xside("ty").as("ty"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        Exact.decSum(col("dx") * col("dy"), 4).as("sxy"))
      .join(broadcast(s0.select(col("event_type").as("tx"),
        col("ss").as("sxx"))), "tx")
      .join(broadcast(s0.select(col("event_type").as("ty"),
        col("ss").as("syy"))), "ty")
      .select(col("tx"), col("ty"), col("lag"), col("n_pairs"),
        (col("sxy") / sqrt(col("sxx") * col("syy"))).as("xcorr"))
  }

  val xcorrSql: String = {
    val pairVals = XcorrPairs.map { case (x, y) => s"('$x', '$y')" }
      .mkString(", ")
    s"""WITH d AS (
       |  SELECT event_type, $duckTsS // 86400 AS day, COUNT(*) AS c
       |  FROM events GROUP BY 1, 2
       |), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
       |grid AS (
       |  SELECT t.event_type, UNNEST(generate_series(d0, d1)) AS day
       |  FROM (SELECT DISTINCT event_type FROM d) t, span
       |), s AS (
       |  SELECT g.event_type, g.day,
       |    CAST(COALESCE(d.c, 0) AS DOUBLE) AS x
       |  FROM grid g LEFT JOIN d
       |    ON g.event_type = d.event_type AND g.day = d.day
       |), dv AS (
       |  SELECT event_type, day,
       |    x - ${Exact.duckRoundS(
              "SUM(x) OVER (PARTITION BY event_type) " +
              "/ CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE)")}
       |      AS dev
       |  FROM s
       |), s0 AS (
       |  SELECT event_type, ${Exact.duckSum("dev * dev", 4)} AS ss
       |  FROM dv GROUP BY 1
       |), pr AS (SELECT * FROM (VALUES $pairVals) t(tx, ty)),
       |lg AS (SELECT unnest(range(0, ${XcorrMaxLag + 1})) AS lag),
       |sums AS (
       |  SELECT pr.tx, pr.ty, lg.lag, COUNT(*) AS n_pairs,
       |    ${Exact.duckSum("a.dev * b.dev", 4)} AS sxy
       |  FROM pr, lg, dv a, dv b
       |  WHERE a.event_type = pr.tx AND b.event_type = pr.ty
       |    AND b.day = a.day + lg.lag
       |  GROUP BY 1, 2, 3
       |)
       |SELECT tx, ty, lag, n_pairs, sxy / sqrt(x0.ss * y0.ss) AS xcorr
       |FROM sums JOIN s0 x0 ON x0.event_type = tx
       |  JOIN s0 y0 ON y0.event_type = ty""".stripMargin
  }

  // ------------------------------------------- #284 STL-residual alarm

  /** #284: SEASONALLY-ADJUSTED ANOMALY FLAGS — the 3σ monitor run on
    * the #267 REMAINDER instead of raw volume, closing the loop #267's
    * doc opens: raw-volume alarms confuse Sunday with an outage, so the
    * monitored series must first shed trend and weekday profile. One
    * row per decomposed (type, day) with the residual z-inputs and the
    * flag — emitting all rows (not just alarms) keeps the artifact
    * joinable and the threshold auditable.
    *
    * Exactness: the decomposition is #267 verbatim (bit-identical
    * remainders in both engines); the residual center is ONE quantized
    * division, the σ is the #97 moment form √(s2/n − m²) over
    * quantized sums, and the flag compares |r − m| against 3σ — a
    * fixed tree over identical doubles, so the boolean itself is
    * bit-deterministic. Scale: everything after #267 is a 5-key moment
    * rollup + a broadcast join back onto the calendar-bounded frame.
    */
  def stlAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val dec = seasonalDecompose(spark, dir)
    val stats = dec.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      Exact.roundS(Exact.decSum(col("remainder"), 6) / count(lit(1)))
        .as("resid_mean"),
      Exact.decSum(col("remainder") * col("remainder"), 4).as("s2"))
      .select(col("event_type"), col("n"), col("resid_mean"),
        sqrt(col("s2") / col("n") - col("resid_mean") * col("resid_mean"))
          .as("resid_sd"))
    dec.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("day"), col("x"), col("remainder"),
        col("resid_mean"), col("resid_sd"),
        (abs(col("remainder") - col("resid_mean"))
          > lit(3.0) * col("resid_sd")).as("is_anomaly"))
  }

  val stlAnomalySql: String =
    s"""WITH dec AS (
       |  $seasonalDecomposeSql
       |), st AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    ${Exact.duckRoundS(Exact.duckSum("remainder") + " / COUNT(*)")}
       |      AS resid_mean,
       |    ${Exact.duckSum("remainder * remainder", 4)} AS s2
       |  FROM dec GROUP BY 1
       |), sd AS (
       |  SELECT event_type, n, resid_mean,
       |    sqrt(s2 / n - resid_mean * resid_mean) AS resid_sd
       |  FROM st
       |)
       |SELECT d.event_type, d.day, d.x, d.remainder,
       |  s.resid_mean, s.resid_sd,
       |  abs(d.remainder - s.resid_mean) > 3.0 * s.resid_sd AS is_anomaly
       |FROM dec d JOIN sd s ON s.event_type = d.event_type""".stripMargin

  // ------------------------------------ #324 difference-in-differences

  /** #324: DIFFERENCE-IN-DIFFERENCES — the causal readout for a
    * treatment that turns ON at a point in time: (post−pre) change in
    * the treated arm minus the same change in the control arm, so any
    * shared trend (seasonality, growth, a marketing push) cancels and
    * only the treatment-correlated delta survives. The #215 A/B z-test
    * is cross-sectional (one period, randomized arms); DiD is the
    * panel-data member of the experimentation family — what you reach
    * for when the "experiment" is a launch, not a randomized split. The
    * arm assignment reuses #215's hash split so the two reports face
    * the same population; pre/post is the corpus midpoint day (an
    * integer derived from the data's own span — deterministic and
    * engine-mirrorable).
    *
    * Output is ONE wide row: the four (arm × period) cell counts and
    * cent-grid mean values plus the DiD estimate — a fixed literal
    * IEEE tree over exact quantized sums, identical in both engines.
    * Scale: one map-side-combining aggregate onto 4 cells (the
    * min/max-day scalar broadcasts back); nothing data-scale moves.
    */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{Exact, PortableHash}
    val e = eventsS(spark, dir)
      .select(col("user_id"), col("value"),
        expr("ts_s DIV 86400").as("day"))
    val span = e.agg(min("day").as("d0"), max("day").as("d1"))
      .select(expr("(d0 + d1 + 1) DIV 2").as("cut"))
    val cells = e.crossJoin(broadcast(span))
      .select(
        when(PortableHash.pHash(concat(lit("ab|"), col("user_id"))) % 2 === 0,
          "A").otherwise("B").as("arm"),
        when(col("day") >= col("cut"), "post").otherwise("pre").as("period"),
        col("value"))
      .groupBy("arm", "period")
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value"), 2).as("sv"))
    def cell(a: String, p: String, c: String) =
      max(when(col("arm") === a && col("period") === p, col(c)))
    val wide = cells.agg(
      cell("A", "pre", "n").as("n_a_pre"), cell("A", "pre", "sv").as("s_a_pre"),
      cell("A", "post", "n").as("n_a_post"), cell("A", "post", "sv").as("s_a_post"),
      cell("B", "pre", "n").as("n_b_pre"), cell("B", "pre", "sv").as("s_b_pre"),
      cell("B", "post", "n").as("n_b_post"), cell("B", "post", "sv").as("s_b_post"))
    def m(s: String, n: String) = col(s) / col(n).cast("double")
    wide.select(
      col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
      m("s_a_pre", "n_a_pre").as("mean_a_pre"),
      m("s_a_post", "n_a_post").as("mean_a_post"),
      m("s_b_pre", "n_b_pre").as("mean_b_pre"),
      m("s_b_post", "n_b_post").as("mean_b_post"),
      ((m("s_b_post", "n_b_post") - m("s_b_pre", "n_b_pre")) -
        (m("s_a_post", "n_a_post") - m("s_a_pre", "n_a_pre"))).as("did"))
  }

  // ---------------------------------------- #329 sequential mSPRT test

  /** Mixing variance for the mSPRT normal mixture — dyadic (1/16) so
    * products with it stay exact.
    */
  val SeqTau2 = 0.0625

  /** #329: ALWAYS-VALID SEQUENTIAL TEST (mixture SPRT — Johari, Koomen,
    * Pekelis & Walsh 2017, the "peeking problem" fix): the fixed-n
    * z-test (#215) holds its α only if the experimenter looks ONCE at a
    * pre-committed sample size — but every live dashboard is looked at
    * continuously, and repeated peeking inflates a nominal 5% test to
    * 20-30% false positives. The mSPRT's mixture likelihood ratio
    * Λ = √(V/(V+τ²)) · exp(δ²τ² / (2V(V+τ²))) yields p = min(1, 1/Λ)
    * that is valid at EVERY moment of monitoring — the always-valid
    * p-value streaming A/B dashboards ship. Emitted in LOG form
    * (log Λ never overflows where Λ itself can exp-overflow once n·δ²
    * grows — the same overflow discipline as the #279 G² ln form).
    *
    * Exactness: δ and V are fixed literal trees over the #215 cell
    * integers; log Λ and p each apply ONE transcendental (ln, exp) to
    * engine-identical inputs and round on the 1e-6 grid per the house
    * transcendental rule; τ² is dyadic. Degenerate-variance guard
    * mirrors #215 (all-convert/none-convert ⇒ no test). Scale: the
    * whole readout derives from the same 2-cell aggregate as #215 —
    * one map-side-combining user pass, then arithmetic on one row.
    */
  def sequentialTest(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    // r10: same shared user frame + one-pass pivot as #215 (see
    // usersConv/abCells).
    val wide = abCells(usersConv(spark, dir))
    val pp = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val vv = (pp * (lit(1.0) - pp)) *
      ((lit(1.0) / col("n_a")) + (lit(1.0) / col("n_b")))
    val delta = col("c_a").cast("double") / col("n_a") -
      col("c_b").cast("double") / col("n_b")
    val tau2 = lit(SeqTau2)
    def logLambda = lit(0.5) * log(col("v") / (col("v") + tau2)) +
      col("delta") * col("delta") * tau2 /
        (lit(2.0) * col("v") * (col("v") + tau2))
    wide.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        delta.as("delta"), vv.as("v"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        col("delta"), col("v"),
        when(col("v") > 0.0, Exact.roundS(logLambda, 6)).as("log_lambda"))
      // p derives from the QUANTIZED log_lambda (not the raw libm ln
      // composition), so exp sees an engine-identical grid value — the
      // same discipline as perplexity's round-log2-before-pow.
      .withColumn("always_valid_p",
        when(col("log_lambda").isNotNull,
          Exact.roundS(least(lit(1.0), exp(-col("log_lambda"))), 6)))
      .withColumn("reject",
        coalesce(col("always_valid_p") < 0.05, lit(false)))
  }

  val sequentialTestSql: String = {
    import graft.core.{Exact, PortableHash}
    val h = PortableHash.duck("'ab|' || user_id")
    val t2 = SeqTau2
    val ll = s"0.5 * ln(v / (v + $t2)) + " +
      s"delta * delta * $t2 / (2.0 * v * (v + $t2))"
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
       |      > COUNT(*) THEN 1 ELSE 0 END AS conv,
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id
       |), v0 AS (
       |  SELECT variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c
       |  FROM u GROUP BY variant
       |), w AS (
       |  SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
       |  FROM (SELECT n, c FROM v0 WHERE variant = 'A') a,
       |       (SELECT n, c FROM v0 WHERE variant = 'B') b
       |), d AS (
       |  SELECT n_a, c_a, n_b, c_b,
       |    (CAST(c_a AS DOUBLE) / n_a) - (CAST(c_b AS DOUBLE) / n_b)
       |      AS delta,
       |    ((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
       |     (1.0 - (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)))) *
       |    ((1.0 / n_a) + (1.0 / n_b)) AS v
       |  FROM w
       |), d2 AS (
       |  SELECT n_a, c_a, n_b, c_b, delta, v,
       |    CASE WHEN v > 0.0 THEN ${Exact.duckRoundS(ll, 6)} END
       |      AS log_lambda
       |  FROM d
       |)
       |SELECT n_a, c_a, n_b, c_b, delta, v, log_lambda,
       |  ${Exact.duckRoundS("least(1.0, exp(-log_lambda))", 6)}
       |    AS always_valid_p,
       |  COALESCE(${Exact.duckRoundS(
           "least(1.0, exp(-log_lambda))", 6)} < 0.05, false) AS reject
       |FROM d2""".stripMargin
  }

  // ---------------------------------------------------- #327 CUPED

  /** #327: CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) —
    * the third member of the experimentation stack: #215 tests, #324
    * de-trends, CUPED makes the SAME experiment decisive with less
    * data by regressing out pre-period behavior. Adjusted metric
    * Y' = Y − θ(X − E[X]) with θ = cov(X,Y)/var(X), X = the user's
    * pre-period value sum, Y = post-period: whatever Y-variance the
    * pre-period covariate explains is removed (often 30-50% in
    * practice), shrinking required sample size by the same factor —
    * at 100 TB this IS the cost lever: a 40% variance cut is 40% less
    * traffic held in an experiment. θ pools both arms (standard —
    * randomization makes X arm-independent); the per-arm var(Y')
    * collapses algebraically to var(Y) − 2θ·cov + θ²·var(X), so NO
    * second data pass is needed: everything reads off one user-level
    * aggregate's quantized moment sums, and every derived value is a
    * fixed literal IEEE tree over exact cent-grid integers — engine-
    * identical with no quantization of intermediates.
    *
    * Scale: one groupBy(user) pass (map-side combining) → per-arm
    * 5-moment rollup onto 2 cells → broadcast pooled scalars. Nothing
    * data-scale moves after the first aggregate.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{Exact, PortableHash}
    val e = eventsS(spark, dir)
      .select(col("user_id"), col("value"), expr("ts_s DIV 86400").as("day"))
    val span = e.agg(min("day").as("d0"), max("day").as("d1"))
      .select(expr("(d0 + d1 + 1) DIV 2").as("cut"))
    val users = e.crossJoin(broadcast(span))
      .groupBy("user_id")
      .agg(
        Exact.decSum(when(col("day") < col("cut"), col("value"))
          .otherwise(0.0), 2).as("x"),
        Exact.decSum(when(col("day") >= col("cut"), col("value"))
          .otherwise(0.0), 2).as("y"))
      .withColumn("arm",
        when(PortableHash.pHash(concat(lit("ab|"), col("user_id"))) % 2 === 0,
          "A").otherwise("B"))
    // per-arm and pooled quantized moment sums (x,y are cent-exact, so
    // products sit on the 1e-4 grid — decSum(4) keeps sums order-free)
    val arms = users.groupBy("arm").agg(
      count(lit(1)).as("n"),
      Exact.decSum(col("x"), 2).as("sx"),
      Exact.decSum(col("y"), 2).as("sy"),
      Exact.decSum(col("x") * col("x"), 4).as("sxx"),
      Exact.decSum(col("y") * col("y"), 4).as("syy"),
      Exact.decSum(col("x") * col("y"), 4).as("sxy"))
    val pooled = users.agg(
      count(lit(1)).as("pn"),
      Exact.decSum(col("x"), 2).as("psx"),
      Exact.decSum(col("y"), 2).as("psy"),
      Exact.decSum(col("x") * col("x"), 4).as("psxx"),
      Exact.decSum(col("x") * col("y"), 4).as("psxy"))
    val mpx = col("psx") / col("pn")
    val theta = (col("psxy") / col("pn") - mpx * (col("psy") / col("pn"))) /
      (col("psxx") / col("pn") - mpx * mpx)
    val mx = col("sx") / col("n")
    val my = col("sy") / col("n")
    val varY = col("syy") / col("n") - my * my
    val varX = col("sxx") / col("n") - mx * mx
    val covXY = col("sxy") / col("n") - mx * my
    val varAdj = varY - lit(2.0) * col("theta") * covXY +
      col("theta") * col("theta") * varX
    arms.crossJoin(broadcast(pooled.select(theta.as("theta"), mpx.as("mpx"))))
      .select(col("arm"), col("n"), col("theta"),
        my.as("mean_y"),
        (my - col("theta") * (mx - col("mpx"))).as("mean_y_adj"),
        varY.as("var_y"), varAdj.as("var_y_adj"),
        (lit(1.0) - varAdj / varY).as("var_reduction"))
  }

  val cupedSql: String = {
    import graft.core.{Exact, PortableHash}
    val h = PortableHash.duck("'ab|' || user_id")
    s"""WITH e AS (
       |  SELECT user_id, value, ($duckTsS // 86400) AS day FROM events
       |), span AS (
       |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS cut FROM e
       |), users AS (
       |  SELECT user_id,
       |    ${Exact.duckSum("CASE WHEN day < cut THEN value ELSE 0.0 END", 2)} AS x,
       |    ${Exact.duckSum("CASE WHEN day >= cut THEN value ELSE 0.0 END", 2)} AS y,
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS arm
       |  FROM e, span GROUP BY user_id
       |), arms AS (
       |  SELECT arm, COUNT(*) AS n,
       |    ${Exact.duckSum("x", 2)} AS sx, ${Exact.duckSum("y", 2)} AS sy,
       |    ${Exact.duckSum("x * x", 4)} AS sxx,
       |    ${Exact.duckSum("y * y", 4)} AS syy,
       |    ${Exact.duckSum("x * y", 4)} AS sxy
       |  FROM users GROUP BY arm
       |), pooled AS (
       |  SELECT
       |    ((psxy / pn) - (psx / pn) * (psy / pn)) /
       |      ((psxx / pn) - (psx / pn) * (psx / pn)) AS theta,
       |    psx / pn AS mpx
       |  FROM (
       |    SELECT COUNT(*) AS pn,
       |      ${Exact.duckSum("x", 2)} AS psx, ${Exact.duckSum("y", 2)} AS psy,
       |      ${Exact.duckSum("x * x", 4)} AS psxx,
       |      ${Exact.duckSum("x * y", 4)} AS psxy
       |    FROM users)
       |)
       |SELECT arm, n, theta,
       |  sy / n AS mean_y,
       |  (sy / n) - theta * ((sx / n) - mpx) AS mean_y_adj,
       |  (syy / n) - (sy / n) * (sy / n) AS var_y,
       |  ((syy / n) - (sy / n) * (sy / n)) - 2.0 * theta *
       |    ((sxy / n) - (sx / n) * (sy / n)) +
       |    theta * theta * ((sxx / n) - (sx / n) * (sx / n)) AS var_y_adj,
       |  1.0 - (((syy / n) - (sy / n) * (sy / n)) - 2.0 * theta *
       |    ((sxy / n) - (sx / n) * (sy / n)) +
       |    theta * theta * ((sxx / n) - (sx / n) * (sx / n)))
       |    / ((syy / n) - (sy / n) * (sy / n)) AS var_reduction
       |FROM arms, pooled""".stripMargin
  }

  val diffInDiffSql: String = {
    import graft.core.{Exact, PortableHash}
    val h = PortableHash.duck("'ab|' || user_id")
    s"""WITH e AS (
       |  SELECT user_id, value, ($duckTsS // 86400) AS day FROM events
       |), span AS (
       |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS cut FROM e
       |), cells AS (
       |  SELECT
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
       |    CASE WHEN day >= cut THEN 'post' ELSE 'pre' END AS period,
       |    COUNT(*) AS n, ${Exact.duckSum("value", 2)} AS sv
       |  FROM e, span GROUP BY 1, 2
       |), wide AS (
       |  SELECT
       |    MAX(CASE WHEN arm = 'A' AND period = 'pre' THEN n END) AS n_a_pre,
       |    MAX(CASE WHEN arm = 'A' AND period = 'pre' THEN sv END) AS s_a_pre,
       |    MAX(CASE WHEN arm = 'A' AND period = 'post' THEN n END) AS n_a_post,
       |    MAX(CASE WHEN arm = 'A' AND period = 'post' THEN sv END) AS s_a_post,
       |    MAX(CASE WHEN arm = 'B' AND period = 'pre' THEN n END) AS n_b_pre,
       |    MAX(CASE WHEN arm = 'B' AND period = 'pre' THEN sv END) AS s_b_pre,
       |    MAX(CASE WHEN arm = 'B' AND period = 'post' THEN n END) AS n_b_post,
       |    MAX(CASE WHEN arm = 'B' AND period = 'post' THEN sv END) AS s_b_post
       |  FROM cells
       |)
       |SELECT CAST(n_a_pre AS BIGINT) AS n_a_pre,
       |  CAST(n_a_post AS BIGINT) AS n_a_post,
       |  CAST(n_b_pre AS BIGINT) AS n_b_pre,
       |  CAST(n_b_post AS BIGINT) AS n_b_post,
       |  s_a_pre / n_a_pre AS mean_a_pre,
       |  s_a_post / n_a_post AS mean_a_post,
       |  s_b_pre / n_b_pre AS mean_b_pre,
       |  s_b_post / n_b_post AS mean_b_post,
       |  (s_b_post / n_b_post - s_b_pre / n_b_pre)
       |    - (s_a_post / n_a_post - s_a_pre / n_a_pre) AS did
       |FROM wide""".stripMargin
  }

  // --------------------------------------- #336 quantile treatment effects

  /** #336: QUANTILE TREATMENT EFFECTS — the distributional readout of
    * the experiment stack: #215/#335 test a MEAN (conversion rate),
    * but heavy-tailed value metrics (revenue per user) routinely move
    * in the tail while the median sits still, or vice versa — the
    * standard econometrics practice (Koenker & Bassett's quantile
    * lens) is to report the per-quantile difference q_B(p) − q_A(p)
    * at p ∈ {25, 50, 75, 90} of the USER-level metric. One experiment
    * readout, four rows: where in the distribution the treatment acts.
    *
    * Exactness: the user metric is the cent-grid integer sum of the
    * user's event values (order-free); quantiles are #108's
    * nearest-rank picks over a (variant, cent)-keyed histogram —
    * integer compares, no interpolation — and the effect is one
    * subtraction of two grid doubles. Scale: one map-side-combining
    * user rollup (the #215 shuffle), then a histogram bounded by the
    * occupied cent grid per variant, windows partitioned by variant,
    * output bounded by the quantile list.
    */
  /** The user-level cent-grid metric with its hash arm — shared by the
    * point QTE (#336) and its bootstrap CI (#339).
    */
  private def qabUsers(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.PortableHash
    eventsS(spark, dir)
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100.0 + lit(0.5)).cast("long")).as("ui"))
      .withColumn("variant",
        when(PortableHash.pHash(concat(lit("ab|"), col("user_id"))) % 2 === 0,
          "A").otherwise("B"))
  }

  def quantileAb(spark: SparkSession, dir: String): DataFrame = {
    val users = qabUsers(spark, dir)
    val hist = users.groupBy("variant", "ui").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("variant").orderBy("ui")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("variant")
    def pick(p: Int) =
      (min(when(col("cum") >= expr(s"(n * $p + 99) DIV 100"), col("ui")))
        / 100.0).as(s"q$p")
    val qs = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("variant")
      .agg(max("n").as("n_users"), pick(25), pick(50), pick(75), pick(90))
    val wide = qs.filter(col("variant") === "A")
      .select(col("n_users").as("n_a"), col("q25").as("q25_a"),
        col("q50").as("q50_a"), col("q75").as("q75_a"), col("q90").as("q90_a"))
      .crossJoin(broadcast(qs.filter(col("variant") === "B")
        .select(col("n_users").as("n_b"), col("q25").as("q25_b"),
          col("q50").as("q50_b"), col("q75").as("q75_b"),
          col("q90").as("q90_b"))))
    wide.selectExpr(
      """stack(4,
        |  25, n_a, n_b, q25_a, q25_b, q25_b - q25_a,
        |  50, n_a, n_b, q50_a, q50_b, q50_b - q50_a,
        |  75, n_a, n_b, q75_a, q75_b, q75_b - q75_a,
        |  90, n_a, n_b, q90_a, q90_b, q90_b - q90_a
        |) AS (p, n_a, n_b, q_a, q_b, qte)""".stripMargin)
  }

  val quantileAbSql: String = {
    import graft.core.PortableHash
    val h = PortableHash.duck("'ab|' || user_id")
    def pick(p: Int) =
      s"MIN(CASE WHEN cum >= (n * $p + 99) // 100 THEN ui END) / 100.0"
    s"""WITH u AS (
       |  SELECT user_id,
       |    CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS ui,
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id
       |), hist AS (
       |  SELECT variant, ui, COUNT(*) AS c FROM u GROUP BY 1, 2
       |), cum AS (
       |  SELECT variant, ui, c,
       |    SUM(c) OVER (PARTITION BY variant ORDER BY ui) AS cum,
       |    SUM(c) OVER (PARTITION BY variant) AS n
       |  FROM hist
       |), qs AS (
       |  SELECT variant, CAST(MAX(n) AS BIGINT) AS n_users,
       |    ${pick(25)} AS q25, ${pick(50)} AS q50,
       |    ${pick(75)} AS q75, ${pick(90)} AS q90
       |  FROM cum GROUP BY variant
       |), w AS (
       |  SELECT a.n_users AS n_a, b.n_users AS n_b,
       |    a.q25 AS q25_a, b.q25 AS q25_b, a.q50 AS q50_a, b.q50 AS q50_b,
       |    a.q75 AS q75_a, b.q75 AS q75_b, a.q90 AS q90_a, b.q90 AS q90_b
       |  FROM (SELECT * FROM qs WHERE variant = 'A') a,
       |       (SELECT * FROM qs WHERE variant = 'B') b
       |)
       |SELECT 25 AS p, n_a, n_b, q25_a AS q_a, q25_b AS q_b,
       |  q25_b - q25_a AS qte FROM w
       |UNION ALL SELECT 50, n_a, n_b, q50_a, q50_b, q50_b - q50_a FROM w
       |UNION ALL SELECT 75, n_a, n_b, q75_a, q75_b, q75_b - q75_a FROM w
       |UNION ALL SELECT 90, n_a, n_b, q90_a, q90_b, q90_b - q90_a FROM w""".stripMargin
  }

  // ------------------------------------------ #339 QTE bootstrap CI

  /** Bootstrap replicate count for the QTE interval — #283's constant;
    * as there, the CI indices derive from the REALIZED replicate count
    * (a replicate whose hash-even user subset is empty in either arm
    * drops out of the A⋈B join and must not shift the picks).
    */
  val QabCiB = 32

  /** #339: QUANTILE TREATMENT EFFECTS WITH A BOOTSTRAP CI (VERDICT r8
    * item 5) — #336 reports q_B(p)−q_A(p) with no interval, inviting
    * exactly the overclaiming readout Holm (#335) exists to prevent;
    * this attaches the experimentation family's house uncertainty
    * (#283's deterministic half-sampling bootstrap): replicate b keeps
    * the users with pHash("qb"|user|b) even, each replicate recomputes
    * the per-variant nearest-rank quantiles over its own histogram,
    * and the 90% interval per quantile is the nearest-rank
    * [⌈0.05·n⌉, ⌈0.95·n⌉] pick over the sorted replicate QTEs.
    *
    * Exactness: membership is integer hash parity; every replicate
    * quantile is a grid value read (integer compares, no
    * interpolation); qte_b is one subtraction of grid doubles; the CI
    * picks are value reads of a sorted ≤B-element list. Scale: the
    * replicate expansion is a bounded ×B generate over USER rows
    * (never events), one shuffle keyed (b, variant, ui) for the
    * histograms, windows partitioned by (b, variant), everything after
    * bounded by B×the occupied cent grid.
    */
  def quantileAbCi(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.PortableHash
    val reps = qabUsers(spark, dir)
      .select(col("user_id"), col("ui"), col("variant"),
        explode(sequence(lit(0), lit(QabCiB - 1))).as("b"))
      .filter(PortableHash.pHash(concat_ws("|",
        lit("qb"), col("user_id"), col("b"))) % 2 === 0)
    val hist = reps.groupBy("b", "variant", "ui").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("b", "variant").orderBy("ui")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("b", "variant")
    def pick(p: Int) =
      (min(when(col("cum") >= expr(s"(n * $p + 99) DIV 100"), col("ui")))
        / 100.0).as(s"q$p")
    val qs = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("b", "variant")
      .agg(pick(25), pick(50), pick(75), pick(90))
    val a = qs.filter(col("variant") === "A").select(col("b"),
      col("q25").as("a25"), col("q50").as("a50"),
      col("q75").as("a75"), col("q90").as("a90"))
    val bq = qs.filter(col("variant") === "B").select(col("b"),
      col("q25").as("b25"), col("q50").as("b50"),
      col("q75").as("b75"), col("q90").as("b90"))
    val long = a.join(bq, Seq("b")).selectExpr(
      """stack(4,
        |  25, b25 - a25,
        |  50, b50 - a50,
        |  75, b75 - a75,
        |  90, b90 - a90) AS (p, qte_b)""".stripMargin)
    val ci = long.groupBy("p").agg(
        sort_array(collect_list(col("qte_b"))).as("qsort"),
        count(lit(1)).as("n_replicates"))
      .select(col("p"), col("n_replicates"),
        element_at(col("qsort"),
          ceil(col("n_replicates") * 0.05).cast("int")).as("qte_lo"),
        element_at(col("qsort"),
          ceil(col("n_replicates") * 0.95).cast("int")).as("qte_hi"))
    quantileAb(spark, dir).join(broadcast(ci), Seq("p"))
      .select(col("p"), col("n_a"), col("n_b"), col("q_a"), col("q_b"),
        col("qte"), col("n_replicates"), col("qte_lo"), col("qte_hi"))
  }

  val quantileAbCiSql: String = {
    import graft.core.PortableHash
    val hArm = PortableHash.duck("'ab|' || user_id")
    val hRep = PortableHash.duck("'qb|' || user_id || '|' || b")
    def pick(p: Int) =
      s"MIN(CASE WHEN cum >= (n * $p + 99) // 100 THEN ui END) / 100.0 AS q$p"
    def basePick(p: Int) =
      s"MIN(CASE WHEN cum >= (n * $p + 99) // 100 THEN ui END) / 100.0"
    s"""WITH u AS (
       |  SELECT user_id,
       |    CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS ui,
       |    CASE WHEN $hArm % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id
       |), bhist AS (
       |  SELECT b, variant, ui, COUNT(*) AS c
       |  FROM u, (SELECT unnest(range(0, $QabCiB)) AS b)
       |  WHERE $hRep % 2 = 0
       |  GROUP BY 1, 2, 3
       |), bcum AS (
       |  SELECT b, variant, ui, c,
       |    SUM(c) OVER (PARTITION BY b, variant ORDER BY ui) AS cum,
       |    SUM(c) OVER (PARTITION BY b, variant) AS n
       |  FROM bhist
       |), bqs AS (
       |  SELECT b, variant, ${pick(25)}, ${pick(50)}, ${pick(75)}, ${pick(90)}
       |  FROM bcum GROUP BY b, variant
       |), blong AS (
       |  SELECT a.b, 25 AS p, bb.q25 - a.q25 AS qte_b
       |  FROM (SELECT * FROM bqs WHERE variant = 'A') a
       |  JOIN (SELECT * FROM bqs WHERE variant = 'B') bb USING (b)
       |  UNION ALL SELECT a.b, 50, bb.q50 - a.q50
       |  FROM (SELECT * FROM bqs WHERE variant = 'A') a
       |  JOIN (SELECT * FROM bqs WHERE variant = 'B') bb USING (b)
       |  UNION ALL SELECT a.b, 75, bb.q75 - a.q75
       |  FROM (SELECT * FROM bqs WHERE variant = 'A') a
       |  JOIN (SELECT * FROM bqs WHERE variant = 'B') bb USING (b)
       |  UNION ALL SELECT a.b, 90, bb.q90 - a.q90
       |  FROM (SELECT * FROM bqs WHERE variant = 'A') a
       |  JOIN (SELECT * FROM bqs WHERE variant = 'B') bb USING (b)
       |), ci AS (
       |  SELECT p, list_sort(list(qte_b)) AS l,
       |    COUNT(*) AS n_replicates
       |  FROM blong GROUP BY p
       |), hist AS (
       |  SELECT variant, ui, COUNT(*) AS c FROM u GROUP BY 1, 2
       |), cum AS (
       |  SELECT variant, ui, c,
       |    SUM(c) OVER (PARTITION BY variant ORDER BY ui) AS cum,
       |    SUM(c) OVER (PARTITION BY variant) AS n
       |  FROM hist
       |), qs AS (
       |  SELECT variant, CAST(MAX(n) AS BIGINT) AS n_users,
       |    ${basePick(25)} AS q25, ${basePick(50)} AS q50,
       |    ${basePick(75)} AS q75, ${basePick(90)} AS q90
       |  FROM cum GROUP BY variant
       |), w AS (
       |  SELECT a.n_users AS n_a, b.n_users AS n_b,
       |    a.q25 AS q25_a, b.q25 AS q25_b, a.q50 AS q50_a, b.q50 AS q50_b,
       |    a.q75 AS q75_a, b.q75 AS q75_b, a.q90 AS q90_a, b.q90 AS q90_b
       |  FROM (SELECT * FROM qs WHERE variant = 'A') a,
       |       (SELECT * FROM qs WHERE variant = 'B') b
       |), base AS (
       |  SELECT 25 AS p, n_a, n_b, q25_a AS q_a, q25_b AS q_b,
       |    q25_b - q25_a AS qte FROM w
       |  UNION ALL SELECT 50, n_a, n_b, q50_a, q50_b, q50_b - q50_a FROM w
       |  UNION ALL SELECT 75, n_a, n_b, q75_a, q75_b, q75_b - q75_a FROM w
       |  UNION ALL SELECT 90, n_a, n_b, q90_a, q90_b, q90_b - q90_a FROM w
       |)
       |SELECT base.p, n_a, n_b, q_a, q_b, qte, n_replicates,
       |  l[CAST(ceil(n_replicates * 0.05) AS INT)] AS qte_lo,
       |  l[CAST(ceil(n_replicates * 0.95) AS INT)] AS qte_hi
       |FROM base JOIN ci ON base.p = ci.p""".stripMargin
  }

  // --------------------------------------- #335 Holm-corrected AB family

  /** Holm step-down critical |z| values: index k = number of remaining
    * hypotheses, crit(k) = Φ⁻¹(1 − α/(2k)) at α = 0.05 — pinned
    * CONSTANTS (JVM doubles interpolated into both engines), covering
    * any family up to 10 metrics; the events schema has 5 types.
    */
  val HolmCrit: Seq[Double] = Seq(
    1.9599639845400536, 2.2414027276049464, 2.3939797998185104,
    2.4977054744123737, 2.5758293035489, 2.638257273476751,
    2.690109527158866, 2.734368786533176, 2.772921294608662,
    2.8070337683438114)

  /** #335: the #215 two-proportion z-test run as a FAMILY — one test per
    * event type (metric: the user's share of type-t activity exceeds
    * 1/5) — with HOLM step-down multiple-testing control (Holm 1979):
    * five looks at α=0.05 inflate the family false-positive rate to
    * ~23%, the classic dashboard failure #329's peeking fix does not
    * cover (that one is looks-over-TIME; this is looks-across-METRICS).
    * Tests are ranked by |z| (descending, grid-quantized, type
    * tiebreak); test at rank i must clear crit(m−i+1), and rejection
    * stops at the first failure — the sequential prefix-AND.
    *
    * Spark-first (and PlanGuard-safe): the family frame is ≤|types|
    * rows, so rank and prefix-AND run as two broadcast self-joins
    * (count-of-better and all-pass-below), never a single-partition
    * window over an unbounded frame. Per-user metrics come from ONE
    * (user × type) aggregate against a broadcast type list so absent
    * combinations count as non-converted. z chains are #215's literal
    * trees verbatim; the unpowered / degenerate guard mirrors #215
    * (unpowered tests are excluded from the family m, reported with
    * null rank and reject = false).
    */
  def abHolm(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{Exact, PortableHash}
    val e = eventsS(spark, dir)
    // r10 (guide §2.3/§2.4): ONE scan+aggregate of events — the user
    // totals and the type list both derive from the (user, type) counts
    // (ne = Σ_t nt; checkpointed so the three consumers don't each
    // re-run the events aggregate). Previously u / ty / ut were three
    // independent full scans.
    val ut = e.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("nt")).localCheckpoint(false)
    val u = ut.groupBy("user_id").agg(sum("nt").as("ne"))
    val ty = ut.select("event_type").distinct()
    // The old users×types crossJoin materialized |users|·|types| rows
    // only to count them back down. But n per (type, variant) is just
    // the variant's TOTAL user count (absent (user, type) pairs never
    // convert: nt=0 ⇒ conv=0 since ne ≥ 1), so aggregate
    // users-per-variant and converters-per-(type, variant) separately
    // and re-attach on the ≤|types|×2-row grid — identical (n, c)
    // table, one user-scale shuffle less and no 5× row blowup.
    val uv = u.withColumn("variant",
      when(PortableHash.pHash(concat(lit("ab|"), col("user_id"))) % 2 === 0,
        "A").otherwise("B"))
    val nv = uv.groupBy("variant").agg(count(lit(1)).as("n"))
    val conv = ut.join(uv, Seq("user_id"))
      .filter(col("nt") * 5L > col("ne"))
      .groupBy("event_type", "variant").agg(count(lit(1)).as("c"))
    val v = ty.crossJoin(broadcast(nv))
      .join(conv, Seq("event_type", "variant"), "left")
      .select(col("event_type"), col("variant"), col("n"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wide = v.filter(col("variant") === "A")
      .select(col("event_type"), col("n").as("n_a"), col("c").as("c_a"))
      .join(v.filter(col("variant") === "B")
        .select(col("event_type"), col("n").as("n_b"), col("c").as("c_b")),
        "event_type")
    val pa = col("c_a").cast("double") / col("n_a")
    val pb = col("c_b").cast("double") / col("n_b")
    val pp = (col("c_a") + col("c_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt((pp * (lit(1.0) - pp)) *
      ((lit(1.0) / col("n_a")) + (lit(1.0) / col("n_b"))))
    // r10: checkpoint the ≤|types|-row `tests` frame itself, not just
    // the fam slice — the final select re-joins `tests`, and without
    // the cut its whole upstream (user aggregate, converter join) was
    // analyzed and EXECUTED a second time per run (guide §3.3:
    // materialising an intermediate truncates the plan).
    val tests = wide
      .withColumn("powered", col("n_a") >= 30L && col("n_b") >= 30L)
      .withColumn("z",
        when(col("powered") && se > 0.0, Exact.roundS((pa - pb) / se, 6)))
      .withColumn("absz", abs(col("z")))
      .localCheckpoint(false)
    val fam = tests.filter(col("z").isNotNull)
      .select("event_type", "absz")
    // rank = 1 + |{better tests}|; ties break on event_type — a
    // ≤|types|² broadcast self-join, not an unpartitioned window
    val ranked = fam.join(broadcast(
        fam.select(col("event_type").as("ty"), col("absz").as("az"))),
        col("az") > col("absz") ||
          (col("az") === col("absz") && col("ty") < col("event_type")),
        "left")
      .groupBy("event_type").agg((count(col("ty")) + 1L).as("rank"))
    val m1 = fam.agg(count(lit(1)).as("m"))
    val critExpr = HolmCrit.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (c, i)) => when(col("k") === (i + 1).toLong, lit(c)).otherwise(acc)
    }
    val withCrit = fam.join(ranked, "event_type").crossJoin(broadcast(m1))
      .withColumn("k", col("m") - col("rank") + 1L)
      .withColumn("crit", critExpr)
      .withColumn("pass", col("absz") >= col("crit"))
    // sequential step-down: reject i iff EVERY rank ≤ i passes
    val holm = withCrit.join(broadcast(
        withCrit.select(col("rank").as("r2"), col("pass").as("p2"))),
        col("r2") <= col("rank"))
      .groupBy("event_type")
      .agg((min(col("p2").cast("int")) === 1).as("reject_holm"))
    tests
      .join(withCrit.select("event_type", "m", "rank", "crit"),
        Seq("event_type"), "left")
      .join(holm, Seq("event_type"), "left")
      .select(col("event_type"), col("n_a"), col("c_a"), col("n_b"),
        col("c_b"), col("z"), col("m"), col("rank"), col("crit"),
        coalesce(abs(col("z")) > lit(1.9599639845400536), lit(false))
          .as("reject_unadjusted"),
        coalesce(col("reject_holm"), lit(false)).as("reject_holm"))
  }

  val abHolmSql: String = {
    import graft.core.{Exact, PortableHash}
    val h = PortableHash.duck("'ab|' || u.user_id")
    val critCase = HolmCrit.zipWithIndex
      .map { case (c, i) => s"WHEN ${i + 1} THEN $c" }.mkString(" ")
    s"""WITH u AS (
       |  SELECT user_id, COUNT(*) AS ne FROM events GROUP BY 1
       |), ty AS (SELECT DISTINCT event_type FROM events),
       |ut AS (
       |  SELECT user_id, event_type, COUNT(*) AS nt
       |  FROM events GROUP BY 1, 2
       |), base AS (
       |  SELECT t.event_type,
       |    CASE WHEN COALESCE(x.nt, 0) * 5 > u.ne THEN 1 ELSE 0 END AS conv,
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM u CROSS JOIN ty t
       |  LEFT JOIN ut x ON x.user_id = u.user_id AND x.event_type = t.event_type
       |), v AS (
       |  SELECT event_type, variant, COUNT(*) AS n,
       |    CAST(SUM(conv) AS BIGINT) AS c
       |  FROM base GROUP BY 1, 2
       |), w AS (
       |  SELECT a.event_type, a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
       |  FROM (SELECT * FROM v WHERE variant = 'A') a
       |  JOIN (SELECT * FROM v WHERE variant = 'B') b USING (event_type)
       |), tests AS (
       |  SELECT event_type, n_a, c_a, n_b, c_b,
       |    CASE WHEN n_a >= 30 AND n_b >= 30 AND
       |      sqrt(((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
       |            (1.0 - (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)))) *
       |           ((1.0 / n_a) + (1.0 / n_b))) > 0.0
       |    THEN ${Exact.duckRoundS(
             """((CAST(c_a AS DOUBLE) / n_a) - (CAST(c_b AS DOUBLE) / n_b))
               | / sqrt(((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
               |         (1.0 - (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)))) *
               |        ((1.0 / n_a) + (1.0 / n_b)))""".stripMargin, 6)}
       |    END AS z
       |  FROM w
       |), fam AS (
       |  SELECT event_type, abs(z) AS absz,
       |    ROW_NUMBER() OVER (ORDER BY abs(z) DESC, event_type) AS rank,
       |    COUNT(*) OVER () AS m
       |  FROM tests WHERE z IS NOT NULL
       |), hc AS (
       |  SELECT *, CASE m - rank + 1 $critCase END AS crit FROM fam
       |), hp AS (
       |  SELECT *,
       |    MIN(CASE WHEN absz >= crit THEN 1 ELSE 0 END)
       |      OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS allpass
       |  FROM hc
       |)
       |SELECT t.event_type, t.n_a, t.c_a, t.n_b, t.c_b, t.z,
       |  h.m, h.rank, h.crit,
       |  COALESCE(abs(t.z) > 1.9599639845400536, FALSE)
       |    AS reject_unadjusted,
       |  COALESCE(h.allpass = 1, FALSE) AS reject_holm
       |FROM tests t LEFT JOIN hp h USING (event_type)""".stripMargin
  }

  // ------------------------------------------- #333 changepoint detect

  /** #333: SINGLE-CHANGEPOINT DETECTION per event type — the binary-
    * segmentation step (the building block CBS/PELT iterate): over the
    * daily value-sum series, the split k maximizing the between-segment
    * variance reduction gain(k) = n₁n₂/n·(μ₁−μ₂)², reported with the
    * pre/post means — the "WHEN did the level shift" readout that
    * complements #187's CUSUM "has it drifted" alarm and #284's
    * seasonal-residual anomalies ("which days are off"). A monitoring
    * stack pages on CUSUM and then runs exactly this to timestamp and
    * size the shift.
    *
    * Exactness: daily sums on the 1e-6 integer grid (order-free);
    * gain's numerator (S₁·n₂ − S₂·n₁) stays INTEGER inside
    * DECIMAL(38,0) (int64 would overflow at (Σ·n)² scale), one
    * correctly-rounded cast to double, then fixed literal-order IEEE
    * ops; gain quantized back to the 1e-6 grid so the per-type argmax
    * (ties → earliest day) is engine-deterministic. Scale: one
    * map-side-combining daily rollup (same shuffle as #187), windows
    * partitioned by type over the ≤|days| frame, argmax a second tiny
    * window — nothing data-scale moves after the first aggregate.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Exact
    val e = Tables.events(spark, dir)
    val daily = e
      .select(col("event_type"),
        expr(s"${tsNanos(e)} DIV $NsPerDay").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sv"))
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
    val t = daily
      .withColumn("k", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("st", sum("sv").over(byType))
      .withColumn("s1", sum("sv").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("k") < col("n")) // split AFTER day k: [1..k] vs [k+1..n]
      .withColumn("n1", col("k"))
      .withColumn("n2", col("n") - col("k"))
      // d = (S₁·n₂ − S₂·n₁) / grid — exact integer diff in DECIMAL(38,0)
      .withColumn("d",
        (col("s1").cast("decimal(38,0)") * col("n2")
          - (col("st") - col("s1")).cast("decimal(38,0)") * col("n1"))
          .cast("double") / lit(1e6))
      .withColumn("gain", Exact.roundS(
        col("d") * col("d")
          / (col("n1") * col("n2") * col("n")).cast("double"), 6))
    t.withColumn("r", row_number().over(
        byType.orderBy(col("gain").desc, col("day").asc)))
      .filter(col("r") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("n1").cast("long").as("n_pre"), col("n2").cast("long").as("n_post"),
        Exact.roundS(col("s1").cast("double") / col("n1") / lit(1e6), 6)
          .as("mean_pre"),
        Exact.roundS((col("st") - col("s1")).cast("double") / col("n2")
          / lit(1e6), 6).as("mean_post"),
        col("gain"))
  }

  val changepointSql: String = {
    import graft.core.Exact
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // $NsPerDay AS day,
       |    CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS sv
       |  FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n,
       |    CAST(SUM(sv) OVER (PARTITION BY event_type) AS BIGINT) AS st,
       |    CAST(SUM(sv) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
       |  FROM daily
       |), g AS (
       |  SELECT event_type, day, k AS n1, n - k AS n2, st, s1,
       |    CAST(CAST(s1 AS DECIMAL(38,0)) * (n - k)
       |      - CAST(st - s1 AS DECIMAL(38,0)) * k AS DOUBLE)
       |      / 1000000.0 AS d,
       |    n
       |  FROM t WHERE k < n
       |), gg AS (
       |  SELECT *, ${Exact.duckRoundS(
             "d * d / CAST(n1 * n2 * n AS DOUBLE)", 6)} AS gain
       |  FROM g
       |)
       |SELECT event_type, day AS cp_day, n1 AS n_pre, n2 AS n_post,
       |  ${Exact.duckRoundS("CAST(s1 AS DOUBLE) / n1 / 1000000.0", 6)}
       |    AS mean_pre,
       |  ${Exact.duckRoundS(
           "CAST(st - s1 AS DOUBLE) / n2 / 1000000.0", 6)} AS mean_post,
       |  gain
       |FROM gg
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
       |  ORDER BY gain DESC, day ASC) = 1""".stripMargin
  }

  // ------------------------------------ #338 multi-shift changepoints

  /** Recursion depth bound: binary segmentation at depth d can emit up
    * to 2^d−1 changepoints; 3 levels (≤7 shifts per series) covers the
    * monitoring use ("this series re-leveled twice this quarter") while
    * keeping the unrolled plan bounded.
    */
  val CpMaxDepth = 3

  /** CBS-style F acceptance: a split is accepted iff the explained
    * variance clears gain·(n−2) ≥ C·(SSE−gain) — i.e. the split's
    * t² ≥ C — with C = 4 (|t| ≥ 2). In exact grid integers:
    * d²·(n−2+C) ≥ C·n₁·n₂·(n·Σv²−S²), so the accept/reject decision is
    * an integer compare, identical in both engines.
    */
  val CpAcceptC = 4

  /** Segments shorter than this are not split further (an F test on
    * n < 4 has no residual degrees of freedom to speak of).
    */
  val CpMinSeg = 4

  private val cpDailyCache =
    new graft.core.DfCache[(SparkSession, String)]()

  /** The per-type daily grid series with its within-type day rank —
    * computed once per (session, dir) and shared by the recursion
    * levels (at 100 TB this is the one data-scale rollup; everything
    * after runs on ≤\|types\|·\|days\| rows).
    */
  private def cpIndexedDaily(spark: SparkSession, dir: String): DataFrame =
    cpDailyCache.getOrElseUpdate((spark, dir)) {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(spark, dir)
      e.select(col("event_type"),
          expr(s"${tsNanos(e)} DIV $NsPerDay").as("day"), col("value"))
        .groupBy("event_type", "day")
        .agg(sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sv"))
        .withColumn("k", row_number().over(
          Window.partitionBy("event_type").orderBy("day")).cast("long"))
    }

  /** One binary-segmentation level over a (event_type, lo, hi) segment
    * frame: per segment, #333's argmax split (quantized-gain order, day
    * tiebreak), then the exact-integer F acceptance. Emits the accepted
    * split rows with all the segment stats still attached.
    */
  private def cpBestSplits(idx: DataFrame, segs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Exact
    val segKey = Seq(col("event_type"), col("lo"), col("hi"))
    val w = Window.partitionBy(segKey: _*)
    val wCum = Window.partitionBy(segKey: _*).orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx.join(broadcast(segs), Seq("event_type"))
      .filter(col("k").between(col("lo"), col("hi")))
      .withColumn("n", col("hi") - col("lo") + 1)
      .withColumn("st", sum("sv").over(w).cast("decimal(38,0)"))
      .withColumn("svv",
        sum(col("sv").cast("decimal(38,0)") * col("sv")).over(w)
          .cast("decimal(38,0)"))
      .withColumn("s1", sum("sv").over(wCum).cast("decimal(38,0)"))
      .filter(col("k") < col("hi"))
      .withColumn("n1", col("k") - col("lo") + 1)
      .withColumn("n2", col("hi") - col("k"))
      // d = S₁·n₂ − S₂·n₁ in grid units, exact in DECIMAL(38,0)
      .withColumn("ddec",
        col("s1") * col("n2") - (col("st") - col("s1")) * col("n1"))
      .withColumn("d", col("ddec").cast("double") / lit(1e6))
      .withColumn("gain", Exact.roundS(col("d") * col("d")
        / (col("n1") * col("n2") * col("n")).cast("double"), 6))
      // n·SSE = n·Σv² − S², exact in grid² units
      .withColumn("ssen",
        col("n").cast("decimal(38,0)") * col("svv") - col("st") * col("st"))
      .withColumn("r", row_number().over(
        Window.partitionBy(segKey: _*).orderBy(col("gain").desc, col("day").asc)))
      .filter(col("r") === 1)
      // Acceptance as a pure integer inequality. Guard (ADVICE r9): on
      // DECIMAL(38,0) overflow non-ANSI Spark yields NULL and the
      // filter would silently NOT-split, while the oracle's HUGEINT
      // raises — so an out-of-bound corpus must raise HERE too, making
      // the engines share a failure mode instead of silently diverging
      // near the documented 1e38 grid bound.
      .withColumn("acc_lhs", col("ddec") * col("ddec")
        * (col("n") + lit(CpAcceptC - 2)).cast("decimal(38,0)"))
      .withColumn("acc_rhs", lit(CpAcceptC)
        * (col("n1") * col("n2")).cast("decimal(38,0)") * col("ssen"))
      .filter(when(col("acc_lhs").isNull || col("acc_rhs").isNull,
          raise_error(lit("changepoint acceptance overflowed DECIMAL(38,0): " +
            "series exceeds the documented 1e38 grid bound")))
        .otherwise(col("ssen") > 0 && col("acc_lhs") >= col("acc_rhs")))
      .drop("acc_lhs", "acc_rhs")
  }

  /** #338: MULTI-SHIFT CHANGEPOINT DETECTION — circular binary
    * segmentation's recursion (the shape CBS/PELT iterate; VERDICT r8
    * item 4) over #333's single-split primitive: find the best split of
    * each segment, ACCEPT it only if its F statistic clears the pinned
    * threshold (t² ≥ [[CpAcceptC]] — real monitors must not split
    * noise), recurse on both children (depth ≤ [[CpMaxDepth]], child
    * length ≥ [[CpMinSeg]]). A series that re-leveled twice gets BOTH
    * days; #333 by construction reports only the larger one.
    *
    * Exactness: #333's decimal algebra per segment (daily sums on the
    * 1e-6 grid; d = S₁n₂−S₂n₁ integer in DECIMAL(38,0); gain quantized
    * for the argmax), plus the acceptance as a pure integer inequality
    * d²(n−2+C) ≥ C·n₁n₂·(nΣv²−S²) — DECIMAL(38,0) here, HUGEINT in the
    * oracle, both exact. (Bound: d² needs < 1e38 — daily grid sums to
    * ~1e17 with years of days; beyond that, coarsen the value grid.)
    * Scale: ONE map-side-combining daily rollup (cached per session),
    * then every level runs on ≤\|types\|·\|days\| rows — type-partitioned
    * windows, a broadcast segment join, nothing data-scale moves.
    */
  def changepointsMulti(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val idx = cpIndexedDaily(spark, dir)
    var segs = idx.groupBy("event_type")
      .agg(min("k").as("lo"), max("k").as("hi"))
    val levels = Seq.newBuilder[DataFrame]
    for (depth <- 1 to CpMaxDepth) {
      // r10 (guide §3.3): checkpoint each level's accepted splits
      // (≤ 2^depth·|types| rows). Without the cut, level d's plan
      // re-contained levels 1..d−1 BOTH via the segment derivation and
      // via the output union, so the window/join machinery of level 1
      // executed at every deeper level (1+2+3 executions for depth 3).
      val acc = cpBestSplits(idx, segs).localCheckpoint(false)
      levels += acc.select(lit(depth).as("depth"), col("event_type"),
        col("day").as("cp_day"), col("n1").as("n_pre"), col("n2").as("n_post"),
        Exact.roundS(col("s1").cast("double") / col("n1") / lit(1e6), 6)
          .as("mean_pre"),
        Exact.roundS((col("st") - col("s1")).cast("double") / col("n2")
          / lit(1e6), 6).as("mean_post"),
        col("gain"))
      if (depth < CpMaxDepth) {
        val left = acc.select(col("event_type"), col("lo"), col("k").as("hi"))
        val right = acc.select(col("event_type"), (col("k") + 1).as("lo"),
          col("hi"))
        segs = left.unionByName(right)
          .filter(col("hi") - col("lo") + 1 >= CpMinSeg)
      }
    }
    levels.result().reduce(_ unionByName _)
  }

  val changepointsMultiSql: String = {
    import graft.core.Exact
    // one recursion level: best accepted split per (event_type, lo, hi)
    def level(i: Int, segCte: String): String =
      s"""cand$i AS (
         |  SELECT i.event_type, i.day, i.k, s.lo, s.hi,
         |    s.hi - s.lo + 1 AS n,
         |    CAST(SUM(i.sv) OVER
         |      (PARTITION BY i.event_type, s.lo, s.hi) AS HUGEINT) AS st,
         |    CAST(SUM(CAST(i.sv AS HUGEINT) * i.sv) OVER
         |      (PARTITION BY i.event_type, s.lo, s.hi) AS HUGEINT) AS svv,
         |    CAST(SUM(i.sv) OVER (PARTITION BY i.event_type, s.lo, s.hi
         |      ORDER BY i.k ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS s1
         |  FROM idx i JOIN $segCte s
         |    ON i.event_type = s.event_type AND i.k BETWEEN s.lo AND s.hi
         |), g$i AS (
         |  SELECT event_type, day, k, lo, hi, n, st, s1, svv,
         |    k - lo + 1 AS n1, hi - k AS n2,
         |    s1 * (hi - k) - (st - s1) * (k - lo + 1) AS ddec,
         |    CAST(s1 * (hi - k) - (st - s1) * (k - lo + 1) AS DOUBLE)
         |      / 1000000.0 AS d
         |  FROM cand$i WHERE k < hi
         |), gg$i AS (
         |  SELECT *, ${Exact.duckRoundS(
               "d * d / CAST(n1 * n2 * n AS DOUBLE)", 6)} AS gain,
         |    CAST(n AS HUGEINT) * svv - st * st AS ssen
         |  FROM g$i
         |), best$i AS (
         |  SELECT * FROM gg$i
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, lo, hi
         |    ORDER BY gain DESC, day ASC) = 1
         |), acc$i AS (
         |  SELECT * FROM best$i
         |  WHERE ssen > 0 AND ddec * ddec * CAST(n + ${CpAcceptC - 2} AS HUGEINT)
         |    >= $CpAcceptC * CAST(n1 * n2 AS HUGEINT) * ssen
         |)""".stripMargin
    def nextSeg(i: Int): String =
      s"""seg${i + 1} AS (
         |  SELECT event_type, lo, k AS hi FROM acc$i WHERE k - lo + 1 >= $CpMinSeg
         |  UNION ALL
         |  SELECT event_type, k + 1 AS lo, hi FROM acc$i WHERE hi - k >= $CpMinSeg
         |)""".stripMargin
    def out(i: Int): String =
      s"""SELECT CAST($i AS INT) AS depth, event_type, day AS cp_day,
         |  n1 AS n_pre, n2 AS n_post,
         |  ${Exact.duckRoundS("CAST(s1 AS DOUBLE) / n1 / 1000000.0", 6)}
         |    AS mean_pre,
         |  ${Exact.duckRoundS(
             "CAST(st - s1 AS DOUBLE) / n2 / 1000000.0", 6)} AS mean_post,
         |  gain
         |FROM acc$i""".stripMargin
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // $NsPerDay AS day,
       |    CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS sv
       |  FROM events GROUP BY 1, 2
       |), idx AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
       |    ORDER BY day) AS BIGINT) AS k
       |  FROM daily
       |), seg1 AS (
       |  SELECT event_type, MIN(k) AS lo, MAX(k) AS hi FROM idx GROUP BY 1
       |), ${level(1, "seg1")}, ${nextSeg(1)},
       |${level(2, "seg2")}, ${nextSeg(2)},
       |${level(3, "seg3")}
       |${out(1)}
       |UNION ALL ${out(2)}
       |UNION ALL ${out(3)}""".stripMargin
  }
}
