package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #124: Z-ORDER layout — multi-dimensional clustering for the write
  * path (Delta/Iceberg `OPTIMIZE ZORDER BY`): interleave the bits of two
  * query dimensions so that sorting by ONE derived key co-locates rows
  * that are close in BOTH, letting min-max (row-group / file) pruning
  * serve range predicates on either dimension. A single-column sort
  * clusters only its own column; a hash layout clusters neither — the
  * locality report this query emits is the measurable difference.
  *
  * The registered query z-orders events on (user_id, day): zkey =
  * bit-interleave(user, day) (32-bit, 16 bits/dim — both dims fit), then
  * 16 EQUAL-WIDTH zkey buckets (bounds from a one-row broadcast min/max
  * — integer math, so the bucketing is deterministic and oracle-able;
  * production uses repartitionByRange on the same key, whose sampled
  * bounds the spec exercises separately) and per-bucket
  * (n_events, u_min, u_max, d_min, d_max) — each bucket's bounding box,
  * i.e. exactly the min-max index a reader would prune with.
  *
  * Scale: the zkey is a map-only integer expression; the report is one
  * 16-key map-side-combining aggregate. The WRITE path at 100 TB is
  * `repartitionByRange(zkey).write` — the spec measures that path's
  * physical partitions too and shows the mean bounding-box area is a
  * fraction of the hash layout's.
  */
object ZOrder {

  val Bits = 16
  val Buckets = 16

  /** Bit-interleave two non-negative ints ([[Bits]] bits each; dim A on
    * odd bit positions, dim B on even).
    */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** DuckDB fragment mirroring [[interleave]]. */
  def duckInterleave(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"((($a) >> $i) & 1) * ${1L << (2 * i + 1)} + ((($b) >> $i) & 1) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** Events with (user_id, day, zkey). */
  private[sources] def zkeyed(spark: SparkSession, dir: String): DataFrame =
    graft.relational.Events.eventsS(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts_s DIV 86400").as("day"))
      .withColumn("zkey", interleave(col("user_id"), col("day")))

  def layoutReport(spark: SparkSession, dir: String): DataFrame = {
    val z = zkeyed(spark, dir)
    val bounds = z.agg(min("zkey").as("zmin"), max("zkey").as("zmax"))
    z.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"((zkey - zmin) * $Buckets) DIV (zmax - zmin + 1)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("day").as("d_min"), max("day").as("d_max"))
  }

  val layoutReportSql: String =
    s"""WITH z AS (
       |  SELECT event_id, user_id,
       |    ${graft.relational.Events.duckTsS} // 86400 AS day,
       |    ${duckInterleave("user_id", s"${graft.relational.Events.duckTsS} // 86400")} AS zkey
       |  FROM events
       |), b AS (SELECT MIN(zkey) AS zmin, MAX(zkey) AS zmax FROM z)
       |SELECT ((zkey - zmin) * $Buckets) // (zmax - zmin + 1) AS bucket,
       |  COUNT(*) AS n_events,
       |  MIN(user_id) AS u_min, MAX(user_id) AS u_max,
       |  MIN(day) AS d_min, MAX(day) AS d_max
       |FROM z, b GROUP BY 1""".stripMargin

  // ----------------------------------------- #214 skipping effectiveness

  /** Probe predicates per dimension for the skipping workload. */
  val Preds = 8

  /** #214: FILE-SKIPPING effectiveness report — the measurement that
    * justifies a layout choice (the "files scanned per query" table in
    * every Delta/Iceberg OPTIMIZE writeup): simulate min-max pruning
    * for a workload of range predicates over THREE physical layouts of
    * the same events — Z-ORDER buckets (#124's), a single-dimension
    * user-sorted layout, and a hash layout — and report, per
    * (layout, probed dimension), how many buckets and rows a min-max
    * reader must scan. The expected physics, which the spec pins as
    * strict inequalities: the single-dim sort is PERFECT on its own
    * dimension and useless on the other; hash prunes nothing; z-order
    * prunes BOTH dimensions meaningfully — that "good on every
    * dimension, optimal on none" trade is the whole reason ZORDER
    * exists.
    *
    * Scale shape: one scan computes all three bucket assignments and
    * ONE Expand-style explode feeds a single (layout, bucket)-keyed
    * map-side-combining aggregate (48 keys) building every bounding
    * box; the probe workload (16 deterministic equal-width ranges
    * derived from the global bounds — integer arithmetic on a 1-row
    * broadcast) joins the 48-row bbox frame; everything after the
    * first aggregate is dictionary-sized. All-integer; hash-exact.
    */
  def skippingReport(spark: SparkSession, dir: String): DataFrame = {
    val z = zkeyed(spark, dir)
    val bounds = z.agg(
      min("zkey").as("zmin"), max("zkey").as("zmax"),
      min("user_id").as("umin"), max("user_id").as("umax"),
      min("day").as("dmin"), max("day").as("dmax"))
    val bucketed = z.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("day"),
        expr(s"((zkey - zmin) * $Buckets) DIV (zmax - zmin + 1)").as("b_z"),
        expr(s"((user_id - umin) * $Buckets) DIV (umax - umin + 1)").as("b_u"),
        graft.core.PortableHash.pHash(concat(lit("skip"), col("event_id")))
          .mod(Buckets).as("b_h"))
    val boxes = bucketed
      .select(col("user_id"), col("day"),
        posexplode(array(col("b_z"), col("b_u"), col("b_h")))
          .as(Seq("layout_i", "bucket")))
      .withColumn("layout",
        element_at(array(lit("zorder"), lit("usersort"), lit("hash")),
          col("layout_i") + 1))
      .groupBy("layout", "bucket")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("day").as("d_min"), max("day").as("d_max"))
    // deterministic equal-width probe ranges on each dimension
    val preds = spark.range(Preds).toDF("k")
      .crossJoin(broadcast(bounds))
      .select(
        posexplode(array(
          struct(lit("user").as("dim"),
            expr(s"umin + (k * (umax - umin + 1)) div $Preds").as("lo"),
            expr(s"umin + ((k + 1) * (umax - umin + 1)) div $Preds").as("hi")),
          struct(lit("day").as("dim"),
            expr(s"dmin + (k * (dmax - dmin + 1)) div $Preds").as("lo"),
            expr(s"dmin + ((k + 1) * (dmax - dmin + 1)) div $Preds").as("hi"))))
          .as(Seq("pi", "p")))
      .select(col("p.dim").as("dim"), col("p.lo").as("lo"), col("p.hi").as("hi"))
    boxes.join(broadcast(preds),
        (col("dim") === "user" && col("u_min") < col("hi") && col("u_max") >= col("lo")) ||
        (col("dim") === "day" && col("d_min") < col("hi") && col("d_max") >= col("lo")))
      .groupBy("layout", "dim")
      .agg(countDistinct(col("lo")).as("n_preds"),
        count(lit(1)).as("buckets_scanned"),
        sum("n").as("rows_scanned"))
  }

  val skippingReportSql: String = {
    val h = graft.core.PortableHash.duck("'skip' || event_id")
    s"""WITH z AS (
       |  SELECT event_id, user_id,
       |    ${graft.relational.Events.duckTsS} // 86400 AS day,
       |    ${duckInterleave("user_id", s"${graft.relational.Events.duckTsS} // 86400")} AS zkey
       |  FROM events
       |), b AS (
       |  SELECT MIN(zkey) AS zmin, MAX(zkey) AS zmax,
       |    MIN(user_id) AS umin, MAX(user_id) AS umax,
       |    MIN(day) AS dmin, MAX(day) AS dmax
       |  FROM z
       |), bk AS (
       |  SELECT user_id, day,
       |    ((zkey - zmin) * $Buckets) // (zmax - zmin + 1) AS b_z,
       |    ((user_id - umin) * $Buckets) // (umax - umin + 1) AS b_u,
       |    $h % $Buckets AS b_h
       |  FROM z, b
       |), boxes AS (
       |  SELECT layout, bucket, COUNT(*) AS n,
       |    MIN(user_id) AS u_min, MAX(user_id) AS u_max,
       |    MIN(day) AS d_min, MAX(day) AS d_max
       |  FROM (
       |    SELECT user_id, day, 'zorder' AS layout, b_z AS bucket FROM bk
       |    UNION ALL SELECT user_id, day, 'usersort', b_u FROM bk
       |    UNION ALL SELECT user_id, day, 'hash', b_h FROM bk
       |  ) GROUP BY layout, bucket
       |), preds AS (
       |  SELECT 'user' AS dim,
       |    umin + (k * (umax - umin + 1)) // $Preds AS lo,
       |    umin + ((k + 1) * (umax - umin + 1)) // $Preds AS hi
       |  FROM b, (SELECT unnest(range($Preds)) AS k)
       |  UNION ALL
       |  SELECT 'day',
       |    dmin + (k * (dmax - dmin + 1)) // $Preds,
       |    dmin + ((k + 1) * (dmax - dmin + 1)) // $Preds
       |  FROM b, (SELECT unnest(range($Preds)) AS k)
       |)
       |SELECT layout, dim, COUNT(DISTINCT lo) AS n_preds,
       |  COUNT(*) AS buckets_scanned, CAST(SUM(n) AS BIGINT) AS rows_scanned
       |FROM boxes JOIN preds
       |  ON (dim = 'user' AND u_min < hi AND u_max >= lo)
       |  OR (dim = 'day' AND d_min < hi AND d_max >= lo)
       |GROUP BY layout, dim""".stripMargin
  }

  // --------------------------------------------- #287 compaction plan

  /** Target rows per compaction group (the row-count proxy for the
    * Delta/Iceberg target FILE SIZE).
    */
  val CompactTarget = 256L

  /** #287: COMPACTION PLAN — the OPTIMIZE planning step the layout
    * family was missing: #124 writes a clustered layout and #214 reads
    * one, but a live table accretes SMALL FILES (here simulated as one
    * file per (day, hour) micro-batch — the shape streaming ingestion
    * actually produces), and the compactor must group them into
    * target-sized units WITHOUT crossing partition boundaries
    * (cross-partition groups would break partition pruning — the rule
    * every production OPTIMIZE follows). The plan: within each day,
    * accumulate files in hour order and open a new group each time the
    * running size passes [[CompactTarget]] — the greedy cumulative-fill
    * bin assignment, as one day-partitioned window cumsum: group =
    * cum_before DIV target.
    *
    * Exactness: pure integer arithmetic end to end. Scale: events
    * collapse map-side onto the (day, hour) file frame; the window
    * partitions by day over ≤24-row frames; output one row per
    * compaction group with the hour span a reader would coalesce.
    */
  def compactPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = graft.relational.Events.eventsS(spark, dir)
      .groupBy(expr("ts_s DIV 86400").as("day"),
        expr("(ts_s DIV 3600) % 24").as("hour"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.partitionBy("day").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("n_rows").over(w), lit(0L)))
      .withColumn("grp", expr(s"cum_before DIV $CompactTarget"))
      .groupBy("day", "grp")
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
        min("hour").as("h_min"), max("hour").as("h_max"))
  }

  val compactPlanSql: String =
    s"""WITH f AS (
       |  SELECT ${graft.relational.Events.duckTsS} // 86400 AS day,
       |    (${graft.relational.Events.duckTsS} // 3600) % 24 AS hour,
       |    COUNT(*) AS n_rows
       |  FROM events GROUP BY 1, 2
       |), c AS (
       |  SELECT day, hour, n_rows,
       |    COALESCE(CAST(SUM(n_rows) OVER (PARTITION BY day ORDER BY hour
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_before
       |  FROM f
       |)
       |SELECT day, cum_before // $CompactTarget AS grp,
       |  COUNT(*) AS n_files, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       |  MIN(hour) AS h_min, MAX(hour) AS h_max
       |FROM c GROUP BY 1, 2""".stripMargin
}
