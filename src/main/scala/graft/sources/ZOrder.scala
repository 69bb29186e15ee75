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
}
