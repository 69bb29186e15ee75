package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash, Tables}

/** #117: salted join — the skew-mitigation half of the join-layout story
  * (partition pruning #113 and bucketing #114 are the storage halves;
  * this is the runtime half). `events.event_type` has FIVE distinct
  * values: a hash-partitioned join on it uses at most five reducers no
  * matter how many executors the cluster has — the low-cardinality /
  * hot-key shape that serializes 100 TB joins. The fix when the
  * dimension side is too large to broadcast: SALT — fact rows get a
  * deterministic salt in [0, S), the dimension is replicated S×, and the
  * join key becomes (key, salt), spreading each hot key over S reducers.
  * Values must be IDENTICAL to the plain join — the oracle runs the
  * unsalted join, so the mechanism can only change the plan.
  *
  * Honest scope: at these test sizes Spark would broadcast the 5-row
  * dimension and AQE's OptimizeSkewedJoin can split size-skewed SMJ
  * partitions at runtime. Salting remains the tool when neither applies —
  * dimension too big to broadcast, AQE unavailable (streaming), or the
  * skew is key-cardinality (5 keys bound the PARTITION count, which
  * AQE's partition splitter does address for SMJ but a shuffled hash
  * join or any engine without runtime re-planning does not). The
  * `hint("merge")` pins the shuffle-join path so the demonstrated plan
  * is the one salting exists for.
  *
  * The final per-type aggregation does NOT need salting: partial
  * aggregation combines map-side, so only S partial rows per type cross
  * the wire — the asymmetry (joins need salt, aggs need map-side
  * combine) is the point SaltedSpec measures.
  */
object Salted {

  val Salts = 16

  /** Per-type dimension (deterministic dyadic weight). */
  private def dim(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select("event_type").distinct()
      .select(col("event_type"),
        PortableHash.dyadic(concat(lit("saltw:"), col("event_type"))).as("w"))

  /** Fact side with its deterministic salt in [0, Salts). */
  private[relational] def saltedFact(spark: SparkSession,
      dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("salt",
        (PortableHash.pHash(col("event_id").cast("string")) % Salts)
          .cast("int"))

  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val dimExp = dim(spark, dir).select(col("event_type"), col("w"),
      explode(sequence(lit(0), lit(Salts - 1))).as("salt"))
    saltedFact(spark, dir).hint("merge")
      .join(dimExp, Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        Exact.decSum(col("value") * col("w"), 6).as("weighted_value"))
  }

  /** DuckDB oracle: the UNSALTED join — salting may only change the
    * plan, never a value.
    */
  val saltedJoinSql: String =
    s"""WITH dim AS (
       |  SELECT event_type,
       |    ${PortableHash.duckDyadic("'saltw:' || event_type")} AS w
       |  FROM (SELECT DISTINCT event_type FROM events)
       |)
       |SELECT event_type, COUNT(*) AS n_events,
       |  ${Exact.duckSum("value * w", 6)} AS weighted_value
       |FROM events JOIN dim USING (event_type)
       |GROUP BY event_type""".stripMargin
}
