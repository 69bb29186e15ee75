package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** #212: ARBITRARY stateful stream processing via
  * `flatMapGroupsWithState` — the custom-state API the built-in
  * aggregates can't reach (session_window, windowed aggs and
  * max/sum-merge states all have declarative forms; a STATE MACHINE
  * with app-defined transition logic does not). The example is the
  * per-user engagement ledger every growth stack keeps: cumulative
  * event/purchase counters, cent-exact spend, last-seen timestamp, and
  * a TIER derived from spend thresholds (the state machine part —
  * bronze/silver/gold promotion happens in transition logic, not SQL).
  *
  * Design for correctness under the streaming contract:
  *  - state updates are ORDER-FREE (counter adds + max(ts)): Spark
  *    guarantees neither intra-batch iterator order nor cross-batch
  *    event-time order without a watermark sort, so transition logic
  *    that folds commutatively+associatively is the only kind whose
  *    final state provably equals the batch recompute — which is
  *    exactly what the oracle checks (streamed final state ≡ one
  *    batch SQL aggregate, hash-exact).
  *  - Update output mode emits the CHANGED keys per micro-batch (the
  *    changelog a downstream serving store consumes); the finite
  *    AvailableNow run emits each user's final ledger once.
  *  - state size: one small case class per live user — bounded by
  *    keyspace; a production deployment adds a GroupStateTimeout to
  *    expire dormant users (documented; NoTimeout here keeps the
  *    verification deterministic).
  *
  * Scale: one shuffle keyed on user_id; state lives in the state
  * store, partitioned the same way — the standard keyed-state shape.
  */
object UserState {

  final case class Ev(user_id: Long, event_type: String, ts_s: Long,
      cents: Long)
  final case class Ledger(n_events: Long, n_purchases: Long,
      spend_cents: Long, last_ts: Long)
  final case class LedgerRow(user_id: Long, n_events: Long,
      n_purchases: Long, total_spend: Double, last_ts: Long, tier: String)

  val SilverCents = 50000L  // 500.00 cumulative purchase value
  val GoldCents = 200000L   // 2000.00

  def tierOf(spendCents: Long): String =
    if (spendCents >= GoldCents) "gold"
    else if (spendCents >= SilverCents) "silver"
    else "bronze"

  /** The transition function: fold the batch's events into the ledger
    * commutatively, then emit the updated row. Pure on (state, batch).
    */
  private def transition(userId: Long, events: Iterator[Ev],
      state: GroupState[Ledger]): Iterator[LedgerRow] = {
    val prev = state.getOption.getOrElse(Ledger(0L, 0L, 0L, Long.MinValue))
    val next = events.foldLeft(prev) { (s, e) =>
      Ledger(
        n_events = s.n_events + 1L,
        n_purchases = s.n_purchases +
          (if (e.event_type == "purchase") 1L else 0L),
        spend_cents = s.spend_cents +
          (if (e.event_type == "purchase") e.cents else 0L),
        last_ts = math.max(s.last_ts, e.ts_s))
    }
    state.update(next)
    Iterator(LedgerRow(userId, next.n_events, next.n_purchases,
      next.spend_cents.toDouble / 100.0, next.last_ts, tierOf(next.spend_cents)))
  }

  /** Shared typed pipeline: events → per-user ledger stream. */
  private[streaming] def ledgerStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts_s"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(transition)
      .toDF()
  }

  /** #212 registered query: the final per-user ledger, streamed. */
  def userState(spark: SparkSession, dir: String): DataFrame = {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream.schema(batch.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts_s",
        expr(s"${graft.relational.Events.tsNanos(batch)} DIV 1000000000"))
    val q = ledgerStream(stream)
      .writeStream.format("memory").queryName("graft_stream_userstate")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Update mode emits one row per (user, touched batch); the finite
    // run's LAST emission per user is the final ledger.
    val raw = spark.table("graft_stream_userstate")
    raw.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_purchases"),
        col("total_spend"), col("last_ts"), col("tier"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.n_purchases").as("n_purchases"),
        col("m.total_spend").as("total_spend"),
        col("m.last_ts").as("last_ts"), col("m.tier").as("tier"))
  }

  val userStateSql: String = {
    val tsS = graft.relational.Events.duckTsS
    s"""SELECT user_id,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_purchases,
       |  CAST(SUM(CASE WHEN event_type = 'purchase'
       |    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
       |    / 100.0 AS total_spend,
       |  MAX($tsS) AS last_ts,
       |  CASE WHEN SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) >= $GoldCents THEN 'gold'
       |    WHEN SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) >= $SilverCents THEN 'silver'
       |    ELSE 'bronze' END AS tier
       |FROM events GROUP BY user_id""".stripMargin
  }
}
