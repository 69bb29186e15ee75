package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** #241: STREAMING FUNNEL — the live per-user funnel position every
  * growth dashboard wants pushed, as keyed custom state
  * (`flatMapGroupsWithState`, the #212 API) rather than a nightly
  * batch job.
  *
  * Semantics: the FIRST-OCCURRENCE funnel (the product-analytics
  * default): a user's stage is how far the ordered chain
  * first(view) < first(click) < first(purchase) holds over the FIRST
  * timestamp of each event type. This differs from #89's
  * earliest-click-AFTER-view chain BY DESIGN, and the choice is the
  * streaming-correctness point: per-type MIN timestamps are
  * commutative and associative, so the transition logic obeys the
  * #212 order-free contract — Spark guarantees neither intra-batch
  * iterator order nor cross-batch event-time order, and a
  * chain-dependent state machine (take the first click after the
  * current view...) is NOT replay-stable: an early view arriving late
  * would retroactively requalify clicks the machine already discarded.
  * First-occurrence state is a 3-long fold whose final value provably
  * equals the batch recompute under ANY arrival order — which is
  * exactly what the oracle checks (streamed final state ≡ one batch
  * SQL aggregate, hash-exact).
  *
  * Scale: one user_id-keyed shuffle; state = three longs per live
  * user in the state store, partitioned the same way; Update mode
  * emits only touched keys per micro-batch (the changelog a serving
  * store consumes). A production deployment adds GroupStateTimeout
  * for dormant users (NoTimeout keeps verification deterministic).
  */
object FunnelState {

  final case class Ev(user_id: Long, event_type: String, ts_s: Long)
  final case class Mins(v: Long, c: Long, p: Long)
  final case class FunnelRow(user_id: Long, t_view: Option[Long],
      t_click: Option[Long], t_purchase: Option[Long], stage: Int)

  private val None_ = Long.MaxValue

  private def stageOf(m: Mins): Int =
    if (m.v == None_) 0
    else if (m.c == None_ || m.c <= m.v) 1
    else if (m.p == None_ || m.p <= m.c) 2
    else 3

  private def transition(userId: Long, events: Iterator[Ev],
      state: GroupState[Mins]): Iterator[FunnelRow] = {
    val prev = state.getOption.getOrElse(Mins(None_, None_, None_))
    val next = events.foldLeft(prev) { (s, e) =>
      e.event_type match {
        case "view" => s.copy(v = math.min(s.v, e.ts_s))
        case "click" => s.copy(c = math.min(s.c, e.ts_s))
        case "purchase" => s.copy(p = math.min(s.p, e.ts_s))
        case _ => s
      }
    }
    state.update(next)
    def opt(x: Long) = if (x == None_) None else Some(x)
    Iterator(FunnelRow(userId, opt(next.v), opt(next.c), opt(next.p),
      stageOf(next)))
  }

  private[streaming] def funnelStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts_s"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(transition)
      .toDF()
  }

  /** #241 registered query: the final per-user funnel position. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream.schema(batch.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts_s",
        expr(s"${graft.relational.Events.tsNanos(batch)} DIV 1000000000"))
    val q = funnelStream(stream)
      .writeStream.format("memory").queryName("graft_stream_funnel")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Update mode: the finite run's last emission per user is final;
    // later emissions dominate on (coverage) — mins only decrease and
    // stage recomputes from them, so max over the struct of a
    // monotone encoding is NOT valid here; instead keep the row with
    // the most information via min timestamps (mins only shrink, so
    // the final row has the componentwise-min timestamps).
    spark.table("graft_stream_funnel")
      .groupBy("user_id")
      .agg(min("t_view").as("t_view"), min("t_click").as("t_click"),
        min("t_purchase").as("t_purchase"))
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        when(col("t_view").isNull, 0)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1)
          .when(col("t_purchase").isNull ||
            col("t_purchase") <= col("t_click"), 2)
          .otherwise(3).as("stage"))
  }

  val funnelSql: String = {
    val tsS = graft.relational.Events.duckTsS
    s"""WITH m AS (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'view' THEN $tsS END) AS t_view,
       |    MIN(CASE WHEN event_type = 'click' THEN $tsS END) AS t_click,
       |    MIN(CASE WHEN event_type = 'purchase' THEN $tsS END)
       |      AS t_purchase
       |  FROM events GROUP BY user_id
       |)
       |SELECT user_id, t_view, t_click, t_purchase,
       |  CAST(CASE WHEN t_view IS NULL THEN 0
       |    WHEN t_click IS NULL OR t_click <= t_view THEN 1
       |    WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
       |    ELSE 3 END AS INT) AS stage
       |FROM m""".stripMargin
  }
}
