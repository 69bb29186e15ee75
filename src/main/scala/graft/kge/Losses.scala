package graft.kge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash}
import graft.rdf.Dict

/** #41-43: training-loss and activation surface of the reference —
  * max-margin ranking loss (Functions.scala:9-19 `MaxMarginLoss`:
  * max(negScore − posScore + margin, 0)), logistic loss
  * (python/sansa/ml/kbc/keras/holek.py:36-39: softplus(−y·f)), and the
  * sigmoid/tanh activation helpers (Functions.scala:21-31).
  *
  * Each test triple is paired with its deterministic corrupted negative
  * (the `neg_sample_corrupt` rule), scored with TransE, and reduced to a
  * single summary row — the quantity a training loop logs per epoch,
  * computed as one map + one tiny agg (no shuffle beyond the encode).
  *
  * Determinism: TransE scores are dyadic-exact; exp() is proven
  * engine-identical (see [[Kernels]]) but ln/tanh are NOT, so — same
  * discipline as Kernels — tanh goes through its exp formulation on the
  * oracle side and every transcendental output is rounded to 6 decimals
  * before aggregation.
  */
object Losses {
  import Embeddings._

  val Margin = 1.0

  // Scaled-double half-up rounding — engine-identical by construction
  // (see graft.core.Exact). For AGGREGATED transcendental terms use 4
  // decimals, not 6: libm vs JVM ln/exp differ by ~1 ulp, and a term
  // whose TRUE value sits within an ulp of a rounding boundary can
  // still be quantized differently by the two libms before rounding
  // (observed once in 136k logistic terms at sf0.1 with scale 6); a
  // coarser grid puts the per-term hazard at ~1e-12. Per-ROW outputs
  // keep 6 decimals: a flip there would fail one row, not poison an
  // aggregate.
  private def round6(c: Column): Column = graft.core.Exact.roundS(c, 6)
  private def r6(e: String) = graft.core.Exact.duckRoundS(e, 6)
  private def round4(c: Column): Column = graft.core.Exact.roundS(c, 4)
  private def r4(e: String) = graft.core.Exact.duckRoundS(e, 4)

  /** Test slice with the corrupted object id attached: (sid,pid,oid,nid). */
  private def withNeg(spark: SparkSession, dir: String): DataFrame = {
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(
      concat_ws("|", lit("neg"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    encodedSample(spark, dir, ScoreMod).crossJoin(broadcast(n))
      .withColumn("nid",
        when(raw === col("oid"), (raw + 1) % col("n_ent")).otherwise(raw))
  }

  private def transeFold(tCol: Column): Column =
    -graft.functions.VectorFolds.transeSqSum(col("h"), col("r"), tCol)

  /** Scored pos/neg pairs: (sid, pid, oid, nid, s_pos, s_neg).
    * Embeddings join from the materialized id-keyed tables — see the
    * perf warning on [[Embeddings.emb]]; the folds run over attribute
    * columns only.
    */
  private val scoredCache =
    new graft.core.DfCache[(SparkSession, String)]

  private def scored(spark: SparkSession, dir: String): DataFrame =
    scoredCache.getOrElseUpdate((spark, dir))(scoredBuild(spark, dir))

  private def scoredBuild(spark: SparkSession, dir: String): DataFrame = {
    val e = entityEmb(spark, dir)
    withNeg(spark, dir)
      .join(e.select(col("id").as("sid"), col("v").as("h")), "sid")
      .join(e.select(col("id").as("oid"), col("v").as("t")), "oid")
      .join(e.select(col("id").as("nid"), col("v").as("tn")), "nid")
      .join(broadcast(relationEmb(spark, dir)
        .select(col("id").as("pid"), col("v").as("r"))), "pid")
      .withColumn("s_pos", transeFold(col("t")))
      .withColumn("s_neg", transeFold(col("tn")))
  }

  /** #41: max-margin ranking loss summary (n pairs, total, mean). */
  def rankingLoss(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .select(greatest(lit(0.0),
        lit(Margin) + col("s_neg") - col("s_pos")).as("l"))
      .agg(count(lit(1)).as("n_pairs"),
        Exact.decSum(col("l")).as("loss_total"),
        Exact.decAvg(col("l")).as("loss_mean"))

  /** #42: logistic loss mean over {(pos,+1),(neg,−1)} labeled scores:
    * softplus(−y·s) = ln(1 + exp(−y·s)).
    */
  def logisticLoss(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .select(explode(array(
        col("s_pos").as("ys"), (-col("s_neg")).as("ys"))).as("ys"))
      .select(round4(log(lit(1.0) + exp(-col("ys")))).as("l"))
      .agg(count(lit(1)).as("n_scored"), Exact.decAvg(col("l")).as("loss_mean"))

  /** #43: the reference's activation family (actfun.py:13-55 —
    * Sigmoid/Tanh/ReLU/Linear; Softplus is exercised by
    * [[logisticLoss]]) applied to the TransE score per test triple
    * (scores scaled by 1/D into tanh's active region first — raw
    * distances saturate both activations to ±1 immediately).
    *
    * relu/linear are pure rational ops over the dyadic-exact score, so
    * they carry NO grid rounding — only the two transcendentals do.
    */
  def activations(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .withColumn("x", col("s_pos") / lit(D))
      .select(col("sid"), col("pid"), col("oid"),
        round6(lit(1.0) / (lit(1.0) + exp(-col("x")))).as("sigmoid"),
        round6(lit(1.0) - lit(2.0) / (exp(lit(2.0) * col("x")) + lit(1.0)))
          .as("tanh"),
        greatest(lit(0.0), col("x")).as("relu"),
        col("x").as("linear"))

  // ---------------------------------------------------------------- oracle

  /** Shared CTE: slice + neg id + both TransE scores. */
  private val scoredCtes: String = {
    val rawNeg =
      s"${PortableHash.duck("'neg|' || sid || '|' || pid || '|' || oid")} % n_ent"
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "i")
    val te = duckEl("E", "oid", "i"); val tn = duckEl("E", "nid", "i")
    s"""${Dict.preludeCtes},
       |${Dict.sampleEncodedCte(ScoreMod)},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |neg AS (
       |  SELECT sid, pid, oid,
       |    CASE WHEN ($rawNeg) = oid THEN (($rawNeg) + 1) % n_ent
       |         ELSE ($rawNeg) END AS nid
       |  FROM test_enc, n
       |),
       |scored AS MATERIALIZED (
       |  SELECT sid, pid, oid, nid,
       |    -SUM((($he + $re) - $te) * (($he + $re) - $te)) AS s_pos,
       |    -SUM((($he + $re) - $tn) * (($he + $re) - $tn)) AS s_neg
       |  FROM neg, (SELECT unnest(range(0, ${D})) AS i)
       |  GROUP BY 1, 2, 3, 4
       |)""".stripMargin
  }

  val rankingLossSql: String =
    s"""$scoredCtes
       |SELECT COUNT(*) AS n_pairs,
       |  ${Exact.duckSum(s"GREATEST(0.0, $Margin + s_neg - s_pos)")} AS loss_total,
       |  ${Exact.duckAvg(s"GREATEST(0.0, $Margin + s_neg - s_pos)")} AS loss_mean
       |FROM scored""".stripMargin

  val logisticLossSql: String =
    s"""$scoredCtes,
       |labeled AS (
       |  SELECT s_pos AS ys FROM scored
       |  UNION ALL SELECT -s_neg FROM scored
       |)
       |SELECT COUNT(*) AS n_scored,
       |  ${Exact.duckAvg(r4("ln(1.0 + exp(-ys))"))} AS loss_mean
       |FROM labeled""".stripMargin

  val activationsSql: String =
    s"""$scoredCtes
       |SELECT sid, pid, oid,
       |  ${r6(s"1.0 / (1.0 + exp(-(s_pos / ${D})))")} AS sigmoid,
       |  ${r6(s"1.0 - 2.0 / (exp(2.0 * (s_pos / ${D})) + 1.0)")} AS tanh,
       |  GREATEST(0.0, s_pos / ${D}) AS relu,
       |  s_pos / ${D} AS linear
       |FROM scored""".stripMargin
}
