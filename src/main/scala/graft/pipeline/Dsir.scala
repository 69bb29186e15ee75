package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash, Tables}
import graft.text.Features

/** DSIR — data selection with importance resampling (Xie et al. 2023):
  * select raw-corpus documents that RESEMBLE a target domain by
  * importance weight under two hashed-n-gram bag models. The method
  * behind "make the web crawl look like Wikipedia/books": each document
  * scores log w(x) = Σ_f c_f(x)·log(p_target(f)/p_raw(f)) over hashed
  * word uni+bigram features, and the high-weight slice is the selected
  * corpus. The model is two multinomials over a FIXED slot space — KB
  * sized at any corpus scale, the same hashed feature space as
  * [[graft.text.Features]] (#155).
  */
object Dsir {

  /** Target domain: the corpus' own `lang = en` slice (DSIR's original
    * setting selects raw text resembling a trusted-language/domain
    * sample; any labeled target slice plugs in the same way).
    */
  val TargetLang = "en"

  /** #157: per-document DSIR importance weights + the keep verdict.
    *
    * Exactness: the slot log-ratio folds the two Laplace-smoothed
    * probabilities into ONE transcendental over one correctly-rounded
    * ratio of exact integer products — log((c_t+1)·(n_r+m) /
    * ((c_r+1)·(n_t+m))) — whose output is grid-quantized (scale 6, the
    * house rule); each doc then sums c·lr through the quantized
    * aggregate (order-free). Integer products stay below 2^53 while
    * total feature occurrences are below ~9e7·slot count; at true
    * 100 TB scale the model build would quantize its counts first —
    * a constant change, not a plan change.
    *
    * Plan: one corpus scan explodes features (map-side hash to slots),
    * ONE (doc, slot)-keyed aggregate, and a 1024-row model table built
    * by a slot-keyed map-side-combining aggregate (shuffle constant in
    * corpus size) and broadcast back. Scoring is a broadcast join +
    * one doc-keyed aggregate — nothing data-scale moves twice, and the
    * model is exactly the artifact a production DSIR run precomputes
    * once and reuses across shards.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val m = Features.NSlots
    val ws = split(trim(col("text")), "\\s+")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), ws.as("ws"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => concat_ws(" ", x, y))
    val feats = docs.select(col("doc_id"), col("lang"), explode(col("ws")).as("feat"))
      .unionByName(docs.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("lang"), explode(bigrams).as("feat")))
      .select(col("doc_id"), col("lang"),
        pmod(PortableHash.pHash(concat(lit("FH|"), col("feat"))), lit(m)).as("slot"))

    val docSlot = feats.groupBy("doc_id", "lang", "slot")
      .agg(count(lit(1)).as("c"))
    val model = feats.groupBy("slot").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("lang") === TargetLang, 1L).otherwise(0L)).as("c_t"))
    val totals = model.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    val lrTab = model.crossJoin(broadcast(totals))
      .select(col("slot"), Exact.roundS(
        log(((col("c_t") + 1L) * (col("n_r") + m.toLong)).cast("double") /
          ((col("c_r") + 1L) * (col("n_t") + m.toLong)).cast("double")), 6).as("lr"))

    docSlot.join(broadcast(lrTab), "slot")
      .groupBy("doc_id", "lang")
      .agg(sum("c").as("n_feats"),
        Exact.decSum(col("c").cast("double") * col("lr"), 6).as("logw"))
      .withColumn("keep", col("logw") > 0.0)
  }

  /** The weight-build CTE chain through the per-doc `wts` frame —
    * factored so #157's and #309's oracles share one text.
    */
  private val dsirCtes: String = {
    val m = Features.NSlots
    s"""d AS (
       |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, lang, unnest(ws) AS feat FROM d
       |  UNION ALL
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]))
       |  FROM d WHERE len(ws) >= 2
       |), sl AS (
       |  SELECT doc_id, lang, ${PortableHash.duck("'FH|' || feat")} % $m AS slot
       |  FROM feats
       |), ds AS (
       |  SELECT doc_id, lang, slot, COUNT(*) AS c FROM sl GROUP BY 1, 2, 3
       |), model AS (
       |  SELECT slot, COUNT(*) AS c_r,
       |    SUM(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END) AS c_t
       |  FROM sl GROUP BY slot
       |), tot AS (
       |  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r, CAST(SUM(c_t) AS BIGINT) AS n_t
       |  FROM model
       |), lr AS (
       |  SELECT slot, ${Exact.duckRoundS(
             s"ln(CAST((c_t + 1) * (n_r + $m) AS DOUBLE) / " +
               s"CAST((c_r + 1) * (n_t + $m) AS DOUBLE))", 6)} AS lr
       |  FROM model, tot
       |), wts AS (
       |  SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_feats,
       |    ${Exact.duckSum("CAST(c AS DOUBLE) * lr", 6)} AS logw
       |  FROM ds JOIN lr USING (slot)
       |  GROUP BY doc_id, lang
       |)""".stripMargin
  }

  val dsirWeightsSql: String =
    s"""WITH $dsirCtes
       |SELECT doc_id, lang, n_feats, logw, logw > 0.0 AS keep
       |FROM wts""".stripMargin

  // ------------------------------------- #309 effective sample size

  /** #309: EFFECTIVE SAMPLE SIZE of the DSIR importance weights, per
    * language — the diagnostic importance-weighted training reads
    * BEFORE trusting the weights: ESS = (Σw)²/Σw² collapses toward 1
    * when a few documents dominate the weight mass (the selected
    * corpus is then effectively those few docs repeated — variance
    * explodes, and the right move is temperature-flattening or a
    * larger raw pool). `ess_ratio` = ESS/n ∈ (0, 1] is the
    * size-independent gauge. Weights are SELF-NORMALIZED in the log
    * domain (w' = exp(logw − max logw) per language) so no magnitude
    * ever leaves the representable range — the standard
    * log-sum-exp discipline, and ESS is shift-invariant so the result
    * is the true ESS, not an approximation.
    *
    * Exactness: logw and the per-language max are exact grid values
    * (#157's quantized sums); each w' quantizes on the 1e-6 grid after
    * the one exp (the house transcendental rule); Σw' and Σw'² are
    * order-free quantized sums (the square sum at scale 12 through a
    * DECIMAL accumulator — n·1e12 exceeds int64 past ~9e6 docs/lang).
    *
    * Scale: rides #157's weight build (one corpus scan + broadcast
    * model); the max and the sums are |langs|-key map-side-combining
    * aggregates; output one row per language.
    */
  def ess(spark: SparkSession, dir: String): DataFrame = {
    val w = dsirWeights(spark, dir)
    val mx = w.groupBy("lang").agg(max("logw").as("mw"))
    w.join(broadcast(mx), "lang")
      .withColumn("wq", Exact.roundS(exp(col("logw") - col("mw")), 6))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        first("mw").as("max_logw"),
        Exact.decSum(col("wq"), 6).as("s1"),
        Exact.decSumWide(col("wq") * col("wq"), 12).as("s2"))
      .select(col("lang"), col("n_docs"), col("max_logw"),
        (col("s1") * col("s1") / col("s2")).as("ess"),
        (col("s1") * col("s1") / col("s2") / col("n_docs")).as("ess_ratio"))
  }

  val essSql: String = {
    val wq = Exact.duckRoundS("exp(logw - mw)", 6)
    s"""WITH $dsirCtes, mx AS (
       |  SELECT lang, MAX(logw) AS mw FROM wts GROUP BY 1
       |), w2 AS (
       |  SELECT lang, $wq AS wq FROM wts JOIN mx USING (lang)
       |), agg AS (
       |  SELECT lang, COUNT(*) AS n_docs, MIN(mw) AS max_logw,
       |    ${Exact.duckSum("wq", 6)} AS s1,
       |    ${Exact.duckSum("wq * wq", 12)} AS s2
       |  FROM w2 JOIN mx USING (lang)
       |  GROUP BY 1
       |)
       |SELECT lang, n_docs, max_logw,
       |  s1 * s1 / s2 AS ess,
       |  s1 * s1 / s2 / n_docs AS ess_ratio
       |FROM agg""".stripMargin
  }
}
