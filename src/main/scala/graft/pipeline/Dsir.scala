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

  val dsirWeightsSql: String = {
    val m = Features.NSlots
    s"""WITH d AS (
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
       |)
       |SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_feats,
       |  ${Exact.duckSum("CAST(c AS DOUBLE) * lr", 6)} AS logw,
       |  ${Exact.duckSum("CAST(c AS DOUBLE) * lr", 6)} > 0.0 AS keep
       |FROM ds JOIN lr USING (slot)
       |GROUP BY doc_id, lang""".stripMargin
  }
}
