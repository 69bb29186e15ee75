package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-sequence packing: the last step of every pretraining data
  * pipeline — documents are concatenated in a deterministic order and
  * chunked into fixed-length training sequences ("concat-then-chunk";
  * what GPT-style dataloaders do with EOS-joined streams). The operator
  * computes each document's position in that packed stream: the block
  * it starts in, its offset inside the block, and how many blocks it
  * spans.
  *
  * LLM-pipeline block (mandated by the build brief; composes after
  * `corpus_clean`/`sample_*` — their kept docs are what you'd pack).
  *
  * Scale shape: ONE window sum partitioned by source ordered by doc_id
  * — packing is per-(source) stream, so at 100 TB you partition by
  * (source, shard) and each shard packs independently (the standard
  * layout: a packer never needs cross-shard coordination, because block
  * indices only need to be unique within a shard). Everything is exact
  * integer arithmetic; no data moves except the one keyed window
  * shuffle.
  */
object Packing {

  /** Tokens per packed training sequence. */
  val SeqLen = 512L

  private val words = split(trim(col("text")), "\\s+")

  /** #82: per-document packed position over the (source, doc_id)-ordered
    * concatenated token stream.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), size(words).cast("long").as("tok"))
      .withColumn("cum_before",
        coalesce(sum("tok").over(bySource
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(
        col("doc_id"), col("source"), col("tok"),
        // integer DIV, not double division: a/b rounding up across an
        // integer then truncating would mis-bin a block-boundary doc
        expr(s"cum_before DIV $SeqLen").as("block"),
        (col("cum_before") % SeqLen).as("offset"),
        // blocks touched by [cum_before, cum_before + tok)
        (expr(s"(cum_before + tok - 1) DIV $SeqLen")
          - expr(s"cum_before DIV $SeqLen") + 1).as("blocks_spanned"))
  }

  val packSequencesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, source, tok,
       |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM d
       |)
       |SELECT doc_id, source, tok,
       |  CAST(cum_before // $SeqLen AS BIGINT) AS block,
       |  CAST(cum_before % $SeqLen AS BIGINT) AS offset,
       |  CAST(((cum_before + tok - 1) // $SeqLen) - (cum_before // $SeqLen) + 1 AS BIGINT) AS blocks_spanned
       |FROM c""".stripMargin
}
