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

  // ------------------------------------------------------ shard manifest

  /** Output shard count (a dataloader-parallelism config constant; ids
    * are only stable for equal N, like the dictionary's bucket count).
    */
  val NShards = 16L

  /** #88: deterministic output sharding + per-shard manifest — the step
    * that turns a curated corpus into the N-file layout a distributed
    * trainer reads (each worker streams its shard independently). The
    * assignment `shard = pHash(doc) % N` is map-only, append-stable
    * (adding documents never moves an existing one, unlike round-robin
    * or size-balanced greedy packing) and co-keys with nothing — so at
    * 100 TB it is a pure write-partitioning: `partitionBy(shard)` on
    * the sink, no extra shuffle beyond the manifest's small-key agg.
    * The manifest row per shard carries doc/token/char totals and a
    * token share vs the corpus (hash uniformity makes shards
    * size-balanced in expectation; the spec bounds the observed skew).
    */
  def shardAssign(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(
        graft.core.PortableHash.pHash(
          concat_ws("|", lit("shard"), col("doc_id"))).%(NShards)
          .cast("int").as("shard"),
        size(words).cast("long").as("tok"),
        col("n_chars"), col("source"), col("lang"))
    val perShard = d.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("tok").as("tok_total"),
      sum("n_chars").as("char_total"),
      countDistinct("source").as("n_sources"),
      countDistinct("lang").as("n_langs"))
    val total = d.agg(sum("tok").as("tok_corpus"))
    perShard.crossJoin(broadcast(total))
      .withColumn("tok_share",
        col("tok_total").cast("double") / col("tok_corpus").cast("double"))
      .drop("tok_corpus")
  }

  val shardAssignSql: String =
    s"""WITH d AS (
       |  SELECT CAST(${graft.core.PortableHash.duck("'shard|' || doc_id")} % $NShards AS INT) AS shard,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok,
       |    n_chars, source, lang
       |  FROM documents
       |), s AS (
       |  SELECT shard, COUNT(*) AS n_docs,
       |    CAST(SUM(tok) AS BIGINT) AS tok_total,
       |    CAST(SUM(n_chars) AS BIGINT) AS char_total,
       |    COUNT(DISTINCT source) AS n_sources,
       |    COUNT(DISTINCT lang) AS n_langs
       |  FROM d GROUP BY shard
       |), t AS (SELECT CAST(SUM(tok) AS BIGINT) AS tok_corpus FROM d)
       |SELECT shard, n_docs, tok_total, char_total, n_sources, n_langs,
       |  CAST(tok_total AS DOUBLE) / CAST(tok_corpus AS DOUBLE) AS tok_share
       |FROM s, t""".stripMargin
}
