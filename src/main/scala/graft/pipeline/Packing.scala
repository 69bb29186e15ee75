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

  // -------------------------------------------------- #149 pair packing

  val BinLen = 128L
  val PackShards = 8

  /** #149: length-aware PAIR packing — the don't-split-documents
    * complement of [[packSequences]] (#82 concatenates and chunks, so a
    * document can straddle a boundary and train with a broken
    * attention span; packing WHOLE documents into bins avoids that, and
    * histogram/length-based packing recovers most of the padding waste
    * — the "Efficient Sequence Packing" line of work). The
    * SQL-expressible member of that family is sorted FOLD pairing:
    * within a shard, rank docs by length ascending and pair rank i with
    * rank n+1−i — shortest with longest — packing each pair into one
    * bin when it fits ([[BinLen]]), else splitting it. Fold pairing is
    * what the histogram methods approximate at k=2 and captures most of
    * the win because length distributions are roughly symmetric around
    * their mean.
    *
    * Plan: ONE shard-partitioned window pass derives both ranks
    * (ascending rank + per-shard count give the fold partner for free),
    * then the pair collapses in a (shard, pair)-keyed map-side-
    * combining aggregate — NO self-join on rank, which would shuffle
    * the rank frame twice. The per-shard sort is the packing cost paid
    * at write time (the #139 argument); shards scale with the cluster.
    */
  def packBins(spark: SparkSession, dir: String): DataFrame = {
    val byShard = Window.partitionBy("shard")
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(graft.core.PortableHash.pHash(concat(lit("bin"), col("doc_id"))),
          lit(PackShards)).cast("int").as("shard"),
        size(words).cast("long").as("tok"))
      .withColumn("ra", row_number().over(byShard.orderBy(col("tok").asc, col("doc_id").asc)))
      .withColumn("n", count(lit(1)).over(byShard))
      .withColumn("pr", least(col("ra"), col("n") - col("ra") + 1))
      .withColumn("side",
        when(col("ra") < col("n") - col("ra") + 1, lit("s"))
          .when(col("ra") > col("n") - col("ra") + 1, lit("l"))
          .otherwise(lit("m")))
    d.groupBy("shard", "pr")
      .agg(
        min(when(col("side") =!= "l", col("doc_id"))).as("d_small"),
        min(when(col("side") === "l", col("doc_id"))).as("d_large"),
        sum("tok").as("t_total"),
        count(lit(1)).as("n_docs"))
      .withColumn("packed", col("n_docs") === 2 && col("t_total") <= BinLen)
      .withColumn("n_bins", when(col("packed") || col("n_docs") === 1, 1L).otherwise(2L))
  }

  val packBinsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(${graft.core.PortableHash.duck("'bin' || doc_id")} % $PackShards AS INT) AS shard,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, shard, tok,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY tok ASC, doc_id ASC) AS ra,
       |    COUNT(*) OVER (PARTITION BY shard) AS n
       |  FROM d
       |), sided AS (
       |  SELECT doc_id, shard, tok,
       |    least(ra, n - ra + 1) AS pr,
       |    CASE WHEN ra < n - ra + 1 THEN 's'
       |         WHEN ra > n - ra + 1 THEN 'l' ELSE 'm' END AS side
       |  FROM r
       |), p AS (
       |  SELECT shard, pr,
       |    MIN(CASE WHEN side <> 'l' THEN doc_id END) AS d_small,
       |    MIN(CASE WHEN side = 'l' THEN doc_id END) AS d_large,
       |    CAST(SUM(tok) AS BIGINT) AS t_total,
       |    COUNT(*) AS n_docs
       |  FROM sided GROUP BY shard, pr
       |)
       |SELECT shard, CAST(pr AS BIGINT) AS pr, d_small, d_large, t_total, n_docs,
       |  (n_docs = 2 AND t_total <= $BinLen) AS packed,
       |  CAST(CASE WHEN (n_docs = 2 AND t_total <= $BinLen) OR n_docs = 1
       |    THEN 1 ELSE 2 END AS BIGINT) AS n_bins
       |FROM p""".stripMargin
}
