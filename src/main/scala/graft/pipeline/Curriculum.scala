package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}
import graft.text.TextAnalysis

/** Deterministic curriculum ordering — turn the curated corpus into the
  * TRAINING ORDER a dataloader consumes: quality-descending (curriculum
  * learning's easy/clean-first schedule; also the "anneal on the best
  * data last/first" knob in modern pretraining recipes), with a
  * hash-shuffle WITHIN each quality level so equal-quality documents
  * arrive in pseudo-random order rather than storage order (storage
  * order is correlated with source — training on one source for hours
  * is the classic non-IID failure).
  *
  * The order is materialized per SHARD: doc → shard by pHash (append-
  * stable, the #88 assignment shape), within each shard a
  * (quality DESC, hash) sort gives the local position, and the global
  * step interleaves shards round-robin: step = (pos−1)·NShards + shard.
  * Every shard descends through quality in lockstep, so the interleaved
  * stream is globally quality-descending at shard granularity while
  * every worker reads ONLY its own shard sequentially — the layout a
  * multi-worker loader actually wants.
  *
  * 100 TB shape: the quality score and shard are map-side; the only
  * heavy step is the per-shard sort (a shard-partitioned window — the
  * inherent cost of producing a total order, paid at write time once,
  * and shard count scales with the cluster). Quality is quantized to
  * the 1e-6 grid FIRST (the #84 argument) so the sort key is an integer
  * and the order is engine-exact.
  */
object Curriculum {

  val NShards = 16

  /** #139: (doc_id, shard, qi, pos, global_step) training order. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), TextAnalysis.words.as("ws"))
      .select(col("doc_id"),
        floor(TextAnalysis.quality * 1e6 + lit(0.5)).cast("long").as("qi"),
        pmod(PortableHash.pHash(concat(lit("cur"), col("doc_id"))), lit(NShards))
          .cast("int").as("shard"),
        PortableHash.pHash(concat(lit("ord"), col("doc_id"))).as("h"))
    d.withColumn("pos", row_number().over(
        Window.partitionBy("shard")
          .orderBy(col("qi").desc, col("h").asc, col("doc_id").asc)))
      .select(col("doc_id"), col("shard"), col("qi"), col("pos"),
        ((col("pos") - 1).cast("long") * NShards + col("shard")).as("global_step"))
  }

  val curriculumSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars, ${TextAnalysis.duckWords} AS ws FROM documents
       |), keyed AS (
       |  SELECT doc_id,
       |    CAST(floor((${TextAnalysis.duckQuality}) * 1e6 + 0.5) AS BIGINT) AS qi,
       |    CAST(${PortableHash.duck("'cur' || doc_id")} % $NShards AS INT) AS shard,
       |    ${PortableHash.duck("'ord' || doc_id")} AS h
       |  FROM d
       |)
       |SELECT doc_id, shard, qi,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
       |    ORDER BY qi DESC, h ASC, doc_id ASC) AS INT) AS pos,
       |  CAST((ROW_NUMBER() OVER (PARTITION BY shard
       |    ORDER BY qi DESC, h ASC, doc_id ASC) - 1) * $NShards + shard AS BIGINT)
       |    AS global_step
       |FROM keyed""".stripMargin
}
