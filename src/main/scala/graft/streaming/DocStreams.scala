package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Exact
import graft.pipeline.CorpusClean
import graft.text.TextAnalysis

/** Structured Streaming over the documents table: the streaming shape of
  * the curation pipeline's quality gate (batch analogs: #32
  * `text_quality_score` + the gate inside #51 `corpus_clean`).
  *
  * The quality score is a stateless per-row expression, so the filter
  * stage needs NO streaming state at all — at 100 TB/day of ingest it is
  * a pure map over each micro-batch; only the per-source running counts
  * keep (tiny, #sources-bounded) state. Verification runs complete-mode +
  * AvailableNow over a finite file stream (deterministic, oracle-equal);
  * production is append mode writing kept documents to a sink with the
  * counts as a side aggregation.
  */
object DocStreams {

  private def docStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  private def runToMemory(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** The stateless transform under test, exposed for the MemoryStream
    * spec: tokenize → score → gate at [[CorpusClean.QualityTau]].
    */
  def qualityGate(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(trim(col("text")), "\\s+"))
      .withColumn("quality", TextAnalysis.quality)
      .filter(col("quality") >= CorpusClean.QualityTau)

  /** #60: streaming quality filter — per-source running count and summed
    * quality of the documents that pass the gate.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    runToMemory(
      qualityGate(docStream(spark, dir))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          Exact.decSum(col("quality")).as("sum_quality")),
      "graft_stream_qfilter")

  // --------------------------------------------- #163 streaming Bloom

  /** The streaming aggregate under test, exposed for the MemoryStream
    * spec: per-word bit_or of the element bit masks. DELIBERATELY no
    * dropDuplicates stage — OR is idempotent, so repeated elements
    * (dup documents, at-least-once replays) re-set already-set bits and
    * change nothing, which is exactly why this state needs no dedup
    * buffer where `streaming_dedup` does.
    */
  def bloomWords(docs: DataFrame): DataFrame =
    graft.relational.Sketches.bloomMasks(
        graft.relational.Sketches.bloomElements(docs))
      .groupBy("word").agg(expr("bit_or(mask)").as("b"))

  /** #163: the #128 Bloom membership filter as CONTINUOUSLY-MAINTAINED
    * streaming state — the live decontamination/cross-corpus-membership
    * filter updated as the corpus streams in (the OTHER side of the
    * sketch-merge family: Count-Min merges by SUM, HLL by MAX, Bloom by
    * OR — idempotent AND commutative, so micro-batch partials, shard
    * unions and at-least-once replays all combine exactly; ≤
    * [[graft.relational.Sketches.BloomWords]] rows of state forever,
    * unbounded-safe without a watermark). The word table is completed
    * to the full fixed width batch-side (a sink read), and the emitted
    * state is bit-for-bit the batch filter's — proven by the shared
    * oracle.
    */
  def bloomState(spark: SparkSession, dir: String): DataFrame =
    graft.relational.Sketches.bloomComplete(
      runToMemory(bloomWords(docStream(spark, dir)), "graft_stream_bloom"))

  val bloomStateSql: String = graft.relational.Sketches.bloomSql

  val qualityFilterSql: String =
    s"""WITH d AS (
       |  SELECT source, n_chars, regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents
       |), q AS (
       |  SELECT source,
       |    ${TextAnalysis.duckQuality} AS quality
       |  FROM d
       |)
       |SELECT source, COUNT(*) AS n_kept,
       |  ${Exact.duckSum("quality")} AS sum_quality
       |FROM q WHERE quality >= ${CorpusClean.QualityTau}
       |GROUP BY source""".stripMargin
}
