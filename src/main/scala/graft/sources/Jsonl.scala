package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** JSONL (one JSON object per line) source/sink — the interchange format
  * of LLM training-data pipelines. Beyond the reference's surface (its
  * only source is N-Triples); the operator shape mirrors [[NTriples]]:
  * formatting and parsing are per-row codegen'd column expressions
  * (`to_json`/`from_json`), so a 100 TB corpus serializes and parses as a
  * pure map stage with no shuffle.
  */
object Jsonl {

  /** Serialize a DataFrame to JSONL lines (one string column `line`). */
  def toJsonl(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("line"))

  /** Parse JSONL lines back into typed columns with `schema`. */
  def parseJsonl(lines: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    lines.select(from_json(col("line"), schema).as("j")).select("j.*")

  /** Read a JSONL text file (or directory) with an explicit schema.
    * Explicit schema, not inference: inference reads the data twice and
    * is non-deterministic under dirty rows — never acceptable at scale.
    */
  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    parseJsonl(spark.read.text(path).withColumnRenamed("value", "line"), schema)

  /** Write a DataFrame as JSONL lines. */
  def write(df: DataFrame, path: String): Unit =
    toJsonl(df).write.mode("overwrite").text(path)

  /** #58: serialize→parse round-trip of the documents table; the result
    * must equal the source rows exactly (including JSON string escaping
    * of the text payload — the part a hand-rolled formatter gets wrong).
    */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars", "source", "text")
    parseJsonl(toJsonl(docs), docs.schema)
  }

  val roundtripSql: String =
    "SELECT doc_id, lang, n_chars, source, text FROM documents"
}
