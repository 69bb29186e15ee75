package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.Tables

/** CSV source/sink via per-row codegen'd `to_csv`/`from_csv` column
  * expressions — same shape as [[Jsonl]]: serialization is a pure map
  * stage, no shuffle, and an explicit schema (inference double-reads
  * and is non-deterministic under dirty rows). Quoting/escaping of
  * delimiter and quote characters in the payload is the part a
  * hand-rolled formatter gets wrong and the roundtrip oracle checks.
  */
object Csv {

  /** Serialize to CSV lines (one string column `line`). */
  def toCsvLines(df: DataFrame): DataFrame =
    df.select(to_csv(struct(df.columns.map(col): _*)).as("line"))

  /** Parse CSV lines back into typed columns with `schema`. */
  def parseCsv(lines: DataFrame, schema: StructType): DataFrame =
    lines.select(from_csv(col("line"), schema, Map.empty[String, String]).as("c"))
      .select("c.*")

  /** Read a CSV text file (or directory) with an explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    parseCsv(spark.read.text(path).withColumnRenamed("value", "line"), schema)

  /** Write a DataFrame as CSV lines. */
  def write(df: DataFrame, path: String): Unit =
    toCsvLines(df).write.mode("overwrite").text(path)

  /** #72: serialize→parse round-trip of the documents table; must equal
    * the source rows exactly.
    */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars", "source", "text")
    parseCsv(toCsvLines(docs), docs.schema)
  }

  val roundtripSql: String =
    "SELECT doc_id, lang, n_chars, source, text FROM documents"
}
