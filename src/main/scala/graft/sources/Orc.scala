package graft.sources


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** #123: ORC source/sink roundtrip — the third columnar interchange
  * format next to parquet (the native corpus layout) and JSONL/CSV (the
  * text interchange pair, #58/#72). ORC matters in practice because Hive
  * warehouses and Trino/Presto lakes still hold exabytes of it: an
  * engine that cannot READ a partner's ORC cannot ingest their corpus.
  * Spark's ORC support is built in (vectorized reader, predicate
  * pushdown into stripe/row-group min-max indexes — the same pruning
  * contract as parquet).
  *
  * The query writes the documents table as ORC files, reads them back
  * with a pushed filter, and must lose and invent nothing; the oracle is
  * the same filter over the source table. The filter is deliberately on
  * a NON-partition column so what's exercised is ORC's predicate
  * pushdown path (`PushedFilters` in the scan), not directory pruning
  * (#113 owns that).
  */
object Orc {

  /** Filter: mid-range doc lengths — selective but multi-row. */
  val LoChars = 300
  val HiChars = 600

  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars", "source", "text")
    val out = graft.core.TempDirs.stagedFor((spark, dir, "orc"),
      "graft_orc_")(p => docs.write.mode("overwrite").orc(p))
    spark.read.orc(out)
      .filter(col("n_chars") >= LoChars && col("n_chars") <= HiChars)
      .select("doc_id", "lang", "n_chars", "source", "text")
  }

  val roundtripSql: String =
    s"""SELECT doc_id, lang, n_chars, source, text
       |FROM documents WHERE n_chars >= $LoChars AND n_chars <= $HiChars""".stripMargin
}
