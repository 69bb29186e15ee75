package graft.sources


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** #113: partitioned-parquet sink → pruned read — the layout/read pair
  * every 100 TB corpus lives by: write `partitionBy(lang)` (hive-style
  * `lang=xx/` directories), read back with a partition-column filter,
  * and the scan must PRUNE — list and read only the matching directory,
  * never touching the other partitions' files. The spec asserts the
  * physical plan carries the filter in `PartitionFilters` (pruning at
  * planning time), which is the difference between reading 1/5th of the
  * corpus and all of it.
  *
  * The query emits the pruned partition's rows; the oracle is the same
  * filter over the source table — exact row parity proves the
  * write→prune→read path loses and invents nothing (including the
  * partition column itself, which parquet stores in the directory name
  * and the reader reconstructs).
  */
object ParquetPartitioned {

  val PruneLang = "en"

  /** Write the documents table partitioned by lang to a fresh temp dir,
    * read it back pruned to [[PruneLang]].
    */
  def prunedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars", "source", "text")
    val out = graft.core.TempDirs.stagedFor((spark, dir, "part_lang"),
      "graft_part_")(p =>
      docs.write.mode("overwrite").partitionBy("lang").parquet(p))
    spark.read.parquet(out)
      .filter(col("lang") === PruneLang)
      .select("doc_id", "lang", "n_chars", "source", "text")
  }

  val prunedRoundtripSql: String =
    s"""SELECT doc_id, lang, n_chars, source, text
       |FROM documents WHERE lang = '$PruneLang'""".stripMargin
}
