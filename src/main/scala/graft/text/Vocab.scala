package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Tokenizer-training primitive: one BPE merge round over the corpus —
  * count adjacent character-pair frequencies within words and rank the
  * merge candidates. Iterating this (merge top pair → recount) is
  * exactly byte-pair-encoding vocabulary induction (Sennrich et al.
  * ACL'16); the operator exposes the distributed inner loop.
  *
  * 100 TB shape: one pass over the text (chars never leave their row
  * until reduced to pair counts), one groupBy(pair) whose key space is
  * |alphabet|² — a tiny shuffle regardless of corpus size — and a
  * top-k over that small frame. The iterated version keeps the corpus
  * tokenized as arrays and rewrites only rows containing the merged
  * pair (a filtered map per round).
  */
object Vocab {

  val TopK = 20

  /** #63: top-[[TopK]] adjacent char pairs by corpus frequency. */
  def pairMerges(spark: SparkSession, dir: String): DataFrame = {
    val chars = split(col("w"), "")
    val pairs = zip_with(
      slice(col("cs"), lit(1), size(col("cs")) - 1),
      slice(col("cs"), lit(2), size(col("cs")) - 1),
      (x, y) => concat(x, y))
    Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(chars.as("cs"))
      .filter(size(col("cs")) >= 2)
      .select(explode(pairs).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("pair").asc)))
      .filter(col("rnk") <= TopK)
      .select("pair", "n", "rnk")
  }

  val pairMergesSql: String =
    s"""WITH w AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents
       |), cs AS (
       |  SELECT string_split(w, '') AS cs FROM w
       |), p AS (
       |  SELECT unnest(list_transform(range(1, len(cs)), j -> cs[j] || cs[j+1])) AS pair
       |  FROM cs WHERE len(cs) >= 2
       |)
       |SELECT pair, COUNT(*) AS n,
       |  ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair ASC) AS rnk
       |FROM p GROUP BY pair
       |QUALIFY rnk <= $TopK""".stripMargin
}
