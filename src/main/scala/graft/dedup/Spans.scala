package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Substring-level (span) deduplication — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better",
  * ExactSubstr) counterpart of the document-level dedup block: instead
  * of dropping whole near-duplicate documents, find the REPEATED SPANS
  * inside otherwise-unique documents (boilerplate headers, license
  * blocks, templated paragraphs) and report how much of each document
  * they cover — the per-doc artifact a span-stripping rewrite consumes.
  *
  * The reference method builds a corpus-wide suffix array; distributed,
  * the standard approximation is fixed-k gram fingerprinting: any
  * repeated substring of length ≥ K words contains a repeated K-gram,
  * so K-gram detection finds every such span (with boundaries rounded
  * to K-gram granularity — a superset at the ends, never a miss). We
  * take K = 8 words, the same width the decontamination gate (#62) uses.
  *
  * Plan (100 TB shape): one positional gram explode (n_tokens rows of
  * (doc_id, position, 60-bit hash) — the text itself never moves), a
  * map-side-combining count keyed on the gram hash, a shuffle join of
  * positions against the `count > 1` survivors on the same key, then
  * per-document interval merging with a doc_id-partitioned window
  * (bounded by document length). Skewed gram hashes (a boilerplate gram
  * appearing millions of times) cost nothing here because the count
  * aggregate combines map-side and the join back only tags positions —
  * fan-out is per-occurrence, never per-pair (contrast the pair-joins
  * in the doc-level dedup ops, which this operator exists to avoid).
  */
object Spans {

  val K = 8 // span granularity in words (matches Decontaminate.N)

  /** #131: per-document repeated-span report: how many word positions
    * sit inside a span whose 8-gram content appears elsewhere in the
    * corpus (or again in the same document). Overlapping/adjacent hit
    * intervals [p, p+K-1] merge into maximal spans (gaps-and-islands).
    */
  def spans(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.text.TextAnalysis.words.as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        greatest(size(col("ws")) - (K - 1), lit(0)).as("n_grams"), col("ws"))
    // positional gram hashes: p is the 1-based word offset of the gram
    val grams = base.filter(col("n_grams") > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("ws")) - K),
          j => PortableHash.pHash(concat_ws(" ", slice(col("ws"), j + 1, lit(K)))))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("gh"))
    val repeated = grams.groupBy("gh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("gh")
    val hits = grams.join(repeated, "gh").select("doc_id", "p")
    // gaps-and-islands: a hit at p covers [p, p+K-1]; merge when the next
    // hit starts at or before prev_end + 1 (overlap or word-adjacent)
    val wOrd = Window.partitionBy("doc_id").orderBy("p")
    val islands = hits
      .withColumn("prev_end",
        max(col("p") + (K - 1)).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("p") > col("prev_end") + 1, 1).otherwise(0))
      .withColumn("span_id", sum("new_span").over(wOrd))
    val perDoc = islands.groupBy("doc_id", "span_id")
      .agg(min("p").as("s"), (max("p") + (K - 1)).as("e"), count(lit(1)).as("n_hits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("n_hits").as("n_rep_grams"),
        sum(col("e") - col("s") + 1).as("covered_words"))
    base.select("doc_id", "n_words", "n_grams")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_grams"),
        coalesce(col("n_rep_grams"), lit(0L)).as("n_rep_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"),
        (coalesce(col("covered_words"), lit(0L)).cast("double") /
          col("n_words")).as("coverage"))
  }

  val spansSql: String = {
    val gram = (1 until K).foldLeft("ws[j]")((acc, k) => s"$acc || ' ' || ws[j+$k]")
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
       |), base AS (
       |  SELECT doc_id, len(ws) AS n_words,
       |    greatest(len(ws) - ${K - 1}, 0) AS n_grams, ws FROM d
       |), g AS (
       |  SELECT doc_id, j AS p, ${PortableHash.duck(gram)} AS gh
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${K - 2})) AS j
       |        FROM base WHERE n_grams > 0)
       |), rep AS (
       |  SELECT gh FROM g GROUP BY gh HAVING COUNT(*) > 1
       |), hits AS (
       |  SELECT doc_id, p FROM g WHERE gh IN (SELECT gh FROM rep)
       |), isl AS (
       |  SELECT doc_id, p,
       |    CASE WHEN prev_end IS NULL OR p > prev_end + 1 THEN 1 ELSE 0 END AS new_span
       |  FROM (SELECT doc_id, p,
       |          MAX(p + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY p
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |        FROM hits)
       |), sp AS (
       |  SELECT doc_id, span_id, MIN(p) AS s, MAX(p) + ${K - 1} AS e,
       |    COUNT(*) AS n_hits
       |  FROM (SELECT doc_id, p, SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
       |        FROM isl)
       |  GROUP BY doc_id, span_id
       |), perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_spans, SUM(n_hits) AS n_rep_grams,
       |    SUM(e - s + 1) AS covered_words
       |  FROM sp GROUP BY doc_id
       |)
       |SELECT base.doc_id, CAST(n_words AS INT) AS n_words,
       |  CAST(n_grams AS INT) AS n_grams,
       |  CAST(COALESCE(n_rep_grams, 0) AS BIGINT) AS n_rep_grams,
       |  CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(covered_words, 0) AS BIGINT) AS covered_words,
       |  CAST(COALESCE(covered_words, 0) AS DOUBLE) / n_words AS coverage
       |FROM base LEFT JOIN perdoc ON base.doc_id = perdoc.doc_id""".stripMargin
  }
}
