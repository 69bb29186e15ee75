package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** Shannon-entropy quality signals — the information-theoretic member of
  * the text-quality family (heuristic ratios #32, repetition #64,
  * perplexity #107): character-level entropy H_char (bits/char) catches
  * gibberish, binary-pasted-as-text and single-char floods (H → 0),
  * while word-level entropy H_word catches keyword stuffing and
  * generation loops that per-word ratios miss. Both are standard cheap
  * pre-training filters (e.g. the entropy gates in C4/RefinedWeb-style
  * cleaning stacks) and need no model.
  *
  * Plan (100 TB shape): explode to (doc, symbol) rows, collapse to
  * per-doc symbol counts with a map-side-combining aggregate (shuffle
  * bytes bounded by per-doc VOCABULARY — for chars ≤ alphabet size, for
  * words the same bound as #64), then one more doc-keyed aggregate.
  * Entropy is Σ −(c/n)·log2(c/n): the count ratio is one
  * correctly-rounded division, log2 (transcendental) is grid-quantized
  * at scale 6 per the house rule, the product is one more
  * correctly-rounded op, and the per-doc sum is order-independent via
  * decSum(9); the final negation happens AFTER the sum (quantize-then-
  * negate, mirrored literally — see text_perplexity for the tie rule).
  */
object Entropy {

  /** #132: per-document (n_chars_obs, n_words, h_char, h_word). */
  def entropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def perSymbol(sym: DataFrame): DataFrame = {
      // sym: (doc_id, s) one row per symbol occurrence
      val counts = sym.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("doc_id").agg(sum("c").as("n"))
      val x = col("c").cast("double") / col("n").cast("double")
      counts.join(totals, "doc_id")
        .select(col("doc_id"), col("n"),
          (x * Exact.roundS(log2(x), 6)).as("term"))
        .groupBy("doc_id")
        .agg(first("n").as("n"), (-Exact.decSum(col("term"), 9)).as("h"))
    }
    val chars = perSymbol(docs.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("s")))
      .select(col("doc_id"), col("n").as("n_chars_obs"), col("h").as("h_char"))
    val wordsH = perSymbol(docs.select(col("doc_id"),
      explode(TextAnalysis.words).as("s")))
      .select(col("doc_id"), col("n").as("n_words"), col("h").as("h_word"))
    chars.join(wordsH, "doc_id")
      .select("doc_id", "n_chars_obs", "n_words", "h_char", "h_word")
  }

  val entropySql: String = {
    def per(srcSql: String): String =
      s"""SELECT doc_id, MAX(n) AS n,
         |    -${Exact.duckSum("term", 9)} AS h
         |  FROM (
         |    SELECT doc_id, n, x * ${Exact.duckRoundS("log2(x)", 6)} AS term
         |    FROM (
         |      SELECT doc_id, SUM(c) OVER (PARTITION BY doc_id) AS n,
         |        CAST(c AS DOUBLE) / CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE) AS x
         |      FROM (SELECT doc_id, s, COUNT(*) AS c FROM ($srcSql) GROUP BY 1, 2)
         |    )
         |  ) GROUP BY doc_id""".stripMargin
    val charSrc = "SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS s FROM documents"
    val wordSrc = "SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS s FROM documents"
    s"""WITH hc AS (
       |  ${per(charSrc)}
       |), hw AS (
       |  ${per(wordSrc)}
       |)
       |SELECT hc.doc_id, CAST(hc.n AS BIGINT) AS n_chars_obs,
       |  CAST(hw.n AS BIGINT) AS n_words,
       |  hc.h AS h_char, hw.h AS h_word
       |FROM hc JOIN hw ON hc.doc_id = hw.doc_id""".stripMargin
  }
}
