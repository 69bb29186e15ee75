package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, winnowing fingerprints.
  *
  * These extend the reference's capability surface toward LLM
  * training-data pipelines (per the build brief); there is no reference
  * implementation to cite — semantics follow the standard literature
  * (winnowing: Schleimer/Wilkerson/Aiken SIGMOD'03).
  *
  * All operators are per-document column math (map-only, codegen'd); the
  * only shuffles are the final per-source/per-doc aggregations. At 100 TB
  * each scales linearly: no cross-document joins anywhere.
  */
object TextAnalysis {

  /** Whitespace tokenization shared by all four operators. */
  private[graft] val words: Column = split(trim(col("text")), "\\s+")

  private[graft] val duckWords = "regexp_split_to_array(trim(text), '\\s+')"

  // ------------------------------------------------------------- lang id

  /** Deterministic "stopword-profile" language ID: each vocabulary word
    * is assigned to one of 5 language profiles by pHash(word) % 5; the
    * predicted language is the profile owning the most tokens of the
    * document (ties → lexicographically first language). A real pipeline
    * swaps the hash profile for curated per-language stopword lists; the
    * operator shape (explode → per-doc argmax, one shuffle on doc_id) is
    * identical.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), words.as("ws"))
    val byDoc = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("pred_lang").asc)
    d.select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
      .withColumn("pred_lang",
        element_at(array(langs.map(lit): _*), (PortableHash.pHash(col("w")) % 5).cast("int") + 1))
      .groupBy("doc_id", "lang", "pred_lang")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("pred_lang"),
        (col("pred_lang") === col("lang")).cast("int").as("correct"))
  }

  val langIdSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang,
       |    ['de','en','es','fr','zh'][CAST(${PortableHash.duck("w")} % 5 AS INT) + 1] AS pred_lang
       |  FROM (SELECT doc_id, lang, unnest($duckWords) AS w FROM documents)
       |), c AS (
       |  SELECT doc_id, lang, pred_lang, COUNT(*) AS cnt FROM w GROUP BY 1, 2, 3
       |)
       |SELECT doc_id, pred_lang,
       |  CAST(pred_lang = lang AS INT) AS correct
       |FROM c
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, pred_lang ASC) = 1""".stripMargin

  /** #143: language-ID EVALUATION table — per-language precision /
    * recall / F1 of [[langId]] against the gold labels, the diagnostic
    * a per-doc `correct` flag (#31) cannot show: a classifier can post
    * high accuracy while silently absorbing a minority language into a
    * majority one (high-recall/low-precision majority, zero-recall
    * minority), and ONLY the per-class table exposes it. This is the
    * acceptance gate run before swapping in any new lang-ID model.
    *
    * Plan: the per-doc prediction frame (shared with #31), then two
    * dictionary-small aggregates — per true lang (n_true, tp) and per
    * predicted lang (n_pred) — joined on the 5-key language space.
    * Counts are integers; precision/recall are single exact divisions
    * and F1 is one literal-order chain mirrored by the oracle.
    */
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    val pred = langId(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
    val byTrue = pred.groupBy("lang").agg(
      count(lit(1)).as("n_true"),
      sum((col("pred_lang") === col("lang")).cast("long")).as("tp"))
    val byPred = pred.groupBy(col("pred_lang").as("lang"))
      .agg(count(lit(1)).as("n_pred"))
    byTrue.join(byPred, Seq("lang"), "full")
      .select(col("lang"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred"))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("n_true") > 0, col("tp").cast("double") / col("n_true"))
          .otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  val langIdEvalSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang,
       |    ['de','en','es','fr','zh'][CAST(${PortableHash.duck("w")} % 5 AS INT) + 1] AS pred_lang
       |  FROM (SELECT doc_id, lang, unnest($duckWords) AS w FROM documents)
       |), c AS (
       |  SELECT doc_id, lang, pred_lang, COUNT(*) AS cnt FROM w GROUP BY 1, 2, 3
       |), p AS (
       |  SELECT doc_id, lang, pred_lang FROM c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, pred_lang ASC) = 1
       |), bt AS (
       |  SELECT lang, COUNT(*) AS n_true,
       |    SUM(CAST(pred_lang = lang AS BIGINT)) AS tp
       |  FROM p GROUP BY lang
       |), bp AS (
       |  SELECT pred_lang AS lang, COUNT(*) AS n_pred FROM p GROUP BY 1
       |), j AS (
       |  SELECT COALESCE(bt.lang, bp.lang) AS lang,
       |    COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred,
       |    CAST(COALESCE(tp, 0) AS BIGINT) AS tp
       |  FROM bt FULL OUTER JOIN bp ON bt.lang = bp.lang
       |), pr AS (
       |  SELECT lang, n_true, n_pred, tp,
       |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END AS precision,
       |    CASE WHEN n_true > 0 THEN CAST(tp AS DOUBLE) / n_true ELSE 0.0 END AS recall
       |  FROM j
       |)
       |SELECT lang, n_true, n_pred, tp, precision, recall,
       |  CASE WHEN precision + recall > 0
       |    THEN 2.0 * precision * recall / (precision + recall)
       |    ELSE 0.0 END AS f1
       |FROM pr""".stripMargin

  // ------------------------------------------------------- quality score

  private[graft] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** The stop list as a DuckDB IN-list (shared with streaming oracle). */
  private[graft] val duckStopList: String =
    stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Quality-score building blocks over a frame carrying `ws` (token
    * array) and `n_chars` — shared with the streaming quality filter
    * ([[graft.streaming.DocStreams]]), where the same codegen'd
    * expressions run per micro-batch.
    */
  private[graft] val nWords = size(col("ws")).cast("double")
  private[graft] val stopRatio = size(filter(col("ws"),
    w => w.isInCollection(stopwords))).cast("double") / nWords
  private[graft] val uniqRatio = size(array_distinct(col("ws"))).cast("double") / nWords
  private[graft] val avgWordLen =
    (col("n_chars").cast("double") - (nWords - lit(1.0))) / nWords
  private[graft] val quality =
    lit(0.3) * least(nWords / 50.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.2) * least(avgWordLen / 8.0, lit(1.0)) +
      lit(0.2) * uniqRatio

  /** DuckDB fragment mirroring [[quality]] over columns `ws` (token
    * array) and `n_chars` — the SINGLE oracle-side copy of the formula.
    * Used by the batch oracle below, the streaming quality-filter oracle
    * ([[graft.streaming.DocStreams]]) and the corpus-clean funnel oracle
    * ([[graft.pipeline.CorpusClean]]), so the three cannot drift.
    */
  private[graft] val duckQuality: String =
    s"""CAST(0.3 AS DOUBLE) * least(CAST(len(ws) AS DOUBLE) / 50.0, 1.0)
       |      + CAST(0.3 AS DOUBLE) * (1.0 - CAST(len(list_filter(ws, w -> w IN $duckStopList)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))
       |      + CAST(0.2 AS DOUBLE) * least(((CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1.0)) / CAST(len(ws) AS DOUBLE)) / 8.0, 1.0)
       |      + CAST(0.2 AS DOUBLE) * (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))""".stripMargin

  /** Length / stopword-ratio / vocabulary-diversity quality score in
    * [0, 1] (the usual pre-training heuristic filter shape).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), words.as("ws"))
      .select(
        col("doc_id"),
        col("n_chars"),
        nWords.cast("long").as("n_words"),
        // No decimal rounding here: every term is rational double math
        // (correctly-rounded IEEE ops, identical in any engine). Rounding
        // would ADD a cross-engine hazard: exactly-representable ties
        // round half-even in Spark but half-up in DuckDB.
        stopRatio.as("stop_ratio"),
        uniqRatio.as("uniq_ratio"),
        quality.as("quality"))

  val qualityScoreSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars, $duckWords AS ws FROM documents
       |)
       |SELECT doc_id, n_chars, CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(len(list_filter(ws, w -> w IN $duckStopList)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS stop_ratio,
       |  CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS uniq_ratio,
       |  $duckQuality AS quality
       |FROM d""".stripMargin

  // ------------------------------------------------------ quality buckets

  /** #84: CC-Net-style per-language quality tiers (Wenzek et al. 2020
    * bucket documents by per-language model score into head/middle/tail;
    * here four quartile tiers of [[quality]]): exact R-7 quartile
    * boundaries per language, then a map-side bucket assignment and a
    * per-(lang, bucket) report.
    *
    * Exactness: the score is quantized to the 1e-6 integer grid FIRST
    * (`qi = floor(q·1e6 + 0.5)`, an integral double), so the quartile
    * interpolation runs over integers with dyadic p — every interpolated
    * term is a denominator-4 dyadic, exact in both engines (the
    * [[docLengthStats]] argument) — and the `qi ≤ boundary` compares are
    * exact.
    *
    * Scale (100 TB): the boundary table is |langs|×3 — computed with one
    * small-key groupBy and BROADCAST back, so the corpus-side pass is
    * map-only plus one (lang, bucket)-keyed aggregate. Exact `percentile`
    * holds per-group values; at real scale the same boundaries come from
    * a (lang, qi) histogram groupBy — the grid is only 1e6 cells, so the
    * cumulative-count walk is exact AND bounded — or `approx_percentile`
    * when grid resolution can be sacrificed.
    */
  def qualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), words.as("ws"))
      .select(col("lang"), floor(quality * 1e6 + lit(0.5)).as("qi"))
    val bounds = d.groupBy("lang")
      .agg(expr("percentile(qi, array(0.25D, 0.5D, 0.75D))").as("b"))
      .select(col("lang"), element_at(col("b"), 1).as("b25"),
        element_at(col("b"), 2).as("b50"), element_at(col("b"), 3).as("b75"))
    d.join(broadcast(bounds), "lang")
      .withColumn("bucket",
        when(col("qi") <= col("b25"), 0)
          .when(col("qi") <= col("b50"), 1)
          .when(col("qi") <= col("b75"), 2)
          .otherwise(3))
      .groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("qi").cast("long")).cast("double") / count(lit(1)) / lit(1e6))
          .as("mean_q"),
        (min("qi") / lit(1e6)).as("min_q"),
        (max("qi") / lit(1e6)).as("max_q"))
  }

  val qualityBucketsSql: String =
    s"""WITH d AS (
       |  SELECT lang, floor(($duckQuality) * 1000000.0 + 0.5) AS qi
       |  FROM (SELECT doc_id, lang, n_chars, $duckWords AS ws FROM documents)
       |), b AS (
       |  SELECT lang, quantile_cont(qi, 0.25) AS b25,
       |         quantile_cont(qi, 0.5) AS b50, quantile_cont(qi, 0.75) AS b75
       |  FROM d GROUP BY lang
       |)
       |SELECT d.lang,
       |  CASE WHEN qi <= b25 THEN 0 WHEN qi <= b50 THEN 1
       |       WHEN qi <= b75 THEN 2 ELSE 3 END AS bucket,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CAST(qi AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_q,
       |  MIN(qi) / 1000000.0 AS min_q,
       |  MAX(qi) / 1000000.0 AS max_q
       |FROM d JOIN b ON b.lang = d.lang
       |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------- token counts

  /** Whitespace + BPE-ish regex token counts, aggregated per source. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        size(words).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("bpe_tokens"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("ws_tokens_total"),
        sum("bpe_tokens").as("bpe_tokens_total"),
        (sum("ws_tokens").cast("double") / count(lit(1))).as("avg_ws_tokens"))

  val tokenCountSql: String =
    s"""WITH d AS (
       |  SELECT source,
       |    len($duckWords) AS ws_tokens,
       |    len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens
       |  FROM documents
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens_total,
       |  CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens_total,
       |  CAST(SUM(ws_tokens) AS DOUBLE) / COUNT(*) AS avg_ws_tokens
       |FROM d GROUP BY source""".stripMargin

  // -------------------------------------------------- winnowing fingerprint

  /** Winnowing fingerprints: min pHash over each 5-window of word 4-gram
    * hashes; output the distinct selected hashes per document. Robust
    * near-dup fingerprint (shared substrings → shared fingerprints).
    *
    * The window-min is FIVE shifted slices of `grams` zipped with
    * elementwise `least` — NOT `array_min(slice(grams, j, 5))` inside a
    * transform lambda: `grams` (an md5-per-gram generator) referenced
    * once from a lambda body gets collapsed INTO the lambda and
    * re-hashed per window (the [[graft.kge.Embeddings.emb]] trap).
    * Five references also stop CollapseProject from inlining the
    * generator.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val grams = transform(sequence(lit(0), size(col("ws")) - 4),
      j => PortableHash.pHash(concat_ws(" ", slice(col("ws"), j + 1, lit(4)))))
    val winLen = size(col("grams")) - 4
    def sh(k: Int) = slice(col("grams"), lit(k + 1), winLen)
    val wins = zip_with(
      zip_with(zip_with(sh(0), sh(1), least(_, _)), sh(2), least(_, _)),
      zip_with(sh(3), sh(4), least(_, _)), least(_, _))
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 8)
      .withColumn("grams", grams)
      .select(col("doc_id"), explode(array_distinct(wins)).as("fp"))
      .distinct()
  }

  val fingerprintSql: String = {
    val gram = "words[j] || ' ' || words[j+1] || ' ' || words[j+2] || ' ' || words[j+3]"
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS words FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(words) - 2), j -> ${PortableHash.duck(gram)}) AS grams
       |  FROM d WHERE len(words) >= 8
       |)
       |SELECT DISTINCT doc_id,
       |  unnest(list_distinct(list_transform(range(1, len(grams) - 3),
       |    j -> list_min(grams[j:j+4])))) AS fp
       |FROM g""".stripMargin
  }

  // ------------------------------------------------- length distribution

  /** #57: per-source document-length distribution: count, min/max, exact
    * mean and exact interpolated quartiles of `n_chars`. Spark's exact
    * `percentile` and DuckDB's `quantile_cont` share R-7 semantics
    * (position (n−1)·p, linear interpolation); with integer inputs and
    * dyadic p the interpolation is IEEE-exact in both engines. One
    * groupBy(source) shuffle; exact percentile holds per-group values,
    * so at 100 TB the grouping key must bound group size (per-source is
    * fine; per-corpus would switch to `approx_percentile`, the
    * documented scale path).
    */
  def docLengthStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        (sum("n_chars").cast("double") / count(lit(1))).as("mean_chars"),
        expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D))").as("q"))
      .select(col("source"), col("n_docs"), col("min_chars"), col("max_chars"),
        col("mean_chars"),
        element_at(col("q"), 1).as("p25"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p75"))

  val docLengthStatsSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
       |  quantile_cont(n_chars, 0.25) AS p25,
       |  quantile_cont(n_chars, 0.5)  AS p50,
       |  quantile_cont(n_chars, 0.75) AS p75
       |FROM documents GROUP BY source""".stripMargin

  // ------------------------------------------------- repetition signals

  /** #64: Gopher-style repetition signals (Rae et al. 2021 §A1.1) per
    * document: unique-word ratio, fraction of tokens in the most
    * frequent word, fraction of bigrams in the most frequent bigram.
    * High repetition = boilerplate/spam/generation loops — a standard
    * pre-training quality gate alongside [[qualityScore]].
    *
    * Plan: explode → groupBy(doc_id, token) → groupBy(doc_id), the
    * [[Relevance.ngramLmScore]] shape. Partial aggregation collapses
    * each partition's token stream before the shuffle, so shuffle bytes
    * are per-doc VOCABULARY, not token count; no row-local O(n·u)
    * frequency lambda (which would stall codegen on million-word docs).
    * All counts are integers; the ratios are single exact divisions.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 2)
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => concat_ws(" ", x, y))
    val wordStats = d.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_uniq"),
        max("c").as("top_w"))
    val bgStats = d.select(col("doc_id"), explode(bigrams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_bg"), max("c").as("top_g"))
    wordStats.join(bgStats, "doc_id")
      .select(col("doc_id"), col("n_words"),
        (col("n_uniq").cast("double") / col("n_words")).as("uniq_ratio"),
        (col("top_w").cast("double") / col("n_words")).as("top_word_frac"),
        (col("top_g").cast("double") / col("n_bg")).as("top_bigram_frac"))
  }

  val repetitionSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS ws FROM documents
       |  WHERE len($duckWords) >= 2
       |), wc AS (
       |  SELECT doc_id, w, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM d) GROUP BY 1, 2
       |), wstat AS (
       |  SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_uniq, MAX(c) AS top_w
       |  FROM wc GROUP BY 1
       |), bc AS (
       |  SELECT doc_id, g, COUNT(*) AS c
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(ws)), j -> ws[j] || ' ' || ws[j+1])) AS g
       |        FROM d) GROUP BY 1, 2
       |), bstat AS (
       |  SELECT doc_id, SUM(c) AS n_bg, MAX(c) AS top_g FROM bc GROUP BY 1
       |)
       |SELECT wstat.doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_uniq AS DOUBLE) / CAST(n_words AS DOUBLE) AS uniq_ratio,
       |  CAST(top_w AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
       |  CAST(top_g AS DOUBLE) / CAST(n_bg AS DOUBLE) AS top_bigram_frac
       |FROM wstat JOIN bstat ON wstat.doc_id = bstat.doc_id""".stripMargin

  // ---------------------------------------------- #234 RAKE keywords

  /** RAKE phrase-boundary stopwords — the corpus's function words (the
    * synthetic vocabulary carries exactly these two; a natural corpus
    * would use the standard ~500-word list, same plan).
    */
  val RakeStops: Seq[String] = Seq("the", "a")
  /** Keywords emitted. */
  val RakeTopK = 50

  /** #234: RAKE keyword extraction (Rose et al. 2010 — Rapid Automatic
    * Keyword Extraction, the unsupervised keyphrase baseline every
    * document-understanding pipeline starts from): split each document
    * into candidate phrases at stopword boundaries, score each word by
    * degree/frequency over the phrase graph (degree = Σ length of
    * phrases containing it — co-occurrence mass; frequency = raw
    * occurrences; the ratio favors words that appear in LONG
    * multi-word phrases over ubiquitous singletons), then score a
    * phrase as the sum of its word scores and report the corpus top-K.
    *
    * Exactness: phrase segmentation is integer (a running stopword
    * count partitions each doc's position sequence; the window is
    * per-doc, bounded by doc length); degree and frequency are exact
    * integers; the word score is ONE division quantized 1e-6; the
    * phrase score an order-free decSum of quantized word scores; the
    * top-K orders by (quantized score, phrase) — fully deterministic
    * cross-engine. Identical phrases share a score by construction, so
    * the report aggregates occurrences rather than duplicating rows.
    *
    * Plan: one posexplode, one per-doc running-count window, one
    * (doc, phrase) rollup, one word-keyed aggregate joined back
    * broadcast-sized (vocabulary), TakeOrdered for the top-K — the
    * phrase fan-out never exceeds the word count, and nothing
    * data-scale sorts globally.
    */
  def rake(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val pos = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
    val isStop = col("w").isin(RakeStops: _*)
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val memb = pos
      .withColumn("grp", sum(when(isStop, 1L).otherwise(0L)).over(wRun))
      .filter(!isStop)
    val phrases = memb.groupBy("doc_id", "grp")
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .select(col("doc_id"), col("grp"),
        expr("transform(pw, x -> x.w)").as("words"),
        size(col("pw")).cast("long").as("plen"))
    val members = phrases.select(col("doc_id"), col("grp"), col("plen"),
      explode(col("words")).as("w"))
    val wscore = members.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("degree"))
      .select(col("w"), Exact.roundS(
        col("degree").cast("double") / col("freq"), 6).as("wscore"))
    val pscore = members.join(broadcast(wscore), "w")
      .groupBy("doc_id", "grp")
      .agg(Exact.decSum(col("wscore"), 6).as("score"))
    phrases.join(pscore, Seq("doc_id", "grp"))
      .select(concat_ws(" ", col("words")).as("phrase"), col("plen"),
        col("score"))
      .groupBy("phrase")
      .agg(max("plen").as("plen"), count(lit(1)).as("n_occurrences"),
        max("score").as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(RakeTopK)
  }

  val rakeSql: String = {
    import graft.core.Exact
    val stops = RakeStops.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""WITH d AS (SELECT doc_id, $duckWords AS ws FROM documents),
       |pos AS (
       |  SELECT doc_id, x.pos AS pos, x.w AS w FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
       |      i -> struct_pack(pos := i, w := ws[i]))) AS x
       |    FROM d)
       |), memb AS (
       |  SELECT doc_id, pos, w, grp FROM (
       |    SELECT *, SUM(CASE WHEN w IN $stops THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |    FROM pos)
       |  WHERE w NOT IN $stops
       |), phr AS (
       |  SELECT doc_id, grp, list(w ORDER BY pos) AS words,
       |    COUNT(*) AS plen
       |  FROM memb GROUP BY 1, 2
       |), wsc AS (
       |  SELECT w, ${Exact.duckRoundS(
                "CAST(degree AS DOUBLE) / freq", 6)} AS wscore
       |  FROM (
       |    SELECT m.w, COUNT(*) AS freq,
       |      CAST(SUM(p.plen) AS BIGINT) AS degree
       |    FROM memb m JOIN phr p USING (doc_id, grp)
       |    GROUP BY 1)
       |), ps AS (
       |  SELECT doc_id, grp, ${Exact.duckSum("wscore", 6)} AS score
       |  FROM memb JOIN wsc USING (w) GROUP BY 1, 2
       |)
       |SELECT array_to_string(words, ' ') AS phrase,
       |  CAST(MAX(plen) AS BIGINT) AS plen,
       |  COUNT(*) AS n_occurrences, MAX(score) AS score
       |FROM phr JOIN ps USING (doc_id, grp)
       |GROUP BY 1
       |ORDER BY score DESC, phrase ASC LIMIT $RakeTopK""".stripMargin
  }

  // ------------------------------------------------ #269 readability

  /** #269: READABILITY — Flesch reading ease and Flesch–Kincaid grade
    * per document, from the two classic per-doc ratios words/sentences
    * and syllables/words (Flesch 1948; Kincaid 1975): the curation
    * signal that separates fluent prose from keyword soup and legalese,
    * orthogonal to #32's stopword/diversity score (a keyword list can
    * have perfect uniq_ratio and no sentences at all).
    *
    * Pinned heuristics (a readability score is its formula + its
    * counters — both engines run the identical pinned definitions):
    * sentences = maximal runs of [.!?] (clamped to ≥1 so fragment-only
    * docs stay defined); syllables = maximal vowel-group runs
    * [aeiouy]+ over the lowercased text (the standard vowel-run
    * approximation; zero-vowel tokens contribute none). Both are
    * simple character-class regexes with identical semantics in
    * Java's engine and DuckDB's RE2.
    *
    * Exactness: all three counters are integers; both scores are fixed
    * literal IEEE trees of two divisions each. Scale: map-only over
    * documents — no shuffle at all; the regex work fuses into the scan
    * stage inside whole-stage codegen.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"), words.as("ws"))
      .select(col("doc_id"), col("lang"),
        size(col("ws")).cast("long").as("n_words"),
        greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))")
          .cast("long"), lit(1L)).as("n_sentences"),
        expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
          .cast("long").as("n_syllables"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        (lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
          .as("flesch"),
        (lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
          - lit(15.59)).as("fk_grade"))

  val readabilitySql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len($duckWords) AS BIGINT) AS n_words,
       |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
       |      AS BIGINT) AS n_sentences,
       |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
       |      AS BIGINT) AS n_syllables
       |  FROM documents
       |)
       |SELECT doc_id, lang, n_words, n_sentences, n_syllables,
       |  206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
       |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) AS flesch,
       |  0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
       |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
       |    - 15.59 AS fk_grade
       |FROM d""".stripMargin

  // ------------------------------------- #271 score rank correlation

  /** #271: SPEARMAN RANK CORRELATION between the quality score (#32)
    * and document length, per language — the metric-redundancy audit a
    * curation pipeline runs before stacking filters: if two signals
    * rank the corpus near-identically (|ρ| → 1) the second filter adds
    * thresholds, not information; near 0 they prune independent
    * failure modes. Spearman (Pearson on ranks) rather than Pearson on
    * values because quality is bounded and length heavy-tailed —
    * monotone association is the honest question.
    *
    * Exactness and scale by the #108/#224 HISTOGRAM-RANK method —
    * never a data-scale sort window: quality lives on its 1e-6
    * roundS grid and length is already integer, so both metrics rank
    * through bounded (lang, value) histograms; the AVERAGE rank of a
    * tie group (the Spearman tie convention) is cum_before +
    * (cnt+1)/2 — integer window arithmetic over the bounded frame
    * plus one exact division. Ranks normalize by n (one division of
    * exact values — affine-invariant for ρ, and it bounds the
    * quantized moment sums at ANY corpus size: x ≤ 1 keeps scale-9
    * sums inside 2^53 to ~9e6 docs per language); the five moment
    * sums quantize order-free; ρ is one fixed literal IEEE tree.
    * Corpus rows shuffle twice onto bounded histogram keyspaces and
    * once onto the 5-key moment rollup; the rank tables broadcast
    * back map-side.
    */
  def scoreCorrelation(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val scored = Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"), words.as("ws"))
      .select(col("lang"), col("n_chars").cast("long").as("c"),
        Exact.roundS(quality).as("qv"))
    def ranks(frame: DataFrame, key: String): DataFrame = {
      val w = Window.partitionBy("lang").orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
      frame.groupBy("lang", key).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", coalesce(sum("cnt").over(w), lit(0L)))
        .select(col("lang"), col(key),
          (col("cum") + (col("cnt") + 1) / lit(2.0)).as(s"r_$key"))
    }
    val n = scored.groupBy("lang").agg(count(lit(1)).as("n"))
    scored
      .join(broadcast(ranks(scored, "qv")), Seq("lang", "qv"))
      .join(broadcast(ranks(scored, "c")), Seq("lang", "c"))
      .join(broadcast(n), "lang")
      .select(col("lang"), col("n"),
        (col("r_qv") / col("n")).as("x"), (col("r_c") / col("n")).as("y"))
      .groupBy("lang")
      .agg(max("n").as("n"),
        Exact.decSum(col("x"), 9).as("sx"),
        Exact.decSum(col("y"), 9).as("sy"),
        Exact.decSum(col("x") * col("x"), 9).as("sxx"),
        Exact.decSum(col("y") * col("y"), 9).as("syy"),
        Exact.decSum(col("x") * col("y"), 9).as("sxy"))
      .select(col("lang"), col("n"),
        ((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")))
          / sqrt((col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
            * (col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n")))))
          .as("rho"))
  }

  val scoreCorrelationSql: String = {
    import graft.core.Exact
    def rankCte(key: String): String =
      s"""SELECT lang, $key,
         |    COALESCE(CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY $key
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) + (cnt + 1) / 2.0 AS r_$key
         |  FROM (SELECT lang, $key, COUNT(*) AS cnt FROM s GROUP BY 1, 2)"""
        .stripMargin
    s"""WITH d AS (
       |  SELECT lang, n_chars, $duckWords AS ws FROM documents
       |), s AS (
       |  SELECT lang, CAST(n_chars AS BIGINT) AS c,
       |    ${Exact.duckRoundS(duckQuality)} AS qv
       |  FROM d
       |), rq AS (
       |  ${rankCte("qv")}
       |), rc AS (
       |  ${rankCte("c")}
       |), nn AS (SELECT lang, COUNT(*) AS n FROM s GROUP BY 1),
       |xy AS (
       |  SELECT s.lang, nn.n, rq.r_qv / nn.n AS x, rc.r_c / nn.n AS y
       |  FROM s JOIN rq ON rq.lang = s.lang AND rq.qv = s.qv
       |         JOIN rc ON rc.lang = s.lang AND rc.c = s.c
       |         JOIN nn ON nn.lang = s.lang
       |), m AS (
       |  SELECT lang, MAX(n) AS n,
       |    ${Exact.duckSum("x", 9)} AS sx, ${Exact.duckSum("y", 9)} AS sy,
       |    ${Exact.duckSum("x * x", 9)} AS sxx,
       |    ${Exact.duckSum("y * y", 9)} AS syy,
       |    ${Exact.duckSum("x * y", 9)} AS sxy
       |  FROM xy GROUP BY 1
       |)
       |SELECT lang, n,
       |  (sxy / n - (sx / n) * (sy / n))
       |    / sqrt((sxx / n - (sx / n) * (sx / n))
       |      * (syy / n - (sy / n) * (sy / n))) AS rho
       |FROM m""".stripMargin
  }

  // --------------------------------------------- #274 chunk windows

  /** Chunk width / stride in words (overlap = W − S = 16). */
  val ChunkW = 64
  val ChunkS = 48

  /** #274: OVERLAPPING CHUNK WINDOWS — split every document into
    * fixed-width word windows with overlap (W=64, stride 48): the
    * retrieval/packing chunker every RAG index and every
    * context-window-bounded training pipeline runs ahead of embedding
    * (#29's vectors are per-chunk in production, not per-doc). Stride
    * semantics pinned: chunk i covers words [i·S+1, i·S+W], the tail
    * chunk keeps the remainder (never re-aligned — re-aligned tails
    * duplicate content nondeterministically under appends), and
    * n_chunks = 1 for docs within one window else ⌈(n−W)/S⌉+1 in
    * integer arithmetic, which covers every word: the law
    * Σ chunk_words = n + (n_chunks−1)·(W−S) is spec-pinned per doc.
    * Chunks are emitted as (index, start, length, md5 of the joined
    * window) — the hash stands in for the chunk payload so the
    * verified surface is the full chunk CONTENT without data-scale
    * string output.
    *
    * Scale: map-side generate — the explode fan-out is bounded by
    * doc length / stride, no shuffle at all; at 100 TB this is the
    * classic scan→explode→write pipeline stage.
    */
  def chunkWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_words") <= ChunkW, 1L)
          .otherwise(
            expr(s"(n_words - $ChunkW + $ChunkS - 1) DIV $ChunkS") + 1L))
      .select(col("doc_id"), col("n_words"), col("n_chunks"), col("ws"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("ci"))
      .select(col("doc_id"), col("ci").as("chunk_idx"), col("n_words"),
        col("n_chunks"), (col("ci") * ChunkS).as("start_word"),
        size(expr(s"slice(ws, ci * $ChunkS + 1, $ChunkW)")).cast("long")
          .as("chunk_words"),
        md5(concat_ws(" ", expr(s"slice(ws, ci * $ChunkS + 1, $ChunkW)")))
          .as("chunk_hash"))

  val chunkWindowsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS ws FROM documents
       |), m AS (
       |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words,
       |    CASE WHEN len(ws) <= $ChunkW THEN CAST(1 AS BIGINT)
       |         ELSE CAST((len(ws) - $ChunkW + ${ChunkS - 1}) // $ChunkS
       |              + 1 AS BIGINT) END AS n_chunks
       |  FROM d
       |), ex AS (
       |  SELECT doc_id, n_words, n_chunks, ws,
       |    UNNEST(range(0, n_chunks)) AS ci
       |  FROM m
       |)
       |SELECT doc_id, ci AS chunk_idx, n_words, n_chunks,
       |  ci * $ChunkS AS start_word,
       |  CAST(len(ws[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW]) AS BIGINT)
       |    AS chunk_words,
       |  md5(array_to_string(ws[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW],
       |    ' ')) AS chunk_hash
       |FROM ex""".stripMargin
}
