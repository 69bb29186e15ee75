package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** #191: Gopher-style quality RULE SUITE (Rae et al. 2021 §A1.1) — the
  * named-heuristic document gate next to the continuous scorer (#32)
  * and its tiers (#84): production corpora are filtered by a SUITE of
  * individually-reported rules (so a rule change is an auditable diff,
  * and a spike in one rule's violation rate is a data-drift alarm),
  * not by a single blended score. This is dq_checks' (#164) shape
  * instantiated for documents: per rule (n_docs, n_violations, n_pass,
  * pass_rate), plus the composite `gopher_keep` verdict row counting
  * docs that fail ANY rule.
  *
  * Rules (Gopher's bounds adapted to the fields this corpus carries):
  * word count in [50, 100k]; mean word length in [3, 10]; max word
  * length ≤ 20; ≥ 2 stopwords; distinct-word ratio ≥ 0.2; 1-2-char
  * word fraction ≤ 0.5.
  *
  * Exactness: every bound compares INTEGERS — ratio rules use the
  * cross-multiplied form (chars < 3·n, 5·uniq < n, 2·short > n), so
  * there is no division anywhere until the final pass_rate reports
  * (one int/int double division each).
  *
  * Scale: per-doc flags are codegen'd array folds (map-only — the doc
  * text never shuffles); the suite collapses in ONE global
  * map-side-combining aggregate of conditional counts (the Deequ
  * one-pass trick), then unpivots 7 literal rows from the single
  * aggregate row — output bounded by the suite, never the corpus.
  */
object Gopher {

  import org.apache.spark.sql.{Column, DataFrame => DF}

  /** Word-stat frame the rule suite reads (nw/chars/maxw/nstop/nuniq/
    * nshort, plus the token array `ws` and any `carry` columns passed
    * through) — factored so #191's suite and #301's gate-agreement table
    * evaluate the SAME stat expressions and cannot drift.
    */
  private[graft] def stats(docs: DF, carry: String*): DF =
    docs.select(carry.map(col) :+ col("n_chars") :+
        TextAnalysis.words.as("ws"): _*)
      .select(carry.map(col) ++ Seq(
        col("n_chars"), col("ws"),
        size(col("ws")).cast("long").as("nw"),
        aggregate(col("ws"), lit(0L), (a, w) => a + length(w)).as("chars"),
        array_max(transform(col("ws"), w => length(w))).cast("long").as("maxw"),
        size(filter(col("ws"), w => w.isInCollection(TextAnalysis.stopwords)))
          .cast("long").as("nstop"),
        size(array_distinct(col("ws"))).cast("long").as("nuniq"),
        size(filter(col("ws"), w => length(w) <= 2)).cast("long")
          .as("nshort")): _*)

  /** The six violation predicates over the [[stats]] columns (shared by
    * #191 and #301). Every bound compares integers — cross-multiplied
    * ratio forms, no division.
    */
  private[graft] val violations: Seq[(String, Column)] = Seq(
    "v1" -> (col("nw") < 50 || col("nw") > 100000),
    "v2" -> (col("chars") < lit(3) * col("nw") ||
      col("chars") > lit(10) * col("nw")),
    "v3" -> (col("maxw") > 20),
    "v4" -> (col("nstop") < 2),
    "v5" -> (col("nuniq") * 5 < col("nw")),
    "v6" -> (col("nshort") * 2 > col("nw")))

  private[graft] val vAny: Column = violations.map(_._2).reduce(_ || _)

  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val flags = stats(Tables.documents(spark, dir))
      .select(violations.map { case (n, c) => c.as(n) }: _*)
      .withColumn("vAny",
        col("v1") || col("v2") || col("v3") || col("v4") || col("v5") || col("v6"))
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).as("x" + c)
    val agg = flags.agg(count(lit(1)).as("n_docs"),
      cnt("v1"), cnt("v2"), cnt("v3"), cnt("v4"), cnt("v5"), cnt("v6"), cnt("vAny"))
    val names = Seq(
      "v1" -> "word_count_50_100000", "v2" -> "mean_word_len_3_10",
      "v3" -> "max_word_len_20", "v4" -> "min_stopwords_2",
      "v5" -> "uniq_word_ratio_0.2", "v6" -> "short_word_frac_0.5",
      "vAny" -> "gopher_keep")
    agg.select(explode(array(names.map { case (c, nm) =>
        struct(lit(nm).as("rule"), col("n_docs"),
          col("x" + c).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_docs").as("n_docs"),
        col("r.n_violations").as("n_violations"))
      .withColumn("n_pass", col("n_docs") - col("n_violations"))
      .withColumn("pass_rate",
        col("n_pass").cast("double") / col("n_docs").cast("double"))
  }

  /** Stats select-list fragment over a frame exposing `ws` — the SQL
    * mirror of [[stats]], shared with #301's oracle.
    */
  private[graft] val duckStatsList: String =
    s"""len(ws) AS nw,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(ws, w -> length(w))), (a, x) -> a + x) AS chars,
       |    list_max(list_transform(ws, w -> length(w))) AS maxw,
       |    len(list_filter(ws, w -> w IN ${TextAnalysis.duckStopList})) AS nstop,
       |    len(list_distinct(ws)) AS nuniq,
       |    len(list_filter(ws, w -> length(w) <= 2)) AS nshort""".stripMargin

  /** SQL mirrors of [[violations]], over the [[duckStatsList]] columns. */
  private[graft] val duckViols: Seq[(String, String)] = Seq(
    "v1" -> "(nw < 50 OR nw > 100000)",
    "v2" -> "(chars < 3 * nw OR chars > 10 * nw)",
    "v3" -> "(maxw > 20)",
    "v4" -> "(nstop < 2)",
    "v5" -> "(nuniq * 5 < nw)",
    "v6" -> "(nshort * 2 > nw)")

  private[graft] val duckVAny: String =
    duckViols.map(_._2).mkString("(", " OR ", ")")

  val gopherRulesSql: String =
    s"""WITH d AS (
       |  SELECT ${TextAnalysis.duckWords} AS ws FROM documents
       |), s AS (
       |  SELECT $duckStatsList
       |  FROM d
       |), f AS (
       |  SELECT ${duckViols.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")}
       |  FROM s
       |), a AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CASE WHEN v1 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
       |    CAST(SUM(CASE WHEN v2 THEN 1 ELSE 0 END) AS BIGINT) AS x2,
       |    CAST(SUM(CASE WHEN v3 THEN 1 ELSE 0 END) AS BIGINT) AS x3,
       |    CAST(SUM(CASE WHEN v4 THEN 1 ELSE 0 END) AS BIGINT) AS x4,
       |    CAST(SUM(CASE WHEN v5 THEN 1 ELSE 0 END) AS BIGINT) AS x5,
       |    CAST(SUM(CASE WHEN v6 THEN 1 ELSE 0 END) AS BIGINT) AS x6,
       |    CAST(SUM(CASE WHEN v1 OR v2 OR v3 OR v4 OR v5 OR v6
       |      THEN 1 ELSE 0 END) AS BIGINT) AS xany
       |  FROM f
       |)
       |SELECT rule, n_docs, n_violations,
       |  n_docs - n_violations AS n_pass,
       |  CAST(n_docs - n_violations AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pass_rate
       |FROM (
       |  SELECT 'word_count_50_100000' AS rule, n_docs, x1 AS n_violations FROM a
       |  UNION ALL SELECT 'mean_word_len_3_10', n_docs, x2 FROM a
       |  UNION ALL SELECT 'max_word_len_20', n_docs, x3 FROM a
       |  UNION ALL SELECT 'min_stopwords_2', n_docs, x4 FROM a
       |  UNION ALL SELECT 'uniq_word_ratio_0.2', n_docs, x5 FROM a
       |  UNION ALL SELECT 'short_word_frac_0.5', n_docs, x6 FROM a
       |  UNION ALL SELECT 'gopher_keep', n_docs, xany FROM a
       |)""".stripMargin
}
