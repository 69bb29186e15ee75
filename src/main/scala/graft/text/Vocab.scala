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
      // top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
      // single-partition sort of the pair frame), then rank the TopK
      // survivors; the only unpartitioned window runs over ≤ TopK rows.
      .orderBy(col("n").desc, col("pair").asc)
      .limit(TopK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("pair").asc)))
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

  // --------------------------------------------------------- iterated BPE

  val Rounds = 3

  /** #66: BPE vocabulary LEARNING — [[Rounds]] full merge rounds: pick
    * the most frequent adjacent token pair, apply it greedily
    * left-to-right across the corpus, recount. Output is the learned
    * merge table (step, l, r, merged, n), i.e. the artifact a tokenizer
    * trainer ships.
    *
    * This is the production BPE shape: the corpus stays distributed as
    * token arrays; only the ONE winning (l, r) pair crosses to the
    * driver per round (the merge table lives driver-side in every real
    * trainer), then re-tokenization is a map-only pass — a per-word
    * sequential fold, O(len²) array copies bounded by max word length.
    * Per round: one |vocab|²-keyed count shuffle + one 1-row collect.
    * Iteration is eager by necessity (like the KGE trainers), so the
    * returned frame is built from the collected merge table.
    */
  def bpeLearn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    learnedMerges(spark, dir).toDF("step", "l", "r", "merged", "n")
  }

  /** Greedy left-to-right application of ONE merge (l, r) → l+r to a
    * token array — the per-word sequential fold both the learner's
    * recount and the encoder share.
    */
  private def applyMerge(cs: Column, l: String, r: String): Column =
    aggregate(
      cs,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** The learned merge table, memoized per (session, dir): the trained
    * tokenizer ARTIFACT — driver-side by design (every real BPE trainer
    * holds it there; at serving time it ships as a file, so re-learning
    * it per encode call would charge the encoder the trainer's cost).
    */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Int, String, String, String, Long)]]
  graft.core.Caches.registerHook(() => mergeCache.clear())

  private def learnedMerges(spark: SparkSession,
      dir: String): Seq[(Int, String, String, String, Long)] =
    mergeCache.getOrElseUpdate((spark, dir), {
      import spark.implicits._
      var toks = Tables.documents(spark, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .select(split(col("w"), "").as("cs"))
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      for (step <- 1 to Rounds) {
        val pairs = zip_with(
          slice(col("cs"), lit(1), size(col("cs")) - 1),
          slice(col("cs"), lit(2), size(col("cs")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))
        val top = toks.filter(size(col("cs")) >= 2)
          .select(explode(pairs).as("p"))
          .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .limit(1).as[(String, String, Long)].head()
        val (l, r, n) = top
        merges += ((step, l, r, l + r, n))
        toks = toks.select(applyMerge(col("cs"), l, r).as("cs"))
        // each round's fold stacks another lambda onto the plan; keep the
        // lineage flat so round R doesn't re-run rounds 1..R-1 per pass
        if (step < Rounds) toks = toks.localCheckpoint()
      }
      merges.result()
    })

  /** #118: BPE ENCODING — apply the learned merge table (#66's artifact)
    * to the corpus and emit each document's token accounting
    * (doc_id, n_words, n_chars, n_tokens). This is the tokenizer
    * SERVING path: token counts under the real (learned) tokenizer are
    * what packing (#82), budget mixing (#53) and shard manifests (#88)
    * consume — the whitespace proxy (#33) is the pre-tokenizer estimate.
    *
    * Scale: the merge table is a driver-side constant (the trained
    * artifact, file-sized); encoding is ONE map-only pass — each merge
    * is a per-word sequential fold, Catalyst collapses the chained
    * projections into a single stage, and nothing shuffles until the
    * per-doc count aggregate (map-side combining onto doc_id, which the
    * explode preserved in-partition). At 100 TB: scan-speed, embarrass-
    * ingly parallel, zero data movement beyond the final counts.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val ms = learnedMerges(spark, dir)
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), split(col("w"), "").as("cs"))
      .withColumn("nc", size(col("cs")))
    val enc = ms.foldLeft(words) { case (df, (_, l, r, _, _)) =>
      df.withColumn("cs", applyMerge(col("cs"), l, r))
    }
    enc.groupBy("doc_id").agg(
      count(lit(1)).as("n_words"),
      sum(col("nc")).as("n_chars"),
      sum(size(col("cs"))).as("n_tokens"))
  }

  /** One DuckDB merge round: count pairs of `src`, pick the winner into
    * `top`, re-tokenize into `dst`. The winning (l, r) join in as
    * columns (1-row cross join) so the re-tokenize lambda can reference
    * them — scalar subqueries are not allowed inside lambdas.
    */
  private def duckRound(src: String, top: String, dst: String,
      carry: String = ""): String =
    s"""$top AS MATERIALIZED (
       |  SELECT l, r, COUNT(*) AS n
       |  FROM (SELECT unnest(cs[1:len(cs)-1]) AS l, unnest(cs[2:len(cs)]) AS r
       |        FROM $src WHERE len(cs) >= 2)
       |  GROUP BY 1, 2 ORDER BY n DESC, l ASC, r ASC LIMIT 1
       |), $dst AS MATERIALIZED (
       |  SELECT ${carry}list_reduce(
       |    list_prepend(CAST([] AS VARCHAR[]), list_transform(cs, c -> [c])),
       |    (acc, x) -> CASE
       |      WHEN len(acc) > 0 AND acc[-1] = l AND x[1] = r
       |        THEN list_append(acc[1:len(acc)-1], l || r)
       |      ELSE list_append(acc, x[1]) END) AS cs
       |  FROM $src, $top
       |)""".stripMargin

  val bpeLearnSql: String =
    s"""WITH t0 AS MATERIALIZED (
       |  SELECT string_split(w, '') AS cs
       |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |        FROM documents)
       |),
       |${duckRound("t0", "top1", "t1")},
       |${duckRound("t1", "top2", "t2")},
       |${duckRound("t2", "top3", "t3")}
       |SELECT CAST(1 AS INT) AS step, l, r, l || r AS merged, CAST(n AS BIGINT) AS n FROM top1
       |UNION ALL
       |SELECT CAST(2 AS INT), l, r, l || r, CAST(n AS BIGINT) FROM top2
       |UNION ALL
       |SELECT CAST(3 AS INT), l, r, l || r, CAST(n AS BIGINT) FROM top3""".stripMargin

  /** Encode oracle: the same three merge rounds with doc_id (and the
    * pre-merge char count) carried through, reduced to per-doc counts.
    * The winning pairs are re-derived by the SAME corpus-wide argmax
    * CTEs the learner oracle uses, so this also cross-checks that the
    * Spark encoder applied exactly the merges the learner emitted.
    */
  val bpeEncodeSql: String =
    s"""WITH t0 AS MATERIALIZED (
       |  SELECT doc_id, len(cs) AS nc, cs FROM (
       |    SELECT doc_id, string_split(w, '') AS cs
       |    FROM (SELECT doc_id,
       |            unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |          FROM documents))
       |),
       |${duckRound("t0", "top1", "t1", "doc_id, nc, ")},
       |${duckRound("t1", "top2", "t2", "doc_id, nc, ")},
       |${duckRound("t2", "top3", "t3", "doc_id, nc, ")}
       |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  CAST(SUM(len(cs)) AS BIGINT) AS n_tokens
       |FROM t3 GROUP BY doc_id""".stripMargin

  // -------------------------------------------- #182 fertility eval

  /** #182: per-language tokenizer fertility — the evaluation table that
    * closes the tokenizer block (#66 learns, #118 encodes, this
    * judges): tokens-per-word (fertility) and chars-per-token
    * (compression) per language, the numbers multilingual-vocab papers
    * (XLM-R §3, the "fertility" metric of Rust et al. 2021) report to
    * decide vocabulary allocation — a language with outlier fertility is
    * under-served by the merge table and inflates its training cost per
    * byte.
    *
    * Exactness: all sums are integer; each ratio is ONE int/int double
    * division. Scale: consumes #118's per-doc frame (already bounded,
    * one row per doc) joined doc-keyed with the lang column, then a
    * dictionary-small per-language rollup with map-side combine.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_chars").as("n_chars"), sum("n_tokens").as("n_tokens"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words").cast("double"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))

  val bpeFertilitySql: String =
    s"""WITH enc AS ($bpeEncodeSql)
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(e.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(e.n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(CAST(SUM(e.n_tokens) AS BIGINT) AS DOUBLE) /
       |    CAST(CAST(SUM(e.n_words) AS BIGINT) AS DOUBLE) AS fertility,
       |  CAST(CAST(SUM(e.n_chars) AS BIGINT) AS DOUBLE) /
       |    CAST(CAST(SUM(e.n_tokens) AS BIGINT) AS DOUBLE) AS chars_per_token
       |FROM enc e JOIN documents d USING (doc_id)
       |GROUP BY d.lang""".stripMargin
}
