package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** Term-relevance operators over the `documents` table: TF-IDF keyword
  * extraction, BM25 keyword search, and an n-gram language-model quality
  * score. These are the retrieval/quality stage of a training-data
  * pipeline (keyword extraction for tagging, search for targeted curation,
  * LM frequency scores for fluency filtering).
  *
  * Cross-engine exactness: the usual `ln`-based IDF is replaced by the
  * rational ratios `N/df` (TF-IDF) and `(N-df+0.5)/(df+0.5)` (BM25).
  * `ln` is a transcendental whose last ulp is libm-dependent, while a
  * single IEEE division is correctly rounded in every engine; the
  * monotone-equivalent rational form keeps rankings identical and makes
  * the scores oracle-exact. BM25's free constants are chosen dyadic
  * (k1 = 1.25, b = 0.75) so intermediate products stay exact, and the
  * per-term score sum runs through [[Exact.decSum]] (order-independent).
  */
object Relevance {

  private val words: Column = split(trim(col("text")), "\\s+")
  private val duckWords = "regexp_split_to_array(trim(text), '\\s+')"

  /** (doc_id, term, tf) — one explode, one groupBy(doc_id, term).
    * r10: derived-tier cached — §5 calls this frame "the thing you
    * materialize once", yet six operators (#54 tfidf, #55 bm25,
    * #204 zipf, #247 heaps, #245 burstiness, #325 prf) each re-ran the
    * corpus-scale explode+aggregate. Bench's cold legs still charge it
    * (clearDerived), so per-query compute stays honestly measured.
    */
  private val tfCache = new graft.core.DfCache[(SparkSession, String)]

  private def termFreq(spark: SparkSession, dir: String): DataFrame =
    tfCache.getOrElseUpdate((spark, dir)) {
      Tables.documents(spark, dir)
        .select(col("doc_id"), explode(words).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
    }

  private val termFreqCte: String =
    s"""tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($duckWords) AS term FROM documents)
       |  GROUP BY doc_id, term
       |)""".stripMargin

  // ------------------------------------------------------------- TF-IDF

  /** #54: top-3 TF-IDF keywords per document. Score = tf · N / df with
    * the rational IDF (see class doc). Plan: the (term → df) table is
    * vocabulary-sized, aggregated once and broadcast back onto the
    * per-(doc, term) frame; the only data-scale shuffles are the
    * groupBy(doc_id, term) and the per-doc top-k window — both keyed by
    * doc_id, and the window input is already cut to ≤|vocab| rows/doc.
    */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreq(spark, dir)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
  }

  val tfidfKeywordsSql: String =
    s"""WITH $termFreqCte,
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    CAST(tf * n_docs AS DOUBLE) / df AS score
       |  FROM tf JOIN df USING (term), n
       |)
       |SELECT doc_id, term, tf, df, score,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
       |FROM scored
       |QUALIFY rnk <= 3""".stripMargin

  // --------------------------------------------------------------- BM25

  private val k1 = 1.25 // dyadic on purpose: products with it stay exact
  private val b = 0.75

  /** The fixed keyword query set (id → space-separated terms). */
  private val queries: Seq[(String, String)] = Seq(
    "q_compute" -> "spark query join",
    "q_storage" -> "table scan filter",
    "q_stream" -> "stream window agg")

  /** #55: BM25 top-5 documents per keyword query.
    * score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the rational idf (N − df + 0.5)/((df + 0.5)·N) — the classic
    * (N − df + 0.5)/(df + 0.5) divided by N. Per-query rankings are
    * identical (every term score scales by the same 1/N) and the
    * normalization bounds |idf| < 1 and |s_term| < k1+1 at ANY corpus
    * size, so the scale-12 quantized sum stays inside the 2^53
    * exact-integral-double domain ([[graft.core.Exact]]) — the raw idf
    * is ~2N, which leaves that domain past a few thousand docs.
    *
    * Plan: the query-term table (a handful of rows) and the df table
    * (vocabulary-sized) are both broadcast; the inner join against the
    * per-(doc, term) frame prunes to docs containing a query term BEFORE
    * any scoring work; the per-(query, doc) sum is a decimal sum (order-
    * independent) keyed by doc — one data-scale shuffle. At 100 TB this
    * is the standard "search a corpus by inverted-index semantics without
    * building the index" shape; with a materialized tf table it becomes a
    * partition-pruned scan.
    */
  /** Session cache: the ranked top-5 frame is consumed both as the #55
    * search result and as the #98 rerank's candidate set — 15 rows, one
    * build.
    */
  private val bm25Cache = new graft.core.DfCache[(SparkSession, String)]

  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25Cache.getOrElseUpdate((spark, dir))(bm25Build(spark, dir))

  private def bm25Build(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    val tf = termFreq(spark, dir)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val docLen = Tables.documents(spark, dir)
      .select(col("doc_id"), size(words).cast("long").as("dl"))
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val idf = (col("n_docs") - col("df") + 0.5) / ((col("df") + 0.5) * col("n_docs"))
    val tfNorm = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(qterms), "term")
      .join(broadcast(df), "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s_term", idf * tfNorm)
      .groupBy("query_id", "doc_id")
      .agg(Exact.decSum(col("s_term"), 12).as("score"))
      .withColumn("rnk", row_number().over(byQuery))
      .filter(col("rnk") <= 5)
      .select("query_id", "doc_id", "score", "rnk")
  }

  /** BM25 CTE chain ending in the ranked top-5 (`bm`) — shared with the
    * RRF rerank oracle below.
    */
  private val bm25Ctes: String = {
    val qrows = queries.map { case (id, t) => s"('$id', '$t')" }.mkString(", ")
    s"""$termFreqCte,
       |qt AS (
       |  SELECT query_id, unnest(string_split(qtext, ' ')) AS term
       |  FROM (VALUES $qrows) AS q(query_id, qtext)
       |),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len($duckWords) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |scored AS (
       |  SELECT query_id, tf.doc_id,
       |    ((n_docs - df + 0.5) / ((df + 0.5) * n_docs)) *
       |    ((tf * ${k1 + 1}) / (tf + $k1 * ((${1 - b}) + $b * (dl / avgdl)))) AS s_term
       |  FROM tf JOIN qt USING (term) JOIN df USING (term)
       |       JOIN dl ON dl.doc_id = tf.doc_id, stats
       |),
       |agg AS (
       |  SELECT query_id, doc_id, ${Exact.duckSum("s_term", 12)} AS score
       |  FROM scored GROUP BY query_id, doc_id
       |),
       |bm AS (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM agg
       |  QUALIFY rnk <= 5
       |)""".stripMargin
  }

  val bm25SearchSql: String =
    s"WITH $bm25Ctes\nSELECT query_id, doc_id, score, rnk FROM bm"

  // ------------------------------------------------------ RRF hybrid rerank

  /** #98: reciprocal-rank-fusion rerank of the BM25 candidates against
    * the corpus quality prior — the standard hybrid-retrieval move
    * (fuse a relevance ranking with a second signal without score
    * calibration; RRF k = 60 per Cormack et al.). Each BM25 top-5
    * candidate gets a quality rank within its candidate set, and
    *
    *   rrf = 1/(60 + r_bm25) + 1/(60 + r_quality)
    *
    * re-ranks the list. Fusion over INTEGER ranks is what makes hybrid
    * retrieval oracle-exact: the two reciprocals are correctly-rounded
    * divisions summed in fixed order — no score normalization, no
    * tolerance. The candidate frame is rows(queries)·5, so both windows
    * are per-query heaps over ≤ 5 rows; the only data-scale work is the
    * quality lookup, a broadcast-candidate semi-join into documents.
    */
  def rrfRerank(spark: SparkSession, dir: String): DataFrame = {
    val bm = bm25Search(spark, dir)
    val q = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), TextAnalysis.words.as("ws"))
      .select(col("doc_id"), TextAnalysis.quality.as("q"))
    val byQuality = Window.partitionBy("query_id")
      .orderBy(col("q").desc, col("doc_id").asc)
    val byRrf = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    q.join(broadcast(bm), "doc_id")
      .withColumn("q_rnk", row_number().over(byQuality))
      .withColumn("rrf",
        lit(1.0) / (lit(60.0) + col("rnk")) +
          lit(1.0) / (lit(60.0) + col("q_rnk")))
      .withColumn("fused_rnk", row_number().over(byRrf))
      .select(col("query_id"), col("doc_id"), col("rnk").as("bm25_rnk"),
        col("q_rnk"), col("rrf"), col("fused_rnk"))
  }

  val rrfRerankSql: String =
    s"""WITH $bm25Ctes,
       |qual AS (
       |  SELECT doc_id, ${TextAnalysis.duckQuality} AS q
       |  FROM (SELECT doc_id, n_chars, $duckWords AS ws FROM documents)
       |),
       |j AS (
       |  SELECT b.query_id, b.doc_id, b.rnk, qual.q
       |  FROM bm b JOIN qual USING (doc_id)
       |),
       |r AS (
       |  SELECT query_id, doc_id, rnk,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY q DESC, doc_id ASC) AS q_rnk
       |  FROM j
       |)
       |SELECT query_id, doc_id, rnk AS bm25_rnk, q_rnk,
       |  1.0 / (60.0 + rnk) + 1.0 / (60.0 + q_rnk) AS rrf,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY (1.0 / (60.0 + rnk) + 1.0 / (60.0 + q_rnk)) DESC, doc_id ASC) AS fused_rnk
       |FROM r""".stripMargin

  // ------------------------------------------------------- n-gram LM score

  /** #56: word-bigram language-model fluency score. The corpus LM is the
    * bigram count table; each document scores the mean corpus frequency
    * of its own bigrams (`lm_score`) plus the fraction of bigrams seen
    * nowhere else (`rare_ratio` — a hallucination/garbage signal; 1.0
    * means every transition is unique to this doc).
    *
    * Plan: bigrams via two shifted `slice`s of the token array zipped
    * with concat (NOT a lambda over the split generator — the
    * CollapseProject re-evaluation trap documented at
    * [[TextAnalysis.fingerprint]]); one groupBy(bigram) builds the LM;
    * the doc→LM join is keyed on bigram (broadcast when the vocabulary
    * is small, shuffle join at corpus scale — both orders of magnitude
    * cheaper than scoring with a driver-side dict); one final
    * groupBy(doc_id) with integer sums (exact).
    */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => concat_ws(" ", x, y))
    val docBg = Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
    val lm = docBg.groupBy("bg").agg(count(lit(1)).as("cnt"))
    docBg.join(lm, "bg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum("cnt").as("hits"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("hits").cast("double") / col("n_bigrams")).as("lm_score"),
        (col("n_rare").cast("double") / col("n_bigrams")).as("rare_ratio"))
  }

  // ------------------------------------------------------- LM perplexity

  /** Documents with smoothed-bigram perplexity above this are flagged
    * `keep = false` (the CC-Net discard convention: high perplexity
    * under the reference LM ⇒ boilerplate/garbage). 2^5 sits just above
    * this synthetic corpus's p75 (ppl runs ~26-37 over its small
    * vocabulary), so the filter discards a real tail; at production
    * scale the threshold is fit per language on a held-out slice, which
    * changes a constant, not the plan.
    */
  val PplThreshold = 32.0

  /** #107: CC-Net-style perplexity filtering — each document scored by
    * its cross-entropy under the CORPUS bigram LM with Laplace
    * smoothing: P(w2|w1) = (c(w1w2)+1) / (c_prefix(w1)+V), H = −(1/n)·Σ
    * log2 P, ppl = 2^H, keep = ppl < [[PplThreshold]]. The missing
    * piece between #56 (raw LM frequencies) and #84 (score-stratified
    * buckets): a calibrated fluency filter with probability semantics.
    *
    * Plan: the LM is two keyed aggregates (bigram counts, prefix
    * counts) joined back onto the per-(doc, bigram) frame — shuffle
    * joins keyed on the n-gram, broadcastable when the vocabulary is
    * small; V is a one-row broadcast scalar. One final groupBy(doc_id).
    * No driver-side LM dictionary — at 100 TB the LM *is* a table.
    *
    * Exactness: the smoothed probability is one correctly-rounded
    * integer-ratio division; log2 and the final 2^H are transcendental,
    * so their outputs are grid-quantized (scale 6) per the house rule —
    * between the two quantizations everything is exact integer sums and
    * one correctly-rounded division, mirrored literally.
    */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => struct(x.as("w1"), concat_ws(" ", x, y).as("bg")))
    val docBg = Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(bigrams).as("c"))
      .select(col("doc_id"), col("c.w1").as("w1"), col("c.bg").as("bg"))
    val lm = docBg.groupBy("bg").agg(count(lit(1)).as("cnt_bg"))
    val pre = docBg.groupBy("w1").agg(count(lit(1)).as("cnt_w1"))
    val vocab = Tables.documents(spark, dir)
      .select(explode(words).as("w")).agg(countDistinct("w").as("v"))
    docBg.join(lm, "bg").join(pre, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("lg", Exact.roundS(
        log2((col("cnt_bg") + 1).cast("double") /
          (col("cnt_w1") + col("v")).cast("double")), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (Exact.decSum(-col("lg"), 6) / count(lit(1))).as("h_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("h_bits"),
        Exact.roundS(pow(lit(2.0), col("h_bits")), 6).as("ppl"))
      .withColumn("keep", col("ppl") < PplThreshold)
  }

  val perplexitySql: String =
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS ws FROM documents
       |), bgt AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws)), j -> ws[j])) AS w1,
       |    unnest(list_transform(range(1, len(ws)), j -> ws[j] || ' ' || ws[j+1])) AS bg
       |  FROM d WHERE len(ws) >= 2
       |), lm AS (
       |  SELECT bg, COUNT(*) AS cnt_bg FROM bgt GROUP BY bg
       |), pre AS (
       |  SELECT w1, COUNT(*) AS cnt_w1 FROM bgt GROUP BY w1
       |), voc AS (
       |  SELECT COUNT(DISTINCT w) AS v
       |  FROM (SELECT unnest(ws) AS w FROM d)
       |), h AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |    ${Exact.duckSum(
            "-(" + Exact.duckRoundS(
              "log2(CAST(cnt_bg + 1 AS DOUBLE) / CAST(cnt_w1 + v AS DOUBLE))",
              6) + ")", 6)} / COUNT(*) AS h_bits
       |  FROM bgt JOIN lm USING (bg) JOIN pre USING (w1) CROSS JOIN voc
       |  GROUP BY doc_id
       |)
       |SELECT doc_id, n_bigrams, h_bits,
       |  ${Exact.duckRoundS("pow(2.0, h_bits)", 6)} AS ppl,
       |  ${Exact.duckRoundS("pow(2.0, h_bits)", 6)} < $PplThreshold AS keep
       |FROM h""".stripMargin

  val ngramLmScoreSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS ws FROM documents
       |), bg AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws)), j -> ws[j] || ' ' || ws[j+1])) AS bg
       |  FROM d WHERE len(ws) >= 2
       |), lm AS (
       |  SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg
       |)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS lm_score,
       |  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rare_ratio
       |FROM bg JOIN lm USING (bg)
       |GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------ #204 Zipf fit

  /** Terms entering the rank-frequency regression. */
  val ZipfTop = 100

  /** #204: Zipf rank-frequency fit over the corpus vocabulary — the
    * corpus-health diagnostic every tokenizer/curation writeup reports
    * (natural language sits near slope −1; a much flatter slope means
    * boilerplate/template contamination, a steeper one vocabulary
    * collapse — both retrain-the-tokenizer signals beside #182's
    * fertility): least-squares slope of ln(freq) on ln(rank) over the
    * top [[ZipfTop]] terms.
    *
    * Scale: corpus term counts collapse map-side onto the vocabulary
    * keyspace; the top-100 selection is a TakeOrdered heap chain
    * (freq DESC, term ASC — total order), the rank window runs
    * POST-limit over 100 rows, and the regression is one aggregate
    * over those 100. Exactness: ln outputs quantize on the 1e-6 grid
    * per row (house transcendental rule), products of the quantized
    * doubles are single correctly-rounded IEEE ops summed on the 1e-12
    * grid, and the closed-form slope/intercept are literal-order
    * divisions of exact sums mirrored identically in the oracle.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val freq = termFreq(spark, dir)
      .groupBy("term").agg(sum("tf").as("freq"))
      .orderBy(col("freq").desc, col("term").asc).limit(ZipfTop)
    val ranked = freq.withColumn("rnk",
        row_number().over(Window.orderBy(col("freq").desc, col("term").asc)))
      .select(
        Exact.roundS(log(col("rnk").cast("double")), 6).as("x"),
        Exact.roundS(log(col("freq").cast("double")), 6).as("y"))
    ranked.agg(
        count(lit(1)).as("n"),
        Exact.decSum(col("x"), 6).as("sx"),
        Exact.decSum(col("y"), 6).as("sy"),
        Exact.decSum(col("x") * col("y"), 12).as("sxy"),
        Exact.decSum(col("x") * col("x"), 12).as("sxx"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
         (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"))
      .select(col("n"), col("slope"), (-col("slope")).as("zipf_exponent"))
  }

  // ---------------------------------------------- #247 Heaps' law fit

  /** Vocabulary-growth checkpoints. */
  val HeapsPoints = 20

  /** #247: HEAPS' LAW fit — vocabulary growth V(N) ≈ K·N^β over
    * cumulative corpus prefixes (Heaps 1978): the companion diagnostic
    * to #204's Zipf (the two laws are duals — a Zipfian corpus grows
    * vocabulary sublinearly): β ≈ 0.5 is natural text; β → 1 means
    * unbounded novel tokens (OCR noise, ids, markup — a tokenizer-
    * budget alarm); β → 0 means a closed vocabulary (template spam).
    * Fit: ln V on ln N at [[HeapsPoints]] doc-id-threshold prefixes,
    * via the #204 closed-form least squares.
    *
    * Exactness: checkpoints are integer doc-id buckets (k = id·P DIV
    * (max+1)); per-bucket token sums and first-occurrence vocabulary
    * counts are exact integers; the cumulation over the P-row bucket
    * frame is a dictionary SELF-JOIN (j ≤ k), not an unpartitioned
    * window; both lns quantize 1e-6, products sum on the 1e-12 grid,
    * slope/intercept literal-order over exact sums; K = exp(intercept)
    * quantized 1e-6 (the one transcendental inversion).
    *
    * Plan: one (doc, term) pass feeding BOTH the per-doc token counts
    * and the term-keyed first-occurrence aggregate; both collapse
    * map-side onto bounded keyspaces; everything after is a P-row
    * frame.
    */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(words).as("n_tok"))
    val mx = docs.agg(max("doc_id").as("mx"))
    val db = docs.crossJoin(broadcast(mx))
      .select(expr(s"doc_id * $HeapsPoints DIV (mx + 1)").as("k"),
        col("n_tok"))
      .groupBy("k").agg(sum("n_tok").as("toks"))
    val vb = termFreq(spark, dir)
      .groupBy("term").agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(mx))
      .select(expr(s"first_doc * $HeapsPoints DIV (mx + 1)").as("k"))
      .groupBy("k").agg(count(lit(1)).as("nv"))
    val buckets = db.join(vb, Seq("k"), "left").na.fill(0L, Seq("nv"))
    val pts = buckets.as("a")
      .join(buckets.select(col("k").as("j"), col("toks").as("tj"),
        col("nv").as("vj")), col("j") <= col("a.k"))
      .groupBy(col("a.k"))
      .agg(sum("tj").as("cn"), sum("vj").as("cv"))
      .select(
        Exact.roundS(log(col("cn").cast("double")), 6).as("x"),
        Exact.roundS(log(col("cv").cast("double")), 6).as("y"))
    pts.agg(
        count(lit(1)).as("n_points"),
        Exact.decSum(col("x"), 6).as("sx"),
        Exact.decSum(col("y"), 6).as("sy"),
        Exact.decSum(col("x") * col("y"), 12).as("sxy"),
        Exact.decSum(col("x") * col("x"), 12).as("sxx"))
      .select(col("n_points"),
        ((col("n_points") * col("sxy") - col("sx") * col("sy")) /
         (col("n_points") * col("sxx") - col("sx") * col("sx")))
          .as("beta"),
        col("sx"), col("sy"))
      .select(col("n_points"), col("beta"),
        Exact.roundS(exp((col("sy") - col("beta") * col("sx")) /
          col("n_points")), 6).as("k_coef"))
  }

  val heapsLawSql: String =
    s"""WITH $termFreqCte,
       |docs AS (
       |  SELECT doc_id, len($duckWords) AS n_tok FROM documents
       |), mx AS (SELECT MAX(doc_id) AS mx FROM docs),
       |db AS (
       |  SELECT doc_id * $HeapsPoints // (mx + 1) AS k,
       |    CAST(SUM(n_tok) AS BIGINT) AS toks
       |  FROM docs, mx GROUP BY 1
       |), vb AS (
       |  SELECT first_doc * $HeapsPoints // (mx + 1) AS k,
       |    COUNT(*) AS nv
       |  FROM (SELECT term, MIN(doc_id) AS first_doc FROM tf GROUP BY 1),
       |    mx
       |  GROUP BY 1
       |), buckets AS (
       |  SELECT db.k, db.toks, COALESCE(vb.nv, 0) AS nv
       |  FROM db LEFT JOIN vb ON vb.k = db.k
       |), pts AS (
       |  SELECT ${Exact.duckRoundS("ln(CAST(cn AS DOUBLE))", 6)} AS x,
       |    ${Exact.duckRoundS("ln(CAST(cv AS DOUBLE))", 6)} AS y
       |  FROM (
       |    SELECT a.k, CAST(SUM(b.toks) AS BIGINT) AS cn,
       |      CAST(SUM(b.nv) AS BIGINT) AS cv
       |    FROM buckets a JOIN buckets b ON b.k <= a.k
       |    GROUP BY a.k)
       |), s AS (
       |  SELECT COUNT(*) AS n_points, ${Exact.duckSum("x", 6)} AS sx,
       |    ${Exact.duckSum("y", 6)} AS sy,
       |    ${Exact.duckSum("x * y", 12)} AS sxy,
       |    ${Exact.duckSum("x * x", 12)} AS sxx
       |  FROM pts
       |)
       |SELECT n_points,
       |  (n_points * sxy - sx * sy) / (n_points * sxx - sx * sx) AS beta,
       |  ${Exact.duckRoundS(
            "exp((sy - ((n_points * sxy - sx * sy) / " +
            "(n_points * sxx - sx * sx)) * sx) / n_points)", 6)} AS k_coef
       |FROM s""".stripMargin

  // ------------------------------------------- #245 term burstiness

  /** Terms reported in the burstiness table. */
  val BurstTopN = 50

  /** #245: term BURSTINESS — the variance-to-mean ratio of per-doc
    * term counts over the WHOLE corpus including the zero docs
    * (Church & Gale 1995): a Poisson word (VMR ≈ 1) sprinkles itself
    * independently — the function-word signature; a bursty word
    * (VMR ≫ 1) arrives in clumps — the content-word signature. The
    * statistic IDF can't give: two terms with identical df can differ
    * 10× in burstiness, and burstiness (not rarity) is what makes a
    * term a keyword candidate. Complements #204's Zipf (corpus shape)
    * and #54's TF-IDF (per-doc salience) with per-TERM dispersion.
    *
    * Exactness: cf = Σtf, cf2 = Σtf² and df are exact integers; N is
    * a 1-row broadcast; VMR = (cf2/N − (cf/N)²)/(cf/N) is a fixed
    * literal IEEE tree over casts of exact integers, mirrored
    * verbatim; top-N orders by (VMR, term) — VMR identical doubles
    * cross-engine, term the tiebreak.
    *
    * Plan: one (doc, term) collapse (shared shape with TF-IDF), one
    * term-keyed map-side-combining aggregate onto the vocabulary
    * keyspace, a 1-row broadcast, TakeOrdered. The zero docs never
    * materialize — their contribution is algebraic (cf/N uses the
    * corpus N, not df).
    */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    termFreq(spark, dir)
      .groupBy("term")
      .agg(sum("tf").as("cf"), sum(col("tf") * col("tf")).as("cf2"),
        count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("cf"), col("df"),
        ((col("cf2").cast("double") / col("n").cast("double") -
          (col("cf").cast("double") / col("n").cast("double")) *
            (col("cf").cast("double") / col("n").cast("double"))) /
          (col("cf").cast("double") / col("n").cast("double")))
          .as("vmr"))
      .orderBy(col("vmr").desc, col("term").asc)
      .limit(BurstTopN)
  }

  val burstinessSql: String =
    s"""WITH $termFreqCte,
       |nn AS (SELECT COUNT(*) AS n FROM documents),
       |st AS (
       |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf,
       |    CAST(SUM(tf * tf) AS BIGINT) AS cf2, COUNT(*) AS df
       |  FROM tf GROUP BY term
       |)
       |SELECT term, cf, df,
       |  (CAST(cf2 AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(cf AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(cf AS DOUBLE) / CAST(n AS DOUBLE)))
       |  / (CAST(cf AS DOUBLE) / CAST(n AS DOUBLE)) AS vmr
       |FROM st, nn
       |ORDER BY vmr DESC, term ASC LIMIT $BurstTopN""".stripMargin

  val zipfFitSql: String =
    s"""WITH $termFreqCte,
       |freq AS (
       |  SELECT term, CAST(SUM(tf) AS BIGINT) AS freq FROM tf GROUP BY term
       |  ORDER BY freq DESC, term ASC LIMIT $ZipfTop
       |), ranked AS (
       |  SELECT ${Exact.duckRoundS("ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS DOUBLE))", 6)} AS x,
       |    ${Exact.duckRoundS("ln(CAST(freq AS DOUBLE))", 6)} AS y
       |  FROM freq
       |), s AS (
       |  SELECT COUNT(*) AS n, ${Exact.duckSum("x", 6)} AS sx,
       |    ${Exact.duckSum("y", 6)} AS sy, ${Exact.duckSum("x * y", 12)} AS sxy,
       |    ${Exact.duckSum("x * x", 12)} AS sxx
       |  FROM ranked
       |)
       |SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       |  -((n * sxy - sx * sy) / (n * sxx - sx * sx)) AS zipf_exponent
       |FROM s""".stripMargin

  // ----------------------------------------------- #326 TextRank

  val TrIters = 3
  val TrTopN = 20
  private val TrDamp = 0.85

  /** #326: TEXTRANK keywords (Mihalcea & Tarau 2004) — weighted
    * PageRank over the corpus word co-occurrence graph: adjacent-word
    * pairs form undirected weighted edges, and a word ranks high when
    * its NEIGHBORS rank high — the recursive centrality signal the
    * frequency family (#54 tf-idf, #175 RAKE) cannot see (a
    * mid-frequency word wired into every important context beats a
    * high-frequency word in unimportant ones). Three exact power
    * iterations, unrolled for the oracle exactly like entity PageRank
    * (#83) — same damping, same quantized-contribution discipline
    * (each per-edge term s·w/W rides the 1e-12 grid order-free, so
    * every iterate is engine-identical) — then the top-[[TrTopN]] on
    * the (score, word) total order via TakeOrdered, ranked post-limit.
    *
    * Scale: the graph is VOCABULARY-bounded (edges = distinct adjacent
    * pairs), built by one map-side-combining pair count; an iteration
    * is one edge⋈score join + one dst-keyed quantized sum — the #83
    * machinery on a graph whose size is set by the vocabulary, not the
    * corpus; corpus growth only changes edge WEIGHTS. A production run
    * iterates to tolerance exactly as pagerankConverged does.
    */
  def textrank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(words.as("ws"))
    val pairs = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val adj = docs.filter(size(col("ws")) >= 2)
      .select(explode(pairs).as("p"))
      .select(col("p.w1").as("a"), col("p.w2").as("b"))
      .filter(col("a") =!= col("b"))
    val und = adj.unionByName(adj.select(col("b").as("a"), col("a").as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
    val strength = und.groupBy("a").agg(sum("w").as("wsum"))
    val nodes = und.select(col("a").as("word")).distinct()
    val n = nodes.agg(count(lit(1)).as("n"))
    val s0 = nodes.crossJoin(broadcast(n))
      .select(col("word"), (lit(1.0) / col("n")).as("s"))
    val sK = (1 to TrIters).foldLeft(s0) { (s, _) =>
      val contrib = und
        .join(s.withColumnRenamed("word", "a"), "a")
        .join(strength, "a")
        .groupBy(col("b").as("word"))
        .agg(Exact.decSum(col("s") / col("wsum") * col("w"), 12).as("c"))
      nodes.join(contrib, Seq("word"), "left")
        .crossJoin(broadcast(n))
        .select(col("word"),
          (lit(1 - TrDamp) / col("n") +
            lit(TrDamp) * coalesce(col("c"), lit(0.0))).as("s"))
    }
    sK.orderBy(col("s").desc, col("word").asc).limit(TrTopN)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("s").desc, col("word").asc)))
      .select(col("word"), col("s").as("score"), col("rnk"))
  }

  val textrankSql: String = {
    def iter(k: Int): String =
      s"""s$k AS MATERIALIZED (
         |  SELECT nodes.word,
         |    ${1 - TrDamp} / n + $TrDamp * COALESCE(c.c, 0.0) AS s
         |  FROM nodes LEFT JOIN (
         |    SELECT und.b AS word, ${Exact.duckSum("p.s / st.wsum * und.w", 12)} AS c
         |    FROM und
         |    JOIN s${k - 1} p ON p.word = und.a
         |    JOIN strength st ON st.a = und.a
         |    GROUP BY und.b
         |  ) c ON c.word = nodes.word, nn
         |)""".stripMargin
    s"""WITH d AS (
       |  SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
       |), adj AS (
       |  SELECT w1 AS a, w2 AS b FROM (
       |    SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
       |      unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
       |    FROM d WHERE len(ws) >= 2
       |  ) WHERE w1 <> w2
       |), und AS MATERIALIZED (
       |  SELECT a, b, COUNT(*) AS w FROM (
       |    SELECT a, b FROM adj UNION ALL SELECT b, a FROM adj
       |  ) GROUP BY a, b
       |), strength AS MATERIALIZED (
       |  SELECT a, SUM(w) AS wsum FROM und GROUP BY a
       |), nodes AS MATERIALIZED (SELECT DISTINCT a AS word FROM und),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |s0 AS (SELECT word, 1.0 / n AS s FROM nodes, nn),
       |${(1 to TrIters).map(iter).mkString(",\n")}
       |SELECT word, s AS score,
       |  CAST(ROW_NUMBER() OVER (ORDER BY s DESC, word ASC) AS INT) AS rnk
       |FROM s$TrIters
       |ORDER BY s DESC, word ASC LIMIT $TrTopN""".stripMargin
  }

  // ------------------------------------- #325 PRF query expansion

  val PrfTerms = 3

  /** #325: PSEUDO-RELEVANCE-FEEDBACK QUERY EXPANSION (RM3-lite) — the
    * classic second-pass retrieval move: take the first-pass BM25
    * top-5 per query as presumed-relevant feedback, mine their
    * highest-signal terms (tf-idf-weighted corpus-rarity score over
    * the feedback set, original query terms excluded, ranked on the
    * (weight, term) total order), add the top [[PrfTerms]] to the
    * query, and re-run the identical BM25 scoring over the EXPANDED
    * term set. Recovers vocabulary-mismatch docs (relevant but sharing
    * no literal query term) that single-pass lexical retrieval
    * structurally misses — the pre-neural standard still shipped by
    * production search engines, and the lexical sibling of the
    * embedding-side #120 refine-rerank.
    *
    * Scale: the feedback set is queries×5 rows (broadcast); candidate
    * mining touches only feedback docs' term rows; both ranking windows
    * partition on query_id with inputs bounded by feedback-doc vocab —
    * never corpus-scale; the second pass reuses the same vocabulary-
    * keyed joins as #55 with the expanded (still tiny, broadcast)
    * query-term table. Exactness: candidate weights are one division
    * of exact integers; per-term scores ride #55's 1e-12 quantized
    * order-free sum; ranks use total orders.
    */
  def prfExpand(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val tf = termFreq(spark, dir)
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    val fb = bm25Search(spark, dir).select("query_id", "doc_id")
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val byQw = Window.partitionBy("query_id")
      .orderBy(col("wq").desc, col("term").asc)
    val exp = fb.join(tf, "doc_id")
      .groupBy("query_id", "term").agg(sum("tf").as("sum_tf"))
      .join(qterms, Seq("query_id", "term"), "left_anti")
      .join(broadcast(df), "term").crossJoin(broadcast(n))
      .withColumn("wq",
        (col("sum_tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(byQw))
      .filter(col("rnk") <= PrfTerms)
      .select("query_id", "term")
    val qt2 = qterms.unionByName(exp).distinct()
    val docLen = Tables.documents(spark, dir)
      .select(col("doc_id"), size(words).cast("long").as("dl"))
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val idf = (col("n_docs") - col("df") + 0.5) /
      ((col("df") + 0.5) * col("n_docs"))
    val tfNorm = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(qt2), "term")
      .join(broadcast(df), "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s_term", idf * tfNorm)
      .groupBy("query_id", "doc_id")
      .agg(Exact.decSum(col("s_term"), 12).as("score"))
      .withColumn("rnk", row_number().over(byQuery))
      .filter(col("rnk") <= 5)
      .select("query_id", "doc_id", "score", "rnk")
  }

  val prfExpandSql: String =
    s"""WITH $bm25Ctes,
       |n2 AS (SELECT COUNT(*) AS n_docs FROM documents),
       |cand AS (
       |  SELECT query_id, tf.term AS term, SUM(tf.tf) AS sum_tf
       |  FROM bm JOIN tf ON tf.doc_id = bm.doc_id
       |  GROUP BY 1, 2
       |), cand2 AS (
       |  SELECT c.query_id, c.term,
       |    CAST(c.sum_tf * n_docs AS DOUBLE) / df.df AS wq
       |  FROM cand c JOIN df USING (term), n2
       |  WHERE NOT EXISTS (SELECT 1 FROM qt
       |    WHERE qt.query_id = c.query_id AND qt.term = c.term)
       |), expn AS (
       |  SELECT query_id, term FROM (
       |    SELECT query_id, term,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY wq DESC, term ASC) AS r
       |    FROM cand2) WHERE r <= $PrfTerms
       |), qt2 AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT query_id, term FROM qt
       |    UNION ALL SELECT query_id, term FROM expn)
       |), scored2 AS (
       |  SELECT query_id, tf.doc_id,
       |    ((n_docs - df + 0.5) / ((df + 0.5) * n_docs)) *
       |    ((tf * ${k1 + 1}) / (tf + $k1 * ((${1 - b}) + $b * (dl / avgdl))))
       |      AS s_term
       |  FROM tf JOIN qt2 USING (term) JOIN df USING (term)
       |       JOIN dl ON dl.doc_id = tf.doc_id, stats
       |), agg2 AS (
       |  SELECT query_id, doc_id, ${Exact.duckSum("s_term", 12)} AS score
       |  FROM scored2 GROUP BY query_id, doc_id
       |)
       |SELECT query_id, doc_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id ASC) AS rnk
       |FROM agg2
       |QUALIFY rnk <= 5""".stripMargin
}
