package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Deterministic sampling operators for training-data curation: stratified
  * subsampling and token-budget corpus mixing.
  *
  * Beyond the reference's surface (per the build brief); semantics follow
  * standard pre-training data practice (per-language mixture weights, a
  * per-source token budget — the "data mixing" stage that follows the
  * cleaning funnel in [[CorpusClean]]).
  *
  * Both operators select rows by `pHash(doc_id) % 1000 < rate_mille`: a
  * pure map-side filter, no shuffle, no RNG state, and the SAME rows are
  * selected regardless of partitioning or cluster size — re-running a
  * 100 TB sample job is reproducible by construction, and adding data
  * never changes the verdict on existing rows (hash-based sampling is
  * append-stable, unlike reservoir/limit sampling).
  */
object Sampling {

  /** Selection hash in thousandths: uniform in [0, 1000). */
  private def mille(salt: String): Column =
    PortableHash.pHash(concat(lit(salt), col("doc_id"))) % 1000

  private def duckMille(salt: String): String =
    s"(${PortableHash.duck(s"'$salt' || doc_id")} % 1000)"

  // -------------------------------------------------- stratified sampling

  /** Per-language mixture weights in thousandths (an "upsample English,
    * downsample the tail" mixture, the usual pre-training shape).
    */
  private val langRate: Seq[(String, Int)] =
    Seq("en" -> 800, "de" -> 600, "fr" -> 500, "es" -> 400, "zh" -> 250)

  /** #52: stratified sample — keep each document with its language's
    * mixture rate. Map-only (filter on a hash of the row's own key);
    * zero shuffles; scales linearly and never moves the text payload.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = langRate.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .filter(mille("strat") < rate)
  }

  val sampleStratifiedSql: String = {
    val rate = langRate.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""SELECT doc_id, source, lang, n_chars
       |FROM documents
       |WHERE ${duckMille("strat")} < ($rate)""".stripMargin
  }

  // -------------------------------------------------- token-budget mixing

  /** Per-source token budget (whitespace tokens) for the mix report. */
  private val budgetTokens = 2000L

  /** #53: corpus mix report — given a per-source token budget, derive the
    * acceptance rate `min(1000, 1000·budget/available)` per source, take
    * the hash-stable sample, and report per-source attrition:
    * (n_docs, avail_tokens, rate_mille, sampled_docs, sampled_tokens).
    *
    * Plan shape: one groupBy(source) to size each source, the 20-row rate
    * table broadcast back onto the documents, the same map-side hash
    * filter, one final groupBy(source). All arithmetic is integer (floor
    * division), so the report is engine-exact. At 100 TB the rate table
    * is still #sources rows — the broadcast never grows with data.
    */
  def corpusMixReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
    val rates = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("avail_tokens"))
      // floor(double-division) in BOTH engines (Spark `/` on longs is
      // double division; DuckDB `//` would be true integer division)
      .withColumn("rate_mille",
        least(lit(1000L),
          floor(lit(1000.0 * budgetTokens) / col("avail_tokens")).cast("long")))
    docs.join(broadcast(rates), "source")
      .withColumn("keep", mille("mix") < col("rate_mille"))
      .groupBy("source", "n_docs", "avail_tokens", "rate_mille")
      .agg(
        sum(col("keep").cast("long")).as("sampled_docs"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("sampled_tokens"))
  }

  val corpusMixReportSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
       |  FROM documents
       |), rates AS (
       |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS avail_tokens,
       |    least(1000, CAST(floor(CAST(1000 * $budgetTokens AS DOUBLE) / SUM(toks)) AS BIGINT)) AS rate_mille
       |  FROM d GROUP BY source
       |)
       |SELECT d.source, n_docs, avail_tokens, rate_mille,
       |  CAST(SUM(CASE WHEN ${duckMille("mix")} < rate_mille THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
       |  CAST(SUM(CASE WHEN ${duckMille("mix")} < rate_mille THEN toks ELSE 0 END) AS BIGINT) AS sampled_tokens
       |FROM d JOIN rates USING (source)
       |GROUP BY d.source, n_docs, avail_tokens, rate_mille""".stripMargin

  // ----------------------------------------------- temperature resampling

  /** Global document budget for the temperature mix. */
  private val tempBudgetDocs = 300L

  /** #68: temperature-based language rebalancing — sampling weights
    * `w_l = n_l^(1/τ) / Σ_m n_m^(1/τ)` with τ = 2, the standard
    * multilingual pre-training mix (upsamples the tail, downsamples the
    * head; τ→1 is proportional, τ→∞ uniform). Per-language acceptance
    * rate to hit a [[tempBudgetDocs]] budget:
    * `min(1000, ⌊1000·B·w_l / n_l⌋)`, then the same hash-stable
    * map-side filter as [[sampleStratified]].
    *
    * τ = 2 makes `n^(1/τ)` = `sqrt` — correctly rounded IEEE in every
    * engine, so the weights are engine-exact without quantizing a
    * transcendental (`pow` is NOT correctly rounded; an arbitrary-τ
    * variant would quantize through [[graft.core.Exact.roundS]]). The
    * Σ over languages runs through [[graft.core.Exact.decSum]]
    * (order-independent). The rate table is #languages rows — broadcast,
    * never grows with data.
    */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
    val rates = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("qs", graft.core.Exact.roundS(sqrt(col("n_docs"))))
    val total = rates.agg(graft.core.Exact.decSum(col("qs")).as("s"))
    val rated = rates.crossJoin(broadcast(total))
      .withColumn("rate_mille",
        least(lit(1000L),
          floor(lit(1000.0 * tempBudgetDocs) * col("qs")
            / (col("s") * col("n_docs"))).cast("long")))
    docs.join(broadcast(rated), "lang")
      .withColumn("keep", mille("temp") < col("rate_mille"))
      .groupBy("lang", "n_docs", "rate_mille")
      .agg(
        sum(col("keep").cast("long")).as("sampled_docs"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("sampled_tokens"))
  }

  val sampleTemperatureSql: String = {
    import graft.core.Exact
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
       |  FROM documents
       |), rates AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    ${Exact.duckRoundS("sqrt(COUNT(*))")} AS qs
       |  FROM d GROUP BY lang
       |), rated AS (
       |  SELECT lang, n_docs,
       |    least(1000, CAST(floor((CAST(${1000.0 * tempBudgetDocs} AS DOUBLE) * qs)
       |      / ((SELECT ${Exact.duckSum("qs")} FROM rates) * n_docs)) AS BIGINT)) AS rate_mille
       |  FROM rates
       |)
       |SELECT d.lang, n_docs, rate_mille,
       |  CAST(SUM(CASE WHEN ${duckMille("temp")} < rate_mille THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
       |  CAST(SUM(CASE WHEN ${duckMille("temp")} < rate_mille THEN toks ELSE 0 END) AS BIGINT) AS sampled_tokens
       |FROM d JOIN rated USING (lang)
       |GROUP BY d.lang, n_docs, rate_mille""".stripMargin
  }

  // -------------------------------------------------- exact-N sampling

  val ExactN = 100

  /** #134: EXACT-size uniform sample — the other corner of the sampling
    * trade-off from #52/#68: hash-threshold sampling is append-stable
    * and map-only but only approximates its target size (binomial
    * around p·N); ordering by a hash of the key and taking the first N
    * gives exactly N rows, uniformly, at the cost of append-stability
    * (a new doc can displace a sampled one). Eval sets, human-review
    * batches and fixed-size dev corpora want exact N.
    *
    * Scale shape: ORDER BY hash LIMIT N compiles to
    * TakeOrderedAndProject — each partition keeps an N-element heap and
    * only N rows per partition ever move (no global sort, no full
    * shuffle). The rank window runs AFTER the limit, over N rows.
    */
  def sampleExactN(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        PortableHash.pHash(concat(lit("exact"), col("doc_id"))).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(ExactN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("h"), col("doc_id"))))
  }

  val sampleExactNSql: String =
    s"""SELECT doc_id, lang, source, h,
       |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS INT) AS rank
       |FROM (
       |  SELECT doc_id, lang, source,
       |    ${PortableHash.duck("'exact' || doc_id")} AS h
       |  FROM documents ORDER BY h, doc_id LIMIT $ExactN
       |)""".stripMargin

  // --------------------------------------- #216 Neyman allocation

  /** Total sample budget for the Neyman-allocated draw. */
  val NeymanN = 100L

  /** #216: NEYMAN-OPTIMAL stratified sampling (Neyman 1934) — the
    * survey-sampling allocation rule production eval/labeling budgets
    * use: allocate the n=[[NeymanN]] budget across language strata
    * ∝ N_h·σ_h (big AND internally-varied strata deserve more
    * samples), which minimizes the estimator variance at fixed budget —
    * where #52's proportional allocation ignores within-stratum
    * variance entirely.
    *
    * Exactness chain: with the integer n_chars variable,
    * N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — the weight is the sqrt of ONE
    * EXACT INTEGER (a single correctly-rounded op; bound: N·Σx² < 2⁶³
    * holds to ~10⁸ docs/stratum at these lengths, then shift to
    * mean-centered scaled sums). Weights quantize 1e-6, the total is
    * an order-free quantized sum, and the INTEGER allocation is
    * largest-remainder (Hamilton): base = floor(n·w/W), the leftover
    * seats go by remainder rank — computed as a 25-pair SELF-JOIN
    * count over the 5-stratum frame ((rem, lang) total order), not an
    * unpartitioned window. Σ alloc = n EXACTLY by construction — the
    * identity the spec pins. The draw itself is the house
    * deterministic reservoir: per-stratum top-n_h by (pHash, doc_id).
    *
    * Scale: one map-side-combining moment pass over documents; the
    * allocation algebra runs on the 5-row stratum frame; the draw is
    * one lang-partitioned window. Output: one row per stratum.
    */
  def neymanAlloc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Exact
    val st = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pop"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("w", Exact.roundS(
        sqrt((col("n_pop") * col("sxx") - col("sx") * col("sx"))
          .cast("double")), 6))
    val tot = st.agg(Exact.decSum(col("w"), 6).as("tw"))
    val shares = st.crossJoin(broadcast(tot))
      .withColumn("share", lit(NeymanN.toDouble) * col("w") / col("tw"))
      .withColumn("base", floor(col("share")).cast("long"))
      .withColumn("rem", col("share") - floor(col("share")))
    val leftover = shares.agg((lit(NeymanN) - sum("base")).as("extra"))
    // remainder rank via a 25-pair self-join count — no global window
    val r = shares.select(col("lang").as("lang2"), col("rem").as("rem2"))
    val ranked = shares.join(r,
        (col("rem2") > col("rem")) ||
        (col("rem2") === col("rem") && col("lang2") < col("lang")),
        "left")
      .groupBy("lang", "n_pop", "w", "base", "rem")
      .agg((count(col("lang2")) + 1L).as("rnk"))
      .crossJoin(broadcast(leftover))
      .select(col("lang"), col("n_pop"), col("w"),
        (col("base") + when(col("rnk") <= col("extra"), 1L).otherwise(0L))
          .as("n_alloc"))
    val byLang = Window.partitionBy("lang")
      .orderBy(PortableHash.pHash(concat(lit("ney|"), col("doc_id"))),
        col("doc_id"))
    val drawn = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rnk", row_number().over(byLang))
      .join(ranked.select(col("lang"), col("n_alloc")), "lang")
      .filter(col("rnk") <= col("n_alloc"))
      .groupBy("lang").agg(count(lit(1)).as("n_drawn"))
    ranked.join(drawn, Seq("lang"), "left")
      .select(col("lang"), col("n_pop"),
        Exact.roundS(col("w") / col("n_pop"), 6).as("sigma"),
        col("n_alloc"), coalesce(col("n_drawn"), lit(0L)).as("n_drawn"))
  }

  val neymanAllocSql: String = {
    import graft.core.Exact
    val h = PortableHash.duck("'ney|' || doc_id")
    s"""WITH st AS (
       |  SELECT lang, COUNT(*) AS n_pop,
       |    CAST(SUM(n_chars) AS BIGINT) AS sx,
       |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
       |  FROM documents GROUP BY lang
       |), w AS (
       |  SELECT lang, n_pop,
       |    ${Exact.duckRoundS("sqrt(CAST(n_pop * sxx - sx * sx AS DOUBLE))", 6)} AS w
       |  FROM st
       |), tot AS (SELECT ${Exact.duckSum("w", 6)} AS tw FROM w),
       |shares AS (
       |  SELECT lang, n_pop, w,
       |    CAST(floor(${NeymanN}.0 * w / tw) AS BIGINT) AS base,
       |    (${NeymanN}.0 * w / tw) - floor(${NeymanN}.0 * w / tw) AS rem
       |  FROM w, tot
       |), leftover AS (
       |  SELECT $NeymanN - CAST(SUM(base) AS BIGINT) AS extra FROM shares
       |), ranked AS (
       |  SELECT s.lang, s.n_pop, s.w, s.base,
       |    1 + COUNT(r.lang2) AS rnk
       |  FROM shares s LEFT JOIN (SELECT lang AS lang2, rem AS rem2 FROM shares) r
       |    ON r.rem2 > s.rem OR (r.rem2 = s.rem AND r.lang2 < s.lang)
       |  GROUP BY s.lang, s.n_pop, s.w, s.base, s.rem
       |), alloc AS (
       |  SELECT lang, n_pop, w,
       |    base + CASE WHEN rnk <= extra THEN 1 ELSE 0 END AS n_alloc
       |  FROM ranked, leftover
       |), drawn AS (
       |  SELECT d.lang, COUNT(*) AS n_drawn
       |  FROM (
       |    SELECT doc_id, lang,
       |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rnk
       |    FROM documents
       |  ) d JOIN alloc a ON a.lang = d.lang AND d.rnk <= a.n_alloc
       |  GROUP BY d.lang
       |)
       |SELECT a.lang, a.n_pop,
       |  ${Exact.duckRoundS("a.w / a.n_pop", 6)} AS sigma,
       |  CAST(a.n_alloc AS BIGINT) AS n_alloc,
       |  COALESCE(d.n_drawn, 0) AS n_drawn
       |FROM alloc a LEFT JOIN drawn d ON d.lang = a.lang""".stripMargin
  }

  // --------------------------------- #236 weighted reservoir (A-ES)

  /** Weighted-reservoir sample size. */
  val WresN = 100
  /** Uniform-variate modulus (2^40; the 60-bit pHash folds onto it). */
  val WresMod = 1099511627776L

  /** #236: WEIGHTED sampling without replacement via exponential keys
    * (Efraimidis & Spirakis 2006, A-ES — the distributed-weighted-
    * reservoir algorithm): draw [[WresN]] documents with inclusion
    * probability ∝ n_chars by keying each doc with e_i = −ln(u_i)/w_i
    * (an Exponential(w_i) variate) and keeping the n SMALLEST keys —
    * the importance-weighted draw a curation pipeline uses when long
    * documents should anchor the sample ("sample by token mass, not by
    * document count"), and the one primitive the sampler family lacked:
    * #52/#154 draw uniformly, #68/#180 reweight DISTRIBUTIONS, A-ES
    * draws WITHOUT replacement under per-item weights.
    *
    * Determinism/exactness: u_i = (pHash % 2^40 + 1)/(2^40+1) — an
    * exact integer ratio in (0,1), one correctly-rounded division; the
    * ln is the only transcendental and its output quantizes 1e-12 (the
    * #203 discipline) after ONE division by the integer weight; the
    * top-n orders by (quantized key, doc_id) — cross-engine stable.
    *
    * Plan: map-side key computation, TakeOrdered n — per-partition
    * heaps + an n-row driver merge, the same shape as #154's uniform
    * reservoir; no global sort, nothing data-scale shuffles.
    */
  def sampleWeightedReservoir(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    import org.apache.spark.sql.expressions.Window
    val u = (PortableHash.pHash(concat(lit("wres"), col("doc_id")))
      % WresMod + 1L).cast("double") / (WresMod + 1L).toDouble
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Exact.roundS(-log(u) / col("n_chars"), 12).as("k"))
      .orderBy(col("k"), col("doc_id")).limit(WresN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))))
  }

  val sampleWeightedReservoirSql: String = {
    import graft.core.Exact
    val u = s"(CAST(${PortableHash.duck("'wres' || doc_id")} % $WresMod + 1" +
      s" AS DOUBLE) / ${(WresMod + 1L).toDouble})"
    s"""SELECT doc_id, lang, n_chars, k,
       |  CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) AS INT) AS rank
       |FROM (
       |  SELECT doc_id, lang, n_chars,
       |    ${Exact.duckRoundS(s"-ln($u) / n_chars", 12)} AS k
       |  FROM documents WHERE n_chars > 0
       |  ORDER BY k, doc_id LIMIT $WresN
       |)""".stripMargin
  }
}
