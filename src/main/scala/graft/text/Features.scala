package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Feature hashing (the hashing trick — Weinberger et al. ICML'09): the
  * featurization layer of every vocabulary-free text classifier
  * (fastText's input projection, Vowpal Wabbit's core representation,
  * CC-Net's fastText quality/language stages). Words and word-bigrams
  * map to a FIXED number of slots via a hash, with a hash-derived ±1
  * sign so collisions cancel in expectation instead of biasing upward —
  * no vocabulary build, no dictionary to ship, memory constant in
  * corpus size.
  */
object Features {

  /** Slot count (2^10). Real deployments use 2^18-2^22; the constant
    * changes nothing in the plan.
    */
  val NSlots = 1024

  /** #155: the corpus-level hashed-feature table — per slot the
    * occurrence count, distinct-feature count (the collision
    * diagnostic: slots where n_feats > 1 are where the sign trick
    * earns its keep) and the signed sum a linear model would actually
    * accumulate. The per-doc vector is the same map with doc_id kept;
    * the corpus table is the training-side aggregate (feature
    * frequencies for pruning/regularization scaling) and the
    * oracle-checkable artifact.
    *
    * Plan: one scan, explode to (feature) rows, hash to (slot, sign)
    * map-side, then ONE groupBy onto ≤ [[NSlots]] keys — n_occ and
    * signed_sum combine map-side, so their shuffle bytes are constant
    * in corpus size; the distinct-feature count shuffles (slot, feat)
    * pairs, bounded by VOCABULARY size, not corpus size (drop that
    * column and the whole op is sketch-shaped). At 100 TB this is
    * scan-speed featurization — the exact plan a fastText-style
    * training pass runs as its first stage.
    */
  def hashFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), ws.as("ws"))
    val uni = docs.select(explode(col("ws")).as("feat"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => concat_ws(" ", x, y))
    val bi = docs.filter(size(col("ws")) >= 2).select(explode(bigrams).as("feat"))
    uni.unionByName(bi)
      .select(col("feat"), PortableHash.pHash(concat(lit("FH|"), col("feat"))).as("fh"))
      .select(col("feat"), pmod(col("fh"), lit(NSlots)).as("slot"),
        when((expr(s"fh DIV $NSlots") % 2) === 0, 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("slot")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("feat")).as("n_feats"),
        sum("sign").as("signed_sum"))
  }

  val hashFeaturesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
       |), feats AS (
       |  SELECT unnest(ws) AS feat FROM d
       |  UNION ALL
       |  SELECT unnest(list_transform(range(1, len(ws)),
       |    i -> ws[i] || ' ' || ws[i + 1])) AS feat
       |  FROM d WHERE len(ws) >= 2
       |), hashed AS (
       |  SELECT feat, ${PortableHash.duck("'FH|' || feat")} AS fh FROM feats
       |), slotted AS (
       |  SELECT feat, fh % $NSlots AS slot,
       |    CASE WHEN (fh // $NSlots) % 2 = 0 THEN 1 ELSE -1 END AS sign
       |  FROM hashed
       |)
       |SELECT slot, COUNT(*) AS n_occ, COUNT(DISTINCT feat) AS n_feats,
       |  CAST(SUM(sign) AS BIGINT) AS signed_sum
       |FROM slotted GROUP BY slot""".stripMargin

  // ----------------------------------------------- #158 PMI collocations

  /** Minimum pair frequency before a bigram is PMI-eligible (the
    * standard low-count guard: PMI of a hapax pair is pure noise).
    */
  val PmiMinCount = 5

  /** Collocations reported. */
  val PmiTopN = 20

  /** #158: PMI collocation mining — the top word pairs by pointwise
    * mutual information log(N·c(w1w2) / (c(w1)·c(w2))): the phrase
    * detector behind word2vec's phrase pass and every "New_York"-style
    * tokenizer vocabulary decision, and the association score behind
    * corpus n-gram analysis. PMI rewards pairs that co-occur far above
    * the independence baseline; the [[PmiMinCount]] floor removes the
    * hapax noise PMI is notorious for.
    *
    * Exactness: one transcendental over one correctly-rounded ratio of
    * exact integer products (c_pair·N and c1·c2 stay below 2^53 until
    * corpus unigram counts pass ~9e7 per word — quantize the counts
    * first beyond that), grid-quantized at scale 6; ranking is over the
    * quantized value with a (w1, w2) tiebreak — a total order, so the
    * top-N is engine-exact.
    *
    * Plan: unigram and bigram counts are two map-side-combining
    * aggregates keyed on the word/pair (vocabulary-bounded); the
    * count-floor filter shrinks the pair frame BEFORE the two
    * vocabulary-keyed count joins; top-N is TakeOrderedAndProject
    * (per-partition heaps — the #63 discipline), ranked post-limit.
    */
  def pmiPhrases(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    val docs = Tables.documents(spark, dir).select(ws.as("ws"))
    val uni = docs.select(explode(col("ws")).as("w"))
    val cw = uni.groupBy("w").agg(count(lit(1)).as("cu"))
    val n = uni.agg(count(lit(1)).as("n"))
    val pairs = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val cb = docs.filter(size(col("ws")) >= 2)
      .select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= PmiMinCount)
    cb.join(cw.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1"), "w1")
      .join(cw.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2"), "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi", graft.core.Exact.roundS(
        log((col("c_pair") * col("n")).cast("double") /
          (col("c1") * col("c2")).cast("double")), 6))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(PmiTopN)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)))
      .select("w1", "w2", "c_pair", "c1", "c2", "pmi", "rnk")
  }

  val pmiPhrasesSql: String =
    s"""WITH d AS (
       |  SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
       |), uni AS (
       |  SELECT unnest(ws) AS w FROM d
       |), cw AS (
       |  SELECT w, COUNT(*) AS cu FROM uni GROUP BY w
       |), n AS (
       |  SELECT COUNT(*) AS n FROM uni
       |), cb AS (
       |  SELECT w1, w2, COUNT(*) AS c_pair FROM (
       |    SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
       |      unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
       |    FROM d WHERE len(ws) >= 2
       |  ) GROUP BY w1, w2 HAVING COUNT(*) >= $PmiMinCount
       |), scored AS (
       |  SELECT w1, w2, c_pair, c1.cu AS c1, c2.cu AS c2,
       |    ${graft.core.Exact.duckRoundS(
             "ln(CAST(c_pair * n AS DOUBLE) / CAST(c1.cu * c2.cu AS DOUBLE))", 6)} AS pmi
       |  FROM cb
       |  JOIN cw c1 ON c1.w = cb.w1
       |  JOIN cw c2 ON c2.w = cb.w2
       |  CROSS JOIN n
       |)
       |SELECT w1, w2, c_pair, c1, c2, pmi,
       |  CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS INT) AS rnk
       |FROM scored
       |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT $PmiTopN""".stripMargin

  // ------------------------------------------- #279 LLR collocations

  val LlrMinCount = 5
  val LlrTopN = 50

  /** #279: DUNNING LOG-LIKELIHOOD-RATIO collocations (Dunning 1993) —
    * the statistically-grounded sibling of #170's PMI: PMI explodes for
    * rare pairs (a hapax bigram of two hapax words maxes the score),
    * which is why Dunning's G² — the likelihood-ratio test on the full
    * 2×2 bigram contingency (k11 pair, k12/k21 one-side-only, k22
    * neither) — is what real collocation extractors rank by: it grows
    * with EVIDENCE, not just lift. G² = 2(Σ xlx(cell) + xlx(N) −
    * Σ xlx(margin)) with xlx(k) = k·ln k, the entropy identity that
    * needs no expected-count division.
    *
    * Exactness: all nine xlx inputs are EXACT integers off three
    * bigram-stream aggregates (pair counts + positional marginals —
    * NOT #170's unigram counts: the test is on the bigram table, so
    * its margins must be positional); ln is the one transcendental —
    * output grid-quantized at 1e-6 per the house rule — and each xlx
    * term is one correctly-rounded product, summed in a FIXED literal
    * tree mirrored textually. Top-K by (G², w1, w2) — a total order.
    *
    * Scale: one explode over adjacent pairs feeds the (w1,w2) count
    * and both vocab-sized marginals; candidates floor at
    * [[LlrMinCount]] before any join; the final rank is TakeOrdered
    * (per-partition heaps), never a global sort.
    */
  def llrCollocations(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val ws = split(trim(col("text")), "\\s+")
    val pairsCol = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val pairs = Tables.documents(spark, dir).select(ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(pairsCol).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
      .filter(col("k11") >= LlrMinCount)
    val r = pairs.groupBy("w1").agg(count(lit(1)).as("r1"))
    val c = pairs.groupBy("w2").agg(count(lit(1)).as("c1"))
    val n = pairs.agg(count(lit(1)).as("nn"))
    def xlx(k: Column): Column =
      when(k > 0L, k.cast("double") *
        Exact.roundS(log(k.cast("double")), 6)).otherwise(lit(0.0))
    cb.join(r, "w1").join(c, "w2").crossJoin(broadcast(n))
      .withColumn("k12", col("r1") - col("k11"))
      .withColumn("k21", col("c1") - col("k11"))
      .withColumn("k22", col("nn") - col("r1") - col("c1") + col("k11"))
      .withColumn("llr", lit(2.0) *
        (xlx(col("k11")) + xlx(col("k12")) + xlx(col("k21"))
          + xlx(col("k22")) + xlx(col("nn"))
          - xlx(col("r1")) - xlx(col("nn") - col("r1"))
          - xlx(col("c1")) - xlx(col("nn") - col("c1"))))
      .orderBy(col("llr").desc, col("w1").asc, col("w2").asc)
      .limit(LlrTopN)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("llr").desc, col("w1").asc, col("w2").asc)))
      .select("w1", "w2", "k11", "r1", "c1", "llr", "rnk")
  }

  val llrCollocationsSql: String = {
    def xlx(k: String): String =
      s"CASE WHEN ($k) > 0 THEN CAST(($k) AS DOUBLE) * " +
        s"(floor(ln(CAST(($k) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) " +
        "ELSE 0.0::DOUBLE END"
    s"""WITH d AS (
       |  SELECT regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents
       |), p AS (
       |  SELECT ws[i] AS w1, ws[i + 1] AS w2
       |  FROM (SELECT ws, UNNEST(range(1, len(ws))) AS i FROM d
       |        WHERE len(ws) >= 2)
       |), cb AS (
       |  SELECT w1, w2, COUNT(*) AS k11 FROM p GROUP BY 1, 2
       |  HAVING COUNT(*) >= $LlrMinCount
       |), r AS (SELECT w1, COUNT(*) AS r1 FROM p GROUP BY 1),
       |c AS (SELECT w2, COUNT(*) AS c1 FROM p GROUP BY 1),
       |n AS (SELECT COUNT(*) AS nn FROM p),
       |sc AS (
       |  SELECT w1, w2, k11, r1, c1,
       |    2.0 * (${xlx("k11")} + ${xlx("r1 - k11")} + ${xlx("c1 - k11")}
       |      + ${xlx("nn - r1 - c1 + k11")} + ${xlx("nn")}
       |      - ${xlx("r1")} - ${xlx("nn - r1")}
       |      - ${xlx("c1")} - ${xlx("nn - c1")}) AS llr
       |  FROM cb JOIN r USING (w1) JOIN c USING (w2), n
       |)
       |SELECT w1, w2, k11, r1, c1, llr,
       |  CAST(ROW_NUMBER() OVER (ORDER BY llr DESC, w1 ASC, w2 ASC) AS INT)
       |    AS rnk
       |FROM sc
       |ORDER BY llr DESC, w1 ASC, w2 ASC LIMIT $LlrTopN""".stripMargin
  }

  // -------------------------------------- #315 vocabulary drift (JS)

  /** ln 2 literal (see DataQuality.Ln2 — same constant, kept local to
    * avoid a cross-module constant dependency in SQL interpolation).
    */
  private val Ln2 = 0.6931471805599453

  /** #315: VOCABULARY DRIFT — per document source, the Jensen–Shannon
    * divergence between the source's hashed uni+bigram SLOT
    * distribution and the rest of the corpus: the CONTENT member of
    * the drift triad's document side. #300 compares quality-SCORE
    * histograms (a source can drift in topic while its quality
    * distribution holds perfectly still — boilerplate swaps, template
    * changes, language mix shifts); this compares what the documents
    * actually SAY, over the same fixed [[NSlots]] feature space the
    * classifier stack (#155/#157) consumes — so a drift alarm here
    * predicts classifier-input drift directly. Bounded by ln 2;
    * `js_norm` ∈ [0, 1] thresholds uniformly across sources.
    *
    * Exactness/scale: the #155 hashing discipline (map-side slot
    * collapse, keyspace FIXED at [[NSlots]]·|sources| regardless of
    * corpus size); Laplace-smoothed cell terms take ln of one ratio of
    * exactly-converted integer-double products, quantized 1e-6,
    * order-free sums; completion joins the broadcast source list onto
    * the slot frame.
    */
  def vocabDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Exact
    val ws = split(trim(col("text")), "\\s+")
    val docs = Tables.documents(spark, dir)
      .select(col("source"), ws.as("ws"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => concat_ws(" ", x, y))
    val feats = docs.select(col("source"), explode(col("ws")).as("feat"))
      .unionByName(docs.filter(size(col("ws")) >= 2)
        .select(col("source"), explode(bigrams).as("feat")))
      .select(col("source"),
        pmod(PortableHash.pHash(concat(lit("FH|"), col("feat"))),
          lit(NSlots)).as("slot"))
    // r10 (guide §2.4): g and srcs used to re-aggregate `feats` (the
    // corpus-scale explode+hash pipeline) on different keys — three
    // independent executions with no exchange to reuse. Everything
    // rolls up from the dictionary-sized hs instead: ct per slot is
    // the sum of its per-source cells, and a source/slot appears in hs
    // iff it appears in feats — identical values by construction.
    val hs = feats.groupBy("source", "slot").agg(count(lit(1)).as("c"))
    val g = hs.groupBy("slot").agg(sum("c").as("ct"))
    val gt = g.agg(count(lit(1)).as("n_slots"), sum("ct").as("n_t"))
    val srcs = hs.select("source").distinct()
    val ns = hs.groupBy("source").agg(sum("c").as("n_s"))
    val full = g.crossJoin(broadcast(srcs))
      .join(hs, Seq("source", "slot"), "left")
      .select(col("source"), col("ct"), coalesce(col("c"), lit(0L)).as("c"))
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(gt))
    val numP = (col("c") + 1L).cast("double") *
      (col("n_t") - col("n_s") + col("n_slots")).cast("double")
    val numQ = (col("ct") - col("c") + 1L).cast("double") *
      (col("n_s") + col("n_slots")).cast("double")
    val p = (col("c") + 1L).cast("double") /
      (col("n_s") + col("n_slots")).cast("double")
    val q = (col("ct") - col("c") + 1L).cast("double") /
      (col("n_t") - col("n_s") + col("n_slots")).cast("double")
    val term = lit(0.5) * p * log(lit(2.0) * numP / (numP + numQ)) +
      lit(0.5) * q * log(lit(2.0) * numQ / (numP + numQ))
    full
      .select(col("source"), col("n_s"), col("n_slots"),
        Exact.roundS(term, 6).as("term"))
      .groupBy("source")
      .agg(first("n_s").as("n_feats"), first("n_slots").as("n_slots"),
        Exact.decSum(col("term"), 6).as("js"))
      .withColumn("js_norm", col("js") / Ln2)
  }

  val vocabDriftSql: String = {
    import graft.core.Exact
    val numP = "(CAST(c + 1 AS DOUBLE) * CAST(n_t - n_s + n_slots AS DOUBLE))"
    val numQ = "(CAST(ct - c + 1 AS DOUBLE) * CAST(n_s + n_slots AS DOUBLE))"
    val p = "(CAST(c + 1 AS DOUBLE) / CAST(n_s + n_slots AS DOUBLE))"
    val q = "(CAST(ct - c + 1 AS DOUBLE) / CAST(n_t - n_s + n_slots AS DOUBLE))"
    val term =
      s"""0.5 * $p * ln(2.0 * $numP / ($numP + $numQ)) +
         |    0.5 * $q * ln(2.0 * $numQ / ($numP + $numQ))""".stripMargin
    s"""WITH d AS (
       |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents
       |), feats AS (
       |  SELECT source, unnest(ws) AS feat FROM d
       |  UNION ALL
       |  SELECT source,
       |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]))
       |  FROM d WHERE len(ws) >= 2
       |), sl AS (
       |  SELECT source, ${PortableHash.duck("'FH|' || feat")} % $NSlots AS slot
       |  FROM feats
       |), hs AS (
       |  SELECT source, slot, COUNT(*) AS c FROM sl GROUP BY 1, 2
       |), g AS (SELECT slot, COUNT(*) AS ct FROM sl GROUP BY 1),
       |gt AS (SELECT COUNT(*) AS n_slots, CAST(SUM(ct) AS BIGINT) AS n_t
       |       FROM g),
       |srcs AS (SELECT DISTINCT source FROM sl),
       |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
       |       FROM hs GROUP BY 1),
       |fl AS (
       |  SELECT srcs.source, g.ct, COALESCE(hs.c, 0) AS c, ns.n_s,
       |    gt.n_slots, gt.n_t
       |  FROM g CROSS JOIN srcs
       |  LEFT JOIN hs ON hs.source = srcs.source AND hs.slot = g.slot
       |  JOIN ns ON ns.source = srcs.source, gt
       |), terms AS (
       |  SELECT source, n_s, n_slots,
       |    ${Exact.duckRoundS(term, 6)} AS term
       |  FROM fl
       |)
       |SELECT source, MIN(n_s) AS n_feats, MIN(n_slots) AS n_slots,
       |  ${Exact.duckSum("term", 6)} AS js,
       |  ${Exact.duckSum("term", 6)} / $Ln2 AS js_norm
       |FROM terms GROUP BY source""".stripMargin
  }

  // --------------------------------------- #318 source vocabulary overlap

  /** #318: SOURCE VOCABULARY OVERLAP — pairwise Jaccard and overlap
    * coefficient of every crawl-source pair's distinct-word vocabulary:
    * the redundancy MATRIX mixing policy reads before setting per-source
    * budgets (#53/#68). The per-source dedup rate (#294) counts verbatim
    * copies and #315's drift gauge compares each source to the rest —
    * neither says WHICH sources duplicate each other; two sources with
    * near-identical vocabularies contribute one source's worth of
    * diversity and should share one budget line. The overlap coefficient
    * is the containment reading (a small source living INSIDE a big
    * one's vocabulary scores high even when Jaccard is diluted).
    *
    * Scale: the corpus collapses map-side to distinct (source, word) —
    * bounded by vocab × sources, never corpus rows; the intersection is
    * ONE word-keyed self-join on that bounded frame (s1 < s2 dedups
    * pairs); per-source sizes broadcast onto the ≤ C(sources,2) pair
    * rows. Exactness: integer counts; jaccard/overlap are single
    * divisions of identical integers — no quantization anywhere.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    val sv = Tables.documents(spark, dir)
      .select(col("source"), explode(ws).as("w"))
      .distinct()
    val sizes = sv.groupBy("source").agg(count(lit(1)).as("n_vocab"))
    sv.as("a").join(sv.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_vocab").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_vocab").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"),
        (col("n_common").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("overlap_coef"))
  }

  val sourceOverlapSql: String =
    """WITH sv AS (
      |  SELECT DISTINCT source, w FROM (
      |    SELECT source,
      |      unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |    FROM documents)
      |), sz AS (
      |  SELECT source, COUNT(*) AS n_vocab FROM sv GROUP BY source
      |), inter AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    COUNT(*) AS n_common
      |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT source_a, source_b,
      |  sa.n_vocab AS n_a, sb.n_vocab AS n_b, n_common,
      |  CAST(n_common AS DOUBLE)
      |    / CAST(sa.n_vocab + sb.n_vocab - n_common AS DOUBLE) AS jaccard,
      |  CAST(n_common AS DOUBLE)
      |    / CAST(least(sa.n_vocab, sb.n_vocab) AS DOUBLE) AS overlap_coef
      |FROM inter
      |JOIN sz sa ON sa.source = source_a
      |JOIN sz sb ON sb.source = source_b""".stripMargin
}
