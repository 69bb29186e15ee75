package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}
import graft.dedup.Dedup

/** #332: the LLM curation pipeline registered END-TO-END (VERDICT r7
  * item 2) — every stage passes alone, but composition is what a 100 TB
  * pipeline actually runs: one DAG chaining the real operators over the
  * SAME per-doc frames they serve individually,
  *
  *   raw documents
  *     → corpus_clean      (#51's kept verdict: lang ∧ quality ∧ exact-dedup
  *                          ∧ pairwise near-dup drop)
  *     → canonical dedup   (#111: survivors must be their near-dup
  *                          cluster's representative)
  *     → model gate        (#141's trained-LR keep verdict)
  *     → decontaminate     (#62: drop the eval slice itself and any doc
  *                          sharing an 8-gram with it)
  *     → train split       (#127's leakage-safe cluster-keyed holdout:
  *                          keep 'train')
  *     → pack              (#82's concat-then-chunk: blocks the
  *                          survivors fill, per-source streams)
  *
  * and emits the per-stage ACCOUNTING table — cumulative survivors and
  * token mass after each stage, plus the packed-sequence count — the
  * one-page artifact reviewed before committing a training run to the
  * data.
  *
  * Scale shape: every stage verdict is a per-doc flag frame keyed on
  * doc_id (clean flags ride the session-staged funnel frame; the
  * canonical/cluster table is pair-graph-sized and broadcasts; the gate
  * is map-only; contamination probes a broadcast eval-gram set; split
  * is a pure hash of the cluster id) — so the composition is a chain of
  * doc_id-keyed joins that AQE plans as broadcasts at test SF and as
  * co-partitioned shuffles at corpus scale, followed by ONE
  * map-side-combining aggregate onto a 7-row output. Composing loses
  * nothing: no stage re-derives another's work (the funnel frame,
  * pair graph, trained weights are shared session artifacts).
  *
  * Exactness: pure flag logic + integer counts/token sums; the only
  * doubles live inside the component verdicts, each already
  * oracle-pinned; blocks = per-source ceil-division on integers.
  */
object Pipeline {

  /** Stage names in funnel order. */
  val Stages: Seq[String] = Seq("raw", "clean", "canonical", "quality_gate",
    "decontaminated", "train_split", "packed")

  def e2e(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val clean = CorpusClean.keptFlags(spark, dir)
      .select(col("doc_id"), col("source"),
        coalesce(col("n_words"), lit(0L)).as("tok"), col("kept"))
    val canon = Dedup.canonical(spark, dir)
      .select(col("doc_id"), col("canonical_id"), col("is_canonical"))
    val gate = QualityClassifier.infer(spark, dir)
      .select(col("doc_id"), col("keep"))
    val contam = Decontaminate.decontaminate(spark, dir)
      .select(col("doc_id")).withColumn("contaminated", lit(true))

    val fl = docs
      .join(clean, Seq("doc_id"))
      .join(canon, Seq("doc_id"))
      .join(gate, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("s1", col("kept"))
      .withColumn("s2", col("s1") && col("is_canonical"))
      .withColumn("s3", col("s2") && coalesce(col("keep"), lit(false)))
      .withColumn("s4", col("s3")
        && col("doc_id") % Decontaminate.EvalMod =!= 0
        && coalesce(!col("contaminated"), lit(true)))
      // #127's assignment inlined: split = hash of the CLUSTER id, so
      // near-dup partners can never straddle the holdout boundary.
      .withColumn("s5", col("s4")
        && PortableHash.pHash(concat(lit("split|"),
          col("canonical_id").cast("string"))) % Split.Buckets >= 2)

    def n(s: Column) = sum(when(s, 1L).otherwise(0L))
    def t(s: Column) = sum(when(s, col("tok")).otherwise(0L))
    // r10 (guide §2.4, remove duplicated subtrees): the funnel counts
    // and the packed-block count used to be TWO independent aggregates
    // over `fl`, so the whole upstream chain (clean flags, canonical
    // pair graph, LR gate, contamination probe) was planned and
    // EXECUTED twice per run. One per-source aggregate pass now feeds
    // both: stage totals are sums of the per-source partials, and
    // blocks = Σ_source ceil(t5_source / SeqLen) exactly as before
    // (a source with no s5 survivors has t5_source = 0 ⇒ 0 blocks,
    // identical to being absent from the old filtered aggregate).
    val per = fl.groupBy("source").agg(
      count(lit(1)).as("c0"), sum("tok").as("s0"),
      n(col("s1")).as("c1"), t(col("s1")).as("m1"),
      n(col("s2")).as("c2"), t(col("s2")).as("m2"),
      n(col("s3")).as("c3"), t(col("s3")).as("m3"),
      n(col("s4")).as("c4"), t(col("s4")).as("m4"),
      n(col("s5")).as("c5"), t(col("s5")).as("m5"))
    val agg = per.agg(
      coalesce(sum("c0"), lit(0L)).as("n0"), sum("s0").as("t0"),
      sum("c1").as("n1"), sum("m1").as("t1"),
      sum("c2").as("n2"), sum("m2").as("t2"),
      sum("c3").as("n3"), sum("m3").as("t3"),
      sum("c4").as("n4"), sum("m4").as("t4"),
      sum("c5").as("n5"), sum("m5").as("t5"),
      coalesce(sum(expr(
        s"(m5 + ${Packing.SeqLen - 1}) DIV ${Packing.SeqLen}")), lit(0L))
        .as("nb"))

    agg.selectExpr(
      s"""stack(7,
         |  0, 'raw',            n0, t0, CAST(NULL AS BIGINT),
         |  1, 'clean',          n1, t1, CAST(NULL AS BIGINT),
         |  2, 'canonical',      n2, t2, CAST(NULL AS BIGINT),
         |  3, 'quality_gate',   n3, t3, CAST(NULL AS BIGINT),
         |  4, 'decontaminated', n4, t4, CAST(NULL AS BIGINT),
         |  5, 'train_split',    n5, t5, CAST(NULL AS BIGINT),
         |  6, 'packed',         n5, t5, nb
         |) AS (stage_ord, stage, n_docs, n_tokens, n_blocks)""".stripMargin)
  }

  /** Oracle: the composed CTE chain — canonical (recursive, includes the
    * MinHash pair graph), the clean funnel, the gate's 25 re-derived GD
    * rounds, the contamination probe — spliced from the SAME fragments
    * the component oracles use, so the composition cannot drift from
    * the parts.
    */
  val e2eSql: String = {
    val serveBody = QualityClassifier.serveCtes.stripPrefix("WITH ")
    val k = QualityClassifier.ServeEpochs
    val gram = (1 until Decontaminate.N)
      .foldLeft("ws[j]")((acc, kk) => s"$acc || ' ' || ws[j+$kk]")
    val splitH = PortableHash.duck("'split|' || c.canonical_id")
    s"""WITH RECURSIVE ${Dedup.canonicalCtes},
       |${CorpusClean.cleanCtes},
       |$serveBody,
       |gatek AS MATERIALIZED (
       |  SELECT f.doc_id, ${QualityClassifier.duckP} >= 0.5 AS keep
       |  FROM f CROSS JOIN wv$k
       |),
       |dd AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents
       |), gg AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(
       |      range(1, len(ws) - ${Decontaminate.N - 2}),
       |      j -> ${PortableHash.duck(gram)}))) AS gh
       |  FROM dd WHERE len(ws) >= ${Decontaminate.N}
       |), contam AS (
       |  SELECT DISTINCT t.doc_id FROM gg t JOIN gg e ON e.gh = t.gh
       |  WHERE t.doc_id % ${Decontaminate.EvalMod} <> 0
       |    AND e.doc_id % ${Decontaminate.EvalMod} = 0
       |), flx AS (
       |  SELECT al.doc_id, al.source, COALESCE(al.n_words, 0) AS tok,
       |    al.kept AS s1,
       |    al.kept AND c.canonical_id = c.doc_id AS s2,
       |    al.kept AND c.canonical_id = c.doc_id
       |      AND COALESCE(gk.keep, FALSE) AS s3,
       |    al.kept AND c.canonical_id = c.doc_id
       |      AND COALESCE(gk.keep, FALSE)
       |      AND al.doc_id % ${Decontaminate.EvalMod} <> 0
       |      AND ct.doc_id IS NULL AS s4,
       |    al.kept AND c.canonical_id = c.doc_id
       |      AND COALESCE(gk.keep, FALSE)
       |      AND al.doc_id % ${Decontaminate.EvalMod} <> 0
       |      AND ct.doc_id IS NULL
       |      AND $splitH % ${Split.Buckets} >= 2 AS s5
       |  FROM alls al
       |  JOIN canon c USING (doc_id)
       |  LEFT JOIN gatek gk ON gk.doc_id = al.doc_id
       |  LEFT JOIN contam ct ON ct.doc_id = al.doc_id
       |), agg AS (
       |  SELECT COUNT(*) AS n0, CAST(SUM(tok) AS BIGINT) AS t0,
       |    CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN s1 THEN tok ELSE 0 END) AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN s2 THEN tok ELSE 0 END) AS BIGINT) AS t2,
       |    CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(SUM(CASE WHEN s3 THEN tok ELSE 0 END) AS BIGINT) AS t3,
       |    CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
       |    CAST(SUM(CASE WHEN s4 THEN tok ELSE 0 END) AS BIGINT) AS t4,
       |    CAST(SUM(CASE WHEN s5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
       |    CAST(SUM(CASE WHEN s5 THEN tok ELSE 0 END) AS BIGINT) AS t5
       |  FROM flx
       |), blocks AS (
       |  SELECT CAST(COALESCE(SUM((st + ${Packing.SeqLen - 1})
       |      // ${Packing.SeqLen}), 0) AS BIGINT) AS nb
       |  FROM (SELECT source, CAST(SUM(tok) AS BIGINT) AS st
       |        FROM flx WHERE s5 GROUP BY source)
       |)
       |SELECT CAST(0 AS INT) AS stage_ord, 'raw' AS stage, n0 AS n_docs,
       |  t0 AS n_tokens, CAST(NULL AS BIGINT) AS n_blocks FROM agg
       |UNION ALL SELECT 1, 'clean', n1, t1, NULL FROM agg
       |UNION ALL SELECT 2, 'canonical', n2, t2, NULL FROM agg
       |UNION ALL SELECT 3, 'quality_gate', n3, t3, NULL FROM agg
       |UNION ALL SELECT 4, 'decontaminated', n4, t4, NULL FROM agg
       |UNION ALL SELECT 5, 'train_split', n5, t5, NULL FROM agg
       |UNION ALL SELECT 6, 'packed', n5, t5, nb FROM agg, blocks""".stripMargin
  }
}
