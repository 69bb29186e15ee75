package graft.kge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Dict

/** #17/#18: ranking evaluation — Hits@{1,3,10}, MRR, mean rank — for
  * DistMult scores over a deterministic test slice.
  *
  * Reference: kge/hole.py:372-425 (`get_mrr`: rank the true object among
  * candidates, pos_obj rank with np.argsort) and Functions.scala:48-54
  * (`Hits.hitsAt1`).
  *
  * Scale design (the N_test × N_entities blow-up VERDICT flagged):
  *  - the test slice is a 1-in-199 deterministic sample, filtered BEFORE
  *    any join;
  *  - candidates are NOT all entities but the distinct objects of the
  *    test triple's own relation (type-constrained candidate set),
  *    AND the ranking is FILTERED in the standard sense (Bordes et al.):
  *    a candidate that forms another known-true triple (sid, pid, cand)
  *    does not count against the rank — only genuinely-wrong candidates
  *    do (ADVICE r2: the previous revision ranked raw within the
  *    type-constrained set);
  *  - the candidate list joins via broadcast (relation → candidate set is
  *    dictionary-sized); scores are inline dyadic math, no embedding
  *    shuffle; the rank is computed by counting strictly-better
  *    candidates in ONE groupBy — no global sort, no window over the
  *    cross product. At larger candidate sets the documented scale path
  *    is an ANN/LSH pre-filter per head (see SURVEY §5).
  */
object RankingEval {
  import Embeddings._
  import graft.core.PortableHash

  /** Per-relation candidate cap for the eval family (#17/#18/#85/#100/
    * #103/#283): the rank is computed against AT MOST this many
    * candidates per relation — the CandCap hash-minimal members of the
    * relation's observed entity pool (plus the filtered-protocol
    * exclusions within that sample). When a relation's pool is ≤ the cap
    * (all pools at sf0.001) this is exactly the Bordes filtered
    * protocol; past it, it is the standard sampled-negatives protocol
    * (OGB link-prediction ranks against a few hundred sampled
    * candidates) with a deterministic hash-minimal sample instead of an
    * RNG draw. This is the round-6 VERDICT lead item: the UNBOUNDED
    * subject pools grew the head-direction pair space ~100× at 10× data
    * (the one operator family that failed a 10× scale run); capped, the
    * pair space is |test|·CandCap — linear in the test slice at any
    * graph size.
    */
  val CandCap = 4096

  /** Cap for the #291 bounded eval headliner — small enough that the
    * sampling bites at every test SF (so correctness exercises the cap
    * logic itself), inside the OGB convention (~500 sampled negatives).
    */
  val BoundedCap = 256

  /** Bucket count for the two-level top-C selection (parallelism only —
    * the selected set is bucket-count-invariant, see [[topCByHash]]).
    */
  private val TopCBuckets = 64

  /** The `cap` candidates of each relation with the smallest
    * (pHash(seed|pid|cand), cand) — a deterministic, append-unstable-
    * by-design sampled candidate pool (adding pool members can only
    * displace hash-larger ones; membership never depends on row order).
    *
    * Scale: a naive row_number over partition-by-pid is a per-relation
    * global sort — the neg_sample_typed lesson. Two levels instead:
    * per-(pid, hash-bucket) top-cap first (pool/B rows per sort task),
    * then top-cap over the ≤ B·cap survivors per pid. Every global
    * top-cap member is inside its own bucket's top-cap, so the result
    * EQUALS the single-level global top-cap for any bucket count — the
    * oracle uses the single-level form.
    */
  private[kge] def topCByHash(
      pool: DataFrame, seed: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withH = pool
      .withColumn("h", PortableHash.pHash(
        concat_ws("|", lit(seed), col("pid"), col("cand"))))
      .withColumn("bkt", col("h") % TopCBuckets)
    withH
      .withColumn("lr", row_number().over(
        Window.partitionBy("pid", "bkt").orderBy("h", "cand")))
      .filter(col("lr") <= cap)
      .withColumn("gr", row_number().over(
        Window.partitionBy("pid").orderBy("h", "cand")))
      .filter(col("gr") <= cap)
      .select("pid", "cand")
  }

  /** Per-test-triple rank of the true object (1-based; ties broken by
    * candidate id so the rank is total-order deterministic).
    *
    * Embeddings are materialized ONCE per dictionary (id → array) and
    * joined by id — computing them inline per candidate pair would redo
    * the hash work |candidates| times (measured 5× slower), and with
    * LEARNED embeddings the id-keyed join is the only option anyway.
    * The embedding tables are dictionary-sized → AQE broadcasts them;
    * at 1e9 entities they become shuffle joins on id, same plan shape.
    */
  private val ranksCache =
    new graft.core.DfCache[(SparkSession, String)]

  /** The scored test slice — test triples with their h/t/r vectors and
    * the true-triple score attached — the subtree shared verbatim by
    * the tail rank build, the head rank build and the bounded eval.
    * Deliberately NOT cached or checkpointed (r11, measured): as a
    * plain subtree each consumer fuses it into its own adaptive plan
    * and the runtime overlaps its stages with the candidate-pool
    * windows; materializing it as a separate checkpoint job serialized
    * those stages and cost +2-5 s per eval-family COLD leg (fixed-order
    * A/B at sf0.1: cold sum 47.0 s cached vs 42.9 s fused).
    */
  private[kge] def scoredTest(spark: SparkSession, dir: String): DataFrame = {
      val entEmb = entityEmb(spark, dir)
      encodedSample(spark, dir, EvalMod)
        .join(entEmb.select(col("id").as("sid"), col("v").as("h")), "sid")
        .join(entEmb.select(col("id").as("oid"), col("v").as("t")), "oid")
        .join(broadcast(relationEmb(spark, dir)
          .select(col("id").as("pid"), col("v").as("r"))), "pid")
        .withColumn("score_t",
          graft.functions.VectorFolds.dot3(col("h"), col("r"), col("t")))
    }

  /** Cached per session: hits@k and MRR both aggregate this frame.
    *
    * r11 (VERDICT r10 item 3): the cache build ends in a LAZY
    * localCheckpoint. The InMemoryRelation used to carry the full
    * candidate-join origin plan, and every one of the 8 consumers
    * (hits@k, mrr, per-relation, by-degree, by-category, mrr_ci,
    * eval_both, per-relation-head) re-ran driver-side AQE planning over
    * it per invocation — kge_eval_by_category measured ~2.8 s of its
    * 3.7 s OUTSIDE jobs. The checkpoint truncates the consumers' plans
    * to a LogicalRDD scan; eager=false keeps registration lazy (no job
    * until a consumer materializes), so the SqlSurface eager audit is
    * unchanged. Bench cold legs still recompute: clearDerived drops the
    * cache AND sweeps the checkpoint blocks.
    */
  def ranks(spark: SparkSession, dir: String): DataFrame =
    ranksCache.getOrElseUpdate((spark, dir))(
      ranksBuild(spark, dir).localCheckpoint(false))

  /** Rank frame over ARBITRARY (id, v) embedding tables and score
    * function — shared by the hash-embedding eval below (#17/#18) and
    * the trained-model composition ([[TrainEval]], the reference's
    * train-then-`get_mrr` journey). `graph` supplies both the
    * type-constrained candidate sets and the filtered-protocol truth;
    * test triples whose entities are absent from `entEmb` drop out via
    * the inner joins (the standard unseen-entity filter when evaluating
    * a model trained on a subset).
    */
  private[kge] def ranksFrom(
      test: DataFrame, entEmb: DataFrame, relEmb: DataFrame,
      graph: DataFrame,
      score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column): DataFrame = {
    val testE = test
      .join(entEmb.select(col("id").as("sid"), col("v").as("h")), "sid")
      .join(entEmb.select(col("id").as("oid"), col("v").as("t")), "oid")
      .join(broadcast(relEmb.select(col("id").as("pid"), col("v").as("r"))), "pid")
      .withColumn("score_t", score(col("h"), col("r"), col("t")))
    ranksFromScored(testE, entEmb, graph, score)
  }

  /** Tail-direction rank tail of [[ranksFrom]] over an already-scored
    * test frame (r11: lets [[ranksBuild]] start from the shared
    * [[scoredTest]] cache instead of re-joining the embeddings).
    */
  private def ranksFromScored(
      testE: DataFrame, entEmb: DataFrame, graph: DataFrame,
      score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column): DataFrame = {
    val cands = topCByHash(
        graph.select(col("pid"), col("oid").as("cand")).distinct(),
        "tc", CandCap)
      .join(entEmb.select(col("id").as("cand"), col("v").as("tc")), "cand")
    // Filtered protocol: flag candidates that are OTHER known-true
    // triples of the same (sid, pid); they are excluded from the count.
    // (sid, pid, oid) is unique in encoded, so the left join can't
    // fan out. At 100 TB this is a shuffle join keyed like the groupBy
    // that follows — no extra exchange shape.
    val known = graph
      .select(col("sid"), col("pid"), col("oid").as("cand"),
        lit(1).as("istrue"))
    testE.join(broadcast(cands), "pid")
      .withColumn("score_c", score(col("h"), col("r"), col("tc")))
      .join(known, Seq("sid", "pid", "cand"), "left")
      .groupBy("sid", "pid", "oid")
      .agg((lit(1) + sum(when(
        (col("score_c") > col("score_t") ||
          (col("score_c") === col("score_t") && col("cand") < col("oid"))) &&
          (col("istrue").isNull || col("cand") === col("oid")),
        1).otherwise(0))).cast("long").as("rank"))
  }

  private def ranksBuild(spark: SparkSession, dir: String): DataFrame =
    ranksFromScored(
      scoredTest(spark, dir),
      entityEmb(spark, dir),
      Dict.encodedTriples(spark, dir),
      graft.functions.VectorFolds.dot3)

  /** #17: Hits@1/3/10 over the test slice (single summary row). */
  def hitsAtK(spark: SparkSession, dir: String): DataFrame =
    ranks(spark, dir).agg(
      count(lit(1)).as("n_test"),
      (sum(when(col("rank") <= 1, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("hits1"),
      (sum(when(col("rank") <= 3, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("hits3"),
      (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("hits10"))

  /** #18: mean reciprocal rank + mean rank (single summary row). */
  def mrr(spark: SparkSession, dir: String): DataFrame =
    ranks(spark, dir).agg(
      count(lit(1)).as("n_test"),
      graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
      (sum("rank").cast("double") / count(lit(1))).as("mean_rank"))

  private val ranksHeadCache = new graft.core.DfCache[(SparkSession, String)]

  /** Head-direction rank frame: corrupt the SUBJECT slot; candidates
    * are the relation's observed subjects, the filtered protocol
    * excludes candidates forming OTHER known-true triples (cand, p, o),
    * ties break on cand < sid. (hole.py ranks the object slot only;
    * the standard reported protocol — Bordes et al. — averages both
    * directions, which is what [[evalBoth]] restores.)
    *
    * Both directions rank the SAME 1-in-[[Embeddings.EvalMod]] test
    * slice (round 6; previously the head side thinned to 1-in-997 to
    * bound the oracle's pair space — ADVICE r5 correctly noted that
    * averaging two directions computed over different test populations
    * is not the Bordes protocol).
    *
    * Round 7 (VERDICT r6 lead item): subject pools run ~10× the object
    * pools on this graph, and UNBOUNDED they grew the head pair space
    * ~100× at 10× data (~1.0 G scored pairs at sf0.1; the only operator
    * family that failed a 10× scale run). Candidates now come from the
    * [[CandCap]] hash-minimal members of each relation's subject pool
    * ([[topCByHash]]) — the sampled-filtered protocol — so the pair
    * space is |test|·CandCap at ANY graph size and the whole eval
    * family is back inside the full-scale bench.
    */
  def ranksHead(spark: SparkSession, dir: String): DataFrame =
    ranksHeadCache.getOrElseUpdate((spark, dir)) {
      // lazy localCheckpoint at the end for the same plan-truncation
      // reason as [[ranks]] (r11, VERDICT r10 item 3)
      val graph = Dict.encodedTriples(spark, dir)
      val entEmb = entityEmb(spark, dir)
      val score = graft.functions.VectorFolds.dot3 _
      // r11: the scored test frame comes from the shared cache (same
      // rows as the inline joins it replaces — see [[scoredTest]])
      val testE = scoredTest(spark, dir)
      // capped subject pools are ≤ |relations|·CandCap rows — after the
      // round-7 cap this side no longer dwarfs the tail side, but it
      // stays a plain shuffle join (at a 1e3-relation vocabulary the
      // capped pool with vectors is ~1 GB, past the broadcast budget)
      val cands = topCByHash(
          graph.select(col("pid"), col("sid").as("cand")).distinct(),
          "hc", CandCap)
        .join(entEmb.select(col("id").as("cand"), col("v").as("hc")), "cand")
      val known = graph
        .select(col("sid").as("cand"), col("pid"), col("oid"), lit(1).as("istrue"))
      testE.join(cands, "pid")
        .withColumn("score_c", score(col("hc"), col("r"), col("t")))
        .join(known, Seq("cand", "pid", "oid"), "left")
        .groupBy("sid", "pid", "oid")
        .agg((lit(1) + sum(when(
          (col("score_c") > col("score_t") ||
            (col("score_c") === col("score_t") && col("cand") < col("sid"))) &&
            (col("istrue").isNull || col("cand") === col("sid")),
          1).otherwise(0))).cast("long").as("rank"))
        .localCheckpoint(false)
    }

  /** #100: the standard BOTH-SIDES evaluation — tail-corruption and
    * head-corruption summary rows side by side (papers report their
    * average; emitting both directions keeps each hash-pinned).
    */
  def evalBoth(spark: SparkSession, dir: String): DataFrame = {
    def summarize(r: DataFrame, direction: String): DataFrame =
      r.agg(
        count(lit(1)).as("n_test"),
        graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
        (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("hits10"),
        (sum("rank").cast("double") / count(lit(1))).as("mean_rank"))
        .select(lit(direction).as("direction"), col("n_test"), col("mrr"),
          col("hits10"), col("mean_rank"))
    summarize(ranks(spark, dir), "tail")
      .unionByName(summarize(ranksHead(spark, dir), "head"))
  }

  private val boundedCache = new graft.core.DfCache[(SparkSession, String)]

  /** #291: BOUNDED both-sides evaluation — the scale tier of #100
    * (round-6 VERDICT lead item). Ranks each test triple against the
    * [[BoundedCap]] hash-minimal candidates of its relation's pool in
    * each direction (OGB-style sampled-negatives protocol with a
    * deterministic hash sample; the filtered exclusions still apply
    * within the sample), and reports `avg_cands` alongside the metrics
    * so the bound itself is part of the checked output. Because
    * [[topCByHash]] orders by the same seeds as the full-protocol
    * family, these candidate sets are exact PREFIXES of #100's.
    *
    * Scale: pair space = |test|·2·BoundedCap at any graph size — this
    * is the eval that runs at every corpus snapshot; #100 (CandCap) is
    * the heavier acceptance run.
    */
  def evalBothBounded(spark: SparkSession, dir: String): DataFrame =
    boundedCache.getOrElseUpdate((spark, dir)) {
      val graph = Dict.encodedTriples(spark, dir)
      val entEmb = entityEmb(spark, dir)
      val score = graft.functions.VectorFolds.dot3 _
      // r11: shared scored test frame (same rows — see [[scoredTest]])
      val testE = scoredTest(spark, dir)

      // One direction: slot is the corrupted column ("oid" = tail,
      // "sid" = head); candidate pools are broadcastable by construction
      // (≤ |relations|·BoundedCap rows).
      def side(slot: String, seed: String, direction: String): DataFrame = {
        val cands = topCByHash(
            graph.select(col("pid"), col(slot).as("cand")).distinct(),
            seed, BoundedCap)
          .join(entEmb.select(col("id").as("cand"), col("v").as("cv")), "cand")
        val scored =
          if (slot == "oid")
            testE.join(broadcast(cands), "pid")
              .withColumn("score_c", score(col("h"), col("r"), col("cv")))
              .join(graph.select(col("sid"), col("pid"),
                col("oid").as("cand"), lit(1).as("istrue")),
                Seq("sid", "pid", "cand"), "left")
          else
            testE.join(broadcast(cands), "pid")
              .withColumn("score_c", score(col("cv"), col("r"), col("t")))
              .join(graph.select(col("sid").as("cand"), col("pid"),
                col("oid"), lit(1).as("istrue")),
                Seq("cand", "pid", "oid"), "left")
        scored.groupBy("sid", "pid", "oid")
          .agg(
            (lit(1) + sum(when(
              (col("score_c") > col("score_t") ||
                (col("score_c") === col("score_t") && col("cand") < col(slot))) &&
                (col("istrue").isNull || col("cand") === col(slot)),
              1).otherwise(0))).cast("long").as("rank"),
            count(lit(1)).as("n_cands"))
          .agg(
            count(lit(1)).as("n_test"),
            graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
            (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
              count(lit(1))).as("hits10"),
            (sum("rank").cast("double") / count(lit(1))).as("mean_rank"),
            (sum("n_cands").cast("double") / count(lit(1))).as("avg_cands"))
          .select(lit(direction).as("direction"), col("n_test"), col("mrr"),
            col("hits10"), col("mean_rank"), col("avg_cands"))
      }
      side("oid", "tc", "tail").unionByName(side("sid", "hc", "head"))
    }

  /** #85: per-relation evaluation breakdown — the per-relation results
    * table KGE papers report (which relations the model ranks well is
    * the first diagnostic after a global MRR; reference hole.py:372-425
    * computes the same ranks, aggregated only globally). Reuses the
    * session-cached rank frame; the breakdown itself is one
    * dictionary-small groupBy(pid), so it costs nothing beyond #17/#18.
    */
  def evalPerRelation(spark: SparkSession, dir: String): DataFrame =
    ranks(spark, dir).groupBy("pid").agg(
      count(lit(1)).as("n_test"),
      graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
      (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("hits10"),
      (sum("rank").cast("double") / count(lit(1))).as("mean_rank"))

  /** #103: per-relation breakdown of the HEAD direction (round-6
    * VERDICT item 5) — which relations rank poorly when the SUBJECT is
    * corrupted is the diagnostic the tail table (#85) cannot show
    * (1-N relations are easy tail-side and hard head-side by
    * construction). Reuses the session-cached [[ranksHead]] frame; the
    * breakdown is one dictionary-small groupBy(pid) on top.
    */
  def evalPerRelationHead(spark: SparkSession, dir: String): DataFrame =
    ranksHead(spark, dir).groupBy("pid").agg(
      count(lit(1)).as("n_test"),
      graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
      (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("hits10"),
      (sum("rank").cast("double") / count(lit(1))).as("mean_rank"))

  // ---------------------------------------------------------------- oracle

  /** Shared rank CTE chain. Round-5 restructure for the sf0.1 sweep:
    * the previous per-(id, dim) embedding tables made score_c a 4-way
    * join materializing |test|·|cands-of-relation|·D rows before its
    * GROUP BY — DuckDB blew >60 GB at sf0.1. Embeddings are now
    * LIST-valued per id (one row per entity, not D), the h·r product is
    * precomputed once per test triple, and each (test, cand) pair is a
    * single row whose score is one list fold — the dim factor leaves
    * the join entirely. All values are dyadic, so the per-pair
    * list_sum equals the old per-dim SUM exactly, in any order.
    */
  /** Embedding/dictionary prelude shared by both directions. A query
    * must splice in ONLY the chains it reads: DuckDB does NOT prune an
    * unreferenced `AS MATERIALIZED` CTE (measured: the head-only
    * breakdown also executed the full 74M-pair tail chain when the two
    * chains shared one WITH list), so tail and head are separate
    * fragments appended after this base.
    */
  private val baseCtes: String = {
    import graft.core.PortableHash.duckDyadic
    val eVec = s"list_transform(range(0, ${D}), i -> ${duckDyadic("'E|' || id || '|' || i")})"
    val rVec = s"list_transform(range(0, ${D}), i -> ${duckDyadic("'R|' || rid || '|' || i")})"
    s"""${Dict.preludeCtes},
       |ent_emb AS MATERIALIZED (SELECT id, $eVec AS vl FROM entities),
       |rel_emb AS MATERIALIZED (SELECT rid, $rVec AS vl FROM relations)""".stripMargin
  }

  /** Capped candidate-pool CTE (single-level form of [[topCByHash]] —
    * exactly the same set; DuckDB's partition count is 5, so the
    * two-level parallel trick is Spark-only). `slot` is sid or oid.
    */
  private def candCte(name: String, slot: String, seed: String,
      cap: Int): String =
    s"""$name AS MATERIALIZED (
       |  SELECT c.pid, c.cand, ec.vl
       |  FROM (SELECT pid, cand FROM (
       |    SELECT pid, $slot AS cand,
       |      ROW_NUMBER() OVER (PARTITION BY pid
       |        ORDER BY ${PortableHash.duck(s"'$seed|' || pid || '|' || $slot")}, $slot) AS rn
       |    FROM (SELECT DISTINCT pid, $slot FROM encoded))
       |  WHERE rn <= $cap) c
       |  JOIN ent_emb ec ON ec.id = c.cand
       |)""".stripMargin

  /** Tail-direction (object-corruption) rank chain. Round-5
    * restructure for the sf0.1 sweep: embeddings LIST-valued per id,
    * h·r precomputed per test triple, each (test, cand) pair one row —
    * the dim factor is out of the join. Round 6: candidate vectors are
    * pre-joined ONCE into candv (dictionary-sized), so the pair space
    * crosses exactly two hash joins (candv fan-out + the filtered-
    * protocol LEFT JOIN) before its GROUP BY. All values dyadic ⇒
    * exact in any order.
    */
  private val tailCtes: String =
    s"""${Dict.sampleEncodedCte(EvalMod)},
       |hrt AS MATERIALIZED (
       |  SELECT t.sid, t.pid, t.oid,
       |    list_transform(range(1, ${D + 1}), i -> eh.vl[i] * er.vl[i]) AS hr,
       |    et.vl AS tv
       |  FROM test_enc t
       |  JOIN ent_emb eh ON eh.id = t.sid
       |  JOIN rel_emb er ON er.rid = t.pid
       |  JOIN ent_emb et ON et.id = t.oid
       |),
       |score_t AS MATERIALIZED (
       |  SELECT sid, pid, oid,
       |    list_sum(list_transform(range(1, ${D + 1}), i -> hr[i] * tv[i])) AS score_t
       |  FROM hrt
       |),
       |${candCte("candv", "oid", "tc", CandCap)},
       |score_c AS (
       |  SELECT h.sid, h.pid, h.oid, c.cand, h.score_t,
       |    list_sum(list_transform(range(1, ${D + 1}), i -> h.hr[i] * c.vl[i])) AS score_c
       |  FROM (SELECT h0.*, s.score_t FROM hrt h0
       |        JOIN score_t s ON s.sid = h0.sid AND s.pid = h0.pid AND s.oid = h0.oid) h
       |  JOIN candv c ON c.pid = h.pid
       |),
       |ranks AS MATERIALIZED (
       |  SELECT c.sid, c.pid, c.oid,
       |    CAST(1 + SUM(CASE WHEN (c.score_c > c.score_t
       |      OR (c.score_c = c.score_t AND c.cand < c.oid))
       |      AND (k.oid IS NULL OR c.cand = c.oid) THEN 1 ELSE 0 END) AS BIGINT) AS rank
       |  FROM score_c c
       |  LEFT JOIN encoded k
       |    ON k.sid = c.sid AND k.pid = c.pid AND k.oid = c.cand
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  val hitsAtKSql: String =
    s"""$baseCtes,
       |$tailCtes
       |SELECT COUNT(*) AS n_test,
       |  CAST(SUM(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits1,
       |  CAST(SUM(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits3,
       |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10
       |FROM ranks""".stripMargin

  val mrrSql: String =
    s"""$baseCtes,
       |$tailCtes
       |SELECT COUNT(*) AS n_test,
       |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
       |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
       |FROM ranks""".stripMargin

  val evalPerRelationSql: String =
    s"""$baseCtes,
       |$tailCtes
       |SELECT pid, COUNT(*) AS n_test,
       |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
       |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10,
       |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
       |FROM ranks GROUP BY pid""".stripMargin

  /** #306: RANK vs TAIL-ENTITY DEGREE — the eval-BIAS diagnostic the
    * aggregate tables hide: KGE models are notorious for ranking
    * POPULAR entities well (their embeddings see the most gradient) and
    * long-tail entities badly, and a corpus snapshot whose MRR went up
    * may have only gotten better at the head of the degree
    * distribution. This table buckets the tail-direction rank frame by
    * the true object's graph degree — the curve a model acceptance
    * reads next to the per-relation table (#85).
    *
    * Bucketing is by DECIMAL-DIGIT COUNT of the object degree (the
    * Benford trick: integer→string is canonical in every engine — no
    * log2/log10 float edge can flip a bucket). Per bucket: n_test,
    * MRR (quantized), hits@10, mean rank, and the degree range.
    *
    * Scale: one count aggregate over the triple table keyed on oid
    * (the partitioning the rank build's joins already use), joined onto
    * the SESSION-CACHED rank frame, collapsed onto ≤ a-dozen digit
    * buckets. Nothing here touches the candidate pair space.
    */
  def evalByDegree(spark: SparkSession, dir: String): DataFrame = {
    val deg = Dict.encodedTriples(spark, dir)
      .groupBy("oid").agg(count(lit(1)).as("deg"))
    ranks(spark, dir).join(deg, "oid")
      .withColumn("deg_digits",
        length(col("deg").cast("string")).cast("long"))
      .groupBy("deg_digits")
      .agg(count(lit(1)).as("n_test"),
        min("deg").as("min_degree"),
        max("deg").as("max_degree"),
        graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
        (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("hits10"),
        (sum("rank").cast("double") / count(lit(1))).as("mean_rank"))
  }

  val evalByDegreeSql: String =
    s"""$baseCtes,
       |$tailCtes,
       |deg AS (SELECT oid, COUNT(*) AS deg FROM encoded GROUP BY 1)
       |SELECT CAST(length(CAST(deg AS VARCHAR)) AS BIGINT) AS deg_digits,
       |  COUNT(*) AS n_test,
       |  MIN(deg) AS min_degree, MAX(deg) AS max_degree,
       |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
       |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10,
       |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
       |FROM ranks JOIN deg USING (oid)
       |GROUP BY 1""".stripMargin

  /** Head-direction (subject-corruption) chain appended after
    * [[baseCtes]]: the rt = r∘t product is precomputed per test
    * triple and each subject candidate is one row — the same
    * dimension-factor-free shape the round-5 tail rewrite established.
    * All values dyadic ⇒ exact in any summation order, which licenses
    * the memory moves the ~13×-the-tail pair space needs (the first
    * head-lift attempt blew DuckDB past 124 GB RAM + 80 GB spill at
    * sf0.1):
    *  - `score_t` is computed INSIDE hrt_h (no join keyed on the
    *    pair-space side anywhere for the optimizer to mis-pick as a
    *    build table);
    *  - candidate vectors pre-joined ONCE into candv_h (dictionary-
    *    sized), so the ~0.9 G pair rows cross exactly two hash joins
    *    (the pid fan-out, the filtered-protocol LEFT JOIN) and stream
    *    into the rank GROUP BY;
    *  - the aggregate's input is kept NARROW: the per-pair score is an
    *    EXPANDED scalar sum projected in score_c_h, and the better-
    *    than flag `b` is projected before the GROUP BY, so only
    *    (sid, pid, oid, b) ever reaches the aggregate. DuckDB's
    *    estimator treats the pair-space GROUP BY as high-cardinality
    *    and picks a partitioned aggregate that MATERIALIZES its input;
    *    when the SUM's CASE still referenced the two 16-element list
    *    columns, that materialization was ~280 B × 0.9 G rows — the
    *    observed 124 GB RAM + full-disk spill. Narrow, it is ~25 GB
    *    spill worst-case, inside this host's budget, and exactly the
    *    shape the (passing) tail chain always had.
    * Samples the SAME [[Embeddings.EvalMod]] slice as the tail chain
    * (round 6 — see [[ranksHead]]).
    */
  private val headCtes: String = {
    val scoreT = (1 to D).map(i => s"eh.vl[$i] * er.vl[$i] * et.vl[$i]").mkString(" + ")
    val scoreC = (1 to D).map(i => s"c.vl[$i] * h.rt[$i]").mkString(" + ")
    s"""${Dict.sampleEncodedCte(EvalMod, "test_h")},
       |hrt_h AS MATERIALIZED (
       |  SELECT t.sid, t.pid, t.oid,
       |    list_transform(range(1, ${D + 1}), i -> er.vl[i] * et.vl[i]) AS rt,
       |    $scoreT AS score_t
       |  FROM test_h t
       |  JOIN ent_emb eh ON eh.id = t.sid
       |  JOIN rel_emb er ON er.rid = t.pid
       |  JOIN ent_emb et ON et.id = t.oid
       |),
       |${candCte("candv_h", "sid", "hc", CandCap)},
       |score_c_h AS (
       |  SELECT h.sid, h.pid, h.oid, h.score_t, c.cand,
       |    $scoreC AS score_c
       |  FROM hrt_h h
       |  JOIN candv_h c ON c.pid = h.pid
       |),
       |flag_h AS (
       |  SELECT s.sid, s.pid, s.oid,
       |    CASE WHEN (s.score_c > s.score_t
       |      OR (s.score_c = s.score_t AND s.cand < s.sid))
       |      AND (k.sid IS NULL OR s.cand = s.sid) THEN 1 ELSE 0 END AS b
       |  FROM score_c_h s
       |  LEFT JOIN encoded k
       |    ON k.sid = s.cand AND k.pid = s.pid AND k.oid = s.oid
       |),
       |ranks_h AS MATERIALIZED (
       |  SELECT sid, pid, oid, CAST(1 + SUM(b) AS BIGINT) AS rank
       |  FROM flag_h
       |  GROUP BY 1, 2, 3
       |)""".stripMargin
  }

  /** #103 oracle: splices base + head only — the tail chain must NOT
    * appear (DuckDB executes unreferenced MATERIALIZED CTEs).
    */
  val evalPerRelationHeadSql: String =
    s"""$baseCtes,
       |$headCtes
       |SELECT pid, COUNT(*) AS n_test,
       |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
       |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10,
       |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
       |FROM ranks_h GROUP BY pid""".stripMargin

  val evalBothSql: String = {
    def row(src: String, direction: String) =
      s"""SELECT '$direction' AS direction, COUNT(*) AS n_test,
         |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
         |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10,
         |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
         |FROM $src""".stripMargin
    s"""$baseCtes,
       |$tailCtes,
       |$headCtes
       |${row("ranks", "tail")}
       |UNION ALL
       |${row("ranks_h", "head")}""".stripMargin
  }

  /** #314: EVAL BY RELATION CATEGORY — the Bordes/TransH headline table
    * (every KGE paper's "performance per 1-1 / 1-N / N-1 / N-N"): both
    * rank directions broken down by #169's relation-category protocol,
    * because the AGGREGATE MRR hides exactly the asymmetry this table
    * shows — 1-N relations are easy tail-side and hard head-side BY
    * CONSTRUCTION, so a model change that trades head- for tail-side
    * quality moves the aggregate while this table shows the trade.
    *
    * Scale: both rank frames are session-cached; the category table is
    * relation-dictionary-sized (broadcast); output ≤ 8 rows.
    */
  def evalByCategory(spark: SparkSession, dir: String): DataFrame = {
    val cats = graft.rdf.Rdf.relationCats(spark, dir)
      .select("pid", "category")
    ranks(spark, dir).withColumn("direction", lit("tail"))
      .unionByName(ranksHead(spark, dir).withColumn("direction", lit("head")))
      .join(broadcast(cats), "pid")
      .groupBy("category", "direction")
      .agg(count(lit(1)).as("n_test"),
        graft.core.Exact.decAvg(lit(1.0) / col("rank")).as("mrr"),
        (sum(when(col("rank") <= 10, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("hits10"),
        (sum("rank").cast("double") / count(lit(1))).as("mean_rank"))
  }

  val evalByCategorySql: String = {
    def side(src: String, direction: String) =
      s"SELECT pid, '$direction' AS direction, rank FROM $src"
    s"""$baseCtes,
       |$tailCtes,
       |$headCtes,
       |cats AS (
       |  SELECT pid, CASE
       |    WHEN CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) < 1.5
       |     AND CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) < 1.5 THEN '1-1'
       |    WHEN CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) >= 1.5
       |     AND CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) < 1.5 THEN '1-N'
       |    WHEN CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT sid) < 1.5
       |     AND CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT oid) >= 1.5 THEN 'N-1'
       |    ELSE 'N-N'
       |  END AS category
       |  FROM encoded GROUP BY pid
       |)
       |SELECT category, direction, COUNT(*) AS n_test,
       |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
       |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10,
       |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
       |FROM (${side("ranks", "tail")} UNION ALL ${side("ranks_h", "head")})
       |JOIN cats USING (pid)
       |GROUP BY 1, 2""".stripMargin
  }

  /** #291 oracle: both directions over the BoundedCap-capped pools.
    * Pair space at oracle SFs is |test|·2·BoundedCap (~0.4 M at
    * sf0.01), so the chain keeps the simple expanded-scalar shape —
    * all values dyadic ⇒ exact in any order.
    */
  val evalBothBoundedSql: String = {
    val scoreT = (1 to D).map(i => s"eh.vl[$i] * er.vl[$i] * et.vl[$i]").mkString(" + ")
    val scT = (1 to D).map(i => s"h.hr[$i] * c.vl[$i]").mkString(" + ")
    val scH = (1 to D).map(i => s"h.rt[$i] * c.vl[$i]").mkString(" + ")
    def row(src: String, direction: String) =
      s"""SELECT '$direction' AS direction, COUNT(*) AS n_test,
         |  ${graft.core.Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr,
         |  CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hits10,
         |  CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank,
         |  CAST(SUM(n_cands) AS DOUBLE) / COUNT(*) AS avg_cands
         |FROM $src""".stripMargin
    s"""$baseCtes,
       |${Dict.sampleEncodedCte(EvalMod, "test_b")},
       |hrt_b AS MATERIALIZED (
       |  SELECT t.sid, t.pid, t.oid,
       |    list_transform(range(1, ${D + 1}), i -> eh.vl[i] * er.vl[i]) AS hr,
       |    list_transform(range(1, ${D + 1}), i -> er.vl[i] * et.vl[i]) AS rt,
       |    $scoreT AS score_t
       |  FROM test_b t
       |  JOIN ent_emb eh ON eh.id = t.sid
       |  JOIN rel_emb er ON er.rid = t.pid
       |  JOIN ent_emb et ON et.id = t.oid
       |),
       |${candCte("candt_b", "oid", "tc", BoundedCap)},
       |${candCte("candh_b", "sid", "hc", BoundedCap)},
       |ranks_bt AS MATERIALIZED (
       |  SELECT h.sid, h.pid, h.oid,
       |    CAST(1 + SUM(CASE WHEN (($scT) > h.score_t
       |      OR (($scT) = h.score_t AND c.cand < h.oid))
       |      AND (k.oid IS NULL OR c.cand = h.oid) THEN 1 ELSE 0 END) AS BIGINT) AS rank,
       |    COUNT(*) AS n_cands
       |  FROM hrt_b h
       |  JOIN candt_b c ON c.pid = h.pid
       |  LEFT JOIN encoded k
       |    ON k.sid = h.sid AND k.pid = h.pid AND k.oid = c.cand
       |  GROUP BY 1, 2, 3
       |),
       |ranks_bh AS MATERIALIZED (
       |  SELECT h.sid, h.pid, h.oid,
       |    CAST(1 + SUM(CASE WHEN (($scH) > h.score_t
       |      OR (($scH) = h.score_t AND c.cand < h.sid))
       |      AND (k.sid IS NULL OR c.cand = h.sid) THEN 1 ELSE 0 END) AS BIGINT) AS rank,
       |    COUNT(*) AS n_cands
       |  FROM hrt_b h
       |  JOIN candh_b c ON c.pid = h.pid
       |  LEFT JOIN encoded k
       |    ON k.sid = c.cand AND k.pid = h.pid AND k.oid = h.oid
       |  GROUP BY 1, 2, 3
       |)
       |${row("ranks_bt", "tail")}
       |UNION ALL
       |${row("ranks_bh", "head")}""".stripMargin
  }

  // ----------------------------------------------- #283 bootstrap CI

  /** Bootstrap replicate count. The nearest-rank CI indices are derived
    * from the REALIZED replicate count (⌈0.05·n⌉ / ⌈0.95·n⌉, = 2 / 31
    * when all [[CiB]] replicates are non-empty) — ADVICE r6: on a tiny
    * test slice a replicate's hash-even subset can be empty and drop
    * out of the groupBy, and static indices would then silently shift
    * (or error under ANSI).
    */
  val CiB = 32

  /** #283: MRR with a BOOTSTRAP CONFIDENCE INTERVAL — the uncertainty
    * quantification the eval family reports without: a point MRR off a
    * few hundred test triples moves run to run, and model comparisons
    * need to know whether a delta clears the noise (the #215 lesson —
    * a readout without an interval invites overclaiming — applied to
    * ranking eval). Deterministic HALF-SAMPLING bootstrap: replicate b
    * keeps the test triples with pHash("bs"|s|p|o|b) even — [[CiB]]
    * subsample replicates whose membership is a pure hash function
    * (reproducible across engines and runs, no RNG state), each
    * replicate's MRR is the house quantized mean, and the 90% interval
    * is the nearest-rank [⌈0.05B⌉, ⌈0.95B⌉] pick over the B sorted
    * replicate values.
    *
    * Scale: the rank frame is computed ONCE (the session-cached #18
    * frame); the replicate expansion is a bounded ×B map-side
    * generate over test-slice rows (never candidates), collapsing to
    * B keys; the CI pick runs on a B-element sorted list. Exactness:
    * membership is integer hash parity; each replicate MRR is exact;
    * the sorted-list picks are value reads.
    */
  def mrrCi(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{Exact, PortableHash}
    val r = ranks(spark, dir)
    val reps = r.select(col("sid"), col("pid"), col("oid"), col("rank"),
        explode(sequence(lit(0), lit(CiB - 1))).as("b"))
      .filter(PortableHash.pHash(concat_ws("|", lit("bs"), col("sid"),
        col("pid"), col("oid"), col("b"))) % 2 === 0)
      .groupBy("b")
      .agg(Exact.decAvg(lit(1.0) / col("rank")).as("mrr_b"))
    val ci = reps.agg(sort_array(collect_list(col("mrr_b"))).as("ms"),
      count(lit(1)).as("n_replicates"))
    ranks(spark, dir).agg(
        count(lit(1)).as("n_test"),
        Exact.decAvg(lit(1.0) / col("rank")).as("mrr"))
      .crossJoin(broadcast(ci))
      .select(col("n_test"), col("mrr"), col("n_replicates"),
        element_at(col("ms"),
          ceil(col("n_replicates") * 0.05).cast("int")).as("mrr_lo"),
        element_at(col("ms"),
          ceil(col("n_replicates") * 0.95).cast("int")).as("mrr_hi"))
  }

  val mrrCiSql: String = {
    import graft.core.{Exact, PortableHash}
    val h = PortableHash.duck(
      "'bs|' || sid || '|' || pid || '|' || oid || '|' || b")
    s"""$baseCtes,
       |$tailCtes,
       |reps AS (
       |  SELECT b, ${Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr_b
       |  FROM ranks, (SELECT unnest(range(0, $CiB)) AS b)
       |  WHERE $h % 2 = 0
       |  GROUP BY b
       |), ms AS (
       |  SELECT list_sort(list(mrr_b)) AS l, COUNT(*) AS n_replicates
       |  FROM reps
       |), f AS (
       |  SELECT COUNT(*) AS n_test,
       |    ${Exact.duckAvg("CAST(1 AS DOUBLE) / rank")} AS mrr
       |  FROM ranks
       |)
       |SELECT n_test, mrr, n_replicates,
       |  l[CAST(ceil(n_replicates * 0.05) AS INT)] AS mrr_lo,
       |  l[CAST(ceil(n_replicates * 0.95) AS INT)] AS mrr_hi
       |FROM f, ms""".stripMargin
  }
}
