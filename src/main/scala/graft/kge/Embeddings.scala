package graft.kge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, TpchGraph}
import graft.rdf.Dict

/** Deterministic dyadic embeddings + sampled test slices.
  *
  * The reference initializes embeddings with RNG draws
  * (reference: src/main/scala/net/sansa_stack/ml/kge/model/TransE.scala:33-36
  * uniform init; kge/hole.py:152-165 `init_nunif`). graft derives every
  * embedding element from the portable hash instead —
  * `emb(kind, id)[i] = dyadic(kind|id|i)` — so scores are reproducible
  * across engines and runs, and all downstream arithmetic is EXACT
  * (dyadic rationals, denominator 128).
  *
  * Scale note: embeddings are computed INLINE (md5 per element inside
  * whole-stage codegen), not joined from a materialized table — zero
  * shuffle, embarrassingly parallel, the optimal plan when the embedding
  * is a pure function of the id. Trained (non-derivable) embeddings
  * instead live in an id-keyed DataFrame and join on id
  * (see [[TransETrainer]]).
  */
object Embeddings {

  /** Embedding dimension for TransE/DistMult/HolE. */
  val D = 16

  /** RESCAL dimension (d² relation matrix entries per relation). */
  val DRescal = 8

  /** 1-in-mod deterministic test slice for the scoring queries. */
  val ScoreMod = 20

  /** 1-in-mod slice for ranking eval (candidate fan-out is larger). */
  val EvalMod = 199

  /** array<double> embedding column of dimension `d`.
    *
    * PERF WARNING (measured, sf0.1): do NOT nest this generator inside
    * further higher-order functions (zip_with/aggregate chains) — Spark
    * evaluates HOFs interpreted, and the generator sub-tree gets
    * re-evaluated per element, turning d md5 calls into O(d²)+
    * (75 s vs 0.7 s for the TransE score at sf0.1). Score against the
    * materialized [[entityEmb]]/[[relationEmb]] tables instead; `emb`
    * belongs in a plain projection that a join/persist separates from
    * the consuming HOF.
    */
  def emb(kind: String, id: Column, d: Int = D): Column =
    transform(sequence(lit(0), lit(d - 1)),
      i => PortableHash.dyadic(
        concat_ws("|", lit(kind), id.cast("string"), i.cast("string"))))

  private val tableCache =
    new graft.core.DfCache[(SparkSession, String, String)]

  /** Materialized entity embedding table (id, v: array<double> dim D) —
    * hash work is O(N_entities·D) once per session, not O(nnz·3D) per
    * query, and the join barrier keeps the generator out of consuming
    * HOF lambdas (see the warning on [[emb]]). This is also the learned-
    * embedding plan shape: a trained model stores exactly this table,
    * bucketed by id at 100 TB.
    */
  def entityEmb(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "E"))(
      Dict.entities(spark, dir).select(col("id"), emb("E", col("id")).as("v")))

  /** Materialized relation embedding table (id, v) — dictionary-sized,
    * always broadcastable.
    */
  def relationEmb(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "R"))(
      Dict.relations(spark, dir)
        .select(col("rid").as("id"), emb("R", col("rid")).as("v")))

  /** Complex entity table for ComplEx — real (family E, shared with the
    * other models) and imaginary (family EI) parts in ONE frame, so the
    * score joins each triple side once, not twice (measured 6× faster
    * than separate re/im joins at sf0.1: two fewer shuffled joins).
    */
  def complexEnt(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "C"))(
      Dict.entities(spark, dir).select(col("id"),
        emb("E", col("id")).as("vr"), emb("EI", col("id")).as("vi")))

  /** Complex relation table (families R + RI) — broadcast-sized. */
  def complexRel(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "RC"))(
      Dict.relations(spark, dir).select(col("rid").as("id"),
        emb("R", col("rid")).as("vr"), emb("RI", col("rid")).as("vi")))

  /** TransR relation-space dimension (k in the k×d projection). */
  val DTransR = 8

  /** Materialized TransR projection-matrix table (id, m: k×d row-major,
    * family MR) — dictionary-sized, always broadcastable.
    */
  def transrM(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "MR"))(
      Dict.relations(spark, dir)
        .select(col("rid").as("id"),
          emb("MR", col("rid"), DTransR * D).as("m")))

  /** Materialized RESCAL relation-matrix table (id, w: d² row-major). */
  def rescalW(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "W"))(
      Dict.relations(spark, dir)
        .select(col("rid").as("id"),
          emb("W", col("rid"), DRescal * DRescal).as("w")))

  /** SimplE entity table — head-role (family E, shared with the other
    * models) and tail-role (family ET) vectors in ONE frame, the
    * [[complexEnt]] one-join-per-side trick.
    */
  def simpleEnt(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "SE"))(
      Dict.entities(spark, dir).select(col("id"),
        emb("E", col("id")).as("he"), emb("ET", col("id")).as("te")))

  /** SimplE relation table — forward (family R, shared) and inverse
    * (family RV) vectors; dictionary-sized, always broadcastable.
    */
  def simpleRel(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "SR"))(
      Dict.relations(spark, dir).select(col("rid").as("id"),
        emb("R", col("rid")).as("r"), emb("RV", col("rid")).as("rv")))

  /** QuatE raw relation quaternions (family QR, D components = D/4
    * quaternion units) — normalization happens in the score expression
    * so both engines derive it from the same dyadic state.
    */
  def quateRel(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "QE"))(
      Dict.relations(spark, dir)
        .select(col("rid").as("id"), emb("QR", col("rid")).as("q")))

  /** TuckER SHARED core tensor W (d_e × d_r × d_e = 8×8×8, family TK,
    * row-major flat index f = i·64 + j·8 + k) as a JVM-side literal —
    * the core is one global parameter, not per-relation, so it never
    * touches the plan as data.
    */
  val tuckerW: IndexedSeq[Double] =
    (0 until DRescal * DRescal * DRescal)
      .map(f => PortableHash.dyadicJvm(s"TK|$f"))

  /** TuckER relation-collapsed core M_r = W ×₂ r (the 8×8 matrix
    * Σ_j W[i,j,k]·r_j, flat i·8+k) — computed ONCE per relation on the
    * dictionary-sized frame (the real TuckER serving plan: collapse the
    * shared core against each relation, then every triple pays one
    * bilinear fold, exactly RESCAL's hot path). All entries are exact
    * dyadic sums (denominator 2^14), so the factored score equals the
    * direct 512-term triple contraction bit-for-bit.
    */
  def tuckerM(spark: SparkSession, dir: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, "TK")) {
      val wLit = array(tuckerW.map(lit): _*)
      val de = DRescal
      // rv slices the CACHED relation table (same R family, first 8
      // dims) — the cache boundary keeps the md5 generator out of the
      // HOF lambdas below (the [[emb]] re-inlining warning).
      relationEmb(spark, dir)
        .select(col("id"), slice(col("v"), 1, de).as("rv"))
        .select(col("id"), flatten(transform(sequence(lit(0), lit(de - 1)),
          i => transform(sequence(lit(0), lit(de - 1)),
            k => aggregate(sequence(lit(0), lit(de - 1)), lit(0.0),
              (acc, j) => acc + element_at(wLit,
                i * (de * de) + j * de + k + 1) *
                element_at(col("rv"), j + 1))))).as("m"))
    }

  /** DuckDB scalar equivalent of emb(kind, id)[i]. */
  def duckEl(kind: String, idExpr: String, iExpr: String): String =
    PortableHash.duckDyadic(s"'$kind' || '|' || $idExpr || '|' || $iExpr")

  private val sampleCache =
    new graft.core.DfCache[(SparkSession, String, Int)]

  /** Deterministic sampled slice of encoded triples (sid, pid, oid).
    * Persisted per (session, dir, mod): the md5 sampling pass over all
    * triples plus the two dictionary joins run once, not once per
    * scoring/eval/loss query that shares the slice.
    */
  def encodedSample(spark: SparkSession, dir: String, mod: Int): DataFrame =
    sampleCache.getOrElseUpdate((spark, dir, mod)) {
      val t = TpchGraph.triples(spark, dir)
        .filter(PortableHash.pHash(
          concat_ws("|", col("s"), col("p"), col("o"))) % mod === 0)
      Dict.mapTriples(t, spark, dir)
    }

  /** Plain sequential double left-fold over an array.
    *
    * Used both where terms are dyadic (exact, order-free) and for float
    * kernel math: there the fold order matters, and the oracle matches it
    * with DuckDB `list_reduce` — an identical left-to-right IEEE sequence.
    * (A DECIMAL(38,18) detour was tried and rejected: decimal→double
    * casts with >17 significant digits round differently across engines.)
    */
  def dFold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)
}
