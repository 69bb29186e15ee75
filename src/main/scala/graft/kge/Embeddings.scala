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

  /** array<double> embedding column of dimension `d`. */
  def emb(kind: String, id: Column, d: Int = D): Column =
    transform(sequence(lit(0), lit(d - 1)),
      i => PortableHash.dyadic(
        concat_ws("|", lit(kind), id.cast("string"), i.cast("string"))))

  /** DuckDB scalar equivalent of emb(kind, id)[i]. */
  def duckEl(kind: String, idExpr: String, iExpr: String): String =
    PortableHash.duckDyadic(s"'$kind' || '|' || $idExpr || '|' || $iExpr")

  /** Deterministic sampled slice of encoded triples (sid, pid, oid). */
  def encodedSample(spark: SparkSession, dir: String, mod: Int): DataFrame = {
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
