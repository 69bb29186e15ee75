package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables, VectorLsh}

/** Late-interaction (MaxSim) retrieval — the ColBERT scoring contract
  * (Khattab & Zaharia 2020): a document is a BAG of token vectors, not
  * one pooled vector, and score(q, d) = Σ_{t∈q} max_{u∈d} cos(t, u) —
  * each query token independently finds its best-matching document
  * token. Pooled single-vector retrieval (the rest of the ANN block)
  * loses term-level matching; late interaction keeps it at a storage
  * cost of T vectors/doc, which is why every modern multi-vector stack
  * (ColBERT/PLAID-style) serves exactly this operator.
  *
  * The embedding table models the token bags: vec_id div [[T]] is the
  * multi-vector doc, vec_id mod [[T]] its token slot. Queries are every
  * [[QMod]]-th doc, scored against the full corpus.
  *
  * Plan (the serving shape): the query token set is tiny → BROADCAST
  * against the corpus token table (at production scale stage 1 is an
  * ANN shortlist per #120 and this exact scorer touches only shortlist
  * docs — same contract, the scorer is unchanged). Token-pair cosine =
  * one codegen'd fold per pair; the per-(q,d,token) MAX is
  * order-independent by nature (no quantization), the per-(q,d) sum of
  * T maxes uses decSum(12); one bounded top-[[K]] window per query.
  */
object MaxSim {

  val T = 4     // token vectors per multi-vector doc
  val QMod = 25 // every QMod-th doc is a query
  val K = 5

  private def toks(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(expr(s"vec_id div $T").as("doc"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** #145: (q_doc, d_doc, score, rank) — top-K MaxSim docs per query. */
  def maxsim(spark: SparkSession, dir: String): DataFrame = {
    val d = toks(spark, dir)
    // per-token id derived from vec_id (stable; never a generated id)
    val q2 = Tables.embeddings(spark, dir)
      .filter(expr(s"vec_id div $T") % QMod === 0)
      .select(expr(s"vec_id div $T").as("q_doc"), (col("vec_id") % T).as("qt"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val pairs = d.join(broadcast(q2), col("doc") =!= col("q_doc"))
      .select(col("q_doc"), col("qt"), col("doc").as("d_doc"),
        VectorLsh.cosine(col("qv"), col("v")).as("c"))
    val best = pairs.groupBy("q_doc", "d_doc", "qt").agg(max("c").as("m"))
    val scored = best.groupBy("q_doc", "d_doc")
      .agg(Exact.decSum(col("m"), 12).as("score"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("q_doc")
          .orderBy(col("score").desc, col("d_doc").asc)))
      .filter(col("rank") <= K)
  }

  val maxsimSql: String =
    s"""WITH tk AS (
       |  SELECT vec_id // $T AS doc, vec_id % $T AS slot,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), p AS (
       |  SELECT q.doc AS q_doc, q.slot AS qt, t.doc AS d_doc,
       |    ${VectorLsh.duckFold("q.v[i] * t.v[i]")} /
       |      (sqrt(${VectorLsh.duckFold("q.v[i] * q.v[i]")}) * sqrt(${VectorLsh.duckFold("t.v[i] * t.v[i]")})) AS c
       |  FROM tk q JOIN tk t ON t.doc <> q.doc
       |  WHERE q.doc % $QMod = 0
       |), best AS (
       |  SELECT q_doc, d_doc, qt, MAX(c) AS m FROM p GROUP BY 1, 2, 3
       |), scored AS (
       |  SELECT q_doc, d_doc, ${Exact.duckSum("m", 12)} AS score
       |  FROM best GROUP BY 1, 2
       |)
       |SELECT q_doc, d_doc, score, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_doc ORDER BY score DESC, d_doc ASC) AS INT) AS rank
       |  FROM scored
       |) WHERE rank <= $K""".stripMargin
}
