package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables, VectorLsh}

/** #253: per-language embedding CENTROIDS + the OOD review queue —
  * the mislabel/outlier detector a multilingual curation pipeline
  * runs on its embedding store: compute each language's mean vector,
  * score every document by cosine to ITS OWN language centroid, and
  * emit the bottom-K per language — the docs least like their label,
  * which is where wrong-language tags, boilerplate and junk
  * concentrate (the embedding-space complement of #31's n-gram
  * lang-id: that op predicts a label, this one audits it).
  *
  * Exactness: centroid components are decSum(12)-quantized means
  * (order-free scaled-integer sums, ONE division), so both engines
  * hold bit-identical centroids; the cosine is the ordered-fold dot
  * over materialized arrays (the #29 discipline — identical IEEE
  * sequence, no grid); the bottom-K ranks on (cosine, vec_id) — a
  * total order.
  *
  * Scale: one dim-exploded map-side-combining aggregate onto the
  * (lang, dim) keyspace (|langs|·64 cells); centroids broadcast back;
  * the bottom-K uses the #29 two-phase salted heaps — NO window over
  * a 5-partition data-scale frame; payload vectors never shuffle.
  */
object Centroids {

  /** Review-queue depth per language. */
  val CentroidK = 20
  private val NSalt = 32

  def langCentroids(spark: SparkSession, dir: String): DataFrame = {
    val ve = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("vec_id"), col("lang"))
    val joined = ve.join(docs, "vec_id")
    val cent = joined
      .select(col("lang"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("lang", "dim")
      .agg((Exact.decSum(col("x"), 12) / count(lit(1))).as("m"))
      .groupBy("lang")
      .agg(sort_array(collect_list(struct(col("dim"), col("m"))))
        .as("cm"))
      .select(col("lang"), expr("transform(cm, p -> p.m)").as("c"))
    val scored = joined.join(broadcast(cent), "lang")
      .withColumn("cosine", VectorLsh.cosine(col("v"), col("c")))
      .select(col("lang"), col("vec_id"), col("cosine"))
      .withColumn("salt", pmod(col("vec_id"), lit(NSalt)))
    val partial = scored.withColumn("prank", row_number().over(
        Window.partitionBy("lang", "salt")
          .orderBy(col("cosine").asc, col("vec_id").asc)))
      .filter(col("prank") <= CentroidK)
    partial.withColumn("rank", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("cosine").asc, col("vec_id").asc)))
      .filter(col("rank") <= CentroidK)
      .select(col("lang"), col("vec_id"), col("cosine"), col("rank"))
  }

  val langCentroidsSql: String = {
    val d = VectorLsh.EmbDim
    s"""WITH ve AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    AS v
       |  FROM embeddings
       |), joined AS (
       |  SELECT d.lang, ve.vec_id, ve.v
       |  FROM ve JOIN documents d ON d.doc_id = ve.vec_id
       |), cent AS MATERIALIZED (
       |  SELECT lang, list(m ORDER BY dim) AS c FROM (
       |    SELECT lang, dim,
       |      ${Exact.duckSum("x", 12)} / COUNT(*) AS m
       |    FROM (
       |      SELECT lang, i - 1 AS dim, v[i] AS x
       |      FROM joined, (SELECT unnest(range(1, ${d + 1})) AS i))
       |    GROUP BY lang, dim
       |  ) GROUP BY lang
       |), scored AS (
       |  SELECT j.lang, j.vec_id,
       |    ${VectorLsh.duckFold("j.v[i] * t.c[i]")} /
       |      (sqrt(${VectorLsh.duckFold("j.v[i] * j.v[i]")}) *
       |       sqrt(${VectorLsh.duckFold("t.c[i] * t.c[i]")})) AS cosine
       |  FROM joined j JOIN cent t ON t.lang = j.lang
       |)
       |SELECT lang, vec_id, cosine, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY lang ORDER BY cosine ASC, vec_id ASC) AS INT)
       |    AS rank
       |  FROM scored
       |) WHERE rank <= $CentroidK""".stripMargin
  }
}
