package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables, VectorLsh}

/** #270: EMBEDDING ISOTROPY report — per label and corpus-wide: the mean
  * pairwise cosine among unit-normalized vectors and the norm of the
  * mean direction. Anisotropy (all vectors leaning into a narrow cone —
  * mean pairwise cosine ≫ 0) is the classic contextual-embedding
  * pathology (Ethayarajh 2019; Mu & Viswanath's all-but-the-top, already
  * implemented as #118 `embed_abtt`): it compresses cosine contrast and
  * degrades retrieval. This op is the DIAGNOSTIC that says whether #118
  * is needed and whether any label's cluster has collapsed.
  *
  * The O(n²) pairwise mean collapses to sum identities:
  * Σ_{i≠j} ûᵢ·ûⱼ = ‖Σû‖² − Σ‖û‖², so the whole report needs only the
  * per-dimension SUMS of normalized components and of their squares —
  * one dim-exploded map-side-combining aggregate onto the (label, dim)
  * keyspace (|labels|·64 cells), never a pair join. That identity is
  * what makes isotropy measurable at 100 TB: the naive pairwise form is
  * quadratic in corpus size, this one is a scan.
  *
  * Exactness: the norm is the house ordered fold (codegen sum of
  * squares, one correctly-rounded sqrt), each normalized component one
  * division — bit-identical in both engines; per-dim sums quantize at
  * 1e-12 order-free; the 64-dim reductions quantize at 4/6 (|s_d| ≤ n
  * keeps scaled squares under 2^53 at any realistic shard); the final
  * mean-cosine and mean-norm are a fixed literal IEEE tree over exact
  * sums.
  */
object Isotropy {

  def isotropy(spark: SparkSession, dir: String): DataFrame = {
    val comps = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorLsh.norm(col("v")))
      .select(col("label"), col("nrm"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"), (col("x") / col("nrm")).as("u"))
    def report(grouped: DataFrame): DataFrame = grouped
      .groupBy("label")
      .agg(max("n").as("n"),
        Exact.decSum(col("s") * col("s"), 4).as("ss"),
        Exact.decSum(col("q"), 6).as("tt"))
      .select(col("label"), col("n"),
        ((col("ss") - col("tt")) / (col("n") * (col("n") - 1)))
          .as("mean_cos"),
        (sqrt(col("ss")) / col("n")).as("mean_norm"))
    val perLabel = report(
      comps.groupBy("label", "dim")
        .agg(Exact.decSum(col("u"), 12).as("s"),
          Exact.decSum(col("u") * col("u"), 12).as("q"),
          count(lit(1)).as("n")))
    val overall = report(
      comps.groupBy("dim")
        .agg(Exact.decSum(col("u"), 12).as("s"),
          Exact.decSum(col("u") * col("u"), 12).as("q"),
          count(lit(1)).as("n"))
        .withColumn("label", lit(-1L)))
    perLabel.unionByName(overall)
  }

  val isotropySql: String = {
    val d = VectorLsh.EmbDim
    def rep(grp: String, lbl: String) =
      s"""SELECT $lbl AS label, MAX(n) AS n,
         |    ${Exact.duckSum("s * s", 4)} AS ss,
         |    ${Exact.duckSum("q", 6)} AS tt
         |  FROM (
         |    SELECT $grp,
         |      ${Exact.duckSum("u", 12)} AS s,
         |      ${Exact.duckSum("u * u", 12)} AS q,
         |      COUNT(*) AS n
         |    FROM comps GROUP BY $grp
         |  ) GROUP BY $lbl""".stripMargin
    s"""WITH ve AS (
       |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), vn AS (
       |  SELECT label, v, sqrt(${VectorLsh.duckFold("v[i] * v[i]")}) AS nrm
       |  FROM ve
       |), comps AS MATERIALIZED (
       |  SELECT label, i - 1 AS dim, v[i] / nrm AS u
       |  FROM vn, (SELECT unnest(range(1, ${d + 1})) AS i)
       |), agg AS (
       |  ${rep("label, dim", "label")}
       |  UNION ALL
       |  ${rep("dim", "CAST(-1 AS BIGINT)")}
       |)
       |SELECT label, n, (ss - tt) / (n * (n - 1)) AS mean_cos,
       |  sqrt(ss) / n AS mean_norm
       |FROM agg""".stripMargin
  }
}
