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

  // ------------------------------------------- #319 per-dimension stats

  /** #319: PER-DIMENSION EMBEDDING STATS — for every coordinate of the
    * embedding space: count, zero count, mean, variance, min, max. The
    * dimension-level audit the vector-level diagnostics can't give:
    * a DEAD dimension (variance ≈ 0 — the encoder stopped using it, or a
    * projection/truncation bug zeroed it) silently wastes index width in
    * every ANN structure downstream (#30/#38/#59 all pay per dim), and a
    * RUNAWAY dimension (variance ≫ others) dominates L2 distances the
    * same way the #270 anisotropy cone dominates cosines. Also the input
    * for choosing PQ sub-space splits and the #121 truncation cut.
    *
    * Scale: one posexplode feeds a map-side-combining aggregate onto the
    * 64-key dim space — a scan, no joins, output bounded by the
    * dimension count. Exactness: component sums and square sums are
    * order-free quantized integer sums on the 1e-12 grid with DECIMAL
    * accumulators (corpus-size-safe past 2^63 scaled units); mean and
    * variance are a fixed literal tree over those exact sums — identical
    * doubles in both engines; min/max are exact float widenings.
    */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("x") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        Exact.decSumWide(col("x"), 12).as("sx"),
        Exact.decSumWide(col("x") * col("x"), 12).as("sxx"),
        min(col("x")).as("min_v"),
        max(col("x")).as("max_v"))
      .select(col("dim"), col("n"), col("n_zero"),
        (col("sx") / col("n")).as("mean"),
        ((col("sxx") / col("n")) -
          (col("sx") / col("n")) * (col("sx") / col("n"))).as("variance"),
        col("min_v"), col("max_v"))

  val dimStatsSql: String = {
    val d = VectorLsh.EmbDim
    s"""WITH x AS (
       |  SELECT dim, v FROM (
       |    SELECT unnest(generate_series(1, $d)) AS dim,
       |      unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS v
       |    FROM embeddings)
       |), agg AS (
       |  SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_zero,
       |    ${Exact.duckSum("v", 12)} AS sx,
       |    ${Exact.duckSum("v * v", 12)} AS sxx,
       |    MIN(v) AS min_v, MAX(v) AS max_v
       |  FROM x GROUP BY 1
       |)
       |SELECT dim, n, n_zero, sx / n AS mean,
       |  (sxx / n) - (sx / n) * (sx / n) AS variance, min_v, max_v
       |FROM agg""".stripMargin
  }
}
