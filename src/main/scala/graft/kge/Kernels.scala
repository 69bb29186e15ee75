package graft.kge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** #19: the reference's similarity-kernel zoo evaluated between
  * consecutive vectors of the `embeddings` table.
  *
  * Reference: kge/hole.py:64-118 (cosine, polynomial, sigmoid, RBF,
  * euclidean, L1, exponential, GESD, AESD) and Functions.scala:33-46
  * (dot, L2similarity).
  *
  * Determinism strategy: elements are cast float→double (exact); per-row
  * folds are sequential double left-folds in BOTH engines
  * ([[Embeddings.dFold]] ↔ DuckDB `list_reduce`) so the IEEE operation
  * sequence is identical; sqrt and division are correctly-rounded and
  * therefore engine-identical; exp/tanh/x³ outputs are rounded to 6
  * decimals (a few-ulp libm difference cannot move a 6-decimal rounding,
  * and binary-fraction inputs can never sit exactly on a rounding tie).
  *
  * Scale: the consecutive-pair join is keyed on vec_id (both sides
  * co-partitioned, one shuffle); kernel math is per-row codegen.
  */
object Kernels {

  // scaled-double half-up rounding — engine-identical by construction
  // (see graft.core.Exact for why decimal casts are not)
  private def round6(c: Column): Column = graft.core.Exact.roundS(c, 6)

  def simKernels(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nxt = e.select((col("vec_id") - 1).as("vec_id"), col("v").as("w"))
    // native codegen folds — same sequential IEEE sequence as the
    // aggregate/zip_with forms (and the DuckDB list_reduce oracle)
    val vf = graft.functions.VectorFolds
    val dot = vf.dotp(col("v"), col("w"))
    val na = vf.sumSq(col("v"))
    val nb = vf.sumSq(col("w"))
    val l2sq = vf.sqDiffSum(col("v"), col("w"))
    val l1 = vf.absDiffSum(col("v"), col("w"))
    val polyT = lit(0.5) * col("dot") + lit(1.0)
    val sigArg = lit(1.0) + exp(-(lit(0.5) * col("dot") + lit(1.0)))
    e.join(nxt, "vec_id")
      .withColumn("dot", dot)
      .withColumn("na", na).withColumn("nb", nb)
      .withColumn("l2sq", l2sq).withColumn("l1", l1)
      .select(
        col("vec_id"),
        col("dot"),
        (col("dot") / (sqrt(col("na")) * sqrt(col("nb")))).as("cosine"),
        sqrt(col("l2sq")).as("l2"),
        col("l1"),
        (lit(1.0) / (lit(1.0) + sqrt(col("l2sq")))).as("euclid"),
        round6(exp(lit(-0.5) * col("l2sq"))).as("rbf"),
        round6(polyT * polyT * polyT).as("poly"),
        round6(tanh(lit(0.25) * col("dot") + lit(0.5))).as("sigmoid"),
        round6(exp(lit(-0.5) * col("l1"))).as("expk"),
        round6((lit(1.0) / (lit(1.0) + sqrt(col("l2sq")))) / sigArg).as("gesd"),
        round6(lit(0.5) / (lit(1.0) + sqrt(col("l2sq"))) + lit(0.5) / sigArg).as("aesd"))
  }

  val simKernelsSql: String = {
    // Left-fold in list order, seeded by 0.0 + first element — the exact
    // IEEE sequence Spark's `aggregate(arr, 0.0, _+_)` produces.
    def fold(term: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> ($term))), (acc, x) -> acc + x)"
    def r6(expr: String) = graft.core.Exact.duckRoundS(expr, 6)
    val sigArg = "(1.0 + exp(-(0.5 * dot + 1.0)))"
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id,
       |    list_transform(a.embedding, e -> CAST(e AS DOUBLE)) AS x,
       |    list_transform(b.embedding, e -> CAST(e AS DOUBLE)) AS y
       |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
       |), s AS (
       |  SELECT vec_id,
       |    ${fold("x[i] * y[i]")} AS dot,
       |    ${fold("x[i] * x[i]")} AS na,
       |    ${fold("y[i] * y[i]")} AS nb,
       |    ${fold("(x[i] - y[i]) * (x[i] - y[i])")} AS l2sq,
       |    ${fold("abs(x[i] - y[i])")} AS l1
       |  FROM p
       |)
       |SELECT vec_id, dot,
       |  dot / (sqrt(na) * sqrt(nb)) AS cosine,
       |  sqrt(l2sq) AS l2,
       |  l1,
       |  1.0 / (1.0 + sqrt(l2sq)) AS euclid,
       |  ${r6("exp(-0.5 * l2sq)")} AS rbf,
       |  ${r6("(0.5 * dot + 1.0) * (0.5 * dot + 1.0) * (0.5 * dot + 1.0)")} AS poly,
       |  ${r6("1.0 - 2.0 / (exp(2.0 * (0.25 * dot + 0.5)) + 1.0)")} AS sigmoid,
       |  ${r6("exp(-0.5 * l1)")} AS expk,
       |  ${r6(s"(1.0 / (1.0 + sqrt(l2sq))) / $sigArg")} AS gesd,
       |  ${r6(s"0.5 / (1.0 + sqrt(l2sq)) + 0.5 / $sigArg")} AS aesd
       |FROM s""".stripMargin
  }
}
