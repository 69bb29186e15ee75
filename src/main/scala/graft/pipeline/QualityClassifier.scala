package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash, Tables}
import graft.text.TextAnalysis

/** #119: one full-batch gradient step of a LOGISTIC-REGRESSION quality
  * classifier over the document quality features — the model-based
  * curation gate (GPT-3's LR quality filter over reference-corpus
  * features, CC-Net's fastText stage): heuristic labels are distilled
  * into a trained model whose score then replaces the heuristic at
  * serving time. Here the label is the house heuristic thresholded at a
  * dyadic 0.75 (y = [quality ≥ 3/4], ~60/40 at test SFs) and the step is
  * pinned hash-exact, the same way the five KGE gradient families are
  * (#75/78/79/105/106): emitted as (j, n_docs, w_old, grad, w_new) for
  * the bias + four features.
  *
  * Exactness: features are rational doubles (correctly-rounded IEEE ops
  * mirrored in literal order); z = Σ wⱼxⱼ is a 5-term literal-order
  * chain; σ(z) is the one transcendental, grid-quantized at scale 4 per
  * the house AGGREGATED-transcendental rule (Losses.scala: libm-vs-JVM
  * exp differs by ~1 ulp, and a term quantized differently would poison
  * the mean — the 1e-4 grid puts the per-row hazard at ~1e-12); after
  * that err·xⱼ are exact products of identical doubles, decSum(9)
  * order-independent, and the update w − lr·grad is two more mirrored
  * correctly-rounded ops.
  *
  * Scale (100 TB): ONE map-only pass computes features/σ/err in-row, the
  * gradient is a posexplode onto 5 keys with map-side combine — shuffle
  * bytes are 5 partials per partition regardless of corpus size; weights
  * are driver-side constants (the model is KB-sized, like every serving
  * classifier). Full training = this step iterated, exactly the KGE
  * trainer shape.
  */
object QualityClassifier {

  val Lr = 0.5      // dyadic
  val Thresh = 0.75 // dyadic label threshold on the heuristic score
  private val S = 9 // decSum scale: |err·x| ≤ 1, n·1e9 ≪ 2^63
  private val NF = 5

  /** Dyadic init weights (exact short-decimal doubles; the SAME literal
    * text is embedded in the oracle SQL).
    */
  val W0: Seq[Double] = (0 until NF).map(j => PortableHash.dyadicJvm(s"qlr:$j"))

  /** Feature frame: bias + the four quality ingredients + the heuristic
    * score the label distills.
    */
  private[pipeline] def features(spark: SparkSession,
      dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), TextAnalysis.words.as("ws"))
      .select(
        col("doc_id"),
        lit(1.0).as("x0"),
        least(TextAnalysis.nWords / 50.0, lit(1.0)).as("x1"),
        TextAnalysis.stopRatio.as("x2"),
        least(TextAnalysis.avgWordLen / 8.0, lit(1.0)).as("x3"),
        TextAnalysis.uniqRatio.as("x4"),
        TextAnalysis.quality.as("q"))

  /** z = Σ wⱼxⱼ in literal order — mirrored by the oracle. */
  private def zOf(w: Seq[Double]) = w.zipWithIndex
    .map { case (v, j) => lit(v) * col(s"x$j") }
    .reduceLeft(_ + _)

  /** Mean logistic loss of a weight vector on the corpus (spec/driver
    * diagnostic — the quantity a training loop logs per epoch).
    */
  def logLoss(spark: SparkSession, dir: String, w: Seq[Double]): Double =
    features(spark, dir)
      .withColumn("ypm", (col("q") >= Thresh).cast("int").cast("double") * 2.0
        - 1.0)
      .select(avg(log(lit(1.0) + exp(-(col("ypm") * zOf(w))))))
      .head.getDouble(0)

  def trainStep(spark: SparkSession, dir: String): DataFrame = {
    val feats = features(spark, dir)
    val z = zOf(W0)
    val err = feats
      .withColumn("y", (col("q") >= Thresh).cast("int").cast("double"))
      .withColumn("p", Exact.roundS(lit(1.0) / (lit(1.0) + exp(-z)), 4))
      .withColumn("err", col("p") - col("y"))
    val wArr = array(W0.map(lit): _*)
    err
      .select(col("err"),
        posexplode(array((0 until NF).map(j => col(s"x$j")): _*))
          .as(Seq("j", "x")))
      .groupBy("j")
      .agg(count(lit(1)).as("n_docs"),
        (Exact.decSum(col("err") * col("x"), S) / count(lit(1))).as("grad"))
      .withColumn("w_old", element_at(wArr, col("j") + 1))
      .select(col("j"), col("n_docs"), col("w_old"), col("grad"),
        (col("w_old") - lit(Lr) * col("grad")).as("w_new"))
  }

  val trainStepSql: String = {
    val w = W0.map(_.toString)
    val z = (1 until NF).foldLeft(s"(${w(0)}) * x0") { (acc, j) =>
      s"$acc + (${w(j)}) * x$j"
    }
    val branches = (0 until NF)
      .map(j => s"SELECT $j AS j, err, x$j AS x FROM e")
      .mkString("\n  UNION ALL\n  ")
    val wRows = W0.zipWithIndex
      .map { case (v, j) => s"($j, $v)" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, n_chars, ${TextAnalysis.duckWords} AS ws FROM documents
       |), f AS (
       |  SELECT doc_id,
       |    CAST(1.0 AS DOUBLE) AS x0,
       |    least(CAST(len(ws) AS DOUBLE) / 50.0, 1.0) AS x1,
       |    CAST(len(list_filter(ws, w -> w IN ${TextAnalysis.duckStopList})) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS x2,
       |    least(((CAST(n_chars AS DOUBLE) - (CAST(len(ws) AS DOUBLE) - 1.0)) / CAST(len(ws) AS DOUBLE)) / 8.0, 1.0) AS x3,
       |    CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS x4,
       |    ${TextAnalysis.duckQuality} AS q
       |  FROM d
       |), e AS MATERIALIZED (
       |  SELECT x0, x1, x2, x3, x4,
       |    ${Exact.duckRoundS(s"1.0 / (1.0 + exp(-($z)))", 4)}
       |      - CAST(CAST(q >= $Thresh AS INT) AS DOUBLE) AS err
       |  FROM f
       |), long AS (
       |  $branches
       |), g AS (
       |  SELECT j, COUNT(*) AS n_docs,
       |    ${Exact.duckSum("err * x", S)} / COUNT(*) AS grad
       |  FROM long GROUP BY j
       |), w AS (SELECT * FROM (VALUES $wRows) AS t(j, w_old))
       |SELECT CAST(g.j AS INT) AS j, g.n_docs, CAST(w.w_old AS DOUBLE) AS w_old,
       |  g.grad, CAST(w.w_old AS DOUBLE) - $Lr * g.grad AS w_new
       |FROM g JOIN w ON w.j = g.j""".stripMargin
  }
}
