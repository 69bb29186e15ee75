package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Epoch/repetition planning under a fixed token budget — the
  * data-constrained-scaling allocator (Muennighoff et al. 2023: repeating
  * data up to ~4 epochs is nearly as good as fresh data; beyond that
  * returns decay fast, hence the hard cap). Given a training budget of
  * B tokens and the per-source unique token counts, decide how many
  * epochs of each source to train on:
  *
  *   1. every source starts from an equal share  B div S;
  *   2. a source is CAPPED at [[MaxEpochs]]× its unique tokens — small
  *      sources cannot absorb their share by repeating forever;
  *   3. the leftover from capped sources is redistributed once, equally,
  *      to the uncapped sources (one waterfilling round — the full
  *      fixpoint is an iterative variant of the same two aggregates).
  *
  * Complements the mixing family: #53 reports attrition under a budget,
  * #68 rebalances by temperature, this one turns a budget into the
  * (epochs, final-epoch fraction) plan a training loader executes.
  *
  * 100 TB shape: ONE corpus scan collapsing to S source rows (map-side
  * combine), then every subsequent step is arithmetic on the
  * dictionary-small source frame with one-row broadcast scalars — no
  * data-scale shuffle, no windows, and ALL allocation math is BIGINT
  * (integer div/mod), exact at any corpus size — the equal-share
  * redistribution deliberately avoids the n_s·L product that would
  * overflow 64-bit at web scale.
  */
object Epochs {

  val MaxEpochs = 4L
  val BudgetX = 2L // train on 2× the unique corpus

  /** #133: per-source epoch plan under the fixed token budget. */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir)
      .select(col("source"), size(graft.text.TextAnalysis.words).as("t"))
      .groupBy("source").agg(sum("t").as("n_tokens"))
    val tot = src.agg(sum("n_tokens").as("tot"), count(lit(1)).as("n_src"))
    val alloc = src.crossJoin(broadcast(tot))
      .withColumn("budget", lit(BudgetX) * col("tot"))
      .withColumn("alloc_tokens", expr("budget div n_src"))
      .withColumn("cap", lit(MaxEpochs) * col("n_tokens"))
      .withColumn("eff0", least(col("alloc_tokens"), col("cap")))
    val left = alloc.agg(
      (first("budget") - sum("eff0")).as("leftover"),
      sum(when(col("eff0") < col("cap"), 1L).otherwise(0L)).as("n_uncapped"))
    alloc.crossJoin(broadcast(left))
      .withColumn("extra", when(col("eff0") < col("cap") && col("n_uncapped") > 0,
        expr("leftover div n_uncapped")).otherwise(0L))
      .withColumn("eff_tokens", least(col("eff0") + col("extra"), col("cap")))
      .select(col("source"), col("n_tokens"), col("alloc_tokens"), col("eff_tokens"),
        expr("eff_tokens div n_tokens").as("full_epochs"),
        ((col("eff_tokens") % col("n_tokens")).cast("double") /
          col("n_tokens").cast("double")).as("last_frac"),
        (col("eff_tokens").cast("double") / col("n_tokens").cast("double")).as("epochs"))
  }

  val mixEpochsSql: String =
    s"""WITH src AS (
       |  SELECT source, SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS n_tokens
       |  FROM documents GROUP BY source
       |), tot AS (
       |  SELECT SUM(n_tokens) AS tot, COUNT(*) AS n_src FROM src
       |), alloc AS (
       |  SELECT source, n_tokens, $BudgetX * tot AS budget, n_src,
       |    ($BudgetX * tot) // n_src AS alloc_tokens,
       |    $MaxEpochs * n_tokens AS cap,
       |    least(($BudgetX * tot) // n_src, $MaxEpochs * n_tokens) AS eff0
       |  FROM src CROSS JOIN tot
       |), leftov AS (
       |  SELECT ANY_VALUE(budget) - SUM(eff0) AS leftover,
       |    SUM(CASE WHEN eff0 < cap THEN 1 ELSE 0 END) AS n_uncapped
       |  FROM alloc
       |), fin AS (
       |  SELECT source, n_tokens, alloc_tokens, cap,
       |    least(eff0 + CASE WHEN eff0 < cap AND n_uncapped > 0
       |      THEN leftover // n_uncapped ELSE 0 END, cap) AS eff_tokens
       |  FROM alloc CROSS JOIN leftov
       |)
       |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       |  CAST(eff_tokens AS BIGINT) AS eff_tokens,
       |  CAST(eff_tokens // n_tokens AS BIGINT) AS full_epochs,
       |  CAST(eff_tokens % n_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS last_frac,
       |  CAST(eff_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs
       |FROM fin""".stripMargin
}
