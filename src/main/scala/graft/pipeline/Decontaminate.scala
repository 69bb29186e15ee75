package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Benchmark decontamination: flag training documents that share any
  * word 8-gram with a held-out evaluation set — the standard
  * contamination check run before training on scraped data (the n-gram
  * variant popularized by GPT-3's appendix; no reference implementation
  * to cite, semantics follow the literature).
  *
  * The "benchmark" here is the deterministic slice `doc_id % 97 == 0`
  * standing in for an eval suite; a real pipeline feeds the actual
  * benchmark files through the same gram pipeline.
  *
  * 100 TB shape: the eval side is tiny and its HASHED gram set is
  * broadcast — the training corpus is scanned once, each doc exploding
  * to its gram hashes and probing the broadcast set; the only shuffle is
  * the final per-doc distinct/agg, keyed by doc_id. The text itself
  * never joins — only 60-bit gram hashes move. A Bloom filter over the
  * eval grams is the same plan with a smaller broadcast.
  */
object Decontaminate {

  val EvalMod = 7
  val N = 8 // gram width

  private val words: Column = split(trim(col("text")), "\\s+")
  private val duckWords = "regexp_split_to_array(trim(text), '\\s+')"

  /** (doc_id, gh): hashed word 8-grams, distinct per doc. */
  private def grams(docs: DataFrame): DataFrame = {
    val g = transform(sequence(lit(0), size(col("ws")) - N),
      j => PortableHash.pHash(concat_ws(" ", slice(col("ws"), j + 1, lit(N)))))
    docs.select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= N)
      .select(col("doc_id"), explode(array_distinct(g)).as("gh"))
  }

  /** #62: per-training-doc contamination report: number of distinct
    * 8-grams shared with the eval slice and the smallest overlapping
    * eval doc id (eval docs themselves are excluded from the report).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir)
    val evalGrams = grams(all.filter(col("doc_id") % EvalMod === 0))
      .select(col("gh"), col("doc_id").as("eval_doc_id"))
    val trainGrams = grams(all.filter(col("doc_id") % EvalMod =!= 0))
    trainGrams.join(broadcast(evalGrams), "gh")
      .groupBy("doc_id")
      .agg(
        countDistinct("gh").as("n_shared_grams"),
        min("eval_doc_id").as("min_eval_doc"))
  }

  val decontaminateSql: String = {
    val gram = (1 until N).foldLeft("ws[j]")((acc, k) => s"$acc || ' ' || ws[j+$k]")
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS ws FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(ws) - ${N - 2}),
       |      j -> ${PortableHash.duck(gram)}))) AS gh
       |  FROM d WHERE len(ws) >= $N
       |)
       |SELECT t.doc_id, COUNT(DISTINCT t.gh) AS n_shared_grams,
       |  MIN(e.doc_id) AS min_eval_doc
       |FROM g t JOIN g e ON e.gh = t.gh
       |WHERE t.doc_id % $EvalMod <> 0 AND e.doc_id % $EvalMod = 0
       |GROUP BY t.doc_id""".stripMargin
  }

  // --------------------------------------- #304 contamination coverage

  /** Coverage histogram bins (0.1-wide; top bin closed at 1.0). */
  val CovBins = 10

  /** #304: CONTAMINATION COVERAGE CURVE — the threshold-tuning artifact
    * behind #62 (the #289 design applied to decontamination): per
    * coverage bin (shared eval 8-grams / own distinct 8-grams, the
    * doc-level contamination FRACTION), the count of training docs in
    * the bin and the at-or-above cumulative tail. #62 reports who
    * overlaps and by how many grams; a removal POLICY needs "how many
    * docs do I lose at each threshold τ" — including the mass at
    * coverage 0, which #62's inner join structurally omits. The
    * GPT-3-appendix policy debate (drop any overlap vs drop >X%) is
    * decided by reading exactly this table.
    *
    * Scale: the eval gram set broadcasts (tiny by construction); the
    * train corpus is scanned once (map-side gram explode + probe); the
    * per-doc rollup keys on doc_id — the same partitioning #62 pays —
    * and the histogram collapses onto ≤ 11 keys, the cumulative tail a
    * bounded 11×11 explode. Exactness: coverage is one int/int double
    * division; binning floors an identical double; counts are integers.
    */
  def coverage(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir)
    val evalGrams = grams(all.filter(col("doc_id") % EvalMod === 0))
      .select("gh").distinct()
    val train = grams(all.filter(col("doc_id") % EvalMod =!= 0))
    val perDoc = train
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))), Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
    val binned = perDoc.select(
      least(floor(col("n_shared").cast("double") / col("n_grams") * CovBins),
        lit((CovBins - 1).toDouble)).cast("long").as("bin"))
    val counts = binned.groupBy("bin").agg(count(lit(1)).as("n_docs"))
    val cum = counts
      .select(explode(expr("sequence(0L, bin)")).as("bin"), col("n_docs"))
      .groupBy("bin").agg(sum("n_docs").as("n_docs_ge"))
    cum.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (col("bin").cast("double") / CovBins).as("coverage_lo"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("n_docs_ge"))
  }

  val coverageSql: String = {
    val gram = (1 until N).foldLeft("ws[j]")((acc, k) => s"$acc || ' ' || ws[j+$k]")
    s"""WITH d AS (
       |  SELECT doc_id, $duckWords AS ws FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(ws) - ${N - 2}),
       |      j -> ${PortableHash.duck(gram)}))) AS gh
       |  FROM d WHERE len(ws) >= $N
       |), ev AS (
       |  SELECT DISTINCT gh FROM g WHERE doc_id % $EvalMod = 0
       |), per_doc AS (
       |  SELECT t.doc_id, COUNT(*) AS n_grams,
       |    CAST(SUM(CASE WHEN ev.gh IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_shared
       |  FROM g t LEFT JOIN ev ON ev.gh = t.gh
       |  WHERE t.doc_id % $EvalMod <> 0
       |  GROUP BY 1
       |), counts AS (
       |  SELECT CAST(least(floor(CAST(n_shared AS DOUBLE) / n_grams
       |      * $CovBins), ${CovBins - 1}) AS BIGINT) AS bin,
       |    COUNT(*) AS n_docs
       |  FROM per_doc GROUP BY 1
       |), cum AS (
       |  SELECT t AS bin, CAST(SUM(n_docs) AS BIGINT) AS n_docs_ge
       |  FROM (SELECT UNNEST(range(0, bin + 1)) AS t, n_docs FROM counts)
       |  GROUP BY 1
       |)
       |SELECT cum.bin, CAST(cum.bin AS DOUBLE) / $CovBins AS coverage_lo,
       |  COALESCE(c.n_docs, 0) AS n_docs, cum.n_docs_ge
       |FROM cum LEFT JOIN counts c ON c.bin = cum.bin""".stripMargin
  }
}
