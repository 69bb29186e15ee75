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
}
