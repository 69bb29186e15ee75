package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}
import graft.dedup.Dedup

/** #127: LEAKAGE-SAFE train/valid/test split — holdout assignment keyed
  * on the near-dup CLUSTER, not the document. Splitting by doc hash
  * leaks: a near-duplicate of a test document lands in train with
  * probability (1 − 1/20), and the model "generalizes" to text it
  * effectively saw — the standard contamination failure benchmark
  * decontamination (#62) exists to catch AFTER the fact. Assigning by
  * `canonical_id` (#111's cluster representative) makes the guarantee
  * STRUCTURAL: every member of a near-dup cluster shares the split by
  * construction, so train/test leakage through near-duplicates is
  * impossible rather than merely unlikely.
  *
  * Assignment: pHash("split\|" ⧺ canonical_id) % 20 → 0 = test (5%),
  * 1 = valid (5%), else train — append-stable (new docs never move old
  * ones) and reproducible from the corpus alone. Emits the per-split
  * accounting (n_docs, n_clusters, n_chars).
  *
  * Scale: the cluster table is pair-graph-sized (tiny — broadcasts, as
  * in #111), the assignment is map-only, the report a 3-key
  * map-side-combining aggregate. SplitSpec asserts the structural
  * guarantee: zero verified near-dup pairs cross splits.
  */
object Split {

  val Buckets = 20 // 1 test + 1 valid + 18 train

  /** Per-doc split assignment (doc_id, canonical_id, split). */
  private[pipeline] def assigned(spark: SparkSession,
      dir: String): DataFrame =
    Dedup.canonical(spark, dir)
      .withColumn("h",
        PortableHash.pHash(concat(lit("split|"),
          col("canonical_id").cast("string"))) % Buckets)
      .withColumn("split",
        when(col("h") < 1, "test")
          .when(col("h") < 2, "valid")
          .otherwise("train"))

  def splitHoldout(spark: SparkSession, dir: String): DataFrame =
    assigned(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "n_chars"),
        "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("canonical_id").as("n_clusters"),
        sum("n_chars").as("n_chars"))

  val splitHoldoutSql: String =
    s"""WITH RECURSIVE ${Dedup.canonicalCtes}
       |SELECT CASE WHEN h < 1 THEN 'test' WHEN h < 2 THEN 'valid'
       |            ELSE 'train' END AS split,
       |  COUNT(*) AS n_docs,
       |  COUNT(DISTINCT canonical_id) AS n_clusters,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM (
       |  SELECT *, ${PortableHash.duck("'split|' || canonical_id")} % $Buckets AS h
       |  FROM canon
       |)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------- #290 k-fold CV

  val KFolds = 5

  /** #290: K-FOLD CROSS-VALIDATION assignment — the splitter the
    * quality-classifier block (#151/#152) evaluates with: fold =
    * pHash("fold"|doc_id) % K, so membership is a pure function of the
    * id (append-stable — new docs never move old ones; reproducible
    * from the corpus alone, no assignment table to store) and folds
    * are disjoint and complete BY CONSTRUCTION. Emits the per-(fold,
    * lang) accounting table — the artifact a CV harness reads to
    * confirm the folds are balanced enough per stratum before trusting
    * the variance of the cross-validated metric.
    *
    * Scale: assignment is map-only; the report is one
    * map-side-combining aggregate onto the K×|langs| keyspace. Pure
    * integer counting.
    */
  def kfold(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (PortableHash.pHash(concat_ws("|", lit("fold"),
          col("doc_id"))) % KFolds).cast("int").as("fold"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"))

  val kfoldSql: String = {
    val h = PortableHash.duck("'fold|' || doc_id")
    s"""SELECT CAST($h % $KFolds AS INT) AS fold, lang,
       |  COUNT(*) AS n_docs
       |FROM documents GROUP BY 1, 2""".stripMargin
  }
}
