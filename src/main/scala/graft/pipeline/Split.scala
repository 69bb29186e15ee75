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

  // ------------------------------------------- #295 temporal split

  /** #295: TEMPORAL train/test split over the event stream — the split
    * every forecasting/recommendation eval needs where the hash splits
    * (#127/#290) would leak the FUTURE into training: train = the first
    * 4/5 of the observed day span (cutoff = d0 + ⌊(d1−d0)·4/5⌋, pure
    * integer arithmetic on the span — append-shifted but deterministic
    * for a snapshot), test = the remainder. Emits the per-event-type
    * accounting a temporal eval reads before trusting itself: event
    * counts per side, distinct users per side, and the USER OVERLAP —
    * `users_both` is not leakage (temporal generalization is usually
    * WITHIN-user) but it decides which eval applies: near-zero overlap
    * means the test period is new users and the task is cold-start,
    * not forecasting.
    *
    * Scale: events collapse map-side onto the (type, user) keyspace
    * (the partitioning the sessionizers already use), then one
    * |types|-key rollup; the span row broadcasts. Exact integers; the
    * overlap rate is one division, pinned 0.0 for an empty test side.
    */
  def temporal(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.relational.Events.eventsS(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("ts_s DIV 86400").as("day"))
    val span = e.agg(min("day").as("d0"), max("day").as("d1"))
      .select(expr("d0 + ((d1 - d0) * 4) DIV 5").as("cutoff_day"))
    val perUser = e.crossJoin(broadcast(span))
      .withColumn("tr", when(col("day") <= col("cutoff_day"), 1L).otherwise(0L))
      .groupBy("event_type", "user_id", "cutoff_day")
      .agg(sum("tr").as("n_tr"), sum(lit(1L) - col("tr")).as("n_te"))
    perUser.groupBy("event_type", "cutoff_day")
      .agg(
        sum("n_tr").as("n_train"),
        sum("n_te").as("n_test"),
        sum(when(col("n_tr") > 0, 1L).otherwise(0L)).as("users_train"),
        sum(when(col("n_te") > 0, 1L).otherwise(0L)).as("users_test"),
        sum(when(col("n_tr") > 0 && col("n_te") > 0, 1L).otherwise(0L))
          .as("users_both"))
      .withColumn("user_overlap_rate",
        when(col("users_test") === 0, lit(0.0))
          .otherwise(col("users_both").cast("double") / col("users_test")))
      .select("event_type", "cutoff_day", "n_train", "n_test",
        "users_train", "users_test", "users_both", "user_overlap_rate")
  }

  val temporalSql: String = {
    val ts = graft.relational.Events.duckTsS
    s"""WITH e AS (
       |  SELECT event_type, user_id, $ts // 86400 AS day FROM events
       |), span AS (
       |  SELECT MIN(day) + ((MAX(day) - MIN(day)) * 4) // 5 AS cutoff_day
       |  FROM e
       |), u AS (
       |  SELECT event_type, user_id, cutoff_day,
       |    CAST(SUM(CASE WHEN day <= cutoff_day THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
       |    CAST(SUM(CASE WHEN day <= cutoff_day THEN 0 ELSE 1 END) AS BIGINT) AS n_te
       |  FROM e, span GROUP BY 1, 2, 3
       |)
       |SELECT event_type, cutoff_day,
       |  CAST(SUM(n_tr) AS BIGINT) AS n_train,
       |  CAST(SUM(n_te) AS BIGINT) AS n_test,
       |  CAST(SUM(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_train,
       |  CAST(SUM(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_test,
       |  CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_both,
       |  CASE WHEN SUM(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) = 0 THEN 0.0
       |       ELSE CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |         / SUM(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) END AS user_overlap_rate
       |FROM u GROUP BY 1, 2""".stripMargin
  }
}
