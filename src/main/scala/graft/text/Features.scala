package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** Feature hashing (the hashing trick — Weinberger et al. ICML'09): the
  * featurization layer of every vocabulary-free text classifier
  * (fastText's input projection, Vowpal Wabbit's core representation,
  * CC-Net's fastText quality/language stages). Words and word-bigrams
  * map to a FIXED number of slots via a hash, with a hash-derived ±1
  * sign so collisions cancel in expectation instead of biasing upward —
  * no vocabulary build, no dictionary to ship, memory constant in
  * corpus size.
  */
object Features {

  /** Slot count (2^10). Real deployments use 2^18-2^22; the constant
    * changes nothing in the plan.
    */
  val NSlots = 1024

  /** #155: the corpus-level hashed-feature table — per slot the
    * occurrence count, distinct-feature count (the collision
    * diagnostic: slots where n_feats > 1 are where the sign trick
    * earns its keep) and the signed sum a linear model would actually
    * accumulate. The per-doc vector is the same map with doc_id kept;
    * the corpus table is the training-side aggregate (feature
    * frequencies for pruning/regularization scaling) and the
    * oracle-checkable artifact.
    *
    * Plan: one scan, explode to (feature) rows, hash to (slot, sign)
    * map-side, then ONE groupBy onto ≤ [[NSlots]] keys — n_occ and
    * signed_sum combine map-side, so their shuffle bytes are constant
    * in corpus size; the distinct-feature count shuffles (slot, feat)
    * pairs, bounded by VOCABULARY size, not corpus size (drop that
    * column and the whole op is sketch-shaped). At 100 TB this is
    * scan-speed featurization — the exact plan a fastText-style
    * training pass runs as its first stage.
    */
  def hashFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), ws.as("ws"))
    val uni = docs.select(explode(col("ws")).as("feat"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (x, y) => concat_ws(" ", x, y))
    val bi = docs.filter(size(col("ws")) >= 2).select(explode(bigrams).as("feat"))
    uni.unionByName(bi)
      .select(col("feat"), PortableHash.pHash(concat(lit("FH|"), col("feat"))).as("fh"))
      .select(col("feat"), pmod(col("fh"), lit(NSlots)).as("slot"),
        when((expr(s"fh DIV $NSlots") % 2) === 0, 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("slot")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("feat")).as("n_feats"),
        sum("sign").as("signed_sum"))
  }

  val hashFeaturesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
       |), feats AS (
       |  SELECT unnest(ws) AS feat FROM d
       |  UNION ALL
       |  SELECT unnest(list_transform(range(1, len(ws)),
       |    i -> ws[i] || ' ' || ws[i + 1])) AS feat
       |  FROM d WHERE len(ws) >= 2
       |), hashed AS (
       |  SELECT feat, ${PortableHash.duck("'FH|' || feat")} AS fh FROM feats
       |), slotted AS (
       |  SELECT feat, fh % $NSlots AS slot,
       |    CASE WHEN (fh // $NSlots) % 2 = 0 THEN 1 ELSE -1 END AS sign
       |  FROM hashed
       |)
       |SELECT slot, COUNT(*) AS n_occ, COUNT(DISTINCT feat) AS n_feats,
       |  CAST(SUM(sign) AS BIGINT) AS signed_sum
       |FROM slotted GROUP BY slot""".stripMargin
}
