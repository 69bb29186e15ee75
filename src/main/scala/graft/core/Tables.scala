package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish test data.
  * Column pruning / predicate pushdown reach the scan because callers
  * select/filter on the returned DataFrame before any action (both push
  * through the conditional repartition below).
  *
  * The test tables are SINGLE-FILE, SINGLE-ROW-GROUP parquet — Spark
  * cannot split a lone row group, so every scan would be one task and
  * any map-heavy work fused into the scan stage (hashing, array math)
  * would run on ONE core (measured: brute-force ANN 16 s → 2 s at sf0.1
  * after spreading). [[spread]] repartitions ONLY when the file count is
  * below the session's parallelism; on production data laid out as many
  * files/row groups the branch never triggers and the plan keeps its
  * shuffle-free scan. The tiny dimension tables (nation/region) are
  * exempt — they exist to be broadcast.
  */
object Tables {

  private def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.inputFiles.length >= n) df else df.repartition(n)
  }

  // Plan-level memo per (session, dir, table): `spark.read.parquet`
  // re-infers the schema on EVERY call — a distributed footer-reading
  // job per read — so a board-wide registration (SqlSurface) or a
  // multi-table query paid one Spark job per table REFERENCE instead of
  // per table. The memo holds unexecuted logical plans (no persist, no
  // data), and [[clearFrames]] drops the references on harness teardown
  // so stopped sessions are not retained.
  private val frames = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  private[core] def clearFrames(): Unit = frames.clear()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    frames.getOrElseUpdate((spark, dir, s"t|$name"),
      spread(spark.read.parquet(s"$dir/$name.parquet")))

  private def dim(spark: SparkSession, dir: String, name: String): DataFrame =
    frames.getOrElseUpdate((spark, dir, s"d|$name"),
      spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame    = dim(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = dim(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** All source-table names (dimension tables included). */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Loader by name (dimension tables skip the [[spread]] repartition). */
  def byName(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "nation" | "region" => dim(s, d, name)
      case other => table(s, d, other)
    }
}
