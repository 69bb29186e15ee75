package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.TempDirs

/** #337: PERSISTED ANN SERVING INDEX — the production artifact tier for
  * the ANN family (VERDICT r8 item 1). SURVEY §5's 100 TB story for
  * IVF-PQ is "codes computed once at ingest, partitioned BY cell, probes
  * are partition-pruned scans of compressed codes" — but through round 8
  * every index structure (cells, codes, codebooks) was a session-derived
  * cache, so a second-session serving user re-paid the ingest. This
  * materializes the full FAISS-IVFADC serving state, the discipline the
  * dictionary (#292, rdf/Dict.scala) and trained-embedding checkpoints
  * (#330, kge/Checkpoints.scala) already follow:
  *
  *  - `codes.parquet` — (vec_id, codes) **partitionBy(cell)**: the
  *    inverted lists ARE the directory layout, so a probe of p cells is
  *    a static partition-pruned read of p/C of the data at 3 bytes per
  *    vector (never a full scan);
  *  - `centroids.parquet` — the coarse quantizer (c, cv), C·d doubles;
  *  - `codebook.parquet` — the PQ codebooks (m, c, cv), M·C·d/M doubles.
  *
  * Serving ([[servedTopK]]) LOADS the artifact: the two codebook tables
  * are driver-collected (they are broadcast-scale by design — KB for any
  * real C/M, independent of corpus size) and re-enter the plan as the
  * same literal-array form the session path uses, so the probe/LUT/ADC
  * arithmetic runs the identical codegen'd IEEE sequence; the data side
  * is the loaded cell-partitioned codes table with an IN-filter on the
  * (≤NProbe·|queries|, here ≤NCells) probed cell set pushed to the scan.
  * Doubles round-trip parquet bit-exactly, so the served top-k is
  * hash-identical to the session-built index — the oracle (#76's SQL)
  * recomputes everything from raw embeddings, so any loss through the
  * write/read or a codebook row-order slip fails the hash.
  */
object AnnIndex {

  /** Materialize the IVF-PQ serving state under `path` (ingest-time).
    * `pred` restricts which vectors are indexed (default: all) — the
    * base-corpus build of the delta-ingest story (#341).
    */
  def save(spark: SparkSession, dir: String, path: String,
      pred: Column = lit(true)): Unit = {
    import spark.implicits._
    val vf = graft.functions.VectorFolds
    val cb = lit(Ann.pqFlatCodebook)
    Ann.vecs(spark, dir).filter(pred)
      .withColumn("cell", Ann.cellOf(col("v")))
      .withColumn("codes", vf.pqEncode(col("v"), cb, Ann.PqNCent, Ann.PqSubDim))
      .select("vec_id", "codes", "cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes.parquet")
    Ann.centroids.zipWithIndex.toSeq
      .map { case (cv, c) => (c, cv.toSeq) }.toDF("c", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
    (for {
      m <- Ann.pqCent.indices
      c <- Ann.pqCent(m).indices
    } yield (m, c, Ann.pqCent(m)(c).toSeq)).toDF("m", "c", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook.parquet")
  }

  /** Load the artifact: (codes frame, coarse centroids, flat PQ
    * codebook). The codebooks are driver-side arrays — KB-scale by
    * design (they ride into every serving plan as broadcast literals);
    * the codes frame stays distributed and cell-partitioned.
    */
  def load(spark: SparkSession, path: String)
      : (DataFrame, Array[Array[Double]], Array[Double]) = {
    val codes = spark.read.parquet(s"$path/codes.parquet")
    val cents = spark.read.parquet(s"$path/centroids.parquet")
      .orderBy("c").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("cv").toArray)
    val flat = spark.read.parquet(s"$path/codebook.parquet")
      .orderBy("m", "c").collect()
      .flatMap(_.getAs[scala.collection.Seq[Double]]("cv"))
    (codes, cents, flat)
  }

  /** IVF-PQ top-k served ENTIRELY from the loaded artifact: queries are
    * coarse-quantized and LUT'd against the loaded codebooks; candidate
    * codes come from the loaded cell-partitioned table behind a static
    * IN-prune on the probed cells (the probed set is ≤ C values — it is
    * collected driver-side and pushed into the scan's partition filter,
    * which is exactly what a serving system does to scope a probe).
    */
  def servedTopK(spark: SparkSession, dir: String, path: String): DataFrame = {
    val vf = graft.functions.VectorFolds
    val (codes, cents, flat) = load(spark, path)
    val cb = lit(flat)
    def centDist(v: Column, c: Int): Column =
      vf.sqDiffSum(v, array(cents(c).map(lit).toSeq: _*))
    val probes = Ann.vecs(spark, dir)
      .filter(col("vec_id") % Ann.QueryMod === 0)
      .withColumn("lut", vf.pqLut(col("v"), cb, Ann.PqNCent, Ann.PqSubDim))
      .select(col("vec_id").as("q_id"), col("lut"),
        explode(slice(array_sort(array((0 until cents.length).map(c =>
          struct(centDist(col("v"), c).as("d"), lit(c).as("c"))): _*)),
          1, Ann.NProbe)).as("p"))
      .select(col("q_id"), col("lut"), col("p.c").as("cell"))
    // Probed-cell set: bounded by the codebook size C, never data-scale.
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    codes.filter(col("cell").isin(probedCells.map(Int.box).toSeq: _*))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx_d", vf.pqAdc(col("lut"), col("codes"), Ann.PqNCent))
      .groupBy("q_id")
      .agg(graft.functions.TopK.topkMin(col("approx_d"), col("vec_id"), Ann.K)
        .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        col("s.score").as("approx_d"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** #337 registered query: ingest→persist→load→serve. The save is
    * memoized per (session, dir) via [[TempDirs.stagedFor]] — later
    * calls are pure reads of the existing artifact, matching production
    * where the index exists before the query (and not charging the
    * ingest write to every timed serve, the ADVICE-r7 staging rule).
    */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = TempDirs.stagedFor((spark, dir, "ann_index"),
      "graft_annindex_")(p => save(spark, dir, p))
    servedTopK(spark, dir, path)
  }

  /** #337 oracle: #76's IVF-PQ SQL — the artifact roundtrip must not
    * change a single bit of the served top-k.
    */
  val roundtripSql: String = Ann.ivfpqTopKSql

  // --------------------------------------------- #341 delta ingest

  /** The held-out "today's arrivals" slice for the delta-ingest story:
    * vectors with vec_id % DeltaMod == DeltaRes are absent from the
    * base index and arrive as a delta batch.
    */
  val DeltaMod = 13
  val DeltaRes = 5

  /** Append a batch of NEW vectors to an existing index artifact: the
    * arrivals are encoded with the artifact's own LOADED codebooks
    * (production: codebooks are immutable across delta ingests — only
    * a full rebuild retrains them) and appended into the
    * cell-partitioned codes table, an O(|delta|) job that never touches
    * the already-indexed corpus. The [[Dict]] `dict_delta_update`
    * discipline (#328) applied to the ANN tier.
    */
  def appendDelta(spark: SparkSession, dir: String, path: String,
      pred: Column): Unit = {
    val vf = graft.functions.VectorFolds
    val (_, cents, flat) = load(spark, path)
    val cb = lit(flat)
    def centDist(v: Column, c: Int): Column =
      vf.sqDiffSum(v, array(cents(c).map(lit).toSeq: _*))
    Ann.vecs(spark, dir).filter(pred)
      .withColumn("cell",
        array_min(array(cents.indices.map(c =>
          struct(centDist(col("v"), c).as("d"), lit(c).as("c"))): _*))
          .getField("c"))
      .withColumn("codes", vf.pqEncode(col("v"), cb, Ann.PqNCent, Ann.PqSubDim))
      .select("vec_id", "codes", "cell")
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/codes.parquet")
  }

  /** #341 registered query: base-build → delta-ingest → serve. The
    * base index covers the corpus MINUS the arrival slice; the slice
    * is appended via [[appendDelta]] (encode only the delta, append
    * partitions); the served top-k over the merged artifact must be
    * hash-identical to an index built over the full corpus at once —
    * i.e. delta ingest loses nothing and double-counts nothing.
    */
  def deltaRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = TempDirs.stagedFor((spark, dir, "ann_index_delta"),
      "graft_anndelta_") { p =>
      save(spark, dir, p, col("vec_id") % DeltaMod =!= DeltaRes)
      appendDelta(spark, dir, p, col("vec_id") % DeltaMod === DeltaRes)
    }
    servedTopK(spark, dir, path)
  }

  /** #341 oracle: the from-raw full-corpus IVF-PQ SQL — same bar as
    * #337; the incremental path must be indistinguishable from the
    * rebuild.
    */
  val deltaRoundtripSql: String = Ann.ivfpqTopKSql
}
