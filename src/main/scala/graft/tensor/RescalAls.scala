package graft.tensor

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PortableHash
import graft.rdf.Dict

/** #23: RESCAL ALS — one exact core-tensor update for the bilinear model
  * X_k ≈ A·R_k·Aᵗ over the TPC-H COO tensor.
  *
  * Reference: kge/hole.py:181-218 (`RescalModel`, bilinear scoring); the
  * classical ALS updates are Nickel et al.'s RESCAL. Updating the
  * dictionary-sized core slices R_k given fixed A is the exactly-solvable
  * half-step:
  *   R_k = G⁻¹ · (Aᵗ X_k A) · G⁻¹,   G = AᵗA
  * where Aᵗ X_k A = Σ_{(i,k')∈X_k} a_i a_{k'}ᵗ — a join + groupBy(pid)
  * over the COO rows (nnz-proportional, distributed); G and each d×d
  * R_k are driver-sized. Entity factors A stay a distributed id-keyed
  * DataFrame throughout.
  *
  * The spec asserts fit(after) ≥ fit(before): the update is the exact
  * least-squares minimizer per slice, so the objective cannot increase.
  */
object RescalAls {

  val D = 4

  private def dyadicVec(seed: String, id: Column, d: Int = D): Column =
    array((0 until d).map(i => PortableHash.dyadic(
      concat_ws("|", lit(seed), id.cast("string"), lit(i.toString)))): _*)

  /** Returns (iter, fit): iter 0 = dyadic-random core, 1 = solved core. */
  def rescalAls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Dict.encodedTriples(spark, dir).localCheckpoint()
    val nnz = x.count().toDouble

    val a = x.select(col("sid").as("id")).union(x.select(col("oid")))
      .distinct().withColumn("vec", dyadicVec("RA", col("id"))).localCheckpoint()

    // G = AᵗA (d×d, driver)
    val gAggs = for (r <- 0 until D; s <- 0 until D)
      yield sum(element_at(col("vec"), r + 1) * element_at(col("vec"), s + 1)).as(s"g_${r}_$s")
    val gRow = a.agg(gAggs.head, gAggs.tail: _*).head()
    val g = Array.tabulate(D, D)((r, s) => gRow.getDouble(r * D + s))

    // Aᵗ X_k A per relation: Σ a_s ⊗ a_o over the slice (flat d²).
    val joined = x
      .join(a.select(col("id").as("sid"), col("vec").as("as")), "sid")
      .join(a.select(col("id").as("oid"), col("vec").as("ao")), "oid")
      .localCheckpoint()
    val outerAggs = for (r <- 0 until D; s <- 0 until D)
      yield sum(element_at(col("as"), r + 1) * element_at(col("ao"), s + 1)).as(s"m_${r}_$s")
    val axaRows = joined.groupBy("pid").agg(outerAggs.head, outerAggs.tail: _*)
      .collect() // J × d² — dictionary-sized
    val gInv = SmallLinalg.inv(g)

    // dyadic random core slice (seed "RC|pid|idx", driver-side md5)
    def coreInit(pid: Long): Array[Array[Double]] =
      Array.tabulate(D, D)((r, s) => PortableHash.dyadicJvm(s"RC|$pid|${r * D + s}"))

    def coreSolved(axa: Array[Array[Double]]): Array[Array[Double]] =
      SmallLinalg.matmul(SmallLinalg.matmul(gInv, axa), gInv)

    def fit(cores: Map[Long, Array[Array[Double]]]): Double = {
      // S1 = Σ_{(ijk)∈X} a_iᵗ R_j a_k  — broadcast the tiny cores as a
      // literal lookup array (pid-indexed flat d²).
      val maxPid = cores.keys.max.toInt
      val flat: Array[Array[Double]] = Array.tabulate(maxPid + 1)(p =>
        cores.get(p.toLong).map(m => m.flatten).getOrElse(Array.fill(D * D)(0.0)))
      val coreLit = array(flat.map(arr => array(arr.map(lit): _*)): _*)
      val s1 = joined
        .withColumn("core", element_at(coreLit, col("pid").cast("int") + 1))
        .select(((0 until D).flatMap(r => (0 until D).map(s =>
          element_at(col("as"), r + 1) * element_at(col("core"), r * D + s + 1)
            * element_at(col("ao"), s + 1))): Seq[Column]).reduce(_ + _).as("p"))
        .agg(sum("p")).head().getDouble(0)
      // ‖recon‖² = Σ_k tr(R_kᵗ G R_k G)
      val s2 = cores.values.map { rk =>
        val grg = SmallLinalg.matmul(SmallLinalg.matmul(g, rk), g)
        (0 until D).map(r => (0 until D).map(s => rk(r)(s) * grg(r)(s)).sum).sum
      }.sum
      1.0 - (nnz - 2.0 * s1 + s2) / nnz
    }

    val axaMap = axaRows.map { row =>
      row.getLong(0) -> Array.tabulate(D, D)((r, s) => row.getDouble(1 + r * D + s))
    }.toMap
    val fit0 = fit(axaMap.map { case (p, _) => p -> coreInit(p) })
    val fit1 = fit(axaMap.map { case (p, m) => p -> coreSolved(m) })
    Seq((0, fit0), (1, fit1)).toDF("iter", "fit")
  }
}
