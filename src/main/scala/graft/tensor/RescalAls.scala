package graft.tensor

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash}
import graft.rdf.Dict

/** #23 `rescal_als` / #102 `rescal_als_core`: RESCAL ALS — one exact
  * core-tensor update for the bilinear model X_k ≈ A·R_k·Aᵗ over the
  * TPC-H COO tensor.
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
  * Exactness (round 6): G and AᵗX_kA are plain sums of DYADIC products —
  * exactly representable with a common power-of-two denominator, so the
  * sums are exact and order-independent in any engine without
  * quantization. The solve G⁻¹·M·G⁻¹ is the [[SmallLinalg]] literal-order
  * adjugate + matmul, so [[coreSolve]] is hash-exactly oracle-checkable
  * ([[coreSolveSql]]). Only the fit's Σ recon mixes in the non-dyadic
  * solved core and is decSum-quantized for determinism.
  *
  * The spec asserts fit(after) ≥ fit(before): the update is the exact
  * least-squares minimizer per slice, so the objective cannot increase.
  */
object RescalAls {

  val D = 4
  val Ridge = 1e-9

  /** Quantization scale of the fit's reconstruction sum. */
  val SumScale = 9

  import SmallLinalg.Mat

  private def dyadicVec(seed: String, id: Column, d: Int = D): Column =
    array((0 until d).map(i => PortableHash.dyadic(
      concat_ws("|", lit(seed), id.cast("string"), lit(i.toString)))): _*)

  /** The distributed inputs of the core solve: entity factor frame,
    * d×d Gram G = AᵗA (driver), and the per-relation AᵗX_kA rows
    * (J × d² — dictionary-sized).
    */
  private def solveInputs(spark: SparkSession, dir: String)
      : (DataFrame, Mat[Double], Map[Long, Mat[Double]]) = {
    val x = Dict.encodedTriples(spark, dir).localCheckpoint()

    val a = x.select(col("sid").as("id")).union(x.select(col("oid")))
      .distinct().withColumn("vec", dyadicVec("RA", col("id"))).localCheckpoint()

    // G = AᵗA (d×d, driver) — dyadic products: plain sum is exact.
    val gAggs = for (r <- 0 until D; s <- 0 until D)
      yield sum(element_at(col("vec"), r + 1) * element_at(col("vec"), s + 1)).as(s"g_${r}_$s")
    val gRow = a.agg(gAggs.head, gAggs.tail: _*).head()
    val g = SmallLinalg.mat(D, D)((r, s) => gRow.getDouble(r * D + s))

    // Aᵗ X_k A per relation: Σ a_s ⊗ a_o over the slice (flat d²).
    val joined = x
      .join(a.select(col("id").as("sid"), col("vec").as("as")), "sid")
      .join(a.select(col("id").as("oid"), col("vec").as("ao")), "oid")
      .localCheckpoint()
    val outerAggs = for (r <- 0 until D; s <- 0 until D)
      yield sum(element_at(col("as"), r + 1) * element_at(col("ao"), s + 1)).as(s"m_${r}_$s")
    val axaMap = joined.groupBy("pid").agg(outerAggs.head, outerAggs.tail: _*)
      .collect() // J × d² — dictionary-sized
      .map { row =>
        row.getLong(0) -> SmallLinalg.mat(D, D)((r, s) => row.getDouble(1 + r * D + s))
      }.toMap
    (joined, g, axaMap)
  }

  private def coreSolved(gInv: Mat[Double], axa: Mat[Double]): Mat[Double] =
    SmallLinalg.matmul(SmallLinalg.matmul(gInv, axa), gInv)

  /** Returns (iter, fit): iter 0 = dyadic-random core, 1 = solved core. */
  def rescalAls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (joined, g, axaMap) = solveInputs(spark, dir)
    val nnz = joined.count().toDouble
    val gInv = SmallLinalg.inv4(SmallLinalg.addRidge(g, Ridge))

    // dyadic random core slice (seed "RC|pid|idx", driver-side md5)
    def coreInit(pid: Long): Mat[Double] =
      SmallLinalg.mat(D, D)((r, s) => PortableHash.dyadicJvm(s"RC|$pid|${r * D + s}"))

    def fit(cores: Map[Long, Mat[Double]]): Double = {
      // S1 = Σ_{(ijk)∈X} a_iᵗ R_j a_k  — broadcast the tiny cores as a
      // literal lookup array (pid-indexed flat d²).
      val maxPid = cores.keys.max.toInt
      val flat: Array[Array[Double]] = Array.tabulate(maxPid + 1)(p =>
        cores.get(p.toLong).map(m => m.flatten.toArray).getOrElse(Array.fill(D * D)(0.0)))
      val coreLit = array(flat.map(arr => array(arr.map(lit): _*)): _*)
      val s1 = joined
        .withColumn("core", element_at(coreLit, col("pid").cast("int") + 1))
        .select(((0 until D).flatMap(r => (0 until D).map(s =>
          element_at(col("as"), r + 1) * element_at(col("core"), r * D + s + 1)
            * element_at(col("ao"), s + 1))): Seq[Column]).reduce(_ + _).as("p"))
        .agg(Exact.decSum(col("p"), SumScale)).head().getDouble(0)
      // ‖recon‖² = Σ_k tr(R_kᵗ G R_k G)
      val s2 = cores.values.map { rk =>
        val grg = SmallLinalg.matmul(SmallLinalg.matmul(g, rk), g)
        (0 until D).map(r => (0 until D).map(s => rk(r)(s) * grg(r)(s)).sum).sum
      }.sum
      1.0 - (nnz - 2.0 * s1 + s2) / nnz
    }

    val fit0 = fit(axaMap.map { case (p, _) => p -> coreInit(p) })
    val fit1 = fit(axaMap.map { case (p, m) => p -> coreSolved(gInv, m) })
    Seq((0, fit0), (1, fit1)).toDF("iter", "fit")
  }

  /** #102 `rescal_als_core`: the solved core slices themselves,
    * (pid, c_0_0..c_3_3) — the hash-exact oracle pin for the RESCAL
    * algebra. All distributed sums are exact dyadic; the driver-side
    * G⁻¹·M·G⁻¹ mirrors the oracle op for op (see [[SmallLinalg]]).
    */
  def coreSolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, g, axaMap) = solveInputs(spark, dir)
    val gInv = SmallLinalg.inv4(SmallLinalg.addRidge(g, Ridge))
    axaMap.toSeq.sortBy(_._1).map { case (pid, axa) =>
      val c = coreSolved(gInv, axa)
      (pid, c(0)(0), c(0)(1), c(0)(2), c(0)(3),
            c(1)(0), c(1)(1), c(1)(2), c(1)(3),
            c(2)(0), c(2)(1), c(2)(2), c(2)(3),
            c(3)(0), c(3)(1), c(3)(2), c(3)(3))
    }.toDF("pid" +: (for (r <- 0 until D; s <- 0 until D)
      yield s"c_${r}_$s"): _*)
  }

  // ---------------------------------------------------------------- oracle

  val coreSolveSql: String = {
    val F = SmallLinalg.SqlField
    def dy(idExpr: String, i: Int): String =
      PortableHash.duckDyadic(s"'RA|' || $idExpr || '|$i'")
    val gCols = (for (r <- 0 until D; s <- 0 until D)
      yield s"SUM(${dy("id", r)} * ${dy("id", s)}) AS g_${r}_$s").mkString(",\n    ")
    val gN = SmallLinalg.mat(D, D)((r, s) => s"g_${r}_$s")
    val hExpr = SmallLinalg.addRidge(gN, Ridge)(F)
    val hCols = (for (r <- 0 until D; s <- 0 until D)
      yield s"${hExpr(r)(s)} AS h_${r}_$s").mkString(",\n    ")
    val hN = SmallLinalg.mat(D, D)((r, s) => s"h_${r}_$s")
    val invExpr = SmallLinalg.inv4(hN)(F)
    val invCols = (for (r <- 0 until D; s <- 0 until D)
      yield s"${invExpr(r)(s)} AS i_${r}_$s").mkString(",\n    ")
    val axaCols = (for (r <- 0 until D; s <- 0 until D)
      yield s"SUM(${dy("sid", r)} * ${dy("oid", s)}) AS m_${r}_$s").mkString(",\n    ")
    // c = (Inv · M) · Inv with the SAME matmul literal order as the driver
    val invN = SmallLinalg.mat(D, D)((r, s) => s"iv.i_${r}_$s")
    val axaN = SmallLinalg.mat(D, D)((r, s) => s"axa.m_${r}_$s")
    val cExpr = SmallLinalg.matmul(SmallLinalg.matmul(invN, axaN)(F), invN)(F)
    val cCols = (for (r <- 0 until D; s <- 0 until D)
      yield s"${cExpr(r)(s)} AS c_${r}_$s").mkString(",\n  ")
    s"""${Dict.preludeCtes},
       |ents AS (SELECT sid AS id FROM encoded UNION SELECT oid FROM encoded),
       |g AS (SELECT
       |    $gCols
       |  FROM ents),
       |hmat AS (SELECT
       |    $hCols
       |  FROM g),
       |iv AS (SELECT
       |    $invCols
       |  FROM hmat),
       |axa AS (
       |  SELECT pid,
       |    $axaCols
       |  FROM encoded GROUP BY pid)
       |SELECT axa.pid,
       |  $cCols
       |FROM axa, iv""".stripMargin
  }
}
