package graft.tensor

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash}
import graft.rdf.Dict

/** #22 `cp_als` / #101 `cp_als_sweep`: rank-R CP/PARAFAC decomposition of
  * the boolean TPC-H COO tensor by alternating least squares — the
  * README's promised PARAFAC algorithm in GigaTensor (join+agg) form.
  *
  * Distribution contract (SURVEY §5): factor matrices A (subjects) and
  * C (objects) are id-keyed DataFrames that only ever join on their ids;
  * the relation factor B is dictionary-sized (~1e3 rows at any scale) and
  * is collected + broadcast. The ONLY driver-side dense objects are R×R
  * Gram matrices. Each ALS half-step is one join-shuffle + one groupBy —
  * the MTTKRP shape of [[Mttkrp]] — so the iteration cost is
  * O(nnz·R / cluster), never O(I·J·K).
  *
  * Exactness (round 6): every distributed sum (MTTKRP rows, Gram
  * entries, the fit's Σ recon) goes through [[Exact.decSum]] at scale 9,
  * and the normal-equation solve is [[SmallLinalg.inv4]] — a literal-
  * order cofactor adjugate written over [[SmallLinalg.Field]] so the
  * DuckDB oracle evaluates the IDENTICAL IEEE op sequence. Consequences:
  * (a) the whole ALS trajectory is partition-order-deterministic, and
  * (b) the first A half-sweep is hash-exactly oracle-checkable
  * ([[halfSweepA]]/[[halfSweepASql]]) — closing the one family that had
  * no oracle-pinned algebra. Quantization domain: factor entries stay
  * O(1)-O(10) (reconstruction of a 0/1 tensor), so |term|·10⁹ ≪ 2^53 and
  * group sums ≪ 2^63 even at 1e11 nnz; at larger corpus scale the scale
  * constant drops, it is not a tuning knob (see graft.core.Exact).
  *
  * fit(X, [[A,B,C]]) = 1 − ‖X − recon‖² / nnz, with
  * ‖X − recon‖² = nnz − 2·Σ_{x∈X} recon(x) + ‖recon‖², where
  * ‖recon‖² = Σ_{r,s} (AᵗA)(r,s)·(BᵗB)(r,s)·(CᵗC)(r,s): everything is a
  * join-agg or an R×R contraction. ALS solves each factor's least squares
  * exactly (up to the scale-9 quantization), so fit is non-decreasing —
  * asserted by the ScalaTest spec.
  */
object CpAls {

  val R = 4
  val Iters = 2

  /** Quantization scale for every distributed sum in the ALS chain. */
  val SumScale = 9

  /** Diagonal ridge of the normal-equation solve. */
  val Ridge = 1e-9

  import SmallLinalg.Mat

  private def dyadicVec(seed: String, id: Column): Column =
    array((0 until R).map(r => PortableHash.dyadic(
      concat_ws("|", lit(seed), id.cast("string"), lit(r.toString)))): _*)

  /** Init factor frame (id, vec) over the distinct ids of `idCol`. */
  private def initFactor(x: DataFrame, idCol: String, seed: String): DataFrame =
    x.select(col(idCol).as("id")).distinct()
      .withColumn("vec", dyadicVec(seed, col("id")))

  /** Per-element quantized sum of a length-R array column `t`,
    * reassembled into an array — elementwise Σ with R agg expressions.
    */
  private def sumVec(df: DataFrame, key: String, t: String): DataFrame = {
    val aggs = (0 until R).map(r =>
      Exact.decSum(element_at(col(t), r + 1), SumScale).as(s"_m$r"))
    df.groupBy(col(key).as("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until R).map(r => col(s"_m$r")): _*).as("vec"))
  }

  private def gram(f: DataFrame): Mat[Double] = {
    val aggs = for (r <- 0 until R; s <- 0 until R)
      yield Exact.decSum(
        element_at(col("vec"), r + 1) * element_at(col("vec"), s + 1),
        SumScale).as(s"g_${r}_$s")
    val row = f.agg(aggs.head, aggs.tail: _*).head()
    SmallLinalg.mat(R, R)((r, s) => row.getDouble(r * R + s))
  }

  /** (G₁ ∘ G₂ + ridge·I)⁻¹ — the per-half-step normal-equation solve. */
  private def solveMat(g1: Mat[Double], g2: Mat[Double]): Mat[Double] =
    SmallLinalg.inv4(SmallLinalg.hadamardRidge(g1, g2, Ridge))

  /** vec' = vecᵗ · m (driver-side R×R m as literals, codegen'd). */
  private def applyRight(f: DataFrame, m: Mat[Double]): DataFrame =
    f.select(col("id"), array((0 until R).map(r =>
      (0 until R).map(s => element_at(col("vec"), s + 1) * lit(m(s)(r)))
        .reduce(_ + _)): _*).as("vec"))

  /** The Khatri-Rao-product rows feeding the `of` update: encoded COO
    * rows joined with the two FIXED factors, `t` = their elementwise
    * product. The factor args are by-name: each branch touches only the
    * two it needs.
    */
  private def joinFactors(x: DataFrame, of: String,
      a: => DataFrame, b: => DataFrame, c: => DataFrame): DataFrame = {
    lazy val af = a.select(col("id").as("sid"), col("vec").as("av"))
    lazy val bf = b.select(col("id").as("pid"), col("vec").as("bv"))
    lazy val cf = c.select(col("id").as("oid"), col("vec").as("cv"))
    of match {
      case "sid" => x.join(broadcast(bf), "pid").join(cf, "oid")
        .withColumn("t", zip_with(col("bv"), col("cv"), _ * _))
      case "pid" => x.join(af, "sid").join(cf, "oid")
        .withColumn("t", zip_with(col("av"), col("cv"), _ * _))
      case "oid" => x.join(af, "sid").join(broadcast(bf), "pid")
        .withColumn("t", zip_with(col("av"), col("bv"), _ * _))
    }
  }

  /** Runs `Iters` ALS sweeps; returns (iter, fit) — fit per sweep. */
  def cpAls(spark: SparkSession, dir: String): DataFrame = {
    val x = Dict.encodedTriples(spark, dir).localCheckpoint()
    val nnz = x.count().toDouble

    var a = initFactor(x, "sid", "A").localCheckpoint()
    var b = initFactor(x, "pid", "B").localCheckpoint()
    var c = initFactor(x, "oid", "C").localCheckpoint()

    // Gram cache: each factor changes ONCE per sweep, so its R×R Gram is
    // computed once right after the update and reused by the other two
    // half-steps and the fit — 3 gram jobs per sweep instead of 9.
    var ga = gram(a); var gb = gram(b); var gc = gram(c)

    def fit(): Double = {
      val af = a.select(col("id").as("sid"), col("vec").as("av"))
      val bf = b.select(col("id").as("pid"), col("vec").as("bv"))
      val cf = c.select(col("id").as("oid"), col("vec").as("cv"))
      val s1 = x.join(af, "sid").join(broadcast(bf), "pid").join(cf, "oid")
        .select(aggregate(zip_with(zip_with(col("av"), col("bv"), _ * _),
          col("cv"), _ * _), lit(0.0), (acc, v) => acc + v).as("p"))
        .agg(Exact.decSum(col("p"), SumScale)).head().getDouble(0)
      val s2 = SmallLinalg.tripleDot(ga, gb, gc)
      1.0 - (nnz - 2.0 * s1 + s2) / nnz
    }

    val fits = Seq.newBuilder[(Int, Double)]
    fits += ((0, fit()))
    for (it <- 1 to Iters) {
      a = applyRight(sumVec(joinFactors(x, "sid", a, b, c), "sid", "t"),
        solveMat(gb, gc)).localCheckpoint()
      ga = gram(a)
      b = applyRight(sumVec(joinFactors(x, "pid", a, b, c), "pid", "t"),
        solveMat(ga, gc)).localCheckpoint()
      gb = gram(b)
      c = applyRight(sumVec(joinFactors(x, "oid", a, b, c), "oid", "t"),
        solveMat(ga, gb)).localCheckpoint()
      gc = gram(c)
      fits += ((it, fit()))
    }
    import spark.implicits._
    fits.result().toDF("iter", "fit")
  }

  /** #101 `cp_als_sweep`: the FIRST A half-sweep of [[cpAls]], emitted as
    * the updated subject-factor rows (id, a0..a3) — the hash-exact oracle
    * pin for the ALS algebra. A_new = M · (G_B ∘ G_C + ridge·I)⁻¹ with
    * M the MTTKRP against the dyadic-initial B and C: the MTTKRP and both
    * Grams are scale-9 quantized sums (order-independent, engine-exact),
    * and the adjugate inverse + row·matrix product evaluate the same
    * literal-order IEEE sequence in both engines (see [[SmallLinalg]]).
    * Same plan shape as a production sweep: one broadcast join (B), one
    * shuffle join (C), one groupBy(sid) — nnz-proportional, no driver
    * data motion beyond the two R×R Grams.
    */
  def halfSweepA(spark: SparkSession, dir: String): DataFrame = {
    val x = Dict.encodedTriples(spark, dir)
    // r10 (guide §2.4): each init factor feeds TWO consumers — its
    // eager Gram job and the MTTKRP join — so the entity-scale
    // distinct(oid)+dyadic build of C executed twice per run.
    // localCheckpoint materializes each once (same discipline as
    // cpAls' sweep loop); values are bit-identical rows, not a rerun.
    val b = initFactor(x, "pid", "B").localCheckpoint()
    val c = initFactor(x, "oid", "C").localCheckpoint()
    val m = sumVec(joinFactors(x, "sid", sys.error("A unused"), b, c), "sid", "t")
    applyRight(m, solveMat(gram(b), gram(c)))
      .select(col("id") +: (0 until R).map(r =>
        element_at(col("vec"), r + 1).as(s"a$r")): _*)
  }

  // ---------------------------------------------------------------- oracle

  /** Gram CTE: 16 quantized-sum entries g_r_s over a factor's dyadic
    * init, mirroring [[gram]] of an [[initFactor]] frame.
    */
  private def gramCte(alias: String, idExpr: String, seed: String): String = {
    val entries = for (r <- 0 until R; s <- 0 until R) yield {
      val vr = PortableHash.duckDyadic(s"'$seed|' || id || '|$r'")
      val vs = PortableHash.duckDyadic(s"'$seed|' || id || '|$s'")
      s"${Exact.duckSum(s"$vr * $vs", SumScale)} AS g_${r}_$s"
    }
    s"""$alias AS (
       |  SELECT ${entries.mkString(",\n    ")}
       |  FROM (SELECT DISTINCT $idExpr AS id FROM encoded))""".stripMargin
  }

  val halfSweepASql: String = {
    val F = SmallLinalg.SqlField
    val gbN = SmallLinalg.mat(R, R)((r, s) => s"gb.g_${r}_$s")
    val gcN = SmallLinalg.mat(R, R)((r, s) => s"gc.g_${r}_$s")
    val hExpr = SmallLinalg.hadamardRidge(gbN, gcN, Ridge)(F)
    val hCols = (for (r <- 0 until R; s <- 0 until R)
      yield s"${hExpr(r)(s)} AS h_${r}_$s").mkString(",\n    ")
    val hN = SmallLinalg.mat(R, R)((r, s) => s"h_${r}_$s")
    val invExpr = SmallLinalg.inv4(hN)(F)
    val invCols = (for (r <- 0 until R; s <- 0 until R)
      yield s"${invExpr(r)(s)} AS i_${r}_$s").mkString(",\n    ")
    val mCols = (0 until R).map { r =>
      val bt = PortableHash.duckDyadic(s"'B|' || pid || '|$r'")
      val ct = PortableHash.duckDyadic(s"'C|' || oid || '|$r'")
      s"${Exact.duckSum(s"$bt * $ct", SumScale)} AS m$r"
    }.mkString(",\n    ")
    // applyRight mirror: a_r = ((m0·i_0_r + m1·i_1_r) + m2·i_2_r) + m3·i_3_r
    val aCols = (0 until R).map { r =>
      val e = (0 until R).map(s => F.mul(s"m.m$s", s"iv.i_${s}_$r")).reduce(F.add)
      s"$e AS a$r"
    }.mkString(",\n  ")
    s"""${Dict.preludeCtes},
       |${gramCte("gb", "pid", "B")},
       |${gramCte("gc", "oid", "C")},
       |hmat AS (SELECT
       |    $hCols
       |  FROM gb, gc),
       |iv AS (SELECT
       |    $invCols
       |  FROM hmat),
       |m AS (
       |  SELECT sid AS id,
       |    $mCols
       |  FROM encoded GROUP BY sid)
       |SELECT m.id,
       |  $aCols
       |FROM m, iv""".stripMargin
  }
}
