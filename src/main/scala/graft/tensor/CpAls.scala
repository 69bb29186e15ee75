package graft.tensor

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PortableHash
import graft.rdf.Dict

/** #22: rank-R CP/PARAFAC decomposition of the boolean TPC-H COO tensor
  * by alternating least squares — the README's promised PARAFAC algorithm
  * in GigaTensor (join+agg) form.
  *
  * Distribution contract (SURVEY §5): factor matrices A (subjects) and
  * C (objects) are id-keyed DataFrames that only ever join on their ids;
  * the relation factor B is dictionary-sized (~1e3 rows at any scale) and
  * is collected + broadcast. The ONLY driver-side dense objects are R×R
  * Gram matrices. Each ALS half-step is one join-shuffle + one groupBy —
  * the MTTKRP shape of [[Mttkrp]] — so the iteration cost is
  * O(nnz·R / cluster), never O(I·J·K).
  *
  * fit(X, [[A,B,C]]) = 1 − ‖X − recon‖² / nnz, with
  * ‖X − recon‖² = nnz − 2·Σ_{x∈X} recon(x) + ‖recon‖², where
  * ‖recon‖² = Σ_{r,s} (AᵗA)(r,s)·(BᵗB)(r,s)·(CᵗC)(r,s): everything is a
  * join-agg or an R×R contraction. ALS solves each factor's least squares
  * exactly, so fit is non-decreasing — asserted by the ScalaTest spec.
  */
object CpAls {

  val R = 4
  val Iters = 2

  private def dyadicVec(seed: String, id: Column): Column =
    array((0 until R).map(r => PortableHash.dyadic(
      concat_ws("|", lit(seed), id.cast("string"), lit(r.toString)))): _*)

  /** Per-element sum aggregation of a length-R array column `t`,
    * reassembled into an array — elementwise Σ with R agg expressions.
    */
  private def sumVec(df: DataFrame, key: String, t: String): DataFrame = {
    val aggs = (0 until R).map(r => sum(element_at(col(t), r + 1)).as(s"_m$r"))
    df.groupBy(col(key).as("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until R).map(r => col(s"_m$r")): _*).as("vec"))
  }

  private def gram(f: DataFrame): Array[Array[Double]] = {
    val aggs = for (r <- 0 until R; s <- 0 until R)
      yield sum(element_at(col("vec"), r + 1) * element_at(col("vec"), s + 1)).as(s"g_${r}_$s")
    val row = f.agg(aggs.head, aggs.tail: _*).head()
    Array.tabulate(R, R)((r, s) => row.getDouble(r * R + s))
  }

  /** vec' = vecᵗ · m (driver-side R×R m as literals, codegen'd). */
  private def applyRight(f: DataFrame, m: Array[Array[Double]]): DataFrame =
    f.select(col("id"), array((0 until R).map(r =>
      (0 until R).map(s => element_at(col("vec"), s + 1) * lit(m(s)(r)))
        .reduce(_ + _)): _*).as("vec"))

  /** Runs `Iters` ALS sweeps; returns (iter, fit) — fit per sweep. */
  def cpAls(spark: SparkSession, dir: String): DataFrame = {
    val x = Dict.encodedTriples(spark, dir).localCheckpoint()
    val nnz = x.count().toDouble

    var a = x.select(col("sid").as("id")).distinct()
      .withColumn("vec", dyadicVec("A", col("id"))).localCheckpoint()
    var b = x.select(col("pid").as("id")).distinct()
      .withColumn("vec", dyadicVec("B", col("id"))).localCheckpoint()
    var c = x.select(col("oid").as("id")).distinct()
      .withColumn("vec", dyadicVec("C", col("id"))).localCheckpoint()

    def joinFactors(of: String): DataFrame = {
      val af = a.select(col("id").as("sid"), col("vec").as("av"))
      val bf = b.select(col("id").as("pid"), col("vec").as("bv"))
      val cf = c.select(col("id").as("oid"), col("vec").as("cv"))
      of match {
        case "sid" => x.join(broadcast(bf), "pid").join(cf, "oid")
          .withColumn("t", zip_with(col("bv"), col("cv"), _ * _))
        case "pid" => x.join(a.select(col("id").as("sid"), col("vec").as("av")), "sid")
          .join(cf, "oid")
          .withColumn("t", zip_with(col("av"), col("cv"), _ * _))
        case "oid" => x.join(af, "sid").join(broadcast(bf), "pid")
          .withColumn("t", zip_with(col("av"), col("bv"), _ * _))
      }
    }

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
        .agg(sum("p")).head().getDouble(0)
      val s2 = SmallLinalg.tripleDot(ga, gb, gc)
      1.0 - (nnz - 2.0 * s1 + s2) / nnz
    }

    val fits = Seq.newBuilder[(Int, Double)]
    fits += ((0, fit()))
    for (it <- 1 to Iters) {
      a = applyRight(sumVec(joinFactors("sid"), "sid", "t"),
        SmallLinalg.inv(SmallLinalg.hadamard(gb, gc))).localCheckpoint()
      ga = gram(a)
      b = applyRight(sumVec(joinFactors("pid"), "pid", "t"),
        SmallLinalg.inv(SmallLinalg.hadamard(ga, gc))).localCheckpoint()
      gb = gram(b)
      c = applyRight(sumVec(joinFactors("oid"), "oid", "t"),
        SmallLinalg.inv(SmallLinalg.hadamard(ga, gb))).localCheckpoint()
      gc = gram(c)
      fits += ((it, fit()))
    }
    import spark.implicits._
    fits.result().toDF("iter", "fit")
  }
}
