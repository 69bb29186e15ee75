package graft.tensor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PortableHash
import graft.rdf.Dict

/** #110: the Tucker core contraction G = X ×₁ Aᵀ ×₂ Bᵀ ×₃ Cᵀ over the
  * boolean TPC-H COO tensor with fixed dyadic factor matrices —
  * completing the HaTen2 primitive pair: #21 (MTTKRP) is the CP-family
  * kernel, #87 (TTM) the single-mode contraction, and this is the
  * all-modes contraction whose output IS the Tucker core.
  *
  * Reference: the README's HaTen2/PARAFAC claim (Tucker and CP share
  * the sparse-contraction engine); tensor layout
  * python/sansa/ml/kbc/rdfio.py:52-89 (COO (i,j,k)).
  *
  * GigaTensor-style sparse form, one step further than TTM:
  *   G(a,b,c) = Σ_{(i,j,k) ∈ X} A(i,a)·B(j,b)·C(k,c)
  * — per nnz row the three R-vectors are looked up once (12 hashes),
  * their 64-cell outer product is one codegen'd projection, and the
  * whole table collapses in a SINGLE global aggregate with map-side
  * combine: the shuffle carries executor partials (R³ doubles each),
  * CONSTANT in nnz. No dense intermediate ever exists — the classic
  * reason Tucker at scale is a join-project-aggregate, not a matricized
  * GEMM.
  *
  * Exactness: each term is a product of three dyadics (numerator
  * ≤ 100³, denominator 2²¹) — sums are exact in ANY order while
  * nnz < 2³³ (the sum's numerator stays under 2⁵³); past that (1e11-nnz
  * production) the sums switch to [[graft.core.Exact.decSum]], which
  * changes one line, not the plan.
  */
object Tucker {

  /** Per-mode core rank (R³ = 64 core cells). */
  val R = 4

  def tuckerCore(spark: SparkSession, dir: String): DataFrame = {
    def fac(kind: String, id: String): Seq[org.apache.spark.sql.Column] =
      (0 until R).map(r => PortableHash.dyadic(
        concat_ws("|", lit(kind), col(id), lit(r.toString))))
    val av = array(fac("TKA", "sid"): _*)
    val bv = array(fac("TKB", "pid"): _*)
    val cv = array(fac("TKC", "oid"): _*)
    val cells = for { a <- 0 until R; b <- 0 until R; c <- 0 until R }
      yield (a, b, c)
    val terms = cells.map { case (a, b, c) =>
      ((element_at(col("av"), a + 1) * element_at(col("bv"), b + 1)) *
        element_at(col("cv"), c + 1)).as(s"_t${a}_${b}_$c")
    }
    val sums = cells.map { case (a, b, c) =>
      sum(col(s"_t${a}_${b}_$c")).as(s"_g${a}_${b}_$c")
    }
    Dict.encodedTriples(spark, dir)
      .withColumn("av", av).withColumn("bv", bv).withColumn("cv", cv)
      .select(terms: _*)
      .agg(sums.head, sums.tail: _*) // dyadic terms: exact in any order
      .select(posexplode(array(cells.map { case (a, b, c) =>
        col(s"_g${a}_${b}_$c") }: _*)).as(Seq("cell", "g")))
      .select((col("cell") / (R * R)).cast("int").as("a"),
        ((col("cell") / R) % R).cast("int").as("b"),
        (col("cell") % R).cast("int").as("c"), col("g"))
  }

  val tuckerCoreSql: String = {
    val ta = PortableHash.duckDyadic("'TKA|' || sid || '|' || a")
    val tb = PortableHash.duckDyadic("'TKB|' || pid || '|' || b")
    val tc = PortableHash.duckDyadic("'TKC|' || oid || '|' || c")
    s"""${Dict.preludeCtes}
       |SELECT CAST(a AS INT) AS a, CAST(b AS INT) AS b, CAST(c AS INT) AS c,
       |  SUM(($ta * $tb) * $tc) AS g
       |FROM encoded,
       |  (SELECT unnest(range(0, $R)) AS a),
       |  (SELECT unnest(range(0, $R)) AS b),
       |  (SELECT unnest(range(0, $R)) AS c)
       |GROUP BY a, b, c""".stripMargin
  }
}
