package graft.kge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TpchGraph
import graft.functions.CircularCorrelation.ccorr
import graft.rdf.Dict

/** KGE triple-scoring operators — TransE, DistMult, RESCAL, HolE — over a
  * deterministic test slice of the TPC-H graph.
  *
  * Reference semantics:
  *  - TransE: score = −‖h + r − t‖² (L2 similarity of h+r and t),
  *    src/main/scala/net/sansa_stack/ml/kge/model/TransE.scala:38-44.
  *  - DistMult / RESCAL bilinear: kge/hole.py:181-218 (`RescalModel`,
  *    score = hᵀ W_r t; DistMult is the diagonal special case).
  *  - HolE: score = rᵀ ccorr(h, t), python/sansa/ml/kbc/keras/holek.py:135-151.
  *
  * All scores are per-row array math inside whole-stage codegen: the only
  * shuffles are the dictionary joins that produce the encoded slice. At
  * 100 TB the slice filter pushes into the scan and the scoring stage is
  * map-only.
  */
object Scoring {
  import Embeddings._

  private def sliced(spark: SparkSession, dir: String): DataFrame =
    encodedSample(spark, dir, ScoreMod)

  private def h: Column = emb("E", col("sid"))
  private def r: Column = emb("R", col("pid"))
  private def t: Column = emb("E", col("oid"))

  /** #13: TransE  score = −Σ_i (h_i + r_i − t_i)². */
  def transeScore(spark: SparkSession, dir: String): DataFrame =
    sliced(spark, dir)
      .withColumn("score",
        -dFold(zip_with(zip_with(h, r, _ + _), t,
          (hr, tt) => (hr - tt) * (hr - tt))))
      .select("sid", "pid", "oid", "score")

  /** #14: DistMult  score = Σ_i h_i · r_i · t_i. */
  def distmultScore(spark: SparkSession, dir: String): DataFrame =
    sliced(spark, dir)
      .withColumn("score", dFold(zip_with(zip_with(h, r, _ * _), t, _ * _)))
      .select("sid", "pid", "oid", "score")

  /** DistMult score for arbitrary (sid, pid, candidate) columns — reused
    * by [[RankingEval]].
    */
  def distmultCol(sid: Column, pid: Column, oid: Column): Column =
    dFold(zip_with(zip_with(emb("E", sid), emb("R", pid), _ * _),
      emb("E", oid), _ * _))

  /** #15: RESCAL  score = hᵀ W_p t, W_p an 8×8 dyadic matrix per relation
    * (row-major flat index j = a·8 + b).
    */
  def rescalScore(spark: SparkSession, dir: String): DataFrame = {
    val w = emb("W", col("pid"), DRescal * DRescal)
    val h8 = emb("E", col("sid"), DRescal)
    val t8 = emb("E", col("oid"), DRescal)
    // Row-major flat contraction WITHOUT indexing the generated arrays
    // inside a lambda (element_at(w, j) in a fold lambda re-inlines the
    // md5 transform per iteration — 64× the hash work): align h as
    // [h0×8, h1×8, …] and t as t8 tiled ×8, then one zip_with fold.
    val hRep = flatten(transform(h8, x => array_repeat(x, DRescal)))
    val tTile = flatten(array_repeat(t8, DRescal))
    sliced(spark, dir)
      .withColumn("score",
        dFold(zip_with(zip_with(w, hRep, _ * _), tTile, _ * _)))
      .select("sid", "pid", "oid", "score")
  }

  /** #16: HolE  score = Σ_k r_k · ccorr(h, t)_k via the custom Catalyst
    * [[graft.functions.CircularCorrelation]] expression (codegen'd O(d²)).
    */
  def holeScore(spark: SparkSession, dir: String): DataFrame =
    sliced(spark, dir)
      .withColumn("score", dFold(zip_with(r, ccorr(h, t), _ * _)))
      .select("sid", "pid", "oid", "score")

  // ---------------------------------------------------------------- oracle

  private def prelude(mod: Int): String =
    s"${Dict.preludeCtes},\n${Dict.sampleEncodedCte(mod)}"

  val transeScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "i")
    val te = duckEl("E", "oid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid,
       |  -SUM((($he + $re) - $te) * (($he + $re) - $te)) AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val distmultScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "i")
    val te = duckEl("E", "oid", "i")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM(($he * $re) * $te) AS score
       |FROM test_enc, (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val rescalScoreSql: String = {
    val we = duckEl("W", "pid", "(a * " + DRescal + " + b)")
    val he = duckEl("E", "sid", "a"); val te = duckEl("E", "oid", "b")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM(($we * $he) * $te) AS score
       |FROM test_enc,
       |  (SELECT unnest(range(0, ${DRescal})) AS a),
       |  (SELECT unnest(range(0, ${DRescal})) AS b)
       |GROUP BY sid, pid, oid""".stripMargin
  }

  val holeScoreSql: String = {
    val he = duckEl("E", "sid", "i"); val re = duckEl("R", "pid", "k")
    val te = duckEl("E", "oid", s"((i + k) % ${D})")
    s"""${prelude(ScoreMod)}
       |SELECT sid, pid, oid, SUM($re * ($he * $te)) AS score
       |FROM test_enc,
       |  (SELECT unnest(range(0, ${D})) AS k),
       |  (SELECT unnest(range(0, ${D})) AS i)
       |GROUP BY sid, pid, oid""".stripMargin
  }
}
