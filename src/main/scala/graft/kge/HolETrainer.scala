package graft.kge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, PortableHash}
import graft.functions.CircularCorrelation.ccorr
import graft.rdf.Dict

/** #47: distributed HolE training — holographic embeddings, the
  * reference's flagship model (python/sansa/ml/kbc/keras/holek.py,
  * kge/hole.py `HolE`), trained with the max-margin ranking loss and
  * full-batch deterministic GD like [[TransETrainer]]/[[DistMultTrainer]].
  *
  * Model: f(s,p,o) = rᵀ ccorr(h, t) with ccorr(a,b)_k = Σ_i a_i·b_{(i+k) mod d}.
  * All gradients are themselves circular correlations (the closed form
  * the reference computes in Fourier space, holek.py:135-151):
  *   ∂f/∂r = ccorr(h, t)
  *   ∂f/∂h = ccorr(r, t)
  *   ∂f/∂t = cconv(r, h) = ccorr(inv(r), h),  inv(r) = [r₀, r_{d−1}, …, r₁]
  * so every gradient runs through the same codegen'd
  * [[graft.functions.CircularCorrelation]] expression as scoring — no
  * new kernels, O(d²) per row, exact dyadic arithmetic.
  *
  * Same scale shape as the sibling trainers: id-keyed embedding frames,
  * epoch = join + map + explode + groupBy(id) mean-gradient, update
  * join, localCheckpoint lineage truncation.
  */
object HolETrainer {

  val D = 8
  val Margin = 1.0
  val Lr = 0.1
  val Epochs = 3

  private def initVec(kind: String, id: Column): Column =
    array((0 until D).map(i => PortableHash.dyadic(
      concat_ws("|", lit(kind), id.cast("string"), lit(i.toString)))): _*)

  /** Circular index involution: inv(a) = [a₀, a_{d−1}, a_{d−2}, …, a₁]. */
  private def inv(a: Column): Column =
    concat(slice(a, 1, 1), reverse(slice(a, 2, D - 1)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), (acc, v) => acc + v)

  /** Returns (epoch, loss) rows; loss decreases over the first epochs. */
  def train(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared deterministic minibatch (TrainData): reference-shaped
    // minibatch training, one build for all trainer entries
    val x = TrainData.minibatch(spark, dir)

    var ent = x.select(explode(array(col("sid"), col("oid"), col("nid"))).as("id"))
      .distinct().withColumn("vec", initVec("HE", col("id"))).localCheckpoint()
    var rel = x.select(col("pid").as("id")).distinct()
      .withColumn("vec", initVec("HR", col("id"))).localCheckpoint()

    def joined: DataFrame =
      x.join(ent.select(col("id").as("sid"), col("vec").as("h")), "sid")
        .join(ent.select(col("id").as("oid"), col("vec").as("t")), "oid")
        .join(ent.select(col("id").as("nid"), col("vec").as("tn")), "nid")
        .join(broadcast(rel.select(col("id").as("pid"), col("vec").as("r"))), "pid")

    def fPos: Column = dot(col("r"), ccorr(col("h"), col("t")))
    def fNeg: Column = dot(col("r"), ccorr(col("h"), col("tn")))

    def lossOf(df: DataFrame): Double =
      df.select(greatest(lit(0.0), lit(Margin) + fNeg - fPos).as("l"))
        .agg(Exact.decSum(col("l"))).head().getDouble(0)

    val losses = Seq.newBuilder[(Int, Double)]
    for (epoch <- 1 to Epochs) {
      val j = joined.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      losses += ((epoch - 1, lossOf(j)))
      // hinge active ⇒ ∂L = ∂f(neg) − ∂f(pos):
      //   ∂L/∂h = ccorr(r, tn) − ccorr(r, t)
      //   ∂L/∂r = ccorr(h, tn) − ccorr(h, t)
      //   ∂L/∂t = −ccorr(inv(r), h); ∂L/∂tn = +ccorr(inv(r), h)
      val gradRows = j
        .filter((lit(Margin) + fNeg - fPos) > 0)
        .withColumn("rinv", inv(col("r")))
        .select(col("sid"), col("pid"), col("oid"), col("nid"),
          zip_with(ccorr(col("r"), col("tn")), ccorr(col("r"), col("t")),
            _ - _).as("gh"),
          zip_with(ccorr(col("h"), col("tn")), ccorr(col("h"), col("t")),
            _ - _).as("gr"),
          transform(ccorr(col("rinv"), col("h")), v => -v).as("gt"),
          ccorr(col("rinv"), col("h")).as("gn"))
        .select(explode(array(
          struct(col("sid").as("id"), lit("e").as("kind"), col("gh").as("g")),
          struct(col("oid").as("id"), lit("e").as("kind"), col("gt").as("g")),
          struct(col("nid").as("id"), lit("e").as("kind"), col("gn").as("g")),
          struct(col("pid").as("id"), lit("r").as("kind"), col("gr").as("g")))).as("c"))
        .select(col("c.id").as("id"), col("c.kind").as("kind"), col("c.g").as("g"))
      val dimAggs = (0 until D).map(i =>
        Exact.decAvg(element_at(col("g"), i + 1), 9).as(s"_g$i"))
      val grads = gradRows.groupBy("kind", "id")
        .agg(dimAggs.head, dimAggs.tail: _*)
        .select(col("kind"), col("id"),
          array((0 until D).map(i => col(s"_g$i")): _*).as("gvec"))

      def applyGrad(f: DataFrame, kind: String): DataFrame =
        f.join(grads.filter(col("kind") === kind).select(col("id"), col("gvec")),
            Seq("id"), "left")
          .select(col("id"), when(col("gvec").isNull, col("vec"))
            .otherwise(zip_with(col("vec"), col("gvec"),
              (v, g) => v - lit(Lr) * g)).as("vec"))

      ent = applyGrad(ent, "e").localCheckpoint()
      rel = applyGrad(rel, "r").localCheckpoint()
      j.unpersist()
    }
    losses += ((Epochs, lossOf(joined)))
    losses.result().toDF("epoch", "loss")
  }
}
