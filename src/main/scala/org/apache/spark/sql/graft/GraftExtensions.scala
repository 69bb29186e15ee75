// Hosted under org.apache.spark.sql for the same reason as
// CircularCorrelation: FunctionBuilder / FunctionIdentifier plumbing is
// private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension wiring for graft's custom Catalyst expressions.
  *
  * Enable with
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), after which plain SQL can
  * call the expressions, e.g.
  * `spark.sql("SELECT ccorr(h, t) FROM embeddings_pairs")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name), new ExpressionInfo(cls, name), builder))
    }
}

object GraftExtensions {
  private type Builder =
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression

  private def b2(name: String)(
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Builder = { ch =>
    require(ch.length == 2, s"$name takes exactly 2 array<double> arguments")
    f(ch(0), ch(1))
  }

  private def b3(name: String)(
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Builder = { ch =>
    require(ch.length == 3, s"$name takes exactly 3 array<double> arguments")
    f(ch(0), ch(1), ch(2))
  }

  private val builders: Seq[(String, String, Builder)] = Seq(
    ("ccorr", classOf[CircularCorrelation].getName,
      b2("ccorr")(CircularCorrelation.apply)),
    ("cconv", classOf[CircularConvolution].getName,
      b2("cconv")(CircularConvolution.apply)),
    ("dotp", classOf[DotProduct].getName, b2("dotp")(DotProduct.apply)),
    ("sqdiff_sum", classOf[SqDiffSum].getName, b2("sqdiff_sum")(SqDiffSum.apply)),
    ("absdiff_sum", classOf[AbsDiffSum].getName, b2("absdiff_sum")(AbsDiffSum.apply)),
    ("dot3", classOf[Dot3].getName, b3("dot3")(Dot3.apply)),
    ("transe_sq", classOf[TranseSqSum].getName, b3("transe_sq")(TranseSqSum.apply)),
    ("bilinear", classOf[Bilinear].getName, b3("bilinear")(Bilinear.apply)))

  /** Runtime registration on an already-built session (the extensions
    * class covers the `spark.sql.extensions` config path).
    */
  def register(spark: org.apache.spark.sql.classic.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
