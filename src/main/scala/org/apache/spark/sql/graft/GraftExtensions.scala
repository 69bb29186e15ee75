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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ccorr"),
      new ExpressionInfo(classOf[CircularCorrelation].getName, "ccorr"),
      GraftExtensions.ccorrBuilder))
  }
}

object GraftExtensions {
  private val ccorrBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { children =>
    require(children.length == 2,
      "ccorr(h, t) takes exactly 2 array<double> arguments")
    CircularCorrelation(children(0), children(1))
  }

  /** Runtime registration on an already-built session (the extensions
    * class covers the `spark.sql.extensions` config path).
    */
  def register(spark: org.apache.spark.sql.classic.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ccorr", ccorrBuilder, "built-in")
}
