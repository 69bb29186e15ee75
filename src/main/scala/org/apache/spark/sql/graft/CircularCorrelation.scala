// Hosted under org.apache.spark.sql because a native Catalyst Expression
// needs `private[sql]` API (AbstractDataType, ExpressionUtils.column) that
// Spark does not expose publicly; graft code imports it via the
// `graft.functions.CircularCorrelation` alias.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Circular correlation `ccorr(h, t)[k] = Σ_i h[i] * t[(i+k) mod d]` — the
  * compositional operator of HolE (holographic embeddings).
  *
  * Reference semantics: python/sansa/ml/kbc/keras/holek.py:135-151
  * (`ccorr1d` via FFT) and kge/hole.py's HolE model. The reference computes
  * it with single-node FFT; graft evaluates the O(d²) definition directly
  * inside whole-stage codegen — for KGE dims (d ≤ a few hundred) the dense
  * loop beats an FFT's constant factor, stays exact for dyadic inputs
  * (no complex-number rounding), and distributes for free because it is a
  * per-row scalar expression.
  */
case class CircularCorrelation(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "ccorr"

  override protected def nullSafeEval(h: Any, t: Any): Any = {
    val ha = h.asInstanceOf[ArrayData]
    val ta = t.asInstanceOf[ArrayData]
    val d = ha.numElements()
    val out = new Array[Double](d)
    var k = 0
    while (k < d) {
      var s = 0.0
      var i = 0
      while (i < d) {
        s += ha.getDouble(i) * ta.getDouble((i + k) % d)
        i += 1
      }
      out(k) = s
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, t) => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      s"""
         |final int $d = $h.numElements();
         |final double[] $arr = new double[$d];
         |for (int $k = 0; $k < $d; $k++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $s += $h.getDouble($i) * $t.getDouble(($i + $k) % $d);
         |  }
         |  $arr[$k] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CircularCorrelation =
    copy(left = newLeft, right = newRight)
}

object CircularCorrelation {
  /** Column-level entry point: `ccorr(h, t)` as an array<double> column. */
  def ccorr(h: Column, t: Column): Column =
    ExpressionUtils.column(CircularCorrelation(
      ExpressionUtils.expression(h), ExpressionUtils.expression(t)))

  /** Column-level entry point: `cconv(a, b)`. */
  def cconv(a: Column, b: Column): Column =
    ExpressionUtils.column(CircularConvolution(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Circular convolution `cconv(a, b)[k] = Σ_i a[i] * b[(k − i) mod d]` —
  * ccorr's sibling (the reference pairs them: cconv is HolE's adjoint
  * operation, used in the gradient w.r.t. the tail entity).
  *
  * Reference semantics: python/sansa/ml/kbc/keras/util.py:8-27 (`cconv`
  * via FFT). Same O(d²)-in-codegen rationale as [[CircularCorrelation]].
  */
case class CircularConvolution(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "cconv"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val ba = b.asInstanceOf[ArrayData]
    val d = aa.numElements()
    val out = new Array[Double](d)
    var k = 0
    while (k < d) {
      var s = 0.0
      var i = 0
      while (i < d) {
        s += aa.getDouble(i) * ba.getDouble(((k - i) % d + d) % d)
        i += 1
      }
      out(k) = s
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      s"""
         |final int $d = $a.numElements();
         |final double[] $arr = new double[$d];
         |for (int $k = 0; $k < $d; $k++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble((($k - $i) % $d + $d) % $d);
         |  }
         |  $arr[$k] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CircularConvolution =
    copy(left = newLeft, right = newRight)
}
