// Hosted under org.apache.spark.sql for the same reason as
// CircularCorrelation: Expression plumbing is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd vector folds.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * are CodegenFallback: every per-element lambda call goes through the
  * interpreter, and each zip_with materializes an intermediate array —
  * measured 3-10× overhead on the scoring/ANN hot paths. These
  * expressions evaluate the same math as ONE fused whole-stage-codegen
  * loop with zero allocations.
  *
  * Exactness contract (SURVEY §4): accumulation is SEQUENTIAL in index
  * order and each per-index term uses the identical IEEE operation tree
  * as the zip_with formulation it replaces, so results are bit-identical
  * to the HOF versions and to the DuckDB `list_reduce` oracles.
  */
abstract class BinaryVecFold extends BinaryExpression with ExpectsInputTypes {
  /** Java source for the per-index term; `x`/`y` are double expressions. */
  protected def termJava(x: String, y: String): String
  protected def termEval(x: Double, y: Double): Double

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += termEval(a.getDouble(i), b.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${termJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ_i a_i · b_i  (replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`). */
case class DotProduct(left: Expression, right: Expression) extends BinaryVecFold {
  override def prettyName: String = "dotp"
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def termEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Σ_i (a_i − b_i)²  (squared L2 distance). */
case class SqDiffSum(left: Expression, right: Expression) extends BinaryVecFold {
  override def prettyName: String = "sqdiff_sum"
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def termEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDiffSum =
    copy(left = l, right = r)
}

/** Σ_i |a_i − b_i|  (L1 distance). */
case class AbsDiffSum(left: Expression, right: Expression) extends BinaryVecFold {
  override def prettyName: String = "absdiff_sum"
  override protected def termJava(x: String, y: String): String =
    s"java.lang.Math.abs($x - $y)"
  override protected def termEval(x: Double, y: Double): Double = math.abs(x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AbsDiffSum =
    copy(left = l, right = r)
}

abstract class TernaryVecFold extends TernaryExpression with ExpectsInputTypes {
  protected def termJava(x: String, y: String, z: String): String
  protected def termEval(x: Double, y: Double, z: Double): Double

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, m: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = m.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), math.min(b.numElements(), c.numElements()))
    var s = 0.0
    var i = 0
    while (i < n) {
      s += termEval(a.getDouble(i), b.getDouble(i), c.getDouble(i)); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(),
         |  java.lang.Math.min($b.numElements(), $c.numElements()));
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${termJava(s"$a.getDouble($i)", s"$b.getDouble($i)", s"$c.getDouble($i)")};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ_i (a_i · b_i) · c_i — the DistMult trilinear form. */
case class Dot3(first: Expression, second: Expression, third: Expression)
  extends TernaryVecFold {
  override def prettyName: String = "dot3"
  override protected def termJava(x: String, y: String, z: String): String =
    s"($x * $y) * $z"
  override protected def termEval(x: Double, y: Double, z: Double): Double =
    (x * y) * z
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Dot3 =
    copy(first = f, second = s, third = t)
}

/** Σ_i ((h_i + r_i) − t_i)² — the TransE translation residual. */
case class TranseSqSum(first: Expression, second: Expression, third: Expression)
  extends TernaryVecFold {
  override def prettyName: String = "transe_sq"
  override protected def termJava(x: String, y: String, z: String): String =
    s"(($x + $y) - $z) * (($x + $y) - $z)"
  override protected def termEval(x: Double, y: Double, z: Double): Double =
    ((x + y) - z) * ((x + y) - z)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TranseSqSum =
    copy(first = f, second = s, third = t)
}

/** Bilinear form Σ_{a,b} (w[a·d + b] · h[a]) · t[b] with d = |h| — the
  * RESCAL score hᵀWt over a row-major flattened core slice. Replaces the
  * flatten(transform(array_repeat))/tile formulation: same ascending
  * flat-index IEEE sequence, none of the intermediate arrays.
  */
case class Bilinear(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bilinear"

  override protected def nullSafeEval(wAny: Any, hAny: Any, tAny: Any): Any = {
    val w = wAny.asInstanceOf[ArrayData]
    val h = hAny.asInstanceOf[ArrayData]
    val t = tAny.asInstanceOf[ArrayData]
    val d = h.numElements()
    var s = 0.0
    var a = 0
    while (a < d) {
      val ha = h.getDouble(a)
      var b = 0
      while (b < d) {
        s += (w.getDouble(a * d + b) * ha) * t.getDouble(b)
        b += 1
      }
      a += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, t) => {
      val d = ctx.freshName("d")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val ha = ctx.freshName("ha")
      s"""
         |final int $d = $h.numElements();
         |double $s = 0.0;
         |for (int $a = 0; $a < $d; $a++) {
         |  final double $ha = $h.getDouble($a);
         |  for (int $b = 0; $b < $d; $b++) {
         |    $s += ($w.getDouble($a * $d + $b) * $ha) * $t.getDouble($b);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Bilinear =
    copy(first = f, second = s, third = t)
}

/** Σ_i (v[start + i] − c[i])² for i in [0, |c|) — squared L2 between a
  * subvector of `v` (at integer offset `start`) and a codebook entry,
  * without materializing the `slice(v, …)` array. Product-quantization
  * encodes/LUT-builds call this |codebook| times per row; the slice
  * formulation allocated an 8-element array per call.
  */
case class SubVecSqDist(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType),
      org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "subvec_sqdist"

  override protected def nullSafeEval(vAny: Any, cAny: Any, sAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val c = cAny.asInstanceOf[ArrayData]
    val start = sAny.asInstanceOf[Int]
    var s = 0.0
    var i = 0
    val n = c.numElements()
    while (i < n) {
      val d = v.getDouble(start + i) - c.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, start) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $c.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $v.getDouble($start + $i) - $c.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SubVecSqDist =
    copy(first = f, second = s, third = t)
}

/** PQ encode: for each of the M subspaces of `v` (M = |codebook| /
  * (nCent·subDim)), the index of the nearest codebook centroid (ties →
  * smaller index, matching an `array_min` over (dist, idx) structs).
  * Codebook layout is flat row-major [m][c][i]; it arrives as ONE array
  * literal, so the generated code is two tight loops instead of
  * M·nCent unrolled fold calls — the unrolled form compiled to an
  * 8 KB+ `processNext` that HotSpot refuses to JIT (measured 2× slower
  * than interpreted HOFs; this form JITs fine).
  */
case class PqEncode(left: Expression, right: Expression, nCent: Int, subDim: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(vAny: Any, cbAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements() / (nCent * subDim)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < nCent) {
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getDouble(mi * subDim + i) - cb.getDouble((mi * nCent + c) * subDim + i)
          s += d * d
          i += 1
        }
        if (s < bestD) { bestD = s; bestC = c }
        c += 1
      }
      out(mi) = bestC
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val bd = ctx.freshName("bestD"); val bc = ctx.freshName("bestC")
      val out = ctx.freshName("out")
      s"""
         |final int $m = $cb.numElements() / ${nCent * subDim};
         |final int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $bd = Double.POSITIVE_INFINITY; int $bc = 0;
         |  for (int $c = 0; $c < $nCent; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      final double $d = $v.getDouble($mi * $subDim + $i)
         |        - $cb.getDouble(($mi * $nCent + $c) * $subDim + $i);
         |      $s += $d * $d;
         |    }
         |    if ($s < $bd) { $bd = $s; $bc = $c; }
         |  }
         |  $out[$mi] = $bc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** PQ distance look-up table: flat [m][c] array of squared L2 distances
  * from each subvector of `v` to each centroid (same layout/loops as
  * [[PqEncode]]).
  */
case class PqLut(left: Expression, right: Expression, nCent: Int, subDim: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(vAny: Any, cbAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = cb.numElements() / (nCent * subDim)
    val out = new Array[Double](m * nCent)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < nCent) {
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getDouble(mi * subDim + i) - cb.getDouble((mi * nCent + c) * subDim + i)
          s += d * d
          i += 1
        }
        out(mi * nCent + c) = s
        c += 1
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
         |final int $m = $cb.numElements() / ${nCent * subDim};
         |final double[] $out = new double[$m * $nCent];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $c = 0; $c < $nCent; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      final double $d = $v.getDouble($mi * $subDim + $i)
         |        - $cb.getDouble(($mi * $nCent + $c) * $subDim + $i);
         |      $s += $d * $d;
         |    }
         |    $out[$mi * $nCent + $c] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqLut =
    copy(left = l, right = r)
}

/** Asymmetric PQ distance Σ_m lut[m·nCent + codes[m]] — fixed ascending-m
  * order (matches the unrolled `element_at` sum and the SQL oracle).
  */
case class PqAdc(left: Expression, right: Expression, nCent: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    var s = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) { s += lut.getDouble(m * nCent + codes.getInt(m)); m += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $codes.numElements();
         |double $s = 0.0;
         |for (int $m = 0; $m < $n; $m++) {
         |  $s += $lut.getDouble($m * $nCent + $codes.getInt($m));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** RotatE quantized distance: Σ_i ⌊|h_i·r_i − t_i|·10¹² + ½⌋ as a LONG,
  * with h, t complex (split re/im arrays) and r_i the unit rotation
  * (c_i, s_i) PACKED as cs = [c_0..c_{d-1}, s_0..s_{d-1}] (d inferred as
  * cs.length/2). Per index the residual is the fixed IEEE tree
  * re = ((hr·c) − (hi·s)) − tr, im = ((hr·s) + (hi·c)) − ti,
  * |z| = sqrt((re·re) + (im·im)) — every op correctly rounded, so the
  * value is engine-identical — and the QUANTIZED terms sum as integers,
  * making the fold order-independent (the rotation coefficients are
  * non-dyadic, so a raw double sum would be partition-order-sensitive).
  * Bound: terms ≤ ~4.25·10¹², d=16 ⇒ Σ < 7·10¹³ ≪ 2⁵³.
  */
case class RotateDistQ(hr: Expression, hi: Expression, tr: Expression,
    ti: Expression, cs: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression
  with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(hr, hi, tr, ti, cs)
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(5)(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rotate_distq"

  override def nullSafeEval(hrA: Any, hiA: Any, trA: Any, tiA: Any,
      csA: Any): Any = {
    val ahr = hrA.asInstanceOf[ArrayData]; val ahi = hiA.asInstanceOf[ArrayData]
    val atr = trA.asInstanceOf[ArrayData]; val ati = tiA.asInstanceOf[ArrayData]
    val acs = csA.asInstanceOf[ArrayData]
    val d = acs.numElements() / 2
    val n = math.min(d, math.min(
      math.min(ahr.numElements(), ahi.numElements()),
      math.min(atr.numElements(), ati.numElements())))
    var q = 0L
    var i = 0
    while (i < n) {
      val c = acs.getDouble(i); val s = acs.getDouble(d + i)
      val re = ((ahr.getDouble(i) * c) - (ahi.getDouble(i) * s)) - atr.getDouble(i)
      val im = ((ahr.getDouble(i) * s) + (ahi.getDouble(i) * c)) - ati.getDouble(i)
      q += math.floor(math.sqrt((re * re) + (im * im)) * 1e12 + 0.5).toLong
      i += 1
    }
    q
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hrA, hiA, trA, tiA, csA) => {
      val d = ctx.freshName("d"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val q = ctx.freshName("q")
      val c = ctx.freshName("c"); val s = ctx.freshName("s")
      val re = ctx.freshName("re"); val im = ctx.freshName("im")
      s"""
         |final int $d = $csA.numElements() / 2;
         |final int $n = java.lang.Math.min($d, java.lang.Math.min(
         |  java.lang.Math.min($hrA.numElements(), $hiA.numElements()),
         |  java.lang.Math.min($trA.numElements(), $tiA.numElements())));
         |long $q = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $c = $csA.getDouble($i);
         |  final double $s = $csA.getDouble($d + $i);
         |  final double $re = (($hrA.getDouble($i) * $c) - ($hiA.getDouble($i) * $s)) - $trA.getDouble($i);
         |  final double $im = (($hrA.getDouble($i) * $s) + ($hiA.getDouble($i) * $c)) - $tiA.getDouble($i);
         |  $q += (long) java.lang.Math.floor(java.lang.Math.sqrt(($re * $re) + ($im * $im)) * 1.0E12 + 0.5);
         |}
         |${ev.value} = $q;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RotateDistQ =
    copy(hr = newChildren(0), hi = newChildren(1), tr = newChildren(2),
      ti = newChildren(3), cs = newChildren(4))
}

/** TransH quantized distance: the whole hyperplane-projection score in
  * ONE fused loop — Σ_i ⌊u_i²·10¹² + ½⌋ as a LONG where
  * u_i = (h_i − a·w_i + r_i) − (t_i − b·w_i) and a = wᵀh, b = wᵀt are
  * themselves accumulated as scale-12 quantized integer sums in a first
  * pass over the same arrays (w is unit-normalized ⇒ non-dyadic, so raw
  * double dot products would be fold-order-sensitive; the quantized
  * form is order-free and engine-identical, and the oracle can use a
  * plain SUM). Literal IEEE tree per element, both passes fused, no
  * intermediate arrays. Bounds: |a|,|b| ≤ √d·0.79 ≈ 3.2, |u| ≤ ~8.6,
  * u²·10¹² ≤ 7.4·10¹³ ≪ 2⁵³; Σ over d=16 ≪ 2⁶³.
  */
case class TransHDistQ(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(4)(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "transh_distq"

  override def nullSafeEval(hA: Any, tA: Any, rA: Any, wA: Any): Any = {
    val ah = hA.asInstanceOf[ArrayData]; val at = tA.asInstanceOf[ArrayData]
    val ar = rA.asInstanceOf[ArrayData]; val aw = wA.asInstanceOf[ArrayData]
    val n = math.min(math.min(ah.numElements(), at.numElements()),
      math.min(ar.numElements(), aw.numElements()))
    var aq = 0L; var bq = 0L
    var i = 0
    while (i < n) {
      aq += math.floor((aw.getDouble(i) * ah.getDouble(i)) * 1e12 + 0.5).toLong
      bq += math.floor((aw.getDouble(i) * at.getDouble(i)) * 1e12 + 0.5).toLong
      i += 1
    }
    val a = aq.toDouble / 1e12; val b = bq.toDouble / 1e12
    var q = 0L
    i = 0
    while (i < n) {
      val u = ((ah.getDouble(i) - (a * aw.getDouble(i))) + ar.getDouble(i)) -
        (at.getDouble(i) - (b * aw.getDouble(i)))
      q += math.floor((u * u) * 1e12 + 0.5).toLong
      i += 1
    }
    q
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hA, tA, rA, wA) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val aq = ctx.freshName("aq"); val bq = ctx.freshName("bq")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val q = ctx.freshName("q"); val u = ctx.freshName("u")
      s"""
         |final int $n = java.lang.Math.min(
         |  java.lang.Math.min($hA.numElements(), $tA.numElements()),
         |  java.lang.Math.min($rA.numElements(), $wA.numElements()));
         |long $aq = 0L; long $bq = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $aq += (long) java.lang.Math.floor(($wA.getDouble($i) * $hA.getDouble($i)) * 1.0E12 + 0.5);
         |  $bq += (long) java.lang.Math.floor(($wA.getDouble($i) * $tA.getDouble($i)) * 1.0E12 + 0.5);
         |}
         |final double $a = ((double) $aq) / 1.0E12;
         |final double $b = ((double) $bq) / 1.0E12;
         |long $q = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $u = (($hA.getDouble($i) - ($a * $wA.getDouble($i))) + $rA.getDouble($i))
         |    - ($tA.getDouble($i) - ($b * $wA.getDouble($i)));
         |  $q += (long) java.lang.Math.floor(($u * $u) * 1.0E12 + 0.5);
         |}
         |${ev.value} = $q;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): TransHDistQ =
    copy(first = f, second = s, third = t, fourth = q)
}

object VectorFolds {
  private def c(e: Expression): Column = ExpressionUtils.column(e)
  private def e(col: Column): Expression = ExpressionUtils.expression(col)

  /** Σ a·b */
  def dotp(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  /** Σ a² */
  def sumSq(a: Column): Column = c(DotProduct(e(a), e(a)))
  /** Σ (a−b)² */
  def sqDiffSum(a: Column, b: Column): Column = c(SqDiffSum(e(a), e(b)))
  /** Σ |a−b| */
  def absDiffSum(a: Column, b: Column): Column = c(AbsDiffSum(e(a), e(b)))
  /** Σ (a·b)·c */
  def dot3(a: Column, b: Column, cc: Column): Column = c(Dot3(e(a), e(b), e(cc)))
  /** Σ ((h+r)−t)² */
  def transeSqSum(h: Column, r: Column, t: Column): Column =
    c(TranseSqSum(e(h), e(r), e(t)))
  /** hᵀWt, W row-major flat d×d */
  def bilinear(w: Column, h: Column, t: Column): Column =
    c(Bilinear(e(w), e(h), e(t)))
  /** Σ (v[start+i] − cent[i])² without slicing v */
  def subVecSqDist(v: Column, cent: Column, start: Column): Column =
    c(SubVecSqDist(e(v), e(cent), e(start)))
  /** PQ codes of v against a flat [m][c][i] codebook */
  def pqEncode(v: Column, codebook: Column, nCent: Int, subDim: Int): Column =
    c(PqEncode(e(v), e(codebook), nCent, subDim))
  /** PQ query LUT (flat [m][c]) of v against the codebook */
  def pqLut(v: Column, codebook: Column, nCent: Int, subDim: Int): Column =
    c(PqLut(e(v), e(codebook), nCent, subDim))
  /** asymmetric PQ distance from a flat LUT + codes */
  def pqAdc(lut: Column, codes: Column, nCent: Int): Column =
    c(PqAdc(e(lut), e(codes), nCent))
  /** RotatE quantized L1-of-modulus distance (scale 1e12, LONG) */
  def rotateDistQ(hr: Column, hi: Column, tr: Column, ti: Column,
      cs: Column): Column =
    c(RotateDistQ(e(hr), e(hi), e(tr), e(ti), e(cs)))
  /** TransH quantized hyperplane-projection distance (scale 1e12, LONG) */
  def transHDistQ(h: Column, t: Column, r: Column, w: Column): Column =
    c(TransHDistQ(e(h), e(t), e(r), e(w)))
}
