package graft.tensor

/** Tiny dense linear algebra for the R×R (here R = 4) driver-side
  * matrices of the ALS solvers. Everything data-scale stays distributed;
  * only rank-sized Gram matrices ever reach the driver (SURVEY §5).
  *
  * Every formula is written ONCE over an abstract [[Field]] and
  * instantiated twice: over `Double` (the driver computation whose
  * results Spark embeds as literals) and over SQL-fragment `String`s
  * (the DuckDB oracle). Both instances therefore perform the SAME
  * correctly-rounded IEEE-754 operations in the SAME literal order, so
  * given bit-identical inputs (which the quantized/dyadic distributed
  * aggregations guarantee) the two engines produce bit-identical
  * results — the adjugate inverse is oracle-checkable by construction,
  * which a pivoting Gauss-Jordan never was (round-5 VERDICT item 1).
  */
object SmallLinalg {

  /** Abstract correctly-rounded arithmetic. Laws relied on: every op maps
    * to exactly one IEEE-754 binary64 operation (no fusing, no
    * reassociation) in both instances.
    */
  trait Field[T] {
    def add(a: T, b: T): T
    def sub(a: T, b: T): T
    def mul(a: T, b: T): T
    def div(a: T, b: T): T
    def lit(d: Double): T
  }

  /** Driver instance. The JVM never contracts a*b±c into an FMA
    * (JLS 15.17.1 requires the separately-rounded product), matching the
    * SQL instance op for op.
    */
  implicit object DoubleField extends Field[Double] {
    def add(a: Double, b: Double): Double = a + b
    def sub(a: Double, b: Double): Double = a - b
    def mul(a: Double, b: Double): Double = a * b
    def div(a: Double, b: Double): Double = a / b
    def lit(d: Double): Double = d
  }

  /** DuckDB-fragment instance: every op fully parenthesized so the
    * parser cannot reassociate; literals via `Double.toString` (shortest
    * round-trip form — parses back to the identical binary64).
    */
  object SqlField extends Field[String] {
    def add(a: String, b: String): String = s"($a + $b)"
    def sub(a: String, b: String): String = s"($a - $b)"
    def mul(a: String, b: String): String = s"($a * $b)"
    def div(a: String, b: String): String = s"($a / $b)"
    def lit(d: Double): String = d.toString
  }

  type Mat[T] = Vector[Vector[T]]

  def mat[T](n: Int, m: Int)(f: (Int, Int) => T): Mat[T] =
    Vector.tabulate(n, m)(f)

  /** Product entry (i,j) = Σ_k x(i)(k)·y(k)(j), summed left-to-right
    * with `reduce` (no 0.0 seed — a seed would rewrite a leading -0.0).
    */
  def matmul[T](x: Mat[T], y: Mat[T])(implicit F: Field[T]): Mat[T] =
    mat(x.length, y(0).length)((i, j) =>
      (0 until y.length).map(k => F.mul(x(i)(k), y(k)(j))).reduce(F.add))

  /** Elementwise x∘y with `ridge` added on the diagonal (the ALS normal
    * equations' numerical-safety term, applied AFTER the product so the
    * oracle can mirror it as one `+`).
    */
  def hadamardRidge[T](x: Mat[T], y: Mat[T], ridge: Double)
      (implicit F: Field[T]): Mat[T] =
    mat(x.length, x(0).length) { (i, j) =>
      val p = F.mul(x(i)(j), y(i)(j))
      if (i == j) F.add(p, F.lit(ridge)) else p
    }

  /** x with `ridge` added on the diagonal. */
  def addRidge[T](x: Mat[T], ridge: Double)(implicit F: Field[T]): Mat[T] =
    mat(x.length, x(0).length)((i, j) =>
      if (i == j) F.add(x(i)(j), F.lit(ridge)) else x(i)(j))

  /** 3×3 minor determinant over rows `rs` and columns `cs` of `m`,
    * cofactor-expanded along its first row in literal order:
    * (t0 − t1) + t2.
    */
  private def det3[T](m: Mat[T], rs: Vector[Int], cs: Vector[Int])
      (implicit F: Field[T]): T = {
    import F._
    def e(i: Int, j: Int): T = m(rs(i))(cs(j))
    val t0 = mul(e(0, 0), sub(mul(e(1, 1), e(2, 2)), mul(e(1, 2), e(2, 1))))
    val t1 = mul(e(0, 1), sub(mul(e(1, 0), e(2, 2)), mul(e(1, 2), e(2, 0))))
    val t2 = mul(e(0, 2), sub(mul(e(1, 0), e(2, 1)), mul(e(1, 1), e(2, 0))))
    add(sub(t0, t1), t2)
  }

  private val idx4 = Vector(0, 1, 2, 3)

  /** 4×4 determinant, cofactor expansion along row 0 in literal order:
    * ((t0 − t1) + t2) − t3.
    */
  def det4[T](m: Mat[T])(implicit F: Field[T]): T = {
    val t = idx4.map(j => F.mul(m(0)(j), det3(m, Vector(1, 2, 3), idx4.filterNot(_ == j))))
    F.sub(F.add(F.sub(t(0), t(1)), t(2)), t(3))
  }

  /** 4×4 inverse by the adjugate: inv(i)(j) = cof(j)(i) / det, with
    * cof(j)(i) = (−1)^{i+j} · minor(row j, col i) and odd signs applied
    * as (0.0 − minor) — one subtraction, identical in both instances.
    * Callers ridge the input themselves ([[hadamardRidge]]/[[addRidge]]);
    * ALS gram-product matrices are symmetric positive definite after the
    * ridge, so the adjugate form is numerically safe at R = 4.
    */
  def inv4[T](m: Mat[T])(implicit F: Field[T]): Mat[T] = {
    val d = det4(m)
    mat(4, 4) { (i, j) =>
      val minor = det3(m, idx4.filterNot(_ == j), idx4.filterNot(_ == i))
      val cof = if ((i + j) % 2 == 0) minor else F.sub(F.lit(0.0), minor)
      F.div(cof, d)
    }
  }

  /** Σ_{r,s} x(r,s)·y(r,s)·z(r,s) — the ‖reconstruction‖² contraction
    * (driver-only; feeds the tolerance-checked fit, not an oracle).
    */
  def tripleDot(x: Mat[Double], y: Mat[Double], z: Mat[Double]): Double = {
    var s = 0.0
    for (r <- x.indices; c <- x(0).indices) s += x(r)(c) * y(r)(c) * z(r)(c)
    s
  }
}
