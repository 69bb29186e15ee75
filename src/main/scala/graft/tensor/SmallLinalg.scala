package graft.tensor

/** Tiny dense linear algebra for the R×R (R ≤ 64) driver-side matrices of
  * the ALS trainers. Everything data-scale stays distributed; only
  * rank-sized Gram matrices ever reach the driver (SURVEY §5).
  */
object SmallLinalg {

  /** Gauss-Jordan inverse with partial pivoting + tiny ridge for
    * numerical safety (ALS normal equations can be near-singular).
    */
  def inv(m0: Array[Array[Double]], ridge: Double = 1e-9): Array[Array[Double]] = {
    val n = m0.length
    val a = Array.tabulate(n, n)((i, j) => m0(i)(j) + (if (i == j) ridge else 0.0))
    val b = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tmpB = b(col); b(col) = b(piv); b(piv) = tmpB
      val d = a(col)(col)
      for (j <- 0 until n) { a(col)(j) /= d; b(col)(j) /= d }
      for (r <- 0 until n if r != col) {
        val f = a(r)(col)
        if (f != 0.0) for (j <- 0 until n) {
          a(r)(j) -= f * a(col)(j); b(r)(j) -= f * b(col)(j)
        }
      }
    }
    b
  }

  def matmul(x: Array[Array[Double]], y: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(x.length, y(0).length)((i, j) =>
      (0 until y.length).map(k => x(i)(k) * y(k)(j)).sum)

  def hadamard(x: Array[Array[Double]], y: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(x.length, x(0).length)((i, j) => x(i)(j) * y(i)(j))

  def transpose(x: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(x(0).length, x.length)((i, j) => x(j)(i))

  /** Σ_{r,s} x(r,s)·y(r,s)·z(r,s) — the ||reconstruction||² contraction. */
  def tripleDot(x: Array[Array[Double]], y: Array[Array[Double]], z: Array[Array[Double]]): Double = {
    var s = 0.0
    for (r <- x.indices; c <- x(0).indices) s += x(r)(c) * y(r)(c) * z(r)(c)
    s
  }
}
