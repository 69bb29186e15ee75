package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Fuzzy-join guarantees beyond the oracle: precision is exact by
  * construction (every emitted pair's distance verified), and the
  * emitted set equals its machine-checked characterization — exactly
  * the true pairs (brute-force edit distance ≤ τ over all distinct
  * names) whose blocking conditions hold — so the recall trade of the
  * q-gram blocking is MEASURED, not hoped.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def grams(s: String): Set[String] =
    if (s.length < FuzzyJoin.Q) Set.empty
    else (0 to s.length - FuzzyJoin.Q).map(i => s.substring(i, i + FuzzyJoin.Q)).toSet

  test("emitted pairs equal the blocked characterization of the brute truth") {
    val got = FuzzyJoin.fuzzyPairs(spark, TestSpark.sf)
      .as[(String, String, Int)].collect().toSet
    val names = Tables.part(spark, TestSpark.sf)
      .select("p_name").distinct().as[String].collect().sorted

    // gram occupancy for the cap (cap counts (name, gram) rows per gram)
    val gramCnt = names.flatMap(n => grams(n).toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    def live(g: String) = gramCnt(g) <= FuzzyJoin.GramCap

    val brute = for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i), names(j)) if d <= FuzzyJoin.FuzzyTau
    } yield (names(i), names(j), d)
    val expected = brute.filter { case (a, b, _) =>
      math.abs(a.length - b.length) <= FuzzyJoin.FuzzyTau &&
        grams(a).intersect(grams(b)).exists(live)
    }.toSet

    assert(got == expected, "blocked result vs characterization")
    // the trade is measured: report how much of the brute truth survives
    val recall = if (brute.isEmpty) 1.0 else expected.size.toDouble / brute.size
    info(f"blocking recall vs brute truth: $recall%.3f (${expected.size}/${brute.size})")
    assert(got.forall(_._3 <= FuzzyJoin.FuzzyTau))
  }
}
