package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("ccorr is callable from plain SQL after registration") {
    val spark = TestSpark.spark
    org.apache.spark.sql.graft.GraftExtensions.register(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val got = spark.sql(
      "SELECT ccorr(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS c")
      .head().getSeq[Double](0)
    assert(got == Seq(1 * 4.0 + 2 * 5 + 3 * 6, 1 * 5.0 + 2 * 6 + 3 * 4, 1 * 6.0 + 2 * 4 + 3 * 5))
  }

  test("cconv is callable from SQL and matches the O(d²) definition") {
    val spark = TestSpark.spark
    org.apache.spark.sql.graft.GraftExtensions.register(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val got = spark.sql(
      "SELECT cconv(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS c")
      .head().getSeq[Double](0)
    // cconv(a,b)[k] = Σ_i a[i]·b[(k−i) mod 3]
    assert(got == Seq(1 * 4.0 + 2 * 6 + 3 * 5, 1 * 5.0 + 2 * 4 + 3 * 6, 1 * 6.0 + 2 * 5 + 3 * 4))
  }

  test("embed normalize: unit rows, ball rows bounded, normless1 semantics") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = graft.kge.Scoring.embedNormalize(spark, TestSpark.sf)
      .groupBy("id").agg(
        sum(col("x_unit") * col("x_unit")).as("unit_nsq"),
        sum(col("x_ball") * col("x_ball")).as("ball_nsq"),
        first("norm").as("norm"))
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, unitNsq, ballNsq, norm) =>
      assert(math.abs(unitNsq - 1.0) < 1e-9, s"unit norm² $unitNsq")
      assert(ballNsq <= 1.0 + 1e-9, s"ball norm² $ballNsq")
      // normless1 leaves rows with norm² < 1 untouched ⇒ ball norm² = norm²
      if (norm * norm < 1.0) assert(math.abs(ballNsq - norm * norm) < 1e-9)
    }
  }

  test("native vector folds are bit-identical to the HOF formulations") {
    // The exactness contract (SURVEY §4): VectorFolds must produce the
    // same sequential IEEE sequence as aggregate/zip_with, on adversarial
    // NON-dyadic doubles where any reordering would change the result.
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val vf = graft.functions.VectorFolds
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(16)(rnd.nextDouble() * 2e3 - 1e3),
      Array.fill(16)(rnd.nextDouble() * 2e-3),
      Array.fill(16)(rnd.nextDouble() * 2e6 - 1e6)))
    val df = rows.toDF("a", "b", "c").select(
      col("a").cast("array<double>").as("a"),
      col("b").cast("array<double>").as("b"),
      col("c").cast("array<double>").as("c"))
    def fold(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val checks = df.select(
      (vf.dotp(col("a"), col("b")) ===
        fold(zip_with(col("a"), col("b"), _ * _))).as("dot"),
      (vf.sumSq(col("a")) === fold(transform(col("a"), x => x * x))).as("sumsq"),
      (vf.sqDiffSum(col("a"), col("c")) ===
        fold(zip_with(col("a"), col("c"), (x, y) => (x - y) * (x - y)))).as("sqd"),
      (vf.absDiffSum(col("a"), col("c")) ===
        fold(zip_with(col("a"), col("c"), (x, y) => abs(x - y)))).as("absd"),
      (vf.dot3(col("a"), col("b"), col("c")) ===
        fold(zip_with(zip_with(col("a"), col("b"), _ * _), col("c"), _ * _))).as("dot3"),
      (vf.transeSqSum(col("a"), col("b"), col("c")) ===
        fold(zip_with(zip_with(col("a"), col("b"), _ + _), col("c"),
          (hr, tt) => (hr - tt) * (hr - tt)))).as("transe"),
      (vf.subVecSqDist(col("a"), slice(col("c"), 9, 8), lit(8)) ===
        fold(zip_with(slice(col("a"), 9, 8), slice(col("c"), 9, 8),
          (x, y) => (x - y) * (x - y)))).as("subvec"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    checks.foreach { t =>
      assert(t == ((true, true, true, true, true, true, true)), t)
    }
  }

  test("bilinear equals the flatten/tile zip_with contraction bit-for-bit") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val vf = graft.functions.VectorFolds
    val rnd = new scala.util.Random(11)
    val d = 8
    val rows = Seq.fill(20)((
      Array.fill(d * d)(rnd.nextDouble() * 2 - 1),
      Array.fill(d)(rnd.nextDouble() * 2 - 1),
      Array.fill(d)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("w", "h", "t")
    def fold(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val hRep = flatten(transform(col("h"), x => array_repeat(x, d)))
    val tTile = flatten(array_repeat(col("t"), d))
    val ok = df.select((vf.bilinear(col("w"), col("h"), col("t")) ===
        fold(zip_with(zip_with(col("w"), hRep, _ * _), tTile, _ * _))).as("ok"))
      .as[Boolean].collect()
    assert(ok.forall(identity))
  }

  test("pq encode/lut/adc match the unrolled slice-and-argmin formulation") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val vf = graft.functions.VectorFolds
    val rnd = new scala.util.Random(13)
    val (m, nc, sd) = (4, 4, 4)
    val cb = Array.fill(m * nc * sd)(rnd.nextDouble() * 2 - 1)
    val rows = Seq.fill(30)(Array.fill(m * sd)(rnd.nextDouble() * 2 - 1))
    val df = rows.map(Tuple1(_)).toDF("v")
    def subDist(mi: Int, c: Int) = {
      val cent = array((0 until sd).map(i => lit(cb((mi * nc + c) * sd + i))): _*)
      aggregate(zip_with(slice(col("v"), mi * sd + 1, sd), cent,
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    }
    val refCodes = array((0 until m).map(mi =>
      array_min(array((0 until nc).map(c =>
        struct(subDist(mi, c).as("d"), lit(c).as("c"))): _*)).getField("c")): _*)
    val refLutFlat = array((0 until m).flatMap(mi =>
      (0 until nc).map(c => subDist(mi, c))): _*)
    val got = df.select(
      (vf.pqEncode(col("v"), lit(cb), nc, sd) === refCodes).as("codes_ok"),
      (vf.pqLut(col("v"), lit(cb), nc, sd) === refLutFlat).as("lut_ok"),
      (vf.pqAdc(vf.pqLut(col("v"), lit(cb), nc, sd),
        vf.pqEncode(col("v"), lit(cb), nc, sd), nc) ===
        (0 until m).map(mi => element_at(vf.pqLut(col("v"), lit(cb), nc, sd),
          lit(mi * nc) + element_at(vf.pqEncode(col("v"), lit(cb), nc, sd), mi + 1) + 1))
          .reduce(_ + _)).as("adc_ok"))
      .as[(Boolean, Boolean, Boolean)].collect()
    got.foreach(t => assert(t == ((true, true, true)), t))
  }
}
