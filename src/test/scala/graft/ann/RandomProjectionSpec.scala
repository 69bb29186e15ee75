package graft.ann

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class RandomProjectionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("projection: bit-exact vs a driver fold, JL norm estimator " +
    "concentrates, map-only plan") {
    val r = RandomProjection.project(spark, TestSpark.sf).cache()
    val src = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).map(_.toDouble)).toMap
    assert(r.count() == src.size)

    // bit-exact: replay the sequential fold for every vector, column 0
    def rp(j: Int, i: Int): Double =
      (graft.core.PortableHash.pHashJvm(s"RP|$j|$i") % 3 - 1).toDouble
    val y0 = r.select("vec_id", "y_0").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    for ((id, v) <- src) {
      val expect = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * rp(0, i))
      assert(y0(id) == expect, s"vec $id")
    }

    // JL: E[y_j^2] = (2/3)|x|^2 per component (entries uniform over
    // {-1,0,1}), so |y|^2 * 3/(2M) estimates |x|^2; the mean ratio over
    // 500 vectors concentrates near 1
    val yNorm = r.select(col("vec_id"),
      (0 until RandomProjection.M).map(j => col(s"y_$j") * col(s"y_$j"))
        .reduce(_ + _).as("ny")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val ratios = src.toSeq.map { case (id, v) =>
      val nx = v.map(x => x * x).sum
      yNorm(id) * 3.0 / (2 * RandomProjection.M) / nx
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean")

    // map-only: the only exchange is the test-layout spread repartition
    val exchanges = r.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 1)
    r.unpersist()
  }
}
