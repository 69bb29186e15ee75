package graft.ann

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class MaxSimSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("maxsim: K per query with valid bounds; driver recount of every " +
    "query's ranking matches exactly") {
    val r = MaxSim.maxsim(spark, TestSpark.sf).cache()
    // exactly K ranked docs per query, scores bounded by ±T
    val perQ = r.groupBy("q_doc").agg(count(lit(1)).as("n"),
      countDistinct("rank").as("nd"), max("rank").as("mx"))
    assert(perQ.filter(col("n") =!= MaxSim.K || col("nd") =!= MaxSim.K ||
      col("mx") =!= MaxSim.K).isEmpty)
    assert(r.filter(abs(col("score")) > MaxSim.T).isEmpty)

    // full driver recount (bags, cosines, maxes, quantized sums, ranks)
    val bags = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1 / MaxSim.T)
      .map { case (doc, vs) => doc -> vs.sortBy(_._1).map(_._2) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def fold(f: Int => Double) = a.indices.foldLeft(0.0)((s, i) => s + f(i))
      fold(i => a(i) * b(i)) /
        (math.sqrt(fold(i => a(i) * a(i))) * math.sqrt(fold(i => b(i) * b(i))))
    }
    val expected = bags.keys.filter(_ % MaxSim.QMod == 0).flatMap { qd =>
      val scored = bags.keys.filter(_ != qd).map { dd =>
        val s = bags(qd).map(qv =>
          bags(dd).map(dv => cos(qv, dv)).max)
          .map(m => math.floor(m * 1e12 + 0.5).toLong).sum / 1e12
        (dd, s)
      }.toSeq.sortBy { case (dd, s) => (-s, dd) }.take(MaxSim.K)
      scored.zipWithIndex.map { case ((dd, s), i) => ((qd, dd), (s, i + 1)) }
    }.toMap
    val got = r.collect()
      .map(x => ((x.getLong(0), x.getLong(1)), (x.getDouble(2), x.getInt(3)))).toMap
    assert(got == expected)
    r.unpersist()
  }
}
