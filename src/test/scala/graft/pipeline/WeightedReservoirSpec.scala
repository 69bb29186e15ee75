package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** #236: Efraimidis–Spirakis weighted reservoir. */
class WeightedReservoirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted reservoir: keys and top-n equal the driver A-ES " +
      "recompute; the draw genuinely tilts toward heavy documents") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect().filter(_._3 > 0L)
    def q12(x: Double) = math.floor(x * 1e12 + 0.5) / 1e12
    val keyed = docs.map { case (id, lang, w) =>
      val h = graft.core.PortableHash.pHashJvm(s"wres$id")
      val u = (h % Sampling.WresMod + 1L).toDouble /
        (Sampling.WresMod + 1L).toDouble
      (id, lang, w, q12(-math.log(u) / w))
    }
    val expect = keyed.sortBy(r => (r._4, r._1)).take(Sampling.WresN)
      .zipWithIndex.map { case ((id, lang, w, k), i) =>
        (id, lang, w, k, i + 1)
      }.toSeq
    val got = Sampling.sampleWeightedReservoir(spark, TestSpark.sf)
      .as[(Long, String, Long, Double, Int)].collect()
      .sortBy(_._5).toSeq
    assert(got == expect, "A-ES draw differs from the driver recompute")
    assert(got.length == Sampling.WresN)
    // inclusion ∝ weight: the sample's mean n_chars must exceed the
    // population's (deterministic on this corpus, and the property the
    // operator exists to provide)
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    val popMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampleMean > popMean,
      s"weighted draw should tilt heavy: $sampleMean vs $popMean")
  }
}
