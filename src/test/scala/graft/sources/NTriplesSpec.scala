package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NTriplesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file round-trip: write N-Triples, read back, identical triple set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nt").toString + "/t"
    val triples = graft.core.TpchGraph.triples(spark, TestSpark.sf)
    NTriples.write(triples, dir)
    val back = NTriples.read(spark, dir)
    assert(back.count() == triples.count())
    assert(back.exceptAll(triples).isEmpty && triples.exceptAll(back).isEmpty)
  }

  test("malformed lines are dropped, valid ones survive") {
    import spark.implicits._
    val mixed = Seq(
      "<urn:g/r/a> <urn:g/p/knows> <urn:g/r/b> .",
      "this is not a triple",
      "<urn:g/r/x> <urn:g/p/likes> \"literal\" .", // literal object: filtered
      "<urn:g/r/c> <urn:g/p/knows> <urn:g/r/d> .").toDF("line")
    val got = graft.rdf.Rdf.parseNtriples(mixed).as[(String, String, String)]
      .collect().toSet
    assert(got == Set(("a", "knows", "b"), ("c", "knows", "d")))
  }
}
