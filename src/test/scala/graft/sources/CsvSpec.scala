package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class CsvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv roundtrip is lossless on the documents table") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang", "n_chars", "source", "text")
    val back = Csv.roundtrip(spark, TestSpark.sf)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("csv roundtrip survives delimiters and quotes in the payload") {
    import spark.implicits._
    val tricky = Seq(
      (1L, """a,b "quoted" c"""),
      (2L, "comma, and \"double\" quote"),
      (3L, "plain"),
      (4L, "trailing,")).toDF("id", "text")
    val back = Csv.parseCsv(Csv.toCsvLines(tricky), tricky.schema)
    assert(back.exceptAll(tricky).isEmpty && tricky.exceptAll(back).isEmpty)
  }

  test("csv file write/read roundtrip through a real text file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang", "n_chars", "source", "text")
    Csv.write(docs, dir)
    val back = Csv.read(spark, dir, docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
