package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class JsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("jsonl roundtrip is lossless (both set differences empty)") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang", "n_chars", "source", "text")
    val back = Jsonl.roundtrip(spark, TestSpark.sf)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("jsonl file write/read roundtrip through a real text file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "lang", "n_chars", "source", "text")
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
