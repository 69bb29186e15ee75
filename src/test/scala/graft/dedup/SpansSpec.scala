package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class SpansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("span report: total over the corpus, internally consistent bounds") {
    val r = Spans.spans(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(r.count() == nDocs)
    // every span covers at least K words; coverage is a valid fraction;
    // merged spans never cover more than the doc
    assert(r.filter(col("covered_words") < col("n_spans") * Spans.K &&
      col("n_spans") > 0).isEmpty)
    assert(r.filter(col("covered_words") > col("n_words")).isEmpty)
    assert(r.filter(col("coverage") < 0 || col("coverage") > 1).isEmpty)
    assert(r.filter(col("n_spans") > col("n_rep_grams")).isEmpty)
    // the corpus has planted duplicates: some spans must exist
    assert(r.filter(col("n_spans") > 0).count() > 0)
  }

  test("exact-duplicate docs are fully covered; driver brute-force " +
    "recount matches the distributed report exactly") {
    val r = Spans.spans(spark, TestSpark.sf).cache()
    // exact dups (same normalized text appearing twice) repeat every
    // gram, so their coverage must be exactly 1.0 when n_words >= K
    val dupDocs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .groupBy("h").agg(collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1).select(explode(col("ids")).as("doc_id"))
    val underCovered = r.join(dupDocs, "doc_id")
      .filter(col("n_words") >= Spans.K && col("coverage") =!= 1.0)
    assert(underCovered.isEmpty)

    // independent driver-side recount over the whole sf0.001 corpus
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(row => (row.getLong(0), row.getString(1).trim.split("\\s+")))
    val counts = scala.collection.mutable.Map[String, Int]()
    for ((_, ws) <- docs; j <- 0 to ws.length - Spans.K)
      counts.updateWith(ws.slice(j, j + Spans.K).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val expected = docs.map { case (id, ws) =>
      val hits = (0 to ws.length - Spans.K)
        .filter(j => counts(ws.slice(j, j + Spans.K).mkString(" ")) > 1)
      // merge [p, p+K-1] intervals (overlap or adjacency)
      var spans = List.empty[(Int, Int)]
      for (p <- hits)
        spans = spans match {
          case (s, e) :: rest if p <= e + 1 => (s, math.max(e, p + Spans.K - 1)) :: rest
          case _ => (p, p + Spans.K - 1) :: spans
        }
      val covered = spans.map { case (s, e) => e - s + 1 }.sum
      (id, (hits.size.toLong, spans.size.toLong, covered.toLong))
    }.toMap
    val got = r.select("doc_id", "n_rep_grams", "n_spans", "covered_words")
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(got.size == expected.size)
    for ((id, (hits, nsp, cov)) <- expected)
      assert(got(id) == ((hits, nsp, cov)), s"doc $id")
  }
}
