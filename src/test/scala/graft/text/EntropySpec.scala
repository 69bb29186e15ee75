package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class EntropySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entropy bounds: 0 <= H <= log2(alphabet) per doc, corpus varies") {
    val r = Entropy.entropy(spark, TestSpark.sf).cache()
    val nDocs = graft.core.Tables.documents(spark, TestSpark.sf).count()
    assert(r.count() == nDocs)
    assert(r.filter(col("h_char") < 0 || col("h_word") < 0).isEmpty)
    // H is at most log2(n) (equality iff all symbols distinct); allow the
    // 1e-6 log2-grid quantization per term (n terms at most)
    assert(r.filter(col("h_char") >
      log2(col("n_chars_obs")) + col("n_chars_obs") * 1e-6).isEmpty)
    assert(r.filter(col("h_word") >
      log2(col("n_words")) + col("n_words") * 1e-6).isEmpty)
    // natural-language-ish corpus: char entropy is well above 1 bit
    assert(r.agg(max("h_char")).head.getDouble(0) > 1.0)
  }

  test("known answers: uniform two-symbol text = exactly 1 bit, " +
    "constant text = exactly 0 bits") {
    val dir = java.nio.file.Files.createTempDirectory("entropy").toString
    Seq((1L, "abab", "en", "t", 4L), (2L, "aaaa", "en", "t", 4L),
      (3L, "x y", "en", "t", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = Entropy.entropy(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))).toMap
    // "abab": chars {a:2,b:2} → x=1/2, log2 exact → H=1.0 exactly;
    // one word → H_word = 0 exactly
    assert(m(1L) == ((4L, 1L, 1.0, 0.0)))
    // "aaaa": single symbol both levels → exactly 0
    assert(m(2L) == ((4L, 1L, 0.0, 0.0)))
    // "x y": chars {x,space,y} uniform over 3 → H=log2(3) quantized;
    // two distinct words → H_word = 1.0 exactly
    val qlog = spark.range(1)
      .select(graft.core.Exact.roundS(log2(lit(1.0 / 3.0)), 6)).head.getDouble(0)
    val term = 1.0 / 3.0 * qlog
    val expected = -(3 * math.floor(term * 1e9 + 0.5)) / 1e9 // 3 equal terms
    assert(m(3L)._1 == 3L && m(3L)._2 == 2L && m(3L)._4 == 1.0)
    assert(m(3L)._3 == expected)
  }
}
