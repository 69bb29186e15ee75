package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encode assigns dense deterministic ids 0..N-1") {
    val uris = Seq("b", "a", "zz", "m", "q", "x1", "x2", "x3").toDF("uri")
    val out = Dict.encode(uris).as[(String, Long)].collect().toMap
    assert(out.values.toSeq.sorted == (0L until 8L))
    // deterministic across invocations
    val out2 = Dict.encode(uris).as[(String, Long)].collect().toMap
    assert(out == out2)
  }

  test("id order is (pHash bucket, uri) — matches the documented oracle rule") {
    val uris = Seq("r1", "r2", "r3", "r4").toDF("uri")
    val out = Dict.encode(uris).as[(String, Long)].collect()
    def refPHash(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = out.map(_._1).sortBy(u => (refPHash(u) % Dict.NBuckets, u))
      .zipWithIndex.map { case (u, i) => (u, i.toLong) }.toMap
    assert(out.toMap == expected)
  }

  test("encoded triples join back consistently on the tpch graph") {
    val enc = Dict.encodedTriples(spark, TestSpark.sf)
    val n = enc.count()
    assert(n == graft.core.TpchGraph.triples(spark, TestSpark.sf).count())
    // every id within dictionary range
    val nEnt = Dict.entities(spark, TestSpark.sf).count()
    assert(enc.filter($"sid" >= nEnt || $"oid" >= nEnt || $"sid" < 0 || $"oid" < 0).count() == 0)
  }

  test("persisted dictionary artifact: save -> load is the identity, and " +
      "encoding through the LOADED artifact equals the session encode") {
    val sess = Dict.entities(spark, TestSpark.sf)
      .as[(String, Long)].collect().toMap
    val loaded = Dict.persistRoundtrip(spark, TestSpark.sf)
    val got = loaded.as[(String, Long)].collect().toMap
    assert(got == sess, "artifact roundtrip must be value-identical")
    // re-encode the triples via the loaded artifact: same ids everywhere
    import org.apache.spark.sql.functions._
    val t = graft.core.TpchGraph.triples(spark, TestSpark.sf)
    val viaLoaded = t
      .join(loaded.withColumnRenamed("uri", "s").withColumnRenamed("id", "sid"), "s")
      .join(loaded.withColumnRenamed("uri", "o").withColumnRenamed("id", "oid"), "o")
      .select("sid", "oid").as[(Long, Long)].collect().sorted.toSeq
    val viaSession = Dict.encodedTriples(spark, TestSpark.sf)
      .select("sid", "oid").as[(Long, Long)].collect().sorted.toSeq
    assert(viaLoaded == viaSession)
  }
}
