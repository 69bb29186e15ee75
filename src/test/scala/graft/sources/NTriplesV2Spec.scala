package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, StringStartsWith}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.ntriples.NTriplesScan

/** #206 DSv2 connector: the pushdown CONTRACTS, asserted on the physical
  * plan — the predicate must land in the scan, the read schema must
  * shrink to the projection, a non-pushable predicate must stay
  * residual, and the scan must split one-partition-per-file.
  */
class NTriplesV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dump: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_ntspec_").toString
    NTriples.write(graft.core.TpchGraph.triples(spark, TestSpark.sf), out)
    out
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): NTriplesScan =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.collectFirst { case s: NTriplesScan => s }
      .getOrElse(fail("no NTriplesScan in the physical plan"))

  test("equality predicate and projection push into the scan") {
    val df = spark.read.format("ntriples").load(dump)
      .filter(col("p") === "placedBy").select("s", "o")
    val scan = scanOf(df)
    assert(scan.pushed.contains(EqualTo("p", "placedBy")),
      s"predicate not pushed: ${scan.pushed.mkString(",")}")
    assert(scan.readSchema().fieldNames.toSeq == Seq("s", "o"),
      "projection must prune the scan schema")
    // and the result is right: every orders row, nothing else
    val n = graft.core.Tables.orders(spark, TestSpark.sf).count()
    assert(df.count() == n)
    val rows = df.as[(String, String)].collect()
    assert(rows.forall(r => r._1.startsWith("o:") && r._2.startsWith("c:")))
  }

  test("prefix predicate pushes; non-pushable contains stays residual " +
      "and still filters correctly") {
    val df = spark.read.format("ntriples").load(dump)
      .filter(col("s").startsWith("n:") && col("o").contains("0"))
    val scan = scanOf(df)
    assert(scan.pushed.contains(StringStartsWith("s", "n:")))
    assert(!scan.pushed.exists(_.toString.contains("Contains")),
      "contains must NOT be claimed as pushed")
    val expect = graft.core.TpchGraph.triples(spark, TestSpark.sf)
      .filter(col("s").startsWith("n:") && col("o").contains("0"))
      .select("s", "p", "o").as[(String, String, String)].collect().sorted
    val got = df.select("s", "p", "o")
      .as[(String, String, String)].collect().sorted
    assert(got.toSeq == expect.toSeq)
  }

  test("splits are one-per-file and the unfiltered read is the full " +
      "triple set (malformed lines dropped in-scan)") {
    val df = spark.read.format("ntriples").load(dump)
    assert(df.rdd.getNumPartitions > 1,
      "a sharded dump must yield multiple input partitions")
    val expect = graft.core.TpchGraph.triples(spark, TestSpark.sf).count()
    assert(df.count() == expect)
    // a malformed shard is skipped line-wise, not fatally
    val extra = new java.io.File(dump, "part-malformed.txt")
    val w = new java.io.PrintWriter(extra)
    w.println("this is not a triple")
    w.println("<urn:g/r/x:1> <urn:g/p/testPred> <urn:g/r/y:2> .")
    w.close()
    try {
      val df2 = spark.read.format("ntriples").load(dump)
      assert(df2.count() == expect + 1, "valid line kept, malformed dropped")
      assert(df2.filter(col("p") === "testPred").count() == 1)
    } finally extra.delete()
  }
}
