package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.rdf.Rdf

/** File-based N-Triples source/sink: the entry point a user of the
  * reference would swap in
  * (reference: python/sansa/ml/kbc/rdfio.py:42-50 `read_triples` — line
  * parse + URI filter; src/main/scala/.../RDFDatasetReader.scala:20-26).
  *
  * Spark-first: `spark.read.text` distributes line splitting across the
  * cluster (a 100 TB dump is just many splits); the regex parse/filter
  * runs inside codegen; malformed lines are dropped exactly like the
  * reference's parser. No Jena, no RDD round-trips.
  */
object NTriples {

  /** Read an N-Triples text file (or directory of them) → (s, p, o). */
  def read(spark: SparkSession, path: String): DataFrame =
    Rdf.parseNtriples(
      spark.read.text(path).withColumnRenamed("value", "line"))

  /** Write (s, p, o) triples as N-Triples lines. */
  def write(triples: DataFrame, path: String): Unit =
    Rdf.toNtriples(triples).write.mode("overwrite").text(path)

  /** #206: write → DSv2 read with filter pushdown + column pruning.
    *
    * The corpus' triples are dumped as sharded N-Triples text, then
    * read back through [[graft.sources.ntriples.NTriplesTableProvider]]
    * (`format("ntriples")`) with a `p = 'placedBy'` predicate and an
    * (s, o) projection — both of which the connector absorbs INTO the
    * scan (spec-asserted: the predicate lands in the scan's
    * pushedFilters, the read schema shrinks to 2 columns, and a
    * non-pushable LIKE stays residual). The oracle reproduces the
    * filtered pairs from the base tables: the dump→scan path loses and
    * invents nothing.
    */
  def pushdownRead(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // TempDirs-memoized staging (round 9): this was a raw
    // createTempDirectory + write per INVOCATION — no shutdown cleanup
    // (823 MB×N leaked across a day's sessions at sf0.1) and the dump
    // re-written on every timed run. One write per (session, dir);
    // the registry's shutdown hook removes it.
    val out = graft.core.TempDirs.stagedFor((spark, dir, "ntriples"),
      "graft_nt_")(p => write(graft.core.TpchGraph.triples(spark, dir), p))
    spark.read.format("ntriples").load(out)
      .filter(col("p") === "placedBy")
      .select("s", "o")
  }

  val pushdownReadSql: String =
    s"""WITH ${graft.core.TpchGraph.cte}
       |SELECT s, o FROM triples WHERE p = 'placedBy'""".stripMargin
}
