package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, TpchGraph}

/** RDF surface operators: triple extraction, N-Triples round-trip,
  * COO tensor stats, deterministic negative sampling.
  *
  * Reference: the N-Triples line parser at
  * python/sansa/ml/kbc/rdfio.py:42-50 (regex split, URI filter) and
  * RDFDatasetReader.scala:20-26 (`isValidTriple` keeps URI-only triples);
  * negative sampling at python/sansa/ml/kbc/keras/sample.py:29-47
  * (RandomModeSampler corrupts the object slot) and TransE.scala:92-93.
  */
object Rdf {

  /** #6: the TPC-H graph triple view itself (s, p, o strings). */
  def triplesExtract(spark: SparkSession, dir: String): DataFrame =
    TpchGraph.triples(spark, dir)

  val triplesExtractSql: String =
    s"WITH ${TpchGraph.cte}\nSELECT s, p, o FROM triples"

  // ------------------------------------------------------------- N-Triples

  private val ntPattern = "^<urn:g/r/([^>]+)> <urn:g/p/([^>]+)> <urn:g/r/([^>]+)> \\.$"

  /** Format triples as N-Triples lines (one string column `line`). */
  def toNtriples(triples: DataFrame): DataFrame =
    triples.select(concat(
      lit("<urn:g/r/"), col("s"), lit("> <urn:g/p/"), col("p"),
      lit("> <urn:g/r/"), col("o"), lit("> .")).as("line"))

  /** Parse N-Triples lines back to (s, p, o); malformed lines dropped
    * (rdfio.py:46-50 drops non-matching lines the same way).
    */
  def parseNtriples(lines: DataFrame): DataFrame =
    lines
      .withColumn("s", regexp_extract(col("line"), ntPattern, 1))
      .withColumn("p", regexp_extract(col("line"), ntPattern, 2))
      .withColumn("o", regexp_extract(col("line"), ntPattern, 3))
      .filter(col("s") =!= "")
      .select("s", "p", "o")

  /** #7: format → parse round trip; result must equal the triple set. */
  def ntriplesRoundtrip(spark: SparkSession, dir: String): DataFrame =
    parseNtriples(toNtriples(TpchGraph.triples(spark, dir)))

  val ntriplesRoundtripSql: String =
    s"""WITH ${TpchGraph.cte},
       |lines AS (
       |  SELECT '<urn:g/r/' || s || '> <urn:g/p/' || p || '> <urn:g/r/' || o || '> .' AS line
       |  FROM triples
       |)
       |SELECT regexp_extract(line, '$ntPattern', 1) AS s,
       |       regexp_extract(line, '$ntPattern', 2) AS p,
       |       regexp_extract(line, '$ntPattern', 3) AS o
       |FROM lines
       |WHERE regexp_extract(line, '$ntPattern', 1) <> ''""".stripMargin

  // ------------------------------------------------------------ COO stats

  /** #11: per-relation slice statistics of the boolean COO tensor:
    * nnz, distinct subjects/objects, slice density. The groupBy key is
    * `pid` (~1e3 relations) — one small-key shuffle; the distinct counts
    * are exact (per-slice, not approximate) since slices are the unit a
    * partitioner would use (rdfio.py:11-34 ThreeWayTensorPartitioner
    * blocks on exactly these coordinates).
    */
  def cooStats(spark: SparkSession, dir: String): DataFrame =
    Dict.encodedTriples(spark, dir)
      .groupBy("pid")
      .agg(
        count(lit(1)).as("nnz"),
        countDistinct("sid").as("n_subj"),
        countDistinct("oid").as("n_obj"))
      .withColumn("density",
        col("nnz").cast("double") / (col("n_subj") * col("n_obj")))

  val cooStatsSql: String =
    s"""${Dict.preludeCtes}
       |SELECT pid, COUNT(*) AS nnz,
       |  COUNT(DISTINCT sid) AS n_subj, COUNT(DISTINCT oid) AS n_obj,
       |  CAST(COUNT(*) AS DOUBLE) / (COUNT(DISTINCT sid) * COUNT(DISTINCT oid)) AS density
       |FROM encoded GROUP BY pid""".stripMargin

  // ----------------------------------------------------- negative sampling

  /** #12: deterministic object corruption — the Spark-first analog of
    * RandomModeSampler (sample.py:39-47): replace the object with a
    * pHash-derived entity id; bump by one (mod N) on collision with the
    * true object so every negative is guaranteed corrupt.
    */
  def negSampleCorrupt(spark: SparkSession, dir: String): DataFrame = {
    val enc = Dict.encodedTriples(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(
      concat_ws("|", lit("neg"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    enc.crossJoin(broadcast(n))
      .withColumn("neg_oid",
        when(raw === col("oid"), (raw + 1) % col("n_ent")).otherwise(raw))
      .select("sid", "pid", "oid", "neg_oid")
  }

  val negSampleCorruptSql: String = {
    val raw = s"${PortableHash.duck("'neg|' || sid || '|' || pid || '|' || oid")} % n_ent"
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities)
       |SELECT sid, pid, oid,
       |  CASE WHEN ($raw) = oid THEN (($raw) + 1) % n_ent ELSE ($raw) END AS neg_oid
       |FROM encoded, n""".stripMargin
  }

  /** #40: LCWA negative sampling — the local-closed-world variant
    * (sample.py:95-110 `LCWASampler`): corrupt the SUBJECT slot, and keep
    * only corruptions whose (neg_sid, pid) pair is itself observed as a
    * (subject, relation) pair in the graph (`counts[(s, p)] > 0`) — the
    * negatives stay type-plausible.
    *
    * Spark-first: the plausibility filter is a left-semi join against the
    * distinct (sid, pid) pairs, keyed exactly like the groupBys around it
    * — one shuffle, no driver-side `counts` dict. The reference retries
    * until a plausible corruption is found; the deterministic analog
    * filters instead (a negative-per-triple RATE, not a guarantee —
    * matching the reference's `ntries`-bounded behavior, which also
    * yields < n samples when unlucky).
    */
  def negSampleLcwa(spark: SparkSession, dir: String): DataFrame = {
    val enc = Dict.encodedTriples(spark, dir)
    val n = Dict.entities(spark, dir).agg(count(lit(1)).as("n_ent"))
    val raw = PortableHash.pHash(
      concat_ws("|", lit("lcwa"), col("sid"), col("pid"), col("oid"))) % col("n_ent")
    val corrupted = enc.crossJoin(broadcast(n))
      .withColumn("neg_sid",
        when(raw === col("sid"), (raw + 1) % col("n_ent")).otherwise(raw))
      .select("sid", "pid", "oid", "neg_sid")
    val observedHeads = enc.select(col("sid").as("neg_sid"), col("pid")).distinct()
    corrupted.join(observedHeads, Seq("neg_sid", "pid"), "left_semi")
      // the reference sampler (sample.py LCWASampler) also rejects any
      // corruption that IS an observed positive (`tuple(nex) not in
      // self.xs`) — without this, known-true triples leak out as
      // negatives (ADVICE r3)
      .join(enc.select(col("sid").as("neg_sid"), col("pid"), col("oid")),
        Seq("neg_sid", "pid", "oid"), "left_anti")
      .select("sid", "pid", "oid", "neg_sid")
  }

  val negSampleLcwaSql: String = {
    val raw = s"${PortableHash.duck("'lcwa|' || sid || '|' || pid || '|' || oid")} % n_ent"
    s"""${Dict.preludeCtes},
       |n AS (SELECT COUNT(*) AS n_ent FROM entities),
       |corrupted AS (
       |  SELECT sid, pid, oid,
       |    CASE WHEN ($raw) = sid THEN (($raw) + 1) % n_ent ELSE ($raw) END AS neg_sid
       |  FROM encoded, n
       |)
       |SELECT c.sid, c.pid, c.oid, c.neg_sid
       |FROM corrupted c
       |WHERE EXISTS (SELECT 1 FROM encoded e
       |              WHERE e.sid = c.neg_sid AND e.pid = c.pid)
       |  AND NOT EXISTS (SELECT 1 FROM encoded e
       |                  WHERE e.sid = c.neg_sid AND e.pid = c.pid
       |                    AND e.oid = c.oid)""".stripMargin
  }
}
