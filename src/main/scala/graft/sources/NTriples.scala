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
}
