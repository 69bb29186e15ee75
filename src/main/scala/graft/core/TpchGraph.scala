package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knowledge-graph view over the TPC-H-ish tables.
  *
  * The reference engine consumes RDF triples
  * (reference: src/main/scala/net/sansa_stack/ml/kge/RDFDatasetReader.scala:20-33,
  * python/sansa/ml/kbc/rdfio.py:42-60). The driver's test data is
  * relational, so graft derives a deterministic triple set from it; every
  * KGE / tensor operator runs on this graph and the DuckDB oracle
  * reproduces it with [[cte]].
  *
  * Triples are a SET (distinct), matching the boolean-tensor semantics of
  * the reference's COO tensor (rdfio.py:52-89).
  */
object TpchGraph {

  /** Per-(session, dir) cache: the triple view feeds the dictionaries,
    * the encoder, the samplers and the N-Triples ops — materialize the
    * union+distinct once per session (same rationale as Dict's cache).
    */
  private val cache = new graft.core.DfCache[(SparkSession, String)]("infra")

  /** (s, p, o) string triples derived from the TPC-H foreign keys.
    *
    * Persisted with an EXPLICIT partition count: AQE coalesces the small
    * distinct output to 1-2 partitions at test SFs, and every downstream
    * md5-heavy map stage (dictionary encode, slicing, N-Triples format)
    * would inherit that serialization. An explicit repartition is
    * AQE-exempt; at 100 TB the count is executor-cores-proportional
    * config, same idea.
    */
  def triples(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((spark, dir))(build(spark, dir).repartition(
      spark.conf.get("spark.sql.shuffle.partitions").toInt))

  private def build(spark: SparkSession, dir: String): DataFrame = {
    def t(df: DataFrame, s: (String, String), p: String, o: (String, String)) =
      df.select(
        concat(lit(s._1), col(s._2).cast("string")).as("s"),
        lit(p).as("p"),
        concat(lit(o._1), col(o._2).cast("string")).as("o"))

    val c  = t(Tables.customer(spark, dir), ("c:", "c_custkey"), "inNation", ("n:", "c_nationkey"))
    val su = t(Tables.supplier(spark, dir), ("s:", "s_suppkey"), "inNation", ("n:", "s_nationkey"))
    val n  = t(Tables.nation(spark, dir),   ("n:", "n_nationkey"), "inRegion", ("r:", "n_regionkey"))
    val o  = t(Tables.orders(spark, dir),   ("o:", "o_orderkey"), "placedBy", ("c:", "o_custkey"))
    val lp = t(Tables.lineitem(spark, dir), ("o:", "l_orderkey"), "hasPart", ("p:", "l_partkey"))
    val ls = t(Tables.lineitem(spark, dir), ("o:", "l_orderkey"), "suppliedBy", ("s:", "l_suppkey"))

    // distinct: an order can repeat a part/supplier across line numbers.
    c.union(su).union(n).union(o).union(lp).union(ls).distinct()
  }

  /** DuckDB CTE producing the identical triple set (alias `triples`). */
  val cte: String =
    """triples AS MATERIALIZED (
      |  SELECT DISTINCT * FROM (
      |    SELECT 'c:' || c_custkey AS s, 'inNation' AS p, 'n:' || c_nationkey AS o FROM customer
      |    UNION ALL SELECT 's:' || s_suppkey, 'inNation', 'n:' || s_nationkey FROM supplier
      |    UNION ALL SELECT 'n:' || n_nationkey, 'inRegion', 'r:' || n_regionkey FROM nation
      |    UNION ALL SELECT 'o:' || o_orderkey, 'placedBy', 'c:' || o_custkey FROM orders
      |    UNION ALL SELECT 'o:' || l_orderkey, 'hasPart', 'p:' || l_partkey FROM lineitem
      |    UNION ALL SELECT 'o:' || l_orderkey, 'suppliedBy', 's:' || l_suppkey FROM lineitem
      |  )
      |)""".stripMargin
}
