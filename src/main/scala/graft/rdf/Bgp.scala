package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TpchGraph

/** SPARQL-side operators over the triple view: characteristic sets (the
  * cardinality statistic an RDF optimizer consults) and basic-graph-
  * pattern matching (the join shape every SPARQL engine compiles to).
  *
  * Reference framing: the reference family's engines answer SPARQL over
  * the same triple model this library encodes
  * (reference: src/main/scala/.../RDFDatasetReader.scala:20-33 reads the
  * triples these patterns match). The Spark-first re-expression is the
  * published one: triple patterns become predicate-filtered frames and
  * shared variables become equi-joins, with the optimizer free to
  * reorder/broadcast — not an RDD-side index structure.
  */
object Bgp {

  // --------------------------------------- #151 characteristic sets

  /** #151: characteristic sets (Neumann & Moerkotte, ICDE'11) — for each
    * subject the SET of predicates it occurs with, grouped: how many
    * subjects share each predicate signature and how many triples they
    * carry. This is the structure an RDF cardinality estimator keeps
    * (star-join selectivity = read the matching characteristic sets) and
    * doubles as the "schema discovery" report for a schemaless graph.
    *
    * Plan: one shuffle keyed on the subject (collect_set partials
    * combine map-side; the per-subject set is bounded by |predicates| —
    * dozens in real graphs, never data-scale), then a dictionary-small
    * groupBy on the signature string (≤ 2^|P| keys). Nothing data-scale
    * moves twice; at 100 TB the subject-keyed aggregate is the one
    * shuffle and its value payload is a handful of predicate strings.
    */
  def charSets(spark: SparkSession, dir: String): DataFrame = {
    val per = TpchGraph.triples(spark, dir)
      .groupBy("s")
      .agg(
        array_join(sort_array(collect_set(col("p"))), ",").as("cset"),
        count(lit(1)).as("nt"))
    per.groupBy("cset")
      .agg(count(lit(1)).as("n_subjects"), sum("nt").as("n_triples"))
      .select(col("cset"), size(split(col("cset"), ",")).as("n_preds"),
        col("n_subjects"), col("n_triples"))
  }

  val charSetsSql: String =
    s"""WITH ${TpchGraph.cte},
       |sp AS (SELECT DISTINCT s, p FROM triples),
       |per AS (
       |  SELECT s, string_agg(p, ',' ORDER BY p) AS cset FROM sp GROUP BY s
       |),
       |cnt AS (SELECT s, COUNT(*) AS nt FROM triples GROUP BY s)
       |SELECT cset, CAST(len(string_split(cset, ',')) AS INT) AS n_preds,
       |  COUNT(*) AS n_subjects, CAST(SUM(nt) AS BIGINT) AS n_triples
       |FROM per JOIN cnt USING (s) GROUP BY cset""".stripMargin

  // ------------------------------------------- #152 BGP star query

  /** The bound region term of the pattern (5 regions in the graph; any
    * choice exercises the same plan).
    */
  val BgpRegion = "r:0"

  /** #152: SPARQL basic-graph-pattern matching — the star+chain pattern
    *
    *   ?ord placedBy ?cust . ?ord hasPart ?part .
    *   ?cust inNation ?nat . ?nat inRegion <r:0>
    *
    * compiled the way a Spark-first SPARQL engine compiles every BGP:
    * each triple pattern is a predicate-filtered projection of the
    * triple frame (the predicate filter pushes into the scan — the
    * columnar analog of a POS index lookup) and each shared variable is
    * an equi-join. Join order follows selectivity: the bound-object
    * pattern first (≤ |nations| rows, broadcast), then outward through
    * customer- and order-keyed joins — so the two data-scale joins are
    * keyed on ?cust and ?ord and every dimension side broadcasts.
    * Result: per ?nat binding counts (total bindings, distinct orders,
    * distinct parts) — the aggregate a SELECT (COUNT...) GROUP BY ?nat
    * query returns.
    */
  def bgpStar(spark: SparkSession, dir: String): DataFrame = {
    val t = TpchGraph.triples(spark, dir)
    def pat(p: String, s: String, o: String): DataFrame =
      t.filter(col("p") === p).select(col("s").as(s), col("o").as(o))

    val nr = t.filter(col("p") === "inRegion" && col("o") === BgpRegion)
      .select(col("s").as("nat"))
    val cn = pat("inNation", "cust", "nat")
    val pb = pat("placedBy", "ord", "cust")
    val hp = pat("hasPart", "ord", "part")

    cn.join(broadcast(nr), "nat")
      .join(pb, "cust")
      .join(hp, "ord")
      .groupBy("nat")
      .agg(count(lit(1)).as("n_bindings"),
        countDistinct(col("ord")).as("n_orders"),
        countDistinct(col("part")).as("n_parts"))
  }

  val bgpStarSql: String =
    s"""WITH ${TpchGraph.cte}
       |SELECT cn.o AS nat, COUNT(*) AS n_bindings,
       |  COUNT(DISTINCT pb.s) AS n_orders, COUNT(DISTINCT hp.o) AS n_parts
       |FROM triples nr
       |JOIN triples cn ON cn.p = 'inNation' AND cn.o = nr.s
       |JOIN triples pb ON pb.p = 'placedBy' AND pb.o = cn.s
       |JOIN triples hp ON hp.p = 'hasPart' AND hp.s = pb.s
       |WHERE nr.p = 'inRegion' AND nr.o = '$BgpRegion'
       |GROUP BY cn.o""".stripMargin

  // ---------------------------------------- #173 OPTIONAL pattern

  /** #173: SPARQL OPTIONAL — the left-outer member of the SPARQL
    * algebra (SPARQL 1.1 §18.4 LeftJoin), and with `FILTER(!bound(?v))`
    * the pre-1.1 idiom for negation-as-failure:
    *
    *   ?who inNation ?nat .
    *   OPTIONAL { ?ord placedBy ?who }
    *
    * `inNation` subjects are customers AND suppliers, and only customers
    * (with at least one order) ever bind ?ord — so the pattern exercises
    * both genuinely-unbound cases (order-less customers, all suppliers),
    * not a vacuous OPTIONAL that always matches. Compiled exactly as a
    * SPARQL engine compiles LeftJoin: each pattern a predicate-filtered
    * projection (filter pushes into the scan), the OPTIONAL a LEFT OUTER
    * equi-join on the shared variable. Output per ?nat: total bindings,
    * distinct subjects, and the bound/unbound split (n_unbound = what
    * `FILTER(!bound(?ord))` would keep).
    *
    * Scale: ONE data-scale join keyed on the shared variable ?who — the
    * same key both pattern frames naturally shuffle on; the aggregate is
    * nation-keyed (dictionary-small) with the three distinct counts
    * planned through one Expand over the joined frame.
    */
  def bgpOptional(spark: SparkSession, dir: String): DataFrame = {
    val t = TpchGraph.triples(spark, dir)
    val inn = t.filter(col("p") === "inNation")
      .select(col("s").as("who"), col("o").as("nat"))
    val pb = t.filter(col("p") === "placedBy")
      .select(col("s").as("ord"), col("o").as("who"))
    inn.join(pb, Seq("who"), "left")
      .groupBy("nat")
      .agg(
        count(lit(1)).as("n_bindings"),
        countDistinct(col("who")).as("n_subjects"),
        countDistinct(when(col("ord").isNotNull, col("who"))).as("n_bound"),
        countDistinct(when(col("ord").isNull, col("who"))).as("n_unbound"))
  }

  val bgpOptionalSql: String =
    s"""WITH ${TpchGraph.cte},
       |inn AS (SELECT s AS who, o AS nat FROM triples WHERE p = 'inNation'),
       |pb AS (SELECT s AS ord, o AS who FROM triples WHERE p = 'placedBy')
       |SELECT nat, COUNT(*) AS n_bindings,
       |  COUNT(DISTINCT who) AS n_subjects,
       |  COUNT(DISTINCT CASE WHEN ord IS NOT NULL THEN who END) AS n_bound,
       |  COUNT(DISTINCT CASE WHEN ord IS NULL THEN who END) AS n_unbound
       |FROM inn LEFT JOIN pb USING (who)
       |GROUP BY nat""".stripMargin

  // ------------------------------------- #308 SPARQL property paths

  /** #308: SPARQL 1.1 PROPERTY PATHS (§9.1) — the three fixed-length
    * path constructors beyond a plain BGP, each evaluated with the
    * standard set semantics (a path binds its ENDPOINTS; the result is
    * the distinct endpoint-pair set regardless of how many derivations
    * reach it):
    *
    *   seq      ?ord  placedBy/inNation/inRegion        ?reg   (SequencePath)
    *   alt_seq  ?ord  (placedBy|suppliedBy)/inNation/inRegion ?reg (AlternativePath)
    *   inv_seq  ?cust ^placedBy/hasPart                 ?part  (InversePath)
    *
    * (The Kleene members `p+`/`p*` are #150's iterate-to-fixpoint
    * forward chaining — this closes the FIXED-LENGTH algebra.) Each
    * path compiles the published Spark-first way: predicate-filtered
    * frames (the filter pushes into the scan — the columnar POS-index
    * lookup), alternation = unionByName BEFORE the join, inversion =
    * swapped endpoint projection (free — no operator at all), sequence
    * = equi-joins on the join variable, then ONE distinct on the
    * endpoint pair. Output per path: distinct pairs / starts / ends.
    *
    * Scale: the data-scale joins key on ?ord/?cust (the keys the base
    * frames shuffle on anyway); nation→region is dimension-sized and
    * broadcasts; the distinct is keyed like the final join. Alternation
    * costs one union, not a second join tree.
    */
  def bgpPath(spark: SparkSession, dir: String): DataFrame = {
    val t = TpchGraph.triples(spark, dir)
    def pat(p: String, s: String, o: String): DataFrame =
      t.filter(col("p") === p).select(col("s").as(s), col("o").as(o))
    val pb = pat("placedBy", "start", "mid")
    val sb = pat("suppliedBy", "start", "mid")
    val cn = pat("inNation", "mid", "nat")
    val nr = pat("inRegion", "nat", "end")
    val hp = pat("hasPart", "ord", "end")

    def report(name: String, pairs: DataFrame): DataFrame =
      pairs.distinct().agg(
        count(lit(1)).as("n_pairs"),
        countDistinct("start").as("n_start"),
        countDistinct("end").as("n_end"))
        .select(lit(name).as("path"), col("n_pairs"), col("n_start"),
          col("n_end"))

    val seq = pb.join(cn, "mid").join(broadcast(nr), "nat")
      .select("start", "end")
    // r10 (guide §2.4): alternation used to union BEFORE the join
    // ((pb ∪ sb) ⋈ cn ⋈ nr), so the placedBy leg re-joined the exact
    // subtree `seq` already builds with no exchange to reuse. Joins
    // distribute over UNION ALL — the multiset of (start, end) pairs
    // is identical leg by leg — so alt = seq-leg ∪ sb-leg lets the
    // runtime reuse seq's shuffles; the one distinct stays at the end.
    val altSeq = seq.unionByName(
      sb.join(cn, "mid").join(broadcast(nr), "nat").select("start", "end"))
    val invSeq = pat("placedBy", "ord", "start") // ^placedBy: swap roles
      .join(hp, "ord").select("start", "end")
    report("seq", seq)
      .unionByName(report("alt_seq", altSeq))
      .unionByName(report("inv_seq", invSeq))
  }

  val bgpPathSql: String =
    s"""WITH ${TpchGraph.cte},
       |pb AS (SELECT s AS start, o AS mid FROM triples WHERE p = 'placedBy'),
       |sb AS (SELECT s AS start, o AS mid FROM triples WHERE p = 'suppliedBy'),
       |cn AS (SELECT s AS mid, o AS nat FROM triples WHERE p = 'inNation'),
       |nr AS (SELECT s AS nat, o AS e FROM triples WHERE p = 'inRegion'),
       |seq AS (
       |  SELECT DISTINCT start, e FROM pb JOIN cn USING (mid) JOIN nr USING (nat)
       |), alt_seq AS (
       |  SELECT DISTINCT start, e
       |  FROM (SELECT * FROM pb UNION ALL SELECT * FROM sb)
       |  JOIN cn USING (mid) JOIN nr USING (nat)
       |), inv_seq AS (
       |  SELECT DISTINCT pb0.o AS start, hp.o AS e
       |  FROM triples pb0 JOIN triples hp ON hp.s = pb0.s AND hp.p = 'hasPart'
       |  WHERE pb0.p = 'placedBy'
       |)
       |SELECT 'seq' AS path, COUNT(*) AS n_pairs,
       |  COUNT(DISTINCT start) AS n_start, COUNT(DISTINCT e) AS n_end
       |FROM seq
       |UNION ALL SELECT 'alt_seq', COUNT(*), COUNT(DISTINCT start),
       |  COUNT(DISTINCT e) FROM alt_seq
       |UNION ALL SELECT 'inv_seq', COUNT(*), COUNT(DISTINCT start),
       |  COUNT(DISTINCT e) FROM inv_seq""".stripMargin
}
