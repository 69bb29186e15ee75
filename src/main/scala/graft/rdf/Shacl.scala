package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TpchGraph

/** SHACL-style graph validation — the RDF mirror of the relational
  * #164 suite, and the shapes-constraint layer of an RDF stack (the
  * reference family ships a SHACL validator next to its reasoner; this
  * is that contract Spark-first): named structural constraints over the
  * triple view — link targets must exist (sh:class via the graph),
  * cardinality shapes (sh:minCount/maxCount) — each reported as
  * (constraint, n_checked, n_violations, pass).
  */
object Shacl {

  /** #168: the shape suite over the TPC-H graph.
    *
    * Scale: each TARGET-EXISTS constraint is one anti-join keyed on the
    * linked node (the FK anti-join shape — broadcast when the target
    * class is dimension-sized); each CARDINALITY constraint is one
    * map-side-combining count on the focus node then a bounded filter.
    * The triple view is scanned per constraint with the predicate
    * filter pushed down — on a predicate-partitioned triple store
    * (the standard layout) each constraint reads ONLY its predicate's
    * partition. Output bounded by the suite.
    */
  def shaclCheck(spark: SparkSession, dir: String): DataFrame = {
    val t = TpchGraph.triples(spark, dir)
    def p(name: String) = t.filter(col("p") === name)

    // sh:class-style: the object of each link must exist as the subject
    // of the class-defining predicate.
    def targetExists(constraint: String, link: String, defining: String): DataFrame = {
      // r10 (guide §2.4): was TWO aggregates over the link set (an
      // anti-join violation count + a separate n_checked count glued
      // by crossJoin), executing the predicate scan twice. `targets`
      // is distinct, so a LEFT join matches each link at most once —
      // n_checked = all rows, n_violations = unmatched rows, one pass.
      val links = p(link)
      val targets = p(defining).select(col("s").as("o"), lit(1L).as("hit"))
        .distinct()
      links.join(targets, Seq("o"), "left")
        .agg(count(lit(1)).as("n_checked"),
          // coalesce: an empty link set must report 0, not NULL (the
          // old anti-join count was 0 there)
          coalesce(sum(when(col("hit").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_violations"))
        .select(lit(constraint).as("constraint_name"), col("n_checked"),
          col("n_violations"))
    }
    // sh:minCount 1 / sh:maxCount 1: every focus subject (subjects of
    // `focus`) carries exactly one `must` link.
    def exactlyOne(constraint: String, focus: String, must: String): DataFrame = {
      val subjects = p(focus).select("s").distinct()
      val counts = subjects.join(
          p(must).groupBy("s").agg(count(lit(1)).as("c")), Seq("s"), "left")
        .select(coalesce(col("c"), lit(0L)).as("c"))
      counts.agg(count(lit(1)).as("n_checked"),
        sum(when(col("c") =!= 1L, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(constraint).as("constraint_name"), col("n_checked"),
          col("n_violations"))
    }

    targetExists("placedBy_target_has_nation", "placedBy", "inNation")
      .unionByName(targetExists("suppliedBy_target_has_nation", "suppliedBy", "inNation"))
      .unionByName(targetExists("inNation_target_has_region", "inNation", "inRegion"))
      .unionByName(exactlyOne("order_exactly_one_customer", "hasPart", "placedBy"))
      .unionByName {
        val customers = p("placedBy").select(col("o").as("s")).distinct()
        val counts = customers.join(
            p("inNation").groupBy("s").agg(count(lit(1)).as("c")), Seq("s"), "left")
          .select(coalesce(col("c"), lit(0L)).as("c"))
        counts.agg(count(lit(1)).as("n_checked"),
          sum(when(col("c") =!= 1L, 1L).otherwise(0L)).as("n_violations"))
          .select(lit("customer_exactly_one_nation").as("constraint_name"),
            col("n_checked"), col("n_violations"))
      }
      .withColumn("pass", col("n_violations") === 0L)
  }

  val shaclCheckSql: String = {
    def targetExists(constraint: String, link: String, defining: String) =
      s"""SELECT '$constraint' AS constraint_name,
         |  (SELECT COUNT(*) FROM triples WHERE p = '$link') AS n_checked,
         |  (SELECT COUNT(*) FROM triples l WHERE l.p = '$link'
         |   AND NOT EXISTS (SELECT 1 FROM triples d
         |     WHERE d.p = '$defining' AND d.s = l.o)) AS n_violations""".stripMargin
    val exactlyOneOrder =
      s"""SELECT 'order_exactly_one_customer',
         |  (SELECT COUNT(DISTINCT s) FROM triples WHERE p = 'hasPart'),
         |  (SELECT COUNT(*) FROM (
         |    SELECT f.s, COUNT(m.s) AS c
         |    FROM (SELECT DISTINCT s FROM triples WHERE p = 'hasPart') f
         |    LEFT JOIN (SELECT s FROM triples WHERE p = 'placedBy') m
         |      ON m.s = f.s
         |    GROUP BY f.s
         |  ) WHERE c <> 1)""".stripMargin
    val exactlyOneCust =
      s"""SELECT 'customer_exactly_one_nation',
         |  (SELECT COUNT(DISTINCT o) FROM triples WHERE p = 'placedBy'),
         |  (SELECT COUNT(*) FROM (
         |    SELECT f.o, COUNT(m.s) AS c
         |    FROM (SELECT DISTINCT o FROM triples WHERE p = 'placedBy') f
         |    LEFT JOIN (SELECT s FROM triples WHERE p = 'inNation') m
         |      ON m.s = f.o
         |    GROUP BY f.o
         |  ) WHERE c <> 1)""".stripMargin
    s"""WITH ${TpchGraph.cte}
       |SELECT constraint_name, n_checked, n_violations,
       |  n_violations = 0 AS pass
       |FROM (
       |  ${targetExists("placedBy_target_has_nation", "placedBy", "inNation")}
       |  UNION ALL
       |  ${targetExists("suppliedBy_target_has_nation", "suppliedBy", "inNation")}
       |  UNION ALL
       |  ${targetExists("inNation_target_has_region", "inNation", "inRegion")}
       |  UNION ALL
       |  $exactlyOneOrder
       |  UNION ALL
       |  $exactlyOneCust
       |)""".stripMargin
  }
}
