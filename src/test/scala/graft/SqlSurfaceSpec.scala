package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface (VERDICT r7 item 7): representative operators — one per
  * major family — must answer through `spark.sql` over their registered
  * `graft_*` views with EXACTLY the rows the Scala surface returns (the
  * Scala surface is the one the DuckDB oracle gate checks, so equality
  * here extends the oracle guarantee to the SQL surface), and views
  * must compose with raw tables and push predicates like any plan.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One per family: relational, events, source, rdf/dict, kge, graph,
    * dedup, ann, text, pipeline (incl. the e2e composition), sketch.
    */
  private val representatives = Seq(
    "q1_agg", "events_asof_join", "source_csv_roundtrip",
    "dict_encode_entities", "kge_transe_score", "graph_pagerank",
    "dedup_exact", "ann_brute_topk", "text_bm25", "sample_stratified",
    "pipeline_e2e", "sketch_hll")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private lazy val registered =
    SqlSurface.register(spark, TestSpark.sf, representatives)

  test("every representative answers through spark.sql with the Scala surface's rows") {
    assert(registered.size == representatives.size)
    representatives.foreach { name =>
      val viaSql = canon(spark.sql(s"SELECT * FROM graft_$name"))
      val viaScala = canon(SparkEntry.queries(name)(spark, TestSpark.sf))
      assert(viaSql == viaScala, s"graft_$name diverges from the Scala surface")
      assert(viaSql.nonEmpty, s"graft_$name returned no rows")
    }
  }

  test("views compose with raw tables in one SQL statement") {
    registered // force registration
    SqlSurface.register(spark, TestSpark.sf, Seq("q3_join"))
    val joined = spark.sql(
      """SELECT n.n_name, SUM(r.revenue) AS rev
        |FROM graft_q3_join r
        |JOIN orders o ON o.o_orderkey = r.o_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY n.n_name""".stripMargin)
    assert(joined.collect().length > 0)
  }

  test("a predicate on a view prunes through to the operator's plan") {
    registered
    val plan = spark.sql(
      "SELECT * FROM graft_q1_agg WHERE l_returnflag = 'A'")
      .queryExecution.executedPlan.toString
    // the filter must not sit above the aggregate as a post-scan of the
    // full result only — Catalyst pushes the groupBy-key predicate below
    // the aggregate into the scan side
    assert(plan.contains("l_returnflag"), "predicate vanished from the plan")
  }

  test("registering the lazy board triggers ZERO Spark jobs (VERDICT r8 item 7)") {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def settled(): Long = {
      var prev = -1L; var cur = jobs.get()
      while (cur != prev) { Thread.sleep(100); prev = cur; cur = jobs.get() }
      cur
    }
    // warm the per-table schema memo first: table REGISTRATION is
    // allowed its one footer-inference job per table — a registered
    // VIEW is not allowed any
    SqlSurface.registerTables(spark, TestSpark.sf)
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = settled()
      val views = SqlSurface.registerLazy(spark, TestSpark.sf)
      val delta = settled() - before
      assert(views.size ==
        SparkEntry.queries.size - SqlSurface.EagerNames.size)
      assert(delta == 0,
        s"lazy registration ran $delta Spark jobs — an operator on the " +
          "lazy list executes work at build time; move it to EagerNames")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("the eager list stays within the board and the split covers it") {
    assert(SqlSurface.EagerNames.subsetOf(SparkEntry.queries.keySet))
    val lazySet = SparkEntry.queries.keySet -- SqlSurface.EagerNames
    assert((lazySet ++ SqlSurface.EagerNames) == SparkEntry.queries.keySet)
  }

  test("SURVEY §5's documented lazy/eager counts equal the measured split") {
    // VERDICT r9 item 7: the §5 prose drifted from the measured set
    // once; pin the doc to the code so it cannot again. The canonical
    // line has the fixed form "lazy L / eager E of T."
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val m = "lazy (\\d+) / eager (\\d+) of (\\d+)\\.".r
      .findFirstMatchIn(survey)
    assert(m.isDefined, "SURVEY.md must carry the canonical split line")
    val (l, e, t) = (m.get.group(1).toInt, m.get.group(2).toInt,
      m.get.group(3).toInt)
    assert(e == SqlSurface.EagerNames.size,
      s"SURVEY says $e eager; EagerNames has ${SqlSurface.EagerNames.size}")
    assert(t == SparkEntry.queries.size,
      s"SURVEY says $t total; the board has ${SparkEntry.queries.size}")
    assert(l == t - e)
  }
}
