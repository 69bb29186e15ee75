package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration (VERDICT r7 item 7): the board as session
  * views, so a SQL-only user — the audience an "engine" implies — runs
  * every operator without touching Scala:
  *
  * {{{
  *   SqlSurface.register(spark, dir)
  *   spark.sql("SELECT * FROM graft_q1_agg")
  *   spark.sql("""SELECT d.stage, d.n_docs FROM graft_pipeline_e2e d
  *                ORDER BY d.stage_ord""")
  *   spark.sql("""SELECT c.c_name, r.revenue
  *                FROM graft_q3_join r JOIN customer c USING (c_custkey)""")
  * }}}
  *
  * Views are LOGICAL-PLAN registrations: `createOrReplaceTempView`
  * stores the unexecuted plan, so Catalyst optimizes each
  * `spark.sql(...)` through the view exactly as it does the Scala
  * surface — predicate pushdown and column pruning reach THROUGH a view
  * into the operator's scans (a `WHERE` on a view column prunes like a
  * `.filter` on the DataFrame). The handful of eager operators
  * (trainers, component loops) run their loops at registration time,
  * same as first Scala invocation — their session caches make that a
  * once-per-session cost.
  *
  * Raw tables register alongside ([[registerTables]]) so SQL can join
  * operator outputs back to dimensions.
  */
object SqlSurface {

  /** Source-table views (region … embeddings) over `dir`. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    graft.core.Tables.names.foreach { t =>
      graft.core.Tables.byName(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register `graft_<name>` views for `names` (default: the whole
    * board) plus the raw tables. Returns the registered view names.
    */
  def register(spark: SparkSession, dir: String,
      names: Iterable[String] = SparkEntry.queries.keys): Seq[String] = {
    registerTables(spark, dir)
    names.toSeq.sorted.map { name =>
      val view = s"graft_$name"
      SparkEntry.queries(name)(spark, dir).createOrReplaceTempView(view)
      view
    }
  }
}
