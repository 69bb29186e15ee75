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

  /** Operators whose BUILDER runs Spark jobs before returning a frame
    * (VERDICT r8 item 7): trainer epoch loops and their unrolled steps,
    * localCheckpoint-based graph/component iterations, ALS solves,
    * staging writes (persisted artifacts, source fixtures), streaming
    * runs, and sweeps with driver-side collects. Registering these
    * executes that work once — same as the first Scala invocation;
    * their session caches make it a once-per-session cost. Everything
    * else registers as a pure unexecuted logical plan.
    *
    * Measured, not guessed: `graft.tools.EagerAudit` counts jobs at
    * build time per query, and SqlSurfaceSpec pins that registering the
    * complement of this set triggers ZERO jobs.
    */
  val EagerNames: Set[String] = Set(
    // trainers + unrolled optimizer steps (collect the loss / loop)
    "kge_transe_train", "kge_transe_train_adagrad", "kge_transe_train_adam",
    "kge_transe_train_adamw", "kge_distmult_train", "kge_hole_train",
    "kge_complex_train", "kge_rescal_train", "kge_train_eval",
    "kge_transe_train_step", "kge_transe_train_step_adagrad",
    "kge_transe_train_step_adam", "kge_transe_train_step_adamw",
    "kge_transe_train_step2_adagrad", "kge_transe_train_step2_adamw",
    "kge_distmult_train_step", "kge_hole_train_step",
    "kge_complex_train_step", "kge_rescal_train_step",
    "kge_checkpoint_roundtrip",
    // trained-artifact consumers (LR weights, BPE merges — the shared
    // driver-side artifact trains on first cold touch)
    "quality_lr_infer", "quality_calibration", "vocab_bpe_learn",
    "vocab_fertility",
    // ALS (driver-side Gram solves)
    "cp_als", "cp_als_sweep", "rescal_als", "rescal_als_core",
    // iterative graph algorithms (localCheckpoint per round)
    "graph_pagerank", "graph_ppr", "graph_wcc", "graph_scc", "graph_bfs",
    "graph_kcore", "graph_lpa", "graph_hits", "graph_katz",
    "graph_closeness", "graph_betweenness", "graph_conductance",
    "graph_diameter", "graph_walk_pairs", "graph_walks",
    "graph_modularity", "rdf_infer_chain",
    // component loops + their consumers
    "dedup_components", "dedup_canonical", "dedup_rate_by_source",
    "dedup_lsh_recall", "split_holdout", "embed_semantic_clusters",
    "pipeline_e2e",
    // driver-side merge/codebook/probe loops and sweeps
    "bpe_encode", "ann_nprobe_sweep", "ann_index_roundtrip",
    "ann_index_delta", "search_mmr_rerank", "events_ab_holm",
    // r10: localCheckpoint'ed shared intermediates (truth frame /
    // per-level accepted splits) — AQE finalizes the checkpointed plan
    // at build time, so registration executes it
    "ann_recall_report", "events_changepoints_multi",
    // staging writes (persisted artifacts / source fixtures; fixtures
    // staged at EXECUTION — e.g. dq_fk_orphans — stay lazy: the first
    // query of the view pays them, not registration)
    "dict_persist_roundtrip", "dict_delta_update",
    "source_orc_roundtrip", "source_ntriples_pushdown",
    "source_partitioned_prune", "source_schema_evolution", "join_bucketed",
    // streaming runs (the query executes to its sink in the builder)
    "streaming_windowed_agg", "streaming_sessionize", "streaming_dedup",
    "streaming_enrich", "streaming_join", "streaming_countmin",
    "streaming_hll", "streaming_bloom", "streaming_anomaly",
    "streaming_value_hist", "streaming_ams", "streaming_kmv",
    "streaming_drift", "streaming_latest_state", "streaming_user_state",
    "streaming_funnel", "streaming_topk", "streaming_quality_filter",
    "streaming_restart_sessionize")

  /** Register ONLY the pure-logical-plan views (the board minus
    * [[EagerNames]]) — a SQL user cataloging the surface to run one
    * aggregate pays for NO trainer loop, staging write, or streaming
    * run (SqlSurfaceSpec pins zero jobs). Raw tables register too.
    */
  def registerLazy(spark: SparkSession, dir: String): Seq[String] =
    register(spark, dir,
      SparkEntry.queries.keys.filterNot(EagerNames).toSeq)

  /** Register the eager views — the documented pay-at-registration
    * set; call when the SQL session actually needs them.
    */
  def registerEager(spark: SparkSession, dir: String): Seq[String] =
    register(spark, dir, EagerNames.toSeq)
}
