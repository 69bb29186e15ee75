package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line — raw on stdout (build.sbt sets
  * `run / outputStrategy := StdoutOutput` so sbt can't prefix it with
  * "[info] ", which lost the bench signal in rounds 1 and 2) and to the
  * file named by args(0) / SPARK_GRAFT_BENCH_OUT (default `bench.json`).
  *
  * Timing protocol (VERDICT r1 + ADVICE r2):
  *  - untimed warmup pass first (JVM/codegen/parquet-footer warmup, and
  *    it populates the session dictionary/shingle caches — steady-state
  *    throughput is the deployment shape);
  *  - sorted key order so rounds are comparable;
  *  - materialize via a noop-format WRITE, not count(): count() lets
  *    Catalyst prune every column, so map-shaped queries (scores,
  *    quality, kernels) would benchmark only their scan+joins;
  *  - a failing query is recorded in "errors" and EXCLUDED from the
  *    total, never silently counted as a fast run;
  *  - per-query COLD timings ("queries_cold"/"total_cold", round 6):
  *    derived-tier caches evicted before one timed run, so session-
  *    cached ops report compute-inclusive numbers a regression gate can
  *    bite on; "queries"/"value" keep the warm steady-state semantics
  *    of earlier rounds (comparable across BENCH_r files).
  */
object Bench {

  /** Headline subset: representative per block, bounded at sf0.1. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join", "q5_join_region", "q1_rollup",
    "q13_custdist", "q17_small_qty",
    "events_windowed_agg", "events_sessionize",
    "events_json_extract", "events_asof_join", "join_range",
    "events_funnel", "events_retention", "events_anomaly",
    "events_value_quantiles", "events_cusum",
    "sketch_hll", "sketch_countmin", "sketch_bloom", "basket_part_pairs",
    "join_salted",
    "dict_encode_entities", "triples_encode", "cp_mttkrp", "cp_als_sweep",
    "rescal_als_core", "graph_pagerank", "graph_wcc", "graph_triangles",
    "tensor_block_partition", "tensor_ttm", "neg_sample_lcwa",
    "kge_transe_score", "kge_distmult_score", "kge_rescal_score",
    "kge_hole_score", "kge_complex_score", "kge_rotate_score",
    "kge_loss_ranking",
    "dedup_exact", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_jaccard_join",
    "corpus_clean", "decontaminate_ngrams",
    "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
    "ann_pq_trained",
    "ann_ivfpq_topk", "ann_refine_rerank", "cluster_kmeans",
    "embed_quantize_int8",
    "embed_pca_power",
    "dedup_components",
    "text_quality_score", "text_token_count", "text_fingerprint",
    "text_pii_scrub", "quality_gopher_rules",
    "quality_buckets",
    "text_repetition",
    "text_tfidf", "text_bm25", "search_rrf_rerank", "text_ngram_lm",
    "text_perplexity",
    "vocab_pair_merges",
    "vocab_bpe_learn", "bpe_encode", "quality_lr_train_step",
    "sample_stratified", "sample_temperature", "corpus_mix_report",
    "shard_assign",
    "doc_length_stats",
    "media_metadata", "media_frame_sample",
    "streaming_windowed_agg", "streaming_dedup",
    // round-6 session-4 additions
    "dedup_spans", "text_entropy", "mix_epochs", "sample_exact_n",
    "graph_linkpred", "graph_walks", "graph_kcore", "graph_bfs",
    "embed_random_projection", "corpus_curriculum", "quality_lr_infer",
    "events_interarrival", "text_langid_eval", "search_maxsim",
    "table_merge_upsert", "scd2_history", "events_cube", "pack_bins",
    "rdf_infer_chain",
    // round-6 session-5 additions
    "rdf_char_sets", "rdf_bgp_star", "scd2_attach", "sketch_kmv",
    "text_hash_features", "embed_truncate_eval",
    "sample_dsir", "text_pmi_phrases", "embed_binarize_hamming",
    "graph_lpa", "basket_rules", "dedup_incremental",
    "dq_checks", "join_fuzzy", "events_mad", "dq_profile", "rdf_shacl_check",
    // round-6 session-6 additions
    "kge_relation_cats", "neg_sample_bernoulli", "neg_sample_typed",
    "graph_modularity", "rdf_bgp_optional", "table_diff",
    "graph_assortativity", "streaming_latest_state", "events_cohort_ltv",
    "quality_calibration", "tensor_unfold", "ann_recall_report",
    "events_markov_transitions", "vocab_fertility", "sketch_ams_f2",
    "events_windowed_topk", "events_forecast",
    // round-6 session-7 additions
    "q4_priority_semi", "q16_supplier_cnt", "q22_idle_balance",
    "events_ewma", "media_ahash_dedup", "graph_closeness", "dq_drift_psi",
    "text_zipf", "media_caption_pairs", "source_ntriples_pushdown",
    "kge_transh_score", "view_delta_maintain", "events_attribution",
    "graph_hits", "events_growth_accounting", "table_file_skipping",
    "events_ab_test", "sample_neyman_alloc", "events_power_analysis",
    "dedup_containment", "dq_benford", "dq_k_anonymity",
    "events_survival", "rec_item_neighbors", "graph_scc", "events_rfm",
    "feat_woe_iv", "events_stickiness", "neg_sample_adversarial",
    "q6_forecast", "q7_volume", "q10_returned", "q14_promo",
    "q18_large_orders", "events_holt", "text_rake", "kge_transr_score",
    "sample_weighted_reservoir", "graph_katz", "basket_triples",
    "media_scene_cuts", "events_top_paths", "streaming_funnel",
    "price_elasticity", "search_mmr_rerank", "events_markov_stationary",
    "text_burstiness", "orders_lead_time", "text_heaps_law",
    "events_entropy_rate", "revenue_concentration", "graph_walk_pairs",
    "events_dow_uniformity", "kge_pairre_score", "embed_lang_centroids",
    "events_bounce",
    "q15_top_supplier", "q19_brackets", "q21_late_supplier", "q8_mkt_share",
    "events_acf", "events_funnel_latency", "events_pivot",
    // round-6 session-9 additions
    "sketch_moments", "events_audience_overlap",
    "events_seasonal_decompose", "events_concurrency",
    "kge_simple_score", "kge_quate_score",
    "graph_clustering_coeff", "text_readability",
    "text_score_correlation", "embed_isotropy", "dedup_novelty",
    "streaming_topk", "text_chunk_windows",
    "kge_transe_train_step_adamw", "events_holt_winters",
    "media_audio_energy", "text_llr_collocations",
    "q9_profit", "events_xcorr", "ann_mips_topk", "kge_eval_mrr_ci",
    "events_stl_anomaly", "dq_ks_test",
    "graph_conductance", "table_compact_plan",
    "embed_pq_distortion", "dedup_jaccard_hist", "split_kfold",
    // round-7 additions
    "kge_eval_both_bounded", "dict_persist_roundtrip",
    "kge_transe_train_step2_adamw", "dedup_rate_by_source",
    "split_temporal", "ann_nprobe_sweep", "kge_score_calibration",
    "rdf_path_census", "embed_hard_negatives",
    "dq_js_divergence", "quality_gate_agreement", "orders_backlog",
    "kge_tucker_score", "decontaminate_coverage",
    "embed_cluster_silhouette", "kge_eval_by_degree", "media_phash",
    "rdf_bgp_path", "sample_ess", "graph_betweenness",
    "q2_min_cost", "q11_share", "q20_excess",
    "kge_eval_by_category", "text_vocab_drift",
    "q12_shipmode", "dq_fk_orphans",
    "corpus_source_overlap", "embed_dim_stats",
    "media_color_stats", "sketch_quantile", "graph_diameter",
    "source_schema_evolution",
    "events_diff_in_diff", "search_prf_expand",
    "events_cuped", "text_textrank",
    "dict_delta_update", "events_sequential_test",
    // round-8 additions
    "kge_checkpoint_roundtrip", "kge_transe_train_step2_adagrad",
    "pipeline_e2e", "events_changepoint", "embed_sq_recall",
    "events_ab_holm", "events_quantile_ab",
    // round-9 additions
    "ann_index_roundtrip", "events_changepoints_multi",
    "events_quantile_ab_ci", "ann_index_delta",
    "streaming_restart_sessionize",
    // round-10 additions
    "embed_hamming_mih")

  /** Force full materialization of every output column. */
  private def run(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT")).getOrElse("bench.json")
    run(sfDir, out)
  }

  /** Real-JSON artifact parse (ADVICE r9: the old regex worked only on
    * our own emitter and would silently yield Map.empty on any format
    * change). Jackson rides the Spark classpath.
    * Returns (sf, cpus, queries); cpus is None for pre-r11 artifacts
    * that did not record it.
    */
  private[graft] def parseArtifact(path: java.nio.file.Path)
      : Option[(String, Option[Int], Map[String, Double])] =
    try {
      if (!Files.exists(path)) None
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(Files.readString(path))
        val sf = Option(root.get("sf")).map(_.asText).getOrElse("")
        val cpus = Option(root.get("cpus")).map(_.asInt)
        val qn = root.get("queries")
        if (qn == null || !qn.isObject) None
        else {
          val it = qn.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val e = it.next(); b += e.getKey -> e.getValue.asDouble
          }
          Some((sf, cpus, b.result()))
        }
      }
    } catch { case _: Throwable => None }

  /** Callable form (tools/BenchScale drives it against synthetic SFs). */
  def run(sfDir: String, out: String): Unit = {
    // Hard session wall budget (VERDICT r10 item 1): the r10 driver run
    // timed out at BOTH cpu counts (rc 124, parsed null — every query
    // "dropped") because the retime pass had no cap and no budget. The
    // budget never drops a query: past it, a query keeps ONE warm timed
    // leg (still "min of warm runs", n=1) and sheds the extras (cold
    // leg, second warm leg, retimes) — a complete artifact on a slow
    // host beats a perfect one that never lands. Parameterised for
    // slower/production hosts; the default fits the driver's observed
    // ~1 h ceiling with headroom for JVM+sbt startup.
    val sessionT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - sessionT0) / 1e9
    val wallBudget = sys.env.get("SPARK_GRAFT_BENCH_WALL_SEC")
      .flatMap(_.toDoubleOption).getOrElse(2700.0)
    val maxRetimes = sys.env.get("SPARK_GRAFT_BENCH_MAX_RETIMES")
      .flatMap(_.toIntOption).getOrElse(12)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)

    // Trailing reference for the marathon-retime trigger: the previous
    // bench.json at this path PLUS its predecessor (Bench archives the
    // overwritten artifact as <out>.prev each run), per-query MIN of
    // the two — one inflated prior round can no longer mask a
    // regression or spuriously spare a suspect. Artifacts whose "sf"
    // differs from this run's are ignored (ADVICE r9: comparing warm
    // times across scale factors triggered/masked retimes bogusly), and
    // so are artifacts from a DIFFERENT core count (r10: the driver's
    // 8-cpu leg compared itself to the committed 32-cpu artifact, so
    // ~the whole board read as a 2× "regression" and the uncapped
    // retime pass ran the session into its timeout). Artifacts that
    // predate the cpus field are likewise ignored — no reference means
    // no retimes, which is the safe side.
    val candidates = Seq(Paths.get(out), Paths.get(out + ".prev"))
    val matching = candidates.flatMap(p =>
      parseArtifact(p).collect {
        case (sf, c, qs) if sf == sfDir && cpus.toIntOption.exists(c.contains) =>
          (p.toString, qs)
      })
    val trailingSource: Seq[String] = matching.map(_._1)
    val prior: Map[String, Double] = matching.map(_._2)
      .foldLeft(Map.empty[String, Double]) { (acc, m) =>
        (acc.keySet ++ m.keySet).iterator.map { k =>
          k -> math.min(acc.getOrElse(k, Double.MaxValue),
            m.getOrElse(k, Double.MaxValue))
        }.toMap
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Logs.quietBoundedWindowWarnings()
    graft.core.Logs.quietCheckpointEvictionWarnings()
    graft.core.Caches.enableCheckpointSweep()
    SparkEntry.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    val tally = new graft.core.ShuffleTally().attach(spark.sparkContext)

    // Optional subset (comma list) for bounded scale smokes: the
    // synthetic-sf1 run (tools/BenchScale) grew past a session budget
    // once the eval-family headliners joined — their filtered-ranking
    // pair space is ~100× sf0.1's at sf1 — so the scale artifact runs
    // a representative subset there while sf0.1 keeps the full set.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val names = headline.filter(SparkEntry.queries.contains)
      .filter(n => only.isEmpty || only(n)).sorted
    names.foreach { name =>
      try run(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
    }

    var degraded = List.empty[String]
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      // Budget check ONCE per query, before its legs: past the wall
      // budget the query keeps one warm timed leg and sheds the cold
      // leg + second warm leg (recorded in "budget_degraded" so the
      // artifact says which numbers are n=1).
      val overBudget = elapsedSec > wallBudget
      if (overBudget) degraded ::= name
      // COLD run first (ADVICE r5 / VERDICT item 2): evict the derived
      // cache tier so session-cached ops (graph_pagerank's iteration
      // frames, the shared BM25 ranked frame, embeddings, shingles)
      // recompute — the compute-inclusive number a plan-regression gate
      // can bite on. The infra tier (triple view, dictionaries) stays:
      // at 100 TB those are materialized-once parquet, not per-query
      // work, so charging them to whichever query runs first would only
      // add noise. The cold run repopulates the query's own caches, so
      // the warm pair that follows measures today's steady-state shape.
      val coldRes: Option[(Double, Option[String])] = if (overBudget) None else {
        graft.core.Caches.clearDerived()
        System.gc()
        val tc0 = System.nanoTime()
        val coldErr: Option[String] =
          try { run(fn(spark, sfDir)); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        Some(((System.nanoTime() - tc0) / 1e9, coldErr))
      }
      // Two warm timed runs, report the MIN: the host shows 2-5% CPU
      // steal and round-3's driver run had two queries inflated 10-30×
      // by a transient contention window (cp_mttkrp 46.8 s vs 1.5 s
      // steady-state). The min of two runs is robust to a one-off stall
      // while still charging real recompute to the query.
      // Shuffle accounting (VERDICT r7 item 8): snapshot the listener
      // totals around warm run 1 — plans are deterministic, so run 1's
      // exchanged bytes/records ARE the query's shuffle profile. The
      // settle waits sit OUTSIDE the timing windows.
      val shufBefore = tally.settle()
      var shufAfterRun1 = shufBefore
      val warmLegs = if (overBudget) 1 else 2
      val timed = (1 to warmLegs).map { i =>
        // GC boundary: after the warmup pass the heap is full of cached
        // blocks + codegen classes, and collector pauses were landing
        // INSIDE whichever query ran next (bimodal 1.6 s vs 90 s for the
        // same query, run-to-run). Collecting between queries charges GC
        // to the harness, not to an arbitrary victim query.
        System.gc()
        val t0 = System.nanoTime()
        val err: Option[String] =
          try { run(fn(spark, sfDir)); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 1) shufAfterRun1 = tally.settle()
        (dt, err)
      }
      val sb = shufBefore; val sa = shufAfterRun1
      val shuf = (sa._1 - sb._1, sa._2 - sb._2, sa._3 - sb._3, sa._4 - sb._4)
      // err only when EVERY run failed; one good run is a valid timing
      val good = timed.filter(_._2.isEmpty)
      val (warm, err) =
        if (good.nonEmpty) (good.map(_._1).min, None)
        else (timed.map(_._1).min, timed.head._2)
      val cold = coldRes.collect { case (c, None) => c }
      (name, warm, cold, err, shuf)
    }

    // Automated marathon-retime (VERDICT r8 item 6, trigger retuned per
    // VERDICT r9 item 2): a long session's GC/compaction interference
    // can inflate a single query 10×+ (streaming_windowed_agg read 17 s
    // in-board vs 1.37 s solo in r8), and r9's looser 3×/1 s gate let
    // 13 phantom +1.5× regressions (~21 s) into the artifact uncaught.
    // Any query whose warm time exceeds 1.5× its trailing reference
    // (min of the last two same-sf same-cpus artifacts) above a 0.3 s
    // floor is re-timed at the END of the run; the artifact records
    // {marathon, solo} and the reported warm value is the min — still
    // "min of warm runs", just with the suspects granted extras. A solo
    // leg that THROWS is discarded rather than timed (ADVICE r9: a
    // fast-failing retime used to publish its tiny elapsed as a bogus
    // low warm value); if every solo leg fails, the in-board warm
    // stands and no retime is recorded.
    // r11 (VERDICT r10 items 1): the pass is BOUNDED — suspects are
    // ranked by inflation ratio and capped at maxRetimes, the pass
    // stops once the session passes 85% of the wall budget, and the
    // trigger threshold is normalized by the session's MEDIAN
    // warm/trailing ratio so a uniformly slower host (the r10 failure
    // mode: driver box vs builder's best-of-two minima) does not flag
    // the whole board — retimes exist to strip per-query interference,
    // not to re-litigate host speed.
    val ratios = results.collect {
      case (name, warm, _, None, _) if prior.contains(name) && warm > 0.3 =>
        name -> warm / prior(name)
    }
    val medianRatio = {
      val rs = ratios.map(_._2).sorted
      if (rs.isEmpty) 1.0 else rs(rs.size / 2)
    }
    val suspects = ratios
      .filter { case (_, r) => r > 1.5 * math.max(1.0, medianRatio) }
      .sortBy(-_._2).take(maxRetimes).map(_._1)
    val retimed: Map[String, (Double, Double)] = suspects.flatMap { name =>
      if (elapsedSec > 0.85 * wallBudget) None
      else {
        val warm = results.collectFirst { case (`name`, w, _, _, _) => w }.get
        val fn = SparkEntry.queries(name)
        val soloOk = (1 to 2).flatMap { _ =>
          System.gc()
          val t0 = System.nanoTime()
          val ok = try { run(fn(spark, sfDir)); true }
                   catch { case _: Throwable => false }
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }
        soloOk.minOption.map(solo => name -> (warm, solo))
      }
    }.toMap

    def jq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val ok = results
      .map { case (k, v, c, e, s) =>
        (k, retimed.get(k).map(r => math.min(v, r._2)).getOrElse(v), c, e, s) }
      .filter(_._4.isEmpty)
    val qs = ok.map { case (k, v, _, _, _) => jq(k) + ":" + v }
      .mkString("{", ",", "}")
    val retimes = retimed.map { case (k, (m, s)) =>
      jq(k) + s""":{"marathon":$m,"solo":$s}"""
    }.mkString("{", ",", "}")
    val colds = results.collect { case (k, _, Some(c), _, _) => jq(k) + ":" + c }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e), _) => jq(k) + ":" + jq(e) }
      .mkString("{", ",", "}")
    // Per-query shuffle profile (one warm run): exchanged bytes and rows.
    val shufs = results.map { case (k, _, _, _, (rb, rr, wb, wr)) =>
      jq(k) + s""":{"read_b":$rb,"read_rows":$rr,"write_b":$wb,"write_rows":$wr}"""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val totalCold = results.flatMap(_._3).sum
    // trailing_source (VERDICT r9 item 8): name the artifacts that
    // supplied the retime reference values, so cross-round diffs are
    // machine-explainable from the artifact alone.
    val tsrc = trailingSource.map(jq).mkString("[", ",", "]")
    // cpus: lets the next run's retime trigger reject cross-core-count
    // references; budget_degraded: names whose warm is n=1 (and cold
    // absent) because the session passed the wall budget before them.
    val degr = degraded.reverse.map(jq).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$colds,"total_cold":$totalCold,"errors":$errs,"retimed":$retimes,"trailing_source":$tsrc,"shuffle":$shufs,"cpus":$cpus,"wall_sec":${math.round(elapsedSec * 10) / 10.0},"budget_degraded":$degr,"sf":"$sfDir"}"""
    // Archive the artifact being overwritten: <out>.prev is the second
    // leg of the next run's min-of-last-two trailing reference.
    val outP = Paths.get(out)
    if (Files.exists(outP))
      Files.copy(outP, Paths.get(out + ".prev"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.writeString(outP, json + "\n")
    // stdout gets a COMPACT line (round 6: the driver records only a
    // ~2 kB tail of stdout, so the 200+-query line arrived truncated
    // and parsed as null). Totals + errors + the slowest queries fit
    // the tail window; the full per-query artifact is the file above.
    val slow = ok.sortBy(-_._2).take(12)
      .map { case (k, v, _, _, _) => jq(k) + ":" + math.round(v * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$slow,"n_queries":${ok.size},"total_cold":$totalCold,"errors":$errs,"sf":"$sfDir","artifact":"$out"}""")
    graft.core.Caches.clearAll()
    spark.stop()
  }
}
