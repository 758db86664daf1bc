package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the headline queries — the
  * plan-shape audit trail (pushdown, broadcast, partial aggregation,
  * codegen spans). Run: `sbt "runMain graft.PlanAudit" > PLANS.md`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val audit = Seq("q_scan_filter_project_limit", "q_agg_pricing_summary",
      "q_join_broadcast", "q_join_shuffle", "q_topk", "q_window_rank",
      "dedup_exact", "sim_topk_brute", "sim_topk_ivf", "connector_filter_pushdown",
      "q_range_join", "q_join_bucketed", "q_join_salted", "q_topk_agg",
      "dedup_minhash_lsh", "q_lateral_explode",
      "connector_partition_values", "q_setops_all", "q_window_range",
      "q_temperature_mix", "q_zorder_layout", "sim_kmeans",
      "text_dedup_spans", "sim_random_projection", "q_salted_agg",
      "q_map_funcs", "text_unigram_logprob", "q_unpivot",
      "text_bm25_topk", "text_repetition", "dedup_semantic",
      "q_asof_join_salted",
      "text_quality_classifier", "text_count_min", "q_winsorized_mean",
      "text_pmi_bigrams", "text_difficulty_curriculum",
      "q_histogram", "q_funnel",
      "q_weighted_sample", "q_mixture_epochs", "q_compaction_plan",
      "text_drift_psi", "q_bloom_join", "q_hll_rollup", "q_hilbert_layout",
      "q_theta_setops", "q_kll_rollup", "q_multiway_join",
      "q_concurrency_sweep", "graph_pagerank", "graph_reachability",
      "q_skyline", "sim_pq_adc", "q_scd2_intervals", "q_gap_fill",
      "q_topk_sketch_rollup")
    val qs = SparkEntry.queries
    audit.foreach { name =>
      println(s"\n## $name\n")
      println("```")
      println(qs(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0) // embedded-server threads must not pin the JVM
  }
}
