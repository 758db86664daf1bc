package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query seconds.
  *
  * Execution drives the FULL plan — `noop` format write, not `.count()`
  * (count lets Catalyst prune every data column, so scan/projection-heavy
  * plans would bench nothing) — and failures are recorded per-query
  * instead of masquerading as fast successes.
  */
object Bench {

  /** Headline set: the scan/join/agg/window/set relational core plus the
    * LLM-pipeline ops. Streaming + catalog paths are exercised by Verify
    * and the test suite, not timed here (memory-sink streaming timing
    * measures the harness, not the engine). */
  val headline: Seq[String] = Seq(
    "q_scan_filter_project_limit", "q_agg_pricing_summary",
    "q_join_broadcast", "q_join_shuffle", "q_join_semi",
    "q_window_rank", "q_window_running", "q_topk", "q_rollup",
    "q_count_distinct", "q_scalar_string", "q_json_extract",
    "q_sql_revenue_topk", "q_sessionize", "q_range_join", "q_pivot",
    "q_percentile", "q_topk_agg", "q_join_salted", "q_join_bucketed",
    "q_window_navigation", "q_lateral_explode",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_topk_brute", "sim_topk_ann", "sim_vector_norm",
    "dedup_embedding_cosine", "sim_topk_ivf", "q_session_window",
    "text_stats", "text_token_count", "text_source_profile",
    "mm_binary_meta",
    "sim_kmeans", "text_gopher_quality", "text_top_ngrams",
    "q_temperature_mix", "q_zorder_layout",
    "text_dedup_spans", "sim_random_projection", "q_unpivot",
    "q_salted_agg", "q_variant_json",
    "text_unigram_logprob", "mm_image_patches", "q_approx_percentile",
    "q_map_funcs", "text_bm25_topk", "text_repetition", "dedup_semantic",
    "text_quality_classifier", "text_count_min", "q_winsorized_mean",
    "text_pmi_bigrams", "text_difficulty_curriculum",
    "q_histogram", "q_funnel",
    "q_weighted_sample", "q_mixture_epochs", "q_compaction_plan",
    "text_drift_psi", "q_bloom_join", "q_hll_rollup", "q_hilbert_layout",
    "q_theta_setops", "q_kll_rollup", "q_multiway_join",
    "q_concurrency_sweep", "graph_pagerank", "graph_reachability",
    "q_skyline", "sim_pq_adc", "q_scd2_intervals", "q_gap_fill",
    "q_topk_sketch_rollup", "q_rolling_anomaly", "q_cohort_retention",
    "q_markov_transitions", "q_shard_pack", "graph_common_neighbors",
    "q_rfm_segmentation", "q_changepoint_cusum", "text_zipf_slope",
    "q_benford_digits", "q_referential_audit", "graph_triangles")

  /** Bench-only RAW operator variants. The gate versions of these
    * queries certify QUALITY by computing the exact ground truth in-plan
    * (brute-force top-k, all-true-pair sets, exact percentiles) next to
    * the approximate operator — correct for the correctness gate, wrong
    * for a throughput benchmark: the truth pipeline would dominate the
    * timing and dilute regressions in the operator under test. The bench
    * therefore times the raw approximate operator; Verify still runs the
    * certified versions. */
  private def rawBench(name: String)
      : Option[(SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}
    name match {
      case "sim_topk_ann" => Some((s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.annTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      })
      case "sim_topk_ivf" => Some((s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
          numCells = 32, nprobe = 8)
      })
      case "dedup_simhash" => Some((s, d) =>
        Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 3))
      case "dedup_embedding_cosine" => Some((s, d) =>
        Similarity.cosinePairs(Tables.embeddings(s, d), threshold = 0.3))
      case "q_approx_distinct" => Some((s, d) =>
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(approx_count_distinct("l_partkey", 0.01).as("approx_parts")))
      case "q_approx_percentile" => Some((s, d) =>
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(approx_percentile(col("l_extendedprice"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("apx")))
      case _ => None
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]

    // Warmup: run every headline plan once at the smallest SF so one-time
    // JVM costs (whole-stage codegen compilation, expression class
    // loading, writer init) are paid before timing — they are properties
    // of a cold JVM, not of the measured queries (a long-lived cluster
    // has them amortized to zero).
    val warmDir = "/root/testdata/sf0.001"
    headline.foreach { name =>
      rawBench(name).orElse(qs.get(name)).foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        CacheRegistry.releaseAll()
      }
    }
    // One-time INGEST steps for the measured sf dir (bucketed table
    // staging, streaming µs copy) are layout/ingest cost, not query
    // time — run them before the clock starts. A staging failure is
    // recorded: swallowing it would silently shift the ingest work into
    // the timed query that retries it.
    try graft.operators.BucketedJoin.stageBucketed(spark, sfDir)
    catch { case e: Throwable => errors += s"stage_bucketed: ${e.getClass.getSimpleName}" }
    try graft.operators.StreamingOps.stagedEventsDir(spark, sfDir)
    catch { case e: Throwable => errors += s"stage_events: ${e.getClass.getSimpleName}" }

    // Median-of-N over WHOLE-SUITE passes: this host shows migrating
    // ~20 s contention windows that poison a contiguous run-order block
    // (observed two rounds in a row on byte-identical code). Back-to-back
    // repeats of one short query would all fit inside one window, so the
    // repetition is the OUTER loop — the suite runs end to end N times
    // (each pass takes ~30 s+, longer than a window) and a window can
    // only poison a given query in one pass. Per-query median across
    // passes filters it; min is reported too as the contention-free
    // floor. A failed run is excluded from the timing (its near-zero
    // elapsed would otherwise masquerade as a speedup) and recorded once
    // in `errors`.
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val benched = headline.flatMap(n =>
      rawBench(n).orElse(qs.get(n)).map(n -> _))
    val errored = scala.collection.mutable.Set.empty[String]
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to runsPerQuery; (name, fn) <- benched) {
      val t0 = System.nanoTime()
      val ok =
        try {
          // noop sink: full plan executes (scan→…→result), nothing lands.
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            if (errored.add(name))
              errors += s"$name: ${e.getClass.getSimpleName}"
            false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // release operator-internal caches OUTSIDE the timed window —
      // they'd otherwise accumulate across the whole run
      CacheRegistry.releaseAll()
      if (ok) times(name) = times(name) :+ elapsed
    }
    val results = benched.map { case (name, _) =>
      val ts = times(name).sorted
      if (ts.isEmpty) name -> (0.0, 0.0)
      else name -> (ts(ts.length / 2), ts.head)
    }
    val qJson = results.map { case (k, (med, _)) => f""""$k":$med%.3f""" }
      .mkString("{", ",", "}")
    val qMinJson = results.map { case (k, (_, mn)) => f""""$k":$mn%.3f""" }
      .mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" + e.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runsPerQuery,"queries":$qJson,"queries_min":$qMinJson,"errors":$errJson,"sf":"$sfDir"}""")
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0) // don't let stray non-daemon threads pin the JVM
  }
}
