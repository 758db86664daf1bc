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
    "q_map_funcs")

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
      qs.get(name).foreach { fn =>
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

    // Median-of-N: this host shows migrating ~20 s contention windows that
    // poison a contiguous block of a single-shot run (observed two rounds
    // in a row on byte-identical code). Three interleaved-in-time runs per
    // query and the median filters any one-off window; min is reported too
    // as the contention-free floor.
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val results = headline.flatMap { name =>
      qs.get(name).map { fn =>
        val times = (1 to runsPerQuery).map { _ =>
          val t0 = System.nanoTime()
          try {
            // noop sink: full plan executes (scan→…→result), nothing lands.
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          } catch {
            case e: Throwable =>
              errors += s"$name: ${e.getClass.getSimpleName}"
          }
          val elapsed = (System.nanoTime() - t0) / 1e9
          // release operator-internal caches OUTSIDE the timed window —
          // they'd otherwise accumulate across the whole run
          CacheRegistry.releaseAll()
          elapsed
        }.sorted
        name -> (times(times.length / 2), times.head)
      }
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
