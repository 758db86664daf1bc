package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the `events` table. The reference has
  * no streaming (its CDF endpoint is a `todo!()`, reference
  * src/client/mod.rs:384-386); this is north-star capability.
  *
  * Batch/stream parity is the design rule: the same aggregation expressed
  * on `readStream` must equal the batch result — the driver's oracle
  * checks exactly that (the streaming result's oracle is plain batch SQL).
  * Executed with Trigger.AvailableNow into a memory sink for the
  * verification harness; in production the same plan writes to a real sink
  * with checkpointing, and the windowed variant carries a watermark so
  * state is bounded at 100 TB/day rates.
  */
object StreamingOps {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The testdata events parquet carries TIMESTAMP(NANOS), which the file
    * stream source's footer reader rejects (batch reads are fine). Stage
    * a µs-precision copy once per sfDir and stream from that. The dir
    * suffix is a name-UUID of the path — collision-free and always a
    * valid identifier (Int hashCode can collide or be negative). */
  def stagedEventsDir(spark: SparkSession, sfDir: String): String =
    staged.getOrElseUpdate(sfDir, {
      val dir = "/tmp/graft_stream_stage_" + java.util.UUID
        .nameUUIDFromBytes(sfDir.getBytes("UTF-8")).toString.take(8)
      Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
      dir
    })

  /** Run a streaming transform over the events parquet to completion
    * (AvailableNow) and return the final result as a DataFrame. */
  def runToCompletion(spark: SparkSession, sfDir: String,
      transform: DataFrame => DataFrame,
      outputMode: String): DataFrame =
    // One micro-batch for the whole staged dir (default is 1000 files
    // per trigger): the stateful transforms sort within a batch, so
    // cross-batch event-time disorder would silently skew their
    // results against the batch oracles.
    runDirToCompletion(spark, stagedEventsDir(spark, sfDir),
      Int.MaxValue, transform, outputMode)

  private def runDirToCompletion(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int, transform: DataFrame => DataFrame,
      outputMode: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    val sink = s"graft_stream_sink_${counter.incrementAndGet()}"
    val q = transform(stream).writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** The straggler decile `stagedLateDir` splits into the late second
    * batch — THE single definition of the batch split; the staging
    * filters, the oracle SQL and StreamingStateSpec all render their
    * predicates from these so they can never model different splits. */
  val lateStragglerMod = 10
  val lateStragglerRem = 7
  def isLateStraggler(eventId: Column): Column =
    eventId % lateStragglerMod === lateStragglerRem
  def lateStragglerSql(not: Boolean): String =
    s"event_id % $lateStragglerMod ${if (not) "<>" else "="} $lateStragglerRem"

  /** Two-file staging for the late-data query: `b1.parquet` (everything
    * but the straggler decile) with an older mtime, then `b2.parquet`
    * (the stragglers) — the file source processes oldest-mtime first, so
    * with maxFilesPerTrigger=1 the stragglers arrive as a SECOND
    * micro-batch after the watermark has advanced past their windows. */
  def stagedLateDir(spark: SparkSession, sfDir: String): String =
    staged.getOrElseUpdate("late:" + sfDir, {
      val dir = "/tmp/graft_stream_late_" + java.util.UUID
        .nameUUIDFromBytes(("late:" + sfDir).getBytes("UTF-8")).toString.take(8)
      val root = new java.io.File(dir)
      root.mkdirs()
      val ev = Tables.events(spark, sfDir)
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = s"${dir}_tmp_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(root, s"$name.parquet")
        java.nio.file.Files.copy(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
      val now = System.currentTimeMillis()
      stage(ev.filter(!isLateStraggler(col("event_id"))), "b1", now - 180000)
      // eviction lags one batch: windows sealed by b1's watermark are
      // only emitted+evicted at the END of the batch AFTER b1 — the
      // empty middle file forces that eviction-only batch, so the
      // stragglers in b2 genuinely arrive to closed windows
      stage(ev.filter(lit(false)), "b_mid", now - 120000)
      stage(ev.filter(isLateStraggler(col("event_id"))), "b2", now - 60000)
      dir
    })

  def defs: Seq[QueryDef] = Seq(
    // Streaming grouped aggregation — must equal the batch answer.
    QueryDef.sql(
      "stream_agg_event_type",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      runToCompletion(s, d,
        df => df.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total")),
        outputMode = "complete")
        .orderBy("event_type")
    },

    // Streaming tumbling-window aggregation with a watermark (bounded
    // state); result equals the batch date_trunc bucketing.
    QueryDef.sql(
      "stream_windowed_counts",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
      runToCompletion(s, d,
        df => df.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("n")),
        outputMode = "complete")
        .orderBy("day")
    },

    // Streaming A/B monitor: the two-arm purchase moments maintained as
    // streaming state (complete mode — the dashboard a live experiment
    // watches), finished with the Welch z over the 2-row sink frame.
    // State is 2 rows × 3 exact aggregates regardless of corpus size;
    // parity oracle = the identical batch moments + the identical fixed
    // z tree (the q_ab_welch_ttest determinism conventions).
    QueryDef.sql(
      "stream_ab_monitor", {
        def m(t: String) = s"CAST(s1_$t AS DOUBLE) / n_$t"
        def va(t: String) = s"(CAST(s2_$t AS DOUBLE) - CAST(s1_$t AS DOUBLE)" +
          s" * CAST(s1_$t AS DOUBLE) / n_$t) / (n_$t - 1)"
        s"""WITH g AS (
          |  SELECT CAST(user_id % 2 = 0 AS INTEGER) AS treat,
          |    CAST(COUNT(*) AS BIGINT) AS n,
          |    SUM(CAST(value AS DECIMAL(18,2))) AS s1,
          |    SUM(CAST(value AS DECIMAL(18,2))
          |      * CAST(value AS DECIMAL(18,2))) AS s2
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |p AS (
          |  SELECT
          |    MAX(CASE WHEN treat = 1 THEN n END) AS n_t,
          |    MAX(CASE WHEN treat = 1 THEN s1 END) AS s1_t,
          |    MAX(CASE WHEN treat = 1 THEN s2 END) AS s2_t,
          |    MAX(CASE WHEN treat = 0 THEN n END) AS n_c,
          |    MAX(CASE WHEN treat = 0 THEN s1 END) AS s1_c,
          |    MAX(CASE WHEN treat = 0 THEN s2 END) AS s2_c
          |  FROM g)
          |SELECT n_t, n_c,
          |  round(${m("t")}, 4) AS mean_t, round(${m("c")}, 4) AS mean_c,
          |  round((${m("t")} - ${m("c")})
          |    / sqrt((${va("t")}) / n_t + (${va("c")}) / n_c), 4) AS z_stat
          |FROM p""".stripMargin
      }) { (s, d) =>
      val sink = runToCompletion(s, d,
        df => df.filter(col("event_type") === "purchase")
          .groupBy((col("user_id") % 2 === 0).cast("int").as("treat"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("s1"),
            sum(col("value").cast("decimal(18,2)")
              * col("value").cast("decimal(18,2)")).as("s2")),
        outputMode = "complete")
      def pick(t: Int, c: String, tag: String) =
        max(when(col("treat") === t, col(c))).as(s"${c}_$tag")
      val p = sink.agg(pick(1, "n", "t"), pick(1, "s1", "t"),
        pick(1, "s2", "t"), pick(0, "n", "c"), pick(0, "s1", "c"),
        pick(0, "s2", "c"))
      def m(t: String) = col(s"s1_$t").cast("double") / col(s"n_$t")
      def va(t: String) =
        (col(s"s2_$t").cast("double") - col(s"s1_$t").cast("double")
          * col(s"s1_$t").cast("double") / col(s"n_$t")) /
          (col(s"n_$t") - 1)
      p.select(col("n_t"), col("n_c"),
        round(m("t"), 4).as("mean_t"), round(m("c"), 4).as("mean_c"),
        round((m("t") - m("c")) /
          sqrt(va("t") / col("n_t") + va("c") / col("n_c")), 4)
          .as("z_stat"))
    },

    // Stream-static join: the streaming fact joins a static dimension
    // (broadcast per micro-batch), then aggregates — the canonical
    // enrichment topology. Result equals the batch join.
    QueryDef.sql(
      "stream_static_join",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val dim = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      runToCompletion(s, d,
        df => df.join(dim, df("user_id") === dim("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n")),
        outputMode = "complete")
        .orderBy("c_mktsegment")
    },

    // Stream-stream join: views joined to the same user's purchases
    // within the following hour, both sides watermarked so join state
    // is bounded (Spark drops buffered rows once the watermark passes
    // the time-range bound). The raw pairs land in the sink; the
    // deterministic check aggregates them per user against a DuckDB
    // range-join oracle.
    QueryDef.sql(
      "stream_stream_join",
      """SELECT v.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin) { (s, d) =>
      runToCompletion(s, d, df => {
        val views = df.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
          .withWatermark("v_ts", "2 hours")
        val purchases = df.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours")
        views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"))
      }, outputMode = "append")
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },

    // Custom stateful processing (flatMapGroupsWithState): gap-based
    // sessionization with explicit per-user state (last event second +
    // running session count) — the hand-rolled twin of session_window,
    // for state logic the built-ins can't express. State is one (long,
    // long) pair per user: bounded at any rate. Counts are cumulative
    // and monotone, so the final value per user is the max across
    // emissions; the oracle is the BATCH sessionization SQL.
    QueryDef.sql(
      "stream_stateful_sessions",
      """SELECT user_id, CAST(1 + SUM(is_new) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
        |              - lag(CAST(floor(epoch(ts)) AS BIGINT))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |) GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val result = runToCompletion(s, d, df => {
        import s.implicits._
        val events = df.select(col("user_id"),
            unix_timestamp(col("ts")).as("sec"), col("event_id"))
          .as[(Long, Long, Long)]
        events.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long), (Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (user, it, state: GroupState[(Long, Long)]) =>
              // sort within the batch; state carries (lastSec, count)
              val sorted = it.toSeq.sortBy(e => (e._2, e._3))
              var (last, count) = state.getOption.getOrElse((Long.MinValue, 0L))
              sorted.foreach { case (_, sec, _) =>
                if (last == Long.MinValue || sec - last > 1800) count += 1
                last = sec
              }
              state.update((last, count))
              Iterator.single((user, count))
          }.toDF("user_id", "n_sessions")
      }, outputMode = "append")
      // monotone cumulative counts → max = final per user
      result.groupBy("user_id")
        .agg(max("n_sessions").as("n_sessions"))
        .orderBy("user_id")
    },

    // Streaming deduplication (watermarked dropDuplicates — bounded
    // state). The kept row per key is arrival-order-dependent, so the
    // deterministic cross-engine check is the distinct-key count.
    QueryDef.sql(
      "stream_dedup_distinct",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct FROM (
        |  SELECT DISTINCT user_id, event_type FROM events)""".stripMargin) { (s, d) =>
      runToCompletion(s, d,
        df => df.withWatermark("ts", "1 hour")
          .dropDuplicates("user_id", "event_type"),
        outputMode = "append")
        .agg(count(lit(1)).as("n_distinct"))
    },

    // Streaming dedup with BOUNDED state (dropDuplicatesWithinWatermark):
    // unlike dropDuplicates above — whose key state lives forever — each
    // key's state here expires once the watermark passes its event time
    // plus the delay, which is what makes streaming dedup viable on an
    // unbounded 100 TB/day feed. The delay (60 days) exceeds the corpus
    // span, so every duplicate falls within one retention window and the
    // kept set is exactly the distinct keys — giving the deterministic
    // batch oracle. (A shorter delay would re-admit re-occurrences after
    // expiry, which is arrival-order-dependent and unoracleable.)
    QueryDef.sql(
      "stream_dedup_watermark",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_kept FROM (
        |  SELECT DISTINCT user_id, event_type FROM events)""".stripMargin) { (s, d) =>
      runToCompletion(s, d,
        df => df.withWatermark("ts", "60 days")
          .dropDuplicatesWithinWatermark("user_id", "event_type"),
        outputMode = "append")
        .agg(count(lit(1)).as("n_kept"))
    },

    // Watermark late-data semantics, demonstrated for real: the
    // straggler decile arrives as a SECOND micro-batch after the
    // watermark (max event time of batch 1 minus 53s) has passed —
    // stragglers to already-closed 5-minute windows are DROPPED,
    // stragglers to still-open windows are accepted. Append mode emits
    // exactly the windows the final watermark has sealed. The oracle
    // replays the full protocol in SQL: wm1 gates which late rows are
    // accepted, the final watermark gates which windows emit. This is
    // the state-bounding contract that makes streaming aggregation
    // viable at 100 TB/day — state is only ever the open-window suffix.
    QueryDef.sql(
      "stream_late_data",
      s"""WITH b1 AS (SELECT * FROM events WHERE ${lateStragglerSql(not = true)}),
        |b2 AS (SELECT * FROM events WHERE ${lateStragglerSql(not = false)}),
        |wm1 AS (SELECT max(ts) - INTERVAL 53 SECOND AS w FROM b1),
        |wmf AS (SELECT max(ts) - INTERVAL 53 SECOND AS w FROM events),
        |acc AS (
        |  SELECT ts, value FROM b1
        |  UNION ALL
        |  SELECT b2.ts, b2.value FROM b2, wm1
        |  WHERE time_bucket(INTERVAL 5 MINUTE, b2.ts) + INTERVAL 5 MINUTE
        |        > wm1.w)
        |SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM acc, wmf
        |WHERE time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE
        |      <= wmf.w
        |GROUP BY 1 ORDER BY win_start""".stripMargin) { (s, d) =>
      runDirToCompletion(s, stagedLateDir(s, d), maxFilesPerTrigger = 1,
        df => df.withWatermark("ts", "53 seconds")
          .groupBy(window(col("ts"), "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"), col("n"), col("total")),
        outputMode = "append")
        .orderBy("win_start")
    },

    // Streaming distribution-drift monitor (r15): the STREAM maintains
    // per-(day, value-bin) purchase counts — 5 fixed bins, so state is
    // |days|×5 rows at ANY event rate (the heavy-reduction-in-stream
    // topology, same class as stream_rolling_anomaly); the per-day PSI
    // against the whole-corpus base distribution then runs on the sink
    // frame, Laplace-smoothed with the text_drift_psi rounding law (8dp
    // probabilities, 6dp terms as exact decimals, 4dp PSI), alert at
    // the standard ≥ 0.1 boundary. The streaming complement of
    // connector_cdf_drift_monitor (which watches the CDF commit axis;
    // this watches the event-time axis). Batch-parity oracle.
    QueryDef.sql(
      "stream_psi_drift", {
        val binSql = """CASE WHEN value < 10 THEN 0 WHEN value < 25 THEN 1
          |  WHEN value < 50 THEN 2 WHEN value < 100 THEN 3
          |  ELSE 4 END""".stripMargin
        s"""WITH obs AS (
          |  SELECT CAST(ts AS DATE) AS day, $binSql AS bin
          |  FROM events WHERE event_type = 'purchase'),
          |bins AS (SELECT unnest(range(0, 5)) AS bin),
          |days AS (SELECT DISTINCT day FROM obs),
          |base AS (
          |  SELECT b.bin, CAST(coalesce(x.cnt, 0) AS BIGINT) AS bc
          |  FROM bins b LEFT JOIN (
          |    SELECT bin, COUNT(*) AS cnt FROM obs GROUP BY 1) x
          |    ON b.bin = x.bin),
          |nb AS (SELECT CAST(SUM(bc) AS BIGINT) AS n FROM base),
          |cells AS (
          |  SELECT d.day, b.bin, CAST(coalesce(x.cnt, 0) AS BIGINT) AS ac
          |  FROM days d CROSS JOIN bins b LEFT JOIN (
          |    SELECT day, bin, COUNT(*) AS cnt FROM obs GROUP BY 1, 2) x
          |    ON x.day = d.day AND x.bin = b.bin),
          |na AS (SELECT day, CAST(SUM(ac) AS BIGINT) AS n
          |       FROM cells GROUP BY 1),
          |terms AS (
          |  SELECT c.day,
          |    CAST(round((round(CAST(c.ac + 1 AS DOUBLE) / (na.n + 5), 8)
          |        - round(CAST(b.bc + 1 AS DOUBLE) / (nb.n + 5), 8))
          |      * ln(round(CAST(c.ac + 1 AS DOUBLE) / (na.n + 5), 8)
          |        / round(CAST(b.bc + 1 AS DOUBLE) / (nb.n + 5), 8)), 6)
          |      AS DECIMAL(18,6)) AS term
          |  FROM cells c JOIN na ON na.day = c.day
          |  JOIN base b ON b.bin = c.bin, nb)
          |SELECT strftime(t.day, '%Y-%m-%d') AS day, na.n AS n_day,
          |  round(CAST(SUM(t.term) AS DOUBLE), 4) AS psi,
          |  CAST(round(CAST(SUM(t.term) AS DOUBLE), 4) >= 0.1 AS INTEGER)
          |    AS alert
          |FROM terms t JOIN na ON na.day = t.day
          |GROUP BY 1, 2 ORDER BY 1""".stripMargin
      }) { (s, d) =>
      val binCol = when(col("value") < 10, 0).when(col("value") < 25, 1)
        .when(col("value") < 50, 2).when(col("value") < 100, 3)
        .otherwise(4).as("bin")
      // STREAM: per-(day, bin) counts, complete mode — |days|×5 state
      val sink = runToCompletion(s, d,
        df => df.filter(col("event_type") === "purchase")
          .select(to_date(col("ts")).as("day"), binCol)
          .groupBy("day", "bin").agg(count(lit(1)).as("cnt")),
        outputMode = "complete")
      // localCheckpoint: the sink frame feeds THREE consumers (cells,
      // base, days) including a self-join — the memory-sink View's
      // attributes don't deduplicate across those branches (analysis
      // "conflicting references"), and the checkpoint also freezes the
      // complete-mode table against re-reads
      val cellsRaw = sink.localCheckpoint(true)
      val bins = s.range(0, 5).select(col("id").cast("int").as("bin"))
      val days = cellsRaw.select("day").distinct()
      // always-materialized 5-bin frames (a bin a day never hits still
      // contributes its Laplace term), the drift-monitor convention
      val cells = days.crossJoin(broadcast(bins))
        .join(cellsRaw, Seq("day", "bin"), "left")
        .select(col("day"), col("bin"),
          coalesce(col("cnt"), lit(0L)).as("ac"))
      val base = bins.join(
          cellsRaw.groupBy("bin").agg(sum("cnt").as("cnt")),
          Seq("bin"), "left")
        .select(col("bin"), coalesce(col("cnt"), lit(0L)).as("bc"))
      val nb = base.agg(sum("bc").as("nb_n"))
      val na = cells.groupBy("day").agg(sum("ac").as("na_n"))
      def p(cnt: Column, n: Column) =
        round((cnt + 1).cast("double") / (n + 5), 8)
      val pa = p(col("ac"), col("na_n"))
      val pb = p(col("bc"), col("nb_n"))
      cells
        .join(broadcast(base), "bin")
        .join(na, "day").crossJoin(broadcast(nb))
        .select(col("day"), col("na_n"),
          round((pa - pb) * log(pa / pb), 6).cast("decimal(18,6)")
            .as("term"))
        .groupBy("day", "na_n")
        .agg(round(sum("term").cast("double"), 4).as("psi"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("na_n").as("n_day"), col("psi"),
          (col("psi") >= 0.1).cast("int").as("alert"))
        .orderBy("day")
    },

    // Streaming anomaly monitor: the STREAM produces the daily totals
    // (watermarked tumbling window, bounded state); the rolling z-score
    // then runs on the aggregate — the standard online-monitoring
    // topology (heavy reduction in the stream, scoring on the
    // date-domain-bounded result). Must equal the batch
    // q_rolling_anomaly answer exactly (same oracle text, same decimal
    // conventions).
    QueryDef.sql(
      "stream_rolling_anomaly",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, x,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    SUM(x) OVER w AS s1,
        |    SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
        |      OVER w AS s2
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  round(CAST(x AS DOUBLE), 2) AS x,
        |  round((CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / n) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / n) / (n - 1)), 4) AS z
        |FROM m WHERE n >= 5
        |  AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / n) / (n - 1) > 0
        |ORDER BY day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = runToCompletion(s, d,
        df => df.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day").as("w"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
          .select(to_date(col("w.start")).as("day"), col("x")),
        outputMode = "complete")
      val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
      val m = daily.select(col("day"), col("x"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("s1"),
        sum(col("x").cast("decimal(18,2)") * col("x").cast("decimal(18,2)"))
          .over(w).as("s2"))
      val variance = (col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / col("n")) /
        (col("n") - 1)
      m.filter(col("n") >= 5 && variance > 0)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("x").cast("double"), 2).as("x"),
          round((col("x").cast("double") -
            col("s1").cast("double") / col("n")) / sqrt(variance), 4)
            .as("z"))
        .orderBy("day")
    }
  )
}
