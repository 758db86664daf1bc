package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics over the daily event stream: autocorrelation,
  * seasonal decomposition, EWMA forecasting, and a chi-square
  * independence test. These are the monitoring primitives a training-data
  * ingest pipeline runs per cohort (is today's volume seasonal or
  * anomalous? did the event mix shift?).
  *
  * Scale design (100 TB): every query first reduces the event log to the
  * DAILY frame — one map-side-combined aggregation keyed by date, the
  * only pass over the raw data. Everything downstream (windows,
  * self-joins, grids) runs on a date-domain-bounded frame (≤ a few
  * thousand rows at ANY corpus size), so global windows and tiny
  * cross-joins are free; the reduction is the distributed part.
  *
  * Cross-engine determinism (the q_rolling_anomaly conventions):
  * daily sums are DECIMAL(18,2) (exact, order-free); decimal×decimal
  * products and their sums stay exact; the only inexact steps are final
  * scalar expressions over a handful of exact aggregates (identical
  * IEEE expression trees in both engines) and `ln`, which is rounded to
  * 6 decimals per value before any further arithmetic. Day-of-week is
  * `epoch_days % 7` — locale-free and identical in any engine (0 =
  * Thursday, 1970-01-01).
  */
object SeriesOps {

  /** EWMA smoothing: alpha = 3/10, truncated at 14 lags. The
    * coefficients c_j = 0.3 * 0.7^j are EXACT decimals (scale j+1), and
    * the normalizer Σ c_j = 1 - 0.7^14 is the closed-form geometric sum —
    * both rendered from these BigDecimals into the Spark literals AND
    * the oracle SQL, so the two engines share one model by construction
    * (the TextAnalysis.cmHashRows pattern). */
  val ewmaLags = 14
  val ewmaCoefs: IndexedSeq[java.math.BigDecimal] = {
    val a = new java.math.BigDecimal("0.3")
    val r = new java.math.BigDecimal("0.7")
    (0 until ewmaLags).map(j => a.multiply(r.pow(j)))
  }
  val ewmaNorm: java.math.BigDecimal =
    ewmaCoefs.reduce(_.add(_)).stripTrailingZeros()

  /** Pre-normalized weights w_j = c_j / Σc, rounded ONCE to 12 decimals
    * (HALF_UP) — the model constants both engines consume. */
  val ewmaWeights: IndexedSeq[java.math.BigDecimal] =
    ewmaCoefs.map(c =>
      c.divide(ewmaNorm, 12, java.math.RoundingMode.HALF_UP))

  /** Poisson-bootstrap model: replica count and the Poisson(1) CDF
    * cutoffs as 4-hex-char strings over the uniform 16-bit md5 prefix —
    * weight w = #cutoffs ≤ prefix reproduces w ~ Poisson(1) (truncated
    * at 6). Rendered into BOTH engines from these values (the
    * cmHashRows pattern); lexicographic compare of fixed-length
    * lowercase hex equals numeric compare, the q_hash_split trick. */
  val bootstrapB = 80
  val poissonCutsHex: Seq[String] = {
    val pmf = (0 to 5).scanLeft(0.0) { case (cdf, k) =>
      cdf + math.exp(-1.0) / (1 to k).product.toDouble
    }.tail // CDF at k = 0..5
    pmf.map(c => f"${math.floor(c * 65536).toLong}%04x")
  }

  /** Daily total value — the one pass over the raw event log that ACF,
    * seasonal decomposition, and EWMA all start from. Cross-query
    * SHARED (the edgesWithDeg/corpusKmeans convention): without the
    * memo each consumer re-scans the full events table to rebuild the
    * identical date-keyed decimal-sum frame. */
  private def daily(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.sharedFrame(
      s"series:daily:${graft.CacheRegistry.sessionToken(s)}:$d") {
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
    }

  private val dailySql =
    """daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS x
      |  FROM events GROUP BY 1)""".stripMargin

  /** `epoch_days % 7` day-of-week bucket (0 = Thursday). */
  private def dowCol(day: Column): Column =
    datediff(day, to_date(lit("1970-01-01"))) % 7

  def defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Active-user rollup (r15): per calendar day, DAU, trailing-7-day
    // WAU, and the DAU/WAU stickiness ratio — the product-analytics
    // engagement readout. WAU is computed EXACTLY by contributing each
    // (user, active-day) pair to the 7 days it covers (a bounded ×7
    // explode with map-side-combined distinct counting) — never a
    // per-day distinct-over-range window, which would rescan the event
    // span per day. Days outside the observed calendar are excluded by
    // the join back onto real DAU days. SCALE: the distinct frame is
    // one (day, user) shuffle; the ×7 fan-out is constant; stickiness
    // is a projection.
    QueryDef.sql(
      "q_active_users",
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
        |cover AS (
        |  SELECT DISTINCT du.day + CAST(k AS INTEGER) AS day, user_id
        |  FROM du, (SELECT unnest(range(0, 7)) AS k) ks),
        |wau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM cover GROUP BY day)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = du.groupBy("day")
        .agg(count(lit(1)).cast("bigint").as("dau"))
      val wau = du
        .select(explode(sequence(lit(0), lit(6))).as("k"),
          col("day"), col("user_id"))
        .select(date_add(col("day"), col("k")).as("day"), col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).cast("bigint").as("wau"))
      dau.join(wau, "day")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
        .orderBy("day")
    },

    // ------------------------------------------------------------------
    // Autocorrelation function at lags 1..7 of the daily value series —
    // the "is there weekly periodicity?" probe. The lagged pairs come
    // from a self-join of the daily frame on `a.day = b.day + k` (the
    // frame is date-domain-bounded, so the 7-way replicated self-join is
    // trivially small at any corpus scale); all sums (Σxy, Σx, Σy, Σx²)
    // are exact decimals, and r_k is one closed-form double expression
    // over them: r_k = (Σxy − x̄(Σx+Σy) + m·x̄²) / (Σx² − (Σx)²/n).
    QueryDef.sql(
      "q_acf_daily",
      s"""WITH $dailySql,
        |lags AS (SELECT unnest(range(1, 8)) AS k),
        |pairs AS (
        |  SELECT k,
        |    SUM(CAST(a.x AS DECIMAL(18,2)) * CAST(b.x AS DECIMAL(18,2)))
        |      AS sxy,
        |    SUM(a.x) AS sx, SUM(b.x) AS sy,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM daily a, daily b, lags
        |  WHERE a.day = b.day + CAST(k AS INTEGER) GROUP BY k),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s,
        |    SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS ss
        |  FROM daily)
        |SELECT CAST(k AS BIGINT) AS lag, m,
        |  round((CAST(sxy AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / n) * (CAST(sx AS DOUBLE) + CAST(sy AS DOUBLE))
        |      + m * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
        |    / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n),
        |    4) AS acf
        |FROM pairs, tot ORDER BY lag""".stripMargin) { (s, d) =>
      val dy = daily(s, d)
      val lags = s.range(1, 8).toDF("k")
      val pairs = dy.as("a")
        .join(dy.as("b").crossJoin(broadcast(lags)),
          col("a.day") === date_add(col("b.day"), col("k").cast("int")))
        .groupBy("k")
        .agg(
          sum(col("a.x").cast("decimal(18,2)") *
            col("b.x").cast("decimal(18,2)")).as("sxy"),
          sum(col("a.x")).as("sx"), sum(col("b.x")).as("sy"),
          count(lit(1)).as("m"))
      val tot = dy.agg(
        count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x").cast("decimal(18,2)") *
          col("x").cast("decimal(18,2)")).as("ss"))
      val xbar = col("s").cast("double") / col("n")
      pairs.crossJoin(broadcast(tot))
        .select(col("k").as("lag"), col("m"),
          round((col("sxy").cast("double")
              - xbar * (col("sx").cast("double") + col("sy").cast("double"))
              + col("m") * xbar * xbar)
            / (col("ss").cast("double")
              - col("s").cast("double") * col("s").cast("double") / col("n")),
            4).as("acf"))
        .orderBy("lag")
    },

    // ------------------------------------------------------------------
    // Classical seasonal decomposition, day-of-week profile: trend =
    // centered 7-day moving average (exact decimal numerator / 7),
    // detrended residual per day, seasonal index = mean residual per
    // dow bucket. Reports each bucket's index plus its share of
    // detrended variance — "how much of the wiggle is weekly?".
    QueryDef.sql(
      "q_seasonal_dow",
      s"""WITH $dailySql,
        |t AS (
        |  SELECT day, x, SUM(x) OVER w AS s7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS c7
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT ((day - DATE '1970-01-01') % 7) AS dow,
        |    CAST(round(CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7, 6)
        |      AS DECIMAL(18,6)) AS r
        |  FROM t WHERE c7 = 7)
        |SELECT CAST(dow AS INT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 4) AS seasonal_idx,
        |  round(CAST(SUM(CAST(round(r, 2) AS DECIMAL(15,2))
        |      * CAST(round(r, 2) AS DECIMAL(15,2)))
        |      AS DOUBLE) / COUNT(*), 4) AS mean_sq_resid
        |FROM det GROUP BY dow ORDER BY dow""".stripMargin) { (s, d) =>
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      val det = daily(s, d)
        .select(col("day"), col("x"),
          sum(col("x")).over(w).as("s7"), count(lit(1)).over(w).as("c7"))
        .filter(col("c7") === 7)
        .select(dowCol(col("day")).as("dow"),
          round(col("x").cast("double") - col("s7").cast("double") / 7, 6)
            .cast("decimal(18,6)").as("r"))
      // sums stay NARROW exact decimals (residuals re-rounded to cents
      // for the square term) so the decimal→double cast is exact while
      // the raw integer fits 2^53 — the wide-decimal cast is where
      // engines can disagree by an ulp (two-step int128 conversions)
      val r2 = round(col("r"), 2).cast("decimal(15,2)")
      det.groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
          round(sum(col("r")).cast("double") / count(lit(1)), 4)
            .as("seasonal_idx"),
          round(sum(r2 * r2).cast("double") / count(lit(1)), 4)
            .as("mean_sq_resid"))
        .select(col("dow").cast("int").as("dow"), col("n_days"),
          col("seasonal_idx"), col("mean_sq_resid"))
        .orderBy("dow")
    },

    // ------------------------------------------------------------------
    // Classical additive seasonal decomposition (the STL shape without
    // loess): x_t = trend + seasonal + residual, per day. trend = the
    // 7-observation centered moving average (full windows only);
    // detrended = x − trend, rounded ONCE to 6dp — every later term is
    // EXACT decimal arithmetic off that one rounding (trend = x − det,
    // residual = det − seasonal), so engines cannot drift; seasonal =
    // the per-day-of-week mean of detrended, centered so the seven
    // components sum to ~0 (the additive-decomposition identity).
    // SCALE: one date-domain-bounded global window (the q_seasonal_dow
    // class — calendar days, bounded at any corpus size), one 7-row
    // seasonal frame broadcast back onto the days. The decomposition
    // identity x = trend + seasonal + residual holds EXACTLY by
    // construction on every output row — certified by the oracle hash,
    // since both engines must produce the identical four columns.
    QueryDef.sql(
      "q_stl_decompose",
      s"""WITH $dailySql,
        |t AS (
        |  SELECT day, x, SUM(x) OVER w AS s7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS c7
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, x, ((day - DATE '1970-01-01') % 7) AS dow,
        |    CAST(round(CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7, 6)
        |      AS DECIMAL(18,6)) AS det
        |  FROM t WHERE c7 = 7),
        |sraw AS (
        |  SELECT dow, CAST(round(CAST(SUM(det) AS DOUBLE) / COUNT(*), 6)
        |      AS DECIMAL(18,6)) AS s_raw
        |  FROM det GROUP BY dow),
        |ctr AS (
        |  SELECT CAST(round(CAST(SUM(s_raw) AS DOUBLE) / 7, 6)
        |      AS DECIMAL(18,6)) AS mean7
        |  FROM sraw),
        |seas AS (
        |  SELECT dow, s_raw - mean7 AS seasonal FROM sraw CROSS JOIN ctr)
        |SELECT d.day, round(CAST(d.x AS DOUBLE), 2) AS x,
        |  round(CAST(d.x - d.det AS DOUBLE), 4) AS trend,
        |  round(CAST(s.seasonal AS DOUBLE), 4) AS seasonal,
        |  round(CAST(d.det - s.seasonal AS DOUBLE), 4) AS residual
        |FROM det d JOIN seas s ON d.dow = s.dow
        |ORDER BY d.day""".stripMargin) { (s, d) =>
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      // persisted: the detrended frame feeds the seasonal aggregate, the
      // centering scalar, and the final join — without it the (bounded)
      // calendar-day window would run three times
      val det = graft.CacheRegistry.ensurePersisted(daily(s, d)
        .select(col("day"), col("x"),
          sum(col("x")).over(w).as("s7"), count(lit(1)).over(w).as("c7"))
        .filter(col("c7") === 7)
        .select(col("day"), col("x"), dowCol(col("day")).as("dow"),
          round(col("x").cast("double") - col("s7").cast("double") / 7, 6)
            .cast("decimal(18,6)").as("det")))
      val sraw = det.groupBy("dow")
        .agg(round(sum(col("det")).cast("double") / count(lit(1)), 6)
          .cast("decimal(18,6)").as("s_raw"))
      val ctr = sraw.agg(round(sum(col("s_raw")).cast("double") / 7, 6)
        .cast("decimal(18,6)").as("mean7"))
      val seas = sraw.crossJoin(broadcast(ctr))
        .select(col("dow"), (col("s_raw") - col("mean7")).as("seasonal"))
      det.join(broadcast(seas), "dow")
        .select(col("day"), round(col("x").cast("double"), 2).as("x"),
          round((col("x") - col("det")).cast("double"), 4).as("trend"),
          round(col("seasonal").cast("double"), 4).as("seasonal"),
          round((col("det") - col("seasonal")).cast("double"), 4)
            .as("residual"))
        .orderBy("day")
    },

    // ------------------------------------------------------------------
    // Truncated-EWMA one-step-ahead forecast: ewma_t = Σ_{j<14} w_j ·
    // x_{t−j} with w_j = the PRE-NORMALIZED 0.3·0.7^j / Σ (rounded to 12
    // decimals once, in ewmaWeights — rendered into both engines from
    // the same BigDecimals), err_t = x_t − ewma_{t−1}. The recursion is
    // unrolled to a FIXED 14-term weighted lag sum — unlike the
    // recursive form it is order-free, exactly mergeable, and one window
    // pass in any engine. The ENTIRE pipeline is decimal arithmetic:
    // products, sums, the 6dp ewma round and the 4dp error round all
    // happen in exact decimals, and only the final narrow (≤6dp-scale)
    // values are cast to double — wide-decimal→double casts are where
    // engines disagree by an ulp. Only days with a full 14-lag history
    // are scored.
    QueryDef.sql(
      "q_ewma_forecast", {
        val terms = ewmaWeights.zipWithIndex.map { case (c, j) =>
          s"CAST(round(CAST(${c.toPlainString} AS DECIMAL(13,12))" +
            s" * lag(x, $j) OVER w, 6) AS DECIMAL(18,6))"
        }.mkString(" + ")
        s"""WITH $dailySql,
          |e AS (
          |  SELECT day, x,
          |    CASE WHEN lag(x, ${ewmaLags - 1}) OVER w IS NOT NULL THEN
          |      CAST(round($terms, 6) AS DECIMAL(18,6))
          |    END AS ewma6
          |  FROM daily WINDOW w AS (ORDER BY day)),
          |e2 AS (
          |  SELECT day, x, ewma6,
          |    round(x - lag(ewma6, 1) OVER (ORDER BY day), 4) AS errd
          |  FROM e)
          |SELECT strftime(day, '%Y-%m-%d') AS day,
          |  round(CAST(x AS DOUBLE), 2) AS x, CAST(ewma6 AS DOUBLE) AS ewma,
          |  CAST(errd AS DOUBLE) AS err
          |FROM e2 WHERE ewma6 IS NOT NULL ORDER BY day""".stripMargin
      }) { (s, d) =>
      val w = Window.orderBy("day")
      val weighted = ewmaWeights.zipWithIndex.map { case (c, j) =>
        round(lit(new java.math.BigDecimal(c.toPlainString))
          .cast("decimal(13,12)") * lag(col("x"), j).over(w), 6)
          .cast("decimal(18,6)")
      }.reduce(_ + _)
      val e = daily(s, d)
        .select(col("day"), col("x"),
          when(lag(col("x"), ewmaLags - 1).over(w).isNotNull,
            round(weighted, 6).cast("decimal(18,6)")).as("ewma6"))
      e.withColumn("errd",
          round(col("x") - lag(col("ewma6"), 1).over(w), 4))
        .filter(col("ewma6").isNotNull)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("x").cast("double"), 2).as("x"),
          col("ewma6").cast("double").as("ewma"),
          col("errd").cast("double").as("err"))
        .orderBy("day")
    },

    // ------------------------------------------------------------------
    // Rolling-origin forecast BACKTEST (r15): the evaluation summary a
    // forecaster ships with — over every day with a defined one-step
    // EWMA forecast (the q_ewma_forecast law verbatim), MAE / RMSE /
    // MAPE of the model vs the same metrics' naive-persistence baseline
    // (x̂_t = x_{t−1}), and the skill score 1 − MAE/MAE_naive (> 0 ⇔
    // the model beats persistence). DETERMINISM: per-day errors are
    // 4dp decimals (model) / exact decimal diffs (naive); squares and
    // 6dp percentage terms stay decimal through the sums; the handful
    // of final divisions/sqrt run on exact inputs through identical
    // expression trees. SCALE: one calendar-bounded window pass + a
    // 1-row aggregate.
    QueryDef.sql(
      "q_forecast_backtest", {
        val terms = ewmaWeights.zipWithIndex.map { case (c, j) =>
          s"CAST(round(CAST(${c.toPlainString} AS DECIMAL(13,12))" +
            s" * lag(x, $j) OVER w, 6) AS DECIMAL(18,6))"
        }.mkString(" + ")
        s"""WITH $dailySql,
          |e AS (
          |  SELECT day, x,
          |    CASE WHEN lag(x, ${ewmaLags - 1}) OVER w IS NOT NULL THEN
          |      CAST(round($terms, 6) AS DECIMAL(18,6))
          |    END AS ewma6,
          |    lag(x, 1) OVER w AS xprev
          |  FROM daily WINDOW w AS (ORDER BY day)),
          |e2 AS (
          |  SELECT day, x,
          |    round(x - lag(ewma6, 1) OVER (ORDER BY day), 4) AS errd,
          |    CAST(x - xprev AS DECIMAL(18,4)) AS errn
          |  FROM e),
          |scored AS (SELECT * FROM e2 WHERE errd IS NOT NULL),
          |agg AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          |    SUM(abs(errd)) AS sae, SUM(errd * errd) AS sse,
          |    SUM(CAST(round(CAST(abs(errd) AS DOUBLE) / CAST(x AS DOUBLE)
          |      * 100, 6) AS DECIMAL(18,6))) AS sape,
          |    SUM(abs(errn)) AS sae_n
          |  FROM scored)
          |SELECT n_days,
          |  round(CAST(sae AS DOUBLE) / n_days, 4) AS mae,
          |  round(sqrt(CAST(sse AS DOUBLE) / n_days), 4) AS rmse,
          |  round(CAST(sape AS DOUBLE) / n_days, 4) AS mape_pct,
          |  round(CAST(sae_n AS DOUBLE) / n_days, 4) AS mae_naive,
          |  round(1 - CAST(sae AS DOUBLE) / CAST(sae_n AS DOUBLE), 4)
          |    AS skill
          |FROM agg""".stripMargin
      }) { (s, d) =>
      val w = Window.orderBy("day")
      val weighted = ewmaWeights.zipWithIndex.map { case (c, j) =>
        round(lit(new java.math.BigDecimal(c.toPlainString))
          .cast("decimal(13,12)") * lag(col("x"), j).over(w), 6)
          .cast("decimal(18,6)")
      }.reduce(_ + _)
      val e = daily(s, d)
        .select(col("day"), col("x"),
          when(lag(col("x"), ewmaLags - 1).over(w).isNotNull,
            round(weighted, 6).cast("decimal(18,6)")).as("ewma6"),
          lag(col("x"), 1).over(w).as("xprev"))
      val scored = e
        .select(col("day"), col("x"),
          round(col("x") - lag(col("ewma6"), 1).over(w), 4).as("errd"),
          (col("x") - col("xprev")).cast("decimal(18,4)").as("errn"))
        .filter(col("errd").isNotNull)
      scored.agg(
          count(lit(1)).cast("bigint").as("n_days"),
          sum(abs(col("errd"))).as("sae"),
          sum(col("errd") * col("errd")).as("sse"),
          sum(round(abs(col("errd")).cast("double") / col("x").cast("double")
            * 100, 6).cast("decimal(18,6)")).as("sape"),
          sum(abs(col("errn"))).as("sae_n"))
        .select(col("n_days"),
          round(col("sae").cast("double") / col("n_days"), 4).as("mae"),
          round(sqrt(col("sse").cast("double") / col("n_days")), 4)
            .as("rmse"),
          round(col("sape").cast("double") / col("n_days"), 4)
            .as("mape_pct"),
          round(col("sae_n").cast("double") / col("n_days"), 4)
            .as("mae_naive"),
          round(lit(1) - col("sae").cast("double") /
            col("sae_n").cast("double"), 4).as("skill"))
    },

    // ------------------------------------------------------------------
    // Chi-square independence test: is event_type independent of
    // day-of-week? Observed counts over the FULL |types|×|dows| grid
    // (absent cells count 0 and still contribute their expectation),
    // expected = row·col/N, χ² = Σ (o−e)²/e with per-cell contributions
    // rounded at 6 before the exact decimal sum. One aggregation over
    // the events scan; the grid/totals are |types|×7 — broadcast-sized
    // forever.
    QueryDef.sql(
      "q_chi_square_dow",
      """WITH cells AS (
        |  SELECT event_type, ((CAST(ts AS DATE) - DATE '1970-01-01') % 7)
        |    AS dow, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, w.dow, coalesce(c.o, 0) AS o
        |  FROM (SELECT DISTINCT event_type FROM cells) t
        |  CROSS JOIN (SELECT DISTINCT dow FROM cells) w
        |  LEFT JOIN cells c USING (event_type, dow)),
        |tot AS (
        |  SELECT g.*, SUM(o) OVER (PARTITION BY event_type) AS rt,
        |    SUM(o) OVER (PARTITION BY dow) AS ct, SUM(o) OVER () AS n
        |  FROM grid g)
        |SELECT CAST(MAX(n) AS BIGINT) AS n,
        |  CAST((COUNT(DISTINCT event_type) - 1)
        |    * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
        |  round(CAST(SUM(CAST(round(
        |      (o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
        |      * (o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n), 6)
        |    AS DECIMAL(18,6))) AS DOUBLE), 4) AS chi2
        |FROM tot""".stripMargin) { (s, d) =>
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), dowCol(to_date(col("ts"))).as("dow"))
        .agg(count(lit(1)).as("o"))
      val types = cells.select("event_type").distinct()
      val dows = cells.select("dow").distinct()
      val grid = types.crossJoin(dows)
        .join(cells, Seq("event_type", "dow"), "left")
        .na.fill(0L, Seq("o"))
      val tot = grid
        .withColumn("rt", sum("o").over(Window.partitionBy("event_type")))
        .withColumn("ct", sum("o").over(Window.partitionBy("dow")))
        .withColumn("n", sum("o").over(Window.partitionBy()))
      val e = col("rt").cast("double") * col("ct").cast("double") / col("n")
      tot.agg(
        max("n").cast("bigint").as("n"),
        ((countDistinct("event_type") - 1) * (countDistinct("dow") - 1))
          .cast("bigint").as("dof"),
        round(sum(round((col("o") - e) * (col("o") - e) / e, 6)
          .cast("decimal(18,6)")).cast("double"), 4).as("chi2"))
    },

    // ------------------------------------------------------------------
    // Differentially-private-STYLE noisy counts: per-event-type counts
    // + Laplace(1/ε) noise, with the noise drawn DETERMINISTICALLY from
    // the md5 of the group key (inverse-CDF over the uniform 16-bit
    // prefix) — the reproducible-release plumbing of a DP pipeline (a
    // real deployment swaps the hash for a sealed RNG and this query
    // keeps its shape; determinism here is what makes the release
    // replayable and the oracle checkable). The hex prefix becomes an
    // integer via an explicit 4-digit positional sum (portable — hex
    // CASTs are not); ln rounded 6dp (libm ulp), noise and output
    // rounded 2dp. One map-side-combined count.
    QueryDef.sql(
      "q_dp_noisy_counts", {
        val hexDigitsSql = (1 to 4).map { i =>
          val mult = math.pow(16, 4 - i).toLong
          s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1) * $mult"
        }.mkString(" + ")
        s"""WITH c AS (
          |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY event_type),
          |u AS (
          |  SELECT event_type, n,
          |    (CAST($hexDigitsSql AS DOUBLE) + 0.5) / 65536 AS u
          |  FROM (SELECT event_type, n,
          |          substring(md5('dp1:' || event_type), 1, 4) AS h
          |        FROM c))
          |SELECT event_type, 1.0 AS epsilon,
          |  round(n + CAST(round(
          |    -CAST(sign(u - 0.5) AS DOUBLE)
          |      * round(ln(1 - 2 * abs(u - 0.5)), 6), 2) AS DOUBLE), 2)
          |    AS noisy_n
          |FROM u ORDER BY event_type""".stripMargin
      }) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val h = substring(md5(concat(lit("dp1:"), col("event_type"))), 1, 4)
      val hexVal = (1 to 4).map { i =>
        val mult = math.pow(16, 4 - i).toLong
        (instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1) * mult
      }.reduce(_ + _)
      val u = (hexVal.cast("double") + 0.5) / 65536
      c.select(col("event_type"), lit(1.0).as("epsilon"),
          round(col("n") + round(-signum(u - 0.5) *
            round(log(lit(1) - lit(2) * abs(u - 0.5)), 6), 2)
            .cast("double"), 2).as("noisy_n"))
        .orderBy("event_type")
    },

    // ------------------------------------------------------------------
    // Mann-Whitney U rank-sum test (click vs purchase values — the
    // nonparametric sibling of q_ab_welch_ttest): midranks over the
    // combined sample, U₁ = R₁ − n₁(n₁+1)/2, z via the normal
    // approximation WITH the standard tie correction — values are
    // 2dp-bounded so ties are extensive and the no-tie variance would
    // systematically overstate |z|: var = n1·n2/12 · ((n+1) −
    // Σ(t³−t)/(n(n−1))), with the tie counts t read off the same
    // distinct-value frame. SCALE SHAPE: ranks are NOT a global sort of the event log —
    // the samples reduce to the DISTINCT-VALUE frame first (value-domain
    // bounded), midranks come from one cumulative window over that
    // frame, and the rank-sum is a weighted aggregate. DETERMINISM:
    // everything stays in integers by working with DOUBLED midranks
    // (2·before + c + 1, always integral — no .5 decimals, no division
    // until the final closed-form z).
    QueryDef.sql(
      "q_mann_whitney",
      """WITH g AS (
        |  SELECT value AS v,
        |    CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
        |      AS BIGINT) AS isa
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |cnt AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(isa) AS BIGINT) AS ca
        |  FROM g GROUP BY v),
        |mr AS (
        |  SELECT v, c, ca,
        |    2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS m2
        |  FROM cnt),
        |agg AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n1,
        |    CAST(SUM(c - ca) AS BIGINT) AS n2,
        |    CAST(SUM(ca * m2) AS BIGINT) AS r1x2,
        |    CAST(SUM(c * c * c - c) AS BIGINT) AS tsum
        |  FROM mr)
        |SELECT n1, n2,
        |  round(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2, 1) AS u1,
        |  round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2
        |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
        |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
        |      * (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(tsum AS DOUBLE)
        |        / (CAST(n1 + n2 AS DOUBLE)
        |          * CAST(n1 + n2 - 1 AS DOUBLE)))), 4) AS z
        |FROM agg""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("value").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("isa"))
      val cnt = g.groupBy("v")
        .agg(count(lit(1)).as("c"), sum("isa").as("ca"))
      val w = Window.orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val mr = cnt.withColumn("m2",
        lit(2) * (sum("c").over(w) - col("c")) + col("c") + 1)
      val agg = mr.agg(
        sum("ca").cast("bigint").as("n1"),
        sum(col("c") - col("ca")).cast("bigint").as("n2"),
        sum(col("ca") * col("m2")).cast("bigint").as("r1x2"),
        sum(col("c") * col("c") * col("c") - col("c")).cast("bigint")
          .as("tsum"))
      val u1 = (col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") / 2
      agg.select(col("n1"), col("n2"), round(u1, 1).as("u1"),
        round((u1 - col("n1").cast("double") * col("n2").cast("double") / 2)
          / sqrt(col("n1").cast("double") * col("n2").cast("double") / 12
            * ((col("n1") + col("n2") + 1).cast("double")
              - col("tsum").cast("double")
                / ((col("n1") + col("n2")).cast("double")
                  * (col("n1") + col("n2") - 1).cast("double")))), 4)
          .as("z"))
    },

    // ------------------------------------------------------------------
    // Two-sample Kolmogorov-Smirnov test (click vs purchase values):
    // D = max |F₁−F₂| over the combined support, computed EXACTLY as
    // max |n₂·C₁ − n₁·C₂| over the distinct-value frame (integer
    // cumulative counts — no float CDFs), normalized once at the end;
    // p-value via the 5-term asymptotic series with each exp() term
    // rounded at 8dp before the exact alternating sum (libm exp differs
    // across engines in the last ulp; the pre-round absorbs it — the
    // text_unigram_logprob ln convention). Same distinct-value scale
    // shape as q_mann_whitney: never a global sort of the event log.
    QueryDef.sql(
      "q_ks_test", {
        val terms = (1 to 5).map(j =>
          s"${if (j % 2 == 1) "+" else "-"} CAST(round(exp(-2 * $j * $j"
            + " * lam * lam), 8) AS DECIMAL(18,8))").mkString(" ")
        s"""WITH g AS (
          |  SELECT value AS v,
          |    CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
          |      AS BIGINT) AS isa
          |  FROM events WHERE event_type IN ('click', 'purchase')),
          |cnt AS (
          |  SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
          |    CAST(SUM(isa) AS BIGINT) AS ca
          |  FROM g GROUP BY v),
          |cum AS (
          |  SELECT SUM(ca) OVER w AS c1, SUM(c - ca) OVER w AS c2
          |  FROM cnt WINDOW w AS (ORDER BY v)),
          |tot AS (
          |  SELECT CAST(SUM(ca) AS BIGINT) AS n1,
          |    CAST(SUM(c - ca) AS BIGINT) AS n2 FROM cnt),
          |dm AS (
          |  SELECT CAST(MAX(abs(n2 * c1 - n1 * c2)) AS BIGINT) AS dmax
          |  FROM cum, tot),
          |stat AS (
          |  SELECT n1, n2,
          |    round(CAST(dmax AS DOUBLE)
          |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d,
          |    (sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / (n1 + n2))
          |      + 0.12 + 0.11 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
          |        / (n1 + n2)))
          |      * (CAST(dmax AS DOUBLE)
          |        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS lam
          |  FROM dm, tot)
          |SELECT n1, n2, d,
          |  round(least(greatest(CAST(2 * ($terms) AS DOUBLE), 0.0), 1.0), 4)
          |    AS p_approx
          |FROM stat""".stripMargin
      }) { (s, d) =>
      val g = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("value").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("isa"))
      val cnt = g.groupBy("v")
        .agg(count(lit(1)).as("c"), sum("isa").as("ca"))
      val w = Window.orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cnt.select(sum("ca").over(w).as("c1"),
        sum(col("c") - col("ca")).over(w).as("c2"))
      val tot = cnt.agg(sum("ca").cast("bigint").as("n1"),
        sum(col("c") - col("ca")).cast("bigint").as("n2"))
      val dm = cum.crossJoin(broadcast(tot))
        .agg(max(abs(col("n2") * col("c1") - col("n1") * col("c2")))
          .cast("bigint").as("dmax"))
      val dD = col("dmax").cast("double") /
        (col("n1").cast("double") * col("n2").cast("double"))
      val ne = col("n1").cast("double") * col("n2").cast("double") /
        (col("n1") + col("n2"))
      val lam = (sqrt(ne) + 0.12 + lit(0.11) / sqrt(ne)) * dD
      val series = (1 to 5).map { j =>
        val t = round(exp(lit(-2.0 * j * j) * lam * lam), 8)
          .cast("decimal(18,8)")
        if (j % 2 == 1) t else t * -1
      }.reduce(_ + _)
      dm.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"), round(dD, 6).as("d"),
          round(least(greatest((lit(2) * series).cast("double"), lit(0.0)),
            lit(1.0)), 4).as("p_approx"))
    },

    // ------------------------------------------------------------------
    // Quantile normalization (percentile-rank feature transform): each
    // value maps to its exact mid-CDF percentile (C(<v) + c(=v)/2)/n,
    // kept integral as (2·before + c)/2n until one final division — the
    // feature-preprocessing step for rank-based models and drift-robust
    // features. The rank table lives on the DISTINCT-VALUE frame
    // (broadcast-sized at any corpus scale) and joins back to the rows;
    // output pins the 50 smallest event_ids as the checked sample.
    QueryDef.sql(
      "q_quantile_normalize",
      """WITH g AS (
        |  SELECT event_id, value AS v FROM events
        |  WHERE event_type = 'purchase'),
        |cnt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM g GROUP BY v),
        |mr AS (
        |  SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c AS m2,
        |    CAST(SUM(c) OVER () AS BIGINT) AS n
        |  FROM cnt)
        |SELECT g.event_id, round(CAST(g.v AS DOUBLE), 2) AS v,
        |  round(CAST(m2 AS DOUBLE) / (2 * n), 6) AS pct
        |FROM g JOIN mr ON g.v = mr.v
        |ORDER BY g.event_id LIMIT 50""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value").as("v"))
      val cnt = g.groupBy("v").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val mr = cnt
        .withColumn("m2", lit(2) * (sum("c").over(w) - col("c")) + col("c"))
        .withColumn("n", sum("c").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      g.join(mr, "v")
        .select(col("event_id"), round(col("v").cast("double"), 2).as("v"),
          round(col("m2").cast("double") / (lit(2) * col("n")), 6).as("pct"))
        .orderBy("event_id").limit(50)
    },

    // ------------------------------------------------------------------
    // Poisson-bootstrap 95% CI for the mean purchase value: B=80
    // replicas, each row's replica weight w ~ Poisson(1) derived
    // DETERMINISTICALLY from md5(event_id:replica) against the CDF
    // cutoffs in poissonCutsHex — reruns, backfills, and engines agree
    // replica-for-replica (the reason production bootstraps never use
    // rand()). The CI is the 2nd/79th order statistic of the replica
    // means — ceil(B·α/2) = ceil(80·0.025) = 2, so the percentile-
    // bootstrap indices land exactly on a 95% interval (B=40's 2nd/39th
    // was really a ~92.5% CI). SCALE: one pass over the events scan computing all B
    // weights per row (a B-wide explode feeding a map-side-combined
    // per-replica aggregate — the shuffle carries B×partitions partial
    // rows, never B× the data), then order statistics over the B-row
    // frame.
    QueryDef.sql(
      "q_bootstrap_ci", {
        val wSql = poissonCutsHex.map(c =>
          s"CAST((substring(md5(CAST(event_id AS VARCHAR) || ':' ||"
            + s" CAST(r AS VARCHAR)), 1, 4) >= '$c') AS INT)")
          .mkString("(", " + ", ")")
        s"""WITH ev AS (
          |  SELECT event_id, CAST(value AS DECIMAL(18,2)) AS v
          |  FROM events WHERE event_type = 'purchase'),
          |reps AS (SELECT unnest(range(1, ${bootstrapB + 1})) AS r),
          |wt AS (SELECT r, v, $wSql AS w FROM ev, reps),
          |means AS (
          |  SELECT r,
          |    round(CAST(SUM(w * v) AS DOUBLE) / SUM(w), 4) AS m
          |  FROM wt GROUP BY r),
          |ranked AS (
          |  SELECT m, row_number() OVER (ORDER BY m, r) AS rk FROM means),
          |pt AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |    round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 4) AS point_mean
          |  FROM ev)
          |SELECT $bootstrapB AS b, n_rows, point_mean,
          |  MAX(CASE WHEN rk = 2 THEN m END) AS ci_lo,
          |  MAX(CASE WHEN rk = ${bootstrapB - 1} THEN m END) AS ci_hi
          |FROM ranked, pt GROUP BY n_rows, point_mean""".stripMargin
      }) { (s, d) =>
      // repartition before the B-wide fan-out: the broadcast crossJoin
      // preserves the single input split, so the B×n md5 weight draws
      // would all run on ONE core (the single-split decode rule)
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value").cast("decimal(18,2)").as("v"))
        .repartition(s.sparkContext.defaultParallelism)
      val reps = s.range(1, bootstrapB + 1).toDF("r")
      val h4 = substring(md5(concat(col("event_id").cast("string"),
        lit(":"), col("r").cast("string"))), 1, 4)
      val w = poissonCutsHex.map(c => (h4 >= lit(c)).cast("int"))
        .reduce(_ + _)
      val means = ev.crossJoin(broadcast(reps))
        .select(col("r"), col("v"), w.as("w"))
        .groupBy("r")
        .agg(round(sum(col("w") * col("v")).cast("double") / sum("w"), 4)
          .as("m"))
      val rkw = Window.orderBy("m", "r")
      val ranked = means.withColumn("rk", row_number().over(rkw))
      val pt = ev.agg(count(lit(1)).cast("bigint").as("n_rows"),
        round(sum("v").cast("double") / count(lit(1)), 4).as("point_mean"))
      ranked.crossJoin(broadcast(pt))
        .groupBy("n_rows", "point_mean")
        .agg(max(when(col("rk") === 2, col("m"))).as("ci_lo"),
          max(when(col("rk") === bootstrapB - 1, col("m"))).as("ci_hi"))
        .select(lit(bootstrapB).as("b"), col("n_rows"), col("point_mean"),
          col("ci_lo"), col("ci_hi"))
    },

    // ------------------------------------------------------------------
    // Theil-Sen robust trend slope of the daily value series: the
    // median of all pairwise slopes (xⱼ−xᵢ)/(dⱼ−dᵢ) — outlier-immune
    // where the OLS slope of q_regression_trend is not (one bad
    // ingestion day can't move it). SCALE SHAPE: the pair frame is the
    // DAILY frame self-joined — date-domain bounded (k days ⇒ k(k−1)/2
    // rows at ANY corpus volume), so the O(k²) pair set and its
    // single-partition rank are trivially small forever; the only
    // corpus-scale pass is the shared daily aggregate. DETERMINISM:
    // slopes are identical double divisions of exact decimal diffs,
    // rounded 6dp; the median is the LOWER-median order statistic under
    // a total (slope, day-pair) order — a single picked value, because
    // averaging the two middle 6dp slopes lands exactly on 7th-decimal
    // halves where Spark's decimal HALF_UP and DuckDB's binary rounding
    // diverge (the half-tie class the determinism rules forbid).
    QueryDef.sql(
      "q_theil_sen",
      s"""WITH $dailySql,
        |p AS (
        |  SELECT round(CAST(b.x - a.x AS DOUBLE) / (b.day - a.day), 6)
        |      AS slope,
        |    a.day AS da, b.day AS db
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |rk AS (
        |  SELECT slope,
        |    row_number() OVER (ORDER BY slope, da, db) AS r,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m
        |  FROM p)
        |SELECT m AS n_pairs, slope AS sen_slope
        |FROM rk WHERE r = (m + 1) // 2""".stripMargin) { (s, d) =>
      val dd = daily(s, d)
      val a = dd.select(col("day").as("da"), col("x").as("ax"))
      val b = dd.select(col("day").as("db"), col("x").as("bx"))
      val p = a.join(b, col("db") > col("da"))
        .select(round((col("bx") - col("ax")).cast("double")
          / datediff(col("db"), col("da")), 6).as("slope"),
          col("da"), col("db"))
      val rk = p.select(col("slope"),
        row_number().over(Window.orderBy("slope", "da", "db")).as("r"),
        count(lit(1)).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .cast("bigint").as("m"))
      // `div`, not `/`: Column `/` is DOUBLE division and the equality
      // against a .5 index would silently never match
      rk.filter(col("r") === expr("(m + 1) div 2"))
        .select(col("m").as("n_pairs"), col("slope").as("sen_slope"))
    },

    // ------------------------------------------------------------------
    // MAD-based robust anomaly days: median / median-absolute-deviation
    // of the daily totals, robust z = 0.6745·(x−med)/MAD, top-5 |z|
    // days — the robust sibling of q_rolling_anomaly (a mean/std
    // monitor is itself dragged by the outliers it should flag; the
    // breakdown point of MAD is 50%). Same daily-frame boundedness as
    // q_theil_sen: both medians are order statistics of the k-day
    // frame. DETERMINISM: med/MAD stay UNROUNDED doubles (identical
    // IEEE arithmetic from identical decimal inputs in both engines);
    // rounding happens only on output columns, and the top-5 order is
    // (4dp |z|, day) — boundary-proof.
    QueryDef.sql(
      "q_mad_anomaly",
      s"""WITH $dailySql,
        |rk AS (
        |  SELECT day, x, row_number() OVER (ORDER BY x, day) AS r,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS k
        |  FROM daily),
        |med AS (
        |  SELECT SUM(CAST(x AS DOUBLE)) / COUNT(*) AS med FROM rk
        |  WHERE r = (k + 1) // 2 OR r = (k + 2) // 2),
        |dev AS (
        |  SELECT day, x, abs(CAST(x AS DOUBLE) - med) AS ad, med
        |  FROM rk, med),
        |drk AS (
        |  SELECT day, x, ad, med, row_number() OVER (ORDER BY ad, day)
        |      AS r,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS k
        |  FROM dev),
        |mad AS (
        |  SELECT SUM(ad) / COUNT(*) AS mad FROM drk
        |  WHERE r = (k + 1) // 2 OR r = (k + 2) // 2)
        |SELECT day, round(CAST(x AS DOUBLE), 2) AS x,
        |  round(med, 4) AS med, round(mad, 4) AS mad,
        |  round(0.6745 * (CAST(x AS DOUBLE) - med) / mad, 4) AS z
        |FROM dev, mad
        |ORDER BY abs(round(0.6745 * (CAST(x AS DOUBLE) - med) / mad, 4))
        |  DESC, day LIMIT 5""".stripMargin) { (s, d) =>
      val dd = daily(s, d)
      val kw = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val rk = dd.select(col("day"), col("x"),
        row_number().over(Window.orderBy("x", "day")).as("r"),
        count(lit(1)).over(kw).cast("bigint").as("k"))
      val med = rk.filter(col("r") === expr("(k + 1) div 2")
          || col("r") === expr("(k + 2) div 2"))
        .agg((sum(col("x").cast("double")) / count(lit(1))).as("med"))
      val dev = dd.crossJoin(broadcast(med))
        .select(col("day"), col("x"),
          abs(col("x").cast("double") - col("med")).as("ad"), col("med"))
      val drk = dev.select(col("day"), col("ad"),
        row_number().over(Window.orderBy("ad", "day")).as("r"),
        count(lit(1)).over(kw).cast("bigint").as("k"))
      val mad = drk.filter(col("r") === expr("(k + 1) div 2")
          || col("r") === expr("(k + 2) div 2"))
        .agg((sum("ad") / count(lit(1))).as("mad"))
      val z = round(lit(0.6745) * (col("x").cast("double") - col("med"))
        / col("mad"), 4)
      dev.crossJoin(broadcast(mad))
        .select(col("day"), round(col("x").cast("double"), 2).as("x"),
          round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
          z.as("z"))
        .orderBy(abs(col("z")).desc, col("day")).limit(5)
    },

    // ------------------------------------------------------------------
    // Data-freshness / pipeline-lag audit: per event stream, how stale is
    // the newest record vs the globally newest (in whole seconds —
    // second-floored subtraction is identical across engines), and what
    // share of the stream arrived in the trailing 24 h window. The ops
    // dashboard every streaming ingest runs; a stream whose staleness
    // grows is a dead producer. SCALE: one map-side-combined aggregate
    // per type + a 1-row broadcast global max; all integers + halfUp4.
    QueryDef.sql(
      "q_freshness_audit",
      s"""WITH g AS (SELECT MAX(ts) AS gmax FROM events),
        |t AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MAX(ts) AS tmax,
        |    CAST(SUM(CASE WHEN ts >= g.gmax - INTERVAL 24 HOUR
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h,
        |    MAX(g.gmax) AS gmax
        |  FROM events CROSS JOIN g GROUP BY event_type)
        |SELECT event_type, n_events,
        |  CAST(datediff('second', tmax, gmax) AS BIGINT) AS staleness_s,
        |  n_last_24h,
        |  ${TextAnalysis.halfUp4Sql("n_last_24h", "n_events")}
        |    AS share_24h
        |FROM t ORDER BY event_type""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d).agg(max("ts").as("gmax"))
      Tables.events(s, d).crossJoin(broadcast(g))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("bigint").as("n_events"),
          max("ts").as("tmax"),
          sum(when(col("ts") >= col("gmax") - expr("INTERVAL 24 HOUR"), 1L)
            .otherwise(0L)).cast("bigint").as("n_last_24h"),
          max("gmax").as("gmax"))
        .select(col("event_type"), col("n_events"),
          (unix_timestamp(col("gmax")) - unix_timestamp(col("tmax")))
            .cast("bigint").as("staleness_s"),
          col("n_last_24h"),
          TextAnalysis.halfUp4("n_last_24h", "n_events").as("share_24h"))
        .orderBy("event_type")
    })
}
