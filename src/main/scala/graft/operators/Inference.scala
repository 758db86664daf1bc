package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / causal inference over the fact tables: one-way ANOVA,
  * multiple-testing control (Benjamini–Hochberg), difference-in-
  * differences, split-conformal prediction intervals, Kendall rank
  * correlation, and blocked fuzzy record linkage. These are the
  * "is this data shift real, and which segments moved?" primitives an
  * experimentation / data-curation platform runs next to the
  * descriptive suite (q_ab_welch_ttest, q_ks_test, q_mann_whitney).
  *
  * Scale design (100 TB): every query is one (or two) map-side-combined
  * aggregations over the raw fact table down to a domain-bounded frame —
  * arms pivoted into a single row (ANOVA's 5 priorities, DiD's 2×2), the
  * 25-nation hypothesis frame, the calendar-bounded daily/monthly grid,
  * or the generator-bounded distinct-name domain — and all inference
  * arithmetic runs on that tiny frame. No shuffle grows with the corpus;
  * global windows only ever see domain-bounded inputs.
  *
  * Cross-engine determinism (the q_ab_welch_ttest / q_rolling_anomaly
  * conventions): raw-data sums are exact DECIMAL / BIGINT-cents; scalar
  * statistics are FIXED expression trees over those exact aggregates
  * (identical IEEE evaluation in both engines — never a multi-row double
  * sum); each libm output (exp) is rounded before further use; and wide
  * decimals (sums of squares) reach double through the BIGINT bridge —
  * round(dec, 0) → BIGINT → DOUBLE is a single exactly-rounded IEEE
  * conversion in both engines, where a >15-significant-digit
  * decimal→double cast is not (DuckDB's int128 two-step conversion
  * differs from Java BigDecimal by an ulp).
  */
object Inference {

  /** DECIMAL sum-of-squares → DOUBLE via the BIGINT bridge (see class
    * doc). Loses the sub-unit fraction of a ~1e14 quantity — far below
    * the final 4-decimal output rounding — in exchange for an exactly
    * reproducible conversion. */
  private def bridge(c: Column): Column =
    round(c, 0).cast("bigint").cast("double")
  private def bridgeSql(e: String): String =
    s"CAST(CAST(round($e, 0) AS BIGINT) AS DOUBLE)"

  // ====================================================================
  // q_anova_f — one-way ANOVA across the five order priorities
  // ====================================================================

  /** The closed priority domain (TPC-H dbgen values): pivoting the five
    * groups into ONE row makes every cross-group reduction a fixed
    * expression tree — no ordering ambiguity, no decimal→double width
    * issues beyond the bridged sums of squares. */
  private val prios =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private def anovaArmsSql: String = prios.zipWithIndex.map { case (p, i) =>
    s"""CAST(COUNT(*) FILTER (o_orderpriority = '$p') AS BIGINT) AS n$i,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       |      FILTER (o_orderpriority = '$p') AS s1g$i,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))
       |        * CAST(o_totalprice AS DECIMAL(18,2)))
       |      FILTER (o_orderpriority = '$p') AS s2g$i""".stripMargin
  }.mkString(",\n    ")

  // ====================================================================
  // shared pre/post experiment frame (q_cuped, q_cem_att)
  // ====================================================================

  /** Per-user pre/post-period purchase totals with the deterministic
    * treatment flag (even user_id), split at the corpus-midpoint
    * cutover — the covariate/outcome frame CUPED and CEM both consume.
    * Cross-query shared (the SeriesOps.daily convention): one user-keyed
    * hash aggregate over the purchase log, persisted once per corpus. */
  private def prePost(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.sharedFrame(
      s"inference:prepost:${graft.CacheRegistry.sessionToken(s)}:$d") {
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
      val anchor = purch.agg(min(to_date(col("ts"))).as("mn"),
        max(to_date(col("ts"))).as("mx"))
      purch.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          when(to_date(col("ts")) >= date_add(col("mn"),
              (datediff(col("mx"), col("mn")) / 2).cast("int")),
            1).otherwise(0).cast("int").as("post"),
          col("value").cast("decimal(18,2)").as("v"))
        .groupBy("user_id")
        .agg(
          coalesce(sum(when(col("post") === 0, col("v"))),
            lit(0).cast("decimal(18,2)")).as("x"),
          coalesce(sum(when(col("post") === 1, col("v"))),
            lit(0).cast("decimal(18,2)")).as("y"))
        .withColumn("treat",
          (col("user_id") % 2 === 0).cast("int"))
    }

  /** The matching oracle CTE chain (anchor → flagged → byuser). */
  private val prePostSql: String =
    """anchor AS (
      |  SELECT MIN(CAST(ts AS DATE)) AS mn, MAX(CAST(ts AS DATE)) AS mx
      |  FROM events WHERE event_type = 'purchase'),
      |flagged AS (
      |  SELECT user_id,
      |    CAST(CASE WHEN CAST(ts AS DATE) >=
      |        a.mn + CAST((a.mx - a.mn) // 2 AS INTEGER)
      |      THEN 1 ELSE 0 END AS INTEGER) AS post,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events CROSS JOIN anchor a WHERE event_type = 'purchase'),
      |byuser AS (
      |  SELECT user_id,
      |    COALESCE(SUM(v) FILTER (post = 0), CAST(0 AS DECIMAL(18,2)))
      |      AS x,
      |    COALESCE(SUM(v) FILTER (post = 1), CAST(0 AS DECIMAL(18,2)))
      |      AS y,
      |    CAST(user_id % 2 = 0 AS INTEGER) AS treat
      |  FROM flagged GROUP BY user_id)""".stripMargin

  // ====================================================================
  // registry
  // ====================================================================

  def defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // One-way ANOVA: does mean order value differ across the five order
    // priorities? F = (SSB/(k-1)) / (SSW/(n-k)) plus the effect size
    // η² = SSB/SST. One single-pass conditional aggregate pivots the
    // five arms into one row (the q_ab_welch_ttest shape at k=5); SSB /
    // SSW are fixed five-term trees over exact decimal moments, with the
    // sums of squares bridged through BIGINT. Output cardinality = 1.
    QueryDef.sql(
      "q_anova_f", {
        val s1d = (0 until 5).map(i => s"CAST(s1g$i AS DOUBLE)")
        val s2d = (0 until 5).map(i => bridgeSql(s"s2g$i"))
        val nn = (0 until 5).map(i => s"n$i").mkString(" + ")
        val ts1 = (0 until 5).map(i => s"s1g$i").mkString(" + ")
        val ssw = (0 until 5).map(i =>
          s"(${s2d(i)} - ${s1d(i)} * ${s1d(i)} / n$i)").mkString(" + ")
        val ssb = (0 until 5).map(i =>
          s"n$i * (${s1d(i)} / n$i - gm) * (${s1d(i)} / n$i - gm)")
          .mkString(" + ")
        s"""WITH g AS (
          |  SELECT $anovaArmsSql
          |  FROM orders),
          |t AS (
          |  SELECT CAST($nn AS BIGINT) AS n_total,
          |    CAST($ts1 AS DOUBLE) / ($nn) AS gm, g.*
          |  FROM g),
          |ss AS (
          |  SELECT n_total, gm, ($ssw) AS ssw, ($ssb) AS ssb FROM t)
          |SELECT n_total, round(gm, 4) AS grand_mean,
          |  round((ssb / 4) / (ssw / (n_total - 5)), 4) AS f_stat,
          |  round(ssb / (ssb + ssw), 4) AS eta_sq
          |FROM ss""".stripMargin
      }) { (s, d) =>
      val vdec = col("o_totalprice").cast("decimal(18,2)")
      val aggs = prios.zipWithIndex.flatMap { case (p, i) =>
        val cond = col("o_orderpriority") === p
        Seq(count(when(cond, 1)).as(s"n$i"),
          sum(when(cond, vdec)).as(s"s1g$i"),
          sum(when(cond, vdec * vdec)).as(s"s2g$i"))
      }
      val g = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
      val nn = (0 until 5).map(i => col(s"n$i")).reduce(_ + _)
      val ts1 = (0 until 5).map(i => col(s"s1g$i")).reduce(_ + _)
      val t = g.withColumn("n_total", nn.cast("bigint"))
        .withColumn("gm", ts1.cast("double") / nn)
      def s1d(i: Int) = col(s"s1g$i").cast("double")
      val ssw = (0 until 5).map(i =>
        bridge(col(s"s2g$i")) - s1d(i) * s1d(i) / col(s"n$i")).reduce(_ + _)
      val ssb = (0 until 5).map(i =>
        col(s"n$i") * (s1d(i) / col(s"n$i") - col("gm"))
          * (s1d(i) / col(s"n$i") - col("gm"))).reduce(_ + _)
      t.withColumn("ssw", ssw).withColumn("ssb", ssb)
        .select(col("n_total"), round(col("gm"), 4).as("grand_mean"),
          round((col("ssb") / 4) / (col("ssw") / (col("n_total") - 5)), 4)
            .as("f_stat"),
          round(col("ssb") / (col("ssb") + col("ssw")), 4).as("eta_sq"))
    },

    // ------------------------------------------------------------------
    // Tukey-Kramer HSD post-hoc: the pairwise readout after q_anova_f's
    // omnibus F — WHICH of the five priority arms differ. For each of
    // the 10 unordered arm pairs the studentized-range statistic
    // q = |m_i − m_j| / sqrt(MSW/2 · (1/n_i + 1/n_j)) is compared
    // against q_{0.05, k=5, df→∞} = 3.858 (literal critical value
    // rendered into both engines; the gate SFs put df in the tens of
    // thousands, where the ∞ row is exact to 3 decimals). Everything
    // reduces in the SAME one-pass arms pivot as q_anova_f (exact
    // decimal moments, bridged sums of squares); the 10 pairs are a
    // fixed literal frame joined to the 1-row aggregate, so the plan is
    // one corpus scan + a constant expression tree at any scale.
    QueryDef.sql(
      "q_tukey_hsd", {
        val pairVals = (for { i <- 0 until 5; j <- i + 1 until 5 }
          yield s"($i, $j)").mkString(", ")
        def s1d(i: String) = s"CAST(CASE $i ${(0 until 5).map(k =>
          s"WHEN $k THEN s1g$k").mkString(" ")} END AS DOUBLE)"
        def nOf(i: String) = s"(CASE $i ${(0 until 5).map(k =>
          s"WHEN $k THEN n$k").mkString(" ")} END)"
        val ssw = (0 until 5).map(i =>
          s"(${bridgeSql(s"s2g$i")} - CAST(s1g$i AS DOUBLE)" +
            s" * CAST(s1g$i AS DOUBLE) / n$i)").mkString(" + ")
        val nn = (0 until 5).map(i => s"n$i").mkString(" + ")
        val prioCase = (sel: String) => s"CASE $sel ${prios.zipWithIndex
          .map { case (p, k) => s"WHEN $k THEN '$p'" }.mkString(" ")} END"
        s"""WITH g AS (
          |  SELECT $anovaArmsSql
          |  FROM orders),
          |m AS (SELECT g.*,
          |    round(($ssw) / (($nn) - 5), 6) AS msw FROM g),
          |pr AS (SELECT * FROM (VALUES $pairVals) t(i, j)),
          |scored AS (
          |  SELECT ${prioCase("i")} AS arm_a, ${prioCase("j")} AS arm_b,
          |    CAST(${nOf("i")} AS BIGINT) AS n_a,
          |    CAST(${nOf("j")} AS BIGINT) AS n_b,
          |    round(${s1d("i")} / ${nOf("i")}
          |      - ${s1d("j")} / ${nOf("j")}, 6) AS diff,
          |    msw
          |  FROM pr, m)
          |SELECT arm_a, arm_b, n_a, n_b, round(diff, 4) AS mean_diff,
          |  round(abs(diff) / sqrt(msw / 2 * (1.0/n_a + 1.0/n_b)), 4)
          |    AS q_stat,
          |  CAST(round(abs(diff) / sqrt(msw / 2 * (1.0/n_a + 1.0/n_b)), 4)
          |    > 3.858 AS INTEGER) AS significant
          |FROM scored ORDER BY arm_a, arm_b""".stripMargin
      }) { (s, d) =>
      val vdec = col("o_totalprice").cast("decimal(18,2)")
      val aggs = prios.zipWithIndex.flatMap { case (p, i) =>
        val cond = col("o_orderpriority") === p
        Seq(count(when(cond, 1)).as(s"n$i"),
          sum(when(cond, vdec)).as(s"s1g$i"),
          sum(when(cond, vdec * vdec)).as(s"s2g$i"))
      }
      def s1d(i: Int) = col(s"s1g$i").cast("double")
      val ssw = (0 until 5).map(i =>
        bridge(col(s"s2g$i")) - s1d(i) * s1d(i) / col(s"n$i")).reduce(_ + _)
      val nn = (0 until 5).map(i => col(s"n$i")).reduce(_ + _)
      val m = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
        .withColumn("msw", round(ssw / (nn - 5), 6))
      import s.implicits._
      val pairs = (for { i <- 0 until 5; j <- i + 1 until 5 }
        yield (i, j)).toDF("i", "j")
      def pick(sel: Column, f: Int => Column): Column =
        (1 until 5).foldLeft(when(sel === 0, f(0))) { (acc, k) =>
          acc.when(sel === k, f(k))
        }
      val scored = pairs.crossJoin(broadcast(m))
        .withColumn("n_a", pick(col("i"), i => col(s"n$i")).cast("bigint"))
        .withColumn("n_b", pick(col("j"), j => col(s"n$j")).cast("bigint"))
        .withColumn("diff", round(
          pick(col("i"), i => s1d(i) / col(s"n$i"))
            - pick(col("j"), j => s1d(j) / col(s"n$j")), 6))
        .withColumn("arm_a", pick(col("i"), i => lit(prios(i))))
        .withColumn("arm_b", pick(col("j"), j => lit(prios(j))))
      val se = sqrt(col("msw") / 2 * (lit(1.0) / col("n_a")
        + lit(1.0) / col("n_b")))
      scored.select(col("arm_a"), col("arm_b"), col("n_a"), col("n_b"),
          round(col("diff"), 4).as("mean_diff"),
          round(abs(col("diff")) / se, 4).as("q_stat"),
          (round(abs(col("diff")) / se, 4) > 3.858).cast("int")
            .as("significant"))
        .orderBy("arm_a", "arm_b")
    },

    // ------------------------------------------------------------------
    // Benjamini–Hochberg FDR control over 25 simultaneous hypotheses:
    // per-nation "does this nation's mean order value differ from the
    // global mean?" z-tests, then the BH step-up at α = 0.05. The raw
    // data reduces in ONE pass to per-nation exact moments (plus one
    // global-moment row); z is a fixed scalar tree, the normal tail is
    // the closed-form approximation p ≈ 2·exp(−0.717|z| − 0.416z²)
    // (identical formula rendered into both engines; exp output rounded
    // at 6dp), and the step-up compares p·m ≤ rank·α in EXACT decimal
    // space (cross-multiplied — no division, no double boundary).
    // Windows only touch the 25-row hypothesis frame.
    QueryDef.sql(
      "q_fdr_bh", {
        val vp = s"(g.s2d - CAST(g.s1 AS DOUBLE)" +
          s" * CAST(g.s1 AS DOUBLE) / g.n) / (g.n - 1)"
        s"""WITH cust AS (
          |  SELECT c.c_nationkey AS nk,
          |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
          |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
          |bynat AS (
          |  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s1,
          |    SUM(v * v) AS s2
          |  FROM cust GROUP BY nk),
          |gmom AS (
          |  SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(s1) AS s1,
          |    ${bridgeSql("SUM(s2)")} AS s2d
          |  FROM bynat),
          |z AS (
          |  SELECT b.nk, b.n,
          |    round((CAST(b.s1 AS DOUBLE) / b.n - CAST(g.s1 AS DOUBLE) / g.n)
          |      / sqrt(($vp) / b.n), 6) AS zr
          |  FROM bynat b CROSS JOIN gmom g),
          |p AS (
          |  SELECT nk, n, zr,
          |    CAST(least(1.0,
          |        2 * round(exp(-0.717 * abs(zr) - 0.416 * zr * zr), 6))
          |      AS DECIMAL(8,6)) AS pv
          |  FROM z),
          |ranked AS (
          |  SELECT p.*, n2.n_name,
          |    CAST(row_number() OVER (ORDER BY pv, n2.n_name) AS INTEGER)
          |      AS rnk,
          |    CAST(COUNT(*) OVER () AS INTEGER) AS m
          |  FROM p JOIN nation n2 ON p.nk = n2.n_nationkey),
          |cut AS (
          |  SELECT ranked.*,
          |    MAX(CASE WHEN pv * m <= rnk * CAST(0.05 AS DECIMAL(3,2))
          |      THEN rnk ELSE 0 END) OVER () AS kstar
          |  FROM ranked)
          |SELECT n_name, n, round(zr, 4) AS z_stat,
          |  CAST(pv AS DOUBLE) AS p_value, rnk,
          |  CAST(CASE WHEN rnk <= kstar THEN 1 ELSE 0 END AS INTEGER)
          |    AS rejected
          |FROM cut ORDER BY rnk, n_name""".stripMargin
      }) { (s, d) =>
      val cust = Tables.orders(s, d)
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          col("o_totalprice").cast("decimal(18,2)").as("v"))
      // per-nation exact moments in ONE pass over the fact join; the
      // global moments derive from the 25-row frame (decimal sums are
      // exact in any order), which is persisted for its two consumers
      val bynat = graft.CacheRegistry.ensurePersisted(cust.groupBy("nk")
        .agg(count(lit(1)).as("n"), sum("v").as("s1"),
          sum(col("v") * col("v")).as("s2")))
      val glob = bynat.agg(sum("n").cast("bigint").as("gn"),
        sum("s1").as("gs1"), bridge(sum("s2")).as("gs2d"))
      val vp = (col("gs2d") - col("gs1").cast("double")
        * col("gs1").cast("double") / col("gn")) / (col("gn") - 1)
      val z = bynat.crossJoin(broadcast(glob))
        .select(col("nk"), col("n"),
          round((col("s1").cast("double") / col("n")
            - col("gs1").cast("double") / col("gn"))
            / sqrt(vp / col("n")), 6).as("zr"))
      val p = z.withColumn("pv",
        least(lit(1.0),
          lit(2) * round(exp(lit(-0.717) * abs(col("zr"))
            - lit(0.416) * col("zr") * col("zr")), 6))
          .cast("decimal(8,6)"))
      val ranked = p.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name"))), "nk")
        .withColumn("rnk",
          row_number().over(Window.orderBy("pv", "n_name")))
        .withColumn("m", count(lit(1)).over(Window.partitionBy())
          .cast("int"))
      val cut = ranked.withColumn("kstar",
        max(when(col("pv") * col("m")
            <= col("rnk") * lit(BigDecimal("0.05")), col("rnk"))
          .otherwise(0)).over(Window.partitionBy()))
      cut.select(col("n_name"), col("n"), round(col("zr"), 4).as("z_stat"),
          col("pv").cast("double").as("p_value"), col("rnk"),
          when(col("rnk") <= col("kstar"), 1).otherwise(0).cast("int")
            .as("rejected"))
        .orderBy("rnk", "n_name")
    },

    // ------------------------------------------------------------------
    // Difference-in-differences: purchase-value lift for the treated
    // cohort (even user_id — a deterministic assignment standing in for
    // a rollout flag) after the corpus-midpoint cutover, net of the
    // control cohort's trend. One single-pass 2×2 conditional aggregate
    // (the Welch shape at four arms); the cutoff is a 1-row broadcast
    // anchor (min/max day midpoint, integer date arithmetic); estimate
    // and its large-sample t are fixed trees over exact decimal moments.
    QueryDef.sql(
      "q_did_lift", {
        def armSql(tag: String, cond: String) =
          s"""CAST(COUNT(*) FILTER ($cond) AS BIGINT) AS n_$tag,
             |    SUM(CAST(value AS DECIMAL(18,2))) FILTER ($cond)
             |      AS s1_$tag,
             |    SUM(CAST(value AS DECIMAL(18,2))
             |        * CAST(value AS DECIMAL(18,2))) FILTER ($cond)
             |      AS s2_$tag""".stripMargin
        val arms = Seq(
          "t_pre" -> "treat = 1 AND post = 0",
          "t_post" -> "treat = 1 AND post = 1",
          "c_pre" -> "treat = 0 AND post = 0",
          "c_post" -> "treat = 0 AND post = 1")
        def m(t: String) = s"CAST(s1_$t AS DOUBLE) / n_$t"
        def va(t: String) = s"((CAST(s2_$t AS DOUBLE) - CAST(s1_$t AS DOUBLE)" +
          s" * CAST(s1_$t AS DOUBLE) / n_$t) / (n_$t - 1)) / n_$t"
        s"""WITH anchor AS (
          |  SELECT MIN(CAST(ts AS DATE)) AS mn, MAX(CAST(ts AS DATE)) AS mx
          |  FROM events WHERE event_type = 'purchase'),
          |flagged AS (
          |  SELECT CAST(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END
          |      AS INTEGER) AS treat,
          |    CAST(CASE WHEN CAST(ts AS DATE) >=
          |        a.mn + CAST((a.mx - a.mn) // 2 AS INTEGER)
          |      THEN 1 ELSE 0 END AS INTEGER) AS post,
          |    value
          |  FROM events CROSS JOIN anchor a
          |  WHERE event_type = 'purchase'),
          |g AS (
          |  SELECT ${arms.map { case (t, c) => armSql(t, c) }
            .mkString(",\n    ")}
          |  FROM flagged)
          |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
          |  round(${m("t_pre")}, 4) AS mean_t_pre,
          |  round(${m("t_post")}, 4) AS mean_t_post,
          |  round(${m("c_pre")}, 4) AS mean_c_pre,
          |  round(${m("c_post")}, 4) AS mean_c_post,
          |  round((${m("t_post")} - ${m("t_pre")})
          |    - (${m("c_post")} - ${m("c_pre")}), 4) AS did_estimate,
          |  round(((${m("t_post")} - ${m("t_pre")})
          |      - (${m("c_post")} - ${m("c_pre")}))
          |    / sqrt(${arms.map(a => va(a._1)).mkString(" + ")}), 4)
          |    AS t_stat
          |FROM g""".stripMargin
      }) { (s, d) =>
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
      val anchor = purch.agg(min(to_date(col("ts"))).as("mn"),
        max(to_date(col("ts"))).as("mx"))
      val flagged = purch.crossJoin(broadcast(anchor))
        .select(
          when(col("user_id") % 2 === 0, 1).otherwise(0).cast("int")
            .as("treat"),
          when(to_date(col("ts")) >= date_add(col("mn"),
              (datediff(col("mx"), col("mn")) / 2).cast("int")),
            1).otherwise(0).cast("int").as("post"),
          col("value"))
      val vdec = col("value").cast("decimal(18,2)")
      val arms = Seq(("t_pre", 1, 0), ("t_post", 1, 1),
        ("c_pre", 0, 0), ("c_post", 0, 1))
      val aggs = arms.flatMap { case (t, tr, po) =>
        val cond = col("treat") === tr && col("post") === po
        Seq(count(when(cond, 1)).as(s"n_$t"),
          sum(when(cond, vdec)).as(s"s1_$t"),
          sum(when(cond, vdec * vdec)).as(s"s2_$t"))
      }
      val g = flagged.agg(aggs.head, aggs.tail: _*)
      def m(t: String) = col(s"s1_$t").cast("double") / col(s"n_$t")
      def va(t: String) =
        ((col(s"s2_$t").cast("double") - col(s"s1_$t").cast("double")
          * col(s"s1_$t").cast("double") / col(s"n_$t"))
          / (col(s"n_$t") - 1)) / col(s"n_$t")
      val did = (m("t_post") - m("t_pre")) - (m("c_post") - m("c_pre"))
      g.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
        col("n_c_post"),
        round(m("t_pre"), 4).as("mean_t_pre"),
        round(m("t_post"), 4).as("mean_t_post"),
        round(m("c_pre"), 4).as("mean_c_pre"),
        round(m("c_post"), 4).as("mean_c_post"),
        round(did, 4).as("did_estimate"),
        round(did / sqrt(arms.map(a => va(a._1)).reduce(_ + _)), 4)
          .as("t_stat"))
    },

    // EVENT-STUDY difference-in-differences (r15): q_did_lift's 2×2
    // collapses time — this is the per-period version every serious
    // rollout analysis runs instead, because the PRE-period effects are
    // the identifying-assumption check (parallel pre-trends ⇒ effects
    // ≈ 0 before the cutover) and the post-period path shows effect
    // dynamics, not one pooled number. Same fixture conventions as
    // q_did_lift (treat = even user_id, cutover = corpus-midpoint day);
    // periods are relative weeks via floor((day − cut)/7) — floor, not
    // truncate, so pre weeks bucket correctly on both engines. Effect_k
    // = (mean_t,k − mean_c,k) − pre_gap, where pre_gap is the pooled
    // pre-period treated−control gap (the baseline differenced out).
    // Exact decimal sums; 4dp readouts. SCALE: one map-side-combined
    // conditional aggregate keyed by rel_week (calendar-bounded frame)
    // + a 1-row broadcast baseline; the anchor is the q_did_lift 1-row
    // min/max frame.
    QueryDef.sql(
      "q_did_event_study",
      """WITH anchor AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS mn, MAX(CAST(ts AS DATE)) AS mx
        |  FROM events WHERE event_type = 'purchase'),
        |flagged AS (
        |  SELECT CAST(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END
        |      AS INTEGER) AS treat,
        |    CAST(floor((CAST(ts AS DATE)
        |        - (a.mn + CAST((a.mx - a.mn) // 2 AS INTEGER))) / 7.0)
        |      AS INTEGER) AS rel_week,
        |    value
        |  FROM events CROSS JOIN anchor a
        |  WHERE event_type = 'purchase'),
        |wk AS (
        |  SELECT rel_week,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c,
        |    SUM(CAST(value AS DECIMAL(18,2))) FILTER (treat = 1) AS s_t,
        |    SUM(CAST(value AS DECIMAL(18,2))) FILTER (treat = 0) AS s_c
        |  FROM flagged GROUP BY 1),
        |base AS (
        |  SELECT CAST(SUM(s_t) AS DOUBLE) / SUM(n_t)
        |       - CAST(SUM(s_c) AS DOUBLE) / SUM(n_c) AS pre_gap
        |  FROM wk WHERE rel_week < 0)
        |SELECT w.rel_week, w.n_t, w.n_c,
        |  round(CAST(w.s_t AS DOUBLE) / w.n_t, 4) AS mean_t,
        |  round(CAST(w.s_c AS DOUBLE) / w.n_c, 4) AS mean_c,
        |  round((CAST(w.s_t AS DOUBLE) / w.n_t
        |      - CAST(w.s_c AS DOUBLE) / w.n_c) - b.pre_gap, 4) AS effect
        |FROM wk w, base b ORDER BY w.rel_week""".stripMargin) { (s, d) =>
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
      val anchor = purch.agg(min(to_date(col("ts"))).as("mn"),
        max(to_date(col("ts"))).as("mx"))
      val vdec = col("value").cast("decimal(18,2)")
      val flagged = purch.crossJoin(broadcast(anchor))
        .select(
          when(col("user_id") % 2 === 0, 1).otherwise(0).cast("int")
            .as("treat"),
          floor(datediff(to_date(col("ts")), date_add(col("mn"),
            (datediff(col("mx"), col("mn")) / 2).cast("int"))) / 7.0)
            .cast("int").as("rel_week"),
          col("value"))
      val wk = graft.CacheRegistry.register(flagged.groupBy("rel_week")
        .agg(count(when(col("treat") === 1, 1)).as("n_t"),
          count(when(col("treat") === 0, 1)).as("n_c"),
          sum(when(col("treat") === 1, vdec)).as("s_t"),
          sum(when(col("treat") === 0, vdec)).as("s_c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val base = wk.filter(col("rel_week") < 0)
        .agg((sum("s_t").cast("double") / sum("n_t")
          - sum("s_c").cast("double") / sum("n_c")).as("pre_gap"))
      val gap = col("s_t").cast("double") / col("n_t") -
        col("s_c").cast("double") / col("n_c")
      wk.crossJoin(broadcast(base))
        .select(col("rel_week"), col("n_t"), col("n_c"),
          round(col("s_t").cast("double") / col("n_t"), 4).as("mean_t"),
          round(col("s_c").cast("double") / col("n_c"), 4).as("mean_c"),
          round(gap - col("pre_gap"), 4).as("effect"))
        .orderBy("rel_week")
    },

    // ------------------------------------------------------------------
    // Split-conformal prediction interval for the daily-revenue trend:
    // fit OLS on the even-day split, take the ⌈0.9(n+1)⌉-th smallest
    // absolute residual on the odd-day (calibration) split — a
    // distribution-free 90% interval half-width — and report its
    // realized calibration coverage. The raw table reduces once to the
    // calendar-bounded daily frame (BIGINT-cents sums); OLS moments are
    // exact integers (the q_regression_trend recipe); the order
    // statistic uses an INTEGER ceil formula and a window over the
    // bounded frame.
    QueryDef.sql(
      "q_conformal_interval", {
        s"""WITH daily AS (
          |  SELECT CAST(CAST(o_orderdate AS DATE)
          |      - DATE '1995-01-01' AS BIGINT) AS x,
          |    CAST(o_orderdate AS DATE) AS day,
          |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
          |      AS BIGINT) AS yc
          |  FROM orders GROUP BY 1, 2),
          |fit AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
          |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
          |    CAST(SUM(x * yc) AS BIGINT) AS sxy,
          |    CAST(SUM(x * x) AS BIGINT) AS sxx
          |  FROM daily WHERE x % 2 = 0),
          |ab1 AS (
          |  SELECT n_train, CAST(sx AS DOUBLE) AS sxd,
          |    CAST(sy AS DOUBLE) AS syd,
          |    (CAST(sxy AS DOUBLE)
          |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_train)
          |      / (CAST(sxx AS DOUBLE)
          |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_train)
          |      AS slope_c
          |  FROM fit),
          |ab AS (
          |  SELECT n_train, slope_c,
          |    (syd - slope_c * sxd) / n_train AS icept_c
          |  FROM ab1),
          |calib AS (
          |  SELECT d.day, round(abs(d.yc - (ab.icept_c + ab.slope_c * d.x))
          |      / 100, 6) AS r,
          |    ab.n_train, ab.slope_c, ab.icept_c
          |  FROM daily d CROSS JOIN ab WHERE d.x % 2 = 1),
          |ranked AS (
          |  SELECT calib.*,
          |    CAST(row_number() OVER (ORDER BY r, day) AS BIGINT) AS rk,
          |    CAST(COUNT(*) OVER () AS BIGINT) AS n_calib
          |  FROM calib),
          |q AS (
          |  SELECT n_train, n_calib, slope_c, icept_c, r AS q90
          |  FROM ranked
          |  WHERE rk = least((9 * (n_calib + 1) + 9) // 10, n_calib)),
          |cov AS (
          |  SELECT q.n_train, q.n_calib, q.slope_c, q.icept_c, q.q90,
          |    CAST(SUM(CASE WHEN ranked.r <= q.q90 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_cov
          |  FROM ranked CROSS JOIN q
          |  GROUP BY 1, 2, 3, 4, 5)
          |SELECT n_train, n_calib, round(slope_c / 100, 4) AS slope,
          |  round(icept_c / 100, 4) AS intercept,
          |  round(q90, 4) AS q90_resid,
          |  round(CAST(n_cov AS DOUBLE) / n_calib, 4) AS coverage
          |FROM cov""".stripMargin
      }) { (s, d) =>
      // calendar-bounded daily frame, persisted for its two split
      // consumers (train fit + calibration residuals)
      val daily = graft.CacheRegistry.ensurePersisted(Tables.orders(s, d)
        .groupBy(datediff(to_date(col("o_orderdate")),
            to_date(lit("1995-01-01"))).cast("bigint").as("x"),
          to_date(col("o_orderdate")).as("day"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("bigint").as("yc")))
      val fit = daily.filter(col("x") % 2 === 0).agg(
        count(lit(1)).as("n_train"),
        sum("x").cast("bigint").as("sx"), sum("yc").cast("bigint").as("sy"),
        sum(col("x") * col("yc")).cast("bigint").as("sxy"),
        sum(col("x") * col("x")).cast("bigint").as("sxx"))
      // slope/intercept in DOUBLE space over the exact integer moments
      // (each ≤ 2^53 converts exactly; int64 cross-products like sy·sxx
      // would overflow) — identical fixed trees in both engines
      val ab1 = fit.select(col("n_train"),
        col("sx").cast("double").as("sxd"), col("sy").cast("double")
          .as("syd"),
        ((col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")
            / col("n_train"))
          / (col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")
              / col("n_train"))).as("slope_c"))
      val ab = ab1.select(col("n_train"), col("slope_c"),
        ((col("syd") - col("slope_c") * col("sxd")) / col("n_train"))
          .as("icept_c"))
      val calib = daily.filter(col("x") % 2 === 1)
        .crossJoin(broadcast(ab))
        .select(col("day"),
          round(abs(col("yc") - (col("icept_c")
            + col("slope_c") * col("x"))) / 100, 6).as("r"),
          col("n_train"), col("slope_c"), col("icept_c"))
      val ranked = calib
        .withColumn("rk", row_number().over(Window.orderBy("r", "day"))
          .cast("bigint"))
        .withColumn("n_calib",
          count(lit(1)).over(Window.partitionBy()).cast("bigint"))
      val q = ranked.filter(col("rk") ===
          least(expr("(9 * (n_calib + 1) + 9) div 10"), col("n_calib")))
        .select(col("n_train"), col("n_calib"), col("slope_c"),
          col("icept_c"), col("r").as("q90"))
      val cov = ranked.select(col("r")).crossJoin(broadcast(q))
        .groupBy("n_train", "n_calib", "slope_c", "icept_c", "q90")
        .agg(sum(when(col("r") <= col("q90"), 1L).otherwise(0L))
          .as("n_cov"))
      cov.select(col("n_train"), col("n_calib"),
        round(col("slope_c") / 100, 4).as("slope"),
        round(col("icept_c") / 100, 4).as("intercept"),
        round(col("q90"), 4).as("q90_resid"),
        round(col("n_cov").cast("double") / col("n_calib"), 4)
          .as("coverage"))
    },

    // ------------------------------------------------------------------
    // Kendall τ-b between monthly revenue and monthly order count: rank
    // correlation with tie correction, computed from the concordant /
    // discordant pair counts of the calendar-bounded monthly frame
    // (n ≈ 80 months ⇒ ~3k pairs at ANY corpus size — the pair join is
    // bounded by the calendar, not the data). Entirely integer
    // arithmetic (cents, counts) until the final τ and its normal
    // approximation z; one map-side-combined monthly aggregate is the
    // only pass over the raw table.
    QueryDef.sql(
      "q_kendall_tau",
      """WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12
        |      + month(o_orderdate) - 1 AS BIGINT) AS mon,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS rc,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN (a.rc - b.rc) * (a.cnt - b.cnt) > 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN (a.rc - b.rc) * (a.cnt - b.cnt) < 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |    CAST(SUM(CASE WHEN a.rc = b.rc THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_x,
        |    CAST(SUM(CASE WHEN a.cnt = b.cnt THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_y
        |  FROM monthly a JOIN monthly b ON a.mon < b.mon),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly)
        |SELECT tot.n AS n_months, nc AS n_concordant, nd AS n_discordant,
        |  ties_x, ties_y,
        |  round(CAST(nc - nd AS DOUBLE)
        |    / sqrt(CAST((tot.n * (tot.n - 1) / 2 - ties_x)
        |      * (tot.n * (tot.n - 1) / 2 - ties_y) AS DOUBLE)), 4)
        |    AS tau_b,
        |  round(3 * CAST(nc - nd AS DOUBLE)
        |    / sqrt(CAST(tot.n * (tot.n - 1) * (2 * tot.n + 5) AS DOUBLE)
        |      / 2), 4) AS z_stat
        |FROM pairs CROSS JOIN tot""".stripMargin) { (s, d) =>
      // calendar-bounded monthly frame, persisted for its three
      // consumers (both pair sides + the count)
      val monthly = graft.CacheRegistry.ensurePersisted(Tables.orders(s, d)
        .groupBy(((year(col("o_orderdate")) - 1995) * 12
          + month(col("o_orderdate")) - 1).cast("bigint").as("mon"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("bigint").as("rc"),
          count(lit(1)).as("cnt")))
      val a = monthly.select(col("mon").as("mon_a"), col("rc").as("rc_a"),
        col("cnt").as("cnt_a"))
      val b = monthly.select(col("mon").as("mon_b"), col("rc").as("rc_b"),
        col("cnt").as("cnt_b"))
      val prod = (col("rc_a") - col("rc_b")) * (col("cnt_a") - col("cnt_b"))
      val pairs = a.join(broadcast(b), col("mon_a") < col("mon_b"))
        .agg(
          sum(when(prod > 0, 1L).otherwise(0L)).as("nc"),
          sum(when(prod < 0, 1L).otherwise(0L)).as("nd"),
          sum(when(col("rc_a") === col("rc_b"), 1L).otherwise(0L))
            .as("ties_x"),
          sum(when(col("cnt_a") === col("cnt_b"), 1L).otherwise(0L))
            .as("ties_y"))
      val tot = monthly.agg(count(lit(1)).as("n"))
      val n0 = col("n") * (col("n") - 1) / 2
      pairs.crossJoin(broadcast(tot))
        .select(col("n").as("n_months"), col("nc").as("n_concordant"),
          col("nd").as("n_discordant"), col("ties_x"), col("ties_y"),
          round((col("nc") - col("nd")).cast("double")
            / sqrt(((n0 - col("ties_x")) * (n0 - col("ties_y")))
              .cast("double")), 4).as("tau_b"),
          round(lit(3) * (col("nc") - col("nd")).cast("double")
            / sqrt((col("n") * (col("n") - 1) * (col("n") * 2 + 5))
              .cast("double") / 2), 4).as("z_stat"))
    },

    // ------------------------------------------------------------------
    // Blocked fuzzy record linkage over part names: candidate pairs
    // share a blocking key (the head noun) and link when the edit
    // distance of the modifier is ≤ 2 — the classic blocking-then-
    // compare shape of entity resolution. SCALE SHAPE: the pairwise
    // comparison runs on the DISTINCT-name domain (bounded by the
    // generator vocabulary — 64 names at every SF, carrying per-name
    // counts), never on rows: attribute-domain reduction first, blocked
    // quadratic compare second, is exactly how linkage survives 100 TB.
    // levenshtein() is the same classic DP edit distance in both
    // engines; all other columns are exact integers / strings.
    QueryDef.sql(
      "q_fuzzy_linkage",
      """WITH names AS (
        |  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |    split_part(p_name, ' ', 1) AS adj,
        |    substr(p_name, strpos(p_name, ' ') + 1) AS noun
        |  FROM part GROUP BY 1)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.adj, b.adj) AS INTEGER) AS edit_dist,
        |  a.n_parts AS n_a, b.n_parts AS n_b
        |FROM names a JOIN names b
        |  ON a.noun = b.noun AND a.p_name < b.p_name
        |WHERE levenshtein(a.adj, b.adj) <= 2
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      // distinct-name domain (generator-bounded), persisted for both
      // pair sides — the attribute-domain reduction IS the scale story
      val names = graft.CacheRegistry.ensurePersisted(
        Tables.part(s, d).groupBy("p_name")
          .agg(count(lit(1)).as("n_parts"))
          .withColumn("adj", substring_index(col("p_name"), " ", 1))
          .withColumn("noun",
            expr("substr(p_name, instr(p_name, ' ') + 1)")))
      val a = names.select(col("p_name").as("name_a"),
        col("n_parts").as("n_a"), col("adj").as("adj_a"),
        col("noun").as("noun_a"))
      val b = names.select(col("p_name").as("name_b"),
        col("n_parts").as("n_b"), col("adj").as("adj_b"),
        col("noun").as("noun_b"))
      a.join(broadcast(b), col("noun_a") === col("noun_b")
          && col("name_a") < col("name_b"))
        .filter(levenshtein(col("adj_a"), col("adj_b")) <= 2)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("adj_a"), col("adj_b")).as("edit_dist"),
          col("n_a"), col("n_b"))
        .orderBy("name_a", "name_b")
    },

    // ------------------------------------------------------------------
    // CUPED variance reduction (Deng et al., WSDM'13): the treated-vs-
    // control post-period difference, adjusted by the pre-period
    // covariate with θ = cov(X,Y)/var(X). Algebra note: mean(Y − θ(X−X̄))
    // per arm expands to arm MOMENTS — mean_g(Y) − θ(mean_g(X) − X̄) —
    // so the whole estimator is a fixed tree over exact per-arm sums
    // (never a per-user double pass). Shape: the shared per-user
    // pre/post frame, then ONE two-arm-pivoted moment aggregate.
    QueryDef.sql(
      "q_cuped",
      s"""WITH $prePostSql,
        |m AS (
        |  SELECT
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c,
        |    SUM(x) FILTER (treat = 1) AS sx_t,
        |    SUM(y) FILTER (treat = 1) AS sy_t,
        |    SUM(x) FILTER (treat = 0) AS sx_c,
        |    SUM(y) FILTER (treat = 0) AS sy_c,
        |    ${bridgeSql("SUM(x * x)")} AS sxx,
        |    ${bridgeSql("SUM(x * y)")} AS sxy,
        |    ${bridgeSql("SUM(y * y)")} AS syy,
        |    CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy
        |  FROM byuser),
        |th AS (
        |  SELECT m.*,
        |    (sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |      / (sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |      AS theta
        |  FROM m)
        |SELECT n_t, n_c, round(theta, 4) AS theta,
        |  round(CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c, 4)
        |    AS raw_diff,
        |  round((CAST(sy_t AS DOUBLE) / n_t
        |      - theta * (CAST(sx_t AS DOUBLE) / n_t
        |        - CAST(sx AS DOUBLE) / n))
        |    - (CAST(sy_c AS DOUBLE) / n_c
        |      - theta * (CAST(sx_c AS DOUBLE) / n_c
        |        - CAST(sx AS DOUBLE) / n)), 4) AS cuped_diff,
        |  round(1 - (sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |      * (sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |      / ((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |        * (syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 4)
        |    AS var_ratio
        |FROM th""".stripMargin) { (s, d) =>
      val u = prePost(s, d)
      def armAgg(t: Int, tag: String) = {
        val cond = col("treat") === t
        Seq(count(when(cond, 1)).as(s"n_$tag"),
          sum(when(cond, col("x"))).as(s"sx_$tag"),
          sum(when(cond, col("y"))).as(s"sy_$tag"))
      }
      val aggs = armAgg(1, "t") ++ armAgg(0, "c") ++ Seq(
        bridge(sum(col("x") * col("x"))).as("sxx"),
        bridge(sum(col("x") * col("y"))).as("sxy"),
        bridge(sum(col("y") * col("y"))).as("syy"),
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
      val m = u.agg(aggs.head, aggs.tail: _*)
      def d2(c: String) = col(c).cast("double")
      val theta = ((col("sxy") - d2("sx") * d2("sy") / col("n"))
        / (col("sxx") - d2("sx") * d2("sx") / col("n")))
      val th = m.withColumn("theta", theta)
      val cuped = (d2("sy_t") / col("n_t")
        - col("theta") * (d2("sx_t") / col("n_t") - d2("sx") / col("n"))) -
        (d2("sy_c") / col("n_c")
          - col("theta") * (d2("sx_c") / col("n_c") - d2("sx") / col("n")))
      th.select(col("n_t"), col("n_c"), round(col("theta"), 4).as("theta"),
        round(d2("sy_t") / col("n_t") - d2("sy_c") / col("n_c"), 4)
          .as("raw_diff"),
        round(cuped, 4).as("cuped_diff"),
        round(lit(1) - (col("sxy") - d2("sx") * d2("sy") / col("n"))
          * (col("sxy") - d2("sx") * d2("sy") / col("n"))
          / ((col("sxx") - d2("sx") * d2("sx") / col("n"))
            * (col("syy") - d2("sy") * d2("sy") / col("n"))), 4)
          .as("var_ratio"))
    },

    // ------------------------------------------------------------------
    // Coarsened exact matching (Iacus/King/Porro): treated and control
    // users match when their pre-period spend falls in the same
    // fixed-width stratum; the ATT is the n_t-weighted mean of
    // within-stratum outcome differences over strata holding BOTH arms.
    // Entirely aggregative — bin → two-arm conditional aggregate →
    // per-bin diff — so it scales where 1-NN propensity matching (a
    // global sort-merge) would not; the weighted mean follows the
    // round-6 + exact-decimal-sum law. Output: one row per matched
    // stratum with the overall ATT attached.
    QueryDef.sql(
      "q_cem_att",
      s"""WITH $prePostSql,
        |binned AS (
        |  -- floor(x/100), NOT x//100: DuckDB's // on DECIMAL is plain
        |  -- double division (only integer // floors), and its
        |  -- double->BIGINT cast ROUNDS, which would bin by round()
        |  SELECT CAST(floor(x / 100) AS BIGINT) AS bin, treat, x, y
        |  FROM byuser),
        |cells AS (
        |  SELECT bin,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c,
        |    SUM(y) FILTER (treat = 1) AS sy_t,
        |    SUM(y) FILTER (treat = 0) AS sy_c
        |  FROM binned GROUP BY bin),
        |matched AS (SELECT * FROM cells WHERE n_t > 0 AND n_c > 0),
        |terms AS (
        |  SELECT bin, n_t, n_c,
        |    round(CAST(sy_t AS DOUBLE) / n_t
        |      - CAST(sy_c AS DOUBLE) / n_c, 6) AS diff,
        |    CAST(round(n_t * round(CAST(sy_t AS DOUBLE) / n_t
        |        - CAST(sy_c AS DOUBLE) / n_c, 6), 6) AS DECIMAL(28,6))
        |      AS wdiff
        |  FROM matched),
        |att AS (
        |  SELECT CAST(SUM(n_t) AS BIGINT) AS m_t,
        |    CAST(SUM(n_c) AS BIGINT) AS m_c,
        |    CAST(COUNT(*) AS BIGINT) AS n_bins,
        |    round(CAST(SUM(wdiff) AS DOUBLE) / SUM(n_t), 4) AS att
        |  FROM terms)
        |SELECT t.bin, t.n_t, t.n_c, round(t.diff, 4) AS bin_diff,
        |  a.m_t, a.m_c, a.n_bins, a.att
        |FROM terms t CROSS JOIN att a ORDER BY t.bin""".stripMargin) {
      (s, d) =>
      val binned = prePost(s, d)
        .select(floor(col("x") / lit(100)).cast("bigint").as("bin"),
          col("treat"), col("y"))
      val cells = binned.groupBy("bin").agg(
        count(when(col("treat") === 1, 1)).as("n_t"),
        count(when(col("treat") === 0, 1)).as("n_c"),
        sum(when(col("treat") === 1, col("y"))).as("sy_t"),
        sum(when(col("treat") === 0, col("y"))).as("sy_c"))
      val matched = cells.filter(col("n_t") > 0 && col("n_c") > 0)
      val diff = round(col("sy_t").cast("double") / col("n_t")
        - col("sy_c").cast("double") / col("n_c"), 6)
      val terms = graft.CacheRegistry.ensurePersisted(
        matched.select(col("bin"), col("n_t"), col("n_c"),
          diff.as("diff"),
          round(col("n_t") * diff, 6).cast("decimal(28,6)").as("wdiff")))
      val att = terms.agg(sum("n_t").cast("bigint").as("m_t"),
        sum("n_c").cast("bigint").as("m_c"),
        count(lit(1)).as("n_bins"),
        round(sum("wdiff").cast("double") / sum("n_t"), 4).as("att"))
      terms.crossJoin(broadcast(att))
        .select(col("bin"), col("n_t"), col("n_c"),
          round(col("diff"), 4).as("bin_diff"),
          col("m_t"), col("m_c"), col("n_bins"), col("att"))
        .orderBy("bin")
    },

    // ------------------------------------------------------------------
    // Inverse-propensity-weighted ATE (Horvitz-Thompson re-weighting,
    // Hájek-normalized) with a STRATIFIED propensity model: the
    // propensity e(x) is estimated per pre-period-spend stratum (the
    // q_cem_att bins) as n_t/(n_t+n_c), each treated outcome is
    // re-weighted by 1/e and each control by 1/(1-e), and only strata
    // with BOTH arms enter (the overlap/positivity trim). With a
    // stratified e the Hájek weight denominators collapse EXACTLY:
    // Σ_treated 1/e = Σ_control 1/(1-e) = Σ_bins (n_t+n_c) = m, so the
    // only inexact terms are the per-bin weighted outcome sums — each
    // is one rational expression rounded to 6 and summed as exact
    // DECIMAL(28,6) (the q_cem_att law). The Kish effective sample
    // sizes ess = m²/Σw² quantify the variance cost of the weighting —
    // the "how much data did the re-weighting burn" readout every
    // observational analysis ships with. Entirely aggregative (bin →
    // two-arm conditional aggregate → per-bin closed forms → one-row
    // rollup broadcast back onto the bin rows): no per-unit weights
    // ever materialize, so the shape is one shuffle at any corpus
    // scale. Output: one row per overlap stratum with the overall
    // estimate attached (the q_cem_att presentation).
    QueryDef.sql(
      "q_ipw_ate",
      s"""WITH $prePostSql,
        |binned AS (
        |  SELECT CAST(floor(x / 100) AS BIGINT) AS bin, treat, y
        |  FROM byuser),
        |cells AS (
        |  SELECT bin,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c,
        |    SUM(y) FILTER (treat = 1) AS sy_t,
        |    SUM(y) FILTER (treat = 0) AS sy_c
        |  FROM binned GROUP BY bin),
        |overlap AS (SELECT * FROM cells WHERE n_t > 0 AND n_c > 0),
        |terms AS (
        |  SELECT bin, n_t, n_c,
        |    CAST(round(CAST(sy_t AS DOUBLE) * (n_t + n_c) / n_t, 6)
        |      AS DECIMAL(28,6)) AS wy_t,
        |    CAST(round(CAST(sy_c AS DOUBLE) * (n_t + n_c) / n_c, 6)
        |      AS DECIMAL(28,6)) AS wy_c,
        |    CAST(round(CAST((n_t + n_c) AS DOUBLE) * (n_t + n_c) / n_t, 6)
        |      AS DECIMAL(28,6)) AS w2_t,
        |    CAST(round(CAST((n_t + n_c) AS DOUBLE) * (n_t + n_c) / n_c, 6)
        |      AS DECIMAL(28,6)) AS w2_c
        |  FROM overlap),
        |ate AS (
        |  SELECT CAST(SUM(n_t + n_c) AS BIGINT) AS m,
        |    round((CAST(SUM(wy_t) AS DOUBLE) - CAST(SUM(wy_c) AS DOUBLE))
        |      / SUM(n_t + n_c), 4) AS ate_ipw,
        |    round(CAST(SUM(n_t + n_c) AS DOUBLE) * SUM(n_t + n_c)
        |      / CAST(SUM(w2_t) AS DOUBLE), 4) AS ess_t,
        |    round(CAST(SUM(n_t + n_c) AS DOUBLE) * SUM(n_t + n_c)
        |      / CAST(SUM(w2_c) AS DOUBLE), 4) AS ess_c
        |  FROM terms)
        |SELECT t.bin, t.n_t, t.n_c,
        |  round(CAST(t.n_t AS DOUBLE) / (t.n_t + t.n_c), 4) AS propensity,
        |  a.m, a.ate_ipw, a.ess_t, a.ess_c
        |FROM terms t CROSS JOIN ate a ORDER BY t.bin""".stripMargin) {
      (s, d) =>
      val binned = prePost(s, d)
        .select(floor(col("x") / lit(100)).cast("bigint").as("bin"),
          col("treat"), col("y"))
      val cells = binned.groupBy("bin").agg(
        count(when(col("treat") === 1, 1)).as("n_t"),
        count(when(col("treat") === 0, 1)).as("n_c"),
        sum(when(col("treat") === 1, col("y"))).as("sy_t"),
        sum(when(col("treat") === 0, col("y"))).as("sy_c"))
      val overlap = cells.filter(col("n_t") > 0 && col("n_c") > 0)
      val nb = col("n_t") + col("n_c")
      def term(num: org.apache.spark.sql.Column,
          den: org.apache.spark.sql.Column) =
        round(num.cast("double") * nb / den, 6).cast("decimal(28,6)")
      val terms = graft.CacheRegistry.ensurePersisted(
        overlap.select(col("bin"), col("n_t"), col("n_c"),
          term(col("sy_t"), col("n_t")).as("wy_t"),
          term(col("sy_c"), col("n_c")).as("wy_c"),
          term(nb, col("n_t")).as("w2_t"),
          term(nb, col("n_c")).as("w2_c")))
      val m = sum(col("n_t") + col("n_c"))
      val ate = terms.agg(m.cast("bigint").as("m"),
        round((sum("wy_t").cast("double") - sum("wy_c").cast("double")) / m,
          4).as("ate_ipw"),
        round(m.cast("double") * m / sum("w2_t").cast("double"), 4)
          .as("ess_t"),
        round(m.cast("double") * m / sum("w2_c").cast("double"), 4)
          .as("ess_c"))
      terms.crossJoin(broadcast(ate))
        .select(col("bin"), col("n_t"), col("n_c"),
          round(col("n_t").cast("double") / (col("n_t") + col("n_c")), 4)
            .as("propensity"),
          col("m"), col("ate_ipw"), col("ess_t"), col("ess_c"))
        .orderBy("bin")
    },

    // ------------------------------------------------------------------
    // Covariate-balance audit for the stratified-IPW estimate (r15; the
    // q_ipw_ate companion every causal pipeline runs BEFORE trusting the
    // estimate): standardized mean difference (SMD) of each pre-period
    // covariate between arms, raw and under the same x-strata ATE
    // weights — |SMD| ≤ 0.25 is the conventional "balanced" read. The
    // pooled-SD denominator is fixed at the RAW arm SDs (standard
    // practice: weighting moves means, the yardstick stays baseline).
    // DETERMINISM: raw moments are exact decimal/integer sums (x·x
    // bridged to BIGINT like q_cuped); weighted sums are per-stratum
    // halfUp6 DECIMAL(28,6) terms (the q_ipw_ate law); every double
    // derives from those exact inputs through an identical expression
    // tree, so both engines agree bit-for-bit. Zero-variance covariates
    // yield NULL SMDs (guarded on both engines) rather than ±inf.
    // SCALE: one conditional aggregate for raw moments + one bin-keyed
    // map-side-combined aggregate for the weighted terms; everything
    // downstream is 1-row frames.
    QueryDef.sql(
      "q_smd_balance",
      s"""WITH $prePostSql,
        |binned AS (
        |  SELECT CAST(floor(x / 100) AS BIGINT) AS bin, treat, x,
        |    CAST(x > 0 AS INTEGER) AS act
        |  FROM byuser),
        |raw AS (
        |  SELECT
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c,
        |    SUM(x) FILTER (treat = 1) AS sx_t,
        |    SUM(x) FILTER (treat = 0) AS sx_c,
        |    ${bridgeSql("SUM(x * x) FILTER (treat = 1)")} AS sxx_t,
        |    ${bridgeSql("SUM(x * x) FILTER (treat = 0)")} AS sxx_c,
        |    CAST(SUM(act) FILTER (treat = 1) AS BIGINT) AS sa_t,
        |    CAST(SUM(act) FILTER (treat = 0) AS BIGINT) AS sa_c
        |  FROM binned),
        |cells AS (
        |  SELECT bin,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS bn_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS bn_c,
        |    SUM(x) FILTER (treat = 1) AS bsx_t,
        |    SUM(x) FILTER (treat = 0) AS bsx_c,
        |    CAST(SUM(act) FILTER (treat = 1) AS BIGINT) AS bsa_t,
        |    CAST(SUM(act) FILTER (treat = 0) AS BIGINT) AS bsa_c
        |  FROM binned GROUP BY bin),
        |w AS (
        |  SELECT CAST(SUM(bn_t + bn_c) AS BIGINT) AS m,
        |    SUM(CAST(round(CAST(bsx_t AS DOUBLE) * (bn_t + bn_c) / bn_t, 6)
        |      AS DECIMAL(28,6))) AS wsx_t,
        |    SUM(CAST(round(CAST(bsx_c AS DOUBLE) * (bn_t + bn_c) / bn_c, 6)
        |      AS DECIMAL(28,6))) AS wsx_c,
        |    SUM(CAST(round(CAST(bsa_t AS DOUBLE) * (bn_t + bn_c) / bn_t, 6)
        |      AS DECIMAL(28,6))) AS wsa_t,
        |    SUM(CAST(round(CAST(bsa_c AS DOUBLE) * (bn_t + bn_c) / bn_c, 6)
        |      AS DECIMAL(28,6))) AS wsa_c
        |  FROM cells WHERE bn_t > 0 AND bn_c > 0),
        |d AS (
        |  SELECT r.n_t, r.n_c, w.m,
        |    CAST(r.sx_t AS DOUBLE) / r.n_t AS mean_t,
        |    CAST(r.sx_c AS DOUBLE) / r.n_c AS mean_c,
        |    (r.sxx_t - CAST(r.sx_t AS DOUBLE) * CAST(r.sx_t AS DOUBLE)
        |      / r.n_t) / (r.n_t - 1) AS var_t,
        |    (r.sxx_c - CAST(r.sx_c AS DOUBLE) * CAST(r.sx_c AS DOUBLE)
        |      / r.n_c) / (r.n_c - 1) AS var_c,
        |    CAST(r.sa_t AS DOUBLE) / r.n_t AS amean_t,
        |    CAST(r.sa_c AS DOUBLE) / r.n_c AS amean_c,
        |    (CAST(r.sa_t AS DOUBLE) - CAST(r.sa_t AS DOUBLE)
        |      * CAST(r.sa_t AS DOUBLE) / r.n_t) / (r.n_t - 1) AS avar_t,
        |    (CAST(r.sa_c AS DOUBLE) - CAST(r.sa_c AS DOUBLE)
        |      * CAST(r.sa_c AS DOUBLE) / r.n_c) / (r.n_c - 1) AS avar_c,
        |    CAST(w.wsx_t AS DOUBLE) / w.m AS wmean_t,
        |    CAST(w.wsx_c AS DOUBLE) / w.m AS wmean_c,
        |    CAST(w.wsa_t AS DOUBLE) / w.m AS wamean_t,
        |    CAST(w.wsa_c AS DOUBLE) / w.m AS wamean_c
        |  FROM raw r CROSS JOIN w)
        |SELECT * FROM (
        |  SELECT 'pre_spend' AS covariate, n_t, n_c, m,
        |    round(mean_t, 4) AS mean_raw_t, round(mean_c, 4) AS mean_raw_c,
        |    CASE WHEN (var_t + var_c) / 2 > 0
        |      THEN round(sqrt((var_t + var_c) / 2), 4) END AS sd_pool,
        |    CASE WHEN (var_t + var_c) / 2 > 0 THEN round((mean_t - mean_c)
        |      / sqrt((var_t + var_c) / 2), 4) END AS smd_raw,
        |    CASE WHEN (var_t + var_c) / 2 > 0 THEN round((wmean_t - wmean_c)
        |      / sqrt((var_t + var_c) / 2), 4) END AS smd_ipw
        |  FROM d
        |  UNION ALL
        |  SELECT 'pre_active', n_t, n_c, m,
        |    round(amean_t, 4), round(amean_c, 4),
        |    CASE WHEN (avar_t + avar_c) / 2 > 0
        |      THEN round(sqrt((avar_t + avar_c) / 2), 4) END,
        |    CASE WHEN (avar_t + avar_c) / 2 > 0 THEN round((amean_t - amean_c)
        |      / sqrt((avar_t + avar_c) / 2), 4) END,
        |    CASE WHEN (avar_t + avar_c) / 2 > 0 THEN round((wamean_t - wamean_c)
        |      / sqrt((avar_t + avar_c) / 2), 4) END
        |  FROM d)
        |ORDER BY covariate""".stripMargin) { (s, d) =>
      val binned = prePost(s, d)
        .select(floor(col("x") / lit(100)).cast("bigint").as("bin"),
          col("treat"), col("x"), (col("x") > 0).cast("int").as("act"))
      def bridge(c: org.apache.spark.sql.Column) =
        round(c, 0).cast("long").cast("double")
      val raw = binned.agg(
        count(when(col("treat") === 1, 1)).as("n_t"),
        count(when(col("treat") === 0, 1)).as("n_c"),
        sum(when(col("treat") === 1, col("x"))).as("sx_t"),
        sum(when(col("treat") === 0, col("x"))).as("sx_c"),
        bridge(sum(when(col("treat") === 1, col("x") * col("x"))))
          .as("sxx_t"),
        bridge(sum(when(col("treat") === 0, col("x") * col("x"))))
          .as("sxx_c"),
        sum(when(col("treat") === 1, col("act"))).cast("bigint").as("sa_t"),
        sum(when(col("treat") === 0, col("act"))).cast("bigint").as("sa_c"))
      val cells = binned.groupBy("bin").agg(
        count(when(col("treat") === 1, 1)).as("bn_t"),
        count(when(col("treat") === 0, 1)).as("bn_c"),
        sum(when(col("treat") === 1, col("x"))).as("bsx_t"),
        sum(when(col("treat") === 0, col("x"))).as("bsx_c"),
        sum(when(col("treat") === 1, col("act"))).cast("bigint").as("bsa_t"),
        sum(when(col("treat") === 0, col("act"))).cast("bigint").as("bsa_c"))
      val bn = col("bn_t") + col("bn_c")
      def wterm(s0: String, den: String) =
        sum(round(col(s0).cast("double") * bn / col(den), 6)
          .cast("decimal(28,6)"))
      val w = cells.filter(col("bn_t") > 0 && col("bn_c") > 0).agg(
        sum(bn).cast("bigint").as("m"),
        wterm("bsx_t", "bn_t").as("wsx_t"),
        wterm("bsx_c", "bn_c").as("wsx_c"),
        wterm("bsa_t", "bn_t").as("wsa_t"),
        wterm("bsa_c", "bn_c").as("wsa_c"))
      val d2 = raw.crossJoin(broadcast(w)).select(
        col("n_t"), col("n_c"), col("m"),
        (col("sx_t").cast("double") / col("n_t")).as("mean_t"),
        (col("sx_c").cast("double") / col("n_c")).as("mean_c"),
        ((col("sxx_t") - col("sx_t").cast("double") *
          col("sx_t").cast("double") / col("n_t")) / (col("n_t") - 1))
          .as("var_t"),
        ((col("sxx_c") - col("sx_c").cast("double") *
          col("sx_c").cast("double") / col("n_c")) / (col("n_c") - 1))
          .as("var_c"),
        (col("sa_t").cast("double") / col("n_t")).as("amean_t"),
        (col("sa_c").cast("double") / col("n_c")).as("amean_c"),
        ((col("sa_t").cast("double") - col("sa_t").cast("double") *
          col("sa_t").cast("double") / col("n_t")) / (col("n_t") - 1))
          .as("avar_t"),
        ((col("sa_c").cast("double") - col("sa_c").cast("double") *
          col("sa_c").cast("double") / col("n_c")) / (col("n_c") - 1))
          .as("avar_c"),
        (col("wsx_t").cast("double") / col("m")).as("wmean_t"),
        (col("wsx_c").cast("double") / col("m")).as("wmean_c"),
        (col("wsa_t").cast("double") / col("m")).as("wamean_t"),
        (col("wsa_c").cast("double") / col("m")).as("wamean_c"))
      def smdRow(label: String, mt: String, mc: String, vt: String,
          vc: String, wmt: String, wmc: String) = {
        val sd2 = (col(vt) + col(vc)) / 2
        d2.select(lit(label).as("covariate"), col("n_t"), col("n_c"),
          col("m"),
          round(col(mt), 4).as("mean_raw_t"),
          round(col(mc), 4).as("mean_raw_c"),
          when(sd2 > 0, round(sqrt(sd2), 4)).as("sd_pool"),
          when(sd2 > 0, round((col(mt) - col(mc)) / sqrt(sd2), 4))
            .as("smd_raw"),
          when(sd2 > 0, round((col(wmt) - col(wmc)) / sqrt(sd2), 4))
            .as("smd_ipw"))
      }
      smdRow("pre_spend", "mean_t", "mean_c", "var_t", "var_c",
          "wmean_t", "wmean_c")
        .unionAll(smdRow("pre_active", "amean_t", "amean_c", "avar_t",
          "avar_c", "wamean_t", "wamean_c"))
        .orderBy("covariate")
    },

    // ------------------------------------------------------------------
    // Power analysis for the treated-vs-control purchase comparison:
    // the minimum detectable effect at α=0.05 / power=0.8 given the
    // observed arm variances, and the per-arm n required to detect a 5%
    // lift — the "is this experiment even worth running?" readout. One
    // conditional two-arm aggregate (the Welch shape); z constants are
    // shared literals; everything downstream is a fixed tree.
    QueryDef.sql(
      "q_power_mde", {
        def m(t: String) = s"CAST(s1_$t AS DOUBLE) / n_$t"
        def va(t: String) = s"(CAST(s2_$t AS DOUBLE) - CAST(s1_$t AS DOUBLE)" +
          s" * CAST(s1_$t AS DOUBLE) / n_$t) / (n_$t - 1)"
        s"""WITH g AS (
          |  SELECT
          |    CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_t,
          |    SUM(CAST(value AS DECIMAL(18,2)))
          |      FILTER (user_id % 2 = 0) AS s1_t,
          |    SUM(CAST(value AS DECIMAL(18,2))
          |        * CAST(value AS DECIMAL(18,2)))
          |      FILTER (user_id % 2 = 0) AS s2_t,
          |    CAST(COUNT(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_c,
          |    SUM(CAST(value AS DECIMAL(18,2)))
          |      FILTER (user_id % 2 = 1) AS s1_c,
          |    SUM(CAST(value AS DECIMAL(18,2))
          |        * CAST(value AS DECIMAL(18,2)))
          |      FILTER (user_id % 2 = 1) AS s2_c
          |  FROM events WHERE event_type = 'purchase'),
          |k AS (
          |  SELECT g.*,
          |    CAST(s1_t + s1_c AS DOUBLE) / (n_t + n_c) AS gm,
          |    (1.959964 + 0.841621)
          |      * sqrt((${va("t")}) / n_t + (${va("c")}) / n_c) AS mde
          |  FROM g)
          |SELECT n_t, n_c,
          |  round(${m("t")}, 4) AS mean_t, round(${m("c")}, 4) AS mean_c,
          |  round(mde, 4) AS mde_abs,
          |  round(mde / gm, 4) AS mde_rel,
          |  CAST(ceil((1.959964 + 0.841621) * (1.959964 + 0.841621)
          |    * ((${va("t")}) + (${va("c")}))
          |    / ((0.05 * gm) * (0.05 * gm))) AS BIGINT) AS n_req_per_arm
          |FROM k""".stripMargin
      }) { (s, d) =>
      val vdec = col("value").cast("decimal(18,2)")
      def arm(r: Int, tag: String) = {
        val cond = col("user_id") % 2 === r
        Seq(count(when(cond, 1)).as(s"n_$tag"),
          sum(when(cond, vdec)).as(s"s1_$tag"),
          sum(when(cond, vdec * vdec)).as(s"s2_$tag"))
      }
      val aggs = arm(0, "t") ++ arm(1, "c")
      val g = Tables.events(s, d).filter(col("event_type") === "purchase")
        .agg(aggs.head, aggs.tail: _*)
      def m(t: String) = col(s"s1_$t").cast("double") / col(s"n_$t")
      def va(t: String) =
        (col(s"s2_$t").cast("double") - col(s"s1_$t").cast("double")
          * col(s"s1_$t").cast("double") / col(s"n_$t")) /
          (col(s"n_$t") - 1)
      val zsum = lit(1.959964) + lit(0.841621)
      val k = g
        .withColumn("gm", (col("s1_t") + col("s1_c")).cast("double")
          / (col("n_t") + col("n_c")))
        .withColumn("mde",
          zsum * sqrt(va("t") / col("n_t") + va("c") / col("n_c")))
      k.select(col("n_t"), col("n_c"),
        round(m("t"), 4).as("mean_t"), round(m("c"), 4).as("mean_c"),
        round(col("mde"), 4).as("mde_abs"),
        round(col("mde") / col("gm"), 4).as("mde_rel"),
        ceil(zsum * zsum * (va("t") + va("c"))
          / ((lit(0.05) * col("gm")) * (lit(0.05) * col("gm"))))
          .cast("bigint").as("n_req_per_arm"))
    },

    // ------------------------------------------------------------------
    // Always-valid sequential monitoring (mixture SPRT): the per-day
    // likelihood-ratio trajectory of the treated-vs-control purchase
    // comparison, with the anytime-valid p-value p_t = min(1,
    // min_{s≤t} 1/Λ_s) — the statistic that lets an experimenter PEEK
    // EVERY DAY without inflating false positives, which the fixed-
    // horizon q_ab_welch_ttest cannot offer. Mixture: normal prior on
    // the effect with τ² = 1; log Λ_t = ½·ln(V_t/(V_t+τ²)) +
    // θ̂_t²·τ²/(2·V_t·(V_t+τ²)) where V_t = s²·(1/n_t + 1/n_c) on the
    // day-t cumulative counts (pooled s² fixed from the full data —
    // the standard plug-in simplification; NOTE this is a data-
    // dependent variance plug-in, so strict anytime-validity is only
    // approximate — the day-t statistic borrows the full-horizon s².
    // Only τ² is a pure mixture parameter; a production monitor would
    // use a pre-period or cumulative-through-day-t s². Kept as the
    // plug-in form because engine parity and determinism are what the
    // gate certifies — r14 ADVICE). Determinism: daily arm moments are
    // exact decimals; cumulative sums ride ONE date-domain-bounded
    // window; diff/V/s² are rounded to 6dp BEFORE the ln/exp calls and
    // log Λ to 6dp before the running min (the text_drift_psi libm
    // discipline). SCALE: one map-side-combined daily aggregate over
    // the event log; everything after runs on the calendar-day frame.
    QueryDef.sql(
      "q_msprt",
      """WITH obs AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(user_id % 2 = 0 AS INTEGER) AS treat,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |daily AS (
        |  SELECT day,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS nt,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS nc,
        |    SUM(v) FILTER (treat = 1) AS st, SUM(v) FILTER (treat = 0) AS sc,
        |    CAST(CAST(round(SUM(v * v) FILTER (treat = 1), 0) AS BIGINT)
        |      AS DOUBLE) AS qt,
        |    CAST(CAST(round(SUM(v * v) FILTER (treat = 0), 0) AS BIGINT)
        |      AS DOUBLE) AS qc
        |  FROM obs GROUP BY day),
        |pool AS (
        |  SELECT round((SUM(qt) + SUM(qc)
        |      - (CAST(SUM(st) AS DOUBLE) * CAST(SUM(st) AS DOUBLE) / SUM(nt)
        |        + CAST(SUM(sc) AS DOUBLE) * CAST(SUM(sc) AS DOUBLE)
        |          / SUM(nc)))
        |    / (SUM(nt) + SUM(nc) - 2), 6) AS s2
        |  FROM daily),
        |cum AS (
        |  SELECT day,
        |    CAST(SUM(nt) OVER w AS BIGINT) AS nt,
        |    CAST(SUM(nc) OVER w AS BIGINT) AS nc,
        |    SUM(st) OVER w AS st, SUM(sc) OVER w AS sc
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |lam AS (
        |  SELECT c.day, c.nt, c.nc,
        |    round(CAST(c.st AS DOUBLE) / c.nt
        |      - CAST(c.sc AS DOUBLE) / c.nc, 6) AS diff,
        |    round(p.s2 * (1.0 / c.nt + 1.0 / c.nc), 6) AS vn
        |  FROM cum c, pool p WHERE c.nt > 0 AND c.nc > 0),
        |ll AS (
        |  SELECT day, nt, nc, diff,
        |    round(0.5 * ln(vn / (vn + 1.0))
        |      + diff * diff / (2 * vn * (vn + 1.0)), 6) AS log_lambda
        |  FROM lam),
        |pv AS (
        |  SELECT day, nt, nc, diff, log_lambda,
        |    round(least(1.0, MIN(round(exp(-log_lambda), 6))
        |      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)), 4)
        |      AS p_always
        |  FROM ll)
        |SELECT day, nt AS n_t, nc AS n_c, round(diff, 4) AS mean_diff,
        |  log_lambda, p_always,
        |  CAST(p_always <= 0.05 AS INTEGER) AS reject
        |FROM pv ORDER BY day""".stripMargin) { (s, d) =>
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
      val vdec = col("value").cast("decimal(18,2)")
      val daily = graft.CacheRegistry.ensurePersisted(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(to_date(col("ts")).as("day"),
            (col("user_id") % 2 === 0).cast("int").as("treat"), vdec.as("v"))
          .groupBy("day")
          .agg(count(when(col("treat") === 1, 1)).as("nt"),
            count(when(col("treat") === 0, 1)).as("nc"),
            sum(when(col("treat") === 1, col("v"))).as("st"),
            sum(when(col("treat") === 0, col("v"))).as("sc"),
            bridge(sum(when(col("treat") === 1, col("v") * col("v"))))
              .as("qt"),
            bridge(sum(when(col("treat") === 0, col("v") * col("v"))))
              .as("qc")))
      val pool = daily.agg(round((sum("qt") + sum("qc")
          - (sum("st").cast("double") * sum("st").cast("double") / sum("nt")
            + sum("sc").cast("double") * sum("sc").cast("double")
              / sum("nc")))
        / (sum("nt") + sum("nc") - 2), 6).as("s2"))
      val cum = daily.select(col("day"),
        sum("nt").over(w).as("nt"), sum("nc").over(w).as("nc"),
        sum("st").over(w).as("st"), sum("sc").over(w).as("sc"))
      val lam = cum.crossJoin(broadcast(pool))
        .filter(col("nt") > 0 && col("nc") > 0)
        .select(col("day"), col("nt"), col("nc"),
          round(col("st").cast("double") / col("nt")
            - col("sc").cast("double") / col("nc"), 6).as("diff"),
          round(col("s2") * (lit(1.0) / col("nt") + lit(1.0) / col("nc")),
            6).as("vn"))
      val ll = lam.select(col("day"), col("nt"), col("nc"), col("diff"),
        round(lit(0.5) * log(col("vn") / (col("vn") + 1.0))
          + col("diff") * col("diff")
            / (lit(2.0) * col("vn") * (col("vn") + 1.0)), 6)
          .as("log_lambda"))
      ll.withColumn("p_always",
          round(least(lit(1.0),
            min(round(exp(-col("log_lambda")), 6)).over(w)), 4))
        .select(col("day"), col("nt").as("n_t"), col("nc").as("n_c"),
          round(col("diff"), 4).as("mean_diff"), col("log_lambda"),
          col("p_always"),
          (col("p_always") <= 0.05).cast("int").as("reject"))
        .orderBy("day")
    },

    // ------------------------------------------------------------------
    // Group-sequential monitoring with O'Brien–Fleming boundaries: the
    // committee-style complement to q_msprt's always-valid mixture —
    // the experiment's days are partitioned into K=5 equal interim
    // looks, the cumulative-through-look Welch z is compared against
    // the classic OBF z-boundary b_k = 2.040·√(K/k) (the textbook
    // K=5, two-sided α=0.05 constants: 4.562, 3.226, 2.634, 2.281,
    // 2.040), and a look crosses when |z| ≥ b_k. Unlike q_msprt's
    // plug-in, the variance here is HONESTLY cumulative-through-look
    // (no future data enters the day-k statistic — the r14 ADVICE
    // critique applied). Determinism: look assignment is pure integer
    // arithmetic ((rank·5 + D − 1) div D over the dense day rank);
    // n/Σv/Σv² are exact decimals; z and b_k are rounded to 4dp before
    // the crossing compare. SCALE: one map-side-combined daily
    // aggregate, then everything rides the ≤|days| calendar frame
    // (domain-bounded window) collapsed to 5 rows.
    QueryDef.sql(
      "q_gst_obrien_fleming",
      """WITH obs AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(user_id % 2 = 0 AS INTEGER) AS treat,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |daily AS (
        |  SELECT day,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS nt,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS nc,
        |    SUM(v) FILTER (treat = 1) AS st, SUM(v) FILTER (treat = 0) AS sc,
        |    SUM(v * v) FILTER (treat = 1) AS qt,
        |    SUM(v * v) FILTER (treat = 0) AS qc
        |  FROM obs GROUP BY 1),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS dcnt
        |  FROM daily),
        |lk AS (
        |  SELECT CAST((rn * 5 + dcnt - 1) // dcnt AS INTEGER) AS look,
        |    nt, nc, st, sc, qt, qc
        |  FROM rk),
        |per AS (
        |  SELECT look, SUM(nt) AS nt, SUM(nc) AS nc, SUM(st) AS st,
        |    SUM(sc) AS sc, SUM(qt) AS qt, SUM(qc) AS qc
        |  FROM lk GROUP BY 1),
        |cum AS (
        |  SELECT look,
        |    CAST(SUM(nt) OVER w AS BIGINT) AS nt,
        |    CAST(SUM(nc) OVER w AS BIGINT) AS nc,
        |    SUM(st) OVER w AS st, SUM(sc) OVER w AS sc,
        |    SUM(qt) OVER w AS qt, SUM(qc) OVER w AS qc
        |  FROM per WINDOW w AS (ORDER BY look
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT look, nt, nc,
        |    CAST(st AS DOUBLE) / nt AS mt, CAST(sc AS DOUBLE) / nc AS mc,
        |    (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / nt) / (nt - 1) AS vt,
        |    (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |      / nc) / (nc - 1) AS vc
        |  FROM cum WHERE nt >= 2 AND nc >= 2)
        |SELECT look, nt AS n_t, nc AS n_c,
        |  round(mt, 4) AS mean_t, round(mc, 4) AS mean_c,
        |  round((mt - mc) / sqrt(vt / nt + vc / nc), 4) AS z,
        |  round(2.040 * sqrt(5.0 / look), 4) AS boundary,
        |  CAST(abs(round((mt - mc) / sqrt(vt / nt + vc / nc), 4))
        |    >= round(2.040 * sqrt(5.0 / look), 4) AS INTEGER) AS crossed
        |FROM m ORDER BY look""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val vdec = col("value").cast("decimal(18,2)")
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(to_date(col("ts")).as("day"),
          (col("user_id") % 2 === 0).cast("int").as("treat"), vdec.as("v"))
        .groupBy("day")
        .agg(count(when(col("treat") === 1, 1)).as("nt"),
          count(when(col("treat") === 0, 1)).as("nc"),
          sum(when(col("treat") === 1, col("v"))).as("st"),
          sum(when(col("treat") === 0, col("v"))).as("sc"),
          sum(when(col("treat") === 1, col("v") * col("v"))).as("qt"),
          sum(when(col("treat") === 0, col("v") * col("v"))).as("qc"))
      // calendar-domain-bounded global windows (the q_msprt frame class)
      val wDay = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val per = daily
        .withColumn("rn", row_number().over(Window.orderBy("day")))
        .withColumn("dcnt", count(lit(1)).over(wDay))
        .withColumn("look",
          expr("CAST((rn * 5 + dcnt - 1) DIV dcnt AS INT)"))
        .groupBy("look")
        .agg(sum("nt").as("nt"), sum("nc").as("nc"), sum("st").as("st"),
          sum("sc").as("sc"), sum("qt").as("qt"), sum("qc").as("qc"))
      val wCum = Window.orderBy("look")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = per.select(col("look"),
        sum("nt").over(wCum).as("nt"), sum("nc").over(wCum).as("nc"),
        sum("st").over(wCum).as("st"), sum("sc").over(wCum).as("sc"),
        sum("qt").over(wCum).as("qt"), sum("qc").over(wCum).as("qc"))
      def mean(s1: String, n: String) = col(s1).cast("double") / col(n)
      def variance(s2: String, s1: String, n: String) =
        (col(s2).cast("double")
          - col(s1).cast("double") * col(s1).cast("double") / col(n)) /
          (col(n) - 1)
      val m = cum.filter(col("nt") >= 2 && col("nc") >= 2)
        .select(col("look"), col("nt"), col("nc"),
          mean("st", "nt").as("mt"), mean("sc", "nc").as("mc"),
          variance("qt", "st", "nt").as("vt"),
          variance("qc", "sc", "nc").as("vc"))
      val z = round((col("mt") - col("mc"))
        / sqrt(col("vt") / col("nt") + col("vc") / col("nc")), 4)
      val boundary = round(lit(2.040) * sqrt(lit(5.0) / col("look")), 4)
      m.select(col("look"), col("nt").as("n_t"), col("nc").as("n_c"),
          round(col("mt"), 4).as("mean_t"), round(col("mc"), 4).as("mean_c"),
          z.as("z"), boundary.as("boundary"),
          (abs(z) >= boundary).cast("int").as("crossed"))
        .orderBy("look")
    },

    // ------------------------------------------------------------------
    // Quantile treatment effects: the per-decile gap between the treated
    // and control purchase-value distributions — the distribution-level
    // readout a mean-only estimator hides. SCALE SHAPE: per-arm order
    // statistics come from the range-repartition GlobalRank recipe
    // (never a single-partition sort); the target rank ⌈q(n+1)/10⌉ is
    // integer arithmetic; the decile grid is a 9-row broadcast equi-join
    // against the ranked frame. The oracle uses the same order-statistic
    // definition via window row numbers.
    QueryDef.sql(
      "q_qte",
      """WITH v AS (
        |  SELECT CAST(user_id % 2 = 0 AS INTEGER) AS treat,
        |    CAST(value AS DECIMAL(18,2)) AS v, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |ranked AS (
        |  SELECT treat, v,
        |    CAST(row_number() OVER (PARTITION BY treat
        |      ORDER BY v, event_id) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY treat) AS BIGINT) AS n
        |  FROM v),
        |grid AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS q),
        |pick AS (
        |  SELECT g.q, r.treat, r.v
        |  FROM grid g JOIN ranked r
        |    ON r.rk = least((g.q * (r.n + 1) + 9) // 10, r.n))
        |SELECT q,
        |  round(CAST(MAX(CASE WHEN treat = 1 THEN v END) AS DOUBLE), 4)
        |    AS v_treat,
        |  round(CAST(MAX(CASE WHEN treat = 0 THEN v END) AS DOUBLE), 4)
        |    AS v_ctrl,
        |  round(CAST(MAX(CASE WHEN treat = 1 THEN v END) AS DOUBLE)
        |    - CAST(MAX(CASE WHEN treat = 0 THEN v END) AS DOUBLE), 4)
        |    AS qte
        |FROM pick GROUP BY q ORDER BY q""".stripMargin) { (s, d) =>
      val v = graft.CacheRegistry.ensurePersisted(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select((col("user_id") % 2 === 0).cast("int").as("treat"),
            col("value").cast("decimal(18,2)").as("v"), col("event_id")))
      def armRanked(t: Int): DataFrame = {
        val arm = v.filter(col("treat") === t).select("v", "event_id")
        val ranked = GlobalRank
          .withRank(arm, Seq(col("v"), col("event_id")), "rk0")
          .withColumn("rk", col("rk0") + 1).drop("rk0")
        val n = arm.agg(count(lit(1)).as("n"))
        // 9-row target-rank frame: decile grid × the arm count
        val targets = s.range(1, 10).toDF("q").crossJoin(broadcast(n))
          .select(col("q"),
            least(expr("(q * (n + 1) + 9) div 10"), col("n")).as("rk"))
        ranked.join(broadcast(targets), "rk")
          .select(col("q"), lit(t).as("treat"), col("v"))
      }
      armRanked(1).unionAll(armRanked(0))
        .groupBy("q")
        .agg(
          round(max(when(col("treat") === 1, col("v"))).cast("double"), 4)
            .as("v_treat"),
          round(max(when(col("treat") === 0, col("v"))).cast("double"), 4)
            .as("v_ctrl"),
          round((max(when(col("treat") === 1, col("v")))
            - max(when(col("treat") === 0, col("v")))).cast("double"), 4)
            .as("qte"))
        .orderBy("q")
    },

    // ------------------------------------------------------------------
    // Qini uplift curve: users ranked by the pre-period score (the
    // stand-in targeting model), cumulative incremental outcome
    // Y_t(k) − Y_c(k)·N_t(k)/N_c(k) per decile against the random-
    // targeting diagonal — the uplift-model evaluation metric. SCALE
    // SHAPE: ranks via range-repartition GlobalRank; everything after
    // the decile aggregate lives on the 10-row grid (decimal-exact
    // cumulative sums, fixed-tree doubles).
    QueryDef.sql(
      "q_qini",
      s"""WITH $prePostSql,
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM byuser),
        |ranked AS (
        |  SELECT treat, y,
        |    CAST(row_number() OVER (ORDER BY x DESC, user_id) AS BIGINT)
        |      - 1 AS rk
        |  FROM byuser),
        |dec AS (SELECT CAST((rk * 10) // n AS BIGINT) AS decile, treat, y
        |        FROM ranked, tot),
        |cells AS (
        |  SELECT decile,
        |    CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |    CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c,
        |    COALESCE(SUM(y) FILTER (treat = 1), CAST(0 AS DECIMAL(18,2)))
        |      AS sy_t,
        |    COALESCE(SUM(y) FILTER (treat = 0), CAST(0 AS DECIMAL(18,2)))
        |      AS sy_c
        |  FROM dec GROUP BY decile),
        |cum AS (
        |  SELECT decile,
        |    CAST(SUM(n_t) OVER w AS BIGINT) AS cn_t,
        |    CAST(SUM(n_c) OVER w AS BIGINT) AS cn_c,
        |    SUM(sy_t) OVER w AS cy_t, SUM(sy_c) OVER w AS cy_c
        |  FROM cells WINDOW w AS (ORDER BY decile
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |lastq AS (
        |  SELECT CAST(cy_t AS DOUBLE) - CAST(cy_c AS DOUBLE) * cn_t / cn_c
        |    AS q_total
        |  FROM cum WHERE decile = 9)
        |SELECT decile, cn_t, cn_c,
        |  round(CAST(cy_t AS DOUBLE) - CAST(cy_c AS DOUBLE) * cn_t / cn_c,
        |    4) AS qini_k,
        |  round((decile + 1) * q_total / 10, 4) AS qini_random,
        |  round((CAST(cy_t AS DOUBLE) - CAST(cy_c AS DOUBLE) * cn_t / cn_c)
        |    - (decile + 1) * q_total / 10, 4) AS qini_excess
        |FROM cum CROSS JOIN lastq ORDER BY decile""".stripMargin) {
      (s, d) =>
      val u = prePost(s, d)
      val tot = u.agg(count(lit(1)).as("n"))
      val ranked = GlobalRank.withRank(
        u.select("treat", "y", "x", "user_id"),
        Seq(col("x").desc, col("user_id")), "rk")
      val dec = ranked.crossJoin(broadcast(tot))
        .select(expr("(rk * 10) div n").cast("bigint").as("decile"),
          col("treat"), col("y"))
      val cells = dec.groupBy("decile").agg(
        count(when(col("treat") === 1, 1)).as("n_t"),
        count(when(col("treat") === 0, 1)).as("n_c"),
        coalesce(sum(when(col("treat") === 1, col("y"))),
          lit(0).cast("decimal(18,2)")).as("sy_t"),
        coalesce(sum(when(col("treat") === 0, col("y"))),
          lit(0).cast("decimal(18,2)")).as("sy_c"))
      val w = Window.orderBy("decile")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = graft.CacheRegistry.ensurePersisted(cells.select(
        col("decile"),
        sum("n_t").over(w).cast("bigint").as("cn_t"),
        sum("n_c").over(w).cast("bigint").as("cn_c"),
        sum("sy_t").over(w).as("cy_t"), sum("sy_c").over(w).as("cy_c")))
      val qk = col("cy_t").cast("double") -
        col("cy_c").cast("double") * col("cn_t") / col("cn_c")
      val lastq = cum.filter(col("decile") === 9)
        .select(qk.as("q_total"))
      cum.crossJoin(broadcast(lastq))
        .select(col("decile"), col("cn_t"), col("cn_c"),
          round(qk, 4).as("qini_k"),
          round((col("decile") + 1) * col("q_total") / 10, 4)
            .as("qini_random"),
          round(qk - (col("decile") + 1) * col("q_total") / 10, 4)
            .as("qini_excess"))
        .orderBy("decile")
    },

    // ------------------------------------------------------------------
    // Sample-ratio-mismatch check — the first experiment-health gate any
    // A/B platform runs: χ² of the observed user split against 50/50
    // ((n_t − n_c)²/(n_t + n_c) for two cells), p via the shared normal-
    // tail approximation at z = √χ², and the p < 0.001 alarm flag
    // compared in exact decimal space. One count over the shared
    // per-user frame; output cardinality = 1.
    QueryDef.sql(
      "q_srm_check",
      s"""WITH $prePostSql,
        |g AS (SELECT CAST(COUNT(*) FILTER (treat = 1) AS BIGINT) AS n_t,
        |             CAST(COUNT(*) FILTER (treat = 0) AS BIGINT) AS n_c
        |      FROM byuser),
        |k AS (SELECT n_t, n_c,
        |  CAST(n_t - n_c AS DOUBLE) * CAST(n_t - n_c AS DOUBLE)
        |    / (n_t + n_c) AS chi2 FROM g)
        |SELECT n_t, n_c, round(chi2, 4) AS chi2,
        |  CAST(CAST(least(1.0,
        |      2 * round(exp(-0.717 * sqrt(chi2) - 0.416 * chi2), 6))
        |    AS DECIMAL(8,6)) AS DOUBLE) AS p_value,
        |  CAST(CASE WHEN CAST(least(1.0,
        |      2 * round(exp(-0.717 * sqrt(chi2) - 0.416 * chi2), 6))
        |    AS DECIMAL(8,6)) < CAST(0.001 AS DECIMAL(8,6))
        |    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
        |FROM k""".stripMargin) { (s, d) =>
      val g = prePost(s, d).agg(
        count(when(col("treat") === 1, 1)).as("n_t"),
        count(when(col("treat") === 0, 1)).as("n_c"))
      val chi2 = (col("n_t") - col("n_c")).cast("double") *
        (col("n_t") - col("n_c")).cast("double") /
        (col("n_t") + col("n_c"))
      val k = g.withColumn("chi2", chi2)
      val pdec = least(lit(1.0),
        lit(2) * round(exp(lit(-0.717) * sqrt(col("chi2"))
          - lit(0.416) * col("chi2")), 6)).cast("decimal(8,6)")
      k.select(col("n_t"), col("n_c"), round(col("chi2"), 4).as("chi2"),
        pdec.cast("double").as("p_value"),
        when(pdec < lit(BigDecimal("0.001")), 1).otherwise(0).cast("int")
          .as("srm_flag"))
    }
  )
}
