package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/filter evaluation over the corpus: ROC-AUC, decile lift,
  * and calibration for the deterministic quality score predicting the
  * English cohort — the metrics a training-data team runs on every
  * quality/langid filter before trusting it at 100 TB.
  *
  * Scale design: the score is a narrow codegen'd projection; AUC runs on
  * the DISTINCT-SCORE frame (4dp scores ⇒ ≤ 10⁴ rows at any corpus
  * size) with doubled midranks (the q_mann_whitney machinery — AUC IS
  * the normalized Mann-Whitney U); the lift table ranks docs with the
  * range-repartition + offset recipe (no single-partition sort);
  * calibration is a plain 10-bin aggregate. Everything is exact
  * integers/decimals until one final division per output column.
  */
object ModelEval {

  /** (doc_id, y, score) scoring frame: y = English indicator, score =
    * the 4dp [[TextAnalysis.qualityScore]]. */
  private def scored(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"),
      TextAnalysis.qualityScore(col("text")).as("score"))

  /** Shared oracle CTE: the same scoring frame in DuckDB, rendered from
    * the single-source quality formula strings. */
  private val scoredSql =
    s"""f AS (SELECT doc_id, lang, text, string_split(text, ' ') AS rtoks
      |       FROM documents),
      |feat AS (SELECT doc_id, lang, ${TextAnalysis.qualityFeaturesSql}
      |         FROM f),
      |sc AS (SELECT doc_id,
      |         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
      |           AS y,
      |         ${TextAnalysis.qualityExprSql} AS score
      |       FROM feat)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // ROC-AUC of the quality score predicting lang='en' — AUC is the
    // normalized Mann-Whitney U, so the doubled-midrank machinery makes
    // it EXACT: ranks over the distinct-score frame, U₁ = R₁ − n₁(n₁+1)/2,
    // AUC = U₁/(n₁·n₂), all integral until the final division.
    QueryDef.sql(
      "q_roc_auc",
      s"""WITH $scoredSql,
        |cnt AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(y) AS BIGINT) AS cy
        |  FROM sc GROUP BY score),
        |mr AS (
        |  SELECT score, c, cy,
        |    2 * (SUM(c) OVER (ORDER BY score) - c) + c + 1 AS m2
        |  FROM cnt),
        |agg AS (
        |  SELECT CAST(SUM(cy) AS BIGINT) AS n1,
        |    CAST(SUM(c - cy) AS BIGINT) AS n2,
        |    CAST(SUM(cy * m2) AS BIGINT) AS r1x2
        |  FROM mr)
        |SELECT n1, n2,
        |  round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS auc
        |FROM agg""".stripMargin) { (s, d) =>
      val cnt = scored(s, d).groupBy("score")
        .agg(count(lit(1)).as("c"), sum("y").as("cy"))
      val w = Window.orderBy("score")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val mr = cnt.withColumn("m2",
        lit(2) * (sum("c").over(w) - col("c")) + col("c") + 1)
      mr.agg(sum("cy").cast("bigint").as("n1"),
          sum(col("c") - col("cy")).cast("bigint").as("n2"),
          sum(col("cy") * col("m2")).cast("bigint").as("r1x2"))
        .select(col("n1"), col("n2"),
          round(((col("r1x2") - col("n1") * (col("n1") + 1))
              .cast("double") / 2)
            / (col("n1").cast("double") * col("n2").cast("double")), 6)
            .as("auc"))
    },

    // ------------------------------------------------------------------
    // Decile lift (gains table): docs ranked by score desc, split into
    // 10 equal-rank buckets; each bucket's positive rate vs the overall
    // base rate. The standard "is the filter front-loading the good
    // docs?" report. Global rank via range-repartition + per-partition
    // row_number + broadcast offsets (the q_shard_pack recipe — the
    // (score, doc_id) key is unique so ranks are boundary-independent).
    QueryDef.sql(
      "q_decile_lift",
      s"""WITH $scoredSql,
        |ranked AS (
        |  SELECT y,
        |    row_number() OVER (ORDER BY score DESC, doc_id) - 1 AS rk
        |  FROM sc),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS tp FROM sc)
        |SELECT CAST((rk * 10) // n AS BIGINT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(y) AS BIGINT) AS n_pos,
        |  round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 4) AS pos_rate,
        |  round((CAST(SUM(y) AS DOUBLE) / COUNT(*))
        |    / (CAST(tp AS DOUBLE) / n), 4) AS lift
        |FROM ranked, tot GROUP BY 1, tp, n ORDER BY decile""".stripMargin) {
      (s, d) =>
      val ranked = GlobalRank.withRank(scored(s, d),
        Seq(desc("score"), col("doc_id")))
      val tot = ranked.agg(count(lit(1)).cast("bigint").as("n"),
        sum("y").cast("bigint").as("tp"))
      ranked
        .crossJoin(broadcast(tot))
        .groupBy(expr("(rk * 10) div n").cast("bigint").as("decile"),
          col("tp"), col("n"))
        .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          round(col("n_pos").cast("double") / col("n_docs"), 4)
            .as("pos_rate"),
          round((col("n_pos").cast("double") / col("n_docs"))
            / (col("tp").cast("double") / col("n")), 4).as("lift"))
        .orderBy("decile")
    },

    // ------------------------------------------------------------------
    // Calibration table: fixed 10-bin score histogram with mean score
    // and observed positive rate per bin — "does score 0.8 mean 80%?".
    // One map-side-combined aggregate over the scoring projection; the
    // 4dp score sums ride as exact decimals.
    QueryDef.sql(
      "q_calibration_bins",
      s"""WITH $scoredSql
        |SELECT CAST(least(9, CAST(floor(score * 10) AS BIGINT)) AS BIGINT)
        |    AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(y) AS BIGINT) AS n_pos,
        |  round(CAST(SUM(CAST(score AS DECIMAL(10,4))) AS DOUBLE)
        |    / COUNT(*), 4) AS mean_score,
        |  round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 4) AS pos_rate
        |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
      scored(s, d)
        .groupBy(least(lit(9L), floor(col("score") * 10).cast("bigint"))
          .cast("bigint").as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"),
          round(sum(col("score").cast("decimal(10,4)")).cast("double")
            / count(lit(1)), 4).as("mean_score"),
          round(sum("y").cast("double") / count(lit(1)), 4).as("pos_rate"))
        .orderBy("bin")
    },

    // ------------------------------------------------------------------
    // Expected calibration error — the one-number summary of the
    // calibration table: ECE = Σ_b (n_b/n)·|mean_score_b − pos_rate_b|,
    // plus the worst per-bin gap. Computed FROM the same 4dp-rounded
    // bin statistics as q_calibration_bins (single-source definition);
    // per-bin contributions round at 6dp then sum exactly.
    QueryDef.sql(
      "q_ece",
      s"""WITH $scoredSql,
        |bins AS (
        |  SELECT CAST(least(9, CAST(floor(score * 10) AS BIGINT))
        |      AS BIGINT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    round(CAST(SUM(CAST(score AS DECIMAL(10,4))) AS DOUBLE)
        |      / COUNT(*), 4) AS mean_score,
        |    round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 4) AS pos_rate
        |  FROM sc GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  round(CAST(SUM(CAST(round(
        |      n_docs * abs(mean_score - pos_rate), 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) / SUM(n_docs), 4) AS ece,
        |  round(MAX(abs(mean_score - pos_rate)), 4) AS max_gap
        |FROM bins""".stripMargin) { (s, d) =>
      val bins = scored(s, d)
        .groupBy(least(lit(9L), floor(col("score") * 10).cast("bigint"))
          .cast("bigint").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("score").cast("decimal(10,4)")).cast("double")
            / count(lit(1)), 4).as("mean_score"),
          round(sum("y").cast("double") / count(lit(1)), 4).as("pos_rate"))
      bins.agg(
        count(lit(1)).cast("bigint").as("n_bins"),
        sum("n_docs").cast("bigint").as("n_docs"),
        round(sum(round(col("n_docs") *
            abs(col("mean_score") - col("pos_rate")), 6)
          .cast("decimal(18,6)")).cast("double") / sum("n_docs"), 4)
          .as("ece"),
        round(max(abs(col("mean_score") - col("pos_rate"))), 4)
          .as("max_gap"))
    },

    // ------------------------------------------------------------------
    // Average precision (PR-AUC, step interpolation): AP = Σ_t ΔTP_t ·
    // P_t / n_pos over DESCENDING distinct score thresholds — the
    // ranking metric that, unlike ROC-AUC, stays honest under the heavy
    // class imbalance of corpus filtering (a few % "good" docs in a
    // crawl). Same distinct-score-frame shape as q_roc_auc: 4dp scores
    // ⇒ ≤ 10⁴ threshold rows at ANY corpus size, cumulative TP/rank via
    // one window, never a per-document sort. Determinism: per-threshold
    // precision is double-divided from exact integer cumulative counts
    // (ΔTP·TP may exceed BIGINT at trillion-doc scale, so the product is
    // taken in double), each term rounded 6dp, summed exactly as
    // decimals, one final division by n_pos rounded 6.
    QueryDef.sql(
      "q_pr_auc",
      s"""WITH $scoredSql,
        |cnt AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(y) AS BIGINT) AS cy
        |  FROM sc GROUP BY score),
        |cum AS (
        |  SELECT cy,
        |    CAST(SUM(cy) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
        |    CAST(SUM(c) OVER (ORDER BY score DESC) AS BIGINT) AS rk
        |  FROM cnt)
        |SELECT CAST(MAX(tp) AS BIGINT) AS n_pos,
        |  CAST(MAX(rk) - MAX(tp) AS BIGINT) AS n_neg,
        |  round(CAST(SUM(CAST(round(CAST(cy AS DOUBLE) * tp / rk, 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) / MAX(tp), 6) AS ap
        |FROM cum""".stripMargin) { (s, d) =>
      val cnt = scored(s, d).groupBy("score")
        .agg(count(lit(1)).as("c"), sum("y").as("cy"))
      val w = Window.orderBy(desc("score"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cnt.select(col("cy"),
        sum("cy").over(w).cast("bigint").as("tp"),
        sum("c").over(w).cast("bigint").as("rk"))
      cum.agg(
        max("tp").cast("bigint").as("n_pos"),
        (max("rk") - max("tp")).cast("bigint").as("n_neg"),
        round(sum(round(col("cy").cast("double") * col("tp") / col("rk"), 6)
            .cast("decimal(28,6)")).cast("double") / max("tp"), 6).as("ap"))
    },

    // ------------------------------------------------------------------
    // Spearman rank correlation between document length (n_chars) and
    // the quality score — "is the filter just a length detector?", the
    // standard confound check before shipping a quality classifier.
    // SCALE SHAPE: midranks come from the two DISTINCT-VALUE frames
    // (length domain + 4dp score domain, both value-bounded ⇒ broadcast
    // rank tables at any corpus size) joined back to the doc frame —
    // never a global per-document sort. DETERMINISM: doubled midranks
    // stay integral; normalized ranks u = m2/(2n) are identical double
    // divisions in both engines, rounded 6dp; cross-products rounded
    // 6dp then summed exactly as decimals; the closed-form Pearson over
    // those sums is one final double expression rounded 4. (At
    // trillion-row scale the 6dp pre-rounds would be coarsened — the
    // sums here stay ≤ 15 significant digits so the decimal→double
    // casts are exact.)
    QueryDef.sql(
      "q_spearman_corr",
      s"""WITH $scoredSql,
        |docs AS (
        |  SELECT d.doc_id, d.n_chars AS x, sc.score AS y
        |  FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
        |rx AS (
        |  SELECT x, 2 * (SUM(c) OVER (ORDER BY x) - c) + c + 1 AS m2x
        |  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM docs GROUP BY x)),
        |ry AS (
        |  SELECT y, 2 * (SUM(c) OVER (ORDER BY y) - c) + c + 1 AS m2y
        |  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM docs GROUP BY y)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
        |uv AS (
        |  SELECT round(CAST(m2x AS DOUBLE) / (2 * n), 6) AS u,
        |    round(CAST(m2y AS DOUBLE) / (2 * n), 6) AS v
        |  FROM docs JOIN rx USING (x) JOIN ry USING (y), n),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(round(u, 6) AS DECIMAL(18,6))) AS DOUBLE) AS su,
        |    CAST(SUM(CAST(round(v, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(round(u * v, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      AS suv,
        |    CAST(SUM(CAST(round(u * u, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      AS suu,
        |    CAST(SUM(CAST(round(v * v, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      AS svv
        |  FROM uv)
        |SELECT n,
        |  round((suv - su * sv / n)
        |    / sqrt((suu - su * su / n) * (svv - sv * sv / n)), 4) AS rho
        |FROM agg""".stripMargin) { (s, d) =>
      // one documents pass: length + score are both narrow projections;
      // persisted because FOUR consumers read it (both rank tables, n,
      // and the main uv join) — without the cache the scan plus the
      // tokenizing quality score would run four times
      val docs = graft.CacheRegistry.ensurePersisted(
        Tables.documents(s, d).select(col("doc_id"),
          col("n_chars").as("x"),
          TextAnalysis.qualityScore(col("text")).as("y")))
      val wx = Window.orderBy("x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val rx = docs.groupBy("x").agg(count(lit(1)).as("c"))
        .select(col("x"),
          (lit(2) * (sum("c").over(wx) - col("c")) + col("c") + 1)
            .as("m2x"))
      val wy = Window.orderBy("y")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val ry = docs.groupBy("y").agg(count(lit(1)).as("c"))
        .select(col("y"),
          (lit(2) * (sum("c").over(wy) - col("c")) + col("c") + 1)
            .as("m2y"))
      val n = docs.agg(count(lit(1)).cast("bigint").as("n"))
      val uv = docs.join(broadcast(rx), "x").join(broadcast(ry), "y")
        .crossJoin(broadcast(n))
        .select(
          round(col("m2x").cast("double") / (lit(2) * col("n")), 6).as("u"),
          round(col("m2y").cast("double") / (lit(2) * col("n")), 6).as("v"))
      val agg = uv.agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(round(col("u"), 6).cast("decimal(18,6)")).cast("double")
          .as("su"),
        sum(round(col("v"), 6).cast("decimal(18,6)")).cast("double")
          .as("sv"),
        sum(round(col("u") * col("v"), 6).cast("decimal(18,6)"))
          .cast("double").as("suv"),
        sum(round(col("u") * col("u"), 6).cast("decimal(18,6)"))
          .cast("double").as("suu"),
        sum(round(col("v") * col("v"), 6).cast("decimal(18,6)"))
          .cast("double").as("svv"))
      agg.select(col("n"),
        round((col("suv") - col("su") * col("sv") / col("n"))
          / sqrt((col("suu") - col("su") * col("su") / col("n"))
            * (col("svv") - col("sv") * col("sv") / col("n"))), 4)
          .as("rho"))
    })
}
