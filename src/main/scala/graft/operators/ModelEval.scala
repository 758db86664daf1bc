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
    })
}
