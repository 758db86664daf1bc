package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the FLAGSHIP composition: the quality
  * filter, exact dedup, and the deterministic train/val/test split
  * chained into one lineage report, plus a one-row "dataset card". This
  * is the query a data team actually ships: every stage is an operator
  * already certified on its own (qualityScore, keeper-dedup, hashSplit),
  * composed without materializing intermediates.
  *
  * Scale: one pass computes (tokens, quality); dedup is a text-keyed
  * window (shuffle by content key — production keys on a 128-bit digest
  * to shrink shuffle width; md5-free here because the oracle replays
  * raw text equality); the split is a narrow hash projection. The
  * report unions five stage-level aggregates — each map-side combined.
  *
  * Determinism: counts/token sums are integers; quality totals are 4dp
  * decimal sums (totals, NOT means — a mean of k 4dp values can land
  * exactly on the rounding half-tie where engines diverge).
  */
object Curation {

  /** One CDF-commit curation step (connector_incremental_curation and
    * CurationRecoverySpec): quality-gate the `arrivals` with the
    * text_quality_classifier model, dedup the survivors against
    * `corpus` with the banded-LSH incremental dedup, and return the
    * ACCEPTED arrival rows (same columns as `arrivals`). The cheap
    * codegen'd quality filter runs BEFORE the dedup machinery so
    * rejected docs never pay for shingling. Both frames must carry
    * `doc_id` and `text`. */
  def curateArrivals(corpus: org.apache.spark.sql.DataFrame,
      arrivals: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val qualified = arrivals
      .filter(TextAnalysis.qualityScoreRaw(col("text")) >= 0)
    val union = corpus.withColumn("is_new", lit(false))
      .unionByName(qualified.withColumn("is_new", lit(true)))
    val keptIds = Dedup
      .incrementalDedup(union, "doc_id", "text", col("is_new"))
      .filter(col("kept") === 1).select("doc_id")
    qualified.join(keptIds, "doc_id")
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_curation_pipeline",
      s"""WITH f AS (SELECT doc_id, text, string_split(text, ' ') AS rtoks
        |           FROM documents),
        |sc AS (
        |  SELECT doc_id, text, CAST(len(rtoks) AS BIGINT) AS ntoks,
        |    ${TextAnalysis.qualityExprSql} AS q
        |  FROM (SELECT doc_id, text, rtoks,
        |          ${TextAnalysis.qualityFeaturesSql}
        |        FROM f)),
        |qf AS (SELECT * FROM sc WHERE q >= 0.5),
        |dd AS (
        |  SELECT * FROM (
        |    SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper
        |    FROM qf) WHERE doc_id = keeper),
        |sp AS (
        |  SELECT *,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
        |           THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM dd)
        |SELECT stage, n_docs, n_tokens, total_quality FROM (
        |  SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(ntoks) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CAST(q AS DECIMAL(10,4))) AS DOUBLE) AS total_quality
        |  FROM sc
        |  UNION ALL
        |  SELECT '1_quality', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(ntoks) AS BIGINT),
        |    CAST(SUM(CAST(q AS DECIMAL(10,4))) AS DOUBLE) FROM qf
        |  UNION ALL
        |  SELECT '2_dedup', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(ntoks) AS BIGINT),
        |    CAST(SUM(CAST(q AS DECIMAL(10,4))) AS DOUBLE) FROM dd
        |  UNION ALL
        |  SELECT '3_' || split, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(ntoks) AS BIGINT),
        |    CAST(SUM(CAST(q AS DECIMAL(10,4))) AS DOUBLE)
        |  FROM sp GROUP BY split)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      // sc feeds FOUR stage aggregates and dd feeds two — persist both
      // or the union re-scans documents and re-runs the quality
      // projection once per stage (the multi-consumer convention)
      val sc = graft.CacheRegistry.register(Tables.documents(s, d).select(
        col("doc_id"), col("text"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("ntoks"),
        TextAnalysis.qualityScore(col("text")).as("q"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val qf = sc.filter(col("q") >= 0.5)
      val dd = graft.CacheRegistry.register(qf
        .withColumn("keeper", min("doc_id").over(Window.partitionBy("text")))
        .filter(col("doc_id") === col("keeper"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val sp = dd.withColumn("split", Sampling.hashSplit(col("doc_id")))
      def stageAgg(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum("ntoks").cast("bigint").as("n_tokens"),
            sum(col("q").cast("decimal(10,4)")).cast("double")
              .as("total_quality"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"),
            col("total_quality"))
      stageAgg(sc, "0_raw")
        .unionByName(stageAgg(qf, "1_quality"))
        .unionByName(stageAgg(dd, "2_dedup"))
        .unionByName(sp.groupBy("split")
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            sum("ntoks").cast("bigint").as("n_tokens"),
            sum(col("q").cast("decimal(10,4)")).cast("double")
              .as("total_quality"))
          .select(concat(lit("3_"), col("split")).as("stage"),
            col("n_docs"), col("n_tokens"), col("total_quality")))
        .orderBy("stage")
    },

    // k-anonymity / l-diversity audit — the privacy gate a dataset
    // release runs before shipping: group by the quasi-identifier tuple
    // (nation, market segment, coarse balance band), then for each
    // policy threshold k count the groups and rows that would re-identify
    // (group size < k), plus the worst-case l-diversity of the sensitive
    // attribute (distinct exact balances per QI group). SCALE: ONE hash
    // aggregate over the table builds the QI-group frame (map-side
    // combined); the k-threshold sweep is a broadcast 3-row cross over
    // the group frame; all outputs integer or halfUp4.
    QueryDef.sql(
      "q_k_anonymity",
      s"""WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS l_div
        |  FROM customer GROUP BY 1, 2, 3),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(n) AS BIGINT) AS n_rows,
        |    CAST(MIN(n) AS BIGINT) AS min_group_size,
        |    CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
        |  FROM g),
        |ks AS (SELECT unnest([2, 5, 10]) AS k)
        |SELECT ks.k, t.n_groups, t.n_rows, t.min_group_size,
        |  t.min_l_diversity,
        |  CAST(SUM(CASE WHEN g.n < ks.k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_below,
        |  CAST(SUM(CASE WHEN g.n < ks.k THEN g.n ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  ${TextAnalysis.halfUp4Sql(
           "SUM(CASE WHEN g.n < ks.k THEN g.n ELSE 0 END)", "t.n_rows")}
        |    AS risk_rate
        |FROM ks CROSS JOIN g CROSS JOIN t
        |GROUP BY ks.k, t.n_groups, t.n_rows, t.min_group_size,
        |  t.min_l_diversity
        |ORDER BY k""".stripMargin) { (s, d) =>
      val g = graft.CacheRegistry.ensurePersisted(
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
          .agg(count(lit(1)).as("n"),
            countDistinct("c_acctbal").as("l_div")))
      val t = g.agg(count(lit(1)).cast("bigint").as("n_groups"),
        sum("n").cast("bigint").as("n_rows"),
        min("n").cast("bigint").as("min_group_size"),
        min("l_div").cast("bigint").as("min_l_diversity"))
      val ks = s.range(1, 4).select(
        when(col("id") === 1, 2L).when(col("id") === 2, 5L)
          .otherwise(10L).as("k"))
      g.crossJoin(broadcast(ks)).crossJoin(broadcast(t))
        .groupBy("k", "n_groups", "n_rows", "min_group_size",
          "min_l_diversity")
        .agg(
          sum(when(col("n") < col("k"), 1L).otherwise(0L)).cast("bigint")
            .as("groups_below"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            .cast("bigint").as("rows_at_risk"),
          TextAnalysis.halfUp4(
            "SUM(CASE WHEN n < k THEN n ELSE 0 END)", "n_rows")
            .as("risk_rate"))
        .orderBy("k")
    },

    // One-row all-integer dataset card — the summary block of a dataset
    // release: corpus size, distinct-content count (the dup signal),
    // token/char volume, source/language coverage. One pass over the
    // scan, every statistic map-side combined; all integers so the
    // hash gate is trivially exact.
    QueryDef.sql(
      "q_dataset_card",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        countDistinct("text").cast("bigint").as("n_distinct_texts"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("bigint"))
          .cast("bigint").as("n_tokens"),
        sum(length(col("text")).cast("bigint")).cast("bigint").as("n_chars"),
        countDistinct("source").cast("bigint").as("n_sources"),
        countDistinct("lang").cast("bigint").as("n_langs"),
        min("doc_id").cast("bigint").as("min_doc_id"),
        max("doc_id").cast("bigint").as("max_doc_id"))
    })
}
