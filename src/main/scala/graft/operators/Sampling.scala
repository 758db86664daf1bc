package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting & sampling for training pipelines.
  *
  * The split/sample decision must be a pure function of the row key —
  * never `rand()` — so reruns, backfills, and engines agree row-for-row.
  * The key's md5 hex is uniform; comparing its first bytes against fixed
  * hex cutoffs gives reproducible proportional splits in ANY engine with
  * md5 (which is why the DuckDB oracle can check it exactly). All ops are
  * single narrow projections or one window — no shuffles beyond the
  * stated ones, no driver participation.
  */
object Sampling {

  /** Deterministic split label from the key's md5: first two hex chars
    * (one uniform byte) against cutoffs — 'cd' ≈ 80.1%, 'e6' ≈ 89.8%. */
  def hashSplit(key: Column): Column = {
    val bucket = substring(md5(key.cast("string")), 1, 2)
    when(bucket < "cd", "train").when(bucket < "e6", "val").otherwise("test")
  }

  /** Deterministic per-group sample: the n rows with the smallest
    * md5(key) in each group (uniform, reproducible, engine-agnostic).
    * One shuffle on the group key; top-n per group via window rank. */
  def stratifiedSample(df: DataFrame, groupCol: String, key: Column,
      n: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(md5(key.cast("string")))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  def defs: Seq[QueryDef] = Seq(
    // Train/val/test split profile — the driver's DuckDB oracle computes
    // the identical md5-prefix assignment, proving cross-engine
    // reproducibility of the split itself.
    QueryDef.sql(
      "q_hash_split",
      """SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
        |           THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("split", hashSplit(col("doc_id")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("split")
    },

    // Temperature-weighted corpus mixing (the pretraining source-
    // balancing step): source s with n_s docs gets an integer quota
    // ceil(3·n_s^(1/2)) — i.e. p(s) ∝ n_s^α with α=0.5, flattening the
    // natural distribution toward uniform — and keeps exactly its quota
    // of docs, chosen by md5 order. Integer quotas + hash ranking mean
    // BOTH engines select the identical doc set: no float threshold on
    // the keep decision anywhere. At 100 TB: one count agg (broadcast
    // back, 20 rows), one window rank per source partition — the same
    // shuffle stratifiedSample already pays; no driver participation.
    // sqrt/ceil are IEEE-correctly-rounded so the quota itself is also
    // engine-stable.
    QueryDef.sql(
      "q_temperature_mix",
      """WITH quota AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    LEAST(COUNT(*), CAST(ceil(3 * sqrt(COUNT(*))) AS BIGINT)) AS q
        |  FROM documents GROUP BY source),
        |ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
        |  FROM documents)
        |SELECT r.source, CAST(q.n_docs AS BIGINT) AS n_docs,
        |  CAST(q.q AS BIGINT) AS quota,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum
        |FROM ranked r JOIN quota q ON r.source = q.source
        |WHERE r.rk <= q.q
        |GROUP BY r.source, q.n_docs, q.q
        |ORDER BY r.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val quota = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("q", least(col("n_docs"),
          ceil(lit(3) * sqrt(col("n_docs"))).cast("long")))
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")))
      docs.withColumn("rk", row_number().over(w))
        .join(broadcast(quota), "source")
        .filter(col("rk") <= col("q"))
        .groupBy("source", "n_docs", "q")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_id_sum"))
        .select(col("source"), col("n_docs"), col("q").as("quota"),
          col("n_kept"), col("kept_id_sum"))
        .orderBy("source")
    },

    // Deterministic stratified sample: 5 docs per source by md5 order —
    // oracle reproduces the window ranking exactly.
    QueryDef.sql(
      "q_stratified_sample",
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      stratifiedSample(Tables.documents(s, d), "source", col("doc_id"), 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    }
  )
}
