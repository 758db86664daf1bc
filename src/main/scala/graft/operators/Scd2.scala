package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance from an update-shaped
  * change feed (remove old row + add new row per changed key in one
  * commit — how Delta CDF renders an UPDATE without preimage columns).
  * Shared by the gated `connector_cdf_scd2` pipeline and
  * Scd2RecoverySpec (checkpoint recovery / batch-boundary parity).
  *
  * SCALE: one broadcast-touched-keys join + union per commit — the
  * per-commit change set is the transactional unit and is metadata-
  * scale relative to the dimension; callers truncate lineage between
  * commits (localCheckpoint or a per-version parquet rewrite).
  */
object Scd2 {

  /** The open-interval sentinel (SCD2 high-date convention). */
  val Open: Long = 9999L

  /** Touched-key count above which [[applyCommit]] falls back from a
    * broadcast join to a shuffle join. A normal dimension commit touches
    * metadata-scale keys; a bulk rewrite (backfill, repartition-rewrite)
    * can touch the whole dimension, and forcing that through a driver
    * broadcast would OOM at 100 TB dimension scale. ~4M long keys ≈
    * tens of MB broadcast — comfortably under executor/driver budgets. */
  val BroadcastKeyLimit: Long = 4000000L

  /** Fold ONE commit's change rows into the dimension: close the
    * touched keys' open intervals at `v`, append the commit's add-rows
    * as new open generations `[v, Open)`.
    *
    * The same fold covers all three change shapes: UPDATE (remove+add
    * → close and reopen), pure DELETE (remove only → close, no new
    * generation), and INSERT of a new key (add only → nothing to
    * close, a fresh `[v, Open)` generation).
    *
    * `commit` must carry the dimension's business columns plus
    * `_change_type` / `_commit_version`; `dim` the business columns
    * plus `valid_from` / `valid_to`. */
  def applyCommit(dim: DataFrame, commit: DataFrame, v: Long,
      keyCol: String): DataFrame = {
    val adds = commit.filter(col("_change_type") === "add")
      .drop("_change_type", "_commit_version")
      .withColumn("valid_from", lit(v))
      .withColumn("valid_to", lit(Open))
    val touched = commit.select(keyCol).distinct().withColumn("t", lit(1))
    // size guard: probe at most BroadcastKeyLimit+1 rows (the limit
    // bounds the probe, not the join input) — broadcast only when the
    // commit's touched-key set is provably broadcast-sized; a bulk
    // rewrite falls back to an ordinary shuffle join on the key
    val fits = touched.limit((BroadcastKeyLimit + 1).toInt)
      .count() <= BroadcastKeyLimit
    val touchedSide = if (fits) broadcast(touched) else touched
    dim.join(touchedSide, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("t") === 1 && col("valid_to") === Open, lit(v))
          .otherwise(col("valid_to")))
      .drop("t")
      .unionByName(adds)
  }
}
