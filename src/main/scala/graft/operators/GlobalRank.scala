package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global 0-based dense row rank WITHOUT a single-partition sort: range-
  * repartition on the (unique) sort key, per-partition row_number, plus
  * broadcast partition-count offsets. Exact for any range boundaries
  * BECAUSE the key is unique — callers must pass a total order.
  *
  * The input is PERSISTED before the offsets are derived (and registered
  * for release): the offset subtree and the final join both consume the
  * repartitioned frame, and rank = lrk + offset is only exact if both
  * see the SAME boundaries — Spark's RangePartitioner samples with an
  * RDD-id-dependent seed, so two evaluations could differ; the persist
  * pins one evaluation instead of relying on ReuseExchange.
  * (Single-sourced here for q_shard_pack / q_gini_concentration /
  * q_lorenz_deciles / q_decile_lift.) */
object GlobalRank {

  /** Per-GROUP running weight total (cumulative Σw over the sort order
    * within each group) WITHOUT a single-partition-per-group sort: the
    * [[withRank]] recipe generalized to weighted sums. Range-repartition
    * on (group, sort key) — ranges may split a group, which is exactly
    * why the offsets are keyed (partition, group) — local running sums
    * per (partition, group), plus broadcast earlier-partition offsets
    * per group. Also attaches the group TOTAL weight as `totalCol`.
    * Requires (group, sort) keys to be UNIQUE rows (pre-aggregate
    * first), which makes ROWS and RANGE cumulative semantics identical;
    * weights must be an exact type (decimal/integer) so the regrouped
    * additions reproduce the single-sequence sums bit-for-bit. */
  def withRunningWeight(df: DataFrame, groupCol: Column, sortCol: Column,
      weightCol: Column, cumCol: String = "cw", totalCol: String = "tw",
      partitions: Int = 32): DataFrame = {
    val local = graft.CacheRegistry.register(df
      .repartitionByRange(partitions, groupCol, sortCol)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__g", groupCol)
      .withColumn("__lcw", sum(weightCol)
        .over(Window.partitionBy("__pid", "__g").orderBy(sortCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val parts = local.groupBy("__pid", "__g")
      .agg(sum(weightCol).as("__pw"))
    val offs = parts
      .withColumn("__off", sum("__pw")
        .over(Window.partitionBy("__g").orderBy("__pid")) - col("__pw"))
      .select(col("__pid"), col("__g"), col("__off"))
    val totals = parts.groupBy("__g").agg(sum("__pw").as(totalCol))
    local.join(broadcast(offs), Seq("__pid", "__g"))
      .join(broadcast(totals), "__g")
      .withColumn(cumCol, col("__lcw") + col("__off"))
      .drop("__pid", "__g", "__lcw", "__off")
  }

  def withRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rk", partitions: Int = 32): DataFrame = {
    val local = graft.CacheRegistry.register(df
      .repartitionByRange(partitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrk", row_number().over(Window.partitionBy("__pid")
        .orderBy(sortCols: _*)) - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        sum("__cnt").over(Window.orderBy("__pid")) - col("__cnt"))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__lrk") + col("__offset"))
      .drop("__pid", "__lrk", "__offset")
  }
}
