package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class TopKAggregatorSpec extends SparkTestBase {

  private def viaAgg(k: Int, partitions: Int) = {
    val li = Tables.lineitem(spark, sf0001).repartition(partitions)
    val itemId = (col("l_orderkey") * 8 + col("l_linenumber")).cast("bigint")
    li.groupBy("l_returnflag")
      .agg(TopKAggregator.topK(col("l_extendedprice"), itemId, k).as("tk"))
      .select(col("l_returnflag"), posexplode(col("tk.entries")))
      .select(col("l_returnflag"), col("pos"), col("col.score"), col("col.id"))
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
  }

  private def viaWindow(k: Int) = {
    val li = Tables.lineitem(spark, sf0001)
    val itemId = (col("l_orderkey") * 8 + col("l_linenumber")).cast("bigint")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, itemId)
    li.withColumn("id", itemId)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("l_returnflag"), (col("rk") - 1).as("pos"),
        col("l_extendedprice"), col("id"))
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
  }

  test("aggregator equals the window formulation") {
    assert(viaAgg(5, 32) == viaWindow(5))
  }

  test("result is invariant to partitioning (merge correctness)") {
    assert(viaAgg(3, 1) == viaAgg(3, 7) && viaAgg(3, 7) == viaAgg(3, 32))
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val li = Tables.lineitem(spark, sf0001)
    val itemId = (col("l_orderkey") * 8 + col("l_linenumber")).cast("bigint")
    val plan = li.groupBy("l_returnflag")
      .agg(TopKAggregator.topK(col("l_extendedprice"), itemId, 3))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial + final mode around the shuffle
    assert(plan.contains("ObjectHashAggregate") || plan.contains("partial"),
      s"no partial agg in plan:\n$plan")
  }
}
