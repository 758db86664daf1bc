package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** The bucketed range join must produce the exact match set of the naive
  * nested-loop formulation — bucketing is a physical optimization, never
  * a semantics change. */
class RangeJoinSpec extends SparkTestBase {

  private lazy val points = Tables.events(spark, sf0001)
    .select("event_id", "ts")
  private lazy val intervals = Tables.orders(spark, sf0001)
    .limit(500)
    .select(col("o_orderkey"),
      expr("timestamp'2024-01-01 00:00:00' + " +
        "make_interval(0, 0, 0, 0, CAST(o_orderkey % 720 AS INT), 0, 0)")
        .as("s_ts"))
    .withColumn("e_ts", expr("s_ts + make_interval(0, 0, 0, 0, 12, 0, 0)"))

  test("bucketed range join equals the naive theta join") {
    val bucketed = RangeJoin.pointInInterval(
        points, "ts", intervals, "s_ts", "e_ts", bucketSeconds = 3600L)
      .select("event_id", "o_orderkey")
    val naive = points.join(intervals,
        col("ts") >= col("s_ts") && col("ts") < col("e_ts"))
      .select("event_id", "o_orderkey")
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
    assert(naive.count() > 0)
  }

  test("bucket width does not change the result") {
    def run(w: Long) = RangeJoin.pointInInterval(
        points, "ts", intervals, "s_ts", "e_ts", bucketSeconds = w)
      .count()
    assert(run(600L) == run(3600L) && run(3600L) == run(86400L))
  }

  test("plan is an equi-join on the bucket key, not a nested loop") {
    val plan = RangeJoin.pointInInterval(
        points, "ts", intervals, "s_ts", "e_ts", bucketSeconds = 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
  }
}
