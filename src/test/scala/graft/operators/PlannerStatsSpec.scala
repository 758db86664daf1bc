package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cross-checks the planner-statistics queries against direct
  * recomputations (including actually executing the estimated join). */
class PlannerStatsSpec extends SparkTestBase {

  test("q_join_size_estimate predicts the real self-join cardinality") {
    val row = graft.SparkEntry.queries("q_join_size_estimate")(
      spark, sf0001).collect().head
    // join_rows is DECIMAL(38,0) on purpose (sum of c^2 overflows
    // BIGINT at corpus scale)
    val (nKeys, nRows, joinRows, topKey, topKeyRows, skew) =
      (row.getLong(0), row.getLong(1),
        row.getDecimal(2).longValueExact(), row.getLong(3),
        row.getLong(4), row.getDouble(5))
    val li = graft.Tables.lineitem(spark, sf0001).select("l_partkey")
    assert(nRows == li.count())
    assert(nKeys == li.distinct().count())
    // the whole point: the histogram prediction equals the executed join
    val real = li.withColumnRenamed("l_partkey", "k")
      .join(li.withColumnRenamed("l_partkey", "k"), "k").count()
    assert(joinRows == real, s"$joinRows vs executed $real")
    val cnts = li.groupBy("l_partkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val top = cnts.maxBy { case (k, c) => (c, -k) }
    assert((topKey, topKeyRows) == top)
    val refSkew = topKeyRows.toDouble * topKeyRows * nKeys / joinRows
    assert(math.abs(skew - refSkew) < 1e-3)
  }

  test("q_fd_audit: primary keys hold, non-keys are violated") {
    val rows = graft.SparkEntry.queries("q_fd_audit")(spark, sf0001)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.size == 4)
    // o_orderkey is the orders primary key: zero violations
    assert(rows(("orders", "o_orderkey", "o_orderdate"))._2 == 0L)
    // a customer places orders with many priorities: must be violated
    val (ng, nv, rate) = rows(("orders", "o_custkey", "o_orderpriority"))
    assert(nv > 0 && rate > 0 && rate <= 1)
    assert(math.abs(rate - nv.toDouble / ng) < 1e-3)
    // direct recomputation of one violated candidate
    val ref = graft.Tables.lineitem(spark, sf0001)
      .groupBy("l_partkey").agg(countDistinct("l_suppkey").as("dy"))
      .agg(count(lit(1)), sum(when(col("dy") > 1, 1L).otherwise(0L)))
      .collect().head
    val (g, v) = rows(("lineitem", "l_partkey", "l_suppkey"))._1 ->
      rows(("lineitem", "l_partkey", "l_suppkey"))._2
    assert(g == ref.getLong(0) && v == ref.getLong(1))
  }
}
