package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cross-checks the planner-statistics queries against direct
  * recomputations (including actually executing the estimated join). */
class PlannerStatsSpec extends SparkTestBase {

  test("q_join_size_estimate predicts the real self-join cardinality") {
    val row = graft.SparkEntry.queries("q_join_size_estimate")(
      spark, sf0001).collect().head
    // Σc² rides two exact BIGINT lanes (base 1e9 hi/lo — raw wide
    // decimals are hash-unstable across parquet readers)
    val (nKeys, nRows, joinRows, topKey, topKeyRows, skew) =
      (row.getLong(0), row.getLong(1),
        row.getLong(2) * 1000000000L + row.getLong(3), row.getLong(4),
        row.getLong(5), row.getDouble(6))
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

  test("q_zonemap_prune: shard accounting is complete and prune-safe") {
    val r = graft.SparkEntry.queries("q_zonemap_prune")(spark, sf0001)
      .collect().head
    val (nShards, nPruned, nCand, nFp, rowsScanned, rowsMatching) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(nPruned + nCand == nShards)
    assert(nFp <= nCand)
    // safety: every matching row lives in a candidate (un-pruned) shard
    assert(rowsMatching <= rowsScanned)
    val realMatches = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate").between(
        "1995-01-01 00:00:00", "1995-12-31 23:59:59")).count()
    assert(rowsMatching == realMatches)
  }

  test("q_equidepth_histogram: depths within 1, bounds tile the domain") {
    val rows = graft.SparkEntry.queries("q_equidepth_histogram")(
      spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L))
    val depths = rows.map(_.getLong(3))
    assert(depths.max - depths.min <= 1, s"not equi-depth: ${depths.toSeq}")
    // buckets ordered and non-overlapping on the value axis
    val bounds = rows.map(r => (r.getLong(1), r.getLong(2)))
    bounds.foreach { case (lo, hi) => assert(lo <= hi) }
    bounds.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2)
    }
    assert(depths.sum == graft.Tables.lineitem(spark, sf0001).count())
  }

  test("q_sample_extrapolation: estimate within 25% of in-plan truth") {
    val r = graft.SparkEntry.queries("q_sample_extrapolation")(
      spark, sf0001).collect().head
    val (nSample, nExact, nEst) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nSample < nExact && nSample > 0)
    assert(math.abs(nEst - nExact).toDouble / nExact < 0.25,
      s"count estimate off: $nEst vs $nExact")
    val nRatio = r.getDouble(5)
    assert(nRatio > 0.75 && nRatio < 1.25)
  }
}
