package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class BucketedJoinSpec extends SparkTestBase {

  test("bucketed join plans with no shuffle below the join") {
    // tiny test tables would broadcast — force the SMJ path the layout
    // is designed for (at fact-table scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (li, ord) = BucketedJoin.bucketedTables(spark, sf0001)
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select("l_orderkey", "o_orderpriority")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // co-partitioned buckets: no Exchange between scans and the join
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed read not used:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain parquet join") {
    val (li, ord) = BucketedJoin.bucketedTables(spark, sf0001)
    val bucketed = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    assert(bucketed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(bucketed).count() == 0)
  }
}
