package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class SkewJoinSpec extends SparkTestBase {

  test("salted join plans as ShuffledHashJoin, never a broadcast") {
    // Catalyst's size estimate ignores the explode fan-out and would
    // broadcast the salts×-replicated small side — the exact failure
    // salting exists to avoid (the small side is salted because it's too
    // big to broadcast). The SHUFFLE_HASH pin must hold.
    val li = Tables.lineitem(spark, sf0001).withColumnRenamed("l_orderkey", "jk")
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("jk"), col("o_orderpriority"))
    val joined = SkewJoin.saltedInnerJoin(li, ord, "jk", salts = 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"replicated side must not broadcast:\n$plan")
  }

  test("salted join returns row-for-row what the plain join returns") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("jk"), col("l_quantity"))
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("jk"), col("o_orderpriority"))
    val salted = SkewJoin.saltedInnerJoin(li, ord, "jk", salts = 4)
    val plain = li.join(ord, "jk")
    // true multiset equality, both directions (aggregate counts would
    // miss a dropped row compensated by a duplicated one)
    assert(salted.exceptAll(plain).isEmpty, "salted has extra rows")
    assert(plain.exceptAll(salted).isEmpty, "salted dropped rows")
  }

  test("every salt value appears (hot keys actually spread)") {
    val li = Tables.lineitem(spark, sf0001)
    val salts = 8
    val dist = li.withColumn("__salt",
        pmod(hash(li.columns.map(col).toSeq: _*), lit(salts)))
      .groupBy("__salt").count().collect()
    assert(dist.length == salts, s"expected $salts salt buckets, got ${dist.length}")
    // roughly uniform: no bucket owns more than 2× its fair share
    val n = li.count()
    assert(dist.forall(_.getLong(1) < 2.0 * n / salts))
  }
}
