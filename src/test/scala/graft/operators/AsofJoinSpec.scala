package graft.operators

import graft.SparkTestBase

/** Pin asofJoin semantics on a hand-built case: latest-at-or-before
  * match, equal-time inclusion, and null when nothing precedes. */
class AsofJoinSpec extends SparkTestBase {

  test("asof join picks latest right value at or before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "e1"), // matches r@3
      (1L, 10L, "e2"), // matches r@10 (equal time includes)
      (1L, 2L, "e3"), // nothing at or before 2 except r@1
      (2L, 7L, "e4"), // key 2 has no right rows -> null
      (1L, 0L, "e5")  // before all right rows -> null
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 1L, "r1"), (1L, 3L, "r3"), (1L, 10L, "r10"), (1L, 20L, "r20")
    ).toDF("k", "t", "v")

    val out = AsofJoin.asofJoin(left, "k", "t", right, "k", "t", "v", "matched")
      .select("ev", "matched")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "e1" -> Some("r3"), "e2" -> Some("r10"), "e3" -> Some("r1"),
      "e4" -> None, "e5" -> None))

    // the salted variant must be result-identical (salting only spreads
    // the window load; right rows are replicated to every salt)
    val salted = AsofJoin
      .asofJoinSalted(left, "k", "t", right, "k", "t", "v", "matched",
        salts = 4)
      .select("ev", "matched")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(salted == out)
  }

  test("salted asof equals plain asof on the events/orders fixture") {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.orders(spark, sf0001)
      .withColumn("t", expr(
        "timestamp'2024-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, CAST(o_orderkey % 720 AS INT), 0, 0)"))
      .groupBy("o_custkey", "t")
      .agg(max("o_orderkey").as("last_orderkey"))
    val events = graft.Tables.events(spark, sf0001)
      .select("event_id", "user_id", "ts")
    val plain = AsofJoin.asofJoin(events, "user_id", "ts",
      orders, "o_custkey", "t", "last_orderkey", "m")
      .select("event_id", "m")
    val salted = AsofJoin.asofJoinSalted(events, "user_id", "ts",
      orders, "o_custkey", "t", "last_orderkey", "m", salts = 8)
      .select("event_id", "m")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
