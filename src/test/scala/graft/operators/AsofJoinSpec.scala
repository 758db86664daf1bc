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
  }
}
