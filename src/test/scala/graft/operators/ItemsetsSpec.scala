package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cross-checks the basket co-occurrence query against a driver-side
  * support/lift recomputation from the raw baskets. */
class ItemsetsSpec extends SparkTestBase {

  test("q_itemset_pairs matches a local support/lift recomputation") {
    val rows = graft.SparkEntry.queries("q_itemset_pairs")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.length == 10)
    // rebuild baskets locally
    val baskets = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey")
      .join(graft.Tables.part(spark, sf0001).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val n = baskets.map(_._1).size
    val brandSupp = baskets.groupBy(_._2).view.mapValues(_.size).toMap
    val pairSupp = baskets.groupBy(_._1).values.flatMap { items =>
      val bs = items.map(_._2).toSeq.distinct.sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length)
        yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { case (ba, bb, supp, lift) =>
      assert(supp == pairSupp((ba, bb)), s"support of ($ba,$bb)")
      val ref = supp.toDouble * n / (brandSupp(ba).toDouble * brandSupp(bb))
      assert(math.abs(lift - ref) < 1e-3, s"lift of ($ba,$bb): $lift vs $ref")
    }
    // the reported 10 really are the most frequent pairs
    val minReported = rows.map(_._3).min
    val better = pairSupp.values.count(_ > minReported)
    assert(better < 10, "a higher-support pair was not reported")
    // descending support with (ba, bb) tiebreak
    assert(rows.sameElements(rows.sortBy(r => (-r._3, r._1, r._2))))
  }
}
