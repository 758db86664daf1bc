package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions

/** Bloom-filter join reduction (the explicit runtime-filter pattern).
  *
  * At 100 TB the cost of `fact ⋈ dim` is dominated by moving the fact
  * side; when the dim side carries a selective predicate, most fact rows
  * are shuffled only to be dropped by the join. The fix is a semi-join
  * reduction executed at the fact SCAN: one pass over the (small,
  * already-filtered) dim side builds a Bloom filter of its join keys
  * (`df.stat.bloomFilter`, a treeAggregate — same cost class as a
  * broadcast build), and a codegen'd probe
  * ([[graft.functions.BloomMightContainLong]]) drops non-matching fact
  * rows before the exchange. The filter has NO false negatives and the
  * exact equi-join stays in the plan as the residual, so false positives
  * are dropped there — the result is bit-identical to the plain join and
  * the DuckDB oracle IS the plain join.
  *
  * Sizing: ~1.2 bytes/key at 1% fpp — a 10M-key dim is a ~12 MB filter,
  * shippable to every executor where shuffling a multi-TB fact side is
  * not. Spark's `InjectRuntimeFilter` applies the same idea only when
  * stats pass its thresholds; this operator is the always-on form for
  * pipelines that know their dim side is selective.
  *
  * Reference baseline: the Delta Sharing reference pushes only STATIC
  * predicates as `jsonPredicateHints` (`/root/reference/src/datasource/
  * expr.rs:92-154`); it has no runtime-filter facility at all.
  */
object BloomJoin {

  /** Reduce `fact` by a Bloom filter of `dim`'s join keys, then do the
    * exact equi-join. Key columns must be bigint (the probe hashes a
    * long). `fpp` trades filter size against wasted shuffle: at 0.01,
    * 1% of non-matching fact rows still reach the exchange.
    */
  def bloomReduceJoin(
      spark: SparkSession,
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(spark)
    // One action on the dim side to size the filter, one treeAggregate to
    // build it. Both scan only the SMALL side — the fact side (the 100 TB
    // one) is touched exactly once, by the reduced join itself.
    val expected = math.max(dim.count(), 64L)
    val bloom = dim.stat.bloomFilter(dimKey, expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val reduced = fact.filter(
      GraftFunctions.bloomContains(bytes, col(factKey).cast("long")))
    reduced.join(dim, reduced(factKey) === dim(dimKey))
  }

  def defs: Seq[QueryDef] = Seq(
    // Fact (lineitem) ⋈ selective dim (urgent open orders): the probe
    // drops ~90% of lineitem before the join exchange. Decimal partials
    // for the revenue sum (order-free ⇒ cross-engine exact).
    QueryDef.sql(
      "q_bloom_join",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |       AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "O")
        .select("o_orderkey", "o_orderdate")
      bloomReduceJoin(s, Tables.lineitem(s, d), "l_orderkey", dim, "o_orderkey")
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("y")
    })
}
