package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Frequent-itemset co-occurrence mining over the order baskets — the
  * association-rule primitive (support / lift) behind "what goes
  * together" curation and negative-sampling decisions. The reference's
  * relational surface delegates this class of self-join analytics to its
  * engine (`/root/reference/src/datasource/table.rs:150-204` scan →
  * DataFusion); here it is expressed as the canonical Spark basket
  * pipeline.
  *
  * Scale design: baskets reduce to DISTINCT (order, brand) first — the
  * brand domain is catalog-bounded (25 values here, ≤ thousands in any
  * real catalog), so per-order pair generation is C(items,2) with items
  * ≤ |brand| by construction, never the raw line-item fan-out. The
  * pair space itself is ≤ |brand|² — the support/lift tables are
  * broadcast-sized forever, and the one real shuffle is the order-keyed
  * self-join (co-partitioned on the same key it groups by next).
  * Everything is exact integers until one lift division per output row.
  */
object Itemsets {

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q_itemset_pairs",
      s"""WITH ob AS (
        |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM ob),
        |bs AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS s FROM ob GROUP BY b),
        |pr AS (
        |  SELECT a.b AS ba, c.b AS bb, CAST(COUNT(*) AS BIGINT) AS supp
        |  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
        |  GROUP BY 1, 2)
        |SELECT ba, bb, supp,
        |  ${TextAnalysis.halfUp4Sql("supp * n", "sa.s * sb.s")} AS lift
        |FROM pr JOIN bs sa ON pr.ba = sa.b JOIN bs sb ON pr.bb = sb.b, n
        |ORDER BY supp DESC, ba, bb LIMIT 10""".stripMargin) { (s, d) =>
      // r15 optimization (guide §2.4 — remove shuffles outright): the
      // old shape shuffled the (order, brand) frame three times —
      // DISTINCT's exchange on (o, b), then BOTH sides of the order-
      // keyed self-join re-exchanged on o. One groupBy(o).collect_set
      // establishes the per-order basket in a SINGLE exchange (the set
      // dedups map-side, absorbing the DISTINCT), and the C(items,2)
      // pair generation happens IN-TASK by exploding each basket —
      // identical pair multiset, since a pair (ba < bb) appears exactly
      // once per order containing both brands in either formulation.
      // Same plan serves n (basket count = COUNT DISTINCT o) and the
      // per-brand supports (explode the sets — set semantics = the old
      // DISTINCT semantics).
      val baskets = graft.CacheRegistry.ensurePersisted(
        Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey").as("o"))
          .agg(collect_set(col("p_brand")).as("bset")))
      val n = baskets.agg(count(lit(1)).cast("bigint").as("n"))
      val bs = baskets.select(explode(col("bset")).as("b"))
        .groupBy("b").agg(count(lit(1)).cast("bigint").as("s"))
      val pr = baskets
        .select(explode(col("bset")).as("ba"), col("bset"))
        .select(col("ba"),
          explode(filter(col("bset"), x => x > col("ba"))).as("bb"))
        .groupBy("ba", "bb")
        .agg(count(lit(1)).cast("bigint").as("supp"))
      pr.join(broadcast(bs.select(col("b").as("ba"), col("s").as("sa"))),
          "ba")
        .join(broadcast(bs.select(col("b").as("bb"), col("s").as("sb"))),
          "bb")
        .crossJoin(broadcast(n))
        // halfUp4: the all-integer ratio supp*n/(sa*sb) can terminate
        // exactly on a 5th-decimal half where float round() splits the
        // engines - the single integer rounding law avoids the boundary
        .select(col("ba"), col("bb"), col("supp"),
          TextAnalysis.halfUp4("supp * n", "sa * sb").as("lift"))
        .orderBy(desc("supp"), col("ba"), col("bb")).limit(10)
    })
}
